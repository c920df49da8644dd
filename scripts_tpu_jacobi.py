import time, numpy as np, jax
import jax.numpy as jnp
jax.config.update('jax_enable_x64', True)
from loraine_tpu.ops.eigh import eigh_jacobi
from loraine_tpu.ops.linalg import eigmin_chol
rng = np.random.default_rng(0)
for nb, m in [(2, 56), (1, 104)]:
    A = rng.standard_normal((nb, m, m))
    M = jnp.asarray((A + A.transpose(0,2,1))/2)
    t0=time.time(); lam, V = jax.block_until_ready(eigh_jacobi(M)); t1=time.time()
    lam2 = np.linalg.eigvalsh(np.asarray(M))
    err = np.max(np.abs(np.asarray(lam)-lam2)/(1+np.abs(lam2)))
    rec = np.asarray(V) @ (np.asarray(lam)[..., None]*np.swapaxes(np.asarray(V),-1,-2))
    print(f'm={m}: t={t1-t0:.2f}s lam_err={err:.2e} recon={np.max(np.abs(rec-np.asarray(M))):.2e}', flush=True)
    t0=time.time(); jax.block_until_ready(eigh_jacobi(M)); print('  rerun', round(time.time()-t0,3), flush=True)
    t0=time.time(); b = jax.block_until_ready(eigmin_chol(M)); t1=time.time()
    print(f'  eigmin_chol t={t1-t0:.2f}s err={np.max(np.abs(np.asarray(b)-lam2[:,0])):.2e}', flush=True)
    t0=time.time(); jax.block_until_ready(eigmin_chol(M)); print('  rerun', round(time.time()-t0,3), flush=True)
