import time, jax
import jax.numpy as jnp
jax.config.update('jax_enable_x64', True)
import loraine_tpu  # enables x64; persistent cache off for CPU only
from loraine_tpu import _enable_persistent_cache
_enable_persistent_cache()

def timed_compile(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    c = lowered.compile()
    t1 = time.time()
    jax.block_until_ready(c(*args))
    t2 = time.time()
    print(f"{name}: compile {t1-t0:.1f}s run {t2-t1:.3f}s", flush=True)

m = 808
x = jnp.eye(m, dtype=jnp.float64)[None].repeat(2, 0)
timed_compile('chol[2,808]', jnp.linalg.cholesky, x)
timed_compile('eigvalsh[2,808]', jnp.linalg.eigvalsh, x)
timed_compile('eigh[1,808]', lambda a: jnp.linalg.eigh(a)[1], x[:1])
timed_compile('svd[1,808]', lambda a: jnp.linalg.svd(a)[1], x[:1])
timed_compile('trisolve[1,808]', lambda a: jax.scipy.linalg.solve_triangular(a, a, lower=True), x[:1])
