#!/usr/bin/env python
"""Bisection harness for the round-4 mixed-assembly TPU-worker crash
(ROADMAP #1: the mixed chunk killed the worker on its second dispatch).

Each mode is a minimal standalone repro of one suspect subpath, run twice
(the crash signature needs dispatch #2). Run ONE mode per process:

  python scripts/bisect_mixed.py sparse   # _schur_sparse_mixed alone
  python scripts/bisect_mixed.py lp       # schur_lp_mixed alone
  python scripts/bisect_mixed.py exact    # exact f64 paths (control)
  python scripts/bisect_mixed.py chunk    # the full mixed chunk, 2 dispatches
  python scripts/bisect_mixed.py solve64  # full tru9 solve, assembly f64
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _tru9():
    import loraine_tpu as lt
    from loraine_tpu.problem import ensure_a_flat32

    p = lt.load_problem("tests/data/tru9.dat-s", {"eDIMACS": 1e-5})
    return ensure_a_flat32(p)


def _spd(m, nb, seed=0):
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((nb, m, m))
    W = W @ W.transpose(0, 2, 1) + m * np.eye(m)
    return jnp.asarray(W)


def run_twice(name, fn, *args):
    f = jax.jit(fn)
    for i in (1, 2):
        t0 = time.time()
        out = f(*args)
        s = float(jnp.sum(out if isinstance(out, jax.Array) else out[0]))
        print(f"{name} dispatch {i}: sum={s:.6e} ({time.time()-t0:.1f}s)",
              flush=True)


def main():
    mode = sys.argv[1]
    import loraine_tpu as lt

    lt._enable_persistent_cache()  # chunk compiles cost ~8 min via tunnel
    print("backend:", jax.default_backend(), flush=True)
    if mode in ("solve64", "solve_auto"):
        import loraine_tpu as lt

        ap = "f64" if mode == "solve64" else "auto"
        t0 = time.time()
        r = lt.solve_sdpa(
            "tests/data/tru9.dat-s",
            {"kit": 0, "eDIMACS": 1e-5, "initpoint": 1, "verb": 1,
             "assembly_precision": ap},
        )
        times = r.iteration_times[1:] or r.iteration_times
        print(f"{mode}:", r.status_name, r.objective, r.dimacs,
              f"{time.time()-t0:.1f}s",
              f"it/s={len(times)/sum(times):.2f}", flush=True)
        return

    from loraine_tpu.ops.schur import (
        _schur_sparse,
        _schur_sparse_mixed,
        schur_lp,
        schur_lp_mixed,
    )

    p = _tru9()
    g = next(gr for gr in p.groups if gr.is_sparse)
    W = _spd(g.m, g.nb)
    print(f"tru9 group: nb={g.nb} m={g.m} n={p.n} nlin={p.nlin}", flush=True)

    if mode == "sparse":
        run_twice("sparse_mixed", _schur_sparse_mixed, g, W)
    elif mode == "sparse_real":
        # the standalone mixed kernel with the REAL iteration-12 NT scaling
        # (the state whose next step kills the worker in-chunk)
        from loraine_tpu.ops.nt_scaling import nt_scale

        import loraine_tpu as lt2

        d = np.load("/tmp/tru9_state_it12.npz")
        X, S = jnp.asarray(d["X0"]), jnp.asarray(d["S0"])
        o = lt2.Options().validated()
        nt = jax.jit(lambda X, S: nt_scale(
            X, S, method=o.nt_method, eigh_backend=o.eigh_backend))(X, S)
        Wr = nt.W
        print("W absmax", float(jnp.abs(Wr).max()), flush=True)
        run_twice("sparse_mixed_realW", _schur_sparse_mixed, g, Wr)
        # and the LP weight path from the same state
        lpw = jnp.asarray(d["X_lin"]) / jnp.asarray(d["S_lin"])
        run_twice("lp_mixed_realw", schur_lp_mixed, p.C_lin, lpw)
    elif mode == "lp":
        w = jnp.asarray(np.abs(np.random.default_rng(1).standard_normal(p.nlin)) + 0.1)
        run_twice("lp_mixed", schur_lp_mixed, p.C_lin, w)
    elif mode == "exact":
        run_twice("sparse_exact", _schur_sparse, g, W)
        w = jnp.asarray(np.abs(np.random.default_rng(1).standard_normal(p.nlin)) + 0.1)
        run_twice("lp_exact", schur_lp, p.C_lin, w)
    elif mode.startswith("chunk"):
        import loraine_tpu as lt
        from loraine_tpu.ipm import step as step_mod
        from loraine_tpu.ipm.initial import initial_point
        from loraine_tpu.ipm.step import jitted_chunk
        from loraine_tpu.ops.schur import (
            _schur_sparse_mixed,
            schur_group,
            schur_group_mixed,
            schur_lp,
        )

        # schur_group_mixed routes sparse groups to the EXACT path since the
        # round-5 mitigation — the chunk modes here exist to study the
        # original crasher, so re-enable the A_flat32 fast path for them
        def _mixed_with_sparse_fast(g_, W_, G_):
            if g_.is_sparse and g_.A_flat32 is not None:
                return _schur_sparse_mixed(g_, W_)
            return schur_group_mixed(g_, W_, G_)

        step_mod.schur_group_mixed = _mixed_with_sparse_fast

        if mode == "chunk_sparse_only":  # LP block exact, sparse mixed
            step_mod.schur_lp_mixed = schur_lp
        elif mode == "chunk_lp_only":  # sparse exact, LP mixed
            step_mod.schur_group_mixed = (
                lambda g_, W_, G_: schur_group(g_, W_, G_)
            )
        elif mode == "chunk_sparse_barrier":
            # sparse mixed with an optimization barrier between the gather
            # stage and the f32 GEMM (tests the fused-kernel-bug hypothesis);
            # LP exact to isolate
            step_mod.schur_lp_mixed = schur_lp

            def _sparse_mixed_barrier(group, W, G):
                nb_, n_, s_ = group.Avals.shape
                m_ = group.m
                J = int(min(n_, max(8, (1 << 25) // max(1, nb_ * n_ * s_))))
                nch = -(-n_ // J)
                npad = nch * J

                def pad_r(x):
                    return jnp.pad(x, ((0, 0), (0, npad - n_), (0, 0)))

                rows_c = pad_r(group.Arows).reshape(nb_, nch, J, s_).transpose(1, 0, 2, 3)
                cols_c = pad_r(group.Acols).reshape(nb_, nch, J, s_).transpose(1, 0, 2, 3)
                vals_c = pad_r(group.Avals).reshape(nb_, nch, J, s_).transpose(1, 0, 2, 3)
                Af32 = group.A_flat32

                def body(chunk_):
                    r_c, c_c, v_c = chunk_
                    Wa = jax.vmap(lambda Wb, idx: Wb[idx])(W, r_c)
                    Wc = jax.vmap(lambda Wb, idx: Wb[idx])(W, c_c)
                    T2 = jnp.einsum("bjtp,bjt,bjtq->bjpq", Wa, v_c, Wc)
                    T32 = T2.reshape(nb_, J, m_ * m_).astype(jnp.float32)
                    T32 = jax.lax.optimization_barrier(T32)
                    return jnp.einsum("bjk,bnk->jn", T32, Af32).astype(W.dtype)

                Hrows = jax.lax.map(body, (rows_c, cols_c, vals_c))
                return Hrows.reshape(npad, n_)[:n_]

            step_mod.schur_group_mixed = _sparse_mixed_barrier

        if mode == "chunk_k1_f32g":
            # candidate fast path: f32 second-gather formulation (no
            # A_flat32) — must sail past iteration 13
            from loraine_tpu.ops.schur import _schur_sparse_f32gather

            def _mixed_f32g(g_, W_, G_):
                if g_.is_sparse:
                    return _schur_sparse_f32gather(g_, W_)
                return schur_group_mixed(g_, W_, G_)

            step_mod.schur_group_mixed = _mixed_f32g
        okw = {}
        if mode == "chunk_k1_nopallas":
            # no Pallas kernels anywhere in the chunk: steplengths via the
            # Cholesky bisection bound, NT eigh via the XLA-level Jacobi —
            # discriminates "sparse-mixed GEMM faults" from "sparse-mixed
            # H values feed a faulting Pallas kernel downstream"
            okw = {"step_eig": "chol", "eigh_backend": "jacobi"}
        o = lt.Options(kit=0, eDIMACS=1e-5, initpoint=1, verb=0, **okw).validated()
        state0 = initial_point(p, o)
        state = state0
        K = 1 if mode.startswith("chunk_k1") else 8
        chunk = jitted_chunk(o, -1, K, mesh=None, mixed_assembly=True)
        tol = jnp.asarray(o.tol_cg, dtype=p.b.dtype)
        if mode.startswith("chunk_k1"):
            # one iteration per dispatch, saving every state: the dispatch
            # that dies identifies the faulting ITERATION, and its saved
            # input state is the minimal offline repro seed
            for i in range(1, 21):
                host = jax.device_get(state)
                np.savez(
                    f"/tmp/tru9_state_it{i-1}.npz",
                    **{f"X{j}": x for j, x in enumerate(host.X)},
                    **{f"S{j}": s for j, s in enumerate(host.S)},
                    y=host.y, X_lin=host.X_lin, S_lin=host.S_lin,
                    sigma=host.sigma,
                )
                t0 = time.time()
                res = chunk(p, state, tol, i - 1, 0)
                state = res.state
                k = int(jax.device_get(res.k))
                st = int(jax.device_get(res.status))
                print(f"chunk_k1 dispatch {i}: k={k} status={st} "
                      f"dimacs={float(jax.device_get(res.buf.dimacs)[0]):.3e} "
                      f"({time.time()-t0:.1f}s)", flush=True)
                if st != 0:
                    break
            return
        ndisp = 6 if mode == "chunk_lp_only" else 3
        for i in range(1, ndisp + 1):
            t0 = time.time()
            res = chunk(p, state0 if mode == "chunk_same_state" else state, tol, 0, 0)
            if mode == "chunk_reupload":
                # round-trip the state through the host: same VALUES as the
                # crashing continuation, but freshly-uploaded buffers
                # (discriminates value-dependence from output-buffer
                # provenance/layout)
                host = jax.device_get(res.state)
                state = jax.tree_util.tree_map(jnp.asarray, host)
            else:
                state = res.state
            k = int(jax.device_get(res.k))
            print(f"{mode} dispatch {i}: k={k} status="
                  f"{int(jax.device_get(res.status))} "
                  f"({time.time()-t0:.1f}s)", flush=True)
            if int(jax.device_get(res.status)) != 0:
                break
        # asynchronous-death probe: a fault planted by a dispatch may kill
        # the worker seconds later; linger and poke the device so a delayed
        # corpse surfaces in THIS process instead of looking clean
        for wait_i in range(3):
            time.sleep(45)
            probe = float(jnp.sum(jnp.ones((8, 8)) * (wait_i + 1)))
            print(f"linger probe {wait_i + 1} ok: {probe}", flush=True)
            if mode == "chunk_diag":
                buf = jax.device_get(res.buf)
                for r in range(k):
                    print(
                        f"  it{r}: obj={buf.obj[r]:.6e} mu={buf.mu[r]:.3e} "
                        f"dimacs={buf.dimacs[r]:.3e} h_ok={bool(buf.h_ok[r])} "
                        f"h_shifts={int(buf.h_shifts[r])} "
                        f"nt_ok={bool(buf.nt_ok[r])}",
                        flush=True,
                    )
                import numpy as _np

                for nm in ("y", "X", "S", "X_lin", "S_lin"):
                    v = getattr(state, nm, None)
                    if v is None:
                        continue
                    leaves = jax.tree_util.tree_leaves(v)
                    for li, leaf in enumerate(leaves):
                        a = _np.asarray(jax.device_get(leaf))
                        print(f"  state.{nm}[{li}]: finite="
                              f"{bool(_np.isfinite(a).all())} "
                              f"absmax={_np.abs(a).max():.3e}", flush=True)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
