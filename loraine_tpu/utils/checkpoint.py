"""Iterate checkpoint / resume.

The reference keeps no checkpointing (SURVEY section 5); here the solver
state is a small pytree, so saving it is a flat .npz of leaves plus the
treedef reconstructed from the problem structure.

    res = lt.solve(problem, {"maxit": 5})
    lt.save_state("ckpt.npz", res.final_state)
    state = lt.load_state("ckpt.npz")
    res2 = lt.Solver(problem, opts, initial_state=state).solve()  # resumes
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ipm.state import IPMState

__all__ = ["save_state", "load_state"]


def save_state(path: str, state: IPMState) -> None:
    leaves, _ = jax.tree_util.tree_flatten(state)
    host = [np.asarray(jax.device_get(x)) for x in leaves]
    meta = {
        "ngroups": len(state.X),
        "has_lin": state.X_lin is not None,
        "has_dd2": state.X_lo is not None,
    }
    np.savez(
        path,
        __ngroups__=np.int64(meta["ngroups"]),
        __has_lin__=np.int64(meta["has_lin"]),
        __has_dd2__=np.int64(meta["has_dd2"]),
        **{f"leaf_{i}": a for i, a in enumerate(host)},
    )


def load_state(path: str, dtype=jnp.float64) -> IPMState:
    z = np.load(path)
    ngroups = int(z["__ngroups__"])
    has_lin = bool(z["__has_lin__"])
    has_dd2 = bool(z["__has_dd2__"]) if "__has_dd2__" in z.files else False
    leaves = [z[f"leaf_{i}"] for i in range(len([k for k in z.files if k.startswith("leaf_")]))]
    # leaf order matches tree_flatten of IPMState: X tuple, S tuple, y,
    # [X_lin, S_lin], sigma
    pos = 0
    X = tuple(jnp.asarray(leaves[pos + i], dtype=dtype) for i in range(ngroups)); pos += ngroups
    S = tuple(jnp.asarray(leaves[pos + i], dtype=dtype) for i in range(ngroups)); pos += ngroups
    y = jnp.asarray(leaves[pos], dtype=dtype); pos += 1
    if has_lin:
        X_lin = jnp.asarray(leaves[pos], dtype=dtype); pos += 1
        S_lin = jnp.asarray(leaves[pos], dtype=dtype); pos += 1
    else:
        X_lin = S_lin = None
    sigma = jnp.asarray(leaves[pos], dtype=dtype); pos += 1
    if has_dd2:
        # dd2 iterate tails (see ipm/state.py; flatten order: the declared
        # data_fields order puts them after sigma)
        X_lo = tuple(jnp.asarray(leaves[pos + i], dtype=dtype) for i in range(ngroups)); pos += ngroups
        S_lo = tuple(jnp.asarray(leaves[pos + i], dtype=dtype) for i in range(ngroups)); pos += ngroups
        y_lo = jnp.asarray(leaves[pos], dtype=dtype); pos += 1
        return IPMState(X=X, S=S, y=y, X_lin=X_lin, S_lin=S_lin, sigma=sigma,
                        X_lo=X_lo, S_lo=S_lo, y_lo=y_lo)
    return IPMState(X=X, S=S, y=y, X_lin=X_lin, S_lin=S_lin, sigma=sigma)
