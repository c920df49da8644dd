"""Problem representation: dense, batched, TPU-first.

The solved problem (same convention as the reference `src/model.jl:8-49`)::

    max  b^T y - b_const
    s.t. sum_j y_j A_j^{(i)}  <=  C^{(i)}     (PSD order, i = 1..nlmi)
         C_lin^T y            <=  d_lin       (elementwise)

Design departure from the reference (which keeps per-block Julia vectors of
sparse matrices): LMI blocks are *bucketed by padded size* and stacked into
dense arrays ``A: [nb, n, m, m]`` so that every per-block kernel (NT scaling,
Schur assembly, step finding) is a single batched XLA op over the ``nb`` axis,
and multi-device sharding is a NamedSharding over that axis.

Padding is made semantically exact: a block of size m0 padded to m is the same
SDP with the constraint extended by a trailing ``0 <= I`` identity tail
(A padded with zeros, C with an identity tail). The padded problem's central
path drives the tail primal block to zero, so no masking is needed anywhere in
the solver; the objective and DIMACS errors converge to the original ones.

Rank-one data (reference ``datarank = -1``, `src/model.jl:176-197`): each
A_j = sgn_j * b_j b_j^T is stored as factors ``B: [nb, n, m]`` and signs;
dense A is never materialized (factorization runs straight off the sparse
triplets), and every contraction involving A becomes a GEMM
(`docs/src/low-rank_data.md:1-13` semantics, O(k n m^2) Schur assembly).
"""
from __future__ import annotations

import dataclasses
import math
import warnings
from functools import partial
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .io.sdpa import SDPAData, read_sdpa

__all__ = [
    "BlockGroup",
    "SDPProblem",
    "problem_from_dense",
    "problem_from_sdpa",
    "problem_from_dict",
    "ensure_a_flat32",
    "ensure_dd_aadj",
    "RANK1_TOL",
]

# Reference rank-1 conversion guard: `src/model.jl:189-191`.
RANK1_TOL = 5.0e-6


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["C", "A", "B", "Bsgn", "Arows", "Acols", "Avals", "AT",
                 "A_flat32", "Acell", "Acell_j", "Acell_v"],
    meta_fields=["m", "nb", "orig_sizes", "orig_indices", "data_norms", "C_norms"],
)
@dataclasses.dataclass
class BlockGroup:
    """A bucket of equally-(padded-)sized LMI blocks, stacked on axis 0.

    Exactly one data representation is present:
      dense:  ``A [nb, n, m, m]``
      rank-1: ``B [nb, n, m]`` + ``Bsgn [nb, n]`` (A_j = sgn_j b_j b_j^T)
      sparse: ``Arows/Acols [nb, n, s]`` int32 + ``Avals [nb, n, s]`` —
              *fully expanded* COO (both triangles listed) padded to the
              group's max entry count s; pad entries are (0, 0, 0.0).
              TPU-native replacement for the reference's three-regime
              sparse loops (`src/makeBBBB.jl:67-218`): contractions become
              batched gathers + small GEMMs (see ops/schur.py).

    ``orig_indices[b]`` is the position of stacked block b in the user's
    original block ordering (bucketing permutes blocks).
    """

    C: jax.Array  # [nb, m, m]
    A: Optional[jax.Array]  # [nb, n, m, m] dense symmetric data, or None
    B: Optional[jax.Array]  # [nb, n, m] rank-1 factors, or None
    Bsgn: Optional[jax.Array]  # [nb, n] signs (+/-1, 0 for zero A_j), or None
    Arows: Optional[jax.Array]  # [nb, n, s] int32, or None
    Acols: Optional[jax.Array]  # [nb, n, s] int32, or None
    Avals: Optional[jax.Array]  # [nb, n, s], or None
    m: int
    nb: int
    orig_sizes: Tuple[int, ...]
    orig_indices: Tuple[int, ...]
    # host-side norms, precomputed at build time so the initial point needs
    # no device computation: per block ||AA_i||_F = sqrt(sum_j ||A_j||_F^2)
    # and ||C_i||_F
    data_norms: Tuple[float, ...] = ()
    C_norms: Tuple[float, ...] = ()
    # j-major transposed copy of dense A ([nb, m*m, n]) so the adjoint
    # contraction Aadj = sum_j y_j A_j is a mat@vec dot in BOTH directions:
    # XLA:CPU fuses vec@mat dots into single-threaded loop fusions with a
    # strided reduction (catastrophic inside the CG while-loop of a sharded
    # solve — measured 10x per-iteration blow-up at n=2048). Built only when
    # the dense stack is moderate (<= ~1 GB); None otherwise.
    AT: Optional[jax.Array] = None
    # f32 flattened dense data [nb, n, m*m] for SPARSE-stored groups: the
    # mixed-precision Schur assembly (assembly_precision, ipm/step.py)
    # contracts T2 rows against it as one f32 MXU GEMM instead of the
    # f64 gather pipeline — measured 437 ms -> ~35 ms per assembly at tru9
    # scale (n=3240, m=152, s=16) on 1x v5e. Built only when it fits
    # (<= ~1.5 GB); None otherwise (mixed assembly then keeps the gather
    # path in f64).
    A_flat32: Optional[jax.Array] = None
    # Per-cell padded layout of the sparse COO for the dd-exact adjoint
    # (ops/schur.py Aadj_dd; dd2 on sparse storage). For each block, the
    # entries are regrouped by target cell (flat index r*m + c) so the
    # scatter becomes a collision-free placement and the per-cell sum is
    # an exact dd tree reduction:
    #   Acell   [nb, ncell]        int32 flat target (pad: m*m dump slot)
    #   Acell_j [nb, ncell, kmax]  int32 constraint index (pad: 0)
    #   Acell_v [nb, ncell, kmax]  f64 value (pad: 0.0)
    # Attached lazily by ensure_dd_aadj() only for precision='dd2' solves.
    Acell: Optional[jax.Array] = None
    Acell_j: Optional[jax.Array] = None
    Acell_v: Optional[jax.Array] = None

    @property
    def is_rank1(self) -> bool:
        return self.B is not None

    @property
    def is_sparse(self) -> bool:
        return self.Avals is not None


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["groups", "b", "C_lin", "d_lin"],
    meta_fields=["n", "nlin", "nlmi", "b_const", "sum_msizes"],
)
@dataclasses.dataclass
class SDPProblem:
    groups: Tuple[BlockGroup, ...]
    b: jax.Array  # [n]
    C_lin: Optional[jax.Array]  # [n, nlin] or None
    d_lin: Optional[jax.Array]  # [nlin] or None
    n: int
    nlin: int
    nlmi: int  # number of LMI blocks (sum of group nb)
    b_const: float
    sum_msizes: int  # sum of padded block sizes (mu normalization)

    def objective_dual(self, y) -> jax.Array:
        """The reported objective: -b^T y + b_const (reference
        `src/Solvers.jl:530`, `src/MOI_wrapper.jl:315-319`)."""
        return -jnp.dot(self.b, y) + self.b_const


# ---------------------------------------------------------------------------
# Host-side block payloads (numpy)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _BlockData:
    """One LMI block on the host: dense C plus either dense A or COO A."""

    C: np.ndarray  # [m0, m0]
    A_dense: Optional[np.ndarray] = None  # [n, m0, m0]
    # COO of all A_j: mat index j (0-based), upper-triangle rows/cols, values
    A_coo: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = None

    @property
    def m0(self) -> int:
        return int(self.C.shape[-1])

    def densify(self, n: int) -> np.ndarray:
        if self.A_dense is not None:
            return self.A_dense
        j, r, c, v = self.A_coo
        A = np.zeros((n, self.m0, self.m0))
        np.add.at(A, (j, r, c), v)
        off = r != c
        np.add.at(A, (j[off], c[off], r[off]), v[off])
        return A


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def _rank1_factor_sub(sub: np.ndarray) -> Tuple[np.ndarray, float, float]:
    """Factor a (small dense) symmetric matrix as sgn * b b^T via its dominant
    eigenpair. Returns (b, sgn, frobenius residual)."""
    sub = (sub + sub.T) / 2.0
    w, V = np.linalg.eigh(sub)
    k = int(np.argmax(np.abs(w)))
    lam, v = w[k], V[:, k]
    sgn = 1.0 if lam >= 0 else -1.0
    b = math.sqrt(abs(lam)) * v
    err = float(np.linalg.norm(sub - sgn * np.outer(b, b)))
    return b, sgn, err


def _rank1_factor_block(blk: _BlockData, n: int) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Factor every A_j of one block as sgn_j b_j b_j^T.

    Returns (B [n, m0], sgn [n]) or None if any factorization exceeds
    RANK1_TOL (caller falls back to dense, reference `src/Solvers.jl:435-444`).
    """
    m0 = blk.m0
    B = np.zeros((n, m0))
    sgn = np.zeros(n)

    def factor_one(j: int, sub: np.ndarray, nz: np.ndarray) -> bool:
        if nz.size == 0:
            return True
        b, s, err = _rank1_factor_sub(sub)
        if err > RANK1_TOL:
            warnings.warn(
                f"rank-1 conversion error {err:.2e} > {RANK1_TOL:g} for matrix {j};"
                " falling back to datarank = 0"
            )
            return False
        B[j, nz], sgn[j] = b, s
        return True

    if blk.A_coo is not None:
        jj, rr, cc, vv = blk.A_coo
        order = np.argsort(jj, kind="stable")
        jj, rr, cc, vv = jj[order], rr[order], cc[order], vv[order]
        bounds = np.searchsorted(jj, np.arange(n + 1))
        for j in range(n):
            lo, hi = bounds[j], bounds[j + 1]
            if lo == hi:
                continue
            r, c, v = rr[lo:hi], cc[lo:hi], vv[lo:hi]
            nz = np.unique(np.concatenate([r, c]))
            pos = {int(i): k for k, i in enumerate(nz)}
            sub = np.zeros((nz.size, nz.size))
            for a, bcol, val in zip(r, c, v):
                ia, ib = pos[int(a)], pos[int(bcol)]
                sub[ia, ib] += val
                if ia != ib:
                    sub[ib, ia] += val
            if not factor_one(j, sub, nz):
                return None
    else:
        for j in range(n):
            M = np.asarray(blk.A_dense[j])
            nz = np.flatnonzero(np.abs(M).sum(axis=1))
            if nz.size == 0:
                continue
            if not factor_one(j, M[np.ix_(nz, nz)], nz):
                return None
    if not np.any(B):
        warnings.warn("rank-1 factors all zero; falling back to datarank = 0")
        return None
    return B, sgn


# ---------------------------------------------------------------------------
# Assembly
# ---------------------------------------------------------------------------


def _expand_coo(blk: _BlockData, n: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Full (both-triangle) COO per matrix, plus the max entry count."""
    if blk.A_coo is not None:
        j, r, c, v = blk.A_coo
    else:
        j, r, c = np.nonzero(blk.A_dense)
        keep = r <= c  # upper triangle; expansion below restores symmetry
        j, r, c = j[keep], r[keep], c[keep]
        v = blk.A_dense[j, r, c]
    off = r != c
    jf = np.concatenate([j, j[off]])
    rf = np.concatenate([r, c[off]])
    cf = np.concatenate([c, r[off]])
    vf = np.concatenate([v, v[off]])
    counts = np.bincount(jf, minlength=n)
    return (jf, rf, cf, vf), counts


# -- Kojima-style storage cost model ----------------------------------------
#
# The reference carries the Kojima et al. three-formula data-sparsity cost
# model commented out (`src/model.jl:234-287`: per-constraint costs d1/d2/d3
# with kappa = 500000/m, selecting the F-1/F-2/F-3 assembly regime per
# constraint) and ships a plain nnz threshold instead (`src/model.jl:153-174`).
# The TPU architecture has two regimes, chosen per problem: the batched dense
# GEMM contraction (schur_group) and the gather/outer-product sparse pipeline
# (_schur_sparse). The same cost-comparison idea applies with TPU-calibrated
# effective throughputs:
#
#   cost_dense  = sum_blocks  n m^3 + n^2 m^2          (MXU-shaped GEMM MACs)
#   cost_sparse = sum_blocks  n s m^2                   (outer-product MACs)
#               + GATHER_PENALTY * n^2 s               (gathered elements)
#               + SPARSE_OVERHEAD                      (fixed pipeline cost)
#
# s = max nnz per data matrix in the block (the padded COO slot count).
# GATHER_PENALTY models gathers running on the VPU/scalar units at ~1
# element/lane-cycle vs the MXU's systolic MACs (order 10^2 slower per
# element); SPARSE_OVERHEAD is the flop-equivalent of the chunked
# gather pipeline's fixed latency (lax.map + index plumbing), which
# dominates at small n where the dense batched contraction is one fused
# GEMM. The constants reproduce the measured-good choices on the shipped
# SDPLIB instances (tests/test_problem.py): dense for theta1/control1/
# tru3/vib3 (n <= 104), sparse for tru9/vib9/maxG11/thetaG11 (n >= 800).

GATHER_PENALTY = 64.0
SPARSE_OVERHEAD = 5.0e6


def schur_cost_dense(n: int, m: int, nb: int = 1) -> float:
    """Modeled cost of one dense-path Schur assembly for a block group."""
    return float(nb) * (n * m**3 + n**2 * m**2)


def schur_cost_sparse(n: int, m: int, s: int, nb: int = 1) -> float:
    """Modeled cost of one sparse-path Schur assembly (excl. fixed
    overhead, which is added once per problem in pick_storage)."""
    return float(nb) * (n * s * m**2 + GATHER_PENALTY * n**2 * s)


def pick_storage(n: int, block_stats: List[Tuple[int, int]]) -> str:
    """'dense' or 'sparse' by total modeled Schur-assembly cost.

    ``block_stats``: per LMI block (m, s) with s the max per-matrix nnz.
    Replaces the hand-tuned nnz-64/n>=256 threshold of rounds 1-3."""
    dense = sum(schur_cost_dense(n, m) for m, _ in block_stats)
    sparse = SPARSE_OVERHEAD + sum(
        schur_cost_sparse(n, m, s) for m, s in block_stats
    )
    return "sparse" if sparse < dense else "dense"


def _build_problem(
    blocks: List[_BlockData],
    b: np.ndarray,
    C_lin: Optional[np.ndarray],
    d_lin: Optional[np.ndarray],
    b_const: float,
    datarank: int,
    pad_multiple: int,
    dtype,
    storage: str = "auto",
    max_dense_gb: float = 4.0,
    sparse_max_nnz: Optional[int] = None,
    sparse_min_n: int = 256,
) -> SDPProblem:
    n = int(np.asarray(b).shape[0])
    nlmi = len(blocks)

    use_rank1 = datarank == -1
    factors: List[Optional[Tuple[np.ndarray, np.ndarray]]] = [None] * nlmi
    if use_rank1:
        for i, blk in enumerate(blocks):
            f = _rank1_factor_block(blk, n)
            if f is None:
                use_rank1 = False
                break
            factors[i] = f

    # storage decision (per problem): rank-1 beats all when it applies; the
    # sparse gather path replaces the reference's nnz-regime dispatch when
    # data matrices have small support and n is large enough that the dense
    # O(n^2 m^2) Schur contraction dominates (SURVEY section 7 stance:
    # evaluate, don't inherit, the sparse regimes)
    mode = storage
    if use_rank1:
        mode = "rank1"
    elif storage == "auto":
        dense_bytes = sum((n + 1) * blk.m0**2 * 8 for blk in blocks)
        stats = []
        for blk in blocks:
            _, counts = _expand_coo(blk, n)
            stats.append((blk.m0, int(counts.max()) if counts.size else 0))
        s_max = max((s for _, s in stats), default=0)
        if dense_bytes > max_dense_gb * 1e9:
            mode = "sparse"
            if s_max > (64 if sparse_max_nnz is None else sparse_max_nnz):
                warnings.warn(
                    f"data too large for dense storage and not very sparse "
                    f"(max {s_max} entries/matrix); using the sparse path anyway"
                )
        elif sparse_max_nnz is None:
            # default auto: the Kojima-style modeled-cost comparison
            # (pick_storage above; reference carries the original model
            # commented out, `src/model.jl:234-287`)
            mode = pick_storage(n, stats)
        elif s_max <= sparse_max_nnz and n >= sparse_min_n:
            # explicit datasparsity threshold: the reference's shipped
            # nnz-rule semantics (`src/model.jl:153-174`)
            mode = "sparse"
        else:
            mode = "dense"
    if mode not in ("dense", "sparse", "rank1"):
        raise ValueError(f"storage must be auto/dense/sparse, got {storage!r}")
    if mode == "rank1" and not use_rank1:
        raise ValueError("rank-1 storage requires datarank=-1 and factorizable data")

    buckets = {}
    for i, blk in enumerate(blocks):
        m_pad = _round_up(blk.m0, pad_multiple)
        buckets.setdefault(m_pad, []).append(i)

    # Latency-bound tiny problems: every bucket adds a full set of per-group
    # device ops to the fused step (NT scaling, steplengths, residuals, the
    # CG while-loop body). For small blocks, ONE batched group at the max
    # padded size is far cheaper on TPU than several thin groups — the extra
    # padded FLOPs are noise next to per-op dispatch latency. Padding stays
    # exact (identity tail), so this is purely a layout decision.
    if len(buckets) > 1:
        m_max = max(buckets)
        merged_bytes = (n + 1) * nlmi * m_max * m_max * 8
        if m_max <= 128 and merged_bytes <= 32 * 1024**2:
            idxs = [i for k in sorted(buckets) for i in buckets[k]]
            buckets = {m_max: idxs}

    groups = []
    for m_pad in sorted(buckets):
        idxs = buckets[m_pad]
        Cstack, Astack, Bstack, Sgnstack, sizes = [], [], [], [], []
        coo_blocks = []
        for i in idxs:
            blk = blocks[i]
            m0 = blk.m0
            sizes.append(m0)
            Cp = np.zeros((m_pad, m_pad))
            Cp[:m0, :m0] = blk.C
            Cp[range(m0, m_pad), range(m0, m_pad)] = 1.0  # identity tail
            Cstack.append(Cp)
            if mode == "rank1":
                B, sgn = factors[i]
                Bp = np.zeros((n, m_pad))
                Bp[:, :m0] = B
                Bstack.append(Bp)
                Sgnstack.append(sgn)
            elif mode == "sparse":
                coo_blocks.append(_expand_coo(blk, n))
            else:
                A = blk.densify(n)
                Ap = np.zeros((n, m_pad, m_pad))
                Ap[:, :m0, :m0] = A
                Astack.append(Ap)

        Arows = Acols = Avals = None
        if mode == "sparse":
            s_grp = max(
                (int(counts.max()) if counts.size else 0)
                for _, counts in coo_blocks
            )
            s_grp = max(s_grp, 1)
            nb_ = len(idxs)
            Arows = np.zeros((nb_, n, s_grp), dtype=np.int32)
            Acols = np.zeros((nb_, n, s_grp), dtype=np.int32)
            Avals = np.zeros((nb_, n, s_grp))
            for bpos, ((jf, rf, cf, vf), counts) in enumerate(coo_blocks):
                order = np.argsort(jf, kind="stable")
                jf, rf, cf, vf = jf[order], rf[order], cf[order], vf[order]
                slot = np.concatenate([np.arange(c) for c in counts]) if jf.size else jf
                Arows[bpos, jf, slot] = rf
                Acols[bpos, jf, slot] = cf
                Avals[bpos, jf, slot] = vf

        Cnp = np.stack(Cstack)
        if mode == "rank1":
            data_norms = tuple(
                float(np.sqrt(np.sum(np.sum(B**2, axis=-1) ** 2))) for B in Bstack
            )
        elif mode == "sparse":
            data_norms = tuple(
                float(np.sqrt(np.sum(Avals[i] ** 2))) for i in range(len(idxs))
            )
        else:
            data_norms = tuple(float(np.sqrt(np.sum(A**2))) for A in Astack)
        ATnp = None
        if mode == "dense":
            Anp = np.stack(Astack)
            if Anp.nbytes <= (1 << 30):
                ATnp = np.ascontiguousarray(
                    Anp.reshape(Anp.shape[0], Anp.shape[1], -1).transpose(0, 2, 1)
                )
        # A_flat32 (the mixed-assembly f32 copy, up to ~1.5 GB) is NOT
        # built here: the solver attaches it lazily via ensure_a_flat32()
        # only when mixed assembly actually engages (TPU, n>=512, f64,
        # assembly_precision auto/f32) — eager builds wasted host+HBM
        # memory on every sparse f64 load that never ran the mixed path.
        groups.append(
            BlockGroup(
                C=jnp.asarray(Cnp, dtype=dtype),
                A=jnp.asarray(np.stack(Astack), dtype=dtype) if mode == "dense" else None,
                AT=jnp.asarray(ATnp, dtype=dtype) if ATnp is not None else None,
                B=jnp.asarray(np.stack(Bstack), dtype=dtype) if mode == "rank1" else None,
                Bsgn=jnp.asarray(np.stack(Sgnstack), dtype=dtype) if mode == "rank1" else None,
                Arows=jnp.asarray(Arows) if mode == "sparse" else None,
                Acols=jnp.asarray(Acols) if mode == "sparse" else None,
                Avals=jnp.asarray(Avals, dtype=dtype) if mode == "sparse" else None,
                A_flat32=None,
                m=m_pad,
                nb=len(idxs),
                orig_sizes=tuple(sizes),
                orig_indices=tuple(idxs),
                data_norms=data_norms,
                C_norms=tuple(float(np.linalg.norm(Ci)) for Ci in Cstack),
            )
        )

    nlin = 0 if C_lin is None else int(np.asarray(C_lin).shape[1])
    return SDPProblem(
        groups=tuple(groups),
        b=jnp.asarray(b, dtype=dtype),
        C_lin=None if nlin == 0 else jnp.asarray(C_lin, dtype=dtype),
        d_lin=None if nlin == 0 else jnp.asarray(d_lin, dtype=dtype),
        n=n,
        nlin=nlin,
        nlmi=nlmi,
        b_const=float(b_const),
        sum_msizes=sum(g.m * g.nb for g in groups),
    )


def ensure_a_flat32(
    problem: SDPProblem, mesh=None,
    max_bytes: int = int(1.5 * (1 << 30)),
) -> SDPProblem:
    """Attach the mixed-assembly f32 flattened copy (BlockGroup.A_flat32)
    to every sparse-stored f64 group where it fits (<= ``max_bytes``).

    Called by the solver ONLY when mixed assembly engages
    (assembly_precision auto/f32 on TPU) — the copy can reach ~1.5 GB of
    host+HBM memory, so it is never built on loads that keep the exact
    f64 gather path. The scatter reproduces the padded symmetric COO
    (zero-valued pad slots scatter zeros), so the f32 GEMM contraction in
    ops/schur.py _schur_sparse_mixed matches the f64 gather contraction.

    ``mesh``: place the copy like shard_problem does for the COO arrays
    (rows on the schur axis) so the sharded step's consumers stay
    shard-local.

    The scatter runs ON DEVICE from the already-resident COO arrays: a
    host-side build would re-upload the ~300 MB copy through the TPU
    tunnel (measured ~7 min for tru9) for data the device already holds.
    COO entries are unique per matrix, so the f32 scatter-add is
    order-independent and matches the host scatter bit-for-bit.
    """
    groups = []
    changed = False
    for g in problem.groups:
        if (
            g.is_sparse
            and g.A_flat32 is None
            and g.Avals.dtype == jnp.float64
            and g.nb * problem.n * g.m * g.m * 4 <= max_bytes
        ):
            m = g.m
            nb, n, _ = g.Arows.shape

            def scatter(rows, cols, vals, m=m, nb=nb, n=n):
                fidx = rows.astype(jnp.int32) * m + cols.astype(jnp.int32)
                return (
                    jnp.zeros((nb, n, m * m), dtype=jnp.float32)
                    .at[
                        jnp.arange(nb)[:, None, None],
                        jnp.arange(n)[None, :, None],
                        fidx,
                    ]
                    .add(vals.astype(jnp.float32))
                )

            if mesh is not None:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P

                baxname = "blocks" if g.nb % mesh.shape["blocks"] == 0 else None
                saxname = "schur" if problem.n % mesh.shape["schur"] == 0 else None
                sharding = NamedSharding(mesh, P(baxname, saxname, None))
                arr = jax.jit(scatter, out_shardings=sharding)(
                    g.Arows, g.Acols, g.Avals
                )
            else:
                arr = jax.jit(scatter)(g.Arows, g.Acols, g.Avals)
            g = dataclasses.replace(g, A_flat32=arr)
            changed = True
        groups.append(g)
    if not changed:
        return problem
    return dataclasses.replace(problem, groups=tuple(groups))


def ensure_dd_aadj(
    problem: SDPProblem, mesh=None, max_bytes: int = 1 << 29
) -> SDPProblem:
    """Attach the per-cell padded COO layout (BlockGroup.Acell/Acell_j/
    Acell_v) that the dd-exact adjoint needs on sparse-stored groups
    (ops/schur.py Aadj_dd). Called by the solver only for precision='dd2'
    — the layout costs nb*ncell*kmax*(8+4)+nb*ncell*4 bytes, so plain
    f64/dd solves never build it. Raises if the layout exceeds
    ``max_bytes`` (pathologically cell-concentrated data); the reference's
    equivalent is type-generic assembly over any storage
    (`src/makeBBBB.jl:39-218` over T).
    """
    groups = []
    changed = False
    for g in problem.groups:
        if not (g.is_sparse and g.Acell is None):
            groups.append(g)
            continue
        rows = np.asarray(g.Arows)
        cols = np.asarray(g.Acols)
        vals = np.asarray(g.Avals, dtype=np.float64)
        nb, n, s = rows.shape
        m = g.m
        per_block = []
        ncell_max, kmax = 1, 1
        for b in range(nb):
            flat = rows[b].astype(np.int64) * m + cols[b].astype(np.int64)
            f = flat.reshape(-1)
            v = vals[b].reshape(-1)
            jj = np.repeat(np.arange(n, dtype=np.int64), s)
            keep = v != 0.0  # drops pad slots (and harmless exact zeros)
            f, jj, v = f[keep], jj[keep], v[keep]
            order = np.argsort(f, kind="stable")
            f, jj, v = f[order], jj[order], v[order]
            cells, starts = np.unique(f, return_index=True)
            counts = np.diff(np.append(starts, f.size))
            per_block.append((cells, counts, jj, v))
            if cells.size:
                ncell_max = max(ncell_max, int(cells.size))
                kmax = max(kmax, int(counts.max()))
        nbytes = nb * ncell_max * kmax * 12 + nb * ncell_max * 4
        if nbytes > max_bytes:
            raise ValueError(
                f"precision='dd2' per-cell adjoint layout needs {nbytes} "
                f"bytes (> {max_bytes}): data too cell-concentrated for "
                "sparse dd2 — rebuild with storage='dense'"
            )
        Acell = np.full((nb, ncell_max), m * m, dtype=np.int32)
        Aj = np.zeros((nb, ncell_max, kmax), dtype=np.int32)
        Av = np.zeros((nb, ncell_max, kmax), dtype=np.float64)
        for b, (cells, counts, jj, v) in enumerate(per_block):
            if not cells.size:
                continue
            Acell[b, : cells.size] = cells
            slot = np.concatenate([np.arange(c) for c in counts])
            cell_pos = np.repeat(np.arange(cells.size), counts)
            Aj[b, cell_pos, slot] = jj
            Av[b, cell_pos, slot] = v
        arrs = [jnp.asarray(Acell), jnp.asarray(Aj), jnp.asarray(Av)]
        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            baxname = "blocks" if nb % mesh.shape["blocks"] == 0 else None
            arrs = [
                jax.device_put(a, NamedSharding(mesh, P(*((baxname,) + (None,) * (a.ndim - 1)))))
                for a in arrs
            ]
        g = dataclasses.replace(g, Acell=arrs[0], Acell_j=arrs[1], Acell_v=arrs[2])
        changed = True
        groups.append(g)
    if not changed:
        return problem
    return dataclasses.replace(problem, groups=tuple(groups))


def problem_from_dense(
    As: Sequence[np.ndarray],
    Cs: Sequence[np.ndarray],
    b: np.ndarray,
    C_lin: Optional[np.ndarray] = None,
    d_lin: Optional[np.ndarray] = None,
    b_const: float = 0.0,
    datarank: int = 0,
    pad_multiple: int = 8,
    dtype=jnp.float64,
    storage: str = "auto",
) -> SDPProblem:
    """Build an SDPProblem from per-block dense numpy data.

    Args:
      As: per LMI block, array [n, m_i, m_i] of data matrices A_j.
      Cs: per LMI block, array [m_i, m_i].
      b: objective vector [n] (maximize b^T y).
      C_lin: optional [n, nlin]; d_lin: optional [nlin].
      datarank: -1 attempts the rank-one compression (5e-6 guard with dense
        fallback).
      storage: 'auto' | 'dense' | 'sparse' data representation (auto picks
        sparse for small-support data with large n).
    """
    blocks = [
        _BlockData(C=np.asarray(C, dtype=np.float64), A_dense=np.asarray(A, dtype=np.float64))
        for A, C in zip(As, Cs)
    ]
    return _build_problem(
        blocks, np.asarray(b, dtype=np.float64), C_lin, d_lin, b_const, datarank,
        pad_multiple, dtype, storage=storage,
    )


def problem_from_sdpa(
    source: Union[str, SDPAData],
    datarank: int = 0,
    pad_multiple: int = 8,
    dtype=jnp.float64,
    max_dense_gb: float = 4.0,
    storage: str = "auto",
    sparse_max_nnz: Optional[int] = None,
    sparse_min_n: int = 256,
) -> SDPProblem:
    """Convert SDPA data (min c^T x s.t. sum x_j F_j - F_0 >= 0) to the
    internal dual form: y = x, b = -c, A_j = -F_j, C = -F_0; diagonal blocks
    map to the LP cone with C_lin[j, l] = -diag(F_j)_l, d_lin = -diag(F_0).

    The reported objective ``-b^T y`` then equals SDPA's optimal ``c^T x``.
    """
    data = read_sdpa(source) if isinstance(source, str) else source
    n = data.nvar

    blocks: List[_BlockData] = []
    lp_cols: List[np.ndarray] = []
    lp_d: List[np.ndarray] = []
    dense_bytes = 0
    for bs, (mat, row, col, val) in zip(data.block_sizes, data.blocks):
        if bs < 0:
            k = -bs
            Cl = np.zeros((n, k))
            dl = np.zeros(k)
            diag = row  # diagonal blocks: row == col
            f0 = mat == 0
            np.add.at(dl, diag[f0], -val[f0])
            np.add.at(Cl, (mat[~f0] - 1, diag[~f0]), -val[~f0])
            lp_cols.append(Cl)
            lp_d.append(dl)
        else:
            m0 = bs
            dense_bytes += (n + 1) * m0 * m0 * 8
            C = np.zeros((m0, m0))
            f0 = mat == 0
            np.add.at(C, (row[f0], col[f0]), -val[f0])
            offd = f0 & (row != col)
            np.add.at(C, (col[offd], row[offd]), -val[offd])
            fj = ~f0
            blocks.append(
                _BlockData(C=C, A_coo=(mat[fj] - 1, row[fj], col[fj], -val[fj]))
            )

    C_lin = np.concatenate(lp_cols, axis=1) if lp_cols else None
    d_lin = np.concatenate(lp_d) if lp_d else None
    return _build_problem(
        blocks,
        b=-data.c,
        C_lin=C_lin,
        d_lin=d_lin,
        b_const=0.0,
        datarank=datarank,
        pad_multiple=pad_multiple,
        dtype=dtype,
        storage=storage,
        max_dense_gb=max_dense_gb,
        sparse_max_nnz=sparse_max_nnz,
        sparse_min_n=sparse_min_n,
    )


def problem_from_dict(
    d: dict, datarank: int = 0, pad_multiple: int = 8, dtype=jnp.float64
) -> SDPProblem:
    """Raw-dict entry point (working replacement for the reference's broken
    `loraine(d, options)` path, `src/Loraine.jl:30-93` / `src/model.jl:
    90-118`). Keys (reference convention, negated internally like
    `prepare_model_data`):

      nvar, nlmi, msizes, A (list over blocks of [n, m, m] with the
      *constraint* sign, i.e. internal A_j = -A[i][j]), C (list of [m, m],
      internal C_i = -C[i])  — or pre-negated 'As'/'Cs' in internal
      convention; c (objective, b = -c), b_const; optional nlin, d, C_lin.
    """
    n = int(d.get("nvar", len(np.atleast_1d(d.get("c")))))
    if "As" in d:
        As = [np.asarray(a) for a in d["As"]]
        Cs = [np.asarray(c) for c in d["Cs"]]
        b = np.asarray(d["b"], dtype=np.float64)
    else:
        As = [-np.asarray(a) for a in d["A"]]
        Cs = [-np.asarray(c) for c in d["C"]]
        b = -np.asarray(d["c"], dtype=np.float64)
    b_const = -float(d.get("b_const", 0.0))
    nlin = int(d.get("nlin", 0))
    C_lin = d_lin = None
    if nlin > 0:
        C_lin = -np.asarray(d["C_lin"]) if "C_lin" in d else None
        d_lin = -np.asarray(d["d"]).reshape(-1)
    blocks = [_BlockData(C=C, A_dense=A) for A, C in zip(As, Cs)]
    if b.shape[0] != n:
        raise ValueError(f"nvar={n} inconsistent with objective length {b.shape[0]}")
    return _build_problem(
        blocks, b, C_lin, d_lin, b_const, datarank, pad_multiple, dtype
    )
