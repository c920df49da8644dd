"""Eigensolver backends: in-house Jacobi and mixed-precision refinement
against numpy oracles, including IPM-like hard spectra (tight clusters,
graded 1e-12..1, f32-unresolvable gaps)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loraine_tpu.ops.eigh import eigh_jacobi, eigh_mixed, round_robin_pairs


def _with_spectrum(lam, seed=0):
    m = lam.shape[0]
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((m, m)))
    return jnp.asarray((Q @ np.diag(lam) @ Q.T)[None])


def _errors(M, lam, V):
    lam, V = np.asarray(lam), np.asarray(V)
    ref = np.linalg.eigvalsh(np.asarray(M))
    Mn = max(abs(ref[0, 0]), abs(ref[0, -1]))
    rec = V @ (lam[..., None] * np.swapaxes(V, -1, -2))
    return (
        np.max(np.abs(lam - ref)) / Mn,
        np.max(np.abs(rec - np.asarray(M))) / Mn,
        np.max(np.abs(np.swapaxes(V, -1, -2) @ V - np.eye(V.shape[-1]))),
    )


def test_round_robin_covers_all_pairs():
    m = 10
    pairs = round_robin_pairs(m)
    seen = set()
    for r in range(pairs.shape[0]):
        ps = set()
        for p, q in zip(pairs[r, 0], pairs[r, 1]):
            assert p != q
            ps.add(int(p))
            ps.add(int(q))
            seen.add(frozenset((int(p), int(q))))
        assert len(ps) == m  # disjoint cover each round
    assert len(seen) == m * (m - 1) // 2


@pytest.mark.parametrize("m", [16, 57])  # even and odd
def test_jacobi_matches_numpy(m):
    rng = np.random.default_rng(1)
    A = rng.standard_normal((3, m, m))
    M = jnp.asarray((A + A.transpose(0, 2, 1)) / 2)
    lam, V = eigh_jacobi(M)
    lam_err, rec_err, orth = _errors(M, lam, V)
    assert lam_err < 1e-12 and rec_err < 1e-11 and orth < 1e-12


@pytest.mark.parametrize(
    "name,lam",
    [
        ("separated", np.linspace(0.5, 1.5, 96)),
        ("graded", np.logspace(-12, 0, 96)),
        ("cluster-at-mu", 1e-8 * (1 + 1e-7 * np.arange(96))),
        ("f32-unresolvable", np.sort(1 + 1e-9 * np.arange(96))),
        ("ipm-like", np.r_[np.full(48, 2.0), np.full(48, 2.02)] * np.linspace(1, 1.001, 96)),
    ],
)
def test_mixed_hard_spectra(name, lam):
    M = _with_spectrum(np.asarray(lam, dtype=float))
    out_lam, V = eigh_mixed(M)
    lam_err, rec_err, orth = _errors(M, out_lam, V)
    assert orth < 1e-12, name
    assert rec_err < 5e-7, name
    assert lam_err < 5e-7, name


def test_mixed_indefinite():
    lam = np.linspace(-2.0, 3.0, 64)
    M = _with_spectrum(lam, seed=5)
    out_lam, V = eigh_mixed(M)
    lam_err, rec_err, orth = _errors(M, out_lam, V)
    assert lam_err < 1e-10 and rec_err < 1e-10 and orth < 1e-12
