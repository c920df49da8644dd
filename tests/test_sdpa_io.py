import numpy as np

import loraine_tpu as lt


def test_read_theta1(data_dir):
    data = lt.read_sdpa(str(data_dir / "theta1.dat-s"))
    assert data.nvar == 104
    assert data.block_sizes == [50]
    assert data.c.shape == (104,)
    # objective vector: first entry 1.0, rest 0
    assert data.c[0] == 1.0
    assert np.all(data.c[1:] == 0.0)


def test_read_control1_has_lp_or_multiblock(data_dir):
    data = lt.read_sdpa(str(data_dir / "control1.dat-s"))
    assert data.nvar == 21
    assert len(data.block_sizes) >= 1


def test_roundtrip(tmp_path):
    data = lt.SDPAData(
        nvar=2,
        block_sizes=[2, -1],
        c=np.array([1.0, -2.0]),
        blocks=[
            (
                np.array([0, 1, 2]),
                np.array([0, 0, 1]),
                np.array([1, 0, 1]),
                np.array([0.5, 1.0, 2.0]),
            ),
            (np.array([2]), np.array([0]), np.array([0]), np.array([3.0])),
        ],
    )
    path = str(tmp_path / "t.dat-s")
    lt.write_sdpa(path, data)
    back = lt.read_sdpa(path)
    assert back.nvar == 2
    assert back.block_sizes == [2, -1]
    np.testing.assert_allclose(back.c, data.c)
    for (m1, r1, c1, v1), (m2, r2, c2, v2) in zip(data.blocks, back.blocks):
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_allclose(v1, v2)


def test_problem_from_sdpa_padding(data_dir):
    prob = lt.problem_from_sdpa(str(data_dir / "theta1.dat-s"), pad_multiple=8)
    assert prob.n == 104
    assert prob.nlmi == 1
    (g,) = prob.groups
    assert g.m == 56 and g.orig_sizes == (50,)
    # identity tail in C
    C = np.asarray(g.C[0])
    np.testing.assert_allclose(C[50:, 50:], np.eye(6))
    np.testing.assert_allclose(C[50:, :50], 0.0)
    A = np.asarray(g.A[0])
    np.testing.assert_allclose(A[:, 50:, :], 0.0)
