"""POEMA-JSON / MAT readers (io/poema.py) — the working replacement for the
reference's TBD/solve_json.jl + TBD/tvp.jl flows over its broken raw-dict
entry (`src/Loraine.jl:30-93`)."""
import numpy as np
import pytest

import loraine_tpu as lt


def _dict_from_sdpa(path):
    """Build the raw problem dict (reader convention: stored matrices are
    SDPA's F matrices) from a .dat-s file, for roundtrip testing."""
    data = lt.read_sdpa(str(path))
    n = data.nvar
    A, C, msizes = [], [], []
    lin_rows = []
    for bs, (mat, row, col, val) in zip(data.block_sizes, data.blocks):
        if bs < 0:
            m = -bs
            Clin_b = np.zeros((n, m))
            dlin_b = np.zeros(m)
            for mt, r, c, v in zip(mat, row, col, val):
                if mt == 0:
                    dlin_b[r] += v
                else:
                    Clin_b[mt - 1, r] += v
            lin_rows.append((Clin_b, dlin_b))
            continue
        m = bs
        msizes.append(m)
        stack = np.zeros((n, m, m))
        Cmat = np.zeros((m, m))
        for mt, r, c, v in zip(mat, row, col, val):
            tgt = Cmat if mt == 0 else stack[mt - 1]
            tgt[r, c] += v
            if r != c:
                tgt[c, r] += v
        A.append(stack)
        C.append(Cmat)
    d = {
        "nvar": n,
        "nlmi": len(A),
        "msizes": np.asarray(msizes),
        "c": data.c,
        "A": A,
        "C": C,
        "b_const": 0.0,
        "nlin": 0,
    }
    if lin_rows:
        d["nlin"] = sum(db.shape[0] for _, db in lin_rows)
        d["C_lin"] = np.concatenate([cb for cb, _ in lin_rows], axis=1)
        d["d"] = np.concatenate([db for _, db in lin_rows])
    return d


def test_json_roundtrip_theta1(tmp_path, data_dir):
    d = _dict_from_sdpa(data_dir / "theta1.dat-s")
    path = tmp_path / "theta1.json"
    lt.write_poema_json(str(path), d)
    d2 = lt.read_poema_json(str(path))
    assert d2["nvar"] == d["nvar"]
    assert d2["nlmi"] == d["nlmi"]
    np.testing.assert_allclose(d2["c"], d["c"])
    for a, b in zip(d2["A"], d["A"]):
        np.testing.assert_allclose(a, b)
    for a, b in zip(d2["C"], d["C"]):
        np.testing.assert_allclose(a, b)
    r = lt.solve_json(str(path), {"eDIMACS": 1e-6, "initpoint": 1, "verb": 0})
    assert r.status == 1
    assert abs(r.objective - 23.0) < 1e-4


def test_json_roundtrip_lp_cone(tmp_path, data_dir):
    # vib3 mixes PSD blocks with a diagonal (LP) block
    d = _dict_from_sdpa(data_dir / "vib3.dat-s")
    assert d["nlin"] > 0
    path = tmp_path / "vib3.json"
    lt.write_poema_json(str(path), d)
    d2 = lt.read_poema_json(str(path))
    np.testing.assert_allclose(d2["C_lin"], d["C_lin"])
    np.testing.assert_allclose(d2["d"], d["d"])
    r_json = lt.solve_json(str(path), {"eDIMACS": 1e-6, "initpoint": 1, "verb": 0})
    r_sdpa = lt.solve_sdpa(str(data_dir / "vib3.dat-s"),
                           {"eDIMACS": 1e-6, "initpoint": 1, "verb": 0})
    assert r_json.status == 1
    assert abs(r_json.objective - r_sdpa.objective) < 1e-5


def test_mat_reader(tmp_path, data_dir):
    scipy_io = pytest.importorskip("scipy.io")
    d = _dict_from_sdpa(data_dir / "theta1.dat-s")
    mat = {
        "nvar": float(d["nvar"]),
        "nlmi": float(d["nlmi"]),
        "msizes": np.asarray(d["msizes"], dtype=np.float64),
        "c": d["c"],
        "A": np.empty((1,), dtype=object),
        "C": np.empty((1,), dtype=object),
        "b_const": 0.0,
        "nlin": 0.0,
    }
    mat["A"][0] = d["A"][0]
    mat["C"][0] = d["C"][0]
    path = tmp_path / "theta1.mat"
    scipy_io.savemat(str(path), {"d": mat})
    d2 = lt.read_mat_dict(str(path))
    prob = lt.problem_from_dict(d2)
    r = lt.solve(prob, {"eDIMACS": 1e-6, "initpoint": 1, "verb": 0})
    assert r.status == 1
    assert abs(r.objective - 23.0) < 1e-4
