"""Unit tests for the static collective-traffic accounting used by
benchmarks/scaling.py (greenfield observability; ADVICE r3: tuple-shaped
async collectives were skipped by the regex)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from benchmarks.scaling import collective_bytes


def test_single_shape_collectives():
    hlo = """
  %ag = f64[128,64]{1,0} all-gather(%x), replica_groups={{0,1}}
  %ar = f32[256]{0} all-reduce(%y), to_apply=%add
  %rs = f64[32,8]{1,0} reduce-scatter(%z), dimensions={0}
"""
    out = collective_bytes(hlo)
    assert out["all-gather"] == {"count": 1, "bytes": 128 * 64 * 8}
    assert out["all-reduce"] == {"count": 1, "bytes": 256 * 4}
    assert out["reduce-scatter"] == {"count": 1, "bytes": 32 * 8 * 8}


def test_tuple_shape_async_collectives():
    hlo = """
  %ars = (f64[128]{0}, f64[64]{0}) all-reduce-start(%a, %b), to_apply=%add
  %ard = (f64[128]{0}, f64[64]{0}) all-reduce-done(%ars)
  %ags = (f32[16,4]{1,0}) all-gather-start(%c)
"""
    out = collective_bytes(hlo)
    # -start counted once with the sum of the tuple element sizes; the
    # matching -done must NOT double-count
    assert out["all-reduce"] == {"count": 1, "bytes": (128 + 64) * 8}
    assert out["all-gather"] == {"count": 1, "bytes": 16 * 4 * 4}


def test_no_collectives():
    assert collective_bytes("%m = f64[8,8]{1,0} dot(%a, %b)") == {}
