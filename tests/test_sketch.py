"""HyperLogLog distinct sketch: register table pinned against a
brute-force Python HLL, estimate accuracy pinned against exact distinct
counts, block-structure invariance."""

import numpy as np
import pyarrow as pa
import pytest

from nerfray.ops import sketch
from nerfray.ops.dedup import sha64


def _brute_registers(values):
    best = {}
    for v in values:
        reg, rho = sketch._rho(sha64(str(v)))
        if rho > best.get(reg, 0):
            best[reg] = rho
    return sorted(best.items())


@pytest.fixture(scope="module")
def int_ds(ray_session):
    import ray.data
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 10_000, 40_000)  # ~9800 distinct
    return ray.data.from_arrow(pa.Table.from_pydict(
        {"v": pa.array(vals, pa.int64())})), vals


def test_registers_match_brute_force(ray_session, int_ds):
    ds, vals = int_ds
    rows = sorted((r["register"], r["rho_max"])
                  for r in sketch.hll_registers(ds, "v").take_all())
    assert rows == _brute_registers(vals.tolist())


def test_estimate_accuracy(ray_session, int_ds):
    ds, vals = int_ds
    est = sketch.hll_distinct(ds, "v")
    exact = len(set(vals.tolist()))
    assert abs(est - exact) / exact < 0.35  # m=64 -> sigma ~ 13%


def test_small_range_linear_counting(ray_session):
    import ray.data
    ds = ray.data.from_arrow(pa.Table.from_pydict(
        {"v": pa.array(list(range(20)) * 5, pa.int64())}))
    est = sketch.hll_distinct(ds, "v")
    assert abs(est - 20) / 20 < 0.35


def test_block_structure_invariance(ray_session, int_ds):
    ds, _ = int_ds
    a = sorted(tuple(sorted(r.items()))
               for r in sketch.hll_registers(ds.repartition(1), "v")
               .take_all())
    b = sorted(tuple(sorted(r.items()))
               for r in sketch.hll_registers(ds.repartition(17), "v")
               .take_all())
    assert a == b and a
