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


def test_approx_quantiles_rank_error_bound(ray_session):
    """The mergeable summary's answer must sit within the documented
    rank bound (n/s + n_blocks) of the target rank, for every q and
    group, across different block structures; with s >= n it must be
    exactly percentile_disc."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from nerfray.ops import sketch as sk
    rng = np.random.default_rng(11)
    n = 20_000
    keys = rng.integers(0, 3, n)
    vals = rng.normal(size=n) * (keys + 1)
    t = pa.Table.from_pydict({
        "k": pa.array(keys, pa.int64()),
        "value": pa.array(vals, pa.float64())})
    qs = (0.25, 0.5, 0.75)
    for n_blocks in (4, 16):
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        s = 64
        rows = sk.approx_quantiles(ds, "value", qs=qs, group="k",
                                   s=s).take_all()
        assert len(rows) == 9
        for r in rows:
            grp = np.sort(vals[keys == r["k"]])
            ng = len(grp)
            target = int(np.ceil(r["q"] * ng))
            # rank of the returned value (it must be a data point)
            rank = int(np.searchsorted(grp, r["value"], side="right"))
            assert grp[rank - 1] == r["value"]
            assert abs(rank - target) <= ng / s + n_blocks, \
                (r, rank, target)
        exact = sk.approx_quantiles(ds, "value", qs=qs, group="k",
                                    s=1 << 40).take_all()
        for r in exact:
            grp = np.sort(vals[keys == r["k"]])
            want = grp[int(np.ceil(r["q"] * len(grp))) - 1]
            assert r["value"] == want


def test_windowed_sketch_merge_equals_recompute(ray_session):
    """Daily registers derived by MERGING hourly sketches must equal
    registers recomputed from raw events (mergeability), and the
    resulting estimate must be within HLL error of the exact count."""
    import duckdb
    from nerfray.ops import sketch as sk
    sf = "/root/testdata/sf0.001"
    daily = {}
    for r in sk.daily_user_registers(sf).take_all():
        daily.setdefault(r["day"], []).append((r["register"], r["rho_max"]))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    exact = dict(con.sql(
        "SELECT strftime(ts, '%Y-%m-%d'), count(DISTINCT user_id) "
        "FROM events GROUP BY 1").fetchall())
    assert set(daily) == set(exact)
    for day, regs in daily.items():
        est = sk.hll_estimate(regs)
        # 64 registers -> ~13% relative error; allow 3 sigma
        assert abs(est - exact[day]) <= max(0.4 * exact[day], 8), \
            (day, est, exact[day])


def test_heavy_hitters_exact_vs_brute_force(ray_session):
    """MG candidate pruning must be invisible: the two-pass answer
    equals brute-force thresholded counts for ANY block structure,
    including blocks whose vocabulary far exceeds k counters."""
    import ray.data
    rng = np.random.default_rng(11)
    # zipf-ish: few hot words + a long unique tail >> k
    hot = [f"hot{i}" for i in range(10)]
    words = [hot[rng.integers(0, 10)] for _ in range(3000)]
    words += [f"tail{i}" for i in range(5000)]
    rng.shuffle(words)
    texts = [" ".join(words[i:i + 40]) for i in range(0, len(words), 40)]
    ds = ray.data.from_arrow(pa.Table.from_pydict(
        {"text": pa.array(texts, pa.string())}))
    k = 30
    got = {(r["word"], r["cnt"])
           for r in sketch.heavy_hitter_words(
               ds.repartition(13), k=k).take_all()}
    flat = [w for t in texts for w in t.split(" ")]
    n = len(flat)
    exact = {}
    for w in flat:
        exact[w] = exact.get(w, 0) + 1
    want = {(w, c) for w, c in exact.items() if c * (k + 1) > n}
    assert got == want and want  # threshold actually selects the hot set


def test_cms_estimate_upper_bound_and_registers(ray_session):
    """CMS register table == brute-force grid; point estimates are
    never below exact counts and exact for a word that dominates."""
    import ray.data
    rng = np.random.default_rng(17)
    words = [f"w{i}" for i in rng.integers(0, 300, 4000)]
    words += ["dominant"] * 500
    rng.shuffle(words)
    texts = [" ".join(words[i:i + 50]) for i in range(0, len(words), 50)]
    ds = ray.data.from_arrow(pa.Table.from_pydict(
        {"text": pa.array(texts, pa.string())})).repartition(7)
    regs = [(r["d"], r["col"], r["cnt"])
            for r in sketch.cms_registers(ds).take_all()]
    # brute-force grid
    flat = [w for t in texts for w in t.split(" ")]
    exact = {}
    for w in flat:
        exact[w] = exact.get(w, 0) + 1
    grid = {}
    for w, c in exact.items():
        for d in range(sketch.CMS_D):
            key = (d, sha64(f"{d}:{w}") % sketch.CMS_W)
            grid[key] = grid.get(key, 0) + c
    assert sorted(regs) == sorted((d, c, v) for (d, c), v in grid.items())
    for w, c in list(exact.items())[:50]:
        assert sketch.cms_estimate(regs, w) >= c
    # the dominant word's estimate error is bounded by the noise floor
    est = sketch.cms_estimate(regs, "dominant")
    assert 500 <= est <= 500 + len(flat) // sketch.CMS_W * 4


# -- exact heavy-hitter keys (join-key skew profiling) -------------------------


def test_heavy_hitter_keys_exact_vs_brute_force(ray_session):
    """Two-pass exact key profiler == brute-force threshold count,
    including a key that is hot in one block only (candidate-union
    completeness) and keys straddling the phi boundary."""
    import ray.data
    from nerfray.ops import sketch as sk

    # 300 rows: key 7 hot overall (90), key 9 hot in block 2 only (40),
    # the rest spread thin
    keys = [7] * 90 + [9] * 40 + list(range(100, 270))
    t = pa.table({"user_id": pa.array(keys, pa.int64())})
    ds = ray.data.from_arrow(t).repartition(3)
    k = 5  # phi = 1/6 -> threshold 50
    got = [(r["user_id"], r["cnt"])
           for r in sk.heavy_hitter_keys(ds, key="user_id",
                                         k=k).take_all()]
    n = len(keys)
    from collections import Counter
    want = sorted((key, c) for key, c in Counter(keys).items()
                  if c * (k + 1) > n)
    assert got == want == [(7, 90)]
    # lower threshold: key 9 (40 = n/7.5) appears at k=9 (phi=1/10)
    got2 = dict((r["user_id"], r["cnt"])
                for r in sk.heavy_hitter_keys(ds, key="user_id",
                                              k=9).take_all())
    assert got2 == {7: 90, 9: 40}


# -- KMV bottom-k theta sketch ------------------------------------------------


def test_kmv_set_summary_exact_and_estimator_branches(ray_session):
    """KMV summary vs brute force: the exact branch (|set| < k) returns
    true counts; the estimator branch lands within the k=64 error bound;
    a key whose two flags arrive from DIFFERENT blocks is merged."""
    import numpy as np
    import ray.data
    from nerfray.ops import sketch as sk
    from nerfray.ops.dedup import splitmix64

    # block 1 holds key 5 only as 'x'; block 2 only as 'y' -> the final
    # OR must see it in the intersection
    rows_a = [(5, "x")] + [(i, "x") for i in range(100, 140)]
    rows_b = [(5, "y")] + [(i, "y") for i in range(120, 160)]
    t1 = pa.table({"k": pa.array([r[0] for r in rows_a], pa.int64()),
                   "s": pa.array([r[1] for r in rows_a], pa.string())})
    t2 = pa.table({"k": pa.array([r[0] for r in rows_b], pa.int64()),
                   "s": pa.array([r[1] for r in rows_b], pa.string())})
    ds = ray.data.from_arrow(t1).union(ray.data.from_arrow(t2))
    out = {r["set_name"]: (r["n_k"], r["est"])
           for r in sk.kmv_set_summary(ds, "k", "s", "x", "y",
                                       k=64).take_all()}
    # all sets < k=64 -> exact branch everywhere
    assert out["x"] == (41, 41)
    assert out["y"] == (41, 41)
    assert out["union"] == (61, 61)
    assert out["intersection"] == (21, 21)

    # estimator branch: 5000 distinct keys, one set
    n = 5000
    big = pa.table({"k": pa.array(range(n), pa.int64()),
                    "s": pa.array(["x"] * n, pa.string())})
    ds2 = ray.data.from_arrow(big).repartition(7)
    out2 = {r["set_name"]: r["est"]
            for r in sk.kmv_set_summary(ds2, "k", "s", "x", "y",
                                        k=64).take_all()}
    # relative error of KMV at k=64 is ~1/sqrt(62) ~ 13%; allow 4 sigma
    assert abs(out2["x"] - n) / n < 0.5
    assert out2["union"] == out2["x"]
    # brute-force the estimator arithmetic exactly
    h = np.sort(splitmix64(np.arange(n, dtype=np.uint64)))
    want = ((64 - 1) << 64) // int(h[63])
    assert out2["x"] == want
