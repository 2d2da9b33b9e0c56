"""Zone-map pruned scan: footer-only statistics, file skipping, and
oracle equality on a synthetic events table."""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nerfray.ops import zonemap as zm


@pytest.fixture()
def events_dir(tmp_path):
    """200 events across 200 hours, values in cents-exact doubles."""
    n = 200
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + (np.arange(n) * 3600_000_000).astype("timedelta64[us]")
    t = pa.Table.from_pydict({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(np.arange(n) % 7, pa.int64()),
        "event_type": pa.array([f"t{i % 3}" for i in range(n)],
                               pa.string()),
        "value": pa.array((np.arange(n) * 13 % 997) / 100.0,
                          pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


def test_zonemap_scan_matches_oracle_and_prunes(ray_session, events_dir):
    got = sorted((r["event_type"], r["n_events"], r["sum_cents"])
                 for r in zm.zonemap_scan_query(events_dir).take_all())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{events_dir}/events.parquet')")
    want = sorted(map(tuple, con.sql(zm.ZONEMAP_SQL).fetchall()))
    assert got == want and len(got) == 3


def test_zone_map_from_footers_and_skipping(ray_session, events_dir):
    """The zone map covers every row, ranges are disjoint-ascending,
    and a narrow probe reads strictly fewer files than exist."""
    import tempfile
    import shutil
    ds = zm._events_ts_us(events_dir)
    out = tempfile.mkdtemp(prefix="nerfray_zm_test_")
    try:
        zm.export_time_layout(ds, out)
        zmap = zm.build_zone_map(out)
        assert zmap.column("n_rows").to_pandas().sum() == 200
        lo = zmap.column("zmin").to_numpy()
        hi = zmap.column("zmax").to_numpy()
        assert (lo <= hi).all()
        # narrow probe inside one file's range -> most files skipped
        res, stats = zm.pruned_range_rollup(zmap, int(lo[0]), int(hi[0]))
        assert stats["files_read"] < stats["files_total"]
        n = sum(r["n_events"] for r in res.take_all())
        # brute force: rows with ts_us in [lo[0], hi[0]]
        rows = ds.take_all()
        want = sum(1 for r in rows if lo[0] <= r["ts_us"] <= hi[0])
        assert n == want > 0
        # empty probe: range below the table -> zero files read
        res0, st0 = zm.pruned_range_rollup(zmap, 0, 1)
        assert st0["files_read"] == 0 and res0.count() == 0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_zorder_key_is_morton_interleave():
    """zorder_key == per-bit Python Morton interleave (vectorized
    kernel pinned against the definition)."""
    a = np.array([0, 1, 2, 3, 2**31 - 1, 12345], dtype=np.uint64)
    b = np.array([0, 3, 1, 3, 0, 67890], dtype=np.uint64)
    got = zm.zorder_key(a, b)

    def brute(x, y):
        out = 0
        for i in range(32):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    assert got.tolist() == [brute(int(x), int(y))
                            for x, y in zip(a, b)]


def test_zorder_scan_matches_oracle_and_prunes_both_dims(ray_session,
                                                         events_dir):
    got = sorted((r["event_type"], r["n_events"], r["sum_cents"])
                 for r in zm.zorder_scan_query(events_dir).take_all())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{events_dir}/events.parquet')")
    want = sorted(map(tuple, con.sql(zm.ZORDER_SQL).fetchall()))
    assert got == want


def test_zorder_layout_prunes_each_dimension(ray_session):
    """On a balanced (16 users x 16 hours) grid, the Morton layout
    keeps files tight in BOTH dimensions: a narrow probe on either
    user_id alone or time alone skips files. (Z-order's win needs
    comparable bit ranges per dimension — a 7-user x 200-hour table
    degenerates to a time sort, which is why this fixture is a grid.)"""
    import tempfile
    import shutil
    import ray.data
    n = 256
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    t = pa.Table.from_pydict({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts_us": pa.array(base + (np.arange(n) % 16) * 3600_000_000,
                          pa.int64()),
        "user_id": pa.array(np.arange(n) // 16, pa.int64()),
        "event_type": pa.array(["t"] * n, pa.string()),
        "cents": pa.array(np.arange(n), pa.int64()),
    })
    ds = ray.data.from_arrow(t)
    out = tempfile.mkdtemp(prefix="nerfray_zo_test_")
    try:
        zm.export_zorder_layout(ds, out, n_parts=8)
        zmap = zm.build_zone_map_multi(out, ("user_id", "ts_us"))
        assert zmap.column("n_rows").to_pandas().sum() == n
        g0 = int(min(zmap.column("ts_us_min").to_pylist()))
        # user-only narrow probe (first 2 of 16 users)
        res_u, st_u = zm.pruned_conjunctive_rollup(
            zmap, {"user_id": (0, 1), "ts_us": (0, 10**18)})
        # time-only narrow probe (first 2 of 16 hours)
        res_t, st_t = zm.pruned_conjunctive_rollup(
            zmap, {"user_id": (0, 10**9),
                   "ts_us": (g0, g0 + 3600_000_000)})
        assert st_u["files_read"] < st_u["files_total"]
        assert st_t["files_read"] < st_t["files_total"]
        # pruning is semantics-invisible: counts equal brute force
        assert sum(r["n_events"] for r in res_u.take_all()) == 32
        assert sum(r["n_events"] for r in res_t.take_all()) == 32
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_file_bloom_prunes_time_localized_users(ray_session, tmp_path):
    # users are time-localized (user u active only in hour-block u), so
    # the time layout puts each user in few files: the Bloom index must
    # prune, and a missing key must read ZERO files (no false negatives
    # by construction; false positives allowed but 1024-bit/4-hash
    # filters on ~25 distinct keys per file make them unlikely)
    n_users, per_user = 16, 25
    base = np.datetime64("2024-01-01T00:00:00", "us")
    us, ts = [], []
    for u in range(n_users):
        for i in range(per_user):
            us.append(u)
            ts.append(base + np.timedelta64(
                u * 3600_000_000 + i * 60_000_000, "us"))
    n = len(us)
    t = pa.Table.from_pydict({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(us, pa.int64()),
        "event_type": pa.array([f"t{i % 3}" for i in range(n)]),
        "value": pa.array((np.arange(n) * 13 % 997) / 100.0),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))

    import shutil
    import tempfile
    out = tempfile.mkdtemp(prefix="nerfray_fb_test_")
    try:
        zm.export_time_layout(zm._events_full_ts_us(str(tmp_path)), out)
        index = zm.build_file_blooms(out, column="user_id")
        assert index.num_rows >= 4  # layout actually split
        res, st = zm.bloom_pruned_point_rollup(index, 3)
        assert st["files_read"] < st["files_total"]
        rows = res.take_all()
        assert sum(r["n_events"] for r in rows) == per_user
        # exact rollup vs brute force
        mask = np.array(us) == 3
        want = int(np.rint(
            (np.arange(n)[mask] * 13 % 997) / 100.0 * 100).sum())
        assert sum(r["sum_cents"] for r in rows) == want
        # absent key: every file pruned (bar improbable FPs), 0 rows
        res0, st0 = zm.bloom_pruned_point_rollup(index, 10**12 + 17)
        assert st0["files_read"] == 0
        assert res0.take_all() == []
    finally:
        shutil.rmtree(out, ignore_errors=True)
