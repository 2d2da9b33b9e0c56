"""Bucketed-table co-partitioned join + gaps-and-islands streaks."""

import datetime
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_streaks_brute_force(ray_session, tmp_path):
    # planted calendars: user 1 = one unbroken 5-day run (many events
    # per day so the distinct-partial matters); user 2 = singleton days
    # with gaps; user 3 = two runs 3+2; user 4 = one day
    days = {
        1: [0, 1, 2, 3, 4],
        2: [0, 2, 4, 8],
        3: [1, 2, 3, 7, 8],
        4: [5],
    }
    base = datetime.datetime(2024, 1, 1)
    us, ts = [], []
    for u, dl in days.items():
        for d in dl:
            for hour in (0, 9, 23):  # several events per active day
                us.append(u)
                ts.append(base + datetime.timedelta(days=d, hours=hour))
    t = pa.Table.from_pydict({
        "user_id": pa.array(us, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    # tiny row groups force the distinct partial to merge across blocks
    pq.write_table(t, sf / "events.parquet", row_group_size=4)

    from nerfray.ops.events import activity_streaks
    got = {r["user_id"]: r
           for r in activity_streaks(str(sf)).take_all()}

    for u, dl in days.items():
        dl = sorted(set(dl))
        runs, cur = [], 1
        for a, b in zip(dl, dl[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        assert got[u]["n_active_days"] == len(dl)
        assert got[u]["n_streaks"] == len(runs)
        assert got[u]["max_streak"] == max(runs)


def test_bucketed_join_matches_plain_sql(ray_session):
    from nerfray.ops.bucketed import BUCKETED_JOIN_SQL, join_bucketed_rollup
    got = join_bucketed_rollup(SF).take_all()
    con = duckdb.connect()
    for tname in ("orders", "lineitem"):
        con.sql(f"CREATE VIEW {tname} AS SELECT * FROM "
                f"read_parquet('{SF}/{tname}.parquet')")
    want = con.sql(BUCKETED_JOIN_SQL).fetchall()
    key = lambda r: (r[0], r[1])  # noqa: E731
    got_m = {(r["o_orderstatus"], r["l_returnflag"]):
             (r["n_items"], r["revenue_u"]) for r in got}
    want_m = {key(r): (r[2], r[3]) for r in want}
    assert got_m == want_m


def test_bucketed_layout_is_copartitioned(ray_session):
    # every row landed in bkt=K must hash to K under the SHARED
    # key_bucket — the invariant that makes the bucket-local join exact
    from nerfray.ops._shuffle import key_bucket
    from nerfray.ops.bucketed import N_TABLE_BUCKETS, _bucketed_layout
    odir, ldir = _bucketed_layout(SF)
    for d, col in ((odir, "o_orderkey"), (ldir, "l_orderkey")):
        seen = 0
        for b in range(N_TABLE_BUCKETS):
            sub = os.path.join(d, f"bkt={b}")
            if not os.path.isdir(sub):
                continue
            import pyarrow.dataset as pads
            keys = pads.dataset(sub).to_table(columns=[col]).column(col)
            hb = key_bucket(keys.combine_chunks(),
                            N_TABLE_BUCKETS).to_numpy()
            assert (hb == b).all()
            seen += len(hb)
        assert seen > 0
