"""Hot-key-safe event operators: the (user, day) range-split paths must
equal the unsplit SQL oracles on a corpus with a PLANTED HOT USER whose
history spans many days and parquet row groups (the case the split
exists for), including sessions that straddle midnight boundaries."""

import datetime

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def hot_dir(tmp_path_factory):
    rng = np.random.default_rng(42)
    base = datetime.datetime(2024, 3, 1)

    ev_user, ev_ts = [], []
    # hot user 7: 6000 events over 12 days; gaps drawn so many sessions
    # cross the midnight range boundary (gap < 30 min across days)
    t = base
    for _ in range(6000):
        # mixture: mostly short gaps, occasional > 30 min session breaks
        if rng.random() < 0.03:
            t += datetime.timedelta(minutes=int(rng.integers(31, 600)))
        else:
            t += datetime.timedelta(minutes=int(rng.integers(1, 15)))
        ev_user.append(7)
        ev_ts.append(t)
    # 40 normal users, ~25 events each, some with zero orders
    for u in range(100, 140):
        t = base + datetime.timedelta(minutes=int(rng.integers(0, 5000)))
        for _ in range(25):
            t += datetime.timedelta(minutes=int(rng.integers(1, 120)))
            ev_user.append(u)
            ev_ts.append(t)

    n = len(ev_user)
    events = pa.Table.from_pydict({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array(ev_user, pa.int64()),
        "ts": pa.array(ev_ts, pa.timestamp("us")),
        "event_type": pa.array(["x"] * n, pa.string()),
    })

    od_user, od_ts = [], []
    # hot user gets orders on some days only; half the normal users none
    for d in (0, 1, 4, 9):
        od_user.append(7)
        od_ts.append(base + datetime.timedelta(days=d, hours=13))
    for u in range(100, 140, 2):
        od_user.append(u)
        od_ts.append(base + datetime.timedelta(
            minutes=int(rng.integers(0, 20000))))
    # duplicate-date orders to exercise the (ts, id) tie-break
    od_user += [7, 7]
    od_ts += [base + datetime.timedelta(days=4, hours=13)] * 2
    m = len(od_user)
    orders = pa.Table.from_pydict({
        "o_orderkey": pa.array(range(1000, 1000 + m), pa.int64()),
        "o_custkey": pa.array(od_user, pa.int64()),
        "o_orderdate": pa.array(od_ts, pa.timestamp("us")),
    })

    d = tmp_path_factory.mktemp("hotuser")
    pq.write_table(events, str(d / "events.parquet"), row_group_size=500)
    pq.write_table(orders, str(d / "orders.parquet"))
    return str(d)


def test_sessionize_split_hot_user_matches_oracle(ray_session, hot_dir):
    from nerfray.ops import events as ev
    got = sorted(
        (r["user_id"], r["n_events"], r["n_sessions"],
         r["max_session_events"])
        for r in ev.sessionize_split(hot_dir).take_all())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{hot_dir}/events.parquet'")
    exp = sorted(tuple(r) for r in
                 con.sql(ev.ORACLES["events_sessionize"]).fetchall())
    assert got == exp
    hot = [g for g in got if g[0] == 7][0]
    assert hot[1] == 6000 and hot[2] > 10  # genuinely multi-day, multi-session


def test_asof_split_hot_user_matches_oracle(ray_session, hot_dir):
    from nerfray.ops import events as ev
    got = sorted((r["event_id"], r["last_order"])
                 for r in ev.asof_last_order_split(hot_dir).take_all())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{hot_dir}/events.parquet'")
    con.sql(f"CREATE VIEW orders AS SELECT * FROM "
            f"'{hot_dir}/orders.parquet'")
    exp = sorted(tuple(r) for r in
                 con.sql(ev.ORACLES["events_asof_order"]).fetchall())
    assert got == exp
    # sanity: both carry resolution (-1 before first order / no-order
    # users) and cross-day carries are exercised
    lasts = dict(got)
    assert -1 in lasts.values()


def test_window_selfjoin_ties_and_edges(ray_session, tmp_path):
    """Windowed self-join tie semantics: same-ts pairs excluded (strict
    a.ts < b.ts), the exact-W boundary included (b.ts <= a.ts + W),
    W+1us excluded, pairless users absent — all vs the SQL oracle."""
    from nerfray.ops import events as ev
    base = datetime.datetime(2024, 5, 1)
    w = datetime.timedelta(minutes=ev.WINDOW_MIN)
    us_ = datetime.timedelta(microseconds=1)
    rows = [
        # user 1: signup then purchase at EXACTLY ts + W (inclusive edge)
        (1, base, "signup"), (1, base + w, "purchase"),
        # user 2: follow-up at W + 1us -> no pair at all
        (2, base, "signup"), (2, base + w + us_, "purchase"),
        # user 3: two events at the SAME ts -> tie, no pair
        (3, base, "click"), (3, base, "click"),
        # user 4: signup with same-ts purchase (tie, not a conversion)
        #         plus a later purchase inside the window
        (4, base, "signup"), (4, base, "purchase"),
        (4, base + datetime.timedelta(minutes=5), "purchase"),
        # user 5: lone event
        (5, base, "error"),
    ]
    t = pa.Table.from_pydict({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = sorted((r["user_id"], r["n_pairs"], r["n_conv"])
                 for r in ev.window_selfjoin(str(tmp_path)).take_all())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{tmp_path}/events.parquet'")
    exp = sorted(tuple(r) for r in
                 con.sql(ev.ORACLES["events_window_selfjoin"]).fetchall())
    assert got == exp
    # the edges this test exists for, stated directly:
    assert got == [(1, 1, 1),   # boundary pair IS a conversion
                   (4, 2, 1)]   # same-ts tie dropped; users 2,3,5 absent


def test_window_selfjoin_hot_user_matches_oracle(ray_session, hot_dir):
    from nerfray.ops import events as ev
    got = sorted((r["user_id"], r["n_pairs"], r["n_conv"])
                 for r in ev.window_selfjoin(hot_dir).take_all())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{hot_dir}/events.parquet'")
    exp = sorted(tuple(r) for r in
                 con.sql(ev.ORACLES["events_window_selfjoin"]).fetchall())
    assert got == exp
    assert any(g[0] == 7 and g[1] > 10_000 for g in got)  # hot user pairs


def _scan_oracle(con, sql):
    return sorted(tuple(r) for r in con.sql(sql).fetchall())


def test_cumsum_and_trend_tied_ts_match_oracle(ray_session, tmp_path):
    """Per-key scan ops on a planted table with duplicate timestamps
    (event_id tiebreak), negative values, and a single-event user."""
    import duckdb
    import pyarrow.parquet as pq
    from nerfray.ops import events as ev
    base = datetime.datetime(2024, 5, 1)
    rows = [  # (user, minute-offset, value)
        (1, 0, 2.50), (1, 0, -1.25), (1, 5, 10.00),   # tie at t=0
        (2, 3, 0.05), (2, 1, 7.75), (2, 2, -0.10),
        (3, 9, 4.00),                                  # singleton
    ]
    t = pa.Table.from_pydict({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([base + datetime.timedelta(minutes=r[1])
                        for r in rows], pa.timestamp("us")),
        "event_type": pa.array(["x"] * len(rows), pa.string()),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{tmp_path}/events.parquet'")
    got = sorted((r["event_id"], r["user_id"], r["cum_cents"])
                 for r in ev.cumsum_per_user(str(tmp_path)).take_all())
    assert got == _scan_oracle(con, ev.ORACLES["events_cumsum"])
    # tie broken by event_id: row 0 (+250) before row 1 (-125)
    assert dict((g[0], g[2]) for g in got)[1] == 125
    got_t = sorted(
        (r["user_id"], r["n_events"], r["trend_num"], r["trend_den"])
        for r in ev.trend_per_user(str(tmp_path)).take_all())
    assert got_t == _scan_oracle(con, ev.ORACLES["events_trend"])
    # a singleton group has an undefined slope: 0/0, never a crash
    assert got_t[-1] == (3, 1, 0, 0)


def test_cumsum_block_structure_invariance(ray_session):
    """The segmented scan must not depend on how input rows are split
    into blocks (the key-bucket shuffle re-collects each user)."""
    import ray.data
    from nerfray.ops import events as ev
    from nerfray.sources.parquet import read_parquet_clean
    sf = "/root/testdata/sf0.001"
    ds = read_parquet_clean(sf + "/events.parquet",
                            columns=["user_id", "ts", "event_id", "value"])
    want = None
    for parts in (1, 17):
        out = ds.repartition(parts) \
            .map_batches(ev._prep_cents, batch_format="pyarrow") \
            .groupby("hb").map_groups(ev._cumsum_bucket,
                                      batch_format="pyarrow")
        got = sorted((r["event_id"], r["cum_cents"])
                     for r in out.take_all())
        if want is None:
            want = got
        assert got == want, parts


def test_compact_latest_combiner_invariance(ray_session, tmp_path):
    """Argmax-of-argmaxes must equal the global argmax for any block
    structure, with ties on ts broken by event_id."""
    import duckdb
    import pyarrow.parquet as pq
    import ray.data
    from nerfray.ops import events as ev
    from nerfray.sources.parquet import read_parquet_clean
    base = datetime.datetime(2024, 6, 1)
    rows = [  # (user, type, minute, value) — user 1 has a ts tie
        (1, "a", 5, 1.00), (1, "a", 5, 2.00), (1, "b", 1, 3.00),
        (2, "a", 9, 4.00), (2, "a", 2, 5.00),
    ]
    t = pa.Table.from_pydict({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([base + datetime.timedelta(minutes=r[2])
                        for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{tmp_path}/events.parquet'")
    want = _scan_oracle(con, ev.ORACLES["events_compact"])
    got = sorted(
        (r["user_id"], r["event_type"], r["ats"], r["event_id"],
         r["cents"])
        for r in ev.compact_latest(str(tmp_path)).take_all())
    assert got == want
    # the ts tie resolves to the HIGHER event_id (row 1, value 2.00)
    assert (1, "a", got[0][2], 1, 200) == got[0]
    # block-structure invariance on real data
    sf = "/root/testdata/sf0.001"
    ds = read_parquet_clean(
        sf + "/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type", "value"])
    ref = None
    for parts in (1, 13):
        out = ds.repartition(parts) \
            .map_batches(ev._compact_partial, batch_format="pyarrow") \
            .map_batches(lambda b: b.append_column(
                "hb", pa.array((b.column("user_id").to_numpy(
                    zero_copy_only=False) & 63).astype("int32"))),
                batch_format="pyarrow") \
            .groupby("hb").map_groups(ev._compact_bucket,
                                      batch_format="pyarrow")
        got = sorted(tuple(sorted(r.items())) for r in out.take_all())
        if ref is None:
            ref = got
        assert got == ref, parts


def test_funnel_strict_order_and_ties(ray_session):
    """Strict-'>' progression: same-timestamp stage events do NOT
    advance the funnel; out-of-order users don't count."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from nerfray.ops import events as ev

    rows = [
        # user 1: clean v < c < p  -> all three
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # user 2: click BEFORE view -> stops at view
        (2, 20, "click"), (2, 30, "view"),
        # user 3: click at SAME ts as first view -> tie not counted
        (3, 10, "view"), (3, 10, "click"),
        # user 4: v, c then purchase at same ts as click -> stops at c
        (4, 1, "view"), (4, 2, "click"), (4, 2, "purchase"),
        # user 5: no view at all
        (5, 5, "click"), (5, 6, "purchase"),
        # user 6: second view before click counts (first view earlier)
        (6, 1, "view"), (6, 9, "view"), (6, 5, "click"),
        (6, 7, "purchase"),
    ]
    t = pa.Table.from_pydict({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(
            np.array([r[1] for r in rows], dtype="datetime64[us]")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    got = {r["stage"]: r["n_users"] for r in ds.map_batches(
        ev._user_bucket, batch_format="pyarrow")
        .groupby("hb").map_groups(
            ev._funnel_bucket, fn_kwargs={"stages": ev.FUNNEL_STAGES},
            batch_format="pyarrow")
        .groupby("stage").sum("n")
        .rename_columns({"sum(n)": "n_users"}).take_all()}
    # views: users 1,2,3,4,6; view>click: 1,4,6; full: 1,6
    assert got == {"view": 5, "view>click": 3,
                   "view>click>purchase": 2}


def test_temporal_two_key_search_brute_force(ray_session):
    """The merged-lexsort as-of search == a per-probe Python scan,
    including exact v_start == ts ties (closed start), probes before
    any version, and probes of absent users."""
    import numpy as np
    from nerfray.ops import events as ev

    du = np.array([1, 1, 1, 2, 2], dtype=np.int64)
    dt = np.array([10, 20, 30, 5, 50], dtype=np.int64)
    pu = np.array([1, 1, 1, 2, 2, 3], dtype=np.int64)
    pt = np.array([9, 20, 35, 4, 60, 100], dtype=np.int64)
    idx = ev._asof_two_key_search(du, dt, pu, pt)

    def brute(u, t):
        best = -1
        for i in range(len(du)):
            if (du[i], dt[i]) <= (u, t):
                best = i
        return best

    assert idx.tolist() == [brute(u, t) for u, t in zip(pu, pt)]
    # caller-side user check drops cross-user and absent-user hits
    matched = (idx >= 0) & (du[np.maximum(idx, 0)] == pu)
    assert matched.tolist() == [False, True, True, False, True, False]


def test_moving_sum_frame_never_crosses_users(ray_session, tmp_path):
    """Brute-force check of the cumsum-difference frame: first events
    of a user must NOT see the previous user's values, partial frames
    sum what exists, ties order by event_id."""
    import os
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from nerfray.ops import events as ev

    base = np.datetime64("2024-01-01T00:00:00", "us")
    # two users interleaved, one ts tie inside user 1
    rows = [  # (event_id, user, ts_offset_s, cents)
        (0, 1, 0, 100), (1, 2, 0, 7), (2, 1, 10, 200),
        (3, 1, 10, 400), (4, 2, 5, 11), (5, 1, 20, 800),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([base + np.timedelta64(r[2], "s") for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array(["click"] * len(rows), pa.string()),
        "value": pa.array([r[3] / 100 for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    got = {r["event_id"]: r["msum_cents"]
           for r in ev.moving_sum(str(tmp_path), k=3).take_all()}
    # user 1 order: 0(100), 2(200), 3(400) [tie by event_id], 5(800)
    # user 2 order: 1(7), 4(11)
    assert got == {0: 100, 2: 300, 3: 700, 5: 1400, 1: 7, 4: 18}
