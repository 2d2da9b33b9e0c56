"""Windowed / sessionized aggregates over the ``events`` stream table —
the custom operator class Ray Data lacks natively (SURVEY.md §2.9 notes
the reference is batch-only; this is the engine's streaming-shaped
extension). Keyed ops group by a 64-way HASH BUCKET of the user/key
(one Python dispatch per bucket; the per-key sweeps run vectorized over
sorted runs inside). The partitioning assumption is documented — all
events of one user land in one bucket group (true at any scale where
per-user history is bounded; hot users would be range-split by day
first).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

SESSION_GAP_MIN = 30
N_KEY_BUCKETS = 64


def _user_bucket(batch: pa.Table) -> pa.Table:
    hb = pc.cast(pc.bit_wise_and(batch.column("user_id"),
                                 N_KEY_BUCKETS - 1), pa.int32())
    return batch.append_column("hb", hb)


def _sessions_bucket(group: pa.Table, *, gap_min: int) -> pa.Table:
    """Sessionize EVERY user in one hash bucket, fully vectorized:
    sort by (user, ts); a session starts at a user change or a gap;
    per-user rollups via reduceat over the sorted runs. One Python
    dispatch per bucket instead of per user."""
    us = group.column("user_id").to_numpy(zero_copy_only=False)
    ts = pc.cast(group.column("ts"), pa.int64()).to_numpy(
        zero_copy_only=False)  # microseconds
    if len(us) == 0:
        return pa.Table.from_pydict({
            "user_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "n_sessions": pa.array([], pa.int64()),
            "max_session_events": pa.array([], pa.int64())})
    order = np.lexsort((ts, us))
    u, t = us[order], ts[order]
    user_change = np.r_[True, u[1:] != u[:-1]]
    sess_start = user_change | np.r_[
        True, (t[1:] - t[:-1]) > gap_min * 60_000_000]
    ustarts = np.flatnonzero(user_change)
    n_events = np.diff(np.r_[ustarts, len(u)])
    n_sessions = np.add.reduceat(sess_start.astype(np.int64), ustarts)
    sstarts = np.flatnonzero(sess_start)
    sizes = np.diff(np.r_[sstarts, len(u)])
    # every user start is also a session start, so per-user session runs
    # begin at searchsorted positions in the session-start array
    first_sess = np.searchsorted(sstarts, ustarts)
    max_sess = np.maximum.reduceat(sizes, first_sess)
    return pa.Table.from_pydict({
        "user_id": pa.array(u[ustarts], pa.int64()),
        "n_events": pa.array(n_events, pa.int64()),
        "n_sessions": pa.array(n_sessions, pa.int64()),
        "max_session_events": pa.array(max_sess, pa.int64()),
    })


def sessionize(sf_dir: str, gap_min: int = SESSION_GAP_MIN) -> ray.data.Dataset:
    from nerfray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts"])
    return ds.map_batches(_user_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(
        _sessions_bucket, fn_kwargs={"gap_min": gap_min},
        batch_format="pyarrow")


def _hourly_partial(batch: pa.Table) -> pa.Table:
    """Pre-aggregate inside the batch (combiner) before the tiny groupby."""
    hours = pc.strftime(batch.column("ts"), format="%Y-%m-%d %H")
    et = batch.column("event_type")
    import collections
    cnt = collections.Counter(zip(hours.to_pylist(), et.to_pylist()))
    ks = sorted(cnt)
    return pa.Table.from_pydict({
        "hour": pa.array([k[0] for k in ks], pa.string()),
        "event_type": pa.array([k[1] for k in ks], pa.string()),
        "cnt": pa.array([cnt[k] for k in ks], pa.int64()),
    })


def hourly_counts(sf_dir: str) -> ray.data.Dataset:
    """Tumbling-window (1h) count per event type."""
    from nerfray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["ts", "event_type"])
    return ds.map_batches(_hourly_partial, batch_format="pyarrow") \
        .groupby(["hour", "event_type"]).sum("cnt") \
        .rename_columns({"sum(cnt)": "n_events"})


SLIDE_HOURS = 3


def _sliding_partial(batch: pa.Table, *, window_hours: int) -> pa.Table:
    """Combiner + window replication: per-batch (hour, type) counts, each
    emitted into every sliding window it contributes to (the classic
    replicate-into-windows shape — shuffle volume = hourly partials ×
    window span, never raw events)."""
    import collections
    import datetime
    trunc = pc.floor_temporal(batch.column("ts"), unit="hour")
    cnt = collections.Counter(zip(trunc.to_pylist(),
                                  batch.column("event_type").to_pylist()))
    wins, types, cs = [], [], []
    for (h, et), c in sorted(cnt.items()):
        for k in range(window_hours):
            wins.append(f"{h + datetime.timedelta(hours=k):%Y-%m-%d %H}")
            types.append(et)
            cs.append(c)
    return pa.Table.from_pydict({
        "win_end": pa.array(wins, pa.string()),
        "event_type": pa.array(types, pa.string()),
        "cnt": pa.array(cs, pa.int64()),
    })


def sliding_counts(sf_dir: str,
                   window_hours: int = SLIDE_HOURS) -> ray.data.Dataset:
    """Sliding-window (window_hours, 1h hop) count per event type: row
    (win_end, type, n) counts events in (win_end - window, win_end].
    Windows that received no contribution are absent (same convention as
    the SQL mirror)."""
    from nerfray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["ts", "event_type"])
    return ds.map_batches(_sliding_partial,
                          fn_kwargs={"window_hours": window_hours},
                          batch_format="pyarrow") \
        .groupby(["win_end", "event_type"]).sum("cnt") \
        .rename_columns({"sum(cnt)": "n_events"})


def _asof_one_key(ts, ids, kind_is_event):
    """Numpy as-of sweep for ONE key's rows (already co-located)."""
    e_ts, e_id = ts[kind_is_event], ids[kind_is_event]
    o_ts, o_id = ts[~kind_is_event], ids[~kind_is_event]
    # sort orders by (date, orderkey) so the rightmost match is the winner
    o_order = np.lexsort((o_id, o_ts))
    o_ts, o_id = o_ts[o_order], o_id[o_order]
    if len(o_id) == 0:
        last = np.full(len(e_id), -1, dtype=np.int64)
    else:
        idx = np.searchsorted(o_ts, e_ts, side="right") - 1
        last = np.where(idx >= 0, o_id[np.clip(idx, 0, None)], -1)
    return e_id, last


def _asof_bucket(group: pa.Table) -> pa.Table:
    """As-of sweep for EVERY key in one hash bucket: sort rows by key,
    run the vectorized per-key sweep over each contiguous run (one
    Python dispatch per bucket, numpy inside)."""
    keys = group.column("key").to_numpy(zero_copy_only=False)
    kind = np.asarray(group.column("kind").to_pylist())
    ts = pc.cast(group.column("ats"), pa.int64()).to_numpy(
        zero_copy_only=False)
    ids = np.asarray(group.column("id").to_pylist(), dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    keys, kind, ts, ids = keys[order], kind[order], ts[order], ids[order]
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]]) \
        if len(keys) else np.array([], dtype=np.int64)
    out_e, out_l = [], []
    bounds = np.r_[starts, len(keys)]
    for i in range(len(starts)):
        lo, hi = bounds[i], bounds[i + 1]
        e_id, last = _asof_one_key(ts[lo:hi], ids[lo:hi],
                                   kind[lo:hi] == "e")
        out_e.append(e_id)
        out_l.append(last)
    e_all = np.concatenate(out_e) if out_e else np.array([], dtype=np.int64)
    l_all = np.concatenate(out_l) if out_l else np.array([], dtype=np.int64)
    return pa.Table.from_pydict({
        "event_id": pa.array(e_all, pa.int64()),
        "last_order": pa.array(l_all, pa.int64()),
    })


def asof_last_order(sf_dir: str) -> ray.data.Dataset:
    """As-of join (custom operator — Ray Data has no native one): each
    event joined to the user's most recent order at or before the event
    time. Both sides are re-keyed to a common (key, kind, ats, id) shape,
    unioned, hash-co-located by key, and swept per group — the standard
    partition-both-sides-by-key pattern; at scale the groupby is the one
    bounded shuffle and each group holds one user's history."""
    from nerfray.sources.parquet import read_parquet_clean
    events = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                                columns=["event_id", "user_id", "ts"])
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def _ev(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "key": pc.cast(batch.column("user_id"), pa.int64()),
            "kind": pa.array(["e"] * len(batch), pa.string()),
            "ats": pc.cast(batch.column("ts"), pa.timestamp("us")),
            "id": pc.cast(batch.column("event_id"), pa.int64()),
        })

    def _od(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "key": pc.cast(batch.column("o_custkey"), pa.int64()),
            "kind": pa.array(["o"] * len(batch), pa.string()),
            "ats": pc.cast(batch.column("o_orderdate"), pa.timestamp("us")),
            "id": pc.cast(batch.column("o_orderkey"), pa.int64()),
        })

    def _kb(batch: pa.Table) -> pa.Table:
        hb = pc.cast(pc.bit_wise_and(batch.column("key"),
                                     N_KEY_BUCKETS - 1), pa.int32())
        return batch.append_column("hb", hb)

    both = events.map_batches(_ev, batch_format="pyarrow").union(
        orders.map_batches(_od, batch_format="pyarrow"))
    return both.map_batches(_kb, batch_format="pyarrow") \
        .groupby("hb").map_groups(_asof_bucket, batch_format="pyarrow")


ORACLES = {
    "events_asof_order": """
SELECT e.event_id,
       coalesce((SELECT o.o_orderkey FROM orders o
                 WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
                 ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1),
                -1)::BIGINT AS last_order
FROM events e ORDER BY e.event_id
""",
    "events_sessionize": f"""
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL {SESSION_GAP_MIN} MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
sess AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM ordered
),
per_sess AS (
  SELECT user_id, sess_id, count(*) AS sz FROM sess GROUP BY user_id, sess_id
)
SELECT user_id, sum(sz)::BIGINT AS n_events,
       count(*)::BIGINT AS n_sessions,
       max(sz)::BIGINT AS max_session_events
FROM per_sess GROUP BY user_id ORDER BY user_id
""",
    "events_hourly": """
SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
       count(*)::BIGINT AS n_events
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
    "events_sliding": f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS c
  FROM events GROUP BY 1, 2
),
wins AS (
  SELECT h + k * INTERVAL 1 HOUR AS we, event_type, c
  FROM hourly, unnest(generate_series(0, {SLIDE_HOURS - 1})) AS t(k)
)
SELECT strftime(we, '%Y-%m-%d %H') AS win_end, event_type,
       sum(c)::BIGINT AS n_events
FROM wins GROUP BY 1, 2 ORDER BY 1, 2
""",
}
