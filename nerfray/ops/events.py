"""Windowed / sessionized aggregates over the ``events`` stream table —
the custom operator class Ray Data lacks natively (SURVEY.md §2.9 notes
the reference is batch-only; this is the engine's streaming-shaped
extension). Implemented as groupby(user).map_groups with a per-group
timestamp sort: the partitioning assumption is documented — all events of
one user fit one group (true at any scale where per-user history is
bounded; hot users would be range-split by day first).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

SESSION_GAP_MIN = 30


def _sessions(group: pa.Table, *, gap_min: int) -> pa.Table:
    ts = pc.cast(group.column("ts"), pa.int64()).to_numpy()  # microseconds
    order = np.argsort(ts, kind="stable")
    ts = ts[order]
    gaps = np.diff(ts) > gap_min * 60_000_000
    n_sessions = 1 + int(gaps.sum()) if len(ts) else 0
    # longest session length in events
    bounds = np.flatnonzero(gaps)
    sizes = np.diff(np.concatenate([[0], bounds + 1, [len(ts)]]))
    user = group.column("user_id").to_pylist()[0]
    return pa.Table.from_pydict({
        "user_id": pa.array([user], pa.int64()),
        "n_events": pa.array([len(ts)], pa.int64()),
        "n_sessions": pa.array([n_sessions], pa.int64()),
        "max_session_events": pa.array([int(sizes.max()) if len(sizes) else 0],
                                       pa.int64()),
    })


def sessionize(sf_dir: str, gap_min: int = SESSION_GAP_MIN) -> ray.data.Dataset:
    from nerfray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts"])
    return ds.groupby("user_id").map_groups(
        _sessions, fn_kwargs={"gap_min": gap_min}, batch_format="pyarrow")


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


def _asof_group(group: pa.Table) -> pa.Table:
    """Per-key as-of sweep: events matched to the latest order at or
    before their timestamp (ties on date broken by highest order key)."""
    kind = np.asarray(group.column("kind").to_pylist())
    ts = pc.cast(group.column("ats"), pa.int64()).to_numpy(
        zero_copy_only=False)
    ids = np.asarray(group.column("id").to_pylist(), dtype=np.int64)
    ev = kind == "e"
    e_ts, e_id = ts[ev], ids[ev]
    o_ts, o_id = ts[~ev], ids[~ev]
    # sort orders by (date, orderkey) so the rightmost match is the winner
    o_order = np.lexsort((o_id, o_ts))
    o_ts, o_id = o_ts[o_order], o_id[o_order]
    # last order with o_ts <= e_ts
    if len(o_id) == 0:
        last = np.full(len(e_id), -1, dtype=np.int64)
    else:
        idx = np.searchsorted(o_ts, e_ts, side="right") - 1
        last = np.where(idx >= 0, o_id[np.clip(idx, 0, None)], -1)
    return pa.Table.from_pydict({
        "event_id": pa.array(e_id, pa.int64()),
        "last_order": pa.array(last, pa.int64()),
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

    both = events.map_batches(_ev, batch_format="pyarrow").union(
        orders.map_batches(_od, batch_format="pyarrow"))
    return both.groupby("key").map_groups(_asof_group,
                                          batch_format="pyarrow")


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
