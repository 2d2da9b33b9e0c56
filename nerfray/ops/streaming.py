"""Event-time watermark semantics over a replayed stream.

The events family (ops/events.py) aggregates by event time; this module
adds the STREAMING-side semantics those pipelines meet in production:
given a replayed arrival order (event_id — the order a log shipper
would deliver), a low watermark trails the running max event-time by an
allowed lateness, and rows arriving behind it are LATE — they'd miss
their window and go to a side output (the Beam/Flink watermark model —
public concept, implemented from scratch; the reference engine has no
streaming surface).

Scale shape: arrival order is recovered without a global sort — the
same two-pass range decomposition as ops/rank.py's sample-sort family:
(1) per-range event-time maxima (one tiny row per range, <= n_ranges to
the driver), an exclusive prefix-max over ranges (n_ranges floats of
driver state, bounded by the knob, never O(rows)); (2) one range-keyed
co-group where each range computes its in-range running max vectorized
(np.maximum.accumulate) seeded with the carry-in, emitting late rows
only.  Nothing event-proportional reaches the driver.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import ray.data

LATENESS_US = 60_000_000
N_RANGES = 256

_I64_MIN = np.iinfo(np.int64).min


def planted_disordered_events(events: ray.data.Dataset
                              ) -> ray.data.Dataset:
    """Deterministically disorder the events stream: every 7th event's
    timestamp is pulled back by (event_id % 97) * 10 s — arithmetic the
    SQL mirror replays exactly.  (The synthetic events table is
    strictly time-ordered, so watermark semantics need planted
    disorder, the same pattern as the planted graph/dup corpora.)"""

    def _jitter(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").to_numpy(
            zero_copy_only=False).astype("int64")
        back = np.where(eid % 7 == 0, (eid % 97) * 10_000_000, 0)
        out = (ts - back).view("datetime64[us]")
        return pa.Table.from_pydict({
            "event_id": pa.array(eid, pa.int64()),
            "user_id": batch.column("user_id"),
            "ts": pa.array(out, pa.timestamp("us")),
        })

    return events.select_columns(["event_id", "user_id", "ts"]) \
        .map_batches(_jitter, batch_format="pyarrow",
                     zero_copy_batch=True)


_LATE_SCHEMA = pa.schema([("event_id", pa.int64()),
                          ("user_id", pa.int64()),
                          ("late_by_us", pa.int64())])


def _range_bucket(batch: pa.Table, *, width: int) -> pa.Table:
    eid = batch.column("event_id").to_numpy(zero_copy_only=False)
    return batch.append_column(
        "rng", pa.array((eid // width).astype(np.int32), pa.int32()))


def _late_bucket(group: pa.Table, *, prefix: np.ndarray, width: int,
                 lateness_us: int) -> pa.Table:
    """One arrival-order range: in-range running max seeded with the
    cross-range carry-in; emit late rows only."""
    if group.num_rows == 0:
        return _LATE_SCHEMA.empty_table()
    eid = group.column("event_id").to_numpy(zero_copy_only=False)
    ts = group.column("ts").to_numpy(
        zero_copy_only=False).astype("int64")
    uid = group.column("user_id").to_numpy(zero_copy_only=False)
    order = np.argsort(eid, kind="stable")
    eid, ts, uid = eid[order], ts[order], uid[order]
    rng = int(eid[0] // width)
    carry = prefix[rng]
    run = np.maximum.accumulate(ts)
    wm = np.r_[carry, np.maximum(run[:-1], carry)]
    # no-predecessor rows (wm still at the sentinel) are never late;
    # mask them out BEFORE the subtraction to avoid int64 wraparound
    late_by = wm - ts
    late = (wm != _I64_MIN) & (late_by > lateness_us)
    return pa.Table.from_pydict({
        "event_id": pa.array(eid[late], pa.int64()),
        "user_id": pa.array(uid[late], pa.int64()),
        "late_by_us": pa.array(late_by[late], pa.int64()),
    }, schema=_LATE_SCHEMA)


def late_events(events: ray.data.Dataset, *,
                lateness_us: int = LATENESS_US,
                n_ranges: int = N_RANGES) -> ray.data.Dataset:
    """(event_id, user_id, late_by_us): rows that arrive (in event_id
    replay order) more than ``lateness_us`` behind the running
    event-time high-water mark.  late_by_us = watermark - ts at
    arrival.  Mirrored by LATE_EVENTS_SQL (running-max window)."""
    n = int(events.max("event_id")) + 1
    width = max((n + n_ranges - 1) // n_ranges, 1)

    tagged = events.select_columns(["event_id", "user_id", "ts"]) \
        .map_batches(_range_bucket, fn_kwargs={"width": width},
                     batch_format="pyarrow",
                     zero_copy_batch=True).materialize()

    def _max_partial(batch: pa.Table) -> pa.Table:
        rng = batch.column("rng").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").to_numpy(
            zero_copy_only=False).astype("int64")
        order = np.argsort(rng, kind="stable")
        r_s, t_s = rng[order], ts[order]
        starts = np.flatnonzero(np.r_[True, r_s[1:] != r_s[:-1]])
        return pa.Table.from_pydict({
            "rng": pa.array(r_s[starts], pa.int32()),
            "mx": pa.array(np.maximum.reduceat(t_s, starts),
                           pa.int64()),
        })

    # <= n_ranges rows to the driver; exclusive prefix max over ranges
    rows = tagged.map_batches(_max_partial, batch_format="pyarrow") \
        .groupby("rng").max("mx").take_all()
    n_rng = (n + width - 1) // width
    mx = np.full(n_rng, _I64_MIN, np.int64)
    for r in rows:
        mx[r["rng"]] = r["max(mx)"]
    prefix = np.r_[_I64_MIN, np.maximum.accumulate(mx)[:-1]]

    return tagged.groupby("rng").map_groups(
        functools.partial(_late_bucket, prefix=prefix, width=width,
                          lateness_us=lateness_us),
        batch_format="pyarrow")


LATE_EVENTS_SQL = f"""
WITH d AS (
  SELECT event_id, user_id,
    CASE WHEN event_id % 7 = 0
         THEN ts - to_microseconds(((event_id % 97)
                                    * 10000000)::BIGINT)
         ELSE ts END AS ts
  FROM events
),
m AS (
  SELECT event_id, user_id, ts,
         max(ts) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS wm
  FROM d
)
SELECT event_id, user_id,
       date_diff('microsecond', ts, wm)::BIGINT AS late_by_us
FROM m
WHERE date_diff('microsecond', ts, wm) > {LATENESS_US}
ORDER BY event_id
"""
