"""Windowed / sessionized aggregates over the ``events`` stream table —
the custom operator class Ray Data lacks natively (SURVEY.md §2.9 notes
the reference is batch-only; this is the engine's streaming-shaped
extension). Keyed ops group by a 64-way HASH BUCKET of the user/key
(one Python dispatch per bucket; the per-key sweeps run vectorized over
sorted runs inside). The plain paths assume a user's history fits one
group; the ``*_split`` variants (sessionize_split, asof_last_order_split)
remove that assumption by keying on (user, day) and stitching range
boundaries — same answers, same SQL oracles, group size bounded by one
user-day (pinned by tests/test_events_split.py's planted hot user).
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


# -- hot-key-safe sessionize: (user, day) range split + boundary stitch ------
#
# The plain path co-locates a user's ENTIRE history in one group — fine
# until one hot user outgrows a worker. The split path keys the first
# pass by (user, time-range): per-range session runs are computed
# exactly as before, each range also reporting its first/last event ts
# and first/last session sizes; a second, RANGE-GRAIN pass per user
# (rows = user-ranges, tiny) folds consecutive ranges in time order,
# merging the boundary sessions whenever the cross-range gap is within
# the threshold. Per-range interior maxima stay valid candidates (any
# within-range run is a subset of a true session), and every true
# session's size is recovered as the accumulated tail at close — so the
# stitched rollup equals the unsplit answer exactly (same SQL oracle).

# 7-day split ranges: bounds a hot key's group to one week of its
# volume while keeping the range-summary row count (segments = active
# key-weeks) an order of magnitude below the event count — day grain
# measured 190k segments for 250k rows at sf0.1, mostly singletons,
# making segment overhead dominate
RANGE_US = 7 * 24 * 3600 * 1_000_000


def _range_sessions_bucket(group: pa.Table, *, gap_min: int) -> pa.Table:
    """Per (user, range) session stats for every key in one hash bucket
    (vectorized sweep over sorted runs, same math as _sessions_bucket,
    plus the boundary columns the stitch pass needs)."""
    out_schema = pa.schema([
        ("user_id", pa.int64()), ("rng", pa.int64()),
        ("n_events", pa.int64()), ("n_sessions", pa.int64()),
        ("max_session_events", pa.int64()),
        ("first_ts", pa.int64()), ("last_ts", pa.int64()),
        ("first_size", pa.int64()), ("last_size", pa.int64())])
    us = group.column("user_id").to_numpy(zero_copy_only=False)
    if len(us) == 0:
        return out_schema.empty_table()
    rg = group.column("rng").to_numpy(zero_copy_only=False)
    ts = pc.cast(group.column("ts"), pa.int64()).to_numpy(
        zero_copy_only=False)
    order = np.lexsort((ts, rg, us))
    u, g, t = us[order], rg[order], ts[order]
    key_change = np.r_[True, (u[1:] != u[:-1]) | (g[1:] != g[:-1])]
    sess_start = key_change | np.r_[
        True, (t[1:] - t[:-1]) > gap_min * 60_000_000]
    kstarts = np.flatnonzero(key_change)
    kends = np.r_[kstarts[1:], len(u)] - 1
    n_events = np.diff(np.r_[kstarts, len(u)])
    n_sessions = np.add.reduceat(sess_start.astype(np.int64), kstarts)
    sstarts = np.flatnonzero(sess_start)
    sizes = np.diff(np.r_[sstarts, len(u)])
    first_sess = np.searchsorted(sstarts, kstarts)
    max_sess = np.maximum.reduceat(sizes, first_sess)
    # last session of each key = session containing the key's last row
    last_sess = np.searchsorted(sstarts, kends, side="right") - 1
    return pa.Table.from_pydict({
        "user_id": pa.array(u[kstarts], pa.int64()),
        "rng": pa.array(g[kstarts], pa.int64()),
        "n_events": pa.array(n_events, pa.int64()),
        "n_sessions": pa.array(n_sessions, pa.int64()),
        "max_session_events": pa.array(max_sess, pa.int64()),
        "first_ts": pa.array(t[kstarts], pa.int64()),
        "last_ts": pa.array(t[kends], pa.int64()),
        "first_size": pa.array(sizes[first_sess], pa.int64()),
        "last_size": pa.array(sizes[last_sess], pa.int64()),
    }, schema=out_schema)


def _stitch_user_ranges(group: pa.Table, *, gap_min: int) -> pa.Table:
    """Fold each user's per-range stats in time order (range-grain rows,
    one Python sweep per user over its ranges — tiny by construction)."""
    us = group.column("user_id").to_numpy(zero_copy_only=False)
    if len(us) == 0:
        return pa.Table.from_pydict({
            "user_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "n_sessions": pa.array([], pa.int64()),
            "max_session_events": pa.array([], pa.int64())})
    rg = group.column("rng").to_numpy(zero_copy_only=False)
    cols = {c: group.column(c).to_numpy(zero_copy_only=False)
            for c in ("n_events", "n_sessions", "max_session_events",
                      "first_ts", "last_ts", "first_size", "last_size")}
    order = np.lexsort((rg, us))
    gap_us = gap_min * 60_000_000
    out_u, out_e, out_s, out_m = [], [], [], []
    i = 0
    idx = order
    while i < len(idx):
        j = i
        user = us[idx[i]]
        total_e = total_s = best = 0
        tail = 0
        prev_last_ts = None
        while j < len(idx) and us[idx[j]] == user:
            r = idx[j]
            k = int(cols["n_sessions"][r])
            best = max(best, int(cols["max_session_events"][r]))
            total_e += int(cols["n_events"][r])
            if prev_last_ts is not None and \
                    cols["first_ts"][r] - prev_last_ts <= gap_us:
                # boundary sessions merge
                total_s += k - 1
                if k == 1:
                    tail += int(cols["first_size"][r])
                else:
                    best = max(best, tail + int(cols["first_size"][r]))
                    tail = int(cols["last_size"][r])
            else:
                best = max(best, tail)
                total_s += k
                tail = int(cols["last_size"][r])
            prev_last_ts = cols["last_ts"][r]
            j += 1
        best = max(best, tail)
        out_u.append(user)
        out_e.append(total_e)
        out_s.append(total_s)
        out_m.append(best)
        i = j
    return pa.Table.from_pydict({
        "user_id": pa.array(out_u, pa.int64()),
        "n_events": pa.array(out_e, pa.int64()),
        "n_sessions": pa.array(out_s, pa.int64()),
        "max_session_events": pa.array(out_m, pa.int64()),
    })


def sessionize_split(sf_dir: str,
                     gap_min: int = SESSION_GAP_MIN) -> ray.data.Dataset:
    """Hot-key-safe sessionize: identical answer to ``sessionize`` (same
    SQL oracle) with per-group size bounded by a user's single-day
    volume instead of their lifetime history."""
    from nerfray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts"])
    return sessionize_split_ds(ds, gap_min=gap_min)


def sessionize_split_ds(ds: ray.data.Dataset,
                        gap_min: int = SESSION_GAP_MIN) -> ray.data.Dataset:
    def _rng(batch: pa.Table) -> pa.Table:
        t = pc.cast(pc.cast(batch.column("ts"), pa.timestamp("us")),
                    pa.int64())
        rng = pc.divide(t, RANGE_US)
        hb = pc.cast(pc.bit_wise_and(
            pc.add(pc.multiply(batch.column("user_id"), 8191), rng),
            N_KEY_BUCKETS - 1), pa.int32())
        return pa.Table.from_pydict({
            "user_id": pc.cast(batch.column("user_id"), pa.int64()),
            "ts": t, "rng": rng, "hb": hb})

    per_range = ds.map_batches(_rng, batch_format="pyarrow") \
        .groupby("hb").map_groups(
            _range_sessions_bucket, fn_kwargs={"gap_min": gap_min},
            batch_format="pyarrow")
    return per_range.map_batches(_user_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(
            _stitch_user_ranges, fn_kwargs={"gap_min": gap_min},
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


# -- hot-key-safe as-of join: (key, day) range split + carry stitch ----------
#
# The plain as-of co-locates a user's whole event+order history in one
# group. The split path bounds groups to a single (user, day) range:
#   A) per-(key, range) local as-of: events matched by an in-range
#      order resolve immediately; per range emit a summary row ('w':
#      the range's latest order) and a request row ('q') if any event
#      found no in-range order;
#   B) RANGE-GRAIN carry pass per user (rows = user-days with orders or
#      requests, tiny): for each requested range, carry = the latest
#      order of any earlier range (ranges partition time, so the
#      max-(ts, id) order of the greatest earlier range is the answer);
#   C) co-group the unmatched events with their (user, range) carry row
#      and assign it (or -1).  Union of A-matched and C equals the
#      unsplit operator exactly (same SQL oracle).

_ASOF_A_SCHEMA = pa.schema([
    ("kind", pa.string()),      # m: matched, u: unmatched, w: range max,
    ("key", pa.int64()),        # q: carry request
    ("rng", pa.int64()),
    ("event_id", pa.int64()),
    ("val", pa.int64()),        # m: last_order; w: latest order id
    # 'u' rows are COMPACTED: one row per (key, range) carrying the
    # unmatched event ids as a list — the assign shuffle moves
    # range-grain rows, not event-grain rows
    ("event_ids", pa.list_(pa.int64())),
])


def _asof_split_bucket(group: pa.Table) -> pa.Table:
    """Local as-of for EVERY (key, range) run in one hash bucket —
    fully vectorized (no per-run Python loop; at day grain a bucket can
    hold 100k+ tiny runs): rows sort by (key, rng, ats, order-first,
    id); a segment-reset forward fill (``np.maximum.accumulate`` over
    order positions) gives each event the position of the latest order
    at-or-before it within its run."""
    if group.num_rows == 0:
        return _ASOF_A_SCHEMA.empty_table()
    keys = group.column("key").to_numpy(zero_copy_only=False)
    rng = group.column("rng").to_numpy(zero_copy_only=False)
    is_e = np.asarray(group.column("kind").to_pylist()) == "e"
    ts = group.column("ats").to_numpy(zero_copy_only=False)
    ids = group.column("id").to_numpy(zero_copy_only=False)
    # orders before events at equal ts (as-of is inclusive); among
    # equal-ts orders ascending id, so the accumulated max position is
    # the max-id order — the unsplit tie-break
    order = np.lexsort((ids, is_e, ts, rng, keys))
    keys, rng, is_e, ts, ids = (keys[order], rng[order], is_e[order],
                                ts[order], ids[order])
    n = len(keys)
    pos = np.arange(n)
    seg_change = np.r_[True, (keys[1:] != keys[:-1]) | (rng[1:] != rng[:-1])]
    starts = np.flatnonzero(seg_change)
    counts = np.diff(np.r_[starts, n])
    seg_start = np.repeat(starts, counts)
    last_pos = np.maximum.accumulate(np.where(~is_e, pos, -1))
    valid = last_pos >= seg_start  # the fill must not cross segments

    ev_mask = is_e
    matched = ev_mask & valid
    unmatched = ev_mask & ~valid
    m_tab = (keys[matched], rng[matched], ids[matched],
             ids[last_pos[matched]])
    # per-segment flags: any unmatched event -> u+q rows; orders -> w
    n_unm = np.add.reduceat(unmatched.astype(np.int64), starts) \
        if len(starts) else np.array([], dtype=np.int64)
    seg_has_u = n_unm > 0
    seg_has_o = np.add.reduceat((~is_e).astype(np.int64), starts) > 0
    # last order of the segment = forward fill evaluated at segment end
    seg_end = np.r_[starts[1:], n] - 1
    w_pos = last_pos[seg_end]
    q_k, q_r = keys[starts[seg_has_u]], rng[starts[seg_has_u]]
    w_k, w_r = keys[starts[seg_has_o]], rng[starts[seg_has_o]]
    w_v = ids[w_pos[seg_has_o]]
    # compacted 'u' rows: ListArray of the unmatched ids per segment
    # (unmatched ids are contiguous per segment after the sort? no —
    # interleaved with others; gather by sorting (segment, position))
    u_ids_flat = ids[unmatched]
    u_seg_offsets = np.r_[0, np.cumsum(n_unm[seg_has_u])]
    u_list = pa.ListArray.from_arrays(
        pa.array(u_seg_offsets, pa.int32()),
        pa.array(u_ids_flat, pa.int64()))

    def _neg(m):
        return np.full(m, -1, dtype=np.int64)

    n_m, n_u, n_q, n_w = (len(m_tab[0]), len(q_k), len(q_k), len(w_k))
    kinds = ["m"] * n_m + ["u"] * n_u + ["q"] * n_q + ["w"] * n_w
    nulls = pa.nulls(n_m, pa.list_(pa.int64()))
    return pa.Table.from_pydict({
        "kind": pa.array(kinds, pa.string()),
        "key": pa.array(np.concatenate(
            [m_tab[0], q_k, q_k, w_k]), pa.int64()),
        "rng": pa.array(np.concatenate(
            [m_tab[1], q_r, q_r, w_r]), pa.int64()),
        "event_id": pa.array(np.concatenate(
            [m_tab[2], _neg(n_u), _neg(n_q), _neg(n_w)]), pa.int64()),
        "val": pa.array(np.concatenate(
            [m_tab[3], _neg(n_u), _neg(n_q), w_v]), pa.int64()),
        "event_ids": pa.concat_arrays(
            [nulls, u_list, pa.nulls(n_q + n_w, pa.list_(pa.int64()))]),
    }, schema=_ASOF_A_SCHEMA)


def _carry_bucket(group: pa.Table) -> pa.Table:
    """Resolve each 'q' request to the latest order of any EARLIER range
    (vectorized searchsorted over the user's 'w' rows)."""
    if group.num_rows == 0:
        return pa.Table.from_pydict({
            "key": pa.array([], pa.int64()),
            "rng": pa.array([], pa.int64()),
            "carry": pa.array([], pa.int64())})
    kind = np.asarray(group.column("kind").to_pylist())
    keys = group.column("key").to_numpy(zero_copy_only=False)
    rng = group.column("rng").to_numpy(zero_copy_only=False)
    val = group.column("val").to_numpy(zero_copy_only=False)
    is_w = kind == "w"
    wk = keys[is_w].astype(np.int64) * (1 << 31) + rng[is_w]
    wv = val[is_w]
    o = np.argsort(wk, kind="stable")
    wk, wv = wk[o], wv[o]
    is_q = kind == "q"
    qk = keys[is_q].astype(np.int64) * (1 << 31) + rng[is_q]
    if len(wk) == 0:  # bucket has requests but no order summaries
        carry = np.full(len(qk), -1, dtype=np.int64)
    else:
        idx = np.searchsorted(wk, qk, side="left") - 1
        same_user = (idx >= 0) & ((wk[np.clip(idx, 0, None)] >> 31)
                                  == (qk >> 31))
        carry = np.where(same_user, wv[np.clip(idx, 0, None)], -1)
    return pa.Table.from_pydict({
        "key": pa.array(keys[is_q], pa.int64()),
        "rng": pa.array(rng[is_q], pa.int64()),
        "carry": pa.array(carry, pa.int64()),
    })


def _assign_carry_bucket(group: pa.Table) -> pa.Table:
    """Attach each unmatched event's (key, range) carry: the carry is
    looked up per compacted 'u' ROW (range grain), then replicated over
    its event-id list with one Arrow flatten."""
    if group.num_rows == 0:
        return pa.Table.from_pydict({
            "event_id": pa.array([], pa.int64()),
            "last_order": pa.array([], pa.int64())})
    kind = np.asarray(group.column("kind").to_pylist())
    keys = group.column("key").to_numpy(zero_copy_only=False)
    rng = group.column("rng").to_numpy(zero_copy_only=False)
    val = group.column("val").to_numpy(zero_copy_only=False)
    is_c = kind == "c"
    ck = keys[is_c].astype(np.int64) * (1 << 31) + rng[is_c]
    cv = val[is_c]
    o = np.argsort(ck, kind="stable")
    ck, cv = ck[o], cv[o]
    is_u = kind == "u"
    uk = keys[is_u].astype(np.int64) * (1 << 31) + rng[is_u]
    if len(ck) == 0:  # defensive: every 'u' co-buckets with its 'c'
        last_per_row = np.full(len(uk), -1, dtype=np.int64)
    else:
        idx = np.searchsorted(ck, uk)
        hit = (idx < len(ck)) & (ck[np.clip(idx, 0, len(ck) - 1)] == uk)
        last_per_row = np.where(hit, cv[np.clip(idx, 0, len(ck) - 1)], -1)
    lists = group.filter(pa.array(is_u)).column("event_ids") \
        .combine_chunks()
    flat = lists.flatten().to_numpy(zero_copy_only=False)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    return pa.Table.from_pydict({
        "event_id": pa.array(flat, pa.int64()),
        "last_order": pa.array(last_per_row[parent], pa.int64()),
    })


def asof_last_order_split(sf_dir: str) -> ray.data.Dataset:
    """Hot-key-safe as-of join: identical answer to ``asof_last_order``
    (same SQL oracle) with per-group size bounded by one user-day."""
    from nerfray.sources.parquet import read_parquet_clean
    events = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                                columns=["event_id", "user_id", "ts"])
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def _ev(batch: pa.Table) -> pa.Table:
        t = pc.cast(pc.cast(batch.column("ts"), pa.timestamp("us")),
                    pa.int64())
        return pa.Table.from_pydict({
            "key": pc.cast(batch.column("user_id"), pa.int64()),
            "kind": pa.array(["e"] * len(batch), pa.string()),
            "ats": t,
            "rng": pc.divide(t, RANGE_US),
            "id": pc.cast(batch.column("event_id"), pa.int64()),
        })

    def _od(batch: pa.Table) -> pa.Table:
        t = pc.cast(pc.cast(batch.column("o_orderdate"),
                            pa.timestamp("us")), pa.int64())
        return pa.Table.from_pydict({
            "key": pc.cast(batch.column("o_custkey"), pa.int64()),
            "kind": pa.array(["o"] * len(batch), pa.string()),
            "ats": t,
            "rng": pc.divide(t, RANGE_US),
            "id": pc.cast(batch.column("o_orderkey"), pa.int64()),
        })

    def _kb(batch: pa.Table) -> pa.Table:
        hb = pc.cast(pc.bit_wise_and(
            pc.add(pc.multiply(batch.column("key"), 8191),
                   batch.column("rng")), N_KEY_BUCKETS - 1), pa.int32())
        return batch.append_column("hb", hb)

    def _ub(batch: pa.Table) -> pa.Table:
        hb = pc.cast(pc.bit_wise_and(batch.column("key"),
                                     N_KEY_BUCKETS - 1), pa.int32())
        return batch.append_column("hb", hb)

    both = events.map_batches(_ev, batch_format="pyarrow").union(
        orders.map_batches(_od, batch_format="pyarrow"))
    a = both.map_batches(_kb, batch_format="pyarrow") \
        .groupby("hb").map_groups(_asof_split_bucket,
                                  batch_format="pyarrow").materialize()

    def _matched_rows(batch: pa.Table) -> pa.Table:
        # filter + project + rename in ONE map: the fused
        # Filter->Project pair passes empty bundles through
        # unprojected (mixed-schema RefBundle warning at the union)
        sel = batch.filter(pc.equal(batch.column("kind"),
                                    pa.scalar("m")))
        return pa.Table.from_pydict({
            "event_id": sel.column("event_id"),
            "last_order": sel.column("val")})

    matched = a.map_batches(_matched_rows, batch_format="pyarrow",
                            zero_copy_batch=True)

    wq = a.filter(expr="kind == 'w' or kind == 'q'")
    carries = wq.map_batches(_ub, batch_format="pyarrow") \
        .groupby("hb").map_groups(_carry_bucket, batch_format="pyarrow")

    def _carry_as_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_pydict({
            "kind": pa.array(["c"] * n, pa.string()),
            "key": batch.column("key"),
            "rng": batch.column("rng"),
            "event_id": pa.array([-1] * n, pa.int64()),
            "val": batch.column("carry"),
            "event_ids": pa.nulls(n, pa.list_(pa.int64())),
        }, schema=_ASOF_A_SCHEMA)

    assigned = a.filter(expr="kind == 'u'") \
        .union(carries.map_batches(_carry_as_rows,
                                   batch_format="pyarrow")) \
        .map_batches(_kb, batch_format="pyarrow") \
        .groupby("hb").map_groups(_assign_carry_bucket,
                                  batch_format="pyarrow")
    return matched.union(assigned)


# -- windowed event self-join ------------------------------------------------
#
# The remaining join flavor: events × events per user within a time
# window ("what follows what, how soon"). Per user: the count of ordered
# event pairs (a, b) with a.ts < b.ts <= a.ts + W, plus the
# signup→purchase conversions among them. Runs as one bucketed co-group
# (no pair rows ever materialize): inside a bucket the per-element
# window counts are two global searchsorted calls over a run-offset
# monotonic key, then per-user sums via reduceat — one Python dispatch
# per bucket, exact tie semantics (strict a.ts < b.ts) matching the SQL
# self-join oracle.

WINDOW_MIN = 60


def _window_pairs_bucket(group: pa.Table, *, window_min: int) -> pa.Table:
    out_schema = pa.schema([
        ("user_id", pa.int64()), ("n_pairs", pa.int64()),
        ("n_conv", pa.int64())])
    if group.num_rows == 0:
        return out_schema.empty_table()
    us = group.column("user_id").to_numpy(zero_copy_only=False)
    ts = group.column("ats").to_numpy(zero_copy_only=False)
    is_su = group.column("is_signup").to_numpy(zero_copy_only=False)
    is_pu = group.column("is_purchase").to_numpy(zero_copy_only=False)
    w = window_min * 60_000_000
    order = np.lexsort((ts, us))
    u, t = us[order], ts[order]
    su, pu = is_su[order].astype(bool), is_pu[order].astype(bool)
    user_change = np.r_[True, u[1:] != u[:-1]]
    ustarts = np.flatnonzero(user_change)
    # run-offset monotonic key: shift each user's (sorted) times into a
    # disjoint band so ONE globally sorted array answers every per-run
    # range query; band width > span + W keeps queries inside the band
    span = int(t.max()) - int(t.min())
    offset = span + w + 1
    run = np.cumsum(user_change) - 1  # 0-based run index per element
    if (len(ustarts) + 1) * offset >= 2 ** 62:
        raise ValueError(
            "window self-join: run-offset key would overflow int64; "
            "raise N_KEY_BUCKETS (smaller buckets -> fewer runs each)")
    t_adj = (t - int(t.min())) + run * offset
    q = t_adj + w
    # j in same run with a.ts < b.ts <= a.ts + W  (strict lower edge:
    # subtracting the 'right' bound at t_adj itself drops ts ties)
    hi = np.searchsorted(t_adj, q, side="right")
    lo = np.searchsorted(t_adj, t_adj, side="right")
    per_elem = hi - lo
    n_pairs = np.add.reduceat(per_elem, ustarts)
    # conversions: purchases within (a.ts, a.ts + W] counted only at
    # signup anchors, via the purchase-only view of the same key
    t_pu = t_adj[pu]
    conv = np.where(
        su,
        np.searchsorted(t_pu, q, side="right")
        - np.searchsorted(t_pu, t_adj, side="right"),
        0)
    n_conv = np.add.reduceat(conv, ustarts) if len(conv) else conv
    keep = n_pairs > 0  # inner-join semantics: pairless users drop out
    return pa.Table.from_pydict({
        "user_id": pa.array(u[ustarts][keep], pa.int64()),
        "n_pairs": pa.array(n_pairs[keep], pa.int64()),
        "n_conv": pa.array(n_conv[keep], pa.int64()),
    }, schema=out_schema)


def window_selfjoin(sf_dir: str,
                    window_min: int = WINDOW_MIN) -> ray.data.Dataset:
    from nerfray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts", "event_type"])

    def _prep(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        return pa.Table.from_pydict({
            "user_id": pc.cast(batch.column("user_id"), pa.int64()),
            "ats": pc.cast(pc.cast(batch.column("ts"), pa.timestamp("us")),
                           pa.int64()),
            "is_signup": pc.cast(pc.equal(et, "signup"), pa.int8()),
            "is_purchase": pc.cast(pc.equal(et, "purchase"), pa.int8()),
            "hb": pc.cast(pc.bit_wise_and(batch.column("user_id"),
                                          N_KEY_BUCKETS - 1), pa.int32()),
        })

    return ds.map_batches(_prep, batch_format="pyarrow") \
        .groupby("hb").map_groups(
        _window_pairs_bucket, fn_kwargs={"window_min": window_min},
        batch_format="pyarrow")



def _cumsum_bucket(group: pa.Table) -> pa.Table:
    """Per-user running sum (segmented prefix scan) for every key in one
    hash bucket: sort by (user, ts, event_id), one np.cumsum, then
    subtract each segment's start offset. Exact: values ride as integer
    cents, so distributed block structure cannot perturb the sums."""
    out_schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("cum_cents", pa.int64())])
    if group.num_rows == 0:
        return out_schema.empty_table()
    us = group.column("user_id").to_numpy(zero_copy_only=False)
    ts = group.column("ats").to_numpy(zero_copy_only=False)
    eid = group.column("event_id").to_numpy(zero_copy_only=False)
    cents = group.column("cents").to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts, us))
    u, e, v = us[order], eid[order], cents[order]
    total = np.cumsum(v)
    ustarts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    counts = np.diff(np.r_[ustarts, len(u)])
    seg_offset = total[ustarts] - v[ustarts]
    cum = total - np.repeat(seg_offset, counts)
    return pa.Table.from_pydict({
        "event_id": pa.array(e, pa.int64()),
        "user_id": pa.array(u, pa.int64()),
        "cum_cents": pa.array(cum, pa.int64()),
    })


def _prep_cents(batch: pa.Table) -> pa.Table:
    """(user_id, ats, event_id, cents, hb): the shared pre-shuffle shape
    for the per-key scan operators — value quantized to exact cents so
    every downstream sum is order-independent."""
    return pa.Table.from_pydict({
        "user_id": pc.cast(batch.column("user_id"), pa.int64()),
        "ats": pc.cast(pc.cast(batch.column("ts"), pa.timestamp("us")),
                       pa.int64()),
        "event_id": pc.cast(batch.column("event_id"), pa.int64()),
        "cents": pc.cast(pc.round(pc.multiply(
            batch.column("value"), 100)), pa.int64()),
        "hb": pc.cast(pc.bit_wise_and(batch.column("user_id"),
                                      N_KEY_BUCKETS - 1), pa.int32()),
    })


def cumsum_per_user(sf_dir: str) -> ray.data.Dataset:
    """SUM(...) OVER (PARTITION BY user ORDER BY ts, event_id): the
    window-scan operator class. One key-bucket shuffle; the scan itself
    is a vectorized segmented cumsum per bucket (dispatch-grain rule)."""
    from nerfray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts", "event_id", "value"])
    return ds.map_batches(_prep_cents, batch_format="pyarrow") \
        .groupby("hb").map_groups(_cumsum_bucket, batch_format="pyarrow")


def _trend_bucket(group: pa.Table) -> pa.Table:
    """Per-user least-squares trend of value-vs-rank as an EXACT integer
    numerator/denominator pair (slope = num/den): x = 0-based rank in
    (ts, event_id) order, y = cents. All sums are int64, so the answer
    is independent of summation order and mirrors SQL bit-for-bit
    without emitting floats."""
    out_schema = pa.schema([
        ("user_id", pa.int64()), ("n_events", pa.int64()),
        ("trend_num", pa.int64()), ("trend_den", pa.int64())])
    if group.num_rows == 0:
        return out_schema.empty_table()
    us = group.column("user_id").to_numpy(zero_copy_only=False)
    ts = group.column("ats").to_numpy(zero_copy_only=False)
    eid = group.column("event_id").to_numpy(zero_copy_only=False)
    cents = group.column("cents").to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts, us))
    u, y = us[order], cents[order]
    ustarts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    n = np.diff(np.r_[ustarts, len(u)])
    x = np.arange(len(u), dtype=np.int64) - np.repeat(ustarts, n)
    sx = np.add.reduceat(x, ustarts)
    sy = np.add.reduceat(y, ustarts)
    sxy = np.add.reduceat(x * y, ustarts)
    sxx = np.add.reduceat(x * x, ustarts)
    return pa.Table.from_pydict({
        "user_id": pa.array(u[ustarts], pa.int64()),
        "n_events": pa.array(n, pa.int64()),
        "trend_num": pa.array(n * sxy - sx * sy, pa.int64()),
        "trend_den": pa.array(n * sxx - sx * sx, pa.int64()),
    })


def trend_per_user(sf_dir: str) -> ray.data.Dataset:
    """Custom exact UDAF: per-group linear-regression slope carried as
    (numerator, denominator) int64s — the grouped-ML-statistic shape a
    training-data pipeline uses for drift/quality trends, kept
    hash-comparable by never materializing the float ratio."""
    from nerfray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts", "event_id", "value"])
    return ds.map_batches(_prep_cents, batch_format="pyarrow") \
        .groupby("hb").map_groups(_trend_bucket, batch_format="pyarrow")


def _last_rows(tbl: pa.Table) -> pa.Table:
    """Per-(user, event_type) argmax row by (ts, event_id) — shared by
    the per-block combiner and the final per-bucket reduce (argmax of
    argmaxes = argmax, so two-level reduction is exact). Vectorized:
    event_type is factorized to codes, one lexsort, run tails win."""
    us = tbl.column("user_id").to_numpy(zero_copy_only=False)
    ts = tbl.column("ats").to_numpy(zero_copy_only=False)
    eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
    cents = tbl.column("cents").to_numpy(zero_copy_only=False)
    types = np.asarray(tbl.column("event_type").to_pylist(), dtype=object)
    uniq, codes = np.unique(types, return_inverse=True)
    order = np.lexsort((eid, ts, codes, us))
    u, c, t, e, v = (us[order], codes[order], ts[order], eid[order],
                     cents[order])
    tail = np.r_[(u[1:] != u[:-1]) | (c[1:] != c[:-1]), True]
    return pa.Table.from_pydict({
        "user_id": pa.array(u[tail], pa.int64()),
        "event_type": pa.array(uniq[c[tail]].tolist(), pa.string()),
        "ats": pa.array(t[tail], pa.int64()),
        "event_id": pa.array(e[tail], pa.int64()),
        "cents": pa.array(v[tail], pa.int64()),
    })


_COMPACT_SCHEMA = pa.schema([
    ("user_id", pa.int64()), ("event_type", pa.string()),
    ("ats", pa.int64()), ("event_id", pa.int64()), ("cents", pa.int64())])


def _compact_partial(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return _COMPACT_SCHEMA.empty_table()
    return _last_rows(pa.Table.from_pydict({
        "user_id": pc.cast(batch.column("user_id"), pa.int64()),
        "event_type": batch.column("event_type"),
        "ats": pc.cast(pc.cast(batch.column("ts"), pa.timestamp("us")),
                       pa.int64()),
        "event_id": pc.cast(batch.column("event_id"), pa.int64()),
        "cents": pc.cast(pc.round(pc.multiply(
            batch.column("value"), 100)), pa.int64()),
    }))


def _compact_bucket(group: pa.Table) -> pa.Table:
    if group.num_rows == 0:
        return _COMPACT_SCHEMA.empty_table()
    return _last_rows(group.drop_columns(["hb"]))


def compact_latest(sf_dir: str) -> ray.data.Dataset:
    """Changelog compaction (upsert-latest / SCD type 1): the newest row
    per (user, event_type) key by (ts, event_id). The per-BLOCK argmax
    combiner shrinks each block to <= its distinct keys before the only
    shuffle — at changelog scale (many updates per key) the exchange
    carries keys, not history."""
    from nerfray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type", "value"])

    def _hb(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "hb", pc.cast(pc.bit_wise_and(batch.column("user_id"),
                                          N_KEY_BUCKETS - 1), pa.int32()))

    return ds.map_batches(_compact_partial, batch_format="pyarrow") \
        .map_batches(_hb, batch_format="pyarrow") \
        .groupby("hb").map_groups(_compact_bucket, batch_format="pyarrow")


ORACLES = {
    # the *_split variants are the hot-key-safe implementations of the
    # SAME operators — they share the unsplit oracles verbatim
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

ORACLES["events_window_selfjoin"] = f"""
SELECT a.user_id, count(*)::BIGINT AS n_pairs,
       sum(CASE WHEN a.event_type = 'signup'
                 AND b.event_type = 'purchase'
                THEN 1 ELSE 0 END)::BIGINT AS n_conv
FROM events a JOIN events b
  ON a.user_id = b.user_id AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL {WINDOW_MIN} MINUTE
GROUP BY a.user_id ORDER BY a.user_id
"""

ORACLES["events_compact"] = """
WITH ranked AS (
  SELECT user_id, event_type, epoch_us(ts) AS ats, event_id,
         round(value * 100)::BIGINT AS cents,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_type, ats, event_id, cents
FROM ranked WHERE rn = 1 ORDER BY user_id, event_type
"""

ORACLES["events_cumsum"] = """
SELECT event_id, user_id,
       sum(round(value * 100)::BIGINT) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_cents
FROM events ORDER BY event_id
"""

ORACLES["events_trend"] = """
WITH ranked AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) - 1 AS x,
         round(value * 100)::BIGINT AS y
  FROM events
)
SELECT user_id, count(*)::BIGINT AS n_events,
       (count(*) * sum(x * y) - sum(x) * sum(y))::BIGINT AS trend_num,
       (count(*) * sum(x * x) - sum(x) * sum(x))::BIGINT AS trend_den
FROM ranked GROUP BY user_id ORDER BY user_id
"""

ORACLES["events_sessionize_split"] = ORACLES["events_sessionize"]
ORACLES["events_asof_split"] = ORACLES["events_asof_order"]


# ---------------------------------------------------------------------------
# ordered funnel (sequential first-occurrence match per user)
# ---------------------------------------------------------------------------
#
# How many users performed view, THEN click strictly after their first
# view, THEN purchase strictly after that click — the product-analytics
# staple that needs per-user event ORDER, not counts.  Same scale shape
# as sessionize: users co-group by 64-way hash, each bucket resolves
# every user's three first-occurrence times in one vectorized
# masked-reduceat sweep, and only (stage, count) partials leave the
# bucket.  Strict '>' progression makes equal-timestamp ties
# well-defined on both sides of the oracle.

FUNNEL_STAGES = ("view", "click", "purchase")


def _funnel_bucket(group: pa.Table, *,
                   stages: tuple[str, ...]) -> pa.Table:
    out_schema = pa.schema([("stage", pa.string()), ("n", pa.int64())])
    labels = [">".join(stages[:i + 1]) for i in range(len(stages))]
    if group.num_rows == 0:
        return pa.Table.from_pydict(
            {"stage": pa.array(labels, pa.string()),
             "n": pa.array([0] * len(labels), pa.int64())},
            schema=out_schema)
    us = group.column("user_id").to_numpy(zero_copy_only=False)
    ts = pc.cast(group.column("ts"), pa.int64()).to_numpy(
        zero_copy_only=False)
    et = np.asarray(group.column("event_type").to_pylist(), dtype=object)
    order = np.lexsort((ts, us))
    us, ts, et = us[order], ts[order], et[order]
    starts = np.flatnonzero(np.r_[True, us[1:] != us[:-1]])
    seg = np.cumsum(np.r_[True, us[1:] != us[:-1]]) - 1
    INF = np.int64(1 << 62)
    prev = np.full(len(starts), -INF)       # strict lower bound per user
    counts = []
    for s in stages:
        cand = np.where((et == s) & (ts > prev[seg]), ts, INF)
        first = np.minimum.reduceat(cand, starts)
        counts.append(int(np.sum(first < INF)))
        prev = first
    return pa.Table.from_pydict({
        "stage": pa.array(labels, pa.string()),
        "n": pa.array(counts, pa.int64()),
    }, schema=out_schema)


def funnel(sf_dir: str,
           stages: tuple[str, ...] = FUNNEL_STAGES) -> ray.data.Dataset:
    """(stage, n_users) for each funnel prefix."""
    import os

    from nerfray.sources.parquet import read_parquet_clean
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "ts", "event_type"])
    return ev.map_batches(_user_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(
            _funnel_bucket, fn_kwargs={"stages": stages},
            batch_format="pyarrow") \
        .groupby("stage").sum("n") \
        .rename_columns({"sum(n)": "n_users"})


ORACLES["events_funnel"] = """
WITH a AS (SELECT user_id, min(ts) AS t FROM events
           WHERE event_type = 'view' GROUP BY 1),
b AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      JOIN a ON a.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > a.t GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      JOIN b ON b.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > b.t GROUP BY 1)
SELECT 'view' AS stage, count(*)::BIGINT AS n_users FROM a
UNION ALL SELECT 'view>click', count(*)::BIGINT FROM b
UNION ALL SELECT 'view>click>purchase', count(*)::BIGINT FROM c
ORDER BY stage
"""


# ---------------------------------------------------------------------------
# inter-arrival gap statistics (lag-window per key)
# ---------------------------------------------------------------------------
#
# Per-user event-gap rollup — the lag()-window family (heartbeat
# monitoring, engagement cadence).  Gaps between EQUAL timestamps are
# zero, so the answer is deterministic under any tie order on both
# sides of the oracle.  Same co-group shape as sessionize: one
# vectorized diff + reduceat sweep per 64-way user bucket; only
# per-user rollup rows leave.

_GAP_SCHEMA = pa.schema([
    ("user_id", pa.int64()), ("n_events", pa.int64()),
    ("sum_gap_us", pa.int64()), ("max_gap_us", pa.int64()),
    ("min_gap_us", pa.int64()),
])


def _gaps_bucket(group: pa.Table) -> pa.Table:
    if group.num_rows == 0:
        return _GAP_SCHEMA.empty_table()
    us = group.column("user_id").to_numpy(zero_copy_only=False)
    ts = pc.cast(group.column("ts"), pa.int64()).to_numpy(
        zero_copy_only=False)
    order = np.lexsort((ts, us))
    us, ts = us[order], ts[order]
    new_seg = np.r_[True, us[1:] != us[:-1]]
    starts = np.flatnonzero(new_seg)
    lens = np.diff(np.r_[starts, len(us)])
    valid = ~new_seg[1:]                       # gap i joins rows i, i+1
    gaps = (ts[1:] - ts[:-1])[valid]
    gu = us[1:][valid]
    if not len(gu):
        return _GAP_SCHEMA.empty_table()
    gstarts = np.flatnonzero(np.r_[True, gu[1:] != gu[:-1]])
    users = gu[gstarts]
    n_ev = lens[lens >= 2]                     # same user order as gaps
    return pa.Table.from_pydict({
        "user_id": pa.array(users, pa.int64()),
        "n_events": pa.array(n_ev, pa.int64()),
        "sum_gap_us": pa.array(np.add.reduceat(gaps, gstarts), pa.int64()),
        "max_gap_us": pa.array(np.maximum.reduceat(gaps, gstarts),
                               pa.int64()),
        "min_gap_us": pa.array(np.minimum.reduceat(gaps, gstarts),
                               pa.int64()),
    }, schema=_GAP_SCHEMA)


def interarrival(sf_dir: str) -> ray.data.Dataset:
    """(user_id, n_events, sum/max/min gap in us) for users with >= 2
    events."""
    import os

    from nerfray.sources.parquet import read_parquet_clean
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "ts"])
    return ev.map_batches(_user_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_gaps_bucket, batch_format="pyarrow")


ORACLES["events_interarrival"] = """
WITH g AS (
  SELECT user_id,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts),
                   ts) AS gap
  FROM events
)
SELECT user_id, count(*)::BIGINT AS n_events,
       sum(gap)::BIGINT AS sum_gap_us,
       max(gap)::BIGINT AS max_gap_us,
       min(gap)::BIGINT AS min_gap_us
FROM g GROUP BY 1 HAVING count(*) >= 2 ORDER BY 1
"""


# -- incremental (micro-batch) hourly aggregation ------------------------------
#
# The streaming-shaped maintenance pattern: a persisted register table
# (hour, event_type, cnt) is MERGED with each arriving micro-batch's
# partials instead of recomputing over all history — the count register is
# associative, so state(t) = state(t-1) ⊎ partials(batch_t) groupby-summed.
# State versions are immutable directories (write-new, never in-place), so
# a crashed update re-runs idempotently; state stays a Dataset end-to-end
# (per-user or per-key registers can exceed driver RAM). The whole
# incremental chain collapses to the SAME SQL oracle as events_hourly:
# incremental == full recompute, which is exactly the property worth
# gating.


def merge_hourly_state(prev: ray.data.Dataset | None,
                       batch_events: ray.data.Dataset) -> ray.data.Dataset:
    """One micro-batch update: previous register table (hour,
    event_type, cnt) ⊎ the batch's per-block partials."""
    partials = batch_events.select_columns(["ts", "event_type"]) \
        .map_batches(_hourly_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
    if prev is not None:
        partials = prev.union(partials)
    return partials.groupby(["hour", "event_type"]).sum("cnt") \
        .rename_columns({"sum(cnt)": "cnt"})


def hourly_counts_incremental(sf_dir: str, *, n_batches: int = 3
                              ) -> ray.data.Dataset:
    """events replayed as ``n_batches`` micro-batches (split by
    event_id % n — arrival order doesn't matter for a count register),
    each update persisted to a fresh state version directory and read
    back before the next merge (full durability round trip). Returns the
    final register, column-compatible with the events_hourly oracle."""
    import shutil
    import tempfile

    from nerfray.sources.parquet import read_parquet_clean
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_id", "ts", "event_type"])
    root = tempfile.mkdtemp(prefix="nerfray_hourly_state_")
    try:
        def _mod_filter(batch: pa.Table, *, k: int) -> pa.Table:
            ids = batch.column("event_id").to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(ids % n_batches == k))

        state = None
        for k in range(n_batches):
            batch = ev.map_batches(_mod_filter, fn_kwargs={"k": k},
                                   batch_format="pyarrow",
                                   zero_copy_batch=True)
            vdir = os.path.join(root, f"v{k}")
            merge_hourly_state(state, batch).write_parquet(vdir)
            state = ray.data.read_parquet(vdir)
        return state.rename_columns({"cnt": "n_events"}).materialize()
    finally:
        shutil.rmtree(root, ignore_errors=True)


ORACLES["events_hourly_incremental"] = ORACLES["events_hourly"]


# -- cohort retention ----------------------------------------------------------
#
# The product-analytics classic: users cohorted by first-active week,
# retention = distinct active users per (cohort_week, week_offset).
# Scale shape: per-block distinct (user, week) combiner, ONE user-hash
# exchange of those narrow pairs; a user's whole history sits in one
# bucket, so first-week and per-(cohort, offset) distinct-user partials
# are exact in-bucket, and the final groupby sums <= 64 partials per
# cell. Week boundaries are Monday-truncated to match DuckDB's
# date_trunc('week'), computed in integer day arithmetic.


def _week_start_days(ts_us: np.ndarray) -> np.ndarray:
    """Monday-based week start, in days since epoch (1970-01-01 was a
    Thursday: Monday index = (days + 3) % 7)."""
    days = ts_us // (86_400 * 1_000_000)
    return days - (days + 3) % 7


def _uw_partial(batch: pa.Table) -> pa.Table:
    """Block combiner: distinct (user, week-start-day)."""
    u = batch.column("user_id").to_numpy(zero_copy_only=False)
    ts = pc.cast(batch.column("ts"), pa.int64()).to_numpy(
        zero_copy_only=False)
    w = _week_start_days(ts)
    key = np.stack([u, w], axis=1)
    uniq = np.unique(key, axis=0)
    return pa.Table.from_pydict({
        "user_id": pa.array(uniq[:, 0], pa.int64()),
        "week": pa.array(uniq[:, 1], pa.int64()),
    })


def _cohort_bucket(group: pa.Table) -> pa.Table:
    out_schema = pa.schema([("cohort_day", pa.int64()),
                            ("week_offset", pa.int64()),
                            ("n", pa.int64())])
    if group.num_rows == 0:
        return out_schema.empty_table()
    u = group.column("user_id").to_numpy(zero_copy_only=False)
    w = group.column("week").to_numpy(zero_copy_only=False)
    order = np.lexsort((w, u))
    us, ws = u[order], w[order]
    # block-level partials may repeat (user, week) across blocks: dedup
    keep = np.r_[True, (us[1:] != us[:-1]) | (ws[1:] != ws[:-1])]
    us, ws = us[keep], ws[keep]
    starts = np.flatnonzero(np.r_[True, us[1:] != us[:-1]])
    first = np.repeat(ws[starts], np.diff(np.r_[starts, len(us)]))
    off = (ws - first) // 7
    cell = np.stack([first, off], axis=1)
    uniq, cnt = np.unique(cell, axis=0, return_counts=True)
    return pa.Table.from_pydict({
        "cohort_day": pa.array(uniq[:, 0], pa.int64()),
        "week_offset": pa.array(uniq[:, 1], pa.int64()),
        "n": pa.array(cnt.astype(np.int64), pa.int64()),
    }, schema=out_schema)


def cohort_retention(sf_dir: str) -> ray.data.Dataset:
    """(cohort_week, week_offset, n_users) retention triangle."""
    from nerfray.sources.parquet import read_parquet_clean
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts"])

    def _label(batch: pa.Table) -> pa.Table:
        d = batch.column("cohort_day").to_numpy(zero_copy_only=False)
        lab = np.datetime_as_string(d.astype("datetime64[D]"), unit="D")
        return pa.Table.from_pydict({
            "cohort_week": pa.array(lab.tolist(), pa.string()),
            "week_offset": batch.column("week_offset"),
            "n_users": batch.column("n_users"),
        })

    return ev.map_batches(_uw_partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .map_batches(_user_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_cohort_bucket, batch_format="pyarrow") \
        .groupby(["cohort_day", "week_offset"]).sum("n") \
        .rename_columns({"sum(n)": "n_users"}) \
        .map_batches(_label, batch_format="pyarrow")


ORACLES["events_cohort_retention"] = """
WITH uw AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events),
f AS (SELECT user_id, min(w) AS fw FROM uw GROUP BY user_id)
SELECT strftime(f.fw, '%Y-%m-%d') AS cohort_week,
       (date_diff('day', f.fw, uw.w) // 7)::BIGINT AS week_offset,
       count(*)::BIGINT AS n_users
FROM uw JOIN f USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# SCD type-2 dimension history (changelog -> validity intervals)
# ---------------------------------------------------------------------------
#
# The warehouse counterpart of compact_latest (SCD1): instead of
# keeping only the newest row per key, build the full version history —
# consecutive events with the SAME tracked attribute collapse into one
# version row with a [v_start, v_end) validity interval (v_end = -1 for
# the current version).  One user-hash exchange; the gaps-and-islands
# sweep is vectorized per bucket (sort + change-flag + run boundaries).

_SCD2_SCHEMA = pa.schema([("user_id", pa.int64()),
                          ("event_type", pa.string()),
                          ("v_start_us", pa.int64()),
                          ("v_end_us", pa.int64()),
                          ("n_events", pa.int64())])


def _scd2_bucket(group: pa.Table) -> pa.Table:
    if group.num_rows == 0:
        return _SCD2_SCHEMA.empty_table()
    u = group.column("user_id").to_numpy(zero_copy_only=False)
    ts = group.column("ts_us").to_numpy(zero_copy_only=False)
    eid = group.column("event_id").to_numpy(zero_copy_only=False)
    et = np.asarray(group.column("event_type").to_pylist(), dtype=object)
    order = np.lexsort((eid, ts, u))
    u_s, ts_s, et_s = u[order], ts[order], et[order]
    new_user = np.r_[True, u_s[1:] != u_s[:-1]]
    chg = new_user | np.r_[False, et_s[1:] != et_s[:-1]]
    starts = np.flatnonzero(chg)
    ends = np.r_[starts[1:], len(u_s)]
    # v_end = next run's start ts when the next run is the same user
    next_same = np.r_[u_s[starts][1:] == u_s[starts][:-1], False]
    v_end = np.full(len(starts), -1, np.int64)
    v_end[next_same] = ts_s[starts[1:]][u_s[starts][1:] == u_s[starts][:-1]]
    return pa.Table.from_pydict({
        "user_id": pa.array(u_s[starts], pa.int64()),
        "event_type": pa.array(et_s[starts], pa.string()),
        "v_start_us": pa.array(ts_s[starts], pa.int64()),
        "v_end_us": pa.array(v_end, pa.int64()),
        "n_events": pa.array(ends - starts, pa.int64()),
    }, schema=_SCD2_SCHEMA)


def scd2_from(ds: ray.data.Dataset) -> ray.data.Dataset:
    """SCD2 over any (user_id, ts, event_id, event_type) Dataset."""

    def _narrow(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "user_id": batch.column("user_id"),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
            "event_id": batch.column("event_id"),
            "event_type": batch.column("event_type"),
            "hb": pc.cast(
                pc.bit_wise_and(batch.column("user_id"), 63), pa.int32()),
        })

    return ds.map_batches(_narrow, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("hb").map_groups(_scd2_bucket, batch_format="pyarrow")


def scd2_history(sf_dir: str) -> ray.data.Dataset:
    """(user_id, event_type, v_start_us, v_end_us, n_events): the SCD2
    version table of each user's event-type attribute."""
    from nerfray.sources.parquet import read_parquet_clean
    return scd2_from(read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"]))


ORACLES["events_scd2"] = """
WITH e AS (
  SELECT user_id, epoch_us(ts)::BIGINT AS ts_us, event_id, event_type
  FROM events),
flagged AS (
  SELECT *, CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                 THEN 1 ELSE 0 END AS chg
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
grp AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS g
  FROM flagged),
runs AS (
  SELECT user_id, min(event_type) AS event_type,
         min(ts_us) AS v_start_us, count(*)::BIGINT AS n_events
  FROM grp GROUP BY user_id, g)
SELECT user_id, event_type, v_start_us,
       COALESCE(lead(v_start_us) OVER (PARTITION BY user_id
                                       ORDER BY v_start_us), -1)::BIGINT
         AS v_end_us,
       n_events
FROM runs ORDER BY user_id, v_start_us
"""


# ---------------------------------------------------------------------------
# per-user z-score outliers (two-pass moments + join back)
# ---------------------------------------------------------------------------
#
# The numeric-anomaly primitive: pass 1 reduces each user's events to
# (n, sum, sumsq) with a per-block combiner; pass 2 routes the bounded
# stats and the raw events through ONE user-hash co-group and flags
# x where (n*x - S)^2 > z^2 * (n*Q - S^2) — the z-score test cleared
# of divisions, so it is INTEGER-EXACT (cents grain) and SQL-mirrored
# verbatim.  Exactness bound: |n*x| < ~3e9 (int64 square); at larger
# per-user volumes switch the comparison to int128/float and keep the
# same shape.

OUTLIER_Z = 3

_OUTLIER_SCHEMA = pa.schema([("event_id", pa.int64()),
                             ("user_id", pa.int64()),
                             ("value_cents", pa.int64()),
                             ("n_user_events", pa.int64())])


def _moment_partial(batch: pa.Table) -> pa.Table:
    u = batch.column("user_id").to_numpy(zero_copy_only=False)
    x = batch.column("x").to_numpy(zero_copy_only=False)
    order = np.argsort(u, kind="stable")
    u_s, x_s = u[order], x[order]
    starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
    return pa.Table.from_pydict({
        "user_id": pa.array(u_s[starts], pa.int64()),
        "n": pa.array(np.diff(np.r_[starts, len(u_s)]), pa.int64()),
        "s": pa.array(np.add.reduceat(x_s, starts), pa.int64()),
        "q": pa.array(np.add.reduceat(x_s * x_s, starts), pa.int64()),
    })


def _outlier_bucket(group: pa.Table, *, z: int) -> pa.Table:
    if group.num_rows == 0:
        return _OUTLIER_SCHEMA.empty_table()
    side = group.column("side").to_numpy(zero_copy_only=False)
    st = group.filter(pa.array(side == 1))
    ev = group.filter(pa.array(side == 0))
    if ev.num_rows == 0:
        return _OUTLIER_SCHEMA.empty_table()
    su = st.column("user_id").to_numpy(zero_copy_only=False)
    order = np.argsort(su, kind="stable")
    su_s = su[order]
    n_s = st.column("n").to_numpy(zero_copy_only=False)[order]
    s_s = st.column("s").to_numpy(zero_copy_only=False)[order]
    q_s = st.column("q").to_numpy(zero_copy_only=False)[order]
    eu = ev.column("user_id").to_numpy(zero_copy_only=False)
    x = ev.column("x").to_numpy(zero_copy_only=False)
    pos = np.searchsorted(su_s, eu)
    n, s, q = n_s[pos], s_s[pos], q_s[pos]
    lhs = (n * x - s).astype(np.int64)
    flag = lhs * lhs > z * z * (n * q - s * s)
    keep = ev.filter(pa.array(flag))
    return pa.Table.from_pydict({
        "event_id": keep.column("event_id"),
        "user_id": keep.column("user_id"),
        "value_cents": keep.column("x"),
        "n_user_events": pa.array(n[flag], pa.int64()),
    }, schema=_OUTLIER_SCHEMA)


def value_outliers_from(ds: ray.data.Dataset, *,
                        z: int = OUTLIER_Z) -> ray.data.Dataset:
    """Events whose cents value deviates more than z sigma from the
    user's mean (population variance), integer-exact."""
    from ray.data.aggregate import Sum

    def _narrow(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "x": pc.cast(pc.round(pc.multiply(
                batch.column("value"), 100.0)), pa.int64()),
        })

    narrow = ds.map_batches(_narrow, batch_format="pyarrow",
                            zero_copy_batch=True)
    stats = narrow.map_batches(_moment_partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Sum("n"), Sum("s"), Sum("q")) \
        .rename_columns({"sum(n)": "n", "sum(s)": "s", "sum(q)": "q"})

    def _widen(batch: pa.Table, *, side: int) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        nrows = batch.num_rows
        nul = lambda: pa.nulls(nrows, pa.int64())  # noqa: E731
        return pa.Table.from_arrays([
            pa.array((u & 63).astype(np.int32), pa.int32()),
            pa.array(np.full(nrows, side, np.int8), pa.int8()),
            batch.column("user_id"),
            batch.column("event_id") if side == 0 else nul(),
            batch.column("x") if side == 0 else nul(),
            batch.column("n") if side == 1 else nul(),
            batch.column("s") if side == 1 else nul(),
            batch.column("q") if side == 1 else nul(),
        ], names=["hb", "side", "user_id", "event_id", "x",
                  "n", "s", "q"])

    ew = narrow.map_batches(_widen, fn_kwargs={"side": 0},
                            batch_format="pyarrow")
    sw = stats.map_batches(_widen, fn_kwargs={"side": 1},
                           batch_format="pyarrow")
    return ew.union(sw).groupby("hb").map_groups(
        _outlier_bucket, fn_kwargs={"z": z}, batch_format="pyarrow")


def value_outliers(sf_dir: str) -> ray.data.Dataset:
    from nerfray.sources.parquet import read_parquet_clean
    return value_outliers_from(read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "value"]))


ORACLES["events_outliers"] = f"""
WITH v AS (
  SELECT event_id, user_id, round(value * 100)::BIGINT AS x FROM events),
s AS (
  SELECT user_id, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         sum(x * x)::BIGINT AS q
  FROM v GROUP BY user_id)
SELECT v.event_id, v.user_id, v.x AS value_cents, s.n AS n_user_events
FROM v JOIN s USING (user_id)
WHERE (s.n * v.x - s.sx) * (s.n * v.x - s.sx)
      > {OUTLIER_Z * OUTLIER_Z} * (s.n * s.q - s.sx * s.sx)
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# dense resampling (gap-filled daily grid per key)
# ---------------------------------------------------------------------------
#
# The time-series regularization step in front of any windowed model:
# each user's sparse events become a DENSE daily series between their
# first and last active day, gap days explicit as zero rows.  Per-block
# (user, day) partials pre-aggregate before the ONE user-hash exchange;
# the gap fill is fully vectorized per bucket (segmented arange via
# offset arithmetic + scatter of the observed cells — no per-user
# Python loop).  Output size is sum of per-user day spans — bounded by
# users x calendar window, never by event count.

_DAY_US = 86_400_000_000


def _day_partial(batch: pa.Table) -> pa.Table:
    out_schema = pa.schema([("user_id", pa.int64()),
                            ("day", pa.int64()),
                            ("n", pa.int64()),
                            ("cents", pa.int64())])
    if batch.num_rows == 0:
        return out_schema.empty_table()
    day = (pc.cast(batch.column("ts"), pa.int64()).to_numpy()
           // _DAY_US)
    cents = np.round(batch.column("value")
                     .to_numpy(zero_copy_only=False) * 100) \
        .astype(np.int64)
    part = pa.Table.from_pydict({
        "user_id": batch.column("user_id"),
        "day": pa.array(day, pa.int64()),
        "n": pa.array(np.ones(len(day), np.int64), pa.int64()),
        "cents": pa.array(cents, pa.int64())})
    return part.group_by(["user_id", "day"]).aggregate(
        [("n", "sum"), ("cents", "sum")]) \
        .rename_columns(["user_id", "day", "n", "cents"]) \
        .cast(out_schema)


def _resample_bucket(group: pa.Table) -> pa.Table:
    out_schema = pa.schema([("user_id", pa.int64()),
                            ("day", pa.int64()),
                            ("n_events", pa.int64()),
                            ("sum_cents", pa.int64())])
    if group.num_rows == 0:
        return out_schema.empty_table()
    u = group.column("user_id").to_numpy(zero_copy_only=False)
    d = group.column("day").to_numpy(zero_copy_only=False)
    n = group.column("n").to_numpy(zero_copy_only=False)
    c = group.column("cents").to_numpy(zero_copy_only=False)
    order = np.lexsort((d, u))
    u_s, d_s, n_s, c_s = u[order], d[order], n[order], c[order]
    # combine same (user, day) cells arriving from different blocks
    cell = np.r_[True, (u_s[1:] != u_s[:-1]) | (d_s[1:] != d_s[:-1])]
    cs = np.flatnonzero(cell)
    u_c, d_c = u_s[cs], d_s[cs]
    n_c = np.add.reduceat(n_s, cs)
    c_c = np.add.reduceat(c_s, cs)
    # per-user dense span
    us = np.flatnonzero(np.r_[True, u_c[1:] != u_c[:-1]])
    ue = np.r_[us[1:], len(u_c)]
    lo, hi = d_c[us], d_c[ue - 1]
    lens = hi - lo + 1
    total = int(lens.sum())
    run = np.repeat(np.arange(len(us)), lens)
    base = np.cumsum(np.r_[0, lens[:-1]])
    out_day = np.repeat(lo, lens) + (np.arange(total) - base[run])
    out_user = np.repeat(u_c[us], lens)
    out_n = np.zeros(total, np.int64)
    out_c = np.zeros(total, np.int64)
    cell_run = np.repeat(np.arange(len(us)), ue - us)
    pos = base[cell_run] + (d_c - lo[cell_run])
    out_n[pos] = n_c
    out_c[pos] = c_c
    return pa.Table.from_pydict({
        "user_id": pa.array(out_user, pa.int64()),
        "day": pa.array(out_day, pa.int64()),
        "n_events": pa.array(out_n, pa.int64()),
        "sum_cents": pa.array(out_c, pa.int64())},
        schema=out_schema)


def resample_daily(sf_dir: str) -> ray.data.Dataset:
    """(user_id, day, n_events, sum_cents) on each user's dense daily
    grid (gap days as zeros); day rendered as DATE."""
    from nerfray.sources.parquet import read_parquet_clean
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts", "value"])

    def _date(batch: pa.Table) -> pa.Table:
        d = batch.column("day").to_numpy(zero_copy_only=False)
        lab = np.datetime_as_string(d.astype("datetime64[D]"), unit="D")
        return pa.Table.from_pydict({
            "user_id": batch.column("user_id"),
            "day": pa.array(lab.tolist(), pa.string()),
            "n_events": batch.column("n_events"),
            "sum_cents": batch.column("sum_cents")})

    return ev.map_batches(_day_partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .map_batches(_user_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_resample_bucket,
                                  batch_format="pyarrow") \
        .map_batches(_date, batch_format="pyarrow")


ORACLES["events_resampled_daily"] = """
WITH e AS (SELECT user_id, ts::DATE AS day,
                  round(value * 100)::BIGINT AS cents FROM events),
g AS (SELECT user_id, min(day) AS lo, max(day) AS hi
      FROM e GROUP BY user_id),
grid AS (SELECT user_id,
                unnest(generate_series(lo, hi,
                                       INTERVAL 1 DAY))::DATE AS day
         FROM g),
a AS (SELECT user_id, day, count(*)::BIGINT AS n_events,
             sum(cents)::BIGINT AS sum_cents
      FROM e GROUP BY 1, 2)
SELECT grid.user_id, strftime(grid.day, '%Y-%m-%d') AS day,
       coalesce(a.n_events, 0)::BIGINT AS n_events,
       coalesce(a.sum_cents, 0)::BIGINT AS sum_cents
FROM grid LEFT JOIN a USING (user_id, day) ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# point-in-time (temporal) join against the SCD2 dimension
# ---------------------------------------------------------------------------
#
# The lookup every SCD2 history exists to serve: "which dimension
# version was valid when this fact happened?"  Dim = the SCD2 history
# built from the changelog subset (event_id % 3 == 0 — the 'profile
# updates'); probe = the remaining events.  Correct-as-of semantics:
# fact ts in [v_start, v_end) (open-ended for the current version),
# facts before the user's first version have no match and are dropped
# (inner-join parity with the SQL mirror).  One user-hash co-group of
# narrow rows; per bucket the match is a per-user-run searchsorted on
# version starts — contiguous SCD2 versions make the containment check
# equivalent to "latest v_start <= ts", i.e. an as-of match.

def _temporal_bucket(group: pa.Table) -> pa.Table:
    out_schema = pa.schema([("event_id", pa.int64()),
                            ("user_id", pa.int64()),
                            ("dim_type", pa.string())])
    if group.num_rows == 0:
        return out_schema.empty_table()
    kind = np.asarray(group.column("kind").to_pylist(), dtype=object)
    u = group.column("user_id").to_numpy(zero_copy_only=False)
    t = group.column("t_us").to_numpy(zero_copy_only=False)
    eid = group.column("event_id").to_numpy(zero_copy_only=False)
    typ = np.asarray(group.column("typ").to_pylist(), dtype=object)

    d = kind == "d"
    p = ~d
    du, dt, dtyp = u[d], t[d], typ[d]
    order_d = np.lexsort((dt, du))
    du, dt, dtyp = du[order_d], dt[order_d], dtyp[order_d]
    pu, pt, peid = u[p], t[p], eid[p]
    if len(du) == 0 or len(pu) == 0:
        return out_schema.empty_table()

    idx = _asof_two_key_search(du, dt, pu, pt)
    # idx = lexsorted dim index of the user's latest version with
    # v_start <= ts; -1 / an earlier user's row when none exists —
    # matched requires the SAME user (contiguous SCD2 versions make
    # the [v_start, v_end) containment equivalent to this as-of match)
    matched = (idx >= 0) & (du[np.maximum(idx, 0)] == pu)
    out = pa.Table.from_pydict({
        "event_id": pa.array(peid[matched], pa.int64()),
        "user_id": pa.array(pu[matched], pa.int64()),
        "dim_type": pa.array(dtyp[idx[matched]], pa.string()),
    }, schema=out_schema)
    return out


def _asof_two_key_search(du: np.ndarray, dt: np.ndarray,
                         pu: np.ndarray, pt: np.ndarray) -> np.ndarray:
    """For each probe (pu, pt), the index into the (du, dt)-lexsorted
    dim arrays of the LAST dim row with (du, dt) <= (pu, pt) in
    two-key order — fully vectorized via one merged lexsort + a
    running maximum (dims sort BEFORE probes at exact (user, ts) ties,
    so a version starting exactly at the fact's ts matches: closed
    start).  -1 when no dim row precedes the probe; the CALLER must
    still check the user matches."""
    n_d = len(du)
    order = np.lexsort((np.r_[np.zeros(n_d, np.int8),
                              np.ones(len(pu), np.int8)],
                        np.r_[dt, pt],
                        np.r_[du, pu]))
    is_dim = order < n_d
    dim_ord = np.where(is_dim, order, -1)
    latest = np.maximum.accumulate(dim_ord)
    probe_pos = np.flatnonzero(~is_dim)
    res = np.empty(len(pu), dtype=np.int64)
    res[order[probe_pos] - n_d] = latest[probe_pos]
    return res


def temporal_join(sf_dir: str) -> ray.data.Dataset:
    """(event_id, user_id, dim_type): each fact event joined to the
    SCD2 version valid at its timestamp."""
    from nerfray.sources.parquet import read_parquet_clean
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])
    def _is_changelog(batch: pa.Table, *, want: bool) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        mask = (eid % 3 == 0) if want else (eid % 3 != 0)
        return batch.filter(pa.array(mask))

    dim = scd2_from(ev.map_batches(
        _is_changelog, fn_kwargs={"want": True},
        batch_format="pyarrow", zero_copy_batch=True))

    def _dim_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "kind": pa.array(["d"] * batch.num_rows, pa.string()),
            "user_id": batch.column("user_id"),
            "t_us": batch.column("v_start_us"),
            "event_id": pa.array(np.zeros(batch.num_rows, np.int64),
                                 pa.int64()),
            "typ": batch.column("event_type"),
        })

    def _probe_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "kind": pa.array(["p"] * batch.num_rows, pa.string()),
            "user_id": batch.column("user_id"),
            "t_us": pc.cast(batch.column("ts"), pa.int64()),
            "event_id": batch.column("event_id"),
            "typ": pa.array([""] * batch.num_rows, pa.string()),
        })

    a = dim.map_batches(_dim_rows, batch_format="pyarrow") \
        .union(ev.map_batches(_is_changelog, fn_kwargs={"want": False},
                              batch_format="pyarrow",
                              zero_copy_batch=True)
               .map_batches(_probe_rows, batch_format="pyarrow",
                            zero_copy_batch=True)) \
        .map_batches(_user_bucket, batch_format="pyarrow")
    return a.groupby("hb").map_groups(_temporal_bucket,
                                      batch_format="pyarrow")


_SCD2_DIM_CTE = """
src AS (
  SELECT user_id, epoch_us(ts)::BIGINT AS ts_us, event_id, event_type
  FROM events WHERE event_id % 3 = 0),
flagged2 AS (
  SELECT *, CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                 THEN 1 ELSE 0 END AS chg
  FROM src WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
grp2 AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS g
  FROM flagged2),
dim AS (
  SELECT user_id, min(event_type) AS event_type,
         min(ts_us) AS v_start_us,
         COALESCE(lead(min(ts_us)) OVER (PARTITION BY user_id
                                         ORDER BY min(ts_us)),
                  -1)::BIGINT AS v_end_us
  FROM grp2 GROUP BY user_id, g)
"""

ORACLES["events_temporal_join"] = f"""
WITH {_SCD2_DIM_CTE},
probe AS (
  SELECT event_id, user_id, epoch_us(ts)::BIGINT AS ts_us
  FROM events WHERE event_id % 3 <> 0)
SELECT p.event_id, p.user_id, d.event_type AS dim_type
FROM probe p JOIN dim d ON p.user_id = d.user_id
 AND d.v_start_us <= p.ts_us
 AND (p.ts_us < d.v_end_us OR d.v_end_us = -1)
ORDER BY p.event_id
"""


# ---------------------------------------------------------------------------
# pivot (long -> wide): per-day event-type count matrix
# ---------------------------------------------------------------------------
#
# The reshaping operator class (PIVOT): one row per day, one column per
# event type.  The type vocabulary is DECLARED (the quality-checks
# expectation set), not discovered — a pivot's output schema must be
# known before execution in a streaming engine, exactly why SQL PIVOT
# needs IN (...).  Per-block partials pre-aggregate (day, type) cells,
# the one day-grain groupby sums, and the widening is a map over the
# aggregated rows.  Unknown types fall into n_other so rows are never
# silently dropped.

PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_daily_types(sf_dir: str) -> ray.data.Dataset:
    """(day, n_click, n_error, n_purchase, n_signup, n_view, n_other)."""
    from nerfray.sources.parquet import read_parquet_clean
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["ts", "event_type"])

    def _cells(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([("day", pa.int64()),
                                ("event_type", pa.string()),
                                ("n", pa.int64())])
        if batch.num_rows == 0:
            return out_schema.empty_table()
        day = (pc.cast(batch.column("ts"), pa.int64()).to_numpy()
               // _DAY_US)
        part = pa.Table.from_pydict({
            "day": pa.array(day, pa.int64()),
            "event_type": batch.column("event_type"),
            "n": pa.array(np.ones(len(day), np.int64), pa.int64())})
        return part.group_by(["day", "event_type"]).aggregate(
            [("n", "sum")]).rename_columns(["day", "event_type", "n"]) \
            .cast(out_schema)

    def _widen(group: pa.Table) -> pa.Table:
        fields = [("day", pa.string())] + \
            [(f"n_{t}", pa.int64()) for t in PIVOT_TYPES] + \
            [("n_other", pa.int64())]
        out_schema = pa.schema(fields)
        if group.num_rows == 0:
            return out_schema.empty_table()
        days = group.column("day").to_numpy(zero_copy_only=False)
        types = np.asarray(group.column("event_type").to_pylist(),
                           dtype=object)
        ns = group.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(days, kind="stable")
        d_s, t_s, n_s = days[order], types[order], ns[order]
        starts = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
        uniq_days = d_s[starts]
        cols = {f"n_{t}": np.zeros(len(uniq_days), np.int64)
                for t in PIVOT_TYPES}
        other = np.zeros(len(uniq_days), np.int64)
        run = np.cumsum(np.r_[False, d_s[1:] != d_s[:-1]])
        for t in PIVOT_TYPES:
            m = t_s == t
            np.add.at(cols[f"n_{t}"], run[m], n_s[m])
        m_other = ~np.isin(t_s, np.array(PIVOT_TYPES, dtype=object))
        np.add.at(other, run[m_other], n_s[m_other])
        lab = np.datetime_as_string(uniq_days.astype("datetime64[D]"),
                                    unit="D")
        out = {"day": pa.array(lab.tolist(), pa.string())}
        for t in PIVOT_TYPES:
            out[f"n_{t}"] = pa.array(cols[f"n_{t}"], pa.int64())
        out["n_other"] = pa.array(other, pa.int64())
        return pa.Table.from_pydict(out, schema=out_schema)

    def _day_bucket(batch: pa.Table) -> pa.Table:
        hb = pc.cast(pc.bit_wise_and(batch.column("day"), 63),
                     pa.int32())
        return batch.append_column("hb", hb)

    return ev.map_batches(_cells, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(["day", "event_type"]).sum("n") \
        .rename_columns({"sum(n)": "n"}) \
        .map_batches(_day_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_widen, batch_format="pyarrow")


ORACLES["events_pivot_daily"] = f"""
SELECT strftime(ts::DATE, '%Y-%m-%d') AS day,
       {", ".join(
           f"sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
           f"::BIGINT AS n_{t}" for t in PIVOT_TYPES)},
       sum(CASE WHEN event_type NOT IN ({", ".join(
           "'" + t + "'" for t in PIVOT_TYPES)})
           THEN 1 ELSE 0 END)::BIGINT AS n_other
FROM events GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# unpivot (wide -> long): melt the daily pivot back to (day, type, n)
# ---------------------------------------------------------------------------
#
# The inverse reshaping: each wide row explodes into one long row per
# nonzero counter (zero cells vanish — the grouped long form has no
# zero rows to round-trip to).  Composed over pivot_daily_types, the
# pair proves pivot ∘ unpivot == the plain long rollup, which is
# exactly what the oracle states (with out-of-vocabulary types named
# 'other', the only name the wide form retains for them).

def unpivot_daily_types(sf_dir: str) -> ray.data.Dataset:
    """(day, event_type, n) melted from the daily pivot."""
    wide = pivot_daily_types(sf_dir)
    names = list(PIVOT_TYPES) + ["other"]

    def _melt(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([("day", pa.string()),
                                ("event_type", pa.string()),
                                ("n", pa.int64())])
        if batch.num_rows == 0:
            return out_schema.empty_table()
        days = np.asarray(batch.column("day").to_pylist(), dtype=object)
        mats = np.stack([batch.column(f"n_{t}")
                         .to_numpy(zero_copy_only=False)
                         for t in names], axis=1)  # (rows, types)
        r, c = np.nonzero(mats)
        return pa.Table.from_pydict({
            "day": pa.array(days[r], pa.string()),
            "event_type": pa.array(
                np.array(names, dtype=object)[c], pa.string()),
            "n": pa.array(mats[r, c], pa.int64()),
        }, schema=out_schema)

    return wide.map_batches(_melt, batch_format="pyarrow",
                            zero_copy_batch=True)


ORACLES["events_unpivot_daily"] = f"""
SELECT strftime(ts::DATE, '%Y-%m-%d') AS day,
       CASE WHEN event_type IN ({", ".join(
           "'" + t + "'" for t in PIVOT_TYPES)})
            THEN event_type ELSE 'other' END AS event_type,
       count(*)::BIGINT AS n
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# two-sample A/B test (experiment analysis, integer-exact z-test)
# ---------------------------------------------------------------------------
#
# The experiment-analysis operator class: compare a metric between two
# cohorts with a two-sample z-test.  Same moment-space discipline as
# value_outliers_from: per-block (cohort, n, sum, sumsq) partials at
# cents grain, one tiny cohort groupby, and the z-test cleared of every
# division by cross-multiplying —
#   (m1-m2)^2 > z^2 (v1/n1 + v2/n2)
# with m_i = S_i/n_i and v_i = (n_i Q_i - S_i^2)/n_i^2 becomes
#   (n2 S1 - n1 S2)^2 n1 n2 > z^2 [ (n1 Q1 - S1^2) n2^3
#                                   + (n2 Q2 - S2^2) n1^3 ]
# — integer-exact, so the verdict is hash-identical to the SQL mirror.
# The planted treatment (+500 cents for even users' purchases) is
# doc-arithmetic, making the whole test deterministic.

AB_Z = 3
AB_LIFT_CENTS = 500


def ab_test(sf_dir: str) -> ray.data.Dataset:
    """One audit row: cohort moments + the integer z-test verdict for
    the planted treatment on purchase values."""
    from nerfray.sources.parquet import read_parquet_clean
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "event_type", "value"])

    def _moments(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([("cohort", pa.int64()),
                                ("n", pa.int64()),
                                ("s", pa.int64()),
                                ("q", pa.int64())])
        m = pc.equal(batch.column("event_type"), "purchase")
        t = batch.filter(m)
        if t.num_rows == 0:
            return out_schema.empty_table()
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        c = np.round(t.column("value").to_numpy(zero_copy_only=False)
                     * 100).astype(np.int64)
        cohort = (u % 2 == 0).astype(np.int64)  # 1 = treatment
        c = c + cohort * AB_LIFT_CENTS          # planted lift
        rows = []
        for g in (0, 1):
            sel = c[cohort == g]
            if len(sel):
                rows.append((g, len(sel), int(sel.sum()),
                             int((sel * sel).sum())))
        return pa.Table.from_pydict({
            "cohort": pa.array([r[0] for r in rows], pa.int64()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "s": pa.array([r[2] for r in rows], pa.int64()),
            "q": pa.array([r[3] for r in rows], pa.int64()),
        }, schema=out_schema)

    agg = {r["cohort"]: r for r in
           ev.map_batches(_moments, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("cohort").sum(["n", "s", "q"])
           .rename_columns({"sum(n)": "n", "sum(s)": "s",
                            "sum(q)": "q"}).take_all()}
    n1, s1, q1 = (agg[1][k] for k in ("n", "s", "q"))  # treatment
    n0, s0, q0 = (agg[0][k] for k in ("n", "s", "q"))  # control
    lhs = (n0 * s1 - n1 * s0) ** 2 * n1 * n0
    rhs = AB_Z * AB_Z * ((n1 * q1 - s1 * s1) * n0 ** 3
                         + (n0 * q0 - s0 * s0) * n1 ** 3)
    return ray.data.from_arrow(pa.Table.from_pydict({
        "n_treat": pa.array([n1], pa.int64()),
        "n_ctrl": pa.array([n0], pa.int64()),
        "sum_treat": pa.array([s1], pa.int64()),
        "sum_ctrl": pa.array([s0], pa.int64()),
        "significant": pa.array([int(lhs > rhs)], pa.int64()),
        "treat_higher": pa.array(
            [int(n0 * s1 > n1 * s0)], pa.int64()),
    }))


ORACLES["events_ab_test"] = f"""
WITH p AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS cohort,
         round(value * 100)::BIGINT
           + CASE WHEN user_id % 2 = 0
                  THEN {AB_LIFT_CENTS} ELSE 0 END AS c
  FROM events WHERE event_type = 'purchase'),
m AS (SELECT cohort, count(*)::BIGINT AS n, sum(c)::BIGINT AS s,
             sum(c * c)::HUGEINT AS q
      FROM p GROUP BY cohort),
x AS (SELECT
        (SELECT n FROM m WHERE cohort = 1) AS n1,
        (SELECT s FROM m WHERE cohort = 1) AS s1,
        (SELECT q FROM m WHERE cohort = 1) AS q1,
        (SELECT n FROM m WHERE cohort = 0) AS n0,
        (SELECT s FROM m WHERE cohort = 0) AS s0,
        (SELECT q FROM m WHERE cohort = 0) AS q0),
y AS (SELECT n1, s1, q1, n0, s0, q0,
             n0::HUGEINT * s1 - n1::HUGEINT * s0 AS d
      FROM x)
SELECT n1::BIGINT AS n_treat, n0::BIGINT AS n_ctrl,
       s1::BIGINT AS sum_treat, s0::BIGINT AS sum_ctrl,
       CASE WHEN d * d * n1 * n0
               > {AB_Z * AB_Z} * ((n1 * q1 - s1::HUGEINT * s1)
                                  * n0::HUGEINT * n0 * n0
                                  + (n0 * q0 - s0::HUGEINT * s0)
                                  * n1::HUGEINT * n1 * n1)
            THEN 1 ELSE 0 END::BIGINT AS significant,
       CASE WHEN d > 0 THEN 1 ELSE 0 END::BIGINT AS treat_higher
FROM y
"""


# ---------------------------------------------------------------------------
# row-frame moving aggregate (ROWS BETWEEN k-1 PRECEDING AND CURRENT)
# ---------------------------------------------------------------------------
#
# The frame-window class the time-based sliding op doesn't cover: a
# moving sum over each user's last k EVENTS (row frame, not time
# range).  One user-hash exchange; per bucket the moving sum is the
# cumsum-difference trick over (user, ts, event_id)-sorted runs —
# frames never cross user boundaries because the subtrahend index is
# clamped to the run start.  Cents-exact, ties broken by event_id
# exactly as the SQL window ORDER BY does.

MOVING_K = 3


def moving_sum(sf_dir: str, *, k: int = MOVING_K) -> ray.data.Dataset:
    """(event_id, user_id, msum_cents): sum of the event's and its
    k-1 preceding events' cents within its user's (ts, event_id)
    order."""
    from nerfray.sources.parquet import read_parquet_clean
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_id", "user_id", "ts",
                                     "value"])

    def _narrow(batch: pa.Table) -> pa.Table:
        c = np.round(batch.column("value")
                     .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        return pa.Table.from_pydict({
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
            "cents": pa.array(c, pa.int64()),
        })

    def _msum_bucket(group: pa.Table) -> pa.Table:
        out_schema = pa.schema([("event_id", pa.int64()),
                                ("user_id", pa.int64()),
                                ("msum_cents", pa.int64())])
        if group.num_rows == 0:
            return out_schema.empty_table()
        u = group.column("user_id").to_numpy(zero_copy_only=False)
        t = group.column("ts_us").to_numpy(zero_copy_only=False)
        e = group.column("event_id").to_numpy(zero_copy_only=False)
        c = group.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, u))
        u_s, e_s, c_s = u[order], e[order], c[order]
        cum = np.cumsum(c_s)
        starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
        run = np.cumsum(np.r_[False, u_s[1:] != u_s[:-1]])
        pos = np.arange(len(u_s)) - starts[run]
        # frame start j = max(run_start, i-k+1); msum = cum[i] -
        # cum[j-1] sums exactly j..i, never crossing the user boundary
        # (j >= run_start, and cum[run_start-1] removes every earlier
        # element including the previous user's)
        prev_idx = np.arange(len(u_s)) - np.minimum(pos, k - 1) - 1
        msum = cum - np.where(prev_idx >= 0,
                              cum[np.maximum(prev_idx, 0)], 0)
        return pa.Table.from_pydict({
            "event_id": pa.array(e_s, pa.int64()),
            "user_id": pa.array(u_s, pa.int64()),
            "msum_cents": pa.array(msum, pa.int64()),
        }, schema=out_schema)

    return ev.map_batches(_narrow, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .map_batches(_user_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_msum_bucket, batch_format="pyarrow")


ORACLES["events_moving_sum"] = f"""
SELECT event_id, user_id,
       sum(round(value * 100)::BIGINT) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN {MOVING_K - 1} PRECEDING AND CURRENT ROW
       )::BIGINT AS msum_cents
FROM events ORDER BY event_id
"""


# -- activity streaks (gaps and islands) ------------------------------------


def _streak_day_partial(batch: pa.Table) -> pa.Table:
    """Block-local distinct (user, active-day) rows — the only thing
    that ever shuffles; day as int64 days-since-epoch so the island
    arithmetic below is pure integer."""
    us = batch.column("user_id").to_numpy(zero_copy_only=False)
    ts = pc.cast(batch.column("ts"), pa.int64()).to_numpy(
        zero_copy_only=False)
    day = ts // 86_400_000_000
    key = us * np.int64(1 << 20) + day  # day < 2^20 for any sane epoch
    _, idx = np.unique(key, return_index=True)
    hb = (us[idx] & (N_KEY_BUCKETS - 1)).astype(np.int32)
    return pa.Table.from_pydict({
        "user_id": pa.array(us[idx], pa.int64()),
        "day": pa.array(day[idx], pa.int64()),
        "hb": pa.array(hb, pa.int32()),
    })


def _streak_bucket(group: pa.Table) -> pa.Table:
    """Every user in one hash bucket, fully vectorized: global distinct
    (user, day), islands start at a user change or a day jump != 1,
    per-user rollups via reduceat over island runs."""
    out_schema = pa.schema([
        ("user_id", pa.int64()), ("n_active_days", pa.int64()),
        ("n_streaks", pa.int64()), ("max_streak", pa.int64())])
    if group.num_rows == 0:
        return out_schema.empty_table()
    us = group.column("user_id").to_numpy(zero_copy_only=False)
    day = group.column("day").to_numpy(zero_copy_only=False)
    key = us * np.int64(1 << 20) + day
    _, idx = np.unique(key, return_index=True)  # cross-block dedup
    u, d = us[idx], day[idx]
    order = np.lexsort((d, u))
    u, d = u[order], d[order]
    isl_start = np.flatnonzero(
        np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)])
    isl_len = np.diff(np.r_[isl_start, len(u)])
    isl_user = u[isl_start]
    ustart = np.flatnonzero(np.r_[True, isl_user[1:] != isl_user[:-1]])
    return pa.Table.from_pydict({
        "user_id": pa.array(isl_user[ustart], pa.int64()),
        "n_active_days": pa.array(
            np.add.reduceat(isl_len, ustart), pa.int64()),
        "n_streaks": pa.array(
            np.diff(np.r_[ustart, len(isl_user)]), pa.int64()),
        "max_streak": pa.array(
            np.maximum.reduceat(isl_len, ustart), pa.int64()),
    }, schema=out_schema)


def activity_streaks(sf_dir: str) -> ray.data.Dataset:
    """Longest consecutive-active-day streak per user (gaps-and-islands,
    the engagement/retention window class): per-block distinct
    (user, day) partials -> ONE user-hash co-group -> vectorized island
    sweep. Only (user, day) int rows shuffle, bounded by distinct
    user-days, never by event count."""
    from nerfray.sources.parquet import read_parquet_clean
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts"])
    return ev.map_batches(_streak_day_partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("hb").map_groups(_streak_bucket, batch_format="pyarrow")


ORACLES["events_streaks"] = """
WITH days AS (
  SELECT DISTINCT user_id,
         (epoch(ts)::BIGINT // 86400) AS day
  FROM events
), isl AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
           AS grp
  FROM days
), streaks AS (
  SELECT user_id, grp, count(*)::BIGINT AS len
  FROM isl GROUP BY user_id, grp
)
SELECT user_id,
       sum(len)::BIGINT   AS n_active_days,
       count(*)::BIGINT   AS n_streaks,
       max(len)::BIGINT   AS max_streak
FROM streaks GROUP BY user_id
"""


# -- interval-union coverage per user (merge-overlaps / covered time) --------
#
# Each event opens a usage interval [ts, ts + dur) with a deterministic
# integer duration derived from the row (abs(cents) % COVER_MOD +
# COVER_BASE_MIN minutes); the operator reports, per user, the total
# length of the UNION of their intervals plus the island count — the
# classic "merge overlapping intervals" windowed op (billing coverage,
# uptime stitching).  Shape: one 64-way user-hash co-group; inside each
# bucket the sweep is fully vectorized via the run-offset band trick
# (shift every user's timeline into a disjoint band so one global
# maximum.accumulate implements the per-user running max-end reset).
# Union length is a set measure, so the SQL window mirror (max(hi) OVER
# preceding rows) agrees regardless of equal-lo tie order.

COVER_BASE_MIN = 30
COVER_MOD = 180

_COVER_SCHEMA = pa.schema([
    ("user_id", pa.int64()),
    ("covered_us", pa.int64()),
    ("n_islands", pa.int64()),
])


def _covered_bucket(group: pa.Table) -> pa.Table:
    us = group.column("user_id").to_numpy(zero_copy_only=False)
    if len(us) == 0:
        return _COVER_SCHEMA.empty_table()
    ts = pc.cast(group.column("ts"), pa.int64()).to_numpy(
        zero_copy_only=False)
    cents = np.round(group.column("value").to_numpy(
        zero_copy_only=False) * 100).astype(np.int64)
    dur = (np.abs(cents) % COVER_MOD + COVER_BASE_MIN) * 60_000_000
    lo, hi = ts, ts + dur
    order = np.lexsort((hi, lo, us))
    u, l, h = us[order], lo[order], hi[order]
    user_change = np.r_[True, u[1:] != u[:-1]]
    run = np.cumsum(user_change) - 1
    tmin = int(l.min())
    span = int(h.max()) - tmin
    off = span + 2
    if (int(run[-1]) + 1) * off >= 2 ** 62:
        raise ValueError("covered_time: run-offset band would overflow "
                         "int64; raise n_buckets")
    l_adj = (l - tmin) + run * off
    h_adj = (h - tmin) + run * off
    run_max = np.maximum.accumulate(h_adj)
    prev = np.r_[np.int64(-1), run_max[:-1]]
    contrib = np.maximum(h_adj - np.maximum(l_adj, prev), 0)
    island = l_adj > prev  # prior user's band always ends below ours
    ustarts = np.flatnonzero(user_change)
    return pa.Table.from_pydict({
        "user_id": pa.array(u[ustarts], pa.int64()),
        "covered_us": pa.array(np.add.reduceat(contrib, ustarts),
                               pa.int64()),
        "n_islands": pa.array(
            np.add.reduceat(island.astype(np.int64), ustarts), pa.int64()),
    }, schema=_COVER_SCHEMA)


def covered_time(sf_dir: str) -> ray.data.Dataset:
    from nerfray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts", "value"])
    return ds.map_batches(_user_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_covered_bucket, batch_format="pyarrow")


ORACLES["events_covered_time"] = f"""
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS lo,
         epoch_us(ts) + (abs(round(value * 100))::BIGINT % {COVER_MOD}
                         + {COVER_BASE_MIN}) * 60000000 AS hi
  FROM events
),
m AS (
  SELECT user_id, lo, hi,
         max(hi) OVER (PARTITION BY user_id ORDER BY lo, hi
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_hi
  FROM iv
)
SELECT user_id,
       sum(greatest(hi - greatest(lo, coalesce(prev_hi, lo)), 0))::BIGINT
         AS covered_us,
       sum(CASE WHEN prev_hi IS NULL OR lo > prev_hi THEN 1 ELSE 0
           END)::BIGINT AS n_islands
FROM m GROUP BY user_id ORDER BY user_id
"""


# -- event-type transition matrix (per-user Markov bigrams) ------------------
#
# Adjacent (event_type -> next event_type) counts along each user's
# timeline, ordered by (ts, event_id) so the sequence is total.  The
# per-bucket pass dictionary-encodes the types and counts pair codes
# with one np.unique; partials are at most n_types^2 rows per bucket,
# so the final groupby-sum exchange is O(types^2 x buckets) — never
# event-proportional.

_TRANS_SCHEMA = pa.schema([
    ("prev_type", pa.string()),
    ("next_type", pa.string()),
    ("n", pa.int64()),
])


def _transitions_bucket(group: pa.Table) -> pa.Table:
    us = group.column("user_id").to_numpy(zero_copy_only=False)
    if len(us) == 0:
        return _TRANS_SCHEMA.empty_table()
    ts = pc.cast(group.column("ts"), pa.int64()).to_numpy(
        zero_copy_only=False)
    eid = group.column("event_id").to_numpy(zero_copy_only=False)
    enc = pc.dictionary_encode(pc.cast(
        group.column("event_type"), pa.string()).combine_chunks())
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary
    order = np.lexsort((eid, ts, us))
    u, c = us[order], codes[order]
    same_user = u[1:] == u[:-1]
    nv = len(vocab)
    pair = c[:-1][same_user] * nv + c[1:][same_user]
    uniq, cnt = np.unique(pair, return_counts=True)
    return pa.Table.from_pydict({
        "prev_type": vocab.take(pa.array(uniq // nv, pa.int64())),
        "next_type": vocab.take(pa.array(uniq % nv, pa.int64())),
        "n": pa.array(cnt.astype(np.int64), pa.int64()),
    }, schema=_TRANS_SCHEMA)


def event_transitions(sf_dir: str) -> ray.data.Dataset:
    from ray.data.aggregate import Sum

    from nerfray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"])
    return ds.map_batches(_user_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_transitions_bucket,
                                  batch_format="pyarrow") \
        .groupby(["prev_type", "next_type"]) \
        .aggregate(Sum("n", alias_name="n"))


ORACLES["events_transitions"] = """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS nxt
  FROM events
)
SELECT event_type AS prev_type, nxt AS next_type, count(*)::BIGINT AS n
FROM s WHERE nxt IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


# -- onboarding curve: new users per day + cumulative distinct users ----------
#
# Exact cumulative-distinct over time (the retention/onboarding curve):
# a user counts on their FIRST active day only.  Block partials are
# (user, min day) rows; one user-hash co-group takes the global min per
# user; per-day counts then fold through a single day-ordered sweep in
# one constant-key group (days are calendar-bounded — the only stage
# that sees all days sees ONLY day-grain rows).

_NEWU_SCHEMA = pa.schema([("user_id", pa.int64()), ("day", pa.int64())])
_NEWU_OUT = pa.schema([("day", pa.string()), ("n_new", pa.int64()),
                       ("cum_users", pa.int64())])


def _first_day_partial(batch: pa.Table) -> pa.Table:
    us = batch.column("user_id").to_numpy(zero_copy_only=False)
    if len(us) == 0:
        return _NEWU_SCHEMA.empty_table()
    day = (pc.cast(batch.column("ts"), pa.int64()).to_numpy(
        zero_copy_only=False) // 86_400_000_000).astype(np.int64)
    order = np.lexsort((day, us))
    u, d = us[order], day[order]
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    return pa.Table.from_pydict({
        "user_id": pa.array(u[starts], pa.int64()),
        "day": pa.array(d[starts], pa.int64()),
    }, schema=_NEWU_SCHEMA)


def _newu_fold(group: pa.Table) -> pa.Table:
    if group.num_rows == 0:
        return _NEWU_OUT.empty_table()
    d = group.column("day").to_numpy(zero_copy_only=False)
    uniq, cnt = np.unique(d, return_counts=True)
    cum = np.cumsum(cnt)
    days = [np.datetime_as_string(np.datetime64(int(x), "D"))
            for x in uniq]
    return pa.Table.from_pydict({
        "day": pa.array(days, pa.string()),
        "n_new": pa.array(cnt.astype(np.int64), pa.int64()),
        "cum_users": pa.array(cum.astype(np.int64), pa.int64()),
    }, schema=_NEWU_OUT)


def _min_day_bucket(group: pa.Table) -> pa.Table:
    us = group.column("user_id").to_numpy(zero_copy_only=False)
    if len(us) == 0:
        return pa.schema([("day", pa.int64()),
                          ("k", pa.int32())]).empty_table()
    day = group.column("day").to_numpy(zero_copy_only=False)
    order = np.lexsort((day, us))
    u, d = us[order], day[order]
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    return pa.Table.from_pydict({
        "day": pa.array(d[starts], pa.int64()),
        "k": pa.array(np.zeros(len(starts), np.int32), pa.int32()),
    })


def new_users_daily(sf_dir: str) -> ray.data.Dataset:
    from nerfray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts"])
    return ds.map_batches(_first_day_partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .map_batches(_user_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_min_day_bucket,
                                  batch_format="pyarrow") \
        .groupby("k").map_groups(_newu_fold, batch_format="pyarrow")


ORACLES["events_new_users_daily"] = """
WITH f AS (SELECT user_id, min(ts::DATE) AS day FROM events GROUP BY 1),
d AS (SELECT day, count(*)::BIGINT AS n_new FROM f GROUP BY 1)
SELECT strftime(day, '%Y-%m-%d') AS day, n_new,
       sum(n_new) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_users
FROM d ORDER BY day
"""


# -- per-user dense rank of event value (partitioned window rank) -------------
#
# dense_rank() over (partition by user order by cents): the window-rank
# class over an event-proportional output.  One user-hash co-group;
# inside, ranks come from one lexsort + run arithmetic (no per-user
# dispatch).  Cents keep the order integer-exact.

_URANK_SCHEMA = pa.schema([("event_id", pa.int64()),
                           ("user_id", pa.int64()),
                           ("value_rank", pa.int64())])


def _user_rank_bucket(group: pa.Table) -> pa.Table:
    us = group.column("user_id").to_numpy(zero_copy_only=False)
    if len(us) == 0:
        return _URANK_SCHEMA.empty_table()
    eid = group.column("event_id").to_numpy(zero_copy_only=False)
    cents = np.round(group.column("value").to_numpy(
        zero_copy_only=False) * 100).astype(np.int64)
    order = np.lexsort((cents, us))
    u, c = us[order], cents[order]
    user_change = np.r_[True, u[1:] != u[:-1]]
    new_val = user_change | np.r_[True, c[1:] != c[:-1]]
    # dense rank = running count of distinct values within the user run
    grp = np.cumsum(new_val)
    first_grp_of_user = grp[np.flatnonzero(user_change)]
    rank = grp - np.repeat(first_grp_of_user, np.diff(np.r_[
        np.flatnonzero(user_change), len(u)])) + 1
    return pa.Table.from_pydict({
        "event_id": pa.array(eid[order], pa.int64()),
        "user_id": pa.array(u, pa.int64()),
        "value_rank": pa.array(rank.astype(np.int64), pa.int64()),
    }, schema=_URANK_SCHEMA)


def user_value_ranks(sf_dir: str) -> ray.data.Dataset:
    from nerfray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "value"])
    return ds.map_batches(_user_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_user_rank_bucket,
                                  batch_format="pyarrow")


ORACLES["events_user_rank"] = """
SELECT event_id, user_id,
       dense_rank() OVER (PARTITION BY user_id
                          ORDER BY round(value * 100)::BIGINT)::BIGINT
         AS value_rank
FROM events ORDER BY event_id
"""


# -- CUSUM drift detection over per-user daily activity -----------------------
#
# Changepoint monitoring (the page-Hinkley/CUSUM class): per user, over
# the day-ordered daily event counts x_d, the one-sided CUSUM statistic
# s_d = max(0, s_{d-1} + x_d - CUSUM_K); days with s_d >= CUSUM_H are
# drift alerts.  Integer end to end.  Vectorized via the prefix
# identity s_d = c_d - min(0, min_{j<=d} c_j) with c = cumsum(x - K):
# inside one user-hash co-group, segmented cumsum (offset-corrected
# global cumsum) + segmented running min (per-run additive shift so
# earlier runs never win) — no per-user Python dispatch.

CUSUM_K = 3   # allowed drift per day
CUSUM_H = 5   # alert threshold

_CUSUM_SCHEMA = pa.schema([
    ("user_id", pa.int64()),
    ("n_alert_days", pa.int64()),
    ("max_stat", pa.int64()),
])


def _cusum_partial(batch: pa.Table) -> pa.Table:
    us = batch.column("user_id").to_numpy(zero_copy_only=False)
    if len(us) == 0:
        return pa.schema([("user_id", pa.int64()), ("day", pa.int64()),
                          ("c", pa.int64())]).empty_table()
    day = (pc.cast(batch.column("ts"), pa.int64()).to_numpy(
        zero_copy_only=False) // 86_400_000_000).astype(np.int64)
    order = np.lexsort((day, us))
    u, d = us[order], day[order]
    starts = np.flatnonzero(np.r_[True, (u[1:] != u[:-1])
                                  | (d[1:] != d[:-1])])
    return pa.Table.from_pydict({
        "user_id": pa.array(u[starts], pa.int64()),
        "day": pa.array(d[starts], pa.int64()),
        "c": pa.array(np.diff(np.r_[starts, len(u)]), pa.int64()),
    })


def _cusum_bucket(group: pa.Table) -> pa.Table:
    if group.num_rows == 0:
        return _CUSUM_SCHEMA.empty_table()
    us = group.column("user_id").to_numpy(zero_copy_only=False)
    dy = group.column("day").to_numpy(zero_copy_only=False)
    cc = group.column("c").to_numpy(zero_copy_only=False)
    order = np.lexsort((dy, us))
    u, d, c = us[order], dy[order], cc[order]
    # fold same (user, day) partials from different blocks
    starts = np.flatnonzero(np.r_[True, (u[1:] != u[:-1])
                                  | (d[1:] != d[:-1])])
    u, d = u[starts], d[starts]
    x = np.add.reduceat(c, starts)
    # segmented cumsum of (x - K) per user
    user_change = np.r_[True, u[1:] != u[:-1]]
    ustarts = np.flatnonzero(user_change)
    run = np.cumsum(user_change) - 1
    g = np.cumsum(x - CUSUM_K)
    seg_c = g - np.repeat(g[ustarts] - (x[ustarts] - CUSUM_K),
                          np.diff(np.r_[ustarts, len(u)]))
    # segmented running min: earlier runs shifted up so they never win
    n_runs = int(run[-1]) + 1
    span = int(seg_c.max() - seg_c.min()) + 1
    if n_runs * span >= 2 ** 62:
        raise ValueError("cusum: per-run min-shift would overflow "
                         "int64; raise n_buckets")
    shift = (n_runs - run).astype(np.int64) * span
    m = np.minimum.accumulate(seg_c + shift) - shift
    s = seg_c - np.minimum(0, m)
    alerts = (s >= CUSUM_H).astype(np.int64)
    return pa.Table.from_pydict({
        "user_id": pa.array(u[ustarts], pa.int64()),
        "n_alert_days": pa.array(np.add.reduceat(alerts, ustarts),
                                 pa.int64()),
        "max_stat": pa.array(np.maximum.reduceat(s, ustarts),
                             pa.int64()),
    }, schema=_CUSUM_SCHEMA)


def cusum_alerts(sf_dir: str) -> ray.data.Dataset:
    from nerfray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts"])
    return ds.map_batches(_cusum_partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .map_batches(_user_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_cusum_bucket, batch_format="pyarrow")


ORACLES["events_cusum_alerts"] = f"""
WITH x AS (SELECT user_id, ts::DATE AS day, count(*)::BIGINT AS c
           FROM events GROUP BY 1, 2),
cs AS (SELECT user_id, day,
              sum(c - {CUSUM_K}) OVER (PARTITION BY user_id ORDER BY day
                                       ROWS UNBOUNDED PRECEDING) AS cum
       FROM x),
m AS (SELECT user_id, cum,
             least(0, min(cum) OVER (PARTITION BY user_id ORDER BY day
                                     ROWS UNBOUNDED PRECEDING)) AS mn
      FROM cs),
s AS (SELECT user_id, (cum - mn)::BIGINT AS stat FROM m)
SELECT user_id,
       sum(CASE WHEN stat >= {CUSUM_H} THEN 1 ELSE 0 END)::BIGINT
         AS n_alert_days,
       max(stat)::BIGINT AS max_stat
FROM s GROUP BY user_id ORDER BY user_id
"""
