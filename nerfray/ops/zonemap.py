"""Zone-map (per-file min/max statistics) pruned scans.

The engine-level file-skipping primitive every lakehouse query path
relies on: a table laid out in key ranges plus a small sidecar of
per-file (min, max) statistics lets a range predicate decide which
files CANNOT contain matches and skip them without reading a byte of
data.  This module builds the zone map from parquet FOOTERS ONLY
(column statistics in the file metadata — no row data is read to index
the table) and answers range rollups reading only overlapping files.

Scale shape: statistics collection is a map over FILE PATHS (one footer
read per file, distributed via ``ray.data.from_items(paths)``), so
indexing a 100 TB table touches metadata only; the zone map itself is
one row per file — at 10^6+ files keep it as a Dataset / parquet
sidecar (here the driver holds it, O(files), documented).  The pruned
scan reads only the selected files with a pushed-down row filter, so
I/O is proportional to the SELECTED range, not the table.

The query surface (``events_zonemap_scan``) is exactly SQL-mirrorable:
the probe range is integer arithmetic on the table's global [min, max]
ts (derived from the zone map itself — min of mins / max of maxes), and
the rollup is integer cents.  The pruning is semantics-invisible
(ZONEMAP_SQL is the plain filtered rollup); ``scan_stats`` exposes
files_read / files_total so tests pin that skipping actually happens.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray.data

from .rank import write_range_partitioned_sampled

N_ZONE_PARTS = 8


def _events_ts_us(sf_dir: str) -> ray.data.Dataset:
    """events as (event_id, ts_us, event_type, cents) — timestamps as
    int64 micros, values as exact cents."""
    from nerfray.sources.parquet import read_parquet_clean
    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "event_type", "value"])

    def _conv(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64())
        v = batch.column("value").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "event_id": batch.column("event_id"),
            "ts_us": ts,
            "event_type": batch.column("event_type"),
            "cents": pa.array(np.round(v * 100).astype(np.int64),
                              pa.int64()),
        })

    return ev.map_batches(_conv, batch_format="pyarrow",
                          zero_copy_batch=True)


def export_time_layout(ds: ray.data.Dataset, out_dir: str,
                       *, n_parts: int = N_ZONE_PARTS) -> None:
    """Land ``ds`` under ``out_dir`` as part=K hive directories in
    ascending disjoint ts_us ranges (sample-sort boundaries)."""
    write_range_partitioned_sampled(ds, out_dir, value="ts_us",
                                    tiebreak="event_id",
                                    n_parts=n_parts)


def build_zone_map(out_dir: str, *, column: str = "ts_us") -> pa.Table:
    """(path, zmin, zmax, n_rows) per data file under ``out_dir``,
    from parquet footers only (column chunk statistics aggregated over
    row groups — zero row data read).  Distributed: one footer read per
    file via a paths Dataset; the returned table is file-grain small."""
    paths = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(out_dir) for f in fs
        if f.endswith(".parquet"))

    def _footer_stats(batch: dict) -> pa.Table:
        import pyarrow.parquet as pq
        out_p, zmin, zmax, nr = [], [], [], []
        for p in batch["item"]:
            md = pq.ParquetFile(p).metadata
            idx = md.schema.to_arrow_schema().get_field_index(column)
            lo, hi, rows = None, None, 0
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                rows += md.row_group(g).num_rows
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            out_p.append(p)
            zmin.append(int(lo))
            zmax.append(int(hi))
            nr.append(rows)
        return pa.Table.from_pydict({
            "path": pa.array(out_p, pa.string()),
            "zmin": pa.array(zmin, pa.int64()),
            "zmax": pa.array(zmax, pa.int64()),
            "n_rows": pa.array(nr, pa.int64()),
        })

    zm = ray.data.from_items(paths).map_batches(
        _footer_stats, batch_format="numpy").take_all()
    return pa.Table.from_pydict({
        "path": pa.array([r["path"] for r in zm], pa.string()),
        "zmin": pa.array([r["zmin"] for r in zm], pa.int64()),
        "zmax": pa.array([r["zmax"] for r in zm], pa.int64()),
        "n_rows": pa.array([r["n_rows"] for r in zm], pa.int64()),
    })


def pruned_range_rollup(zone_map: pa.Table, lo: int, hi: int
                        ) -> tuple[ray.data.Dataset, dict]:
    """Rollup (event_type, n_events, sum_cents) over ts_us in [lo, hi],
    reading ONLY files whose [zmin, zmax] overlaps the range.  Returns
    (result, scan_stats)."""
    zmin = zone_map.column("zmin").to_numpy()
    zmax = zone_map.column("zmax").to_numpy()
    keep = (zmax >= lo) & (zmin <= hi)
    paths = [p for p, k in zip(zone_map.column("path").to_pylist(), keep)
             if k]
    stats = {"files_total": zone_map.num_rows, "files_read": len(paths)}
    from ray.data.aggregate import Count, Sum
    if not paths:
        empty = pa.schema([("event_type", pa.string()),
                           ("n_events", pa.int64()),
                           ("sum_cents", pa.int64())])
        return ray.data.from_arrow(empty.empty_table()), stats
    res = ray.data.read_parquet(
        paths, columns=["ts_us", "event_type", "cents"],
        filter=(pads.field("ts_us") >= lo) & (pads.field("ts_us") <= hi)) \
        .groupby("event_type").aggregate(Count(), Sum("cents")) \
        .rename_columns({"count()": "n_events",
                         "sum(cents)": "sum_cents"})
    return res, stats


def zonemap_scan_query(sf_dir: str) -> ray.data.Dataset:
    """End-to-end surface: lay events out in ts ranges, index from
    footers, probe the deterministic mid-quartile range
    [g0 + span//4, g0 + span//2] (integer arithmetic on the zone map's
    own global bounds — mirrored verbatim in ZONEMAP_SQL) with file
    skipping."""
    out = tempfile.mkdtemp(prefix="nerfray_zonemap_")
    try:
        export_time_layout(_events_ts_us(sf_dir), out)
        zm = build_zone_map(out)
        g0 = int(pc.min(zm.column("zmin")).as_py())
        g1 = int(pc.max(zm.column("zmax")).as_py())
        lo = g0 + (g1 - g0) // 4
        hi = g0 + (g1 - g0) // 2
        res, stats = pruned_range_rollup(zm, lo, hi)
        res = res.materialize()
        assert stats["files_read"] < stats["files_total"], stats
        return res
    finally:
        shutil.rmtree(out, ignore_errors=True)


ZONEMAP_SQL = """
WITH b AS (SELECT min(epoch_us(ts)) AS g0, max(epoch_us(ts)) AS g1
           FROM events),
r AS (SELECT g0 + (g1 - g0) // 4 AS lo, g0 + (g1 - g0) // 2 AS hi FROM b)
SELECT event_type, count(*)::BIGINT AS n_events,
       sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents
FROM events, r
WHERE epoch_us(ts) >= r.lo AND epoch_us(ts) <= r.hi
GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Z-order (multi-column) clustering + 2-D zone-map pruning
# ---------------------------------------------------------------------------
#
# A table laid out in ranges of ONE key only prunes predicates on that
# key.  Z-ORDER clustering (Morton-curve bit interleaving, the
# OPTIMIZE ZORDER of the lakehouse engines) sorts by the interleaved
# bits of several columns, so files stay tight in EVERY interleaved
# dimension at once and a conjunctive range predicate skips on all of
# them.  The curve only changes WHERE rows land — never what they are —
# so the query oracle is the plain filtered rollup and the pruning is
# pinned by scan stats, exactly like the 1-D zone map above.


def _spread_bits32(v: np.ndarray) -> np.ndarray:
    """Spread each of the low 32 bits of v to even positions (Morton)."""
    v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def zorder_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Morton interleave of two non-negative <2^31 int arrays -> int64
    (fits: 2x31 bits + 1), vectorized."""
    z = _spread_bits32(a) | (_spread_bits32(b) << np.uint64(1))
    return z.astype(np.int64)


def build_zone_map_multi(out_dir: str, columns: tuple[str, ...]
                         ) -> pa.Table:
    """(path, n_rows, <c>_min, <c>_max per column) per data file, from
    parquet footers only — the multi-column zone map Z-order layouts
    need."""
    paths = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(out_dir) for f in fs
        if f.endswith(".parquet"))

    def _footer_stats(batch: dict) -> pa.Table:
        import pyarrow.parquet as pq
        rows_out: dict[str, list] = {"path": [], "n_rows": []}
        for c in columns:
            rows_out[f"{c}_min"] = []
            rows_out[f"{c}_max"] = []
        for p in batch["item"]:
            md = pq.ParquetFile(p).metadata
            sch = md.schema.to_arrow_schema()
            rows_out["path"].append(p)
            rows_out["n_rows"].append(
                sum(md.row_group(g).num_rows
                    for g in range(md.num_row_groups)))
            for c in columns:
                idx = sch.get_field_index(c)
                lo, hi = None, None
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(idx).statistics
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                rows_out[f"{c}_min"].append(int(lo))
                rows_out[f"{c}_max"].append(int(hi))
        t = {"path": pa.array(rows_out["path"], pa.string()),
             "n_rows": pa.array(rows_out["n_rows"], pa.int64())}
        for c in columns:
            t[f"{c}_min"] = pa.array(rows_out[f"{c}_min"], pa.int64())
            t[f"{c}_max"] = pa.array(rows_out[f"{c}_max"], pa.int64())
        return pa.Table.from_pydict(t)

    zm = ray.data.from_items(paths).map_batches(
        _footer_stats, batch_format="numpy").take_all()
    cols: dict[str, list] = {k: [r[k] for r in zm] for k in
                             (["path", "n_rows"] +
                              [f"{c}_{s}" for c in columns
                               for s in ("min", "max")])}
    t = {"path": pa.array(cols["path"], pa.string()),
         "n_rows": pa.array(cols["n_rows"], pa.int64())}
    for c in columns:
        t[f"{c}_min"] = pa.array(cols[f"{c}_min"], pa.int64())
        t[f"{c}_max"] = pa.array(cols[f"{c}_max"], pa.int64())
    return pa.Table.from_pydict(t)


def pruned_conjunctive_rollup(zone_map: pa.Table,
                              preds: dict[str, tuple[int, int]]
                              ) -> tuple[ray.data.Dataset, dict]:
    """Rollup (event_type, n_events, sum_cents) under a conjunction of
    closed ranges {col: (lo, hi)}, reading only files whose zone-map
    ranges overlap EVERY predicate."""
    keep = np.ones(zone_map.num_rows, dtype=bool)
    for c, (lo, hi) in preds.items():
        keep &= (zone_map.column(f"{c}_max").to_numpy() >= lo) \
            & (zone_map.column(f"{c}_min").to_numpy() <= hi)
    paths = [p for p, k in
             zip(zone_map.column("path").to_pylist(), keep) if k]
    stats = {"files_total": zone_map.num_rows, "files_read": len(paths)}
    from ray.data.aggregate import Count, Sum
    if not paths:
        empty = pa.schema([("event_type", pa.string()),
                           ("n_events", pa.int64()),
                           ("sum_cents", pa.int64())])
        return ray.data.from_arrow(empty.empty_table()), stats
    expr = None
    for c, (lo, hi) in preds.items():
        e = (pads.field(c) >= lo) & (pads.field(c) <= hi)
        expr = e if expr is None else (expr & e)
    res = ray.data.read_parquet(
        paths, columns=list(preds) + ["event_type", "cents"],
        filter=expr) \
        .groupby("event_type").aggregate(Count(), Sum("cents")) \
        .rename_columns({"count()": "n_events",
                         "sum(cents)": "sum_cents"})
    return res, stats


def export_zorder_layout(ds: ray.data.Dataset, out_dir: str, *,
                         n_parts: int = N_ZONE_PARTS) -> None:
    """Cluster events by the Morton key of (user_id, absolute hour):
    compute z per row (map-only — hour = ts_us // 3.6e9 needs no global
    pass), then the usual sample-sort range layout ON z."""

    def _z(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        h = (batch.column("ts_us").to_numpy(zero_copy_only=False)
             // 3_600_000_000)
        return batch.append_column(
            "z", pa.array(zorder_key(u.astype(np.uint64),
                                     h.astype(np.uint64)), pa.int64()))

    write_range_partitioned_sampled(
        ds.map_batches(_z, batch_format="pyarrow", zero_copy_batch=True),
        out_dir, value="z", tiebreak="event_id", n_parts=n_parts)


def _events_full_ts_us(sf_dir: str) -> ray.data.Dataset:
    """events with user_id carried (Z-order needs both dimensions)."""
    from nerfray.sources.parquet import read_parquet_clean
    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "value"])

    def _conv(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64())
        v = batch.column("value").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "event_id": batch.column("event_id"),
            "ts_us": ts,
            "user_id": batch.column("user_id"),
            "event_type": batch.column("event_type"),
            "cents": pa.array(np.round(v * 100).astype(np.int64),
                              pa.int64()),
        })

    return ev.map_batches(_conv, batch_format="pyarrow",
                          zero_copy_batch=True)


def zorder_scan_query(sf_dir: str) -> ray.data.Dataset:
    """End-to-end 2-D surface: Z-order layout on (user_id, hour), zone
    map on BOTH user_id and ts_us, then a conjunctive probe — users in
    the lowest eighth of the id range x the mid-quartile time window
    (both bounds integer arithmetic on the zone map's global min/max,
    mirrored verbatim in ZORDER_SQL) — with file skipping on both
    dimensions."""
    out = tempfile.mkdtemp(prefix="nerfray_zorder_")
    try:
        export_zorder_layout(_events_full_ts_us(sf_dir), out)
        zmap = build_zone_map_multi(out, ("user_id", "ts_us"))
        u0 = int(pc.min(zmap.column("user_id_min")).as_py())
        u1g = int(pc.max(zmap.column("user_id_max")).as_py())
        g0 = int(pc.min(zmap.column("ts_us_min")).as_py())
        g1 = int(pc.max(zmap.column("ts_us_max")).as_py())
        preds = {
            "user_id": (u0, u0 + (u1g - u0) // 8),
            "ts_us": (g0 + (g1 - g0) // 4, g0 + (g1 - g0) // 2),
        }
        res, stats = pruned_conjunctive_rollup(zmap, preds)
        res = res.materialize()
        assert stats["files_read"] < stats["files_total"], stats
        return res
    finally:
        shutil.rmtree(out, ignore_errors=True)


ZORDER_SQL = """
WITH b AS (SELECT min(epoch_us(ts)) AS g0, max(epoch_us(ts)) AS g1,
                  min(user_id) AS u0, max(user_id) AS u1
           FROM events),
r AS (SELECT g0 + (g1 - g0) // 4 AS lo, g0 + (g1 - g0) // 2 AS hi,
             u0 AS ulo, u0 + (u1 - u0) // 8 AS uhi FROM b)
SELECT event_type, count(*)::BIGINT AS n_events,
       sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents
FROM events, r
WHERE epoch_us(ts) >= r.lo AND epoch_us(ts) <= r.hi
  AND user_id >= r.ulo AND user_id <= r.uhi
GROUP BY event_type ORDER BY event_type
"""


# -- file-level Bloom indexes (point-lookup skipping) ------------------------
#
# Zone maps skip files on RANGE predicates over the layout key; a point
# lookup on a HIGH-CARDINALITY column uncorrelated with the layout
# (user_id in a time-partitioned table) overlaps every file's [min, max]
# and zone maps prune nothing.  The lakehouse answer (Parquet bloom
# filters, Delta/Iceberg file skipping indexes) is a small per-file
# Bloom over the column's distinct values: a membership probe prunes
# every file whose filter provably lacks the key.  Index build is a map
# over FILE PATHS (one column read per file, distributed); the index is
# one fixed-size row per file (FILE_BLOOM_M bits), same driver-side
# O(files) shape as the zone map (documented there).  False positives
# only cost an extra file read — never correctness.

FILE_BLOOM_M = 1024  # bits per file
FILE_BLOOM_K = 4


def build_file_blooms(out_dir: str, *, column: str = "user_id"
                      ) -> pa.Table:
    """(path, words list<uint64 as int64>) — one Bloom per data file,
    built distributed with one column read per file."""
    from .joins import _key_positions
    paths = []
    for root, _dirs, names in os.walk(out_dir):
        paths.extend(os.path.join(root, n) for n in names
                     if n.endswith(".parquet"))
    paths.sort()
    files = ray.data.from_items([{"path": p} for p in paths],
                                override_num_blocks=max(1, len(paths)))

    def _bloom_of(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        out_paths, out_words = [], []
        for p in batch.column("path").to_pylist():
            keys = pq.read_table(p, columns=[column]).column(
                column).to_numpy(zero_copy_only=False)
            u = np.unique(keys)
            words = np.zeros(FILE_BLOOM_M // 64, np.uint64)
            pos = _key_positions(u, FILE_BLOOM_M, FILE_BLOOM_K)
            np.bitwise_or.at(
                words, (pos >> np.uint64(6)).ravel(),
                np.uint64(1) << (pos & np.uint64(63)).ravel())
            out_paths.append(p)
            out_words.append(words.view(np.int64).tolist())
        return pa.Table.from_pydict({
            "path": pa.array(out_paths, pa.string()),
            "words": pa.array(out_words, pa.list_(pa.int64())),
        })

    return pa.Table.from_pylist(
        files.map_batches(_bloom_of, batch_format="pyarrow").take_all(),
        schema=pa.schema([("path", pa.string()),
                          ("words", pa.list_(pa.int64()))]))


def bloom_pruned_point_rollup(index: pa.Table, key: int, *,
                              column: str = "user_id"
                              ) -> tuple[ray.data.Dataset, dict]:
    """Per-event-type rollup of the rows with ``column == key``, reading
    only files whose Bloom contains the key."""
    from .joins import _key_positions
    pos = _key_positions(np.array([key], np.int64),
                         FILE_BLOOM_M, FILE_BLOOM_K)[0]
    keep = []
    for row in index.to_pylist():
        words = np.array(row["words"], np.int64).view(np.uint64)
        hit = all(
            words[int(p) >> 6] & (np.uint64(1) << np.uint64(int(p) & 63))
            for p in pos)
        if hit:
            keep.append(row["path"])
    stats = {"files_total": index.num_rows, "files_read": len(keep)}
    if not keep:
        empty = pa.schema([("event_type", pa.string()),
                           ("n_events", pa.int64()),
                           ("sum_cents", pa.int64())]).empty_table()
        return ray.data.from_arrow(empty), stats
    ds = ray.data.read_parquet(
        keep, columns=[column, "event_type", "cents"],
        filter=(pads.field(column) == key))

    def _partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict({
            "event_type": batch.column("event_type"),
            "cents": batch.column("cents"),
        })
        g = t.group_by("event_type").aggregate(
            [("cents", "count"), ("cents", "sum")])
        return pa.Table.from_pydict({
            "event_type": g.column("event_type"),
            "n_events": pc.cast(g.column("cents_count"), pa.int64()),
            "sum_cents": pc.cast(g.column("cents_sum"), pa.int64()),
            "g": pa.array(np.zeros(g.num_rows, np.int32)),
        })

    def _final(group: pa.Table) -> pa.Table:
        out_schema = pa.schema([("event_type", pa.string()),
                                ("n_events", pa.int64()),
                                ("sum_cents", pa.int64())])
        if group.num_rows == 0:
            return out_schema.empty_table()
        g = group.group_by("event_type").aggregate(
            [("n_events", "sum"), ("sum_cents", "sum")])
        return pa.Table.from_pydict({
            "event_type": g.column("event_type"),
            "n_events": pc.cast(g.column("n_events_sum"), pa.int64()),
            "sum_cents": pc.cast(g.column("sum_cents_sum"), pa.int64()),
        }, schema=out_schema)

    res = ds.map_batches(_partial, batch_format="pyarrow") \
        .groupby("g").map_groups(_final, batch_format="pyarrow")
    return res, stats


def bloom_pointscan_query(sf_dir: str) -> ray.data.Dataset:
    """End-to-end surface: time-partitioned layout, per-file user Bloom
    index, point lookup of the max user_id. Pruning is best-effort on
    natural data (a user active across the whole window appears in
    every file — exactly the case the pytest's planted time-localized
    users complement); semantics are oracle-pinned either way."""
    ev = _events_full_ts_us(sf_dir)
    key = _scalar_max(ev)
    out = tempfile.mkdtemp(prefix="nerfray_filebloom_")
    try:
        export_time_layout(ev, out)
        index = build_file_blooms(out, column="user_id")
        res, stats = bloom_pruned_point_rollup(index, key)
        res = res.materialize()
        assert stats["files_read"] >= 1
        return res
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _scalar_max(ev: ray.data.Dataset) -> int:
    return int(ev.max("user_id"))


FILE_BLOOM_SQL = """
WITH k AS (SELECT max(user_id) AS key FROM events)
SELECT event_type, count(*)::BIGINT AS n_events,
       sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents
FROM events, k WHERE user_id = k.key
GROUP BY event_type
"""
