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
