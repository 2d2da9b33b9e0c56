"""Distributed global ranking: dense ``row_number() OVER (ORDER BY key
DESC, tiebreak ASC)`` over a Dataset without a global sort OR any
row-proportional driver state.

Sample-sort shape (the classic range-partitioned rank):
  1. boundaries — a DETERMINISTIC bounded sample (the SAMPLE_N
     lowest-``tiebreak`` rows, per-block min-k combiner — never the
     data) yields n_parts-1 element-pick key boundaries.  Driver
     state: n_parts-1 ints, regardless of key cardinality (the r3
     shape collected a groupby(key).count() histogram — O(distinct
     keys) driver rows, silently degrading on continuous keys).
  2. part counts — rows route to part = searchsorted(bounds, key,
     'right'); per-block bincount partials give the driver the
     n_parts part sizes (<= blocks x n_parts tiny rows), folded into
     a cumulative offset vector.
  3. rank — ONE part co-group: rows lexsort locally by
     (key, tiebreak) and the broadcast offsets lift local ordinals to
     global ranks.

Routing is a function of the key with one consistent side rule, so
every row of part p orders strictly before every row of part p+1 —
local ordinal + part offset is exact for ANY block structure and any
(even adversarially imbalanced) sample.  Sample bias affects only
balance, never correctness; balance skew is bounded by the usual
sample-sort argument when the tiebreak is value-independent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

N_RANK_BUCKETS = 64


def global_rank(ds: ray.data.Dataset, *, key: str, tiebreak: str,
                out_col: str = "rank", ascending: bool = False,
                n_parts: int = N_RANK_BUCKETS) -> ray.data.Dataset:
    """Append ``out_col`` = global 1-based row number in
    (key DESC, tiebreak ASC) order — or (key ASC, tiebreak ASC) with
    ``ascending=True``. ``key`` and ``tiebreak`` must be integer
    columns; ties on (key, tiebreak) must not exist."""
    sort_key = "__s"

    def _with_s(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return batch.append_column(
            sort_key, pa.array(k if ascending else -k, pa.int64()))

    work = ds.map_batches(_with_s, batch_format="pyarrow",
                          zero_copy_batch=True)
    bounds = sampled_boundaries(work, value=sort_key, tiebreak=tiebreak,
                                n_parts=n_parts, sample_n=SAMPLE_N)
    b_ref = ray.put(bounds)

    def _part(batch: pa.Table) -> pa.Table:
        b = ray.get(b_ref) if isinstance(b_ref, ray.ObjectRef) else b_ref
        s = batch.column(sort_key).to_numpy(zero_copy_only=False)
        p = np.searchsorted(b, s, side="right").astype(np.int64)
        return batch.append_column("__p", pa.array(p, pa.int64()))

    routed = work.map_batches(_part, batch_format="pyarrow")

    def _cnt_partial(batch: pa.Table) -> pa.Table:
        p = batch.column("__p").to_numpy(zero_copy_only=False)
        c = np.bincount(p, minlength=n_parts)
        nz = np.nonzero(c)[0]
        return pa.Table.from_pydict({
            "p": pa.array(nz, pa.int64()),
            "c": pa.array(c[nz], pa.int64())})

    counts = np.zeros(n_parts, dtype=np.int64)
    for row in routed.map_batches(_cnt_partial,
                                  batch_format="pyarrow").take_all():
        counts[row["p"]] += row["c"]  # <= blocks x n_parts tiny rows
    offsets = np.r_[0, np.cumsum(counts)[:-1]].astype(np.int64)
    off_ref = ray.put(offsets)

    def _rank_part(group: pa.Table) -> pa.Table:
        keep = [c for c in group.column_names
                if c not in ("__p", sort_key)]
        out_schema = pa.schema(list(group.select(keep).schema)
                               + [pa.field(out_col, pa.int64())])
        if group.num_rows == 0:
            return out_schema.empty_table()
        offs = ray.get(off_ref) \
            if isinstance(off_ref, ray.ObjectRef) else off_ref
        s = group.column(sort_key).to_numpy(zero_copy_only=False)
        tb = group.column(tiebreak).to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, s))
        p0 = int(group.column("__p")[0].as_py())
        rank = offs[p0] + np.arange(1, len(s) + 1, dtype=np.int64)
        out = group.select(keep).take(pa.array(order, pa.int64()))
        return out.append_column(out_col, pa.array(rank, pa.int64()))

    return routed.groupby("__p").map_groups(_rank_part,
                                            batch_format="pyarrow")


def docs_global_rank(sf_dir: str) -> ray.data.Dataset:
    """Every document's global rank by (n_chars DESC, doc_id ASC) — the
    'order the whole corpus by quality' primitive (full-corpus curation
    cutoffs, curriculum ordering) expressed without a global sort."""
    import os

    from nerfray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "n_chars"])
    return global_rank(ds, key="n_chars", tiebreak="doc_id")


HIST_BUCKETS = 16


def equi_depth_histogram(ds: ray.data.Dataset, *, value: str,
                         tiebreak: str,
                         n_buckets: int = HIST_BUCKETS
                         ) -> ray.data.Dataset:
    """Exact equi-depth histogram without a global sort: bucket of a
    row = ``(asc_rank - 1) * n_buckets // n`` via the two-phase
    global-rank machinery, then one tiny per-bucket rollup (count /
    min / max / sum).  The optimizer-statistics primitive a 100-TB
    scan planner keeps per column."""
    from ray.data.aggregate import Count, Max, Min, Sum

    n = ds.count()
    ranked = global_rank(ds, key=value, tiebreak=tiebreak,
                         ascending=True)

    def _bucket_of(batch: pa.Table) -> pa.Table:
        rk = batch.column("rank").to_numpy(zero_copy_only=False)
        b = (rk - 1) * n_buckets // n
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    return ranked.map_batches(_bucket_of, batch_format="pyarrow") \
        .groupby("bucket").aggregate(
            Count(), Min(value), Max(value), Sum(value)) \
        .rename_columns({
            "count()": "n_rows", f"min({value})": f"min_{value}",
            f"max({value})": f"max_{value}",
            f"sum({value})": f"sum_{value}"})


def docs_length_histogram(sf_dir: str) -> ray.data.Dataset:
    """16-bucket equi-depth histogram of document lengths."""
    import os

    from nerfray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "n_chars"])
    return equi_depth_histogram(ds, value="n_chars", tiebreak="doc_id") \
        .rename_columns({"min_n_chars": "min_chars",
                         "max_n_chars": "max_chars",
                         "sum_n_chars": "sum_chars"})


ORACLES = {
    "docs_length_histogram": f"""
WITH r AS (
  SELECT n_chars,
         row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS rk
  FROM documents
),
nn AS (SELECT count(*)::BIGINT AS n FROM documents)
SELECT (rk * {HIST_BUCKETS} // nn.n)::BIGINT AS bucket,
       count(*)::BIGINT AS n_rows,
       min(n_chars)::BIGINT AS min_chars,
       max(n_chars)::BIGINT AS max_chars,
       sum(n_chars)::BIGINT AS sum_chars
FROM r, nn GROUP BY 1 ORDER BY 1
""",
    "docs_global_rank": """
SELECT doc_id, n_chars,
       row_number() OVER (ORDER BY n_chars DESC, doc_id)::BIGINT AS rank
FROM documents ORDER BY doc_id
""",
}


# -- range-partitioned (globally ordered) export ------------------------------
#
# The ORDER BY / range-partitioning operator class, expressed the scale-safe
# way: instead of ds.sort() (an all-to-all range exchange of full rows),
# the two-phase rank machinery assigns each row its global ordinal, rows
# route to part = (rank-1) * n_parts // n, each part SORTS LOCALLY, and
# write_parquet lands hive directories part=0..P-1 whose key ranges are
# disjoint and ascending — a reader streaming part directories in order
# sees the corpus globally sorted. Output is resumable at part grain
# (each directory is independently re-creatable from its rank range).

N_EXPORT_PARTS = 8


def write_range_partitioned(ds: ray.data.Dataset, out_dir: str, *,
                            key: str, tiebreak: str,
                            n_parts: int = N_EXPORT_PARTS) -> None:
    """Write ``ds`` under ``out_dir`` as part=K hive directories in
    ascending (key, tiebreak) ranges, each part locally sorted."""
    n = ds.count()
    ranked = global_rank(ds, key=key, tiebreak=tiebreak, ascending=True)

    def _part_of(batch: pa.Table) -> pa.Table:
        rk = batch.column("rank").to_numpy(zero_copy_only=False)
        p = (rk - 1) * n_parts // n
        return batch.append_column("part", pa.array(p, pa.int64()))

    def _sort_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group
        return group.sort_by([(key, "ascending"), (tiebreak, "ascending")])

    ranked.map_batches(_part_of, batch_format="pyarrow") \
        .groupby("part").map_groups(_sort_part, batch_format="pyarrow") \
        .drop_columns(["rank"]) \
        .write_parquet(out_dir, partition_cols=["part"])


def docs_range_export(sf_dir: str) -> ray.data.Dataset:
    """Round-trip surface: export documents range-partitioned by
    (n_chars, doc_id), read the hive tree back, and roll up per part —
    count / min / max prove the directory ranges are the exact
    equi-depth ntile split (RANGE_EXPORT_SQL)."""
    import os
    import shutil
    import tempfile

    from ray.data.aggregate import Count, Max, Min

    from nerfray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "n_chars"])
    out = tempfile.mkdtemp(prefix="nerfray_range_export_")
    try:
        write_range_partitioned(ds, out, key="n_chars", tiebreak="doc_id")
        back = ray.data.read_parquet(out)

        def _int_part(batch: pa.Table) -> pa.Table:
            return batch.set_column(
                batch.schema.get_field_index("part"), "part",
                pc.cast(batch.column("part"), pa.int64()))

        return back.map_batches(_int_part, batch_format="pyarrow") \
            .groupby("part").aggregate(
                Count(), Min("n_chars"), Max("n_chars")) \
            .rename_columns({"count()": "n_rows",
                             "min(n_chars)": "min_chars",
                             "max(n_chars)": "max_chars"}) \
            .materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)


ORACLES["docs_range_export"] = f"""
WITH r AS (
  SELECT n_chars,
         row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS rk
  FROM documents
),
nn AS (SELECT count(*)::BIGINT AS n FROM documents)
SELECT (rk * {N_EXPORT_PARTS} // nn.n)::BIGINT AS part,
       count(*)::BIGINT AS n_rows,
       min(n_chars)::BIGINT AS min_chars,
       max(n_chars)::BIGINT AS max_chars
FROM r, nn GROUP BY 1 ORDER BY 1
"""


# -- continuous-key range partitioning (sampled boundaries) -------------------
#
# global_rank's histogram pass needs a bounded distinct-key set; continuous
# keys (prices, scores, timestamps at micro grain) get the classic
# sample-sort treatment instead: a DETERMINISTIC bounded sample (the
# SAMPLE_N lowest-tiebreak rows — per-block local min-k, one merge, never
# the data) yields element-pick boundaries, rows route by searchsorted,
# parts write hive directories exactly like write_range_partitioned.
# Boundaries from a biased-but-deterministic sample are still CORRECT
# range partitions (disjoint, complete — only balance degrades if the
# low-tiebreak rows aren't value-representative), and determinism is what
# makes the whole flow SQL-mirrorable: EVENTS_RANGE_SAMPLED_SQL rebuilds
# the same sample, the same boundaries, the same assignment.

SAMPLE_N = 2048
N_SAMPLED_PARTS = 8


def sampled_boundaries(ds: ray.data.Dataset, *, value: str, tiebreak: str,
                       n_parts: int, sample_n: int = SAMPLE_N
                       ) -> np.ndarray:
    """n_parts-1 ascending element-pick boundaries from the sample of
    the ``sample_n`` lowest-``tiebreak`` rows. ``value`` must be int64."""

    from ._shuffle import lowest_k_rows
    rows = lowest_k_rows(ds.select_columns([value, tiebreak]),
                         sample_n, tiebreak)
    s = np.sort(np.asarray([r[value] for r in rows], dtype=np.int64))
    m = len(s)
    idx = (np.arange(1, n_parts) * m) // n_parts
    return s[idx]


def write_range_partitioned_sampled(
        ds: ray.data.Dataset, out_dir: str, *, value: str, tiebreak: str,
        n_parts: int = N_SAMPLED_PARTS,
        sample_n: int = SAMPLE_N) -> np.ndarray:
    """Continuous-key variant of write_range_partitioned: part of a row
    = count of boundaries <= value (searchsorted right); each part
    locally sorted. Returns the boundaries used."""
    b = sampled_boundaries(ds, value=value, tiebreak=tiebreak,
                           n_parts=n_parts, sample_n=sample_n)
    b_ref = ray.put(b)

    def _part_of(batch: pa.Table) -> pa.Table:
        bounds = ray.get(b_ref)
        v = batch.column(value).to_numpy(zero_copy_only=False)
        p = np.searchsorted(bounds, v, side="right").astype(np.int64)
        return batch.append_column("part", pa.array(p, pa.int64()))

    def _sort_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group
        return group.sort_by([(value, "ascending"),
                              (tiebreak, "ascending")])

    ds.map_batches(_part_of, batch_format="pyarrow") \
        .groupby("part").map_groups(_sort_part, batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["part"])
    return b


def events_range_export_sampled(sf_dir: str) -> ray.data.Dataset:
    """Round-trip surface over the continuous events.value key (as exact
    cents): export, read the hive tree back, roll up per part."""
    import os
    import shutil
    import tempfile

    from ray.data.aggregate import Count, Max, Min

    from nerfray.sources.parquet import read_parquet_clean
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_id", "value"])

    def _cents(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "event_id": batch.column("event_id"),
            "cents": pa.array(np.round(v * 100).astype(np.int64),
                              pa.int64()),
        })

    ds = ev.map_batches(_cents, batch_format="pyarrow",
                        zero_copy_batch=True)
    out = tempfile.mkdtemp(prefix="nerfray_range_sampled_")
    try:
        write_range_partitioned_sampled(ds, out, value="cents",
                                        tiebreak="event_id")
        back = ray.data.read_parquet(out)

        def _int_part(batch: pa.Table) -> pa.Table:
            return batch.set_column(
                batch.schema.get_field_index("part"), "part",
                pc.cast(batch.column("part"), pa.int64()))

        return back.map_batches(_int_part, batch_format="pyarrow") \
            .groupby("part").aggregate(
                Count(), Min("cents"), Max("cents")) \
            .rename_columns({"count()": "n_rows",
                             "min(cents)": "min_cents",
                             "max(cents)": "max_cents"}) \
            .materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)


ORACLES["events_range_export_sampled"] = f"""
WITH c AS (SELECT event_id, round(value * 100)::BIGINT AS cents
           FROM events),
samp AS (SELECT cents FROM c ORDER BY event_id LIMIT {SAMPLE_N}),
m AS (SELECT count(*)::BIGINT AS m FROM samp),
ranked AS (SELECT cents, row_number() OVER (ORDER BY cents) - 1 AS i
           FROM samp),
bounds AS (
  SELECT r.cents AS bv
  FROM ranked r, m
  WHERE r.i IN (SELECT (j * m.m // {N_SAMPLED_PARTS})
                FROM unnest(generate_series(1, {N_SAMPLED_PARTS - 1}))
                     AS t(j))),
assigned AS (
  SELECT c.cents,
         (SELECT count(*) FROM bounds b WHERE b.bv <= c.cents)::BIGINT
           AS part
  FROM c)
SELECT part, count(*)::BIGINT AS n_rows,
       min(cents)::BIGINT AS min_cents, max(cents)::BIGINT AS max_cents
FROM assigned GROUP BY part ORDER BY part
"""


# ---------------------------------------------------------------------------
# ntile bucketing (equal-frequency bucket ASSIGNMENT per row)
# ---------------------------------------------------------------------------
#
# The row-level companion of equi_depth_histogram: every document gets
# its global length decile — the curriculum-bucketing / stratification
# label.  Rides the global-rank machinery (histogram offsets broadcast,
# one key-bucket co-group), then the decile is pure rank arithmetic:
# decile = (rank-1) * k // n + 1.  NOTE: this floor split differs from
# SQL ntile() when n % k != 0 (ntile gives ALL the +1 buckets first;
# the floor split spreads them), so the oracle mirrors the rank
# arithmetic rather than calling ntile.

NTILE_K = 10


def docs_length_ntile(sf_dir: str, *, k: int = NTILE_K
                      ) -> ray.data.Dataset:
    """(doc_id, n_chars, decile) with decile 1..k by ascending
    (n_chars, doc_id) rank."""
    import os

    from nerfray.sources.parquet import read_parquet_clean
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "n_chars"])
    n = docs.count()
    ranked = global_rank(docs, key="n_chars", tiebreak="doc_id",
                         ascending=True)

    def _tile(batch: pa.Table) -> pa.Table:
        rk = batch.column("rank").to_numpy(zero_copy_only=False)
        d = (rk - 1) * k // n + 1
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "n_chars": batch.column("n_chars"),
            "decile": pa.array(d, pa.int64())})

    return ranked.map_batches(_tile, batch_format="pyarrow")


ORACLES["docs_length_ntile"] = f"""
WITH r AS (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS rk
  FROM documents),
nn AS (SELECT count(*)::BIGINT AS n FROM documents)
SELECT doc_id, n_chars, (rk * {NTILE_K} // nn.n + 1)::BIGINT AS decile
FROM r, nn ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# layout-pruned bottom-k (ORDER BY ... LIMIT k without a global sort)
# ---------------------------------------------------------------------------
#
# The payoff query for a range-partitioned layout: the global k
# smallest rows live entirely in the first part directories, so ORDER
# BY ... LIMIT k reads part=0 (then part=1, ... only if k spills past
# it) instead of sorting the table.  Part row counts come from the
# hive directory footers, so the reader knows how many parts it needs
# before opening any data.

def bottomk_via_layout(sf_dir: str, *, k: int = 25) -> ray.data.Dataset:
    """(doc_id, n_chars) of the k globally smallest (n_chars, doc_id)
    docs, read from a range layout with only the needed part dirs."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from nerfray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "n_chars"])
    out = tempfile.mkdtemp(prefix="nerfray_bottomk_")
    try:
        write_range_partitioned(ds, out, key="n_chars",
                                tiebreak="doc_id")
        # footer-only part sizes, ascending part order
        parts = sorted(
            (int(d.split("=")[1]) for d in os.listdir(out)
             if d.startswith("part=")))
        need, paths = 0, []
        for p in parts:
            pdir = os.path.join(out, f"part={p}")
            for f in sorted(os.listdir(pdir)):
                if f.endswith(".parquet"):
                    paths.append(os.path.join(pdir, f))
                    need += pq.read_metadata(
                        os.path.join(pdir, f)).num_rows
            if need >= k:
                break  # later parts hold only larger keys
        t = ray.data.read_parquet(paths,
                                  columns=["doc_id", "n_chars"]) \
            .sort(["n_chars", "doc_id"]).limit(k).materialize()
        return t.select_columns(["doc_id", "n_chars"])
    finally:
        shutil.rmtree(out, ignore_errors=True)


ORACLES["docs_bottomk_layout"] = """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars, doc_id LIMIT 25
"""
