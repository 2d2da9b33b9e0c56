"""Distributed global ranking: dense ``row_number() OVER (ORDER BY key
DESC, tiebreak ASC)`` over a Dataset without a global sort OR any
row-proportional driver state.

Two-phase shape (the classic range-partitioned rank):
  1. histogram — ``groupby(key).count()``: one tiny shuffle whose
     output is the key's DISTINCT-value histogram. The driver folds it
     into a cumulative-offset table (rows = distinct key values — for
     bounded keys like document lengths, scores, or dates this is a
     histogram, not the data; for unbounded continuous keys, range-
     partition on sampled quantiles first so the table stays bounded).
  2. intra-key rank — rows shuffle ONCE by a 64-way hash of the key
     (dispatch-grain rule: one Python call per bucket, each bucket
     vectorized), every key's rows rank locally by the tiebreak, and
     the broadcast offset table lifts local ranks to global ones.

Equal keys never split across buckets (the bucket is a function of the
key), so local rank + global offset is exact for ANY block structure.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

N_RANK_BUCKETS = 64


def global_rank(ds: ray.data.Dataset, *, key: str, tiebreak: str,
                out_col: str = "rank") -> ray.data.Dataset:
    """Append ``out_col`` = global 1-based row number in
    (key DESC, tiebreak ASC) order. ``key`` and ``tiebreak`` must be
    integer columns; ties on (key, tiebreak) must not exist."""
    hist = ds.groupby(key).count().take_all()
    vals = np.array(sorted((r[key] for r in hist), reverse=True),
                    dtype=np.int64)
    counts = {r[key]: r["count()"] for r in hist}
    offsets = np.concatenate(
        [[0], np.cumsum([counts[v] for v in vals])[:-1]]).astype(np.int64)
    # ascending copy for np.searchsorted (descending offsets ride along)
    asc_vals = vals[::-1].copy()
    asc_offsets = offsets[::-1].copy()
    table_ref = ray.put((asc_vals, asc_offsets))

    def _bucket(batch: pa.Table) -> pa.Table:
        hb = pc.cast(pc.bit_wise_and(batch.column(key),
                                     N_RANK_BUCKETS - 1), pa.int32())
        return batch.append_column("hb", hb)

    def _rank_bucket(group: pa.Table) -> pa.Table:
        out_schema = pa.schema(list(group.select([c for c in
                                                  group.column_names
                                                  if c != "hb"]).schema)
                               + [pa.field(out_col, pa.int64())])
        if group.num_rows == 0:
            return out_schema.empty_table()
        avals, aoffs = ray.get(table_ref)
        k = group.column(key).to_numpy(zero_copy_only=False)
        tb = group.column(tiebreak).to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, -k))
        ks = k[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        seg_len = np.diff(np.r_[starts, len(ks)])
        local = np.arange(len(ks), dtype=np.int64) - np.repeat(
            starts, seg_len)
        seg_off = aoffs[np.searchsorted(avals, ks[starts])]
        rank = local + np.repeat(seg_off, seg_len) + 1
        out = group.drop_columns(["hb"]).take(pa.array(order, pa.int64()))
        return out.append_column(out_col, pa.array(rank, pa.int64()))

    return ds.map_batches(_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_rank_bucket, batch_format="pyarrow")


def docs_global_rank(sf_dir: str) -> ray.data.Dataset:
    """Every document's global rank by (n_chars DESC, doc_id ASC) — the
    'order the whole corpus by quality' primitive (full-corpus curation
    cutoffs, curriculum ordering) expressed without a global sort."""
    import os

    from nerfray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "n_chars"])
    return global_rank(ds, key="n_chars", tiebreak="doc_id")


ORACLES = {
    "docs_global_rank": """
SELECT doc_id, n_chars,
       row_number() OVER (ORDER BY n_chars DESC, doc_id)::BIGINT AS rank
FROM documents ORDER BY doc_id
""",
}
