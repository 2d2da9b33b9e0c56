"""Training-data set operations over the ``documents`` table: content-
hash train/val/test splits, deterministic stratified sampling, and
sliding-window document chunking — the set-manipulation layer an LLM
training pipeline runs after curation/dedup.

All three are exact SQL mirrors (content-hash arithmetic / window
arithmetic), so they carry full DuckDB oracles.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# ---------------------------------------------------------------------------
# content-hash train/val/test split
# ---------------------------------------------------------------------------
#
# split bucket = first 8 hex chars of sha256(text) as an int, mod 100.
# Keying on CONTENT (not doc_id) means exact duplicates always land in
# the same split — the train/test-leakage guard a dedup-aware pipeline
# wants (near-dups still need the minhash pass first).

TRAIN_PCT = 80
VAL_PCT = 10


def assign_splits(docs: ray.data.Dataset, *, train_pct: int = TRAIN_PCT,
                  val_pct: int = VAL_PCT) -> ray.data.Dataset:
    def _split(batch: pa.Table) -> pa.Table:
        buckets = np.array(
            [int(hashlib.sha256(t.encode()).hexdigest()[:8], 16) % 100
             for t in batch.column("text").to_pylist()], dtype=np.int64)
        split = np.where(buckets < train_pct, "train",
                         np.where(buckets < train_pct + val_pct,
                                  "val", "test"))
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "split_bucket": pa.array(buckets, pa.int64()),
            "split": pa.array(split.tolist(), pa.string()),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _split, batch_format="pyarrow", zero_copy_batch=True)


SPLITS_SQL = f"""
SELECT doc_id,
       (('0x' || substr(sha256(text), 1, 8))::UBIGINT % 100)::BIGINT
         AS split_bucket,
       CASE WHEN ('0x' || substr(sha256(text), 1, 8))::UBIGINT % 100
                 < {TRAIN_PCT} THEN 'train'
            WHEN ('0x' || substr(sha256(text), 1, 8))::UBIGINT % 100
                 < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# deterministic stratified sample: top-k per stratum by content hash
# ---------------------------------------------------------------------------
#
# "Random but reproducible" sampling: order within each stratum by
# (sha256(text), doc_id) — a deterministic pseudo-random permutation any
# engine reproduces — and keep the first k.  Scale shape: per-BLOCK
# partial top-k combiner (narrow (lang, sha, doc_id) rows), then a tiny
# per-stratum final top-k; document text never shuffles and the final
# group holds at most k * n_blocks rows.


def stratified_sample(docs: ray.data.Dataset, *,
                      k: int = 10) -> ray.data.Dataset:
    def _partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({
            "lang": batch.column("lang").to_pylist(),
            "sha": [hashlib.sha256(t.encode()).hexdigest()
                    for t in batch.column("text").to_pylist()],
            "doc_id": batch.column("doc_id").to_pylist(),
        }).sort_values(["lang", "sha", "doc_id"]).groupby("lang").head(k)
        return pa.Table.from_pydict({
            "lang": pa.array(df["lang"].tolist(), pa.string()),
            "sha": pa.array(df["sha"].tolist(), pa.string()),
            "doc_id": pa.array(df["doc_id"].tolist(), pa.int64()),
        })

    def _final(group: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({
            "lang": group.column("lang").to_pylist(),
            "sha": group.column("sha").to_pylist(),
            "doc_id": group.column("doc_id").to_pylist(),
        }).sort_values(["sha", "doc_id"]).head(k)
        n = len(df)
        return pa.Table.from_pydict({
            "lang": pa.array(df["lang"].tolist(), pa.string()),
            "rk": pa.array(np.arange(1, n + 1), pa.int64()),
            "doc_id": pa.array(df["doc_id"].tolist(), pa.int64()),
        })

    partials = docs.select_columns(["doc_id", "lang", "text"]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
    # strata are few and bounded (languages), so direct keyed grouping is
    # safe here (bounded-group exception to the dispatch-grain rule)
    return partials.groupby("lang").map_groups(_final,
                                               batch_format="pyarrow")


STRATIFIED_SQL = """
WITH ranked AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY sha256(text), doc_id) AS rk
  FROM documents
)
SELECT lang, rk::BIGINT AS rk, doc_id
FROM ranked WHERE rk <= 10 ORDER BY lang, rk
"""


# ---------------------------------------------------------------------------
# sliding-window chunking (LLM context packing precursor)
# ---------------------------------------------------------------------------

CHUNK_SIZE = 64     # words per chunk
CHUNK_OVERLAP = 16  # words shared between consecutive chunks


def chunk_docs(docs: ray.data.Dataset, *, size: int = CHUNK_SIZE,
               overlap: int = CHUNK_OVERLAP) -> ray.data.Dataset:
    """(doc_id, chunk_id, start_word, n_words): fixed-size overlapping
    word windows per doc — vectorized (one repeat/arange per batch)."""
    stride = size - overlap

    def _chunks(batch: pa.Table) -> pa.Table:
        nw = pc.list_value_length(pc.split_pattern(
            batch.column("text"), " ")).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        nc = np.where(nw <= size, 1, (nw - size + stride - 1) // stride + 1)
        doc_rep = np.repeat(ids, nc)
        nw_rep = np.repeat(nw, nc)
        starts_within = np.arange(nc.sum()) - np.repeat(
            np.r_[0, np.cumsum(nc)[:-1]], nc)
        start_word = starts_within * stride
        n_words = np.minimum(size, nw_rep - start_word)
        return pa.Table.from_pydict({
            "doc_id": pa.array(doc_rep, pa.int64()),
            "chunk_id": pa.array(starts_within, pa.int64()),
            "start_word": pa.array(start_word, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _chunks, batch_format="pyarrow", zero_copy_batch=True)


CHUNKS_SQL = f"""
WITH w AS (SELECT doc_id, len(string_split(text, ' ')) AS nw
           FROM documents),
c AS (SELECT doc_id, nw,
             CASE WHEN nw <= {CHUNK_SIZE} THEN 1
                  ELSE (nw - {CHUNK_SIZE} + {CHUNK_SIZE - CHUNK_OVERLAP}
                        - 1) // {CHUNK_SIZE - CHUNK_OVERLAP} + 1
             END AS nc
      FROM w)
SELECT doc_id, k AS chunk_id,
       (k * {CHUNK_SIZE - CHUNK_OVERLAP})::BIGINT AS start_word,
       least({CHUNK_SIZE},
             nw - k * {CHUNK_SIZE - CHUNK_OVERLAP})::BIGINT AS n_words
FROM c, unnest(generate_series(0, nc - 1)) AS t(k)
ORDER BY doc_id, chunk_id
"""
