"""Data-selection importance weighting (DSIR-shaped).

Hashed-n-gram importance resampling (Xie et al., "Data Selection for
Language Models via Importance Resampling", NeurIPS 2023 — public
algorithm, implemented from scratch): score every raw document by how
much more likely its features are under a TARGET domain sample than
under the raw corpus, then keep the highest-weight documents.  Features
are word bigrams hashed into ``N_BUCKETS`` buckets; the two bucket
histograms stand in for the target / raw bag-of-n-grams models.

This implementation keeps the published structure (hashed n-gram
features, target-vs-raw bucket ratios, per-document accumulation) but
pins the weight to INTEGER arithmetic so the DuckDB mirror is
hash-exact (same discipline as ops/text.py's classifier):

    w(b)       = (1_000_000 * (target[b] + 1)) // (raw[b] + 1)
    score(doc) = sum over the doc's bigram OCCURRENCES of w(bucket)

— a monotone surrogate for the per-bucket probability ratio (the +1s
are add-one smoothing).  The target sample here is the first
``N_TARGET`` documents (a production run passes a curated set; the
mechanics are identical).

Scale shape:

* bucket histograms: per-block bincount partials (<= 2 x N_BUCKETS rows
  per block, corpus-size-free) -> one bounded groupby -> the driver
  holds 2 x N_BUCKETS integers, broadcast once via ``ray.put``;
* scoring: one map pass; per-block Python touches DISTINCT bigrams only
  (hashlib per unique bigram, memoized per actor), occurrences are
  scored by a factorize + gather + segmented reduceat — the
  classifier-scorer kernel shape;
* selection (``dsir_selected``): per-block top-k partials into one
  bounded final merge — the corpus never globally sorts.

Reference parity note: the reference (kawu/nerf) has no data-selection
surface; this extends the beyond-reference LLM-pipeline stack.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

N_BUCKETS = 256
N_TARGET = 64      # target sample = doc_id < N_TARGET
SELECT_K = 20


def _bucket_of(bigram: str, n_buckets: int = N_BUCKETS) -> int:
    """sha256-derived bucket — the exact expression the SQL mirrors."""
    return int(hashlib.sha256(bigram.encode()).hexdigest()[:8], 16) \
        % n_buckets


def _doc_bigram_buckets(texts: list[str], n_buckets: int,
                        cache: dict) -> list[np.ndarray]:
    """Per doc: bucket ids of its word-bigram occurrences (hashlib only
    on bigrams not already in ``cache``)."""
    out = []
    for t in texts:
        ws = t.split(" ")
        bgs = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        for g in bgs:
            if g not in cache:
                cache[g] = _bucket_of(g, n_buckets)
        out.append(np.fromiter((cache[g] for g in bgs), np.int64,
                               count=len(bgs)))
    return out


def bucket_histograms(docs: ray.data.Dataset, *,
                      n_buckets: int = N_BUCKETS,
                      n_target: int = N_TARGET) -> tuple[np.ndarray,
                                                         np.ndarray]:
    """(target_counts, raw_counts) — two length-``n_buckets`` int64
    histograms of bigram occurrences; the target sample is a subset of
    raw, exactly as DSIR defines it."""

    class _Partial:
        def __init__(self):
            self.cache: dict = {}

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            per_doc = _doc_bigram_buckets(
                batch.column("text").to_pylist(), n_buckets, self.cache)
            raw = np.zeros(n_buckets, np.int64)
            tgt = np.zeros(n_buckets, np.int64)
            for d, bk in zip(ids, per_doc):
                if len(bk) == 0:
                    continue
                c = np.bincount(bk, minlength=n_buckets)
                raw += c
                if d < n_target:
                    tgt += c
            nz_r = np.flatnonzero(raw)
            nz_t = np.flatnonzero(tgt)
            return pa.Table.from_pydict({
                "bucket": pa.array(np.r_[nz_r, nz_t], pa.int64()),
                "side": pa.array(
                    np.r_[np.zeros(len(nz_r), np.int64),
                          np.ones(len(nz_t), np.int64)], pa.int64()),
                "n": pa.array(np.r_[raw[nz_r], tgt[nz_t]], pa.int64()),
            })

    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        _Partial, concurrency=(1, 8), batch_size=512,
        batch_format="pyarrow").groupby(["bucket", "side"]) \
        .sum("n").take_all()  # <= 2 * n_buckets rows
    tgt = np.zeros(n_buckets, np.int64)
    raw = np.zeros(n_buckets, np.int64)
    for r in rows:
        (tgt if r["side"] else raw)[r["bucket"]] = r["sum(n)"]
    return tgt, raw


def importance_scores(docs: ray.data.Dataset, *,
                      n_buckets: int = N_BUCKETS,
                      n_target: int = N_TARGET) -> ray.data.Dataset:
    """(doc_id, score_micro, n_feats): integer DSIR importance score
    per document (sum of per-occurrence bucket weights) and its bigram
    count."""
    tgt, raw = bucket_histograms(docs, n_buckets=n_buckets,
                                 n_target=n_target)
    w = (1_000_000 * (tgt + 1)) // (raw + 1)
    w_ref = ray.put(w)

    class _Scorer:
        def __init__(self):
            self.w = ray.get(w_ref)
            self.cache: dict = {}

        def __call__(self, batch: pa.Table) -> pa.Table:
            per_doc = _doc_bigram_buckets(
                batch.column("text").to_pylist(), n_buckets, self.cache)
            scores = np.fromiter(
                (int(self.w[bk].sum()) for bk in per_doc), np.int64,
                count=len(per_doc))
            feats = np.fromiter((len(bk) for bk in per_doc), np.int64,
                                count=len(per_doc))
            return pa.Table.from_pydict({
                "doc_id": batch.column("doc_id"),
                "score_micro": pa.array(scores, pa.int64()),
                "n_feats": pa.array(feats, pa.int64()),
            })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _Scorer, concurrency=(1, 8), batch_size=512,
        batch_format="pyarrow")


def dsir_selected(docs: ray.data.Dataset, *,
                  n_buckets: int = N_BUCKETS,
                  n_target: int = N_TARGET,
                  k: int = SELECT_K) -> ray.data.Dataset:
    """(rank, doc_id, avg_micro): the ``k`` documents with the highest
    per-feature average importance (score_micro // n_feats; docs with
    no bigrams are excluded) — the resampling step's deterministic
    top-k variant.  Per-block top-k partials, one bounded merge."""
    scores = importance_scores(docs, n_buckets=n_buckets,
                               n_target=n_target)

    def _partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sc = batch.column("score_micro").to_numpy(zero_copy_only=False)
        nf = batch.column("n_feats").to_numpy(zero_copy_only=False)
        keep = nf > 0
        ids, sc, nf = ids[keep], sc[keep], nf[keep]
        avg = sc // np.maximum(nf, 1)
        top = np.lexsort((ids, -avg))[:k]
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids[top], pa.int64()),
            "avg_micro": pa.array(avg[top], pa.int64()),
            "g": pa.array(np.zeros(len(top), np.int32), pa.int32()),
        })

    def _final(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        avg = group.column("avg_micro").to_numpy(zero_copy_only=False)
        top = np.lexsort((ids, -avg))[:k]
        return pa.Table.from_pydict({
            "rank": pa.array(np.arange(1, len(top) + 1), pa.int64()),
            "doc_id": pa.array(ids[top], pa.int64()),
            "avg_micro": pa.array(avg[top], pa.int64()),
        })

    return scores.map_batches(_partial, batch_format="pyarrow") \
        .groupby("g").map_groups(_final, batch_format="pyarrow")


def _bucket_sql(expr: str, n_buckets: int) -> str:
    return (f"(('0x' || substr(sha256({expr}), 1, 8))::UBIGINT"
            f" % {n_buckets})::BIGINT")


def importance_sql(n_buckets: int = N_BUCKETS,
                   n_target: int = N_TARGET) -> str:
    """DuckDB mirror of importance_scores (identical integer
    arithmetic)."""
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
              FROM documents),
big AS (
  SELECT doc_id,
         unnest(list_transform(range(len(t) - 1),
                               i -> t[i + 1] || ' ' || t[i + 2])) AS bg
  FROM toks
),
b AS (SELECT doc_id, {_bucket_sql('bg', n_buckets)} AS bk FROM big),
r AS (SELECT bk, count(*)::BIGINT AS rc FROM b GROUP BY bk),
tg AS (SELECT bk, count(*)::BIGINT AS tc FROM b
       WHERE doc_id < {n_target} GROUP BY bk),
w AS (SELECT r.bk,
             (1000000 * (coalesce(tg.tc, 0) + 1)) // (r.rc + 1) AS w
      FROM r LEFT JOIN tg USING (bk)),
s AS (SELECT b.doc_id, sum(w.w)::BIGINT AS score_micro,
             count(*)::BIGINT AS n_feats
      FROM b JOIN w USING (bk) GROUP BY b.doc_id)
SELECT d.doc_id, coalesce(s.score_micro, 0)::BIGINT AS score_micro,
       coalesce(s.n_feats, 0)::BIGINT AS n_feats
FROM documents d LEFT JOIN s USING (doc_id)
ORDER BY d.doc_id
"""


def dsir_selected_sql(n_buckets: int = N_BUCKETS,
                      n_target: int = N_TARGET,
                      k: int = SELECT_K) -> str:
    return f"""
WITH s AS ({importance_sql(n_buckets, n_target)}),
r AS (SELECT doc_id, score_micro // n_feats AS avg_micro,
             row_number() OVER (
               ORDER BY score_micro // n_feats DESC, doc_id) AS rank
      FROM s WHERE n_feats > 0)
SELECT rank::BIGINT AS rank, doc_id, avg_micro
FROM r WHERE rank <= {k} ORDER BY rank
"""
