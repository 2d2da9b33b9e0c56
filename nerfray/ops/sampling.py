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


# ---------------------------------------------------------------------------
# data-mixture (temperature) sampling across sources
# ---------------------------------------------------------------------------
#
# The source-rebalancing step of an LLM data pipeline (The Pile / Llama
# style): undersample large sources so every source contributes ~the
# word mass of the smallest one (inverse-proportional mixing).  Exact
# integer arithmetic end-to-end so MIXTURE_SQL hash-matches:
#   rate_permille(source) = clamp((min_words * 1000) // source_words,
#                                 1, 1000)
#   keep doc  <=>  (doc_id * 2654435761) % 1000 < rate_permille
# Scale shape: pass 1 is a per-block partial sum + tiny groupby(source)
# (sources/domains are bounded — hundreds, not billions); the rate dict
# is broadcast once via ray.put and resolved per map task; pass 2
# streams and the text column never shuffles.

_MIX_KNUTH = 2654435761


def _source_word_partial(batch: pa.Table) -> pa.Table:
    words = pc.list_value_length(pc.split_pattern(batch.column("text"), " "))
    t = pa.Table.from_pydict({
        "source": batch.column("source"),
        "w": pc.cast(words, pa.int64()),
    })
    return t.group_by("source").aggregate([("w", "sum")]) \
        .rename_columns(["source", "w"])


def source_rates_permille(docs: ray.data.Dataset) -> dict[str, int]:
    """rate permille per source (driver holds one int per source)."""
    totals = docs.select_columns(["source", "text"]) \
        .map_batches(_source_word_partial, batch_format="pyarrow") \
        .groupby("source").sum("w").take_all()
    w = {r["source"]: r["sum(w)"] for r in totals}
    mn = min(w.values())
    return {s: min(1000, max(1, (mn * 1000) // v)) for s, v in w.items()}


def mixture_sample(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Deterministic inverse-proportional mixture sample."""
    import ray as _ray
    rates_ref = _ray.put(source_rates_permille(docs))

    def _keep(batch: pa.Table) -> pa.Table:
        rates = _ray.get(rates_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        src = batch.column("source").to_pylist()
        rate = np.array([rates[s] for s in src], dtype=np.int64)
        keep = (ids * _MIX_KNUTH) % 1000 < rate
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id").filter(pa.array(keep)),
            "source": batch.column("source").filter(pa.array(keep)),
            "rate_permille": pa.array(rate[keep], pa.int64()),
        })

    return docs.select_columns(["doc_id", "source"]).map_batches(
        _keep, batch_format="pyarrow", zero_copy_batch=True)


MIXTURE_SQL = f"""
WITH s AS (
  SELECT source, sum(len(string_split(text, ' ')))::BIGINT AS w
  FROM documents GROUP BY source
),
r AS (
  SELECT source, w,
         least(1000, greatest(1, ((SELECT min(w) FROM s) * 1000) // w))
           ::BIGINT AS rate_permille
  FROM s
)
SELECT d.doc_id, d.source, r.rate_permille
FROM documents d JOIN r USING (source)
WHERE (d.doc_id * {_MIX_KNUTH}) % 1000 < r.rate_permille
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk) per source
# ---------------------------------------------------------------------------
#
# The training-example packing step: documents of a source are laid out
# end-to-end in doc_id order and cut every PACK_SIZE words, so each doc
# gets (pack_id, pack_offset) = divmod(exclusive-prefix-sum, PACK_SIZE).
# Pure window arithmetic -> PACKED_SQL mirrors it bit-for-bit.  Scale
# shape follows the repo's window-scan rule: ONE key-bucket shuffle of
# narrow (doc_id, source, n_words) rows (hash(source) % 64 buckets),
# then a vectorized segmented cumsum per bucket; text never moves.
# Partitioning assumption: one source's rows fit a group — a hot source
# is handled by pack_sequences_split below (range split by doc_id with
# base-offset stitching, same answer, bounded groups).

PACK_SIZE = 256


def _pack_prep(batch: pa.Table) -> pa.Table:
    import pandas as pd
    words = pc.list_value_length(pc.split_pattern(batch.column("text"), " "))
    src = batch.column("source").to_pylist()
    hb = (pd.util.hash_array(np.array(src, dtype=object)) % 64).astype(np.int64)
    return pa.Table.from_pydict({
        "doc_id": batch.column("doc_id"),
        "source": batch.column("source"),
        "n_words": pc.cast(words, pa.int64()),
        "hb": pa.array(hb, pa.int64()),
    })


_PACK_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("source", pa.string()),
    ("n_words", pa.int64()), ("pack_id", pa.int64()),
    ("pack_offset", pa.int64())])


def _pack_bucket(group: pa.Table) -> pa.Table:
    if group.num_rows == 0:
        return _PACK_SCHEMA.empty_table()
    import pandas as pd
    ids = group.column("doc_id").to_numpy(zero_copy_only=False)
    nw = group.column("n_words").to_numpy(zero_copy_only=False)
    src = np.empty(len(ids), object)
    src[:] = group.column("source").to_pylist()
    codes = pd.factorize(src)[0]
    order = np.lexsort((ids, codes))
    c, n = codes[order], nw[order]
    incl = np.cumsum(n)
    starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
    # exclusive prefix sum, reset at each source segment
    seg_base = np.repeat(np.r_[0, incl[starts[1:] - 1]], np.diff(
        np.r_[starts, len(c)]))
    off = incl - n - seg_base
    return pa.Table.from_pydict({
        "doc_id": pa.array(ids[order], pa.int64()),
        "source": pa.array(src[order], pa.string()),
        "n_words": pa.array(n, pa.int64()),
        "pack_id": pa.array(off // PACK_SIZE, pa.int64()),
        "pack_offset": pa.array(off % PACK_SIZE, pa.int64()),
    })


def pack_sequences(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(source, pack_id, pack_offset) layout for concat-and-chunk
    training examples."""
    return docs.select_columns(["doc_id", "source", "text"]) \
        .map_batches(_pack_prep, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("hb").map_groups(_pack_bucket, batch_format="pyarrow") \
        .select_columns(["doc_id", "source", "n_words", "pack_id",
                         "pack_offset"])


PACKED_SQL = f"""
WITH n AS (
  SELECT doc_id, source, len(string_split(text, ' '))::BIGINT AS n_words
  FROM documents
),
c AS (
  SELECT doc_id, source, n_words,
         coalesce(sum(n_words) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS off
  FROM n
)
SELECT doc_id, source, n_words,
       (off // {PACK_SIZE})::BIGINT AS pack_id,
       (off % {PACK_SIZE})::BIGINT AS pack_offset
FROM c ORDER BY doc_id
"""


# -- hot-source-safe packing: (source, doc_id range) split + base stitch -----
#
# pack_sequences co-locates a source's ENTIRE row set in one group; a hot
# source (half the corpus from one crawl) outgrows a worker. The split
# path is the repo's standard range-split + stitch (cf. ops/events.py
# asof/sessionize split): pass A keys by (source, doc_id // range_docs)
# and computes LOCAL exclusive offsets per range, emitting one doc-grain
# row per doc plus ONE summary row per (source, range) with its word
# total; pass B (range grain, tiny) turns the totals into per-range BASE
# offsets via an exclusive cumsum in range order; pass C re-co-groups the
# doc rows with their base row and shifts: off = base + local. Identical
# output to pack_sequences (same PACKED_SQL oracle); per-group size is
# bounded by range_docs narrow rows regardless of source skew.

PACK_RANGE_DOCS = 100_000

_PACKSPLIT_SCHEMA = pa.schema([
    ("kind", pa.string()), ("source", pa.string()), ("rng", pa.int64()),
    ("doc_id", pa.int64()), ("n_words", pa.int64()), ("loc", pa.int64())])


def _src_rng_bucket(batch: pa.Table) -> pa.Table:
    import pandas as pd
    src = np.asarray(batch.column("source").to_pylist(), dtype=object)
    h = pd.util.hash_array(src).astype(np.int64)
    rng = batch.column("rng").to_numpy(zero_copy_only=False)
    hb = ((h * 8191 + rng) % 64).astype(np.int32)
    return batch.append_column("hb", pa.array(hb, pa.int32()))


def _src_bucket(batch: pa.Table) -> pa.Table:
    import pandas as pd
    src = np.asarray(batch.column("source").to_pylist(), dtype=object)
    hb = (pd.util.hash_array(src) % 64).astype(np.int32)
    return batch.append_column("hb", pa.array(hb, pa.int32()))


def pack_sequences_split(docs: ray.data.Dataset,
                         *, range_docs: int = PACK_RANGE_DOCS
                         ) -> ray.data.Dataset:
    """Hot-source-safe pack_sequences: same rows, same oracle."""

    def _prep(batch: pa.Table) -> pa.Table:
        words = pc.list_value_length(
            pc.split_pattern(batch.column("text"), " "))
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(ids)
        return pa.Table.from_pydict({
            "kind": pa.array(["d"] * n, pa.string()),
            "source": batch.column("source"),
            "rng": pa.array(ids // range_docs, pa.int64()),
            "doc_id": batch.column("doc_id"),
            "n_words": pc.cast(words, pa.int64()),
            "loc": pa.array(np.zeros(n, np.int64), pa.int64()),
        }, schema=_PACKSPLIT_SCHEMA)

    def _local_offsets(group: pa.Table) -> pa.Table:
        """Per (source, rng) in one bucket: local exclusive cumsum into
        'loc' + one 't' summary row per segment with the segment total."""
        if group.num_rows == 0:
            return _PACKSPLIT_SCHEMA.empty_table()
        import pandas as pd
        src = np.empty(group.num_rows, object)
        src[:] = group.column("source").to_pylist()
        rng = group.column("rng").to_numpy(zero_copy_only=False)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        nw = group.column("n_words").to_numpy(zero_copy_only=False)
        codes = pd.factorize(src)[0]
        order = np.lexsort((ids, rng, codes))
        c, g, n = codes[order], rng[order], nw[order]
        seg_change = np.r_[True, (c[1:] != c[:-1]) | (g[1:] != g[:-1])]
        starts = np.flatnonzero(seg_change)
        incl = np.cumsum(n)
        seg_base = np.repeat(np.r_[0, incl[starts[1:] - 1]],
                             np.diff(np.r_[starts, len(c)]))
        loc = incl - n - seg_base
        totals = np.add.reduceat(n, starts)
        doc_rows = pa.Table.from_pydict({
            "kind": pa.array(["d"] * len(c), pa.string()),
            "source": pa.array(src[order], pa.string()),
            "rng": pa.array(g, pa.int64()),
            "doc_id": pa.array(ids[order], pa.int64()),
            "n_words": pa.array(n, pa.int64()),
            "loc": pa.array(loc, pa.int64()),
        }, schema=_PACKSPLIT_SCHEMA)
        sum_rows = pa.Table.from_pydict({
            "kind": pa.array(["t"] * len(starts), pa.string()),
            "source": pa.array(src[order][starts], pa.string()),
            "rng": pa.array(g[starts], pa.int64()),
            "doc_id": pa.array(np.full(len(starts), -1), pa.int64()),
            "n_words": pa.array(totals, pa.int64()),
            "loc": pa.array(np.zeros(len(starts), np.int64), pa.int64()),
        }, schema=_PACKSPLIT_SCHEMA)
        return pa.concat_tables([doc_rows, sum_rows])

    def _bases(group: pa.Table) -> pa.Table:
        """Range grain, per source: exclusive cumsum of range totals in
        rng order -> 'c' base rows."""
        if group.num_rows == 0:
            return _PACKSPLIT_SCHEMA.empty_table()
        import pandas as pd
        src = np.empty(group.num_rows, object)
        src[:] = group.column("source").to_pylist()
        rng = group.column("rng").to_numpy(zero_copy_only=False)
        tot = group.column("n_words").to_numpy(zero_copy_only=False)
        codes = pd.factorize(src)[0]
        order = np.lexsort((rng, codes))
        c, g, t = codes[order], rng[order], tot[order]
        seg_change = np.r_[True, c[1:] != c[:-1]]
        starts = np.flatnonzero(seg_change)
        incl = np.cumsum(t)
        seg_base = np.repeat(np.r_[0, incl[starts[1:] - 1]],
                             np.diff(np.r_[starts, len(c)]))
        base = incl - t - seg_base
        return pa.Table.from_pydict({
            "kind": pa.array(["c"] * len(c), pa.string()),
            "source": pa.array(src[order], pa.string()),
            "rng": pa.array(g, pa.int64()),
            "doc_id": pa.array(np.full(len(c), -1), pa.int64()),
            "n_words": pa.array(np.zeros(len(c), np.int64), pa.int64()),
            "loc": pa.array(base, pa.int64()),
        }, schema=_PACKSPLIT_SCHEMA)

    def _stitch(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _PACK_SCHEMA.empty_table()
        import pandas as pd
        kind = np.asarray(group.column("kind").to_pylist(), dtype=object)
        src = np.empty(group.num_rows, object)
        src[:] = group.column("source").to_pylist()
        rng = group.column("rng").to_numpy(zero_copy_only=False)
        loc = group.column("loc").to_numpy(zero_copy_only=False)
        codes = pd.factorize(src)[0]
        seg = codes.astype(np.int64) * (np.int64(1) << 32) + rng
        is_c = kind == "c"
        cseg = seg[is_c]
        corder = np.argsort(cseg, kind="stable")
        cseg_s, cbase_s = cseg[corder], loc[is_c][corder]
        d = ~is_c
        pos = np.searchsorted(cseg_s, seg[d])
        # every doc segment has exactly one base row (emitted by pass A)
        base = cbase_s[pos]
        off = base + loc[d]
        return pa.Table.from_pydict({
            "doc_id": pa.array(group.column("doc_id").to_numpy(
                zero_copy_only=False)[d], pa.int64()),
            "source": pa.array(src[d], pa.string()),
            "n_words": pa.array(group.column("n_words").to_numpy(
                zero_copy_only=False)[d], pa.int64()),
            "pack_id": pa.array(off // PACK_SIZE, pa.int64()),
            "pack_offset": pa.array(off % PACK_SIZE, pa.int64()),
        }, schema=_PACK_SCHEMA)

    a = docs.select_columns(["doc_id", "source", "text"]) \
        .map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(_src_rng_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_local_offsets, batch_format="pyarrow") \
        .materialize()
    bases = a.filter(expr="kind == 't'") \
        .map_batches(_src_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_bases, batch_format="pyarrow")
    return a.filter(expr="kind == 'd'").union(bases) \
        .map_batches(_src_rng_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_stitch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# hash-order uniform sampling (distributed reservoir equivalent)
# ---------------------------------------------------------------------------

HASH_SAMPLE_K = 50


def hash_sample_topk(docs: ray.data.Dataset, *,
                     k: int = HASH_SAMPLE_K) -> ray.data.Dataset:
    """(rank, doc_id): the k docs with the smallest splitmix64(doc_id)
    — a uniform sample WITHOUT replacement, deterministic and
    re-runnable (the distributed equivalent of reservoir sampling:
    hash order is a random permutation, and bottom-k by hash commutes
    with partitioning).  Per-block bottom-k partials -> one bounded
    final merge; nothing corpus-proportional shuffles or reaches the
    driver.  Mirrored by HASH_SAMPLE_SQL (the UHUGEINT splitmix chain).
    """
    from nerfray.ops.dedup import splitmix64

    def _local(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = splitmix64(ids.astype(np.uint64))
        order = np.argsort(h, kind="stable")[:k]
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids[order], pa.int64()),
            # int64-shifted key: uint64 order is preserved under >> 1
            # (ties impossible below: splitmix64 is a bijection, and
            # two distinct full hashes that share h >> 1 order by
            # doc_id, which the final lexsort uses as tiebreak)
            "hk": pa.array((h[order] >> np.uint64(1)).astype(np.int64),
                           pa.int64()),
            "g": pa.array(np.zeros(len(order), np.int32), pa.int32()),
        })

    def _final(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        hk = group.column("hk").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, hk))[:k]
        return pa.Table.from_pydict({
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "doc_id": pa.array(ids[order], pa.int64()),
        })

    return docs.select_columns(["doc_id"]) \
        .map_batches(_local, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("g").map_groups(_final, batch_format="pyarrow")


HASH_SAMPLE_SQL = """
WITH z1 AS (SELECT doc_id,
              ((doc_id::UBIGINT::UHUGEINT + 11400714819323198485)
               % 18446744073709551616)::UBIGINT AS z FROM documents),
z2 AS (SELECT doc_id,
              ((xor(z, z >> 30)::UHUGEINT * 13787848793156543929)
               % 18446744073709551616)::UBIGINT AS z FROM z1),
z3 AS (SELECT doc_id,
              ((xor(z, z >> 27)::UHUGEINT * 10723151780598845931)
               % 18446744073709551616)::UBIGINT AS z FROM z2),
h AS (SELECT doc_id, xor(z, z >> 31) AS h FROM z3),
r AS (SELECT doc_id,
             row_number() OVER (ORDER BY h >> 1, doc_id) AS rank
      FROM h)
SELECT rank::BIGINT AS rank, doc_id FROM r WHERE rank <= 50
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# weighted hash sampling: inclusion probability proportional to a
# per-row weight, deterministic and re-runnable
# ---------------------------------------------------------------------------
#
# keep(doc) iff splitmix64(doc_id) % 1000 < weight_permille(doc), with
# weight_permille = least(n_chars, cap) - longer documents are
# proportionally more likely to survive (importance sampling by a
# quality/length weight).  Pure per-row integer arithmetic: no shuffle,
# no driver state, and the identical UHUGEINT splitmix chain replays in
# SQL, so the sample is hash-exact and stable under any partitioning.

WEIGHTED_CAP = 900  # permille ceiling: no row is kept with certainty


def weighted_sample(docs: ray.data.Dataset, *,
                    cap: int = WEIGHTED_CAP) -> ray.data.Dataset:
    from nerfray.ops.dedup import splitmix64

    def _keep(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        w = np.minimum(batch.column("n_chars")
                       .to_numpy(zero_copy_only=False), cap)
        h = splitmix64(ids.astype(np.uint64)) % np.uint64(1000)
        mask = h.astype(np.int64) < w
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids[mask], pa.int64()),
            "weight_permille": pa.array(w[mask].astype(np.int64),
                                        pa.int64()),
        })

    return docs.select_columns(["doc_id", "n_chars"]).map_batches(
        _keep, batch_format="pyarrow", zero_copy_batch=True)


WEIGHTED_SAMPLE_SQL = f"""
WITH z1 AS (SELECT doc_id, least(n_chars, {WEIGHTED_CAP}) AS w,
              ((doc_id::UBIGINT::UHUGEINT + 11400714819323198485)
               % 18446744073709551616)::UBIGINT AS z FROM documents),
z2 AS (SELECT doc_id, w,
              ((xor(z, z >> 30)::UHUGEINT * 13787848793156543929)
               % 18446744073709551616)::UBIGINT AS z FROM z1),
z3 AS (SELECT doc_id, w,
              ((xor(z, z >> 27)::UHUGEINT * 10723151780598845931)
               % 18446744073709551616)::UBIGINT AS z FROM z2),
h AS (SELECT doc_id, w, xor(z, z >> 31) AS h FROM z3)
SELECT doc_id, w::BIGINT AS weight_permille
FROM h WHERE (h % 1000)::BIGINT < w ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# domain-balancing cap: at most k docs PER SOURCE, chosen by hash order
# ---------------------------------------------------------------------------
#
# The CCNet/FineWeb-style guard against one domain dominating a
# training mix: keep the k docs with the smallest splitmix64(doc_id)
# within each source.  Hash order is a random-but-deterministic
# permutation, so the cap is an unbiased uniform subsample per domain,
# stable under any partitioning and re-runnable.  Shape: block-local
# bottom-k per source (a lossless partial — the global per-source
# bottom-k is a subset of the union of block bottom-ks), then one
# source-keyed co-group over <= k x blocks x sources rows.  Nothing
# corpus-proportional shuffles.

DOMAIN_CAP_K = 10


def domain_cap(docs: ray.data.Dataset, *,
               k: int = DOMAIN_CAP_K) -> ray.data.Dataset:
    from nerfray.ops.dedup import splitmix64

    def _bottomk(ids, src, hk):
        # per-source bottom-k over (hk, doc_id) order, vectorized:
        # sort by (source, hk, doc_id), keep first k of each run
        order = np.lexsort((ids, hk, src))
        s = src[order]
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        pos = np.arange(len(s)) - np.repeat(
            starts, np.diff(np.r_[starts, len(s)]))
        keep = order[pos < k]
        return ids[keep], src[keep], hk[keep]

    def _local(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        src = batch.column("source").to_numpy(zero_copy_only=False)
        h = splitmix64(ids.astype(np.uint64))
        ids, src, hk = _bottomk(ids, src,
                                (h >> np.uint64(1)).astype(np.int64))
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "source": pa.array(src, pa.string()),
            "hk": pa.array(hk, pa.int64()),
        })

    def _final(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        src = group.column("source").to_numpy(zero_copy_only=False)
        hk = group.column("hk").to_numpy(zero_copy_only=False)
        ids, src, _ = _bottomk(ids, src, hk)
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "source": pa.array(src, pa.string()),
        }, schema=pa.schema([("doc_id", pa.int64()),
                             ("source", pa.string())]))

    return docs.select_columns(["doc_id", "source"]) \
        .map_batches(_local, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("source").map_groups(_final, batch_format="pyarrow")


DOMAIN_CAP_SQL = f"""
WITH z1 AS (SELECT doc_id, source,
              ((doc_id::UBIGINT::UHUGEINT + 11400714819323198485)
               % 18446744073709551616)::UBIGINT AS z FROM documents),
z2 AS (SELECT doc_id, source,
              ((xor(z, z >> 30)::UHUGEINT * 13787848793156543929)
               % 18446744073709551616)::UBIGINT AS z FROM z1),
z3 AS (SELECT doc_id, source,
              ((xor(z, z >> 27)::UHUGEINT * 10723151780598845931)
               % 18446744073709551616)::UBIGINT AS z FROM z2),
h AS (SELECT doc_id, source, xor(z, z >> 31) AS h FROM z3),
r AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY h >> 1, doc_id) AS rank
      FROM h)
SELECT doc_id, source FROM r WHERE rank <= {DOMAIN_CAP_K}
ORDER BY doc_id
"""
