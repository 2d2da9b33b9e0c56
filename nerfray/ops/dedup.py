"""Deduplication operators over the ``documents`` table.

- exact: sha256 hash-partition + per-group min (first) — the canonical
  exact-dedup shuffle (one groupby over a 32-byte key; the wide text
  column never shuffles).
- MinHash + LSH: shingle -> K minhashes -> B bands; band-bucket groupby
  finds candidate pairs; exact Jaccard verification inside map_groups.
- SimHash: 64-bit token-hash majority signature per doc; near-dups =
  identical signature buckets (hamming-0 at this corpus scale; banded
  rotation would extend to hamming-k).
- n-gram Jaccard vs a broadcast query set (exact, SQL-oracled).

All hash functions are blake2b-seeded and deterministic across processes
(PYTHONHASHSEED-independent), so results are stable under any
parallelism (SURVEY.md §7.4.1).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# ---------------------------------------------------------------------------
# deterministic hashing helpers
# ---------------------------------------------------------------------------


def h64(s: str, seed: int = 0) -> int:
    """Stable 64-bit hash (process-independent, unlike builtin hash)."""
    d = hashlib.blake2b(s.encode(), digest_size=8,
                        salt=seed.to_bytes(8, "little")).digest()
    return int.from_bytes(d, "little")


def sha64(s: str) -> int:
    """uint64 = first 8 bytes (big-endian) of sha256 — slower than h64
    but ORACLE-COMPUTABLE: DuckDB's sha256() yields the same value as a
    16-hex-char prefix, which is how the winnowing and simhash mirrors
    restate equality/bit tests in SQL."""
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


_POLY_BASE = np.uint64(1099511628211)  # FNV prime; uint64 wraparound hash


def shingles(text: str, k: int = 8) -> set[int]:
    """Hashed char k-gram shingle set — one vectorized polynomial hash
    over the utf-8 bytes (deterministic uint64 wraparound), no Python
    loop over positions."""
    data = text.encode()
    if len(data) < k:
        return {h64(text)} if text else set()
    c = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    powers = _POLY_BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    windows = np.lib.stride_tricks.sliding_window_view(c, k)
    hs = (windows * powers[None, :]).sum(axis=1, dtype=np.uint64)
    return set(np.unique(hs).tolist())


def word_set(text: str) -> set[str]:
    return set(text.split(" "))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _sha_batch(batch: pa.Table) -> pa.Table:
    shas = [hashlib.sha256(t.encode()).hexdigest()
            for t in batch.column("text").to_pylist()]
    return pa.Table.from_pydict({
        "text_sha": pa.array(shas, pa.string()),
        "doc_id": batch.column("doc_id"),
    })


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(text_sha, doc_id=min over the hash group): the survivor per
    duplicate class. Only (sha, id) pairs ever shuffle."""
    return docs.map_batches(_sha_batch, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("text_sha").min("doc_id") \
        .rename_columns({"min(doc_id)": "doc_id"})


# ---------------------------------------------------------------------------
# incremental (ingest-batch) dedup
# ---------------------------------------------------------------------------


def incremental_exact_dedup(new_docs: ray.data.Dataset,
                            corpus: ray.data.Dataset) -> ray.data.Dataset:
    """Continuous-ingest dedup: the surviving rows of a NEW batch
    against an EXISTING corpus — drop every new row whose sha already
    exists in the corpus (big-big anti join on the sha; only (sha, id)
    pairs shuffle, text never leaves its block), then in-batch dedup
    keeps the min doc_id per remaining sha.  Output (text_sha, doc_id).

    At 100 TB the corpus side is the already-deduped sha catalog (one
    64-char row per unique doc), re-read per ingest batch — never the
    corpus text."""
    from .joins import hash_join
    new_sha = new_docs.map_batches(_sha_batch, batch_format="pyarrow",
                                   zero_copy_batch=True)
    corpus_sha = corpus.map_batches(_sha_batch, batch_format="pyarrow",
                                    zero_copy_batch=True)
    fresh = hash_join(new_sha, corpus_sha, left_on="text_sha",
                      right_on="text_sha", left_cols=["doc_id"],
                      right_cols=[], how="left anti")
    return fresh.groupby("__key").min("doc_id") \
        .rename_columns({"__key": "text_sha", "min(doc_id)": "doc_id"})


def planted_new_batch(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Deterministic ingest batch derived from the corpus: every 5th
    doc is a VERBATIM copy (must be dropped by the corpus anti join),
    the rest get a ' v2' suffix (fresh content — survives, modulo
    in-batch duplicate classes inherited from duplicate originals)."""
    import pyarrow.compute as pc

    def _mk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        is_copy = pc.equal(
            pc.subtract(ids, pc.multiply(pc.divide(ids, 5), 5)), 0)
        text = batch.column("text")
        v2 = pc.binary_join_element_wise(text, "v2", " ")
        return pa.Table.from_pydict({
            "doc_id": pc.add(pc.cast(ids, pa.int64()), 1_000_000),
            "text": pc.if_else(is_copy, text, v2),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _mk, batch_format="pyarrow", zero_copy_batch=True)


INCREMENTAL_SQL = """
WITH newb AS (
  SELECT doc_id + 1000000 AS doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text ELSE text || ' v2' END AS text
  FROM documents
),
nh AS (SELECT doc_id, sha256(text) AS h FROM newb),
ch AS (SELECT DISTINCT sha256(text) AS h FROM documents)
SELECT sha256(n.text) AS text_sha, min(n.doc_id)::BIGINT AS doc_id
FROM newb n
WHERE NOT EXISTS (SELECT 1 FROM ch WHERE ch.h = sha256(n.text))
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup
# ---------------------------------------------------------------------------

class MinHasher:
    """K xor-mask minhashes over the shingle set (actor-pool stage: the
    mask table is built once per actor; the per-doc signature is one
    vectorized uint64 xor+min, no Python loop over shingles)."""

    def __init__(self, k: int = 64, shingle_k: int = 8, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.masks = rng.integers(0, 2**64, size=k, dtype=np.uint64)
        self.k = k
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = np.fromiter(shingles(text, self.shingle_k), dtype=np.uint64)
        if len(sh) == 0:
            return np.zeros(self.k, dtype=np.uint64)
        return (sh[None, :] ^ self.masks[:, None]).min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch.column("text").to_pylist()]
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "sig": pa.array([s.tolist() for s in sigs],
                            pa.list_(pa.uint64())),
        })


def _bands(batch: pa.Table, *, n_bands: int, rows_per_band: int) -> pa.Table:
    """One row per (doc, band); band_key = uint64 Horner fold of the
    band's minhash rows (vectorized over the whole batch — the only
    Python loop is rows_per_band iterations). Key collisions between
    different bands only create spurious candidates, which the exact
    Jaccard verify removes, so the fold replaces the old per-chunk
    blake2b without changing verified output."""
    sigs = np.asarray(batch.column("sig").to_pylist(), dtype=np.uint64)
    n = len(sigs)
    if n == 0:
        return pa.Table.from_pydict({
            "doc_id": pa.array([], pa.int64()),
            "band": pa.array([], pa.int32()),
            "band_key": pa.array([], pa.uint64())})
    chunks = sigs.reshape(n, n_bands, rows_per_band)
    keys = np.full((n, n_bands), np.uint64(0xcbf29ce484222325))
    for r in range(rows_per_band):
        keys = keys * _POLY_BASE ^ chunks[:, :, r]
    doc_ids = np.repeat(
        np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64),
        n_bands)
    bands = np.tile(np.arange(n_bands, dtype=np.int32), n)
    return pa.Table.from_pydict({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "band": pa.array(bands, pa.int32()),
        "band_key": pa.array(keys.reshape(-1), pa.uint64()),
    })


# Bucket-vectorized grouping: one map_groups dispatch per HASH BUCKET
# (not per LSH bucket / per doc id) — per-group Python-call overhead
# dominated wall time with ~n_docs tiny groups; inside a hash bucket the
# sub-groups are swept with sorted-run boundaries.
N_HASH_BUCKETS = 64


def _pairs_in_run(ids: list, a: list, b: list) -> None:
    """Capped all-pairs within one LSH bucket, appended to a/b."""
    cap = MINHASH_BUCKET_CAP
    if len(ids) > cap:
        import logging
        logging.getLogger(__name__).warning(
            "minhash LSH bucket overflow: %d ids in one bucket, "
            "dropping %d beyond cap=%d", len(ids), len(ids) - cap, cap)
        ids = ids[:cap]
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """Candidate pairs for every (band, band_key) LSH bucket inside one
    hash bucket. A degenerate hot LSH bucket is capped at 200 ids (pairs
    beyond the cap are DROPPED — a documented recall loss, logged with
    the drop count)."""
    rows = sorted(zip(group.column("band").to_pylist(),
                      group.column("band_key").to_pylist(),
                      group.column("doc_id").to_pylist()))
    a: list = []
    b: list = []
    run_key = None
    run_ids: list = []
    for band, key, doc in rows:
        if (band, key) != run_key:
            if run_ids:
                _pairs_in_run(run_ids, a, b)
            run_key, run_ids = (band, key), []
        run_ids.append(doc)
    if run_ids:
        _pairs_in_run(run_ids, a, b)
    return pa.Table.from_pydict({"doc_a": pa.array(a, pa.int64()),
                                 "doc_b": pa.array(b, pa.int64())})


def _band_hash_bucket(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    hb = pc.cast(pc.bit_wise_and(batch.column("band_key"),
                                 np.uint64(N_HASH_BUCKETS - 1)), pa.int32())
    return batch.append_column("hb", hb)


def minhash_candidates(docs: ray.data.Dataset, *, k: int = 64,
                       n_bands: int = 16, shingle_k: int = 8
                       ) -> ray.data.Dataset:
    """Distinct candidate pairs from LSH band buckets."""
    rows_per_band = k // n_bands
    sigs = docs.select_columns(["doc_id", "text"]).map_batches(
        MinHasher, fn_constructor_kwargs={"k": k, "shingle_k": shingle_k},
        concurrency=(1, 8), batch_size=256, batch_format="pyarrow")
    bands = sigs.map_batches(
        _bands, fn_kwargs={"n_bands": n_bands,
                           "rows_per_band": rows_per_band},
        batch_format="pyarrow")
    pairs = bands.map_batches(_band_hash_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_bucket_pairs, batch_format="pyarrow")
    return pairs.groupby(["doc_a", "doc_b"]).count() \
        .drop_columns(["count()"])


# -- measurable LSH drop accounting ------------------------------------------
#
# The candidate-pair caps (minhash 200 ids / simhash 500 ids per LSH
# bucket) DROP pairs on degenerate buckets.  The loss is not just a log
# line: these side Datasets report, per overflowing bucket, how many
# ids it held and how many candidate pairs were dropped — a 100 TB run
# can roll them up to a recall-loss figure.  Zero rows at the bench
# scale (asserted in tests) means the caps never bit.

MINHASH_BUCKET_CAP = 200
SIMHASH_BUCKET_CAP = 500


def _dropped_pairs(n: int, cap: int) -> int:
    return n * (n - 1) // 2 - cap * (cap - 1) // 2


def _run_sizes(sort_keys: list) -> np.ndarray:
    """Sizes of consecutive equal-key runs in a sorted key list."""
    if not sort_keys:
        return np.array([], dtype=np.int64)
    arr = np.empty(len(sort_keys), dtype=object)  # 1-D array of tuples
    arr[:] = sort_keys
    change = np.r_[True, arr[1:] != arr[:-1]]
    starts = np.flatnonzero(change)
    return np.diff(np.r_[starts, len(arr)])


def _bucket_drop_rows(group: pa.Table, *, key_cols: list[str],
                      cap: int) -> pa.Table:
    keys = sorted(zip(*(group.column(c).to_pylist() for c in key_cols)))
    sizes = _run_sizes(keys)
    over = sizes[sizes > cap]
    return pa.Table.from_pydict({
        "n_ids": pa.array(over, pa.int64()),
        "n_dropped_pairs": pa.array(
            [_dropped_pairs(int(n), cap) for n in over], pa.int64()),
    })


def minhash_drop_counts(docs: ray.data.Dataset, *, k: int = 64,
                        n_bands: int = 16, shingle_k: int = 8
                        ) -> ray.data.Dataset:
    """(n_ids, n_dropped_pairs) per overflowing minhash LSH bucket."""
    rows_per_band = k // n_bands
    sigs = docs.select_columns(["doc_id", "text"]).map_batches(
        MinHasher, fn_constructor_kwargs={"k": k, "shingle_k": shingle_k},
        concurrency=(1, 8), batch_size=256, batch_format="pyarrow")
    bands = sigs.map_batches(
        _bands, fn_kwargs={"n_bands": n_bands,
                           "rows_per_band": rows_per_band},
        batch_format="pyarrow")
    return bands.map_batches(_band_hash_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(
            _bucket_drop_rows,
            fn_kwargs={"key_cols": ["band", "band_key"],
                       "cap": MINHASH_BUCKET_CAP},
            batch_format="pyarrow")


def simhash_drop_counts(docs: ray.data.Dataset, *,
                        n_bands: int = 4) -> ray.data.Dataset:
    """(n_ids, n_dropped_pairs) per overflowing simhash band bucket."""
    bands = simhash_signatures(docs).map_batches(
        _simhash_bands, fn_kwargs={"n_bands": n_bands},
        batch_format="pyarrow")
    return bands.map_batches(_simhash_hb, batch_format="pyarrow") \
        .groupby("hb").map_groups(
            _bucket_drop_rows,
            fn_kwargs={"key_cols": ["band", "band_val"],
                       "cap": SIMHASH_BUCKET_CAP},
            batch_format="pyarrow")


# -- distributed exact-Jaccard verification ---------------------------------
#
# Candidate pairs are verified WITHOUT any driver-side materialization:
# the shingle table (doc_id -> sorted shingle array) is a Dataset, and
# each pair picks up its two shingle sets through two co-group passes —
# a hash join of pairs against the shingle table on doc_a, then on
# doc_b. Exact Jaccard (same shingles() as before, so values are
# unchanged); both joins shuffle only (id, shingles) rows, never text.

_JOIN_SCHEMA = pa.schema([
    ("key", pa.int64()),
    ("doc_a", pa.int64()),
    ("doc_b", pa.int64()),
    ("sh_a", pa.list_(pa.uint64())),
    ("sh", pa.list_(pa.uint64())),
])


def _shingle_batch(batch: pa.Table, *, shingle_k: int) -> pa.Table:
    sh = [sorted(shingles(t, shingle_k))
          for t in batch.column("text").to_pylist()]
    return pa.Table.from_pydict({
        "key": batch.column("doc_id"),
        "sh": pa.array(sh, pa.list_(pa.uint64())),
    })


def _nulls(n: int, typ) -> pa.Array:
    return pa.array([None] * n, typ)


def _pairs_as_join_left(batch: pa.Table, *, side: str) -> pa.Table:
    n = batch.num_rows
    sh_a = batch.column("sh_a") if "sh_a" in batch.column_names \
        else _nulls(n, pa.list_(pa.uint64()))
    return pa.Table.from_pydict({
        "key": batch.column(side),
        "doc_a": batch.column("doc_a"),
        "doc_b": batch.column("doc_b"),
        "sh_a": sh_a,
        "sh": _nulls(n, pa.list_(pa.uint64())),
    }, schema=_JOIN_SCHEMA)


def _shingles_as_join_right(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.Table.from_pydict({
        "key": batch.column("key"),
        "doc_a": _nulls(n, pa.int64()),
        "doc_b": _nulls(n, pa.int64()),
        "sh_a": _nulls(n, pa.list_(pa.uint64())),
        "sh": batch.column("sh"),
    }, schema=_JOIN_SCHEMA)


def _split_group(group: pa.Table):
    """One join hash-bucket = shingle rows for MANY key docs + the pair
    rows keyed to them. Returns (pair rows, key -> shingle array)."""
    import pyarrow.compute as pc
    is_pair = pc.is_valid(group.column("doc_a"))
    pairs = group.filter(is_pair)
    sh_rows = group.filter(pc.invert(is_pair))
    sh_map = {k: np.asarray(s, dtype=np.uint64)
              for k, s in zip(sh_rows.column("key").to_pylist(),
                              sh_rows.column("sh").to_pylist())}
    return pairs, sh_map


def _attach_a(group: pa.Table) -> pa.Table:
    pairs, sh_map = _split_group(group)
    if pairs.num_rows == 0:
        return _JOIN_SCHEMA.empty_table()
    sh_a = [sh_map[k].tolist()
            for k in pairs.column("key").to_pylist()]
    n = pairs.num_rows
    return pa.Table.from_pydict({
        "key": pairs.column("doc_b"),
        "doc_a": pairs.column("doc_a"),
        "doc_b": pairs.column("doc_b"),
        "sh_a": pa.array(sh_a, pa.list_(pa.uint64())),
        "sh": _nulls(n, pa.list_(pa.uint64())),
    }, schema=_JOIN_SCHEMA)


def _verify_b(group: pa.Table, *, threshold: float) -> pa.Table:
    pairs, sh_map = _split_group(group)
    keep_a, keep_b, jac = [], [], []
    if pairs.num_rows:
        for key, a, b, sh_a in zip(pairs.column("key").to_pylist(),
                                   pairs.column("doc_a").to_pylist(),
                                   pairs.column("doc_b").to_pylist(),
                                   pairs.column("sh_a").to_pylist()):
            sh_b = sh_map[key]
            sa = np.asarray(sh_a, dtype=np.uint64)
            inter = len(np.intersect1d(sa, sh_b, assume_unique=True))
            union = len(sa) + len(sh_b) - inter
            j = inter / union if union else 1.0
            if j >= threshold:
                keep_a.append(a)
                keep_b.append(b)
                jac.append(j)
    return pa.Table.from_pydict({
        "doc_a": pa.array(keep_a, pa.int64()),
        "doc_b": pa.array(keep_b, pa.int64()),
        "jaccard": pa.array(jac, pa.float64()),
    })


def _key_bucket(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    hb = pc.cast(pc.bit_wise_and(batch.column("key"),
                                 N_HASH_BUCKETS - 1), pa.int32())
    return batch.append_column("hb", hb)


# Session-level memo for the dedup family's shared sub-pipelines, the
# same pattern (and rationale) as kg._RUN_CACHE: within one driver
# session several catalog queries start from the identical pairs /
# component table (dedup_minhash_planted, dedup_survivors_planted and
# docs_splits_leakproof all share planted pairs -> CC).  Both memoized
# datasets are PAIR/CLASS grain — tiny next to the corpus — so they are
# legitimate materialize points; Datasets are immutable, sharing is safe.
_MEMO: dict[tuple, ray.data.Dataset] = {}


def minhash_dedup_pairs(docs: ray.data.Dataset, *, threshold: float = 0.6,
                        k: int = 64, n_bands: int = 16,
                        shingle_k: int = 8,
                        cache_key: tuple | None = None) -> ray.data.Dataset:
    """Verified near-duplicate pairs (exact Jaccard >= threshold).

    Scale shape: candidates come from the banded LSH groupby; the exact
    check then joins pairs to a Dataset-resident shingle table on doc_a
    and then doc_b (groupby(key).map_groups co-groups). The driver never
    holds doc texts or shingles — contrast the broadcast-map approach,
    which is a driver OOM at corpus scale."""
    if cache_key is not None:
        memo = ("pairs", *cache_key, threshold, k, n_bands, shingle_k)
        got = _MEMO.get(memo)
        if got is not None:
            return got
    cands = minhash_candidates(docs, k=k, n_bands=n_bands,
                               shingle_k=shingle_k)
    sh = docs.select_columns(["doc_id", "text"]).map_batches(
        _shingle_batch, fn_kwargs={"shingle_k": shingle_k},
        batch_format="pyarrow").materialize()

    # co-group by hash bucket of the key (one dispatch per bucket, the
    # per-key lookups swept inside), not per key
    j1 = cands.map_batches(_pairs_as_join_left, fn_kwargs={"side": "doc_a"},
                           batch_format="pyarrow") \
        .union(sh.map_batches(_shingles_as_join_right,
                              batch_format="pyarrow")) \
        .map_batches(_key_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_attach_a, batch_format="pyarrow")

    out = j1.map_batches(_pairs_as_join_left, fn_kwargs={"side": "doc_b"},
                         batch_format="pyarrow") \
        .union(sh.map_batches(_shingles_as_join_right,
                              batch_format="pyarrow")) \
        .map_batches(_key_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(
            _verify_b, fn_kwargs={"threshold": threshold},
            batch_format="pyarrow")
    if cache_key is not None:
        out = out.materialize()
        _MEMO[memo] = out
    return out


# -- planted near-dup corpus: SQL-oracled end-to-end MinHash check ----------
#
# doc i -> group g = i // 4; text = a 32-hex-char group token (sha256 of
# the group id) repeated 3 + i % 4 times, space-joined.  Any >= 2
# repeats of the token produce EVERY char-8-gram window, so the four
# variants of a group have IDENTICAL shingle sets: within-group Jaccard
# is exactly 1.0, the MinHash signatures are equal, and every LSH band
# collides — candidate completeness holds by construction, not by
# probability.  Distinct sha-derived tokens keep cross-group Jaccard
# far below the 0.5 threshold (pinned by pytest, and any band-collision
# false candidate is removed by the exact verify).  DuckDB rebuilds the
# same texts from doc_id arithmetic and computes the same gram-set
# Jaccard, so the verified-pair output is fully hash-oracled
# (MINHASH_PLANTED_SQL).


def planted_neardup_docs(docs: ray.data.Dataset) -> ray.data.Dataset:
    def _synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = [" ".join(
            [hashlib.sha256(f"g{i // 4}".encode()).hexdigest()[:32]]
            * (3 + i % 4)) for i in ids]
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "text": pa.array(texts, pa.string()),
        })

    return docs.select_columns(["doc_id"]).map_batches(
        _synth, batch_format="pyarrow", zero_copy_batch=True)


# real gram-set Jaccard in SQL (not an id-arithmetic shortcut): the
# texts are rebuilt byte-identically, 8-gram sets extracted, and the
# 0.5 threshold stated in exact integer form (2*|inter| >= |union|).
MINHASH_PLANTED_SQL = """
WITH toks AS (
  SELECT doc_id,
         substr(sha256('g' || (doc_id // 4)::VARCHAR), 1, 32) AS tok
  FROM documents),
txt AS (SELECT doc_id, rtrim(repeat(tok || ' ', 3 + doc_id % 4)) AS text
        FROM toks),
grams AS (
  SELECT doc_id, list_distinct(list_transform(
           generate_series(1, length(text) - 7),
           j -> substr(text, j, 8))) AS gs
  FROM txt),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.gs, b.gs)) AS i,
         len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs)) AS u
  FROM grams a JOIN grams b ON a.doc_id < b.doc_id)
SELECT doc_a, doc_b, i / CAST(u AS DOUBLE) AS jaccard
FROM pairs WHERE 2 * i >= u ORDER BY doc_a, doc_b
"""


# -- near-dup SURVIVORS: pairs -> duplicate classes -> min-id keeper ---------
#
# The operation a curation pipeline actually runs: verified near-dup
# pairs are connected into duplicate CLASSES with the distributed
# star-algorithm connected components (transitive closure — A~B, B~C
# dedups all three even when A~C was never a candidate), and only the
# min-doc_id member of each class survives; unpaired docs survive
# unchanged.  Everything stays Dataset-resident: the loser set is
# anti-joined against the doc ids by hash-bucket co-group.


def _doc_node(i: int) -> str:
    return f"d{i:012d}"  # zero-padded: min-string == min-int


def _pairs_as_dup_triples(batch: pa.Table) -> pa.Table:
    return pa.Table.from_pydict({
        "subj": pa.array([_doc_node(a) for a in
                          batch.column("doc_a").to_pylist()],
                         pa.string()),
        "pred": pa.array(["dup"] * batch.num_rows, pa.string()),
        "obj": pa.array([_doc_node(b) for b in
                         batch.column("doc_b").to_pylist()],
                        pa.string()),
    })


def minhash_components(docs: ray.data.Dataset, *,
                       threshold: float = 0.6, k: int = 64,
                       n_bands: int = 16, shingle_k: int = 8,
                       cache_key: tuple | None = None) -> ray.data.Dataset:
    """(node, component) table of the MinHash near-dup classes — the
    pairs -> distributed-CC composition shared by survivor selection and
    leakproof splits; memoized at class grain when ``cache_key`` names
    the corpus (see ``_MEMO``)."""
    from nerfray.stages.graph import connected_components

    if cache_key is not None:
        memo = ("cc", *cache_key, threshold, k, n_bands, shingle_k)
        got = _MEMO.get(memo)
        if got is not None:
            return got
    pairs = minhash_dedup_pairs(docs, threshold=threshold, k=k,
                                n_bands=n_bands, shingle_k=shingle_k,
                                cache_key=cache_key)
    comp = connected_components(
        pairs.map_batches(_pairs_as_dup_triples, batch_format="pyarrow"))
    if cache_key is not None:
        comp = comp.materialize()
        _MEMO[memo] = comp
    return comp


def minhash_dedup_survivors(docs: ray.data.Dataset, *,
                            threshold: float = 0.6, k: int = 64,
                            n_bands: int = 16,
                            shingle_k: int = 8,
                            cache_key: tuple | None = None
                            ) -> ray.data.Dataset:
    """(doc_id) rows that survive MinHash near-dedup."""
    comp = minhash_components(docs, threshold=threshold, k=k,
                              n_bands=n_bands, shingle_k=shingle_k,
                              cache_key=cache_key)

    # losers = class members that are not the class min
    def _losers(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.invert(pc.equal(batch.column("node"),
                                  batch.column("component")))
        ids = [int(s[1:]) for s in
               batch.filter(keep).column("node").to_pylist()]
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "loser": pa.array([True] * len(ids), pa.bool_()),
        })

    losers = comp.map_batches(_losers, batch_format="pyarrow")

    def _ids_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = batch.num_rows
        return pa.Table.from_pydict({
            "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
            "loser": pa.array([False] * n, pa.bool_()),
        })

    def _survivors_bucket(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        loser = group.column("loser").to_numpy(zero_copy_only=False)
        out = np.setdiff1d(ids[~loser], ids[loser])  # vectorized anti-join
        return pa.Table.from_pydict({"doc_id": pa.array(out, pa.int64())})

    def _hb(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        hb = pc.cast(pc.bit_wise_and(batch.column("doc_id"),
                                     N_HASH_BUCKETS - 1), pa.int32())
        return batch.append_column("hb", hb)

    return docs.select_columns(["doc_id"]) \
        .map_batches(_ids_only, batch_format="pyarrow") \
        .union(losers) \
        .map_batches(_hb, batch_format="pyarrow") \
        .groupby("hb").map_groups(_survivors_bucket,
                                  batch_format="pyarrow")


# survivors on the planted corpus: groups {4g..4g+3} are fully paired,
# so exactly the 4g members survive
MINHASH_SURVIVORS_PLANTED_SQL = """
SELECT doc_id FROM documents WHERE doc_id % 4 = 0 ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


_SHIFTS64 = np.arange(64, dtype=np.uint64)


def simhash_many(texts: list[str]) -> np.ndarray:
    """Vectorized SimHash for a whole batch: one sha64 per *unique*
    token across the batch (token vocabularies repeat heavily), then the
    per-bit majority vote runs as two numpy reductions over the flat
    (token, bit) matrix — no per-token Python arithmetic. Token hashes
    are sha256 prefixes (sha64) so the signature is DuckDB-computable:
    SIMHASH_HEX_SQL restates the vote and reassembles the hex string."""
    toks_per_doc = [t.split(" ") for t in texts]
    counts = np.array([len(ts) for ts in toks_per_doc], dtype=np.int64)
    if counts.sum() == 0:
        return np.zeros(0, dtype=np.uint64)
    flat = np.asarray([w for ts in toks_per_doc for w in ts], dtype=object)
    uniq, inv = np.unique(flat, return_inverse=True)
    uh = np.fromiter((sha64(w) for w in uniq.tolist()),
                     dtype=np.uint64, count=len(uniq))
    hv = uh[inv]
    votes = (((hv[:, None] >> _SHIFTS64[None, :]) & np.uint64(1))
             .astype(np.int32) * 2 - 1)
    starts = np.r_[0, np.cumsum(counts)[:-1]]
    acc = np.add.reduceat(votes, starts, axis=0)  # (n_docs, 64)
    bits = (acc > 0).astype(np.uint64)
    return (bits << _SHIFTS64[None, :]).sum(axis=1, dtype=np.uint64)


def simhash64(text: str) -> int:
    """Single-text SimHash (delegates to the batched kernel)."""
    return int(simhash_many([text])[0])


def _simhash_batch(batch: pa.Table) -> pa.Table:
    sh = simhash_many(batch.column("text").to_pylist())
    return pa.Table.from_pydict({
        "doc_id": batch.column("doc_id"),
        "simhash": pa.array(sh, pa.uint64()),
    })


def simhash_signatures(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.select_columns(["doc_id", "text"]).map_batches(
        _simhash_batch, batch_format="pyarrow")


def _simhash_hex(batch: pa.Table) -> pa.Table:
    return pa.Table.from_pydict({
        "doc_id": batch.column("doc_id"),
        "simhash_hex": pa.array(
            [format(v, "016x")
             for v in batch.column("simhash").to_pylist()], pa.string()),
    })


def simhash_signatures_hex(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, simhash_hex): the oracle-comparable signature surface
    (uint64 exceeds SQL BIGINT, hex strings compare exactly)."""
    return simhash_signatures(docs).map_batches(
        _simhash_hex, batch_format="pyarrow")


def simhash_dup_groups(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Signature buckets with >1 member = near-dup classes."""
    sigs = simhash_signatures(docs)
    return sigs.groupby("simhash").count() \
        .rename_columns({"count()": "n_docs"}) \
        .filter(expr="n_docs > 1")


# -- hamming-k SimHash near-dup (banded rotation) ---------------------------


def _simhash_bands(batch: pa.Table, *, n_bands: int) -> pa.Table:
    """One row per (doc, band): band value = 64/n_bands-bit slice of the
    signature. Pigeonhole: hamming(a, b) < n_bands => some band equal,
    so bucketing on (band, value) has full recall for k <= n_bands - 1."""
    sig = batch.column("simhash").to_numpy(zero_copy_only=False) \
        .astype(np.uint64)
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)
    ids, sigs_out, bands, vals = [], [], [], []
    doc_ids = batch.column("doc_id").to_pylist()
    for b in range(n_bands):
        v = (sig >> np.uint64(b * width)) & mask
        ids.extend(doc_ids)
        sigs_out.extend(sig.tolist())
        bands.extend([b] * len(doc_ids))
        vals.extend(v.tolist())
    return pa.Table.from_pydict({
        "doc_id": pa.array(ids, pa.int64()),
        "simhash": pa.array(sigs_out, pa.uint64()),
        "band": pa.array(bands, pa.int32()),
        "band_val": pa.array(vals, pa.uint64()),
    })


def _simhash_run_pairs(rows: list, max_hamming: int, a, b, h) -> None:
    cap = SIMHASH_BUCKET_CAP
    if len(rows) > cap:
        import logging
        logging.getLogger(__name__).warning(
            "simhash band bucket overflow: %d ids, dropping %d beyond "
            "cap=%d", len(rows), len(rows) - cap, cap)
        rows = rows[:cap]
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if rows[i][0] == rows[j][0]:
                continue
            ham = (rows[i][1] ^ rows[j][1]).bit_count()
            if ham <= max_hamming:
                a.append(rows[i][0])
                b.append(rows[j][0])
                h.append(ham)


def _simhash_hb(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    hb = pc.cast(pc.bit_wise_and(batch.column("band_val"),
                                 np.uint64(N_HASH_BUCKETS - 1)), pa.int32())
    return batch.append_column("hb", hb)


def _simhash_bucket_pairs(group: pa.Table, *, max_hamming: int) -> pa.Table:
    """Exact hamming verification for every (band, band_val) bucket in
    one hash bucket (signatures ride with the rows — no second lookup;
    one Python dispatch per hash bucket, runs swept inside)."""
    rows = sorted(zip(group.column("band").to_pylist(),
                      group.column("band_val").to_pylist(),
                      group.column("doc_id").to_pylist(),
                      group.column("simhash").to_pylist()))
    a: list = []
    b: list = []
    h: list = []
    run_key = None
    run: list = []
    for band, bval, doc, sig in rows:
        if (band, bval) != run_key:
            if run:
                _simhash_run_pairs(run, max_hamming, a, b, h)
            run_key, run = (band, bval), []
        run.append((doc, sig))
    if run:
        _simhash_run_pairs(run, max_hamming, a, b, h)
    return pa.Table.from_pydict({
        "doc_a": pa.array(a, pa.int64()),
        "doc_b": pa.array(b, pa.int64()),
        "hamming": pa.array(h, pa.int64()),
    })


def simhash_pairs_from_signatures(sigs: ray.data.Dataset, *,
                                  max_hamming: int = 3,
                                  n_bands: int = 4) -> ray.data.Dataset:
    """(doc_a, doc_b, hamming) pairs with hamming <= max_hamming from a
    (doc_id, simhash) Dataset. Full recall for max_hamming < n_bands;
    one band-bucket groupby, verification co-located with the bucket."""
    if max_hamming >= n_bands:
        raise ValueError(
            f"pigeonhole recall needs max_hamming < n_bands "
            f"(got k={max_hamming}, bands={n_bands})")
    bands = sigs.map_batches(_simhash_bands,
                             fn_kwargs={"n_bands": n_bands},
                             batch_format="pyarrow")
    pairs = bands.map_batches(_simhash_hb, batch_format="pyarrow") \
        .groupby("hb").map_groups(
        _simhash_bucket_pairs, fn_kwargs={"max_hamming": max_hamming},
        batch_format="pyarrow")
    # a pair can surface from several equal bands -> one distinct row
    return pairs.groupby(["doc_a", "doc_b"]).min("hamming") \
        .rename_columns({"min(hamming)": "hamming"})


def simhash_near_dup_pairs(docs: ray.data.Dataset, *,
                           max_hamming: int = 3,
                           n_bands: int = 4) -> ray.data.Dataset:
    """Near-duplicate doc pairs by SimHash hamming distance <= k (banded
    rotation: guaranteed recall for k < n_bands, unlike the hamming-0
    signature-bucket view in simhash_dup_groups)."""
    return simhash_pairs_from_signatures(
        simhash_signatures(docs), max_hamming=max_hamming,
        n_bands=n_bands)


# ---------------------------------------------------------------------------
# edit-distance similarity join (length-banded, counting-filtered)
# ---------------------------------------------------------------------------
#
# Pairs with levenshtein(text_a, text_b) <= ED_K — the character-level
# near-dup family (OCR noise, small patches) that token-set Jaccard
# cannot see.  Deterministic completeness by two exact filters:
#   1. length bands of width ED_K: |la - lb| <= ED_K forces the pair
#      into a shared band when every doc is replicated to bands
#      (n // ED_K) and (n // ED_K + 1) — pairs co-group with their
#      texts, nothing driver-side;
#   2. the counting filter: ed(a, b) >= L1(charcounts_a, charcounts_b)
#      / 2 (each unit edit moves at most two counts), vectorized as one
#      |A - B| matrix sweep per band — the O(len^2) DP runs only on
#      the survivors.
# The DP itself is the row-sweep recurrence with the prefix-min trick
# (dp = j + cummin(d - j)), exact unit-cost Levenshtein — equal to
# DuckDB's levenshtein, hence the full SQL oracle on raw documents.
# Texts are capped at ED_MAXLEN chars on BOTH sides of the oracle.

ED_K = 32
ED_MAXLEN = 4096
ED_BAND_CAP = 2000          # docs per co-group before drop (logged)
ED_QGRAM = 4                # q-gram width for the second counting filter
ED_QGRAM_BUCKETS = 1024     # hashed q-gram profile dimensionality


def _qgram_profiles(cps: list, n_buckets: int = ED_QGRAM_BUCKETS
                    ) -> np.ndarray:
    """(n_docs, n_buckets) hashed 4-gram count profiles.

    Counting-filter theorem (Ukkonen '92): ed(a, b) <= k implies the
    q-gram profiles differ by at most 2*q*k in L1 — one unit edit
    touches at most q overlapping q-grams per side.  Bucket-hashing
    distinct q-grams together only LOWERS the observed L1, so the
    filter stays sound (no false drops); it just weakens.  1024
    buckets keeps unrelated same-length docs far above the 2*q*k
    threshold where the raw char histogram (the first filter) cannot
    separate them — measured at sf0.1 the char filter passes 43% of
    candidate pairs, this one passes only the true near-dups."""
    out = np.zeros((len(cps), n_buckets), dtype=np.int32)
    nb = np.uint64(n_buckets)
    m1, m2, m3 = np.uint64(1000003), np.uint64(8191), np.uint64(131)
    for i, cp in enumerate(cps):
        if len(cp) < ED_QGRAM:
            continue
        c = cp.astype(np.uint64)
        h = (c[:-3] * m1) ^ (c[1:-2] * m2) ^ (c[2:-1] * m3) ^ c[3:]
        out[i] = np.bincount((h % nb).astype(np.int64),
                             minlength=n_buckets)
    return out

_ED_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                        ("editdist", pa.int64())])


def _levenshtein(a: str, b: str, k: int | None = None) -> int:
    """Vectorized row-sweep Levenshtein (prefix-min insertion chain).

    With ``k`` set, exits early once the row minimum exceeds k (the row
    min is non-decreasing, so the final distance is already > k) and
    returns k+1 as a sentinel — distances <= k stay exact.  Candidate
    pairs that passed the weak counting filter but aren't real dups
    bail after ~k rows instead of sweeping the full text."""
    ca = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    cb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    if not len(ca):
        return len(cb)
    if not len(cb):
        return len(ca)
    prev = np.arange(len(cb) + 1, dtype=np.int64)
    j = np.arange(len(cb) + 1, dtype=np.int64)
    for i in range(len(ca)):
        sub = prev[:-1] + (cb != ca[i])
        d = np.r_[i + 1, np.minimum(sub, prev[1:] + 1)]
        prev = j + np.minimum.accumulate(d - j)
        if k is not None and prev.min() > k:
            return k + 1
    return int(prev[-1])


def _batched_levenshtein(cps: list, iu: np.ndarray, ju: np.ndarray,
                         k: int) -> np.ndarray:
    """Exact Levenshtein for many (iu[p], ju[p]) codepoint pairs at
    once, values > k clamped to k + 1.

    The row-sweep recurrence vectorizes over the PAIR axis: one
    (alive_pairs, max_len_b) matrix per DP row instead of a Python
    loop of per-pair sweeps — the per-row numpy dispatch overhead
    that dominates single-pair sweeps on ~600-char docs is paid once
    per row for the whole batch.  Texts are padded with a
    never-matching sentinel; DP[i][j] depends only on columns <= j,
    so padded columns never influence the answer read at column
    len(b), and their values are >= DP[i][len(b)] (pads never match),
    so the per-pair row minimum used for early exit stays exact.
    Every 8 rows, pairs whose (non-decreasing) row minimum exceeds k
    are dropped and the working set compacts."""
    n = len(iu)
    res = np.full(n, k + 1, dtype=np.int64)
    if n == 0:
        return res
    la = np.array([len(cps[i]) for i in iu], dtype=np.int64)
    lb = np.array([len(cps[j]) for j in ju], dtype=np.int64)
    swap = la > lb
    ai = np.where(swap, ju, iu)
    bi = np.where(swap, iu, ju)
    la, lb = np.minimum(la, lb), np.maximum(la, lb)
    empty = la == 0
    res[empty] = lb[empty]          # exact, caller filters > k
    act = np.flatnonzero(~empty)
    # 2048-pair chunks keep the per-row working set (~5 arrays of
    # chunk x max_len int16) inside L3 — measured 4.3x over one big
    # memory-bound matrix
    for c0 in range(0, len(act), 2048):
        _batched_leven_chunk(cps, ai, bi, la, lb, act[c0:c0 + 2048],
                             k, res)
    return res


def _batched_leven_chunk(cps, ai, bi, la, lb, act, k, res) -> None:
    maxa, maxb = int(la[act].max()), int(lb[act].max())
    pad = np.uint32(0xFFFFFFFF)     # not a valid codepoint
    A = np.full((len(act), maxa), pad, dtype=np.uint32)
    B = np.full((len(act), maxb), pad, dtype=np.uint32)
    for r, p in enumerate(act):
        A[r, :la[p]] = cps[ai[p]]
        B[r, :lb[p]] = cps[bi[p]]
    la_a, lb_a = la[act].copy(), lb[act].copy()
    idx = act.copy()                # row -> position in res
    jrow = np.arange(maxb + 1, dtype=np.int16)
    prev = np.tile(jrow, (len(act), 1))
    d = np.empty_like(prev)
    i = 0
    while len(idx) and i < maxa:
        sub = prev[:, :-1] + (B != A[:, i:i + 1])
        if d.shape != prev.shape:
            d = np.empty_like(prev)
        d[:, 0] = i + 1
        np.minimum(sub, prev[:, 1:] + 1, out=d[:, 1:])
        d -= jrow
        prev = jrow + np.minimum.accumulate(d, axis=1)
        i += 1
        fin = la_a == i
        if fin.any():
            rows = np.flatnonzero(fin)
            res[idx[rows]] = prev[rows, lb_a[rows]]
        if fin.any() or (i & 7) == 0:
            keep = (~fin) & (prev.min(axis=1) <= k)
            if not keep.all():
                A, B, prev = A[keep], B[keep], prev[keep]
                la_a, lb_a, idx = la_a[keep], lb_a[keep], idx[keep]


# gkey bit layout: (group-band << 32) | (si << 16) | sj — supports up
# to 65,536 shards per band, i.e. cap * 65536 / 2 ≈ 6.5e7 docs in ONE
# length band before the layout (not the algorithm) runs out.
_ED_GB_SHIFT = 32
_ED_SH_SHIFT = 16
_ED_SH_MASK = (1 << 16) - 1


def editdist_band_shards(census: list[tuple[int, int]],
                         cap: int = ED_BAND_CAP) -> dict[int, int]:
    """Per GROUP-band shard counts from a (band, n_docs) census.

    Group-band g receives docs of length-band g and g-1 (each doc
    joins its own band and the one above), so its population is
    pop(g) + pop(g-1); a shard-pair co-group holds docs of two shards
    => n_shards = ceil(2 * population / cap) bounds every co-group by
    ``cap`` docs BY CONSTRUCTION — no truncation, no drops."""
    pop: dict[int, int] = {}
    for band, n in census:
        pop[band] = pop.get(band, 0) + n
    shards: dict[int, int] = {}
    for band, n in pop.items():
        for g in (band, band + 1):
            shards[g] = shards.get(g, 0) + n
    return {g: max(1, (2 * n + cap - 1) // cap)
            for g, n in shards.items()}


class _UniformShards:
    """Picklable band -> n_shards map with one value everywhere (the
    explicit-``n_shards`` override path)."""

    def __init__(self, n: int):
        self.n = n

    def get(self, _g: int, _default: int = 1) -> int:
        return self.n


_ED_CENSUS_SCHEMA = pa.schema([("band", pa.int64()), ("n", pa.int64())])


def _ed_census_counts(batch: pa.Table, *, k: int, maxlen: int) -> pa.Table:
    if batch.num_rows == 0:
        return _ED_CENSUS_SCHEMA.empty_table()
    lens = pc.utf8_length(
        pc.utf8_slice_codeunits(batch.column("text"), 0, maxlen)) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    bands, counts = np.unique(lens // k, return_counts=True)
    return pa.Table.from_pydict({
        "band": pa.array(bands, pa.int64()),
        "n": pa.array(counts.astype(np.int64), pa.int64()),
    }, schema=_ED_CENSUS_SCHEMA)


def editdist_band_census(docs: ray.data.Dataset, *,
                         k: int = ED_K,
                         maxlen: int = ED_MAXLEN,
                         cap: int = ED_BAND_CAP) -> ray.data.Dataset:
    """(band, n_docs, n_shards) audit surface for the adaptive shard
    plan: how many docs land in each GROUP-band co-group family and
    how many shard-splits it gets.  Narrow rows only (no text leaves
    the block); #bands <= maxlen // k + 2, so the driver-side plan is
    bounded regardless of corpus size.  Full SQL mirror
    (EDITDIST_CENSUS_SQL) — the drop-accounting oracle row: with the
    adaptive plan every band is processed whole, so the audit proves
    ZERO docs were dropped (the pre-r5 ED_BAND_CAP truncation is
    gone)."""
    pop = docs.select_columns(["text"]).map_batches(
        _ed_census_counts, fn_kwargs={"k": k, "maxlen": maxlen},
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("band").sum("n").rename_columns({"sum(n)": "n"})

    def _with_shards(batch: pa.Table) -> pa.Table:
        # group-band populations + shard plan, from the tiny census
        census = list(zip(
            batch.column("band").to_pylist(), batch.column("n").to_pylist()))
        pop: dict[int, int] = {}
        for band, n in census:
            for g in (band, band + 1):
                pop[g] = pop.get(g, 0) + n
        shards = editdist_band_shards(census, cap)
        gs = sorted(pop)
        return pa.Table.from_pydict({
            "band": pa.array(gs, pa.int64()),
            "n_docs": pa.array([pop[g] for g in gs], pa.int64()),
            "n_shards": pa.array([shards[g] for g in gs], pa.int64())})

    # the census is <= maxlen // k + 2 rows: one block, one map
    return pop.repartition(1).map_batches(
        _with_shards, batch_format="pyarrow")


def _ed_band_rows(batch: pa.Table, *, k: int, maxlen: int,
                  shard_map: dict[int, int]) -> pa.Table:
    """One row per (length-band, shard-pair) a doc participates in.

    Quadratic pair work inside a populous band is split across
    ``n_g * (n_g + 1) / 2`` independent co-groups with n_g the
    PER-GROUP-BAND shard count from the census plan: doc with shard
    s = doc_id % n_g joins group (g, min(s, t), max(s, t)) for every
    t, so each unordered pair of shards lands in exactly ONE group
    and each doc's text is replicated n_{b} + n_{b+1} times.  Output
    is invariant in the shard plan; the split only buys parallelism
    and the per-group cap (the sf0.1 soak's 331 s single-band wall)."""
    out_schema = pa.schema([("gkey", pa.int64()), ("shard", pa.int32()),
                            ("doc_id", pa.int64()), ("text", pa.string())])
    texts = [t[:maxlen] for t in batch.column("text").to_pylist()]
    if not texts:
        return out_schema.empty_table()
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    bands = np.array([len(t) // k for t in texts], dtype=np.int64)
    gkeys_out: list[np.ndarray] = []
    shards_out: list[np.ndarray] = []
    ids_out: list[np.ndarray] = []
    texts_out: list[str] = []
    for b in np.unique(bands):
        sel = np.flatnonzero(bands == b)
        for g in (int(b), int(b) + 1):
            n_g = shard_map.get(g, 1)
            s = (ids[sel] % n_g).astype(np.int64)
            t = np.arange(n_g, dtype=np.int64)
            si = np.minimum(s[:, None], t[None, :])
            sj = np.maximum(s[:, None], t[None, :])
            gkeys_out.append(
                ((np.int64(g) << _ED_GB_SHIFT)
                 | (si << _ED_SH_SHIFT) | sj).ravel())
            shards_out.append(np.repeat(s, n_g))
            ids_out.append(np.repeat(ids[sel], n_g))
            texts_out.extend(
                tx for i in sel for tx in [texts[i]] * n_g)
    return pa.Table.from_pydict({
        "gkey": pa.array(np.concatenate(gkeys_out), pa.int64()),
        "shard": pa.array(
            np.concatenate(shards_out).astype(np.int32), pa.int32()),
        "doc_id": pa.array(np.concatenate(ids_out), pa.int64()),
        "text": pa.array(texts_out, pa.string()),
    }, schema=out_schema)


def _ed_band_pairs(group: pa.Table, *, k: int) -> pa.Table:
    if group.num_rows == 0:
        return _ED_SCHEMA.empty_table()
    gkey = int(group.column("gkey")[0].as_py())
    si = (gkey >> _ED_SH_SHIFT) & _ED_SH_MASK
    sj = gkey & _ED_SH_MASK
    texts = group.column("text").to_pylist()
    ids = group.column("doc_id").to_numpy(zero_copy_only=False)
    shards = group.column("shard").to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    ids, shards = ids[order], shards[order]
    texts = [texts[i] for i in order]
    if len(ids) > 8 * ED_BAND_CAP:
        # the adaptive census plan bounds co-groups at ED_BAND_CAP by
        # construction (8x headroom for shard imbalance); landing here
        # means the plan is broken — fail loudly, never drop silently
        raise ValueError(
            f"editdist co-group holds {len(ids)} docs "
            f"(> 8 * cap {ED_BAND_CAP}); adaptive shard plan violated")
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    cps = [np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
           for t in texts]
    uniq = np.unique(np.concatenate(cps)) if texts else np.array([])
    mat = np.zeros((len(ids), len(uniq)), dtype=np.int64)
    for i, cp in enumerate(cps):
        np.add.at(mat[i], np.searchsorted(uniq, cp), 1)
    iu, ju = np.triu_indices(len(ids), k=1)
    ok = np.abs(lens[iu] - lens[ju]) <= k
    if si != sj:
        # cross-shard group: in-shard pairs belong to (si, si) / (sj, sj)
        ok &= shards[iu] != shards[ju]
    iu, ju = iu[ok], ju[ok]
    l1 = np.abs(mat[iu] - mat[ju]).sum(axis=1)
    ok = l1 <= 2 * k
    iu, ju = iu[ok], ju[ok]
    if len(iu):
        # second, much stronger counting filter on hashed 4-gram
        # profiles (threshold 2*q*k, small slack for the truncation
        # boundary) — chunked so the (pairs, buckets) sweep stays in
        # a bounded working set
        qs = _qgram_profiles(cps)
        thresh = 2 * ED_QGRAM * k + 2 * ED_QGRAM
        keep = []
        for s0 in range(0, len(iu), 8192):
            a, b = iu[s0:s0 + 8192], ju[s0:s0 + 8192]
            keep.append(np.abs(qs[a] - qs[b]).sum(axis=1) <= thresh)
        ok = np.concatenate(keep)
        iu, ju = iu[ok], ju[ok]
    dists = _batched_levenshtein(cps, iu, ju, k)
    hit = dists <= k
    return pa.Table.from_pydict({
        "doc_a": pa.array(ids[iu[hit]], pa.int64()),
        "doc_b": pa.array(ids[ju[hit]], pa.int64()),
        "editdist": pa.array(dists[hit], pa.int64()),
    }, schema=_ED_SCHEMA)


def editdist_pairs(docs: ray.data.Dataset, *,
                   k: int = ED_K,
                   maxlen: int = ED_MAXLEN,
                   n_shards: int | None = None,
                   cap: int = ED_BAND_CAP) -> ray.data.Dataset:
    """(doc_a, doc_b, editdist) for every pair within edit distance
    ``k`` — exact via length-banded, shard-split co-groups + two
    counting filters (char histogram, then hashed 4-gram profile)
    ahead of the DP verify.

    Sharding is POPULATION-ADAPTIVE by default (``n_shards=None``): a
    narrow census pass counts docs per length band (<= maxlen//k + 2
    rows at the driver, corpus-size-independent) and each group-band
    gets ceil(2 * population / cap) shards, bounding every co-group at
    ``cap`` docs by construction — no truncation, no silent drops
    (the pre-r5 ED_BAND_CAP drop path is gone; a violated plan raises).
    Pass an explicit ``n_shards`` to force a uniform plan (the split
    is output-invariant either way: candidate-sweep work grows by
    (2s-1)/s while per-group serial work falls by ~s/2)."""
    if n_shards is None:
        census = [(r["band"], r["n"])
                  for r in docs.select_columns(["text"]).map_batches(
                      _ed_census_counts,
                      fn_kwargs={"k": k, "maxlen": maxlen},
                      batch_format="pyarrow", zero_copy_batch=True)
                  .groupby("band").sum("n")
                  .rename_columns({"sum(n)": "n"}).take_all()]
        shard_map = editdist_band_shards(census, cap)
    else:
        shard_map = _UniformShards(n_shards)
    bands = docs.select_columns(["doc_id", "text"]).map_batches(
        _ed_band_rows,
        fn_kwargs={"k": k, "maxlen": maxlen, "shard_map": shard_map},
        batch_format="pyarrow", zero_copy_batch=True)
    pairs = bands.groupby("gkey").map_groups(
        _ed_band_pairs, fn_kwargs={"k": k},
        batch_format="pyarrow")
    # a pair can surface in both shared bands: one tiny distinct
    return pairs.groupby(["doc_a", "doc_b"]).min("editdist") \
        .rename_columns({"min(editdist)": "editdist"})


EDITDIST_CENSUS_SQL = f"""
WITH d AS (
  SELECT length(substr(text, 1, {ED_MAXLEN})) // {ED_K} AS band
  FROM documents),
pop AS (SELECT band, count(*)::BIGINT AS n FROM d GROUP BY band),
g AS (SELECT band AS gband, n FROM pop
      UNION ALL SELECT band + 1, n FROM pop),
c AS (SELECT gband, sum(n)::BIGINT AS n_docs FROM g GROUP BY gband)
SELECT gband AS band, n_docs,
       greatest(1, (2 * n_docs + {ED_BAND_CAP} - 1)
                   // {ED_BAND_CAP})::BIGINT AS n_shards
FROM c ORDER BY band
"""


EDITDIST_SQL = f"""
WITH d AS (
  SELECT doc_id, substr(text, 1, {ED_MAXLEN}) AS text,
         length(substr(text, 1, {ED_MAXLEN})) AS n
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(a.text, b.text)::BIGINT AS editdist
FROM d a JOIN d b ON a.doc_id < b.doc_id AND abs(a.n - b.n) <= {ED_K}
WHERE levenshtein(a.text, b.text) <= {ED_K}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# paragraph-level exact dedup (CCNet / RefinedWeb-style boilerplate removal)
# ---------------------------------------------------------------------------
#
# Split each document into paragraphs ("\n\n"); a paragraph occurrence
# survives iff it is the GLOBAL FIRST occurrence of that exact paragraph
# (lexicographic-min (doc_id, idx) over its sha256), or it is shorter
# than ``min_len`` (short separators/headers are never deduped).
# Surviving paragraphs are re-joined in order — the cleaned corpus.
#
# Scale shape (100 TB): pass 1 emits ONE NARROW ROW per dedupable
# paragraph occurrence (sha hex + two ints; the paragraph TEXT never
# enters the winner exchange).  The sha-hash-bucket co-group elects the
# winner per paragraph and emits only KILL rows (doc_id, idx) — in a
# boilerplate-heavy web corpus that is a small fraction of occurrences.
# The rebuild is ONE doc-hash exchange carrying each doc's text once
# (repartition-class cost; with a corpus bucketed by doc hash at rest
# this join becomes map-side and text never moves at all).

PARA_SEP = "\n\n"
PARA_MIN_LEN = 20
_PARA_OCC_SCHEMA = pa.schema([("psha", pa.string()),
                              ("doc_id", pa.int64()),
                              ("idx", pa.int64())])
_PARA_KILL_SCHEMA = pa.schema([("doc_id", pa.int64()),
                               ("idx", pa.int64())])
_PARA_UNION_SCHEMA = pa.schema([("db", pa.int32()), ("side", pa.int8()),
                                ("doc_id", pa.int64()), ("idx", pa.int64()),
                                ("text", pa.string())])
_PARA_OUT_SCHEMA = pa.schema([("doc_id", pa.int64()),
                              ("text_clean", pa.string()),
                              ("n_paras", pa.int64()),
                              ("n_kept", pa.int64())])


def _para_occurrences(batch: pa.Table, *, min_len: int) -> pa.Table:
    shas: list = []
    ids: list = []
    idxs: list = []
    for d, t in zip(batch.column("doc_id").to_pylist(),
                    batch.column("text").to_pylist()):
        for i, p in enumerate(t.split(PARA_SEP)):
            if len(p) >= min_len:
                shas.append(hashlib.sha256(p.encode()).hexdigest())
                ids.append(d)
                idxs.append(i)
    return pa.Table.from_pydict(
        {"psha": shas, "doc_id": ids, "idx": idxs},
        schema=_PARA_OCC_SCHEMA)


def _para_sha_bucket(batch: pa.Table) -> pa.Table:
    import pandas as pd
    arr = np.asarray(batch.column("psha").to_pylist(), dtype=object)
    hb = (pd.util.hash_array(arr) % N_HASH_BUCKETS).astype(np.int32)
    return batch.append_column("hb", pa.array(hb))


def _para_kills_bucket(group: pa.Table) -> pa.Table:
    """All occurrences of each paragraph sha are in this bucket; the
    (doc_id, idx)-min occurrence wins, the rest are kill rows."""
    if group.num_rows == 0:
        return _PARA_KILL_SCHEMA.empty_table()
    shas = np.asarray(group.column("psha").to_pylist(), dtype=object)
    ids = group.column("doc_id").to_numpy(zero_copy_only=False)
    idxs = group.column("idx").to_numpy(zero_copy_only=False)
    order = np.lexsort((idxs, ids, shas))
    loser = np.r_[False, shas[order][1:] == shas[order][:-1]]
    sel = order[loser]
    return pa.Table.from_pydict(
        {"doc_id": ids[sel], "idx": idxs[sel]}, schema=_PARA_KILL_SCHEMA)


def _para_widen(batch: pa.Table, *, side: int) -> pa.Table:
    import pandas as pd
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    db = (pd.util.hash_array(ids.astype(np.int64)) %
          N_HASH_BUCKETS).astype(np.int32)
    n = batch.num_rows
    return pa.Table.from_arrays([
        pa.array(db), pa.array(np.full(n, side, dtype=np.int8)),
        batch.column("doc_id"),
        batch.column("idx") if side == 1 else pa.nulls(n, pa.int64()),
        batch.column("text") if side == 0 else pa.nulls(n, pa.string()),
    ], schema=_PARA_UNION_SCHEMA)


def _para_rebuild_bucket(group: pa.Table, *, min_len: int) -> pa.Table:
    if group.num_rows == 0:
        return _PARA_OUT_SCHEMA.empty_table()
    side = group.column("side").to_numpy(zero_copy_only=False)
    kills: dict[int, set] = {}
    kt = group.filter(pa.array(side == 1))
    for d, i in zip(kt.column("doc_id").to_pylist(),
                    kt.column("idx").to_pylist()):
        kills.setdefault(d, set()).add(i)
    dt = group.filter(pa.array(side == 0))
    out_id: list = []
    out_txt: list = []
    out_np: list = []
    out_nk: list = []
    for d, t in zip(dt.column("doc_id").to_pylist(),
                    dt.column("text").to_pylist()):
        paras = t.split(PARA_SEP)
        dead = kills.get(d, ())
        kept = [p for i, p in enumerate(paras) if i not in dead]
        out_id.append(d)
        out_txt.append(PARA_SEP.join(kept))
        out_np.append(len(paras))
        out_nk.append(len(kept))
    return pa.Table.from_pydict(
        {"doc_id": out_id, "text_clean": out_txt,
         "n_paras": out_np, "n_kept": out_nk}, schema=_PARA_OUT_SCHEMA)


def paragraph_dedup_docs(docs: ray.data.Dataset, *,
                         min_len: int = PARA_MIN_LEN) -> ray.data.Dataset:
    """(doc_id, text_clean, n_paras, n_kept): the corpus with globally
    duplicated paragraphs removed (first occurrence kept)."""
    kills = docs.select_columns(["doc_id", "text"]) \
        .map_batches(_para_occurrences, fn_kwargs={"min_len": min_len},
                     batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(_para_sha_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_para_kills_bucket,
                                  batch_format="pyarrow")
    dw = docs.select_columns(["doc_id", "text"]).map_batches(
        _para_widen, fn_kwargs={"side": 0},
        batch_format="pyarrow", zero_copy_batch=True)
    kw = kills.map_batches(_para_widen, fn_kwargs={"side": 1},
                           batch_format="pyarrow")
    return dw.union(kw).groupby("db").map_groups(
        _para_rebuild_bucket, fn_kwargs={"min_len": min_len},
        batch_format="pyarrow")


def paragraph_dedup_summary(docs: ray.data.Dataset, *,
                            min_len: int = PARA_MIN_LEN) -> ray.data.Dataset:
    """Narrow mirror surface: (doc_id, n_paras, n_kept, clean_sha) with
    clean_sha = sha256 hex of the reassembled cleaned text."""

    def _sha(batch: pa.Table) -> pa.Table:
        shas = [hashlib.sha256(t.encode()).hexdigest()
                for t in batch.column("text_clean").to_pylist()]
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id").to_pylist(),
            "n_paras": batch.column("n_paras").to_pylist(),
            "n_kept": batch.column("n_kept").to_pylist(),
            "clean_sha": shas,
        }, schema=pa.schema([("doc_id", pa.int64()),
                             ("n_paras", pa.int64()),
                             ("n_kept", pa.int64()),
                             ("clean_sha", pa.string())]))

    return paragraph_dedup_docs(docs, min_len=min_len).map_batches(
        _sha, batch_format="pyarrow", zero_copy_batch=True)


def planted_paragraph_docs(docs: ray.data.Dataset) -> ray.data.Dataset:
    """3-paragraph docs derived from doc_id (mirrored verbatim in
    PARA_DEDUP_PLANTED_SQL): a 17-class shared header, a unique body,
    a 5-class shared tail — so cross-doc duplicate paragraphs exist on
    any corpus and the winner election has known answers."""

    def _plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        planted = [
            f"bp alpha {d % 17} common passage end{PARA_SEP}"
            f"doc body {d}: {t[:80]}{PARA_SEP}"
            f"bp beta {d % 5} shared tail passage"
            for d, t in zip(ids, texts)]
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "text": pa.array(planted, pa.string()),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _plant, batch_format="pyarrow", zero_copy_batch=True)


PARA_DEDUP_PLANTED_SQL = f"""
WITH p AS (
  SELECT doc_id,
         'bp alpha ' || CAST(doc_id % 17 AS VARCHAR)
           || ' common passage end' || chr(10) || chr(10) ||
         'doc body ' || CAST(doc_id AS VARCHAR) || ': '
           || substr(text, 1, 80) || chr(10) || chr(10) ||
         'bp beta ' || CAST(doc_id % 5 AS VARCHAR)
           || ' shared tail passage' AS t
  FROM documents),
paras AS (
  SELECT doc_id,
         unnest(string_split(t, chr(10) || chr(10))) AS para,
         generate_subscripts(string_split(t, chr(10) || chr(10)), 1) - 1
           AS idx
  FROM p),
ranked AS (
  SELECT doc_id, idx, para,
         CASE WHEN length(para) < {PARA_MIN_LEN} THEN 1
              WHEN row_number() OVER (PARTITION BY para
                                      ORDER BY doc_id, idx) = 1 THEN 1
              ELSE 0 END AS keep
  FROM paras)
SELECT doc_id, count(*)::BIGINT AS n_paras, sum(keep)::BIGINT AS n_kept,
       sha256(COALESCE(string_agg(para, chr(10) || chr(10) ORDER BY idx)
                       FILTER (WHERE keep = 1), '')) AS clean_sha
FROM ranked GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# leakage-safe train/val/test splits (split by DUP CLASS, not by doc)
# ---------------------------------------------------------------------------
#
# Hashing each doc_id into a split leaks near-duplicates across the
# train/test boundary — the classic eval contamination bug.  The safe
# unit is the near-dup CLASS: pairs -> distributed connected components
# (the existing survivors machinery) give each doc its class
# representative; the split hash is computed on the REPRESENTATIVE, so
# every member of a class lands in the same split by construction.
# Docs in no dup class are their own representative.  One big-big
# left-outer hash join attaches the class map to the corpus; the split
# is per-row sha arithmetic (no shuffle).

def leakproof_splits(docs: ray.data.Dataset, *,
                     threshold: float = 0.5,
                     cache_key: tuple | None = None) -> ray.data.Dataset:
    """(doc_id, class_rep, split) with split in train/val/test (8/1/1
    by sha256(class_rep) mod 10) and near-dup classes unsplit."""
    from .joins import hash_join

    comp = minhash_components(docs, threshold=threshold,
                              cache_key=cache_key)

    def _class_map(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "doc_id": pa.array(
                [int(s[1:]) for s in batch.column("node").to_pylist()],
                pa.int64()),
            "rep": pa.array(
                [int(s[1:]) for s in
                 batch.column("component").to_pylist()], pa.int64()),
        })

    cmap = comp.map_batches(_class_map, batch_format="pyarrow")
    joined = hash_join(
        docs.select_columns(["doc_id"]), cmap,
        left_on="doc_id", right_on="doc_id",
        left_cols=[], right_cols=["rep"], how="left outer")

    def _assign(batch: pa.Table) -> pa.Table:
        ids = batch.column("__key").to_numpy(zero_copy_only=False)
        rep_col = batch.column("rep").to_numpy(zero_copy_only=False)
        rep = np.where(pa.compute.is_null(batch.column("rep"))
                       .to_numpy(zero_copy_only=False), ids, rep_col) \
            .astype(np.int64)
        b = splitmix64(rep.astype(np.uint64)) % np.uint64(10)
        split = np.where(b < 8, "train", np.where(b == 8, "val", "test"))
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "class_rep": pa.array(rep, pa.int64()),
            "split": pa.array(split.tolist(), pa.string()),
        })

    return joined.map_batches(_assign, batch_format="pyarrow")


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over a uint64 array — the split-bucket
    hash (the r3 shape called hashlib.sha256 once per row).  Bit-exact
    SQL mirror: the UHUGEINT modular-arithmetic CTE chain in
    LEAKPROOF_PLANTED_SQL."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


# planted corpus: classes are exactly {4g..4g+3}, so the whole
# pairs -> components -> rep -> split flow is pure id arithmetic; the
# z1..z3/h chain is splitmix64 step for step (UHUGEINT keeps the
# mod-2^64 wraparound exact)
LEAKPROOF_PLANTED_SQL = """
WITH s AS (SELECT doc_id, 4 * (doc_id // 4) AS rep FROM documents),
z1 AS (SELECT doc_id, rep,
              ((rep::UBIGINT::UHUGEINT + 11400714819323198485)
               % 18446744073709551616)::UBIGINT AS z FROM s),
z2 AS (SELECT doc_id, rep,
              ((xor(z, z >> 30)::UHUGEINT * 13787848793156543929)
               % 18446744073709551616)::UBIGINT AS z FROM z1),
z3 AS (SELECT doc_id, rep,
              ((xor(z, z >> 27)::UHUGEINT * 10723151780598845931)
               % 18446744073709551616)::UBIGINT AS z FROM z2),
h AS (SELECT doc_id, rep, xor(z, z >> 31) % 10 AS b FROM z3)
SELECT doc_id, rep::BIGINT AS class_rep,
       CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
            ELSE 'test' END AS split
FROM h ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# soft dedup: per-doc loss/sampling weights = 1000 // near-dup class size
# ---------------------------------------------------------------------------
#
# The alternative to dropping near-dups: keep every copy but weight it
# down so a duplicated document contributes (approximately) one
# document's worth of training signal.  Reuses the memoized
# pairs -> CC class map; one class-grain count + two hash joins —
# nothing beyond the dedup family's existing exchanges.

def dupclass_weights(docs: ray.data.Dataset, *,
                     threshold: float = 0.5,
                     cache_key: tuple | None = None) -> ray.data.Dataset:
    """(doc_id, class_rep, weight_permille) with weight = 1000 // class
    size (singletons get 1000)."""
    from .joins import hash_join

    comp = minhash_components(docs, threshold=threshold,
                              cache_key=cache_key)

    def _class_map(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "doc_id": pa.array(
                [int(s[1:]) for s in batch.column("node").to_pylist()],
                pa.int64()),
            "rep": pa.array(
                [int(s[1:]) for s in
                 batch.column("component").to_pylist()], pa.int64()),
        })

    cmap = comp.map_batches(_class_map,
                            batch_format="pyarrow").materialize()
    sizes = cmap.groupby("rep").count().rename_columns(
        {"count()": "sz"})  # class-grain
    types = {c: pa.int64() for c in ("doc_id", "rep", "sz")}
    with_rep = hash_join(
        docs.select_columns(["doc_id"]), cmap,
        left_on="doc_id", right_on="doc_id",
        left_cols=[], right_cols=["rep"], how="left outer",
        field_types=types)

    def _rep_or_self(batch: pa.Table) -> pa.Table:
        ids = batch.column("__key").to_numpy(zero_copy_only=False)
        rep_col = batch.column("rep").to_numpy(zero_copy_only=False)
        rep = np.where(pa.compute.is_null(batch.column("rep"))
                       .to_numpy(zero_copy_only=False), ids, rep_col) \
            .astype(np.int64)
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "rep": pa.array(rep, pa.int64())})

    resolved = with_rep.map_batches(_rep_or_self, batch_format="pyarrow")
    joined = hash_join(resolved, sizes, left_on="rep", right_on="rep",
                       left_cols=["doc_id"], right_cols=["sz"],
                       how="left outer", field_types=types)

    def _weights(batch: pa.Table) -> pa.Table:
        sz_col = batch.column("sz").to_numpy(zero_copy_only=False)
        sz = np.where(pa.compute.is_null(batch.column("sz"))
                      .to_numpy(zero_copy_only=False), 1, sz_col) \
            .astype(np.int64)
        return pa.Table.from_pydict({
            "doc_id": pa.array(
                batch.column("doc_id").to_numpy(zero_copy_only=False),
                pa.int64()),
            "class_rep": pa.array(
                batch.column("__key").to_numpy(zero_copy_only=False),
                pa.int64()),
            "weight_permille": pa.array(1000 // sz, pa.int64()),
        })

    return joined.map_batches(_weights, batch_format="pyarrow")


# planted corpus: every doc is in class {4g..4g+3}, so sizes are pure
# id arithmetic (4, except a short tail group)
DUPCLASS_WEIGHTS_PLANTED_SQL = """
WITH s AS (SELECT doc_id, 4 * (doc_id // 4) AS rep FROM documents),
z AS (SELECT rep, count(*)::BIGINT AS sz FROM s GROUP BY 1)
SELECT s.doc_id, s.rep AS class_rep,
       (1000 // z.sz)::BIGINT AS weight_permille
FROM s JOIN z USING (rep) ORDER BY s.doc_id
"""
