"""Distributed Bloom filter over document content — the 100-TB dedup
PRE-FILTER: a fixed-size bit array (m bits, k sha-derived positions
per doc) that answers "definitely new" / "maybe seen" without touching
the corpus.  An ingest pipeline probes the filter first and only
anti-joins the "maybe" rows against the sha catalog, so the join's
shuffle shrinks from every new row to the (tiny) maybe set.

Shape: per-block partials OR their positions into <= m/64 packed
uint64 words, the ONLY shuffle moves (word_idx, bits) integer rows,
and a word-grain co-group ORs the partials.  The finished filter is
m/8 bytes (8 KiB at the default 2^16 bits) — broadcast whole to the
probe stage via fn_kwargs, never rebuilt per batch.

Oracle design (the repo's sha-mirror pattern, cf. ``ops/sketch.py``):
positions are 8-hex-char slices of sha256(text) mod m, so BOTH the
packed register table and every probe verdict are exactly recomputable
in DuckDB (HUGEINT bit_or, mapped to signed int64 two's complement to
match numpy's uint64 view).  At extreme scale swap sha256 for a cheap
64-bit mixer (same structure, no SQL mirror).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

M_BITS = 1 << 16           # 8 KiB filter; ~0.5% FP at 5k docs, k=4
K_HASHES = 4
N_WORDS = M_BITS // 64


def _positions(texts: list[str]) -> np.ndarray:
    """(n, k) uint64 bit positions: 8-hex-char sha slices mod m."""
    out = np.empty((len(texts), K_HASHES), np.uint64)
    for i, t in enumerate(texts):
        h = hashlib.sha256(t.encode()).hexdigest()
        for j in range(K_HASHES):
            out[i, j] = int(h[8 * j: 8 * j + 8], 16) % M_BITS
    return out


def _word_partial(batch: pa.Table) -> pa.Table:
    """Per-block packed words: every position in the block ORed into
    its word — at most min(k*rows, m/64) rows leave the block."""
    texts = batch.column("text").to_pylist()
    if not texts:
        return pa.Table.from_pydict({
            "word_idx": pa.array([], pa.int64()),
            "bits": pa.array([], pa.int64()),
            "hb": pa.array([], pa.int32())})
    p = np.unique(_positions(texts).ravel())
    w = (p >> np.uint64(6)).astype(np.int64)
    b = np.uint64(1) << (p & np.uint64(63))
    starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
    bits = np.bitwise_or.reduceat(b, starts)
    wi = w[starts]
    return pa.Table.from_pydict({
        "word_idx": pa.array(wi, pa.int64()),
        "bits": pa.array(bits.view(np.int64), pa.int64()),
        "hb": pa.array((wi & 15).astype(np.int32), pa.int32())})


def _or_group(group: pa.Table) -> pa.Table:
    out_schema = pa.schema([("word_idx", pa.int64()),
                            ("bits", pa.int64())])
    if group.num_rows == 0:
        return out_schema.empty_table()
    w = group.column("word_idx").to_numpy(zero_copy_only=False)
    b = group.column("bits").to_numpy(zero_copy_only=False) \
        .astype(np.int64).view(np.uint64)
    order = np.argsort(w, kind="stable")
    w_s, b_s = w[order], b[order]
    starts = np.flatnonzero(np.r_[True, w_s[1:] != w_s[:-1]])
    merged = np.bitwise_or.reduceat(b_s, starts)
    return pa.Table.from_pydict({
        "word_idx": pa.array(w_s[starts], pa.int64()),
        "bits": pa.array(merged.view(np.int64), pa.int64()),
    }, schema=out_schema)


def build_bloom(corpus: ray.data.Dataset) -> ray.data.Dataset:
    """(word_idx, bits): the packed filter as a Dataset — only words
    with at least one set bit appear."""
    return corpus.select_columns(["text"]) \
        .map_batches(_word_partial, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("hb").map_groups(_or_group, batch_format="pyarrow")


def bloom_array(corpus: ray.data.Dataset) -> np.ndarray:
    """Dense m/64-word uint64 array (the broadcastable 8 KiB filter).
    The take_all is bounded by m/64 rows REGARDLESS of corpus size —
    the aggregate-to-small pattern, not a data-sized materialize."""
    dense = np.zeros(N_WORDS, np.uint64)
    for r in build_bloom(corpus).take_all():
        dense[r["word_idx"]] = np.uint64(np.int64(r["bits"]))
    return dense


def probe_bloom(new_docs: ray.data.Dataset,
                filt: np.ndarray) -> ray.data.Dataset:
    """(doc_id, hit): hit=1 iff ALL k positions are set — 'maybe in
    corpus'. hit=0 is a certainty (no false negatives)."""

    def _probe(batch: pa.Table, *, filt: np.ndarray) -> pa.Table:
        texts = batch.column("text").to_pylist()
        if not texts:
            return pa.Table.from_pydict({
                "doc_id": pa.array([], pa.int64()),
                "hit": pa.array([], pa.int64())})
        p = _positions(texts)
        w = (p >> np.uint64(6)).astype(np.int64)
        b = p & np.uint64(63)
        set_ = (filt[w] >> b) & np.uint64(1)
        hit = set_.all(axis=1).astype(np.int64)
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "hit": pa.array(hit, pa.int64())})

    return new_docs.select_columns(["doc_id", "text"]).map_batches(
        _probe, fn_kwargs={"filt": filt}, batch_format="pyarrow",
        zero_copy_batch=True)


# ---------------------------------------------------------------------------
# query surface + SQL mirrors
# ---------------------------------------------------------------------------


def corpus_bloom_query(sf_dir: str) -> ray.data.Dataset:
    import os

    from nerfray.sources.parquet import read_parquet_clean
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["text"])
    return build_bloom(docs)


def bloom_probe_query(sf_dir: str) -> ray.data.Dataset:
    """The planted ingest batch (dedup.planted_new_batch) probed
    against the corpus filter: every verbatim copy MUST hit; fresh
    rows hit only on (SQL-predictable) false positives."""
    import os

    from nerfray.sources.parquet import read_parquet_clean

    from .dedup import planted_new_batch
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return probe_bloom(planted_new_batch(docs), bloom_array(docs))


_POS = (f"('0x' || substr(sha256(text), 1 + 8 * i, 8))::UBIGINT "
        f"% {M_BITS}")
_SERIES = f"unnest(generate_series(0, {K_HASHES - 1})) AS t(i)"

BLOOM_TABLE_SQL = f"""
WITH pos AS (
  SELECT DISTINCT {_POS} AS p FROM documents, {_SERIES}
),
words AS (
  SELECT (p // 64)::BIGINT AS word_idx,
         bit_or(1::HUGEINT << (p % 64)::INTEGER) AS v
  FROM pos GROUP BY 1
)
SELECT word_idx,
       (CASE WHEN v >= 9223372036854775808
             THEN v - 18446744073709551616 ELSE v END)::BIGINT AS bits
FROM words ORDER BY word_idx
"""

BLOOM_PROBE_SQL = f"""
WITH corpus_pos AS (
  SELECT DISTINCT {_POS} AS p FROM documents, {_SERIES}
),
newb AS (
  SELECT doc_id + 1000000 AS doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text ELSE text || ' v2' END AS text
  FROM documents
),
new_pos AS (
  SELECT doc_id, {_POS} AS p FROM newb, {_SERIES}
)
SELECT n.doc_id,
       min(CASE WHEN c.p IS NULL THEN 0 ELSE 1 END)::BIGINT AS hit
FROM new_pos n LEFT JOIN corpus_pos c ON c.p = n.p
GROUP BY n.doc_id ORDER BY n.doc_id
"""


# ---------------------------------------------------------------------------
# persisted streaming-dedup state: filter + sha catalog, versioned
# ---------------------------------------------------------------------------
#
# The stateful shape of continuous-ingest dedup: the Bloom filter and
# the sha catalog LIVE BETWEEN BATCHES.  Each ingest (1) probes the
# persisted filter — "definitely new" rows skip the join entirely,
# (2) exactly anti-joins only the "maybe" rows against the persisted
# catalog (so false positives cannot drop rows), (3) appends the batch
# survivors to the catalog and ORs their bits into the filter, and
# (4) commits both as a NEW immutable version (temp + rename manifest,
# same discipline as state/manifest.py) — a crashed ingest leaves the
# previous version intact and re-runs idempotently.  Output per batch
# is byte-identical to the stateless incremental_exact_dedup (no false
# negatives + exact verification of positives = the filter is
# semantics-invisible), which is exactly why it shares that oracle.

import json as _json
import os as _os
import tempfile as _tempfile


def _positions_from_shas(shas: list[str]) -> np.ndarray:
    """(n, k) bit positions from sha256 HEXDIGESTS (the text's sha IS
    the position source, so state updates never need the text)."""
    out = np.empty((len(shas), K_HASHES), np.uint64)
    for i, h in enumerate(shas):
        for j in range(K_HASHES):
            out[i, j] = int(h[8 * j: 8 * j + 8], 16) % M_BITS
    return out


def _state_manifest(state_dir: str) -> dict | None:
    p = _os.path.join(state_dir, "manifest.json")
    if not _os.path.exists(p):
        return None
    with open(p) as f:
        return _json.load(f)


def _commit_state(state_dir: str, version: int, filt: np.ndarray,
                  catalog_path: str, n_catalog: int) -> None:
    fd, tmp = _tempfile.mkstemp(dir=state_dir)
    with _os.fdopen(fd, "w") as f:
        _json.dump({"version": version, "filter": f"filter-v{version}.npy",
                    "catalog": catalog_path, "n_catalog": n_catalog},
                   f, sort_keys=True)
    np.save(_os.path.join(state_dir, f"filter-v{version}.npy"), filt)
    _os.replace(tmp, _os.path.join(state_dir, "manifest.json"))


def init_dedup_state(corpus: ray.data.Dataset, state_dir: str) -> None:
    """Version-1 state: the corpus filter plus its sha catalog (one
    64-char row per doc; the only corpus-sized artifact, written once,
    distributed)."""
    import pyarrow.dataset  # noqa: F401
    _os.makedirs(state_dir, exist_ok=True)
    from .dedup import _sha_batch
    cat_dir = _os.path.join(state_dir, "catalog-v1")
    corpus.map_batches(_sha_batch, batch_format="pyarrow",
                       zero_copy_batch=True) \
        .select_columns(["text_sha"]).write_parquet(cat_dir)
    _commit_state(state_dir, 1, bloom_array(corpus), "catalog-v1", -1)


def ingest_batch(new_docs: ray.data.Dataset, state_dir: str
                 ) -> tuple[ray.data.Dataset, dict]:
    """One streaming-dedup step against the persisted state. Returns
    (survivors (text_sha, doc_id), stats); commits state version+1."""
    from .dedup import _sha_batch
    from .joins import hash_join

    m = _state_manifest(state_dir)
    filt = np.load(_os.path.join(state_dir, m["filter"]))

    def _sha_probe(batch: pa.Table) -> pa.Table:
        t = _sha_batch(batch)
        shas = t.column("text_sha").to_pylist()
        if not shas:
            return t.append_column("hit", pa.array([], pa.int64()))
        p = _positions_from_shas(shas)
        w = (p >> np.uint64(6)).astype(np.int64)
        b = p & np.uint64(63)
        hit = ((filt[w] >> b) & np.uint64(1)).all(axis=1) \
            .astype(np.int64)
        return t.append_column("hit", pa.array(hit, pa.int64()))

    probed = new_docs.map_batches(_sha_probe, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()
    n_maybe = probed.filter(expr="hit == 1").count()
    stats = {"n_new": probed.count(), "n_maybe": n_maybe}

    catalog = ray.data.read_parquet(
        _os.path.join(state_dir, m["catalog"]))
    verified = hash_join(
        probed.filter(expr="hit == 1"), catalog,
        left_on="text_sha", right_on="text_sha",
        left_cols=["doc_id"], right_cols=[], how="left anti")

    # batch-level rename: Dataset.rename_columns is a lazily-sampled
    # Project, so the union below can surface pre-rename (__key) and
    # post-rename (text_sha) bundles side by side — the executor's
    # mixed-schema RefBundle warning (cf. joins._rename_batches)
    def _as_sha(batch):
        return batch.rename_columns(
            ["text_sha" if c == "__key" else c
             for c in batch.column_names]) \
            .select(["text_sha", "doc_id"])

    verified = verified.map_batches(_as_sha, batch_format="pyarrow",
                                    zero_copy_batch=True)
    certain = probed.filter(expr="hit == 0") \
        .select_columns(["text_sha", "doc_id"])
    survivors = verified.union(certain) \
        .groupby("text_sha").min("doc_id") \
        .rename_columns({"min(doc_id)": "doc_id"}).materialize()

    # commit version+1: catalog += survivor shas; filter |= their bits
    v = m["version"] + 1
    new_cat = _os.path.join(state_dir, f"catalog-v{v}")
    _os.makedirs(new_cat, exist_ok=True)
    old_root = _os.path.join(state_dir, m["catalog"])
    k = 0
    for r, _d, fs in _os.walk(old_root):
        for f in sorted(fs):
            if f.endswith(".parquet"):
                _os.link(_os.path.join(r, f),  # hard link: O(1), no copy
                         _os.path.join(new_cat, f"prev-{k}.parquet"))
                k += 1
    survivors.select_columns(["text_sha"]) \
        .write_parquet(_os.path.join(new_cat, "delta"))

    # filter delta computed distributed (word partials over survivor
    # shas -> OR co-group); the driver sees <= m/64 packed words, never
    # the survivor set
    def _sha_word_partial(batch: pa.Table) -> pa.Table:
        shas_b = batch.column("text_sha").to_pylist()
        if not shas_b:
            return pa.Table.from_pydict({
                "word_idx": pa.array([], pa.int64()),
                "bits": pa.array([], pa.int64()),
                "hb": pa.array([], pa.int32())})
        p = np.unique(_positions_from_shas(shas_b).ravel())
        w = (p >> np.uint64(6)).astype(np.int64)
        b = np.uint64(1) << (p & np.uint64(63))
        starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
        bits = np.bitwise_or.reduceat(b, starts)
        wi = w[starts]
        return pa.Table.from_pydict({
            "word_idx": pa.array(wi, pa.int64()),
            "bits": pa.array(bits.view(np.int64), pa.int64()),
            "hb": pa.array((wi % 64).astype(np.int32), pa.int32())})

    filt2 = filt.copy()
    for r in survivors.select_columns(["text_sha"]) \
            .map_batches(_sha_word_partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .groupby("hb").map_groups(_or_group,
                                      batch_format="pyarrow") \
            .take_all():
        filt2[r["word_idx"]] |= np.uint64(np.int64(r["bits"]))
    _commit_state(state_dir, v, filt2, f"catalog-v{v}", -1)
    return survivors, stats
