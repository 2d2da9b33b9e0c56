"""Exact set-similarity self-join (word-3-gram shingle-set Jaccard >=
tau) via df-ordered prefix filtering — the EXACT counterpart to the
probabilistic MinHash pipeline in ``ops/dedup.py`` (PPJoin family:
Chaudhuri et al., ICDE'06; Bayardo et al., WWW'07; public algorithms,
original implementation).  Word 3-grams, not single words: the
synthetic docs share most of their vocabulary (92k of 125k pairs pass
tau=0.5 on word sets), while 3-gram sets isolate exactly the 25
genuine near-dup pairs — the same selectivity trade production dedup
makes.

Completeness is a theorem, not a probability: order every doc's token
set ascending by (global df, token); with prefix length
``p = n - ceil(tau*n) + 1`` the globally smallest common token of any
pair with Jaccard >= tau lies in BOTH prefixes (the suffix holds only
``ceil(tau*n) - 1`` tokens, fewer than the required overlap
``ceil(tau*n)``).  So candidates = docs sharing a prefix token cover
all true pairs, and the exact verify keeps the answer equal to brute
force — hence the full DuckDB oracle over raw documents (no planting).

Scale shape (all bucket-vectorized, dispatch-grain rule):
  1. flat (token-hash, doc, size) rows — one per DISTINCT word per doc
     (the same grain the word-DF combiner ships; text never shuffles);
  2. df inside a 64-way token-hash co-group (rarest-first ordering is
     what keeps hot stopwords OUT of prefixes on zipfian corpora);
  3. prefix selection inside a doc-hash co-group (vectorized segment
     sweep);
  4. candidate pairs per prefix-token run, capped with the repo's
     measurable drop accounting (drops are themselves SQL-oracled:
     prefix membership is fully SQL-derivable);
  5. pair distinct + the two co-group verify joins shared with
     ``minhash_dedup_pairs`` (driver never holds texts or token sets).

Tokens are sha256-prefix hashes (``dedup.sha64``) so every stage —
df, ordering, prefixes, Jaccard — is byte-identical to the SQL mirror.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dedup import (N_HASH_BUCKETS, _bucket_drop_rows, _dropped_pairs,
                    _key_bucket, _pairs_as_join_left,
                    _shingles_as_join_right, _attach_a, _verify_b, sha64)

SETJOIN_TAU = 0.5
SETJOIN_CAP = 500           # ids per prefix-token run before drop

_FLAT_SCHEMA = pa.schema([("h", pa.uint64()), ("doc_id", pa.int64()),
                          ("size", pa.int64())])
_DF_SCHEMA = pa.schema([("doc_id", pa.int64()), ("h", pa.uint64()),
                        ("df", pa.int64()), ("size", pa.int64())])


def _doc_hashsets(batch: pa.Table) -> list[np.ndarray]:
    """Distinct sha64-hashed word-3-gram shingles per doc (docs under
    3 words have the empty set and can never join — mirrored by the
    oracle's ``u > 0`` guard)."""
    out = []
    for t in batch.column("text").to_pylist():
        ws = t.split(" ")
        sh = {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}
        out.append(np.array(sorted(sha64(s) for s in sh),
                            dtype=np.uint64))
    return out


def _flat_hash_rows(batch: pa.Table) -> pa.Table:
    """(h, doc_id, size): one row per distinct token hash per doc."""
    sets = _doc_hashsets(batch)
    if not sets:
        return _FLAT_SCHEMA.empty_table()
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    sizes = np.array([len(s) for s in sets], dtype=np.int64)
    return pa.Table.from_pydict({
        "h": pa.array(np.concatenate(sets), pa.uint64()),
        "doc_id": pa.array(np.repeat(ids, sizes), pa.int64()),
        "size": pa.array(np.repeat(sizes, sizes), pa.int64()),
    }, schema=_FLAT_SCHEMA)


def _hashset_table(batch: pa.Table) -> pa.Table:
    """(key, sh) rows for the shared co-group verify joins."""
    sets = _doc_hashsets(batch)
    return pa.Table.from_pydict({
        "key": batch.column("doc_id"),
        "sh": pa.array([s.tolist() for s in sets], pa.list_(pa.uint64())),
    })


def _h_bucket(batch: pa.Table) -> pa.Table:
    hb = pc.cast(pc.bit_wise_and(batch.column("h"),
                                 np.uint64(N_HASH_BUCKETS - 1)), pa.int32())
    return batch.append_column("hb", hb)


def _doc_bucket(batch: pa.Table) -> pa.Table:
    hb = pc.cast(pc.bit_wise_and(batch.column("doc_id"),
                                 N_HASH_BUCKETS - 1), pa.int32())
    return batch.append_column("hb", hb)


def _df_bucket(group: pa.Table) -> pa.Table:
    """Global df per token hash — the bucket holds EVERY row of its
    tokens, so a local count IS the global count (single exchange)."""
    if group.num_rows == 0:
        return _DF_SCHEMA.empty_table()
    h = group.column("h").to_numpy(zero_copy_only=False)
    _, inv, cnt = np.unique(h, return_inverse=True, return_counts=True)
    return pa.Table.from_pydict({
        "doc_id": group.column("doc_id"),
        "h": group.column("h"),
        "df": pa.array(cnt[inv], pa.int64()),
        "size": group.column("size"),
    }, schema=_DF_SCHEMA)


def _prefix_bucket(group: pa.Table, *, tau: float) -> pa.Table:
    """Keep each doc's first ``n - ceil(tau*n) + 1`` tokens in (df, h)
    ascending order — vectorized segment sweep over the bucket's docs."""
    if group.num_rows == 0:
        return _FLAT_SCHEMA.empty_table()
    d = group.column("doc_id").to_numpy(zero_copy_only=False)
    h = group.column("h").to_numpy(zero_copy_only=False)
    df = group.column("df").to_numpy(zero_copy_only=False)
    sz = group.column("size").to_numpy(zero_copy_only=False)
    order = np.lexsort((h, df, d))
    d_s, h_s, sz_s = d[order], h[order], sz[order]
    new_seg = np.r_[True, d_s[1:] != d_s[:-1]]
    starts = np.flatnonzero(new_seg)
    seg = np.cumsum(new_seg) - 1
    pos = np.arange(len(d_s)) - starts[seg]
    p = sz_s - np.ceil(tau * sz_s).astype(np.int64) + 1
    keep = pos < p
    return pa.Table.from_pydict({
        "h": pa.array(h_s[keep], pa.uint64()),
        "doc_id": pa.array(d_s[keep], pa.int64()),
        "size": pa.array(sz_s[keep], pa.int64()),
    }, schema=_FLAT_SCHEMA)


def _cand_bucket(group: pa.Table, *, cap: int) -> pa.Table:
    """All-pairs within each prefix-token run (df ordering keeps runs
    short on zipfian data; a degenerate run is capped with the drop
    count surfaced by ``setjoin_drop_counts``)."""
    rows = sorted(zip(group.column("h").to_pylist(),
                      group.column("doc_id").to_pylist()))
    a: list = []
    b: list = []
    i = 0
    while i < len(rows):
        j = i
        while j < len(rows) and rows[j][0] == rows[i][0]:
            j += 1
        ids = [r[1] for r in rows[i:j]]
        if len(ids) > cap:
            import logging
            logging.getLogger(__name__).warning(
                "setjoin prefix run overflow: %d ids, dropping %d pairs",
                len(ids), _dropped_pairs(len(ids), cap))
            ids = ids[:cap]
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a.append(min(ids[x], ids[y]))
                b.append(max(ids[x], ids[y]))
        i = j
    return pa.Table.from_pydict({"doc_a": pa.array(a, pa.int64()),
                                 "doc_b": pa.array(b, pa.int64())})


def setsim_candidates(docs: ray.data.Dataset, *,
                      tau: float = SETJOIN_TAU,
                      cap: int = SETJOIN_CAP) -> ray.data.Dataset:
    """Distinct candidate pairs from df-ordered prefix runs."""
    flat = docs.select_columns(["doc_id", "text"]).map_batches(
        _flat_hash_rows, batch_format="pyarrow", zero_copy_batch=True)
    with_df = flat.map_batches(_h_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_df_bucket, batch_format="pyarrow")
    prefixes = with_df.map_batches(_doc_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_prefix_bucket, fn_kwargs={"tau": tau},
                                  batch_format="pyarrow")
    pairs = prefixes.map_batches(_h_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_cand_bucket, fn_kwargs={"cap": cap},
                                  batch_format="pyarrow")
    return pairs.groupby(["doc_a", "doc_b"]).count() \
        .drop_columns(["count()"])


def setsim_join_pairs(docs: ray.data.Dataset, *,
                      tau: float = SETJOIN_TAU) -> ray.data.Dataset:
    """(doc_a, doc_b, jaccard) for every pair with word-set Jaccard >=
    tau — exact, via prefix-filtered candidates + the shared co-group
    verify joins (only (id, hash-set) rows shuffle, never text)."""
    cands = setsim_candidates(docs, tau=tau)
    tok = docs.select_columns(["doc_id", "text"]).map_batches(
        _hashset_table, batch_format="pyarrow").materialize()
    j1 = cands.map_batches(_pairs_as_join_left, fn_kwargs={"side": "doc_a"},
                           batch_format="pyarrow") \
        .union(tok.map_batches(_shingles_as_join_right,
                               batch_format="pyarrow")) \
        .map_batches(_key_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_attach_a, batch_format="pyarrow")
    return j1.map_batches(_pairs_as_join_left, fn_kwargs={"side": "doc_b"},
                          batch_format="pyarrow") \
        .union(tok.map_batches(_shingles_as_join_right,
                               batch_format="pyarrow")) \
        .map_batches(_key_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(
            _verify_b, fn_kwargs={"threshold": tau},
            batch_format="pyarrow")


def setjoin_drop_counts(docs: ray.data.Dataset, *,
                        tau: float = SETJOIN_TAU,
                        cap: int = SETJOIN_CAP) -> ray.data.Dataset:
    """(n_ids, n_dropped_pairs) per overflowing prefix-token run.
    Unlike the LSH drop channels this one has an exact SQL mirror
    (prefix membership is deterministic arithmetic over df and token
    order) — pinned by the planted-overflow pytest; the driver row is
    rows-only because an empty Dataset loses its schema in
    to_pandas."""
    flat = docs.select_columns(["doc_id", "text"]).map_batches(
        _flat_hash_rows, batch_format="pyarrow", zero_copy_batch=True)
    with_df = flat.map_batches(_h_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_df_bucket, batch_format="pyarrow")
    prefixes = with_df.map_batches(_doc_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_prefix_bucket, fn_kwargs={"tau": tau},
                                  batch_format="pyarrow")
    return prefixes.map_batches(_h_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(
            _bucket_drop_rows, fn_kwargs={"key_cols": ["h"], "cap": cap},
            batch_format="pyarrow")


# -- query surface ----------------------------------------------------------


def sim_setjoin(sf_dir: str) -> ray.data.Dataset:
    import os

    from nerfray.sources.parquet import read_parquet_clean
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return setsim_join_pairs(docs)


def sim_setjoin_drops(sf_dir: str) -> ray.data.Dataset:
    import os

    from nerfray.sources.parquet import read_parquet_clean
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return setjoin_drop_counts(docs)


# brute force over the same sha256-prefix hash sets; i/u >= tau is the
# integer-exact threshold test (u << 2^53 keeps the float division's
# rounding inside the decision margin 1/(2u))
SETJOIN_SQL = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
d AS (
  SELECT doc_id, list_distinct(list_transform(
      generate_series(1, len(ws) - 2),
      i -> substr(sha256(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]),
                  1, 16))) AS hs
  FROM w
),
p AS (
  SELECT doc_a, doc_b, i, la + lb - i AS u FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           len(list_intersect(a.hs, b.hs)) AS i,
           len(a.hs) AS la, len(b.hs) AS lb
    FROM d a JOIN d b ON a.doc_id < b.doc_id)
)
SELECT doc_a, doc_b, i / CAST(u AS DOUBLE) AS jaccard
FROM p WHERE u > 0 AND i >= {SETJOIN_TAU} * u ORDER BY doc_a, doc_b
"""

# the drop channel's oracle re-derives prefix membership in SQL: df per
# token hash, per-doc (df, h) order, row_number <= n - ceil(tau*n) + 1
SETJOIN_DROPS_SQL = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
wd AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
      generate_series(1, len(ws) - 2),
      i -> substr(sha256(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]),
                  1, 16)))) AS h
  FROM w
),
sz AS (SELECT doc_id, count(*) AS n FROM wd GROUP BY doc_id),
df AS (SELECT h, count(*) AS df FROM wd GROUP BY h),
ordered AS (
  SELECT wd.doc_id, wd.h,
         row_number() OVER (PARTITION BY wd.doc_id
                            ORDER BY df.df, wd.h) AS pos, sz.n
  FROM wd JOIN df USING (h) JOIN sz USING (doc_id)
),
pref AS (SELECT doc_id, h FROM ordered
         WHERE pos <= n - ceil({SETJOIN_TAU} * n) + 1),
runs AS (SELECT h, count(*) AS n_ids FROM pref GROUP BY h)
SELECT n_ids::BIGINT AS n_ids,
       (n_ids * (n_ids - 1) // 2
        - {SETJOIN_CAP} * ({SETJOIN_CAP} - 1) // 2)::BIGINT
         AS n_dropped_pairs
FROM runs WHERE n_ids > {SETJOIN_CAP} ORDER BY n_ids
"""
