"""Anti-entropy table fingerprinting: an order-independent, partition-
grain checksum a replica pair (or a before/after migration pair) can
compare without moving rows.

Per row, a splitmix64 hash of (doc_id, length(text), word count,
codepoint sum) — content-sensitive integer inputs only, so the DuckDB
mirror is bit exact (the UHUGEINT modular-arithmetic chain keeps the
mod-2^64 wraparound).  The codepoint sum makes same-length
substitutions ('abc'->'abd') visible; the fingerprint is still a
PROXY, not a cryptographic digest — a corruption that preserves
length, word count AND the sum of unicode codepoints (e.g. swapping
two characters) is invisible to it.  Row hashes are SUMMED mod 2^64
per doc_id%64 bucket:
addition is commutative, so block order, batching, and shuffle layout
cannot perturb the result — the defining property an anti-entropy
check needs.  Shape: per-block partials (<= 64 rows each) then one
tiny bucket co-group; nothing row-proportional leaves the blocks.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dedup import splitmix64

N_CK_BUCKETS = 64

def _codepoint_sums(col: pa.ChunkedArray) -> np.ndarray:
    """Per-row sum of unicode codepoints, uint64.

    Fixed-width numpy unicode view: padding is \\x00 so the row sum over
    the width axis is exact for any text; mirrored in SQL by
    list_sum(list_transform(string_split(text, ''), x -> ord(x))).
    """
    a = np.array(col.to_pylist(), dtype="U")
    if a.dtype.itemsize == 0:  # all-empty column
        return np.zeros(len(a), np.uint64)
    w = a.dtype.itemsize // 4
    return a.view(np.uint32).reshape(len(a), w).sum(
        axis=1, dtype=np.uint64)


_CK_SCHEMA = pa.schema([
    ("bucket", pa.int64()),
    ("n_rows", pa.int64()),
    ("checksum", pa.int64()),  # uint64 sum viewed as two's complement
])


def _checksum_partial(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return _CK_SCHEMA.empty_table()
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
        .astype(np.uint64)
    n_chars = pc.utf8_length(batch.column("text")).to_numpy(
        zero_copy_only=False).astype(np.uint64)
    n_words = pc.list_value_length(
        pc.split_pattern(batch.column("text"), " ")).to_numpy(
        zero_copy_only=False).astype(np.uint64)
    csum = _codepoint_sums(batch.column("text"))
    key = (ids * np.uint64(1000003) + n_chars * np.uint64(31)
           + n_words + csum * np.uint64(131))
    h = splitmix64(key)
    bucket = (ids % np.uint64(N_CK_BUCKETS)).astype(np.int64)
    order = np.argsort(bucket, kind="stable")
    b = bucket[order]
    starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
    sums = np.add.reduceat(h[order], starts)  # uint64: wraps mod 2^64
    return pa.Table.from_pydict({
        "bucket": pa.array(b[starts], pa.int64()),
        "n_rows": pa.array(np.diff(np.r_[starts, len(b)]), pa.int64()),
        "checksum": pa.array(sums.view(np.int64), pa.int64()),
    }, schema=_CK_SCHEMA)


def _checksum_fold(group: pa.Table) -> pa.Table:
    if group.num_rows == 0:
        return _CK_SCHEMA.empty_table()
    b = group.column("bucket").to_numpy(zero_copy_only=False)
    s = group.column("checksum").to_numpy(zero_copy_only=False) \
        .view(np.uint64)
    n = group.column("n_rows").to_numpy(zero_copy_only=False)
    return pa.Table.from_pydict({
        "bucket": pa.array([int(b[0])], pa.int64()),
        "n_rows": pa.array([int(n.sum())], pa.int64()),
        "checksum": pa.array(np.array([s.sum()], np.uint64)
                             .view(np.int64), pa.int64()),
    }, schema=_CK_SCHEMA)


def table_checksum(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Order-independent per-bucket checksum of (doc_id, text) rows.

    The row fingerprint is a PROXY — splitmix64 over (doc_id, char
    count, word count, codepoint sum), not a digest of the bytes; a
    corruption preserving all four (e.g. transposing two characters)
    is invisible.  See the module docstring."""
    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(_checksum_partial, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("bucket").map_groups(_checksum_fold,
                                      batch_format="pyarrow")


def docs_table_checksum(sf_dir: str) -> ray.data.Dataset:
    from nerfray.sources.parquet import read_parquet_clean
    return table_checksum(read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]))


# z1..z3/h mirror splitmix64 step for step (cf. dedup.LEAKPROOF_PLANTED_SQL);
# the two's-complement CASE maps the uint64 bucket sum onto BIGINT the same
# way numpy .view(int64) does.
CHECKSUM_SQL = f"""
WITH k AS (
  SELECT doc_id % {N_CK_BUCKETS} AS bucket,
         ((doc_id::UBIGINT::UHUGEINT * 1000003
           + length(text)::UHUGEINT * 31
           + length(string_split(text, ' '))::UHUGEINT
           + coalesce(list_sum(list_transform(
               string_split(text, ''), x -> greatest(ord(x), 0))),
               0)::UHUGEINT * 131)
          % 18446744073709551616)::UBIGINT AS key
  FROM documents),
z1 AS (SELECT bucket, ((key::UHUGEINT + 11400714819323198485)
                       % 18446744073709551616)::UBIGINT AS z FROM k),
z2 AS (SELECT bucket, ((xor(z, z >> 30)::UHUGEINT * 13787848793156543929)
                       % 18446744073709551616)::UBIGINT AS z FROM z1),
z3 AS (SELECT bucket, ((xor(z, z >> 27)::UHUGEINT * 10723151780598845931)
                       % 18446744073709551616)::UBIGINT AS z FROM z2),
h AS (SELECT bucket, xor(z, z >> 31) AS h FROM z3),
b AS (SELECT bucket, count(*)::BIGINT AS n_rows,
             -- sum(UHUGEINT) lapses to DOUBLE; HUGEINT sums stay exact
             -- (row hashes < 2^64, so the 128-bit sum can't overflow
             -- below ~2^63 rows per bucket)
             ((sum(h::HUGEINT) % 18446744073709551616)
              + 18446744073709551616) % 18446744073709551616 AS c
      FROM h GROUP BY 1)
SELECT bucket, n_rows,
       (CASE WHEN c >= 9223372036854775808
             THEN c - 18446744073709551616 ELSE c END)::BIGINT AS checksum
FROM b ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# anti-entropy repair: bucket-prefiltered table diff
# ---------------------------------------------------------------------------
#
# The second half of the anti-entropy protocol: compare the per-bucket
# checksums of two table versions (64 + 64 rows at the driver), then
# drill into ONLY the differing buckets with a row-grain full-outer
# compare — added / removed / changed per doc_id.  At 100 TB the
# checksum pass streams both sides once and the repair shuffle carries
# only the damaged buckets' rows; equal buckets never shuffle.  The
# planted v2 (drops, edits, re-keyed additions — pure id arithmetic)
# gives the row-grain classification a FULL SQL oracle.

DIFF_DROP_MOD = 101   # v2 drops doc_id % 101 == 0
DIFF_EDIT_MOD = 97    # v2 appends ' v2' to text of doc_id % 97 == 0
DIFF_ADD_MOD = 103    # v2 adds copies re-keyed to 10^9 + doc_id
DIFF_ADD_BASE = 1_000_000_000

_DIFF_SCHEMA = pa.schema([("doc_id", pa.int64()),
                          ("change", pa.string())])


def planted_docs_v2(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Deterministic second version of the documents table."""

    def _v2(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = ids % DIFF_DROP_MOD != 0
        t = batch.filter(pa.array(keep))
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        text = t.column("text").to_pandas()
        edited = ids % DIFF_EDIT_MOD == 0
        text = text.where(~edited, text + " v2")
        base = pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(text.tolist(), pa.string())})
        add_mask = ids % DIFF_ADD_MOD == 0
        added = pa.Table.from_pydict({
            "doc_id": pa.array(ids[add_mask] + DIFF_ADD_BASE,
                               pa.int64()),
            "text": pa.array(text[add_mask].tolist(), pa.string())})
        return pa.concat_tables([base, added])

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _v2, batch_format="pyarrow", zero_copy_batch=True)


def _row_hash_batch(batch: pa.Table, *, side: int,
                    buckets: np.ndarray | None) -> pa.Table:
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
        .astype(np.uint64)
    n_chars = pc.utf8_length(batch.column("text")).to_numpy(
        zero_copy_only=False).astype(np.uint64)
    n_words = pc.list_value_length(
        pc.split_pattern(batch.column("text"), " ")).to_numpy(
        zero_copy_only=False).astype(np.uint64)
    csum = _codepoint_sums(batch.column("text"))
    h = splitmix64(ids * np.uint64(1000003) + n_chars * np.uint64(31)
                   + n_words + csum * np.uint64(131))
    bk = (ids % np.uint64(N_CK_BUCKETS)).astype(np.int64)
    mask = np.ones(len(ids), bool) if buckets is None \
        else np.isin(bk, buckets)
    return pa.Table.from_pydict({
        "doc_id": pa.array(ids[mask].view(np.int64), pa.int64()),
        "h": pa.array(h[mask].view(np.int64), pa.int64()),
        "side": pa.array(np.full(int(mask.sum()), side, np.int8),
                         pa.int8()),
        "hb": pa.array((bk[mask] & 63).astype(np.int32), pa.int32()),
    })


def _diff_bucket(group: pa.Table) -> pa.Table:
    if group.num_rows == 0:
        return _DIFF_SCHEMA.empty_table()
    ids = group.column("doc_id").to_numpy(zero_copy_only=False)
    h = group.column("h").to_numpy(zero_copy_only=False)
    side = group.column("side").to_numpy(zero_copy_only=False)
    order = np.lexsort((side, ids))
    i_s, h_s, s_s = ids[order], h[order], side[order]
    starts = np.flatnonzero(np.r_[True, i_s[1:] != i_s[:-1]])
    cnt = np.diff(np.r_[starts, len(i_s)])
    if cnt.max(initial=0) > 2:
        bad = i_s[starts[cnt > 2]][:5]
        raise ValueError(
            f"bucket_diff requires doc_id unique per side; ids seen "
            f">2 times across both sides: {bad.tolist()}")
    out_id, out_ch = [], []
    one = cnt == 1
    # present on one side only
    solo_ids = i_s[starts[one]]
    solo_side = s_s[starts[one]]
    out_id.append(solo_ids[solo_side == 0])
    out_ch.extend(["removed"] * int((solo_side == 0).sum()))
    out_id.append(solo_ids[solo_side == 1])
    out_ch.extend(["added"] * int((solo_side == 1).sum()))
    # both sides: changed iff row hashes differ.  A same-side pair
    # (duplicate key within one table) violates the unique-key
    # precondition — raise rather than misreport it as un/changed.
    both = starts[cnt == 2]
    if np.any(s_s[both] == s_s[both + 1]):
        bad = i_s[both][s_s[both] == s_s[both + 1]][:5]
        raise ValueError(
            f"bucket_diff requires doc_id unique per side; duplicate "
            f"ids within one side: {bad.tolist()}")
    changed = h_s[both] != h_s[both + 1]
    out_id.append(i_s[both][changed])
    out_ch.extend(["changed"] * int(changed.sum()))
    return pa.Table.from_pydict({
        "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
        "change": pa.array(out_ch, pa.string()),
    }, schema=_DIFF_SCHEMA)


def bucket_diff(a: ray.data.Dataset, b: ray.data.Dataset) \
        -> ray.data.Dataset:
    """Row-grain diff of two table versions, prefiltered to the buckets
    whose anti-entropy checksums disagree.

    Precondition: ``doc_id`` is unique within each side (the anti-
    entropy protocol compares keyed table versions).  Duplicate keys
    raise rather than silently misclassify.  Change detection uses the
    proxy fingerprint (length, word count, codepoint sum) — see the
    module docstring for its blind spot."""
    ca = {r["bucket"]: (r["checksum"], r["n_rows"])
          for r in table_checksum(a).take_all()}   # <= 64 rows
    cb = {r["bucket"]: (r["checksum"], r["n_rows"])
          for r in table_checksum(b).take_all()}
    damaged = sorted(k for k in set(ca) | set(cb)
                     if ca.get(k) != cb.get(k))
    if not damaged:
        return ray.data.from_arrow(_DIFF_SCHEMA.empty_table())
    buckets = np.asarray(damaged, np.int64)
    rows_a = a.select_columns(["doc_id", "text"]).map_batches(
        _row_hash_batch, fn_kwargs={"side": 0, "buckets": buckets},
        batch_format="pyarrow", zero_copy_batch=True)
    rows_b = b.select_columns(["doc_id", "text"]).map_batches(
        _row_hash_batch, fn_kwargs={"side": 1, "buckets": buckets},
        batch_format="pyarrow", zero_copy_batch=True)
    return rows_a.union(rows_b).groupby("hb").map_groups(
        _diff_bucket, batch_format="pyarrow")


def docs_bucket_diff(sf_dir: str) -> ray.data.Dataset:
    import os

    from nerfray.sources.parquet import read_parquet_clean
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return bucket_diff(docs, planted_docs_v2(docs))


BUCKET_DIFF_SQL = f"""
WITH v1 AS (SELECT doc_id, text FROM documents),
v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % {DIFF_EDIT_MOD} = 0 THEN text || ' v2'
              ELSE text END AS text
  FROM documents WHERE doc_id % {DIFF_DROP_MOD} != 0
  UNION ALL
  SELECT doc_id + {DIFF_ADD_BASE},
         CASE WHEN doc_id % {DIFF_EDIT_MOD} = 0 THEN text || ' v2'
              ELSE text END
  FROM documents
  WHERE doc_id % {DIFF_DROP_MOD} != 0 AND doc_id % {DIFF_ADD_MOD} = 0)
SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
       CASE WHEN v2.doc_id IS NULL THEN 'removed'
            WHEN v1.doc_id IS NULL THEN 'added'
            ELSE 'changed' END AS change
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
WHERE v2.doc_id IS NULL OR v1.doc_id IS NULL
   OR length(v1.text) != length(v2.text)
   OR length(string_split(v1.text, ' '))
      != length(string_split(v2.text, ' '))
   OR coalesce(list_sum(list_transform(string_split(v1.text, ''),
                                       x -> greatest(ord(x), 0))), 0)
      != coalesce(list_sum(list_transform(string_split(v2.text, ''),
                                          x -> greatest(ord(x), 0))), 0)
ORDER BY doc_id
"""
