"""Anti-entropy table fingerprinting: an order-independent, partition-
grain checksum a replica pair (or a before/after migration pair) can
compare without moving rows.

Per row, a splitmix64 hash of (doc_id, length(text), word count) —
content-sensitive integer inputs only, so the DuckDB mirror is bit
exact (the UHUGEINT modular-arithmetic chain keeps the mod-2^64
wraparound).  Row hashes are SUMMED mod 2^64 per doc_id%64 bucket:
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
    key = ids * np.uint64(1000003) + n_chars * np.uint64(31) + n_words
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
           + length(string_split(text, ' '))::UHUGEINT)
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
