"""Shared key→bucket hashing for the co-group shuffle operators
(hash join, grouped quantiles) — one implementation so skew-tuning the
shift/bucket count cannot silently diverge the operators' exchanges."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# Knuth multiplicative hash on int64 keys — cheap, stable, and spreads
# consecutive keys (orderkey runs) across buckets.
HASH_MULT = np.uint64(0x9E3779B97F4A7C15)


def key_bucket(keys: pa.ChunkedArray, n_buckets: int) -> pa.Array:
    """int32 bucket ids for a key column (integer or string). Keys must
    be non-null: a null in an int64 column silently degrades the numpy
    view to float64 (NaN + >2^53 precision loss), corrupting bucket
    assignment — fail loudly instead."""
    if keys.null_count:
        raise ValueError(
            f"join/bucket keys must be non-null ({keys.null_count} null "
            "rows) — drop or fill null-key rows first")
    if pa.types.is_integer(keys.type):
        k = keys.to_numpy(zero_copy_only=False).astype(np.uint64)
        hb = ((k * HASH_MULT) >> np.uint64(40)) % np.uint64(n_buckets)
    else:  # string / binary keys: stable object hash
        import pandas as pd
        arr = np.asarray(keys.to_pylist(), dtype=object)
        hb = pd.util.hash_array(arr) % np.uint64(n_buckets)
    return pa.array(hb.astype(np.int32), pa.int32())


def lowest_k_rows(ds, k: int, tiebreak: str) -> list[dict]:
    """The k lowest-``tiebreak`` rows of a Dataset, with the driver-side
    collection bounded by k (NOT blocks x k): per-block local min-k
    combiner -> 64-way merge (distributes the second level) -> one final
    min-k group -> take_all of exactly <= k rows, sorted by tiebreak.
    The deterministic-sample primitive behind k-means init and
    sample-sort boundaries."""
    import pyarrow.compute as pc
    import ray.data  # noqa: F401

    def _local(batch: pa.Table) -> pa.Table:
        tb = batch.column(tiebreak).to_numpy(zero_copy_only=False)
        order = np.argsort(tb, kind="stable")[:k]
        return batch.take(pa.array(order))

    def _mid_bucket(batch: pa.Table) -> pa.Table:
        tb = batch.column(tiebreak).to_numpy(zero_copy_only=False)
        hb = (tb % 64).astype(np.int32)
        return batch.append_column("hb", pa.array(hb, pa.int32()))

    def _merge(group: pa.Table) -> pa.Table:
        t = group.drop_columns(
            [c for c in ("hb", "g") if c in group.column_names])
        tb = t.column(tiebreak).to_numpy(zero_copy_only=False)
        order = np.argsort(tb, kind="stable")[:k]
        out = t.take(pa.array(order))
        return out.append_column(
            "g", pa.array(np.zeros(out.num_rows, np.int32), pa.int32()))

    rows = ds.map_batches(_local, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .map_batches(_mid_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_merge, batch_format="pyarrow") \
        .groupby("g").map_groups(_merge, batch_format="pyarrow") \
        .drop_columns(["g"]).take_all()
    rows.sort(key=lambda r: r[tiebreak])
    return rows[:k]
