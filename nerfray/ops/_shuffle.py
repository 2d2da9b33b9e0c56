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
