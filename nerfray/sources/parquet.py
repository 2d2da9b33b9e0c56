"""Schema-clean parquet reading.

pandas-written parquet embeds a ``b'pandas'`` schema-metadata blob, and
a ``pa.Schema`` that carries metadata is UNHASHABLE (``hash(schema)``
raises ``unhashable type: 'dict'``). Ray Data's shuffle-reduce path
dedupes block schemas with ``set(schemas)`` and logs ``Failed to hash
the schemas (for deduplication)`` per reduce task when that fails — a
cosmetic but noisy warning on every groupby over parquet-sourced data.
``read_parquet_clean`` strips the metadata with a zero-copy map right
after the read so every downstream shuffle sees hashable schemas.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def _strip_schema_metadata(batch: pa.Table) -> pa.Table:
    if batch.schema.metadata is None:
        return batch
    return batch.replace_schema_metadata(None)


def read_parquet_clean(path, **kwargs) -> ray.data.Dataset:
    """``ray.data.read_parquet`` + schema-metadata strip (zero-copy)."""
    return ray.data.read_parquet(path, **kwargs).map_batches(
        _strip_schema_metadata, batch_format="pyarrow",
        zero_copy_batch=True)


def read_csv_clean(path, **kwargs) -> ray.data.Dataset:
    """``ray.data.read_csv`` + the same schema-metadata strip."""
    return ray.data.read_csv(path, **kwargs).map_batches(
        _strip_schema_metadata, batch_format="pyarrow",
        zero_copy_batch=True)


def read_json_clean(path, **kwargs) -> ray.data.Dataset:
    """``ray.data.read_json`` (JSONL) + schema-metadata strip."""
    return ray.data.read_json(path, **kwargs).map_batches(
        _strip_schema_metadata, batch_format="pyarrow",
        zero_copy_batch=True)


def read_small_table(path, columns=None) -> pa.Table:
    """Driver-side load of a SMALL (broadcast-side) table directly via
    pyarrow — no Ray task graph.  A Ray Data read of a 5-row dimension
    file pays ~3-6 s of per-dataset scheduling fixed cost (measured at
    32 cpus) for zero parallelism benefit; dimension tables stay small
    at any corpus scale, so the broadcast side should never ride the
    distributed read path.  Column-pruned like read_parquet_clean."""
    import pyarrow.parquet as pq
    return pq.read_table(path, columns=columns) \
        .replace_schema_metadata(None)
