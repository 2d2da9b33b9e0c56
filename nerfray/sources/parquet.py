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
    schema = batch.schema
    clean_fields = schema.metadata is None and all(
        schema.field(i).metadata is None for i in range(len(schema)))
    if clean_fields:
        return batch
    # field-level metadata survives replace_schema_metadata and still
    # makes consecutive RefBundles compare unequal (the executor's
    # mixed-schema warning) — rebuild the schema with bare fields
    bare = pa.schema([schema.field(i).remove_metadata()
                      for i in range(len(schema))])
    return pa.Table.from_arrays(batch.columns, schema=bare)


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


# ---------------------------------------------------------------------------
# schema evolution: read files from different schema generations as one
# ---------------------------------------------------------------------------
#
# A long-lived 100-TB store is never rewritten when a column is added:
# old files simply lack it.  The reader owns evolution — it scans with
# the CURRENT schema (the parquet fragment scan null-fills columns a
# file predates) and applies each added column's registered default, so
# v1 and v2 files stream through one scan as a single well-typed
# Dataset and no backfill job ever touches the old data.  Rename/type
# changes would need a per-generation cast map; additive evolution (the
# overwhelmingly common case) is exactly this.

def read_parquet_evolved(paths, *, target_schema: pa.Schema,
                         defaults: dict, **kwargs) -> ray.data.Dataset:
    """Read ``paths`` (mixed schema generations) under
    ``target_schema``; columns absent in older files are null-filled by
    the scan and then set to ``defaults[name]``.  Defaulted columns
    have NOT NULL DEFAULT semantics (every null fills — the scan's
    null-fill for pre-evolution files is indistinguishable from a
    written null once Ray re-batches across files, so the contract is
    that evolved columns are written non-null from the evolution point
    on, exactly as SQL column defaults behave)."""
    import pyarrow.compute as pc

    def _fill(batch: pa.Table) -> pa.Table:
        for name, val in defaults.items():
            idx = batch.schema.get_field_index(name)
            col = batch.column(idx)
            if col.null_count:
                batch = batch.set_column(
                    idx, name,
                    pc.fill_null(col, pa.scalar(
                        val, batch.schema.field(idx).type)))
        return batch

    return ray.data.read_parquet(paths, schema=target_schema, **kwargs) \
        .map_batches(_strip_schema_metadata, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .map_batches(_fill, batch_format="pyarrow", zero_copy_batch=True)
