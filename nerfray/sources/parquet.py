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
    """``ray.data.read_parquet`` + schema-metadata strip (zero-copy).

    The strip happens TWICE by design: an explicit bare ``schema=`` on
    the read itself (so the read operator's own output blocks are
    already metadata-free — otherwise every shuffle-reduce task logs
    ``Failed to hash the schemas`` trying to ``set()`` an unhashable
    pandas-metadata schema) plus the map for readers that re-attach
    fragment metadata."""
    if "schema" not in kwargs and isinstance(path, str):
        try:
            import pyarrow.parquet as pq
            s = pq.read_schema(path)
            names = kwargs.get("columns") or s.names
            kwargs["schema"] = pa.schema(
                [s.field(n).remove_metadata() for n in names])
        except Exception:
            pass  # directories / remote paths: fall back to the map
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


# ---------------------------------------------------------------------------
# cross-format round-trips: the same table via CSV / JSONL readers
# ---------------------------------------------------------------------------
#
# Source-format breadth evidence: a table is exported ONCE per session
# to /tmp (driver-side pyarrow write of the small gate corpus; at real
# scale the export would itself be a Dataset.write_csv/write_json), and
# the query path reads it back through the distributed CSV/JSONL
# readers — so the oracle (plain SQL over the parquet view) checks the
# byte-level fidelity of quoting/escaping through the whole read path.

_EXPORT_CACHE: dict = {}


def export_table_once(sf_dir: str, table: str, fmt: str) -> str:
    import os

    key = (sf_dir, table, fmt)
    path = _EXPORT_CACHE.get(key)
    if path is not None and os.path.exists(path):
        return path
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_dir, f"{table}.parquet"))
    out_dir = os.path.join("/tmp/nerfray_exports",
                           os.path.basename(sf_dir.rstrip("/")))
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{table}.{fmt}")
    tmp = path + ".tmp"
    if fmt == "csv":
        import pyarrow.csv as pacsv
        pacsv.write_csv(t, tmp)
    elif fmt == "jsonl":
        # pyarrow has no JSON writer: pandas emits JSONL with exact
        # int64 / escaped-string fidelity for this schema
        t.to_pandas().to_json(tmp, orient="records", lines=True)
    else:
        raise ValueError(fmt)
    os.replace(tmp, path)
    _EXPORT_CACHE[key] = path
    return path


def export_table_sharded(sf_dir: str, table: str, fmt: str,
                         n_shards: int = 8) -> list[str]:
    """Write ``table`` as ``n_shards`` Feather (Arrow IPC) or ORC shard
    files under /tmp — the multi-file layout a distributed reader
    actually consumes (one task per shard).  Cached per (sf_dir, table,
    fmt) like export_table_once."""
    import os

    key = (sf_dir, table, fmt, n_shards)
    paths = _EXPORT_CACHE.get(key)
    if paths is not None and all(os.path.exists(p) for p in paths):
        return paths
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_dir, f"{table}.parquet"))
    out_dir = os.path.join("/tmp/nerfray_exports",
                           os.path.basename(sf_dir.rstrip("/")),
                           f"{table}_{fmt}")
    os.makedirs(out_dir, exist_ok=True)
    n = t.num_rows
    bounds = [n * i // n_shards for i in range(n_shards + 1)]
    paths = []
    for i in range(n_shards):
        shard = t.slice(bounds[i], bounds[i + 1] - bounds[i])
        path = os.path.join(out_dir, f"shard_{i:04d}.{fmt}")
        tmp = path + ".tmp"
        if fmt == "feather":
            import pyarrow.feather as feather
            feather.write_feather(shard, tmp)
        elif fmt == "orc":
            import pyarrow.orc as orc
            orc.write_table(shard, tmp)
        else:
            raise ValueError(fmt)
        os.replace(tmp, path)
        paths.append(path)
    _EXPORT_CACHE[key] = paths
    return paths


def _read_shard_files(paths: list[str], fmt: str) -> ray.data.Dataset:
    """Distributed shard reader for formats Ray Data lacks natively:
    a Dataset of file paths fans out one decode task per shard (the
    custom-datasource shape — each task opens only its own file)."""

    def _decode(batch: pa.Table) -> pa.Table:
        tables = []
        for p in batch.column("path").to_pylist():
            if fmt == "feather":
                import pyarrow.feather as feather
                tables.append(feather.read_table(p))
            else:
                import pyarrow.orc as orc
                tables.append(orc.read_table(p))
        return _strip_schema_metadata(pa.concat_tables(tables))

    paths_ds = ray.data.from_items([{"path": p} for p in paths])
    # one decode task per shard file
    return paths_ds.repartition(len(paths)).map_batches(
        _decode, batch_format="pyarrow", batch_size=1)


def read_feather_shards(paths: list[str]) -> ray.data.Dataset:
    return _read_shard_files(paths, "feather")


def read_orc_shards(paths: list[str]) -> ray.data.Dataset:
    return _read_shard_files(paths, "orc")


def export_table_gz_shards(sf_dir: str, table: str,
                           n_shards: int = 8) -> list[str]:
    """Write ``table`` as gzip-compressed JSONL shard files (the
    Common-Crawl-style ingestion layout). Cached like the other
    exports."""
    import os

    key = (sf_dir, table, "jsonl.gz", n_shards)
    paths = _EXPORT_CACHE.get(key)
    if paths is not None and all(os.path.exists(p) for p in paths):
        return paths
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_dir, f"{table}.parquet"))
    out_dir = os.path.join("/tmp/nerfray_exports",
                           os.path.basename(sf_dir.rstrip("/")),
                           f"{table}_jsonl_gz")
    os.makedirs(out_dir, exist_ok=True)
    n = t.num_rows
    bounds = [n * i // n_shards for i in range(n_shards + 1)]
    paths = []
    for i in range(n_shards):
        shard = t.slice(bounds[i], bounds[i + 1] - bounds[i])
        path = os.path.join(out_dir, f"shard_{i:04d}.jsonl.gz")
        tmp = path + ".tmp"
        shard.to_pandas().to_json(tmp, orient="records", lines=True,
                                  compression="gzip")
        os.replace(tmp, path)
        paths.append(path)
    _EXPORT_CACHE[key] = paths
    return paths


def read_jsonl_gz_shards(paths: list[str]) -> ray.data.Dataset:
    """Distributed gzip-JSONL shard reader: one decompress+parse task
    per shard file (same custom-datasource shape as Feather/ORC)."""

    def _decode(batch: pa.Table) -> pa.Table:
        import pandas as pd
        frames = [pd.read_json(p, lines=True, compression="gzip")
                  for p in batch.column("path").to_pylist()]
        return _strip_schema_metadata(
            pa.Table.from_pandas(pd.concat(frames), preserve_index=False))

    paths_ds = ray.data.from_items([{"path": p} for p in paths])
    return paths_ds.repartition(len(paths)).map_batches(
        _decode, batch_format="pyarrow", batch_size=1)
