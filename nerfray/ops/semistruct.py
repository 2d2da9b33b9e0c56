"""Semi-structured (JSON) operators over the events ``props`` column:
typed-field extraction into a relational rollup, and recursive schema
profiling — the 'land raw JSON, discover its shape, lift the fields
you need' pipeline every event warehouse runs.

Scale shape: both ops are map-only over the JSON column with per-block
combiners; only (group, partial-aggregate) or (path, type, count) rows
shuffle — the JSON text itself never leaves the scan task.  Parsing is
``json.loads`` per row inside the batch (the cost profile of any JSON
scan); a production run would swap in a vectorized JSON kernel with
the same contract.

Type names follow DuckDB's ``json_type`` vocabulary (UBIGINT / BIGINT
/ DOUBLE / VARCHAR / BOOLEAN / NULL / OBJECT / ARRAY) so the profile
is directly SQL-oracle-comparable.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import ray.data

_PROFILE_SCHEMA = pa.schema([("path", pa.string()),
                             ("json_type", pa.string()),
                             ("n", pa.int64())])


def _json_type_name(v) -> str:
    if isinstance(v, bool):        # bool is an int subclass: check first
        return "BOOLEAN"
    if v is None:
        return "NULL"
    if isinstance(v, int):
        return "UBIGINT" if v >= 0 else "BIGINT"
    if isinstance(v, float):
        return "DOUBLE"
    if isinstance(v, str):
        return "VARCHAR"
    if isinstance(v, list):
        return "ARRAY"
    return "OBJECT"


def _walk(path: str, v, out: dict) -> None:
    if isinstance(v, dict):
        for k, sub in v.items():
            p = f"{path}.{k}"
            key = (p, _json_type_name(sub))
            out[key] = out.get(key, 0) + 1
            if isinstance(sub, (dict, list)):
                _walk(p, sub, out)
    elif isinstance(v, list):
        for sub in v:
            p = f"{path}[*]"
            key = (p, _json_type_name(sub))
            out[key] = out.get(key, 0) + 1
            if isinstance(sub, (dict, list)):
                _walk(p, sub, out)


def _profile_partial(batch: pa.Table, *, column: str) -> pa.Table:
    out: dict = {}
    for s in batch.column(column).to_pylist():
        _walk("$", json.loads(s), out)
    keys = sorted(out)
    return pa.Table.from_pydict({
        "path": pa.array([k[0] for k in keys], pa.string()),
        "json_type": pa.array([k[1] for k in keys], pa.string()),
        "n": pa.array([out[k] for k in keys], pa.int64()),
    }, schema=_PROFILE_SCHEMA)


def json_schema_profile(ds: ray.data.Dataset,
                        column: str) -> ray.data.Dataset:
    """(path, json_type, n): how many rows carry each (path, type) —
    recursive over nested objects/arrays; schema induction for a
    landed JSON column."""
    return ds.select_columns([column]).map_batches(
        _profile_partial, fn_kwargs={"column": column},
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["path", "json_type"]).sum("n") \
        .rename_columns({"sum(n)": "n"})


def _extract_partial(batch: pa.Table) -> pa.Table:
    out_schema = pa.schema([("event_type", pa.string()),
                            ("n", pa.int64()), ("s", pa.int64()),
                            ("mn", pa.int64()), ("mx", pa.int64())])
    ks = np.array([json.loads(s)["k"]
                   for s in batch.column("props").to_pylist()],
                  dtype=np.int64)
    if not len(ks):
        return out_schema.empty_table()
    et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
    order = np.argsort(et, kind="stable")
    et_s, k_s = et[order], ks[order]
    starts = np.flatnonzero(np.r_[True, et_s[1:] != et_s[:-1]])
    ends = np.r_[starts[1:], len(et_s)]
    return pa.Table.from_pydict({
        "event_type": pa.array(et_s[starts], pa.string()),
        "n": pa.array(ends - starts, pa.int64()),
        "s": pa.array(np.add.reduceat(k_s, starts), pa.int64()),
        "mn": pa.array(np.minimum.reduceat(k_s, starts), pa.int64()),
        "mx": pa.array(np.maximum.reduceat(k_s, starts), pa.int64()),
    }, schema=out_schema)


def props_rollup(ds: ray.data.Dataset) -> ray.data.Dataset:
    """JSON-extract $.k then an exact per-event-type rollup — the
    lift-a-field-and-aggregate pipeline with a block combiner (the
    shuffle carries one partial row per (block, type))."""
    from ray.data.aggregate import Max, Min, Sum

    return ds.select_columns(["event_type", "props"]).map_batches(
        _extract_partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("event_type").aggregate(
            Sum("n"), Sum("s"), Min("mn"), Max("mx")) \
        .rename_columns({"sum(n)": "n_events", "sum(s)": "sum_k",
                         "min(mn)": "min_k", "max(mx)": "max_k"})


# -- query surface ----------------------------------------------------------


def _events(sf_dir: str) -> ray.data.Dataset:
    import os

    from nerfray.sources.parquet import read_parquet_clean
    return read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                              columns=["event_type", "props"])


def events_json_schema(sf_dir: str) -> ray.data.Dataset:
    return json_schema_profile(_events(sf_dir), "props")


def events_props_rollup(sf_dir: str) -> ray.data.Dataset:
    return props_rollup(_events(sf_dir))


# generic top-level profile via DuckDB json functions (the corpus is
# depth-1, so the recursive profiler and the top-level mirror agree;
# nested generality is pinned by the pytest)
JSON_SCHEMA_SQL = """
WITH kv AS (SELECT props, unnest(json_keys(props)) AS key FROM events)
SELECT '$.' || key AS path,
       json_type(props, '$.' || key) AS json_type,
       count(*)::BIGINT AS n
FROM kv GROUP BY 1, 2 ORDER BY 1, 2
"""

PROPS_ROLLUP_SQL = """
SELECT event_type, count(*)::BIGINT AS n_events,
       sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       min(json_extract(props, '$.k')::BIGINT)::BIGINT AS min_k,
       max(json_extract(props, '$.k')::BIGINT)::BIGINT AS max_k
FROM events GROUP BY 1 ORDER BY 1
"""

ORACLES = {
    "events_json_schema": JSON_SCHEMA_SQL,
    "events_props_rollup": PROPS_ROLLUP_SQL,
}
