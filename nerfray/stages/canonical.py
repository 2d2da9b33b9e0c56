"""Stage C: canonicalization — merge surface mentions into canonical nodes.

Skew-safe two-phase aggregation (SURVEY.md §7.3): canonical keys are
power-law hot (ubiquitous stdlib symbols land on one reducer in a naive
groupby). Phase 1 pre-aggregates INSIDE ``map_batches`` (a combiner: each
block of M mention rows shrinks to <= distinct-keys rows before any data
moves); phase 2 is a small ``groupby(key).sum`` over the partials. With an
optional salt the phase-2 shuffle itself is split over ``n_salts``
reducers per key and finished by a third, tiny reduction — at 100 TB the
combiner alone removes ~all volume, the salt bounds the worst key.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import ray.data


def _partial_counts(batch: pa.Table, *, key: str, n_salts: int) -> pa.Table:
    keys = batch.column(key).to_pylist()
    surfs = batch.column("surface").to_pylist() \
        if "surface" in batch.column_names else keys
    cnt: Counter = Counter(zip(keys, surfs))
    ks, ss, ns = [], [], []
    for (k, s), c in cnt.items():
        ks.append(k)
        ss.append(s)
        ns.append(c)
    out = {
        "canon_id": pa.array(ks, pa.string()),
        "surface": pa.array(ss, pa.string()),
        "cnt": pa.array(ns, pa.int64()),
    }
    if n_salts > 1:
        out["salt"] = pa.array([hash(s) % n_salts for s in ss], pa.int32())
    return pa.Table.from_pydict(out)


def canonical_nodes(linked: ray.data.Dataset, *, key: str = "canon_id",
                    n_salts: int = 1) -> ray.data.Dataset:
    """Linked spans -> (canon_id, n_mentions, n_surfaces) node table."""
    partial = linked.map_batches(
        _partial_counts, fn_kwargs={"key": key, "n_salts": n_salts},
        batch_format="pyarrow", zero_copy_batch=True)
    if n_salts > 1:
        mid = partial.groupby([key, "surface", "salt"]).sum("cnt")
        partial = mid.drop_columns(["salt"]).rename_columns(
            {"sum(cnt)": "cnt"})
    per_surface = partial.groupby([key, "surface"]).sum("cnt") \
        .rename_columns({"sum(cnt)": "n_mentions"})

    def _node_partial(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            key: batch.column(key),
            "n_mentions": batch.column("n_mentions"),
            "n_surfaces": pa.array([1] * len(batch), pa.int64()),
        })

    nodes = per_surface.map_batches(_node_partial, batch_format="pyarrow") \
        .groupby(key).sum(["n_mentions", "n_surfaces"]) \
        .rename_columns({"sum(n_mentions)": "n_mentions",
                         "sum(n_surfaces)": "n_surfaces"})
    return nodes
