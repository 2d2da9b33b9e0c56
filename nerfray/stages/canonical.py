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

from nerfray.ops.dedup import h64


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
        # h64, not builtin hash: salt choice must be PYTHONHASHSEED-
        # independent so retried/re-partitioned runs shuffle identically
        out["salt"] = pa.array([h64(s, seed=11) % n_salts for s in ss],
                               pa.int32())
    return pa.Table.from_pydict(out)


def canonical_nodes(linked: ray.data.Dataset, *, key: str = "canon_id",
                    n_salts: int = 1) -> ray.data.Dataset:
    """Linked spans -> (canon_id, n_mentions, n_surfaces) node table."""
    partial = linked.map_batches(
        _partial_counts, fn_kwargs={"key": key, "n_salts": n_salts},
        batch_format="pyarrow", zero_copy_batch=True)
    if n_salts > 1:
        # salted mid-combine: hot (key, surface) pairs split over n_salts
        # reducers before the final per-key reduction
        mid = partial.groupby([key, "surface", "salt"]).sum("cnt")
        partial = mid.drop_columns(["salt"]).rename_columns(
            {"sum(cnt)": "cnt"})

    def _node_group(group: pa.Table) -> pa.Table:
        cnts = group.column("cnt").to_pylist()
        surfaces = group.column("surface").to_pylist()
        return pa.Table.from_pydict({
            key: group.column(key).slice(0, 1),
            "n_mentions": pa.array([sum(cnts)], pa.int64()),
            "n_surfaces": pa.array([len(set(surfaces))], pa.int64()),
        })

    # single final shuffle: block-combined partials are tiny, so one
    # groupby(key).map_groups computes both rollups at once
    return partial.groupby(key).map_groups(_node_group,
                                           batch_format="pyarrow")
