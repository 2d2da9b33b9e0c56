"""Stage C: canonicalization — merge surface mentions into canonical nodes.

Skew-safe two-phase aggregation (SURVEY.md §7.3): canonical keys are
power-law hot (ubiquitous stdlib symbols land on one reducer in a naive
groupby). Phase 1 pre-aggregates INSIDE ``map_batches`` (a combiner: each
block of M mention rows shrinks to <= distinct-keys rows before any data
moves); phase 2 reduces to one row per (key, surface) and finishes with
pure ``Sum``/``Count`` aggregates per key (never ``map_groups`` — a
per-key Python dispatch would be 10^6 calls at corpus scale). With an
optional salt the (key, surface) shuffle itself is split over
``n_salts`` reducers per hot pair first — at 100 TB the combiner alone
removes ~all volume, the salt bounds the worst key.
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
    from ray.data.aggregate import Count, Sum

    partial = linked.map_batches(
        _partial_counts, fn_kwargs={"key": key, "n_salts": n_salts},
        batch_format="pyarrow", zero_copy_batch=True)
    if n_salts > 1:
        # salted mid-combine: hot (key, surface) pairs split over n_salts
        # reducers before the (key, surface) reduction
        mid = partial.groupby([key, "surface", "salt"]).sum("cnt")
        partial = mid.drop_columns(["salt"]).rename_columns(
            {"sum(cnt)": "cnt"})

    # reduce to one row per (key, surface) — after this, n_surfaces is a
    # plain row count — then pure aggregates per key. No map_groups: a
    # per-key Python dispatch would be 10^6 calls at corpus scale (the
    # same lesson as the graph star rounds); Sum/Count aggregates stay
    # vectorized end to end.
    per_surface = partial.groupby([key, "surface"]).sum("cnt") \
        .rename_columns({"sum(cnt)": "cnt"})
    return per_surface.groupby(key).aggregate(Sum("cnt"), Count()) \
        .rename_columns({"sum(cnt)": "n_mentions",
                         "count()": "n_surfaces"})
