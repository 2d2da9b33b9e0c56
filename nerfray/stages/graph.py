"""Graph analytics over the materialized triple table.

Connected components via iterative min-label propagation: the label map
is the aggregate-to-small side (canonical nodes are bounded — 10^6-ish at
100 TB — while the corpus is not), so each iteration is one broadcast
(``ray.put`` of the label dict) + one ``map_batches`` over the edge
Dataset emitting per-block label improvements + a driver-side merge.
Converges in O(graph diameter) passes; every step is deterministic, so
the result is independent of edge partitioning.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data


def _improvements(batch: pa.Table, labels_ref) -> pa.Table:
    labels = ray.get(labels_ref) if isinstance(labels_ref, ray.ObjectRef) \
        else labels_ref
    out: dict[str, str] = {}
    for a, b in zip(batch.column("subj").to_pylist(),
                    batch.column("obj").to_pylist()):
        la, lb = labels[a], labels[b]
        if la < lb:
            cur = out.get(b)
            if cur is None or la < cur:
                out[b] = la
        elif lb < la:
            cur = out.get(a)
            if cur is None or lb < cur:
                out[a] = lb
    ks = sorted(out)
    return pa.Table.from_pydict({
        "node": pa.array(ks, pa.string()),
        "lbl": pa.array([out[k] for k in ks], pa.string()),
    })


def connected_components(triples: ray.data.Dataset,
                         max_iters: int = 50) -> ray.data.Dataset:
    """(node, component) for every subject/object; component = min node
    string in the connected component (edges undirected)."""
    edges = triples.select_columns(["subj", "obj"]).materialize()
    nodes: set[str] = set()
    for batch in edges.iter_batches(batch_format="pyarrow"):
        nodes.update(batch.column("subj").to_pylist())
        nodes.update(batch.column("obj").to_pylist())
    labels = {n: n for n in nodes}

    for _ in range(max_iters):
        ref = ray.put(labels)
        changed = False
        improved = edges.map_batches(
            _improvements, fn_kwargs={"labels_ref": ref},
            batch_format="pyarrow").take_all()
        for row in improved:
            if row["lbl"] < labels[row["node"]]:
                labels[row["node"]] = row["lbl"]
                changed = True
        if not changed:
            break

    ks = sorted(labels)
    return ray.data.from_arrow(pa.Table.from_pydict({
        "node": pa.array(ks, pa.string()),
        "component": pa.array([labels[k] for k in ks], pa.string()),
    }))
