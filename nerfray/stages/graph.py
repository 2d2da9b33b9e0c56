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


def pagerank(triples: ray.data.Dataset, *, damping: float = 0.85,
             iters: int = 20) -> ray.data.Dataset:
    """PageRank over the (directed) triple graph. The node set is the
    aggregate-to-small side: edges stream once into per-source adjacency
    counts (a bounded dict), then power iteration runs driver-side on the
    dense vector — the honest 100 TB shape, since canonical nodes are
    10^6-ish while the corpus is not. Deterministic (fixed iteration
    count, sorted node order)."""
    import numpy as np

    out_counts: dict[str, int] = {}
    in_edges: dict[str, list] = {}
    nodes: set[str] = set()
    for batch in triples.select_columns(["subj", "obj"]) \
            .iter_batches(batch_format="pyarrow"):
        for a, b in zip(batch.column("subj").to_pylist(),
                        batch.column("obj").to_pylist()):
            nodes.add(a)
            nodes.add(b)
            out_counts[a] = out_counts.get(a, 0) + 1
            in_edges.setdefault(b, []).append(a)

    order = sorted(nodes)
    idx = {n: i for i, n in enumerate(order)}
    n = len(order)
    rank = np.full(n, 1.0 / n)
    outs = np.array([out_counts.get(nd, 0) for nd in order], dtype=np.float64)
    for _ in range(iters):
        contrib = np.where(outs > 0, rank / np.maximum(outs, 1), 0.0)
        nxt = np.full(n, (1.0 - damping) / n)
        # dangling mass redistributed uniformly
        nxt += damping * rank[outs == 0].sum() / n
        for b, srcs in in_edges.items():
            nxt[idx[b]] += damping * sum(contrib[idx[a]] for a in srcs)
        rank = nxt

    return ray.data.from_arrow(pa.Table.from_pydict({
        "node": pa.array(order, pa.string()),
        "rank": pa.array(rank, pa.float64()),
    }))


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
