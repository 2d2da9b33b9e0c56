"""Graph-analytics stage tests (components + pagerank vs dense numpy)."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture()
def tiny_graph(ray_session):
    import ray.data
    edges = [("a", "p", "x"), ("b", "p", "x"), ("c", "p", "y"),
             ("x", "p", "y"), ("q", "p", "r")]
    return ray.data.from_arrow(pa.Table.from_pydict({
        "subj": pa.array([e[0] for e in edges]),
        "pred": pa.array([e[1] for e in edges]),
        "obj": pa.array([e[2] for e in edges]),
    }))


def test_connected_components_tiny(ray_session, tiny_graph):
    from nerfray.stages import graph
    comp = {r["node"]: r["component"]
            for r in graph.connected_components(tiny_graph).take_all()}
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "a", "y": "a",
                    "q": "q", "r": "q"}


def test_pagerank_matches_dense_reference(ray_session, tiny_graph):
    from nerfray.stages import graph
    got = {r["node"]: r["rank"] for r in graph.pagerank(tiny_graph).take_all()}

    # dense reference implementation
    nodes = sorted(got)
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for a, b in [("a", "x"), ("b", "x"), ("c", "y"), ("x", "y"), ("q", "r")]:
        A[idx[b], idx[a]] += 1
    outs = A.sum(axis=0)
    rank = np.full(n, 1 / n)
    d = 0.85
    for _ in range(20):
        contrib = np.where(outs > 0, rank / np.maximum(outs, 1), 0.0)
        rank = np.full(n, (1 - d) / n) + d * A @ contrib \
            + d * rank[outs == 0].sum() / n
    for node in nodes:
        assert abs(got[node] - rank[idx[node]]) < 1e-12
    # ranks form a distribution; sinks of many edges rank highest
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got["y"] == max(got.values())
