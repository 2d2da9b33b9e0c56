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
    # distributed partial-sum order differs from the dense matmul, so
    # agreement is to float-accumulation noise, not bit-exact
    for node in nodes:
        assert abs(got[node] - rank[idx[node]]) < 1e-9
    # ranks form a distribution; sinks of many edges rank highest
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got["y"] == max(got.values())


def _dense_graph(n_nodes: int):
    """Complete digraph: edges (n*(n-1)) massively outnumber nodes."""
    import ray.data
    names = [f"n{i:02d}" for i in range(n_nodes)]
    subj, obj = [], []
    for a in names:
        for b in names:
            if a != b:
                subj.append(a)
                obj.append(b)
    ds = ray.data.from_arrow(pa.Table.from_pydict({
        "subj": pa.array(subj), "pred": pa.array(["p"] * len(subj)),
        "obj": pa.array(obj)}))
    return ds.repartition(8), names, len(subj)


def test_no_edge_proportional_driver_state(ray_session, monkeypatch):
    """The scale contract of stages/graph.py: no single driver-side fetch
    is ever edge-proportional. On a complete 28-node digraph (756 edges)
    every take_all()/iter_batches row fetch must stay <= n_nodes."""
    import ray.data
    from nerfray.stages import graph

    fetches: list[int] = []
    orig_take = ray.data.Dataset.take_all
    orig_iter = ray.data.Dataset.iter_batches

    def guarded_take(self, *a, **k):
        rows = orig_take(self, *a, **k)
        fetches.append(len(rows))
        return rows

    def guarded_iter(self, *a, **k):
        total = 0
        for b in orig_iter(self, *a, **k):
            total += b.num_rows if hasattr(b, "num_rows") else len(b)
            yield b
        fetches.append(total)

    monkeypatch.setattr(ray.data.Dataset, "take_all", guarded_take)
    monkeypatch.setattr(ray.data.Dataset, "iter_batches", guarded_iter)

    triples, names, n_edges = _dense_graph(28)
    n_nodes = len(names)
    assert n_edges > 20 * n_nodes

    comp = {r["node"]: r["component"]
            for r in orig_take(graph.connected_components(triples))}
    assert comp == {n: names[0] for n in names}

    ranks = {r["node"]: r["rank"]
             for r in orig_take(graph.pagerank(triples, iters=5))}
    assert len(ranks) == n_nodes
    # complete graph: uniform stationary distribution
    assert max(ranks.values()) - min(ranks.values()) < 1e-9

    assert fetches, "guards never fired"
    assert max(fetches) <= n_nodes, \
        f"driver fetched {max(fetches)} rows in one call (> {n_nodes} nodes)"


def _uf_components(edges):
    """Union-find reference: node -> min-node-of-component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups = {}
    for n in list(parent):
        groups.setdefault(find(n), []).append(n)
    return {n: min(ms) for ms in groups.values() for n in ms}


def test_connected_components_random_vs_union_find(ray_session):
    """Star-algorithm CC equals a union-find reference on random sparse
    graphs and on a long path (worst-case diameter for propagation
    algorithms; the star rounds must still converge in O(log n))."""
    import ray.data
    from nerfray.stages import graph
    rng = np.random.default_rng(7)

    cases = []
    for trial in range(3):
        n = 60
        m = 45 + 10 * trial
        edges = [(f"v{int(a):03d}", f"v{int(b):03d}")
                 for a, b in rng.integers(0, n, size=(m, 2)) if a != b]
        cases.append(edges)
    cases.append([(f"p{i:03d}", f"p{i + 1:03d}") for i in range(80)])  # path

    for edges in cases:
        ds = ray.data.from_arrow(pa.Table.from_pydict({
            "subj": pa.array([e[0] for e in edges]),
            "pred": pa.array(["p"] * len(edges)),
            "obj": pa.array([e[1] for e in edges]),
        })).repartition(4)
        got = {r["node"]: r["component"]
               for r in graph.connected_components(ds).take_all()}
        assert got == _uf_components(edges)


def test_connected_components_self_loops_and_isolates(ray_session):
    """Self-loop-only nodes (subj == obj) must appear as (node, node)
    rows — exactly what the recursive-CTE oracle emits — and a self-loop
    on a connected node must not perturb its component."""
    import ray.data
    from nerfray.stages import graph
    edges = [("a", "b"), ("z", "z"),       # z: self-loop-only isolate
             ("b", "b"), ("c", "d")]       # b: self-loop + real edge
    ds = ray.data.from_arrow(pa.Table.from_pydict({
        "subj": pa.array([e[0] for e in edges]),
        "pred": pa.array(["p"] * len(edges)),
        "obj": pa.array([e[1] for e in edges]),
    }))
    got = {r["node"]: r["component"]
           for r in graph.connected_components(ds).take_all()}
    assert got == {"a": "a", "b": "a", "c": "c", "d": "c", "z": "z"}


def test_pagerank_driver_fetches_no_node_strings(ray_session, monkeypatch):
    """r2 verdict ceiling, now fixed: PageRank's driver state must be
    numeric-only (dense out-degree + rank vectors). Every take_all /
    iter_batches the driver performs during pagerank() must contain ZERO
    string-typed values — node ids are assigned distributively and the
    output join happens inside map_batches."""
    import pyarrow as _pa
    import ray.data
    from nerfray.stages import graph

    string_rows: list[int] = []
    orig_take = ray.data.Dataset.take_all
    orig_iter = ray.data.Dataset.iter_batches

    def _count_strings(rows_or_batch):
        if isinstance(rows_or_batch, _pa.Table):
            return sum(rows_or_batch.num_rows
                       for f in rows_or_batch.schema
                       if _pa.types.is_string(f.type)
                       or _pa.types.is_large_string(f.type))
        n = 0
        for r in rows_or_batch:
            n += sum(1 for v in r.values() if isinstance(v, str))
        return n

    def guarded_take(self, *a, **k):
        rows = orig_take(self, *a, **k)
        string_rows.append(_count_strings(rows))
        return rows

    def guarded_iter(self, *a, **k):
        for b in orig_iter(self, *a, **k):
            if isinstance(b, _pa.Table):
                string_rows.append(_count_strings(b))
            yield b

    monkeypatch.setattr(ray.data.Dataset, "take_all", guarded_take)
    monkeypatch.setattr(ray.data.Dataset, "iter_batches", guarded_iter)

    triples, names, n_edges = _dense_graph(24)
    ranks = {r["node"]: r["rank"]
             for r in orig_take(graph.pagerank(triples, iters=3))}
    assert len(ranks) == len(names)
    assert string_rows, "guards never fired"
    assert sum(string_rows) == 0, \
        f"driver fetched {sum(string_rows)} string values during pagerank"


def test_pagerank_planted_bit_equals_sql(ray_session):
    """The dyadic-exact planted graph: the distributed pagerank operator
    must be BIT-equal to the unrolled DuckDB power iteration (every
    float64 op exact under any summation order by construction)."""
    import duckdb
    from nerfray.stages import graph
    got = {r["node"]: r["rank"] for r in graph.pagerank(
        graph.planted_pagerank_triples(), damping=0.5,
        iters=graph.PLANTED_PR_ITERS).take_all()}
    sql = dict(duckdb.sql(graph.pagerank_planted_sql()).fetchall())
    assert got == sql
    assert sum(got.values()) == 1.0           # exact mass conservation
    assert len(set(got.values())) > 10        # genuinely non-uniform


def test_triangle_counts_random_vs_brute(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from nerfray.stages import graph as g
    rng = np.random.default_rng(5)
    n = 40
    e = {(int(a), int(b)) for a, b in rng.integers(0, n, (200, 2))
         if a != b}
    es = sorted(e)
    edges = ray.data.from_arrow(pa.Table.from_pydict({
        "u": pa.array([x[0] for x in es], pa.int64()),
        "v": pa.array([x[1] for x in es], pa.int64())}))
    mine = {r["u"]: r["n_triangles"]
            for r in g.triangle_counts(edges).take_all()}
    brute = {}
    for (u, v) in e:
        for (v2, w) in e:
            if v2 == v and (u, w) in e:
                brute[u] = brute.get(u, 0) + 1
    assert mine == brute and brute


def test_planted_triangles_two_per_node(ray_session):
    import ray.data
    import pyarrow as pa
    from nerfray.stages import graph as g
    n = 60
    ids = ray.data.from_arrow(pa.Table.from_pydict(
        {"vec_id": pa.array(range(n), pa.int64())}))
    rows = g.triangle_counts(
        g.planted_triangle_edges(ids, n)).take_all()
    assert len(rows) == n
    assert all(r["n_triangles"] == 2 for r in rows)


def test_triangle_counts_huge_node_ids(ray_session):
    """Node ids far past 2^21 (the r3 pair-encoding cap) and past
    2^32: the composite-key closure must stay exact — same random
    graph as the brute-force test, ids shifted into the huge range."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from nerfray.stages import graph as g
    rng = np.random.default_rng(5)
    n = 40
    base = (1 << 40) + 12345
    step = (1 << 22) + 7  # consecutive ids straddle the old cap
    e = {(int(a), int(b)) for a, b in rng.integers(0, n, (200, 2))
         if a != b}
    es = sorted(e)
    edges = ray.data.from_arrow(pa.Table.from_pydict({
        "u": pa.array([base + x[0] * step for x in es], pa.int64()),
        "v": pa.array([base + x[1] * step for x in es], pa.int64())}))
    mine = {r["u"]: r["n_triangles"]
            for r in g.triangle_counts(edges).take_all()}
    brute = {}
    for (u, v) in e:
        for (v2, w) in e:
            if v2 == v and (u, w) in e:
                brute[base + u * step] = brute.get(base + u * step, 0) + 1
    assert mine == brute and brute


def test_pagerank_dataset_rank_bit_equals_broadcast(ray_session):
    """The beyond-driver-RAM path (rank lives as a Dataset, iterations
    are hash_join exchanges) must be BIT-equal to the broadcast-vector
    path on the dyadic-exact planted graph (every float op exact under
    any summation order, so the two execution shapes cannot diverge)."""
    from nerfray.stages import graph as g
    trips = g.planted_pagerank_triples(64)
    a = {r["node"]: r["rank"]
         for r in g.pagerank(trips, damping=0.5, iters=2).take_all()}
    b = {r["node"]: r["rank"]
         for r in g.pagerank_dataset_rank(trips, damping=0.5,
                                          iters=2).take_all()}
    assert a == b and len(a) == 64


def test_bfs_hops_matches_brute_force(ray_session):
    """Min-hop distances from a 2-node seed set on a random directed
    graph equal a driver-side BFS; unreachable nodes absent."""
    import collections
    import numpy as np
    import pyarrow as pa
    import ray.data
    from nerfray.stages import graph as g
    rng = np.random.default_rng(3)
    n, m = 60, 150
    u = rng.integers(0, n, m)
    v = rng.integers(0, n, m)
    edges = ray.data.from_arrow(pa.Table.from_pydict({
        "u": pa.array(u, pa.int64()),
        "v": pa.array(v, pa.int64())})).repartition(4)
    seeds = ray.data.from_arrow(pa.Table.from_pydict({
        "node": pa.array([0, 17], pa.int64())}))
    got = {r["node"]: r["hop"]
           for r in g.bfs_hops(edges, seeds, max_hops=4).take_all()}
    adj = collections.defaultdict(list)
    for a, b in zip(u, v):
        adj[a].append(b)
    want, frontier = {0: 0, 17: 0}, [0, 17]
    for h in range(1, 5):
        nxt = {b for a in frontier for b in adj[a] if b not in want}
        for b in nxt:
            want[b] = h
        frontier = sorted(nxt)
    assert got == want


def _brute_kcore(pairs, k):
    """Reference peel: repeatedly drop nodes with degree < k."""
    import collections
    adj = collections.defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return sorted(adj)


def _sym_edges_ds(pairs, parts=5):
    import ray.data
    u = [a for a, b in pairs] + [b for a, b in pairs]
    v = [b for a, b in pairs] + [a for a, b in pairs]
    t = pa.Table.from_pydict({"u": pa.array(u, pa.int64()),
                              "v": pa.array(v, pa.int64())})
    return ray.data.from_arrow(t).repartition(parts)


def test_kcore_random_graphs_match_brute_force(ray_session):
    from nerfray.stages import graph as g
    rng = np.random.default_rng(11)
    for trial in range(3):
        n = 60
        m = 140
        pairs = set()
        while len(pairs) < m:
            a, b = rng.integers(0, n, size=2)
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        want = _brute_kcore(pairs, 3)
        got = sorted(r["node"]
                     for r in g.kcore(_sym_edges_ds(pairs)).take_all())
        assert got == want, trial


def test_kcore_cascade_needs_multiple_rounds(ray_session):
    """Pendant chain hanging off a K4: a single degree filter keeps the
    chain's inner nodes (degree 2 < 3 only appears after the tip is
    peeled for k=3... use k=2: chain interior has degree exactly 2, so
    only TRANSITIVE peeling from the tip removes it)."""
    from nerfray.stages import graph as g
    # K4 on 0-3, chain 3-10-11-12 (12 is the tip)
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (3, 10), (10, 11), (11, 12)]
    got = sorted(r["node"]
                 for r in g.kcore(_sym_edges_ds(pairs), k=2).take_all())
    assert got == [0, 1, 2, 3]          # whole chain peels transitively
    # a fixed 2-round unroll is NOT converged for this chain: it still
    # holds node 10 (degree 2 until 11 dies) — proves the adaptive path
    # genuinely iterates to the fixpoint rather than degree-filtering
    shallow = sorted(
        r["node"]
        for r in g.kcore(_sym_edges_ds(pairs), k=2, rounds=2).take_all())
    assert 10 in shallow and shallow != got


def test_kcore_fixed_rounds_equals_adaptive_on_planted(ray_session):
    from nerfray.stages import graph as g
    import ray.data
    ids = ray.data.range(120).map_batches(
        lambda b: pa.Table.from_pydict(
            {"vec_id": pa.array(b["id"], pa.int64())}),
        batch_format="numpy")
    edges = g.planted_kcore_edges(ids, 120)
    fixed = sorted(r["node"] for r in g.kcore(
        edges, rounds=g.KCORE_ROUNDS_SQL).take_all())
    adaptive = sorted(r["node"] for r in g.kcore(edges).take_all())
    assert fixed == adaptive
    # the 3-core is exactly the K4 clique nodes
    want = sorted(b + j for b in range(0, 117, 10) for j in range(4))
    assert fixed == want


def test_common_neighbors_counts_and_cap(ray_session):
    """Pair counts equal brute-force shared-object counts; hub objects
    are capped deterministically (lexicographically first subjects)."""
    import itertools
    import ray.data
    import pyarrow as pa
    from nerfray.stages import graph
    trips = []
    # s0,s1 share o0,o1; s0,s2 share o0; s2,s3 share o2,o3,o4
    edges = {"s0": ["o0", "o1"], "s1": ["o0", "o1"],
             "s2": ["o0", "o2", "o3", "o4"], "s3": ["o2", "o3", "o4"]}
    for s, objs in edges.items():
        for o in objs:
            trips.append((s, "uses", o))
            trips.append((s, "uses", o))  # duplicate triples must not double-count
    tbl = pa.Table.from_pydict({
        "subj": pa.array([t[0] for t in trips], pa.string()),
        "pred": pa.array([t[1] for t in trips], pa.string()),
        "obj": pa.array([t[2] for t in trips], pa.string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    got = {(r["node_a"], r["node_b"]): r["n_common"]
           for r in graph.common_neighbors(ds, min_common=1).take_all()}
    want = {}
    for a, b in itertools.combinations(sorted(edges), 2):
        c = len(set(edges[a]) & set(edges[b]))
        if c:
            want[(a, b)] = c
    assert got == want
    # min_common gate
    got2 = {(r["node_a"], r["node_b"]): r["n_common"]
            for r in graph.common_neighbors(ds, min_common=2).take_all()}
    assert got2 == {k: v for k, v in want.items() if v >= 2}
    # hub guard: with cap=2, object o0 (3 subjects) is EXCLUDED whole —
    # remaining signal comes from sub-cap objects only
    got3 = {(r["node_a"], r["node_b"]): r["n_common"]
            for r in graph.common_neighbors(ds, min_common=1,
                                            cap=2).take_all()}
    assert got3[("s0", "s1")] == 1       # only o1 survives for the pair
    assert ("s0", "s2") not in got3      # their ONLY shared obj was o0
    assert got3[("s2", "s3")] == 3       # sub-cap objects unaffected


def test_sssp_rounds_vs_brute_force(ray_session):
    """Bounded Bellman-Ford must equal the per-round relaxation
    recurrence on a random weighted digraph, any block structure."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from nerfray.stages import graph

    rng = np.random.default_rng(5)
    n, m, rounds = 40, 160, 4
    u = rng.integers(0, n, m)
    v = rng.integers(0, n, m)
    w = rng.integers(1, 10, m).astype(np.int64)
    edges = ray.data.from_arrow(pa.Table.from_pydict({
        "u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64()),
        "w": pa.array(w, pa.int64())})).repartition(5)
    seeds = ray.data.from_arrow(pa.Table.from_pydict(
        {"node": pa.array([0, 3], pa.int64())}))
    got = {r["node"]: r["dist"]
           for r in graph.sssp_rounds(edges, seeds,
                                      rounds=rounds).take_all()}
    INF = 1 << 60
    dist = {0: 0, 3: 0}
    for _ in range(rounds):
        nxt = dict(dist)
        for a, b, c in zip(u, v, w):
            if a in dist and dist[a] + c < nxt.get(b, INF):
                nxt[b] = dist[a] + int(c)
        dist = nxt
    assert got == dist and len(dist) > 2


def test_neighbor_degree_vs_brute_force(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from nerfray.stages import graph

    rng = np.random.default_rng(9)
    subj = [f"n{i}" for i in rng.integers(0, 20, 60)]
    obj = [f"n{i}" for i in rng.integers(0, 20, 60)]
    trips = ray.data.from_arrow(pa.Table.from_pydict({
        "subj": pa.array(subj, pa.string()),
        "obj": pa.array(obj, pa.string()),
        "pred": pa.array(["p"] * 60, pa.string()),
    })).repartition(5)
    got = {r["node"]: (r["n_neighbors"], r["sum_neighbor_deg"])
           for r in graph.neighbor_degree(trips).take_all()}
    adj = {}
    for a, b in zip(subj, obj):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {u: (len(vs), sum(len(adj[v]) for v in vs))
            for u, vs in adj.items()}
    assert got == want and len(want) == 20


def test_label_propagation_random_graphs_match_brute_force(ray_session):
    """Synchronous min-tie LPA == naive per-round Python on random
    multigraphs (parallel edges vote twice), across round counts."""
    import ray.data
    from nerfray.stages import graph

    rng = np.random.default_rng(13)
    for trial in range(3):
        m = 40
        a = rng.integers(0, 15, m).astype(np.int64)
        b = rng.integers(0, 15, m).astype(np.int64)
        edges = ray.data.from_arrow(pa.Table.from_pydict(
            {"a": pa.array(a), "b": pa.array(b)})).repartition(4)
        rounds = trial + 1
        got = {r["node"]: r["label"] for r in
               graph.label_propagation(edges, rounds=rounds).take_all()}

        # naive: multiset votes over symmetric incidences
        inc: dict[int, list] = {}
        for x, y in zip(a.tolist(), b.tolist()):
            inc.setdefault(x, []).append(y)
            inc.setdefault(y, []).append(x)
        lab = {v: v for v in inc}
        for _ in range(rounds):
            new = {}
            for v, nbrs in inc.items():
                votes: dict[int, int] = {}
                for u in nbrs:
                    votes[lab[u]] = votes.get(lab[u], 0) + 1
                best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
                new[v] = best[0]
            lab = new
        assert got == lab, (trial, rounds)


def test_lib_associations_brute_force_and_cap(ray_session):
    """Pair supports + permille confidences == brute force; a hub repo
    beyond ASSOC_RUN_CAP is capped (pairs only among the first cap
    libs, sorted) rather than exploding quadratically."""
    import itertools
    import ray.data
    from nerfray.stages import triples as tstage

    trips = []
    imports = {
        "r1": ["lib:a", "lib:b", "lib:c"],
        "r2": ["lib:a", "lib:b"],
        "r3": ["lib:b", "lib:c"],
        "r4": ["lib:a"],
    }
    for r, libs in imports.items():
        trips += [(r, "imports", o) for o in libs]
    trips.append(("r1", "licensed-under", "license:mit"))  # ignored
    ds = ray.data.from_items(
        [{"subj": s, "pred": p, "obj": o} for s, p, o in trips]) \
        .repartition(3)
    got = {(r["lib_a"], r["lib_b"]):
           (r["support_pair"], r["conf_ab_permille"], r["conf_ba_permille"])
           for r in tstage.lib_associations(ds).take_all()}

    supp: dict = {}
    pair: dict = {}
    for libs in imports.values():
        for o in libs:
            supp[o] = supp.get(o, 0) + 1
        for a, b in itertools.combinations(sorted(libs), 2):
            pair[(a, b)] = pair.get((a, b), 0) + 1
    want = {k: (v, v * 1000 // supp[k[0]], v * 1000 // supp[k[1]])
            for k, v in pair.items()}
    assert got == want

    # hub cap: one repo importing cap+10 libs yields pairs only among
    # the first ASSOC_RUN_CAP libs in sorted order
    n = tstage.ASSOC_RUN_CAP + 10
    hub = ray.data.from_items(
        [{"subj": "hub", "pred": "imports", "obj": f"lib:{i:03d}"}
         for i in range(n)])
    res = tstage.lib_associations(hub).take_all()
    cap = tstage.ASSOC_RUN_CAP
    assert len(res) == cap * (cap - 1) // 2
    assert max(max(r["lib_a"], r["lib_b"]) for r in res) == \
        f"lib:{cap - 1:03d}"


def test_repo_cards_brute_force(ray_session):
    """Distinct counts per repo == naive sets; duplicate triples and
    multi-file repos must not double-count."""
    import ray.data
    from nerfray.stages import triples as tstage

    trips = [
        ("o/r1", "imports", "lib:a"), ("o/r1", "imports", "lib:a"),
        ("o/r1", "imports", "lib:b"), ("o/r1", "licensed-under", "license:m"),
        ("o/r1/f1", "defines", "sym:x"), ("o/r1/f1", "calls", "sym:y"),
        ("o/r1/f2", "defines", "sym:x"),  # same sym, new file
        ("o/r2", "licensed-under", "license:m"),
        ("o/r2/f1", "calls", "sym:y"),
    ]
    ds = ray.data.from_items(
        [{"subj": s, "pred": p, "obj": o} for s, p, o in trips]) \
        .repartition(3)
    got = {r["repo"]: (r["n_files"], r["n_libs"], r["n_syms"],
                       r["n_apis"], r["n_licenses"])
           for r in tstage.repo_cards(ds).take_all()}
    assert got == {
        "o/r1": (2, 2, 1, 1, 1),
        "o/r2": (1, 0, 0, 1, 1),
    }


def test_random_walks_deterministic_vs_brute_force(ray_session, tiny_graph):
    """Every node with a proper neighbor starts one length-3 walk; each
    hop is the sha256-argmin neighbor, matching a per-step brute-force
    walk over the symmetrized edge set."""
    import hashlib

    from nerfray.stages import graph

    und = set()
    for a, b in [("a", "x"), ("b", "x"), ("c", "y"), ("x", "y"), ("q", "r")]:
        und.add((a, b))
        und.add((b, a))
    nbrs: dict[str, list[str]] = {}
    for a, b in und:
        nbrs.setdefault(a, []).append(b)

    def nxt(cur: str, step: int) -> str:
        return min(nbrs[cur], key=lambda b: (
            hashlib.sha256(f"{cur}|{step}|{b}".encode()).hexdigest(), b))

    want = {}
    for n in nbrs:
        h1 = nxt(n, 1)
        h2 = nxt(h1, 2)
        h3 = nxt(h2, 3)
        want[n] = (h1, h2, h3)

    got = {r["start"]: (r["hop1"], r["hop2"], r["hop3"])
           for r in graph.random_walks(tiny_graph, length=3).take_all()}
    assert got == want


def test_walk_skipgrams_brute_force(ray_session, tiny_graph):
    """Skip-gram counts equal the naive window-pair count over the
    brute-force walk corpus."""
    import hashlib
    from collections import Counter

    from nerfray.stages import graph

    und = set()
    for a, b in [("a", "x"), ("b", "x"), ("c", "y"), ("x", "y"), ("q", "r")]:
        und.add((a, b))
        und.add((b, a))
    nbrs: dict[str, list[str]] = {}
    for a, b in und:
        nbrs.setdefault(a, []).append(b)

    def nxt(cur: str, step: int) -> str:
        return min(nbrs[cur], key=lambda b: (
            hashlib.sha256(f"{cur}|{step}|{b}".encode()).hexdigest(), b))

    want: Counter = Counter()
    for n in nbrs:
        walk = [n]
        for step in (1, 2, 3):
            walk.append(nxt(walk[-1], step))
        for i in range(4):
            for j in range(4):
                if i != j and abs(i - j) <= graph.SKIPGRAM_WINDOW:
                    want[(walk[i], walk[j])] += 1

    got = {(r["center"], r["context"]): r["n_pairs"]
           for r in graph.walk_skipgrams(tiny_graph, length=3).take_all()}
    assert got == dict(want)


def test_hash_embedding_brute_force(ray_session, tiny_graph):
    """Each (node, dim) value equals the naive ±1 sum over distinct
    proper neighbors; self-loop-only nodes are absent."""
    import hashlib

    from nerfray.stages import graph

    und: dict[str, set] = {}
    for a, b in [("a", "x"), ("b", "x"), ("c", "y"), ("x", "y"), ("q", "r")]:
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)

    want = {}
    for n, ns in und.items():
        for j in range(graph.EMB_HASH_DIMS):
            want[(n, j)] = sum(
                1 if int(hashlib.sha256(b.encode()).hexdigest()[j], 16)
                % 2 == 0 else -1 for b in ns)

    got = {(r["node"], r["dim"]): r["val"]
           for r in graph.hash_embedding(tiny_graph).take_all()}
    assert got == want


def test_taxonomy_closure_vs_brute_force(ray_session):
    """The (pointer-doubling, r5) closure must equal the brute-force
    ancestor chain on a random forest (unique-path DAG), any block
    structure."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from nerfray.stages import graph

    rng = np.random.default_rng(11)
    n = 60
    # random forest: node i>=3 gets one parent < i; 0,1,2 are roots
    parent = {i: int(rng.integers(0, i)) for i in range(3, n)}
    edges = ray.data.from_arrow(pa.Table.from_pydict({
        "child": pa.array(sorted(parent), pa.int64()),
        "parent": pa.array([parent[c] for c in sorted(parent)],
                           pa.int64())})).repartition(4)
    got = {(r["node"], r["anc"]): r["dist"]
           for r in graph.taxonomy_closure(edges).take_all()}
    want = {}
    for i in range(3, n):
        a, d = i, 0
        while a in parent:
            a, d = parent[a], d + 1
            want[(i, a)] = d
    assert got == want and max(want.values()) >= 3


def test_taxonomy_closure_multipath_dag_min_dist(ray_session):
    """The r5 pointer-doubling closure claims EXACT MIN-dist on any
    DAG (the semi-naive version duplicated multi-path pairs): check
    against driver-side BFS over a random multi-parent DAG."""
    from collections import deque

    import numpy as np
    import pyarrow as pa
    import ray.data
    from nerfray.stages import graph

    rng = np.random.default_rng(23)
    n = 40
    ch, par = [], []
    parents: dict[int, list[int]] = {}
    for i in range(2, n):
        k = int(rng.integers(1, 3))  # 1-2 parents -> multiple paths
        ps = sorted(set(rng.integers(0, i, k).tolist()))
        parents[i] = ps
        for p in ps:
            ch.append(i)
            par.append(p)
    edges = ray.data.from_arrow(pa.Table.from_pydict({
        "child": pa.array(ch, pa.int64()),
        "parent": pa.array(par, pa.int64())})).repartition(4)
    got = {(r["node"], r["anc"]): r["dist"]
           for r in graph.taxonomy_closure(edges).take_all()}
    want = {}
    for i in parents:
        dist = {i: 0}
        q = deque([i])
        while q:
            x = q.popleft()
            for p in parents.get(x, []):
                if p not in dist:
                    dist[p] = dist[x] + 1
                    q.append(p)
        for a, d in dist.items():
            if a != i:
                want[(i, a)] = d
    assert got == want
    # multi-path pairs exist (else the fixture is too weak)
    assert any(len(ps) == 2 for ps in parents.values())


def test_scc_fwbw_without_trim(ray_session):
    """trim_rounds=0 forces coloring + backward sweeps to peel chains
    and singletons unaided — the core FW-BW loop must stay exact."""
    import ray.data
    from nerfray.stages.graph import scc_components_fwbw

    # 6-chain into a 4-ring, plus an isolated self-loop
    src = [0, 1, 2, 3, 4, 5, 10, 11, 12, 13, 20]
    dst = [1, 2, 3, 4, 5, 10, 11, 12, 13, 10, 20]
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    got = {r["node"]: r["scc"]
           for r in scc_components_fwbw(
               ray.data.from_arrow(t).repartition(2),
               trim_rounds=0).take_all()}
    want = {i: i for i in range(6)}
    want.update({10 + i: 10 for i in range(4)})
    want[20] = 20
    assert got == want


def test_taxonomy_closure_cycle_raises(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data
    from nerfray.stages import graph

    edges = ray.data.from_arrow(pa.Table.from_pydict({
        "child": pa.array([0, 1], pa.int64()),
        "parent": pa.array([1, 0], pa.int64())}))
    with pytest.raises(ValueError, match="cyclic"):
        graph.taxonomy_closure(edges, max_rounds=6)


def test_domain_violations_vs_brute_force(ray_session, tmp_path):
    """Anti-join domain check must equal a per-entity brute-force
    ancestor-set membership test on the planted tree."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from nerfray.stages import graph

    n_docs, n_classes = 200, 37
    pq.write_table(pa.Table.from_pydict(
        {"doc_id": pa.array(range(n_docs), pa.int64())}),
        tmp_path / "documents.parquet")
    pq.write_table(pa.Table.from_pydict(
        {"vec_id": pa.array(range(n_classes), pa.int64())}),
        tmp_path / "embeddings.parquet")

    got = {(r["entity"], r["rel"])
           for r in graph.domain_violations_planted_query(
               str(tmp_path)).take_all()}

    want = set()
    for e in range(n_docs):
        c = e % n_classes
        typeset = {c}
        while c >= 1:
            c = (c - 1) // graph.TAXO_K
            typeset.add(c)
        rel = (e * 7 + 3) % graph.DOMAIN_N_RELS
        if rel not in typeset:
            want.add((e, rel))
    assert got == want and 0 < len(want) < n_docs


def test_hyperanf_registers_vs_brute_force(ray_session):
    """Propagated registers must equal registers recomputed from the
    exact 2-hop ball on a random digraph."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from nerfray.ops.sketch import _rho, sha64
    from nerfray.stages import graph

    rng = np.random.default_rng(17)
    n, m = 30, 70
    u = rng.integers(0, n, m)
    v = rng.integers(0, n, m)
    edges = ray.data.from_arrow(pa.Table.from_pydict({
        "u": pa.array(u, pa.int64()),
        "v": pa.array(v, pa.int64())})).repartition(4)
    nodes = ray.data.from_arrow(pa.Table.from_pydict(
        {"vec_id": pa.array(range(n), pa.int64())})).repartition(3)
    got = {(r["node"], r["register"]): r["rho_max"]
           for r in graph.hyperanf_registers(edges, nodes).take_all()}

    adj = {}
    for a, b in zip(u, v):
        adj.setdefault(int(a), set()).add(int(b))
    want = {}
    for s in range(n):
        ball = {s}
        for _ in range(graph.HYPERANF_HOPS):
            ball |= {w for x in ball for w in adj.get(x, ())}
        for member in ball:
            reg, rho = _rho(sha64(str(member)))
            key = (s, reg)
            want[key] = max(want.get(key, 0), rho)
    assert got == want


def _sym_planted_adj(n):
    adj = {i: set() for i in range(n)}
    from nerfray.stages import graph
    for i in range(n):
        for o in graph.TRI_OFFSETS:
            adj[i].add((i + o) % n)
            adj[i].add((i - o) % n)
        if i % 3 == 0:
            adj[i].add((i + 1) % n)
            adj[(i + 1) % n].add(i)
    return adj


def test_clustering_coefficient_vs_brute_force(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from nerfray.stages import graph

    n = 61
    pq.write_table(pa.Table.from_pydict(
        {"vec_id": pa.array(range(n), pa.int64())}),
        tmp_path / "embeddings.parquet")
    adj = _sym_planted_adj(n)
    got = {r["node"]: (r["n_tri"], r["n_wedges"], r["cc_permille"])
           for r in graph.clustering_planted_query(
               str(tmp_path)).take_all()}
    assert set(got) == set(range(n))
    degs = set()
    for u in range(n):
        ns = sorted(adj[u])
        tri = sum(1 for i, a in enumerate(ns) for b in ns[i + 1:]
                  if b in adj[a])
        deg = len(ns)
        wedges = deg * (deg - 1) // 2
        degs.add(deg)
        assert got[u] == (tri, wedges,
                          (1000 * tri) // wedges if wedges else 0)
    assert len(degs) >= 2  # the ±1 extras really vary degree


def test_link_prediction_vs_brute_force(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from nerfray.stages import graph

    n = 53
    pq.write_table(pa.Table.from_pydict(
        {"vec_id": pa.array(range(n), pa.int64())}),
        tmp_path / "embeddings.parquet")
    adj = _sym_planted_adj(n)
    want = {}
    for z in range(n):
        ns = sorted(adj[z])
        for i, a in enumerate(ns):
            for b in ns[i + 1:]:
                if b not in adj[a]:
                    want[(a, b)] = want.get((a, b), 0) \
                        + 1_000_000_000 // len(adj[z])
    got = {(r["u"], r["w"]): r["score"]
           for r in graph.link_prediction_planted_query(
               str(tmp_path)).take_all()}
    assert got == want and len(want) > 0


def test_negative_samples_vs_brute_force(ray_session):
    """Deterministic corruption must hit vocab[(idx+1+len(s)) mod ...]
    and every surviving negative must be absent from the positives."""
    import ray.data
    from nerfray.stages import triples as tstage

    subjs = ["r/a", "r/bb", "r/ccc", "r/dddd", "q/e"]
    vocab = ["lib:a", "lib:b", "lib:c", "lib:d"]
    pos = [(s, vocab[(i + j) % 4])
           for i, s in enumerate(subjs) for j in range(2)]
    ds = ray.data.from_arrow(pa.Table.from_pydict({
        "subj": pa.array([p[0] for p in pos]),
        "pred": pa.array(["imports"] * len(pos)),
        "obj": pa.array([p[1] for p in pos])})).repartition(3)

    got = {(r["subj"], r["obj_neg"])
           for r in tstage.negative_samples(ds).take_all()}

    v = sorted(vocab)
    pos_set = set(pos)
    want = set()
    for s, o in pos:
        neg = v[(v.index(o) + 1 + len(s) % (len(v) - 1)) % len(v)]
        assert neg != o
        if (s, neg) not in pos_set:
            want.add((s, neg))
    assert got == want and 0 < len(want) < len(pos)


def test_khop_sample_fanout_caps_and_determinism(ray_session):
    """Hash-order 2-hop sampling: per-seed hop-1 rows <= f1, per-parent
    hop-2 rows <= f2, a hub's contribution is capped like anyone
    else's, and the sample is invariant under repartitioning."""
    import ray.data
    from nerfray.stages.graph import khop_sample

    # star: hub H linked to 10 spokes + a chain c0-c1-c2
    subj = [f"s{i}" for i in range(10)] + ["c0", "c1"]
    obj = ["H"] * 10 + ["c1", "c2"]
    t = pa.table({"subj": pa.array(subj, pa.string()),
                  "obj": pa.array(obj, pa.string())})
    ds = ray.data.from_arrow(t)
    rows = sorted((r["seed"], r["hop"], r["parent"], r["node"])
                  for r in khop_sample(ds, f1=3, f2=2).take_all())
    from collections import Counter
    h1 = Counter(s for s, h, p, n in rows if h == 1)
    assert max(h1.values()) <= 3
    # hub H has degree 10 but emits exactly f1 hop-1 rows
    assert h1["H"] == 3
    # hop-2 rows per (seed, parent) <= f2
    h2 = Counter((s, p) for s, h, p, n in rows if h == 2)
    assert max(h2.values()) <= 2
    # every spoke's hop-1 sample is its only neighbor (degree 1)
    assert (("s0", 1, "s0", "H") in rows)
    # partition invariance
    rows2 = sorted((r["seed"], r["hop"], r["parent"], r["node"])
                   for r in khop_sample(ds.repartition(5), f1=3,
                                        f2=2).take_all())
    assert rows == rows2


def test_scc_components_vs_brute_force(ray_session):
    """Path-doubling SCC == brute-force Tarjan on a random digraph with
    cycles, self-loops, and disconnected parts."""
    import random

    import ray.data
    from nerfray.stages.graph import scc_components

    rng = random.Random(7)
    n = 60
    edges = set()
    # random sparse digraph + two planted cycles
    for _ in range(120):
        edges.add((rng.randrange(n), rng.randrange(n)))
    for c in ([3, 17, 42, 8], [50, 51]):
        for i in range(len(c)):
            edges.add((c[i], c[(i + 1) % len(c)]))
    src = [u for u, v in sorted(edges)]
    dst = [v for u, v in sorted(edges)]
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    got = {r["node"]: r["scc"]
           for r in scc_components(ray.data.from_arrow(t).repartition(4),
                                   diameter_hint=64).take_all()}

    # brute force: mutual reachability via Floyd-Warshall closure
    import numpy as np
    reach = np.eye(n, dtype=bool)
    for u, v in edges:
        reach[u, v] = True
    for k in range(n):
        reach |= np.outer(reach[:, k], reach[k, :])
    nodes = sorted({u for e in edges for u in e})
    want = {}
    for v in nodes:
        mutual = [u for u in nodes if reach[v][u] and reach[u][v]]
        want[v] = min(mutual)
    assert got == want
    # the planted cycles are mutually reachable -> shared labels
    assert want[17] == want[3] == want[42] == want[8]
    assert want[51] == want[50]


def test_scc_components_past_2_21_ids(ray_session):
    """The r4 verdict's one weak spot: the packed (node << 21) | desc
    key capped ids at 2^21. The bucket-local dense-code rework must be
    exact at file-grain id magnitudes — same ring+chain structure
    shifted to ~2^40."""
    import ray.data
    from nerfray.stages.graph import scc_components

    base = 1 << 40
    src, dst = [], []
    # an 8-ring and an 8-chain, bridged ring -> chain
    for i in range(8):
        src.append(base + i)
        dst.append(base + (i + 1) % 8)
    for i in range(7):
        src.append(base + 100 + i)
        dst.append(base + 100 + i + 1)
    src.append(base)
    dst.append(base + 100)
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    got = {r["node"]: r["scc"]
           for r in scc_components(ray.data.from_arrow(t).repartition(3),
                                   diameter_hint=16).take_all()}
    want = {base + i: base for i in range(8)}
    want.update({base + 100 + i: base + 100 + i for i in range(8)})
    assert got == want


def test_scc_fwbw_vs_brute_force(ray_session):
    """The production FW-BW (trim + coloring) path must agree with
    Tarjan-style brute force on a random digraph with cycles,
    self-loops, chains, and disconnected parts — and with the
    path-doubling operator."""
    import random

    import numpy as np
    import ray.data
    from nerfray.stages.graph import scc_components, scc_components_fwbw

    rng = random.Random(11)
    n = 40
    edges = set()
    for _ in range(70):
        edges.add((rng.randrange(n), rng.randrange(n)))
    for c in ([2, 19, 33, 7], [24, 25], [38]):  # cycles + self-loop
        for i in range(len(c)):
            edges.add((c[i], c[(i + 1) % len(c)]))
    src = [u for u, v in sorted(edges)]
    dst = [v for u, v in sorted(edges)]
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    ds = ray.data.from_arrow(t).repartition(4)
    got = {r["node"]: r["scc"]
           for r in scc_components_fwbw(ds).take_all()}

    reach = np.eye(n, dtype=bool)
    for u, v in edges:
        reach[u, v] = True
    for k in range(n):
        reach |= np.outer(reach[:, k], reach[k, :])
    nodes = sorted({u for e in edges for u in e})
    want = {v: min(u for u in nodes if reach[v][u] and reach[u][v])
            for v in nodes}
    assert got == want
    # each node assigned exactly once (partition into SCCs)
    assert len(got) == len(nodes)
    # agrees with the path-doubling operator
    pd = {r["node"]: r["scc"]
          for r in scc_components(ds, diameter_hint=64).take_all()}
    assert got == pd


def test_scc_fwbw_past_2_21_ids_and_planted(ray_session):
    """FW-BW on the planted ring/chain/bridge digraph at ids ~2^40:
    rings collapse to their min id, chain + dangling nodes are
    singletons (trim handles the chains, coloring+BW the rings)."""
    import ray.data
    from nerfray.stages.graph import scc_components_fwbw

    base = (1 << 40) + 7
    src, dst = [], []
    for g0 in (base, base + 1000):            # two 8-rings
        for i in range(8):
            src.append(g0 + i)
            dst.append(g0 + (i + 1) % 8)
    for i in range(7):                        # an 8-chain
        src.append(base + 500 + i)
        dst.append(base + 500 + i + 1)
    src.append(base)                          # bridge ring1 -> chain
    dst.append(base + 500)
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    got = {r["node"]: r["scc"]
           for r in scc_components_fwbw(
               ray.data.from_arrow(t).repartition(3)).take_all()}
    want = {}
    for g0 in (base, base + 1000):
        want.update({g0 + i: g0 for i in range(8)})
    want.update({base + 500 + i: base + 500 + i for i in range(8)})
    assert got == want


def test_boruvka_mst_vs_kruskal(ray_session):
    # random connected graph, unique weights -> unique MST; compare the
    # distributed Boruvka against a driver-side Kruskal
    import numpy as np

    import ray.data
    from nerfray.stages.graph import boruvka_mst

    rng = np.random.default_rng(7)
    n = 60
    edges = [(i, i + 1) for i in range(n - 1)]  # spanning backbone
    extra = set()
    while len(extra) < 80:
        u, v = sorted(rng.integers(0, n, 2).tolist())
        if u != v and (u, v) not in edges:
            extra.add((u, v))
    edges += sorted(extra)
    ws = rng.permutation(len(edges)) * 7 + 3  # unique
    t = pa.Table.from_pydict({
        "u": pa.array([e[0] for e in edges], pa.int64()),
        "v": pa.array([e[1] for e in edges], pa.int64()),
        "w": pa.array(ws, pa.int64()),
    })
    got = {(r["u"], r["v"], r["w"])
           for r in boruvka_mst(
               ray.data.from_arrow(t).repartition(4)).take_all()}

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    want = set()
    for w, (u, v) in sorted(zip(ws.tolist(), edges)):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            want.add((u, v, w))
    assert got == want
    assert len(got) == n - 1


def test_boruvka_distributed_contraction_path(ray_session, monkeypatch):
    """Force the fully distributed contraction (star-CC + relabel
    joins) by dropping the adaptive broadcast bound to 0 — its MST
    must equal the (default) driver-side union-find path's."""
    import numpy as np
    import ray.data
    from nerfray.stages import graph as G

    rng = np.random.default_rng(3)
    n = 40
    edges = [(i, i + 1) for i in range(n - 1)]
    extra = set()
    while len(extra) < 40:
        u, v = sorted(rng.integers(0, n, 2).tolist())
        if u != v and (u, v) not in edges:
            extra.add((u, v))
    edges = edges + sorted(extra)
    ws = rng.permutation(len(edges)) * 7 + 1
    t = pa.table({"u": pa.array([e[0] for e in edges], pa.int64()),
                  "v": pa.array([e[1] for e in edges], pa.int64()),
                  "w": pa.array(ws, pa.int64())})
    ds = ray.data.from_arrow(t).repartition(4)
    fast = {(r["u"], r["v"], r["w"])
            for r in G.boruvka_mst(ds).take_all()}
    monkeypatch.setattr(G, "MST_BCAST_ROWS", 0)
    dist = {(r["u"], r["v"], r["w"])
            for r in G.boruvka_mst(ds).take_all()}
    assert dist == fast
    assert len(dist) == n - 1


def test_mst_planted_fixture_is_all_light_edges(ray_session):
    # the planted chain+skip fixture's unique MST is exactly the light
    # edges (cycle property): check the arithmetic against Kruskal on a
    # small n so the SQL oracle's closed form is pinned in-process
    import numpy as np

    import ray.data
    from nerfray.stages.graph import planted_mst_edges

    n = 40
    ids = ray.data.from_arrow(pa.Table.from_pydict(
        {"vec_id": pa.array(np.arange(n), pa.int64())}))
    es = planted_mst_edges(ids, n).take_all()
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mst = set()
    for e in sorted(es, key=lambda r: r["w"]):
        ru, rv = find(e["u"]), find(e["v"])
        if ru != rv:
            parent[ru] = rv
            mst.add((e["u"], e["v"]))
    want = {(i, i + 1) for i in range(n - 1) if i % 5 != 0} \
        | {(i, i + 2) for i in range(0, n - 2, 5)}
    assert mst == want


def test_sssp_paths_vs_dijkstra(ray_session):
    """dist + min-id-parent tree equals the brute-force bounded-round
    Bellman-Ford with the
    same deterministic tie-break, on the planted weighted graph."""
    import ray.data as rd

    from nerfray.stages.graph import (SSSP_WEIGHTS, sssp_paths)

    n = 37
    edges = [(u, (u + o) % n, w) for u in range(n)
             for o, w in SSSP_WEIGHTS.items()]

    # brute force: the EXACT bounded-round semantics — Bellman-Ford
    # layers d_0..d_R, parent(v) = min u with d_{R-1}(u) + w = d_R(v)
    rounds = 8
    layers = [{0: 0}]
    for _ in range(rounds):
        nxt = dict(layers[-1])
        for u, v, w in edges:
            if u in layers[-1]:
                cand = layers[-1][u] + w
                if cand < nxt.get(v, 1 << 60):
                    nxt[v] = cand
        layers.append(nxt)
    dist, prev = layers[rounds], layers[rounds - 1]
    parent = {0: -1}
    for v in dist:
        if v == 0:
            continue
        preds = [u for u, vv, w in edges
                 if vv == v and u in prev and prev[u] + w == dist[v]]
        parent[v] = min(preds)

    e = rd.from_items([{"u": u, "v": v, "w": w}
                       for u, v, w in edges]).repartition(2)
    seeds = rd.from_items([{"node": 0}]).repartition(1)
    got = {r["node"]: (r["dist"], r["parent"])
           for r in sssp_paths(e, seeds, rounds=rounds).take_all()}
    want = {v: (dist[v], parent[v]) for v in dist}
    assert got == want


def _emulate_greedy_matching(edges):
    """Reference: the same deterministic mutual-proposal rounds."""
    live = set(map(tuple, edges))
    matched = []
    while live:
        nbrs = {}
        for u, v in live:
            nbrs.setdefault(u, set()).add(v)
            nbrs.setdefault(v, set()).add(u)
        prop = {u: min(ns) for u, ns in nbrs.items()}
        new = {(min(u, p), max(u, p)) for u, p in prop.items()
               if prop.get(p) == u}
        assert new, "greedy matching must progress"
        matched.extend(sorted(new))
        gone = {x for ab in new for x in ab}
        live = {(u, v) for u, v in live
                if u not in gone and v not in gone}
    return sorted(matched)


def test_greedy_matching_vs_emulation(ray_session):
    import ray.data
    from nerfray.stages.graph import greedy_matching
    rng = np.random.default_rng(13)
    for trial in range(3):
        n = 40
        raw = rng.integers(0, n, size=(60 + 15 * trial, 2))
        edges = sorted({(int(a), int(b)) for a, b in raw if a != b})
        ds = ray.data.from_items(
            [{"u": u, "v": v} for u, v in edges]).repartition(3)
        got = sorted((r["a"], r["b"])
                     for r in greedy_matching(ds).take_all())
        assert got == _emulate_greedy_matching(edges)
        # maximal: every input edge touches a matched node
        gone = {x for ab in got for x in ab}
        assert all(u in gone or v in gone for u, v in edges)
        # a matching: no node appears twice
        flat = [x for ab in got for x in ab]
        assert len(flat) == len(set(flat))


def _emulate_greedy_mis(nodes, edges):
    """Reference: min-id Luby rounds + edge-free survivors."""
    live = set(map(tuple, edges))
    alive = set(nodes)
    mis = []
    while live:
        nbrs = {}
        for u, v in live:
            nbrs.setdefault(u, set()).add(v)
            nbrs.setdefault(v, set()).add(u)
        winners = {u for u, ns in nbrs.items() if u < min(ns)}
        assert winners, "MIS must progress"
        mis.extend(winners)
        gone = set(winners)
        for w in winners:
            gone |= nbrs[w]
        alive -= gone
        live = {(u, v) for u, v in live
                if u not in gone and v not in gone}
    # survivors (nodes never touched by a winner's closed nbhd) are
    # edge-free by construction and all join the set
    return sorted(mis + list(alive))


def test_greedy_mis_vs_emulation(ray_session):
    import ray.data
    from nerfray.stages.graph import greedy_mis
    rng = np.random.default_rng(29)
    for trial in range(3):
        n = 36
        raw = rng.integers(0, n, size=(50 + 12 * trial, 2))
        edges = sorted({(int(a), int(b)) for a, b in raw if a != b})
        nodes = list(range(n))
        e_ds = ray.data.from_items(
            [{"u": u, "v": v} for u, v in edges]).repartition(3)
        n_ds = ray.data.from_items(
            [{"node": x} for x in nodes]).repartition(2)
        got = sorted(r["node"]
                     for r in greedy_mis(e_ds, n_ds).take_all())
        assert got == _emulate_greedy_mis(nodes, edges)
        # independence: no edge inside the set
        s = set(got)
        assert not any(u in s and v in s for u, v in edges)
        # maximality: every non-member has a member neighbor
        nbrs = {}
        for u, v in edges:
            nbrs.setdefault(u, set()).add(v)
            nbrs.setdefault(v, set()).add(u)
        for x in nodes:
            if x not in s:
                assert nbrs.get(x, set()) & s


def test_nearest_landmarks_vs_brute(ray_session):
    """(dist, landmark) Voronoi assignment equals brute-force
    multi-source BFS with min-landmark tie-break."""
    import collections

    import ray.data
    from nerfray.stages.graph import nearest_landmarks

    n = 50
    edges = [(u, (u + o) % n) for u in range(n) for o in (7, 13, 20)]
    lms = [0, 17, 31]
    hops = 3

    best = {lm: (0, lm) for lm in lms}
    frontier = dict(best)
    adj = collections.defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
    for _ in range(hops):
        nxt = {}
        for u, (d, lm) in frontier.items():
            for v in adj[u]:
                cand = (d + 1, lm)
                if cand < best.get(v, (1 << 30, 0)) \
                        and cand < nxt.get(v, (1 << 30, 0)):
                    nxt[v] = cand
        frontier = {}
        for v, c in nxt.items():
            if c < best.get(v, (1 << 30, 0)):
                best[v] = c
                frontier[v] = c
    e_ds = ray.data.from_items(
        [{"u": u, "v": v} for u, v in edges]).repartition(3)
    lm_ds = ray.data.from_items([{"node": x} for x in lms])
    got = {r["node"]: (r["dist"], r["landmark"])
           for r in nearest_landmarks(e_ds, lm_ds,
                                      max_hops=hops).take_all()}
    assert got == best
