"""Distributed graph analytics over the materialized triple table.

Both algorithms keep the edge set resident in the object store as a
Dataset — the driver never holds an edge-proportional container
(tests/test_graph.py::test_no_edge_proportional_driver_state pins this):

- **PageRank** — the rank vector is the aggregate-to-small side (node-
  sized); edges are integer-encoded once, then every iteration is
  broadcast(rank) -> per-block ``np.bincount`` partial sums inside
  ``map_batches`` -> one small ``groupby(node).sum`` reduce.  Driver
  memory is O(nodes) (the rank/out-degree vectors), never O(edges).
- **Connected components** — the alternating large-star / small-star
  algorithm (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC'14): each round is two ``groupby(node).map_groups``
  passes over the edge Dataset; convergence is detected with an
  order-independent per-block checksum (block-count-sized driver fetch).
  Driver memory is O(num_blocks) scalars — no node or edge map at all.
  Converges in O(log n) rounds to edges (v, min-of-component), which is
  exactly the recursive-CTE oracle's (node, component=min node) answer.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import ray
import ray.data

# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def _degree_partial(batch: pa.Table) -> pa.Table:
    """Block combiner: per-node out-degree partials (+0 rows for targets,
    so the node table is complete after one groupby)."""
    from collections import Counter
    cnt: Counter = Counter(batch.column("subj").to_pylist())
    for o in batch.column("obj").to_pylist():
        cnt.setdefault(o, 0)
    ks = sorted(cnt)
    return pa.Table.from_pydict({
        "node": pa.array(ks, pa.string()),
        "outp": pa.array([cnt[k] for k in ks], pa.int64()),
    })


# -- distributed dense node-id assignment -----------------------------------
#
# The driver must never hold node STRINGS (at file grain a 100 TB corpus
# has 10^9+ nodes; a node-string list / {node: i} dict is tens of GB).
# Dense int ids are assigned distributively by per-bucket offset
# enumeration: bucket = siphash(node) % B, nodes enumerated (sorted)
# inside each bucket group, and the driver only ever sees the B
# per-bucket COUNTS (64 ints) from which it derives the offset vector:
# id = offset[bucket] + local_index.  Deterministic across runs and
# parallelism levels (fixed-key siphash + in-bucket sort).

N_ID_BUCKETS = 64


def _node_bucket(batch: pa.Table) -> pa.Table:
    import pandas as pd
    arr = np.asarray(batch.column("node").to_pylist(), dtype=object)
    nb = (pd.util.hash_array(arr) % N_ID_BUCKETS).astype(np.int32)
    return batch.append_column("nb", pa.array(nb))


def _enumerate_bucket(group: pa.Table) -> pa.Table:
    nodes = np.asarray(group.column("node").to_pylist(), dtype=object)
    order = np.argsort(nodes, kind="stable")
    li = np.empty(len(nodes), dtype=np.int64)
    li[order] = np.arange(len(nodes))
    return group.append_column("li", pa.array(li, pa.int64()))


_ENC_SCHEMA = pa.schema([
    ("key", pa.string()),   # join key: node string
    ("other", pa.string()),  # edge rows pass 1: the obj endpoint
    ("src", pa.int64()),    # edge rows pass 2: already-encoded source
    ("id", pa.int64()),     # id rows: the dense node id
])


def _edges_as_enc_left(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.Table.from_pydict({
        "key": batch.column("subj"),
        "other": batch.column("obj"),
        "src": pa.array([None] * n, pa.int64()),
        "id": pa.array([None] * n, pa.int64()),
    }, schema=_ENC_SCHEMA)


def _ids_as_enc_right(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.Table.from_pydict({
        "key": batch.column("node"),
        "other": pa.array([None] * n, pa.string()),
        "src": pa.array([None] * n, pa.int64()),
        "id": batch.column("id"),
    }, schema=_ENC_SCHEMA)


def _enc_bucket(batch: pa.Table) -> pa.Table:
    import pandas as pd
    arr = np.asarray(batch.column("key").to_pylist(), dtype=object)
    hb = (pd.util.hash_array(arr) % N_ID_BUCKETS).astype(np.int32)
    return batch.append_column("hb", pa.array(hb))


def _enc_join(group: pa.Table, *, pass_no: int) -> pa.Table:
    """One co-group join bucket: resolve the key endpoint of every edge
    row against the id rows (vectorized pandas hash-join inside the
    bucket).  Pass 1 emits (key=other, src=resolved); pass 2 emits the
    final (src, dst) int edge rows."""
    import pandas as pd
    import pyarrow.compute as pc
    is_id = pc.is_valid(group.column("id"))
    ids = group.filter(is_id)
    edges = group.filter(pc.invert(is_id))
    if edges.num_rows == 0:
        if pass_no == 1:
            return _ENC_SCHEMA.empty_table()
        return pa.Table.from_pydict({
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64())})
    id_df = pd.DataFrame({
        "key": ids.column("key").to_pylist(),
        "nid": ids.column("id").to_pylist()})
    e_df = pd.DataFrame({"key": edges.column("key").to_pylist()})
    merged = e_df.merge(id_df, on="key", how="left")
    nid = merged["nid"].to_numpy(dtype=np.int64)
    if pass_no == 1:
        n = edges.num_rows
        return pa.Table.from_pydict({
            "key": edges.column("other"),
            "other": pa.array([None] * n, pa.string()),
            "src": pa.array(nid, pa.int64()),
            "id": pa.array([None] * n, pa.int64()),
        }, schema=_ENC_SCHEMA)
    return pa.Table.from_pydict({
        "src": edges.column("src"),
        "dst": pa.array(nid, pa.int64()),
    })


def _encode_edges_distributed(edges: ray.data.Dataset,
                              ids: ray.data.Dataset) -> ray.data.Dataset:
    """(subj, obj) string edges -> (src, dst) int edges via two
    hash-bucket co-group joins against the (node, id) Dataset — the
    node-id table never leaves the object store."""
    id_rows = ids.map_batches(_ids_as_enc_right, batch_format="pyarrow")
    p1 = edges.map_batches(_edges_as_enc_left, batch_format="pyarrow") \
        .union(id_rows) \
        .map_batches(_enc_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(
            _enc_join, fn_kwargs={"pass_no": 1}, batch_format="pyarrow")
    return p1.union(id_rows) \
        .map_batches(_enc_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(
            _enc_join, fn_kwargs={"pass_no": 2}, batch_format="pyarrow")


def _contrib_partial(batch: pa.Table, *, contrib_ref) -> pa.Table:
    """Sparse per-block partial sums of damped contributions per target."""
    contrib = ray.get(contrib_ref) \
        if isinstance(contrib_ref, ray.ObjectRef) else contrib_ref
    src = batch.column("src").to_numpy(zero_copy_only=False)
    dst = batch.column("dst").to_numpy(zero_copy_only=False)
    sums = np.bincount(dst, weights=contrib[src])
    nz = np.nonzero(sums)[0]
    return pa.Table.from_pydict({
        "i": pa.array(nz, pa.int32()),
        "p": pa.array(sums[nz], pa.float64()),
    })


def pagerank(triples: ray.data.Dataset, *, damping: float = 0.85,
             iters: int = 20,
             restart_nodes: list[str] | None = None) -> ray.data.Dataset:
    """PageRank over the (directed) triple graph, multi-edges counted.

    ``restart_nodes`` turns this into PERSONALIZED PageRank: the
    restart mass (and dangling redistribution) goes uniformly to the
    given seed nodes instead of all nodes, and the iteration starts
    from the seed distribution.  Seed-id lookup is a bounded
    (seed-proportional) driver fetch against the Dataset-resident
    (node, id) table — never node-proportional.

    Fully distributed encoding: node strings NEVER reach the driver.
    Dense int ids are assigned by per-bucket offset enumeration (driver
    sees only the B bucket counts), edges are int-encoded through two
    hash-bucket co-group joins against the Dataset-resident (node, id)
    table, and the output decorates that table with the broadcast rank
    vector.  Driver memory is two dense numeric vectors (out-degree +
    rank, O(nodes) floats — the aggregate-to-small side by
    construction); for node counts beyond driver RAM use
    ``pagerank_dataset_rank`` (rank sharded as a Dataset, iterations
    as hash_join exchanges — bit-equal on the planted graph, ~3
    fixed-cost exchanges per iteration).  Each power
    iteration broadcasts the damped-contribution vector, computes
    sparse per-target partial sums per block (``np.bincount``), and
    reduces with ``groupby(i).sum``.  Deterministic up to
    float-summation order (fixed iteration count; partial-sum order
    depends on block boundaries, so agreement with a dense reference is
    ~1e-12-ish, not bit-exact)."""
    edges = triples.select_columns(["subj", "obj"])
    deg = edges.map_batches(_degree_partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("node").sum("outp") \
        .rename_columns({"sum(outp)": "outp"})

    # distributed dense-id assignment: driver sees only B bucket counts
    local = deg.map_batches(_node_bucket, batch_format="pyarrow") \
        .groupby("nb").map_groups(_enumerate_bucket,
                                  batch_format="pyarrow").materialize()
    counts = np.zeros(N_ID_BUCKETS, dtype=np.int64)
    for row in local.groupby("nb").count().take_all():  # <= B rows
        counts[row["nb"]] = row["count()"]
    offsets = np.r_[0, np.cumsum(counts)[:-1]]
    n = int(counts.sum())
    if n == 0:
        return ray.data.from_arrow(pa.Table.from_pydict(
            {"node": pa.array([], pa.string()),
             "rank": pa.array([], pa.float64())}))
    off_ref = ray.put(offsets)

    def _assign(batch: pa.Table) -> pa.Table:
        off = ray.get(off_ref) if isinstance(off_ref, ray.ObjectRef) \
            else off_ref
        nb = batch.column("nb").to_numpy(zero_copy_only=False)
        li = batch.column("li").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "node": batch.column("node"),
            "id": pa.array(off[nb] + li, pa.int64()),
            "outp": batch.column("outp"),
        })

    ids = local.map_batches(_assign, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    # numeric-only driver state: out-degree vector indexed by dense id
    outs = np.zeros(n, dtype=np.float64)
    for b in ids.select_columns(["id", "outp"]).iter_batches(
            batch_format="pyarrow"):
        outs[b.column("id").to_numpy(zero_copy_only=False)] = \
            b.column("outp").to_numpy(zero_copy_only=False)

    iedges = _encode_edges_distributed(edges, ids).materialize()

    if restart_nodes is None:
        e = np.full(n, 1.0 / n)
    else:
        seeds = set(restart_nodes)

        def _seed_rows(batch: pa.Table) -> pa.Table:
            mask = pa.compute.is_in(
                batch.column("node"),
                value_set=pa.array(sorted(seeds), pa.string()))
            return batch.filter(mask).select(["id"])

        seed_ids = [r["id"] for r in ids.map_batches(
            _seed_rows, batch_format="pyarrow",
            zero_copy_batch=True).take_all()]  # <= len(seeds) rows
        if not seed_ids:
            raise ValueError("restart_nodes matched no graph node")
        e = np.zeros(n)
        e[np.asarray(seed_ids, np.int64)] = 1.0 / len(seed_ids)

    rank = e.copy()
    dangling = outs == 0
    for _ in range(iters):
        contrib = np.where(outs > 0, rank / np.maximum(outs, 1.0), 0.0)
        contrib_ref = ray.put(contrib)
        red = iedges.map_batches(
            _contrib_partial, fn_kwargs={"contrib_ref": contrib_ref},
            batch_format="pyarrow", zero_copy_batch=True) \
            .groupby("i").sum("p")
        nxt = (1.0 - damping + damping * rank[dangling].sum()) * e
        for b in red.iter_batches(batch_format="pyarrow"):  # numeric only
            ii = b.column("i").to_numpy(zero_copy_only=False)
            pp = b.column("sum(p)").to_numpy(zero_copy_only=False)
            nxt[ii] += damping * pp
        rank = nxt

    # distributed output join: broadcast the dense rank vector once and
    # decorate the Dataset-resident (node, id) table — node strings
    # never reach the driver.
    rank_ref = ray.put(rank)

    def _attach_rank(batch: pa.Table) -> pa.Table:
        rv = ray.get(rank_ref) if isinstance(rank_ref, ray.ObjectRef) \
            else rank_ref
        ii = batch.column("id").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "node": batch.column("node"),
            "rank": pa.array(rv[ii], pa.float64()),
        })

    return ids.map_batches(_attach_rank, batch_format="pyarrow",
                           zero_copy_batch=True)


_PR_SCHEMA = pa.schema([
    ("k", pa.int64()),      # rank/skel: node id | edge: src | partial: dst
    ("v", pa.int64()),      # edge: dst
    ("outp", pa.float64()),  # rank/skel: out-degree
    ("rank", pa.float64()),  # rank rows only
    ("p", pa.float64()),    # partial rows only: contribution sum
    ("side", pa.int8()),    # 0 = rank, 1 = edge, 2 = partial, 3 = skeleton
    ("hb", pa.int32()),
])


def _pr_contrib_bucket(group: pa.Table) -> pa.Table:
    """One PageRank round, stage A (bucket = hash of src/id): join the
    co-located rank rows to the co-located out-edges by sorted-array
    lookup and emit per-dst PRE-COMBINED contribution partials."""
    if group.num_rows == 0:
        return _PR_SCHEMA.empty_table()
    side = group.column("side").to_numpy(zero_copy_only=False)
    k = group.column("k").to_numpy(zero_copy_only=False)
    is_r = side == 0
    if not is_r.any():
        return _PR_SCHEMA.empty_table()
    nodes = k[is_r]
    order = np.argsort(nodes, kind="stable")
    nodes = nodes[order]
    outp = group.column("outp").to_numpy(
        zero_copy_only=False)[is_r][order]
    rank = group.column("rank").to_numpy(
        zero_copy_only=False)[is_r][order]
    contrib = np.where(outp > 0, rank / np.maximum(outp, 1.0), 0.0)
    is_e = side == 1
    eu = k[is_e]
    idx = np.searchsorted(nodes, eu)
    idx[idx >= len(nodes)] = 0
    hit = nodes[idx] == eu
    ev = group.column("v").to_numpy(zero_copy_only=False)[is_e][hit]
    ec = contrib[idx[hit]]
    # per-dst combine inside the bucket (sort + reduceat)
    o2 = np.argsort(ev, kind="stable")
    d_s, c_s = ev[o2], ec[o2]
    starts = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
    dst = d_s[starts]
    p = np.add.reduceat(c_s, starts) if len(c_s) else c_s
    z = np.zeros(len(dst), np.float64)
    return pa.Table.from_pydict({
        "k": dst, "v": np.zeros(len(dst), np.int64), "outp": z,
        "rank": z, "p": p,
        "side": np.full(len(dst), 2, np.int8),
        "hb": (dst % N_ID_BUCKETS).astype(np.int32),
    }, schema=_PR_SCHEMA)


def _pr_rank_bucket(group: pa.Table, *, base: float,
                    damping: float) -> pa.Table:
    """Stage B (bucket = hash of id/dst): sum the contribution partials
    per node and rebuild the rank rows from the co-located skeleton."""
    if group.num_rows == 0:
        return _PR_SCHEMA.empty_table()
    side = group.column("side").to_numpy(zero_copy_only=False)
    k = group.column("k").to_numpy(zero_copy_only=False)
    is_s = side == 3
    if not is_s.any():
        return _PR_SCHEMA.empty_table()
    nodes = k[is_s]
    order = np.argsort(nodes, kind="stable")
    nodes = nodes[order]
    outp = group.column("outp").to_numpy(
        zero_copy_only=False)[is_s][order]
    is_p = side == 2
    pd_, pp = k[is_p], group.column("p").to_numpy(
        zero_copy_only=False)[is_p]
    o2 = np.argsort(pd_, kind="stable")
    pd_s, pp_s = pd_[o2], pp[o2]
    starts = np.flatnonzero(np.r_[True, pd_s[1:] != pd_s[:-1]])
    sums = np.zeros(len(nodes), np.float64)
    if len(pd_s):
        pos = np.searchsorted(nodes, pd_s[starts])
        sums[pos] = np.add.reduceat(pp_s, starts)
    rank = base + damping * sums
    z = np.zeros(len(nodes), np.float64)
    return pa.Table.from_pydict({
        "k": nodes, "v": np.zeros(len(nodes), np.int64), "outp": outp,
        "rank": rank, "p": z,
        "side": np.zeros(len(nodes), np.int8),
        "hb": (nodes % N_ID_BUCKETS).astype(np.int32),
    }, schema=_PR_SCHEMA)


def pagerank_dataset_rank(triples: ray.data.Dataset, *,
                          damping: float = 0.85,
                          iters: int = 20) -> ray.data.Dataset:
    """The beyond-driver-RAM PageRank path: the rank vector never
    exists as a driver array — it lives as a Dataset (id, outp, rank)
    and each power iteration is TWO node-hash bucket co-groups (rank ∪
    src-bucketed edges → pre-combined (dst, p) partials; skeleton ∪
    partials → new rank rows), the fused-round shape shared with
    ``_min_relax_rounds``.  The driver holds only SCALARS (n,
    per-iteration dangling mass).  2 exchanges ×
    iters of fixed shuffle cost, so use it when nodes outgrow driver
    RAM (~10^10 raw-float ranks at repo grain); the broadcast-vector
    ``pagerank`` is the fast path below that.  On the dyadic-exact
    planted graph both paths are BIT-equal (pinned by
    tests/test_graph.py); on irregular graphs they agree to float-
    summation order like any distributed reduce."""
    from nerfray.ops.joins import hash_join

    edges = triples.select_columns(["subj", "obj"])
    deg = edges.map_batches(_degree_partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("node").sum("outp") \
        .rename_columns({"sum(outp)": "outp"})
    local = deg.map_batches(_node_bucket, batch_format="pyarrow") \
        .groupby("nb").map_groups(_enumerate_bucket,
                                  batch_format="pyarrow").materialize()
    counts = np.zeros(N_ID_BUCKETS, dtype=np.int64)
    for row in local.groupby("nb").count().take_all():  # <= B rows
        counts[row["nb"]] = row["count()"]
    offsets = np.r_[0, np.cumsum(counts)[:-1]]
    n = int(counts.sum())
    if n == 0:
        return ray.data.from_arrow(pa.Table.from_pydict(
            {"node": pa.array([], pa.string()),
             "rank": pa.array([], pa.float64())}))
    off_ref = ray.put(offsets)

    def _assign(batch: pa.Table) -> pa.Table:
        off = ray.get(off_ref) if isinstance(off_ref, ray.ObjectRef) \
            else off_ref
        nb = batch.column("nb").to_numpy(zero_copy_only=False)
        li = batch.column("li").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "node": batch.column("node"),
            "id": pa.array(off[nb] + li, pa.int64()),
            "outp": batch.column("outp"),
        })

    ids = local.map_batches(_assign, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    iedges = _encode_edges_distributed(edges, ids).materialize()

    def _init_rank(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.Table.from_pydict({
            "id": batch.column("id"),
            "outp": pa.array(batch.column("outp").to_numpy(
                zero_copy_only=False).astype(np.float64), pa.float64()),
            "rank": pa.array(np.full(m, 1.0 / n), pa.float64()),
        })

    rank_ds = ids.select_columns(["id", "outp"]).map_batches(
        _init_rank, batch_format="pyarrow",
        zero_copy_batch=True).materialize()

    # fused-round power iteration (same shape as _min_relax_rounds):
    # edge rows are bucketed by src ONCE; each round is exactly TWO
    # node-hash co-groups — (rank ∪ edges) emits per-bucket-combined
    # (dst, p) contribution partials, then (skeleton ∪ partials)
    # rebuilds the rank table — instead of the previous two hash_joins
    # + groupby(dst).sum (three sort exchanges + two unions per round).
    # All rows share _PR_SCHEMA; `side` tags the role.
    def _edge_rows(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        z = np.zeros(len(s), np.float64)
        return pa.Table.from_pydict({
            "k": s, "v": d, "outp": z, "rank": z, "p": z,
            "side": np.ones(len(s), np.int8),
            "hb": (s % N_ID_BUCKETS).astype(np.int32),
        }, schema=_PR_SCHEMA)

    def _skel_rows(batch: pa.Table) -> pa.Table:
        i = batch.column("id").to_numpy(zero_copy_only=False)
        o = batch.column("outp").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        z = np.zeros(len(i), np.float64)
        return pa.Table.from_pydict({
            "k": i, "v": np.zeros(len(i), np.int64), "outp": o,
            "rank": z, "p": z,
            "side": np.full(len(i), 3, np.int8),
            "hb": (i % N_ID_BUCKETS).astype(np.int32),
        }, schema=_PR_SCHEMA)

    def _rank_rows(batch: pa.Table) -> pa.Table:
        i = batch.column("id").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "k": i, "v": np.zeros(len(i), np.int64),
            "outp": batch.column("outp").to_numpy(
                zero_copy_only=False).astype(np.float64),
            "rank": batch.column("rank").to_numpy(zero_copy_only=False),
            "p": np.zeros(len(i), np.float64),
            "side": np.zeros(len(i), np.int8),
            "hb": (i % N_ID_BUCKETS).astype(np.int32),
        }, schema=_PR_SCHEMA)

    ebuck = iedges.map_batches(_edge_rows, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    skel = rank_ds.map_batches(
        lambda b: pa.Table.from_pydict(
            {"id": b.column("id"), "outp": b.column("outp")}),
        batch_format="pyarrow").map_batches(
        _skel_rows, batch_format="pyarrow").materialize()
    state = rank_ds.map_batches(_rank_rows, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()

    for _ in range(iters):
        # dangling mass: one scalar to the driver (map + tiny reduce)
        mass = state.map_batches(
            lambda b: pa.Table.from_pydict({"m": pa.array(
                [float(b.column("rank").to_numpy(zero_copy_only=False)[
                    b.column("outp").to_numpy(zero_copy_only=False)
                    == 0].sum())], pa.float64())}),
            batch_format="pyarrow").sum("m") or 0.0
        base = (1.0 - damping) / n + damping * mass / n
        partials = ebuck.union(state).groupby("hb").map_groups(
            _pr_contrib_bucket, batch_format="pyarrow")
        state = skel.union(partials).groupby("hb").map_groups(
            functools.partial(_pr_rank_bucket, base=base,
                              damping=damping),
            batch_format="pyarrow").repartition(16).materialize()

    def _decode(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "id": batch.column("k"),
            "rank": batch.column("rank"),
        })

    # final decoration: co-group join of (node, id) with the rank table
    out = hash_join(ids.select_columns(["node", "id"]),
                    state.map_batches(_decode, batch_format="pyarrow"),
                    left_on="id", right_on="id",
                    left_cols=["node"], right_cols=["rank"])
    return out.select_columns(["node", "rank"])


# ---------------------------------------------------------------------------
# Connected components (alternating large-star / small-star)
# ---------------------------------------------------------------------------


def _init_edges(batch: pa.Table) -> pa.Table:
    """Triples -> per-block-distinct undirected edge pairs, self-loops
    (subj == obj) kept as (a, a) rows so self-loop-only nodes don't
    vanish from the output (they are split off before the star rounds
    and re-unioned as (node, node) results)."""
    seen = set(zip(batch.column("subj").to_pylist(),
                   batch.column("obj").to_pylist()))
    es = sorted(seen)
    return pa.Table.from_pydict({
        "a": pa.array([e[0] for e in es], pa.string()),
        "b": pa.array([e[1] for e in es], pa.string()),
    })


def _symmetrize(batch: pa.Table) -> pa.Table:
    fwd = batch.select(["a", "b"]).rename_columns(["u", "v"])
    rev = batch.select(["b", "a"]).rename_columns(["u", "v"])
    return pa.concat_tables([fwd, rev])


def _orient_max_first(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    a, b = batch.column("a"), batch.column("b")
    hi = pc.if_else(pc.greater(a, b), a, b)
    lo = pc.if_else(pc.greater(a, b), b, a)
    return pa.Table.from_pydict({"u": hi, "v": lo})


# Star rounds are vectorized per HASH BUCKET, not per node: grouping by
# a 64-way hash of u co-locates every node's neighborhood while keeping
# the per-round Python dispatch count at O(buckets); inside a bucket the
# per-node mins/emissions are numpy (sorted codes + minimum.reduceat).
N_STAR_BUCKETS = 64


def _hash_bucket(batch: pa.Table) -> pa.Table:
    import pandas as pd
    arr = np.asarray(batch.column("u").to_pylist(), dtype=object)
    b = (pd.util.hash_array(arr) % N_STAR_BUCKETS).astype(np.int32)
    return batch.append_column("bucket", pa.array(b))


def _grouped_codes(group: pa.Table):
    """(sorted-by-u codes, group starts, counts, per-group m, vals) where
    codes are order-isomorphic to the node strings."""
    if group.num_rows == 0:  # np.r_[True, ...] on empties yields starts=[0]
        e = np.array([], dtype=np.int64)
        return e, e, e, e, e, np.array([], dtype=object)
    u_obj = np.asarray(group.column("u").to_pylist(), dtype=object)
    v_obj = np.asarray(group.column("v").to_pylist(), dtype=object)
    vals = np.unique(np.concatenate([u_obj, v_obj]))
    ucode = np.searchsorted(vals, u_obj)
    vcode = np.searchsorted(vals, v_obj)
    order = np.argsort(ucode, kind="stable")
    u_s, v_s = ucode[order], vcode[order]
    starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
    counts = np.diff(np.r_[starts, len(u_s)])
    gmin_v = np.minimum.reduceat(v_s, starts) if len(u_s) else \
        np.array([], dtype=np.int64)
    return u_s, v_s, starts, counts, gmin_v, vals


def _emit(a_codes, b_codes, vals) -> pa.Table:
    """Distinct (a, b) pairs decoded back to strings."""
    if len(a_codes):
        key = a_codes.astype(np.int64) * len(vals) + b_codes
        uniq = np.unique(key)
        a_codes, b_codes = uniq // len(vals), uniq % len(vals)
    return pa.Table.from_pydict({
        "a": pa.array(vals[a_codes].tolist() if len(a_codes) else [],
                      pa.string()),
        "b": pa.array(vals[b_codes].tolist() if len(b_codes) else [],
                      pa.string()),
    })


def _large_star_bucket(group: pa.Table) -> pa.Table:
    """Per u: m = min(nbrs ∪ {u}); emit (v, m) for v > u."""
    u_s, v_s, starts, counts, gmin_v, vals = _grouped_codes(group)
    m = np.minimum(gmin_v, u_s[starts])
    m_rep = np.repeat(m, counts)
    mask = v_s > u_s
    return _emit(v_s[mask], m_rep[mask], vals)


def _small_star_bucket(group: pa.Table) -> pa.Table:
    """Per u (v all < u by orientation): m = min(nbrs); emit (v, m) for
    v in nbrs \\ {m} plus (u, m)."""
    u_s, v_s, starts, counts, gmin_v, vals = _grouped_codes(group)
    m_rep = np.repeat(gmin_v, counts)
    mask = v_s != m_rep
    a = np.concatenate([v_s[mask], u_s[starts]])
    b = np.concatenate([m_rep[mask], gmin_v])
    return _emit(a, b, vals)


def _sig_partial(batch: pa.Table) -> pa.Table:
    """Order-independent per-block edge-set checksum (count, hash-sum).
    Vectorized pair hash: siphash of each endpoint (pandas hash_array,
    fixed key => process-independent) combined asymmetrically."""
    import pandas as pd
    a = np.asarray(batch.column("a").to_pylist(), dtype=object)
    b = np.asarray(batch.column("b").to_pylist(), dtype=object)
    ha, hb = pd.util.hash_array(a), pd.util.hash_array(b)
    pair = ha * np.uint64(1099511628211) ^ hb
    hv = int(pair.sum(dtype=np.uint64))
    return pa.Table.from_pydict({
        "cnt": pa.array([batch.num_rows], pa.int64()),
        "hv": pa.array([str(hv)], pa.string()),  # unbounded int as string
    })


def _signature(edges: ray.data.Dataset) -> tuple[int, int]:
    cnt = hv = 0
    for row in edges.map_batches(_sig_partial, batch_format="pyarrow",
                                 batch_size=None).take_all():
        cnt += row["cnt"]
        hv += int(row["hv"])
    return cnt, hv


def _round(edges: ray.data.Dataset) -> ray.data.Dataset:
    large = edges.map_batches(_symmetrize, batch_format="pyarrow") \
        .map_batches(_hash_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(_large_star_bucket,
                                      batch_format="pyarrow")
    return large.map_batches(_orient_max_first, batch_format="pyarrow") \
        .map_batches(_hash_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(_small_star_bucket,
                                      batch_format="pyarrow")


def connected_components(triples: ray.data.Dataset,
                         max_iters: int = 50, *,
                         clamp: bool = True) -> ray.data.Dataset:
    """(node, component) for every subject/object; component = min node
    string in the connected component (edges undirected).

    Fully distributed: per round the edge Dataset goes through a
    large-star then a small-star pass, each a hash-bucket
    ``groupby.map_groups`` with the per-node logic vectorized inside
    the bucket, converging in O(log n) rounds to the star forest
    {(v, component-min)}.  The driver sees only per-block
    (count, checksum) partials — no label map, no node set, no edges."""
    init = triples.map_batches(_init_edges, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    # self-loop rows contribute no connectivity but their nodes must
    # appear in the output: keep them aside as (node, node) candidates
    # (the final min-groupby picks the real component when the node also
    # has proper edges, since component <= node for any member).  The
    # candidate set is materialized up front so the no-self-loop case
    # (the common one) can skip the final node-sized min-groupby.
    selfloops = init.filter(expr="a == b").groupby("a").min("b") \
        .rename_columns({"a": "node", "min(b)": "component"}) \
        .materialize()
    has_selfloops = selfloops.count() > 0
    edges = init.filter(expr="a != b").materialize()
    sig = _signature(edges)
    for _ in range(max_iters):
        # block-count clamp (SCALE.md): each star round is two sort
        # co-groups whose output block count tracks input blocks, so
        # unclamped rounds compound blocks and fixed sort cost — worst
        # at high cpu counts (ER at sf0.1: 21 s -> 9 s at 32 cpus).
        # In-bucket vectorized work is the parallel grain (64 hash
        # buckets), so 16 blocks loses no real parallelism.  Callers
        # that run MANY short CCs on small inputs (Boruvka's per-round
        # contraction: 1-2 star rounds each) pass clamp=False — there
        # the extra barrier costs more than compounding ever would.
        nxt = _round(edges)
        if clamp:
            nxt = nxt.repartition(16)
        nxt = nxt.materialize()
        nsig = _signature(nxt)
        edges = nxt
        if nsig == sig:
            break
        sig = nsig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds")

    # star forest -> result rows. Children: (v, m) edges as-is (min(b)
    # per a is a no-op at convergence but keeps the op deterministic);
    # roots: every distinct m gets (m, m). At convergence no root appears
    # on the left, so the union is disjoint.
    children = edges.groupby("a").min("b").rename_columns(
        {"a": "node", "min(b)": "component"})

    def _root_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        roots = pc.unique(batch.column("component"))
        return pa.Table.from_pydict({"node": roots, "component": roots})

    roots = children.map_batches(_root_rows, batch_format="pyarrow") \
        .groupby("node").min("component").rename_columns(
            {"min(component)": "component"})
    if not has_selfloops:
        return children.union(roots)  # disjoint by convergence
    # self-loop candidates may duplicate nodes already present; one
    # node-sized min-groupby restores disjointness (component <= node).
    return children.union(roots).union(selfloops) \
        .groupby("node").min("component") \
        .rename_columns({"min(component)": "component"})


# ---------------------------------------------------------------------------
# planted dyadic-exact PageRank: a full SQL oracle for the float op
# ---------------------------------------------------------------------------
#
# Float PageRank normally has no stable SQL mirror (partial-sum order
# perturbs the last ulp).  This planted graph removes the float freedom
# entirely: n = 256 (power of two) nodes, out-degree exactly 2
# everywhere, damping 1/2 — so every intermediate value is a dyadic
# rational m * 2^-k with k <= 9 + 2*iters <= 29 and m < 2^29 < 2^53,
# meaning EVERY float64 addition/multiplication is exact under ANY
# summation order (numpy bincount partials, Ray groupby reduce order,
# DuckDB aggregation order all agree bit-for-bit).  The oracle is a
# genuinely computed, unrolled PLANTED_PR_ITERS-step SQL power
# iteration over the same id-arithmetic edge set — not a pasted
# constant.

PLANTED_PR_N = 256
# 10 exact power steps (k <= 9 + 2*10 = 29 < 53, so every float64 op is
# still exact under any order); 20 steps proved nothing extra and cost
# the gate an additional ~5 s of per-iteration reduce + driver sync
PLANTED_PR_ITERS = 10


def planted_pagerank_edges(n: int = PLANTED_PR_N):
    """Edges: i -> (i+1) % n for all i; i -> i // 2 for i >= 1; 0 -> 3.
    Out-degree 2 for every node (no dangling mass), no self-loops, no
    duplicate edges; in-degree varies (1..3) so ranks are non-uniform."""
    subj = [f"n{i:03d}" for i in range(n)] * 2
    obj = [f"n{(i + 1) % n:03d}" for i in range(n)]
    obj += [f"n{i // 2:03d}" if i >= 1 else "n003" for i in range(n)]
    return subj, obj


def planted_pagerank_triples(n: int = PLANTED_PR_N) -> ray.data.Dataset:
    subj, obj = planted_pagerank_edges(n)
    return ray.data.from_arrow(pa.Table.from_pydict({
        "subj": pa.array(subj, pa.string()),
        "pred": pa.array(["p"] * len(subj), pa.string()),
        "obj": pa.array(obj, pa.string()),
    })).repartition(8)


def pagerank_planted_sql(n: int = PLANTED_PR_N,
                         iters: int = PLANTED_PR_ITERS) -> str:
    layers = [f"pr0 AS (SELECT i, 1.0/{n} AS r FROM nodes)"]
    for t in range(1, iters + 1):
        layers.append(
            f"pr{t} AS (SELECT nd.i AS i, 0.5/{n} + 0.5 * "
            f"coalesce(sum(p.r / 2.0), 0.0) AS r "
            f"FROM nodes nd LEFT JOIN edges e ON e.d = nd.i "
            f"LEFT JOIN pr{t - 1} p ON p.i = e.s GROUP BY nd.i)")
    return (
        f"WITH nodes AS (SELECT i FROM generate_series(0, {n - 1}) AS t(i)),\n"
        f"edges AS (\n"
        f"  SELECT i AS s, (i + 1) % {n} AS d FROM nodes\n"
        f"  UNION ALL SELECT i, i // 2 FROM nodes WHERE i >= 1\n"
        f"  UNION ALL SELECT 0, 3),\n"
        + ",\n".join(layers) + "\n"
        f"SELECT 'n' || lpad(i::VARCHAR, 3, '0') AS node, r AS rank\n"
        f"FROM pr{iters} ORDER BY node"
    )


# ---------------------------------------------------------------------------
# triangle counting (join-composed: wedges ⋈ closing edges)
# ---------------------------------------------------------------------------

_TRI_ROW_SCHEMA = pa.schema([
    ("u", pa.int64()), ("w", pa.int64()),
    ("side", pa.int8()),  # 0 = wedge (u, w) pair, 1 = closing edge
    ("hb", pa.int32()),
])
_TRI_OUT_SCHEMA = pa.schema([("u", pa.int64()), ("n", pa.int64())])


def _tri_pair_rows(batch: pa.Table, *, ucol: str, wcol: str,
                   side: int) -> pa.Table:
    u = batch.column(ucol).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    w = batch.column(wcol).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    hb = ((u * np.int64(1000003)) ^ w) & 63
    return pa.Table.from_pydict({
        "u": u, "w": w,
        "side": np.full(len(u), side, np.int8),
        "hb": hb.astype(np.int32),
    }, schema=_TRI_ROW_SCHEMA)


def _tri_close_bucket(group: pa.Table) -> pa.Table:
    """One pair-hash bucket of the closure test: every wedge (u, w)
    pair AND every edge with the same pair hash land here; a wedge row
    counts iff its pair is an edge.  Matching is on BUCKET-LOCAL dense
    codes (np.unique of the values actually present), so there is no
    global node-id cap — the former pair encoding u * 2^21 + w broke
    past 2^21 ids.  (The local code product needs distinct-values <
    2^31 per bucket; a bucket co-group holding that many distinct ids
    is tens of GB of keys and dies of memory first — checked anyway.)
    Emits per-u partial counts; duplicated CLOSING edges cannot inflate
    (edge pairs are deduped here); duplicated ARM edges would multiply
    wedge rows, hence the distinct-edges input contract."""
    if group.num_rows == 0:
        return _TRI_OUT_SCHEMA.empty_table()
    side = group.column("side").to_numpy(zero_copy_only=False)
    u = group.column("u").to_numpy(zero_copy_only=False)
    w = group.column("w").to_numpy(zero_copy_only=False)
    is_w = side == 0
    if not is_w.any() or is_w.all():
        return _TRI_OUT_SCHEMA.empty_table()
    vals = np.unique(np.concatenate([u, w]))
    if len(vals) >= 1 << 31:
        raise ValueError("triangle bucket exceeds 2^31 distinct ids")
    key = np.searchsorted(vals, u).astype(np.int64) * len(vals) \
        + np.searchsorted(vals, w)
    ek = np.unique(key[~is_w])
    wk = key[is_w]
    pos = np.searchsorted(ek, wk)
    pos[pos >= len(ek)] = 0
    hit = ek[pos] == wk
    wu = np.sort(u[is_w][hit])
    if len(wu) == 0:
        return _TRI_OUT_SCHEMA.empty_table()
    starts = np.flatnonzero(np.r_[True, wu[1:] != wu[:-1]])
    return pa.Table.from_pydict({
        "u": wu[starts],
        "n": np.diff(np.r_[starts, len(wu)]).astype(np.int64),
    }, schema=_TRI_OUT_SCHEMA)


def triangle_counts(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Per-source directed triangle count: for each node u, the number
    of (v, w) with edges u->v, v->w and u->w (wedge closure).  One
    ``ops.joins.hash_join`` exchange builds the wedges, one 64-way
    pair-hash co-group tests closure on the (u, w) COMPOSITE key
    (bucket-local dense codes — works for the full int64 id range),
    and a final rollup sums the per-bucket partials — cost scales with
    wedge count, never with a driver-side adjacency.  Input contract:
    int64 columns (u, v); edges must be DISTINCT (a duplicated arm
    edge multiplies wedge rows — only the CLOSING side is
    duplicate-insensitive)."""
    from nerfray.ops.joins import _rename_batches, hash_join

    # batch-level rename: Dataset.rename_columns before a hash_join is
    # racy when the upstream schema needs a peek execution (see
    # ops/joins.py::_rename_batches)
    a = _rename_batches(edges, {"u": "a_u", "v": "a_v"})
    # wedge build: a_u -> __key -> w  (join a.v against e.u)
    wedges = hash_join(a, edges, left_on="a_v", right_on="u",
                       left_cols=["a_u"], right_cols=["v"])
    rows = wedges.map_batches(
        _tri_pair_rows, fn_kwargs={"ucol": "a_u", "wcol": "v", "side": 0},
        batch_format="pyarrow") \
        .union(edges.map_batches(
            _tri_pair_rows, fn_kwargs={"ucol": "u", "wcol": "v",
                                       "side": 1},
            batch_format="pyarrow", zero_copy_batch=True))
    return rows.groupby("hb") \
        .map_groups(_tri_close_bucket, batch_format="pyarrow") \
        .groupby("u").sum("n") \
        .rename_columns({"sum(n)": "n_triangles"})


TRI_OFFSETS = (7, 13, 20)  # 7 + 13 = 20 -> two triangles per node


def planted_triangle_edges(ids: ray.data.Dataset,
                           n: int) -> ray.data.Dataset:
    """Deterministic triangle fixture over dense ids 0..n-1: edges
    (i, (i+o) % n) for o in TRI_OFFSETS — exactly two wedge-closures
    per source (7+13 and 13+7), SQL-mirrorable by pure arithmetic."""

    def _mk(batch: pa.Table) -> pa.Table:
        v_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        us, vs = [], []
        for off in TRI_OFFSETS:
            us.append(v_ids)
            vs.append((v_ids + off) % n)
        return pa.Table.from_pydict({
            "u": pa.array(np.concatenate(us), pa.int64()),
            "v": pa.array(np.concatenate(vs), pa.int64()),
        })

    return ids.map_batches(_mk, batch_format="pyarrow",
                           zero_copy_batch=True)


TRIANGLES_PLANTED_SQL = """
WITH nn AS (SELECT count(*)::BIGINT AS n FROM embeddings),
e AS (
  SELECT vec_id AS u, (vec_id + 7) % nn.n AS v FROM embeddings, nn
  UNION ALL SELECT vec_id, (vec_id + 13) % nn.n FROM embeddings, nn
  UNION ALL SELECT vec_id, (vec_id + 20) % nn.n FROM embeddings, nn
)
SELECT a.u, count(*)::BIGINT AS n_triangles
FROM e a JOIN e b ON b.u = a.v JOIN e c ON c.u = a.u AND c.v = b.v
GROUP BY a.u ORDER BY a.u
"""


# ---------------------------------------------------------------------------
# local clustering coefficient + resource-allocation link prediction
# ---------------------------------------------------------------------------
#
# Both ride the triangle/wedge machinery over a SYMMETRIC simple
# planted graph: every node gets the ±{7,13,20} circulant neighbors,
# and every third node an extra ±1 edge (so degrees VARY — 6, 7 or 8 —
# and the integer cc/score arithmetic is exercised on non-constant
# denominators).  Distinctness of the edge list holds by construction
# for n > 41 (the residues ±1, ±7, ±13, ±20 are pairwise distinct mod
# n), satisfying triangle_counts' distinct-edges contract with NO
# dedup exchange.

_CC_OUT_SCHEMA = pa.schema([
    ("node", pa.int64()), ("n_tri", pa.int64()),
    ("n_wedges", pa.int64()), ("cc_permille", pa.int64())])

_RA_ROW_SCHEMA = pa.schema([
    ("u", pa.int64()), ("w", pa.int64()),
    ("wt", pa.int64()),   # wedge rows: 1e9 // deg(z); edge rows: 0
    ("side", pa.int8()),  # 0 = wedge pair, 1 = existing edge
    ("hb", pa.int32())])
_RA_OUT_SCHEMA = pa.schema([
    ("u", pa.int64()), ("w", pa.int64()), ("score", pa.int64())])


def planted_symmetric_edges(ids: ray.data.Dataset,
                            n: int) -> ray.data.Dataset:
    """Symmetric circulant edges ±{7,13,20} for all ids, ±1 for ids
    divisible by 3 (both directions emitted at the generator)."""
    if n <= 41:
        raise ValueError("planted symmetric graph needs n > 41 for "
                         "edge distinctness")

    def _mk(batch: pa.Table) -> pa.Table:
        i = batch.column("vec_id").to_numpy(zero_copy_only=False)
        us, vs = [], []
        for off in TRI_OFFSETS:
            us += [i, i]
            vs += [(i + off) % n, (i - off) % n]
        third = i[i % 3 == 0]
        us += [third, (third + 1) % n]
        vs += [(third + 1) % n, third]
        return pa.Table.from_pydict({
            "u": pa.array(np.concatenate(us), pa.int64()),
            "v": pa.array(np.concatenate(vs), pa.int64())})

    return ids.map_batches(_mk, batch_format="pyarrow",
                           zero_copy_batch=True)


def clustering_coefficient(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(node, n_tri, n_wedges, cc_permille) over a symmetric simple
    edge list: undirected triangles = directed wedge-closures / 2,
    wedges = deg*(deg-1)/2, cc integer-pinned as (1000*n_tri)//wedges.
    Cost = triangle_counts (2 exchanges) + a node-grain degree groupby
    + ONE node-keyed left-outer hash_join (zero-triangle nodes kept)."""
    from nerfray.ops.joins import hash_join
    tri = triangle_counts(edges)
    deg = edges.groupby("u").count() \
        .rename_columns({"count()": "deg"})
    types = {"u": pa.int64(), "deg": pa.int64(),
             "n_triangles": pa.int64()}
    joined = hash_join(deg, tri, left_on="u", right_on="u",
                       left_cols=["deg"], right_cols=["n_triangles"],
                       how="left outer", field_types=types)

    def _cc(batch: pa.Table) -> pa.Table:
        node = batch.column("__key").to_numpy(zero_copy_only=False)
        deg_ = batch.column("deg").to_numpy(zero_copy_only=False)
        t2 = batch.column("n_triangles").to_numpy(zero_copy_only=False)
        t2 = np.nan_to_num(t2.astype(float)).astype(np.int64)
        tri_ = t2 // 2
        wedges = deg_ * (deg_ - 1) // 2
        cc = np.where(wedges > 0, (1000 * tri_) // np.maximum(wedges, 1),
                      0)
        return pa.Table.from_pydict(
            {"node": node, "n_tri": tri_, "n_wedges": wedges,
             "cc_permille": cc}, schema=_CC_OUT_SCHEMA)

    return joined.map_batches(_cc, batch_format="pyarrow")


def clustering_planted_query(sf_dir: str) -> ray.data.Dataset:
    import os

    import pyarrow.parquet as _pq

    from nerfray.sources.parquet import read_parquet_clean
    n = _pq.read_metadata(
        os.path.join(sf_dir, "embeddings.parquet")).num_rows
    ids = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id"])
    return clustering_coefficient(planted_symmetric_edges(ids, n))


_SYM_EDGES_SQL = """
nn AS (SELECT count(*)::BIGINT AS n FROM embeddings),
offs AS (SELECT unnest([1::BIGINT, -1, 7, -7, 13, -13, 20, -20]) AS o),
e AS (
  SELECT vec_id AS u, ((vec_id + o) % nn.n + nn.n) % nn.n AS v
  FROM embeddings, nn, offs
  WHERE abs(o) != 1
  UNION ALL
  SELECT vec_id, (vec_id + 1) % nn.n FROM embeddings, nn
  WHERE vec_id % 3 = 0
  UNION ALL
  SELECT (vec_id + 1) % nn.n, vec_id FROM embeddings, nn
  WHERE vec_id % 3 = 0
)"""

CLUSTERING_PLANTED_SQL = f"""
WITH {_SYM_EDGES_SQL},
tri AS (
  SELECT a.u, count(*)::BIGINT AS t2
  FROM e a JOIN e b ON b.u = a.v JOIN e c ON c.u = a.u AND c.v = b.v
  GROUP BY a.u),
deg AS (SELECT u, count(*)::BIGINT AS deg FROM e GROUP BY u)
SELECT d.u AS node, coalesce(t.t2, 0) // 2 AS n_tri,
       d.deg * (d.deg - 1) // 2 AS n_wedges,
       CASE WHEN d.deg >= 2
            THEN (1000 * (coalesce(t.t2, 0) // 2))
                 // (d.deg * (d.deg - 1) // 2)
            ELSE 0 END AS cc_permille
FROM deg d LEFT JOIN tri t ON t.u = d.u ORDER BY node
"""


def _ra_wedge_rows(batch: pa.Table) -> pa.Table:
    u = batch.column("a_u").to_numpy(zero_copy_only=False)
    w = batch.column("v").to_numpy(zero_copy_only=False)
    deg = batch.column("deg").to_numpy(zero_copy_only=False)
    keep = u < w
    u, w, deg = u[keep], w[keep], deg[keep]
    hb = ((u * np.int64(1000003)) ^ w) & 63
    return pa.Table.from_pydict({
        "u": u, "w": w, "wt": np.int64(1_000_000_000) // deg,
        "side": np.zeros(len(u), np.int8), "hb": hb.astype(np.int32),
    }, schema=_RA_ROW_SCHEMA)


def _ra_edge_rows(batch: pa.Table) -> pa.Table:
    u = batch.column("u").to_numpy(zero_copy_only=False)
    w = batch.column("v").to_numpy(zero_copy_only=False)
    keep = u < w  # symmetric input: the u<w orientation is complete
    u, w = u[keep], w[keep]
    hb = ((u * np.int64(1000003)) ^ w) & 63
    return pa.Table.from_pydict({
        "u": u, "w": w, "wt": np.zeros(len(u), np.int64),
        "side": np.ones(len(u), np.int8), "hb": hb.astype(np.int32),
    }, schema=_RA_ROW_SCHEMA)


def _ra_bucket(group: pa.Table) -> pa.Table:
    """Per pair-hash bucket: sum wedge weights per (u, w), drop pairs
    that are existing edges (duplicate-insensitive on the edge side)."""
    if group.num_rows == 0:
        return _RA_OUT_SCHEMA.empty_table()
    side = group.column("side").to_numpy(zero_copy_only=False)
    u = group.column("u").to_numpy(zero_copy_only=False)
    w = group.column("w").to_numpy(zero_copy_only=False)
    wt = group.column("wt").to_numpy(zero_copy_only=False)
    is_w = side == 0
    if not is_w.any():
        return _RA_OUT_SCHEMA.empty_table()
    vals = np.unique(np.concatenate([u, w]))
    key = np.searchsorted(vals, u).astype(np.int64) * len(vals) \
        + np.searchsorted(vals, w)
    ek = np.unique(key[~is_w])
    ku, wu, wwu, wtu = key[is_w], u[is_w], w[is_w], wt[is_w]
    pos = np.searchsorted(ek, ku)
    pos[pos >= len(ek)] = 0
    adjacent = (ek[pos] == ku) if len(ek) else np.zeros(len(ku), bool)
    ku, wu, wwu, wtu = (ku[~adjacent], wu[~adjacent], wwu[~adjacent],
                        wtu[~adjacent])
    if len(ku) == 0:
        return _RA_OUT_SCHEMA.empty_table()
    order = np.argsort(ku, kind="stable")
    ku, wu, wwu, wtu = ku[order], wu[order], wwu[order], wtu[order]
    starts = np.flatnonzero(np.r_[True, ku[1:] != ku[:-1]])
    sums = np.add.reduceat(wtu, starts)
    return pa.Table.from_pydict(
        {"u": wu[starts], "w": wwu[starts],
         "score": sums.astype(np.int64)}, schema=_RA_OUT_SCHEMA)


def link_prediction_ra(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Resource-allocation link prediction (Zhou/Lu/Zhang EPJ-B 2009,
    integer-pinned): for every non-adjacent pair sharing >= 1 common
    neighbor z, score = sum(1e9 // deg(z)).  Input: SYMMETRIC distinct
    edges.  Shape: deg groupby + deg-attach hash_join + wedge
    hash_join + ONE pair-hash co-group — wedge-proportional traffic,
    nothing pair- or node-proportional on the driver."""
    from nerfray.ops.joins import _rename_batches, hash_join
    deg = edges.groupby("u").count() \
        .rename_columns({"count()": "deg"})
    types = {c: pa.int64() for c in ("u", "v", "deg", "a_u", "a_v")}
    # attach deg(z) to each edge z->w (key = z)
    e2 = hash_join(edges, deg, left_on="u", right_on="u",
                   left_cols=["v"], right_cols=["deg"],
                   field_types=types)
    e2 = _rename_batches(e2, {"__key": "z", "v": "v", "deg": "deg"})
    # wedge u -> z -> w with deg(z) carried: join a.(u,z) on e2.z
    a = _rename_batches(edges, {"u": "a_u", "v": "a_v"})
    types2 = {"a_v": pa.int64(), "a_u": pa.int64(), "z": pa.int64(),
              "v": pa.int64(), "deg": pa.int64()}
    wedges = hash_join(a, e2, left_on="a_v", right_on="z",
                       left_cols=["a_u"], right_cols=["v", "deg"],
                       field_types=types2)
    rows = wedges.map_batches(_ra_wedge_rows, batch_format="pyarrow") \
        .union(edges.map_batches(_ra_edge_rows, batch_format="pyarrow",
                                 zero_copy_batch=True))
    return rows.groupby("hb").map_groups(_ra_bucket,
                                         batch_format="pyarrow")


def link_prediction_planted_query(sf_dir: str) -> ray.data.Dataset:
    import os

    import pyarrow.parquet as _pq

    from nerfray.sources.parquet import read_parquet_clean
    n = _pq.read_metadata(
        os.path.join(sf_dir, "embeddings.parquet")).num_rows
    ids = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id"])
    return link_prediction_ra(planted_symmetric_edges(ids, n))


LINK_PREDICTION_PLANTED_SQL = f"""
WITH {_SYM_EDGES_SQL},
deg AS (SELECT u, count(*)::BIGINT AS deg FROM e GROUP BY u),
wedges AS (
  SELECT a.u AS u, b.v AS w, 1000000000 // d.deg AS wt
  FROM e a JOIN e b ON b.u = a.v JOIN deg d ON d.u = a.v
  WHERE a.u < b.v)
SELECT u, w, sum(wt)::BIGINT AS score
FROM wedges
WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = wedges.u
                  AND e.v = wedges.w)
GROUP BY u, w ORDER BY u, w
"""


# ---------------------------------------------------------------------------
# fused min-relaxation rounds (shared by k-hop BFS and weighted SSSP)
# ---------------------------------------------------------------------------
#
# ONE 64-way keyed co-group per round: the bucket for node-hash h holds
# (a) every distance CANDIDATE targeted at its nodes — the previous
# round's relaxations, duplicates allowed, the per-node min is taken
# here — and (b) every edge whose SOURCE node hashes to h.  The bucket
# re-emits each node's resolved min as its own candidate and relaxes it
# along the co-located out-edges into next-round candidates; a final
# edge-free co-group collapses the last candidate set.  rounds+1
# exchanges total, the whole unroll ONE lazy plan — no per-round driver
# barrier, and no per-round block-count growth from union-of-materialized
# frontiers (the previous join-per-round shape grew 48 -> 496 blocks
# over 4 rounds at sf0.01, turning 36-row SSSP into a 90 s query).

_RELAX_BUCKETS = 64
_RELAX_SCHEMA = pa.schema([
    ("k", pa.int64()),    # candidate: target node | edge: source u
    ("d", pa.int64()),    # candidate: distance    | edge: unused
    ("v", pa.int64()),    # edge: destination
    ("w", pa.int64()),    # edge: weight
    ("side", pa.int8()),  # 0 = candidate, 1 = edge
    ("hb", pa.int32()),
])


def _relax_edge_rows(batch: pa.Table, *, unit_weight: bool = False) \
        -> pa.Table:
    u = batch.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
    v = batch.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
    if unit_weight:
        w = np.ones(len(u), np.int64)
    else:
        w = batch.column("w").to_numpy(
            zero_copy_only=False).astype(np.int64)
    return pa.Table.from_pydict({
        "k": u, "d": np.zeros(len(u), np.int64), "v": v, "w": w,
        "side": np.ones(len(u), np.int8),
        "hb": (u % _RELAX_BUCKETS).astype(np.int32),
    }, schema=_RELAX_SCHEMA)


def _relax_seed_rows(batch: pa.Table) -> pa.Table:
    n = batch.column("node").to_numpy(
        zero_copy_only=False).astype(np.int64)
    z = np.zeros(len(n), np.int64)
    return pa.Table.from_pydict({
        "k": n, "d": z, "v": z, "w": z,
        "side": np.zeros(len(n), np.int8),
        "hb": (n % _RELAX_BUCKETS).astype(np.int32),
    }, schema=_RELAX_SCHEMA)


def _relax_min(k: np.ndarray, d: np.ndarray):
    """Per-node min over candidate rows (vectorized run sweep)."""
    order = np.lexsort((d, k))
    k_s, d_s = k[order], d[order]
    starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]])
    return k_s[starts], d_s[starts]


def _relax_round_bucket(group: pa.Table) -> pa.Table:
    if group.num_rows == 0:
        return _RELAX_SCHEMA.empty_table()
    side = group.column("side").to_numpy(zero_copy_only=False)
    k = group.column("k").to_numpy(zero_copy_only=False)
    d = group.column("d").to_numpy(zero_copy_only=False)
    is_c = side == 0
    if not is_c.any():
        return _RELAX_SCHEMA.empty_table()
    nodes, dists = _relax_min(k[is_c], d[is_c])
    # relax along co-located out-edges (sorted-array lookup, no join)
    is_e = ~is_c
    eu = k[is_e]
    idx = np.searchsorted(nodes, eu)
    idx[idx >= len(nodes)] = 0
    hit = nodes[idx] == eu
    ev = group.column("v").to_numpy(zero_copy_only=False)[is_e][hit]
    ed = dists[idx[hit]] \
        + group.column("w").to_numpy(zero_copy_only=False)[is_e][hit]
    out_k = np.concatenate([nodes, ev])
    out_d = np.concatenate([dists, ed])
    z = np.zeros(len(out_k), np.int64)
    return pa.Table.from_pydict({
        "k": out_k, "d": out_d, "v": z, "w": z,
        "side": np.zeros(len(out_k), np.int8),
        "hb": (out_k % _RELAX_BUCKETS).astype(np.int32),
    }, schema=_RELAX_SCHEMA)


def _relax_final_bucket(group: pa.Table, *, kcol: str,
                        dcol: str) -> pa.Table:
    out_schema = pa.schema([(kcol, pa.int64()), (dcol, pa.int64())])
    if group.num_rows == 0:
        return out_schema.empty_table()
    side = group.column("side").to_numpy(zero_copy_only=False)
    is_c = side == 0
    nodes, dists = _relax_min(
        group.column("k").to_numpy(zero_copy_only=False)[is_c],
        group.column("d").to_numpy(zero_copy_only=False)[is_c])
    return pa.Table.from_pydict({kcol: nodes, dcol: dists},
                                schema=out_schema)


def _min_relax_rounds(edges_tagged: ray.data.Dataset,
                      seeds: ray.data.Dataset, *, rounds: int,
                      kcol: str, dcol: str) -> ray.data.Dataset:
    plan = seeds.map_batches(_relax_seed_rows, batch_format="pyarrow")
    for _ in range(rounds):
        # repartition clamp per round: the lazy union+sort chain
        # otherwise compounds block counts across rounds (SCALE.md) —
        # worst at high cpu counts where each sort fans out wider
        plan = edges_tagged.union(plan).groupby("hb").map_groups(
            _relax_round_bucket, batch_format="pyarrow").repartition(16)
    return plan.groupby("hb").map_groups(
        functools.partial(_relax_final_bucket, kcol=kcol, dcol=dcol),
        batch_format="pyarrow")


def bfs_hops(edges: ray.data.Dataset, seeds: ray.data.Dataset, *,
             max_hops: int = 3) -> ray.data.Dataset:
    """(node, hop): minimum hop distance from the seed set, bounded at
    ``max_hops`` — the neighborhood-expansion primitive (impact radius,
    k-hop subgraph extraction).  BFS is min-relaxation with unit
    weights, so it shares the fused one-co-group-per-round kernel;
    the driver never sees a row.  Input: directed int64 (u, v) edges;
    seeds as a (node) Dataset (hop 0)."""
    e = edges.map_batches(_relax_edge_rows,
                          fn_kwargs={"unit_weight": True},
                          batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    return _min_relax_rounds(e, seeds, rounds=max_hops,
                             kcol="node", dcol="hop")


def bfs_planted_query(sf_dir: str) -> ray.data.Dataset:
    """BFS over the deterministic offset graph (edges i -> i+{7,13,20}
    mod n) from seed node 0, 3 hops — SQL-mirrorable by an unrolled
    frontier expansion."""
    import os

    import ray.data as rd

    from nerfray.sources.parquet import read_parquet_clean
    ids = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id"])
    n = ids.count()
    edges = planted_triangle_edges(ids, n)

    import pyarrow.compute as pc

    def _seed(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "node": pc.cast(batch.column("id"), pa.int64())})

    seeds = rd.range(1).map_batches(_seed, batch_format="pyarrow")
    return bfs_hops(edges, seeds, max_hops=3)


BFS_PLANTED_SQL = """
WITH nn AS (SELECT count(*)::BIGINT AS n FROM embeddings),
e AS (
  SELECT vec_id AS u, (vec_id + 7) % nn.n AS v FROM embeddings, nn
  UNION ALL SELECT vec_id, (vec_id + 13) % nn.n FROM embeddings, nn
  UNION ALL SELECT vec_id, (vec_id + 20) % nn.n FROM embeddings, nn
),
h0 AS (SELECT 0::BIGINT AS node),
h1 AS (SELECT DISTINCT v AS node FROM e
       WHERE u IN (SELECT node FROM h0)
         AND v NOT IN (SELECT node FROM h0)),
h2 AS (SELECT DISTINCT v AS node FROM e
       WHERE u IN (SELECT node FROM h1)
         AND v NOT IN (SELECT node FROM h0 UNION SELECT node FROM h1)),
h3 AS (SELECT DISTINCT v AS node FROM e
       WHERE u IN (SELECT node FROM h2)
         AND v NOT IN (SELECT node FROM h0 UNION SELECT node FROM h1
                       UNION SELECT node FROM h2))
SELECT node, 0::BIGINT AS hop FROM h0
UNION ALL SELECT node, 1 FROM h1
UNION ALL SELECT node, 2 FROM h2
UNION ALL SELECT node, 3 FROM h3
ORDER BY node
"""


# ---------------------------------------------------------------------------
# k-core decomposition (iterative degree peel)
# ---------------------------------------------------------------------------

KCORE_K = 3


def _peel_u_bucket(group: pa.Table, *, k: int, emit: str) -> pa.Table:
    """Stage A of one peel round (bucket = hash of u): per-u degree
    over the CURRENT edge set, drop edges whose u-degree < k. With
    ``emit='nodes'`` output the surviving u's instead (the final
    alive-set extraction). Vectorized over the whole bucket."""
    if emit == "nodes":
        out_schema = pa.schema([("node", pa.int64())])
    else:
        out_schema = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                                ("hbp", pa.int32())])
    if group.num_rows == 0:
        return out_schema.empty_table()
    u = group.column("u").to_numpy(zero_copy_only=False)
    v = group.column("v").to_numpy(zero_copy_only=False)
    order = np.argsort(u, kind="stable")
    us, vs = u[order], v[order]
    starts = np.flatnonzero(np.r_[True, us[1:] != us[:-1]])
    deg = np.diff(np.r_[starts, len(us)])
    if emit == "nodes":
        return pa.Table.from_pydict({
            "node": pa.array(us[starts][deg >= k], pa.int64())})
    keep = np.repeat(deg >= k, deg)
    us, vs = us[keep], vs[keep]
    a, b = np.minimum(us, vs), np.maximum(us, vs)
    hbp = ((a * np.int64(1000003)) ^ b) & 63
    return pa.Table.from_pydict({
        "u": pa.array(us, pa.int64()), "v": pa.array(vs, pa.int64()),
        "hbp": pa.array(hbp.astype(np.int32), pa.int32())})


def _peel_pair_bucket(group: pa.Table) -> pa.Table:
    """Stage B (bucket = hash of the canonical pair): an edge survives
    the round iff BOTH its directions survived stage A — the mirror
    direction was degree-filtered on ITS endpoint, so pair survival IS
    the v-side restriction, without a join."""
    out_schema = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                            ("hb", pa.int32())])
    if group.num_rows == 0:
        return out_schema.empty_table()
    u = group.column("u").to_numpy(zero_copy_only=False)
    v = group.column("v").to_numpy(zero_copy_only=False)
    a, b = np.minimum(u, v), np.maximum(u, v)
    order = np.lexsort((b, a))
    a, b, us, vs = a[order], b[order], u[order], v[order]
    new_pair = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    starts = np.flatnonzero(new_pair)
    runs = np.diff(np.r_[starts, len(a)])
    keep = np.repeat(runs == 2, runs)
    us, vs = us[keep], vs[keep]
    return pa.Table.from_pydict({
        "u": pa.array(us, pa.int64()), "v": pa.array(vs, pa.int64()),
        "hb": pa.array((us & 63).astype(np.int32), pa.int32())})


def _with_hbu(ds: ray.data.Dataset) -> ray.data.Dataset:
    import pyarrow.compute as pc

    def _f(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "u": pc.cast(batch.column("u"), pa.int64()),
            "v": pc.cast(batch.column("v"), pa.int64()),
            "hb": pc.cast(pc.bit_wise_and(batch.column("u"), 63),
                          pa.int32())})
    return ds.map_batches(_f, batch_format="pyarrow")


def kcore(edges: ray.data.Dataset, *, k: int = KCORE_K,
          rounds: int | None = None,
          max_rounds: int = 50) -> ray.data.Dataset:
    """Nodes of the k-core: the maximal subgraph where every node keeps
    degree >= k after all lower-degree nodes are (transitively) peeled.

    Input: symmetric, distinct int64 (u, v) edges (both directions
    present, no duplicate pairs) — degree(u) = its row count.

    One synchronous peel round = TWO bucketed co-group stages, no join
    machinery and no driver state: stage A drops edges whose u-degree
    < k (per-u degree vectorized inside a 64-way u-hash bucket); stage
    B keeps a pair iff both directions survived A — the mirror row was
    filtered on ITS endpoint's degree, so pair survival equals the
    v-side restriction. With ``rounds`` given (known peel depth, e.g.
    the planted fixture) the whole unroll is ONE lazy plan — no
    per-round materialize barriers; otherwise rounds run adaptively
    until the edge count stops changing (driver sees only counts).
    """
    e = _with_hbu(edges)

    def _one_round(ds: ray.data.Dataset) -> ray.data.Dataset:
        mid = ds.groupby("hb").map_groups(
            _peel_u_bucket, fn_kwargs={"k": k, "emit": "edges"},
            batch_format="pyarrow")
        return mid.groupby("hbp").map_groups(
            _peel_pair_bucket, batch_format="pyarrow")

    if rounds is not None:
        for _ in range(rounds - 1):
            e = _one_round(e)
    else:
        e = e.materialize()
        prev = e.count()
        for _ in range(max_rounds):
            e = _one_round(e).materialize()
            n_e = e.count()
            if n_e in (prev, 0):
                break
            prev = n_e
    return e.groupby("hb").map_groups(
        _peel_u_bucket, fn_kwargs={"k": k, "emit": "nodes"},
        batch_format="pyarrow")


# planted peel fixture over dense ids 0..n-1 (from embeddings.vec_id):
#   path   i -- i+1                     (degree-2 spine, dies round 1)
#   clique K4 on {b..b+3}, b % 10 == 0  (the 3-core: survives forever)
#   cascade at i % 10 == 5: extra edges (i, i+2), (i+1, i+3) make
#     {i..i+3} all degree-3 via path neighbors — peeling the spine
#     starves them over rounds 2-3, exercising MULTI-ROUND transitive
#     peel (a one-round degree filter would wrongly keep them)
KCORE_ROUNDS_SQL = 5  # planted fixpoint at round 4; +1 proves stability


def planted_kcore_edges(ids: ray.data.Dataset,
                        n: int) -> ray.data.Dataset:
    """Symmetric distinct edge list of the peel fixture (arithmetic of
    the id — no shuffle; path edges inside a complete clique are
    skipped at emission so pairs stay distinct without a dedup)."""

    def _mk(batch: pa.Table) -> pa.Table:
        i = batch.column("vec_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        us, vs = [], []
        r = i % 10
        base = (i // 10) * 10
        in_complete_clique = (r <= 2) & (base + 3 < n)
        path = (i + 1 < n) & ~in_complete_clique
        us.append(i[path]); vs.append(i[path] + 1)
        cb = i[(r == 0) & (i + 3 < n)]
        for a, c in ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)):
            us.append(cb + a); vs.append(cb + c)
        cc = i[(r == 5) & (i + 3 < n)]
        us.append(cc); vs.append(cc + 2)
        us.append(cc + 1); vs.append(cc + 3)
        u = np.concatenate(us); v = np.concatenate(vs)
        return pa.Table.from_pydict({
            "u": pa.array(np.concatenate([u, v]), pa.int64()),
            "v": pa.array(np.concatenate([v, u]), pa.int64()),
        })

    return ids.map_batches(_mk, batch_format="pyarrow",
                           zero_copy_batch=True)


def kcore_planted_query(sf_dir: str) -> ray.data.Dataset:
    import os

    from nerfray.sources.parquet import read_parquet_clean
    ids = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id"])
    n = ids.count()
    return kcore(planted_kcore_edges(ids, n), k=KCORE_K,
                 rounds=KCORE_ROUNDS_SQL)


def kcore_planted_sql(rounds: int = KCORE_ROUNDS_SQL) -> str:
    """Unrolled synchronous peel: alive_t = nodes with degree >= k over
    edges restricted to alive_{t-1}. The planted cascade reaches its
    fixpoint strictly before the last layer, so the unroll equals the
    true k-core."""
    layers = ["alive1 AS (SELECT u AS node FROM e GROUP BY u "
              f"HAVING count(*) >= {KCORE_K})"]
    for t in range(2, rounds + 1):
        layers.append(
            f"alive{t} AS (SELECT u AS node FROM e "
            f"WHERE u IN (SELECT node FROM alive{t - 1}) "
            f"AND v IN (SELECT node FROM alive{t - 1}) "
            f"GROUP BY u HAVING count(*) >= {KCORE_K})")
    return f"""
WITH nn AS (SELECT count(*)::BIGINT AS n FROM embeddings),
ids AS (SELECT vec_id::BIGINT AS i FROM embeddings),
cliq AS (
  SELECT i + a.a AS u, i + b.b AS v
  FROM ids, nn, (VALUES (0), (1), (2)) a(a), (VALUES (1), (2), (3)) b(b)
  WHERE i % 10 = 0 AND i + 3 < nn.n AND a.a < b.b
),
pth AS (
  SELECT i AS u, i + 1 AS v FROM ids, nn
  WHERE i + 1 < nn.n
    AND NOT (i % 10 IN (0, 1, 2) AND (i // 10) * 10 + 3 < nn.n)
),
casc AS (
  SELECT i AS u, i + 2 AS v FROM ids, nn
  WHERE i % 10 = 5 AND i + 3 < nn.n
  UNION ALL
  SELECT i + 1, i + 3 FROM ids, nn WHERE i % 10 = 5 AND i + 3 < nn.n
),
und AS (SELECT * FROM cliq UNION ALL SELECT * FROM pth
        UNION ALL SELECT * FROM casc),
e AS (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und),
{',' .join(layers)}
SELECT node FROM alive{rounds} ORDER BY node
"""


# ---------------------------------------------------------------------------
# common-neighbor link prediction (entity-pair similarity on the KG)
# ---------------------------------------------------------------------------
#
# For canonicalization/entity-resolution triage: subjects that share many
# objects (libraries, licenses) are candidate merges / related entities
# (the classic common-neighbors link-prediction score, Liben-Nowell &
# Kleinberg 2003).  Scale shape: ONE obj-hash bucket exchange co-locates
# each object's full subject set (global distinct per obj falls out
# inside the bucket), pair emission is capped per hot object with the
# drop logged (the same documented-recall-loss pattern as the LSH caps),
# then one narrow (node_a, node_b) count exchange.  Subject text is the
# only payload that moves; caps keep the pair blow-up of hub objects
# (a stdlib library linked by every repo) bounded.

CN_BUCKETS = 64
CN_CAP = 200


def _cn_obj_bucket(batch: pa.Table) -> pa.Table:
    import pandas as pd
    seen = sorted(set(zip(batch.column("obj").to_pylist(),
                          batch.column("subj").to_pylist())))
    objs = np.empty(len(seen), object)
    objs[:] = [o for o, _ in seen]
    hb = (pd.util.hash_array(objs) % CN_BUCKETS).astype(np.int32)
    return pa.Table.from_pydict({
        "obj": pa.array(objs, pa.string()),
        "subj": pa.array([s for _, s in seen], pa.string()),
        "hb": pa.array(hb, pa.int32()),
    })


_CN_PARTIAL_SCHEMA = pa.schema([("node_a", pa.string()),
                                ("node_b", pa.string()),
                                ("cnt", pa.int64()),
                                ("phb", pa.int32())])

_CN_OUT_SCHEMA = pa.schema([("node_a", pa.string()),
                            ("node_b", pa.string()),
                            ("n_common", pa.int64())])


def _cn_pairs_bucket(group: pa.Table, *, cap: int = CN_CAP) -> pa.Table:
    """Pair emission + IN-BUCKET COMBINER: a pair appears once per
    shared object, and objects hashing to the same bucket collapse here
    (pandas groupby-size), so the pair-count exchange ships partials,
    never raw pair occurrences.  Rows are routed by a pair hash so the
    final sum is a 64-way co-group, not a Ray sort-groupby over two
    string columns (measured 17 s -> sub-second at 600k pair rows)."""
    if group.num_rows == 0:
        return _CN_PARTIAL_SCHEMA.empty_table()
    rows = sorted(set(zip(group.column("obj").to_pylist(),
                          group.column("subj").to_pylist())))
    a: list = []
    b: list = []
    run_obj, run_subjs = None, []

    def _emit_run(subjs: list) -> None:
        if len(subjs) > cap:
            # hub object (e.g. a license shared by most of the corpus):
            # skip the WHOLE object — a near-universal attribute carries
            # no link signal, and dropping it entirely (vs truncating)
            # keeps the result deterministic, unbiased and SQL-exact
            # (oracle mirrors with HAVING count(*) <= cap per obj)
            import logging
            logging.getLogger(__name__).warning(
                "common-neighbors hub object skipped: %d subjects > "
                "cap=%d", len(subjs), cap)
            return
        for i in range(len(subjs)):
            for j in range(i + 1, len(subjs)):
                a.append(subjs[i])
                b.append(subjs[j])

    for obj, subj in rows:
        if obj != run_obj:
            if run_subjs:
                _emit_run(run_subjs)
            run_obj, run_subjs = obj, []
        run_subjs.append(subj)
    if run_subjs:
        _emit_run(run_subjs)
    if not a:
        return _CN_PARTIAL_SCHEMA.empty_table()
    import pandas as pd
    partial = pd.DataFrame({"node_a": a, "node_b": b}) \
        .groupby(["node_a", "node_b"], sort=False).size() \
        .reset_index(name="cnt")
    ha = pd.util.hash_array(partial["node_a"].to_numpy(dtype=object))
    hb = pd.util.hash_array(partial["node_b"].to_numpy(dtype=object))
    phb = ((ha * np.uint64(1099511628211)) ^ hb) % np.uint64(CN_BUCKETS)
    return pa.Table.from_pydict({
        "node_a": pa.array(partial["node_a"], pa.string()),
        "node_b": pa.array(partial["node_b"], pa.string()),
        "cnt": pa.array(partial["cnt"].to_numpy(np.int64), pa.int64()),
        "phb": pa.array(phb.astype(np.int32), pa.int32()),
    }, schema=_CN_PARTIAL_SCHEMA)


def _cn_sum_bucket(group: pa.Table, *, min_common: int) -> pa.Table:
    """Final pair-count reduce inside one pair-hash bucket (every
    partial of a pair lands here by construction), gated at
    min_common before anything leaves the bucket."""
    if group.num_rows == 0:
        return _CN_OUT_SCHEMA.empty_table()
    import pandas as pd
    df = pd.DataFrame({
        "node_a": group.column("node_a").to_pylist(),
        "node_b": group.column("node_b").to_pylist(),
        "cnt": group.column("cnt").to_numpy(zero_copy_only=False)})
    total = df.groupby(["node_a", "node_b"], sort=False)["cnt"].sum() \
        .reset_index(name="n_common")
    total = total[total["n_common"] >= min_common]
    return pa.Table.from_pydict({
        "node_a": pa.array(total["node_a"], pa.string()),
        "node_b": pa.array(total["node_b"], pa.string()),
        "n_common": pa.array(total["n_common"].to_numpy(np.int64),
                             pa.int64()),
    }, schema=_CN_OUT_SCHEMA)


def common_neighbors(triples: ray.data.Dataset, *, min_common: int = 2,
                     cap: int = CN_CAP) -> ray.data.Dataset:
    """(node_a, node_b, n_common) for subject pairs sharing >= min_common
    objects; node_a < node_b lexicographically."""
    return triples.select_columns(["subj", "obj"]) \
        .map_batches(_cn_obj_bucket, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("hb").map_groups(
            functools.partial(_cn_pairs_bucket, cap=cap),
            batch_format="pyarrow") \
        .groupby("phb").map_groups(
            functools.partial(_cn_sum_bucket, min_common=min_common),
            batch_format="pyarrow")


# ---------------------------------------------------------------------------
# weighted single-source shortest paths (bounded Bellman-Ford rounds)
# ---------------------------------------------------------------------------
#
# The weighted companion to bfs_hops: R relaxation rounds compute the
# exact min-cost path using <= R edges (integer weights -> integer
# distances, no float drift).  Each round is ONE keyed co-group (the
# fused kernel above); both distances and edges live entirely as
# Datasets and the driver sees nothing.  Fixed R (not
# run-to-convergence) keeps the round structure identical to the
# unrolled SQL oracle.

SSSP_WEIGHTS = {7: 3, 13: 1, 20: 5}   # offset -> edge weight
SSSP_ROUNDS = 5


def sssp_rounds(edges: ray.data.Dataset, seeds: ray.data.Dataset, *,
                rounds: int = SSSP_ROUNDS) -> ray.data.Dataset:
    """(node, dist): exact shortest distance from the seed set using at
    most ``rounds`` edges.  ``edges`` has int64 (u, v, w); ``seeds`` a
    (node) column (distance 0).  Shares the fused
    one-co-group-per-round kernel with ``bfs_hops`` (rounds+1
    exchanges total, one lazy plan, no driver barriers)."""
    e = edges.map_batches(_relax_edge_rows, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    return _min_relax_rounds(e, seeds, rounds=rounds,
                             kcol="node", dcol="dist")


def planted_weighted_edges(ids: ray.data.Dataset,
                           n: int) -> ray.data.Dataset:
    """(i, (i+o) % n, w_o) for o in SSSP_WEIGHTS — the triangle fixture
    graph with deterministic integer weights."""

    def _mk(batch: pa.Table) -> pa.Table:
        v_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        us, vs, ws = [], [], []
        for off, w in SSSP_WEIGHTS.items():
            us.append(v_ids)
            vs.append((v_ids + off) % n)
            ws.append(np.full(len(v_ids), w, np.int64))
        return pa.Table.from_pydict({
            "u": pa.array(np.concatenate(us), pa.int64()),
            "v": pa.array(np.concatenate(vs), pa.int64()),
            "w": pa.array(np.concatenate(ws), pa.int64()),
        })

    return ids.map_batches(_mk, batch_format="pyarrow",
                           zero_copy_batch=True)


def sssp_planted_query(sf_dir: str) -> ray.data.Dataset:
    """Bounded-round SSSP over the weighted offset graph from seed 0."""
    import os

    import ray.data as rd

    import pyarrow.compute as pc

    from nerfray.sources.parquet import read_parquet_clean
    ids = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id"])
    n = ids.count()
    edges = planted_weighted_edges(ids, n)

    def _seed(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "node": pc.cast(batch.column("id"), pa.int64())})

    seeds = rd.range(1).map_batches(_seed, batch_format="pyarrow")
    return sssp_rounds(edges, seeds, rounds=SSSP_ROUNDS)


def sssp_planted_sql(rounds: int = SSSP_ROUNDS) -> str:
    """Unrolled Bellman-Ford: d_{t+1} = min(d_t, relax(d_t)) per layer —
    integer arithmetic end to end, so the hash match is exact."""
    edge_sel = "\n  UNION ALL ".join(
        f"SELECT vec_id AS u, (vec_id + {off}) % nn.n AS v, "
        f"{w}::BIGINT AS w FROM embeddings, nn"
        for off, w in SSSP_WEIGHTS.items())
    layers = []
    for t in range(rounds):
        layers.append(
            f"d{t + 1} AS (SELECT node, min(dist)::BIGINT AS dist FROM ("
            f"SELECT node, dist FROM d{t} "
            f"UNION ALL SELECT e.v AS node, d{t}.dist + e.w AS dist "
            f"FROM d{t} JOIN e ON e.u = d{t}.node) GROUP BY node)")
    return (
        "WITH nn AS (SELECT count(*)::BIGINT AS n FROM embeddings),\n"
        f"e AS (\n  {edge_sel}\n),\n"
        "d0 AS (SELECT 0::BIGINT AS node, 0::BIGINT AS dist),\n"
        + ",\n".join(layers)
        + f"\nSELECT node, dist FROM d{rounds} ORDER BY node"
    )


# ---------------------------------------------------------------------------
# neighbor-degree aggregation (one-round feature propagation)
# ---------------------------------------------------------------------------
#
# For every node: how many distinct neighbors it has and the SUM of
# their degrees — the simplest graph-feature-propagation round (the
# building block of degree-based hub scoring and GNN-style neighbor
# aggregates).  Shape: distinct undirected edges -> degree rollup ->
# one hash_join of edges against degrees -> node-grain rollup; all
# integer counts, fully SQL-oracle-able on the gold triples.

_ND_EDGE_SCHEMA = pa.schema([("a", pa.string()), ("b", pa.string()),
                             ("deg", pa.int64()), ("is_deg", pa.int8())])


def _nd_bucket(batch: pa.Table) -> pa.Table:
    """Symmetrize (subj, obj) and bucket by hash(a): every copy of an
    undirected edge (a, b) lands in bucket(a), so both the global
    distinct AND deg(a) fall out inside one co-group."""
    import pandas as pd
    s = batch.column("subj")
    o = batch.column("obj")
    a = pa.chunked_array(list(s.chunks) + list(o.chunks))
    b = pa.chunked_array(list(o.chunks) + list(s.chunks))
    arr = np.asarray(a.to_pylist(), dtype=object)
    hb = (pd.util.hash_array(arr) % N_STAR_BUCKETS).astype(np.int32)
    return pa.Table.from_pydict({
        "a": a, "b": b, "hb": pa.array(hb, pa.int32())})


def _nd_distinct_deg(group: pa.Table) -> pa.Table:
    """Per a-hash bucket: distinct (a, b) edge rows (is_deg=0) plus one
    (a, deg) row per node (is_deg=1) — ONE exchange replaces the former
    two-string-column sort groupby + degree rollup pair."""
    if group.num_rows == 0:
        return _ND_EDGE_SCHEMA.empty_table()
    import pandas as pd
    df = pd.DataFrame({"a": group.column("a").to_pylist(),
                       "b": group.column("b").to_pylist()})
    dedup = df.drop_duplicates()
    deg = dedup.groupby("a", sort=False).size().reset_index(name="deg")
    n_e, n_d = len(dedup), len(deg)
    return pa.Table.from_pydict({
        "a": pa.array(list(dedup["a"]) + list(deg["a"]), pa.string()),
        "b": pa.array(list(dedup["b"]) + [""] * n_d, pa.string()),
        "deg": pa.array(np.r_[np.zeros(n_e, np.int64),
                              deg["deg"].to_numpy(np.int64)], pa.int64()),
        "is_deg": pa.array(np.r_[np.zeros(n_e, np.int8),
                                 np.ones(n_d, np.int8)], pa.int8()),
    }, schema=_ND_EDGE_SCHEMA)


def neighbor_degree(triples: ray.data.Dataset) -> ray.data.Dataset:
    """(node, n_neighbors, sum_neighbor_deg) over the undirected
    distinct-edge view of (subj, obj).

    Three exchanges: (1) a-hash co-group producing distinct edges and
    per-node degrees together, (2) hash_join of edges against degrees
    on the b endpoint, (3) node rollup of map-side (a, cnt, sum)
    partials."""
    import pyarrow.compute as pc

    from nerfray.ops.joins import hash_join

    both = triples.select_columns(["subj", "obj"]) \
        .map_batches(_nd_bucket, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("hb").map_groups(_nd_distinct_deg,
                                  batch_format="pyarrow") \
        .materialize()
    edges = both.filter(expr="is_deg == 0").select_columns(["a", "b"])
    deg = both.filter(expr="is_deg == 1").select_columns(["a", "deg"]) \
        .rename_columns({"a": "node"})

    def _rollup_partial(batch: pa.Table) -> pa.Table:
        """Map-side combine of the join output to (a, cnt, sum) grain."""
        import pandas as pd
        df = pd.DataFrame({
            "a": batch.column("a").to_pylist(),
            "deg": batch.column("deg").to_numpy(zero_copy_only=False)})
        g = df.groupby("a", sort=False)["deg"].agg(["size", "sum"]) \
            .reset_index()
        return pa.Table.from_pydict({
            "a": pa.array(g["a"], pa.string()),
            "cnt": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
            "s": pa.array(g["sum"].to_numpy(np.int64), pa.int64())})

    from ray.data.aggregate import Sum
    return hash_join(edges, deg, left_on="b", right_on="node",
                     left_cols=["a"], right_cols=["deg"]) \
        .map_batches(_rollup_partial, batch_format="pyarrow") \
        .groupby("a").aggregate(Sum("cnt"), Sum("s")) \
        .rename_columns({"a": "node", "sum(cnt)": "n_neighbors",
                         "sum(s)": "sum_neighbor_deg"})


# ---------------------------------------------------------------------------
# label propagation communities (deterministic synchronous variant)
# ---------------------------------------------------------------------------
#
# Raghavan et al. 2007's near-linear community detection, made
# deterministic for a distributed setting: all nodes update
# SYNCHRONOUSLY each round, the new label is the most frequent label
# among a node's neighbors (edge multiset — parallel edges vote twice),
# ties broken by the SMALLEST label.  Deterministic under any
# parallelism, so the unrolled rounds are SQL-mirrorable.
#
# Scale shape: labels stay a Dataset the whole time; ONE 64-way keyed
# co-group per round (fused, same recipe as the min-relax kernel): the
# bucket for node-hash h receives every VOTE targeted at its nodes (the
# previous round's label emissions) plus every edge whose source hashes
# to h; it computes the per-node argmax label and emits next-round
# votes along the co-located edges.  Round-1 votes are map-side (the
# initial label of u IS u).  rounds exchanges total, one lazy plan.
# The driver holds nothing node-sized.

LPA_ROUNDS = 2
_LPA_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])
_LPA_ROW_SCHEMA = pa.schema([
    ("k", pa.int64()),    # vote: target node | edge: source node
    ("lab", pa.int64()),  # vote: label       | edge: unused
    ("v", pa.int64()),    # edge: destination
    ("side", pa.int8()),  # 0 = vote, 1 = edge
    ("hb", pa.int32()),
])


def _lpa_sym_pair(batch: pa.Table):
    a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
    b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
    return np.concatenate([a, b]), np.concatenate([b, a])


def _lpa_vote1_rows(batch: pa.Table) -> pa.Table:
    """Round-1 votes straight from the edge batch: label_0(u) = u, so
    edge u -> v votes (v, u).  No exchange needed."""
    src, dst = _lpa_sym_pair(batch)
    return pa.Table.from_pydict({
        "k": dst, "lab": src, "v": np.zeros(len(dst), np.int64),
        "side": np.zeros(len(dst), np.int8),
        "hb": (dst % _RELAX_BUCKETS).astype(np.int32),
    }, schema=_LPA_ROW_SCHEMA)


def _lpa_edge_rows(batch: pa.Table) -> pa.Table:
    src, dst = _lpa_sym_pair(batch)
    return pa.Table.from_pydict({
        "k": src, "lab": np.zeros(len(src), np.int64), "v": dst,
        "side": np.ones(len(src), np.int8),
        "hb": (src % _RELAX_BUCKETS).astype(np.int32),
    }, schema=_LPA_ROW_SCHEMA)


def _lpa_argmax(k: np.ndarray, lab: np.ndarray):
    """Per-node argmax label with (count DESC, label ASC) tie order —
    run counts per (node, label) then a pick lexsort, no Python loop."""
    order = np.lexsort((lab, k))
    k_s, l_s = k[order], lab[order]
    new_run = np.r_[True, (k_s[1:] != k_s[:-1]) | (l_s[1:] != l_s[:-1])]
    starts = np.flatnonzero(new_run)
    counts = np.diff(np.r_[starts, len(k_s)])
    rv, rl = k_s[starts], l_s[starts]
    pick = np.lexsort((rl, -counts, rv))
    first = np.r_[True, rv[pick][1:] != rv[pick][:-1]]
    sel = pick[first]
    return rv[sel], rl[sel]


def _lpa_round_bucket(group: pa.Table) -> pa.Table:
    """One fused LPA round inside a node-hash bucket: argmax the
    incoming votes, then emit next-round votes along the co-located
    out-edges (sorted-array lookup, no join)."""
    if group.num_rows == 0:
        return _LPA_ROW_SCHEMA.empty_table()
    side = group.column("side").to_numpy(zero_copy_only=False)
    k = group.column("k").to_numpy(zero_copy_only=False)
    is_vote = side == 0
    if not is_vote.any():
        return _LPA_ROW_SCHEMA.empty_table()
    nodes, labels = _lpa_argmax(
        k[is_vote],
        group.column("lab").to_numpy(zero_copy_only=False)[is_vote])
    is_e = ~is_vote
    eu = k[is_e]
    idx = np.searchsorted(nodes, eu)
    idx[idx >= len(nodes)] = 0
    hit = nodes[idx] == eu
    ev = group.column("v").to_numpy(zero_copy_only=False)[is_e][hit]
    el = labels[idx[hit]]
    return pa.Table.from_pydict({
        "k": ev, "lab": el, "v": np.zeros(len(ev), np.int64),
        "side": np.zeros(len(ev), np.int8),
        "hb": (ev % _RELAX_BUCKETS).astype(np.int32),
    }, schema=_LPA_ROW_SCHEMA)


def _lpa_final_bucket(group: pa.Table) -> pa.Table:
    if group.num_rows == 0:
        return _LPA_SCHEMA.empty_table()
    side = group.column("side").to_numpy(zero_copy_only=False)
    is_vote = side == 0
    nodes, labels = _lpa_argmax(
        group.column("k").to_numpy(zero_copy_only=False)[is_vote],
        group.column("lab").to_numpy(zero_copy_only=False)[is_vote])
    return pa.Table.from_pydict({"node": nodes, "label": labels},
                                schema=_LPA_SCHEMA)


def _lpa_init_rows(batch: pa.Table) -> pa.Table:
    """rounds=0 path: every endpoint labelled by itself (as votes, so
    the final argmax collapses duplicates)."""
    src, _dst = _lpa_sym_pair(batch)
    return pa.Table.from_pydict({
        "k": src, "lab": src, "v": np.zeros(len(src), np.int64),
        "side": np.zeros(len(src), np.int8),
        "hb": (src % _RELAX_BUCKETS).astype(np.int32),
    }, schema=_LPA_ROW_SCHEMA)


def label_propagation(edges: ray.data.Dataset, *,
                      rounds: int = LPA_ROUNDS) -> ray.data.Dataset:
    """(node, label) after ``rounds`` synchronous LPA rounds over
    undirected int64 (a, b) edges (one row per edge; symmetrized here —
    parallel edges vote twice).  Nodes are the edge endpoints, so every
    node has >= 1 vote per round."""
    if rounds == 0:
        votes = edges.map_batches(_lpa_init_rows, batch_format="pyarrow",
                                  zero_copy_batch=True)
        return votes.groupby("hb").map_groups(_lpa_final_bucket,
                                              batch_format="pyarrow")
    votes = edges.map_batches(_lpa_vote1_rows, batch_format="pyarrow",
                              zero_copy_batch=True)
    if rounds >= 2:
        e = edges.map_batches(_lpa_edge_rows, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
        for _ in range(rounds - 1):
            # per-round repartition clamp — see _min_relax_rounds
            votes = e.union(votes).groupby("hb").map_groups(
                _lpa_round_bucket, batch_format="pyarrow") \
                .repartition(16)
    return votes.groupby("hb").map_groups(_lpa_final_bucket,
                                          batch_format="pyarrow")


def planted_lpa_edges(ids: ray.data.Dataset, n: int) -> ray.data.Dataset:
    """Star-of-cliques fixture over dense ids 0..n-1: members link to
    their group-of-5 leader (i, i - i%5), leaders chain to the next
    leader (g, g+5) — every node is an endpoint, communities have a
    known 2-round evolution, all SQL arithmetic."""

    def _mk(batch: pa.Table) -> pa.Table:
        i = batch.column("vec_id").to_numpy(zero_copy_only=False)
        mem = i[i % 5 != 0]
        lead = i[(i % 5 == 0) & (i + 5 < n)]
        return pa.Table.from_pydict({
            "a": pa.array(np.concatenate([mem, lead]), pa.int64()),
            "b": pa.array(np.concatenate([mem - mem % 5, lead + 5]),
                          pa.int64()),
        })

    return ids.map_batches(_mk, batch_format="pyarrow",
                           zero_copy_batch=True)


def lpa_planted_sql(rounds: int = LPA_ROUNDS) -> str:
    """Unrolled synchronous rounds: each round is a GROUP BY
    (node, label) vote count + row_number pick with (count DESC,
    label ASC) — exactly the distributed argmax."""
    prev = ("SELECT a AS node, a AS label FROM "
            "(SELECT DISTINCT a FROM e)")
    for r in range(rounds):
        prev = f"""
SELECT node, label FROM (
  SELECT e.v AS node, l.label AS label,
         row_number() OVER (PARTITION BY e.v
                            ORDER BY count(*) DESC, l.label ASC) AS rn
  FROM (SELECT a, b AS v FROM e) AS e(a, v)
       JOIN ({prev}) l ON l.node = e.a
  GROUP BY e.v, l.label) WHERE rn = 1"""
    return f"""
WITH nn AS (SELECT count(*)::BIGINT AS n FROM embeddings),
e0 AS (
  SELECT vec_id AS a, vec_id - (vec_id % 5) AS b
  FROM embeddings WHERE vec_id % 5 <> 0
  UNION ALL
  SELECT vec_id, vec_id + 5 FROM embeddings, nn
  WHERE vec_id % 5 = 0 AND vec_id + 5 < nn.n),
e AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0)
SELECT node, label FROM ({prev}) ORDER BY node
"""


def lpa_planted_query(sf_dir: str) -> ray.data.Dataset:
    import os

    from nerfray.sources.parquet import read_parquet_clean
    ids = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id"])
    return label_propagation(planted_lpa_edges(ids, ids.count()),
                             rounds=LPA_ROUNDS)


# ---------------------------------------------------------------------------
# Deterministic random-walk sampling (DeepWalk/node2vec corpus generation)
# ---------------------------------------------------------------------------
#
# The walk-corpus primitive graph-embedding trainers consume (Perozzi et
# al., KDD'14 "DeepWalk"): one fixed-length walk per node over the
# undirected KG.  The "random" next-hop pick is a deterministic
# hash-argmin — next(cur, step) = argmin_b sha256(cur|step|b) over cur's
# neighbors — so the sampled corpus is reproducible across runs/engines
# and carries a FULL SQL mirror (row_number over the same sha256).  A
# production run would salt the digest with a walk index to draw many
# walks per node; the exchange shape is unchanged.
#
# Scale shape: the pick depends only on (cur, step), so each step's
# transition table nxt_k (ONE row per node) is built by a bucketed
# argmin co-group over the edge set (O(buckets) dispatch, numpy argmin
# inside), and the walk extension is one hash_join per step — walks
# never co-locate with the full adjacency of their current node.


def _walk_next_bucket(group: pa.Table, *, step: int) -> pa.Table:
    """One u-hash bucket: per source node, the sha256-argmin neighbor
    (tie-break by neighbor string; every partial of a node's
    neighborhood is in this bucket)."""
    import hashlib
    empty = pa.Table.from_pydict({"a": pa.array([], pa.string()),
                                  "b": pa.array([], pa.string())})
    if group.num_rows == 0:
        return empty
    u = np.asarray(group.column("u").to_pylist(), dtype=object)
    v = np.asarray(group.column("v").to_pylist(), dtype=object)
    dig = np.asarray([hashlib.sha256(f"{a}|{step}|{b}".encode())
                      .hexdigest() for a, b in zip(u, v)], dtype=object)
    order = np.lexsort((v, dig, u))
    first = np.r_[True, u[order][1:] != u[order][:-1]]
    sel = order[first]
    return pa.Table.from_pydict({"a": pa.array(u[sel], pa.string()),
                                 "b": pa.array(v[sel], pa.string())})


def random_walks(triples: ray.data.Dataset, *,
                 length: int = 3) -> ray.data.Dataset:
    """(start, hop1..hopN): one deterministic length-``length`` walk
    from every node of the undirected KG (self-loops dropped; a node
    with no proper neighbor starts no walk — mirrored in SQL).  Edges
    are materialized once (narrow string pairs) and re-grouped per
    step; each extension is one hash_join of the walk table against
    that step's one-row-per-node transition table."""
    from nerfray.ops.joins import hash_join

    edges = triples.select_columns(["subj", "obj"]) \
        .map_batches(_init_edges, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .filter(expr="a != b") \
        .map_batches(_symmetrize, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .map_batches(_hash_bucket, batch_format="pyarrow") \
        .materialize()

    def _nxt(step: int) -> ray.data.Dataset:
        return edges.groupby("bucket").map_groups(
            _walk_next_bucket, fn_kwargs={"step": step},
            batch_format="pyarrow")

    walks = _nxt(1).rename_columns({"a": "start", "b": "hop1"})
    for k in range(2, length + 1):
        nk = _nxt(k).rename_columns({"a": f"src{k}", "b": f"hop{k}"})
        prev = ["start"] + [f"hop{j}" for j in range(1, k - 1)]
        walks = hash_join(walks, nk, left_on=f"hop{k - 1}",
                          right_on=f"src{k}", left_cols=prev,
                          right_cols=[f"hop{k}"]) \
            .rename_columns({"__key": f"hop{k - 1}"})
    return walks.select_columns(
        ["start"] + [f"hop{k}" for k in range(1, length + 1)])


def random_walks_sql(gold_sql: str, *, length: int = 3) -> str:
    """Unrolled mirror: per step a row_number()-over-sha256 transition
    table, chained by joins."""
    nxts = [
        f"""n{k} AS (SELECT a, b FROM (
  SELECT a, b, row_number() OVER (
    PARTITION BY a ORDER BY sha256(a || '|{k}|' || b), b) AS rk
  FROM e) WHERE rk = 1)""" for k in range(1, length + 1)]
    joins = "n1"
    sel = ["n1.a AS start", "n1.b AS hop1"]
    for k in range(2, length + 1):
        joins += f" JOIN n{k} ON n{k}.a = n{k - 1}.b"
        sel.append(f"n{k}.b AS hop{k}")
    return f"""
WITH gold AS ({gold_sql}),
e AS (SELECT DISTINCT subj AS a, obj AS b FROM gold WHERE subj <> obj
      UNION SELECT obj, subj FROM gold WHERE subj <> obj),
{",".join(nxts)}
SELECT {", ".join(sel)} FROM {joins} ORDER BY start
"""

# ---------------------------------------------------------------------------
# Skip-gram pair extraction over the walk corpus (word2vec input grain)
# ---------------------------------------------------------------------------
#
# The second half of the DeepWalk recipe: the walk corpus is consumed as
# (center, context) co-occurrence counts within a token window (Mikolov
# et al. 2013).  Scale shape: pair emission is a vectorized per-block
# flat-map over the walk table (position-pair concat, no per-row loop)
# with a BLOCK-LEVEL COMBINER (pandas groupby partial counts), so the
# only exchange ships (center, context, partial_n) rows — bounded by
# distinct pairs per block, never raw pair occurrences — routed by a
# 64-way pair hash (dispatch-grain rule; a sort-groupby over two string
# columns is the slow path this avoids).

SKIPGRAM_WINDOW = 2

_SG_SCHEMA = pa.schema([("center", pa.string()), ("context", pa.string()),
                        ("n_pairs", pa.int64()), ("hb", pa.int32())])
_SG_OUT = pa.schema([("center", pa.string()), ("context", pa.string()),
                     ("n_pairs", pa.int64())])


def _skipgram_partial(batch: pa.Table, *, length: int,
                      window: int) -> pa.Table:
    """Walk rows -> per-block (center, context, partial count, pair-hash
    bucket)."""
    import pandas as pd
    if batch.num_rows == 0:
        return _SG_SCHEMA.empty_table()
    names = ["start"] + [f"hop{k}" for k in range(1, length + 1)]
    toks = [np.asarray(batch.column(n).to_pylist(), dtype=object)
            for n in names]
    centers, contexts = [], []
    for i in range(length + 1):
        for j in range(length + 1):
            if i != j and abs(i - j) <= window:
                centers.append(toks[i])
                contexts.append(toks[j])
    df = pd.DataFrame({"center": np.concatenate(centers),
                       "context": np.concatenate(contexts)})
    g = df.groupby(["center", "context"], sort=True) \
        .size().reset_index(name="n_pairs")
    hb = (pd.util.hash_pandas_object(g[["center", "context"]], index=False)
          .to_numpy() % 64).astype(np.int32)
    return pa.Table.from_pydict({
        "center": pa.array(g["center"], pa.string()),
        "context": pa.array(g["context"], pa.string()),
        "n_pairs": pa.array(g["n_pairs"].to_numpy(np.int64), pa.int64()),
        "hb": pa.array(hb, pa.int32()),
    }, schema=_SG_SCHEMA)


def _skipgram_sum(group: pa.Table) -> pa.Table:
    import pandas as pd
    if group.num_rows == 0:
        return _SG_OUT.empty_table()
    df = group.select(["center", "context", "n_pairs"]).to_pandas()
    g = df.groupby(["center", "context"], sort=True, as_index=False).sum()
    return pa.Table.from_pydict({
        "center": pa.array(g["center"], pa.string()),
        "context": pa.array(g["context"], pa.string()),
        "n_pairs": pa.array(g["n_pairs"].to_numpy(np.int64), pa.int64()),
    }, schema=_SG_OUT)


def walk_skipgrams(triples: ray.data.Dataset, *, length: int = 3,
                   window: int = SKIPGRAM_WINDOW) -> ray.data.Dataset:
    """(center, context, n_pairs): skip-gram co-occurrence counts within
    ``window`` positions over the deterministic walk corpus (both
    directions; a pair is counted once per ordered position pair per
    walk)."""
    walks = random_walks(triples, length=length)
    return walks.map_batches(
        _skipgram_partial, fn_kwargs={"length": length, "window": window},
        batch_format="pyarrow") \
        .groupby("hb").map_groups(_skipgram_sum, batch_format="pyarrow")


def walk_skipgrams_sql(gold_sql: str, *, length: int = 3,
                       window: int = SKIPGRAM_WINDOW) -> str:
    """Mirror: the walk CTE chain, unpivoted to (walk, pos, tok), then a
    windowed position self-join + count."""
    nxts = [
        f"""n{k} AS (SELECT a, b FROM (
  SELECT a, b, row_number() OVER (
    PARTITION BY a ORDER BY sha256(a || '|{k}|' || b), b) AS rk
  FROM e) WHERE rk = 1)""" for k in range(1, length + 1)]
    joins = "n1"
    sel = ["n1.a AS t0", "n1.b AS t1"]
    for k in range(2, length + 1):
        joins += f" JOIN n{k} ON n{k}.a = n{k - 1}.b"
        sel.append(f"n{k}.b AS t{k}")
    unpiv = " UNION ALL ".join(
        f"SELECT t0 AS walk, {p} AS pos, t{p} AS tok FROM walks"
        for p in range(length + 1))
    return f"""
WITH gold AS ({gold_sql}),
e AS (SELECT DISTINCT subj AS a, obj AS b FROM gold WHERE subj <> obj
      UNION SELECT obj, subj FROM gold WHERE subj <> obj),
{",".join(nxts)},
walks AS (SELECT {", ".join(sel)} FROM {joins}),
tok AS ({unpiv})
SELECT a.tok AS center, b.tok AS context, count(*)::BIGINT AS n_pairs
FROM tok a JOIN tok b
  ON a.walk = b.walk AND a.pos <> b.pos AND abs(a.pos - b.pos) <= {window}
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Feature-hashed adjacency embedding (signed random projection)
# ---------------------------------------------------------------------------
#
# A dense integer node embedding: dim j of a node is the sum of
# deterministic ±1 signs of its distinct proper neighbors (sign_j(b) =
# parity of hex digit j of sha256(b)).  This is a signed random
# projection of the adjacency row (Achlioptas 2003 database-friendly
# projections; Charikar 2002 simhash applied to neighbor sets): nodes
# with similar neighborhoods get nearby vectors, so it feeds the same
# ANN/near-dup stack as text embeddings — but over graph structure.
# Exact-integer, so it carries a FULL SQL oracle (no float tolerance).
#
# Scale shape: ONE u-hash bucket exchange co-locates each node's
# neighborhood; inside a bucket the distinct contraction is a pandas
# drop-duplicates, sha256 is computed once per DISTINCT neighbor string
# (memoized dict), and the per-node sums are one groupby-sum over a
# (rows x dims) sign matrix.  Output is long-format (node, dim, val) —
# EMB_HASH_DIMS columns never widen the shuffle.

EMB_HASH_DIMS = 8

_EMBH_SCHEMA = pa.schema([("node", pa.string()), ("dim", pa.int64()),
                          ("val", pa.int64())])


def _emb_hash_bucket(group: pa.Table) -> pa.Table:
    """One u-hash bucket: distinct (u, v) -> per-u signed sums per dim."""
    import hashlib

    import pandas as pd
    if group.num_rows == 0:
        return _EMBH_SCHEMA.empty_table()
    df = pd.DataFrame({"u": group.column("u").to_pylist(),
                       "v": group.column("v").to_pylist()}) \
        .drop_duplicates()
    signs: dict[str, np.ndarray] = {}
    for b in pd.unique(df["v"]):
        h = hashlib.sha256(str(b).encode()).hexdigest()
        signs[b] = np.array([1 if int(h[j], 16) % 2 == 0 else -1
                             for j in range(EMB_HASH_DIMS)], np.int64)
    mat = np.stack([signs[b] for b in df["v"]])
    sums = pd.DataFrame(mat, index=df["u"]).groupby(level=0, sort=True).sum()
    n = len(sums)
    nodes = np.repeat(np.asarray(sums.index, dtype=object), EMB_HASH_DIMS)
    dims = np.tile(np.arange(EMB_HASH_DIMS, dtype=np.int64), n)
    vals = sums.to_numpy(np.int64).reshape(-1)
    return pa.Table.from_pydict({
        "node": pa.array(nodes, pa.string()),
        "dim": pa.array(dims, pa.int64()),
        "val": pa.array(vals, pa.int64()),
    }, schema=_EMBH_SCHEMA)


def hash_embedding(triples: ray.data.Dataset) -> ray.data.Dataset:
    """(node, dim, val): signed-random-projection embedding of every
    node's distinct proper-neighbor set (undirected; self-loops
    dropped).  val is an exact integer in [-deg, deg]."""
    return triples.select_columns(["subj", "obj"]) \
        .map_batches(_init_edges, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .filter(expr="a != b") \
        .map_batches(_symmetrize, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .map_batches(_hash_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(_emb_hash_bucket,
                                      batch_format="pyarrow")


def hash_embedding_sql(gold_sql: str) -> str:
    dims = ", ".join(f"({j})" for j in range(EMB_HASH_DIMS))
    return f"""
WITH gold AS ({gold_sql}),
e AS (SELECT DISTINCT subj AS a, obj AS b FROM gold WHERE subj <> obj
      UNION SELECT obj, subj FROM gold WHERE subj <> obj),
dims(j) AS (VALUES {dims})
SELECT a AS node, j::BIGINT AS dim,
       SUM(CASE WHEN strpos('02468ace', substr(sha256(b), j + 1, 1)) > 0
                THEN 1 ELSE -1 END)::BIGINT AS val
FROM e, dims GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# taxonomy transitive closure + RDFS-style type inference
# ---------------------------------------------------------------------------
#
# The ontology-materialization step of KG construction (rdfs:subClassOf
# closure, then type inference over it).  POINTER DOUBLING (r5, was
# semi-naive): round t holds every ancestor pair within distance 2^t,
# and composing the closure with itself doubles the horizon — so a
# depth-D taxonomy converges in ceil(log2(D)) rounds instead of D
# (the r4 profile: 26.7 s at sf0.1, one ~3.5 s fixed-cost exchange
# set per DEPTH level; depth halves to log-depth here).  Each round is
# ONE hash_join (closure ⋈ closure) + ONE pair-hash dedup co-group
# keeping the MIN dist per (node, anc); the driver sees only the
# closure row count (a scalar).  Exact min-distance closure on any
# DAG (on unique-path trees — the planted K-ary taxonomy — min is
# vacuous and this equals the raw closure a reasoner wants).

TAXO_K = 4

_TAXO_EDGE_SCHEMA = pa.schema([("child", pa.int64()),
                               ("parent", pa.int64())])
_TAXO_CLO_SCHEMA = pa.schema([("node", pa.int64()), ("anc", pa.int64()),
                              ("dist", pa.int64())])


def _taxo_edge_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    ids = ids[ids >= 1]
    return pa.Table.from_pydict(
        {"child": ids, "parent": (ids - 1) // TAXO_K},
        schema=_TAXO_EDGE_SCHEMA)


def planted_taxonomy_edges(ids: ray.data.Dataset) -> ray.data.Dataset:
    """K-ary-tree subclass edges over vec_ids: child i -> (i-1)//K,
    rooted at 0 — depth ~ log_K(n), SQL-mirrorable arithmetic."""
    return ids.map_batches(_taxo_edge_batch, batch_format="pyarrow",
                           zero_copy_batch=True)


def _delta_seed(batch: pa.Table) -> pa.Table:
    return pa.Table.from_pydict({
        "node": batch.column("child"),
        "anc": batch.column("parent"),
        "dist": np.ones(batch.num_rows, np.int64),
    }, schema=_TAXO_CLO_SCHEMA)


def _delta_step(batch: pa.Table) -> pa.Table:
    return pa.Table.from_pydict({
        "node": batch.column("node"),
        "anc": batch.column("parent"),
        "dist": pa.compute.add(batch.column("dist"), 1),
    }, schema=_TAXO_CLO_SCHEMA)


def _taxo_compose(batch: pa.Table) -> pa.Table:
    return pa.Table.from_pydict({
        "node": batch.column("node"),
        "anc": batch.column("anc2"),
        "dist": pa.compute.add(batch.column("dist"),
                               batch.column("dist2")),
    }, schema=_TAXO_CLO_SCHEMA)


def _taxo_dedup_bucket(group: pa.Table) -> pa.Table:
    """Min dist per (node, anc) composite pair, bucket-locally."""
    if group.num_rows == 0:
        return _TAXO_CLO_SCHEMA.empty_table()
    n = group.column("node").to_numpy(zero_copy_only=False)
    a = group.column("anc").to_numpy(zero_copy_only=False)
    d = group.column("dist").to_numpy(zero_copy_only=False)
    order = np.lexsort((d, a, n))
    ns, as_, ds = n[order], a[order], d[order]
    keep = np.r_[True, (ns[1:] != ns[:-1]) | (as_[1:] != as_[:-1])]
    return pa.Table.from_pydict({
        "node": pa.array(ns[keep], pa.int64()),
        "anc": pa.array(as_[keep], pa.int64()),
        "dist": pa.array(ds[keep], pa.int64()),
    }, schema=_TAXO_CLO_SCHEMA)


def _taxo_hb(batch: pa.Table) -> pa.Table:
    n = batch.column("node").to_numpy(zero_copy_only=False)
    a = batch.column("anc").to_numpy(zero_copy_only=False)
    hb = (((n * np.int64(1000003)) ^ a) & 63).astype(np.int32)
    return batch.append_column("hb", pa.array(hb, pa.int32()))


def taxonomy_closure(edges: ray.data.Dataset, *,
                     max_rounds: int = 40) -> ray.data.Dataset:
    """(node, anc, dist) for every proper ancestor with dist = the
    MINIMUM subclass-path length — pointer doubling, so a depth-D
    taxonomy takes ceil(log2(D)) composition rounds (each one
    closure ⋈ closure hash_join + one pair-hash min-dedup co-group).
    On unique-path trees/forests (the planted K-ary taxonomy) min is
    vacuous and this is the raw closure.  Terminates when a round adds
    no pair; ``max_rounds`` only guards against a cyclic input
    (raises — a subclass cycle is an ontology bug, not a closure)."""
    from nerfray.ops.joins import hash_join
    types = {c: pa.int64()
             for c in ("node", "anc", "dist", "node2", "anc2", "dist2")}
    clo = edges.map_batches(_delta_seed, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    prev_n = clo.count()
    for _ in range(max_rounds):
        right = clo.map_batches(
            lambda b: pa.Table.from_pydict(
                {"node2": b.column("node"), "anc2": b.column("anc"),
                 "dist2": b.column("dist")},
                schema=pa.schema([("node2", pa.int64()),
                                  ("anc2", pa.int64()),
                                  ("dist2", pa.int64())])),
            batch_format="pyarrow", zero_copy_batch=True)
        comp = hash_join(
            clo, right, left_on="anc", right_on="node2",
            left_cols=["node", "dist"], right_cols=["anc2", "dist2"],
            field_types=types,
        ).map_batches(_taxo_compose, batch_format="pyarrow")
        # pair-hash min-dedup + block-count clamp (SCALE.md r4 lesson:
        # union loops compound ~64 join-output blocks per round)
        clo = clo.union(comp) \
            .map_batches(_taxo_hb, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .groupby("hb").map_groups(_taxo_dedup_bucket,
                                      batch_format="pyarrow") \
            .repartition(8).materialize()
        n = clo.count()
        if n == prev_n:
            # a subclass cycle converges too (min-dist dedup bounds the
            # pair set) but surfaces as a self-ancestor — keep the
            # raise-on-cycle contract of the semi-naive version
            if clo.filter(expr="node == anc").count() > 0:
                raise ValueError("cyclic subclass graph: node is its "
                                 "own ancestor")
            return clo
        prev_n = n
    raise ValueError(f"taxonomy closure did not converge in "
                     f"{max_rounds} rounds — cyclic subclass graph?")


_TAXO_MEMO: dict[str, ray.data.Dataset] = {}


def taxonomy_closure_planted_query(sf_dir: str) -> ray.data.Dataset:
    import os

    from nerfray.sources.parquet import read_parquet_clean
    got = _TAXO_MEMO.get(sf_dir)
    if got is not None:
        return got
    ids = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id"])
    out = taxonomy_closure(planted_taxonomy_edges(ids))
    _TAXO_MEMO[sf_dir] = out  # taxonomy_closure returns materialized
    return out


TAXO_EDGES_SQL = f"""
  SELECT vec_id AS child, (vec_id - 1) // {TAXO_K} AS parent
  FROM embeddings WHERE vec_id >= 1
"""

TAXO_CLOSURE_PLANTED_SQL = f"""
WITH RECURSIVE e AS ({TAXO_EDGES_SQL}),
clo AS (
  SELECT child AS node, parent AS anc, 1::BIGINT AS dist FROM e
  UNION ALL
  SELECT c.node, e.parent, c.dist + 1 FROM clo c JOIN e ON e.child = c.anc
)
SELECT node, anc, dist FROM clo ORDER BY node, anc
"""


def _direct_type_batch(batch: pa.Table, *, n_classes: int) -> pa.Table:
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    return pa.Table.from_pydict({
        "entity": ids,
        "cls": ids % n_classes,
        "dist": np.zeros(len(ids), np.int64),
    }, schema=pa.schema([("entity", pa.int64()), ("cls", pa.int64()),
                         ("dist", pa.int64())]))


def _inferred_batch(batch: pa.Table) -> pa.Table:
    return pa.Table.from_pydict({
        "entity": batch.column("entity"),
        "cls": batch.column("anc"),
        "dist": batch.column("dist"),
    }, schema=pa.schema([("entity", pa.int64()), ("cls", pa.int64()),
                         ("dist", pa.int64())]))


_TYPES_MEMO: dict[str, ray.data.Dataset] = {}


def type_inference_planted_query(sf_dir: str) -> ray.data.Dataset:
    """RDFS type materialization: every entity's direct class (dist 0)
    plus all inferred superclasses (dist = levels up the closure).
    Entities = documents rows, direct class = doc_id % n_classes; the
    entity-side fan-out happens inside one hash_join against the
    (class-sized, not corpus-sized) closure.  Memoized materialized —
    the domain-constraint check reuses it, exactly as a reasoner
    reuses a materialized type table."""
    import os

    import pyarrow.parquet as _pq

    from nerfray.ops.joins import hash_join
    from nerfray.sources.parquet import read_parquet_clean
    got = _TYPES_MEMO.get(sf_dir)
    if got is not None:
        return got
    n_classes = _pq.read_metadata(
        os.path.join(sf_dir, "embeddings.parquet")).num_rows
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id"])
    direct = docs.map_batches(_direct_type_batch,
                              fn_kwargs={"n_classes": n_classes},
                              batch_format="pyarrow",
                              zero_copy_batch=True)
    clo = taxonomy_closure_planted_query(sf_dir)
    types = {c: pa.int64() for c in ("entity", "cls", "node", "anc",
                                     "dist")}
    inferred = hash_join(
        direct.drop_columns(["dist"]), clo,
        left_on="cls", right_on="node",
        left_cols=["entity"], right_cols=["anc", "dist"],
        field_types=types,
    ).map_batches(_inferred_batch, batch_format="pyarrow")
    out = direct.union(inferred).repartition(8).materialize()
    _TYPES_MEMO[sf_dir] = out
    return out


TYPE_INFERENCE_PLANTED_SQL = f"""
WITH RECURSIVE e AS ({TAXO_EDGES_SQL}),
clo AS (
  SELECT child AS node, parent AS anc, 1::BIGINT AS dist FROM e
  UNION ALL
  SELECT c.node, e.parent, c.dist + 1 FROM clo c JOIN e ON e.child = c.anc
),
nn AS (SELECT count(*)::BIGINT AS n FROM embeddings),
direct AS (SELECT doc_id AS entity, doc_id % nn.n AS cls
           FROM documents, nn)
SELECT entity, cls, 0::BIGINT AS dist FROM direct
UNION ALL
SELECT d.entity, c.anc, c.dist FROM direct d JOIN clo c ON c.node = d.cls
ORDER BY entity, cls
"""


# ---------------------------------------------------------------------------
# domain-constraint validation over the materialized type closure
# ---------------------------------------------------------------------------
#
# The ontology-QA step of KG construction: every statement's relation
# carries a domain class (rdfs:domain), and a statement is valid iff
# the subject's materialized type set (direct class + all inferred
# superclasses) contains that domain.  With domains restricted to a
# small relation vocabulary (DOMAIN_N_RELS classes), only the
# near-root slice of the type table can ever satisfy a constraint —
# so the check is ONE left-anti hash_join on a composite
# (entity, class) key between the statements and that pre-filtered
# slice (~2-3 rows per entity for the K-ary planted tree), never a
# per-entity set materialization on the driver.

DOMAIN_N_RELS = 16

_STMT_SCHEMA = pa.schema([("entity", pa.int64()), ("rel", pa.int64()),
                          ("ck", pa.int64())])
_VIOL_SCHEMA = pa.schema([("entity", pa.int64()), ("rel", pa.int64()),
                          ("dom_cls", pa.int64())])


def _stmt_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    rel = (ids * 7 + 3) % DOMAIN_N_RELS
    return pa.Table.from_pydict(
        {"entity": ids, "rel": rel, "ck": ids * DOMAIN_N_RELS + rel},
        schema=_STMT_SCHEMA)


def _type_ck_batch(batch: pa.Table) -> pa.Table:
    ent = batch.column("entity").to_numpy(zero_copy_only=False)
    cls = batch.column("cls").to_numpy(zero_copy_only=False)
    keep = cls < DOMAIN_N_RELS
    ent, cls = ent[keep], cls[keep]
    return pa.Table.from_pydict(
        {"ck": ent * DOMAIN_N_RELS + cls},
        schema=pa.schema([("ck", pa.int64())]))


def _viol_batch(batch: pa.Table) -> pa.Table:
    rel = batch.column("rel")
    return pa.Table.from_pydict(
        {"entity": batch.column("entity"), "rel": rel, "dom_cls": rel},
        schema=_VIOL_SCHEMA)


def domain_violations_planted_query(sf_dir: str) -> ray.data.Dataset:
    """Statements whose subject's type closure lacks the relation's
    domain class — planted statements (doc_id*7+3 mod R over documents,
    domain(r) = class r) checked against the taxonomy-closure types."""
    import os

    from nerfray.ops.joins import hash_join
    from nerfray.sources.parquet import read_parquet_clean
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id"])
    stmts = docs.map_batches(_stmt_batch, batch_format="pyarrow",
                             zero_copy_batch=True)
    types_ck = type_inference_planted_query(sf_dir).map_batches(
        _type_ck_batch, batch_format="pyarrow", zero_copy_batch=True)
    types = {c: pa.int64() for c in ("entity", "rel", "ck")}
    return hash_join(
        stmts, types_ck, left_on="ck", right_on="ck",
        left_cols=["entity", "rel"], right_cols=[],
        how="left anti", field_types=types,
    ).map_batches(_viol_batch, batch_format="pyarrow")


DOMAIN_VIOLATIONS_PLANTED_SQL = f"""
WITH RECURSIVE e AS ({TAXO_EDGES_SQL}),
clo AS (
  SELECT child AS node, parent AS anc, 1::BIGINT AS dist FROM e
  UNION ALL
  SELECT c.node, e.parent, c.dist + 1 FROM clo c JOIN e ON e.child = c.anc
),
nn AS (SELECT count(*)::BIGINT AS n FROM embeddings),
direct AS (SELECT doc_id AS entity, doc_id % nn.n AS cls
           FROM documents, nn),
types AS (
  SELECT entity, cls FROM direct
  UNION ALL
  SELECT d.entity, c.anc AS cls FROM direct d JOIN clo c ON c.node = d.cls
),
stmts AS (SELECT doc_id AS entity,
                 (doc_id * 7 + 3) % {DOMAIN_N_RELS} AS rel
          FROM documents)
SELECT s.entity, s.rel, s.rel AS dom_cls
FROM stmts s
WHERE NOT EXISTS (SELECT 1 FROM types t
                  WHERE t.entity = s.entity AND t.cls = s.rel)
ORDER BY entity
"""


# ---------------------------------------------------------------------------
# HyperANF: neighborhood-function sketching (Boldi-Rosa-Vigna, WWW'11)
# ---------------------------------------------------------------------------
#
# Per-node HLL registers of ball(u, t): round t+1 merges each node's
# out-neighbors' round-t registers into its own (HLL max-merge is the
# message).  Register state is <= 2^p rows per node — the whole state
# Dataset is node- not edge-proportional — and each round is ONE
# edge-grain hash_join + one (node, register) max-groupby, the
# canonical HyperANF exchange.  Registers use the repo's standard
# sha256-prefix hash (ops/sketch.py), so the result is REGISTER-EXACT
# against a DuckDB oracle that expands the 2-hop balls and recomputes
# the same registers — the approximation error of the HLL estimate
# never enters the comparison.

HYPERANF_HOPS = 2


def _node_self_registers(batch: pa.Table) -> pa.Table:
    from nerfray.ops.sketch import _rho, sha64
    out_schema = pa.schema([("node", pa.int64()),
                            ("register", pa.int64()),
                            ("rho", pa.int64())])
    if batch.num_rows == 0:
        return out_schema.empty_table()
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    regs = np.empty(len(ids), np.int64)
    rhos = np.empty(len(ids), np.int64)
    for i, v in enumerate(ids):
        regs[i], rhos[i] = _rho(sha64(str(int(v))))
    return pa.Table.from_pydict(
        {"node": ids, "register": regs, "rho": rhos}, schema=out_schema)


def _regs_from_join(batch: pa.Table) -> pa.Table:
    return pa.Table.from_pydict({
        "node": batch.column("u"),
        "register": batch.column("register"),
        "rho": batch.column("rho"),
    }, schema=pa.schema([("node", pa.int64()), ("register", pa.int64()),
                         ("rho", pa.int64())]))


def hyperanf_registers(edges: ray.data.Dataset,
                       nodes: ray.data.Dataset, *,
                       hops: int = HYPERANF_HOPS) -> ray.data.Dataset:
    """(node, register, rho_max) for ball(node, hops) over directed
    int64 (u, v) edges; ``nodes`` is a (vec_id) Dataset."""
    from nerfray.ops.joins import hash_join
    types = {c: pa.int64() for c in ("u", "v", "node", "register",
                                     "rho")}
    regs = nodes.map_batches(_node_self_registers,
                             batch_format="pyarrow",
                             zero_copy_batch=True).materialize()
    for _ in range(hops):
        prop = hash_join(
            edges, regs, left_on="v", right_on="node",
            left_cols=["u"], right_cols=["register", "rho"],
            field_types=types,
        ).map_batches(_regs_from_join, batch_format="pyarrow")
        regs = regs.union(prop).groupby(["node", "register"]) \
            .max("rho").rename_columns({"max(rho)": "rho"}) \
            .repartition(16).materialize()
    return regs.rename_columns({"rho": "rho_max"})


def hyperanf_planted_query(sf_dir: str) -> ray.data.Dataset:
    import os

    from nerfray.sources.parquet import read_parquet_clean
    ids = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id"])
    n = ids.count()
    return hyperanf_registers(planted_triangle_edges(ids, n), ids)


def hyperanf_planted_sql() -> str:
    from nerfray.ops.sketch import _WBITS
    return f"""
WITH nn AS (SELECT count(*)::BIGINT AS n FROM embeddings),
e AS (
  SELECT vec_id AS u, (vec_id + 7) % nn.n AS v FROM embeddings, nn
  UNION ALL SELECT vec_id, (vec_id + 13) % nn.n FROM embeddings, nn
  UNION ALL SELECT vec_id, (vec_id + 20) % nn.n FROM embeddings, nn
),
b1 AS (
  SELECT vec_id AS src, vec_id AS m FROM embeddings
  UNION SELECT u, v FROM e
),
b2 AS (
  SELECT src, m FROM b1
  UNION SELECT b1.src, e.v FROM b1 JOIN e ON e.u = b1.m
),
h AS (
  SELECT src,
         ('0x' || substr(sha256(CAST(m AS VARCHAR)), 1, 16))::UBIGINT
           AS hv
  FROM b2
),
parts AS (
  SELECT src, (hv >> {_WBITS})::BIGINT AS register,
         hv & ((1::UBIGINT << {_WBITS}) - 1) AS w
  FROM h
)
SELECT src AS node, register,
       max(CASE WHEN w = 0 THEN {_WBITS + 1}
                ELSE {_WBITS} - length(bin(w)) + 1 END)::BIGINT AS rho_max
FROM parts GROUP BY src, register
ORDER BY node, register
"""


# ---------------------------------------------------------------------------
# GraphSAGE-style deterministic k-hop neighbor fan-out sampling
# ---------------------------------------------------------------------------
#
# GNN-training prep (Hamilton et al., NeurIPS'17): for every node,
# sample up to f1 of its neighbors, and for each sampled neighbor up to
# f2 of ITS neighbors — the bounded computation graph a minibatch GNN
# layer consumes, materialized as (seed, hop, parent, node) rows.
#
# Determinism (and the full SQL mirror) comes from hash-order
# sampling: node a's neighbors are ranked by sha64(a || '>' || b)
# (ties by b) and the f smallest win — a fixed pseudo-random draw that
# is partition-invariant and replayable, like ops/sampling.py's
# hash-order reservoir.
#
# Scale shape: ONE a-hash co-group builds the per-node ranked neighbor
# table (block-distinct edges in, <= fmax rows per node out); hop 2 is
# one hash_join of the hop-1 sample against that table. The fan-out
# caps mean downstream traffic is <= f1*(1+f2) rows per seed
# REGARDLESS of degree skew — hub nodes contribute f1 rows like
# everyone else. The driver holds nothing node-proportional.

_KH_RANK_SCHEMA = pa.schema([
    ("a", pa.string()), ("b", pa.string()), ("r", pa.int64())])


def _kh_rank_factory(fmax: int):
    def _kh_rank(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _KH_RANK_SCHEMA.empty_table()
        import pandas as pd

        from nerfray.ops.dedup import sha64
        df = pd.DataFrame({"a": group.column("a").to_pylist(),
                           "b": group.column("b").to_pylist()})
        df = df.drop_duplicates()
        df["h"] = [sha64(f"{a}>{b}") for a, b in zip(df["a"], df["b"])]
        df = df.sort_values(["a", "h", "b"], kind="stable")
        df["r"] = df.groupby("a", sort=False).cumcount() + 1
        df = df[df["r"] <= fmax]
        return pa.Table.from_pydict({
            "a": pa.array(list(df["a"]), pa.string()),
            "b": pa.array(list(df["b"]), pa.string()),
            "r": pa.array(df["r"].to_numpy(np.int64), pa.int64()),
        }, schema=_KH_RANK_SCHEMA)
    return _kh_rank


def khop_sample(triples: ray.data.Dataset, *, f1: int = 3,
                f2: int = 2) -> ray.data.Dataset:
    """(seed, hop, parent, node) sampled 2-hop computation graph over
    the undirected distinct-edge view of (subj, obj)."""
    import pyarrow.compute as pc

    from nerfray.ops.joins import hash_join

    ranked = triples.select_columns(["subj", "obj"]) \
        .map_batches(_nd_bucket, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("hb").map_groups(_kh_rank_factory(max(f1, f2)),
                                  batch_format="pyarrow") \
        .materialize()

    def _hop1_rows(batch: pa.Table) -> pa.Table:
        keep = pc.less_equal(batch.column("r"), f1)
        t = batch.filter(keep)
        n = t.num_rows
        return pa.Table.from_pydict({
            "seed": t.column("a"),
            "hop": pa.array(np.ones(n, np.int64), pa.int64()),
            "parent": t.column("a"),
            "node": t.column("b"),
        })

    def _hop1_side(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.less_equal(batch.column("r"), f1))
        return pa.Table.from_pydict(
            {"seed": t.column("a"), "n1": t.column("b")})

    def _s2_side(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.less_equal(batch.column("r"), f2))
        return pa.Table.from_pydict(
            {"p": t.column("a"), "n2": t.column("b")})

    hop1 = ranked.map_batches(_hop1_rows, batch_format="pyarrow",
                              zero_copy_batch=True)
    j = hash_join(
        ranked.map_batches(_hop1_side, batch_format="pyarrow",
                           zero_copy_batch=True),
        ranked.map_batches(_s2_side, batch_format="pyarrow",
                           zero_copy_batch=True),
        left_on="n1", right_on="p", left_cols=["seed"],
        right_cols=["n2"],
        field_types={"n1": pa.string(), "p": pa.string(),
                     "seed": pa.string(), "n2": pa.string()})

    def _hop2_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_pydict({
            "seed": batch.column("seed"),
            "hop": pa.array(np.full(n, 2, np.int64), pa.int64()),
            "parent": batch.column("__key"),
            "node": batch.column("n2"),
        })

    hop2 = j.map_batches(_hop2_rows, batch_format="pyarrow",
                         zero_copy_batch=True)
    return hop1.union(hop2)


def khop_sample_sql(gold_sql: str, *, f1: int = 3, f2: int = 2) -> str:
    """DuckDB mirror: identical sha64 hash-order ranking + fan-outs."""
    return f"""
WITH gold AS ({gold_sql}),
e AS (SELECT DISTINCT subj AS a, obj AS b FROM gold
      UNION SELECT obj, subj FROM gold),
r AS (SELECT a, b, row_number() OVER (
        PARTITION BY a
        ORDER BY ('0x' || substr(sha256(a || '>' || b), 1, 16))::UBIGINT,
                 b) AS r
      FROM e),
h1 AS (SELECT a AS seed, b AS node FROM r WHERE r <= {f1}),
h2 AS (SELECT h1.seed, r.a AS parent, r.b AS node
       FROM h1 JOIN r ON r.a = h1.node AND r.r <= {f2})
SELECT seed, 1::BIGINT AS hop, seed AS parent, node FROM h1
UNION ALL
SELECT seed, 2::BIGINT, parent, node FROM h2
ORDER BY seed, hop, parent, node
"""


# ---------------------------------------------------------------------------
# strongly connected components (directed) — planted mutual-closure path
# ---------------------------------------------------------------------------
#
# SCC(v) = min{u : v ~> u and u ~> v}. Two implementations share the
# exchange kernels:
#
# 1. ``scc_components`` — bounded-diameter reachability closure via
#    PATH DOUBLING (clo_{2k} = clo_k u clo_k o clo_k):
#    ceil(log2(diameter)) rounds, each ONE hash_join composition + ONE
#    pair-hash dedup co-group — cycle-safe because the dedup makes each
#    round a set.  The closure then meets its own transpose in one
#    symmetric-hash co-group.  Closure volume is O(sum_v |reach(v)|),
#    so this is the PLANTED/bounded-reach path — the same honesty
#    boundary as the recursive-CTE oracle.
# 2. ``scc_components_fwbw`` — the PRODUCTION path: trimming + the
#    multi-pivot coloring generalization of forward-backward
#    (Fleischer et al. 2000; Orzan 2004; Slota et al. 2014).  Per-node
#    state is one (node, color) row, volume O(nodes + edges) per
#    round, no closure materialization — this is what runs at
#    10^9-node file grain.
#
# Both use composite (node, partner) keys matched on BUCKET-LOCAL
# dense codes (the triangles treatment, graph.py _tri_close_bucket) —
# the full int64 id range works; the former u * 2^21 + d packing and
# its 2^21 id cap are gone.  Nothing node-proportional reaches the
# driver in either path.

_CLO_SCHEMA = pa.schema([
    ("node", pa.int64()), ("desc", pa.int64()), ("hb", pa.int32())])


def _pair_hb(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (((a.astype(np.int64) * np.int64(1000003)) ^ b.astype(np.int64))
            & 63).astype(np.int32)


def _clo_rows(n: np.ndarray, d: np.ndarray) -> pa.Table:
    """Block-local dedup of (node, desc) pairs + pair-hash bucket."""
    n = n.astype(np.int64)
    d = d.astype(np.int64)
    order = np.lexsort((d, n))
    ns, ds = n[order], d[order]
    keep = np.r_[True, (ns[1:] != ns[:-1]) | (ds[1:] != ds[:-1])]
    ns, ds = ns[keep], ds[keep]
    return pa.Table.from_pydict({
        "node": pa.array(ns, pa.int64()),
        "desc": pa.array(ds, pa.int64()),
        "hb": pa.array(_pair_hb(ns, ds), pa.int32())},
        schema=_CLO_SCHEMA)


def _clo_dedup_bucket(group: pa.Table) -> pa.Table:
    if group.num_rows == 0:
        return _CLO_SCHEMA.empty_table()
    return _clo_rows(
        group.column("node").to_numpy(zero_copy_only=False),
        group.column("desc").to_numpy(zero_copy_only=False))


def digraph_closure_pairs(edges: ray.data.Dataset, *,
                          diameter_hint: int = 16) -> ray.data.Dataset:
    """(node, desc, hb) for every u reachable from node in >= 1 directed
    steps; exact on any digraph whose reach diameter <=
    ``diameter_hint``.  ceil(log2(hint)) path-doubling rounds: one
    hash_join composition + one pair-hash dedup co-group each —
    cycle-safe because every round's output is a deduped SET."""
    from nerfray.ops.joins import hash_join

    def _seed(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _CLO_SCHEMA.empty_table()
        return _clo_rows(
            batch.column("src").to_numpy(zero_copy_only=False),
            batch.column("dst").to_numpy(zero_copy_only=False))

    def _compose(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _CLO_SCHEMA.empty_table()
        return _clo_rows(
            batch.column("node").to_numpy(zero_copy_only=False),
            batch.column("d2").to_numpy(zero_copy_only=False))

    clo = edges.map_batches(_seed, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    rounds = max(1, int(np.ceil(np.log2(max(2, diameter_hint)))))
    for _ in range(rounds):
        # clo o clo: paths of length <= 2L from two <= L halves
        hop2 = hash_join(
            clo, clo.map_batches(
                lambda b: pa.Table.from_pydict(
                    {"n2": b.column("node"), "d2": b.column("desc")},
                    schema=pa.schema([("n2", pa.int64()),
                                      ("d2", pa.int64())])),
                batch_format="pyarrow", zero_copy_batch=True),
            left_on="desc", right_on="n2", left_cols=["node"],
            right_cols=["d2"], field_types={
                "desc": pa.int64(), "n2": pa.int64(),
                "node": pa.int64(), "d2": pa.int64()},
        ).map_batches(_compose, batch_format="pyarrow")
        # global dedup: 64-way pair-hash co-group, bucket-local
        # composite dedup; the repartition clamp bounds block count —
        # without it the union+shuffle block count multiplies per
        # round and sort cost grows ~4x/round (measured: 0.4 -> 53 s
        # by round 4 on a 2k-row closure)
        clo = clo.union(hop2).groupby("hb") \
            .map_groups(_clo_dedup_bucket, batch_format="pyarrow") \
            .repartition(8) \
            .materialize()
    return clo


def _mutual_bucket(group: pa.Table) -> pa.Table:
    """One symmetric-hash bucket: closure pairs (a, b) and (b, a) land
    together; emit (node=a, scc=b) for every pair whose transpose is
    also present.  Matching on bucket-local dense codes — full int64
    id range (the triangles treatment)."""
    out_schema = pa.schema([("node", pa.int64()), ("scc", pa.int64())])
    if group.num_rows == 0:
        return out_schema.empty_table()
    a = group.column("node").to_numpy(zero_copy_only=False)
    b = group.column("desc").to_numpy(zero_copy_only=False)
    vals = np.unique(np.concatenate([a, b]))
    if len(vals) >= 1 << 31:
        raise ValueError("scc mutual bucket exceeds 2^31 distinct ids")
    ca = np.searchsorted(vals, a).astype(np.int64)
    cb = np.searchsorted(vals, b).astype(np.int64)
    key = np.sort(ca * len(vals) + cb)
    rkey = cb * len(vals) + ca
    pos = np.searchsorted(key, rkey)
    pos[pos >= len(key)] = 0
    hit = key[pos] == rkey
    return pa.Table.from_pydict({
        "node": pa.array(a[hit], pa.int64()),
        "scc": pa.array(b[hit], pa.int64())}, schema=out_schema)


def scc_components(edges: ray.data.Dataset, *,
                   diameter_hint: int = 16) -> ray.data.Dataset:
    """(node, scc) with scc = min mutual-reach partner (including the
    node itself). Nodes are every endpoint of ``edges`` (src, dst)."""
    clo = digraph_closure_pairs(edges, diameter_hint=diameter_hint)

    def _sym_hb(batch: pa.Table) -> pa.Table:
        n = batch.column("node").to_numpy(zero_copy_only=False)
        d = batch.column("desc").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "node": pa.array(n, pa.int64()),
            "desc": pa.array(d, pa.int64()),
            "hb": pa.array(_pair_hb(np.minimum(n, d), np.maximum(n, d)),
                           pa.int32())}, schema=_CLO_SCHEMA)

    mutual = clo.map_batches(_sym_hb, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("hb").map_groups(_mutual_bucket, batch_format="pyarrow")

    ns_schema = pa.schema([("node", pa.int64()), ("scc", pa.int64())])

    def _nodes(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        u = np.unique(np.concatenate([s, d])).astype(np.int64)
        return pa.Table.from_pydict({
            "node": pa.array(u, pa.int64()),
            "scc": pa.array(u, pa.int64())}, schema=ns_schema)

    reflexive = edges.map_batches(_nodes, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return reflexive.union(mutual).groupby("node").min("scc") \
        .rename_columns({"min(scc)": "scc"})


# --- production SCC: trimming + multi-pivot forward-backward ---------------

_NODE_I64 = pa.schema([("node", pa.int64())])
_NC_SCHEMA = pa.schema([("node", pa.int64()), ("color", pa.int64())])
_NR_SCHEMA = pa.schema([("node", pa.int64()), ("root", pa.int64())])
_NS_SCHEMA = pa.schema([("node", pa.int64()), ("scc", pa.int64())])

_SCC_FT = {c: pa.int64() for c in (
    "node", "src", "dst", "color", "c_old", "c2", "root", "r2", "sid",
    "scc")}


def _key_named(batch: pa.Table, *, name: str) -> pa.Table:
    return pa.Table.from_pydict(
        {name: batch.column("__key")},
        schema=pa.schema([(name, pa.int64())]))


def _renamed(batch: pa.Table, *, cols: dict) -> pa.Table:
    return pa.Table.from_pydict(
        {dst: batch.column(src) for src, dst in cols.items()},
        schema=pa.schema([(d, pa.int64()) for d in cols.values()]))


def _self_colored(batch: pa.Table) -> pa.Table:
    n = batch.column("node")
    return pa.Table.from_pydict({"node": n, "color": n},
                                schema=_NC_SCHEMA)


def _roots_only(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    n = batch.column("node")
    keep = pc.equal(n, batch.column("color"))
    return pa.Table.from_pydict(
        {"node": n.filter(keep), "root": n.filter(keep)},
        schema=_NR_SCHEMA)


def _singletons(batch: pa.Table) -> pa.Table:
    n = batch.column("node")
    return pa.Table.from_pydict({"node": n, "scc": n},
                                schema=_NS_SCHEMA)


def scc_components_fwbw(edges: ray.data.Dataset, *,
                        trim_rounds: int = 8,
                        max_outer: int = 10_000) -> ray.data.Dataset:
    """(node, scc) for ANY digraph — the production-scale SCC path.

    Trimming + the multi-pivot coloring generalization of
    forward-backward (Fleischer et al. 2000 FW-BW; Orzan 2004 coloring;
    Slota et al. 2014 Trim+FB).  Per outer round:

    1. TRIM: nodes with no in- or no out-edge in the remaining graph
       are singleton SCCs — peel up to ``trim_rounds`` layers (an
       optimization only; correctness never depends on finishing).
    2. COLOR (the multi-source FW sweep): color(v) = max node id that
       reaches v, by monotone max-propagation along edges to a
       fixpoint.  Every color class is closed under the SCC relation.
    3. BW: roots r (color(r) = r) sweep BACKWARD restricted to their
       own color class; the reached set IS SCC(r) (any v->r path stays
       inside color class r).  All roots peel simultaneously.
    4. Emit each SCC keyed by its min node id, remove those nodes,
       repeat until the graph is empty.

    Every step is hash_join exchanges + node-grain groupbys — state is
    one (node, color) row per node, never a reachability closure, and
    ids span the full int64 range (no packing).  The driver sees only
    per-round counts.  Matches ``scc_components`` exactly where both
    apply; use THIS one when reach sets are unbounded (file-grain
    corpora), the path-doubling one when the closure is known small.
    """
    from nerfray.ops.joins import hash_join

    def _semi(left, right, lo, ro):
        return hash_join(left, right, left_on=lo, right_on=ro,
                         left_cols=[], right_cols=[], how="left semi",
                         field_types=_SCC_FT) \
            .map_batches(_key_named, fn_kwargs={"name": lo},
                         batch_format="pyarrow", zero_copy_batch=True)

    def _semi_edges(e, side, keep):
        other = "dst" if side == "src" else "src"
        return hash_join(e, keep, left_on=side, right_on="node",
                         left_cols=[other], right_cols=[],
                         how="left semi", field_types=_SCC_FT) \
            .map_batches(_renamed,
                         fn_kwargs={"cols": {"__key": side,
                                             other: other}},
                         batch_format="pyarrow", zero_copy_batch=True)

    def _anti_edges(e, side, gone):
        other = "dst" if side == "src" else "src"
        return hash_join(e, gone, left_on=side, right_on="node",
                         left_cols=[other], right_cols=[],
                         how="left anti", field_types=_SCC_FT) \
            .map_batches(_renamed,
                         fn_kwargs={"cols": {"__key": side,
                                             other: other}},
                         batch_format="pyarrow", zero_copy_batch=True)

    def _distinct_nodes(e):
        def _ends(batch: pa.Table) -> pa.Table:
            u = np.unique(np.concatenate([
                batch.column("src").to_numpy(zero_copy_only=False),
                batch.column("dst").to_numpy(zero_copy_only=False),
            ])).astype(np.int64)
            return pa.Table.from_pydict({"node": pa.array(u, pa.int64())},
                                        schema=_NODE_I64)
        return e.map_batches(_ends, batch_format="pyarrow",
                             zero_copy_batch=True) \
            .groupby("node").count().drop_columns(["count()"])

    edges = edges.select_columns(["src", "dst"]).materialize()
    nodes = _distinct_nodes(edges).materialize()
    results: list[ray.data.Dataset] = []

    for outer in range(max_outer):
        if nodes.count() == 0:
            break
        if edges.count() == 0:
            results.append(nodes.map_batches(
                _singletons, batch_format="pyarrow",
                zero_copy_batch=True).materialize())
            break

        # 1. trim: peel nodes lacking in- or out-edges
        for _ in range(trim_rounds):
            keep = _semi(_semi(nodes, edges, "node", "src"),
                         edges, "node", "dst") \
                .repartition(8).materialize()
            n_keep = keep.count()
            n_nodes = nodes.count()
            if n_keep == n_nodes:
                break
            trimmed = hash_join(nodes, keep, left_on="node",
                                right_on="node", left_cols=[],
                                right_cols=[], how="left anti",
                                field_types=_SCC_FT) \
                .map_batches(_key_named, fn_kwargs={"name": "node"},
                             batch_format="pyarrow",
                             zero_copy_batch=True)
            results.append(trimmed.map_batches(
                _singletons, batch_format="pyarrow",
                zero_copy_batch=True).materialize())
            nodes = keep
            edges = _semi_edges(_semi_edges(edges, "src", keep),
                                "dst", keep).repartition(8).materialize()
            if edges.count() == 0:
                break
        if nodes.count() == 0:
            continue
        if edges.count() == 0:
            continue

        # 2. coloring: monotone max-propagation to a fixpoint
        colors = nodes.map_batches(_self_colored, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()
        while True:
            cand = hash_join(
                edges, colors, left_on="src", right_on="node",
                left_cols=["dst"], right_cols=["color"],
                field_types=_SCC_FT) \
                .map_batches(_renamed,
                             fn_kwargs={"cols": {"dst": "node",
                                                 "color": "color"}},
                             batch_format="pyarrow", zero_copy_batch=True)
            newc = colors.union(cand).groupby("node").max("color") \
                .rename_columns({"max(color)": "color"}) \
                .repartition(8).materialize()
            old = colors.map_batches(
                _renamed, fn_kwargs={"cols": {"node": "node",
                                              "color": "c_old"}},
                batch_format="pyarrow", zero_copy_batch=True)
            n_changed = hash_join(
                newc, old, left_on="node", right_on="node",
                left_cols=["color"], right_cols=["c_old"],
                field_types=_SCC_FT) \
                .filter(expr="color != c_old").count()
            colors = newc
            if n_changed == 0:
                break

        # 3. backward sweep from each root inside its color class
        reached = colors.map_batches(_roots_only, batch_format="pyarrow",
                                     zero_copy_batch=True).materialize()
        n_reached = reached.count()
        c2 = colors.map_batches(
            _renamed, fn_kwargs={"cols": {"node": "node", "color": "c2"}},
            batch_format="pyarrow", zero_copy_batch=True).materialize()
        while True:
            cand = hash_join(
                edges, reached, left_on="dst", right_on="node",
                left_cols=["src"], right_cols=["root"],
                field_types=_SCC_FT)
            cand = hash_join(
                cand, c2, left_on="src", right_on="node",
                left_cols=["root"], right_cols=["c2"],
                field_types=_SCC_FT) \
                .filter(expr="root == c2") \
                .map_batches(_renamed,
                             fn_kwargs={"cols": {"__key": "node",
                                                 "root": "root"}},
                             batch_format="pyarrow", zero_copy_batch=True)
            # (node -> root) is functional: each node has ONE color,
            # so min() is pure dedup
            grown = reached.union(cand).groupby("node").min("root") \
                .rename_columns({"min(root)": "root"}) \
                .repartition(8).materialize()
            n_grown = grown.count()
            reached = grown
            if n_grown == n_reached:
                break
            n_reached = n_grown

        # 4. emit SCCs keyed by min member id; remove from the graph
        sid = reached.groupby("root").min("node") \
            .rename_columns({"min(node)": "sid", "root": "r2"})
        out = hash_join(reached, sid, left_on="root", right_on="r2",
                        left_cols=["node"], right_cols=["sid"],
                        field_types=_SCC_FT) \
            .map_batches(_renamed,
                         fn_kwargs={"cols": {"node": "node",
                                             "sid": "scc"}},
                         batch_format="pyarrow", zero_copy_batch=True)
        results.append(out.materialize())
        done = reached.map_batches(
            _renamed, fn_kwargs={"cols": {"node": "node"}},
            batch_format="pyarrow", zero_copy_batch=True).materialize()
        nodes = hash_join(nodes, done, left_on="node", right_on="node",
                          left_cols=[], right_cols=[], how="left anti",
                          field_types=_SCC_FT) \
            .map_batches(_key_named, fn_kwargs={"name": "node"},
                         batch_format="pyarrow",
                         zero_copy_batch=True) \
            .repartition(8).materialize()
        edges = _anti_edges(_anti_edges(edges, "src", done),
                            "dst", done).repartition(8).materialize()
    else:
        raise RuntimeError(f"scc_components_fwbw: no fixpoint after "
                           f"{max_outer} outer rounds")

    if not results:
        return ray.data.from_arrow(_NS_SCHEMA.empty_table())
    acc = results[0]
    for r in results[1:]:
        acc = acc.union(r)
    return acc


# planted digraph over embeddings vec_ids: group g = 8 consecutive ids;
# EVEN groups are directed 8-rings (one SCC each), ODD groups directed
# 8-chains (all trivial SCCs), plus a bridge ring->chain every 4th group
# so weak connectivity does NOT imply strong (SCC != CC by plan).
SCC_GROUP = 8


def planted_scc_edges(ids: ray.data.Dataset) -> ray.data.Dataset:
    def _edges(batch: pa.Table) -> pa.Table:
        v = batch.column("vec_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        g = v // SCC_GROUP
        pos = v % SCC_GROUP
        even = (g % 2) == 0
        # ring: v -> v+1 within group, last wraps to group start
        dst = np.where(pos == SCC_GROUP - 1, g * SCC_GROUP, v + 1)
        # chain: last position emits no edge
        keep = even | (pos != SCC_GROUP - 1)
        src1, dst1 = v[keep], dst[keep]
        # bridge every 4th group: ring head -> next group's head
        bsel = ((g % 4) == 0) & (pos == 0)
        src2 = v[bsel]
        dst2 = (g[bsel] + 1) * SCC_GROUP
        return pa.Table.from_pydict({
            "src": pa.array(np.concatenate([src1, src2]), pa.int64()),
            "dst": pa.array(np.concatenate([dst1, dst2]), pa.int64())})

    return ids.map_batches(_edges, batch_format="pyarrow",
                           zero_copy_batch=True)


_SCC_MEMO: dict[str, ray.data.Dataset] = {}


def scc_planted_query(sf_dir: str) -> ray.data.Dataset:
    import os

    from nerfray.sources.parquet import read_parquet_clean
    got = _SCC_MEMO.get(sf_dir)
    if got is not None:
        return got
    ids = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id"])
    out = scc_components(planted_scc_edges(ids)).materialize()
    _SCC_MEMO[sf_dir] = out
    return out


SCC_EDGES_SQL = f"""
  SELECT vec_id AS src,
         CASE WHEN vec_id % {SCC_GROUP} = {SCC_GROUP - 1}
              THEN (vec_id // {SCC_GROUP}) * {SCC_GROUP}
              ELSE vec_id + 1 END AS dst
  FROM embeddings
  WHERE (vec_id // {SCC_GROUP}) % 2 = 0
     OR vec_id % {SCC_GROUP} <> {SCC_GROUP - 1}
  UNION ALL
  SELECT vec_id, ((vec_id // {SCC_GROUP}) + 1) * {SCC_GROUP}
  FROM embeddings
  WHERE (vec_id // {SCC_GROUP}) % 4 = 0 AND vec_id % {SCC_GROUP} = 0
"""

SCC_PLANTED_SQL = f"""
WITH RECURSIVE e AS ({SCC_EDGES_SQL}),
clo(node, "desc") AS (
  SELECT src, dst FROM e
  UNION
  SELECT c.node, e.dst FROM clo c JOIN e ON e.src = c."desc"
),
n AS (SELECT DISTINCT src AS node FROM e
      UNION SELECT dst FROM e),
mutual AS (
  SELECT c.node, c."desc" AS scc FROM clo c
  JOIN clo r ON r.node = c."desc" AND r."desc" = c.node
  UNION ALL SELECT node, node FROM n)
SELECT node, min(scc)::BIGINT AS scc FROM mutual
GROUP BY node ORDER BY node
"""


# ---------------------------------------------------------------------------
# Boruvka minimum spanning tree (distributed MST)
# ---------------------------------------------------------------------------
#
# The classic distributed MST: each round every component picks its
# minimum-weight outgoing edge (unique weights -> unique MST), the
# chosen edges merge components (contraction via the existing
# star-round connected components over the COMPONENT-grain chosen
# graph), and merged labels propagate back to the surviving cross
# edges through two hash joins.  Components at least halve per round,
# so rounds are O(log n); per round only cross-component edges stay in
# flight and the chosen/contraction tables are component-grain.
#
# Planted fixture: over nodes 0..n-1 (n % 5 == 0), chain edges
# (i, i+1) are HEAVY when i % 5 == 0 (else light, weights strictly
# increasing), and skip edges (i, i+2) are LIGHT exactly when
# i % 5 == 0 (else heavy).  Every heavy edge is the maximum of the
# triangle cycle {chain(i), chain(i+1), skip(i)} it closes, so by the
# cycle property the unique MST is exactly all light edges — pure id
# arithmetic, mirrored verbatim in MST_PLANTED_SQL.

MST_MAX_ROUNDS = 16
# adaptive contraction bound: below this many chosen edges the round
# contracts driver-side (union-find + broadcast relabel), above it the
# distributed star-CC + relabel-join path runs (see boruvka_mst)
MST_BCAST_ROWS = 100_000


def planted_mst_edges(ids: ray.data.Dataset, n: int) -> ray.data.Dataset:
    """Chain+skip fixture graph with globally unique integer weights."""

    def _mk(batch: pa.Table) -> pa.Table:
        i = batch.column("vec_id").to_numpy(zero_copy_only=False)
        # light weights are a bijective multiplicative mix of i (odd
        # multiplier mod 2^21), NOT monotone in i: along the path each
        # node's min edge points at a local random minimum, so the
        # round-1 chosen graph has O(1)-expected component diameter and
        # the star-CC contraction converges in a couple of rounds
        # (monotone weights make it one long pointer chain = log n
        # star rounds). The MST set only depends on the RANGES
        # (light < heavy), so the oracle arithmetic is unchanged.
        mix = lambda x: (x * 40503) % (1 << 21)  # noqa: E731
        cm = i <= n - 2
        ci = i[cm]
        cw = np.where(ci % 5 == 0, 1_000_000_000 + 10 * ci,
                      10_000 + 10 * mix(ci))
        sm = i <= n - 3
        si = i[sm]
        sw = np.where(si % 5 == 0, 100_000_000 + 10 * mix(si),
                      2_000_000_000 + 10 * si)
        return pa.Table.from_pydict({
            "u": pa.array(np.concatenate([ci, si]), pa.int64()),
            "v": pa.array(np.concatenate([ci + 1, si + 2]), pa.int64()),
            "w": pa.array(np.concatenate([cw, sw]).astype(np.int64),
                          pa.int64()),
        })

    return ids.map_batches(_mk, batch_format="pyarrow",
                           zero_copy_batch=True)


_MST_CAND_SCHEMA = pa.schema([
    ("comp", pa.int64()), ("u", pa.int64()), ("v", pa.int64()),
    ("w", pa.int64()), ("cu", pa.int64()), ("cv", pa.int64()),
    ("hb", pa.int32())])


def _mst_cand_rows(batch: pa.Table) -> pa.Table:
    """Each cross edge, emitted once per endpoint component."""
    u = batch.column("u").to_numpy(zero_copy_only=False)
    v = batch.column("v").to_numpy(zero_copy_only=False)
    w = batch.column("w").to_numpy(zero_copy_only=False)
    cu = batch.column("cu").to_numpy(zero_copy_only=False)
    cv = batch.column("cv").to_numpy(zero_copy_only=False)
    comp = np.concatenate([cu, cv])
    two = lambda x: np.concatenate([x, x])  # noqa: E731
    return pa.Table.from_pydict({
        "comp": pa.array(comp, pa.int64()),
        "u": pa.array(two(u), pa.int64()),
        "v": pa.array(two(v), pa.int64()),
        "w": pa.array(two(w), pa.int64()),
        "cu": pa.array(two(cu), pa.int64()),
        "cv": pa.array(two(cv), pa.int64()),
        "hb": pa.array((comp & 63).astype(np.int32), pa.int32()),
    }, schema=_MST_CAND_SCHEMA)


def _mst_min_bucket(group: pa.Table) -> pa.Table:
    """Per component: the minimum-(w, u, v) incident cross edge."""
    out_schema = pa.schema([
        ("u", pa.int64()), ("v", pa.int64()), ("w", pa.int64()),
        ("cu", pa.int64()), ("cv", pa.int64())])
    if group.num_rows == 0:
        return out_schema.empty_table()
    comp = group.column("comp").to_numpy(zero_copy_only=False)
    u = group.column("u").to_numpy(zero_copy_only=False)
    v = group.column("v").to_numpy(zero_copy_only=False)
    w = group.column("w").to_numpy(zero_copy_only=False)
    order = np.lexsort((v, u, w, comp))
    cs = comp[order]
    first = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
    pick = order[first]
    return pa.Table.from_pydict({
        "u": pa.array(u[pick], pa.int64()),
        "v": pa.array(v[pick], pa.int64()),
        "w": pa.array(w[pick], pa.int64()),
        "cu": pa.array(group.column("cu").to_numpy(
            zero_copy_only=False)[pick], pa.int64()),
        "cv": pa.array(group.column("cv").to_numpy(
            zero_copy_only=False)[pick], pa.int64()),
    }, schema=out_schema)


def _mst_dedup_bucket(group: pa.Table) -> pa.Table:
    """Distinct chosen edges (both endpoints may pick the same edge) —
    first-occurrence mask over (u, v) sorted runs, no key packing."""
    if group.num_rows == 0:
        return group
    u = group.column("u").to_numpy(zero_copy_only=False)
    v = group.column("v").to_numpy(zero_copy_only=False)
    order = np.lexsort((v, u))
    us, vs = u[order], v[order]
    keep = np.r_[True, (us[1:] != us[:-1]) | (vs[1:] != vs[:-1])]
    return group.take(pa.array(order[keep]))


def _pad12(col: pa.ChunkedArray) -> pa.Array:
    import pyarrow.compute as pc
    return pc.utf8_lpad(pc.cast(col, pa.string()), 12, "0")


def boruvka_mst(edges: ray.data.Dataset,
                max_rounds: int = MST_MAX_ROUNDS) -> ray.data.Dataset:
    """MST of an undirected weighted graph as (u, v, w) rows. Weights
    must be globally unique (ties would make the MST ambiguous; the
    per-component pick tie-breaks on (w, u, v) deterministically
    regardless). Each edge appears once, (u, v) as given."""
    from nerfray.ops.joins import hash_join

    def _init(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "u": batch.column("u"), "v": batch.column("v"),
            "w": batch.column("w"),
            "cu": batch.column("u"), "cv": batch.column("v")})

    work = edges.map_batches(_init, batch_format="pyarrow").materialize()
    parts: list[ray.data.Dataset] = []
    ftypes = {c: pa.int64() for c in
              ("u", "v", "w", "cu", "cv", "comp", "newcomp")}
    for _ in range(max_rounds):
        cross = work.filter(expr="cu != cv").materialize()
        if cross.count() == 0:
            break
        chosen = cross.map_batches(_mst_cand_rows, batch_format="pyarrow") \
            .groupby("hb").map_groups(_mst_min_bucket,
                                      batch_format="pyarrow")

        def _ub(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            hb = pc.cast(pc.bit_wise_and(batch.column("u"), 63),
                         pa.int32())
            return batch.append_column("hb", hb)

        # coalesce: the co-group emits ~64 near-empty blocks per round;
        # without the clamp the chained joins multiply block counts and
        # later (tiny) rounds drown in empty-task overhead (SCALE.md
        # r4 lesson on iterative union+shuffle loops)
        chosen = chosen.map_batches(_ub, batch_format="pyarrow") \
            .groupby("hb").map_groups(_mst_dedup_bucket,
                                      batch_format="pyarrow") \
            .drop_columns(["hb"]).repartition(8).materialize()
        parts.append(chosen.drop_columns(["cu", "cv"]))

        # contraction — adaptive (the adaptive_join pattern): the
        # chosen graph is COMPONENT-grain and shrinks geometrically, so
        # below an explicit row bound the round contracts driver-side
        # (union-find over <= MST_BCAST_ROWS chosen edges) and relabels
        # via one broadcast map — 1 exchange instead of ~7.  Above the
        # bound (early rounds of a 10^9-node corpus) the fully
        # distributed path runs: star-CC + two relabel hash_joins,
        # nothing node-proportional on the driver.
        n_chosen = chosen.count()
        if n_chosen <= MST_BCAST_ROWS:
            import ray as _ray
            blocks = [t for t in _ray.get(
                chosen.select_columns(["cu", "cv"]).to_arrow_refs())
                if t.num_rows > 0]
            ct = pa.concat_tables(blocks)
            cu_a = ct.column("cu").to_numpy(zero_copy_only=False)
            cv_a = ct.column("cv").to_numpy(zero_copy_only=False)
            vals = np.unique(np.concatenate([cu_a, cv_a]))
            parent = np.arange(len(vals), dtype=np.int64)

            def _find(x: int) -> int:
                root = x
                while parent[root] != root:
                    root = parent[root]
                while parent[x] != root:
                    parent[x], x = root, parent[x]
                return root

            for a, b in zip(np.searchsorted(vals, cu_a),
                            np.searchsorted(vals, cv_a)):
                ra, rb = _find(int(a)), _find(int(b))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            roots = np.array([_find(int(i)) for i in range(len(vals))],
                             np.int64)
            # component label = min ORIGINAL id in the component
            # (np.minimum.at over root buckets), matching the CC path
            lbl = np.full(len(vals), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(lbl, roots, vals)
            relabel_ref = _ray.put((vals, lbl[roots]))

            def _relabel_both(batch: pa.Table) -> pa.Table:
                import ray as _r
                keys, new = _r.get(relabel_ref)
                out = {}
                for col, ccol in (("cu", "cu"), ("cv", "cv")):
                    old = batch.column(ccol).to_numpy(
                        zero_copy_only=False)
                    pos = np.searchsorted(keys, old)
                    pos[pos >= len(keys)] = 0
                    hit = keys[pos] == old
                    out[ccol] = pa.array(
                        np.where(hit, new[pos], old), pa.int64())
                return pa.Table.from_pydict({
                    "u": batch.column("u"), "v": batch.column("v"),
                    "w": batch.column("w"),
                    "cu": out["cu"], "cv": out["cv"]})

            work = cross.map_batches(_relabel_both,
                                     batch_format="pyarrow",
                                     zero_copy_batch=True) \
                .repartition(8).materialize()
            continue

        # distributed contraction: CC over the component-grain chosen
        # graph
        def _comp_pairs(batch: pa.Table) -> pa.Table:
            return pa.Table.from_pydict({
                "subj": _pad12(batch.column("cu")),
                "obj": _pad12(batch.column("cv"))})

        cc = connected_components(
            chosen.map_batches(_comp_pairs, batch_format="pyarrow"),
            clamp=False)

        def _unpad(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.Table.from_pydict({
                "comp": pc.cast(batch.column("node"), pa.int64()),
                "newcomp": pc.cast(batch.column("component"), pa.int64())})

        comp_map = cc.map_batches(_unpad, batch_format="pyarrow") \
            .repartition(8).materialize()

        relab = hash_join(
            cross, comp_map, left_on="cu", right_on="comp",
            left_cols=["u", "v", "w", "cv"], right_cols=["newcomp"],
            how="left outer", field_types=ftypes)

        def _apply_cu(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.Table.from_pydict({
                "u": batch.column("u"), "v": batch.column("v"),
                "w": batch.column("w"), "cv": batch.column("cv"),
                "cu": pc.coalesce(batch.column("newcomp"),
                                  batch.column("__key"))})

        relab = relab.map_batches(_apply_cu, batch_format="pyarrow")
        relab = hash_join(
            relab, comp_map, left_on="cv", right_on="comp",
            left_cols=["u", "v", "w", "cu"], right_cols=["newcomp"],
            how="left outer", field_types=ftypes)

        def _apply_cv(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.Table.from_pydict({
                "u": batch.column("u"), "v": batch.column("v"),
                "w": batch.column("w"), "cu": batch.column("cu"),
                "cv": pc.coalesce(batch.column("newcomp"),
                                  batch.column("__key"))})

        work = relab.map_batches(_apply_cv, batch_format="pyarrow") \
            .repartition(8).materialize()
    else:
        raise RuntimeError(
            f"boruvka_mst did not converge in {max_rounds} rounds")
    if not parts:
        return ray.data.from_arrow(
            pa.schema([("u", pa.int64()), ("v", pa.int64()),
                       ("w", pa.int64())]).empty_table())
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def mst_planted_query(sf_dir: str) -> ray.data.Dataset:
    import os

    from nerfray.sources.parquet import read_parquet_clean
    ids = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id"])
    n = ids.count()
    if n % 5:
        raise ValueError(f"planted MST fixture needs n % 5 == 0, got {n}")
    return boruvka_mst(planted_mst_edges(ids, n))


MST_PLANTED_SQL = """
WITH nn AS (SELECT count(*)::BIGINT AS n FROM embeddings),
chain AS (
  SELECT vec_id AS u, vec_id + 1 AS v,
         (CASE WHEN vec_id % 5 = 0 THEN 1000000000 + 10 * vec_id
               ELSE 10000 + 10 * ((vec_id * 40503) % 2097152)
          END)::BIGINT AS w
  FROM embeddings, nn WHERE vec_id <= nn.n - 2),
skip AS (
  SELECT vec_id AS u, vec_id + 2 AS v,
         (CASE WHEN vec_id % 5 = 0
               THEN 100000000 + 10 * ((vec_id * 40503) % 2097152)
               ELSE 2000000000 + 10 * vec_id END)::BIGINT AS w
  FROM embeddings, nn WHERE vec_id <= nn.n - 3)
SELECT u, v, w FROM chain WHERE u % 5 <> 0
UNION ALL
SELECT u, v, w FROM skip WHERE u % 5 = 0
"""


# -- taxonomy rollup: entity counts per class INCLUDING subclasses -----------
#
# The reasoner-side aggregate a materialized type table exists for:
# for every class, how many entities are directly typed there and how
# many land there transitively (dist >= 1 rows of the inference
# table).  Per-block (cls, n_direct, n_total) partials via one
# np.unique, then a class-keyed sum — the exchange is class-count
# sized, never entity-proportional.

_TYPE_ROLLUP_SCHEMA = pa.schema([
    ("cls", pa.int64()), ("n_direct", pa.int64()),
    ("n_total", pa.int64())])


def _type_rollup_partial(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return _TYPE_ROLLUP_SCHEMA.empty_table()
    cls = batch.column("cls").to_numpy(zero_copy_only=False)
    dist = batch.column("dist").to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(cls, return_inverse=True)
    n_total = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
    n_direct = np.bincount(inv, weights=(dist == 0).astype(np.float64),
                           minlength=len(uniq)).astype(np.int64)
    return pa.Table.from_pydict({
        "cls": pa.array(uniq, pa.int64()),
        "n_direct": pa.array(n_direct, pa.int64()),
        "n_total": pa.array(n_total, pa.int64()),
    }, schema=_TYPE_ROLLUP_SCHEMA)


def type_rollup_planted_query(sf_dir: str) -> ray.data.Dataset:
    from ray.data.aggregate import Sum
    types = type_inference_planted_query(sf_dir)
    return types.map_batches(_type_rollup_partial,
                             batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("cls") \
        .aggregate(Sum("n_direct", alias_name="n_direct"),
                   Sum("n_total", alias_name="n_total"))


TYPE_ROLLUP_PLANTED_SQL = f"""
WITH RECURSIVE e AS ({TAXO_EDGES_SQL}),
clo AS (
  SELECT child AS node, parent AS anc, 1::BIGINT AS dist FROM e
  UNION ALL
  SELECT c.node, e.parent, c.dist + 1 FROM clo c JOIN e ON e.child = c.anc
),
nn AS (SELECT count(*)::BIGINT AS n FROM embeddings),
direct AS (SELECT doc_id AS entity, doc_id % nn.n AS cls
           FROM documents, nn),
types AS (
  SELECT entity, cls, 0::BIGINT AS dist FROM direct
  UNION ALL
  SELECT d.entity, c.anc, c.dist FROM direct d JOIN clo c ON c.node = d.cls)
SELECT cls, sum(CASE WHEN dist = 0 THEN 1 ELSE 0 END)::BIGINT AS n_direct,
       count(*)::BIGINT AS n_total
FROM types GROUP BY cls ORDER BY cls
"""


# ---------------------------------------------------------------------------
# SSSP with parent reconstruction (shortest-path TREE, not just distances)
# ---------------------------------------------------------------------------
#
# The relax kernel above answers "how far"; path queries need "through
# whom".  Same fused one-co-group-per-round shape with a parent column
# carried on every candidate: a relaxation into v records its source u,
# the per-node resolution takes the lexicographic min of (dist, parent)
# — so the tree is deterministic (min-id optimal predecessor) and the
# SQL mirror is exact: parent(v) = min u with d(u) + w(u,v) = d(v).
# Seeds carry parent -1.  Any candidate achieving the final min comes
# from a SETTLED optimal predecessor (d_at_relax(u) >= d_final(u) and
# d(v) <= d_final(u) + w force equality), which is what makes the
# deterministic tie-break well-defined under bounded rounds.

_RELAXP_SCHEMA = pa.schema([
    ("k", pa.int64()),    # candidate: target node | edge: source u
    ("d", pa.int64()),    # candidate: distance
    ("p", pa.int64()),    # candidate: parent (-1 = seed)
    ("v", pa.int64()),    # edge: destination
    ("w", pa.int64()),    # edge: weight
    ("side", pa.int8()),  # 0 = candidate, 1 = edge
    ("hb", pa.int32()),
])


def _relaxp_edge_rows(batch: pa.Table) -> pa.Table:
    u = batch.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
    v = batch.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
    w = batch.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
    z = np.zeros(len(u), np.int64)
    return pa.Table.from_pydict({
        "k": u, "d": z, "p": z, "v": v, "w": w,
        "side": np.ones(len(u), np.int8),
        "hb": (u % _RELAX_BUCKETS).astype(np.int32),
    }, schema=_RELAXP_SCHEMA)


def _relaxp_seed_rows(batch: pa.Table) -> pa.Table:
    n = batch.column("node").to_numpy(
        zero_copy_only=False).astype(np.int64)
    z = np.zeros(len(n), np.int64)
    return pa.Table.from_pydict({
        "k": n, "d": z, "p": np.full(len(n), -1, np.int64), "v": z,
        "w": z, "side": np.zeros(len(n), np.int8),
        "hb": (n % _RELAX_BUCKETS).astype(np.int32),
    }, schema=_RELAXP_SCHEMA)


def _relaxp_min(k: np.ndarray, d: np.ndarray, p: np.ndarray):
    """Per-node lexicographic min of (dist, parent)."""
    order = np.lexsort((p, d, k))
    k_s, d_s, p_s = k[order], d[order], p[order]
    starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]])
    return k_s[starts], d_s[starts], p_s[starts]


def _relaxp_round_bucket(group: pa.Table) -> pa.Table:
    if group.num_rows == 0:
        return _RELAXP_SCHEMA.empty_table()
    side = group.column("side").to_numpy(zero_copy_only=False)
    k = group.column("k").to_numpy(zero_copy_only=False)
    is_c = side == 0
    if not is_c.any():
        return _RELAXP_SCHEMA.empty_table()
    nodes, dists, pars = _relaxp_min(
        k[is_c],
        group.column("d").to_numpy(zero_copy_only=False)[is_c],
        group.column("p").to_numpy(zero_copy_only=False)[is_c])
    is_e = ~is_c
    eu = k[is_e]
    idx = np.searchsorted(nodes, eu)
    idx[idx >= len(nodes)] = 0
    hit = nodes[idx] == eu
    ev = group.column("v").to_numpy(zero_copy_only=False)[is_e][hit]
    ed = dists[idx[hit]] \
        + group.column("w").to_numpy(zero_copy_only=False)[is_e][hit]
    ep = eu[hit]  # the relaxing node IS the candidate's parent
    out_k = np.concatenate([nodes, ev])
    out_d = np.concatenate([dists, ed])
    out_p = np.concatenate([pars, ep])
    z = np.zeros(len(out_k), np.int64)
    return pa.Table.from_pydict({
        "k": out_k, "d": out_d, "p": out_p, "v": z, "w": z,
        "side": np.zeros(len(out_k), np.int8),
        "hb": (out_k % _RELAX_BUCKETS).astype(np.int32),
    }, schema=_RELAXP_SCHEMA)


_SSSP_PATH_SCHEMA = pa.schema([("node", pa.int64()),
                               ("dist", pa.int64()),
                               ("parent", pa.int64())])


def _relaxp_final_bucket(group: pa.Table) -> pa.Table:
    if group.num_rows == 0:
        return _SSSP_PATH_SCHEMA.empty_table()
    side = group.column("side").to_numpy(zero_copy_only=False)
    is_c = side == 0
    nodes, dists, pars = _relaxp_min(
        group.column("k").to_numpy(zero_copy_only=False)[is_c],
        group.column("d").to_numpy(zero_copy_only=False)[is_c],
        group.column("p").to_numpy(zero_copy_only=False)[is_c])
    return pa.Table.from_pydict(
        {"node": nodes, "dist": dists, "parent": pars},
        schema=_SSSP_PATH_SCHEMA)


def sssp_paths(edges: ray.data.Dataset, seeds: ray.data.Dataset, *,
               rounds: int = SSSP_ROUNDS) -> ray.data.Dataset:
    """(node, dist, parent): the shortest-path tree from the seed set
    using at most ``rounds`` edges, parent = min-id optimal
    predecessor (-1 at seeds).  rounds+1 exchanges, one lazy plan."""
    e = edges.map_batches(_relaxp_edge_rows, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    plan = seeds.map_batches(_relaxp_seed_rows, batch_format="pyarrow")
    for _ in range(rounds):
        # per-round repartition clamp — see _min_relax_rounds
        plan = e.union(plan).groupby("hb").map_groups(
            _relaxp_round_bucket, batch_format="pyarrow").repartition(16)
    return plan.groupby("hb").map_groups(_relaxp_final_bucket,
                                         batch_format="pyarrow")


def sssp_paths_planted_query(sf_dir: str) -> ray.data.Dataset:
    """Shortest-path tree over the weighted offset graph from seed 0."""
    import os

    import ray.data as rd

    import pyarrow.compute as pc

    from nerfray.sources.parquet import read_parquet_clean
    ids = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id"])
    n = ids.count()
    edges = planted_weighted_edges(ids, n)

    def _seed(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "node": pc.cast(batch.column("id"), pa.int64())})

    seeds = rd.range(1).map_batches(_seed, batch_format="pyarrow")
    return sssp_paths(edges, seeds, rounds=SSSP_ROUNDS)


def sssp_paths_planted_sql(rounds: int = SSSP_ROUNDS) -> str:
    """Distances via the unrolled Bellman-Ford layers; parent(v) =
    min(u) among optimal predecessors (d_{R-1}(u) + w = d_R(v)), -1 at
    the seed — exactly the kernel's deterministic tie-break."""
    edge_sel = "\n  UNION ALL ".join(
        f"SELECT vec_id AS u, (vec_id + {off}) % nn.n AS v, "
        f"{w}::BIGINT AS w FROM embeddings, nn"
        for off, w in SSSP_WEIGHTS.items())
    layers = []
    for t in range(rounds):
        layers.append(
            f"d{t + 1} AS (SELECT node, min(dist)::BIGINT AS dist FROM ("
            f"SELECT node, dist FROM d{t} "
            f"UNION ALL SELECT e.v AS node, d{t}.dist + e.w AS dist "
            f"FROM d{t} JOIN e ON e.u = d{t}.node) GROUP BY node)")
    return (
        "WITH nn AS (SELECT count(*)::BIGINT AS n FROM embeddings),\n"
        f"e AS (\n  {edge_sel}\n),\n"
        "d0 AS (SELECT 0::BIGINT AS node, 0::BIGINT AS dist),\n"
        + ",\n".join(layers)
        + f""",
par AS (
  SELECT fin.node, min(e.u) AS parent
  FROM d{rounds} fin
  JOIN e ON e.v = fin.node
  JOIN d{rounds - 1} pu ON pu.node = e.u AND pu.dist + e.w = fin.dist
  GROUP BY fin.node)
SELECT f.node, f.dist,
       coalesce(CASE WHEN f.node = 0 AND f.dist = 0 THEN -1
                     ELSE p.parent END, -1)::BIGINT AS parent
FROM d{rounds} f LEFT JOIN par p ON p.node = f.node
ORDER BY f.node"""
    )


# ---------------------------------------------------------------------------
# greedy maximal matching (deterministic mutual-proposal rounds)
# ---------------------------------------------------------------------------
#
# The assignment-problem kernel (matched-cohort pairing for experiments,
# one-to-one dedup pair assignment): each round every live node
# proposes to its MINIMUM-id neighbor; mutual proposals become matched
# pairs; edges touching matched nodes are pruned; repeat until no edges
# remain.  Progress is guaranteed — following proposal pointers,
# p(p(u)) <= u (p(u)'s neighbors include u), so some chain bottoms out
# in a mutual pair every round.  Deterministic, so the planted fixture
# (disjoint 3-node paths over vec_ids) has the closed-form answer
# (3k, 3k+1), mirrored in MATCHING_PLANTED_SQL.  Per round: proposal
# co-group + mutual co-group + two anti-joins — 4 keyed exchanges,
# nothing node- or edge-proportional at the driver (round deltas are
# scalar counts).

MATCHING_MAX_ROUNDS = 24

_PROP_SCHEMA = pa.schema([("node", pa.int64()), ("nbr", pa.int64()),
                          ("hb", pa.int32())])
_PAIR_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                          ("hb", pa.int32())])
_MATCH_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])


def _match_dir_rows(batch: pa.Table) -> pa.Table:
    u = batch.column("u").to_numpy(zero_copy_only=False)
    v = batch.column("v").to_numpy(zero_copy_only=False)
    node = np.concatenate([u, v])
    nbr = np.concatenate([v, u])
    return pa.Table.from_pydict({
        "node": pa.array(node, pa.int64()),
        "nbr": pa.array(nbr, pa.int64()),
        "hb": pa.array((node & 63).astype(np.int32), pa.int32()),
    }, schema=_PROP_SCHEMA)


def _match_propose_bucket(group: pa.Table) -> pa.Table:
    """Per node: the min neighbor, re-keyed to the unordered pair."""
    if group.num_rows == 0:
        return _PAIR_SCHEMA.empty_table()
    node = group.column("node").to_numpy(zero_copy_only=False)
    nbr = group.column("nbr").to_numpy(zero_copy_only=False)
    order = np.lexsort((nbr, node))
    n_s, b_s = node[order], nbr[order]
    starts = np.flatnonzero(np.r_[True, n_s[1:] != n_s[:-1]])
    pn, pb = n_s[starts], b_s[starts]
    a = np.minimum(pn, pb)
    b = np.maximum(pn, pb)
    return pa.Table.from_pydict({
        "a": pa.array(a, pa.int64()),
        "b": pa.array(b, pa.int64()),
        "hb": pa.array((a & 63).astype(np.int32), pa.int32()),
    }, schema=_PAIR_SCHEMA)


def _match_mutual_bucket(group: pa.Table) -> pa.Table:
    """Pairs proposed by BOTH endpoints (each node proposes once, so a
    count of 2 on the unordered pair == mutual)."""
    if group.num_rows == 0:
        return _MATCH_SCHEMA.empty_table()
    a = group.column("a").to_numpy(zero_copy_only=False)
    b = group.column("b").to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    a_s, b_s = a[order], b[order]
    new = np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]
    starts = np.flatnonzero(new)
    cnt = np.diff(np.r_[starts, len(a_s)])
    keep = starts[cnt == 2]
    return pa.Table.from_pydict({
        "a": pa.array(a_s[keep], pa.int64()),
        "b": pa.array(b_s[keep], pa.int64()),
    }, schema=_MATCH_SCHEMA)


def _matched_nodes(matched: ray.data.Dataset) -> ray.data.Dataset:
    def _unpivot(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"mnode": pa.array(np.concatenate([a, b]), pa.int64())},
            schema=pa.schema([("mnode", pa.int64())]))
    return matched.map_batches(_unpivot, batch_format="pyarrow",
                               zero_copy_batch=True)


def greedy_matching(edges: ray.data.Dataset, *,
                    max_rounds: int = MATCHING_MAX_ROUNDS) \
        -> ray.data.Dataset:
    """Maximal matching of an undirected graph given as (u, v) int64
    rows (each edge once, u != v): (a, b) matched pairs, a < b.
    Deterministic (min-id proposals) — NOT maximum matching, the
    greedy distributed one every round-based system ships."""
    from nerfray.ops.joins import hash_join
    types = {c: pa.int64() for c in ("u", "v", "a", "b", "mnode")}
    live = edges.materialize()
    acc: ray.data.Dataset | None = None
    for _ in range(max_rounds):
        if live.count() == 0:
            break
        matched = live.map_batches(
            _match_dir_rows, batch_format="pyarrow",
            zero_copy_batch=True) \
            .groupby("hb").map_groups(_match_propose_bucket,
                                      batch_format="pyarrow") \
            .groupby("hb").map_groups(_match_mutual_bucket,
                                      batch_format="pyarrow") \
            .materialize()
        if matched.count() == 0:
            raise ValueError("matching round made no progress on a "
                             "non-empty edge set (corrupt input? "
                             "u == v self-loops?)")
        nodes = _matched_nodes(matched).materialize()
        live = hash_join(live, nodes, left_on="u", right_on="mnode",
                         left_cols=["v"], right_cols=[],
                         how="left anti", field_types=types) \
            .rename_columns({"__key": "u"})
        live = hash_join(live, nodes, left_on="v", right_on="mnode",
                         left_cols=["u"], right_cols=[],
                         how="left anti", field_types=types) \
            .rename_columns({"__key": "v"}) \
            .repartition(8).materialize()
        acc = matched if acc is None else \
            acc.union(matched).repartition(8).materialize()
    else:
        if live.count():
            raise ValueError(f"matching did not converge in "
                             f"{max_rounds} rounds")
    if acc is None:
        return ray.data.from_arrow(_MATCH_SCHEMA.empty_table())
    return acc


def matching_planted_query(sf_dir: str) -> ray.data.Dataset:
    """Greedy matching over disjoint 3-node paths (3k-3k+1-3k+2) on
    vec_ids: the deterministic dynamics match exactly (3k, 3k+1)."""
    import os

    from nerfray.sources.parquet import read_parquet_clean
    ids = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id"])
    n = ids.count()

    def _mk(batch: pa.Table) -> pa.Table:
        i = batch.column("vec_id").to_numpy(zero_copy_only=False)
        first = i[(i % 3 == 0) & (i + 1 < n)]
        second = i[(i % 3 == 1) & (i + 1 < n)]
        return pa.Table.from_pydict({
            "u": pa.array(np.concatenate([first, second]), pa.int64()),
            "v": pa.array(np.concatenate([first + 1, second + 1]),
                          pa.int64()),
        })

    return greedy_matching(
        ids.map_batches(_mk, batch_format="pyarrow",
                        zero_copy_batch=True))


MATCHING_PLANTED_SQL = """
WITH nn AS (SELECT count(*)::BIGINT AS n FROM embeddings)
SELECT vec_id AS a, vec_id + 1 AS b
FROM embeddings, nn
WHERE vec_id % 3 = 0 AND vec_id + 1 < nn.n
ORDER BY a
"""


def ppr_planted_sql(n: int = PLANTED_PR_N,
                    iters: int = PLANTED_PR_ITERS) -> str:
    """Personalized PageRank oracle on the dyadic-exact planted graph:
    restart mass concentrated at node 0 (r0 = e0) — every float64 op
    stays an exact dyadic rational, so the distributed operator is
    bit-equal to this unrolled power iteration."""
    layers = [f"pr0 AS (SELECT i, CASE WHEN i = 0 THEN 1.0 ELSE 0.0 END"
              f" AS r FROM nodes)"]
    for t in range(1, iters + 1):
        layers.append(
            f"pr{t} AS (SELECT nd.i AS i, "
            f"CASE WHEN nd.i = 0 THEN 0.5 ELSE 0.0 END + 0.5 * "
            f"coalesce(sum(p.r / 2.0), 0.0) AS r "
            f"FROM nodes nd LEFT JOIN edges e ON e.d = nd.i "
            f"LEFT JOIN pr{t - 1} p ON p.i = e.s GROUP BY nd.i)")
    return (
        f"WITH nodes AS (SELECT i FROM generate_series(0, {n - 1}) AS t(i)),\n"
        f"edges AS (\n"
        f"  SELECT i AS s, (i + 1) % {n} AS d FROM nodes\n"
        f"  UNION ALL SELECT i, i // 2 FROM nodes WHERE i >= 1\n"
        f"  UNION ALL SELECT 0, 3),\n"
        + ",\n".join(layers) + "\n"
        f"SELECT 'n' || lpad(i::VARCHAR, 3, '0') AS node, r AS rank\n"
        f"FROM pr{iters} ORDER BY node"
    )


# ---------------------------------------------------------------------------
# maximal independent set (deterministic min-id Luby rounds)
# ---------------------------------------------------------------------------
#
# Matching's sibling: a node enters the MIS when its id is smaller than
# every LIVE neighbor's; the winner and its neighbors leave the graph;
# repeat.  Used for conflict-free scheduling (pick a maximal set of
# non-adjacent dedup clusters / locks / partitions to process in one
# wave).  Isolated nodes are all in the MIS by definition — callers
# pass the edge set plus the node universe so isolates survive pruning.
# Per round: one min-neighbor co-group + two anti-joins; scalar-only
# driver state; min-id winners guarantee progress (the globally
# smallest live node always enters).

MIS_MAX_ROUNDS = 24

_MIS_SCHEMA = pa.schema([("node", pa.int64())])


def _mis_min_nbr_bucket(group: pa.Table) -> pa.Table:
    """Per node: min live-neighbor id; winners = node < min nbr."""
    if group.num_rows == 0:
        return _MIS_SCHEMA.empty_table()
    node = group.column("node").to_numpy(zero_copy_only=False)
    nbr = group.column("nbr").to_numpy(zero_copy_only=False)
    order = np.lexsort((nbr, node))
    n_s, b_s = node[order], nbr[order]
    starts = np.flatnonzero(np.r_[True, n_s[1:] != n_s[:-1]])
    win = n_s[starts][n_s[starts] < b_s[starts]]
    return pa.Table.from_pydict({"node": pa.array(win, pa.int64())},
                                schema=_MIS_SCHEMA)


def greedy_mis(edges: ray.data.Dataset, nodes: ray.data.Dataset, *,
               max_rounds: int = MIS_MAX_ROUNDS) -> ray.data.Dataset:
    """MIS of the undirected graph (edges as (u, v) int64 rows, nodes
    as the (node) universe): the deterministic min-id Luby set."""
    from nerfray.ops.joins import hash_join
    types = {c: pa.int64() for c in ("u", "v", "node", "mnode")}
    live = edges.materialize()
    survivors = nodes  # nodes never touched by a winner's closed nbhd
    acc: ray.data.Dataset | None = None
    for _ in range(max_rounds):
        if live.count() == 0:
            break
        winners = live.map_batches(
            _match_dir_rows, batch_format="pyarrow",
            zero_copy_batch=True) \
            .groupby("hb").map_groups(_mis_min_nbr_bucket,
                                      batch_format="pyarrow") \
            .materialize()
        if winners.count() == 0:
            raise ValueError("MIS round made no progress on a "
                             "non-empty edge set (u == v self-loops?)")
        # closed neighborhood of the winners leaves the live graph
        def _nbhd(batch: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {"mnode": batch.column("node")},
                schema=pa.schema([("mnode", pa.int64())]))
        live_dir = live.map_batches(_match_dir_rows,
                                    batch_format="pyarrow",
                                    zero_copy_batch=True)
        touched = hash_join(
            live_dir, winners.map_batches(
                _nbhd, batch_format="pyarrow"),
            left_on="nbr", right_on="mnode", left_cols=["node"],
            right_cols=[], how="left semi",
            field_types={"nbr": pa.int64(), "node": pa.int64(),
                         "mnode": pa.int64()}) \
            .map_batches(lambda b: pa.Table.from_pydict(
                {"mnode": b.column("node")},
                schema=pa.schema([("mnode", pa.int64())])),
                batch_format="pyarrow") \
            .union(winners.map_batches(_nbhd, batch_format="pyarrow")) \
            .repartition(8).materialize()
        live = hash_join(live, touched, left_on="u", right_on="mnode",
                         left_cols=["v"], right_cols=[],
                         how="left anti", field_types=types) \
            .rename_columns({"__key": "u"})
        live = hash_join(live, touched, left_on="v", right_on="mnode",
                         left_cols=["u"], right_cols=[],
                         how="left anti", field_types=types) \
            .rename_columns({"__key": "v"}) \
            .repartition(8).materialize()
        def _as_node(batch: pa.Table) -> pa.Table:
            # batch-level rename: a lazy Project rename passes empty
            # bundles through unprojected and trips the executor's
            # mixed-schema warning when unioned (SCALE.md r4 recipe)
            return pa.Table.from_pydict(
                {"node": batch.column("__key")},
                schema=pa.schema([("node", pa.int64())]))

        survivors = hash_join(survivors, touched, left_on="node",
                              right_on="mnode", left_cols=[],
                              right_cols=[], how="left anti",
                              field_types=types) \
            .map_batches(_as_node, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .repartition(8).materialize()
        acc = winners if acc is None else \
            acc.union(winners).repartition(8).materialize()
    else:
        if live.count():
            raise ValueError(f"MIS did not converge in "
                             f"{max_rounds} rounds")
    # edge-free survivors are independent by definition
    return survivors if acc is None else acc.union(survivors)


def mis_planted_query(sf_dir: str) -> ray.data.Dataset:
    """MIS over the disjoint 3-paths (3k-3k+1-3k+2): the min-id
    dynamics select {3k, 3k+2} (and lone tail nodes)."""
    import os

    from nerfray.sources.parquet import read_parquet_clean
    ids = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id"])
    n = ids.count()

    def _mk_edges(batch: pa.Table) -> pa.Table:
        i = batch.column("vec_id").to_numpy(zero_copy_only=False)
        first = i[(i % 3 == 0) & (i + 1 < n)]
        second = i[(i % 3 == 1) & (i + 1 < n)]
        return pa.Table.from_pydict({
            "u": pa.array(np.concatenate([first, second]), pa.int64()),
            "v": pa.array(np.concatenate([first + 1, second + 1]),
                          pa.int64()),
        })

    def _mk_nodes(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        return pa.Table.from_pydict({
            "node": _pc.cast(batch.column("vec_id"), pa.int64())})

    return greedy_mis(
        ids.map_batches(_mk_edges, batch_format="pyarrow",
                        zero_copy_batch=True),
        ids.map_batches(_mk_nodes, batch_format="pyarrow",
                        zero_copy_batch=True))


# per 3-path {3k, 3k+1, 3k+2}: round 1 winners are every 3k (its only
# live neighbor 3k+1 is larger) AND every 3k+2 (3k+1 larger? no —
# 3k+1 < 3k+2, so 3k+2 waits); pruning removes 3k and 3k+1; round 2:
# 3k+2 is edge-free -> survivor.  MIS = {i : i % 3 != 1}, minus nothing
# at the tail (a lone 3k tail node is an isolate -> survivor; a 2-node
# tail {3k, 3k+1} matches round 1 -> only 3k).
MIS_PLANTED_SQL = """
SELECT vec_id AS node FROM embeddings
WHERE vec_id % 3 != 1
ORDER BY node
"""


# ---------------------------------------------------------------------------
# nearest-landmark assignment (graph Voronoi partition)
# ---------------------------------------------------------------------------
#
# Multi-source BFS where each node learns (hop distance to the nearest
# landmark, the landmark id) with a deterministic min-landmark
# tie-break — the seeding step of graph partitioning / k-center
# clustering.  ZERO new kernel: (dist, landmark) packs into one int64
# (dist * 2^20 + landmark, landmark < 2^20 checked), unit edges carry
# weight 2^20, and the existing fused min-relax rounds compute the
# lexicographic min for free.  rounds+1 exchanges, one lazy plan.

LANDMARK_PACK = 1 << 20
LANDMARK_HOPS = 3
LANDMARK_MOD = 100  # planted fixture: landmarks = vec_id % 100 == 0


def nearest_landmarks(edges: ray.data.Dataset,
                      landmarks: ray.data.Dataset, *,
                      max_hops: int = LANDMARK_HOPS) -> ray.data.Dataset:
    """(node, dist, landmark) for every node within ``max_hops`` of a
    landmark; ``edges`` as (u, v) int64 rows, ``landmarks`` a (node)
    column.  Ties break to the smallest landmark id."""

    def _pack_seed(batch: pa.Table) -> pa.Table:
        n = batch.column("node").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(n) and int(n.max()) >= LANDMARK_PACK:
            raise ValueError("landmark ids must stay below 2^20 for "
                             "the (dist, landmark) packing")
        z = np.zeros(len(n), np.int64)
        return pa.Table.from_pydict({
            "k": n, "d": n.copy(), "v": z, "w": z,
            "side": np.zeros(len(n), np.int8),
            "hb": (n % _RELAX_BUCKETS).astype(np.int32),
        }, schema=_RELAX_SCHEMA)

    def _pack_edges(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = batch.column("v").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict({
            "k": u, "d": np.zeros(len(u), np.int64), "v": v,
            "w": np.full(len(u), LANDMARK_PACK, np.int64),
            "side": np.ones(len(u), np.int8),
            "hb": (u % _RELAX_BUCKETS).astype(np.int32),
        }, schema=_RELAX_SCHEMA)

    e = edges.map_batches(_pack_edges, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    plan = landmarks.map_batches(_pack_seed, batch_format="pyarrow")
    for _ in range(max_hops):
        # per-round repartition clamp — see _min_relax_rounds
        plan = e.union(plan).groupby("hb").map_groups(
            _relax_round_bucket, batch_format="pyarrow").repartition(16)
    packed = plan.groupby("hb").map_groups(
        functools.partial(_relax_final_bucket, kcol="node",
                          dcol="packed"),
        batch_format="pyarrow")

    def _unpack(batch: pa.Table) -> pa.Table:
        p = batch.column("packed").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "node": batch.column("node"),
            "dist": pa.array(p // LANDMARK_PACK, pa.int64()),
            "landmark": pa.array(p % LANDMARK_PACK, pa.int64()),
        })

    return packed.map_batches(_unpack, batch_format="pyarrow",
                              zero_copy_batch=True)


def landmarks_planted_query(sf_dir: str) -> ray.data.Dataset:
    """Voronoi assignment over the unit-weight offset graph with
    landmarks at vec_id % LANDMARK_MOD == 0."""
    import os

    from nerfray.sources.parquet import read_parquet_clean
    ids = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id"])
    n = ids.count()
    edges = planted_triangle_edges(ids, n)

    def _lm(batch: pa.Table) -> pa.Table:
        i = batch.column("vec_id").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "node": pa.array(i[i % LANDMARK_MOD == 0], pa.int64())})

    return nearest_landmarks(
        edges, ids.map_batches(_lm, batch_format="pyarrow",
                               zero_copy_batch=True))


def landmarks_planted_sql(hops: int = LANDMARK_HOPS) -> str:
    """Unrolled packed-min layers: p = dist * 2^20 + landmark, so
    min(p) IS the lexicographic (dist, landmark) min."""
    layers = []
    for t in range(hops):
        layers.append(
            f"l{t + 1} AS (SELECT node, min(p)::BIGINT AS p FROM ("
            f"SELECT node, p FROM l{t} "
            f"UNION ALL SELECT e.v AS node, l{t}.p + {LANDMARK_PACK} "
            f"AS p FROM l{t} JOIN e ON e.u = l{t}.node) GROUP BY node)")
    return (
        f"WITH nn AS (SELECT count(*)::BIGINT AS n FROM embeddings),\n"
        f"e AS (\n"
        f"  SELECT vec_id AS u, (vec_id + 7) % nn.n AS v"
        f" FROM embeddings, nn\n"
        f"  UNION ALL SELECT vec_id, (vec_id + 13) % nn.n"
        f" FROM embeddings, nn\n"
        f"  UNION ALL SELECT vec_id, (vec_id + 20) % nn.n"
        f" FROM embeddings, nn),\n"
        f"l0 AS (SELECT vec_id AS node, vec_id::BIGINT AS p"
        f" FROM embeddings WHERE vec_id % {LANDMARK_MOD} = 0),\n"
        + ",\n".join(layers) + "\n"
        f"SELECT node, (p // {LANDMARK_PACK})::BIGINT AS dist,\n"
        f"       (p % {LANDMARK_PACK})::BIGINT AS landmark\n"
        f"FROM l{hops} ORDER BY node"
    )


# -- rdfs:range validation (the object-side twin of the domain check) --------

def range_violations_planted_query(sf_dir: str) -> ray.data.Dataset:
    """Statements whose OBJECT's type closure lacks the relation's
    range class (rdfs:range) — same one-anti-join shape as the domain
    check, keyed on the object entity."""
    import os

    import pyarrow.parquet as _pq

    from nerfray.ops.joins import hash_join
    from nerfray.sources.parquet import read_parquet_clean
    n_docs = _pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id"])

    def _stmts(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        rel = (ids * 7 + 3) % DOMAIN_N_RELS
        obj = (ids * 11 + 5) % n_docs
        rng = (rel + 1) % DOMAIN_N_RELS
        return pa.Table.from_pydict({
            "entity": pa.array(ids, pa.int64()),
            "rel": pa.array(rel, pa.int64()),
            "obj": pa.array(obj, pa.int64()),
            "ck": pa.array(obj * DOMAIN_N_RELS + rng, pa.int64()),
        })

    stmts = docs.map_batches(_stmts, batch_format="pyarrow",
                             zero_copy_batch=True)
    types_ck = type_inference_planted_query(sf_dir).map_batches(
        _type_ck_batch, batch_format="pyarrow", zero_copy_batch=True)
    types = {c: pa.int64() for c in ("entity", "rel", "obj", "ck")}

    def _viol(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "entity": batch.column("entity"),
            "rel": batch.column("rel"),
            "obj": batch.column("obj"),
        }, schema=pa.schema([("entity", pa.int64()),
                             ("rel", pa.int64()),
                             ("obj", pa.int64())]))

    return hash_join(
        stmts, types_ck, left_on="ck", right_on="ck",
        left_cols=["entity", "rel", "obj"], right_cols=[],
        how="left anti", field_types=types,
    ).map_batches(_viol, batch_format="pyarrow")


RANGE_VIOLATIONS_PLANTED_SQL = f"""
WITH RECURSIVE e AS ({TAXO_EDGES_SQL}),
clo AS (
  SELECT child AS node, parent AS anc, 1::BIGINT AS dist FROM e
  UNION ALL
  SELECT c.node, e.parent, c.dist + 1 FROM clo c JOIN e ON e.child = c.anc
),
nn AS (SELECT count(*)::BIGINT AS n FROM embeddings),
nd AS (SELECT count(*)::BIGINT AS n FROM documents),
direct AS (SELECT doc_id AS entity, doc_id % nn.n AS cls
           FROM documents, nn),
types AS (
  SELECT entity, cls FROM direct
  UNION ALL
  SELECT d.entity, c.anc AS cls FROM direct d JOIN clo c ON c.node = d.cls
),
stmts AS (SELECT doc_id AS entity,
                 (doc_id * 7 + 3) % {DOMAIN_N_RELS} AS rel,
                 (doc_id * 11 + 5) % nd.n AS obj
          FROM documents, nd)
SELECT s.entity, s.rel, s.obj
FROM stmts s
WHERE NOT EXISTS (SELECT 1 FROM types t
                  WHERE t.entity = s.obj
                    AND t.cls = (s.rel + 1) % {DOMAIN_N_RELS})
ORDER BY s.entity
"""
