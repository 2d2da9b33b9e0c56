"""Stage E + dedup + partitioned write: triple materialization.

Predicate map (BASELINE.json north_star):
    library -> (repo,               imports,        canon_id)
    symbol  -> (repo/path,          defines,        canon_id)
    api     -> (repo/path,          calls,          canon_id)
    license -> (repo,               licensed-under, canon_id)

Exact dedup = per-batch combiner (local set) then
``groupby([subj, pred, obj])`` keep-first — the hash-partition +
per-group-first pattern (SURVEY.md §2.7). Output is partitioned by
``subj_bucket = sha1(subj) % n_buckets`` so the write is resumable and
downstream reads can prune by subject (SURVEY.md §7.3).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

TRIPLE_SCHEMA = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
])

PRED_BY_LABEL = {
    "library": ("repo", "imports"),
    "symbol": ("file", "defines"),
    "api": ("file", "calls"),
    "license": ("repo", "licensed-under"),
}


def subj_bucket(subj: str, n_buckets: int) -> int:
    return int.from_bytes(hashlib.sha1(subj.encode()).digest()[:4],
                          "big") % n_buckets


_EMIT_LABELS = pa.array(sorted(PRED_BY_LABEL))
_EMIT_PREDS = pa.array([PRED_BY_LABEL[lb][1] for lb in sorted(PRED_BY_LABEL)])
_EMIT_IS_REPO = pa.array([PRED_BY_LABEL[lb][0] == "repo"
                          for lb in sorted(PRED_BY_LABEL)])


def emit_triples(batch: pa.Table) -> pa.Table:
    """Linked spans -> locally-deduped triples. Fully vectorized:
    label -> (pred, subject grain) via ``pc.index_in`` + ``pc.take``
    against the fixed predicate map, subject built with element-wise
    binary join, and the per-batch combiner is one Arrow hash
    ``group_by`` — no Python loop over rows."""
    import pyarrow.compute as pc

    idx = pc.index_in(batch.column("label"), value_set=_EMIT_LABELS)
    keep = pc.is_valid(idx)
    idx = pc.filter(idx, keep)
    repo = pc.filter(batch.column("repo"), keep)
    path = pc.filter(batch.column("path"), keep)
    canon = pc.filter(batch.column("canon_id"), keep)

    is_repo = pc.take(_EMIT_IS_REPO, idx)
    file_subj = pc.binary_join_element_wise(repo, path, "/")
    subj = pc.if_else(is_repo, repo, file_subj)
    pred = pc.take(_EMIT_PREDS, idx)
    t = pa.Table.from_arrays(
        [pc.cast(subj, pa.string()), pc.cast(pred, pa.string()),
         pc.cast(canon, pa.string())], schema=TRIPLE_SCHEMA)
    return t.group_by(["subj", "pred", "obj"]).aggregate([])


PROV_SCHEMA = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("repo", pa.string()),
    ("path", pa.string()),
    ("content_sha", pa.string()),
    ("unit_id", pa.int32()),
    ("src_start", pa.int32()),
    ("src_end", pa.int32()),
])


def emit_triples_with_provenance(batch: pa.Table) -> pa.Table:
    """Linked spans -> triples carrying source provenance (FIXTURES.md F5:
    repo, path, content_sha, src span). Per-batch dedup keeps the MINIMAL
    provenance tuple per triple — a deterministic choice independent of
    row order, so retries and different block orders agree."""
    cols = {n: batch.column(n).to_pylist()
            for n in ("repo", "path", "content_sha", "unit_id", "label",
                      "canon_id", "start", "end")}
    best: dict[tuple, tuple] = {}
    for repo, path, sha, uid, lbl, canon, a, b in zip(
            cols["repo"], cols["path"], cols["content_sha"],
            cols["unit_id"], cols["label"], cols["canon_id"],
            cols["start"], cols["end"]):
        m = PRED_BY_LABEL.get(lbl)
        if m is None:
            continue
        subj = repo if m[0] == "repo" else repo + "/" + path
        key = (subj, m[1], canon)
        prov = (path, int(uid), int(a), int(b), repo, sha)
        if key not in best or prov < best[key]:
            best[key] = prov
    keys = sorted(best)
    return pa.Table.from_pydict({
        "subj": pa.array([k[0] for k in keys], pa.string()),
        "pred": pa.array([k[1] for k in keys], pa.string()),
        "obj": pa.array([k[2] for k in keys], pa.string()),
        "repo": pa.array([best[k][4] for k in keys], pa.string()),
        "path": pa.array([best[k][0] for k in keys], pa.string()),
        "content_sha": pa.array([best[k][5] for k in keys], pa.string()),
        "unit_id": pa.array([best[k][1] for k in keys], pa.int32()),
        "src_start": pa.array([best[k][2] for k in keys], pa.int32()),
        "src_end": pa.array([best[k][3] for k in keys], pa.int32()),
    }, schema=PROV_SCHEMA)


def _block_distinct_prov(batch: pa.Table) -> pa.Table:
    """Keep the min-provenance row per (subj,pred,obj) within a block."""
    rows = list(zip(*(batch.column(n).to_pylist()
                      for n in PROV_SCHEMA.names)))

    def prov_key(r):
        return (r[4], r[6], r[7], r[8])  # path, unit_id, src_start, src_end

    best: dict[tuple, tuple] = {}
    for r in rows:
        key = r[:3]
        if key not in best or prov_key(r) < prov_key(best[key]):
            best[key] = r
    keys = sorted(best)
    out = list(zip(*(best[k] for k in keys))) if keys else \
        [[] for _ in PROV_SCHEMA.names]
    return pa.Table.from_pydict(
        {n: pa.array(list(v), PROV_SCHEMA.field(n).type)
         for n, v in zip(PROV_SCHEMA.names, out)}, schema=PROV_SCHEMA)


def dedup_triples(triples: ray.data.Dataset,
                  n_buckets: int = 64) -> ray.data.Dataset:
    """Global exact dedup for arbitrarily-partitioned input: shuffle on a
    single int32 bucket key (crc32 of the triple, mod n_buckets) and run
    an Arrow hash group-by per bucket — measured ~1.5x faster than the
    sort shuffle over three string keys, because the exchange sorts a
    4-byte column instead of comparing string triples.

    When the input is subject-partitioned (blocks contain whole repos),
    use ``dedup_triples_local`` instead — per-block dedup is then
    globally exact and the all-to-all disappears (SURVEY.md §7.3)."""
    import zlib

    def _bucketed(batch: pa.Table) -> pa.Table:
        bs = [zlib.crc32(f"{s}\x1f{p}\x1f{o}".encode()) % n_buckets
              for s, p, o in zip(batch.column("subj").to_pylist(),
                                 batch.column("pred").to_pylist(),
                                 batch.column("obj").to_pylist())]
        return batch.append_column("bucket", pa.array(bs, pa.int32()))

    def _bucket_distinct(group: pa.Table) -> pa.Table:
        return group.drop_columns(["bucket"]) \
            .group_by(["subj", "pred", "obj"]).aggregate([])

    return triples.map_batches(_bucketed, batch_format="pyarrow",
                               zero_copy_batch=True) \
        .groupby("bucket").map_groups(_bucket_distinct,
                                      batch_format="pyarrow")


def _block_distinct(batch: pa.Table) -> pa.Table:
    return batch.group_by(["subj", "pred", "obj"]).aggregate([])


def dedup_triples_local(triples: ray.data.Dataset) -> ray.data.Dataset:
    """Per-block exact dedup (Arrow hash group-by, no shuffle). Globally
    exact IFF every subject's rows are confined to one block. Repo-major
    corpus blocking (corpus_source.corpus_dataset_by_repo) makes that
    hold through the map stages — with one caveat: Ray Data dynamically
    splits a task's output at ``target_max_block_size`` (128 MiB), and a
    split can bisect a repo. That bounds the claim to per-repo triple
    output below the split threshold (comfortably true here: a repo's
    emitted triples are KBs). When the bound can't be assumed, use
    ``dedup_triples_checked`` (validates containment on the blocks that
    actually reach the dedup and falls back to the shuffle path) or
    ``dedup_triples`` directly."""
    return triples.map_batches(_block_distinct, batch_format="pyarrow",
                               batch_size=None, zero_copy_batch=True)


def subject_repo(s: str) -> str:
    """Repo grain of a subject ('org/repo-x' or 'org/repo-x/<path>')."""
    return "/".join(s.split("/", 3)[:2])


def contract_subjects_to_repo(triples: ray.data.Dataset
                              ) -> ray.data.Dataset:
    """Contract file-grain subjects to repo grain (Arrow kernels; the
    vectorized ``subject_repo``).  Cuts graph node count ~50x at corpus
    scale — the cheapest mitigation for any O(nodes) structure before
    graph ops (components / pagerank at 100 TB run on this grain)."""

    def _contract(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        parts = pc.split_pattern(batch.column("subj"), "/")
        repo = pc.binary_join(pc.list_slice(parts, 0, 2), "/")
        return batch.set_column(
            batch.column_names.index("subj"), "subj", repo)

    return triples.map_batches(_contract, batch_format="pyarrow",
                               zero_copy_batch=True)


def validate_subject_containment(triples_ds: ray.data.Dataset) -> bool:
    """Precondition check for ``dedup_triples_local`` on the blocks that
    ACTUALLY reach the dedup (not the corpus blocks): no repo-grain
    subject prefix may appear in more than one block. One cheap pass —
    per-block distinct repo list (a few hundred strings per block) + a
    driver-side disjointness check. Run it on a MATERIALIZED dataset so
    the validated block boundaries are the ones the dedup will see."""

    def _repos(batch: pa.Table) -> pa.Table:
        rs = sorted({subject_repo(s)
                     for s in batch.column("subj").to_pylist()})
        return pa.Table.from_pydict(
            {"repos": pa.array([rs], pa.list_(pa.string()))})

    seen: set[str] = set()
    for row in triples_ds.map_batches(_repos, batch_format="pyarrow",
                                      batch_size=None).take_all():
        block = set(row["repos"])
        if seen & block:
            return False
        seen |= block
    return True


def dedup_triples_checked(emitted: ray.data.Dataset) -> ray.data.Dataset:
    """Shuffle-free dedup with its precondition VERIFIED: materialize
    the emitted triples (fixing block boundaries), check repo
    containment on those exact blocks, then per-block dedup — falling
    back to the generic shuffle dedup if a dynamic block split (or an
    unpartitioned source) broke containment. Identical output either
    way; only the shuffle cost differs."""
    mat = emitted.materialize()
    if validate_subject_containment(mat):
        return dedup_triples_local(mat)
    import logging
    logging.getLogger(__name__).warning(
        "subject containment violated on dedup input blocks; "
        "falling back to shuffle dedup")
    return dedup_triples(mat)


def validate_repo_partitioning(corpus_ds: ray.data.Dataset) -> bool:
    """Check the precondition of ``dedup_triples_local``: no repo appears
    in more than one block. Runs one cheap map (per-block distinct repo
    list — a few hundred strings per block) + a driver-side set check.
    Use before trusting ``dedup="partitioned"`` on an unknown source."""

    def _repos(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        uniq = pc.unique(batch.column("repo"))
        return pa.Table.from_pydict({"repos": pa.array(
            [[str(x) for x in uniq]], pa.list_(pa.string()))})

    seen: set[str] = set()
    for row in corpus_ds.map_batches(_repos, batch_format="pyarrow",
                                     batch_size=None).take_all():
        block_repos = set(row["repos"])
        if seen & block_repos:
            return False
        seen |= block_repos
    return True


def with_bucket(batch: pa.Table, *, n_buckets: int) -> pa.Table:
    buckets = [subj_bucket(s, n_buckets)
               for s in batch.column("subj").to_pylist()]
    return batch.append_column("subj_bucket", pa.array(buckets, pa.int32()))


def write_triples(triples: ray.data.Dataset, out_dir: str,
                  n_buckets: int = 16) -> None:
    """Subject-hash-partitioned parquet (resumable layout, never one file)."""
    triples.map_batches(with_bucket, fn_kwargs={"n_buckets": n_buckets},
                        batch_format="pyarrow", zero_copy_batch=True) \
        .write_parquet(out_dir, partition_cols=["subj_bucket"])


# ---------------------------------------------------------------------------
# adjacency-list materialization (graph export)
# ---------------------------------------------------------------------------

N_ADJ_BUCKETS = 64


def adjacency_export(triples: ray.data.Dataset) -> ray.data.Dataset:
    """Materialize the graph as subject-grain adjacency lists:
    (subj, n_edges, adj) where adj = '|'-joined 'pred>obj' entries in
    (pred, obj) order — the partition-by-subject-hash export shape a
    downstream graph store bulk-loads. One shuffle keyed by a 64-way
    subject hash; list building is vectorized per bucket (sorted runs +
    binary_join_element_wise), never a per-subject dispatch."""
    import pandas as pd
    import pyarrow.compute as pc

    def _hb(batch: pa.Table) -> pa.Table:
        subj = np.asarray(batch.column("subj").to_pylist(), dtype=object)
        hb = (pd.util.hash_array(subj) % N_ADJ_BUCKETS).astype(np.int32)
        return batch.append_column("hb", pa.array(hb))

    out_schema = pa.schema([("subj", pa.string()),
                            ("n_edges", pa.int64()),
                            ("adj", pa.string())])

    def _bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        subj = np.asarray(group.column("subj").to_pylist(), dtype=object)
        entry = pc.binary_join_element_wise(
            group.column("pred"), group.column("obj"), ">")
        ent = np.asarray(entry.to_pylist(), dtype=object)
        order = np.lexsort((ent, subj))
        s, e = subj[order], ent[order]
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        n_edges = np.diff(np.r_[starts, len(s)])
        adj = ["|".join(e[a:a + c])
               for a, c in zip(starts, n_edges)]
        return pa.Table.from_pydict({
            "subj": pa.array(s[starts].tolist(), pa.string()),
            "n_edges": pa.array(n_edges, pa.int64()),
            "adj": pa.array(adj, pa.string()),
        })

    return triples.map_batches(_hb, batch_format="pyarrow") \
        .groupby("hb").map_groups(_bucket, batch_format="pyarrow")


def adjacency_sql(gold_sql: str) -> str:
    """DuckDB mirror: deterministic-order string_agg per subject."""
    return f"""
WITH gold AS ({gold_sql})
SELECT subj, count(*)::BIGINT AS n_edges,
       string_agg(pred || '>' || obj, '|' ORDER BY pred || '>' || obj)
         AS adj
FROM gold GROUP BY subj ORDER BY subj
"""


# ---------------------------------------------------------------------------
# subject-hash-partitioned graph materialization
# ---------------------------------------------------------------------------
#
# The north-star output layout: triples land in out_dir/pb=K/ parquet
# directories where K = hash(subj) % n_partitions, so every subject's
# triples live in exactly one directory.  Downstream graph ops (and a
# failed run's re-read) can then address one subject range without
# scanning the rest; combined with the checkpoint manifests this is the
# resumable, partitioned materialize of BASELINE.json's north_star
# ("triples partitioned by subject hash").  pd.util.hash_array is a
# fixed-key siphash — vectorized AND process-independent, so the layout
# is stable across runs and cluster sizes.

def assign_subject_partition(triples: ray.data.Dataset, *,
                             n_partitions: int = 64) -> ray.data.Dataset:
    def _pb(batch: pa.Table) -> pa.Table:
        import pandas as pd
        arr = np.empty(batch.num_rows, object)
        arr[:] = batch.column("subj").to_pylist()
        pb = (pd.util.hash_array(arr) % n_partitions).astype(np.int32)
        return batch.append_column("pb", pa.array(pb))

    return triples.map_batches(_pb, batch_format="pyarrow",
                               zero_copy_batch=True)


def write_by_subject_hash(triples: ray.data.Dataset, out_dir: str, *,
                          n_partitions: int = 64) -> None:
    """Materialize triples as out_dir/pb=K/*.parquet (hive-style), one
    directory per subject-hash partition."""
    assign_subject_partition(triples, n_partitions=n_partitions) \
        .write_parquet(out_dir, partition_cols=["pb"])


def lookup_subject(out_dir: str, subj: str, *,
                   n_partitions: int = 64) -> ray.data.Dataset:
    """Point lookup against a ``write_by_subject_hash`` layout: computes
    the subject's partition with the SAME hash the writer used and scans
    ONLY that pb=K directory (1/n_partitions of the data), with the
    subject equality pushed into the parquet fragment scan.  This is the
    serve-time payoff of the partitioned materialization — at 100 TB a
    lookup touches one bucket's files, not the corpus."""
    import os

    import pandas as pd
    import pyarrow.compute as pc

    arr = np.empty(1, object)
    arr[0] = subj
    # modulo on the ARRAY, exactly as the writer does: a scalar
    # np.uint64 % python-int promotes to float64 and corrupts the hash
    pb = int((pd.util.hash_array(arr) % n_partitions)[0])
    path = os.path.join(out_dir, f"pb={pb}")
    return ray.data.read_parquet(path, filter=pc.field("subj") == subj)


# ---------------------------------------------------------------------------
# entity typing (predicate-role majority vote)
# ---------------------------------------------------------------------------

# each (pred, role) pair implies a node type — the KG-construction
# post-pass that types canonicalized nodes from how triples use them
TYPE_RULES = {
    ("licensed-under", "s"): "repo",
    ("licensed-under", "o"): "license",
    ("imports", "s"): "repo",
    ("imports", "o"): "library",
    ("defines", "s"): "file",
    ("defines", "o"): "symbol",
    ("calls", "s"): "file",
    ("calls", "o"): "method",
}

_TYPE_SCHEMA = pa.schema([("node", pa.string()),
                          ("node_type", pa.string()),
                          ("n_votes", pa.int64())])


def entity_types(trips: ray.data.Dataset) -> ray.data.Dataset:
    """(node, node_type, n_votes): majority type over every triple the
    node participates in (ties -> lexicographic-min type).  Votes are
    narrow (node, type) rows; the argmax runs vectorized inside a
    64-way node-hash co-group — same dispatch shape as the LPA vote."""
    import pandas as pd

    def _votes(batch: pa.Table) -> pa.Table:
        """Vectorized: factorize pred once, map the (few) distinct
        preds through TYPE_RULES, then fancy-index both roles."""
        preds = np.asarray(batch.column("pred").to_pylist(), dtype=object)
        uniq, codes = np.unique(preds, return_inverse=True)
        node_parts: list = []
        type_parts: list = []
        for col, role in (("subj", "s"), ("obj", "o")):
            vals = np.asarray(batch.column(col).to_pylist(), dtype=object)
            tmap = np.asarray(
                [TYPE_RULES.get((p, role)) for p in uniq], dtype=object)
            mask = tmap[codes] != None  # noqa: E711 (elementwise)
            node_parts.append(vals[mask])
            type_parts.append(tmap[codes][mask])
        nodes = np.concatenate(node_parts) if node_parts else \
            np.array([], dtype=object)
        types = np.concatenate(type_parts) if type_parts else \
            np.array([], dtype=object)
        arr = nodes
        hb = (pd.util.hash_array(arr) % 64).astype(np.int32) \
            if len(arr) else np.array([], np.int32)
        return pa.Table.from_pydict({
            "node": pa.array(nodes, pa.string()),
            "vtype": pa.array(types, pa.string()),
            "hb": pa.array(hb, pa.int32())})

    def _argmax(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _TYPE_SCHEMA.empty_table()
        nodes = np.asarray(group.column("node").to_pylist(), dtype=object)
        vt = np.asarray(group.column("vtype").to_pylist(), dtype=object)
        order = np.lexsort((vt, nodes))
        n_s, t_s = nodes[order], vt[order]
        new_run = np.r_[True, (n_s[1:] != n_s[:-1]) | (t_s[1:] != t_s[:-1])]
        starts = np.flatnonzero(new_run)
        counts = np.diff(np.r_[starts, len(n_s)])
        rn, rt = n_s[starts], t_s[starts]
        pick = np.lexsort((rt, -counts, rn))
        first = np.r_[True, rn[pick][1:] != rn[pick][:-1]]
        sel = pick[first]
        return pa.Table.from_pydict({
            "node": pa.array(rn[sel], pa.string()),
            "node_type": pa.array(rt[sel], pa.string()),
            "n_votes": pa.array(counts[sel], pa.int64())},
            schema=_TYPE_SCHEMA)

    return trips.select_columns(["subj", "pred", "obj"]) \
        .map_batches(_votes, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("hb").map_groups(_argmax, batch_format="pyarrow")


def entity_types_sql(gold_sql: str) -> str:
    cases_s = " ".join(
        f"WHEN pred = '{p}' THEN '{t}'"
        for (p, r), t in sorted(TYPE_RULES.items()) if r == "s")
    cases_o = " ".join(
        f"WHEN pred = '{p}' THEN '{t}'"
        for (p, r), t in sorted(TYPE_RULES.items()) if r == "o")
    return f"""
WITH g AS ({gold_sql}),
votes AS (
  SELECT subj AS node, CASE {cases_s} END AS vtype FROM g
  UNION ALL
  SELECT obj, CASE {cases_o} END FROM g),
ranked AS (
  SELECT node, vtype, count(*)::BIGINT AS c,
         row_number() OVER (PARTITION BY node
                            ORDER BY count(*) DESC, vtype ASC) AS rn
  FROM votes WHERE vtype IS NOT NULL GROUP BY node, vtype)
SELECT node, vtype AS node_type, c AS n_votes
FROM ranked WHERE rn = 1 ORDER BY node
"""


# ---------------------------------------------------------------------------
# co-import association rules (market-basket mining over the KG)
# ---------------------------------------------------------------------------

ASSOC_RUN_CAP = 64   # libs per repo entering the pair emit (hub cap)

_ASSOC_SCHEMA = pa.schema([("lib_a", pa.string()),
                           ("lib_b", pa.string()),
                           ("support_pair", pa.int64()),
                           ("conf_ab_permille", pa.int64()),
                           ("conf_ba_permille", pa.int64())])


def lib_associations(trips: ray.data.Dataset) -> ray.data.Dataset:
    """(lib_a, lib_b, support_pair, conf_ab/ba_permille) for every
    unordered pair of libraries co-imported by >= 1 repo — association
    rules with integer permille confidence (floor), so the SQL mirror
    is hash-exact.

    Shape: pair emit inside a repo-hash co-group (per-repo lib runs are
    capped at ASSOC_RUN_CAP with a logged drop — the hub-repo guard),
    pair counts in a pair-hash co-group; per-lib supports are
    aggregate-to-small (bounded library vocabulary) and broadcast via
    ray.put.  Only narrow (lib, lib) rows shuffle."""
    import pandas as pd

    il = trips.filter(expr="pred == 'imports'") \
        .select_columns(["subj", "obj"])

    def _rb(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("subj").to_pylist(), dtype=object)
        hb = (pd.util.hash_array(s) % 64).astype(np.int32) \
            if len(s) else np.array([], np.int32)
        return batch.append_column("hb", pa.array(hb, pa.int32()))

    def _pairs_bucket(group: pa.Table) -> pa.Table:
        empty = pa.schema([("lib_a", pa.string()),
                           ("lib_b", pa.string())]).empty_table()
        if group.num_rows == 0:
            return empty
        s = np.asarray(group.column("subj").to_pylist(), dtype=object)
        o = np.asarray(group.column("obj").to_pylist(), dtype=object)
        order = np.lexsort((o, s))
        s_s, o_s = s[order], o[order]
        starts = np.flatnonzero(np.r_[True, s_s[1:] != s_s[:-1]])
        ends = np.r_[starts[1:], len(s_s)]
        a_out: list = []
        b_out: list = []
        dropped = 0
        for lo, hi in zip(starts, ends):
            libs = o_s[lo:hi]
            if len(libs) > ASSOC_RUN_CAP:
                dropped += len(libs) - ASSOC_RUN_CAP
                libs = libs[:ASSOC_RUN_CAP]
            ii, jj = np.triu_indices(len(libs), k=1)
            a_out.append(libs[ii])
            b_out.append(libs[jj])
        if dropped:
            import logging
            logging.getLogger(__name__).warning(
                "lib_associations: hub repo cap dropped %d libs", dropped)
        a = np.concatenate(a_out) if a_out else np.array([], object)
        b = np.concatenate(b_out) if b_out else np.array([], object)
        return pa.Table.from_pydict({
            "lib_a": pa.array(a, pa.string()),
            "lib_b": pa.array(b, pa.string())})

    def _pb(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("lib_a").to_pylist(), dtype=object)
        b = np.asarray(batch.column("lib_b").to_pylist(), dtype=object)
        key = np.array([x + "|" + y for x, y in zip(a, b)], dtype=object)
        hb = (pd.util.hash_array(key) % 64).astype(np.int32) \
            if len(key) else np.array([], np.int32)
        return batch.append_column("pb", pa.array(hb, pa.int32()))

    def _count_bucket(group: pa.Table) -> pa.Table:
        empty = pa.schema([("lib_a", pa.string()),
                           ("lib_b", pa.string()),
                           ("support_pair", pa.int64())]).empty_table()
        if group.num_rows == 0:
            return empty
        a = np.asarray(group.column("lib_a").to_pylist(), dtype=object)
        b = np.asarray(group.column("lib_b").to_pylist(), dtype=object)
        order = np.lexsort((b, a))
        a_s, b_s = a[order], b[order]
        new = np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]
        starts = np.flatnonzero(new)
        return pa.Table.from_pydict({
            "lib_a": pa.array(a_s[starts], pa.string()),
            "lib_b": pa.array(b_s[starts], pa.string()),
            "support_pair": pa.array(
                np.diff(np.r_[starts, len(a_s)]), pa.int64())})

    pairs = il.map_batches(_rb, batch_format="pyarrow") \
        .groupby("hb").map_groups(_pairs_bucket, batch_format="pyarrow") \
        .map_batches(_pb, batch_format="pyarrow") \
        .groupby("pb").map_groups(_count_bucket, batch_format="pyarrow")

    # per-lib supports: the LIBRARY VOCABULARY is broadcast-sized
    # (10^5-10^6 package names at world scale, ~MBs) — the groupby
    # reduce is aggregate-to-small, so the support table broadcasts
    # via ray.put instead of paying two hash_join exchanges.
    import ray as _ray
    supp_rows = il.groupby("obj").count().take_all()
    supp_ref = _ray.put({r["obj"]: r["count()"] for r in supp_rows})

    class _Conf:
        def __init__(self):
            self._supp = _ray.get(supp_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch.column("lib_a").to_pylist()
            b = batch.column("lib_b").to_pylist()
            sp = batch.column("support_pair").to_numpy(
                zero_copy_only=False)
            sa = np.array([self._supp[x] for x in a], np.int64)
            sb = np.array([self._supp[x] for x in b], np.int64)
            return pa.Table.from_pydict({
                "lib_a": batch.column("lib_a"),
                "lib_b": batch.column("lib_b"),
                "support_pair": batch.column("support_pair"),
                "conf_ab_permille": pa.array(sp * 1000 // sa, pa.int64()),
                "conf_ba_permille": pa.array(sp * 1000 // sb, pa.int64()),
            }, schema=_ASSOC_SCHEMA)

    return pairs.map_batches(_Conf, concurrency=(1, 4),
                             batch_format="pyarrow")


def lib_associations_sql(gold_sql: str) -> str:
    return f"""
WITH g AS ({gold_sql}),
il AS (SELECT DISTINCT subj, obj FROM g WHERE pred = 'imports'),
pairs AS (
  SELECT a.obj AS lib_a, b.obj AS lib_b, count(*)::BIGINT AS support_pair
  FROM il a JOIN il b ON a.subj = b.subj AND a.obj < b.obj
  GROUP BY 1, 2),
supp AS (SELECT obj AS lib, count(*)::BIGINT AS s FROM il GROUP BY obj)
SELECT p.lib_a, p.lib_b, p.support_pair,
       (p.support_pair * 1000 // sa.s)::BIGINT AS conf_ab_permille,
       (p.support_pair * 1000 // sb.s)::BIGINT AS conf_ba_permille
FROM pairs p JOIN supp sa ON sa.lib = p.lib_a
             JOIN supp sb ON sb.lib = p.lib_b
ORDER BY lib_a, lib_b
"""


# ---------------------------------------------------------------------------
# filtered negative sampling (KG-embedding training prep)
# ---------------------------------------------------------------------------

_NEG_SCHEMA = pa.schema([("subj", pa.string()), ("pred", pa.string()),
                         ("obj_neg", pa.string())])


def negative_samples(trips: ray.data.Dataset) -> ray.data.Dataset:
    """Filtered negatives for the `imports` predicate (Bordes et al.
    NeurIPS'13 TransE protocol, deterministic variant): each positive
    (s, imports, o) is corrupted to (s, imports, o') with o' the
    vocabulary entry (idx(o) + 1 + length(s) mod (V-1)) mod V — never
    o itself — and corruptions that happen to be TRUE triples are
    dropped by one left-anti hash_join on the composite (s, o') key.

    The library VOCABULARY is broadcast-sized (bounded package-name
    universe, same argument as lib_associations' support table), so it
    rides `ray.put`; everything triple-proportional stays distributed.
    """
    import ray as _ray

    il = trips.filter(expr="pred == 'imports'") \
        .select_columns(["subj", "obj"])

    vocab_rows = il.groupby("obj").count().take_all()
    vocab = np.asarray(sorted(r["obj"] for r in vocab_rows),
                       dtype=object)
    if len(vocab) < 2:
        raise ValueError("negative sampling needs >= 2 distinct objects")
    vref = _ray.put(vocab)

    class _Corrupt:
        def __init__(self):
            self._vocab = _ray.get(vref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            s = np.asarray(batch.column("subj").to_pylist(), dtype=object)
            o = np.asarray(batch.column("obj").to_pylist(), dtype=object)
            v = self._vocab
            big_v = len(v)
            idx = np.searchsorted(v, o)
            slen = np.array([len(x) for x in s], np.int64)
            neg = v[(idx + 1 + slen % (big_v - 1)) % big_v]
            key = np.array([a + "|" + b for a, b in zip(s, neg)],
                           dtype=object)
            return pa.Table.from_pydict({
                "subj": pa.array(s, pa.string()),
                "obj_neg": pa.array(neg, pa.string()),
                "nk": pa.array(key, pa.string())})

    def _pos_key(batch: pa.Table) -> pa.Table:
        s = batch.column("subj").to_pylist()
        o = batch.column("obj").to_pylist()
        return pa.Table.from_pydict({
            "nk": pa.array([a + "|" + b for a, b in zip(s, o)],
                           pa.string())})

    from nerfray.ops.joins import hash_join
    corrupted = il.map_batches(_Corrupt, concurrency=(1, 4),
                               batch_format="pyarrow")
    pos_keys = il.map_batches(_pos_key, batch_format="pyarrow")
    types = {c: pa.string() for c in ("nk", "subj", "obj_neg")}
    kept = hash_join(corrupted, pos_keys, left_on="nk", right_on="nk",
                     left_cols=["subj", "obj_neg"], right_cols=[],
                     how="left anti", field_types=types)

    def _out(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_pydict({
            "subj": batch.column("subj"),
            "pred": pa.array(["imports"] * n, pa.string()),
            "obj_neg": batch.column("obj_neg")}, schema=_NEG_SCHEMA)

    return kept.map_batches(_out, batch_format="pyarrow")


def negative_samples_sql(gold_sql: str) -> str:
    return f"""
WITH g AS ({gold_sql}),
pos AS (SELECT subj, obj FROM g WHERE pred = 'imports'),
vocab AS (SELECT obj, row_number() OVER (ORDER BY obj) - 1 AS idx
          FROM (SELECT DISTINCT obj FROM pos)),
vv AS (SELECT count(*)::BIGINT AS v FROM vocab),
corrupted AS (
  SELECT p.subj, v2.obj AS obj_neg
  FROM pos p
  JOIN vocab v1 ON v1.obj = p.obj
  CROSS JOIN vv
  JOIN vocab v2
    ON v2.idx = (v1.idx + 1 + length(p.subj) % (vv.v - 1)) % vv.v)
SELECT c.subj, 'imports' AS pred, c.obj_neg
FROM corrupted c
WHERE NOT EXISTS (SELECT 1 FROM pos
                  WHERE pos.subj = c.subj AND pos.obj = c.obj_neg)
ORDER BY subj, obj_neg
"""


# ---------------------------------------------------------------------------
# repo cards (per-repo KG summary)
# ---------------------------------------------------------------------------

_CARD_SCHEMA = pa.schema([("repo", pa.string()),
                          ("n_files", pa.int64()),
                          ("n_libs", pa.int64()),
                          ("n_syms", pa.int64()),
                          ("n_apis", pa.int64()),
                          ("n_licenses", pa.int64())])

_CARD_KINDS = ("file", "lib", "sym", "api", "lic")


def repo_cards(trips: ray.data.Dataset) -> ray.data.Dataset:
    """(repo, n_files, n_libs, n_syms, n_apis, n_licenses): exact
    distinct counts per repo — the per-entity summary a KG serving
    layer exports.  One narrow (repo, kind, item) exchange with a
    per-block distinct combiner; distincts resolved vectorized inside
    a repo-hash co-group."""
    import pandas as pd

    def _items(batch: pa.Table) -> pa.Table:
        subj = batch.column("subj").to_pylist()
        pred = batch.column("pred").to_pylist()
        obj = batch.column("obj").to_pylist()
        rows: set = set()
        for s, p, o in zip(subj, pred, obj):
            repo = subject_repo(s)
            if p == "imports":
                rows.add((repo, "lib", o))
            elif p == "defines":
                rows.add((repo, "sym", o))
                rows.add((repo, "file", s))
            elif p == "calls":
                rows.add((repo, "api", o))
                rows.add((repo, "file", s))
            elif p == "licensed-under":
                rows.add((repo, "lic", o))
        rs = sorted(rows)
        repos = np.empty(len(rs), object)
        repos[:] = [r for r, _, _ in rs]
        hb = (pd.util.hash_array(repos) % 64).astype(np.int32) \
            if len(rs) else np.array([], np.int32)
        return pa.Table.from_pydict({
            "repo": pa.array(repos, pa.string()),
            "kind": pa.array([k for _, k, _ in rs], pa.string()),
            "item": pa.array([i for _, _, i in rs], pa.string()),
            "hb": pa.array(hb, pa.int32())})

    def _cards(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _CARD_SCHEMA.empty_table()
        r = np.asarray(group.column("repo").to_pylist(), dtype=object)
        k = np.asarray(group.column("kind").to_pylist(), dtype=object)
        it = np.asarray(group.column("item").to_pylist(), dtype=object)
        order = np.lexsort((it, k, r))
        r_s, k_s, i_s = r[order], k[order], it[order]
        distinct = np.r_[True, (r_s[1:] != r_s[:-1]) | (k_s[1:] != k_s[:-1])
                         | (i_s[1:] != i_s[:-1])]
        r_d, k_d = r_s[distinct], k_s[distinct]
        repo_starts = np.flatnonzero(np.r_[True, r_d[1:] != r_d[:-1]])
        repo_ends = np.r_[repo_starts[1:], len(r_d)]
        out: dict = {"repo": r_d[repo_starts]}
        for kind, col in zip(_CARD_KINDS,
                             ("n_files", "n_libs", "n_syms",
                              "n_apis", "n_licenses")):
            is_k = (k_d == kind).astype(np.int64)
            out[col] = np.add.reduceat(is_k, repo_starts) \
                if len(r_d) else np.array([], np.int64)
            _ = repo_ends  # bounds implicit in reduceat
        return pa.Table.from_pydict(
            {c: pa.array(v, _CARD_SCHEMA.field(c).type)
             for c, v in out.items()}, schema=_CARD_SCHEMA)

    return trips.select_columns(["subj", "pred", "obj"]) \
        .map_batches(_items, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("hb").map_groups(_cards, batch_format="pyarrow")


def repo_cards_sql(gold_sql: str) -> str:
    return f"""
WITH g AS ({gold_sql}),
t AS (SELECT array_to_string(list_slice(string_split(subj, '/'), 1, 2),
                             '/') AS repo, subj, pred, obj FROM g)
SELECT repo,
  count(DISTINCT CASE WHEN pred IN ('defines', 'calls')
                      THEN subj END)::BIGINT AS n_files,
  count(DISTINCT CASE WHEN pred = 'imports' THEN obj END)::BIGINT
    AS n_libs,
  count(DISTINCT CASE WHEN pred = 'defines' THEN obj END)::BIGINT
    AS n_syms,
  count(DISTINCT CASE WHEN pred = 'calls' THEN obj END)::BIGINT
    AS n_apis,
  count(DISTINCT CASE WHEN pred = 'licensed-under' THEN obj END)::BIGINT
    AS n_licenses
FROM t GROUP BY repo ORDER BY repo
"""


# ---------------------------------------------------------------------------
# object-side secondary index + pruned reverse lookup
# ---------------------------------------------------------------------------
#
# The subject-hash layout answers "everything about subject S" in one
# bucket, but the reverse question ("which repos import library L?",
# "who uses license X?") would scan the whole store.  The classic fix is
# a SECONDARY INDEX: a small obj-hash-partitioned table of distinct
# (obj, pb) pairs mapping each object to the subject-partitions that
# contain it.  A reverse lookup then reads one index bucket (to learn
# which pb=K directories matter) and only those data partitions, with
# the obj equality pushed into both fragment scans.  The index holds
# distinct PAIRS, not triples — at 100 TB it is orders of magnitude
# smaller than a full reverse copy of the data, the usual
# index-vs-materialized-view trade.

def write_object_index(store_dir: str, idx_dir: str, *,
                       n_idx_partitions: int = 64) -> None:
    """Build the (obj, pb) secondary index from a write_by_subject_hash
    layout.  Per-block distinct keeps the exchange at pair grain;
    duplicate pairs across blocks are harmless (lookups dedup the
    partition list), so no global distinct pass is needed."""
    import pandas as pd

    store = ray.data.read_parquet(store_dir, columns=["obj", "pb"])

    def _pairs(batch: pa.Table) -> pa.Table:
        objs = np.asarray(batch.column("obj").to_pylist(), dtype=object)
        pbs = np.asarray(
            [int(v) for v in batch.column("pb").to_pylist()], np.int32)
        seen = set(zip(objs.tolist(), pbs.tolist()))
        o = np.empty(len(seen), object)
        o[:] = [p[0] for p in seen]
        k = np.asarray([p[1] for p in seen], np.int32)
        ob = (pd.util.hash_array(o) % n_idx_partitions).astype(np.int32) \
            if len(o) else np.array([], np.int32)
        return pa.Table.from_pydict({
            "obj": pa.array(o, pa.string()),
            "pb": pa.array(k, pa.int32()),
            "ob": pa.array(ob, pa.int32()),
        })

    store.map_batches(_pairs, batch_format="pyarrow",
                      zero_copy_batch=True) \
        .write_parquet(idx_dir, partition_cols=["ob"])


def lookup_object(store_dir: str, idx_dir: str, obj: str, *,
                  n_partitions: int = 64,
                  n_idx_partitions: int = 64
                  ) -> tuple[ray.data.Dataset, dict]:
    """Reverse point lookup: one index bucket -> the object's
    subject-partition list (bounded by n_partitions) -> only those
    pb=K directories, obj equality pushed down everywhere.  Returns
    (triples, stats) where stats pins how many data partitions were
    actually opened."""
    import os

    import pandas as pd
    import pyarrow.compute as pc

    arr = np.empty(1, object)
    arr[0] = obj
    # modulo on the ARRAY (scalar uint64 % int promotes to float64)
    ob = int((pd.util.hash_array(arr) % n_idx_partitions)[0])
    idx_path = os.path.join(idx_dir, f"ob={ob}")
    pbs = sorted({int(r["pb"]) for r in ray.data.read_parquet(
        idx_path, filter=pc.field("obj") == obj).take_all()})
    stats = {"partitions_read": len(pbs),
             "partitions_total": n_partitions}
    if not pbs:
        empty = pa.schema([("subj", pa.string()), ("pred", pa.string()),
                           ("obj", pa.string())])
        return ray.data.from_arrow(empty.empty_table()), stats
    paths = [os.path.join(store_dir, f"pb={k}", f)
             for k in pbs
             for f in sorted(os.listdir(
                 os.path.join(store_dir, f"pb={k}")))
             if f.endswith(".parquet")]
    res = ray.data.read_parquet(
        paths, columns=["subj", "pred", "obj"],
        filter=pc.field("obj") == obj)
    return res, stats
