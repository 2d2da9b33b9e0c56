"""Entity resolution: blocking -> pairwise match -> connected
components -> canonical id assignment.

The KG-construction step that folds alias mentions ("Lib5", "lib5",
"  Lib5\\t", the OCR-ish typo "Iib5") into one canonical entity before
triples are emitted.  Classic ER shape (Fellegi-Sunter blocking +
match, Papadakis et al. survey):

1. **Normalize** (vectorized Arrow kernels): lower + trim whitespace.
2. **Exact block**: mentions sharing a normalized name form a clique;
   only (member -> group-rep) edges are emitted, and the next stage
   runs at norm-GROUP grain — one row per distinct name, not per
   mention, so the pairwise stage never sees corpus-sized input.
3. **Typo block**: FastSS deletion-neighborhood blocking (Bocek et
   al. 2007) — a norm's keys are itself plus its len(norm) one-char
   deletions, so every edit-distance-1 pair shares a key, and an exact
   Levenshtein <= 1 verify rejects the distance-2 pairs that also
   share one (transpositions like "abc"/"acb").  Candidates per key
   bucket are run-capped like every candidate stage in this repo.
4. **Cluster**: distributed connected components (star algorithm) over
   the union of edges; canonical id = min mention id in the cluster.
5. **Assign**: mentions not in any cluster keep themselves — a
   mention-id-hash bucket co-group, never a driver-side map.

The planted mention table derives from ``documents.doc_id`` by pure
arithmetic, so the whole derivation replays as one DuckDB SQL oracle
(normalization via lower/trim, blocking via substr, match via
levenshtein(), clusters via a diameter-bounded least() join — the
planted link graph has <= 2 norm groups per component, which the
distributed CC does NOT rely on).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

N_ER_BUCKETS = 64
TYPO_BUCKET_CAP = 64   # max norm-groups per deletion-key run (guard)
MAX_DEL_POS = 64       # deletion keys only for the first 64 chars
                       # (names are short; mirrored in the SQL oracle)

_MENTION_SCHEMA = pa.schema([("mention_id", pa.int64()),
                             ("name", pa.string())])
_EDGE_SCHEMA = pa.schema([("subj", pa.string()), ("pred", pa.string()),
                          ("obj", pa.string())])
_GROUP_SCHEMA = pa.schema([("rep", pa.int64()), ("norm", pa.string()),
                           ("kind", pa.int8())])
_OUT_SCHEMA = pa.schema([("mention_id", pa.int64()),
                         ("canon_id", pa.int64())])


def _node(i: int) -> str:
    return f"m{i:012d}"  # zero-padded: min-string == min-int


def planted_mentions(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(mention_id, name) from doc_id arithmetic: base b = id//4 gets
    the alias quadruple {Lib b, lib b, padded Lib b, Iib b} for even b
    (one edit-1 typo), and a trio + unrelated singleton for odd b."""
    def _synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        s = (ids // 4).astype("U")
        b = np.char.add(s, s)  # str(b)+str(b): distinct bases >= 2 edits
        v = ids % 4
        name = np.char.add("Lib", b)
        name = np.where(v == 1, np.char.add("lib", b), name)
        name = np.where(v == 2, np.char.add(np.char.add("  Lib", b),
                                            "\t"), name)
        typo = np.where((ids // 4) % 2 == 1,
                        np.char.add(np.char.add("Pkg", b), "z"),
                        np.char.add("Iib", b))
        name = np.where(v == 3, typo, name)
        return pa.Table.from_pydict(
            {"mention_id": ids, "name": name}, schema=_MENTION_SCHEMA)

    return docs.select_columns(["doc_id"]).map_batches(
        _synth, batch_format="pyarrow", zero_copy_batch=True)


def _normalize(batch: pa.Table) -> pa.Table:
    import pandas as pd
    norm = pc.utf8_lower(pc.utf8_trim_whitespace(batch.column("name")))
    hb = pd.util.hash_array(
        np.asarray(norm.to_pylist(), dtype=object)) % N_ER_BUCKETS
    return pa.Table.from_pydict({
        "mention_id": batch.column("mention_id"),
        "norm": norm,
        "hb": pa.array(hb.astype(np.int32), pa.int32()),
    })


def _exact_groups(group: pa.Table) -> pa.Table:
    """Per norm-hash bucket: rep = min mention per distinct norm; emit
    one group row per norm (kind 0) + member->rep edge rows encoded as
    (rep=member, norm='', kind 1+rep...) — no: edges go out-of-band via
    a second output table, so this stage emits BOTH shapes in one
    schema: kind 0 = (rep, norm) group rows, kind 1 rows carry
    (member_id, rep encoded in norm) for edge building."""
    if group.num_rows == 0:
        return _GROUP_SCHEMA.empty_table()
    ids = group.column("mention_id").to_numpy(zero_copy_only=False)
    norms = np.asarray(group.column("norm").to_pylist(), dtype=object)
    order = np.lexsort((ids, norms))
    ids_s, norms_s = ids[order], norms[order]
    first = np.ones(len(ids_s), bool)
    first[1:] = norms_s[1:] != norms_s[:-1]
    starts = np.flatnonzero(first)
    reps = ids_s[starts]  # lexsort => min id first within each norm
    rep_rep = np.repeat(reps, np.diff(np.append(starts, len(ids_s))))
    members = ids_s[~first]
    groups = pa.Table.from_pydict({
        "rep": reps, "norm": norms_s[starts],
        "kind": np.zeros(len(reps), np.int8)}, schema=_GROUP_SCHEMA)
    edges = pa.Table.from_pydict({
        "rep": members,
        "norm": np.char.mod("%d", rep_rep[~first]).astype(object),
        "kind": np.ones(int((~first).sum()), np.int8)},
        schema=_GROUP_SCHEMA)
    return pa.concat_tables([groups, edges])


def _deletion_keys(batch: pa.Table) -> pa.Table:
    """Per norm group, emit (rep, norm, key) for key = norm itself plus
    each one-char deletion.  Vectorized by length class: all norms of
    length L view as an (n, L) char matrix, and deletion at position d
    is two contiguous slices — no per-string Python loop."""
    import pandas as pd
    reps = batch.column("rep").to_numpy(zero_copy_only=False)
    norms = np.asarray(batch.column("norm").to_pylist(), dtype="U")
    lens = np.char.str_len(norms)
    out_rep, out_norm, out_key = [reps], [norms], [norms]
    for L in np.unique(lens):
        if L < 1:
            continue
        sel = lens == L
        sub = np.ascontiguousarray(norms[sel].astype(f"U{L}"))
        if L == 1:
            # single-char names: the one deletion is the empty key
            # (all length-1 names are pairwise substitution distance 1)
            out_rep.append(reps[sel])
            out_norm.append(sub)
            out_key.append(np.full(len(sub), "", object))
            continue
        mat = sub.view("U1").reshape(len(sub), L)
        for d in range(min(int(L), MAX_DEL_POS)):
            key = np.empty(len(sub), f"U{L - 1}")
            kv = key.view("U1").reshape(len(sub), L - 1)
            kv[:, :d] = mat[:, :d]
            kv[:, d:] = mat[:, d + 1:]
            out_rep.append(reps[sel])
            out_norm.append(sub)
            out_key.append(key)
    rep = np.concatenate(out_rep)
    norm = np.concatenate([a.astype(object) for a in out_norm])
    key = np.concatenate([a.astype(object) for a in out_key])
    hb = pd.util.hash_array(key) % N_ER_BUCKETS
    return pa.Table.from_pydict({
        "rep": pa.array(rep, pa.int64()),
        "norm": pa.array(norm, pa.string()),
        "key": pa.array(key, pa.string()),
        "hb": pa.array(hb.astype(np.int32), pa.int32()),
    })


def _typo_pairs(group: pa.Table) -> pa.Table:
    """Per key bucket: candidate pairs among distinct norm groups
    sharing a deletion key, verified with exact Levenshtein <= 1
    (load-bearing: distance-2 transpositions share keys too)."""
    out_schema = pa.schema([("ra", pa.int64()), ("rb", pa.int64())])
    if group.num_rows == 0:
        return out_schema.empty_table()
    from nerfray.ops.dedup import _levenshtein
    reps = group.column("rep").to_numpy(zero_copy_only=False)
    norms = group.column("norm").to_pylist()
    keys = np.asarray(group.column("key").to_pylist(), dtype=object)
    order = np.argsort(keys, kind="stable")
    pairs = set()
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and keys[order[j]] == keys[order[i]]:
            j += 1
        run = order[i:min(j, i + TYPO_BUCKET_CAP)]
        for x in range(len(run)):
            for y in range(x + 1, len(run)):
                a, b = run[x], run[y]
                if norms[a] == norms[b]:
                    continue  # same group reached via two of its keys
                if _levenshtein(norms[a], norms[b], k=1) <= 1:
                    pairs.add((int(min(reps[a], reps[b])),
                               int(max(reps[a], reps[b]))))
        i = j
    ra, rb = (list(t) for t in zip(*sorted(pairs))) if pairs else ([], [])
    return pa.Table.from_pydict({
        "ra": pa.array(ra, pa.int64()), "rb": pa.array(rb, pa.int64())},
        schema=out_schema)


def _member_edge_triples(batch: pa.Table) -> pa.Table:
    kind = batch.column("kind").to_numpy(zero_copy_only=False)
    t = batch.filter(pa.array(kind == 1))
    members = t.column("rep").to_numpy(zero_copy_only=False)
    reps = [int(s) for s in t.column("norm").to_pylist()]
    return pa.Table.from_pydict({
        "subj": pa.array([_node(m) for m in members], pa.string()),
        "pred": pa.array(["alias"] * len(reps), pa.string()),
        "obj": pa.array([_node(r) for r in reps], pa.string()),
    }, schema=_EDGE_SCHEMA)


def _typo_edge_triples(batch: pa.Table) -> pa.Table:
    return pa.Table.from_pydict({
        "subj": pa.array([_node(int(a)) for a in
                          batch.column("ra").to_pylist()], pa.string()),
        "pred": pa.array(["alias"] * batch.num_rows, pa.string()),
        "obj": pa.array([_node(int(b)) for b in
                         batch.column("rb").to_pylist()], pa.string()),
    }, schema=_EDGE_SCHEMA)


def resolve_entities(mentions: ray.data.Dataset) -> ray.data.Dataset:
    """(mention_id, canon_id) for every mention."""
    from nerfray.stages.graph import connected_components

    normed = mentions.map_batches(_normalize, batch_format="pyarrow",
                                  zero_copy_batch=True)
    gro = normed.groupby("hb").map_groups(
        _exact_groups, batch_format="pyarrow").materialize()
    member_edges = gro.map_batches(_member_edge_triples,
                                   batch_format="pyarrow")
    reps_only = gro.filter(expr="kind == 0")
    typo_edges = reps_only.map_batches(
        _deletion_keys, batch_format="pyarrow") \
        .groupby("hb").map_groups(_typo_pairs, batch_format="pyarrow") \
        .map_batches(_typo_edge_triples, batch_format="pyarrow")
    comp = connected_components(member_edges.union(typo_edges))

    # assign: canon = component min where clustered, self otherwise —
    # mention-hash bucket co-group, no driver-side map
    def _comp_rows(batch: pa.Table) -> pa.Table:
        ms = [int(s[1:]) for s in batch.column("node").to_pylist()]
        cs = [int(s[1:]) for s in batch.column("component").to_pylist()]
        return pa.Table.from_pydict({
            "mention_id": pa.array(ms, pa.int64()),
            "canon_id": pa.array(cs, pa.int64())}, schema=_OUT_SCHEMA)

    def _self_rows(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("mention_id"), pa.int64())
        return pa.Table.from_pydict(
            {"mention_id": ids, "canon_id": ids}, schema=_OUT_SCHEMA)

    def _hb(batch: pa.Table) -> pa.Table:
        hb = pc.cast(pc.bit_wise_and(batch.column("mention_id"),
                                     N_ER_BUCKETS - 1), pa.int32())
        return batch.append_column("hb", hb)

    def _pick(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        ids = group.column("mention_id").to_numpy(zero_copy_only=False)
        canon = group.column("canon_id").to_numpy(zero_copy_only=False)
        clustered = ids != canon
        # rows: one self row per mention + one comp row per clustered
        # mention; keep the min canon per mention (comp row wins)
        order = np.lexsort((canon, ids))
        ids_s, canon_s = ids[order], canon[order]
        first = np.ones(len(ids_s), bool)
        first[1:] = ids_s[1:] != ids_s[:-1]
        del clustered
        return pa.Table.from_pydict({
            "mention_id": ids_s[first], "canon_id": canon_s[first]},
            schema=_OUT_SCHEMA)

    both = mentions.select_columns(["mention_id"]) \
        .map_batches(_self_rows, batch_format="pyarrow") \
        .union(comp.map_batches(_comp_rows, batch_format="pyarrow")) \
        .map_batches(_hb, batch_format="pyarrow")
    return both.groupby("hb").map_groups(_pick, batch_format="pyarrow")


_MEMO: dict[str, ray.data.Dataset] = {}


def er_planted_query(sf_dir: str) -> ray.data.Dataset:
    import os

    from nerfray.sources.parquet import read_parquet_clean
    got = _MEMO.get(sf_dir)
    if got is not None:
        return got
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id"])
    out = resolve_entities(planted_mentions(docs)).materialize()
    _MEMO[sf_dir] = out
    return out


def er_clusters_query(sf_dir: str) -> ray.data.Dataset:
    """(canon_id, n_mentions): the resolved-entity rollup."""
    return er_planted_query(sf_dir).groupby("canon_id") \
        .count().rename_columns({"count()": "n_mentions"})


_ER_MENTIONS_SQL = """
  SELECT doc_id AS mention_id,
         CASE doc_id % 4
           WHEN 0 THEN 'Lib' || s || s
           WHEN 1 THEN 'lib' || s || s
           WHEN 2 THEN '  Lib' || s || s || chr(9)
           ELSE CASE WHEN (doc_id // 4) % 2 = 1
                     THEN 'Pkg' || s || s || 'z'
                     ELSE 'Iib' || s || s END
         END AS name
  FROM (SELECT doc_id, CAST(doc_id // 4 AS VARCHAR) AS s
        FROM documents)
"""

# full derivation replay: normalize -> exact groups -> deletion-
# neighborhood typo links (levenshtein <= 1, load-bearing) -> canon via
# least() over the linked reps (exact because the planted link graph
# has <= 2 norm groups per component; the Ray-side CC handles
# arbitrary diameter)
ER_PLANTED_SQL = f"""
WITH m AS ({_ER_MENTIONS_SQL}),
n AS (SELECT mention_id,
             lower(trim(name, ' ' || chr(9))) AS norm FROM m),
g AS (SELECT norm, min(mention_id) AS rep FROM n GROUP BY norm),
pos AS (SELECT unnest(range(1, {MAX_DEL_POS + 1})) AS i),
keys AS (
  SELECT norm, rep, norm AS key FROM g
  UNION ALL
  SELECT norm, rep,
         substr(norm, 1, i - 1) || substr(norm, i + 1) AS key
  FROM g JOIN pos ON pos.i <= length(norm)),
links AS (
  SELECT DISTINCT least(a.rep, b.rep) AS ra,
                  greatest(a.rep, b.rep) AS rb
  FROM keys a JOIN keys b ON a.key = b.key AND a.norm < b.norm
  WHERE levenshtein(a.norm, b.norm) <= 1),
canon_rep AS (
  SELECT g.rep, least(g.rep, coalesce(min(l.ra), g.rep)) AS canon
  FROM g LEFT JOIN links l ON l.rb = g.rep GROUP BY g.rep)
SELECT n.mention_id, cr.canon AS canon_id
FROM n JOIN g ON g.norm = n.norm JOIN canon_rep cr ON cr.rep = g.rep
ORDER BY mention_id
"""

ER_CLUSTERS_SQL = f"""
WITH resolved AS ({ER_PLANTED_SQL.replace("ORDER BY mention_id", "")})
SELECT canon_id, count(*)::BIGINT AS n_mentions
FROM resolved GROUP BY canon_id ORDER BY canon_id
"""


# ---------------------------------------------------------------------------
# canonicalized usage rollup: entity linking applied to a statement
# stream
# ---------------------------------------------------------------------------
#
# The step AFTER resolution: raw statements reference mention ids; the
# canonical KG wants them keyed by resolved entity, with duplicate
# evidence collapsed.  Planted statements say mention m is used in doc
# (m*3) % n_docs, so distinct mentions of one entity can hit the SAME
# doc — the rollup is count(DISTINCT doc), not mention count.  Shape:
# ONE mention-grain hash_join (statements x canonical map, both
# corpus-grain) + ONE canon-hash co-group that dedups (canon, doc)
# pairs with a lexsort/first-mask sweep.  Nothing entity-proportional
# reaches the driver.

_USAGE_SCHEMA = pa.schema([("canon_id", pa.int64()),
                           ("n_docs", pa.int64())])


def _canon_usage_group(group: pa.Table) -> pa.Table:
    if group.num_rows == 0:
        return _USAGE_SCHEMA.empty_table()
    canon = group.column("canon_id").to_numpy(zero_copy_only=False)
    doc = group.column("doc").to_numpy(zero_copy_only=False)
    order = np.lexsort((doc, canon))
    c_s, d_s = canon[order], doc[order]
    new_pair = np.ones(len(c_s), bool)
    new_pair[1:] = (c_s[1:] != c_s[:-1]) | (d_s[1:] != d_s[:-1])
    c_u = c_s[new_pair]
    new_canon = np.ones(len(c_u), bool)
    new_canon[1:] = c_u[1:] != c_u[:-1]
    starts = np.flatnonzero(new_canon)
    counts = np.diff(np.append(starts, len(c_u)))
    return pa.Table.from_pydict(
        {"canon_id": c_u[starts], "n_docs": counts.astype(np.int64)},
        schema=_USAGE_SCHEMA)


def canonical_usage_query(sf_dir: str) -> ray.data.Dataset:
    """(canon_id, n_docs): distinct docs using each RESOLVED entity."""
    import os

    from nerfray.ops.joins import hash_join
    from nerfray.sources.parquet import read_parquet_clean

    n_docs = _n_docs(sf_dir)
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id"])

    def _stmts(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"mention_id": ids, "doc": (ids * 3) % n_docs},
            schema=pa.schema([("mention_id", pa.int64()),
                              ("doc", pa.int64())]))

    stmts = docs.map_batches(_stmts, batch_format="pyarrow",
                             zero_copy_batch=True)
    types = {c: pa.int64() for c in ("mention_id", "doc", "canon_id")}
    joined = hash_join(
        stmts, er_planted_query(sf_dir),
        left_on="mention_id", right_on="mention_id",
        left_cols=["doc"], right_cols=["canon_id"], field_types=types)

    def _hb(batch: pa.Table) -> pa.Table:
        hb = pc.cast(pc.bit_wise_and(batch.column("canon_id"),
                                     N_ER_BUCKETS - 1), pa.int32())
        return pa.Table.from_pydict({
            "canon_id": batch.column("canon_id"),
            "doc": batch.column("doc"), "hb": hb})

    return joined.map_batches(_hb, batch_format="pyarrow") \
        .groupby("hb").map_groups(_canon_usage_group,
                                  batch_format="pyarrow")


def _n_docs(sf_dir: str) -> int:
    import os

    import pyarrow.parquet as _pq
    return _pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows


CANONICAL_USAGE_SQL = f"""
WITH resolved AS ({ER_PLANTED_SQL.replace("ORDER BY mention_id", "")}),
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
stmts AS (SELECT doc_id AS mention_id, (doc_id * 3) % nn.n AS doc
          FROM documents, nn)
SELECT r.canon_id, count(DISTINCT s.doc)::BIGINT AS n_docs
FROM stmts s JOIN resolved r ON r.mention_id = s.mention_id
GROUP BY r.canon_id ORDER BY canon_id
"""


# ---------------------------------------------------------------------------
# truth discovery: majority-vote fusion of conflicting claims
# ---------------------------------------------------------------------------
#
# Data-fusion step for functional predicates (Dong & Naumann VLDB'09
# tutorial shape, vote baseline): several sources claim an object for
# the same (subject, predicate); keep the majority object, ties broken
# by min object.  Planted claims: doc d claims subject d//5 has object
# subj*10 + (1 if d%5==4 else 0) — a 4:1 split per subject, plus every
# 7th subject gets a 2-way near-tie to exercise the tie-break.  ONE
# subject-hash co-group; in-group votes via lexsort + reduceat.

_FUSED_SCHEMA = pa.schema([("subj", pa.int64()), ("obj", pa.int64()),
                           ("votes", pa.int64())])


def _fuse_group(group: pa.Table) -> pa.Table:
    if group.num_rows == 0:
        return _FUSED_SCHEMA.empty_table()
    subj = group.column("subj").to_numpy(zero_copy_only=False)
    obj = group.column("obj").to_numpy(zero_copy_only=False)
    order = np.lexsort((obj, subj))
    s_s, o_s = subj[order], obj[order]
    new_pair = np.ones(len(s_s), bool)
    new_pair[1:] = (s_s[1:] != s_s[:-1]) | (o_s[1:] != o_s[:-1])
    starts = np.flatnonzero(new_pair)
    votes = np.diff(np.append(starts, len(s_s))).astype(np.int64)
    s_u, o_u = s_s[starts], o_s[starts]
    # winner per subject: order candidates by (subj, -votes, obj) and
    # keep the first row per subject — max votes, min-obj tie-break
    order2 = np.lexsort((o_u, -votes, s_u))
    s2, o2, v2 = s_u[order2], o_u[order2], votes[order2]
    win = np.ones(len(s2), bool)
    win[1:] = s2[1:] != s2[:-1]
    return pa.Table.from_pydict(
        {"subj": s2[win], "obj": o2[win], "votes": v2[win]},
        schema=_FUSED_SCHEMA)


def fused_facts_query(sf_dir: str) -> ray.data.Dataset:
    """Majority-vote object per subject over planted conflicting
    claims; returns (subj, obj, votes) for the winning claim."""
    import os

    from nerfray.sources.parquet import read_parquet_clean
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id"])

    def _claims(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        subj = d // 5
        noise = (d % 5 == 4).astype(np.int64)
        tie = (subj % 7 == 0) & (d % 5 >= 3)  # 3:2 split -> still maj,
        obj = subj * 10 + np.where(tie, 2, noise)  # but a 2nd candidate
        hb = (subj & (N_ER_BUCKETS - 1)).astype(np.int32)
        return pa.Table.from_pydict(
            {"subj": subj, "obj": obj, "hb": hb},
            schema=pa.schema([("subj", pa.int64()), ("obj", pa.int64()),
                              ("hb", pa.int32())]))

    return docs.map_batches(_claims, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("hb").map_groups(_fuse_group, batch_format="pyarrow")


FUSED_FACTS_SQL = """
WITH claims AS (
  SELECT doc_id // 5 AS subj,
         (doc_id // 5) * 10 +
         CASE WHEN (doc_id // 5) % 7 = 0 AND doc_id % 5 >= 3 THEN 2
              WHEN doc_id % 5 = 4 THEN 1 ELSE 0 END AS obj
  FROM documents),
votes AS (SELECT subj, obj, count(*)::BIGINT AS votes
          FROM claims GROUP BY subj, obj),
ranked AS (SELECT subj, obj, votes,
                  row_number() OVER (PARTITION BY subj
                                     ORDER BY votes DESC, obj) AS rn
           FROM votes)
SELECT subj, obj, votes FROM ranked WHERE rn = 1 ORDER BY subj
"""
