"""Similarity search over the ``embeddings`` table (vec_id, embedding
list<float>, label).

- brute-force cosine top-k vs a broadcast query matrix: one numpy matmul
  per batch (the exact baseline; SQL-oracled by rank).
- LSH-bucketed ANN: random-hyperplane signatures partition vectors into
  buckets; queries probe only their own bucket (the scale path —
  candidate set shrinks by ~2^bits); recall vs brute force is measured,
  not assumed.
- n-gram Jaccard similarity of documents vs broadcast query docs (exact,
  SQL-oracled).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

N_QUERIES = 5  # query vectors = embeddings with vec_id < N_QUERIES


def _query_matrix(emb: ray.data.Dataset, n_queries: int,
                  source_path: str | None = None) -> np.ndarray:
    """The broadcast-side query matrix (n_queries rows).  When the
    embeddings table's parquet path is known (``source_path``), read
    the few query rows directly via pyarrow row-filtered scan — a Ray
    filter+take_all job over the whole table costs ~2 s of scheduling
    fixed overhead for a 5-row result (cf.
    ``sources.parquet.read_small_table``).  The Dataset scan remains
    the fallback for in-memory inputs."""
    if source_path is not None:
        import pyarrow.parquet as pq
        t = pq.read_table(source_path, columns=["vec_id", "embedding"],
                          filters=[("vec_id", "<", n_queries)])
        order = np.argsort(t.column("vec_id").to_numpy(
            zero_copy_only=False), kind="stable")
        vecs = t.column("embedding").to_pylist()
        return np.array([vecs[i] for i in order], dtype=np.float64)
    rows = emb.filter(expr=f"vec_id < {n_queries}").take_all()
    rows.sort(key=lambda r: r["vec_id"])
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


class CosineScores:
    """Batch matmul against the broadcast query matrix; emits per-batch
    LOCAL top-k per query (the combiner: k rows per query per batch cross
    the wire, never the full score matrix)."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref) \
            if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.q = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.array(batch.column("embedding").to_pylist(),
                        dtype=np.float64)
        vec_ids = np.asarray(batch.column("vec_id").to_pylist(),
                             dtype=np.int64)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        scores = self.q @ vecs.T  # (n_queries, batch)
        qs, vs, ss = [], [], []
        k = min(self.k, scores.shape[1])
        for qi in range(scores.shape[0]):
            row = scores[qi]
            # deterministic order: score desc, vec_id asc
            idx = np.lexsort((vec_ids, -row))[:k]
            qs.extend([qi] * len(idx))
            vs.extend(vec_ids[idx].tolist())
            ss.extend(row[idx].tolist())
        return pa.Table.from_pydict({
            "query_id": pa.array(qs, pa.int64()),
            "vec_id": pa.array(vs, pa.int64()),
            "score": pa.array(ss, pa.float64()),
        })


def _final_topk(group: pa.Table, *, k: int) -> pa.Table:
    ids = np.asarray(group.column("vec_id").to_pylist(), dtype=np.int64)
    scores = np.asarray(group.column("score").to_pylist(), dtype=np.float64)
    idx = np.lexsort((ids, -scores))[:k]
    n = len(idx)
    return pa.Table.from_pydict({
        "query_id": pa.array(group.column("query_id").to_pylist()[:1] * n,
                             pa.int64()),
        "rank": pa.array(np.arange(1, n + 1), pa.int64()),
        "vec_id": pa.array(ids[idx], pa.int64()),
    })


def cosine_topk(emb: ray.data.Dataset, *, k: int = 10,
                n_queries: int = N_QUERIES,
                source_path: str | None = None) -> ray.data.Dataset:
    """Exact top-k neighbours per query: (query_id, rank, vec_id)."""
    q_ref = ray.put(_query_matrix(emb, n_queries, source_path))
    partials = emb.select_columns(["vec_id", "embedding"]).map_batches(
        CosineScores, fn_constructor_kwargs={"queries_ref": q_ref, "k": k},
        concurrency=(1, 8), batch_size=1024, batch_format="pyarrow")
    return partials.groupby("query_id").map_groups(
        _final_topk, fn_kwargs={"k": k}, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (random hyperplanes)
# ---------------------------------------------------------------------------


class HyperplaneSigner:
    def __init__(self, dim: int | None = None, bits: int = 8, seed: int = 11):
        self._dim = dim
        self._bits = bits
        self._seed = seed
        self.planes = None if dim is None else self._mk(dim)

    def _mk(self, dim: int) -> np.ndarray:
        return np.random.default_rng(self._seed).standard_normal(
            (self._bits, dim))

    def sign(self, vecs: np.ndarray) -> np.ndarray:
        if self.planes is None or self.planes.shape[1] != vecs.shape[1]:
            self.planes = self._mk(vecs.shape[1])  # dim inferred from data
        bits = (vecs @ self.planes.T) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.array(batch.column("embedding").to_pylist(),
                        dtype=np.float64)
        sig = self.sign(vecs)
        return batch.append_column("bucket",
                                   pa.array(sig.astype(np.int64), pa.int64()))


def lsh_topk(emb: ray.data.Dataset, *, k: int = 10, bits: int = 6,
             n_queries: int = N_QUERIES,
             source_path: str | None = None) -> ray.data.Dataset:
    """ANN: probe only the query's hyperplane bucket. Returns
    (query_id, rank, vec_id); recall vs ``cosine_topk`` is measured in
    tests, not assumed."""
    signer = HyperplaneSigner(bits=bits)
    q = _query_matrix(emb, n_queries, source_path)
    q_buckets = signer.sign(q)
    q_ref = ray.put(q)

    bucketed = emb.select_columns(["vec_id", "embedding"]).map_batches(
        HyperplaneSigner, fn_constructor_kwargs={"bits": bits},
        concurrency=(1, 4), batch_size=1024, batch_format="pyarrow")
    wanted = pa.array(sorted(set(int(b) for b in q_buckets)), pa.int64())

    def _probe_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.compute.is_in(batch.column("bucket"),
                                             value_set=wanted))

    candidates = bucketed.map_batches(_probe_only, batch_format="pyarrow",
                                      zero_copy_batch=True)

    class BucketScores(CosineScores):
        def __init__(self, queries_ref, k):
            super().__init__(queries_ref, k)
            self.q_buckets = q_buckets

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = []
            for qi in range(len(self.q_buckets)):
                sub = batch.filter(
                    pa.compute.equal(batch.column("bucket"),
                                     int(self.q_buckets[qi])))
                if len(sub) == 0:
                    continue
                vecs = np.array(sub.column("embedding").to_pylist(),
                                dtype=np.float64)
                ids = np.asarray(sub.column("vec_id").to_pylist(),
                                 dtype=np.int64)
                vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
                row = self.q[qi] @ vecs.T
                idx = np.lexsort((ids, -row))[:self.k]
                out.append(pa.Table.from_pydict({
                    "query_id": pa.array([qi] * len(idx), pa.int64()),
                    "vec_id": pa.array(ids[idx], pa.int64()),
                    "score": pa.array(row[idx], pa.float64()),
                }))
            if not out:
                return pa.Table.from_pydict({
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                })
            return pa.concat_tables(out)

    partials = candidates.map_batches(
        BucketScores, fn_constructor_kwargs={"queries_ref": q_ref, "k": k},
        concurrency=(1, 4), batch_size=2048, batch_format="pyarrow")
    return partials.groupby("query_id").map_groups(
        _final_topk, fn_kwargs={"k": k}, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF ANN: k-means coarse quantizer, probe n nearest inverted lists
# ---------------------------------------------------------------------------


def _kmeans(sample: np.ndarray, k: int, iters: int = 10,
            seed: int = 13) -> np.ndarray:
    """Seeded spherical k-means (deterministic; driver-side on a sample)."""
    rng = np.random.default_rng(seed)
    x = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return cents


def ivf_topk(emb: ray.data.Dataset, *, k: int = 10, n_lists: int = 16,
             n_probe: int = 4, sample_size: int = 2048,
             n_queries: int = N_QUERIES,
             source_path: str | None = None) -> ray.data.Dataset:
    """IVF scale path: vectors are assigned to their nearest of
    ``n_lists`` k-means centroids (trained on a driver-side sample,
    broadcast once); each query scores only the vectors in its
    ``n_probe`` nearest lists. Returns (query_id, rank, vec_id)."""
    sample_rows = emb.select_columns(["embedding"]).limit(sample_size) \
        .take_all()
    cents = _kmeans(np.array([r["embedding"] for r in sample_rows],
                             dtype=np.float64), n_lists)
    q = _query_matrix(emb, n_queries, source_path)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    probes = np.argsort(-(qn @ cents.T), axis=1)[:, :n_probe]
    wanted_lists = sorted({int(c) for row in probes for c in row})
    cents_ref = ray.put(cents)
    q_ref = ray.put(q)

    class IvfScores:
        def __init__(self):
            self.cents = ray.get(cents_ref)
            qm = ray.get(q_ref)
            self.q = qm / np.linalg.norm(qm, axis=1, keepdims=True)
            self.probes = probes
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = np.array(batch.column("embedding").to_pylist(),
                            dtype=np.float64)
            ids = np.asarray(batch.column("vec_id").to_pylist(),
                             dtype=np.int64)
            vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
            assign = np.argmax(vn @ self.cents.T, axis=1)
            keep = np.isin(assign, wanted_lists)
            vn, ids, assign = vn[keep], ids[keep], assign[keep]
            out = []
            for qi in range(len(self.q)):
                mask = np.isin(assign, self.probes[qi])
                if not mask.any():
                    continue
                row = self.q[qi] @ vn[mask].T
                sub_ids = ids[mask]
                idx = np.lexsort((sub_ids, -row))[:self.k]
                out.append(pa.Table.from_pydict({
                    "query_id": pa.array([qi] * len(idx), pa.int64()),
                    "vec_id": pa.array(sub_ids[idx], pa.int64()),
                    "score": pa.array(row[idx], pa.float64()),
                }))
            if not out:
                return pa.Table.from_pydict({
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                })
            return pa.concat_tables(out)

    partials = emb.select_columns(["vec_id", "embedding"]).map_batches(
        IvfScores, concurrency=(1, 4), batch_size=2048,
        batch_format="pyarrow")
    return partials.groupby("query_id").map_groups(
        _final_topk, fn_kwargs={"k": k}, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs (LSH candidates + exact verify)
# ---------------------------------------------------------------------------


def embedding_dup_pairs(emb: ray.data.Dataset, *, threshold: float = 0.95,
                        bits: int = 6, n_tables: int = 4
                        ) -> ray.data.Dataset:
    """Near-duplicate vector pairs: multi-table hyperplane LSH generates
    candidates (vectors sharing a bucket in ANY table), exact cosine
    verifies. Only (bucket, vec_id) pairs shuffle; vectors for the verify
    stage ride along inside the bucket groups."""
    signers = [HyperplaneSigner(bits=bits, seed=11 + t)
               for t in range(n_tables)]

    def _bucketize(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch.column("embedding").to_pylist(),
                        dtype=np.float64)
        ids = batch.column("vec_id").to_pylist()
        out_t, out_b, out_i, out_v = [], [], [], []
        for t, s in enumerate(signers):
            sig = s.sign(vecs)
            out_t.extend([t] * len(ids))
            out_b.extend(int(x) for x in sig)
            out_i.extend(ids)
            out_v.extend(vecs.tolist())
        return pa.Table.from_pydict({
            "table": pa.array(out_t, pa.int32()),
            "bucket": pa.array(out_b, pa.int64()),
            "vec_id": pa.array(out_i, pa.int64()),
            "embedding": pa.array(out_v, pa.list_(pa.float64())),
        })

    def _bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_pylist()
        vecs = np.array(group.column("embedding").to_pylist(),
                        dtype=np.float64)
        order = np.argsort(ids)
        ids = [ids[i] for i in order]
        vecs = vecs[order]
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = vecs @ vecs.T
        a, b, s = [], [], []
        cap = 500  # degenerate-bucket guard (recall loss if hit)
        if len(ids) > cap:
            import logging
            logging.getLogger(__name__).warning(
                "embedding LSH bucket overflow: %d ids, dropping %d "
                "beyond cap=%d", len(ids), len(ids) - cap, cap)
        for i in range(min(len(ids), cap)):
            for j in range(i + 1, min(len(ids), cap)):
                if ids[i] != ids[j] and sims[i, j] >= threshold:
                    a.append(ids[i])
                    b.append(ids[j])
                    s.append(float(sims[i, j]))
        return pa.Table.from_pydict({
            "vec_a": pa.array(a, pa.int64()),
            "vec_b": pa.array(b, pa.int64()),
            "cosine": pa.array(s, pa.float64()),
        })

    bucketed = emb.select_columns(["vec_id", "embedding"]).map_batches(
        _bucketize, batch_format="pyarrow")
    pairs = bucketed.groupby(["table", "bucket"]).map_groups(
        _bucket_pairs, batch_format="pyarrow")
    # a pair can surface from several tables: keep max-cosine once
    return pairs.groupby(["vec_a", "vec_b"]).max("cosine") \
        .rename_columns({"max(cosine)": "cosine"})


# ---------------------------------------------------------------------------
# planted-structure embeddings: SQL-oracled end-to-end ANN / near-dup
# ---------------------------------------------------------------------------
#
# Every vector in a planted group is BYTE-IDENTICAL (the group's seeded
# random SIGN PATTERN, entries +-1/8 over 64 dims), so any LSH table /
# IVF list co-locates the whole group with certainty — recall of the
# planted structure is guaranteed by construction, not probability.
# The +-1/8 design makes every inner product EXACT-DYADIC (partial sums
# are integer multiples of 1/64 <= 64, exact in float64 under ANY
# summation order, so BLAS blocking / batch boundaries cannot perturb
# ties), the norm exactly 1.0 (normalization is a no-op), within-group
# scores exactly 1.0, and cross-group cosine (64 - 2*hamming)/64 <=
# 0.9375 < the 0.95 threshold whenever sign patterns differ in >= 2
# positions (pinned by pytest).  Rank order is therefore the
# deterministic vec_id tie-break and the output (no float columns) is
# pure id arithmetic for DuckDB.

PLANTED_DIM = 64
PLANTED_TOPK_GROUPS = 50  # group = vec_id % 50; queries (vec_id < 5) hit groups 0..4


def _planted_direction(g: int) -> np.ndarray:
    bits = np.random.default_rng(1000 + g).integers(0, 2, PLANTED_DIM)
    return (bits * 2 - 1) / 8.0


def planted_group_embeddings(emb: ray.data.Dataset, *,
                             mode: str) -> ray.data.Dataset:
    """mode 'pairs': group = vec_id // 2 (near-dup pairs);
    mode 'mod': group = vec_id % PLANTED_TOPK_GROUPS (top-k groups)."""

    def _synth(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        gs = ids // 2 if mode == "pairs" else ids % PLANTED_TOPK_GROUPS
        vecs = np.empty((len(ids), PLANTED_DIM), dtype=np.float64)
        for g in np.unique(gs).tolist():
            vecs[gs == g] = _planted_direction(g)
        return pa.Table.from_pydict({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
        })

    return emb.select_columns(["vec_id"]).map_batches(
        _synth, batch_format="pyarrow", zero_copy_batch=True)


# expected verified near-dup pairs: exactly the (2k, 2k+1) planted pairs
EMBEDDING_PLANTED_SQL = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
WHERE a.vec_id % 2 = 0 ORDER BY vec_a
"""

# expected ANN top-10 per query group: the 10 smallest vec_ids sharing
# the query's direction (ties broken by vec_id — scores are exactly
# equal doubles within a group)
TOPK_PLANTED_SQL = f"""
WITH m AS (
  SELECT (vec_id % {PLANTED_TOPK_GROUPS})::BIGINT AS query_id, vec_id,
         row_number() OVER (PARTITION BY vec_id % {PLANTED_TOPK_GROUPS}
                            ORDER BY vec_id) AS rank
  FROM embeddings WHERE vec_id % {PLANTED_TOPK_GROUPS} < {N_QUERIES})
SELECT query_id, rank::BIGINT AS rank, vec_id
FROM m WHERE rank <= 10 ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard of documents vs broadcast query docs (SQL-oracled)
# ---------------------------------------------------------------------------


class JaccardVsQueries:
    """Word-set Jaccard of every doc against the broadcast query docs.
    Counts are ints; jaccard is a single division — bit-identical to the
    DuckDB mirror.  Vectorized per batch (the r3 shape ran Python set
    ops per doc x query): one Arrow split + factorize gives the
    distinct (doc, word) pairs; per query, a sorted-array membership
    mask and two bincounts yield all intersections at once."""

    _SCHEMA = pa.schema([
        ("doc_id", pa.int64()), ("query_doc", pa.int64()),
        ("n_common", pa.int64()), ("n_union", pa.int64()),
        ("jaccard", pa.float64())])

    def __init__(self, queries_ref):
        qs = ray.get(queries_ref) \
            if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.queries = [
            (qid, np.sort(np.array(sorted(set(t.split(" "))),
                                   dtype=object)))
            for qid, t in qs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd
        n_docs = batch.num_rows
        if n_docs == 0:
            return self._SCHEMA.empty_table()
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        wl = pc.split_pattern(col, " ")
        parent = pc.list_parent_indices(wl).to_numpy(
            zero_copy_only=False)
        wcode, wvals = pd.factorize(wl.flatten().to_pandas())
        key = parent.astype(np.int64) * len(wvals) + wcode
        uk = np.unique(key)
        up = uk // len(wvals)
        uwc = uk % len(wvals)
        nset = np.bincount(up, minlength=n_docs).astype(np.int64)
        wv = np.asarray(wvals, dtype=object)
        out_d, out_q, out_i, out_u = [], [], [], []
        for qid, qarr in self.queries:
            if len(qarr) and len(wv):
                pos = np.searchsorted(qarr, wv)
                pos[pos >= len(qarr)] = 0
                member = (qarr[pos] == wv)[uwc]
                inter = np.bincount(up, weights=member,
                                    minlength=n_docs).astype(np.int64)
            else:
                inter = np.zeros(n_docs, np.int64)
            out_d.append(doc_ids)
            out_q.append(np.full(n_docs, qid, np.int64))
            out_i.append(inter)
            out_u.append(nset + len(qarr) - inter)
        inters = np.concatenate(out_i)
        unions = np.concatenate(out_u)
        return pa.Table.from_pydict({
            "doc_id": np.concatenate(out_d),
            "query_doc": np.concatenate(out_q),
            "n_common": inters,
            "n_union": unions,
            "jaccard": np.where(unions > 0, inters / unions, 0.0),
        }, schema=self._SCHEMA)


def jaccard_vs_queries(docs: ray.data.Dataset,
                       n_queries: int = 3) -> ray.data.Dataset:
    def _qpick(batch: pa.Table) -> pa.Table:
        # filter + project in ONE map (the fused Filter->Project pair
        # passes empty bundles through unprojected -> mixed-schema
        # RefBundle warning)
        import pyarrow.compute as pc
        return batch.filter(
            pc.less(batch.column("doc_id"),
                    pa.scalar(n_queries))).select(["doc_id", "text"])

    qrows = docs.map_batches(_qpick, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    q_ref = ray.put([(r["doc_id"], r["text"]) for r in qrows])
    return docs.select_columns(["doc_id", "text"]).map_batches(
        JaccardVsQueries, fn_constructor_kwargs={"queries_ref": q_ref},
        concurrency=(1, 4), batch_size=512, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# kNN graph construction (every vector's top-k neighbors)
# ---------------------------------------------------------------------------
#
# The all-vectors companion of the query-side ANN ops: semantic-dedup,
# graph-based diversity sampling and cluster labeling all start from a
# kNN graph.  Exact all-pairs is O(n^2); the scale path is the IVF
# shape inverted — vectors co-locate into their ``n_assign`` nearest
# centroid lists (ONE list-hash exchange of (id, vector)), each list
# computes its members' pairwise-cosine top-k with one matmul, and a
# second tiny vec-hash co-group merges each vector's per-list partials
# into its global top-k.  Neighbors are missed only when a true
# neighbor shares none of the vector's n_assign lists (multi-probe
# assignment is exactly the standard mitigation); recall is pinned by
# a planted-cluster pytest.  List sizes are data-distribution bounded
# (~n*n_assign/n_lists); a hot list would be split by the same
# range-split pattern as the keyed event ops (documented, not needed
# on the synthetic corpora).

def knn_graph(emb: ray.data.Dataset, *, k: int = 5, n_lists: int = 16,
              n_assign: int = 2, sample_size: int = 2048
              ) -> ray.data.Dataset:
    """(vec_id, rank, nbr_id, score): each vector's approximate top-k
    cosine neighbors (self excluded), rank 1..k by (-score, nbr_id)."""
    sample_rows = emb.select_columns(["embedding"]).limit(sample_size) \
        .take_all()
    cents = _kmeans(np.array([r["embedding"] for r in sample_rows],
                             dtype=np.float64), n_lists)
    cents_ref = ray.put(cents)

    def _assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        vecs = np.array(batch.column("embedding").to_pylist(),
                        dtype=np.float64)
        ids = np.asarray(batch.column("vec_id").to_pylist(),
                         dtype=np.int64)
        if not len(ids):
            return pa.schema([("vec_id", pa.int64()),
                              ("embedding",
                               pa.list_(pa.float64())),
                              ("lst", pa.int32())]).empty_table()
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        lists = np.argsort(-(vn @ c.T), axis=1)[:, :n_assign]
        rep_ids = np.repeat(ids, n_assign)
        rep_vecs = np.repeat(vn, n_assign, axis=0)
        return pa.Table.from_pydict({
            "vec_id": pa.array(rep_ids, pa.int64()),
            "embedding": pa.array(rep_vecs.tolist(),
                                  pa.list_(pa.float64())),
            "lst": pa.array(lists.ravel().astype(np.int32),
                            pa.int32()),
        })

    def _list_knn(group: pa.Table) -> pa.Table:
        out_schema = pa.schema([("vec_id", pa.int64()),
                                ("nbr_id", pa.int64()),
                                ("score", pa.float64()),
                                ("hb", pa.int32())])
        if group.num_rows < 2:
            return out_schema.empty_table()
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        vn = np.array(group.column("embedding").to_pylist(),
                      dtype=np.float64)
        s = vn @ vn.T
        np.fill_diagonal(s, -np.inf)
        kk = min(k, len(ids) - 1)
        # per-row top-kk by (-score, nbr_id)
        ord2 = np.lexsort((ids[None, :].repeat(len(ids), 0), -s),
                          axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(ids)), kk)
        cols = ord2.ravel()
        keep = np.isfinite(s[rows, cols])
        va, nb = ids[rows[keep]], ids[cols[keep]]
        return pa.Table.from_pydict({
            "vec_id": pa.array(va, pa.int64()),
            "nbr_id": pa.array(nb, pa.int64()),
            "score": pa.array(s[rows[keep], cols[keep]], pa.float64()),
            "hb": pa.array((va % 64).astype(np.int32), pa.int32()),
        }, schema=out_schema)

    def _merge_topk(group: pa.Table) -> pa.Table:
        out_schema = pa.schema([("vec_id", pa.int64()),
                                ("rank", pa.int64()),
                                ("nbr_id", pa.int64()),
                                ("score", pa.float64())])
        if group.num_rows == 0:
            return out_schema.empty_table()
        v = group.column("vec_id").to_numpy(zero_copy_only=False)
        nb = group.column("nbr_id").to_numpy(zero_copy_only=False)
        sc = group.column("score").to_numpy(zero_copy_only=False)
        order = np.lexsort((nb, -sc, v))
        v, nb, sc = v[order], nb[order], sc[order]
        # drop duplicate (vec, nbr) pairs from shared lists
        first = np.r_[True, (v[1:] != v[:-1]) | (nb[1:] != nb[:-1])]
        v, nb, sc = v[first], nb[first], sc[first]
        starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
        run = np.cumsum(np.r_[False, v[1:] != v[:-1]])
        pos = np.arange(len(v)) - starts[run]
        keep = pos < k
        return pa.Table.from_pydict({
            "vec_id": pa.array(v[keep], pa.int64()),
            "rank": pa.array(pos[keep] + 1, pa.int64()),
            "nbr_id": pa.array(nb[keep], pa.int64()),
            "score": pa.array(sc[keep], pa.float64()),
        }, schema=out_schema)

    return emb.select_columns(["vec_id", "embedding"]) \
        .map_batches(_assign, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("lst").map_groups(_list_knn, batch_format="pyarrow") \
        .groupby("hb").map_groups(_merge_topk, batch_format="pyarrow")


def sim_knn_graph(sf_dir: str) -> ray.data.Dataset:
    """kNN graph over the embeddings table (rows-only: float scores;
    recall pinned by the planted-cluster pytest)."""
    import os

    from nerfray.sources.parquet import read_parquet_clean
    return knn_graph(read_parquet_clean(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"]))
