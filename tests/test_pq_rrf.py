"""Product-quantization ANN (ops/pq.py) and RRF hybrid retrieval
(ops/retrieval.hybrid_rrf_topk)."""

import duckdb
import numpy as np
import pyarrow as pa

from nerfray.ops import pq as pqm
from nerfray.ops import retrieval as rt


def _emb_ds(vecs):
    import ray.data
    return ray.data.from_arrow(pa.Table.from_pydict({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64())),
    }))


def _docs_ds(texts):
    import ray.data
    return ray.data.from_arrow(pa.Table.from_pydict({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def _group_vecs(n, groups, dim=16, seed=7):
    """n unit vectors in `groups` distinct random directions
    (vec i -> direction i % groups)."""
    rng = np.random.default_rng(seed)
    dirs = rng.standard_normal((groups, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return dirs[np.arange(n) % groups]


# -- PQ ----------------------------------------------------------------------


def test_pq_encode_exact_when_patterns_fit(ray_session):
    # 6 distinct directions, ksub=8 >= 6 per-subspace patterns ->
    # every pattern is its own centroid; decode == normalized input
    vecs = _group_vecs(30, 6, dim=16)
    books = pqm.train_pq_codebooks(vecs, m_sub=4, ksub=8)
    codes = pqm.pq_encode(vecs, books)
    decoded = np.concatenate(
        [books[m][codes[:, m]] for m in range(4)], axis=1)
    assert np.allclose(decoded, vecs, atol=1e-12)


def test_pq_topk_exact_on_planted_groups(ray_session):
    # 40 vectors in 8 directions: ADC is exact, so top-5 per query is
    # the 5 smallest vec_ids sharing the query's direction
    vecs = _group_vecs(40, 8, dim=16)
    res = pqm.pq_topk(_emb_ds(vecs), k=5, m_sub=4, ksub=16,
                      n_queries=2).take_all()
    got = {(r["query_id"], r["rank"]): r["vec_id"] for r in res}
    for q in range(2):
        expect = [q + 8 * j for j in range(5)]
        assert [got[(q, r)] for r in range(1, 6)] == expect


def test_pq_topk_recall_on_random_floats(ray_session):
    # lossy path: PQ@10 must still recover most of the brute-force
    # top-10 on random gaussians (deterministic seed)
    rng = np.random.default_rng(123)
    vecs = rng.standard_normal((300, 32))
    res = pqm.pq_topk(_emb_ds(vecs), k=10, m_sub=8, ksub=32,
                      n_queries=3).take_all()
    x = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    recalls = []
    for q in range(3):
        truth = set(np.argsort(-(x[q] @ x.T))[:10].tolist())
        mine = {r["vec_id"] for r in res if r["query_id"] == q}
        recalls.append(len(mine & truth) / 10)
    assert np.mean(recalls) >= 0.5, recalls


def test_pq_code_histogram_invariants(ray_session):
    vecs = _group_vecs(64, 8, dim=16)
    rows = pqm.pq_code_histogram(_emb_ds(vecs), m_sub=4,
                                 ksub=8).take_all()
    per_sub = {}
    for r in rows:
        assert 0 <= r["code"] < 8
        per_sub[r["subspace"]] = per_sub.get(r["subspace"], 0) + r["n"]
    # every subspace accounts for every vector exactly once
    assert per_sub == {m: 64 for m in range(4)}


# -- RRF hybrid ---------------------------------------------------------------


def _rrf_case():
    texts = ["merge hash window", "merge merge merge", "hash window",
             "nothing here at all", "window", "merge hash",
             "filler words only", "more filler text"]
    # embeddings: doc 0 is the query; docs 4,2,6 made progressively
    # closer to it; others near-orthogonal
    rng = np.random.default_rng(5)
    base = rng.standard_normal((len(texts), 12))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    q = base[0]
    for d, w in ((4, 0.9), (2, 0.7), (6, 0.5)):
        v = w * q + (1 - w) * base[d]
        base[d] = v / np.linalg.norm(v)
    return texts, base


def test_rrf_matches_duckdb_mirror(ray_session):
    texts, vecs = _rrf_case()
    res = rt.hybrid_rrf_topk(_docs_ds(texts), _emb_ds(vecs),
                             k_each=5, k=4).take_all()
    con = duckdb.connect()
    con.register("documents", pa.Table.from_pydict({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    con.register("embeddings", pa.Table.from_pydict({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64()))}))
    oracle = con.sql(rt.hybrid_rrf_sql(k_each=5, k=4)).fetchall()
    mine = [(r["rank"], r["doc_id"], r["rrf_micro"]) for r in res]
    mine.sort()
    assert mine == [tuple(row) for row in oracle]


def test_rrf_doc_in_both_lists_sums(ray_session):
    texts, vecs = _rrf_case()
    res = rt.hybrid_rrf_topk(_docs_ds(texts), _emb_ds(vecs),
                             k_each=8, k=8).take_all()
    by_id = {r["doc_id"]: r["rrf_micro"] for r in res}
    # doc 0 ranks 1st dense (it IS the query vector) and top-3 lexical
    # (all three terms present): its fused score must exceed any
    # single-list maximum 1_000_000 // 61
    assert by_id[0] > 1_000_000 // 61
    # every contribution is one of the two lists' integer values summed
    allowed = {1_000_000 // (60 + r) for r in range(1, 9)}
    for v in by_id.values():
        assert v in allowed or any(
            v - a in allowed for a in allowed), v


def test_ivfpq_exact_on_planted_groups(ray_session):
    # each direction-group lands in one coarse list with one residual
    # pattern -> residual ADC is exact; probing includes the query's
    # own list, so top-5 is the group's 5 smallest ids
    vecs = _group_vecs(40, 8, dim=16)
    res = pqm.ivf_pq_topk(_emb_ds(vecs), k=5, n_lists=4, n_probe=2,
                          m_sub=4, ksub=16, n_queries=2).take_all()
    got = {(r["query_id"], r["rank"]): r["vec_id"] for r in res}
    for q in range(2):
        assert [got[(q, r)] for r in range(1, 6)] == \
            [q + 8 * j for j in range(5)]


def test_ivfpq_recall_on_random_floats(ray_session):
    rng = np.random.default_rng(321)
    vecs = rng.standard_normal((400, 32))
    res = pqm.ivf_pq_topk(_emb_ds(vecs), k=10, n_lists=8, n_probe=4,
                          m_sub=8, ksub=32, n_queries=3).take_all()
    x = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    recalls = []
    for q in range(3):
        truth = set(np.argsort(-(x[q] @ x.T))[:10].tolist())
        mine = {r["vec_id"] for r in res if r["query_id"] == q}
        recalls.append(len(mine & truth) / 10)
    # probe-limited AND lossy: still must find the query itself and
    # most close neighbors
    assert np.mean(recalls) >= 0.4, recalls
