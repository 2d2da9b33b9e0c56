"""DSIR importance weighting (ops/importance.py) and positional phrase
search (ops/search.phrase_search)."""

import duckdb
import pyarrow as pa

from nerfray.ops import importance as imp
from nerfray.ops import search as srch


def _docs(texts):
    import ray.data
    return ray.data.from_arrow(pa.Table.from_pydict({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def _register(con, texts):
    con.register("documents", pa.Table.from_pydict({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))


# -- DSIR ---------------------------------------------------------------------


def _brute_dsir(texts, n_buckets, n_target):
    tgt = [0] * n_buckets
    raw = [0] * n_buckets
    per_doc = []
    for d, t in enumerate(texts):
        ws = t.split(" ")
        bks = [imp._bucket_of(f"{a} {b}", n_buckets)
               for a, b in zip(ws, ws[1:])]
        per_doc.append(bks)
        for bk in bks:
            raw[bk] += 1
            if d < n_target:
                tgt[bk] += 1
    w = [(1_000_000 * (tgt[b] + 1)) // (raw[b] + 1)
         for b in range(n_buckets)]
    return [(d, sum(w[bk] for bk in bks), len(bks))
            for d, bks in enumerate(per_doc)]


def test_dsir_scores_match_brute(ray_session):
    texts = ["target words here", "target words again", "other stuff",
             "totally different content", "words here too", "", "one"]
    res = imp.importance_scores(_docs(texts), n_buckets=32,
                                n_target=2).take_all()
    got = sorted((r["doc_id"], r["score_micro"], r["n_feats"])
                 for r in res)
    assert got == _brute_dsir(texts, 32, 2)


def test_dsir_target_docs_score_higher(ray_session):
    # docs sharing the target's bigrams must outscore disjoint docs
    # per feature
    texts = (["alpha beta gamma delta"] * 3
             + ["alpha beta gamma delta"] * 3
             + ["zeta eta theta iota"] * 3)
    rows = imp.importance_scores(_docs(texts), n_buckets=64,
                                 n_target=3).take_all()
    per_feat = {r["doc_id"]: r["score_micro"] // r["n_feats"]
                for r in rows}
    assert min(per_feat[d] for d in range(6)) > \
        max(per_feat[d] for d in range(6, 9))


def test_dsir_sql_mirror_small(ray_session):
    texts = ["a b c a b", "b c d", "x y z", "a b", ""]
    res = imp.importance_scores(_docs(texts), n_buckets=16,
                                n_target=2).take_all()
    con = duckdb.connect()
    _register(con, texts)
    oracle = con.sql(imp.importance_sql(16, 2)).fetchall()
    got = sorted((r["doc_id"], r["score_micro"], r["n_feats"])
                 for r in res)
    assert got == [tuple(row) for row in oracle]


def test_dsir_selected_excludes_featureless(ray_session):
    texts = ["a b a b", "a b", "solo", ""]
    res = imp.dsir_selected(_docs(texts), n_buckets=16, n_target=1,
                            k=10).take_all()
    ids = {r["doc_id"] for r in res}
    assert ids == {0, 1}  # docs 2 (one word) and 3 (empty) have no bigrams


# -- phrase search --------------------------------------------------------------


def test_phrase_basic_and_counts(ray_session):
    texts = ["merge hash window", "hash merge", "merge hash merge hash",
             "nothing", "merge", "xmerge hash"]
    res = srch.phrase_search(_docs(texts), ("merge", "hash")).take_all()
    got = {r["doc_id"]: r["n_occ"] for r in res}
    assert got == {0: 1, 2: 2}


def test_phrase_overlapping_repeated_word(ray_session):
    texts = ["a a a a", "a a", "a b a"]
    res = srch.phrase_search(_docs(texts), ("a", "a")).take_all()
    got = {r["doc_id"]: r["n_occ"] for r in res}
    assert got == {0: 3, 1: 1}  # overlaps counted


def test_phrase_trigram_and_sql_mirror(ray_session):
    texts = ["x p q r y", "p q r", "p q", "q r p q r p q r", ""]
    phrase = ("p", "q", "r")
    res = srch.phrase_search(_docs(texts), phrase).take_all()
    con = duckdb.connect()
    _register(con, texts)
    oracle = con.sql(srch.phrase_search_sql(phrase)).fetchall()
    got = sorted((r["doc_id"], r["n_occ"]) for r in res)
    assert got == [tuple(row) for row in oracle]
    assert dict(got)[3] == 2  # "q r p q r p q r" has 2 full trigrams


# -- classifier PR sweep --------------------------------------------------------


def test_classifier_pr_invariants_and_mirror(ray_session):
    from nerfray.ops import text as tx
    # 30 docs: half long+diverse (gate keep), half short (gate drop)
    texts = [" ".join(f"w{i}_{j}" for j in range(25))
             for i in range(15)] + ["tiny doc"] * 15
    import ray.data
    docs = ray.data.from_arrow(pa.Table.from_pydict({
        "doc_id": pa.array(range(30), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    rows = tx.classifier_pr_curve(docs, v=32,
                                  thresholds=(-5, 0, 5)).take_all()
    assert len(rows) == 3
    for r in rows:
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == 30
        assert r["tp"] + r["fn"] == 15  # gate keeps exactly the long docs
    con = duckdb.connect()
    _register(con, texts)
    oracle = con.sql(tx.classifier_pr_sql(
        v=32, thresholds=(-5, 0, 5))).fetchall()
    got = sorted((r["threshold"], r["tp"], r["fp"], r["fn"], r["tn"],
                  r["precision_milli"], r["recall_milli"]) for r in rows)
    assert got == [tuple(row) for row in oracle]
