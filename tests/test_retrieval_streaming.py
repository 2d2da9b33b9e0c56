"""Tests for the round-4 operators: BPE training, BM25 retrieval,
containment dedup, and watermark/late-event detection — pinning the
edge semantics the SQL oracles can't see (self-pair overlap, merged
symbols in later rounds, df caps, range-boundary carries)."""

import numpy as np
import pyarrow as pa
import pytest

from nerfray.ops import retrieval as rt
from nerfray.ops import streaming as st
from nerfray.ops import tokenizer as tk


def _docs(texts):
    import ray.data
    return ray.data.from_arrow(pa.Table.from_pydict({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


# -- BPE --------------------------------------------------------------------


def _brute_pair_counts(texts):
    """Reference: replace()-semantics pair counts per word."""
    counts = {}
    for t in texts:
        for w in t.split(" "):
            for i in range(len(w) - 1):
                p = w[i:i + 2]
                counts.setdefault(p, 0)
    for p in counts:
        n = 0
        for t in texts:
            for w in t.split(" "):
                # non-overlapping left-to-right count == length drop
                n += len(w) - len(w.replace(p, ""))
        counts[p] = n
    return counts


def test_bpe_self_pair_overlap(ray_session):
    # 'aaa' holds ONE merge site for 'aa', 'aaaa' two — replace()
    # semantics, the case adjacency counting gets wrong
    docs = _docs(["aaa aaaa baab", "aa a"])
    rows = tk.bpe_pair_counts(docs, k=10).take_all()
    got = {r["pair"]: r["n"] for r in rows}
    ref = _brute_pair_counts(["aaa aaaa baab", "aa a"])
    for p, n in got.items():
        assert ref[p] == n, p
    assert got["aa"] == 1 + 2 + 1 + 1  # aaa:1 aaaa:2 baab:1 aa:1


def test_bpe_merge_rounds_interact(ray_session):
    # round 1 merges 'ab' -> X; round 2's best pair is (X, c), i.e.
    # contains the new symbol — the real BPE recursion
    docs = _docs(["abc abc abc abd"])
    rows = tk.bpe_train_merges(docs, rounds=2).take_all()
    assert rows[0]["pair"] == "ab" and rows[0]["n"] == 4
    assert rows[1]["pair"] == chr(tk.MERGE_BASE) + "c"
    assert rows[1]["n"] == 3


def test_bpe_apply_merge_kernel():
    a = np.frombuffer("aaab".encode("utf-32-le"), np.uint32) \
        .astype(np.int64)
    out = tk._apply_merge(a, ord("a"), ord("a"), 0xE000)
    assert "".join(map(chr, out)) == "ab"
    out2 = tk._apply_merge(a, ord("a"), ord("b"), 0xE001)
    assert "".join(map(chr, out2)) == "aa"


def test_bpe_empty_and_single(ray_session):
    docs = _docs(["", "a", "ab"])
    rows = tk.bpe_pair_counts(docs, k=10).take_all()
    assert {r["pair"]: r["n"] for r in rows} == {"ab": 1}


# -- BM25 -------------------------------------------------------------------


def test_bm25_scoring_and_df0(ray_session):
    docs = _docs(["merge merge hash x y", "hash z", "nothing here"])
    # term 'window' has df 0 -> contributes nothing, no crash
    res = rt.bm25_topk(docs, terms=("merge", "hash", "window"),
                       k=3).take_all()
    # avgw = (5+2+2)//3 = 3
    # doc 0: L=5, norm=1; merge df1 -> idf 3000, tf2 -> (4//4)=1 ->
    #        3000; hash idf 1500, tf1 -> (2//3)=0 -> total 3000
    # doc 1: L=2, norm=0; hash tf1 -> 1500 * (2//2)=1500
    assert [r["doc_id"] for r in res] == [0, 1, 2]
    assert [r["score_milli"] for r in res] == [3000, 1500, 0]


def test_bm25_stats_bounded_driver_state(ray_session):
    docs = _docs(["merge hash"] * 50)
    df, n, avgw = rt.bm25_stats(docs, ("merge", "nope"))
    assert df == {"merge": 50, "nope": 0}
    assert n == 50 and avgw == 2


# -- containment ------------------------------------------------------------


def test_containment_direction_and_threshold(ray_session):
    long = " ".join(f"t{j}" for j in range(16))
    short = " ".join(f"t{j}" for j in range(4, 12))
    noise = " ".join(f"n{j}" for j in range(8))
    docs = _docs([long, short, noise])
    rows = rt.containment_pairs(docs).take_all()
    assert len(rows) == 1
    r = rows[0]
    # short ⊂ long, not the reverse
    assert (r["doc_a"], r["doc_b"]) == (1, 0)
    assert r["cont_milli"] == 1000 and r["size_a"] == 5


def test_containment_df_cap_drops_ubiquitous_shingles(ray_session):
    # the same 4-gram in MORE than df_cap docs is dropped whole: no
    # quadratic pair blowup from boilerplate shingles
    common = "x0 x1 x2 x3"
    docs = _docs([common + f" u{i}a u{i}b u{i}c" for i in range(6)])
    rows = rt.containment_pairs(docs, df_cap=4, tau_milli=1,
                                min_shingles=1).take_all()
    assert rows == []  # only the shared shingle co-occurs; capped out
    rows2 = rt.containment_pairs(docs, df_cap=8, tau_milli=1,
                                 min_shingles=1).take_all()
    assert len(rows2) == 30  # 6*5 ordered pairs via the common shingle


def test_containment_min_shingles_gate(ray_session):
    docs = _docs(["a b c d", "a b c d e"])  # sizes 1 and 2
    rows = rt.containment_pairs(docs, min_shingles=3).take_all()
    assert rows == []


# -- watermark / late events ------------------------------------------------


def _events(ids, ts_us, users=None):
    import ray.data
    users = users if users is not None else [0] * len(ids)
    return ray.data.from_arrow(pa.Table.from_pydict({
        "event_id": pa.array(ids, pa.int64()),
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(np.asarray(ts_us, np.int64)
                       .view("datetime64[us]"), pa.timestamp("us")),
    }))


def test_late_events_basic_and_tie(ray_session):
    # arrival 0,1,2,3; event 2 is 100us behind the max, event 3 is
    # exactly `lateness` behind (NOT late: strict >)
    ev = _events([0, 1, 2, 3], [1000, 2000, 1900, 1950])
    rows = st.late_events(ev, lateness_us=50,
                          n_ranges=2).take_all()
    assert [(r["event_id"], r["late_by_us"]) for r in rows] == [(2, 100)]


def test_late_events_carry_across_ranges(ray_session):
    # the max lives in range 0; the late row is in range 1 and is only
    # late via the carried prefix
    ids = list(range(8))
    ts = [0, 10_000, 20_000, 990_000, 30_000, 40_000, 991_000, 992_000]
    ev = _events(ids, ts)
    rows = st.late_events(ev, lateness_us=100_000,
                          n_ranges=4).take_all()
    late = sorted((r["event_id"], r["late_by_us"]) for r in rows)
    assert late == [(4, 960_000), (5, 950_000)]


def test_late_events_first_event_never_late(ray_session):
    ev = _events([0, 1], [10**15, 10**15 + 1])
    assert st.late_events(ev, lateness_us=1).take_all() == []


def test_late_events_driver_state_bounded(ray_session):
    # the driver sees <= n_ranges rows regardless of row count
    ev = _events(list(range(500)), list(range(0, 500_000, 1000)))
    out = st.late_events(ev, lateness_us=10, n_ranges=8).take_all()
    assert out == []  # monotone stream: nothing late


# -- BPE encode / hash sample / drop audit ----------------------------------


def test_bpe_encode_stats_matches_brute(ray_session):
    texts = ["abc abc abd", "aaab", ""]
    docs = _docs(texts)
    rows = {r["doc_id"]: r["n_syms"]
            for r in tk.bpe_encode_stats(docs, rounds=2).take_all()}

    # brute reference: replay replace()-based merges on strings
    words = [t.split(" ") for t in texts]
    for r in range(2):
        counts = {}
        for ws in words:
            for w in ws:
                for i in range(len(w) - 1):
                    p = w[i:i + 2]
                    counts[p] = 0
        for p in counts:
            counts[p] = sum(len(w) - len(w.replace(p, ""))
                            for ws in words for w in ws)
        best = min(counts, key=lambda p: (-counts[p], p))
        words = [[w.replace(best, chr(tk.MERGE_BASE + r)) for w in ws]
                 for ws in words]
    ref = {i: sum(len(w) for w in ws) for i, ws in enumerate(words)}
    assert rows == ref


def test_hash_sample_deterministic_and_partition_invariant(ray_session):
    import ray.data
    from nerfray.ops import sampling as sp
    docs = _docs([f"d{i}" for i in range(300)])
    a = [r["doc_id"] for r in sp.hash_sample_topk(docs, k=20).take_all()]
    b = [r["doc_id"]
         for r in sp.hash_sample_topk(docs.repartition(13),
                                      k=20).take_all()]
    assert a == b and len(a) == 20 and len(set(a)) == 20
    # a different corpus subset containing the sampled ids picks the
    # same winners (hash order is a property of the id, not the block)
    docs2 = _docs([f"x{i}" for i in range(150)])
    c = [r["doc_id"] for r in sp.hash_sample_topk(docs2, k=20).take_all()]
    expect = [i for i in a if i < 150]
    assert c[:len([i for i in expect if True])] != a  # different corpus
    assert set(c) <= set(range(150))


def test_containment_drop_summary_planted(ray_session):
    docs = _docs([" ".join(f"u{i}w{j}" for j in range(6))
                  for i in range(80)])
    out = rt.containment_drop_summary(
        rt.planted_boilerplate_docs(docs), df_cap=64).to_pydict()
    # the two interior boilerplate shingles sit in all 80 docs
    assert out["n_dropped"] == [2]
    assert out["sum_df"] == [160]


def test_bm25_rerank_brute_force(ray_session):
    """Two-stage rerank must equal the brute-force pipeline: global
    BM25 pool, exact adjacent-phrase count, integer rerank order."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from nerfray.ops import retrieval as R

    rng = np.random.default_rng(41)
    vocab = ["merge", "hash", "window", "scan", "agg"]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 30)))
             for _ in range(80)]
    texts[7] = "merge hash merge hash window"    # phrase doc, all terms
    texts[9] = "hash merge"                      # reversed: no phrase
    ds = ray.data.from_arrow(pa.Table.from_pydict({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(4)
    got = [(r["rank"], r["doc_id"], r["rerank_milli"]) for r in
           R.bm25_rerank_topk(ds, pool=40, k=5).take_all()]
    got.sort()

    # brute force
    ws = [t.split(" ") for t in texts]
    n = len(ws)
    avgw = max(sum(len(w) for w in ws) // n, 1)
    df = {t: sum(1 for w in ws if t in w) for t in R.QUERY_TERMS}
    idf = {t: (1000 * n) // df[t] for t in R.QUERY_TERMS if df[t]}

    def bm25(i):
        L = len(ws[i])
        s = 0
        for t, v in idf.items():
            tf = ws[i].count(t)
            s += v * ((2 * tf) // (tf + 1 + L // avgw))
        return s

    pool = sorted(range(n), key=lambda i: (-bm25(i), i))[:40]
    t1, t2 = R.RERANK_PHRASE

    def phrase(i):
        return sum(1 for a, b in zip(ws[i], ws[i][1:])
                   if a == t1 and b == t2)

    rr = sorted(((10 * bm25(i) + 5000 * phrase(i), i) for i in pool),
                key=lambda x: (-x[0], x[1]))[:5]
    want = [(r + 1, i, s) for r, (s, i) in enumerate(rr)]
    assert got == want
    assert any(i == 7 for _, i, _ in want)  # phrase doc in the top-5
