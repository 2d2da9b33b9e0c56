"""Exact set-similarity join: prefix-filter completeness pinned
against brute force over arbitrary block structures, and the drop
channel pinned against its SQL mirror on a planted-overflow corpus."""

import numpy as np
import pyarrow as pa
import pytest

from nerfray.ops import setjoin
from nerfray.ops.dedup import sha64


def _brute_pairs(texts, tau):
    def hs(t):
        ws = t.split(" ")
        return {sha64(" ".join(ws[i:i + 3])) for i in range(len(ws) - 2)}
    sets = [hs(t) for t in texts]
    out = {}
    for a in range(len(sets)):
        for b in range(a + 1, len(sets)):
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if union and inter / union >= tau:
                out[(a, b)] = inter / union
    return out


@pytest.fixture(scope="module")
def near_dup_corpus():
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(40)]
    texts = []
    for g in range(30):
        base = [vocab[i] for i in rng.integers(0, 40, 30)]
        texts.append(" ".join(base))
        # near dup: one word substituted -> high but != 1.0 jaccard
        mut = list(base)
        mut[7] = "swapped"
        texts.append(" ".join(mut))
    texts.append("a b")          # < 3 words: empty shingle set
    texts.append("c d")          # must never pair (u == 0)
    return texts


def test_setjoin_equals_brute_force(ray_session, near_dup_corpus):
    import ray.data
    texts = near_dup_corpus
    ds = ray.data.from_arrow(pa.Table.from_pydict({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(7)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in setjoin.setsim_join_pairs(ds, tau=0.5).take_all()}
    want = _brute_pairs(texts, 0.5)
    assert got == want and len(want) >= 30


def test_setjoin_block_structure_invariance(ray_session, near_dup_corpus):
    import ray.data
    texts = near_dup_corpus
    t = pa.Table.from_pydict({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})
    one = {(r["doc_a"], r["doc_b"]) for r in setjoin.setsim_join_pairs(
        ray.data.from_arrow(t).repartition(1), tau=0.5).take_all()}
    many = {(r["doc_a"], r["doc_b"]) for r in setjoin.setsim_join_pairs(
        ray.data.from_arrow(t).repartition(19), tau=0.5).take_all()}
    assert one == many and one


def test_setjoin_drops_match_sql_mirror(ray_session):
    """Plant a token shared by > cap docs' prefixes: every doc is the
    SAME short shingle set, so all its tokens are in every prefix and
    each run overflows identically in Ray and in the SQL mirror."""
    import duckdb
    import ray.data
    n, cap = 30, 10
    texts = ["x y z w" for _ in range(n)]   # 2 shingles, all docs equal
    t = pa.Table.from_pydict({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string())})
    got = sorted((r["n_ids"], r["n_dropped_pairs"])
                 for r in setjoin.setjoin_drop_counts(
                     ray.data.from_arrow(t).repartition(5),
                     cap=cap).take_all())
    con = duckdb.connect()
    con.register("documents", t)
    sql = setjoin.SETJOIN_DROPS_SQL.replace(
        str(setjoin.SETJOIN_CAP), str(cap))
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == want and got  # overflow actually happened


def test_setjoin_drops_empty_at_gate_scale(ray_session):
    """At the driver corpus scale the caps must never bite."""
    import ray.data
    from nerfray.sources.parquet import read_parquet_clean
    docs = read_parquet_clean(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"])
    assert setjoin.setjoin_drop_counts(docs).count() == 0


def test_editdist_pairs_vs_brute_force(ray_session):
    """Length-band + counting filter must be invisible: result equals
    brute-force levenshtein, including pairs straddling a band edge."""
    import ray.data
    from nerfray.ops import dedup

    rng = np.random.default_rng(31)
    alphabet = list("abcdefgh ")
    k = 8
    texts = []
    for i in range(25):
        base = "".join(rng.choice(alphabet, 40 + 3 * i))
        texts.append(base)
        # small mutation: delete 2 chars + substitute 1
        mut = list(base)
        del mut[5]; del mut[11]
        mut[0] = "z"
        texts.append("".join(mut))
    # band-edge straddlers: lengths k-1 vs k+1 (bands 0 vs 1)
    texts.append("a" * (k - 1))
    texts.append("a" * (k + 1))
    ds = ray.data.from_arrow(pa.Table.from_pydict({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(6)
    got = {(r["doc_a"], r["doc_b"]): r["editdist"]
           for r in dedup.editdist_pairs(ds, k=k).take_all()}
    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            ed = dedup._levenshtein(texts[a], texts[b])
            if ed <= k:
                want[(a, b)] = ed
    assert got == want
    assert (len(texts) - 2, len(texts) - 1) in got  # straddlers found
    assert len(want) >= 26


def test_editdist_adaptive_plan_dropfree_on_hot_band(ray_session):
    """A pathological corpus whose lengths all pile into ONE band and
    exceed the per-group cap: the adaptive census plan must split it
    (n_shards > 1) and stay EXACT — the pre-r5 path silently truncated
    here."""
    import ray.data
    from nerfray.ops import dedup

    cap = 40  # small cap so a 120-doc band overflows a single group
    rng = np.random.default_rng(7)
    alphabet = list("abcd")
    k = 4
    base = "".join(rng.choice(alphabet, 64))
    texts = []
    for i in range(120):
        mut = list(base)
        mut[i % 60] = "z"  # distance 2 apart pairwise, 1 from base
        texts.append("".join(mut))
    ds = ray.data.from_arrow(pa.Table.from_pydict({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(5)

    # the plan splits the hot band
    census = {r["band"]: (r["n_docs"], r["n_shards"])
              for r in dedup.editdist_band_census(
                  ds, k=k, cap=cap).take_all()}
    hot = [s for n, s in census.values() if n >= 120]
    assert hot and all(s >= (2 * 120) // cap for s in hot)

    got = {(r["doc_a"], r["doc_b"]): r["editdist"]
           for r in dedup.editdist_pairs(ds, k=k, cap=cap).take_all()}
    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            ed = dedup._levenshtein(texts[a], texts[b])
            if ed <= k:
                want[(a, b)] = ed
    assert got == want
    # every same-mutation pair (distance 0/2) is present: nothing dropped
    assert len(got) == len(want) == 120 * 119 // 2


def test_editdist_pairs_shard_invariant(ray_session):
    """n_shards only splits a band's quadratic work across co-groups;
    the pair set and distances must be identical for any shard count."""
    import ray.data
    from nerfray.ops import dedup

    rng = np.random.default_rng(7)
    alphabet = list("abcdef ")
    texts = []
    for i in range(30):
        base = "".join(rng.choice(alphabet, 50))
        texts.append(base)
        mut = list(base)
        mut[3] = "z"; del mut[20]
        texts.append("".join(mut))
    ds = ray.data.from_arrow(pa.Table.from_pydict({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(5)
    base = {(r["doc_a"], r["doc_b"]): r["editdist"]
            for r in dedup.editdist_pairs(ds, k=6, n_shards=1).take_all()}
    assert base  # planted mutations must surface
    for n in (2, 4, 7):
        got = {(r["doc_a"], r["doc_b"]): r["editdist"]
               for r in dedup.editdist_pairs(ds, k=6,
                                             n_shards=n).take_all()}
        assert got == base, n


def test_batched_levenshtein_matches_reference():
    """The pair-axis-vectorized DP must agree with the single-pair
    row sweep: exact distances <= k, anything above clamped/filtered
    identically — including empties, unicode, and band-straddling
    lengths."""
    from nerfray.ops import dedup

    rng = np.random.default_rng(99)
    alphabet = list("abσδc €xy")
    texts = [""]
    for n in rng.integers(1, 150, 50):
        texts.append("".join(rng.choice(alphabet, int(n))))
    for i in range(1, 30, 3):  # planted near-dups
        mut = list(texts[i])
        if len(mut) > 2:
            mut[1] = "Z"; del mut[-1]
        texts.append("".join(mut))
    cps = [np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
           for t in texts]
    iu, ju = np.triu_indices(len(texts), k=1)
    for k in (0, 2, 9, 40):
        got = dedup._batched_levenshtein(cps, iu, ju, k)
        for p in range(len(iu)):
            want = dedup._levenshtein(texts[iu[p]], texts[ju[p]], k)
            assert (got[p] <= k) == (want <= k)
            if want <= k:
                assert got[p] == want
