"""Entity-resolution brute-force pins (nerfray/stages/entity.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from nerfray.stages import entity


def _resolve(names, ray_session=None):
    ds = ray.data.from_arrow(pa.Table.from_pydict({
        "mention_id": pa.array(range(len(names)), pa.int64()),
        "name": pa.array(names, pa.string())})).repartition(3)
    rows = entity.resolve_entities(ds).take_all()
    assert sorted(r["mention_id"] for r in rows) == list(range(len(names)))
    return {r["mention_id"]: r["canon_id"] for r in rows}


def _brute(names):
    """Union-find over the spec: same normalized name, or normalized
    Levenshtein distance <= 1."""
    def norm(s):
        return s.strip().lower()

    def lev(a, b):
        if a == b:
            return 0
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[lb]

    parent = list(range(len(names)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            if lev(norm(names[i]), norm(names[j])) <= 1:
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    # path-compress fully, canon = min of class
    cls = {}
    for i in range(len(names)):
        cls.setdefault(find(i), []).append(i)
    return {m: min(v) for v in cls.values() for m in v}


def test_er_adversarial_cases(ray_session):
    names = [
        "Lib55",        # 0: cluster A
        "lib55",        # 1: case alias of 0
        "  Lib55\t",    # 2: whitespace alias of 0
        "Iib55",        # 3: edit-1 typo of 0
        "abc",          # 4: shares deletion keys with 5 but distance 2
        "acb",          # 5: transposition — must NOT merge with 4
        "Pkg7z",        # 6: singleton
        "numpy",        # 7: chain head
        "numpyy",       # 8: insert-1 of 7
        "nnumpyy",      # 9: insert-1 of 8, distance 2 from 7 — CC must
                        #    still fold it into the cluster (chain)
        "x",            # 10: single char
        "y",            # 11: single char, distance 1 from 10 — merges
    ]
    got = _resolve(names)
    want = _brute(names)
    assert got == want
    # pin the interesting structure explicitly
    assert got[1] == got[2] == got[3] == got[0] == 0
    assert got[4] == 4 and got[5] == 5       # transposition rejected
    assert got[6] == 6                       # singleton
    assert got[9] == got[8] == got[7] == 7   # diameter-2 chain folded
    assert got[11] == got[10] == 10


def test_er_random_names_vs_brute_force(ray_session):
    rng = np.random.default_rng(23)
    alphabet = list("abcd")
    names = ["".join(rng.choice(alphabet, rng.integers(2, 6)))
             for _ in range(60)]
    assert _resolve(names) == _brute(names)


def test_er_planted_structure(ray_session, tmp_path):
    """Planted mention clusters: quadruples {4b..4b+3} for even b,
    trio + singleton for odd b."""
    import pyarrow.parquet as pq

    n = 64
    pq.write_table(pa.Table.from_pydict(
        {"doc_id": pa.array(range(n), pa.int64())}),
        tmp_path / "documents.parquet")
    got = {r["mention_id"]: r["canon_id"]
           for r in entity.er_planted_query(str(tmp_path)).take_all()}
    for i in range(n):
        b = i // 4
        if i % 4 == 3 and b % 2 == 1:
            assert got[i] == i          # odd-base Pkg singleton
        else:
            assert got[i] == 4 * b


def test_canonical_usage_vs_brute_force(ray_session, tmp_path):
    """Distinct-doc rollup through the canonical map must equal a
    per-entity brute-force set count on the planted mentions."""
    import pyarrow.parquet as pq

    n = 97  # non-multiple of 4: partial tail quadruple
    pq.write_table(pa.Table.from_pydict(
        {"doc_id": pa.array(range(n), pa.int64())}),
        tmp_path / "documents.parquet")
    canon = {r["mention_id"]: r["canon_id"]
             for r in entity.er_planted_query(str(tmp_path)).take_all()}
    want = {}
    for m in range(n):
        want.setdefault(canon[m], set()).add((m * 3) % n)
    got = {r["canon_id"]: r["n_docs"]
           for r in entity.canonical_usage_query(str(tmp_path)).take_all()}
    assert got == {c: len(s) for c, s in want.items()}


def test_fused_facts_vs_brute_force(ray_session, tmp_path):
    """Majority-vote winner per subject must equal a brute-force count
    with (votes desc, obj asc) tie-break, including the planted 3:2
    near-tie subjects and the partial tail subject."""
    import pyarrow.parquet as pq
    from collections import Counter

    n = 103  # 5*20+3: tail subject 20 has only 3 claims
    pq.write_table(pa.Table.from_pydict(
        {"doc_id": pa.array(range(n), pa.int64())}),
        tmp_path / "documents.parquet")
    claims = []
    for d in range(n):
        s = d // 5
        if s % 7 == 0 and d % 5 >= 3:
            o = s * 10 + 2
        elif d % 5 == 4:
            o = s * 10 + 1
        else:
            o = s * 10
        claims.append((s, o))
    want = {}
    for s in {c[0] for c in claims}:
        cnt = Counter(o for s2, o in claims if s2 == s)
        obj, votes = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        want[s] = (obj, votes)
    got = {r["subj"]: (r["obj"], r["votes"])
           for r in entity.fused_facts_query(str(tmp_path)).take_all()}
    assert got == want
    assert any(v == 3 for _, v in want.values())  # near-tie subjects
