"""End-to-end Ray Data pipeline tests (KG construction, SURVEY.md §7.0)."""

import hashlib

import pyarrow as pa
import pytest

from nerfray import corpus, dicts
from nerfray.core.compare import set_prf

N = 120  # corpus rows for pipeline tests (small but covers all templates)


@pytest.fixture(scope="module")
def corpus_ds(ray_session):
    from nerfray.sources import corpus_source
    return corpus_source.corpus_dataset(N, rows_per_block=40)


def test_corpus_dataset_schema_and_determinism(ray_session, corpus_ds):
    rows = sorted(corpus_ds.take_all(), key=lambda r: (r["repo"], r["path"]))
    assert len(rows) == N
    assert set(rows[0]) == {"repo", "path", "commit", "lang", "content"}
    # spot-check against the pure generator
    i = 17
    f = corpus.row_fields(i, N)
    row = next(r for r in rows if r["path"] == f["path"])
    assert row["content"] == corpus.row_content(i, N)
    assert row["commit"] == corpus.commit_of(f["repo"], f["path"])


def test_unitize_sha_invariant(ray_session, corpus_ds):
    """sha256(content) must survive the explode (BASELINE input_hint)."""
    from nerfray.pipelines import kg
    units = kg.units_of(corpus_ds).take_all()
    by_file = {}
    for u in units:
        by_file.setdefault((u["repo"], u["path"], u["content_sha"]), []) \
            .append((u["unit_id"], u["text"]))
    assert len(by_file) == N
    for (repo, path, sha), lines in by_file.items():
        text = "\n".join(t for _, t in sorted(lines))
        assert hashlib.sha256(text.encode()).hexdigest() == sha


@pytest.mark.parametrize("tagger", ["rule", "crf"])
def test_kg_triples_match_gold(ray_session, corpus_ds, tagger):
    """North-star gate: triple P/R >= 0.95 vs gold (both taggers are
    exact on the synthetic corpus)."""
    from nerfray.pipelines import kg
    got = {(r["subj"], r["pred"], r["obj"])
           for r in kg.kg_pipeline(corpus_ds, tagger=tagger).take_all()}
    gold = corpus.gold_triples_all(N)
    p, r, f = set_prf(gold, got)
    assert p >= 0.95 and r >= 0.95, (p, r)
    assert got == gold  # the synthetic corpus is learned exactly


def test_partitioned_dedup_equals_shuffle_dedup(ray_session):
    """Repo-major blocking makes per-block dedup globally exact: both
    paths produce the identical triple set."""
    from nerfray.pipelines import kg
    from nerfray.sources import corpus_source
    shuffle = {(r["subj"], r["pred"], r["obj"]) for r in kg.kg_pipeline(
        corpus_source.corpus_dataset(N, rows_per_block=40),
        tagger="rule").take_all()}
    part = {(r["subj"], r["pred"], r["obj"]) for r in kg.kg_pipeline(
        corpus_source.corpus_dataset_by_repo(N, repos_per_block=3),
        tagger="rule", dedup="partitioned").take_all()}
    assert part == shuffle == corpus.gold_triples_all(N)
    # and truly deduped: no repeated triple rows in the partitioned output
    rows = kg.kg_pipeline(
        corpus_source.corpus_dataset_by_repo(N, repos_per_block=3),
        tagger="rule", dedup="partitioned").take_all()
    assert len(rows) == len(part)


def test_triples_with_provenance(ray_session):
    """F5 schema: provenance rows point at a real source span whose file
    sha equals the end-to-end carried content_sha, and the provenance
    choice is deterministic across block structures."""
    import hashlib
    from nerfray.pipelines import kg
    from nerfray.sources import corpus_source

    def run(rpb):
        ds = corpus_source.corpus_dataset_by_repo(N, repos_per_block=rpb)
        return {tuple(r[k] for k in ("subj", "pred", "obj", "repo", "path",
                                     "content_sha", "unit_id", "src_start",
                                     "src_end")): r
                for r in kg.triples_with_provenance(ds, "rule").take_all()}

    a = run(3)
    b = run(7)
    assert set(a) == set(b)  # provenance deterministic across blocking
    assert {k[:3] for k in a} == corpus.gold_triples_all(N)
    # verify sha + span against the actual source content
    by_file = {}
    for i in range(N):
        f = corpus.row_fields(i, N)
        by_file[(f["repo"], f["path"])] = corpus.row_content(i, N)
    for k, r in a.items():
        content = by_file[(r["repo"], r["path"])]
        assert hashlib.sha256(content.encode()).hexdigest() \
            == r["content_sha"]
        line = content.split("\n")[r["unit_id"]]
        assert 0 <= r["src_start"] < r["src_end"] <= len(line)
        surface = line[r["src_start"]:r["src_end"]]
        if r["pred"] == "imports":      # surface IS the canonical object
            assert r["obj"] == f"lib:{surface}"
        elif r["pred"] == "calls":
            assert r["obj"] == f"api:{surface}"
        elif r["pred"] == "defines":
            assert r["obj"] == f"sym:{surface}"


def test_validate_repo_partitioning(ray_session):
    from nerfray.sources import corpus_source
    from nerfray.stages import triples as tr
    good = corpus_source.corpus_dataset_by_repo(N, repos_per_block=3)
    assert tr.validate_repo_partitioning(good)
    # round-robin index blocking scatters each repo across blocks
    bad = corpus_source.corpus_dataset(N, rows_per_block=30)
    assert not tr.validate_repo_partitioning(bad)


def test_canonical_nodes_salted_equals_unsalted(ray_session, corpus_ds):
    from nerfray.pipelines import kg
    a = {(r["canon_id"], r["n_mentions"], r["n_surfaces"])
         for r in kg.kg_nodes(corpus_ds, tagger="rule", n_salts=1).take_all()}
    b = {(r["canon_id"], r["n_mentions"], r["n_surfaces"])
         for r in kg.kg_nodes(corpus_ds, tagger="rule", n_salts=5).take_all()}
    assert a == b and len(a) > 0
    # mention totals match the planted-gold arithmetic
    total = sum(m for _, m, _ in a)
    expect = sum(1 + (1 + i % 3) + (1 + i % 2) + (1 + (1 - i % 2))
                 for i in range(N))
    assert total == expect


def test_eval_prf_perfect_on_synthetic(ray_session):
    from nerfray.stages import evaluate
    rows = evaluate.span_prf(N).take_all()
    assert {r["label"] for r in rows} == \
        {"api", "library", "license", "symbol", "vendor"}
    for r in rows:
        assert r["fp"] == 0 and r["fn"] == 0 and r["tp"] > 0


def test_determinism_across_parallelism(ray_session):
    """North-rule: identical output regardless of block structure and
    actor-pool width (the sandbox stand-in for N vs 4N nodes)."""
    from nerfray.pipelines import kg
    from nerfray.sources import corpus_source

    def run(rows_per_block, conc):
        ds = corpus_source.corpus_dataset(N, rows_per_block=rows_per_block)
        trips = kg.triples_of(kg.linked_of(
            kg.spans_of(kg.units_of(ds), "crf", concurrency=conc)))
        return {(r["subj"], r["pred"], r["obj"]) for r in trips.take_all()}

    a = run(20, (1, 1))
    b = run(55, (1, 4))
    assert a == b == corpus.gold_triples_all(N)


def test_write_triples_partitioned(ray_session, corpus_ds, tmp_path):
    from nerfray.pipelines import kg
    from nerfray.stages import triples as tr
    out = str(tmp_path / "triples")
    ds = kg.kg_pipeline(corpus_ds, tagger="rule")
    tr.write_triples(ds, out, n_buckets=4)
    import pyarrow.dataset as pads
    back = pads.dataset(out, partitioning="hive").to_table()
    got = set(zip(back.column("subj").to_pylist(),
                  back.column("pred").to_pylist(),
                  back.column("obj").to_pylist()))
    assert got == corpus.gold_triples_all(N)
    # every subject's rows live in exactly the bucket its hash names
    for subj, bucket in zip(back.column("subj").to_pylist(),
                            back.column("subj_bucket").to_pylist()):
        assert int(bucket) == tr.subj_bucket(subj, 4)


def test_unit_truncation_flag(ray_session):
    """Units cut at max_unit_chars carry truncated=True; content_sha
    stays the FULL-content sha (the reconstruction invariant is scoped
    to truncated=False rows)."""
    import hashlib
    import pyarrow as pa
    from nerfray.stages import unitize

    long_line = "x" * (unitize.MAX_UNIT_CHARS + 500)
    content = "short line\n" + long_line
    batch = pa.Table.from_pydict({
        "repo": ["r"], "path": ["p"], "lang": ["python"],
        "content": [content]})
    units = unitize.unitize(batch)
    rows = {r["unit_id"]: r for r in units.to_pylist()}
    assert rows[0]["truncated"] is False
    assert rows[1]["truncated"] is True
    assert len(rows[1]["text"]) == unitize.MAX_UNIT_CHARS
    full_sha = hashlib.sha256(content.encode()).hexdigest()
    assert rows[0]["content_sha"] == full_sha
    assert rows[1]["content_sha"] == full_sha
    # non-truncated rows reconstruct their slice of content exactly
    assert content.split("\n")[0] == rows[0]["text"]


def test_subject_containment_validation_and_checked_dedup(ray_session):
    """validate_subject_containment inspects the blocks that actually
    reach the dedup; dedup_triples_checked stays exact even when a repo
    straddles blocks (the fallback shuffle path)."""
    import pyarrow as pa
    import ray.data
    from nerfray.stages import triples as tr

    def tbl(rows):
        return pa.Table.from_pydict({
            "subj": pa.array([r[0] for r in rows]),
            "pred": pa.array([r[1] for r in rows]),
            "obj": pa.array([r[2] for r in rows])})

    a = [("org/repo-1", "imports", "lib:os"),
         ("org/repo-1/src/f.py", "defines", "sym:f")]
    b = [("org/repo-1", "imports", "lib:os"),      # dup across blocks
         ("org/repo-2", "imports", "lib:sys")]
    straddling = ray.data.from_arrow(tbl(a)).union(
        ray.data.from_arrow(tbl(b))).materialize()
    assert tr.validate_subject_containment(straddling) is False

    contained = ray.data.from_arrow(tbl(a)).union(
        ray.data.from_arrow(tbl([b[1]]))).materialize()
    assert tr.validate_subject_containment(contained) is True

    got = {(r["subj"], r["pred"], r["obj"])
           for r in tr.dedup_triples_checked(straddling).take_all()}
    assert got == set(a) | set(b)  # exact despite broken containment


def test_adjacency_export_block_invariance(ray_session):
    import ray.data
    from nerfray.stages import triples as tm
    t = pa.Table.from_pydict({
        "subj": pa.array(["a", "b", "a", "a", "b"], pa.string()),
        "pred": pa.array(["p", "p", "q", "p", "r"], pa.string()),
        "obj": pa.array(["x", "y", "z", "w", "v"], pa.string()),
    })
    want = [("a", 3, "p>w|p>x|q>z"), ("b", 2, "p>y|r>v")]
    for parts in (1, 4):
        ds = ray.data.from_arrow(t).repartition(parts)
        got = sorted((r["subj"], r["n_edges"], r["adj"])
                     for r in tm.adjacency_export(ds).take_all())
        assert got == want, parts


def test_kg_delta_matches_set_diff(ray_session):
    """The distributed anti-join delta must equal the brute-force diff
    of the two versions' gold triple sets — including the dedup
    subtlety: a file leaving v1 only removes a triple if NO surviving
    file emits it."""
    from nerfray import corpus
    from nerfray.pipelines import kg
    sf = "/root/testdata/sf0.001"
    n = 500
    v1 = set().union(*(corpus.gold_triples(i, n) for i in range(n)
                       if i % 3 != 2))
    v2 = set().union(*(corpus.gold_triples(i, n) for i in range(n)
                       if i % 7 != 0))
    want = sorted([("add",) + t for t in v2 - v1]
                  + [("del",) + t for t in v1 - v2])
    got = sorted((r["op"], r["subj"], r["pred"], r["obj"])
                 for r in kg.kg_delta(sf).take_all())
    assert got == want
    # the dedup subtlety is actually exercised: some dropped v1 file
    # shares each of its repo-grain triples with a surviving file
    per_file_dropped = set().union(
        *(corpus.gold_triples(i, n) for i in range(n) if i % 3 == 2))
    assert per_file_dropped & v1 & v2, "planted overlap vanished"


def test_write_by_subject_hash_layout(ray_session, tmp_path):
    """Hive-partitioned materialize: every subject's triples land in
    exactly one pb=K directory, layout is hash-stable, and the read-back
    multiset equals the input."""
    import collections
    import os
    import pandas as pd
    import pyarrow as pa
    import numpy as np
    import ray.data
    from nerfray.stages import triples as tm
    tbl = pa.Table.from_pydict({
        "subj": pa.array([f"org/repo-{i % 7}/f{i}.py" for i in range(200)],
                         pa.string()),
        "pred": pa.array(["imports"] * 200, pa.string()),
        "obj": pa.array([f"lib{i % 11}" for i in range(200)], pa.string()),
    })
    out = str(tmp_path / "kg")
    tm.write_by_subject_hash(ray.data.from_arrow(tbl).repartition(4), out,
                             n_partitions=8)
    back = ray.data.read_parquet(out).take_all()
    assert len(back) == 200
    got = collections.Counter((r["subj"], r["pred"], r["obj"]) for r in back)
    want = collections.Counter(zip(*[tbl.column(c).to_pylist()
                                     for c in ("subj", "pred", "obj")]))
    assert got == want
    # each row sits in its hash partition; each subject in ONE partition
    sub_part = {}
    for r in back:
        arr = np.empty(1, object); arr[:] = [r["subj"]]
        k = int(pd.util.hash_array(arr)[0]) % 8  # int() BEFORE %: uint64%int promotes to float64
        assert int(r["pb"]) == k  # hive partition key reads back as str
        sub_part.setdefault(r["subj"], set()).add(int(r["pb"]))
    assert all(len(v) == 1 for v in sub_part.values())
    assert any(d.startswith("pb=") for d in os.listdir(out))
