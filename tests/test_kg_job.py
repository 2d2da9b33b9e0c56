"""tools/kg_job.py — the `ray job submit` entrypoint, both input modes."""

import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from tools import kg_job  # noqa: E402


def _write_corpus_parquet(tmp_path, n=60):
    from nerfray import corpus
    cols = corpus.synth_rows(list(range(n)), n)
    t = pa.Table.from_pydict(
        {k: cols[k] for k in ("repo", "path", "commit", "lang", "content")})
    p = os.path.join(tmp_path, "corpus.parquet")
    pq.write_table(t, p)
    return p, t


def test_kg_job_parquet_mode(ray_session, tmp_path, capsys):
    """Real-parquet input -> subject-hash hive layout; triple set equals
    the library pipeline on the same synthetic rows."""
    import ray.data
    from nerfray.pipelines import kg
    from nerfray.sources.corpus_source import corpus_dataset

    p, _ = _write_corpus_parquet(str(tmp_path))
    out = os.path.join(str(tmp_path), "triples")
    rc = kg_job.main(["--input", p, "--output", out,
                      "--tagger", "rule", "--buckets", "8"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["mode"] == "parquet"
    buckets = [d for d in os.listdir(out) if d.startswith("pb=")]
    assert buckets, out
    got = ray.data.read_parquet(out)
    want = kg.kg_pipeline(corpus_dataset(60), tagger="rule")
    g = {(r["subj"], r["pred"], r["obj"]) for r in
         got.select_columns(["subj", "pred", "obj"]).take_all()}
    w = {(r["subj"], r["pred"], r["obj"]) for r in want.take_all()}
    assert g == w
    assert summary["n_triples"] == len(w)


def test_kg_job_synthetic_mode_resumes(ray_session, tmp_path, capsys):
    """Synthetic mode runs the checkpointed shard runner; a second
    invocation of the SAME command is a full cache hit."""
    out = os.path.join(str(tmp_path), "ckpt")
    rc = kg_job.main(["--synthetic", "40", "--output", out,
                      "--tagger", "rule", "--shards", "3"])
    assert rc == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s1["n_shards"] == 3 and s1["n_cached"] == 0
    rc = kg_job.main(["--synthetic", "40", "--output", out,
                      "--tagger", "rule", "--shards", "3"])
    assert rc == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["n_cached"] == 3
    assert s2["counters"] == s1["counters"]


def test_kg_job_parquet_checkpoint_resume(ray_session, tmp_path, capsys):
    """Parquet mode with --checkpoint-dir: shard = input FILE; the
    second run of the same command is a full cache hit and the final
    subject-hash output equals the direct (uncheckpointed) path."""
    import ray.data

    # two input files so resume granularity is visible
    from nerfray import corpus
    cols = corpus.synth_rows(list(range(60)), 60)
    t = pa.Table.from_pydict(
        {k: cols[k] for k in ("repo", "path", "commit", "lang", "content")})
    indir = os.path.join(str(tmp_path), "corpus")
    os.makedirs(indir)
    pq.write_table(t.slice(0, 30), os.path.join(indir, "a.parquet"))
    pq.write_table(t.slice(30), os.path.join(indir, "b.parquet"))

    out1 = os.path.join(str(tmp_path), "t1")
    ck = os.path.join(str(tmp_path), "ck")
    rc = kg_job.main(["--input", indir, "--output", out1,
                      "--tagger", "rule", "--buckets", "4",
                      "--checkpoint-dir", ck])
    assert rc == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s1["n_shards"] == 2 and s1["n_cached"] == 0

    out2 = os.path.join(str(tmp_path), "t2")
    rc = kg_job.main(["--input", indir, "--output", out2,
                      "--tagger", "rule", "--buckets", "4",
                      "--checkpoint-dir", ck])
    assert rc == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["n_cached"] == 2 and s2["n_triples"] == s1["n_triples"]

    out3 = os.path.join(str(tmp_path), "t3")
    rc = kg_job.main(["--input", indir, "--output", out3,
                      "--tagger", "rule", "--buckets", "4"])
    assert rc == 0
    s3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    tri = lambda p: {(r["subj"], r["pred"], r["obj"]) for r in
                     ray.data.read_parquet(p)
                     .select_columns(["subj", "pred", "obj"]).take_all()}
    assert tri(out1) == tri(out3)
    assert s3["n_triples"] == s1["n_triples"]


def test_lookup_subject_prunes_to_one_bucket(ray_session, tmp_path):
    """Point lookup reads only the subject's pb=K directory and returns
    exactly the full-scan answer; absent subjects return 0 rows."""
    import pyarrow as pa
    import ray.data
    from nerfray.stages import triples as tstage

    trips = [(f"org/repo-{i}", "imports", f"lib:l{i % 5}")
             for i in range(40)]
    ds = ray.data.from_arrow(pa.Table.from_pydict({
        "subj": pa.array([t[0] for t in trips]),
        "pred": pa.array([t[1] for t in trips]),
        "obj": pa.array([t[2] for t in trips])}))
    out = os.path.join(str(tmp_path), "hive")
    tstage.write_by_subject_hash(ds, out, n_partitions=8)

    for subj in ("org/repo-3", "org/repo-17"):
        got = tstage.lookup_subject(out, subj, n_partitions=8).take_all()
        assert {(r["subj"], r["pred"], r["obj"]) for r in got} == \
            {t for t in trips if t[0] == subj}
    assert tstage.lookup_subject(out, "org/none",
                                 n_partitions=8).count() == 0


def test_lookup_object_via_secondary_index(ray_session, tmp_path):
    """Reverse lookup returns exactly the full-scan answer while
    opening only the partitions the index names; a rare object prunes
    to one partition, an absent object reads zero data partitions."""
    import pyarrow as pa
    import ray.data
    from nerfray.stages import triples as tstage

    trips = [(f"org/repo-{i}", "imports", f"lib:l{i % 5}")
             for i in range(40)]
    trips.append(("org/repo-0", "licensed-under", "license:rare"))
    ds = ray.data.from_arrow(pa.Table.from_pydict({
        "subj": pa.array([t[0] for t in trips]),
        "pred": pa.array([t[1] for t in trips]),
        "obj": pa.array([t[2] for t in trips])}))
    store = os.path.join(str(tmp_path), "store")
    idx = os.path.join(str(tmp_path), "idx")
    tstage.write_by_subject_hash(ds, store, n_partitions=8)
    tstage.write_object_index(store, idx, n_idx_partitions=4)

    for obj in ("lib:l2", "license:rare"):
        got, stats = tstage.lookup_object(store, idx, obj,
                                          n_partitions=8,
                                          n_idx_partitions=4)
        want = {t for t in trips if t[2] == obj}
        assert {(r["subj"], r["pred"], r["obj"])
                for r in got.take_all()} == want
        assert 0 < stats["partitions_read"] <= 8
    # the rare object lives under exactly one subject -> one partition
    _, st = tstage.lookup_object(store, idx, "license:rare",
                                 n_partitions=8, n_idx_partitions=4)
    assert st["partitions_read"] == 1
    # absent object: index bucket empty -> zero data partitions opened
    res, st0 = tstage.lookup_object(store, idx, "lib:none",
                                    n_partitions=8, n_idx_partitions=4)
    assert st0["partitions_read"] == 0 and res.count() == 0


def test_read_parquet_evolved_defaults(ray_session, tmp_path):
    """Old files take the registered default (NOT NULL DEFAULT
    semantics: every null of a defaulted column fills, matching SQL
    column defaults); non-null values pass through untouched."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from nerfray.sources.parquet import read_parquet_evolved

    v1 = os.path.join(str(tmp_path), "v1.parquet")
    v2 = os.path.join(str(tmp_path), "v2.parquet")
    pq.write_table(pa.table({"k": ["a", "b"]}), v1)
    pq.write_table(pa.table({"k": ["c", "d"],
                             "conf": pa.array([7, None], pa.int64())}),
                   v2)
    target = pa.schema([("k", pa.string()), ("conf", pa.int64())])
    rows = {r["k"]: r["conf"]
            for r in read_parquet_evolved(
                [v1, v2], target_schema=target,
                defaults={"conf": 50}).take_all()}
    assert rows == {"a": 50, "b": 50, "c": 7, "d": 50}
