"""Checkpoint-manifest resume semantics (FIXTURES.md F7; north_star)."""

import json
import os
import shutil

from nerfray import corpus
from nerfray.state import manifest


N = 90


def _triples(ray_session, out_dir):
    return {(r["subj"], r["pred"], r["obj"])
            for r in manifest.read_triples(out_dir).take_all()}


def test_checkpointed_run_and_resume(ray_session, tmp_path):
    out = str(tmp_path / "run")
    s1 = manifest.run_checkpointed(N, out, n_shards=3, tagger="rule")
    assert s1["n_cached"] == 0 and s1["n_shards"] == 3
    gold = corpus.gold_triples_all(N)
    assert _triples(ray_session, out) == gold

    # full re-run: everything cached, nothing recomputed
    s2 = manifest.run_checkpointed(N, out, n_shards=3, tagger="rule")
    assert s2["n_cached"] == 3
    assert _triples(ray_session, out) == gold

    # crash simulation: shard 1 lost its manifest (data may be partial)
    os.remove(manifest._manifest_path(out, 1))
    shutil.rmtree(os.path.join(out, "shard=1"))
    s3 = manifest.run_checkpointed(N, out, n_shards=3, tagger="rule")
    assert s3["shards"] == {0: "cached", 1: "ran", 2: "cached"}
    assert _triples(ray_session, out) == gold  # idempotent: no dupes, no loss

    # counters merge at read time
    c = manifest.counters(out)
    assert c["n_shards"] == 3 and c["n_input_rows"] == N
    assert c["n_triples_pre_dedup"] >= len(gold)


def test_input_fingerprint_invalidates(ray_session, tmp_path):
    out = str(tmp_path / "run")
    manifest.run_checkpointed(N, out, n_shards=2, tagger="rule")
    # tamper: pretend shard 0 was built from different input
    p = manifest._manifest_path(out, 0)
    with open(p) as f:
        m = json.load(f)
    m["input_fp"] = "stale"
    with open(p, "w") as f:
        json.dump(m, f)
    s = manifest.run_checkpointed(N, out, n_shards=2, tagger="rule")
    assert s["shards"][0] == "ran" and s["shards"][1] == "cached"
    assert _triples(ray_session, out) == corpus.gold_triples_all(N)


def test_reconfigured_out_dir_sweeps_stale_shards(ray_session, tmp_path):
    """Reusing an out_dir with a different n_shards (or corpus size) must
    not leak the old configuration's shards into the merged result."""
    out = str(tmp_path / "run")
    manifest.run_checkpointed(N, out, n_shards=4, tagger="rule")
    # reconfigure: fewer shards AND a smaller corpus
    n2 = N - 30
    s = manifest.run_checkpointed(n2, out, n_shards=2, tagger="rule")
    assert s["n_swept_stale"] == 4  # every old shard invalidated
    assert s["n_cached"] == 0 and s["n_shards"] == 2
    assert _triples(ray_session, out) == corpus.gold_triples_all(n2)
    c = manifest.counters(out)
    assert c["n_shards"] == 2 and c["n_input_rows"] == n2

    # stale shards are also excluded at READ time even without a sweep:
    # plant a foreign manifest+data dir and confirm read ignores it
    import json as _json
    import os as _os
    fake = {"complete": True, "shard_id": 9, "lo": 0, "hi": 1,
            "input_fp": "deadbeef", "tagger": "rule", "n_triples": 0,
            "n_input_rows": 1, "triples_sha256": "x"}
    with open(manifest._manifest_path(out, 9), "w") as f:
        _json.dump(fake, f)
    _os.makedirs(_os.path.join(out, "shard=9"), exist_ok=True)
    assert _triples(ray_session, out) == corpus.gold_triples_all(n2)
    assert manifest.counters(out)["n_shards"] == 2


def test_compaction_preserves_triples_and_is_idempotent(ray_session,
                                                        tmp_path):
    out = str(tmp_path / "store")
    manifest.run_checkpointed(N, out, n_shards=3, tagger="rule")
    before = sorted(
        (r["subj"], r["pred"], r["obj"])
        for r in manifest.read_triples(out).take_all())
    n_files_before = len(manifest._store_files(out))

    r1 = manifest.compact_store(out, target_rows=10_000_000)
    assert r1["status"] == "compacted"
    assert r1["n_bins"] < n_files_before  # small files actually merged
    after = sorted(
        (r["subj"], r["pred"], r["obj"])
        for r in manifest.read_triples_compacted(out).take_all())
    assert after == before  # compaction is semantics-invisible

    r2 = manifest.compact_store(out, target_rows=10_000_000)
    assert r2["status"] == "cached"  # committed compaction is a no-op


def test_stale_compaction_falls_back_to_shards(ray_session, tmp_path):
    """A shard change after compaction invalidates it: readers use the
    live shard files; re-compacting re-covers the new store."""
    out = str(tmp_path / "store")
    manifest.run_checkpointed(N, out, n_shards=2, tagger="rule")
    manifest.compact_store(out, target_rows=10_000_000)

    # invalidate shard 0 and re-run it (simulates resume after change)
    os.remove(os.path.join(out, manifest.MANIFEST_DIR, "shard-0.json"))
    manifest.run_checkpointed(N, out, n_shards=2, tagger="rule")

    live = sorted((r["subj"], r["pred"], r["obj"])
                  for r in manifest.read_triples(out).take_all())
    via_compacted = sorted(
        (r["subj"], r["pred"], r["obj"])
        for r in manifest.read_triples_compacted(out).take_all())
    assert via_compacted == live  # stale compaction ignored

    r = manifest.compact_store(out, target_rows=10_000_000)
    assert r["status"] == "compacted"  # fingerprint change recompacts


def test_compact_plan_bins_consecutive_and_bounded(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    paths = []
    for i, rows in enumerate([10, 10, 10, 50, 10]):
        p = str(tmp_path / f"f{i}.parquet")
        pq.write_table(pa.table({"x": list(range(rows))}), p)
        paths.append(p)
    bins = manifest.compact_plan(paths, target_rows=25)
    assert bins == [paths[0:2], [paths[2]], [paths[3]], [paths[4]]]


def test_gc_removes_only_unreachable_files(ray_session, tmp_path):
    """GC classifies stale-config shards, invalidated compactions and
    crashed-commit tmp files as garbage; live data survives and reads
    are byte-identical before/after."""
    out = str(tmp_path / "store")
    manifest.run_checkpointed(N, out, n_shards=2, tagger="rule")
    manifest.compact_store(out, target_rows=10_000_000)

    # invalidate the compaction by re-running shard 0
    os.remove(os.path.join(out, manifest.MANIFEST_DIR, "shard-0.json"))
    manifest.run_checkpointed(N, out, n_shards=2, tagger="rule")
    # plant a crashed-commit leftover
    orphan = os.path.join(out, "tmp_crashed_upload")
    with open(orphan, "w") as f:
        f.write("partial")

    before = sorted((r["subj"], r["pred"], r["obj"])
                    for r in manifest.read_triples(out).take_all())

    dry = manifest.gc_store(out, dry_run=True)
    assert orphan in dry["removed"]
    assert any(manifest.COMPACT_DIR in p for p in dry["removed"])
    assert os.path.exists(orphan)  # dry run deletes nothing

    real = manifest.gc_store(out, dry_run=False)
    assert real["removed"] == dry["removed"]
    assert not os.path.exists(orphan)
    assert not os.path.isdir(os.path.join(out, manifest.COMPACT_DIR))

    after = sorted((r["subj"], r["pred"], r["obj"])
                   for r in manifest.read_triples(out).take_all())
    assert after == before
    # a fresh GC pass finds nothing left to collect
    assert manifest.gc_store(out, dry_run=True)["n_garbage"] == 0
    # and a valid compaction is LIVE (not collected)
    manifest.compact_store(out, target_rows=10_000_000)
    assert manifest.gc_store(out, dry_run=True)["n_garbage"] == 0
