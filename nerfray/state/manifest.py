"""Checkpointed, resumable pipeline runs (SURVEY.md §4 "checkpoint /
resume", §7.4.5; BASELINE.json north_star: "Every partition records
lineage and counters to a checkpoint manifest so any stage resumes
idempotently").

Layout under ``out_dir``:

    shard=K/*.parquet          triples of corpus rows [lo, hi)
    _manifests/shard-K.json    lineage + counters, written ATOMICALLY
                               (temp + rename) only after the shard's
                               data is fully on disk

A shard is the resume granularity: on (re)run, shards whose manifest is
complete and whose input fingerprint matches are skipped entirely. A
crashed shard leaves data without a manifest — its partial output is
overwritten on retry, so triples are never double-emitted (the manifest
is the commit record, the rename is the commit point).

Shard-level triples are deduped within the shard; repo-grain triples can
recur across shards (a repo's files span shards), so ``read_triples``
finishes with a global exact dedup — idempotent under any re-execution.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile

import ray.data

from .. import corpus as corpus_mod
from ..pipelines import kg
from ..sources import corpus_source

MANIFEST_DIR = "_manifests"


def shard_bounds(n: int, n_shards: int) -> list[tuple[int, int, int]]:
    """(shard_id, lo, hi) covering [0, n)."""
    per = -(-n // n_shards)
    return [(k, k * per, min(n, (k + 1) * per))
            for k in range(n_shards) if k * per < n]


def _manifest_path(out_dir: str, shard_id: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"shard-{shard_id}.json")


def _input_fingerprint(n: int, lo: int, hi: int, tagger: str) -> str:
    key = json.dumps({"n": n, "lo": lo, "hi": hi, "tagger": tagger,
                      "corpus_version": corpus_mod.CORPUS_VERSION},
                     sort_keys=True)
    return hashlib.sha256(key.encode()).hexdigest()[:16]


def load_manifest(out_dir: str, shard_id: int) -> dict | None:
    path = _manifest_path(out_dir, shard_id)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _write_manifest(out_dir: str, shard_id: int, payload: dict) -> None:
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.join(out_dir, MANIFEST_DIR))
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(out_dir, shard_id))  # commit point


def run_shard(n: int, lo: int, hi: int, shard_dir: str,
              tagger: str) -> dict:
    """Run the pipeline over corpus rows [lo, hi), write shard parquet,
    return counters."""
    if os.path.exists(shard_dir):
        shutil.rmtree(shard_dir)  # partial output from a crashed attempt
    ds = corpus_source.corpus_slice(n, lo, hi)
    trips = kg.kg_pipeline(ds, tagger=tagger)
    trips.write_parquet(shard_dir)
    import pyarrow.dataset as pads
    t = pads.dataset(shard_dir).to_table()
    rows = sorted(zip(t.column("subj").to_pylist(),
                      t.column("pred").to_pylist(),
                      t.column("obj").to_pylist()))
    content_sha = hashlib.sha256(
        "\n".join("\t".join(r) for r in rows).encode()).hexdigest()
    return {"n_triples": len(rows), "triples_sha256": content_sha,
            "n_input_rows": hi - lo}


def _expected_fps(n: int, n_shards: int, tagger: str) -> dict[int, str]:
    return {shard_id: _input_fingerprint(n, lo, hi, tagger)
            for shard_id, lo, hi in shard_bounds(n, n_shards)}


def _run_manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, "run.json")


def load_run_manifest(out_dir: str) -> dict | None:
    path = _run_manifest_path(out_dir)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _sweep_stale_shards(out_dir: str, expected: dict[int, str]) -> int:
    """Delete shard manifests (and data) left by a DIFFERENT run
    configuration — an out_dir reused with a smaller n_shards or a
    changed corpus would otherwise leak old shards into read_triples.
    The input fingerprint covers (n, lo, hi, tagger, corpus_version),
    so config-mismatched shards are exactly the fp-mismatched ones."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return 0
    swept = 0
    for name in sorted(os.listdir(mdir)):
        if not name.startswith("shard-"):
            continue
        with open(os.path.join(mdir, name)) as f:
            m = json.load(f)
        sid = m.get("shard_id")
        if m.get("input_fp") == expected.get(sid):
            continue
        os.remove(os.path.join(mdir, name))
        shutil.rmtree(os.path.join(out_dir, f"shard={sid}"),
                      ignore_errors=True)
        swept += 1
    return swept


def run_checkpointed(n: int, out_dir: str, *, n_shards: int = 8,
                     tagger: str = "crf") -> dict:
    """Run (or resume) the full pipeline; returns run summary with
    per-shard status ('cached' = skipped via manifest). Reusing an
    out_dir with a different configuration first sweeps the stale
    shards, then records the current config in a run manifest so
    read_triples / counters only see this configuration's shards."""
    os.makedirs(out_dir, exist_ok=True)
    expected = _expected_fps(n, n_shards, tagger)
    swept = _sweep_stale_shards(out_dir, expected)
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.join(out_dir, MANIFEST_DIR))
    with os.fdopen(fd, "w") as f:
        json.dump({"n": n, "n_shards": n_shards, "tagger": tagger,
                   "corpus_version": corpus_mod.CORPUS_VERSION,
                   "expected_fps": {str(k): v for k, v in expected.items()}},
                  f, indent=1, sort_keys=True)
    os.replace(tmp, _run_manifest_path(out_dir))
    summary = {"shards": {}, "n_shards": 0, "n_cached": 0,
               "n_swept_stale": swept}
    for shard_id, lo, hi in shard_bounds(n, n_shards):
        fp = _input_fingerprint(n, lo, hi, tagger)
        m = load_manifest(out_dir, shard_id)
        if m is not None and m.get("complete") and m.get("input_fp") == fp:
            summary["shards"][shard_id] = "cached"
            summary["n_cached"] += 1
            continue
        shard_dir = os.path.join(out_dir, f"shard={shard_id}")
        counters = run_shard(n, lo, hi, shard_dir, tagger)
        _write_manifest(out_dir, shard_id, {
            "complete": True,
            "shard_id": shard_id,
            "lo": lo, "hi": hi,
            "input_fp": fp,
            "tagger": tagger,
            **counters,
        })
        summary["shards"][shard_id] = "ran"
    summary["n_shards"] = len(summary["shards"])
    return summary


def _valid_shard_manifests(out_dir: str):
    """Committed shard manifests belonging to the CURRENT run config
    (per the run manifest, when present — stale-config shards are
    excluded even if a sweep never ran)."""
    run_m = load_run_manifest(out_dir)
    expected = run_m.get("expected_fps") if run_m else None
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    for name in sorted(os.listdir(mdir)):
        if not name.startswith("shard-"):
            continue
        with open(os.path.join(mdir, name)) as f:
            m = json.load(f)
        if not m.get("complete"):
            continue
        if expected is not None and \
                m.get("input_fp") != expected.get(str(m.get("shard_id"))):
            continue
        yield m


def read_triples(out_dir: str) -> ray.data.Dataset:
    """Merged, globally-deduped triples of a (possibly resumed) run.
    Only reads shards with a committed manifest matching the run
    configuration."""
    shard_ids = [m["shard_id"] for m in _valid_shard_manifests(out_dir)]
    paths = [os.path.join(out_dir, f"shard={k}", f)
             for k in shard_ids
             for f in sorted(os.listdir(os.path.join(out_dir, f"shard={k}")))
             if f.endswith(".parquet")]
    from ..sources.parquet import read_parquet_clean
    ds = read_parquet_clean(paths)
    from ..stages import triples as tr
    return tr.dedup_triples(ds)


def counters(out_dir: str) -> dict:
    """Merged per-shard counters (read-time merge, SURVEY.md §7.4.5),
    scoped to the current run configuration's shards."""
    out = {"n_triples_pre_dedup": 0, "n_input_rows": 0, "n_shards": 0}
    for m in _valid_shard_manifests(out_dir):
        out["n_triples_pre_dedup"] += m["n_triples"]
        out["n_input_rows"] += m["n_input_rows"]
        out["n_shards"] += 1
    return out


# ---------------------------------------------------------------------------
# parquet-input mode: shard = one input file (north_rule resumability
# for REAL corpora, not just the synthetic generator)
# ---------------------------------------------------------------------------


def _parquet_shard_files(input_path: str) -> list[str]:
    """One shard per input parquet file; accepts a file, a directory
    (recursive), or a glob."""
    import glob as _glob
    if os.path.isdir(input_path):
        files = sorted(_glob.glob(
            os.path.join(input_path, "**", "*.parquet"), recursive=True))
    elif any(c in input_path for c in "*?["):
        files = sorted(_glob.glob(input_path))
    else:
        files = [input_path]
    if not files:
        raise FileNotFoundError(f"no parquet inputs under {input_path}")
    return files


def _parquet_fp(path: str, tagger: str) -> str:
    """Input-file fingerprint: absolute path + byte size + row count +
    tagger — a replaced/regrown input file invalidates its shard, a
    byte-identical re-upload does not."""
    import pyarrow.parquet as pq
    key = json.dumps({
        "path": os.path.abspath(path),
        "bytes": os.stat(path).st_size,
        "rows": pq.read_metadata(path).num_rows,
        "tagger": tagger,
    }, sort_keys=True)
    return hashlib.sha256(key.encode()).hexdigest()[:16]


def _commit_shard(trips: ray.data.Dataset, shard_dir: str) -> dict:
    """Write a shard's triples and return its counters. The content
    sha is computed over the (bounded) shard, not the whole run."""
    if os.path.exists(shard_dir):
        shutil.rmtree(shard_dir)  # partial output from a crashed attempt
    trips.write_parquet(shard_dir)
    import pyarrow.dataset as pads
    t = pads.dataset(shard_dir).to_table()
    rows = sorted(zip(t.column("subj").to_pylist(),
                      t.column("pred").to_pylist(),
                      t.column("obj").to_pylist()))
    content_sha = hashlib.sha256(
        "\n".join("\t".join(r) for r in rows).encode()).hexdigest()
    return {"n_triples": len(rows), "triples_sha256": content_sha}


def run_checkpointed_parquet(input_path: str, out_dir: str, *,
                             tagger: str = "crf") -> dict:
    """Run (or resume) the KG pipeline over real corpus parquet files;
    shard granularity = input file, so a re-run after a crash skips
    every input file whose manifest committed.  Same layout and
    read-time merge as the synthetic runner (``read_triples`` /
    ``counters`` work unchanged)."""
    files = _parquet_shard_files(input_path)
    expected = {k: _parquet_fp(f, tagger) for k, f in enumerate(files)}
    os.makedirs(out_dir, exist_ok=True)
    swept = _sweep_stale_shards(out_dir, expected)
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.join(out_dir, MANIFEST_DIR))
    with os.fdopen(fd, "w") as f:
        json.dump({"mode": "parquet", "tagger": tagger,
                   "files": [os.path.abspath(p) for p in files],
                   "expected_fps": {str(k): v
                                    for k, v in expected.items()}},
                  f, indent=1, sort_keys=True)
    os.replace(tmp, _run_manifest_path(out_dir))
    summary = {"shards": {}, "n_shards": 0, "n_cached": 0,
               "n_swept_stale": swept}
    from ..sources.corpus_source import corpus_from_parquet
    for k, path in enumerate(files):
        m = load_manifest(out_dir, k)
        if m is not None and m.get("complete") \
                and m.get("input_fp") == expected[k]:
            summary["shards"][k] = "cached"
            summary["n_cached"] += 1
            continue
        ds = corpus_from_parquet(path)
        n_input = ds.count()
        trips = kg.kg_pipeline(ds, tagger=tagger,
                               dedup="partitioned_checked")
        counters_k = _commit_shard(
            trips, os.path.join(out_dir, f"shard={k}"))
        _write_manifest(out_dir, k, {
            "complete": True,
            "shard_id": k,
            "input_file": os.path.abspath(path),
            "input_fp": expected[k],
            "tagger": tagger,
            "n_input_rows": n_input,
            **counters_k,
        })
        summary["shards"][k] = "ran"
    summary["n_shards"] = len(summary["shards"])
    return summary


# ---------------------------------------------------------------------------
# small-file compaction (storage maintenance over the triple store)
# ---------------------------------------------------------------------------
#
# A 100-TB store accumulating shard-grain parquet grows a long tail of
# small files (every resume, every incremental shard); scan cost and
# scheduler pressure are per-FILE, so periodic compaction — bin-packing
# small files into ~target_rows outputs — is routine maintenance.  The
# compactor follows the same commit discipline as shards: each bin lands
# via temp + rename, the compaction manifest (fingerprinting the exact
# source files it covered) is the commit point, and a store whose shards
# changed since (resume, re-run, different config) invalidates the
# compaction automatically — readers fall back to the shard files, so a
# stale or crashed compaction can never change query results.  Bins
# compact in PARALLEL (one bounded Ray task per bin; a bin holds
# <= target_rows rows by construction, so per-task memory is capped).

COMPACT_DIR = "_compacted"


def _store_files(out_dir: str) -> list[str]:
    """Data files of the current run config's committed shards, in
    deterministic order."""
    return [os.path.join(out_dir, f"shard={m['shard_id']}", f)
            for m in _valid_shard_manifests(out_dir)
            for f in sorted(os.listdir(
                os.path.join(out_dir, f"shard={m['shard_id']}")))
            if f.endswith(".parquet")]


def _store_fp(files: list[str], target_rows: int) -> str:
    """Fingerprint of the exact bytes a compaction covers."""
    key = json.dumps({
        "files": [[os.path.abspath(p), os.stat(p).st_size]
                  for p in files],
        "target_rows": target_rows,
    }, sort_keys=True)
    return hashlib.sha256(key.encode()).hexdigest()[:16]


def _compaction_manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, COMPACT_DIR, "manifest.json")


def load_compaction(out_dir: str) -> dict | None:
    path = _compaction_manifest_path(out_dir)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def compact_plan(files: list[str], *, target_rows: int
                 ) -> list[list[str]]:
    """Greedy consecutive bin-packing of data files into bins of about
    ``target_rows`` rows (row counts from footers only). A file larger
    than target_rows forms its own bin — compaction merges, never
    splits."""
    import pyarrow.parquet as pq
    bins: list[list[str]] = []
    cur: list[str] = []
    cur_rows = 0
    for p in files:
        rows = pq.read_metadata(p).num_rows
        if cur and cur_rows + rows > target_rows:
            bins.append(cur)
            cur, cur_rows = [], 0
        cur.append(p)
        cur_rows += rows
    if cur:
        bins.append(cur)
    return bins


def compact_store(out_dir: str, *, target_rows: int = 1_000_000) -> dict:
    """Compact the store's committed shard files into ~target_rows
    bins under ``_compacted/``. Idempotent: a committed compaction
    whose fingerprint still matches the live shard files is a no-op
    ('cached'); any shard change re-compacts from scratch."""
    files = _store_files(out_dir)
    fp = _store_fp(files, target_rows)
    existing = load_compaction(out_dir)
    if existing is not None and existing.get("complete") \
            and existing.get("store_fp") == fp:
        return {"status": "cached", "n_bins": existing["n_bins"],
                "n_source_files": len(files)}

    cdir = os.path.join(out_dir, COMPACT_DIR)
    if os.path.exists(cdir):
        shutil.rmtree(cdir)  # stale or crashed previous compaction
    os.makedirs(cdir)
    bins = compact_plan(files, target_rows=target_rows)

    @ray.remote
    def _compact_bin(paths: list[str], dest: str) -> int:
        import pyarrow as pa
        import pyarrow.parquet as pq
        t = pa.concat_tables([pq.read_table(p) for p in paths])
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(dest),
                                   suffix=".tmp")
        os.close(fd)
        pq.write_table(t, tmp)
        os.replace(tmp, dest)  # per-bin commit
        return t.num_rows

    refs = []
    for k, bin_paths in enumerate(bins):
        os.makedirs(os.path.join(cdir, f"bin={k}"), exist_ok=True)
        dest = os.path.join(cdir, f"bin={k}", "part.parquet")
        refs.append(_compact_bin.remote(bin_paths, dest))
    rows_per_bin = ray.get(refs)

    payload = {
        "complete": True,
        "store_fp": fp,
        "target_rows": target_rows,
        "n_bins": len(bins),
        "n_source_files": len(files),
        "rows_per_bin": rows_per_bin,
        "bins": [[os.path.abspath(p) for p in b] for b in bins],
    }
    fd, tmp = tempfile.mkstemp(dir=cdir)
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, _compaction_manifest_path(out_dir))  # commit point
    return {"status": "compacted", "n_bins": len(bins),
            "n_source_files": len(files)}


def read_triples_compacted(out_dir: str) -> ray.data.Dataset:
    """read_triples, preferring the compacted layout when its committed
    manifest still matches the live shard files; otherwise (no
    compaction, stale compaction, crashed compaction) falls back to the
    shard files — results are identical either way."""
    m = load_compaction(out_dir)
    files = _store_files(out_dir)
    if m is None or not m.get("complete") \
            or m.get("store_fp") != _store_fp(files,
                                              m.get("target_rows", -1)):
        return read_triples(out_dir)
    paths = [os.path.join(out_dir, COMPACT_DIR, f"bin={k}",
                          "part.parquet")
             for k in range(m["n_bins"])]
    from ..sources.parquet import read_parquet_clean
    from ..stages import triples as tr
    return tr.dedup_triples(read_parquet_clean(paths))


# ---------------------------------------------------------------------------
# store garbage collection (orphans, stale configs, dead compactions)
# ---------------------------------------------------------------------------
#
# Long-lived stores accumulate dead bytes: shard directories from a
# previous configuration, compactions invalidated by a later resume,
# tmp files from crashed commits.  GC walks the store, classifies every
# file as live (reachable from the CURRENT run manifest's shards, the
# currently-valid compaction, or a manifest itself) or garbage, and —
# only outside dry-run — deletes the garbage.  Readers never race it:
# everything GC deletes is by definition unreachable through
# read_triples / read_triples_compacted, which resolve strictly via
# manifests.

def gc_store(out_dir: str, *, dry_run: bool = True) -> dict:
    """Classify (and optionally delete) unreachable files. Returns
    {n_live, n_garbage, garbage_bytes, removed: [paths], dry_run}."""
    live: set[str] = set()

    # manifests + run manifest are always live
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if os.path.isdir(mdir):
        for f in os.listdir(mdir):
            live.add(os.path.join(mdir, f))

    # data files of the current config's committed shards
    valid_ids = set()
    for m in _valid_shard_manifests(out_dir):
        valid_ids.add(m["shard_id"])
    for k in valid_ids:
        sdir = os.path.join(out_dir, f"shard={k}")
        if os.path.isdir(sdir):
            for f in os.listdir(sdir):
                live.add(os.path.join(sdir, f))

    # the compaction, iff still valid against the live shard files
    comp = load_compaction(out_dir)
    if comp is not None and comp.get("complete") \
            and comp.get("store_fp") == _store_fp(
                _store_files(out_dir), comp.get("target_rows", -1)):
        live.add(_compaction_manifest_path(out_dir))
        for k in range(comp["n_bins"]):
            bdir = os.path.join(out_dir, COMPACT_DIR, f"bin={k}")
            if os.path.isdir(bdir):
                for f in os.listdir(bdir):
                    live.add(os.path.join(bdir, f))

    garbage: list[str] = []
    g_bytes = 0
    for root, _dirs, files in os.walk(out_dir):
        for f in files:
            p = os.path.join(root, f)
            if p not in live:
                garbage.append(p)
                g_bytes += os.stat(p).st_size
    report = {"n_live": len(live), "n_garbage": len(garbage),
              "garbage_bytes": g_bytes, "removed": sorted(garbage),
              "dry_run": dry_run}
    if not dry_run:
        for p in garbage:
            os.remove(p)
        # drop now-empty directories (bottom-up)
        for root, dirs, files in os.walk(out_dir, topdown=False):
            if root != out_dir and not os.listdir(root):
                os.rmdir(root)
    return report
