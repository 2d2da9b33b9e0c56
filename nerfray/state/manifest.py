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


def run_checkpointed(n: int, out_dir: str, *, n_shards: int = 8,
                     tagger: str = "crf") -> dict:
    """Run (or resume) the full pipeline; returns run summary with
    per-shard status ('cached' = skipped via manifest)."""
    os.makedirs(out_dir, exist_ok=True)
    summary = {"shards": {}, "n_shards": 0, "n_cached": 0}
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


def read_triples(out_dir: str) -> ray.data.Dataset:
    """Merged, globally-deduped triples of a (possibly resumed) run.
    Only reads shards with a committed manifest."""
    shard_ids = []
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    for name in sorted(os.listdir(mdir)):
        with open(os.path.join(mdir, name)) as f:
            m = json.load(f)
        if m.get("complete"):
            shard_ids.append(m["shard_id"])
    paths = [os.path.join(out_dir, f"shard={k}", f)
             for k in shard_ids
             for f in sorted(os.listdir(os.path.join(out_dir, f"shard={k}")))
             if f.endswith(".parquet")]
    ds = ray.data.read_parquet(paths)
    from ..stages import triples as tr
    return tr.dedup_triples(ds)


def counters(out_dir: str) -> dict:
    """Merged per-shard counters (read-time merge, SURVEY.md §7.4.5)."""
    out = {"n_triples_pre_dedup": 0, "n_input_rows": 0, "n_shards": 0}
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    for name in sorted(os.listdir(mdir)):
        with open(os.path.join(mdir, name)) as f:
            m = json.load(f)
        if m.get("complete"):
            out["n_triples_pre_dedup"] += m["n_triples"]
            out["n_input_rows"] += m["n_input_rows"]
            out["n_shards"] += 1
    return out
