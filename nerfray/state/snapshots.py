"""Snapshot-versioned triple store: commit log + time-travel reads.

The checkpoint store (state/manifest.py) answers "resume an interrupted
RUN"; this module answers the table-format question one level up:
"read the table AS OF an earlier commit, after later commits landed".
The mechanics are the public Iceberg/Delta recipe — an ordered commit
log of immutable snapshots, each adding data files and (optionally)
merge-on-read DELETE files — re-expressed over plain parquet + Ray
Data (no table-format library exists in the sandbox, and none is
needed for these semantics):

  _snapshots.json     ordered commit log, rewritten ATOMICALLY
                      (temp + os.replace) per commit — the commit point
  data files          immutable parquet, relative paths, appended by a
                      snapshot's "adds"; NEVER rewritten in place
  delete files        parquet of (subj, pred, obj) tombstones attached
                      to the snapshot that logically removed them;
                      applied at READ time (merge-on-read), so a v2
                      commit never touches v1's files and reading
                      as-of v1 stays byte-exact forever

Reads replay the log up to the requested snapshot: data files
accumulate, delete files apply only if committed at-or-before the
read snapshot. The tombstone anti-join runs distributed (ops.joins
.hash_join on the composite key) — the log itself is O(commits), the
only driver-side state.

``rewrite_current`` is the maintenance step (Iceberg's "rewrite data
files"): materialize the live row set into fresh files and commit a
snapshot with ``base`` semantics (earlier files no longer referenced
FROM that snapshot on), after which ``expire_snapshots`` + ``vacuum``
can reclaim everything only the expired history referenced.

At 100 TB the relevant properties: commits are metadata-only (one
small JSON rename — data files were already streamed out by the
pipeline); time-travel reads touch exactly the files the snapshot
references; deletes shuffle only tombstone-sized row sets; no stage
ever rewrites history to serve a new commit.

Reference anchor: the reference has no storage layer at all (it
re-reads its corpus per run, /root/reference/app/Main.hs:277-283);
this is part of the beyond-reference table-maintenance surface the
engine needs at corpus scale.
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid

import ray.data

SNAP_LOG = "_snapshots.json"
_TRIPLE_COLS = ["subj", "pred", "obj"]


def _log_path(store: str) -> str:
    return os.path.join(store, SNAP_LOG)


def load_log(store: str) -> list[dict]:
    """The ordered commit log ([] for an empty/new store)."""
    path = _log_path(store)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return json.load(f)


def _write_log(store: str, log: list[dict]) -> None:
    os.makedirs(store, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=store)
    with os.fdopen(fd, "w") as f:
        json.dump(log, f, indent=1, sort_keys=True)
    os.replace(tmp, _log_path(store))  # commit point


def write_data_files(ds: ray.data.Dataset, store: str,
                     subdir: str) -> list[str]:
    """Stream a Dataset to immutable parquet under ``store/subdir``;
    returns store-relative paths (the "adds" of a commit)."""
    dest = os.path.join(store, subdir)
    os.makedirs(dest, exist_ok=True)
    ds.write_parquet(dest)
    return sorted(os.path.join(subdir, f) for f in os.listdir(dest)
                  if f.endswith(".parquet"))


def commit(store: str, *, adds: list[str] | None = None,
           deletes: list[str] | None = None, base: bool = False,
           note: str = "") -> int:
    """Append one snapshot; returns its 1-based id. ``base=True`` marks
    a rewrite commit: snapshots from here on reference ONLY this
    commit's adds (history before it stays readable until expired)."""
    log = load_log(store)
    snap_id = (log[-1]["id"] + 1) if log else 1
    log.append({"id": snap_id, "parent": log[-1]["id"] if log else None,
                "adds": sorted(adds or []),
                "deletes": sorted(deletes or []),
                "base": bool(base), "note": note})
    _write_log(store, log)
    return snap_id


def snapshot_files(store: str, as_of: int) -> tuple[list[str], list[str]]:
    """(data_files, delete_files) visible at snapshot ``as_of`` —
    replay adds from the latest base commit <= as_of; deletes apply if
    committed in (base, as_of]."""
    log = load_log(store)
    chain = [e for e in log if e["id"] <= as_of]
    if not chain or chain[-1]["id"] != as_of:
        raise KeyError(f"snapshot {as_of} not in log "
                       f"(have {[e['id'] for e in log]})")
    start = 0
    for i, e in enumerate(chain):
        if e.get("base"):
            start = i
    data: list[str] = []
    dels: list[str] = []
    for e in chain[start:]:
        data.extend(e["adds"])
        dels.extend(e["deletes"])
    return data, dels


def current_snapshot(store: str) -> int:
    log = load_log(store)
    if not log:
        raise KeyError("empty snapshot log")
    return log[-1]["id"]


def _with_key(batch):
    import pyarrow.compute as pc
    k = pc.binary_join_element_wise(
        batch.column("subj"), batch.column("pred"),
        batch.column("obj"), "\x1f")
    return batch.append_column("k", k)


def read_asof(store: str, as_of: int) -> ray.data.Dataset:
    """The triple set as of snapshot ``as_of``: referenced data files,
    minus merge-on-read tombstones (distributed anti-join; the driver
    holds only file lists)."""
    from ..ops.joins import hash_join

    data, dels = snapshot_files(store, as_of)
    ds = ray.data.read_parquet([os.path.join(store, p) for p in data],
                               columns=_TRIPLE_COLS)
    if not dels:
        return ds
    tomb = ray.data.read_parquet([os.path.join(store, p) for p in dels],
                                 columns=_TRIPLE_COLS)
    return hash_join(
        ds.map_batches(_with_key, batch_format="pyarrow"),
        tomb.map_batches(_with_key, batch_format="pyarrow"),
        left_on="k", right_on="k", left_cols=_TRIPLE_COLS,
        right_cols=[], how="left anti").select_columns(_TRIPLE_COLS)


def rewrite_current(store: str) -> int:
    """Maintenance commit (Iceberg "rewrite data files"): materialize
    the live rows (deletes applied) into fresh files and commit them as
    a new BASE snapshot — read results are unchanged; merge-on-read
    cost drops to zero; pre-rewrite files become expirable."""
    cur = current_snapshot(store)
    live = read_asof(store, cur)
    adds = write_data_files(live, store, f"rw-{uuid.uuid4().hex[:8]}")
    return commit(store, adds=adds, base=True,
                  note=f"rewrite of snapshot {cur}")


def expire_snapshots(store: str, *, keep_from: int) -> dict:
    """Drop log entries with id < keep_from (metadata-only; their
    exclusive files stay on disk until ``vacuum``). ``keep_from`` must
    be a base commit, else older files are still referenced."""
    log = load_log(store)
    keep = [e for e in log if e["id"] >= keep_from]
    if not keep or keep[0]["id"] != keep_from:
        raise KeyError(f"snapshot {keep_from} not in log")
    if not keep[0].get("base"):
        raise ValueError(f"snapshot {keep_from} is not a base commit; "
                         "rewrite_current() first")
    _write_log(store, keep)
    return {"expired": len(log) - len(keep), "kept": len(keep)}


def vacuum(store: str, *, dry_run: bool = True) -> dict:
    """Delete parquet files referenced by NO remaining snapshot."""
    log = load_log(store)
    referenced: set[str] = set()
    for e in log:
        referenced.update(e["adds"])
        referenced.update(e["deletes"])
    on_disk = sorted(
        os.path.relpath(os.path.join(r, f), store)
        for r, _d, fs in os.walk(store) for f in fs
        if f.endswith(".parquet"))
    orphans = [p for p in on_disk if p not in referenced]
    if not dry_run:
        for p in orphans:
            os.remove(os.path.join(store, p))
    return {"orphans": len(orphans), "referenced": len(referenced),
            "deleted": 0 if dry_run else len(orphans)}


def build_versioned_store(sf_dir: str, store: str,
                          tagger: str = "crf") -> tuple[int, int]:
    """Two-commit store over the deterministic corpus versions:
    snapshot 1 = the v1 pipeline's triples; snapshot 2 = the CDC delta
    (adds as data files, dels as a merge-on-read delete file). Returns
    (snap1, snap2)."""
    import pyarrow.compute as pc

    from ..pipelines import kg

    v1 = kg.run_version_for(sf_dir, 1, tagger)
    s1 = commit(store, adds=write_data_files(v1, store, "s1"),
                note="v1 pipeline run")

    delta = kg.kg_delta(sf_dir, tagger).materialize()

    def _only(op):
        def _f(batch):
            return batch.filter(
                pc.equal(batch.column("op"), op)).drop_columns(["op"])
        return _f

    adds = write_data_files(
        delta.map_batches(_only("add"), batch_format="pyarrow"),
        store, "s2")
    dels = write_data_files(
        delta.map_batches(_only("del"), batch_format="pyarrow"),
        store, "s2-del")
    s2 = commit(store, adds=adds, deletes=dels, note="CDC delta v1->v2")
    return s1, s2


def _with_merge_key(batch):
    import pyarrow.compute as pc
    k = pc.binary_join_element_wise(
        batch.column("subj"), batch.column("pred"), "\x1f")
    return batch.append_column("mk", k)


def merge_into(store: str, source: ray.data.Dataset) -> int:
    """Delta-style MERGE INTO keyed on (subj, pred): WHEN MATCHED THEN
    UPDATE (replace every live row of that key), WHEN NOT MATCHED THEN
    INSERT.  Executed as merge-on-read: ONE distributed semi-join finds
    the matched live rows (they become a tombstone delete file), the
    source rows land as a data file, and a single metadata commit makes
    both visible — no existing file is rewritten, time travel to the
    pre-merge snapshot stays exact."""
    from ..ops.joins import hash_join

    cur = current_snapshot(store)
    live = read_asof(store, cur)
    source = source.materialize()
    tomb = hash_join(
        live.map_batches(_with_merge_key, batch_format="pyarrow"),
        source.map_batches(_with_merge_key, batch_format="pyarrow"),
        left_on="mk", right_on="mk", left_cols=_TRIPLE_COLS,
        right_cols=[], how="left semi").select_columns(_TRIPLE_COLS)
    adds = write_data_files(source, store, "mg")
    dels = write_data_files(tomb, store, "mg-del")
    return commit(store, adds=adds, deletes=dels,
                  note=f"merge upsert into snapshot {cur}")
