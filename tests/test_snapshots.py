"""Snapshot time-travel store (state/snapshots.py): commit isolation,
merge-on-read deletes, rewrite/expire/vacuum lifecycle."""

import os

import pyarrow as pa
import pytest

from nerfray.state import snapshots


def _triples(rows):
    return pa.Table.from_pydict({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string()),
    })


def _rowset(ds):
    return {(r["subj"], r["pred"], r["obj"]) for r in ds.take_all()}


A = [("r1", "imports", "libA"), ("r1", "imports", "libB"),
     ("r2", "licensed-under", "MIT")]
ADD = [("r3", "imports", "libC")]
DEL = [("r1", "imports", "libB")]


def _store(tmp_path, ray_session):
    import ray
    store = str(tmp_path / "store")
    s1 = snapshots.commit(
        store, adds=snapshots.write_data_files(
            ray.data.from_arrow(_triples(A)), store, "s1"))
    s2 = snapshots.commit(
        store,
        adds=snapshots.write_data_files(
            ray.data.from_arrow(_triples(ADD)), store, "s2"),
        deletes=snapshots.write_data_files(
            ray.data.from_arrow(_triples(DEL)), store, "s2-del"))
    return store, s1, s2


def test_time_travel_isolation(tmp_path, ray_session):
    store, s1, s2 = _store(tmp_path, ray_session)
    # snapshot 1 unaffected by the later commit
    assert _rowset(snapshots.read_asof(store, s1)) == set(A)
    # snapshot 2 = merge-on-read: adds in, tombstones out
    assert _rowset(snapshots.read_asof(store, s2)) == \
        (set(A) | set(ADD)) - set(DEL)
    with pytest.raises(KeyError):
        snapshots.read_asof(store, 99)


def test_rewrite_expire_vacuum(tmp_path, ray_session):
    store, s1, s2 = _store(tmp_path, ray_session)
    live = (set(A) | set(ADD)) - set(DEL)

    # expire requires a base commit
    with pytest.raises(ValueError):
        snapshots.expire_snapshots(store, keep_from=s2)

    s3 = snapshots.rewrite_current(store)
    assert _rowset(snapshots.read_asof(store, s3)) == live
    # history still readable until expired
    assert _rowset(snapshots.read_asof(store, s1)) == set(A)

    res = snapshots.expire_snapshots(store, keep_from=s3)
    assert res["expired"] == 2
    with pytest.raises(KeyError):
        snapshots.read_asof(store, s1)

    dry = snapshots.vacuum(store, dry_run=True)
    assert dry["orphans"] > 0 and dry["deleted"] == 0
    real = snapshots.vacuum(store, dry_run=False)
    assert real["deleted"] == dry["orphans"]
    # post-vacuum read of the live snapshot is unchanged
    assert _rowset(snapshots.read_asof(store, s3)) == live
    # vacuum removed exactly the unreferenced files
    left = [p for r, _d, fs in os.walk(store) for p in fs
            if p.endswith(".parquet")]
    data, dels = snapshots.snapshot_files(store, s3)
    assert len(left) == len(set(data) | set(dels))


def test_rewrite_is_noop_on_rows_and_kills_tombstone_cost(
        tmp_path, ray_session):
    store, _s1, s2 = _store(tmp_path, ray_session)
    s3 = snapshots.rewrite_current(store)
    d2, t2 = snapshots.snapshot_files(store, s2)
    d3, t3 = snapshots.snapshot_files(store, s3)
    assert t2 and not t3  # merge-on-read cost gone after rewrite
    assert _rowset(snapshots.read_asof(store, s3)) == \
        _rowset(snapshots.read_asof(store, s2))


def test_merge_into_upsert_semantics(tmp_path, ray_session):
    """MERGE on (subj, pred): matched keys have ALL live rows replaced
    by the source row, unmatched source rows insert, untouched rows
    survive, and the pre-merge snapshot still reads exactly."""
    import ray
    store = str(tmp_path / "mstore")
    base = [("r1", "imports", "libA"), ("r1", "imports", "libB"),
            ("r2", "licensed-under", "MIT"),
            ("r3", "imports", "libC")]
    s1 = snapshots.commit(
        store, adds=snapshots.write_data_files(
            ray.data.from_arrow(_triples(base)), store, "s1"))
    # r1/imports matched (two live rows -> both replaced by ONE source
    # row); r9/audited-by unmatched (insert)
    src = [("r1", "imports", "libZ"), ("r9", "audited-by", "bot")]
    s2 = snapshots.merge_into(store, ray.data.from_arrow(_triples(src)))
    assert _rowset(snapshots.read_asof(store, s2)) == {
        ("r1", "imports", "libZ"),
        ("r2", "licensed-under", "MIT"),
        ("r3", "imports", "libC"),
        ("r9", "audited-by", "bot")}
    # time travel to the pre-merge snapshot is untouched
    assert _rowset(snapshots.read_asof(store, s1)) == set(base)
