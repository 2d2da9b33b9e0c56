"""Ontology constraint checks: every failure branch exercised on a
planted triple table, counts pinned against the SQL mirror, and the
priority order (a triple reports its FIRST failure) stated directly."""

import duckdb
import pyarrow as pa

from nerfray.stages import validate


def _planted() -> pa.Table:
    rows = [
        # ok rows, one per pred
        ("org/r1", "licensed-under", "license:MIT"),
        ("org/r1", "imports", "lib:numpy"),
        ("org/r1/src/a.py", "defines", "sym:func_1"),
        ("org/r1/src/a.py", "calls", "api:json.load"),
        # unknown pred wins over everything else being wrong too
        ("x", "depends-on", "y"),
        # wrong namespace for the pred
        ("org/r2", "imports", "sym:oops"),
        # repo-grain pred with file-grain subject (prefix is fine)
        ("org/r2/src/b.py", "licensed-under", "license:MIT"),
        # file-grain pred with repo-grain subject
        ("org/r2", "defines", "sym:func_2"),
        # denied license (copyleft outside the allowlist)
        ("org/r3", "licensed-under", "license:GPL-3.0"),
    ]
    return pa.Table.from_pydict({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string()),
    })


def test_check_batch_all_branches():
    out = validate.check_batch(_planted())
    got = out.column("status").to_pylist()
    assert got == ["ok", "ok", "ok", "ok", "unknown_pred",
                   "bad_obj_prefix", "bad_subj_grain", "bad_subj_grain",
                   "license_denied"]


def test_check_batch_matches_sql_mirror(tmp_path):
    import pyarrow.parquet as pq
    t = _planted()
    pq.write_table(t, str(tmp_path / "gold.parquet"))
    con = duckdb.connect()
    sql = validate.constraints_sql(
        f"SELECT * FROM '{tmp_path}/gold.parquet'")
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    checked = validate.check_batch(t)
    counts = checked.group_by(["pred", "status"]).aggregate(
        [([], "count_all")])
    got = sorted(zip(counts.column("pred").to_pylist(),
                     counts.column("status").to_pylist(),
                     counts.column("count_all").to_pylist()))
    assert got == want


def test_constraint_counts_dataset_path(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_planted()).repartition(3)
    rows = {(r["pred"], r["status"]): r["n_triples"]
            for r in validate.constraint_counts(ds).take_all()}
    assert rows[("licensed-under", "ok")] == 1
    assert rows[("licensed-under", "license_denied")] == 1
    assert rows[("depends-on", "unknown_pred")] == 1
    viol = sorted(
        (r["subj"], r["obj"])
        for r in validate.license_violations(ds.repartition(2)).take_all())
    assert viol == [("org/r3", "license:GPL-3.0")]


def test_empty_batch_keeps_schema():
    empty = _planted().slice(0, 0)
    out = validate.check_batch(empty)
    assert out.num_rows == 0
    assert out.schema.field("status").type == pa.string()
