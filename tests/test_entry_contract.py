"""Driver-contract wiring guards for __ray_entry__."""

import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod


def test_every_oracle_has_a_query():
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    missing = set(sqls) - set(qs)
    assert not missing, f"oracles without queries: {missing}"
    assert len(qs) >= 25
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracle_sql_parses_in_duckdb():
    """Every oracle must at least PREPARE against the registered views."""
    import duckdb
    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')")
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.sql(sql)  # lazy relation: parses + binds
        except Exception as ex:  # pragma: no cover
            raise AssertionError(f"oracle {name} failed: {ex}") from ex


def test_entry_returns_dataset(ray_session):
    ds = entrymod.entry()
    import ray.data
    assert isinstance(ds, ray.data.Dataset)
    assert ds.count() > 0
    assert set(ds.schema().names) == {"subj", "pred", "obj"}
