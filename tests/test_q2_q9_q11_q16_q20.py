"""TPC-H Q2/Q9/Q11/Q16/Q20 (adapted — no partsupp in this corpus):
DuckDB pins at sf0.001 plus the structural property each shape exists
to exercise (argmin-join-back, cost surrogate, scale-free global
share, distinct-count exclusion, nested two-grain semi-join)."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _con(*tables):
    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS FROM '{SF}/{t}.parquet'")
    return con


def _assert_match(got, sql, con, sort_cols):
    got = got.sort_values(sort_cols).reset_index(drop=True)
    want = con.sql(sql).df().sort_values(sort_cols) \
        .reset_index(drop=True)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want)
    return got


def test_q2_matches_duckdb(ray_session):
    from nerfray.ops.joins import Q2_SQL, q2_min_cost_supplier

    got = _assert_match(q2_min_cost_supplier(SF).to_pandas(), Q2_SQL,
                        _con("lineitem", "supplier", "nation", "part"),
                        ["p_partkey"])
    assert len(got) > 0
    # argmin-join-back: exactly one winner row per part
    assert got["p_partkey"].is_unique


def test_q9_matches_duckdb(ray_session):
    from nerfray.ops.joins import Q9_SQL, q9_profit_by_nation_year

    got = _assert_match(
        q9_profit_by_nation_year(SF).to_pandas(), Q9_SQL,
        _con("lineitem", "part", "supplier", "nation", "orders"),
        ["n_name", "year"])
    assert len(got) > 0
    assert not got.duplicated(["n_name", "year"]).any()


def test_q11_matches_duckdb(ray_session):
    from nerfray.ops.joins import (Q11_AVG_MULT, Q11_SQL,
                                   q11_important_stock)

    got = _assert_match(q11_important_stock(SF).to_pandas(), Q11_SQL,
                        _con("lineitem", "supplier"), ["p_partkey"])
    assert len(got) > 0
    # every survivor clears MULT x the average over ALL per-part sums
    con = _con("lineitem", "supplier")
    n, total = con.sql(f"""
        WITH f AS (
          SELECT l_partkey,
                 sum(round(l_extendedprice * 100)::BIGINT
                     * round(l_quantity)::BIGINT) AS v
          FROM lineitem
          JOIN supplier s ON s.s_suppkey = l_suppkey
                             AND s.s_nationkey = 3
          GROUP BY 1)
        SELECT count(*), sum(v) FROM f""").fetchone()
    assert (got["value_units"] * n > Q11_AVG_MULT * total).all()


def test_q16_matches_duckdb(ray_session):
    from nerfray.ops.joins import (Q16_EXCL_BRAND, Q16_MAX_SIZE,
                                   Q16_SQL, q16_supplier_counts)

    got = _assert_match(q16_supplier_counts(SF).to_pandas(), Q16_SQL,
                        _con("lineitem", "part", "supplier"),
                        ["p_brand", "p_type", "p_size"])
    assert len(got) > 0
    assert (got["p_brand"] != Q16_EXCL_BRAND).all()
    assert (got["p_size"] <= Q16_MAX_SIZE).all()
    assert (got["supplier_cnt"] >= 1).all()


def test_q20_matches_duckdb(ray_session):
    from nerfray.ops.joins import Q20_SQL, q20_majority_suppliers

    got = _assert_match(q20_majority_suppliers(SF).to_pandas(),
                        Q20_SQL, _con("lineitem", "part", "supplier"),
                        ["s_suppkey"])
    assert len(got) > 0
    assert got["s_suppkey"].is_unique
