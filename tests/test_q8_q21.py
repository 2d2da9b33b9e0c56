"""TPC-H Q8 (national market share) and Q21 (waiting suppliers,
returnflag-adapted): DuckDB pins at sf0.001 plus structural checks."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _con(*tables):
    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS FROM '{SF}/{t}.parquet'")
    return con


def test_q8_matches_duckdb(ray_session):
    from nerfray.ops.joins import Q8_SQL, q8_market_share

    got = q8_market_share(SF).to_pandas() \
        .sort_values("year").reset_index(drop=True)
    con = _con("lineitem", "part", "supplier", "orders", "customer",
               "nation")
    want = con.sql(Q8_SQL).df()
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want)
    # numerator is a genuine sub-share of the denominator
    assert (got["nation_vol_units"] <= got["total_vol_units"]).all()
    assert int(got["total_vol_units"].sum()) > 0


def test_q21_matches_duckdb(ray_session):
    from nerfray.ops.joins import Q21_SQL, q21_waiting_suppliers

    got = q21_waiting_suppliers(SF).to_pandas() \
        .sort_values("s_name").reset_index(drop=True)
    con = _con("lineitem", "orders", "supplier")
    want = con.sql(Q21_SQL).df()
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0 and (got["numwait"] >= 1).all()


def test_q21_sole_returner_semantics(ray_session, tmp_path):
    """Planted micro-corpus: only the sole returner in a multi-
    supplier F order counts; single-supplier orders and orders with
    two returners are excluded, as are non-F orders."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nerfray.ops.joins import q21_waiting_suppliers

    li = pa.table({
        # order 1: suppliers 1,2 — only 1 returns  -> counts for 1
        # order 2: suppliers 1,2 — both return     -> excluded
        # order 3: supplier 1 alone returns        -> excluded (n_supp<2)
        # order 4 (status O): supplier 2 returns   -> excluded (not F)
        "l_orderkey": pa.array([1, 1, 2, 2, 3, 4], pa.int64()),
        "l_suppkey": pa.array([1, 2, 1, 2, 1, 2], pa.int64()),
        "l_returnflag": pa.array(["R", "N", "R", "R", "R", "R"])})
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_orderstatus": pa.array(["F", "F", "F", "O"])})
    supp = pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_name": pa.array(["SUPP_1", "SUPP_2"])})
    pq.write_table(li, tmp_path / "lineitem.parquet")
    pq.write_table(orders, tmp_path / "orders.parquet")
    pq.write_table(supp, tmp_path / "supplier.parquet")

    got = q21_waiting_suppliers(str(tmp_path)).to_pandas()
    assert got.to_dict("records") == [{"s_name": "SUPP_1", "numwait": 1}]
