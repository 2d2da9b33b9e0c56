"""Generic big-big hash join: semantics pinned against DuckDB and a
block-structure-invariance check (the co-group join must not depend on
how rows are split into blocks)."""

import duckdb
import pyarrow as pa
import pytest

from nerfray.ops import joins

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def _sorted_rows(ds):
    return sorted(tuple(sorted(r.items())) for r in ds.take_all())


def test_inner_join_matches_duckdb(ray_session):
    import ray.data
    orders = joins._read(SF, "orders", ["o_orderkey", "o_orderstatus"])
    items = joins._read(SF, "lineitem", ["l_orderkey", "l_quantity"])
    j = joins.hash_join(orders, items, left_on="o_orderkey",
                        right_on="l_orderkey",
                        left_cols=["o_orderstatus"],
                        right_cols=["l_quantity"])
    mine = sorted((r["__key"], r["o_orderstatus"], r["l_quantity"])
                  for r in j.take_all())
    want = _con().execute("""
        SELECT o.o_orderkey, o.o_orderstatus, l.l_quantity
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        ORDER BY 1, 2, 3""").fetchall()
    assert mine == [tuple(r) for r in want]


def test_left_outer_join_keeps_unmatched(ray_session):
    import ray.data
    left = ray.data.from_arrow(pa.Table.from_pydict({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "lv": pa.array(["a", "b", "c", "d"], pa.string())}))
    right = ray.data.from_arrow(pa.Table.from_pydict({
        "k": pa.array([2, 4, 4], pa.int64()),
        "rv": pa.array([20, 40, 41], pa.int64())}))
    j = joins.hash_join(left, right, left_on="k", right_on="k",
                        left_cols=["lv"], right_cols=["rv"],
                        how="left outer")
    rows = sorted((r["__key"], r["lv"], r["rv"]) for r in j.take_all())
    assert rows == [(1, "a", None), (2, "b", 20), (3, "c", None),
                    (4, "d", 40), (4, "d", 41)]


def test_overlapping_payload_columns_rejected(ray_session):
    import ray.data
    t = ray.data.from_arrow(pa.Table.from_pydict({
        "k": pa.array([1], pa.int64()), "v": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError):
        joins.hash_join(t, t, left_on="k", right_on="k",
                        left_cols=["v"], right_cols=["v"])


def test_join_block_structure_invariance(ray_session):
    import ray.data
    orders = joins._read(SF, "orders", ["o_orderkey", "o_orderstatus"])
    items = joins._read(SF, "lineitem", ["l_orderkey", "l_quantity"])
    results = []
    for parts in (1, 7):
        j = joins.hash_join(orders.repartition(parts),
                            items.repartition(parts * 3),
                            left_on="o_orderkey", right_on="l_orderkey",
                            left_cols=["o_orderstatus"],
                            right_cols=["l_quantity"])
        results.append(_sorted_rows(j))
    assert results[0] == results[1] and results[0]


def test_semi_join_query_matches_oracle(ray_session):
    mine = sorted((r["o_orderpriority"], r["n_orders"])
                  for r in joins.priority_shipped_counts(SF).take_all())
    want = _con().execute(
        joins.ORACLES["join_priority_shipped"]).fetchall()
    assert mine == [tuple(r) for r in want]


def test_customer_quantiles_match_percentile_disc(ray_session):
    from nerfray.ops import relational
    mine = sorted(
        (r["o_custkey"], r["n_orders"], r["median_price"], r["p75_price"])
        for r in relational.customer_price_quantiles(SF).take_all())
    want = _con().execute(
        relational.ORACLES["customer_price_quantiles"]).fetchall()
    assert mine == [tuple(r) for r in want]


def test_quantile_bucket_edge_cases(ray_session):
    import pyarrow as pa
    from nerfray.ops.relational import _quantile_bucket
    # singleton group, duplicate values, two-element group
    t = pa.Table.from_pydict({
        "o_custkey": pa.array([1, 2, 2, 2, 3, 3], pa.int64()),
        "o_totalprice": pa.array([5.0, 9.0, 1.0, 9.0, 4.0, 2.0],
                                 pa.float64()),
        "hb": pa.array([0] * 6, pa.int32()),
    })
    rows = {r["o_custkey"]: r for r in _quantile_bucket(t).to_pylist()}
    assert rows[1] == {"o_custkey": 1, "n_orders": 1,
                       "median_price": 5.0, "p75_price": 5.0}
    assert rows[2] == {"o_custkey": 2, "n_orders": 3,
                       "median_price": 9.0, "p75_price": 9.0}
    assert rows[3] == {"o_custkey": 3, "n_orders": 2,
                       "median_price": 2.0, "p75_price": 4.0}


def test_top_orders_tie_and_invariance(ray_session):
    import ray.data
    from nerfray.ops import relational
    want = sorted((w[0], w[3], w[1], w[2]) for w in _con().execute(
        relational.ORACLES["top_orders_per_status"]).fetchall())
    ds = relational._read(SF, "orders",
                          ["o_orderstatus", "o_orderkey", "o_totalprice"])
    # the block-local top-k combiner must give the same answer however
    # the status's true top rows are scattered across blocks
    for parts in (1, 13):
        mine = sorted(
            (r["o_orderstatus"], r["rank"], r["o_orderkey"],
             r["o_totalprice"])
            for r in relational.top_orders(ds.repartition(parts))
            .take_all())
        assert mine == want, parts


def test_distinct_by_status_matches_exact(ray_session):
    from nerfray.ops import relational
    mine = sorted((r["o_orderstatus"], r["n_custkeys"])
                  for r in relational.distinct_custkeys_by_status(SF)
                  .take_all())
    want = _con().execute(
        relational.ORACLES["distinct_custkeys_by_status"]).fetchall()
    assert mine == [tuple(r) for r in want]


def test_string_key_join(ray_session):
    import ray.data
    left = ray.data.from_arrow(pa.Table.from_pydict({
        "name": pa.array(["ann", "bob", "cid"], pa.string()),
        "x": pa.array([1, 2, 3], pa.int64())}))
    right = ray.data.from_arrow(pa.Table.from_pydict({
        "name": pa.array(["bob", "cid", "cid", "dee"], pa.string()),
        "y": pa.array([10, 20, 21, 30], pa.int64())}))
    j = joins.hash_join(left, right, left_on="name", right_on="name",
                        left_cols=["x"], right_cols=["y"])
    rows = sorted((r["__key"], r["x"], r["y"]) for r in j.take_all())
    assert rows == [("bob", 2, 10), ("cid", 3, 20), ("cid", 3, 21)]


def test_semi_join_duplicate_insensitive(ray_session):
    import ray.data
    left = ray.data.from_arrow(pa.Table.from_pydict({
        "k": pa.array([1, 2, 3], pa.int64()),
        "lv": pa.array(["a", "b", "c"], pa.string())}))
    right = ray.data.from_arrow(pa.Table.from_pydict({
        "k": pa.array([2, 2, 2], pa.int64())}))
    j = joins.hash_join(left, right, left_on="k", right_on="k",
                        left_cols=["lv"], right_cols=[], how="left semi")
    assert sorted((r["__key"], r["lv"]) for r in j.take_all()) == [(2, "b")]
    a = joins.hash_join(left, right, left_on="k", right_on="k",
                        left_cols=["lv"], right_cols=[], how="left anti")
    assert sorted((r["__key"], r["lv"]) for r in a.take_all()) \
        == [(1, "a"), (3, "c")]


def test_hash_join_fuzz_vs_duckdb(ray_session):
    """Random small tables, every join mode, compared against DuckDB."""
    import duckdb
    import numpy as np
    import ray.data
    rng = np.random.default_rng(42)
    for trial in range(5):
        nl, nr = int(rng.integers(0, 30)), int(rng.integers(0, 30))
        lk = rng.integers(0, 8, nl)
        rk = rng.integers(0, 8, nr)
        lt = pa.Table.from_pydict({
            "k": pa.array(lk, pa.int64()),
            "lv": pa.array(rng.integers(0, 100, nl), pa.int64())})
        rt = pa.Table.from_pydict({
            "k": pa.array(rk, pa.int64()),
            "rv": pa.array(rng.integers(0, 100, nr), pa.int64())})
        con = duckdb.connect()
        con.register("l", lt)
        con.register("r", rt)
        for how, sql in (
                ("inner", "SELECT l.k, lv, rv FROM l JOIN r USING (k)"),
                ("left outer",
                 "SELECT l.k, lv, rv FROM l LEFT JOIN r USING (k)"),
                ("left semi",
                 "SELECT k, lv FROM l WHERE k IN (SELECT k FROM r)"),
                ("left anti",
                 "SELECT k, lv FROM l WHERE k NOT IN (SELECT k FROM r)")):
            j = joins.hash_join(
                ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                left_on="k", right_on="k", left_cols=["lv"],
                right_cols=["rv"], how=how, n_buckets=4)
            mine = sorted(tuple(r[c] for c in
                                (("__key", "lv") if "semi" in how
                                 or "anti" in how else ("__key", "lv",
                                                        "rv")))
                          for r in j.take_all())
            want = sorted(tuple(r) for r in con.execute(sql).fetchall())
            assert mine == want, (trial, how)


def test_null_and_mismatched_keys_fail_loudly(ray_session):
    import ray.data
    withnull = ray.data.from_arrow(pa.Table.from_pydict({
        "k": pa.array([1, None], pa.int64()),
        "v": pa.array([1, 2], pa.int64())}))
    clean = ray.data.from_arrow(pa.Table.from_pydict({
        "k": pa.array([1], pa.int64()),
        "w": pa.array([9], pa.int64())}))
    j = joins.hash_join(withnull, clean, left_on="k", right_on="k",
                        left_cols=["v"], right_cols=["w"])
    with pytest.raises(Exception, match="non-null"):
        j.take_all()
    strkey = ray.data.from_arrow(pa.Table.from_pydict({
        "k": pa.array(["a"], pa.string()),
        "w": pa.array([9], pa.int64())}))
    with pytest.raises(ValueError, match="key types disagree"):
        joins.hash_join(clean, strkey, left_on="k", right_on="k",
                        left_cols=["w"], right_cols=[])


def test_quantile_fuzz_vs_duckdb(ray_session):
    """Random grouped tables vs DuckDB percentile_disc (the index-math
    contract ceil(q*n)-1 under every group size 1..~12)."""
    import duckdb
    import numpy as np
    import ray.data
    from nerfray.ops.relational import N_Q_BUCKETS, _quantile_bucket
    from nerfray.ops._shuffle import key_bucket
    rng = np.random.default_rng(11)
    for trial in range(4):
        n = int(rng.integers(5, 120))
        t = pa.Table.from_pydict({
            "o_custkey": pa.array(rng.integers(0, 12, n), pa.int64()),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1, 9e4, n), 2), pa.float64())})
        ds = ray.data.from_arrow(t).repartition(3)
        got = ds.map_batches(
            lambda b: b.append_column(
                "hb", key_bucket(b.column("o_custkey"), N_Q_BUCKETS)),
            batch_format="pyarrow") \
            .groupby("hb").map_groups(_quantile_bucket,
                                      batch_format="pyarrow")
        mine = sorted(tuple(sorted(r.items())) for r in got.take_all())
        con = duckdb.connect()
        con.register("orders", t)
        want = sorted(tuple(sorted(r.items())) for r in con.execute("""
            SELECT o_custkey, count(*)::BIGINT AS n_orders,
                   percentile_disc(0.5) WITHIN GROUP
                     (ORDER BY o_totalprice) AS median_price,
                   percentile_disc(0.75) WITHIN GROUP
                     (ORDER BY o_totalprice) AS p75_price
            FROM orders GROUP BY o_custkey""").df()
            .to_dict("records"))
        assert mine == want, trial


def test_salted_join_equals_unsalted_all_types(ray_session):
    """salted_hash_join must produce the exact multiset of hash_join
    for every Acero join type on a planted-skew input (one key holding
    half the fact side), with the hot key genuinely detected."""
    import numpy as np
    import ray.data
    rng = np.random.default_rng(7)
    n = 4000
    # key 42 takes ~half the fact rows; the rest spread over 1..200
    keys = np.where(rng.random(n) < 0.5, 42,
                    rng.integers(1, 201, n)).astype(np.int64)
    left = ray.data.from_arrow(pa.Table.from_pydict({
        "k": pa.array(keys, pa.int64()),
        "lv": pa.array(rng.integers(0, 1000, n), pa.int64()),
    })).repartition(8)
    # right: most keys present (multiplicity 1-3), some missing (0 for
    # k % 13 == 0) so outer/anti paths have unmatched rows; hot key 42
    # itself has multiplicity 2 to exercise replica fan-out
    rk, rv = [], []
    for k in range(1, 201):
        for m in range(0 if k % 13 == 0 else 1 + k % 3):
            rk.append(k)
            rv.append(k * 10 + m)
    rk += [42, 42]
    rv += [4242, 4243]
    right = ray.data.from_arrow(pa.Table.from_pydict({
        "k": pa.array(rk, pa.int64()),
        "rv": pa.array(rv, pa.int64())})).repartition(4)

    hot = joins.detect_hot_keys(left, on="k", threshold=500)
    assert hot == [42]

    for how in ("inner", "left outer", "left semi", "left anti"):
        plain = joins.hash_join(left, right, left_on="k", right_on="k",
                                left_cols=["lv"], right_cols=["rv"],
                                how=how)
        salted = joins.salted_hash_join(
            left, right, left_on="k", right_on="k",
            left_cols=["lv"], right_cols=["rv"], how=how,
            hot_threshold=500, n_salts=8)
        assert _sorted_rows(salted) == _sorted_rows(plain), how


def test_salted_join_string_keys_no_hot(ray_session):
    """Below-threshold input: the salt layer must be a no-op (empty hot
    set, salt 0 everywhere) including for string keys."""
    import ray.data
    left = ray.data.from_arrow(pa.Table.from_pydict({
        "k": pa.array(["a", "b", "a", "c"], pa.string()),
        "lv": pa.array([1, 2, 3, 4], pa.int64())}))
    right = ray.data.from_arrow(pa.Table.from_pydict({
        "k": pa.array(["a", "c", "z"], pa.string()),
        "rv": pa.array([10, 30, 99], pa.int64())}))
    got = _sorted_rows(joins.salted_hash_join(
        left, right, left_on="k", right_on="k",
        left_cols=["lv"], right_cols=["rv"], hot_threshold=100))
    want = _sorted_rows(joins.hash_join(
        left, right, left_on="k", right_on="k",
        left_cols=["lv"], right_cols=["rv"]))
    assert got == want and len(got) == 3


def test_rollup_cube_matches_grouping_sets(ray_session):
    from nerfray.ops import relational
    tbl = relational.orders_rollup_cube(SF)
    mine = sorted(zip(*(tbl.column(c).to_pylist()
                        for c in ("status", "priority",
                                  "n_orders", "sum_cents"))))
    want = _con().execute(
        relational.ORACLES["orders_rollup_cube"]).fetchall()
    assert mine == [tuple(r) for r in want]
    # the grand total row must equal the sum of the base level
    grand = [r for r in mine if r[0] == "ALL" and r[1] == "ALL"]
    base = [r for r in mine if r[0] != "ALL" and r[1] != "ALL"]
    assert len(grand) == 1
    assert grand[0][2] == sum(r[2] for r in base)
    assert grand[0][3] == sum(r[3] for r in base)


def test_full_outer_join_classes(ray_session):
    """Full outer: unmatched rows of BOTH sides survive with nulls, the
    key is coalesced, and buckets whose left side is empty still emit
    their right rows. Salted join rejects full outer."""
    import pytest
    import ray.data
    import pyarrow as pa
    from nerfray.ops import joins as j
    lt = ray.data.from_arrow(pa.table({
        "lk": pa.array([1, 2, 2, 5], pa.int64()),
        "lv": pa.array(["a", "b", "c", "d"], pa.string())}))
    rt = ray.data.from_arrow(pa.table({
        "rk": pa.array([2, 3, 4], pa.int64()),
        "rv": pa.array(["X", "Y", "Z"], pa.string())}))
    rows = j.hash_join(lt, rt, left_on="lk", right_on="rk",
                       left_cols=["lv"], right_cols=["rv"],
                       how="full outer").take_all()
    got = sorted((r["__key"], r["lv"], r["rv"]) for r in rows)
    assert got == [(1, "a", None), (2, "b", "X"), (2, "c", "X"),
                   (3, None, "Y"), (4, None, "Z"), (5, "d", None)]
    with pytest.raises(ValueError):
        j.salted_hash_join(lt, rt, left_on="lk", right_on="rk",
                           left_cols=["lv"], right_cols=["rv"],
                           how="full outer")


def test_band_join_boundary_values_and_blocks(ray_session):
    """Values exactly ON a band edge belong to the upper band
    ([lo, hi) semantics), and the rollup is block-structure
    invariant."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from nerfray.ops import joins

    vals = [0.0, 0.99, 1.0, 3.99, 4.0, 4.0, 8.999, 9.0, 15.9, 16.0]
    users = [1, 1, 2, 2, 3, 3, 1, 2, 1, 1]
    t = pa.Table.from_pydict({
        "user_id": pa.array(users, pa.int64()),
        "value": pa.array(vals, pa.float64())})
    bounds = np.arange(6, dtype=np.float64) ** 2   # 0,1,4,9,16,25
    want = {}
    for u, v in zip(users, vals):
        b = int(np.searchsorted(bounds, v, side="right") - 1)
        n, us, s = want.get(b, (0, set(), 0))
        want[b] = (n + 1, us | {u}, s + round(v * 100))
    for parts in (1, 4):
        got = {r["band"]: (r["n_events"], r["n_users"], r["sum_cents"])
               for r in joins.band_join_rollup(
                   ray.data.from_arrow(t).repartition(parts),
                   bounds).take_all()}
        assert got == {b: (n, len(us), s)
                       for b, (n, us, s) in want.items()}
        # boundary check: 4.0 landed in band [4, 9), not [1, 4)
        assert got[2][0] == 3  # 4.0, 4.0, 8.999


def _iv_events(rows):
    """rows: (user, ts_us, value)"""
    return pa.Table.from_pydict({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    })


def _iv_table(rows):
    """rows: (interval_id, user, lo_us, hi_us)"""
    return pa.Table.from_pydict({
        "interval_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "lo": pa.array([r[2] for r in rows], pa.int64()),
        "hi": pa.array([r[3] for r in rows], pa.int64()),
    })


def test_interval_join_brute_force(ray_session):
    """Chunk-straddling intervals, [lo, hi) boundaries, zero-match
    intervals and same-user overlapping intervals all match a brute
    force, across block structures and chunk sizes."""
    import ray.data
    from nerfray.ops.joins import interval_join_rollup
    DAY = 86_400 * 1_000_000
    T0 = 1_704_067_200 * 1_000_000
    ev = [
        (1, T0, 1.00),                  # exactly at lo of iv0 -> inside
        (1, T0 + DAY // 2, 2.50),
        (1, T0 + 3 * DAY, 4.00),        # exactly at hi of iv0 -> outside
        (1, T0 + 3 * DAY - 1, 0.50),    # last micro inside iv0
        (2, T0 + DAY, 8.00),            # user 2: inside iv2 only
        (3, T0 + 10 * DAY, 9.99),       # user 3: no interval
    ]
    ivs = [
        (0, 1, T0, T0 + 3 * DAY),               # straddles 3 day-chunks
        (1, 1, T0 + 2 * DAY, T0 + 5 * DAY),     # overlaps iv0
        (2, 2, T0, T0 + 2 * DAY),
        (3, 9, T0, T0 + 30 * DAY),              # user with no events
    ]
    want = {}
    for iid, u, lo, hi in ivs:
        n = sum(1 for eu, ts, _ in ev if eu == u and lo <= ts < hi)
        c = sum(round(v * 100) for eu, ts, v in ev
                if eu == u and lo <= ts < hi)
        want[iid] = (u, n, c)
    for parts in (1, 3):
        for chunk in (DAY, 7 * DAY):
            got = {r["interval_id"]: (r["user_id"], r["n_events"],
                                      r["sum_cents"])
                   for r in interval_join_rollup(
                       ray.data.from_arrow(_iv_table(ivs)).repartition(parts),
                       ray.data.from_arrow(_iv_events(ev)).repartition(parts),
                       chunk_us=chunk).take_all()}
            assert got == want, (parts, chunk)
    assert want[0] == (1, 3, 400)   # 1.00 + 2.50 + 0.50, hi excluded
    assert want[3] == (9, 0, 0)     # zero-match interval survives


def test_q5_matches_duckdb(ray_session):
    """Q5-shaped pipeline == the 6-table SQL plan at sf0.001, and the
    local-supplier cross-filter actually excludes cross-nation pairs."""
    import duckdb
    from nerfray.ops.joins import Q5_SQL, q5_revenue_by_nation
    sf = "/root/testdata/sf0.001"
    got = [(r["n_name"], r["revenue_e4"])
           for r in q5_revenue_by_nation(sf).take_all()]
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier",
              "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')")
    want = con.sql(Q5_SQL).fetchall()
    assert got == [tuple(w) for w in want]
    # sanity: without the c_nationkey = s_nationkey filter the revenue
    # is strictly larger (the filter is load-bearing)
    loose = con.sql(Q5_SQL.replace(
        "AND c.c_nationkey = s.s_nationkey", "")).fetchall()
    assert sum(r for _, r in loose) > sum(r for _, r in want)


def test_bloom_filtered_join_equals_hash_join(ray_session):
    """Bloom pre-filter is semantics-invisible (no false negatives):
    inner-join multiset equals plain hash_join; and on a selective
    build side the filter provably drops fact rows pre-exchange."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from nerfray.ops import joins as j

    rng = np.random.default_rng(21)
    fact_keys = rng.integers(0, 1000, 5000).astype(np.int64)
    fact = ray.data.from_arrow(pa.Table.from_pydict({
        "fk": pa.array(fact_keys),
        "val": pa.array(np.arange(5000, dtype=np.int64))})) \
        .repartition(6)
    build_keys = np.arange(0, 1000, 13, dtype=np.int64)  # selective
    build = ray.data.from_arrow(pa.Table.from_pydict({
        "bk": pa.array(build_keys),
        "tag": pa.array([f"t{k}" for k in build_keys])}))

    kw = dict(left_on="fk", right_on="bk",
              left_cols=["val"], right_cols=["tag"])
    plain = sorted((r["__key"], r["val"], r["tag"]) for r in
                   j.hash_join(fact, build, **kw).take_all())
    bloom = sorted((r["__key"], r["val"], r["tag"]) for r in
                   j.bloom_filtered_join(fact, build, **kw).take_all())
    assert plain == bloom and len(plain) > 0

    # the filter itself: every build key hits; most non-keys don't
    filt = j.build_key_bloom(build, "bk")
    p = j._key_positions(build_keys, j.BLOOM_JOIN_M, j.BLOOM_JOIN_K)
    w = (p >> np.uint64(6)).astype(np.int64)
    b = p & np.uint64(63)
    assert (((filt[w] >> b) & np.uint64(1)) != 0).all()
    others = np.setdiff1d(np.arange(1000, dtype=np.int64), build_keys)
    po = j._key_positions(others, j.BLOOM_JOIN_M, j.BLOOM_JOIN_K)
    wo = (po >> np.uint64(6)).astype(np.int64)
    bo = po & np.uint64(63)
    fp = (((filt[wo] >> bo) & np.uint64(1)) != 0).all(axis=1).mean()
    assert fp < 0.05, fp


def test_q18_having_filter_is_load_bearing(ray_session):
    """Every returned order's qty exceeds the HAVING threshold, the
    top-k ordering matches DuckDB exactly, and lowering the threshold
    admits more orders (the filter genuinely gates the join)."""
    import duckdb
    from nerfray.ops import joins as j

    sf = "/root/testdata/sf0.001"
    cols = ["c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "totalprice_c", "qty"]
    df = j.q18_large_orders(sf).to_pandas()
    # name any missing column explicitly (a take_all KeyError flake
    # under heavy load gave no diagnostics; this does)
    assert sorted(df.columns) == sorted(cols), sorted(df.columns)
    assert len(df) and (df["qty"] > j.Q18_MIN_QTY).all()
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    want = sorted(map(tuple, con.sql(j.Q18_SQL).fetchall()))
    got = sorted(map(tuple, df[cols].itertuples(index=False)))
    assert got == want  # exact top-k tuple set (order-insensitive)


def test_adaptive_join_strategies_agree(ray_session):
    """Both strategy branches produce the same rows; the picker
    chooses broadcast under the threshold and shuffle above it."""
    import ray.data
    import pyarrow as pa
    from nerfray.ops import joins as j

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 2, 3, 5], pa.int64()),
        "lv": pa.array([10, 20, 21, 30, 50], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([1, 2, 4], pa.int64()),
        "rv": pa.array([100, 200, 400], pa.int64())}))

    res_b, strat_b = j.adaptive_join(
        left, right, left_on="k", right_on="rk",
        left_cols=["lv"], right_cols=["rv"], threshold=10)
    res_s, strat_s = j.adaptive_join(
        left, right, left_on="k", right_on="rk",
        left_cols=["lv"], right_cols=["rv"], threshold=0)
    assert strat_b == "broadcast" and strat_s == "shuffle"
    rows_b = sorted((r["__key"], r["lv"], r["rv"])
                    for r in res_b.take_all())
    rows_s = sorted((r["__key"], r["lv"], r["rv"])
                    for r in res_s.take_all())
    assert rows_b == rows_s == [(1, 10, 100), (2, 20, 200),
                                (2, 21, 200)]


def test_common_field_types_match_parquet():
    """COMMON_FIELD_TYPES (the schema-peek-free type registry used by
    hash_join callers) must agree with the actual testdata parquet
    footers for every column it lists — a wrong entry would make the
    join cast silently."""
    import pyarrow.parquet as pq

    actual = {}
    for t in ("orders", "lineitem", "customer", "supplier", "part",
              "nation", "region", "documents"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        for f in sch:
            actual[f.name] = f.type
    for name, typ in joins.COMMON_FIELD_TYPES.items():
        if name in actual:
            assert actual[name] == typ, (name, actual[name], typ)
    # documents-derived names not in any footer are int64/string by
    # construction (doc_id from row enumeration, text_sha hex digest)
    assert joins.COMMON_FIELD_TYPES["doc_id"] == pa.int64()
    assert joins.COMMON_FIELD_TYPES["text_sha"] == pa.string()
