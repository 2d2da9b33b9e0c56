"""Relational operator demos over the TPC-H-ish tables: pruned reads,
pre-aggregated groupby, broadcast join, sort/limit top-k.

These exercise the generic engine surface (SURVEY.md §2.5/§2.6 gaps the
reference lacks) with exact DuckDB oracles. Aggregates are restricted to
order-independent kernels (count / min / max / int sums) so distributed
reduction order cannot perturb the hash comparison.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _read(sf_dir: str, table: str, columns: list[str]) -> ray.data.Dataset:
    """Column-pruned parquet read (prune at the read, not after)."""
    from nerfray.sources.parquet import read_parquet_clean
    return read_parquet_clean(os.path.join(sf_dir, f"{table}.parquet"),
                              columns=columns)


def orders_by_status(sf_dir: str) -> ray.data.Dataset:
    """Groupby rollup with order-independent aggregates."""
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])
    return ds.groupby("o_orderstatus") \
        .aggregate(ray.data.aggregate.Count(alias_name="n_orders"),
                   ray.data.aggregate.Min("o_totalprice",
                                          alias_name="min_price"),
                   ray.data.aggregate.Max("o_totalprice",
                                          alias_name="max_price"))


def orders_rollup_cube(sf_dir: str) -> ray.data.Dataset:
    """ROLLUP(status, priority): counts + exact integer price sums at
    (status, priority), (status) and () grains — the OLAP hierarchy in
    ONE data-sized shuffle: the base (status, priority) aggregate, from
    which the coarser levels are re-aggregated (tens of rows, free).
    'ALL' marks a rolled-up dimension (sentinel instead of NULL so the
    oracle compare is null-free)."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "orders",
               ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def _cast(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "status": batch.column("o_orderstatus"),
            "priority": batch.column("o_orderpriority"),
            "cents": pc.cast(pc.round(pc.multiply(
                batch.column("o_totalprice"), 100)), pa.int64()),
        })

    agg = ds.map_batches(_cast, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(["status", "priority"]).aggregate(
            ray.data.aggregate.Count(alias_name="n_orders"),
            ray.data.aggregate.Sum("cents", alias_name="sum_cents"))
    base = pa.concat_tables(
        t for t in map(ray.get, agg.to_arrow_refs()) if t.num_rows)

    def _roll(tbl: pa.Table, col: str) -> pa.Table:
        marked = tbl.set_column(
            tbl.column_names.index(col), col,
            pa.array(["ALL"] * tbl.num_rows, pa.string()))
        out = marked.group_by(["status", "priority"]).aggregate(
            [("n_orders", "sum"), ("sum_cents", "sum")])
        return out.rename_columns(
            ["status", "priority", "n_orders", "sum_cents"]
        ).select(["status", "priority", "n_orders", "sum_cents"])

    base = base.select(["status", "priority", "n_orders", "sum_cents"])
    lvl1 = _roll(base, "priority")
    lvl2 = _roll(lvl1, "status")
    return pa.concat_tables([base, lvl1, lvl2])


def top_customers(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Per-customer order counts -> global top-k (combiner + small sort).
    Ties broken by o_custkey asc (mirrored in the oracle)."""
    ds = _read(sf_dir, "orders", ["o_custkey"])
    counts = ds.groupby("o_custkey").count() \
        .rename_columns({"count()": "n_orders"})
    return counts.sort(["n_orders", "o_custkey"],
                       descending=[True, False]).limit(k)


def customers_per_region(sf_dir: str) -> ray.data.Dataset:
    """Broadcast join: nation+region (tiny dims) are read driver-side,
    ray.put once, and joined via in-task dict lookup inside map_batches —
    never a shuffle join (SURVEY.md §2.4 J1 pattern)."""
    import pyarrow.parquet as pq
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    r_name = dict(zip(region.column("r_regionkey").to_pylist(),
                      region.column("r_name").to_pylist()))
    nat_to_region = {
        nk: r_name[rk]
        for nk, rk in zip(nation.column("n_nationkey").to_pylist(),
                          nation.column("n_regionkey").to_pylist())}
    lookup_ref = ray.put(nat_to_region)

    def _attach(batch: pa.Table) -> pa.Table:
        lut = ray.get(lookup_ref)
        names = [lut[nk] for nk in batch.column("c_nationkey").to_pylist()]
        return pa.Table.from_pydict({
            "r_name": pa.array(names, pa.string())})

    cust = _read(sf_dir, "customer", ["c_nationkey"])
    return cust.map_batches(_attach, batch_format="pyarrow") \
        .groupby("r_name").count() \
        .rename_columns({"count()": "n_customers"})


def lineitem_by_flag(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-shaped rollup restricted to exactness-safe aggregates:
    l_quantity is integer-valued, so its float sum is exact (< 2^53) and
    order-independent; it is cast to int64 to match the oracle's BIGINT."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity"])
    agg = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        ray.data.aggregate.Count(alias_name="n_items"),
        ray.data.aggregate.Sum("l_quantity", alias_name="sum_qty"),
        ray.data.aggregate.Min("l_quantity", alias_name="min_qty"),
        ray.data.aggregate.Max("l_quantity", alias_name="max_qty"))

    def _cast(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        for col in ("sum_qty", "min_qty", "max_qty"):
            i = batch.column_names.index(col)
            batch = batch.set_column(
                i, col, pc.cast(pc.round(batch.column(col)), pa.int64()))
        return batch

    return agg.map_batches(_cast, batch_format="pyarrow")


def part_type_sizes(sf_dir: str) -> ray.data.Dataset:
    """Filter + groupby with int-sum (exact) aggregates."""
    ds = _read(sf_dir, "part", ["p_type", "p_size"])
    big = ds.filter(expr="p_size >= 25")
    return big.groupby("p_type") \
        .aggregate(ray.data.aggregate.Count(alias_name="n_parts"),
                   ray.data.aggregate.Sum("p_size", alias_name="sum_size"))


N_Q_BUCKETS = 64


def _quantile_bucket(group: pa.Table) -> pa.Table:
    """All (key, value) rows of one hash bucket: one lexsort + reduceat
    sweep computes count/median/p75 for EVERY key in the bucket —
    dispatch grain is the bucket, never the key (SCALE.md rule)."""
    import numpy as np
    keys = group.column("o_custkey").to_numpy(zero_copy_only=False)
    vals = group.column("o_totalprice").to_numpy(zero_copy_only=False)
    order = np.lexsort((vals, keys))
    k, v = keys[order], vals[order]
    starts = np.r_[0, np.nonzero(k[1:] != k[:-1])[0] + 1]
    ends = np.r_[starts[1:], len(k)]
    n = ends - starts
    # percentile_disc(q): element at ceil(q*n)-1 in sorted order.
    # q is DYADIC (1/2, 3/4) so q*n is float64-exact for any n and the
    # picked ELEMENT hash-matches DuckDB (no interpolation anywhere).
    med = v[starts + np.ceil(0.5 * n).astype(np.int64) - 1]
    p75 = v[starts + np.ceil(0.75 * n).astype(np.int64) - 1]
    return pa.Table.from_pydict({
        "o_custkey": pa.array(k[starts], pa.int64()),
        "n_orders": pa.array(n, pa.int64()),
        "median_price": pa.array(med, pa.float64()),
        "p75_price": pa.array(p75, pa.float64()),
    })


def customer_price_quantiles(sf_dir: str) -> ray.data.Dataset:
    """Exact per-customer order-price quantiles (percentile_disc
    semantics: a picked element, never an interpolation, so float
    values hash-match the oracle). One 64-way key-hash shuffle of
    (key, price) pairs; every per-key sweep is vectorized."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def _bucket(batch: pa.Table) -> pa.Table:
        from ._shuffle import key_bucket
        return batch.append_column(
            "hb", key_bucket(batch.column("o_custkey"), N_Q_BUCKETS))

    return ds.map_batches(_bucket, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("hb").map_groups(_quantile_bucket, batch_format="pyarrow")


def distinct_custkeys_by_status(sf_dir: str) -> ray.data.Dataset:
    """EXACT distinct customers per order status — the exact-path
    counterpart of ``ops/sketch.hll_registers``: a block-local dedup
    combiner shrinks each block to its distinct (status, custkey) pairs
    BEFORE the shuffle, then one global pair-dedup + tiny rollup."""

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_custkey"])

    def _local_distinct(batch: pa.Table) -> pa.Table:
        return batch.group_by(
            ["o_orderstatus", "o_custkey"]).aggregate([])

    pairs = ds.map_batches(_local_distinct, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby(["o_orderstatus", "o_custkey"]).count() \
        .drop_columns(["count()"])
    return pairs.groupby("o_orderstatus").count() \
        .rename_columns({"count()": "n_custkeys"})


def top_orders_per_status(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    return top_orders(
        _read(sf_dir, "orders",
              ["o_orderstatus", "o_orderkey", "o_totalprice"]), k=k)


def top_orders(ds: ray.data.Dataset, *, k: int = 3) -> ray.data.Dataset:
    """Windowed top-N per group (row_number() semantics): block-local
    per-status top-k combiners (k rows per status per block cross the
    wire), then a final per-status pick.  Ties broken (price desc,
    orderkey asc), mirrored in the oracle; prices pass through
    untouched so floats hash-match."""
    import numpy as np

    def _topk(tbl: pa.Table) -> pa.Table:
        st = np.asarray(tbl.column("o_orderstatus").to_pylist(),
                        dtype=object)
        key = tbl.column("o_orderkey").to_numpy(zero_copy_only=False)
        price = tbl.column("o_totalprice").to_numpy(zero_copy_only=False)
        keep_idx, ranks = [], []
        for s in np.unique(st):
            m = np.nonzero(st == s)[0]
            order = m[np.lexsort((key[m], -price[m]))[:k]]
            keep_idx.extend(order.tolist())
            ranks.extend(range(1, len(order) + 1))
        out = tbl.take(pa.array(keep_idx, pa.int64()))
        return out.append_column("rank", pa.array(ranks, pa.int64()))

    partials = ds.map_batches(
        lambda b: _topk(b).drop_columns(["rank"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("o_orderstatus").map_groups(
        _topk, batch_format="pyarrow")


ORACLES = {
    "orders_rollup_cube": """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*)::BIGINT AS n_orders,
       sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS sum_cents
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY 1, 2
""",
    "distinct_custkeys_by_status": """
SELECT o_orderstatus, count(DISTINCT o_custkey)::BIGINT AS n_custkeys
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
    "top_orders_per_status": """
SELECT o_orderstatus, o_orderkey, o_totalprice, rank FROM (
  SELECT o_orderstatus, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice DESC, o_orderkey)
           AS rank
  FROM orders) WHERE rank <= 3 ORDER BY o_orderstatus, rank
""",
    "customer_price_quantiles": """
SELECT o_custkey, count(*)::BIGINT AS n_orders,
       percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)
         AS median_price,
       percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)
         AS p75_price
FROM orders GROUP BY o_custkey ORDER BY o_custkey
""",
    "orders_by_status": """
SELECT o_orderstatus, count(*)::BIGINT AS n_orders,
       min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
    "top_customers": """
SELECT o_custkey, count(*)::BIGINT AS n_orders
FROM orders GROUP BY o_custkey
ORDER BY n_orders DESC, o_custkey ASC LIMIT 10
""",
    "customers_per_region": """
SELECT r.r_name, count(*)::BIGINT AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name ORDER BY r.r_name
""",
    "lineitem_by_flag": """
SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS n_items,
       sum(l_quantity)::BIGINT AS sum_qty,
       min(l_quantity)::BIGINT AS min_qty,
       max(l_quantity)::BIGINT AS max_qty
FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
""",
    "part_type_sizes": """
SELECT p_type, count(*)::BIGINT AS n_parts, sum(p_size)::BIGINT AS sum_size
FROM part WHERE p_size >= 25 GROUP BY p_type ORDER BY p_type
""",
}


# ---------------------------------------------------------------------------
# data-quality expectations (Deequ/Great-Expectations-style checks)
# ---------------------------------------------------------------------------
#
# The validation gate a production table passes before downstream jobs
# trust it: declared expectations (completeness, uniqueness, ranges,
# set membership) evaluated as ONE streaming pass of per-block metric
# partials (one tiny row per block, summed) plus ONE id-grain exchange
# for the exact-uniqueness check — the only expectation that inherently
# needs a shuffle.  Output is the audit table (check, value, passed),
# integers only, mirrored verbatim in SQL.

EXPECTED_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_quality_checks(sf_dir: str) -> ray.data.Dataset:
    """(check, value, passed) audit rows for the events table."""
    import os

    import numpy as np

    from nerfray.sources.parquet import read_parquet_clean

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "event_type", "value"])

    lo = np.datetime64("2020-01-01T00:00:00", "us").astype(np.int64)
    hi = np.datetime64("2030-01-01T00:00:00", "us").astype(np.int64)
    allowed = set(EXPECTED_EVENT_TYPES)

    def _metric_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ts = pc.cast(batch.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        types = batch.column("event_type").to_pylist()
        return pa.Table.from_pydict({
            "n_rows": pa.array([batch.num_rows], pa.int64()),
            "null_values": pa.array(
                [batch.column("value").null_count], pa.int64()),
            "neg_values": pa.array([int((v < 0).sum())], pa.int64()),
            "ts_oob": pa.array(
                [int(((ts < lo) | (ts >= hi)).sum())], pa.int64()),
            "bad_types": pa.array(
                [sum(1 for t in types if t not in allowed)], pa.int64()),
        })

    sums = {k: 0 for k in ("n_rows", "null_values", "neg_values",
                           "ts_oob", "bad_types")}
    for r in ev.map_batches(_metric_partial, batch_format="pyarrow",
                            zero_copy_batch=True).take_all():
        for k in sums:
            sums[k] += r[k]

    # exact uniqueness: the one check that needs an id-grain exchange
    n_distinct = ev.select_columns(["event_id"]) \
        .groupby("event_id").count().count()
    dup_ids = sums["n_rows"] - n_distinct

    checks = [
        ("event_id_unique", dup_ids, int(dup_ids == 0)),
        ("event_type_in_set", sums["bad_types"],
         int(sums["bad_types"] == 0)),
        ("row_count_min", sums["n_rows"], int(sums["n_rows"] >= 1)),
        ("ts_in_range", sums["ts_oob"], int(sums["ts_oob"] == 0)),
        ("value_nonnegative", sums["neg_values"],
         int(sums["neg_values"] == 0)),
        ("value_nonnull", sums["null_values"],
         int(sums["null_values"] == 0)),
    ]
    return ray.data.from_arrow(pa.Table.from_pydict({
        "check": pa.array([c[0] for c in checks], pa.string()),
        "value": pa.array([c[1] for c in checks], pa.int64()),
        "passed": pa.array([c[2] for c in checks], pa.int64()),
    }))


_TYPES_IN = ", ".join(f"'{t}'" for t in EXPECTED_EVENT_TYPES)

QUALITY_CHECKS_SQL = f"""
WITH m AS (
  SELECT count(*)::BIGINT AS n_rows,
         (count(*) - count(DISTINCT event_id))::BIGINT AS dup_ids,
         sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT
           AS null_values,
         sum(CASE WHEN value < 0 THEN 1 ELSE 0 END)::BIGINT
           AS neg_values,
         sum(CASE WHEN ts < TIMESTAMP '2020-01-01'
                    OR ts >= TIMESTAMP '2030-01-01'
                  THEN 1 ELSE 0 END)::BIGINT AS ts_oob,
         sum(CASE WHEN event_type NOT IN ({_TYPES_IN})
                  THEN 1 ELSE 0 END)::BIGINT AS bad_types
  FROM events)
SELECT 'event_id_unique' AS check, dup_ids AS value,
       CASE WHEN dup_ids = 0 THEN 1 ELSE 0 END::BIGINT AS passed FROM m
UNION ALL SELECT 'event_type_in_set', bad_types,
       CASE WHEN bad_types = 0 THEN 1 ELSE 0 END::BIGINT FROM m
UNION ALL SELECT 'row_count_min', n_rows,
       CASE WHEN n_rows >= 1 THEN 1 ELSE 0 END::BIGINT FROM m
UNION ALL SELECT 'ts_in_range', ts_oob,
       CASE WHEN ts_oob = 0 THEN 1 ELSE 0 END::BIGINT FROM m
UNION ALL SELECT 'value_nonnegative', neg_values,
       CASE WHEN neg_values = 0 THEN 1 ELSE 0 END::BIGINT FROM m
UNION ALL SELECT 'value_nonnull', null_values,
       CASE WHEN null_values = 0 THEN 1 ELSE 0 END::BIGINT FROM m
ORDER BY 1
"""

ORACLES["events_quality_checks"] = QUALITY_CHECKS_SQL


# ---------------------------------------------------------------------------
# TPC-H Q6: forecasting-revenue filter + single-row aggregate
# ---------------------------------------------------------------------------
#
# The classic selective scan: shipdate-year window x discount band x
# quantity cap, then ONE global sum.  Everything is pushed to the read
# (column pruning + a pyarrow row filter, so non-matching row groups
# never leave storage via min/max statistics); the per-block partials
# are two int64s, so the "shuffle" is a constant-size reduction no
# matter the corpus size.  Revenue is computed in integer
# cent x percent units (round(price*100) * round(discount*100)) so the
# distributed sum is order-independent and hash-exact vs the oracle.


Q6_SHIP_LO = "1996-01-01"
Q6_SHIP_HI = "1997-01-01"


def q6_revenue(sf_dir: str) -> pa.Table:
    """Single-row (n_rows, revenue_units) — driver holds two ints."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from nerfray.sources.parquet import read_parquet_clean

    lo = np.datetime64(Q6_SHIP_LO, "us")
    hi = np.datetime64(Q6_SHIP_HI, "us")
    # shipdate window pushed INTO the read: row groups whose min/max
    # statistics miss the window never leave storage
    f = pads.field("l_shipdate")
    ds = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"],
        filter=(f >= pa.scalar(lo)) & (f < pa.scalar(hi)))

    def _partial(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        disc = np.round(batch.column("l_discount")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        price = np.round(batch.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        mask = ((sd >= lo) & (sd < hi)
                & (disc >= 5) & (disc <= 7) & (qty < 24))
        return pa.Table.from_pydict({
            "n_rows": pa.array([int(mask.sum())], pa.int64()),
            "revenue_units": pa.array(
                [int((price[mask] * disc[mask]).sum())], pa.int64()),
        })

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    agg = parts.aggregate(
        ray.data.aggregate.Sum("n_rows", alias_name="n_rows"),
        ray.data.aggregate.Sum("revenue_units",
                               alias_name="revenue_units"))
    return pa.Table.from_pydict({
        "n_rows": pa.array([int(agg["n_rows"])], pa.int64()),
        "revenue_units": pa.array([int(agg["revenue_units"])],
                                  pa.int64()),
    })


Q6_SQL = f"""
SELECT count(*)::BIGINT AS n_rows,
       coalesce(sum(round(l_extendedprice * 100)::BIGINT
                    * round(l_discount * 100)::BIGINT), 0)::BIGINT
         AS revenue_units
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_SHIP_LO}'
  AND l_shipdate < TIMESTAMP '{Q6_SHIP_HI}'
  AND round(l_discount * 100)::BIGINT BETWEEN 5 AND 7
  AND l_quantity < 24
"""

ORACLES["lineitem_q6_revenue"] = Q6_SQL


# ---------------------------------------------------------------------------
# TPC-H Q13: customer distribution by order count
# ---------------------------------------------------------------------------
#
# The two-level aggregate: orders pre-combined to customer grain (the
# 64-way key-hash co-group — block partials first, so the exchange
# ships (custkey, count) partials, never order rows), LEFT-joined back
# to customer so zero-order customers land in the c_count=0 bucket,
# then the distribution itself is a tiny second groupby whose key
# domain is the max order count (bounded).


def q13_order_distribution(sf_dir: str) -> ray.data.Dataset:
    from nerfray.sources.parquet import read_parquet_clean
    from ray.data.aggregate import Sum
    from .joins import hash_join

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"])

    part_schema = pa.schema([("o_custkey", pa.int64()),
                             ("n", pa.int64()), ("hb", pa.int32())])

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        t = batch.group_by(["o_custkey"]).aggregate([([], "count_all")])
        t = t.rename_columns(["o_custkey", "n"])
        hb = (t.column("o_custkey").to_numpy(zero_copy_only=False) & 63) \
            .astype(np.int32)
        return t.append_column("hb", pa.array(hb, pa.int32())) \
            .cast(part_schema)

    def _bucket(group: pa.Table) -> pa.Table:
        out = pa.schema([("o_custkey", pa.int64()), ("n", pa.int64())])
        if group.num_rows == 0:
            return out.empty_table()
        return group.select(["o_custkey", "n"]).group_by(["o_custkey"]) \
            .aggregate([("n", "sum")]) \
            .rename_columns(["o_custkey", "n"]).cast(out)

    per_cust = orders.map_batches(_partial, batch_format="pyarrow",
                                  zero_copy_batch=True) \
        .groupby("hb").map_groups(_bucket, batch_format="pyarrow")

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"])
    joined = hash_join(cust, per_cust, left_on="c_custkey",
                       right_on="o_custkey", left_cols=[],
                       right_cols=["n"], how="left outer")

    def _fill0(batch: pa.Table) -> pa.Table:
        n = batch.column("n").fill_null(0)
        return pa.Table.from_pydict({
            "c_count": n, "n_cust_unit": pa.array(
                np.ones(batch.num_rows, np.int64), pa.int64())})

    return joined.map_batches(_fill0, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("c_count") \
        .aggregate(Sum("n_cust_unit", alias_name="n_cust"))


Q13_SQL = """
WITH per AS (
  SELECT c_custkey, count(o_custkey)::BIGINT AS c_count
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey)
SELECT c_count, count(*)::BIGINT AS n_cust
FROM per GROUP BY 1 ORDER BY 1
"""

ORACLES["orders_q13_distribution"] = Q13_SQL


# ---------------------------------------------------------------------------
# TPC-H Q15: top supplier(s) by shipped revenue in a quarter
# ---------------------------------------------------------------------------
#
# The view + scalar-max classic: per-supplier revenue partials combine
# per block (supplier grain is bounded), one groupby, then the global
# max is a ONE-int64 reduction and the winners a map-side filter —
# ties all survive, exactly as the SQL view semantics require.

Q15_SHIP_LO = "1996-01-01"
Q15_SHIP_HI = "1996-04-01"


def q15_top_supplier(sf_dir: str) -> ray.data.Dataset:
    import pyarrow.dataset as pads

    from nerfray.sources.parquet import read_parquet_clean
    from ray.data.aggregate import Max, Sum

    lo = np.datetime64(Q15_SHIP_LO, "us")
    hi = np.datetime64(Q15_SHIP_HI, "us")
    f = pads.field("l_shipdate")
    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"],
        filter=(f >= pa.scalar(lo)) & (f < pa.scalar(hi)))

    def _rev(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        keep = (sd >= lo) & (sd < hi)
        batch = batch.filter(pa.array(keep))
        price = np.round(batch.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        disc = np.round(batch.column("l_discount")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        return pa.Table.from_pydict({
            "l_suppkey": batch.column("l_suppkey"),
            "rev": pa.array(price * (100 - disc), pa.int64())})

    per_supp = li.map_batches(_rev, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("l_suppkey") \
        .aggregate(Sum("rev", alias_name="total_rev")).materialize()

    best = int(per_supp.aggregate(Max("total_rev"))["max(total_rev)"])

    def _winners(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.equal(batch.column("total_rev"), pa.scalar(best))) \
            .rename_columns(["s_suppkey", "total_rev"])

    return per_supp.map_batches(_winners, batch_format="pyarrow",
                                zero_copy_batch=True)


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
         sum(round(l_extendedprice * 100)::BIGINT
             * (100 - round(l_discount * 100)::BIGINT))::BIGINT
           AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_SHIP_LO}'
    AND l_shipdate < TIMESTAMP '{Q15_SHIP_HI}'
  GROUP BY 1)
SELECT s_suppkey, total_rev FROM rev
WHERE total_rev = (SELECT max(total_rev) FROM rev) ORDER BY s_suppkey
"""

ORACLES["join_q15_top_supplier"] = Q15_SQL


# ---------------------------------------------------------------------------
# TPC-H Q17: small-quantity orders for one brand (correlated average)
# ---------------------------------------------------------------------------
#
# The correlated-scalar-subquery classic: revenue of lineitems whose
# quantity is under 20% of their part's average.  Per-part (cnt,
# sum_qty) is the same order-grain pre-combine as Q18; the correlated
# comparison is cross-multiplied into integers (5*qty*cnt < sum_qty
# <=> qty < 0.2*avg since l_quantity is integer-valued), so the whole
# pipeline stays hash-exact.  The brand filter prunes the part side to
# a broadcast-sized id set BEFORE any lineitem work.

Q17_BRAND = "Brand#1"


def q17_small_quantity(sf_dir: str) -> pa.Table:
    from nerfray.sources.parquet import read_parquet_clean, \
        read_small_table
    from .joins import adaptive_join

    part = read_small_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand"])
    keys = part.filter(
        pc.equal(part.column("p_brand"), pa.scalar(Q17_BRAND))) \
        .column("p_partkey").to_numpy()
    keys = np.sort(keys)
    keys_ref = ray.put(keys)

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def _brand_only(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        if len(ks) == 0:
            keep = np.zeros(len(pk), bool)
        else:
            pos = np.searchsorted(ks, pk)
            pos[pos >= len(ks)] = 0
            keep = ks[pos] == pk
        batch = batch.filter(pa.array(keep))
        qty = np.round(batch.column("l_quantity")
                       .to_numpy(zero_copy_only=False)).astype(np.int64)
        price = np.round(batch.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        return pa.Table.from_pydict({
            "l_partkey": batch.column("l_partkey"),
            "qty": pa.array(qty, pa.int64()),
            "price_c": pa.array(price, pa.int64())})

    brand_li = li.map_batches(_brand_only, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    from ray.data.aggregate import Count, Sum
    stats = brand_li.groupby("l_partkey").aggregate(
        Count(alias_name="cnt"), Sum("qty", alias_name="sum_qty"))

    joined, _ = adaptive_join(
        brand_li, stats, left_on="l_partkey", right_on="l_partkey",
        left_cols=["qty", "price_c"], right_cols=["cnt", "sum_qty"])

    def _small(batch: pa.Table) -> pa.Table:
        qty = batch.column("qty").to_numpy(zero_copy_only=False)
        cnt = batch.column("cnt").to_numpy(zero_copy_only=False)
        sq = batch.column("sum_qty").to_numpy(zero_copy_only=False)
        price = batch.column("price_c").to_numpy(zero_copy_only=False)
        keep = 5 * qty * cnt < sq
        return pa.Table.from_pydict({
            "n_rows": pa.array([int(keep.sum())], pa.int64()),
            "revenue_c": pa.array([int(price[keep].sum())], pa.int64())})

    agg = joined.map_batches(_small, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .aggregate(Sum("n_rows", alias_name="n_rows"),
                   Sum("revenue_c", alias_name="revenue_c"))
    return pa.Table.from_pydict({
        "n_rows": pa.array([int(agg["n_rows"])], pa.int64()),
        "revenue_c": pa.array([int(agg["revenue_c"])], pa.int64())})


Q17_SQL = f"""
WITH brand_li AS (
  SELECT l_partkey, round(l_quantity)::BIGINT AS qty,
         round(l_extendedprice * 100)::BIGINT AS price_c
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = '{Q17_BRAND}'),
stats AS (
  SELECT l_partkey, count(*)::BIGINT AS cnt,
         sum(qty)::BIGINT AS sum_qty
  FROM brand_li GROUP BY 1)
SELECT count(*)::BIGINT AS n_rows,
       coalesce(sum(price_c), 0)::BIGINT AS revenue_c
FROM brand_li b JOIN stats s USING (l_partkey)
WHERE 5 * b.qty * s.cnt < s.sum_qty
"""

ORACLES["lineitem_q17_small_qty"] = Q17_SQL


# -- Pareto frontier (2-D skyline) --------------------------------------------
#
# Non-dominated parts under minimize(p_retailprice, p_size): a part is
# on the skyline iff no other part is <= on both dimensions and < on at
# least one (equal points all survive).  Distributed shape: every block
# reduces to its LOCAL skyline (the global skyline is a subset of the
# union of local skylines, so the partial is lossless), then ONE tiny
# constant-key co-group merges the partials with the same sweep.  The
# partial never grows past the block's own frontier; only frontier rows
# travel the exchange.  Price compares are raw float64 equality/order —
# no arithmetic, so the DuckDB NOT EXISTS oracle agrees bit-for-bit.

_PARETO_SCHEMA = pa.schema([
    ("p_partkey", pa.int64()),
    ("p_size", pa.int64()),
    ("p_retailprice", pa.float64()),
])


def _skyline_rows(key: np.ndarray, size: np.ndarray,
                  price: np.ndarray) -> pa.Table:
    """Rows whose (price, size) point is Pareto-minimal (ties kept)."""
    # minimal size per distinct price, sorted by price asc
    order = np.lexsort((size, price))
    p, s = price[order], size[order]
    new_price = np.r_[True, p[1:] != p[:-1]]
    pstart = np.flatnonzero(new_price)
    min_s = s[pstart]                      # min size at each price
    # survivor prices: strictly decreasing min-size prefix
    run_min = np.minimum.accumulate(min_s)
    prev_min = np.r_[np.int64(np.iinfo(np.int64).max), run_min[:-1]]
    alive = min_s < prev_min
    # keep every ORIGINAL row equal to a surviving (price, size) point
    sky_p, sky_s = p[pstart[alive]], min_s[alive]
    idx = np.searchsorted(sky_p, price)
    idx_c = np.clip(idx, 0, len(sky_p) - 1)
    keep = (sky_p[idx_c] == price) & (sky_s[idx_c] == size)
    return pa.Table.from_pydict({
        "p_partkey": pa.array(key[keep], pa.int64()),
        "p_size": pa.array(size[keep], pa.int64()),
        "p_retailprice": pa.array(price[keep], pa.float64()),
    }, schema=_PARETO_SCHEMA)


def _pareto_partial(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return _PARETO_SCHEMA.empty_table().append_column(
            "k", pa.array([], pa.int32()))
    t = _skyline_rows(
        batch.column("p_partkey").to_numpy(zero_copy_only=False)
             .astype(np.int64),
        batch.column("p_size").to_numpy(zero_copy_only=False)
             .astype(np.int64),
        batch.column("p_retailprice").to_numpy(zero_copy_only=False))
    return t.append_column("k", pa.array(np.zeros(t.num_rows, np.int32)))


# worst case for the constant-key merge: adversarially anti-correlated
# data where every block's frontier IS the block (union ~ input size).
# Real part-like tables shrink orders of magnitude at the partial; if an
# input ever doesn't, fail loudly (the scale path is a price-range sort
# + per-block sweep with a block-grain carry, cf. docs_range_export's
# boundary machinery) rather than silently concentrating rows on one
# worker.
PARETO_FINAL_CAP = 2_000_000


def _pareto_final(group: pa.Table) -> pa.Table:
    if group.num_rows > PARETO_FINAL_CAP:
        raise ValueError(
            f"pareto final merge got {group.num_rows} frontier rows "
            f"(> {PARETO_FINAL_CAP}): block partials are not shrinking "
            "on this input; switch to the sorted-sweep variant")
    if group.num_rows == 0:
        return _PARETO_SCHEMA.empty_table()
    return _skyline_rows(
        group.column("p_partkey").to_numpy(zero_copy_only=False),
        group.column("p_size").to_numpy(zero_copy_only=False),
        group.column("p_retailprice").to_numpy(zero_copy_only=False))


def part_pareto(sf_dir: str) -> ray.data.Dataset:
    ds = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])
    return ds.map_batches(_pareto_partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("k").map_groups(_pareto_final, batch_format="pyarrow")


PARETO_SQL = """
SELECT p_partkey, p_size::BIGINT AS p_size, p_retailprice
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size))
ORDER BY p_partkey
"""

ORACLES["part_pareto"] = PARETO_SQL
