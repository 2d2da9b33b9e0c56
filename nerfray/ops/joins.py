"""Generic big-big hash join: both inputs are large Datasets, neither
side broadcasts.

Ray-Data-first shape (the repo's standard co-group pattern, cf.
``stages/graph.py::_encode_edges_distributed``): each side is projected
to (key + payload), widened into ONE nullable union schema, hash-
bucketed on the key into ``n_buckets`` groups, and joined inside each
bucket with pyarrow's vectorized Acero hash join.  Exactly one shuffle
of exactly the projected columns; dispatch grain is the bucket (64
groups), never the key (SCALE.md dispatch-grain rule).  At 100 TB the
bucket count scales with the cluster, and a skewed key only ever
concentrates its own rows (a bucket holds many keys but the in-bucket
join is C++-vectorized).

The reference engine has no relational join surface (SURVEY.md §2.5
gap); the broadcast variant for small dims lives in
``ops/relational.py::customers_per_region``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ._shuffle import key_bucket as _key_bucket

N_JOIN_BUCKETS = 64


def _widen(batch: pa.Table, *, on: str, side: int, schema: pa.Schema,
           n_buckets: int) -> pa.Table:
    """Project one side's batch into the union schema: its own columns
    carried through, the other side's columns null."""
    n = batch.num_rows
    cols = []
    for field in schema:
        if field.name == "__key":
            cols.append(batch.column(on).cast(field.type))
        elif field.name == "__hb":
            cols.append(_key_bucket(batch.column(on), n_buckets))
        elif field.name == "__side":
            cols.append(pa.array(np.full(n, side, np.int8), pa.int8()))
        elif field.name in batch.column_names:
            cols.append(batch.column(field.name).cast(field.type))
        else:
            cols.append(pa.nulls(n, field.type))
    return pa.Table.from_arrays(cols, schema=schema)


def _bucket_join(group: pa.Table, *, left_names: list[str],
                 right_names: list[str], how: str,
                 out_schema: pa.Schema) -> pa.Table:
    """Acero hash join of the two sides inside one hash bucket."""
    import pyarrow.compute as pc
    is_right = pc.equal(group.column("__side"), pa.scalar(1, pa.int8()))
    lt = group.filter(pc.invert(is_right)) \
        .select(["__key"] + left_names)
    rt = group.filter(is_right).select(["__key"] + right_names)
    if lt.num_rows == 0 or (rt.num_rows == 0
                            and how in ("inner", "left semi")):
        return out_schema.empty_table()
    # single-threaded Acero: each map_groups task owns ONE cpu slot, so
    # Acero's own thread pool would oversubscribe the node
    joined = lt.join(rt, keys=["__key"], join_type=how, use_threads=False)
    # Acero returns columns in an unspecified order; normalize
    return joined.select([f.name for f in out_schema]) \
        .cast(out_schema)


def hash_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
              left_on: str, right_on: str,
              left_cols: list[str], right_cols: list[str],
              how: str = "inner",
              n_buckets: int = N_JOIN_BUCKETS) -> ray.data.Dataset:
    """Join two large Datasets on an integer or string key; returns a
    Dataset with ``__key`` (the join key) + ``left_cols`` +
    ``right_cols``.

    ``how`` is an Acero join type: "inner", "left outer", "left semi"
    (= EXISTS — emits each matching left row once regardless of right
    multiplicity, so the right side needs NO distinct contraction and
    its payload columns are ignored), "left anti" (= NOT EXISTS).
    Payload column names must be disjoint across sides (TPC-H-style
    prefixes); join keys must be non-null (SQL NULL never equals
    anything — drop null-key rows before joining).
    """
    if how in ("left semi", "left anti"):
        right_cols = []  # Acero semi/anti joins emit no right columns
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"payload columns must be disjoint: {overlap}")
    l_schema = left.schema()
    r_schema = right.schema()

    def _f(schema, name):
        return schema.base_schema.field(name) \
            if hasattr(schema, "base_schema") else schema.field(name)

    key_type = _f(l_schema, left_on).type
    r_key_type = _f(r_schema, right_on).type
    both_int = (pa.types.is_integer(key_type)
                and pa.types.is_integer(r_key_type))
    if not both_int and key_type != r_key_type:
        raise ValueError(
            f"join key types disagree: {left_on}={key_type} vs "
            f"{right_on}={r_key_type}")
    if both_int:
        key_type = pa.int64()
    fields = [pa.field("__key", key_type), pa.field("__hb", pa.int32()),
              pa.field("__side", pa.int8())]
    fields += [pa.field(c, _f(l_schema, c).type) for c in left_cols]
    fields += [pa.field(c, _f(r_schema, c).type) for c in right_cols]
    union_schema = pa.schema(fields)
    out_schema = pa.schema(
        [pa.field("__key", key_type)]
        + [f for f in fields if f.name not in ("__key", "__hb", "__side")])

    lw = left.select_columns([left_on] + left_cols).map_batches(
        _widen, fn_kwargs={"on": left_on, "side": 0,
                           "schema": union_schema, "n_buckets": n_buckets},
        batch_format="pyarrow", zero_copy_batch=True)
    rw = right.select_columns([right_on] + right_cols).map_batches(
        _widen, fn_kwargs={"on": right_on, "side": 1,
                           "schema": union_schema, "n_buckets": n_buckets},
        batch_format="pyarrow", zero_copy_batch=True)
    return lw.union(rw).groupby("__hb").map_groups(
        _bucket_join,
        fn_kwargs={"left_names": left_cols, "right_names": right_cols,
                   "how": how, "out_schema": out_schema},
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# query-surface pipelines over the TPC-H-ish tables
# ---------------------------------------------------------------------------


def _read(sf_dir: str, table: str, columns: list[str]) -> ray.data.Dataset:
    from .relational import _read as _rel_read
    return _rel_read(sf_dir, table, columns)


def orders_lineitem_rollup(sf_dir: str) -> ray.data.Dataset:
    """orders ⋈ lineitem on orderkey (both big, co-partitioned), rolled
    up by order status: lineitem count + exact int quantity sum."""
    import pyarrow.compute as pc

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    joined = hash_join(orders, items, left_on="o_orderkey",
                       right_on="l_orderkey",
                       left_cols=["o_orderstatus"],
                       right_cols=["l_quantity"])

    def _pre(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "o_orderstatus": batch.column("o_orderstatus"),
            "qty": pc.cast(pc.round(batch.column("l_quantity")),
                           pa.int64()),
        })

    return joined.map_batches(_pre, batch_format="pyarrow") \
        .groupby("o_orderstatus").aggregate(
            ray.data.aggregate.Count(alias_name="n_items"),
            ray.data.aggregate.Sum("qty", alias_name="sum_qty"))


def priority_shipped_counts(sf_dir: str,
                            cutoff: str = "1999-01-01") -> ray.data.Dataset:
    """Semi-join: orders with >= 1 lineitem shipped on/after ``cutoff``,
    counted per order priority (TPC-H Q4 shape).  The lineitem side is
    filtered AT THE READ and block-locally deduped (no extra shuffle —
    the semi join itself is duplicate-insensitive), then the single
    join exchange resolves EXISTS per order."""
    import pyarrow.compute as pc

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    cut = np.datetime64(cutoff)

    def _filt(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(
            batch.column("l_shipdate"),
            pa.scalar(cut.astype("datetime64[us]").item(),
                      pa.timestamp("us")))
        # block-local distinct: cheap combiner, cuts shuffle volume
        return pa.Table.from_pydict(
            {"l_orderkey": batch.filter(keep).column("l_orderkey")}) \
            .group_by(["l_orderkey"]).aggregate([])

    shipped = items.map_batches(_filt, batch_format="pyarrow",
                                zero_copy_batch=True)
    joined = hash_join(orders, shipped, left_on="o_orderkey",
                       right_on="l_orderkey",
                       left_cols=["o_orderpriority"], right_cols=[],
                       how="left semi")
    return joined.groupby("o_orderpriority").count() \
        .rename_columns({"count()": "n_orders"})


ORACLES = {
    "join_orders_lineitem": """
SELECT o.o_orderstatus, count(*)::BIGINT AS n_items,
       sum(l.l_quantity)::BIGINT AS sum_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus
""",
    "join_priority_shipped": """
SELECT o_orderpriority, count(*)::BIGINT AS n_orders
FROM orders WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate >= TIMESTAMP '1999-01-01')
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
}
