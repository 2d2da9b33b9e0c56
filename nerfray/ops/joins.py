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
import pyarrow.compute as pc
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
    if lt.num_rows == 0 and how != "full outer":
        return out_schema.empty_table()
    if rt.num_rows == 0 and how in ("inner", "left semi"):
        return out_schema.empty_table()
    # single-threaded Acero: each map_groups task owns ONE cpu slot, so
    # Acero's own thread pool would oversubscribe the node
    joined = lt.join(rt, keys=["__key"], join_type=how, use_threads=False)
    # Acero returns columns in an unspecified order; normalize
    return joined.select([f.name for f in out_schema]) \
        .cast(out_schema)


def _f(schema, name):
    return schema.base_schema.field(name) \
        if hasattr(schema, "base_schema") else schema.field(name)


# Repo-wide stable column types: the testdata parquet schemas (pinned by
# tests/test_joins.py::test_common_field_types_match_parquet) plus the
# two canonical documents-derived names.  Only names whose type is
# globally consistent across every pipeline belong here — a column that
# is ever re-typed under the same name must NOT be listed (the caller
# declares it per-site instead).
COMMON_FIELD_TYPES: dict = {
    "o_orderkey": pa.int64(), "o_custkey": pa.int64(),
    "o_orderstatus": pa.string(), "o_totalprice": pa.float64(),
    "o_orderdate": pa.timestamp("us"), "o_orderpriority": pa.string(),
    "l_orderkey": pa.int64(), "l_partkey": pa.int64(),
    "l_suppkey": pa.int64(), "l_linenumber": pa.int32(),
    "l_quantity": pa.float64(), "l_extendedprice": pa.float64(),
    "l_discount": pa.float64(), "l_tax": pa.float64(),
    "l_returnflag": pa.string(), "l_linestatus": pa.string(),
    "l_shipdate": pa.timestamp("us"),
    "c_custkey": pa.int64(), "c_name": pa.string(),
    "c_nationkey": pa.int32(), "c_acctbal": pa.float64(),
    "c_mktsegment": pa.string(),
    "s_suppkey": pa.int64(), "s_name": pa.string(),
    "s_nationkey": pa.int32(), "s_acctbal": pa.float64(),
    "p_partkey": pa.int64(), "p_name": pa.string(),
    "p_brand": pa.string(), "p_type": pa.string(), "p_size": pa.int32(),
    "n_nationkey": pa.int32(), "n_name": pa.string(),
    "n_regionkey": pa.int32(),
    "r_regionkey": pa.int32(), "r_name": pa.string(),
    "doc_id": pa.int64(), "text_sha": pa.string(),
}


def _resolve_types(ds: ray.data.Dataset, names: list[str],
                   field_types: dict | None) -> dict:
    """Column name -> pyarrow type for ``names``, WITHOUT triggering a
    peek execution when avoidable.

    ``Dataset.schema()`` on an un-executed map_batches plan runs a
    limit-1 peek whose task CANCELLATION can race Ray core into a
    fatal ``task_manager.cc:930 Check failed`` (observed killing a
    full solo gate run mid-catalog, 2026-08-19 — the process aborts,
    so no user-level retry exists).  Resolution order per column:
    caller-declared ``field_types``, then the statically-known plan
    schema (``fetch_if_missing=False`` — free, exact, available on
    materialized / from_arrow datasets), then COMMON_FIELD_TYPES, then
    ONE peek for whatever remains (back-compat for external callers)."""
    out = {}
    missing = [n for n in names if not (field_types and n in field_types)]
    for n in names:
        if n not in missing:
            out[n] = field_types[n]
    if missing:
        sch = None
        try:
            sch = ds.schema(fetch_if_missing=False)
        except Exception:
            sch = None
        if sch is not None:
            try:
                for n in missing:
                    out[n] = _f(sch, n).type
                missing = []
            except KeyError:
                pass
    if missing:
        still = [n for n in missing if n not in COMMON_FIELD_TYPES]
        for n in missing:
            if n in COMMON_FIELD_TYPES:
                out[n] = COMMON_FIELD_TYPES[n]
        missing = still
    if missing:
        sch = ds.schema()
        for n in missing:
            out[n] = _f(sch, n).type
    return out


def hash_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
              left_on: str, right_on: str,
              left_cols: list[str], right_cols: list[str],
              how: str = "inner",
              n_buckets: int = N_JOIN_BUCKETS,
              field_types: dict | None = None) -> ray.data.Dataset:
    """Join two large Datasets on an integer or string key; returns a
    Dataset with ``__key`` (the join key) + ``left_cols`` +
    ``right_cols``.

    ``how`` is an Acero join type: "inner", "left outer", "left semi"
    (= EXISTS — emits each matching left row once regardless of right
    multiplicity, so the right side needs NO distinct contraction and
    its payload columns are ignored), "left anti" (= NOT EXISTS), or
    "full outer" (unmatched rows of BOTH sides survive with nulls; the
    key column is coalesced across sides, and bucket co-partitioning
    makes the per-bucket full-outer union exact globally).
    Payload column names must be disjoint across sides (TPC-H-style
    prefixes); join keys must be non-null (SQL NULL never equals
    anything — drop null-key rows before joining).

    ``field_types`` (column name -> pyarrow type, covering the keys and
    payload columns) lets the caller skip the two schema-peek
    executions — see ``_resolve_types`` for why that matters.
    """
    if how in ("left semi", "left anti"):
        right_cols = []  # Acero semi/anti joins emit no right columns
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"payload columns must be disjoint: {overlap}")
    lt = _resolve_types(left, [left_on] + left_cols, field_types)
    rt = _resolve_types(right, [right_on] + right_cols, field_types)

    key_type = lt[left_on]
    r_key_type = rt[right_on]
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
    fields += [pa.field(c, lt[c]) for c in left_cols]
    fields += [pa.field(c, rt[c]) for c in right_cols]
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
# skew-aware variant: salt the hot keys
# ---------------------------------------------------------------------------
#
# hash_join's bucket grain absorbs MODERATE skew (a bucket holds many
# keys; the in-bucket join is C++-vectorized), but one pathological key
# carrying a large fraction of the fact side still lands every one of
# its rows in a single bucket — one straggler task, one worker's memory.
# The salted variant splits each detected hot key across ``n_salts``
# sub-buckets: fact rows get a round-robin salt, the other side's rows
# for that key are replicated once per salt (S× volume for hot keys
# ONLY), and the in-bucket join keys on (key, salt).  The output multiset
# is identical to hash_join for every Acero join type: each fact row
# carries exactly one salt and meets exactly one replica of each
# matching build row.


def detect_hot_keys(ds: ray.data.Dataset, *, on: str,
                    threshold: int,
                    key_type: pa.DataType | None = None) -> list:
    """Exact global counts per key (per-block combiner first), keys with
    count > threshold.  The result is driver-bounded by construction:
    at most total_rows / threshold keys can exceed the threshold.
    ``key_type`` skips the schema-peek execution (see _resolve_types)."""
    import pyarrow.compute as pc

    if key_type is None:
        key_type = _resolve_types(ds, [on], None)[on]
    part_schema = pa.schema([(on, key_type), ("c", pa.int64()),
                             ("hb", pa.int32())])
    out_schema = pa.schema([(on, key_type), ("csum", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        t = batch.select([on]).group_by([on]).aggregate([([], "count_all")])
        t = t.rename_columns([on, "c"])
        return t.append_column(
            "hb", _key_bucket(t.column(on), N_JOIN_BUCKETS)) \
            .cast(part_schema)

    def _sum_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        return group.select([on, "c"]).group_by([on]) \
            .aggregate([("c", "sum")]) \
            .rename_columns([on, "csum"]).cast(out_schema)

    def _hot_only(batch: pa.Table) -> pa.Table:
        # filter + project in ONE map: Ray's fused Filter->Project
        # passes empty bundles through unprojected, which trips the
        # executor's mixed-schema RefBundle warning
        return batch.filter(
            pc.greater(batch.column("csum"),
                       pa.scalar(int(threshold)))).select([on])

    hot = ds.select_columns([on]) \
        .map_batches(_partial, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("hb").map_groups(_sum_bucket, batch_format="pyarrow") \
        .map_batches(_hot_only, batch_format="pyarrow",
                     zero_copy_batch=True).take_all()
    return [r[on] for r in hot]


_SALT_STRIDE = 37  # odd -> distinct buckets per salt at any power-of-two


def _widen_salted(batch: pa.Table, *, on: str, side: int,
                  schema: pa.Schema, n_buckets: int, hot_set: pa.Array,
                  n_salts: int) -> pa.Table:
    """_widen plus the salt: fact (side 0) hot rows round-robin over
    salts; build (side 1) hot rows replicated once per salt."""
    import pyarrow.compute as pc
    n = batch.num_rows
    keys = batch.column(on)
    is_hot = pc.is_in(keys, value_set=hot_set).to_numpy(
        zero_copy_only=False) if len(hot_set) else np.zeros(n, bool)

    def _one(tbl: pa.Table, salt: np.ndarray) -> pa.Table:
        m = tbl.num_rows
        kb = _key_bucket(tbl.column(on), 1 << 30).to_numpy(
            zero_copy_only=False).astype(np.int64)
        hb = ((kb + salt * _SALT_STRIDE) % n_buckets).astype(np.int32)
        cols = []
        for field in schema:
            if field.name == "__key":
                cols.append(tbl.column(on).cast(field.type))
            elif field.name == "__hb":
                cols.append(pa.array(hb, pa.int32()))
            elif field.name == "__salt":
                cols.append(pa.array(salt.astype(np.int32), pa.int32()))
            elif field.name == "__side":
                cols.append(pa.array(np.full(m, side, np.int8), pa.int8()))
            elif field.name in tbl.column_names:
                cols.append(tbl.column(field.name).cast(field.type))
            else:
                cols.append(pa.nulls(m, field.type))
        return pa.Table.from_arrays(cols, schema=schema)

    if side == 0:  # fact: one salted copy of every row
        salt = np.where(is_hot, np.arange(n, dtype=np.int64) % n_salts, 0)
        return _one(batch, salt)
    # build: cold rows once at salt 0, hot rows once PER salt
    cold = batch.filter(pa.array(~is_hot))
    parts = [_one(cold, np.zeros(cold.num_rows, np.int64))]
    hot_rows = batch.filter(pa.array(is_hot))
    if hot_rows.num_rows:
        for s in range(n_salts):
            parts.append(_one(hot_rows,
                              np.full(hot_rows.num_rows, s, np.int64)))
    return pa.concat_tables(parts)


def _bucket_join_salted(group: pa.Table, *, left_names: list[str],
                        right_names: list[str], how: str,
                        out_schema: pa.Schema) -> pa.Table:
    import pyarrow.compute as pc
    is_right = pc.equal(group.column("__side"), pa.scalar(1, pa.int8()))
    lt = group.filter(pc.invert(is_right)) \
        .select(["__key", "__salt"] + left_names)
    rt = group.filter(is_right).select(["__key", "__salt"] + right_names)
    if lt.num_rows == 0 and how != "full outer":
        return out_schema.empty_table()
    if rt.num_rows == 0 and how in ("inner", "left semi"):
        return out_schema.empty_table()
    joined = lt.join(rt, keys=["__key", "__salt"], join_type=how,
                     use_threads=False)
    return joined.select([f.name for f in out_schema]).cast(out_schema)


def salted_hash_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
                     left_on: str, right_on: str,
                     left_cols: list[str], right_cols: list[str],
                     how: str = "inner", hot_threshold: int = 1_000_000,
                     n_salts: int = 8,
                     n_buckets: int = N_JOIN_BUCKETS,
                     field_types: dict | None = None) -> ray.data.Dataset:
    """hash_join with hot-key salting; ``left`` is the fact side whose
    key histogram is measured (one extra pass over the pruned key
    column).  Same output columns and multiset as hash_join.  "full
    outer" is rejected: build-side replication per salt would emit one
    spurious null-left copy per unmatched salt — use hash_join (an
    unmatched BUILD row is by definition not hot on the probe side).
    """
    if how == "full outer":
        raise ValueError("salted_hash_join does not support full outer")
    if how in ("left semi", "left anti"):
        right_cols = []
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"payload columns must be disjoint: {overlap}")
    lt = _resolve_types(left, [left_on] + left_cols, field_types)
    rt = _resolve_types(right, [right_on] + right_cols, field_types)
    hot = detect_hot_keys(left, on=left_on, threshold=hot_threshold,
                          key_type=lt[left_on])

    key_type = lt[left_on]
    r_key_type = rt[right_on]
    both_int = (pa.types.is_integer(key_type)
                and pa.types.is_integer(r_key_type))
    if not both_int and key_type != r_key_type:
        raise ValueError(
            f"join key types disagree: {left_on}={key_type} vs "
            f"{right_on}={r_key_type}")
    if both_int:
        key_type = pa.int64()
    hot_set = pa.array(hot, key_type)
    fields = [pa.field("__key", key_type), pa.field("__hb", pa.int32()),
              pa.field("__salt", pa.int32()), pa.field("__side", pa.int8())]
    fields += [pa.field(c, lt[c]) for c in left_cols]
    fields += [pa.field(c, rt[c]) for c in right_cols]
    union_schema = pa.schema(fields)
    out_schema = pa.schema(
        [pa.field("__key", key_type)]
        + [f for f in fields
           if f.name not in ("__key", "__hb", "__salt", "__side")])

    lw = left.select_columns([left_on] + left_cols).map_batches(
        _widen_salted,
        fn_kwargs={"on": left_on, "side": 0, "schema": union_schema,
                   "n_buckets": n_buckets, "hot_set": hot_set,
                   "n_salts": n_salts},
        batch_format="pyarrow", zero_copy_batch=True)
    rw = right.select_columns([right_on] + right_cols).map_batches(
        _widen_salted,
        fn_kwargs={"on": right_on, "side": 1, "schema": union_schema,
                   "n_buckets": n_buckets, "hot_set": hot_set,
                   "n_salts": n_salts},
        batch_format="pyarrow", zero_copy_batch=True)
    return lw.union(rw).groupby("__hb").map_groups(
        _bucket_join_salted,
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


def skew_salted_rollup(sf_dir: str) -> ray.data.Dataset:
    """Planted-skew exercise of salted_hash_join: a derived fact key
    sends ~1/7 of lineitem (every linenumber-7 row) to key 0; the dim
    side is pure arithmetic (k in 0..999, payload = 7k + 1) so the
    whole join + rollup has an exact SQL mirror.  hot_threshold=2000
    puts key 0 (8.6k rows at sf0.01, 86k at sf0.1) far above the
    ~n/1000 cold keys, so the hot path genuinely salts at gate scale."""
    import pyarrow.compute as pc

    items = _read(sf_dir, "lineitem",
                  ["l_orderkey", "l_linenumber", "l_quantity"])

    def _fact(batch: pa.Table) -> pa.Table:
        k = pc.if_else(pc.equal(batch.column("l_linenumber"), 7),
                       pa.scalar(0, pa.int64()),
                       pc.cast(pc.subtract(
                           batch.column("l_orderkey"),
                           pc.multiply(pc.divide(batch.column("l_orderkey"),
                                                 1000), 1000)), pa.int64()))
        return pa.Table.from_pydict({
            "k": k,
            "qty": pc.cast(pc.round(batch.column("l_quantity")), pa.int64()),
        })

    def _dim(batch: pa.Table) -> pa.Table:
        k = pc.cast(batch.column("id"), pa.int64())
        return pa.Table.from_pydict({
            "k": k, "payload": pc.add(pc.multiply(k, 7), 1)})

    fact = items.map_batches(_fact, batch_format="pyarrow",
                             zero_copy_batch=True)
    dim = ray.data.range(1000).map_batches(_dim, batch_format="pyarrow")
    joined = salted_hash_join(fact, dim, left_on="k", right_on="k",
                              left_cols=["qty"], right_cols=["payload"],
                              hot_threshold=2000,
                              field_types={"k": pa.int64(),
                                           "qty": pa.int64(),
                                           "payload": pa.int64()})
    return joined.groupby("__key").aggregate(
        ray.data.aggregate.Count(alias_name="n_rows"),
        ray.data.aggregate.Sum("qty", alias_name="sum_qty"),
        ray.data.aggregate.Max("payload", alias_name="payload"),
    ).rename_columns({"__key": "k"})


def full_outer_coverage(sf_dir: str) -> ray.data.Dataset:
    """orders FULL OUTER customer on custkey, rolled up by match class
    (matched / customer_only / order_only) with the coalesced-key sum —
    the referential-coverage audit a warehouse runs on fact/dim pairs
    (which dim rows are dead, which fact rows are orphans). Exercises
    the full-outer path: unmatched rows of BOTH sides survive the
    per-bucket Acero join with nulls, and the key column is coalesced."""
    import pyarrow.compute as pc

    # every synthetic customer has orders, so both sides are filtered
    # by deterministic predicates to surface all three classes: keeping
    # 1/3 of orders strands some customers (customer_only), dropping
    # custkey % 5 == 4 customers orphans their orders (order_only)
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def _lf(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ok % 3 == 0))

    def _rf(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ck % 5 != 4))

    orders = orders.map_batches(_lf, batch_format="pyarrow",
                                zero_copy_batch=True)
    cust = cust.map_batches(_rf, batch_format="pyarrow",
                            zero_copy_batch=True)
    j = hash_join(orders, cust, left_on="o_custkey",
                  right_on="c_custkey", left_cols=["o_orderkey"],
                  right_cols=["c_name"], how="full outer")

    def _classify(batch: pa.Table) -> pa.Table:
        left_null = pc.is_null(batch.column("o_orderkey"))
        right_null = pc.is_null(batch.column("c_name"))
        side = pc.if_else(
            left_null, pa.scalar("customer_only"),
            pc.if_else(right_null, pa.scalar("order_only"),
                       pa.scalar("matched")))
        return pa.Table.from_pydict({
            "side": side,
            "k": pc.cast(batch.column("__key"), pa.int64()),
        })

    return j.map_batches(_classify, batch_format="pyarrow")         .groupby("side").aggregate(
            ray.data.aggregate.Count(alias_name="n_rows"),
            ray.data.aggregate.Sum("k", alias_name="sum_key"))




# ---------------------------------------------------------------------------
# broadcast interval (band) join
# ---------------------------------------------------------------------------
#
# The non-equi join the equi-only hash_join cannot express: each fact
# row finds the band whose [lo, hi) interval contains its value.  The
# band table is small by construction (rate cards, SLA tiers, price
# brackets), so it broadcasts once (ray.put of the sorted bounds) and
# every task binary-searches its batch (np.searchsorted) — a map-only
# join with NO shuffle; only the final band-grain rollup exchanges
# (band, user) partials.  At 100 TB the band table stays O(bands) and
# the exchange O(bands x users-per-band), never O(rows).

N_VALUE_BANDS = 23          # [b^2, (b+1)^2) covers events.value <= 529


def band_join_rollup(events: ray.data.Dataset,
                     bounds: np.ndarray) -> ray.data.Dataset:
    """(band, lo, hi, n_events, n_users, sum_cents) per non-empty
    band; ``bounds`` is the sorted array of band lower edges plus the
    final upper edge.  Exact: counts are integers and value rides as
    round(value*100) cents."""
    bounds_ref = ray.put(np.asarray(bounds, dtype=np.float64))

    def _assign(batch: pa.Table) -> pa.Table:
        b = ray.get(bounds_ref)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        band = np.searchsorted(b, v, side="right") - 1
        # inner-join semantics: values outside [b[0], b[-1]) match no
        # band (searchsorted would otherwise yield -1 / n_bands)
        ok = (band >= 0) & (band < len(b) - 1)
        band, v_ok = band[ok], v[ok]
        u = batch.column("user_id").to_numpy(zero_copy_only=False)[ok]
        cents = np.round(v_ok * 100).astype(np.int64)
        t = pa.Table.from_pydict({
            "band": pa.array(band, pa.int64()),
            "user_id": pa.array(u, pa.int64()),
            "cents": pa.array(cents, pa.int64()),
        })
        # block combiner to (band, user) grain before the shuffle
        return t.group_by(["band", "user_id"]).aggregate(
            [("cents", "count"), ("cents", "sum")]).rename_columns(
            ["band", "user_id", "c", "cents"])

    def _edges(batch: pa.Table) -> pa.Table:
        band = batch.column("band").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "band": batch.column("band"),
            "lo": pa.array(band * band, pa.int64()),
            "hi": pa.array((band + 1) * (band + 1), pa.int64()),
            "n_events": batch.column("n_events"),
            "n_users": batch.column("n_users"),
            "sum_cents": batch.column("sum_cents"),
        })

    from ray.data.aggregate import Count, Sum
    per_user = events.map_batches(_assign, batch_format="pyarrow",
                                  zero_copy_batch=True) \
        .groupby(["band", "user_id"]).aggregate(Sum("c"), Sum("cents"))
    return per_user.groupby("band").aggregate(
        Sum("sum(c)"), Count(), Sum("sum(cents)")) \
        .rename_columns({"sum(sum(c))": "n_events",
                         "count()": "n_users",
                         "sum(sum(cents))": "sum_cents"}) \
        .map_batches(_edges, batch_format="pyarrow")


def events_band_join(sf_dir: str) -> ray.data.Dataset:
    """Quadratic rate-card bands over events.value."""
    import os

    from nerfray.sources.parquet import read_parquet_clean
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "value"])
    edges = (np.arange(N_VALUE_BANDS + 1, dtype=np.float64)) ** 2
    return band_join_rollup(ev, edges)


BAND_JOIN_SQL = f"""
WITH bands AS (
  SELECT b AS band, (b * b)::BIGINT AS lo,
         ((b + 1) * (b + 1))::BIGINT AS hi
  FROM unnest(generate_series(0, {N_VALUE_BANDS - 1})) AS t(b)
),
j AS (
  SELECT b.band, b.lo, b.hi, e.user_id,
         round(e.value * 100)::BIGINT AS cents
  FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
)
SELECT band::BIGINT AS band, lo, hi, count(*)::BIGINT AS n_events,
       count(DISTINCT user_id)::BIGINT AS n_users,
       sum(cents)::BIGINT AS sum_cents
FROM j GROUP BY band, lo, hi ORDER BY band
"""

ORACLES = {
    "events_band_join": BAND_JOIN_SQL,
    "join_skew_salted": """
WITH dim AS (
  SELECT k, (7 * k + 1)::BIGINT AS payload
  FROM unnest(generate_series(0, 999)) AS t(k)
),
fact AS (
  SELECT CASE WHEN l_linenumber = 7 THEN 0
              ELSE l_orderkey % 1000 END AS k,
         round(l_quantity)::BIGINT AS qty
  FROM lineitem
)
SELECT f.k::BIGINT AS k, count(*)::BIGINT AS n_rows,
       sum(f.qty)::BIGINT AS sum_qty, max(d.payload)::BIGINT AS payload
FROM fact f JOIN dim d ON d.k = f.k
GROUP BY f.k ORDER BY f.k
""",
    "join_orders_lineitem": """
SELECT o.o_orderstatus, count(*)::BIGINT AS n_items,
       sum(l.l_quantity)::BIGINT AS sum_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus
""",
    "join_full_outer": """
SELECT CASE WHEN o.o_orderkey IS NULL THEN 'customer_only'
            WHEN c.c_name IS NULL THEN 'order_only'
            ELSE 'matched' END AS side,
       count(*)::BIGINT AS n_rows,
       sum(coalesce(o.o_custkey, c.c_custkey))::BIGINT AS sum_key
FROM (SELECT * FROM orders WHERE o_orderkey % 3 = 0) o
FULL OUTER JOIN (SELECT * FROM customer WHERE c_custkey % 5 != 4) c
ON o.o_custkey = c.c_custkey
GROUP BY side ORDER BY side
""",
    "join_priority_shipped": """
SELECT o_orderpriority, count(*)::BIGINT AS n_orders
FROM orders WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate >= TIMESTAMP '1999-01-01')
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
}


# ---------------------------------------------------------------------------
# TPC-H Q3-shaped 3-table join pipeline
# ---------------------------------------------------------------------------
#
# customer (segment filter) --left-semi--> orders (date filter)
# --inner--> lineitem (ship filter, revenue partials PRE-combined per
# block before the join) --> order-grain rollup --> global top-k.
# Revenue is integer-exact: round(price*100) * (100 - round(disc*100))
# in 1e-4-dollar units, so the float-summation-order trap never
# arises and the oracle hash-matches.  Scale shape: the semi join
# ships no customer payload, lineitem pre-aggregates to order grain
# inside the scan task, and only order-grain rows reach the final
# (tiny) sort.

Q3_CUTOFF = "1998-01-01"
Q3_SEGMENT = "BUILDING"


def q3_shipping_topk(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    import os

    import numpy as np

    from nerfray.sources.parquet import read_parquet_clean

    cutoff = np.datetime64(Q3_CUTOFF, "us")

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"])

    def _seg(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("c_mktsegment"),
                                     Q3_SEGMENT)) \
            .select(["c_custkey"])

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"])

    def _odate(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch.column("o_orderdate"),
                                    pa.scalar(cutoff)))

    building_orders = hash_join(
        orders.map_batches(_odate, batch_format="pyarrow"),
        cust.map_batches(_seg, batch_format="pyarrow"),
        left_on="o_custkey", right_on="c_custkey",
        left_cols=["o_orderkey", "o_orderdate", "o_orderpriority"],
        right_cols=[], how="left semi") \
        .drop_columns(["__key"])

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])

    def _rev_partial(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([("l_orderkey", pa.int64()),
                                ("rev", pa.int64())])
        t = batch.filter(pc.greater(batch.column("l_shipdate"),
                                    pa.scalar(cutoff)))
        if t.num_rows == 0:
            return out_schema.empty_table()
        price_c = np.round(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100).astype(np.int64)
        disc_pct = np.round(
            t.column("l_discount").to_numpy(zero_copy_only=False)
            * 100).astype(np.int64)
        rev = price_c * (100 - disc_pct)
        part = pa.Table.from_pydict({
            "l_orderkey": t.column("l_orderkey"),
            "rev": pa.array(rev, pa.int64())})
        return part.group_by(["l_orderkey"]).aggregate(
            [("rev", "sum")]).rename_columns(["l_orderkey", "rev"]) \
            .cast(out_schema)

    rev = li.map_batches(_rev_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    joined = hash_join(
        rev, building_orders, left_on="l_orderkey", right_on="o_orderkey",
        left_cols=["rev"],
        right_cols=["o_orderdate", "o_orderpriority"], how="inner",
        field_types={"rev": pa.int64()})
    return joined.groupby(["__key", "o_orderdate", "o_orderpriority"]) \
        .sum("rev") \
        .rename_columns({"__key": "l_orderkey", "sum(rev)": "revenue_e4"}) \
        .sort(["revenue_e4", "l_orderkey"], descending=[True, False]) \
        .limit(k) \
        .select_columns(["l_orderkey", "revenue_e4", "o_orderdate",
                         "o_orderpriority"])


Q3_SQL = f"""
SELECT l.l_orderkey,
       sum(round(l.l_extendedprice * 100)::BIGINT
           * (100 - round(l.l_discount * 100)::BIGINT))::BIGINT
         AS revenue_e4,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l.l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY 1, 3, 4
ORDER BY revenue_e4 DESC, l_orderkey LIMIT 10
"""

ORACLES["join_q3_topk"] = Q3_SQL


# -- partitioned interval join (shuffle path, both sides large) ---------------
#
# The non-equi join class where NEITHER side broadcasts: events join the
# intervals that contain them, per user. band_join_rollup above handles the
# small-side case (band table broadcast once); here the interval table is
# corpus-sized (one interval row per user-week at 100 TB), so both sides
# hash-partition instead: intervals REPLICATE into each fixed-size time
# chunk they overlap (replication factor = interval_len / chunk + 1,
# bounded because real curation intervals are bounded), events route to
# exactly one (user, chunk), and each co-group resolves containment with
# two searchsorted calls per interval run over a per-chunk prefix-sum —
# no pair rows ever materialize. Zero-match intervals survive (their
# replicas emit 0-count partials), mirroring the LEFT JOIN oracle.

INTERVAL_CHUNK_US = 86_400 * 1_000_000           # 1 day
_IV_T0_US = 1_704_067_200 * 1_000_000            # 2024-01-01 00:00:00 UTC
IV_PER_USER = 4
IV_LEN_DAYS = 3


def planted_user_intervals(events: ray.data.Dataset) -> ray.data.Dataset:
    """(interval_id, user_id, lo, hi): 4 deterministic 3-day windows per
    distinct user, offsets from user_id arithmetic — SQL-reconstructible
    (INTERVAL_JOIN_SQL builds the same table from DISTINCT user_id)."""

    def _mk(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        uu = np.repeat(u, IV_PER_USER)
        j = np.tile(np.arange(IV_PER_USER, dtype=np.int64), len(u))
        lo = (_IV_T0_US + ((j * 7 + uu % 3) * 86_400
                           + (uu % 24) * 3_600) * 1_000_000)
        return pa.Table.from_pydict({
            "interval_id": pa.array(uu * IV_PER_USER + j, pa.int64()),
            "user_id": pa.array(uu, pa.int64()),
            "lo": pa.array(lo, pa.int64()),
            "hi": pa.array(lo + IV_LEN_DAYS * 86_400 * 1_000_000,
                           pa.int64()),
        })

    users = events.select_columns(["user_id"]) \
        .groupby("user_id").count().drop_columns(["count()"])
    return users.map_batches(_mk, batch_format="pyarrow",
                             zero_copy_batch=True)


_IVJ_SCHEMA = pa.schema([
    ("hb", pa.int32()), ("side", pa.int8()),
    ("user_id", pa.int64()), ("chunk", pa.int64()),
    ("interval_id", pa.int64()), ("lo", pa.int64()), ("hi", pa.int64()),
    ("ts", pa.int64()), ("cents", pa.int64())])

_IVJ_PART_SCHEMA = pa.schema([
    ("interval_id", pa.int64()), ("user_id", pa.int64()),
    ("n", pa.int64()), ("cents", pa.int64())])

_CHUNK_SHIFT = np.int64(1) << np.int64(20)   # composite (user, chunk) key


def _ivj_widen(t: dict[str, np.ndarray], n_buckets: int) -> pa.Table:
    key = pa.chunked_array([pa.array(
        t["user_id"] * _CHUNK_SHIFT + t["chunk"], pa.int64())])
    cols = {"hb": _key_bucket(key, n_buckets)}
    for f in _IVJ_SCHEMA:
        if f.name == "hb":
            continue
        cols[f.name] = pa.array(t.get(f.name), f.type, from_pandas=True) \
            if f.name in t else pa.nulls(len(key), f.type)
    return pa.Table.from_pydict(cols, schema=_IVJ_SCHEMA)


def interval_join_rollup(intervals: ray.data.Dataset,
                         events: ray.data.Dataset,
                         *, chunk_us: int = INTERVAL_CHUNK_US,
                         n_buckets: int = N_JOIN_BUCKETS
                         ) -> ray.data.Dataset:
    """(interval_id, user_id, n_events, sum_cents): events contained in
    [lo, hi) per same-user interval; both sides Dataset-sized."""

    def _iv_replicas(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        iv = batch.column("interval_id").to_numpy(zero_copy_only=False)
        lo = batch.column("lo").to_numpy(zero_copy_only=False)
        hi = batch.column("hi").to_numpy(zero_copy_only=False)
        c0 = lo // chunk_us
        nrep = np.maximum((hi - 1) // chunk_us - c0 + 1, 1).astype(np.int64)
        idx = np.repeat(np.arange(len(u)), nrep)
        pos = np.arange(len(idx)) - np.repeat(
            np.cumsum(nrep) - nrep, nrep)
        return _ivj_widen({
            "side": np.zeros(len(idx), np.int8),
            "user_id": u[idx], "chunk": c0[idx] + pos,
            "interval_id": iv[idx], "lo": lo[idx], "hi": hi[idx],
        }, n_buckets)

    def _ev_rows(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(batch.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        return _ivj_widen({
            "side": np.ones(len(u), np.int8),
            "user_id": u, "chunk": ts // chunk_us,
            "ts": ts, "cents": np.round(v * 100).astype(np.int64),
        }, n_buckets)

    def _resolve(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _IVJ_PART_SCHEMA.empty_table()
        side = group.column("side").to_numpy(zero_copy_only=False)
        u = group.column("user_id").to_numpy(zero_copy_only=False)
        ck = group.column("chunk").to_numpy(zero_copy_only=False)
        key = u * _CHUNK_SHIFT + ck
        ev = side == 1
        ekey = key[ev]
        ets = group.column("ts").to_numpy(zero_copy_only=False)[ev]
        ecents = group.column("cents").to_numpy(zero_copy_only=False)[ev]
        eorder = np.lexsort((ets, ekey))
        ekey_s, ets_s = ekey[eorder], ets[eorder]
        ecum = np.r_[0, np.cumsum(ecents[eorder])]
        iv = ~ev
        if not iv.any():
            return _IVJ_PART_SCHEMA.empty_table()
        ikey = key[iv]
        ilo = group.column("lo").to_numpy(zero_copy_only=False)[iv]
        ihi = group.column("hi").to_numpy(zero_copy_only=False)[iv]
        n = np.zeros(len(ikey), dtype=np.int64)
        cents = np.zeros(len(ikey), dtype=np.int64)
        if len(ekey_s):
            # run-offset monotonic key (cf. _window_pairs_bucket): shift
            # each (user, chunk) run's sorted times into a disjoint band
            # so ONE globally sorted array answers every range query
            run_change = np.r_[True, ekey_s[1:] != ekey_s[:-1]]
            rstarts = np.flatnonzero(run_change)
            tmin = int(ets_s.min())
            span = int(ets_s.max()) - tmin
            off = span + 2
            if (len(rstarts) + 1) * off >= 2 ** 62:
                raise ValueError(
                    "interval join: run-offset key would overflow "
                    "int64; raise n_buckets")
            run = np.cumsum(run_change) - 1
            t_adj = (ets_s - tmin) + run * off
            # replicas whose (user, chunk) run exists
            run_lo = np.searchsorted(ekey_s, ikey, side="left")
            run_hi = np.searchsorted(ekey_s, ikey, side="right")
            ok = run_hi > run_lo
            r = np.searchsorted(rstarts, run_lo[ok], side="right") - 1
            qlo = np.clip(ilo[ok] - tmin, 0, span + 1) + r * off
            qhi = np.clip(ihi[ok] - tmin, 0, span + 1) + r * off
            lo_idx = np.searchsorted(t_adj, qlo, side="left")
            hi_idx = np.searchsorted(t_adj, qhi, side="left")
            n[ok] = hi_idx - lo_idx
            cents[ok] = ecum[hi_idx] - ecum[lo_idx]
        return pa.Table.from_pydict({
            "interval_id": pa.array(
                group.column("interval_id").to_numpy(
                    zero_copy_only=False)[iv], pa.int64()),
            "user_id": pa.array(u[iv], pa.int64()),
            "n": pa.array(n, pa.int64()),
            "cents": pa.array(cents, pa.int64()),
        }, schema=_IVJ_PART_SCHEMA)

    from ray.data.aggregate import Sum
    both = intervals.map_batches(
        _iv_replicas, batch_format="pyarrow", zero_copy_batch=True).union(
        events.select_columns(["user_id", "ts", "value"]).map_batches(
            _ev_rows, batch_format="pyarrow", zero_copy_batch=True))
    return both.groupby("hb").map_groups(
        _resolve, batch_format="pyarrow") \
        .groupby(["interval_id", "user_id"]) \
        .aggregate(Sum("n"), Sum("cents")) \
        .rename_columns({"sum(n)": "n_events", "sum(cents)": "sum_cents"})


def events_interval_join(sf_dir: str) -> ray.data.Dataset:
    import os

    from nerfray.sources.parquet import read_parquet_clean
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts", "value"])
    return interval_join_rollup(planted_user_intervals(ev), ev)


INTERVAL_JOIN_SQL = f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
iv AS (
  SELECT user_id, (user_id * {IV_PER_USER} + j)::BIGINT AS interval_id,
         ({_IV_T0_US}::BIGINT
          + ((j * 7 + user_id % 3) * 86400
             + (user_id % 24) * 3600)::BIGINT * 1000000)::BIGINT AS lo
  FROM u CROSS JOIN (SELECT unnest(generate_series(0, {IV_PER_USER - 1}))
                     AS j) js),
j AS (
  SELECT iv.interval_id, iv.user_id,
         count(e.ts)::BIGINT AS n_events,
         coalesce(sum(round(e.value * 100)), 0)::BIGINT AS sum_cents
  FROM iv LEFT JOIN events e
    ON e.user_id = iv.user_id
   AND epoch_us(e.ts) >= iv.lo
   AND epoch_us(e.ts) < iv.lo + {IV_LEN_DAYS}::BIGINT * 86400 * 1000000
  GROUP BY iv.interval_id, iv.user_id)
SELECT interval_id, user_id, n_events, sum_cents
FROM j ORDER BY interval_id
"""

ORACLES["events_interval_join"] = INTERVAL_JOIN_SQL


# -- TPC-H Q5-shaped: revenue by nation (local-supplier constraint) -----------
#
# The 6-table join-graph classic. Shape decisions by side size:
# region/nation (<=25 rows) and supplier (TPC-H scales it 100x smaller
# than lineitem) are BROADCAST — region/nation fold to a nationkey set on
# the driver, supplier to a sorted (suppkey -> nationkey) array resolved
# per batch via searchsorted; customer/orders/lineitem are Dataset-sized
# and flow through the two big-big hash joins. The c_nationkey ==
# s_nationkey cross-filter (the "local supplier" constraint) applies
# AFTER the orderkey join, exactly as in the SQL plan. Revenue rides in
# integer 1e-4-dollar units (the Q3 idiom) so the rollup is hash-exact.

Q5_REGION = "ASIA"
Q5_DATE_LO = "1996-01-01"
Q5_DATE_HI = "1997-01-01"


def q5_revenue_by_nation(sf_dir: str) -> ray.data.Dataset:
    import os

    import ray as _ray

    from nerfray.sources.parquet import read_parquet_clean, \
        read_small_table

    lo = np.datetime64(Q5_DATE_LO, "us")
    hi = np.datetime64(Q5_DATE_HI, "us")

    region = read_small_table(os.path.join(sf_dir, "region.parquet"))
    nation = read_small_table(os.path.join(sf_dir, "nation.parquet"))
    rkeys = {r["r_regionkey"] for r in region.to_pylist()
             if r["r_name"] == Q5_REGION}
    nat_name = {r["n_nationkey"]: r["n_name"] for r in nation.to_pylist()
                if r["n_regionkey"] in rkeys}
    asia_keys = np.array(sorted(nat_name), dtype=np.int64)

    sup = read_small_table(os.path.join(sf_dir, "supplier.parquet"),
                           columns=["s_suppkey", "s_nationkey"]) \
        .to_pylist()
    sup.sort(key=lambda r: r["s_suppkey"])
    sk = np.array([r["s_suppkey"] for r in sup], dtype=np.int64)
    snat = np.array([r["s_nationkey"] for r in sup], dtype=np.int64)
    sup_ref = _ray.put((sk, snat))

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"])

    def _asia_cust(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
        keep = np.isin(nk, asia_keys)
        return batch.filter(pa.array(keep))

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def _odate(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate")
        return batch.filter(pc.and_(
            pc.greater_equal(d, pa.scalar(lo)),
            pc.less(d, pa.scalar(hi)))).select(
            ["o_orderkey", "o_custkey"])

    orders_cust = hash_join(
        orders.map_batches(_odate, batch_format="pyarrow"),
        cust.map_batches(_asia_cust, batch_format="pyarrow"),
        left_on="o_custkey", right_on="c_custkey",
        left_cols=["o_orderkey"], right_cols=["c_nationkey"],
        how="inner").select_columns(["o_orderkey", "c_nationkey"])

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])

    def _li_partial(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([("l_orderkey", pa.int64()),
                                ("s_nat", pa.int64()),
                                ("rev", pa.int64())])
        skeys, snats = _ray.get(sup_ref)
        lsk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(skeys, lsk)
        pos = np.clip(pos, 0, len(skeys) - 1)
        ok = skeys[pos] == lsk
        nat = snats[pos]
        keep = ok & np.isin(nat, asia_keys)
        if not keep.any():
            return out_schema.empty_table()
        t = batch.filter(pa.array(keep))
        price_c = np.round(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100).astype(np.int64)
        disc_pct = np.round(
            t.column("l_discount").to_numpy(zero_copy_only=False)
            * 100).astype(np.int64)
        part = pa.Table.from_pydict({
            "l_orderkey": t.column("l_orderkey"),
            "s_nat": pa.array(nat[keep], pa.int64()),
            "rev": pa.array(price_c * (100 - disc_pct), pa.int64())})
        return part.group_by(["l_orderkey", "s_nat"]).aggregate(
            [("rev", "sum")]).rename_columns(
            ["l_orderkey", "s_nat", "rev"]).cast(out_schema)

    li_parts = li.map_batches(_li_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    joined = hash_join(
        li_parts, orders_cust, left_on="l_orderkey",
        right_on="o_orderkey", left_cols=["s_nat", "rev"],
        right_cols=["c_nationkey"], how="inner",
        field_types={"s_nat": pa.int64(), "rev": pa.int64()})

    def _local(batch: pa.Table) -> pa.Table:
        # local-supplier filter + map-side combine to nation grain:
        # <= |asia nations| rows per block reach the final groupby
        keep = pc.equal(batch.column("s_nat"),
                        batch.column("c_nationkey"))
        t = batch.filter(keep).select(["s_nat", "rev"])
        return t.group_by(["s_nat"]).aggregate(
            [("rev", "sum")]).rename_columns(["s_nat", "rev"])

    def _named(batch: pa.Table) -> pa.Table:
        nats = batch.column("s_nat").to_pylist()
        return pa.Table.from_pydict({
            "n_name": pa.array([nat_name[n] for n in nats], pa.string()),
            "revenue_e4": batch.column("revenue_e4"),
        })

    return joined.map_batches(_local, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("s_nat").sum("rev") \
        .rename_columns({"sum(rev)": "revenue_e4"}) \
        .map_batches(_named, batch_format="pyarrow") \
        .sort("revenue_e4", descending=True)


Q5_SQL = f"""
SELECT n.n_name,
       sum(round(l.l_extendedprice * 100)::BIGINT
           * (100 - round(l.l_discount * 100)::BIGINT))::BIGINT
         AS revenue_e4
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{Q5_REGION}'
  AND c.c_nationkey = s.s_nationkey
  AND o.o_orderdate >= TIMESTAMP '{Q5_DATE_LO}'
  AND o.o_orderdate < TIMESTAMP '{Q5_DATE_HI}'
GROUP BY 1 ORDER BY revenue_e4 DESC
"""

ORACLES["join_q5_nation_revenue"] = Q5_SQL


# ---------------------------------------------------------------------------
# Bloom semi-join reduction (shuffle-volume pre-filter)
# ---------------------------------------------------------------------------
#
# The classic big-big join optimization when the build side is
# SELECTIVE: build a Bloom filter over the build side's join keys
# (bounded: m/64 uint64 words regardless of row count), broadcast it,
# and drop fact rows that cannot match BEFORE the join's exchange.
# No false negatives => inner / left-semi output is IDENTICAL to the
# unfiltered hash_join; false positives just ride the join and lose
# there.  Positions use a splitmix64-style vectorized mixer (no SQL
# mirror needed — the filter is semantics-invisible, so the oracle is
# the plain join).

BLOOM_JOIN_M = 1 << 16        # 8 KiB filter
BLOOM_JOIN_K = 4


def _mix64(x: np.ndarray, round_: int) -> np.ndarray:
    """splitmix64 finalizer over uint64 keys, one stream per round."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15) * np.uint64(round_ + 1)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _key_positions(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n, k) bit positions for int64 keys."""
    u = keys.astype(np.int64).view(np.uint64)
    return np.stack([_mix64(u, j) % np.uint64(m) for j in range(k)],
                    axis=1)


def build_key_bloom(ds: ray.data.Dataset, on: str, *,
                    m: int = BLOOM_JOIN_M,
                    k: int = BLOOM_JOIN_K) -> np.ndarray:
    """Dense m/64-word uint64 Bloom filter over ``ds[on]`` int keys.
    Each block ORs its keys into a local 8 KiB array and emits only
    nonzero (word_idx, bits) rows; a word-grain groupby ORs partials;
    the driver take_all is bounded by m/64 rows — aggregate-to-small,
    independent of ds size."""

    def _partial(batch: pa.Table) -> pa.Table:
        keys = np.unique(batch.column(on).to_numpy(zero_copy_only=False))
        local = np.zeros(m // 64, np.uint64)
        if len(keys):
            p = _key_positions(keys, m, k)
            np.bitwise_or.at(local, (p >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (p & np.uint64(63)))
        nz = np.flatnonzero(local)
        return pa.Table.from_pydict({
            "word_idx": pa.array(nz.astype(np.int64), pa.int64()),
            "bits": pa.array(local[nz].view(np.int64), pa.int64())})

    def _or_rows(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.schema([("word_idx", pa.int64()),
                              ("bits", pa.int64())]).empty_table()
        w = group.column("word_idx").to_numpy(zero_copy_only=False)
        b = group.column("bits").to_numpy(zero_copy_only=False) \
            .view(np.uint64)
        order = np.argsort(w, kind="stable")
        w_s, b_s = w[order], b[order]
        starts = np.flatnonzero(np.r_[True, w_s[1:] != w_s[:-1]])
        return pa.Table.from_pydict({
            "word_idx": pa.array(w_s[starts], pa.int64()),
            "bits": pa.array(
                np.bitwise_or.reduceat(b_s, starts).view(np.int64),
                pa.int64())})

    dense = np.zeros(m // 64, np.uint64)
    rows = ds.select_columns([on]) \
        .map_batches(_partial, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("word_idx").map_groups(_or_rows, batch_format="pyarrow") \
        .take_all()  # <= m/64 rows by construction
    for r in rows:
        dense[r["word_idx"]] = np.uint64(np.int64(r["bits"]))
    return dense


def bloom_filtered_join(left: ray.data.Dataset, right: ray.data.Dataset,
                        *, left_on: str, right_on: str,
                        left_cols: list[str], right_cols: list[str],
                        how: str = "inner",
                        m: int = BLOOM_JOIN_M,
                        k: int = BLOOM_JOIN_K) -> ray.data.Dataset:
    """hash_join with a Bloom pre-filter on the LEFT (fact) side built
    from the RIGHT (build) side's keys.  Output is identical to
    hash_join for duplicate-preserving-left join types; the exchange
    carries only fact rows that might match."""
    if how not in ("inner", "left semi"):
        raise ValueError("bloom pre-filter only preserves semantics "
                         "for inner / left semi joins")
    import ray

    filt_ref = ray.put(build_key_bloom(right, right_on, m=m, k=k))

    class _Prefilter:
        def __init__(self):
            self._filt = ray.get(filt_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column(left_on).to_numpy(zero_copy_only=False)
            if not len(keys):
                return batch
            p = _key_positions(keys, m, k)
            w = (p >> np.uint64(6)).astype(np.int64)
            b = p & np.uint64(63)
            hit = (((self._filt[w] >> b) & np.uint64(1)) != 0).all(axis=1)
            return batch.filter(pa.array(hit))

    filtered = left.map_batches(_Prefilter, concurrency=(1, 8),
                                batch_format="pyarrow",
                                zero_copy_batch=True)
    return hash_join(filtered, right, left_on=left_on, right_on=right_on,
                     left_cols=left_cols, right_cols=right_cols, how=how)


def urgent_lineitem_rollup(sf_dir: str) -> ray.data.Dataset:
    """lineitem ⋈ (orders WHERE priority = 1-URGENT) via the Bloom
    pre-filter: ~80% of lineitem rows never enter the join exchange
    (the build side keeps ~1/5 of orders). Exact integer rollup per
    (priority, linestatus)."""
    import pyarrow.compute as pc

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderpriority"]) \
        .filter(expr="o_orderpriority == '1-URGENT'")
    items = _read(sf_dir, "lineitem",
                  ["l_orderkey", "l_quantity", "l_linestatus"])
    joined = bloom_filtered_join(
        items, orders, left_on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_quantity", "l_linestatus"],
        right_cols=["o_orderpriority"])

    def _pre(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "o_orderpriority": batch.column("o_orderpriority"),
            "l_linestatus": batch.column("l_linestatus"),
            "qty": pc.cast(pc.round(batch.column("l_quantity")),
                           pa.int64()),
        })

    return joined.map_batches(_pre, batch_format="pyarrow") \
        .groupby(["o_orderpriority", "l_linestatus"]).aggregate(
            ray.data.aggregate.Count(alias_name="n_items"),
            ray.data.aggregate.Sum("qty", alias_name="sum_qty"))


BLOOM_JOIN_SQL = """
SELECT o.o_orderpriority, l.l_linestatus,
       count(*)::BIGINT AS n_items,
       sum(round(l.l_quantity))::BIGINT AS sum_qty
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLES["join_bloom_prefiltered"] = BLOOM_JOIN_SQL


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: HAVING-filtered big aggregation -> join back -> top-k
# ---------------------------------------------------------------------------
#
# The "large-volume customer" query class: aggregate the FACT table to
# its key grain, keep only groups passing a HAVING threshold (a tiny
# surviving set), then join that small set back through two dimension
# hops and rank.  Scale shape: the lineitem aggregation is map-side
# combined per block before the one key-grain groupby; the HAVING
# filter shrinks the stream to the survivors BEFORE any join, so both
# hash joins carry only qualified orders; the final sort ranks a
# survivor-sized set, never the fact table.

Q18_MIN_QTY = 250  # HAVING sum(l_quantity) > 250 (top ~1% of orders)


def _rename_batches(ds: ray.data.Dataset,
                    mapping: dict[str, str]) -> ray.data.Dataset:
    """Batch-level column rename. Dataset.rename_columns is UNSAFE as
    a hash_join input: the join inspects ``schema()``, which samples
    ONE bundle, and Ray can surface a bundle that predates the rename
    (observed as intermittent 'Column ... does not exist in schema'
    KeyErrors — the mixed-schema RefBundle warning). Renaming inside
    map_batches applies to every batch deterministically."""

    def _r(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [mapping.get(c, c) for c in batch.column_names])

    return ds.map_batches(_r, batch_format="pyarrow",
                          zero_copy_batch=True)


def q18_large_orders(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    import os

    import numpy as np

    from nerfray.sources.parquet import read_parquet_clean

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"])

    # order-grain sum as the repo's standard 64-way key-hash co-group
    # (block-local combine, then one bucket exchange): measured ~6x
    # faster than Dataset.groupby(key).sum at sf0.1 — the native
    # sort-groupby sorts the full key domain while the bucket exchange
    # ships pre-combined partials at O(buckets) dispatch grain
    _BIG_SCHEMA = pa.schema([("l_orderkey", pa.int64()),
                             ("qty", pa.int64()), ("hb", pa.int32())])

    def _qty_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _BIG_SCHEMA.empty_table()
        q = np.round(batch.column("l_quantity")
                     .to_numpy(zero_copy_only=False)).astype(np.int64)
        part = pa.Table.from_pydict({
            "l_orderkey": batch.column("l_orderkey"),
            "qty": pa.array(q, pa.int64())})
        part = part.group_by(["l_orderkey"]).aggregate(
            [("qty", "sum")]).rename_columns(["l_orderkey", "qty"])
        hb = pa.array((part.column("l_orderkey")
                       .to_numpy(zero_copy_only=False) & 63)
                      .astype(np.int32), pa.int32())
        return part.append_column("hb", hb).cast(_BIG_SCHEMA)

    def _qty_sum_bucket(group: pa.Table) -> pa.Table:
        out_schema = pa.schema([("l_orderkey", pa.int64()),
                                ("qty", pa.int64())])
        if group.num_rows == 0:
            return out_schema.empty_table()
        return group.select(["l_orderkey", "qty"]) \
            .group_by(["l_orderkey"]).aggregate([("qty", "sum")]) \
            .rename_columns(["l_orderkey", "qty"]).cast(out_schema)

    # survivor set is materialized once: adaptive_join's count() probe
    # and the broadcast fetch must not re-run the aggregation
    big = li.map_batches(_qty_partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("hb").map_groups(_qty_sum_bucket, batch_format="pyarrow") \
        .filter(expr=f"qty > {Q18_MIN_QTY}").materialize()

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice",
                 "o_orderdate"])

    def _price_c(batch: pa.Table) -> pa.Table:
        p = np.round(batch.column("o_totalprice")
                     .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        return pa.Table.from_pydict({
            "o_orderkey": batch.column("o_orderkey"),
            "o_custkey": batch.column("o_custkey"),
            "totalprice_c": pa.array(p, pa.int64()),
            "o_orderdate": batch.column("o_orderdate")})

    # both join hops go through the cost-based adaptive join: the
    # HAVING-survivor set and the customer dimension are broadcast-
    # sized at bench scale (zero exchanges; Q18 wall dropped 13 s ->
    # ~3 s at sf0.1), and past BROADCAST_THRESHOLD_ROWS each hop
    # falls back to the bucketed hash join automatically
    qualified, _ = adaptive_join(
        orders.map_batches(_price_c, batch_format="pyarrow",
                           zero_copy_batch=True),
        big, left_on="o_orderkey", right_on="l_orderkey",
        left_cols=["o_custkey", "totalprice_c", "o_orderdate"],
        right_cols=["qty"])
    qualified = _rename_batches(qualified, {"__key": "o_orderkey"})

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"])

    joined, _ = adaptive_join(
        qualified, cust, left_on="o_custkey", right_on="c_custkey",
        left_cols=["o_orderkey", "totalprice_c", "o_orderdate", "qty"],
        right_cols=["c_name"])
    return _rename_batches(joined, {"__key": "c_custkey"}) \
        .sort(["totalprice_c", "o_orderkey"], descending=[True, False]) \
        .limit(k) \
        .select_columns(["c_name", "c_custkey", "o_orderkey",
                         "o_orderdate", "totalprice_c", "qty"])


Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey, sum(round(l_quantity)::BIGINT)::BIGINT AS qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(round(l_quantity)::BIGINT) > {Q18_MIN_QTY})
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       round(o.o_totalprice * 100)::BIGINT AS totalprice_c, big.qty
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY totalprice_c DESC, o.o_orderkey LIMIT 20
"""

ORACLES["join_q18_topk"] = Q18_SQL


# ---------------------------------------------------------------------------
# adaptive join: cost-based broadcast-vs-shuffle strategy pick
# ---------------------------------------------------------------------------
#
# The AQE move every engine makes: if one join side is small, shipping
# it whole to every task (a map-only lookup, zero shuffle) beats the
# all-to-all hash join; if it is not, broadcasting would OOM the
# workers and the bucketed exchange is correct.  The picker measures
# the right side (for a parquet-backed Dataset, count() is footer
# metadata, not a scan), broadcasts under the threshold via ray.put
# (one object-store copy, resolved per task), and otherwise falls back
# to hash_join — both paths emit the identical (__key, left_cols,
# right_cols) schema, so the strategy is invisible to the query.

BROADCAST_THRESHOLD_ROWS = 100_000  # ~10 MB of narrow rows


def adaptive_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
                  left_on: str, right_on: str,
                  left_cols: list[str], right_cols: list[str],
                  threshold: int = BROADCAST_THRESHOLD_ROWS,
                  field_types: dict | None = None
                  ) -> tuple[ray.data.Dataset, str]:
    """Inner join; returns (result, strategy) where strategy is
    'broadcast' or 'shuffle' — tests pin the pick, queries ignore it."""
    import ray as _ray

    n_right = right.count()
    if n_right > threshold:
        return hash_join(left, right, left_on=left_on,
                         right_on=right_on, left_cols=left_cols,
                         right_cols=right_cols, how="inner",
                         field_types=field_types), "shuffle"

    # drop zero-row blocks before concat: Ray's sort-based stages emit
    # schema-LESS empty blocks (the RefBundle warning), which would make
    # concat_tables fail on schema mismatch
    blocks = [t for t in _ray.get(
        right.select_columns([right_on] + right_cols).to_arrow_refs())
        if t.num_rows > 0]
    if blocks:
        small_tbl = pa.concat_tables(blocks).combine_chunks()
    else:
        sch = right.schema()
        base = sch.base_schema if hasattr(sch, "base_schema") else sch
        small_tbl = pa.schema(
            [base.field(c) for c in [right_on] + right_cols]).empty_table()
    small_ref = _ray.put(small_tbl)

    def _lookup(batch: pa.Table) -> pa.Table:
        sm = _ray.get(small_ref)
        lhs = batch.select([left_on] + left_cols) \
            .rename_columns(["__key"] + left_cols)
        rhs = sm.rename_columns(["__key"] + right_cols)
        return lhs.join(rhs, keys="__key", join_type="inner")

    res = left.map_batches(_lookup, batch_format="pyarrow",
                           zero_copy_batch=True)
    return res, "broadcast"


def adaptive_orders_by_nation(sf_dir: str) -> ray.data.Dataset:
    """orders x customer rollup through the adaptive join (customer is
    dimension-sized at every sf -> the broadcast path fires; the
    shuffle path is pinned equal in tests)."""
    import os

    import numpy as np

    from nerfray.sources.parquet import read_parquet_clean
    from ray.data.aggregate import Count, Sum

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"])

    def _cents(batch: pa.Table) -> pa.Table:
        p = np.round(batch.column("o_totalprice")
                     .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        return pa.Table.from_pydict({
            "o_custkey": batch.column("o_custkey"),
            "price_c": pa.array(p, pa.int64())})

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"])
    joined, _strategy = adaptive_join(
        orders.map_batches(_cents, batch_format="pyarrow",
                           zero_copy_batch=True),
        cust, left_on="o_custkey", right_on="c_custkey",
        left_cols=["price_c"], right_cols=["c_nationkey"])
    return joined.groupby("c_nationkey") \
        .aggregate(Count(), Sum("price_c")) \
        .rename_columns({"count()": "n_orders",
                         "sum(price_c)": "sum_cents"})


ADAPTIVE_SQL = """
SELECT c.c_nationkey, count(*)::BIGINT AS n_orders,
       sum(round(o.o_totalprice * 100)::BIGINT)::BIGINT AS sum_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_nationkey ORDER BY c.c_nationkey
"""

ORACLES["join_adaptive_rollup"] = ADAPTIVE_SQL


# ---------------------------------------------------------------------------
# TPC-H Q14: promotion-revenue share per ship month (lineitem x part)
# ---------------------------------------------------------------------------
#
# Fact side is pre-shrunk to (l_partkey, month, revenue-units) before
# the join; part rides the adaptive broadcast-vs-shuffle pick (at this
# sf the measured footer count fires the broadcast path; at 100 TB part
# outgrows the threshold and the same call degrades gracefully to the
# 64-way bucket hash join).  Revenue uses integer cent x percent units
# round(price*100) * (100 - round(discount*100)) so the per-month sums
# are order-independent and hash-exact; the promo/total split is a
# vectorized conditional sum, never a second scan.


def q14_promo_share(sf_dir: str) -> ray.data.Dataset:
    import os

    import numpy as np

    from nerfray.sources.parquet import read_parquet_clean
    from ray.data.aggregate import Sum

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])

    def _prep(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        month = sd.astype("datetime64[M]").astype(str)
        price = np.round(batch.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        disc = np.round(batch.column("l_discount")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        return pa.Table.from_pydict({
            "l_partkey": batch.column("l_partkey"),
            "month": pa.array(month, pa.string()),
            "rev": pa.array(price * (100 - disc), pa.int64()),
        })

    part = read_parquet_clean(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_type"])
    joined, _strategy = adaptive_join(
        li.map_batches(_prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        part, left_on="l_partkey", right_on="p_partkey",
        left_cols=["month", "rev"], right_cols=["p_type"])

    def _split(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        rev = batch.column("rev").to_numpy(zero_copy_only=False)
        promo = pc.equal(batch.column("p_type"),
                         pa.scalar("PROMO")).to_numpy(
            zero_copy_only=False)
        return pa.Table.from_pydict({
            "month": batch.column("month"),
            "promo_units": pa.array(np.where(promo, rev, 0), pa.int64()),
            "total_units": pa.array(rev, pa.int64()),
        })

    return joined.map_batches(_split, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("month") \
        .aggregate(Sum("promo_units", alias_name="promo_units"),
                   Sum("total_units", alias_name="total_units"))


Q14_SQL = """
SELECT strftime(l_shipdate, '%Y-%m') AS month,
       sum(CASE WHEN p_type = 'PROMO'
                THEN round(l_extendedprice * 100)::BIGINT
                     * (100 - round(l_discount * 100)::BIGINT)
                ELSE 0 END)::BIGINT AS promo_units,
       sum(round(l_extendedprice * 100)::BIGINT
           * (100 - round(l_discount * 100)::BIGINT))::BIGINT
         AS total_units
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1 ORDER BY 1
"""

ORACLES["join_q14_promo"] = Q14_SQL


# ---------------------------------------------------------------------------
# TPC-H Q10: returned-item revenue — top-20 customers by lost revenue
# ---------------------------------------------------------------------------
#
# Three-hop shape: the returned lineitems are filtered AT THE READ and
# pre-combined to order grain (the repo's 64-way key-hash co-group, so
# the first join ships order-grain partials, never raw lineitems); the
# windowed orders ride the adaptive broadcast-vs-shuffle pick; and the
# customer / nation dimension hops broadcast when small and degrade to
# the bucketed hash join past the threshold.  Only the final top-k
# sort+limit touches the driver, and it moves k rows.

Q10_DATE_LO = "1996-01-01"
Q10_DATE_HI = "1997-01-01"


def q10_returned_revenue(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    import os

    import numpy as np
    import pyarrow.dataset as pads

    from nerfray.sources.parquet import (read_parquet_clean,
                                         read_small_table)

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"],
        filter=pads.field("l_returnflag") == "R")

    _REV_SCHEMA = pa.schema([("l_orderkey", pa.int64()),
                             ("rev", pa.int64()), ("hb", pa.int32())])

    def _rev_partial(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("l_returnflag"), pa.scalar("R"))
        batch = batch.filter(mask)
        if batch.num_rows == 0:
            return _REV_SCHEMA.empty_table()
        price = np.round(batch.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        disc = np.round(batch.column("l_discount")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        part = pa.Table.from_pydict({
            "l_orderkey": batch.column("l_orderkey"),
            "rev": pa.array(price * (100 - disc), pa.int64())})
        part = part.group_by(["l_orderkey"]).aggregate(
            [("rev", "sum")]).rename_columns(["l_orderkey", "rev"])
        hb = pa.array((part.column("l_orderkey")
                       .to_numpy(zero_copy_only=False) & 63)
                      .astype(np.int32), pa.int32())
        return part.append_column("hb", hb).cast(_REV_SCHEMA)

    def _rev_bucket(group: pa.Table) -> pa.Table:
        out_schema = pa.schema([("l_orderkey", pa.int64()),
                                ("rev", pa.int64())])
        if group.num_rows == 0:
            return out_schema.empty_table()
        return group.select(["l_orderkey", "rev"]) \
            .group_by(["l_orderkey"]).aggregate([("rev", "sum")]) \
            .rename_columns(["l_orderkey", "rev"]).cast(out_schema)

    order_rev = li.map_batches(_rev_partial, batch_format="pyarrow",
                               zero_copy_batch=True) \
        .groupby("hb").map_groups(_rev_bucket, batch_format="pyarrow") \
        .materialize()

    lo = np.datetime64(Q10_DATE_LO, "us")
    hi = np.datetime64(Q10_DATE_HI, "us")
    f = pads.field("o_orderdate")
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(f >= pa.scalar(lo)) & (f < pa.scalar(hi)))

    def _win(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        keep = (od >= lo) & (od < hi)
        return pa.Table.from_pydict({
            "o_orderkey": batch.column("o_orderkey").filter(
                pa.array(keep)),
            "o_custkey": batch.column("o_custkey").filter(
                pa.array(keep))})

    joined, _ = adaptive_join(
        order_rev, orders.map_batches(_win, batch_format="pyarrow",
                                      zero_copy_batch=True),
        left_on="l_orderkey", right_on="o_orderkey",
        left_cols=["rev"], right_cols=["o_custkey"])

    from ray.data.aggregate import Sum
    cust_rev = joined.groupby("o_custkey") \
        .aggregate(Sum("rev", alias_name="revenue_units"))

    cust = read_small_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"])
    nation = read_small_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"])
    n_name = dict(zip(nation.column("n_nationkey").to_pylist(),
                      nation.column("n_name").to_pylist()))
    ckey = cust.column("c_custkey").to_numpy()
    order_ = np.argsort(ckey)
    cname = np.asarray(cust.column("c_name").to_pylist(),
                       dtype=object)[order_]
    cnat = cust.column("c_nationkey").to_numpy()[order_]
    cbal = np.round(cust.column("c_acctbal").to_numpy() * 100) \
        .astype(np.int64)[order_]
    ckey_s = ckey[order_]
    cust_ref = ray.put((ckey_s, cname, cnat, cbal))

    def _dim(batch: pa.Table) -> pa.Table:
        keys, names, nats, bals = ray.get(cust_ref)
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, ck)
        return pa.Table.from_pydict({
            "c_custkey": pa.array(ck, pa.int64()),
            "c_name": pa.array(names[pos].tolist(), pa.string()),
            "n_name": pa.array([n_name[int(v)] for v in nats[pos]],
                               pa.string()),
            "acctbal_c": pa.array(bals[pos], pa.int64()),
            "revenue_units": batch.column("revenue_units"),
        })

    return cust_rev.map_batches(_dim, batch_format="pyarrow",
                                zero_copy_batch=True) \
        .sort(["revenue_units", "c_custkey"], descending=[True, False]) \
        .limit(k)


Q10_SQL = f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       round(c.c_acctbal * 100)::BIGINT AS acctbal_c,
       sum(round(l.l_extendedprice * 100)::BIGINT
           * (100 - round(l.l_discount * 100)::BIGINT))::BIGINT
         AS revenue_units
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '{Q10_DATE_LO}'
  AND o.o_orderdate < TIMESTAMP '{Q10_DATE_HI}'
GROUP BY 1, 2, 3, 4
ORDER BY revenue_units DESC, c.c_custkey LIMIT 20
"""

ORACLES["join_q10_returned"] = Q10_SQL


# ---------------------------------------------------------------------------
# TPC-H Q12 (adapted): priority split per return flag for a ship year
# ---------------------------------------------------------------------------
#
# The testdata lineitem has no l_shipmode/commitdate/receiptdate, so
# the classic Q12 grouping rides l_returnflag instead: for lineitems
# shipped in the window, count critical- (1-URGENT / 2-HIGH) vs
# other-priority orders per flag.  Same plan shape as the original:
# fact side filtered at the read and pre-projected to (orderkey, flag),
# one adaptive join against orders' (orderkey, priority), then a
# conditional integer aggregate.

Q12_SHIP_LO = "1996-01-01"
Q12_SHIP_HI = "1997-01-01"


def q12_priority_split(sf_dir: str) -> ray.data.Dataset:
    import os

    import numpy as np
    import pyarrow.dataset as pads

    from nerfray.sources.parquet import read_parquet_clean
    from ray.data.aggregate import Sum

    lo = np.datetime64(Q12_SHIP_LO, "us")
    hi = np.datetime64(Q12_SHIP_HI, "us")
    f = pads.field("l_shipdate")
    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_returnflag", "l_shipdate"],
        filter=(f >= pa.scalar(lo)) & (f < pa.scalar(hi)))

    def _win(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        keep = pa.array((sd >= lo) & (sd < hi))
        return pa.Table.from_pydict({
            "l_orderkey": batch.column("l_orderkey").filter(keep),
            "l_returnflag": batch.column("l_returnflag").filter(keep)})

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"])

    joined, _ = adaptive_join(
        li.map_batches(_win, batch_format="pyarrow",
                       zero_copy_batch=True),
        orders, left_on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_returnflag"], right_cols=["o_orderpriority"])

    def _split(batch: pa.Table) -> pa.Table:
        pr = batch.column("o_orderpriority")
        high = pc.or_(pc.equal(pr, pa.scalar("1-URGENT")),
                      pc.equal(pr, pa.scalar("2-HIGH"))) \
            .to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "l_returnflag": batch.column("l_returnflag"),
            "high_count": pa.array(high.astype(np.int64), pa.int64()),
            "low_count": pa.array((~high).astype(np.int64), pa.int64()),
        })

    return joined.map_batches(_split, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("l_returnflag") \
        .aggregate(Sum("high_count", alias_name="high_count"),
                   Sum("low_count", alias_name="low_count"))


Q12_SQL = f"""
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_SHIP_LO}'
  AND l_shipdate < TIMESTAMP '{Q12_SHIP_HI}'
GROUP BY 1 ORDER BY 1
"""

ORACLES["join_q12_priority"] = Q12_SQL


# ---------------------------------------------------------------------------
# TPC-H Q22 (adapted): idle rich customers — above-average balance,
# no orders
# ---------------------------------------------------------------------------
#
# The scalar-subquery + NOT EXISTS classic.  The global average is a
# constant-size distributed reduction (two int64s reach the driver);
# the comparison stays in integers (cents * n_pos > sum_pos avoids the
# float divide); NOT EXISTS is the repo's bucketed "left anti" hash
# join against the orders fact, so no side materializes and the only
# exchange is the anti-join's key bucket co-group.  The anti side is
# URGENT orders (the synthetic generator gives every customer at
# least one order, so the literal Q22 "no orders" predicate is
# degenerate here; "no urgent orders" keeps the identical plan shape
# with a non-empty answer).


def q22_idle_rich(sf_dir: str) -> ray.data.Dataset:
    import os

    import numpy as np

    from nerfray.sources.parquet import read_parquet_clean
    from ray.data.aggregate import Sum

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def _cents(batch: pa.Table) -> pa.Table:
        bal = np.round(batch.column("c_acctbal")
                       .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        return pa.Table.from_pydict({
            "c_custkey": batch.column("c_custkey"),
            "c_nationkey": pa.array(
                batch.column("c_nationkey")
                .to_numpy(zero_copy_only=False).astype(np.int64),
                pa.int64()),
            "bal_c": pa.array(bal, pa.int64())})

    cents = cust.map_batches(_cents, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()

    def _pos_partial(batch: pa.Table) -> pa.Table:
        b = batch.column("bal_c").to_numpy(zero_copy_only=False)
        pos = b[b > 0]
        return pa.Table.from_pydict({
            "n_pos": pa.array([len(pos)], pa.int64()),
            "sum_pos": pa.array([int(pos.sum())], pa.int64())})

    g = cents.map_batches(_pos_partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .aggregate(Sum("n_pos", alias_name="n_pos"),
                   Sum("sum_pos", alias_name="sum_pos"))
    n_pos, sum_pos = int(g["n_pos"]), int(g["sum_pos"])

    def _rich(batch: pa.Table) -> pa.Table:
        # integer threshold from the global reduction: bal*N > S avoids
        # the float divide (Dataset.filter exprs don't parse arithmetic)
        b = batch.column("bal_c").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(b * n_pos > sum_pos))

    rich = cents.map_batches(_rich, batch_format="pyarrow",
                             zero_copy_batch=True)

    import pyarrow.dataset as pads
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"],
        filter=pads.field("o_orderpriority") == "1-URGENT")

    def _urgent(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.equal(batch.column("o_orderpriority"),
                     pa.scalar("1-URGENT"))).select(["o_custkey"])

    idle = hash_join(
        rich, orders.map_batches(_urgent, batch_format="pyarrow",
                                 zero_copy_batch=True),
        left_on="c_custkey", right_on="o_custkey",
        left_cols=["c_nationkey", "bal_c"], right_cols=[],
        how="left anti", field_types={"bal_c": pa.int64()})

    from ray.data.aggregate import Count
    return idle.groupby("c_nationkey").aggregate(
        Count(alias_name="n_cust"),
        Sum("bal_c", alias_name="total_bal_c"))


Q22_SQL = """
WITH cents AS (
  SELECT c_custkey, c_nationkey::BIGINT AS c_nationkey,
         round(c_acctbal * 100)::BIGINT AS bal_c FROM customer),
avgpos AS (
  SELECT count(*)::BIGINT AS n_pos, sum(bal_c)::BIGINT AS sum_pos
  FROM cents WHERE bal_c > 0)
SELECT c_nationkey, count(*)::BIGINT AS n_cust,
       sum(bal_c)::BIGINT AS total_bal_c
FROM cents, avgpos
WHERE bal_c * n_pos > sum_pos
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = cents.c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY 1 ORDER BY 1
"""

ORACLES["join_q22_idle_rich"] = Q22_SQL


# ---------------------------------------------------------------------------
# TPC-H Q19: disjunctive-predicate revenue (brand x size x qty bands)
# ---------------------------------------------------------------------------
#
# The OR-of-conjunctions classic that defeats naive pushdown.  The
# part side collapses to a broadcast (partkey -> brand-band id) array
# for ONLY the parts that can satisfy ANY branch (union of the brand/
# size conjunctions, a dimension-side prune); the fact side is pruned
# at the read by the qty envelope (the union of all qty bands), and
# the residual per-branch (brand-band, qty-band) conjunction is one
# vectorized mask — no join exchange at all, the whole query is
# map-side + a 2-int64 reduction.

Q19_BRANCHES = (("Brand#1", 1, 5, 1, 11),
                ("Brand#2", 1, 10, 10, 20),
                ("Brand#3", 1, 15, 20, 30))


def q19_disjunctive_revenue(sf_dir: str) -> pa.Table:
    import os

    import numpy as np
    import pyarrow.dataset as pads

    from nerfray.sources.parquet import (read_parquet_clean,
                                         read_small_table)
    from ray.data.aggregate import Sum

    part = read_small_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_size"])
    pk = part.column("p_partkey").to_numpy()
    brand = np.asarray(part.column("p_brand").to_pylist(), dtype=object)
    size = part.column("p_size").to_numpy()
    # branch id per partkey (-1 = no branch's brand/size conjunction)
    bid = np.full(len(pk), -1, np.int8)
    for i, (b, slo, shi, _qlo, _qhi) in enumerate(Q19_BRANCHES):
        m = (brand == b) & (size >= slo) & (size <= shi)
        bid[m] = i
    keep = bid >= 0
    keys = pk[keep]
    order = np.argsort(keys)
    lut_ref = ray.put((keys[order], bid[keep][order]))

    qlo = min(b[3] for b in Q19_BRANCHES)
    qhi = max(b[4] for b in Q19_BRANCHES)
    f = pads.field("l_quantity")
    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"],
        filter=(f >= pa.scalar(float(qlo))) & (f <= pa.scalar(float(qhi))))

    qbands = np.array([(b[3], b[4]) for b in Q19_BRANCHES], np.int64)

    def _partial(batch: pa.Table) -> pa.Table:
        ks, bids = ray.get(lut_ref)
        lpk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = np.round(batch.column("l_quantity")
                       .to_numpy(zero_copy_only=False)).astype(np.int64)
        if len(ks) == 0:
            b = np.full(len(lpk), -1, np.int64)
        else:
            pos = np.searchsorted(ks, lpk)
            pos[pos >= len(ks)] = 0
            b = np.where(ks[pos] == lpk, bids[pos], -1)
        ok = (b >= 0) & (qty >= qbands[b, 0]) & (qty <= qbands[b, 1])
        price = np.round(batch.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        disc = np.round(batch.column("l_discount")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        rev = price * (100 - disc)
        return pa.Table.from_pydict({
            "n_rows": pa.array([int(ok.sum())], pa.int64()),
            "revenue_units": pa.array([int(rev[ok].sum())], pa.int64())})

    agg = li.map_batches(_partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .aggregate(Sum("n_rows", alias_name="n_rows"),
                   Sum("revenue_units", alias_name="revenue_units"))
    return pa.Table.from_pydict({
        "n_rows": pa.array([int(agg["n_rows"])], pa.int64()),
        "revenue_units": pa.array([int(agg["revenue_units"])],
                                  pa.int64())})


def _q19_branch_sql(b, slo, shi, qlo, qhi):
    return (f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi} "
            f"AND round(l_quantity)::BIGINT BETWEEN {qlo} AND {qhi})")


Q19_SQL = f"""
SELECT count(*)::BIGINT AS n_rows,
       coalesce(sum(round(l_extendedprice * 100)::BIGINT
                    * (100 - round(l_discount * 100)::BIGINT)),
                0)::BIGINT AS revenue_units
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {" OR ".join(_q19_branch_sql(*b) for b in Q19_BRANCHES)}
"""

ORACLES["join_q19_disjunctive"] = Q19_SQL


# ---------------------------------------------------------------------------
# TPC-H Q7: shipping volume between two nations by year
# ---------------------------------------------------------------------------
#
# The two-role nation classic: the supplier side prunes the FACT rows
# before the only big-big exchange (suppkey -> nationkey broadcast;
# rows whose supplier is in neither nation never enter the join), the
# orders hop is the one real exchange, and the customer role resolves
# via a second broadcast with the cross-pair filter (supp != cust,
# both in the pair).  Revenue in integer cent x percent units; group
# key (supp_nation, cust_nation, year) has a tiny bounded domain.

Q7_NATIONS = (1, 2)


def q7_nation_volume(sf_dir: str) -> ray.data.Dataset:
    import os

    import numpy as np

    from nerfray.sources.parquet import (read_parquet_clean,
                                         read_small_table)
    from ray.data.aggregate import Sum

    n1, n2 = Q7_NATIONS
    nation = read_small_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"])
    n_name = dict(zip(nation.column("n_nationkey").to_pylist(),
                      nation.column("n_name").to_pylist()))

    supp = read_small_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"])
    sk = supp.column("s_suppkey").to_numpy()
    sn = supp.column("s_nationkey").to_numpy().astype(np.int64)
    order_ = np.argsort(sk)
    supp_ref = ray.put((sk[order_], sn[order_]))

    cust = read_small_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"])
    ck = cust.column("c_custkey").to_numpy()
    cn = cust.column("c_nationkey").to_numpy().astype(np.int64)
    order_ = np.argsort(ck)
    cust_ref = ray.put((ck[order_], cn[order_]))

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"])

    def _fact(batch: pa.Table) -> pa.Table:
        ks, ns = ray.get(supp_ref)
        lsk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ks, lsk)
        pos[pos >= len(ks)] = 0
        nat = np.where(ks[pos] == lsk, ns[pos], -1)
        keep = (nat == n1) | (nat == n2)
        batch = batch.filter(pa.array(keep))
        nat = nat[keep]
        sd = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        year = sd.astype("datetime64[Y]").astype(np.int64) + 1970
        price = np.round(batch.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        disc = np.round(batch.column("l_discount")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        return pa.Table.from_pydict({
            "l_orderkey": batch.column("l_orderkey"),
            "supp_nat": pa.array(nat, pa.int64()),
            "year": pa.array(year, pa.int64()),
            "rev": pa.array(price * (100 - disc), pa.int64())})

    fact = li.map_batches(_fact, batch_format="pyarrow",
                          zero_copy_batch=True)

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"])
    joined, _ = adaptive_join(
        fact, orders, left_on="l_orderkey", right_on="o_orderkey",
        left_cols=["supp_nat", "year", "rev"], right_cols=["o_custkey"])

    def _pair(batch: pa.Table) -> pa.Table:
        ks, ns = ray.get(cust_ref)
        ock = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ks, ock)
        pos[pos >= len(ks)] = 0
        cnat = np.where(ks[pos] == ock, ns[pos], -1)
        snat = batch.column("supp_nat").to_numpy(zero_copy_only=False)
        keep = (((snat == n1) & (cnat == n2))
                | ((snat == n2) & (cnat == n1)))
        batch = batch.filter(pa.array(keep))
        snat, cnat = snat[keep], cnat[keep]
        return pa.Table.from_pydict({
            "supp_nation": pa.array([n_name[int(v)] for v in snat],
                                    pa.string()),
            "cust_nation": pa.array([n_name[int(v)] for v in cnat],
                                    pa.string()),
            "year": batch.column("year"),
            "rev": batch.column("rev")})

    return joined.map_batches(_pair, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby(["supp_nation", "cust_nation", "year"]) \
        .aggregate(Sum("rev", alias_name="revenue_units"))


Q7_SQL = f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       year(l_shipdate)::BIGINT AS year,
       sum(round(l_extendedprice * 100)::BIGINT
           * (100 - round(l_discount * 100)::BIGINT))::BIGINT
         AS revenue_units
FROM lineitem
JOIN supplier s ON s.s_suppkey = l_suppkey
JOIN orders o ON o.o_orderkey = l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
WHERE (s.s_nationkey = {Q7_NATIONS[0]} AND c.c_nationkey = {Q7_NATIONS[1]})
   OR (s.s_nationkey = {Q7_NATIONS[1]} AND c.c_nationkey = {Q7_NATIONS[0]})
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""

ORACLES["join_q7_nation_volume"] = Q7_SQL


# ---------------------------------------------------------------------------
# TPC-H Q8 — national market share.  The reference engine has no
# relational surface (SURVEY.md §2.5 gap); this is part of the repo's
# beyond-reference join family.  Shape: the part filter broadcasts a
# sorted key array (ray.put once, searchsorted membership per batch —
# the q17/q19 pattern), customer→region and supplier→nation are
# broadcast dimension lookups, and the single big-big exchange is the
# fact→orders adaptive join.  Output is exact integer volume units
# (numerator and denominator separately) so the DuckDB oracle hashes
# bit-identically — the float share is a trivial driver-side divide.
# ---------------------------------------------------------------------------

Q8_REGION = 2          # ASIA
Q8_NATION = 2          # NATION_2 (inside ASIA)
Q8_TYPE = "MEDIUM"
Q8_YEARS = (1995, 1996)


def q8_market_share(sf_dir: str) -> ray.data.Dataset:
    import os

    import numpy as np

    from nerfray.sources.parquet import (read_parquet_clean,
                                         read_small_table)
    from ray.data.aggregate import Sum

    part = read_small_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_type"])
    pkeys = np.sort(part.filter(
        pc.equal(part.column("p_type"), pa.scalar(Q8_TYPE)))
        .column("p_partkey").to_numpy())
    pkeys_ref = ray.put(pkeys)

    supp = read_small_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"])
    sk = supp.column("s_suppkey").to_numpy()
    sn = supp.column("s_nationkey").to_numpy().astype(np.int64)
    order_ = np.argsort(sk)
    supp_ref = ray.put((sk[order_], sn[order_]))

    nation = read_small_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_regionkey"])
    region_nations = set(
        nation.filter(pc.equal(nation.column("n_regionkey"),
                               pa.scalar(Q8_REGION)))
        .column("n_nationkey").to_pylist())
    cust = read_small_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"])
    in_region = pa.array(
        [int(v) in region_nations
         for v in cust.column("c_nationkey").to_pylist()])
    ckeys = np.sort(cust.filter(in_region)
                    .column("c_custkey").to_numpy())
    ckeys_ref = ray.put(ckeys)

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"])

    def _fact(batch: pa.Table) -> pa.Table:
        ks = ray.get(pkeys_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        if len(ks) == 0:
            keep = np.zeros(len(pk), bool)
        else:
            pos = np.searchsorted(ks, pk)
            pos[pos >= len(ks)] = 0
            keep = ks[pos] == pk
        batch = batch.filter(pa.array(keep))
        sks, sns = ray.get(supp_ref)
        lsk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        if len(sks) == 0:
            snat = np.full(len(lsk), -1, np.int64)
        else:
            pos = np.searchsorted(sks, lsk)
            pos[pos >= len(sks)] = 0
            snat = np.where(sks[pos] == lsk, sns[pos], -1)
        price = np.round(batch.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        disc = np.round(batch.column("l_discount")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        vol = price * (100 - disc)
        return pa.Table.from_pydict({
            "l_orderkey": batch.column("l_orderkey"),
            "nation_vol": pa.array(
                np.where(snat == Q8_NATION, vol, 0), pa.int64()),
            "vol": pa.array(vol, pa.int64())})

    fact = li.map_batches(_fact, batch_format="pyarrow",
                          zero_copy_batch=True)

    import pyarrow.dataset as pads
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(
            (pads.field("o_orderdate")
             >= pa.scalar(np.datetime64(f"{Q8_YEARS[0]}-01-01", "us")))
            & (pads.field("o_orderdate")
               < pa.scalar(np.datetime64(f"{Q8_YEARS[1] + 1}-01-01",
                                         "us")))))
    joined, _ = adaptive_join(
        fact, orders, left_on="l_orderkey", right_on="o_orderkey",
        left_cols=["nation_vol", "vol"],
        right_cols=["o_custkey", "o_orderdate"])

    def _by_year(batch: pa.Table) -> pa.Table:
        ks = ray.get(ckeys_ref)
        ock = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        if len(ks) == 0:
            keep = np.zeros(len(ock), bool)
        else:
            pos = np.searchsorted(ks, ock)
            pos[pos >= len(ks)] = 0
            keep = ks[pos] == ock
        batch = batch.filter(pa.array(keep))
        od = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        year = od.astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.Table.from_pydict({
            "year": pa.array(year, pa.int64()),
            "nation_vol": batch.column("nation_vol"),
            "vol": batch.column("vol")})

    return joined.map_batches(_by_year, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("year") \
        .aggregate(Sum("nation_vol", alias_name="nation_vol_units"),
                   Sum("vol", alias_name="total_vol_units"))


Q8_SQL = f"""
SELECT year(o_orderdate)::BIGINT AS year,
       sum(CASE WHEN s.s_nationkey = {Q8_NATION}
                THEN round(l_extendedprice * 100)::BIGINT
                     * (100 - round(l_discount * 100)::BIGINT)
                ELSE 0 END)::BIGINT AS nation_vol_units,
       sum(round(l_extendedprice * 100)::BIGINT
           * (100 - round(l_discount * 100)::BIGINT))::BIGINT
         AS total_vol_units
FROM lineitem
JOIN part p ON p.p_partkey = l_partkey AND p.p_type = '{Q8_TYPE}'
JOIN supplier s ON s.s_suppkey = l_suppkey
JOIN orders o ON o.o_orderkey = l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
                 AND n.n_regionkey = {Q8_REGION}
WHERE o.o_orderdate >= DATE '{Q8_YEARS[0]}-01-01'
  AND o.o_orderdate < DATE '{Q8_YEARS[1] + 1}-01-01'
GROUP BY 1 ORDER BY 1
"""

ORACLES["join_q8_market_share"] = Q8_SQL


# ---------------------------------------------------------------------------
# TPC-H Q21 — suppliers who kept orders waiting (adapted).  The classic
# predicate is l_receiptdate > l_commitdate; this corpus's lineitem has
# neither column (TESTDATA.md schema), so the "failed the order" marker
# is adapted to l_returnflag = 'R' with identical join structure: for
# finished ('F') orders with at least two distinct suppliers, count per
# supplier the orders where THAT supplier had a returned lineitem and
# no other supplier did (the exists / not-exists pair of correlated
# subqueries in the original).  Shape: the F-order keys and the
# per-(order, supplier) return partials flow through ONE 64-way
# orderkey-hash co-group (block-local combine first, marker rows carry
# the F-order side), so nothing order-proportional reaches the driver;
# the supplier name attach is a broadcast dimension lookup.
# ---------------------------------------------------------------------------


def q21_waiting_suppliers(sf_dir: str) -> ray.data.Dataset:
    import os

    import numpy as np

    from nerfray.sources.parquet import (read_parquet_clean,
                                         read_small_table)
    from ray.data.aggregate import Sum

    _PAIR_SCHEMA = pa.schema([("okey", pa.int64()),
                              ("skey", pa.int64()),
                              ("ret", pa.int64()),
                              ("hb", pa.int32())])

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_returnflag"])

    def _pair_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        ret = pc.cast(pc.equal(batch.column("l_returnflag"),
                               pa.scalar("R")), pa.int64())
        part = pa.Table.from_pydict({
            "okey": batch.column("l_orderkey"),
            "skey": batch.column("l_suppkey"),
            "ret": ret})
        part = part.group_by(["okey", "skey"]).aggregate(
            [("ret", "max")]).rename_columns(["okey", "skey", "ret"])
        hb = pa.array((part.column("okey")
                       .to_numpy(zero_copy_only=False) & 63)
                      .astype(np.int32), pa.int32())
        return part.append_column("hb", hb).cast(_PAIR_SCHEMA)

    import pyarrow.dataset as pads
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderstatus"],
        filter=pads.field("o_orderstatus") == "F")

    def _f_marker(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch.column("o_orderstatus"),
                                      pa.scalar("F")))
        if batch.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        ok = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        n = len(ok)
        return pa.Table.from_pydict({
            "okey": pa.array(ok, pa.int64()),
            "skey": pa.array(np.full(n, -1, np.int64), pa.int64()),
            "ret": pa.array(np.full(n, -1, np.int64), pa.int64()),
            "hb": pa.array((ok & 63).astype(np.int32), pa.int32())})

    pairs = li.map_batches(_pair_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    markers = orders.map_batches(_f_marker, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def _bucket(group: pa.Table) -> pa.Table:
        out_schema = pa.schema([("skey", pa.int64()),
                                ("n", pa.int64())])
        if group.num_rows == 0:
            return out_schema.empty_table()
        is_marker = pc.equal(group.column("ret"),
                             pa.scalar(-1, pa.int64()))
        f_keys = np.unique(group.filter(is_marker).column("okey")
                           .to_numpy(zero_copy_only=False))
        pair = group.filter(pc.invert(is_marker)) \
            .select(["okey", "skey", "ret"]) \
            .group_by(["okey", "skey"]).aggregate([("ret", "max")]) \
            .rename_columns(["okey", "skey", "ret"])
        ok = pair.column("okey").to_numpy(zero_copy_only=False)
        if len(f_keys) == 0 or pair.num_rows == 0:
            return out_schema.empty_table()
        pos = np.searchsorted(f_keys, ok)
        pos[pos >= len(f_keys)] = 0
        pair = pair.filter(pa.array(f_keys[pos] == ok))
        if pair.num_rows == 0:
            return out_schema.empty_table()
        # per-order supplier / returner counts via one sorted sweep
        pair = pair.sort_by("okey")
        ok = pair.column("okey").to_numpy(zero_copy_only=False)
        ret = pair.column("ret").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        n_supp = np.diff(np.r_[starts, len(ok)])
        n_ret = np.add.reduceat(ret, starts)
        gid = np.cumsum(np.r_[0, (ok[1:] != ok[:-1]).astype(np.int64)])
        keep = ((ret == 1) & (n_supp[gid] >= 2) & (n_ret[gid] == 1))
        sk = pair.column("skey").to_numpy(zero_copy_only=False)[keep]
        return pa.Table.from_pydict({
            "skey": pa.array(sk, pa.int64()),
            "n": pa.array(np.ones(len(sk), np.int64), pa.int64())})

    waits = pairs.union(markers).groupby("hb") \
        .map_groups(_bucket, batch_format="pyarrow") \
        .groupby("skey").aggregate(Sum("n", alias_name="numwait"))

    supp = read_small_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"])
    sk = supp.column("s_suppkey").to_numpy()
    names = supp.column("s_name").to_pylist()
    order_ = np.argsort(sk)
    name_ref = ray.put((sk[order_], [names[i] for i in order_]))

    def _attach(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([("s_name", pa.string()),
                                ("numwait", pa.int64())])
        if batch.num_rows == 0:
            return out_schema.empty_table()
        ks, nm = ray.get(name_ref)
        sk_ = batch.column("skey").to_numpy(zero_copy_only=False)
        if len(ks) == 0:
            return out_schema.empty_table()
        pos = np.searchsorted(ks, sk_)
        pos[pos >= len(ks)] = 0
        ok_ = ks[pos] == sk_
        batch = batch.filter(pa.array(ok_))
        return pa.Table.from_pydict({
            "s_name": pa.array([nm[int(i)] for i in pos[ok_]],
                               pa.string()),
            "numwait": batch.column("numwait")}).cast(out_schema)

    return waits.map_batches(_attach, batch_format="pyarrow",
                             zero_copy_batch=True)


Q21_SQL = """
WITH pair AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey AND o_orderstatus = 'F'
  GROUP BY 1, 2),
ostat AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(ret) AS n_ret
  FROM pair GROUP BY 1)
SELECT s.s_name, count(*)::BIGINT AS numwait
FROM pair p
JOIN ostat o ON o.l_orderkey = p.l_orderkey
JOIN supplier s ON s.s_suppkey = p.l_suppkey
WHERE p.ret = 1 AND o.n_supp >= 2 AND o.n_ret = 1
GROUP BY 1 ORDER BY 1
"""

ORACLES["join_q21_waiting"] = Q21_SQL


# ---------------------------------------------------------------------------
# TPC-H Q2 / Q9 / Q11 / Q16 / Q20 (adapted).  The classic forms need the
# partsupp table, which TESTDATA.md's corpus does not carry; each query
# keeps the original's join/aggregation SHAPE with lineitem as the
# part-supplier fact and p_retailprice as the cost surrogate (the Q8 /
# Q21 adaptation precedent).  All measures are exact integer units so
# the DuckDB oracle hashes bit-identically.  Scale shapes: dimensions
# broadcast (ray.put once, searchsorted per batch), facts pre-pruned at
# the read or first map, the one unavoidable exchange is a 64-way
# key-hash co-group (or the adaptive orders hop), nothing
# fact-proportional on the driver.
# ---------------------------------------------------------------------------


def _sorted_member(sorted_keys: np.ndarray,
                   values: np.ndarray) -> np.ndarray:
    """Boolean membership of ``values`` in ``sorted_keys`` (ascending)."""
    if len(sorted_keys) == 0:
        return np.zeros(len(values), bool)
    pos = np.searchsorted(sorted_keys, values)
    pos[pos >= len(sorted_keys)] = 0
    return sorted_keys[pos] == values


def _sorted_lookup(sorted_keys: np.ndarray, payload: np.ndarray,
                   values: np.ndarray, default) -> np.ndarray:
    """payload[key] per value, ``default`` where the key is absent."""
    if len(sorted_keys) == 0:
        return np.full(len(values), default, payload.dtype
                       if hasattr(payload, "dtype") else None)
    pos = np.searchsorted(sorted_keys, values)
    pos[pos >= len(sorted_keys)] = 0
    hit = sorted_keys[pos] == values
    return np.where(hit, payload[pos], default)


Q2_SIZE = 7
Q2_REGION = 1


def q2_min_cost_supplier(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q2 (adapted): per part of size Q2_SIZE, the cheapest
    observed line price from a region-Q2_REGION supplier and the
    lowest-keyed supplier achieving it — the argmin-join-back collapsed
    into ONE partkey-hash co-group (lexsort by (pk, price, sk); the
    first row per pk is simultaneously the min price and its min-key
    achiever)."""
    import os

    from nerfray.sources.parquet import (read_parquet_clean,
                                         read_small_table)

    part = read_small_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name", "p_size"])
    sized = part.filter(pc.equal(part.column("p_size"),
                                 pa.scalar(Q2_SIZE, pa.int32())))
    pk = sized.column("p_partkey").to_numpy()
    names = sized.column("p_name").to_pylist()
    order_ = np.argsort(pk)
    pname_ref = ray.put((pk[order_], [names[i] for i in order_]))

    nation = read_small_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_regionkey"])
    region_nations = nation.filter(
        pc.equal(nation.column("n_regionkey"),
                 pa.scalar(Q2_REGION, pa.int32()))) \
        .column("n_nationkey").to_numpy().astype(np.int64)
    supp = read_small_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"])
    sk = supp.column("s_suppkey").to_numpy()
    sn = supp.column("s_nationkey").to_numpy().astype(np.int64)
    skeys = np.sort(sk[np.isin(sn, region_nations)])
    skeys_ref = ray.put(skeys)

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice"])
    _PART_SCHEMA = pa.schema([("pk", pa.int64()), ("sk", pa.int64()),
                              ("price_c", pa.int64()),
                              ("hb", pa.int32())])

    def _fact(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _PART_SCHEMA.empty_table()
        pks, _ = ray.get(pname_ref)
        lpk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        lsk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        keep = _sorted_member(pks, lpk) \
            & _sorted_member(ray.get(skeys_ref), lsk)
        price = np.round(batch.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False)[keep] * 100) \
            .astype(np.int64)
        t = pa.Table.from_pydict({
            "pk": pa.array(lpk[keep], pa.int64()),
            "sk": pa.array(lsk[keep], pa.int64()),
            "price_c": pa.array(price, pa.int64())})
        # block-local combine: min price per (pk, sk)
        t = t.group_by(["pk", "sk"]).aggregate([("price_c", "min")]) \
            .rename_columns(["pk", "sk", "price_c"])
        hb = pa.array((t.column("pk").to_numpy(zero_copy_only=False)
                       & 63).astype(np.int32), pa.int32())
        return t.append_column("hb", hb).cast(_PART_SCHEMA)

    _OUT = pa.schema([("p_partkey", pa.int64()),
                      ("min_price_c", pa.int64()),
                      ("best_suppkey", pa.int64())])

    def _bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _OUT.empty_table()
        g_pk = group.column("pk").to_numpy(zero_copy_only=False)
        g_sk = group.column("sk").to_numpy(zero_copy_only=False)
        g_pr = group.column("price_c").to_numpy(zero_copy_only=False)
        order = np.lexsort((g_sk, g_pr, g_pk))
        g_pk, g_sk, g_pr = g_pk[order], g_sk[order], g_pr[order]
        first = np.r_[True, g_pk[1:] != g_pk[:-1]]
        return pa.Table.from_pydict({
            "p_partkey": pa.array(g_pk[first], pa.int64()),
            "min_price_c": pa.array(g_pr[first], pa.int64()),
            "best_suppkey": pa.array(g_sk[first], pa.int64()),
        }, schema=_OUT)

    mins = li.map_batches(_fact, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("hb").map_groups(_bucket, batch_format="pyarrow")

    _FINAL = pa.schema([("p_partkey", pa.int64()),
                        ("p_name", pa.string()),
                        ("min_price_c", pa.int64()),
                        ("best_suppkey", pa.int64())])

    def _attach(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _FINAL.empty_table()
        pks, nm = ray.get(pname_ref)
        bpk = batch.column("p_partkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(pks, bpk)
        pos[pos >= len(pks)] = 0
        return pa.Table.from_pydict({
            "p_partkey": batch.column("p_partkey"),
            "p_name": pa.array([nm[int(i)] for i in pos], pa.string()),
            "min_price_c": batch.column("min_price_c"),
            "best_suppkey": batch.column("best_suppkey"),
        }, schema=_FINAL)

    return mins.map_batches(_attach, batch_format="pyarrow",
                            zero_copy_batch=True)


Q2_SQL = f"""
WITH fact AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         round(l_extendedprice * 100)::BIGINT AS price_c
  FROM lineitem
  JOIN supplier s ON s.s_suppkey = l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
                   AND n.n_regionkey = {Q2_REGION}
  JOIN part p ON p.p_partkey = l_partkey AND p.p_size = {Q2_SIZE}),
m AS (SELECT pk, min(price_c) AS min_price_c FROM fact GROUP BY 1)
SELECT f.pk AS p_partkey, any_value(p.p_name) AS p_name,
       m.min_price_c, min(f.sk)::BIGINT AS best_suppkey
FROM fact f
JOIN m ON m.pk = f.pk AND f.price_c = m.min_price_c
JOIN part p ON p.p_partkey = f.pk
GROUP BY 1, 3 ORDER BY 1
"""

ORACLES["join_q2_min_cost"] = Q2_SQL


Q9_NAME_SUBSTR = "red"


def q9_profit_by_nation_year(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q9 (adapted): profit per supplier nation per order year
    over the 'red' part family; p_retailprice stands in for
    ps_supplycost (no partsupp in this corpus).  profit_units =
    price_c * (100 - disc_c) - retail_c * qty, all exact integers.
    Shape: part family + retail price and supplier nation broadcast,
    one adaptive orders hop for the year, map-side combine to
    (nation, year) grain before the final tiny groupby."""
    import os

    from nerfray.sources.parquet import (read_parquet_clean,
                                         read_small_table)
    from ray.data.aggregate import Sum

    part = read_small_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name", "p_retailprice"])
    fam = part.filter(pc.match_substring(part.column("p_name"),
                                         Q9_NAME_SUBSTR))
    pk = fam.column("p_partkey").to_numpy()
    retail_c = np.round(fam.column("p_retailprice").to_numpy()
                        * 100).astype(np.int64)
    order_ = np.argsort(pk)
    part_ref = ray.put((pk[order_], retail_c[order_]))

    supp = read_small_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"])
    sk = supp.column("s_suppkey").to_numpy()
    sn = supp.column("s_nationkey").to_numpy().astype(np.int64)
    order_ = np.argsort(sk)
    supp_ref = ray.put((sk[order_], sn[order_]))

    nation = read_small_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"])
    nk = nation.column("n_nationkey").to_numpy().astype(np.int64)
    nn = nation.column("n_name").to_pylist()
    order_ = np.argsort(nk)
    nation_ref = ray.put((nk[order_], [nn[i] for i in order_]))

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount"])
    _FACT = pa.schema([("l_orderkey", pa.int64()),
                       ("snat", pa.int64()),
                       ("profit_units", pa.int64())])

    def _fact(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _FACT.empty_table()
        pks, rc = ray.get(part_ref)
        lpk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        keep = _sorted_member(pks, lpk)
        batch = batch.filter(pa.array(keep))
        lpk = lpk[keep]
        retail = _sorted_lookup(pks, rc, lpk, 0)
        sks, sns = ray.get(supp_ref)
        snat = _sorted_lookup(
            sks, sns,
            batch.column("l_suppkey").to_numpy(zero_copy_only=False),
            -1)
        price = np.round(batch.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        disc = np.round(batch.column("l_discount")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        qty = np.round(batch.column("l_quantity")
                       .to_numpy(zero_copy_only=False)).astype(np.int64)
        profit = price * (100 - disc) - retail * qty
        return pa.Table.from_pydict({
            "l_orderkey": batch.column("l_orderkey"),
            "snat": pa.array(snat, pa.int64()),
            "profit_units": pa.array(profit, pa.int64()),
        }, schema=_FACT)

    fact = li.map_batches(_fact, batch_format="pyarrow",
                          zero_copy_batch=True)
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"])
    joined, _ = adaptive_join(
        fact, orders, left_on="l_orderkey", right_on="o_orderkey",
        left_cols=["snat", "profit_units"], right_cols=["o_orderdate"],
        field_types={"snat": pa.int64(), "profit_units": pa.int64()})

    _GRAIN = pa.schema([("snat", pa.int64()), ("year", pa.int64()),
                        ("profit_units", pa.int64())])

    def _combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _GRAIN.empty_table()
        od = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        year = od.astype("datetime64[Y]").astype(np.int64) + 1970
        t = pa.Table.from_pydict({
            "snat": batch.column("snat"),
            "year": pa.array(year, pa.int64()),
            "profit_units": batch.column("profit_units")})
        return t.group_by(["snat", "year"]) \
            .aggregate([("profit_units", "sum")]) \
            .rename_columns(["snat", "year", "profit_units"]) \
            .cast(_GRAIN)

    rolled = joined.map_batches(_combine, batch_format="pyarrow",
                                zero_copy_batch=True) \
        .groupby(["snat", "year"]) \
        .aggregate(Sum("profit_units", alias_name="profit_units"))

    _OUT = pa.schema([("n_name", pa.string()), ("year", pa.int64()),
                      ("profit_units", pa.int64())])

    def _attach(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _OUT.empty_table()
        nks, nns = ray.get(nation_ref)
        snat = batch.column("snat").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(nks, snat)
        pos[pos >= len(nks)] = 0
        return pa.Table.from_pydict({
            "n_name": pa.array([nns[int(i)] for i in pos], pa.string()),
            "year": batch.column("year"),
            "profit_units": batch.column("profit_units"),
        }, schema=_OUT)

    return rolled.map_batches(_attach, batch_format="pyarrow",
                              zero_copy_batch=True)


Q9_SQL = f"""
SELECT n.n_name, year(o_orderdate)::BIGINT AS year,
       sum(round(l_extendedprice * 100)::BIGINT
           * (100 - round(l_discount * 100)::BIGINT)
           - round(p_retailprice * 100)::BIGINT
             * round(l_quantity)::BIGINT)::BIGINT AS profit_units
FROM lineitem
JOIN part p ON p.p_partkey = l_partkey
               AND p.p_name LIKE '%{Q9_NAME_SUBSTR}%'
JOIN supplier s ON s.s_suppkey = l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l_orderkey
GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLES["join_q9_profit"] = Q9_SQL


Q11_NATION = 3
Q11_AVG_MULT = 2       # keep parts with value > MULT * average value


def q11_important_stock(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q11 (adapted): per-part stocked value from nation-Q11
    suppliers, keeping parts worth more than Q11_AVG_MULT times the
    average part value — the global-share HAVING pattern, made
    scale-free (the classic's fixed fraction-of-total empties out as
    part count grows).  value_units = price_c * qty, exact integers;
    the share test is the integer cross-multiplication
    value * n_parts > MULT * total (no float drift against the
    oracle).  The per-part rollup is part-cardinality bounded (a
    dimension grain), so materializing it once for the two global
    scalars is driver-safe by construction."""
    import os

    from nerfray.sources.parquet import (read_parquet_clean,
                                         read_small_table)
    from ray.data.aggregate import Sum

    supp = read_small_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"])
    sk = supp.column("s_suppkey").to_numpy()
    sn = supp.column("s_nationkey").to_numpy().astype(np.int64)
    skeys_ref = ray.put(np.sort(sk[sn == Q11_NATION]))

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice"])
    _PART = pa.schema([("p_partkey", pa.int64()),
                       ("value_units", pa.int64())])

    def _fact(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _PART.empty_table()
        keep = _sorted_member(
            ray.get(skeys_ref),
            batch.column("l_suppkey").to_numpy(zero_copy_only=False))
        batch = batch.filter(pa.array(keep))
        price = np.round(batch.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        qty = np.round(batch.column("l_quantity")
                       .to_numpy(zero_copy_only=False)).astype(np.int64)
        t = pa.Table.from_pydict({
            "p_partkey": batch.column("l_partkey"),
            "value_units": pa.array(price * qty, pa.int64())})
        return t.group_by("p_partkey") \
            .aggregate([("value_units", "sum")]) \
            .rename_columns(["p_partkey", "value_units"]).cast(_PART)

    per_part = li.map_batches(_fact, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("p_partkey") \
        .aggregate(Sum("value_units", alias_name="value_units")) \
        .materialize()          # part-grain, bounded
    total = per_part.sum("value_units") or 0
    n_parts = per_part.count()

    def _share(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _PART.empty_table()
        v = batch.column("value_units").to_numpy(zero_copy_only=False)
        return batch.filter(
            pa.array(v * n_parts > Q11_AVG_MULT * total)).cast(_PART)

    return per_part.map_batches(_share, batch_format="pyarrow",
                                zero_copy_batch=True)


Q11_SQL = f"""
WITH f AS (
  SELECT l_partkey AS p_partkey,
         sum(round(l_extendedprice * 100)::BIGINT
             * round(l_quantity)::BIGINT)::BIGINT AS value_units
  FROM lineitem
  JOIN supplier s ON s.s_suppkey = l_suppkey
                     AND s.s_nationkey = {Q11_NATION}
  GROUP BY 1)
SELECT p_partkey, value_units FROM f
WHERE value_units * (SELECT count(*) FROM f)
      > {Q11_AVG_MULT} * (SELECT sum(value_units) FROM f)
ORDER BY 1
"""

ORACLES["join_q11_important_stock"] = Q11_SQL


Q16_EXCL_BRAND = "Brand#1"
Q16_MAX_SIZE = 10


def q16_supplier_counts(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q16 (adapted): distinct suppliers per (brand, type, size)
    for small non-Brand#1 parts, excluding negative-balance suppliers
    (the 'complaints' NOT IN, as a broadcast key set).  Distinctness
    via one suppkey-hash co-group: block-local (brand, type, size,
    suppkey) dedup, bucket dedup, then a tiny grouped count."""
    import os

    from nerfray.sources.parquet import (read_parquet_clean,
                                         read_small_table)
    from ray.data.aggregate import Sum

    part = read_small_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_type", "p_size"])
    keepp = pc.and_(
        pc.not_equal(part.column("p_brand"), pa.scalar(Q16_EXCL_BRAND)),
        pc.less_equal(part.column("p_size"),
                      pa.scalar(Q16_MAX_SIZE, pa.int32())))
    part = part.filter(keepp)
    pk = part.column("p_partkey").to_numpy()
    brands = part.column("p_brand").to_pylist()
    types = part.column("p_type").to_pylist()
    order_ = np.argsort(pk)
    attrs = (pk[order_],
             [brands[i] for i in order_],
             [types[i] for i in order_],
             part.column("p_size").to_numpy().astype(np.int64)[order_])
    part_ref = ray.put(attrs)

    supp = read_small_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_acctbal"])
    bad = supp.filter(pc.less(supp.column("s_acctbal"),
                              pa.scalar(0.0)))
    bad_ref = ray.put(np.sort(bad.column("s_suppkey").to_numpy()))

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey"])
    _ROW = pa.schema([("p_brand", pa.string()), ("p_type", pa.string()),
                      ("p_size", pa.int64()), ("sk", pa.int64()),
                      ("hb", pa.int32())])

    def _fact(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _ROW.empty_table()
        pks, br, ty, sz = ray.get(part_ref)
        lpk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        lsk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        keep = _sorted_member(pks, lpk) \
            & ~_sorted_member(ray.get(bad_ref), lsk)
        lpk, lsk = lpk[keep], lsk[keep]
        pos = np.searchsorted(pks, lpk)
        t = pa.Table.from_pydict({
            "p_brand": pa.array([br[int(i)] for i in pos], pa.string()),
            "p_type": pa.array([ty[int(i)] for i in pos], pa.string()),
            "p_size": pa.array(sz[pos], pa.int64()),
            "sk": pa.array(lsk, pa.int64())})
        # block-local distinct before the exchange
        t = t.group_by(["p_brand", "p_type", "p_size", "sk"]) \
            .aggregate([]).select(["p_brand", "p_type", "p_size", "sk"])
        hb = pa.array((t.column("sk").to_numpy(zero_copy_only=False)
                       & 63).astype(np.int32), pa.int32())
        return t.append_column("hb", hb).cast(_ROW)

    _CNT = pa.schema([("p_brand", pa.string()), ("p_type", pa.string()),
                      ("p_size", pa.int64()), ("n", pa.int64())])

    def _bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _CNT.empty_table()
        d = group.select(["p_brand", "p_type", "p_size", "sk"]) \
            .group_by(["p_brand", "p_type", "p_size", "sk"]) \
            .aggregate([])
        c = d.group_by(["p_brand", "p_type", "p_size"]) \
            .aggregate([("sk", "count")]) \
            .rename_columns(["p_brand", "p_type", "p_size", "n"])
        return c.cast(_CNT)

    return li.map_batches(_fact, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("hb").map_groups(_bucket, batch_format="pyarrow") \
        .groupby(["p_brand", "p_type", "p_size"]) \
        .aggregate(Sum("n", alias_name="supplier_cnt"))


Q16_SQL = f"""
SELECT p.p_brand, p.p_type, p.p_size::BIGINT AS p_size,
       count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem
JOIN part p ON p.p_partkey = l_partkey
WHERE p.p_brand <> '{Q16_EXCL_BRAND}' AND p.p_size <= {Q16_MAX_SIZE}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 0)
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""

ORACLES["join_q16_supplier_cnt"] = Q16_SQL


Q20_PREFIX = "blue"
Q20_SHARE_MULT = 6     # qualify: own qty * MULT > part total


def q20_majority_suppliers(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q20 (adapted): suppliers who shipped more than a
    1/Q20_SHARE_MULT share of some 'blue'-prefixed part's total
    quantity — the nested semi-join collapsed into ONE partkey-hash
    co-group computing both grains (per-part total, per-(part,
    supplier) share) in a sorted sweep.  (The classic's nation filter
    is dropped: at test scale no single supplier holds a strict
    in-nation majority, and an always-empty result also exercises
    nothing.)"""
    import os

    from nerfray.sources.parquet import (read_parquet_clean,
                                         read_small_table)

    part = read_small_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name"])
    fam = part.filter(pc.starts_with(part.column("p_name"),
                                     Q20_PREFIX))
    pkeys_ref = ray.put(np.sort(fam.column("p_partkey").to_numpy()))

    supp = read_small_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"])
    sk = supp.column("s_suppkey").to_numpy()
    names = supp.column("s_name").to_pylist()
    order_ = np.argsort(sk)
    supp_ref = ray.put((sk[order_], [names[i] for i in order_]))

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_quantity"])
    _PART = pa.schema([("pk", pa.int64()), ("sk", pa.int64()),
                       ("q", pa.int64()), ("hb", pa.int32())])

    def _fact(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _PART.empty_table()
        lpk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        keep = _sorted_member(ray.get(pkeys_ref), lpk)
        batch = batch.filter(pa.array(keep))
        qty = np.round(batch.column("l_quantity")
                       .to_numpy(zero_copy_only=False)).astype(np.int64)
        t = pa.Table.from_pydict({
            "pk": batch.column("l_partkey"),
            "sk": batch.column("l_suppkey"),
            "q": pa.array(qty, pa.int64())})
        t = t.group_by(["pk", "sk"]).aggregate([("q", "sum")]) \
            .rename_columns(["pk", "sk", "q"])
        hb = pa.array((t.column("pk").to_numpy(zero_copy_only=False)
                       & 63).astype(np.int32), pa.int32())
        return t.append_column("hb", hb).cast(_PART)

    _SK = pa.schema([("sk", pa.int64())])

    def _bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _SK.empty_table()
        t = group.select(["pk", "sk", "q"]) \
            .group_by(["pk", "sk"]).aggregate([("q", "sum")]) \
            .rename_columns(["pk", "sk", "q"])
        g_pk = t.column("pk").to_numpy(zero_copy_only=False)
        g_sk = t.column("sk").to_numpy(zero_copy_only=False)
        g_q = t.column("q").to_numpy(zero_copy_only=False)
        order = np.argsort(g_pk, kind="stable")
        g_pk, g_sk, g_q = g_pk[order], g_sk[order], g_q[order]
        starts = np.flatnonzero(np.r_[True, g_pk[1:] != g_pk[:-1]])
        totals = np.add.reduceat(g_q, starts)
        gid = np.cumsum(np.r_[0, (g_pk[1:] != g_pk[:-1]).astype(np.int64)])
        win = Q20_SHARE_MULT * g_q > totals[gid]
        return pa.Table.from_pydict({
            "sk": pa.array(np.unique(g_sk[win]), pa.int64())},
            schema=_SK)

    from ray.data.aggregate import Count
    winners = li.map_batches(_fact, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("hb").map_groups(_bucket, batch_format="pyarrow") \
        .groupby("sk").aggregate(Count(alias_name="_c"))  # distinct

    _OUT = pa.schema([("s_suppkey", pa.int64()),
                      ("s_name", pa.string())])

    def _attach(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _OUT.empty_table()
        ks, nm = ray.get(supp_ref)
        sk_ = batch.column("sk").to_numpy(zero_copy_only=False)
        hit = _sorted_member(ks, sk_)
        sk_ = sk_[hit]
        pos = np.searchsorted(ks, sk_)
        return pa.Table.from_pydict({
            "s_suppkey": pa.array(sk_, pa.int64()),
            "s_name": pa.array([nm[int(i)] for i in pos], pa.string()),
        }, schema=_OUT)

    return winners.map_batches(_attach, batch_format="pyarrow",
                               zero_copy_batch=True)


Q20_SQL = f"""
WITH f AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         sum(round(l_quantity)::BIGINT)::BIGINT AS q
  FROM lineitem
  JOIN part p ON p.p_partkey = l_partkey
                 AND p.p_name LIKE '{Q20_PREFIX}%'
  GROUP BY 1, 2),
t AS (SELECT pk, sum(q) AS tq FROM f GROUP BY 1)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM f
JOIN t ON t.pk = f.pk AND {Q20_SHARE_MULT} * f.q > t.tq
JOIN supplier s ON s.s_suppkey = f.sk
ORDER BY 1
"""

ORACLES["join_q20_majority"] = Q20_SQL
