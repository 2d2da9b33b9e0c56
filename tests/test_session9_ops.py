"""Tests for the interval-coverage, transition-matrix, Pareto-skyline,
table-checksum, and Feather/ORC shard-reader operators — brute-force
oracles on planted fixtures plus the invariants each op exists for
(order independence for the checksum, lossless partials for the
skyline, boundary overlap merging for coverage)."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


# -- interval-union coverage ---------------------------------------------------

def _brute_cover(intervals):
    """Union length + island count of [lo, hi) pairs, brute force."""
    ivs = sorted(intervals)
    covered = islands = 0
    cur_lo = cur_hi = None
    for lo, hi in ivs:
        if cur_hi is None or lo > cur_hi:
            if cur_hi is not None:
                covered += cur_hi - cur_lo
            cur_lo, cur_hi = lo, hi
            islands += 1
        else:
            cur_hi = max(cur_hi, hi)
    if cur_hi is not None:
        covered += cur_hi - cur_lo
    return covered, islands


def test_covered_bucket_vs_brute(ray_session):
    from nerfray.ops.events import (COVER_BASE_MIN, COVER_MOD,
                                    _covered_bucket)
    rng = np.random.default_rng(7)
    n = 500
    users = rng.integers(0, 9, n)
    ts = rng.integers(0, 10**9, n) * 1000  # microseconds
    value = rng.uniform(0, 500, n)
    group = pa.Table.from_pydict({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "value": pa.array(value, pa.float64()),
    })
    out = _covered_bucket(group)
    got = {r["user_id"]: (r["covered_us"], r["n_islands"])
           for r in out.to_pylist()}
    cents = np.round(value * 100).astype(np.int64)
    dur = (np.abs(cents) % COVER_MOD + COVER_BASE_MIN) * 60_000_000
    for u in np.unique(users):
        m = users == u
        want = _brute_cover(list(zip((ts[m]).tolist(),
                                     (ts[m] + dur[m]).tolist())))
        assert got[int(u)] == want


def test_covered_time_merges_overlaps(ray_session):
    # two overlapping intervals for one user -> one island, union len
    from nerfray.ops.events import _covered_bucket
    t0 = 1_700_000_000_000_000
    group = pa.Table.from_pydict({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        # value 0.0 -> dur = 30 min; second event 10 min later overlaps
        "ts": pa.array([t0, t0 + 600_000_000, t0], pa.timestamp("us")),
        "value": pa.array([0.0, 0.0, 0.0], pa.float64()),
    })
    rows = {r["user_id"]: r for r in _covered_bucket(group).to_pylist()}
    assert rows[1]["n_islands"] == 1
    assert rows[1]["covered_us"] == 40 * 60_000_000  # 30 + 10 shifted
    assert rows[2]["covered_us"] == 30 * 60_000_000


# -- event transitions --------------------------------------------------------

def test_transitions_bucket_counts(ray_session):
    from nerfray.ops.events import _transitions_bucket
    # user 1: a->b->a ; user 2: b->b ; ties broken by event_id
    group = pa.Table.from_pydict({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array([10, 20, 30, 10, 10], pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 5, 4], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "b", "b"], pa.string()),
    })
    got = {(r["prev_type"], r["next_type"]): r["n"]
           for r in _transitions_bucket(group).to_pylist()}
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("b", "b"): 1}


# -- Pareto skyline -----------------------------------------------------------

def _brute_skyline(points):
    out = []
    for i, (k, s, p) in enumerate(points):
        dominated = any(
            q[2] <= p and q[1] <= s and (q[2] < p or q[1] < s)
            for q in points)
        if not dominated:
            out.append(k)
    return sorted(out)


def test_skyline_vs_brute(ray_session):
    from nerfray.ops.relational import _skyline_rows
    rng = np.random.default_rng(3)
    n = 300
    key = np.arange(n, dtype=np.int64)
    size = rng.integers(1, 20, n).astype(np.int64)
    price = np.round(rng.uniform(1, 20, n), 1)  # duplicates likely
    got = sorted(_skyline_rows(key, size, price)
                 .column("p_partkey").to_pylist())
    want = _brute_skyline(list(zip(key.tolist(), size.tolist(),
                                   price.tolist())))
    assert got == want


def test_skyline_partial_lossless(ray_session):
    # global skyline == skyline of the union of per-block skylines
    from nerfray.ops.relational import _skyline_rows
    rng = np.random.default_rng(11)
    n = 400
    key = np.arange(n, dtype=np.int64)
    size = rng.integers(1, 15, n).astype(np.int64)
    price = np.round(rng.uniform(1, 15, n), 1)
    whole = sorted(_skyline_rows(key, size, price)
                   .column("p_partkey").to_pylist())
    parts = []
    for lo in range(0, n, 64):
        parts.append(_skyline_rows(key[lo:lo + 64], size[lo:lo + 64],
                                   price[lo:lo + 64]))
    merged = pa.concat_tables(parts)
    refined = sorted(_skyline_rows(
        merged.column("p_partkey").to_numpy(),
        merged.column("p_size").to_numpy(),
        merged.column("p_retailprice").to_numpy())
        .column("p_partkey").to_pylist())
    assert refined == whole


def test_skyline_keeps_equal_points(ray_session):
    from nerfray.ops.relational import _skyline_rows
    key = np.array([1, 2, 3], np.int64)
    size = np.array([5, 5, 9], np.int64)
    price = np.array([2.0, 2.0, 1.0], np.float64)
    got = sorted(_skyline_rows(key, size, price)
                 .column("p_partkey").to_pylist())
    assert got == [1, 2, 3]  # equal (2.0, 5) points both survive


# -- table checksum -----------------------------------------------------------

def test_checksum_order_independent(ray_session):
    import ray.data

    from nerfray.ops.integrity import table_checksum
    texts = [f"doc {i} body with {i % 5} extra words" for i in range(200)]
    t = pa.Table.from_pydict({
        "doc_id": pa.array(range(200), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    perm = np.random.default_rng(5).permutation(200)
    t_perm = t.take(pa.array(perm))
    a = table_checksum(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("bucket").reset_index(drop=True)
    b = table_checksum(ray.data.from_arrow(t_perm).repartition(7)) \
        .to_pandas().sort_values("bucket").reset_index(drop=True)
    assert a.equals(b)
    assert int(a["n_rows"].sum()) == 200


def test_checksum_detects_content_change(ray_session):
    import ray.data

    from nerfray.ops.integrity import table_checksum
    t1 = pa.Table.from_pydict({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["alpha beta", "gamma"], pa.string())})
    t2 = pa.Table.from_pydict({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["alpha betaX", "gamma"], pa.string())})
    a = table_checksum(ray.data.from_arrow(t1)).to_pandas()
    b = table_checksum(ray.data.from_arrow(t2)).to_pandas()
    assert set(a["checksum"]) != set(b["checksum"])


# -- feather / ORC shard readers ----------------------------------------------

def test_feather_orc_shards_roundtrip(ray_session, tmp_path):
    from nerfray.sources.parquet import (export_table_sharded,
                                         read_feather_shards,
                                         read_orc_shards)
    import pyarrow.parquet as pq
    want = pq.read_table(f"{SF}/documents.parquet").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for fmt, reader in [("feather", read_feather_shards),
                        ("orc", read_orc_shards)]:
        paths = export_table_sharded(SF, "documents", fmt, n_shards=4)
        assert len(paths) == 4
        got = reader(paths).to_pandas().sort_values("doc_id") \
            .reset_index(drop=True)
        assert len(got) == len(want)
        assert got["text"].tolist() == want["text"].tolist()


# -- domain cap ----------------------------------------------------------------

def test_domain_cap_semantics(ray_session):
    import ray.data

    from nerfray.ops.dedup import splitmix64
    from nerfray.ops.sampling import domain_cap
    n = 300
    ids = np.arange(n, dtype=np.int64)
    src = np.where(ids % 3 == 0, "a", np.where(ids % 3 == 1, "b", "c"))
    t = pa.Table.from_pydict({
        "doc_id": pa.array(ids, pa.int64()),
        "source": pa.array(src.tolist(), pa.string()),
    })
    got = domain_cap(ray.data.from_arrow(t).repartition(5), k=7) \
        .to_pandas()
    # exactly 7 per source, and they are the 7 smallest hashes
    h = splitmix64(ids.astype(np.uint64)) >> np.uint64(1)
    for s in ("a", "b", "c"):
        m = src == s
        want = set(ids[m][np.argsort(h[m].astype(np.int64))[:7]])
        assert set(got[got["source"] == s]["doc_id"]) == want


# -- taxonomy type rollup --------------------------------------------------------

def test_type_rollup_partial_brute(ray_session):
    from nerfray.stages.graph import _type_rollup_partial
    cls = np.array([0, 0, 1, 2, 2, 2], np.int64)
    dist = np.array([0, 1, 0, 0, 0, 2], np.int64)
    t = pa.Table.from_pydict({
        "cls": pa.array(cls, pa.int64()),
        "dist": pa.array(dist, pa.int64())})
    got = {r["cls"]: (r["n_direct"], r["n_total"])
           for r in _type_rollup_partial(t).to_pylist()}
    assert got == {0: (1, 2), 1: (1, 1), 2: (2, 3)}


# -- user value ranks / new users daily ----------------------------------------

def test_user_rank_bucket_vs_brute(ray_session):
    from nerfray.ops.events import _user_rank_bucket
    rng = np.random.default_rng(9)
    n = 400
    users = rng.integers(0, 7, n)
    value = np.round(rng.uniform(0, 5, n), 2)  # many ties
    group = pa.Table.from_pydict({
        "user_id": pa.array(users, pa.int64()),
        "event_id": pa.array(np.arange(n), pa.int64()),
        "value": pa.array(value, pa.float64()),
    })
    got = {r["event_id"]: r["value_rank"]
           for r in _user_rank_bucket(group).to_pylist()}
    cents = np.round(value * 100).astype(np.int64)
    for i in range(n):
        mine = sorted(set(cents[users == users[i]]))
        assert got[i] == mine.index(cents[i]) + 1


def test_new_users_daily_cumulative(ray_session):
    from nerfray.ops.events import _first_day_partial, _newu_fold
    # user 1 first on day 0, user 2 on day 0, user 3 on day 2
    us = pa.array([1, 1, 2, 3, 3], pa.int64())
    ts = pa.array(np.array([0, 86_400_000_000, 10,
                            2 * 86_400_000_000 + 5,
                            3 * 86_400_000_000], np.int64),
                  pa.timestamp("us"))
    part = _first_day_partial(pa.Table.from_pydict(
        {"user_id": us, "ts": ts}))
    folded = _newu_fold(part.rename_columns(["user_id", "day"]))
    rows = folded.to_pylist()
    assert [r["n_new"] for r in rows] == [2, 1]
    assert [r["cum_users"] for r in rows] == [2, 3]
    assert rows[0]["day"] == "1970-01-01" and rows[1]["day"] == "1970-01-03"


# -- CUSUM drift detection ------------------------------------------------------

def test_cusum_bucket_vs_brute(ray_session):
    from nerfray.ops.events import CUSUM_H, CUSUM_K, _cusum_bucket
    rng = np.random.default_rng(21)
    rows = []
    for u in range(6):
        days = sorted(rng.choice(60, size=20, replace=False).tolist())
        for d in days:
            rows.append((u, d, int(rng.integers(1, 9))))
    t = pa.Table.from_pydict({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "day": pa.array([r[1] for r in rows], pa.int64()),
        "c": pa.array([r[2] for r in rows], pa.int64()),
    })
    perm = rng.permutation(len(rows))
    got = {r["user_id"]: (r["n_alert_days"], r["max_stat"])
           for r in _cusum_bucket(t.take(pa.array(perm))).to_pylist()}
    for u in range(6):
        s = alerts = mx = 0
        for uu, d, c in sorted(rows):
            if uu != u:
                continue
            s = max(0, s + c - CUSUM_K)
            mx = max(mx, s)
            alerts += s >= CUSUM_H
        assert got[u] == (alerts, mx)


# -- bucket-prefiltered anti-entropy diff ----------------------------------------

def test_bucket_diff_classifies_and_prunes(ray_session):
    import ray.data

    from nerfray.ops import integrity

    n = 500
    texts = [f"doc {i} body words" for i in range(n)]
    t = pa.Table.from_pydict({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string())})
    a = ray.data.from_arrow(t)
    got = {(r["doc_id"], r["change"]) for r in
           integrity.bucket_diff(a, integrity.planted_docs_v2(a))
           .take_all()}
    want = set()
    for i in range(n):
        if i % integrity.DIFF_DROP_MOD == 0:
            want.add((i, "removed"))
            continue
        if i % integrity.DIFF_EDIT_MOD == 0:
            want.add((i, "changed"))
        if i % integrity.DIFF_ADD_MOD == 0:
            want.add((i + integrity.DIFF_ADD_BASE, "added"))
    assert got == want


def test_checksum_detects_same_length_substitution(ray_session):
    """'abc' -> 'abd' preserves char AND word counts; the codepoint-sum
    term folded into the fingerprint (r5) must still expose it."""
    import ray.data

    from nerfray.ops.integrity import table_checksum
    t1 = pa.Table.from_pydict({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["abc"], pa.string())})
    t2 = pa.Table.from_pydict({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["abd"], pa.string())})
    a = table_checksum(ray.data.from_arrow(t1)).to_pandas()
    b = table_checksum(ray.data.from_arrow(t2)).to_pandas()
    assert a["checksum"].tolist() != b["checksum"].tolist()


def test_bucket_diff_duplicate_keys_raise(ray_session):
    """Duplicate doc_id within one side violates the documented
    unique-key precondition: raise, never misclassify."""
    import pytest
    import ray.data

    from nerfray.ops.integrity import bucket_diff
    dup = pa.Table.from_pydict({
        "doc_id": pa.array([7, 7], pa.int64()),
        "text": pa.array(["x", "y"], pa.string())})
    other = pa.Table.from_pydict({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["z"], pa.string())})
    with pytest.raises(Exception, match="unique per side"):
        bucket_diff(ray.data.from_arrow(dup),
                    ray.data.from_arrow(other)).take_all()


def test_bucket_diff_identical_tables_empty(ray_session):
    import ray.data

    from nerfray.ops.integrity import bucket_diff
    t = pa.Table.from_pydict({
        "doc_id": pa.array(range(100), pa.int64()),
        "text": pa.array([f"t {i}" for i in range(100)], pa.string())})
    a = ray.data.from_arrow(t)
    b = ray.data.from_arrow(t).repartition(5)
    assert bucket_diff(a, b).count() == 0


def test_checksum_sql_mirror_fuzz(ray_session):
    """The UHUGEINT splitmix chain must match the kernel bit-for-bit
    on adversarial content: unicode (length = code points, not bytes),
    empty strings, consecutive-space word splits, and doc_ids near the
    int64 edge of the signed/unsigned view."""
    import duckdb
    import ray.data

    from nerfray.ops.integrity import CHECKSUM_SQL, table_checksum

    texts = ["", " ", "  ", "héllo wörld", "日本語 テスト",
             "a  b   c", "x" * 5000, "tab\tnot split", "trailing ",
             " leading", "emoji 🎉 mix", "one"]
    ids = [0, 1, 2, 63, 64, 65, 2**31, 2**40, 2**62,
           2**63 - 1, 12345, 999]
    t = pa.Table.from_pydict({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())})
    got = table_checksum(ray.data.from_arrow(t).repartition(4)) \
        .to_pandas().sort_values("bucket").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(CHECKSUM_SQL).df()
    assert got["bucket"].tolist() == want["bucket"].tolist()
    assert got["n_rows"].tolist() == want["n_rows"].tolist()
    assert got["checksum"].tolist() == want["checksum"].tolist()


def test_covered_time_sql_mirror_fuzz(ray_session):
    """Window-SQL mirror vs the band-trick kernel on adversarial
    intervals: nested, identical-lo ties, exact-touch boundaries."""
    import duckdb
    import ray.data

    from nerfray.ops import events as ev

    rng = np.random.default_rng(33)
    n = 300
    t = pa.Table.from_pydict({
        "user_id": pa.array(rng.integers(0, 5, n), pa.int64()),
        "ts": pa.array(
            rng.integers(0, 50, n) * 1_800_000_000,  # coarse: many ties
            pa.timestamp("us")),
        "value": pa.array(np.round(rng.uniform(0, 3, n), 2), pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    got = ds.map_batches(ev._user_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(ev._covered_bucket,
                                  batch_format="pyarrow") \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("events", t)
    want = con.execute(ev.ORACLES["events_covered_time"]).df()
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["covered_us"].tolist() == want["covered_us"].tolist()
    assert got["n_islands"].tolist() == want["n_islands"].tolist()
