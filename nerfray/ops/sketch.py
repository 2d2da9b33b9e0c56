"""HyperLogLog approximate distinct counting (Flajolet et al. 2007) —
the 100-TB cardinality primitive: per-block register partials shrink
each block to <= 2^p rows before the only shuffle, so counting
distincts over an arbitrarily large Dataset moves O(blocks * 2^p)
tiny integer rows instead of the values themselves.

Oracle design (the repo's sha-mirror pattern, cf. ``ops/dedup.sha64``):
values are hashed with the first 8 bytes of sha256, so the REGISTER
TABLE — the entire distributed computation — is exactly recomputable in
DuckDB (hex-prefix cast + ``length(bin(w))`` = Python ``bit_length``).
The float estimate is a driver-side formula over <= 2^p integers; its
accuracy (not its bits) is pinned by a pytest against exact distinct
counts.  At extreme scale swap sha256 for a cheap 64-bit mixer (same
structure, no SQL mirror).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from .dedup import sha64

HLL_P = 6                      # 2^6 = 64 registers (~13% rel. error)
_M = 1 << HLL_P
_WBITS = 64 - HLL_P
_WMASK = (1 << _WBITS) - 1


def _rho(h: int) -> tuple[int, int]:
    """(register, leading-zero rank of the remaining 58 bits)."""
    reg = h >> _WBITS
    w = h & _WMASK
    rho = (_WBITS + 1) if w == 0 else _WBITS - w.bit_length() + 1
    return reg, rho


def _register_partial(batch: pa.Table, *, column: str,
                      group: str | None) -> pa.Table:
    """Per-block register maxima: <= 2^p rows out per (block, group) —
    the combiner that keeps the shuffle tiny. sha256 per value is the
    oracle-computable hash (a Python-level call either way); the
    register bookkeeping is O(1) per row."""
    vals = batch.column(column).to_pylist()
    gs = batch.column(group).to_pylist() if group else [None] * len(vals)
    best: dict[tuple, int] = {}
    for g, v in zip(gs, vals):
        reg, rho = _rho(sha64(str(v)))
        key = (g, reg)
        if rho > best.get(key, 0):
            best[key] = rho
    keys = sorted(best)
    out = {
        "register": pa.array([k[1] for k in keys], pa.int64()),
        "rho": pa.array([best[k] for k in keys], pa.int64()),
    }
    if group:
        # explicit type: an empty block must not emit a null-typed
        # group column (schema mismatch at the downstream groupby)
        out = {group: pa.array([k[0] for k in keys],
                               batch.schema.field(group).type)} | out
    return pa.Table.from_pydict(out)


def hll_registers(ds: ray.data.Dataset, column: str, *,
                  group: str | None = None) -> ray.data.Dataset:
    """Global (or per-``group``) HLL register table:
    (group?, register, rho_max). Only register partials shuffle."""
    cols = [column] + ([group] if group else [])
    partials = ds.select_columns(cols).map_batches(
        _register_partial, fn_kwargs={"column": column, "group": group},
        batch_format="pyarrow", zero_copy_batch=True)
    keys = ([group] if group else []) + ["register"]
    return partials.groupby(keys).max("rho") \
        .rename_columns({"max(rho)": "rho_max"})


def hll_estimate(registers: list[tuple[int, int]]) -> float:
    """Standard HLL estimate from (register, rho_max) rows, with the
    small-range linear-counting correction."""
    m = _M
    regs = np.zeros(m, dtype=np.int64)
    for reg, rho in registers:
        regs[reg] = rho
    # small-m constants from Flajolet et al.; asymptotic formula beyond
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds: ray.data.Dataset, column: str) -> float:
    """Approximate COUNT(DISTINCT column) — the driver sees <= 2^p
    integer rows regardless of input size."""
    rows = hll_registers(ds, column).take_all()
    return hll_estimate([(r["register"], r["rho_max"]) for r in rows])


# ---------------------------------------------------------------------------
# mergeable approximate quantiles
# ---------------------------------------------------------------------------
#
# The beyond-one-bucket companion to ops/relational.py's EXACT grouped
# quantiles (which co-locate each group's values in one task): every
# block compresses its sorted values to <= s weighted points (chunk
# max, chunk weight), summaries merge associatively, and the rank
# error of any answer is bounded by sum over blocks of ceil(n_b/s) —
# <= n/s + n_blocks, regardless of how large a group grows.  s rows
# per (block, group) is ALL that ever shuffles.

Q_SUMMARY_S = 256


def _summary_partial(batch: pa.Table, *, column: str,
                     group: str | None, s: int) -> pa.Table:
    gt = (batch.schema.field(group).type if group else pa.int64())
    out_fields = ([pa.field("g", gt)] if group else []) + [
        pa.field("v", pa.float64()), pa.field("w", pa.int64())]
    out_schema = pa.schema(out_fields)
    if batch.num_rows == 0:
        return out_schema.empty_table()
    v = batch.column(column).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    if group:
        g = batch.column(group).to_numpy(zero_copy_only=False)
        order = np.lexsort((v, g))
        g_s, v_s = g[order], v[order]
        starts = np.flatnonzero(np.r_[True, g_s[1:] != g_s[:-1]])
        ends = np.r_[starts[1:], len(v_s)]
    else:
        v_s = np.sort(v)
        g_s = None
        starts, ends = np.array([0]), np.array([len(v_s)])
    out_g: list = []
    out_v: list = []
    out_w: list = []
    for st, en in zip(starts, ends):
        n = en - st
        n_chunks = min(s, n)
        bounds = st + np.ceil(np.arange(1, n_chunks + 1)
                              * (n / n_chunks)).astype(np.int64)
        prev = np.r_[st, bounds[:-1]]
        out_v.append(v_s[bounds - 1])          # chunk max
        out_w.append(bounds - prev)            # chunk weight
        if group:
            out_g.append(np.repeat(g_s[st], n_chunks))
    cols = {}
    if group:
        cols["g"] = pa.array(np.concatenate(out_g), gt)
    cols["v"] = pa.array(np.concatenate(out_v), pa.float64())
    cols["w"] = pa.array(np.concatenate(out_w), pa.int64())
    return pa.Table.from_pydict(cols, schema=out_schema)


def _merge_quantiles(group: pa.Table, *, qs: tuple[float, ...],
                     grouped: bool) -> pa.Table:
    gt = group.schema.field("g").type if grouped else pa.int64()
    out_fields = ([pa.field("g", gt)] if grouped else []) + [
        pa.field("q", pa.float64()), pa.field("value", pa.float64())]
    out_schema = pa.schema(out_fields)
    if group.num_rows == 0:
        return out_schema.empty_table()
    v = group.column("v").to_numpy(zero_copy_only=False)
    w = group.column("w").to_numpy(zero_copy_only=False)
    if grouped:
        g = group.column("g").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, g))
        g_s, v_s, w_s = g[order], v[order], w[order]
        starts = np.flatnonzero(np.r_[True, g_s[1:] != g_s[:-1]])
    else:
        order = np.argsort(v, kind="stable")
        v_s, w_s = v[order], w[order]
        g_s = np.zeros(len(v_s), np.int64)
        starts = np.array([0])
    ends = np.r_[starts[1:], len(v_s)]
    run = np.cumsum(np.r_[False, g_s[1:] != g_s[:-1]] if grouped
                    else np.zeros(len(v_s), bool))
    cum = np.cumsum(w_s)
    base = np.r_[0, cum[ends[:-1] - 1]]
    cum_in = cum - base[run]
    tot = cum_in[ends - 1]
    og, oq, ov = [], [], []
    idx = np.arange(len(v_s))
    for q in qs:
        target = np.ceil(q * tot).clip(min=1)
        hit = cum_in >= target[run]
        first = np.minimum.reduceat(np.where(hit, idx, len(v_s)), starts)
        og.append(g_s[starts])
        oq.append(np.full(len(starts), q))
        ov.append(v_s[first])
    cols = {}
    if grouped:
        cols["g"] = pa.array(np.concatenate(og), gt)
    cols["q"] = pa.array(np.concatenate(oq), pa.float64())
    cols["value"] = pa.array(np.concatenate(ov), pa.float64())
    return pa.Table.from_pydict(cols, schema=out_schema)


def approx_quantiles(ds: ray.data.Dataset, column: str, *,
                     qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                     group: str | None = None,
                     s: int = Q_SUMMARY_S) -> ray.data.Dataset:
    """(group?, q, value) with rank error <= n/s + n_blocks per group;
    percentile_disc-style (value is an actual data point, first one
    whose cumulative weight reaches ceil(q*n)).  When every (block,
    group) run has <= s rows the summaries are LOSSLESS chunks of one
    and the answer equals exact percentile_disc."""
    cols = [column] + ([group] if group else [])
    partials = ds.select_columns(cols).map_batches(
        _summary_partial,
        fn_kwargs={"column": column, "group": group, "s": s},
        batch_format="pyarrow", zero_copy_batch=True)
    if group:
        import pyarrow.compute as pc

        def _kb(batch: pa.Table) -> pa.Table:
            if pa.types.is_integer(batch.schema.field("g").type):
                hb = pc.cast(pc.bit_wise_and(batch.column("g"), 63),
                             pa.int32())
            else:
                import pandas as pd
                arr = np.asarray(batch.column("g").to_pylist(),
                                 dtype=object)
                hb = pa.array((pd.util.hash_array(arr) % 64)
                              .astype(np.int32), pa.int32())
            return batch.append_column("hb", hb)

        merged = partials.map_batches(_kb, batch_format="pyarrow") \
            .groupby("hb").map_groups(
            _merge_quantiles, fn_kwargs={"qs": qs, "grouped": True},
            batch_format="pyarrow")
        return merged.rename_columns({"g": group})

    def _one(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "hb", pa.array(np.zeros(batch.num_rows, np.int32), pa.int32()))

    return partials.map_batches(_one, batch_format="pyarrow") \
        .groupby("hb").map_groups(
        _merge_quantiles, fn_kwargs={"qs": qs, "grouped": False},
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------
#
# The point-frequency companion to the HLL registers: every block
# collapses its token counts into a D x W counter grid (<= D*W rows
# out per block, independent of vocabulary), grids merge by plain
# addition — so the ONLY shuffle is cell-grain.  Same oracle pattern
# as HLL: cells are addressed by sha256-prefix hashes, so the merged
# register table is exactly recomputable in DuckDB; the min-over-rows
# point estimate is a driver-side formula pinned by pytest
# (estimate >= exact count always; tight for heavy words).

CMS_D = 4
CMS_W = 256


def _cms_cols(words: np.ndarray, d: int) -> np.ndarray:
    return np.array([sha64(f"{d}:{w}") % CMS_W for w in words],
                    dtype=np.int64)


def _cms_partial(batch: pa.Table) -> pa.Table:
    out_schema = pa.schema([("d", pa.int64()), ("col", pa.int64()),
                            ("cnt", pa.int64())])
    texts = batch.column("text").to_pylist()
    if not texts:
        return out_schema.empty_table()
    toks = np.concatenate([np.array(t.split(" "), dtype=object)
                           for t in texts])
    words, counts = np.unique(toks, return_counts=True)
    ds_, cols_, cnts_ = [], [], []
    for d in range(CMS_D):
        grid = np.zeros(CMS_W, dtype=np.int64)
        np.add.at(grid, _cms_cols(words, d), counts)
        nz = np.flatnonzero(grid)
        ds_.append(np.full(len(nz), d, np.int64))
        cols_.append(nz)
        cnts_.append(grid[nz])
    return pa.Table.from_pydict({
        "d": pa.array(np.concatenate(ds_), pa.int64()),
        "col": pa.array(np.concatenate(cols_), pa.int64()),
        "cnt": pa.array(np.concatenate(cnts_), pa.int64()),
    }, schema=out_schema)


def cms_registers(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Merged (d, col, cnt) Count-Min grid over all tokens."""
    return docs.select_columns(["text"]).map_batches(
        _cms_partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["d", "col"]).sum("cnt") \
        .rename_columns({"sum(cnt)": "cnt"})


def cms_estimate(registers: list[tuple[int, int, int]], word: str) -> int:
    """Point-frequency upper bound: min over rows of the word's cell."""
    grid = {}
    for d, col, cnt in registers:
        grid[(d, col)] = cnt
    return min(grid.get((d, int(sha64(f"{d}:{word}") % CMS_W)), 0)
               for d in range(CMS_D))


def docs_cms_registers(sf_dir: str) -> ray.data.Dataset:
    import os

    from nerfray.sources.parquet import read_parquet_clean
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["text"])
    return cms_registers(docs)


CMS_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
wc AS (SELECT w, count(*)::BIGINT AS cnt FROM toks GROUP BY w),
cells AS (
  SELECT d,
         (('0x' || substr(sha256(d::VARCHAR || ':' || w), 1, 16))::UBIGINT
          % {CMS_W})::BIGINT AS col,
         cnt
  FROM wc, unnest(generate_series(0, {CMS_D - 1})) AS t(d)
)
SELECT d::BIGINT AS d, col, sum(cnt)::BIGINT AS cnt
FROM cells GROUP BY d, col ORDER BY d, col
"""


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (frequent items)
# ---------------------------------------------------------------------------
#
# The bounded-shuffle companion to ops/text.top_words (which shuffles
# one row per distinct word per block — the whole vocabulary): each
# block compresses its token counts to <= k Misra-Gries counters
# (subtract the (k+1)-th largest block count; per-word undercount
# <= n_b/(k+1)), so the union of block summaries — <= k rows per
# block, REGARDLESS of vocabulary size — provably contains every word
# with global count > n/(k+1) (summed undercounts <= n/(k+1), cf.
# Misra & Gries 1982; mergeability per Agarwal et al., PODS'12).  A
# second pass counts ONLY the bounded candidate set exactly, so the
# final answer (words with cnt*(k+1) > n) is EXACT — hence the full
# SQL oracle below, which brute-forces the same threshold over all
# words.

MG_K = 199          # counters per block -> phi = 1/200 of all tokens
_MG_SENTINEL = "\x00total"   # space-split tokens can never contain \x00


def _mg_partial(batch: pa.Table, *, k: int) -> pa.Table:
    """<= k (word, lower-bound) Misra-Gries counters per block."""
    out_schema = pa.schema([("word", pa.string()), ("lower", pa.int64())])
    texts = batch.column("text").to_pylist()
    if not texts:
        return out_schema.empty_table()
    toks = np.concatenate([np.array(t.split(" "), dtype=object)
                           for t in texts])
    words, counts = np.unique(toks, return_counts=True)
    if len(words) > k:
        kth = np.partition(counts, -(k + 1))[-(k + 1)]
        lower = counts - kth
        keep = lower > 0
        words, lower = words[keep], lower[keep]
    else:
        lower = counts
    return pa.Table.from_pydict({
        "word": pa.array(words, pa.string()),
        "lower": pa.array(lower, pa.int64()),
    }, schema=out_schema)


def heavy_hitter_words(docs: ray.data.Dataset, *,
                       k: int = MG_K) -> ray.data.Dataset:
    """(word, cnt) for every word whose token count exceeds n/(k+1) —
    exact, via MG-candidate pruning: only <= k rows per block plus the
    bounded candidate counts ever shuffle.  The driver holds the
    candidate set (<= k * n_blocks rows, independent of vocabulary and
    corpus size)."""
    summaries = docs.select_columns(["text"]).map_batches(
        _mg_partial, fn_kwargs={"k": k},
        batch_format="pyarrow", zero_copy_batch=True)
    cands = np.unique(np.asarray(
        [r["word"] for r in summaries.select_columns(["word"]).take_all()],
        dtype=object))

    def _exact_partial(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([("word", pa.string()),
                                ("cnt", pa.int64())])
        texts = batch.column("text").to_pylist()
        if not texts:
            return out_schema.empty_table()
        toks = np.concatenate([np.array(t.split(" "), dtype=object)
                               for t in texts])
        hits = toks[np.isin(toks, cands)]
        words, counts = np.unique(hits, return_counts=True)
        return pa.Table.from_pydict({
            "word": pa.array(np.r_[words, [_MG_SENTINEL]], pa.string()),
            "cnt": pa.array(np.r_[counts, [len(toks)]], pa.int64()),
        }, schema=out_schema)

    def _one(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "g", pa.array(np.zeros(batch.num_rows, np.int32), pa.int32()))

    def _final(group: pa.Table) -> pa.Table:
        out_schema = pa.schema([("word", pa.string()),
                                ("cnt", pa.int64())])
        if group.num_rows == 0:
            return out_schema.empty_table()
        words = np.asarray(group.column("word").to_pylist(), dtype=object)
        cnt = group.column("cnt").to_numpy(zero_copy_only=False)
        total = int(cnt[words == _MG_SENTINEL].sum())
        keep = (words != _MG_SENTINEL) & (cnt * (k + 1) > total)
        order = np.argsort(words[keep].astype(str), kind="stable")
        return pa.Table.from_pydict({
            "word": pa.array(words[keep][order], pa.string()),
            "cnt": pa.array(cnt[keep][order], pa.int64()),
        }, schema=out_schema)

    # candidate-grain rows (bounded) -> exact global counts -> one
    # bounded final group applies the threshold
    return docs.select_columns(["text"]).map_batches(
        _exact_partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("word").sum("cnt").rename_columns({"sum(cnt)": "cnt"}) \
        .map_batches(_one, batch_format="pyarrow") \
        .groupby("g").map_groups(_final, batch_format="pyarrow")


def docs_heavy_hitters(sf_dir: str) -> ray.data.Dataset:
    """Exact phi=1/(k+1) frequent words over the documents table via
    the two-pass Misra-Gries pipeline."""
    import os

    from nerfray.sources.parquet import read_parquet_clean
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["text"])
    return heavy_hitter_words(docs)


HEAVY_HITTERS_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
tot AS (SELECT count(*) AS n FROM toks),
c AS (SELECT word, count(*)::BIGINT AS cnt FROM toks GROUP BY word)
SELECT word, cnt FROM c, tot WHERE cnt * {MG_K + 1} > n ORDER BY word
"""


# ---------------------------------------------------------------------------
# query surface
# ---------------------------------------------------------------------------


def custkey_registers_by_status(sf_dir: str) -> ray.data.Dataset:
    """Per-orderstatus HLL registers of distinct customers — the grouped
    sketch a 100-TB rollup would keep instead of exact distinct sets."""
    import os

    from nerfray.sources.parquet import read_parquet_clean
    orders = read_parquet_clean(os.path.join(sf_dir, "orders.parquet"),
                                columns=["o_orderstatus", "o_custkey"])
    return hll_registers(orders, "o_custkey", group="o_orderstatus")


def hourly_user_registers(sf_dir: str) -> ray.data.Dataset:
    """Per-hour HLL registers of distinct users — the windowed sketch a
    streaming rollup keeps: one tiny register row set per window instead
    of the window's user sets."""
    import os

    import pyarrow.compute as pc

    from nerfray.sources.parquet import read_parquet_clean
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["ts", "user_id"])

    def _hour(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "hour": pc.strftime(batch.column("ts"), format="%Y-%m-%d %H"),
            "user_id": batch.column("user_id"),
        })

    return hll_registers(ev.map_batches(_hour, batch_format="pyarrow"),
                         "user_id", group="hour")


def daily_user_registers(sf_dir: str) -> ray.data.Dataset:
    """Daily distinct-user sketch obtained by MERGING the hourly
    register tables (groupby max over registers) — never re-reading the
    raw events. The oracle recomputes the day sketch from raw data, so
    the hash match IS the mergeability proof."""
    import pyarrow.compute as pc

    hourly = hourly_user_registers(sf_dir)

    def _day(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "day": pc.utf8_slice_codeunits(batch.column("hour"), 0, 10),
            "register": batch.column("register"),
            "rho_max": batch.column("rho_max"),
        })

    return hourly.map_batches(_day, batch_format="pyarrow") \
        .groupby(["day", "register"]).max("rho_max") \
        .rename_columns({"max(rho_max)": "rho_max"})


DYADIC_QS = (0.25, 0.5, 0.75)


def _events(sf_dir: str) -> ray.data.Dataset:
    import os

    from nerfray.sources.parquet import read_parquet_clean
    return read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                              columns=["event_type", "value"])


def events_value_quantiles(sf_dir: str) -> ray.data.Dataset:
    """Per-event-type approximate value quantiles at the default
    summary size (rows-only: the compression loss is real; the rank
    error is bounded by the pytest, not an oracle)."""
    return approx_quantiles(_events(sf_dir), "value", qs=DYADIC_QS,
                            group="event_type")


def events_value_quantiles_lossless(sf_dir: str) -> ray.data.Dataset:
    """Same operator with s >= any block size: every chunk is one
    value, the merge is exact percentile_disc for ANY block structure
    -> full SQL oracle of the whole summary+merge pipeline (the
    compression loss is the only thing this cannot see; the error
    pytest covers it)."""
    return approx_quantiles(_events(sf_dir), "value", qs=DYADIC_QS,
                            group="event_type", s=1 << 40)


_Q_SEL = "\nUNION ALL\n".join(
    f"SELECT event_type, {q} AS q, percentile_disc({q}) "
    f"WITHIN GROUP (ORDER BY value) AS value FROM events GROUP BY 1"
    for q in DYADIC_QS)

QUANTILES_LOSSLESS_SQL = f"""
SELECT * FROM ({_Q_SEL}) ORDER BY event_type, q
"""


ORACLES = {
    "events_value_quantiles_lossless": QUANTILES_LOSSLESS_SQL,
    "docs_heavy_hitters": HEAVY_HITTERS_SQL,
    "sketch_cms_words": CMS_SQL,
    "sketch_hll_custkeys": f"""
WITH h AS (
  SELECT o_orderstatus,
         ('0x' || substr(sha256(CAST(o_custkey AS VARCHAR)), 1, 16))::UBIGINT
           AS hv
  FROM orders
), parts AS (
  SELECT o_orderstatus, (hv >> {_WBITS})::BIGINT AS register,
         hv & ((1::UBIGINT << {_WBITS}) - 1) AS w
  FROM h
)
SELECT o_orderstatus, register,
       max(CASE WHEN w = 0 THEN {_WBITS + 1}
                ELSE {_WBITS} - length(bin(w)) + 1 END)::BIGINT AS rho_max
FROM parts GROUP BY o_orderstatus, register
ORDER BY o_orderstatus, register
""",
    "events_hourly_hll": f"""
WITH h AS (
  SELECT strftime(ts, '%Y-%m-%d %H') AS hour,
         ('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT
           AS hv
  FROM events
), parts AS (
  SELECT hour, (hv >> {_WBITS})::BIGINT AS register,
         hv & ((1::UBIGINT << {_WBITS}) - 1) AS w
  FROM h
)
SELECT hour, register,
       max(CASE WHEN w = 0 THEN {_WBITS + 1}
                ELSE {_WBITS} - length(bin(w)) + 1 END)::BIGINT AS rho_max
FROM parts GROUP BY hour, register
ORDER BY hour, register
""",
    # recomputed from RAW data at day grain: equality with the Ray path
    # (which only merges hourly registers) pins sketch mergeability
    "events_daily_hll": f"""
WITH h AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         ('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT
           AS hv
  FROM events
), parts AS (
  SELECT day, (hv >> {_WBITS})::BIGINT AS register,
         hv & ((1::UBIGINT << {_WBITS}) - 1) AS w
  FROM h
)
SELECT day, register,
       max(CASE WHEN w = 0 THEN {_WBITS + 1}
                ELSE {_WBITS} - length(bin(w)) + 1 END)::BIGINT AS rho_max
FROM parts GROUP BY day, register
ORDER BY day, register
""",
}


# ---------------------------------------------------------------------------
# exact heavy-hitter KEYS (join-key skew profiling)
# ---------------------------------------------------------------------------
#
# The diagnostic in front of every skew-salted join: which join keys
# exceed phi = 1/(k+1) of all rows?  Same two-pass exact scheme as
# heavy_hitter_words, specialized to int64 keys: pass 1 emits each
# block's local above-threshold candidates (if a key holds > n/(k+1)
# globally it must hold > n_b/(k+1) in SOME block, so the candidate
# union provably contains every answer; <= k keys per block by
# pigeonhole), pass 2 counts candidates exactly.  Only candidate-grain
# rows ever shuffle; the driver holds <= k x n_blocks ints.

_HH_SENTINEL = np.int64(-1)  # total-row marker (keys are non-negative)


def heavy_hitter_keys(ds: ray.data.Dataset, *, key: str,
                      k: int = 20) -> ray.data.Dataset:
    """(key, cnt) for every key occurring > n/(k+1) times — exact."""

    def _cand(batch: pa.Table) -> pa.Table:
        v = batch.column(key).to_numpy(zero_copy_only=False)
        u, c = np.unique(v, return_counts=True)
        keep = c * (k + 1) > len(v)
        return pa.Table.from_pydict({key: pa.array(u[keep], pa.int64())})

    cands = np.unique(np.asarray(
        [r[key] for r in ds.select_columns([key]).map_batches(
            _cand, batch_format="pyarrow",
            zero_copy_batch=True).take_all()], dtype=np.int64))

    out_schema = pa.schema([(key, pa.int64()), ("cnt", pa.int64())])

    def _exact(batch: pa.Table) -> pa.Table:
        v = batch.column(key).to_numpy(zero_copy_only=False)
        hits = v[np.isin(v, cands)]
        u, c = np.unique(hits, return_counts=True)
        return pa.Table.from_pydict({
            key: pa.array(np.r_[u, [_HH_SENTINEL]], pa.int64()),
            "cnt": pa.array(np.r_[c, [len(v)]], pa.int64()),
        }, schema=out_schema)

    def _one(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "g", pa.array(np.zeros(batch.num_rows, np.int32), pa.int32()))

    def _final(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        ks = group.column(key).to_numpy(zero_copy_only=False)
        cnt = group.column("cnt").to_numpy(zero_copy_only=False)
        total = int(cnt[ks == _HH_SENTINEL].sum())
        keep = (ks != _HH_SENTINEL) & (cnt * (k + 1) > total)
        order = np.argsort(ks[keep], kind="stable")
        return pa.Table.from_pydict({
            key: pa.array(ks[keep][order], pa.int64()),
            "cnt": pa.array(cnt[keep][order], pa.int64()),
        }, schema=out_schema)

    return ds.select_columns([key]).map_batches(
        _exact, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(key).sum("cnt").rename_columns({"sum(cnt)": "cnt"}) \
        .map_batches(_one, batch_format="pyarrow") \
        .groupby("g").map_groups(_final, batch_format="pyarrow")


def planted_hot_user_events(sf_dir: str) -> ray.data.Dataset:
    """events with a planted hot join key: every third event (by
    event_id) is remapped to user 0 (~n/3 of all rows — far above the
    1/21 threshold; the untouched users stay far below). Mirrored
    verbatim in EVENTS_HOT_USERS_SQL."""
    import os

    from nerfray.sources.parquet import read_parquet_clean
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_id", "user_id"])

    def _plant(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "event_id": batch.column("event_id"),
            "user_id": pa.array(np.where(eid % 3 == 0, 0, uid),
                                pa.int64()),
        })

    return ev.map_batches(_plant, batch_format="pyarrow",
                          zero_copy_batch=True)


def events_hot_users(sf_dir: str) -> ray.data.Dataset:
    """Join-key skew profile over the planted-hot-key events table."""
    return heavy_hitter_keys(planted_hot_user_events(sf_dir),
                             key="user_id", k=20)


EVENTS_HOT_USERS_SQL = """
WITH p AS (
  SELECT CASE WHEN event_id % 3 = 0 THEN 0 ELSE user_id END AS user_id
  FROM events),
tot AS (SELECT count(*) AS n FROM p),
c AS (SELECT user_id, count(*)::BIGINT AS cnt FROM p GROUP BY user_id)
SELECT user_id, cnt FROM c, tot WHERE cnt * 21 > n ORDER BY user_id
"""

ORACLES["events_hot_users"] = EVENTS_HOT_USERS_SQL


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k theta) distinct sketch + set algebra
# ---------------------------------------------------------------------------
#
# The sketch behind Apache DataSketches' theta family (Beyer et al.,
# "On Synopses for Distinct-Value Estimation Under Multiset Operations",
# SIGMOD'07): keep the k smallest splitmix64(key) hashes per set; the
# k-th smallest hash h_k estimates the distinct count as (k-1)*2^64/h_k,
# and because bottom-k sketches are closed under union, |A u B| comes
# from merging the candidate rows and |A n B| from the Jaccard of the
# union sketch — WITHOUT ever co-locating the sets themselves.
#
# Shuffle shape: each block emits <= 2k candidate rows (the block-local
# bottom-k of each set's members; the global bottom-k of A u B is a
# subset of bottom-k(A) u bottom-k(B)); ONE constant-key co-group
# merges them. Nothing key-cardinality-proportional moves or reaches
# the driver.  Estimates are INTEGER arithmetic ((k-1)<<64)//h_k, so
# the whole pipeline — flags, sketch membership, and all four
# estimates — replays exactly in DuckDB (UHUGEINT splitmix chain).

KMV_K = 64


def _kmv_partial(batch: pa.Table, *, key: str, set_col: str,
                 a_val: str, b_val: str, k: int) -> pa.Table:
    out_schema = pa.schema([
        pa.field("hh", pa.int64()), pa.field("hl", pa.int64()),
        pa.field("a", pa.int64()), pa.field("b", pa.int64()),
        pa.field("g", pa.int32()),
    ])
    if batch.num_rows == 0:
        return out_schema.empty_table()
    from .dedup import splitmix64
    keys = batch.column(key).to_numpy(zero_copy_only=False)
    sv = np.asarray(batch.column(set_col).to_pylist())
    uniq, inv = np.unique(keys, return_inverse=True)
    af = np.zeros(len(uniq), np.int64)
    bf = np.zeros(len(uniq), np.int64)
    np.maximum.at(af, inv, (sv == a_val).astype(np.int64))
    np.maximum.at(bf, inv, (sv == b_val).astype(np.int64))
    member = (af + bf) > 0
    uniq, af, bf = uniq[member], af[member], bf[member]
    h = splitmix64(uniq.astype(np.uint64))
    order = np.argsort(h, kind="stable")
    h, af, bf = h[order], af[order], bf[order]
    keep = np.zeros(len(h), bool)
    keep[np.flatnonzero(af == 1)[:k]] = True
    keep[np.flatnonzero(bf == 1)[:k]] = True
    h, af, bf = h[keep], af[keep], bf[keep]
    return pa.Table.from_pydict({
        "hh": pa.array((h >> np.uint64(1)).astype(np.int64), pa.int64()),
        "hl": pa.array((h & np.uint64(1)).astype(np.int64), pa.int64()),
        "a": pa.array(af, pa.int64()),
        "b": pa.array(bf, pa.int64()),
        "g": pa.array(np.zeros(len(h), np.int32), pa.int32()),
    })


def _kmv_est(n: int, kth: int, k: int) -> int:
    return n if n < k else ((k - 1) << 64) // kth


def kmv_set_summary(ds: ray.data.Dataset, key: str, set_col: str,
                    a_val: str, b_val: str, *,
                    k: int = KMV_K) -> ray.data.Dataset:
    """Four-row distinct-set summary (set_name, n_k, kth, est) for the
    key sets A = {key : set_col = a_val}, B = {set_col = b_val}, their
    union, and their intersection — sketched, never materialized."""

    def _final(group: pa.Table) -> pa.Table:
        hh = group.column("hh").to_numpy(zero_copy_only=False)
        hl = group.column("hl").to_numpy(zero_copy_only=False)
        af = group.column("a").to_numpy(zero_copy_only=False)
        bf = group.column("b").to_numpy(zero_copy_only=False)
        # global flag OR per hash (a key can surface from different
        # blocks carrying different one-sided flags)
        h = (hh.astype(np.uint64) << np.uint64(1)) | hl.astype(np.uint64)
        uniq, inv = np.unique(h, return_inverse=True)
        ga = np.zeros(len(uniq), np.int64)
        gb = np.zeros(len(uniq), np.int64)
        np.maximum.at(ga, inv, af)
        np.maximum.at(gb, inv, bf)
        # np.unique returns sorted uint64 -> already in hash order
        rows = []

        def _summ(name: str, hs: np.ndarray) -> tuple:
            sk = hs[:k]
            kth = int(sk[-1]) if len(sk) else 0
            n = len(hs)
            return (name, len(sk), kth >> 1,
                    _kmv_est(n, kth, k) if len(sk) else 0)

        rows.append(_summ(a_val, uniq[ga == 1]))
        rows.append(_summ(b_val, uniq[gb == 1]))
        u_name, u_nk, u_kth, u_est = _summ("union", uniq)
        rows.append((u_name, u_nk, u_kth, u_est))
        usk = slice(0, min(k, len(uniq)))
        rho = int(np.sum((ga[usk] == 1) & (gb[usk] == 1)))
        i_est = rho if len(uniq) < k else (rho * u_est) // k
        rows.append(("intersection", rho, u_kth, i_est))
        return pa.Table.from_pydict({
            "set_name": pa.array([r[0] for r in rows], pa.string()),
            "n_k": pa.array([r[1] for r in rows], pa.int64()),
            "kth": pa.array([r[2] for r in rows], pa.int64()),
            "est": pa.array([r[3] for r in rows], pa.int64()),
        })

    return ds.select_columns([key, set_col]).map_batches(
        _kmv_partial,
        fn_kwargs={"key": key, "set_col": set_col,
                   "a_val": a_val, "b_val": b_val, "k": k},
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("g").map_groups(_final, batch_format="pyarrow") \
        .select_columns(["set_name", "n_k", "kth", "est"])


def orders_custkey_kmv(sf_dir: str) -> ray.data.Dataset:
    """Distinct-customer set algebra across order statuses 'O' and 'F'
    via KMV sketches — the 100-TB audience-overlap primitive."""
    import os

    from nerfray.sources.parquet import read_parquet_clean
    orders = read_parquet_clean(os.path.join(sf_dir, "orders.parquet"),
                                columns=["o_custkey", "o_orderstatus"])
    return kmv_set_summary(orders, "o_custkey", "o_orderstatus",
                           "O", "F", k=KMV_K)


_TWO64 = "18446744073709551616"

KMV_SQL = f"""
WITH m AS (
  SELECT o_custkey AS key,
         max(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS a,
         max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS b
  FROM orders WHERE o_orderstatus IN ('O', 'F') GROUP BY o_custkey),
z1 AS (SELECT a, b, ((key::UBIGINT::UHUGEINT + 11400714819323198485)
               % {_TWO64})::UBIGINT AS z FROM m),
z2 AS (SELECT a, b, ((xor(z, z >> 30)::UHUGEINT * 13787848793156543929)
               % {_TWO64})::UBIGINT AS z FROM z1),
z3 AS (SELECT a, b, ((xor(z, z >> 27)::UHUGEINT * 10723151780598845931)
               % {_TWO64})::UBIGINT AS z FROM z2),
hh AS (SELECT a, b, xor(z, z >> 31) AS h FROM z3),
au AS (SELECT h, row_number() OVER (ORDER BY h) AS r,
              count(*) OVER () AS n FROM hh WHERE a = 1),
bu AS (SELECT h, row_number() OVER (ORDER BY h) AS r,
              count(*) OVER () AS n FROM hh WHERE b = 1),
uu AS (SELECT h, a, b, row_number() OVER (ORDER BY h) AS r,
              count(*) OVER () AS n FROM hh),
mk AS (SELECT 'O' AS set_name,
              least(n, {KMV_K})::BIGINT AS n_k,
              max(h) AS kth_full, min(n) AS n_tot
       FROM au WHERE r <= {KMV_K} GROUP BY n
       UNION ALL
       SELECT 'F', least(n, {KMV_K})::BIGINT, max(h), min(n)
       FROM bu WHERE r <= {KMV_K} GROUP BY n
       UNION ALL
       SELECT 'union', least(n, {KMV_K})::BIGINT, max(h), min(n)
       FROM uu WHERE r <= {KMV_K} GROUP BY n),
est AS (SELECT set_name, n_k, (kth_full >> 1)::BIGINT AS kth,
               (CASE WHEN n_tot < {KMV_K} THEN n_tot::UHUGEINT
                     ELSE ({KMV_K - 1}::UHUGEINT * {_TWO64}::UHUGEINT)
                          // kth_full::UHUGEINT END)::BIGINT AS est
        FROM mk),
uest AS (SELECT kth, est FROM est WHERE set_name = 'union'),
inter AS (
  SELECT 'intersection' AS set_name,
         sum(us.a * us.b)::BIGINT AS n_k,
         min(uest.kth)::BIGINT AS kth,
         (CASE WHEN min(us.n) < {KMV_K} THEN sum(us.a * us.b)
               ELSE (sum(us.a * us.b) * min(uest.est)) // {KMV_K}
          END)::BIGINT AS est
  FROM (SELECT * FROM uu WHERE r <= {KMV_K}) us, uest
  GROUP BY uest.est)
SELECT set_name, n_k, kth, est FROM est
UNION ALL SELECT * FROM inter
ORDER BY set_name
"""

ORACLES["sketch_kmv_custkeys"] = KMV_SQL
