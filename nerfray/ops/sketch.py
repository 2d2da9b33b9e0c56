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


ORACLES = {
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
}
