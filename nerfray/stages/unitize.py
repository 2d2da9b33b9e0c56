"""Stage U: corpus rows -> bounded tagging units + per-row sha256.

The reference treats one line as one sentence (raw-text mode,
/root/reference/app/Main.hs:277-280); we mirror that at the file grain:
``content`` is split into lines, each line is one CRF unit. The full
``content`` string never flows past this stage — downstream rows carry
``content_sha`` (the per-row invariant of BASELINE.json input_hint) plus
the unit text, so the wide column stays out of every shuffle
(SURVEY.md §7.4.6).

Units are additionally capped at ``max_unit_chars`` so Viterbi cost per
unit is bounded even on pathological single-line files (SURVEY.md §4
"stragglers").
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

UNIT_SCHEMA = pa.schema([
    ("repo", pa.string()),
    ("path", pa.string()),
    ("lang", pa.string()),
    ("content_sha", pa.string()),
    ("unit_id", pa.int32()),
    ("text", pa.string()),
    # True when the unit text was cut at max_unit_chars. content_sha is
    # ALWAYS the sha of the full content, so the sha<->text
    # reconstruction invariant holds only for rows with truncated=False
    # (tests/test_ray_pipeline.py::test_unit_truncation_flag).
    ("truncated", pa.bool_()),
])

MAX_UNIT_CHARS = 4096


def sha256_hex(batch: pa.Table, column: str = "content") -> pa.Table:
    """Append ``content_sha`` = sha256 hex of ``column`` (stateless map)."""
    shas = [hashlib.sha256(s.encode()).hexdigest() if s is not None else None
            for s in batch.column(column).to_pylist()]
    return batch.append_column("content_sha", pa.array(shas, pa.string()))


def unitize(batch: pa.Table, *, max_unit_chars: int = MAX_UNIT_CHARS) -> pa.Table:
    """Explode corpus rows into unit rows (flat_map semantics in one
    vectorized batch op). Uses Arrow ``split_pattern`` + list flattening —
    no Python loop over characters."""
    batch = sha256_hex(batch)
    lines = pc.split_pattern(
        pc.cast(batch.column("content"), pa.large_string()), "\n")
    counts = pc.list_value_length(lines).to_numpy(zero_copy_only=False)

    # parent index per exploded line
    import numpy as np
    parent = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    unit_id = np.concatenate(
        [np.arange(c, dtype=np.int32) for c in counts]) if len(counts) else \
        np.array([], dtype=np.int32)

    flat = pc.list_flatten(lines)
    texts = pc.cast(flat, pa.string())
    # bound unit length (straggler cap); truncation is deterministic and
    # flagged so consumers know the sha(content) invariant is scoped
    truncated = pc.greater(pc.utf8_length(texts), max_unit_chars)
    texts = pc.utf8_slice_codeunits(texts, 0, max_unit_chars)

    take = lambda name: pc.take(batch.column(name), pa.array(parent))
    return pa.Table.from_arrays(
        [take("repo"), take("path"), take("lang"), take("content_sha"),
         pa.array(unit_id, pa.int32()), texts, truncated],
        schema=UNIT_SCHEMA)


def unit_counts(batch: pa.Table) -> pa.Table:
    """Per-file unit/byte accounting (partial agg for pipeline counters)."""
    batch = sha256_hex(batch)
    n_units = pc.list_value_length(
        pc.split_pattern(pc.cast(batch.column("content"), pa.large_string()),
                         "\n"))
    return pa.Table.from_arrays(
        [batch.column("repo"), batch.column("path"),
         batch.column("content_sha"), pc.cast(n_units, pa.int64()),
         pc.cast(pc.utf8_length(batch.column("content")), pa.int64())],
        names=["repo", "path", "content_sha", "n_units", "n_chars"])
