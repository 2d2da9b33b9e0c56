"""Stage T: CRF tagging actor pool (the reference's resident-model server,
/root/reference/src/NLP/Nerf/Server.hs:32-48, re-expressed as
``map_batches(TagUnits, concurrency=...)`` — SURVEY.md §2.3 ST1/ST2).

The model artifact (CRF weights + vocab + SchemaConf) is put in the object
store ONCE (``ray.put``) and each actor deserializes it ONCE in
``__init__`` — never per batch. ``__call__`` fuses
tokenize -> schematize -> Viterbi -> IOB-decode per unit, so the wide
observation intermediate never leaves the worker (SURVEY.md §1.2).
"""

from __future__ import annotations

import pyarrow as pa
import ray

from .. import model as model_mod

SPAN_SCHEMA = pa.schema([
    ("repo", pa.string()),
    ("path", pa.string()),
    ("lang", pa.string()),
    ("content_sha", pa.string()),
    ("unit_id", pa.int32()),
    ("label", pa.string()),
    ("start", pa.int32()),
    ("end", pa.int32()),
    ("depth", pa.int32()),
    ("surface", pa.string()),
])

CARRY = ("repo", "path", "lang", "content_sha", "unit_id")


def span_arrays(spans, text: str):
    """One unit's spans as column-shaped arrays (labels, starts, ends,
    depths, surfaces) — computed ONCE per distinct text and memoized by
    the tagger cache, so the batch emit is pure concatenation."""
    import numpy as np
    n = len(spans)
    return (
        [sp.label for sp in spans],
        np.fromiter((sp.start for sp in spans), np.int32, n),
        np.fromiter((sp.end for sp in spans), np.int32, n),
        np.fromiter((sp.depth for sp in spans), np.int32, n),
        [text[sp.start:sp.end] for sp in spans],
    )


def arrays_to_batch(batch: pa.Table, arrays_per_row) -> pa.Table:
    """Expand per-unit span-array tuples into the flat SPAN_SCHEMA
    table.  Carry columns replicate via one vectorized ``pc.take``
    over a repeat-index; span fields are np.concatenate / list-extend
    over the (cache-shared) per-text arrays — no per-span attribute
    walk in the batch path."""
    import numpy as np
    import pyarrow.compute as pc

    rows = list(arrays_per_row)
    counts = np.fromiter((len(a[0]) for a in rows), dtype=np.int64,
                         count=len(rows))
    parent = pa.array(np.repeat(np.arange(len(rows)), counts))
    empty_i = np.array([], np.int32)
    arrays = [pc.take(batch.column(name), parent) for name in CARRY]
    arrays += [
        pa.array([lb for a in rows for lb in a[0]], pa.string()),
        pa.array(np.concatenate([a[1] for a in rows]) if rows
                 else empty_i, pa.int32()),
        pa.array(np.concatenate([a[2] for a in rows]) if rows
                 else empty_i, pa.int32()),
        pa.array(np.concatenate([a[3] for a in rows]) if rows
                 else empty_i, pa.int32()),
        pa.array([s for a in rows for s in a[4]], pa.string()),
    ]
    return pa.Table.from_arrays(arrays, schema=SPAN_SCHEMA)


def spans_to_batch(batch: pa.Table, spans_per_row) -> pa.Table:
    """Span-object variant of ``arrays_to_batch`` (non-cached taggers)."""
    texts = batch.column("text").to_pylist()
    return arrays_to_batch(
        batch, (span_arrays(list(s), texts[r])
                for r, s in enumerate(spans_per_row)))


class TagUnits:
    """Actor-pool callable: unit rows -> span rows (char offsets + surface).

    ``model_ref`` may be a ``ray.ObjectRef`` to the artifact bytes (the
    broadcast path) or raw bytes (tests / driver-side use).

    Source-code unit texts are massively repetitive (the same ``import x``
    line occurs across thousands of files), so each actor memoizes
    tag(text) in a bounded content-addressed cache — the streaming,
    shuffle-free form of "dedup units before tagging". The cache resets
    when full, keeping memory bounded regardless of corpus size; results
    are identical with or without it (pure function of text).
    """

    CACHE_MAX = 200_000

    def __init__(self, model_ref):
        blob = ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) \
            else model_ref
        crf, conf = model_mod.deserialize(blob)
        self.tagger = model_mod.Tagger(crf, conf)
        self._cache: dict[str, list] = {}

    def _tag(self, text: str):
        arrs = self._cache.get(text)
        if arrs is None:
            if len(self._cache) >= self.CACHE_MAX:
                self._cache.clear()
            arrs = span_arrays(self.tagger.tag(text), text)
            self._cache[text] = arrs
        return arrs

    def __call__(self, batch: pa.Table) -> pa.Table:
        return arrays_to_batch(
            batch, (self._tag(t) for t in batch.column("text").to_pylist()))


class TagUnitsRule:
    """Deterministic pattern tagger over the same span schema (distant-
    supervision baseline; fully SQL-oracled pipeline variant)."""

    def __init__(self):
        self.tagger = model_mod.RuleTagger()

    def __call__(self, batch: pa.Table) -> pa.Table:
        tag = self.tagger.tag
        return spans_to_batch(batch,
                              (tag(t) for t in batch.column("text").to_pylist()))
