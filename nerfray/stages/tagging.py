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


def spans_to_batch(batch: pa.Table, spans_per_row) -> pa.Table:
    """Expand per-unit span lists into the flat SPAN_SCHEMA table.
    Carry columns replicate via one vectorized ``pc.take`` over a
    repeat-index (the list-flatten emit pattern) instead of per-span
    Python appends; only the ragged span fields remain comprehensions."""
    import numpy as np
    import pyarrow.compute as pc

    spans_list = [list(s) for s in spans_per_row]
    counts = np.fromiter((len(s) for s in spans_list), dtype=np.int64,
                         count=len(spans_list))
    parent = pa.array(np.repeat(np.arange(len(spans_list)), counts))
    texts = batch.column("text").to_pylist()
    flat = [(sp, texts[r]) for r, spans in enumerate(spans_list)
            for sp in spans]
    arrays = [pc.take(batch.column(name), parent) for name in CARRY]
    arrays += [
        pa.array([sp.label for sp, _ in flat], pa.string()),
        pa.array([sp.start for sp, _ in flat], pa.int32()),
        pa.array([sp.end for sp, _ in flat], pa.int32()),
        pa.array([sp.depth for sp, _ in flat], pa.int32()),
        pa.array([t[sp.start:sp.end] for sp, t in flat], pa.string()),
    ]
    return pa.Table.from_arrays(arrays, schema=SPAN_SCHEMA)


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

    def _tag(self, text: str) -> list:
        spans = self._cache.get(text)
        if spans is None:
            if len(self._cache) >= self.CACHE_MAX:
                self._cache.clear()
            spans = self.tagger.tag(text)
            self._cache[text] = spans
        return spans

    def __call__(self, batch: pa.Table) -> pa.Table:
        return spans_to_batch(
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
