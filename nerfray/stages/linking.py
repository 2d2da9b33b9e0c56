"""Stage L: entity linking actor pool (broadcast alias dictionaries,
SURVEY.md §2.4 J1 generalized per BASELINE.json north_star).

Candidate generation is a point lookup into the alias table (broadcast
small side: ``ray.put`` once, resident per actor — never a shuffle join);
link scoring is argmax candidate weight among label-compatible candidates
(nerfray.dicts.link). Spans with no candidate (feature-only labels like
``vendor``) are dropped here.
"""

from __future__ import annotations

import pyarrow as pa
import ray

from .. import dicts

LINKED_SCHEMA = pa.schema([
    ("repo", pa.string()),
    ("path", pa.string()),
    ("content_sha", pa.string()),
    ("unit_id", pa.int32()),
    ("label", pa.string()),
    ("start", pa.int32()),
    ("end", pa.int32()),
    ("surface", pa.string()),
    ("canon_id", pa.string()),
    ("link_score", pa.float64()),
])


class LinkSpans:
    """Span rows -> linked-span rows (canon_id + score); unlinkable dropped."""

    def __init__(self, aliases_ref=None):
        if aliases_ref is None:
            self.aliases = dicts.alias_table()
        else:
            self.aliases = ray.get(aliases_ref) \
                if isinstance(aliases_ref, ray.ObjectRef) else aliases_ref

    CACHE_MAX = 500_000

    def __call__(self, batch: pa.Table) -> pa.Table:
        labels = batch.column("label").to_pylist()
        surfaces = batch.column("surface").to_pylist()
        keep, canons, scores = [], [], []
        link, aliases = dicts.link, self.aliases
        cache = getattr(self, "_cache", None)
        if cache is None:
            cache = self._cache = {}
        for i, (lbl, surf) in enumerate(zip(labels, surfaces)):
            key = (surf, lbl)
            hit = cache.get(key)
            if hit is None:
                if len(cache) >= self.CACHE_MAX:
                    cache.clear()
                hit = cache[key] = link(surf, lbl, aliases)
            canon, score = hit
            if canon is not None:
                keep.append(i)
                canons.append(canon)
                scores.append(score)
        idx = pa.array(keep, pa.int64())
        taken = batch.take(idx)
        arrays = [taken.column(n) for n in
                  ("repo", "path", "content_sha", "unit_id", "label",
                   "start", "end", "surface")]
        arrays += [pa.array(canons, pa.string()),
                   pa.array(scores, pa.float64())]
        return pa.Table.from_arrays(arrays, schema=LINKED_SCHEMA)
