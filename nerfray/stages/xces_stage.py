"""XCES annotation as a Ray stage (SURVEY.md §2.1 S4/S5 at pipeline
grain): unit rows -> XCES sentence chunks -> CRF-annotated chunks with
nested <group type=...> elements.

The actor holds the tagger (resident model) and drives the kernel's
``ner_xces`` with it — the reference's ``nerXCES (ner nerf)`` composition
(/root/reference/app/Main.hs:281-283) as an actor pool.
"""

from __future__ import annotations

import pyarrow as pa
import ray

from .. import model as model_mod
from ..core import xces
from ..core.tokenize import tokenize

XCES_SCHEMA = pa.schema([
    ("repo", pa.string()),
    ("path", pa.string()),
    ("content_sha", pa.string()),
    ("unit_id", pa.int32()),
    ("xml", pa.string()),
    ("n_groups", pa.int32()),
])


class AnnotateXces:
    """unit rows -> annotated XCES chunk rows."""

    def __init__(self, model_ref):
        blob = ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) \
            else model_ref
        crf, conf = model_mod.deserialize(blob)
        self.tagger = model_mod.Tagger(crf, conf)

    def __call__(self, batch: pa.Table) -> pa.Table:
        xmls, counts = [], []
        for text in batch.column("text").to_pylist():
            chunk = xces.sent_to_xces(text, tokenize)
            annotated = xces.ner_xces(chunk, self.tagger.tag)
            xmls.append(annotated)
            counts.append(annotated.count("<group "))
        return pa.Table.from_arrays(
            [batch.column("repo"), batch.column("path"),
             batch.column("content_sha"), batch.column("unit_id"),
             pa.array(xmls, pa.string()), pa.array(counts, pa.int32())],
            schema=XCES_SCHEMA)


def annotate_xces(units: ray.data.Dataset,
                  concurrency=(1, 8)) -> ray.data.Dataset:
    model_ref = ray.put(model_mod.model_artifact())
    return units.map_batches(AnnotateXces,
                             fn_constructor_kwargs={"model_ref": model_ref},
                             concurrency=concurrency, batch_size=512,
                             batch_format="pyarrow")
