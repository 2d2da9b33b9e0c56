"""Distributed evaluation: per-label TP/FP/FN vs gold spans
(the reference's ``compare`` mode, /root/reference/src/NLP/Nerf/Compare.hs;
SURVEY.md §2.5 A1) as a Dataset aggregation:

    per-unit stats inside map_batches (combiner) -> groupby(label).sum

Gold spans for the synthetic corpus are known by construction
(nerfray.corpus.row_lines), so the eval stage re-derives them from the
corpus row index carried in the unit — in a real deployment the gold side
is a second annotated Dataset joined on (content_sha, unit_id)
(SURVEY.md §2.4 J3).
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa
import ray
import ray.data

from .. import corpus as corpus_mod
from .. import model as model_mod
from ..core import compare


class EvalUnits:
    """Actor: tag each corpus row's units and score against gold; emit
    per-label (tp, fp, fn) partials."""

    def __init__(self, model_ref, n: int):
        blob = ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) \
            else model_ref
        crf, conf = model_mod.deserialize(blob)
        self.tagger = model_mod.Tagger(crf, conf)
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        acc: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
        for i in batch.column("id").to_pylist():
            for text, gspans in corpus_mod.row_lines(int(i), self.n):
                pred = self.tagger.tag(text)
                st = compare.unit_stats(
                    text, [(s.label, s.start, s.end) for s in gspans],
                    [(s.label, s.start, s.end) for s in pred])
                for lbl, (tp, fp, fn) in st.items():
                    acc[lbl][0] += tp
                    acc[lbl][1] += fp
                    acc[lbl][2] += fn
        labels = sorted(acc)
        return pa.Table.from_pydict({
            "label": pa.array(labels, pa.string()),
            "tp": pa.array([acc[l][0] for l in labels], pa.int64()),
            "fp": pa.array([acc[l][1] for l in labels], pa.int64()),
            "fn": pa.array([acc[l][2] for l in labels], pa.int64()),
        })


def span_prf(n: int, concurrency=None) -> ray.data.Dataset:
    """Per-label stats over the whole corpus: Dataset of
    (label, tp, fp, fn)."""
    if concurrency is None:
        from ..pipelines.kg import _cluster_cpus
        concurrency = (1, _cluster_cpus())
    model_ref = ray.put(model_mod.model_artifact())
    num_blocks = max(1, n // 250)
    stats = ray.data.range(n, override_num_blocks=num_blocks).map_batches(
        EvalUnits, fn_constructor_kwargs={"model_ref": model_ref, "n": n},
        concurrency=concurrency, batch_format="pyarrow")
    return stats.groupby("label").sum(["tp", "fp", "fn"]).rename_columns(
        {"sum(tp)": "tp", "sum(fp)": "fp", "sum(fn)": "fn"})
