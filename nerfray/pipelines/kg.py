"""The flagship KG-construction pipeline (SURVEY.md §7.0):

    corpus -> unitize+sha -> CRF tag (actor pool) -> link (actor pool)
           -> canonicalize (salted two-phase groupby)   [node table]
           -> emit triples -> exact dedup               [triple table]
           -> subject-hash-partitioned parquet write

Every step is a lazy Dataset transform; nothing materializes on the
driver. ``tagger="rule"`` swaps the CRF actor for the deterministic
pattern tagger (the SQL-oracled variant).
"""

from __future__ import annotations

import ray
import ray.data

from .. import model as model_mod
from ..sources import corpus_source
from ..stages import canonical, linking, tagging, triples, unitize

# Actor-pool sizing: each tagging actor is single-threaded numpy/python;
# scale the pool with the cluster, let Ray autoscale between min and max.
TAG_BATCH = 512
LINK_BATCH = 4096


def units_of(corpus_ds: ray.data.Dataset) -> ray.data.Dataset:
    return corpus_ds.map_batches(unitize.unitize, batch_format="pyarrow",
                                 zero_copy_batch=True)


def spans_of(units: ray.data.Dataset, tagger: str = "crf",
             concurrency=(1, 8)) -> ray.data.Dataset:
    if tagger == "rule":
        return units.map_batches(tagging.TagUnitsRule,
                                 concurrency=concurrency,
                                 batch_size=TAG_BATCH,
                                 batch_format="pyarrow",
                                 zero_copy_batch=True)
    model_ref = ray.put(model_mod.model_artifact())
    return units.map_batches(tagging.TagUnits,
                             fn_constructor_kwargs={"model_ref": model_ref},
                             concurrency=concurrency, batch_size=TAG_BATCH,
                             batch_format="pyarrow", zero_copy_batch=True)


def linked_of(spans: ray.data.Dataset, concurrency=(1, 4)) -> ray.data.Dataset:
    from .. import dicts
    aliases_ref = ray.put(dicts.alias_table())
    return spans.map_batches(linking.LinkSpans,
                             fn_constructor_kwargs={"aliases_ref": aliases_ref},
                             concurrency=concurrency, batch_size=LINK_BATCH,
                             batch_format="pyarrow", zero_copy_batch=True)


def triples_of(linked: ray.data.Dataset) -> ray.data.Dataset:
    emitted = linked.map_batches(triples.emit_triples, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return triples.dedup_triples(emitted)


def kg_pipeline(corpus_ds: ray.data.Dataset,
                tagger: str = "crf") -> ray.data.Dataset:
    """corpus Dataset -> deduped triple Dataset (lazy)."""
    return triples_of(linked_of(spans_of(units_of(corpus_ds), tagger)))


def kg_nodes(corpus_ds: ray.data.Dataset, tagger: str = "crf",
             n_salts: int = 1) -> ray.data.Dataset:
    """corpus Dataset -> canonical node table (canon_id, n_mentions,
    n_surfaces)."""
    return canonical.canonical_nodes(
        linked_of(spans_of(units_of(corpus_ds), tagger)), n_salts=n_salts)


def run_for(sf_dir: str, tagger: str = "crf") -> ray.data.Dataset:
    return kg_pipeline(corpus_source.corpus_dataset_for(sf_dir), tagger)
