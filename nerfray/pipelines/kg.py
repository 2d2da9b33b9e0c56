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
# scale the pool with the cluster (max = cluster CPUs so the dominant
# stage can saturate every core), let Ray autoscale between min and max.
TAG_BATCH = 512
LINK_BATCH = 4096


def _cluster_cpus() -> int:
    try:
        return max(2, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8


def units_of(corpus_ds: ray.data.Dataset) -> ray.data.Dataset:
    return corpus_ds.map_batches(unitize.unitize, batch_format="pyarrow",
                                 zero_copy_batch=True)


def spans_of(units: ray.data.Dataset, tagger: str = "crf",
             concurrency=None) -> ray.data.Dataset:
    if concurrency is None:
        # min > 1 only on big clusters: pre-warming half the pool cuts
        # the autoscale ramp that dominates short runs at high CPU
        # counts (A/B at 2M files, 32 cpus: min=1 310k, min=8 344k,
        # min=16 373k triples/s), while small (pytest, 4-cpu) sessions
        # keep min=1 so actor reservation can never starve upstream
        # tasks
        cpus = _cluster_cpus()
        concurrency = (max(1, cpus // 2) if cpus >= 16 else 1, cpus)
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


def linked_of(spans: ray.data.Dataset, concurrency=None) -> ray.data.Dataset:
    from .. import dicts
    if concurrency is None:
        concurrency = (1, max(2, _cluster_cpus() // 4))
    aliases_ref = ray.put(dicts.alias_table())
    return spans.map_batches(linking.LinkSpans,
                             fn_constructor_kwargs={"aliases_ref": aliases_ref},
                             concurrency=concurrency, batch_size=LINK_BATCH,
                             batch_format="pyarrow", zero_copy_batch=True)


def triples_of(linked: ray.data.Dataset,
               dedup: str = "shuffle") -> ray.data.Dataset:
    emitted = linked.map_batches(triples.emit_triples, batch_format="pyarrow",
                                 zero_copy_batch=True)
    if dedup == "partitioned":
        return triples.dedup_triples_local(emitted)
    if dedup == "partitioned_checked":
        return triples.dedup_triples_checked(emitted)
    return triples.dedup_triples(emitted)


def triples_with_provenance(corpus_ds: ray.data.Dataset,
                            tagger: str = "crf") -> ray.data.Dataset:
    """Provenance-carrying flagship output (FIXTURES.md F5 schema): each
    deduped triple keeps its minimal source span (repo, path,
    content_sha, unit_id, src char range). Requires repo-partitioned
    input blocks like the partitioned dedup path."""
    linked = linked_of(spans_of(units_of(corpus_ds), tagger))
    emitted = linked.map_batches(triples.emit_triples_with_provenance,
                                 batch_format="pyarrow",
                                 zero_copy_batch=True)
    return emitted.map_batches(triples._block_distinct_prov,
                               batch_format="pyarrow", batch_size=None,
                               zero_copy_batch=True)


def kg_pipeline(corpus_ds: ray.data.Dataset, tagger: str = "crf",
                dedup: str = "shuffle") -> ray.data.Dataset:
    """corpus Dataset -> deduped triple Dataset (lazy).

    ``dedup="shuffle"`` is the generic all-to-all exact dedup;
    ``dedup="partitioned"`` requires subject-partitioned input blocks
    (corpus_dataset_by_repo) and eliminates the shuffle entirely — map
    stages preserve block boundaries (bundles only merge whole blocks),
    so repo containment survives to the dedup stage."""
    return triples_of(linked_of(spans_of(units_of(corpus_ds), tagger)),
                      dedup=dedup)


def kg_nodes(corpus_ds: ray.data.Dataset, tagger: str = "crf",
             n_salts: int = 1) -> ray.data.Dataset:
    """corpus Dataset -> canonical node table (canon_id, n_mentions,
    n_surfaces)."""
    return canonical.canonical_nodes(
        linked_of(spans_of(units_of(corpus_ds), tagger)), n_salts=n_salts)


def run_for(sf_dir: str, tagger: str = "crf",
            dedup: str = "shuffle") -> ray.data.Dataset:
    n = corpus_source.corpus_rows_for(sf_dir)
    if dedup == "partitioned":
        return kg_pipeline(corpus_source.corpus_dataset_by_repo(n), tagger,
                           dedup="partitioned")
    return kg_pipeline(corpus_source.corpus_dataset(n), tagger)
