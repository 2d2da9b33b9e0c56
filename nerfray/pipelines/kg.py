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


def spans_of(units: ray.data.Dataset, tagger="crf",
             concurrency=None, tagger_kwargs: dict | None = None
             ) -> ray.data.Dataset:
    """``tagger`` is "crf", "rule", or any actor CLASS taking a
    ``model_ref`` ctor kwarg (the reference's injectable-tagger surface,
    /root/reference/src/NLP/Nerf/XCES.hs:320-328 — ``nerXCES`` accepts
    any String -> NeForest function; here any batch-tagging actor)."""
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
    cls = tagging.TagUnits if tagger == "crf" else tagger
    kwargs = {"model_ref": ray.put(model_mod.model_artifact())}
    kwargs.update(tagger_kwargs or {})
    return units.map_batches(cls,
                             fn_constructor_kwargs=kwargs,
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


_RUN_CACHE: dict[tuple, ray.data.Dataset] = {}


def run_for(sf_dir: str, tagger: str = "crf",
            dedup: str = "shuffle") -> ray.data.Dataset:
    """Triples for an sf dir, MEMOIZED per (sf_dir, tagger, dedup) and
    materialized: many catalog queries (degrees, adjacency, typing,
    components, associations, ...) start from the same triple table, so
    one Ray session tags the corpus once and the graph ops consume the
    pinned blocks.  The triple table is the pipeline's SMALL output
    (node/edge grain, wide content long gone) — the legitimate
    materialize point.  Datasets are immutable, so sharing is safe."""
    key = (sf_dir, tagger, dedup)
    ds = _RUN_CACHE.get(key)
    if ds is None:
        n = corpus_source.corpus_rows_for(sf_dir)
        if dedup == "partitioned":
            ds = kg_pipeline(corpus_source.corpus_dataset_by_repo(n),
                             tagger, dedup="partitioned")
        else:
            ds = kg_pipeline(corpus_source.corpus_dataset(n), tagger)
        ds = ds.materialize()
        _RUN_CACHE[key] = ds
    return ds


# ---------------------------------------------------------------------------
# incremental KG delta (version diff)
# ---------------------------------------------------------------------------
#
# Two corpus VERSIONS are modeled as deterministic modular subsets of the
# row universe (v1: i % 3 != 2, v2: i % 7 != 0 — overlapping, each with
# exclusive files), so the delta has an exact SQL mirror via
# corpus.gold_triples_sql(where_i=...). Because triples are DEDUPED
# across files, a file disappearing does NOT necessarily remove its
# triples (another surviving file may emit them) — the diff must run on
# the deduped triple sets, which is exactly what the anti-joins do.
# The moduli are chosen coprime to n_repos (50) so dropped files still
# share repo-grain triples with survivors (i % 5 would align with repo
# assignment and make the dedup subtlety vacuous).

V1_WHERE = ("i % 3 <> 2", 3, 2)
V2_WHERE = ("i % 7 <> 0", 7, 0)


def corpus_version(n: int, *, mod: int, drop: int,
                   rows_per_block: int = 500) -> ray.data.Dataset:
    """Corpus rows with i % mod != drop — one VERSION of the corpus."""
    import pyarrow as pa
    import pyarrow.compute as pc

    num_blocks = max(1, -(-n // rows_per_block))

    def _keep(batch: pa.Table) -> pa.Table:
        import numpy as np
        ids = batch.column("id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % mod != drop))

    return ray.data.range(n, override_num_blocks=num_blocks) \
        .map_batches(_keep, batch_format="pyarrow") \
        .map_batches(corpus_source._synth_batch, fn_kwargs={"n": n},
                     batch_format="pyarrow", zero_copy_batch=True)


def run_version_for(sf_dir: str, which: int,
                    tagger: str = "crf") -> ray.data.Dataset:
    """Triples of corpus VERSION 1 or 2, memoized + materialized like
    ``run_for`` — kg_delta, kg_apply_delta and the snapshot store all
    start from the same two version pipelines, so each version is
    tagged once per session."""
    key = (sf_dir, f"version{which}", tagger)
    ds = _RUN_CACHE.get(key)
    if ds is None:
        n = corpus_source.corpus_rows_for(sf_dir)
        _w, mod, drop = V1_WHERE if which == 1 else V2_WHERE
        ds = kg_pipeline(corpus_version(n, mod=mod, drop=drop),
                         tagger).materialize()
        _RUN_CACHE[key] = ds
    return ds


def kg_delta(sf_dir: str, tagger: str = "crf") -> ray.data.Dataset:
    """(op, subj, pred, obj): triples added ('add') or removed ('del')
    going v1 -> v2. Both versions run the full pipeline; the diff is
    two distributed anti-joins on a composite string key (never a
    driver-side set)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..ops.joins import hash_join

    t1 = run_version_for(sf_dir, 1, tagger)
    t2 = run_version_for(sf_dir, 2, tagger)

    def _with_key(batch: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            batch.column("subj"), batch.column("pred"),
            batch.column("obj"), "\x1f")
        return batch.append_column("k", k)

    k1 = t1.map_batches(_with_key, batch_format="pyarrow").materialize()
    k2 = t2.map_batches(_with_key, batch_format="pyarrow").materialize()
    cols = ["subj", "pred", "obj"]

    def _with_op(op: str):
        def _f(batch: pa.Table) -> pa.Table:
            return pa.Table.from_pydict({
                "op": pa.array([op] * batch.num_rows, pa.string()),
                "subj": batch.column("subj"),
                "pred": batch.column("pred"),
                "obj": batch.column("obj")})
        return _f

    added = hash_join(k2, k1, left_on="k", right_on="k",
                      left_cols=cols, right_cols=[], how="left anti") \
        .map_batches(_with_op("add"), batch_format="pyarrow")
    removed = hash_join(k1, k2, left_on="k", right_on="k",
                        left_cols=cols, right_cols=[], how="left anti") \
        .map_batches(_with_op("del"), batch_format="pyarrow")
    return added.union(removed)


def kg_delta_sql() -> str:
    from .. import corpus
    v1 = corpus.gold_triples_sql(V1_WHERE[0])
    v2 = corpus.gold_triples_sql(V2_WHERE[0])
    return f"""
WITH v1 AS ({v1}), v2 AS ({v2})
SELECT 'add' AS op, subj, pred, obj
FROM (SELECT subj, pred, obj FROM v2 EXCEPT SELECT subj, pred, obj FROM v1)
UNION ALL
SELECT 'del', subj, pred, obj
FROM (SELECT subj, pred, obj FROM v1 EXCEPT SELECT subj, pred, obj FROM v2)
ORDER BY op, subj, pred, obj
"""


def kg_apply_delta(sf_dir: str, tagger: str = "crf") -> ray.data.Dataset:
    """CDC apply (the consumer side of kg_delta): v1 triples + the
    (add/del) changelog -> the v2 triple set, without ever running the
    v2 pipeline.  Tombstone semantics: 'del' rows anti-join v1 out on
    the composite key, 'add' rows union in — the standard incremental
    materialized-view maintenance step, so the oracle is simply the v2
    gold set (equality proves the delta is complete AND the apply is
    exact)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..ops.joins import hash_join

    v1 = run_version_for(sf_dir, 1, tagger)
    delta = kg_delta(sf_dir, tagger).materialize()

    def _with_key(batch: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            batch.column("subj"), batch.column("pred"),
            batch.column("obj"), "\x1f")
        return batch.append_column("k", k)

    def _only(op: str):
        def _f(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch.column("op"), op)) \
                .drop_columns(["op"])
        return _f

    dels = delta.map_batches(_only("del"), batch_format="pyarrow") \
        .map_batches(_with_key, batch_format="pyarrow")
    adds = delta.map_batches(_only("add"), batch_format="pyarrow")
    cols = ["subj", "pred", "obj"]
    survivors = hash_join(
        v1.map_batches(_with_key, batch_format="pyarrow"), dels,
        left_on="k", right_on="k", left_cols=cols, right_cols=[],
        how="left anti").select_columns(cols)
    return survivors.union(adds.select_columns(cols))
