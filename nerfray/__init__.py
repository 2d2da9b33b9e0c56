"""nerfray — a from-scratch Ray-Data-native knowledge-graph construction engine.

Re-expresses the query/data-processing capabilities of the reference NER
engine (kawu/nerf, surveyed in SURVEY.md) as an idiomatic Ray Data pipeline:

    read_parquet(corpus) -> unitize(+sha256) -> CRF tagger (actor pool)
      -> entity linker (actor pool, broadcast alias dicts)
      -> canonicalization (salted two-phase groupby)
      -> triple emission -> exact dedup -> partitioned parquet + manifests

The pure-Python kernel (tokenizer, feature schema, extended-IOB codec,
linear-chain CRF) lives in ``nerfray.core`` and has no Ray dependency; the
Ray Data stages live in ``nerfray.stages`` / ``nerfray.pipelines``.

No module in this package calls ``ray.init()`` — the caller owns the session.
"""

__version__ = "0.1.0"


def quiet_empty_bundle_warnings() -> None:
    """Suppress ONLY Ray's ``RefBundle with a different schema ... new
    schema: .`` log line (an EMPTY-schema zero-row bundle).

    Ray's sort-based shuffle emits zero-row bundles with NO schema for
    empty reduce partitions — reproducible with a minimal
    ``groupby.map_groups`` whose UDF returns schema-complete
    ``schema.empty_table()`` for every empty group (8 blocks, 4
    groups => 3 warnings from ``streaming_executor_state.py`` with
    Ray 2.49.2).  They originate INSIDE the shuffle, never from this
    package's combiners (all of which return schema-complete empties),
    and user UDFs never observe them (map_batches skips empty blocks).
    Real schema mismatches — a non-empty differing schema — still log.

    Idempotent; called from bench.py, tools/driver_sim.py, the test
    fixture and ``__ray_entry__`` import (the driver runs the catalog
    in its own process, so the filter must ride along with the entry
    module)."""
    import logging

    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    if any(getattr(f, "_nerfray_empty_bundle", False)
           for f in logger.filters):
        return

    class _EmptyBundleFilter(logging.Filter):
        _nerfray_empty_bundle = True

        def filter(self, record: "logging.LogRecord") -> bool:
            msg = record.getMessage()
            return not ("RefBundle with a different schema" in msg
                        and "new schema: ." in msg)

    logger.addFilter(_EmptyBundleFilter())
