"""Ray Data pipeline stages (SURVEY.md §7.0 dataflow).

Stateless per-batch transforms are plain functions over pyarrow batches;
stateful stages (CRF tagger, entity linker) are callable classes run as
actor pools via ``map_batches(Cls, concurrency=..., batch_size=...)``.
"""
