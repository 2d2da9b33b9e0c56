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
