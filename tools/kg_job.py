"""The ``ray job submit`` entrypoint for the KG-construction pipeline.

On a real cluster (north_rule: fixed N / 4N nodes):

    ray job submit --working-dir /root/repo -- \
        python tools/kg_job.py --input s3://bucket/corpus/*.parquet \
            --output s3://bucket/triples/run1 --tagger crf

In this sandbox the same script runs standalone (``RAY_ADDRESS=local``).
Two input modes:

- ``--input PATH.parquet`` — a real corpus table with columns
  (repo, path, commit, lang, content), column-pruned at the read.
  Output is subject-hash-partitioned parquet (hive layout) so a re-run
  can skip finished partitions and downstream readers prune by bucket.
  Dedup is ``partitioned_checked``: per-block exact dedup when repo
  containment holds on the actual blocks, transparent shuffle fallback
  when it doesn't (arbitrary parquet gives no layout guarantee).
  With ``--checkpoint-dir DIR`` the triples are additionally cached
  per INPUT FILE with lineage manifests (path/size/row-count
  fingerprints, atomic commit): a crashed or repeated run skips every
  committed file and only the subject-hash export is redone.
- ``--synthetic N`` — the deterministic benchmark corpus, run through
  the checkpointed shard runner (per-shard lineage manifests, atomic
  commit, idempotent resume — rerun the same command after a kill and
  completed shards are skipped as 'cached').

Prints ONE JSON summary line (counters, wall, output layout) — the
job's driver log is the run record.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="kg_job")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="corpus parquet path "
                     "(repo, path, commit, lang, content)")
    src.add_argument("--synthetic", type=int, metavar="N",
                     help="deterministic benchmark corpus of N files")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--tagger", default="crf", choices=["crf", "rule"])
    ap.add_argument("--shards", type=int, default=8,
                    help="checkpoint shards (synthetic mode)")
    ap.add_argument("--buckets", type=int, default=64,
                    help="subject-hash output partitions (parquet mode)")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="parquet mode: cache triples per INPUT FILE "
                    "with lineage manifests; a re-run skips committed "
                    "files (resume after crash)")
    args = ap.parse_args(argv)

    import ray
    owns_ray = not ray.is_initialized()
    if owns_ray:  # under `ray job submit` the job driver owns the session
        ray.init(include_dashboard=False, logging_level="ERROR")

    t0 = time.time()
    if args.synthetic is not None:
        from nerfray.state import manifest as mf
        summary = mf.run_checkpointed(args.synthetic, args.output,
                                      n_shards=args.shards,
                                      tagger=args.tagger)
        counters = mf.counters(args.output)
        out = {"mode": "synthetic", "n_files": args.synthetic,
               "layout": "shard=*/part*.parquet + _manifests",
               **{k: summary[k] for k in
                  ("n_shards", "n_cached", "n_swept_stale")},
               "counters": counters}
    else:
        from nerfray.pipelines import kg
        from nerfray.sources.corpus_source import corpus_from_parquet
        from nerfray.stages import triples as tstage
        resume = {}
        if args.checkpoint_dir:
            from nerfray.state import manifest as mf
            summary = mf.run_checkpointed_parquet(
                args.input, args.checkpoint_dir, tagger=args.tagger)
            trips = mf.read_triples(args.checkpoint_dir)
            resume = {"checkpoint_dir": args.checkpoint_dir,
                      **{k: summary[k] for k in
                         ("n_shards", "n_cached", "n_swept_stale")}}
        else:
            trips = kg.kg_pipeline(corpus_from_parquet(args.input),
                                   tagger=args.tagger,
                                   dedup="partitioned_checked")
        tstage.write_by_subject_hash(trips, args.output,
                                     n_partitions=args.buckets)
        import ray.data
        n = ray.data.read_parquet(args.output).count()
        out = {"mode": "parquet", "input": args.input,
               "layout": f"pb=*/ ({args.buckets} subject-hash buckets)",
               "n_triples": n, **resume}
    out["wall_sec"] = round(time.time() - t0, 3)
    out["output"] = args.output
    print(json.dumps(out))
    if owns_ray:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
