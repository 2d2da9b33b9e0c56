"""Print per-operator execution stats for the headline pipeline.

Usage: python tools/explain.py [n_files]

Runs the partitioned KG pipeline at the given corpus size (default
20,000 files) and prints Ray Data's per-operator wall/cpu/rows summary —
the `ds.stats()` feedback loop the tuning in BASELINE.md came from.
"""

import re
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    from nerfray import model
    from nerfray.pipelines import kg
    from nerfray.sources import corpus_source

    model.model_artifact()
    mat = kg.kg_pipeline(corpus_source.corpus_dataset_by_repo(n),
                         tagger="crf", dedup="partitioned").materialize()
    stats = mat.stats()
    print(f"# headline pipeline, n={n} files, "
          f"{mat.count()} triples\n")
    for block in re.split(r"\nOperator ", stats):
        header = block.splitlines()[0]
        if "executed in" not in header and "blocks produced" not in header:
            continue
        wall = re.search(r"Remote wall time:.*?([\d.]+m?s) total", block)
        rows = re.search(r"Output num rows per block:.*?(\d+) total", block)
        thr = re.search(r"Ray Data throughput: ([\d.]+) rows/s", block)
        parts = [f"wall={wall.group(1)}" if wall else "",
                 f"rows={rows.group(1)}" if rows else "",
                 f"throughput={float(thr.group(1)):,.0f} rows/s"
                 if thr else ""]
        print(f"  {header}")
        print("    " + "  ".join(p for p in parts if p))
    ray.shutdown()


if __name__ == "__main__":
    main()
