"""Distributed deterministic corpus source (the BASELINE.json input table).

The corpus is a pure function of the row index (nerfray.corpus), so the
scalable "reader" is ``ray.data.range(n) -> map_batches(synthesize)``:
every block materializes only its own rows on a worker, nothing is ever
resident on the driver. At 100 TB the same shape applies — swap the
synthesizer for ``read_parquet`` of the real corpus-shaped table; every
downstream stage is source-agnostic (it only sees the 5-column schema).

Row-count convention (nerfray/corpus.py): n equals the row count of the
sf dir's ``documents.parquet``, read from parquet *metadata* only (no data
I/O on the driver).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from .. import corpus

CORPUS_SCHEMA = pa.schema([
    ("repo", pa.string()),
    ("path", pa.string()),
    ("commit", pa.string()),
    ("lang", pa.string()),
    ("content", pa.large_string()),
])


def corpus_rows_for(sf_dir: str) -> int:
    """n from documents.parquet footer metadata (driver-side, O(1))."""
    f = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet"))
    return f.metadata.num_rows


def _synth_batch(batch: pa.Table, *, n: int) -> pa.Table:
    ids = batch.column("id").to_pylist()
    cols = corpus.synth_rows(ids, n)
    return pa.Table.from_pydict(
        {k: pa.array(cols[k], type=CORPUS_SCHEMA.field(k).type)
         for k in ("repo", "path", "commit", "lang", "content")},
        schema=CORPUS_SCHEMA)


def corpus_dataset(n: int, *, rows_per_block: int = 500) -> ray.data.Dataset:
    """The corpus table as a streaming Dataset of Arrow blocks."""
    num_blocks = max(1, -(-n // rows_per_block))
    return ray.data.range(n, override_num_blocks=num_blocks).map_batches(
        _synth_batch, fn_kwargs={"n": n}, batch_format="pyarrow",
        zero_copy_batch=True)


def corpus_dataset_for(sf_dir: str) -> ray.data.Dataset:
    return corpus_dataset(corpus_rows_for(sf_dir))


def corpus_from_parquet(path: str) -> ray.data.Dataset:
    """A REAL corpus table (the input_hint shape: repo, path, commit,
    lang, content) read from parquet, column-pruned at the scan — the
    production input of ``tools/kg_job.py``.  Synthetic corpora stay on
    the generator path; this is the boundary a deployment swaps."""
    return ray.data.read_parquet(
        path, columns=["repo", "path", "commit", "lang", "content"])


def _synth_repo_batch(batch: pa.Table, *, n: int) -> pa.Table:
    """Generate all rows of the repos whose ids are in the batch."""
    nrep = corpus.n_repos(n)
    ids = []
    for r in batch.column("id").to_pylist():
        ids.extend(range(int(r), n, nrep))  # rows of repo r: i % nrep == r
    cols = corpus.synth_rows(ids, n)
    return pa.Table.from_pydict(
        {k: pa.array(cols[k], type=CORPUS_SCHEMA.field(k).type)
         for k in ("repo", "path", "commit", "lang", "content")},
        schema=CORPUS_SCHEMA)


def corpus_dataset_by_repo(n: int, *,
                           repos_per_block: int | None = None
                           ) -> ray.data.Dataset:
    """The same corpus table, blocked REPO-MAJOR: every block contains
    complete repos. This mirrors how a real repo-scale corpus is stored
    (files of a repository co-located) and is the partitioning key the
    whole pipeline reuses (SURVEY.md §7.3): with subjects repo-scoped,
    per-block triple dedup is globally exact and the dedup shuffle
    disappears (see pipelines.kg dedup='partitioned')."""
    nrep = corpus.n_repos(n)
    if repos_per_block is None:
        # bound total block count (~768) so driver-side task scheduling
        # stays O(1k) tasks per stage regardless of corpus size, while
        # keeping >= 64 repos per block for parallelism at small n
        repos_per_block = max(64, -(-nrep // 768))
    num_blocks = max(1, -(-nrep // repos_per_block))
    return ray.data.range(nrep, override_num_blocks=num_blocks).map_batches(
        _synth_repo_batch, fn_kwargs={"n": n}, batch_format="pyarrow",
        zero_copy_batch=True)


def corpus_slice(n: int, lo: int, hi: int,
                 rows_per_block: int = 2000) -> ray.data.Dataset:
    """Corpus rows [lo, hi) — the per-shard input of the checkpointed runner
    (nerfray.state.manifest).

    Block count guarantees parallelism on SMALL shards too: at least
    min(32, rows/64) blocks (a 1250-row shard previously became ONE
    block → one tagging actor → serial shard), while big shards keep
    the rows_per_block grain."""
    rows = hi - lo
    num_blocks = max(1, min(-(-rows // 64),
                            max(-(-rows // rows_per_block), 32)))
    ds = ray.data.range(hi, override_num_blocks=max(1, num_blocks))
    if lo:
        ds = ds.filter(expr=f"id >= {lo}")
    return ds.map_batches(_synth_batch, fn_kwargs={"n": n},
                          batch_format="pyarrow", zero_copy_batch=True)
