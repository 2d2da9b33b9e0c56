"""Inverted-index build + boolean (conjunctive) search over the
``documents`` table — the retrieval side of a training-data corpus
(find every document containing ALL query terms).

Ray-Data-first shape: the index build reuses the word-DF block-combiner
pattern (``ops/text.py::word_df_stats``) — per-block (word, doc-list)
partials so the shuffle moves one row per distinct word per block, then
ONE word-hash-bucket co-group merges each word's postings into a
sorted ``list<int64>``.  Search has two paths that must agree:

* ``search_scan`` — map-filter over the text (no shuffle at all); the
  term set is tiny and rides in fn_kwargs.
* ``search_via_index`` — the postings path: partials are filtered to
  the query terms BEFORE the exchange (so the shuffle carries only the
  terms' postings), then one bounded co-group counts each doc's
  distinct matched terms; count == n_terms is the AND.

At 100 TB the scan path is a full-corpus read per query; the index
path ships only ``sum(df(term))`` postings rows — that asymmetry is
the point of building the index once.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

N_WORD_BUCKETS = 64

# fixed query for the driver surface: every term is mid-frequency in
# the synthetic vocabulary (~78% df), so the 5-way AND keeps ~30% of
# docs — selective but never empty at gate scale
QUERY_TERMS = ("vector", "stream", "window", "merge", "batch")


def _block_postings(batch: pa.Table) -> pa.Table:
    """(word, docs-in-block) partials; grain = distinct words per
    block (same combiner shape as word_df_stats)."""
    import pandas as pd
    flat_w: list = []
    flat_d: list = []
    for d, t in zip(batch.column("doc_id").to_pylist(),
                    batch.column("text").to_pylist()):
        ws = set(t.split(" "))
        flat_w.extend(ws)
        flat_d.extend([d] * len(ws))
    if not flat_w:
        return pa.Table.from_pydict({
            "word": pa.array([], pa.string()),
            "docs": pa.array([], pa.list_(pa.int64()))})
    g = pd.Series(flat_d).groupby(pd.Series(flat_w), sort=True).agg(list)
    return pa.Table.from_pydict({
        "word": pa.array(g.index.tolist(), pa.string()),
        "docs": pa.array(g.tolist(), pa.list_(pa.int64())),
    })


def _word_bucket(batch: pa.Table) -> pa.Table:
    import pandas as pd
    arr = np.asarray(batch.column("word").to_pylist(), dtype=object)
    hb = (pd.util.hash_array(arr) % N_WORD_BUCKETS).astype(np.int32)
    return batch.append_column("hb", pa.array(hb))


def _merge_postings_bucket(group: pa.Table) -> pa.Table:
    """One word hash bucket: every partial of a word is here; merge its
    doc lists into one sorted postings array (flatten + argsort +
    reduceat slicing — no per-word Python loop for the merge math)."""
    out_schema = pa.schema([
        ("word", pa.string()), ("df", pa.int64()),
        ("postings", pa.list_(pa.int64()))])
    if group.num_rows == 0:
        return out_schema.empty_table()
    words = np.asarray(group.column("word").to_pylist(), dtype=object)
    docs_col = group.column("docs").combine_chunks()
    d_flat = docs_col.flatten().to_numpy(zero_copy_only=False)
    w_of_row = pc.list_parent_indices(docs_col).to_numpy(
        zero_copy_only=False)
    # order every incidence by (word, doc): one argsort gives each
    # word's postings as a contiguous sorted slice
    worder = np.argsort(words, kind="stable")
    wrank = np.empty(len(words), np.int64)
    wrank[worder] = np.arange(len(words))
    order = np.lexsort((d_flat, wrank[w_of_row]))
    w_s = words[w_of_row[order]]
    d_s = d_flat[order]
    starts = np.flatnonzero(np.r_[True, w_s[1:] != w_s[:-1]])
    lens = np.diff(np.r_[starts, len(d_s)])
    return pa.Table.from_pydict({
        "word": pa.array(w_s[starts], pa.string()),
        "df": pa.array(lens, pa.int64()),
        "postings": pa.ListArray.from_arrays(
            pa.array(np.r_[0, np.cumsum(lens)], pa.int32()),
            pa.array(d_s, pa.int64())),
    }, schema=out_schema)


def build_inverted_index(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(word, df, postings): sorted doc-id posting list per word."""
    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(_block_postings, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .map_batches(_word_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_merge_postings_bucket,
                                  batch_format="pyarrow")


def index_summary(sf_dir: str) -> ray.data.Dataset:
    """Integer summaries (df, min/max/sum of doc ids) computed FROM the
    actual postings arrays — proves posting content, not just counts,
    against the SQL mirror (list columns don't survive the driver's
    value compare, integer rollups of them do)."""
    from nerfray.sources.parquet import read_parquet_clean
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])

    def _summ(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            ("word", pa.string()), ("df", pa.int64()),
            ("min_doc", pa.int64()), ("max_doc", pa.int64()),
            ("sum_docs", pa.int64())])
        if batch.num_rows == 0:
            return out_schema.empty_table()
        postings = batch.column("postings").combine_chunks()
        d = postings.flatten().to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(postings).to_numpy(
            zero_copy_only=False).astype(np.int64)
        starts = np.r_[0, np.cumsum(lens)[:-1]]
        return pa.Table.from_pydict({
            "word": batch.column("word"),
            "df": batch.column("df"),
            "min_doc": pa.array(np.minimum.reduceat(d, starts), pa.int64()),
            "max_doc": pa.array(np.maximum.reduceat(d, starts), pa.int64()),
            "sum_docs": pa.array(np.add.reduceat(d, starts), pa.int64()),
        }, schema=out_schema)

    return build_inverted_index(docs).map_batches(
        _summ, batch_format="pyarrow")


def search_scan(docs: ray.data.Dataset,
                terms: tuple[str, ...] = QUERY_TERMS) -> ray.data.Dataset:
    """Full-scan AND search: keep docs whose distinct word set contains
    every term. No shuffle; the term set rides in fn_kwargs."""
    tset = frozenset(terms)

    def _match(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = np.fromiter(
            (tset.issubset(t.split(" "))
             for t in batch.column("text").to_pylist()),
            bool, count=batch.num_rows)
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids[keep], pa.int64())})

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _match, batch_format="pyarrow", zero_copy_batch=True)


def search_via_index(docs: ray.data.Dataset,
                     terms: tuple[str, ...] = QUERY_TERMS
                     ) -> ray.data.Dataset:
    """Postings-path AND search: block partials filtered to the terms
    BEFORE the exchange, flattened to (doc) incidences and counted in
    a doc-hash-bucket co-group (a doc contributes a term at most once —
    partials are per-block distinct, and a doc lives in one block).
    Group size is ~sum(df(term))/n_buckets, never the whole result."""
    k = len(set(terms))
    term_arr = pa.array(sorted(set(terms)), pa.string())

    def _filt_flatten(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.is_in(batch.column("word"),
                                     value_set=term_arr))
        d = kept.column("docs").combine_chunks().flatten() \
            .to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "doc_id": pa.array(d, pa.int64()),
            "hb": pa.array((d & (N_WORD_BUCKETS - 1)).astype(np.int32),
                           pa.int32())})

    def _count_bucket(group: pa.Table) -> pa.Table:
        out_schema = pa.schema([("doc_id", pa.int64())])
        if group.num_rows == 0:
            return out_schema.empty_table()
        d = np.sort(group.column("doc_id").to_numpy(zero_copy_only=False))
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        n = np.diff(np.r_[starts, len(d)])
        return pa.Table.from_pydict({
            "doc_id": pa.array(d[starts][n == k], pa.int64())},
            schema=out_schema)

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(_block_postings, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .map_batches(_filt_flatten, batch_format="pyarrow") \
        .groupby("hb").map_groups(_count_bucket, batch_format="pyarrow")


_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)

INDEX_SUMMARY_SQL = """
WITH wd AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
  FROM documents
)
SELECT word, count(*)::BIGINT AS df, min(doc_id)::BIGINT AS min_doc,
       max(doc_id)::BIGINT AS max_doc, sum(doc_id)::BIGINT AS sum_docs
FROM wd GROUP BY word ORDER BY word
"""

SEARCH_SQL = f"""
SELECT doc_id FROM documents
WHERE len(list_intersect(list_distinct(string_split(text, ' ')),
                         [{_TERMS_SQL}])) = {len(QUERY_TERMS)}
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# positional phrase search
# ---------------------------------------------------------------------------

# fixed phrase for the driver surface: two mid-frequency words, so the
# adjacency requirement is selective (~10% of docs) but never empty
PHRASE = ("merge", "hash")


def phrase_search(docs: ray.data.Dataset,
                  phrase: tuple[str, ...] = PHRASE) -> ray.data.Dataset:
    """(doc_id, n_occ): documents containing the exact token-adjacent
    phrase, with the number of phrase starts (overlaps counted).

    The positional-postings shape: each block emits, for the PHRASE
    WORDS ONLY, (doc, candidate-start, word-slot) rows — word j of the
    phrase matching token position p proposes start p - j — so the
    exchange carries sum(tf(word)) rows, never the corpus.  One
    doc-hash-bucket co-group then counts starts where all ``k`` slots
    agree (a run of k distinct slots at one (doc, start)).  Overlapping
    occurrences and repeated phrase words fall out correctly: slot j
    contributes one row per matching position, and a start is an
    occurrence iff exactly its k slots are present."""
    k = len(phrase)

    def _candidates(batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern(batch.column("text"), " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        words = lists.flatten().to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(len(lens)), lens)
        offsets = np.r_[0, np.cumsum(lens)[:-1]]
        pos = np.arange(len(words)) - offsets[parent]
        d_out, s_out, j_out = [], [], []
        for j, w in enumerate(phrase):
            m = words == w
            s = pos[m] - j
            ok = s >= 0
            d_out.append(ids[parent[m][ok]])
            s_out.append(s[ok])
            j_out.append(np.full(ok.sum(), j, np.int64))
        d = np.concatenate(d_out) if d_out else np.zeros(0, np.int64)
        s = np.concatenate(s_out) if s_out else np.zeros(0, np.int64)
        jj = np.concatenate(j_out) if j_out else np.zeros(0, np.int64)
        return pa.Table.from_pydict({
            "doc_id": pa.array(d.astype(np.int64), pa.int64()),
            "start": pa.array(s.astype(np.int64), pa.int64()),
            "slot": pa.array(jj, pa.int64()),
            "hb": pa.array((d & (N_WORD_BUCKETS - 1)).astype(np.int32),
                           pa.int32()),
        })

    def _count_bucket(group: pa.Table) -> pa.Table:
        out_schema = pa.schema([("doc_id", pa.int64()),
                                ("n_occ", pa.int64())])
        if group.num_rows == 0:
            return out_schema.empty_table()
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        s = group.column("start").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, d))
        d_s, s_s = d[order], s[order]
        # run boundaries at (doc, start) grain; run length == k <=> all
        # k slots present (a (doc, start, slot) triple is unique)
        new = np.r_[True, (d_s[1:] != d_s[:-1]) | (s_s[1:] != s_s[:-1])]
        starts = np.flatnonzero(new)
        runs = np.diff(np.r_[starts, len(d_s)])
        hit = runs == k
        hd = d_s[starts[hit]]
        if len(hd) == 0:
            return out_schema.empty_table()
        uniq = np.flatnonzero(np.r_[True, hd[1:] != hd[:-1]])
        n_occ = np.diff(np.r_[uniq, len(hd)])
        return pa.Table.from_pydict({
            "doc_id": pa.array(hd[uniq], pa.int64()),
            "n_occ": pa.array(n_occ.astype(np.int64), pa.int64()),
        }, schema=out_schema)

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(_candidates, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("hb").map_groups(_count_bucket, batch_format="pyarrow")


def phrase_search_sql(phrase: tuple[str, ...] = PHRASE) -> str:
    """DuckDB mirror: count token positions whose k-gram equals the
    phrase (same overlap semantics as the positional path)."""
    k = len(phrase)
    conds = " AND ".join(f"t[i + {j + 1}] = '{w}'"
                         for j, w in enumerate(phrase))
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
              FROM documents),
m AS (SELECT doc_id,
             len(list_filter(range(len(t) - {k - 1}),
                             i -> {conds}))::BIGINT AS n_occ
      FROM toks)
SELECT doc_id, n_occ FROM m WHERE n_occ >= 1 ORDER BY doc_id
"""
