"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language ID, document fingerprinting.

Stats ops are exact SQL mirrors (splitting/regex semantics chosen to be
identical between Python and DuckDB RE2); language ID is a char-profile
classifier (model built once per actor) checked against the table's own
``lang`` column; the fingerprint is a winnowing rolling-hash sketch.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dedup import h64, sha64  # noqa: F401  (sha64 re-exported; winnow + tests)

# token regex shared verbatim with the DuckDB oracle (RE2-compatible)
TOKEN_RE_SRC = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_TOKEN_RE = re.compile(TOKEN_RE_SRC)

STOPWORDS = ("the", "a", "of", "and", "to", "in")


_STOPSET = set(STOPWORDS)


def text_stats_table(batch: pa.Table) -> pa.Table:
    """Per-doc counter table for one batch (Arrow kernels)."""
    text = batch.column("text")
    words = pc.split_pattern(text, " ")
    n_words = pc.list_value_length(words)
    wl = words.to_pylist()
    uniq = [len(set(ws)) for ws in wl]
    stop_counts = [sum(1 for w in ws if w in _STOPSET) for ws in wl]
    # regex token count via Python re (RE2-identical for this pattern)
    n_toks = [len(_TOKEN_RE.findall(t)) for t in text.to_pylist()]
    return pa.Table.from_pydict({
        "doc_id": batch.column("doc_id"),
        "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        "n_words": pc.cast(n_words, pa.int64()),
        "n_uniq_words": pa.array(uniq, pa.int64()),
        "n_tokens": pa.array(n_toks, pa.int64()),
        "n_stopwords": pa.array(stop_counts, pa.int64()),
    })


def text_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-doc counters, fully vectorized in Arrow kernels."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        text_stats_table, batch_format="pyarrow", zero_copy_batch=True)


def quality_scores(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Heuristic quality score from the counters (single-division floats,
    deterministic across engines)."""

    def _q(batch: pa.Table) -> pa.Table:
        n_words = batch.column("n_words").to_pylist()
        n_uniq = batch.column("n_uniq_words").to_pylist()
        n_stop = batch.column("n_stopwords").to_pylist()
        ttr = [u / w if w else 0.0 for u, w in zip(n_uniq, n_words)]
        stop_ratio = [s / w if w else 0.0 for s, w in zip(n_stop, n_words)]
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "type_token_ratio": pa.array(ttr, pa.float64()),
            "stopword_ratio": pa.array(stop_ratio, pa.float64()),
        })

    return text_stats(docs).map_batches(_q, batch_format="pyarrow")


def curate(docs: ray.data.Dataset, *, min_words: int = 20,
           min_ttr_pct: int = 20, min_stop_pct: int = 0
           ) -> ray.data.Dataset:
    """Training-data curation: quality-gate documents on their counters
    (the composed stats -> filter flow a 100 TB curation pipeline runs).
    Thresholds are integer-ratio predicates (ttr >= min_ttr_pct/100) so
    the filter is bit-exact against the SQL mirror."""

    def _gate(batch: pa.Table) -> pa.Table:
        n_words = batch.column("n_words")
        keep = pc.and_(
            pc.greater_equal(n_words, min_words),
            pc.greater_equal(
                pc.multiply(pc.cast(batch.column("n_uniq_words"),
                                    pa.int64()), 100),
                pc.multiply(pc.cast(n_words, pa.int64()), min_ttr_pct)))
        if min_stop_pct:
            keep = pc.and_(keep, pc.greater_equal(
                pc.multiply(pc.cast(batch.column("n_stopwords"),
                                    pa.int64()), 100),
                pc.multiply(pc.cast(n_words, pa.int64()), min_stop_pct)))
        return batch.filter(keep)

    return text_stats(docs).map_batches(_gate, batch_format="pyarrow",
                                        zero_copy_batch=True)


def curation_pipeline(docs: ray.data.Dataset, *, min_words: int = 30,
                      min_ttr_pct: int = 25) -> ray.data.Dataset:
    """The composed curation flow a 100 TB run would execute: ONE pass
    computes sha256 + counters per doc, ONE groupby(text_sha) keeps the
    min-doc_id survivor per exact-duplicate class, then the integer-
    ratio quality gate filters — dedup and quality in a single shuffle
    of narrow (sha, counters) rows; text never moves."""
    import hashlib as _hl

    def _sha_stats(batch: pa.Table) -> pa.Table:
        t = text_stats_table(batch)
        shas = [_hl.sha256(x.encode()).hexdigest()
                for x in batch.column("text").to_pylist()]
        return t.append_column("text_sha", pa.array(shas, pa.string()))

    def _sha_bucket(batch: pa.Table) -> pa.Table:
        import pandas as pd
        import numpy as _np
        arr = _np.asarray(batch.column("text_sha").to_pylist(),
                          dtype=object)
        hb = (pd.util.hash_array(arr) % 64).astype(_np.int32)
        return batch.append_column("hb", pa.array(hb))

    def _survivors_bucket(group: pa.Table) -> pa.Table:
        """Min-doc_id row per sha for EVERY sha in the hash bucket (one
        dispatch per bucket; per-sha argmin via sorted-run boundaries)."""
        import numpy as _np
        shas = _np.asarray(group.column("text_sha").to_pylist(),
                           dtype=object)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = _np.lexsort((ids, shas))
        first = _np.r_[True, shas[order][1:] != shas[order][:-1]]
        return group.take(pa.array(order[first])).drop_columns(["hb"])

    def _gate(batch: pa.Table) -> pa.Table:
        n_words = batch.column("n_words")
        keep = pc.and_(
            pc.greater_equal(n_words, min_words),
            pc.greater_equal(
                pc.multiply(batch.column("n_uniq_words"), 100),
                pc.multiply(n_words, min_ttr_pct)))
        return batch.filter(keep)

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(_sha_stats, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .map_batches(_sha_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_survivors_bucket,
                                  batch_format="pyarrow") \
        .map_batches(_gate, batch_format="pyarrow", zero_copy_batch=True)


def word_df_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_uniq_words, sum_df, min_df): per-doc rollup of
    corpus-wide DOCUMENT FREQUENCIES — the TF-IDF-shaped TWO-PASS over
    the corpus (global vocabulary statistic, then a join back to the
    per-doc grain). ``min_df`` is the rarity/novelty signal (how rare
    is the doc's rarest word); ``sum_df`` the common-word mass. All
    integers, so the mirror (WORD_DF_SQL) is hash-exact.

    Scale shape (r3; single-exchange rewrite): pass 1 emits ONE ROW PER
    DISTINCT WORD PER BLOCK — (word, doc-list) — so the shuffle never
    moves (word, doc) incidence rows.  The ONE word-hash-bucket
    co-group then has every partial of a word in the same group, so the
    global df (sum of list lengths per word) is computed IN-GROUP via
    reduceat — no separate vocabulary groupby, no union pass — the doc
    lists unroll vectorized (Arrow list-flatten) with each incidence
    carrying its word's df, and a final tiny groupby(doc_id) reduces
    the <= 64 per-bucket doc partials."""
    from ray.data.aggregate import Min, Sum

    def _block_word_partials(batch: pa.Table) -> pa.Table:
        """Block combiner: (word, docs-in-block); emit grain is distinct
        words per block, not (word, doc) incidences.  Fully vectorized
        (the r3 shape looped a Python set per doc): Arrow split ->
        flatten + parent indices -> factorized (word, doc) code pairs
        -> np.unique -> ListArray offsets."""
        import pandas as pd
        empty = pa.Table.from_pydict({
            "word": pa.array([], pa.string()),
            "docs": pa.array([], pa.list_(pa.int64()))})
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        wl = pc.split_pattern(col, " ")
        flat = wl.flatten()
        if len(flat) == 0:
            return empty
        parent = pc.list_parent_indices(wl).to_numpy(
            zero_copy_only=False)
        wcode, wvals = pd.factorize(flat.to_pandas(), sort=True)
        dcode, dvals = pd.factorize(doc_ids[parent])
        key = wcode.astype(np.int64) * len(dvals) + dcode
        uk = np.unique(key)
        uw = uk // len(dvals)
        ud = np.asarray(dvals)[uk % len(dvals)].astype(np.int64)
        starts = np.flatnonzero(np.r_[True, uw[1:] != uw[:-1]])
        offsets = np.r_[starts, len(uk)].astype(np.int32)
        return pa.Table.from_pydict({
            "word": pa.array(
                np.asarray(wvals, dtype=object)[uw[starts]].tolist(),
                pa.string()),
            "docs": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pa.array(ud, pa.int64())),
        })

    def _word_bucket(batch: pa.Table) -> pa.Table:
        import pandas as pd
        arr = np.asarray(batch.column("word").to_pylist(), dtype=object)
        hb = (pd.util.hash_array(arr) % 64).astype(np.int32)
        return batch.append_column("hb", pa.array(hb))

    def _doc_partials(group: pa.Table) -> pa.Table:
        """One word hash bucket: ALL partials of each word are here, so
        df(word) = sum of its list lengths (sort + reduceat), then the
        doc lists unroll (Arrow list-flatten) with per-incidence df and
        a doc-sorted reduceat sweeps (count, sum, min) per doc."""
        empty = pa.Table.from_pydict({
            "doc_id": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
            "sdf": pa.array([], pa.int64()),
            "mdf": pa.array([], pa.int64())})
        if group.num_rows == 0:
            return empty
        words = np.asarray(group.column("word").to_pylist(), dtype=object)
        docs_col = group.column("docs").combine_chunks()
        lens = pc.list_value_length(docs_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.argsort(words, kind="stable")
        w_s, lens_s = words[order], lens[order]
        starts = np.flatnonzero(np.r_[True, w_s[1:] != w_s[:-1]])
        df_per_word = np.add.reduceat(lens_s, starts)
        gidx = np.cumsum(np.r_[False, w_s[1:] != w_s[:-1]])
        f_per_row = np.empty(len(words), dtype=np.int64)
        f_per_row[order] = df_per_word[gidx]
        d_flat = docs_col.flatten().to_numpy(zero_copy_only=False)
        f_flat = f_per_row[pc.list_parent_indices(docs_col).to_numpy(
            zero_copy_only=False)]
        order2 = np.argsort(d_flat, kind="stable")
        d_s, f_s = d_flat[order2], f_flat[order2]
        starts2 = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
        return pa.Table.from_pydict({
            "doc_id": pa.array(d_s[starts2], pa.int64()),
            "cnt": pa.array(np.diff(np.r_[starts2, len(d_s)]), pa.int64()),
            "sdf": pa.array(np.add.reduceat(f_s, starts2), pa.int64()),
            "mdf": pa.array(np.minimum.reduceat(f_s, starts2), pa.int64()),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _block_word_partials, batch_format="pyarrow",
        zero_copy_batch=True) \
        .map_batches(_word_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_doc_partials, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Sum("cnt"), Sum("sdf"), Min("mdf")) \
        .rename_columns({"sum(cnt)": "n_uniq_words",
                         "sum(sdf)": "sum_df", "min(mdf)": "min_df"})


def top_words(docs: ray.data.Dataset, *, k: int = 20) -> ray.data.Dataset:
    """(rank, word, df): the k most document-frequent words. Pass 1 is
    the word-DF block combiner (one row per distinct word per block);
    after the vocab-grain groupby every block emits its LOCAL top-k, a
    single bounded merge ranks — never a global sort of the
    vocabulary. Ties broken by word asc, mirrored in the oracle."""

    def _partials(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch.column("text").to_pylist():
            for w in set(t.split(" ")):
                counts[w] = counts.get(w, 0) + 1
        return pa.Table.from_pydict({
            "word": pa.array(list(counts), pa.string()),
            "dfp": pa.array(list(counts.values()), pa.int64()),
        })

    def _local_topk(batch: pa.Table) -> pa.Table:
        words = np.asarray(batch.column("word").to_pylist(), dtype=object)
        df = batch.column("df").to_numpy(zero_copy_only=False)
        order = np.lexsort((words, -df))[:k]
        return pa.Table.from_pydict({
            "word": pa.array(words[order], pa.string()),
            "df": pa.array(df[order], pa.int64()),
            "g": pa.array(np.zeros(len(order), np.int32), pa.int32()),
        })

    def _final(group: pa.Table) -> pa.Table:
        words = np.asarray(group.column("word").to_pylist(), dtype=object)
        df = group.column("df").to_numpy(zero_copy_only=False)
        order = np.lexsort((words, -df))[:k]
        return pa.Table.from_pydict({
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "word": pa.array(words[order], pa.string()),
            "df": pa.array(df[order], pa.int64()),
        })

    return docs.select_columns(["text"]) \
        .map_batches(_partials, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("word").sum("dfp").rename_columns({"sum(dfp)": "df"}) \
        .map_batches(_local_topk, batch_format="pyarrow") \
        .groupby("g").map_groups(_final, batch_format="pyarrow")


def word_cooccur_topk(docs: ray.data.Dataset, *, vocab_k: int = 20,
                      k: int = 20) -> ray.data.Dataset:
    """(rank, w1, w2, n_docs): the k most document-co-frequent word
    PAIRS, restricted to the top-``vocab_k`` words by DF (the bounded
    vocabulary keeps the quadratic pair space at vocab_k^2 regardless
    of corpus size — unrestricted co-occurrence is quadratic in
    per-doc distinct words and does not scale).

    Two-phase: the bounded top-words pass (existing combiner machinery)
    fixes the vocabulary, which broadcasts to a per-block combiner
    computing B^T B of the block's doc x vocab incidence matrix — one
    matmul per block, pairs never per-doc materialized; the shuffle
    carries <= vocab_k^2/2 rows per block and a final tiny groupby
    sums."""
    vocab = sorted(r["word"]
                   for r in top_words(docs, k=vocab_k).take_all())
    widx = {w: i for i, w in enumerate(vocab)}
    v = len(vocab)
    iu, ju = np.triu_indices(v, k=1)

    def _pair_partial(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                                ("n", pa.int64())])
        texts = batch.column("text").to_pylist()
        if not texts:
            return out_schema.empty_table()
        b = np.zeros((len(texts), v), np.int64)
        for i, t in enumerate(texts):
            for w in set(t.split(" ")):
                j = widx.get(w)
                if j is not None:
                    b[i, j] = 1
        p = (b.T @ b)[iu, ju]
        nz = p > 0
        return pa.Table.from_pydict({
            "w1": pa.array(np.asarray(vocab, object)[iu[nz]], pa.string()),
            "w2": pa.array(np.asarray(vocab, object)[ju[nz]], pa.string()),
            "n": pa.array(p[nz], pa.int64()),
        }, schema=out_schema)

    def _final(group: pa.Table) -> pa.Table:
        w1 = np.asarray(group.column("w1").to_pylist(), dtype=object)
        w2 = np.asarray(group.column("w2").to_pylist(), dtype=object)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((w2, w1, -n))[:k]
        return pa.Table.from_pydict({
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "w1": pa.array(w1[order], pa.string()),
            "w2": pa.array(w2[order], pa.string()),
            "n_docs": pa.array(n[order], pa.int64()),
        })

    def _one(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "g", pa.array(np.zeros(batch.num_rows, np.int32), pa.int32()))

    # global pair counts are <= vocab_k^2/2 rows — the final single
    # group is bounded by construction, not by corpus size
    return docs.select_columns(["text"]) \
        .map_batches(_pair_partial, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby(["w1", "w2"]).sum("n").rename_columns({"sum(n)": "n"}) \
        .map_batches(_one, batch_format="pyarrow") \
        .groupby("g").map_groups(_final, batch_format="pyarrow")


def bigram_topk(docs: ray.data.Dataset, *, k: int = 20) -> ray.data.Dataset:
    """(rank, w1, w2, n): the k most frequent ADJACENT token pairs —
    the n-gram LM count table's head. Per-block combiner counts the
    block's bigrams vectorized (one split + one np.unique over the
    block's (w1, w2) code pairs), so the shuffle carries distinct
    bigrams per block, never token-grain rows; bounded local top-k
    then a single merge, same shape as top_words."""

    def _partials(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                                ("n", pa.int64())])
        texts = batch.column("text").to_pylist()
        toks: list = []
        lens: list = []
        for t in texts:
            ws = t.split(" ")
            toks.extend(ws)
            lens.append(len(ws))
        if not toks:
            return out_schema.empty_table()
        arr = np.asarray(toks, dtype=object)
        codes, inv = np.unique(arr, return_inverse=True)
        ends = np.cumsum(lens)
        # adjacent positions, masking the seams between documents
        a, b = inv[:-1], inv[1:]
        seam = np.zeros(len(inv) - 1, bool)
        seam[ends[:-1] - 1] = True
        a, b = a[~seam], b[~seam]
        pair = a.astype(np.int64) * len(codes) + b
        uniq, cnt = np.unique(pair, return_counts=True)
        return pa.Table.from_pydict({
            "w1": pa.array(codes[uniq // len(codes)], pa.string()),
            "w2": pa.array(codes[uniq % len(codes)], pa.string()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        }, schema=out_schema)

    def _local_topk(batch: pa.Table) -> pa.Table:
        w1 = np.asarray(batch.column("w1").to_pylist(), dtype=object)
        w2 = np.asarray(batch.column("w2").to_pylist(), dtype=object)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((w2, w1, -n))[:k]
        return pa.Table.from_pydict({
            "w1": pa.array(w1[order], pa.string()),
            "w2": pa.array(w2[order], pa.string()),
            "n": pa.array(n[order], pa.int64()),
            "g": pa.array(np.zeros(len(order), np.int32), pa.int32())})

    def _final(group: pa.Table) -> pa.Table:
        w1 = np.asarray(group.column("w1").to_pylist(), dtype=object)
        w2 = np.asarray(group.column("w2").to_pylist(), dtype=object)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((w2, w1, -n))[:k]
        return pa.Table.from_pydict({
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "w1": pa.array(w1[order], pa.string()),
            "w2": pa.array(w2[order], pa.string()),
            "n": pa.array(n[order], pa.int64()),
        })

    return docs.select_columns(["text"]) \
        .map_batches(_partials, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby(["w1", "w2"]).sum("n").rename_columns({"sum(n)": "n"}) \
        .map_batches(_local_topk, batch_format="pyarrow") \
        .groupby("g").map_groups(_final, batch_format="pyarrow")


def salient_terms(docs: ray.data.Dataset, *, k: int = 3) -> ray.data.Dataset:
    """(doc_id, rank, word, tf): each doc's top-k terms by term
    frequency, ties by word asc — the integer-only salience surrogate
    (no float TF-IDF, so the mirror is hash-exact).  Pure map stage:
    per-doc ranking needs no corpus state, so NOTHING shuffles and the
    output streams at doc grain."""

    def _top(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            ("doc_id", pa.int64()), ("rank", pa.int64()),
            ("word", pa.string()), ("tf", pa.int64())])
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        toks: list = []
        lens: list = []
        for t in texts:
            ws = t.split(" ")
            toks.extend(ws)
            lens.append(len(ws))
        if not toks:
            return out_schema.empty_table()
        arr = np.asarray(toks, dtype=object)
        codes, inv = np.unique(arr, return_inverse=True)
        doc_of = np.repeat(np.arange(len(texts)), lens)
        # count (doc, word-code) pairs in one np.unique pass
        pair = doc_of.astype(np.int64) * len(codes) + inv
        uniq, tf = np.unique(pair, return_counts=True)
        d = uniq // len(codes)
        w = codes[uniq % len(codes)]
        # rank within doc by (tf desc, word asc); np.unique returns
        # pairs word-sorted within doc already, so a stable sort on
        # -tf within doc preserves the word tiebreak
        order = np.lexsort((w, -tf, d))
        d_s, w_s, tf_s = d[order], w[order], tf[order]
        starts = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
        rank = np.arange(len(d_s)) - np.repeat(starts,
                                               np.diff(np.r_[starts,
                                                             len(d_s)])) + 1
        keep = rank <= k
        ids_arr = np.asarray(ids, dtype=np.int64)
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids_arr[d_s[keep]], pa.int64()),
            "rank": pa.array(rank[keep], pa.int64()),
            "word": pa.array(w_s[keep], pa.string()),
            "tf": pa.array(tf_s[keep].astype(np.int64), pa.int64()),
        }, schema=out_schema)

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _top, batch_format="pyarrow", zero_copy_batch=True)


SALIENT_SQL = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2),
r AS (SELECT doc_id, word, tf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tf DESC, word) AS rank
      FROM tf)
SELECT doc_id, rank::BIGINT AS rank, word, tf::BIGINT AS tf
FROM r WHERE rank <= 3 ORDER BY doc_id, rank
"""


BIGRAM_SQL = """
WITH s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bg AS (
  SELECT w[i] AS w1, w[i + 1] AS w2
  FROM s, unnest(generate_series(1, len(w) - 1)) AS t(i)
),
c AS (SELECT w1, w2, count(*) AS n FROM bg GROUP BY 1, 2),
r AS (SELECT w1, w2, n, row_number() OVER (ORDER BY n DESC, w1, w2) AS rank
      FROM c)
SELECT rank::BIGINT AS rank, w1, w2, n::BIGINT AS n
FROM r WHERE rank <= 20 ORDER BY rank
"""


COOCCUR_SQL = """
WITH wd AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
  FROM documents
),
df AS (SELECT word, count(*) AS df FROM wd GROUP BY word),
v AS (SELECT word FROM (
        SELECT word, row_number() OVER (ORDER BY df DESC, word) AS rn
        FROM df) WHERE rn <= 20),
wv AS (SELECT doc_id, word FROM wd WHERE word IN (SELECT word FROM v)),
pairs AS (
  SELECT a.word AS w1, b.word AS w2, count(*) AS n_docs
  FROM wv a JOIN wv b ON a.doc_id = b.doc_id AND a.word < b.word
  GROUP BY 1, 2
),
r AS (SELECT w1, w2, n_docs,
             row_number() OVER (ORDER BY n_docs DESC, w1, w2) AS rank
      FROM pairs)
SELECT rank::BIGINT AS rank, w1, w2, n_docs::BIGINT AS n_docs
FROM r WHERE rank <= 20 ORDER BY rank
"""


TOP_WORDS_SQL = """
WITH wd AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
  FROM documents
),
df AS (SELECT word, count(*)::BIGINT AS df FROM wd GROUP BY word),
r AS (SELECT word, df,
             row_number() OVER (ORDER BY df DESC, word) AS rank
      FROM df)
SELECT rank::BIGINT AS rank, word, df FROM r WHERE rank <= 20
ORDER BY rank
"""


WORD_DF_SQL = """
WITH wd AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
  FROM documents
),
df AS (SELECT w, count(*) AS ndocs FROM wd GROUP BY w)
SELECT wd.doc_id, count(*)::BIGINT AS n_uniq_words,
       sum(ndocs)::BIGINT AS sum_df, min(ndocs)::BIGINT AS min_df
FROM wd JOIN df USING (w)
GROUP BY wd.doc_id ORDER BY wd.doc_id
"""


def lm_familiarity(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_bigrams, sum_bg_cnt, avg_cnt_x1000): CCNet-style LM
    quality scoring with an EXACT integer surrogate — a corpus bigram
    model is "trained" (pass 1: global bigram occurrence counts) and
    every doc is scored by how familiar its bigrams are to the corpus
    (sum of the global counts of its bigram tokens; the permille mean
    ``avg_cnt_x1000`` is the filterable signal, low = out-of-domain /
    gibberish).  All integers, so the mirror (LM_SCORE_SQL) is
    hash-exact; a real run would swap counts for quantized log-probs
    without changing any exchange.

    Scale shape (the word-DF single-exchange pattern): the block
    combiner emits ONE ROW PER DISTINCT BIGRAM PER BLOCK —
    (bigram, doc-list, per-doc-occurrence-list) — so bigram incidences
    never shuffle individually.  The ONE bigram-hash-bucket co-group
    holds every partial of a bigram, computes its global count
    IN-GROUP (reduceat over the flattened occurrence lists), unrolls
    the doc lists vectorized with each incidence carrying
    occ x global_cnt, and a final tiny groupby(doc_id) reduces the
    <= 64 per-bucket doc partials.  Docs with < 2 words have no
    bigrams and emit no row (mirrored: the SQL join drops them)."""
    from ray.data.aggregate import Sum

    def _block_bigram_partials(batch: pa.Table) -> pa.Table:
        import pandas as pd
        words = pc.split_pattern(batch.column("text"), " ")
        flat = words.combine_chunks().flatten()
        par = pc.list_parent_indices(words).to_numpy(
            zero_copy_only=False)
        empty = pa.Table.from_pydict({
            "bg": pa.array([], pa.string()),
            "docs": pa.array([], pa.list_(pa.int64())),
            "occ": pa.array([], pa.list_(pa.int64()))})
        if len(flat) < 2:
            return empty
        adj = par[1:] == par[:-1]  # bigram stays inside one doc
        if not adj.any():
            return empty
        bgs = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), " ")
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        dfr = pd.DataFrame({
            "bg": np.asarray(bgs.to_pylist(), dtype=object)[adj],
            "d": ids[par[:-1][adj]]})
        occ = dfr.groupby(["bg", "d"], sort=True).size()
        g = occ.reset_index().groupby("bg", sort=True).agg(list)
        return pa.Table.from_pydict({
            "bg": pa.array(g.index.tolist(), pa.string()),
            "docs": pa.array(g["d"].tolist(), pa.list_(pa.int64())),
            "occ": pa.array(g[0].tolist(), pa.list_(pa.int64())),
        })

    def _bg_bucket(batch: pa.Table) -> pa.Table:
        import pandas as pd
        arr = np.asarray(batch.column("bg").to_pylist(), dtype=object)
        hb = (pd.util.hash_array(arr) % 64).astype(np.int32)
        return batch.append_column("hb", pa.array(hb))

    def _doc_partials(group: pa.Table) -> pa.Table:
        """One bigram hash bucket: global cnt per bigram via reduceat
        over its partials, then per-incidence occ x cnt summed per
        doc."""
        empty = pa.Table.from_pydict({
            "doc_id": pa.array([], pa.int64()),
            "nb": pa.array([], pa.int64()),
            "sc": pa.array([], pa.int64())})
        if group.num_rows == 0:
            return empty
        bgs = np.asarray(group.column("bg").to_pylist(), dtype=object)
        docs_col = group.column("docs").combine_chunks()
        occ_col = group.column("occ").combine_chunks()
        occ_flat = occ_col.flatten().to_numpy(zero_copy_only=False)
        row_of = pc.list_parent_indices(occ_col).to_numpy(
            zero_copy_only=False)
        order = np.argsort(bgs, kind="stable")
        inv = np.empty(len(bgs), dtype=np.int64)
        inv[order] = np.arange(len(bgs))
        b_s = bgs[order]
        starts = np.flatnonzero(np.r_[True, b_s[1:] != b_s[:-1]])
        gidx = np.cumsum(np.r_[False, b_s[1:] != b_s[:-1]])
        # global count per bigram = sum of ALL its occurrence values
        row_sum = np.zeros(len(bgs), dtype=np.int64)
        np.add.at(row_sum, row_of, occ_flat)
        cnt_per_bg = np.add.reduceat(row_sum[order], starts)
        cnt_per_row = cnt_per_bg[gidx[inv]]
        d_flat = docs_col.flatten().to_numpy(zero_copy_only=False)
        c_flat = cnt_per_row[row_of]
        order2 = np.argsort(d_flat, kind="stable")
        d_s = d_flat[order2]
        starts2 = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
        return pa.Table.from_pydict({
            "doc_id": pa.array(d_s[starts2], pa.int64()),
            "nb": pa.array(np.add.reduceat(occ_flat[order2], starts2),
                           pa.int64()),
            "sc": pa.array(
                np.add.reduceat((occ_flat * c_flat)[order2], starts2),
                pa.int64()),
        })

    def _score(batch: pa.Table) -> pa.Table:
        nb = batch.column("n_bigrams").to_numpy(zero_copy_only=False)
        sc = batch.column("sum_bg_cnt").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "avg_cnt_x1000",
            pa.array((1000 * sc) // np.maximum(nb, 1), pa.int64()))

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _block_bigram_partials, batch_format="pyarrow",
        zero_copy_batch=True) \
        .map_batches(_bg_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_doc_partials, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Sum("nb"), Sum("sc")) \
        .rename_columns({"sum(nb)": "n_bigrams", "sum(sc)": "sum_bg_cnt"}) \
        .map_batches(_score, batch_format="pyarrow", zero_copy_batch=True)


LM_SCORE_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents
),
bg AS (SELECT a.doc_id, a.w || ' ' || b.w AS bg
       FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
cnt AS (SELECT bg, count(*)::BIGINT AS c FROM bg GROUP BY bg)
SELECT bg.doc_id, count(*)::BIGINT AS n_bigrams,
       sum(c)::BIGINT AS sum_bg_cnt,
       ((1000 * sum(c)) // count(*))::BIGINT AS avg_cnt_x1000
FROM bg JOIN cnt USING (bg)
GROUP BY bg.doc_id ORDER BY bg.doc_id
"""


# ---------------------------------------------------------------------------
# global top-k by quality (partial top-k combiner, never a full sort)
# ---------------------------------------------------------------------------


def top_quality(docs: ray.data.Dataset, *, k: int = 20) -> ray.data.Dataset:
    """(rank, doc_id, type_token_ratio): the k highest-TTR docs
    corpus-wide.  Scale shape: each block emits its LOCAL top-k
    (narrow rows), a single bounded final merge ranks them — the
    global-order answer without a global ``ds.sort`` (at most
    k x n_blocks rows ever co-locate).  TTR is the one float and is a
    single division of the same ints in both engines, so the oracle is
    hash-exact."""

    def _partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch.column("text"), " ")
        n_words = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        uniq = np.array([len(set(ws)) for ws in words.to_pylist()],
                        dtype=np.int64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ttr = np.where(n_words > 0, uniq / np.maximum(n_words, 1), 0.0)
        order = np.lexsort((ids, -ttr))[:k]
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids[order], pa.int64()),
            "ttr": pa.array(ttr[order], pa.float64()),
            "g": pa.array(np.zeros(len(order), dtype=np.int32),
                          pa.int32()),
        })

    def _final(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        ttr = group.column("ttr").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -ttr))[:k]
        return pa.Table.from_pydict({
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "doc_id": pa.array(ids[order], pa.int64()),
            "type_token_ratio": pa.array(ttr[order], pa.float64()),
        })

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(_partial, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("g").map_groups(_final, batch_format="pyarrow")


TOP_QUALITY_SQL = """
WITH s AS (
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) = 0 THEN 0.0
              ELSE len(list_distinct(string_split(text, ' ')))
                   / CAST(len(string_split(text, ' ')) AS DOUBLE) END
           AS ttr
  FROM documents
),
r AS (SELECT doc_id, ttr,
             row_number() OVER (ORDER BY ttr DESC, doc_id) AS rank
      FROM s)
SELECT rank::BIGINT AS rank, doc_id, ttr AS type_token_ratio
FROM r WHERE rank <= 20 ORDER BY rank
"""


# ---------------------------------------------------------------------------
# language ID: char-bigram profile nearest-centroid
# ---------------------------------------------------------------------------


class LangID:
    """Char-bigram profile classifier. Profiles are trained once per actor
    from a deterministic seed corpus derived from the per-language priors
    below (no external data); scoring is a sparse dot product."""

    PRIORS = {
        "en": "the and of to in is that it was for on are as with they at",
        "fr": "le la les de des et un une est dans pour que qui sur avec",
        "es": "el la los las de y un una es en que por con para su al",
        "de": "der die das und ist von den ein eine mit auf für nicht im",
        "zh": "的 是 在 了 有 和 人 这 中 大 为 上 个 国 我 以 要 他",
    }

    MAX_BIGRAMS = 4000  # per-doc classification cap (cost bound)

    @staticmethod
    def _codes(s: str) -> "np.ndarray":
        """Bigram uint64 codes of a string: utf-32 decode (one C call),
        adjacent codepoints packed (hi << 32 | lo)."""
        c = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        return (c[:-1].astype(np.uint64) << np.uint64(32)) | c[1:]

    def __init__(self):
        self.profiles = {}   # lang -> (sorted codes, weights)
        for lang, seed in self.PRIORS.items():
            prof: dict[int, float] = {}
            for w in seed.split(" "):
                for bg in self._codes(f" {w} ").tolist():
                    prof[bg] = prof.get(bg, 0.0) + 1.0
            norm = sum(v * v for v in prof.values()) ** 0.5
            codes = np.array(sorted(prof), dtype=np.uint64)
            wts = np.array([prof[c] / norm for c in codes.tolist()])
            self.profiles[lang] = (codes, wts)

    def classify(self, text: str) -> str:
        """Nearest-profile by sparse dot product; fully vectorized (the
        old per-char Python loop is now one utf-32 decode + np.unique +
        searchsorted per language)."""
        bg = self._codes(f" {text} ")[:self.MAX_BIGRAMS]
        ubg, cnt = np.unique(bg, return_counts=True)
        best_lang, best = "en", -1.0
        for lang in sorted(self.profiles):
            codes, wts = self.profiles[lang]
            idx = np.searchsorted(codes, ubg)
            idx_c = np.minimum(idx, len(codes) - 1)
            hit = codes[idx_c] == ubg
            s = float((cnt[hit] * wts[idx_c[hit]]).sum())
            if s > best:
                best, best_lang = s, lang
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t) for t in batch.column("text").to_pylist()]
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "lang": batch.column("lang"),
            "pred_lang": pa.array(preds, pa.string()),
        })


def lang_id(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.select_columns(["doc_id", "text", "lang"]).map_batches(
        LangID, concurrency=(1, 8), batch_size=256, batch_format="pyarrow")


def lang_confusion(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(lang, pred_lang, n_docs) confusion rollup over the raw docs.
    Rows-only surface: the documents table's ``lang`` column is metadata
    unrelated to the text, so this measures the classifier's behavior,
    not an accuracy oracle."""
    return lang_id(docs).groupby(["lang", "pred_lang"]).count() \
        .rename_columns({"count()": "n_docs"})


LANGS_SORTED = sorted(LangID.PRIORS)  # de, en, es, fr, zh


def planted_lang_confusion(docs: ray.data.Dataset) -> ray.data.Dataset:
    """End-to-end language-ID check with a SQL-derivable planted signal:
    doc i gets a deterministic text in lang = LANGS_SORTED[doc_id % 5]
    (three repetitions of that language's seed phrase), runs through the
    REAL actor-pool classifier, and the confusion rollup must be the
    diagonal — which DuckDB can state as pure doc_id arithmetic.
    tests/test_ops.py pins per-language recovery so the oracle equality
    is a classifier property, not an assumption."""

    def _synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        langs = [LANGS_SORTED[i % 5] for i in ids]
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "lang": pa.array(langs, pa.string()),
            "text": pa.array([(LangID.PRIORS[lg] + " ") * 3
                              for lg in langs], pa.string()),
        })

    planted = docs.select_columns(["doc_id"]).map_batches(
        _synth, batch_format="pyarrow", zero_copy_batch=True)
    return planted.map_batches(
        LangID, concurrency=(1, 8), batch_size=256,
        batch_format="pyarrow") \
        .groupby(["lang", "pred_lang"]).count() \
        .rename_columns({"count()": "n_docs"})


PLANTED_LANG_SQL = """
SELECT (['de', 'en', 'es', 'fr', 'zh'])[1 + doc_id % 5] AS lang,
       (['de', 'en', 'es', 'fr', 'zh'])[1 + doc_id % 5] AS pred_lang,
       count(*)::BIGINT AS n_docs
FROM documents GROUP BY 1, 2 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# document fingerprinting: winnowing (Schleimer et al., SIGMOD 2003)
# ---------------------------------------------------------------------------


def winnow_fingerprints(text: str, k: int = 8, window: int = 6) -> set[int]:
    """Min k-gram hash per window (rightmost-min tie rule, Schleimer et
    al. SIGMOD'03). The selected VALUE per window is the window min, so
    the fingerprint-set size is count(DISTINCT window-min) — which is
    how the DuckDB mirror (WINNOW_COUNT_SQL) states it."""
    n = len(text)
    if n < k:
        return {sha64(text)} if text else set()
    hs = [sha64(text[i:i + k]) for i in range(n - k + 1)]
    out: set[int] = set()
    for w in range(max(1, len(hs) - window + 1)):
        win = hs[w:w + window]
        m = min(win)
        # rightmost occurrence of the min
        idx = len(win) - 1 - win[::-1].index(m)
        out.add(hs[w + idx])
    return out


# (doc_id, n_fingerprints) mirror: hashes compare equal as 16-hex-char
# sha256 prefixes; windows are min() over 6 consecutive k-gram hashes,
# truncated-last-window semantics matching winnow_fingerprints.
WINNOW_COUNT_SQL = """
WITH grams AS (
  SELECT doc_id, j AS pos,
         substr(sha256(substr(text, j + 1, 8)), 1, 16) AS h,
         length(text) - 7 AS n_grams
  FROM documents, unnest(generate_series(0, length(text) - 8)) AS t(j)
  WHERE length(text) >= 8
),
wmins AS (
  SELECT doc_id, pos, n_grams,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING) AS wm
  FROM grams
)
SELECT doc_id, count(DISTINCT wm)::BIGINT AS n_fingerprints
FROM wmins WHERE pos <= greatest(0, n_grams - 6) GROUP BY doc_id
UNION ALL
SELECT doc_id, (CASE WHEN length(text) > 0 THEN 1 ELSE 0 END)::BIGINT
FROM documents WHERE length(text) < 8
ORDER BY doc_id
"""


def doc_fingerprints(docs: ray.data.Dataset, k: int = 8,
                     window: int = 6) -> ray.data.Dataset:
    def _fp(batch: pa.Table) -> pa.Table:
        fps = [sorted(winnow_fingerprints(t, k, window))
               for t in batch.column("text").to_pylist()]
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "n_fingerprints": pa.array([len(f) for f in fps], pa.int64()),
            "fingerprints": pa.array(fps, pa.list_(pa.uint64())),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _fp, batch_format="pyarrow")


def _sha_prefix_batch(batch: pa.Table) -> pa.Table:
    out = [hashlib.sha256(t.encode()).hexdigest()[:8]
           for t in batch.column("text").to_pylist()]
    return pa.Table.from_pydict({
        "doc_id": batch.column("doc_id"),
        "sha_prefix": pa.array(out, pa.string()),
    })


def sha_prefixes(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.select_columns(["doc_id", "text"]).map_batches(
        _sha_prefix_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PII redaction (email / IPv4 scrub) — the curation scrub pass
# ---------------------------------------------------------------------------

PII_EMAIL_SRC = r"[a-z0-9._]+@[a-z0-9.-]+"
PII_IP_SRC = r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+"
_PII_EMAIL = re.compile(PII_EMAIL_SRC)
_PII_IP = re.compile(PII_IP_SRC)


def redact_pii(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_emails, n_ips, redacted_sha): scrub emails then IPv4
    addresses to <EMAIL>/<IP> placeholders. Patterns are RE2-compatible
    (greedy, alternation-free), so Python ``re`` and DuckDB
    ``regexp_replace(..., 'g')`` produce IDENTICAL output — the oracle
    hashes the redacted BYTES (sha256), not just counts."""
    import hashlib

    def _scrub(batch: pa.Table) -> pa.Table:
        n_em, n_ip, shas = [], [], []
        for t in batch.column("text").to_pylist():
            n_em.append(len(_PII_EMAIL.findall(t)))
            no_email = _PII_EMAIL.sub("<EMAIL>", t)
            # IPs counted AFTER the email scrub: an address inside an
            # email's host part is scrubbed (and counted) as email
            n_ip.append(len(_PII_IP.findall(no_email)))
            red = _PII_IP.sub("<IP>", no_email)
            shas.append(hashlib.sha256(red.encode()).hexdigest())
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "n_emails": pa.array(n_em, pa.int64()),
            "n_ips": pa.array(n_ip, pa.int64()),
            "redacted_sha": pa.array(shas, pa.string()),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _scrub, batch_format="pyarrow", zero_copy_batch=True)


def planted_pii_docs(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Append deterministic PII derived from doc_id (pure string
    arithmetic, mirrored verbatim in PII_PLANTED_SQL) so the scrub has
    known positives on any corpus."""

    def _plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        planted = [
            f"{t} contact user{d}@ex-{d % 7}.org from 10.{d % 256}.0."
            f"{d % 100}" for d, t in zip(ids, texts)]
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "text": pa.array(planted, pa.string()),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _plant, batch_format="pyarrow", zero_copy_batch=True)


PII_PLANTED_SQL = f"""
WITH p AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@ex-'
              || CAST(doc_id % 7 AS VARCHAR) || '.org from 10.'
              || CAST(doc_id % 256 AS VARCHAR) || '.0.'
              || CAST(doc_id % 100 AS VARCHAR) AS t
  FROM documents)
SELECT doc_id,
       len(regexp_extract_all(t, '{PII_EMAIL_SRC}'))::BIGINT AS n_emails,
       len(regexp_extract_all(
           regexp_replace(t, '{PII_EMAIL_SRC}', '<EMAIL>', 'g'),
           '{PII_IP_SRC}'))::BIGINT AS n_ips,
       sha256(regexp_replace(
           regexp_replace(t, '{PII_EMAIL_SRC}', '<EMAIL>', 'g'),
           '{PII_IP_SRC}', '<IP>', 'g')) AS redacted_sha
FROM p ORDER BY doc_id
"""


# -- repetition signals (Gopher-style quality filters) ----------------------
#
# Rae et al., "Scaling Language Models: Methods, Analysis & Insights from
# Training Gopher" (arXiv:2112.11446) filters documents whose content is
# dominated by repeated n-grams. Two of those signals re-expressed over
# the space-tokenized documents table, fully vectorized per batch:
#   top_bigram_frac - occurrences of the most frequent adjacent word pair
#                     over the total number of adjacent pairs
#   max_run         - longest run of the SAME word repeated consecutively
# Both are exact integer counts (plus one final float64 division shared
# with the SQL mirror), so REPETITION_SQL hash-matches bit-for-bit.


def _repetition_table(batch: pa.Table) -> pa.Table:
    import pandas as pd

    words = pc.split_pattern(batch.column("text"), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    lens = lens.astype(np.int64)
    n_docs = len(lens)
    flat = words.flatten()
    # integer codes for the batch vocabulary (one C pass; no Python loop)
    codes = pd.factorize(flat.to_pandas())[0].astype(np.int64)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)

    top_count = np.zeros(n_docs, np.int64)
    max_run = np.zeros(n_docs, np.int64)
    if codes.size:
        # ---- top bigram count per doc: group (doc, pair) then max ----
        same_doc = doc_idx[:-1] == doc_idx[1:]
        vocab = np.int64(codes.max() + 1)
        pair = codes[:-1][same_doc] * vocab + codes[1:][same_doc]
        pdoc = doc_idx[:-1][same_doc]
        if pair.size:
            order = np.lexsort((pair, pdoc))
            sp, sd = pair[order], pdoc[order]
            new = np.r_[True, (sd[1:] != sd[:-1]) | (sp[1:] != sp[:-1])]
            starts = np.flatnonzero(new)
            counts = np.diff(np.r_[starts, sp.size])
            gdoc = sd[starts]
            dstarts = np.flatnonzero(np.r_[True, gdoc[1:] != gdoc[:-1]])
            top_count[gdoc[dstarts]] = np.maximum.reduceat(counts, dstarts)
        # ---- longest same-word run per doc (tokens already doc-ordered)
        chg = np.r_[True, (codes[1:] != codes[:-1])
                    | (doc_idx[1:] != doc_idx[:-1])]
        rstarts = np.flatnonzero(chg)
        rlens = np.diff(np.r_[rstarts, codes.size])
        rdoc = doc_idx[rstarts]
        rdstarts = np.flatnonzero(np.r_[True, rdoc[1:] != rdoc[:-1]])
        max_run[rdoc[rdstarts]] = np.maximum.reduceat(rlens, rdstarts)

    n_bigrams = np.maximum(lens - 1, 0)
    frac = np.where(n_bigrams > 0,
                    top_count / np.maximum(n_bigrams, 1).astype(np.float64),
                    0.0)
    return pa.Table.from_pydict({
        "doc_id": batch.column("doc_id"),
        "n_bigrams": pa.array(n_bigrams, pa.int64()),
        "top_bigram_count": pa.array(top_count, pa.int64()),
        "top_bigram_frac": pa.array(frac, pa.float64()),
        "max_run": pa.array(max_run, pa.int64()),
    })


def repetition_signals(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-doc repeated-content signals (map-only; text never shuffles)."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        _repetition_table, batch_format="pyarrow", zero_copy_batch=True)


REPETITION_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (
  SELECT doc_id, unnest(ws) AS w, unnest(generate_series(0, len(ws)-1)) AS i
  FROM w
),
big AS (
  SELECT doc_id, unnest(ws[1:len(ws)-1]) AS w1, unnest(ws[2:len(ws)]) AS w2
  FROM w WHERE len(ws) >= 2
),
bc AS (SELECT doc_id, w1, w2, count(*) AS c FROM big GROUP BY doc_id, w1, w2),
topb AS (SELECT doc_id, max(c) AS tc FROM bc GROUP BY doc_id),
runs AS (
  SELECT doc_id, w,
         i - row_number() OVER (PARTITION BY doc_id, w ORDER BY i) AS grp
  FROM tok
),
rl AS (SELECT doc_id, count(*) AS r FROM runs GROUP BY doc_id, w, grp),
mr AS (SELECT doc_id, max(r) AS max_run FROM rl GROUP BY doc_id)
SELECT w.doc_id,
       greatest(len(w.ws) - 1, 0)::BIGINT AS n_bigrams,
       coalesce(t.tc, 0)::BIGINT AS top_bigram_count,
       CASE WHEN len(w.ws) <= 1 THEN 0.0
            ELSE coalesce(t.tc, 0) / CAST(len(w.ws) - 1 AS DOUBLE) END
         AS top_bigram_frac,
       m.max_run::BIGINT AS max_run
FROM w LEFT JOIN topb t ON w.doc_id = t.doc_id
       LEFT JOIN mr m ON w.doc_id = m.doc_id
ORDER BY w.doc_id
"""


# -- benchmark decontamination ----------------------------------------------
#
# Training-data hygiene: flag documents that share any word 5-gram with a
# held-out benchmark suite (the n-gram-overlap decontamination used for
# GPT-3 / Gopher / Llama training sets). The benchmark side is SMALL by
# definition (a benchmark is thousands of prompts, not terabytes), so it
# is collected once, its gram set ray.put once, and each actor resolves
# the broadcast in __init__ - the 100 TB corpus side streams through
# map_batches and never shuffles. Here the "benchmark" is the
# deterministic subset doc_id % DECONTAM_MOD == 0 of the same table so
# the whole flow has an exact DuckDB mirror (DECONTAM_SQL).

DECONTAM_MOD = 20
DECONTAM_K = 5


def _doc_grams(text: str) -> set[str]:
    ws = text.split(" ")
    k = DECONTAM_K
    return {" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)}


def benchmark_gram_set(docs: ray.data.Dataset) -> set[str]:
    """Distinct word 5-grams of the benchmark subset. The driver holds
    only the benchmark grams (bounded by the benchmark suite size), never
    the corpus."""

    def _bench(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = pa.array(ids % DECONTAM_MOD == 0)
        return batch.filter(keep)

    grams: set[str] = set()
    bench = docs.select_columns(["doc_id", "text"]).map_batches(
        _bench, batch_format="pyarrow", zero_copy_batch=True)
    for b in bench.iter_batches(batch_format="pyarrow"):
        for t in b.column("text").to_pylist():
            grams |= _doc_grams(t)
    return grams


class Decontaminator:
    """Actor-pool stage: benchmark gram set resolved ONCE per actor in
    __init__ from the broadcast ref; per batch each doc's distinct grams
    are intersected against it."""

    def __init__(self, grams_ref):
        self._grams = ray.get(grams_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        hits = [len(_doc_grams(t) & self._grams)
                for t in batch.column("text").to_pylist()]
        hits_arr = pa.array(hits, pa.int64())
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "n_gram_hits": hits_arr,
            "contaminated": pc.cast(pc.greater(hits_arr, 0), pa.int64()),
        })


def decontaminate(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Flag corpus docs sharing any 5-gram with the benchmark subset."""
    import ray as _ray
    grams_ref = _ray.put(benchmark_gram_set(docs))
    return docs.select_columns(["doc_id", "text"]).map_batches(
        Decontaminator, fn_constructor_args=(grams_ref,),
        concurrency=(1, 8), batch_size=256, batch_format="pyarrow")


DECONTAM_SQL = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
gi AS (
  SELECT doc_id, ws, unnest(generate_series(0, len(ws)-{DECONTAM_K})) AS i
  FROM w WHERE len(ws) >= {DECONTAM_K}
),
g AS (
  SELECT DISTINCT doc_id,
         ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' ||
         ws[i+4] || ' ' || ws[i+5] AS gram
  FROM gi
),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % {DECONTAM_MOD} = 0),
hits AS (SELECT g.doc_id, count(*) AS nh
         FROM g JOIN bench USING (gram) GROUP BY g.doc_id)
SELECT d.doc_id,
       coalesce(h.nh, 0)::BIGINT AS n_gram_hits,
       CASE WHEN coalesce(h.nh, 0) > 0 THEN 1 ELSE 0 END::BIGINT
         AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
ORDER BY d.doc_id
"""


# -- cross-document duplicated n-gram coverage --------------------------------
#
# The substring-level dedup SIGNAL from "Deduplicating Training Data Makes
# Language Models Better" (Lee et al., ACL 2022): for every document, how
# much of it is made of word n-grams that also occur in OTHER documents.
# Unlike MinHash (whole-doc near-dup) this catches boilerplate headers,
# licence blocks and quoted passages pasted across otherwise-unique docs —
# exactly what a 100 TB curation run trims before training.
#
# Scale shape: the single-exchange inverted-gram pattern (same machinery as
# word_df_stats): pass 1 emits ONE ROW PER DISTINCT GRAM PER BLOCK
# (gram, docs-in-block list), the ONE gram-hash-bucket co-group computes the
# global gram df in-group (docs live in exactly one block, so incidence
# count == distinct-doc count) and unrolls per-doc partial counters; a final
# tiny groupby(doc_id) sums <= 64 partials per doc. Gram text crosses the
# wire once per distinct gram per block; doc text never shuffles.

CROSSDUP_K = 5


def crossdup_signals(docs: ray.data.Dataset,
                     *, k: int = CROSSDUP_K) -> ray.data.Dataset:
    """(doc_id, n_grams, n_dup_grams): distinct word k-grams per doc and
    how many of them occur in >= 2 distinct documents corpus-wide.
    Docs shorter than k words have no grams and emit no row (the SQL
    mirror CROSSDUP_SQL filters identically). Integer-only -> hash-exact."""
    from ray.data.aggregate import Sum

    def _block_gram_partials(batch: pa.Table) -> pa.Table:
        import pandas as pd
        flat_g: list = []
        flat_d: list = []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            ws = t.split(" ")
            gs = {" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)}
            flat_g.extend(gs)
            flat_d.extend([d] * len(gs))
        if not flat_g:
            return pa.Table.from_pydict({
                "gram": pa.array([], pa.string()),
                "docs": pa.array([], pa.list_(pa.int64()))})
        g = pd.Series(flat_d).groupby(pd.Series(flat_g), sort=True).agg(list)
        return pa.Table.from_pydict({
            "gram": pa.array(g.index.tolist(), pa.string()),
            "docs": pa.array(g.tolist(), pa.list_(pa.int64())),
        })

    def _gram_bucket(batch: pa.Table) -> pa.Table:
        import pandas as pd
        arr = np.asarray(batch.column("gram").to_pylist(), dtype=object)
        hb = (pd.util.hash_array(arr) % 64).astype(np.int32)
        return batch.append_column("hb", pa.array(hb))

    def _doc_partials(group: pa.Table) -> pa.Table:
        empty = pa.Table.from_pydict({
            "doc_id": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
            "dup": pa.array([], pa.int64())})
        if group.num_rows == 0:
            return empty
        grams = np.asarray(group.column("gram").to_pylist(), dtype=object)
        docs_col = group.column("docs").combine_chunks()
        lens = pc.list_value_length(docs_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.argsort(grams, kind="stable")
        g_s, lens_s = grams[order], lens[order]
        starts = np.flatnonzero(np.r_[True, g_s[1:] != g_s[:-1]])
        df_per_gram = np.add.reduceat(lens_s, starts)
        gidx = np.cumsum(np.r_[False, g_s[1:] != g_s[:-1]])
        df_per_row = np.empty(len(grams), dtype=np.int64)
        df_per_row[order] = df_per_gram[gidx]
        d_flat = docs_col.flatten().to_numpy(zero_copy_only=False)
        df_flat = df_per_row[pc.list_parent_indices(docs_col).to_numpy(
            zero_copy_only=False)]
        order2 = np.argsort(d_flat, kind="stable")
        d_s = d_flat[order2]
        dup_s = (df_flat[order2] >= 2).astype(np.int64)
        starts2 = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
        return pa.Table.from_pydict({
            "doc_id": pa.array(d_s[starts2], pa.int64()),
            "cnt": pa.array(np.diff(np.r_[starts2, len(d_s)]), pa.int64()),
            "dup": pa.array(np.add.reduceat(dup_s, starts2), pa.int64()),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _block_gram_partials, batch_format="pyarrow",
        zero_copy_batch=True) \
        .map_batches(_gram_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_doc_partials, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Sum("cnt"), Sum("dup")) \
        .rename_columns({"sum(cnt)": "n_grams", "sum(dup)": "n_dup_grams"})


CROSSDUP_SQL = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
gi AS (
  SELECT doc_id, ws, unnest(generate_series(0, len(ws)-{CROSSDUP_K})) AS i
  FROM w WHERE len(ws) >= {CROSSDUP_K}
),
g AS (
  SELECT DISTINCT doc_id,
         ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' ||
         ws[i+4] || ' ' || ws[i+5] AS gram
  FROM gi
),
df AS (SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram)
SELECT g.doc_id,
       count(*)::BIGINT AS n_grams,
       sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_grams
FROM g JOIN df USING (gram)
GROUP BY g.doc_id
ORDER BY g.doc_id
"""


# -- substring-dedup removal intervals ----------------------------------------
#
# The actionable form of the cross-dup signal (the published
# train-data recipe: find substrings duplicated across documents and
# CUT them, rather than dropping whole near-dup docs): for every doc,
# the merged word-index intervals covered by word k-grams that occur in
# >= 2 distinct documents corpus-wide. Dataflow is two narrow
# exchanges — (gram, doc, positions) rows bucket by gram hash to get
# the corpus-wide df and keep only duplicated grams' positions, then
# (doc, pos) rows bucket by doc hash for a vectorized interval merge.
# Document text never shuffles; position rows exist only for
# DUPLICATED grams after the first exchange. Integer word indices end
# to end -> hash-exact SQL mirror (gaps-and-islands window merge).


def dup_spans(docs: ray.data.Dataset,
              *, k: int = CROSSDUP_K) -> ray.data.Dataset:
    """(doc_id, s, e): merged word-index intervals (e exclusive) of all
    k-gram occurrences whose gram appears in >= 2 distinct docs.
    Overlapping or touching intervals merge (with equal gram length and
    sorted starts, an island breaks exactly when start > prev + k)."""

    def _gram_positions(batch: pa.Table) -> pa.Table:
        g_col: list = []
        d_col: list = []
        p_col: list = []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            ws = t.split(" ")
            pos: dict[str, list[int]] = {}
            for i in range(len(ws) - k + 1):
                pos.setdefault(" ".join(ws[i:i + k]), []).append(i)
            g_col.extend(pos.keys())
            d_col.extend([d] * len(pos))
            p_col.extend(pos.values())
        return pa.Table.from_pydict({
            "gram": pa.array(g_col, pa.string()),
            "doc_id": pa.array(d_col, pa.int64()),
            "poss": pa.array(p_col, pa.list_(pa.int64()))})

    def _gram_bucket(batch: pa.Table) -> pa.Table:
        import pandas as pd
        arr = np.asarray(batch.column("gram").to_pylist(), dtype=object)
        hb = (pd.util.hash_array(arr) % 64).astype(np.int32)
        return batch.append_column("hb", pa.array(hb))

    _POS_SCHEMA = pa.schema([("doc_id", pa.int64()),
                             ("pos", pa.int64())])

    def _dup_positions(group: pa.Table) -> pa.Table:
        """df per gram inside the bucket (one row per (gram, doc), so
        row count per gram == distinct-doc count); flatten positions of
        df>=2 grams to (doc_id, pos) rows."""
        if group.num_rows == 0:
            return _POS_SCHEMA.empty_table()
        grams = np.asarray(group.column("gram").to_pylist(), dtype=object)
        order = np.argsort(grams, kind="stable")
        g_s = grams[order]
        starts = np.flatnonzero(np.r_[True, g_s[1:] != g_s[:-1]])
        df_per_gram = np.diff(np.r_[starts, len(g_s)])
        gidx = np.cumsum(np.r_[False, g_s[1:] != g_s[:-1]])
        df_per_row = np.empty(len(grams), dtype=np.int64)
        df_per_row[order] = df_per_gram[gidx]
        keep = df_per_row >= 2
        sub = group.filter(pa.array(keep))
        poss = sub.column("poss").combine_chunks()
        d_flat = sub.column("doc_id").to_numpy(zero_copy_only=False)[
            pc.list_parent_indices(poss).to_numpy(zero_copy_only=False)]
        return pa.Table.from_pydict({
            "doc_id": pa.array(d_flat, pa.int64()),
            "pos": poss.flatten()}, schema=_POS_SCHEMA)

    def _doc_bucket(batch: pa.Table) -> pa.Table:
        from ._shuffle import key_bucket
        return batch.append_column(
            "hb", key_bucket(batch.column("doc_id"), 64))

    _SPAN_SCHEMA = pa.schema([("doc_id", pa.int64()),
                              ("s", pa.int64()), ("e", pa.int64())])

    def _merge_intervals(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _SPAN_SCHEMA.empty_table()
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        p = group.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, d))
        d_s, p_s = d[order], p[order]
        brk = np.r_[True, (d_s[1:] != d_s[:-1]) |
                    (p_s[1:] > p_s[:-1] + k)]
        isl = np.flatnonzero(brk)
        ends = np.r_[isl[1:], len(p_s)] - 1
        return pa.Table.from_pydict({
            "doc_id": pa.array(d_s[isl], pa.int64()),
            "s": pa.array(p_s[isl], pa.int64()),
            "e": pa.array(p_s[ends] + k, pa.int64())}, schema=_SPAN_SCHEMA)

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _gram_positions, batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(_gram_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_dup_positions, batch_format="pyarrow") \
        .map_batches(_doc_bucket, batch_format="pyarrow") \
        .groupby("hb").map_groups(_merge_intervals,
                                  batch_format="pyarrow")


DUP_SPANS_SQL = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
gi AS (
  SELECT doc_id, ws, unnest(generate_series(0, len(ws)-{CROSSDUP_K})) AS i
  FROM w WHERE len(ws) >= {CROSSDUP_K}
),
g AS (
  SELECT doc_id, i,
         ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' ||
         ws[i+4] || ' ' || ws[i+5] AS gram
  FROM gi
),
dup AS (SELECT gram FROM g GROUP BY gram
        HAVING count(DISTINCT doc_id) >= 2),
p AS (SELECT DISTINCT doc_id, i FROM g JOIN dup USING (gram)),
m AS (SELECT doc_id, i,
             CASE WHEN i <= lag(i) OVER (PARTITION BY doc_id ORDER BY i)
                           + {CROSSDUP_K}
                  THEN 0 ELSE 1 END AS brk
      FROM p),
isl AS (SELECT doc_id, i,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS grp
        FROM m)
SELECT doc_id, min(i)::BIGINT AS s, (max(i) + {CROSSDUP_K})::BIGINT AS e
FROM isl GROUP BY doc_id, grp
ORDER BY doc_id, s
"""


# -- text normalization (cleaning) --------------------------------------------
#
# The canonical pre-dedup cleaning stage: lowercase + collapse whitespace
# runs + trim. Map-only (text transforms where it lives; at 100 TB this
# fuses into the scan task). The whitespace class is written explicitly
# ([ \t\n\r\f] — NOT \s) so Python re and DuckDB RE2 match byte-for-byte,
# and the oracle hashes the normalized BYTES (sha256), the same
# exactness discipline as redact_pii. ASCII-scope lower() (the synthetic
# corpus is ASCII; unicode case folding is locale work, out of scope).

_WS_RUN = re.compile(r"[ \t\n\r\f]+")


def normalize_text(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, norm_sha, n_chars_norm, changed): normalized-text
    fingerprint per doc."""
    import hashlib as _hl

    def _norm(batch: pa.Table) -> pa.Table:
        shas, lens, changed = [], [], []
        for t in batch.column("text").to_pylist():
            n = _WS_RUN.sub(" ", t).strip(" ").lower()
            shas.append(_hl.sha256(n.encode()).hexdigest())
            lens.append(len(n))
            changed.append(int(n != t))
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "norm_sha": pa.array(shas, pa.string()),
            "n_chars_norm": pa.array(lens, pa.int64()),
            "changed": pa.array(changed, pa.int64()),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _norm, batch_format="pyarrow", zero_copy_batch=True)


NORMALIZE_SQL = r"""
WITH n AS (
  SELECT doc_id, text,
         lower(trim(regexp_replace(text, '[ \t\n\r\f]+', ' ', 'g'),
                    ' ')) AS norm
  FROM documents)
SELECT doc_id, sha256(norm) AS norm_sha,
       length(norm)::BIGINT AS n_chars_norm,
       CASE WHEN norm = text THEN 0 ELSE 1 END::BIGINT AS changed
FROM n ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# URL / host curation (the domain-level web-pipeline steps)
# ---------------------------------------------------------------------------
#
# Two standard curation primitives over URLs found in document text:
# a per-host rollup (how much of the corpus each domain contributes —
# the input to domain-level quality decisions) and a broadcast
# blocklist filter (drop documents citing a banned host).  Host
# patterns are RE2-compatible so Python ``re`` and DuckDB agree.

URL_HOST_SRC = r"https?://([a-z0-9.-]+)"
_URL_HOST = re.compile(URL_HOST_SRC)


def planted_url_docs(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Append two deterministic URLs per doc (23 cdn hosts, 11 mirror
    hosts — pure doc_id arithmetic, mirrored in the oracles)."""

    def _plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        planted = [
            f"{t} see https://cdn-{d % 23}.example.org/assets/{d} and "
            f"https://mirror-{d % 11}.example.net/pkg/{d % 97}"
            for d, t in zip(ids, texts)]
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "text": pa.array(planted, pa.string()),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _plant, batch_format="pyarrow", zero_copy_batch=True)


def host_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(host, n_urls, n_docs): per-domain URL count and EXACT distinct
    document count.  Block combiner emits one row per distinct
    (host, doc) per block plus its in-block URL count, so the 64-way
    host-hash exchange carries pairs, never text; the per-host distinct
    is computed in-group with a sorted-run sweep."""
    import pandas as pd

    def _pairs(batch: pa.Table) -> pa.Table:
        hosts: list = []
        dids: list = []
        cnts: list = []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            counts: dict[str, int] = {}
            for h in _URL_HOST.findall(t):
                counts[h] = counts.get(h, 0) + 1
            hosts.extend(counts)
            dids.extend([d] * len(counts))
            cnts.extend(counts.values())
        t_out = pa.Table.from_pydict({
            "host": pa.array(hosts, pa.string()),
            "doc_id": pa.array(dids, pa.int64()),
            "n": pa.array(cnts, pa.int64())})
        arr = np.asarray(hosts, dtype=object)
        hb = (pd.util.hash_array(arr) % 64).astype(np.int32) \
            if len(arr) else np.array([], np.int32)
        return t_out.append_column("hb", pa.array(hb, pa.int32()))

    def _rollup(group: pa.Table) -> pa.Table:
        empty = pa.schema([("host", pa.string()),
                           ("n_urls", pa.int64()),
                           ("n_docs", pa.int64())])
        if group.num_rows == 0:
            return empty.empty_table()
        hosts = np.asarray(group.column("host").to_pylist(), dtype=object)
        dids = group.column("doc_id").to_numpy(zero_copy_only=False)
        ns = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((dids, hosts))
        h_s, d_s, n_s = hosts[order], dids[order], ns[order]
        starts = np.flatnonzero(np.r_[True, h_s[1:] != h_s[:-1]])
        n_urls = np.add.reduceat(n_s, starts)
        # distinct docs per host: count run boundaries of (host, doc)
        nd = np.r_[True, (h_s[1:] != h_s[:-1]) | (d_s[1:] != d_s[:-1])]
        n_docs = np.add.reduceat(nd.astype(np.int64), starts)
        return pa.Table.from_pydict({
            "host": pa.array(h_s[starts], pa.string()),
            "n_urls": pa.array(n_urls, pa.int64()),
            "n_docs": pa.array(n_docs, pa.int64())})

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(_pairs, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("hb").map_groups(_rollup, batch_format="pyarrow")


def blocklist_filter(docs: ray.data.Dataset,
                     blocked_hosts: list[str]) -> ray.data.Dataset:
    """(doc_id, n_urls) of documents citing NO blocked host.  The
    blocklist is broadcast ONCE via ray.put and resolved per actor —
    a map-only stage, no shuffle (the blocklist side of a domain-level
    curation decision; the rollup side is ``host_stats``)."""
    import ray

    blocked_ref = ray.put(frozenset(blocked_hosts))

    class _Filter:
        def __init__(self):
            self._blocked = ray.get(blocked_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keep_ids: list = []
            n_urls: list = []
            for d, t in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
                hosts = _URL_HOST.findall(t)
                if not any(h in self._blocked for h in hosts):
                    keep_ids.append(d)
                    n_urls.append(len(hosts))
            return pa.Table.from_pydict({
                "doc_id": pa.array(keep_ids, pa.int64()),
                "n_urls": pa.array(n_urls, pa.int64())})

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _Filter, concurrency=(1, 8), batch_format="pyarrow",
        zero_copy_batch=True)


# blocked: the cdn hosts whose index is divisible by 3 (0,3,...,21)
PLANTED_BLOCKED_HOSTS = [f"cdn-{k}.example.org" for k in range(0, 23, 3)]

_URL_PLANT_SQL = """
  SELECT doc_id,
         text || ' see https://cdn-' || CAST(doc_id % 23 AS VARCHAR)
              || '.example.org/assets/' || CAST(doc_id AS VARCHAR)
              || ' and https://mirror-' || CAST(doc_id % 11 AS VARCHAR)
              || '.example.net/pkg/' || CAST(doc_id % 97 AS VARCHAR) AS t
  FROM documents"""

HOST_STATS_SQL = f"""
WITH p AS ({_URL_PLANT_SQL}),
h AS (
  SELECT doc_id,
         unnest(regexp_extract_all(t, '{URL_HOST_SRC}', 1)) AS host
  FROM p)
SELECT host, count(*)::BIGINT AS n_urls,
       count(DISTINCT doc_id)::BIGINT AS n_docs
FROM h GROUP BY host ORDER BY host
"""

BLOCKLIST_SQL = f"""
WITH p AS ({_URL_PLANT_SQL}),
f AS (
  SELECT doc_id,
         regexp_extract_all(t, '{URL_HOST_SRC}', 1) AS hosts
  FROM p)
SELECT doc_id, len(hosts)::BIGINT AS n_urls
FROM f
WHERE NOT list_has_any(hosts, [{", ".join(
    "'" + h + "'" for h in PLANTED_BLOCKED_HOSTS)}])
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Linear bag-of-words quality classifier (fastText-style model scoring)
# ---------------------------------------------------------------------------
#
# The model-scoring curation step every large pretraining pipeline runs
# (a linear text classifier over bag-of-words features, as popularized
# by fastText and used for CCNet/GPT-3-style quality filtering): fit a
# bounded vocabulary on the corpus, broadcast the (word -> weight) model
# ONCE via ray.put, then score every document in a map-only actor-pool
# pass — the text never shuffles and the model loads once per actor.
#
# The sandbox has no trained model, so weights are derived
# deterministically from sha256(word) (integer in [-8, 8]); the POINT is
# the scale shape — bounded fit, broadcast, vectorized batched inference
# — and the weights being sha-derived makes the whole thing exactly
# DuckDB-mirrorable (CLASSIFIER_SQL), so scoring is hash-exact instead
# of trust-me floats.  Swapping in real learned weights changes only the
# dict contents.
#
# Scale shape: the vocab fit reuses the top_words combiner machinery
# (block partials -> vocab-grain groupby -> bounded top-k merge; never a
# global vocabulary sort), the driver holds exactly V rows, and scoring
# is one zero-copy Arrow pass with a factorize + gather + segmented-sum
# kernel per batch (no per-token Python in the hot loop beyond the
# unique-word weight lookup, which is bounded by distinct words per
# batch).

CLASSIFIER_V = 256  # vocabulary size (driver + broadcast payload is O(V))
_CLASSIFIER_MOD = 17


def _sha_weight(word: str) -> int:
    """Deterministic integer weight in [-8, 8] from sha256(word) — the
    exact expression DuckDB mirrors in CLASSIFIER_SQL."""
    import hashlib as _hl
    return int(_hl.sha256(word.encode()).hexdigest()[:8], 16) \
        % _CLASSIFIER_MOD - 8


def classifier_scores(docs: ray.data.Dataset,
                      *, v: int = CLASSIFIER_V) -> ray.data.Dataset:
    """(doc_id, score, keep): linear bag-of-words score per document
    under the sha-derived model over the top-``v``-DF vocabulary; every
    token occurrence contributes its word's weight (out-of-vocabulary
    words score 0), keep = score >= 0."""
    import ray as _ray

    vocab_rows = top_words(docs, k=v).take_all()  # bounded: v rows
    weights_ref = _ray.put({r["word"]: _sha_weight(r["word"])
                            for r in vocab_rows})

    class _Scorer:
        def __init__(self):
            self._w = _ray.get(weights_ref)  # resolved once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            toks = [t.split(" ")
                    for t in batch.column("text").to_pylist()]
            # split(" ") yields >= 1 token even for "" -> reduceat-safe
            counts = np.array([len(ts) for ts in toks], dtype=np.int64)
            if counts.sum():
                flat = np.asarray([w for ts in toks for w in ts],
                                  dtype=object)
                uniq, inv = np.unique(flat, return_inverse=True)
                w = self._w
                uw = np.fromiter((w.get(u, 0) for u in uniq.tolist()),
                                 dtype=np.int64, count=len(uniq))
                starts = np.r_[0, np.cumsum(counts)[:-1]]
                scores = np.add.reduceat(uw[inv], starts)
            else:
                scores = np.zeros(0, dtype=np.int64)
            return pa.Table.from_pydict({
                "doc_id": batch.column("doc_id"),
                "score": pa.array(scores, pa.int64()),
                "keep": pa.array((scores >= 0).astype(np.int64),
                                 pa.int64()),
            })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _Scorer, concurrency=(1, 8), batch_size=256,
        batch_format="pyarrow", zero_copy_batch=True)


CLASSIFIER_SQL = f"""
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
df AS (SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY word),
vocab AS (
  SELECT word,
         (('0x' || substr(sha256(word), 1, 8))::UBIGINT
            % {_CLASSIFIER_MOD})::BIGINT - 8 AS wt
  FROM df ORDER BY df DESC, word LIMIT {CLASSIFIER_V}),
s AS (SELECT w.doc_id, sum(v.wt)::BIGINT AS sc
      FROM w JOIN vocab v USING (word) GROUP BY w.doc_id)
SELECT d.doc_id, coalesce(s.sc, 0)::BIGINT AS score,
       CASE WHEN coalesce(s.sc, 0) >= 0 THEN 1 ELSE 0 END::BIGINT AS keep
FROM documents d LEFT JOIN s USING (doc_id) ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# classifier-vs-gate threshold sweep (PR curve)
# ---------------------------------------------------------------------------
#
# Curation calibration: before swapping an expensive quality gate for a
# cheap linear classifier at 100 TB, you sweep the classifier threshold
# and measure how well each cut reproduces the gate's keep/drop
# decision — a precision/recall curve with the GATE as ground truth.
# One pass computes both signals per doc (the classifier's
# factorize-gather kernel + the gate's counter predicate on the same
# token split); each block then emits one confusion-count row per grid
# threshold (|grid| rows per block, corpus-size-free), one bounded
# groupby sums them, and precision/recall are integer milli divisions.

PR_THRESHOLDS = (-40, -20, -10, 0, 10, 20, 40)
_PR_MIN_WORDS = 20
_PR_MIN_TTR_PCT = 20


def classifier_pr_curve(docs: ray.data.Dataset, *,
                        v: int = CLASSIFIER_V,
                        thresholds: tuple[int, ...] = PR_THRESHOLDS,
                        min_words: int = _PR_MIN_WORDS,
                        min_ttr_pct: int = _PR_MIN_TTR_PCT
                        ) -> ray.data.Dataset:
    """(threshold, tp, fp, fn, tn, precision_milli, recall_milli):
    confusion counts of "classifier score >= threshold" against the
    curate() gate label (n_words >= min_words AND 100 * n_uniq >=
    min_ttr_pct * n_words), swept over the grid."""
    import ray as _ray

    vocab_rows = top_words(docs, k=v).take_all()  # bounded: v rows
    weights_ref = _ray.put({r["word"]: _sha_weight(r["word"])
                            for r in vocab_rows})
    grid = np.asarray(thresholds, np.int64)

    class _Sweep:
        def __init__(self):
            self._w = _ray.get(weights_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            toks = [t.split(" ")
                    for t in batch.column("text").to_pylist()]
            counts = np.array([len(ts) for ts in toks], dtype=np.int64)
            if counts.sum():
                flat = np.asarray([w for ts in toks for w in ts],
                                  dtype=object)
                uniq_w, inv = np.unique(flat, return_inverse=True)
                w = self._w
                uw = np.fromiter(
                    (w.get(u, 0) for u in uniq_w.tolist()),
                    dtype=np.int64, count=len(uniq_w))
                starts = np.r_[0, np.cumsum(counts)[:-1]]
                scores = np.add.reduceat(uw[inv], starts)
            else:
                scores = np.zeros(len(toks), dtype=np.int64)
            n_uniq = np.fromiter((len(set(ts)) for ts in toks),
                                 np.int64, count=len(toks))
            label = (counts >= min_words) \
                & (100 * n_uniq >= min_ttr_pct * counts)
            pred = scores[:, None] >= grid[None, :]  # (docs, grid)
            lab = label[:, None]
            return pa.Table.from_pydict({
                "threshold": pa.array(grid, pa.int64()),
                "tp": pa.array((pred & lab).sum(axis=0), pa.int64()),
                "fp": pa.array((pred & ~lab).sum(axis=0), pa.int64()),
                "fn": pa.array((~pred & lab).sum(axis=0), pa.int64()),
                "tn": pa.array((~pred & ~lab).sum(axis=0), pa.int64()),
            })

    def _finish(batch: pa.Table) -> pa.Table:
        tp = batch.column("tp").to_numpy(zero_copy_only=False)
        fp = batch.column("fp").to_numpy(zero_copy_only=False)
        fn = batch.column("fn").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "threshold": batch.column("threshold"),
            "tp": batch.column("tp"), "fp": batch.column("fp"),
            "fn": batch.column("fn"), "tn": batch.column("tn"),
            "precision_milli": pa.array(
                (1000 * tp) // np.maximum(tp + fp, 1), pa.int64()),
            "recall_milli": pa.array(
                (1000 * tp) // np.maximum(tp + fn, 1), pa.int64()),
        })

    from ray.data.aggregate import Sum
    summed = docs.select_columns(["doc_id", "text"]).map_batches(
        _Sweep, concurrency=(1, 8), batch_size=256,
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("threshold") \
        .aggregate(*[Sum(c, alias_name=c)
                     for c in ("tp", "fp", "fn", "tn")])
    return summed.map_batches(_finish, batch_format="pyarrow")


def classifier_pr_sql(v: int = CLASSIFIER_V,
                      thresholds: tuple[int, ...] = PR_THRESHOLDS,
                      min_words: int = _PR_MIN_WORDS,
                      min_ttr_pct: int = _PR_MIN_TTR_PCT) -> str:
    """DuckDB mirror of classifier_pr_curve (same vocab, weights, gate
    predicate and integer milli arithmetic)."""
    grid = ", ".join(f"({t})" for t in thresholds)
    return f"""
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
df AS (SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY word),
vocab AS (
  SELECT word,
         (('0x' || substr(sha256(word), 1, 8))::UBIGINT
            % {_CLASSIFIER_MOD})::BIGINT - 8 AS wt
  FROM df ORDER BY df DESC, word LIMIT {v}),
sc AS (SELECT w.doc_id, sum(v.wt)::BIGINT AS sc
       FROM w JOIN vocab v USING (word) GROUP BY w.doc_id),
lab AS (
  SELECT doc_id,
         len(string_split(text, ' '))::BIGINT AS n_words,
         len(list_distinct(string_split(text, ' ')))::BIGINT AS n_uniq
  FROM documents),
per_doc AS (
  SELECT lab.doc_id, coalesce(sc.sc, 0) AS score,
         CASE WHEN lab.n_words >= {min_words}
                   AND 100 * lab.n_uniq >= {min_ttr_pct} * lab.n_words
              THEN 1 ELSE 0 END AS label
  FROM lab LEFT JOIN sc USING (doc_id)),
g AS (SELECT * FROM (VALUES {grid}) AS t(threshold)),
conf AS (
  SELECT g.threshold::BIGINT AS threshold,
         sum(CASE WHEN score >= g.threshold AND label = 1
                  THEN 1 ELSE 0 END)::BIGINT AS tp,
         sum(CASE WHEN score >= g.threshold AND label = 0
                  THEN 1 ELSE 0 END)::BIGINT AS fp,
         sum(CASE WHEN score < g.threshold AND label = 1
                  THEN 1 ELSE 0 END)::BIGINT AS fn,
         sum(CASE WHEN score < g.threshold AND label = 0
                  THEN 1 ELSE 0 END)::BIGINT AS tn
  FROM per_doc CROSS JOIN g GROUP BY g.threshold)
SELECT threshold, tp, fp, fn, tn,
       ((1000 * tp) // greatest(tp + fp, 1))::BIGINT AS precision_milli,
       ((1000 * tp) // greatest(tp + fn, 1))::BIGINT AS recall_milli
FROM conf ORDER BY threshold
"""


# ---------------------------------------------------------------------------
# compression-ratio quality signal (Gopher-style)
# ---------------------------------------------------------------------------
#
# The classic cheap repetition detector (used alongside the explicit
# repetition signals above): highly repetitive / boilerplate text
# compresses far below natural prose, so zlib_ratio_permille =
# 1000 * len(zlib(text)) / len(text) is a strong quality feature.
# Map-only actor-free stage; zlib level is PINNED (level 6) because
# the ratio is part of the output contract.  No SQL engine exposes
# zlib, so this is a rows-only query whose kernel is pinned by a
# brute-force pytest instead — the one-signal exception to the
# everything-has-an-oracle rule, worth it because real curation stacks
# ship exactly this feature.

ZLIB_LEVEL = 6


def compression_signals(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_bytes, n_zbytes, ratio_permille); empty docs emit
    ratio_permille = 1000 (incompressible by convention)."""
    import zlib

    def _comp(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        out_nb, out_zb, out_r = [], [], []
        for t in batch.column("text").to_pylist():
            raw = t.encode()
            z = zlib.compress(raw, ZLIB_LEVEL)
            out_nb.append(len(raw))
            out_zb.append(len(z))
            out_r.append(1000 * len(z) // len(raw) if raw else 1000)
        return pa.Table.from_pydict({
            "doc_id": ids,
            "n_bytes": pa.array(out_nb, pa.int64()),
            "n_zbytes": pa.array(out_zb, pa.int64()),
            "ratio_permille": pa.array(out_r, pa.int64()),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _comp, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# full curation composition: heuristic gates + exact dedup + model score
# ---------------------------------------------------------------------------
#
# The three-stage shape every production curation run composes
# (RefinedWeb/CCNet-style): heuristic quality gates and exact dedup
# (curation_pipeline — one narrow sha/counters exchange) intersected
# with the learned-model keep decision (classifier_scores — bounded
# vocab fit + broadcast weights, map-only).  The intersection is a
# narrow-row hash join on doc_id; document text moves through NOTHING.
# Every stage already has its own exact oracle, and the composition's
# oracle is their CTE conjunction — end-to-end hash-exact.

def curation_scored(docs: ray.data.Dataset,
                    *, v: int = CLASSIFIER_V) -> ray.data.Dataset:
    """(doc_id, text_sha, score): exact-dup survivors passing BOTH the
    integer quality gates and the linear-model keep (score >= 0)."""
    from .joins import hash_join

    surv = curation_pipeline(docs)
    scores = classifier_scores(docs, v=v)

    def _keepers(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater_equal(batch.column("score"), 0)) \
            .select(["doc_id", "score"])

    kept = scores.map_batches(_keepers, batch_format="pyarrow",
                              zero_copy_batch=True)
    return hash_join(surv, kept, left_on="doc_id", right_on="doc_id",
                     left_cols=["text_sha"], right_cols=["score"],
                     how="inner") \
        .rename_columns({"__key": "doc_id"}) \
        .select_columns(["doc_id", "text_sha", "score"])


# ---------------------------------------------------------------------------
# vocabulary novelty: words FIRST INTRODUCED by each document
# ---------------------------------------------------------------------------
#
# The memorization/novelty audit a training-data pipeline runs before
# ordering a curriculum: for every word in the corpus, its OWNER is the
# lowest doc_id containing it; a document's novelty is how many words
# it owns.  Same single-exchange shape as word_df_stats: pass 1 emits
# one (word, min-doc) row per DISTINCT WORD PER BLOCK (never a (word,
# doc) incidence stream), the one word-hash-bucket co-group resolves
# the global min per word in-group, counts words per owner inside the
# bucket (<= 64 partials per doc), and a tiny groupby(doc_id) reduces.
# All integers -> hash-exact SQL mirror (NOVELTY_SQL).


def vocab_novelty(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_new_words) for docs owning >= 1 word."""
    from ray.data.aggregate import Sum

    part_schema = pa.schema([("word", pa.string()),
                             ("mdoc", pa.int64()),
                             ("hb", pa.int32())])
    own_schema = pa.schema([("doc_id", pa.int64()),
                            ("n_new", pa.int64())])

    def _block_min_owner(batch: pa.Table) -> pa.Table:
        import pandas as pd
        if batch.num_rows == 0:
            return part_schema.empty_table()
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        wl = pc.split_pattern(col, " ")
        flat = wl.flatten()
        if len(flat) == 0:
            return part_schema.empty_table()
        parent = pc.list_parent_indices(wl).to_numpy(zero_copy_only=False)
        wcode, wvals = pd.factorize(flat.to_pandas(), sort=True)
        d = doc_ids[parent]
        order = np.argsort(wcode, kind="stable")
        wc_s, d_s = wcode[order], d[order]
        starts = np.flatnonzero(np.r_[True, wc_s[1:] != wc_s[:-1]])
        mdoc = np.minimum.reduceat(d_s, starts)
        words = np.asarray(wvals, dtype=object)[wc_s[starts]]
        hb = (pd.util.hash_array(words) % 64).astype(np.int32)
        return pa.Table.from_pydict({
            "word": pa.array(words.tolist(), pa.string()),
            "mdoc": pa.array(mdoc, pa.int64()),
            "hb": pa.array(hb, pa.int32())}).cast(part_schema)

    def _owner_counts(group: pa.Table) -> pa.Table:
        """One word bucket: global min doc per word, then words-per-
        owner counts (sort + reduceat, no Python loop)."""
        if group.num_rows == 0:
            return own_schema.empty_table()
        words = np.asarray(group.column("word").to_pylist(), dtype=object)
        mdoc = group.column("mdoc").to_numpy(zero_copy_only=False)
        order = np.argsort(words, kind="stable")
        w_s, m_s = words[order], mdoc[order]
        starts = np.flatnonzero(np.r_[True, w_s[1:] != w_s[:-1]])
        owner = np.minimum.reduceat(m_s, starts)
        o_s = np.sort(owner)
        ostarts = np.flatnonzero(np.r_[True, o_s[1:] != o_s[:-1]])
        n_new = np.diff(np.r_[ostarts, len(o_s)])
        return pa.Table.from_pydict({
            "doc_id": pa.array(o_s[ostarts], pa.int64()),
            "n_new": pa.array(n_new.astype(np.int64), pa.int64()),
        }).cast(own_schema)

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(_block_min_owner, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("hb").map_groups(_owner_counts, batch_format="pyarrow") \
        .groupby("doc_id") \
        .aggregate(Sum("n_new", alias_name="n_new_words"))


NOVELTY_SQL = """
WITH wd AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
  FROM documents),
own AS (SELECT w, min(doc_id) AS doc_id FROM wd GROUP BY w)
SELECT doc_id, count(*)::BIGINT AS n_new_words
FROM own GROUP BY doc_id ORDER BY doc_id
"""


# -- line-level quality signals (C4 / FineWeb filter family) -----------------
#
# The corpus has no newlines, so the line structure is derived
# deterministically in BOTH engines: words chunked LINE_WORDS at a
# time, line ln decorated with a trailing '.' when ln % 3 == 0 and a
# leading '- ' when ln % 5 == 0, and every ln % 7 == 3 line replaced by
# an exact copy of the doc's (decorated) line 0 — planting real
# duplicate lines.  Signals are the C4/FineWeb set: duplicate-line
# fraction, terminal-punctuation line fraction, bullet-line fraction,
# short-line fraction (all integer permille).  The Ray kernel never
# materializes line strings: a line is its (word-code x 8, flags) row
# in an integer matrix, distinctness is np.unique(axis=0) — equivalent
# to string distinctness because corpus words contain no '.' or '-'
# (factorized codes are exact string identities).

LINE_WORDS = 8
SHORT_LINE_CHARS = 25


def _line_signal_table(batch: pa.Table) -> pa.Table:
    import pandas as pd

    words = pc.split_pattern(batch.column("text"), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    lens = pc.list_value_length(words).to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_docs = len(lens)
    flat = words.flatten()
    wlens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    codes = pd.factorize(flat.to_pandas())[0].astype(np.int64)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)

    off = np.r_[0, np.cumsum(lens)[:-1]]
    in_doc = np.arange(codes.size, dtype=np.int64) - np.repeat(off, lens)
    ln = in_doc // LINE_WORDS
    pos = in_doc % LINE_WORDS

    n_lines = (lens + LINE_WORDS - 1) // LINE_WORDS
    lstart = np.r_[0, np.cumsum(n_lines)[:-1]]
    gline = np.repeat(lstart, lens) + ln
    total = int(n_lines.sum())

    mat = np.full((total, LINE_WORDS), -1, np.int64)
    mat[gline, pos] = codes
    line_doc = np.repeat(np.arange(n_docs, dtype=np.int64), n_lines)
    line_num = np.arange(total, dtype=np.int64) - np.repeat(lstart,
                                                            n_lines)
    bullet = line_num % 5 == 0
    punct = line_num % 3 == 0
    clen = np.zeros(total, np.int64)
    np.add.at(clen, gline, wlens + 1)
    clen -= 1  # k words -> k-1 separating spaces

    # plant duplicates: ln % 7 == 3 becomes a copy of the doc's line 0
    rep = line_num % 7 == 3
    src = lstart[line_doc]  # gline of line 0 of each line's doc
    mat[rep] = mat[src[rep]]
    clen[rep] = clen[src[rep]]
    bullet[rep] = bullet[src[rep]]
    punct[rep] = punct[src[rep]]
    clen += 2 * bullet + punct  # decoration chars ('- ' and '.')

    key = np.column_stack([line_doc, mat,
                           bullet.astype(np.int64),
                           punct.astype(np.int64)])
    uniq = np.unique(key, axis=0)
    distinct = np.bincount(uniq[:, 0], minlength=n_docs)

    def _permille(flag: np.ndarray) -> np.ndarray:
        per_doc = np.bincount(line_doc, weights=flag.astype(np.float64),
                              minlength=n_docs).astype(np.int64)
        return 1000 * per_doc // n_lines

    return pa.Table.from_pydict({
        "doc_id": batch.column("doc_id"),
        "n_lines": pa.array(n_lines, pa.int64()),
        "dup_line_permille": pa.array(
            1000 * (n_lines - distinct) // n_lines, pa.int64()),
        "punct_line_permille": pa.array(_permille(punct), pa.int64()),
        "bullet_line_permille": pa.array(_permille(bullet), pa.int64()),
        "short_line_permille": pa.array(
            _permille(clen < SHORT_LINE_CHARS), pa.int64()),
    })


def line_signals(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-doc line-level quality signals (map-only; text never
    shuffles)."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        _line_signal_table, batch_format="pyarrow", zero_copy_batch=True)


LINE_SIGNALS_SQL = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (
  SELECT doc_id, unnest(ws) AS wd,
         unnest(generate_series(0, len(ws) - 1)) AS i
  FROM w),
rawline AS (
  SELECT doc_id, i // {LINE_WORDS} AS ln,
         string_agg(wd, ' ' ORDER BY i) AS s
  FROM tok GROUP BY doc_id, i // {LINE_WORDS}),
dec AS (
  SELECT doc_id, ln,
         (CASE WHEN ln % 5 = 0 THEN '- ' ELSE '' END) || s ||
         (CASE WHEN ln % 3 = 0 THEN '.' ELSE '' END) AS line
  FROM rawline),
fin AS (
  SELECT d.doc_id, d.ln,
         CASE WHEN d.ln % 7 = 3 THEN z.line ELSE d.line END AS line,
         (d.ln % 7 = 3 OR d.ln % 3 = 0) AS punct,
         (d.ln % 7 = 3 OR d.ln % 5 = 0) AS bullet
  FROM dec d JOIN dec z ON z.doc_id = d.doc_id AND z.ln = 0)
SELECT doc_id, count(*)::BIGINT AS n_lines,
       (1000 * (count(*) - count(DISTINCT line))) // count(*)
         AS dup_line_permille,
       (1000 * sum(CASE WHEN punct THEN 1 ELSE 0 END)) // count(*)
         AS punct_line_permille,
       (1000 * sum(CASE WHEN bullet THEN 1 ELSE 0 END)) // count(*)
         AS bullet_line_permille,
       (1000 * sum(CASE WHEN length(line) < {SHORT_LINE_CHARS}
                        THEN 1 ELSE 0 END)) // count(*)
         AS short_line_permille
FROM fin GROUP BY doc_id ORDER BY doc_id
"""
