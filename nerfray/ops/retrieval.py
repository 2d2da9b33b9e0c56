"""Corpus retrieval + asymmetric-duplication operators.

Two gaps this module fills in the LLM-pipeline surface:

* ``bm25_topk`` — ranked keyword retrieval over the documents table
  (Robertson/Sparck Jones BM25 shape: df-based idf × saturating tf with
  document-length normalization).  The inverted-index search in
  ops/search.py answers boolean containment; this scores and ranks.
  Parameters are pinned to INTEGER arithmetic so the DuckDB mirror is
  hash-exact (same discipline as ops/text.py's quality scores).

* ``containment_pairs`` — asymmetric near-duplication: doc A whose
  shingle set is mostly CONTAINED in doc B's (quotes, excerpts,
  wholesale inclusion).  Jaccard-based MinHash misses these (a short
  doc inside a long one has low Jaccard but containment 1.0); CC-scale
  dedup pipelines run a containment pass for exactly that reason
  (Broder's containment coefficient, SEQUENCES '97 — public algorithm,
  implemented from scratch).

Reference parity note: the reference (kawu/nerf) has no retrieval
surface; this extends the beyond-reference pipeline like ops/search.py.

Scale shapes:

* BM25: df is computed for the QUERY TERMS ONLY (a per-block
  vectorized membership count -> term-grain groupby of <= |terms| rows
  per block), so nothing vocabulary-sized ever shuffles; N and the
  average length are footer/scalar reductions.  Scoring is one
  broadcast-free map pass (the 3-term stats ride in fn_kwargs), and
  top-k is per-block argpartition partials into one bounded final sort
  — never a global sort of the scored corpus.

* containment: the shingle inverted index is the one exchange (shingle
  -> co-located doc list); ubiquitous shingles past ``df_cap`` are
  DROPPED WHOLE with a measured drop channel (same contract as
  minhash/setjoin caps), pair counts groupby-reduce at pair grain, and
  the |S(A)| side joins back via the key-bucket co-group. Nothing
  text- or corpus-proportional reaches the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

N_HASH_BUCKETS = 64

QUERY_TERMS = ("merge", "hash", "window")
BM25_K = 10

# containment knobs
SHINGLE_WORDS = 4
TAU_MILLI = 800
MIN_SHINGLES = 3
DF_CAP = 64


# ---------------------------------------------------------------------------
# BM25-lite
# ---------------------------------------------------------------------------


def _split_words(batch: pa.Table):
    """texts -> (flat word array, parent doc index, words-per-doc)."""
    import pyarrow.compute as pc
    lists = pc.split_pattern(batch.column("text"), " ")
    flat = lists.combine_chunks().flatten() if isinstance(
        lists, pa.ChunkedArray) else lists.flatten()
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(len(lens)), lens)
    return flat, parent, lens


def _tf_matrix(batch: pa.Table, terms: tuple[str, ...]):
    """Vectorized per-doc term frequencies: (n_docs x n_terms int64,
    doc lengths)."""
    flat, parent, lens = _split_words(batch)
    words = flat.to_numpy(zero_copy_only=False)
    tf = np.zeros((len(lens), len(terms)), np.int64)
    for j, t in enumerate(terms):
        m = words == t
        if m.any():
            tf[:, j] = np.bincount(parent[m], minlength=len(lens))
    return tf, lens


def bm25_stats(docs: ray.data.Dataset,
               terms: tuple[str, ...] = QUERY_TERMS):
    """(df per term, N, avg doc length in words (floor)) — tiny
    aggregates; the driver holds |terms| + 2 integers."""

    def _partial(batch: pa.Table) -> pa.Table:
        tf, lens = _tf_matrix(batch, terms)
        return pa.Table.from_pydict({
            "term": pa.array(list(terms) + ["\x00len", "\x00n"],
                             pa.string()),
            "c": pa.array(list((tf > 0).sum(axis=0).astype(np.int64))
                          + [int(lens.sum()), len(lens)], pa.int64()),
        })

    rows = docs.select_columns(["text"]) \
        .map_batches(_partial, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("term").sum("c").take_all()  # <= |terms| + 2 rows
    agg = {r["term"]: r["sum(c)"] for r in rows}
    n = int(agg.pop("\x00n"))
    total = int(agg.pop("\x00len"))
    avgw = max(total // max(n, 1), 1)
    return {t: int(agg.get(t, 0)) for t in terms}, n, avgw


def bm25_topk(docs: ray.data.Dataset, *,
              terms: tuple[str, ...] = QUERY_TERMS,
              k: int = BM25_K) -> ray.data.Dataset:
    """(rank, doc_id, score_milli): top-k docs by integer-pinned BM25:
    score = Σ_t idf_milli(t) * tfw(t) with
    idf_milli = (1000 * N) // df  (df = 0 terms contribute nothing),
    tfw = (2 * tf) // (tf + 1 + L // avgw)  — saturating tf with
    length normalization, all floor division.  Ties by doc_id asc.
    Mirrored exactly by BM25_SQL."""
    df, n, avgw = bm25_stats(docs, terms)
    idf = {t: (1000 * n) // df[t] for t in terms if df[t] > 0}

    def _score(batch: pa.Table) -> pa.Table:
        live = tuple(idf)
        tf, lens = _tf_matrix(batch, live)
        norm = lens // avgw
        score = np.zeros(len(lens), np.int64)
        for j, t in enumerate(live):
            tfj = tf[:, j]
            score += idf[t] * ((2 * tfj) // (tfj + 1 + norm))
        out = pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "score_milli": pa.array(score, pa.int64()),
        })
        # per-block candidate pruning: only the block's top-k can make
        # the global top-k
        ids = out.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -score))[:k]
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids[order], pa.int64()),
            "score_milli": pa.array(score[order], pa.int64()),
            "g": pa.array(np.zeros(len(order), np.int32), pa.int32()),
        })

    def _final(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        sc = group.column("score_milli").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sc))[:k]
        return pa.Table.from_pydict({
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "doc_id": pa.array(ids[order], pa.int64()),
            "score_milli": pa.array(sc[order], pa.int64()),
        })

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(_score, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("g").map_groups(_final, batch_format="pyarrow")


def bm25_sql(terms: tuple[str, ...] = QUERY_TERMS,
             k: int = BM25_K) -> str:
    """DuckDB mirror of bm25_topk (identical integer arithmetic)."""
    tf_cols = ",\n    ".join(
        f"len(list_filter(string_split(text, ' '), x -> x = '{t}'))"
        f"::BIGINT AS tf_{i}" for i, t in enumerate(terms))
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)::BIGINT AS df_{i}"
        for i in range(len(terms)))
    score = " + ".join(
        f"(CASE WHEN s.df_{i} > 0 THEN ((1000 * s.n) // s.df_{i}) *"
        f" ((2 * tf_{i}) // (tf_{i} + 1 + (L // s.avgw)))"
        f" ELSE 0 END)" for i in range(len(terms)))
    return f"""
WITH tf AS (
  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS L,
    {tf_cols}
  FROM documents
),
s AS (
  SELECT {df_cols}, count(*)::BIGINT AS n,
         greatest(sum(L) // count(*), 1)::BIGINT AS avgw
  FROM tf
),
sc AS (
  SELECT tf.doc_id, ({score})::BIGINT AS score_milli
  FROM tf CROSS JOIN s
),
r AS (SELECT doc_id, score_milli,
             row_number() OVER (ORDER BY score_milli DESC, doc_id)
               AS rank
      FROM sc)
SELECT rank::BIGINT AS rank, doc_id, score_milli
FROM r WHERE rank <= {k} ORDER BY rank
"""


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion of BM25 + dense cosine
# ---------------------------------------------------------------------------

RRF_K = 60          # the standard fusion constant (Cormack/Clarke/Buettcher,
#                     SIGIR'09 "Reciprocal rank fusion" — public algorithm)
RRF_K_EACH = 20     # per-ranker candidate depth
RRF_TOPK = 10


def hybrid_rrf_topk(docs: ray.data.Dataset, emb: ray.data.Dataset, *,
                    terms: tuple[str, ...] = QUERY_TERMS,
                    k_each: int = RRF_K_EACH, k: int = RRF_TOPK,
                    rrf_k: int = RRF_K,
                    emb_path: str | None = None) -> ray.data.Dataset:
    """(rank, doc_id, rrf_micro): reciprocal-rank fusion of the sparse
    BM25 ranker (ops/retrieval.bm25_topk over ``documents``) and the
    dense cosine ranker (ops/similarity.cosine_topk over ``embeddings``,
    query = vector 0; this corpus stores row ``vec_id`` as the embedding
    of document ``doc_id``).  Contribution per list is the integer
    ``1_000_000 // (rrf_k + rank)`` so the fused score is hash-exact in
    the DuckDB mirror; ties by doc_id asc.

    Scale shape: each ranker already reduces to a BOUNDED rank list
    (k_each rows — per-block top-k partials inside the rankers do the
    heavy lifting); the fusion itself is a union + one tiny groupby at
    candidate grain.  Nothing corpus-proportional moves here."""
    from .similarity import cosine_topk

    lex = bm25_topk(docs, terms=terms, k=k_each)
    dense = cosine_topk(emb, k=k_each, n_queries=1,
                        source_path=emb_path)

    def _lex_contrib(batch: pa.Table) -> pa.Table:
        r = batch.column("rank").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "rrf": pa.array(1_000_000 // (rrf_k + r), pa.int64()),
        })

    def _dense_contrib(batch: pa.Table) -> pa.Table:
        r = batch.column("rank").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "doc_id": batch.column("vec_id"),
            "rrf": pa.array(1_000_000 // (rrf_k + r), pa.int64()),
        })

    contribs = lex.map_batches(
        _lex_contrib, batch_format="pyarrow").union(
        dense.map_batches(_dense_contrib, batch_format="pyarrow"))

    def _final(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        sc = group.column("rrf").to_numpy(zero_copy_only=False)
        # candidate grain: combine the (<= 2) per-list contributions
        order = np.argsort(ids, kind="stable")
        ids_s, sc_s = ids[order], sc[order]
        starts = np.flatnonzero(np.r_[True, ids_s[1:] != ids_s[:-1]])
        uniq = ids_s[starts]
        tot = np.add.reduceat(sc_s, starts)
        top = np.lexsort((uniq, -tot))[:k]
        return pa.Table.from_pydict({
            "rank": pa.array(np.arange(1, len(top) + 1), pa.int64()),
            "doc_id": pa.array(uniq[top], pa.int64()),
            "rrf_micro": pa.array(tot[top], pa.int64()),
        })

    def _tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "g", pa.array(np.zeros(batch.num_rows, np.int32)))

    # <= 2 * k_each rows total: one single-group co-group finishes it
    return contribs.map_batches(_tag, batch_format="pyarrow") \
        .groupby("g").map_groups(_final, batch_format="pyarrow")


def hybrid_rrf_sql(terms: tuple[str, ...] = QUERY_TERMS,
                   k_each: int = RRF_K_EACH, k: int = RRF_TOPK,
                   rrf_k: int = RRF_K) -> str:
    """DuckDB mirror of hybrid_rrf_topk: the bm25_sql ranking CTEs
    verbatim (same integer arithmetic) + a float-cosine dense ranking
    (ranks are integers, so the fused score stays hash-exact), unioned
    and re-ranked."""
    tf_cols = ",\n    ".join(
        f"len(list_filter(string_split(text, ' '), x -> x = '{t}'))"
        f"::BIGINT AS tf_{i}" for i, t in enumerate(terms))
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)::BIGINT AS df_{i}"
        for i in range(len(terms)))
    score = " + ".join(
        f"(CASE WHEN s.df_{i} > 0 THEN ((1000 * s.n) // s.df_{i}) *"
        f" ((2 * tf_{i}) // (tf_{i} + 1 + (L // s.avgw)))"
        f" ELSE 0 END)" for i in range(len(terms)))
    return f"""
WITH tf AS (
  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS L,
    {tf_cols}
  FROM documents
),
s AS (
  SELECT {df_cols}, count(*)::BIGINT AS n,
         greatest(sum(L) // count(*), 1)::BIGINT AS avgw
  FROM tf
),
lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY ({score}) DESC, tf.doc_id) AS rank
  FROM tf CROSS JOIN s
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
dense AS (
  SELECT e.vec_id AS doc_id,
         row_number() OVER (
           ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC,
                    e.vec_id) AS rank
  FROM q, embeddings e
),
contrib AS (
  SELECT doc_id, 1000000 // ({rrf_k} + rank) AS rrf
  FROM lex WHERE rank <= {k_each}
  UNION ALL
  SELECT doc_id, 1000000 // ({rrf_k} + rank) AS rrf
  FROM dense WHERE rank <= {k_each}
),
fused AS (
  SELECT doc_id, sum(rrf)::BIGINT AS rrf_micro FROM contrib
  GROUP BY doc_id
),
r AS (SELECT doc_id, rrf_micro,
             row_number() OVER (ORDER BY rrf_micro DESC, doc_id) AS rank
      FROM fused)
SELECT rank::BIGINT AS rank, doc_id, rrf_micro
FROM r WHERE rank <= {k} ORDER BY rank
"""


# ---------------------------------------------------------------------------
# containment (asymmetric near-dup)
# ---------------------------------------------------------------------------


_POLY_BASE = np.uint64(1099511628211)  # FNV prime, uint64 wraparound


def _shingle_hashes(words: np.ndarray, w: int) -> np.ndarray:
    """Distinct word-w-gram shingle hashes: vectorized string hash per
    word, then one sliding-window polynomial combine (no Python loop
    over positions).  The SQL mirror computes set semantics on the
    STRING shingles; equality of the final pair output pins
    hash-collision freedom on the tested corpora."""
    import pandas as pd
    n = len(words) - w + 1
    if n <= 0:
        return np.zeros(0, np.int64)
    wh = pd.util.hash_array(words).astype(np.uint64)
    powers = _POLY_BASE ** np.arange(w - 1, -1, -1, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(wh, w)
    hs = (win * powers[None, :]).sum(axis=1, dtype=np.uint64)
    return (np.unique(hs) >> np.uint64(1)).astype(np.int64)


_SH_SCHEMA = pa.schema([("sh", pa.int64()), ("doc_id", pa.int64()),
                        ("hb", pa.int32())])


def _doc_shingles(batch: pa.Table, *, w: int) -> pa.Table:
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    texts = batch.column("text").to_pylist()
    sh_all, id_all = [], []
    for d, t in zip(ids, texts):
        sh = _shingle_hashes(np.asarray(t.split(" "), dtype=object), w)
        sh_all.append(sh)
        id_all.append(np.full(len(sh), d, np.int64))
    sh = np.concatenate(sh_all) if sh_all else np.zeros(0, np.int64)
    di = np.concatenate(id_all) if id_all else np.zeros(0, np.int64)
    return pa.Table.from_pydict({
        "sh": sh, "doc_id": di,
        "hb": (sh % N_HASH_BUCKETS).astype(np.int32),
    }, schema=_SH_SCHEMA)


_PAIR_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                          ("c", pa.int64())])


def _cooccur_bucket(group: pa.Table, *, df_cap: int,
                    emit_drops: bool) -> pa.Table:
    """Per shingle in the bucket: emit all ordered doc pairs (capped);
    pairs pre-combined inside the bucket. With ``emit_drops`` emit
    (sh, df) rows for capped shingles instead."""
    drop_schema = pa.schema([("sh", pa.int64()), ("df", pa.int64())])
    out_schema = drop_schema if emit_drops else _PAIR_SCHEMA
    if group.num_rows == 0:
        return out_schema.empty_table()
    sh = group.column("sh").to_numpy(zero_copy_only=False)
    di = group.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((di, sh))
    sh_s, di_s = sh[order], di[order]
    starts = np.flatnonzero(np.r_[True, sh_s[1:] != sh_s[:-1]])
    counts = np.diff(np.r_[starts, len(sh_s)])
    if emit_drops:
        over = counts > df_cap
        return pa.Table.from_pydict({
            "sh": pa.array(sh_s[starts[over]], pa.int64()),
            "df": pa.array(counts[over], pa.int64()),
        }, schema=drop_schema)
    a_out, b_out = [], []
    for s, c in zip(starts, counts):
        if c < 2 or c > df_cap:
            continue
        ds = di_s[s:s + c]
        ii, jj = np.meshgrid(ds, ds, indexing="ij")
        m = ii != jj
        a_out.append(ii[m])
        b_out.append(jj[m])
    if not a_out:
        return _PAIR_SCHEMA.empty_table()
    a = np.concatenate(a_out)
    b = np.concatenate(b_out)
    # pre-combine pair counts inside the bucket
    packed = (a.astype(np.uint64) << np.uint64(32)) \
        | b.astype(np.uint64)
    uniq, cnt = np.unique(packed, return_counts=True)
    return pa.Table.from_pydict({
        "doc_a": pa.array((uniq >> np.uint64(32)).astype(np.int64),
                          pa.int64()),
        "doc_b": pa.array((uniq & np.uint64(0xFFFFFFFF))
                          .astype(np.int64), pa.int64()),
        "c": pa.array(cnt.astype(np.int64), pa.int64()),
    }, schema=_PAIR_SCHEMA)


def containment_pairs(docs: ray.data.Dataset, *,
                      shingle_words: int = SHINGLE_WORDS,
                      tau_milli: int = TAU_MILLI,
                      min_shingles: int = MIN_SHINGLES,
                      df_cap: int = DF_CAP) -> ray.data.Dataset:
    """(doc_a, doc_b, inter, size_a, cont_milli): ordered pairs where
    doc_a's word-``shingle_words``-gram shingle set is >= tau_milli/1000
    contained in doc_b's (and |S(a)| >= min_shingles).  cont_milli =
    (1000 * inter) // size_a."""
    import functools

    from .joins import hash_join

    sh = docs.select_columns(["doc_id", "text"]).map_batches(
        _doc_shingles, fn_kwargs={"w": shingle_words},
        batch_format="pyarrow")

    def _sizes(batch: pa.Table) -> pa.Table:
        di = batch.column("doc_id").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(di, return_counts=True)
        return pa.Table.from_pydict({
            "doc_id": pa.array(uniq, pa.int64()),
            "sz": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    sh = sh.materialize()
    sizes = sh.map_batches(_sizes, batch_format="pyarrow")
    # shingles are DISTINCT per doc, so block partials need no combine
    pairs = sh.groupby("hb").map_groups(
        functools.partial(_cooccur_bucket, df_cap=df_cap,
                          emit_drops=False),
        batch_format="pyarrow")

    from .joins import _rename_batches

    # composite-key pair reduce (no id-packing cap — full int64 range);
    # batch-level rename: Project-op rename upstream of hash_join is
    # racy (SCALE.md session-4 lesson).  Materialized: pair grain is
    # the SMALL output, and hash_join's schema peek would otherwise
    # recompute the co-group (and dies on the schema-less empty when
    # every shingle is capped out).
    out_schema = pa.schema([
        ("doc_a", pa.int64()), ("doc_b", pa.int64()),
        ("inter", pa.int64()), ("size_a", pa.int64()),
        ("cont_milli", pa.int64())])
    inter = _rename_batches(pairs.groupby(["doc_a", "doc_b"]).sum("c"),
                            {"sum(c)": "inter"}).materialize()
    if inter.schema(fetch_if_missing=True) is None:
        return ray.data.from_arrow(out_schema.empty_table())

    joined = hash_join(
        inter, sizes,
        left_on="doc_a", right_on="doc_id",
        left_cols=["doc_b", "inter"], right_cols=["sz"])

    def _filter(batch: pa.Table) -> pa.Table:
        a = batch.column("__key").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        it = batch.column("inter").to_numpy(zero_copy_only=False)
        sz = batch.column("sz").to_numpy(zero_copy_only=False)
        cont = (1000 * it) // np.maximum(sz, 1)
        keep = (cont >= tau_milli) & (sz >= min_shingles)
        return pa.Table.from_pydict({
            "doc_a": pa.array(a[keep], pa.int64()),
            "doc_b": pa.array(b[keep], pa.int64()),
            "inter": pa.array(it[keep], pa.int64()),
            "size_a": pa.array(sz[keep], pa.int64()),
            "cont_milli": pa.array(cont[keep], pa.int64()),
        })

    return joined.map_batches(_filter, batch_format="pyarrow")


def containment_drop_counts(docs: ray.data.Dataset, *,
                            shingle_words: int = SHINGLE_WORDS,
                            df_cap: int = DF_CAP) -> ray.data.Dataset:
    """(sh, df) per shingle whose document frequency exceeds df_cap —
    the measured-recall-loss side channel, same contract as
    minhash/setjoin drop counts: a capped shingle is dropped WHOLE
    from pair generation, and this Dataset says exactly which and how
    ubiquitous."""
    import functools

    sh = docs.select_columns(["doc_id", "text"]).map_batches(
        _doc_shingles, fn_kwargs={"w": shingle_words},
        batch_format="pyarrow")
    return sh.groupby("hb").map_groups(
        functools.partial(_cooccur_bucket, df_cap=df_cap,
                          emit_drops=True),
        batch_format="pyarrow")


def planted_boilerplate_docs(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Prepend a fixed 5-word boilerplate to every doc: its two interior
    4-gram shingles then sit in EVERY doc (df = corpus size >> df_cap),
    exercising the drop channel with SQL-checkable counts (the straddle
    shingles mix in per-doc words and stay far below the cap)."""
    import pyarrow.compute as pc

    def _prep(batch: pa.Table) -> pa.Table:
        txt = pc.binary_join_element_wise(
            pa.array(["bp0 bp1 bp2 bp3 bp4"] * batch.num_rows),
            batch.column("text"), " ")
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"), "text": txt})

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _prep, batch_format="pyarrow", zero_copy_batch=True)


def containment_drop_summary(docs: ray.data.Dataset, *,
                             shingle_words: int = SHINGLE_WORDS,
                             df_cap: int = DF_CAP) -> pa.Table:
    """One row (n_dropped, sum_df): how many shingles the df cap
    dropped and how many (shingle, doc) incidences that covered — the
    recall-loss audit a capped containment run reports.  Scalars only
    reach the driver."""
    drops = containment_drop_counts(docs, shingle_words=shingle_words,
                                    df_cap=df_cap).materialize()
    n = drops.count()
    s = int(drops.sum("df") or 0) if n else 0
    return pa.Table.from_pydict({
        "n_dropped": pa.array([n], pa.int64()),
        "sum_df": pa.array([s], pa.int64()),
    })


CONTAINMENT_DROPS_SQL = f"""
WITH d AS (
  SELECT doc_id, 'bp0 bp1 bp2 bp3 bp4 ' || text AS text FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(len(string_split(text, ' ')) - {SHINGLE_WORDS - 1}),
           i -> array_to_string(list_slice(string_split(text, ' '),
                                           i + 1,
                                           i + {SHINGLE_WORDS}), ' ')
         ))) AS s
  FROM d
),
df AS (SELECT s, count(*)::BIGINT AS df FROM sh GROUP BY s)
SELECT count(*)::BIGINT AS n_dropped,
       coalesce(sum(df), 0)::BIGINT AS sum_df
FROM df WHERE df > {DF_CAP}
"""


# -- planted containment corpus: full SQL oracle ----------------------------
#
# group g = doc_id // 5:
#   i%5 == 0  container: 16 tokens T(g, 0..15)
#   i%5 == 1  contained: tokens T(g, 4..11) — all 5 of its 4-gram
#             shingles appear among the container's 13 -> cont 1000
#   i%5 == 2  partial: T(g, 4..7) + N(g, 0..3) — exactly 1 of its 5
#             shingles is shared -> cont 200 < tau
#   i%5 in {3, 4}: pure per-doc noise M(i, 0..7) -> no shared shingles
# T/N/M tokens are sha256-derived 12-hex strings, reproducible in SQL.


def _tok(kind: str, a: int, b: int) -> str:
    return hashlib.sha256(f"{kind}{a}_{b}".encode()).hexdigest()[:12]


def planted_containment_docs(docs: ray.data.Dataset) -> ray.data.Dataset:
    def _synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = []
        for i in ids:
            g, m = i // 5, i % 5
            if m == 0:
                toks = [_tok("t", g, j) for j in range(16)]
            elif m == 1:
                toks = [_tok("t", g, j) for j in range(4, 12)]
            elif m == 2:
                toks = [_tok("t", g, j) for j in range(4, 8)] \
                    + [_tok("n", g, j) for j in range(4)]
            else:
                toks = [_tok("m", i, j) for j in range(8)]
            texts.append(" ".join(toks))
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        })

    return docs.select_columns(["doc_id"]).map_batches(
        _synth, batch_format="pyarrow")


CONTAINMENT_PLANTED_SQL = f"""
WITH d AS (
  SELECT doc_id,
    CASE doc_id % 5
      WHEN 0 THEN array_to_string(list_transform(range(16), j ->
        substr(sha256('t' || (doc_id // 5) || '_' || j), 1, 12)), ' ')
      WHEN 1 THEN array_to_string(list_transform(range(4, 12), j ->
        substr(sha256('t' || (doc_id // 5) || '_' || j), 1, 12)), ' ')
      WHEN 2 THEN array_to_string(list_transform(range(4, 8), j ->
        substr(sha256('t' || (doc_id // 5) || '_' || j), 1, 12)), ' ')
        || ' ' || array_to_string(list_transform(range(4), j ->
        substr(sha256('n' || (doc_id // 5) || '_' || j), 1, 12)), ' ')
      ELSE array_to_string(list_transform(range(8), j ->
        substr(sha256('m' || doc_id || '_' || j), 1, 12)), ' ')
    END AS text
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(len(string_split(text, ' ')) - {SHINGLE_WORDS - 1}),
           i -> array_to_string(list_slice(string_split(text, ' '),
                                           i + 1,
                                           i + {SHINGLE_WORDS}), ' ')
         )) AS s
  FROM d
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.s, b.s))::BIGINT AS inter,
         len(a.s)::BIGINT AS size_a
  FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
)
SELECT doc_a, doc_b, inter, size_a,
       ((1000 * inter) // size_a)::BIGINT AS cont_milli
FROM pairs
WHERE (1000 * inter) // size_a >= {TAU_MILLI}
  AND size_a >= {MIN_SHINGLES}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# two-stage retrieval: BM25 candidate pool -> exact-phrase rerank
# ---------------------------------------------------------------------------
#
# The classic retrieve-then-rerank shape (first-stage cheap scorer over
# the whole corpus, expensive feature only over the bounded candidate
# pool).  Stage 1 is bm25_topk with a wider k = POOL (driver holds POOL
# rows — the same bounded top-k footprint every ranked query here has).
# Stage 2 broadcasts the candidate id->score map via ray.put and
# computes the rerank feature (exact adjacent-phrase count) corpus-side
# in one map pass — candidate TEXTS never move, non-candidates are
# dropped at the block.  Final order: integer rerank score
# 10*bm25 + 5000*phrase_count, ties by doc_id.

RERANK_PHRASE = ("merge", "hash")
RERANK_POOL = 50
RERANK_K = 10


def bm25_rerank_topk(docs: ray.data.Dataset, *,
                     terms: tuple[str, ...] = QUERY_TERMS,
                     phrase: tuple[str, str] = RERANK_PHRASE,
                     pool: int = RERANK_POOL,
                     k: int = RERANK_K) -> ray.data.Dataset:
    """(rank, doc_id, score_milli, phrase_cnt, rerank_milli)."""
    import ray as _ray
    cand = {r["doc_id"]: r["score_milli"]
            for r in bm25_topk(docs, terms=terms, k=pool).take_all()}
    cand_ref = _ray.put(cand)
    t1, t2 = phrase

    def _feat(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        lut = _ray.get(cand_ref) if isinstance(
            cand_ref, _ray.ObjectRef) else cand_ref
        out_schema = pa.schema([
            ("doc_id", pa.int64()), ("score_milli", pa.int64()),
            ("phrase_cnt", pa.int64()), ("g", pa.int32())])
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = np.isin(ids, np.fromiter(lut, np.int64, len(lut)))
        if not keep.any():
            return out_schema.empty_table()
        sub = batch.filter(pa.array(keep))
        words = _pc.split_pattern(sub.column("text"), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        lens = _pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = np.asarray(words.flatten().to_pylist(), dtype=object)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        hit = np.zeros(len(lens), np.int64)
        if flat.size >= 2:
            adj = ((flat[:-1] == t1) & (flat[1:] == t2)
                   & (doc_idx[:-1] == doc_idx[1:]))
            np.add.at(hit, doc_idx[:-1][adj], 1)
        sids = sub.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "doc_id": sids,
            "score_milli": np.asarray([lut[int(i)] for i in sids],
                                      np.int64),
            "phrase_cnt": hit,
            "g": np.zeros(len(sids), np.int32),
        }, schema=out_schema)

    def _final(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        sc = group.column("score_milli").to_numpy(zero_copy_only=False)
        ph = group.column("phrase_cnt").to_numpy(zero_copy_only=False)
        rr = 10 * sc + 5000 * ph
        order = np.lexsort((ids, -rr))[:k]
        return pa.Table.from_pydict({
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "doc_id": pa.array(ids[order], pa.int64()),
            "score_milli": pa.array(sc[order], pa.int64()),
            "phrase_cnt": pa.array(ph[order], pa.int64()),
            "rerank_milli": pa.array(rr[order], pa.int64()),
        })

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(_feat, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("g").map_groups(_final, batch_format="pyarrow")


def bm25_rerank_sql(terms: tuple[str, ...] = QUERY_TERMS,
                    phrase: tuple[str, str] = RERANK_PHRASE,
                    pool: int = RERANK_POOL,
                    k: int = RERANK_K) -> str:
    t1, t2 = phrase
    return f"""
WITH cand AS ({bm25_sql(terms, pool)}),
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      WHERE doc_id IN (SELECT doc_id FROM cand)),
big AS (
  SELECT doc_id, unnest(ws[1:len(ws)-1]) AS w1,
         unnest(ws[2:len(ws)]) AS w2
  FROM w WHERE len(ws) >= 2),
ph AS (
  SELECT w.doc_id,
         (SELECT count(*) FROM big b
          WHERE b.doc_id = w.doc_id
            AND b.w1 = '{t1}' AND b.w2 = '{t2}')::BIGINT AS phrase_cnt
  FROM w),
rr AS (
  SELECT c.doc_id, c.score_milli, ph.phrase_cnt,
         (10 * c.score_milli + 5000 * ph.phrase_cnt)::BIGINT
           AS rerank_milli
  FROM cand c JOIN ph ON ph.doc_id = c.doc_id),
r AS (SELECT *, row_number() OVER
        (ORDER BY rerank_milli DESC, doc_id) AS rank FROM rr)
SELECT rank::BIGINT AS rank, doc_id, score_milli, phrase_cnt,
       rerank_milli
FROM r WHERE rank <= {k} ORDER BY rank
"""
