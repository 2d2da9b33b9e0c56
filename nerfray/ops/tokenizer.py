"""Distributed BPE tokenizer training over the documents corpus.

The missing piece between "token counting" (ops/text.py) and a real
LLM data pipeline: learning the merge table itself.  Byte-pair encoding
training is an iterative global aggregation — count adjacent symbol
pairs across the corpus, merge the argmax pair everywhere, repeat — and
its distributed shape is per-block pair-count partials (vocabulary
grain, never position grain) into one tiny pair-grain exchange per
round, with the chosen merge broadcast back as a scalar rule.  (Sennrich
et al., "Neural Machine Translation of Rare Words with Subword Units",
ACL 2016 — public algorithm, implemented from scratch.)

Reference parity note: the reference engine (kawu/nerf) tokenizes with
a fixed rule set (src/NLP/Nerf/Tokenize.hs); BPE training is part of
the beyond-reference LLM-pipeline surface, like ops/text.py's token
counting.

Exactness: symbols are Unicode codepoints; each round r's merged pair
becomes the single private-use codepoint U+E000+r, so the DuckDB mirror
replays the identical rounds with replace(w, pair, chr(57344+r)) —
string replace's non-overlapping left-to-right semantics IS the BPE
merge rule — and the engine's vectorized kernel reproduces exactly
that (including the odd self-pair case 'aa' in 'aaa': leftmost wins).

Scale shape: texts never shuffle.  Each round moves only (pair, count)
partials — at most the block's distinct-pair vocabulary per block —
through one groupby(pair).sum; the merge rule is two ints broadcast in
fn_kwargs.  The working corpus stays an int32 codepoint-array column
(one row per word, list<int32>), re-materialized once per round, which
at 100 TB is the same footprint discipline as any per-round graph
state here (see stages/graph.py's fused rounds).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

SPACE = 32
MERGE_BASE = 0xE000  # round r's new symbol = chr(MERGE_BASE + r)

_PAIR_SCHEMA = pa.schema([("p1", pa.int64()), ("p2", pa.int64()),
                          ("n", pa.int64())])


def _codepoints(texts: list[str]) -> np.ndarray:
    """All texts joined by a single space, as a uint32 codepoint array
    (the word-boundary space never participates in a pair)."""
    s = " ".join(texts)
    if not s:
        return np.zeros(0, np.uint32)
    return np.frombuffer(s.encode("utf-32-le"), np.uint32)


def _pair_counts(a: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distinct adjacent within-word pairs + multiplicities, vectorized.

    Self-pair runs count non-overlapping occurrences (run length // 2),
    matching replace()'s left-to-right semantics."""
    if len(a) < 2:
        z = np.zeros(0, np.int64)
        return z, z, z
    l, r = a[:-1], a[1:]
    mask = (l != SPACE) & (r != SPACE)
    # non-overlap correction for self-pairs: within a run of k equal
    # chars there are k-1 adjacent pairs but only k//2 merge sites
    self_mask = mask & (l == r)
    if self_mask.any():
        # drop every second position of each consecutive self-pair run
        sm = np.flatnonzero(self_mask)
        runs = np.flatnonzero(np.r_[True, np.diff(sm) != 1])
        # position index within its run
        within = np.arange(len(sm)) - np.repeat(
            np.arange(len(sm))[runs],
            np.diff(np.r_[runs, len(sm)]))
        drop = sm[within % 2 == 1]
        mask = mask.copy()
        mask[drop] = False
    lm, rm = l[mask].astype(np.uint64), r[mask].astype(np.uint64)
    packed = (lm << np.uint64(32)) | rm
    uniq, cnt = np.unique(packed, return_counts=True)
    return ((uniq >> np.uint64(32)).astype(np.int64),
            (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64),
            cnt.astype(np.int64))


def _block_pair_partials(batch: pa.Table) -> pa.Table:
    p1, p2, n = _pair_counts(_codepoints(
        batch.column("text").to_pylist()))
    return pa.Table.from_pydict({"p1": p1, "p2": p2, "n": n},
                                schema=_PAIR_SCHEMA)


def bpe_pair_counts(docs: ray.data.Dataset, *,
                    k: int = 20) -> ray.data.Dataset:
    """(rank, pair, n): the k most frequent adjacent character pairs
    within whitespace words, with multiplicity — BPE round-one
    statistics.  Ties by pair asc, mirrored in BPE_PAIRS_SQL."""

    def _local_topk(batch: pa.Table) -> pa.Table:
        p1 = batch.column("p1").to_numpy(zero_copy_only=False)
        p2 = batch.column("p2").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        pairs = np.asarray([chr(a) + chr(b) for a, b in zip(p1, p2)],
                           dtype=object)
        order = np.lexsort((pairs, -n))[:k]
        return pa.Table.from_pydict({
            "pair": pa.array(pairs[order], pa.string()),
            "n": pa.array(n[order], pa.int64()),
            "g": pa.array(np.zeros(len(order), np.int32), pa.int32()),
        })

    def _final(group: pa.Table) -> pa.Table:
        pairs = np.asarray(group.column("pair").to_pylist(),
                           dtype=object)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((pairs, -n))[:k]
        return pa.Table.from_pydict({
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "pair": pa.array(pairs[order], pa.string()),
            "n": pa.array(n[order], pa.int64()),
        })

    # pair key for the exchange: packed into one int64 (p1 < 2^21 holds
    # for all of Unicode, so the pack is collision-free)
    def _packed(batch: pa.Table) -> pa.Table:
        p1 = batch.column("p1").to_numpy(zero_copy_only=False)
        p2 = batch.column("p2").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "pk": pa.array(p1 * (1 << 21) + p2, pa.int64()),
            "n": batch.column("n"),
        })

    def _unpack(batch: pa.Table) -> pa.Table:
        pk = batch.column("pk").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "p1": pa.array(pk >> 21, pa.int64()),
            "p2": pa.array(pk & ((1 << 21) - 1), pa.int64()),
            "n": batch.column("sum(n)"),
        })

    return docs.select_columns(["text"]) \
        .map_batches(_block_pair_partials, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .map_batches(_packed, batch_format="pyarrow") \
        .groupby("pk").sum("n") \
        .map_batches(_unpack, batch_format="pyarrow") \
        .map_batches(_local_topk, batch_format="pyarrow") \
        .groupby("g").map_groups(_final, batch_format="pyarrow")


def _apply_merge(a: np.ndarray, p1: int, p2: int,
                 sym: int) -> np.ndarray:
    """Replace non-overlapping (p1, p2) occurrences left-to-right with
    ``sym`` — exactly replace()'s semantics on the codepoint array."""
    if len(a) < 2:
        return a
    hit = np.flatnonzero((a[:-1] == p1) & (a[1:] == p2))
    if len(hit) == 0:
        return a
    if p1 == p2:
        # overlap only possible for self-pairs: keep leftmost of each
        # consecutive run, then every other
        runs = np.flatnonzero(np.r_[True, np.diff(hit) != 1])
        within = np.arange(len(hit)) - np.repeat(
            np.arange(len(hit))[runs],
            np.diff(np.r_[runs, len(hit)]))
        hit = hit[within % 2 == 0]
    out = a.copy()
    out[hit] = sym
    keep = np.ones(len(a), bool)
    keep[hit + 1] = False
    return out[keep]


def bpe_train_merges(docs: ray.data.Dataset, *,
                     rounds: int = 3) -> ray.data.Dataset:
    """(round, pair, n): the merge chosen each round (argmax count,
    ties by (p1, p2) asc) after applying all previous rounds' merges.
    Per round: one vocabulary-grain pair exchange + one broadcast-rule
    map over the working corpus; the driver holds two ints per round."""
    chosen, _state = _train(docs.select_columns(["text"]), rounds)
    return ray.data.from_arrow(pa.Table.from_pydict({
        "round": pa.array([c[0] for c in chosen], pa.int64()),
        "pair": pa.array([c[1] for c in chosen], pa.string()),
        "n": pa.array([c[2] for c in chosen], pa.int64()),
    }))


def bpe_encode_stats(docs: ray.data.Dataset, *,
                     rounds: int = 3) -> ray.data.Dataset:
    """(doc_id, n_syms): per-doc symbol count after encoding with the
    ``rounds`` merges learned from the SAME corpus — the sequence-length
    budget a tokenizer change buys.  Training is the merge loop above
    (doc_id rides along); the count is a map-only final pass."""
    _chosen, state = _train(
        docs.select_columns(["doc_id", "text"]), rounds)

    def _counts(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = [sum(len(w) for w in t.split(" ") if w) for t in texts]
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "n_syms": pa.array(np.asarray(n, np.int64), pa.int64()),
        })

    return state.map_batches(_counts, batch_format="pyarrow")


def _train(state: ray.data.Dataset, rounds: int):
    """The shared merge-training loop; ``state`` rows carry a text
    column (plus any id columns, preserved through merge application).
    Returns (chosen merges, final encoded state)."""
    state = state.materialize()
    chosen: list[tuple[int, str, int]] = []
    for r in range(rounds):
        parts = state.map_batches(_block_pair_partials,
                                  batch_format="pyarrow",
                                  zero_copy_batch=True)
        agg: dict[tuple[int, int], int] = {}
        # pair-grain exchange: pack -> groupby -> take the tiny result
        def _packed(batch: pa.Table) -> pa.Table:
            p1 = batch.column("p1").to_numpy(zero_copy_only=False)
            p2 = batch.column("p2").to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict({
                "pk": pa.array(p1 * (1 << 21) + p2, pa.int64()),
                "n": batch.column("n"),
            })

        counts = parts.map_batches(_packed, batch_format="pyarrow") \
            .groupby("pk").sum("n")
        # argmax via a bounded per-block topk then one driver min over
        # <= n_blocks rows (count desc, pair asc)
        def _block_best(batch: pa.Table) -> pa.Table:
            pk = batch.column("pk").to_numpy(zero_copy_only=False)
            n = batch.column("sum(n)").to_numpy(zero_copy_only=False)
            if len(pk) == 0:
                return pa.schema([("pk", pa.int64()),
                                  ("n", pa.int64())]).empty_table()
            order = np.lexsort((pk, -n))[:1]
            return pa.Table.from_pydict({
                "pk": pa.array(pk[order], pa.int64()),
                "n": pa.array(n[order], pa.int64()),
            })

        best = counts.map_batches(_block_best,
                                  batch_format="pyarrow").take_all()
        if not best:
            break
        bn = max(r2["n"] for r2 in best)
        bpk = min(r2["pk"] for r2 in best if r2["n"] == bn)
        p1, p2 = int(bpk) >> 21, int(bpk) & ((1 << 21) - 1)
        sym = MERGE_BASE + r
        chosen.append((r, chr(p1) + chr(p2), int(bn)))

        def _merge_batch(batch: pa.Table, *, p1=p1, p2=p2,
                         sym=sym) -> pa.Table:
            texts = batch.column("text").to_pylist()
            out = []
            for t in texts:
                a = np.frombuffer(t.encode("utf-32-le"), np.uint32) \
                    if t else np.zeros(0, np.uint32)
                m = _apply_merge(a.astype(np.int64), p1, p2, sym)
                out.append("".join(map(chr, m)))
            i = batch.schema.get_field_index("text")
            return batch.set_column(i, "text",
                                    pa.array(out, pa.string()))

        state = state.map_batches(_merge_batch,
                                  batch_format="pyarrow").materialize()
    return chosen, state


def bpe_merges_sql(rounds: int = 3, *, encode: bool = False) -> str:
    """DuckDB mirror of ``bpe_train_merges`` (and, with
    ``encode=True``, of ``bpe_encode_stats``): replays each round with
    the same argmax rule and replace()-based merge application (round
    r's symbol = chr(57344 + r), exactly the engine's MERGE_BASE).
    Self-pair counts use the replace length-drop identity; the dummy
    char's identity is irrelevant — only the length arithmetic is used.
    """
    parts = ["WITH w0 AS (SELECT doc_id, "
             "unnest(string_split(text, ' ')) AS w FROM documents)"]
    selects = []
    for r in range(rounds):
        parts.append(f"""
adj{r} AS (
  SELECT unnest(list_transform(range(len(w) - 1),
                               i -> substr(w, i + 1, 2))) AS pair
  FROM w{r} WHERE len(w) >= 2
),
c0_{r} AS (SELECT pair, count(*)::BIGINT AS n_adj FROM adj{r}
           GROUP BY pair),
selfp_{r} AS (SELECT DISTINCT pair FROM c0_{r}
              WHERE substr(pair, 1, 1) = substr(pair, 2, 1)),
selfc_{r} AS (
  SELECT s.pair,
         sum(len(w.w) - len(replace(w.w, s.pair,
                                    chr(57344))))::BIGINT AS n
  FROM w{r} w CROSS JOIN selfp_{r} s GROUP BY s.pair
),
cnt{r} AS (
  SELECT c0.pair, coalesce(sc.n, c0.n_adj) AS n
  FROM c0_{r} c0 LEFT JOIN selfc_{r} sc USING (pair)
),
best{r} AS (SELECT pair, n FROM cnt{r} ORDER BY n DESC, pair LIMIT 1),
w{r + 1} AS (
  SELECT doc_id,
         replace(w, (SELECT pair FROM best{r}), chr({57344 + r})) AS w
  FROM w{r}
)""")
        selects.append(
            f"SELECT {r}::BIGINT AS round, pair, n::BIGINT AS n "
            f"FROM best{r}")
    if encode:
        final = (f"SELECT doc_id, sum(len(w))::BIGINT AS n_syms "
                 f"FROM w{rounds} GROUP BY doc_id ORDER BY doc_id")
        return ",".join(parts) + "\n" + final
    return (",".join(parts) + "\n"
            + "\nUNION ALL ".join(selects) + "\nORDER BY round")


BPE_PAIRS_SQL = """
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
pr AS (
  SELECT unnest(list_transform(range(len(w) - 1),
                               i -> substr(w, i + 1, 2))) AS pair
  FROM w WHERE len(w) >= 2
),
c0 AS (SELECT pair, count(*)::BIGINT AS n_adj FROM pr GROUP BY pair),
-- replace()-exact correction for self-pairs ('aa' in 'aaa' merges
-- once, not twice): the number of left-to-right non-overlapping
-- merges of `pair` in a word is EXACTLY the length drop of
-- replace(word, pair, one_char).  Only self-pairs can overlap, and
-- there are at most |alphabet| of them, so the cross join is tiny.
selfp AS (SELECT DISTINCT pair FROM c0
          WHERE substr(pair, 1, 1) = substr(pair, 2, 1)),
selfc AS (
  SELECT s.pair,
         sum(len(w.w) - len(replace(w.w, s.pair,
                                    chr(57344))))::BIGINT AS n
  FROM w CROSS JOIN selfp s GROUP BY s.pair
),
c AS (
  SELECT c0.pair, coalesce(sc.n, c0.n_adj) AS n
  FROM c0 LEFT JOIN selfc sc USING (pair)
),
r AS (SELECT pair, n, row_number() OVER (ORDER BY n DESC, pair) AS rank
      FROM c)
SELECT rank::BIGINT AS rank, pair, n::BIGINT AS n
FROM r WHERE rank <= 20 ORDER BY rank
"""
