"""Product-quantization ANN over the ``embeddings`` table.

The canonical 100-TB vector-search memory shape (Jégou, Douze, Schmid,
"Product quantization for nearest neighbor search", TPAMI 2011 — public
algorithm, implemented from scratch): vectors are split into ``M``
subspaces, each subspace k-means'd to ``ksub`` centroids, and every
vector is stored as ``M`` small codes (1 byte each at ksub<=256) —
a 64-dim float64 vector (512 B) compresses to 8 B, so a worker's heap
holds 64x more corpus per batch and the object store ships codes, not
floats.  Queries score codes without decompressing via ADC (asymmetric
distance computation): one (M x ksub) lookup table of
query-subvector x centroid inner products per query, then
score(v) = sum_m LUT[m, code(v, m)] — a gather + sum, no matmul against
the corpus.

Scale shape mirrors ``ops/similarity.py``'s IVF path:

* codebooks are trained driver-side on a bounded sample (M x ksub x dsub
  floats — ~64 KiB at the defaults) and broadcast once via ``ray.put``;
* encode + ADC run inside ``map_batches`` actors (codebooks/LUTs built
  in ``__init__``, once per actor, not per batch);
* per-block top-k partials (k rows per query per block) are the only
  thing that crosses the wire; the final top-k is one bounded
  ``groupby(query_id)`` over n_queries x n_blocks x k rows.

Correctness: float ADC scores are rows-only on real embeddings
(``sim_pq``); the planted variant (``sim_pq_planted``) uses the shared
planted-direction corpus from ops/similarity.py, where per-subspace
unique patterns (<= 50 groups) fit inside ``ksub`` centroids, so
quantization is EXACT and the PQ top-k must equal the brute-force
planted oracle (TOPK_PLANTED_SQL) bit-for-bit.

Reference parity note: the reference (kawu/nerf, 1,946 LoC Haskell NER
engine) has no vector surface; this extends the beyond-reference
LLM-pipeline stack like ops/similarity.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .similarity import N_QUERIES, _final_topk, _query_matrix

M_SUB = 8        # subspaces
KSUB = 64        # centroids per subspace (6-bit codes)
SAMPLE_SIZE = 2048
KMEANS_ITERS = 10


def train_pq_codebooks(sample: np.ndarray, *, m_sub: int = M_SUB,
                       ksub: int = KSUB, iters: int = KMEANS_ITERS,
                       normalize: bool = True) -> np.ndarray:
    """(m_sub, ksub, dsub) codebooks via seeded Lloyd k-means per
    subspace.  Init is the first ``ksub`` UNIQUE sub-vectors under a
    seeded shuffle: when the sample has <= ksub distinct patterns in a
    subspace (the planted corpus), every pattern becomes its own
    centroid and quantization is exact; surplus centroid slots repeat
    the last unique row and never win an argmin that an exact centroid
    would.

    ``normalize`` L2-normalizes rows first — right for whole vectors
    under cosine semantics (pq_topk), WRONG for IVF residuals, whose
    norms carry signal: ivf_pq_topk passes normalize=False so train
    and encode see the same geometry."""
    n, d = sample.shape
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible by m_sub {m_sub}")
    dsub = d // m_sub
    x = sample / np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-12) \
        if normalize else sample
    rng = np.random.default_rng(29)
    perm = rng.permutation(n)
    books = np.empty((m_sub, ksub, dsub), np.float64)
    for m in range(m_sub):
        sub = x[:, m * dsub:(m + 1) * dsub]
        shuffled = sub[perm]
        uniq, first = np.unique(shuffled, axis=0, return_index=True)
        uniq = uniq[np.argsort(first)][:ksub]           # sample order
        cents = np.resize(uniq, (ksub, dsub))           # pad by repeat
        exact = len(uniq) <= ksub and len(uniq) == len(
            np.unique(sub, axis=0))
        for _ in range(0 if exact else iters):
            # argmin ||s - c||^2 == argmax s.c - ||c||^2 / 2
            aff = sub @ cents.T - 0.5 * (cents * cents).sum(axis=1)
            assign = np.argmax(aff, axis=1)
            for c in range(ksub):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[m] = cents
    return books


def pq_encode(vecs: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m_sub) uint8 codes; vectors L2-normalized first (cosine
    semantics, matching ops/similarity.py's rankers)."""
    m_sub, ksub, dsub = books.shape
    x = vecs / np.maximum(
        np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    codes = np.empty((len(x), m_sub), np.uint8)
    for m in range(m_sub):
        sub = x[:, m * dsub:(m + 1) * dsub]
        aff = sub @ books[m].T - 0.5 * (books[m] * books[m]).sum(axis=1)
        codes[:, m] = np.argmax(aff, axis=1)
    return codes


def pq_topk(emb: ray.data.Dataset, *, k: int = 10, m_sub: int = M_SUB,
            ksub: int = KSUB, sample_size: int = SAMPLE_SIZE,
            n_queries: int = N_QUERIES,
            source_path: str | None = None) -> ray.data.Dataset:
    """(query_id, rank, vec_id): ADC top-k per query over PQ codes.

    One pass: each batch is encoded and immediately ADC-scored (at
    100 TB the codes would be written once by an encode pass and this
    stage would read the 64x-smaller code table; single-pass here keeps
    the bench honest about total work)."""
    sample_rows = emb.select_columns(["embedding"]) \
        .limit(sample_size).take_all()
    books = train_pq_codebooks(
        np.array([r["embedding"] for r in sample_rows], np.float64),
        m_sub=m_sub, ksub=ksub)
    q = _query_matrix(emb, n_queries, source_path)
    books_ref = ray.put(books)
    q_ref = ray.put(q)

    class AdcScores:
        def __init__(self):
            self.books = ray.get(books_ref)
            qm = ray.get(q_ref)
            qn = qm / np.maximum(
                np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
            ms, kc, dsub = self.books.shape
            # (n_queries, m_sub, ksub) inner-product lookup tables
            self.lut = np.einsum(
                "qmd,mkd->qmk",
                qn.reshape(len(qn), ms, dsub), self.books)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = np.array(batch.column("embedding").to_pylist(),
                            np.float64)
            ids = np.asarray(batch.column("vec_id").to_pylist(),
                             np.int64)
            codes = pq_encode(vecs, self.books)
            qs, vs, ss = [], [], []
            cols = np.arange(codes.shape[1])
            kk = min(self.k, len(ids))
            for qi in range(self.lut.shape[0]):
                # gather + fixed-order sum: deterministic float scores
                row = self.lut[qi][cols, codes].sum(axis=1)
                idx = np.lexsort((ids, -row))[:kk]
                qs.extend([qi] * len(idx))
                vs.extend(ids[idx].tolist())
                ss.extend(row[idx].tolist())
            return pa.Table.from_pydict({
                "query_id": pa.array(qs, pa.int64()),
                "vec_id": pa.array(vs, pa.int64()),
                "score": pa.array(ss, pa.float64()),
            })

    partials = emb.select_columns(["vec_id", "embedding"]).map_batches(
        AdcScores, concurrency=(1, 4), batch_size=2048,
        batch_format="pyarrow")
    return partials.groupby("query_id").map_groups(
        _final_topk, fn_kwargs={"k": k}, batch_format="pyarrow")


def pq_code_histogram(emb: ray.data.Dataset, *, m_sub: int = M_SUB,
                      ksub: int = KSUB,
                      sample_size: int = SAMPLE_SIZE) -> ray.data.Dataset:
    """(subspace, code, n): code-utilization audit — dead centroids and
    hot codes are THE quantizer-quality signal a 100-TB PQ build
    monitors.  Per-block (subspace, code) bincount partials (m_sub x
    ksub rows per block, corpus-size-free) into one bounded groupby."""
    sample_rows = emb.select_columns(["embedding"]) \
        .limit(sample_size).take_all()
    books = train_pq_codebooks(
        np.array([r["embedding"] for r in sample_rows], np.float64),
        m_sub=m_sub, ksub=ksub)
    books_ref = ray.put(books)

    class CodeCounts:
        def __init__(self):
            self.books = ray.get(books_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = np.array(batch.column("embedding").to_pylist(),
                            np.float64)
            codes = pq_encode(vecs, self.books)
            ms, kc = self.books.shape[0], self.books.shape[1]
            flat = np.bincount(
                (np.arange(ms) * kc + codes).ravel(), minlength=ms * kc)
            nz = np.flatnonzero(flat)
            return pa.Table.from_pydict({
                "subspace": pa.array((nz // kc).astype(np.int64)),
                "code": pa.array((nz % kc).astype(np.int64)),
                "n": pa.array(flat[nz].astype(np.int64)),
            })

    from .joins import _rename_batches
    counts = emb.select_columns(["embedding"]).map_batches(
        CodeCounts, concurrency=(1, 4), batch_size=2048,
        batch_format="pyarrow")
    return _rename_batches(
        counts.groupby(["subspace", "code"]).sum("n"), {"sum(n)": "n"})


# ---------------------------------------------------------------------------
# IVF-PQ: coarse inverted lists + residual product quantization
# ---------------------------------------------------------------------------


def ivf_pq_topk(emb: ray.data.Dataset, *, k: int = 10,
                n_lists: int = 16, n_probe: int = 4,
                m_sub: int = M_SUB, ksub: int = KSUB,
                sample_size: int = SAMPLE_SIZE,
                n_queries: int = N_QUERIES,
                source_path: str | None = None) -> ray.data.Dataset:
    """(query_id, rank, vec_id): the standard billion-vector layout
    (FAISS-style IVF-PQ, Jégou TPAMI 2011 §V): a coarse k-means
    quantizer routes each vector to one of ``n_lists`` inverted lists,
    and only the RESIDUAL x - centroid(list) is PQ-coded.  A query
    probes its ``n_probe`` nearest lists and scores
    q·centroid(list) + q·residual via the ADC lookup tables — the
    centroid term is one scalar per list, the residual term a gather +
    fixed-order sum over 8 codes.

    Scale shape: coarse centroids + residual codebooks are trained
    driver-side on one bounded sample and broadcast; each worker batch
    assigns, encodes and scores locally; only per-block top-k partials
    cross the wire.  At 100 TB the probe discipline is the point: a
    query touches n_probe/n_lists of the corpus, and each touched
    vector costs an 8-byte code gather, not a 512-byte float read.

    On the planted corpus (<= 50 distinct directions) each group lands
    in one list with one residual pattern, so <= 50 distinct residual
    sub-patterns fit ksub=64 centroids exactly -> ADC scores equal true
    cosines and the result must match the brute-force planted oracle."""
    from .similarity import _kmeans

    sample_rows = emb.select_columns(["embedding"]) \
        .limit(sample_size).take_all()
    sample = np.array([r["embedding"] for r in sample_rows], np.float64)
    sample /= np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cents = _kmeans(sample, n_lists)
    assign_s = np.argmax(sample @ cents.T, axis=1)
    books = train_pq_codebooks(sample - cents[assign_s],
                               m_sub=m_sub, ksub=ksub,
                               normalize=False)
    q = _query_matrix(emb, n_queries, source_path)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    probes = np.argsort(-(qn @ cents.T), axis=1)[:, :n_probe]
    cents_ref = ray.put(cents)
    books_ref = ray.put(books)
    q_ref = ray.put(qn)

    class IvfAdcScores:
        def __init__(self):
            self.cents = ray.get(cents_ref)
            self.books = ray.get(books_ref)
            self.q = ray.get(q_ref)
            ms, kc, dsub = self.books.shape
            self.lut = np.einsum(
                "qmd,mkd->qmk",
                self.q.reshape(len(self.q), ms, dsub), self.books)
            self.cterm = self.q @ self.cents.T  # (n_queries, n_lists)
            self.probes = probes
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = np.array(batch.column("embedding").to_pylist(),
                            np.float64)
            ids = np.asarray(batch.column("vec_id").to_pylist(),
                             np.int64)
            vn = vecs / np.maximum(
                np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
            assign = np.argmax(vn @ self.cents.T, axis=1)
            # residual codes for the whole batch (one vectorized pass;
            # pq_encode normalizes internally, so encode directly)
            resid = vn - self.cents[assign]
            ms, kc, dsub = self.books.shape
            codes = np.empty((len(vn), ms), np.uint8)
            for m in range(ms):
                sub = resid[:, m * dsub:(m + 1) * dsub]
                aff = sub @ self.books[m].T \
                    - 0.5 * (self.books[m] * self.books[m]).sum(axis=1)
                codes[:, m] = np.argmax(aff, axis=1)
            cols = np.arange(ms)
            qs, vs, ss = [], [], []
            for qi in range(len(self.q)):
                mask = np.isin(assign, self.probes[qi])
                if not mask.any():
                    continue
                sub_codes = codes[mask]
                row = self.lut[qi][cols, sub_codes].sum(axis=1) \
                    + self.cterm[qi][assign[mask]]
                sub_ids = ids[mask]
                kk = min(self.k, len(sub_ids))
                idx = np.lexsort((sub_ids, -row))[:kk]
                qs.extend([qi] * len(idx))
                vs.extend(sub_ids[idx].tolist())
                ss.extend(row[idx].tolist())
            out_schema = pa.schema([
                ("query_id", pa.int64()), ("vec_id", pa.int64()),
                ("score", pa.float64())])
            if not qs:
                return out_schema.empty_table()
            return pa.Table.from_pydict({
                "query_id": pa.array(qs, pa.int64()),
                "vec_id": pa.array(vs, pa.int64()),
                "score": pa.array(ss, pa.float64()),
            }, schema=out_schema)

    partials = emb.select_columns(["vec_id", "embedding"]).map_batches(
        IvfAdcScores, concurrency=(1, 4), batch_size=2048,
        batch_format="pyarrow")
    return partials.groupby("query_id").map_groups(
        _final_topk, fn_kwargs={"k": k}, batch_format="pyarrow")
