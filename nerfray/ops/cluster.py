"""Distributed k-means clustering over the ``embeddings`` table.

The embedding-space curation step a 100 TB multimodal/text pipeline runs
before semantic dedup or mixture balancing (SemDeDup-style cluster-then-
prune): points stay a Dataset end-to-end; each Lloyd round broadcasts the
k x d centroid matrix once via ``ray.put`` and reduces per-block
(cluster, count, sum-vector) partials — the shuffle is bounded by
k x n_blocks rows regardless of corpus size, and the driver holds only
k x d floats (never a point).

Correctness: ``emb_kmeans_planted`` runs one update round on a planted
integer-coordinate corpus (cluster geometry derived from vec_id
arithmetic) and is mirrored by KMEANS_PLANTED_SQL, an exact unrolled
DuckDB Lloyd round (init -> assign -> mean -> assign). All arithmetic is
exact in float64 (integer coordinates, exact integer sums, one correctly
rounded division per mean coordinate), so assignments hash-match
bit-for-bit. The multi-round path is pinned by a numpy-reference pytest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

PLANTED_K = 4
PLANTED_DIM = 4


def _vecs_of(batch: pa.Table) -> np.ndarray:
    col = batch.column("embedding").combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    n = len(col)
    return flat.reshape(n, -1).astype(np.float64, copy=False)


def planted_kmeans_embeddings(emb: ray.data.Dataset,
                              *, k: int = PLANTED_K) -> ray.data.Dataset:
    """Integer-coordinate corpus from vec_id arithmetic: cluster
    g = vec_id % k at 100 * e_g, jittered by (vec_id // k) % 3 - 1 on the
    neighboring coordinate — well-separated, SQL-reconstructible."""

    def _synth(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        g = ids % k
        off = (ids // k) % 3 - 1
        vecs = np.zeros((len(ids), PLANTED_DIM), dtype=np.float64)
        vecs[np.arange(len(ids)), g % PLANTED_DIM] = 100.0
        vecs[np.arange(len(ids)), (g + 1) % PLANTED_DIM] += off
        return pa.Table.from_pydict({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
        })

    return emb.select_columns(["vec_id"]).map_batches(
        _synth, batch_format="pyarrow", zero_copy_batch=True)


def _init_centroids(emb: ray.data.Dataset, k: int) -> np.ndarray:
    """Deterministic init: the k lowest-vec_id vectors, in vec_id order.
    Two-level min-k combiner tree — the driver receives exactly k rows,
    never blocks x k (ops/_shuffle.lowest_k_rows)."""
    from ._shuffle import lowest_k_rows
    small = lowest_k_rows(
        emb.select_columns(["vec_id", "embedding"]), k, "vec_id")
    return np.asarray([r["embedding"] for r in small], dtype=np.float64)


class _AssignPartials:
    """Actor-pool stage: centroids resolved once per actor; per batch
    emits one (cluster, count, sum-vector) row per non-empty cluster."""

    def __init__(self, cent_ref):
        self._c = ray.get(cent_ref)  # (k, d)

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = _vecs_of(batch)
        d2 = ((x[:, None, :] - self._c[None, :, :]) ** 2).sum(axis=2)
        lab = d2.argmin(axis=1)
        clusters, inv = np.unique(lab, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(clusters)).astype(np.int64)
        sums = np.zeros((len(clusters), x.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, x)
        return pa.Table.from_pydict({
            "cluster": pa.array(clusters, pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
            "vsum": pa.array(sums.tolist(), pa.list_(pa.float64())),
        })


class _AssignLabels:
    def __init__(self, cent_ref):
        self._c = ray.get(cent_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = _vecs_of(batch)
        d2 = ((x[:, None, :] - self._c[None, :, :]) ** 2).sum(axis=2)
        return pa.Table.from_pydict({
            "vec_id": batch.column("vec_id"),
            "cluster": pa.array(d2.argmin(axis=1).astype(np.int64),
                                pa.int64()),
        })


def kmeans_fit(emb: ray.data.Dataset, *, k: int, rounds: int) -> np.ndarray:
    """``rounds`` Lloyd updates from the deterministic init; returns the
    final (k, d) centroid matrix. Per round: one broadcast + one
    map_batches + a k x n_blocks-row reduce (collected — bounded by
    block count, never by corpus size). Empty clusters keep their
    previous centroid."""
    pts = emb.select_columns(["vec_id", "embedding"])
    cents = _init_centroids(pts, k)
    for _ in range(rounds):
        ref = ray.put(cents)
        parts = pts.map_batches(
            _AssignPartials, fn_constructor_args=(ref,),
            concurrency=(1, 8), batch_size=4096,
            batch_format="pyarrow").take_all()
        cnt = np.zeros(k, dtype=np.int64)
        sums = np.zeros_like(cents)
        for r in parts:
            cnt[r["cluster"]] += r["cnt"]
            sums[r["cluster"]] += np.asarray(r["vsum"])
        nz = cnt > 0
        cents = cents.copy()
        cents[nz] = sums[nz] / cnt[nz, None]
    return cents


def kmeans_assignments(emb: ray.data.Dataset, *, k: int = PLANTED_K,
                       rounds: int = 1) -> ray.data.Dataset:
    """(vec_id, cluster): labels under the post-``rounds`` centroids.
    Ties broken toward the lowest cluster index (argmin), mirrored by the
    (distance, cid) ordering in KMEANS_PLANTED_SQL."""
    cents = kmeans_fit(emb, k=k, rounds=rounds)
    ref = ray.put(cents)
    return emb.select_columns(["vec_id", "embedding"]).map_batches(
        _AssignLabels, fn_constructor_args=(ref,),
        concurrency=(1, 8), batch_size=4096, batch_format="pyarrow")


def _sql_pts(k: int) -> str:
    coords = []
    for d in range(PLANTED_DIM):
        coords.append(
            f"(CASE WHEN g % {PLANTED_DIM} = {d} THEN 100 ELSE 0 END"
            f" + CASE WHEN (g + 1) % {PLANTED_DIM} = {d} THEN off"
            f" ELSE 0 END)::DOUBLE AS x{d}")
    return (f"SELECT vec_id, {', '.join(coords)} FROM "
            f"(SELECT vec_id, vec_id % {k} AS g,"
            f" (vec_id // {k}) % 3 - 1 AS off FROM embeddings)")


def _sql_d2(a: str, b: str) -> str:
    return " + ".join(f"({a}.x{d} - {b}.x{d}) * ({a}.x{d} - {b}.x{d})"
                      for d in range(PLANTED_DIM))


# one unrolled Lloyd round: init (k lowest vec_ids) -> assign -> mean
# -> final assign; row_number tie-break (distance, cid) == numpy argmin
KMEANS_PLANTED_SQL = f"""
WITH p AS ({_sql_pts(PLANTED_K)}),
c0 AS (SELECT vec_id AS cid, x0, x1, x2, x3 FROM p
       WHERE vec_id < {PLANTED_K}),
a1 AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY {_sql_d2('p', 'c')}, cid) AS rn
  FROM p CROSS JOIN c0 c),
c1 AS (
  SELECT a1.cid, avg(p.x0) AS x0, avg(p.x1) AS x1,
         avg(p.x2) AS x2, avg(p.x3) AS x3
  FROM a1 JOIN p USING (vec_id) WHERE a1.rn = 1 GROUP BY a1.cid),
a2 AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY {_sql_d2('p', 'c')}, cid) AS rn
  FROM p CROSS JOIN c1 c)
SELECT vec_id, cid::BIGINT AS cluster FROM a2 WHERE rn = 1
ORDER BY vec_id
"""


# -- scalar (int8) quantization -----------------------------------------------
#
# The embedding-compression step run before ANN indexing at 100 TB scale
# (4x smaller vectors; IVF/LSH recall barely moves): per-vector symmetric
# int8 codes  code_d = floor(x_d * 127 / maxabs)  with maxabs = max |x_d|.
# Map-only — every vector is quantized where it already lives; nothing
# shuffles. All-integer on the planted corpus (numpy and DuckDB both
# floor-divide), so the rollup surface is hash-exact; the real-float
# path is the same kernel with float scales (rows-only).


def quantize_embeddings(emb: ray.data.Dataset) -> ray.data.Dataset:
    """(vec_id, maxabs_milli, n_dims, sum_codes, min_code, max_code):
    int8-code rollup per vector. Integer-input vectors quantize in exact
    integer arithmetic (floor division); float vectors use the same
    formula through float64 (maxabs reported in milli-units)."""

    def _q(batch: pa.Table) -> pa.Table:
        x = _vecs_of(batch)
        isint = np.allclose(x, np.round(x))
        ax = np.abs(x).max(axis=1)
        safe = np.where(ax == 0, 1.0, ax)
        if isint:
            xi = np.round(x).astype(np.int64)
            si = np.round(safe).astype(np.int64)
            codes = (xi * 127) // si[:, None]
        else:
            codes = np.floor(x * 127.0 / safe[:, None]).astype(np.int64)
        codes = np.clip(codes, -127, 127)
        return pa.Table.from_pydict({
            "vec_id": batch.column("vec_id"),
            "maxabs_milli": pa.array(
                np.round(ax * 1000).astype(np.int64), pa.int64()),
            "n_dims": pa.array(
                np.full(len(ax), x.shape[1], np.int64), pa.int64()),
            "sum_codes": pa.array(codes.sum(axis=1), pa.int64()),
            "min_code": pa.array(codes.min(axis=1), pa.int64()),
            "max_code": pa.array(codes.max(axis=1), pa.int64()),
        })

    return emb.select_columns(["vec_id", "embedding"]).map_batches(
        _q, batch_format="pyarrow", zero_copy_batch=True)


# planted corpus (integer geometry, see planted_kmeans_embeddings):
# x = 100*e_g + off*e_{(g+1)%4}, off in {-1,0,1} -> maxabs = 100,
# codes reconstructible dim-by-dim in SQL integer arithmetic
QUANTIZE_PLANTED_SQL = f"""
WITH p AS ({_sql_pts(PLANTED_K)}),
c AS (
  SELECT vec_id,
         greatest(abs(x0), abs(x1), abs(x2), abs(x3))::BIGINT AS maxabs,
         (floor(x0 * 127 / greatest(abs(x0),abs(x1),abs(x2),abs(x3)))
        + floor(x1 * 127 / greatest(abs(x0),abs(x1),abs(x2),abs(x3)))
        + floor(x2 * 127 / greatest(abs(x0),abs(x1),abs(x2),abs(x3)))
        + floor(x3 * 127 / greatest(abs(x0),abs(x1),abs(x2),abs(x3))))::BIGINT
           AS sum_codes,
         least(floor(x0 * 127 / greatest(abs(x0),abs(x1),abs(x2),abs(x3))),
               floor(x1 * 127 / greatest(abs(x0),abs(x1),abs(x2),abs(x3))),
               floor(x2 * 127 / greatest(abs(x0),abs(x1),abs(x2),abs(x3))),
               floor(x3 * 127 / greatest(abs(x0),abs(x1),abs(x2),abs(x3))))::BIGINT
           AS min_code,
         greatest(floor(x0 * 127 / greatest(abs(x0),abs(x1),abs(x2),abs(x3))),
               floor(x1 * 127 / greatest(abs(x0),abs(x1),abs(x2),abs(x3))),
               floor(x2 * 127 / greatest(abs(x0),abs(x1),abs(x2),abs(x3))),
               floor(x3 * 127 / greatest(abs(x0),abs(x1),abs(x2),abs(x3))))::BIGINT
           AS max_code
  FROM p)
SELECT vec_id, maxabs * 1000 AS maxabs_milli, 4::BIGINT AS n_dims,
       sum_codes, min_code, max_code
FROM c ORDER BY vec_id
"""


# -- distributed PCA ----------------------------------------------------------
#
# The embedding whitening / dimensionality-reduction step run before ANN
# indexing or semantic clustering at corpus scale (PCA-rotated IVF / OPQ
# preprocessing): the moment matrix is the aggregate-to-small side.  ONE
# streaming pass emits per-block moment partials — d(d+1)/2 second-moment
# rows + d first-moment rows + a count row per block, INDEPENDENT of
# corpus size — a bounded multi-column groupby reduces them (input rows
# bounded by grain x blocks, never data; see SCALE.md's sort-groupby
# rule), the driver eigendecomposes one d x d matrix, and projection is
# map-only with the (k, d) component matrix broadcast once via ray.put.
# No data-sized shuffle anywhere: 100 TB of vectors stream through a
# single map pass twice (moments, then projection).


def pca_moments(emb: ray.data.Dataset) -> ray.data.Dataset:
    """Exact long-form moment table over the embedding column:
    ``(i, j, s)`` = sum of ``x_i * x_j`` over all vectors for the upper
    triangle ``i <= j``; first moments ride as ``(i, -1, sum x_i)`` and
    the vector count as ``(-1, -1, n)`` — one schema, one reduce.
    Integer-coordinate corpora (the planted variant) are exact in
    float64 end-to-end, so the SQL mirror hash-matches."""

    def _partials(batch: pa.Table) -> pa.Table:
        x = _vecs_of(batch)
        d = x.shape[1]
        iu, ju = np.triu_indices(d)
        s2 = x.T @ x
        ii = np.concatenate([iu, np.arange(d), [-1]]).astype(np.int64)
        jj = np.concatenate([ju, np.full(d, -1), [-1]]).astype(np.int64)
        vv = np.concatenate(
            [s2[iu, ju], x.sum(axis=0), [float(x.shape[0])]])
        return pa.Table.from_pydict({
            "i": pa.array(ii, pa.int64()),
            "j": pa.array(jj, pa.int64()),
            "s": pa.array(vv, pa.float64()),
        })

    return emb.select_columns(["embedding"]).map_batches(
        _partials, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["i", "j"]).sum("s").rename_columns({"sum(s)": "s"})


def pca_components(emb: ray.data.Dataset, *, k: int) -> np.ndarray:
    """Top-k principal axes (k, d) from the distributed moment table.
    The driver fetch is bounded: d(d+3)/2 + 1 rows total (d=64 -> 2,145
    rows) regardless of corpus size.  Deterministic sign convention:
    each component's largest-|coordinate| entry is made positive
    (lowest index on ties), so repeated runs and the pytest reference
    agree up to float summation order."""
    rows = pca_moments(emb).take_all()  # <= d(d+3)/2 + 1 rows, bounded
    d = max(r["i"] for r in rows) + 1
    n = 0.0
    s1 = np.zeros(d)
    s2 = np.zeros((d, d))
    for r in rows:
        i, j, s = r["i"], r["j"], r["s"]
        if i == -1:
            n = s
        elif j == -1:
            s1[i] = s
        else:
            s2[i, j] = s
            s2[j, i] = s
    mean = s1 / n
    cov = s2 / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = np.ascontiguousarray(evecs[:, order].T)
    for c in comps:
        m = np.argmax(np.abs(c))
        if c[m] < 0:
            c *= -1.0
    return comps


def pca_project(emb: ray.data.Dataset, *, k: int = 2) -> ray.data.Dataset:
    """(vec_id, pc0..pc{k-1}): mean-centered projection of every vector
    onto the top-k principal axes.  Map-only — the (k, d) component
    matrix and the mean broadcast once; vectors never shuffle."""
    comps = pca_components(emb, k=k)
    rows = pca_moments(emb).take_all()
    n = next(r["s"] for r in rows if r["i"] == -1)
    d = comps.shape[1]
    mean = np.zeros(d)
    for r in rows:
        if r["i"] >= 0 and r["j"] == -1:
            mean[r["i"]] = r["s"] / n
    ref = ray.put((comps, mean))

    def _proj(batch: pa.Table) -> pa.Table:
        cm, mu = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        x = _vecs_of(batch) - mu
        p = x @ cm.T
        cols = {"vec_id": batch.column("vec_id")}
        for ki in range(cm.shape[0]):
            cols[f"pc{ki}"] = pa.array(p[:, ki], pa.float64())
        return pa.Table.from_pydict(cols)

    return emb.select_columns(["vec_id", "embedding"]).map_batches(
        _proj, batch_format="pyarrow", zero_copy_batch=True)


def _pca_moments_sql() -> str:
    sel = []
    for i in range(PLANTED_DIM):
        for j in range(i, PLANTED_DIM):
            sel.append(f"SELECT {i}::BIGINT AS i, {j}::BIGINT AS j,"
                       f" sum(x{i} * x{j})::DOUBLE AS s FROM p")
    for i in range(PLANTED_DIM):
        sel.append(f"SELECT {i}::BIGINT AS i, -1::BIGINT AS j,"
                   f" sum(x{i})::DOUBLE AS s FROM p")
    sel.append("SELECT -1::BIGINT AS i, -1::BIGINT AS j,"
               " count(*)::DOUBLE AS s FROM p")
    body = "\nUNION ALL ".join(sel)
    return f"WITH p AS ({_sql_pts(PLANTED_K)})\n{body}"


# exact mirror on the integer-geometry planted corpus: every moment is an
# integer sum, exact in float64 on both sides
PCA_MOMENTS_PLANTED_SQL = _pca_moments_sql()


# ---------------------------------------------------------------------------
# class-centroid outliers (embedding-space curation)
# ---------------------------------------------------------------------------
#
# The mislabeled-sample / embedding-outlier primitive: per-class
# centroids from ONE map-side moment reduce (class count + per-dim
# sums — aggregate-to-small, classes are bounded), broadcast back, and
# each row's squared distance to its OWN class centroid flags it.
# Exactness: the distance test is cleared of divisions —
#     sum_j (x_j - S_j/n)^2 > theta   <=>   sum_j (n x_j - S_j)^2 > theta n^2
# — so with integer planted embeddings both sides are hash-identical.

CENTROID_DIM = 8
CENTROID_THETA = 300
CENTROID_CLASSES = 4


def planted_labeled_embeddings(emb: ray.data.Dataset) -> ray.data.Dataset:
    """(vec_id, label, e[8] int): e[j] = (vec_id*(j+3)) % 17 - 8,
    label = vec_id % 4 — pure arithmetic, mirrored in the oracle."""

    def _synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        e = np.stack([(ids * (j + 3)) % 17 - 8
                      for j in range(CENTROID_DIM)], axis=1)
        return pa.Table.from_pydict({
            "vec_id": pa.array(ids, pa.int64()),
            "label": pa.array(ids % CENTROID_CLASSES, pa.int64()),
            "e": pa.array(list(e.astype(np.int64)),
                          pa.list_(pa.int64())),
        })

    return emb.select_columns(["vec_id"]).map_batches(
        _synth, batch_format="pyarrow", zero_copy_batch=True)


def centroid_outliers(ds: ray.data.Dataset, *,
                      theta: int = CENTROID_THETA) -> ray.data.Dataset:
    """(vec_id, label, dist2_num, flagged) where dist2_num =
    sum_j (n x_j - S_j)^2 and flagged = dist2_num > theta * n^2."""
    import ray as _ray

    def _partials(batch: pa.Table) -> pa.Table:
        lab = batch.column("label").to_numpy(zero_copy_only=False)
        e = np.asarray(batch.column("e").to_pylist(), dtype=np.int64)
        ulab = np.unique(lab)
        rows_n: list = []
        rows_s: list = []
        for lb in ulab:
            m = lab == lb
            rows_n.append(int(m.sum()))
            rows_s.append(e[m].sum(axis=0))
        return pa.Table.from_pydict({
            "label": pa.array(ulab, pa.int64()),
            "n": pa.array(rows_n, pa.int64()),
            "s": pa.array([r.tolist() for r in rows_s],
                          pa.list_(pa.int64()))})

    # classes are bounded -> the reduce is aggregate-to-small
    stats: dict[int, tuple[int, np.ndarray]] = {}
    for r in ds.map_batches(_partials, batch_format="pyarrow",
                            zero_copy_batch=True).take_all():
        n0, s0 = stats.get(r["label"], (0, 0))
        stats[r["label"]] = (n0 + r["n"],
                             np.asarray(r["s"], np.int64) + s0)
    stats_ref = _ray.put(stats)

    class _Flag:
        def __init__(self):
            self._stats = _ray.get(stats_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            lab = batch.column("label").to_numpy(zero_copy_only=False)
            e = np.asarray(batch.column("e").to_pylist(), dtype=np.int64)
            n = np.array([self._stats[x][0] for x in lab], np.int64)
            S = np.stack([self._stats[x][1] for x in lab])
            diff = n[:, None] * e - S
            d2 = (diff * diff).sum(axis=1)
            return pa.Table.from_pydict({
                "vec_id": batch.column("vec_id"),
                "label": batch.column("label"),
                "dist2_num": pa.array(d2, pa.int64()),
                "flagged": pa.array(
                    (d2 > theta * n * n).astype(np.int64), pa.int64()),
            })

    return ds.map_batches(_Flag, concurrency=(1, 8),
                          batch_format="pyarrow", zero_copy_batch=True)


CENTROID_OUTLIERS_SQL = f"""
WITH long AS (
  SELECT vec_id, vec_id % {CENTROID_CLASSES} AS label, j,
         ((vec_id * (j + 3)) % 17 - 8)::BIGINT AS x
  FROM embeddings, unnest(generate_series(0, {CENTROID_DIM - 1})) AS t(j)),
s AS (
  SELECT label, j, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx
  FROM long GROUP BY label, j),
d AS (
  SELECT l.vec_id, l.label,
         sum((s.n * l.x - s.sx) * (s.n * l.x - s.sx))::BIGINT
           AS dist2_num,
         min(s.n) AS n
  FROM long l JOIN s ON s.label = l.label AND s.j = l.j
  GROUP BY 1, 2)
SELECT vec_id, label, dist2_num,
       (CASE WHEN dist2_num > {CENTROID_THETA} * n * n
             THEN 1 ELSE 0 END)::BIGINT AS flagged
FROM d ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup = k-means clusters -> within-cluster cosine
# prune (Abbas et al., "SemDeDup", arXiv:2303.09540)
# ---------------------------------------------------------------------------
#
# The 100-TB shape: centroids are a tiny (k, d) broadcast; assignment is
# one embarrassingly-parallel pass; the ONLY shuffle is the (vec_id,
# cluster, embedding) co-group on cluster, and the O(m^2) cosine prune
# runs inside each cluster, vectorized (one matmul per cluster).  The
# paper's premise is that k is sized so clusters stay small (corpus/k
# rows each) - dispatch grain here is a 32-way cluster-hash bucket per
# the SCALE.md rule, each bucket looping its own few clusters.
#
# Keep rule (deterministic, SQL-mirrorable): within a cluster, a vector
# is DROPPED iff an earlier (lower vec_id) vector of the same cluster
# has cosine >= tau with it; survivors are the min-id representative of
# each cosine-connected-at-tau chain.  The planted corpus (below) keeps
# every decision far from the tau boundary so the float matmul and the
# integer oracle agree exactly.

SEMDEDUP_TAU = 0.95
SEMDEDUP_G = 8   # planted clusters (sign-pattern directions)
SEMDEDUP_S = 4   # planted subgroups per cluster (2-position sign flips)


def planted_semdedup_embeddings(emb: ray.data.Dataset, *,
                                g: int = SEMDEDUP_G,
                                s: int = SEMDEDUP_S) -> ray.data.Dataset:
    """Two-level planted geometry over the +-1/8 sign-pattern designs of
    ops/similarity.py: cluster c = vec_id % g uses direction P_c;
    subgroup (vec_id // g) % s flips sign at positions (2s, 2s+1).
    Exact-dyadic cosines: within-subgroup exactly 1.0 (byte-identical
    vectors, norm exactly 1.0); cross-subgroup same cluster exactly
    (64-8)/64 = 0.875 < tau; vs own centroid (64-4)/64 = 0.9375; vs any
    other centroid <= (64-2*(h-2))/64 where h = pairwise hamming of the
    seeded patterns (asserted >= 5 at construction, so assignment is
    unambiguous).  Survivors = min vec_id per (cluster, subgroup) ->
    pure id arithmetic for the SQL oracle."""
    from .similarity import _planted_direction

    dirs = np.stack([_planted_direction(c) for c in range(g)])
    signs = np.sign(dirs)
    ham = ((signs[:, None, :] != signs[None, :, :]).sum(axis=2)
           + np.eye(g, dtype=np.int64) * 64)
    assert ham.min() >= 5, "seeded sign patterns too close for planting"

    def _synth(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(),
                         dtype=np.int64)
        c = ids % g
        sg = (ids // g) % s
        vecs = dirs[c].copy()
        rows = np.arange(len(ids))
        vecs[rows, 2 * sg] *= -1.0
        vecs[rows, 2 * sg + 1] *= -1.0
        return pa.Table.from_pydict({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
        })

    return emb.select_columns(["vec_id"]).map_batches(
        _synth, batch_format="pyarrow", zero_copy_batch=True)


def planted_semdedup_centroids(*, g: int = SEMDEDUP_G) -> np.ndarray:
    from .similarity import _planted_direction
    return np.stack([_planted_direction(c) for c in range(g)])


class _AssignCos:
    """Actor-pool assignment by max cosine against broadcast centroids
    (rows L2-normalized once in __init__); carries the embedding through
    for the in-cluster prune."""

    def __init__(self, cent_ref, n_buckets: int):
        c = ray.get(cent_ref).astype(np.float64)
        self._c = c / np.linalg.norm(c, axis=1, keepdims=True)
        self._nb = n_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = _vecs_of(batch)
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                            1e-300)
        lab = (xn @ self._c.T).argmax(axis=1).astype(np.int64)
        return pa.Table.from_pydict({
            "vec_id": batch.column("vec_id"),
            "cluster": pa.array(lab, pa.int64()),
            "cb": pa.array((lab % self._nb).astype(np.int32), pa.int32()),
            "embedding": batch.column("embedding"),
        })


def _semdedup_bucket(group: pa.Table, *, tau: float) -> pa.Table:
    """All clusters of one hash bucket: per cluster, sort by vec_id,
    one normalized matmul, drop rows with an earlier >=tau neighbor."""
    out_schema = pa.schema([("vec_id", pa.int64()),
                            ("cluster", pa.int64())])
    if group.num_rows == 0:
        return out_schema.empty_table()
    ids = group.column("vec_id").to_numpy(zero_copy_only=False)
    cl = group.column("cluster").to_numpy(zero_copy_only=False)
    vecs = _vecs_of(group)
    keep_ids, keep_cl = [], []
    for c in np.unique(cl):
        m = cl == c
        cids = ids[m]
        order = np.argsort(cids, kind="stable")
        v = vecs[m][order]
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True),
                           1e-300)
        sim = v @ v.T
        dup = (np.tril(sim >= tau, k=-1)).any(axis=1)
        keep_ids.append(cids[order][~dup])
        keep_cl.append(np.full(int((~dup).sum()), c, np.int64))
    return pa.Table.from_pydict({
        "vec_id": pa.array(np.concatenate(keep_ids), pa.int64()),
        "cluster": pa.array(np.concatenate(keep_cl), pa.int64()),
    })


def semdedup(emb: ray.data.Dataset, *, centroids: np.ndarray,
             tau: float = SEMDEDUP_TAU,
             n_buckets: int = 32) -> ray.data.Dataset:
    """(vec_id, cluster) survivors after semantic dedup under the given
    centroid matrix."""
    import functools
    ref = ray.put(np.asarray(centroids, dtype=np.float64))
    assigned = emb.select_columns(["vec_id", "embedding"]).map_batches(
        _AssignCos, fn_constructor_args=(ref, n_buckets),
        concurrency=(1, 8), batch_size=4096, batch_format="pyarrow")
    return assigned.groupby("cb").map_groups(
        functools.partial(_semdedup_bucket, tau=tau),
        batch_format="pyarrow")


def semdedup_planted(emb: ray.data.Dataset) -> ray.data.Dataset:
    return semdedup(planted_semdedup_embeddings(emb),
                    centroids=planted_semdedup_centroids())


def semdedup_kmeans(emb: ray.data.Dataset, *, k: int = 8,
                    rounds: int = 2) -> ray.data.Dataset:
    """The paper pipeline on the REAL embeddings: learn centroids with
    k-means, then prune (rows-only vs the oracle; the planted twin pins
    values)."""
    cents = kmeans_fit(emb.select_columns(["vec_id", "embedding"]),
                       k=k, rounds=rounds)
    return semdedup(emb, centroids=cents)


SEMDEDUP_PLANTED_SQL = f"""
SELECT vec_id, (vec_id % {SEMDEDUP_G})::BIGINT AS cluster FROM (
  SELECT vec_id, row_number() OVER (
      PARTITION BY vec_id % {SEMDEDUP_G},
                   (vec_id // {SEMDEDUP_G}) % {SEMDEDUP_S}
      ORDER BY vec_id) AS rn
  FROM embeddings) WHERE rn = 1 ORDER BY vec_id
"""
