"""SemDeDup (cluster.py), weighted sampling, and the Q6/Q14 TPC-H
additions: brute-force / DuckDB pins for the round-4 session-3 ops."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------


def test_semdedup_planted_geometry():
    """The planted construction's exact-dyadic margins: every decision
    the float pipeline takes is far from the tau boundary."""
    from nerfray.ops.cluster import (SEMDEDUP_G, SEMDEDUP_S, SEMDEDUP_TAU,
                                     planted_semdedup_centroids)

    cents = planted_semdedup_centroids()
    signs = np.sign(cents)
    ham = (signs[:, None, :] != signs[None, :, :]).sum(axis=2)
    ham += np.eye(SEMDEDUP_G, dtype=np.int64) * 64
    assert ham.min() >= 5  # assignment unambiguous

    # one synthetic member of (cluster 2, subgroup 1)
    v = cents[2].copy()
    v[2] *= -1.0
    v[3] *= -1.0
    assert np.linalg.norm(v) == 1.0
    assert v @ cents[2] == (64 - 4) / 64          # 0.9375 < tau
    assert (64 - 4) / 64 < SEMDEDUP_TAU
    # cross-subgroup, same cluster: flips at (0,1) vs (2,3) -> 4 diffs
    u = cents[2].copy()
    u[0] *= -1.0
    u[1] *= -1.0
    assert u @ v == (64 - 8) / 64                 # 0.875 < tau
    assert SEMDEDUP_S * 2 <= 64


def test_semdedup_planted_matches_brute_force(ray_session):
    import ray.data
    from nerfray.ops import cluster as cl

    n = 160
    ids = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array([[0.0]] * n,
                                          pa.list_(pa.float64()))})
    out = cl.semdedup_planted(ray.data.from_arrow(ids)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)

    # brute force: materialize the planted corpus, assign, prune
    planted = cl.planted_semdedup_embeddings(
        ray.data.from_arrow(ids)).to_pandas().sort_values("vec_id")
    vecs = np.stack(planted["embedding"].to_numpy())
    cents = cl.planted_semdedup_centroids()
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    lab = (vn @ cn.T).argmax(axis=1)
    keep = []
    for c in range(cl.SEMDEDUP_G):
        sel = np.where(lab == c)[0]
        v = vn[sel]
        sim = v @ v.T
        dup = np.tril(sim >= cl.SEMDEDUP_TAU, k=-1).any(axis=1)
        keep.extend((int(i), c) for i in sel[~dup])
    expect = pd.DataFrame(sorted(keep), columns=["vec_id", "cluster"])
    pd.testing.assert_frame_equal(
        out.astype({"cluster": np.int64}), expect.astype(np.int64)
        .astype({"vec_id": np.int64, "cluster": np.int64}))

    # and the id-arithmetic form the SQL oracle states
    g, s = cl.SEMDEDUP_G, cl.SEMDEDUP_S
    arith = sorted({(c + g * sg) for c in range(g) for sg in range(s)})
    assert out["vec_id"].tolist() == arith


def test_semdedup_kmeans_prunes_exact_dup(ray_session):
    """Real-path smoke: an exact duplicate vector is pruned, the
    far-apart vectors survive."""
    import ray.data
    from nerfray.ops import cluster as cl

    rng = np.random.default_rng(7)
    base = rng.normal(size=(6, 16))
    vecs = np.vstack([base, base[2]])  # id 6 duplicates id 2
    tbl = pa.table({
        "vec_id": pa.array(range(7), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64()))})
    out = cl.semdedup_kmeans(ray.data.from_arrow(tbl), k=2, rounds=1) \
        .to_pandas()
    kept = set(out["vec_id"].tolist())
    assert 2 in kept and 6 not in kept
    assert len(kept) == 6


# ---------------------------------------------------------------------------
# weighted hash sampling
# ---------------------------------------------------------------------------


def test_weighted_sample_matches_sql_mirror(ray_session):
    import ray.data
    from nerfray.ops.sampling import WEIGHTED_SAMPLE_SQL, weighted_sample

    n = 5000
    docs = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "n_chars": pa.array((np.arange(n) * 37) % 1500, pa.int64()),
    })
    got = weighted_sample(ray.data.from_arrow(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.sql(WEIGHTED_SAMPLE_SQL).df()
    pd.testing.assert_frame_equal(got, want)
    # weighting is real: heavier rows survive at a higher rate
    w = docs["n_chars"].to_numpy()
    heavy = got["doc_id"].to_numpy()[
        got["weight_permille"].to_numpy() >= 800]
    light = got["doc_id"].to_numpy()[
        got["weight_permille"].to_numpy() <= 200]
    n_heavy = int((np.minimum(w, 900) >= 800).sum())
    n_light = int(((np.minimum(w, 900) <= 200) & (w > 0)).sum())
    assert len(heavy) / n_heavy > len(light) / max(n_light, 1)


# ---------------------------------------------------------------------------
# TPC-H Q6 / Q14
# ---------------------------------------------------------------------------


def test_q6_matches_duckdb(ray_session):
    from nerfray.ops.relational import Q6_SQL, q6_revenue

    got = q6_revenue(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS FROM '{SF}/lineitem.parquet'")
    want = con.sql(Q6_SQL).df()
    pd.testing.assert_frame_equal(got, want)
    assert got["n_rows"].iloc[0] > 0  # the filter actually selects rows


def test_q14_matches_duckdb(ray_session):
    from nerfray.ops.joins import Q14_SQL, q14_promo_share

    got = q14_promo_share(SF).to_pandas() \
        .sort_values("month").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS FROM '{SF}/lineitem.parquet'")
    con.sql(f"CREATE VIEW part AS FROM '{SF}/part.parquet'")
    want = con.sql(Q14_SQL).df()
    pd.testing.assert_frame_equal(got, want)
    assert (got["promo_units"] <= got["total_units"]).all()
