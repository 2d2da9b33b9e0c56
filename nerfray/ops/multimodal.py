"""Multimodal-column plumbing: opaque ``binary`` payloads + typed
metadata, processed by an actor-pool decode/feature stage.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked deterministic fake (sha256-derived "features") behind the
same actor signature a real decoder would use — the Ray-side plumbing
(binary schema, small batches for large payloads, per-actor init, output
layout) is real and tested. Swap ``FakeDecoder.decode`` for
PIL/torchaudio in a real deployment.

Payloads are synthesized from ``documents.text`` bytes so the metadata
mirror (byte length, sha prefix) is SQL-oracle-able over the registered
view.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("media_type", pa.string()),
    ("payload", pa.large_binary()),
    ("n_bytes", pa.int64()),
])


def to_media(docs: ray.data.Dataset) -> ray.data.Dataset:
    """documents -> media table (binary payload + typed metadata)."""

    def _mk(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        payloads = [t.encode() for t in texts]
        types = ["image/fake" if i % 2 == 0 else "audio/fake"
                 for i in batch.column("doc_id").to_pylist()]
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }, schema=MEDIA_SCHEMA)

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _mk, batch_format="pyarrow", zero_copy_batch=True)


class FakeDecoder:
    """STUB decode kernel (no codecs in this container). Deterministic:
    "features" are sha256-derived. A real deployment replaces ``decode``
    only; the actor-pool stage signature, batch sizing, and output layout
    stay identical."""

    FEATURE_DIM = 8

    def __init__(self, strict: bool = False):
        # strict=True models the real-library path being unavailable
        self.strict = strict

    def decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "real media decoding requires PIL/torchaudio — not in this "
                "container; FakeDecoder(strict=False) is the test double")
        d = hashlib.sha256(payload).digest()
        return np.frombuffer(d[:self.FEATURE_DIM * 4], dtype=np.uint32) \
            .astype(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self.decode(p, t) for p, t in
                 zip(batch.column("payload").to_pylist(),
                     batch.column("media_type").to_pylist())]
        shas = [hashlib.sha256(p).hexdigest()[:8]
                for p in batch.column("payload").to_pylist()]
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "media_type": batch.column("media_type"),
            "n_bytes": batch.column("n_bytes"),
            "sha_prefix": pa.array(shas, pa.string()),
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float64())),
        })


def media_features(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Actor-pool decode: small batches (payloads are the wide column)."""
    return to_media(docs).map_batches(
        FakeDecoder, concurrency=(1, 4), batch_size=64,
        batch_format="pyarrow")


def media_meta(docs: ray.data.Dataset) -> ray.data.Dataset:
    """SQL-oracled metadata projection of the decode output."""
    return media_features(docs).select_columns(
        ["doc_id", "media_type", "n_bytes", "sha_prefix"])


FRAME_BYTES = 256


class FrameSampler:
    """STUB frame extraction + resize (no ffmpeg/PIL in this container):
    a payload is treated as contiguous FRAME_BYTES-sized frames; every
    ``stride``-th frame is sampled and "resized" to a ``thumb_bytes``
    prefix slice. The Ray-side plumbing is the real thing — flat-map
    expansion (one output row per sampled frame), small batches because
    payloads are wide, per-actor init, ``large_binary`` thumbnails —
    and frame accounting (count, offsets, thumb sizes) is deterministic
    byte arithmetic, so it carries a full SQL oracle. A real deployment
    replaces only the two slice expressions with codec calls."""

    def __init__(self, stride: int = 4, thumb_bytes: int = 64):
        self.stride = stride
        self.thumb_bytes = thumb_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, offs, thumbs = [], [], [], []
        for doc, payload in zip(batch.column("doc_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            n = len(payload)
            n_frames = (n + FRAME_BYTES - 1) // FRAME_BYTES
            for idx in range(0, n_frames, self.stride):
                off = idx * FRAME_BYTES
                frame = payload[off:off + FRAME_BYTES]
                ids.append(doc)
                frames.append(idx)
                offs.append(off)
                thumbs.append(frame[:self.thumb_bytes])
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "frame_id": pa.array(frames, pa.int64()),
            "frame_off": pa.array(offs, pa.int64()),
            "thumb": pa.array(thumbs, pa.large_binary()),
            "thumb_n_bytes": pa.array([len(t) for t in thumbs], pa.int64()),
        })


def media_frames(docs: ray.data.Dataset, *, stride: int = 4,
                 thumb_bytes: int = 64) -> ray.data.Dataset:
    """Sampled-frame table with thumbnails (actor-pool stage)."""
    return to_media(docs).map_batches(
        FrameSampler,
        fn_constructor_kwargs={"stride": stride, "thumb_bytes": thumb_bytes},
        concurrency=(1, 4), batch_size=64, batch_format="pyarrow")


def media_frames_meta(docs: ray.data.Dataset) -> ray.data.Dataset:
    """SQL-oracled frame-accounting projection (thumbnails dropped)."""
    return media_frames(docs).select_columns(
        ["doc_id", "frame_id", "frame_off", "thumb_n_bytes"])


# -- WebDataset-style shard packing -------------------------------------------
#
# The sample-to-shard assignment step of a tar/WebDataset export: binary
# payloads are packed in doc_id order into ~shard_bytes-sized shards
# (fixed-offset binning on the global running byte sum — a blob whose
# exclusive prefix lands in shard s starts at shard_off inside s; shard
# sizes vary by at most one overhanging blob, which is how sequential
# trainers actually read).  Distributed shape: ONE keyed exchange.
# doc_id ranges are contiguous (rb = doc_id * K // (max+1)), so per-range
# byte sums give the driver K scalars; broadcast exclusive bases lift
# per-range local cumsums to global offsets — no global sort, no
# row-proportional driver state.  Exact integer arithmetic end-to-end,
# so the manifest hash-matches its SQL window mirror on RAW documents.

SHARD_BYTES = 1 << 14
N_SHARD_RANGES = 64


def media_shards(docs: ray.data.Dataset, *,
                 shard_bytes: int = SHARD_BYTES,
                 n_ranges: int = N_SHARD_RANGES) -> ray.data.Dataset:
    """(doc_id, n_bytes, shard, shard_off): the shard manifest for a
    doc_id-ordered pack of every payload into ~``shard_bytes`` shards."""
    import ray

    media = to_media(docs).select_columns(["doc_id", "n_bytes"])
    max_id = media.max("doc_id")
    if max_id is None:  # empty input: empty manifest
        return ray.data.from_arrow(pa.schema([
            ("doc_id", pa.int64()), ("n_bytes", pa.int64()),
            ("shard", pa.int64()), ("shard_off", pa.int64()),
        ]).empty_table())
    n = max_id + 1

    def _rb(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        rb = (ids * n_ranges // n).astype(np.int32)
        return batch.append_column("rb", pa.array(rb, pa.int32()))

    ranged = media.map_batches(_rb, batch_format="pyarrow",
                               zero_copy_batch=True)
    sums = ranged.groupby("rb").sum("n_bytes").take_all()  # <= n_ranges
    bases = np.zeros(n_ranges, dtype=np.int64)
    for r in sums:
        bases[r["rb"]] = r["sum(n_bytes)"]
    bases = np.concatenate([[0], np.cumsum(bases)[:-1]])
    base_ref = ray.put(bases)

    _OUT = pa.schema([
        ("doc_id", pa.int64()), ("n_bytes", pa.int64()),
        ("shard", pa.int64()), ("shard_off", pa.int64()),
    ])

    def _pack_range(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _OUT.empty_table()
        b = ray.get(base_ref) if isinstance(base_ref, ray.ObjectRef) \
            else base_ref
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        nb = group.column("n_bytes").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, nb = ids[order], nb[order]
        excl = b[int(group.column("rb")[0].as_py())] + np.cumsum(nb) - nb
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "n_bytes": pa.array(nb, pa.int64()),
            "shard": pa.array(excl // shard_bytes, pa.int64()),
            "shard_off": pa.array(excl % shard_bytes, pa.int64()),
        }, schema=_OUT)

    return ranged.groupby("rb").map_groups(_pack_range,
                                           batch_format="pyarrow")


MEDIA_SHARDS_SQL = f"""
WITH m AS (SELECT doc_id, strlen(text)::BIGINT AS n_bytes FROM documents),
c AS (SELECT doc_id, n_bytes,
        COALESCE(sum(n_bytes) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
      FROM m)
SELECT doc_id, n_bytes, (excl // {SHARD_BYTES})::BIGINT AS shard,
       (excl % {SHARD_BYTES})::BIGINT AS shard_off
FROM c ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# modality-routed decode (heterogeneous actor pools per media type)
# ---------------------------------------------------------------------------
#
# One decode pool per modality is wrong at scale: image decoding wants
# large batches on many cheap actors, audio/video want small batches
# (payloads are wide) on fewer actors.  The router splits the stream by
# media_type into per-modality actor-pool stages — each with its own
# batch_size / concurrency — and unions the outputs; unrecognized
# modalities take the conservative default pool rather than failing
# the pipeline.  Routing is semantics-invisible (same decoder, same
# rows), so the meta projection shares MEDIA_META_SQL verbatim and the
# features are pinned equal to the single-pool run in tests.

MODALITY_POOLS: dict = {
    "image/fake": {"batch_size": 128, "concurrency": (1, 4)},
    "audio/fake": {"batch_size": 32, "concurrency": (1, 2)},
}
DEFAULT_POOL: dict = {"batch_size": 16, "concurrency": (1, 2)}


def _route(batch: pa.Table, *, media_type: str | None) -> pa.Table:
    import pyarrow.compute as pc
    col = batch.column("media_type")
    if media_type is None:  # default branch: everything unrecognized
        mask = pc.invert(pc.is_in(
            col, value_set=pa.array(list(MODALITY_POOLS))))
    else:
        mask = pc.equal(col, media_type)
    return batch.filter(mask)


def media_features_routed(docs: ray.data.Dataset) -> ray.data.Dataset:
    # each branch re-runs the (column-pruned, cheap) upstream scan —
    # the deliberate trade: materializing the media table to share it
    # would pin the corpus's binary payloads in the object store, and
    # per-branch scans stream with backpressure exactly like
    # predicate-split reads do
    media = to_media(docs)
    branches = []
    for mt, cfg in sorted(MODALITY_POOLS.items()):
        branches.append(
            media.map_batches(_route, fn_kwargs={"media_type": mt},
                              batch_format="pyarrow",
                              zero_copy_batch=True)
            .map_batches(FakeDecoder, batch_format="pyarrow", **cfg))
    branches.append(
        media.map_batches(_route, fn_kwargs={"media_type": None},
                          batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(FakeDecoder, batch_format="pyarrow",
                     **DEFAULT_POOL))
    out = branches[0]
    for b in branches[1:]:
        out = out.union(b)
    return out


def media_meta_routed(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Meta projection of the routed decode (shares MEDIA_META_SQL)."""
    return media_features_routed(docs).select_columns(
        ["doc_id", "media_type", "n_bytes", "sha_prefix"])


# ---------------------------------------------------------------------------
# perceptual-hash (aHash) media near-dedup
# ---------------------------------------------------------------------------
#
# The image-dedup pass of a multimodal pipeline: decode -> tiny gray
# thumbnail -> average hash (bit i = pixel i brighter than the mean) ->
# hamming-banded pair generation.  With no codecs in the container the
# "thumbnail" is the payload's bytes cycled to 64 (a real deployment
# swaps ONLY `_gray64`'s byte source for a resized grayscale decode;
# hash, banding and verification are unchanged).  Planted twin payloads
# (doc_id % 10 in {0, 1}) are an integer byte formula with one bumped
# byte, so the WHOLE pipeline — thumbnail, integer mean compare
# (64*g > S avoids division), banding recall, exact hamming — replays
# as a DuckDB oracle over the documents view; the banded candidate
# stage is pigeonhole-complete for hamming < n_bands, so Ray pairs ==
# brute-force SQL pairs whatever the planted bit flips turn out to be.

AHASH_K = 3


def _gray64(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    payloads = batch.column("payload").to_pylist()
    n = len(ids)
    g = np.empty((n, 64), np.int64)
    i64 = np.arange(64, dtype=np.int64)
    for r in range(n):
        d = int(ids[r])
        if d % 10 == 0:
            g[r] = (7 * d + 3 * i64) % 251
        elif d % 10 == 1:
            g[r] = (7 * (d - 1) + 3 * i64) % 251
            g[r, 0] = ((7 * (d - 1)) % 251 + 128) % 256
        else:
            b = np.frombuffer(payloads[r], np.uint8)
            g[r] = b[i64 % len(b)]
    return ids, g


def _ahash_batch(batch: pa.Table) -> pa.Table:
    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("simhash", pa.uint64())])
    if batch.num_rows == 0:
        return out_schema.empty_table()
    ids, g = _gray64(batch)
    s = g.sum(axis=1)
    bits = (64 * g > s[:, None]).astype(np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    sig = (bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    return pa.Table.from_pydict(
        {"doc_id": ids, "simhash": sig}, schema=out_schema)


def media_ahash_signatures(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, simhash): average hash of the 64-byte thumbnail."""
    return to_media(docs).map_batches(
        _ahash_batch, batch_format="pyarrow", zero_copy_batch=True)


def media_phash_pairs(docs: ray.data.Dataset, *,
                      max_hamming: int = AHASH_K) -> ray.data.Dataset:
    """(doc_a, doc_b, hamming) media near-dup pairs, banded with full
    recall for hamming < 4 (shares the SimHash banding machinery)."""
    from nerfray.ops.dedup import simhash_pairs_from_signatures
    return simhash_pairs_from_signatures(
        media_ahash_signatures(docs), max_hamming=max_hamming)


def media_phash_hist(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(popcount, n_docs): signature-population histogram — the cheap
    full-oracle checksum surface over every doc's hash."""
    import pyarrow.compute as pc

    def _pop(batch: pa.Table) -> pa.Table:
        sig = batch.column("simhash").to_numpy(zero_copy_only=False)
        popcount = np.array([int(x).bit_count() for x in sig], np.int64)
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "popcount": pa.array(popcount, pa.int64())})

    return media_ahash_signatures(docs) \
        .map_batches(_pop, batch_format="pyarrow") \
        .groupby("popcount").count() \
        .rename_columns({"count()": "n_docs"})


_AHASH_G_SQL = """
WITH pos AS (SELECT unnest(range(0, 64)) AS i),
g AS (
  SELECT doc_id, i,
    CASE WHEN doc_id % 10 = 0 THEN (7 * doc_id + 3 * i) % 251
         WHEN doc_id % 10 = 1 THEN
           CASE WHEN i = 0
                THEN ((7 * (doc_id - 1)) % 251 + 128) % 256
                ELSE (7 * (doc_id - 1) + 3 * i) % 251 END
         ELSE unicode(substr(text,
                             CAST(i % length(text) AS INTEGER) + 1, 1))
    END AS v
  FROM documents, pos),
s AS (SELECT doc_id, sum(v) AS tot FROM g GROUP BY doc_id),
ph AS (
  SELECT g.doc_id,
         sum(CASE WHEN 64 * g.v > s.tot
                  THEN (1::HUGEINT << g.i) ELSE 0 END)::UBIGINT AS h
  FROM g JOIN s USING (doc_id) GROUP BY g.doc_id)
"""

MEDIA_PHASH_PAIRS_SQL = f"""
{_AHASH_G_SQL}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.h, b.h))::BIGINT AS hamming
FROM ph a JOIN ph b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.h, b.h)) <= {AHASH_K}
ORDER BY doc_a, doc_b
"""

MEDIA_PHASH_HIST_SQL = f"""
{_AHASH_G_SQL}
SELECT bit_count(h)::BIGINT AS popcount, count(*)::BIGINT AS n_docs
FROM ph GROUP BY 1 ORDER BY 1
"""
