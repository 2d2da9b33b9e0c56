"""queries()/oracle_sql() registry for the data-pipeline operators."""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import ray.data

from . import events, joins, rank, relational, semistruct, sketch
from .text import TOKEN_RE_SRC, STOPWORDS


def _docs(sf_dir: str) -> ray.data.Dataset:
    from nerfray.sources.parquet import read_parquet_clean
    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"))


def _emb(sf_dir: str) -> ray.data.Dataset:
    from nerfray.sources.parquet import read_parquet_clean
    return read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))


# -- dedup ------------------------------------------------------------------


def q_dedup_exact(sf_dir: str):
    from . import dedup
    return dedup.exact_dedup(_docs(sf_dir))


def q_dedup_minhash(sf_dir: str):
    from . import dedup
    return dedup.minhash_dedup_pairs(_docs(sf_dir), threshold=0.5,
                                     cache_key=(sf_dir, "raw"))


def q_dedup_simhash(sf_dir: str):
    # hex signature surface: uint64 exceeds SQL BIGINT, hex strings
    # hash-compare exactly against SIMHASH_HEX_SQL
    from . import dedup
    return dedup.simhash_signatures_hex(_docs(sf_dir))


def q_dedup_simhash_pairs(sf_dir: str):
    from . import dedup
    return dedup.simhash_near_dup_pairs(_docs(sf_dir), max_hamming=3)


def q_dedup_survivors(sf_dir: str):
    # the composed dedup a curation run executes: pairs -> distributed
    # connected components -> min-id survivor per duplicate class
    from . import dedup
    return dedup.minhash_dedup_survivors(_docs(sf_dir), threshold=0.5,
                                         cache_key=(sf_dir, "raw"))


def q_dedup_survivors_planted(sf_dir: str):
    # planted corpus: classes are {4g..4g+3} fully paired, so the
    # survivor set is pure id arithmetic -> full SQL oracle for the
    # whole pairs->components->survivor composition
    from . import dedup
    return dedup.minhash_dedup_survivors(
        dedup.planted_neardup_docs(_docs(sf_dir)), threshold=0.5,
        cache_key=(sf_dir, "planted"))


def q_dedup_incremental(sf_dir: str):
    # continuous-ingest dedup: a planted new batch (1 in 5 rows a
    # verbatim corpus copy) anti-joined against the corpus shas
    from . import dedup
    return dedup.incremental_exact_dedup(
        dedup.planted_new_batch(_docs(sf_dir)), _docs(sf_dir))


def q_dedup_editdist(sf_dir: str):
    # character-level near-dup join: length-banded co-groups + counting
    # filter + exact DP, equal to brute-force levenshtein by theorem
    from . import dedup
    return dedup.editdist_pairs(_docs(sf_dir))


def q_dedup_editdist_census(sf_dir: str):
    # the editdist shard-plan audit: per group-band doc population and
    # adaptive shard count — proves the band join runs drop-free (the
    # pre-r5 cap truncation is gone); narrow rows, full SQL mirror
    from . import dedup
    return dedup.editdist_band_census(_docs(sf_dir))


def q_docs_paragraph_dedup(sf_dir: str):
    # paragraph-grain exact dedup (global first occurrence survives,
    # short paragraphs exempt) over planted 3-paragraph docs -> full
    # SQL oracle incl. sha256 of each reassembled cleaned text
    from . import dedup
    return dedup.paragraph_dedup_summary(
        dedup.planted_paragraph_docs(_docs(sf_dir)))


def q_docs_splits_leakproof(sf_dir: str):
    # eval-contamination-safe splits: near-dup classes (pairs ->
    # components) hash into a split by their REPRESENTATIVE, so no
    # class straddles train/test; planted classes -> full SQL oracle
    from . import dedup
    return dedup.leakproof_splits(
        dedup.planted_neardup_docs(_docs(sf_dir)),
        cache_key=(sf_dir, "planted"))


def q_docs_dupclass_weights(sf_dir: str):
    # soft dedup: keep every near-dup copy, downweight by class size
    # (1000 // size permille) — reuses the memoized pairs -> CC map
    from . import dedup
    return dedup.dupclass_weights(
        dedup.planted_neardup_docs(_docs(sf_dir)),
        cache_key=(sf_dir, "planted"))


def q_dedup_incremental_bloom(sf_dir: str):
    # stateful streaming dedup: persisted Bloom filter + sha catalog,
    # probe -> exact-verify maybes -> commit state v+1; output is
    # byte-identical to the stateless path (shared oracle)
    import shutil
    import tempfile
    from . import bloom, dedup
    state = tempfile.mkdtemp(prefix="nerfray_dedupstate_")
    try:
        corpus = _docs(sf_dir)
        bloom.init_dedup_state(corpus, state)
        surv, _stats = bloom.ingest_batch(
            dedup.planted_new_batch(corpus), state)
        return surv
    finally:
        shutil.rmtree(state, ignore_errors=True)


def q_bloom_corpus(sf_dir: str):
    from . import bloom
    return bloom.corpus_bloom_query(sf_dir)


def q_bloom_probe(sf_dir: str):
    from . import bloom
    return bloom.bloom_probe_query(sf_dir)


def q_docs_top_quality(sf_dir: str):
    from . import text
    return text.top_quality(_docs(sf_dir), k=20)


def q_docs_top_words(sf_dir: str):
    from . import text
    return text.top_words(_docs(sf_dir), k=20)


def q_docs_cooccur(sf_dir: str):
    from . import text
    return text.word_cooccur_topk(_docs(sf_dir))


def q_docs_bigrams(sf_dir: str):
    from . import text
    return text.bigram_topk(_docs(sf_dir))


def q_docs_salient(sf_dir: str):
    from . import text
    return text.salient_terms(_docs(sf_dir))


def q_docs_pii_redacted(sf_dir: str):
    # PII scrub with byte-exact redaction oracle: deterministic emails/
    # IPv4s planted from doc_id arithmetic, sha256 of the scrubbed text
    from . import text
    return text.redact_pii(text.planted_pii_docs(_docs(sf_dir)))


def q_join_bucketed_rollup(sf_dir: str):
    # co-bucketed storage join: both fact tables landed bkt=K by the
    # shared orderkey hash, joined bucket-locally with zero exchange
    from . import bucketed
    return bucketed.join_bucketed_rollup(sf_dir)


def q_graph_triangles_planted(sf_dir: str):
    # join-composed triangle counting on a deterministic offset graph
    # (7 + 13 = 20 -> exactly two wedge-closures per node), SQL-mirrored
    # by pure arithmetic over the embeddings ids
    from nerfray.stages import graph
    ids = _emb(sf_dir).select_columns(["vec_id"])
    return graph.triangle_counts(
        graph.planted_triangle_edges(ids, ids.count()))


def q_dedup_minhash_drops(sf_dir: str):
    # recall-loss side channel: one row per LSH bucket whose candidate
    # cap dropped pairs (empty = caps never bit at this scale)
    from . import dedup
    return dedup.minhash_drop_counts(_docs(sf_dir))


def q_dedup_simhash_drops(sf_dir: str):
    from . import dedup
    return dedup.simhash_drop_counts(_docs(sf_dir))


def q_dedup_minhash_planted(sf_dir: str):
    # planted near-dup corpus (identical shingle sets within a group):
    # the SAME banded-LSH + exact-verify operator, with candidate
    # completeness guaranteed by construction -> full SQL oracle
    from . import dedup
    return dedup.minhash_dedup_pairs(
        dedup.planted_neardup_docs(_docs(sf_dir)), threshold=0.5,
        cache_key=(sf_dir, "planted"))


# -- similarity -------------------------------------------------------------


def q_sim_topk(sf_dir: str):
    from . import similarity
    return similarity.cosine_topk(
        _emb(sf_dir), k=10,
        source_path=os.path.join(sf_dir, "embeddings.parquet"))


def q_sim_lsh(sf_dir: str):
    from . import similarity
    return similarity.lsh_topk(
        _emb(sf_dir), k=10,
        source_path=os.path.join(sf_dir, "embeddings.parquet"))


def q_sim_knn_graph(sf_dir: str):
    # all-vectors kNN graph (IVF-co-grouped, multi-probe assignment);
    # rows-only (float scores) — recall pinned by planted-cluster pytest
    from . import similarity
    return similarity.sim_knn_graph(sf_dir)


def q_sim_ivf(sf_dir: str):
    from . import similarity
    return similarity.ivf_topk(
        _emb(sf_dir), k=10,
        source_path=os.path.join(sf_dir, "embeddings.parquet"))


def q_dedup_embedding(sf_dir: str):
    # threshold sits at the top of the driver embeddings' actual cosine
    # distribution (random vectors: max ~0.51) so the op surfaces real
    # near-pairs; recall is partial by LSH design (rows-only check)
    from . import similarity
    return similarity.embedding_dup_pairs(_emb(sf_dir), threshold=0.4,
                                          bits=4)


def q_sim_jaccard(sf_dir: str):
    from . import similarity
    return similarity.jaccard_vs_queries(_docs(sf_dir), n_queries=3)


def q_sim_setjoin(sf_dir: str):
    # exact set-similarity self-join (prefix filter + verify): the
    # deterministic counterpart to dedup_minhash, oracled on RAW docs
    from . import setjoin
    return setjoin.sim_setjoin(sf_dir)


def q_sim_setjoin_drops(sf_dir: str):
    from . import setjoin
    return setjoin.sim_setjoin_drops(sf_dir)


def q_dedup_embedding_planted(sf_dir: str):
    # identical-vector pairs: LSH co-location is certain, exact cosine
    # verify keeps only the planted pairs -> full SQL oracle (no float
    # columns: cosine of identical vectors is ~1.0 up to normalization
    # noise, so the score is dropped from the oracle surface)
    from . import similarity
    pairs = similarity.embedding_dup_pairs(
        similarity.planted_group_embeddings(_emb(sf_dir), mode="pairs"),
        threshold=0.95, bits=6)
    return pairs.select_columns(["vec_a", "vec_b"])


def q_sim_lsh_planted(sf_dir: str):
    from . import similarity
    return similarity.lsh_topk(
        similarity.planted_group_embeddings(_emb(sf_dir), mode="mod"),
        k=10)


def q_sim_ivf_planted(sf_dir: str):
    from . import similarity
    return similarity.ivf_topk(
        similarity.planted_group_embeddings(_emb(sf_dir), mode="mod"),
        k=10)


def q_sim_pq(sf_dir: str):
    # product-quantization ANN on the real float embeddings: rows-only
    # (ADC scores are lossy floats); the planted variant carries the
    # exact oracle
    from . import pq
    return pq.pq_topk(
        _emb(sf_dir), k=10,
        source_path=os.path.join(sf_dir, "embeddings.parquet"))


def q_sim_pq_planted(sf_dir: str):
    # planted directions have <= 50 distinct patterns per subspace, so
    # every pattern becomes its own centroid (ksub=64) and ADC is
    # EXACT -> must equal the brute-force planted top-k oracle
    from . import pq, similarity
    return pq.pq_topk(
        similarity.planted_group_embeddings(_emb(sf_dir), mode="mod"),
        k=10)


def q_sim_ivfpq(sf_dir: str):
    # FAISS-style IVF-PQ: coarse inverted lists + residual PQ + ADC,
    # probe-limited; rows-only on real floats (lossy residual codes)
    from . import pq
    return pq.ivf_pq_topk(
        _emb(sf_dir), k=10,
        source_path=os.path.join(sf_dir, "embeddings.parquet"))


def q_sim_ivfpq_planted(sf_dir: str):
    # planted: each direction-group lands in ONE coarse list with ONE
    # residual pattern (<= 50 <= ksub), so residual quantization is
    # exact and probe-limited ADC must equal the brute-force oracle
    from . import pq, similarity
    return pq.ivf_pq_topk(
        similarity.planted_group_embeddings(_emb(sf_dir), mode="mod"),
        k=10)


def q_sim_pq_codes(sf_dir: str):
    # PQ code-utilization audit (dead centroids / hot codes): rows-only
    # (code indices depend on the trained codebook); invariants —
    # per-subspace counts sum to the corpus size, codes < ksub — are
    # pinned by pytest
    from . import pq
    return pq.pq_code_histogram(_emb(sf_dir))


def q_emb_quantized(sf_dir: str):
    # int8 scalar quantization rollup on the real float embeddings
    # (rows-only: float scales; the planted variant carries the oracle)
    from . import cluster
    return cluster.quantize_embeddings(_emb(sf_dir))


def q_emb_quantized_planted(sf_dir: str):
    # integer-geometry corpus -> all-integer floor-division codes,
    # bit-exact vs QUANTIZE_PLANTED_SQL
    from . import cluster
    return cluster.quantize_embeddings(
        cluster.planted_kmeans_embeddings(_emb(sf_dir)))


def q_emb_kmeans(sf_dir: str):
    # Lloyd k-means on the real float embeddings: rows-only (float-mean
    # centroids are not SQL-statable without an unrolled mirror; the
    # planted variant below carries the FULL oracle)
    from . import cluster
    return cluster.kmeans_assignments(_emb(sf_dir), k=4, rounds=2)


def q_emb_centroid_outliers(sf_dir: str):
    # embedding-space curation: per-class centroid via one map-side
    # moment reduce (classes bounded -> broadcast), division-free
    # distance flag -> integer-exact SQL oracle on planted embeddings
    from . import cluster
    return cluster.centroid_outliers(
        cluster.planted_labeled_embeddings(_emb(sf_dir)))


def q_emb_kmeans_planted(sf_dir: str):
    # one unrolled Lloyd round on the integer-geometry planted corpus:
    # init -> assign -> mean -> assign, bit-exact vs KMEANS_PLANTED_SQL
    from . import cluster
    return cluster.kmeans_assignments(
        cluster.planted_kmeans_embeddings(_emb(sf_dir)), rounds=1)


def q_emb_semdedup_planted(sf_dir: str):
    # SemDeDup (arXiv:2303.09540) on the two-level planted geometry:
    # exact-dyadic cosines keep every decision far from tau, so the
    # survivor set is pure id arithmetic -> full SQL oracle for the
    # assign -> cluster co-group -> in-cluster cosine prune composition
    from . import cluster
    return cluster.semdedup_planted(_emb(sf_dir))


def q_emb_semdedup(sf_dir: str):
    # the paper pipeline on the real float embeddings (k-means centroids
    # then prune): rows-only by design; the planted twin above pins the
    # values and a brute-force pytest pins the prune rule
    from . import cluster
    return cluster.semdedup_kmeans(_emb(sf_dir))


def q_emb_pca(sf_dir: str):
    # distributed PCA on the real float embeddings: rows-only
    # (eigenvectors are iterative-LAPACK floats, not SQL-statable; the
    # moment table below carries the FULL oracle; projection is pinned
    # by a dense-numpy pytest)
    from . import cluster
    return cluster.pca_project(_emb(sf_dir), k=2)


def q_emb_pca_moments_planted(sf_dir: str):
    # exact long-form moment table on the integer-geometry planted
    # corpus: every sum is an integer, exact in float64 on both sides
    from . import cluster
    return cluster.pca_moments(
        cluster.planted_kmeans_embeddings(_emb(sf_dir)))


# -- text analysis ----------------------------------------------------------


def q_text_stats(sf_dir: str):
    from . import text
    return text.text_stats(_docs(sf_dir))


def q_text_quality(sf_dir: str):
    from . import text
    return text.quality_scores(_docs(sf_dir))


def q_docs_curated(sf_dir: str):
    from . import text
    return text.curate(_docs(sf_dir), min_words=30, min_ttr_pct=25)


def q_docs_pipeline(sf_dir: str):
    from . import text
    return text.curation_pipeline(_docs(sf_dir), min_words=30,
                                  min_ttr_pct=25)


def q_docs_word_df(sf_dir: str):
    from . import text
    return text.word_df_stats(_docs(sf_dir))


def q_docs_lm_score(sf_dir: str):
    from . import text
    return text.lm_familiarity(_docs(sf_dir))


def q_docs_repetition(sf_dir: str):
    from . import text
    return text.repetition_signals(_docs(sf_dir))


def q_docs_line_signals(sf_dir: str):
    from . import text
    return text.line_signals(_docs(sf_dir))


def q_docs_decontam(sf_dir: str):
    from . import text
    return text.decontaminate(_docs(sf_dir))


def q_docs_compression(sf_dir: str):
    # Gopher-style zlib-ratio quality signal; rows-only (no SQL zlib),
    # kernel pinned by a brute-force pytest
    from . import text
    return text.compression_signals(_docs(sf_dir))


def q_docs_curation_scored(sf_dir: str):
    # the full three-stage curation composition: gates + exact dedup +
    # model keep, all narrow-row exchanges; oracle = CTE conjunction
    from . import text
    return text.curation_scored(_docs(sf_dir))


def q_docs_classifier(sf_dir: str):
    # fastText-style linear bag-of-words model scoring: bounded vocab
    # fit -> ray.put weight broadcast -> map-only actor-pool inference
    from . import text
    return text.classifier_scores(_docs(sf_dir))


def q_docs_classifier_pr(sf_dir: str):
    # curation calibration: classifier-threshold sweep scored against
    # the curate() gate label — per-block confusion partials over a
    # fixed grid, one bounded groupby, integer milli precision/recall
    from . import text
    return text.classifier_pr_curve(_docs(sf_dir))


def q_events_zorder(sf_dir: str):
    # Z-order clustering: conjunctive 2-D probe skips files on BOTH
    # user and time dimensions at once (Morton-curve layout)
    from . import zonemap
    return zonemap.zorder_scan_query(sf_dir)


def q_events_bloom_pointscan(sf_dir: str):
    # per-file Bloom index over a high-cardinality column the layout
    # can't range-prune: point lookup reads only bloom-hit files
    from . import zonemap
    return zonemap.bloom_pointscan_query(sf_dir)


def q_events_zonemap(sf_dir: str):
    # file-skipping range scan: time-range layout + footer-only zone
    # map + pruned rollup (pruning asserted inside, semantics-invisible)
    from . import zonemap
    return zonemap.zonemap_scan_query(sf_dir)


def q_docs_normalized(sf_dir: str):
    # cleaning stage: byte-exact normalized-text fingerprints
    from . import text
    return text.normalize_text(_docs(sf_dir))


def q_docs_url_hosts(sf_dir: str):
    # domain-level rollup: per-host URL count + exact distinct docs
    # over planted deterministic URLs (full SQL oracle)
    from . import text
    return text.host_stats(text.planted_url_docs(_docs(sf_dir)))


def q_docs_blocklist(sf_dir: str):
    # broadcast-blocklist curation: survivors citing no banned host;
    # blocklist rides ray.put once, map-only stage
    from . import text
    return text.blocklist_filter(text.planted_url_docs(_docs(sf_dir)),
                                 text.PLANTED_BLOCKED_HOSTS)


def q_docs_crossdup(sf_dir: str):
    # substring-level dedup signal (Lee et al. 2022): per-doc distinct
    # 5-gram count + how many occur in >= 2 docs corpus-wide
    from . import text
    return text.crossdup_signals(_docs(sf_dir))


def q_docs_dup_spans(sf_dir: str):
    # the actionable substring-dedup output (Lee et al. 2022 recipe):
    # per-doc merged word-index intervals covered by cross-doc 5-grams
    from . import text
    return text.dup_spans(_docs(sf_dir))


def q_lang_confusion(sf_dir: str):
    # raw-doc classification: rows-only by design (documents.lang is
    # synthetic metadata unrelated to the text, so there is no accuracy
    # oracle to state in SQL — this measures classifier behavior)
    from . import text
    return text.lang_confusion(_docs(sf_dir))


def q_lang_confusion_planted(sf_dir: str):
    # planted-signal variant: doc_id-derived texts make the confusion
    # rollup SQL-derivable, so the REAL actor-pool classifier gets an
    # end-to-end hash-green check (registered separately from the raw
    # query so the catalog stays honest about what each row verifies)
    from . import text
    return text.planted_lang_confusion(_docs(sf_dir))


def q_docs_splits(sf_dir: str):
    from . import sampling
    return sampling.assign_splits(_docs(sf_dir))


def q_docs_stratified(sf_dir: str):
    from . import sampling
    return sampling.stratified_sample(_docs(sf_dir), k=10)


def q_docs_mixture(sf_dir: str):
    from . import sampling
    return sampling.mixture_sample(_docs(sf_dir))


def q_docs_packed(sf_dir: str):
    from . import sampling
    return sampling.pack_sequences(_docs(sf_dir))


def q_docs_packed_split(sf_dir: str):
    # hot-source-safe path: (source, doc_id-range) split + base stitch;
    # range_docs=200 forces multi-range stitching at test scale
    from . import sampling
    return sampling.pack_sequences_split(_docs(sf_dir), range_docs=200)


def q_docs_chunks(sf_dir: str):
    from . import sampling
    return sampling.chunk_docs(_docs(sf_dir))


def q_docs_inverted_index(sf_dir: str):
    from . import search
    return search.index_summary(sf_dir)


def q_docs_search(sf_dir: str):
    from . import search
    return search.search_via_index(_docs(sf_dir))


def q_docs_phrase_search(sf_dir: str):
    # positional phrase search: phrase-word candidate starts (slot j at
    # token p proposes start p-j), one doc-bucket co-group counts
    # starts with all k slots present; overlap-counting semantics
    from . import search
    return search.phrase_search(_docs(sf_dir))


def q_doc_fingerprints(sf_dir: str):
    from . import text
    ds = text.doc_fingerprints(_docs(sf_dir))
    return ds.select_columns(["doc_id", "n_fingerprints"])


# -- multimodal -------------------------------------------------------------


def q_media_meta(sf_dir: str):
    from . import multimodal
    return multimodal.media_meta(_docs(sf_dir))


def q_media_phash_pairs(sf_dir: str):
    from . import multimodal
    return multimodal.media_phash_pairs(_docs(sf_dir))


def q_media_phash_hist(sf_dir: str):
    from . import multimodal
    return multimodal.media_phash_hist(_docs(sf_dir))


def q_media_meta_routed(sf_dir: str):
    # per-modality actor pools (batch size / concurrency per media
    # type); routing is semantics-invisible -> same oracle
    from . import multimodal
    return multimodal.media_meta_routed(_docs(sf_dir))


def q_media_frames(sf_dir: str):
    from . import multimodal
    return multimodal.media_frames_meta(_docs(sf_dir))


def q_media_shards(sf_dir: str):
    # WebDataset-style shard manifest: doc_id-ordered pack of payloads
    # into ~16 KiB shards via one keyed exchange; exact SQL window mirror
    from . import multimodal
    return multimodal.media_shards(_docs(sf_dir))


def q_docs_bpe_pairs(sf_dir: str):
    # BPE round-one statistics: top-20 adjacent within-word char pairs
    # with multiplicity; replace()-exact self-pair counting
    from . import tokenizer
    return tokenizer.bpe_pair_counts(_docs(sf_dir))


def q_docs_bpe_merges(sf_dir: str):
    # distributed BPE training, 3 rounds: per round one pair-grain
    # exchange + a broadcast merge rule; SQL replays the same rounds
    # with replace() (non-overlap semantics identical by construction)
    from . import tokenizer
    return tokenizer.bpe_train_merges(_docs(sf_dir), rounds=3)


def q_docs_bm25_rerank(sf_dir: str):
    from . import retrieval
    return retrieval.bm25_rerank_topk(_docs(sf_dir))


def q_docs_bm25_topk(sf_dir: str):
    # ranked keyword retrieval: integer-pinned BM25 (df/N/avglen as
    # tiny aggregates, one scoring map, per-block top-k pruning)
    from . import retrieval
    return retrieval.bm25_topk(_docs(sf_dir))


def q_docs_dsir_scores(sf_dir: str):
    # DSIR-shaped data selection: hashed-bigram bucket histograms
    # (target = first 64 docs vs raw corpus), integer ratio weights,
    # per-doc occurrence-sum score -> hash-exact SQL mirror
    from . import importance
    return importance.importance_scores(_docs(sf_dir))


def q_docs_dsir_selected(sf_dir: str):
    # the resampling step: top-k docs by per-feature average weight
    from . import importance
    return importance.dsir_selected(_docs(sf_dir))


def q_docs_hybrid_rrf(sf_dir: str):
    # hybrid retrieval: reciprocal-rank fusion of the BM25 rank list
    # and the dense cosine rank list (query = vector 0), integer RRF
    # contributions -> hash-exact SQL mirror
    from . import retrieval
    return retrieval.hybrid_rrf_topk(
        _docs(sf_dir), _emb(sf_dir),
        emb_path=os.path.join(sf_dir, "embeddings.parquet"))


def q_docs_containment_planted(sf_dir: str):
    # asymmetric near-dup (doc A's shingles ⊂ doc B's): shingle
    # inverted index -> composite-key pair reduce -> size join; planted
    # container/contained/partial groups -> full SQL oracle
    from . import retrieval
    return retrieval.containment_pairs(
        retrieval.planted_containment_docs(_docs(sf_dir)))


def q_events_late_planted(sf_dir: str):
    # watermark semantics over a replayed stream: late = behind the
    # running event-time max by > allowed lateness at its arrival slot
    from . import streaming
    from nerfray.sources.parquet import read_parquet_clean
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_id", "user_id", "ts"])
    return streaming.late_events(
        streaming.planted_disordered_events(ev))


def q_docs_bpe_encoded(sf_dir: str):
    # per-doc symbol count after encoding with the 3 merges learned
    # from the same corpus (sequence-length budget of a tokenizer
    # change); SQL replays training AND encoding with replace()
    from . import tokenizer
    return tokenizer.bpe_encode_stats(_docs(sf_dir), rounds=3)


def q_docs_hash_sample(sf_dir: str):
    # deterministic uniform sample without replacement: bottom-k by
    # splitmix64(doc_id) (= distributed reservoir sampling); per-block
    # bottom-k partials, one bounded merge
    from . import sampling
    return sampling.hash_sample_topk(_docs(sf_dir))


def q_docs_weighted_sample(sf_dir: str):
    # weight-proportional deterministic sampling: keep iff
    # splitmix64(doc_id) % 1000 < least(n_chars, cap) — per-row integer
    # arithmetic, zero shuffle, identical UHUGEINT chain in SQL
    from . import sampling
    return sampling.weighted_sample(_docs(sf_dir))


def q_lineitem_q6_revenue(sf_dir: str):
    # TPC-H Q6: predicate pushed into the parquet read (row-group
    # min/max pruning) + integer cent x percent revenue partials; the
    # global reduce moves two int64s per block
    from . import relational
    return relational.q6_revenue(sf_dir)


def q_join_q14_promo(sf_dir: str):
    # TPC-H Q14: fact side pre-shrunk to (partkey, month, rev-units),
    # part joined via the adaptive broadcast-vs-shuffle pick
    from . import joins
    return joins.q14_promo_share(sf_dir)


def q_join_q10_returned(sf_dir: str):
    # TPC-H Q10: returned lineitems pre-combined to order grain, windowed
    # orders via the adaptive join, customer/nation broadcast, top-20
    from . import joins
    return joins.q10_returned_revenue(sf_dir)


def q_join_q12_priority(sf_dir: str):
    # TPC-H Q12 adapted to this schema (returnflag for shipmode):
    # read-filtered fact x orders priority, conditional integer counts
    from . import joins
    return joins.q12_priority_split(sf_dir)


def q_join_q22_idle_rich(sf_dir: str):
    # TPC-H Q22 adapted: scalar-subquery global average (two int64s on
    # the driver) + NOT EXISTS as the bucketed left-anti hash join
    from . import joins
    return joins.q22_idle_rich(sf_dir)


def q_orders_q13_distribution(sf_dir: str):
    # TPC-H Q13: order counts pre-combined to customer grain, LEFT
    # join back so zero-order customers survive, tiny histogram groupby
    from . import relational
    return relational.q13_order_distribution(sf_dir)


def q_join_q15_top_supplier(sf_dir: str):
    # TPC-H Q15: per-supplier revenue view, global max as a 1-int64
    # reduction, tie-preserving winner filter
    from . import relational
    return relational.q15_top_supplier(sf_dir)


def q_lineitem_q17_small_qty(sf_dir: str):
    # TPC-H Q17: correlated per-part average cross-multiplied into
    # integers (5*qty*cnt < sum_qty); brand prune broadcasts first
    from . import relational
    return relational.q17_small_quantity(sf_dir)


def q_join_q7_nation_volume(sf_dir: str):
    # TPC-H Q7: supplier-nation broadcast prunes the fact BEFORE the
    # one big-big orders hop; customer role via a second broadcast
    from . import joins
    return joins.q7_nation_volume(sf_dir)


def q_join_q8_market_share(sf_dir: str):
    # TPC-H Q8: part-type + region-customer broadcasts prune the fact;
    # one big-big orders hop; exact integer numerator/denominator
    from . import joins
    return joins.q8_market_share(sf_dir)


def q_join_q2_min_cost(sf_dir: str):
    # TPC-H Q2 (adapted): argmin-join-back in ONE partkey co-group —
    # lexsort (pk, price, sk), first row per pk is min price + min-key
    # achiever; part/supplier/region sides all broadcast
    from . import joins
    return joins.q2_min_cost_supplier(sf_dir)


def q_join_q9_profit(sf_dir: str):
    # TPC-H Q9 (adapted): star join, p_retailprice as cost surrogate;
    # broadcasts prune the fact, one adaptive orders hop, map-side
    # combine to (nation, year)
    from . import joins
    return joins.q9_profit_by_nation_year(sf_dir)


def q_join_q11_important_stock(sf_dir: str):
    # TPC-H Q11 (adapted): global-share HAVING — per-part rollup is
    # dimension-grain bounded, grand total one scalar, integer share
    from . import joins
    return joins.q11_important_stock(sf_dir)


def q_join_q16_supplier_cnt(sf_dir: str):
    # TPC-H Q16 (adapted): grouped distinct-count via suppkey-hash
    # co-group; complaints NOT IN as a broadcast exclusion set
    from . import joins
    return joins.q16_supplier_counts(sf_dir)


def q_join_q20_majority(sf_dir: str):
    # TPC-H Q20 (adapted): nested semi-join — both grains (part total,
    # part-supplier share) in one sorted sweep per partkey co-group
    from . import joins
    return joins.q20_majority_suppliers(sf_dir)


def q_join_q21_waiting(sf_dir: str):
    # TPC-H Q21 (returnflag-adapted): exists/not-exists over the
    # order's supplier set in ONE orderkey-hash co-group
    from . import joins
    return joins.q21_waiting_suppliers(sf_dir)


def q_join_q19_disjunctive(sf_dir: str):
    # TPC-H Q19: OR-of-conjunctions via a broadcast (partkey ->
    # branch) lut + qty-envelope read prune; map-side only
    from . import joins
    return joins.q19_disjunctive_revenue(sf_dir)


def _roundtrip_rollup(ds) -> "ray.data.Dataset":
    """(source, n_docs, sum_chars, sum_text_len): exact integers that
    would expose any quoting/escaping infidelity in the read path —
    sum_text_len recomputes length from the decoded text itself."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def _prep(batch: pa.Table) -> pa.Table:
        tl = pc.cast(pc.utf8_length(batch.column("text")), pa.int64())
        one = pa.array([1] * batch.num_rows, pa.int64())
        return pa.Table.from_pydict({
            "source": batch.column("source"),
            "n_docs": one,
            "sum_chars": pc.cast(batch.column("n_chars"), pa.int64()),
            "sum_text_len": tl})

    return ds.map_batches(_prep, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("source") \
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("sum_chars", alias_name="sum_chars"),
                   Sum("sum_text_len", alias_name="sum_text_len"))


def q_docs_domain_cap(sf_dir: str):
    # domain balancing: at most k docs per source by hash order — the
    # CCNet/FineWeb-style cap on a dominant domain; block-local
    # bottom-k partials, one source-keyed merge
    from . import sampling
    return sampling.domain_cap(_docs(sf_dir))


def q_docs_bucket_diff(sf_dir: str):
    # anti-entropy repair: per-bucket checksum compare (64+64 driver
    # rows), then a row-grain full-outer diff restricted to the
    # damaged buckets — equal buckets never shuffle
    from . import integrity
    return integrity.docs_bucket_diff(sf_dir)


def q_docs_table_checksum(sf_dir: str):
    # anti-entropy fingerprint: order-independent per-bucket checksum a
    # replica pair compares without moving rows (splitmix64 row hash,
    # commutative mod-2^64 bucket sums, bit-exact UHUGEINT SQL mirror)
    from . import integrity
    return integrity.docs_table_checksum(sf_dir)


def q_docs_csv_roundtrip(sf_dir: str):
    # source-format breadth: documents exported once to CSV, read back
    # through the distributed CSV reader; the parquet-view oracle
    # catches any quoting/escaping infidelity (sum_text_len recomputes
    # length from the decoded text)
    from nerfray.sources.parquet import export_table_once, read_csv_clean
    path = export_table_once(sf_dir, "documents", "csv")
    return _roundtrip_rollup(read_csv_clean(path))


def q_docs_jsonl_roundtrip(sf_dir: str):
    # same rollup through the JSONL reader (unicode \uXXXX escapes
    # decode back to identical text)
    from nerfray.sources.parquet import (export_table_once,
                                         read_json_clean)
    path = export_table_once(sf_dir, "documents", "jsonl")
    return _roundtrip_rollup(read_json_clean(path))


def q_docs_feather_roundtrip(sf_dir: str):
    # Arrow IPC (Feather) shard files through the custom shard reader
    # (one decode task per file — the datasource shape Ray Data lacks
    # natively); same rollup oracle as CSV/JSONL
    from nerfray.sources.parquet import (export_table_sharded,
                                         read_feather_shards)
    paths = export_table_sharded(sf_dir, "documents", "feather")
    return _roundtrip_rollup(read_feather_shards(paths))


def q_docs_jsonl_gz_roundtrip(sf_dir: str):
    # gzip-JSONL shards (the Common-Crawl ingestion layout) through the
    # distributed shard reader; same rollup oracle
    from nerfray.sources.parquet import (export_table_gz_shards,
                                         read_jsonl_gz_shards)
    paths = export_table_gz_shards(sf_dir, "documents")
    return _roundtrip_rollup(read_jsonl_gz_shards(paths))


def q_docs_orc_roundtrip(sf_dir: str):
    # ORC shard files through the same custom shard-reader shape
    from nerfray.sources.parquet import (export_table_sharded,
                                         read_orc_shards)
    paths = export_table_sharded(sf_dir, "documents", "orc")
    return _roundtrip_rollup(read_orc_shards(paths))


ROUNDTRIP_SQL = """
SELECT source, count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars,
       sum(length(text))::BIGINT AS sum_text_len
FROM documents GROUP BY 1 ORDER BY 1
"""


def q_docs_novelty(sf_dir: str):
    # vocabulary-novelty audit: words first introduced per doc; one
    # word-bucket co-group (block partials are (word, min-doc) rows)
    from . import text
    return text.vocab_novelty(_docs(sf_dir))


def q_docs_containment_drops(sf_dir: str):
    # the df-cap recall-loss audit on a planted-boilerplate corpus:
    # exactly the two interior boilerplate shingles exceed the cap
    from . import retrieval
    return retrieval.containment_drop_summary(
        retrieval.planted_boilerplate_docs(_docs(sf_dir)))


# -- assembly ---------------------------------------------------------------


def queries() -> dict[str, Callable[[str], Any]]:
    q = {
        "dedup_exact": q_dedup_exact,
        "dedup_minhash": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "dedup_simhash_pairs": q_dedup_simhash_pairs,
        "dedup_minhash_planted": q_dedup_minhash_planted,
        "dedup_minhash_drops": q_dedup_minhash_drops,
        "dedup_simhash_drops": q_dedup_simhash_drops,
        "dedup_survivors": q_dedup_survivors,
        "dedup_incremental": q_dedup_incremental,
        "dedup_incremental_bloom": q_dedup_incremental_bloom,
        "docs_splits_leakproof": q_docs_splits_leakproof,
        "docs_dupclass_weights": q_docs_dupclass_weights,
        "dedup_editdist": q_dedup_editdist,
        "dedup_editdist_census": q_dedup_editdist_census,
        "docs_paragraph_dedup": q_docs_paragraph_dedup,
        "bloom_corpus": q_bloom_corpus,
        "bloom_probe": q_bloom_probe,
        "dedup_survivors_planted": q_dedup_survivors_planted,
        "docs_top_quality": q_docs_top_quality,
        "docs_top_words": q_docs_top_words,
        "docs_cooccur": q_docs_cooccur,
        "docs_bigrams": q_docs_bigrams,
        "docs_salient": q_docs_salient,
        "dedup_embedding": q_dedup_embedding,
        "dedup_embedding_planted": q_dedup_embedding_planted,
        "sim_topk": q_sim_topk,
        "sim_lsh": q_sim_lsh,
        "sim_lsh_planted": q_sim_lsh_planted,
        "sim_ivf": q_sim_ivf,
        "sim_knn_graph": q_sim_knn_graph,
        "sim_ivf_planted": q_sim_ivf_planted,
        "sim_pq": q_sim_pq,
        "sim_pq_planted": q_sim_pq_planted,
        "sim_pq_codes": q_sim_pq_codes,
        "sim_ivfpq": q_sim_ivfpq,
        "sim_ivfpq_planted": q_sim_ivfpq_planted,
        "emb_kmeans": q_emb_kmeans,
        "emb_kmeans_planted": q_emb_kmeans_planted,
        "emb_centroid_outliers": q_emb_centroid_outliers,
        "emb_pca": q_emb_pca,
        "emb_pca_moments_planted": q_emb_pca_moments_planted,
        "emb_quantized": q_emb_quantized,
        "emb_quantized_planted": q_emb_quantized_planted,
        "sim_jaccard": q_sim_jaccard,
        "sim_setjoin": q_sim_setjoin,
        "sim_setjoin_drops": q_sim_setjoin_drops,
        "text_stats": q_text_stats,
        "text_quality": q_text_quality,
        "docs_curated": q_docs_curated,
        "docs_pipeline": q_docs_pipeline,
        "docs_word_df": q_docs_word_df,
        "docs_lm_score": q_docs_lm_score,
        "docs_repetition": q_docs_repetition,
        "docs_line_signals": q_docs_line_signals,
        "docs_decontam": q_docs_decontam,
        "docs_classifier": q_docs_classifier,
        "docs_classifier_pr": q_docs_classifier_pr,
        "docs_curation_scored": q_docs_curation_scored,
        "events_zonemap_scan": q_events_zonemap,
        "events_bloom_pointscan": q_events_bloom_pointscan,
        "events_zorder_scan": q_events_zorder,
        "docs_crossdup": q_docs_crossdup,
        "docs_dup_spans": q_docs_dup_spans,
        "docs_normalized": q_docs_normalized,
        "docs_url_hosts": q_docs_url_hosts,
        "docs_blocklist": q_docs_blocklist,
        "lang_confusion": q_lang_confusion,
        "lang_confusion_planted": q_lang_confusion_planted,
        "doc_fingerprints": q_doc_fingerprints,
        "docs_inverted_index": q_docs_inverted_index,
        "docs_search": q_docs_search,
        "docs_phrase_search": q_docs_phrase_search,
        "docs_splits": q_docs_splits,
        "docs_stratified": q_docs_stratified,
        "docs_mixture": q_docs_mixture,
        "docs_packed": q_docs_packed,
        "docs_packed_split": q_docs_packed_split,
        "docs_chunks": q_docs_chunks,
        "media_meta": q_media_meta,
        "media_meta_routed": q_media_meta_routed,
        "media_phash_pairs": q_media_phash_pairs,
        "media_phash_hist": q_media_phash_hist,
        "media_frames": q_media_frames,
        "media_shards": q_media_shards,
        "docs_bpe_pairs": q_docs_bpe_pairs,
        "docs_bpe_merges": q_docs_bpe_merges,
        "docs_bm25_topk": q_docs_bm25_topk,
        "docs_bm25_rerank": q_docs_bm25_rerank,
        "docs_hybrid_rrf": q_docs_hybrid_rrf,
        "docs_dsir_scores": q_docs_dsir_scores,
        "docs_dsir_selected": q_docs_dsir_selected,
        "docs_containment_planted": q_docs_containment_planted,
        "events_late_planted": q_events_late_planted,
        "docs_bpe_encoded": q_docs_bpe_encoded,
        "docs_hash_sample": q_docs_hash_sample,
        "docs_domain_cap": q_docs_domain_cap,
        "docs_weighted_sample": q_docs_weighted_sample,
        "emb_semdedup": q_emb_semdedup,
        "emb_semdedup_planted": q_emb_semdedup_planted,
        "lineitem_q6_revenue": q_lineitem_q6_revenue,
        "join_q14_promo": q_join_q14_promo,
        "join_q10_returned": q_join_q10_returned,
        "join_q12_priority": q_join_q12_priority,
        "join_q22_idle_rich": q_join_q22_idle_rich,
        "docs_novelty": q_docs_novelty,
        "orders_q13_distribution": q_orders_q13_distribution,
        "join_q15_top_supplier": q_join_q15_top_supplier,
        "lineitem_q17_small_qty": q_lineitem_q17_small_qty,
        "join_q19_disjunctive": q_join_q19_disjunctive,
        "join_q7_nation_volume": q_join_q7_nation_volume,
        "join_q8_market_share": q_join_q8_market_share,
        "join_q21_waiting": q_join_q21_waiting,
        "join_q2_min_cost": q_join_q2_min_cost,
        "join_q9_profit": q_join_q9_profit,
        "join_q11_important_stock": q_join_q11_important_stock,
        "join_q16_supplier_cnt": q_join_q16_supplier_cnt,
        "join_q20_majority": q_join_q20_majority,
        "docs_csv_roundtrip": q_docs_csv_roundtrip,
        "docs_table_checksum": q_docs_table_checksum,
        "docs_bucket_diff": q_docs_bucket_diff,
        "docs_jsonl_roundtrip": q_docs_jsonl_roundtrip,
        "docs_feather_roundtrip": q_docs_feather_roundtrip,
        "docs_orc_roundtrip": q_docs_orc_roundtrip,
        "docs_jsonl_gz_roundtrip": q_docs_jsonl_gz_roundtrip,
        "docs_containment_drops": q_docs_containment_drops,
        "orders_by_status": relational.orders_by_status,
        "orders_rollup_cube": relational.orders_rollup_cube,
        "docs_global_rank": rank.docs_global_rank,
        "docs_range_export": rank.docs_range_export,
        "events_range_export_sampled": rank.events_range_export_sampled,
        "docs_length_histogram": rank.docs_length_histogram,
        "docs_length_ntile": rank.docs_length_ntile,
        "docs_bottomk_layout":
            lambda sf: rank.bottomk_via_layout(sf),
        "docs_compression": q_docs_compression,
        "top_customers": relational.top_customers,
        "customers_per_region": relational.customers_per_region,
        "events_quality_checks": relational.events_quality_checks,
        "part_type_sizes": relational.part_type_sizes,
        "part_pareto": relational.part_pareto,
        "lineitem_by_flag": relational.lineitem_by_flag,
        "join_orders_lineitem": joins.orders_lineitem_rollup,
        "join_priority_shipped": joins.priority_shipped_counts,
        "join_skew_salted": joins.skew_salted_rollup,
        "join_full_outer": joins.full_outer_coverage,
        "join_q3_topk": joins.q3_shipping_topk,
        "join_bucketed_rollup": q_join_bucketed_rollup,
        "join_q18_topk": joins.q18_large_orders,
        "join_adaptive_rollup": joins.adaptive_orders_by_nation,
        "join_q5_nation_revenue": joins.q5_revenue_by_nation,
        "join_bloom_prefiltered": joins.urgent_lineitem_rollup,
        "events_band_join": joins.events_band_join,
        "events_interval_join": joins.events_interval_join,
        "sketch_hll_custkeys": sketch.custkey_registers_by_status,
        "sketch_kmv_custkeys": sketch.orders_custkey_kmv,
        "docs_heavy_hitters": sketch.docs_heavy_hitters,
        "events_hot_users": sketch.events_hot_users,
        "sketch_cms_words": sketch.docs_cms_registers,
        "events_hourly_hll": sketch.hourly_user_registers,
        "events_daily_hll": sketch.daily_user_registers,
        "events_value_quantiles": sketch.events_value_quantiles,
        "events_value_quantiles_lossless":
            sketch.events_value_quantiles_lossless,
        "customer_price_quantiles": relational.customer_price_quantiles,
        "distinct_custkeys_by_status":
            relational.distinct_custkeys_by_status,
        "top_orders_per_status": relational.top_orders_per_status,
        "graph_triangles_planted": q_graph_triangles_planted,
        "docs_pii_redacted": q_docs_pii_redacted,
        "events_sessionize": events.sessionize,
        "events_sessionize_split": events.sessionize_split,
        "events_asof_order": events.asof_last_order,
        "events_asof_split": events.asof_last_order_split,
        "events_hourly": events.hourly_counts,
        "events_hourly_incremental": events.hourly_counts_incremental,
        "events_cohort_retention": events.cohort_retention,
        "events_resampled_daily": events.resample_daily,
        "events_temporal_join": events.temporal_join,
        "events_pivot_daily": events.pivot_daily_types,
        "events_unpivot_daily": events.unpivot_daily_types,
        "events_ab_test": events.ab_test,
        "events_moving_sum": events.moving_sum,
        "events_streaks": events.activity_streaks,
        "events_covered_time": events.covered_time,
        "events_cusum_alerts": events.cusum_alerts,
        "events_new_users_daily": events.new_users_daily,
        "events_user_rank": events.user_value_ranks,
        "events_transitions": events.event_transitions,
        "events_sliding": events.sliding_counts,
        "events_window_selfjoin": events.window_selfjoin,
        "events_cumsum": events.cumsum_per_user,
        "events_trend": events.trend_per_user,
        "events_compact": events.compact_latest,
        "events_scd2": events.scd2_history,
        "events_outliers": events.value_outliers,
        "events_funnel": events.funnel,
        "events_interarrival": events.interarrival,
        "events_json_schema": semistruct.events_json_schema,
        "events_props_rollup": semistruct.events_props_rollup,
    }
    return q


_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

TEXT_STATS_SQL = f"""
SELECT doc_id,
       length(text)::BIGINT AS n_chars,
       len(string_split(text, ' '))::BIGINT AS n_words,
       len(list_distinct(string_split(text, ' ')))::BIGINT AS n_uniq_words,
       len(regexp_extract_all(text, '{TOKEN_RE_SRC}'))::BIGINT AS n_tokens,
       len(list_filter(string_split(text, ' '),
                       w -> w IN ({_STOP_SQL})))::BIGINT AS n_stopwords
FROM documents ORDER BY doc_id
"""

TEXT_QUALITY_SQL = f"""
WITH s AS ({TEXT_STATS_SQL})
SELECT doc_id,
       CASE WHEN n_words = 0 THEN 0.0
            ELSE n_uniq_words / CAST(n_words AS DOUBLE) END
         AS type_token_ratio,
       CASE WHEN n_words = 0 THEN 0.0
            ELSE n_stopwords / CAST(n_words AS DOUBLE) END
         AS stopword_ratio
FROM s ORDER BY doc_id
"""

SIM_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, e.embedding) AS score
  FROM q, embeddings e
),
ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, vec_id
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
"""

SIM_JACCARD_SQL = """
WITH q AS (
  SELECT doc_id AS query_doc, list_distinct(string_split(text, ' ')) AS qw
  FROM documents WHERE doc_id < 3
),
d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS dw FROM documents
)
SELECT d.doc_id, q.query_doc,
       len(list_intersect(d.dw, q.qw))::BIGINT AS n_common,
       (len(d.dw) + len(q.qw) - len(list_intersect(d.dw, q.qw)))::BIGINT
         AS n_union,
       len(list_intersect(d.dw, q.qw)) /
         CAST(len(d.dw) + len(q.qw) - len(list_intersect(d.dw, q.qw))
              AS DOUBLE) AS jaccard
FROM d, q ORDER BY doc_id, query_doc
"""

DOCS_CURATED_SQL = f"""
WITH s AS ({TEXT_STATS_SQL})
SELECT * FROM s
WHERE n_words >= 30 AND n_uniq_words * 100 >= n_words * 25
ORDER BY doc_id
"""

# per-bit majority vote over sha256-prefix token hashes, reassembled as
# the 16-hex-char signature; bit b of a hex uint64 lives in hex char
# 16 - b//4 (big-endian), at in-digit position b%4
SIMHASH_HEX_SQL = """
WITH toks AS (
  SELECT doc_id, substr(sha256(w), 1, 16) AS h
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
),
bits AS (
  SELECT doc_id, b,
         CASE WHEN ((strpos('0123456789abcdef',
                            substr(h, 16 - (b // 4), 1)) - 1)
                    >> (b % 4)) & 1 = 1 THEN 1 ELSE -1 END AS v
  FROM toks, unnest(generate_series(0, 63)) AS t(b)
),
acc AS (
  SELECT doc_id, b, CASE WHEN sum(v) > 0 THEN 1 ELSE 0 END AS bit
  FROM bits GROUP BY doc_id, b
),
digits AS (
  SELECT doc_id, b // 4 AS d, sum(bit << (b % 4))::BIGINT AS dv
  FROM acc GROUP BY doc_id, b // 4
)
SELECT doc_id,
       string_agg(substr('0123456789abcdef', dv + 1, 1), ''
                  ORDER BY d DESC) AS simhash_hex
FROM digits GROUP BY doc_id ORDER BY doc_id
"""

# hamming-k pairs brute-forced from the SQL-computable signatures: the
# banded-rotation op is pigeonhole-complete for k < n_bands, so its
# answer equals brute force whenever no (band, band_val) bucket exceeds
# the 500-row cap — impossible at the 500-doc gate scale (a bucket
# holds at most one row per doc), so the oracle is exact there; at
# larger corpora cap drops are surfaced by the drop-count side channel.
SIMHASH_PAIRS_SQL = f"""
WITH sigs AS ({SIMHASH_HEX_SQL}),
ham AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         (SELECT sum(bit_count(xor(
              strpos('0123456789abcdef', substr(a.simhash_hex, i, 1)) - 1,
              strpos('0123456789abcdef', substr(b.simhash_hex, i, 1)) - 1)))
          FROM unnest(generate_series(1, 16)) AS t(i)) AS hamming
  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming::BIGINT AS hamming
FROM ham WHERE hamming <= 3 ORDER BY doc_a, doc_b
"""


# composed curation: stats+sha in one scan, min-doc survivor per exact-
# duplicate class, then the integer-ratio quality gate
DOCS_PIPELINE_SQL = f"""
WITH s AS (
  SELECT doc_id, sha256(text) AS text_sha,
         length(text)::BIGINT AS n_chars,
         len(string_split(text, ' '))::BIGINT AS n_words,
         len(list_distinct(string_split(text, ' ')))::BIGINT AS n_uniq_words,
         len(regexp_extract_all(text, '{TOKEN_RE_SRC}'))::BIGINT AS n_tokens,
         len(list_filter(string_split(text, ' '),
                         w -> w IN ({_STOP_SQL})))::BIGINT AS n_stopwords
  FROM documents
),
surv AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY text_sha
                                 ORDER BY doc_id) AS rn FROM s)
  WHERE rn = 1
)
SELECT doc_id, n_chars, n_words, n_uniq_words, n_tokens, n_stopwords,
       text_sha
FROM surv
WHERE n_words >= 30 AND n_uniq_words * 100 >= n_words * 25
ORDER BY doc_id
"""

def _curation_scored_sql() -> str:
    from .text import CLASSIFIER_V, _CLASSIFIER_MOD
    return f"""
WITH s AS (
  SELECT doc_id, sha256(text) AS text_sha,
         len(string_split(text, ' '))::BIGINT AS n_words,
         len(list_distinct(string_split(text, ' ')))::BIGINT
           AS n_uniq_words
  FROM documents
),
surv AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY text_sha
                                 ORDER BY doc_id) AS rn FROM s)
  WHERE rn = 1
),
w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents),
df AS (SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY word),
vocab AS (
  SELECT word,
         (('0x' || substr(sha256(word), 1, 8))::UBIGINT
            % {_CLASSIFIER_MOD})::BIGINT - 8 AS wt
  FROM df ORDER BY df DESC, word LIMIT {CLASSIFIER_V}),
sc AS (SELECT w.doc_id, sum(v.wt)::BIGINT AS sc
       FROM w JOIN vocab v USING (word) GROUP BY w.doc_id)
SELECT surv.doc_id, surv.text_sha,
       coalesce(sc.sc, 0)::BIGINT AS score
FROM surv LEFT JOIN sc USING (doc_id)
WHERE surv.n_words >= 30 AND surv.n_uniq_words * 100 >= surv.n_words * 25
  AND coalesce(sc.sc, 0) >= 0
ORDER BY surv.doc_id
"""


DEDUP_EXACT_SQL = """
SELECT sha256(text) AS text_sha, min(doc_id)::BIGINT AS doc_id
FROM documents GROUP BY 1 ORDER BY 1
"""

# frame accounting is pure byte arithmetic over strlen(text) (payload =
# utf-8 bytes of text): frames of 256 bytes, every 4th sampled, thumbs
# capped at 64 bytes
MEDIA_FRAMES_SQL = """
WITH m AS (SELECT doc_id, strlen(text)::BIGINT AS n_bytes FROM documents),
f AS (SELECT doc_id, n_bytes,
             (n_bytes + 255) // 256 AS n_frames FROM m WHERE n_bytes > 0),
s AS (SELECT doc_id, n_bytes, 4 * k AS frame_id
      FROM f, unnest(generate_series(0, (n_frames - 1) // 4)) AS t(k))
SELECT doc_id, frame_id, (frame_id * 256)::BIGINT AS frame_off,
       least(64, n_bytes - frame_id * 256)::BIGINT AS thumb_n_bytes
FROM s ORDER BY doc_id, frame_id
"""

MEDIA_META_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image/fake' ELSE 'audio/fake' END
         AS media_type,
       strlen(text)::BIGINT AS n_bytes,
       substr(sha256(text), 1, 8) AS sha_prefix
FROM documents ORDER BY doc_id
"""


def _lang_sql() -> str:
    from .text import PLANTED_LANG_SQL
    return PLANTED_LANG_SQL


def _winnow_sql() -> str:
    from .text import WINNOW_COUNT_SQL
    return WINNOW_COUNT_SQL


def _word_df_sql() -> str:
    from .text import WORD_DF_SQL
    return WORD_DF_SQL


def _text_sql(name: str) -> str:
    from . import text
    return getattr(text, name)


def _zonemap_sql() -> str:
    from . import zonemap
    return zonemap.ZONEMAP_SQL


def _zonemap_attr_sql(attr: str) -> str:
    from . import zonemap
    return getattr(zonemap, attr)


def _zorder_sql() -> str:
    from . import zonemap
    return zonemap.ZORDER_SQL


def _cluster_sql(name: str) -> str:
    from . import cluster
    return getattr(cluster, name)


def _mm_sql(name: str) -> str:
    from . import multimodal
    return getattr(multimodal, name)


def _search_sql(name: str) -> str:
    from . import search
    return getattr(search, name)


def _bloom_sql(name: str) -> str:
    from . import bloom
    return getattr(bloom, name)


def _setjoin_sql(name: str) -> str:
    from . import setjoin
    return getattr(setjoin, name)


def _dedup_sql(name: str) -> str:
    from . import dedup
    return getattr(dedup, name)


def _tokenizer_sql(name: str) -> str:
    from . import tokenizer
    return getattr(tokenizer, name)


def _bpe_merges_sql() -> str:
    from .tokenizer import bpe_merges_sql
    return bpe_merges_sql(3)


def _bpe_encode_sql() -> str:
    from .tokenizer import bpe_merges_sql
    return bpe_merges_sql(3, encode=True)


def _sampling_sql(name: str) -> str:
    from . import sampling
    return getattr(sampling, name)


def _integrity_sql() -> str:
    from . import integrity
    return integrity.CHECKSUM_SQL


def _integrity_diff_sql() -> str:
    from . import integrity
    return integrity.BUCKET_DIFF_SQL


def _bm25_sql() -> str:
    from .retrieval import bm25_sql
    return bm25_sql()


def _bm25_rerank_sql() -> str:
    from .retrieval import bm25_rerank_sql
    return bm25_rerank_sql()


def _hybrid_rrf_sql() -> str:
    from .retrieval import hybrid_rrf_sql
    return hybrid_rrf_sql()


def _importance_sql(name: str) -> str:
    from . import importance
    return getattr(importance, name)()


def _phrase_search_sql() -> str:
    from .search import phrase_search_sql
    return phrase_search_sql()


def _classifier_pr_sql() -> str:
    from .text import classifier_pr_sql
    return classifier_pr_sql()


def _retrieval_sql(name: str) -> str:
    from . import retrieval
    return getattr(retrieval, name)


def _streaming_sql(name: str) -> str:
    from . import streaming
    return getattr(streaming, name)


def oracles() -> dict[str, str]:
    from .dedup import (INCREMENTAL_SQL, LEAKPROOF_PLANTED_SQL,
                        MINHASH_PLANTED_SQL,
                        MINHASH_SURVIVORS_PLANTED_SQL)
    from .sampling import (CHUNKS_SQL, MIXTURE_SQL, PACKED_SQL,
                       SPLITS_SQL, STRATIFIED_SQL)
    from .similarity import EMBEDDING_PLANTED_SQL, TOPK_PLANTED_SQL
    from .text import (BIGRAM_SQL, COOCCUR_SQL, PII_PLANTED_SQL,
                       SALIENT_SQL, TOP_QUALITY_SQL, TOP_WORDS_SQL)
    sql = {
        "dedup_survivors_planted": MINHASH_SURVIVORS_PLANTED_SQL,
        "docs_splits_leakproof": LEAKPROOF_PLANTED_SQL,
        "docs_dupclass_weights": _dedup_sql("DUPCLASS_WEIGHTS_PLANTED_SQL"),
        "docs_top_quality": TOP_QUALITY_SQL,
        "docs_top_words": TOP_WORDS_SQL,
        "docs_cooccur": COOCCUR_SQL,
        "docs_bigrams": BIGRAM_SQL,
        "docs_salient": SALIENT_SQL,
        "docs_pii_redacted": PII_PLANTED_SQL,
        "docs_splits": SPLITS_SQL,
        "docs_stratified": STRATIFIED_SQL,
        "docs_mixture": MIXTURE_SQL,
        "docs_packed": PACKED_SQL,
        "docs_packed_split": PACKED_SQL,
        "docs_chunks": CHUNKS_SQL,
        "dedup_exact": DEDUP_EXACT_SQL,
        "dedup_incremental": INCREMENTAL_SQL,
        "dedup_incremental_bloom": INCREMENTAL_SQL,
        "dedup_editdist": _dedup_sql("EDITDIST_SQL"),
        "dedup_editdist_census": _dedup_sql("EDITDIST_CENSUS_SQL"),
        "docs_paragraph_dedup": _dedup_sql("PARA_DEDUP_PLANTED_SQL"),
        "bloom_corpus": _bloom_sql("BLOOM_TABLE_SQL"),
        "bloom_probe": _bloom_sql("BLOOM_PROBE_SQL"),
        "dedup_minhash_planted": MINHASH_PLANTED_SQL,
        "docs_bpe_pairs": _tokenizer_sql("BPE_PAIRS_SQL"),
        "docs_bpe_merges": _bpe_merges_sql(),
        "docs_bm25_topk": _bm25_sql(),
        "docs_bm25_rerank": _bm25_rerank_sql(),
        "docs_hybrid_rrf": _hybrid_rrf_sql(),
        "docs_dsir_scores": _importance_sql("importance_sql"),
        "docs_dsir_selected": _importance_sql("dsir_selected_sql"),
        "docs_containment_planted":
            _retrieval_sql("CONTAINMENT_PLANTED_SQL"),
        "events_late_planted": _streaming_sql("LATE_EVENTS_SQL"),
        "docs_bpe_encoded": _bpe_encode_sql(),
        "docs_hash_sample": _sampling_sql("HASH_SAMPLE_SQL"),
        "docs_domain_cap": _sampling_sql("DOMAIN_CAP_SQL"),
        "docs_weighted_sample": _sampling_sql("WEIGHTED_SAMPLE_SQL"),
        "docs_novelty": _text_sql("NOVELTY_SQL"),
        "docs_csv_roundtrip": ROUNDTRIP_SQL,
        "docs_table_checksum": _integrity_sql(),
        "docs_bucket_diff": _integrity_diff_sql(),
        "docs_jsonl_roundtrip": ROUNDTRIP_SQL,
        "docs_feather_roundtrip": ROUNDTRIP_SQL,
        "docs_orc_roundtrip": ROUNDTRIP_SQL,
        "docs_jsonl_gz_roundtrip": ROUNDTRIP_SQL,
        # emb_semdedup (real float embeddings): rows-only by design
        "emb_semdedup_planted": _cluster_sql("SEMDEDUP_PLANTED_SQL"),
        "docs_containment_drops":
            _retrieval_sql("CONTAINMENT_DROPS_SQL"),
        "dedup_embedding_planted": EMBEDDING_PLANTED_SQL,
        "sim_lsh_planted": TOPK_PLANTED_SQL,
        "sim_ivf_planted": TOPK_PLANTED_SQL,
        # sim_pq (real float embeddings): rows-only by design — lossy
        # ADC scores; the planted variant below is exact
        "sim_pq_planted": TOPK_PLANTED_SQL,
        # sim_ivfpq (real float embeddings): rows-only by design —
        # lossy residual codes; the planted variant below is exact
        "sim_ivfpq_planted": TOPK_PLANTED_SQL,
        # sim_pq_codes: rows-only (code indices depend on the trained
        # codebook); invariants pinned by pytest
        # emb_kmeans (real float embeddings): rows-only by design
        "emb_kmeans_planted": _cluster_sql("KMEANS_PLANTED_SQL"),
        "emb_centroid_outliers": _cluster_sql("CENTROID_OUTLIERS_SQL"),
        # emb_quantized (real float embeddings): rows-only by design
        "emb_quantized_planted": _cluster_sql("QUANTIZE_PLANTED_SQL"),
        # emb_pca (real float embeddings): rows-only by design — the
        # planted moment table below is the exact surface
        "emb_pca_moments_planted": _cluster_sql("PCA_MOMENTS_PLANTED_SQL"),
        "sim_topk": SIM_TOPK_SQL,
        "sim_jaccard": SIM_JACCARD_SQL,
        "sim_setjoin": _setjoin_sql("SETJOIN_SQL"),
        # sim_setjoin_drops: rows-only in the driver gate (an empty
        # Dataset drops its schema in to_pandas, like the LSH drop
        # channels); its SQL mirror (SETJOIN_DROPS_SQL) is pinned by a
        # pytest on a planted-overflow corpus instead.
        "text_stats": TEXT_STATS_SQL,
        "text_quality": TEXT_QUALITY_SQL,
        "docs_curated": DOCS_CURATED_SQL,
        "docs_pipeline": DOCS_PIPELINE_SQL,
        "docs_word_df": _word_df_sql(),
        "docs_lm_score": _text_sql("LM_SCORE_SQL"),
        "docs_repetition": _text_sql("REPETITION_SQL"),
        "docs_line_signals": _text_sql("LINE_SIGNALS_SQL"),
        "docs_decontam": _text_sql("DECONTAM_SQL"),
        "docs_classifier": _text_sql("CLASSIFIER_SQL"),
        "docs_classifier_pr": _classifier_pr_sql(),
        "docs_curation_scored": _curation_scored_sql(),
        "events_zonemap_scan": _zonemap_sql(),
        "events_zorder_scan": _zorder_sql(),
        "events_bloom_pointscan": _zonemap_attr_sql("FILE_BLOOM_SQL"),
        "docs_crossdup": _text_sql("CROSSDUP_SQL"),
        "docs_dup_spans": _text_sql("DUP_SPANS_SQL"),
        "docs_normalized": _text_sql("NORMALIZE_SQL"),
        "docs_url_hosts": _text_sql("HOST_STATS_SQL"),
        "docs_blocklist": _text_sql("BLOCKLIST_SQL"),
        "media_meta": MEDIA_META_SQL,
        "media_meta_routed": MEDIA_META_SQL,
        "media_frames": MEDIA_FRAMES_SQL,
        "media_shards": _mm_sql("MEDIA_SHARDS_SQL"),
        "media_phash_pairs": _mm_sql("MEDIA_PHASH_PAIRS_SQL"),
        "media_phash_hist": _mm_sql("MEDIA_PHASH_HIST_SQL"),
        "lang_confusion_planted": _lang_sql(),
        # lang_confusion (raw docs): rows-only — documents.lang is
        # synthetic metadata, there is no SQL-stateable truth.
        "doc_fingerprints": _winnow_sql(),
        "dedup_simhash": SIMHASH_HEX_SQL,
        "docs_inverted_index": _search_sql("INDEX_SUMMARY_SQL"),
        "docs_search": _search_sql("SEARCH_SQL"),
        "docs_phrase_search": _phrase_search_sql(),
        "dedup_simhash_pairs": SIMHASH_PAIRS_SQL,
        # dedup_minhash / sim_lsh / sim_ivf / dedup_embedding /
        # lang_confusion (raw docs): sketch/float/LSH-recall ops with no
        # exact SQL statement -> rows-only check; pytest verifies them
        # against brute force, and each has a *_planted sibling whose
        # construction makes the same operator fully SQL-oracled.
    }
    from nerfray.stages.graph import TRIANGLES_PLANTED_SQL
    sql["graph_triangles_planted"] = TRIANGLES_PLANTED_SQL
    from .bucketed import BUCKETED_JOIN_SQL
    sql["join_bucketed_rollup"] = BUCKETED_JOIN_SQL
    sql.update(relational.ORACLES)
    sql.update(rank.ORACLES)
    sql.update(joins.ORACLES)
    sql.update(sketch.ORACLES)
    sql.update(semistruct.ORACLES)
    sql.update(events.ORACLES)
    return sql
