"""Extension declared queries — the LLM-data-pipeline + relational engine
surface beyond the reference (north star in BASELINE.json): dedup,
similarity search, text analysis, multimodal ingest, relational breadth,
event windows. Each entry pairs a Spark builder with DuckDB oracle SQL
following the same determinism contract as the core queries
(``declared.py``): md5-based hashing (identical hex in both engines),
monetary sums rounded to 2 (float-summation-order safety), ratios/scores
to 6, every ranked output totally ordered with tie-breaks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_tfidf_spark.corpus import load_docs
from hadoop_tfidf_spark.declared import _ORACLE_CTES as _CORE_CTES
from hadoop_tfidf_spark.functions.text import (
    LANG_MARKERS,
    QUALITY_STOPWORDS,
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
)
from hadoop_tfidf_spark.operators import dedup as D
from hadoop_tfidf_spark.operators import relational as R
from hadoop_tfidf_spark.operators import similarity as S
from hadoop_tfidf_spark.operators.multimodal import media_pipeline
from hadoop_tfidf_spark.sources.events import load_events

#: Query vectors for the similarity-search declared queries.
SIM_QUERY_IDS = [0, 1, 2, 3, 4]
SIM_K = 10
NEAR_DUP_COS = 0.9
#: Gate-only near-dup threshold. The driver's synthetic embeddings are
#: near-orthogonal random vectors (max same-bucket pairwise cosine ≈ 0.43 at
#: sf0.01), so the production default 0.9 yields an EMPTY relation and the
#: oracle row would vacuously compare {} to {} — proving nothing. 0.30 keeps
#: ~24 pairs at sf0.01 flowing through the full blocking-join + cosine
#: pipeline, making the hash check exercise real data. The operator default
#: stays :data:`NEAR_DUP_COS`; unit tests cover genuinely-near vectors.
GATE_NEAR_DUP_COS = 0.30
JACCARD_K = 3


def _docs(spark: SparkSession, sf_dir: str, rebalance: bool = False) -> DataFrame:
    """``rebalance=True`` for md5-per-shingle CPU-bound operators (MinHash,
    Jaccard, fingerprint): spreads an under-partitioned scan across cores
    (no-op on a well-split cluster read — see ``corpus.rebalance_scan``)."""
    return load_docs(spark, f"{sf_dir}/documents.parquet", rebalance=rebalance)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# Spark builders
# --------------------------------------------------------------------------

def q_pipeline_curate(spark, sf_dir):
    """Flagship composition: lang-id → quality filter → exact dedup →
    MinHash-LSH near-dup drop → deterministic split, one lazy plan
    (``pipeline.curate_corpus``). The oracle replays every stage in SQL
    over the same corpus — the strongest end-to-end artifact the engine
    declares (each stage is also hash-gated standalone)."""
    from hadoop_tfidf_spark.pipeline import curate_corpus

    return curate_corpus(_docs(spark, sf_dir, rebalance=True))


def q_pipeline_curate_semantic(spark, sf_dir):
    """Flagship curation with ALL THREE dedup modalities composed:
    exact (md5) → lexical (MinHash-LSH) → semantic (SemDeDup over the
    embeddings table, doc_id ≡ vec_id) → split. The semantic keep set
    is one extra doc_id-keyed semi-join on the curated relation; its
    cost is the IVF build, which a real pipeline amortizes across the
    recall dashboards that share the index. Gate threshold
    :data:`GATE_NEAR_DUP_COS` (random embeddings — see
    q_dedup_semantic)."""
    from hadoop_tfidf_spark.pipeline import curate_corpus

    return curate_corpus(
        _docs(spark, sf_dir, rebalance=True),
        embeddings=_emb(spark, sf_dir),
        semantic_threshold=GATE_NEAR_DUP_COS,
        semantic_k=IVF_K,
        semantic_iters=IVF_ITERS,
        semantic_units=IVF_UNITS,
    )


def q_pipeline_curate_pack(spark, sf_dir):
    """Flagship extended to the training-ready layout: the full curation
    pipeline (lang-id → quality → exact dedup → LSH near-dup → split)
    composed with SPLIT-AWARE sequence packing — each train/valid/test
    split packs independently into ~512-token packs (a doc never shares a
    pack across splits), still ONE lazy plan. The oracle replays the
    entire curation in SQL and then the packing window on top."""
    from hadoop_tfidf_spark.operators.sampling import pack_sequences
    from hadoop_tfidf_spark.pipeline import curate_corpus

    curated = curate_corpus(_docs(spark, sf_dir, rebalance=True), keep_text=True)
    return pack_sequences(
        curated.select("doc_id", "text", "split"),
        budget=512,
        n_buckets=8,
        partition_by=["split"],
    )


def q_text_pack_shuffled(spark, sf_dir):
    """Sequence packing in DETERMINISTIC-SHUFFLE order: docs within each
    shard ordered by ``md5("1:{doc_id}")`` instead of doc_id — the
    reproducible global shuffle a training loader wants (same deal on
    every engine/partitioning/rerun; change the seed to re-deal)."""
    from hadoop_tfidf_spark.operators.sampling import pack_sequences

    return pack_sequences(
        _docs(spark, sf_dir), budget=512, n_buckets=8, shuffle_seed=1
    )


def q_dedup_corpus_diff(spark, sf_dir):
    """Content-addressed ingest diff between two synthetic corpus
    generations (old = doc_id % 10 != 0; new = doc_id % 13 != 0 with
    docs at doc_id % 7 == 0 textually revised) — every status class
    (added / removed / changed / unchanged) populated at sf0.01."""
    docs = _docs(spark, sf_dir)
    old = docs.where(F.col("doc_id") % 10 != 0)
    new = docs.where(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    return D.corpus_diff(old, new)


def q_text_self_dedup(spark, sf_dir):
    """Within-doc repeated-span removal (Gopher-style self-dedup repair,
    first-occurrence-wins) — zero-shuffle row-local cleanup; non-vacuous
    at sf0.01 with span_words=2 (~250 repeated spans in 181 docs)."""
    from hadoop_tfidf_spark.functions.text import self_dedup_spans

    return self_dedup_spans(_docs(spark, sf_dir), span_words=2)


def q_text_decontaminate(spark, sf_dir):
    """Decontamination APPLY: the candidate corpus (doc_id % 10 != 0)
    with every doc dropped whose 3-gram overlap against the benchmark
    slice (doc_id % 10 == 0) exceeds 0.1 — non-vacuous at sf0.01 (drops
    200 of 450 candidates)."""
    from hadoop_tfidf_spark.functions.text import decontaminate

    docs = _docs(spark, sf_dir)
    return decontaminate(
        docs.where(F.col("doc_id") % 10 != 0),
        docs.where(F.col("doc_id") % 10 == 0),
        k=3,
        max_overlap=0.1,
    )


def q_dedup_exact(spark, sf_dir):
    return D.exact_dedup(_docs(spark, sf_dir))


def q_dedup_exact_apply(spark, sf_dir):
    """The corpus after exact dedup (keep min doc_id per text) — the
    apply side of dedup_exact."""
    return D.exact_dedup_apply(_docs(spark, sf_dir)).select("doc_id")


def q_dedup_minhash_lsh(spark, sf_dir):
    return D.minhash_lsh_dedup(_docs(spark, sf_dir, rebalance=True))


#: Gate/bench value for the LSH megabucket cap. Production corpora use
#: caps in the hundreds-to-thousands (drop only boilerplate megabuckets);
#: the synthetic corpus has no megabuckets (max bucket = 4 docs), so 2 is
#: the only value that *engages* the valve here — it drops the size-3/4
#: buckets (25→22 pairs at sf0.01) and thereby gives the cap's sizes-agg +
#: filter-join dataflow both a correctness row and a bench timing signal.
GATE_LSH_BUCKET_CAP = 2


def q_dedup_minhash_capped(spark, sf_dir):
    """MinHash-LSH with the ``max_bucket_size`` safety valve ENGAGED (the
    100 TB boilerplate-megabucket path of dedup.lsh_candidate_pairs) —
    see :data:`GATE_LSH_BUCKET_CAP` for the cap choice."""
    return D.minhash_lsh_dedup(
        _docs(spark, sf_dir, rebalance=True),
        max_bucket_size=GATE_LSH_BUCKET_CAP,
    )


def q_dedup_fuzzy(spark, sf_dir):
    """Fuzzy matching: LSH candidate pairs annotated with exact Levenshtein
    distance (dedup.fuzzy_pairs) — all candidates kept so the gate checks
    the distances themselves, not just a threshold's survivors."""
    docs = _docs(spark, sf_dir, rebalance=True)
    return D.fuzzy_pairs(docs, D.minhash_lsh_dedup(docs))


def q_search_bm25(spark, sf_dir):
    """Okapi BM25 ranking over the same query literals as `search` —
    distinct-term semantics, length-normalized saturated tf (search.bm25).
    The oracle recomputes idf/tf_c/score independently in SQL."""
    from hadoop_tfidf_spark.declared import SEARCH_QUERIES, _tokens
    from hadoop_tfidf_spark.search import bm25, query_term_bag
    from hadoop_tfidf_spark.tfidf import doc_word_count

    dwc = doc_word_count(_tokens(spark, sf_dir))
    bag = query_term_bag(spark, SEARCH_QUERIES)
    out = bm25(dwc, bag)
    return out.select("query_id", "doc_id", F.round("score", 6).alias("score"))


def q_text_stratified_sample(spark, sf_dir):
    """Stratified deterministic sampling: documents sampled per predicted
    language at different rates (majority 'en' downsampled to 10%, rare
    'und' kept at 50%) — content-addressed membership, so the oracle
    reproduces it exactly."""
    from hadoop_tfidf_spark.functions.text import lang_id_columns
    from hadoop_tfidf_spark.operators.sampling import (
        hash_bucket_col,
        stratified_hash_sample,
    )

    pred, _ = lang_id_columns(F.col("text"))
    docs = _docs(spark, sf_dir).select(
        "doc_id", "text", pred.alias("pred_lang")
    )
    out = stratified_hash_sample(
        docs, "doc_id", "pred_lang", {"en": 10, "und": 50}
    )
    return out.select(
        "doc_id",
        "pred_lang",
        hash_bucket_col(F.col("doc_id")).cast("bigint").alias("bucket"),
    )


def q_text_lm_score(spark, sf_dir):
    """Corpus-bigram-LM quality scores (functions.text.lm_score) — the
    perplexity-style pretraining filter, hash-gated against an SQL replay
    of the smoothed bigram model. Rebalanced scan: the bigram explode is
    CPU-bound row-local work that a single-file read would serialize
    (measured 2.2x at sf0.1)."""
    from hadoop_tfidf_spark.functions.text import lm_score

    return lm_score(_docs(spark, sf_dir, rebalance=True))


def q_text_lm_histogram(spark, sf_dir):
    """Perplexity-distribution telemetry: fixed-width histogram of the
    corpus-bigram LM score (bucket = floor(score/bucket_width), width
    0.015625 here) with doc shares —
    the threshold-picking chart of a curation run; one low-cardinality
    aggregation, never a global rank. Width 2^-6 (a power of two —
    exact IEEE division) resolves the synthetic corpus's tight score
    range ([-1.58, -1.41] at sf0.01) into ~10 buckets; real corpora
    spread over several log10 units and use the coarser default."""
    from hadoop_tfidf_spark.functions.text import lm_score_histogram

    return lm_score_histogram(
        _docs(spark, sf_dir, rebalance=True), bucket_width=0.015625
    )


def q_dedup_simhash(spark, sf_dir):
    return D.simhash(_docs(spark, sf_dir))


def q_dedup_simhash_pairs(spark, sf_dir):
    return D.simhash_pairs(D.simhash(_docs(spark, sf_dir)))


def q_dedup_ngram_jaccard(spark, sf_dir):
    from pyspark.storagelevel import StorageLevel

    docs = _docs(spark, sf_dir, rebalance=True)
    # One persisted distinct-shingle relation feeds MinHash, both verify
    # join sides, and the size aggregate (Spark recomputes diamonds).
    sh = (
        D.shingles(docs, k=JACCARD_K)
        .select("doc_id", "shingle")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pairs = D.minhash_lsh_dedup(docs, shingle_df=sh)
    return D.ngram_jaccard(docs, pairs, k=JACCARD_K, shingle_df=sh)


def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs at the gate threshold (see
    :data:`GATE_NEAR_DUP_COS` for why it differs from the 0.9 default)."""
    return S.embedding_near_dup(_emb(spark, sf_dir), threshold=GATE_NEAR_DUP_COS)


def q_dedup_semantic(spark, sf_dir):
    """SemDeDup-style semantic dedup: integer-Lloyd IVF cells as
    blocking, within-cell rounded-cosine neighbor test, lowest-id
    representative survives. Gate threshold is
    :data:`GATE_NEAR_DUP_COS` (the synthetic embeddings are random —
    0.95-cosine semantic twins don't exist at sf0.01; the planted
    paraphrase fixtures in tests/test_round8_ops.py exercise the
    production operating point). The embeddings persist across the
    Lloyd build collects (the q_sim_topk_ivfpq pattern — released
    before the lazy pair plan returns); remaining wall at sf0.1 is
    Lloyd driver-job count + codegen of the centroid literal matrix,
    not data volume."""
    from pyspark.storagelevel import StorageLevel

    emb = _emb(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    out = S.semantic_dedup(
        emb,
        k=IVF_K, iters=IVF_ITERS, units=IVF_UNITS,
        threshold=GATE_NEAR_DUP_COS,
    )
    emb.unpersist()  # build collects done — see q_sim_topk_ivfpq
    return out


#: Megacell cap for the gate's capped semantic-dedup row: cells at
#: sf0.01 run 21-38 members (k=16 over 500 vectors), so 34 engages on
#: the real top-4 cells — the valve is exercised, not decorative (the
#: dedup_minhash_capped precedent).
GATE_SEM_CELL_CAP = 34


def q_dedup_semantic_capped(spark, sf_dir):
    """Semantic dedup with the megacell valve ENGAGED: cells larger
    than :data:`GATE_SEM_CELL_CAP` skip the pair test and flag
    ``cell_capped = 1`` (keep-all — dedup's conservative failure mode);
    the flagged fraction is the re-cluster-with-larger-k alarm. Oracle
    replays the cap over the same Lloyd chain."""
    return S.semantic_dedup(
        _emb(spark, sf_dir),
        k=IVF_K, iters=IVF_ITERS, units=IVF_UNITS,
        threshold=GATE_NEAR_DUP_COS,
        max_cell_size=GATE_SEM_CELL_CAP,
    )


def q_sim_topk_brute(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id").isin(SIM_QUERY_IDS))
    return S.brute_force_topk(emb, queries, k=SIM_K).select(
        "query_id", "vec_id", "cos_sim", "rn"
    )


def q_sim_topk_lsh(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id").isin(SIM_QUERY_IDS))
    return S.lsh_topk(emb, queries, k=SIM_K).select(
        "query_id", "vec_id", "cos_sim", "rn"
    )


def q_sim_topk_pandas(spark, sf_dir):
    """Arrow-batched BLAS cosine top-k (mapInPandas) — rows-only: the
    float64 matmul differs from the oracle's sequential fold by ~1 ulp at
    rounding boundaries; tests assert equivalence to the hash-gated
    expression path (sim_topk_brute) instead."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id").isin(SIM_QUERY_IDS))
    return S.pandas_cosine_topk(emb, queries, k=SIM_K).select(
        "query_id", "vec_id", "cos_sim", "rn"
    )


def q_sim_quantize_int8(spark, sf_dir):
    """Int8 embedding quantization under the strong gate — per-vector
    integer code summaries (the per-element codes are identical doubles in
    both engines, so rounding agrees exactly); scalar outputs because the
    driver's canonicalizer can't sort array cells."""
    q = S.quantize_int8(_emb(spark, sf_dir))
    return q.select(
        "vec_id",
        F.size("qvec").cast("bigint").alias("dim"),
        F.round("scale", 6).alias("scale"),
        F.aggregate("qvec", F.lit(0).cast("bigint"), lambda s, x: s + x).alias("qsum"),
        F.array_max("qvec").cast("bigint").alias("qmax"),
    )


def q_text_token_stats(spark, sf_dir):
    return token_stats(_docs(spark, sf_dir))


def q_text_quality(spark, sf_dir):
    return quality_score(_docs(spark, sf_dir))


def q_text_lang_id(spark, sf_dir):
    return lang_id(_docs(spark, sf_dir))


def q_text_fingerprint(spark, sf_dir):
    return fingerprint(_docs(spark, sf_dir, rebalance=True))


def q_multimodal_decode(spark, sf_dir):
    """Real pixel decode: synthetic multi-frame binary-PPM payloads are
    PARSED byte-by-byte (magic, header walk, raw RGB triplets) and the
    per-channel BIGINT pixel sums must match the oracle's analytic
    replay of the generator formula — the engine side never sees the
    formula, only the bytes."""
    return media_pipeline(_docs(spark, sf_dir))


def q_multimodal_resize(spark, sf_dir):
    """Real nearest-neighbor downsample of frame 0 to ≤8×8 over the
    parsed pixel bytes, pinned by a position-weighted integer checksum
    (layout-sensitive, not just a value multiset)."""
    from hadoop_tfidf_spark.operators.multimodal import (
        resize_media,
        with_binary_payload,
    )

    return resize_media(with_binary_payload(_docs(spark, sf_dir)))


def q_multimodal_frames(spark, sf_dir):
    """1:N frame sampling with real per-frame pixel reads: evenly spaced
    frame indices, each emitted as the exact Σ byte·(pos+1) checksum of
    that frame's raw bytes."""
    from hadoop_tfidf_spark.operators.multimodal import (
        sample_frames,
        with_binary_payload,
    )

    return sample_frames(with_binary_payload(_docs(spark, sf_dir)))


def q_multimodal_phash(spark, sf_dir):
    """Perceptual average-hash of frame 0 over the PARSED pixel bytes:
    4x4 nearest-neighbor luminance grid, bit set iff cell gray beats
    the grid mean (all-integer: gray=r+g+b, compare gray*16 > total).
    The engine walks real bytes; the oracle replays the generator
    formula analytically — identical 16-bit hashes or the gate fails."""
    from hadoop_tfidf_spark.operators.multimodal import (
        media_phash,
        with_binary_payload,
    )

    return media_phash(with_binary_payload(_docs(spark, sf_dir)))


def q_multimodal_phash_dedup(spark, sf_dir):
    """Image-modality exact perceptual dedup: docs whose frame-0 aHash
    collides are perceptual duplicates (the synthetic gradient family
    collides heavily BY DESIGN — 72 distinct hashes over 500 docs at
    sf0.01, so the gate relation is far from vacuous); lowest doc_id
    survives. One Arrow hash scan + ONE phash window — the span-dedup
    single-window tag on pixels."""
    from hadoop_tfidf_spark.operators.multimodal import (
        phash_dedup,
        with_binary_payload,
    )

    return phash_dedup(with_binary_payload(_docs(spark, sf_dir)))


def q_multimodal_phash_pairs(spark, sf_dir):
    """NEAR-duplicate image pairs within Hamming 1 of the perceptual
    hash, found by the banded blocking join (4 bands x 4 bits —
    pigeonhole-complete for hamming<=1); exact distance = one
    bit_count(xor) per candidate. The SimHash recipe on pixels."""
    from hadoop_tfidf_spark.operators.multimodal import (
        phash_near_pairs,
        with_binary_payload,
    )

    return phash_near_pairs(
        with_binary_payload(_docs(spark, sf_dir)), max_hamming=1
    )


def q_multimodal_audio_decode(spark, sf_dir):
    """AUDIO decode — the second real binary modality: synthetic mono
    PCM16 WAVs (real RIFF + fmt + data chunk layout) are parsed by
    walking the actual chunks byte-by-byte; the exact BIGINT sample
    sums must match the oracle's analytic replay of the generator
    sawtooth — the engine side never sees the formula, only bytes."""
    from hadoop_tfidf_spark.operators.multimodal import (
        decode_audio,
        with_audio_payload,
    )

    return decode_audio(with_audio_payload(_docs(spark, sf_dir)))


def q_multimodal_audio_resample(spark, sf_dir):
    """Real nearest-neighbor decimation of the parsed samples to 4 kHz
    (the resize_media gather rule on the time axis), pinned by a
    position-weighted integer checksum — layout-sensitive, not just the
    value multiset."""
    from hadoop_tfidf_spark.operators.multimodal import (
        resample_audio,
        with_audio_payload,
    )

    return resample_audio(
        with_audio_payload(_docs(spark, sf_dir)), target_rate=4000
    )


def q_rel_pricing_summary(spark, sf_dir):
    return R.pricing_summary(_tbl(spark, sf_dir, "lineitem"))


def q_rel_revenue_by_region(spark, sf_dir):
    return R.revenue_by_region(
        _tbl(spark, sf_dir, "orders"),
        _tbl(spark, sf_dir, "customer"),
        _tbl(spark, sf_dir, "nation"),
        _tbl(spark, sf_dir, "region"),
    )


def q_rel_top_customers(spark, sf_dir):
    return R.top_customers_per_nation(
        _tbl(spark, sf_dir, "orders"),
        _tbl(spark, sf_dir, "customer"),
        _tbl(spark, sf_dir, "nation"),
    )


def q_rel_acctbal_rollup(spark, sf_dir):
    return R.acctbal_rollup(
        _tbl(spark, sf_dir, "customer"),
        _tbl(spark, sf_dir, "nation"),
        _tbl(spark, sf_dir, "region"),
    )


def q_events_tumbling(spark, sf_dir):
    return R.events_tumbling(load_events(spark, sf_dir))


def q_events_sessionize(spark, sf_dir):
    return R.sessionize(load_events(spark, sf_dir))


def q_events_json_props(spark, sf_dir):
    return R.json_props_stats(load_events(spark, sf_dir))


def q_asof_last_purchase(spark, sf_dir):
    """Backward as-of join: each event gets the user's most recent purchase
    value at-or-before its timestamp. Oracle = DuckDB's native ASOF LEFT
    JOIN — an independent implementation checking the union+window one."""
    from hadoop_tfidf_spark.operators.asof import asof_join

    ev = load_events(spark, sf_dir)
    # microsecond basis: DuckDB truncates nanosecond parquet timestamps to
    # micros on read, so cross-engine event-time comparisons use ts_us
    ev = ev.withColumn("ts_us", F.expr("ts_ns div 1000"))
    left = ev.select("event_id", "user_id", "ts_us")
    right = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts_us").alias("pts"))
        .agg(F.max("value").alias("pval"))
    )
    out = asof_join(
        left, right, on="user_id", left_time="ts_us", right_time="pts",
        right_values=["pval"],
    )
    return out.select(
        "event_id", "user_id", "ts_us",
        F.col("pval_asof").alias("last_purchase_value"),
    )


def q_rel_event_pivot(spark, sf_dir):
    return R.event_type_pivot(load_events(spark, sf_dir))


def q_rel_region_year_cube(spark, sf_dir):
    return R.region_year_cube(
        _tbl(spark, sf_dir, "orders"),
        _tbl(spark, sf_dir, "customer"),
        _tbl(spark, sf_dir, "nation"),
        _tbl(spark, sf_dir, "region"),
    )


def q_rel_customers_without_orders(spark, sf_dir):
    """Customers with no orders in 1995. Scoped to a year because at every
    driver SF each customer has *some* order — the unscoped variant returns
    the empty set and the gate row would vacuously compare {} to {} (326
    rows at sf0.01 with the year scope)."""
    return R.customers_without_orders(
        _tbl(spark, sf_dir, "customer"), _tbl(spark, sf_dir, "orders"), year=1995
    )


def q_rel_approx_distinct(spark, sf_dir):
    """Sketch-based aggregates — rows-only (no oracle entry: HLL++/GK
    results are approximations; tests/test_relational_ops.py bounds the
    error against exact instead; the hash-gated envelope form is
    ``rel_approx_distinct_bounds``)."""
    return R.approx_distinct_stats(_tbl(spark, sf_dir, "lineitem"))


def q_rel_approx_distinct_bounds(spark, sf_dir):
    """Error-envelope form of the sketch aggregates UNDER the hash gate:
    exact values + in-bounds flags that the oracle asserts are literally 1
    (relational.approx_distinct_bounds) — a sketch drifting past its
    contract flips a flag and fails the row."""
    return R.approx_distinct_bounds(_tbl(spark, sf_dir, "lineitem"))


#: |rounded BLAS cosine − rounded fold cosine| tolerance for the envelope
#: gate: the two float64 summation orders differ by ~1 ulp, which the
#: 6-decimal rounding can stretch to one rounding step (1e-6).
BLAS_COS_TOL = 2e-6


def q_sim_topk_pandas_bounds(spark, sf_dir):
    """Error-envelope form of the Arrow/BLAS top-k UNDER the hash gate:
    inner-join the mapInPandas result to the expression-path result on
    (query_id, vec_id) — a missing pair changes the row count, a rank
    disagreement or a cosine off by more than :data:`BLAS_COS_TOL` flips
    ``blas_ok`` — and the oracle (the proven brute-force SQL + literal 1)
    hash-checks all of it."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id").isin(SIM_QUERY_IDS))
    b = S.brute_force_topk(emb, queries, k=SIM_K).select(
        "query_id", "vec_id", "cos_sim", "rn"
    )
    p = S.pandas_cosine_topk(emb, queries, k=SIM_K).select(
        "query_id",
        "vec_id",
        F.col("cos_sim").alias("p_cos"),
        F.col("rn").alias("p_rn"),
    )
    return b.join(p, ["query_id", "vec_id"], "inner").select(
        "query_id",
        "vec_id",
        "cos_sim",
        "rn",
        (
            (F.abs(F.col("p_cos") - F.col("cos_sim")) <= F.lit(BLAS_COS_TOL))
            & (F.col("p_rn") == F.col("rn"))
        ).cast("bigint").alias("blas_ok"),
    )


def q_events_moving_avg(spark, sf_dir):
    return R.user_value_moving_avg(load_events(spark, sf_dir))


def q_rel_repeat_customers(spark, sf_dir):
    return R.repeat_customers(_tbl(spark, sf_dir, "orders"), 1996, 1997)


#: Integer micro-unit scale for the oracle-gated IVF build: embeddings,
#: centroids and distances are carried as round(x·1e6) bigints, making
#: every Lloyd round order-independent and bit-replayable in SQL (the same
#: quantization trick that hash-gated lm_score and the streaming sums).
IVF_UNITS = 1_000_000
IVF_K = 16
IVF_ITERS = 2
IVF_NPROBE = 2


def q_sim_topk_ivf(spark, sf_dir):
    """IVF (k-means coarse quantizer) ANN — HASH-GATED since round 6: the
    build runs in integer micro-units (:data:`IVF_UNITS`), so seeding,
    both Lloyd rounds, assignment and probing are integer-exact and the
    DuckDB oracle replays the whole iteration unrolled (recall vs brute
    stays covered by tests/test_ivf.py)."""
    emb = _emb(spark, sf_dir)
    assigned, cents = S.ivf_build(emb, k=IVF_K, iters=IVF_ITERS, units=IVF_UNITS)
    queries = emb.where(F.col("vec_id").isin(SIM_QUERY_IDS))
    return S.ivf_topk(
        assigned, cents, queries, k=SIM_K, nprobe=IVF_NPROBE, units=IVF_UNITS,
        probe_select="driver",  # 5 ids, statically tiny — skip auto's count job
    ).select("query_id", "vec_id", "cos_sim", "rn")


#: Deterministic training predicate for the sample-trained IVF row: a
#: pure id-modulus keeps ~2/3 of vectors in the Lloyd statistics — a
#: content-independent subset both engines derive identically (the same
#: reason the md5-bucket sampler is the hash-gateable sampling form).
IVF_TRAIN_MOD = 3


def q_sim_topk_ivf_sample(spark, sf_dir):
    """Round 14 — the SAMPLE-TRAINED IVF build (ivf_build(train=…)): the
    docstrings have always said "at 100 TB the builds train on a
    sample, assign the full corpus once"; this row runs that split
    under the gate. Seed + both Lloyd rounds' statistics cover only the
    deterministic ~2/3 training subset (vec_id % 3 != 2 — replayable,
    unlike a random sample), the final assignment and the probe/search
    cover the FULL corpus, so Lloyd cost scales with the sample while
    answers stay corpus-complete. The oracle replays the unrolled
    integer build with the same train restriction (``_ivf_sql
    (train_where=…)``)."""
    emb = _emb(spark, sf_dir)
    assigned, cents = S.ivf_build(
        emb, k=IVF_K, iters=IVF_ITERS, units=IVF_UNITS,
        train=emb.where(F.col("vec_id") % IVF_TRAIN_MOD != IVF_TRAIN_MOD - 1),
    )
    queries = emb.where(F.col("vec_id").isin(SIM_QUERY_IDS))
    return S.ivf_topk(
        assigned, cents, queries, k=SIM_K, nprobe=IVF_NPROBE, units=IVF_UNITS,
        probe_select="driver",
    ).select("query_id", "vec_id", "cos_sim", "rn")


def q_sim_topk_ivf_bulk(spark, sf_dir):
    """Round 13 — the BULK-query IVF path: every corpus vector is a query
    (kNN-graph construction, the shape a semantic-clustering or re-rank
    job runs at 100 TB). ``probe_select="executor"`` keeps the per-query
    nearest-probe computation on executors via the
    ``nearest_centroid_ids`` expression (similarity.py) — ZERO query-side
    collect, unlike the interactive driver-loop path — and the probe
    relation stays distributed (join strategy left to Catalyst/AQE).
    HASH-GATED: integer micro-unit probes are bit-identical to the
    driver loop's python-int distances (same ``(d2, ci)`` tie-break), so
    the unrolled DuckDB oracle covers both paths with one SQL chain."""
    emb = _emb(spark, sf_dir)
    assigned, cents = S.ivf_build(emb, k=IVF_K, iters=IVF_ITERS, units=IVF_UNITS)
    return S.ivf_topk(
        assigned,
        cents,
        emb,
        k=SIM_K,
        nprobe=IVF_NPROBE,
        units=IVF_UNITS,
        probe_select="executor",
    ).select("query_id", "vec_id", "cos_sim", "rn")


PQ_M = 4
PQ_K = 16
PQ_ITERS = 1


def q_sim_topk_pq(spark, sf_dir):
    """Product-quantization ANN (Jégou et al. 2011): per-subspace integer
    micro-unit k-means codebooks, corpus encoded to :data:`PQ_M` codes,
    ADC top-k per query — every step exact BIGINT arithmetic, so the
    DuckDB oracle replays the whole build+search unrolled (the same
    integer-quantization trick that hash-gated IVF). Since round 7 the
    codes ride BIT-PACKED (one ``pq_code`` BIGINT, one byte per code —
    the stored-index compression form) and the search unpacks with a
    shift-and-mask projection; the hash row therefore pins pack+unpack
    round-tripping too."""
    emb = _emb(spark, sf_dir)
    codes, books = S.pq_build(
        emb, m=PQ_M, k=PQ_K, iters=PQ_ITERS, units=IVF_UNITS, pack=True
    )
    return S.pq_topk(
        emb, codes, books, SIM_QUERY_IDS, k=SIM_K, units=IVF_UNITS
    )


def q_sim_topk_ivfpq(spark, sf_dir):
    """IVFADC (Jégou et al. 2011 §IV) — the realistic 100 TB ANN shape:
    IVF coarse cells + bit-packed PQ codes, probe :data:`IVF_NPROBE`
    integer-nearest cells per query, rank ONLY their members by ADC
    table lookups. Both builds and the whole search are exact BIGINT
    arithmetic, so the oracle replays coarse Lloyd, per-subspace Lloyd,
    the probe, and the ADC sum unrolled.

    The embeddings persist across the composed builds: coarse Lloyd +
    per-subspace Lloyds + encode is ~11 passes over the table, each of
    which would otherwise re-read parquet. At 100 TB the builds train on
    a SAMPLE (persist that instead); only the one-pass encode touches
    the full corpus."""
    from pyspark.storagelevel import StorageLevel

    emb = _emb(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    assigned, cents = S.ivf_build(emb, k=IVF_K, iters=IVF_ITERS, units=IVF_UNITS)
    codes, books = S.pq_build(
        emb, m=PQ_M, k=PQ_K, iters=PQ_ITERS, units=IVF_UNITS, pack=True
    )
    out = S.ivfpq_topk(
        assigned, cents, codes, books, SIM_QUERY_IDS,
        k=SIM_K, nprobe=IVF_NPROBE, units=IVF_UNITS,
    )
    # the cache exists to serve the ~11 BUILD collects, all executed by
    # now — release it immediately so repeated invocations in one session
    # (bench trials, gate drives) don't pin extra embedding copies; the
    # returned lazy search plan simply re-reads parquet for its one pass
    emb.unpersist()
    return out


def q_rel_price_bands(spark, sf_dir):
    return R.price_band_summary(_tbl(spark, sf_dir, "orders"), spark)


def q_rel_order_calendar(spark, sf_dir):
    return R.order_calendar(_tbl(spark, sf_dir, "orders"))


def q_events_click_purchase(spark, sf_dir):
    return R.click_purchase_funnel(load_events(spark, sf_dir))


def q_rel_lapsed_customers(spark, sf_dir):
    return R.lapsed_customers(_tbl(spark, sf_dir, "orders"), 1996, 1997)


def q_text_bpe_pairs(spark, sf_dir):
    """Tokenizer-training statistics: first-round BPE pair counts over
    the word-frequency table (chars as initial symbols) — the relation
    whose argmax is the first merge; vocabulary-sized work after one
    corpus aggregation."""
    from hadoop_tfidf_spark.functions.text import bpe_pair_counts

    return bpe_pair_counts(_docs(spark, sf_dir), top=100)


#: Merge rounds for the gated BPE-vocabulary replay (each round is one
#: vocab aggregation + a 1-row collect Spark-side, and one CTE stage in
#: the oracle).
BPE_GATE_MERGES = 4


def q_text_bpe_vocab(spark, sf_dir):
    """The BPE TRAINER itself under the hash gate: run
    :func:`bpe_train` for :data:`BPE_GATE_MERGES` deterministic merges
    and emit the symbolized vocabulary — the oracle replays every round
    (pair counts → argmax by (count desc, pair) → non-overlapping
    left-to-right fold rewrite via ``list_reduce``), so the merge
    CHOICES and their application both hash-match, not just the
    first-round statistics."""
    from hadoop_tfidf_spark.functions.text import bpe_train

    _, vocab = bpe_train(_docs(spark, sf_dir), n_merges=BPE_GATE_MERGES)
    out = vocab.select(
        "word",
        F.col("n").cast("bigint").alias("n"),
        F.size("symbols").cast("int").alias("n_symbols"),
        F.array_join("symbols", " ").alias("symbols_str"),
    )
    # release the trainer's cache — the returned lazy plan re-derives
    # the fold chain from the collected merge literals (the
    # q_sim_topk_ivfpq pattern)
    vocab.unpersist()
    return out


def q_text_bpe_tokens(spark, sf_dir):
    """Per-doc token counts under the 4-merge trained BPE tokenizer —
    the packing/mixture budget unit; trainer runs once, the count is a
    word-keyed join + doc aggregation (merges never re-applied per
    doc). Oracle shares the trainer replay chain with
    text_bpe_vocab."""
    from hadoop_tfidf_spark.functions.text import bpe_token_counts, bpe_train

    _, vocab = bpe_train(_docs(spark, sf_dir), n_merges=BPE_GATE_MERGES)
    out = bpe_token_counts(_docs(spark, sf_dir), vocab)
    vocab.unpersist()  # lazy count plan re-derives the fold chain
    return out


#: Seed for the train/held-out split of the BPE holdout gate query.
BPE_HOLDOUT_SEED = "bpeho"


def q_text_bpe_tokens_holdout(spark, sf_dir):
    """BPE budget accounting for a HELD-OUT corpus — the deployment
    every production tokenizer faces: train the 4-merge tokenizer on
    half the corpus (hash-split by doc_id), then bill the OTHER half
    against that vocab. Unseen words take the char-length byte-fallback
    path (left join + coalesce — never silently dropped), and
    ``n_fallback_words`` surfaces the vocab/corpus mismatch rate. The
    oracle replays the trainer over the same train slice and the same
    left-join scoring of the complement."""
    from hadoop_tfidf_spark.functions.text import bpe_token_counts, bpe_train
    from hadoop_tfidf_spark.operators.sampling import hash_bucket_col

    docs = _docs(spark, sf_dir)
    bucket = hash_bucket_col(F.col("doc_id"), 2, BPE_HOLDOUT_SEED)
    _, vocab = bpe_train(docs.where(bucket == 0), n_merges=BPE_GATE_MERGES)
    out = bpe_token_counts(docs.where(bucket == 1), vocab)
    vocab.unpersist()  # lazy count plan re-derives the fold chain
    return out


def q_text_pack_bpe(spark, sf_dir):
    """Sequence packing budgeted in TRAINED-TOKENIZER tokens instead of
    whitespace words — the unit the training loader actually bills
    (whitespace over-counts rare words, under-counts merged subwords).
    Composition: the 4-merge BPE trainer -> per-doc counts -> the
    hash-bucketed packing window with ``tokens=n_bpe_tokens``; the
    oracle nests the full trainer replay under the pack replay."""
    from hadoop_tfidf_spark.functions.text import bpe_token_counts, bpe_train
    from hadoop_tfidf_spark.operators.sampling import pack_sequences

    docs = _docs(spark, sf_dir)
    _, vocab = bpe_train(docs, n_merges=BPE_GATE_MERGES)
    out = pack_sequences(
        bpe_token_counts(docs, vocab), tokens=F.col("n_bpe_tokens")
    )
    vocab.unpersist()  # lazy pack plan re-derives the fold chain
    return out


def q_text_mixture_bpe(spark, sf_dir):
    """Mixture-weight accounting in BPE tokens: per-(source, lang) token
    shares and uniform-resample weights where the token is the trained
    tokenizer's — the number a pretraining recipe's mixture table
    actually uses. One doc_id equi-join (counts to strata columns), one
    strata-keyed aggregation."""
    from hadoop_tfidf_spark.functions.text import bpe_token_counts, bpe_train
    from hadoop_tfidf_spark.operators.sampling import mixture_weights

    docs = _docs(spark, sf_dir)
    _, vocab = bpe_train(docs, n_merges=BPE_GATE_MERGES)
    strata = _tbl(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    joined = strata.join(bpe_token_counts(docs, vocab), "doc_id")
    out = mixture_weights(joined, tokens=F.col("n_bpe_tokens"))
    vocab.unpersist()
    return out


#: Hash-feature buckets / smoothing for the gated DSIR replay — small
#: enough that the oracle's window totals stay trivial, large enough
#: that bucket collisions don't flatten the signal at sf0.01.
DSIR_GATE_BUCKETS = 256
DSIR_GATE_TARGET = "src0"


def q_text_dsir(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023): every doc scored by
    hashed-bigram log-likelihood ratio against the ``source = 'src0'``
    target slice — the data-selection signal for "find more docs like
    the trusted domain". Integer micro-log units make the per-doc sum
    engine-exact (the lm_score pattern)."""
    from hadoop_tfidf_spark.operators.sampling import dsir_importance

    return dsir_importance(
        _tbl(spark, sf_dir, "documents"),
        F.col("source") == DSIR_GATE_TARGET,
        n_buckets=DSIR_GATE_BUCKETS,
    )


def q_text_dsir_select(spark, sf_dir):
    """The DSIR selection cut: top-100 NON-target docs by importance
    weight (logratio desc, doc_id tiebreak) — the materialized "more
    data like the target" slice a pretraining recipe feeds back into
    the mixture. TakeOrderedAndProject, never a global sort."""
    from hadoop_tfidf_spark.operators.sampling import (
        dsir_importance,
        dsir_select,
    )

    docs = _tbl(spark, sf_dir, "documents")
    imp = dsir_importance(
        docs, F.col("source") == DSIR_GATE_TARGET, n_buckets=DSIR_GATE_BUCKETS
    )
    raw_only = imp.join(
        docs.where(F.col("source") == DSIR_GATE_TARGET).select("doc_id"),
        "doc_id",
        "left_anti",
    )
    return dsir_select(raw_only, top_n=100)


#: JL random-projection gate parameters: 64 -> 16 dims, micro-unit
#: quantization, and a ~1/50 content-keyed id sample for the all-pairs
#: distortion audit (~40 ids => ~800 pairs at sf0.01).
RP_GATE_OUT_DIM = 16
RP_GATE_IN_DIM = 64
RP_GATE_UNITS = 1_000_000
RP_SAMPLE_MOD = 50


def q_sim_rp_project(spark, sf_dir):
    """Johnson-Lindenstrauss Rademacher projection 64 -> 16, exploded to
    ``(vec_id, j, v_u)`` scalar rows for the gate compare. The seeded
    +/-1 matrix re-derives from md5 parity on both engines; every
    component is an exact BIGINT micro-unit sum. Zero shuffles, zero
    joins, zero Python — the 100 TB pre-step before ANN/clustering when
    the raw dimension is wide."""
    from hadoop_tfidf_spark.operators.similarity import random_projection

    out = random_projection(
        _emb(spark, sf_dir),
        out_dim=RP_GATE_OUT_DIM,
        in_dim=RP_GATE_IN_DIM,
        units=RP_GATE_UNITS,
    )
    return out.select(
        "vec_id", F.posexplode("rp").alias("j", "v_u")
    ).select("vec_id", F.col("j").cast("int").alias("j"), "v_u")


def q_sim_rp_distortion(spark, sf_dir):
    """The JL fidelity dashboard: pairwise ``d2_proj / (16 * d2_orig)``
    over a deterministic ~40-id hash sample — the ratio the lemma says
    concentrates at 1, and the number that says whether 16 dims suffice
    BEFORE ANN recall quietly degrades. All-pairs only within the
    sample (broadcast), distances exact BIGINT, d2=0 guarded to NULL."""
    from hadoop_tfidf_spark.operators.similarity import rp_distortion

    return rp_distortion(
        _emb(spark, sf_dir),
        out_dim=RP_GATE_OUT_DIM,
        in_dim=RP_GATE_IN_DIM,
        units=RP_GATE_UNITS,
        sample_mod=RP_SAMPLE_MOD,
    )


#: Integer power-iteration PCA gate parameters: top-4 components, 8
#: matvec+requantize rounds each, inputs at 1e-4 quantization (keeps the
#: exact-integer covariance numerator far inside 2^53 at gate scale).
PCA_GATE_K = 4
PCA_GATE_ITERS = 8
PCA_GATE_UNITS = 10_000


def q_sim_pca_components(spark, sf_dir):
    """Top-4 principal components by integer power iteration with
    deflation: the covariance numerator ``n*S - s*s^T`` is an exact
    BIGINT matrix (computed distributed via Arrow int64 gemm partials),
    and every iteration step requantizes through half-away rounding —
    so the DuckDB oracle replays the ENTIRE eigensolve (rescale, 8
    matvec rounds x 4 components, Rayleigh quotients, deflation)
    bit-for-bit. Output ``(component, d, v_u, lambda_q)``; the tiny
    k x dim result materializes driver-side by construction (the
    corpus-sized work all ran in executors)."""
    from hadoop_tfidf_spark.operators.similarity import pca_power_build

    comps, lams, _ = pca_power_build(
        _emb(spark, sf_dir),
        k=PCA_GATE_K,
        iters=PCA_GATE_ITERS,
        units=PCA_GATE_UNITS,
    )
    rows = [
        (c, d, int(v), float(lams[c]))
        for c, comp in enumerate(comps)
        for d, v in enumerate(comp)
    ]
    out = spark.createDataFrame(
        rows, "component INT, d INT, v_u BIGINT, lambda_q DOUBLE"
    )
    return out.select(
        "component", "d", "v_u", F.round("lambda_q", 6).alias("lambda_q")
    )


def q_sim_pca_project(spark, sf_dir):
    """The trained counterpart of the JL projection: corpus projected
    onto its own top-4 variance directions — exact BIGINT dot products
    against the power-iteration components, one narrow zero-shuffle
    pass (components ride into codegen as array literals). The oracle
    replays the full build AND the projection."""
    from hadoop_tfidf_spark.operators.similarity import (
        pca_power_build,
        pca_project,
    )

    emb = _emb(spark, sf_dir)
    comps, _, _ = pca_power_build(
        emb, k=PCA_GATE_K, iters=PCA_GATE_ITERS, units=PCA_GATE_UNITS
    )
    return pca_project(emb, comps, units=PCA_GATE_UNITS)


#: Stage-1 candidate budget for the two-stage RP retrieval: how many
#: projected-space nearest ids survive to the exact full-dim re-rank.
RP_TOPK_CANDIDATES = 50


def q_sim_pca_topk(spark, sf_dir):
    """Two-stage retrieval through TRAINED PCA coordinates — the
    rp_topk pattern with the corpus's own top-4 variance directions:
    stage 1 cuts candidates by exact integer L2 in the 4-int projected
    index (the best 4-dim L2 approximation, vs the JL projection's
    merely distortion-bounded one), stage 2 re-ranks by exact full-dim
    integer L2. Unwhitened scores by design (whitening distorts L2).
    The oracle nests the full power-iteration replay and both ranking
    stages. Registered past-cap this round (the window is full of
    mandated entries); FIRST round-10 rotation priority per the
    past-cap-newcomer rule."""
    from hadoop_tfidf_spark.operators.similarity import pca_topk

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id").isin(SIM_QUERY_IDS))
    return pca_topk(
        emb,
        queries,
        k=SIM_K,
        candidates=RP_TOPK_CANDIDATES,
        n_components=PCA_GATE_K,
        iters=PCA_GATE_ITERS,
        units=PCA_GATE_UNITS,
    )


def q_sim_rp_topk(spark, sf_dir):
    """Two-stage retrieval through the JL projection: coarse top-50 by
    exact integer L2 in the 16-int projected index (16/64 of a full
    scan's bytes), exact full-dimension re-rank of those candidates
    only. Both stages BIGINT-exact -> the whole ranking including
    tie-breaks replays in DuckDB. Registered past-cap this round;
    FIRST round-9 rotation priority."""
    from hadoop_tfidf_spark.operators.similarity import rp_topk

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id").isin(SIM_QUERY_IDS))
    return rp_topk(
        emb,
        queries,
        k=SIM_K,
        candidates=RP_TOPK_CANDIDATES,
        out_dim=RP_GATE_OUT_DIM,
        in_dim=RP_GATE_IN_DIM,
        units=RP_GATE_UNITS,
    )


def q_sim_rp_recall(spark, sf_dir):
    """Recall telemetry for the two-stage RP retrieval: per query, how
    many of the exact integer-L2 top-10 survive the projected-space
    candidate cut — the dashboard number that says whether the
    candidate budget (and out_dim) are sized right, exactly as
    ``sim_recall_audit`` watches the IVFADC index. Both rankings are
    BIGINT-exact with id tie-breaks, so n_hits is deterministic and
    the oracle replays both sides. On the gate's RANDOM synthetic
    embeddings recall sits at 0.1-0.5 — distance concentration makes
    random data the worst case for any projection (the same effect
    that flattens the IVFADC nprobe curve here); on clustered data the
    cut keeps the true neighbors (test_rp_topk_clustered_data_*), and
    THAT divergence is exactly what this dashboard row exists to
    surface before sizing candidates/out_dim in production."""
    from hadoop_tfidf_spark.operators.similarity import int_l2_topk, rp_topk

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id").isin(SIM_QUERY_IDS))
    approx = rp_topk(
        emb,
        queries,
        k=SIM_K,
        candidates=RP_TOPK_CANDIDATES,
        out_dim=RP_GATE_OUT_DIM,
        in_dim=RP_GATE_IN_DIM,
        units=RP_GATE_UNITS,
    ).select("query_id", "vec_id")
    exact = int_l2_topk(emb, queries, k=SIM_K, units=RP_GATE_UNITS)
    hits = (
        exact.join(approx, ["query_id", "vec_id"], "leftsemi")
        .groupBy("query_id")
        .agg(F.count("*").cast("bigint").alias("n_hits"))
    )
    return (
        queries.select(F.col("vec_id").alias("query_id"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias(
                "n_hits"
            ),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(SIM_K)), 6
            ).alias("recall"),
        )
    )


#: Candidate budgets the RP-IVFADC recall audit sweeps (stage-1 ADC
#: survivors per query, probed from ONE shared index build).
RP_IVFPQ_BUDGETS = (25, 50)


def q_sim_topk_rp_ivfpq(spark, sf_dir):
    """Dimensionality-reduced ANN — residual IVFADC built IN the 16-dim
    JL projection with exact full-dimension re-rank (Jégou §VII's
    deployment shape, the natural consumer of the r8 projections):
    index build, storage and probe all touch out_dim/in_dim of the
    bytes; only ~candidates rows per query are read at full width.
    Every stage integer-exact -> the whole chain (projection, coarse
    Lloyd, residual PQ Lloyd, ADC cut, full-dim re-rank, tie-breaks)
    replays in DuckDB."""
    from pyspark.storagelevel import StorageLevel

    emb = _emb(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    out = S.rp_ivfpq_topk(
        emb, SIM_QUERY_IDS, k=SIM_K, candidates=RP_TOPK_CANDIDATES,
        nprobe=IVF_NPROBE, out_dim=RP_GATE_OUT_DIM, in_dim=RP_GATE_IN_DIM,
        units=RP_GATE_UNITS, coarse_k=IVF_K, coarse_iters=IVF_ITERS,
        m=PQ_M, pq_k=PQ_K, pq_iters=PQ_ITERS,
    )
    emb.unpersist()  # build collects done — see q_sim_topk_ivfpq
    return out


def q_sim_rp_ivfpq_recall(spark, sf_dir):
    """The candidate-budget/recall tradeoff for the compressed index,
    measured against the full-dim index on the same exact truth: per
    (method, query), how many of the exact integer-L2 top-10 survive.
    Methods: ``rp_ivfpq_c{25,50}`` — ONE RP-space residual-IVFADC
    build probed at two stage-1 budgets (the Lloyd chains are shared;
    only the ADC cut differs) — and ``ivfpq_full`` — the full-dim
    residual IVFADC's direct ADC top-k (no re-rank), the index this
    composition competes with. The three-way row answers the sizing
    question a deployment asks: how many stage-1 candidates buy back
    the recall the 4x-narrower index gives up, and where does it cross
    the full-width index. All rankings BIGINT-exact with id
    tie-breaks -> n_hits is deterministic and the oracle replays all
    three branches plus the exact truth."""
    from pyspark.storagelevel import StorageLevel

    emb = _emb(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    queries = emb.where(F.col("vec_id").isin(SIM_QUERY_IDS))
    exact = (
        S.int_l2_topk(emb, queries, k=SIM_K, units=RP_GATE_UNITS)
        .select("query_id", "vec_id")
    )
    index = S.rp_ivfpq_build(
        emb, out_dim=RP_GATE_OUT_DIM, in_dim=RP_GATE_IN_DIM,
        units=RP_GATE_UNITS, coarse_k=IVF_K, coarse_iters=IVF_ITERS,
        m=PQ_M, pq_k=PQ_K, pq_iters=PQ_ITERS,
    )
    branches = []
    for budget in RP_IVFPQ_BUDGETS:
        branches.append(
            S.rp_ivfpq_topk(
                emb, SIM_QUERY_IDS, k=SIM_K, candidates=budget,
                nprobe=IVF_NPROBE, units=RP_GATE_UNITS, index=index,
            ).select(
                F.lit(f"rp_ivfpq_c{budget}").alias("method"),
                "query_id",
                "vec_id",
            )
        )
    fa, fc, fcodes, fbooks = S.ivfpq_build_residual(
        emb, coarse_k=IVF_K, coarse_iters=IVF_ITERS,
        m=PQ_M, k=PQ_K, iters=PQ_ITERS, units=IVF_UNITS, pack=True,
    )
    branches.append(
        S.ivfpq_topk(
            fa, fc, fcodes, fbooks, SIM_QUERY_IDS,
            k=SIM_K, nprobe=IVF_NPROBE, units=IVF_UNITS,
            embeddings=emb, residual=True,
        ).select(F.lit("ivfpq_full").alias("method"), "query_id", "vec_id")
    )
    approx = branches[0]
    for b in branches[1:]:
        approx = approx.unionByName(b)
    hits = (
        exact.join(approx, ["query_id", "vec_id"], "inner")
        .groupBy("method", "query_id")
        .agg(F.count("*").cast("bigint").alias("n_hits"))
    )
    methods = [f"rp_ivfpq_c{b}" for b in RP_IVFPQ_BUDGETS] + ["ivfpq_full"]
    # the (method x query) grid is a constant-sized literal relation —
    # no join against the corpus needed to densify the zero-hit rows
    grid = emb.sparkSession.createDataFrame(
        [(m, int(q)) for m in methods for q in SIM_QUERY_IDS],
        "method STRING, query_id BIGINT",
    )
    out = grid.join(hits, ["method", "query_id"], "left").select(
        "method",
        "query_id",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
        F.round(
            F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(SIM_K)), 6
        ).alias("recall"),
    )
    emb.unpersist()  # all build collects done; the search plan is lazy
    return out


def q_text_ngram_freq(spark, sf_dir):
    from hadoop_tfidf_spark.functions.text import ngram_freq

    return ngram_freq(_docs(spark, sf_dir), n=2, top=100)


def q_dedup_cluster_sizes(spark, sf_dir):
    """Near-dup cluster-size distribution: per cluster size (1 =
    singleton, no near-dup), how many clusters and how many docs — the
    dedup AUDIT chart (how much of the corpus is boilerplate clusters?
    did this crawl's dup rate drift?). Two label-keyed aggregations over
    the 1-hop canonicalization — both shuffles are cluster-sized, and
    the output is histogram-sized regardless of corpus scale."""
    docs = _docs(spark, sf_dir, rebalance=True)
    canon = D.near_dup_canonical(docs, D.minhash_lsh_dedup(docs))
    sizes = canon.groupBy("canonical_id").agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count("*").cast("bigint").alias("n_clusters"),
        F.sum("cluster_size").cast("bigint").alias("n_docs"),
    )


def q_dedup_near_canonical(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return D.near_dup_canonical(docs, D.minhash_lsh_dedup(docs))


def q_dedup_components(spark, sf_dir):
    """Fixpoint canonicalization (connected components over LSH candidate
    pairs) — survivor-valid representatives, unlike the 1-hop star."""
    docs = _docs(spark, sf_dir)
    return D.near_dup_components(docs, D.minhash_lsh_dedup(docs))


def q_rel_grouping_sets(spark, sf_dir):
    return R.segment_region_grouping_sets(
        _tbl(spark, sf_dir, "customer"),
        _tbl(spark, sf_dir, "nation"),
        _tbl(spark, sf_dir, "region"),
    )


def q_rel_order_gaps(spark, sf_dir):
    return R.order_gaps(_tbl(spark, sf_dir, "orders"))


def q_rel_acctbal_ntiles(spark, sf_dir):
    return R.acctbal_ntiles(
        _tbl(spark, sf_dir, "customer"), _tbl(spark, sf_dir, "nation")
    )


def q_rel_percentiles(spark, sf_dir):
    return R.price_percentiles(_tbl(spark, sf_dir, "lineitem"))


def q_events_hopping(spark, sf_dir):
    return R.events_hopping(load_events(spark, sf_dir))


def q_rel_parts_with_shipments(spark, sf_dir):
    return R.parts_with_shipments(
        _tbl(spark, sf_dir, "part"), _tbl(spark, sf_dir, "lineitem"), 1995
    )


#: As-of tolerance: purchases older than this (µs) don't carry forward.
ASOF_TOLERANCE_US = 30 * 24 * 3600 * 1_000_000


def q_asof_last_purchase_30d(spark, sf_dir):
    """Tolerance-bounded as-of join: the matched purchase value is kept
    only when it is at most 30 days old at event time (the standard
    tolerance/staleness knob of time-series as-of joins). The match time
    rides along as a second as-of value column; the tolerance is a
    post-join projection, so the join dataflow is identical to the
    unbounded variant."""
    from hadoop_tfidf_spark.operators.asof import asof_join

    ev = load_events(spark, sf_dir).withColumn("ts_us", F.expr("ts_ns div 1000"))
    left = ev.select("event_id", "user_id", "ts_us")
    right = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts_us").alias("pts"))
        .agg(F.max("value").alias("pval"))
    )
    out = asof_join(
        left, right, on="user_id", left_time="ts_us", right_time="pts",
        right_values=["pval", "pts"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_us",
        F.when(
            F.col("pts_asof") >= F.col("ts_us") - F.lit(ASOF_TOLERANCE_US),
            F.col("pval_asof"),
        ).alias("recent_purchase_value"),
    )


def q_streaming_incremental_df(spark, sf_dir):
    """Incremental TF-IDF document-frequency stats maintained by
    foreachBatch micro-batch upserts over a 4-file document stream — the
    final stats table must hash-match the BATCH document-frequency oracle
    (the whole point of the incremental path: same answer, maintained
    incrementally). Exercises generation-commit atomicity, batch-id
    idempotence, and the upsert merge end-to-end."""
    from hadoop_tfidf_spark.streaming.incremental import IncrementalTfidfStats
    from hadoop_tfidf_spark.streaming.windows import staging_dir

    base = staging_dir("spark_graft_incdf_")
    docs = load_docs(spark, f"{sf_dir}/documents.parquet")
    docs.repartition(4).write.mode("overwrite").parquet(f"{base}/docs")
    stream = (
        spark.readStream.schema(spark.read.parquet(f"{base}/docs").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/docs")
    )
    stats = IncrementalTfidfStats(spark, f"{base}/stats")
    stats.attach(stream).awaitTermination()
    return stats.df_table()


def q_streaming_search(spark, sf_dir):
    """DQ5 search scores computed from the INCREMENTALLY-maintained stats:
    the document stream is drained into ``IncrementalTfidfStats`` (4-file
    micro-batch sequence), idf then comes from the maintained
    ``(word, df)`` + ``num_docs`` state while tf comes from the batch
    (word, doc, n) relation — and the result must hash-match the plain
    batch ``search`` oracle. This closes the loop between the streaming
    stats machinery and the reference's actual query surface (Search.java):
    same answer whether the corpus arrived at rest or as a stream."""
    from hadoop_tfidf_spark.corpus import SPACE_TOKEN_PATTERN, tokenize
    from hadoop_tfidf_spark.declared import SEARCH_QUERIES
    from hadoop_tfidf_spark.search import query_term_bag, search
    from hadoop_tfidf_spark.streaming.incremental import IncrementalTfidfStats
    from hadoop_tfidf_spark.streaming.windows import staging_dir
    from hadoop_tfidf_spark.tfidf import doc_word_count

    base = staging_dir("spark_graft_incsearch_")
    docs = load_docs(spark, f"{sf_dir}/documents.parquet")
    docs.repartition(4).write.mode("overwrite").parquet(f"{base}/docs")
    stream = (
        spark.readStream.schema(spark.read.parquet(f"{base}/docs").schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{base}/docs")
    )
    stats = IncrementalTfidfStats(spark, f"{base}/stats")
    stats.attach(stream).awaitTermination()

    # tf from the corpus, idf from the maintained stats — the exact batch
    # arithmetic (log-tf × integer-division idf), so the rounded product
    # is bit-identical to _tfidf_rounded's
    dwc = doc_word_count(tokenize(docs, SPACE_TOKEN_PATTERN))
    tf = dwc.withColumn("tf", F.lit(1.0) + F.log10("n"))
    tfidf_rel = tf.join(stats.idf(), "word").select(
        "word", "doc_id", F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf")
    )
    bag = query_term_bag(spark, SEARCH_QUERIES)
    scored = search(tfidf_rel, bag)
    return scored.select(
        "query_id", "doc_id", F.round("score", 6).alias("score")
    )


def q_streaming_tumbling(spark, sf_dir):
    """Structured Streaming tumbling-window aggregation under the STRONG
    gate: the stream is drained with the availableNow trigger in *complete*
    output mode, so the final sink table is the full aggregation — which
    must hash-match the same DuckDB group-by the batch twin
    (``events_tumbling``) is checked against. Complete mode (not append)
    because append only emits watermark-closed windows: rows still open at
    drain time are withheld, making the output depend on file arrival order
    — correct streaming semantics, but not a deterministic gate relation
    (the append path stays covered by tests/test_streaming.py). Value sums
    ride as integer micro-units (`exact_sums`) so micro-batch merge order
    can't flip a float's last rounded digit."""
    import uuid

    from hadoop_tfidf_spark.streaming.windows import (
        read_event_stream,
        run_to_completion,
        staged_source,
        windowed_event_counts,
    )

    path = staged_source(
        ("events", sf_dir, "default"),
        lambda p: load_events(spark, sf_dir)
        .drop("ts_ns")
        .write.mode("overwrite")
        .parquet(p),
        prefix="spark_graft_stream_",
    )
    stream = read_event_stream(spark, path, max_files_per_trigger=4)
    name = f"stream_{uuid.uuid4().hex[:8]}"
    sink = run_to_completion(
        windowed_event_counts(stream, exact_sums=True), name, output_mode="complete"
    )
    return sink.select(
        F.expr("unix_timestamp(window_start) div 3600").alias("epoch_hour"),
        "event_type",
        "n_events",
        "total_value_us",
    )


def q_events_time_rollup(spark, sf_dir):
    return R.events_time_rollup(load_events(spark, sf_dir))


def q_streaming_stateful_totals(spark, sf_dir):
    """applyInPandasWithState running totals under the STRONG gate: the
    stateful operator emits updated (n_events, total_value) per user per
    micro-batch; n_events strictly increases, so the max_by(n_events) row
    per user is the final state — which must hash-match the plain batch
    aggregation oracle. Proves custom state survives and composes across
    micro-batches, not just that rows came out."""
    import uuid

    from hadoop_tfidf_spark.streaming.stateful import running_user_totals
    from hadoop_tfidf_spark.streaming.windows import (
        read_event_stream,
        run_to_completion,
        staged_source,
    )

    path = staged_source(
        ("events", sf_dir, "default"),
        lambda p: load_events(spark, sf_dir)
        .drop("ts_ns")
        .write.mode("overwrite")
        .parquet(p),
        prefix="spark_graft_stream_",
    )
    stream = read_event_stream(spark, path, max_files_per_trigger=4)
    name = f"stream_{uuid.uuid4().hex[:8]}"
    updates = run_to_completion(
        running_user_totals(stream), name, output_mode="update"
    )
    # round(4): per-user sums reach ~5e4 and the two engines accumulate in
    # different orders — 4 decimals puts the rounding boundary ~7 orders of
    # magnitude above the float error instead of ~1
    return updates.groupBy("user_id").agg(
        F.max("n_events").cast("bigint").alias("n_events"),
        F.round(F.max_by("total_value", "n_events"), 4).alias("total_value"),
    )


def q_text_hash_sample(spark, sf_dir):
    """Deterministic 10% corpus sample + 90/5/5 split labels — membership
    is a pure function of doc_id (md5-bucketed), so it is reproducible in
    the oracle, across engines, and across incremental ingests."""
    from hadoop_tfidf_spark.operators.sampling import hash_bucket_col, hash_split

    docs = _docs(spark, sf_dir)
    labeled = hash_split(docs, "doc_id", {"train": 90, "valid": 5, "test": 5})
    return labeled.withColumn(
        "bucket", hash_bucket_col(F.col("doc_id")).cast("bigint")
    ).where(F.col("bucket") < 10).select("doc_id", "bucket", "split")


def q_streaming_incremental_dedup(spark, sf_dir):
    """Incremental MinHash-LSH near-dup index maintained by foreachBatch
    over a 4-file document stream — the accumulated candidate pairs must
    hash-match the ONE-SHOT batch LSH oracle (the equivalence guarantee:
    cross-batch pairs surface via the new-vs-old index join, same-batch
    pairs via the self-join)."""
    from hadoop_tfidf_spark.streaming.dedup import IncrementalLshIndex
    from hadoop_tfidf_spark.streaming.windows import staging_dir

    base = staging_dir("spark_graft_incdedup_")
    docs = load_docs(spark, f"{sf_dir}/documents.parquet")
    docs.repartition(4).write.mode("overwrite").parquet(f"{base}/docs")
    stream = (
        spark.readStream.schema(spark.read.parquet(f"{base}/docs").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/docs")
    )
    idx = IncrementalLshIndex(spark, f"{base}/idx")
    idx.attach(stream).awaitTermination()
    return idx.candidate_pairs()


def q_doc_frequency_salted(spark, sf_dir):
    """Document frequency via the two-phase SALTED aggregation — the skew
    path (operators/skew.salted_agg) under the strong oracle gate: a hot
    word spreads over 32 salt buckets in phase 1, phase 2 merges partials;
    the result must hash-match the plain doc_frequency oracle (salting is
    value-preserving)."""
    from hadoop_tfidf_spark.corpus import SPACE_TOKEN_PATTERN, tokenize
    from hadoop_tfidf_spark.operators.skew import salted_agg
    from hadoop_tfidf_spark.tfidf import doc_word_count

    dwc = doc_word_count(tokenize(_docs(spark, sf_dir), SPACE_TOKEN_PATTERN))
    return salted_agg(dwc, "word", F.count(F.lit(1)), "df", merge="sum")


def q_sql_tfidf_top100(spark, sf_dir):
    """The engine's SQL surface under the driver gate: the global top-100
    TF-IDF scores expressed as ``spark.sql`` text over the registered lazy
    views (sql.register_views) — the view re-plans per query, so Catalyst
    still prunes/pushes inside the derived relations."""
    from hadoop_tfidf_spark.sql import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT word, doc_id, round(tfidf, 6) AS tfidf
        FROM tfidf
        ORDER BY round(tfidf, 6) DESC, word, doc_id
        LIMIT 100
    """)


def q_streaming_session(spark, sf_dir):
    """Structured Streaming native session windows under the STRONG gate:
    complete-mode drain (all sessions, none watermark-withheld) + integer
    micro-unit sums, hash-matched against a gaps-and-islands SQL oracle
    written to session_window's exact boundary semantics (split at gap
    >= threshold; the batch twin ``events_sessionize`` keeps > — see
    streaming/windows.py). The append-mode path stays covered by
    tests/test_streaming.py."""
    import uuid

    from hadoop_tfidf_spark.streaming.windows import (
        read_event_stream,
        run_to_completion,
        session_windows,
        staged_source,
    )

    path = staged_source(
        ("events", sf_dir, "default"),
        lambda p: load_events(spark, sf_dir)
        .drop("ts_ns")
        .write.mode("overwrite")
        .parquet(p),
        prefix="spark_graft_stream_",
    )
    stream = read_event_stream(spark, path, max_files_per_trigger=4)
    name = f"stream_{uuid.uuid4().hex[:8]}"
    sink = run_to_completion(
        session_windows(stream, exact_sums=True), name, output_mode="complete"
    )
    return sink.select(
        F.unix_timestamp("session_start").alias("session_start_s"),
        "user_id",
        "n_events",
        "total_value_us",
    )


def q_rel_market_share(spark, sf_dir):
    return R.nation_market_share(
        _tbl(spark, sf_dir, "orders"),
        _tbl(spark, sf_dir, "customer"),
        _tbl(spark, sf_dir, "nation"),
        _tbl(spark, sf_dir, "region"),
    )


def q_rel_status_priority(spark, sf_dir):
    return R.status_priority_mix(
        _tbl(spark, sf_dir, "lineitem"), _tbl(spark, sf_dir, "orders")
    )


def q_rel_returned_top(spark, sf_dir):
    return R.returned_item_customers(
        _tbl(spark, sf_dir, "customer"),
        _tbl(spark, sf_dir, "orders"),
        _tbl(spark, sf_dir, "lineitem"),
        _tbl(spark, sf_dir, "nation"),
    )


def q_events_range_frame(spark, sf_dir):
    return R.events_range_frame(load_events(spark, sf_dir))


def q_events_user_extremes(spark, sf_dir):
    return R.user_event_extremes(load_events(spark, sf_dir))


def q_rel_orders_above_avg(spark, sf_dir):
    return R.orders_above_customer_avg(_tbl(spark, sf_dir, "orders"))


def q_asof_next_event(spark, sf_dir):
    """FORWARD as-of join: each order gets the customer's next event
    at-or-after the order date (first touch after purchase decision) —
    the direction="forward" path of operators/asof.asof_join. Oracle =
    a min()-over-join SQL formulation (DuckDB ASOF is backward-only), an
    independent implementation of the same semantics."""
    from hadoop_tfidf_spark.operators.asof import asof_join

    ev = load_events(spark, sf_dir).withColumn("ts_us", F.expr("ts_ns div 1000"))
    orders = _tbl(spark, sf_dir, "orders")
    # Tz-free date→epoch-µs (days × 86400e6): a cast-to-timestamp would
    # bake the session zone into the as-of comparison point.
    left = orders.select(
        "o_orderkey",
        F.col("o_custkey").alias("user_id"),
        (
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("long")
            * F.lit(86_400_000_000)
        ).alias("ots_us"),
    )
    # unique per (user, ts): earliest event_id wins a same-µs tie
    right = ev.groupBy("user_id", F.col("ts_us").alias("ets_us")).agg(
        F.min("event_id").alias("next_event_id")
    )
    out = asof_join(
        left, right, on="user_id", left_time="ots_us", right_time="ets_us",
        right_values=["next_event_id"], direction="forward",
    )
    return out.select(
        "o_orderkey",
        "user_id",
        F.col("next_event_id_asof").cast("bigint").alias("next_event_id"),
    )


def q_text_cooccurrence(spark, sf_dir):
    from hadoop_tfidf_spark.functions.text import cooccurrence

    return cooccurrence(_docs(spark, sf_dir), top=100)


#: Gate/bench value for the cooccurrence per-doc vocab cap. Production runs
#: cap in the thousands (guard only the 50k-distinct-token outlier page,
#: whose single-key join group AQE cannot split); the synthetic corpus maxes
#: out at 31 distinct tokens per doc, so 25 is a value that *engages* the
#: valve here — it truncates 239 of 500 docs at sf0.01, giving the capped
#: dataflow (slice-before-explode) a real correctness row and bench signal
#: rather than a vacuous pass-through (same argument as
#: :data:`GATE_LSH_BUCKET_CAP`).
GATE_COOC_VOCAB_CAP = 25


def q_text_cooccurrence_capped(spark, sf_dir):
    """Co-occurrence with the ``max_doc_vocab`` 100 TB safety valve
    ENGAGED: each doc keeps only its first :data:`GATE_COOC_VOCAB_CAP`
    distinct tokens in document order before pairing — deterministic
    truncation the oracle replays via first-occurrence rank."""
    from hadoop_tfidf_spark.functions.text import cooccurrence

    return cooccurrence(
        _docs(spark, sf_dir), top=100, max_doc_vocab=GATE_COOC_VOCAB_CAP
    )


def q_events_interval_join(spark, sf_dir):
    return R.click_purchase_interval_join(load_events(spark, sf_dir))


def q_streaming_interval_join(spark, sf_dir):
    """Stream-stream interval join under the STRONG gate: the emitted
    pair set must hash-match the batch twin's oracle
    (``events_interval_join`` — identical whole-second band semantics by
    construction since round 5). Inner-join pairs are emitted exactly
    once as both sides arrive; the drain input is ONE sorted file
    (``coalesce(1)``) so availableNow sees a single deterministic batch —
    ``orderBy`` alone only range-partitions file *contents*, and the file
    source orders multiple files by modification time, so parallel task
    commit order could hand the watermark a late range first and evict a
    row whose partner is still pending (the role Kafka's per-partition
    time order plays in production)."""
    import uuid

    from hadoop_tfidf_spark.streaming.joins import click_purchase_stream_join
    from hadoop_tfidf_spark.streaming.windows import (
        read_event_stream,
        run_to_completion,
        staged_source,
    )

    path = staged_source(
        ("events", sf_dir, "ordered1"),
        lambda p: load_events(spark, sf_dir)
        .drop("ts_ns")
        .orderBy("ts")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(p),
        prefix="spark_graft_stream_",
    )
    stream = read_event_stream(spark, path, max_files_per_trigger=4)
    name = f"stream_{uuid.uuid4().hex[:8]}"
    return run_to_completion(
        click_purchase_stream_join(stream), name, output_mode="append"
    )


def q_doc_similarity_tfidf(spark, sf_dir):
    """Doc-to-doc cosine in TF-IDF space (top-100 pairs) — the reflexive
    extension of the reference's query scoring (Search.java:210–252 applied
    doc-vs-doc instead of query-vs-doc)."""
    from hadoop_tfidf_spark.declared import _tfidf_rounded
    from hadoop_tfidf_spark.search import doc_similarity

    return doc_similarity(_tfidf_rounded(spark, sf_dir), k=100)


def q_text_contamination(spark, sf_dir):
    """Benchmark-decontamination scan: shingle overlap of candidate docs
    (doc_id % 10 != 0) against the held-out benchmark slice
    (doc_id % 10 == 0)."""
    from hadoop_tfidf_spark.functions.text import contamination_check

    docs = _docs(spark, sf_dir)
    return contamination_check(
        docs.where(F.col("doc_id") % 10 != 0),
        docs.where(F.col("doc_id") % 10 == 0),
        k=3,
    )


def q_text_chunk(spark, sf_dir):
    """Fixed-size token chunking (context-window prep), 32-token
    non-overlapping windows."""
    from hadoop_tfidf_spark.functions.text import chunk_tokens

    return chunk_tokens(_docs(spark, sf_dir), chunk_size=32)


def q_text_repetition(spark, sf_dir):
    """Gopher-style repetition statistics (duplicate word / duplicate
    3-gram ratios) — the boilerplate filter of a pretraining pipeline,
    zero-shuffle scan-stage expressions."""
    from hadoop_tfidf_spark.functions.text import repetition_score

    return repetition_score(_docs(spark, sf_dir))


def q_text_pii_redact(spark, sf_dir):
    """PII scrub over the corpus (emails/phones → tags + match counts;
    clean-text fingerprint is the hash-checked value)."""
    from hadoop_tfidf_spark.functions.text import redact_pii

    return redact_pii(_docs(spark, sf_dir))


def q_streaming_c4_filter(spark, sf_dir):
    """Stateless STREAMING curation: the C4 rule gate applied to a
    4-file document stream (one micro-batch per file) and drained with
    the availableNow trigger in append mode. A stateless projection has
    no watermark or state to withhold rows — every doc is emitted exactly
    once regardless of file pickup order — so the drained sink must
    hash-match the BATCH filter oracle verbatim: the same curation
    verdicts whether the corpus arrives at rest or as a stream."""
    import uuid

    from hadoop_tfidf_spark.functions.text import c4_quality_filters
    from hadoop_tfidf_spark.streaming.windows import (
        run_to_completion,
        staged_source,
    )

    docs = load_docs(spark, f"{sf_dir}/documents.parquet")
    base = staged_source(
        ("documents", sf_dir, "docs4"),
        lambda p: docs.repartition(4).write.mode("overwrite").parquet(p),
        prefix="spark_graft_c4stream_",
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(base).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    out = run_to_completion(
        c4_quality_filters(stream),
        f"c4_{uuid.uuid4().hex[:8]}",
        output_mode="append",
    )
    return out.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "word_dup_ratio",
        "stop_ratio",
        *[
            F.col(c).cast("int").alias(c)
            for c in ("pass_len", "pass_word_len", "pass_dup", "pass_stop", "keep")
        ],
    )


def q_streaming_decontaminate(spark, sf_dir):
    """STREAMING decontamination under the strong gate: candidate docs
    (doc_id % 10 != 0) arrive as a 4-file stream; each micro-batch
    builds its docs' distinct 3-gram shingles ROW-LOCALLY (array
    expression — stateless, no dropDuplicates state), stream-static
    LEFT-SEMI joins them against the static benchmark shingle set
    (doc_id % 10 == 0), and a doc_id-keyed streaming aggregation
    accumulates hit counts (complete mode — state is one row per doc
    with ≥ 1 hit). The drained stats drive the same rounded-ratio > 0.1
    drop rule as the batch apply, so the kept corpus must hash-match the
    ``text_decontaminate`` oracle verbatim: the same decontamination
    verdicts whether the corpus arrives at rest or as a stream. At scale
    the static side is a shuffled semi-join (benchmark shingle sets are
    millions of rows — Spark plans broadcast only when it fits)."""
    import uuid

    from hadoop_tfidf_spark.streaming.windows import (
        run_to_completion,
        staged_source,
    )

    docs = load_docs(spark, f"{sf_dir}/documents.parquet")
    cand = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    bench_sh = (
        D.shingles(bench, k=3).select("shingle").distinct()
    )
    base = staged_source(
        ("documents", sf_dir, "cand4"),
        lambda p: cand.repartition(4).write.mode("overwrite").parquet(p),
        prefix="spark_graft_deconstream_",
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(base).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    words = F.split(F.col("text"), " ")
    staged = stream.where(F.size(words) >= 3).select(
        "doc_id", words.alias("_w")
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("_w") - F.lit(2)),
        lambda i: F.array_join(F.slice(F.col("_w"), i, 3), " "),
    )
    exploded = staged.select(
        "doc_id", F.array_distinct(grams).alias("_sh")
    ).select(
        "doc_id", F.size("_sh").alias("n_shingles"), F.explode("_sh").alias("shingle")
    )
    hit_stats = (
        exploded.join(bench_sh, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_hits"),
            F.max("n_shingles").alias("n_shingles"),
        )
    )
    stats = run_to_completion(
        hit_stats, f"decon_{uuid.uuid4().hex[:8]}", output_mode="complete"
    )
    dropped = stats.where(
        F.round(F.col("n_hits") / F.col("n_shingles"), 6) > 0.1
    ).select("doc_id")
    return cand.join(dropped, "doc_id", "left_anti").select("doc_id", "text")


def q_dedup_span_exact(spark, sf_dir):
    """Span-granularity exact dedup (Lee et al. 2022 exact-substring
    style): 5-word spans occurring verbatim in ≥ 2 documents are removed
    and each doc reassembled — row-local span construction, one
    md5-keyed count aggregation, one anti-join. Non-vacuous at sf0.01
    (~226 cross-doc duplicate spans)."""
    return D.span_dedup(_docs(spark, sf_dir), span_words=5)


def q_sim_topk_ivfpq_res(spark, sf_dir):
    """RESIDUAL IVFADC (Jégou §IV proper): PQ codes encode each vector's
    integer residual from its coarse centroid, and ADC tables are built
    per (query, probed cell) from the query's residual wrt that cell —
    tighter distances for the same 8 bytes/vector. Every step exact
    BIGINT, oracle replays coarse Lloyd + residual projection +
    per-subspace Lloyd + per-cell ADC unrolled."""
    from pyspark.storagelevel import StorageLevel

    emb = _emb(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    assigned, cents, codes, books = S.ivfpq_build_residual(
        emb, coarse_k=IVF_K, coarse_iters=IVF_ITERS,
        m=PQ_M, k=PQ_K, iters=PQ_ITERS, units=IVF_UNITS, pack=True,
    )
    out = S.ivfpq_topk(
        assigned, cents, codes, books, SIM_QUERY_IDS,
        k=SIM_K, nprobe=IVF_NPROBE, units=IVF_UNITS,
        embeddings=emb, residual=True,
    )
    emb.unpersist()  # build collects done — see q_sim_topk_ivfpq
    return out


#: ADC candidate budget for the bulk compressed kNN-graph row: stage 1
#: keeps this many per query by 8-byte ADC distance; stage 2 re-ranks
#: only these exactly. 3× the final k — the budget a recall audit would
#: size (sim_rp_recall's dashboard pattern).
IVFPQ_BULK_CAND = 30


def q_sim_topk_ivfpq_bulk(spark, sf_dir):
    """Round 14 — the bulk kNN-graph job over the COMPRESSED index
    (similarity.ivfpq_bulk_topk): every corpus vector is a query, like
    ``sim_topk_ivf_bulk``, but stage 1 ranks candidates by the
    residual-IVFADC 8-byte ADC distance (executor-side probe selection
    and per-(query, cell) ADC tables as DataFrame expressions — zero
    query-side collect, census-pinned) and stage 2 re-ranks ONLY each
    query's :data:`IVFPQ_BULK_CAND` survivors by exact full-dimension
    integer L2. This is the shape a 100 TB semantic-clustering run
    prices: full-precision work per query drops from every probed-cell
    member (the plain-IVF bulk row's honest cost) to the candidate
    budget. All-integer both stages; the oracle replays build + probe +
    ADC cut + exact re-rank unrolled."""
    from pyspark.storagelevel import StorageLevel

    emb = _emb(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    assigned, cents, codes, books = S.ivfpq_build_residual(
        emb, coarse_k=IVF_K, coarse_iters=IVF_ITERS,
        m=PQ_M, k=PQ_K, iters=PQ_ITERS, units=IVF_UNITS, pack=True,
    )
    out = S.ivfpq_bulk_topk(
        assigned, cents, codes, books, emb,
        k=SIM_K, candidates=IVFPQ_BULK_CAND, nprobe=IVF_NPROBE,
        units=IVF_UNITS,
    )
    emb.unpersist()  # build collects done — see q_sim_topk_ivfpq
    return out


def q_sim_recall_audit(spark, sf_dir):
    """ANN recall telemetry — the dashboard number a production ANN
    index ships with (semantics source: tests/test_round7_ops.py
    ``test_ivfpq_recall_vs_brute``): per query, recall@k of the
    residual-IVFADC result set vs the exact brute-force cosine top-k,
    plus the exact integer ADC-vs-true-L2 distance sums and their
    ratio. ``n_hits``/``recall_pct`` answer "did the probe budget find
    the true neighbors"; ``adc_exact_ratio`` answers "how tight is the
    8-byte code's distance estimate" — the two knobs (nprobe, PQ bits)
    a 100 TB deployment tunes. All join sides here are tiny (k rows per
    query); the heavy lifting is the index build + one probe pass +
    one brute pass, both already oracle-replayable, so the audit is
    hash-gated end-to-end (sums exact BIGINT; the one ratio is a
    deterministic round of a BIGINT/BIGINT double division)."""
    from pyspark.storagelevel import StorageLevel

    emb = _emb(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    assigned, cents, codes, books = S.ivfpq_build_residual(
        emb, coarse_k=IVF_K, coarse_iters=IVF_ITERS,
        m=PQ_M, k=PQ_K, iters=PQ_ITERS, units=IVF_UNITS, pack=True,
    )
    approx = S.ivfpq_topk(
        assigned, cents, codes, books, SIM_QUERY_IDS,
        k=SIM_K, nprobe=IVF_NPROBE, units=IVF_UNITS,
        embeddings=emb, residual=True,
    )
    queries = emb.where(F.col("vec_id").isin(SIM_QUERY_IDS))
    brute = S.brute_force_topk(emb, queries, k=SIM_K).select(
        "query_id", "vec_id", F.lit(1).alias("hit")
    )
    u = S.quantized_units(F.col("embedding"), IVF_UNITS)
    qu = (
        emb.where(F.col("vec_id").isin(SIM_QUERY_IDS))
        .select(F.col("vec_id").alias("query_id"), u.alias("_qu"))
    )
    vu = emb.select("vec_id", u.alias("_vu"))
    exact_d2 = F.aggregate(
        F.zip_with("_qu", "_vu", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    joined = (
        approx.join(F.broadcast(qu), "query_id")
        .join(vu, "vec_id")
        .join(F.broadcast(brute), ["query_id", "vec_id"], "left")
        .select(
            "query_id",
            "adc_d2",
            exact_d2.alias("_exact_d2"),
            F.coalesce(F.col("hit"), F.lit(0)).alias("_hit"),
        )
    )
    per_q = joined.groupBy("query_id").agg(
        F.count("*").cast("bigint").alias("n_returned"),
        F.sum("_hit").cast("bigint").alias("n_hits"),
        F.sum("adc_d2").cast("bigint").alias("sum_adc_d2"),
        F.sum("_exact_d2").cast("bigint").alias("sum_exact_d2"),
    )
    out = per_q.select(
        "query_id",
        "n_returned",
        "n_hits",
        F.expr(f"CAST((100 * n_hits) DIV {SIM_K} AS BIGINT)").alias(
            "recall_pct"
        ),
        "sum_adc_d2",
        "sum_exact_d2",
        F.when(F.col("sum_exact_d2") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("sum_adc_d2").cast("double") / F.col("sum_exact_d2"), 6
            )
        )
        .alias("adc_exact_ratio"),
    )
    emb.unpersist()  # build collects done — see q_sim_topk_ivfpq
    return out


#: The nprobe operating points the recall curve sweeps (of IVF_K cells).
RECALL_CURVE_NPROBES = (1, 2, 4)

# ---- clustered recall-curve fixture -------------------------------------
# The gate's raw synthetic embeddings are ROTATIONALLY RANDOM — distance
# concentration makes every nprobe return the same set, so the curve is
# flat by construction (see r8 sim_recall_curve docstring). To let the
# GATE row demonstrate the rising curve the chart exists to show, the
# curve query runs on a deterministic CLUSTERED derivation of the same
# table: each vector is snapped to one of IVF_K=16 bit-sign cluster
# centers (cluster = vec_id % 16, center[d] = ±AMP by bit (d mod 4) of
# the cluster id) with the original embedding as jitter, and three
# STRADDLING queries sit at (0.501·A + 0.499·B) midpoints of one-bit-
# apart center pairs — their exact top-10 provably mixes both clusters
# (7:3-ish at sf0.01), so nprobe=1 structurally cannot reach full
# recall and nprobe=2 must improve it. Every constant below is shared
# verbatim with the DuckDB replay; the derivation is one float64 add
# per component on both engines, so the hash gate holds end-to-end.
RECALL_CLUSTER_C = 16  # == IVF_K: seeds 0..15 land one per cluster
RECALL_CLUSTER_AMP = 4.0
RECALL_STRADDLE_PAIRS = ((0, 1), (2, 6), (5, 13))  # one-bit-apart pairs
RECALL_STRADDLE_IDS = (9000, 9001, 9002)
RECALL_NUDGE = 0.501
EMB_DIM = 64
#: Fixture corpus size: 5 members per cluster (vec_id < 80). Sized so a
#: straddling query's exact top-10 is EXACTLY the two straddled cells'
#: members — recall then measures cell COVERAGE (the thing nprobe buys),
#: not fine ADC ordering: with ~31 members/cell (the full sf0.01 table)
#: the within-cell ADC ranks are jitter-scale and PQ quantization noise
#: swamps them, which flattened the first clustered cut of this fixture
#: at 20-40% for every nprobe.
RECALL_FIXTURE_ROWS = 80


def _cluster_center(c: int) -> list[float]:
    return [
        RECALL_CLUSTER_AMP if (c >> (d % 4)) & 1 else -RECALL_CLUSTER_AMP
        for d in range(EMB_DIM)
    ]


def _straddle_queries() -> list[tuple[int, list[float]]]:
    """The straddling query rows as pure float64 constants (computed
    once here, fed verbatim to BOTH engines — Spark as literal data,
    DuckDB via repr round-trip, which is exact for float64)."""
    rows = []
    for qid, (a, b) in zip(RECALL_STRADDLE_IDS, RECALL_STRADDLE_PAIRS):
        ca, cb = _cluster_center(a), _cluster_center(b)
        rows.append(
            (
                qid,
                [
                    RECALL_NUDGE * x + (1.0 - RECALL_NUDGE) * y
                    for x, y in zip(ca, cb)
                ],
            )
        )
    return rows


def _clustered_emb(spark, sf_dir):
    """Spark side of the clustered fixture: snap every embedding to its
    ``vec_id % 16`` cluster center (one float64 add per component,
    zero shuffle) and union the three literal straddling query rows."""
    emb = _emb(spark, sf_dir)
    c = F.col("vec_id") % RECALL_CLUSTER_C

    def shift(x, i):
        p = (
            F.when(i % 4 == 0, F.lit(1))
            .when(i % 4 == 1, F.lit(2))
            .when(i % 4 == 2, F.lit(4))
            .otherwise(F.lit(8))
        )
        bit = F.floor(c / p).cast("bigint") % 2
        return x + F.when(
            bit == 1, F.lit(RECALL_CLUSTER_AMP)
        ).otherwise(F.lit(-RECALL_CLUSTER_AMP))

    clustered = emb.where(F.col("vec_id") < RECALL_FIXTURE_ROWS).select(
        "vec_id",
        F.transform(F.col("embedding").cast("array<double>"), shift).alias(
            "embedding"
        ),
    )
    qrows = spark.createDataFrame(
        _straddle_queries(), "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    return clustered.unionByName(qrows)


def q_sim_recall_curve(spark, sf_dir):
    """Recall-vs-nprobe curve — the ANN tuning chart itself: ONE
    residual-IVFADC index, searched at each nprobe in
    :data:`RECALL_CURVE_NPROBES`, scored per query against the exact
    brute-force top-k. Recall must be non-decreasing in nprobe by
    construction (more probed cells ⊇ fewer); a production deployment
    reads the knee of this curve to pick its probe budget. The builds
    run once (persist released after the collects); each extra probe
    point costs only a (queries × nprobe)-row broadcast join + the ADC
    projection — exactly how cheap sweeping the knob is at 100 TB.
    All-integer, hash-gated: the oracle replays the full index three
    times at the three probe budgets (the Lloyd chains are
    deterministic, so the three replays share every centroid).

    Runs on the CLUSTERED fixture (:func:`_clustered_emb` — the raw
    random table snapped onto 16 bit-sign cluster centers plus three
    straddling midpoint queries) so the gate row demonstrates the
    rising curve the chart exists to show: on the raw table the curve
    is flat by construction (distance concentration — verified in r8:
    bit-identical result sets at nprobe 1/2/4/8, documented then as
    "more probes buy nothing here"), while on clustered data a
    straddling query's exact top-10 mixes two cells, so nprobe=1
    structurally cannot reach it and nprobe=2 must improve. The same
    rising behavior is unit-pinned by tests/test_round8_ops.py::
    test_recall_curve_rises_on_straddling_queries; production recall
    telemetry on the data as-it-is stays available via
    `sim_recall_audit`.
    """
    from pyspark.storagelevel import StorageLevel

    emb = _clustered_emb(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    assigned, cents, codes, books = S.ivfpq_build_residual(
        emb, coarse_k=IVF_K, coarse_iters=IVF_ITERS,
        m=PQ_M, k=PQ_K, iters=PQ_ITERS, units=IVF_UNITS, pack=True,
    )
    queries = emb.where(F.col("vec_id").isin(list(RECALL_STRADDLE_IDS)))
    brute = S.brute_force_topk(emb, queries, k=SIM_K).select(
        "query_id", "vec_id", F.lit(1).alias("hit")
    )
    parts = []
    for np_ in RECALL_CURVE_NPROBES:
        parts.append(
            S.ivfpq_topk(
                assigned, cents, codes, books, list(RECALL_STRADDLE_IDS),
                k=SIM_K, nprobe=np_, units=IVF_UNITS,
                embeddings=emb, residual=True,
            )
            .select("query_id", "vec_id")
            .withColumn("nprobe", F.lit(np_).cast("int"))
        )
    approx = parts[0]
    for p in parts[1:]:
        approx = approx.unionByName(p)
    out = (
        approx.join(F.broadcast(brute), ["query_id", "vec_id"], "left")
        .groupBy("nprobe", "query_id")
        .agg(
            F.count("*").cast("bigint").alias("n_returned"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_hits"),
        )
        .select(
            "nprobe",
            "query_id",
            "n_returned",
            "n_hits",
            F.expr(f"CAST((100 * n_hits) DIV {SIM_K} AS BIGINT)").alias(
                "recall_pct"
            ),
        )
    )
    emb.unpersist()  # build collects done — see q_sim_topk_ivfpq
    return out


def q_dedup_span_sliding(spark, sf_dir):
    """SLIDING-span exact dedup (Lee et al. arbitrary-boundary
    approximation): 5-word spans starting every 2 words; a word is
    removed iff covered by any span duplicated across ≥ 2 docs.
    Strictly more sensitive than the fixed tiling (catches passages that
    start mid-span); plan is still 2 row-local span passes + 1 md5-keyed
    count + 1 equi-join."""
    return D.span_dedup(_docs(spark, sf_dir), span_words=5, stride=2)


def q_text_c4_filters(spark, sf_dir):
    """C4/Gopher-style quality filter: per-rule measured values + 0/1
    verdict flags + the conjunctive keep bit (flags cast to INT for
    engine-portable hashing) — all zero-shuffle scan-stage expressions."""
    from hadoop_tfidf_spark.functions.text import c4_quality_filters

    out = c4_quality_filters(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "word_dup_ratio",
        "stop_ratio",
        *[
            F.col(c).cast("int").alias(c)
            for c in ("pass_len", "pass_word_len", "pass_dup", "pass_stop", "keep")
        ],
    )


def q_text_mixture_weights(spark, sf_dir):
    """Data-mixture accounting per (source, lang): token share of the
    corpus and the uniform-target resampling weight — the mixture
    reweighting step of a corpus recipe. One strata-keyed aggregation +
    a broadcast 1-row totals join; output is strata-sized."""
    from hadoop_tfidf_spark.operators.sampling import mixture_weights

    return mixture_weights(_tbl(spark, sf_dir, "documents"), ["source", "lang"])


#: Temperature + token budget for the mixture-sampling pair: τ=0.5
#: (the sqrt flattening multilingual-T5 popularized) and a budget small
#: enough that no stratum saturates at 100% on the gate data — the
#: rate computation stays non-trivially engaged.
MIX_TAU = 0.5
MIX_BUDGET_TOKENS = 10_000


def q_text_mixture_temperature(spark, sf_dir):
    """Temperature-scaled mixture plan per source: n^τ target shares
    and the integer per-stratum sampling rates that realize a
    10k-token budget — the τ-flattening recipe (Pile/Gopher/mT5)
    between mixture accounting and the materialized sample. BIGINT
    micro-unit pow quantization makes the share denominator an exact
    integer sum, so the row hashes cross-engine."""
    from hadoop_tfidf_spark.operators.sampling import temperature_rates

    return temperature_rates(
        _tbl(spark, sf_dir, "documents"),
        tau=MIX_TAU,
        budget_tokens=MIX_BUDGET_TOKENS,
    )


def q_text_mixture_sample(spark, sf_dir):
    """The MATERIALIZED temperature mixture: compute the per-source
    rates (strata-sized collect — the legitimate kind) and apply them
    as a content-addressed stratified hash sample in one scan —
    weights → rates → corpus, the full mixture path a pretraining
    recipe actually executes. Membership is a pure function of
    (doc_id, source counts), so the sample is reproducible on any
    engine and stable under re-ingest."""
    from hadoop_tfidf_spark.operators.sampling import (
        stratified_hash_sample,
        temperature_rates,
    )

    docs = _tbl(spark, sf_dir, "documents")
    rates = {
        r["source"]: int(r["rate_pct"])
        for r in temperature_rates(
            docs, tau=MIX_TAU, budget_tokens=MIX_BUDGET_TOKENS
        ).collect()
    }
    return stratified_hash_sample(docs, "doc_id", "source", rates).select(
        "doc_id", "source", "lang"
    )


def q_text_pack_sequences(spark, sf_dir):
    """Deterministic sequence packing into ~512-token training packs,
    sharded 8 ways by doc_id — concat-then-chunk GPT-style packing; all
    integer outputs, bit-stable on any engine/partitioning."""
    from hadoop_tfidf_spark.operators.sampling import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), budget=512, n_buckets=8)


def q_streaming_mixture_weights(spark, sf_dir):
    """STREAMING data-mixture monitoring under the strong gate: per
    (source, lang) doc/token counts accumulate over a 4-file document
    stream (one stateless-input aggregation, state = one row per
    stratum — strata-sized, never corpus-sized), drained with
    availableNow in complete mode; shares and uniform-target weights are
    derived from the drained totals exactly as the batch operator does,
    so the result must hash-match the ``text_mixture_weights`` oracle
    verbatim — the mixture dashboard shows the same numbers during
    ingest as at rest."""
    import uuid

    from hadoop_tfidf_spark.streaming.windows import (
        run_to_completion,
        staged_source,
    )

    docs = _tbl(spark, sf_dir, "documents")
    base = staged_source(
        ("documents", sf_dir, "full4"),
        lambda p: docs.repartition(4).write.mode("overwrite").parquet(p),
        prefix="spark_graft_mixstream_",
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    n_tokens = F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
    counts = stream.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(n_tokens).cast("bigint").alias("n_tokens"),
    )
    drained = run_to_completion(
        counts, f"mix_{uuid.uuid4().hex[:8]}", output_mode="complete"
    )
    totals = drained.agg(
        F.sum("n_tokens").cast("bigint").alias("_total_tokens"),
        F.count("*").cast("bigint").alias("_n_strata"),
    )
    return drained.crossJoin(F.broadcast(totals)).select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("_total_tokens"), 6).alias("token_share"),
        F.round(
            F.col("_total_tokens") / (F.col("_n_strata") * F.col("n_tokens")), 6
        ).alias("uniform_weight"),
    )


def q_streaming_source_stats(spark, sf_dir):
    """STREAMING per-source governance under the strong gate: the
    provenance dashboard maintained DURING ingest. Docs arrive as a
    4-file stream; two complete-mode aggregations accumulate (1) per
    (source, lang) doc/token counts — strata-sized state, the
    ``streaming_mixture_weights`` shape — and (2) per (source, word)
    presence for the distinct-vocabulary column — vocabulary-sized
    state, the ``streaming_incremental_df`` ledger class (at 100 TB the
    vocab ledger windows by arrival partition and merges downstream,
    same caveat as streaming DSIR). The drained relations finish with
    the identical batch arithmetic (sums, count-of-lang-rows, round 6,
    vocab join), so the result must hash-match the
    ``text_source_stats`` oracle verbatim: the governance numbers a
    curation pipeline reviews mid-crawl equal the numbers at rest."""
    import uuid

    from hadoop_tfidf_spark.streaming.windows import (
        run_to_completion,
        staged_source,
    )

    docs = _tbl(spark, sf_dir, "documents")
    base = staged_source(
        ("documents", sf_dir, "full4"),
        lambda p: docs.repartition(4).write.mode("overwrite").parquet(p),
        prefix="spark_graft_srcstream_",
    )

    def _stream():
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(base)
        )

    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    tag = uuid.uuid4().hex[:8]
    counts = run_to_completion(
        _stream()
        .groupBy("source", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.size(words)).cast("bigint").alias("n_tokens"),
        ),
        f"srcstats_{tag}",
        output_mode="complete",
    )
    vocab_rows = run_to_completion(
        _stream()
        .select("source", F.explode(words).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").alias("_n")),
        f"srcvocab_{tag}",
        output_mode="complete",
    )
    agg = counts.groupBy("source").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(F.sum("n_tokens") / F.sum("n_docs"), 6).alias("avg_tokens"),
        F.count("*").cast("bigint").alias("n_langs"),
    )
    vocab = vocab_rows.groupBy("source").agg(
        F.count("*").cast("bigint").alias("vocab")
    )
    return agg.join(F.broadcast(vocab), "source", "left").select(
        "source",
        "n_docs",
        "n_tokens",
        "avg_tokens",
        F.coalesce(F.col("vocab"), F.lit(0)).cast("bigint").alias("vocab"),
        "n_langs",
    )


def q_streaming_bq_index(spark, sf_dir):
    """STREAMING ANN index ingest under the strong gate: the
    binary-quantization pack is stateless and training-free (no vmax,
    no codebooks — the property the BQ docstring claims makes it
    compose with streaming ingest; this row PROVES it), so the packed
    index is maintained by a pure append-mode map over a 4-file
    embedding stream — zero aggregation state — and the drained rows
    must hash-match the one-shot batch :func:`similarity.bq_build`
    replay verbatim: the index built during ingest IS the index built
    at rest, bit for bit."""
    import uuid

    from hadoop_tfidf_spark.operators.similarity import bq_build
    from hadoop_tfidf_spark.streaming.windows import (
        run_to_completion,
        staged_source,
    )

    emb = _emb(spark, sf_dir)
    base = staged_source(
        ("embeddings", sf_dir, "full4"),
        lambda p: emb.repartition(4).write.mode("overwrite").parquet(p),
        prefix="spark_graft_bqstream_",
    )
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    packed = bq_build(stream, units=IVF_UNITS, in_dim=64)
    drained = run_to_completion(
        packed, f"bqidx_{uuid.uuid4().hex[:8]}", output_mode="append"
    )
    return drained.select(
        "vec_id",
        F.col("_bq").getItem(0).alias("bq_w0"),
        F.col("_bq").getItem(1).alias("bq_w1"),
    )


def q_streaming_phash_dedup(spark, sf_dir):
    """STREAMING perceptual image dedup under the strong gate: docs
    arrive as a 4-file stream, each micro-batch synthesizes payloads
    and average-hashes frame 0 ROW-LOCALLY (both Arrow ``mapInPandas``
    stages are stateless, so they apply unchanged to a streaming
    relation), and a phash-keyed streaming aggregation accumulates the
    perceptual-dup ledger — group size + surviving (min) doc id — in
    complete mode (state is one row per distinct hash, 72 at sf0.01).
    The drained ledger must hash-match the one-shot batch groups from
    the analytic oracle: the same dedup verdicts during ingest as at
    rest, the image-modality twin of ``streaming_incremental_dedup``.
    Registered past-cap this round (the window is full of mandated
    entries); round-10 rotation priority with ``sim_pca_topk``."""
    import uuid

    from hadoop_tfidf_spark.operators.multimodal import (
        media_phash,
        with_binary_payload,
    )
    from hadoop_tfidf_spark.streaming.windows import (
        run_to_completion,
        staged_source,
    )

    docs = _tbl(spark, sf_dir, "documents")
    base = staged_source(
        ("documents", sf_dir, "full4"),
        lambda p: docs.repartition(4).write.mode("overwrite").parquet(p),
        prefix="spark_graft_phashstream_",
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    groups = (
        media_phash(with_binary_payload(stream.select("doc_id", "text")))
        .groupBy("phash")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
        )
    )
    return run_to_completion(
        groups, f"phash_{uuid.uuid4().hex[:8]}", output_mode="complete"
    )


def q_streaming_dsir(spark, sf_dir):
    """STREAMING data selection under the strong gate: the DSIR ratio
    table trains once from the static corpus (the shippable
    ``n_buckets``-row model), then candidate docs arrive as a 4-file
    stream and each micro-batch scores ROW-LOCALLY (staged-array
    bigrams -> md5 bucket, stateless) through a stream-static broadcast
    join against the ratios; a doc_id-keyed streaming aggregation
    accumulates exact integer feature sums (complete mode — state is
    one row per scored doc, the same caveat as streaming
    decontamination: at 100 TB you would window the scoring by arrival
    partition and merge downstream). The drained sums finish with the
    identical /1e6 rounding + NULL-row left join as the batch operator,
    so the result must hash-match the ``text_dsir`` oracle verbatim:
    the same importance weights during ingest as at rest."""
    import uuid

    from hadoop_tfidf_spark.operators.sampling import (
        dsir_feature_buckets,
        dsir_ratios,
    )
    from hadoop_tfidf_spark.streaming.windows import (
        run_to_completion,
        staged_source,
    )

    docs = _tbl(spark, sf_dir, "documents")
    ratios = dsir_ratios(
        docs, F.col("source") == DSIR_GATE_TARGET, n_buckets=DSIR_GATE_BUCKETS
    )
    base = staged_source(
        ("documents", sf_dir, "full4"),
        lambda p: docs.repartition(4).write.mode("overwrite").parquet(p),
        prefix="spark_graft_dsirstream_",
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    scored = (
        dsir_feature_buckets(stream, n_buckets=DSIR_GATE_BUCKETS)
        .join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_feats"),
            F.sum("lr_u").cast("bigint").alias("_lr_sum"),
        )
    )
    drained = run_to_completion(
        scored, f"dsir_{uuid.uuid4().hex[:8]}", output_mode="complete"
    )
    return (
        docs.select("doc_id")
        .join(drained, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("bigint").alias(
                "n_feats"
            ),
            F.round(F.col("_lr_sum") / F.lit(1_000_000.0), 6).alias(
                "dsir_logratio"
            ),
        )
    )


def q_sim_label_centroids(spark, sf_dir):
    """Nearest-centroid label audit over the embeddings table: integer
    micro-unit per-label centroids (exact BIGINT sums → engine-exact),
    every vector assigned to the closest centroid, label×assigned
    confusion counts."""
    return S.nearest_centroid_confusion(_emb(spark, sf_dir))


# --------------------------------------------------------------------------
# Round-10 families: audio VAD, per-source governance, n-gram novelty,
# INT8 scalar-quantized retrieval, variance-balanced (OPQ-lite) PQ.
# --------------------------------------------------------------------------

#: Candidate budgets the SQ recall audit sweeps (stage-1 survivors per
#: query — same shape as RP_IVFPQ_BUDGETS; the tight budget shows the
#: resolution loss, the wide one shows it washing out).
SQ_RECALL_BUDGETS = (15, 50)

#: OPQ gate fixture: the first OPQ_HOT_DIMS of the 64 dims scaled by
#: OPQ_HOT_SCALE (a power of two, so the double multiply is EXACT in
#: both engines) — contiguous PQ gives subspace 0 every hot dimension,
#: the permutation deals them one per subspace.
OPQ_HOT_DIMS = 16
OPQ_HOT_SCALE = 8
OPQ_SAMPLE_N = 256


def q_multimodal_audio_energy(spark, sf_dir):
    """Audio frame-energy / VAD stage over the synthetic PCM16 WAVs:
    16-sample windows, a window is active iff its energy beats the
    mean-square threshold (8192² per sample — integer compare), per-doc
    activity counts + trim boundaries + exact BIGINT total energy. The
    engine walks real RIFF bytes; the oracle replays the generator
    sawtooth analytically with the same ``i // 16`` framing."""
    from hadoop_tfidf_spark.operators.multimodal import (
        audio_energy,
        with_audio_payload,
    )

    return audio_energy(with_audio_payload(_docs(spark, sf_dir)))


def q_text_source_stats(spark, sf_dir):
    """Per-source corpus governance dashboard: docs, tokens, mean
    tokens/doc, distinct-word vocabulary, language spread — the
    provenance telemetry reviewed before setting mixture weights.
    Reads the raw table directly: the stats need the ``source`` and
    ``lang`` provenance columns that ``_docs``'s narrow (doc_id, text)
    projection prunes away."""
    from hadoop_tfidf_spark.functions.text import source_stats

    return source_stats(_tbl(spark, sf_dir, "documents"))


def q_text_ngram_novelty(spark, sf_dir):
    """Per-document trigram novelty: the share of a doc's distinct
    3-grams appearing in no other document — finer-grain duplication
    telemetry than whole-doc dedup (spread 0.33–1.0 on the sf0.01
    corpus, so the gate relation is far from vacuous)."""
    from hadoop_tfidf_spark.functions.text import ngram_novelty

    return ngram_novelty(_docs(spark, sf_dir), n=3)


def q_sim_topk_sq(spark, sf_dir):
    """Two-stage retrieval through INT8 scalar quantization (the FAISS
    SQ8 shape): stage 1 scans one signed byte per component (codes on a
    corpus-wide vmax scale, derived from the data), stage 2 re-ranks
    the 50 survivors by exact full-resolution integer L2. Both stages
    BIGINT-exact; the one float step (floor(u·127/vmax)) is a single
    IEEE double op identical in both engines."""
    from hadoop_tfidf_spark.operators.similarity import sq_topk

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id").isin(SIM_QUERY_IDS))
    return sq_topk(
        emb, queries, k=SIM_K, candidates=RP_TOPK_CANDIDATES,
        units=IVF_UNITS, in_dim=64,
    )


def q_sim_sq_recall(spark, sf_dir):
    """Recall telemetry for the SQ index at two candidate budgets
    (c15/c50) against the exact integer-L2 top-10 — the dashboard that
    says whether 8-bit resolution loses neighbors at a given budget.
    Unlike the JL cut (dimension collision), SQ keeps every dimension:
    recall at the same budget should sit at or above the RP row, and
    THAT comparison is what the paired dashboards surface.

    Calibrates ONCE (:func:`similarity.sq_vmax`, one scalar scan) and
    hands the scale to both budget calls via ``vmax=`` — the
    precomputed-calibration path under the hash gate; the plain
    ``sim_topk_sq`` row covers the derive-internally default."""
    from hadoop_tfidf_spark.operators.similarity import (
        int_l2_topk,
        sq_topk,
        sq_vmax,
    )

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id").isin(SIM_QUERY_IDS))
    exact = int_l2_topk(emb, queries, k=SIM_K, units=IVF_UNITS)
    vmax = sq_vmax(emb, units=IVF_UNITS, in_dim=64)
    branches = []
    for b in SQ_RECALL_BUDGETS:
        approx = sq_topk(
            emb, queries, k=SIM_K, candidates=b, units=IVF_UNITS, in_dim=64,
            vmax=vmax,
        ).select("query_id", "vec_id")
        hits = (
            exact.join(approx, ["query_id", "vec_id"], "leftsemi")
            .groupBy("query_id")
            .agg(F.count("*").cast("bigint").alias("n_hits"))
        )
        branches.append(
            queries.select(F.col("vec_id").alias("query_id"))
            .join(hits, "query_id", "left")
            .select(
                F.lit(f"sq_c{b}").alias("method"),
                "query_id",
                F.coalesce(F.col("n_hits"), F.lit(0))
                .cast("bigint")
                .alias("n_hits"),
                F.round(
                    F.coalesce(F.col("n_hits"), F.lit(0))
                    / F.lit(float(SIM_K)),
                    6,
                ).alias("recall"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def _scaled_emb(spark, sf_dir):
    """The OPQ gate fixture: first :data:`OPQ_HOT_DIMS` dimensions
    scaled by :data:`OPQ_HOT_SCALE` (power of two ⇒ the double multiply
    is exact, so both engines quantize identical values). On the raw
    iid embeddings every dimension carries the same variance and the
    permutation is a no-op by construction; the skewed fixture is the
    deployment the allocation step exists for."""
    emb = _emb(spark, sf_dir)
    return emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x, i: x.cast("double")
            * F.when(i < OPQ_HOT_DIMS, F.lit(float(OPQ_HOT_SCALE))).otherwise(
                F.lit(1.0)
            ),
        ).alias("embedding"),
    )


def q_sim_topk_opq(spark, sf_dir):
    """PQ ADC search in the variance-balanced permuted space (the OPQ
    dimension-allocation step, Ge et al. 2013) over the variance-skewed
    fixture: rank dims by exact-BIGINT variance numerators on the
    id-prefix sample, deal them round-robin into the m subspaces,
    then train/encode/search the standard bit-packed PQ index. The
    oracle replays the sample stats, the ranking, the permutation AND
    the nested per-subspace Lloyd + ADC chain."""
    from hadoop_tfidf_spark.operators.similarity import opq_topk

    return opq_topk(
        _scaled_emb(spark, sf_dir), SIM_QUERY_IDS, k=SIM_K, m=PQ_M,
        pq_k=PQ_K, iters=PQ_ITERS, units=IVF_UNITS, in_dim=64,
        sample_n=OPQ_SAMPLE_N,
    )


def q_sim_opq_recall(spark, sf_dir):
    """The allocation payoff, measured: recall@10 of contiguous PQ vs
    variance-balanced OPQ against the exact integer-L2 truth on the
    SAME skewed fixture — contiguous splitting hands subspace 0 all
    sixteen hot dimensions and its codebook's quantization error
    dominates the ADC distance; the permutation deals them out. Both
    chains and the truth replay in DuckDB."""
    from hadoop_tfidf_spark.operators.similarity import (
        int_l2_topk,
        opq_topk,
        pq_build,
        pq_topk,
    )

    emb = _scaled_emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id").isin(SIM_QUERY_IDS))
    exact = int_l2_topk(emb, queries, k=SIM_K, units=IVF_UNITS)
    codes, books = pq_build(
        emb, m=PQ_M, k=PQ_K, iters=PQ_ITERS, units=IVF_UNITS, pack=True
    )
    pq_res = pq_topk(
        emb, codes, books, SIM_QUERY_IDS, k=SIM_K, units=IVF_UNITS
    ).select("query_id", "vec_id")
    opq_res = opq_topk(
        emb, SIM_QUERY_IDS, k=SIM_K, m=PQ_M, pq_k=PQ_K, iters=PQ_ITERS,
        units=IVF_UNITS, in_dim=64, sample_n=OPQ_SAMPLE_N,
    ).select("query_id", "vec_id")
    branches = []
    for method, approx in (("pq", pq_res), ("opq", opq_res)):
        hits = (
            exact.join(approx, ["query_id", "vec_id"], "leftsemi")
            .groupBy("query_id")
            .agg(F.count("*").cast("bigint").alias("n_hits"))
        )
        branches.append(
            queries.select(F.col("vec_id").alias("query_id"))
            .join(hits, "query_id", "left")
            .select(
                F.lit(method).alias("method"),
                "query_id",
                F.coalesce(F.col("n_hits"), F.lit(0))
                .cast("bigint")
                .alias("n_hits"),
                F.round(
                    F.coalesce(F.col("n_hits"), F.lit(0))
                    / F.lit(float(SIM_K)),
                    6,
                ).alias("recall"),
            )
        )
    return branches[0].unionByName(branches[1])


def _opq_permuted_emb(spark, sf_dir):
    """The OPQ-permuted skewed fixture: train the variance-balanced
    permutation on the id-prefix sample (one dim-sized stats collect —
    the ``perm=``-style trainer pattern), then reorder coordinates as a
    zero-cost projection. Shared by the composed-index query and its
    recall row."""
    emb = _scaled_emb(spark, sf_dir)
    perm = S.opq_permutation(
        emb, m=PQ_M, in_dim=64, units=IVF_UNITS, sample_n=OPQ_SAMPLE_N
    )
    return emb.select(
        "vec_id",
        F.array(*[F.col("embedding").getItem(int(p)) for p in perm]).alias(
            "embedding"
        ),
    )


def q_sim_topk_opq_ivfpq(spark, sf_dir):
    """The OPQ dimension allocation composed with the RESIDUAL IVFADC
    index (Ge et al. 2013 §"OPQ with IVFADC" + Jégou §IV): the
    permutation is free at encode time — a projection reorder fused
    into the same scan that quantizes — so the coarse Lloyd, residual
    projection, per-subspace Lloyd and bit-packed codes all operate in
    the variance-balanced space at zero extra scan cost. On the skewed
    fixture contiguous subspace 0 would hoard every hot dimension of
    the RESIDUALS too (coarse centroids shift means, not scales), so
    the balanced codebooks quantize tighter for the same 8
    bytes/vector. Every stage BIGINT-exact; the oracle feeds the
    permuted relation through the full residual-IVFADC replay."""
    from pyspark.storagelevel import StorageLevel

    emb = _opq_permuted_emb(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    assigned, cents, codes, books = S.ivfpq_build_residual(
        emb, coarse_k=IVF_K, coarse_iters=IVF_ITERS,
        m=PQ_M, k=PQ_K, iters=PQ_ITERS, units=IVF_UNITS, pack=True,
    )
    out = S.ivfpq_topk(
        assigned, cents, codes, books, SIM_QUERY_IDS,
        k=SIM_K, nprobe=IVF_NPROBE, units=IVF_UNITS,
        embeddings=emb, residual=True,
    )
    # The permuted projection STAYS persisted through execution — the
    # stored-index surrogate, exactly the rp_ivfpq precedent (SCALE.md):
    # unpersisted, every distance lambda inlines the 64-getItem array
    # construction and re-evaluates it per element (measured 10.6s vs
    # 2.0s for the same search on this fixture).
    return out


def q_sim_opq_ivfpq_recall(spark, sf_dir):
    """The composed-index payoff, measured: recall@10 of the contiguous
    residual IVFADC vs the OPQ-permuted residual IVFADC on the SAME
    skewed fixture against the exact integer-L2 truth — the
    compressed-index completion of the flat-PQ ``sim_opq_recall``
    dashboard (does dimension balancing still pay once the coarse
    quantizer absorbs the means? the hot dims keep their VARIANCE in
    the residuals, so it should). Both index chains and the truth
    replay in DuckDB."""
    from pyspark.storagelevel import StorageLevel

    scaled = _scaled_emb(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    permuted = _opq_permuted_emb(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    queries = scaled.where(F.col("vec_id").isin(SIM_QUERY_IDS))
    exact = S.int_l2_topk(scaled, queries, k=SIM_K, units=IVF_UNITS)
    branches = []
    for method, base in (("ivfpq_res", scaled), ("opq_ivfpq", permuted)):
        assigned, cents, codes, books = S.ivfpq_build_residual(
            base, coarse_k=IVF_K, coarse_iters=IVF_ITERS,
            m=PQ_M, k=PQ_K, iters=PQ_ITERS, units=IVF_UNITS, pack=True,
        )
        approx = S.ivfpq_topk(
            assigned, cents, codes, books, SIM_QUERY_IDS,
            k=SIM_K, nprobe=IVF_NPROBE, units=IVF_UNITS,
            embeddings=base, residual=True,
        ).select("query_id", "vec_id")
        hits = (
            exact.join(approx, ["query_id", "vec_id"], "leftsemi")
            .groupBy("query_id")
            .agg(F.count("*").cast("bigint").alias("n_hits"))
        )
        branches.append(
            queries.select(F.col("vec_id").alias("query_id"))
            .join(hits, "query_id", "left")
            .select(
                F.lit(method).alias("method"),
                "query_id",
                F.coalesce(F.col("n_hits"), F.lit(0))
                .cast("bigint")
                .alias("n_hits"),
                F.round(
                    F.coalesce(F.col("n_hits"), F.lit(0))
                    / F.lit(float(SIM_K)),
                    6,
                ).alias("recall"),
            )
        )
    # Both fixture relations stay persisted through execution (the
    # stored-index surrogate rule — see q_sim_topk_opq_ivfpq): the
    # recall plan references each side's vectors in the codes join, the
    # probe AND the exact-truth re-rank, and an unpersisted permuted
    # projection re-inlines its 64-getItem array per distance lambda.
    return branches[0].unionByName(branches[1])


def q_sim_topk_ivfsq(spark, sf_dir):
    """IVF-SQ8 retrieval (the FAISS IndexIVFScalarQuantizer shape): the
    middle rung of the quantization ladder — coarse IVF cells bound the
    scan to ~nprobe/coarse_k of the corpus, residuals stored at one
    signed byte per component on a corpus-wide vmax scale (no codebooks
    to train), stage-1 integer L2 in code space within probed cells,
    exact full-resolution re-rank of the survivors. Every ranking
    BIGINT-exact; the oracle replays coarse Lloyd + residual + vmax +
    codes + probe + both stages unrolled."""
    return S.ivfsq_topk(
        _emb(spark, sf_dir), SIM_QUERY_IDS, k=SIM_K,
        candidates=RP_TOPK_CANDIDATES, nprobe=IVF_NPROBE,
        coarse_k=IVF_K, coarse_iters=IVF_ITERS, units=IVF_UNITS, in_dim=64,
    )


def q_sim_ivfsq_recall(spark, sf_dir):
    """IVF-SQ recall at the same c15/c50 budgets as ``sim_sq_recall``
    against the same exact integer-L2 truth — the paired dashboard
    that prices the probe: flat SQ scans every code, IVF-SQ scans only
    probed cells, and the recall delta at equal budget IS the cost of
    the cells the probe skipped. Builds ONCE
    (:func:`similarity.ivfsq_build`) and searches the prebuilt index at
    both budgets — the production sweep shape."""
    from pyspark.storagelevel import StorageLevel

    emb = _emb(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    queries = emb.where(F.col("vec_id").isin(SIM_QUERY_IDS))
    exact = S.int_l2_topk(emb, queries, k=SIM_K, units=IVF_UNITS)
    index, cents, vmax = S.ivfsq_build(
        emb, coarse_k=IVF_K, coarse_iters=IVF_ITERS,
        units=IVF_UNITS, in_dim=64,
    )
    index = index.persist(StorageLevel.MEMORY_AND_DISK)
    branches = []
    for b in SQ_RECALL_BUDGETS:
        approx = S.ivfsq_topk(
            emb, SIM_QUERY_IDS, k=SIM_K, candidates=b, nprobe=IVF_NPROBE,
            units=IVF_UNITS, in_dim=64,
            index=index, centroids=cents, vmax=vmax,
        ).select("query_id", "vec_id")
        hits = (
            exact.join(approx, ["query_id", "vec_id"], "leftsemi")
            .groupBy("query_id")
            .agg(F.count("*").cast("bigint").alias("n_hits"))
        )
        branches.append(
            queries.select(F.col("vec_id").alias("query_id"))
            .join(hits, "query_id", "left")
            .select(
                F.lit(f"ivfsq_c{b}").alias("method"),
                "query_id",
                F.coalesce(F.col("n_hits"), F.lit(0))
                .cast("bigint")
                .alias("n_hits"),
                F.round(
                    F.coalesce(F.col("n_hits"), F.lit(0))
                    / F.lit(float(SIM_K)),
                    6,
                ).alias("recall"),
            )
        )
    out = branches[0].unionByName(branches[1])
    emb.unpersist()
    return out


def q_sim_topk_bq(spark, sf_dir):
    """Binary-quantization retrieval — the extreme rung of the
    quantization ladder: 1 sign bit per component (8 bytes/vector at
    dim 64, zero trained state — no vmax, no codebooks, no sample),
    stage-1 Hamming over the packed words, exact integer-L2 re-rank.
    The oracle replays the pack and both stages bit-for-bit."""
    from hadoop_tfidf_spark.operators.similarity import bq_topk

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id").isin(SIM_QUERY_IDS))
    return bq_topk(
        emb, queries, k=SIM_K, candidates=RP_TOPK_CANDIDATES,
        units=IVF_UNITS, in_dim=64,
    )


def q_sim_bq_recall(spark, sf_dir):
    """BQ recall at the same c15/c50 budgets and exact truth as the
    SQ/IVF-SQ rows — the fourth column of the quantization-ladder
    dashboard (BQ 1 bit vs SQ 8 bits vs IVF-SQ probed bytes vs PQ
    codebook bytes): what recall does the 8× byte cut from SQ8 to
    sign-bits give up at a fixed candidate budget? Builds the packed
    index ONCE and scans it per budget."""
    from hadoop_tfidf_spark.operators.similarity import bq_build, bq_topk

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id").isin(SIM_QUERY_IDS))
    exact = S.int_l2_topk(emb, queries, k=SIM_K, units=IVF_UNITS)
    index = bq_build(emb, units=IVF_UNITS, in_dim=64)
    branches = []
    for b in SQ_RECALL_BUDGETS:
        approx = bq_topk(
            emb, queries, k=SIM_K, candidates=b, units=IVF_UNITS,
            in_dim=64, index=index,
        ).select("query_id", "vec_id")
        hits = (
            exact.join(approx, ["query_id", "vec_id"], "leftsemi")
            .groupBy("query_id")
            .agg(F.count("*").cast("bigint").alias("n_hits"))
        )
        branches.append(
            queries.select(F.col("vec_id").alias("query_id"))
            .join(hits, "query_id", "left")
            .select(
                F.lit(f"bq_c{b}").alias("method"),
                "query_id",
                F.coalesce(F.col("n_hits"), F.lit(0))
                .cast("bigint")
                .alias("n_hits"),
                F.round(
                    F.coalesce(F.col("n_hits"), F.lit(0))
                    / F.lit(float(SIM_K)),
                    6,
                ).alias("recall"),
            )
        )
    return branches[0].unionByName(branches[1])


def q_text_source_quality(spark, sf_dir):
    """Per-source QUALITY governance — the second half of the
    provenance dashboard (``text_source_stats`` counts tokens; this
    row says whether each source is worth its tokens): per source the
    doc count, the corpus quality-score mass and mean, and the C4
    rule-gate keep count and rate. The per-doc quality double is
    carried as exact micro-units (``round(quality·1e6)`` — one
    round-trip of an already-6dp value, so the BIGINT is engine-exact
    and the source SUM is order-independent); the mean divides two
    exact integers in one IEEE op. Plan: two zero-shuffle scan stages
    (quality + C4 flags) joined doc_id-keyed, one source-keyed agg."""
    from hadoop_tfidf_spark.functions.text import (
        c4_quality_filters,
        quality_score,
    )

    docs = _tbl(spark, sf_dir, "documents")
    narrow = docs.select("doc_id", "text")
    q = quality_score(narrow).select(
        "doc_id",
        F.round(F.col("quality") * 1_000_000, 0)
        .cast("bigint")
        .alias("_qu"),
    )
    c4 = c4_quality_filters(narrow).select(
        "doc_id", F.col("keep").cast("bigint").alias("_keep")
    )
    return (
        docs.select("doc_id", "source")
        .join(q, "doc_id")
        .join(c4, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("_qu").cast("bigint").alias("sum_quality_u"),
            F.round(
                F.sum("_qu") / (F.count("*") * F.lit(1_000_000.0)), 6
            ).alias("avg_quality"),
            F.sum("_keep").cast("bigint").alias("n_keep"),
            F.round(F.sum("_keep") / F.count("*"), 6).alias("keep_rate"),
        )
    )


#: RRF constant (Cormack et al. 2009 — 60 is the canonical choice),
#: lexical candidate depth, and fused output depth.
RRF_K = 60
RRF_LEX_TOPN = 20
RRF_TOPK = 10


def q_search_hybrid_rrf(spark, sf_dir):
    """HYBRID retrieval — reciprocal-rank fusion (Cormack et al. 2009)
    of the reference's lexical TF-IDF ranking with the vector index:
    the modern search deployment a TF-IDF user upgrades to without
    discarding the lexical side. Per query: the lexical top-20 from the
    core DQ6 ranking (reference Rank semantics, score-desc/doc-id
    tie-break) full-outer-joins the exact integer-L2 top-10 for the
    query's mapped embedding (``SEARCH_QUERIES[i] ↔ SIM_QUERY_IDS[i]``;
    the fixture convention ``vec_id ≡ doc_id`` the semantic curate
    pipeline already uses), fused score = Σ 1/(60+rank) over the lists
    the doc appears in — a FIXED two-term expression, so the double
    arithmetic replays bit-identically — and the fused top-10 ranks
    with (score desc, doc_id) tie-breaks. NULL ``r_lex``/``r_sem``
    surface which list each hit came from.

    Scale: both inputs are already top-k-bounded per query (the
    rankings do the heavy lifting; fusion touches ≤30 rows per query),
    so the fusion join — a sort-merge, since Spark cannot broadcast a
    FULL outer side — and its window run over (queries × 30) rows
    regardless of corpus size."""
    from hadoop_tfidf_spark.declared import SEARCH_QUERIES, q_rank

    vec_ids = SIM_QUERY_IDS[: len(SEARCH_QUERIES)]
    lex = (
        q_rank(spark, sf_dir)
        .where(F.col("rnk") <= RRF_LEX_TOPN)
        .select("query_id", "doc_id", F.col("rnk").cast("bigint").alias("r_lex"))
    )
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id").isin(vec_ids))
    qmap = spark.createDataFrame(
        [(qid, int(v)) for (qid, _), v in zip(SEARCH_QUERIES, vec_ids)],
        "query_id STRING, qvec_id BIGINT",
    )
    sem = (
        S.int_l2_topk(emb, queries, k=SIM_K, units=IVF_UNITS)
        .select(
            F.col("query_id").alias("qvec_id"),
            F.col("vec_id").alias("doc_id"),
            F.col("rn").cast("bigint").alias("r_sem"),
        )
        .join(F.broadcast(qmap), "qvec_id")
        .select("query_id", "doc_id", "r_sem")
    )
    fused = lex.join(sem, ["query_id", "doc_id"], "full").select(
        "query_id",
        "doc_id",
        "r_lex",
        "r_sem",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("r_sem")), F.lit(0.0)
            ),
            6,
        ).alias("rrf_score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), "doc_id"
    )
    return (
        fused.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= RRF_TOPK)
    )


# --------------------------------------------------------------------------
# Round-12 queries: the unified quantization-tier frontier, the update-mode
# streaming governance twin, and the malformed-payload keep contract.
# --------------------------------------------------------------------------

#: Frontier config: one shared candidate budget for the two-stage tiers
#: (sq / ivfsq / bq re-rank the stage-1 top-FRONTIER_BUDGET exactly; the
#: PQ-family tiers are pure ADC rankings with no re-rank stage), and the
#: per-vector byte accounting at dim 64 — cell ids 2 bytes (coarse_k <=
#: 65536), PQ codes log2(PQ_K) = 4 bits each bit-packed, sign bits 1/8
#: byte; codebooks / centroids / the OPQ permutation are global index
#: metadata, not per-vector bytes.
FRONTIER_BUDGET = 50
PQ_CODE_BYTES = (PQ_M * (PQ_K.bit_length() - 1)) // 8
TIER_BYTES = {
    "sq": 64,
    "ivfsq": 64 + 2,
    "pq": PQ_CODE_BYTES,
    "ivfpq_res": PQ_CODE_BYTES + 2,
    "opq_ivfpq": PQ_CODE_BYTES + 2,
    "bq": 64 // 8,
}


def q_sim_tier_frontier(spark, sf_dir):
    """The unified recall-vs-bytes frontier — the ONE table a user
    picking a quantization tier actually wants: every tier of the
    ladder (flat SQ8, IVF-SQ8, flat PQ, residual IVFADC, OPQ-composed
    residual IVFADC, binary quantization) searched over the SAME
    variance-skewed fixture (:func:`_scaled_emb` — the deployment where
    the tiers genuinely differ; on iid data they collapse together)
    against the SAME exact integer-L2 top-10 truth, one row per tier:
    ``(tier, bytes_per_vec, n_hits, recall)`` with hits summed over the
    five gate queries. The two-stage tiers run at one shared candidate
    budget (:data:`FRONTIER_BUDGET`); the PQ-family tiers rank by pure
    ADC distance. Scale: each tier chain is the already-audited
    gate-query plan (blocked/probed stage 1, candidates-bounded exact
    re-rank); the frontier adds only six count aggregates over
    top-k-bounded relations, so its cost IS the sum of the tier
    searches at any corpus size. The oracle replays all six chains in
    one query via scoped nested-WITH subqueries against one shared
    truth CTE."""
    from pyspark.storagelevel import StorageLevel

    emb = _scaled_emb(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    permuted = _opq_permuted_emb(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    queries = emb.where(F.col("vec_id").isin(SIM_QUERY_IDS))
    exact = S.int_l2_topk(emb, queries, k=SIM_K, units=IVF_UNITS).select(
        "query_id", "vec_id"
    )

    approx: dict[str, DataFrame] = {}
    vmax = S.sq_vmax(emb, units=IVF_UNITS, in_dim=64)
    approx["sq"] = S.sq_topk(
        emb, queries, k=SIM_K, candidates=FRONTIER_BUDGET,
        units=IVF_UNITS, in_dim=64, vmax=vmax,
    )
    approx["ivfsq"] = S.ivfsq_topk(
        emb, SIM_QUERY_IDS, k=SIM_K, candidates=FRONTIER_BUDGET,
        nprobe=IVF_NPROBE, coarse_k=IVF_K, coarse_iters=IVF_ITERS,
        units=IVF_UNITS, in_dim=64,
    )
    codes, books = S.pq_build(
        emb, m=PQ_M, k=PQ_K, iters=PQ_ITERS, units=IVF_UNITS, pack=True
    )
    approx["pq"] = S.pq_topk(
        emb, codes, books, SIM_QUERY_IDS, k=SIM_K, units=IVF_UNITS
    )
    for method, base in (("ivfpq_res", emb), ("opq_ivfpq", permuted)):
        assigned, cents, rcodes, rbooks = S.ivfpq_build_residual(
            base, coarse_k=IVF_K, coarse_iters=IVF_ITERS,
            m=PQ_M, k=PQ_K, iters=PQ_ITERS, units=IVF_UNITS, pack=True,
        )
        approx[method] = S.ivfpq_topk(
            assigned, cents, rcodes, rbooks, SIM_QUERY_IDS,
            k=SIM_K, nprobe=IVF_NPROBE, units=IVF_UNITS,
            embeddings=base, residual=True,
        )
    approx["bq"] = S.bq_topk(
        emb, queries, k=SIM_K, candidates=FRONTIER_BUDGET,
        units=IVF_UNITS, in_dim=64,
    )

    denom = float(SIM_K * len(SIM_QUERY_IDS))
    rows = []
    for tier, adf in approx.items():
        hits = exact.join(
            adf.select("query_id", "vec_id"),
            ["query_id", "vec_id"],
            "leftsemi",
        ).agg(F.count("*").cast("bigint").alias("n_hits"))
        rows.append(
            hits.select(
                F.lit(tier).alias("tier"),
                F.lit(TIER_BYTES[tier]).cast("bigint").alias("bytes_per_vec"),
                "n_hits",
                F.round(F.col("n_hits") / F.lit(denom), 6).alias("recall"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    # Both fixture relations stay persisted through execution — the
    # stored-index surrogate rule (see q_sim_topk_opq_ivfpq).
    return out


#: Every doc_id ≡ AUDIO_POISON_RES (mod AUDIO_POISON_MOD) has its WAV
#: payload truncated to the first AUDIO_POISON_BYTES bytes — cutting
#: mid-RIFF-magic, so the parser's "bad RIFF/WAVE magic" guard fires
#: deterministically. A modulo rule (not one literal id) so the poison
#: density stays constant as the corpus scales.
AUDIO_POISON_MOD = 250
AUDIO_POISON_RES = 83
AUDIO_POISON_BYTES = 11


def q_multimodal_audio_keep(spark, sf_dir):
    """The 100 TB malformed-payload contract UNDER THE GATE: the audio
    corpus with every poisoned payload (see :data:`AUDIO_POISON_MOD`)
    truncated mid-header, decoded with ``errors="keep"`` — good rows
    must stay byte-identical to ``multimodal_audio_decode``'s features
    (the oracle reuses that row's analytic replay verbatim), poisoned
    rows surface NULL features plus the deterministic ``err`` string
    instead of failing the stage. The strict default (``errors=
    "raise"``) on the same corpus is test-pinned to fail — this row
    proves the production mode, the tests pin the contrast."""
    from hadoop_tfidf_spark.operators.multimodal import (
        decode_audio,
        with_audio_payload,
    )

    media = with_audio_payload(_docs(spark, sf_dir))
    poisoned = media.withColumn(
        "payload",
        F.when(
            F.col("doc_id") % AUDIO_POISON_MOD == AUDIO_POISON_RES,
            F.expr(f"substring(payload, 1, {AUDIO_POISON_BYTES})"),
        ).otherwise(F.col("payload")),
    )
    return decode_audio(poisoned, errors="keep")


def q_streaming_source_stats_update(spark, sf_dir):
    """UPDATE-mode streaming governance — the production variant of
    ``streaming_source_stats``: instead of a complete-mode drain that
    re-emits the FULL ledger every trigger (fine as a gate twin, wrong
    at 100 TB output), each micro-batch emits only the (source, lang)
    rows whose counts CHANGED, and ``foreachBatch`` upserts them into a
    durable parquet ledger keyed by batch id — the foreachBatch+MERGE
    deployment shape. Final state = latest row per key (one window over
    the ledger, ledger size ≤ triggers × strata, never corpus-sized);
    finished with the same per-source arithmetic as the batch
    dashboard, so the hash row proves upsert-reconstructed state ==
    state at rest. Vocab is deliberately out of scope here (the
    complete-mode twin covers it); this row's subject is the update
    OUTPUT contract. Since round 13 the ledger writes are generation-
    keyed overwrites (streaming/ledger.py) — replay-idempotent under
    foreachBatch's at-least-once contract, pinned by test."""
    import uuid

    from hadoop_tfidf_spark.streaming.ledger import (
        ledger_upsert,
        read_ledger,
        reconstruct_latest,
    )
    from hadoop_tfidf_spark.streaming.windows import (
        staged_source,
        staging_dir,
    )

    docs = _tbl(spark, sf_dir, "documents")
    base = staged_source(
        ("documents", sf_dir, "full4"),
        lambda p: docs.repartition(4).write.mode("overwrite").parquet(p),
        prefix="spark_graft_srcstream_",
    )
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    counts = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
        .groupBy("source", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.size(words)).cast("bigint").alias("n_tokens"),
        )
    )
    run = staging_dir(prefix=f"spark_graft_srcupd_{uuid.uuid4().hex[:8]}_")
    sink, ckpt = f"{run}/ledger", f"{run}/ckpt"

    # Production: MERGE INTO the governance table on (source, lang). The
    # gate twin overwrites a batch_id=N generation dir per trigger, so
    # the ledger keeps the upsert ORDER (latest generation per key wins)
    # and a replayed batch rewrites itself instead of duplicating.
    (
        counts.writeStream.outputMode("update")
        .foreachBatch(ledger_upsert(sink))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    final = reconstruct_latest(read_ledger(spark, sink), ["source", "lang"])
    return final.groupBy("source").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(F.sum("n_tokens") / F.sum("n_docs"), 6).alias("avg_tokens"),
        F.count("*").cast("bigint").alias("n_langs"),
    )


def q_streaming_ledger_compact(spark, sf_dir):
    """Round 13 — GENERATION COMPACTION for the update-mode ledgers: the
    missing piece of their 100 TB story. The ledgers reconstruct state
    as latest-row-per-key over ALL generations, so an always-on stream's
    reconstruction cost grows with commit count forever; production
    periodically folds old generations into one base (a table format's
    OPTIMIZE/rewrite). This row runs the same 4-trigger source-stats
    update stream as ``streaming_source_stats_update``, folds
    generations 0..2 into one base via ``compact_ledger``
    (streaming/ledger.py), and re-derives the per-source roll-up from
    the compacted ledger — which must hash-match the SAME batch oracle,
    plus a pinned ``n_generations = 2`` column (base + the one newer
    generation) proving the fold actually happened and newer deltas
    still shadow the base."""
    import uuid

    from hadoop_tfidf_spark.streaming.ledger import (
        compact_ledger,
        ledger_upsert,
        read_ledger,
        reconstruct_latest,
    )
    from hadoop_tfidf_spark.streaming.windows import (
        staged_source,
        staging_dir,
    )

    docs = _tbl(spark, sf_dir, "documents")
    base = staged_source(
        ("documents", sf_dir, "full4"),
        lambda p: docs.repartition(4).write.mode("overwrite").parquet(p),
        prefix="spark_graft_srcstream_",
    )
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    counts = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
        .groupBy("source", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.size(words)).cast("bigint").alias("n_tokens"),
        )
    )
    run = staging_dir(prefix=f"spark_graft_srccmp_{uuid.uuid4().hex[:8]}_")
    sink, ckpt = f"{run}/ledger", f"{run}/ckpt"
    (
        counts.writeStream.outputMode("update")
        .foreachBatch(ledger_upsert(sink))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    compact_ledger(spark, sink, ["source", "lang"], through=2)
    ledger = read_ledger(spark, sink)
    n_gens = ledger.select("batch_id").distinct().count()
    final = reconstruct_latest(ledger, ["source", "lang"])
    return final.groupBy("source").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(F.sum("n_tokens") / F.sum("n_docs"), 6).alias("avg_tokens"),
        F.count("*").cast("bigint").alias("n_langs"),
    ).withColumn("n_generations", F.lit(n_gens).cast("bigint"))


def q_streaming_ledger_policy(spark, sf_dir):
    """Round 14 — the compaction POLICY under the gate: the same
    4-trigger source-stats update stream as
    ``streaming_source_stats_update``, but the sink itself folds every
    ``compact_every=2`` commits (``ledger_upsert(keys=…,
    compact_every=2)``) — no operator remembering to call
    ``compact_ledger``, the policy SCALE.md names runs inside the
    foreachBatch callback, which Structured Streaming executes serially
    per query (single-writer by construction). The fold point is the
    PREVIOUS batch (``through = B - 1``): folding the triggering batch
    itself would wedge the stream on the guaranteed at-least-once
    replay after a crash-before-checkpoint-commit (ledger_upsert's
    docstring). 4 triggers → the batch-1 fold is a no-op (only
    generation 0 precedes it), the batch-3 fold lands a base at
    batch_id=2 → the stream ENDS with exactly TWO generations, pinned
    by the ``n_generations`` column; the reconstruction still
    hash-matches the same batch oracle, proving the always-on stream's
    read path stays flat without losing a row."""
    import uuid

    from hadoop_tfidf_spark.streaming.ledger import (
        ledger_upsert,
        read_ledger,
        reconstruct_latest,
    )
    from hadoop_tfidf_spark.streaming.windows import (
        staged_source,
        staging_dir,
    )

    docs = _tbl(spark, sf_dir, "documents")
    base = staged_source(
        ("documents", sf_dir, "full4"),
        lambda p: docs.repartition(4).write.mode("overwrite").parquet(p),
        prefix="spark_graft_srcstream_",
    )
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    counts = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
        .groupBy("source", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.size(words)).cast("bigint").alias("n_tokens"),
        )
    )
    run = staging_dir(prefix=f"spark_graft_srcpol_{uuid.uuid4().hex[:8]}_")
    sink, ckpt = f"{run}/ledger", f"{run}/ckpt"
    (
        counts.writeStream.outputMode("update")
        .foreachBatch(
            ledger_upsert(sink, keys=["source", "lang"], compact_every=2)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    ledger = read_ledger(spark, sink)
    n_gens = ledger.select("batch_id").distinct().count()
    final = reconstruct_latest(ledger, ["source", "lang"])
    return final.groupBy("source").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(F.sum("n_tokens") / F.sum("n_docs"), 6).alias("avg_tokens"),
        F.count("*").cast("bigint").alias("n_langs"),
    ).withColumn("n_generations", F.lit(n_gens).cast("bigint"))


def q_streaming_phash_dedup_update(spark, sf_dir):
    """UPDATE-mode perceptual-dedup ledger — the production variant of
    ``streaming_phash_dedup`` (same rationale as
    ``streaming_source_stats_update``): the complete-mode twin re-emits
    every phash group per trigger; here each micro-batch emits only the
    groups whose membership CHANGED, ``foreachBatch`` upserts them into
    a batch-id-keyed parquet ledger, and latest-row-per-key
    reconstruction must hash-match the batch groups (the
    ``streaming_phash_dedup`` oracle verbatim). Output volume scales
    with the delta per trigger; ledger rows ≤ triggers × distinct
    hashes, never corpus-sized. Generation-keyed replay-idempotent
    writes since round 13 (streaming/ledger.py)."""
    import uuid

    from hadoop_tfidf_spark.operators.multimodal import (
        media_phash,
        with_binary_payload,
    )
    from hadoop_tfidf_spark.streaming.ledger import (
        ledger_upsert,
        read_ledger,
        reconstruct_latest,
    )
    from hadoop_tfidf_spark.streaming.windows import (
        staged_source,
        staging_dir,
    )

    docs = _tbl(spark, sf_dir, "documents")
    base = staged_source(
        ("documents", sf_dir, "full4"),
        lambda p: docs.repartition(4).write.mode("overwrite").parquet(p),
        prefix="spark_graft_phashstream_",
    )
    groups = (
        media_phash(
            with_binary_payload(
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(base)
                .select("doc_id", "text")
            )
        )
        .groupBy("phash")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
        )
    )
    run = staging_dir(prefix=f"spark_graft_phashupd_{uuid.uuid4().hex[:8]}_")
    sink, ckpt = f"{run}/ledger", f"{run}/ckpt"

    (
        groups.writeStream.outputMode("update")
        .foreachBatch(ledger_upsert(sink))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return reconstruct_latest(read_ledger(spark, sink), ["phash"]).select(
        "phash", "n_docs", "keep_doc_id"
    )


def q_streaming_knn_bq(spark, sf_dir):
    """ONLINE retrieval during ingest — the serving twin of the index
    rows: query vectors arrive as a stream and each micro-batch is
    answered against the STATIC prebuilt BQ index (``bq_build`` once,
    passed via ``index=`` — the stored-index production shape) with the
    same two-stage popcount-xor + exact-re-rank search the batch row
    runs; each batch's results land in that batch's own generation dir
    (streaming/ledger.py overwrite — a replayed micro-batch rewrites
    itself instead of duplicating result rows, matching the update
    twins' idempotence). The accumulated answers must hash-match the
    one-shot batch ``sim_topk_bq`` oracle verbatim: answering queries
    as they arrive loses nothing vs answering them at rest. Scale: the
    stream side is query-sized, the static side is the packed index
    scan stage-1 already bounds — foreachBatch here is exactly a
    serving loop."""
    import uuid

    from hadoop_tfidf_spark.operators.similarity import bq_build, bq_topk
    from hadoop_tfidf_spark.streaming.ledger import ledger_upsert, read_ledger
    from hadoop_tfidf_spark.streaming.windows import (
        staged_source,
        staging_dir,
    )

    emb = _emb(spark, sf_dir)
    index = bq_build(emb, units=IVF_UNITS, in_dim=64)
    qdf = emb.where(F.col("vec_id").isin(SIM_QUERY_IDS))
    base = staged_source(
        ("embeddings", sf_dir, "queries2"),
        lambda p: qdf.repartition(2).write.mode("overwrite").parquet(p),
        prefix="spark_graft_knnstream_",
    )
    run = staging_dir(prefix=f"spark_graft_knnout_{uuid.uuid4().hex[:8]}_")
    sink, ckpt = f"{run}/results", f"{run}/ckpt"

    write_gen = ledger_upsert(sink)

    def serve(batch_df, batch_id):
        write_gen(
            bq_topk(
                emb, batch_df, k=SIM_K, candidates=RP_TOPK_CANDIDATES,
                units=IVF_UNITS, in_dim=64, index=index,
            ),
            batch_id,
        )

    (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
        .writeStream.outputMode("append")
        .foreachBatch(serve)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return read_ledger(spark, sink).select("query_id", "vec_id", "d2_u", "rn")


#: Per-source adaptive quality cut: keep the top fraction per source.
QUALITY_TOP_FRAC = 0.2


def q_text_quality_adaptive(spark, sf_dir):
    """Per-source ADAPTIVE quality threshold — the governance step after
    the absolute C4 gate: keep the top :data:`QUALITY_TOP_FRAC` of docs
    PER SOURCE by quality score (rank over (quality desc, doc_id) vs a
    per-source ceil(q·n) cutoff), so a low-quality source cannot flood
    the corpus just by being large and a high-quality source is not
    over-pruned by a one-size threshold. Emits the kept rows with their
    rank and source size — the audit columns a curation review wants.

    Scale: ONE source-keyed shuffle and ZERO joins — quality and source
    come out of the same scan (``quality_score(keep_cols=)``), so there
    is no corpus-to-corpus join back on doc_id; the per-source sort is
    the exact gate form — at 100 TB the production variant is
    :func:`q_text_quality_adaptive_approx` (per-source
    ``percentile_approx`` cutoff, one agg + one filter, no sort); this
    exact window is the audit twin that approximation is checked
    against."""
    from hadoop_tfidf_spark.functions.text import quality_score

    j = quality_score(
        _tbl(spark, sf_dir, "documents"), keep_cols=("source",)
    ).select("doc_id", "source", "quality")
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    ranked = j.select(
        "source",
        "doc_id",
        "quality",
        F.row_number().over(w).cast("bigint").alias("qrank"),
        F.count("*").over(Window.partitionBy("source")).alias("n_source"),
    )
    return ranked.where(
        F.col("qrank") <= F.ceil(F.lit(QUALITY_TOP_FRAC) * F.col("n_source"))
    ).select("source", "doc_id", "quality", "qrank", "n_source")


#: Sketch accuracy for the production adaptive cut (Spark default): the
#: cutoff's rank error is bounded by n_source / accuracy, so on the gate
#: fixture (n_source << 10⁴) the sketch holds every value and the cutoff
#: IS the exact discrete quantile — which is what lets the row hash-gate.
QUALITY_APPROX_ACC = 10_000


def q_text_quality_adaptive_approx(spark, sf_dir):
    """Round 13 — the 100 TB PRODUCTION form of the per-source adaptive
    quality cut: derive each source's cutoff from ONE
    ``percentile_approx(quality, 1-q)`` aggregation (map-side partial GK
    sketches merge to a 20-row relation — no per-source sort, no window,
    the corpus never shuffles), broadcast the tiny cutoff table back,
    and keep ``quality > cutoff``. Emits the per-source accounting a
    curation review wants: the cutoff, the approx kept count, the exact
    form's kept count (``ceil(q·n)``) and their delta — the "kept-set
    delta" that audits the approximation against the exact-window twin
    :func:`q_text_quality_adaptive`.

    Scale: the exact twin shuffles and sorts the WHOLE corpus by source
    (its window is the audit form); this one shuffles only GK sketch
    partials + a 20-row broadcast, and its second corpus pass is the
    production filter itself. Cutoff semantics: the smallest quality
    value whose ≤-fraction reaches ``1-q`` (Spark's percentile_approx
    definition) — the DuckDB oracle replays that DEFINITION with a
    cumulative window, exact on the gate fixture because n_source is far
    below :data:`QUALITY_APPROX_ACC` (at real scale the rank error is
    ≤ n_source/accuracy; that drift is exactly what ``delta`` measures).
    ``quality > cutoff`` keeps floor(q·n) rows on distinct values vs the
    exact form's ceil(q·n) rank cut, so |delta| ≤ 1 + ties by
    construction — asserted in tests, reported per source here."""
    from hadoop_tfidf_spark.functions.text import quality_score

    j = quality_score(
        _tbl(spark, sf_dir, "documents"), keep_cols=("source",)
    ).select("source", "quality")
    cuts = j.groupBy("source").agg(
        F.percentile_approx(
            "quality", 1.0 - QUALITY_TOP_FRAC, QUALITY_APPROX_ACC
        ).alias("cutoff"),
        F.count("*").alias("n_source"),
    )
    kept = (
        j.join(F.broadcast(cuts), "source")
        .where(F.col("quality") > F.col("cutoff"))
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        cuts.join(kept, "source", "left")
        .select(
            "source",
            "n_source",
            "cutoff",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
            F.ceil(F.lit(QUALITY_TOP_FRAC) * F.col("n_source"))
            .cast("bigint")
            .alias("n_kept_exact"),
            (
                F.coalesce(F.col("n_kept"), F.lit(0))
                - F.ceil(F.lit(QUALITY_TOP_FRAC) * F.col("n_source"))
            )
            .cast("bigint")
            .alias("kept_delta"),
        )
    )


def q_text_decontaminate_bloom(spark, sf_dir):
    """Round 13 — the BROADCAST-BLOOM form of benchmark decontamination
    (functions/text.contamination_bloom) audited against the exact
    semi-join form on the same candidate/benchmark split as
    ``text_decontaminate``: per-doc ``(n_shingles, n_hits_exact,
    n_hits_bloom, n_false_pos, keep_exact, keep_bloom)``. The Bloom
    side's corpus dataflow is join-free (the 16 KiB filter rides the
    plan as a literal; membership is a codegen'd mask probe inside the
    scan stage; per-doc distinct shingles built row-locally) — at 100 TB
    that deletes the shingle-keyed shuffle of the exact form's
    candidate stream AND the benchmark-set movement. One-sided error is
    pinned structurally: ``n_hits_bloom ≥ n_hits_exact`` row by row
    (never a false negative), so the Bloom cut only ever drops extra —
    the safe direction. The oracle replays the bitmap build and probe
    arithmetic bit for bit."""
    from hadoop_tfidf_spark.functions.text import (
        contamination_bloom,
        contamination_check,
    )

    docs = _docs(spark, sf_dir)
    cand = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    exact = contamination_check(cand, bench, k=3).select(
        "doc_id",
        "n_shingles",
        F.col("n_hits").alias("n_hits_exact"),
        (F.col("overlap_ratio") <= 0.1).cast("int").alias("keep_exact"),
    )
    bloom = contamination_bloom(cand, bench, k=3).select(
        "doc_id",
        F.col("n_hits").alias("n_hits_bloom"),
        (F.col("overlap_ratio") <= 0.1).cast("int").alias("keep_bloom"),
    )
    return exact.join(bloom, "doc_id").select(
        "doc_id",
        "n_shingles",
        "n_hits_exact",
        "n_hits_bloom",
        (F.col("n_hits_bloom") - F.col("n_hits_exact"))
        .cast("bigint")
        .alias("n_false_pos"),
        "keep_exact",
        "keep_bloom",
    )


def q_dedup_delta_signatures(spark, sf_dir):
    """Round 13 — INCREMENTAL signature-index maintenance
    (dedup.delta_signatures) over the same two synthetic corpus
    generations as ``dedup_corpus_diff``: old = doc_id % 10 != 0 with a
    stored signature table; new = doc_id % 13 != 0 with doc_id % 7 == 0
    textually revised. Only added/changed docs are re-shingled; every
    unchanged doc's signature row is carried from the stored table by a
    doc_id semi-join — text for the unchanged 99% (at crawl scale)
    never moves. The oracle computes the new generation's signatures
    FROM SCRATCH (the full _minhash_body_sql sig chain over the revised
    corpus), so the hash row IS the incremental == batch proof."""
    docs = _docs(spark, sf_dir)
    old = docs.where(F.col("doc_id") % 10 != 0)
    new = docs.where(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    old_sigs = D.minhash_signatures(D.shingles(old))
    return D.delta_signatures(old_sigs, D.corpus_diff(old, new), new)


def q_dedup_delta_ledger(spark, sf_dir):
    """Round 14 — the O(delta) signature LEDGER shipped end-to-end
    (dedup.sign_generation / write_generation / diff_from_ledger /
    delta_sign): the gen-0 ledger — signatures PLUS the stored
    ``md5(text)`` content hash — is MATERIALIZED to a
    generation-partitioned parquet dir once per session (the stored
    index), and the returned plan advances it to gen 1 against the SAME
    revised corpus as ``dedup_delta_signatures``: the diff joins the
    new crawl's hashes against the STORED hash column, so the old
    generation's text appears NOWHERE in the plan (census-pinned in
    tests/test_round14_ops.py — this is the production shape (1)+(3)
    the SCALE.md cost ladder measured as the condition for the O(delta)
    wall-time win). Oracle: sign gen 1 from scratch, content hash
    included."""
    from hadoop_tfidf_spark.streaming.windows import staged_source

    docs = _docs(spark, sf_dir)
    old = docs.where(F.col("doc_id") % 10 != 0)
    new = docs.where(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    ledger_root = staged_source(
        ("delta_ledger_gen0", sf_dir),
        lambda d: D.write_generation(D.sign_generation(old), d, 0),
    )
    old_sigs = D.read_generation(spark, ledger_root, 0)
    return D.delta_sign(old_sigs, new)


def q_streaming_decontaminate_bloom(spark, sf_dir):
    """Round 13 — STATELESS streaming decontamination with a PREBUILT
    broadcast Bloom filter: the benchmark folds into a 16 KiB bitmap
    ONCE (``bloom_bitmap`` — the per-benchmark-release artifact), the
    candidate corpus arrives as a 4-file stream, and every verdict is
    computed ROW-LOCALLY inside the micro-batch projection
    (``contamination_bloom_stateless``) — pure append mode with NO
    state, NO watermark, and NO stream-static join. Contrast with
    ``streaming_decontaminate`` (stream-static semi-join + a
    complete-mode doc-keyed aggregation whose state grows with hit
    docs): this is the ingest-time curation shape at 100 TB — the
    benchmark set rides the plan as a constant, state stays zero
    forever, and a benchmark refresh is a 16 KiB artifact redeploy.
    The drained verdicts must hash-match the batch bitmap replay
    verbatim (every candidate doc emitted exactly once, including
    sub-k-word docs kept by the no-evidence rule)."""
    import uuid

    from hadoop_tfidf_spark.functions.text import (
        bloom_bitmap,
        contamination_bloom_stateless,
    )
    from hadoop_tfidf_spark.streaming.windows import (
        run_to_completion,
        staged_source,
    )

    docs = load_docs(spark, f"{sf_dir}/documents.parquet")
    cand = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    bm = bloom_bitmap(bench, k=3)
    base = staged_source(
        ("documents", sf_dir, "cand4"),
        lambda p: cand.repartition(4).write.mode("overwrite").parquet(p),
        prefix="spark_graft_bloomstream_",
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(base).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    return run_to_completion(
        contamination_bloom_stateless(stream, bm, k=3, max_overlap=0.1),
        f"bloomdecon_{uuid.uuid4().hex[:8]}",
        output_mode="append",
    )


def q_streaming_ivfsq_index(spark, sf_dir):
    """STREAMING ingest for the TRAINED index tier: the IVF-SQ8 index's
    coarse centroids and vmax train ONCE from the static corpus
    (:func:`similarity.ivfsq_build` — the stored training artifacts),
    then a 4-file embedding stream is encoded by the stateless
    :func:`similarity.ivfsq_encode` projection in pure append mode —
    zero aggregation state, the trained-tier counterpart of
    ``streaming_bq_index``'s zero-training pack. The drained rows carry
    an md5 over the full byte-code sequence, so the hash row pins every
    byte of every streamed code against the batch build replay: the
    index maintained during ingest IS the index built at rest."""
    import uuid

    from hadoop_tfidf_spark.operators.similarity import (
        ivfsq_build,
        ivfsq_encode,
    )
    from hadoop_tfidf_spark.streaming.windows import (
        run_to_completion,
        staged_source,
    )

    emb = _emb(spark, sf_dir)
    _, cents, vmax = ivfsq_build(
        emb, coarse_k=IVF_K, coarse_iters=IVF_ITERS,
        units=IVF_UNITS, in_dim=64,
    )
    base = staged_source(
        ("embeddings", sf_dir, "full4"),
        lambda p: emb.repartition(4).write.mode("overwrite").parquet(p),
        prefix="spark_graft_ivfsqstream_",
    )
    packed = ivfsq_encode(
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base),
        cents,
        vmax,
        units=IVF_UNITS,
        in_dim=64,
    )
    drained = run_to_completion(
        packed, f"ivfsqidx_{uuid.uuid4().hex[:8]}", output_mode="append"
    )
    return drained.select(
        "vec_id",
        F.col("cluster").cast("bigint").alias("cluster"),
        F.md5(
            F.concat_ws(
                ",", F.transform(F.col("_sq"), lambda x: x.cast("string"))
            ).cast("binary")
        ).alias("sq_md5"),
    )


# Ordering contract: the driver's correctness gate checks only the FIRST
# 50 entries of __spark_entry__.queries() (9 core + the first 41 below).
# The window ROTATES each round (COVERAGE.md "gate-window policy") so every
# oracle-backed query's newest driver row stays fresh. Round-13 composition:
#   1) the ENTIRE 30-entry r8-row cohort — the stale-est recorded rows
#      (streaming batch twins, BPE rows, PCA/RP components, the
#      multimodal decode trio, events/asof variants), alphabetical,
#   2) the round-13 new queries (newcomers register in-window — all
#      SIX of them): text_quality_adaptive_approx, sim_topk_ivf_bulk,
#      streaming_ledger_compact, text_decontaminate_bloom,
#      dedup_delta_signatures, streaming_decontaminate_bloom,
#   3) r10-cohort fill, alphabetical (next-oldest debt; newcomers took
#      the last filler slots as they landed, as in rounds 11 and 12 —
#      doc_frequency_salted, doc_similarity_tfidf and
#      dedup_span_sliding ceded theirs to the last three round-13
#      newcomers and lead the past-cap r10 remainder).
# Everything r11/r12-green cedes its slot and rides its cohort's
# CORRECTNESS rows + LOCAL_CHECK_r12.md; past-cap entries are grouped by
# cohort freshness. The 2 structurally no-oracle entries (HLL/GK
# sketches, BLAS ulp) close the registry.
EXTENSION_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # ------------------------------------------------------------------
    # ROUND-15 GATE WINDOW (first 41 extension slots; 9 core precede).
    # Policy: rotate the stale-est driver rows in; cohorts with fresh
    # CORRECTNESS rows cede their slots. New queries register IN-window.
    # ------------------------------------------------------------------
    # -- the ENTIRE r11-cohort remainder (40 stale-est recorded rows;
    #    the VERDICT r14 rotation priority, verbatim), registry order --
    "dedup_exact_apply": q_dedup_exact_apply,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_near_canonical": q_dedup_near_canonical,
    "dedup_simhash": q_dedup_simhash,
    "events_hopping": q_events_hopping,
    "events_moving_avg": q_events_moving_avg,
    "events_sessionize": q_events_sessionize,
    "events_tumbling": q_events_tumbling,
    "multimodal_audio_decode": q_multimodal_audio_decode,
    "multimodal_audio_energy": q_multimodal_audio_energy,
    "multimodal_audio_resample": q_multimodal_audio_resample,
    "pipeline_curate": q_pipeline_curate,
    "pipeline_curate_pack": q_pipeline_curate_pack,
    "rel_pricing_summary": q_rel_pricing_summary,
    "rel_top_customers": q_rel_top_customers,
    "search_bm25": q_search_bm25,
    "search_hybrid_rrf": q_search_hybrid_rrf,
    "sim_bq_recall": q_sim_bq_recall,
    "sim_ivfsq_recall": q_sim_ivfsq_recall,
    "sim_opq_ivfpq_recall": q_sim_opq_ivfpq_recall,
    "sim_opq_recall": q_sim_opq_recall,
    "sim_pca_topk": q_sim_pca_topk,
    "sim_sq_recall": q_sim_sq_recall,
    "sim_topk_bq": q_sim_topk_bq,
    "sim_topk_ivfpq": q_sim_topk_ivfpq,
    "sim_topk_ivfpq_res": q_sim_topk_ivfpq_res,
    "sim_topk_ivfsq": q_sim_topk_ivfsq,
    "sim_topk_opq": q_sim_topk_opq,
    "sim_topk_opq_ivfpq": q_sim_topk_opq_ivfpq,
    "sim_topk_pq": q_sim_topk_pq,
    "sim_topk_sq": q_sim_topk_sq,
    "streaming_bq_index": q_streaming_bq_index,
    "streaming_phash_dedup": q_streaming_phash_dedup,
    "streaming_source_stats": q_streaming_source_stats,
    "text_ngram_freq": q_text_ngram_freq,
    "text_ngram_novelty": q_text_ngram_novelty,
    "text_quality": q_text_quality,
    "text_source_quality": q_text_source_quality,
    "text_source_stats": q_text_source_stats,
    "text_stratified_sample": q_text_stratified_sample,
    # -- sketch-twin freshening (VERDICT r14 "Next round" ¶6): the
    #    hash-gated error-envelope twin of the structurally no-oracle
    #    rel_approx_distinct, whose contract needs a current driver row --
    "rel_approx_distinct_bounds": q_rel_approx_distinct_bounds,
    # ---- past the 50-slot cap from here down ----
    # Ordered by cohort freshness: the r12 cohort, then the round-13
    # window occupants, then the round-14 window occupants (greenest
    # rows last); the 2 structurally no-oracle entries close the
    # registry. All hold green rows in their cohort's CORRECTNESS file
    # + the per-round local full drive (tools/check_correctness.py).
    # -- r12 cohort (fresh CORRECTNESS_r12 rows), alphabetical --
    "asof_last_purchase_30d": q_asof_last_purchase_30d,
    "asof_next_event": q_asof_next_event,
    "dedup_cluster_sizes": q_dedup_cluster_sizes,
    "dedup_corpus_diff": q_dedup_corpus_diff,
    "dedup_fuzzy": q_dedup_fuzzy,
    "dedup_minhash_capped": q_dedup_minhash_capped,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_semantic": q_dedup_semantic,
    "events_click_purchase": q_events_click_purchase,
    "events_interval_join": q_events_interval_join,
    "events_json_props": q_events_json_props,
    "multimodal_audio_keep": q_multimodal_audio_keep,
    "rel_acctbal_ntiles": q_rel_acctbal_ntiles,
    "rel_acctbal_rollup": q_rel_acctbal_rollup,
    "rel_event_pivot": q_rel_event_pivot,
    "rel_grouping_sets": q_rel_grouping_sets,
    "rel_lapsed_customers": q_rel_lapsed_customers,
    "rel_order_calendar": q_rel_order_calendar,
    "rel_order_gaps": q_rel_order_gaps,
    "rel_percentiles": q_rel_percentiles,
    "rel_price_bands": q_rel_price_bands,
    "rel_region_year_cube": q_rel_region_year_cube,
    "rel_repeat_customers": q_rel_repeat_customers,
    "sim_tier_frontier": q_sim_tier_frontier,
    "streaming_ivfsq_index": q_streaming_ivfsq_index,
    "streaming_knn_bq": q_streaming_knn_bq,
    "streaming_phash_dedup_update": q_streaming_phash_dedup_update,
    "streaming_source_stats_update": q_streaming_source_stats_update,
    "text_c4_filters": q_text_c4_filters,
    "text_chunk": q_text_chunk,
    "text_contamination": q_text_contamination,
    "text_cooccurrence_capped": q_text_cooccurrence_capped,
    "text_decontaminate": q_text_decontaminate,
    "text_fingerprint": q_text_fingerprint,
    "text_lm_histogram": q_text_lm_histogram,
    "text_lm_score": q_text_lm_score,
    "text_pack_sequences": q_text_pack_sequences,
    "text_pack_shuffled": q_text_pack_shuffled,
    "text_quality_adaptive": q_text_quality_adaptive,
    "text_repetition": q_text_repetition,
    "text_self_dedup": q_text_self_dedup,
    # -- round-13 window occupants (fresh CORRECTNESS_r13 rows):
    #    the full r8-row cohort, the six round-13 newcomers, and the
    #    five r10 fillers that earned r13 rows (minus the bounds twin
    #    promoted into the round-15 window above) --
    "dedup_semantic_capped": q_dedup_semantic_capped,
    "events_range_frame": q_events_range_frame,
    "events_user_extremes": q_events_user_extremes,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_resize": q_multimodal_resize,
    "sim_label_centroids": q_sim_label_centroids,
    "sim_pca_components": q_sim_pca_components,
    "sim_pca_project": q_sim_pca_project,
    "sim_recall_audit": q_sim_recall_audit,
    "sim_rp_distortion": q_sim_rp_distortion,
    "sim_topk_ivf": q_sim_topk_ivf,
    "sim_topk_pandas_bounds": q_sim_topk_pandas_bounds,
    "streaming_c4_filter": q_streaming_c4_filter,
    "streaming_decontaminate": q_streaming_decontaminate,
    "streaming_incremental_dedup": q_streaming_incremental_dedup,
    "streaming_incremental_df": q_streaming_incremental_df,
    "streaming_interval_join": q_streaming_interval_join,
    "streaming_mixture_weights": q_streaming_mixture_weights,
    "streaming_search": q_streaming_search,
    "streaming_session": q_streaming_session,
    "streaming_stateful_totals": q_streaming_stateful_totals,
    "streaming_tumbling": q_streaming_tumbling,
    "text_bpe_pairs": q_text_bpe_pairs,
    "text_bpe_vocab": q_text_bpe_vocab,
    "text_cooccurrence": q_text_cooccurrence,
    "text_mixture_bpe": q_text_mixture_bpe,
    "text_mixture_weights": q_text_mixture_weights,
    "text_pack_bpe": q_text_pack_bpe,
    "text_quality_adaptive_approx": q_text_quality_adaptive_approx,
    "sim_topk_ivf_bulk": q_sim_topk_ivf_bulk,
    "streaming_ledger_compact": q_streaming_ledger_compact,
    "text_decontaminate_bloom": q_text_decontaminate_bloom,
    "dedup_delta_signatures": q_dedup_delta_signatures,
    "streaming_decontaminate_bloom": q_streaming_decontaminate_bloom,
    "dedup_components": q_dedup_components,
    "dedup_embedding": q_dedup_embedding,
    "dedup_exact": q_dedup_exact,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "dedup_span_exact": q_dedup_span_exact,
    # -- round-14 window occupants (fresh CORRECTNESS_r14 rows): the
    #    full r10-row remainder, the four round-14 newcomers, and the
    #    r11 filler that earned an r14 row --
    "dedup_span_sliding": q_dedup_span_sliding,
    "doc_frequency_salted": q_doc_frequency_salted,
    "doc_similarity_tfidf": q_doc_similarity_tfidf,
    "events_time_rollup": q_events_time_rollup,
    "multimodal_phash": q_multimodal_phash,
    "multimodal_phash_dedup": q_multimodal_phash_dedup,
    "multimodal_phash_pairs": q_multimodal_phash_pairs,
    "pipeline_curate_semantic": q_pipeline_curate_semantic,
    "rel_customers_without_orders": q_rel_customers_without_orders,
    "rel_market_share": q_rel_market_share,
    "rel_orders_above_avg": q_rel_orders_above_avg,
    "rel_parts_with_shipments": q_rel_parts_with_shipments,
    "rel_returned_top": q_rel_returned_top,
    "rel_revenue_by_region": q_rel_revenue_by_region,
    "rel_status_priority": q_rel_status_priority,
    "sim_quantize_int8": q_sim_quantize_int8,
    "sim_recall_curve": q_sim_recall_curve,
    "sim_rp_ivfpq_recall": q_sim_rp_ivfpq_recall,
    "sim_rp_project": q_sim_rp_project,
    "sim_rp_recall": q_sim_rp_recall,
    "sim_rp_topk": q_sim_rp_topk,
    "sim_topk_brute": q_sim_topk_brute,
    "sim_topk_lsh": q_sim_topk_lsh,
    "sim_topk_rp_ivfpq": q_sim_topk_rp_ivfpq,
    "sql_tfidf_top100": q_sql_tfidf_top100,
    "streaming_dsir": q_streaming_dsir,
    "text_bpe_tokens": q_text_bpe_tokens,
    "text_bpe_tokens_holdout": q_text_bpe_tokens_holdout,
    "text_dsir": q_text_dsir,
    "text_dsir_select": q_text_dsir_select,
    "text_hash_sample": q_text_hash_sample,
    "text_lang_id": q_text_lang_id,
    "text_mixture_sample": q_text_mixture_sample,
    "text_mixture_temperature": q_text_mixture_temperature,
    "text_pii_redact": q_text_pii_redact,
    "text_token_stats": q_text_token_stats,
    "dedup_delta_ledger": q_dedup_delta_ledger,
    "sim_topk_ivfpq_bulk": q_sim_topk_ivfpq_bulk,
    "streaming_ledger_policy": q_streaming_ledger_policy,
    "sim_topk_ivf_sample": q_sim_topk_ivf_sample,
    "asof_last_purchase": q_asof_last_purchase,
    # -- structurally no-oracle (rows-only) --
    "rel_approx_distinct": q_rel_approx_distinct,
    "sim_topk_pandas": q_sim_topk_pandas,
}


# --------------------------------------------------------------------------
# DuckDB oracle SQL (driver runs these over the same parquet views)
# --------------------------------------------------------------------------

#: Shared CTE block: shingles → MinHash signatures → LSH bands → candidate
#: pairs (mirrors operators/dedup.py with k=3, 12 hashes, 4 bands × 3 rows).
#: Integer Carter–Wegman form, generated from the SAME constants the Spark
#: operator uses: base = md5(shingle)[:15 hex] mod M31, then
#: mh_h = (A[h]·base + B[h]) mod M31, band_key = polynomial combine. The
#: DISTINCT in ``shingle`` is kept for the Jaccard CTEs; min() makes it
#: irrelevant to the signatures (as on the Spark side).
from hadoop_tfidf_spark.operators.dedup import (  # noqa: E402
    BAND_KEY_K,
    DEFAULT_NUM_HASHES,
    DEFAULT_ROWS_PER_BAND,
    M31,
    MINHASH_A,
    MINHASH_B,
)

_MH_MIN_COLS = ",\n         ".join(
    f"min(({MINHASH_A[h]} * base + {MINHASH_B[h]}) % {M31}) AS mh_{h}"
    for h in range(DEFAULT_NUM_HASHES)
)
_N_BANDS = DEFAULT_NUM_HASHES // DEFAULT_ROWS_PER_BAND


def _band_key_sql(b: int) -> str:
    expr = f"mh_{DEFAULT_ROWS_PER_BAND * b}"
    for i in range(1, DEFAULT_ROWS_PER_BAND):
        expr = f"(({expr}) * {BAND_KEY_K} + mh_{DEFAULT_ROWS_PER_BAND * b + i}) % {M31}"
    return expr


_BAND_KEY_CASE = " ".join(
    f"WHEN {b} THEN {_band_key_sql(b)}" for b in range(_N_BANDS)
)

def _minhash_body_sql(source: str) -> str:
    """The shingle→signature→band→candidate CTE chain over ``source``
    (any relation with (doc_id, text)) — parameterized so composed
    pipelines (``pipeline_curate``) can run LSH over a filtered corpus."""
    return f"""words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM {source}
),
shingle AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM (
    SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
    FROM words WHERE len(w) >= 3
  )
),
sh_base AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {M31} AS base
  FROM shingle
),
sig AS (
  SELECT doc_id,
         {_MH_MIN_COLS}
  FROM sh_base GROUP BY doc_id
),
bands AS (
  SELECT doc_id, band, CASE band {_BAND_KEY_CASE} END AS band_key
  FROM sig CROSS JOIN generate_series(0, {_N_BANDS - 1}) t(band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
)
"""


_MINHASH_CTES = "WITH " + _minhash_body_sql("documents")

_SIMHASH_CTES = """
WITH tok AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
  ) WHERE word <> ''
),
dwc AS (
  SELECT doc_id, word, count(*) AS n FROM tok GROUP BY doc_id, word
),
wh AS (
  SELECT word, ('0x' || substr(md5(word), 1, 15))::BIGINT AS wh
  FROM (SELECT DISTINCT word FROM dwc)
),
contrib AS (
  SELECT doc_id, j,
         CASE WHEN ((wh >> j) & 1) = 1 THEN n ELSE -n END AS c
  FROM dwc JOIN wh USING (word) CROSS JOIN generate_series(0, 31) t(j)
),
bitsum AS (
  SELECT doc_id, j, sum(c) AS s FROM contrib GROUP BY doc_id, j
),
sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
           AS simhash
  FROM bitsum GROUP BY doc_id
)
"""

_EMB_BUCKET_EXPR = " + ".join(
    f"(CASE WHEN embedding[{d + 1}] > 0 THEN {1 << d} ELSE 0 END)" for d in range(8)
)

_SIM_CTES = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec,
         {_EMB_BUCKET_EXPR} AS bucket
  FROM embeddings
)
"""

#: Integer L2 distance between two BIGINT micro-unit lists (exact, so the
#: argmin is engine-independent; ties break to the lowest cluster id).
def _int_d2_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )


def _ivf_sql(
    query_where: str | None = None, train_where: str | None = None
) -> str:
    """Unrolled replay of the integer micro-unit IVF build+search
    (mirrors similarity.ivf_build/ivf_topk with units=IVF_UNITS): seed =
    first k vectors, then per Lloyd round an exact-integer assignment and
    a round(sum/n) centroid update (sum of BIGINTs is exact, the single
    IEEE division and round are identical in both engines), final
    assignment, integer probe of the IVF_NPROBE nearest centroids, exact
    cosine rank over the probed clusters. ``query_where`` swaps the query
    predicate (default: the 5-id gate set) — the bulk variant replays the
    SAME chain over every corpus vector, so one oracle covers both the
    driver-loop and the executor-expression probe paths. ``train_where``
    restricts the SEED and every Lloyd round's statistics to a training
    subset (mirrors ``ivf_build(train=…)``); the final assignment — and
    everything downstream — still covers the full corpus."""
    te = "te" if train_where is not None else "e"
    ctes = [
        f"""e AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {IVF_UNITS}) AS BIGINT)) AS u
  FROM embeddings
)""",
    ]
    if train_where is not None:
        ctes.append(f"""te AS (
  SELECT * FROM e WHERE {train_where}
)""")
    ctes.append(f"""cent0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, u
  FROM {te} ORDER BY vec_id LIMIT {IVF_K}
)""")
    for it in range(IVF_ITERS + 1):
        # Lloyd-round assignments (it < final) cover the TRAIN subset;
        # the final assignment covers the full corpus
        src = te if it < IVF_ITERS else "e"
        ctes.append(f"""assign{it} AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cluster, {_int_d2_sql("e.u", "c.u")} AS d2
    FROM {src} e CROSS JOIN cent{it} c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1
)""")
        if it < IVF_ITERS:
            ctes.append(f"""mean{it + 1} AS (
  SELECT cluster, list(m ORDER BY d) AS u FROM (
    SELECT cluster, d, CAST(round(sum(x) / count(*)) AS BIGINT) AS m
    FROM (
      SELECT a.cluster, generate_subscripts(e.u, 1) AS d, unnest(e.u) AS x
      FROM {src} e JOIN assign{it} a ON a.vec_id = e.vec_id
    ) GROUP BY cluster, d
  ) GROUP BY cluster
)""")
            ctes.append(f"""cent{it + 1} AS (
  SELECT c.cluster, coalesce(m.u, c.u) AS u
  FROM cent{it} c LEFT JOIN mean{it + 1} m ON m.cluster = c.cluster
)""")
    final = IVF_ITERS
    pred = query_where or f"vec_id IN ({', '.join(map(str, SIM_QUERY_IDS))})"
    ctes.append(f"""qv AS (
  SELECT vec_id AS query_id, vec AS q_vec, u AS q_u FROM e
  WHERE {pred}
)""")
    ctes.append(f"""probe AS (
  SELECT query_id, cluster FROM (
    SELECT q.query_id, c.cluster, {_int_d2_sql("q.q_u", "c.u")} AS d2
    FROM qv q CROSS JOIN cent{final} c
  ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d2, cluster)
    <= {IVF_NPROBE}
)""")
    ctes.append(f"""scored AS (
  SELECT p.query_id, a.vec_id,
         round(list_cosine_similarity(e.vec, q.q_vec), 6) AS cos_sim
  FROM assign{final} a
  JOIN probe p ON p.cluster = a.cluster
  JOIN e ON e.vec_id = a.vec_id
  JOIN qv q ON q.query_id = p.query_id
  WHERE a.vec_id <> p.query_id
)""")
    ctes.append(f"""ranked AS (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id) AS rn
  FROM scored
)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT query_id, vec_id, cos_sim, rn FROM ranked WHERE rn <= {SIM_K}"
    )


def _pq_chain_ctes(
    dim: int, prefix: str = "", e_name: str = "e", query_ids=None
) -> list[str]:
    """The PQ build + ADC CTE chain (everything after the quantized
    ``e`` relation) with every CTE name carrying ``prefix`` — so two
    chains (e.g. contiguous PQ vs the OPQ permuted space in
    ``sim_opq_recall``) can coexist in one query without name
    collisions. Expects ``{e_name}(vec_id, u)``; the final CTE is
    ``{prefix}ranked(query_id, vec_id, adc_d2, rn)``. With the default
    prefix/e_name this is byte-identical to the chain ``_pq_sql`` has
    always generated."""
    sub = dim // PQ_M
    p = prefix
    qids = ", ".join(map(str, query_ids or SIM_QUERY_IDS))
    ctes: list[str] = []
    dists = []
    for s in range(PQ_M):
        lo, hi = s * sub + 1, (s + 1) * sub
        ctes.append(f"""{p}sub{s} AS (
  SELECT vec_id, u[{lo}:{hi}] AS su FROM {e_name}
)""")
        ctes.append(f"""{p}cent{s}_0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, su AS cu
  FROM {p}sub{s} ORDER BY vec_id LIMIT {PQ_K}
)""")
        for it in range(PQ_ITERS + 1):
            ctes.append(f"""{p}assign{s}_{it} AS (
  SELECT vec_id, cluster FROM (
    SELECT b.vec_id, c.cluster, {_int_d2_sql("b.su", "c.cu")} AS d2
    FROM {p}sub{s} b CROSS JOIN {p}cent{s}_{it} c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1
)""")
            if it < PQ_ITERS:
                ctes.append(f"""{p}mean{s}_{it + 1} AS (
  SELECT cluster, list(m ORDER BY d) AS cu FROM (
    SELECT cluster, d, CAST(round(sum(x) / count(*)) AS BIGINT) AS m
    FROM (
      SELECT a.cluster, generate_subscripts(b.su, 1) AS d, unnest(b.su) AS x
      FROM {p}sub{s} b JOIN {p}assign{s}_{it} a ON a.vec_id = b.vec_id
    ) GROUP BY cluster, d
  ) GROUP BY cluster
)""")
                ctes.append(f"""{p}cent{s}_{it + 1} AS (
  SELECT c.cluster, coalesce(m.cu, c.cu) AS cu
  FROM {p}cent{s}_{it} c LEFT JOIN {p}mean{s}_{it + 1} m ON m.cluster = c.cluster
)""")
        dists.append(
            f"""SELECT q.query_id, a.vec_id, {_int_d2_sql("q.su", "c.cu")} AS d2
    FROM {p}assign{s}_{PQ_ITERS} a
    JOIN {p}cent{s}_{PQ_ITERS} c ON a.cluster = c.cluster
    CROSS JOIN (SELECT vec_id AS query_id, su FROM {p}sub{s}
                WHERE vec_id IN ({qids})) q"""
        )
    union = "\n    UNION ALL\n    ".join(dists)
    ctes.append(f"""{p}alld AS (
    {union}
)""")
    ctes.append(f"""{p}scored AS (
  SELECT query_id, vec_id, CAST(sum(d2) AS BIGINT) AS adc_d2
  FROM {p}alld WHERE vec_id <> query_id GROUP BY 1, 2
)""")
    ctes.append(f"""{p}ranked AS (
  SELECT query_id, vec_id, adc_d2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_d2, vec_id) AS rn
  FROM {p}scored
)""")
    return ctes


def _pq_sql(dim: int = 64) -> str:
    """Unrolled replay of the integer micro-unit PQ build + ADC search
    (mirrors similarity.pq_build/pq_topk with m=PQ_M, k=PQ_K,
    iters=PQ_ITERS, units=IVF_UNITS): per subspace a seeded integer
    Lloyd identical to the IVF oracle's, then the ADC distance is the
    sum over subspaces of the exact integer L2 from the query subvector
    to the centroid of each vector's code — every quantity BIGINT, so
    the hash row pins the whole compressed index."""
    ctes = [
        f"""e AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {IVF_UNITS}) AS BIGINT)) AS u
  FROM embeddings
)"""
    ]
    ctes.extend(_pq_chain_ctes(dim))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT query_id, vec_id, adc_d2, CAST(rn AS INTEGER) AS rn"
        f" FROM ranked WHERE rn <= {SIM_K}"
    )


def _micro_e_cte(vec_body: str | None = None) -> str:
    """The shared micro-unit quantization CTE ``e(vec_id, u)`` the
    SQ/IVF-SQ/BQ replays open with. ``vec_body=None`` reads the raw
    ``embeddings`` table (byte-identical to the text these replays have
    always generated); passing a ``(vec_id, vec DOUBLE[])`` relation
    body (e.g. :func:`_opq_scaled_vec_body`) retargets the whole chain
    at a derived fixture — how the tier-frontier oracle runs all six
    tiers over one corpus."""
    if vec_body is None:
        return f"""e AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {IVF_UNITS}) AS BIGINT)) AS u
  FROM embeddings
)"""
    return f"""e AS MATERIALIZED (
  SELECT vec_id,
         list_transform(vec,
                        x -> CAST(round(x * {IVF_UNITS}) AS BIGINT)) AS u
  FROM ({vec_body})
)"""


def _sq_ctes(
    budgets, vec_body: str | None = None
) -> tuple[list[str], list[str]]:
    """The INT8 scalar-quantization replay (mirrors similarity.sq_topk
    with units=IVF_UNITS over the raw embeddings): quantize to
    micro-units, derive the corpus-wide ``vmax = max |u|`` with one
    scalar aggregation, code every vector as ``floor(u·127/vmax)``
    (single IEEE double expression — identical in both engines), then
    for each candidate budget the two-stage chain: top-``b`` per query
    by exact integer L2 in CODE space, exact full-resolution integer
    L2 re-rank of those survivors. Returns ``(ctes, approx_names)``
    where ``approx_names[i]`` is the CTE holding the budget-``i``
    top-:data:`SIM_K` result ``(query_id, vec_id, d2_u, rn)``."""
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    ctes = [
        _micro_e_cte(vec_body),
        """vm AS (
  SELECT greatest(1, max(list_max(list_transform(u, x -> abs(x))))) AS vmax
  FROM e
)""",
        """c AS MATERIALIZED (
  SELECT vec_id,
         list_transform(u, x -> CAST(floor((x * 127.0) / vm.vmax)
                                     AS BIGINT)) AS sq
  FROM e, vm
)""",
    ]
    names = []
    for b in budgets:
        ctes.append(f"""cand{b} AS (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, cb.vec_id,
           {_int_d2_sql("cb.sq", "q.sq")} AS d2c
    FROM c cb CROSS JOIN (SELECT * FROM c WHERE vec_id IN ({qids})) q
    WHERE cb.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY d2c, vec_id) <= {b}
)""")
        ctes.append(f"""approx{b} AS (
  SELECT query_id, vec_id, d2_u, rn FROM (
    SELECT cand{b}.query_id, cand{b}.vec_id,
           CAST({_int_d2_sql("ec.u", "eq.u")} AS BIGINT) AS d2_u,
           row_number() OVER (PARTITION BY cand{b}.query_id
                              ORDER BY {_int_d2_sql("ec.u", "eq.u")},
                                       cand{b}.vec_id) AS rn
    FROM cand{b}
    JOIN e ec ON ec.vec_id = cand{b}.vec_id
    JOIN e eq ON eq.vec_id = cand{b}.query_id
  ) WHERE rn <= {SIM_K}
)""")
        names.append(f"approx{b}")
    return ctes, names


def _sq_topk_sql() -> str:
    """Two-stage SQ retrieval replay — the gate row for ``sim_topk_sq``
    (candidates=:data:`RP_TOPK_CANDIDATES`)."""
    ctes, names = _sq_ctes([RP_TOPK_CANDIDATES])
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT query_id, vec_id, d2_u, CAST(rn AS INTEGER) AS rn"
        f" FROM {names[0]}"
    )


def _sq_recall_sql() -> str:
    """SQ recall replay at the :data:`SQ_RECALL_BUDGETS` candidate
    budgets against the exact integer-L2 top-:data:`SIM_K` (the
    ``int_l2_topk`` chain over the same micro-units)."""
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    ctes, names = _sq_ctes(SQ_RECALL_BUDGETS)
    ctes.append(f"""exact AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, eb.vec_id,
           {_int_d2_sql("eb.u", "q.u")} AS d2
    FROM e eb CROSS JOIN (SELECT * FROM e WHERE vec_id IN ({qids})) q
    WHERE eb.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY d2, vec_id) <= {SIM_K}
)""")
    branches = []
    for b, name in zip(SQ_RECALL_BUDGETS, names):
        ctes.append(f"""hits{b} AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e SEMI JOIN {name} a
    ON a.query_id = e.query_id AND a.vec_id = e.vec_id
  GROUP BY e.query_id
)""")
        branches.append(
            f"""SELECT 'sq_c{b}' AS method, q AS query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / {float(SIM_K)}, 6) AS recall
FROM (SELECT unnest([{qids}]) AS q) LEFT JOIN hits{b} h ON h.query_id = q"""
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(branches)
    )


#: DuckDB text of the OPQ gate fixture (``_scaled_emb`` + micro-unit
#: quantization): cast to double, scale the first OPQ_HOT_DIMS dims by
#: the power-of-two OPQ_HOT_SCALE (exact in IEEE), round to units.
_OPQ_EU_CTE = f"""eu AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        (x, i) -> CAST(round(x * CASE WHEN i <= {OPQ_HOT_DIMS}
                                                      THEN {float(OPQ_HOT_SCALE)}
                                                      ELSE 1.0 END
                                             * {IVF_UNITS}) AS BIGINT)) AS u
  FROM embeddings
)"""


def _opq_perm_ctes() -> list[str]:
    """The variance-balanced permutation replay (mirrors
    similarity.opq_permutation): exact BIGINT variance numerators
    ``n·Σx² − (Σx)²`` per dimension over the first
    :data:`OPQ_SAMPLE_N` rows by id, rank descending with ties to the
    lower dimension, deal rank ``r`` to output position
    ``(r % m)·sub + r // m`` (subspace-major), then rebuild each
    vector's micro-unit list in permuted order (quantization commutes
    with the reorder, so permuting ``u`` equals quantizing the permuted
    doubles). Expects ``eu(vec_id, u)``; emits ``pe(vec_id, u)``."""
    sub = 64 // PQ_M
    return [
        f"""samp AS (
  SELECT u FROM eu ORDER BY vec_id LIMIT {OPQ_SAMPLE_N}
)""",
        """dstats AS (
  SELECT d, count(*) AS n, sum(x) AS s1, sum(x * x) AS s2 FROM (
    SELECT generate_subscripts(u, 1) - 1 AS d, unnest(u) AS x FROM samp
  ) GROUP BY d
)""",
        """rankd AS (
  SELECT d, row_number() OVER (ORDER BY n * s2 - s1 * s1 DESC, d) - 1 AS r
  FROM dstats
)""",
        f"""pmap AS (
  SELECT d AS src, (r % {PQ_M}) * {sub} + (r // {PQ_M}) AS j FROM rankd
)""",
        """pe AS MATERIALIZED (
  SELECT vec_id, list(x ORDER BY j) AS u FROM (
    SELECT xs.vec_id, pmap.j, xs.x
    FROM (SELECT vec_id, generate_subscripts(u, 1) - 1 AS d, unnest(u) AS x
          FROM eu) xs
    JOIN pmap ON pmap.src = xs.d
  ) GROUP BY vec_id
)""",
    ]


def _opq_topk_sql() -> str:
    """OPQ ADC replay: the scaled fixture, the permutation chain, then
    the standard PQ build + ADC CTEs (:func:`_pq_chain_ctes`) over the
    permuted micro-units."""
    ctes = [_OPQ_EU_CTE]
    ctes.extend(_opq_perm_ctes())
    ctes.extend(_pq_chain_ctes(64, prefix="o", e_name="pe"))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT query_id, vec_id, adc_d2, CAST(rn AS INTEGER) AS rn"
        f" FROM oranked WHERE rn <= {SIM_K}"
    )


def _opq_recall_sql() -> str:
    """Contiguous-PQ vs OPQ recall replay on the skewed fixture: the
    exact integer-L2 truth over the scaled micro-units, the contiguous
    PQ chain (prefix ``p``) straight over ``eu``, the OPQ chain
    (prefix ``o``) over the permuted ``pe`` — both via
    :func:`_pq_chain_ctes`, which exists precisely so the two can
    share one query — then per-method hit counts."""
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    ctes = [_OPQ_EU_CTE]
    ctes.extend(_opq_perm_ctes())
    ctes.extend(_pq_chain_ctes(64, prefix="p", e_name="eu"))
    ctes.extend(_pq_chain_ctes(64, prefix="o", e_name="pe"))
    ctes.append(f"""exact AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, eb.vec_id,
           {_int_d2_sql("eb.u", "q.u")} AS d2
    FROM eu eb CROSS JOIN (SELECT * FROM eu WHERE vec_id IN ({qids})) q
    WHERE eb.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY d2, vec_id) <= {SIM_K}
)""")
    branches = []
    for method, p in (("pq", "p"), ("opq", "o")):
        ctes.append(f"""{p}hits AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e SEMI JOIN (SELECT query_id, vec_id FROM {p}ranked
                          WHERE rn <= {SIM_K}) a
    ON a.query_id = e.query_id AND a.vec_id = e.vec_id
  GROUP BY e.query_id
)""")
        branches.append(
            f"""SELECT '{method}' AS method, q AS query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / {float(SIM_K)}, 6) AS recall
FROM (SELECT unnest([{qids}]) AS q) LEFT JOIN {p}hits h ON h.query_id = q"""
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(branches)
    )


#: Default DuckDB source for the ANN oracles' ``e`` CTE — overridable
#: (``e_body=``) so a replay can run over a derived relation (e.g. the
#: clustered recall-curve fixture) instead of the raw table.
DEFAULT_E_BODY = "SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings"


def _clustered_e_body() -> str:
    """DuckDB side of :func:`_clustered_emb`: the same ±AMP bit-sign
    snap (1-based indexed lambda; ``(i-1) % 4`` picks the bit) over
    ``embedding::DOUBLE[]``, unioned with the straddling query rows as
    repr'd float64 literals (exact round-trip)."""
    amp = repr(RECALL_CLUSTER_AMP)
    qvals = ",\n    ".join(
        f"({qid}, [{', '.join(repr(v) for v in vec)}]::DOUBLE[])"
        for qid, vec in _straddle_queries()
    )
    return f"""SELECT vec_id,
    list_transform(embedding::DOUBLE[], (x, i) ->
      x + CASE WHEN (CAST(vec_id % {RECALL_CLUSTER_C} AS BIGINT)
                     // ([1,2,4,8][((i - 1) % 4) + 1])) % 2 = 1
               THEN {amp}::DOUBLE ELSE -{amp}::DOUBLE END) AS vec
  FROM embeddings WHERE vec_id < {RECALL_FIXTURE_ROWS}
  UNION ALL
  SELECT * FROM (VALUES
    {qvals}) AS sq(vec_id, vec)"""


def _ivfpq_sql(
    dim: int = 64,
    residual: bool = False,
    nprobe: int = IVF_NPROBE,
    e_body: str | None = None,
    query_ids=None,
    units: int = IVF_UNITS,
    k_out: int = SIM_K,
    query_where: str | None = None,
    rerank_k: int | None = None,
) -> str:
    """Unrolled replay of IVFADC (mirrors similarity.ivfpq_topk): the
    coarse integer Lloyd of the IVF oracle (same CTE chain), the
    per-subspace integer Lloyd of the PQ oracle, the integer probe of
    the IVF_NPROBE nearest coarse cells per query, and the ADC sum
    restricted to the probed cells' members — every quantity BIGINT, so
    the hash row pins the composed index end-to-end (bit-packing is a
    Spark-side storage detail: codes round-trip through one BIGINT and
    unpack to the same integers this replay derives directly).

    ``residual=True`` replays the :func:`similarity.ivfpq_build_residual`
    index instead: the PQ chains train on and encode each vector's
    integer residual from its coarse centroid, and the per-subspace
    query distances use the query's residual wrt each PROBED cell (the
    qsub CTEs carry (query, cluster) grain) — restriction to probed
    cells falls out of the cluster join.

    ``query_where`` swaps the query predicate (``"TRUE"`` = every
    corpus vector, the bulk kNN-graph form — mirrors ``_ivf_sql``'s).
    ``rerank_k`` appends the exact full-dimension integer-L2 re-rank of
    each query's ``k_out`` ADC candidates (the two-stage bulk shape of
    ``similarity.ivfpq_bulk_topk``) — output then matches its
    ``(query_id, vec_id, d2_u, rn)``."""
    sub = dim // PQ_M
    qids = list(query_ids) if query_ids is not None else SIM_QUERY_IDS
    qpred = query_where or f"vec_id IN ({', '.join(map(str, qids))})"
    # coarse IVF chain (verbatim structure from _ivf_sql)
    ctes = [
        f"""e AS MATERIALIZED (
  SELECT vec_id, vec,
         list_transform(vec,
                        x -> CAST(round(x * {units}) AS BIGINT)) AS u
  FROM ({e_body or DEFAULT_E_BODY})
)""",
        f"""cent0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, u
  FROM e ORDER BY vec_id LIMIT {IVF_K}
)""",
    ]
    for it in range(IVF_ITERS + 1):
        ctes.append(f"""assign{it} AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cluster, {_int_d2_sql("e.u", "c.u")} AS d2
    FROM e CROSS JOIN cent{it} c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1
)""")
        if it < IVF_ITERS:
            ctes.append(f"""mean{it + 1} AS (
  SELECT cluster, list(m ORDER BY d) AS u FROM (
    SELECT cluster, d, CAST(round(sum(x) / count(*)) AS BIGINT) AS m
    FROM (
      SELECT a.cluster, generate_subscripts(e.u, 1) AS d, unnest(e.u) AS x
      FROM e JOIN assign{it} a ON a.vec_id = e.vec_id
    ) GROUP BY cluster, d
  ) GROUP BY cluster
)""")
            ctes.append(f"""cent{it + 1} AS (
  SELECT c.cluster, coalesce(m.u, c.u) AS u
  FROM cent{it} c LEFT JOIN mean{it + 1} m ON m.cluster = c.cluster
)""")
    final = IVF_ITERS
    ctes.append(f"""qv AS (
  SELECT vec_id AS query_id, u AS q_u FROM e
  WHERE {qpred}
)""")
    ctes.append(f"""probe AS (
  SELECT query_id, cluster FROM (
    SELECT q.query_id, c.cluster, {_int_d2_sql("q.q_u", "c.u")} AS d2
    FROM qv q CROSS JOIN cent{final} c
  ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d2, cluster)
    <= {nprobe}
)""")
    if residual:
        ctes.append(f"""res AS (
  SELECT e.vec_id, a.cluster,
         list_transform(generate_series(1, {dim}), i -> e.u[i] - c.u[i]) AS u
  FROM e JOIN assign{final} a ON a.vec_id = e.vec_id
  JOIN cent{final} c ON c.cluster = a.cluster
)""")
    pq_src = "res" if residual else "e"
    # per-subspace PQ chains (verbatim structure from _pq_sql)
    dists = []
    for s in range(PQ_M):
        lo, hi = s * sub + 1, (s + 1) * sub
        ctes.append(f"""sub{s} AS (
  SELECT vec_id, u[{lo}:{hi}] AS su FROM {pq_src}
)""")
        if residual:
            ctes.append(f"""qsub{s} AS (
  SELECT q.query_id, p.cluster,
         list_transform(generate_series({lo}, {hi}), i -> q.q_u[i] - c.u[i])
           AS su
  FROM qv q JOIN probe p ON p.query_id = q.query_id
  JOIN cent{final} c ON c.cluster = p.cluster
)""")
        ctes.append(f"""pcent{s}_0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, su AS cu
  FROM sub{s} ORDER BY vec_id LIMIT {PQ_K}
)""")
        for it in range(PQ_ITERS + 1):
            ctes.append(f"""passign{s}_{it} AS (
  SELECT vec_id, cluster FROM (
    SELECT b.vec_id, c.cluster, {_int_d2_sql("b.su", "c.cu")} AS d2
    FROM sub{s} b CROSS JOIN pcent{s}_{it} c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1
)""")
            if it < PQ_ITERS:
                ctes.append(f"""pmean{s}_{it + 1} AS (
  SELECT cluster, list(m ORDER BY d) AS cu FROM (
    SELECT cluster, d, CAST(round(sum(x) / count(*)) AS BIGINT) AS m
    FROM (
      SELECT a.cluster, generate_subscripts(b.su, 1) AS d, unnest(b.su) AS x
      FROM sub{s} b JOIN passign{s}_{it} a ON a.vec_id = b.vec_id
    ) GROUP BY cluster, d
  ) GROUP BY cluster
)""")
                ctes.append(f"""pcent{s}_{it + 1} AS (
  SELECT c.cluster, coalesce(m.cu, c.cu) AS cu
  FROM pcent{s}_{it} c LEFT JOIN pmean{s}_{it + 1} m ON m.cluster = c.cluster
)""")
        if residual:
            dists.append(
                f"""SELECT qs.query_id, a.vec_id, {_int_d2_sql("qs.su", "c.cu")} AS d2
    FROM passign{s}_{PQ_ITERS} a
    JOIN pcent{s}_{PQ_ITERS} c ON a.cluster = c.cluster
    JOIN res r ON r.vec_id = a.vec_id
    JOIN qsub{s} qs ON qs.cluster = r.cluster"""
            )
        else:
            dists.append(
                f"""SELECT q.query_id, a.vec_id, {_int_d2_sql("q.su", "c.cu")} AS d2
    FROM passign{s}_{PQ_ITERS} a
    JOIN pcent{s}_{PQ_ITERS} c ON a.cluster = c.cluster
    CROSS JOIN (SELECT b.vec_id AS query_id, b.su FROM sub{s} b
                JOIN qv ON qv.query_id = b.vec_id) q"""
            )
    union = "\n    UNION ALL\n    ".join(dists)
    ctes.append(f"""alld AS (
    {union}
)""")
    if residual:
        # restriction to probed cells is the qsub cluster join above
        ctes.append("""scored AS (
  SELECT query_id, vec_id, CAST(sum(d2) AS BIGINT) AS adc_d2
  FROM alld WHERE vec_id <> query_id GROUP BY 1, 2
)""")
    else:
        ctes.append(f"""cand AS (
  SELECT p.query_id, a.vec_id
  FROM assign{final} a JOIN probe p ON p.cluster = a.cluster
  WHERE a.vec_id <> p.query_id
)""")
        ctes.append("""scored AS (
  SELECT c.query_id, c.vec_id, CAST(sum(d.d2) AS BIGINT) AS adc_d2
  FROM cand c JOIN alld d
    ON d.query_id = c.query_id AND d.vec_id = c.vec_id
  GROUP BY 1, 2
)""")
    ctes.append("""ranked AS (
  SELECT query_id, vec_id, adc_d2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_d2, vec_id) AS rn
  FROM scored
)""")
    if rerank_k is None:
        return (
            "WITH "
            + ",\n".join(ctes)
            + f"\nSELECT query_id, vec_id, adc_d2, CAST(rn AS INTEGER) AS rn"
            f" FROM ranked WHERE rn <= {k_out}"
        )
    # exact full-dimension re-rank of the ADC candidate cut (mirrors
    # similarity.ivfpq_bulk_topk stage 2: integer L2 over the raw
    # quantized vectors, (d2_u, vec_id) tie-break)
    ctes.append(f"""rcand AS (
  SELECT query_id, vec_id FROM ranked WHERE rn <= {k_out}
)""")
    ctes.append(f"""rr AS (
  SELECT c.query_id, c.vec_id,
         CAST({_int_d2_sql("eq.u", "ev.u")} AS BIGINT) AS d2_u
  FROM rcand c
  JOIN e eq ON eq.vec_id = c.query_id
  JOIN e ev ON ev.vec_id = c.vec_id
)""")
    ctes.append("""rranked AS (
  SELECT query_id, vec_id, d2_u,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY d2_u, vec_id) AS rn
  FROM rr
)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT query_id, vec_id, d2_u, CAST(rn AS INTEGER) AS rn"
        f" FROM rranked WHERE rn <= {rerank_k}"
    )


def _recall_audit_sql() -> str:
    """Recall-audit replay: the full residual-IVFADC oracle runs as a
    subquery (its WITH chain shadows the outer CTEs — legal SQL), the
    brute side is the exact rounded-cosine top-k, and the true integer
    L2 comes straight from the quantized vectors; per-query aggregation
    mirrors q_sim_recall_audit column-for-column."""
    ids = ", ".join(map(str, SIM_QUERY_IDS))
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {IVF_UNITS}) AS BIGINT)) AS u
  FROM embeddings
),
approx AS (
  SELECT * FROM (
{_ivfpq_sql(residual=True)}
  )
),
brute AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(e.vec, q.q_vec), 6) DESC,
                      e.vec_id) AS rn
    FROM e CROSS JOIN (
      SELECT vec_id AS query_id, vec AS q_vec FROM e
      WHERE vec_id IN ({ids})
    ) q
    WHERE e.vec_id <> q.query_id
  ) WHERE rn <= {SIM_K}
),
pairs AS (
  SELECT a.query_id, a.vec_id, a.adc_d2,
         {_int_d2_sql("qe.u", "ve.u")} AS exact_d2,
         CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM approx a
  JOIN e qe ON qe.vec_id = a.query_id
  JOIN e ve ON ve.vec_id = a.vec_id
  LEFT JOIN brute b
    ON b.query_id = a.query_id AND b.vec_id = a.vec_id
)
SELECT query_id,
       CAST(count(*) AS BIGINT) AS n_returned,
       CAST(sum(hit) AS BIGINT) AS n_hits,
       CAST((100 * sum(hit)) // {SIM_K} AS BIGINT) AS recall_pct,
       CAST(sum(adc_d2) AS BIGINT) AS sum_adc_d2,
       CAST(sum(exact_d2) AS BIGINT) AS sum_exact_d2,
       CASE WHEN sum(exact_d2) = 0 THEN NULL
            ELSE round(CAST(sum(adc_d2) AS DOUBLE) / sum(exact_d2), 6)
       END AS adc_exact_ratio
FROM pairs GROUP BY query_id
"""


def _recall_curve_sql() -> str:
    """Recall-curve replay: one full residual-IVFADC oracle per nprobe
    operating point (each nested as a subquery — the deterministic
    Lloyd chains replay to identical centroids, so only the probe width
    differs), unioned with the nprobe tag, scored against the exact
    rounded-cosine brute top-k; mirrors q_sim_recall_curve
    column-for-column. Runs over the CLUSTERED fixture
    (:func:`_clustered_e_body`) with the straddling query ids — the
    Spark side and all three nested index replays share the same
    derived relation."""
    ids = ", ".join(map(str, RECALL_STRADDLE_IDS))
    e_body = _clustered_e_body()
    branches = "\n    UNION ALL\n    ".join(
        f"SELECT {np_} AS nprobe, query_id, vec_id FROM (\n"
        f"{_ivfpq_sql(residual=True, nprobe=np_, e_body=e_body, query_ids=RECALL_STRADDLE_IDS)}\n)"
        for np_ in RECALL_CURVE_NPROBES
    )
    return f"""
WITH e AS (
  SELECT vec_id, vec FROM ({e_body})
),
brute AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(e.vec, q.q_vec), 6) DESC,
                      e.vec_id) AS rn
    FROM e CROSS JOIN (
      SELECT vec_id AS query_id, vec AS q_vec FROM e
      WHERE vec_id IN ({ids})
    ) q
    WHERE e.vec_id <> q.query_id
  ) WHERE rn <= {SIM_K}
),
approx AS (
    {branches}
)
SELECT a.nprobe, a.query_id,
       CAST(count(*) AS BIGINT) AS n_returned,
       CAST(sum(CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       CAST((100 * sum(CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END))
            // {SIM_K} AS BIGINT) AS recall_pct
FROM approx a
LEFT JOIN brute b ON b.query_id = a.query_id AND b.vec_id = a.vec_id
GROUP BY a.nprobe, a.query_id
"""


def _bpe_chain_ctes(n_merges: int) -> list:
    """The BPE trainer replay CTE chain: ``n_merges`` rounds, each =
    pair counts over the current symbolized vocab → deterministic
    argmax (count desc, then lexicographic pair) → non-overlapping
    left-to-right merge rewrite as a ``list_reduce`` fold (the empty
    accumulator rides via ``list_prepend``; whole-element equality
    reproduces the aaaa → [aa, aa] rule) — mirrors
    ``functions.text.bpe_train`` round-for-round. Shared by the vocab
    and per-doc token-count oracles."""
    ctes = [
        """v0 AS (
  SELECT word, count(*) AS n, string_split(word, '') AS syms FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
  ) WHERE word <> '' GROUP BY word
)"""
    ]
    for i in range(n_merges):
        ctes.append(f"""p{i} AS (
  SELECT cs[j] AS l, cs[j + 1] AS r, sum(n) AS c FROM (
    SELECT n, syms AS cs, unnest(range(1, len(syms))) AS j
    FROM v{i} WHERE len(syms) >= 2
  ) GROUP BY 1, 2
)""")
        ctes.append(f"""b{i} AS (
  SELECT l, r FROM p{i} ORDER BY c DESC, l, r LIMIT 1
)""")
        ctes.append(f"""v{i + 1} AS (
  SELECT word, n,
    list_reduce(
      list_prepend(CAST([] AS VARCHAR[]), list_transform(syms, s -> [s])),
      (a, x) -> CASE WHEN len(a) > 0 AND a[len(a)] = b.l AND x[1] = b.r
                THEN list_concat(list_slice(a, 1, len(a) - 1), [b.l || b.r])
                ELSE list_concat(a, x) END
    ) AS syms
  FROM v{i}, b{i} b
)""")
    return ctes


def _bpe_vocab_sql(n_merges: int) -> str:
    return (
        "WITH "
        + ",\n".join(_bpe_chain_ctes(n_merges))
        + f"""
SELECT word, CAST(n AS BIGINT) AS n,
       CAST(len(syms) AS INTEGER) AS n_symbols,
       array_to_string(syms, ' ') AS symbols_str
FROM v{n_merges}
"""
    )


def _bpe_tokens_sql(
    n_merges: int, train_where: str = "", score_where: str = ""
) -> str:
    """Per-doc token counts under the trained tokenizer: every training
    word's post-merge symbolization lives in the final vocab CTE, so the
    per-doc count is a word-keyed LEFT join + sum with char-length
    byte-fallback for unseen words (mirrors
    ``functions.text.bpe_token_counts``). ``train_where``/``score_where``
    (SQL ``WHERE ...`` strings) carve the trainer's corpus and the
    scored corpus out of ``documents`` for the held-out deployment."""
    ctes = _bpe_chain_ctes(n_merges)
    if train_where:
        ctes[0] = ctes[0].replace(
            "FROM documents", f"FROM documents {train_where}"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents {score_where}
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(coalesce(len(v.syms), length(t.word))) AS BIGINT)
         AS n_bpe_tokens,
       CAST(sum(CASE WHEN v.syms IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_fallback_words
FROM tok t LEFT JOIN v{n_merges} v USING (word)
WHERE t.word <> ''
GROUP BY t.doc_id
"""
    )


def _pack_bpe_sql() -> str:
    """Pack replay over the nested BPE trainer chain: the per-doc count
    subquery (itself a full 4-merge replay) feeds the same md5 bucket +
    running-sum window as the whitespace pack oracle."""
    return f"""
WITH bt AS ({_bpe_tokens_sql(BPE_GATE_MERGES)}),
t AS (
  SELECT doc_id,
         ('0x' || substr(md5('0:' || doc_id), 1, 15))::BIGINT % 8 AS bucket,
         n_bpe_tokens AS n_tokens
  FROM bt
),
c AS (
  SELECT doc_id, bucket, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY bucket ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM t
)
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
       CAST(cum_before // 512 AS BIGINT) AS pack_id,
       n_tokens,
       CAST(cum_before % 512 AS BIGINT) AS offset_in_pack
FROM c
"""


def _mixture_bpe_sql() -> str:
    """Mixture replay in BPE tokens: trainer chain nested as the count
    source, then the strata aggregation + totals of the whitespace
    mixture oracle."""
    return f"""
WITH bt AS ({_bpe_tokens_sql(BPE_GATE_MERGES)}),
g AS (
  SELECT d.source, d.lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(bt.n_bpe_tokens) AS BIGINT) AS n_tokens
  FROM documents d JOIN bt USING (doc_id) GROUP BY 1, 2
),
tot AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS tt,
         CAST(count(*) AS BIGINT) AS ng
  FROM g
)
SELECT source, lang, n_docs, n_tokens,
       round(CAST(n_tokens AS DOUBLE) / tt, 6) AS token_share,
       round(CAST(tt AS DOUBLE) / (ng * n_tokens), 6) AS uniform_weight
FROM g, tot
"""


def _dsir_sql(select_top: int | None = None) -> str:
    """DSIR replay: hashed-bigram buckets (the md5 bucket idiom),
    ONE bucket aggregation with window totals, per-bucket micro-log
    ratios, per-doc BIGINT sum. ``select_top`` switches to the
    selection cut (non-target docs, logratio desc / doc_id)."""
    b, k, kb = DSIR_GATE_BUCKETS, 0.5, 0.5 * DSIR_GATE_BUCKETS
    base = f"""
WITH words AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
),
feats AS (
  SELECT doc_id, (source = '{DSIR_GATE_TARGET}') AS t,
         ('0x' || substr(md5('dsir:' || array_to_string(w[i:i+1], ' ')),
                         1, 15))::BIGINT % {b} AS bucket
  FROM (
    SELECT doc_id, source, w, unnest(generate_series(1, len(w) - 1)) AS i
    FROM words WHERE len(w) >= 2
  )
),
pb AS (
  SELECT bucket, count(*) AS n_raw,
         sum(CASE WHEN t THEN 1 ELSE 0 END) AS n_t
  FROM feats GROUP BY bucket
),
ratios AS (
  SELECT bucket,
         CAST(round((log10((n_t + {k}) / (sum(n_t) OVER () + {kb}))
                   - log10((n_raw + {k}) / (sum(n_raw) OVER () + {kb})))
                    * 1000000) AS BIGINT) AS lr_u
  FROM pb
),
scored AS (
  SELECT f.doc_id, count(*) AS n_feats,
         round(sum(r.lr_u) / 1000000.0, 6) AS dsir_logratio
  FROM feats f JOIN ratios r USING (bucket)
  GROUP BY f.doc_id
)"""
    if select_top is None:
        return base + """
SELECT d.doc_id, CAST(coalesce(s.n_feats, 0) AS BIGINT) AS n_feats,
       s.dsir_logratio
FROM documents d LEFT JOIN scored s USING (doc_id)
"""
    return base + f"""
SELECT s.doc_id, CAST(s.n_feats AS BIGINT) AS n_feats, s.dsir_logratio
FROM scored s JOIN documents d USING (doc_id)
WHERE d.source <> '{DSIR_GATE_TARGET}' AND s.dsir_logratio IS NOT NULL
ORDER BY s.dsir_logratio DESC, s.doc_id
LIMIT {select_top}
"""


def _rp_topk_sql() -> str:
    """Two-stage RP retrieval replay: the projection chain (shared text
    with ``_rp_sql``), projected lists, QUALIFY top-candidates per query
    by exact RP-space L2, then exact full-dim re-rank over the
    candidate ids. MATERIALIZED: y/e are each referenced twice."""
    od, idim, u = RP_GATE_OUT_DIM, RP_GATE_IN_DIM, RP_GATE_UNITS
    c, k = RP_TOPK_CANDIDATES, SIM_K
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    return f"""
WITH e AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {u}) AS BIGINT)) AS u
  FROM embeddings
),
s AS MATERIALIZED (
  SELECT j.j, d.d,
         CASE WHEN ('0x' || substr(md5('rp:' || j.j || ':' || d.d), 1, 15))::BIGINT % 2 = 0
              THEN 1 ELSE -1 END AS sgn
  FROM (SELECT unnest(generate_series(0, {od - 1})) AS j) j
  CROSS JOIN (SELECT unnest(generate_series(0, {idim - 1})) AS d) d
),
proj AS MATERIALIZED (
  SELECT x.vec_id, s.j, CAST(sum(s.sgn * x.xu) AS BIGINT) AS v_u
  FROM (SELECT vec_id, generate_subscripts(u, 1) - 1 AS d, unnest(u) AS xu
        FROM e) x
  JOIN s ON s.d = x.d
  GROUP BY x.vec_id, s.j
),
y AS MATERIALIZED (
  SELECT vec_id, list(v_u ORDER BY j) AS y FROM proj GROUP BY vec_id
),
cand AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, cy.vec_id,
           {_int_d2_sql("cy.y", "q.y")} AS d2rp
    FROM y cy CROSS JOIN (SELECT * FROM y WHERE vec_id IN ({qids})) q
    WHERE cy.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY d2rp, vec_id) <= {c}
)
SELECT query_id, vec_id, d2_u, CAST(rn AS INTEGER) AS rn FROM (
  SELECT cand.query_id, cand.vec_id,
         CAST({_int_d2_sql("ec.u", "eq.u")} AS BIGINT) AS d2_u,
         row_number() OVER (PARTITION BY cand.query_id
                            ORDER BY {_int_d2_sql("ec.u", "eq.u")},
                                     cand.vec_id) AS rn
  FROM cand
  JOIN e ec ON ec.vec_id = cand.vec_id
  JOIN e eq ON eq.vec_id = cand.query_id
) WHERE rn <= {k}
"""


def _rp_recall_sql() -> str:
    """Recall replay: the full two-stage chain as a CTE plus the exact
    integer ranking over all pairs, semi-joined and counted per
    query."""
    u, k = RP_GATE_UNITS, SIM_K
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    approx = _rp_topk_sql().strip()
    return f"""
WITH approx AS MATERIALIZED (
{approx}
),
e2 AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {u}) AS BIGINT)) AS u
  FROM embeddings
),
exact AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id,
           {_int_d2_sql("c.u", "q.u")} AS d2
    FROM e2 c CROSS JOIN (SELECT * FROM e2 WHERE vec_id IN ({qids})) q
    WHERE c.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d2, vec_id) <= {k}
),
hits AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e SEMI JOIN approx a
    ON a.query_id = e.query_id AND a.vec_id = e.vec_id
  GROUP BY e.query_id
)
SELECT q AS query_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / {float(k)}, 6) AS recall
FROM (SELECT unnest([{qids}]) AS q) LEFT JOIN hits h ON h.query_id = q
"""


def _rp_e_body() -> str:
    """DuckDB side of :func:`similarity.rp_ivfpq_build`'s index input:
    the corpus JL-projected to ``RP_GATE_OUT_DIM`` exact integer sums
    (same sign-matrix text as ``_rp_topk_sql``), shaped as the
    ``(vec_id, vec DOUBLE[])`` relation ``_ivfpq_sql``'s ``e`` CTE
    expects — downstream runs with ``units=1``, and ``round(x * 1)``
    of an integer-valued double is exact."""
    od, idim, u = RP_GATE_OUT_DIM, RP_GATE_IN_DIM, RP_GATE_UNITS
    return f"""SELECT vec_id, list(CAST(v_u AS DOUBLE) ORDER BY j) AS vec FROM (
    SELECT x.vec_id, s.j, CAST(sum(s.sgn * x.xu) AS BIGINT) AS v_u
    FROM (SELECT vec_id, generate_subscripts(u, 1) - 1 AS d, unnest(u) AS xu
          FROM (SELECT vec_id,
                       list_transform(embedding::DOUBLE[],
                                      x -> CAST(round(x * {u}) AS BIGINT)) AS u
                FROM embeddings)) x
    JOIN (SELECT j.j, d.d,
                 CASE WHEN ('0x' || substr(md5('rp:' || j.j || ':' || d.d), 1, 15))::BIGINT % 2 = 0
                      THEN 1 ELSE -1 END AS sgn
          FROM (SELECT unnest(generate_series(0, {od - 1})) AS j) j
          CROSS JOIN (SELECT unnest(generate_series(0, {idim - 1})) AS d) d) s
      ON s.d = x.d
    GROUP BY x.vec_id, s.j
  ) GROUP BY vec_id"""


def _rp_ivfpq_sql(candidates: int = RP_TOPK_CANDIDATES) -> str:
    """Replay of the project-then-index retrieval
    (``q_sim_topk_rp_ivfpq``): the residual-IVFADC chain
    (``_ivfpq_sql`` at ``units=1`` over the RP-projected relation,
    ``dim=RP_GATE_OUT_DIM``) as the stage-1 candidate cut of
    ``candidates`` per query, then the exact full-dimension integer
    re-rank over the candidate ids — mirrors the Spark two-stage plan
    column-for-column including both tie-breaks."""
    k, u = SIM_K, RP_GATE_UNITS
    inner = _ivfpq_sql(
        dim=RP_GATE_OUT_DIM, residual=True, nprobe=IVF_NPROBE,
        e_body=_rp_e_body(), units=1, k_out=candidates,
    )
    return f"""
WITH cand AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
{inner}
  )
),
e2 AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {u}) AS BIGINT)) AS u
  FROM embeddings
)
SELECT query_id, vec_id, d2_u, CAST(rn AS INTEGER) AS rn FROM (
  SELECT cand.query_id, cand.vec_id,
         CAST({_int_d2_sql("ec.u", "eq.u")} AS BIGINT) AS d2_u,
         row_number() OVER (PARTITION BY cand.query_id
                            ORDER BY {_int_d2_sql("ec.u", "eq.u")},
                                     cand.vec_id) AS rn
  FROM cand
  JOIN e2 ec ON ec.vec_id = cand.vec_id
  JOIN e2 eq ON eq.vec_id = cand.query_id
) WHERE rn <= {k}
"""


def _rp_ivfpq_recall_sql() -> str:
    """Recall replay for the candidate-budget sweep: the two
    compressed-index branches (shared Lloyd chains replay to identical
    centroids — only the stage-1 cut differs) plus the full-dim
    residual-IVFADC branch, each semi-joined against the exact
    integer-L2 top-k and densified over the (method x query) grid —
    mirrors ``q_sim_rp_ivfpq_recall`` column-for-column."""
    u, k = RP_GATE_UNITS, SIM_K
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    methods = [f"rp_ivfpq_c{b}" for b in RP_IVFPQ_BUDGETS] + ["ivfpq_full"]
    branches = [
        f"SELECT 'rp_ivfpq_c{b}' AS method, query_id, vec_id FROM (\n"
        f"{_rp_ivfpq_sql(candidates=b).strip()}\n)"
        for b in RP_IVFPQ_BUDGETS
    ]
    branches.append(
        "SELECT 'ivfpq_full' AS method, query_id, vec_id FROM (\n"
        f"{_ivfpq_sql(residual=True)}\n)"
    )
    approx = "\n    UNION ALL\n    ".join(branches)
    mlist = ", ".join(f"'{m}'" for m in methods)
    return f"""
WITH approx AS MATERIALIZED (
    {approx}
),
e3 AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {u}) AS BIGINT)) AS u
  FROM embeddings
),
exact AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id,
           {_int_d2_sql("c.u", "q.u")} AS d2
    FROM e3 c CROSS JOIN (SELECT * FROM e3 WHERE vec_id IN ({qids})) q
    WHERE c.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d2, vec_id) <= {k}
),
hits AS (
  SELECT a.method, e.query_id, count(*) AS n_hits
  FROM exact e JOIN approx a
    ON a.query_id = e.query_id AND a.vec_id = e.vec_id
  GROUP BY a.method, e.query_id
),
grid AS (
  SELECT m.method, CAST(q.q AS BIGINT) AS query_id
  FROM (SELECT unnest([{mlist}]) AS method) m
  CROSS JOIN (SELECT unnest([{qids}]) AS q) q
)
SELECT g.method, g.query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / {float(k)}, 6) AS recall
FROM grid g LEFT JOIN hits h
  ON h.method = g.method AND h.query_id = g.query_id
"""


def _pca_sql(project: bool = False) -> str:
    """Full replay of the integer power-iteration PCA build
    (``pca_power_build``): exact-integer covariance numerator, one
    rescale to +/-1e6, then per component 8 unrolled
    matvec -> /1e6 requantize -> unit-normalize rounds, a Rayleigh
    quotient, and integer deflation — every intermediate BIGINT, every
    float step a single shared IEEE expression. ``project`` appends the
    corpus projection instead of emitting the components."""
    k, iters, u = PCA_GATE_K, PCA_GATE_ITERS, PCA_GATE_UNITS
    ctes = [
        f"""eu AS (
  SELECT vec_id, list_transform(embedding::DOUBLE[],
                                x -> CAST(round(x * {u}) AS BIGINT)) AS u
  FROM embeddings
)""",
        """xx AS (
  SELECT vec_id, generate_subscripts(u, 1) - 1 AS d, unnest(u) AS xv FROM eu
)""",
        "nn AS (SELECT count(*) AS n FROM eu)",
        "sv AS (SELECT d, sum(xv) AS s FROM xx GROUP BY d)",
        """ss AS (
  SELECT a.d AS i, b.d AS j, sum(a.xv * b.xv) AS ssum
  FROM xx a JOIN xx b USING (vec_id) GROUP BY a.d, b.d
)""",
        """cm AS (
  SELECT ss.i, ss.j, (SELECT n FROM nn) * ss.ssum - si.s * sj.s AS m
  FROM ss JOIN sv si ON si.d = ss.i JOIN sv sj ON sj.d = ss.j
)""",
        "mm AS (SELECT max(abs(m)) AS mm FROM cm)",
        """mat0 AS (
  SELECT i, j, CAST(round(m * 1000000.0 / (SELECT mm FROM mm)) AS BIGINT) AS mv
  FROM cm
)""",
    ]
    for c in range(k):
        ctes.append(f"""v{c}_0 AS (
  SELECT d.d,
         CASE WHEN ('0x' || substr(md5('pca:{c}:' || d.d), 1, 15))::BIGINT % 2 = 0
              THEN 1000000 ELSE -1000000 END AS v
  FROM (SELECT unnest(generate_series(0, 63)) AS d) d
)""")
        for t in range(1, iters + 1):
            ctes.append(f"""ws{c}_{t} AS (
  SELECT m.i AS d, CAST(round(sum(m.mv * v.v) / 1000000.0) AS BIGINT) AS ws
  FROM mat{c} m JOIN v{c}_{t - 1} v ON v.d = m.j GROUP BY m.i
)""")
            ctes.append(
                f"n2{c}_{t} AS (SELECT sum(ws * ws) AS n2 FROM ws{c}_{t})"
            )
            ctes.append(f"""v{c}_{t} AS (
  SELECT d, CAST(round(ws * 1000000 /
                       sqrt(CAST((SELECT n2 FROM n2{c}_{t}) AS DOUBLE)))
            AS BIGINT) AS v
  FROM ws{c}_{t}
)""")
        ctes.append(f"""wf{c} AS (
  SELECT m.i AS d, CAST(round(sum(m.mv * v.v) / 1000000.0) AS BIGINT) AS ws
  FROM mat{c} m JOIN v{c}_{iters} v ON v.d = m.j GROUP BY m.i
)""")
        ctes.append(f"""lam{c} AS (
  SELECT (SELECT sum(v.v * w.ws) FROM v{c}_{iters} v JOIN wf{c} w USING (d))
         * 1000000.0
         / (SELECT sum(v * v) FROM v{c}_{iters}) AS lam
)""")
        ctes.append(f"""mat{c + 1} AS (
  SELECT m.i, m.j,
         m.mv - CAST(round((SELECT lam FROM lam{c}) * vi.v * vj.v
                           / 1000000000000.0) AS BIGINT) AS mv
  FROM mat{c} m
  JOIN v{c}_{iters} vi ON vi.d = m.i
  JOIN v{c}_{iters} vj ON vj.d = m.j
)""")
    comp_sel = "\nUNION ALL\n".join(
        f"SELECT {c} AS component, d, v, (SELECT lam FROM lam{c}) AS lam "
        f"FROM v{c}_{iters}"
        for c in range(k)
    )
    ctes.append(f"comp AS (\n{comp_sel}\n)")
    # AS MATERIALIZED: the deep mat{c} -> ws -> v chains reference each
    # other many times; DuckDB would otherwise inline them exponentially
    # (observed: thousands of parquet scans -> fd exhaustion). Each CTE
    # evaluates exactly once, like the Spark side.
    ctes = [cte.replace(" AS (", " AS MATERIALIZED (", 1) for cte in ctes]
    body = "WITH " + ",\n".join(ctes)
    if not project:
        return body + """
SELECT CAST(component AS INTEGER) AS component, CAST(d AS INTEGER) AS d,
       CAST(v AS BIGINT) AS v_u, round(lam, 6) AS lambda_q
FROM comp
"""
    return body + """
SELECT x.vec_id, CAST(c.component AS INTEGER) AS component,
       CAST(sum(x.xv * c.v) AS BIGINT) AS score_u
FROM xx x JOIN comp c ON c.d = x.d
GROUP BY x.vec_id, c.component
"""


def _rp_sql(distortion: bool = False) -> str:
    """JL projection replay: the +/-1 matrix from md5 parity over
    (seed, j, d), inputs quantized to BIGINT micro-units (the IVF
    idiom), projection = one integer sum per (vec_id, j). The
    distortion form restricts to the hash-sampled ids, rebuilds the
    projected lists, and compares exact pairwise squared distances."""
    od, idim = RP_GATE_OUT_DIM, RP_GATE_IN_DIM
    u, mod = RP_GATE_UNITS, RP_SAMPLE_MOD
    sample = (
        "\n  WHERE ('0x' || substr(md5('rpsample:' || vec_id), 1, 15))"
        f"::BIGINT % {mod} = 0"
        if distortion
        else ""
    )
    base = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {u}) AS BIGINT)) AS u
  FROM embeddings{sample}
),
s AS (
  SELECT j.j, d.d,
         CASE WHEN ('0x' || substr(md5('rp:' || j.j || ':' || d.d), 1, 15))::BIGINT % 2 = 0
              THEN 1 ELSE -1 END AS sgn
  FROM (SELECT unnest(generate_series(0, {od - 1})) AS j) j
  CROSS JOIN (SELECT unnest(generate_series(0, {idim - 1})) AS d) d
),
proj AS (
  SELECT x.vec_id, s.j, CAST(sum(s.sgn * x.xu) AS BIGINT) AS v_u
  FROM (SELECT vec_id, generate_subscripts(u, 1) - 1 AS d, unnest(u) AS xu
        FROM e) x
  JOIN s ON s.d = x.d
  GROUP BY x.vec_id, s.j
)"""
    if not distortion:
        return base + """
SELECT vec_id, CAST(j AS INTEGER) AS j, v_u FROM proj
"""
    return base + f""",
y AS (
  SELECT vec_id, list(v_u ORDER BY j) AS y FROM proj GROUP BY vec_id
),
sides AS (
  SELECT e.vec_id, e.u, y.y FROM e JOIN y USING (vec_id)
)
SELECT id_a, id_b, d2_orig_u, d2_proj_u,
       CASE WHEN d2_orig_u > 0
            THEN round(d2_proj_u / ({od} * d2_orig_u), 6)
       END AS rp_ratio
FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CAST({_int_d2_sql("a.u", "b.u")} AS BIGINT) AS d2_orig_u,
         CAST({_int_d2_sql("a.y", "b.y")} AS BIGINT) AS d2_proj_u
  FROM sides a JOIN sides b ON a.vec_id < b.vec_id
)
"""


def _semantic_dedup_sql(max_cell_size: int | None = None) -> str:
    """SemDeDup replay: the coarse integer-Lloyd chain (verbatim
    structure from ``_ivf_sql``) down to the final assignment, then the
    within-cell rounded-cosine pair test and the lowest-id-wins keep
    rule — mirrors ``similarity.semantic_dedup`` column-for-column.
    ``max_cell_size`` replays the megacell valve: oversized cells skip
    the pair test and flag ``cell_capped = 1``."""
    ctes = [
        f"""e AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {IVF_UNITS}) AS BIGINT)) AS u
  FROM embeddings
)""",
        f"""cent0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, u
  FROM e ORDER BY vec_id LIMIT {IVF_K}
)""",
    ]
    for it in range(IVF_ITERS + 1):
        ctes.append(f"""assign{it} AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cluster, {_int_d2_sql("e.u", "c.u")} AS d2
    FROM e CROSS JOIN cent{it} c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1
)""")
        if it < IVF_ITERS:
            ctes.append(f"""mean{it + 1} AS (
  SELECT cluster, list(m ORDER BY d) AS u FROM (
    SELECT cluster, d, CAST(round(sum(x) / count(*)) AS BIGINT) AS m
    FROM (
      SELECT a.cluster, generate_subscripts(e.u, 1) AS d, unnest(e.u) AS x
      FROM e JOIN assign{it} a ON a.vec_id = e.vec_id
    ) GROUP BY cluster, d
  ) GROUP BY cluster
)""")
            ctes.append(f"""cent{it + 1} AS (
  SELECT c.cluster, coalesce(m.u, c.u) AS u
  FROM cent{it} c LEFT JOIN mean{it + 1} m ON m.cluster = c.cluster
)""")
    final = IVF_ITERS
    ctes.append(f"""csize AS (
  SELECT cluster, count(*) AS csize FROM assign{final} GROUP BY cluster
)""")
    cap_pred = (
        f"\n    AND hi.csize <= {max_cell_size}"
        if max_cell_size is not None
        else ""
    )
    capped_expr = (
        f"CASE WHEN av.csize > {max_cell_size} THEN 1 ELSE 0 END"
        if max_cell_size is not None
        else "0"
    )
    ctes.append(f"""av AS (
  SELECT e.vec_id, e.vec, a.cluster, c.csize
  FROM e JOIN assign{final} a ON a.vec_id = e.vec_id
  JOIN csize c ON c.cluster = a.cluster
)""")
    ctes.append(f"""dup AS (
  SELECT hi.vec_id,
         count(*) AS n_sem_dups,
         sum(CASE WHEN lo.vec_id < hi.vec_id THEN 1 ELSE 0 END) AS n_lower
  FROM av hi JOIN av lo
    ON lo.cluster = hi.cluster AND lo.vec_id <> hi.vec_id{cap_pred}
  WHERE round(list_cosine_similarity(hi.vec, lo.vec), 6)
        >= {GATE_NEAR_DUP_COS}
  GROUP BY hi.vec_id
)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT av.vec_id,
       CAST(av.cluster AS INTEGER) AS cluster,
       CAST(coalesce(d.n_sem_dups, 0) AS BIGINT) AS n_sem_dups,
       CAST(CASE WHEN coalesce(d.n_lower, 0) = 0 THEN 1 ELSE 0 END
            AS INTEGER) AS keep,
       CAST({capped_expr} AS INTEGER) AS cell_capped
FROM av LEFT JOIN dup d ON d.vec_id = av.vec_id
"""
    )


def _pca_topk_sql(candidates: int = RP_TOPK_CANDIDATES) -> str:
    """Replay of the PCA two-stage retrieval (``q_sim_pca_topk``): the
    whole power-iteration build + corpus projection (``_pca_sql
    (project=True)``) nests as one MATERIALIZED subquery; its scalar
    (vec_id, component, score_u) rows fold to per-vector arrays, the
    candidate cut is exact integer L2 in that 4-int space, and the
    final ranking is the exact full-dimension re-rank over the raw
    micro-unit vectors — both tie-breaks mirrored."""
    k, u = SIM_K, PCA_GATE_UNITS
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    return f"""
WITH proj AS MATERIALIZED (
{_pca_sql(project=True)}
),
y AS MATERIALIZED (
  SELECT vec_id,
         list(CAST(floor(CAST(score_u AS DOUBLE) / 10000.0) AS BIGINT)
              ORDER BY component) AS y
  FROM proj GROUP BY vec_id
),
e2 AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {u}) AS BIGINT)) AS u
  FROM embeddings
),
cand AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, cy.vec_id,
           {_int_d2_sql("cy.y", "q.y")} AS d2c
    FROM y cy CROSS JOIN (SELECT * FROM y WHERE vec_id IN ({qids})) q
    WHERE cy.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY d2c, vec_id) <= {candidates}
)
SELECT query_id, vec_id, d2_u, CAST(rn AS INTEGER) AS rn FROM (
  SELECT cand.query_id, cand.vec_id,
         CAST({_int_d2_sql("ec.u", "eq.u")} AS BIGINT) AS d2_u,
         row_number() OVER (PARTITION BY cand.query_id
                            ORDER BY {_int_d2_sql("ec.u", "eq.u")},
                                     cand.vec_id) AS rn
  FROM cand
  JOIN e2 ec ON ec.vec_id = cand.vec_id
  JOIN e2 eq ON eq.vec_id = cand.query_id
) WHERE rn <= {k}
"""


def _phash_sql(final: str, grid: int = 4) -> str:
    """Analytic replay of :func:`multimodal.media_phash` over the
    synthetic payload generator (same formula text as the
    ``multimodal_decode`` oracle, frame 0 only): per doc, the
    ``grid x grid`` nearest-neighbor luminance cells
    (``gray = Σ_c (base + ((Y*h)//grid)*7 + ((X*w)//grid)*3 + c*11)
    % 256``), the strict integer mean compare ``gray·grid² > total``,
    and the bit fold into one BIGINT. ``final`` selects from the ``ph``
    (doc_id, phash) / ``dims`` (doc_id, w, h) CTEs — the three phash
    oracles share this chain verbatim."""
    g2 = grid * grid
    return f"""
WITH dims AS (
  SELECT doc_id, 4 + length(text) % 13 AS w, 4 + doc_id % 11 AS h,
         (doc_id % 256) * 31 AS base
  FROM documents
),
cells AS (
  SELECT d.doc_id,
         (y.i * {grid} + x.i) AS bit,
         ((d.base + ((y.i * d.h) // {grid}) * 7
                  + ((x.i * d.w) // {grid}) * 3) % 256)
       + ((d.base + ((y.i * d.h) // {grid}) * 7
                  + ((x.i * d.w) // {grid}) * 3 + 11) % 256)
       + ((d.base + ((y.i * d.h) // {grid}) * 7
                  + ((x.i * d.w) // {grid}) * 3 + 22) % 256) AS gray
  FROM dims d
  CROSS JOIN (SELECT unnest(generate_series(0, {grid - 1})) AS i) y
  CROSS JOIN (SELECT unnest(generate_series(0, {grid - 1})) AS i) x
),
ph AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN gray * {g2} > tot
                       THEN CAST(1 AS BIGINT) << bit ELSE 0 END)
              AS BIGINT) AS phash
  FROM (SELECT doc_id, bit, gray,
               sum(gray) OVER (PARTITION BY doc_id) AS tot
        FROM cells)
  GROUP BY doc_id
)
{final}
"""


_STOPWORD_LIST_SQL = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
_MARKER_VALUES_SQL = ", ".join(
    f"('{lang}', '{w}')" for lang, ws in LANG_MARKERS.items() for w in ws
)

EXTENSION_ORACLE_SQL: dict[str, str] = {
    "dedup_exact": """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
       count(*) AS dup_count
FROM documents GROUP BY md5(text)
""",
    "dedup_exact_apply": """
SELECT doc_id FROM (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
)
""",
    "dedup_minhash_lsh": _MINHASH_CTES + "SELECT doc_a, doc_b FROM cand",
    "dedup_minhash_capped": _MINHASH_CTES
    + f"""
, bsize AS (
  SELECT band, band_key, count(*) AS bs FROM bands GROUP BY band, band_key
),
bands_capped AS (
  SELECT bands.* FROM bands JOIN bsize USING (band, band_key)
  WHERE bs <= {GATE_LSH_BUCKET_CAP}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands_capped a
JOIN bands_capped b ON a.band = b.band AND a.band_key = b.band_key
WHERE a.doc_id < b.doc_id
""",
    "dedup_simhash": _SIMHASH_CTES + "SELECT doc_id, simhash FROM sh",
    # Candidate-then-verify fuzzy matching: exact Levenshtein over the LSH
    # candidate set (both engines' levenshtein = classic unit-cost edits).
    "dedup_fuzzy": _MINHASH_CTES
    + """
SELECT c.doc_a, c.doc_b,
       CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
FROM cand c
JOIN documents da ON da.doc_id = c.doc_a
JOIN documents db ON db.doc_id = c.doc_b
""",
    # Stratified deterministic sample: per-language keep rates over the
    # content-addressed md5 bucket (en 10%, und 50%, others 0).
    "text_stratified_sample": f"""
WITH markers(lang, word) AS (VALUES {_MARKER_VALUES_SQL}),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
hits AS (
  SELECT t.doc_id, m.lang, count(*) AS hits
  FROM tok t JOIN markers m ON t.word = m.word
  GROUP BY t.doc_id, m.lang
),
best AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang) AS rn
  FROM hits
),
lng AS (
  SELECT d.doc_id, coalesce(b.lang, 'und') AS pred_lang
  FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
),
b AS (
  SELECT doc_id, pred_lang,
         ('0x' || substr(md5('0:' || doc_id), 1, 15))::BIGINT % 100 AS bucket
  FROM lng
)
SELECT doc_id, pred_lang, bucket
FROM b
WHERE bucket < CASE pred_lang WHEN 'en' THEN 10 WHEN 'und' THEN 50 ELSE 0 END
""",
    # Corpus bigram LM with add-0.5 smoothing; per-bigram log10 rounded to
    # 6 before the mean (the `search` contract); V = distinct unigrams.
    "text_lm_score": """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
bigrams AS (
  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS bg,
         w[i] AS w1
  FROM (
    SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
    FROM words WHERE len(w) >= 2
  )
),
bg_n AS (
  SELECT bg, count(*) AS n_bg FROM bigrams GROUP BY bg
),
lead_n AS (
  SELECT w1, count(*) AS n_w1 FROM bigrams GROUP BY w1
),
vocab AS (
  SELECT count(DISTINCT word) AS v FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
  ) WHERE word <> ''
),
lp AS (
  SELECT b.doc_id,
         CAST(round(log10((bn.n_bg + 0.5) / (ln.n_w1 + 0.5 * vocab.v))
                    * 1000000) AS BIGINT) AS lp_u
  FROM bigrams b
  JOIN bg_n bn USING (bg)
  JOIN lead_n ln USING (w1)
  CROSS JOIN vocab
),
scored AS (
  SELECT doc_id, count(*) AS n_bigrams,
         round((sum(lp_u) / count(*)) / 1000000.0, 6) AS lm_score
  FROM lp GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       s.lm_score
FROM documents d LEFT JOIN scored s USING (doc_id)
""",
    # Okapi BM25 (k1=1.2, b=0.75): distinct query terms, per-term
    # contributions rounded to 6 before the sum (the `search` contract).
    "search_bm25": _CORE_CTES
    + """
, dl AS (
  SELECT doc_id, sum(n) AS dl FROM dwc GROUP BY doc_id
),
stats AS (
  SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl
),
qt AS (
  SELECT DISTINCT query_id, word FROM query_terms
),
contrib AS (
  SELECT qt.query_id, d.doc_id,
         round(ln((stats.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
             * (d.n * 2.2)
             / (d.n + 1.2 * (0.25 + 0.75 * l.dl / stats.avgdl)), 6) AS s
  FROM dwc d
  JOIN qt ON d.word = qt.word
  JOIN dfreq f ON d.word = f.word
  JOIN dl l ON d.doc_id = l.doc_id
  CROSS JOIN stats
)
SELECT query_id, doc_id, round(sum(s), 6) AS score
FROM contrib GROUP BY query_id, doc_id
""",
    # Full curation pipeline: every stage replayed in SQL over the same
    # corpus — quality + lang-id filters, exact dedup (min id per md5),
    # MinHash-LSH candidate pairs over the FILTERED corpus, 1-hop doc_b
    # drop, content-addressed split labels.
    "pipeline_curate": f"""
WITH q AS (
  SELECT doc_id,
         round(0.4 * least(len(string_split(text, ' ')) / 50.0, 1.0)
             + 0.3 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                      / length(text))
             + 0.3 * least((len(list_filter(string_split(text, ' '),
                                w -> list_contains([{_STOPWORD_LIST_SQL}], w)))
                            / len(string_split(text, ' '))) / 0.1, 1.0), 6)
           AS quality
  FROM documents
),
markers(lang, word) AS (VALUES {_MARKER_VALUES_SQL}),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
hits AS (
  SELECT t.doc_id, m.lang, count(*) AS hits
  FROM tok t JOIN markers m ON t.word = m.word
  GROUP BY t.doc_id, m.lang
),
best AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang) AS rn
  FROM hits
),
lng AS (
  SELECT d.doc_id, coalesce(b.lang, 'und') AS pred_lang
  FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
),
kept0 AS (
  SELECT d.doc_id, d.text, q.quality, lng.pred_lang
  FROM documents d JOIN q USING (doc_id) JOIN lng USING (doc_id)
  WHERE lng.pred_lang = 'en' AND q.quality >= 0.5
),
ex AS (
  SELECT min(doc_id) AS doc_id FROM kept0 GROUP BY md5(text)
),
kept1 AS (
  SELECT k.* FROM kept0 k JOIN ex USING (doc_id)
),
{_minhash_body_sql("kept1")},
kept2 AS (
  SELECT k.* FROM kept1 k
  WHERE NOT EXISTS (SELECT 1 FROM cand c WHERE c.doc_b = k.doc_id)
),
curated AS (
  SELECT doc_id, text, pred_lang, quality,
         CASE WHEN bucket < 90 THEN 'train'
              WHEN bucket < 95 THEN 'valid'
              ELSE 'test' END AS split
  FROM (
    SELECT *, ('0x' || substr(md5('0:' || doc_id), 1, 15))::BIGINT % 100 AS bucket
    FROM kept2
  )
)
SELECT doc_id, pred_lang, quality, split FROM curated
""",
    "dedup_simhash_pairs": _SIMHASH_CTES
    + """
, sb AS (
  SELECT doc_id, simhash, band, (simhash >> (band * 8)) & 255 AS band_val
  FROM sh CROSS JOIN generate_series(0, 3) t(band)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sb a JOIN sb b ON a.band = b.band AND a.band_val = b.band_val
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.simhash, b.simhash)) <= 3
""",
    "dedup_ngram_jaccard": _MINHASH_CTES
    + """
, sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM shingle GROUP BY doc_id
),
common AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN shingle sa ON sa.doc_id = c.doc_a
  JOIN shingle sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT c.doc_a, c.doc_b,
       CAST(coalesce(m.n_common, 0) AS BIGINT) AS n_common,
       CAST(za.n_sh AS BIGINT) AS n_a,
       CAST(zb.n_sh AS BIGINT) AS n_b,
       round(coalesce(m.n_common, 0) /
             (za.n_sh + zb.n_sh - coalesce(m.n_common, 0)), 6) AS jaccard
FROM cand c
LEFT JOIN common m ON m.doc_a = c.doc_a AND m.doc_b = c.doc_b
JOIN sizes za ON za.doc_id = c.doc_a
JOIN sizes zb ON zb.doc_id = c.doc_b
""",
    "dedup_embedding": _SIM_CTES
    + f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.vec, b.vec), 6) AS cos_sim
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.vec, b.vec), 6) >= {GATE_NEAR_DUP_COS}
""",
    "sim_topk_brute": _SIM_CTES
    + f"""
, q AS (
  SELECT vec_id AS query_id, vec AS q_vec FROM e
  WHERE vec_id IN ({", ".join(map(str, SIM_QUERY_IDS))})
),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(e.vec, q.q_vec), 6) AS cos_sim
  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, vec_id, cos_sim, rn FROM ranked WHERE rn <= {SIM_K}
""",
    "sim_topk_lsh": _SIM_CTES
    + f"""
, q AS (
  SELECT vec_id AS query_id, vec AS q_vec, bucket FROM e
  WHERE vec_id IN ({", ".join(map(str, SIM_QUERY_IDS))})
),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(e.vec, q.q_vec), 6) AS cos_sim
  FROM e JOIN q ON e.bucket = q.bucket WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, vec_id, cos_sim, rn FROM ranked WHERE rn <= {SIM_K}
""",
    "text_token_stats": """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+')) AS BIGINT) AS n_wordlike,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_digit_runs,
       CAST(length(text) AS BIGINT) AS n_chars,
       round(length(text) / len(string_split(text, ' ')), 6) AS mean_token_len
FROM documents
""",
    "text_quality": f"""
WITH x AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
                         w -> list_contains([{_STOPWORD_LIST_SQL}], w)))
           AS n_stop,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_chars,
         length(text) AS n_chars
  FROM documents
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_stop AS BIGINT) AS n_stopwords,
       round(n_stop / n_tokens, 6) AS stop_ratio,
       round(alpha_chars / n_chars, 6) AS alpha_ratio,
       round(0.4 * least(n_tokens / 50.0, 1.0)
           + 0.3 * (alpha_chars / n_chars)
           + 0.3 * least((n_stop / n_tokens) / 0.1, 1.0), 6) AS quality
FROM x
""",
    "text_lang_id": f"""
WITH markers(lang, word) AS (VALUES {_MARKER_VALUES_SQL}),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
hits AS (
  SELECT t.doc_id, m.lang, count(*) AS hits
  FROM tok t JOIN markers m ON t.word = m.word
  GROUP BY t.doc_id, m.lang
),
best AS (
  SELECT doc_id, lang, hits,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY hits DESC, lang) AS rn
  FROM hits
)
SELECT d.doc_id,
       coalesce(b.lang, 'und') AS pred_lang,
       CAST(coalesce(b.hits, 0) AS BIGINT) AS marker_hits
FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
""",
    "text_fingerprint": """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
shingle AS (
  SELECT doc_id, i AS pos, md5(array_to_string(w[i:i+2], ' ')) AS h
  FROM (
    SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
    FROM words WHERE len(w) >= 3
  )
),
fps AS (
  SELECT DISTINCT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM shingle
)
SELECT doc_id, count(*) AS n_fingerprints, min(fp) AS fp_min
FROM fps GROUP BY doc_id
""",
    "multimodal_decode": """
WITH d AS (
  SELECT doc_id, 4 + length(text) % 13 AS w,
         4 + doc_id % 11 AS h,
         1 + length(text) % 3 AS nf
  FROM documents
),
fr AS (SELECT doc_id, w, h, nf, unnest(range(nf)) AS f FROM d),
fy AS (SELECT doc_id, w, h, nf, f, unnest(range(h)) AS y FROM fr),
fyx AS (SELECT doc_id, w, h, nf, f, y, unnest(range(w)) AS x FROM fy),
v AS (
  SELECT doc_id, w, h, nf,
         ((doc_id % 256)*31 + f*17 + y*7 + x*3) % 256 AS r,
         ((doc_id % 256)*31 + f*17 + y*7 + x*3 + 11) % 256 AS g,
         ((doc_id % 256)*31 + f*17 + y*7 + x*3 + 22) % 256 AS b
  FROM fyx
)
SELECT doc_id,
       CAST(max(nf) * (9 + length(max(w)::VARCHAR) + length(max(h)::VARCHAR)
            + max(w)*max(h)*3) AS BIGINT) AS n_bytes,
       CAST(max(w) AS BIGINT) AS width,
       CAST(max(h) AS BIGINT) AS height,
       CAST(max(nf) AS BIGINT) AS n_frames,
       CAST(sum(r) AS BIGINT) AS sum_r,
       CAST(sum(g) AS BIGINT) AS sum_g,
       CAST(sum(b) AS BIGINT) AS sum_b
FROM v GROUP BY doc_id
""",
    "multimodal_phash": _phash_sql(
        "SELECT d.doc_id, CAST(d.w AS BIGINT) AS width,"
        " CAST(d.h AS BIGINT) AS height, p.phash"
        " FROM dims d JOIN ph p USING (doc_id)"
    ),
    "multimodal_phash_dedup": _phash_sql("""
SELECT doc_id, phash,
       CAST(CASE WHEN min(doc_id) OVER (PARTITION BY phash)
                   <> max(doc_id) OVER (PARTITION BY phash)
                 THEN 1 ELSE 0 END AS INTEGER) AS is_dup,
       CAST(CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY phash)
                 THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM ph"""),
    "multimodal_phash_pairs": _phash_sql("""
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM ph a JOIN ph b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.phash, b.phash)) <= 1"""),
    # the streaming twin drains the same ledger the batch groups yield
    "streaming_phash_dedup": _phash_sql("""
SELECT phash, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS keep_doc_id
FROM ph GROUP BY phash"""),
    # analytic replay of the WAV generator sawtooth (44-byte header +
    # 2 bytes per int16 sample; the engine side walks the RIFF chunks)
    "multimodal_audio_decode": """
WITH d AS (SELECT doc_id, length(text) AS L FROM documents),
a AS (
  SELECT doc_id, 4000 * (1 + L % 3) AS sr, 64 + doc_id % 101 AS n,
         (doc_id % 256) * 131 AS base
  FROM d
),
si AS (SELECT doc_id, sr, n, base, unnest(range(n)) AS i FROM a),
s AS (
  SELECT doc_id, sr, n, ((base + 17 * i) % 65536 - 32768) AS v FROM si
)
SELECT doc_id,
       CAST(44 + 2 * max(n) AS BIGINT) AS n_bytes,
       CAST(max(sr) AS BIGINT) AS sample_rate,
       CAST(max(n) AS BIGINT) AS n_samples,
       CAST(sum(v) AS BIGINT) AS sum_samples,
       CAST(sum(abs(v)) AS BIGINT) AS sum_abs
FROM s GROUP BY doc_id
""",
    "multimodal_audio_resample": """
WITH d AS (SELECT doc_id, length(text) AS L FROM documents),
a AS (
  SELECT doc_id, 4000 * (1 + L % 3) AS sr, 64 + doc_id % 101 AS n,
         (doc_id % 256) * 131 AS base
  FROM d
),
r AS (
  SELECT doc_id, sr, n, base,
         greatest(1, (n * 4000) // sr) AS out_n
  FROM a
),
ri AS (SELECT doc_id, sr, n, base, out_n, unnest(range(out_n)) AS i FROM r),
rv AS (
  SELECT doc_id, sr, n, out_n, i,
         ((base + 17 * ((i * n) // out_n)) % 65536 - 32768) AS v
  FROM ri
)
SELECT doc_id,
       CAST(max(sr) AS BIGINT) AS sample_rate,
       CAST(max(n) AS BIGINT) AS n_samples,
       CAST(4000 AS BIGINT) AS out_rate,
       CAST(max(out_n) AS BIGINT) AS out_samples,
       CAST(sum(v * (i + 1)) AS BIGINT) AS checksum
FROM rv GROUP BY doc_id
""",
    "rel_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    "rel_revenue_by_region": """
SELECT r.r_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       round(sum(o.o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, year(o.o_orderdate)
""",
    "rel_top_customers": """
WITH per_cust AS (
  SELECT n.n_name, c.c_custkey, c.c_name,
         round(sum(o.o_totalprice), 2) AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, c.c_custkey, c.c_name
),
ranked AS (
  SELECT n_name, c_custkey, c_name, revenue,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY revenue DESC, c_custkey) AS rnk
  FROM per_cust
)
SELECT n_name, c_custkey, c_name, revenue, rnk FROM ranked WHERE rnk <= 5
""",
    "rel_acctbal_rollup": """
SELECT coalesce(r.r_name, 'ALL') AS r_name,
       coalesce(n.n_name, 'ALL') AS n_name,
       round(sum(c.c_acctbal), 2) AS total_acctbal,
       count(*) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
    "events_tumbling": """
SELECT CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS epoch_hour,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS total_value
FROM events GROUP BY 1, 2
""",
    # Streaming twin: complete-mode drain of the whole stream = the same
    # group-by; value summed in integer micro-units (see q_streaming_tumbling).
    "streaming_tumbling": """
SELECT CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS epoch_hour,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS total_value_us
FROM events GROUP BY 1, 2
""",
    "events_sessionize": """
WITH x AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
s AS (
  SELECT user_id, ts_us, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM x
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(min(ts_us) // 1000000 AS BIGINT) AS session_start,
       count(*) AS n_events,
       round(sum(value), 6) AS total_value
FROM s GROUP BY user_id, session_id
""",
    # Streaming native session windows: gaps-and-islands with the SPLIT AT
    # >= GAP boundary (session_window merges only on strict overlap, so an
    # exact-1800s gap starts a new session — the batch twin keeps >);
    # micro-unit integer sums; micros basis like every event-time oracle.
    "streaming_session": """
WITH x AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                >= 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
s AS (
  SELECT user_id, ts_us, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM x
)
SELECT CAST(min(ts_us) // 1000000 AS BIGINT) AS session_start_s,
       user_id,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
         AS total_value_us
FROM s GROUP BY user_id, session_id
""",
    "events_json_props": """
SELECT event_type,
       count(json_extract_string(props, '$.k')) AS n_with_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS max_k
FROM events GROUP BY event_type
""",
    "asof_last_purchase": """
WITH p AS (
  SELECT user_id, epoch_us(ts) AS pts, max(value) AS pval
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, epoch_us(ts)
),
e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
)
SELECT e.event_id, e.user_id, e.ts_us, p.pval AS last_purchase_value
FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts_us >= p.pts
""",
    "rel_event_pivot": """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY user_id
""",
    "rel_region_year_cube": """
SELECT coalesce(r.r_name, 'ALL') AS r_name,
       CAST(coalesce(year(o.o_orderdate), -1) AS BIGINT) AS o_year,
       round(sum(o.o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY CUBE (r.r_name, year(o.o_orderdate))
""",
    "rel_customers_without_orders": """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND year(o.o_orderdate) = 1995)
""",
    "events_moving_avg": """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       round(avg(value) OVER w, 6) AS moving_avg,
       count(*) OVER w AS frame_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
    "rel_repeat_customers": """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
""",
    "rel_price_bands": """
WITH bands(band, lo, hi) AS (VALUES
  ('small', 0.0, 100000.0), ('medium', 100000.0, 250000.0),
  ('large', 250000.0, 600000.0))
SELECT band, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY band
""",
    "rel_order_calendar": """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
       CAST(month(o_orderdate) AS BIGINT) AS o_month,
       CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
       date_trunc('month', o_orderdate)::DATE AS month_start,
       CAST(datediff('day', DATE '1970-01-01', o_orderdate::DATE) AS BIGINT)
         AS epoch_days,
       string_split(o_orderpriority, '-')[1]::BIGINT AS prio_num,
       lower(string_split(o_orderpriority, '-')[2]) AS prio_word
FROM orders
""",
    "events_click_purchase": """
WITH c AS (
  SELECT user_id, count(*) AS n_clicks FROM events
  WHERE event_type = 'click' GROUP BY user_id
),
p AS (
  SELECT user_id, count(*) AS n_purchases, round(sum(value), 6) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT coalesce(c.user_id, p.user_id) AS user_id,
       CAST(coalesce(n_clicks, 0) AS BIGINT) AS n_clicks,
       CAST(coalesce(n_purchases, 0) AS BIGINT) AS n_purchases,
       coalesce(purchase_value, 0.0) AS purchase_value
FROM c FULL JOIN p ON c.user_id = p.user_id
""",
    "rel_lapsed_customers": """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
""",
    "text_ngram_freq": """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT array_to_string(w[i:i+1], ' ') AS ngram
  FROM (
    SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
    FROM words WHERE len(w) >= 2
  )
)
SELECT ngram, count(*) AS n FROM grams
GROUP BY ngram ORDER BY n DESC, ngram LIMIT 100
""",
    "dedup_near_canonical": _MINHASH_CTES
    + """
SELECT d.doc_id, coalesce(min(c.doc_a), d.doc_id) AS canonical_id
FROM documents d LEFT JOIN cand c ON c.doc_b = d.doc_id
GROUP BY d.doc_id
""",
    # histogram over the 1-hop canonicalization above
    "dedup_cluster_sizes": _MINHASH_CTES
    + """
, canon AS (
  SELECT d.doc_id, coalesce(min(c.doc_a), d.doc_id) AS canonical_id
  FROM documents d LEFT JOIN cand c ON c.doc_b = d.doc_id
  GROUP BY d.doc_id
),
sizes AS (
  SELECT canonical_id, CAST(count(*) AS BIGINT) AS cluster_size
  FROM canon GROUP BY 1
)
SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(cluster_size) AS BIGINT) AS n_docs
FROM sizes GROUP BY 1
""",
    # transitive closure as a recursive CTE: reach(d, r) = r reachable from
    # d over the undirected candidate graph; canonical = min reachable.
    # UNION (not UNION ALL) dedups per iteration, guaranteeing termination.
    "dedup_components": _MINHASH_CTES.replace("WITH words", "WITH RECURSIVE words")
    + """
, edges AS (
  SELECT doc_a AS u, doc_b AS v FROM cand
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM cand
),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id AS r FROM documents
  UNION
  SELECT reach.doc_id, e.v AS r FROM reach JOIN edges e ON reach.r = e.u
)
SELECT doc_id, min(r) AS canonical_id FROM reach GROUP BY doc_id
""",
    "rel_grouping_sets": """
SELECT coalesce(r_name, 'ALL') AS r_name,
       coalesce(c_mktsegment, 'ALL') AS c_mktsegment,
       round(sum(c_acctbal), 2) AS total_acctbal,
       count(*) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY GROUPING SETS ((r_name), (c_mktsegment), (r_name, c_mktsegment))
""",
    "rel_order_gaps": """
SELECT o_custkey, o_orderkey,
       row_number() OVER w AS order_seq,
       epoch(o_orderdate)::BIGINT - lag(epoch(o_orderdate)::BIGINT) OVER w AS gap_s,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS UNBOUNDED PRECEDING), 2) AS running_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    "rel_acctbal_ntiles": """
WITH t AS (
  SELECT n_name, c_acctbal,
         ntile(4) OVER (PARTITION BY n_name ORDER BY c_acctbal, c_custkey) AS quartile
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT n_name, quartile, count(*) AS n_customers,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal
FROM t GROUP BY n_name, quartile
""",
    "rel_percentiles": """
SELECT l_returnflag, count(*) AS n_items,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS price_p50,
       round(quantile_cont(l_extendedprice, 0.9), 6) AS price_p90
FROM lineitem GROUP BY l_returnflag
""",
    "events_hopping": """
WITH h AS (
  SELECT unnest([epoch_ns(ts) // 1800000000000,
                 epoch_ns(ts) // 1800000000000 - 1]) AS hop_id,
         event_type, value
  FROM events
)
SELECT hop_id * 1800 AS window_start_s, event_type,
       count(*) AS n_events, round(sum(value), 6) AS total_value
FROM h GROUP BY hop_id, event_type
""",
    "rel_parts_with_shipments": """
SELECT p_partkey, p_brand, p_type FROM part p
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey AND year(l_shipdate) = 1995
)
""",
    "asof_last_purchase_30d": """
WITH p AS (
  SELECT user_id, epoch_us(ts) AS pts, max(value) AS pval
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, epoch_us(ts)
),
e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
)
SELECT e.event_id, e.user_id, e.ts_us,
       CASE WHEN p.pts >= e.ts_us - 2592000000000
            THEN p.pval END AS recent_purchase_value
FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts_us >= p.pts
""",
    "streaming_incremental_df": """
SELECT word, count(DISTINCT doc_id) AS df FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
) WHERE word <> '' GROUP BY word
""",
    "multimodal_resize": """
WITH d AS (
  SELECT doc_id,
         4 + length(text) % 13 AS w,
         4 + doc_id % 11 AS h,
         least(4 + length(text) % 13, 8) AS ow,
         least(4 + doc_id % 11, 8) AS oh
  FROM documents
),
oy AS (SELECT doc_id, w, h, ow, oh, unnest(range(oh)) AS yo FROM d),
ox AS (SELECT doc_id, w, h, ow, oh, yo, unnest(range(ow)) AS xo FROM oy),
px AS (
  SELECT doc_id, w, h, ow, oh,
         (yo * h) // oh AS ys, (xo * w) // ow AS xs,
         (yo * ow + xo) * 3 AS ob
  FROM ox
),
v AS (
  SELECT doc_id, w, h, ow, oh,
         (((doc_id % 256)*31 + ys*7 + xs*3) % 256) * (ob + 1)
       + (((doc_id % 256)*31 + ys*7 + xs*3 + 11) % 256) * (ob + 2)
       + (((doc_id % 256)*31 + ys*7 + xs*3 + 22) % 256) * (ob + 3) AS contrib
  FROM px
)
SELECT doc_id,
       CAST(max(w) AS BIGINT) AS width,
       CAST(max(h) AS BIGINT) AS height,
       CAST(max(ow) AS BIGINT) AS out_width,
       CAST(max(oh) AS BIGINT) AS out_height,
       CAST(sum(contrib) AS BIGINT) AS checksum
FROM v GROUP BY doc_id
""",
    "multimodal_frames": """
WITH d AS (
  SELECT doc_id,
         4 + length(text) % 13 AS w,
         4 + doc_id % 11 AS h,
         1 + length(text) % 3 AS nf
  FROM documents
),
fidx AS (
  SELECT DISTINCT doc_id, w, h, (k.k * nf) // 3 AS frame_idx
  FROM d CROSS JOIN (SELECT unnest([0, 1, 2]) AS k) k
),
fy AS (SELECT doc_id, w, h, frame_idx, unnest(range(h)) AS y FROM fidx),
fyx AS (SELECT doc_id, w, h, frame_idx, y, unnest(range(w)) AS x FROM fy),
v AS (
  SELECT doc_id, frame_idx,
         ((y*w + x)*3 + 1) * (((doc_id % 256)*31 + frame_idx*17 + y*7 + x*3) % 256)
       + ((y*w + x)*3 + 2) * (((doc_id % 256)*31 + frame_idx*17 + y*7 + x*3 + 11) % 256)
       + ((y*w + x)*3 + 3) * (((doc_id % 256)*31 + frame_idx*17 + y*7 + x*3 + 22) % 256)
         AS contrib
  FROM fyx
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(sum(contrib) AS BIGINT) AS frame_checksum
FROM v GROUP BY doc_id, frame_idx
""",
    "doc_frequency_salted": """
SELECT word, count(DISTINCT doc_id) AS df FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
) WHERE word <> '' GROUP BY word
""",
    "sql_tfidf_top100": """
WITH tokens AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
  ) WHERE word <> ''
),
dwc AS (SELECT word, doc_id, count(*) AS n FROM tokens GROUP BY word, doc_id),
dfreq AS (SELECT word, count(*) AS df FROM dwc GROUP BY word),
ndocs AS (SELECT count(*) AS num_docs FROM documents)
SELECT word, doc_id,
       round((1.0 + log10(n)) * log10(1.0 + floor(num_docs / df)), 6) AS tfidf
FROM dwc JOIN dfreq USING (word) CROSS JOIN ndocs
ORDER BY tfidf DESC, word, doc_id
LIMIT 100
""",
    "events_time_rollup": """
SELECT coalesce(epoch_day, -1) AS epoch_day,
       coalesce(epoch_hour, -1) AS epoch_hour,
       count(*) AS n_events,
       round(sum(value), 6) AS total_value
FROM (
  SELECT CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS epoch_day,
         CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS epoch_hour,
         value
  FROM events
)
GROUP BY ROLLUP (epoch_day, epoch_hour)
""",
    "streaming_stateful_totals": """
SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS total_value
FROM events GROUP BY user_id
""",
    "streaming_incremental_dedup": _MINHASH_CTES + "SELECT doc_a, doc_b FROM cand",
    # idf maintained incrementally == idf computed at rest, so the oracle
    # is the batch search oracle verbatim
    "streaming_search": _CORE_CTES
    + "SELECT query_id, doc_id, score FROM search_rel",
    "sim_topk_ivf": _ivf_sql(),
    "sim_topk_ivf_bulk": _ivf_sql(query_where="TRUE"),
    # sample-trained build: seed + Lloyd stats restricted to the
    # deterministic ~2/3 subset, final assignment + search over the
    # full corpus (mirrors ivf_build(train=...))
    "sim_topk_ivf_sample": _ivf_sql(
        train_where=f"vec_id % {IVF_TRAIN_MOD} <> {IVF_TRAIN_MOD - 1}"
    ),
    "sim_topk_pq": _pq_sql(),
    "sim_topk_ivfpq": _ivfpq_sql(),
    "sim_topk_ivfpq_res": _ivfpq_sql(residual=True),
    # bulk compressed kNN graph: the residual chain over EVERY corpus
    # vector as query, ADC candidate cut at IVFPQ_BULK_CAND, exact
    # full-dim integer-L2 re-rank to SIM_K (mirrors ivfpq_bulk_topk's
    # two stages including both tie-breaks)
    "sim_topk_ivfpq_bulk": _ivfpq_sql(
        residual=True,
        query_where="TRUE",
        k_out=IVFPQ_BULK_CAND,
        rerank_k=SIM_K,
    ),
    "sim_recall_audit": _recall_audit_sql(),
    "sim_recall_curve": _recall_curve_sql(),
    "dedup_semantic": _semantic_dedup_sql(),
    "dedup_semantic_capped": _semantic_dedup_sql(GATE_SEM_CELL_CAP),
    "text_bpe_vocab": _bpe_vocab_sql(BPE_GATE_MERGES),
    "text_bpe_tokens": _bpe_tokens_sql(BPE_GATE_MERGES),
    "text_bpe_tokens_holdout": _bpe_tokens_sql(
        BPE_GATE_MERGES,
        train_where=(
            "WHERE ('0x' || substr(md5('bpeho:' || doc_id), 1, 15))"
            "::BIGINT % 2 = 0"
        ),
        score_where=(
            "WHERE ('0x' || substr(md5('bpeho:' || doc_id), 1, 15))"
            "::BIGINT % 2 = 1"
        ),
    ),
    "text_pack_bpe": _pack_bpe_sql(),
    "text_mixture_bpe": _mixture_bpe_sql(),
    "text_dsir": _dsir_sql(),
    "streaming_dsir": _dsir_sql(),
    "text_dsir_select": _dsir_sql(select_top=100),
    "sim_rp_project": _rp_sql(),
    "sim_rp_distortion": _rp_sql(distortion=True),
    "sim_rp_topk": _rp_topk_sql(),
    "sim_topk_rp_ivfpq": _rp_ivfpq_sql(),
    "sim_rp_ivfpq_recall": _rp_ivfpq_recall_sql(),
    "sim_rp_recall": _rp_recall_sql(),
    "sim_pca_components": _pca_sql(),
    "sim_pca_project": _pca_sql(project=True),
    "sim_pca_topk": _pca_topk_sql(),
    "text_bpe_pairs": """
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
wc AS (
  SELECT word, count(*) AS n FROM w WHERE word <> '' GROUP BY word
),
ch AS (
  SELECT word, n, string_split(word, '') AS cs FROM wc
  WHERE length(word) >= 2
),
idx AS (
  SELECT n, cs, unnest(range(1, len(cs))) AS i FROM ch
)
SELECT cs[i] AS left_sym, cs[i + 1] AS right_sym,
       CAST(sum(n) AS BIGINT) AS pair_count
FROM idx GROUP BY 1, 2
ORDER BY pair_count DESC, left_sym, right_sym
LIMIT 100
""",
    # Envelope oracles: exact values recomputed independently; the
    # in-bounds flags are asserted literally — the Spark side must deliver
    # sketch/BLAS results inside their error contracts to hash-match.
    "rel_approx_distinct_bounds": """
SELECT l_returnflag,
       count(*) AS n_items,
       count(DISTINCT l_partkey) AS exact_parts,
       CAST(1 AS BIGINT) AS hll_ok,
       CAST(1 AS BIGINT) AS p50_ok,
       CAST(1 AS BIGINT) AS p95_ok,
       CAST(1 AS BIGINT) AS p99_ok
FROM lineitem GROUP BY l_returnflag
""",
    "sim_topk_pandas_bounds": _SIM_CTES
    + f"""
, q AS (
  SELECT vec_id AS query_id, vec AS q_vec FROM e
  WHERE vec_id IN ({", ".join(map(str, SIM_QUERY_IDS))})
),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(e.vec, q.q_vec), 6) AS cos_sim
  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, vec_id, cos_sim, rn, CAST(1 AS BIGINT) AS blas_ok
FROM ranked WHERE rn <= {SIM_K}
""",
    "text_hash_sample": """
WITH b AS (
  SELECT doc_id,
         ('0x' || substr(md5('0:' || doc_id), 1, 15))::BIGINT % 100 AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'valid'
            ELSE 'test' END AS split
FROM b WHERE bucket < 10
""",
    "sim_quantize_int8": """
WITH s AS (
  SELECT vec_id, embedding,
         len(embedding) AS dim,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
           AS scale
  FROM embeddings
),
q AS (
  SELECT vec_id, dim, scale,
         CASE WHEN scale > 0
              THEN list_transform(embedding,
                     x -> CAST(round(CAST(x AS DOUBLE) / scale) AS BIGINT))
              ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS qvec
  FROM s
)
SELECT vec_id, CAST(dim AS BIGINT) AS dim, round(scale, 6) AS scale,
       CAST(list_sum(qvec) AS BIGINT) AS qsum,
       CAST(list_max(qvec) AS BIGINT) AS qmax
FROM q
""",
    "rel_market_share": """
WITH per_nation AS (
  SELECT r.r_name, n.n_name,
         CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         sum(o.o_totalprice) AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name, year(o.o_orderdate)
)
SELECT r_name, n_name, o_year,
       round(revenue, 2) AS revenue,
       round(revenue / sum(revenue) OVER (PARTITION BY r_name, o_year), 6)
         AS share
FROM per_nation
""",
    "rel_status_priority": """
SELECT o.o_orderstatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1994-01-01'
  AND l.l_shipdate < TIMESTAMP '1996-01-01'
GROUP BY o.o_orderstatus
""",
    "rel_returned_top": """
SELECT c.c_custkey, c.c_name, n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS lost_revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY lost_revenue DESC, c.c_custkey
LIMIT 20
""",
    "events_range_frame": """
WITH e AS (
  SELECT event_id, user_id, value,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_s
  FROM events
)
SELECT event_id, user_id, ts_s,
       round(sum(value) OVER w, 6) AS trailing_sum,
       count(*) OVER w AS trailing_n
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
""",
    "events_user_extremes": """
WITH rk AS (
  SELECT user_id, event_type, value, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id DESC) AS rmax,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value ASC, event_id ASC) AS rmin
  FROM events
)
SELECT user_id,
       max(CASE WHEN rmax = 1 THEN event_type END) AS top_event_type,
       max(CASE WHEN rmin = 1 THEN event_type END) AS bottom_event_type,
       round(max(value), 6) AS max_value,
       round(min(value), 6) AS min_value,
       count(*) AS n_events
FROM rk GROUP BY user_id
""",
    "rel_orders_above_avg": """
WITH a AS (
  SELECT o_custkey, avg(o_totalprice) AS cust_avg FROM orders GROUP BY o_custkey
)
SELECT o.o_custkey, o.o_orderkey,
       round(o.o_totalprice, 2) AS o_totalprice,
       round(a.cust_avg, 6) AS cust_avg
FROM orders o JOIN a ON o.o_custkey = a.o_custkey
WHERE o.o_totalprice > a.cust_avg
""",
    "asof_next_event": """
WITH r AS (
  SELECT user_id, epoch_us(ts) AS ets_us, min(event_id) AS next_event_id
  FROM events GROUP BY user_id, epoch_us(ts)
)
SELECT o.o_orderkey, o.o_custkey AS user_id,
       CAST(arg_min(r.next_event_id, r.ets_us) AS BIGINT) AS next_event_id
FROM orders o
LEFT JOIN r ON r.user_id = o.o_custkey
           AND r.ets_us >= epoch_us(o.o_orderdate::TIMESTAMP)
GROUP BY o.o_orderkey, o.o_custkey
""",
    "text_cooccurrence": """
WITH toks AS (
  SELECT DISTINCT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE w <> ''
)
SELECT a.w AS w1, b.w AS w2, count(*) AS n
FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.w < b.w
GROUP BY a.w, b.w
ORDER BY n DESC, w1, w2
LIMIT 100
""",
    # Capped variant: keep each doc's first GATE_COOC_VOCAB_CAP (25)
    # distinct tokens in DOCUMENT order (Spark: slice on array_distinct,
    # which preserves first-occurrence order; here: rank by first index)
    "text_cooccurrence_capped": """
WITH tok AS (
  SELECT doc_id, w, i FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w,
           generate_subscripts(
             list_filter(string_split(text, ' '), x -> x <> ''), 1) AS i
    FROM documents
  )
),
firsts AS (
  SELECT doc_id, w, min(i) AS first_i FROM tok GROUP BY 1, 2
),
capped AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, w,
           row_number() OVER (PARTITION BY doc_id ORDER BY first_i) AS rn
    FROM firsts
  ) WHERE rn <= 25
)
SELECT a.w AS w1, b.w AS w2, count(*) AS n
FROM capped a JOIN capped b ON a.doc_id = b.doc_id AND a.w < b.w
GROUP BY a.w, b.w
ORDER BY n DESC, w1, w2
LIMIT 100
""",
    "events_interval_join": """
WITH c AS (
  SELECT event_id AS click_id, user_id,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS click_s
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT event_id AS purchase_id, user_id,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS purchase_s, value
  FROM events WHERE event_type = 'purchase'
)
SELECT c.click_id, p.purchase_id, c.user_id,
       CAST(p.purchase_s - c.click_s AS BIGINT) AS lag_s,
       round(p.value, 6) AS purchase_value
FROM c JOIN p ON c.user_id = p.user_id
             AND p.purchase_s >= c.click_s
             AND p.purchase_s <= c.click_s + 1800
""",
    # Streaming twin emits exactly the batch pair set (whole-second band
    # on both sides by construction; inner-join pairs emitted once each).
    "streaming_interval_join": """
WITH c AS (
  SELECT event_id AS click_id, user_id,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS click_s
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT event_id AS purchase_id, user_id,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS purchase_s, value
  FROM events WHERE event_type = 'purchase'
)
SELECT c.click_id, p.purchase_id, c.user_id,
       CAST(p.purchase_s - c.click_s AS BIGINT) AS lag_s,
       round(p.value, 6) AS purchase_value
FROM c JOIN p ON c.user_id = p.user_id
             AND p.purchase_s >= c.click_s
             AND p.purchase_s <= c.click_s + 1800
""",
    "doc_similarity_tfidf": _CORE_CTES + """
, norms AS (
  SELECT doc_id, sqrt(sum(tfidf * tfidf)) AS nrm
  FROM tfidf_rel GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         sum(a.tfidf * b.tfidf) AS dot
  FROM tfidf_rel a JOIN tfidf_rel b
    ON a.word = b.word AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT d.doc_a, d.doc_b,
       round(d.dot / (na.nrm * nb.nrm), 6) AS cos_sim
FROM dots d
JOIN norms na ON d.doc_a = na.doc_id
JOIN norms nb ON d.doc_b = nb.doc_id
ORDER BY cos_sim DESC, d.doc_a, d.doc_b
LIMIT 100
""",
    "text_contamination": """
WITH cand AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM (
    SELECT doc_id, string_split(text, ' ') AS w,
           unnest(generate_series(1, len(string_split(text, ' ')) - 2)) AS i
    FROM documents
    WHERE doc_id % 10 != 0 AND len(string_split(text, ' ')) >= 3
  )
),
bench AS (
  SELECT DISTINCT array_to_string(w[i:i+2], ' ') AS shingle
  FROM (
    SELECT string_split(text, ' ') AS w,
           unnest(generate_series(1, len(string_split(text, ' ')) - 2)) AS i
    FROM documents
    WHERE doc_id % 10 = 0 AND len(string_split(text, ' ')) >= 3
  )
)
SELECT c.doc_id,
       count(*) AS n_shingles,
       CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       round(CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS overlap_ratio
FROM cand c LEFT JOIN bench b ON c.shingle = b.shingle
GROUP BY c.doc_id
""",
    "text_chunk": """
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
  FROM documents
),
starts AS (
  SELECT doc_id, words,
         generate_subscripts(generate_series(1, len(words), 32), 1) AS chunk_id,
         unnest(generate_series(1, len(words), 32)) AS s
  FROM w WHERE len(words) > 0
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(len(words[s:s+31]) AS BIGINT) AS n_tokens,
       array_to_string(words[s:s+31], ' ') AS chunk_text
FROM starts
""",
    # Repetition: duplicate-word / duplicate-k-gram ratios; the <k-word
    # LEFT-JOIN null mirrors the Spark-side WHEN guard
    "text_repetition": """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, count(*) AS n_grams,
         count(DISTINCT g) AS n_distinct_grams
  FROM (
    SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g
    FROM (
      SELECT doc_id, string_split(text, ' ') AS w,
             unnest(generate_series(1, len(string_split(text, ' ')) - 2)) AS i
      FROM documents WHERE len(string_split(text, ' ')) >= 3
    )
  ) GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.t) AS BIGINT) AS n_words,
       CAST(len(list_distinct(t.t)) AS BIGINT) AS n_distinct_words,
       CASE WHEN len(t.t) > 0
            THEN round(1.0 - len(list_distinct(t.t)) / len(t.t), 6)
       END AS word_dup_ratio,
       CAST(coalesce(g.n_grams, 0) AS BIGINT) AS n_grams,
       CASE WHEN g.n_grams IS NOT NULL
            THEN round(1.0 - g.n_distinct_grams / g.n_grams, 6)
       END AS gram_dup_ratio
FROM toks t LEFT JOIN grams g ON g.doc_id = t.doc_id
""",
    "text_pii_redact": r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(text,
         '\d{3}[-.]\d{3,4}[-.]\d{4}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '\d{3}[-.]\d{3,4}[-.]\d{4}', '<PHONE>', 'g')) AS clean_md5
FROM documents
""",
    # Span-granularity exact dedup: 5-word stride-5 spans, dup = exact
    # span text in ≥2 distinct docs (join on md5 like the Spark side)
    "dedup_span_exact": """
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
  FROM documents
),
sp AS (
  SELECT doc_id,
         generate_subscripts(generate_series(1, len(words), 5), 1) AS chunk_idx,
         unnest(generate_series(1, len(words), 5)) AS s, words
  FROM w WHERE len(words) > 0
),
spans AS (
  SELECT doc_id, chunk_idx, array_to_string(words[s:s+4], ' ') AS span FROM sp
),
dup AS (
  SELECT md5(span) AS h FROM spans GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
),
kept AS (
  SELECT s.doc_id, s.chunk_idx, s.span
  FROM spans s LEFT JOIN dup d ON md5(s.span) = d.h
  WHERE d.h IS NULL
),
re AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(span, ' ' ORDER BY chunk_idx) AS clean_text
  FROM kept GROUP BY 1
),
ns AS (SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY 1)
SELECT w.doc_id,
       CAST(coalesce(ns.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(ns.n_spans, 0) - coalesce(re.n_kept, 0) AS BIGINT)
         AS n_dup_spans,
       coalesce(re.clean_text, '') AS clean_text
FROM w LEFT JOIN ns ON ns.doc_id = w.doc_id
LEFT JOIN re ON re.doc_id = w.doc_id
""",
    # Sliding 5-word spans every 2 words (full width; short docs = one
    # short span); a WORD drops iff any duplicated span covers it
    "dedup_span_sliding": """
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
  FROM documents
),
sp AS (
  SELECT doc_id,
         unnest(generate_series(1, greatest(len(words) - 4, 1), 2)) AS s,
         words
  FROM w WHERE len(words) > 0
),
spans AS (
  SELECT doc_id, s, array_to_string(words[s:s+4], ' ') AS span FROM sp
),
dup AS (
  SELECT md5(span) AS h FROM spans GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
),
tagged AS (
  SELECT sx.doc_id, sx.s,
         CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END AS is_dup
  FROM spans sx LEFT JOIN dup d ON md5(sx.span) = d.h
),
cnt AS (
  SELECT doc_id, count(*) AS n_spans, sum(is_dup) AS n_dup_spans
  FROM tagged GROUP BY 1
),
wp AS (
  SELECT doc_id, unnest(words) AS word, generate_subscripts(words, 1) AS i
  FROM w WHERE len(words) > 0
),
keepw AS (
  SELECT wp.doc_id, wp.i, wp.word
  FROM wp
  WHERE NOT EXISTS (
    SELECT 1 FROM tagged t
    WHERE t.doc_id = wp.doc_id AND t.is_dup = 1
      AND t.s <= wp.i AND wp.i <= t.s + 4
  )
),
re AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY i) AS clean_text
  FROM keepw GROUP BY 1
)
SELECT w.doc_id,
       CAST(coalesce(cnt.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(cnt.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       coalesce(re.clean_text, '') AS clean_text
FROM w LEFT JOIN cnt ON cnt.doc_id = w.doc_id
LEFT JOIN re ON re.doc_id = w.doc_id
""",
    # C4/Gopher-style quality rules; thresholds mirror
    # text.c4_quality_filters defaults; flags cast to INT on both sides.
    # Zero-word docs emit a keep=0 verdict row (NULL ratios, flags 0) —
    # coalesce mirrors the Spark side's NULL-comparison guard.
    "text_c4_filters": """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
),
s AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
         CASE WHEN len(w) > 0 THEN
           round(CAST(len(array_to_string(w, '')) AS DOUBLE) / len(w), 6)
         END AS mean_word_len,
         CASE WHEN len(w) > 0 THEN
           round(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6)
         END AS word_dup_ratio,
         CASE WHEN len(w) > 0 THEN
           round(CAST(len(list_filter(w, x -> x IN
             ('the','a','an','of','and','or','is','to','in','it')))
             AS DOUBLE) / len(w), 6)
         END AS stop_ratio
  FROM t
)
SELECT doc_id, n_words, mean_word_len, word_dup_ratio, stop_ratio,
       CAST(n_words BETWEEN 20 AND 80 AS INTEGER) AS pass_len,
       CAST(coalesce(mean_word_len BETWEEN 3.0 AND 10.0, false)
            AS INTEGER) AS pass_word_len,
       CAST(coalesce(word_dup_ratio <= 0.55, false) AS INTEGER) AS pass_dup,
       CAST(coalesce(stop_ratio >= 0.02, false) AS INTEGER) AS pass_stop,
       CAST(n_words BETWEEN 20 AND 80
            AND coalesce(mean_word_len BETWEEN 3.0 AND 10.0, false)
            AND coalesce(word_dup_ratio <= 0.55, false)
            AND coalesce(stop_ratio >= 0.02, false) AS INTEGER) AS keep
FROM s
""",
    # Mixture accounting: per-(source, lang) token share + uniform-target
    # resampling weight; single-row totals joined back (exact BIGINTs,
    # one IEEE division + round each — engine-identical)
    "text_mixture_weights": """
WITH g AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1, 2
),
tot AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS tt,
         CAST(count(*) AS BIGINT) AS ng
  FROM g
)
SELECT source, lang, n_docs, n_tokens,
       round(CAST(n_tokens AS DOUBLE) / tt, 6) AS token_share,
       round(CAST(tt AS DOUBLE) / (ng * n_tokens), 6) AS uniform_weight
FROM g, tot
""",
    "text_mixture_temperature": f"""
WITH g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
s AS (
  SELECT source, n_docs, n_tokens,
         CAST(round(pow(n_tokens, {MIX_TAU}) * 1000000) AS BIGINT) AS pt_u
  FROM g
),
t AS (SELECT *, CAST(sum(pt_u) OVER () AS BIGINT) AS tot_u FROM s)
SELECT source, n_docs, n_tokens,
       round(CAST(pt_u AS DOUBLE) / tot_u, 6) AS temp_share,
       CAST(CASE WHEN n_tokens > 0 THEN least(100, greatest(0,
            floor(100.0 * {MIX_BUDGET_TOKENS}
                  * round(CAST(pt_u AS DOUBLE) / tot_u, 6) / n_tokens)))
            ELSE 0 END AS INTEGER) AS rate_pct
FROM t
""",
    "text_mixture_sample": f"""
WITH g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
s AS (
  SELECT source, n_tokens,
         CAST(round(pow(n_tokens, {MIX_TAU}) * 1000000) AS BIGINT) AS pt_u
  FROM g
),
t AS (SELECT *, CAST(sum(pt_u) OVER () AS BIGINT) AS tot_u FROM s),
r AS (
  SELECT source,
         CAST(CASE WHEN n_tokens > 0 THEN least(100, greatest(0,
              floor(100.0 * {MIX_BUDGET_TOKENS}
                    * round(CAST(pt_u AS DOUBLE) / tot_u, 6) / n_tokens)))
              ELSE 0 END AS INTEGER) AS rate_pct
  FROM t
)
SELECT d.doc_id, d.source, d.lang
FROM documents d JOIN r ON r.source = d.source
WHERE ('0x' || substr(md5('0:' || d.doc_id), 1, 15))::BIGINT % 100
      < r.rate_pct
""",
    # Concat-then-chunk sequence packing: 8 shards by md5 hash of doc_id
    # (hash_bucket_col — id-type-agnostic, mirrors the Spark operator),
    # running token count before each doc, pack = cum_before DIV 512 —
    # all integer arithmetic, bit-stable
    "text_pack_sequences": """
WITH t AS (
  SELECT doc_id,
         ('0x' || substr(md5('0:' || doc_id), 1, 15))::BIGINT % 8 AS bucket,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, bucket, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY bucket ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM t
)
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
       CAST(cum_before // 512 AS BIGINT) AS pack_id,
       n_tokens,
       CAST(cum_before % 512 AS BIGINT) AS offset_in_pack
FROM c
""",
    # Nearest-centroid confusion: integer micro-unit per-label centroids
    # (exact BIGINT sums, round(sum/n) = one IEEE division + one
    # half-away round — engine-identical), argmin by exact integer L2
    # with ties to the lowest label (mirrors array_position first-min)
    "sim_label_centroids": """
WITH u AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS d,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
           AS x
  FROM embeddings
),
cents AS (
  SELECT label AS clabel, d, CAST(round(sum(x) / count(*)) AS BIGINT) AS m
  FROM u GROUP BY 1, 2
),
dists AS (
  SELECT u.vec_id, u.label, c.clabel,
         sum((u.x - c.m) * (u.x - c.m)) AS d2
  FROM u JOIN cents c ON u.d = c.d
  GROUP BY 1, 2, 3
),
best AS (
  SELECT vec_id, label, clabel,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
  FROM dists
)
SELECT CAST(label AS INTEGER) AS label,
       CAST(clabel AS INTEGER) AS assigned_label,
       CAST(count(*) AS BIGINT) AS n
FROM best WHERE rn = 1
GROUP BY 1, 2
""",
}

# Composed post-hoc from the pipeline_curate oracle: insert the SemDeDup
# DROP set (the full integer-Lloyd semantic-dedup replay nested as a
# subquery) between the near-dup drop (kept2) and the split labeling —
# mirroring curate_corpus(embeddings=...) stage order exactly. Anti-join
# semantics (NOT EXISTS), matching the engine: a doc absent from the
# embeddings table survives the semantic stage.
EXTENSION_ORACLE_SQL["pipeline_curate_semantic"] = (
    EXTENSION_ORACLE_SQL["pipeline_curate"]
    .replace(
        "curated AS (",
        f"""sem AS (
  SELECT vec_id FROM (
{_semantic_dedup_sql()}
  ) WHERE keep = 0
),
kept3 AS (
  SELECT k.* FROM kept2 k
  WHERE NOT EXISTS (SELECT 1 FROM sem s WHERE s.vec_id = k.doc_id)
),
curated AS (""",
    )
    .replace("FROM kept2\n  )", "FROM kept3\n  )")
)

EXTENSION_ORACLE_SQL["text_self_dedup"] = """
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
  FROM documents
),
sp AS (
  SELECT doc_id,
         generate_subscripts(generate_series(1, len(words), 2), 1) AS chunk_idx,
         unnest(generate_series(1, len(words), 2)) AS s, words
  FROM w WHERE len(words) > 0
),
spans AS (
  SELECT doc_id, chunk_idx, array_to_string(words[s:s+1], ' ') AS span FROM sp
),
firsts AS (
  SELECT doc_id, chunk_idx, span,
         min(chunk_idx) OVER (PARTITION BY doc_id, span) AS first_idx
  FROM spans
),
agg AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(span, ' ' ORDER BY chunk_idx) AS clean_text
  FROM firsts WHERE chunk_idx = first_idx GROUP BY 1
),
ns AS (SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY 1)
SELECT w.doc_id,
       CAST(coalesce(ns.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(ns.n_spans, 0) - coalesce(a.n_kept, 0) AS BIGINT)
         AS n_repeated,
       coalesce(a.clean_text, '') AS clean_text
FROM w LEFT JOIN ns ON ns.doc_id = w.doc_id
LEFT JOIN agg a ON a.doc_id = w.doc_id
"""

EXTENSION_ORACLE_SQL["text_decontaminate"] = """
WITH sh AS (
  SELECT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM (
    SELECT doc_id, string_split(text, ' ') AS w,
           unnest(generate_series(1, len(string_split(text, ' ')) - 2)) AS i
    FROM documents WHERE len(string_split(text, ' ')) >= 3
  )
),
cand AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE doc_id % 10 <> 0),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0),
r AS (
  SELECT c.doc_id,
         round(CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / count(*), 6) AS overlap_ratio
  FROM cand c LEFT JOIN bench b ON c.shingle = b.shingle
  GROUP BY c.doc_id
),
dropped AS (SELECT doc_id FROM r WHERE overlap_ratio > 0.1)
SELECT d.doc_id, d.text FROM documents d
WHERE d.doc_id % 10 <> 0
  AND NOT EXISTS (SELECT 1 FROM dropped x WHERE x.doc_id = d.doc_id)
"""

EXTENSION_ORACLE_SQL["text_pack_shuffled"] = """
WITH t AS (
  SELECT doc_id,
         ('0x' || substr(md5('0:' || doc_id), 1, 15))::BIGINT % 8 AS bucket,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens,
         ('0x' || substr(md5('1:' || doc_id), 1, 15))::BIGINT AS ord
  FROM documents
),
c AS (
  SELECT doc_id, bucket, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY bucket ORDER BY ord, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM t
)
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
       CAST(cum_before // 512 AS BIGINT) AS pack_id,
       n_tokens,
       CAST(cum_before % 512 AS BIGINT) AS offset_in_pack
FROM c
"""

EXTENSION_ORACLE_SQL["dedup_corpus_diff"] = """
WITH old AS (
  SELECT doc_id, md5(text) AS old_md5 FROM documents WHERE doc_id % 10 <> 0
),
new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END)
           AS new_md5
  FROM documents WHERE doc_id % 13 <> 0
)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, o.old_md5, n.new_md5,
       CASE WHEN o.old_md5 IS NULL THEN 'added'
            WHEN n.new_md5 IS NULL THEN 'removed'
            WHEN o.old_md5 = n.new_md5 THEN 'unchanged'
            ELSE 'changed' END AS status
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
"""

# The streaming C4 gate must equal the batch C4 gate — same oracle SQL.
EXTENSION_ORACLE_SQL["text_lm_histogram"] = f"""
SELECT CAST(floor(lm_score / 0.015625) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
       round(CAST(count(*) AS DOUBLE)
             / (SELECT count(*) FROM ({EXTENSION_ORACLE_SQL["text_lm_score"]})
                WHERE lm_score IS NOT NULL), 6) AS doc_share
FROM ({EXTENSION_ORACLE_SQL["text_lm_score"]})
WHERE lm_score IS NOT NULL
GROUP BY 1
"""

EXTENSION_ORACLE_SQL["streaming_c4_filter"] = EXTENSION_ORACLE_SQL["text_c4_filters"]

# The streaming decontamination gate must equal the batch apply — same
# oracle SQL (same candidate/benchmark slices, same rounded-ratio rule).
EXTENSION_ORACLE_SQL["streaming_decontaminate"] = EXTENSION_ORACLE_SQL[
    "text_decontaminate"
]

# The streaming mixture gate must equal the batch accounting — same oracle.
EXTENSION_ORACLE_SQL["streaming_mixture_weights"] = EXTENSION_ORACLE_SQL[
    "text_mixture_weights"
]

# The curate→pack flagship replays the ENTIRE curation pipeline (same
# prefix as pipeline_curate, down to the `curated` CTE) and then packs
# each split independently — the packing suffix swaps in for the final
# projection.
EXTENSION_ORACLE_SQL["pipeline_curate_pack"] = EXTENSION_ORACLE_SQL[
    "pipeline_curate"
].replace(
    "SELECT doc_id, pred_lang, quality, split FROM curated",
    """, packsrc AS (
  SELECT doc_id, split,
         ('0x' || substr(md5('0:' || doc_id), 1, 15))::BIGINT % 8 AS bucket,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens
  FROM curated
),
packed AS (
  SELECT doc_id, split, bucket, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY split, bucket ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM packsrc
)
SELECT doc_id, split, CAST(bucket AS BIGINT) AS bucket,
       CAST(cum_before // 512 AS BIGINT) AS pack_id, n_tokens,
       CAST(cum_before % 512 AS BIGINT) AS offset_in_pack
FROM packed""",
)



# --------------------------------------------------------------------------
# Round-10 family oracles: audio VAD, source governance, n-gram novelty,
# INT8 scalar quantization, OPQ dimension allocation.
# --------------------------------------------------------------------------

# Frame-energy / VAD replay: the analytic generator sawtooth (the same
# formula with_audio_payload and the audio_decode oracle share), framed
# by i // 16, a frame ACTIVE iff its energy >= n_in_frame · 8192²
# (integer compare — threshold_amp² = 67108864), trim boundaries as the
# min/max active frame index (NULL when all-silence).
EXTENSION_ORACLE_SQL["multimodal_audio_energy"] = """
WITH d AS (SELECT doc_id, length(text) AS L FROM documents),
a AS (
  SELECT doc_id, 4000 * (1 + L % 3) AS sr, 64 + doc_id % 101 AS n,
         (doc_id % 256) * 131 AS base
  FROM d
),
si AS (SELECT doc_id, sr, n, base, unnest(range(n)) AS i FROM a),
s AS (
  SELECT doc_id, sr, n, i // 16 AS f,
         ((base + 17 * i) % 65536 - 32768) AS v
  FROM si
),
fr AS (
  SELECT doc_id, sr, n, f, count(*) AS fn, sum(v * v) AS fe
  FROM s GROUP BY doc_id, sr, n, f
),
fa AS (
  SELECT doc_id, sr, n, f, fe, (fe >= fn * 67108864) AS active FROM fr
)
SELECT doc_id,
       CAST(max(sr) AS BIGINT) AS sample_rate,
       CAST(max(n) AS BIGINT) AS n_samples,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(sum(CASE WHEN active THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
       CAST(min(CASE WHEN active THEN f END) AS BIGINT) AS first_active,
       CAST(max(CASE WHEN active THEN f END) AS BIGINT) AS last_active,
       CAST(sum(fe) AS BIGINT) AS energy
FROM fa GROUP BY doc_id
"""

# Per-source governance: doc/token counts and mean on the space-split
# non-empty words, distinct-word vocabulary via one unnest, distinct
# languages — the text.source_stats aggregation replayed 1:1.
EXTENSION_ORACLE_SQL["text_source_stats"] = """
WITH b AS (
  SELECT source, lang,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS nt
  FROM documents
),
agg AS (
  SELECT source, count(*) AS n_docs, sum(nt) AS n_tokens,
         round(sum(nt) / count(*), 6) AS avg_tokens,
         count(DISTINCT lang) AS n_langs
  FROM b GROUP BY source
),
v AS (
  SELECT source, count(DISTINCT word) AS vocab FROM (
    SELECT source,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
    FROM documents
  ) GROUP BY source
)
SELECT a.source, CAST(a.n_docs AS BIGINT) AS n_docs,
       CAST(a.n_tokens AS BIGINT) AS n_tokens, a.avg_tokens,
       CAST(coalesce(v.vocab, 0) AS BIGINT) AS vocab,
       CAST(a.n_langs AS BIGINT) AS n_langs
FROM agg a LEFT JOIN v ON v.source = a.source
"""

# Trigram novelty: the minhash oracle's shingle CTE (distinct word
# 3-grams per doc), one gram-keyed document-frequency count, join back
# on the gram, per-doc shares — text.ngram_novelty replayed 1:1 (docs
# shorter than 3 words emit no row on both sides).
EXTENSION_ORACLE_SQL["text_ngram_novelty"] = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
shingle AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM (
    SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
    FROM words WHERE len(w) >= 3
  )
),
gdf AS (SELECT shingle, count(*) AS df FROM shingle GROUP BY shingle)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN gdf.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared,
       round(1.0 - sum(CASE WHEN gdf.df >= 2 THEN 1 ELSE 0 END) / count(*), 6)
         AS novelty
FROM shingle s JOIN gdf ON gdf.shingle = s.shingle
GROUP BY s.doc_id
"""

EXTENSION_ORACLE_SQL["sim_topk_sq"] = _sq_topk_sql()
EXTENSION_ORACLE_SQL["sim_sq_recall"] = _sq_recall_sql()
EXTENSION_ORACLE_SQL["sim_topk_opq"] = _opq_topk_sql()
EXTENSION_ORACLE_SQL["sim_opq_recall"] = _opq_recall_sql()


def _opq_scaled_vec_body() -> str:
    """DuckDB body of the OPQ skewed fixture as the ``(vec_id, vec
    DOUBLE[])`` relation the ANN replays consume (same exact arithmetic
    as :data:`_OPQ_EU_CTE` before quantization: float→double cast, the
    power-of-two hot-dim scale)."""
    return f"""SELECT vec_id,
       list_transform(embedding::DOUBLE[],
                      (x, i) -> x * CASE WHEN i <= {OPQ_HOT_DIMS}
                                         THEN {float(OPQ_HOT_SCALE)}
                                         ELSE 1.0 END) AS vec
  FROM embeddings"""


def _opq_perm_vec_body() -> str:
    """The OPQ-PERMUTED skewed fixture as pure nested subqueries (no
    CTEs — this text is spliced inside ``_ivfpq_sql``'s ``e`` CTE
    parens): the variance ranking over quantized micro-units of the
    id-prefix sample, the subspace-major deal, the coordinate reorder
    of the scaled DOUBLES. Quantization commutes with the reorder, so
    feeding these doubles through the replay's ``round(x·units)``
    equals the Spark side's permute-then-quantize."""
    scaled = _opq_scaled_vec_body()
    sub = 64 // PQ_M
    return f"""SELECT vec_id, list(x ORDER BY j) AS vec FROM (
    SELECT xs.vec_id, pm.j, xs.x
    FROM (SELECT vec_id, generate_subscripts(vec, 1) - 1 AS d,
                 unnest(vec) AS x
          FROM ({scaled})) xs
    JOIN (
      SELECT d AS src, (r % {PQ_M}) * {sub} + (r // {PQ_M}) AS j FROM (
        SELECT d, row_number() OVER (ORDER BY n * s2 - s1 * s1 DESC, d) - 1
                 AS r
        FROM (
          SELECT d, count(*) AS n, sum(x) AS s1, sum(x * x) AS s2 FROM (
            SELECT generate_subscripts(u, 1) - 1 AS d, unnest(u) AS x FROM (
              SELECT list_transform(vec,
                                    x -> CAST(round(x * {IVF_UNITS})
                                              AS BIGINT)) AS u
              FROM ({scaled}) ORDER BY vec_id LIMIT {OPQ_SAMPLE_N}
            )
          ) GROUP BY d
        )
      )
    ) pm ON pm.src = xs.d
  ) GROUP BY vec_id"""


def _opq_ivfpq_recall_sql() -> str:
    """Contiguous vs OPQ-permuted RESIDUAL IVFADC recall replay on the
    skewed fixture: two full nested ``_ivfpq_sql`` replays (each with
    its own CTE scope) against the exact integer-L2 truth."""
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    a1 = _ivfpq_sql(residual=True, e_body=_opq_scaled_vec_body())
    a2 = _ivfpq_sql(residual=True, e_body=_opq_perm_vec_body())
    branches = []
    for method, name in (("ivfpq_res", "a1"), ("opq_ivfpq", "a2")):
        branches.append(
            f"""SELECT '{method}' AS method, q AS query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / {float(SIM_K)}, 6) AS recall
FROM (SELECT unnest([{qids}]) AS q)
LEFT JOIN (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e SEMI JOIN {name} a
    ON a.query_id = e.query_id AND a.vec_id = e.vec_id
  GROUP BY e.query_id
) h ON h.query_id = q"""
        )
    return f"""
WITH a1 AS MATERIALIZED (
{a1}
),
a2 AS MATERIALIZED (
{a2}
),
e2 AS MATERIALIZED (
  SELECT vec_id,
         list_transform(vec, x -> CAST(round(x * {IVF_UNITS}) AS BIGINT)) AS u
  FROM ({_opq_scaled_vec_body()})
),
exact AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, eb.vec_id,
           {_int_d2_sql("eb.u", "q.u")} AS d2
    FROM e2 eb CROSS JOIN (SELECT * FROM e2 WHERE vec_id IN ({qids})) q
    WHERE eb.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY d2, vec_id) <= {SIM_K}
)
{chr(10).join(branches[:1])}
UNION ALL
{chr(10).join(branches[1:])}
"""


EXTENSION_ORACLE_SQL["sim_topk_opq_ivfpq"] = _ivfpq_sql(
    residual=True, e_body=_opq_perm_vec_body()
)
EXTENSION_ORACLE_SQL["sim_opq_ivfpq_recall"] = _opq_ivfpq_recall_sql()


# --------------------------------------------------------------------------
# IVF-SQ8 oracles: coarse IVF cells + INT8 scalar-quantized residuals.
# --------------------------------------------------------------------------

def _ivfsq_ctes(
    budgets, vec_body: str | None = None
) -> tuple[list[str], list[str]]:
    """Unrolled IVF-SQ8 replay (mirrors similarity.ivfsq_build/
    ivfsq_topk): the coarse integer Lloyd of the IVF oracle, the
    residual projection, the corpus-wide residual ``vmax`` scalar, the
    ``floor(r·127/vmax)`` byte codes, the integer probe of IVF_NPROBE
    cells per query with the query's residual coded PER PROBED CELL on
    the same scale, then per budget the stage-1 code-space cut
    restricted to probed cells and the exact full-resolution re-rank.
    Returns ``(ctes, approx_names)`` like :func:`_sq_ctes`."""
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    ctes = [
        _micro_e_cte(vec_body),
        f"""cent0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, u
  FROM e ORDER BY vec_id LIMIT {IVF_K}
)""",
    ]
    for it in range(IVF_ITERS + 1):
        ctes.append(f"""assign{it} AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cluster, {_int_d2_sql("e.u", "c.u")} AS d2
    FROM e CROSS JOIN cent{it} c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1
)""")
        if it < IVF_ITERS:
            ctes.append(f"""mean{it + 1} AS (
  SELECT cluster, list(m ORDER BY d) AS u FROM (
    SELECT cluster, d, CAST(round(sum(x) / count(*)) AS BIGINT) AS m
    FROM (
      SELECT a.cluster, generate_subscripts(e.u, 1) AS d, unnest(e.u) AS x
      FROM e JOIN assign{it} a ON a.vec_id = e.vec_id
    ) GROUP BY cluster, d
  ) GROUP BY cluster
)""")
            ctes.append(f"""cent{it + 1} AS (
  SELECT c.cluster, coalesce(m.u, c.u) AS u
  FROM cent{it} c LEFT JOIN mean{it + 1} m ON m.cluster = c.cluster
)""")
    final = IVF_ITERS
    ctes.append(f"""qv AS (
  SELECT vec_id AS query_id, u AS q_u FROM e WHERE vec_id IN ({qids})
)""")
    ctes.append(f"""probe AS (
  SELECT query_id, cluster FROM (
    SELECT q.query_id, c.cluster, {_int_d2_sql("q.q_u", "c.u")} AS d2
    FROM qv q CROSS JOIN cent{final} c
  ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d2, cluster)
    <= {IVF_NPROBE}
)""")
    ctes.append(f"""res AS MATERIALIZED (
  SELECT e.vec_id, a.cluster,
         list_transform(generate_series(1, 64), i -> e.u[i] - c.u[i]) AS r
  FROM e JOIN assign{final} a ON a.vec_id = e.vec_id
  JOIN cent{final} c ON c.cluster = a.cluster
)""")
    ctes.append("""vm AS (
  SELECT greatest(1, max(list_max(list_transform(r, x -> abs(x))))) AS vmax
  FROM res
)""")
    ctes.append("""codes AS MATERIALIZED (
  SELECT vec_id, cluster,
         list_transform(r, x -> CAST(floor((x * 127.0) / vm.vmax)
                                     AS BIGINT)) AS sq
  FROM res, vm
)""")
    ctes.append(f"""qcodes AS (
  SELECT q.query_id, p.cluster,
         list_transform(generate_series(1, 64),
                        i -> CAST(floor(((q.q_u[i] - c.u[i]) * 127.0)
                                        / vm.vmax) AS BIGINT)) AS qsq
  FROM qv q JOIN probe p ON p.query_id = q.query_id
  JOIN cent{final} c ON c.cluster = p.cluster, vm
)""")
    ctes.append(f"""s1 AS (
  SELECT qc.query_id, c.vec_id, {_int_d2_sql("c.sq", "qc.qsq")} AS d2c
  FROM codes c JOIN qcodes qc ON qc.cluster = c.cluster
  WHERE c.vec_id <> qc.query_id
)""")
    names = []
    for b in budgets:
        ctes.append(f"""cand{b} AS (
  SELECT query_id, vec_id FROM s1
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY d2c, vec_id) <= {b}
)""")
        ctes.append(f"""approx{b} AS (
  SELECT query_id, vec_id, d2_u, rn FROM (
    SELECT cand{b}.query_id, cand{b}.vec_id,
           CAST({_int_d2_sql("ec.u", "eq.u")} AS BIGINT) AS d2_u,
           row_number() OVER (PARTITION BY cand{b}.query_id
                              ORDER BY {_int_d2_sql("ec.u", "eq.u")},
                                       cand{b}.vec_id) AS rn
    FROM cand{b}
    JOIN e ec ON ec.vec_id = cand{b}.vec_id
    JOIN e eq ON eq.vec_id = cand{b}.query_id
  ) WHERE rn <= {SIM_K}
)""")
        names.append(f"approx{b}")
    return ctes, names


def _ivfsq_topk_sql() -> str:
    ctes, names = _ivfsq_ctes([RP_TOPK_CANDIDATES])
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT query_id, vec_id, d2_u, CAST(rn AS INTEGER) AS rn"
        f" FROM {names[0]}"
    )


def _ivfsq_recall_sql() -> str:
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    ctes, names = _ivfsq_ctes(SQ_RECALL_BUDGETS)
    ctes.append(f"""exact AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, eb.vec_id,
           {_int_d2_sql("eb.u", "q.u")} AS d2
    FROM e eb CROSS JOIN (SELECT * FROM e WHERE vec_id IN ({qids})) q
    WHERE eb.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY d2, vec_id) <= {SIM_K}
)""")
    branches = []
    for b, name in zip(SQ_RECALL_BUDGETS, names):
        ctes.append(f"""hits{b} AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e SEMI JOIN {name} a
    ON a.query_id = e.query_id AND a.vec_id = e.vec_id
  GROUP BY e.query_id
)""")
        branches.append(
            f"""SELECT 'ivfsq_c{b}' AS method, q AS query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / {float(SIM_K)}, 6) AS recall
FROM (SELECT unnest([{qids}]) AS q) LEFT JOIN hits{b} h ON h.query_id = q"""
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(branches)
    )


EXTENSION_ORACLE_SQL["sim_topk_ivfsq"] = _ivfsq_topk_sql()
EXTENSION_ORACLE_SQL["sim_ivfsq_recall"] = _ivfsq_recall_sql()


# --------------------------------------------------------------------------
# Binary-quantization oracles: sign-bit pack + Hamming stage 1.
# --------------------------------------------------------------------------

def _bq_ctes(
    budgets, vec_body: str | None = None
) -> tuple[list[str], list[str]]:
    """Binary-quantization replay (mirrors similarity.bq_build/bq_topk):
    sign bit per micro-unit component packed into two 32-bit BIGINT
    words, stage-1 total Hamming (Σ bit_count(xor)) per budget, exact
    full-resolution integer-L2 re-rank — every step integer, zero
    trained state. Returns ``(ctes, approx_names)`` like
    :func:`_sq_ctes`."""
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    ham = (
        "CAST(list_sum(list_transform(generate_series(1, 2), "
        "i -> bit_count(xor(cb.bq[i], q.bq[i])))) AS BIGINT)"
    )
    ctes = [
        _micro_e_cte(vec_body),
        """b AS MATERIALIZED (
  SELECT vec_id,
         list_transform(generate_series(0, 1), w ->
           CAST(list_sum(list_transform(generate_series(0, 31), j ->
             CASE WHEN u[w * 32 + j + 1] >= 0 THEN (1::BIGINT << j)
                  ELSE 0::BIGINT END)) AS BIGINT)) AS bq
  FROM e
)""",
    ]
    names = []
    for b in budgets:
        ctes.append(f"""cand{b} AS (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, cb.vec_id, {ham} AS dh
    FROM b cb CROSS JOIN (SELECT * FROM b WHERE vec_id IN ({qids})) q
    WHERE cb.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY dh, vec_id) <= {b}
)""")
        ctes.append(f"""approx{b} AS (
  SELECT query_id, vec_id, d2_u, rn FROM (
    SELECT cand{b}.query_id, cand{b}.vec_id,
           CAST({_int_d2_sql("ec.u", "eq.u")} AS BIGINT) AS d2_u,
           row_number() OVER (PARTITION BY cand{b}.query_id
                              ORDER BY {_int_d2_sql("ec.u", "eq.u")},
                                       cand{b}.vec_id) AS rn
    FROM cand{b}
    JOIN e ec ON ec.vec_id = cand{b}.vec_id
    JOIN e eq ON eq.vec_id = cand{b}.query_id
  ) WHERE rn <= {SIM_K}
)""")
        names.append(f"approx{b}")
    return ctes, names


def _bq_topk_sql() -> str:
    ctes, names = _bq_ctes([RP_TOPK_CANDIDATES])
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT query_id, vec_id, d2_u, CAST(rn AS INTEGER) AS rn"
        f" FROM {names[0]}"
    )


def _bq_recall_sql() -> str:
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    ctes, names = _bq_ctes(SQ_RECALL_BUDGETS)
    ctes.append(f"""exact AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, eb.vec_id,
           {_int_d2_sql("eb.u", "q.u")} AS d2
    FROM e eb CROSS JOIN (SELECT * FROM e WHERE vec_id IN ({qids})) q
    WHERE eb.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY d2, vec_id) <= {SIM_K}
)""")
    branches = []
    for b, name in zip(SQ_RECALL_BUDGETS, names):
        ctes.append(f"""hits{b} AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e SEMI JOIN {name} a
    ON a.query_id = e.query_id AND a.vec_id = e.vec_id
  GROUP BY e.query_id
)""")
        branches.append(
            f"""SELECT 'bq_c{b}' AS method, q AS query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / {float(SIM_K)}, 6) AS recall
FROM (SELECT unnest([{qids}]) AS q) LEFT JOIN hits{b} h ON h.query_id = q"""
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(branches)
    )


EXTENSION_ORACLE_SQL["sim_topk_bq"] = _bq_topk_sql()
EXTENSION_ORACLE_SQL["sim_bq_recall"] = _bq_recall_sql()


# The streaming governance twin must equal the batch dashboard verbatim
# — same oracle text as text_source_stats.
EXTENSION_ORACLE_SQL["streaming_source_stats"] = EXTENSION_ORACLE_SQL[
    "text_source_stats"
]


# --------------------------------------------------------------------------
# Hybrid retrieval oracle: lexical TF-IDF rank ⊕ vector rank via RRF.
# --------------------------------------------------------------------------

def _hybrid_rrf_sql() -> str:
    """RRF replay: the core search_rel chain ranks the lexical side
    with the DQ6 ordering, the exact integer-L2 chain ranks the
    semantic side for each query's mapped embedding, and the fusion is
    the same fixed two-term ``1/(60+r)`` expression + top-10 window."""
    from hadoop_tfidf_spark.declared import SEARCH_QUERIES

    vec_ids = SIM_QUERY_IDS[: len(SEARCH_QUERIES)]
    qmap = ", ".join(
        f"('{qid}', {int(v)})"
        for (qid, _), v in zip(SEARCH_QUERIES, vec_ids)
    )
    qvec_ids = ", ".join(str(int(v)) for v in vec_ids)
    return (
        _CORE_CTES
        + f"""
, lexr AS (
  SELECT query_id, doc_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id) AS BIGINT)
           AS r_lex
  FROM search_rel
  QUALIFY r_lex <= {RRF_LEX_TOPN}
),
ev AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {IVF_UNITS}) AS BIGINT)) AS u
  FROM embeddings
),
qmap AS (SELECT * FROM (VALUES {qmap}) AS m(query_id, qvec_id)),
semr AS (
  SELECT m.query_id, s.vec_id AS doc_id, s.r_sem
  FROM (
    SELECT query_id AS qvec_id, vec_id,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY d2, vec_id) AS BIGINT) AS r_sem
    FROM (
      SELECT q.vec_id AS query_id, eb.vec_id,
             {_int_d2_sql("eb.u", "q.u")} AS d2
      FROM ev eb CROSS JOIN (SELECT * FROM ev
                             WHERE vec_id IN ({qvec_ids})) q
      WHERE eb.vec_id <> q.vec_id
    )
    QUALIFY r_sem <= {SIM_K}
  ) s JOIN qmap m ON m.qvec_id = s.qvec_id
),
fused AS (
  SELECT coalesce(l.query_id, s.query_id) AS query_id,
         coalesce(l.doc_id, s.doc_id) AS doc_id,
         l.r_lex, s.r_sem,
         round(coalesce(1.0 / ({RRF_K} + l.r_lex), 0.0)
               + coalesce(1.0 / ({RRF_K} + s.r_sem), 0.0), 6) AS rrf_score
  FROM lexr l FULL JOIN semr s
    ON s.query_id = l.query_id AND s.doc_id = l.doc_id
)
SELECT query_id, doc_id, r_lex, r_sem, rrf_score, CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_score DESC, doc_id) AS rnk
  FROM fused
) WHERE rnk <= {RRF_TOPK}
"""
    )


EXTENSION_ORACLE_SQL["search_hybrid_rrf"] = _hybrid_rrf_sql()


# Streaming BQ index ingest == the one-shot batch pack, bit for bit
# (the b CTE of the BQ replay, words surfaced as scalar columns).
EXTENSION_ORACLE_SQL["streaming_bq_index"] = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {IVF_UNITS}) AS BIGINT)) AS u
  FROM embeddings
),
b AS (
  SELECT vec_id,
         list_transform(generate_series(0, 1), w ->
           CAST(list_sum(list_transform(generate_series(0, 31), j ->
             CASE WHEN u[w * 32 + j + 1] >= 0 THEN (1::BIGINT << j)
                  ELSE 0::BIGINT END)) AS BIGINT)) AS bq
  FROM e
)
SELECT vec_id, bq[1] AS bq_w0, bq[2] AS bq_w1 FROM b
"""


# Per-source quality governance: the per-doc quality and C4-keep
# replays nested verbatim, rolled up source-keyed with the exact
# micro-unit quality mass.
EXTENSION_ORACLE_SQL["text_source_quality"] = f"""
WITH q AS MATERIALIZED (
{EXTENSION_ORACLE_SQL["text_quality"]}
),
c AS MATERIALIZED (
{EXTENSION_ORACLE_SQL["text_c4_filters"]}
),
d AS (SELECT doc_id, source FROM documents)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CAST(round(q.quality * 1000000) AS BIGINT)) AS BIGINT)
         AS sum_quality_u,
       round(sum(CAST(round(q.quality * 1000000) AS BIGINT))
             / (count(*) * 1000000.0), 6) AS avg_quality,
       CAST(sum(c.keep) AS BIGINT) AS n_keep,
       round(sum(c.keep) / count(*), 6) AS keep_rate
FROM d JOIN q USING (doc_id) JOIN c USING (doc_id)
GROUP BY d.source
"""


# --------------------------------------------------------------------------
# Round-12 oracles: the tier frontier, the update-mode governance twin,
# and the malformed-payload keep contract.
# --------------------------------------------------------------------------

def _frontier_sql() -> str:
    """All six quantization-tier replays composed into ONE query: each
    tier's full chain (the byte-identical builders its own gate row
    uses, retargeted at the skewed fixture via ``vec_body=``/
    ``e_body=``) runs inside its own scoped nested-WITH subquery, the
    shared exact integer-L2 truth materializes once, and each branch
    reduces to one ``(tier, bytes_per_vec, n_hits, recall)`` row."""
    scaled = _opq_scaled_vec_body()
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    denom = float(SIM_K * len(SIM_QUERY_IDS))

    def chain(ctes, final_select):
        return "WITH " + ",\n".join(ctes) + "\n" + final_select

    sq_ctes, sq_names = _sq_ctes([FRONTIER_BUDGET], vec_body=scaled)
    ivfsq_ctes, ivfsq_names = _ivfsq_ctes([FRONTIER_BUDGET], vec_body=scaled)
    bq_ctes, bq_names = _bq_ctes([FRONTIER_BUDGET], vec_body=scaled)
    pq_ctes = [_OPQ_EU_CTE] + _pq_chain_ctes(64, prefix="p", e_name="eu")
    tiers = {
        "sq": chain(
            sq_ctes, f"SELECT query_id, vec_id FROM {sq_names[0]}"
        ),
        "ivfsq": chain(
            ivfsq_ctes, f"SELECT query_id, vec_id FROM {ivfsq_names[0]}"
        ),
        "pq": chain(
            pq_ctes,
            f"SELECT query_id, vec_id FROM pranked WHERE rn <= {SIM_K}",
        ),
        "ivfpq_res": _ivfpq_sql(residual=True, e_body=scaled),
        "opq_ivfpq": _ivfpq_sql(
            residual=True, e_body=_opq_perm_vec_body()
        ),
        "bq": chain(
            bq_ctes, f"SELECT query_id, vec_id FROM {bq_names[0]}"
        ),
    }
    tier_ctes = ",\n".join(
        f"t_{t} AS MATERIALIZED (\n{sql}\n)" for t, sql in tiers.items()
    )
    branches = "\nUNION ALL\n".join(
        f"""SELECT '{t}' AS tier,
       CAST({TIER_BYTES[t]} AS BIGINT) AS bytes_per_vec,
       CAST(n_hits AS BIGINT) AS n_hits,
       round(n_hits / {denom}, 6) AS recall
FROM (SELECT count(*) AS n_hits
      FROM exact e SEMI JOIN t_{t} a
        ON a.query_id = e.query_id AND a.vec_id = e.vec_id)"""
        for t in tiers
    )
    return f"""
WITH {tier_ctes},
e2 AS MATERIALIZED (
  SELECT vec_id,
         list_transform(vec, x -> CAST(round(x * {IVF_UNITS}) AS BIGINT)) AS u
  FROM ({scaled})
),
exact AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, eb.vec_id,
           {_int_d2_sql("eb.u", "q.u")} AS d2
    FROM e2 eb CROSS JOIN (SELECT * FROM e2 WHERE vec_id IN ({qids})) q
    WHERE eb.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY d2, vec_id) <= {SIM_K}
)
{branches}
"""


EXTENSION_ORACLE_SQL["sim_tier_frontier"] = _frontier_sql()


# Update-mode governance twin: upsert-reconstructed final state must
# equal the batch per-source roll-up (the (source, lang)-grain slice of
# the text_source_stats arithmetic; vocab is the complete-mode twin's
# subject).
EXTENSION_ORACLE_SQL["streaming_source_stats_update"] = """
WITH b AS (
  SELECT source, lang,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS nt
  FROM documents
),
g AS (
  SELECT source, lang, count(*) AS n_docs, sum(nt) AS n_tokens
  FROM b GROUP BY source, lang
)
SELECT source, CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       round(sum(n_tokens) / sum(n_docs), 6) AS avg_tokens,
       CAST(count(*) AS BIGINT) AS n_langs
FROM g GROUP BY source
"""

# The compacted ledger reconstructs to the SAME per-source roll-up (the
# update twin's oracle verbatim) + the pinned post-compaction generation
# count: 4 triggers, generations 0..2 folded into one base, 1 newer
# generation still shadowing it.
EXTENSION_ORACLE_SQL["streaming_ledger_compact"] = EXTENSION_ORACLE_SQL[
    "streaming_source_stats_update"
].replace(
    "CAST(count(*) AS BIGINT) AS n_langs",
    "CAST(count(*) AS BIGINT) AS n_langs,\n       CAST(2 AS BIGINT) AS n_generations",
)

# The compact_every=2 POLICY sink: 4 triggers; the batch-1 fold (<= 0)
# is a no-op, the batch-3 fold (<= 2) lands a base at batch_id=2 — the
# stream ends with exactly TWO generations and the same roll-up values
# (the fold loses nothing).
EXTENSION_ORACLE_SQL["streaming_ledger_policy"] = EXTENSION_ORACLE_SQL[
    "streaming_source_stats_update"
].replace(
    "CAST(count(*) AS BIGINT) AS n_langs",
    "CAST(count(*) AS BIGINT) AS n_langs,\n       CAST(2 AS BIGINT) AS n_generations",
)


# Malformed-payload keep contract: the multimodal_audio_decode analytic
# replay verbatim for the good rows; poisoned doc_ids (the modulo rule)
# carry NULL features + the deterministic parser error string the
# truncation triggers (11 bytes cuts mid-"WAVE" magic).
EXTENSION_ORACLE_SQL["multimodal_audio_keep"] = f"""
WITH d AS (SELECT doc_id, length(text) AS L FROM documents),
a AS (
  SELECT doc_id, 4000 * (1 + L % 3) AS sr, 64 + doc_id % 101 AS n,
         (doc_id % 256) * 131 AS base
  FROM d
),
si AS (SELECT doc_id, sr, n, base, unnest(range(n)) AS i FROM a),
s AS (
  SELECT doc_id, sr, n, ((base + 17 * i) % 65536 - 32768) AS v FROM si
),
feat AS (
  SELECT doc_id,
         CAST(44 + 2 * max(n) AS BIGINT) AS n_bytes,
         CAST(max(sr) AS BIGINT) AS sample_rate,
         CAST(max(n) AS BIGINT) AS n_samples,
         CAST(sum(v) AS BIGINT) AS sum_samples,
         CAST(sum(abs(v)) AS BIGINT) AS sum_abs
  FROM s GROUP BY doc_id
)
SELECT doc_id,
       CASE WHEN bad THEN NULL ELSE n_bytes END AS n_bytes,
       CASE WHEN bad THEN NULL ELSE sample_rate END AS sample_rate,
       CASE WHEN bad THEN NULL ELSE n_samples END AS n_samples,
       CASE WHEN bad THEN NULL ELSE sum_samples END AS sum_samples,
       CASE WHEN bad THEN NULL ELSE sum_abs END AS sum_abs,
       CASE WHEN bad THEN 'ValueError: bad RIFF/WAVE magic' END AS err
FROM (SELECT *, doc_id % {AUDIO_POISON_MOD} = {AUDIO_POISON_RES} AS bad
      FROM feat)
"""


# The update-mode phash ledger reconstructs to the SAME final groups the
# complete-mode twin drains; the online-serving BQ row must answer
# streamed queries exactly as the batch index row answers them at rest.
EXTENSION_ORACLE_SQL["streaming_phash_dedup_update"] = EXTENSION_ORACLE_SQL[
    "streaming_phash_dedup"
]
EXTENSION_ORACLE_SQL["streaming_knn_bq"] = EXTENSION_ORACLE_SQL[
    "sim_topk_bq"
]


# Per-source adaptive quality cut: the text_quality chain + one
# source-keyed window rank vs a per-source ceil(q*n) cutoff.
EXTENSION_ORACLE_SQL["text_quality_adaptive"] = f"""
WITH q AS MATERIALIZED (
{EXTENSION_ORACLE_SQL["text_quality"]}
),
d AS (SELECT doc_id, source FROM documents),
r AS (
  SELECT d.source, q.doc_id, q.quality,
         CAST(row_number() OVER (PARTITION BY d.source
                                 ORDER BY q.quality DESC, q.doc_id)
              AS BIGINT) AS qrank,
         CAST(count(*) OVER (PARTITION BY d.source) AS BIGINT) AS n_source
  FROM q JOIN d USING (doc_id)
)
SELECT source, doc_id, quality, qrank, n_source
FROM r WHERE qrank <= ceil({QUALITY_TOP_FRAC} * n_source)
"""

# The production approx form's oracle replays percentile_approx's
# DEFINITION (smallest value whose <=-fraction reaches 1-q) with a
# cumulative count window — exact on the gate fixture, where the GK
# sketch holds every value (n_source << QUALITY_APPROX_ACC).
EXTENSION_ORACLE_SQL["text_quality_adaptive_approx"] = f"""
WITH q AS MATERIALIZED (
{EXTENSION_ORACLE_SQL["text_quality"]}
),
d AS (SELECT doc_id, source FROM documents),
j AS (SELECT d.source, q.quality FROM q JOIN d USING (doc_id)),
c AS (
  SELECT source, quality,
         count(*) OVER (PARTITION BY source ORDER BY quality) * 1.0
           / count(*) OVER (PARTITION BY source) AS frac_le
  FROM j
),
cuts AS (
  SELECT source, min(quality) AS cutoff
  FROM c WHERE frac_le >= {1.0 - QUALITY_TOP_FRAC} GROUP BY source
),
sizes AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_source FROM j GROUP BY source
),
kept AS (
  SELECT j.source, CAST(count(*) AS BIGINT) AS n_kept
  FROM j JOIN cuts USING (source)
  WHERE j.quality > cuts.cutoff GROUP BY j.source
)
SELECT s.source, s.n_source, cuts.cutoff,
       CAST(coalesce(kept.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(ceil({QUALITY_TOP_FRAC} * s.n_source) AS BIGINT) AS n_kept_exact,
       CAST(coalesce(kept.n_kept, 0)
            - ceil({QUALITY_TOP_FRAC} * s.n_source) AS BIGINT) AS kept_delta
FROM sizes s
JOIN cuts USING (source)
LEFT JOIN kept USING (source)
"""


def _ivfsq_index_sql() -> str:
    """The batch IVF-SQ8 build replay (coarse Lloyd + residual + vmax +
    byte codes — the :func:`_ivfsq_ctes` chain) finished with an md5
    over the comma-joined code sequence, matching the Spark side's
    per-row fingerprint byte for byte."""
    ctes, _ = _ivfsq_ctes([])
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT vec_id, CAST(cluster AS BIGINT) AS cluster,"
        " md5(array_to_string(sq, ',')) AS sq_md5 FROM codes"
    )


EXTENSION_ORACLE_SQL["streaming_ivfsq_index"] = _ivfsq_index_sql()


# ---------------------------------------------------------------- round 13
# Broadcast-Bloom decontamination audit: the oracle rebuilds the SAME
# 2^16-bit / 4-hash filter (bit_or-packed 32-bit lanes over the benchmark
# shingles' Carter-Wegman positions) and probes it per candidate shingle,
# alongside the exact semi-join hit count — bitmap arithmetic replayed
# bit for bit, so any drift in hash constants, lane packing, or the
# one-sided-error contract fails the hash row.
def _bloom_pos_sql() -> str:
    """(A_h·x + B_h) mod M31 mod BLOOM_BITS with h CASE-unrolled from the
    shared MinHash constants — the verbatim Spark probe arithmetic."""
    from hadoop_tfidf_spark.functions.text import BLOOM_BITS, BLOOM_HASHES

    a_case = " ".join(
        f"WHEN {h} THEN {MINHASH_A[h]}" for h in range(BLOOM_HASHES)
    )
    b_case = " ".join(
        f"WHEN {h} THEN {MINHASH_B[h]}" for h in range(BLOOM_HASHES)
    )
    return (
        f"((CASE h {a_case} END * x + CASE h {b_case} END) % {M31})"
        f" % {BLOOM_BITS}"
    )


def _bloom_ctes() -> str:
    """The shared bitmap-build + probe CTE chain through ``bloomagg``
    (per-candidate-doc Bloom hit counts over the %10 split) — used by
    both the batch audit oracle and the streaming stateless twin."""
    from hadoop_tfidf_spark.functions.text import BLOOM_HASHES

    pos = _bloom_pos_sql()
    return f"""cw AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE doc_id % 10 <> 0
),
csh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        FROM cw WHERE len(w) >= 3)
),
bw AS (
  SELECT string_split(text, ' ') AS w
  FROM documents WHERE doc_id % 10 = 0
),
bsh AS (
  SELECT DISTINCT array_to_string(w[i:i+2], ' ') AS shingle
  FROM (SELECT w, unnest(generate_series(1, len(w) - 2)) AS i
        FROM bw WHERE len(w) >= 3)
),
bpos AS (
  SELECT {pos} AS pos
  FROM (SELECT ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {M31} AS x
        FROM bsh)
  CROSS JOIN generate_series(0, {BLOOM_HASHES - 1}) t(h)
),
bitmap AS (
  SELECT pos // 32 AS w_idx, bit_or(1::BIGINT << (pos % 32)) AS bits
  FROM bpos GROUP BY 1
),
cpos AS (
  SELECT doc_id, shingle, {pos} AS pos
  FROM (SELECT doc_id, shingle,
               ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {M31} AS x
        FROM csh)
  CROSS JOIN generate_series(0, {BLOOM_HASHES - 1}) t(h)
),
chit AS (
  SELECT doc_id, shingle,
         bool_and((coalesce(bits, 0) & (1::BIGINT << (pos % 32))) <> 0)
           AS hit
  FROM cpos LEFT JOIN bitmap ON pos // 32 = w_idx
  GROUP BY doc_id, shingle
),
bloomagg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits_bloom
  FROM chit GROUP BY doc_id
)"""


def _decontaminate_bloom_sql() -> str:
    return (
        "WITH "
        + _bloom_ctes()
        + """,
exactagg AS (
  SELECT c.doc_id,
         CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hits_exact
  FROM csh c LEFT JOIN bsh b USING (shingle)
  GROUP BY c.doc_id
)
SELECT a.doc_id, a.n_shingles, e.n_hits_exact, a.n_hits_bloom,
       CAST(a.n_hits_bloom - e.n_hits_exact AS BIGINT) AS n_false_pos,
       CASE WHEN round(e.n_hits_exact * 1.0 / a.n_shingles, 6) <= 0.1
            THEN 1 ELSE 0 END AS keep_exact,
       CASE WHEN round(a.n_hits_bloom * 1.0 / a.n_shingles, 6) <= 0.1
            THEN 1 ELSE 0 END AS keep_bloom
FROM bloomagg a JOIN exactagg e USING (doc_id)
"""
    )


EXTENSION_ORACLE_SQL["text_decontaminate_bloom"] = _decontaminate_bloom_sql()


# Incremental signature maintenance: the oracle signs the NEW generation
# FROM SCRATCH (the full shingle→signature chain over the revised corpus),
# so a hash match proves delta_signatures' carried+fresh union equals the
# batch recompute row for row.
EXTENSION_ORACLE_SQL["dedup_delta_signatures"] = (
    "WITH "
    + _minhash_body_sql(
        "(SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN text || ' v2'"
        " ELSE text END AS text FROM documents WHERE doc_id % 13 <> 0)"
    )
    + "SELECT doc_id, "
    + ", ".join(f"mh_{h}" for h in range(DEFAULT_NUM_HASHES))
    + " FROM sig"
)


# O(delta) signature ledger: the oracle signs gen 1 from scratch WITH the
# stored content-hash column — every doc gets a row (LEFT JOIN: short docs
# carry NULL signatures, exactly sign_generation's rule), so a hash match
# proves the stored-hash diff + carried rows + dirty re-sign equals a full
# re-sign, content hash included.
EXTENSION_ORACLE_SQL["dedup_delta_ledger"] = (
    "WITH newgen AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN"
    " text || ' v2' ELSE text END AS text FROM documents"
    " WHERE doc_id % 13 <> 0),\n"
    + _minhash_body_sql("newgen")
    + "SELECT n.doc_id, md5(n.text) AS text_hash, "
    + ", ".join(f"s.mh_{h}" for h in range(DEFAULT_NUM_HASHES))
    + " FROM newgen n LEFT JOIN sig s ON s.doc_id = n.doc_id"
)


# Stateless streaming Bloom decontamination: the drained per-doc verdicts
# must equal the batch bitmap replay over ALL candidate docs (sub-k-word
# docs carry 0/0/keep=1 — the no-evidence rule).
EXTENSION_ORACLE_SQL["streaming_decontaminate_bloom"] = (
    "WITH "
    + _bloom_ctes()
    + """
SELECT d.doc_id,
       CAST(coalesce(a.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(coalesce(a.n_hits_bloom, 0) AS BIGINT) AS n_hits,
       CASE WHEN coalesce(a.n_shingles, 0) = 0 THEN 1
            WHEN round(a.n_hits_bloom * 1.0 / a.n_shingles, 6) <= 0.1
            THEN 1 ELSE 0 END AS keep
FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) d
LEFT JOIN bloomagg a USING (doc_id)
"""
)
