"""Round-6 new-operator tests: span-level exact dedup, C4-style quality
filters, mixture weights, sequence packing, nearest-centroid label audit —
hand-computed fixtures pinning the semantics the sf0.01 oracles check at
corpus scale."""

from __future__ import annotations


def test_span_dedup_removes_cross_doc_spans(spark):
    """A 5-word span shared verbatim by two docs is removed from both;
    unique spans survive; a doc whose every span is duplicated reassembles
    to the empty string."""
    from hadoop_tfidf_spark.operators.dedup import span_dedup

    boiler = "all rights reserved by corp"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} alpha beta gamma delta epsilon"),
            (2, f"{boiler} zeta eta theta iota kappa"),
            (3, "totally unique words in here"),
            (4, boiler),  # all spans duplicated → empty clean_text
        ],
        "doc_id BIGINT, text STRING",
    )
    got = {r.doc_id: r for r in span_dedup(docs, span_words=5).collect()}
    assert got[1].n_spans == 2 and got[1].n_dup_spans == 1
    assert got[1].clean_text == "alpha beta gamma delta epsilon"
    assert got[2].clean_text == "zeta eta theta iota kappa"
    assert got[3].n_dup_spans == 0
    assert got[3].clean_text == "totally unique words in here"
    assert got[4].n_spans == 1 and got[4].n_dup_spans == 1
    assert got[4].clean_text == ""


def test_span_dedup_partial_tail_span_and_order(spark):
    """The final short span is a first-class span (dedupable), and
    surviving spans re-join in original order."""
    from hadoop_tfidf_spark.operators.dedup import span_dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d e tail bit"),  # spans: "a b c d e", "tail bit"
            (2, "x y z w v tail bit"),
            (3, "p q r s t u v w x y"),  # two full spans, both unique
        ],
        "doc_id BIGINT, text STRING",
    )
    got = {r.doc_id: r for r in span_dedup(docs, span_words=5).collect()}
    assert got[1].n_dup_spans == 1 and got[1].clean_text == "a b c d e"
    assert got[2].clean_text == "x y z w v"
    assert got[3].clean_text == "p q r s t u v w x y"


def test_c4_filters_each_rule(spark):
    """One planted doc per rule violation; a clean doc keeps."""
    from hadoop_tfidf_spark.functions.text import c4_quality_filters

    good = (
        "the quick brown fox jumps over a lazy dog and then sprints "
        "across nine wide fields chasing three very fast rabbits home "
        "before dusk settles"
    )
    docs = spark.createDataFrame(
        [
            (1, good),                               # keep
            (2, "too short a doc"),                  # fails min_words
            (3, ("word " * 30 + "the a ").strip()),  # dup ratio ~1 → fails
            (4, ("x1 y2 z3 q4 " * 8 + "the a").strip()),  # mean len < 3
            (5, ("alpha beta gamma delta epsilon zeta eta theta iota "
                 "kappa lambdaa mu nu xi omicron pi rho sigma tau "
                 "upsilon phi chi psi omega one two") ),  # no stopwords
        ],
        "doc_id BIGINT, text STRING",
    )
    got = {r.doc_id: r for r in c4_quality_filters(docs).collect()}
    assert got[1].keep
    assert not got[2].pass_len and not got[2].keep
    assert not got[3].pass_dup and not got[3].keep
    assert not got[4].pass_word_len and not got[4].keep
    assert not got[5].pass_stop and not got[5].keep


def test_mixture_weights_hand_computed(spark):
    """Two strata, 3:1 token split → shares .75/.25 and uniform weights
    2/3 and 2 (uniform target = half the tokens each)."""
    from hadoop_tfidf_spark.operators.sampling import mixture_weights

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f", "web", "en"),
            (2, "g h i j k l", "web", "en"),
            (3, "m n o p", "books", "en"),
        ],
        "doc_id BIGINT, text STRING, source STRING, lang STRING",
    )
    rows = {
        (r.source, r.lang): r
        for r in mixture_weights(docs, ["source", "lang"]).collect()
    }
    web = rows[("web", "en")]
    books = rows[("books", "en")]
    assert (web.n_docs, web.n_tokens) == (2, 12)
    assert (books.n_docs, books.n_tokens) == (1, 4)
    assert abs(web.token_share - 0.75) < 1e-6
    assert abs(books.token_share - 0.25) < 1e-6
    assert abs(web.uniform_weight - 16 / (2 * 12)) < 1e-6
    assert abs(books.uniform_weight - 16 / (2 * 4)) < 1e-6


def test_pack_sequences_boundaries_and_straddle(spark):
    """Budget 10, one bucket (n_buckets=1 pins every doc to shard 0 under
    the md5 bucketing): docs of 4/4/4 tokens → the third doc starts at
    cum 8 (pack 0, offset 8) and straddles into pack 1 — pack id is
    floor(tokens_before/budget), the concat-then-chunk contract."""
    from hadoop_tfidf_spark.operators.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(0, "a b c d"), (8, "e f g h"), (16, "i j k l"), (24, "m n o p")],
        "doc_id BIGINT, text STRING",
    )
    got = {
        r.doc_id: r
        for r in pack_sequences(docs, budget=10, n_buckets=1).collect()
    }
    assert all(got[i].bucket == 0 for i in (0, 8, 16, 24))
    assert (got[0].pack_id, got[0].offset_in_pack) == (0, 0)
    assert (got[8].pack_id, got[8].offset_in_pack) == (0, 4)
    assert (got[16].pack_id, got[16].offset_in_pack) == (0, 8)
    assert (got[24].pack_id, got[24].offset_in_pack) == (1, 2)


def test_pack_sequences_buckets_are_independent(spark):
    """Docs in different buckets pack independently from offset 0 (ids
    0/1/4 land in md5 buckets 0/1/2 with n_buckets=3 — pinned by the
    same md5('0:{id}') formula the operator uses)."""
    from hadoop_tfidf_spark.operators.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "d e f"), (4, "g h i")],
        "doc_id BIGINT, text STRING",
    )
    got = {r.doc_id: r for r in pack_sequences(docs, budget=4, n_buckets=3).collect()}
    assert {got[i].bucket for i in (0, 1, 4)} == {0, 1, 2}
    assert all(got[i].offset_in_pack == 0 and got[i].pack_id == 0 for i in (0, 1, 4))


def test_nearest_centroid_confusion_separable_labels(spark):
    """Two well-separated label clouds → purely diagonal confusion; a
    planted cross-label outlier lands off-diagonal."""
    from hadoop_tfidf_spark.operators.similarity import (
        label_centroids,
        nearest_centroid_confusion,
    )

    rows = []
    for i in range(10):
        rows.append((i, [10.0 + (i % 3) * 0.01] * 4, 0))
    for i in range(10, 20):
        rows.append((i, [-10.0 - (i % 3) * 0.01] * 4, 1))
    rows.append((99, [-10.0] * 4, 0))  # label-0 vector in the label-1 cloud
    emb = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>, label INT"
    )
    conf = {
        (r.label, r.assigned_label): r.n
        for r in nearest_centroid_confusion(emb).collect()
    }
    assert conf[(0, 0)] == 10 and conf[(1, 1)] == 10
    assert conf[(0, 1)] == 1 and (1, 0) not in conf
    cents = label_centroids(emb).collect()
    assert all(isinstance(r.m, int) for r in cents)
    # 64-dim? no: 4 dims × 2 labels
    assert len(cents) == 8


def test_pq_codes_deterministic_and_in_range(spark):
    """Integer micro-unit PQ: codes are stable across builds and live in
    [0, k); codebooks are plain ints."""
    import random

    from hadoop_tfidf_spark.operators.similarity import pq_build

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    c1, b1 = pq_build(emb, m=2, k=4, iters=1)
    c2, b2 = pq_build(emb, m=2, k=4, iters=1)
    r1 = {r.vec_id: (r.code_0, r.code_1) for r in c1.collect()}
    r2 = {r.vec_id: (r.code_0, r.code_1) for r in c2.collect()}
    assert r1 == r2 and b1 == b2
    assert all(0 <= c < 4 for pair in r1.values() for c in pair)
    assert all(isinstance(x, int) for s in b1 for c in s for x in c)


def test_pq_topk_finds_planted_cluster(spark):
    """Two tight clouds: ADC top-k for a query in cloud A returns only
    cloud-A members (PQ distances separate the clouds), ranked ascending
    with the (adc_d2, vec_id) tie-break."""
    import random

    from hadoop_tfidf_spark.operators.similarity import pq_build, pq_topk

    rng = random.Random(3)
    rows = []
    for i in range(12):
        base = 5.0 if i % 2 == 0 else -5.0
        rows.append((i, [base + rng.uniform(-0.05, 0.05) for _ in range(8)]))
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    codes, books = pq_build(emb, m=2, k=2, iters=2)
    out = pq_topk(emb, codes, books, [0], k=5).collect()
    assert len(out) == 5
    assert all(r.vec_id % 2 == 0 and r.vec_id != 0 for r in out)
    d2s = [r.adc_d2 for r in out]
    assert d2s == sorted(d2s)
    assert [r.rn for r in out] == [1, 2, 3, 4, 5]


def test_streaming_c4_equals_batch(spark):
    """The stateless streaming C4 gate emits exactly the batch filter's
    rows — same verdicts whether the corpus arrives at rest or as a
    stream (4 micro-batches, append drain)."""
    from hadoop_tfidf_spark.extensions import q_streaming_c4_filter, q_text_c4_filters
    from tests.conftest import SF_DIR_SMOKE

    got = {
        r.doc_id: r for r in q_streaming_c4_filter(spark, SF_DIR_SMOKE).collect()
    }
    want = {r.doc_id: r for r in q_text_c4_filters(spark, SF_DIR_SMOKE).collect()}
    assert set(got) == set(want) and got
    for k in want:
        assert got[k] == want[k]


def test_pack_sequences_partition_by_split(spark):
    """Split-aware packing: each partition_by group packs independently
    from offset 0 and docs never share a pack across groups."""
    from hadoop_tfidf_spark.operators.sampling import pack_sequences

    docs = spark.createDataFrame(
        [
            (0, "a b c", "train"),
            (8, "d e f", "train"),
            (16, "g h i", "test"),
        ],
        "doc_id BIGINT, text STRING, split STRING",
    )
    got = {
        r.doc_id: r
        for r in pack_sequences(
            docs, budget=4, n_buckets=1, partition_by=["split"]
        ).collect()
    }
    assert got[0].split == "train" and (got[0].pack_id, got[0].offset_in_pack) == (0, 0)
    assert got[8].split == "train" and (got[8].pack_id, got[8].offset_in_pack) == (0, 3)
    # the test split restarts at zero even though train already consumed tokens
    assert got[16].split == "test" and (got[16].pack_id, got[16].offset_in_pack) == (0, 0)


def test_pack_sequences_shuffle_seed_deterministic_redeal(spark):
    """shuffle_seed packs in md5 order: deterministic across runs, a
    different deal from the doc_id order, and token totals per bucket
    are unchanged (order changes, membership doesn't)."""
    from hadoop_tfidf_spark.operators.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(i, "w " * (i % 5 + 1)) for i in range(0, 64, 2)],
        "doc_id BIGINT, text STRING",
    )
    a = pack_sequences(docs, budget=6, n_buckets=2, shuffle_seed=1).collect()
    b = pack_sequences(docs, budget=6, n_buckets=2, shuffle_seed=1).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    plain = pack_sequences(docs, budget=6, n_buckets=2).collect()
    key = lambda rows: {r.doc_id: (r.pack_id, r.offset_in_pack) for r in rows}
    assert key(a) != key(plain)  # a re-deal, not the identity order
    tot = lambda rows: {
        bkt: sum(r.n_tokens for r in rows if r.bucket == bkt) for bkt in (0, 1)
    }
    assert tot(a) == tot(plain)


def test_corpus_diff_all_statuses(spark):
    """One doc per status class, classified by content hash."""
    from hadoop_tfidf_spark.operators.dedup import corpus_diff

    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "will vanish")],
        "doc_id BIGINT, text STRING",
    )
    new = spark.createDataFrame(
        [(1, "same text"), (2, "changed text"), (4, "brand new")],
        "doc_id BIGINT, text STRING",
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_self_dedup_spans_first_occurrence_wins(spark):
    """Within-doc repeats trim to their first occurrence, in order;
    unique docs pass through; empty docs yield empty output."""
    from hadoop_tfidf_spark.functions.text import self_dedup_spans

    docs = spark.createDataFrame(
        [(1, "a b a b c d a b"), (2, "x y z"), (3, "")],
        "doc_id BIGINT, text STRING",
    )
    got = {r.doc_id: r for r in self_dedup_spans(docs, span_words=2).collect()}
    assert (got[1].n_spans, got[1].n_repeated) == (4, 2)
    assert got[1].clean_text == "a b c d"
    assert got[2].n_repeated == 0 and got[2].clean_text == "x y z"
    assert (got[3].n_spans, got[3].clean_text) == (0, "")


def test_decontaminate_drops_overlapping_docs(spark):
    """A doc sharing most shingles with the benchmark is dropped; a
    clean doc and a too-short doc (no shingle evidence) are kept."""
    from hadoop_tfidf_spark.functions.text import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # = bench
            (2, "completely unrelated training text goes here"),
            (3, "hi there"),  # < k words: no evidence, kept
        ],
        "doc_id BIGINT, text STRING",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over anything")],
        "doc_id BIGINT, text STRING",
    )
    kept = sorted(r.doc_id for r in decontaminate(docs, bench, k=3, max_overlap=0.3).collect())
    assert kept == [2, 3]
