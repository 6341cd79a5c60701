"""Round-4 operator semantics: forward as-of join, RANGE window frames,
min_by/max_by extremes, window-over-aggregate shares, co-occurrence, and
the schema-adaptive events loader."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_tfidf_spark.functions.text import cooccurrence
from hadoop_tfidf_spark.operators import relational as R
from hadoop_tfidf_spark.operators.asof import asof_join
from hadoop_tfidf_spark.sources.events import load_events

SF_DIR_SMOKE = "/root/testdata/sf0.001"


def test_asof_forward_picks_earliest_at_or_after(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 40), (2, 5)], "id INT, t BIGINT"
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 30, "b"), (2, 1, "c")], "id INT, rt BIGINT, v STRING"
    )
    out = asof_join(
        left, right, on="id", left_time="t", right_time="rt",
        right_values=["v"], direction="forward",
    )
    got = {(r.id, r.t): r.v_asof for r in out.collect()}
    # t=10 matches rt=10 (inclusive), t=25 skips ahead to rt=30,
    # t=40 has nothing after it, id=2 t=5 has nothing at-or-after
    assert got == {(1, 10): "a", (1, 25): "b", (1, 40): None, (2, 5): None}


def test_asof_backward_still_latest_at_or_before(spark):
    left = spark.createDataFrame([(1, 10), (1, 35)], "id INT, t BIGINT")
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 30, "b")], "id INT, rt BIGINT, v STRING"
    )
    out = asof_join(
        left, right, on="id", left_time="t", right_time="rt",
        right_values=["v"], direction="backward",
    )
    got = {(r.id, r.t): r.v_asof for r in out.collect()}
    assert got == {(1, 10): "a", (1, 35): "b"}


def test_asof_rejects_unknown_direction(spark):
    df = spark.range(1)
    try:
        asof_join(df, df, on="id", left_time="id", right_time="id",
                  right_values=["id"], direction="sideways")
    except ValueError as e:
        assert "sideways" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_range_frame_counts_time_not_rows(spark):
    # Three events inside one 3600 s horizon, one far outside it.
    ev = spark.createDataFrame(
        [(1, 100, 0, 1.0), (2, 100, 1800, 2.0), (3, 100, 3600, 4.0),
         (4, 100, 100000, 8.0)],
        "event_id BIGINT, user_id BIGINT, s BIGINT, value DOUBLE",
    ).withColumn("ts_ns", F.col("s") * F.lit(1_000_000_000)).drop("s")
    out = {r.event_id: (r.trailing_sum, r.trailing_n)
           for r in R.events_range_frame(ev).collect()}
    assert out[1] == (1.0, 1)
    assert out[2] == (3.0, 2)
    # t=3600 still includes t=0 (inclusive 3600 s lookback)
    assert out[3] == (7.0, 3)
    # the outlier's frame contains only itself
    assert out[4] == (8.0, 1)


def test_user_extremes_tie_breaks_on_event_id(spark):
    ev = spark.createDataFrame(
        [(1, 7, "click", 5.0), (2, 7, "view", 5.0), (3, 7, "error", 1.0)],
        "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE",
    )
    row = R.user_event_extremes(ev).collect()[0]
    # max tie at 5.0 → greater event_id (view); min is the 1.0 row
    assert row.top_event_type == "view"
    assert row.bottom_event_type == "error"
    assert row.n_events == 3


def test_market_share_sums_to_one_per_region_year(spark):
    out = (
        R.nation_market_share(
            *(spark.read.parquet(f"{SF_DIR_SMOKE}/{t}.parquet")
              for t in ("orders", "customer", "nation", "region"))
        )
        .groupBy("r_name", "o_year")
        .agg(F.round(F.sum("share"), 3).alias("total"))
        .collect()
    )
    assert out and all(abs(r.total - 1.0) < 0.01 for r in out)


def test_cooccurrence_counts_pairs_once_per_doc(spark):
    docs = spark.createDataFrame(
        [("d1", "a b a"), ("d2", "b a"), ("d3", "c")], "doc_id STRING, text STRING"
    )
    rows = cooccurrence(docs, top=10).collect()
    assert [(r.w1, r.w2, r.n) for r in rows] == [("a", "b", 2)]


def test_cooccurrence_max_doc_vocab_caps_giant_doc(spark):
    """A planted giant-vocabulary doc must not explode quadratically: with
    the cap, only its first ``max_doc_vocab`` distinct tokens (document
    order) pair up; normal docs are untouched."""
    giant = " ".join(f"w{i:04d}" for i in range(1000))
    docs = spark.createDataFrame(
        [("g", giant), ("d1", "a b"), ("d2", "a b")],
        "doc_id STRING, text STRING",
    )
    capped = cooccurrence(docs, top=10_000, max_doc_vocab=3).collect()
    got = {(r.w1, r.w2): r.n for r in capped}
    # giant doc contributes exactly C(3,2)=3 pairs from its first 3 tokens
    assert got[("a", "b")] == 2
    assert got[("w0000", "w0001")] == 1
    assert got[("w0000", "w0002")] == 1
    assert got[("w0001", "w0002")] == 1
    assert len(got) == 4
    # uncapped default is unchanged semantics: the giant doc alone yields
    # C(1000,2) pairs — checked by count, not materialized comparison
    n_uncapped = (
        cooccurrence(docs.where(F.col("doc_id") == "g"), top=1).collect()[0].n
    )
    assert n_uncapped == 1


def test_load_events_normalizes_timestamp_schema(spark):
    ev = load_events(spark, SF_DIR_SMOKE)
    types = dict(ev.dtypes)
    assert types["ts_ns"] == "bigint"
    assert types["ts"] == "timestamp"
    row = ev.select(
        (F.col("ts_ns") - F.unix_micros("ts") * 1000).alias("d")
    ).agg(F.max(F.abs("d"))).collect()[0][0]
    assert row == 0


def test_interval_join_streaming_matches_batch(spark):
    """The stream-stream interval join must produce exactly the batch
    twin's pair set (same horizon), drained with availableNow."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    batch = {
        (r.click_id, r.purchase_id)
        for r in qs["events_interval_join"](spark, SF_DIR_SMOKE).collect()
    }
    stream = {
        (r.click_id, r.purchase_id)
        for r in qs["streaming_interval_join"](spark, SF_DIR_SMOKE).collect()
    }
    assert stream == batch and len(batch) > 0


def test_contamination_bounds_and_self_overlap(spark):
    from hadoop_tfidf_spark.functions.text import contamination_check

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c"), (3, "x y z w")],
        "doc_id BIGINT, text STRING",
    )
    bench = spark.createDataFrame([(9, "a b c")], "doc_id BIGINT, text STRING")
    out = {r.doc_id: r for r in contamination_check(docs, bench, k=3).collect()}
    # doc 1: shingles {a b c, b c d} → 1 hit of 2; doc 2 fully contained;
    # doc 3 disjoint
    assert out[1].n_shingles == 2 and out[1].n_hits == 1
    assert abs(out[1].overlap_ratio - 0.5) < 1e-9
    assert out[2].overlap_ratio == 1.0
    assert out[3].n_hits == 0 and out[3].overlap_ratio == 0.0


def test_doc_similarity_identical_docs_score_one(spark):
    from hadoop_tfidf_spark.search import doc_similarity
    from hadoop_tfidf_spark.tfidf import tfidf

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon")],
        "doc_id BIGINT, text STRING",
    )
    out = {(r.doc_a, r.doc_b): r.cos_sim
           for r in doc_similarity(tfidf(docs), k=10).collect()}
    # identical docs → cosine 1; disjoint vocab docs never pair
    assert out[(1, 2)] == 1.0
    assert (1, 3) not in out and (2, 3) not in out
