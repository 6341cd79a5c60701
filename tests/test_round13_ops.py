"""Round-13 pins: executor-side IVF probe selection (the bulk-query
scale path — zero query-side collect), its bit-equivalence to the
interactive driver-loop path, and the auto threshold that picks
between them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_tfidf_spark.operators import similarity as S
from tests.conftest import SF_DIR_SMOKE

IVF_UNITS = 1_000_000


@pytest.fixture(scope="module")
def ivf_index(spark):
    emb = spark.read.parquet(f"{SF_DIR_SMOKE}/embeddings.parquet")
    assigned, cents = S.ivf_build(emb, k=16, iters=1, units=IVF_UNITS)
    return emb, assigned, cents


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_executor_probes_bit_equal_driver_probes_units(spark, ivf_index):
    """units mode: the nearest_centroid_ids expression must reproduce the
    driver loop's python-int distances and (d2, ci) tie-break exactly —
    same probes, same candidates, same top-k, bit for bit."""
    emb, assigned, cents = ivf_index
    queries = emb.where(F.col("vec_id") < 40)
    a = S.ivf_topk(
        assigned, cents, queries, k=5, nprobe=3, units=IVF_UNITS,
        probe_select="driver",
    )
    b = S.ivf_topk(
        assigned, cents, queries, k=5, nprobe=3, units=IVF_UNITS,
        probe_select="executor",
    )
    ra, rb = _rows(a), _rows(b)
    assert ra == rb
    assert len(ra) == 40 * 5


def test_executor_probes_match_driver_float_path(spark, ivf_index):
    """float mode: same equivalence on this fixture (the paths can only
    diverge on near-exact centroid ties, which the fixture has none of)."""
    emb, assigned, cents = ivf_index
    queries = emb.where(F.col("vec_id") < 20)
    a = S.ivf_topk(assigned, cents, queries, k=5, nprobe=2,
                   probe_select="driver")
    b = S.ivf_topk(assigned, cents, queries, k=5, nprobe=2,
                   probe_select="executor")
    assert _rows(a) == _rows(b)


def test_executor_path_has_zero_query_side_collect(spark, ivf_index):
    """The bulk-path plan census: a driver-selected probe relation
    materializes as a LocalTableScan (createDataFrame of collected query
    rows); the executor path must have NONE — every relation in its plan
    comes from the distributed scan, so a 10⁶-query re-rank never funnels
    through the driver."""
    emb, assigned, cents = ivf_index
    ex = S.ivf_topk(
        assigned, cents, emb, k=5, nprobe=2, units=IVF_UNITS,
        probe_select="executor",
    )
    plan = ex._jdf.queryExecution().optimizedPlan().toString()
    # createDataFrame(collected rows) plans as LogicalRDD/LocalRelation;
    # the executor path must have neither
    assert "LogicalRDD" not in plan and "LocalRelation" not in plan
    # contrast pin: the driver path DOES carry the collected probe rows
    dr = S.ivf_topk(
        assigned, cents, emb.where(F.col("vec_id") < 5), k=5, nprobe=2,
        units=IVF_UNITS, probe_select="driver",
    )
    dplan = dr._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in dplan


def test_auto_threshold_picks_by_query_count(spark, ivf_index):
    """probe_select="auto" keeps the interactive collect path for small
    query sets (<= DRIVER_PROBE_MAX) and switches to the executor
    expression beyond it — observable from whether the probe relation is
    a LocalRelation."""
    emb, assigned, cents = ivf_index
    small = S.ivf_topk(
        assigned, cents, emb.where(F.col("vec_id") < 3), k=5, nprobe=2,
        units=IVF_UNITS, probe_select="auto",
    )
    assert "LogicalRDD" in small._jdf.queryExecution().optimizedPlan().toString()
    big = S.ivf_topk(  # 500 > DRIVER_PROBE_MAX=256
        assigned, cents, emb, k=5, nprobe=2, units=IVF_UNITS,
        probe_select="auto",
    )
    big_plan = big._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" not in big_plan and "LocalRelation" not in big_plan
    assert S.DRIVER_PROBE_MAX == 256


def test_nearest_centroid_ids_first_element_is_assign_argmin(spark, ivf_index):
    """nprobe=1 of the probe expression is the same argmin ivf_build's
    assign computes — the two expressions can never disagree on a
    vector's home cell."""
    emb, assigned, cents = ivf_index
    got = (
        emb.select(
            "vec_id",
            F.element_at(
                S.nearest_centroid_ids(F.col("embedding"), cents, 1, IVF_UNITS), 1
            ).alias("cell"),
        )
        .join(assigned.select("vec_id", "cluster"), "vec_id")
        .where(F.col("cell") != F.col("cluster"))
        .count()
    )
    assert got == 0


# ------------------------------------------------ adaptive quality cut


@pytest.fixture(scope="module")
def adaptive_rows(spark):
    from hadoop_tfidf_spark.extensions import (
        q_text_quality_adaptive,
        q_text_quality_adaptive_approx,
    )

    approx = {
        r["source"]: r
        for r in q_text_quality_adaptive_approx(spark, SF_DIR_SMOKE).collect()
    }
    exact_kept = (
        q_text_quality_adaptive(spark, SF_DIR_SMOKE)
        .groupBy("source")
        .count()
        .collect()
    )
    return approx, {r["source"]: r["count"] for r in exact_kept}


def test_adaptive_approx_delta_bounded(adaptive_rows):
    """The production threshold cut keeps floor(q·n) on distinct values
    vs the exact rank cut's ceil(q·n) — |delta| <= 1 absent quality
    ties, and the accounting columns agree with the exact twin."""
    approx, exact = adaptive_rows
    assert set(approx) == set(exact)
    for src, row in approx.items():
        assert row["n_kept_exact"] == exact[src]
        assert row["kept_delta"] == row["n_kept"] - row["n_kept_exact"]
        assert abs(row["kept_delta"]) <= 1


def test_adaptive_approx_plan_has_no_window_or_sort(spark):
    """The production form's whole point: the corpus is never
    sort-shuffled — no Window in the plan (the exact twin has one), the
    cutoff relation joins back as a broadcast."""
    from hadoop_tfidf_spark.extensions import (
        q_text_quality_adaptive,
        q_text_quality_adaptive_approx,
    )

    plan = (
        q_text_quality_adaptive_approx(spark, SF_DIR_SMOKE)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Window" not in plan and "Sort" not in plan
    exact_plan = (
        q_text_quality_adaptive(spark, SF_DIR_SMOKE)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Window" in exact_plan


# ------------------------------------------------ update-ledger semantics


@pytest.fixture()
def ledger_sink(spark, tmp_path):
    from hadoop_tfidf_spark.streaming.ledger import ledger_upsert

    sink = str(tmp_path / "ledger")
    up = ledger_upsert(sink)
    mk = lambda rows: spark.createDataFrame(rows, "k STRING, n BIGINT")
    up(mk([("a", 1), ("b", 1)]), 0)
    up(mk([("a", 2), ("c", 1)]), 1)
    up(mk([("b", 5)]), 2)
    up(mk([("c", 7), ("d", 1)]), 3)
    return sink, up, mk


def _state(spark, sink):
    from hadoop_tfidf_spark.streaming.ledger import (
        read_ledger,
        reconstruct_latest,
    )

    return sorted(
        map(tuple, reconstruct_latest(read_ledger(spark, sink), ["k"]).collect())
    )


def test_ledger_replay_is_idempotent(spark, ledger_sink):
    """foreachBatch is at-least-once: a re-delivered batch_id must leave
    reconstruction AND the generation layout unchanged (the overwrite
    rewrites its own dir; the old append scheme duplicated rows)."""
    from hadoop_tfidf_spark.streaming.ledger import ledger_generations

    sink, up, mk = ledger_sink
    before = _state(spark, sink)
    assert before == [("a", 2), ("b", 5), ("c", 7), ("d", 1)]
    up(mk([("b", 5)]), 2)  # replayed micro-batch, same content
    assert _state(spark, sink) == before
    assert ledger_generations(sink) == [0, 1, 2, 3]


def test_compact_is_reconstruction_invariant(spark, ledger_sink):
    """Folding generations 0..2 into one base changes the layout, never
    the state; newer generations still shadow the base."""
    from hadoop_tfidf_spark.streaming.ledger import (
        compact_ledger,
        ledger_generations,
    )

    sink, up, mk = ledger_sink
    before = _state(spark, sink)
    folded = compact_ledger(spark, sink, ["k"], through=2)
    assert folded == 3
    assert ledger_generations(sink) == [2, 3]
    assert _state(spark, sink) == before
    # a later delta on top of the compacted base still wins
    up(mk([("a", 9)]), 4)
    assert _state(spark, sink) == [("a", 9), ("b", 5), ("c", 7), ("d", 1)]


def test_compact_single_generation_is_noop(spark, ledger_sink):
    from hadoop_tfidf_spark.streaming.ledger import (
        compact_ledger,
        ledger_generations,
    )

    sink, up, mk = ledger_sink
    assert compact_ledger(spark, sink, ["k"], through=0) == 1
    assert ledger_generations(sink) == [0, 1, 2, 3]


# ------------------------------------------------ IVFADC executor probes


def test_ivfpq_executor_path_bit_equal_and_collect_free(spark, ivf_index):
    """ivfpq_topk's executor path: probe cells from nearest_centroid_ids
    and ADC tables from the _adc_expr expression must reproduce the
    driver loop bit for bit (all-integer arithmetic both ways), with a
    LogicalRDD-free plan. Covers plain AND residual mode (per-probed-
    cell residual tables — the Jégou §IV grain)."""
    emb, _, _ = ivf_index
    U = 1_000_000
    qids = list(range(20))
    codes, books = S.pq_build(emb, m=4, k=16, iters=1, units=U, pack=True)
    assigned, cents = S.ivf_build(emb, k=16, iters=1, units=U)
    a = S.ivfpq_topk(assigned, cents, codes, books, qids, k=5, nprobe=2,
                     units=U, probe_select="driver")
    b = S.ivfpq_topk(assigned, cents, codes, books, qids, k=5, nprobe=2,
                     units=U, probe_select="executor")
    assert _rows(a) == _rows(b)
    rassigned, rcents, rcodes, rbooks = S.ivfpq_build_residual(
        emb, coarse_k=16, coarse_iters=1, m=4, k=16, iters=1, units=U
    )
    ra = S.ivfpq_topk(rassigned, rcents, rcodes, rbooks, qids, k=5, nprobe=2,
                      units=U, residual=True, embeddings=emb,
                      probe_select="driver")
    rb = S.ivfpq_topk(rassigned, rcents, rcodes, rbooks, qids, k=5, nprobe=2,
                      units=U, residual=True, embeddings=emb,
                      probe_select="executor")
    assert _rows(ra) == _rows(rb)
    plan = rb._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" not in plan and "LocalRelation" not in plan


# ------------------------------------ broadcast-Bloom decontamination


@pytest.fixture(scope="module")
def decon_split(spark):
    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    return (
        docs.where(F.col("doc_id") % 10 != 0),
        docs.where(F.col("doc_id") % 10 == 0),
    )


def test_bloom_one_sided_error(spark, decon_split):
    """Structural contract: a Bloom probe can false-positive but never
    false-negative — per doc, exact hits <= bloom hits <= n_shingles,
    over the same doc set the exact form emits."""
    from hadoop_tfidf_spark.functions.text import (
        contamination_bloom,
        contamination_check,
    )

    cand, bench = decon_split
    exact = {
        r["doc_id"]: r["n_hits"]
        for r in contamination_check(cand, bench, k=3).collect()
    }
    bloom = {
        r["doc_id"]: (r["n_hits"], r["n_shingles"])
        for r in contamination_bloom(cand, bench, k=3).collect()
    }
    assert set(exact) == set(bloom)
    for d, (nb, ns) in bloom.items():
        assert exact[d] <= nb <= ns


def test_bloom_fully_contaminated_doc_saturates(spark):
    """A candidate identical to a benchmark doc hits on EVERY shingle
    (no-false-negative in its sharpest form)."""
    from hadoop_tfidf_spark.functions.text import contamination_bloom

    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    cand = spark.createDataFrame(
        [(2, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    row = contamination_bloom(cand, bench, k=3).collect()[0]
    assert (row["n_shingles"], row["n_hits"]) == (3, 3)
    assert row["overlap_ratio"] == 1.0


def test_bloom_matches_pure_python_replay(spark):
    """Engine-independent bit pin: the packed-lane bitmap and the 4-hash
    probe replayed with hashlib/ints must give the same per-doc hit
    counts — any drift in lane packing, hash constants, or modulo order
    fails here before it fails the oracle."""
    import hashlib

    from hadoop_tfidf_spark.functions.text import (
        BLOOM_BITS,
        BLOOM_HASHES,
        contamination_bloom,
    )
    from hadoop_tfidf_spark.operators.dedup import M31, MINHASH_A, MINHASH_B

    bench_texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
    ]
    cand_texts = {
        10: "the quick brown fox leaps over a sleepy dog",
        11: "zeta eta theta iota kappa lambda",
        12: "pack my box with five dozen liquor jugs",
    }

    def sh(t, k=3):
        w = t.split(" ")
        if len(w) < k:
            return set()
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    def positions(s):
        x = int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % M31
        return [
            ((MINHASH_A[h] * x + MINHASH_B[h]) % M31) % BLOOM_BITS
            for h in range(BLOOM_HASHES)
        ]

    bits: set[int] = set()
    for t in bench_texts:
        for s in sh(t):
            bits.update(positions(s))
    expected = {}
    for d, t in cand_texts.items():
        grams = sh(t)
        hits = sum(1 for g in grams if all(p in bits for p in positions(g)))
        expected[d] = (len(grams), hits)

    bench = spark.createDataFrame(
        [(i, t) for i, t in enumerate(bench_texts)], "doc_id long, text string"
    )
    cand = spark.createDataFrame(
        list(cand_texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_hits"])
        for r in contamination_bloom(cand, bench, k=3).collect()
    }
    assert got == expected
    # the identical doc must saturate; sanity that the fixture exercises both
    assert expected[12][0] == expected[12][1] > 0


def test_bloom_probe_plan_is_join_free(spark, decon_split):
    """The scale claim as a census: the corpus-side plan has NO join of
    any kind (the filter rides as a literal; the exact form's semi-join
    is gone) — membership resolves inside the scan stage."""
    from hadoop_tfidf_spark.functions.text import contamination_bloom

    cand, bench = decon_split
    plan = (
        contamination_bloom(cand, bench, k=3)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Join" not in plan


# ------------------------------------ incremental signature maintenance


def _new_gen(docs):
    return docs.where(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def test_delta_signatures_equal_full_recompute(spark):
    """The headline contract: carried + fresh == signing the new
    generation from scratch, row for row, all 12 hash columns."""
    from hadoop_tfidf_spark.operators import dedup as D

    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    old = docs.where(F.col("doc_id") % 10 != 0)
    new = _new_gen(docs)
    old_sigs = D.minhash_signatures(D.shingles(old))
    delta = D.delta_signatures(old_sigs, D.corpus_diff(old, new), new)
    full = D.minhash_signatures(D.shingles(new))
    assert _rows(delta) == _rows(full)


def test_delta_signatures_carry_stored_rows_not_recompute(spark):
    """Tamper an UNCHANGED doc's stored signature: the tampered value
    must flow through (proof the unchanged path is a semi-join carry,
    not a silent recompute), while added/changed docs come out fresh."""
    from hadoop_tfidf_spark.operators import dedup as D

    old = spark.createDataFrame(
        [(1, "a b c d"), (2, "e f g h")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a b c d"), (2, "e f g h revised"), (3, "i j k l")],
        "doc_id long, text string",
    )
    mh_cols = [f"mh_{h}" for h in range(12)]
    tampered = D.minhash_signatures(D.shingles(old)).select(
        "doc_id",
        *[
            F.when(F.col("doc_id") == 1, F.lit(-999))
            .otherwise(F.col(c))
            .cast("long")
            .alias(c)
            for c in mh_cols
        ],
    )
    out = {
        r["doc_id"]: tuple(r[c] for c in mh_cols)
        for r in D.delta_signatures(
            tampered, D.corpus_diff(old, new), new
        ).collect()
    }
    fresh = {
        r["doc_id"]: tuple(r[c] for c in mh_cols)
        for r in D.minhash_signatures(D.shingles(new)).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1] == tuple([-999] * 12)  # carried verbatim from the store
    assert out[2] == fresh[2] and out[3] == fresh[3]  # re-signed


def test_delta_changed_doc_below_k_words_loses_its_row(spark):
    """A revision that shrinks a doc below k words removes its signature
    row — exactly what a from-scratch signing produces."""
    from hadoop_tfidf_spark.operators import dedup as D

    old = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    out = D.delta_signatures(
        D.minhash_signatures(D.shingles(old)), D.corpus_diff(old, new), new
    )
    assert out.count() == 0


# ------------------------------------ stateless Bloom (streaming form)


def test_bloom_stateless_matches_agg_form_and_keeps_short_docs(spark):
    """Row-local verdicts == the aggregation form on every >=k-word doc;
    sub-k docs are emitted with (0, 0, keep=1) — the no-evidence rule."""
    from hadoop_tfidf_spark.functions.text import (
        bloom_bitmap,
        contamination_bloom,
        contamination_bloom_stateless,
    )

    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    cand = docs.where(F.col("doc_id") % 10 != 0).limit(200)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    short = spark.createDataFrame([(999_001, "one two")], "doc_id long, text string")
    bm = bloom_bitmap(bench, k=3)
    agg = {
        r["doc_id"]: (r["n_shingles"], r["n_hits"])
        for r in contamination_bloom(cand, bitmap=bm, k=3).collect()
    }
    stateless = {
        r["doc_id"]: (r["n_shingles"], r["n_hits"], r["keep"])
        for r in contamination_bloom_stateless(
            cand.unionByName(short), bm, k=3
        ).collect()
    }
    assert set(stateless) == set(agg) | {999_001}
    assert stateless[999_001] == (0, 0, 1)
    for d, (ns, nh) in agg.items():
        assert stateless[d][:2] == (ns, nh)
        assert stateless[d][2] == int(round(nh / ns, 6) <= 0.1)


def test_bloom_stateless_plan_is_a_pure_projection(spark, decon_split):
    """ZERO exchanges, ZERO joins, ZERO aggregates — the structural fact
    that makes the streaming twin stateless/watermarkless."""
    from hadoop_tfidf_spark.functions.text import (
        bloom_bitmap,
        contamination_bloom_stateless,
    )

    cand, bench = decon_split
    bm = bloom_bitmap(bench, k=3)
    plan = (
        contamination_bloom_stateless(cand, bm, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Aggregate" not in plan


def test_decontaminate_bloom_apply_superset_of_exact_drop(spark, decon_split):
    """The Bloom APPLY keeps a SUBSET of the exact apply's kept set
    (one-sided error drops extra, never fewer) and keeps sub-k docs."""
    from hadoop_tfidf_spark.functions.text import (
        decontaminate,
        decontaminate_bloom,
    )

    cand, bench = decon_split
    cand = cand.select("doc_id", "text")
    short = spark.createDataFrame(
        [(999_002, "just two")], "doc_id long, text string"
    )
    kept_exact = {
        r["doc_id"] for r in decontaminate(cand, bench, k=3).collect()
    }
    kept_bloom = {
        r["doc_id"]
        for r in decontaminate_bloom(
            cand.unionByName(short), bench, k=3
        ).collect()
    }
    assert 999_002 in kept_bloom
    assert kept_bloom - {999_002} <= kept_exact
    assert kept_bloom  # non-vacuous: something survives


# --------------------------------- compaction crash-safety (round 13b)


def test_compact_crash_before_swap_rolls_back(spark, ledger_sink):
    """A tmp dir with NO trashed generations = a compaction that died
    before touching any original dir (or one still writing its base):
    every original generation is intact, so concurrent serving reads
    WORK through the whole build phase — only the swap window itself
    blocks — and re-running compact_ledger rolls the tmp back and
    completes fresh, state unchanged."""
    import os

    from hadoop_tfidf_spark.streaming.ledger import compact_ledger

    sink, up, mk = ledger_sink
    want = _state(spark, sink)
    os.makedirs(f"{sink}/_compact_tmp_through=2")
    assert _state(spark, sink) == want  # no raise: originals all present
    assert compact_ledger(spark, sink, ["k"], through=2) == 3
    assert _state(spark, sink) == want


def test_compact_crash_mid_swap_resumes(spark, ledger_sink):
    """Crash AFTER the folded dirs were trashed but BEFORE the tmp
    renamed into place: the tmp holds the only complete copy — reads
    refuse, and re-running compact_ledger finishes the rename; nothing
    is lost."""
    import glob
    import os

    from hadoop_tfidf_spark.streaming.ledger import compact_ledger

    sink, up, mk = ledger_sink
    want = _state(spark, sink)
    # run a real compaction, then reconstruct its mid-swap crash state:
    # base dir back to tmp, a trash marker present
    assert compact_ledger(spark, sink, ["k"], through=2) == 3
    os.rename(f"{sink}/batch_id=2", f"{sink}/_compact_tmp_through=2")
    os.makedirs(f"{sink}/_trash_batch_id=0")
    with pytest.raises(RuntimeError, match="mid-compaction-swap"):
        _state(spark, sink)
    compact_ledger(spark, sink, ["k"], through=2)
    assert _state(spark, sink) == want
    assert not glob.glob(f"{sink}/_trash_batch_id=*")
    assert not glob.glob(f"{sink}/_compact_tmp_through=*")


def test_compact_crash_after_swap_leaves_readable_state(spark, ledger_sink):
    """Crash after the final rename, before trash cleanup: the ledger is
    complete — reads WORK (trash is ignorable garbage) and the next
    compact_ledger clears it."""
    import glob
    import os

    from hadoop_tfidf_spark.streaming.ledger import compact_ledger

    sink, up, mk = ledger_sink
    want = _state(spark, sink)
    os.makedirs(f"{sink}/_trash_batch_id=99")
    assert _state(spark, sink) == want  # no raise: state is complete
    compact_ledger(spark, sink, ["k"], through=2)
    assert _state(spark, sink) == want
    assert not glob.glob(f"{sink}/_trash_batch_id=*")


def test_compact_crash_mid_trash_loop_recovers(spark, ledger_sink):
    """Crash INSIDE the trash-rename loop: some batch_id<=through dirs
    (including batch_id=through itself) are still in place alongside the
    tmp — recovery must finish trashing them before the rename instead
    of wedging on ENOTEMPTY."""
    import glob
    import os
    import shutil

    from hadoop_tfidf_spark.streaming.ledger import compact_ledger

    sink, up, mk = ledger_sink
    want = _state(spark, sink)
    # reconstruct the mid-loop crash: tmp present, batch_id=0 trashed,
    # batch_id=1 and batch_id=2 (the through target) still in place
    assert compact_ledger(spark, sink, ["k"], through=2) == 3
    # state now: batch_id=2 (base), batch_id=3. Rebuild the crash layout:
    shutil.copytree(f"{sink}/batch_id=2", f"{sink}/_compact_tmp_through=2")
    os.makedirs(f"{sink}/_trash_batch_id=0")
    with pytest.raises(RuntimeError, match="mid-compaction-swap"):
        _state(spark, sink)
    compact_ledger(spark, sink, ["k"], through=2)  # must not raise
    assert _state(spark, sink) == want
    assert not glob.glob(f"{sink}/_compact_tmp_through=*")
    assert not glob.glob(f"{sink}/_trash_batch_id=*")


def test_read_ledger_empty_sink_raises_clearly(spark, tmp_path):
    """Zero generations (nothing committed / mistyped path) raises a
    clear FileNotFoundError, not Spark's UNABLE_TO_INFER_SCHEMA."""
    from hadoop_tfidf_spark.streaming.ledger import read_ledger

    with pytest.raises(FileNotFoundError, match="no batch_id"):
        read_ledger(spark, str(tmp_path / "nope"))
