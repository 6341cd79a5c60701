"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is forced to full materialization with the noop sink (no
driver-side collect cost, no result-size bias). The reported ``value`` is
total wall-clock seconds across the headline set; per-query seconds are in
``queries``.

Regression tripwire: per-query times are compared against the MAX of the
last ``REGRESSION_LOOKBACK`` recorded ``BENCH_r*.json`` rounds next to
this file (max, because a single lucky-fast round would otherwise flag
the next normal one — measured cross-round noise on identical code
reaches 2× on sub-second queries, e.g. rel_top_customers 0.36→0.19
r4→r5). A shared query slower than ``REGRESSION_FACTOR``× that baseline
AND by more than ``REGRESSION_FLOOR_S`` absolute is first RE-MEASURED
alone (the retry pass — a full-set drive inflates individual rows via
host contention; round 10 tripped tfidf/search/rank on byte-identical
code and an exclusive re-run cleared all three), and only if it still
trips is it reported in the ``regressions`` list and fails the run with
rc=2 — so a silent slowdown becomes a hard signal the round it happens,
and single-process contention cannot produce a false one. Set
``SPARK_GRAFT_BENCH_NO_TRIPWIRE=1`` to report without failing.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

REGRESSION_FACTOR = 1.5
# 0.25, not higher (per round-6 advisory): min-of-3 trials brings
# observed same-code flakes under the 1.5x factor (the recorded 2.4x
# band was measured with min-of-2), so widening the absolute floor would
# only grow the blind spot for real regressions in sub-second queries.
# If a sub-0.5s query ever trips on unchanged code, the remedy is a
# rerun (documented noise), not a wider floor.
REGRESSION_FLOOR_S = 0.25
REGRESSION_LOOKBACK = 2

#: Queries whose CONSTRUCTION runs eager index builds (Lloyd collects,
#: permutation training) that the noop-write timer never sees but the
#: bench pays per trial: one trial each, so the full-set wall stays
#: bounded as the headline grows. Their timed stage is a deterministic
#: scan whose min-of-1 noise the tripwire retry pass absorbs.
SINGLE_TRIAL = {"sim_topk_opq_ivfpq", "sim_topk_ivfsq"}

#: Queries whose SEMANTICS changed in a given round: timings from rounds
#: BEFORE the marker measure a different computation, so the tripwire
#: skips those baselines (comparisons resume the round after the change
#: lands its own recorded row — nothing is permanently exempted).
#: multimodal_decode r8: payload generation moved from a JVM text-encode
#: fake to Python-synthesized real multi-frame PPM (a second Arrow
#: stage) and decode now parses real pixel bytes — the r6/r7 rows timed
#: the md5 stub.
BASELINE_RESET = {"multimodal_decode": 8}

#: The headline set: the full core TF-IDF pipeline plus one representative
#: query per extension family. The remaining declared queries still run in
#: the correctness gate (they're all in queries()); keeping the bench set
#: curated bounds wall-clock and keeps the timing signal per-family.
HEADLINE = [
    # core pipeline (reference parity)
    "tokens", "doc_word_count", "term_frequency", "doc_frequency",
    "tfidf", "search", "rank", "tfidf_rank",
    # end-to-end corpus curation (lang→quality→dedup→near-dup→split)
    # and its training-ready extension (+ split-aware sequence packing)
    "pipeline_curate", "pipeline_curate_pack", "pipeline_curate_semantic",
    # modern ranking (Okapi BM25 over the same corpus + query literals;
    # hybrid RRF = lexical DQ6 rank fused with the vector index)
    "search_bm25", "search_hybrid_rrf",
    # dedup family (minhash twice: free-running + megabucket cap engaged,
    # so the 100 TB safety valve's sizes-agg + filter-join has a timing row)
    "dedup_exact", "dedup_minhash_lsh", "dedup_minhash_capped",
    "dedup_simhash", "dedup_embedding", "dedup_span_exact",
    "dedup_span_sliding",
    # similarity search (+ the integer-centroid label audit and the
    # composed IVFADC index — the realistic 100 TB ANN shape; both PQ
    # index forms stay visible so the raw/residual build-cost delta is
    # tracked round-over-round, and the recall audit times the full
    # index-quality dashboard: residual build + probe + brute + join)
    "sim_topk_brute", "sim_topk_lsh", "sim_label_centroids",
    "sim_topk_pq", "sim_topk_ivfpq", "sim_topk_ivfpq_res",
    "sim_recall_audit",
    # semantic dedup rides the same IVF build (third dedup modality)
    "dedup_semantic",
    # text analysis (lm_score = the corpus-bigram perplexity filter;
    # c4_filters = the rule gate; pack_sequences = training-pack prep;
    # cooccurrence_capped = the engaged single-key-tail valve)
    "text_quality", "text_fingerprint", "text_lm_score",
    "text_c4_filters", "text_pack_sequences", "text_cooccurrence_capped",
    "text_bpe_pairs",
    # tokenizer training (the merge-loop trainer: vocabulary-sized work
    # off one corpus word-count agg, 1-row collect per merge — the loop
    # whose cost must stay visible round-over-round)
    "text_bpe_vocab",
    # data selection (DSIR hashed-bigram importance against a target
    # slice; _select adds the top-n cut; streaming_dsir = the broadcast
    # ratio-table twin scoring a file stream — the production shape)
    "text_dsir", "text_dsir_select", "streaming_dsir",
    # dimensionality reduction (JL Rademacher projection, corpus-wide;
    # PCA = the full integer eigensolve + trained projection; rp_topk =
    # the two-stage coarse-then-exact retrieval through the projection;
    # rp_distortion = the all-pairs JL fidelity audit on the hash
    # sample; rp_ivfpq = the residual IVFADC built IN the projection
    # with exact full-dim re-rank)
    "sim_rp_project", "sim_pca_project", "sim_rp_topk",
    "sim_rp_distortion", "sim_topk_rp_ivfpq",
    # pca_topk = the rp_topk pattern through TRAINED coordinates (times
    # the eigensolve-fed two-stage retrieval end to end)
    "sim_pca_topk",
    # INT8 scalar-quantized retrieval (the 1-byte/component scan index —
    # the vmax aggregation + code scan is exactly the shape that can
    # silently regress), the OPQ train+encode (sample stats collect +
    # permuted PQ build), and the OPQ×residual-IVFADC composition (the
    # full compressed-index build in the permuted space)
    "sim_topk_sq", "sim_topk_opq", "sim_topk_opq_ivfpq",
    # IVF-SQ8 (coarse cells + byte-coded residuals — probe-bounded scan)
    # and binary quantization (sign bits + Hamming — the 8-bytes/vector
    # zero-training tier)
    "sim_topk_ivfsq", "sim_topk_bq",
    # multimodal (Arrow mapInPandas path; phash_dedup = the perceptual
    # hash scan + the phash-window image dedup; audio_decode = the
    # RIFF-chunk walk over PCM16 WAVs; audio_energy = the frame-energy/
    # VAD pass over the same payloads)
    "multimodal_decode", "multimodal_phash_dedup", "multimodal_audio_decode",
    "multimodal_audio_energy",
    # text governance telemetry (source_stats = two source-keyed
    # shuffles; ngram_novelty = the df-shape on trigrams + join-back)
    "text_source_stats", "text_ngram_novelty",
    # relational / events
    "rel_pricing_summary", "rel_revenue_by_region", "rel_top_customers",
    "events_sessionize", "asof_last_purchase",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from hadoop_tfidf_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="hadoop_tfidf_spark_bench")

    queries = entrymod.queries()
    timings: dict[str, float] = {}

    # JVM/codegen warmup on the smallest table so the first measured query
    # doesn't pay one-time session costs.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # min-of-3: measured same-code cross-RUN noise on this host reaches
    # 2.4x on sub-second queries with min-of-2 (r6: events_sessionize
    # 0.31->0.73, dedup_minhash_capped 1.17->2.07 across back-to-back
    # runs); a third trial brings every observed flake back under the
    # tripwire thresholds while adding ~40% wall to the bench only
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
    names = [n for n in HEADLINE if n in queries]
    for name in names:
        best = None
        for _ in range(1 if name in SINGLE_TRIAL else trials):
            df = queries[name](spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.time() - t0
            best = elapsed if best is None else min(best, elapsed)
            # queries may persist shared intermediates (tfidf dwc, shingle
            # sets); drop them so memory stays flat across the whole set,
            # no query is timed against another's cache, and trial 2
            # rebuilds from scratch (min-of-N damps host-contention noise)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    regressions = _regressions(timings, sf)
    retried = []
    if regressions:
        # Tripwire retry pass: the first sweep times 50+ queries
        # back-to-back in one process, so host/JVM contention can inflate
        # a few rows past 1.5x on UNCHANGED code (round 10 recorded
        # exactly that: tfidf/search/rank tripped at 1.6-1.8x and an
        # exclusive re-run cleared all three). Before failing, re-measure
        # ONLY the flagged queries — nothing else queued, caches cold —
        # and keep the min. A real regression reproduces; contention
        # noise does not.
        for r in regressions:
            name = r["query"]
            retried.append(name)
            best = timings[name]
            for _ in range(trials):
                df = queries[name](spark, sf_dir)
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
                spark.catalog.clearCache()
            timings[name] = round(best, 3)
        regressions = _regressions(timings, sf)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "regressions": regressions,
                "retried": retried,
            }
        )
    )
    spark.stop()
    if regressions and not os.environ.get("SPARK_GRAFT_BENCH_NO_TRIPWIRE"):
        sys.exit(2)


def _regressions(timings: dict[str, float], sf: float | None) -> list[dict]:
    """Shared-query slowdowns vs the last REGRESSION_LOOKBACK recorded
    BENCH_r*.json rounds at the same sf (cross-sf comparisons would be
    meaningless); per-query baseline = max across those rounds."""
    here = os.path.dirname(os.path.abspath(__file__))
    records: list[tuple[str, dict[str, float]]] = []
    for path in sorted(
        glob.glob(os.path.join(here, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"BENCH_r(\d+)", p).group(1)),
        reverse=True,
    ):
        try:
            with open(path) as f:
                rec = json.load(f)
            # the driver stores this script's JSON line under "parsed"
            rec = rec.get("parsed", rec)
            if rec.get("sf") == sf and rec.get("queries"):
                records.append((os.path.basename(path), rec["queries"]))
                if len(records) >= REGRESSION_LOOKBACK:
                    break
        except (OSError, ValueError, AttributeError):
            continue
    if not records:
        return []
    out = []
    for name, now in timings.items():
        reset = BASELINE_RESET.get(name)
        prevs = [
            (q[name], f)
            for f, q in records
            if name in q
            and (
                reset is None
                or int(re.search(r"BENCH_r(\d+)", f).group(1)) >= reset
            )
        ]
        if not prevs:
            # A BASELINE_RESET that filters out EVERY recorded round
            # leaves the tripwire silently inert for this query — say so
            # (stderr, not the JSON line) until an r>=reset row lands.
            if reset is not None and any(name in q for _, q in records):
                print(
                    f"bench: BASELINE_RESET leaves {name!r} with zero "
                    f"usable baselines (no BENCH_r>={reset} recorded at "
                    f"sf={sf}) — tripwire inert for it this run",
                    file=sys.stderr,
                )
            continue
        old, old_file = max(prevs)
        if now > old * REGRESSION_FACTOR and now - old > REGRESSION_FLOOR_S:
            out.append(
                {"query": name, "prev": old, "now": now, "baseline": old_file}
            )
    return out


if __name__ == "__main__":
    main()
