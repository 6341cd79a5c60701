"""Measure incremental index growth vs full rebuild (VERDICT r15 "Next
round" ¶2's SCALE.md entry): at ``$SPARK_GRAFT_SF_DIR`` (default
sf0.1), train an ivfpq_res index on 90% of the embeddings table, then
price the weekly-crawl choice for the remaining 10%:

- **full rebuild** — ``build_knn_index`` over 100% into a fresh dir
  (Lloyd rounds + codebook training + full-corpus re-encode);
- **extend** — ``extend_index`` encoding ONLY the 10% delta against
  the frozen artifacts (no training job; O(delta) scans).

Also times the paired ``recall_drift`` telemetry run and reports its
per-generation recalls, so the SCALE.md entry carries the cost of the
drift check alongside the saving it gates. At 100 TB the ratio is the
whole story: rebuild scans the corpus, extend scans the crawl.

Usage: python tools/extend_scale_check.py [trials]
Prints ONE JSON line; SCALE.md records the adjudicated results.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    from hadoop_tfidf_spark.operators.index_store import (
        build_knn_index,
        extend_index,
        load_index,
        recall_drift,
    )
    from hadoop_tfidf_spark.session import get_spark

    spark = get_spark("extend_scale_check")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = emb.where(F.col("vec_id") % 10 != 0)
    delta = emb.where(F.col("vec_id") % 10 == 0)
    n_base, n_delta = base.count(), delta.count()
    work = tempfile.mkdtemp(prefix="extend_scale_")
    out = {
        "sf_dir": SF_DIR, "n_base": n_base, "n_delta": n_delta,
        "trials": trials, "kind": "ivfpq_res",
    }
    try:
        t0 = time.monotonic()
        build_knn_index(base, "ivfpq_res", f"{work}/base")
        out["build_base_s"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        build_knn_index(emb, "ivfpq_res", f"{work}/full")
        out["full_rebuild_s"] = round(time.monotonic() - t0, 3)

        extend_times = []
        for t in range(trials):
            d = f"{work}/ext{t}"
            shutil.copytree(f"{work}/base", d)
            t0 = time.monotonic()
            extend_index(spark, d, delta)
            extend_times.append(time.monotonic() - t0)
        out["extend_s"] = round(min(extend_times), 3)
        out["extend_vs_rebuild"] = round(
            out["extend_s"] / out["full_rebuild_s"], 3
        )

        idx = load_index(spark, f"{work}/ext0")
        t0 = time.monotonic()
        # (nprobe=8, candidates=80) at the default build params puts
        # this corpus at ~0.4 absolute recall@5 — the quantizer's
        # operating point (size_knn_budget's dial, a different story
        # from drift). The drift instrument's signal here is RELATIVE:
        # gen-1 vs gen-0 recall on the same budget. recall_floor sits
        # just under the operating point so the flag reports drift,
        # not the budget choice.
        rep = recall_drift(
            emb, idx, k=5, candidates=80, nprobe=8,
            per_generation_cap=64, recall_floor=0.25,
        )
        out["drift_check_s"] = round(time.monotonic() - t0, 3)
        out["drift_by_generation"] = {
            str(g): round(r, 3) for g, r in rep["by_generation"].items()
        }
        out["retrain_due"] = rep["retrain_due"]
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
