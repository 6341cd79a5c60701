"""Standing serve-path bench (VERDICT r15 "Next round" ¶6): the
headline sim_topk rows price BUILD+search per trial; this tool tracks
the other half of the build-once/serve-many split round-over-round —
answering from a PREBUILT index dir with zero training jobs.

Per run: train the ivfsq and ivfpq_res tiers once at
``$SPARK_GRAFT_SF_DIR`` (default sf0.1, defaults matching the r15
serve-vs-rebuild wall in SCALE.md), then time

- ``serve_knn`` (5 queries, k=10) per stored tier (ivfsq, ivfpq_res,
  opq_ivfpq since round 16) — first call (plan compile included) and
  min over ``trials`` warm calls;
- ``serve_knn_bulk`` at the SCALE.md-sized (nprobe=8, candidates=80)
  budget — the whole-corpus kNN graph from storage.

Record the JSON line in each round's LOCAL_CHECK (the pinned
serve-timing section) so serving regressions become visible the round
they happen, exactly like the headline tripwire does for builds.

Usage: python tools/serve_bench.py [trials]
Prints ONE JSON line.
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
QUERY_IDS = [0, 400, 800, 1200, 1600]


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from hadoop_tfidf_spark.operators.index_store import (
        build_knn_index,
        load_index,
        serve_knn,
        serve_knn_bulk,
    )
    from hadoop_tfidf_spark.session import get_spark

    spark = get_spark("serve_bench")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    work = tempfile.mkdtemp(prefix="serve_bench_")
    out = {"sf_dir": SF_DIR, "trials": trials, "queries": len(QUERY_IDS)}
    try:
        for kind in ("ivfsq", "ivfpq_res", "opq_ivfpq"):
            d = f"{work}/{kind}"
            t0 = time.monotonic()
            build_knn_index(emb, kind, d)
            out[f"{kind}_build_s"] = round(time.monotonic() - t0, 3)
            idx = load_index(spark, d)

            def one_serve():
                t0 = time.monotonic()
                serve_knn(
                    emb, idx, QUERY_IDS, k=10, candidates=50, nprobe=2
                ).write.format("noop").mode("overwrite").save()
                return time.monotonic() - t0

            out[f"{kind}_serve_first_s"] = round(one_serve(), 3)
            out[f"{kind}_serve_warm_s"] = round(
                min(one_serve() for _ in range(trials)), 3
            )
        idx = load_index(spark, f"{work}/ivfpq_res")
        t0 = time.monotonic()
        serve_knn_bulk(
            emb, idx, k=5, candidates=80, nprobe=8
        ).write.format("noop").mode("overwrite").save()
        out["ivfpq_res_bulk_serve_s"] = round(time.monotonic() - t0, 3)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
