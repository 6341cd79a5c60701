"""Measure per-query CONSTRUCTION (plan build incl. eager driver work)
vs EXECUTION (noop sink) wall seconds for the headline bench set.

The bench's timer historically started after ``queries[name](...)``
returned, so eager construction work (Lloyd collects, probe collects,
permutation training) was wall-clock the bench paid but never printed.
This tool prices the two phases separately so the round-17 change of the
timed region (t0 above construction) can be justified with numbers.

Run: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 python tools/measure_construct.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "2"))
    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from hadoop_tfidf_spark.session import get_spark

    spark = get_spark(app_name="measure_construct")
    queries = entrymod.queries()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    only = sys.argv[1:]
    names = only or [n for n in HEADLINE if n in queries]
    out = {}
    for name in names:
        best_c = best_e = None
        for _ in range(trials):
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            spark.catalog.clearCache()
            c, e = t1 - t0, t2 - t1
            best_c = c if best_c is None else min(best_c, c)
            best_e = e if best_e is None else min(best_e, e)
        out[name] = {"construct": round(best_c, 3), "exec": round(best_e, 3)}
        print(f"{name}: construct={best_c:.3f}s exec={best_e:.3f}s", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
