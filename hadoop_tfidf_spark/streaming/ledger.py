"""Batch-id-keyed upsert ledgers for update-mode streaming sinks.

The update-mode twins (``streaming_source_stats_update``,
``streaming_phash_dedup_update``) and the online-serving row
(``streaming_knn_bq``) all share one deployment shape: ``foreachBatch``
persists each micro-batch's delta, and the table's current state is the
latest row per key across deltas. This module is that shape, made
replay-idempotent BY CONSTRUCTION: every micro-batch OVERWRITES its own
``batch_id=N/`` generation directory (hive-style partition naming, so the
generation comes back as a ``batch_id`` column on read). Structured
Streaming's foreachBatch contract is at-least-once — a crash between the
write and the checkpoint commit replays the batch with the SAME batch_id —
and an overwrite of the same directory with the same deterministic content
is a no-op, where the previous append-a-``_batch_id``-column scheme
duplicated result rows (fine for latest-row-per-key reconstruction, wrong
for append-only result sinks like the kNN server).

At 100 TB the ledger lives in a table format (Delta/Iceberg) and
``compact_ledger`` is the table's rewrite/OPTIMIZE operation; the
filesystem generation-directory form here keeps identical semantics on
plain parquet: reconstruction cost grows with generation count (measured
in SCALE.md), and compaction folds generations ``0..through`` into one
base generation whose latest-row-per-key content is — provably, see
tests/test_round13_ops.py — reconstruction-invariant.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def ledger_upsert(sink: str):
    """``foreachBatch`` writer: OVERWRITE this batch's own generation dir.

    Idempotent under at-least-once replay: a re-delivered batch_id
    rewrites its own directory with the same deterministic content
    instead of appending duplicates."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{sink}/batch_id={batch_id}")

    return upsert


def read_ledger(spark: SparkSession, sink: str) -> DataFrame:
    """All generations, with the hive-partition ``batch_id`` column.
    Concrete generation dirs, not a glob — a glob string makes
    FileStreamSink's metadata probe log a FileNotFoundException stack
    trace at WARN on every read."""
    paths = [f"{sink}/batch_id={g}" for g in ledger_generations(sink)]
    return spark.read.option("basePath", sink).parquet(*paths)


def reconstruct_latest(ledger: DataFrame, keys: list[str]) -> DataFrame:
    """Current table state: the newest-generation row per key. Ledger
    rows ≤ generations × strata (never corpus-sized), so the window is
    over a bounded relation."""
    w = Window.partitionBy(*keys).orderBy(F.col("batch_id").desc())
    return (
        ledger.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "batch_id")
    )


def ledger_generations(sink: str) -> list[int]:
    """Sorted generation ids currently on disk."""
    return sorted(
        int(os.path.basename(p).split("=", 1)[1])
        for p in glob.glob(f"{sink}/batch_id=*")
    )


def compact_ledger(
    spark: SparkSession, sink: str, keys: list[str], through: int
) -> int:
    """Fold generations ``<= through`` into one base generation at
    ``batch_id=through``. Reconstruction-invariant: the base holds the
    latest row per key among the folded generations, and every newer
    generation still shadows it in :func:`reconstruct_latest`. Returns
    the number of generations folded. On a table format this is the
    MERGE target's OPTIMIZE/rewrite; on plain parquet the swap is
    materialize → drop old dirs → rename."""
    old = [g for g in ledger_generations(sink) if g <= through]
    if len(old) <= 1:
        return len(old)
    base = reconstruct_latest(
        read_ledger(spark, sink).where(F.col("batch_id") <= through), keys
    )
    tmp = f"{sink}/_compact_tmp"
    base.write.mode("overwrite").parquet(tmp)
    for g in old:
        shutil.rmtree(f"{sink}/batch_id={g}")
    os.rename(tmp, f"{sink}/batch_id={through}")
    return len(old)
