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


def _assert_no_partial_compaction(sink: str) -> None:
    """A leftover ``_compact_tmp_through=*`` dir means a compaction
    crashed before its swap completed: the folded generations' only
    complete copy may live in the tmp dir, so serving the remaining
    ``batch_id=*`` dirs would SILENTLY return partial state. Fail loudly
    instead; re-running :func:`compact_ledger` finishes or rolls back
    the swap (leftover ``_trash_batch_id=*`` dirs alone are safe — they
    only exist after the new base is fully in place)."""
    tmp = glob.glob(f"{sink}/_compact_tmp_through=*")
    if tmp:
        raise RuntimeError(
            f"ledger at {sink} has an unfinished compaction ({tmp[0]}); "
            "re-run compact_ledger() to finish or roll back the swap "
            "before reading"
        )


def read_ledger(spark: SparkSession, sink: str) -> DataFrame:
    """All generations, with the hive-partition ``batch_id`` column.
    Concrete generation dirs, not a glob — a glob string makes
    FileStreamSink's metadata probe log a FileNotFoundException stack
    trace at WARN on every read. Refuses to read mid-compaction state
    (:func:`_assert_no_partial_compaction`)."""
    _assert_no_partial_compaction(sink)
    paths = [f"{sink}/batch_id={g}" for g in ledger_generations(sink)]
    if not paths:
        # zero paths would surface as Spark's opaque UNABLE_TO_INFER_SCHEMA
        raise FileNotFoundError(
            f"ledger at {sink} has no batch_id=* generation dirs "
            "(nothing committed yet, or a mistyped sink path)"
        )
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
    CRASH-SAFE by ordering: materialize the base into a
    through-stamped tmp dir → rename (not delete) the folded dirs to
    trash → rename tmp into place → clear trash. A crash at any point
    loses nothing: before any trash-rename the original dirs are
    intact (rollback = drop tmp); mid-swap the tmp dir holds the
    complete folded base (resume = finish the rename); after the final
    rename only ignorable trash remains. Reads fail loudly while a tmp
    dir exists (:func:`_assert_no_partial_compaction`), and re-running
    this function first finishes or rolls back any crashed swap
    (single-writer contract, as with any table-format OPTIMIZE)."""
    prior = glob.glob(f"{sink}/_compact_tmp_through=*")
    if prior:
        t = int(prior[0].rsplit("=", 1)[1])
        if glob.glob(f"{sink}/_trash_batch_id=*"):
            # crashed mid-swap: the tmp holds the full folded base. A
            # crash INSIDE the trash loop can leave some batch_id<=t
            # dirs (including batch_id=t itself) still in place — the
            # tmp supersedes every one of them, so finish trashing
            # before the rename (renaming onto a non-empty dir raises
            # ENOTEMPTY and would wedge recovery permanently).
            for g in ledger_generations(sink):
                if g <= t:
                    os.rename(
                        f"{sink}/batch_id={g}", f"{sink}/_trash_batch_id={g}"
                    )
            os.rename(prior[0], f"{sink}/batch_id={t}")
        else:
            # crashed before any dir was trashed: originals are intact —
            # roll the unreferenced tmp back
            shutil.rmtree(prior[0])
    for d in glob.glob(f"{sink}/_trash_batch_id=*"):
        shutil.rmtree(d)  # garbage from a crash after the final rename
    old = [g for g in ledger_generations(sink) if g <= through]
    if len(old) <= 1:
        return len(old)
    base = reconstruct_latest(
        read_ledger(spark, sink).where(F.col("batch_id") <= through), keys
    )
    tmp = f"{sink}/_compact_tmp_through={through}"
    base.write.mode("overwrite").parquet(tmp)
    for g in old:
        os.rename(f"{sink}/batch_id={g}", f"{sink}/_trash_batch_id={g}")
    os.rename(tmp, f"{sink}/batch_id={through}")
    for d in glob.glob(f"{sink}/_trash_batch_id=*"):
        shutil.rmtree(d)
    return len(old)
