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
import re
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


#: Marker file compact_ledger leaves inside the folded base generation
#: dir. Underscore-prefixed so parquet readers ignore it; its presence
#: tells a late-replayed upsert of the same batch_id that overwriting
#: this dir would destroy MERGED state, not just replay one batch.
_COMPACTED_MARKER = "_COMPACTED"


def _assert_local(sink: str) -> None:
    """Every replay/compaction guard in this module probes the LOCAL
    filesystem (``os.path``/``glob``/``os.rename``). For a scheme-
    prefixed Hadoop URI (``hdfs://``, ``s3a://``, even ``file://``)
    those probes silently see nothing — a replayed batch could then
    overwrite a compacted base, the exact loss the marker exists to
    prevent. Fail loudly at entry instead of silently not guarding; on
    remote storage the ledger belongs in a table format (Delta/Iceberg
    MERGE + OPTIMIZE), which is what this module models."""
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", sink):
        raise ValueError(
            f"ledger sink {sink!r} has a filesystem-scheme prefix; the "
            "generation-directory ledger's replay-vs-compaction guards "
            "probe the local filesystem and would never fire on a "
            "remote URI. Use a local path, or a table format "
            "(Delta/Iceberg) for remote storage."
        )


def ledger_upsert(
    sink: str, keys: list[str] | None = None, compact_every: int | None = None
):
    """``foreachBatch`` writer: OVERWRITE this batch's own generation dir.

    Idempotent under at-least-once replay: a re-delivered batch_id
    rewrites its own directory with the same deterministic content
    instead of appending duplicates.

    Replay-vs-compaction guard (the one interleaving where overwrite
    idempotence is NOT enough): after :func:`compact_ledger` folds
    generations ``0..t`` into one base at ``batch_id=t``, a stream
    restarted from a pre-compaction checkpoint could re-deliver batch
    ``t`` and overwrite the merged base with that single batch's
    content — silent loss of every folded row. The writer therefore
    fails LOUDLY instead of writing when (a) the target dir carries the
    compaction marker, or (b) a compaction covering this batch_id is
    mid-flight (a ``_compact_tmp_through=t`` dir with ``t >=
    batch_id``). Batches NEWER than any compaction are untouched by the
    swap and write normally — the steady-state path does two
    ``os.path``/glob probes and nothing else.

    ``compact_every=N`` wires the SCALE.md "compact every Nth commit"
    policy into the sink itself: after committing batch ``B`` with
    ``(B + 1) % N == 0``, the writer folds generations ``<= B - 1``
    (requires ``keys``, the reconstruction key set). foreachBatch runs
    serially per query, so the single-writer contract holds by
    construction; the ledger then never exceeds ``N + 1`` generations,
    keeping reconstruction cost flat on an always-on stream instead of
    the measured linear growth. The fold point is ``B - 1``, NOT ``B``:
    foreachBatch is at-least-once, and a crash between the inline
    compaction and batch ``B``'s checkpoint commit guarantees ``B`` is
    re-delivered on restart — if ``B`` itself were the folded base, the
    replay would hit its ``_COMPACTED`` marker and wedge the stream
    permanently (no newer checkpoint exists to restart from). Folding
    only strictly-older generations keeps the replay a plain idempotent
    overwrite of ``B``'s own dir, and the replayed trigger re-runs the
    fold as a no-op."""
    if compact_every is not None and not keys:
        raise ValueError("compact_every requires keys= for reconstruction")
    _assert_local(sink)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        target = f"{sink}/batch_id={batch_id}"
        if os.path.exists(f"{target}/{_COMPACTED_MARKER}"):
            raise RuntimeError(
                f"batch_id={batch_id} at {sink} is a compacted base "
                "generation; replaying it would overwrite merged state. "
                "Restart the stream from a checkpoint newer than the "
                "compaction (or reconstruct and re-seed the ledger)."
            )
        tmp = glob.glob(f"{sink}/_compact_tmp_through=*")
        if tmp and any(
            int(p.rsplit("=", 1)[1]) >= batch_id for p in tmp
        ):
            raise RuntimeError(
                f"a compaction covering batch_id={batch_id} is in "
                f"flight at {sink} ({tmp}); concurrent upsert of a "
                "covered generation violates the single-writer "
                "contract and could be silently folded away."
            )
        batch_df.write.mode("overwrite").parquet(target)
        if compact_every is not None and (batch_id + 1) % compact_every == 0:
            compact_ledger(
                batch_df.sparkSession, sink, list(keys),
                through=batch_id - 1,
            )

    return upsert


def _assert_no_partial_compaction(sink: str) -> None:
    """Refuse to read the genuinely partial mid-swap state: a
    ``_compact_tmp_through=*`` dir COEXISTING with ``_trash_batch_id=*``
    dirs means the swap started renaming originals away — some folded
    generations' only complete copy lives in the tmp dir, so serving
    the remaining ``batch_id=*`` dirs would SILENTLY return partial
    state. Fail loudly instead; re-running :func:`compact_ledger`
    finishes or rolls back the swap.

    A tmp dir WITHOUT trash (compaction still writing its base, or
    crashed before the first trash-rename) is safe to read through:
    every original generation dir is still in place, so concurrent
    serving readers (e.g. a knn-server reconstruct) see complete,
    consistent state for the whole build phase — only the swap window
    itself blocks. Trash dirs alone are likewise safe: they only exist
    after the new base is fully in place."""
    if glob.glob(f"{sink}/_compact_tmp_through=*") and glob.glob(
        f"{sink}/_trash_batch_id=*"
    ):
        raise RuntimeError(
            f"ledger at {sink} is mid-compaction-swap (tmp + trash dirs "
            "coexist); re-run compact_ledger() to finish the swap "
            "before reading"
        )


def _stable_generations(sink: str, retries: int = 5) -> list[int]:
    """A consistent snapshot of the generation list. A single
    assert-then-glob has a TOCTOU window: a compaction's first
    trash-rename can land between the partial-swap assertion and the
    generation glob, so the glob lists a ledger with some folded
    generations already renamed away — silently partial state. Close it
    by re-asserting AND re-globbing after the listing: a swap that
    started mid-snapshot either trips the second assertion (tmp + trash
    now coexist — loud, same contract as any mid-swap read) or changed
    the generation set (retry; the next iteration sees the settled
    post-swap state)."""
    for _ in range(retries):
        _assert_no_partial_compaction(sink)
        gens = ledger_generations(sink)
        _assert_no_partial_compaction(sink)
        if ledger_generations(sink) == gens:
            return gens
    raise RuntimeError(
        f"ledger at {sink} kept changing across {retries} snapshot "
        "attempts (concurrent compaction churn); retry when the "
        "writer settles"
    )


def read_ledger(spark: SparkSession, sink: str) -> DataFrame:
    """All generations, with the hive-partition ``batch_id`` column.
    Concrete generation dirs, not a glob — a glob string makes
    FileStreamSink's metadata probe log a FileNotFoundException stack
    trace at WARN on every read. Refuses to read mid-compaction state,
    and snapshots the generation list race-free vs an in-flight swap
    (:func:`_stable_generations`)."""
    _assert_local(sink)
    paths = [f"{sink}/batch_id={g}" for g in _stable_generations(sink)]
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
    rename only ignorable trash remains. Reads fail loudly only during
    the genuinely partial mid-swap window — tmp + trash coexisting
    (:func:`_assert_no_partial_compaction`); the build phase, where
    every original dir is still in place, stays readable. Re-running
    this function first finishes or rolls back any crashed swap
    (single-writer contract, as with any table-format OPTIMIZE; a
    violated contract — two stamped tmp dirs — raises instead of
    guessing, and the folded base carries a ``_COMPACTED`` marker so a
    late-replayed upsert of its batch_id fails loudly rather than
    overwriting merged state)."""
    _assert_local(sink)
    prior = glob.glob(f"{sink}/_compact_tmp_through=*")
    if prior:
        if len(prior) > 1:
            # Two stamped tmp dirs can only mean the single-writer
            # contract was violated (two compactions raced); picking
            # one arbitrarily could rename a stale base into place —
            # make the violation loud instead of silently lossy.
            raise RuntimeError(
                f"ledger at {sink} has {len(prior)} compaction tmp dirs "
                f"({sorted(prior)}); the single-writer contract was "
                "violated — resolve manually (keep the complete one, "
                "remove the rest) before re-running compact_ledger()"
            )
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
            # re-assert the marker: a crash in the tiny window between
            # base.write and the marker touch would otherwise recover a
            # base without its replay guard
            open(f"{sink}/batch_id={t}/{_COMPACTED_MARKER}", "w").close()
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
    # Marker travels with the rename into batch_id=<through>: a
    # late-replayed upsert of this batch_id must not overwrite the
    # merged base (see ledger_upsert's guard).
    open(f"{tmp}/{_COMPACTED_MARKER}", "w").close()
    for g in old:
        os.rename(f"{sink}/batch_id={g}", f"{sink}/_trash_batch_id={g}")
    os.rename(tmp, f"{sink}/batch_id={through}")
    for d in glob.glob(f"{sink}/_trash_batch_id=*"):
        shutil.rmtree(d)
    return len(old)
