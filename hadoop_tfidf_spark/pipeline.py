"""End-to-end corpus curation — the LLM-training-data pipeline composed
from the engine's operator families as ONE lazy Spark plan:

    annotate (lang-id, quality)  →  filter  →  exact dedup  →
    near-dup drop (MinHash-LSH)  →  [semantic dedup (SemDeDup), when an
    embeddings table is supplied]  →  deterministic train/valid/test split

This is the flagship composition the extension surface exists for (the
reference repo's 4-job TF-IDF chain is the same idea at 1/10 the operator
count: SURVEY.md §3 — chain jobs into one dataflow; here Catalyst gets
the whole graph and schedules it as one job DAG).

Scale shape (100 TB):
* annotation (quality + lang-id) is a single NARROW projection — both
  scores are higher-order array expressions over ``text`` fused into the
  scan's codegen stage (``quality_column`` / ``lang_id_columns``), so the
  filter prefix costs zero shuffles and zero joins;
* the stitching joins that remain (exact-dedup left-semi, near-dup
  left-anti) are keyed on ``doc_id`` and co-partition under the same
  hash — AQE coalesces and reuses exchanges;
* near-dup candidates come from the banded LSH bucket equi-join (never
  all-pairs), computed over the ALREADY-filtered corpus — the standard
  pipeline-order economy: cheap narrow filters first, the quadratic-risk
  operator last, over the fewest rows;
* the split label is a pure projection (content-addressed md5 bucket),
  pushed to whatever scan feeds the final write, and ingest-stable (a
  doc's split never changes when more data arrives).

Near-dup policy: a doc is dropped when it appears as the HIGHER id
(``doc_b``) of any LSH candidate pair — the 1-hop min-id canonical rule.
Chains (a,b),(b,c) therefore keep only ``a`` (conservative: both
non-minimal members drop). The fixpoint variant that keeps one survivor
per connected component exists as
:func:`hadoop_tfidf_spark.operators.dedup.near_dup_components`; the 1-hop
rule is the SQL-expressible one, so it is what the oracle gate checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_tfidf_spark.functions.text import lang_id_columns, quality_column
from hadoop_tfidf_spark.operators.dedup import minhash_lsh_dedup
from hadoop_tfidf_spark.operators.sampling import hash_split

DEFAULT_SPLITS = {"train": 90, "valid": 5, "test": 5}


def curate_corpus(
    docs: DataFrame,
    lang: str = "en",
    min_quality: float = 0.5,
    splits: dict[str, int] | None = None,
    seed: int | str = 0,
    max_bucket_size: int | None = None,
    persist_intermediate: bool = False,
    storage_level=None,
    keep_text: bool = False,
    embeddings: DataFrame | None = None,
    semantic_threshold: float = 0.95,
    semantic_k: int = 16,
    semantic_iters: int = 2,
    semantic_units: int = 1_000_000,
) -> DataFrame:
    """Curate ``(doc_id, text)`` into ``(doc_id, pred_lang, quality,
    split)`` — language filter, quality filter, exact dedup, near-dup
    drop, split labels; one lazy plan (see module docstring for the
    per-stage scale analysis). ``keep_text=True`` retains the ``text``
    column for downstream stages that consume the curated corpus itself
    (e.g. sequence packing).

    Filters compare against the ROUNDED quality score (the hash-gate
    contract of :func:`quality_score`), so the kept set is identical in
    any engine that reproduces the 6-decimal rounding.

    ``persist_intermediate`` (keep_text=True path only since round 17 —
    the default path persists the text-free metadata relation instead,
    see the inline note): the deduped-and-filtered corpus is a
    diamond — it feeds BOTH the MinHash side and the final anti-join, so
    unpersisted the annotate+filter+dedup prefix is derived twice.
    Measured at sf0.1 the memory-cache is consistently SLOWER (3.8s vs
    3.3s warm: cache write IO exceeds the narrow recompute, and
    ReuseExchange already collapses the expensive signature exchange), so
    the default is False. At 100 TB neither choice is right: a curation
    run checkpoints each stage to parquet (every stage boundary is a
    dataset other jobs consume — splits feed trainers, drop lists feed
    audits), which truncates the diamond for free; the flag exists for
    mid-size corpora where one in-memory pass is known to fit —
    ``storage_level`` then picks the tier (default MEMORY_AND_DISK;
    ``DISK_ONLY`` when the kept corpus dwarfs executor memory).
    """
    # Inline annotation: quality and lang are pure functions of `text`, so
    # they are projected in place — the whole annotate+filter prefix is
    # NARROW (no join, no shuffle; lives inside the scan's codegen stage).
    pred_lang, _ = lang_id_columns(F.col("text"))
    if not keep_text:
        # Round 17 (guide §1.2 "don't compute things you throw away" /
        # §2.4): nothing downstream of the filter needs `text` — the
        # output is (doc_id, pred_lang, quality, split) and the exact-
        # dedup key is md5(text), computable in the same projection. So
        # the annotate+filter+md5 pass lands in a TEXT-FREE persisted
        # metadata relation (4 narrow columns) that every consumer
        # branch (exact-keep aggregation, both near-dup semi-join
        # probes, the final output) reads, instead of re-evaluating the
        # inlined lang-id/quality expression tree over the corpus per
        # branch — the before-plan scanned documents.parquet 5×, the
        # after-plan 2× (once into this cache, once for the LSH
        # shingle pass). The cache is metadata-sized (no text), so the
        # write cost that made caching the FULL kept relation a wash
        # (the persist_intermediate note below) does not apply; at
        # 100 TB the same relation is what a curation run would
        # checkpoint between stages. Values unchanged: same rows, same
        # expressions, evaluated once.
        from pyspark.storagelevel import StorageLevel

        meta = (
            docs.select(
                "doc_id",
                F.md5("text").alias("_h"),
                quality_column(F.col("text")).alias("quality"),
                pred_lang.alias("pred_lang"),
            )
            .where(
                (F.col("pred_lang") == lang) & (F.col("quality") >= min_quality)
            )
            .persist(storage_level or StorageLevel.MEMORY_AND_DISK)
        )
        exact_keep = (
            meta.groupBy("_h")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        kept = meta.join(exact_keep, "doc_id", "left_semi")
    else:
        kept = docs.select(
            "doc_id",
            "text",
            quality_column(F.col("text")).alias("quality"),
            pred_lang.alias("pred_lang"),
        ).where((F.col("pred_lang") == lang) & (F.col("quality") >= min_quality))
        exact_keep = (
            kept.groupBy(F.md5("text").alias("_h"))
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        kept = kept.join(exact_keep, "doc_id", "left_semi")
        if persist_intermediate:
            from pyspark.storagelevel import StorageLevel

            kept = kept.persist(storage_level or StorageLevel.MEMORY_AND_DISK)
    if max_bucket_size is None:
        # Physical-strategy identity: a pair is an LSH candidate iff the
        # two docs share a band bucket — a function of each doc's OWN
        # signature only. So candidates-among-kept == candidates-on-the-
        # full-corpus with both endpoints restricted to kept, and the
        # shingle/signature explode can run off the cheap raw scan
        # instead of re-deriving the annotate+filter+dedup subtree
        # (measured ~2.5x faster end-to-end at sf0.1; the oracle keeps
        # the semantic filtered-corpus formulation and the hash gate
        # confirms the identity on real data).
        kept_ids = kept.select("doc_id")
        pairs = minhash_lsh_dedup(docs.select("doc_id", "text"))
        near_drop = (
            pairs.join(
                kept_ids.select(F.col("doc_id").alias("doc_a")), "doc_a", "left_semi"
            )
            .join(
                kept_ids.select(F.col("doc_id").alias("doc_b")), "doc_b", "left_semi"
            )
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
    else:
        # A bucket-size cap breaks the identity (bucket populations differ
        # between the raw and filtered corpora), so the capped variant
        # pays for LSH over the filtered relation — the semantically
        # exact formulation. The text-free kept relation re-attaches
        # text via a doc_id semi-join on the raw scan (same rows).
        capped_src = (
            kept.select("doc_id", "text")
            if "text" in kept.columns
            else docs.select("doc_id", "text").join(
                kept.select("doc_id"), "doc_id", "left_semi"
            )
        )
        near_drop = (
            minhash_lsh_dedup(capped_src, max_bucket_size=max_bucket_size)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
    kept = kept.join(near_drop, "doc_id", "left_anti")
    if embeddings is not None:
        # Third dedup modality (SemDeDup): docs whose embedding loses its
        # within-cell cosine neighborhood (lowest id survives) drop via
        # one doc_id-keyed ANTI-join against the DROP set (keep=0). The
        # drop set is computed over the FULL embeddings table —
        # clustering needs the whole space, and a doc filtered upstream
        # can still disqualify its semantic twin (same conservatism as
        # the exact/lexical stages' min-id rules). Anti-join, NOT a
        # semi-join on the keep set: a doc with no row in the embeddings
        # table must SURVIVE this stage (the stage is a dedup, not a
        # coverage filter) — the same keep-on-uncertainty failure mode
        # the megacell valve follows.
        from hadoop_tfidf_spark.operators.similarity import semantic_dedup

        sem_drop = (
            semantic_dedup(
                embeddings,
                k=semantic_k,
                iters=semantic_iters,
                units=semantic_units,
                threshold=semantic_threshold,
            )
            .where(F.col("keep") == 0)
            .select(F.col("vec_id").alias("doc_id"))
        )
        kept = kept.join(sem_drop, "doc_id", "left_anti")
    labeled = hash_split(kept, "doc_id", splits or dict(DEFAULT_SPLITS), seed)
    cols = ["doc_id", "pred_lang", "quality", "split"]
    if keep_text:
        cols.insert(1, "text")
    return labeled.select(*cols)
