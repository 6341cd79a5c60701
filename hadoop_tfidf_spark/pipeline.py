"""End-to-end corpus curation — the LLM-training-data pipeline composed
from the engine's operator families as ONE lazy Spark plan:

    annotate (lang-id, quality)  →  filter  →  exact dedup  →
    near-dup drop (MinHash-LSH)  →  deterministic train/valid/test split

This is the flagship composition the extension surface exists for (the
reference repo's 4-job TF-IDF chain is the same idea at 1/10 the operator
count: SURVEY.md §3 — chain jobs into one dataflow; here Catalyst gets
the whole graph and schedules it as one job DAG).

Scale shape (100 TB):
* annotation is one narrow projection (quality) plus one aggregation
  keyed on doc_id after a broadcast marker join (lang-id) — the corpus
  shuffles once for lang, never for quality;
* all stitching joins are keyed on ``doc_id``, so the exact-dedup
  left-semi, the near-dup left-anti, and the annotation joins
  co-partition under the same hash — AQE coalesces and reuses exchanges;
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

from hadoop_tfidf_spark.functions.text import lang_id, quality_score
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
    persist_intermediate: bool = True,
) -> DataFrame:
    """Curate ``(doc_id, text)`` into ``(doc_id, pred_lang, quality,
    split)`` — language filter, quality filter, exact dedup, near-dup
    drop, split labels; one lazy plan (see module docstring for the
    per-stage scale analysis).

    Filters compare against the ROUNDED quality score (the hash-gate
    contract of :func:`quality_score`), so the kept set is identical in
    any engine that reproduces the 6-decimal rounding.

    ``persist_intermediate``: the deduped-and-filtered corpus is a
    diamond — it feeds BOTH the MinHash side and the final anti-join, and
    Catalyst re-derives shared subtrees per consumer (same analysis as
    the tfidf dwc diamond, tfidf.py), i.e. the whole
    annotate+filter+dedup prefix runs twice unpersisted. Measured at
    sf0.1 the two are within noise (~4.4s vs ~4.8s warm: the recompute is
    narrow and the corpus small), so the default True is a SCALE choice:
    at 100 TB the recomputed prefix is two full corpus scans plus the
    lang-id explode+agg twice, far above the cache write. Disable when
    composing into a larger plan where the caller manages caching.
    """
    q = quality_score(docs).select("doc_id", "quality")
    lng = lang_id(docs).select("doc_id", "pred_lang")
    kept = (
        docs.join(q, "doc_id")
        .join(lng, "doc_id")
        .where((F.col("pred_lang") == lang) & (F.col("quality") >= min_quality))
    )
    exact_keep = (
        kept.groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = kept.join(exact_keep, "doc_id", "left_semi")
    if persist_intermediate:
        from pyspark.storagelevel import StorageLevel

        kept = kept.persist(StorageLevel.MEMORY_AND_DISK)
    near_drop = (
        minhash_lsh_dedup(
            kept.select("doc_id", "text"), max_bucket_size=max_bucket_size
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept = kept.join(near_drop, "doc_id", "left_anti")
    labeled = hash_split(kept, "doc_id", splits or dict(DEFAULT_SPLITS), seed)
    return labeled.select("doc_id", "pred_lang", "quality", "split")
