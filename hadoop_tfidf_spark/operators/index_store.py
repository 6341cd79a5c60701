"""Trained-index persistence for the ANN ladder: build ONCE, serve many.

Every index build in :mod:`operators.similarity` returns its trained
artifacts as driver-side Python values (IVF centroids, PQ codebooks, the
OPQ permutation, SQ/BQ calibration scalars) plus one or more stored
relations (assignment/code tables). Production never retrains per query
— the 100 TB shape is: one training job writes the index to storage, a
fleet of serving jobs loads it. This module is that split on plain
parquet + JSON:

- :func:`save_index` / :func:`load_index` — generic persistence of any
  ladder tier: artifacts land in a VERSIONED ``manifest.json`` (format
  version, index kind, build params, the artifact values themselves —
  all driver-bounded by construction: k×dim centroid ints, m×k×sub
  codebook ints, one vmax scalar), stored relations land as parquet
  under ``tables/`` with their schema recorded in the manifest so a
  load can validate the pairing without scanning data.
- :func:`build_knn_index` — the trainer for the ``cli knn`` tiers
  (bq / sq / ivfsq / ivfpq_res): runs the tier's build job(s) and
  persists everything the serve path needs.
- :func:`serve_knn` — the server: loads artifacts + code tables and
  answers queries WITHOUT re-running any training job (no Lloyd, no
  calibration scan — regression-pinned in tests by making the trainers
  unreachable during serve). Results are bit-equal to an in-session
  build+search because every artifact is integer-exact and round-trips
  JSON losslessly.

Reference parity: the reference engine (6 Java MapReduce classes) has no
ANN surface at all — this is part of the LLM-data-pipeline extension
(SURVEY.md §2 north star). The build-once/serve-many split itself is the
standard vector-store deployment shape (FAISS ``write_index`` /
``read_index``), re-expressed as parquet tables + a JSON manifest so the
stored index stays a first-class Spark relation.
"""

from __future__ import annotations

import dataclasses
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FORMAT_VERSION = 1

#: Index kinds build_knn_index knows how to train and serve_knn how to
#: answer. Each maps to the similarity-module functions used. "ivf" is
#: the full-precision tier (the exact-scoring baseline whose index IS
#: the cluster-assigned corpus); the byte-code tiers follow the ladder.
KNN_KINDS = ("ivf", "bq", "sq", "ivfsq", "ivfpq_res")


@dataclasses.dataclass
class AnnIndex:
    """A loaded index: trained artifacts + lazily-read stored relations."""

    kind: str
    params: dict
    artifacts: dict
    tables: dict[str, DataFrame]
    path: str


def save_index(
    index_dir: str,
    kind: str,
    params: dict,
    artifacts: dict,
    tables: dict[str, DataFrame] | None = None,
) -> str:
    """Persist one trained index. ``artifacts`` must be plain JSON
    values (ints/lists — every trainer in this module already returns
    exactly that; floats would NOT round-trip exactly and are refused).
    ``tables`` are written as parquet under ``tables/<name>`` and their
    schemas recorded in the manifest, pairing the artifact values with
    the code/assignment relations they were trained with. Refuses to
    overwrite an existing manifest — an index is a versioned artifact
    (ship a new directory per rebuild, like a benchmark Bloom filter or
    a crawl generation)."""
    manifest_path = f"{index_dir}/manifest.json"
    if os.path.exists(manifest_path):
        raise FileExistsError(
            f"{manifest_path} already exists; an index is an immutable "
            "versioned artifact — write the rebuild to a new directory"
        )
    _assert_json_ints(artifacts, "artifacts")
    table_meta = {}
    for name, df in (tables or {}).items():
        path = f"{index_dir}/tables/{name}"
        df.write.mode("error").parquet(path)
        table_meta[name] = {"schema": df.schema.simpleString()}
    manifest = {
        "format_version": FORMAT_VERSION,
        "kind": kind,
        "params": params,
        "artifacts": artifacts,
        "tables": table_meta,
    }
    os.makedirs(index_dir, exist_ok=True)
    tmp = f"{manifest_path}.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
    # manifest lands LAST and atomically: a crashed build leaves table
    # dirs but no manifest, and load_index refuses a manifest-less dir —
    # no torn index can ever serve
    os.rename(tmp, manifest_path)
    return index_dir


def _assert_json_ints(obj, where: str) -> None:
    """Artifacts must survive a JSON round-trip EXACTLY — the serve
    path's bit-equality contract rides on it. Integer-exact trainers
    guarantee this; a float sneaking in (e.g. a non-``units`` build)
    would silently break it, so refuse loudly."""
    if isinstance(obj, bool) or isinstance(obj, float):
        raise TypeError(
            f"{where}: only exact-integer artifacts persist losslessly "
            f"(got {type(obj).__name__}); build with units= (micro-unit "
            "integer mode) before saving"
        )
    if isinstance(obj, dict):
        for k, v in obj.items():
            _assert_json_ints(v, f"{where}.{k}")
    elif isinstance(obj, (list, tuple)):
        for i, v in enumerate(obj):
            _assert_json_ints(v, f"{where}[{i}]")
    elif obj is not None and not isinstance(obj, (int, str)):
        raise TypeError(f"{where}: unsupported artifact type {type(obj).__name__}")


def load_index(spark: SparkSession, index_dir: str) -> AnnIndex:
    """Load a saved index: parse + validate the manifest, attach lazy
    parquet readers for the stored relations, and validate each
    relation's schema against the manifest record (catches a swapped or
    regenerated table under a stale manifest without scanning data)."""
    manifest_path = f"{index_dir}/manifest.json"
    if not os.path.exists(manifest_path):
        raise FileNotFoundError(
            f"{manifest_path} not found — not a saved index (a crashed "
            "save leaves no manifest by design)"
        )
    with open(manifest_path) as f:
        manifest = json.load(f)
    v = manifest.get("format_version")
    if v != FORMAT_VERSION:
        raise ValueError(
            f"index at {index_dir} has format_version={v!r}; this build "
            f"reads version {FORMAT_VERSION}"
        )
    tables = {}
    for name, meta in manifest.get("tables", {}).items():
        df = spark.read.parquet(f"{index_dir}/tables/{name}")
        if df.schema.simpleString() != meta["schema"]:
            raise ValueError(
                f"index table {name!r} at {index_dir} has schema "
                f"{df.schema.simpleString()} but the manifest recorded "
                f"{meta['schema']} — table and manifest are out of sync"
            )
        tables[name] = df
    return AnnIndex(
        kind=manifest["kind"],
        params=manifest["params"],
        artifacts=manifest["artifacts"],
        tables=tables,
        path=index_dir,
    )


def build_knn_index(
    embeddings: DataFrame,
    kind: str,
    index_dir: str,
    units: int = 1_000_000,
    in_dim: int | None = None,
    coarse_k: int = 16,
    coarse_iters: int = 2,
    m: int = 4,
    pq_k: int = 16,
    pq_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Train one ``cli knn`` tier and persist it. The training jobs
    (Lloyd rounds, calibration scans, code encoding) all run HERE, once;
    :func:`serve_knn` then answers queries from the stored artifacts
    alone. ``in_dim`` defaults to the first row's width (one 1-row
    job)."""
    from hadoop_tfidf_spark.operators import similarity as S

    if kind not in KNN_KINDS:
        raise ValueError(f"kind must be one of {KNN_KINDS}, got {kind!r}")
    if in_dim is None:
        in_dim = len(embeddings.select(vec_col).first()[vec_col])
    params = {
        "units": units, "in_dim": in_dim,
        "id_col": id_col, "vec_col": vec_col,
    }
    if kind == "ivf":
        assigned, cents = S.ivf_build(
            embeddings, k=coarse_k, iters=coarse_iters,
            id_col=id_col, vec_col=vec_col, units=units,
        )
        params.update({"coarse_k": coarse_k, "coarse_iters": coarse_iters})
        return save_index(
            index_dir, kind, params,
            {"centroids": [[int(x) for x in c] for c in cents]},
            {"assigned": assigned},
        )
    if kind == "bq":
        index = S.bq_build(
            embeddings, units=units, in_dim=in_dim,
            id_col=id_col, vec_col=vec_col,
        )
        return save_index(index_dir, kind, params, {}, {"index": index})
    if kind == "sq":
        index, vmax = S.sq_build(
            embeddings, units=units, in_dim=in_dim,
            id_col=id_col, vec_col=vec_col,
        )
        return save_index(
            index_dir, kind, params, {"vmax": int(vmax)}, {"index": index}
        )
    if kind == "ivfsq":
        index, cents, vmax = S.ivfsq_build(
            embeddings, coarse_k=coarse_k, coarse_iters=coarse_iters,
            units=units, in_dim=in_dim, id_col=id_col, vec_col=vec_col,
        )
        params.update({"coarse_k": coarse_k, "coarse_iters": coarse_iters})
        return save_index(
            index_dir, kind, params,
            {"centroids": [[int(x) for x in c] for c in cents],
             "vmax": int(vmax)},
            {"index": index},
        )
    # ivfpq_res: the production recommendation — coarse cells bound the
    # scan, residual PQ codes are 8 bytes/vector, exact re-rank optional
    # downstream. Stored relation is the pre-joined (cluster, pq_code).
    assigned, cents, codes, codebooks = S.ivfpq_build_residual(
        embeddings, coarse_k=coarse_k, coarse_iters=coarse_iters,
        m=m, k=pq_k, iters=pq_iters, units=units,
        id_col=id_col, vec_col=vec_col, pack=True,
    )
    params.update({
        "coarse_k": coarse_k, "coarse_iters": coarse_iters,
        "m": m, "pq_k": pq_k, "pq_iters": pq_iters,
    })
    return save_index(
        index_dir, kind, params,
        {"centroids": [[int(x) for x in c] for c in cents],
         "codebooks": [
             [[int(x) for x in cent] for cent in sub] for sub in codebooks
         ]},
        {"codes": codes},
    )


def serve_knn(
    embeddings: DataFrame,
    index: AnnIndex,
    query_ids: list[int],
    k: int = 10,
    candidates: int = 50,
    nprobe: int = 2,
) -> DataFrame:
    """Answer queries from a LOADED index. No training job runs — the
    centroids/codebooks/vmax come from the manifest and the code tables
    from parquet; ``embeddings`` supplies query vectors and (for the
    byte-code tiers) the full-resolution rows the exact stage-2 re-rank
    reads. Output is the family shape ``(query_id, vec_id, d2_u, rn)``
    (``adc_d2`` for ivfpq_res), bit-equal to searching the in-session
    build because every artifact round-trips exactly."""
    from hadoop_tfidf_spark.operators import similarity as S

    p = index.params
    units, in_dim = p["units"], p["in_dim"]
    id_col, vec_col = p["id_col"], p["vec_col"]
    queries = embeddings.where(
        F.col(id_col).isin([int(x) for x in query_ids])
    )
    if index.kind == "ivf":
        return S.ivf_topk(
            index.tables["assigned"],
            [[int(x) for x in c] for c in index.artifacts["centroids"]],
            queries, k=k, nprobe=nprobe,
            id_col=id_col, vec_col=vec_col, units=units,
        )
    if index.kind == "bq":
        return S.bq_topk(
            embeddings, queries, k=k, candidates=candidates, units=units,
            in_dim=in_dim, id_col=id_col, vec_col=vec_col,
            index=index.tables["index"],
        )
    if index.kind == "sq":
        return S.sq_topk(
            embeddings, queries, k=k, candidates=candidates, units=units,
            in_dim=in_dim, id_col=id_col, vec_col=vec_col,
            vmax=int(index.artifacts["vmax"]),
            index=index.tables["index"],
        )
    if index.kind == "ivfsq":
        return S.ivfsq_topk(
            embeddings, [int(x) for x in query_ids], k=k,
            candidates=candidates, nprobe=nprobe, units=units,
            in_dim=in_dim, id_col=id_col, vec_col=vec_col,
            index=index.tables["index"],
            centroids=[[int(x) for x in c] for c in index.artifacts["centroids"]],
            vmax=int(index.artifacts["vmax"]),
        )
    if index.kind == "ivfpq_res":
        return S.ivfpq_topk(
            embeddings,  # assigned is only the query-vector default here
            [[int(x) for x in c] for c in index.artifacts["centroids"]],
            index.tables["codes"],
            [
                [[int(x) for x in cent] for cent in sub]
                for sub in index.artifacts["codebooks"]
            ],
            query_ids=[int(x) for x in query_ids],
            k=k, nprobe=nprobe, units=units,
            id_col=id_col, vec_col=vec_col,
            embeddings=embeddings, residual=True,
        )
    raise ValueError(f"unknown index kind {index.kind!r}")


def serve_knn_bulk(
    embeddings: DataFrame,
    index: AnnIndex,
    k: int = 10,
    candidates: int | None = None,
    nprobe: int | None = None,
    target_recall: float | None = None,
) -> DataFrame:
    """The whole-corpus kNN graph from a LOADED residual-IVFADC index —
    the semantic-dedup / clustering input job, composed from stored
    artifacts: stage 1 drives the persisted ``(cluster, pq_code)``
    relation with the corpus as the query relation (executor-side
    probes, zero collect), stage 2 re-ranks the candidate cut by exact
    integer L2. Pass ``target_recall`` to AUTO-SIZE the budget first
    (``similarity.size_knn_budget`` walks a sample recall curve against
    the exact truth — minutes on a sample before hours on the corpus);
    or pin ``nprobe``/``candidates`` explicitly. No training job runs
    either way."""
    from hadoop_tfidf_spark.operators import similarity as S

    if index.kind != "ivfpq_res":
        raise ValueError(
            f"serve_knn_bulk needs an ivfpq_res index (got {index.kind!r})"
            " — the compressed tier is the one whose bulk scan pays"
        )
    p = index.params
    cents = [[int(x) for x in c] for c in index.artifacts["centroids"]]
    books = [
        [[int(x) for x in cent] for cent in sub]
        for sub in index.artifacts["codebooks"]
    ]
    if target_recall is not None:
        if candidates is not None or nprobe is not None:
            raise ValueError(
                "pass target_recall OR explicit nprobe/candidates, not "
                "both — auto-sizing would silently override the pins"
            )
        nprobe, candidates, _curve = S.size_knn_budget(
            embeddings, cents, index.tables["codes"], books, embeddings,
            target_recall=target_recall, k=k, units=p["units"],
            id_col=p["id_col"], vec_col=p["vec_col"],
        )
    if candidates is None or nprobe is None:
        raise ValueError(
            "pass target_recall= (auto-size) or both nprobe= and "
            "candidates= (pinned budget)"
        )
    return S.ivfpq_bulk_topk(
        embeddings, cents, index.tables["codes"], books, embeddings,
        k=k, candidates=candidates, nprobe=nprobe, units=p["units"],
        id_col=p["id_col"], vec_col=p["vec_col"],
    )
