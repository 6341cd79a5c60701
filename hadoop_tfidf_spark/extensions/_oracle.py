"""DuckDB oracle SQL for every extension query — the driver runs these
verbatim; kept in ONE module in original definition order because the
dict builds are order-sensitive (shared CTE builders, cross-entry
reuse). Split from ``extensions.py`` (round 15), text verbatim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_tfidf_spark.corpus import load_docs
from hadoop_tfidf_spark.declared import _ORACLE_CTES as _CORE_CTES
from hadoop_tfidf_spark.functions.text import (
    LANG_MARKERS,
    QUALITY_STOPWORDS,
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
)
from hadoop_tfidf_spark.operators import dedup as D
from hadoop_tfidf_spark.operators import relational as R
from hadoop_tfidf_spark.operators import similarity as S
from hadoop_tfidf_spark.operators.multimodal import media_pipeline
from hadoop_tfidf_spark.sources.events import load_events
from hadoop_tfidf_spark.extensions._dedup import (
    GATE_LSH_BUCKET_CAP,
    GATE_NEAR_DUP_COS,
    GATE_SEM_CELL_CAP,
)
from hadoop_tfidf_spark.extensions._multimodal import (
    AUDIO_POISON_MOD,
    AUDIO_POISON_RES,
)
from hadoop_tfidf_spark.extensions._pipeline import (
    RRF_K,
    RRF_LEX_TOPN,
    RRF_TOPK,
)
from hadoop_tfidf_spark.extensions._sim import (
    FRONTIER_BUDGET,
    IVFPQ_BULK_CAND,
    IVF_ITERS,
    IVF_K,
    IVF_NPROBE,
    IVF_TRAIN_MOD,
    IVF_UNITS,
    OPQ_HOT_DIMS,
    OPQ_HOT_SCALE,
    OPQ_SAMPLE_N,
    PCA_GATE_ITERS,
    PCA_GATE_K,
    PCA_GATE_UNITS,
    PQ_ITERS,
    PQ_K,
    PQ_M,
    RECALL_CLUSTER_AMP,
    RECALL_CLUSTER_C,
    RECALL_CURVE_NPROBES,
    RECALL_FIXTURE_ROWS,
    RECALL_STRADDLE_IDS,
    RP_GATE_IN_DIM,
    RP_GATE_OUT_DIM,
    RP_GATE_UNITS,
    RP_IVFPQ_BUDGETS,
    RP_SAMPLE_MOD,
    RP_TOPK_CANDIDATES,
    SIM_K,
    SIM_QUERY_IDS,
    SQ_RECALL_BUDGETS,
    TIER_BYTES,
    _straddle_queries,
)
from hadoop_tfidf_spark.extensions._text import (
    BPE_GATE_MERGES,
    DSIR_GATE_BUCKETS,
    DSIR_GATE_TARGET,
    MIX_BUDGET_TOKENS,
    MIX_TAU,
    QUALITY_TOP_FRAC,
)



# --------------------------------------------------------------------------
# DuckDB oracle SQL (driver runs these over the same parquet views)
# --------------------------------------------------------------------------

#: Shared CTE block: shingles → MinHash signatures → LSH bands → candidate
#: pairs (mirrors operators/dedup.py with k=3, 12 hashes, 4 bands × 3 rows).
#: Integer Carter–Wegman form, generated from the SAME constants the Spark
#: operator uses: base = md5(shingle)[:15 hex] mod M31, then
#: mh_h = (A[h]·base + B[h]) mod M31, band_key = polynomial combine. The
#: DISTINCT in ``shingle`` is kept for the Jaccard CTEs; min() makes it
#: irrelevant to the signatures (as on the Spark side).
from hadoop_tfidf_spark.operators.dedup import (  # noqa: E402
    BAND_KEY_K,
    DEFAULT_NUM_HASHES,
    DEFAULT_ROWS_PER_BAND,
    M31,
    MINHASH_A,
    MINHASH_B,
)

_MH_MIN_COLS = ",\n         ".join(
    f"min(({MINHASH_A[h]} * base + {MINHASH_B[h]}) % {M31}) AS mh_{h}"
    for h in range(DEFAULT_NUM_HASHES)
)
_N_BANDS = DEFAULT_NUM_HASHES // DEFAULT_ROWS_PER_BAND


def _band_key_sql(b: int) -> str:
    expr = f"mh_{DEFAULT_ROWS_PER_BAND * b}"
    for i in range(1, DEFAULT_ROWS_PER_BAND):
        expr = f"(({expr}) * {BAND_KEY_K} + mh_{DEFAULT_ROWS_PER_BAND * b + i}) % {M31}"
    return expr


_BAND_KEY_CASE = " ".join(
    f"WHEN {b} THEN {_band_key_sql(b)}" for b in range(_N_BANDS)
)

def _minhash_body_sql(source: str) -> str:
    """The shingle→signature→band→candidate CTE chain over ``source``
    (any relation with (doc_id, text)) — parameterized so composed
    pipelines (``pipeline_curate``) can run LSH over a filtered corpus."""
    return f"""words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM {source}
),
shingle AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM (
    SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
    FROM words WHERE len(w) >= 3
  )
),
sh_base AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {M31} AS base
  FROM shingle
),
sig AS (
  SELECT doc_id,
         {_MH_MIN_COLS}
  FROM sh_base GROUP BY doc_id
),
bands AS (
  SELECT doc_id, band, CASE band {_BAND_KEY_CASE} END AS band_key
  FROM sig CROSS JOIN generate_series(0, {_N_BANDS - 1}) t(band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
)
"""


_MINHASH_CTES = "WITH " + _minhash_body_sql("documents")

_SIMHASH_CTES = """
WITH tok AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
  ) WHERE word <> ''
),
dwc AS (
  SELECT doc_id, word, count(*) AS n FROM tok GROUP BY doc_id, word
),
wh AS (
  SELECT word, ('0x' || substr(md5(word), 1, 15))::BIGINT AS wh
  FROM (SELECT DISTINCT word FROM dwc)
),
contrib AS (
  SELECT doc_id, j,
         CASE WHEN ((wh >> j) & 1) = 1 THEN n ELSE -n END AS c
  FROM dwc JOIN wh USING (word) CROSS JOIN generate_series(0, 31) t(j)
),
bitsum AS (
  SELECT doc_id, j, sum(c) AS s FROM contrib GROUP BY doc_id, j
),
sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
           AS simhash
  FROM bitsum GROUP BY doc_id
)
"""

_EMB_BUCKET_EXPR = " + ".join(
    f"(CASE WHEN embedding[{d + 1}] > 0 THEN {1 << d} ELSE 0 END)" for d in range(8)
)

_SIM_CTES = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec,
         {_EMB_BUCKET_EXPR} AS bucket
  FROM embeddings
)
"""

#: Integer L2 distance between two BIGINT micro-unit lists (exact, so the
#: argmin is engine-independent; ties break to the lowest cluster id).
def _int_d2_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )


def _ivf_sql(
    query_where: str | None = None, train_where: str | None = None
) -> str:
    """Unrolled replay of the integer micro-unit IVF build+search
    (mirrors similarity.ivf_build/ivf_topk with units=IVF_UNITS): seed =
    first k vectors, then per Lloyd round an exact-integer assignment and
    a round(sum/n) centroid update (sum of BIGINTs is exact, the single
    IEEE division and round are identical in both engines), final
    assignment, integer probe of the IVF_NPROBE nearest centroids, exact
    cosine rank over the probed clusters. ``query_where`` swaps the query
    predicate (default: the 5-id gate set) — the bulk variant replays the
    SAME chain over every corpus vector, so one oracle covers both the
    driver-loop and the executor-expression probe paths. ``train_where``
    restricts the SEED and every Lloyd round's statistics to a training
    subset (mirrors ``ivf_build(train=…)``); the final assignment — and
    everything downstream — still covers the full corpus."""
    te = "te" if train_where is not None else "e"
    ctes = [
        f"""e AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {IVF_UNITS}) AS BIGINT)) AS u
  FROM embeddings
)""",
    ]
    if train_where is not None:
        ctes.append(f"""te AS (
  SELECT * FROM e WHERE {train_where}
)""")
    ctes.append(f"""cent0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, u
  FROM {te} ORDER BY vec_id LIMIT {IVF_K}
)""")
    for it in range(IVF_ITERS + 1):
        # Lloyd-round assignments (it < final) cover the TRAIN subset;
        # the final assignment covers the full corpus
        src = te if it < IVF_ITERS else "e"
        ctes.append(f"""assign{it} AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cluster, {_int_d2_sql("e.u", "c.u")} AS d2
    FROM {src} e CROSS JOIN cent{it} c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1
)""")
        if it < IVF_ITERS:
            ctes.append(f"""mean{it + 1} AS (
  SELECT cluster, list(m ORDER BY d) AS u FROM (
    SELECT cluster, d, CAST(round(sum(x) / count(*)) AS BIGINT) AS m
    FROM (
      SELECT a.cluster, generate_subscripts(e.u, 1) AS d, unnest(e.u) AS x
      FROM {src} e JOIN assign{it} a ON a.vec_id = e.vec_id
    ) GROUP BY cluster, d
  ) GROUP BY cluster
)""")
            ctes.append(f"""cent{it + 1} AS (
  SELECT c.cluster, coalesce(m.u, c.u) AS u
  FROM cent{it} c LEFT JOIN mean{it + 1} m ON m.cluster = c.cluster
)""")
    final = IVF_ITERS
    pred = query_where or f"vec_id IN ({', '.join(map(str, SIM_QUERY_IDS))})"
    ctes.append(f"""qv AS (
  SELECT vec_id AS query_id, vec AS q_vec, u AS q_u FROM e
  WHERE {pred}
)""")
    ctes.append(f"""probe AS (
  SELECT query_id, cluster FROM (
    SELECT q.query_id, c.cluster, {_int_d2_sql("q.q_u", "c.u")} AS d2
    FROM qv q CROSS JOIN cent{final} c
  ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d2, cluster)
    <= {IVF_NPROBE}
)""")
    ctes.append(f"""scored AS (
  SELECT p.query_id, a.vec_id,
         round(list_cosine_similarity(e.vec, q.q_vec), 6) AS cos_sim
  FROM assign{final} a
  JOIN probe p ON p.cluster = a.cluster
  JOIN e ON e.vec_id = a.vec_id
  JOIN qv q ON q.query_id = p.query_id
  WHERE a.vec_id <> p.query_id
)""")
    ctes.append(f"""ranked AS (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id) AS rn
  FROM scored
)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT query_id, vec_id, cos_sim, rn FROM ranked WHERE rn <= {SIM_K}"
    )


def _pq_chain_ctes(
    dim: int, prefix: str = "", e_name: str = "e", query_ids=None
) -> list[str]:
    """The PQ build + ADC CTE chain (everything after the quantized
    ``e`` relation) with every CTE name carrying ``prefix`` — so two
    chains (e.g. contiguous PQ vs the OPQ permuted space in
    ``sim_opq_recall``) can coexist in one query without name
    collisions. Expects ``{e_name}(vec_id, u)``; the final CTE is
    ``{prefix}ranked(query_id, vec_id, adc_d2, rn)``. With the default
    prefix/e_name this is byte-identical to the chain ``_pq_sql`` has
    always generated."""
    sub = dim // PQ_M
    p = prefix
    qids = ", ".join(map(str, query_ids or SIM_QUERY_IDS))
    ctes: list[str] = []
    dists = []
    for s in range(PQ_M):
        lo, hi = s * sub + 1, (s + 1) * sub
        ctes.append(f"""{p}sub{s} AS (
  SELECT vec_id, u[{lo}:{hi}] AS su FROM {e_name}
)""")
        ctes.append(f"""{p}cent{s}_0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, su AS cu
  FROM {p}sub{s} ORDER BY vec_id LIMIT {PQ_K}
)""")
        for it in range(PQ_ITERS + 1):
            ctes.append(f"""{p}assign{s}_{it} AS (
  SELECT vec_id, cluster FROM (
    SELECT b.vec_id, c.cluster, {_int_d2_sql("b.su", "c.cu")} AS d2
    FROM {p}sub{s} b CROSS JOIN {p}cent{s}_{it} c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1
)""")
            if it < PQ_ITERS:
                ctes.append(f"""{p}mean{s}_{it + 1} AS (
  SELECT cluster, list(m ORDER BY d) AS cu FROM (
    SELECT cluster, d, CAST(round(sum(x) / count(*)) AS BIGINT) AS m
    FROM (
      SELECT a.cluster, generate_subscripts(b.su, 1) AS d, unnest(b.su) AS x
      FROM {p}sub{s} b JOIN {p}assign{s}_{it} a ON a.vec_id = b.vec_id
    ) GROUP BY cluster, d
  ) GROUP BY cluster
)""")
                ctes.append(f"""{p}cent{s}_{it + 1} AS (
  SELECT c.cluster, coalesce(m.cu, c.cu) AS cu
  FROM {p}cent{s}_{it} c LEFT JOIN {p}mean{s}_{it + 1} m ON m.cluster = c.cluster
)""")
        dists.append(
            f"""SELECT q.query_id, a.vec_id, {_int_d2_sql("q.su", "c.cu")} AS d2
    FROM {p}assign{s}_{PQ_ITERS} a
    JOIN {p}cent{s}_{PQ_ITERS} c ON a.cluster = c.cluster
    CROSS JOIN (SELECT vec_id AS query_id, su FROM {p}sub{s}
                WHERE vec_id IN ({qids})) q"""
        )
    union = "\n    UNION ALL\n    ".join(dists)
    ctes.append(f"""{p}alld AS (
    {union}
)""")
    ctes.append(f"""{p}scored AS (
  SELECT query_id, vec_id, CAST(sum(d2) AS BIGINT) AS adc_d2
  FROM {p}alld WHERE vec_id <> query_id GROUP BY 1, 2
)""")
    ctes.append(f"""{p}ranked AS (
  SELECT query_id, vec_id, adc_d2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_d2, vec_id) AS rn
  FROM {p}scored
)""")
    return ctes


def _pq_sql(dim: int = 64) -> str:
    """Unrolled replay of the integer micro-unit PQ build + ADC search
    (mirrors similarity.pq_build/pq_topk with m=PQ_M, k=PQ_K,
    iters=PQ_ITERS, units=IVF_UNITS): per subspace a seeded integer
    Lloyd identical to the IVF oracle's, then the ADC distance is the
    sum over subspaces of the exact integer L2 from the query subvector
    to the centroid of each vector's code — every quantity BIGINT, so
    the hash row pins the whole compressed index."""
    ctes = [
        f"""e AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {IVF_UNITS}) AS BIGINT)) AS u
  FROM embeddings
)"""
    ]
    ctes.extend(_pq_chain_ctes(dim))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT query_id, vec_id, adc_d2, CAST(rn AS INTEGER) AS rn"
        f" FROM ranked WHERE rn <= {SIM_K}"
    )


def _micro_e_cte(vec_body: str | None = None) -> str:
    """The shared micro-unit quantization CTE ``e(vec_id, u)`` the
    SQ/IVF-SQ/BQ replays open with. ``vec_body=None`` reads the raw
    ``embeddings`` table (byte-identical to the text these replays have
    always generated); passing a ``(vec_id, vec DOUBLE[])`` relation
    body (e.g. :func:`_opq_scaled_vec_body`) retargets the whole chain
    at a derived fixture — how the tier-frontier oracle runs all six
    tiers over one corpus."""
    if vec_body is None:
        return f"""e AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {IVF_UNITS}) AS BIGINT)) AS u
  FROM embeddings
)"""
    return f"""e AS MATERIALIZED (
  SELECT vec_id,
         list_transform(vec,
                        x -> CAST(round(x * {IVF_UNITS}) AS BIGINT)) AS u
  FROM ({vec_body})
)"""


def _sq_ctes(
    budgets, vec_body: str | None = None
) -> tuple[list[str], list[str]]:
    """The INT8 scalar-quantization replay (mirrors similarity.sq_topk
    with units=IVF_UNITS over the raw embeddings): quantize to
    micro-units, derive the corpus-wide ``vmax = max |u|`` with one
    scalar aggregation, code every vector as ``floor(u·127/vmax)``
    (single IEEE double expression — identical in both engines), then
    for each candidate budget the two-stage chain: top-``b`` per query
    by exact integer L2 in CODE space, exact full-resolution integer
    L2 re-rank of those survivors. Returns ``(ctes, approx_names)``
    where ``approx_names[i]`` is the CTE holding the budget-``i``
    top-:data:`SIM_K` result ``(query_id, vec_id, d2_u, rn)``."""
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    ctes = [
        _micro_e_cte(vec_body),
        """vm AS (
  SELECT greatest(1, max(list_max(list_transform(u, x -> abs(x))))) AS vmax
  FROM e
)""",
        """c AS MATERIALIZED (
  SELECT vec_id,
         list_transform(u, x -> CAST(floor((x * 127.0) / vm.vmax)
                                     AS BIGINT)) AS sq
  FROM e, vm
)""",
    ]
    names = []
    for b in budgets:
        ctes.append(f"""cand{b} AS (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, cb.vec_id,
           {_int_d2_sql("cb.sq", "q.sq")} AS d2c
    FROM c cb CROSS JOIN (SELECT * FROM c WHERE vec_id IN ({qids})) q
    WHERE cb.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY d2c, vec_id) <= {b}
)""")
        ctes.append(f"""approx{b} AS (
  SELECT query_id, vec_id, d2_u, rn FROM (
    SELECT cand{b}.query_id, cand{b}.vec_id,
           CAST({_int_d2_sql("ec.u", "eq.u")} AS BIGINT) AS d2_u,
           row_number() OVER (PARTITION BY cand{b}.query_id
                              ORDER BY {_int_d2_sql("ec.u", "eq.u")},
                                       cand{b}.vec_id) AS rn
    FROM cand{b}
    JOIN e ec ON ec.vec_id = cand{b}.vec_id
    JOIN e eq ON eq.vec_id = cand{b}.query_id
  ) WHERE rn <= {SIM_K}
)""")
        names.append(f"approx{b}")
    return ctes, names


def _sq_topk_sql() -> str:
    """Two-stage SQ retrieval replay — the gate row for ``sim_topk_sq``
    (candidates=:data:`RP_TOPK_CANDIDATES`)."""
    ctes, names = _sq_ctes([RP_TOPK_CANDIDATES])
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT query_id, vec_id, d2_u, CAST(rn AS INTEGER) AS rn"
        f" FROM {names[0]}"
    )


def _sq_recall_sql() -> str:
    """SQ recall replay at the :data:`SQ_RECALL_BUDGETS` candidate
    budgets against the exact integer-L2 top-:data:`SIM_K` (the
    ``int_l2_topk`` chain over the same micro-units)."""
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    ctes, names = _sq_ctes(SQ_RECALL_BUDGETS)
    ctes.append(f"""exact AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, eb.vec_id,
           {_int_d2_sql("eb.u", "q.u")} AS d2
    FROM e eb CROSS JOIN (SELECT * FROM e WHERE vec_id IN ({qids})) q
    WHERE eb.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY d2, vec_id) <= {SIM_K}
)""")
    branches = []
    for b, name in zip(SQ_RECALL_BUDGETS, names):
        ctes.append(f"""hits{b} AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e SEMI JOIN {name} a
    ON a.query_id = e.query_id AND a.vec_id = e.vec_id
  GROUP BY e.query_id
)""")
        branches.append(
            f"""SELECT 'sq_c{b}' AS method, q AS query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / {float(SIM_K)}, 6) AS recall
FROM (SELECT unnest([{qids}]) AS q) LEFT JOIN hits{b} h ON h.query_id = q"""
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(branches)
    )


#: DuckDB text of the OPQ gate fixture (``_scaled_emb`` + micro-unit
#: quantization): cast to double, scale the first OPQ_HOT_DIMS dims by
#: the power-of-two OPQ_HOT_SCALE (exact in IEEE), round to units.
_OPQ_EU_CTE = f"""eu AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        (x, i) -> CAST(round(x * CASE WHEN i <= {OPQ_HOT_DIMS}
                                                      THEN {float(OPQ_HOT_SCALE)}
                                                      ELSE 1.0 END
                                             * {IVF_UNITS}) AS BIGINT)) AS u
  FROM embeddings
)"""


def _opq_perm_ctes() -> list[str]:
    """The variance-balanced permutation replay (mirrors
    similarity.opq_permutation): exact BIGINT variance numerators
    ``n·Σx² − (Σx)²`` per dimension over the first
    :data:`OPQ_SAMPLE_N` rows by id, rank descending with ties to the
    lower dimension, deal rank ``r`` to output position
    ``(r % m)·sub + r // m`` (subspace-major), then rebuild each
    vector's micro-unit list in permuted order (quantization commutes
    with the reorder, so permuting ``u`` equals quantizing the permuted
    doubles). Expects ``eu(vec_id, u)``; emits ``pe(vec_id, u)``."""
    sub = 64 // PQ_M
    return [
        f"""samp AS (
  SELECT u FROM eu ORDER BY vec_id LIMIT {OPQ_SAMPLE_N}
)""",
        """dstats AS (
  SELECT d, count(*) AS n, sum(x) AS s1, sum(x * x) AS s2 FROM (
    SELECT generate_subscripts(u, 1) - 1 AS d, unnest(u) AS x FROM samp
  ) GROUP BY d
)""",
        """rankd AS (
  SELECT d, row_number() OVER (ORDER BY n * s2 - s1 * s1 DESC, d) - 1 AS r
  FROM dstats
)""",
        f"""pmap AS (
  SELECT d AS src, (r % {PQ_M}) * {sub} + (r // {PQ_M}) AS j FROM rankd
)""",
        """pe AS MATERIALIZED (
  SELECT vec_id, list(x ORDER BY j) AS u FROM (
    SELECT xs.vec_id, pmap.j, xs.x
    FROM (SELECT vec_id, generate_subscripts(u, 1) - 1 AS d, unnest(u) AS x
          FROM eu) xs
    JOIN pmap ON pmap.src = xs.d
  ) GROUP BY vec_id
)""",
    ]


def _opq_topk_sql() -> str:
    """OPQ ADC replay: the scaled fixture, the permutation chain, then
    the standard PQ build + ADC CTEs (:func:`_pq_chain_ctes`) over the
    permuted micro-units."""
    ctes = [_OPQ_EU_CTE]
    ctes.extend(_opq_perm_ctes())
    ctes.extend(_pq_chain_ctes(64, prefix="o", e_name="pe"))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT query_id, vec_id, adc_d2, CAST(rn AS INTEGER) AS rn"
        f" FROM oranked WHERE rn <= {SIM_K}"
    )


def _opq_recall_sql() -> str:
    """Contiguous-PQ vs OPQ recall replay on the skewed fixture: the
    exact integer-L2 truth over the scaled micro-units, the contiguous
    PQ chain (prefix ``p``) straight over ``eu``, the OPQ chain
    (prefix ``o``) over the permuted ``pe`` — both via
    :func:`_pq_chain_ctes`, which exists precisely so the two can
    share one query — then per-method hit counts."""
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    ctes = [_OPQ_EU_CTE]
    ctes.extend(_opq_perm_ctes())
    ctes.extend(_pq_chain_ctes(64, prefix="p", e_name="eu"))
    ctes.extend(_pq_chain_ctes(64, prefix="o", e_name="pe"))
    ctes.append(f"""exact AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, eb.vec_id,
           {_int_d2_sql("eb.u", "q.u")} AS d2
    FROM eu eb CROSS JOIN (SELECT * FROM eu WHERE vec_id IN ({qids})) q
    WHERE eb.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY d2, vec_id) <= {SIM_K}
)""")
    branches = []
    for method, p in (("pq", "p"), ("opq", "o")):
        ctes.append(f"""{p}hits AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e SEMI JOIN (SELECT query_id, vec_id FROM {p}ranked
                          WHERE rn <= {SIM_K}) a
    ON a.query_id = e.query_id AND a.vec_id = e.vec_id
  GROUP BY e.query_id
)""")
        branches.append(
            f"""SELECT '{method}' AS method, q AS query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / {float(SIM_K)}, 6) AS recall
FROM (SELECT unnest([{qids}]) AS q) LEFT JOIN {p}hits h ON h.query_id = q"""
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(branches)
    )


#: Default DuckDB source for the ANN oracles' ``e`` CTE — overridable
#: (``e_body=``) so a replay can run over a derived relation (e.g. the
#: clustered recall-curve fixture) instead of the raw table.
DEFAULT_E_BODY = "SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings"


def _clustered_e_body() -> str:
    """DuckDB side of :func:`_clustered_emb`: the same ±AMP bit-sign
    snap (1-based indexed lambda; ``(i-1) % 4`` picks the bit) over
    ``embedding::DOUBLE[]``, unioned with the straddling query rows as
    repr'd float64 literals (exact round-trip)."""
    amp = repr(RECALL_CLUSTER_AMP)
    qvals = ",\n    ".join(
        f"({qid}, [{', '.join(repr(v) for v in vec)}]::DOUBLE[])"
        for qid, vec in _straddle_queries()
    )
    return f"""SELECT vec_id,
    list_transform(embedding::DOUBLE[], (x, i) ->
      x + CASE WHEN (CAST(vec_id % {RECALL_CLUSTER_C} AS BIGINT)
                     // ([1,2,4,8][((i - 1) % 4) + 1])) % 2 = 1
               THEN {amp}::DOUBLE ELSE -{amp}::DOUBLE END) AS vec
  FROM embeddings WHERE vec_id < {RECALL_FIXTURE_ROWS}
  UNION ALL
  SELECT * FROM (VALUES
    {qvals}) AS sq(vec_id, vec)"""


def _ivfpq_sql(
    dim: int = 64,
    residual: bool = False,
    nprobe: int = IVF_NPROBE,
    e_body: str | None = None,
    query_ids=None,
    units: int = IVF_UNITS,
    k_out: int = SIM_K,
    query_where: str | None = None,
    rerank_k: int | None = None,
) -> str:
    """Unrolled replay of IVFADC (mirrors similarity.ivfpq_topk): the
    coarse integer Lloyd of the IVF oracle (same CTE chain), the
    per-subspace integer Lloyd of the PQ oracle, the integer probe of
    the IVF_NPROBE nearest coarse cells per query, and the ADC sum
    restricted to the probed cells' members — every quantity BIGINT, so
    the hash row pins the composed index end-to-end (bit-packing is a
    Spark-side storage detail: codes round-trip through one BIGINT and
    unpack to the same integers this replay derives directly).

    ``residual=True`` replays the :func:`similarity.ivfpq_build_residual`
    index instead: the PQ chains train on and encode each vector's
    integer residual from its coarse centroid, and the per-subspace
    query distances use the query's residual wrt each PROBED cell (the
    qsub CTEs carry (query, cluster) grain) — restriction to probed
    cells falls out of the cluster join.

    ``query_where`` swaps the query predicate (``"TRUE"`` = every
    corpus vector, the bulk kNN-graph form — mirrors ``_ivf_sql``'s).
    ``rerank_k`` appends the exact full-dimension integer-L2 re-rank of
    each query's ``k_out`` ADC candidates (the two-stage bulk shape of
    ``similarity.ivfpq_bulk_topk``) — output then matches its
    ``(query_id, vec_id, d2_u, rn)``."""
    sub = dim // PQ_M
    qids = list(query_ids) if query_ids is not None else SIM_QUERY_IDS
    qpred = query_where or f"vec_id IN ({', '.join(map(str, qids))})"
    # coarse IVF chain (verbatim structure from _ivf_sql)
    ctes = [
        f"""e AS MATERIALIZED (
  SELECT vec_id, vec,
         list_transform(vec,
                        x -> CAST(round(x * {units}) AS BIGINT)) AS u
  FROM ({e_body or DEFAULT_E_BODY})
)""",
        f"""cent0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, u
  FROM e ORDER BY vec_id LIMIT {IVF_K}
)""",
    ]
    for it in range(IVF_ITERS + 1):
        ctes.append(f"""assign{it} AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cluster, {_int_d2_sql("e.u", "c.u")} AS d2
    FROM e CROSS JOIN cent{it} c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1
)""")
        if it < IVF_ITERS:
            ctes.append(f"""mean{it + 1} AS (
  SELECT cluster, list(m ORDER BY d) AS u FROM (
    SELECT cluster, d, CAST(round(sum(x) / count(*)) AS BIGINT) AS m
    FROM (
      SELECT a.cluster, generate_subscripts(e.u, 1) AS d, unnest(e.u) AS x
      FROM e JOIN assign{it} a ON a.vec_id = e.vec_id
    ) GROUP BY cluster, d
  ) GROUP BY cluster
)""")
            ctes.append(f"""cent{it + 1} AS (
  SELECT c.cluster, coalesce(m.u, c.u) AS u
  FROM cent{it} c LEFT JOIN mean{it + 1} m ON m.cluster = c.cluster
)""")
    final = IVF_ITERS
    ctes.append(f"""qv AS (
  SELECT vec_id AS query_id, u AS q_u FROM e
  WHERE {qpred}
)""")
    ctes.append(f"""probe AS (
  SELECT query_id, cluster FROM (
    SELECT q.query_id, c.cluster, {_int_d2_sql("q.q_u", "c.u")} AS d2
    FROM qv q CROSS JOIN cent{final} c
  ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d2, cluster)
    <= {nprobe}
)""")
    if residual:
        ctes.append(f"""res AS (
  SELECT e.vec_id, a.cluster,
         list_transform(generate_series(1, {dim}), i -> e.u[i] - c.u[i]) AS u
  FROM e JOIN assign{final} a ON a.vec_id = e.vec_id
  JOIN cent{final} c ON c.cluster = a.cluster
)""")
    pq_src = "res" if residual else "e"
    # per-subspace PQ chains (verbatim structure from _pq_sql)
    dists = []
    for s in range(PQ_M):
        lo, hi = s * sub + 1, (s + 1) * sub
        ctes.append(f"""sub{s} AS (
  SELECT vec_id, u[{lo}:{hi}] AS su FROM {pq_src}
)""")
        if residual:
            ctes.append(f"""qsub{s} AS (
  SELECT q.query_id, p.cluster,
         list_transform(generate_series({lo}, {hi}), i -> q.q_u[i] - c.u[i])
           AS su
  FROM qv q JOIN probe p ON p.query_id = q.query_id
  JOIN cent{final} c ON c.cluster = p.cluster
)""")
        ctes.append(f"""pcent{s}_0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, su AS cu
  FROM sub{s} ORDER BY vec_id LIMIT {PQ_K}
)""")
        for it in range(PQ_ITERS + 1):
            ctes.append(f"""passign{s}_{it} AS (
  SELECT vec_id, cluster FROM (
    SELECT b.vec_id, c.cluster, {_int_d2_sql("b.su", "c.cu")} AS d2
    FROM sub{s} b CROSS JOIN pcent{s}_{it} c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1
)""")
            if it < PQ_ITERS:
                ctes.append(f"""pmean{s}_{it + 1} AS (
  SELECT cluster, list(m ORDER BY d) AS cu FROM (
    SELECT cluster, d, CAST(round(sum(x) / count(*)) AS BIGINT) AS m
    FROM (
      SELECT a.cluster, generate_subscripts(b.su, 1) AS d, unnest(b.su) AS x
      FROM sub{s} b JOIN passign{s}_{it} a ON a.vec_id = b.vec_id
    ) GROUP BY cluster, d
  ) GROUP BY cluster
)""")
                ctes.append(f"""pcent{s}_{it + 1} AS (
  SELECT c.cluster, coalesce(m.cu, c.cu) AS cu
  FROM pcent{s}_{it} c LEFT JOIN pmean{s}_{it + 1} m ON m.cluster = c.cluster
)""")
        if residual:
            dists.append(
                f"""SELECT qs.query_id, a.vec_id, {_int_d2_sql("qs.su", "c.cu")} AS d2
    FROM passign{s}_{PQ_ITERS} a
    JOIN pcent{s}_{PQ_ITERS} c ON a.cluster = c.cluster
    JOIN res r ON r.vec_id = a.vec_id
    JOIN qsub{s} qs ON qs.cluster = r.cluster"""
            )
        else:
            dists.append(
                f"""SELECT q.query_id, a.vec_id, {_int_d2_sql("q.su", "c.cu")} AS d2
    FROM passign{s}_{PQ_ITERS} a
    JOIN pcent{s}_{PQ_ITERS} c ON a.cluster = c.cluster
    CROSS JOIN (SELECT b.vec_id AS query_id, b.su FROM sub{s} b
                JOIN qv ON qv.query_id = b.vec_id) q"""
            )
    union = "\n    UNION ALL\n    ".join(dists)
    ctes.append(f"""alld AS (
    {union}
)""")
    if residual:
        # restriction to probed cells is the qsub cluster join above
        ctes.append("""scored AS (
  SELECT query_id, vec_id, CAST(sum(d2) AS BIGINT) AS adc_d2
  FROM alld WHERE vec_id <> query_id GROUP BY 1, 2
)""")
    else:
        ctes.append(f"""cand AS (
  SELECT p.query_id, a.vec_id
  FROM assign{final} a JOIN probe p ON p.cluster = a.cluster
  WHERE a.vec_id <> p.query_id
)""")
        ctes.append("""scored AS (
  SELECT c.query_id, c.vec_id, CAST(sum(d.d2) AS BIGINT) AS adc_d2
  FROM cand c JOIN alld d
    ON d.query_id = c.query_id AND d.vec_id = c.vec_id
  GROUP BY 1, 2
)""")
    ctes.append("""ranked AS (
  SELECT query_id, vec_id, adc_d2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_d2, vec_id) AS rn
  FROM scored
)""")
    if rerank_k is None:
        return (
            "WITH "
            + ",\n".join(ctes)
            + f"\nSELECT query_id, vec_id, adc_d2, CAST(rn AS INTEGER) AS rn"
            f" FROM ranked WHERE rn <= {k_out}"
        )
    # exact full-dimension re-rank of the ADC candidate cut (mirrors
    # similarity.ivfpq_bulk_topk stage 2: integer L2 over the raw
    # quantized vectors, (d2_u, vec_id) tie-break)
    ctes.append(f"""rcand AS (
  SELECT query_id, vec_id FROM ranked WHERE rn <= {k_out}
)""")
    ctes.append(f"""rr AS (
  SELECT c.query_id, c.vec_id,
         CAST({_int_d2_sql("eq.u", "ev.u")} AS BIGINT) AS d2_u
  FROM rcand c
  JOIN e eq ON eq.vec_id = c.query_id
  JOIN e ev ON ev.vec_id = c.vec_id
)""")
    ctes.append("""rranked AS (
  SELECT query_id, vec_id, d2_u,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY d2_u, vec_id) AS rn
  FROM rr
)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT query_id, vec_id, d2_u, CAST(rn AS INTEGER) AS rn"
        f" FROM rranked WHERE rn <= {rerank_k}"
    )


def _recall_audit_sql() -> str:
    """Recall-audit replay: the full residual-IVFADC oracle runs as a
    subquery (its WITH chain shadows the outer CTEs — legal SQL), the
    brute side is the exact rounded-cosine top-k, and the true integer
    L2 comes straight from the quantized vectors; per-query aggregation
    mirrors q_sim_recall_audit column-for-column."""
    ids = ", ".join(map(str, SIM_QUERY_IDS))
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {IVF_UNITS}) AS BIGINT)) AS u
  FROM embeddings
),
approx AS (
  SELECT * FROM (
{_ivfpq_sql(residual=True)}
  )
),
brute AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(e.vec, q.q_vec), 6) DESC,
                      e.vec_id) AS rn
    FROM e CROSS JOIN (
      SELECT vec_id AS query_id, vec AS q_vec FROM e
      WHERE vec_id IN ({ids})
    ) q
    WHERE e.vec_id <> q.query_id
  ) WHERE rn <= {SIM_K}
),
pairs AS (
  SELECT a.query_id, a.vec_id, a.adc_d2,
         {_int_d2_sql("qe.u", "ve.u")} AS exact_d2,
         CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM approx a
  JOIN e qe ON qe.vec_id = a.query_id
  JOIN e ve ON ve.vec_id = a.vec_id
  LEFT JOIN brute b
    ON b.query_id = a.query_id AND b.vec_id = a.vec_id
)
SELECT query_id,
       CAST(count(*) AS BIGINT) AS n_returned,
       CAST(sum(hit) AS BIGINT) AS n_hits,
       CAST((100 * sum(hit)) // {SIM_K} AS BIGINT) AS recall_pct,
       CAST(sum(adc_d2) AS BIGINT) AS sum_adc_d2,
       CAST(sum(exact_d2) AS BIGINT) AS sum_exact_d2,
       CASE WHEN sum(exact_d2) = 0 THEN NULL
            ELSE round(CAST(sum(adc_d2) AS DOUBLE) / sum(exact_d2), 6)
       END AS adc_exact_ratio
FROM pairs GROUP BY query_id
"""


def _recall_curve_sql() -> str:
    """Recall-curve replay: one full residual-IVFADC oracle per nprobe
    operating point (each nested as a subquery — the deterministic
    Lloyd chains replay to identical centroids, so only the probe width
    differs), unioned with the nprobe tag, scored against the exact
    rounded-cosine brute top-k; mirrors q_sim_recall_curve
    column-for-column. Runs over the CLUSTERED fixture
    (:func:`_clustered_e_body`) with the straddling query ids — the
    Spark side and all three nested index replays share the same
    derived relation."""
    ids = ", ".join(map(str, RECALL_STRADDLE_IDS))
    e_body = _clustered_e_body()
    branches = "\n    UNION ALL\n    ".join(
        f"SELECT {np_} AS nprobe, query_id, vec_id FROM (\n"
        f"{_ivfpq_sql(residual=True, nprobe=np_, e_body=e_body, query_ids=RECALL_STRADDLE_IDS)}\n)"
        for np_ in RECALL_CURVE_NPROBES
    )
    return f"""
WITH e AS (
  SELECT vec_id, vec FROM ({e_body})
),
brute AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(e.vec, q.q_vec), 6) DESC,
                      e.vec_id) AS rn
    FROM e CROSS JOIN (
      SELECT vec_id AS query_id, vec AS q_vec FROM e
      WHERE vec_id IN ({ids})
    ) q
    WHERE e.vec_id <> q.query_id
  ) WHERE rn <= {SIM_K}
),
approx AS (
    {branches}
)
SELECT a.nprobe, a.query_id,
       CAST(count(*) AS BIGINT) AS n_returned,
       CAST(sum(CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       CAST((100 * sum(CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END))
            // {SIM_K} AS BIGINT) AS recall_pct
FROM approx a
LEFT JOIN brute b ON b.query_id = a.query_id AND b.vec_id = a.vec_id
GROUP BY a.nprobe, a.query_id
"""


def _bpe_chain_ctes(n_merges: int) -> list:
    """The BPE trainer replay CTE chain: ``n_merges`` rounds, each =
    pair counts over the current symbolized vocab → deterministic
    argmax (count desc, then lexicographic pair) → non-overlapping
    left-to-right merge rewrite as a ``list_reduce`` fold (the empty
    accumulator rides via ``list_prepend``; whole-element equality
    reproduces the aaaa → [aa, aa] rule) — mirrors
    ``functions.text.bpe_train`` round-for-round. Shared by the vocab
    and per-doc token-count oracles."""
    ctes = [
        """v0 AS (
  SELECT word, count(*) AS n, string_split(word, '') AS syms FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
  ) WHERE word <> '' GROUP BY word
)"""
    ]
    for i in range(n_merges):
        ctes.append(f"""p{i} AS (
  SELECT cs[j] AS l, cs[j + 1] AS r, sum(n) AS c FROM (
    SELECT n, syms AS cs, unnest(range(1, len(syms))) AS j
    FROM v{i} WHERE len(syms) >= 2
  ) GROUP BY 1, 2
)""")
        ctes.append(f"""b{i} AS (
  SELECT l, r FROM p{i} ORDER BY c DESC, l, r LIMIT 1
)""")
        ctes.append(f"""v{i + 1} AS (
  SELECT word, n,
    list_reduce(
      list_prepend(CAST([] AS VARCHAR[]), list_transform(syms, s -> [s])),
      (a, x) -> CASE WHEN len(a) > 0 AND a[len(a)] = b.l AND x[1] = b.r
                THEN list_concat(list_slice(a, 1, len(a) - 1), [b.l || b.r])
                ELSE list_concat(a, x) END
    ) AS syms
  FROM v{i}, b{i} b
)""")
    return ctes


def _bpe_vocab_sql(n_merges: int) -> str:
    return (
        "WITH "
        + ",\n".join(_bpe_chain_ctes(n_merges))
        + f"""
SELECT word, CAST(n AS BIGINT) AS n,
       CAST(len(syms) AS INTEGER) AS n_symbols,
       array_to_string(syms, ' ') AS symbols_str
FROM v{n_merges}
"""
    )


def _bpe_tokens_sql(
    n_merges: int, train_where: str = "", score_where: str = ""
) -> str:
    """Per-doc token counts under the trained tokenizer: every training
    word's post-merge symbolization lives in the final vocab CTE, so the
    per-doc count is a word-keyed LEFT join + sum with char-length
    byte-fallback for unseen words (mirrors
    ``functions.text.bpe_token_counts``). ``train_where``/``score_where``
    (SQL ``WHERE ...`` strings) carve the trainer's corpus and the
    scored corpus out of ``documents`` for the held-out deployment."""
    ctes = _bpe_chain_ctes(n_merges)
    if train_where:
        ctes[0] = ctes[0].replace(
            "FROM documents", f"FROM documents {train_where}"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents {score_where}
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(coalesce(len(v.syms), length(t.word))) AS BIGINT)
         AS n_bpe_tokens,
       CAST(sum(CASE WHEN v.syms IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_fallback_words
FROM tok t LEFT JOIN v{n_merges} v USING (word)
WHERE t.word <> ''
GROUP BY t.doc_id
"""
    )


def _pack_bpe_sql() -> str:
    """Pack replay over the nested BPE trainer chain: the per-doc count
    subquery (itself a full 4-merge replay) feeds the same md5 bucket +
    running-sum window as the whitespace pack oracle."""
    return f"""
WITH bt AS ({_bpe_tokens_sql(BPE_GATE_MERGES)}),
t AS (
  SELECT doc_id,
         ('0x' || substr(md5('0:' || doc_id), 1, 15))::BIGINT % 8 AS bucket,
         n_bpe_tokens AS n_tokens
  FROM bt
),
c AS (
  SELECT doc_id, bucket, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY bucket ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM t
)
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
       CAST(cum_before // 512 AS BIGINT) AS pack_id,
       n_tokens,
       CAST(cum_before % 512 AS BIGINT) AS offset_in_pack
FROM c
"""


def _mixture_bpe_sql() -> str:
    """Mixture replay in BPE tokens: trainer chain nested as the count
    source, then the strata aggregation + totals of the whitespace
    mixture oracle."""
    return f"""
WITH bt AS ({_bpe_tokens_sql(BPE_GATE_MERGES)}),
g AS (
  SELECT d.source, d.lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(bt.n_bpe_tokens) AS BIGINT) AS n_tokens
  FROM documents d JOIN bt USING (doc_id) GROUP BY 1, 2
),
tot AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS tt,
         CAST(count(*) AS BIGINT) AS ng
  FROM g
)
SELECT source, lang, n_docs, n_tokens,
       round(CAST(n_tokens AS DOUBLE) / tt, 6) AS token_share,
       round(CAST(tt AS DOUBLE) / (ng * n_tokens), 6) AS uniform_weight
FROM g, tot
"""


def _dsir_sql(select_top: int | None = None) -> str:
    """DSIR replay: hashed-bigram buckets (the md5 bucket idiom),
    ONE bucket aggregation with window totals, per-bucket micro-log
    ratios, per-doc BIGINT sum. ``select_top`` switches to the
    selection cut (non-target docs, logratio desc / doc_id)."""
    b, k, kb = DSIR_GATE_BUCKETS, 0.5, 0.5 * DSIR_GATE_BUCKETS
    base = f"""
WITH words AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
),
feats AS (
  SELECT doc_id, (source = '{DSIR_GATE_TARGET}') AS t,
         ('0x' || substr(md5('dsir:' || array_to_string(w[i:i+1], ' ')),
                         1, 15))::BIGINT % {b} AS bucket
  FROM (
    SELECT doc_id, source, w, unnest(generate_series(1, len(w) - 1)) AS i
    FROM words WHERE len(w) >= 2
  )
),
pb AS (
  SELECT bucket, count(*) AS n_raw,
         sum(CASE WHEN t THEN 1 ELSE 0 END) AS n_t
  FROM feats GROUP BY bucket
),
ratios AS (
  SELECT bucket,
         CAST(round((log10((n_t + {k}) / (sum(n_t) OVER () + {kb}))
                   - log10((n_raw + {k}) / (sum(n_raw) OVER () + {kb})))
                    * 1000000) AS BIGINT) AS lr_u
  FROM pb
),
scored AS (
  SELECT f.doc_id, count(*) AS n_feats,
         round(sum(r.lr_u) / 1000000.0, 6) AS dsir_logratio
  FROM feats f JOIN ratios r USING (bucket)
  GROUP BY f.doc_id
)"""
    if select_top is None:
        return base + """
SELECT d.doc_id, CAST(coalesce(s.n_feats, 0) AS BIGINT) AS n_feats,
       s.dsir_logratio
FROM documents d LEFT JOIN scored s USING (doc_id)
"""
    return base + f"""
SELECT s.doc_id, CAST(s.n_feats AS BIGINT) AS n_feats, s.dsir_logratio
FROM scored s JOIN documents d USING (doc_id)
WHERE d.source <> '{DSIR_GATE_TARGET}' AND s.dsir_logratio IS NOT NULL
ORDER BY s.dsir_logratio DESC, s.doc_id
LIMIT {select_top}
"""


def _rp_topk_sql() -> str:
    """Two-stage RP retrieval replay: the projection chain (shared text
    with ``_rp_sql``), projected lists, QUALIFY top-candidates per query
    by exact RP-space L2, then exact full-dim re-rank over the
    candidate ids. MATERIALIZED: y/e are each referenced twice."""
    od, idim, u = RP_GATE_OUT_DIM, RP_GATE_IN_DIM, RP_GATE_UNITS
    c, k = RP_TOPK_CANDIDATES, SIM_K
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    return f"""
WITH e AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {u}) AS BIGINT)) AS u
  FROM embeddings
),
s AS MATERIALIZED (
  SELECT j.j, d.d,
         CASE WHEN ('0x' || substr(md5('rp:' || j.j || ':' || d.d), 1, 15))::BIGINT % 2 = 0
              THEN 1 ELSE -1 END AS sgn
  FROM (SELECT unnest(generate_series(0, {od - 1})) AS j) j
  CROSS JOIN (SELECT unnest(generate_series(0, {idim - 1})) AS d) d
),
proj AS MATERIALIZED (
  SELECT x.vec_id, s.j, CAST(sum(s.sgn * x.xu) AS BIGINT) AS v_u
  FROM (SELECT vec_id, generate_subscripts(u, 1) - 1 AS d, unnest(u) AS xu
        FROM e) x
  JOIN s ON s.d = x.d
  GROUP BY x.vec_id, s.j
),
y AS MATERIALIZED (
  SELECT vec_id, list(v_u ORDER BY j) AS y FROM proj GROUP BY vec_id
),
cand AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, cy.vec_id,
           {_int_d2_sql("cy.y", "q.y")} AS d2rp
    FROM y cy CROSS JOIN (SELECT * FROM y WHERE vec_id IN ({qids})) q
    WHERE cy.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY d2rp, vec_id) <= {c}
)
SELECT query_id, vec_id, d2_u, CAST(rn AS INTEGER) AS rn FROM (
  SELECT cand.query_id, cand.vec_id,
         CAST({_int_d2_sql("ec.u", "eq.u")} AS BIGINT) AS d2_u,
         row_number() OVER (PARTITION BY cand.query_id
                            ORDER BY {_int_d2_sql("ec.u", "eq.u")},
                                     cand.vec_id) AS rn
  FROM cand
  JOIN e ec ON ec.vec_id = cand.vec_id
  JOIN e eq ON eq.vec_id = cand.query_id
) WHERE rn <= {k}
"""


def _rp_recall_sql() -> str:
    """Recall replay: the full two-stage chain as a CTE plus the exact
    integer ranking over all pairs, semi-joined and counted per
    query."""
    u, k = RP_GATE_UNITS, SIM_K
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    approx = _rp_topk_sql().strip()
    return f"""
WITH approx AS MATERIALIZED (
{approx}
),
e2 AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {u}) AS BIGINT)) AS u
  FROM embeddings
),
exact AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id,
           {_int_d2_sql("c.u", "q.u")} AS d2
    FROM e2 c CROSS JOIN (SELECT * FROM e2 WHERE vec_id IN ({qids})) q
    WHERE c.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d2, vec_id) <= {k}
),
hits AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e SEMI JOIN approx a
    ON a.query_id = e.query_id AND a.vec_id = e.vec_id
  GROUP BY e.query_id
)
SELECT q AS query_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / {float(k)}, 6) AS recall
FROM (SELECT unnest([{qids}]) AS q) LEFT JOIN hits h ON h.query_id = q
"""


def _rp_e_body() -> str:
    """DuckDB side of :func:`similarity.rp_ivfpq_build`'s index input:
    the corpus JL-projected to ``RP_GATE_OUT_DIM`` exact integer sums
    (same sign-matrix text as ``_rp_topk_sql``), shaped as the
    ``(vec_id, vec DOUBLE[])`` relation ``_ivfpq_sql``'s ``e`` CTE
    expects — downstream runs with ``units=1``, and ``round(x * 1)``
    of an integer-valued double is exact."""
    od, idim, u = RP_GATE_OUT_DIM, RP_GATE_IN_DIM, RP_GATE_UNITS
    return f"""SELECT vec_id, list(CAST(v_u AS DOUBLE) ORDER BY j) AS vec FROM (
    SELECT x.vec_id, s.j, CAST(sum(s.sgn * x.xu) AS BIGINT) AS v_u
    FROM (SELECT vec_id, generate_subscripts(u, 1) - 1 AS d, unnest(u) AS xu
          FROM (SELECT vec_id,
                       list_transform(embedding::DOUBLE[],
                                      x -> CAST(round(x * {u}) AS BIGINT)) AS u
                FROM embeddings)) x
    JOIN (SELECT j.j, d.d,
                 CASE WHEN ('0x' || substr(md5('rp:' || j.j || ':' || d.d), 1, 15))::BIGINT % 2 = 0
                      THEN 1 ELSE -1 END AS sgn
          FROM (SELECT unnest(generate_series(0, {od - 1})) AS j) j
          CROSS JOIN (SELECT unnest(generate_series(0, {idim - 1})) AS d) d) s
      ON s.d = x.d
    GROUP BY x.vec_id, s.j
  ) GROUP BY vec_id"""


def _rp_ivfpq_sql(candidates: int = RP_TOPK_CANDIDATES) -> str:
    """Replay of the project-then-index retrieval
    (``q_sim_topk_rp_ivfpq``): the residual-IVFADC chain
    (``_ivfpq_sql`` at ``units=1`` over the RP-projected relation,
    ``dim=RP_GATE_OUT_DIM``) as the stage-1 candidate cut of
    ``candidates`` per query, then the exact full-dimension integer
    re-rank over the candidate ids — mirrors the Spark two-stage plan
    column-for-column including both tie-breaks."""
    k, u = SIM_K, RP_GATE_UNITS
    inner = _ivfpq_sql(
        dim=RP_GATE_OUT_DIM, residual=True, nprobe=IVF_NPROBE,
        e_body=_rp_e_body(), units=1, k_out=candidates,
    )
    return f"""
WITH cand AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
{inner}
  )
),
e2 AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {u}) AS BIGINT)) AS u
  FROM embeddings
)
SELECT query_id, vec_id, d2_u, CAST(rn AS INTEGER) AS rn FROM (
  SELECT cand.query_id, cand.vec_id,
         CAST({_int_d2_sql("ec.u", "eq.u")} AS BIGINT) AS d2_u,
         row_number() OVER (PARTITION BY cand.query_id
                            ORDER BY {_int_d2_sql("ec.u", "eq.u")},
                                     cand.vec_id) AS rn
  FROM cand
  JOIN e2 ec ON ec.vec_id = cand.vec_id
  JOIN e2 eq ON eq.vec_id = cand.query_id
) WHERE rn <= {k}
"""


def _rp_ivfpq_recall_sql() -> str:
    """Recall replay for the candidate-budget sweep: the two
    compressed-index branches (shared Lloyd chains replay to identical
    centroids — only the stage-1 cut differs) plus the full-dim
    residual-IVFADC branch, each semi-joined against the exact
    integer-L2 top-k and densified over the (method x query) grid —
    mirrors ``q_sim_rp_ivfpq_recall`` column-for-column."""
    u, k = RP_GATE_UNITS, SIM_K
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    methods = [f"rp_ivfpq_c{b}" for b in RP_IVFPQ_BUDGETS] + ["ivfpq_full"]
    branches = [
        f"SELECT 'rp_ivfpq_c{b}' AS method, query_id, vec_id FROM (\n"
        f"{_rp_ivfpq_sql(candidates=b).strip()}\n)"
        for b in RP_IVFPQ_BUDGETS
    ]
    branches.append(
        "SELECT 'ivfpq_full' AS method, query_id, vec_id FROM (\n"
        f"{_ivfpq_sql(residual=True)}\n)"
    )
    approx = "\n    UNION ALL\n    ".join(branches)
    mlist = ", ".join(f"'{m}'" for m in methods)
    return f"""
WITH approx AS MATERIALIZED (
    {approx}
),
e3 AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {u}) AS BIGINT)) AS u
  FROM embeddings
),
exact AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id,
           {_int_d2_sql("c.u", "q.u")} AS d2
    FROM e3 c CROSS JOIN (SELECT * FROM e3 WHERE vec_id IN ({qids})) q
    WHERE c.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d2, vec_id) <= {k}
),
hits AS (
  SELECT a.method, e.query_id, count(*) AS n_hits
  FROM exact e JOIN approx a
    ON a.query_id = e.query_id AND a.vec_id = e.vec_id
  GROUP BY a.method, e.query_id
),
grid AS (
  SELECT m.method, CAST(q.q AS BIGINT) AS query_id
  FROM (SELECT unnest([{mlist}]) AS method) m
  CROSS JOIN (SELECT unnest([{qids}]) AS q) q
)
SELECT g.method, g.query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / {float(k)}, 6) AS recall
FROM grid g LEFT JOIN hits h
  ON h.method = g.method AND h.query_id = g.query_id
"""


def _pca_sql(project: bool = False) -> str:
    """Full replay of the integer power-iteration PCA build
    (``pca_power_build``): exact-integer covariance numerator, one
    rescale to +/-1e6, then per component 8 unrolled
    matvec -> /1e6 requantize -> unit-normalize rounds, a Rayleigh
    quotient, and integer deflation — every intermediate BIGINT, every
    float step a single shared IEEE expression. ``project`` appends the
    corpus projection instead of emitting the components."""
    k, iters, u = PCA_GATE_K, PCA_GATE_ITERS, PCA_GATE_UNITS
    ctes = [
        f"""eu AS (
  SELECT vec_id, list_transform(embedding::DOUBLE[],
                                x -> CAST(round(x * {u}) AS BIGINT)) AS u
  FROM embeddings
)""",
        """xx AS (
  SELECT vec_id, generate_subscripts(u, 1) - 1 AS d, unnest(u) AS xv FROM eu
)""",
        "nn AS (SELECT count(*) AS n FROM eu)",
        "sv AS (SELECT d, sum(xv) AS s FROM xx GROUP BY d)",
        """ss AS (
  SELECT a.d AS i, b.d AS j, sum(a.xv * b.xv) AS ssum
  FROM xx a JOIN xx b USING (vec_id) GROUP BY a.d, b.d
)""",
        """cm AS (
  SELECT ss.i, ss.j, (SELECT n FROM nn) * ss.ssum - si.s * sj.s AS m
  FROM ss JOIN sv si ON si.d = ss.i JOIN sv sj ON sj.d = ss.j
)""",
        "mm AS (SELECT max(abs(m)) AS mm FROM cm)",
        """mat0 AS (
  SELECT i, j, CAST(round(m * 1000000.0 / (SELECT mm FROM mm)) AS BIGINT) AS mv
  FROM cm
)""",
    ]
    for c in range(k):
        ctes.append(f"""v{c}_0 AS (
  SELECT d.d,
         CASE WHEN ('0x' || substr(md5('pca:{c}:' || d.d), 1, 15))::BIGINT % 2 = 0
              THEN 1000000 ELSE -1000000 END AS v
  FROM (SELECT unnest(generate_series(0, 63)) AS d) d
)""")
        for t in range(1, iters + 1):
            ctes.append(f"""ws{c}_{t} AS (
  SELECT m.i AS d, CAST(round(sum(m.mv * v.v) / 1000000.0) AS BIGINT) AS ws
  FROM mat{c} m JOIN v{c}_{t - 1} v ON v.d = m.j GROUP BY m.i
)""")
            ctes.append(
                f"n2{c}_{t} AS (SELECT sum(ws * ws) AS n2 FROM ws{c}_{t})"
            )
            ctes.append(f"""v{c}_{t} AS (
  SELECT d, CAST(round(ws * 1000000 /
                       sqrt(CAST((SELECT n2 FROM n2{c}_{t}) AS DOUBLE)))
            AS BIGINT) AS v
  FROM ws{c}_{t}
)""")
        ctes.append(f"""wf{c} AS (
  SELECT m.i AS d, CAST(round(sum(m.mv * v.v) / 1000000.0) AS BIGINT) AS ws
  FROM mat{c} m JOIN v{c}_{iters} v ON v.d = m.j GROUP BY m.i
)""")
        ctes.append(f"""lam{c} AS (
  SELECT (SELECT sum(v.v * w.ws) FROM v{c}_{iters} v JOIN wf{c} w USING (d))
         * 1000000.0
         / (SELECT sum(v * v) FROM v{c}_{iters}) AS lam
)""")
        ctes.append(f"""mat{c + 1} AS (
  SELECT m.i, m.j,
         m.mv - CAST(round((SELECT lam FROM lam{c}) * vi.v * vj.v
                           / 1000000000000.0) AS BIGINT) AS mv
  FROM mat{c} m
  JOIN v{c}_{iters} vi ON vi.d = m.i
  JOIN v{c}_{iters} vj ON vj.d = m.j
)""")
    comp_sel = "\nUNION ALL\n".join(
        f"SELECT {c} AS component, d, v, (SELECT lam FROM lam{c}) AS lam "
        f"FROM v{c}_{iters}"
        for c in range(k)
    )
    ctes.append(f"comp AS (\n{comp_sel}\n)")
    # AS MATERIALIZED: the deep mat{c} -> ws -> v chains reference each
    # other many times; DuckDB would otherwise inline them exponentially
    # (observed: thousands of parquet scans -> fd exhaustion). Each CTE
    # evaluates exactly once, like the Spark side.
    ctes = [cte.replace(" AS (", " AS MATERIALIZED (", 1) for cte in ctes]
    body = "WITH " + ",\n".join(ctes)
    if not project:
        return body + """
SELECT CAST(component AS INTEGER) AS component, CAST(d AS INTEGER) AS d,
       CAST(v AS BIGINT) AS v_u, round(lam, 6) AS lambda_q
FROM comp
"""
    return body + """
SELECT x.vec_id, CAST(c.component AS INTEGER) AS component,
       CAST(sum(x.xv * c.v) AS BIGINT) AS score_u
FROM xx x JOIN comp c ON c.d = x.d
GROUP BY x.vec_id, c.component
"""


def _rp_sql(distortion: bool = False) -> str:
    """JL projection replay: the +/-1 matrix from md5 parity over
    (seed, j, d), inputs quantized to BIGINT micro-units (the IVF
    idiom), projection = one integer sum per (vec_id, j). The
    distortion form restricts to the hash-sampled ids, rebuilds the
    projected lists, and compares exact pairwise squared distances."""
    od, idim = RP_GATE_OUT_DIM, RP_GATE_IN_DIM
    u, mod = RP_GATE_UNITS, RP_SAMPLE_MOD
    sample = (
        "\n  WHERE ('0x' || substr(md5('rpsample:' || vec_id), 1, 15))"
        f"::BIGINT % {mod} = 0"
        if distortion
        else ""
    )
    base = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {u}) AS BIGINT)) AS u
  FROM embeddings{sample}
),
s AS (
  SELECT j.j, d.d,
         CASE WHEN ('0x' || substr(md5('rp:' || j.j || ':' || d.d), 1, 15))::BIGINT % 2 = 0
              THEN 1 ELSE -1 END AS sgn
  FROM (SELECT unnest(generate_series(0, {od - 1})) AS j) j
  CROSS JOIN (SELECT unnest(generate_series(0, {idim - 1})) AS d) d
),
proj AS (
  SELECT x.vec_id, s.j, CAST(sum(s.sgn * x.xu) AS BIGINT) AS v_u
  FROM (SELECT vec_id, generate_subscripts(u, 1) - 1 AS d, unnest(u) AS xu
        FROM e) x
  JOIN s ON s.d = x.d
  GROUP BY x.vec_id, s.j
)"""
    if not distortion:
        return base + """
SELECT vec_id, CAST(j AS INTEGER) AS j, v_u FROM proj
"""
    return base + f""",
y AS (
  SELECT vec_id, list(v_u ORDER BY j) AS y FROM proj GROUP BY vec_id
),
sides AS (
  SELECT e.vec_id, e.u, y.y FROM e JOIN y USING (vec_id)
)
SELECT id_a, id_b, d2_orig_u, d2_proj_u,
       CASE WHEN d2_orig_u > 0
            THEN round(d2_proj_u / ({od} * d2_orig_u), 6)
       END AS rp_ratio
FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CAST({_int_d2_sql("a.u", "b.u")} AS BIGINT) AS d2_orig_u,
         CAST({_int_d2_sql("a.y", "b.y")} AS BIGINT) AS d2_proj_u
  FROM sides a JOIN sides b ON a.vec_id < b.vec_id
)
"""


def _semantic_dedup_sql(max_cell_size: int | None = None) -> str:
    """SemDeDup replay: the coarse integer-Lloyd chain (verbatim
    structure from ``_ivf_sql``) down to the final assignment, then the
    within-cell rounded-cosine pair test and the lowest-id-wins keep
    rule — mirrors ``similarity.semantic_dedup`` column-for-column.
    ``max_cell_size`` replays the megacell valve: oversized cells skip
    the pair test and flag ``cell_capped = 1``."""
    ctes = [
        f"""e AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {IVF_UNITS}) AS BIGINT)) AS u
  FROM embeddings
)""",
        f"""cent0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, u
  FROM e ORDER BY vec_id LIMIT {IVF_K}
)""",
    ]
    for it in range(IVF_ITERS + 1):
        ctes.append(f"""assign{it} AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cluster, {_int_d2_sql("e.u", "c.u")} AS d2
    FROM e CROSS JOIN cent{it} c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1
)""")
        if it < IVF_ITERS:
            ctes.append(f"""mean{it + 1} AS (
  SELECT cluster, list(m ORDER BY d) AS u FROM (
    SELECT cluster, d, CAST(round(sum(x) / count(*)) AS BIGINT) AS m
    FROM (
      SELECT a.cluster, generate_subscripts(e.u, 1) AS d, unnest(e.u) AS x
      FROM e JOIN assign{it} a ON a.vec_id = e.vec_id
    ) GROUP BY cluster, d
  ) GROUP BY cluster
)""")
            ctes.append(f"""cent{it + 1} AS (
  SELECT c.cluster, coalesce(m.u, c.u) AS u
  FROM cent{it} c LEFT JOIN mean{it + 1} m ON m.cluster = c.cluster
)""")
    final = IVF_ITERS
    ctes.append(f"""csize AS (
  SELECT cluster, count(*) AS csize FROM assign{final} GROUP BY cluster
)""")
    cap_pred = (
        f"\n    AND hi.csize <= {max_cell_size}"
        if max_cell_size is not None
        else ""
    )
    capped_expr = (
        f"CASE WHEN av.csize > {max_cell_size} THEN 1 ELSE 0 END"
        if max_cell_size is not None
        else "0"
    )
    ctes.append(f"""av AS (
  SELECT e.vec_id, e.vec, a.cluster, c.csize
  FROM e JOIN assign{final} a ON a.vec_id = e.vec_id
  JOIN csize c ON c.cluster = a.cluster
)""")
    ctes.append(f"""dup AS (
  SELECT hi.vec_id,
         count(*) AS n_sem_dups,
         sum(CASE WHEN lo.vec_id < hi.vec_id THEN 1 ELSE 0 END) AS n_lower
  FROM av hi JOIN av lo
    ON lo.cluster = hi.cluster AND lo.vec_id <> hi.vec_id{cap_pred}
  WHERE round(list_cosine_similarity(hi.vec, lo.vec), 6)
        >= {GATE_NEAR_DUP_COS}
  GROUP BY hi.vec_id
)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT av.vec_id,
       CAST(av.cluster AS INTEGER) AS cluster,
       CAST(coalesce(d.n_sem_dups, 0) AS BIGINT) AS n_sem_dups,
       CAST(CASE WHEN coalesce(d.n_lower, 0) = 0 THEN 1 ELSE 0 END
            AS INTEGER) AS keep,
       CAST({capped_expr} AS INTEGER) AS cell_capped
FROM av LEFT JOIN dup d ON d.vec_id = av.vec_id
"""
    )


def _pca_topk_sql(candidates: int = RP_TOPK_CANDIDATES) -> str:
    """Replay of the PCA two-stage retrieval (``q_sim_pca_topk``): the
    whole power-iteration build + corpus projection (``_pca_sql
    (project=True)``) nests as one MATERIALIZED subquery; its scalar
    (vec_id, component, score_u) rows fold to per-vector arrays, the
    candidate cut is exact integer L2 in that 4-int space, and the
    final ranking is the exact full-dimension re-rank over the raw
    micro-unit vectors — both tie-breaks mirrored."""
    k, u = SIM_K, PCA_GATE_UNITS
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    return f"""
WITH proj AS MATERIALIZED (
{_pca_sql(project=True)}
),
y AS MATERIALIZED (
  SELECT vec_id,
         list(CAST(floor(CAST(score_u AS DOUBLE) / 10000.0) AS BIGINT)
              ORDER BY component) AS y
  FROM proj GROUP BY vec_id
),
e2 AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {u}) AS BIGINT)) AS u
  FROM embeddings
),
cand AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, cy.vec_id,
           {_int_d2_sql("cy.y", "q.y")} AS d2c
    FROM y cy CROSS JOIN (SELECT * FROM y WHERE vec_id IN ({qids})) q
    WHERE cy.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY d2c, vec_id) <= {candidates}
)
SELECT query_id, vec_id, d2_u, CAST(rn AS INTEGER) AS rn FROM (
  SELECT cand.query_id, cand.vec_id,
         CAST({_int_d2_sql("ec.u", "eq.u")} AS BIGINT) AS d2_u,
         row_number() OVER (PARTITION BY cand.query_id
                            ORDER BY {_int_d2_sql("ec.u", "eq.u")},
                                     cand.vec_id) AS rn
  FROM cand
  JOIN e2 ec ON ec.vec_id = cand.vec_id
  JOIN e2 eq ON eq.vec_id = cand.query_id
) WHERE rn <= {k}
"""


def _phash_sql(final: str, grid: int = 4) -> str:
    """Analytic replay of :func:`multimodal.media_phash` over the
    synthetic payload generator (same formula text as the
    ``multimodal_decode`` oracle, frame 0 only): per doc, the
    ``grid x grid`` nearest-neighbor luminance cells
    (``gray = Σ_c (base + ((Y*h)//grid)*7 + ((X*w)//grid)*3 + c*11)
    % 256``), the strict integer mean compare ``gray·grid² > total``,
    and the bit fold into one BIGINT. ``final`` selects from the ``ph``
    (doc_id, phash) / ``dims`` (doc_id, w, h) CTEs — the three phash
    oracles share this chain verbatim."""
    g2 = grid * grid
    return f"""
WITH dims AS (
  SELECT doc_id, 4 + length(text) % 13 AS w, 4 + doc_id % 11 AS h,
         (doc_id % 256) * 31 AS base
  FROM documents
),
cells AS (
  SELECT d.doc_id,
         (y.i * {grid} + x.i) AS bit,
         ((d.base + ((y.i * d.h) // {grid}) * 7
                  + ((x.i * d.w) // {grid}) * 3) % 256)
       + ((d.base + ((y.i * d.h) // {grid}) * 7
                  + ((x.i * d.w) // {grid}) * 3 + 11) % 256)
       + ((d.base + ((y.i * d.h) // {grid}) * 7
                  + ((x.i * d.w) // {grid}) * 3 + 22) % 256) AS gray
  FROM dims d
  CROSS JOIN (SELECT unnest(generate_series(0, {grid - 1})) AS i) y
  CROSS JOIN (SELECT unnest(generate_series(0, {grid - 1})) AS i) x
),
ph AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN gray * {g2} > tot
                       THEN CAST(1 AS BIGINT) << bit ELSE 0 END)
              AS BIGINT) AS phash
  FROM (SELECT doc_id, bit, gray,
               sum(gray) OVER (PARTITION BY doc_id) AS tot
        FROM cells)
  GROUP BY doc_id
)
{final}
"""


_STOPWORD_LIST_SQL = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
_MARKER_VALUES_SQL = ", ".join(
    f"('{lang}', '{w}')" for lang, ws in LANG_MARKERS.items() for w in ws
)

EXTENSION_ORACLE_SQL: dict[str, str] = {
    "dedup_exact": """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
       count(*) AS dup_count
FROM documents GROUP BY md5(text)
""",
    "dedup_exact_apply": """
SELECT doc_id FROM (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
)
""",
    "dedup_minhash_lsh": _MINHASH_CTES + "SELECT doc_a, doc_b FROM cand",
    "dedup_minhash_capped": _MINHASH_CTES
    + f"""
, bsize AS (
  SELECT band, band_key, count(*) AS bs FROM bands GROUP BY band, band_key
),
bands_capped AS (
  SELECT bands.* FROM bands JOIN bsize USING (band, band_key)
  WHERE bs <= {GATE_LSH_BUCKET_CAP}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands_capped a
JOIN bands_capped b ON a.band = b.band AND a.band_key = b.band_key
WHERE a.doc_id < b.doc_id
""",
    "dedup_simhash": _SIMHASH_CTES + "SELECT doc_id, simhash FROM sh",
    # Candidate-then-verify fuzzy matching: exact Levenshtein over the LSH
    # candidate set (both engines' levenshtein = classic unit-cost edits).
    "dedup_fuzzy": _MINHASH_CTES
    + """
SELECT c.doc_a, c.doc_b,
       CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
FROM cand c
JOIN documents da ON da.doc_id = c.doc_a
JOIN documents db ON db.doc_id = c.doc_b
""",
    # Stratified deterministic sample: per-language keep rates over the
    # content-addressed md5 bucket (en 10%, und 50%, others 0).
    "text_stratified_sample": f"""
WITH markers(lang, word) AS (VALUES {_MARKER_VALUES_SQL}),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
hits AS (
  SELECT t.doc_id, m.lang, count(*) AS hits
  FROM tok t JOIN markers m ON t.word = m.word
  GROUP BY t.doc_id, m.lang
),
best AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang) AS rn
  FROM hits
),
lng AS (
  SELECT d.doc_id, coalesce(b.lang, 'und') AS pred_lang
  FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
),
b AS (
  SELECT doc_id, pred_lang,
         ('0x' || substr(md5('0:' || doc_id), 1, 15))::BIGINT % 100 AS bucket
  FROM lng
)
SELECT doc_id, pred_lang, bucket
FROM b
WHERE bucket < CASE pred_lang WHEN 'en' THEN 10 WHEN 'und' THEN 50 ELSE 0 END
""",
    # Corpus bigram LM with add-0.5 smoothing; per-bigram log10 rounded to
    # 6 before the mean (the `search` contract); V = distinct unigrams.
    "text_lm_score": """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
bigrams AS (
  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS bg,
         w[i] AS w1
  FROM (
    SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
    FROM words WHERE len(w) >= 2
  )
),
bg_n AS (
  SELECT bg, count(*) AS n_bg FROM bigrams GROUP BY bg
),
lead_n AS (
  SELECT w1, count(*) AS n_w1 FROM bigrams GROUP BY w1
),
vocab AS (
  SELECT count(DISTINCT word) AS v FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
  ) WHERE word <> ''
),
lp AS (
  SELECT b.doc_id,
         CAST(round(log10((bn.n_bg + 0.5) / (ln.n_w1 + 0.5 * vocab.v))
                    * 1000000) AS BIGINT) AS lp_u
  FROM bigrams b
  JOIN bg_n bn USING (bg)
  JOIN lead_n ln USING (w1)
  CROSS JOIN vocab
),
scored AS (
  SELECT doc_id, count(*) AS n_bigrams,
         round((sum(lp_u) / count(*)) / 1000000.0, 6) AS lm_score
  FROM lp GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       s.lm_score
FROM documents d LEFT JOIN scored s USING (doc_id)
""",
    # Okapi BM25 (k1=1.2, b=0.75): distinct query terms, per-term
    # contributions rounded to 6 before the sum (the `search` contract).
    "search_bm25": _CORE_CTES
    + """
, dl AS (
  SELECT doc_id, sum(n) AS dl FROM dwc GROUP BY doc_id
),
stats AS (
  SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl
),
qt AS (
  SELECT DISTINCT query_id, word FROM query_terms
),
contrib AS (
  SELECT qt.query_id, d.doc_id,
         round(ln((stats.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
             * (d.n * 2.2)
             / (d.n + 1.2 * (0.25 + 0.75 * l.dl / stats.avgdl)), 6) AS s
  FROM dwc d
  JOIN qt ON d.word = qt.word
  JOIN dfreq f ON d.word = f.word
  JOIN dl l ON d.doc_id = l.doc_id
  CROSS JOIN stats
)
SELECT query_id, doc_id, round(sum(s), 6) AS score
FROM contrib GROUP BY query_id, doc_id
""",
    # Full curation pipeline: every stage replayed in SQL over the same
    # corpus — quality + lang-id filters, exact dedup (min id per md5),
    # MinHash-LSH candidate pairs over the FILTERED corpus, 1-hop doc_b
    # drop, content-addressed split labels.
    "pipeline_curate": f"""
WITH q AS (
  SELECT doc_id,
         round(0.4 * least(len(string_split(text, ' ')) / 50.0, 1.0)
             + 0.3 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                      / length(text))
             + 0.3 * least((len(list_filter(string_split(text, ' '),
                                w -> list_contains([{_STOPWORD_LIST_SQL}], w)))
                            / len(string_split(text, ' '))) / 0.1, 1.0), 6)
           AS quality
  FROM documents
),
markers(lang, word) AS (VALUES {_MARKER_VALUES_SQL}),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
hits AS (
  SELECT t.doc_id, m.lang, count(*) AS hits
  FROM tok t JOIN markers m ON t.word = m.word
  GROUP BY t.doc_id, m.lang
),
best AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang) AS rn
  FROM hits
),
lng AS (
  SELECT d.doc_id, coalesce(b.lang, 'und') AS pred_lang
  FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
),
kept0 AS (
  SELECT d.doc_id, d.text, q.quality, lng.pred_lang
  FROM documents d JOIN q USING (doc_id) JOIN lng USING (doc_id)
  WHERE lng.pred_lang = 'en' AND q.quality >= 0.5
),
ex AS (
  SELECT min(doc_id) AS doc_id FROM kept0 GROUP BY md5(text)
),
kept1 AS (
  SELECT k.* FROM kept0 k JOIN ex USING (doc_id)
),
{_minhash_body_sql("kept1")},
kept2 AS (
  SELECT k.* FROM kept1 k
  WHERE NOT EXISTS (SELECT 1 FROM cand c WHERE c.doc_b = k.doc_id)
),
curated AS (
  SELECT doc_id, text, pred_lang, quality,
         CASE WHEN bucket < 90 THEN 'train'
              WHEN bucket < 95 THEN 'valid'
              ELSE 'test' END AS split
  FROM (
    SELECT *, ('0x' || substr(md5('0:' || doc_id), 1, 15))::BIGINT % 100 AS bucket
    FROM kept2
  )
)
SELECT doc_id, pred_lang, quality, split FROM curated
""",
    "dedup_simhash_pairs": _SIMHASH_CTES
    + """
, sb AS (
  SELECT doc_id, simhash, band, (simhash >> (band * 8)) & 255 AS band_val
  FROM sh CROSS JOIN generate_series(0, 3) t(band)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sb a JOIN sb b ON a.band = b.band AND a.band_val = b.band_val
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.simhash, b.simhash)) <= 3
""",
    "dedup_ngram_jaccard": _MINHASH_CTES
    + """
, sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM shingle GROUP BY doc_id
),
common AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN shingle sa ON sa.doc_id = c.doc_a
  JOIN shingle sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT c.doc_a, c.doc_b,
       CAST(coalesce(m.n_common, 0) AS BIGINT) AS n_common,
       CAST(za.n_sh AS BIGINT) AS n_a,
       CAST(zb.n_sh AS BIGINT) AS n_b,
       round(coalesce(m.n_common, 0) /
             (za.n_sh + zb.n_sh - coalesce(m.n_common, 0)), 6) AS jaccard
FROM cand c
LEFT JOIN common m ON m.doc_a = c.doc_a AND m.doc_b = c.doc_b
JOIN sizes za ON za.doc_id = c.doc_a
JOIN sizes zb ON zb.doc_id = c.doc_b
""",
    "dedup_embedding": _SIM_CTES
    + f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.vec, b.vec), 6) AS cos_sim
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.vec, b.vec), 6) >= {GATE_NEAR_DUP_COS}
""",
    "sim_topk_brute": _SIM_CTES
    + f"""
, q AS (
  SELECT vec_id AS query_id, vec AS q_vec FROM e
  WHERE vec_id IN ({", ".join(map(str, SIM_QUERY_IDS))})
),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(e.vec, q.q_vec), 6) AS cos_sim
  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, vec_id, cos_sim, rn FROM ranked WHERE rn <= {SIM_K}
""",
    "sim_topk_lsh": _SIM_CTES
    + f"""
, q AS (
  SELECT vec_id AS query_id, vec AS q_vec, bucket FROM e
  WHERE vec_id IN ({", ".join(map(str, SIM_QUERY_IDS))})
),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(e.vec, q.q_vec), 6) AS cos_sim
  FROM e JOIN q ON e.bucket = q.bucket WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, vec_id, cos_sim, rn FROM ranked WHERE rn <= {SIM_K}
""",
    "text_token_stats": """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+')) AS BIGINT) AS n_wordlike,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_digit_runs,
       CAST(length(text) AS BIGINT) AS n_chars,
       round(length(text) / len(string_split(text, ' ')), 6) AS mean_token_len
FROM documents
""",
    "text_quality": f"""
WITH x AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
                         w -> list_contains([{_STOPWORD_LIST_SQL}], w)))
           AS n_stop,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_chars,
         length(text) AS n_chars
  FROM documents
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_stop AS BIGINT) AS n_stopwords,
       round(n_stop / n_tokens, 6) AS stop_ratio,
       round(alpha_chars / n_chars, 6) AS alpha_ratio,
       round(0.4 * least(n_tokens / 50.0, 1.0)
           + 0.3 * (alpha_chars / n_chars)
           + 0.3 * least((n_stop / n_tokens) / 0.1, 1.0), 6) AS quality
FROM x
""",
    "text_lang_id": f"""
WITH markers(lang, word) AS (VALUES {_MARKER_VALUES_SQL}),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
hits AS (
  SELECT t.doc_id, m.lang, count(*) AS hits
  FROM tok t JOIN markers m ON t.word = m.word
  GROUP BY t.doc_id, m.lang
),
best AS (
  SELECT doc_id, lang, hits,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY hits DESC, lang) AS rn
  FROM hits
)
SELECT d.doc_id,
       coalesce(b.lang, 'und') AS pred_lang,
       CAST(coalesce(b.hits, 0) AS BIGINT) AS marker_hits
FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
""",
    "text_fingerprint": """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
shingle AS (
  SELECT doc_id, i AS pos, md5(array_to_string(w[i:i+2], ' ')) AS h
  FROM (
    SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
    FROM words WHERE len(w) >= 3
  )
),
fps AS (
  SELECT DISTINCT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM shingle
)
SELECT doc_id, count(*) AS n_fingerprints, min(fp) AS fp_min
FROM fps GROUP BY doc_id
""",
    "multimodal_decode": """
WITH d AS (
  SELECT doc_id, 4 + length(text) % 13 AS w,
         4 + doc_id % 11 AS h,
         1 + length(text) % 3 AS nf
  FROM documents
),
fr AS (SELECT doc_id, w, h, nf, unnest(range(nf)) AS f FROM d),
fy AS (SELECT doc_id, w, h, nf, f, unnest(range(h)) AS y FROM fr),
fyx AS (SELECT doc_id, w, h, nf, f, y, unnest(range(w)) AS x FROM fy),
v AS (
  SELECT doc_id, w, h, nf,
         ((doc_id % 256)*31 + f*17 + y*7 + x*3) % 256 AS r,
         ((doc_id % 256)*31 + f*17 + y*7 + x*3 + 11) % 256 AS g,
         ((doc_id % 256)*31 + f*17 + y*7 + x*3 + 22) % 256 AS b
  FROM fyx
)
SELECT doc_id,
       CAST(max(nf) * (9 + length(max(w)::VARCHAR) + length(max(h)::VARCHAR)
            + max(w)*max(h)*3) AS BIGINT) AS n_bytes,
       CAST(max(w) AS BIGINT) AS width,
       CAST(max(h) AS BIGINT) AS height,
       CAST(max(nf) AS BIGINT) AS n_frames,
       CAST(sum(r) AS BIGINT) AS sum_r,
       CAST(sum(g) AS BIGINT) AS sum_g,
       CAST(sum(b) AS BIGINT) AS sum_b
FROM v GROUP BY doc_id
""",
    "multimodal_phash": _phash_sql(
        "SELECT d.doc_id, CAST(d.w AS BIGINT) AS width,"
        " CAST(d.h AS BIGINT) AS height, p.phash"
        " FROM dims d JOIN ph p USING (doc_id)"
    ),
    "multimodal_phash_dedup": _phash_sql("""
SELECT doc_id, phash,
       CAST(CASE WHEN min(doc_id) OVER (PARTITION BY phash)
                   <> max(doc_id) OVER (PARTITION BY phash)
                 THEN 1 ELSE 0 END AS INTEGER) AS is_dup,
       CAST(CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY phash)
                 THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM ph"""),
    "multimodal_phash_pairs": _phash_sql("""
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM ph a JOIN ph b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.phash, b.phash)) <= 1"""),
    # the streaming twin drains the same ledger the batch groups yield
    "streaming_phash_dedup": _phash_sql("""
SELECT phash, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS keep_doc_id
FROM ph GROUP BY phash"""),
    # analytic replay of the WAV generator sawtooth (44-byte header +
    # 2 bytes per int16 sample; the engine side walks the RIFF chunks)
    "multimodal_audio_decode": """
WITH d AS (SELECT doc_id, length(text) AS L FROM documents),
a AS (
  SELECT doc_id, 4000 * (1 + L % 3) AS sr, 64 + doc_id % 101 AS n,
         (doc_id % 256) * 131 AS base
  FROM d
),
si AS (SELECT doc_id, sr, n, base, unnest(range(n)) AS i FROM a),
s AS (
  SELECT doc_id, sr, n, ((base + 17 * i) % 65536 - 32768) AS v FROM si
)
SELECT doc_id,
       CAST(44 + 2 * max(n) AS BIGINT) AS n_bytes,
       CAST(max(sr) AS BIGINT) AS sample_rate,
       CAST(max(n) AS BIGINT) AS n_samples,
       CAST(sum(v) AS BIGINT) AS sum_samples,
       CAST(sum(abs(v)) AS BIGINT) AS sum_abs
FROM s GROUP BY doc_id
""",
    "multimodal_audio_resample": """
WITH d AS (SELECT doc_id, length(text) AS L FROM documents),
a AS (
  SELECT doc_id, 4000 * (1 + L % 3) AS sr, 64 + doc_id % 101 AS n,
         (doc_id % 256) * 131 AS base
  FROM d
),
r AS (
  SELECT doc_id, sr, n, base,
         greatest(1, (n * 4000) // sr) AS out_n
  FROM a
),
ri AS (SELECT doc_id, sr, n, base, out_n, unnest(range(out_n)) AS i FROM r),
rv AS (
  SELECT doc_id, sr, n, out_n, i,
         ((base + 17 * ((i * n) // out_n)) % 65536 - 32768) AS v
  FROM ri
)
SELECT doc_id,
       CAST(max(sr) AS BIGINT) AS sample_rate,
       CAST(max(n) AS BIGINT) AS n_samples,
       CAST(4000 AS BIGINT) AS out_rate,
       CAST(max(out_n) AS BIGINT) AS out_samples,
       CAST(sum(v * (i + 1)) AS BIGINT) AS checksum
FROM rv GROUP BY doc_id
""",
    "rel_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    "rel_revenue_by_region": """
SELECT r.r_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       round(sum(o.o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, year(o.o_orderdate)
""",
    "rel_top_customers": """
WITH per_cust AS (
  SELECT n.n_name, c.c_custkey, c.c_name,
         round(sum(o.o_totalprice), 2) AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, c.c_custkey, c.c_name
),
ranked AS (
  SELECT n_name, c_custkey, c_name, revenue,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY revenue DESC, c_custkey) AS rnk
  FROM per_cust
)
SELECT n_name, c_custkey, c_name, revenue, rnk FROM ranked WHERE rnk <= 5
""",
    "rel_acctbal_rollup": """
SELECT coalesce(r.r_name, 'ALL') AS r_name,
       coalesce(n.n_name, 'ALL') AS n_name,
       round(sum(c.c_acctbal), 2) AS total_acctbal,
       count(*) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
    "events_tumbling": """
SELECT CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS epoch_hour,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS total_value
FROM events GROUP BY 1, 2
""",
    # Streaming twin: complete-mode drain of the whole stream = the same
    # group-by; value summed in integer micro-units (see q_streaming_tumbling).
    "streaming_tumbling": """
SELECT CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS epoch_hour,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS total_value_us
FROM events GROUP BY 1, 2
""",
    "events_sessionize": """
WITH x AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
s AS (
  SELECT user_id, ts_us, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM x
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(min(ts_us) // 1000000 AS BIGINT) AS session_start,
       count(*) AS n_events,
       round(sum(value), 6) AS total_value
FROM s GROUP BY user_id, session_id
""",
    # Streaming native session windows: gaps-and-islands with the SPLIT AT
    # >= GAP boundary (session_window merges only on strict overlap, so an
    # exact-1800s gap starts a new session — the batch twin keeps >);
    # micro-unit integer sums; micros basis like every event-time oracle.
    "streaming_session": """
WITH x AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                >= 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
s AS (
  SELECT user_id, ts_us, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM x
)
SELECT CAST(min(ts_us) // 1000000 AS BIGINT) AS session_start_s,
       user_id,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
         AS total_value_us
FROM s GROUP BY user_id, session_id
""",
    "events_json_props": """
SELECT event_type,
       count(json_extract_string(props, '$.k')) AS n_with_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS max_k
FROM events GROUP BY event_type
""",
    "asof_last_purchase": """
WITH p AS (
  SELECT user_id, epoch_us(ts) AS pts, max(value) AS pval
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, epoch_us(ts)
),
e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
)
SELECT e.event_id, e.user_id, e.ts_us, p.pval AS last_purchase_value
FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts_us >= p.pts
""",
    "rel_event_pivot": """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY user_id
""",
    "rel_region_year_cube": """
SELECT coalesce(r.r_name, 'ALL') AS r_name,
       CAST(coalesce(year(o.o_orderdate), -1) AS BIGINT) AS o_year,
       round(sum(o.o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY CUBE (r.r_name, year(o.o_orderdate))
""",
    "rel_customers_without_orders": """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND year(o.o_orderdate) = 1995)
""",
    "events_moving_avg": """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       round(avg(value) OVER w, 6) AS moving_avg,
       count(*) OVER w AS frame_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
    "rel_repeat_customers": """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
""",
    "rel_price_bands": """
WITH bands(band, lo, hi) AS (VALUES
  ('small', 0.0, 100000.0), ('medium', 100000.0, 250000.0),
  ('large', 250000.0, 600000.0))
SELECT band, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY band
""",
    "rel_order_calendar": """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
       CAST(month(o_orderdate) AS BIGINT) AS o_month,
       CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
       date_trunc('month', o_orderdate)::DATE AS month_start,
       CAST(datediff('day', DATE '1970-01-01', o_orderdate::DATE) AS BIGINT)
         AS epoch_days,
       string_split(o_orderpriority, '-')[1]::BIGINT AS prio_num,
       lower(string_split(o_orderpriority, '-')[2]) AS prio_word
FROM orders
""",
    "events_click_purchase": """
WITH c AS (
  SELECT user_id, count(*) AS n_clicks FROM events
  WHERE event_type = 'click' GROUP BY user_id
),
p AS (
  SELECT user_id, count(*) AS n_purchases, round(sum(value), 6) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT coalesce(c.user_id, p.user_id) AS user_id,
       CAST(coalesce(n_clicks, 0) AS BIGINT) AS n_clicks,
       CAST(coalesce(n_purchases, 0) AS BIGINT) AS n_purchases,
       coalesce(purchase_value, 0.0) AS purchase_value
FROM c FULL JOIN p ON c.user_id = p.user_id
""",
    "rel_lapsed_customers": """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
""",
    "text_ngram_freq": """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT array_to_string(w[i:i+1], ' ') AS ngram
  FROM (
    SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
    FROM words WHERE len(w) >= 2
  )
)
SELECT ngram, count(*) AS n FROM grams
GROUP BY ngram ORDER BY n DESC, ngram LIMIT 100
""",
    "dedup_near_canonical": _MINHASH_CTES
    + """
SELECT d.doc_id, coalesce(min(c.doc_a), d.doc_id) AS canonical_id
FROM documents d LEFT JOIN cand c ON c.doc_b = d.doc_id
GROUP BY d.doc_id
""",
    # histogram over the 1-hop canonicalization above
    "dedup_cluster_sizes": _MINHASH_CTES
    + """
, canon AS (
  SELECT d.doc_id, coalesce(min(c.doc_a), d.doc_id) AS canonical_id
  FROM documents d LEFT JOIN cand c ON c.doc_b = d.doc_id
  GROUP BY d.doc_id
),
sizes AS (
  SELECT canonical_id, CAST(count(*) AS BIGINT) AS cluster_size
  FROM canon GROUP BY 1
)
SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(cluster_size) AS BIGINT) AS n_docs
FROM sizes GROUP BY 1
""",
    # transitive closure as a recursive CTE: reach(d, r) = r reachable from
    # d over the undirected candidate graph; canonical = min reachable.
    # UNION (not UNION ALL) dedups per iteration, guaranteeing termination.
    "dedup_components": _MINHASH_CTES.replace("WITH words", "WITH RECURSIVE words")
    + """
, edges AS (
  SELECT doc_a AS u, doc_b AS v FROM cand
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM cand
),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id AS r FROM documents
  UNION
  SELECT reach.doc_id, e.v AS r FROM reach JOIN edges e ON reach.r = e.u
)
SELECT doc_id, min(r) AS canonical_id FROM reach GROUP BY doc_id
""",
    "rel_grouping_sets": """
SELECT coalesce(r_name, 'ALL') AS r_name,
       coalesce(c_mktsegment, 'ALL') AS c_mktsegment,
       round(sum(c_acctbal), 2) AS total_acctbal,
       count(*) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY GROUPING SETS ((r_name), (c_mktsegment), (r_name, c_mktsegment))
""",
    "rel_order_gaps": """
SELECT o_custkey, o_orderkey,
       row_number() OVER w AS order_seq,
       epoch(o_orderdate)::BIGINT - lag(epoch(o_orderdate)::BIGINT) OVER w AS gap_s,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS UNBOUNDED PRECEDING), 2) AS running_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    "rel_acctbal_ntiles": """
WITH t AS (
  SELECT n_name, c_acctbal,
         ntile(4) OVER (PARTITION BY n_name ORDER BY c_acctbal, c_custkey) AS quartile
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT n_name, quartile, count(*) AS n_customers,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal
FROM t GROUP BY n_name, quartile
""",
    "rel_percentiles": """
SELECT l_returnflag, count(*) AS n_items,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS price_p50,
       round(quantile_cont(l_extendedprice, 0.9), 6) AS price_p90
FROM lineitem GROUP BY l_returnflag
""",
    "events_hopping": """
WITH h AS (
  SELECT unnest([epoch_ns(ts) // 1800000000000,
                 epoch_ns(ts) // 1800000000000 - 1]) AS hop_id,
         event_type, value
  FROM events
)
SELECT hop_id * 1800 AS window_start_s, event_type,
       count(*) AS n_events, round(sum(value), 6) AS total_value
FROM h GROUP BY hop_id, event_type
""",
    "rel_parts_with_shipments": """
SELECT p_partkey, p_brand, p_type FROM part p
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey AND year(l_shipdate) = 1995
)
""",
    "asof_last_purchase_30d": """
WITH p AS (
  SELECT user_id, epoch_us(ts) AS pts, max(value) AS pval
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, epoch_us(ts)
),
e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
)
SELECT e.event_id, e.user_id, e.ts_us,
       CASE WHEN p.pts >= e.ts_us - 2592000000000
            THEN p.pval END AS recent_purchase_value
FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts_us >= p.pts
""",
    "streaming_incremental_df": """
SELECT word, count(DISTINCT doc_id) AS df FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
) WHERE word <> '' GROUP BY word
""",
    "multimodal_resize": """
WITH d AS (
  SELECT doc_id,
         4 + length(text) % 13 AS w,
         4 + doc_id % 11 AS h,
         least(4 + length(text) % 13, 8) AS ow,
         least(4 + doc_id % 11, 8) AS oh
  FROM documents
),
oy AS (SELECT doc_id, w, h, ow, oh, unnest(range(oh)) AS yo FROM d),
ox AS (SELECT doc_id, w, h, ow, oh, yo, unnest(range(ow)) AS xo FROM oy),
px AS (
  SELECT doc_id, w, h, ow, oh,
         (yo * h) // oh AS ys, (xo * w) // ow AS xs,
         (yo * ow + xo) * 3 AS ob
  FROM ox
),
v AS (
  SELECT doc_id, w, h, ow, oh,
         (((doc_id % 256)*31 + ys*7 + xs*3) % 256) * (ob + 1)
       + (((doc_id % 256)*31 + ys*7 + xs*3 + 11) % 256) * (ob + 2)
       + (((doc_id % 256)*31 + ys*7 + xs*3 + 22) % 256) * (ob + 3) AS contrib
  FROM px
)
SELECT doc_id,
       CAST(max(w) AS BIGINT) AS width,
       CAST(max(h) AS BIGINT) AS height,
       CAST(max(ow) AS BIGINT) AS out_width,
       CAST(max(oh) AS BIGINT) AS out_height,
       CAST(sum(contrib) AS BIGINT) AS checksum
FROM v GROUP BY doc_id
""",
    "multimodal_frames": """
WITH d AS (
  SELECT doc_id,
         4 + length(text) % 13 AS w,
         4 + doc_id % 11 AS h,
         1 + length(text) % 3 AS nf
  FROM documents
),
fidx AS (
  SELECT DISTINCT doc_id, w, h, (k.k * nf) // 3 AS frame_idx
  FROM d CROSS JOIN (SELECT unnest([0, 1, 2]) AS k) k
),
fy AS (SELECT doc_id, w, h, frame_idx, unnest(range(h)) AS y FROM fidx),
fyx AS (SELECT doc_id, w, h, frame_idx, y, unnest(range(w)) AS x FROM fy),
v AS (
  SELECT doc_id, frame_idx,
         ((y*w + x)*3 + 1) * (((doc_id % 256)*31 + frame_idx*17 + y*7 + x*3) % 256)
       + ((y*w + x)*3 + 2) * (((doc_id % 256)*31 + frame_idx*17 + y*7 + x*3 + 11) % 256)
       + ((y*w + x)*3 + 3) * (((doc_id % 256)*31 + frame_idx*17 + y*7 + x*3 + 22) % 256)
         AS contrib
  FROM fyx
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(sum(contrib) AS BIGINT) AS frame_checksum
FROM v GROUP BY doc_id, frame_idx
""",
    "doc_frequency_salted": """
SELECT word, count(DISTINCT doc_id) AS df FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
) WHERE word <> '' GROUP BY word
""",
    "sql_tfidf_top100": """
WITH tokens AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
  ) WHERE word <> ''
),
dwc AS (SELECT word, doc_id, count(*) AS n FROM tokens GROUP BY word, doc_id),
dfreq AS (SELECT word, count(*) AS df FROM dwc GROUP BY word),
ndocs AS (SELECT count(*) AS num_docs FROM documents)
SELECT word, doc_id,
       round((1.0 + log10(n)) * log10(1.0 + floor(num_docs / df)), 6) AS tfidf
FROM dwc JOIN dfreq USING (word) CROSS JOIN ndocs
ORDER BY tfidf DESC, word, doc_id
LIMIT 100
""",
    "events_time_rollup": """
SELECT coalesce(epoch_day, -1) AS epoch_day,
       coalesce(epoch_hour, -1) AS epoch_hour,
       count(*) AS n_events,
       round(sum(value), 6) AS total_value
FROM (
  SELECT CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS epoch_day,
         CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS epoch_hour,
         value
  FROM events
)
GROUP BY ROLLUP (epoch_day, epoch_hour)
""",
    "streaming_stateful_totals": """
SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS total_value
FROM events GROUP BY user_id
""",
    "streaming_incremental_dedup": _MINHASH_CTES + "SELECT doc_a, doc_b FROM cand",
    # idf maintained incrementally == idf computed at rest, so the oracle
    # is the batch search oracle verbatim
    "streaming_search": _CORE_CTES
    + "SELECT query_id, doc_id, score FROM search_rel",
    "sim_topk_ivf": _ivf_sql(),
    "sim_topk_ivf_bulk": _ivf_sql(query_where="TRUE"),
    # sample-trained build: seed + Lloyd stats restricted to the
    # deterministic ~2/3 subset, final assignment + search over the
    # full corpus (mirrors ivf_build(train=...))
    "sim_topk_ivf_sample": _ivf_sql(
        train_where=f"vec_id % {IVF_TRAIN_MOD} <> {IVF_TRAIN_MOD - 1}"
    ),
    "sim_topk_pq": _pq_sql(),
    "sim_topk_ivfpq": _ivfpq_sql(),
    "sim_topk_ivfpq_res": _ivfpq_sql(residual=True),
    # bulk compressed kNN graph: the residual chain over EVERY corpus
    # vector as query, ADC candidate cut at IVFPQ_BULK_CAND, exact
    # full-dim integer-L2 re-rank to SIM_K (mirrors ivfpq_bulk_topk's
    # two stages including both tie-breaks)
    "sim_topk_ivfpq_bulk": _ivfpq_sql(
        residual=True,
        query_where="TRUE",
        k_out=IVFPQ_BULK_CAND,
        rerank_k=SIM_K,
    ),
    "sim_recall_audit": _recall_audit_sql(),
    "sim_recall_curve": _recall_curve_sql(),
    "dedup_semantic": _semantic_dedup_sql(),
    "dedup_semantic_capped": _semantic_dedup_sql(GATE_SEM_CELL_CAP),
    "text_bpe_vocab": _bpe_vocab_sql(BPE_GATE_MERGES),
    "text_bpe_tokens": _bpe_tokens_sql(BPE_GATE_MERGES),
    "text_bpe_tokens_holdout": _bpe_tokens_sql(
        BPE_GATE_MERGES,
        train_where=(
            "WHERE ('0x' || substr(md5('bpeho:' || doc_id), 1, 15))"
            "::BIGINT % 2 = 0"
        ),
        score_where=(
            "WHERE ('0x' || substr(md5('bpeho:' || doc_id), 1, 15))"
            "::BIGINT % 2 = 1"
        ),
    ),
    "text_pack_bpe": _pack_bpe_sql(),
    "text_mixture_bpe": _mixture_bpe_sql(),
    "text_dsir": _dsir_sql(),
    "streaming_dsir": _dsir_sql(),
    "text_dsir_select": _dsir_sql(select_top=100),
    "sim_rp_project": _rp_sql(),
    "sim_rp_distortion": _rp_sql(distortion=True),
    "sim_rp_topk": _rp_topk_sql(),
    "sim_topk_rp_ivfpq": _rp_ivfpq_sql(),
    "sim_rp_ivfpq_recall": _rp_ivfpq_recall_sql(),
    "sim_rp_recall": _rp_recall_sql(),
    "sim_pca_components": _pca_sql(),
    "sim_pca_project": _pca_sql(project=True),
    "sim_pca_topk": _pca_topk_sql(),
    "text_bpe_pairs": """
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
wc AS (
  SELECT word, count(*) AS n FROM w WHERE word <> '' GROUP BY word
),
ch AS (
  SELECT word, n, string_split(word, '') AS cs FROM wc
  WHERE length(word) >= 2
),
idx AS (
  SELECT n, cs, unnest(range(1, len(cs))) AS i FROM ch
)
SELECT cs[i] AS left_sym, cs[i + 1] AS right_sym,
       CAST(sum(n) AS BIGINT) AS pair_count
FROM idx GROUP BY 1, 2
ORDER BY pair_count DESC, left_sym, right_sym
LIMIT 100
""",
    # Envelope oracles: exact values recomputed independently; the
    # in-bounds flags are asserted literally — the Spark side must deliver
    # sketch/BLAS results inside their error contracts to hash-match.
    "rel_approx_distinct_bounds": """
SELECT l_returnflag,
       count(*) AS n_items,
       count(DISTINCT l_partkey) AS exact_parts,
       CAST(1 AS BIGINT) AS hll_ok,
       CAST(1 AS BIGINT) AS p50_ok,
       CAST(1 AS BIGINT) AS p95_ok,
       CAST(1 AS BIGINT) AS p99_ok
FROM lineitem GROUP BY l_returnflag
""",
    "sim_topk_pandas_bounds": _SIM_CTES
    + f"""
, q AS (
  SELECT vec_id AS query_id, vec AS q_vec FROM e
  WHERE vec_id IN ({", ".join(map(str, SIM_QUERY_IDS))})
),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(e.vec, q.q_vec), 6) AS cos_sim
  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, vec_id, cos_sim, rn, CAST(1 AS BIGINT) AS blas_ok
FROM ranked WHERE rn <= {SIM_K}
""",
    "text_hash_sample": """
WITH b AS (
  SELECT doc_id,
         ('0x' || substr(md5('0:' || doc_id), 1, 15))::BIGINT % 100 AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'valid'
            ELSE 'test' END AS split
FROM b WHERE bucket < 10
""",
    "sim_quantize_int8": """
WITH s AS (
  SELECT vec_id, embedding,
         len(embedding) AS dim,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
           AS scale
  FROM embeddings
),
q AS (
  SELECT vec_id, dim, scale,
         CASE WHEN scale > 0
              THEN list_transform(embedding,
                     x -> CAST(round(CAST(x AS DOUBLE) / scale) AS BIGINT))
              ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS qvec
  FROM s
)
SELECT vec_id, CAST(dim AS BIGINT) AS dim, round(scale, 6) AS scale,
       CAST(list_sum(qvec) AS BIGINT) AS qsum,
       CAST(list_max(qvec) AS BIGINT) AS qmax
FROM q
""",
    "rel_market_share": """
WITH per_nation AS (
  SELECT r.r_name, n.n_name,
         CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         sum(o.o_totalprice) AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name, year(o.o_orderdate)
)
SELECT r_name, n_name, o_year,
       round(revenue, 2) AS revenue,
       round(revenue / sum(revenue) OVER (PARTITION BY r_name, o_year), 6)
         AS share
FROM per_nation
""",
    "rel_status_priority": """
SELECT o.o_orderstatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1994-01-01'
  AND l.l_shipdate < TIMESTAMP '1996-01-01'
GROUP BY o.o_orderstatus
""",
    "rel_returned_top": """
SELECT c.c_custkey, c.c_name, n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS lost_revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY lost_revenue DESC, c.c_custkey
LIMIT 20
""",
    "events_range_frame": """
WITH e AS (
  SELECT event_id, user_id, value,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_s
  FROM events
)
SELECT event_id, user_id, ts_s,
       round(sum(value) OVER w, 6) AS trailing_sum,
       count(*) OVER w AS trailing_n
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
""",
    "events_user_extremes": """
WITH rk AS (
  SELECT user_id, event_type, value, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id DESC) AS rmax,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value ASC, event_id ASC) AS rmin
  FROM events
)
SELECT user_id,
       max(CASE WHEN rmax = 1 THEN event_type END) AS top_event_type,
       max(CASE WHEN rmin = 1 THEN event_type END) AS bottom_event_type,
       round(max(value), 6) AS max_value,
       round(min(value), 6) AS min_value,
       count(*) AS n_events
FROM rk GROUP BY user_id
""",
    "rel_orders_above_avg": """
WITH a AS (
  SELECT o_custkey, avg(o_totalprice) AS cust_avg FROM orders GROUP BY o_custkey
)
SELECT o.o_custkey, o.o_orderkey,
       round(o.o_totalprice, 2) AS o_totalprice,
       round(a.cust_avg, 6) AS cust_avg
FROM orders o JOIN a ON o.o_custkey = a.o_custkey
WHERE o.o_totalprice > a.cust_avg
""",
    "asof_next_event": """
WITH r AS (
  SELECT user_id, epoch_us(ts) AS ets_us, min(event_id) AS next_event_id
  FROM events GROUP BY user_id, epoch_us(ts)
)
SELECT o.o_orderkey, o.o_custkey AS user_id,
       CAST(arg_min(r.next_event_id, r.ets_us) AS BIGINT) AS next_event_id
FROM orders o
LEFT JOIN r ON r.user_id = o.o_custkey
           AND r.ets_us >= epoch_us(o.o_orderdate::TIMESTAMP)
GROUP BY o.o_orderkey, o.o_custkey
""",
    "text_cooccurrence": """
WITH toks AS (
  SELECT DISTINCT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE w <> ''
)
SELECT a.w AS w1, b.w AS w2, count(*) AS n
FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.w < b.w
GROUP BY a.w, b.w
ORDER BY n DESC, w1, w2
LIMIT 100
""",
    # Capped variant: keep each doc's first GATE_COOC_VOCAB_CAP (25)
    # distinct tokens in DOCUMENT order (Spark: slice on array_distinct,
    # which preserves first-occurrence order; here: rank by first index)
    "text_cooccurrence_capped": """
WITH tok AS (
  SELECT doc_id, w, i FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w,
           generate_subscripts(
             list_filter(string_split(text, ' '), x -> x <> ''), 1) AS i
    FROM documents
  )
),
firsts AS (
  SELECT doc_id, w, min(i) AS first_i FROM tok GROUP BY 1, 2
),
capped AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, w,
           row_number() OVER (PARTITION BY doc_id ORDER BY first_i) AS rn
    FROM firsts
  ) WHERE rn <= 25
)
SELECT a.w AS w1, b.w AS w2, count(*) AS n
FROM capped a JOIN capped b ON a.doc_id = b.doc_id AND a.w < b.w
GROUP BY a.w, b.w
ORDER BY n DESC, w1, w2
LIMIT 100
""",
    "events_interval_join": """
WITH c AS (
  SELECT event_id AS click_id, user_id,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS click_s
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT event_id AS purchase_id, user_id,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS purchase_s, value
  FROM events WHERE event_type = 'purchase'
)
SELECT c.click_id, p.purchase_id, c.user_id,
       CAST(p.purchase_s - c.click_s AS BIGINT) AS lag_s,
       round(p.value, 6) AS purchase_value
FROM c JOIN p ON c.user_id = p.user_id
             AND p.purchase_s >= c.click_s
             AND p.purchase_s <= c.click_s + 1800
""",
    # Streaming twin emits exactly the batch pair set (whole-second band
    # on both sides by construction; inner-join pairs emitted once each).
    "streaming_interval_join": """
WITH c AS (
  SELECT event_id AS click_id, user_id,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS click_s
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT event_id AS purchase_id, user_id,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS purchase_s, value
  FROM events WHERE event_type = 'purchase'
)
SELECT c.click_id, p.purchase_id, c.user_id,
       CAST(p.purchase_s - c.click_s AS BIGINT) AS lag_s,
       round(p.value, 6) AS purchase_value
FROM c JOIN p ON c.user_id = p.user_id
             AND p.purchase_s >= c.click_s
             AND p.purchase_s <= c.click_s + 1800
""",
    "doc_similarity_tfidf": _CORE_CTES + """
, norms AS (
  SELECT doc_id, sqrt(sum(tfidf * tfidf)) AS nrm
  FROM tfidf_rel GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         sum(a.tfidf * b.tfidf) AS dot
  FROM tfidf_rel a JOIN tfidf_rel b
    ON a.word = b.word AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT d.doc_a, d.doc_b,
       round(d.dot / (na.nrm * nb.nrm), 6) AS cos_sim
FROM dots d
JOIN norms na ON d.doc_a = na.doc_id
JOIN norms nb ON d.doc_b = nb.doc_id
ORDER BY cos_sim DESC, d.doc_a, d.doc_b
LIMIT 100
""",
    "text_contamination": """
WITH cand AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM (
    SELECT doc_id, string_split(text, ' ') AS w,
           unnest(generate_series(1, len(string_split(text, ' ')) - 2)) AS i
    FROM documents
    WHERE doc_id % 10 != 0 AND len(string_split(text, ' ')) >= 3
  )
),
bench AS (
  SELECT DISTINCT array_to_string(w[i:i+2], ' ') AS shingle
  FROM (
    SELECT string_split(text, ' ') AS w,
           unnest(generate_series(1, len(string_split(text, ' ')) - 2)) AS i
    FROM documents
    WHERE doc_id % 10 = 0 AND len(string_split(text, ' ')) >= 3
  )
)
SELECT c.doc_id,
       count(*) AS n_shingles,
       CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       round(CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS overlap_ratio
FROM cand c LEFT JOIN bench b ON c.shingle = b.shingle
GROUP BY c.doc_id
""",
    "text_chunk": """
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
  FROM documents
),
starts AS (
  SELECT doc_id, words,
         generate_subscripts(generate_series(1, len(words), 32), 1) AS chunk_id,
         unnest(generate_series(1, len(words), 32)) AS s
  FROM w WHERE len(words) > 0
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(len(words[s:s+31]) AS BIGINT) AS n_tokens,
       array_to_string(words[s:s+31], ' ') AS chunk_text
FROM starts
""",
    # Repetition: duplicate-word / duplicate-k-gram ratios; the <k-word
    # LEFT-JOIN null mirrors the Spark-side WHEN guard
    "text_repetition": """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, count(*) AS n_grams,
         count(DISTINCT g) AS n_distinct_grams
  FROM (
    SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g
    FROM (
      SELECT doc_id, string_split(text, ' ') AS w,
             unnest(generate_series(1, len(string_split(text, ' ')) - 2)) AS i
      FROM documents WHERE len(string_split(text, ' ')) >= 3
    )
  ) GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.t) AS BIGINT) AS n_words,
       CAST(len(list_distinct(t.t)) AS BIGINT) AS n_distinct_words,
       CASE WHEN len(t.t) > 0
            THEN round(1.0 - len(list_distinct(t.t)) / len(t.t), 6)
       END AS word_dup_ratio,
       CAST(coalesce(g.n_grams, 0) AS BIGINT) AS n_grams,
       CASE WHEN g.n_grams IS NOT NULL
            THEN round(1.0 - g.n_distinct_grams / g.n_grams, 6)
       END AS gram_dup_ratio
FROM toks t LEFT JOIN grams g ON g.doc_id = t.doc_id
""",
    "text_pii_redact": r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(text,
         '\d{3}[-.]\d{3,4}[-.]\d{4}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '\d{3}[-.]\d{3,4}[-.]\d{4}', '<PHONE>', 'g')) AS clean_md5
FROM documents
""",
    # Span-granularity exact dedup: 5-word stride-5 spans, dup = exact
    # span text in ≥2 distinct docs (join on md5 like the Spark side)
    "dedup_span_exact": """
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
  FROM documents
),
sp AS (
  SELECT doc_id,
         generate_subscripts(generate_series(1, len(words), 5), 1) AS chunk_idx,
         unnest(generate_series(1, len(words), 5)) AS s, words
  FROM w WHERE len(words) > 0
),
spans AS (
  SELECT doc_id, chunk_idx, array_to_string(words[s:s+4], ' ') AS span FROM sp
),
dup AS (
  SELECT md5(span) AS h FROM spans GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
),
kept AS (
  SELECT s.doc_id, s.chunk_idx, s.span
  FROM spans s LEFT JOIN dup d ON md5(s.span) = d.h
  WHERE d.h IS NULL
),
re AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(span, ' ' ORDER BY chunk_idx) AS clean_text
  FROM kept GROUP BY 1
),
ns AS (SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY 1)
SELECT w.doc_id,
       CAST(coalesce(ns.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(ns.n_spans, 0) - coalesce(re.n_kept, 0) AS BIGINT)
         AS n_dup_spans,
       coalesce(re.clean_text, '') AS clean_text
FROM w LEFT JOIN ns ON ns.doc_id = w.doc_id
LEFT JOIN re ON re.doc_id = w.doc_id
""",
    # Sliding 5-word spans every 2 words (full width; short docs = one
    # short span); a WORD drops iff any duplicated span covers it
    "dedup_span_sliding": """
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
  FROM documents
),
sp AS (
  SELECT doc_id,
         unnest(generate_series(1, greatest(len(words) - 4, 1), 2)) AS s,
         words
  FROM w WHERE len(words) > 0
),
spans AS (
  SELECT doc_id, s, array_to_string(words[s:s+4], ' ') AS span FROM sp
),
dup AS (
  SELECT md5(span) AS h FROM spans GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
),
tagged AS (
  SELECT sx.doc_id, sx.s,
         CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END AS is_dup
  FROM spans sx LEFT JOIN dup d ON md5(sx.span) = d.h
),
cnt AS (
  SELECT doc_id, count(*) AS n_spans, sum(is_dup) AS n_dup_spans
  FROM tagged GROUP BY 1
),
wp AS (
  SELECT doc_id, unnest(words) AS word, generate_subscripts(words, 1) AS i
  FROM w WHERE len(words) > 0
),
keepw AS (
  SELECT wp.doc_id, wp.i, wp.word
  FROM wp
  WHERE NOT EXISTS (
    SELECT 1 FROM tagged t
    WHERE t.doc_id = wp.doc_id AND t.is_dup = 1
      AND t.s <= wp.i AND wp.i <= t.s + 4
  )
),
re AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY i) AS clean_text
  FROM keepw GROUP BY 1
)
SELECT w.doc_id,
       CAST(coalesce(cnt.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(cnt.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       coalesce(re.clean_text, '') AS clean_text
FROM w LEFT JOIN cnt ON cnt.doc_id = w.doc_id
LEFT JOIN re ON re.doc_id = w.doc_id
""",
    # C4/Gopher-style quality rules; thresholds mirror
    # text.c4_quality_filters defaults; flags cast to INT on both sides.
    # Zero-word docs emit a keep=0 verdict row (NULL ratios, flags 0) —
    # coalesce mirrors the Spark side's NULL-comparison guard.
    "text_c4_filters": """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
),
s AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
         CASE WHEN len(w) > 0 THEN
           round(CAST(len(array_to_string(w, '')) AS DOUBLE) / len(w), 6)
         END AS mean_word_len,
         CASE WHEN len(w) > 0 THEN
           round(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6)
         END AS word_dup_ratio,
         CASE WHEN len(w) > 0 THEN
           round(CAST(len(list_filter(w, x -> x IN
             ('the','a','an','of','and','or','is','to','in','it')))
             AS DOUBLE) / len(w), 6)
         END AS stop_ratio
  FROM t
)
SELECT doc_id, n_words, mean_word_len, word_dup_ratio, stop_ratio,
       CAST(n_words BETWEEN 20 AND 80 AS INTEGER) AS pass_len,
       CAST(coalesce(mean_word_len BETWEEN 3.0 AND 10.0, false)
            AS INTEGER) AS pass_word_len,
       CAST(coalesce(word_dup_ratio <= 0.55, false) AS INTEGER) AS pass_dup,
       CAST(coalesce(stop_ratio >= 0.02, false) AS INTEGER) AS pass_stop,
       CAST(n_words BETWEEN 20 AND 80
            AND coalesce(mean_word_len BETWEEN 3.0 AND 10.0, false)
            AND coalesce(word_dup_ratio <= 0.55, false)
            AND coalesce(stop_ratio >= 0.02, false) AS INTEGER) AS keep
FROM s
""",
    # Mixture accounting: per-(source, lang) token share + uniform-target
    # resampling weight; single-row totals joined back (exact BIGINTs,
    # one IEEE division + round each — engine-identical)
    "text_mixture_weights": """
WITH g AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1, 2
),
tot AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS tt,
         CAST(count(*) AS BIGINT) AS ng
  FROM g
)
SELECT source, lang, n_docs, n_tokens,
       round(CAST(n_tokens AS DOUBLE) / tt, 6) AS token_share,
       round(CAST(tt AS DOUBLE) / (ng * n_tokens), 6) AS uniform_weight
FROM g, tot
""",
    "text_mixture_temperature": f"""
WITH g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
s AS (
  SELECT source, n_docs, n_tokens,
         CAST(round(pow(n_tokens, {MIX_TAU}) * 1000000) AS BIGINT) AS pt_u
  FROM g
),
t AS (SELECT *, CAST(sum(pt_u) OVER () AS BIGINT) AS tot_u FROM s)
SELECT source, n_docs, n_tokens,
       round(CAST(pt_u AS DOUBLE) / tot_u, 6) AS temp_share,
       CAST(CASE WHEN n_tokens > 0 THEN least(100, greatest(0,
            floor(100.0 * {MIX_BUDGET_TOKENS}
                  * round(CAST(pt_u AS DOUBLE) / tot_u, 6) / n_tokens)))
            ELSE 0 END AS INTEGER) AS rate_pct
FROM t
""",
    "text_mixture_sample": f"""
WITH g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
s AS (
  SELECT source, n_tokens,
         CAST(round(pow(n_tokens, {MIX_TAU}) * 1000000) AS BIGINT) AS pt_u
  FROM g
),
t AS (SELECT *, CAST(sum(pt_u) OVER () AS BIGINT) AS tot_u FROM s),
r AS (
  SELECT source,
         CAST(CASE WHEN n_tokens > 0 THEN least(100, greatest(0,
              floor(100.0 * {MIX_BUDGET_TOKENS}
                    * round(CAST(pt_u AS DOUBLE) / tot_u, 6) / n_tokens)))
              ELSE 0 END AS INTEGER) AS rate_pct
  FROM t
)
SELECT d.doc_id, d.source, d.lang
FROM documents d JOIN r ON r.source = d.source
WHERE ('0x' || substr(md5('0:' || d.doc_id), 1, 15))::BIGINT % 100
      < r.rate_pct
""",
    # Concat-then-chunk sequence packing: 8 shards by md5 hash of doc_id
    # (hash_bucket_col — id-type-agnostic, mirrors the Spark operator),
    # running token count before each doc, pack = cum_before DIV 512 —
    # all integer arithmetic, bit-stable
    "text_pack_sequences": """
WITH t AS (
  SELECT doc_id,
         ('0x' || substr(md5('0:' || doc_id), 1, 15))::BIGINT % 8 AS bucket,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, bucket, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY bucket ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM t
)
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
       CAST(cum_before // 512 AS BIGINT) AS pack_id,
       n_tokens,
       CAST(cum_before % 512 AS BIGINT) AS offset_in_pack
FROM c
""",
    # Nearest-centroid confusion: integer micro-unit per-label centroids
    # (exact BIGINT sums, round(sum/n) = one IEEE division + one
    # half-away round — engine-identical), argmin by exact integer L2
    # with ties to the lowest label (mirrors array_position first-min)
    "sim_label_centroids": """
WITH u AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS d,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
           AS x
  FROM embeddings
),
cents AS (
  SELECT label AS clabel, d, CAST(round(sum(x) / count(*)) AS BIGINT) AS m
  FROM u GROUP BY 1, 2
),
dists AS (
  SELECT u.vec_id, u.label, c.clabel,
         sum((u.x - c.m) * (u.x - c.m)) AS d2
  FROM u JOIN cents c ON u.d = c.d
  GROUP BY 1, 2, 3
),
best AS (
  SELECT vec_id, label, clabel,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
  FROM dists
)
SELECT CAST(label AS INTEGER) AS label,
       CAST(clabel AS INTEGER) AS assigned_label,
       CAST(count(*) AS BIGINT) AS n
FROM best WHERE rn = 1
GROUP BY 1, 2
""",
}

# Composed post-hoc from the pipeline_curate oracle: insert the SemDeDup
# DROP set (the full integer-Lloyd semantic-dedup replay nested as a
# subquery) between the near-dup drop (kept2) and the split labeling —
# mirroring curate_corpus(embeddings=...) stage order exactly. Anti-join
# semantics (NOT EXISTS), matching the engine: a doc absent from the
# embeddings table survives the semantic stage.
EXTENSION_ORACLE_SQL["pipeline_curate_semantic"] = (
    EXTENSION_ORACLE_SQL["pipeline_curate"]
    .replace(
        "curated AS (",
        f"""sem AS (
  SELECT vec_id FROM (
{_semantic_dedup_sql()}
  ) WHERE keep = 0
),
kept3 AS (
  SELECT k.* FROM kept2 k
  WHERE NOT EXISTS (SELECT 1 FROM sem s WHERE s.vec_id = k.doc_id)
),
curated AS (""",
    )
    .replace("FROM kept2\n  )", "FROM kept3\n  )")
)

EXTENSION_ORACLE_SQL["text_self_dedup"] = """
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
  FROM documents
),
sp AS (
  SELECT doc_id,
         generate_subscripts(generate_series(1, len(words), 2), 1) AS chunk_idx,
         unnest(generate_series(1, len(words), 2)) AS s, words
  FROM w WHERE len(words) > 0
),
spans AS (
  SELECT doc_id, chunk_idx, array_to_string(words[s:s+1], ' ') AS span FROM sp
),
firsts AS (
  SELECT doc_id, chunk_idx, span,
         min(chunk_idx) OVER (PARTITION BY doc_id, span) AS first_idx
  FROM spans
),
agg AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(span, ' ' ORDER BY chunk_idx) AS clean_text
  FROM firsts WHERE chunk_idx = first_idx GROUP BY 1
),
ns AS (SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY 1)
SELECT w.doc_id,
       CAST(coalesce(ns.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(ns.n_spans, 0) - coalesce(a.n_kept, 0) AS BIGINT)
         AS n_repeated,
       coalesce(a.clean_text, '') AS clean_text
FROM w LEFT JOIN ns ON ns.doc_id = w.doc_id
LEFT JOIN agg a ON a.doc_id = w.doc_id
"""

EXTENSION_ORACLE_SQL["text_decontaminate"] = """
WITH sh AS (
  SELECT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM (
    SELECT doc_id, string_split(text, ' ') AS w,
           unnest(generate_series(1, len(string_split(text, ' ')) - 2)) AS i
    FROM documents WHERE len(string_split(text, ' ')) >= 3
  )
),
cand AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE doc_id % 10 <> 0),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0),
r AS (
  SELECT c.doc_id,
         round(CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / count(*), 6) AS overlap_ratio
  FROM cand c LEFT JOIN bench b ON c.shingle = b.shingle
  GROUP BY c.doc_id
),
dropped AS (SELECT doc_id FROM r WHERE overlap_ratio > 0.1)
SELECT d.doc_id, d.text FROM documents d
WHERE d.doc_id % 10 <> 0
  AND NOT EXISTS (SELECT 1 FROM dropped x WHERE x.doc_id = d.doc_id)
"""

EXTENSION_ORACLE_SQL["text_pack_shuffled"] = """
WITH t AS (
  SELECT doc_id,
         ('0x' || substr(md5('0:' || doc_id), 1, 15))::BIGINT % 8 AS bucket,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens,
         ('0x' || substr(md5('1:' || doc_id), 1, 15))::BIGINT AS ord
  FROM documents
),
c AS (
  SELECT doc_id, bucket, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY bucket ORDER BY ord, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM t
)
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
       CAST(cum_before // 512 AS BIGINT) AS pack_id,
       n_tokens,
       CAST(cum_before % 512 AS BIGINT) AS offset_in_pack
FROM c
"""

EXTENSION_ORACLE_SQL["dedup_corpus_diff"] = """
WITH old AS (
  SELECT doc_id, md5(text) AS old_md5 FROM documents WHERE doc_id % 10 <> 0
),
new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END)
           AS new_md5
  FROM documents WHERE doc_id % 13 <> 0
)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, o.old_md5, n.new_md5,
       CASE WHEN o.old_md5 IS NULL THEN 'added'
            WHEN n.new_md5 IS NULL THEN 'removed'
            WHEN o.old_md5 = n.new_md5 THEN 'unchanged'
            ELSE 'changed' END AS status
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
"""

# The streaming C4 gate must equal the batch C4 gate — same oracle SQL.
EXTENSION_ORACLE_SQL["text_lm_histogram"] = f"""
SELECT CAST(floor(lm_score / 0.015625) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
       round(CAST(count(*) AS DOUBLE)
             / (SELECT count(*) FROM ({EXTENSION_ORACLE_SQL["text_lm_score"]})
                WHERE lm_score IS NOT NULL), 6) AS doc_share
FROM ({EXTENSION_ORACLE_SQL["text_lm_score"]})
WHERE lm_score IS NOT NULL
GROUP BY 1
"""

EXTENSION_ORACLE_SQL["streaming_c4_filter"] = EXTENSION_ORACLE_SQL["text_c4_filters"]

# The streaming decontamination gate must equal the batch apply — same
# oracle SQL (same candidate/benchmark slices, same rounded-ratio rule).
EXTENSION_ORACLE_SQL["streaming_decontaminate"] = EXTENSION_ORACLE_SQL[
    "text_decontaminate"
]

# The streaming mixture gate must equal the batch accounting — same oracle.
EXTENSION_ORACLE_SQL["streaming_mixture_weights"] = EXTENSION_ORACLE_SQL[
    "text_mixture_weights"
]

# The curate→pack flagship replays the ENTIRE curation pipeline (same
# prefix as pipeline_curate, down to the `curated` CTE) and then packs
# each split independently — the packing suffix swaps in for the final
# projection.
EXTENSION_ORACLE_SQL["pipeline_curate_pack"] = EXTENSION_ORACLE_SQL[
    "pipeline_curate"
].replace(
    "SELECT doc_id, pred_lang, quality, split FROM curated",
    """, packsrc AS (
  SELECT doc_id, split,
         ('0x' || substr(md5('0:' || doc_id), 1, 15))::BIGINT % 8 AS bucket,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens
  FROM curated
),
packed AS (
  SELECT doc_id, split, bucket, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY split, bucket ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM packsrc
)
SELECT doc_id, split, CAST(bucket AS BIGINT) AS bucket,
       CAST(cum_before // 512 AS BIGINT) AS pack_id, n_tokens,
       CAST(cum_before % 512 AS BIGINT) AS offset_in_pack
FROM packed""",
)



# --------------------------------------------------------------------------
# Round-10 family oracles: audio VAD, source governance, n-gram novelty,
# INT8 scalar quantization, OPQ dimension allocation.
# --------------------------------------------------------------------------

# Frame-energy / VAD replay: the analytic generator sawtooth (the same
# formula with_audio_payload and the audio_decode oracle share), framed
# by i // 16, a frame ACTIVE iff its energy >= n_in_frame · 8192²
# (integer compare — threshold_amp² = 67108864), trim boundaries as the
# min/max active frame index (NULL when all-silence).
EXTENSION_ORACLE_SQL["multimodal_audio_energy"] = """
WITH d AS (SELECT doc_id, length(text) AS L FROM documents),
a AS (
  SELECT doc_id, 4000 * (1 + L % 3) AS sr, 64 + doc_id % 101 AS n,
         (doc_id % 256) * 131 AS base
  FROM d
),
si AS (SELECT doc_id, sr, n, base, unnest(range(n)) AS i FROM a),
s AS (
  SELECT doc_id, sr, n, i // 16 AS f,
         ((base + 17 * i) % 65536 - 32768) AS v
  FROM si
),
fr AS (
  SELECT doc_id, sr, n, f, count(*) AS fn, sum(v * v) AS fe
  FROM s GROUP BY doc_id, sr, n, f
),
fa AS (
  SELECT doc_id, sr, n, f, fe, (fe >= fn * 67108864) AS active FROM fr
)
SELECT doc_id,
       CAST(max(sr) AS BIGINT) AS sample_rate,
       CAST(max(n) AS BIGINT) AS n_samples,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(sum(CASE WHEN active THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
       CAST(min(CASE WHEN active THEN f END) AS BIGINT) AS first_active,
       CAST(max(CASE WHEN active THEN f END) AS BIGINT) AS last_active,
       CAST(sum(fe) AS BIGINT) AS energy
FROM fa GROUP BY doc_id
"""

# Per-source governance: doc/token counts and mean on the space-split
# non-empty words, distinct-word vocabulary via one unnest, distinct
# languages — the text.source_stats aggregation replayed 1:1.
EXTENSION_ORACLE_SQL["text_source_stats"] = """
WITH b AS (
  SELECT source, lang,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS nt
  FROM documents
),
agg AS (
  SELECT source, count(*) AS n_docs, sum(nt) AS n_tokens,
         round(sum(nt) / count(*), 6) AS avg_tokens,
         count(DISTINCT lang) AS n_langs
  FROM b GROUP BY source
),
v AS (
  SELECT source, count(DISTINCT word) AS vocab FROM (
    SELECT source,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
    FROM documents
  ) GROUP BY source
)
SELECT a.source, CAST(a.n_docs AS BIGINT) AS n_docs,
       CAST(a.n_tokens AS BIGINT) AS n_tokens, a.avg_tokens,
       CAST(coalesce(v.vocab, 0) AS BIGINT) AS vocab,
       CAST(a.n_langs AS BIGINT) AS n_langs
FROM agg a LEFT JOIN v ON v.source = a.source
"""

# Trigram novelty: the minhash oracle's shingle CTE (distinct word
# 3-grams per doc), one gram-keyed document-frequency count, join back
# on the gram, per-doc shares — text.ngram_novelty replayed 1:1 (docs
# shorter than 3 words emit no row on both sides).
EXTENSION_ORACLE_SQL["text_ngram_novelty"] = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
shingle AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM (
    SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
    FROM words WHERE len(w) >= 3
  )
),
gdf AS (SELECT shingle, count(*) AS df FROM shingle GROUP BY shingle)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN gdf.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared,
       round(1.0 - sum(CASE WHEN gdf.df >= 2 THEN 1 ELSE 0 END) / count(*), 6)
         AS novelty
FROM shingle s JOIN gdf ON gdf.shingle = s.shingle
GROUP BY s.doc_id
"""

EXTENSION_ORACLE_SQL["sim_topk_sq"] = _sq_topk_sql()
EXTENSION_ORACLE_SQL["sim_sq_recall"] = _sq_recall_sql()
EXTENSION_ORACLE_SQL["sim_topk_opq"] = _opq_topk_sql()
EXTENSION_ORACLE_SQL["sim_opq_recall"] = _opq_recall_sql()


def _opq_scaled_vec_body() -> str:
    """DuckDB body of the OPQ skewed fixture as the ``(vec_id, vec
    DOUBLE[])`` relation the ANN replays consume (same exact arithmetic
    as :data:`_OPQ_EU_CTE` before quantization: float→double cast, the
    power-of-two hot-dim scale)."""
    return f"""SELECT vec_id,
       list_transform(embedding::DOUBLE[],
                      (x, i) -> x * CASE WHEN i <= {OPQ_HOT_DIMS}
                                         THEN {float(OPQ_HOT_SCALE)}
                                         ELSE 1.0 END) AS vec
  FROM embeddings"""


def _opq_perm_vec_body() -> str:
    """The OPQ-PERMUTED skewed fixture as pure nested subqueries (no
    CTEs — this text is spliced inside ``_ivfpq_sql``'s ``e`` CTE
    parens): the variance ranking over quantized micro-units of the
    id-prefix sample, the subspace-major deal, the coordinate reorder
    of the scaled DOUBLES. Quantization commutes with the reorder, so
    feeding these doubles through the replay's ``round(x·units)``
    equals the Spark side's permute-then-quantize."""
    scaled = _opq_scaled_vec_body()
    sub = 64 // PQ_M
    return f"""SELECT vec_id, list(x ORDER BY j) AS vec FROM (
    SELECT xs.vec_id, pm.j, xs.x
    FROM (SELECT vec_id, generate_subscripts(vec, 1) - 1 AS d,
                 unnest(vec) AS x
          FROM ({scaled})) xs
    JOIN (
      SELECT d AS src, (r % {PQ_M}) * {sub} + (r // {PQ_M}) AS j FROM (
        SELECT d, row_number() OVER (ORDER BY n * s2 - s1 * s1 DESC, d) - 1
                 AS r
        FROM (
          SELECT d, count(*) AS n, sum(x) AS s1, sum(x * x) AS s2 FROM (
            SELECT generate_subscripts(u, 1) - 1 AS d, unnest(u) AS x FROM (
              SELECT list_transform(vec,
                                    x -> CAST(round(x * {IVF_UNITS})
                                              AS BIGINT)) AS u
              FROM ({scaled}) ORDER BY vec_id LIMIT {OPQ_SAMPLE_N}
            )
          ) GROUP BY d
        )
      )
    ) pm ON pm.src = xs.d
  ) GROUP BY vec_id"""


def _opq_ivfpq_recall_sql() -> str:
    """Contiguous vs OPQ-permuted RESIDUAL IVFADC recall replay on the
    skewed fixture: two full nested ``_ivfpq_sql`` replays (each with
    its own CTE scope) against the exact integer-L2 truth."""
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    a1 = _ivfpq_sql(residual=True, e_body=_opq_scaled_vec_body())
    a2 = _ivfpq_sql(residual=True, e_body=_opq_perm_vec_body())
    branches = []
    for method, name in (("ivfpq_res", "a1"), ("opq_ivfpq", "a2")):
        branches.append(
            f"""SELECT '{method}' AS method, q AS query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / {float(SIM_K)}, 6) AS recall
FROM (SELECT unnest([{qids}]) AS q)
LEFT JOIN (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e SEMI JOIN {name} a
    ON a.query_id = e.query_id AND a.vec_id = e.vec_id
  GROUP BY e.query_id
) h ON h.query_id = q"""
        )
    return f"""
WITH a1 AS MATERIALIZED (
{a1}
),
a2 AS MATERIALIZED (
{a2}
),
e2 AS MATERIALIZED (
  SELECT vec_id,
         list_transform(vec, x -> CAST(round(x * {IVF_UNITS}) AS BIGINT)) AS u
  FROM ({_opq_scaled_vec_body()})
),
exact AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, eb.vec_id,
           {_int_d2_sql("eb.u", "q.u")} AS d2
    FROM e2 eb CROSS JOIN (SELECT * FROM e2 WHERE vec_id IN ({qids})) q
    WHERE eb.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY d2, vec_id) <= {SIM_K}
)
{chr(10).join(branches[:1])}
UNION ALL
{chr(10).join(branches[1:])}
"""


EXTENSION_ORACLE_SQL["sim_topk_opq_ivfpq"] = _ivfpq_sql(
    residual=True, e_body=_opq_perm_vec_body()
)
EXTENSION_ORACLE_SQL["sim_opq_ivfpq_recall"] = _opq_ivfpq_recall_sql()


# --------------------------------------------------------------------------
# IVF-SQ8 oracles: coarse IVF cells + INT8 scalar-quantized residuals.
# --------------------------------------------------------------------------

def _ivfsq_ctes(
    budgets, vec_body: str | None = None
) -> tuple[list[str], list[str]]:
    """Unrolled IVF-SQ8 replay (mirrors similarity.ivfsq_build/
    ivfsq_topk): the coarse integer Lloyd of the IVF oracle, the
    residual projection, the corpus-wide residual ``vmax`` scalar, the
    ``floor(r·127/vmax)`` byte codes, the integer probe of IVF_NPROBE
    cells per query with the query's residual coded PER PROBED CELL on
    the same scale, then per budget the stage-1 code-space cut
    restricted to probed cells and the exact full-resolution re-rank.
    Returns ``(ctes, approx_names)`` like :func:`_sq_ctes`."""
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    ctes = [
        _micro_e_cte(vec_body),
        f"""cent0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, u
  FROM e ORDER BY vec_id LIMIT {IVF_K}
)""",
    ]
    for it in range(IVF_ITERS + 1):
        ctes.append(f"""assign{it} AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cluster, {_int_d2_sql("e.u", "c.u")} AS d2
    FROM e CROSS JOIN cent{it} c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1
)""")
        if it < IVF_ITERS:
            ctes.append(f"""mean{it + 1} AS (
  SELECT cluster, list(m ORDER BY d) AS u FROM (
    SELECT cluster, d, CAST(round(sum(x) / count(*)) AS BIGINT) AS m
    FROM (
      SELECT a.cluster, generate_subscripts(e.u, 1) AS d, unnest(e.u) AS x
      FROM e JOIN assign{it} a ON a.vec_id = e.vec_id
    ) GROUP BY cluster, d
  ) GROUP BY cluster
)""")
            ctes.append(f"""cent{it + 1} AS (
  SELECT c.cluster, coalesce(m.u, c.u) AS u
  FROM cent{it} c LEFT JOIN mean{it + 1} m ON m.cluster = c.cluster
)""")
    final = IVF_ITERS
    ctes.append(f"""qv AS (
  SELECT vec_id AS query_id, u AS q_u FROM e WHERE vec_id IN ({qids})
)""")
    ctes.append(f"""probe AS (
  SELECT query_id, cluster FROM (
    SELECT q.query_id, c.cluster, {_int_d2_sql("q.q_u", "c.u")} AS d2
    FROM qv q CROSS JOIN cent{final} c
  ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d2, cluster)
    <= {IVF_NPROBE}
)""")
    ctes.append(f"""res AS MATERIALIZED (
  SELECT e.vec_id, a.cluster,
         list_transform(generate_series(1, 64), i -> e.u[i] - c.u[i]) AS r
  FROM e JOIN assign{final} a ON a.vec_id = e.vec_id
  JOIN cent{final} c ON c.cluster = a.cluster
)""")
    ctes.append("""vm AS (
  SELECT greatest(1, max(list_max(list_transform(r, x -> abs(x))))) AS vmax
  FROM res
)""")
    ctes.append("""codes AS MATERIALIZED (
  SELECT vec_id, cluster,
         list_transform(r, x -> CAST(floor((x * 127.0) / vm.vmax)
                                     AS BIGINT)) AS sq
  FROM res, vm
)""")
    ctes.append(f"""qcodes AS (
  SELECT q.query_id, p.cluster,
         list_transform(generate_series(1, 64),
                        i -> CAST(floor(((q.q_u[i] - c.u[i]) * 127.0)
                                        / vm.vmax) AS BIGINT)) AS qsq
  FROM qv q JOIN probe p ON p.query_id = q.query_id
  JOIN cent{final} c ON c.cluster = p.cluster, vm
)""")
    ctes.append(f"""s1 AS (
  SELECT qc.query_id, c.vec_id, {_int_d2_sql("c.sq", "qc.qsq")} AS d2c
  FROM codes c JOIN qcodes qc ON qc.cluster = c.cluster
  WHERE c.vec_id <> qc.query_id
)""")
    names = []
    for b in budgets:
        ctes.append(f"""cand{b} AS (
  SELECT query_id, vec_id FROM s1
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY d2c, vec_id) <= {b}
)""")
        ctes.append(f"""approx{b} AS (
  SELECT query_id, vec_id, d2_u, rn FROM (
    SELECT cand{b}.query_id, cand{b}.vec_id,
           CAST({_int_d2_sql("ec.u", "eq.u")} AS BIGINT) AS d2_u,
           row_number() OVER (PARTITION BY cand{b}.query_id
                              ORDER BY {_int_d2_sql("ec.u", "eq.u")},
                                       cand{b}.vec_id) AS rn
    FROM cand{b}
    JOIN e ec ON ec.vec_id = cand{b}.vec_id
    JOIN e eq ON eq.vec_id = cand{b}.query_id
  ) WHERE rn <= {SIM_K}
)""")
        names.append(f"approx{b}")
    return ctes, names


def _ivfsq_topk_sql() -> str:
    ctes, names = _ivfsq_ctes([RP_TOPK_CANDIDATES])
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT query_id, vec_id, d2_u, CAST(rn AS INTEGER) AS rn"
        f" FROM {names[0]}"
    )


def _ivfsq_recall_sql() -> str:
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    ctes, names = _ivfsq_ctes(SQ_RECALL_BUDGETS)
    ctes.append(f"""exact AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, eb.vec_id,
           {_int_d2_sql("eb.u", "q.u")} AS d2
    FROM e eb CROSS JOIN (SELECT * FROM e WHERE vec_id IN ({qids})) q
    WHERE eb.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY d2, vec_id) <= {SIM_K}
)""")
    branches = []
    for b, name in zip(SQ_RECALL_BUDGETS, names):
        ctes.append(f"""hits{b} AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e SEMI JOIN {name} a
    ON a.query_id = e.query_id AND a.vec_id = e.vec_id
  GROUP BY e.query_id
)""")
        branches.append(
            f"""SELECT 'ivfsq_c{b}' AS method, q AS query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / {float(SIM_K)}, 6) AS recall
FROM (SELECT unnest([{qids}]) AS q) LEFT JOIN hits{b} h ON h.query_id = q"""
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(branches)
    )


EXTENSION_ORACLE_SQL["sim_topk_ivfsq"] = _ivfsq_topk_sql()
EXTENSION_ORACLE_SQL["sim_ivfsq_recall"] = _ivfsq_recall_sql()


# --------------------------------------------------------------------------
# Binary-quantization oracles: sign-bit pack + Hamming stage 1.
# --------------------------------------------------------------------------

def _bq_ctes(
    budgets, vec_body: str | None = None
) -> tuple[list[str], list[str]]:
    """Binary-quantization replay (mirrors similarity.bq_build/bq_topk):
    sign bit per micro-unit component packed into two 32-bit BIGINT
    words, stage-1 total Hamming (Σ bit_count(xor)) per budget, exact
    full-resolution integer-L2 re-rank — every step integer, zero
    trained state. Returns ``(ctes, approx_names)`` like
    :func:`_sq_ctes`."""
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    ham = (
        "CAST(list_sum(list_transform(generate_series(1, 2), "
        "i -> bit_count(xor(cb.bq[i], q.bq[i])))) AS BIGINT)"
    )
    ctes = [
        _micro_e_cte(vec_body),
        """b AS MATERIALIZED (
  SELECT vec_id,
         list_transform(generate_series(0, 1), w ->
           CAST(list_sum(list_transform(generate_series(0, 31), j ->
             CASE WHEN u[w * 32 + j + 1] >= 0 THEN (1::BIGINT << j)
                  ELSE 0::BIGINT END)) AS BIGINT)) AS bq
  FROM e
)""",
    ]
    names = []
    for b in budgets:
        ctes.append(f"""cand{b} AS (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, cb.vec_id, {ham} AS dh
    FROM b cb CROSS JOIN (SELECT * FROM b WHERE vec_id IN ({qids})) q
    WHERE cb.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY dh, vec_id) <= {b}
)""")
        ctes.append(f"""approx{b} AS (
  SELECT query_id, vec_id, d2_u, rn FROM (
    SELECT cand{b}.query_id, cand{b}.vec_id,
           CAST({_int_d2_sql("ec.u", "eq.u")} AS BIGINT) AS d2_u,
           row_number() OVER (PARTITION BY cand{b}.query_id
                              ORDER BY {_int_d2_sql("ec.u", "eq.u")},
                                       cand{b}.vec_id) AS rn
    FROM cand{b}
    JOIN e ec ON ec.vec_id = cand{b}.vec_id
    JOIN e eq ON eq.vec_id = cand{b}.query_id
  ) WHERE rn <= {SIM_K}
)""")
        names.append(f"approx{b}")
    return ctes, names


def _bq_topk_sql() -> str:
    ctes, names = _bq_ctes([RP_TOPK_CANDIDATES])
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT query_id, vec_id, d2_u, CAST(rn AS INTEGER) AS rn"
        f" FROM {names[0]}"
    )


def _bq_recall_sql() -> str:
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    ctes, names = _bq_ctes(SQ_RECALL_BUDGETS)
    ctes.append(f"""exact AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, eb.vec_id,
           {_int_d2_sql("eb.u", "q.u")} AS d2
    FROM e eb CROSS JOIN (SELECT * FROM e WHERE vec_id IN ({qids})) q
    WHERE eb.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY d2, vec_id) <= {SIM_K}
)""")
    branches = []
    for b, name in zip(SQ_RECALL_BUDGETS, names):
        ctes.append(f"""hits{b} AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e SEMI JOIN {name} a
    ON a.query_id = e.query_id AND a.vec_id = e.vec_id
  GROUP BY e.query_id
)""")
        branches.append(
            f"""SELECT 'bq_c{b}' AS method, q AS query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / {float(SIM_K)}, 6) AS recall
FROM (SELECT unnest([{qids}]) AS q) LEFT JOIN hits{b} h ON h.query_id = q"""
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(branches)
    )


EXTENSION_ORACLE_SQL["sim_topk_bq"] = _bq_topk_sql()
EXTENSION_ORACLE_SQL["sim_bq_recall"] = _bq_recall_sql()


# The streaming governance twin must equal the batch dashboard verbatim
# — same oracle text as text_source_stats.
EXTENSION_ORACLE_SQL["streaming_source_stats"] = EXTENSION_ORACLE_SQL[
    "text_source_stats"
]


# --------------------------------------------------------------------------
# Hybrid retrieval oracle: lexical TF-IDF rank ⊕ vector rank via RRF.
# --------------------------------------------------------------------------

def _hybrid_rrf_sql() -> str:
    """RRF replay: the core search_rel chain ranks the lexical side
    with the DQ6 ordering, the exact integer-L2 chain ranks the
    semantic side for each query's mapped embedding, and the fusion is
    the same fixed two-term ``1/(60+r)`` expression + top-10 window."""
    from hadoop_tfidf_spark.declared import SEARCH_QUERIES

    vec_ids = SIM_QUERY_IDS[: len(SEARCH_QUERIES)]
    qmap = ", ".join(
        f"('{qid}', {int(v)})"
        for (qid, _), v in zip(SEARCH_QUERIES, vec_ids)
    )
    qvec_ids = ", ".join(str(int(v)) for v in vec_ids)
    return (
        _CORE_CTES
        + f"""
, lexr AS (
  SELECT query_id, doc_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id) AS BIGINT)
           AS r_lex
  FROM search_rel
  QUALIFY r_lex <= {RRF_LEX_TOPN}
),
ev AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {IVF_UNITS}) AS BIGINT)) AS u
  FROM embeddings
),
qmap AS (SELECT * FROM (VALUES {qmap}) AS m(query_id, qvec_id)),
semr AS (
  SELECT m.query_id, s.vec_id AS doc_id, s.r_sem
  FROM (
    SELECT query_id AS qvec_id, vec_id,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY d2, vec_id) AS BIGINT) AS r_sem
    FROM (
      SELECT q.vec_id AS query_id, eb.vec_id,
             {_int_d2_sql("eb.u", "q.u")} AS d2
      FROM ev eb CROSS JOIN (SELECT * FROM ev
                             WHERE vec_id IN ({qvec_ids})) q
      WHERE eb.vec_id <> q.vec_id
    )
    QUALIFY r_sem <= {SIM_K}
  ) s JOIN qmap m ON m.qvec_id = s.qvec_id
),
fused AS (
  SELECT coalesce(l.query_id, s.query_id) AS query_id,
         coalesce(l.doc_id, s.doc_id) AS doc_id,
         l.r_lex, s.r_sem,
         round(coalesce(1.0 / ({RRF_K} + l.r_lex), 0.0)
               + coalesce(1.0 / ({RRF_K} + s.r_sem), 0.0), 6) AS rrf_score
  FROM lexr l FULL JOIN semr s
    ON s.query_id = l.query_id AND s.doc_id = l.doc_id
)
SELECT query_id, doc_id, r_lex, r_sem, rrf_score, CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_score DESC, doc_id) AS rnk
  FROM fused
) WHERE rnk <= {RRF_TOPK}
"""
    )


EXTENSION_ORACLE_SQL["search_hybrid_rrf"] = _hybrid_rrf_sql()


# Streaming BQ index ingest == the one-shot batch pack, bit for bit
# (the b CTE of the BQ replay, words surfaced as scalar columns).
EXTENSION_ORACLE_SQL["streaming_bq_index"] = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {IVF_UNITS}) AS BIGINT)) AS u
  FROM embeddings
),
b AS (
  SELECT vec_id,
         list_transform(generate_series(0, 1), w ->
           CAST(list_sum(list_transform(generate_series(0, 31), j ->
             CASE WHEN u[w * 32 + j + 1] >= 0 THEN (1::BIGINT << j)
                  ELSE 0::BIGINT END)) AS BIGINT)) AS bq
  FROM e
)
SELECT vec_id, bq[1] AS bq_w0, bq[2] AS bq_w1 FROM b
"""


# Per-source quality governance: the per-doc quality and C4-keep
# replays nested verbatim, rolled up source-keyed with the exact
# micro-unit quality mass.
EXTENSION_ORACLE_SQL["text_source_quality"] = f"""
WITH q AS MATERIALIZED (
{EXTENSION_ORACLE_SQL["text_quality"]}
),
c AS MATERIALIZED (
{EXTENSION_ORACLE_SQL["text_c4_filters"]}
),
d AS (SELECT doc_id, source FROM documents)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CAST(round(q.quality * 1000000) AS BIGINT)) AS BIGINT)
         AS sum_quality_u,
       round(sum(CAST(round(q.quality * 1000000) AS BIGINT))
             / (count(*) * 1000000.0), 6) AS avg_quality,
       CAST(sum(c.keep) AS BIGINT) AS n_keep,
       round(sum(c.keep) / count(*), 6) AS keep_rate
FROM d JOIN q USING (doc_id) JOIN c USING (doc_id)
GROUP BY d.source
"""


# --------------------------------------------------------------------------
# Round-12 oracles: the tier frontier, the update-mode governance twin,
# and the malformed-payload keep contract.
# --------------------------------------------------------------------------

def _frontier_sql() -> str:
    """All six quantization-tier replays composed into ONE query: each
    tier's full chain (the byte-identical builders its own gate row
    uses, retargeted at the skewed fixture via ``vec_body=``/
    ``e_body=``) runs inside its own scoped nested-WITH subquery, the
    shared exact integer-L2 truth materializes once, and each branch
    reduces to one ``(tier, bytes_per_vec, n_hits, recall)`` row."""
    scaled = _opq_scaled_vec_body()
    qids = ", ".join(map(str, SIM_QUERY_IDS))
    denom = float(SIM_K * len(SIM_QUERY_IDS))

    def chain(ctes, final_select):
        return "WITH " + ",\n".join(ctes) + "\n" + final_select

    sq_ctes, sq_names = _sq_ctes([FRONTIER_BUDGET], vec_body=scaled)
    ivfsq_ctes, ivfsq_names = _ivfsq_ctes([FRONTIER_BUDGET], vec_body=scaled)
    bq_ctes, bq_names = _bq_ctes([FRONTIER_BUDGET], vec_body=scaled)
    pq_ctes = [_OPQ_EU_CTE] + _pq_chain_ctes(64, prefix="p", e_name="eu")
    tiers = {
        "sq": chain(
            sq_ctes, f"SELECT query_id, vec_id FROM {sq_names[0]}"
        ),
        "ivfsq": chain(
            ivfsq_ctes, f"SELECT query_id, vec_id FROM {ivfsq_names[0]}"
        ),
        "pq": chain(
            pq_ctes,
            f"SELECT query_id, vec_id FROM pranked WHERE rn <= {SIM_K}",
        ),
        "ivfpq_res": _ivfpq_sql(residual=True, e_body=scaled),
        "opq_ivfpq": _ivfpq_sql(
            residual=True, e_body=_opq_perm_vec_body()
        ),
        "bq": chain(
            bq_ctes, f"SELECT query_id, vec_id FROM {bq_names[0]}"
        ),
    }
    tier_ctes = ",\n".join(
        f"t_{t} AS MATERIALIZED (\n{sql}\n)" for t, sql in tiers.items()
    )
    branches = "\nUNION ALL\n".join(
        f"""SELECT '{t}' AS tier,
       CAST({TIER_BYTES[t]} AS BIGINT) AS bytes_per_vec,
       CAST(n_hits AS BIGINT) AS n_hits,
       round(n_hits / {denom}, 6) AS recall
FROM (SELECT count(*) AS n_hits
      FROM exact e SEMI JOIN t_{t} a
        ON a.query_id = e.query_id AND a.vec_id = e.vec_id)"""
        for t in tiers
    )
    return f"""
WITH {tier_ctes},
e2 AS MATERIALIZED (
  SELECT vec_id,
         list_transform(vec, x -> CAST(round(x * {IVF_UNITS}) AS BIGINT)) AS u
  FROM ({scaled})
),
exact AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, eb.vec_id,
           {_int_d2_sql("eb.u", "q.u")} AS d2
    FROM e2 eb CROSS JOIN (SELECT * FROM e2 WHERE vec_id IN ({qids})) q
    WHERE eb.vec_id <> q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY d2, vec_id) <= {SIM_K}
)
{branches}
"""


EXTENSION_ORACLE_SQL["sim_tier_frontier"] = _frontier_sql()


# Update-mode governance twin: upsert-reconstructed final state must
# equal the batch per-source roll-up (the (source, lang)-grain slice of
# the text_source_stats arithmetic; vocab is the complete-mode twin's
# subject).
EXTENSION_ORACLE_SQL["streaming_source_stats_update"] = """
WITH b AS (
  SELECT source, lang,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS nt
  FROM documents
),
g AS (
  SELECT source, lang, count(*) AS n_docs, sum(nt) AS n_tokens
  FROM b GROUP BY source, lang
)
SELECT source, CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       round(sum(n_tokens) / sum(n_docs), 6) AS avg_tokens,
       CAST(count(*) AS BIGINT) AS n_langs
FROM g GROUP BY source
"""

# The compacted ledger reconstructs to the SAME per-source roll-up (the
# update twin's oracle verbatim) + the pinned post-compaction generation
# count: 4 triggers, generations 0..2 folded into one base, 1 newer
# generation still shadowing it.
EXTENSION_ORACLE_SQL["streaming_ledger_compact"] = EXTENSION_ORACLE_SQL[
    "streaming_source_stats_update"
].replace(
    "CAST(count(*) AS BIGINT) AS n_langs",
    "CAST(count(*) AS BIGINT) AS n_langs,\n       CAST(2 AS BIGINT) AS n_generations",
)

# The compact_every=2 POLICY sink: 4 triggers; the batch-1 fold (<= 0)
# is a no-op, the batch-3 fold (<= 2) lands a base at batch_id=2 — the
# stream ends with exactly TWO generations and the same roll-up values
# (the fold loses nothing).
EXTENSION_ORACLE_SQL["streaming_ledger_policy"] = EXTENSION_ORACLE_SQL[
    "streaming_source_stats_update"
].replace(
    "CAST(count(*) AS BIGINT) AS n_langs",
    "CAST(count(*) AS BIGINT) AS n_langs,\n       CAST(2 AS BIGINT) AS n_generations",
)


# Malformed-payload keep contract: the multimodal_audio_decode analytic
# replay verbatim for the good rows; poisoned doc_ids (the modulo rule)
# carry NULL features + the deterministic parser error string the
# truncation triggers (11 bytes cuts mid-"WAVE" magic).
EXTENSION_ORACLE_SQL["multimodal_audio_keep"] = f"""
WITH d AS (SELECT doc_id, length(text) AS L FROM documents),
a AS (
  SELECT doc_id, 4000 * (1 + L % 3) AS sr, 64 + doc_id % 101 AS n,
         (doc_id % 256) * 131 AS base
  FROM d
),
si AS (SELECT doc_id, sr, n, base, unnest(range(n)) AS i FROM a),
s AS (
  SELECT doc_id, sr, n, ((base + 17 * i) % 65536 - 32768) AS v FROM si
),
feat AS (
  SELECT doc_id,
         CAST(44 + 2 * max(n) AS BIGINT) AS n_bytes,
         CAST(max(sr) AS BIGINT) AS sample_rate,
         CAST(max(n) AS BIGINT) AS n_samples,
         CAST(sum(v) AS BIGINT) AS sum_samples,
         CAST(sum(abs(v)) AS BIGINT) AS sum_abs
  FROM s GROUP BY doc_id
)
SELECT doc_id,
       CASE WHEN bad THEN NULL ELSE n_bytes END AS n_bytes,
       CASE WHEN bad THEN NULL ELSE sample_rate END AS sample_rate,
       CASE WHEN bad THEN NULL ELSE n_samples END AS n_samples,
       CASE WHEN bad THEN NULL ELSE sum_samples END AS sum_samples,
       CASE WHEN bad THEN NULL ELSE sum_abs END AS sum_abs,
       CASE WHEN bad THEN 'ValueError: bad RIFF/WAVE magic' END AS err
FROM (SELECT *, doc_id % {AUDIO_POISON_MOD} = {AUDIO_POISON_RES} AS bad
      FROM feat)
"""


# The update-mode phash ledger reconstructs to the SAME final groups the
# complete-mode twin drains; the online-serving BQ row must answer
# streamed queries exactly as the batch index row answers them at rest.
EXTENSION_ORACLE_SQL["streaming_phash_dedup_update"] = EXTENSION_ORACLE_SQL[
    "streaming_phash_dedup"
]
EXTENSION_ORACLE_SQL["streaming_knn_bq"] = EXTENSION_ORACLE_SQL[
    "sim_topk_bq"
]


# Per-source adaptive quality cut: the text_quality chain + one
# source-keyed window rank vs a per-source ceil(q*n) cutoff.
EXTENSION_ORACLE_SQL["text_quality_adaptive"] = f"""
WITH q AS MATERIALIZED (
{EXTENSION_ORACLE_SQL["text_quality"]}
),
d AS (SELECT doc_id, source FROM documents),
r AS (
  SELECT d.source, q.doc_id, q.quality,
         CAST(row_number() OVER (PARTITION BY d.source
                                 ORDER BY q.quality DESC, q.doc_id)
              AS BIGINT) AS qrank,
         CAST(count(*) OVER (PARTITION BY d.source) AS BIGINT) AS n_source
  FROM q JOIN d USING (doc_id)
)
SELECT source, doc_id, quality, qrank, n_source
FROM r WHERE qrank <= ceil({QUALITY_TOP_FRAC} * n_source)
"""

# The production approx form's oracle replays percentile_approx's
# DEFINITION (smallest value whose <=-fraction reaches 1-q) with a
# cumulative count window — exact on the gate fixture, where the GK
# sketch holds every value (n_source << QUALITY_APPROX_ACC).
EXTENSION_ORACLE_SQL["text_quality_adaptive_approx"] = f"""
WITH q AS MATERIALIZED (
{EXTENSION_ORACLE_SQL["text_quality"]}
),
d AS (SELECT doc_id, source FROM documents),
j AS (SELECT d.source, q.quality FROM q JOIN d USING (doc_id)),
c AS (
  SELECT source, quality,
         count(*) OVER (PARTITION BY source ORDER BY quality) * 1.0
           / count(*) OVER (PARTITION BY source) AS frac_le
  FROM j
),
cuts AS (
  SELECT source, min(quality) AS cutoff
  FROM c WHERE frac_le >= {1.0 - QUALITY_TOP_FRAC} GROUP BY source
),
sizes AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_source FROM j GROUP BY source
),
kept AS (
  SELECT j.source, CAST(count(*) AS BIGINT) AS n_kept
  FROM j JOIN cuts USING (source)
  WHERE j.quality > cuts.cutoff GROUP BY j.source
)
SELECT s.source, s.n_source, cuts.cutoff,
       CAST(coalesce(kept.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(ceil({QUALITY_TOP_FRAC} * s.n_source) AS BIGINT) AS n_kept_exact,
       CAST(coalesce(kept.n_kept, 0)
            - ceil({QUALITY_TOP_FRAC} * s.n_source) AS BIGINT) AS kept_delta
FROM sizes s
JOIN cuts USING (source)
LEFT JOIN kept USING (source)
"""


def _ivfsq_index_sql() -> str:
    """The batch IVF-SQ8 build replay (coarse Lloyd + residual + vmax +
    byte codes — the :func:`_ivfsq_ctes` chain) finished with an md5
    over the comma-joined code sequence, matching the Spark side's
    per-row fingerprint byte for byte."""
    ctes, _ = _ivfsq_ctes([])
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT vec_id, CAST(cluster AS BIGINT) AS cluster,"
        " md5(array_to_string(sq, ',')) AS sq_md5 FROM codes"
    )


EXTENSION_ORACLE_SQL["streaming_ivfsq_index"] = _ivfsq_index_sql()


# ---------------------------------------------------------------- round 13
# Broadcast-Bloom decontamination audit: the oracle rebuilds the SAME
# 2^16-bit / 4-hash filter (bit_or-packed 32-bit lanes over the benchmark
# shingles' Carter-Wegman positions) and probes it per candidate shingle,
# alongside the exact semi-join hit count — bitmap arithmetic replayed
# bit for bit, so any drift in hash constants, lane packing, or the
# one-sided-error contract fails the hash row.
def _bloom_pos_sql() -> str:
    """(A_h·x + B_h) mod M31 mod BLOOM_BITS with h CASE-unrolled from the
    shared MinHash constants — the verbatim Spark probe arithmetic."""
    from hadoop_tfidf_spark.functions.text import BLOOM_BITS, BLOOM_HASHES

    a_case = " ".join(
        f"WHEN {h} THEN {MINHASH_A[h]}" for h in range(BLOOM_HASHES)
    )
    b_case = " ".join(
        f"WHEN {h} THEN {MINHASH_B[h]}" for h in range(BLOOM_HASHES)
    )
    return (
        f"((CASE h {a_case} END * x + CASE h {b_case} END) % {M31})"
        f" % {BLOOM_BITS}"
    )


def _bloom_ctes() -> str:
    """The shared bitmap-build + probe CTE chain through ``bloomagg``
    (per-candidate-doc Bloom hit counts over the %10 split) — used by
    both the batch audit oracle and the streaming stateless twin."""
    from hadoop_tfidf_spark.functions.text import BLOOM_HASHES

    pos = _bloom_pos_sql()
    return f"""cw AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE doc_id % 10 <> 0
),
csh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        FROM cw WHERE len(w) >= 3)
),
bw AS (
  SELECT string_split(text, ' ') AS w
  FROM documents WHERE doc_id % 10 = 0
),
bsh AS (
  SELECT DISTINCT array_to_string(w[i:i+2], ' ') AS shingle
  FROM (SELECT w, unnest(generate_series(1, len(w) - 2)) AS i
        FROM bw WHERE len(w) >= 3)
),
bpos AS (
  SELECT {pos} AS pos
  FROM (SELECT ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {M31} AS x
        FROM bsh)
  CROSS JOIN generate_series(0, {BLOOM_HASHES - 1}) t(h)
),
bitmap AS (
  SELECT pos // 32 AS w_idx, bit_or(1::BIGINT << (pos % 32)) AS bits
  FROM bpos GROUP BY 1
),
cpos AS (
  SELECT doc_id, shingle, {pos} AS pos
  FROM (SELECT doc_id, shingle,
               ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {M31} AS x
        FROM csh)
  CROSS JOIN generate_series(0, {BLOOM_HASHES - 1}) t(h)
),
chit AS (
  SELECT doc_id, shingle,
         bool_and((coalesce(bits, 0) & (1::BIGINT << (pos % 32))) <> 0)
           AS hit
  FROM cpos LEFT JOIN bitmap ON pos // 32 = w_idx
  GROUP BY doc_id, shingle
),
bloomagg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits_bloom
  FROM chit GROUP BY doc_id
)"""


def _decontaminate_bloom_sql() -> str:
    return (
        "WITH "
        + _bloom_ctes()
        + """,
exactagg AS (
  SELECT c.doc_id,
         CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hits_exact
  FROM csh c LEFT JOIN bsh b USING (shingle)
  GROUP BY c.doc_id
)
SELECT a.doc_id, a.n_shingles, e.n_hits_exact, a.n_hits_bloom,
       CAST(a.n_hits_bloom - e.n_hits_exact AS BIGINT) AS n_false_pos,
       CASE WHEN round(e.n_hits_exact * 1.0 / a.n_shingles, 6) <= 0.1
            THEN 1 ELSE 0 END AS keep_exact,
       CASE WHEN round(a.n_hits_bloom * 1.0 / a.n_shingles, 6) <= 0.1
            THEN 1 ELSE 0 END AS keep_bloom
FROM bloomagg a JOIN exactagg e USING (doc_id)
"""
    )


EXTENSION_ORACLE_SQL["text_decontaminate_bloom"] = _decontaminate_bloom_sql()


# Incremental signature maintenance: the oracle signs the NEW generation
# FROM SCRATCH (the full shingle→signature chain over the revised corpus),
# so a hash match proves delta_signatures' carried+fresh union equals the
# batch recompute row for row.
EXTENSION_ORACLE_SQL["dedup_delta_signatures"] = (
    "WITH "
    + _minhash_body_sql(
        "(SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN text || ' v2'"
        " ELSE text END AS text FROM documents WHERE doc_id % 13 <> 0)"
    )
    + "SELECT doc_id, "
    + ", ".join(f"mh_{h}" for h in range(DEFAULT_NUM_HASHES))
    + " FROM sig"
)


# O(delta) signature ledger: the oracle signs gen 1 from scratch WITH the
# stored content-hash column — every doc gets a row (LEFT JOIN: short docs
# carry NULL signatures, exactly sign_generation's rule), so a hash match
# proves the stored-hash diff + carried rows + dirty re-sign equals a full
# re-sign, content hash included.
EXTENSION_ORACLE_SQL["dedup_delta_ledger"] = (
    "WITH newgen AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN"
    " text || ' v2' ELSE text END AS text FROM documents"
    " WHERE doc_id % 13 <> 0),\n"
    + _minhash_body_sql("newgen")
    + "SELECT n.doc_id, md5(n.text) AS text_hash, "
    + ", ".join(f"s.mh_{h}" for h in range(DEFAULT_NUM_HASHES))
    + " FROM newgen n LEFT JOIN sig s ON s.doc_id = n.doc_id"
)


# Stateless streaming Bloom decontamination: the drained per-doc verdicts
# must equal the batch bitmap replay over ALL candidate docs (sub-k-word
# docs carry 0/0/keep=1 — the no-evidence rule).
EXTENSION_ORACLE_SQL["streaming_decontaminate_bloom"] = (
    "WITH "
    + _bloom_ctes()
    + """
SELECT d.doc_id,
       CAST(coalesce(a.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(coalesce(a.n_hits_bloom, 0) AS BIGINT) AS n_hits,
       CASE WHEN coalesce(a.n_shingles, 0) = 0 THEN 1
            WHEN round(a.n_hits_bloom * 1.0 / a.n_shingles, 6) <= 0.1
            THEN 1 ELSE 0 END AS keep
FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) d
LEFT JOIN bloomagg a USING (doc_id)
"""
)
