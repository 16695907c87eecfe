"""Retrieval ranking metrics: MRR, precision@k, NDCG@k over a run + qrels.

The eval half of the retrieval stack (BM25 / ANN / hybrid RRF produce
runs; this scores them) — in a training-data pipeline it is how retrieval
quality gates are enforced before a corpus ships (e.g. "hard-negative
mining must keep NDCG@10 ≥ X against the labeled qrels").

Determinism doctrine (the repo's cross-engine rule): every metric is an
integer.  NDCG's ``1/log2(rank+1)`` discounts are precomputed in Python
as scaled-integer LITERALS shared verbatim by the Spark expression and
the DuckDB oracle (single source, like ``PII_PATTERNS``), so no engine
ever evaluates a logarithm; MRR and precision are pure-integer divisions
(truncating / half-up respectively — stated per column).

Scale shape: one (query, doc) equi-join of the run against the qrels
(qrels are label-budget-sized — human judgments — so Catalyst broadcasts
them; the run side never re-shuffles), one per-query aggregate, one
metadata-sized n_rel join.  Output is |queries| rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# discount scale: round(1e9 / log2(r+1)) — large enough that the integer
# quantization is far below any ranking-relevant resolution
_DISC_SCALE = 10**9


def _discounts(k: int) -> list[int]:
    """Scaled-integer NDCG discounts for ranks 1..k (python-computed once;
    interpolated as literals into BOTH engines' SQL)."""
    return [int(round(_DISC_SCALE / math.log2(r + 1))) for r in range(1, k + 1)]


def _disc_case(rank_col: str, k: int) -> str:
    ds = _discounts(k)
    whens = " ".join(f"WHEN {rank_col} = {r + 1} THEN {d}" for r, d in enumerate(ds))
    return f"(CASE {whens} ELSE 0 END)"


def _ideal_case(m_col: str, k: int) -> str:
    """Cumulative discount sum for an ideal ranking of ``m`` relevant docs
    (m capped at k by the caller)."""
    ds = _discounts(k)
    cum, acc = [], 0
    for d in ds:
        acc += d
        cum.append(acc)
    whens = " ".join(f"WHEN {m_col} = {m + 1} THEN {c}" for m, c in enumerate(cum))
    return f"(CASE {whens} ELSE 0 END)"


def ranking_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query ``(n_rel, hits, rr_ppm, prec_ppm, ndcg_ppm)`` for a top-k
    ``run`` (one row per (query, doc) with 1-based ``rank`` ≤ k) against
    binary-relevance ``qrels`` (unique (query, doc) pairs).

    - ``rr_ppm``   = floor(10⁶ / first relevant rank); 0 when no hit —
      truncating division like the reciprocal itself (1/3 → 333333).
    - ``prec_ppm`` = half-up(10⁶ · hits / k).
    - ``ndcg_ppm`` = half-up(10⁶ · DCG@k / IDCG@k) with the shared integer
      discounts; IDCG uses min(n_rel, k) ideal slots; 0 when n_rel = 0.

    Queries absent from the run are absent from the output (score a
    zero-result query by unioning an empty run row upstream)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    r = run.select(
        F.col(query_col).alias("__q"),
        F.col(doc_col).alias("__d"),
        F.col(rank_col).cast("long").alias("__rank"),
    )
    rel = qrels.select(
        F.col(query_col).alias("__q"),
        F.col(doc_col).alias("__d"),
        F.lit(1).cast("long").alias("__rel"),
    )
    joined = r.join(rel, ["__q", "__d"], "left").fillna({"__rel": 0})
    disc = _disc_case("__rank", k)
    per_q = joined.groupBy("__q").agg(
        F.sum("__rel").alias("hits"),
        F.min(F.when(F.col("__rel") == 1, F.col("__rank"))).alias("__first"),
        F.sum(F.expr(f"__rel * {disc}")).alias("__dcg"),
    )
    n_rel = qrels.groupBy(F.col(query_col).alias("__q")).agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    ideal = _ideal_case(f"least(n_rel, {k})", k)
    return (
        per_q.join(n_rel, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            F.coalesce("n_rel", F.lit(0).cast("long")).alias("n_rel"),
            "hits",
            F.expr("coalesce(1000000 div __first, 0L)").alias("rr_ppm"),
            F.expr(
                f"(cast(hits as decimal(38,0)) * 2000000 + {k})"
                f" div (cast({k} as decimal(38,0)) * 2)"
            ).alias("prec_ppm"),
            F.expr(
                f"CASE WHEN coalesce({ideal}, 0) = 0 THEN 0L ELSE"
                f" (cast(__dcg as decimal(38,0)) * 2000000 + {ideal})"
                f" div (cast({ideal} as decimal(38,0)) * 2) END"
            ).alias("ndcg_ppm"),
        )
    )


def ranking_metrics_oracle_sql(
    run_sql: str,
    qrels_sql: str,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> str:
    """DuckDB replay of :func:`ranking_metrics` — same literal discount /
    ideal CASE tables (single python source), same truncating (``//`` ≡
    ``div`` on positive operands) and half-up integer arithmetic."""
    disc = _disc_case("rank", k)
    ideal = _ideal_case(f"least(n_rel, {k})", k)
    return f"""
WITH run AS (
  SELECT {query_col} AS q, {doc_col} AS d, CAST({rank_col} AS BIGINT) AS rank
  FROM ({run_sql})
),
rel AS (SELECT {query_col} AS q, {doc_col} AS d, 1 AS r FROM ({qrels_sql})),
j AS (
  SELECT run.q, run.rank, coalesce(rel.r, 0) AS r
  FROM run LEFT JOIN rel ON run.q = rel.q AND run.d = rel.d
),
per_q AS (
  SELECT q, CAST(sum(r) AS BIGINT) AS hits,
         min(CASE WHEN r = 1 THEN rank END) AS first_rel,
         CAST(sum(r * {disc}) AS BIGINT) AS dcg
  FROM j GROUP BY q
),
nr AS (SELECT q, count(*) AS n_rel FROM rel GROUP BY q)
SELECT per_q.q AS {query_col},
       coalesce(nr.n_rel, 0) AS n_rel,
       hits,
       CAST(coalesce(1000000 // first_rel, 0) AS BIGINT) AS rr_ppm,
       CAST((CAST(hits AS HUGEINT) * 2000000 + {k})
            // (CAST({k} AS HUGEINT) * 2) AS BIGINT) AS prec_ppm,
       CAST(CASE WHEN coalesce({ideal}, 0) = 0 THEN 0 ELSE
            (CAST(dcg AS HUGEINT) * 2000000 + {ideal})
            // (CAST({ideal} AS HUGEINT) * 2) END AS BIGINT) AS ndcg_ppm
FROM per_q LEFT JOIN nr ON per_q.q = nr.q
"""
