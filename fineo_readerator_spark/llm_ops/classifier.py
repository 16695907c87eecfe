"""In-engine linear quality classifier: full-batch logistic regression
trained BY the engine over row-local features — the CCNet/LLaMA pipeline
step that distills an expensive quality gate (run on a labeled slice) into
a cheap scorer applied to the whole corpus.

Scale shape (the second iterative-distributed-algorithm family in this
repo, next to :func:`~fineo_readerator_spark.llm_ops.similarity.
kmeans_refine`): each iteration is ONE map-side-combined aggregate whose
output is K+1 numbers (the gradient) — model-sized driver state, exactly
how distributed ML frameworks run GD; the corpus streams through a
codegen'd sigmoid projection and never shuffles at all (a gradient
aggregate has no keys).  Feature engineering stays in the scan projection,
so at 100 TB the cost is n_iters + 1 corpus scans and nothing else.

Cross-engine determinism (what makes the training ORACLE-CHECKABLE, which
off-the-shelf trainers are not): per-row gradient terms round at 1e-12 and
sum as exact decimals, so partial-aggregation order can't perturb the
gradient; the weight update ``w - lr * (S / n)`` is the same IEEE double
expression on both engines; weights stay UNROUNDED (their inputs are
already identical), and only the emitted score rounds (1e-6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_TERM_DECIMAL = "decimal(26,12)"


def _z_expr(feature_cols: list[str], weights: list[float]) -> Column:
    """The linear term ``w0 + Σ wj·xj`` with literal weights, left-assoc in
    feature order — the oracle writes the identical association so the
    doubles match bit-for-bit."""
    if len(weights) != len(feature_cols) + 1:
        raise ValueError(
            f"need {len(feature_cols) + 1} weights (bias first) for "
            f"{len(feature_cols)} features, got {len(weights)}"
        )
    z = F.lit(float(weights[0]))
    for w, c in zip(weights[1:], feature_cols):
        z = z + F.lit(float(w)) * F.col(c).cast("double")
    return z


def train_logistic(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_iters: int = 3,
    lr: float = 1.0,
) -> list[float]:
    """Fit logistic-regression weights (bias first) by ``n_iters`` rounds of
    full-batch gradient descent from zero init.  ``label_col`` must be
    boolean/0-1; rows with a NULL label or NULL feature are EXCLUDED (they
    would poison the gradient sums with NULL on one engine and 0 on
    another)."""
    if not feature_cols:
        # keep the supported domain aligned with logistic_oracle_sql, whose
        # rankable conjunction can't express a bias-only model
        raise ValueError("train_logistic: need at least one feature column")
    cond = F.col(label_col).isNotNull()
    for c in feature_cols:
        cond = cond & F.col(c).isNotNull()
    df = df.filter(cond)
    k = len(feature_cols)
    weights = [0.0] * (k + 1)
    y = F.col(label_col).cast("double")
    for _ in range(n_iters):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z_expr(feature_cols, weights)))
        resid = p - y
        aggs = [F.count(F.lit(1)).alias("n")]
        terms = [resid] + [resid * F.col(c).cast("double") for c in feature_cols]
        for j, t in enumerate(terms):
            aggs.append(F.sum(F.round(t, 12).cast(_TERM_DECIMAL)).alias(f"s{j}"))
        row = df.agg(*aggs).collect()[0]
        n = row["n"]
        if n == 0:
            raise ValueError("train_logistic: no rows with non-NULL label+features")
        weights = [
            weights[j] - lr * (float(row[f"s{j}"]) / n) for j in range(k + 1)
        ]
    return weights


def score_logistic(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    score_col: str = "score",
    pred_col: str = "pred",
    round_digits: int = 6,
) -> DataFrame:
    """Apply trained weights: appends the sigmoid score (rounded) and the
    0.5-threshold prediction — one codegen'd projection, no shuffle."""
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z_expr(feature_cols, weights)))
    return df.withColumns(
        {
            score_col: F.round(p, round_digits),
            pred_col: F.round(p, round_digits) >= 0.5,
        }
    )


def logistic_oracle_sql(
    feats_sql: str,
    feature_exprs: list[str],
    label_expr: str,
    id_expr: str = "doc_id",
    n_iters: int = 3,
    lr: float = 1.0,
    round_digits: int = 6,
    emit_label: bool = False,
) -> str:
    """DuckDB replay of train-then-score, fully unrolled: ``feats_sql``
    yields one row per example; ``feature_exprs``/``label_expr`` are column
    names (or expressions) over it.  Each iteration CTE computes the SAME
    rounded-then-decimal-summed gradient and the SAME double-arithmetic
    update, so the two engines walk identical weight vectors."""
    k = len(feature_exprs)
    if k == 0:
        # mirrors train_logistic's guard: with zero features the rankable
        # conjunction below would emit `y IS NOT NULL AND ` — invalid SQL
        raise ValueError("logistic_oracle_sql: need at least one feature expr")
    xcols = ", ".join(f"{e} AS x{j}" for j, e in enumerate(feature_exprs, start=1))
    # the NULL filter gates TRAINING only; scoring covers every input row
    # (NULL feature → NULL score/pred on both engines), matching
    # score_logistic over the unfiltered frame
    rankable = f"y IS NOT NULL AND " + " AND ".join(
        f"x{j} IS NOT NULL" for j in range(1, k + 1)
    )
    parts = [
        f"feats AS (SELECT {id_expr} AS id, {xcols},"
        f" CAST(CASE WHEN {label_expr} IS NULL THEN NULL"
        f" WHEN {label_expr} THEN 1 ELSE 0 END AS DOUBLE) AS y"
        f" FROM ({feats_sql}))",
        f"train AS (SELECT * FROM feats WHERE {rankable})",
        "w0 AS (SELECT " + ", ".join(f"0.0 AS w{j}" for j in range(k + 1)) + ")",
    ]

    def z(walias: str) -> str:
        out = f"{walias}.w0"
        for j in range(1, k + 1):
            out = f"{out} + {walias}.w{j} * CAST(f.x{j} AS DOUBLE)"
        return out

    for t in range(n_iters):
        sums = ["count(*) AS n", "sum(CAST(round(p - y, 12) AS DECIMAL(26,12))) AS s0"]
        for j in range(1, k + 1):
            sums.append(
                f"sum(CAST(round((p - y) * CAST(x{j} AS DOUBLE), 12)"
                f" AS DECIMAL(26,12))) AS s{j}"
            )
        parts.append(
            f"""g{t} AS (
  SELECT {', '.join(sums)}
  FROM (SELECT f.*, 1.0 / (1.0 + exp(-({z('w')}))) AS p FROM train f, w{t} w)
)"""
        )
        upd = ", ".join(
            f"w.w{j} - {float(lr)!r} * (CAST(g.s{j} AS DOUBLE) / g.n) AS w{j}"
            for j in range(k + 1)
        )
        parts.append(f"w{t + 1} AS (SELECT {upd} FROM w{t} w, g{t} g)")
    lab_out = ", y" if emit_label else ""
    lab_in = ", f.y" if emit_label else ""
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT id AS {id_expr}, score, score >= 0.5 AS pred{lab_out} FROM (
  SELECT f.id, round(1.0 / (1.0 + exp(-({z('w')}))), {round_digits}) AS score{lab_in}
  FROM feats f, w{n_iters} w
)"""
    )


def calibration_table(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability table for a probabilistic scorer: equal-width score bins
    × (count, positives, half-up ppm positive rate) — a well-calibrated
    model's pos_rate tracks its bin midpoint; the drift between them is
    what decides whether the 0.5 threshold (or any quality cutoff) means
    what it claims.  The eval that closes the train → score → TRUST loop.

    Rows with a NULL score or label are excluded (unscorable/unlabeled
    rows calibrate nothing).  bin = least(n_bins−1, floor(score·n_bins)):
    floor on the identically-rounded score double, so both engines bin
    identically; output is n_bins rows, the aggregate map-side-combined."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int").cast("long")
    binned = df.filter(s.isNotNull() & y.isNotNull()).select(
        F.least(F.lit(n_bins - 1).cast("long"), F.floor(s * n_bins)).alias("bin"),
        y.alias("__y"),
    )
    return (
        binned.groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("__y").alias("n_pos"))
        .select(
            "bin",
            "n",
            "n_pos",
            F.expr(
                "(cast(n_pos as decimal(38,0)) * 2000000 + n)"
                " div (cast(n as decimal(38,0)) * 2)"
            ).alias("pos_rate_ppm"),
        )
    )


def calibration_oracle_sql(
    scored_sql: str,
    score_col: str = "score",
    label_col: str = "y",
    n_bins: int = 10,
) -> str:
    """DuckDB replay of :func:`calibration_table` over a scored subquery."""
    return f"""
WITH binned AS (
  SELECT least({n_bins - 1}, CAST(floor({score_col} * {n_bins}) AS BIGINT)) AS bin,
         CAST(CAST({label_col} AS INT) AS BIGINT) AS y
  FROM ({scored_sql})
  WHERE {score_col} IS NOT NULL AND {label_col} IS NOT NULL
)
SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
       CAST((CAST(sum(y) AS HUGEINT) * 2000000 + count(*))
            // (CAST(count(*) AS HUGEINT) * 2) AS BIGINT) AS pos_rate_ppm
FROM binned GROUP BY bin
"""
