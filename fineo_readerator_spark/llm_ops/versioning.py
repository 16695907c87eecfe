"""Corpus snapshot management: row-level diff between two corpus versions.

A 100 TB training corpus is rebuilt (recrawled, refiltered, rededuped) on a
cadence; before a new snapshot replaces the old one, the pipeline wants a
membership-and-content diff — how many documents appeared, vanished, or
changed, broken down by source — both as a release gate (a source that lost
90 % of its docs is a scraper regression, not a cleaning win) and as the
changelog for dataset cards.  ``p_corpus_drift`` (PSI over feature
distributions) answers "did the *shape* move"; this answers "which *rows*
moved".

Scale shape: one full outer join on the document id (hash-partitioned on
both sides — the natural key join AQE handles well), content compared via a
64-bit text hash computed in the scan projection so the shuffle carries
(id, source, hash), never the text payload; the per-source rollup is a
map-side-combined aggregate over the join output.  No broadcast of anything
corpus-sized, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-``group_col`` membership/content diff between two corpus versions.

    Returns one row per group: ``n_added`` (id only in ``new``),
    ``n_removed`` (id only in ``old``), ``n_changed`` (id in both, text
    differs), ``n_unchanged``.  A changed row's group comes from the NEW
    version (reassignment counts as a change in its new home, matching how
    the next snapshot will report it)."""
    o = old.select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("__g_old"),
        F.xxhash64(F.col(text_col)).alias("__h_old"),
    )
    n = new.select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("__g_new"),
        F.xxhash64(F.col(text_col)).alias("__h_new"),
    )
    j = o.join(n, "__id", "full_outer")
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            F.coalesce(F.col("__g_new"), F.col("__g_old")).alias(group_col),
            status.alias("__st"),
        )
        .groupBy(group_col)
        .agg(
            F.count(F.when(F.col("__st") == "added", True)).alias("n_added"),
            F.count(F.when(F.col("__st") == "removed", True)).alias("n_removed"),
            F.count(F.when(F.col("__st") == "changed", True)).alias("n_changed"),
            F.count(F.when(F.col("__st") == "unchanged", True)).alias("n_unchanged"),
        )
        .orderBy(group_col)
    )


def corpus_diff_oracle_sql(
    old_sql: str,
    new_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> str:
    """DuckDB replay of :func:`corpus_diff` over two corpus SELECTs.

    Text equality is compared via ``md5`` rather than Spark's xxhash64 —
    both sides are pure content-equality predicates, so any collision-free
    hash yields identical statuses.  Row presence is a dedicated flag, NOT
    the hash: ``md5(NULL)`` is NULL, so using the hash as the presence
    marker would misread a NULL-text row as an absent row (Spark's
    xxhash64 never returns NULL, so the operator has no such ambiguity);
    ``IS DISTINCT FROM`` then matches the operator's null-safe
    got-different-content semantics for present-on-both-sides rows."""
    return f"""
WITH __o AS (SELECT {id_col} AS id, {group_col} AS g, md5({text_col}) AS h, TRUE AS p
             FROM ({old_sql})),
__n AS (SELECT {id_col} AS id, {group_col} AS g, md5({text_col}) AS h, TRUE AS p
             FROM ({new_sql})),
__j AS (
  SELECT coalesce(__n.g, __o.g) AS g,
         CASE WHEN __o.p IS NULL THEN 'added'
              WHEN __n.p IS NULL THEN 'removed'
              WHEN __o.h IS DISTINCT FROM __n.h THEN 'changed'
              ELSE 'unchanged' END AS st
  FROM __o FULL OUTER JOIN __n ON __o.id = __n.id
)
SELECT g AS {group_col},
       count(*) FILTER (st = 'added') AS n_added,
       count(*) FILTER (st = 'removed') AS n_removed,
       count(*) FILTER (st = 'changed') AS n_changed,
       count(*) FILTER (st = 'unchanged') AS n_unchanged
FROM __j GROUP BY g ORDER BY g
"""

def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    id_col: str = "doc_id",
    op_col: str = "op",
    seq_col: str | None = None,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """CDC MERGE: materialize the next corpus snapshot from the current one
    plus a change batch — the lakehouse upsert shape (Delta/Iceberg MERGE
    INTO) as plain DataFrame ops, for engines that maintain snapshots as
    immutable parquet generations (this repo's layout convention).

    ``changes`` rows carry ``op`` ∈ {'insert', 'update', 'delete'} plus the
    payload columns; insert-of-existing and update-of-missing both behave
    as upsert (MERGE's WHEN MATCHED/NOT MATCHED collapse — CDC feeds are
    rarely clean enough to trust the distinction).  With ``seq_col``,
    multiple changes per id resolve LATEST-WINS before applying (ties:
    lowest op string, so a same-seq delete beats an update
    deterministically); without it the batch must be unique per id.
    INVALID rows — NULL id, or an op outside the three — are dropped
    (ignored) by both the operator and its oracle: the alternative is
    engine-dependent three-valued-logic fates for dirty feed rows.

    Scale shape: latest-wins is one WindowGroupLimit shuffle over the
    CHANGE BATCH (daily delta, ≪ base); the merge itself is a single
    id-keyed full outer join — AQE broadcasts the change side when small;
    the base is scanned once and never shuffled beyond the join.  No
    collect, no driver loop."""
    payload_cols = payload_cols or [c for c in base.columns if c != id_col]
    # drop INVALID change rows (NULL id, NULL/unknown op) explicitly: the
    # three-valued-logic fate of such rows otherwise differs between the
    # delete filter here and the oracle's WHERE clause — a dirty CDC feed
    # must have ONE defined, cross-engine-identical semantics (ignored)
    changes = changes.filter(
        F.col(id_col).isNotNull()
        & F.col(op_col).isin("insert", "update", "delete")
    )
    if seq_col is None:
        ch = changes.select(
            F.col(id_col).alias("__cid"), F.col(op_col).alias("__op"), *payload_cols
        )
    else:
        from pyspark.sql.window import Window

        # total order: payload columns break (seq, op) ties so even a feed
        # with duplicate (id, seq, op) rows resolves identically on every
        # run and every engine (row_number over a partial order is
        # arbitrary within ties)
        w = Window.partitionBy("__cid").orderBy(
            F.col("__seq").desc(),
            F.col("__op").asc(),
            *[F.col(c).asc_nulls_first() for c in payload_cols],
        )
        ch = (
            changes.select(
                F.col(id_col).alias("__cid"),
                F.col(op_col).alias("__op"),
                F.col(seq_col).alias("__seq"),
                *payload_cols,
            )
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__seq")
        )
    b = base.select(F.col(id_col).alias("__bid"), *[F.col(c).alias(f"__b_{c}") for c in payload_cols])
    j = b.join(ch, F.col("__bid") == F.col("__cid"), "full_outer")
    has_change = F.col("__cid").isNotNull()
    merged = j.filter(~(has_change & (F.col("__op") == "delete"))).select(
        F.coalesce(F.col("__cid"), F.col("__bid")).alias(id_col),
        *[
            F.when(has_change, F.col(c)).otherwise(F.col(f"__b_{c}")).alias(c)
            for c in payload_cols
        ],
    )
    return merged


def apply_changes_oracle_sql(
    base_sql: str,
    changes_sql: str,
    id_col: str = "doc_id",
    op_col: str = "op",
    seq_col: str | None = None,
    payload_cols: list[str] = ("text",),
) -> str:
    """DuckDB replay of :func:`apply_changes` (same latest-wins rule, same
    upsert/delete semantics, presence via the non-null change id)."""
    pcols = list(payload_cols)
    valid = (
        f"SELECT * FROM ({changes_sql}) WHERE {id_col} IS NOT NULL"
        f" AND {op_col} IN ('insert', 'update', 'delete')"
    )
    changes_sql = valid
    latest = f"SELECT {id_col} AS cid, {op_col} AS op, {', '.join(pcols)} FROM ({changes_sql})"
    if seq_col is not None:
        latest = f"""
SELECT cid, op, {', '.join(pcols)} FROM (
  SELECT {id_col} AS cid, {op_col} AS op, {', '.join(pcols)},
         row_number() OVER (PARTITION BY {id_col}
                            ORDER BY {seq_col} DESC, {op_col} ASC,
                                     {', '.join(f'{p} ASC NULLS FIRST' for p in pcols)}) AS rn
  FROM ({changes_sql})
) WHERE rn = 1"""
    sel = ", ".join(
        f"CASE WHEN c.cid IS NOT NULL THEN c.{p} ELSE b.{p} END AS {p}" for p in pcols
    )
    return f"""
WITH __b AS (SELECT {id_col} AS bid, {', '.join(pcols)} FROM ({base_sql})),
__c AS ({latest})
SELECT coalesce(c.cid, b.bid) AS {id_col}, {sel}
FROM __b b FULL OUTER JOIN __c c ON b.bid = c.cid
WHERE c.op IS NULL OR c.op != 'delete'
"""
