"""Lexical retrieval over the document corpus: BM25 top-k.

The training-data-pipeline face of search: find the corpus documents most
relevant to a query (inspect near-matches of a benchmark prompt, pull
exemplars for a category, audit what the corpus says about a topic).  The
plan is the inverted-index shape re-expressed relationally — postings are
(term, doc, tf) rows, the query is a literal term list, and scoring is one
aggregation — so Catalyst executes it like any other equi-join pipeline:

- tokenization + postings: one corpus scan, explode + hash aggregate
  (map-side combined, whole-stage codegen);
- the query-term filter applies BEFORE the per-doc fold, so the shuffle
  carries only postings of the queried terms (at web scale: |docs matching
  any query term|, not the corpus);
- corpus stats (N, avg doc length) and per-term document frequencies are
  metadata-sized — broadcast;
- top-k is a TakeOrdered, never a full sort.

Determinism: tf/df/lengths are exact integers; the only floating-point is
the final idf·tf blend, rounded to 6 decimals (sub-ulp engine differences
in ``ln`` vanish), with doc_id as the total tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fineo_readerator_spark.llm_ops.textstats import tokens


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25 score for a bag of query terms.

    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))``
    with ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))`` — the
    Robertson/Sparck-Jones variant Lucene uses (always positive).

    Scoring needs |d| of every MATCHING doc and corpus-level N/avgdl; both
    come from one token-length projection of the corpus — no second
    tokenize pass.  Query terms are matched lowercase-exact (the corpus
    tokenizer's normalization)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})

    base = df.select(
        F.col(id_col).alias("__id"), tokens(F.lower(F.col(text_col))).alias("__t")
    ).withColumn("__dl", F.size("__t"))
    lens = base.select("__id", "__dl").filter(F.col("__dl") > 0)
    # corpus stats: one row (broadcast) — exact integers
    stats = lens.agg(
        F.count("*").alias("__n"), F.sum("__dl").alias("__sumdl")
    )
    # postings for the QUERY TERMS only: the explode feeds a filter that
    # Catalyst pushes below the aggregation, so the (id, term) shuffle
    # carries matching postings, not the corpus
    postings = (
        base.select("__id", "__dl", F.explode("__t").alias("__term"))
        .filter(F.col("__term").isin(terms))
        .groupBy("__id", "__dl", "__term")
        .agg(F.count("*").alias("__tf"))
    )
    # per-term document frequency: ≤ |query terms| rows — broadcast
    dfreq = postings.groupBy("__term").agg(F.count("*").alias("__df"))
    one = F.lit(1.0)
    idf = F.log(
        one + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf_norm = (
        F.col("__tf")
        * (k1 + 1)
        / (
            F.col("__tf")
            + k1 * (1 - b + b * F.col("__dl") / (F.col("__sumdl") / F.col("__n")))
        )
    )
    scored = (
        postings.join(F.broadcast(dfreq), ["__term"])
        .crossJoin(F.broadcast(stats))
        .withColumn("__s", idf * tf_norm)
        .groupBy("__id")
        .agg(
            F.round(F.sum("__s"), 6).alias("score"),
            F.count("*").alias("n_terms_matched"),
        )
    )
    return (
        scored.select(
            F.col("__id").alias(id_col), "score", "n_terms_matched"
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bm25_oracle_sql(
    table: str,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    terms = sorted({t.lower() for t in query_terms})
    # SQL-escape embedded quotes: the Spark side's isin handles them
    # natively, so an unescaped oracle would diverge (or break) on terms
    # like "o'brien"
    tlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    toks = (
        f"list_filter(regexp_split_to_array(trim(lower({text_col})), '\\s+'),"
        " x -> length(x) > 0)"
    )
    return f"""
WITH base AS (SELECT {id_col} AS id, {toks} AS t FROM {table}),
lens AS (SELECT id, len(t) AS dl FROM base WHERE len(t) > 0),
stats AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM lens),
postings AS (
  SELECT id, dl, term, count(*) AS tf
  FROM (SELECT id, len(t) AS dl, unnest(t) AS term FROM base)
  WHERE term IN ({tlist})
  GROUP BY 1, 2, 3
),
dfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY term)
SELECT id AS {id_col},
       round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                 * tf * ({k1} + 1)
                 / (tf + {k1} * (1 - {b} + {b} * dl / (sumdl * 1.0 / n)))), 6) AS score,
       count(*) AS n_terms_matched
FROM postings JOIN dfreq USING (term) CROSS JOIN stats
GROUP BY id
ORDER BY score DESC, {id_col} ASC
LIMIT {k}
"""
