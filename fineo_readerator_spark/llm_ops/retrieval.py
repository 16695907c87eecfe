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
    tokenizer's normalization).

    The corpus-stats branch deliberately re-tokenizes (two corpus passes
    total): it needs ALL docs while scoring needs only matching docs, so
    sharing one pass requires materializing per-doc state — the lineage
    cut measured as a local regression (r11), and the zero-shuffle
    row-local projection of per-term tfs measured WORSE twice: via
    higher-order ``filter()`` (CodegenFallback, r11, ~+0.2 s) and via
    ``size − size(array_remove)`` (r12: +37% on t_bm25_topk, +12% on
    t_hybrid_rrf, idle A/B min-of-3) — the explode+isin postings path
    stays."""
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
    # per-term document frequency as a WINDOW over the aggregated postings
    # instead of a groupBy branch + broadcast join: the dfreq branch would
    # re-evaluate the whole scan→tokenize→explode subtree (AQE exchange
    # reuse cannot fire — the branches prune different columns), so this
    # turns three corpus tokenize passes into two; the window's (term)
    # exchange carries only the matching postings (r11 optimization round)
    from pyspark.sql.window import Window

    postings = postings.withColumn(
        "__df", F.count(F.lit(1)).over(Window.partitionBy("__term"))
    )
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
        postings.crossJoin(F.broadcast(stats))
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

def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_vec: list[float],
    k: int = 10,
    c: int = 60,
    shortlist: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid retrieval: BM25 and embedding-cosine rankings fused by
    Reciprocal Rank Fusion — ``rrf(d) = Σ_channel 1/(c + rank_channel(d))``
    over each channel's top-``shortlist``; documents missing from a channel
    contribute nothing for it.  RRF is the standard score-free fusion (no
    cross-channel score calibration needed, robust to either channel's score
    scale) and the usual first stop before a learned reranker.

    Scale shape: each channel runs its own top-``shortlist`` retrieval —
    BM25 touches only postings of the query terms, cosine is a TakeOrdered
    over the vector store (swap in the IVF/PQ operators for the at-scale
    variant; fusion is agnostic to how a channel ranked).  Fusion itself
    handles 2·``shortlist`` rows: the rank windows and the outer join are
    metadata-sized no matter the corpus.

    Determinism: ranks are exact integers; ``1/(c+rank)`` and the two-term
    sum are correctly-rounded IEEE doubles, identical in both engines;
    ``id_col`` breaks final ties."""
    from pyspark.sql.window import Window

    lex = bm25_topk(docs, query_terms, id_col, text_col, shortlist)
    # single-partition windows: inputs are exactly `shortlist` rows
    lex_ranked = lex.withColumn(
        "lex_rank",
        F.row_number().over(Window.orderBy(F.desc("score"), F.col(id_col))),
    ).select(F.col(id_col).alias("__id"), "lex_rank")

    from fineo_readerator_spark.llm_ops.similarity import cosine_topk

    sem = cosine_topk(emb, query_vec, shortlist, vec_id_col, vec_col)
    sem_ranked = sem.withColumn(
        "cos_rank",
        F.row_number().over(Window.orderBy(F.desc("cos_sim"), F.col(vec_id_col))),
    ).select(F.col(vec_id_col).alias("__id"), "cos_rank")

    fused = lex_ranked.join(sem_ranked, "__id", "full_outer")
    rrf = F.round(
        F.coalesce(1.0 / (F.col("lex_rank") + F.lit(c)), F.lit(0.0))
        + F.coalesce(1.0 / (F.col("cos_rank") + F.lit(c)), F.lit(0.0)),
        9,
    )
    return (
        fused.select(
            F.col("__id").alias(id_col),
            F.col("lex_rank").cast("int").alias("lex_rank"),
            F.col("cos_rank").cast("int").alias("cos_rank"),
            rrf.alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.col(id_col))
        .limit(k)
    )


def hybrid_rrf_oracle_sql(
    doc_table: str,
    emb_table: str,
    query_terms: list[str],
    query_vec_sql: str,
    k: int = 10,
    c: int = 60,
    shortlist: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB replay of :func:`hybrid_rrf_topk`.  ``doc_table``/``emb_table``
    may be any table expression (including a parenthesized subquery);
    ``query_vec_sql`` is a scalar subquery yielding the query vector."""
    from fineo_readerator_spark.llm_ops.similarity import COSINE_SQL

    bm25 = bm25_oracle_sql(doc_table, query_terms, id_col, text_col, shortlist)
    cos = COSINE_SQL.format(a=f"e.{vec_col}", b="q.qv")
    return f"""
WITH __lex AS (
  SELECT {id_col} AS id,
         row_number() OVER (ORDER BY score DESC, {id_col}) AS lex_rank
  FROM ({bm25})
),
__q AS (SELECT ({query_vec_sql}) AS qv),
__sem AS (
  SELECT id, cos_rank FROM (
    SELECT e.{vec_id_col} AS id, {cos} AS cos_sim,
           row_number() OVER (ORDER BY {cos} DESC, e.{vec_id_col}) AS cos_rank
    FROM {emb_table} e CROSS JOIN __q q
  ) ORDER BY cos_rank LIMIT {shortlist}
)
SELECT id AS {id_col},
       CAST(lex_rank AS INT) AS lex_rank,
       CAST(cos_rank AS INT) AS cos_rank,
       round(coalesce(CAST(1.0 AS DOUBLE) / (lex_rank + {c}), 0.0)
             + coalesce(CAST(1.0 AS DOUBLE) / (cos_rank + {c}), 0.0), 9) AS rrf_score
FROM __lex FULL OUTER JOIN __sem USING (id)
ORDER BY rrf_score DESC, {id_col} LIMIT {k}
"""

def _cap_vocab(dfreq: DataFrame, min_df: int, max_vocab: int | None) -> DataFrame:
    """Bound a per-term document-frequency table: drop sub-``min_df`` terms,
    then keep the top-``max_vocab`` by (df DESC, term ASC).  The cap is an
    orderBy+limit — TakeOrdered per-partition heaps, NEVER a global
    single-partition window over the vocabulary."""
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df}")
    if min_df > 1:
        dfreq = dfreq.filter(F.col("__df") >= min_df)
    if max_vocab is not None:
        if max_vocab < 1:
            raise ValueError(f"max_vocab must be >= 1, got {max_vocab}")
        dfreq = dfreq.orderBy(F.desc("__df"), F.asc("__term")).limit(max_vocab)
    return dfreq


def _maybe_broadcast(dfreq: DataFrame, min_df: int, max_vocab: int | None) -> DataFrame:
    """Broadcast the df table only when a HARD vocabulary bound is in force
    — that means ``max_vocab`` alone: ``min_df`` merely drops sub-threshold
    terms and the remainder is still O(|vocabulary|) rows at corpus scale,
    so forcing a broadcast on it is the same driver-OOM hazard as the
    unbounded case (r9 review).  Everything unbounded is left to AQE's
    measured sizes (r8 verdict)."""
    return F.broadcast(dfreq) if max_vocab is not None else dfreq


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_cols: list[str] | None = None,
    threshold: float = 0.6,
    idf_scale: int = 1_000_000,
    allow_ungrouped: bool = False,
    min_df: int = 1,
    max_vocab: int | None = None,
) -> DataFrame:
    """Weighted near-duplicate pairs: TF-IDF cosine similarity >= threshold
    within blocking groups — the sparse-vector complement to MinHash (which
    scores SET overlap and under-weights rare-term agreement; TF-IDF cosine
    is what "similar" means to a lexical ranker).

    ``min_df`` drops terms in fewer than that many documents (hapax terms
    are most of a web-scale vocabulary and carry no pair signal — a doc
    pair needs a SHARED term, so df=1 terms can never produce a candidate
    and min_df=2 is pure win); ``max_vocab`` keeps only the top-V terms by
    (df DESC, term ASC).  Both shrink the postings join AND bound the df
    side-table: with a bound in force it is broadcast (genuinely
    metadata-sized); UNBOUNDED (the defaults) the df table is
    vocabulary-sized — unbounded at corpus scale — so no broadcast is
    forced and AQE picks the join strategy from measured sizes.

    IDF is corpus-global (one df aggregate); PAIR GENERATION is group-bounded
    like ``ngram_jaccard_pairs`` — the postings self-join explodes as
    O(df²) per term corpus-wide, so an ungrouped call raises unless
    explicitly allowed (at scale the groups are LSH buckets or domains).

    Determinism across engines — the usual float-sum-order trap, solved by
    integer-exact arithmetic end to end: idf quantizes to an integer
    (``round(ln((N+1)/(df+1)) * idf_scale)`` — ln agrees to 1 ulp between
    engines, 12 orders below the quantum), weights ``tf·idf_int`` and their
    squared norms / dot products are exact integer sums (decimal-typed so
    38-digit headroom, order-independent), and only the FINAL cosine
    divides in double, rounded at 1e-6.

    Scale shape: one tokenize pass; tf and df are map-side-combined
    aggregates; norms are one more per-doc aggregate; the join shuffles
    postings on (group, term).  Everything is codegen'd JVM expressions.

    A prefix-filtered candidate cut (AllPairs/PPJoin, Bayardo et al. 2007
    — index only each doc's (df ASC, term ASC)-ordered prefix where the
    inclusive tail Σw² ≥ threshold²·‖w‖², verify candidates exactly) was
    implemented and MEASURED AS A REJECTION in the r12 optimization round:
    on this corpus the vocabulary is small and per-doc weights near-
    uniform, so prefixes hold 61.7% of postings and prune only 3.4% of
    distinct candidate pairs (159286 → 153920 at sf0.1) while adding a
    per-doc window pass, a pair dedup and two verification joins — idle
    A/B min-of-3: 2.313 → 3.259 s (+41%).  Results were byte-identical
    (oracle MATCH); the shape only pays on zipfian vocabularies where
    common terms dominate df² and carry low weight."""
    if not group_cols and not allow_ungrouped:
        raise ValueError(
            "tfidf_cosine_pairs without group_cols is an O(df^2)-per-term "
            "corpus-wide self-join; pass blocking group_cols (domain, LSH "
            "bucket, ...) or allow_ungrouped=True to accept the cost"
        )
    group_cols = group_cols or []

    from fineo_readerator_spark.llm_ops.dedup import _spread

    base = df.select(
        F.col(id_col).alias("__id"),
        *[F.col(c) for c in group_cols],
        tokens(F.col(text_col)).alias("__t"),
    ).filter(F.size("__t") > 0)
    # checkpoint the tf table: it feeds dfreq, n_docs (via base) and all
    # THREE weighted projections below — without the lineage cut Catalyst
    # re-evaluates the tokenize+explode+aggregate subtree once per consumer
    # (measured 12 input scans per query), the span-overlap lesson again
    tf = (
        base.select("__id", *group_cols, F.explode("__t").alias("__term"))
        .groupBy("__id", *group_cols, "__term")
        .agg(F.count("*").alias("__tf"))
    ).localCheckpoint(eager=False)
    n_docs = tf.select("__id").distinct().agg(F.count(F.lit(1)).alias("__n"))
    dfreq = tf.groupBy("__term").agg(F.count("*").alias("__df"))
    dfreq = _cap_vocab(dfreq, min_df, max_vocab)
    idf_int = F.round(
        F.log((F.col("__n") + 1.0) / (F.col("__df") + 1.0)) * idf_scale, 0
    ).cast("decimal(20,0)")
    # checkpointed for the same reason: three consumers (norms, both join
    # sides) would each redo the idf join
    # _spread ONLY this checkpoint (measured, r11 optimization round): the
    # postings self-join below reads `weighted` twice and ran 3.3 s of CPU
    # over the 2 partitions AQE left here; spreading to core width on local
    # masters parallelizes that dominant stage.  Spreading `base`/`tf` as
    # well was a measured wash — their stages are ~0.3 s of CPU, below the
    # 32-task stage-overhead floor.  No-op on clusters (wide frames).
    weighted = _spread(
        tf.join(_maybe_broadcast(dfreq, min_df, max_vocab), "__term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "__id",
            *group_cols,
            "__term",
            (F.col("__tf").cast("decimal(20,0)") * idf_int).alias("__w"),
        )
    ).localCheckpoint(eager=False)
    # docs whose every term is corpus-universal (idf quantizes to 0) have a
    # zero norm; their cosine is 0/0 = NaN, which BOTH engines order above
    # the threshold — exclude them as unscorable instead.  Grouping by
    # (__id, group) is value-identical to (__id): a doc id carries exactly
    # one group (group_cols are attributes of the doc row — the same
    # uniqueness the id_a < id_b pairing already assumes), so the extra
    # keys split nothing; they ride along here so the PAIR aggregation
    # below never has to carry them.
    norms = (
        weighted.groupBy("__id", *group_cols)
        .agg(F.sum(F.col("__w") * F.col("__w")).alias("__norm2"))
        .filter(F.col("__norm2") > 0)
    )
    wa = weighted.select(
        *group_cols, F.col("__term"), F.col("__id").alias("id_a"), F.col("__w").alias("__wa")
    )
    wb = weighted.select(
        *group_cols, F.col("__term"), F.col("__id").alias("id_b"), F.col("__w").alias("__wb")
    )
    # the pair aggregation groups by (id_a, id_b) ONLY: every join row of a
    # given pair shares one group value (the join equi-keys include the
    # group and id_a determines it), so adding group_cols to the keys splits
    # nothing — it only widens the biggest exchange of the operator (the
    # partial-aggregated pair frame, measured 56 MB at sf0.1 with the group
    # strings vs 42 MB without) and makes every map-side hash/compare pay
    # string work per pair row (guide §2.3: shuffle keys, not payloads).
    # The group is re-attached from the id_a norm row below, for free.
    dots = (
        wa.join(wb, [*group_cols, "__term"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("__wa") * F.col("__wb")).alias("__dot"))
    )
    na = norms.select(
        F.col("__id").alias("id_a"), *group_cols, F.col("__norm2").alias("__na2")
    )
    nb = norms.select(F.col("__id").alias("id_b"), F.col("__norm2").alias("__nb2"))
    cos = F.round(
        F.col("__dot").cast("double")
        / F.sqrt(F.col("__na2").cast("double") * F.col("__nb2").cast("double")),
        6,
    )
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", *group_cols, "cos_sim")
    )


def tfidf_pairs_oracle_sql(
    corpus_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_cols: list[str] | None = None,
    threshold: float = 0.6,
    idf_scale: int = 1_000_000,
    min_df: int = 1,
    max_vocab: int | None = None,
) -> str:
    """DuckDB replay of :func:`tfidf_cosine_pairs` — identical integer
    quantization, exact integer sums (HUGEINT), double division last,
    same min_df/max_vocab vocabulary cut, N = distinct doc ids."""
    group_cols = group_cols or []
    g = ", ".join(group_cols)
    g_pre = (g + ", ") if g else ""
    ga = ", ".join(f"a.{c}" for c in group_cols)
    ga_pre = (ga + ", ") if ga else ""
    gjoin = " AND ".join(f"a.{c} = b.{c}" for c in group_cols) or "TRUE"
    toks = f"list_filter(regexp_split_to_array(trim({text_col}), '\\s+'), x -> length(x) > 0)"
    return f"""
WITH __base AS (
  SELECT {id_col} AS id, {g_pre}{toks} AS t FROM ({corpus_sql})
),
__base2 AS (SELECT * FROM __base WHERE len(t) > 0),
__tf AS (
  SELECT id, {g_pre}term, count(*) AS tf
  FROM (SELECT id, {g_pre}unnest(t) AS term FROM __base2)
  GROUP BY id, {g_pre}term
),
__n AS (SELECT count(DISTINCT id) AS n FROM __base2),
__df AS (
  SELECT term, count(*) AS df FROM __tf GROUP BY term
  {f"HAVING count(*) >= {min_df}" if min_df > 1 else ""}
  {f"ORDER BY df DESC, term ASC LIMIT {max_vocab}" if max_vocab is not None else ""}
),
__w AS (
  -- w as HUGEINT: the per-row products below (w*w, a.w*b.w) would
  -- otherwise multiply in INT64 and ABORT on overflow for tf*idf ~ 4e9,
  -- while the Spark side's decimal(38,0) survives
  SELECT id, {g_pre}term,
         CAST(tf * CAST(round(ln((n + 1.0) / (df + 1.0)) * {idf_scale}, 0) AS BIGINT)
              AS HUGEINT) AS w
  FROM __tf JOIN __df USING (term) CROSS JOIN __n
),
__norm AS (SELECT id, sum(w * w) AS norm2 FROM __w GROUP BY id HAVING sum(w * w) > 0),
__dot AS (
  SELECT a.id AS id_a, b.id AS id_b, {ga_pre}sum(a.w * b.w) AS dot
  FROM __w a JOIN __w b ON a.term = b.term AND {gjoin} AND a.id < b.id
  GROUP BY a.id, b.id{(', ' + ga) if ga else ''}
)
SELECT id_a, id_b, {g_pre}cos_sim FROM (
  SELECT id_a, id_b, {g_pre}
         round(CAST(dot AS DOUBLE)
               / sqrt(CAST(na.norm2 AS DOUBLE) * CAST(nb.norm2 AS DOUBLE)), 6) AS cos_sim
  FROM __dot JOIN __norm na ON na.id = id_a JOIN __norm nb ON nb.id = id_b
) WHERE cos_sim >= {threshold}
"""


def keyword_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    idf_scale: int = 1_000_000,
    min_df: int = 1,
    max_vocab: int | None = None,
) -> DataFrame:
    """Per-document top-``k`` TF-IDF keywords — the extraction twin of
    :func:`tfidf_cosine_pairs` (document tagging / index-term selection;
    in a training pipeline, the cheap topical signal domain-mix and
    curriculum buckets key on).

    Same integer-exact arithmetic as the pairs operator: idf quantizes to
    ``round(ln((N+1)/(df+1)) * idf_scale)`` and the score ``tf·idf_int``
    stays an exact long, so ranking never touches a float.  Ties break by
    term ASC (binary UTF-8 order agrees across engines).  N is the count
    of DISTINCT doc ids with tokens (both engines) — rows sharing an id
    are one document.  ``min_df``/``max_vocab`` bound the vocabulary
    exactly as in :func:`tfidf_cosine_pairs` (capped-out terms simply
    can't become keywords).

    Scale shape: one tokenize pass, two map-side-combined aggregates (tf,
    df), the single-row n frame broadcast back onto tf, and ONE window
    shuffle on the doc id — WindowGroupLimit keeps per-mapper top-k, so
    the exchange carries ~k rows per document.  The per-term df table is
    vocabulary-sized, so it is broadcast only when min_df/max_vocab bound
    it; unbounded, AQE picks the join strategy (r8 verdict)."""
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    base = df.select(
        F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__t")
    ).filter(F.size("__t") > 0)
    tf = (
        base.select("__id", F.explode("__t").alias("__term"))
        .groupBy("__id", "__term")
        .agg(F.count("*").alias("__tf"))
    ).localCheckpoint(eager=False)  # feeds n_docs, dfreq AND the scored join
    n_docs = tf.select("__id").distinct().agg(F.count(F.lit(1)).alias("__n"))
    dfreq = tf.groupBy("__term").agg(F.count("*").alias("__df"))
    dfreq = _cap_vocab(dfreq, min_df, max_vocab)
    idf_int = F.round(
        F.log((F.col("__n") + 1.0) / (F.col("__df") + 1.0)) * idf_scale, 0
    ).cast("long")
    scored = (
        tf.join(_maybe_broadcast(dfreq, min_df, max_vocab), "__term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "__id",
            "__term",
            (F.col("__tf").cast("long") * idf_int).alias("score"),
        )
    )
    w = Window.partitionBy("__id").orderBy(F.desc("score"), F.asc("__term"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            F.col("__id").alias(id_col),
            F.col("__term").alias("term"),
            F.col("__rn").cast("int").alias("rank"),
            F.col("score").cast("long").alias("score"),
        )
    )


def keyword_topk_oracle_sql(
    corpus_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    idf_scale: int = 1_000_000,
    min_df: int = 1,
    max_vocab: int | None = None,
) -> str:
    """DuckDB replay of :func:`keyword_topk` — identical idf quantization,
    exact integer scores, (score DESC, term ASC) window rank, N = distinct
    doc ids, same min_df/max_vocab vocabulary cut."""
    toks = f"list_filter(regexp_split_to_array(trim({text_col}), '\\s+'), x -> length(x) > 0)"
    return f"""
WITH __base AS (
  SELECT {id_col} AS id, {toks} AS t FROM ({corpus_sql})
),
__base2 AS (SELECT * FROM __base WHERE len(t) > 0),
__tf AS (
  SELECT id, term, count(*) AS tf
  FROM (SELECT id, unnest(t) AS term FROM __base2)
  GROUP BY id, term
),
__n AS (SELECT count(DISTINCT id) AS n FROM __base2),
__df AS (
  SELECT term, count(*) AS df FROM __tf GROUP BY term
  {f"HAVING count(*) >= {min_df}" if min_df > 1 else ""}
  {f"ORDER BY df DESC, term ASC LIMIT {max_vocab}" if max_vocab is not None else ""}
),
__scored AS (
  SELECT id, term,
         tf * CAST(round(ln((n + 1.0) / (df + 1.0)) * {idf_scale}, 0) AS BIGINT) AS score
  FROM __tf JOIN __df USING (term) CROSS JOIN __n
),
__ranked AS (
  SELECT id, term, score,
         row_number() OVER (PARTITION BY id ORDER BY score DESC, term ASC) AS rn
  FROM __scored
)
SELECT id AS {id_col}, term, CAST(rn AS INT) AS rank, CAST(score AS BIGINT) AS score
FROM __ranked WHERE rn <= {k}
"""


def phrase_search(
    df: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase search via a positional-postings join — the search
    primitive BM25 ranking can't express (bag-of-words scoring finds
    "york new" as readily as "new york"): a document matches when the
    phrase's tokens appear at CONSECUTIVE positions.

    Plan shape is the positional-inverted-index walk every search engine
    runs, expressed relationally: one tokenize pass emits (doc, pos)
    postings FILTERED to the phrase's terms before anything joins (the
    selective-term pushdown — postings for absent terms never shuffle),
    then ``len(phrase)-1`` equi-joins on (doc, pos+offset) chain the
    positions.  At 100 TB the postings frame is what you persist
    (a parquet (term, doc, pos) table bucketed by term); the per-query
    plan is unchanged — filtered scan + bounded joins, no corpus scan per
    query.  Output: (id, n_matches) per matching doc — exact integers."""
    terms = [t for t in phrase.strip().split() if t]
    if len(terms) < 2:
        raise ValueError(
            f"phrase must have >= 2 tokens, got {phrase!r} "
            "(single-term lookup is a plain filter; use bm25_topk to rank)"
        )
    _check_phrase_terms(terms)
    from fineo_readerator_spark.llm_ops.textstats import tokens

    postings = (
        df.select(
            F.col(id_col).alias("__id"),
            F.posexplode(tokens(F.col(text_col))).alias("__pos", "__t"),
        )
        .filter(F.col("__t").isin(terms))
        .localCheckpoint(eager=False)  # one tokenize pass feeds every leg
    )
    cur = postings.filter(F.col("__t") == terms[0]).select("__id", "__pos")
    for off, term in enumerate(terms[1:], start=1):
        nxt = postings.filter(F.col("__t") == term).select(
            "__id", (F.col("__pos") - off).alias("__pos")
        )
        cur = cur.join(nxt, ["__id", "__pos"], "left_semi")
    return cur.groupBy("__id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches")
    ).select(F.col("__id").alias(id_col), "n_matches")


def _check_phrase_terms(terms: list[str]) -> None:
    """Both faces interpolate terms into SQL string literals, so restrict
    them to word characters — a quote/backslash term would be an injection
    into the oracle (and no whitespace tokenizer can ever match one with
    embedded whitespace anyway)."""
    import re

    for t in terms:
        if not re.fullmatch(r"[A-Za-z0-9_\-]+", t):
            raise ValueError(
                f"phrase term {t!r} is not plain [A-Za-z0-9_-]+: quoted/"
                "special-character terms are not supported (they would be "
                "SQL-literal injection in the oracle face)"
            )


def phrase_search_oracle_sql(
    corpus_sql: str,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replay of :func:`phrase_search` — same tokenization, postings
    filter and consecutive-position joins."""
    terms = [t for t in phrase.strip().split() if t]
    _check_phrase_terms(terms)
    toks = (
        f"list_filter(regexp_split_to_array(trim({text_col}), '\\s+'),"
        " x -> length(x) > 0)"
    )
    quoted = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    legs = []
    for off, term in enumerate(terms[1:], start=1):
        legs.append(
            f"AND EXISTS (SELECT 1 FROM postings p{off}"
            f" WHERE p{off}.id = p0.id AND p{off}.t = '{term}'"
            f" AND p{off}.pos = p0.pos + {off})"
        )
    return f"""
WITH postings AS MATERIALIZED (
  SELECT id, u.pos AS pos, u.t AS t FROM (
    SELECT {id_col} AS id,
           unnest(list_transform(generate_series(1, len({toks})),
                  i -> {{'pos': i - 1, 't': {toks}[i]}})) AS u
    FROM ({corpus_sql})
  ) WHERE u.t IN ({quoted})
)
SELECT p0.id AS {id_col}, CAST(count(*) AS BIGINT) AS n_matches
FROM postings p0
WHERE p0.t = '{terms[0]}'
{' '.join(legs)}
GROUP BY p0.id
"""
