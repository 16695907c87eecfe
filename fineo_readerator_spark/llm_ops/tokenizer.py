"""In-engine BPE tokenizer training and encoding — tokenizer fitting as
distributed relational algebra, with the whole training walk
oracle-checkable.

Byte-pair encoding's training loop (Sennrich et al. 2016, the
subword-tokenizer construction GPT/Llama vocabularies descend from) is,
per merge step: count adjacent symbol pairs across the corpus weighted by
word frequency, pick the most frequent pair, fuse it everywhere.  That is
two aggregations and a projection — exactly the shape this engine runs
well at 100 TB, unlike the single-machine trainers that have to sample
the corpus first.  Encoding with a trained merge table is a pure
projection (a chain of literal replaces), so tokenizer-eval metrics like
per-language fertility come out of ONE aggregate over vocabulary rows.

Determinism contract (the same discipline as ``kmeans_refine`` /
``classifier``): pair counts are exact integers; the winning pair is a
total order (count DESC, left ASC, right ASC); the merge application is
canonical non-overlapping left-to-right fusing via space-delimited
literal ``replace`` — identical semantics in Spark and DuckDB, so the
DuckDB oracle replays the ENTIRE training walk, not just the final
vocabulary.

Scale shape: one tokenize pass builds the (word, freq) table — shuffle =
|vocabulary|, map-side combined — then the top-``vocab_size`` rows (freq
DESC, word ASC; the CCNet-style cap ``bigram_lm_scores`` also takes —
rare-tail words carry negligible pair mass) are collected ONCE and the
merge loop runs DRIVER-LOCAL over that in-memory table (the standard
tokenizer-trainer shape).  Training is therefore ONE Spark job total
regardless of merge count — the earlier formulation ran one
vocabulary-frame aggregation + driver ``.first()`` PER merge, which at a
production 32k-merge vocabulary is 32k sequential cluster jobs (days of
wall-clock at web scale).  The collected table is ``vocab_size`` rows =
model-sized, never corpus-sized.  Encoding with the learned table remains
a distributed codegen'd projection (:func:`merge_chain_expr`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fineo_readerator_spark.llm_ops.textstats import tokens


def _word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__f"))
    )


def merge_chain_expr(syms_col: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply a learned merge list to a symbol-array column as ONE codegen'd
    projection (no joins, no shuffle): DOUBLE-space-join, one literal
    replace of ``' l  r '`` with ``' lr '`` per merge in learned order,
    split back on space runs.

    Literal (non-regex) replace scans left to right on both engines;
    symbols never contain spaces, so the delimiters make partial-symbol
    matches impossible.  The double delimiter means each token keeps its
    OWN flanking space, so a replacement never consumes the next pair's
    leading delimiter — ``a a a a`` fuses to ``[aa, aa]`` (canonical BPE
    left-to-right fusing), not ``[aa, a, a]`` — and every token boundary
    stays exactly two spaces after any number of chained replaces."""
    joined = F.concat(F.lit(" "), F.concat_ws("  ", syms_col), F.lit(" "))
    for l, r in merges:
        joined = F.replace(joined, F.lit(f" {l}  {r} "), F.lit(f" {l}{r} "))
    return F.split(F.trim(joined), " +")


DEFAULT_VOCAB_SIZE = 30_000


def _fuse(syms: list[str], l: str, r: str) -> list[str]:
    """Canonical left-to-right non-overlapping fusing of one pair — the
    in-memory twin of one :func:`merge_chain_expr` replace step (``a a a
    a`` fuses to ``[aa, aa]``, not ``[aa, a, a]``)."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _pair_counts(syms: list[str], f: int) -> dict[tuple[str, str], int]:
    c: dict[tuple[str, str], int] = {}
    for i in range(len(syms) - 1):
        p = (syms[i], syms[i + 1])
        c[p] = c.get(p, 0) + f
    return c


def _train_from_freq_rows(
    freq_rows: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """The driver-local merge loop over collected ``(word, freq)`` rows.
    Returns ``(step, left, right, merged, pair_count)`` tuples in learned
    order; stops early when no adjacent pair remains.

    Exact integer pair counts and a (count DESC, left ASC, right ASC)
    winner — Python's per-codepoint string order equals Spark's and
    DuckDB's binary UTF-8 order, so the walk is replayable relationally.

    INCREMENTAL, the standard trainer shape: global pair counts and a
    pair→words inverted index are built once; each merge touches only the
    words that CONTAIN the winning pair (exact per-word count deltas) and
    picks winners from a lazy max-heap whose entries are validated against
    the live count on pop.  A naive re-count re-walks every symbol of
    every word per merge — O(n_merges × Σ|word|), hours of driver CPU at a
    production 32k-merge vocabulary — while this is O(Σ|word| + touched
    work + heap log); the winner sequence is identical because the heap
    tuple (-count, left, right) IS the (count DESC, left ASC, right ASC)
    total order over exact integers."""
    import heapq

    vocab: list[list] = [[list(w), int(f)] for w, f in freq_rows]
    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, f) in enumerate(vocab):
        for p, c in _pair_counts(syms, f).items():
            counts[p] = counts.get(p, 0) + c
            where.setdefault(p, set()).add(idx)
    heap = [(-c, p[0], p[1]) for p, c in counts.items()]
    heapq.heapify(heap)
    out_rows: list[tuple[int, str, str, str, int]] = []
    step = 0
    while step < n_merges and counts:
        negc, l, r = heapq.heappop(heap)
        if counts.get((l, r)) != -negc:
            continue  # stale entry — the pair's count changed since the push
        step += 1
        out_rows.append((step, l, r, l + r, -negc))
        pair = (l, r)
        for idx in sorted(where.get(pair, ())):
            syms, f = vocab[idx]
            old = _pair_counts(syms, f)
            new_syms = _fuse(syms, l, r)
            new = _pair_counts(new_syms, f)
            vocab[idx][0] = new_syms
            for p in old.keys() | new.keys():
                d = new.get(p, 0) - old.get(p, 0)
                if d:
                    nc = counts.get(p, 0) + d
                    if nc <= 0:
                        counts.pop(p, None)
                    else:
                        counts[p] = nc
                        heapq.heappush(heap, (-nc, p[0], p[1]))
                if p in new:
                    where.setdefault(p, set()).add(idx)
                elif p in old:
                    s = where.get(p)
                    if s is not None:
                        s.discard(idx)
                        if not s:
                            where.pop(p, None)
        # canonical full fusing leaves no (l, r) adjacency, so the delta
        # loop drains its count to zero; pop defensively either way
        counts.pop(pair, None)
        where.pop(pair, None)
    return out_rows


def _collect_capped_freqs(
    freqs: DataFrame, vocab_size: int
) -> list[tuple[str, int]]:
    """ONE Spark action: the top-``vocab_size`` (word, freq) rows under the
    total order (freq DESC, word ASC) — TakeOrdered, never a global sort."""
    rows = (
        freqs.orderBy(F.desc("__f"), F.asc("__w")).limit(vocab_size).collect()
    )
    return [(r["__w"], r["__f"]) for r in rows]


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 2,
    vocab_size: int = DEFAULT_VOCAB_SIZE,
) -> list[tuple[int, str, str, str, int]]:
    """Learn the first ``n_merges`` BPE merges over the corpus; returns the
    merge table as driver-side tuples (model-sized — ``n_merges`` rows).

    ``vocab_size`` caps the TRAINING vocabulary to the top-K words by
    (freq DESC, word ASC); rarer words are dropped from training (their
    pair mass is negligible by construction) but still encodable — the
    merge table applies to any symbol sequence."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    return _train_from_freq_rows(
        _collect_capped_freqs(_word_freqs(df, text_col), vocab_size), n_merges
    )


def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 2,
    vocab_size: int = DEFAULT_VOCAB_SIZE,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over the corpus.  Returns
    one row per merge step: ``(step, pair_left, pair_right, merged,
    pair_count)`` in learned order — the head of the merge table a
    tokenizer build would persist.

    Stops early (fewer rows) if the corpus runs out of adjacent pairs."""
    rows = train_bpe(df, text_col, n_merges, vocab_size)
    schema = "step int, pair_left string, pair_right string, merged string, pair_count long"
    if not rows:
        return df.sparkSession.createDataFrame([], schema)
    # Arrow local frame, not the pickled-RDD path: list-based createDataFrame
    # plans a scan whose every task round-trips a Python worker, re-paid on
    # each consumption of the merge table (see dedup._components_min_label)
    import pandas as pd

    return df.sparkSession.createDataFrame(
        pd.DataFrame(
            rows,
            columns=["step", "pair_left", "pair_right", "merged", "pair_count"],
        ),
        schema,
    )


def bpe_fertility(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    n_merges: int = 4,
    vocab_size: int = DEFAULT_VOCAB_SIZE,
) -> DataFrame:
    """Train a BPE merge table on the whole corpus, encode the corpus with
    it, and report per-group tokenizer **fertility** (tokens per word) —
    the standard tokenizer-eval metric that exposes which languages a
    vocabulary fragments (fertility ≫ 1 means the tokenizer was trained on
    someone else's distribution).

    Scale shape: ONE tokenize pass builds the (group, word, freq) table;
    the corpus-level training vocabulary is derived from it by a second
    small aggregate capped at ``vocab_size`` rows, collected once, and the
    merge loop runs driver-local — training never re-reads the corpus and
    costs ONE Spark job no matter the merge count.  Encoding is a
    codegen'd literal-replace chain over vocabulary rows; the per-group
    stats are one map-side-combined aggregate.  NULL group is its own
    group.

    Determinism: exact long counts; ``fertility`` is ONE division of two
    exact longs rounded at 1e-6 (the :func:`ngram_diversity` contract)."""
    wl = (
        df.select(
            F.col(group_col).alias("__grp"),
            F.explode(tokens(F.col(text_col))).alias("__w"),
        )
        .groupBy("__grp", "__w")
        .agg(F.count(F.lit(1)).alias("__f"))
        .localCheckpoint(eager=False)
    )
    corpus_freqs = wl.groupBy("__w").agg(F.sum("__f").alias("__f"))
    merges = [
        (l, r)
        for _, l, r, _, _ in _train_from_freq_rows(
            _collect_capped_freqs(corpus_freqs, vocab_size), n_merges
        )
    ]
    enc = merge_chain_expr(F.expr("regexp_extract_all(__w, '.', 0)"), merges)
    return (
        wl.select("__grp", "__f", F.size(enc).alias("__n"))
        .groupBy("__grp")
        .agg(
            F.sum("__f").cast("long").alias("n_words"),
            F.sum(F.col("__f") * F.col("__n")).cast("long").alias("n_tokens"),
        )
        .withColumn("fertility", F.round(F.col("n_tokens") / F.col("n_words"), 6))
        .select(F.col("__grp").alias(group_col), "n_words", "n_tokens", "fertility")
        .orderBy(group_col)
    )


def _oracle_toks(text_col: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(trim({text_col}), '\\s+'),"
        " x -> length(x) > 0)"
    )


def _oracle_merge_apply(syms: str, l_sql: str, r_sql: str) -> str:
    """DuckDB twin of one :func:`merge_chain_expr` step on a list
    expression: double-space join, literal replace, split on space runs."""
    return (
        f"regexp_split_to_array(trim(replace(' ' || array_to_string({syms}, '  ') || ' ',"
        f" ' ' || {l_sql} || '  ' || {r_sql} || ' ',"
        f" ' ' || {l_sql} || {r_sql} || ' ')), ' +')"
    )


def bpe_cte_parts(
    corpus_sql: str,
    text_col: str,
    n_merges: int,
    vocab_size: int = DEFAULT_VOCAB_SIZE,
) -> list[str]:
    """The unrolled training walk as DuckDB CTE strings: ``__w`` (word
    freqs), ``__wcap`` (the top-``vocab_size`` training vocabulary under
    the same (freq DESC, word ASC) total order the Spark side collects),
    ``s0`` (symbol split), then per step the pair-count ``p{t}``, winner
    ``b{t}`` and (for steps that feed a next round) the recode ``s{t}``.
    An exhausted corpus makes ``b{t}`` empty and the NULL replace poisons
    ``s{t}`` to NULL symbol lists, whose pairs vanish under
    ``len(syms) >= 2`` — matching the driver-local early stop."""
    parts = [
        f"__w AS MATERIALIZED (SELECT w, count(*) AS f FROM (SELECT unnest({_oracle_toks(text_col)}) AS w"
        f" FROM ({corpus_sql})) GROUP BY w)",
        f"__wcap AS MATERIALIZED (SELECT w, f FROM __w ORDER BY f DESC, w ASC LIMIT {vocab_size})",
        "s0 AS MATERIALIZED (SELECT f, regexp_extract_all(w, '.') AS syms FROM __wcap)",
    ]
    prev = "s0"
    for t in range(1, n_merges + 1):
        parts.append(
            f"""p{t} AS MATERIALIZED (
  SELECT syms[i] AS l, syms[i + 1] AS r, sum(f) AS c
  FROM {prev}, unnest(generate_series(1, len(syms) - 1)) u(i)
  WHERE len(syms) >= 2 GROUP BY 1, 2
)"""
        )
        parts.append(f"b{t} AS MATERIALIZED (SELECT l, r, c FROM p{t} ORDER BY c DESC, l, r LIMIT 1)")
        if t < n_merges:
            applied = _oracle_merge_apply(
                "syms", f"(SELECT l FROM b{t})", f"(SELECT r FROM b{t})"
            )
            parts.append(f"s{t} AS MATERIALIZED (SELECT f, {applied} AS syms FROM {prev})")
            prev = f"s{t}"
    return parts


def bpe_merges_oracle_sql(
    corpus_sql: str,
    text_col: str = "text",
    n_merges: int = 2,
    vocab_size: int = DEFAULT_VOCAB_SIZE,
) -> str:
    """DuckDB replay of :func:`bpe_merges`: identical word weighting,
    vocabulary cap, pair counting, (count DESC, left, right) winner order
    and left-to-right merge application, unrolled per step."""
    parts = bpe_cte_parts(corpus_sql, text_col, n_merges, vocab_size)
    selects = [
        f"SELECT {t} AS step, l AS pair_left, r AS pair_right,"
        f" l || r AS merged, CAST(c AS BIGINT) AS pair_count FROM b{t}"
        for t in range(1, n_merges + 1)
    ]
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects) + "\nORDER BY step"


def bpe_fertility_oracle_sql(
    corpus_sql: str,
    text_col: str = "text",
    group_col: str = "lang",
    n_merges: int = 4,
    vocab_size: int = DEFAULT_VOCAB_SIZE,
) -> str:
    """DuckDB replay of :func:`bpe_fertility`: the training walk from
    :func:`bpe_cte_parts` (on corpus-level word freqs derived from the
    per-group table, exactly as the Spark side does), then an encode chain
    ``e{t}`` over the per-group vocabulary guarded per step so an
    early-stopped training (empty ``b{t}``) passes symbols through
    unchanged."""
    parts = [
        f"__wl AS MATERIALIZED (SELECT grp, w, count(*) AS f FROM"
        f" (SELECT {group_col} AS grp, unnest({_oracle_toks(text_col)}) AS w"
        f" FROM ({corpus_sql})) GROUP BY grp, w)",
    ]
    # training chain on corpus-level freqs derived from __wl
    train = bpe_cte_parts(corpus_sql, text_col, n_merges, vocab_size)
    train[0] = "__w AS MATERIALIZED (SELECT w, sum(f) AS f FROM __wl GROUP BY w)"
    parts.extend(train)
    parts.append("e0 AS MATERIALIZED (SELECT grp, f, regexp_extract_all(w, '.') AS syms FROM __wl)")
    prev = "e0"
    for t in range(1, n_merges + 1):
        applied = _oracle_merge_apply(
            "syms", f"(SELECT l FROM b{t})", f"(SELECT r FROM b{t})"
        )
        parts.append(
            f"""e{t} AS MATERIALIZED (
  SELECT grp, f,
         CASE WHEN (SELECT count(*) FROM b{t}) = 0 THEN syms ELSE {applied} END AS syms
  FROM {prev}
)"""
        )
        prev = f"e{t}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT grp AS {group_col},
       CAST(sum(f) AS BIGINT) AS n_words,
       CAST(sum(f * len(syms)) AS BIGINT) AS n_tokens,
       round(CAST(sum(f * len(syms)) AS BIGINT) / CAST(sum(f) AS BIGINT), 6) AS fertility
FROM {prev} GROUP BY grp ORDER BY {group_col} NULLS FIRST"""
    )


def bpe_doc_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = 4,
    vocab_size: int = DEFAULT_VOCAB_SIZE,
) -> DataFrame:
    """Per-document token counts under the corpus-trained BPE — the
    sequence-budget every packing/truncation decision actually consumes
    (whitespace counts under-estimate fragmenting languages; this is the
    same number the real tokenizer would produce).  Output ``(id, n_words,
    n_tokens)``.

    Scale shape: the (doc, word) frequency table is the only corpus-sized
    frame; training reuses :func:`bpe_merges`' driver-local loop on the
    capped corpus vocabulary (ONE job); each DISTINCT word encodes once
    through the codegen'd literal-replace chain and the vocabulary-sized
    length table joins back UN-hinted (AQE sizes it — the dfreq lesson)."""
    wl = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(tokens(F.col(text_col))).alias("__w"),
        )
        .groupBy("__id", "__w")
        .agg(F.count(F.lit(1)).alias("__f"))
        .localCheckpoint(eager=False)
    )
    corpus_freqs = wl.groupBy("__w").agg(F.sum("__f").alias("__f"))
    merges = [
        (l, r)
        for _, l, r, _, _ in _train_from_freq_rows(
            _collect_capped_freqs(corpus_freqs, vocab_size), n_merges
        )
    ]
    enc = merge_chain_expr(F.expr("regexp_extract_all(__w, '.', 0)"), merges)
    wlen = wl.select("__w").distinct().select("__w", F.size(enc).alias("__n"))
    return (
        wl.join(wlen, "__w")
        .groupBy("__id")
        .agg(
            F.sum("__f").cast("long").alias("n_words"),
            F.sum(F.col("__f") * F.col("__n")).cast("long").alias("n_tokens"),
        )
        .select(F.col("__id").alias(id_col), "n_words", "n_tokens")
    )


def bpe_doc_tokens_oracle_sql(
    corpus_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = 4,
    vocab_size: int = DEFAULT_VOCAB_SIZE,
) -> str:
    """DuckDB replay of :func:`bpe_doc_tokens` — the fertility replay with
    the document id as the group (per-word encode is deterministic, so
    encoding per (doc, word) row or per distinct word is value-identical)."""
    parts = [
        f"__wl AS MATERIALIZED (SELECT id, w, count(*) AS f FROM"
        f" (SELECT {id_col} AS id, unnest({_oracle_toks(text_col)}) AS w"
        f" FROM ({corpus_sql})) GROUP BY id, w)",
    ]
    train = bpe_cte_parts(corpus_sql, text_col, n_merges, vocab_size)
    train[0] = "__w AS MATERIALIZED (SELECT w, sum(f) AS f FROM __wl GROUP BY w)"
    parts.extend(train)
    parts.append(
        "e0 AS MATERIALIZED (SELECT id, f, regexp_extract_all(w, '.') AS syms FROM __wl)"
    )
    prev = "e0"
    for t in range(1, n_merges + 1):
        applied = _oracle_merge_apply(
            "syms", f"(SELECT l FROM b{t})", f"(SELECT r FROM b{t})"
        )
        parts.append(
            f"""e{t} AS MATERIALIZED (
  SELECT id, f,
         CASE WHEN (SELECT count(*) FROM b{t}) = 0 THEN syms ELSE {applied} END AS syms
  FROM {prev}
)"""
        )
        prev = f"e{t}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT id AS {id_col},
       CAST(sum(f) AS BIGINT) AS n_words,
       CAST(sum(f * len(syms)) AS BIGINT) AS n_tokens
FROM {prev} GROUP BY id"""
    )
