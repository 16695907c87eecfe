"""Text analysis: tokenization stats, quality scoring, language ID,
document fingerprinting.

All pure Catalyst expressions (no Python UDFs): at 100 TB these run inside
whole-stage codegen as a single projection over the scan — zero shuffles,
perfectly parallel.  Every formula is also expressible in ANSI SQL so the
DuckDB oracle can replay it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# whitespace tokens, empties dropped (leading/trailing-safe on both engines)
_WS = r"\s+"
# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_CLASS = r"[.,!?;:]"

# tiny per-language stopword markers for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " la "],
    "es": [" el ", " y ", " de la "],
}


def tokens(col: Column) -> Column:
    return F.filter(F.split(F.trim(col), _WS), lambda t: F.length(t) > 0)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append token/char/punctuation statistics and a quality score.

    The quality score is a deterministic [0,1] blend of length, punctuation
    and word-shape signals (the usual cheap pre-filters an LLM data pipeline
    applies before expensive dedup)."""
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    # ratios stay UNROUNDED doubles: both engines divide the same exact
    # integers with the same expression shape, so the bits match; rounding
    # would reintroduce half-way divergence between round() implementations
    avg_wl = F.when(n_tok > 0, (F.length(F.concat_ws("", toks)) * F.lit(1.0)) / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct * F.lit(1.0) / n_chars).otherwise(F.lit(0.0))
    n_bpe = F.size(F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0))
    quality = (
        F.least(n_tok * F.lit(1.0) / 50.0, F.lit(1.0)) * 0.5
        + (F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.3
        + F.least(avg_wl / 8.0, F.lit(1.0)) * 0.2
    )
    return df.withColumns(
        {
            # counts as int64: DuckDB len()/length() are BIGINT and the
            # driver's value hashing is type-representation-sensitive
            "n_tokens": n_tok.cast("long"),
            "n_bpe_tokens": n_bpe.cast("long"),
            "n_punct": n_punct.cast("long"),
            "punct_ratio": punct_ratio,
            "avg_word_len": avg_wl,
            "quality_score": quality,
        }
    )


def text_stats_oracle_exprs(text_col: str = "text") -> str:
    """The same stats as DuckDB SQL (kept textually adjacent to the Spark
    build so the two formulas evolve together)."""
    t = text_col
    toks = f"list_filter(regexp_split_to_array(trim({t}), '\\s+'), x -> length(x) > 0)"
    n_tok = f"len({toks})"
    n_chars = f"length({t})"
    n_punct = f"(length({t}) - length(regexp_replace({t}, '[.,!?;:]', '', 'g')))"
    avg_wl = (
        f"CASE WHEN {n_tok} > 0 THEN length(list_aggregate({toks}, 'string_agg', '')) * 1.0"
        f" / {n_tok} ELSE 0.0 END"
    )
    punct_ratio = f"CASE WHEN {n_chars} > 0 THEN {n_punct} * 1.0 / {n_chars} ELSE 0.0 END"
    n_bpe = f"len(regexp_extract_all({t}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))"
    quality = (
        f"(least({n_tok} * 1.0 / 50.0, 1.0) * 0.5"
        f" + (1.0 - least({punct_ratio} * 5.0, 1.0)) * 0.3"
        f" + least({avg_wl} / 8.0, 1.0) * 0.2)"
    )
    return (
        f"{n_tok} AS n_tokens, {n_bpe} AS n_bpe_tokens, {n_punct} AS n_punct, "
        f"{punct_ratio} AS punct_ratio, {avg_wl} AS avg_word_len, {quality} AS quality_score"
    )


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_guess") -> DataFrame:
    """Marker-stopword language heuristic: score = #marker hits per language,
    argmax wins (priority order on ties), 'und' when nothing matches."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = {
        lang: sum(F.when(padded.contains(m), 1).otherwise(0) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in reversed(list(LANG_MARKERS)):  # earlier languages win ties
        s = scores[lang]
        cond = s >= best_score
        best = F.when(cond & (s > 0), F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return df.withColumn(out_col, best)


def language_id_oracle_expr(text_col: str = "text", out_col: str = "lang_guess") -> str:
    padded = f"(' ' || lower({text_col}) || ' ')"

    def score(lang):
        return " + ".join(
            f"(CASE WHEN contains({padded}, '{m}') THEN 1 ELSE 0 END)" for m in LANG_MARKERS[lang]
        )

    # same tie semantics: iterate reversed, >= replaces, earlier langs win ties
    expr_best = "'und'"
    expr_score = "0"
    for lang in reversed(list(LANG_MARKERS)):
        s = f"({score(lang)})"
        expr_best = f"(CASE WHEN {s} >= {expr_score} AND {s} > 0 THEN '{lang}' ELSE {expr_best} END)"
        expr_score = f"(CASE WHEN {s} >= {expr_score} THEN {s} ELSE {expr_score} END)"
    return f"{expr_best} AS {out_col}"


def text_fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Canonical document fingerprint: md5 of the whitespace-normalized,
    lowercased text — the exact-dedup key that survives formatting noise."""
    norm = F.concat_ws(" ", tokens(F.lower(F.col(text_col))))
    return df.withColumn(out_col, F.md5(norm))


def text_fingerprint_oracle_expr(text_col: str = "text", out_col: str = "fingerprint") -> str:
    toks = f"list_filter(regexp_split_to_array(trim(lower({text_col})), '\\s+'), x -> length(x) > 0)"
    return f"md5(array_to_string({toks}, ' ')) AS {out_col}"


# --- winnowing (rolling-hash) fingerprints ---------------------------------

_WIN_B = 31
_WIN_P = 1_000_000_007


def _win_norm(col: Column, k: int) -> Column:
    """Winnowing canonical form: lowercase, alnum+space only, whitespace
    collapsed, right-padded so at least one k-gram exists."""
    clean = F.regexp_replace(F.lower(col), r"[^a-z0-9 ]", "")
    collapsed = F.concat_ws(" ", tokens(clean))
    return F.rpad(collapsed, k, " ")


def winnowing_fingerprints(
    df: DataFrame, text_col: str = "text", k: int = 8, w: int = 4, out_col: str = "fps"
) -> DataFrame:
    """MOSS-style document fingerprints: polynomial rolling hash over char
    k-grams, minimum per window of ``w`` consecutive hashes, distinct-sorted.

    The hash is plain modular integer arithmetic (``sum(code * B^j) mod P``)
    so the DuckDB oracle replays it bit-for-bit — unlike engine-native hash
    functions.  Row-local (no shuffle); robust to formatting noise the way
    md5-of-normalized-text (``text_fingerprint``) is not: shared substrings
    still collide on fingerprints after local edits elsewhere."""
    weights = [pow(_WIN_B, j, _WIN_P) for j in range(k)]
    norm = _win_norm(F.col(text_col), k)

    def gram_hash(i: Column) -> Column:
        acc = F.lit(0).cast("long")
        for j, wt in enumerate(weights):
            code = F.ascii(norm.substr(i + F.lit(j), F.lit(1)))
            acc = (acc + code.cast("long") * F.lit(wt)) % F.lit(_WIN_P)
        return acc

    n = F.length(norm)
    grams = F.transform(F.sequence(F.lit(1), n - k + 1), gram_hash)
    m = F.size(grams)
    mins = F.transform(
        F.sequence(F.lit(1), F.greatest(m - w + 1, F.lit(1))),
        lambda t: F.array_min(F.slice(grams, t, w)),
    )
    return df.withColumn(out_col, F.array_sort(F.array_distinct(mins)))


def winnowing_oracle_sql(
    table: str,
    id_col: str,
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    out_col: str = "fps",
) -> str:
    """Full DuckDB oracle for ``winnowing_fingerprints`` (identical modular
    arithmetic, incremental mod per term)."""
    weights = [pow(_WIN_B, j, _WIN_P) for j in range(k)]
    toks = (
        f"list_filter(regexp_split_to_array(trim(regexp_replace(lower({text_col}),"
        f" '[^a-z0-9 ]', '', 'g')), '\\s+'), x -> length(x) > 0)"
    )
    norm = f"rpad(array_to_string({toks}, ' '), {k}, ' ')"
    acc = "CAST(0 AS BIGINT)"
    for j, wt in enumerate(weights):
        acc = (
            f"(({acc}) + ascii(substr(__n, CAST(i + {j} AS INT), 1))"
            f" * CAST({wt} AS BIGINT)) % {_WIN_P}"
        )
    return f"""
WITH n AS (SELECT {id_col}, {norm} AS __n FROM {table}),
g AS (
  SELECT {id_col},
         list_transform(generate_series(1, CAST(length(__n) - {k} + 1 AS BIGINT)),
                        i -> {acc}) AS __g
  FROM n
)
SELECT {id_col},
       list_sort(list_distinct(list_transform(
         generate_series(1, CAST(greatest(len(__g) - {w} + 1, 1) AS BIGINT)),
         t -> list_min(__g[CAST(t AS INT):CAST(t + {w} - 1 AS INT)])))) AS {out_col}
FROM g
"""
