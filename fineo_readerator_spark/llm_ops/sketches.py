"""Distinct-count sketches: a portable, deterministic HyperLogLog.

Why not ``approx_count_distinct``?  Spark's built-in HLL++ is the right
production choice (and is what a user should reach for), but its register
layout and hash are engine-internal, so its output can't be replayed by the
DuckDB oracle or by a second engine reading the same data.  This HLL uses the
portable md5 leaf hash (see llm_ops.dedup._md5_long) and pure integer
register arithmetic, so the SAME estimate comes out of Spark, DuckDB and
Python — sketch results become comparable and mergeable across engines, which
is exactly what a multi-engine 100 TB pipeline needs.

Scale shape: one map-side-combined aggregation to 128 registers (bytes of
state per partition), then a single-row fold — the same two-level shape as
``approx_count_distinct``.  Register max() is associative/commutative, so the
shuffle carries at most #partitions × 128 longs.

Determinism details:
- bucket = low 7 bits of the 60-bit hash; suffix = high 53 bits.
- rho = leading zeros of the 53-bit suffix + 1 (via length(bin(x)) — integer
  string length, no float log).
- The harmonic sum  Σ 2^-M_j  is computed as the INTEGER  Σ 2^(54-M_j)
  (scaled by 2^54): max 128·2^54 < 2^62, exact in int64 and order-independent,
  where a float sum would depend on aggregation order.
- Only the final division and the small-range ln() touch floating point; the
  result is rounded to 2 decimals, far coarser than any cross-libm ulp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fineo_readerator_spark.llm_ops.dedup import _md5_long

_P = 7  # register index bits
_M = 1 << _P  # 128 registers
_W = 53  # suffix width: 60-bit md5 leaf minus 7 index bits
_ALPHA = 0.7213 / (1 + 1.079 / _M)  # bias constant for m >= 128


def _rho(suffix: Column) -> Column:
    """Leading-zero rank of a value in a ``_W``-bit window: _W+1 for zero,
    else _W - bitlength + 1.  bin() gives the bit length as a string length —
    exact integer arithmetic on both engines."""
    return (
        F.when(suffix == 0, F.lit(_W + 1))
        .otherwise(F.lit(_W + 1) - F.length(F.bin(suffix)))
        .cast("int")
    )


def hll_registers(df: DataFrame, key: Column, group_cols: tuple = ()) -> DataFrame:
    """(group_cols..., bucket, m_j) rows for non-empty registers — the
    mergeable sketch state (missing buckets mean register value 0).  With
    ``group_cols`` this is one sketch per group; register ``max`` is
    associative/commutative, so the same expression maintains the registers
    INCREMENTALLY as a streaming aggregation — the stored registers ARE the
    state, and estimates finalize on read (``hll_finalize``)."""
    h = _md5_long(key)
    return (
        df.select(
            *group_cols,
            h.bitwiseAND(F.lit(_M - 1)).alias("bucket"),
            _rho(F.shiftright(h, _P)).alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def _estimate_sql() -> str:
    """The HLL estimator over a group of (bucket, m_j) rows, with the
    small-range (linear counting) correction; no large-range correction is
    needed at 60 hash bits."""
    big = 1 << (_W + 1)
    raw = (
        f"{_ALPHA!r}D * {_M} * {_M} * {big}"
        f" / (sum(shiftleft(1L, {_W + 1} - m_j)) + ({_M} - count(*)) * {big}L)"
    )
    return (
        f"round(CASE WHEN {raw} <= 2.5D * {_M} AND count(*) < {_M}"
        f" THEN {_M} * ln({_M} * CAST(1.0 AS DOUBLE) / ({_M} - count(*)))"
        f" ELSE {raw} END, 2)"
    )


def hll_finalize(regs: DataFrame, group_cols: tuple = ()) -> DataFrame:
    """(group_cols..., est_distinct double, registers_set long) from stored
    register rows — the read-time half of the sketch."""
    return regs.groupBy(*group_cols).agg(
        F.expr(_estimate_sql()).alias("est_distinct"),
        F.count("*").cast("long").alias("registers_set"),
    )


def hll_estimate(df: DataFrame, key: Column) -> DataFrame:
    """Single-row DataFrame: (est_distinct double, registers_set long)."""
    return hll_finalize(hll_registers(df, key))


def _salted_md5_long(col: Column, salt: str) -> Column:
    """Portable 60-bit hash of ``salt|key`` — the independent-hash-family
    leaf for multi-hash sketches (Bloom, Count-Min), replayable in SQL."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}|"), col.cast("string"))), 1, 15), 16, 10
    ).cast("long")


def _salted_md5_oracle(key_expr: str, salt: str) -> str:
    from fineo_readerator_spark.llm_ops.dedup_oracles import _hexparse

    return _hexparse(f"md5(concat('{salt}|', CAST({key_expr} AS VARCHAR)))", 1, 15)


# --- Bloom filter ----------------------------------------------------------

_BF_BITS = 1024  # m: filter size in bits (16 words of 64)
_BF_K = 4  # hash count


def bloom_build(df: DataFrame, key: Column) -> DataFrame:
    """(word, bits) rows — a 1024-bit Bloom filter as up to 16 set words.

    The sketch is an aggregate of row-local projections: k=4 salted-md5 bit
    positions per key, folded with ``bit_or`` under map-side partial
    aggregation, so the shuffle carries at most #partitions × 16 words no
    matter how large the blocklist.  Words are mergeable across builds
    (bit_or is associative/commutative) — union two filters by re-aggregating
    their word rows."""
    pos = df.select(
        F.explode(
            F.array(*[(_salted_md5_long(key, f"bf{i}") % _BF_BITS) for i in range(_BF_K)])
        ).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("word"),
            # builtin shiftleft() only takes a literal shift; expr() allows a column
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("b"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(b)").alias("bits"))
    )


def bloom_probe(df: DataFrame, id_col: str, key: Column, bloom: DataFrame) -> DataFrame:
    """Append ``bloom_maybe``: true iff all k bits for this row's key are set.

    The filter rejoins as a BROADCAST (16 rows): at 100 TB this is the point
    of the sketch — a blocklist membership test costs a map-side lookup per
    row instead of a shuffle join against the blocklist."""
    probe = df.select(F.col(id_col), key.alias("__k")).select(
        id_col,
        F.posexplode(
            F.array(
                *[(_salted_md5_long(F.col("__k"), f"bf{i}") % _BF_BITS) for i in range(_BF_K)]
            )
        ).alias("__i", "pos"),
    )
    hits = (
        probe.withColumns(
            {"word": (F.col("pos") / 64).cast("long"), "bit": (F.col("pos") % 64).cast("int")}
        )
        .join(F.broadcast(bloom), "word", "left")
        .withColumn(
            "hit",
            F.coalesce(F.expr("(shiftright(bits, bit) & 1) = 1"), F.lit(False)),
        )
        .groupBy(id_col)
        .agg((F.sum(F.col("hit").cast("int")) == _BF_K).alias("bloom_maybe"))
    )
    return df.join(hits, id_col, "left").withColumn(
        "bloom_maybe", F.coalesce("bloom_maybe", F.lit(False))
    )


def bloom_oracle_sql(block_sql: str, probe_sql: str, id_col: str, key_expr: str) -> str:
    """DuckDB replay of build+probe: ``block_sql`` yields the blocklist keys
    as column ``k``; ``probe_sql`` yields (id, key) rows."""
    bpos = ", ".join(f"({_salted_md5_oracle('k', f'bf{i}')}) % {_BF_BITS}" for i in range(_BF_K))
    ppos = ", ".join(
        f"({_salted_md5_oracle(key_expr, f'bf{i}')}) % {_BF_BITS}" for i in range(_BF_K)
    )
    return f"""
WITH block AS ({block_sql}),
bpos AS (SELECT unnest([{bpos}]) AS pos FROM block),
bloom AS (SELECT pos // 64 AS word, bit_or(1::BIGINT << CAST(pos % 64 AS INT)) AS bits
          FROM bpos GROUP BY 1),
probe AS ({probe_sql}),
ppos AS (SELECT {id_col}, unnest([{ppos}]) AS pos FROM probe),
hits AS (
  SELECT p.{id_col},
         sum(CASE WHEN ((b.bits >> CAST(p.pos % 64 AS INT)) & 1) = 1 THEN 1 ELSE 0 END) AS n
  FROM ppos p LEFT JOIN bloom b ON p.pos // 64 = b.word
  GROUP BY 1
)
SELECT p.{id_col}, coalesce(h.n, 0) = {_BF_K} AS bloom_maybe
FROM probe p LEFT JOIN hits h ON p.{id_col} = h.{id_col}
"""


# --- Count-Min sketch ------------------------------------------------------

_CM_D = 4  # hash rows
_CM_W = 512  # counters per row


def countmin_build(df: DataFrame, key: Column) -> DataFrame:
    """(d, col, cnt) cells of a 4×512 Count-Min sketch.

    Fixed-size frequency state: the aggregation shuffles at most 2048
    counters regardless of key cardinality, and cells merge across shards by
    summing — the classic bounded-memory substitute for a full groupBy count
    at 100 TB key cardinalities."""
    cells = df.select(
        F.posexplode(
            F.array(*[(_salted_md5_long(key, f"cm{d}") % _CM_W) for d in range(_CM_D)])
        ).alias("d", "col")
    )
    return cells.groupBy("d", "col").agg(F.count("*").cast("long").alias("cnt"))


def countmin_estimate(sketch: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Append ``est_count`` = min over rows of the key's cells — the CM upper
    bound (est ≥ true count, inflated only by collisions).  The sketch joins
    as a broadcast (≤2048 rows)."""
    pos = keys.select(
        key_col,
        F.posexplode(
            F.array(
                *[(_salted_md5_long(F.col(key_col), f"cm{d}") % _CM_W) for d in range(_CM_D)]
            )
        ).alias("d", "col"),
    )
    return (
        pos.join(F.broadcast(sketch), ["d", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est_count"))
    )


def countmin_oracle_sql(source_sql: str, key_expr: str) -> str:
    """DuckDB replay: build the sketch over ``source_sql``'s ``{key_expr}``
    and estimate every distinct key, returning (key, est_count, true_count)."""
    def case_col(key: str) -> str:
        arms = " ".join(
            f"WHEN {d} THEN ({_salted_md5_oracle(key, f'cm{d}')}) % {_CM_W}"
            for d in range(_CM_D)
        )
        return f"CASE d {arms} END"

    ds = ", ".join(str(d) for d in range(_CM_D))
    return f"""
WITH src AS ({source_sql}),
dd AS (SELECT unnest([{ds}]) AS d),
cpos AS (SELECT d, {case_col(key_expr)} AS col FROM src, dd),
sk AS (SELECT d, col, count(*)::BIGINT AS cnt FROM cpos GROUP BY 1, 2),
keys AS (SELECT DISTINCT {key_expr} AS k FROM src),
kpos AS (SELECT k, d, {case_col('k')} AS col FROM keys, dd),
est AS (
  SELECT k, min(coalesce(cnt, 0))::BIGINT AS est_count
  FROM kpos LEFT JOIN sk USING (d, col) GROUP BY 1
),
tru AS (SELECT {key_expr} AS k, count(*)::BIGINT AS true_count FROM src GROUP BY 1)
SELECT k, est_count, true_count FROM est JOIN tru USING (k)
"""


def _oracle_reg_exprs() -> tuple[str, str]:
    """(bucket expression, max-rho aggregate) over a CTE exposing the 60-bit
    hash as ``h`` — the single DuckDB copy of the register arithmetic."""
    bucket = f"h & {_M - 1} AS bucket"
    m_j = (
        f"max(CASE WHEN (h >> {_P}) = 0 THEN {_W + 1}"
        f" ELSE {_W + 1} - length(bin(h >> {_P})) END) AS m_j"
    )
    return bucket, m_j


def _oracle_est_expr() -> str:
    """The rounded estimator (with the linear-counting branch) over a group
    of (bucket, m_j) rows — the single DuckDB copy of the estimator
    arithmetic that must stay bit-identical to Spark's ``_estimate_sql``."""
    big = 1 << (_W + 1)
    est = (
        f"CAST({_ALPHA!r} AS DOUBLE) * {_M} * {_M} * {big}"
        f" / (sum(1::BIGINT << ({_W + 1} - m_j)) + ({_M} - count(*)) * {big}::BIGINT)"
    )
    return (
        f"round(CASE WHEN {est} <= CAST(2.5 AS DOUBLE) * {_M} AND count(*) < {_M}"
        f" THEN {_M} * ln({_M} * CAST(1.0 AS DOUBLE) / ({_M} - count(*)))"
        f" ELSE {est} END, 2)"
    )


def _hll_oracle_core(source_sql: str, key_expr: str, group_col: str | None) -> str:
    """One DuckDB replay of registers + estimator for both the global and
    the grouped/streaming HLL, built from the shared register/estimator
    fragments (:func:`_oracle_reg_exprs`, :func:`_oracle_est_expr`)."""
    from fineo_readerator_spark.llm_ops.dedup_oracles import _hexparse

    h = _hexparse(f"md5({key_expr})", 1, 15)
    bucket, m_j = _oracle_reg_exprs()
    g = f"{group_col}, " if group_col else ""
    regs_gb = "GROUP BY 1, 2" if group_col else "GROUP BY 1"
    final_gb = f"GROUP BY {group_col}" if group_col else ""
    return f"""
WITH h AS (
  SELECT {g}{h} AS h FROM ({source_sql})
),
regs AS (
  SELECT {g}{bucket}, {m_j}
  FROM h {regs_gb}
)
SELECT {g}{_oracle_est_expr()} AS est_distinct,
       count(*) AS registers_set
FROM regs {final_gb}
"""


def hll_oracle_sql(source_sql: str, key_expr: str) -> str:
    """DuckDB replay of ``hll_estimate`` — identical hash, registers and
    estimator arithmetic."""
    return _hll_oracle_core(source_sql, key_expr, None)


def hll_grouped_oracle_sql(source_sql: str, group_col: str, key_expr: str) -> str:
    """DuckDB replay of per-group HLL registers + finalize (the grouped /
    streaming variant)."""
    return _hll_oracle_core(source_sql, key_expr, group_col)


def hll_overlap(
    df_a: DataFrame, key_a: Column, df_b: DataFrame, key_b: Column
) -> DataFrame:
    """Cross-corpus overlap estimate WITHOUT a join: |A∩B| by
    inclusion–exclusion over mergeable HLL registers — ``|A| + |B| − |A∪B|``
    where the union sketch is just the register-wise ``max`` of the two
    sides' registers (the property that makes HLL mergeable makes it
    intersectable this way).  The answer a curation pipeline wants before
    committing to an expensive dedup join: "how much of snapshot B is
    already in A?" at the cost of two scans and ~128 longs of state per
    side; error grows with the |union|/|intersection| ratio — it is a
    sizing signal, not an exact count (the exact path is the dedup join it
    gates).

    Scale shape: each side is one map-side-combined register aggregation
    (≤128 rows out); the union/estimates run on register rows only.  The
    register frames are lineage-cut — each feeds its own estimate AND the
    union (the multi-consumer rule).  Single-row output ``(est_a, est_b,
    est_union, est_intersect)``."""
    ra = hll_registers(df_a, key_a).localCheckpoint(eager=False)
    rb = hll_registers(df_b, key_b).localCheckpoint(eager=False)
    ru = ra.unionByName(rb).groupBy("bucket").agg(F.max("m_j").alias("m_j"))
    ea = hll_finalize(ra).select(F.col("est_distinct").alias("est_a"))
    eb = hll_finalize(rb).select(F.col("est_distinct").alias("est_b"))
    eu = hll_finalize(ru).select(F.col("est_distinct").alias("est_union"))
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.greatest(
                    F.lit(0.0), F.col("est_a") + F.col("est_b") - F.col("est_union")
                ),
                2,
            ).alias("est_intersect"),
        )
    )


def hll_overlap_oracle_sql(a_sql: str, key_a: str, b_sql: str, key_b: str) -> str:
    """DuckDB replay of :func:`hll_overlap`, built from the SAME register
    and estimator fragments as the global/grouped HLL oracle — a fix to the
    shared arithmetic reaches every replay."""
    from fineo_readerator_spark.llm_ops.dedup_oracles import _hexparse

    bucket, m_j = _oracle_reg_exprs()

    def regs(src_sql: str, key_expr: str) -> str:
        h = _hexparse(f"md5({key_expr})", 1, 15)
        return (
            f"SELECT {bucket}, {m_j}"
            f" FROM (SELECT {h} AS h FROM ({src_sql})) GROUP BY 1"
        )

    final = _oracle_est_expr()
    return f"""
WITH ra AS ({regs(a_sql, key_a)}),
rb AS ({regs(b_sql, key_b)}),
ru AS (SELECT bucket, max(m_j) AS m_j
       FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY bucket),
ea AS (SELECT {final} AS est_a FROM ra),
eb AS (SELECT {final} AS est_b FROM rb),
eu AS (SELECT {final} AS est_union FROM ru)
SELECT est_a, est_b, est_union,
       round(greatest(CAST(0.0 AS DOUBLE), est_a + est_b - est_union), 2) AS est_intersect
FROM ea CROSS JOIN eb CROSS JOIN eu
"""


# --- histogram quantile sketch ---------------------------------------------


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    width: float,
    quantiles: tuple = (0.5, 0.9, 0.99),
    lo: float = 0.0,
) -> DataFrame:
    """Fixed-bin histogram quantile estimates — the mergeable quantile
    companion to the HLL/Bloom/Count-Min family (corpus curation reads
    p50/p90/p99 of lengths and quality scores constantly; exact percentiles
    need a global sort).

    Sketch state is the bin-count table: ``bin = floor((x - lo) / width)``
    feeds one map-side-combined hash aggregation, so the shuffle carries
    #occupied-bins rows no matter the corpus size, and two sketches merge by
    adding counts (what a 1000-executor rollup or a cross-day union needs).
    The cumulative walk + quantile lookup then run on the BIN TABLE
    (cardinality = value-range / width), not the data — the windowed cumsum
    is single-partition but over dozens of rows.

    Estimate = inclusive upper edge of the first bin whose cumulative count
    reaches ``ceil(q * n)`` (one-sided, at most ``width`` above the true
    quantile).  All decisions are integer comparisons on exact counts and
    IEEE-identical floor/div, so DuckDB replays the result bit-for-bit.

    Returns one row per quantile: (q, n_rows, bin, est).
    """
    v = F.col(value_col).cast("double")
    bin_id = F.floor((v - F.lit(float(lo))) / F.lit(float(width))).cast("long")
    bins = (
        df.filter(v.isNotNull())
        .select(bin_id.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
    )
    return quantiles_from_bins(bins, width, quantiles, lo)


def quantiles_from_bins(
    bins: DataFrame,
    width: float,
    quantiles: tuple = (0.5, 0.9, 0.99),
    lo: float = 0.0,
) -> DataFrame:
    """Estimate-on-read finalization over a stored/streamed ``(bin, cnt)``
    sketch table — the second half of :func:`histogram_quantiles`, split
    out so a streaming aggregation (whose state IS the bin table) or a
    persisted sketch store can share the exact quantile walk."""
    from pyspark.sql import Window

    cum = bins.withColumn(
        "cum", F.sum("cnt").over(Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn(
        "n",
        F.sum("cnt").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ),
    )
    qs = F.explode(F.array(*[F.lit(float(q)) for q in quantiles])).alias("q")
    hits = cum.select(qs, "bin", "cum", "n").filter(
        F.col("cum") >= F.ceil(F.col("q") * F.col("n"))
    )
    return (
        hits.groupBy("q")
        .agg(F.max("n").alias("n_rows"), F.min("bin").alias("bin"))
        .select(
            "q",
            "n_rows",
            "bin",
            (F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(float(width))).alias("est"),
        )
    )


def histogram_quantiles_oracle_sql(
    source_sql: str,
    value_expr: str,
    width: float,
    quantiles: tuple = (0.5, 0.9, 0.99),
    lo: float = 0.0,
) -> str:
    """DuckDB replay of ``histogram_quantiles`` — identical binning, counts
    and quantile-rank comparisons."""
    qlist = ", ".join(repr(float(q)) for q in quantiles)
    w = repr(float(width))
    lo_r = repr(float(lo))
    return f"""
WITH v AS (
  SELECT CAST({value_expr} AS DOUBLE) AS x FROM ({source_sql})
  WHERE {value_expr} IS NOT NULL
),
b AS (
  SELECT CAST(floor((x - {lo_r}) / {w}) AS BIGINT) AS bin, count(*)::BIGINT AS cnt
  FROM v GROUP BY 1
),
c AS (
  SELECT bin, sum(cnt) OVER (ORDER BY bin)::BIGINT AS cum, sum(cnt) OVER ()::BIGINT AS n
  FROM b
),
q AS (SELECT CAST(unnest([{qlist}]) AS DOUBLE) AS q)
SELECT q, max(n)::BIGINT AS n_rows,
       min(CASE WHEN cum >= ceil(q * n) THEN bin END)::BIGINT AS bin,
       CAST({lo_r} AS DOUBLE)
         + (min(CASE WHEN cum >= ceil(q * n) THEN bin END) + 1) * CAST({w} AS DOUBLE) AS est
FROM q CROSS JOIN c
GROUP BY q
"""


def bloom_words(df: DataFrame, key: Column) -> list[int]:
    """Driver-side materialization of ``bloom_build``: the filter as a dense
    16-long word list.  The collect is ≤16 rows — sketch-sized, never
    data-sized — so this is safe at any corpus scale."""
    words = [0] * (_BF_BITS // 64)
    for r in bloom_build(df, key).collect():
        words[int(r["word"])] = int(r["bits"])
    return words


def bloom_member_sql(words: list[int], key_sql: str) -> str:
    """Row-local membership test as a SQL boolean: the 16 filter words embed
    in the plan as literals, so probing costs k md5s per row — no join, no
    shuffle, no broadcast.

    The pre-join use: ``big.filter(F.expr(bloom_member_sql(words, key)))``
    drops the vast majority of non-matching big-side rows BEFORE the join's
    exchange (no false negatives, so a subsequent exact join returns exactly
    the unfiltered join's result).  Spark's runtime bloom join filters do
    this adaptively; the explicit form works where AQE's doesn't reach —
    cross-session reuse (persist the 16 words), streaming sources, or
    filters built from a different pipeline stage."""
    arr = "array(" + ",".join(f"{w}L" for w in words) + ")"
    tests = []
    for i in range(_BF_K):
        md5 = f"CAST(conv(substring(md5(concat('bf{i}|', CAST({key_sql} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        pos = f"({md5} % {_BF_BITS})"
        tests.append(
            f"((shiftright(element_at({arr}, CAST({pos} div 64 AS INT) + 1),"
            f" CAST({pos} % 64 AS INT)) & 1L) = 1L)"
        )
    return "(" + " AND ".join(tests) + ")"


# --- K-minimum-values distinct sketch --------------------------------------

_KMV_RANGE = 1 << 60  # the portable md5 leaf is 60 bits


def kmv_sketch(
    df: DataFrame, key: Column, k: int = 64, group_cols: tuple = ()
) -> DataFrame:
    """(group_cols..., rank, h) rows: the ``k`` smallest DISTINCT portable
    hash values per group — the K-minimum-values sketch (Bar-Yossef et al.
    2002), the distinct-count sketch whose state is *exact order
    statistics*, so unlike HLL its estimate is bit-reproducible from the
    stored rows with zero float state and it supports set-operation
    estimates (union = k smallest of the concatenated sketches).

    Scale shape: one hash+distinct pass, then a per-group top-k —
    ``row_number() <= k`` compiles to WindowGroupLimit, so each mapper
    keeps a k-row heap and the exchange carries O(groups·k) rows.  The
    sketch is data-independent in size: k longs per group."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql.window import Window

    # NULL keys are excluded — count-distinct semantics (and Spark's
    # NULLS FIRST vs DuckDB's NULLS LAST ordering would otherwise let a
    # NULL hash evict the real kth minimum and inflate the estimate)
    hashed = (
        df.filter(key.isNotNull())
        .select(*group_cols, _md5_long(key.cast("string")).alias("__h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("__h")
    return (
        hashed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*group_cols, F.col("rank").cast("int"), F.col("__h").alias("h"))
    )


def kmv_finalize(sketch: DataFrame, k: int = 64, group_cols: tuple = ()) -> DataFrame:
    """(group_cols..., n_kept, est_distinct) from stored sketch rows.  A
    group that kept fewer than ``k`` hashes saw fewer than ``k`` distinct
    keys — the sketch IS the exact distinct set, so the estimate is exact.
    Otherwise the classic unbiased estimator (k-1)/θ with θ = kth-min/2^60:
    exact integer max + ONE rounded double division, identical in DuckDB."""
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.round(
            F.lit(float(k - 1)) * F.lit(float(_KMV_RANGE)) / F.col("__kth"), 2
        )
    )
    return (
        sketch.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.max("h").alias("__kth"),
        )
        .select(*group_cols, "n_kept", est.alias("est_distinct"))
    )


def kmv_distinct(
    df: DataFrame, key: Column, k: int = 64, group_cols: tuple = ()
) -> DataFrame:
    """Per-group KMV distinct estimate: build + finalize in one plan."""
    return kmv_finalize(kmv_sketch(df, key, k, group_cols), k, group_cols)


def kmv_oracle_sql(
    source_sql: str, key_expr: str, k: int = 64, group_col: str | None = None
) -> str:
    """DuckDB replay of :func:`kmv_distinct`: same portable hash, same
    order statistics, same estimator expression."""
    from fineo_readerator_spark.llm_ops.dedup_oracles import _hexparse

    h = _hexparse(f"md5(CAST({key_expr} AS VARCHAR))", 1, 15)
    grp = f"{group_col}, " if group_col else ""
    grp_by = f"GROUP BY {group_col}" if group_col else ""
    part = f"PARTITION BY {group_col} " if group_col else ""
    order = f"ORDER BY {group_col} NULLS FIRST" if group_col else ""
    return f"""WITH hashed AS (
  SELECT DISTINCT {grp}{h} AS h FROM ({source_sql}) WHERE {key_expr} IS NOT NULL
),
topk AS (
  SELECT * FROM (
    SELECT {grp}h, row_number() OVER ({part}ORDER BY h) AS rank FROM hashed
  ) WHERE rank <= {k}
)
SELECT {grp}CAST(count(*) AS BIGINT) AS n_kept,
       CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
            ELSE round(CAST({float(k - 1)!r} AS DOUBLE) * CAST({float(_KMV_RANGE)!r} AS DOUBLE)
                       / max(h), 2) END AS est_distinct
FROM topk {grp_by} {order}"""


def hll_rolling(
    df: DataFrame, key: Column, bucket_col: str, window: int = 7
) -> DataFrame:
    """Rolling ``window``-bucket distinct estimate by HLL register MERGE —
    the mergeability payoff of sketching: rolling 7-day distinct users
    computed exactly once per day from per-day register state, where the
    exact equivalent re-shuffles ``window`` days of RAW keys per output
    day (at 100 TB, a window-sized scan per day vs day × 128 longs here).

    Register max is associative/commutative, so "merge the last ``window``
    days" is a bounded explode of register rows (each day's registers
    contribute to ``window`` target days), one (day, bucket) max re-agg,
    and the shared finalize.  Absent days contribute nothing (register 0);
    output is restricted to OBSERVED buckets via a semi-join.  The
    register frame is |days| × ≤128 rows — metadata-sized no matter the
    corpus."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    regs = hll_registers(df, key, group_cols=(bucket_col,))
    return hll_rolling_finalize(regs, bucket_col, window)


def hll_rolling_finalize(
    regs: DataFrame, bucket_col: str, window: int = 7
) -> DataFrame:
    """The read-time half of :func:`hll_rolling`, split out so STORED
    register state can be rolled up directly — the streaming pipeline
    maintains per-day registers incrementally (``st_hll_rolling``) and
    this merge+estimate runs on the drained table without touching raw
    keys."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    contribs = regs.select(
        F.explode(F.sequence(F.lit(0), F.lit(window - 1))).alias("__off"),
        F.col(bucket_col).alias("__b"),
        "bucket",
        "m_j",
    ).select((F.col("__b") + F.col("__off")).alias("__t"), "bucket", "m_j")
    observed = regs.select(F.col(bucket_col).alias("__t")).distinct()
    merged = (
        contribs.join(observed, "__t", "left_semi")
        .groupBy("__t", "bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    return hll_finalize(merged, ("__t",)).withColumnRenamed("__t", bucket_col)


def hll_rolling_oracle_sql(
    source_sql: str, bucket_col: str, key_expr: str, window: int = 7
) -> str:
    """DuckDB replay of :func:`hll_rolling` — same registers, bounded
    explode merge and estimator."""
    from fineo_readerator_spark.llm_ops.dedup_oracles import _hexparse

    h = _hexparse(f"md5({key_expr})", 1, 15)
    bucket, m_j = _oracle_reg_exprs()
    return f"""
WITH h AS (
  SELECT {bucket_col} AS b, {h} AS h FROM ({source_sql})
),
regs AS (SELECT b, {bucket}, {m_j} FROM h GROUP BY 1, 2),
contribs AS (
  SELECT b + off AS t, bucket, m_j
  FROM regs, unnest(generate_series(0, {window - 1})) s(off)
),
merged AS (
  SELECT t, bucket, max(m_j) AS m_j FROM contribs
  WHERE t IN (SELECT DISTINCT b FROM regs) GROUP BY t, bucket
)
SELECT t AS {bucket_col}, {_oracle_est_expr()} AS est_distinct,
       count(*) AS registers_set
FROM merged GROUP BY t
"""


def quantile_sketch_audit(
    df: DataFrame,
    value_col: str,
    width: float,
    quantiles: tuple = (0.5, 0.9, 0.99),
    lo: float = 0.0,
) -> DataFrame:
    """Measure-first audit of the histogram quantile sketch against the
    EXACT interpolated percentile — the knn_recall_audit doctrine applied
    to the quantile family: before dashboards trust ``width``-binned
    p50/p90/p99, measure what the bin width actually costs on this
    distribution.  One row per quantile: the sketch estimate, the exact
    percentile (1e-6-rounded; Spark ``percentile`` ≡ DuckDB
    ``quantile_cont`` — same interpolation formula), and ``err = est −
    exact``.  err is usually in ``[0, width)`` (the estimate is a bin's
    inclusive upper edge) but CAN be negative against the interpolated
    definition when a quantile falls between order statistics spanning a
    bin boundary — the audit reports, it does not assert.

    Scale shape: the sketch side is the mergeable bin table; the exact
    side is ONE percentile aggregate (Spark's single-pass approximation-
    free percentile over the value column) — the audit is what you run
    at commissioning time on a sample or a slice, priced accordingly."""
    v = F.col(value_col).cast("double")
    sk = histogram_quantiles(df, value_col, width, quantiles, lo)
    qcsv = ", ".join(repr(float(q)) for q in quantiles)
    exact = (
        df.filter(v.isNotNull())
        .agg(F.expr(f"percentile({value_col}, array({qcsv}))").alias("__ex"))
        .select(F.posexplode("__ex").alias("__i", "__exact"))
        .select(
            F.element_at(
                F.array(*[F.lit(float(q)) for q in quantiles]), F.col("__i") + 1
            ).alias("q"),
            F.round(F.col("__exact"), 6).alias("exact_p"),
        )
    )
    return (
        sk.join(exact, "q")
        .select(
            "q",
            "n_rows",
            "est",
            "exact_p",
            F.round(F.col("est") - F.col("exact_p"), 6).alias("err"),
        )
    )


def quantile_sketch_audit_oracle_sql(
    source_sql: str,
    value_expr: str,
    width: float,
    quantiles: tuple = (0.5, 0.9, 0.99),
    lo: float = 0.0,
) -> str:
    """DuckDB replay of :func:`quantile_sketch_audit` — the sketch replay
    joined to quantile_cont exacts with the same rounding and op order."""
    sk = histogram_quantiles_oracle_sql(source_sql, value_expr, width, quantiles, lo)
    qlist = ", ".join(repr(float(q)) for q in quantiles)
    return f"""
WITH __sk AS ({sk}),
__exact AS (
  SELECT u.q, round(u.e, 6) AS exact_p
  FROM (
    SELECT unnest([{qlist}]) AS q,
           unnest(quantile_cont(CAST({value_expr} AS DOUBLE), [{qlist}])) AS e
    FROM ({source_sql}) WHERE {value_expr} IS NOT NULL
  ) u
)
SELECT s.q, s.n_rows, s.est, e.exact_p,
       round(s.est - e.exact_p, 6) AS err
FROM __sk s JOIN __exact e ON s.q = e.q
"""
