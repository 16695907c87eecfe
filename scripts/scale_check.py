#!/usr/bin/env python
"""Empirical scale validation of SCALE.md's claims.

Builds a 10x fixture from the sf0.1 driver tables and measures the five
heaviest operators at both scales, writing ``SCALE_CHECK.md`` with the
measured scaling exponents  alpha = log(t_10x / t_1x) / log(10)
(alpha ~ 1 = linear, 2 = quadratic).

The fixture replicates each table 10x with STRUCTURE-PRESERVING
perturbations, so per-replica duplicate/near-dup topology is identical to
the original and cross-replica collisions are impossible — total work
scales exactly 10x when the operator is linear:

- documents: replica r Caesar-shifts the alphabet by r — a char-level
  BIJECTION, so within-replica word/char structure is exactly isomorphic
  (same shingle counts, same fingerprint-df distribution) while replica
  vocabularies are disjoint (no spurious mega-clusters).  An earlier
  token-SUFFIX scheme failed this: suffixing every token with the same
  digit homogenized the char 8-grams and collapsed winnowing-fingerprint
  diversity 3x, silently changing what the span-overlap operator measures.
- embeddings: replica r cyclically shifts vector components by r —
  within-replica geometry identical (permutation preserves norms and
  pairwise cosines), cross-replica vectors decorrelate.
- orders/lineitem: replica r offsets the join key by r * 10^9 — join
  fan-out per key unchanged.

Run on an idle machine (the bench hygiene rule applies here too):

    python scripts/scale_check.py
"""

from __future__ import annotations

import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from fineo_readerator_spark.session import get_spark  # noqa: E402

REPO = Path(__file__).resolve().parents[1]
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FIXTURE = REPO / ".scale_check" / "sf1x"
FIXTURE100 = REPO / ".scale_check" / "sf100x"
X100_SECTION = REPO / ".scale_check" / "x100_section.md"
REPLICAS = 10
REPLICAS100 = 100
OFF = 10**9
# customer replicas use a NON-ROUND stride: with the round OFF every
# replica of key K kept K's low 9 digits, so every name-SUFFIX block (the
# entity-match blocking key) aliased across all replicas and in-block
# candidate volume grew quadratically with the replica count — the 100×
# entity knob row measured the fixture artifact, not the operator.  9973
# is coprime with 10^5, so replica r shifts the low-5-digit window by
# r·9973 mod 10^5 (per-replica suffix structure still isomorphic,
# cross-replica suffix collisions ~uniform); the stride still exceeds the
# base key range, so keys stay unique.
CUST_STRIDE = OFF + 9973


def build_fixture(spark) -> None:
    from fineo_readerator_spark.plans.registry import (
        snapshot_is_fresh,
        source_fingerprint,
        stamp_snapshot,
    )

    # "v6:" = fixture-builder version salt (non-round customer stride): the
    # stamp otherwise only tracks SOURCE files, so a builder change would
    # silently serve the old fixture
    fp = "v6:" + "+".join(
        source_fingerprint(SRC, t)
        for t in ("documents", "embeddings", "orders", "lineitem", "events", "customer")
    )
    if snapshot_is_fresh(FIXTURE, fp):
        return
    print(f"building {REPLICAS}x fixture under {FIXTURE} ...", file=sys.stderr)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    # shift the FULL alnum alphabet (lower, upper, digits): leaving any
    # class unshifted would let those chars collide across replicas and
    # break the per-replica isomorphism the linearity baseline relies on
    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()
    digits = "0123456789"
    parts = [docs]
    for r in range(1, REPLICAS):
        src_a = lower + upper + digits
        dst_a = (
            lower[r:] + lower[:r]
            + upper[r:] + upper[:r]
            + digits[r % 10:] + digits[: r % 10]
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + r * OFF).alias("doc_id"),
                F.translate(F.col("text"), src_a, dst_a).alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            ).select(*docs.columns)
        )
    _union_write(parts, FIXTURE / "documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    parts = [emb]
    dim_shift = (
        "transform(sequence(0, size(embedding) - 1),"
        " i -> embedding[(i + {r}) % size(embedding)])"
    )
    for r in range(1, REPLICAS):
        parts.append(
            emb.select(
                (F.col("vec_id") + r * OFF).alias("vec_id"),
                F.expr(dim_shift.format(r=r)).alias("embedding"),
                "label",
            ).select(*emb.columns)
        )
    _union_write(parts, FIXTURE / "embeddings.parquet")

    for table, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        parts = [df]
        for r in range(1, REPLICAS):
            parts.append(
                df.withColumn(key, F.col(key) + r * OFF).select(*df.columns)
            )
        _union_write(parts, FIXTURE / f"{table}.parquet")

    # events: replica r is a disjoint user/event population in the SAME
    # time window — the realistic scale-up for the event-analytics ops
    # (retention/funnel/stickiness/anomaly): 10x users, constant date
    # range, so spines/matrices stay fixed-size while scans grow 10x
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    parts = [ev]
    for r in range(1, REPLICAS):
        parts.append(
            ev.withColumn("event_id", F.col("event_id") + r * OFF)
            .withColumn("user_id", F.col("user_id") + r * OFF)
            .select(*ev.columns)
        )
    _union_write(parts, FIXTURE / "events.parquet")

    # customer: replica keys offset AND names REGENERATED from the new key
    # (the name is 'Customer#' + digits of the key, so per-replica name
    # structure — digit suffix blocking included — stays isomorphic while
    # cross-replica names can never collide; 12-digit pad because offset
    # keys outgrow the original 9 digits)
    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    parts = [cust]
    for r in range(1, REPLICAS):
        key = F.col("c_custkey") + r * CUST_STRIDE
        parts.append(
            cust.select(
                key.alias("c_custkey"),
                F.concat(
                    F.lit("Customer#"), F.lpad(key.cast("string"), 12, "0")
                ).alias("c_name"),
                *[c for c in cust.columns if c not in ("c_custkey", "c_name")],
            ).select(*cust.columns)
        )
    _union_write(parts, FIXTURE / "customer.parquet")
    stamp_snapshot(FIXTURE, fp)


def _union_write(parts, dest: Path) -> None:
    from functools import reduce

    out = reduce(lambda a, b: a.unionByName(b), parts)
    out.write.mode("overwrite").parquet(str(dest))


def build_fixture_100(spark) -> None:
    """The 100× fixture for the heavy-five leg — same structure-preserving
    discipline as the 10× fixture, with two scheme upgrades the bigger
    replica count forces:

    - documents: the Caesar shift has only 26 distinct rotations, so at 100
      replicas r and r+26 would carry IDENTICAL text (cross-replica exact
      dups — the dedup cascade would collapse them and the measured work
      would scale ~26×, not 100×).  Replica r instead applies a SEEDED
      RANDOM PERMUTATION of the full alnum alphabet — still a char
      bijection (per-replica structure exactly isomorphic), with ~0
      collision probability between any two replicas.
    - embeddings: the cyclic dimension shift has only `dim` rotations;
      replica r additionally multiplies by a seeded ±1 SIGN PATTERN —
      norms and within-replica pairwise cosines are untouched
      (Σ sᵢ²xᵢyᵢ = Σ xᵢyᵢ), cross-replica vectors decorrelate.
    - orders/lineitem: key offsets, as at 10× (join fan-out per key
      unchanged).  Same-generator data at both scales keeps the exponent
      clean — swapping in dbgen data at one scale only would change the
      key/text distribution mid-measurement.
    """
    import random as _random

    from fineo_readerator_spark.plans.registry import (
        snapshot_is_fresh,
        source_fingerprint,
        stamp_snapshot,
    )

    # v5 adds replicated events (two-decade legs for the event-analytics
    # family); v4: non-round customer stride (suffix-block aliasing fix);
    # v3 added replicated customer; v2 per-replica RNG sign-flip streams
    fp = "v5:" + "+".join(
        source_fingerprint(SRC, t)
        for t in ("documents", "embeddings", "orders", "lineitem", "customer", "events")
    )
    if snapshot_is_fresh(FIXTURE100, fp):
        return
    print(f"building {REPLICAS100}x fixture under {FIXTURE100} ...", file=sys.stderr)

    alnum = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = [docs]
    for r in range(1, REPLICAS100):
        dst = list(alnum)
        _random.Random(1000 + r).shuffle(dst)
        parts.append(
            docs.select(
                (F.col("doc_id") + r * OFF).alias("doc_id"),
                F.translate(F.col("text"), alnum, "".join(dst)).alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            ).select(*docs.columns)
        )
    _union_write(parts, FIXTURE100 / "documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    # flip-pool length only: max over per-row sizes (NULL-safe, unlike a
    # first()-row len which crashes on a NULL first row).  The rotation
    # itself indexes by EACH row's own size — the 10x builder's form — so a
    # wrong-dim row replicates as the same wrong-dim row (rankability status
    # preserved), never as a right-length array of NULL elements.
    dim = emb.agg(F.max(F.size("embedding"))).first()[0]
    if not dim:
        raise ValueError("embeddings.parquet has no non-NULL embedding rows")
    parts = [emb]
    for r in range(1, REPLICAS100):
        # one RNG stream per replica — per-(r, i) seeds could collide
        # across replicas for dim > seed spacing
        rng = _random.Random(2000 + r)
        flips = [1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)]
        flip_arr = "array(" + ",".join(f"{v!r}D" for v in flips) + ")"
        parts.append(
            emb.select(
                (F.col("vec_id") + r * OFF).alias("vec_id"),
                F.expr(
                    # size()=0 guard: sequence(0, -1) DESCENDS ([0, -1]),
                    # it is not empty — pass empty arrays through unchanged
                    "CASE WHEN size(embedding) = 0 THEN embedding ELSE "
                    "transform(sequence(0, size(embedding) - 1),"
                    f" i -> CAST(embedding[(i + {r}) % size(embedding)] AS DOUBLE)"
                    f" * {flip_arr}[i % {dim}]) END"
                ).cast(emb.schema["embedding"].dataType).alias("embedding"),
                "label",
            ).select(*emb.columns)
        )
    _union_write(parts, FIXTURE100 / "embeddings.parquet")

    for table, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        parts = [df]
        for r in range(1, REPLICAS100):
            parts.append(
                df.withColumn(key, F.col(key) + r * OFF).select(*df.columns)
            )
        _union_write(parts, FIXTURE100 / f"{table}.parquet")

    # customer: same key-offset + name-regeneration scheme as the 10x
    # fixture (names follow the new key, so per-replica digit structure is
    # isomorphic and cross-replica names cannot collide)
    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    parts = [cust]
    for r in range(1, REPLICAS100):
        key = F.col("c_custkey") + r * CUST_STRIDE
        parts.append(
            cust.select(
                key.alias("c_custkey"),
                F.concat(
                    F.lit("Customer#"), F.lpad(key.cast("string"), 12, "0")
                ).alias("c_name"),
                *[c for c in cust.columns if c not in ("c_custkey", "c_name")],
            ).select(*cust.columns)
        )
    _union_write(parts, FIXTURE100 / "customer.parquet")

    # events: 100x disjoint user/event populations in the SAME time window
    # (the 10x scheme at two decades): scans grow 100x, date spines and
    # type vocabularies stay fixed — the realistic event-analytics scale-up
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    parts = [ev]
    for r in range(1, REPLICAS100):
        parts.append(
            ev.withColumn("event_id", F.col("event_id") + r * OFF)
            .withColumn("user_id", F.col("user_id") + r * OFF)
            .select(*ev.columns)
        )
    _union_write(parts, FIXTURE100 / "events.parquet")
    stamp_snapshot(FIXTURE100, fp)


def _semantic_dedup_default(spark, sf_dir: str):
    """Semantic dedup on the DEFAULT path — n_centroids=None delegates to
    hyperplane-LSH cells (n_planes ~ log2(N/target)), so buckets grow with
    the corpus at O(N·logN) assignment cost without the caller tuning
    anything.  The registry query pins n_centroids=16 for oracle
    determinism; this measures the default."""
    from fineo_readerator_spark.llm_ops.similarity import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(F.col("vec_id") != 0)
    kept = semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.35, target_rows_per_cell=125
    )
    return kept.select("vec_id", "label", "cell")


def _knn_graph_default(spark, sf_dir: str):
    """k-NN graph on the DEFAULT path — hyperplane-LSH cells (n_planes ~
    log2(N/target)), so bucket count grows with the corpus at O(N·logN)
    assignment cost.  The auto-sized SEEDED codebook was the measured
    100× trap: nearest-of-C assignment is O(N·C) = O(N²/target) — the
    pagerank 100× leg clocked its second decade at α≈1.25 before the
    default switched.  The registry query pins n_centroids=16 for oracle
    determinism; this measures the default."""
    from fineo_readerator_spark.llm_ops.similarity import knn_graph

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return knn_graph(emb, k=3)


def _pagerank_default(spark, sf_dir: str):
    """PageRank over the DEFAULT (LSH-cell) graph: the graph build is the
    dominant cost (the fixed-16-cells registry row is the measured α≈0.93
    hazard); per-round joins are edge-linear either way."""
    from fineo_readerator_spark.llm_ops.similarity import pagerank

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return pagerank(emb, k=3, n_iters=2)


def _label_prop_default(spark, sf_dir: str):
    """Label propagation over the DEFAULT (LSH-cell) graph (same hazard
    contrast as pagerank: the registry row pins 8 cells)."""
    from fineo_readerator_spark.llm_ops.similarity import label_propagation

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    seed = F.when(F.col("vec_id") % 25 == 0, F.col("label"))
    return label_propagation(emb, seed, k=3, n_iters=2)


def _entity_match_base(spark, sf_dir: str, suffix_len: int):
    from fineo_readerator_spark.operators.entity import entity_match

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    blk = F.substring(F.col("c_name"), -suffix_len, suffix_len).alias("blk")
    dirty = cust.filter(F.col("c_custkey") % 3 == 0).select(
        (F.col("c_custkey") + 50_000_000_000).alias("mention_id"),
        F.lower(F.col("c_name")).alias("mention"),
        "c_nationkey",
        blk,
    )
    ref = cust.select("c_custkey", "c_name", "c_nationkey", blk)
    return entity_match(
        dirty, ref, ["c_nationkey", "blk"], "mention_id", "c_custkey",
        "mention", "c_name", k=1, max_distance=5,
    )


def _entity_match_fixed(spark, sf_dir: str):
    """Hazard row: the registry blocking key — (nation, last-3 digits) —
    held FIXED while the corpus grows, so both sides of every block grow
    10x and in-block candidate volume grows ~100x.  The record-linkage
    twin of the fixed-16-cells rows; ``max_block_rows`` is the gate."""
    return _entity_match_base(spark, sf_dir, 3)


def _entity_match_knob(spark, sf_dir: str):
    """Knob row: the blocking suffix lengthens with the corpus
    (ceil(log10(N/15)) digits ≈ constant expected block size — one more
    digit per 10x), holding per-block candidate volume flat: the 100 TB
    blocking regime."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = cust.count()
    k = max(3, math.ceil(math.log10(max(n, 10) / 15.0)))
    return _entity_match_base(spark, sf_dir, k)


def main() -> None:
    load1 = os.getloadavg()[0]
    if load1 > 1.0:
        print(f"WARNING: load {load1:.2f} > 1 — numbers will be noisy", file=sys.stderr)
    spark = get_spark("scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    build_fixture(spark)

    from fineo_readerator_spark.plans.queries import QUERIES

    ops = {
        "d_paragraph_dedup": QUERIES["d_paragraph_dedup"].fn,
        "d_tfidf_pairs": QUERIES["d_tfidf_pairs"].fn,
        "s_knn_graph (16 cells fixed)": QUERIES["s_knn_graph"].fn,
        "knn_graph (DEFAULT lsh cells)": _knn_graph_default,
        "d_minhash_dedup": QUERIES["d_minhash_dedup"].fn,
        "d_incremental_dedup": QUERIES["d_incremental_dedup"].fn,
        "s_ann_ivf_pruned": QUERIES["s_ann_ivf_pruned"].fn,
        "q_colocated_join": QUERIES["q_colocated_join"].fn,
        "d_span_overlap": QUERIES["d_span_overlap"].fn,
        "t_bm25_topk": QUERIES["t_bm25_topk"].fn,
        "s_ann_pq": QUERIES["s_ann_pq"].fn,
        "d_semantic_dedup_layout (16 cells fixed)": QUERIES["d_semantic_dedup_layout"].fn,
        "semantic_dedup (DEFAULT lsh cells)": _semantic_dedup_default,
        # iterative algorithms: per-iteration cost is one corpus pass (k-means
        # assignment+update; logistic gradient), so both must scale linearly
        "s_kmeans (C=8, 2 iters)": QUERIES["s_kmeans"].fn,
        "t_quality_classifier (3 GD iters)": QUERIES["t_quality_classifier"].fn,
        # paragraph-frequency join: shuffle = paragraph cardinality (linear)
        "d_boilerplate": QUERIES["d_boilerplate"].fn,
        # (id, token) agg + id-keyed window: both corpus-linear
        "t_token_entropy": QUERIES["t_token_entropy"].fn,
        # inverted-index containment: max_df caps the per-shingle fan-out,
        # so candidate pairs grow with docs, not docs²
        "d_containment": QUERIES["d_containment"].fn,
        # per merge round: pair-count agg over VOCABULARY rows — vocab grows
        # ~10x here (disjoint replica alphabets), the worst case for the claim
        "t_bpe_merges": QUERIES["t_bpe_merges"].fn,
        # graph cost dominates (16 cells fixed — same documented hazard as
        # s_knn_graph); the per-round joins are edge-linear
        "s_pagerank (16 cells fixed)": QUERIES["s_pagerank"].fn,
        "pagerank (DEFAULT lsh cells)": _pagerank_default,
        "label_propagation (DEFAULT lsh cells)": _label_prop_default,
        # one posexplode pass into a labels x 2 x dim agg
        "s_embed_drift": QUERIES["s_embed_drift"].fn,
        # event analytics: 10x users in the SAME window — scans 10x,
        # spines/matrices constant
        "q_retention": QUERIES["q_retention"].fn,
        "q_user_funnel": QUERIES["q_user_funnel"].fn,
        "q_stickiness": QUERIES["q_stickiness"].fn,
        "q_anomaly_zscore": QUERIES["q_anomaly_zscore"].fn,
        # blocked record linkage: fixed blocking key = the measured hazard
        # (block membership x10 on both sides => in-block pairs x100);
        # suffix-grows-with-corpus = the knob that holds block size flat
        "q_entity_match (fixed last-3 blocking)": _entity_match_fixed,
        "entity_match (suffix ~ log10(N) blocking)": _entity_match_knob,
        # (id, term) agg + broadcast df/n + one per-doc window: corpus-linear
        # (replica vocabularies are disjoint, so df rows also grow 10x —
        # the worst case for the broadcast-stats claim)
        "t_keywords": QUERIES["t_keywords"].fn,
        # per-doc hash bits + two windows on one (id, pos) ordering:
        # row-local, corpus-linear
        "p_span_corrupt": QUERIES["p_span_corrupt"].fn,
        # row-local HOF chunking with ZERO shuffle (plan-pinned in tests):
        # must be exactly corpus-linear
        "t_cdc_chunks": QUERIES["t_cdc_chunks"].fn,
        # one dim-sized per-dimension max agg + a broadcast scales row;
        # the corpus-side quantization never shuffles
        "s_embed_int8": QUERIES["s_embed_int8"].fn,
        # ONE user-keyed window shuffle; the count output is |types|^2
        "q_transitions": QUERIES["q_transitions"].fn,
        # user-keyed equi-join with a time-range residual: fan-out bounded
        # by per-user window activity (users replicate 10x, per-user
        # activity constant -> candidate volume must scale ~linearly)
        "q_attribution": QUERIES["q_attribution"].fn,
        # bigram+unigram aggs with min_count pruning before the un-hinted
        # vocabulary joins; replica vocabularies are disjoint, so the
        # vocab grows 10x too — the worst case for the join sizing
        "t_collocations": QUERIES["t_collocations"].fn,
        # two metadata aggs + one map-side-combined bucket rollup;
        # the Morton-key projection is pure codegen
        "q_zorder_profile": QUERIES["q_zorder_profile"].fn,
        # persisted-layout consumers: the measured cost is stored-edge
        # read + iterate/aggregate — the c16 graph BUILD lands once in
        # the warm pass (the production re-attach shape)
        "s_ppr_layout (stored edges)": QUERIES["s_ppr_layout"].fn,
        "s_graph_degrees (stored edges)": QUERIES["s_graph_degrees"].fn,
        # hashed-feature importance selection: the ratio table is bounded
        # at n_buckets BY CONSTRUCTION (replica vocabularies are disjoint
        # and 10x larger — the worst case the hashing absorbs); token
        # aggs are corpus-linear
        "p_dsir_select": QUERIES["p_dsir_select"].fn,
        # one user-keyed sessionize shuffle; pair fanout bounded by the
        # event-type vocabulary, never corpus rows
        "q_cooccur_lift": QUERIES["q_cooccur_lift"].fn,
        # register merge: day-keyed bounded explode over |days| x <=128
        # register rows — raw keys are scanned once, merged as sketches
        "a_hll_rolling": QUERIES["a_hll_rolling"].fn,
        # bucket agg + constant-fanout explode: day-keyed throughout
        "q_ewma_smooth": QUERIES["q_ewma_smooth"].fn,
        # one codegen'd regexp projection: must be exactly corpus-linear
        "t_readability": QUERIES["t_readability"].fn,
        # postings filtered to the phrase's terms BEFORE the position
        # joins: work tracks matching postings, not corpus tokens
        "t_phrase_search": QUERIES["t_phrase_search"].fn,
        # one bucket agg + |days|-sized EWMA/phase math
        "q_seasonal_decompose": QUERIES["q_seasonal_decompose"].fn,
        # two user-keyed aggs + one co-partitioned join
        "q_convert_latency": QUERIES["q_convert_latency"].fn,
        # peel rounds are two semi-joins + a degree agg over O(N·k) edges
        "s_kcore_layout (stored edges)": QUERIES["s_kcore_layout"].fn,
        # power rounds on the (id, pos) grain: N·dim rows, map-side combined
        "s_top_direction": QUERIES["s_top_direction"].fn,
        # ---- r10 additions ----
        # shingle pass per side + ONE hash-keyed anti-join (nothing
        # broadcast — the reference is corpus-scale); replica vocabularies
        # are disjoint so the reference gram set grows 10x too
        "t_ngram_novelty": QUERIES["t_ngram_novelty"].fn,
        # byte histogram: ≤256 agg rows per payload regardless of size
        "mm_byte_entropy": QUERIES["mm_byte_entropy"].fn,
        # candidate-set-sized verification on top of the minhash cascade
        "d_edit_verify": QUERIES["d_edit_verify"].fn,
        # wedge join bounded by the in-degree cap over stored edges
        "s_jaccard_neighbors (stored edges)": QUERIES["s_jaccard_neighbors"].fn,
        # one corpus token agg, then |sources|x200 moment math
        "t_zipf_fit": QUERIES["t_zipf_fit"].fn,
        # row-local regexp projection — must be corpus-linear
        "t_code_detect": QUERIES["t_code_detect"].fn,
    }

    results = _measure(spark, ops, ((SRC, "1x"), (str(FIXTURE), "10x")))

    lines = [
        "# SCALE_CHECK — measured scaling of the heaviest operators",
        "",
        f"10x fixture: sf0.1 tables replicated {REPLICAS}x with structure-preserving",
        "perturbations (Caesar-shifted documents — a char bijection, so replica",
        "word/char structure is exactly isomorphic while vocabularies are disjoint;",
        "dimension-rotated embeddings; key-offset orders/lineitem) — per-replica",
        "dup/near-dup topology identical, cross-replica collisions impossible, so",
        "linear operators must take ~10x.",
        f"Measured on local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}], MEDIAN of",
        "3 runs after a cache-building warm pass (min-of-N rewards the warmest",
        "cache state and inflates α — the r9 denominator lesson); the ± column",
        "is the max−min spread of the 3 samples, so a noisy row is visible.",
        "Compare the RAW times across rounds, not α in isolation.",
        f"1-min load at start: {load1:.2f}.",
        "",
        "| operator | t(1x) s | ± | rows(1x) | t(10x) s | ± | rows(10x) | exponent α |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, r in results.items():
        t1, n1, s1 = r["1x"]
        t10, n10, s10 = r["10x"]
        # rounded-to-zero sub-ms timings must not kill the report after all
        # the measuring is done — below clock resolution there is no exponent
        a = f"{math.log(t10 / t1) / math.log(10):.2f}" if t1 > 0 and t10 > 0 else "n/a"
        lines.append(f"| {name} | {t1} | {s1} | {n1} | {t10} | {s10} | {n10} | {a} |")
    lines += [
        "",
        "α = log(t₁₀ₓ/t₁ₓ)/log(10): 1.0 = linear, 2.0 = quadratic.  Sub-second",
        "1x timings carry fixed JVM/planning overhead, so α < 1 readings mean",
        "'dominated by constant cost', not superlinear risk.  The two",
        "'16 cells fixed' rows (semantic dedup, k-NN graph — and pagerank,",
        "whose cost IS its graph build) exist to SHOW the hazard",
        "`_gate_cell_sizing` exists for — rows/cell grows 10x, so the",
        "in-cell O(n²) pair volume grows ~100x (partially masked here by idle",
        "cores at 1x) — semantic dedup and the graph each have a knob-applied",
        "row holding rows/cell constant, the 100 TB regime, and the same knob",
        "governs every graph consumer (pagerank, label propagation, recall).",
        "",
    ]
    if os.environ.get("SPARK_GRAFT_SCALE_ONLY"):
        print("SPARK_GRAFT_SCALE_ONLY set — not writing SCALE_CHECK.md", file=sys.stderr)
        return
    body = "\n".join(lines)
    if X100_SECTION.exists():
        body += X100_SECTION.read_text()
    (REPO / "SCALE_CHECK.md").write_text(body)
    print("wrote SCALE_CHECK.md", file=sys.stderr)


def _measure(spark, ops, legs) -> dict:
    # diagnosis hook (mirrors bench.py's SPARK_GRAFT_BENCH_ONLY): comma list
    # of substrings — run just the matching ops, e.g. to check two
    # back-to-back runs agree on α without paying for the full sweep
    only = os.environ.get("SPARK_GRAFT_SCALE_ONLY")
    if only:
        keys = [s.strip() for s in only.split(",") if s.strip()]
        ops = {n: f for n, f in ops.items() if any(k in n for k in keys)}
    results: dict[str, dict] = {name: {} for name in ops}
    for sf_dir, tag in legs:
        for name, fn in ops.items():
            # warm pass builds the per-dir layout caches (store, IVF cells,
            # bucketed layout) — one-time index builds, not query cost.
            # Every big-leg op (and heavy rows at any leg) drains FIRST —
            # run-B evidence: d_containment's 100× hash agg OOM'd the whole
            # JVM on heap still holding five span samples' blocks — and any
            # op's warm pass gets one deep-drain retry so a transient
            # memory-pressure failure can't kill a 50-minute sweep
            if tag != "1x" or any(h in name for h in _HEAVY_SPREAD_ROWS):
                _drain(spark)
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as e:
                print(
                    f"{name} {tag}: warm pass failed ({type(e).__name__}) — "
                    "deep-draining and retrying once",
                    file=sys.stderr,
                )
                _drain(spark)
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            # MEDIAN of 3 timed runs, not min-of-2: the r9 α-denominator
            # lesson — min() rewards whichever run hit the warmest cache
            # state, which on the 1× leg shrinks t₁ₓ and inflates α with
            # zero change in the big-leg work (d_tfidf/d_span swung
            # 0.62→0.83 across same-code runs).  The median is stable
            # against one lucky/unlucky run in either direction, and the
            # spread is recorded so a noisy row is visible in the table.
            # r11 spread fix: the two heavy text rows (span_overlap, tfidf)
            # swung ±22-24 s at 100× — per-sample logs showed the swing is
            # SELF-POLLUTION, not plan flips: each sample re-materializes the
            # op's own multi-GB localCheckpoint blocks, and the async
            # ContextCleaner releases sample k's blocks DURING sample k+1,
            # so later samples run against a heap full of dying blocks (the
            # same mechanism as the inter-op lesson below, one level down).
            # For those rows: drain between SAMPLES too, and take 5 samples
            # so the median sits on a 3-deep stable core.
            heavy = any(h in name for h in _HEAVY_SPREAD_ROWS)
            n_samples = 5 if heavy else 3
            samples, rows = [], 0
            for k in range(n_samples):
                if k and heavy:
                    _drain(spark)
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                rows = df.count()
                samples.append(time.perf_counter() - t0)
            raw = [round(s, 2) for s in samples]
            samples.sort()
            med = samples[n_samples // 2]
            spread = samples[-1] - samples[0]
            results[name][tag] = (round(med, 3), rows, round(spread, 3))
            print(
                f"{name:50s} {tag:>4s}: {med:7.3f}s ±{spread:6.3f}  ({rows} rows)"
                f"  samples={raw}",
                file=sys.stderr,
            )
            # the bench.py lesson: shared-JVM cache blocks (incl. prior runs'
            # localCheckpoints) and deferred GC taint the NEXT measurement —
            # drop state and collect at operator boundaries, not inside them.
            # localCheckpoint blocks release via the ASYNC ContextCleaner
            # only after their RDD is GC'd: one measured x100 run OOM'd a
            # later op's AQE broadcast because tfidf's 9M-row checkpoint
            # blocks were still queued for cleanup — gc twice and give the
            # cleaner a beat to drain before the next op is measured
            _drain(spark)
    return results


# rows whose 100× samples carry multi-GB of per-sample localCheckpoint
# blocks; measured with inter-SAMPLE drains and a 5-sample median
_HEAVY_SPREAD_ROWS = ("d_span_overlap", "d_tfidf_pairs")


def _drain(spark) -> None:
    """Drop cached relations and give the async ContextCleaner a beat to
    actually release checkpoint/shuffle blocks before the next timing.

    Polls the JVM heap instead of a fixed two-GC ritual: checkpoint
    blocks release only after the ContextCleaner processes the GC'd RDD
    references, which can take several GC+drain cycles when the previous
    op left multi-GB behind (run-A evidence: d_span_overlap's 100× warm
    pass OOM'd its AQE broadcast right after five 9M-row tfidf samples —
    the fixed ritual had not reclaimed enough heap)."""
    spark.catalog.clearCache()
    jvm = spark.sparkContext._jvm
    rt = jvm.java.lang.Runtime.getRuntime()
    used_prev = None
    for _ in range(6):
        jvm.System.gc()
        time.sleep(2)
        used = rt.totalMemory() - rt.freeMemory()
        if used_prev is not None and used > used_prev * 0.98:
            break  # heap stopped shrinking — cleaner has drained
        used_prev = used


def _semantic_dedup_lsh_knob(spark, sf_dir: str):
    """The 100 TB semantic-dedup shape: hyperplane-bucketed cells (plan cost
    constant in cell count), target_rows_per_cell pinned so both legs run
    the same knob.  The fixed-16-cell layout row CANNOT be taken to 100× —
    it is the documented hazard (α 1.18 at 10× already); its 100× story IS
    this row."""
    from fineo_readerator_spark.llm_ops.similarity import semantic_dedup_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(F.col("vec_id") != 0)
    kept = semantic_dedup_lsh(
        emb, "vec_id", "embedding", threshold=0.35, target_rows_per_cell=64
    )
    return kept.select("vec_id", "label", "cell")


def _triangles_default(spark, sf_dir: str):
    """Triangle counts over the DEFAULT-LSH k-NN graph — the production
    shape at scale (a fixed-16-cell build is the documented hazard); the
    wedge join is O(N·k²) on the k-regular edge set."""
    from fineo_readerator_spark.llm_ops.similarity import graph_triangles, knn_graph

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    edges = knn_graph(emb, k=3, n_centroids=None).select("vec_id", "nbr_id")
    return graph_triangles(edges)


def x100_main() -> None:
    """The 100× leg: the five heaviest operators at 1× (sf0.1) and at the
    100× fixture — one far point to catch superlinear terms the 10× run
    masks with idle cores.  Appends a section to SCALE_CHECK.md (persisted
    in .scale_check/ so the 10× refresh keeps it)."""
    load1 = os.getloadavg()[0]
    if load1 > 1.0:
        print(f"WARNING: load {load1:.2f} > 1 — numbers will be noisy", file=sys.stderr)
    spark = get_spark("scale-check-100x")
    spark.sparkContext.setLogLevel("ERROR")
    build_fixture_100(spark)

    from fineo_readerator_spark.plans.queries import QUERIES

    ops = {
        "d_minhash_dedup": QUERIES["d_minhash_dedup"].fn,
        "semantic_dedup_lsh (hyperplane cells, target 64)": _semantic_dedup_lsh_knob,
        "d_incremental_dedup": QUERIES["d_incremental_dedup"].fn,
        "s_ann_ivf_pruned": QUERIES["s_ann_ivf_pruned"].fn,
        "q_colocated_join": QUERIES["q_colocated_join"].fn,
        # graph consumer on the DEFAULT LSH cells — the 10x knob rows hold
        # at one decade; this is the two-decade confirmation that the
        # buckets~N default keeps the build (the dominant cost) linear
        "pagerank (DEFAULT lsh cells)": _pagerank_default,
        # record linkage with the suffix~log10(N) blocking knob (last-5
        # digits at 1.5M reference rows): block size stays flat across both
        # decades, so candidate volume tracks mentions, not mentions x refs
        "entity_match (suffix ~ log10(N) blocking)": _entity_match_knob,
        # the three text heavies whose 10x exponents (0.41/0.61/0.58) are
        # output-volume-driven IN THEORY (within-replica pair counts grow
        # with replicas, cross-replica pairs impossible) — the two-decade
        # point separates that from a hidden superlinear term:
        # tfidf: candidate pairs via the shared-term index join; replica
        # vocabularies are disjoint, so df rows grow 100x too — the worst
        # case for the unhinted df join
        "d_tfidf_pairs": QUERIES["d_tfidf_pairs"].fn,
        # winnowing-fingerprint index join; output pairs ~100x
        "d_span_overlap": QUERIES["d_span_overlap"].fn,
        # inverted-index containment, max_df-capped per-shingle fan-out
        "d_containment": QUERIES["d_containment"].fn,
        # graph combinatorics on the DEFAULT LSH edges: build O(N·logN·dim),
        # wedge join O(N·k²) on the k-regular set — both corpus-linear
        "triangles (DEFAULT lsh cells)": _triangles_default,
        # event-analytics family at two decades (fixture v5 replicates
        # events: 100x users in the SAME window — spines/vocabularies
        # constant, scans 100x)
        "q_transitions": QUERIES["q_transitions"].fn,
        "q_attribution": QUERIES["q_attribution"].fn,
        "q_cooccur_lift": QUERIES["q_cooccur_lift"].fn,
        "a_hll_rolling": QUERIES["a_hll_rolling"].fn,
        "q_retention": QUERIES["q_retention"].fn,
        # hashed-feature importance selection: the 4096-row ratio table is
        # the bound the hashing buys — constant across both decades while
        # the disjoint replica vocabularies grow 100x
        "p_dsir_select (hashed ratio table, 4096 buckets)": QUERIES["p_dsir_select"].fn,
        # ---- r10: the remaining 10x-only heavies at two decades ----
        # iterative algorithms: per-iteration cost is ONE corpus pass
        # (assignment+update; logistic gradient) — 10x α was 0.05/0.15
        # (constant-cost dominated); the far point separates fixed overhead
        # from any hidden superlinear term
        "s_kmeans (C=8, 2 iters)": QUERIES["s_kmeans"].fn,
        "t_quality_classifier (3 GD iters)": QUERIES["t_quality_classifier"].fn,
        # power iteration: per-round one posexplode aggregate + dim-sized
        # broadcast-back on a 1-row output — 10x α 0.57 read as per-round
        # linear passes; prove it holds at two decades
        "s_top_direction (2 power rounds)": QUERIES["s_top_direction"].fn,
        # (id, term) agg + broadcast df stats under the r8 max_vocab cap;
        # disjoint replica vocabularies grow 100x — the worst case for the
        # capped-vocab claim (10x α 0.27)
        "t_keywords (vocab-capped)": QUERIES["t_keywords"].fn,
        # row-local hash bits + two windows on one (id, pos) ordering
        # (10x α 0.10 — constant-dominated; confirm no hidden term)
        "p_span_corrupt": QUERIES["p_span_corrupt"].fn,
        # ---- r11: the two 10x rows at/above α 0.5 taken to two decades ----
        # banded-DP verification rung on the minhash candidate set: the DP
        # cap and the repartition-to-width constant are exactly the kind of
        # knobs only a second decade confirms (10x α 0.56, output-driven)
        "d_edit_verify": QUERIES["d_edit_verify"].fn,
        # the fixed last-3 blocking HAZARD row at two decades: block
        # membership grows with the corpus on both sides, so in-block pairs
        # grow ~quadratically — expected superlinear (the knob row above is
        # the production shape; this row exists to SHOW the hazard's actual
        # two-decade magnitude, 10x α 0.50)
        "q_entity_match (fixed last-3 blocking)": _entity_match_fixed,
        # r11: the rank is now a distributed two-pass (range partition +
        # local row_number + offset rollup) — this row evidences that the
        # Σi·x_i sort scales with partitions, not one executor's sort buffer
        "q_gini (distributed rank)": QUERIES["q_gini"].fn,
    }
    results = _measure(spark, ops, ((SRC, "1x"), (str(FIXTURE100), "100x")))

    lines = [
        "",
        "## 100× leg — the heavy five (+ graph/linkage knob rows) at two decades",
        "",
        f"100× fixture: sf0.1 replicated {REPLICAS100}× (seeded-PERMUTATION",
        "alphabets for documents — the Caesar scheme has only 26 rotations and",
        "would alias replicas r and r+26 into exact cross-replica dups;",
        "rotation+sign-flip embeddings — norms and within-replica cosines",
        "preserved; key-offset orders/lineitem).  α₁₀₀ = log(t₁₀₀ₓ/t₁ₓ)/log(100).",
        f"Single-JVM heap for this sweep: "
        f"{os.environ.get('SPARK_GRAFT_DRIVER_MEM', '24g')} — 100× of every",
        "table in ONE local JVM is heap-bound in a way a real cluster is",
        "not (aggregate executor memory scales with the fleet); a 24g heap",
        "OOM'd d_containment's 100× hash agg after five span samples, so",
        "the sweep drains before every big-leg warm pass and runs 48g.",
        "Semantic dedup runs the hyperplane-bucketed knob row at BOTH legs — the",
        "fixed-16-cell layout is the documented hazard (α 1.18 at 10×) and is",
        "deliberately not taken to 100×; its production shape is this row.",
        "α₁₀₀ is sensitive to the 1× DENOMINATOR's cache state (a warm 1×",
        "run shrinks t₁ₓ and inflates α with zero change in 100× work):",
        "d_span_overlap has measured 5.70→123.6 s (α 0.67) and 3.35→151.0 s",
        "(α 0.83) across two same-code runs, identical output rows both",
        "times.  Since r10 the timing is the MEDIAN of 3 runs with the",
        "max−min spread in the ± column; compare the RAW times and row",
        "counts across rounds, not α in isolation.",
        "r11 heavy-row protocol: d_span_overlap / d_tfidf_pairs run a",
        "5-sample median with a full cache-drain between SAMPLES — their",
        "r10 ±22-24 s swings were self-pollution (each sample re-",
        "materializes multi-GB localCheckpoint blocks that the async",
        "ContextCleaner releases during the NEXT sample) plus occasional",
        "in-sample GC stalls; the drains pin the median's 3-sample core to",
        "within a few seconds across back-to-back runs (span 141.6→142.4 s,",
        "α 0.84→0.85; tfidf α 0.61→0.63) while max−min still shows any",
        "GC-stalled outlier sample honestly.",
        f"1-min load at start: {load1:.2f}.",
        "",
        "| operator | t(1x) s | ± | rows(1x) | t(100x) s | ± | rows(100x) | exponent α₁₀₀ |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, r in results.items():
        t1, n1, s1 = r["1x"]
        t100, n100, s100 = r["100x"]
        a = (
            f"{math.log(t100 / t1) / math.log(100):.2f}"
            if t1 > 0 and t100 > 0
            else "n/a"
        )
        lines.append(
            f"| {name} | {t1} | {s1} | {n1} | {t100} | {s100} | {n100} | {a} |"
        )
    lines.append("")
    if os.environ.get("SPARK_GRAFT_SCALE_ONLY"):
        print("SPARK_GRAFT_SCALE_ONLY set — not writing SCALE_CHECK.md", file=sys.stderr)
        return
    section = "\n".join(lines)
    X100_SECTION.parent.mkdir(parents=True, exist_ok=True)
    X100_SECTION.write_text(section)

    md = REPO / "SCALE_CHECK.md"
    body = md.read_text() if md.exists() else "# SCALE_CHECK\n"
    marker = "\n## 100× leg"
    if marker in body:
        body = body.split(marker, 1)[0]
    md.write_text(body + section)
    print("wrote SCALE_CHECK.md (100× section)", file=sys.stderr)


if __name__ == "__main__":
    if "--x100" in sys.argv:
        x100_main()
    else:
        main()
