"""Entity resolution (operators.entity): blocking, scoring, gates."""
import pytest
from pyspark.sql import functions as F

from fineo_readerator_spark.operators.entity import entity_match


@pytest.fixture()
def ref(spark):
    return spark.createDataFrame(
        [
            (1, "Acme Corp", "NY"),
            (2, "Acme Group", "NY"),
            (3, "Bolt Ltd", "NY"),
            (4, "Acme Corp", "CA"),
        ],
        "rid long, name string, state string",
    )


def test_entity_match_picks_min_distance_in_block(spark, ref):
    dirty = spark.createDataFrame(
        [(100, "acme corp", "NY")], "mid long, mention string, state string"
    )
    out = entity_match(
        dirty, ref, ["state"], "mid", "rid", "mention", "name", k=2
    ).collect()
    # block NY: candidates 1/2/3; case-folded "Acme Corp" wins at distance 2,
    # "Acme Group" second; the CA twin (distance 2 too) is outside the block
    assert [(r["matched_rid"], r["rank"]) for r in out] == [(1, 1), (2, 2)]
    assert out[0]["distance"] == 2


def test_entity_match_tie_breaks_by_right_id(spark, ref):
    # two reference rows at the same distance: lower rid wins rank 1
    dirty = spark.createDataFrame(
        [(100, "Acme Corp", "NY")], "mid long, mention string, state string"
    )
    dup = ref.union(
        spark.createDataFrame([(0, "Acme Corp", "NY")], ref.schema)
    )
    out = entity_match(dirty, dup, ["state"], "mid", "rid", "mention", "name", k=2)
    rows = out.collect()
    assert [(r["matched_rid"], r["distance"], r["rank"]) for r in rows] == [
        (0, 0, 1),
        (1, 0, 2),
    ]


def test_entity_match_max_distance_drops_far_candidates(spark, ref):
    dirty = spark.createDataFrame(
        [(100, "zzzzzz", "NY")], "mid long, mention string, state string"
    )
    out = entity_match(
        dirty, ref, ["state"], "mid", "rid", "mention", "name", max_distance=2
    )
    assert out.count() == 0  # non-matches are absent, not NULL rows


def test_entity_match_null_text_never_ranks(spark, ref):
    """r8 ADVICE (medium): a NULL-text reference row scored a NULL distance,
    which Spark's asc window sorted NULLS FIRST — it took rank 1 and
    displaced real matches, while the DuckDB oracle (NULLS LAST) disagreed.
    Unscorable candidates are dropped in BOTH engines now."""
    import duckdb
    import pyarrow as pa

    from fineo_readerator_spark.operators.entity import entity_match_oracle_sql

    ref_null = ref.union(
        spark.createDataFrame(
            [(0, None, "NY")], "rid long, name string, state string"
        )
    )
    dirty = spark.createDataFrame(
        [(100, "acme corp", "NY"), (101, None, "NY")],
        "mid long, mention string, state string",
    )
    out = entity_match(
        dirty, ref_null, ["state"], "mid", "rid", "mention", "name", k=2
    ).collect()
    # rid=0 (NULL name) must not appear at any rank; NULL-mention left rows
    # have no scorable candidate at all
    assert [(r["mid"], r["matched_rid"], r["rank"]) for r in out] == [
        (100, 1, 1),
        (100, 2, 2),
    ]
    con = duckdb.connect()
    con.register(
        "dirty",
        pa.table({"mid": [100, 101], "mention": ["acme corp", None], "state": ["NY", "NY"]}),
    )
    con.register(
        "refs",
        pa.table(
            {
                "rid": [1, 2, 3, 4, 0],
                "name": ["Acme Corp", "Acme Group", "Bolt Ltd", "Acme Corp", None],
                "state": ["NY", "NY", "NY", "CA", "NY"],
            }
        ),
    )
    exp = con.execute(
        entity_match_oracle_sql(
            "SELECT * FROM dirty", "SELECT * FROM refs", ["state"],
            "mid", "rid", "mention", "name", k=2,
        )
    ).fetchall()
    assert sorted(tuple(r) for r in out) == sorted(tuple(r) for r in exp)


def test_entity_match_requires_blocking(spark, ref):
    with pytest.raises(ValueError, match="blocking"):
        entity_match(ref, ref, [], "rid", "rid", "name", "name")


def test_entity_match_gates_hot_blocks(spark, ref):
    dirty = spark.createDataFrame(
        [(100, "acme corp", "NY")], "mid long, mention string, state string"
    )
    with pytest.raises(ValueError, match="block sizing"):
        entity_match(
            dirty, ref, ["state"], "mid", "rid", "mention", "name",
            max_block_rows=2,
        )
    # explicit higher bound passes
    assert (
        entity_match(
            dirty, ref, ["state"], "mid", "rid", "mention", "name",
            max_block_rows=3,
        ).count()
        == 1
    )


def test_soundex_oracle_replica_matches_spark(spark):
    """The DuckDB soundex replica (functions.phonetic.soundex_oracle_expr)
    must reproduce Spark's native soundex EXACTLY — it is the oracle side
    of the phonetic blocking key, and this DuckDB ships no soundex.  Edge
    cases pin the refinement rules (first-letter collapse, H/W
    transparency, vowel/non-letter separators, non-alpha-initial
    identity); the seeded fuzz sweeps mixed alpha/punctuation strings."""
    import random

    import duckdb

    from fineo_readerator_spark.functions.phonetic import soundex_oracle_expr

    words = [
        "Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak", "Pfister",
        "Honeyman", "Wu", "Hw", "a", "e", "HHHH", "WWWW", "Aeiou", "bcd",
        "Jackson", "lloyd", "moses", "CZARKOWSKA", "Customer#0001", "",
        "x1y", "x1c", "ab#cd", "a b", "ab cd", "Aé", "aBc", "s1s", "ss1s",
        "Rr", "RobertX1234567890abc", "  spaced", "éclair",
    ]
    rng = random.Random(7)
    chars = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 #-_."
    words += [
        "".join(rng.choice(chars) for _ in range(rng.randint(1, 12)))
        for _ in range(400)
    ]
    sdf = spark.createDataFrame([(w,) for w in words], "w string")
    got_spark = {r.w: r.sx for r in sdf.selectExpr("w", "soundex(w) AS sx").collect()}
    con = duckdb.connect()
    con.register("words", __import__("pandas").DataFrame({"w": words}))
    expr = soundex_oracle_expr("w")
    got_duck = dict(con.execute(f"SELECT w, {expr} FROM words").fetchall())
    assert got_spark == got_duck
