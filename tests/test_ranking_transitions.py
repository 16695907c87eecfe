"""Unit tests: event transition mining and retrieval ranking metrics."""
import pytest
from pyspark.sql import functions as F

from fineo_readerator_spark.llm_ops.ranking import ranking_metrics
from fineo_readerator_spark.operators.transitions import event_transitions


@pytest.fixture()
def events(spark):
    # user 1: a->b->a->c ; user 2: a->b ; ts tie inside user 3 broken by id
    rows = [
        (1, 1, 100, "a"),
        (2, 1, 200, "b"),
        (3, 1, 300, "a"),
        (4, 1, 400, "c"),
        (5, 2, 100, "a"),
        (6, 2, 200, "b"),
        (7, 3, 100, "a"),
        (8, 3, 100, "b"),  # same ts: id 7 < 8 => a->b
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string"
    )


def test_event_transitions_counts_and_ppm(events):
    out = {
        (r.prev_type, r.next_type): (r.n, r.share_ppm)
        for r in event_transitions(events).collect()
    }
    # from 'a': a->b x3 (u1, u2, u3), a->c x1  => 750000 / 250000 ppm
    assert out[("a", "b")] == (3, 750_000)
    assert out[("a", "c")] == (1, 250_000)
    # from 'b': b->a x1 (u1 only; u2 and u3 end at b)
    assert out[("b", "a")] == (1, 1_000_000)
    assert ("c", "a") not in out  # c is terminal


def test_event_transitions_ts_tie_breaks_by_id(spark):
    # both events at ts=100: id order decides direction
    df = spark.createDataFrame(
        [(2, 1, 100, "x"), (1, 1, 100, "y")],
        "event_id long, user_id long, ts long, event_type string",
    )
    rows = event_transitions(df).collect()
    assert [(r.prev_type, r.next_type) for r in rows] == [("y", "x")]


@pytest.fixture()
def run(spark):
    # one query, ranks 1..5, relevant at ranks 2 and 5
    return spark.createDataFrame(
        [(10, d, r) for r, d in enumerate([100, 101, 102, 103, 104], start=1)],
        "query_id long, doc_id long, rank int",
    )


def test_ranking_metrics_hand_computed(spark, run):
    qrels = spark.createDataFrame(
        [(10, 101), (10, 104), (10, 999)],  # 999: relevant but not retrieved
        "query_id long, doc_id long",
    )
    r = ranking_metrics(run, qrels, k=5).collect()[0]
    assert (r.n_rel, r.hits) == (3, 2)
    assert r.rr_ppm == 500_000  # first relevant at rank 2 -> floor(1e6/2)
    assert r.prec_ppm == 400_000  # 2/5
    # dcg = disc[2] + disc[5]; idcg = disc[1]+disc[2]+disc[3] (n_rel=3)
    from fineo_readerator_spark.llm_ops.ranking import _discounts

    d = _discounts(5)
    dcg, idcg = d[1] + d[4], d[0] + d[1] + d[2]
    assert r.ndcg_ppm == (dcg * 2_000_000 + idcg) // (2 * idcg)


def test_ranking_metrics_no_hits_and_missing_qrels(spark, run):
    qrels = spark.createDataFrame([(99, 1)], "query_id long, doc_id long")
    r = ranking_metrics(run, qrels, k=5).collect()[0]
    # query 10 has NO qrels at all: every metric zero, not NULL
    assert (r.n_rel, r.hits, r.rr_ppm, r.prec_ppm, r.ndcg_ppm) == (0, 0, 0, 0, 0)


def test_ranking_metrics_rejects_bad_k(spark, run):
    with pytest.raises(ValueError, match="k must be"):
        ranking_metrics(run, run.select("query_id", "doc_id"), k=0)


def test_ranking_metrics_oracle_matches_spark(spark):
    """Cross-engine guard on the metric arithmetic itself (the registry
    query s_rank_eval covers the full pipeline; this isolates the op)."""
    import duckdb
    import pandas as pd

    from fineo_readerator_spark.llm_ops.ranking import ranking_metrics_oracle_sql

    run_rows = [(q, q * 10 + r, r) for q in (1, 2) for r in range(1, 6)]
    qrel_rows = [(1, 12), (1, 15), (2, 21), (2, 22), (2, 23), (2, 999)]
    run = spark.createDataFrame(run_rows, "query_id long, doc_id long, rank int")
    qrels = spark.createDataFrame(qrel_rows, "query_id long, doc_id long")
    got = sorted(
        tuple(r) for r in ranking_metrics(run, qrels, k=5).collect()
    )
    con = duckdb.connect()
    con.register("run_t", pd.DataFrame(run_rows, columns=["query_id", "doc_id", "rank"]))
    con.register("qrel_t", pd.DataFrame(qrel_rows, columns=["query_id", "doc_id"]))
    sql = ranking_metrics_oracle_sql("SELECT * FROM run_t", "SELECT * FROM qrel_t", k=5)
    exp = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == exp


def test_path_ngrams_counts_windows(events):
    from fineo_readerator_spark.operators.transitions import path_ngrams

    out = {r.path: r.n for r in path_ngrams(events, n=3).collect()}
    # user 1 (a,b,a,c): a>b>a and b>a>c; users 2/3 are too short for n=3
    assert out == {"a>b>a": 1, "b>a>c": 1}


def test_path_ngrams_rejects_short_n(events):
    from fineo_readerator_spark.operators.transitions import path_ngrams

    with pytest.raises(ValueError, match="path length"):
        path_ngrams(events, n=1)


def test_linear_attribution_hand_computed(spark):
    from fineo_readerator_spark.operators.transitions import linear_attribution

    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)

    def at(ms: int) -> datetime:
        return t0 + timedelta(milliseconds=ms)

    # user 1: view@1000, click@2000, buy@2500, window 2000 -> both credited
    #         at 500000 each; click@2500 shares the conversion ts ->
    #         excluded (strict <)
    # user 2: buy@9000 with NO touches in window -> conversion drops out
    # user 3: view@100, buy@5000 -> view older than the window
    rows = [
        (1, 1, at(1000), "view"),
        (2, 1, at(2000), "click"),
        (3, 1, at(2500), "click"),
        (4, 1, at(2500), "buy"),
        (5, 2, at(9000), "buy"),
        (6, 3, at(100), "view"),
        (7, 3, at(5000), "buy"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {
        r.event_type: (r.n_touches, r.n_conversions, r.credit_ppm)
        for r in linear_attribution(df, "buy", 2000).collect()
    }
    assert out == {"view": (1, 1, 500_000), "click": (1, 1, 500_000)}


def test_linear_attribution_rejects_bad_window(spark, events):
    from fineo_readerator_spark.operators.transitions import linear_attribution

    with pytest.raises(ValueError, match="window_ms"):
        linear_attribution(events, "a", 0)


def test_cusum_shift_finds_level_step(spark):
    from fineo_readerator_spark.operators.anomaly import cusum_shift

    # 4 buckets at 10, then 4 at 30: the cumulative deviation from the
    # global mean (20) peaks at bucket 4 (cusum = -40 * 8... scaled form:
    # s_k*D - k*T with D=8, T=160 -> at k=4: 40*8 - 4*160 = -320)
    rows = [(b, 10 if b <= 4 else 30) for b in range(1, 9)]
    df = spark.createDataFrame(rows, "bucket long, v long")
    r = cusum_shift(df, "bucket", "v").collect()[0]
    assert (r.n_buckets, r.total) == (8, 160)
    assert (r.peak_bucket, r.peak_cusum) == (4, -320)
    assert r.direction == "below-then-rise"


def test_cusum_tie_breaks_to_earliest_bucket(spark):
    from fineo_readerator_spark.operators.anomaly import cusum_shift

    # symmetric bump: |cusum| ties between the rise and fall edges
    df = spark.createDataFrame(
        [(1, 0), (2, 2), (3, 0)], "bucket long, v long"
    )
    r = cusum_shift(df, "bucket", "v").collect()[0]
    assert r.peak_bucket == 1  # k=1: 0*3-1*2 = -2 ; k=2: 2*3-2*2 = +2 tie
    assert r.peak_cusum == -2


def test_preference_pairs_tie_breaks_and_margin_gate(spark):
    from fineo_readerator_spark.llm_ops.sampling import preference_pairs

    rows = [
        ("g1", 1, 10), ("g1", 2, 30), ("g1", 3, 30),  # chosen=2 (tie->min id)
        ("g2", 4, 5), ("g2", 5, 5),                   # margin 0 -> dropped
        ("g3", 6, 7),                                 # singleton -> dropped
    ]
    df = spark.createDataFrame(rows, "grp string, id long, score long")
    out = {r.grp: r for r in preference_pairs(df, ["grp"], "id", "score").collect()}
    assert list(out) == ["g1"]
    r = out["g1"]
    assert (r.chosen_id, r.chosen_score) == (2, 30)
    assert (r.rejected_id, r.rejected_score) == (1, 10)
    assert r.margin == 20

    with pytest.raises(ValueError, match="group columns"):
        preference_pairs(df, [], "id", "score")


def test_transitions_fuzz_vs_duckdb(spark):
    """Seeded random event streams (ts ties included): event_transitions
    must match its DuckDB oracle row-for-row."""
    import random

    import duckdb
    import pandas as pd

    from fineo_readerator_spark.operators.transitions import (
        event_transitions_oracle_sql,
    )

    rng = random.Random(11)
    for _ in range(4):
        rows = [
            (
                eid,
                rng.randint(1, 6),               # user
                rng.randint(1, 20),               # ts with plenty of ties
                rng.choice("abcd"),
            )
            for eid in range(1, rng.randint(10, 60))
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts long, event_type string"
        )
        got = sorted(tuple(r) for r in event_transitions(df).collect())
        con = duckdb.connect()
        con.register(
            "ev", pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"])
        )
        exp = sorted(
            tuple(r)
            for r in con.execute(
                event_transitions_oracle_sql("SELECT * FROM ev")
            ).fetchall()
        )
        assert got == exp


def test_attribution_fuzz_vs_duckdb(spark):
    """Seeded random touch/conversion mixes: linear_attribution must match
    its DuckDB oracle (epoch_ms alignment, strict-< boundary, floor
    credit)."""
    import random
    from datetime import datetime, timedelta

    import duckdb
    import pandas as pd

    from fineo_readerator_spark.operators.transitions import (
        linear_attribution,
        linear_attribution_oracle_sql,
    )

    rng = random.Random(13)
    t0 = datetime(2024, 3, 1)
    for _ in range(4):
        rows = [
            (
                eid,
                rng.randint(1, 5),
                t0 + timedelta(milliseconds=rng.randint(0, 50_000)),
                rng.choice(["view", "click", "buy"]),
            )
            for eid in range(1, rng.randint(15, 70))
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        got = sorted(
            tuple(r) for r in linear_attribution(df, "buy", 10_000).collect()
        )
        con = duckdb.connect()
        con.execute("SET TimeZone='UTC'")
        con.register(
            "ev", pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"])
        )
        exp = sorted(
            tuple(r)
            for r in con.execute(
                linear_attribution_oracle_sql("SELECT * FROM ev", "buy", 10_000)
            ).fetchall()
        )
        assert got == exp


def test_attribution_plan_has_no_cartesian(spark):
    """The touch x conversion candidate join must stay a USER-keyed
    equi-join with a range residual — never a cartesian product."""
    from fineo_readerator_spark.plans.relational_queries import q_attribution

    df = q_attribution(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert df.count() > 0


def test_session_cooccurrence_hand_counts(spark):
    """Four sessions: {a,b}, {a,b}, {a}, {c}.  Pair (a,b) co-occurs in 2 of
    4 sessions with n_a=3, n_b=2 -> lift = 2*4/(3*2) = 1.3333, ppm half-up
    1333333; the singleton (a,c) pair is cut by min_sessions."""
    from fineo_readerator_spark.operators.transitions import session_cooccurrence

    rows = [
        (1, 0, "a"), (1, 1000, "b"),
        (2, 0, "a"), (2, 500, "b"),
        (3, 0, "a"), (3, 10_000_000, "c"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long, event_type string")
    out = session_cooccurrence(df, gap=1_800_000, min_sessions=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.item_a, r.item_b, r.n_ab, r.lift_ppm) == ("a", "b", 2, 1333333)


def test_dyadic_ewma_hand_values(spark):
    """Days [0,1,3] with counts [2,4,8] at window=2 (weights 2,1 over the
    constant mass 3): day0 -> 4/3, day1 -> (2*4+2)/3, day3 -> 16/3 (day 2
    absent contributes 0), each half-up at milli scale."""
    import pytest as _pt

    from fineo_readerator_spark.operators.anomaly import dyadic_ewma

    rows = [(0, 2), (1, 4), (3, 8)]
    df = spark.createDataFrame(rows, "day long, one long")
    # pre-aggregated values ride in as repeated units via groupBy sum
    out = {r.bucket: (r.n, r.ewma_milli)
           for r in dyadic_ewma(df, "day", "one", window=2).collect()}
    assert out == {0: (2, 1333), 1: (4, 3333), 3: (8, 5333)}

    with _pt.raises(ValueError, match="window"):
        dyadic_ewma(df, "day", "one", window=0)


def test_session_cooccurrence_fuzz_vs_python(spark):
    """Random event streams through session_cooccurrence must match a
    direct Python sessionize + pair-count + integer-lift evaluation."""
    import random
    from collections import defaultdict

    from fineo_readerator_spark.operators.transitions import session_cooccurrence

    rng = random.Random(23)
    for trial in range(3):
        gap = rng.choice([5, 50])
        rows = []
        for u in range(rng.randint(1, 5)):
            t = 0
            for _ in range(rng.randint(1, 12)):
                t += rng.randint(1, 100)
                rows.append((u, t, rng.choice("wxyz")))
        df = spark.createDataFrame(rows, "user_id long, ts_ms long, event_type string")
        got = {(r.item_a, r.item_b): (r.n_ab, r.lift_ppm)
               for r in session_cooccurrence(
                   df, gap=gap, k=100, min_sessions=1).collect()}
        # python model
        sessions = []
        by_user = defaultdict(list)
        for u, t, it in rows:
            by_user[u].append((t, it))
        for u, evs in by_user.items():
            evs.sort()
            cur, prev = set(), None
            for t, it in evs:
                if prev is not None and t - prev > gap:
                    sessions.append(cur)
                    cur = set()
                cur.add(it)
                prev = t
            sessions.append(cur)
        S = len(sessions)
        n_item = defaultdict(int)
        n_pair = defaultdict(int)
        for s in sessions:
            for it in s:
                n_item[it] += 1
            items = sorted(s)
            for i in range(len(items)):
                for j in range(i + 1, len(items)):
                    n_pair[(items[i], items[j])] += 1
        exp = {}
        for (a, b), nab in n_pair.items():
            denom = n_item[a] * n_item[b]
            exp[(a, b)] = (nab, (nab * S * 2_000_000 + denom) // (denom * 2))
        assert got == exp, f"trial {trial} gap {gap}"
