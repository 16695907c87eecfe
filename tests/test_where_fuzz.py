"""Property-based fuzz of the §2.7 WHERE surface: random predicates from
the declared grammar (comparisons on user fields / timestamp, NULL tests,
AND/OR/NOT with parentheses) run through the metric layer and must match
DuckDB row-for-row.  The fixed m_* queries pin specific shapes; this covers
the combinatorial space between them.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fineo_readerator_spark.plans.metric_queries import (
    METRIC,
    ORG,
    T_HI,
    T_LO,
    USER_COLS,
    events_store,
)
from fineo_readerator_spark.recombinator import build_metric_df

_NUM_OPS = ["<", "<=", ">", ">=", "=", "<>"]

value_atom = st.builds(
    lambda op, lit: f"value {op} {lit}",
    st.sampled_from(_NUM_OPS),
    st.sampled_from(["20.0", "100.0", "250.0", "500.0"]),
)
type_atom = st.sampled_from(
    [
        "event_type = 'click'",
        "event_type <> 'view'",
        "event_type IN ('purchase', 'error')",
        "event_type IS NOT NULL",
    ]
)
ts_atom = st.sampled_from(
    [
        f"timestamp > {T_LO}",
        f"timestamp <= {T_HI}",
        f"timestamp BETWEEN {T_LO} AND {T_HI}",
        f"timestamp < {T_LO} OR timestamp >= {T_HI}",
    ]
)
null_atom = st.sampled_from(["props IS NOT NULL", "props IS NULL"])
user_atom = st.builds(
    lambda op, lit: f"user_id {op} {lit}",
    st.sampled_from(_NUM_OPS),
    st.sampled_from(["10", "75", "140"]),
)

atom = st.one_of(value_atom, type_atom, ts_atom, null_atom, user_atom)


@st.composite
def predicate(draw, depth=2):
    if depth == 0 or draw(st.booleans()):
        a = draw(atom)
        return f"NOT ({a})" if draw(st.booleans()) else a
    left = draw(predicate(depth=depth - 1))
    right = draw(predicate(depth=depth - 1))
    op = draw(st.sampled_from(["AND", "OR"]))
    return f"({left} {op} {right})"


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    return con


# deep-fuzz knob: FUZZ_EXAMPLES=150 for an offline hunt; default stays
# cheap enough for the routine suite
_EXAMPLES = int(os.environ.get("FUZZ_EXAMPLES", "15"))


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicate())
def test_where_grammar_matches_duckdb(spark, sf_dir, duck, pred):
    df = build_metric_df(
        spark, events_store(sf_dir), ORG, METRIC, predicate=pred, sort=False
    ).select(*USER_COLS)
    got = sorted(tuple(str(r[c]) for c in USER_COLS) for r in df.collect())
    oracle_pred = pred.replace("timestamp", "epoch_ms(ts)")
    cols = 'epoch_ms(ts) AS "timestamp", event_id, user_id, event_type, value, props'
    rows = duck.execute(f"SELECT {cols} FROM events WHERE {oracle_pred}").fetchall()
    exp = sorted(tuple(str(v) for v in r) for r in rows)
    assert got == exp, f"predicate {pred!r}: {len(got)} vs {len(exp)} rows"


# --- same grammar through the SPLIT two-store metric -----------------------
# historical + nearline over one parquet with the anti-overlap cutover: the
# engine's core composition (union + cutover + pruning + predicate) must be
# row-identical to the single-table oracle for every predicate — any
# double-read of the overlap region or over-pruned source shows up as a
# row-count/hash break.


@settings(
    max_examples=max(_EXAMPLES - 3, 5),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicate())
def test_split_store_cutover_matches_duckdb(spark, sf_dir, duck, pred):
    df = build_metric_df(
        spark,
        events_store(sf_dir, split=True),
        ORG,
        METRIC,
        predicate=pred,
        sort=False,
    ).select(*USER_COLS)
    got = sorted(tuple(str(r[c]) for c in USER_COLS) for r in df.collect())
    oracle_pred = pred.replace("timestamp", "epoch_ms(ts)")
    cols = 'epoch_ms(ts) AS "timestamp", event_id, user_id, event_type, value, props'
    rows = duck.execute(f"SELECT {cols} FROM events WHERE {oracle_pred}").fetchall()
    exp = sorted(tuple(str(v) for v in r) for r in rows)
    assert got == exp, f"split-store predicate {pred!r}: {len(got)} vs {len(exp)} rows"
