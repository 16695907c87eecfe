"""Property-based fuzz of the PQ/ADC operator against DuckDB: random
float32 vector corpora through ``pq_seeded_topk`` must match the oracle's
encode + ADC replay — codes, estimated distances and the top-k order.

Values are quantized to float32 BEFORE both engines see them (the corpus
column is ``array<float>``; feeding DuckDB the unquantized doubles would
compare different numbers).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fineo_readerator_spark.plans.llm_queries import _s_ann_pq_oracle

_EXAMPLES = int(os.environ.get("FUZZ_EXAMPLES", "10"))

DIM = 8

vec = st.lists(
    st.floats(-8, 8, allow_nan=False, allow_infinity=False, width=32),
    min_size=DIM,
    max_size=DIM,
).map(lambda xs: [float(np.float32(x)) for x in xs])

corpus = st.lists(vec, min_size=3, max_size=16).map(
    lambda vs: [(i, v) for i, v in enumerate(vs)]  # vec_id 0 is the query
)


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=corpus, m=st.sampled_from([2, 4]), n_codes=st.sampled_from([2, 4]))
def test_pq_adc_matches_duckdb(spark, rows, m, n_codes):
    from fineo_readerator_spark.llm_ops.similarity import pq_seeded_topk

    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qv = rows[0][1]
    got = [
        (r.vec_id, r.est_dist)
        for r in pq_seeded_topk(
            df.filter("vec_id != 0"), qv, k=5, m=m, n_codes=n_codes
        ).collect()
    ]
    con = duckdb.connect()
    con.register(
        "embeddings", pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )
    exp = [
        tuple(r)
        for r in con.execute(
            _s_ann_pq_oracle(m=m, sub=DIM // m, n_codes=n_codes, k=5)
        ).fetchall()
    ]
    assert len(got) == len(exp)
    for (gid, gd), (eid, ed) in zip(got, exp):
        assert gid == eid
        assert gd == pytest.approx(ed, abs=1e-8)


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=corpus, n_planes=st.sampled_from([2, 3, 4]), n_probe=st.sampled_from([1, 2, 3]))
def test_lsh_probe_cells_match_python_replay(spark, rows, n_planes, n_probe):
    """lsh_probe_cells_expr against a pure-Python replay of its contract:
    primary = the 1e-9-rounded sign-bit signature, extra probes flip the
    lowest-|margin| planes in (margin, plane-index) order.  Random float32
    corpora hit the sign/tie boundaries the sf-data oracle row can't."""
    from fineo_readerator_spark.llm_ops.similarity import (
        _hyperplanes,
        lsh_probe_cells_expr,
    )

    if n_probe > n_planes + 1:
        n_probe = n_planes + 1
    planes = _hyperplanes(DIM, n_planes, 42)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: list(r.probes)
        for r in df.select(
            "vec_id",
            lsh_probe_cells_expr("embedding", planes, n_probe).alias("probes"),
        ).collect()
    }
    for vid, v in rows:
        # _round_half_up, not round(): the replay must use F.round's HALF_UP
        # semantics or dyadic dot products (exact decimal halves) diverge
        from fineo_readerator_spark.llm_ops.similarity import _round_half_up

        dots = [_round_half_up(sum(float(a) * float(b) for a, b in zip(v, p))) for p in planes]
        sig = sum(1 << i for i, d in enumerate(dots) if d >= 0)
        order = sorted(range(n_planes), key=lambda i: (abs(dots[i]), i))
        exp = [sig] + [sig ^ (1 << i) for i in order[: n_probe - 1]]
        assert got[vid] == exp, (vid, v, dots)


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=corpus, seed=st.integers(0, 2**16))
def test_int8_quantize_and_ann_match_duckdb(spark, rows, seed):
    """quantize_embeddings_int8 and ann_int8_topk replay in DuckDB on
    random float32 corpora."""
    import pyarrow as pa

    from fineo_readerator_spark.llm_ops.similarity import (
        ann_int8_oracle_sql,
        ann_int8_topk,
        quantize_embeddings_int8,
        quantize_int8_oracle_sql,
    )

    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    con = duckdb.connect()
    con.register(
        "vecs",
        pa.table(
            {
                "vec_id": [r[0] for r in rows],
                "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
            }
        ),
    )
    got = sorted(
        tuple(str(v) for v in r)
        for r in quantize_embeddings_int8(df, dim=DIM).collect()
    )
    exp = sorted(
        tuple(str(v) for v in r)
        for r in con.execute(
            quantize_int8_oracle_sql("SELECT vec_id, embedding FROM vecs", dim=DIM)
        ).fetchall()
    )
    assert got == exp
    rng = __import__("random").Random(seed)
    qv = [rng.uniform(-2, 2) for _ in range(DIM)]
    gota = [tuple(r) for r in ann_int8_topk(df, qv, k=5, dim=DIM).collect()]
    expa = [
        tuple(r)
        for r in con.execute(
            ann_int8_oracle_sql(
                "SELECT vec_id, embedding FROM vecs", query_vec=qv, k=5, dim=DIM
            )
        ).fetchall()
    ]
    assert gota == expa


def test_int8_negative_zero_error_normalized(spark):
    """Pinned fuzz find: a -0.0 element yields a -0.0 reconstruction-error
    term whose sign survives DuckDB's round/list_max but not Spark's abs
    chain — both faces now normalize with +0.0, so the audit column is
    +0.0 on each."""
    import pyarrow as pa

    from fineo_readerator_spark.llm_ops.similarity import (
        quantize_embeddings_int8,
        quantize_int8_oracle_sql,
    )

    dim = 8
    rows = [(0, [0.0] * dim), (1, [0.0] * dim), (2, [-0.0] + [0.0] * (dim - 1))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    con = duckdb.connect()
    con.register(
        "vecs",
        pa.table(
            {
                "vec_id": [r[0] for r in rows],
                "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
            }
        ),
    )
    got = sorted(
        tuple(str(v) for v in r)
        for r in quantize_embeddings_int8(df, dim=dim).collect()
    )
    exp = sorted(
        tuple(str(v) for v in r)
        for r in con.execute(
            quantize_int8_oracle_sql("SELECT vec_id, embedding FROM vecs", dim=dim)
        ).fetchall()
    )
    assert got == exp
    assert all(t[2] == "0.0" for t in got)
