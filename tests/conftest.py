from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM small


@pytest.fixture(scope="session")
def spark():
    from fineo_readerator_spark.session import get_spark

    spark = get_spark("fineo-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def rows_as_dicts(df):
    return [r.asDict(recursive=True) for r in df.collect()]


@pytest.fixture(scope="module", autouse=True)
def _drain_jvm_state(request):
    """Clear cached blocks and force a JVM GC at module boundaries.

    The suite shares one SparkSession; operators localCheckpoint
    multi-consumer frames, and those blocks (plus deferred garbage) pile
    up across hundreds of tests until every action crawls — the measured
    effect is 10-100x on late modules (a fuzzer that runs in 9 s on a
    fresh JVM took 1263 s at the end of the full suite; the same
    mechanism the scale-check harness drains between operators)."""
    yield
    try:
        import gc

        from fineo_readerator_spark.session import get_spark

        spark = get_spark("fineo-tests", shuffle_partitions=8)
        spark.catalog.clearCache()
        # Python gc first: checkpointed-RDD blocks are only reapable once
        # the py4j handles die; then the JVM gc lets ContextCleaner run
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass  # no active session (pure-python module) — nothing to drain


_drain_counter = {"n": 0}


@pytest.fixture(autouse=True)
def _drain_every_n_tests():
    """Intra-module drain: the oracle-parity module alone runs ~190
    Spark-heavy tests, so module-boundary draining still lets blocks pile
    up inside it (its tail tests measured 4-10x slower than isolated).
    Every 25 tests, same drain as the module fixture."""
    yield
    _drain_counter["n"] += 1
    if _drain_counter["n"] % 25 == 0:
        try:
            import gc

            from fineo_readerator_spark.session import get_spark

            spark = get_spark("fineo-tests", shuffle_partitions=8)
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
