"""HTTP read-serving facade (reference: readerator Avatica server + REST
proxy — api-key tenant validation, rows-as-maps, read-only, row caps)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from fineo_readerator_spark.api import TenantSession
from fineo_readerator_spark.schema_store import FieldDef, MetricSchema, SchemaStore
from fineo_readerator_spark.server import ReadServer
from fineo_readerator_spark.sources import SourceSpec

ORG = "org1"
KEY = "sekrit"


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("srv")
    rows = [
        {"companykey": ORG, "metrictype": "metricA", "timestamp": i, "writetime": i, "f_int": i * 10}
        for i in range(5)
    ]
    spark.createDataFrame(
        rows, "companykey string, metrictype string, timestamp long, writetime long, f_int int"
    ).write.mode("overwrite").parquet(str(tmp / "hist"))
    st = SchemaStore()
    st.register_metric(MetricSchema(org=ORG, metric="metricA", fields=[FieldDef("f_int", "int")]))
    st.add_source(ORG, "metricA", SourceSpec(kind="historical", path=str(tmp / "hist")))
    srv = ReadServer(TenantSession(spark, st, ORG), api_key=KEY)
    port = srv.start()
    yield f"http://127.0.0.1:{port}"
    srv.stop()


def _post(url, body, key=KEY):
    req = urllib.request.Request(
        f"{url}/query",
        data=json.dumps(body).encode(),
        headers={"content-type": "application/json", **({"x-api-key": key} if key else {})},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_query_rows_as_maps(server):
    status, out = _post(server, {"sql": "SELECT timestamp, f_int FROM metricA ORDER BY timestamp"})
    assert status == 200
    assert out["columns"] == ["timestamp", "f_int"]
    assert out["rows"][0] == {"timestamp": 0, "f_int": 0}
    assert len(out["rows"]) == 5


def test_values_smoke(server):
    # the reference's proxy smoke test: VALUES(1)
    status, out = _post(server, {"sql": "VALUES (1)"})
    assert status == 200 and len(out["rows"]) == 1


def test_bad_api_key_rejected(server):
    status, out = _post(server, {"sql": "SELECT 1"}, key="wrong")
    assert status == 403 and "validation" in out["error"]
    status, _ = _post(server, {"sql": "SELECT 1"}, key=None)
    assert status == 403


def test_write_rejected(server):
    status, out = _post(server, {"sql": "DROP TABLE metricA"})
    assert status == 400 and "read-only" in out["error"]


def test_max_rows_cap(server):
    status, out = _post(server, {"sql": "SELECT * FROM metricA", "max_rows": 2})
    assert status == 200 and len(out["rows"]) == 2


def test_analysis_error_is_client_error(server):
    status, out = _post(server, {"sql": "SELECT nope FROM metricA"})
    assert status == 400 and "error" in out
