"""HTTP service layer: route/status/envelope parity with the reference
Flask app (/root/reference/core/endpoints.py) via Flask's test_client —
no socket, real request dispatch."""

import pytest

flask = pytest.importorskip("flask")

from pr2_transformation_spark.service import create_app
from pr2_transformation_spark.sources.catalog import Catalog


@pytest.fixture()
def client(spark, tmp_path):
    cat = Catalog(spark, root=str(tmp_path / "lake"))
    src = spark.createDataFrame(
        [("900000001", "1", "[]"), ("900000002", "0", "[123456789]")],
        "`Connect_ID` string, `d_820476880` string, `d_236590500_d_236590500` string",
    )
    cat.write(src, "proj.FlatConnect.module9")
    app = create_app(cat, audit_dir=str(tmp_path / "sql"))
    app.config["TESTING"] = True
    return app.test_client(), cat


def test_heartbeat_route(client):
    c, _ = client
    resp = c.get("/heartbeat")
    assert resp.status_code == 200
    body = resp.get_json()
    assert body["status"] == "healthy"  # reference envelope verbatim (core/endpoints.py:15)
    assert body["service"] == "pr2-transformation-spark"
    assert "timestamp" in body


def test_missing_params_abort_400(client):
    c, _ = client
    for route in ("/clean_columns", "/clean_rows", "/merge_table_versions",
                  "/create_sensitive_tier"):
        assert c.post(route, json={}).status_code == 400
        assert c.post(route, json={"source": "a.b.c"}).status_code == 400
        assert c.post(route, json={"destination": "a.b.c"}).status_code == 400
    # no JSON body at all is also a 400, not a 500
    assert c.post("/clean_rows").status_code == 400


def test_clean_rows_route_end_to_end(client):
    c, cat = client
    resp = c.post(
        "/clean_rows",
        json={"source": "proj.FlatConnect.module9",
              "destination": "proj.CleanConnect.module9"},
    )
    assert resp.status_code == 200
    body = resp.get_json()
    assert body["service"] == "pr2-transformation-spark"
    assert "timestamp" in body
    assert "successfully created" in body["status"]["status"]
    out = {r["Connect_ID"]: r for r in cat.read("proj.CleanConnect.module9").collect()}
    assert out["900000001"]["d_820476880"] == "353358909"


def test_merge_route_joins_versions(client, spark):
    c, cat = client
    v2 = spark.createDataFrame(
        [("900000003", "0", "[]")],
        "`Connect_ID` string, `d_820476880` string, `d_236590500_d_236590500` string",
    )
    cat.write(v2, "proj.FlatConnect.module9_v2")
    resp = c.post(
        "/merge_table_versions",
        json={"source": ["proj.FlatConnect.module9", "proj.FlatConnect.module9_v2"],
              "destination": "proj.CleanConnect.merged"},
    )
    assert resp.status_code == 200
    assert cat.read("proj.CleanConnect.merged").count() == 3
    # <2 sources violates the merge contract (reference
    # transformations.merge_table_versions raises inside the handler's try)
    # -> 500 envelope, matching the reference's observable behavior.
    resp = c.post(
        "/merge_table_versions",
        json={"source": "proj.FlatConnect.module9",
              "destination": "proj.CleanConnect.merged2"},
    )
    assert resp.status_code == 500
    assert "at least two" in resp.get_json()["message"]


def test_internal_error_returns_500_envelope(client):
    c, _ = client
    resp = c.post(
        "/clean_rows",
        json={"source": "proj.FlatConnect.does_not_exist",
              "destination": "proj.CleanConnect.x"},
    )
    assert resp.status_code == 500
    body = resp.get_json()
    assert body["error"] == "Internal Server Error"
    assert body["message"]
