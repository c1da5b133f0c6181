"""Live AdMob HTTP source against a canned transport — no network.

Covers X5/S1-live: OAuth refresh-token grant (mint, cache, re-mint on
expiry), report POST shape, spec→API-body round-trip, and the landed
chunk DataFrame flowing through the same flatten kernel as the offline
fixture (reference main.py:21-56 flow).
"""

from __future__ import annotations

import json

import pytest

from admob_data_pipeline_spark.pipelines import JobConfig, dual_report_export_job
from admob_data_pipeline_spark.sources import chunks as chunks_mod
from admob_data_pipeline_spark.sources.http_source import (
    AdMobHttpChunkSource,
    OAuthRefreshTokenAuth,
    spec_to_api_body,
)
from admob_data_pipeline_spark.sources.report_spec import ReportSpec

TOKEN_URI = "https://oauth2.googleapis.com/token"

REPORT_PAYLOAD = [
    {"header": {"dateRange": {}, "localizationSettings": {}}},
    {
        "row": {
            "dimensionValues": {
                "DATE": {"value": "19980901"},
                "APP": {"value": "app1", "displayLabel": "App One"},
            },
            "metricValues": {
                "CLICKS": {"integerValue": "3"},
                "ESTIMATED_EARNINGS": {"microsValue": "1230000"},
                "IMPRESSION_CTR": {"doubleValue": 0.05},
            },
        }
    },
    {
        "row": {
            # displayLabel missing → falls back to value; malformed date →
            # NULL; CLICKS missing → 0; earnings via decimalValue fallback
            "dimensionValues": {
                "DATE": {"value": "1998-XX"},
                "APP": {"value": "app2"},
            },
            "metricValues": {
                "ESTIMATED_EARNINGS": {"decimalValue": "99.5"},
                "IMPRESSION_CTR": {"value": "0.125"},
            },
        }
    },
    {"footer": {"matchingRowCount": "2"}},
]


class FakeTransport:
    """Canned HTTP: token endpoint + report endpoints, recording calls."""

    def __init__(self, expires_in: int = 3600):
        self.calls: list[tuple[str, dict, bytes]] = []
        self.n_tokens = 0
        self.expires_in = expires_in

    def __call__(self, url: str, headers, body: bytes) -> bytes:
        self.calls.append((url, dict(headers), body))
        if url == TOKEN_URI:
            self.n_tokens += 1
            return json.dumps(
                {"access_token": f"tok-{self.n_tokens}", "expires_in": self.expires_in}
            ).encode()
        return json.dumps(REPORT_PAYLOAD).encode()


class FakeClock:
    def __init__(self):
        self.now = 1_000_000.0

    def __call__(self) -> float:
        return self.now


def _auth(clock=None) -> OAuthRefreshTokenAuth:
    return OAuthRefreshTokenAuth(
        client_id="cid",
        client_secret="csec",
        refresh_token="rtok",
        clock=clock or FakeClock(),
    )


def _source(tmp_path, transport=None, clock=None) -> AdMobHttpChunkSource:
    return AdMobHttpChunkSource(
        _auth(clock),
        "accounts/pub-123",
        transport=transport or FakeTransport(),
        landing_dir=str(tmp_path),
    )


SPEC = ReportSpec(
    date_range=("1998-09-01", "1998-09-01"),
    dimensions=("DATE", "APP"),
    metrics=("CLICKS", "ESTIMATED_EARNINGS"),
    dimension_filters={"APP": ("app1", "app2")},
    sort_conditions=(("DATE", "ASCENDING"), ("CLICKS", "DESCENDING")),
)


def test_fetch_flattens_like_offline_source(spark, tmp_path):
    t = FakeTransport()
    src = _source(tmp_path, t)
    chunks = src.fetch(spark, "network", SPEC)
    flat = chunks_mod.flatten_chunks(
        chunks,
        dims=[
            chunks_mod.DimSpec("DATE", "date", "date"),
            chunks_mod.DimSpec("APP", "app_name"),
        ],
        metrics=[
            chunks_mod.MetricSpec("CLICKS", "clicks", "int"),
            chunks_mod.MetricSpec("ESTIMATED_EARNINGS", "earnings", "int"),
            chunks_mod.MetricSpec("IMPRESSION_CTR", "ctr", "float"),
        ],
    )
    rows = {r.app_name: r for r in flat.collect()}
    assert set(rows) == {"App One", "app2"}  # header/footer dropped (S10)
    r1 = rows["App One"]
    assert str(r1.date) == "1998-09-01"
    assert (r1.clicks, r1.earnings, r1.ctr) == (3, 1230000, 0.05)
    r2 = rows["app2"]
    assert r2.date is None  # malformed YYYYMMDD → NULL (P6)
    assert (r2.clicks, r2.earnings, r2.ctr) == (0, 99, 0.125)  # P3/P4 chains


def test_report_request_shape_and_auth_header(spark, tmp_path):
    t = FakeTransport()
    src = _source(tmp_path, t)
    src.fetch(spark, "mediation", SPEC)
    url, headers, body = t.calls[-1]
    assert url == (
        "https://admob.googleapis.com/v1/accounts/pub-123/mediationReport:generate"
    )
    assert headers["Authorization"] == "Bearer tok-1"
    assert json.loads(body) == {"reportSpec": spec_to_api_body(SPEC)}


def test_token_cached_until_expiry(spark, tmp_path):
    t = FakeTransport(expires_in=3600)
    clock = FakeClock()
    src = _source(tmp_path, t, clock)
    src.fetch(spark, "network", SPEC)
    src.fetch(spark, "network", SPEC)
    assert t.n_tokens == 1  # cached
    clock.now += 3600  # past expiry (incl. slack)
    src.fetch(spark, "network", SPEC)
    assert t.n_tokens == 2  # re-minted


def test_spec_round_trips_through_api_body():
    assert ReportSpec.from_dict(spec_to_api_body(SPEC)) == SPEC
    # sort conditions preserve the dimension/metric distinction
    body = spec_to_api_body(SPEC)
    assert body["sortConditions"][0] == {"dimension": "DATE", "order": "ASCENDING"}
    assert body["sortConditions"][1] == {"metric": "CLICKS", "order": "DESCENDING"}


def test_unknown_kind_rejected(tmp_path):
    src = _source(tmp_path)
    with pytest.raises(ValueError, match="unknown report kind"):
        src._url("banner")


def test_env_validation_fails_fast():
    with pytest.raises(ValueError, match="ADMOB_CLIENT_ID"):
        OAuthRefreshTokenAuth.from_env({})
    auth = OAuthRefreshTokenAuth.from_env(
        {
            "ADMOB_CLIENT_ID": "a",
            "ADMOB_CLIENT_SECRET": "b",
            "ADMOB_REFRESH_TOKEN": "c",
        }
    )
    assert auth.client_id == "a"


def test_http_source_drives_export_pipeline(spark, tmp_path):
    """The live source is a drop-in for the offline one end-to-end:
    dual_report_export_job (main.py lifecycle) over the fake API."""
    src = _source(tmp_path / "land")
    (tmp_path / "land").mkdir()
    cfg = JobConfig(
        publisher_id="accounts/pub-123",
        staging_dir=str(tmp_path / "stage"),
        table_dir=str(tmp_path / "tables"),
        report_date=__import__("datetime").date(1998, 9, 1),
    )
    out = dual_report_export_job(spark, cfg, src)
    assert out is not None
    assert out.count() == 4  # 2 rows per report kind, unioned
