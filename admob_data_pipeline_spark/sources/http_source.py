"""Live AdMob HTTP ``ChunkSource`` (SURVEY.md §2.1 S1/S2 live form, §2.10 X5).

The reference authenticates with an OAuth2 refresh token and calls
``accounts.networkReport/mediationReport:generate`` through the Google API
client (main.py:21-56, save_CSV.py:46-60). This module implements the same
flow against the public REST surface with only the standard library:

- :class:`OAuthRefreshTokenAuth` — the refresh-token grant against
  ``https://oauth2.googleapis.com/token`` (main.py:23-33 semantics:
  mint-on-demand, cached until expiry);
- :class:`AdMobHttpChunkSource` — the :class:`~admob_data_pipeline_spark.
  pipelines.ChunkSource` implementation: compiles the
  :class:`~admob_data_pipeline_spark.sources.report_spec.ReportSpec` back
  to the API's JSON body (the exact shape ``ReportSpec.from_dict``
  accepts), POSTs it, and lands the chunk stream as JSONL which Spark
  reads with the declared nested schema.

Scale/robustness notes:

- the HTTP fetch is inherently a single driver-side stream (the AdMob API
  has no partitioned read), so the source SPILLS THE PAYLOAD TO DISK and
  hands Spark a file scan — the driver never holds more than the raw
  response bytes, and everything downstream (flatten, aggregate) is the
  regular distributed path over a declared schema;
- the transport is injectable (``transport(url, headers, body) → bytes``)
  so unit tests run against canned fixtures with zero network; the default
  transport is urllib with a bounded timeout;
- the output schema is DECLARED, never inferred — the
  fetch_mediation_report.py:100-111 payload-dependent-schema hazard
  (SURVEY.md §1.4) cannot occur.
"""

from __future__ import annotations

import datetime
import json
import os
import tempfile
import time
import urllib.error
import urllib.parse
import urllib.request
import uuid
from dataclasses import dataclass, field
from typing import Callable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from admob_data_pipeline_spark.sources.report_spec import ReportSpec

Transport = Callable[[str, Mapping[str, str], bytes], bytes]

GOOGLE_TOKEN_URI = "https://oauth2.googleapis.com/token"
ADMOB_API_ROOT = "https://admob.googleapis.com/v1"
ADMOB_REPORT_SCOPE = "https://www.googleapis.com/auth/admob.report"
_EXPIRY_SLACK_S = 60.0
_HTTP_TIMEOUT_S = 120.0

# The chunk schema every source (offline fixture, JSON landing, this HTTP
# adapter) emits — one nested column consumed by chunks.flatten_chunks.
CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.LongType()),
        T.StructField(
            "row",
            T.StructType(
                [
                    T.StructField(
                        "dimensionValues",
                        T.MapType(
                            T.StringType(),
                            T.StructType(
                                [
                                    T.StructField("value", T.StringType()),
                                    T.StructField("displayLabel", T.StringType()),
                                ]
                            ),
                        ),
                    ),
                    T.StructField(
                        "metricValues",
                        T.MapType(
                            T.StringType(),
                            T.StructType(
                                [
                                    T.StructField("integerValue", T.StringType()),
                                    T.StructField("doubleValue", T.DoubleType()),
                                    T.StructField("microsValue", T.StringType()),
                                    T.StructField("decimalValue", T.StringType()),
                                    T.StructField("value", T.StringType()),
                                ]
                            ),
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def default_transport(url: str, headers: Mapping[str, str], body: bytes) -> bytes:
    """POST ``body`` to ``url``; return the response bytes. Raises
    :class:`urllib.error.HTTPError` with the response text attached on
    non-2xx (the reference lets googleapiclient raise similarly)."""
    req = urllib.request.Request(url, data=body, headers=dict(headers), method="POST")
    with urllib.request.urlopen(req, timeout=_HTTP_TIMEOUT_S) as resp:  # noqa: S310
        return resp.read()


@dataclass
class OAuthRefreshTokenAuth:
    """OAuth2 refresh-token grant (reference main.py:21-33).

    Holds the long-lived refresh token; mints short-lived access tokens on
    demand and caches them until ``expires_in`` (minus slack) elapses.
    """

    client_id: str
    client_secret: str
    refresh_token: str
    token_uri: str = GOOGLE_TOKEN_URI
    scope: str = ADMOB_REPORT_SCOPE
    clock: Callable[[], float] = time.time
    _token: str | None = field(default=None, repr=False)
    _expires_at: float = field(default=0.0, repr=False)

    @classmethod
    def from_env(cls, env: Mapping[str, str] | None = None) -> "OAuthRefreshTokenAuth":
        """The reference's env contract (main.py:10-13): ADMOB_CLIENT_ID,
        ADMOB_CLIENT_SECRET, ADMOB_REFRESH_TOKEN — fail fast when absent
        (X3 semantics)."""
        env = dict(env if env is not None else os.environ)
        missing = [
            k
            for k in ("ADMOB_CLIENT_ID", "ADMOB_CLIENT_SECRET", "ADMOB_REFRESH_TOKEN")
            if not env.get(k)
        ]
        if missing:
            raise ValueError(f"missing required env: {', '.join(missing)}")
        return cls(
            client_id=env["ADMOB_CLIENT_ID"],
            client_secret=env["ADMOB_CLIENT_SECRET"],
            refresh_token=env["ADMOB_REFRESH_TOKEN"],
        )

    def access_token(self, transport: Transport) -> str:
        now = self.clock()
        if self._token is not None and now < self._expires_at:
            return self._token
        body = urllib.parse.urlencode(
            {
                "grant_type": "refresh_token",
                "refresh_token": self.refresh_token,
                "client_id": self.client_id,
                "client_secret": self.client_secret,
            }
        ).encode()
        raw = transport(
            self.token_uri,
            {"Content-Type": "application/x-www-form-urlencoded"},
            body,
        )
        payload = json.loads(raw)
        if "access_token" not in payload:
            raise ValueError(f"token endpoint returned no access_token: {payload}")
        self._token = payload["access_token"]
        self._expires_at = now + float(payload.get("expires_in", 3600)) - _EXPIRY_SLACK_S
        return self._token


def spec_to_api_body(spec: ReportSpec) -> dict:
    """ReportSpec → the reference's reportSpec JSON (main.py:122-136).

    Exact inverse of ``ReportSpec.from_dict`` — round-trip pinned in
    tests/test_http_source.py."""
    body: dict = {}
    if spec.date_range:
        def _d(iso: str) -> dict:
            d = datetime.date.fromisoformat(iso)
            return {"year": d.year, "month": d.month, "day": d.day}

        body["dateRange"] = {
            "startDate": _d(spec.date_range[0]),
            "endDate": _d(spec.date_range[1]),
        }
    if spec.dimensions:
        body["dimensions"] = list(spec.dimensions)
    if spec.metrics:
        body["metrics"] = list(spec.metrics)
    if spec.dimension_filters:
        body["dimensionFilters"] = [
            {"dimension": dim, "matchesAny": {"values": list(values)}}
            for dim, values in spec.dimension_filters.items()
        ]
    if spec.sort_conditions:
        dims = set(spec.dimensions)
        body["sortConditions"] = [
            (
                {"dimension": name, "order": order}
                if name in dims or name.upper() == "DATE"
                else {"metric": name, "order": order}
            )
            for name, order in spec.sort_conditions
        ]
    return body


class AdMobHttpChunkSource:
    """``ChunkSource`` over the AdMob REST API (S1/S2 live form).

    ``fetch`` POSTs ``{kind}Report:generate`` and returns the nested chunk
    DataFrame with :data:`CHUNK_SCHEMA` — drop-in for the offline fixture
    source in every pipeline job.
    """

    def __init__(
        self,
        auth: OAuthRefreshTokenAuth,
        publisher_id: str,
        transport: Transport | None = None,
        landing_dir: str | None = None,
        api_root: str = ADMOB_API_ROOT,
    ):
        self.auth = auth
        # accept 'pub-123' or 'accounts/pub-123' (F9 normalization)
        self.parent = f"accounts/{publisher_id.rsplit('/', 1)[-1]}"
        self.transport = transport or default_transport
        self.landing_dir = landing_dir or tempfile.gettempdir()
        self.api_root = api_root

    def _url(self, kind: str) -> str:
        if kind not in ("network", "mediation"):
            raise ValueError(f"unknown report kind: {kind!r}")
        return f"{self.api_root}/{self.parent}/{kind}Report:generate"

    def fetch(self, spark: SparkSession, kind: str, spec: ReportSpec) -> DataFrame:
        token = self.auth.access_token(self.transport)
        raw = self.transport(
            self._url(kind),
            {
                "Authorization": f"Bearer {token}",
                "Content-Type": "application/json",
            },
            json.dumps({"reportSpec": spec_to_api_body(spec)}).encode(),
        )
        chunks = json.loads(raw)
        if isinstance(chunks, dict):  # single-chunk responses arrive bare
            chunks = [chunks]
        # land as JSONL and hand Spark a file scan with the DECLARED schema:
        # the driver holds only the raw response; flatten/aggregate run
        # distributed exactly like the offline path
        path = os.path.join(
            self.landing_dir,
            f"admob_{kind}_{uuid.uuid4().hex}.jsonl",
        )
        with open(path, "w", encoding="utf-8") as fh:
            for i, chunk in enumerate(chunks):
                fh.write(
                    json.dumps({"chunk_id": i, "row": chunk.get("row")}) + "\n"
                )
        return spark.read.schema(CHUNK_SCHEMA).json(path)
