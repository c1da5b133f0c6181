"""The AdMob report API as a NATIVE PySpark Python DataSource.

The reference's report fetchers build an API request from a spec —
dateRange, dimensionFilters, the metric list — and page the response
into rows (/root/reference/fetch_report.py:21-77,
fetch_mediation_report.py:79-113). This module is that surface as a
first-class ``spark.read.format("admob_report")`` source (PySpark 4
Python DataSource API), with the two behaviors that matter at scale:

- **Filter pushdown INTO the source** (``pushFilters``, Spark 4.1): a
  query's date-range / app predicates — the reference spec's
  ``dateRange`` and ``dimensionFilters`` — prune FETCH PARTITIONS, so
  dates and apps outside the spec are never requested from the API at
  all. Residual predicates (e.g. on metrics) are returned to Spark
  unharmed.
- **One InputPartition per (date, app)** — the API request grain (the
  reference fetches per account per date window), so a 1000-executor
  cluster fans the fetch out without any coordinator state, and a
  date-partition is the unit of idempotent reload downstream.

The transport is offline (no network in this environment): rows are a
DETERMINISTIC integer formula of (day, app, unit), so the DuckDB oracle
reproduces the exact payload via generate_series — the source's
correctness is value-hash-gated like every other operator.

WORKER-SHIPPING CONSTRAINT: this module is pickled BY VALUE to Python
workers (``register_report_source`` registers it with cloudpickle's
register_pickle_by_value) because Spark's workers do not inherit the
driver's sys.path — so the module must stay self-contained: stdlib +
pyspark.sql.datasource imports only, no package-relative imports.
"""

from __future__ import annotations

import datetime

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

BASE_DATE = datetime.date(2024, 1, 1)
N_APPS = 2
N_UNITS = 4
DEFAULT_N_DAYS = 14

SCHEMA = (
    "date date, app_name string, ad_unit_name string, "
    "ad_requests bigint, matched_requests bigint, impressions bigint, "
    "clicks bigint, earn_micros bigint"
)


def app_name(app: int) -> str:
    return "app-" + chr(97 + app)


def report_rows(day: int, app: int) -> list[tuple]:
    """One (date, app) API response page: N_UNITS rows, every metric a
    pure integer formula of (day, app, unit) — non-negative by
    construction (requests ≥ 2, each funnel step subtracts ≤ 1, clicks
    capped at impressions). The DuckDB oracle mirrors these expressions
    verbatim over generate_series."""
    d = BASE_DATE + datetime.timedelta(days=day)
    name = app_name(app)
    out = []
    for u in range(N_UNITS):
        req = 2 + (day * 31 + app * 7 + u * 3) % 5
        matched = req - (day + u) % 2
        imps = matched - (day + app) % 2
        clicks = min(imps, (day * 5 + u) % 3)
        earn = clicks * (1000 + (u * 137) % 500)
        out.append((d, name, f"unit-{u}", req, matched, imps, clicks, earn))
    return out


class FetchPartition(InputPartition):
    """One API request: a (date, app) cell."""

    def __init__(self, day: int, app: int):
        self.day = day
        self.app = app


class AdMobReportReader(DataSourceReader):
    """Batch reader with date/app pushdown.

    Accepted pushdowns (everything else is returned to Spark):
    - date:  EqualTo / GreaterThan(OrEqual) / LessThan(OrEqual) with a
      datetime.date value → tighten the fetched day window
    - app_name: EqualTo / In with string value(s) → restrict fetched apps
    """

    def __init__(self, options):
        self.n_days = int(options.get("n_days", DEFAULT_N_DAYS))
        self.day_lo = 0
        self.day_hi = self.n_days - 1
        self.apps = set(range(N_APPS))

    def _clamp_date(self, lo=None, hi=None) -> None:
        if lo is not None:
            self.day_lo = max(self.day_lo, (lo - BASE_DATE).days)
        if hi is not None:
            self.day_hi = min(self.day_hi, (hi - BASE_DATE).days)

    def pushFilters(self, filters):
        name_to_app = {app_name(a): a for a in range(N_APPS)}
        residual = []
        for f in filters:
            v = getattr(f, "value", None)
            attr = getattr(f, "attribute", None)
            if attr == ("date",) and isinstance(v, datetime.date):
                if isinstance(f, EqualTo):
                    self._clamp_date(lo=v, hi=v)
                elif isinstance(f, GreaterThanOrEqual):
                    self._clamp_date(lo=v)
                elif isinstance(f, GreaterThan):
                    self._clamp_date(lo=v + datetime.timedelta(days=1))
                elif isinstance(f, LessThanOrEqual):
                    self._clamp_date(hi=v)
                elif isinstance(f, LessThan):
                    self._clamp_date(hi=v - datetime.timedelta(days=1))
                else:
                    residual.append(f)
            elif attr == ("app_name",) and isinstance(f, EqualTo):
                self.apps &= {name_to_app.get(v, -1)}
                self.apps.discard(-1)
            elif attr == ("app_name",) and isinstance(f, In):
                self.apps &= {name_to_app.get(x, -1) for x in f.value}
                self.apps.discard(-1)
            else:
                residual.append(f)
        return residual

    def partitions(self):
        parts = [
            FetchPartition(d, a)
            for d in range(max(0, self.day_lo), self.day_hi + 1)
            for a in sorted(self.apps)
        ]
        # pruned to nothing: Spark does not accept an empty partition
        # list (read() would be called with part=None) — return one
        # explicit no-op fetch instead
        return parts or [FetchPartition(-1, -1)]

    def read(self, part: FetchPartition):
        """Yields ONE Arrow RecordBatch per fetch — the vectorized
        transfer path (Arrow batches cross the Python-worker boundary
        zero-copy; yielding tuples would serialize row-at-a-time via
        pickle, the known 10-100× slow path for Python sources). The
        stream reader keeps the row path: its per-poll volume is the
        catch-up window, not a scan."""
        if part is None or part.day < 0:
            return
        import pyarrow as pa

        rows = report_rows(part.day, part.app)
        schema = pa.schema(
            [
                ("date", pa.date32()),
                ("app_name", pa.string()),
                ("ad_unit_name", pa.string()),
                ("ad_requests", pa.int64()),
                ("matched_requests", pa.int64()),
                ("impressions", pa.int64()),
                ("clicks", pa.int64()),
                ("earn_micros", pa.int64()),
            ]
        )
        names = schema.names
        yield pa.RecordBatch.from_pylist(
            [dict(zip(names, r)) for r in rows], schema=schema
        )


class AdMobReportStreamReader(SimpleDataSourceStreamReader):
    """Streaming poller over the same payload: the offset is the next
    unfetched day, each poll catches up every newly available date in
    one batch (how a report API is actually polled — per new date, not
    per row), and ``readBetweenOffsets`` replays any committed window
    deterministically for recovery. availableNow therefore drains the
    full range and equals the batch read row-for-row."""

    def __init__(self, options):
        self.n_days = int(options.get("n_days", DEFAULT_N_DAYS))

    def initialOffset(self):
        return {"day": 0}

    def read(self, start):
        lo = start["day"]
        rows = [
            r
            for d in range(lo, self.n_days)
            for a in range(N_APPS)
            for r in report_rows(d, a)
        ]
        return iter(rows), {"day": max(lo, self.n_days)}

    def readBetweenOffsets(self, start, end):
        return iter(
            r
            for d in range(start["day"], end["day"])
            for a in range(N_APPS)
            for r in report_rows(d, a)
        )

    def commit(self, end):
        pass


class _SpoolCommit(WriterCommitMessage):
    """Per-task commit message: the staged file and its row count."""

    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


def _spool_rows(path: str, iterator) -> "_SpoolCommit":
    """Task-side half of the two-phase commit: spool rows to _staging,
    return the file + count. Shared by the batch and streaming
    writers."""
    import json
    import os
    import uuid

    staging = os.path.join(path, "_staging")
    os.makedirs(staging, exist_ok=True)
    fname = os.path.join(staging, f"part-{uuid.uuid4().hex}.jsonl")
    n = 0
    with open(fname, "w") as fh:
        for row in iterator:
            fh.write(json.dumps(row.asDict(), default=str) + "\n")
            n += 1
    return _SpoolCommit(fname, n)


def _publish(path: str, messages, manifest: str) -> None:
    """Driver-side half: atomically move committed tasks' spool files
    into the target and write the named manifest listing them with row
    counts — a reader that honors the manifest never sees a
    partially-written batch/epoch. Empty-task spools are dropped."""
    import json
    import os

    published = []
    for m in messages:
        if m is None or m.n_rows == 0:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
            continue
        final = os.path.join(path, os.path.basename(m.path))
        os.replace(m.path, final)
        published.append(
            {"file": os.path.basename(final), "n_rows": m.n_rows}
        )
    with open(os.path.join(path, manifest), "w") as fh:
        json.dump({"files": published}, fh)


def _discard(messages) -> None:
    import os

    for m in messages:
        if m is not None and os.path.exists(m.path):
            os.remove(m.path)


class AdMobReportWriter(DataSourceWriter):
    """Two-phase-commit JSONL upload writer — the reference's batch
    upload shape (save_CSV.py stages a local file, then issues one
    atomic load job): each task spools its rows to ``_staging`` and
    returns a commit message; ONLY the driver-side ``commit`` publishes
    the staged files into the target directory plus a ``_SUCCESS``
    manifest. On a cluster the spool directory is shared storage
    (GCS/S3/HDFS); the protocol is identical."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _spool_rows(self.path, iterator)

    def commit(self, messages):
        _publish(self.path, messages, "_SUCCESS")

    def abort(self, messages):
        _discard(messages)


class AdMobReportStreamWriter(DataSourceStreamWriter):
    """Streaming twin of the batch writer: the SAME spool/publish
    protocol, committed PER EPOCH — each micro-batch's tasks spool, and
    the engine-driven ``commit(messages, batchId)`` publishes them under
    ``_SUCCESS_epoch_{batchId}``. A failed epoch is aborted (staging
    discarded) and replayed by the engine from the checkpoint, so a
    manifest-honoring reader sees each epoch exactly once — the
    exactly-once sink contract built from the same two primitives as
    the batch path."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _spool_rows(self.path, iterator)

    def commit(self, messages, batchId):
        _publish(self.path, messages, f"_SUCCESS_epoch_{batchId}")

    def abort(self, messages, batchId):
        _discard(messages)


class AdMobReportDataSource(DataSource):
    @classmethod
    def name(cls):
        return "admob_report"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return AdMobReportReader(self.options)

    def simpleStreamReader(self, schema):
        return AdMobReportStreamReader(self.options)

    def writer(self, schema, overwrite):
        return AdMobReportWriter(self.options)

    def streamWriter(self, schema, overwrite):
        return AdMobReportStreamWriter(self.options)


def register_report_source(spark) -> None:
    """Register the source on any session (idempotent). Ships this
    module BY VALUE (workers don't share the driver's sys.path) and
    enables the Python filter-pushdown conf — a reader implementing
    pushFilters fails hard on a vanilla session otherwise (the conf is
    runtime-settable; measured)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(AdMobReportDataSource)
