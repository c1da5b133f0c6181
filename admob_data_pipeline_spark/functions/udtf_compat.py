"""Python UDTF compatibility path for chunk flattening (SURVEY.md §2.9).

The reference's ``parse_rows`` (main.py:58-87) is a de-facto UDTF: one
chunk in, 0..1 flat records out. The production path here is the pure
column-expression kernel (``sources/chunks.flatten_chunks`` — codegen'd,
no Python in the hot loop). This module provides the same semantics as a
REAL Spark Python UDTF for the cases that genuinely need imperative
per-row logic (irregular payloads, user plug-in parsers), and the test
suite pins the two paths row-for-row equal.

Scale note: the UDTF runs Arrow-batched but still crosses the JVM→Python
boundary per batch — on 100 TB use the expression kernel; this path is the
extensibility seam, not the default. The class is self-contained
(stdlib only) so executors can run it regardless of driver cwd/sys.path
(ROUND_NOTES playbook rule 10).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

_RETURN_TYPE = (
    "date date, app_name string, clicks bigint, "
    "estimated_earnings_micros bigint, impression_ctr double, quantity bigint"
)


@udtf(returnType=_RETURN_TYPE)
class ParseNetworkChunks:
    """Flatten one raw chunk → 0..1 typed records, mirroring the
    expression kernel exactly: S10 null-row guard, P5 display coalesce,
    P6 malformed-date→NULL, P3/P4 tagged-union fallback chains with the
    same cast semantics (string→long direct, else via double truncating
    toward zero; default 0 / 0.0)."""

    @staticmethod
    def _t_long(s):
        if s is None:
            return None
        try:
            return int(s)  # Spark string→long cast: integral strings only
        except (TypeError, ValueError):
            return None

    @staticmethod
    def _t_dbl(s):
        if s is None:
            return None
        try:
            return float(s)
        except (TypeError, ValueError):
            return None

    @classmethod
    def _metric_int(cls, m):
        if m is None:
            return 0
        v = cls._t_long(m["integerValue"])
        if v is None:
            v = cls._t_long(m["microsValue"])
        if v is None:
            d = cls._t_dbl(m["decimalValue"])
            v = int(d) if d is not None else None  # double→long truncates to 0
        if v is None:
            d = cls._t_dbl(m["value"])
            v = int(d) if d is not None else None
        return 0 if v is None else v

    @classmethod
    def _metric_float(cls, m):
        if m is None:
            return 0.0
        v = m["doubleValue"]
        if v is None:
            v = cls._t_dbl(m["decimalValue"])
        if v is None:
            v = cls._t_dbl(m["value"])
        return 0.0 if v is None else float(v)

    @staticmethod
    def _dim(d):
        if d is None:
            return ""
        label = d["displayLabel"]
        if label is not None:
            return label
        value = d["value"]
        return value if value is not None else ""

    @staticmethod
    def _date(d):
        import datetime

        if d is None or d["value"] is None:
            return None
        try:
            return datetime.datetime.strptime(d["value"], "%Y%m%d").date()
        except ValueError:
            return None

    def eval(self, row):
        if row is None:
            return  # S10: header/footer chunks yield nothing
        dims = row["dimensionValues"] or {}
        mets = row["metricValues"] or {}
        yield (
            self._date(dims.get("DATE")),
            self._dim(dims.get("APP")),
            self._metric_int(mets.get("CLICKS")),
            self._metric_int(mets.get("ESTIMATED_EARNINGS")),
            self._metric_float(mets.get("IMPRESSION_CTR")),
            self._metric_int(mets.get("QUANTITY")),
        )


def register(spark) -> str:
    """Register the UDTF for SQL lateral use; returns the function name."""
    spark.udtf.register("parse_network_chunks", ParseNetworkChunks)
    return "parse_network_chunks"
