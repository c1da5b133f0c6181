"""Aggregate query/oracle registry — one import point for __spark_entry__.

Each domain module contributes ``QUERIES`` (name → (spark, sf_dir) →
DataFrame) and ``ORACLES`` (name → DuckDB SQL). Names are unique across
modules; a query without an oracle gets the driver's weaker rows-only
check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from admob_data_pipeline_spark.operators import (
    cdc,
    corpus,
    dedup,
    multimodal,
    packing,
    similarity,
    text,
)
from admob_data_pipeline_spark.plans import analytics_ext, relational
from admob_data_pipeline_spark.sinks import roundtrip
from admob_data_pipeline_spark.streaming import alerts as streaming_alerts

_MODULES = [
    relational,
    analytics_ext,
    text,
    corpus,
    dedup,
    similarity,
    multimodal,
    packing,
    cdc,
    roundtrip,
    streaming_alerts,
]


def _merged(attr: str) -> dict:
    out: dict = {}
    for mod in _MODULES:
        for name, v in getattr(mod, attr, {}).items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = v
    return out


QUERIES = _merged("QUERIES")
ORACLES = _merged("ORACLES")
