"""Custom stateful streaming operator via applyInPandasWithState.

The built-in windowed aggregations (streaming/alerts.py) cover the
reference's alert family; this module demonstrates the escape hatch for
semantics the built-ins can't express: an *incrementally maintained
cumulative rate* per key, carried across micro-batches in explicit
per-group state.

Semantics: for each ``app_name``, state holds lifetime (clicks,
impressions); every micro-batch emits one row per active key with the
batch delta and the updated lifetime rate — the shape of a streaming
feature store / running-counter pipeline.

Scale: state is one tiny tuple per key, partitioned by key across
executors; the UDF sees Arrow-batched pandas frames per (key, batch) —
Python cost is per-batch, and the state store bounds memory at
O(|keys|), not O(|events|).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    pass

OUTPUT_SCHEMA = StructType(
    [
        StructField("app_name", StringType()),
        StructField("batch_clicks", LongType()),
        StructField("batch_impressions", LongType()),
        StructField("cum_clicks", LongType()),
        StructField("cum_impressions", LongType()),
        StructField("cum_rate", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("clicks", LongType()), StructField("impressions", LongType())]
)


def cumulative_rates_stream(events: DataFrame) -> DataFrame:
    """Per-app lifetime click/impression counters maintained in GroupState."""
    prepared = events.select(
        F.col("event_type").alias("app_name"),
        F.floor(F.col("value") * 1000).cast("long").alias("clicks"),
    )

    # Self-contained closure: executors don't share the driver's sys.path.
    def update(key, pdf_iter, state):
        import pandas as pd

        batch_clicks = 0
        batch_impr = 0
        for pdf in pdf_iter:
            batch_clicks += int(pdf["clicks"].sum())
            batch_impr += len(pdf)
        if state.exists:
            (cum_clicks, cum_impr) = state.get
        else:
            cum_clicks, cum_impr = 0, 0
        cum_clicks += batch_clicks
        cum_impr += batch_impr
        state.update((cum_clicks, cum_impr))
        yield pd.DataFrame(
            {
                "app_name": [key[0]],
                "batch_clicks": [batch_clicks],
                "batch_impressions": [batch_impr],
                "cum_clicks": [cum_clicks],
                "cum_impressions": [cum_impr],
                "cum_rate": [cum_clicks / cum_impr if cum_impr else None],
            }
        )

    return prepared.groupBy("app_name").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def cumulative_rates_tws(events: DataFrame) -> DataFrame:
    """Same lifetime-counter semantics through Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    applyInPandasWithState (typed state handles, timers, TTL support).

    ENVIRONMENT-BLOCKED in this container: the TWS driver worker needs
    the ``google.protobuf`` Python package (state-server protocol), which
    is not installed — the stream start fails with
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE (probed; also requires
    the RocksDB state-store provider, set here). The operator is kept as
    the migration path off the legacy API and is covered by an
    importorskip pytest that activates the moment protobuf appears; it is
    NOT in the oracle registry until it can execute.

    The processor class is self-contained (imports inside methods):
    executors don't share the driver's sys.path.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    prepared = events.select(
        F.col("event_type").alias("app_name"),
        F.floor(F.col("value") * 1000).cast("long").alias("clicks"),
    )

    class CumRateProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "cum", "clicks BIGINT, impressions BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            batch_clicks = 0
            batch_impr = 0
            for pdf in rows:
                batch_clicks += int(pdf["clicks"].sum())
                batch_impr += len(pdf)
            if self._state.exists():
                cum_clicks, cum_impr = self._state.get()
            else:
                cum_clicks, cum_impr = 0, 0
            cum_clicks += batch_clicks
            cum_impr += batch_impr
            self._state.update((cum_clicks, cum_impr))
            yield pd.DataFrame(
                {
                    "app_name": [key[0]],
                    "batch_clicks": [batch_clicks],
                    "batch_impressions": [batch_impr],
                    "cum_clicks": [cum_clicks],
                    "cum_impressions": [cum_impr],
                    "cum_rate": [cum_clicks / cum_impr if cum_impr else None],
                }
            )

        def close(self) -> None:
            pass

    return prepared.groupBy("app_name").transformWithStateInPandas(
        statefulProcessor=CumRateProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
