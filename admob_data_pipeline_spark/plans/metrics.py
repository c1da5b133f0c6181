"""Executed-plan metric introspection — measure shuffles, don't guess.

After an action, every physical operator exposes its SQL metrics (rows,
shuffle bytes). :func:`shuffle_stats` walks the executed plan and sums
them, letting tests assert a query's *shuffle budget* (e.g. "the as-of
join shuffles exactly |L|+|R| rows") — a regression here means a plan
silently started moving more data, which is invisible to correctness
tests and is exactly what kills a job at 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class ShuffleStats:
    n_exchanges: int
    records_written: int
    bytes_written: int


def _walk(node):
    yield node
    for i in range(node.children().size()):
        yield from _walk(node.children().apply(i))
    # AQE wraps stages; descend into materialized query stages / plans
    for attr in ("plan", "executedPlan", "finalPhysicalPlan"):
        try:
            child = getattr(node, attr)()
            yield from _walk(child)
        except Exception:
            pass


def shuffle_stats(df: DataFrame) -> ShuffleStats:
    """Execute ``df`` (count action) and sum shuffle-write metrics across
    every Exchange in the final (AQE) plan."""
    df.count()
    root = df._jdf.queryExecution().executedPlan()
    n = 0
    records = 0
    size = 0
    seen = set()
    for node in _walk(root):
        node_id = node.id()
        if node_id in seen:
            continue
        seen.add(node_id)
        name = node.nodeName()
        if "Exchange" not in name:
            continue
        n += 1
        m = node.metrics()
        it = m.iterator()
        while it.hasNext():
            kv = it.next()
            key = kv._1()
            val = kv._2().value()
            if key == "shuffleRecordsWritten":
                records += int(val)
            elif key == "shuffleBytesWritten":
                size += int(val)
    return ShuffleStats(n_exchanges=n, records_written=records, bytes_written=size)
