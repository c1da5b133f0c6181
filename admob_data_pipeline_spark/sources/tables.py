"""Parquet table catalog over the driver testdata layout.

``load_table(spark, sf_dir, name)`` reads one parquet table; ``register_views``
exposes them as temp views for the SQL entry points. At production scale the
same call reads a date-partitioned parquet/Delta layout — partition pruning
and column pruning come from Catalyst, nothing manual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Canonical column types per table. The driver regenerates the testdata
# between rounds and has already changed physical types once (events.ts
# went TIMESTAMP(NANOS) → naive TIMESTAMP(MICROS)); every operator
# downstream assumes these logical types, so load_table casts any drifted
# column back instead of letting 100 queries break at once. Casts are
# no-ops when the type already matches; unknown/extra columns pass
# through untouched.
_CANONICAL_TYPES: dict[str, dict[str, str]] = {
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    # embeddings.label deliberately NOT canonicalized: the driver's oracle
    # reads the raw parquet type, and every operator treats label as an
    # opaque grouping key — forcing a type here would diverge from the
    # oracle whenever the generator changes the label's physical type
    # (it moved string→int64 this round).
    "embeddings": {"vec_id": "bigint"},
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_shipdate": "timestamp",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
    },
    "customer": {"c_custkey": "bigint", "c_nationkey": "bigint", "c_acctbal": "double"},
    "supplier": {"s_suppkey": "bigint", "s_nationkey": "bigint", "s_acctbal": "double"},
    "part": {"p_partkey": "bigint", "p_size": "int", "p_retailprice": "double"},
    "nation": {"n_nationkey": "bigint", "n_regionkey": "bigint"},
    "region": {"r_regionkey": "bigint"},
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = _read_parquet_nanosafe(spark, f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) parquet read as long nanos — normalize back to a
        # real timestamp. Integer `div` keeps full precision (a double
        # division would lose bits above 2^53).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return canonicalize(df, name)


def canonicalize(df: DataFrame, name: str) -> DataFrame:
    """Absorb physical-type drift in the driver-regenerated testdata by
    casting to the table's canonical types. Shared by the batch reader
    and the STREAMING sources (streaming/alerts.py) — a stream twin that
    skipped this would silently diverge from its batch sibling's schema
    the next time the generator changes a column's physical type
    (precedent: embeddings.label moved string→int64)."""
    dtypes = dict(df.dtypes)
    drifted = {
        col: want
        for col, want in _CANONICAL_TYPES.get(name, {}).items()
        if col in dtypes and dtypes[col] != want
    }
    if drifted:
        df = df.withColumns({c: F.col(c).cast(t) for c, t in drifted.items()})
    return df


def _read_parquet_nanosafe(spark: SparkSession, path: str) -> DataFrame:
    """Read parquet, tolerating TIMESTAMP(NANOS) columns (the driver
    testdata's ``events.ts``), which Spark rejects unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is set. Set it up front so the
    first read never throws (a failed read logs executor ERRORs).

    Also force naive parquet timestamps (isAdjustedToUTC=false, how the
    testdata stores ``ts``) to read as plain TIMESTAMP instead of
    TIMESTAMP_NTZ: NTZ forbids the epoch casts the event-time operators
    rely on, and DuckDB's epoch() of the same naive value agrees with the
    UTC-session interpretation bit-for-bit. Runtime-set here, not only in
    get_spark(), because the driver calls queries() on a vanilla session."""
    for conf, value in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
    ):
        try:
            spark.conf.set(conf, value)
        except Exception:
            pass  # unmodifiable in this session — fall through and hope
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
