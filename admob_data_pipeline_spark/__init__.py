"""admob_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
``aamir-dp/admob-data-pipeline`` (see SURVEY.md), re-expressed Spark-first:

- one declarative DataFrame/SQL surface replaces both the reference's
  Python row-at-a-time dataflow and its BigQuery-pushed SQL strings;
- report ingestion (nested chunk flatten, tagged-union metric coercion)
  is pure column expressions — no Python UDFs in the hot path;
- the report-spec dialect (dateRange / dimensions / metrics /
  dimensionFilters / sortConditions) compiles to a Catalyst logical plan;
- the CTR-anomaly alert family is implemented both as SQL and as
  DataFrame/Window plans;
- beyond reference parity: large-scale training-data operators
  (dedup exact/MinHash-LSH/SimHash/Jaccard, ANN similarity search,
  text analysis, multimodal column plumbing).

Designed for 100 TB scale: date-partitioned facts, broadcast dimension
joins, map-side partial aggregation, LSH banding instead of O(n^2)
self-joins, AQE-friendly declarative plans.
"""

__version__ = "0.1.0"
