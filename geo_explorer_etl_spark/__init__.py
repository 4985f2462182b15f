"""geo_explorer_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first implementation of the query and
data-processing capabilities of the SGC-CGS/geo-explorer-etl reference
(a pandas ETL loading StatCan WDS cubes into a geospatial indicator
star schema), extended with LLM-training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Design rules (see SURVEY.md):
- DataFrame/SQL only; zero row-at-a-time Python UDFs for reference
  parity (Pandas UDFs allowed only in extension operators).
- Lookup joins are broadcast; incremental appends are anti-joins;
  sequential IDs are a pluggable strategy (window vs. zipWithIndex).
- Every operator ships with a DuckDB-oracle query pair in
  ``__spark_entry__.py``.
"""

__version__ = "0.1.0"
