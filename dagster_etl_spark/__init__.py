"""dagster_etl_spark — PySpark-native analytics engine with the query and
data-processing capabilities of bong2jjang/dagster-ETL, re-designed
Spark-first (DataFrame/Catalyst, not a pandas translation)."""

__version__ = "0.1.0"
