"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference loan-default-prediction app, rebuilt
Spark-first (DataFrame / SQL / Catalyst / MLlib / Structured Streaming).

Layout
------
- ``session``    : SparkSession factory (replaces the reference's legacy
  SparkConf/SparkContext/SQLContext setup, reference spark.py:15-26).
- ``schema``     : pinned StructType schemas (loan table + fixture tables).
- ``sources``    : readers/writers (CSV pinned+inferred, parquet, JSON,
  binary multimodal).
- ``operators``  : relational / aggregate / window / join / set-op /
  dedup / similarity / text / multimodal operators.
- ``functions``  : scalar-function helpers shared by operators.
- ``plans``      : the query registry — every operator exposed as a
  ``(spark, sf_dir) -> DataFrame`` callable plus its DuckDB oracle SQL.
- ``ml``         : the Tier-A ML parity pipeline (impute → assemble →
  scale → logistic regression → evaluate → serve + rule override).
- ``streaming``  : Structured Streaming variants (watermark + windows).
"""

__version__ = "0.1.0"
