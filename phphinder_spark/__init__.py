"""phphinder_spark — a PySpark-native inverted-index + BM25 search engine
with the query and data-processing capabilities of eliasfernandez/phphinder,
re-expressed Spark-first (DataFrame/SQL plans, Arrow-vectorized UDFs only).
"""

__version__ = "0.1.0"
