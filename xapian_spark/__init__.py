"""xapian_spark — a PySpark-native inverted-index + BM25 retrieval engine.

From-scratch re-expression of the query/data-processing capabilities of
xapian-core 2.0.0 (reference at /root/reference) as idiomatic Spark:
DataFrame plans, Arrow-vectorized kernels, Iceberg-shaped tables.
"""

__version__ = "0.1.0"
