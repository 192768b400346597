"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: index sf0.001 documents with the Xapian-faithful
                 tokenizer and run a BM25 OR query end-to-end.
queries()      — one entry per implemented operator (SURVEY.md §2 + the
                 training-pipeline ops); each callable (spark, sf_dir) → DF.
oracle_sql()   — DuckDB-equivalent SQL per query (see
                 xapian_spark/entrypoints.py for the float64 mirroring rules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from xapian_spark.operators.indexer import build_index
    from xapian_spark.operators.matcher import Matcher
    from xapian_spark.plans import query as Q

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ix = build_index(
        spark,
        docs,
        id_col="doc_id",
        content_col="text",
        meta_cols=["lang"],
        mode="xapian",
    )
    m = Matcher(spark, ix)
    q = Q.Or([Q.Term("hash"), Q.Term("join"), Q.Term("merge")])
    return m.mset_df(q, 10).select(
        "doc_id", F.col("weight").cast("double").alias("weight")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from xapian_spark.entrypoints import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    from xapian_spark.entrypoints import ORACLE_SQL

    return dict(ORACLE_SQL)
