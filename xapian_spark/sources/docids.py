"""Deterministic global docid assignment at cluster scale.

Xapian assigns docids in insertion order (WritableDatabase::add_document);
for a distributed build we need ids that are (a) dense starting at 1
(docid 0 is invalid, include/xapian/types.h:51), (b) a pure function of the
corpus content — NOT of partitioning — so rebuilds/resumes are
byte-identical, and (c) assignable without a global sort materialization.

Algorithm (the standard scalable idiom):
1. range-partition by the natural key (repo, path) — Spark samples ranges;
2. sort within partitions by the key;
3. count rows per partition (one small job);
4. prefix-sum the counts on the driver (tiny);
5. per-partition zipWithIndex + broadcast offset.

The result equals a dense rank over the globally-sorted key, but the only
full pass is the range shuffle; no single-reducer sort.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_doc_ids(
    corpus: DataFrame, key_cols: list[str] = ("repo", "path")
) -> DataFrame:
    """Returns the corpus with a ``doc_id`` column: 1-based dense ids in
    global ``key_cols`` order, deterministic at any parallelism."""
    key_cols = list(key_cols)
    parted = corpus.repartitionByRange(*key_cols).sortWithinPartitions(*key_cols)
    parted = parted.persist()

    # per-partition counts, in partition order (partition ids are the range
    # order by construction of repartitionByRange)
    counts = (
        parted.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    by_pid = {r["pid"]: r["count"] for r in counts}
    n_parts = parted.rdd.getNumPartitions()
    offsets = []
    acc = 0
    for pid in range(n_parts):
        offsets.append(acc)
        acc += by_pid.get(pid, 0)

    spark = corpus.sparkSession
    boff = spark.sparkContext.broadcast(offsets)
    cols = parted.columns
    schema = "doc_id long, " + ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in parted.schema.fields
    )

    def add_ids(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        start = boff.value[pid]
        seen = 0
        for pdf in pdf_iter:
            n = len(pdf)
            out = pdf.copy()
            out.insert(0, "doc_id", range(start + seen + 1, start + seen + n + 1))
            seen += n
            yield out

    return parted.mapInPandas(add_ids, schema)
