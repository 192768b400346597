"""Custom stateful streaming operators (applyInPandasWithState).

The foreachBatch segment writer (freshness.py) covers index freshness;
this module covers the other Structured Streaming shape the engine needs:
operators whose semantics REQUIRE cross-micro-batch state.  First up is
streaming exact-dedup — the reference's add_document replace-by-term
idiom (include/xapian/database.h replace_document(unique_term, doc))
applied to an unbounded stream: only the FIRST document with a given
content hash is emitted; later copies are suppressed for the life of the
stream, whichever micro-batch they arrive in.

Scale shape: state is partitioned by a 2-hex-char hash shard (256 groups
spread over the cluster), each group holding only its own seen-hash set —
state size is bounded by distinct content per shard, not stream length.
At 100 TB replace the exact set with a bloom filter (the state schema is
a plain array column precisely so that swap is local to this file).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout


def streaming_first_seen(
    stream_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """(doc_id, content_hash) of each content hash's first-seen document.

    Streaming-only (Spark rejects applyInPandasWithState in batch
    queries); the batch equivalent is operators/dedup.exact_duplicates.
    """
    hashed = stream_df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.col(text_col)).alias("content_hash"),
    ).withColumn("shard", F.substring("content_hash", 1, 2))

    def dedup(key, pdfs, state):
        seen = set(state.get[0]) if state.exists else set()
        out_ids, out_hashes = [], []
        for pdf in pdfs:
            for did, h in zip(pdf["doc_id"], pdf["content_hash"]):
                if h not in seen:
                    seen.add(h)
                    out_ids.append(int(did))
                    out_hashes.append(h)
        state.update((sorted(seen),))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_ids, dtype="int64"),
                "content_hash": pd.Series(out_hashes, dtype=object),
            }
        )

    return hashed.groupBy("shard").applyInPandasWithState(
        dedup,
        outputStructType="doc_id long, content_hash string",
        stateStructType="seen array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
