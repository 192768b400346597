#!/usr/bin/env python
"""Phase-level profile of the index build at one parallelism level.

Run pinned (e.g. `taskset -c 0-1 python tools/profile_build.py --cpus 2`)
at 2 and 8 cores to see which phase fails to scale.  Phases:

  P1 stats    — inversion (mapInPandas tokenize) + doclens/dictionary aggs
                + the single stats collect (everything before driver stats)
  P2 pack     — span join + repartition + block pack + postings write
  P3 sides    — docs + dictionary table writes (run concurrently with P2
                in save_index; timed here separately for attribution)

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=2)
    ap.add_argument("--docs", type=int, default=160000)
    args = ap.parse_args()

    from bench import _mk_spark
    from xapian_spark.operators.indexer import build_index
    from xapian_spark.sources.catalog import save_index
    from xapian_spark.sources.corpus import corpus_df

    spark = _mk_spark(args.cpus)
    corpus = corpus_df(
        spark, args.docs, seed=42, n_partitions=max(args.cpus * 2, 16)
    ).persist()
    corpus.count()

    t_all0 = time.perf_counter()
    t0 = time.perf_counter()
    ix = build_index(spark, corpus, content_col="content", meta_cols=["repo", "lang"])
    p1 = time.perf_counter() - t0  # build_index blocks on the stats collect

    out = tempfile.mkdtemp(prefix="xsp_")
    t0 = time.perf_counter()
    ix.postings.write.mode("overwrite").parquet(f"{out}/postings")
    p2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    ix.docs.write.mode("overwrite").parquet(f"{out}/docs")
    ix.dictionary.sort("term").write.mode("overwrite").parquet(f"{out}/dictionary")
    p3 = time.perf_counter() - t0
    total_split = time.perf_counter() - t_all0

    # and the real (concurrent-write) path for the wall-clock reference
    out2 = tempfile.mkdtemp(prefix="xsp2_")
    t0 = time.perf_counter()
    ix2 = build_index(spark, corpus, content_col="content", meta_cols=["repo", "lang"])
    save_index(ix2, out2)
    real = time.perf_counter() - t0

    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(out2, ignore_errors=True)
    spark.stop()
    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "docs": args.docs,
                "p1_stats_sec": round(p1, 2),
                "p2_pack_write_sec": round(p2, 2),
                "p3_side_writes_sec": round(p3, 2),
                "total_split_sec": round(total_split, 2),
                "real_wall_sec": round(real, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
