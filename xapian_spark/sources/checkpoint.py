"""Checkpointed, resumable index build (north rule).

The expensive pass of an index build at 10^12-file scale is the inversion
(tokenize + per-doc posting lists).  This builder shards the corpus by
docid, runs inversion shard-by-shard, and records a lineage entry per shard
(rows, posting checksum, timings) in ``checkpoints.jsonl``; an interrupted
build resumes by skipping shards whose entries are committed.  The merge
phase (blocks/dictionary/stats) then runs over the staged flat postings and
is deterministic — a pure function of the staged data — so re-running it
after a crash is idempotent, and a resumed build is byte-identical to a
clean one (tested in tests/test_resume.py).

This reproduces the reference's batched-commit semantics: glass flushes
every 10k docs into a new revision (glass_database.cc:1078-1086,
XAPIAN_FLUSH_THRESHOLD) and readers only ever see committed revisions; here
a shard stage-out is the flush, the checkpoint record is the revision entry,
and the final manifest write (catalog.save_index) is the commit flip.

On a real cluster the staging directory is object storage and the jsonl is
an Iceberg metadata table; both interfaces are kept trivially swappable.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.indexer import IndexTables, build_index, invert_corpus


class CheckpointedIndexBuilder:
    def __init__(self, spark: SparkSession, work_dir: str, n_shards: int = 8):
        self.spark = spark
        self.work_dir = work_dir
        self.n_shards = n_shards
        os.makedirs(work_dir, exist_ok=True)
        self.ckpt_path = os.path.join(work_dir, "checkpoints.jsonl")

    # -- lineage log -------------------------------------------------------
    def _done_shards(self) -> dict[int, dict]:
        done = {}
        if os.path.exists(self.ckpt_path):
            with open(self.ckpt_path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    if rec.get("status") == "done":
                        done[rec["shard"]] = rec
        return done

    def _append(self, rec: dict) -> None:
        with open(self.ckpt_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())

    # -- build -------------------------------------------------------------
    def build(
        self,
        corpus: DataFrame,
        id_col: str = "doc_id",
        content_col: str = "content",
        meta_cols: list[str] | None = None,
        mode: str = "xapian",
        with_positions: bool = True,
        fail_after_shards: int | None = None,  # failure injection for tests
    ) -> IndexTables:
        done = self._done_shards()
        n_done_this_run = 0
        for shard in range(self.n_shards):
            if shard in done:
                continue
            if fail_after_shards is not None and n_done_this_run >= fail_after_shards:
                raise RuntimeError(f"injected failure before shard {shard}")
            t0 = time.time()
            part = corpus.filter(F.col(id_col) % self.n_shards == shard)
            flat = invert_corpus(part, id_col, content_col, mode, with_positions)
            out = os.path.join(self.work_dir, f"flat/shard={shard}")
            flat.write.mode("overwrite").parquet(out)
            staged = self.spark.read.parquet(out)
            m = staged.agg(
                F.count("*").alias("rows"),
                F.bit_xor(F.xxhash64("doc_id", "term", "wdf")).alias("postings_hash"),
                F.sum("wdf").alias("collfreq"),
            ).collect()[0]
            self._append(
                {
                    "status": "done",
                    "shard": shard,
                    "rows": int(m["rows"] or 0),
                    "postings_hash": int(m["postings_hash"] or 0),
                    "collfreq": int(m["collfreq"] or 0),
                    "elapsed_sec": round(time.time() - t0, 3),
                    "ts": time.time(),
                }
            )
            n_done_this_run += 1

        # Merge phase: deterministic over the staged flat postings.
        flat_all = self.spark.read.parquet(os.path.join(self.work_dir, "flat"))
        return build_index(
            self.spark,
            corpus,
            id_col=id_col,
            content_col=content_col,
            meta_cols=meta_cols,
            mode=mode,
            with_positions=with_positions,
            flat_postings=flat_all,
        )
