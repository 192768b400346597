#!/usr/bin/env python
"""Benchmark harness.

Default run (what the per-round driver executes):
  - index-build throughput over $SPARK_GRAFT_SF_DIR/documents.parquet
    (Xapian-faithful tokenizer, full block/codec pipeline, written to disk);
  - headline query latencies through the same entrypoints the correctness
    gate uses (warm index);
  - two-parallelism scaling evidence (north rule): the SAME synthetic
    corpus indexed at taskset-pinned 2 and 8 cores in fresh subprocesses,
    paired per attempt (probe → leg2 → leg8) so host weather cancels in
    each ratio; efficiency = (T_2 / T_8) / 4, median attempt reported.
    Skippable with SPARK_GRAFT_NO_SCALING=1.

Prints exactly ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., ...extra keys...}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def _mk_spark(cpus: int):
    from xapian_spark.session import get_spark

    # 1 shuffle partition per core (min 8): finer tasks were measured to
    # COST more than their straggler-smoothing saves (mapInPandas pays a
    # fixed Arrow/python per-task toll: 3x partitions = +34% busy core-sec).
    # JVM unified logging writes to STDOUT by default and a single
    # "[warning][gc,alloc] …" line corrupts the driver's one-JSON-line
    # contract (observed during the 1.28M soak) — route it to stderr.
    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, cpus),
        extra_conf={
            # AlwaysPreTouch: fault the heap in at JVM startup (untimed —
            # the warmup build precedes every timed section) instead of
            # paying kernel page-zeroing inside the timed legs; this box
            # shows heavy sys-time in the JVM under load.
            "spark.driver.extraJavaOptions": "-Xlog:all=warning:stderr -XX:+AlwaysPreTouch",
            # progress bars land on stdout in this harness and crowd the
            # driver's 2000-byte tail window
            "spark.ui.showConsoleProgress": "false",
            # local mode = one JVM for driver AND executors; the 1.28M-doc
            # pipeline soak shuffles >100M rows and thrashes an 8g heap
            # (GCLocker alloc failures observed), so the bench session
            # gets headroom (box has 128 GiB)
            "spark.driver.memory": os.environ.get(
                "SPARK_DRIVER_MEMORY", "24g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _cpu_jiffies():
    """System-wide (busy, idle) jiffies — used to measure the cores a leg
    ACTUALLY consumes.  local[N] bounds task slots, not JVM GC/IO threads or
    Python daemons, so a local[2] run typically burns ~2.5 cores; per-busy-
    core throughput is the honest single-box scaling metric (see
    BENCH/BASELINE.md)."""
    with open("/proc/stat") as f:
        vals = list(map(int, f.readline().split()[1:]))
    idle = vals[3] + vals[4]
    return sum(vals), idle


def _tree_cpu_sec() -> float:
    """CPU seconds consumed by THIS process tree (python driver + the py4j
    JVM + pyspark daemon/workers), dead children included via reaped-child
    rusage.  Unlike /proc/stat this excludes neighbor processes — the
    per-round driver itself burns ~0.5-1 core on this box, which polluted
    the system-wide numbers."""
    import resource

    total = 0.0
    # live descendants: walk /proc for processes whose ancestry reaches us
    me = os.getpid()
    parents: dict[int, int] = {}
    stats: dict[int, float] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            # after comm: state ppid ... utime=11th stime=12th (0-indexed
            # fields 11,12 counting from 'state' as field 0)
            ppid = int(parts[1])
            utime, stime = int(parts[11]), int(parts[12])
            pid = int(d)
            parents[pid] = ppid
            stats[pid] = (utime + stime) / os.sysconf("SC_CLK_TCK")
        except (OSError, IndexError, ValueError):
            continue

    def _mine(pid: int) -> bool:
        seen = 0
        while pid > 1 and seen < 64:
            if pid == me:
                return True
            pid = parents.get(pid, 1)
            seen += 1
        return False

    total += sum(sec for pid, sec in stats.items() if _mine(pid))
    ru = resource.getrusage(resource.RUSAGE_CHILDREN)  # reaped children
    total += ru.ru_utime + ru.ru_stime
    return total


def build_only(cpus: int, n_docs: int, seed: int = 42, warmup_docs: int = 20000) -> dict:
    """Index-build throughput over the deterministic synthetic corpus.

    An untimed warmup build (same pipeline, DISJOINT seed — identical
    plans would be served from the Spark plan cache and fake the timing)
    runs first: JIT/codegen compilation and python-worker spawn + imports
    are per-executor constants that a long-running cluster build amortizes
    to nothing.  Measured effect on a ≥40 s leg is small (a few percent);
    it is kept because steady-state throughput is what the north rule's
    N→4N criterion is about, and the cost is one 20k-doc build.
    """
    from xapian_spark.operators import indexer as indexer_mod
    from xapian_spark.operators.indexer import build_index
    from xapian_spark.sources.corpus import corpus_df

    spark = _mk_spark(cpus)
    if warmup_docs:
        wout = tempfile.mkdtemp(prefix="xsw_")
        wcorpus = corpus_df(
            spark, warmup_docs, seed=seed + 1, n_partitions=int(os.environ.get("SPARK_GRAFT_CORPUS_PARTS", "0")) or max(cpus * 2, 16)
        )
        build_index(
            spark, wcorpus, content_col="content", meta_cols=["repo", "lang"],
            write_path=wout,
        )
        shutil.rmtree(wout, ignore_errors=True)
        spark.catalog.clearCache()  # drop the warmup build's persisted tables
    corpus = corpus_df(
        spark, n_docs, seed=seed, n_partitions=int(os.environ.get("SPARK_GRAFT_CORPUS_PARTS", "0")) or max(cpus * 2, 16)
    ).persist()
    corpus.count()  # materialize generation outside the timed section
    out = tempfile.mkdtemp(prefix="xsb_")
    j0, i0 = _cpu_jiffies()
    c0 = _tree_cpu_sec()
    t0 = time.perf_counter()
    # Pipelined build+persist: docs/dictionary writes overlap the stats
    # action inside build_index (see indexer.py), postings write + manifest
    # commit follow — one call, shorter critical path than build→save.
    build_index(
        spark, corpus, content_col="content", meta_cols=["repo", "lang"],
        write_path=out,
    )
    dt = time.perf_counter() - t0
    tim = dict(indexer_mod.LAST_BUILD_TIMINGS)
    t_build = tim.get("stats_ready_sec", dt)
    j1, i1 = _cpu_jiffies()
    c1 = _tree_cpu_sec()
    busy_sec = c1 - c0  # our tree only; system-wide kept for cross-check
    n_blocks = spark.read.parquet(f"{out}/postings").count()
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()
    return {
        "cpus": cpus,
        "docs": n_docs,
        "seconds": round(dt, 3),
        # stats phase = time to the stats row (docs/dict writes overlap it);
        # write phase = the remaining critical path (postings + joins/commit)
        "phase_stats_sec": round(t_build, 3),
        "phase_write_sec": round(dt - t_build, 3),
        "phase_postings_write_sec": tim.get("postings_write_sec"),
        "system_busy_core_sec": round(((j1 - j0) - (i1 - i0)) / 100.0, 1),
        "docs_per_sec": round(n_docs / dt, 1),
        "busy_core_sec": round(busy_sec, 1),
        "avg_cores_busy": round(busy_sec / dt, 2),
        "docs_per_core_sec": round(n_docs / busy_sec, 1) if busy_sec > 0 else None,
        "blocks": n_blocks,
    }


HEADLINE = [
    "bm25_single_hot",
    # wand_* PIN the block-max-pruned kernel (coverage of the pruned path;
    # at bench sf it is below its measured crossover); wand_auto_* report
    # the prune='auto' decision's latency — what production would run.
    "bm25_wand_hot",
    "bm25_wand_auto_hot",
    "bm25_or2",
    "bm25_wand_or2",
    "bm25_wand_auto_or2",
    "bm25_or4",
    "bm25_and",
    "bm25_andnot",
    "bm25_synonym",
    "bm25_wildcard_or",
    "bm25_phrase_adjacent",
    "bm25_near",
    "collapse_best_per_lang",
    "facet_lang",
    "dedup_minhash_lsh",
    "dedup_shingle_jaccard",
    "dedup_repeated_spans",
    "simhash_fingerprint",
    "fingerprint_winnow",
    "text_quality",
    "token_counts",
    "lang_id",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embed_nn_pairs_topk",
]


def _synth_embeddings(spark, n: int, dim: int = 64, clusters: int = 1000):
    """Deterministic clustered embeddings, generated DISTRIBUTED: hash-mixed
    cluster base vector + per-row jitter (near-dup structure for LSH)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    dims = None

    def gen(batches):
        import numpy as np
        import pandas as pd

        d = np.arange(dim, dtype=np.int64)
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            if not len(ids):
                continue
            c = ids % clusters

            def mix(x, salt):
                v = (x[:, None] * 2654435761 + d[None, :] * 40503 + salt) % (1 << 31)
                return v / float(1 << 31) * 2.0 - 1.0

            mat = mix(c, 7) + 0.15 * mix(ids, 13)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [row.tolist() for row in mat]}
            )

    return (
        spark.range(n)
        .select(F.col("id").alias("vec_id"))
        .mapInPandas(gen, "vec_id long, embedding array<double>")
    )


def pipeline_scale(spark, n_docs: int, emb_docs: int) -> dict:
    """Scale soak for the LLM-pipeline operators (VERDICT r03 #8): run
    minhash / jaccard / winnow / ann_lsh / embedding_near_dups once at
    ``n_docs`` synthetic docs (+ ``emb_docs`` synthetic embeddings) and
    record latency + cap/prune telemetry.  Caps (max_bucket_size /
    max_shingle_df) are ON — the soak exercises exactly the degenerate-key
    safety valves the 100 TB path depends on."""
    from pyspark.sql import functions as F

    from xapian_spark.operators.dedup import (
        band_bucket_sizes,
        minhash_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
        shingles,
        winnow_fingerprints,
    )
    from xapian_spark.operators.similarity import (
        AnnLshIndex,
        embedding_near_dups,
        lsh_bucket_sizes,
    )
    from xapian_spark.sources.corpus import corpus_df

    out: dict = {"docs": n_docs, "emb_docs": emb_docs}
    docs = (
        corpus_df(spark, n_docs, n_partitions=64)
        .select("doc_id", F.col("content").alias("text"))
        .persist()
    )
    docs.count()

    t0 = time.perf_counter()
    sh = shingles(docs, w=3).persist()
    n_sh = sh.count()
    out["shingles"] = {"seconds": round(time.perf_counter() - t0, 1), "rows": n_sh}

    cap = 200
    t0 = time.perf_counter()
    sig = minhash_signatures(sh, hash_impl="xxhash64")  # the at-scale family
    n_pairs = minhash_candidate_pairs(sig, bands=2, max_bucket_size=cap).count()
    sec = time.perf_counter() - t0
    dropped = (
        band_bucket_sizes(sig, bands=2)
        .filter(F.col("m") > cap)
        .count()
    )
    out["minhash_lsh"] = {
        "seconds": round(sec, 1),
        "pairs": n_pairs,
        "max_bucket_size": cap,
        "buckets_dropped": dropped,
        "hash_impl": "xxhash64",
    }

    df_cap = 100
    t0 = time.perf_counter()
    n_j = ngram_jaccard_pairs(
        sh, threshold=0.8, max_shingle_df=df_cap, join_on_hash=True
    ).count()
    out["shingle_jaccard"] = {
        "seconds": round(time.perf_counter() - t0, 1),
        "pairs": n_j,
        "max_shingle_df": df_cap,
        "join_on_hash": True,
    }

    t0 = time.perf_counter()
    n_w = winnow_fingerprints(docs).count()
    out["winnow"] = {"seconds": round(time.perf_counter() - t0, 1), "rows": n_w}
    sh.unpersist()
    docs.unpersist()

    emb = _synth_embeddings(spark, emb_docs).persist()
    emb.count()
    t0 = time.perf_counter()
    ix = AnnLshIndex(emb, dim=64, n_planes=16, bands=4, signature_impl="arrow")
    out["ann_lsh_build"] = {
        "seconds": round(time.perf_counter() - t0, 1),
        "buckets": ix.buckets.count(),
    }
    qvec = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    t0 = time.perf_counter()
    ix.query(qvec, k=10).collect()
    out["ann_lsh_query"] = {"seconds": round(time.perf_counter() - t0, 1)}

    nd_cap = 1000
    t0 = time.perf_counter()
    n_nd = embedding_near_dups(ix, threshold=0.9, max_bucket_size=nd_cap).count()
    sec = time.perf_counter() - t0
    nd_dropped = lsh_bucket_sizes(ix).filter(F.col("m") > nd_cap).count()
    out["embedding_near_dups"] = {
        "seconds": round(sec, 1),
        "pairs": n_nd,
        "max_bucket_size": nd_cap,
        "buckets_dropped": nd_dropped,
    }
    ix.unpersist()
    emb.unpersist()
    return out


def full(
    cpus: int,
    sf_dir: str,
    scale_docs: int,
    do_scaling: bool,
    pipeline_docs: int = 0,
    pipeline_emb_docs: int = 0,
) -> dict:
    """Every section is fail-soft (VERDICT r04 #1): one exception anywhere
    must not cost the round its bench artifact, so each section lands either
    its numbers or a one-line error under ``errors`` — the JSON line always
    prints with whatever completed."""
    t_start = time.perf_counter()
    errors: dict[str, str] = {}
    result = {
        "metric": "index-build docs/sec + headline query latency (sf documents)",
        "unit": "sec",
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
    }
    spark = _mk_spark(cpus)

    # 1) index-build throughput over the sf documents table (xapian mode)
    try:
        from xapian_spark.operators.indexer import build_index

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
        n_docs = docs.count()
        out = tempfile.mkdtemp(prefix="xsb_")
        t0 = time.perf_counter()
        build_index(
            spark, docs, id_col="doc_id", content_col="text",
            meta_cols=["lang"], mode="xapian", write_path=out,
        )
        build_sec = time.perf_counter() - t0
        shutil.rmtree(out, ignore_errors=True)
        result["index_build"] = {
            "docs": n_docs,
            "seconds": round(build_sec, 3),
            "docs_per_sec": round(n_docs / build_sec, 1),
            "cpus": cpus,
        }
    except Exception as e:  # noqa: BLE001 — fail-soft by contract
        errors["index_build"] = f"{type(e).__name__}: {e}"[:300]

    # 2) headline query latencies via the driver-contract entrypoints
    queries_cold: dict[str, float] = {}
    queries: dict[str, float] = {}
    try:
        from xapian_spark.entrypoints import SPARK_QUERIES, get_matcher

        get_matcher(spark, sf_dir)  # warm the shared simple-mode index
        # Warm the shingle table too: at scale shingling is INDEX-time work
        # (a persisted table built once, like postings), so query latencies
        # below measure the dedup operators, not corpus re-shingling.
        from xapian_spark.entrypoints import _ann_index, _shingles

        _shingles(spark, sf_dir)
        # the ANN LSH bucket table is likewise built once at index time
        _ann_index(spark, sf_dir)
        # Two passes: the FIRST call pays plan compilation + cache warming
        # (one-off costs a long-lived service amortizes to nothing), the
        # second measures steady state.  ``queries`` reports steady state;
        # the cold numbers land in BENCH_FULL.json as queries_cold.
        for target in (queries_cold, queries):
            for name in HEADLINE:
                fn = SPARK_QUERIES[name]
                try:
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).collect()
                    target[name] = round(time.perf_counter() - t0, 3)
                except Exception as e:  # noqa: BLE001
                    errors[f"query:{name}"] = f"{type(e).__name__}: {e}"[:200]
    except Exception as e:  # noqa: BLE001 — warmup itself failed
        errors["queries"] = f"{type(e).__name__}: {e}"[:300]
    result["queries"] = queries
    result["queries_cold"] = queries_cold

    if pipeline_docs > 0:
        try:
            result["pipeline_scale"] = pipeline_scale(
                spark, pipeline_docs, pipeline_emb_docs
            )
        except Exception as e:  # noqa: BLE001
            errors["pipeline_scale"] = f"{type(e).__name__}: {e}"[:300]
    spark.stop()

    # 3) two-parallelism scaling (same input; 2 vs 8 cores = N vs 4N with
    # neither leg into SMT territory on this 32-physical-core box — see
    # BENCH/BASELINE.md for methodology + per-busy-core normalization)
    if do_scaling:
        try:
            result["scaling"] = _scaling(scale_docs)
        except Exception as e:  # noqa: BLE001
            errors["scaling"] = f"{type(e).__name__}: {e}"[:300]

    if errors:
        result["errors"] = errors
    result["value"] = round(time.perf_counter() - t_start, 3)
    return result


def _run_leg(cpus: int, scale_docs: int) -> dict:
    """One pinned build leg in a fresh subprocess.

    Pin the WHOLE process tree (JVM + GC threads + python workers) to
    exactly `cpus` cores: this box has 32 physical cores (no SMT), and an
    unpinned local[2] JVM spreads GC/IO/daemon threads over the idle 30 —
    burning ~2.7 cores and flattering the small leg.  taskset makes each
    leg a faithful c-core executor container, so the wall-clock ratio IS
    the N→4N scaling efficiency.
    """
    cmd = [
        sys.executable,
        os.path.abspath(__file__),
        "--build-only",
        "--cpus",
        str(cpus),
        "--scale-docs",
        str(scale_docs),
    ]
    if shutil.which("taskset"):
        # pin to the TOP of the core range: core 0 (and neighbors) service
        # IRQs and kernel housekeeping — measured 13-16% slower than high
        # cores for the identical pinned leg — and both legs must see the
        # same core quality for the ratio to mean anything
        nc = os.cpu_count() or 32
        cmd = ["taskset", "-c", f"{nc - cpus}-{nc - 1}"] + cmd
    r = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    return json.loads(r.stdout.strip().splitlines()[-1])


def _scaling(scale_docs: int) -> dict:
    """Paired-attempt scaling protocol.

    Single-leg medians (the r2 protocol) are biased by host drift BETWEEN
    the local[2] block and the local[8] block — this shared VM's per-core
    throughput swings ±20% with neighbor load (measured; see the host
    probe docstring).  Instead each ATTEMPT runs `probe → leg2 → leg8`
    back-to-back, so weather that slows both legs alike cancels inside the
    per-attempt ratio; the recorded efficiency is the median attempt's.
    Attempts whose fixed-work host probe shows a degraded box
    (< SPARK_GRAFT_PROBE_MIN per-core ratio, default 0.9) are recorded but
    excluded from the median when enough clean attempts exist — up to
    SPARK_GRAFT_SCALING_MAX (default runs+2) attempts are made to get
    SPARK_GRAFT_SCALING_RUNS (default 3) clean ones.  Everything is
    reported: every attempt's probe + efficiency, and which were used.
    """
    n_attempts = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
    max_attempts = int(
        os.environ.get("SPARK_GRAFT_SCALING_MAX", str(n_attempts + 5))
    )
    probe_min = float(os.environ.get("SPARK_GRAFT_PROBE_MIN", "0.9"))
    attempts = []

    def _attempt_quality(a):
        """(min bracket ratio, min bracket fixed-work time) — an attempt is
        only as clean as its WORSE bracket probe; the before-probe alone
        misses weather arriving mid-attempt (observed: probe 1.07 → attempt
        efficiency 0.60 while the after-window was degraded)."""
        r = min(
            a["probe_before"]["host_per_core_ratio"],
            a["probe_after"]["host_per_core_ratio"],
        )
        t = max(
            a["probe_before"]["fixed_work_2procs_sec"],
            a["probe_after"]["fixed_work_2procs_sec"],
        )
        return r, t

    def _clean_set():
        # absolute-time check is self-calibrating: the fastest probe seen
        # this session is the quiet-box reference; a probe >20% over it
        # means neighbor load even if the 2-vs-8 ratio happens to look fine
        best = min(_attempt_quality(a)[1] for a in attempts)
        out = []
        for a in attempts:
            r, t = _attempt_quality(a)
            # efficiency > 1.05 is physically impossible on one box
            # (superlinear 2→8 scaling = the 2-core leg was contaminated
            # by load the probes missed) — never let it into the pool,
            # where it would inflate the median
            if r >= probe_min and t <= 1.2 * best and a["efficiency"] <= 1.05:
                out.append(a)
        return out

    failed_attempts: list[str] = []
    for _ in range(max_attempts):
        try:
            pb = _host_probe()
            leg2 = _run_leg(2, scale_docs)
            leg8 = _run_leg(8, scale_docs)
            pa = _host_probe()
        except Exception as e:  # noqa: BLE001 — one bad leg ≠ no scaling number
            failed_attempts.append(f"{type(e).__name__}: {e}"[:200])
            continue
        eff = (leg2["seconds"] / leg8["seconds"]) / 4.0
        attempts.append(
            {
                "probe_before": pb,
                "probe_after": pa,
                "local[2]": leg2,
                "local[8]": leg8,
                "efficiency": round(eff, 3),
            }
        )
        if len(_clean_set()) >= n_attempts:
            break
    if not attempts:
        raise RuntimeError(
            f"all {max_attempts} scaling attempts failed: {failed_attempts}"
        )
    clean = _clean_set()

    # Per-leg minima across ALL attempts: sporadic host spikes on a pinned
    # leg are additive and nonnegative, so min-over-repeats estimates each
    # leg's intrinsic time.  Reported alongside the medians; under
    # PERSISTENT neighbor load (every probe degraded, both legs slowed
    # together) the median of per-attempt RATIOS is the less biased
    # statistic — paired legs cancel shared slowdown, while cross-attempt
    # minima can pair a lucky t2 with an unlucky-window t8.
    t2_min = min(a["local[2]"]["seconds"] for a in attempts)
    t8_min = min(a["local[8]"]["seconds"] for a in attempts)
    minima_eff = round((t2_min / t8_min) / 4.0, 3)

    if len(clean) >= n_attempts:
        pool = sorted(clean, key=lambda a: a["efficiency"])
        med = pool[len(pool) // 2]
        primary = med["efficiency"]
        estimator = f"median of {len(pool)} bracket-clean paired attempts"
    else:
        pool = sorted(attempts, key=lambda a: a["efficiency"])
        med = pool[len(pool) // 2]
        primary = med["efficiency"]
        estimator = (
            f"median of all {len(attempts)} paired attempts (only "
            f"{len(clean)} bracket-clean — persistent host load; paired "
            "ratios cancel shared slowdown; per-leg minima reported too)"
        )

    scaling = {
        "protocol": (
            "paired attempts (probe, leg2, leg8, probe), taskset-pinned; "
            f"clean = both bracket probes >= {probe_min} per-core ratio and "
            "within 1.2x the session-best probe time"
        ),
        "estimator": estimator,
        "host_probe": med["probe_after"],
        "local[2]": med["local[2]"],
        "local[8]": med["local[8]"],
        "efficiency_wallclock_2_to_8": primary,
        "efficiency_median_attempt": med["efficiency"],
        "efficiency_leg_minima": minima_eff,
        "t2_min": t2_min,
        "t8_min": t8_min,
        "attempts": [
            {
                "efficiency": a["efficiency"],
                "probe_ratio_before": a["probe_before"]["host_per_core_ratio"],
                "probe_ratio_after": a["probe_after"]["host_per_core_ratio"],
                "t2": a["local[2]"]["seconds"],
                "t8": a["local[8]"]["seconds"],
                "clean": a in clean,
            }
            for a in attempts
        ],
    }
    if failed_attempts:
        scaling["failed_attempts"] = failed_attempts
    a2 = med["local[2]"].get("docs_per_core_sec")
    a8 = med["local[8]"].get("docs_per_core_sec")
    if a2 and a8:
        # per-actually-busy-core throughput ratio: the resource-normalized
        # efficiency (local[N] bounds task slots, not JVM/daemon threads)
        scaling["efficiency_per_busy_core"] = round(a8 / a2, 3)
    # Engine-over-host scaling: the chip itself runs 2 busy cores faster
    # than 8 (turbo/frequency + shared memory bus — the fixed-work pure-
    # Python probe measures exactly this, ~0.89-0.91 on this box, and it
    # is STRONGEST on a quiet box, so raw wall-clock efficiency
    # anticorrelates with box quietness).  Executors on separate cluster
    # nodes don't share a package: dividing the wall-clock ratio by the
    # bracketing probes' host ratio isolates the engine's own N→4N
    # scaling, the quantity that predicts cluster behavior.
    host_r = min(
        1.0,
        (
            med["probe_before"]["host_per_core_ratio"]
            + med["probe_after"]["host_per_core_ratio"]
        )
        / 2.0,
    )
    scaling["host_ratio_median_attempt"] = round(host_r, 3)
    scaling["efficiency_host_normalized"] = round(
        min(primary / host_r, 1.0), 3
    )
    return scaling


def _host_probe() -> dict:
    """Fixed-work pure-Python control: identical per-process loops on 2 vs
    8 pinned cores.  No engine code — the ratio isolates host/VM weather
    (neighbor load, steal) from engine scaling, since an ideal host gives
    1.0.  Measured on this box: 0.92 quiet, 0.83 under evening neighbor
    load — a swing that moves the wall-clock efficiency by ±0.2 on its
    own (see BENCH/BASELINE.md)."""
    code = "s=0\nfor i in range(20_000_000): s+=i*i\n"
    out = {}
    nc = os.cpu_count() or 32
    for n in (2, 8):
        cmd_base = [sys.executable, "-c", code]
        t0 = time.perf_counter()
        procs = []
        for i in range(n):
            cmd = cmd_base
            if shutil.which("taskset"):
                # probe the same high cores the legs run on (core 0 and
                # neighbors carry IRQ noise — see _run_leg)
                cmd = ["taskset", "-c", str(nc - 1 - i)] + cmd_base
            procs.append(subprocess.Popen(cmd))
        for p in procs:
            p.wait()
        out[f"fixed_work_{n}procs_sec"] = round(time.perf_counter() - t0, 2)
    out["host_per_core_ratio"] = round(
        out["fixed_work_2procs_sec"] / out["fixed_work_8procs_sec"], 3
    )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--build-only", action="store_true")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--scale-docs", type=int, default=160000)
    ap.add_argument(
        "--pipeline-docs",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_PIPELINE_DOCS", "0")),
        help=(
            "doc count for the pipeline-operator scale soak (0 = off; "
            "OPT-IN since r5 — it is the longest, most fragile section and "
            "its 1.28M/2.56M-doc results are committed in BENCH_FULL.json "
            "+ BENCH/BASELINE.md; set SPARK_GRAFT_PIPELINE_DOCS=1280000 "
            "to re-run it)"
        ),
    )
    ap.add_argument(
        "--pipeline-emb-docs",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_PIPELINE_EMB_DOCS", "320000")),
    )
    args = ap.parse_args()

    if args.build_only:
        print(json.dumps(build_only(args.cpus, args.scale_docs)))
        return

    do_scaling = os.environ.get("SPARK_GRAFT_NO_SCALING", "") != "1"
    try:
        res = full(
            args.cpus,
            args.sf_dir,
            args.scale_docs,
            do_scaling,
            pipeline_docs=args.pipeline_docs,
            pipeline_emb_docs=args.pipeline_emb_docs,
        )
    except Exception as e:  # noqa: BLE001 — the JSON line MUST print
        res = {
            "metric": "index-build docs/sec + headline query latency (sf documents)",
            "unit": "sec",
            "sf": args.sf_dir.rstrip("/").rsplit("sf", 1)[-1],
            "queries": {},
            "value": 0.0,
            "errors": {"fatal": f"{type(e).__name__}: {e}"[:400]},
        }
    # The per-round driver keeps only the LAST ~2000 bytes of stdout and
    # parses the JSON line out of that window — round 3's full result
    # outgrew it and failed to parse.  Full detail goes to BENCH_FULL.json
    # (committed, referenced from BENCH/BASELINE.md); stdout gets a
    # compact line guaranteed to fit.
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_FULL.json"), "w") as f:
            json.dump(res, f, indent=1)
    except OSError:
        pass
    compact = {
        "metric": res["metric"],
        "value": res["value"],
        "unit": res["unit"],
        "sf": res["sf"],
        "queries": res["queries"],
        "detail": "BENCH_FULL.json",
    }
    if "index_build" in res:
        compact["build_docs_per_sec"] = res["index_build"]["docs_per_sec"]
    if "errors" in res:
        compact["errors"] = {
            k: v[:80] for k, v in list(res["errors"].items())[:4]
        }
    if "scaling" in res:
        sc = res["scaling"]
        compact["scaling"] = {
            "efficiency_wallclock_2_to_8": sc.get("efficiency_wallclock_2_to_8"),
            "efficiency_per_busy_core": sc.get("efficiency_per_busy_core"),
            "efficiency_host_normalized": sc.get("efficiency_host_normalized"),
            "host_probe_ratio": sc.get("host_probe", {}).get(
                "host_per_core_ratio"
            ),
            "t2_min": sc.get("t2_min"),
            "t8_min": sc.get("t8_min"),
            "docs_per_sec_2": sc.get("local[2]", {}).get("docs_per_sec"),
            "docs_per_sec_8": sc.get("local[8]", {}).get("docs_per_sec"),
        }
    if "pipeline_scale" in res:
        p = res["pipeline_scale"]
        compact["pipeline_scale_sec"] = {
            k: v.get("seconds") for k, v in p.items() if isinstance(v, dict)
        }
        compact["pipeline_scale_docs"] = p.get("docs")
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1800:  # last-resort trims to stay inside the window
        compact.pop("pipeline_scale_sec", None)
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1800:
        compact["queries"] = {
            k: round(v, 2) for k, v in list(compact["queries"].items())[:20]
        }
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
