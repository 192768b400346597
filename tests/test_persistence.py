"""Save/load roundtrip + parallelism invariance (backend-matrix analog:
the reference runs every testcase over glass/honey/multi backends,
tests/harness/backendmanager*; our matrix is partitioning/parallelism)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_mset_equal
from xapian_spark.operators.matcher import Matcher
from xapian_spark.plans import query as Q
from xapian_spark.sources.catalog import load_index, save_index

QUERY = Q.Or([Q.Term("binary_search"), Q.Term("return"), Q.Term("error")])


def test_save_load_identical_results(spark, index, matcher, oracle, tmp_path):
    path = str(tmp_path / "ix")
    manifest = save_index(index, path)
    assert manifest["stats"]["doccount"] == index.stats["doccount"]
    loaded = load_index(spark, path)
    m2 = Matcher(spark, loaded)
    want = oracle.mset(QUERY, 10)
    assert_mset_equal(m2.mset_df(QUERY, 10).collect(), want)


def test_parallelism_invariance(spark, corpus, oracle):
    """Identical MSet regardless of input partitioning (FIXTURES.md F6)."""
    from xapian_spark.operators.indexer import build_index

    for parts in (1, 16):
        ix = build_index(
            spark, corpus.repartition(parts), meta_cols=["lang"]
        )
        m = Matcher(spark, ix)
        assert_mset_equal(m.mset_df(QUERY, 10).collect(), oracle.mset(QUERY, 10))


def test_postings_pruned_scan(spark, index, tmp_path):
    """Filter on term must reach the parquet scan (PushedFilters)."""
    path = str(tmp_path / "ix2")
    save_index(index, path)
    loaded = load_index(spark, path)
    plan = loaded.postings.filter(F.col("term") == "binary_search")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(term), EqualTo(term,binary_search)]" in plan


def test_pipelined_write_path_equals_save_index(spark, corpus, tmp_path):
    """build_index(write_path=…) — the overlapped persist used by bench —
    commits byte-for-byte the same tables+manifest semantics as the
    sequential build→save_index."""
    from xapian_spark.operators.indexer import LAST_BUILD_TIMINGS, build_index
    from xapian_spark.sources.catalog import load_index, save_index

    p_seq = str(tmp_path / "seq")
    p_pipe = str(tmp_path / "pipe")
    save_index(build_index(spark, corpus, meta_cols=["lang"]), p_seq)
    build_index(spark, corpus, meta_cols=["lang"], write_path=p_pipe)
    assert LAST_BUILD_TIMINGS["stats_ready_sec"] >= 0

    a = load_index(spark, p_seq)
    b = load_index(spark, p_pipe)
    assert a.stats == b.stats and a.config == b.config
    for t in ("docs", "dictionary", "postings"):
        da, db = getattr(a, t), getattr(b, t)
        assert sorted(map(tuple, da.collect())) == sorted(map(tuple, db.collect())), t
