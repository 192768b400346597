"""CLI end-to-end: index → search → delve → suggest through main(argv)
(the xapian-quest/-delve analogs, bin/quest.cc / bin/xapian-delve.cc).

Runs in-process: cli._spark() uses getOrCreate, so the commands share the
test session instead of paying a JVM spawn per command.
"""

from __future__ import annotations

import json


def _run(capsys, argv):
    from xapian_spark.cli import main

    assert main(argv) == 0
    return capsys.readouterr().out


def test_cli_index_search_delve_suggest(spark, corpus, tmp_path, capsys):
    corpus_path = str(tmp_path / "corpus.parquet")
    corpus.write.mode("overwrite").parquet(corpus_path)
    ix_dir = str(tmp_path / "ix")

    out = _run(capsys, ["index", corpus_path, ix_dir, "--meta", "lang"])
    manifest = json.loads(out.strip().splitlines()[-1])
    assert manifest["stats"]["doccount"] == corpus.count()

    out = _run(capsys, ["search", ix_dir, "binary_search", "-k", "5"])
    rows = [ln.split("\t") for ln in out.strip().splitlines()]
    assert 0 < len(rows) <= 5
    weights = [float(r[2]) for r in rows]
    assert weights == sorted(weights, reverse=True)

    # pruned path returns the same ranking
    out2 = _run(capsys, ["search", ix_dir, "binary_search", "-k", "5", "--prune"])
    rows2 = [ln.split("\t") for ln in out2.strip().splitlines()]
    assert [r[1] for r in rows] == [r[1] for r in rows2]

    out = _run(capsys, ["delve", ix_dir, "--term", "return"])
    lines = out.strip().splitlines()
    dic = json.loads(lines[0])
    assert dic and dic[0]["term"] == "return" and dic[0]["termfreq"] > 0

    out = _run(capsys, ["suggest", ix_dir, "binary_saerch"])
    assert out.strip() == "binary_search"


def test_cli_check(spark, corpus, tmp_path, capsys):
    """check (xapian-check analog): clean index passes every invariant;
    a corrupted dictionary row fails with exit 1."""
    import shutil

    from pyspark.sql import functions as F

    from xapian_spark.cli import main

    corpus_path = str(tmp_path / "corpus2.parquet")
    corpus.write.mode("overwrite").parquet(corpus_path)
    ix_dir = str(tmp_path / "ix2")
    assert main(["index", corpus_path, ix_dir]) == 0
    capsys.readouterr()

    assert main(["check", ix_dir]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["ok"] is True
    assert report["dictionary_mismatch_terms"] == 0
    assert report["doclen_mismatch_docs"] == 0

    # corrupt the dictionary (double one term's collfreq) and re-check
    dic_path = f"{ix_dir}/dictionary"
    dic = spark.read.parquet(dic_path)
    broken = dic.withColumn(
        "collfreq",
        F.when(F.col("term") == "return", F.col("collfreq") * 2).otherwise(
            F.col("collfreq")
        ),
    )
    tmp_out = str(tmp_path / "dic_broken")
    broken.write.mode("overwrite").parquet(tmp_out)
    shutil.rmtree(dic_path)
    shutil.move(tmp_out, dic_path)
    assert main(["check", ix_dir]) == 1
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["ok"] is False and report["dictionary_mismatch_terms"] >= 1


def test_reconstruct_text_roundtrip(spark, index, corpus, capsys):
    """Database::reconstruct_text (database.h:918-941): positional terms →
    ordered text.  Round-trips corpus docs modulo case/punctuation (the
    tokenizer's output IS the expected text), honours the position window
    and the length cap, and is exposed as delve --reconstruct."""
    from xapian_spark.functions.tokenizer import xapian_tokenize
    from xapian_spark.operators.matcher import reconstruct_text

    docs = {
        r["doc_id"]: r["content"]
        for r in corpus.select("doc_id", "content").limit(3).collect()
    }
    for d, text in docs.items():
        toks = xapian_tokenize(text)
        got = reconstruct_text(index, d)
        assert got == " ".join(toks), f"doc {d}"

        # position window: [start_pos, end_pos] inclusive, 1-based
        win = reconstruct_text(index, d, start_pos=3, end_pos=7)
        assert win == " ".join(toks[2:7])

        # length cap: stop once >= length bytes (slightly more is fine)
        capped = reconstruct_text(index, d, length=10)
        full = " ".join(toks)
        assert full.startswith(capped) and len(capped) >= min(10, len(full))


def test_cli_delve_reconstruct(spark, corpus, tmp_path, capsys):
    from xapian_spark.functions.tokenizer import xapian_tokenize
    from xapian_spark.cli import main

    corpus_path = str(tmp_path / "corpus_rt.parquet")
    corpus.write.mode("overwrite").parquet(corpus_path)
    ix_dir = str(tmp_path / "ix_rt")
    assert main(["index", corpus_path, ix_dir]) == 0
    capsys.readouterr()

    row = corpus.select("doc_id", "content").first()
    assert main(["delve", ix_dir, "--reconstruct", str(row["doc_id"])]) == 0
    out = capsys.readouterr().out.rstrip("\n")
    assert out == " ".join(xapian_tokenize(row["content"]))


def test_cli_check_missing_term(spark, corpus, tmp_path, capsys):
    """check must flag a dictionary entry whose postings are entirely GONE
    (and vice versa) — the full-outer join leaves one side NULL there, and
    a plain != silently passed it before the eqNullSafe fix (ADVICE r04)."""
    import shutil

    from pyspark.sql import functions as F

    from xapian_spark.cli import main

    corpus_path = str(tmp_path / "corpus_mt.parquet")
    corpus.write.mode("overwrite").parquet(corpus_path)
    ix_dir = str(tmp_path / "ix_mt")
    assert main(["index", corpus_path, ix_dir]) == 0
    capsys.readouterr()

    # drop EVERY posting block of one real term: the dictionary row
    # survives with no decoded counterpart (missing-postings corruption)
    post_path = f"{ix_dir}/postings"
    post = spark.read.parquet(post_path)
    victim = post.select("term").first()["term"]
    broken = post.filter(F.col("term") != victim)
    tmp_out = str(tmp_path / "post_broken")
    broken.write.mode("overwrite").parquet(tmp_out)
    shutil.rmtree(post_path)
    shutil.move(tmp_out, post_path)

    assert main(["check", ix_dir]) == 1
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["ok"] is False
    # the victim term now exists ONLY in the dictionary: the decoded side of
    # the full join is NULL, which a plain != used to swallow
    assert report["dictionary_mismatch_terms"] >= 1


def test_cli_delve_allterms(spark, corpus, tmp_path, capsys):
    """delve --allterms [prefix]: the allterms_begin(prefix) dictionary
    scan (include/xapian/database.h:283-306)."""
    from xapian_spark.cli import main

    corpus_path = str(tmp_path / "corpus3.parquet")
    corpus.write.mode("overwrite").parquet(corpus_path)
    ix_dir = str(tmp_path / "ix3")
    assert main(["index", corpus_path, ix_dir]) == 0
    capsys.readouterr()

    assert main(["delve", ix_dir, "--allterms", "ret", "-k", "50"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines and all(ln.split("\t")[0].startswith("ret") for ln in lines)
    terms = [ln.split("\t")[0] for ln in lines]
    assert terms == sorted(terms) and "return" in terms


def test_cli_delve_termlist(spark, corpus, tmp_path, capsys):
    """delve --termlist DOCID: the termlist_begin(did) analog
    (include/xapian/database.h:211-223) — the doc's terms with wdf in
    term order."""
    from xapian_spark.cli import main
    from xapian_spark.functions.tokenizer import xapian_tokenize

    corpus_path = str(tmp_path / "corpus4.parquet")
    corpus.write.mode("overwrite").parquet(corpus_path)
    ix_dir = str(tmp_path / "ix4")
    assert main(["index", corpus_path, ix_dir]) == 0
    capsys.readouterr()

    row = corpus.filter("doc_id = 3").first()
    expect = {}
    for t in xapian_tokenize(row["content"]):
        expect[t] = expect.get(t, 0) + 1

    assert main(["delve", ix_dir, "--termlist", "3", "-k", "100000"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    got = {}
    for ln in lines:
        term, wdf = ln.split("\t")
        got[term] = int(wdf.removeprefix("wdf="))
    terms = list(got)
    assert terms == sorted(terms)
    assert got == expect
