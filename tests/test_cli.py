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
