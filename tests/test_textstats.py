"""Language-ID heuristic tests on real multilingual snippets.

The driver entry (`lang_id`) proves Spark↔SQL arithmetic parity on the
synthetic corpus; these tests prove the heuristic actually identifies
languages when the text is genuinely multilingual.
"""

from __future__ import annotations


def test_language_id_real_text(spark):
    from xapian_spark.operators.textstats import language_id

    rows = [
        (1, "the cat sat on the mat and it was happy"),
        (2, "der hund ist nicht mit der katze und das ist gut"),
        (3, "el perro y el gato que viven en la casa por un rato"),
        (4, "le chien et le chat est dans la maison pour le moment"),
        (5, "的 是 不 我 了 在 有"),
        (6, "zzz qqq xxx"),
        (7, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["lang_pred"], r["marker_ratio"])
        for r in language_id(df).collect()
    }
    assert out[1][0] == "en"
    assert out[2][0] == "de"
    assert out[3][0] == "es"
    assert out[4][0] == "fr"
    assert out[5][0] == "zh"
    assert out[6] == ("und", 0.0)
    assert out[7] == ("und", 0.0)
    # doc 1: markers the(2) and(1) it(1) was(1) = 5 of 10 tokens
    assert abs(out[1][1] - 0.5) < 1e-9


def test_language_id_tie_breaks_to_marker_order(spark):
    from xapian_spark.operators.textstats import language_id

    # one en marker, one de marker → tie → earlier profile (en) wins
    df = spark.createDataFrame([(1, "the und")], "doc_id long, text string")
    assert language_id(df).collect()[0]["lang_pred"] == "en"
