"""Snowball English stemmer: validated against the reference's FULL golden
vocabulary (xapian-data/stemming/english/, 42,649 pairs — the same data
tests/stemtest.cc uses), plus STEM_SOME end-to-end parity."""

import os

import pytest

GOLD_DIR = "/root/reference/xapian-data/stemming/english"


@pytest.mark.skipif(not os.path.isdir(GOLD_DIR), reason="reference goldens absent")
def test_full_golden_vocabulary():
    from xapian_spark.functions.stem_en import stem_english

    voc = open(f"{GOLD_DIR}/voc.txt").read().splitlines()
    out = open(f"{GOLD_DIR}/output.txt").read().splitlines()
    assert len(voc) == len(out) and len(voc) > 40000
    bad = [(v, stem_english(v), o) for v, o in zip(voc, out) if stem_english(v) != o]
    assert not bad, bad[:10]


def test_known_stems():
    from xapian_spark.functions.stem_en import stem_english as S

    assert S("running") == "run"
    assert S("flies") == "fli"
    assert S("dying") == "die"
    assert S("generously") == "generous"
    assert S("communication") == "communic"
    assert S("sky") == "sky"  # invariant exception
    assert S("early") == "earli"  # -LY exception


def test_stem_some_engine_vs_oracle(spark, corpus):
    """STEM_SOME end-to-end: Z-prefixed stemmed terms searchable, doclen
    includes Z-term wdf, unstemmed positional terms still there."""
    from tests.conftest import N_DOCS, assert_mset_equal
    from xapian_spark.operators.indexer import build_index
    from xapian_spark.operators.matcher import Matcher
    from xapian_spark.oracle import OracleMatcher, build_oracle_index
    from xapian_spark.plans import query as Q
    from xapian_spark.sources.corpus import generate_corpus

    ix = build_index(spark, corpus, meta_cols=["lang"], stem="en")
    om = OracleMatcher(
        build_oracle_index(
            [(i + 1, r[4]) for i, r in enumerate(generate_corpus(N_DOCS))], stem="en"
        )
    )
    m = Matcher(spark, ix)
    assert ix.stats["total_length"] == om.ix.total_length
    for q in [
        Q.Term("Zreturn"),  # stem of 'returns'/'returned'/'return'
        Q.Or([Q.Term("Zsort"), Q.Term("Zsearch")]),
        Q.Term("binary_search"),  # unstemmed positional form still present
        Q.Phrase([Q.Term("binary_search"), Q.Term("merge_sort")]),
    ]:
        assert_mset_equal(m.mset_df(q, 10).collect(), om.mset(q, 10))
    # Zsort matches docs containing 'sorted'/'sorting' etc.
    assert m.count_matches(Q.Term("Zsort")) >= m.count_matches(Q.Term("sorted"))


def test_stem_col_per_document(spark):
    """stem_col: each doc is stemmed by its own language column; unknown
    tags index unstemmed instead of failing; Z-terms are language-correct."""
    from pyspark.sql import Row

    from xapian_spark.operators.indexer import build_index

    from xapian_spark.operators.indexer import invert_corpus

    docs = spark.createDataFrame([
        Row(doc_id=1, text="running searches", lang="en"),
        Row(doc_id=2, text="flickorna springer", lang="sv"),
        Row(doc_id=3, text="running flickorna", lang="xx"),  # junk tag
        Row(doc_id=4, text="corriendo buscando", lang=None),  # missing tag
    ])
    flat = invert_corpus(docs, id_col="doc_id", content_col="text",
                         stem_col="lang")
    terms = {
        (r["doc_id"], r["term"])
        for r in flat.select("doc_id", "term").collect()
    }
    assert (1, "Zrun") in terms and (1, "Zsearch") in terms
    assert (2, "Zflick") in terms  # Swedish: flickorna -> flick
    assert (1, "running") in terms  # STEM_SOME keeps positional originals
    # doc 3: junk tag -> no Z-terms at all, originals intact
    assert (3, "running") in terms and (3, "flickorna") in terms
    assert not any(d == 3 and t.startswith("Z") for d, t in terms)
    assert not any(d == 4 and t.startswith("Z") for d, t in terms)
    # mutual exclusion guard
    import pytest as _pytest

    with _pytest.raises(ValueError):
        build_index(spark, docs, id_col="doc_id", content_col="text",
                    stem="en", stem_col="lang")


def test_parser_stemming(spark):
    from xapian_spark.plans import query as Q
    from xapian_spark.plans.parser import QueryParser

    p = QueryParser(stem="en")
    q = p.parse_query("running searches")
    assert isinstance(q, Q.Or)
    assert [c.term for c in q.children] == ["Zrun", "Zsearch"]
    # phrases stay unstemmed (positional terms)
    ph = p.parse_query('"running fast"')
    assert [c.term for c in ph.children] == ["running", "fast"]
    # numbers are not stemmed (should_stem)
    assert p.parse_query("123").term == "123"


SV_GOLD = "/root/reference/xapian-data/stemming/swedish"
PORTER_GOLD = "/root/reference/xapian-data/stemming/porter"


@pytest.mark.skipif(not os.path.isdir(SV_GOLD), reason="reference goldens absent")
def test_swedish_full_golden_vocabulary():
    from xapian_spark.functions.stem_sv import stem_swedish

    voc = open(f"{SV_GOLD}/voc.txt", encoding="utf-8").read().splitlines()
    out = open(f"{SV_GOLD}/output.txt", encoding="utf-8").read().splitlines()
    assert len(voc) == len(out) and len(voc) > 30000
    bad = [(v, stem_swedish(v), o) for v, o in zip(voc, out) if stem_swedish(v) != o]
    assert not bad, bad[:10]


@pytest.mark.skipif(not os.path.isdir(PORTER_GOLD), reason="reference goldens absent")
def test_porter_full_golden_vocabulary():
    from xapian_spark.functions.stem_porter import stem_porter

    voc = open(f"{PORTER_GOLD}/voc.txt").read().splitlines()
    out = open(f"{PORTER_GOLD}/output.txt").read().splitlines()
    assert len(voc) == len(out) and len(voc) > 40000
    bad = [(v, stem_porter(v), o) for v, o in zip(voc, out) if stem_porter(v) != o]
    assert not bad, bad[:10]


def test_earlyenglish():
    """No reference goldens exist; pin the archaic-ending behavior and that
    the shared engine still matches plain English elsewhere."""
    from xapian_spark.functions.stemmers import get_stemmer

    ee = get_stemmer("earlyenglish")
    assert ee("maketh") == "make"
    assert ee("goest") == "go"
    assert ee("walkest") == "walk"
    assert ee("liveth") == "live"
    assert ee("best") == "best"  # no vowel in stem — not stripped
    assert ee("running") == "run"  # shared path unchanged


def test_esperanto():
    """No reference goldens; pin the .sbl semantics: suffix strip behind the
    two-syllable gate, guard-steps that delete accusative n / plural j then
    stop, apostrophe restoration, x-system canonicalization."""
    from xapian_spark.functions.stemmers import get_stemmer

    eo = get_stemmer("eo")
    assert eo("hundojn") == "hund"
    assert eo("parolis") == "parol"
    assert eo("belaj") == "bel"
    assert eo("min") == "mi"  # pronoun guard strips n, keeps base
    assert eo("kion") == "kio"  # correlative guard
    assert eo("tiujn") == "tiu"
    assert eo("unuj") == "unu"  # ujn guard
    assert eo("dekdu") == "dekdu"  # merged numeral untouched
    assert eo("tamen") == "tamen"  # uninflected
    assert eo("kaj") == "kaj"  # fails the two-syllable long_word gate
    assert eo("l'") == "la" and eo("ankor'") == "ankoraŭ"
    assert eo("kor'") == "kor"  # ' -> o, then standard -o strip
    assert eo("cxevalo") == "ĉeval"  # x-system canonical form
    assert eo("ŝi") == "ŝi"
    assert eo("wagon") == "wagon"  # foreign letter -> whole stem aborted


def test_arabic():
    """No reference goldens; pin article/suffix/prefix stripping, hamza and
    presentation-form normalization, maqsura folding."""
    from xapian_spark.functions.stemmers import get_stemmer

    ar = get_stemmer("ar")
    assert ar("الكتاب") == "كتاب"  # definite article
    assert ar("بالكتاب") == "كتاب"  # bal- prefix
    assert ar("كتابها") == "كتاب"  # possessive suffix
    assert ar("مدرسة") == "مدرس"  # teh marbuta
    assert ar("يستخدم") == "استخدم"  # Prefix_Step4_Verb
    assert ar("مكتبى") == "مكتبي"  # alef maqsura -> yeh
    assert ar("المسلمون") == "مسلم"
    assert ar("أأكل") == "اكل"  # doubled hamza + post-normalization
    assert ar("ﻓﻌﻞ") == "فعل"  # presentation forms folded
    assert ar("فَعَلَ") == "فعل"  # diacritics stripped
    assert ar("١٢٣") == "123"  # Hindu-Arabic digits


def test_estonian():
    """No reference goldens; pin the .sbl's worked examples (verb
    exceptions, R1-scoped suffix chain, kk/pp/tt undoubling, the hop-4
    guards — torte/kingi) under the formal Snowball semantics."""
    from xapian_spark.functions.stemmers import get_stemmer

    et = get_stemmer("et")
    assert et("lauldakse") == "laul"
    assert et("tullakse") == "tulla"
    assert et("kirjutan") == "kirjuta"
    assert et("teadlasse") == "teadlase"
    assert et("roheline") == "rohelise"
    assert et("õpetajaga") == "õpetaja"
    assert et("õnnelikkude") == "õnneliku"
    assert et("ministrite") == "ministri"
    assert et("torte") == "tort"  # te with hop-4 failing -> 't'
    assert et("kokkuvõtte") == "kokkuvõte"  # undouble tt before final vowel
    assert et("hakkan") == "haka"
    assert et("gaasid") == "gaasid"  # sid blocked by long vowel
    assert et("kingi") == "kingi"  # emphasis hop-4 guard
    assert et("sõin") == "söö" and et("teha") == "tegi"  # verb exceptions


def test_stemmer_registry():
    from xapian_spark.functions.stemmers import get_stemmer

    assert get_stemmer("sv")("flickorna") == "flick"
    assert get_stemmer("porter")("running") == "run"
    assert get_stemmer("english")("running") == "run"
    with pytest.raises(ValueError):
        get_stemmer("xx")


DA_GOLD = "/root/reference/xapian-data/stemming/danish"
NO_GOLD = "/root/reference/xapian-data/stemming/norwegian"


@pytest.mark.skipif(not os.path.isdir(DA_GOLD), reason="reference goldens absent")
def test_danish_full_golden_vocabulary():
    from xapian_spark.functions.stem_da import stem_danish

    voc = open(f"{DA_GOLD}/voc.txt", encoding="utf-8").read().splitlines()
    out = open(f"{DA_GOLD}/output.txt", encoding="utf-8").read().splitlines()
    assert len(voc) == len(out) and len(voc) > 20000
    bad = [(v, stem_danish(v), o) for v, o in zip(voc, out) if stem_danish(v) != o]
    assert not bad, bad[:10]


@pytest.mark.skipif(not os.path.isdir(NO_GOLD), reason="reference goldens absent")
def test_norwegian_full_golden_vocabulary():
    from xapian_spark.functions.stem_no import stem_norwegian

    voc = open(f"{NO_GOLD}/voc.txt", encoding="utf-8").read().splitlines()
    out = open(f"{NO_GOLD}/output.txt", encoding="utf-8").read().splitlines()
    assert len(voc) == len(out) and len(voc) > 20000
    bad = [
        (v, stem_norwegian(v), o)
        for v, o in zip(voc, out)
        if stem_norwegian(v) != o
    ]
    assert not bad, bad[:10]


@pytest.mark.parametrize(
    "lang,modname,fname,min_words",
    [
        ("german", "stem_de", "stem_german", 30000),
        ("basque", "stem_eu", "stem_basque", 20000),
        ("irish", "stem_ga", "stem_irish", 100000),
        ("italian", "stem_it", "stem_italian", 30000),
        ("catalan", "stem_ca", "stem_catalan", 40000),
        ("portuguese", "stem_pt", "stem_portuguese", 30000),
        ("spanish", "stem_es", "stem_spanish", 25000),
        ("french", "stem_fr", "stem_french", 20000),
        ("finnish", "stem_fi", "stem_finnish", 40000),
        ("russian", "stem_ru", "stem_russian", 40000),
        ("dutch", "stem_nl", "stem_dutch", 40000),
        ("dutch_porter", "stem_nl_porter", "stem_dutch_porter", 40000),
        ("indonesian", "stem_id", "stem_indonesian", 60000),
        ("polish", "stem_pl", "stem_polish", 60000),
        ("lovins", "stem_lovins", "stem_lovins", 40000),
        ("romanian", "stem_ro", "stem_romanian", 80000),
        ("hungarian", "stem_hu", "stem_hungarian", 25000),
        ("nepali", "stem_ne", "stem_nepali", 3000),
        ("armenian", "stem_hy", "stem_armenian", 90000),
        ("hindi", "stem_hi", "stem_hindi", 60000),
        ("lithuanian", "stem_lt", "stem_lithuanian", 80000),
        ("turkish", "stem_tr", "stem_turkish", 90000),
        ("yiddish", "stem_yi", "stem_yiddish", 90000),
        ("greek", "stem_el", "stem_greek", 90000),
        ("serbian", "stem_sr", "stem_serbian", 25000),
    ],
)
def test_more_full_golden_vocabularies(lang, modname, fname, min_words):
    import importlib

    gold = f"/root/reference/xapian-data/stemming/{lang}"
    if not os.path.isdir(gold):
        pytest.skip("reference goldens absent")
    fn = getattr(importlib.import_module(f"xapian_spark.functions.{modname}"), fname)
    voc = open(f"{gold}/voc.txt", encoding="utf-8").read().splitlines()
    out = open(f"{gold}/output.txt", encoding="utf-8").read().splitlines()
    assert len(voc) == len(out) and len(voc) > min_words
    bad = [(v, fn(v), o) for v, o in zip(voc, out) if fn(v) != o]
    assert not bad, bad[:10]
