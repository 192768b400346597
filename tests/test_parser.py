"""QueryParser tests (api_queryparser.cc analog — parse → expected tree)."""

import pytest

from xapian_spark.plans import query as Q
from xapian_spark.plans.parser import DEFAULT_FLAGS, FLAG_WILDCARD, QueryParser

P = QueryParser()


def test_default_op_or():
    q = P.parse_query("hash join")
    assert isinstance(q, Q.Or)
    assert [c.term for c in q.children] == ["hash", "join"]


def test_boolean_ops():
    assert isinstance(P.parse_query("hash AND join"), Q.And)
    assert isinstance(P.parse_query("hash AND NOT join"), Q.AndNot)
    assert isinstance(P.parse_query("hash NOT join"), Q.AndNot)
    q = P.parse_query("a OR b XOR c")
    assert isinstance(q, Q.Or)
    assert isinstance(q.children[1], Q.Xor)


def test_precedence_or_lowest():
    # OR < XOR < AND (queryparser.lemony:2231-2234)
    q = P.parse_query("a AND b OR c")
    assert isinstance(q, Q.Or)
    assert isinstance(q.children[0], Q.And)


def test_phrase_and_near():
    q = P.parse_query('"binary search"')
    assert isinstance(q, Q.Phrase) and q.window == 2
    # reference window math (queryparser.lemony:2041-2045,2155-2173):
    # window = (width - 1) + #terms, width defaulting to 10
    q = P.parse_query("hash NEAR/5 join")
    assert isinstance(q, Q.Near) and q.window == 6
    q = P.parse_query("hash NEAR join")
    assert isinstance(q, Q.Near) and q.window == 11
    q = P.parse_query("hash ADJ join")
    assert isinstance(q, Q.Phrase) and q.window == 11
    q = P.parse_query("a NEAR b NEAR c")
    assert isinstance(q, Q.Near) and q.window == 12


def test_lovehate():
    q = P.parse_query("+req opt -ban")
    assert isinstance(q, Q.AndNot)
    assert isinstance(q.left, Q.AndMaybe)
    assert q.left.left.term == "req"
    assert q.right.term == "ban"


def test_parens():
    q = P.parse_query("(a OR b) AND c")
    assert isinstance(q, Q.And)
    assert isinstance(q.children[0], Q.Or)


def test_term_production_uses_indexer_tokenizer():
    assert P.parse_query("Don’t").term == "don't"
    assert P.parse_query("C++").term == "c++"
    assert P.parse_query("U.N.C.L.E.").term == "uncle"


def test_wildcard_flag():
    pw = QueryParser(flags=DEFAULT_FLAGS | FLAG_WILDCARD)
    q = pw.parse_query("bin*")
    assert isinstance(q, Q.Wildcard) and q.pattern == "bin*"
    # without the flag, '*' is stripped by tokenization → plain term
    assert isinstance(P.parse_query("bin*"), Q.Term)


def test_empty_and_punct():
    assert isinstance(P.parse_query(""), Q.MatchNothing)
    assert isinstance(P.parse_query("!!! ???"), Q.MatchNothing)


def test_multiword_token_becomes_phrase():
    q = P.parse_query("e.g.x")  # tokenizes to multiple terms
    assert isinstance(q, Q.Phrase)


def test_pure_hate_raises():
    with pytest.raises(ValueError):
        P.parse_query("-banned")

# ---- field prefixes + range processors (api_queryparser.cc prefix/range
# sections; queryparser.h:1051-1169, 139-330) --------------------------------


def _fp_parser():
    p = QueryParser()
    p.add_prefix("title", "S")
    p.add_boolean_prefix("lang", "XL")
    p.add_boolean_prefix("site", "H")
    return p


def test_probabilistic_prefix():
    p = _fp_parser()
    q = p.parse_query("title:search")
    assert isinstance(q, Q.Term) and q.term == "Ssearch"


def test_probabilistic_prefix_mixes_with_default_op():
    p = _fp_parser()
    q = p.parse_query("hash title:search")
    assert isinstance(q, Q.Or)
    assert {c.term for c in q.children} == {"hash", "Ssearch"}


def test_prefix_quoted_phrase():
    p = _fp_parser()
    q = p.parse_query('title:"binary search"')
    assert isinstance(q, Q.Phrase)
    assert [c.term for c in q.children] == ["Sbinary", "Ssearch"]


def test_boolean_prefix_filters():
    p = _fp_parser()
    q = p.parse_query("hash lang:en")
    assert isinstance(q, Q.Filter)
    assert q.left.term == "hash"
    assert q.right.term == "XLen"


def test_boolean_prefix_same_field_ors_across_fields_ands():
    p = _fp_parser()
    q = p.parse_query("hash lang:en lang:fr site:x")
    assert isinstance(q, Q.Filter)
    f = q.right
    assert isinstance(f, Q.And)
    ors = [c for c in f.children if isinstance(c, Q.Or)]
    assert len(ors) == 1
    assert {t.term for t in ors[0].children} == {"XLen", "XLfr"}


def test_boolean_prefix_only_is_pure_boolean():
    p = _fp_parser()
    q = p.parse_query("lang:en")
    assert isinstance(q, Q.ScaleWeight) and q.factor == 0.0
    assert q.subquery.term == "XLen"


def test_unregistered_field_stays_a_term():
    p = _fp_parser()
    q = p.parse_query("nosuch:word")
    # tokenizer splits on ':' → phrase of (nosuch, word), like the reference
    # treating unregistered fields as plain text
    assert not isinstance(q, Q.Filter)


def test_prefix_needs_colon():
    from xapian_spark.functions.prefixes import make_term

    assert make_term("XL", "en") == "XLen"
    assert make_term("XL", "En") == "XL:En"  # uppercase start → colon
    assert make_term("S", "En") == "SEn"  # 1-char prefix → never a colon
    assert make_term("XL:", "En") == "XL:En"  # already ends with colon


def test_number_range_processor():
    from xapian_spark.plans.parser import NumberRangeProcessor

    p = QueryParser()
    p.add_rangeprocessor(NumberRangeProcessor(column="n_chars", field="chars"))
    q = p.parse_query("hash chars:100..300")
    assert isinstance(q, Q.Filter)
    vr = q.right
    assert isinstance(vr, Q.ValueRange)
    assert (vr.column, vr.lo, vr.hi) == ("n_chars", 100, 300)
    # open-ended
    q = p.parse_query("hash chars:100..")
    assert q.right.lo == 100 and q.right.hi is None
    q = p.parse_query("hash chars:..300")
    assert q.right.lo is None and q.right.hi == 300


def test_bare_range_processor():
    from xapian_spark.plans.parser import RangeProcessor

    p = QueryParser()
    p.add_rangeprocessor(RangeProcessor(column="date", field=""))
    q = p.parse_query("hash 2024-01-01..2024-12-31")
    assert isinstance(q, Q.Filter)
    assert q.right.column == "date"
    assert q.right.lo == "2024-01-01" and q.right.hi == "2024-12-31"


def _date_vr(q):
    assert isinstance(q, Q.Filter), q
    vr = q.right
    assert isinstance(vr, Q.ValueRange), vr
    return vr


def test_date_range_processor_formats():
    """Ported from tests/api_queryparser.cc test_value_range2_queries date
    cases (rangeproc.cc:185-260 formats)."""
    import datetime as dt

    from xapian_spark.plans.parser import DateRangeProcessor

    p = QueryParser()
    p.add_rangeprocessor(DateRangeProcessor(column="date", field="date"))
    d = dt.date
    # { "1999-03-12..2020-12-30", "VALUE_RANGE 1 19990312 20201230" }
    for sep in ("-", "/", "."):
        q = p.parse_query(f"hash date:1999{sep}03{sep}12..2020{sep}12{sep}30")
        vr = _date_vr(q)
        assert (vr.lo, vr.hi) == (d(1999, 3, 12), d(2020, 12, 30)), sep
    # YYYYMMDD
    vr = _date_vr(p.parse_query("hash date:19990312..20201230"))
    assert (vr.lo, vr.hi) == (d(1999, 3, 12), d(2020, 12, 30))
    # single-ended (ticket#480 cases)
    vr = _date_vr(p.parse_query("hash date:..2020.12.30"))
    assert (vr.lo, vr.hi) == (None, d(2020, 12, 30))
    vr = _date_vr(p.parse_query("hash date:1999.03.12.."))
    assert (vr.lo, vr.hi) == (d(1999, 3, 12), None)
    # { "12/03/99..12/04/01", "VALUE_RANGE 1 19990312 20010412" } — DMY +
    # 2-digit year epoch pivot
    vr = _date_vr(p.parse_query("hash date:12/03/99..12/04/01"))
    assert (vr.lo, vr.hi) == (d(1999, 3, 12), d(2001, 4, 12))
    # { "03-12-99..04-14-01", ... 19990312 20010414 } — forced MDY (day 14
    # can't be a month)
    vr = _date_vr(p.parse_query("hash date:03-12-99..04-14-01"))
    assert (vr.lo, vr.hi) == (d(1999, 3, 12), d(2001, 4, 14))
    # { "1/2/3..2/3/4", ... 20030201 20040302 } — epoch pivot on tiny years
    vr = _date_vr(p.parse_query("hash date:1/2/3..2/3/4"))
    assert (vr.lo, vr.hi) == (d(2003, 2, 1), d(2004, 3, 2))


def test_date_range_prefer_mdy_and_fallback():
    from xapian_spark.plans.parser import DateRangeProcessor

    import datetime as dt

    p = QueryParser()
    p.add_rangeprocessor(
        DateRangeProcessor(column="date", field="date", prefer_mdy=True)
    )
    # ambiguous 2/3/2025..3/4/2025: MDY preferred → Feb 3 .. Mar 4
    vr = _date_vr(p.parse_query("hash date:2/3/2025..3/4/2025"))
    assert (vr.lo, vr.hi) == (dt.date(2025, 2, 3), dt.date(2025, 3, 4))
    # garbage endpoints → not a date range → falls back to plain terms
    q = p.parse_query("date:notadate..alsonot")
    assert not isinstance(q, (Q.Filter, Q.ValueRange))


def test_unit_range_processor():
    """UnitRangeProcessor (rangeproc.cc:324-440): byte suffixes B/K/M/G/T,
    start inheriting the end's unit, and the must-have-unit rules."""
    from xapian_spark.plans.parser import UnitRangeProcessor

    p = QueryParser()
    p.add_rangeprocessor(UnitRangeProcessor(column="n_chars", field="size"))

    vr = _date_vr(p.parse_query("hash size:3K..10K"))
    assert (vr.lo, vr.hi) == (3 * 1024.0, 10 * 1024.0)
    # start without unit inherits the end's factor: 20..100K ≡ 20K..100K
    vr = _date_vr(p.parse_query("hash size:20..100K"))
    assert (vr.lo, vr.hi) == (20 * 1024.0, 100 * 1024.0)
    # open ends
    vr = _date_vr(p.parse_query("hash size:..1M"))
    assert (vr.lo, vr.hi) == (None, 1024.0 * 1024.0)
    vr = _date_vr(p.parse_query("hash size:5B.."))
    assert (vr.lo, vr.hi) == (5.0, None)
    for unit, factor in (("B", 1.0), ("K", 1024.0), ("M", 1024.0**2),
                         ("G", 1024.0**3), ("T", 1024.0**4)):
        vr = _date_vr(p.parse_query(f"hash size:..2{unit}"))
        assert vr.hi == 2 * factor, unit
    # no unit anywhere → not a unit range (falls back to terms)
    q = p.parse_query("size:200..")
    assert not isinstance(q, (Q.Filter, Q.ValueRange))
    q = p.parse_query("size:2..10")
    assert not isinstance(q, (Q.Filter, Q.ValueRange))
    # invalid unit letter rejects
    q = p.parse_query("size:3X..5K")
    assert not isinstance(q, (Q.Filter, Q.ValueRange))


def test_spelling_correction_flag(spark, index):
    """FLAG_SPELLING_CORRECTION + get_corrected_query_string
    (queryparser.h:592-604, 868+; queryparser.lemony:1668-1685)."""
    from xapian_spark.plans.parser import FLAG_SPELLING_CORRECTION

    p = QueryParser(flags=DEFAULT_FLAGS | FLAG_SPELLING_CORRECTION)
    p.set_database(index)
    # misspelled term → corrected string; parsed query keeps the original
    q = p.parse_query("retrn value")
    assert p.get_corrected_query_string() == "return value"
    assert "retrn" in repr(q)
    # exact-word-more-frequent rejection (database.cc:465-467): "return"
    # itself is the hottest term — no correction suggested for it
    p.parse_query("return value")
    assert p.get_corrected_query_string() == ""
    # field-scoped words are skipped (empty-prefix guard)
    p2 = QueryParser(flags=DEFAULT_FLAGS | FLAG_SPELLING_CORRECTION)
    p2.set_database(index)
    p2.add_boolean_prefix("lang", "XL")
    p2.parse_query("lang:retrn")
    assert p2.get_corrected_query_string() == ""
    # words of length <= 1 never suggest (database.cc:403)
    p2.parse_query("a")
    assert p2.get_corrected_query_string() == ""
    # no database attached → flag is inert
    p3 = QueryParser(flags=DEFAULT_FLAGS | FLAG_SPELLING_CORRECTION)
    p3.parse_query("retrn")
    assert p3.get_corrected_query_string() == ""


def test_synonym_flag_and_table():
    from xapian_spark.plans.parser import (
        DEFAULT_FLAGS,
        FLAG_AUTO_SYNONYMS,
        FLAG_SYNONYM,
        QueryParser,
    )

    p = QueryParser(flags=DEFAULT_FLAGS | FLAG_SYNONYM)
    p.set_synonyms({"fast": ["quick", "rapid"]})
    q = p.parse_query("~fast")
    assert isinstance(q, Q.Synonym)
    assert [c.term for c in q.children] == ["fast", "quick", "rapid"]
    # no table entry → plain term
    assert isinstance(p.parse_query("~slow"), Q.Term)
    # without the flag, '~fast' is just a word ('~' stripped by tokenizer)
    p2 = QueryParser()
    p2.set_synonyms({"fast": ["quick"]})
    assert isinstance(p2.parse_query("~fast"), Q.Term)

    pa = QueryParser(flags=DEFAULT_FLAGS | FLAG_AUTO_SYNONYMS)
    pa.set_synonyms({"fast": ["quick"]})
    q = pa.parse_query("fast car")
    assert isinstance(q, Q.Or)
    assert isinstance(q.children[0], Q.Synonym)
    assert isinstance(q.children[1], Q.Term)


def test_synonyms_persist_in_index_metadata(tmp_path, spark, index):
    from xapian_spark.plans.parser import DEFAULT_FLAGS, FLAG_SYNONYM, QueryParser
    from xapian_spark.sources.catalog import load_index, save_index

    index.add_synonym("fast", "quick")
    index.set_metadata("owner", "tests")
    save_index(index, str(tmp_path / "ix"))
    ix2 = load_index(spark, str(tmp_path / "ix"))
    assert ix2.synonyms("fast") == ["quick"]
    assert ix2.get_metadata("owner") == "tests"
    p = QueryParser(flags=DEFAULT_FLAGS | FLAG_SYNONYM)
    p.use_synonyms(ix2)
    q = p.parse_query("~fast")
    assert isinstance(q, Q.Synonym)


# ---- round-4 flag surface (api_queryparser.cc: qp_flag_pure_not1,
# qp_flag_partial1, qp_flag_bool_any_case1, synonym + wildcard cases) ------


def test_flag_pure_not():
    from xapian_spark.plans.parser import FLAG_PURE_NOT

    p = QueryParser(flags=DEFAULT_FLAGS | FLAG_PURE_NOT)
    # { "NOT windows", "(0 * <alldocuments> AND_NOT Zwindow@1)" }
    q = p.parse_query("NOT windows")
    assert isinstance(q, Q.AndNot)
    assert isinstance(q.left, Q.ScaleWeight) and q.left.factor == 0.0
    assert isinstance(q.left.subquery, Q.MatchAll)
    assert q.right.term == "windows"
    # { "a AND (NOT b)", "(Za@1 AND (0 * <alldocuments> AND_NOT Zb@2))" }
    q = p.parse_query("a AND (NOT b)")
    assert isinstance(q, Q.And)
    inner = q.children[1]
    assert isinstance(inner, Q.AndNot) and isinstance(inner.left, Q.ScaleWeight)
    # without the flag a bare NOT cannot match anything
    assert isinstance(P.parse_query("NOT windows"), Q.MatchNothing)


def test_flag_boolean_any_case():
    from xapian_spark.plans.parser import FLAG_BOOLEAN_ANY_CASE

    p = QueryParser(flags=DEFAULT_FLAGS | FLAG_BOOLEAN_ANY_CASE)
    assert isinstance(p.parse_query("a and b"), Q.And)
    assert isinstance(p.parse_query("a And b"), Q.And)
    assert isinstance(p.parse_query("a not b"), Q.AndNot)
    q = p.parse_query("a or b xor c")
    assert isinstance(q, Q.Or) and isinstance(q.children[1], Q.Xor)
    q = p.parse_query("a near/5 b")
    assert isinstance(q, Q.Near) and q.window == 6
    q = p.parse_query("a adj b")
    assert isinstance(q, Q.Phrase) and q.window == 11
    # without the flag, lowercase operators are plain terms
    q = P.parse_query("a and b")
    assert isinstance(q, Q.Or) and len(q.children) == 3


def _find_nodes(q, cls):
    out = []
    stack = [q]
    while stack:
        n = stack.pop()
        if isinstance(n, cls):
            out.append(n)
        for attr in ("children", "left", "right", "subquery"):
            v = getattr(n, attr, None)
            if isinstance(v, list):
                stack.extend(v)
            elif isinstance(v, Q.Query):
                stack.append(v)
    return out


def test_flag_partial():
    from xapian_spark.plans.parser import FLAG_PARTIAL

    p = QueryParser(flags=DEFAULT_FLAGS | FLAG_PARTIAL)
    q = p.parse_query("hello wor")
    wilds = _find_nodes(q, Q.Wildcard)
    assert len(wilds) == 1 and wilds[0].pattern == "wor*"
    assert wilds[0].max_expansion == 100
    assert wilds[0].limit_policy == "most_frequent"
    # the full form stays as an alternative
    assert any(t.term == "wor" for t in _find_nodes(q, Q.Term))
    # trailing whitespace → "more stable results": no wildcard
    assert not _find_nodes(p.parse_query("hello wor "), Q.Wildcard)
    # below MIN_PARTIAL_PREFIX_LEN → normal term
    assert not _find_nodes(p.parse_query("hello w"), Q.Wildcard)
    # inside a quoted phrase → untouched
    assert not _find_nodes(p.parse_query('"hello wor"'), Q.Wildcard)


def test_flag_partial_stemming_keeps_unstemmed_root():
    from xapian_spark.plans.parser import FLAG_PARTIAL

    p = QueryParser(flags=DEFAULT_FLAGS | FLAG_PARTIAL, stem="en")
    q = p.parse_query("search")
    wilds = _find_nodes(q, Q.Wildcard)
    # wildcard expands the raw prefix, full form is the stemmed term
    assert wilds and wilds[0].pattern == "search*"
    assert any(t.term == "Zsearch" for t in _find_nodes(q, Q.Term))


def test_flag_auto_multiword_synonyms():
    from xapian_spark.plans.parser import FLAG_AUTO_MULTIWORD_SYNONYMS

    p = QueryParser(flags=DEFAULT_FLAGS | FLAG_AUTO_MULTIWORD_SYNONYMS)
    p.set_synonyms({"false positive": ["fp"], "false positive rate": ["fpr"]})
    q = p.parse_query("a false positive b")
    syns = _find_nodes(q, Q.Synonym)
    assert len(syns) == 1
    terms = {t.term for t in _find_nodes(syns[0], Q.Term)}
    assert terms == {"false", "positive", "fp"}
    # greedy: the longer key wins
    q = p.parse_query("false positive rate")
    syns = _find_nodes(q, Q.Synonym)
    assert len(syns) == 1
    assert {t.term for t in _find_nodes(syns[0], Q.Term)} == {
        "false", "positive", "rate", "fpr",
    }
    # non-adjacent words don't match
    q = p.parse_query("false AND positive")
    assert not _find_nodes(q, Q.Synonym)


def test_flag_wildcard_glob():
    from xapian_spark.plans.parser import (
        FLAG_WILDCARD_GLOB,
        FLAG_WILDCARD_MULTI,
        FLAG_WILDCARD_SINGLE,
    )

    p = QueryParser(flags=DEFAULT_FLAGS | FLAG_WILDCARD_GLOB)
    q = p.parse_query("b?n*")
    assert isinstance(q, Q.Wildcard) and q.pattern == "b?n*"
    q = p.parse_query("mid*dle")
    assert isinstance(q, Q.Wildcard) and q.pattern == "mid*dle"
    # SINGLE alone: '?' is a wildcard, '*' is not enabled
    ps = QueryParser(flags=DEFAULT_FLAGS | FLAG_WILDCARD_SINGLE)
    assert isinstance(ps.parse_query("b?n"), Q.Wildcard)
    assert not isinstance(ps.parse_query("bin*"), Q.Wildcard)
    # MULTI alone: trailing-star truncation still works ('FLAG_WILDCARD is
    # ignored if this flag is specified' — same result here)
    pm = QueryParser(flags=DEFAULT_FLAGS | FLAG_WILDCARD_MULTI)
    assert isinstance(pm.parse_query("bin*"), Q.Wildcard)
    assert not isinstance(pm.parse_query("b?n"), Q.Wildcard)


def test_pure_not_and_partial_evaluate(spark, matcher, index):
    """The new flag lowerings must be executable, not just parseable."""
    from xapian_spark.plans.parser import FLAG_PARTIAL, FLAG_PURE_NOT

    p = QueryParser(flags=DEFAULT_FLAGS | FLAG_PURE_NOT)
    q = p.parse_query("NOT binary_search")
    n_with = matcher.mset(Q.Term("binary_search"), maxitems=10000, with_count=True).matches
    res = matcher.mset(q, maxitems=10000, with_count=True)
    assert res.matches == index.stats["doccount"] - n_with
    assert all(r["weight"] == 0.0 for r in res.df.collect())

    pp = QueryParser(flags=DEFAULT_FLAGS | FLAG_PARTIAL)
    qq = pp.parse_query("binary_sea")
    got = matcher.mset(qq, maxitems=5).df.collect()
    assert got, "partial prefix must match binary_search docs"


def test_hate_with_filter_only():
    """api_queryparser.cc:865-868: '-cup site:world' →
    (0 * Hworld AND_NOT Zcup) — hate against a filters-only base."""
    p = QueryParser()
    p.add_boolean_prefix("site", "H")
    for s in ("-cup site:world", "site:world -cup", "(site:world) -cup"):
        q = p.parse_query(s)
        assert isinstance(q, Q.AndNot), s
        assert isinstance(q.left, Q.ScaleWeight) and q.left.factor == 0.0, s
        assert q.left.subquery.term == "Hworld", s
        assert q.right.term == "cup", s


def test_filter_between_prob_terms():
    """api_queryparser.cc:872-875: 'foo site:xapian.org bar' →
    ((foo AND bar) FILTER Hxapian.org) — filter position is irrelevant."""
    p = QueryParser(default_op="and")
    p.add_boolean_prefix("site", "H")
    for s in (
        "foo site:xapian.org bar",
        "foo bar site:xapian.org",
        "site:xapian.org foo bar",
    ):
        q = p.parse_query(s)
        assert isinstance(q, Q.Filter), s
        assert isinstance(q.left, Q.And), s
        assert {c.term for c in q.left.children} == {"foo", "bar"}, s
        assert q.right.term == "Hxapian.org", s


def test_word_breaks_flag_constant():
    from xapian_spark.plans.parser import (
        FLAG_CJK_NGRAM,
        FLAG_NGRAMS,
        FLAG_WORD_BREAKS,
        QueryParser,
    )

    assert FLAG_NGRAMS == 2048 and FLAG_CJK_NGRAM == FLAG_NGRAMS
    assert FLAG_WORD_BREAKS == 4096
    # FLAG_NGRAMS ≡ ngrams=True
    p = QueryParser(flags=DEFAULT_FLAGS | FLAG_NGRAMS)
    assert p.ngrams
    # FLAG_WORD_BREAKS without a lexicon is an error (no ICU here)
    with pytest.raises(ValueError, match="lexicon"):
        QueryParser(flags=DEFAULT_FLAGS | FLAG_WORD_BREAKS)
    # with a lexicon it parses to AND of words
    p2 = QueryParser(
        flags=DEFAULT_FLAGS | FLAG_WORD_BREAKS, word_breaks={"我们", "喜欢"}
    )
    q = p2.parse_query("我们喜欢")
    assert isinstance(q, Q.And)


def test_stopper_and_stoplist():
    """qp_stoplist1 (api_queryparser.cc:2503): stopped words recorded,
    stoplist reset per parse; all-stopword groups roll back."""
    p = QueryParser()
    p.set_stopper({"a", "an", "the"})
    q = p.parse_query("some mice")
    assert p.stoplist() == []
    q = p.parse_query("the cat")
    assert p.stoplist() == ["the"]
    assert isinstance(q, Q.Term) and q.term == "cat"
    q = p.parse_query("an aardvark")
    assert p.stoplist() == ["an"]  # reset between parses
    # a group of ONLY stopwords keeps its words (reference rollback)
    q = p.parse_query("the a")
    assert p.stoplist() == []
    assert {t.term for t in _find_nodes(q, Q.Term)} == {"the", "a"}
    # stopwords inside quoted phrases are kept
    q = p.parse_query('"the cat"')
    assert p.stoplist() == []
    assert isinstance(q, Q.Phrase)


def test_unstem_and_accumulate():
    """qp_unstem_boolean_prefix (:1818) + qp_accumulate (:1831)."""
    from xapian_spark.plans.parser import FLAG_ACCUMULATE

    p = QueryParser(stem="en")
    p.add_boolean_prefix("test", "XTEST")
    p.add_prefix("foo", "XFOO")
    q = p.parse_query("a plains test:bools foo:fielded")
    assert p.unstem("Zplain") == ["plains"]
    assert p.unstem("XTESTbools") == ["test:bools"]
    assert p.unstem("ZXFOOfield") == ["foo:fielded"]
    # default: unstem resets per parse
    p.parse_query("other words")
    assert p.unstem("Zplain") == []

    pa = QueryParser(flags=DEFAULT_FLAGS | FLAG_ACCUMULATE, stem="en")
    pa.set_stopper({"the"})
    pa.parse_query("plains walking")
    pa.parse_query("the second")
    assert pa.unstem("Zplain") == ["plains"]  # survived the second parse
    assert pa.stoplist() == ["the"]


def test_flag_no_positions():
    """FLAG_NO_POSITIONS (queryparser.h:744): phrase searches, NEAR and
    ADJ all produce OP_AND."""
    from xapian_spark.plans.parser import FLAG_NO_POSITIONS

    p = QueryParser(flags=DEFAULT_FLAGS | FLAG_NO_POSITIONS)
    q = p.parse_query('"binary search"')
    assert isinstance(q, Q.And)
    assert [c.term for c in q.children] == ["binary", "search"]
    q = p.parse_query("hash NEAR/5 join")
    assert isinstance(q, Q.And)
    q = p.parse_query("a ADJ b ADJ c")
    assert isinstance(q, Q.And) and len(q.children) == 3
    # implicit phrase from punctuation also degrades
    q = p.parse_query("1.2-rc")
    assert not _find_nodes(q, Q.Phrase)


def test_proper_noun_heuristic():
    """Capitalised words skip stemming for heuristic-enabled languages
    (generator.c:2489-2524 list; queryparser.lemony:229-233), unless
    FLAG_NO_PROPER_NOUN_HEURISTIC — and German is never special-cased."""
    from xapian_spark.plans.parser import FLAG_NO_PROPER_NOUN_HEURISTIC

    p = QueryParser(stem="en")
    assert p.parse_query("walking").term == "Zwalk"
    assert p.parse_query("Tony").term == "tony"  # proper noun: unstemmed
    pn = QueryParser(stem="en", flags=DEFAULT_FLAGS | FLAG_NO_PROPER_NOUN_HEURISTIC)
    assert pn.parse_query("Tony").term.startswith("Z")
    # German: all nouns are capitalised → heuristic off by language
    pg = QueryParser(stem="de")
    assert pg.parse_query("Aufeinander").term.startswith("Z")
