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


def _py_winnow(text: str, k: int = 4, w: int = 4):
    import hashlib

    toks = [t for t in text.lower().split() if t]
    grams = [
        hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[:8]
        for i in range(len(toks) - k + 1)
    ]
    sel = {min(grams[j : j + w]) for j in range(len(grams) - w + 1)}
    return sorted(sel)


def test_winnow_fingerprints_match_reference(spark):
    import hashlib

    from xapian_spark.operators.dedup import winnow_fingerprints

    rows = [
        (1, "a b c d e f g h i j k l"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "x y z w"),          # exactly k tokens, fewer grams than w → dropped
        (4, "one two three"),    # shorter than k → dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_fp"], r["fp_sig"]) for r in winnow_fingerprints(df).collect()}
    for did, text in rows[:2]:
        fps = _py_winnow(text)
        sig = hashlib.md5(",".join(fps).encode()).hexdigest()
        assert got[did] == (len(fps), sig), did
    assert 3 not in got and 4 not in got


def test_winnow_shared_run_shares_fingerprint(spark):
    """Winnowing guarantee: documents sharing a run of ≥ w+k-1 tokens share
    at least one selected fingerprint (Schleimer et al. 2003, theorem 1)."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = w+k
    rows = [
        (1, "p q r s t u v " + shared),
        (2, shared + " m n o different tail entirely here"),
    ]
    a, b = (set(_py_winnow(t)) for _, t in rows)
    assert a & b


def test_token_counts_bpe_vs_ws(spark):
    from xapian_spark.operators.textstats import token_counts

    rows = [
        (1, "don't stop believing"),       # ws 3; bpe: don ' t stop believing = 5
        (2, "x=1+2;  y=3"),                # ws 2; bpe: x = 1 + 2 ; y = 3 = 9
        (3, "hello world"),                # ws 2; bpe 2
        (4, ""),                           # 0 / 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"]) for r in token_counts(df).collect()}
    assert got == {1: (3, 5), 2: (2, 9), 3: (2, 2), 4: (0, 0)}


def test_minhash_xxhash_impl_finds_same_dup_pairs(spark):
    """hash_impl='xxhash64' (the 100 TB form) must find every pair the md5
    form finds on docs with IDENTICAL shingle sets (same set → same min →
    same bucket, for any hash family), with long signature columns."""
    from xapian_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    base = "binary search over a sorted array of keys with low and high"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base + " plus one tail token appended here"),
        (4, "completely different text about stream processing windows"),
        (5, "completely different text about stream processing windows"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingles(docs, w=3).persist()
    p_md5 = {
        (r["d1"], r["d2"])
        for r in minhash_candidate_pairs(minhash_signatures(sh)).collect()
    }
    sig_xx = minhash_signatures(sh, hash_impl="xxhash64")
    assert all(f.dataType.simpleString() == "bigint" for f in sig_xx.schema.fields[1:])
    p_xx = {
        (r["d1"], r["d2"]) for r in minhash_candidate_pairs(sig_xx).collect()
    }
    sh.unpersist()
    assert (1, 2) in p_md5 and (4, 5) in p_md5
    assert (1, 2) in p_xx and (4, 5) in p_xx


def test_jaccard_hash_join_matches_strings(spark):
    """join_on_hash=True (8-byte shuffle keys, the 100 TB form) produces
    identical pairs + scores on collision-free input."""
    from xapian_spark.operators.dedup import ngram_jaccard_pairs, shingles

    base = "one two three four five six seven eight nine ten"
    rows = [
        (1, base),
        (2, base + " eleven"),
        (3, "totally unrelated words appear in this document text here"),
    ]
    sh = shingles(
        spark.createDataFrame(rows, "doc_id long, text string"), w=3
    ).persist()
    a = {
        (r["d1"], r["d2"]): r["jac"]
        for r in ngram_jaccard_pairs(sh, threshold=0.5).collect()
    }
    b = {
        (r["d1"], r["d2"]): r["jac"]
        for r in ngram_jaccard_pairs(sh, threshold=0.5, join_on_hash=True).collect()
    }
    sh.unpersist()
    assert a == b and (1, 2) in a


def test_repeated_spans(spark):
    """repeated_spans: substring-level dedup — every w-token window with
    ALL occurrences, cross-doc spans ranked by (n_docs, n_occ)."""
    from xapian_spark.operators.dedup import repeated_spans

    boiler = "all rights reserved by the author"  # 6 tokens → two 5-spans
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {boiler} gamma"),
            (2, f"{boiler} delta {boiler}"),     # boiler twice in one doc
            (3, "unrelated text with no duplicate content here at all"),
            (4, f"epsilon {boiler}"),
        ],
        "doc_id long, text string",
    )
    rows = repeated_spans(docs, w=5, min_docs=2, top_n=10).collect()
    by_span = {r["span"]: (r["n_docs"], r["n_occ"]) for r in rows}
    assert by_span["all rights reserved by the"] == (3, 4)
    assert by_span["rights reserved by the author"] == (3, 4)
    # nothing from the unique doc leaks in
    assert all("unrelated" not in s for s in by_span)
    # a window below min_docs is excluded
    assert "alpha beta all rights reserved" not in by_span
    # ranking: (n_docs DESC, n_occ DESC, span ASC)
    keys = [(-r["n_docs"], -r["n_occ"], r["span"]) for r in rows]
    assert keys == sorted(keys)


def test_repeated_spans_hash_keyed_equivalence(spark):
    """join_on_hash=True (the 100 TB form: 8-byte xxhash64 shuffle key +
    min(span) exemplar) returns exactly the string-keyed rows."""
    from xapian_spark.operators.dedup import repeated_spans

    boiler = "all rights reserved by the author"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {boiler} gamma"),
            (2, f"{boiler} delta {boiler}"),
            (3, "unrelated text with no duplicate content here at all"),
            (4, f"epsilon {boiler}"),
            (5, f"zeta {boiler} eta {boiler}"),
        ],
        "doc_id long, text string",
    )
    a = [tuple(r) for r in repeated_spans(docs, w=5, min_docs=2, top_n=10).collect()]
    b = [
        tuple(r)
        for r in repeated_spans(
            docs, w=5, min_docs=2, top_n=10, join_on_hash=True
        ).collect()
    ]
    assert a == b and len(a) > 0
