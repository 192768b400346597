"""Snowball Turkish stemmer — pure-Python port of
xapian-core/languages/algorithms/turkish.sbl (Eryiğit & Adalı's affix FSM);
golden-validated against xapian-data/stemming/turkish/.

mark_* routines are pure cursor functions (word, c) → c' | None; the
driver routines reproduce the slice-delete sequencing of the .sbl,
including mid-word deletions in the recursive ki-chain.
"""

from __future__ import annotations

_VOWEL = frozenset("aeıioöuü")
_U = frozenset("ıiuü")
_HARMONY = {
    "a": frozenset("aıou"), "e": frozenset("eiöü"),
    "ı": frozenset("aı"), "i": frozenset("ei"),
    "o": frozenset("ou"), "ö": frozenset("öü"),
    "u": frozenset("ou"), "ü": frozenset("öü"),
}


def _harmony(w: str, c: int) -> bool:
    p = c
    while p >= 1 and w[p - 1] not in _VOWEL:
        p -= 1
    if p < 1:
        return False
    target = _HARMONY[w[p - 1]]
    return any(ch in target for ch in w[: p - 1])


def _among(w, c, words):
    for s in sorted(words, key=len, reverse=True):
        if w[:c].endswith(s):
            return c - len(s)
    return None


def _opt_cons(w, c, letter):
    """('X' (test vowel)) or ((not 'X') test(next vowel))."""
    if c is None:
        return None
    if c >= 1 and w[c - 1] == letter:
        if c >= 2 and w[c - 2] in _VOWEL:
            return c - 1
        return None
    if c >= 2 and w[c - 2] in _VOWEL:
        return c
    return None


def _opt_U(w, c):
    if c is None:
        return None
    if c >= 1 and w[c - 1] in _U:
        if c >= 2 and w[c - 2] not in _VOWEL:
            return c - 1
        return None
    if c >= 2 and w[c - 2] not in _VOWEL:
        return c
    return None


def mk_poss(w, c):
    c2 = _among(w, c, ["mız", "miz", "muz", "müz", "nız", "niz", "nuz",
                       "nüz", "m", "n"])
    return _opt_U(w, c2)


def mk_sU(w, c):
    if not _harmony(w, c):
        return None
    if c >= 1 and w[c - 1] in _U:
        return _opt_cons(w, c - 1, "s")
    return None


def mk_lArI(w, c):
    return _among(w, c, ["leri", "ları"])


def mk_yU(w, c):
    if not _harmony(w, c):
        return None
    if c >= 1 and w[c - 1] in _U:
        return _opt_cons(w, c - 1, "y")
    return None


def _mk_harm_among(words):
    def f(w, c):
        if not _harmony(w, c):
            return None
        return _among(w, c, words)

    return f


mk_nU = _mk_harm_among(["nı", "ni", "nu", "nü"])
mk_nA = _mk_harm_among(["na", "ne"])
mk_DA = _mk_harm_among(["da", "de", "ta", "te"])
mk_ndA = _mk_harm_among(["nda", "nde"])
mk_DAn = _mk_harm_among(["dan", "den", "tan", "ten"])
mk_ndAn = _mk_harm_among(["ndan", "nden"])
mk_sUn = _mk_harm_among(["sın", "sin", "sun", "sün"])
mk_lAr = _mk_harm_among(["ler", "lar"])
mk_nUz = _mk_harm_among(["nız", "niz", "nuz", "nüz"])
mk_DUr = _mk_harm_among(["tır", "tir", "tur", "tür", "dır", "dir", "dur", "dür"])


def mk_nUn(w, c):
    if not _harmony(w, c):
        return None
    c2 = _among(w, c, ["ın", "in", "un", "ün"])
    return _opt_cons(w, c2, "n") if c2 is not None else None


def mk_yA(w, c):
    if not _harmony(w, c):
        return None
    c2 = _among(w, c, ["a", "e"])
    return _opt_cons(w, c2, "y") if c2 is not None else None


def mk_ylA(w, c):
    if not _harmony(w, c):
        return None
    c2 = _among(w, c, ["la", "le"])
    return _opt_cons(w, c2, "y") if c2 is not None else None


def mk_ki(w, c):
    return c - 2 if w[:c].endswith("ki") else None


def mk_ncA(w, c):
    if not _harmony(w, c):
        return None
    c2 = _among(w, c, ["ca", "ce"])
    return _opt_cons(w, c2, "n") if c2 is not None else None


def mk_yUm(w, c):
    if not _harmony(w, c):
        return None
    c2 = _among(w, c, ["ım", "im", "um", "üm"])
    return _opt_cons(w, c2, "y") if c2 is not None else None


def mk_yUz(w, c):
    if not _harmony(w, c):
        return None
    c2 = _among(w, c, ["ız", "iz", "uz", "üz"])
    return _opt_cons(w, c2, "y") if c2 is not None else None


def mk_sUnUz(w, c):
    return _among(w, c, ["sınız", "siniz", "sunuz", "sünüz"])


def mk_cAsInA(w, c):
    return _among(w, c, ["casına", "cesine"])


_YDU = [
    "tım", "tim", "tum", "tüm", "dım", "dim", "dum", "düm",
    "tın", "tin", "tun", "tün", "dın", "din", "dun", "dün",
    "tık", "tik", "tuk", "tük", "dık", "dik", "duk", "dük",
    "tı", "ti", "tu", "tü", "dı", "di", "du", "dü",
]


def mk_yDU(w, c):
    if not _harmony(w, c):
        return None
    c2 = _among(w, c, _YDU)
    return _opt_cons(w, c2, "y") if c2 is not None else None


def mk_ysA(w, c):
    c2 = _among(w, c, ["sam", "san", "sak", "sem", "sen", "sek", "sa", "se"])
    return _opt_cons(w, c2, "y") if c2 is not None else None


def mk_ymUs(w, c):
    if not _harmony(w, c):
        return None
    c2 = _among(w, c, ["mış", "miş", "muş", "müş"])
    return _opt_cons(w, c2, "y") if c2 is not None else None


def mk_yken(w, c):
    if w[:c].endswith("ken"):
        return _opt_cons(w, c - 3, "y")
    return None


def _cut(w, b, k):
    """delete slice [b, k)."""
    return w[:b] + w[k:]


def nominal_verb(w):
    """Returns (word, continue_flag, succeeded)."""
    n = len(w)
    for fn in (mk_ymUs, mk_yDU, mk_ysA, mk_yken):
        c = fn(w, n)
        if c is not None:
            return w[:c], True, True
    c1 = mk_cAsInA(w, n)
    if c1 is not None:
        c2 = None
        for fn in (mk_sUnUz, mk_lAr, mk_yUm, mk_sUn, mk_yUz):
            r = fn(w, c1)
            if r is not None:
                c2 = r
                break
        if c2 is None:
            c2 = c1
        c3 = mk_ymUs(w, c2)
        if c3 is not None:
            return w[:c3], True, True
    c1 = mk_lAr(w, n)
    if c1 is not None:
        w = w[:c1]
        for fn in (mk_DUr, mk_yDU, mk_ysA, mk_ymUs):
            r = fn(w, len(w))
            if r is not None:
                w = w[:r]
                break
        return w, False, True
    c1 = mk_nUz(w, n)
    if c1 is not None:
        for fn in (mk_yDU, mk_ysA):
            r = fn(w, c1)
            if r is not None:
                return w[:r], True, True
    for fn in (mk_sUnUz, mk_yUz, mk_sUn, mk_yUm):
        c1 = fn(w, n)
        if c1 is not None:
            w = w[:c1]
            r = mk_ymUs(w, len(w))
            if r is not None:
                w = w[:r]
            return w, True, True
    c1 = mk_DUr(w, n)
    if c1 is not None:
        w = w[:c1]
        n2 = len(w)
        c2 = None
        for fn in (mk_sUnUz, mk_lAr, mk_yUm, mk_sUn, mk_yUz):
            r = fn(w, n2)
            if r is not None:
                c2 = r
                break
        if c2 is None:
            c2 = n2
        r = mk_ymUs(w, c2)
        if r is not None:
            w = w[:r]
        return w, True, True
    return w, True, False


def chain_ki(w, c):
    """stem_suffix_chain_before_ki at cursor c.  Returns (word, ok)."""
    c1 = mk_ki(w, c)
    if c1 is None:
        return w, False
    # branch DA
    c2 = mk_DA(w, c1)
    if c2 is not None:
        w = _cut(w, c2, c)
        cur = c2
        c3 = mk_lAr(w, cur)
        if c3 is not None:
            w = _cut(w, c3, cur)
            w, _ = chain_ki(w, c3)
            return w, True
        c3 = mk_poss(w, cur)
        if c3 is not None:
            w = _cut(w, c3, cur)
            c4 = mk_lAr(w, c3)
            if c4 is not None:
                w = _cut(w, c4, c3)
                w, _ = chain_ki(w, c4)
            return w, True
        return w, True
    # branch nUn
    c2 = mk_nUn(w, c1)
    if c2 is not None:
        w = _cut(w, c2, c)
        cur = c2
        c3 = mk_lArI(w, cur)
        if c3 is not None:
            return _cut(w, c3, cur), True
        c3 = mk_poss(w, cur)
        if c3 is None:
            c3 = mk_sU(w, cur)
        if c3 is not None:
            w = _cut(w, c3, cur)
            c4 = mk_lAr(w, c3)
            if c4 is not None:
                w = _cut(w, c4, c3)
                w, _ = chain_ki(w, c4)
            return w, True
        w, _ = chain_ki(w, cur)
        return w, True
    # branch ndA (no immediate delete)
    c2 = mk_ndA(w, c1)
    if c2 is not None:
        c3 = mk_lArI(w, c2)
        if c3 is not None:
            return _cut(w, c3, c), True
        c3 = mk_sU(w, c2)
        if c3 is not None:
            w = _cut(w, c3, c)
            c4 = mk_lAr(w, c3)
            if c4 is not None:
                w = _cut(w, c4, c3)
                w, _ = chain_ki(w, c4)
            return w, True
        w, ok = chain_ki(w, c2)
        if ok:
            return w, True
    return w, False


def noun_suffixes(w):
    """Returns (word, succeeded)."""
    n = len(w)
    # N1: lAr
    c = mk_lAr(w, n)
    if c is not None:
        w = w[:c]
        w, _ = chain_ki(w, len(w))
        return w, True
    # N2: ncA
    c = mk_ncA(w, n)
    if c is not None:
        w = w[:c]
        n2 = len(w)
        c2 = mk_lArI(w, n2)
        if c2 is not None:
            return w[:c2], True
        c2 = mk_poss(w, n2)
        if c2 is None:
            c2 = mk_sU(w, n2)
        if c2 is not None:
            w = w[:c2]
            c3 = mk_lAr(w, len(w))
            if c3 is not None:
                w = w[:c3]
                w, _ = chain_ki(w, len(w))
            return w, True
        c2 = mk_lAr(w, n2)
        if c2 is not None:
            w2 = w[:c2]
            w2, ok = chain_ki(w2, len(w2))
            if ok:
                return w2, True
            w = w2  # lAr deletion persists even when the chain fails
        return w, True
    # N3: (ndA or nA) ...
    c1 = mk_ndA(w, n)
    if c1 is None:
        c1 = mk_nA(w, n)
    if c1 is not None:
        c2 = mk_lArI(w, c1)
        if c2 is not None:
            return w[:c2], True
        c2 = mk_sU(w, c1)
        if c2 is not None:
            w = w[:c2]
            c3 = mk_lAr(w, len(w))
            if c3 is not None:
                w = w[:c3]
                w, _ = chain_ki(w, len(w))
            return w, True
        w2, ok = chain_ki(w, c1)
        if ok:
            return w2, True
    # N4: (ndAn or nU) ((sU ...) or lArI)
    c1 = mk_ndAn(w, n)
    if c1 is None:
        c1 = mk_nU(w, n)
    if c1 is not None:
        c2 = mk_sU(w, c1)
        if c2 is not None:
            w = w[:c2]
            c3 = mk_lAr(w, len(w))
            if c3 is not None:
                w = w[:c3]
                w, _ = chain_ki(w, len(w))
            return w, True
        if mk_lArI(w, c1) is not None:
            return w, True  # marks only — no ]delete in this path
    # N5: DAn
    c1 = mk_DAn(w, n)
    if c1 is not None:
        w = w[:c1]
        n2 = len(w)
        c2 = mk_poss(w, n2)
        if c2 is not None:
            w = w[:c2]
            c3 = mk_lAr(w, len(w))
            if c3 is not None:
                w = w[:c3]
                w, _ = chain_ki(w, len(w))
            return w, True
        c2 = mk_lAr(w, n2)
        if c2 is not None:
            w = w[:c2]
            w, _ = chain_ki(w, len(w))
            return w, True
        w, _ = chain_ki(w, n2)
        return w, True
    # N6: nUn or ylA
    c1 = mk_nUn(w, n)
    if c1 is None:
        c1 = mk_ylA(w, n)
    if c1 is not None:
        w = w[:c1]
        n2 = len(w)
        c2 = mk_lAr(w, n2)
        if c2 is not None:
            w2 = w[:c2]
            w2, ok = chain_ki(w2, len(w2))
            if ok:
                return w2, True
            w = w2  # the lAr delete persists; later alternatives continue
            n2 = len(w)
        c2 = mk_poss(w, n2)
        if c2 is None:
            c2 = mk_sU(w, n2)
        if c2 is not None:
            w = w[:c2]
            c3 = mk_lAr(w, len(w))
            if c3 is not None:
                w = w[:c3]
                w, _ = chain_ki(w, len(w))
            return w, True
        w, _ = chain_ki(w, n2)
        return w, True
    # N7: lArI
    c1 = mk_lArI(w, n)
    if c1 is not None:
        return w[:c1], True
    # N8: chain
    w2, ok = chain_ki(w, n)
    if ok:
        return w2, True
    # N9: DA or yU or yA
    c1 = mk_DA(w, n)
    if c1 is None:
        c1 = mk_yU(w, n)
    if c1 is None:
        c1 = mk_yA(w, n)
    if c1 is not None:
        w = w[:c1]
        n2 = len(w)
        matched = False
        c2 = mk_poss(w, n2)
        if c2 is not None:
            matched = True
            w = w[:c2]
            c3 = mk_lAr(w, len(w))
            if c3 is not None:
                w = w[:c3]
        else:
            c2 = mk_lAr(w, n2)
            if c2 is not None:
                matched = True
                w = w[:c2]
        # the ki-chain is SEQUENCED after the (poss|lAr) group inside the
        # try — it only runs when one of them matched
        if matched:
            w, _ = chain_ki(w, len(w))
        return w, True
    # N10: poss or sU
    c1 = mk_poss(w, n)
    if c1 is None:
        c1 = mk_sU(w, n)
    if c1 is not None:
        w = w[:c1]
        c2 = mk_lAr(w, len(w))
        if c2 is not None:
            w = w[:c2]
            w, _ = chain_ki(w, len(w))
        return w, True
    return w, False


def _post_process(w: str) -> str:
    # not is_reserved_word
    if w in ("ad", "soyad"):
        return w
    # append_U_to_stems_ending_with_d_or_g
    if w.endswith(("d", "g")):
        p = len(w) - 1
        while p >= 1 and w[p - 1] not in _VOWEL:
            p -= 1
        if p >= 1:
            v = w[p - 1]
            if v in "aı":
                w = w + "ı"
            elif v in "ei":
                w = w + "i"
            elif v in "ou":
                w = w + "u"
            elif v in "öü":
                w = w + "ü"
    # post_process_last_consonants
    last = w[-1:]
    if last == "b":
        w = w[:-1] + "p"
    elif last == "c":
        w = w[:-1] + "ç"
    elif last == "d":
        w = w[:-1] + "t"
    elif last == "ğ":
        w = w[:-1] + "k"
    return w


def stem_turkish(word: str) -> str:
    # remove_proper_noun_suffix
    i = 0
    while i < len(word) and word[i] == "'":
        i += 1
    word = word[i:]
    idx = word.find("'", 2)
    if idx != -1:
        word = word[:idx]
    # more_than_one_syllable_word
    if sum(1 for ch in word if ch in _VOWEL) < 2:
        return word
    word, cont, _ok = nominal_verb(word)
    if not cont:
        # the continue test fails the backwards block, which aborts the
        # rest of stem() — postlude included
        return word
    word, _ = noun_suffixes(word)
    return _post_process(word)
