"""Snowball Dutch (Kraaij–Pohlmann) stemmer — pure-Python port of
xapian-core/languages/algorithms/dutch.sbl; golden-validated against
xapian-data/stemming/dutch/ in tests/test_stemmer.py.
"""

from __future__ import annotations

_A = frozenset("aäáàâ")
_E = frozenset("eëéèê")
_I = frozenset("iïíìî")
_O = frozenset("oöóòô")
_U = frozenset("uüúùû")
_AIOU = _A | _I | _O | _U
_AEIOU = _AIOU | _E
_V = _AEIOU | {"y"}
_V_WX = _V | {"w", "x"}


def _measure(word: str) -> tuple[int, int]:
    n = len(word)
    p1 = p2 = n

    def scan(i):
        # repeat non-v; atleast 1 ('ij' or v); non-v
        while i < n and word[i] not in _V and word[i : i + 2] != "ij":
            # NB: 'i' is a vowel so 'ij' never hides behind non-v skipping
            i += 1
        cnt = 0
        while i < n:
            if word[i : i + 2] == "ij":
                i += 2
                cnt += 1
            elif word[i] in _V:
                i += 1
                cnt += 1
            else:
                break
        if cnt < 1:
            return None
        if i < n and word[i] not in _V:
            return i + 1
        return None

    r = scan(0)
    if r is not None:
        p1 = r
        r2 = scan(r)
        if r2 is not None:
            p2 = r2
    return p1, p2


def _is_C(word: str, c: int) -> bool:
    """C = test(not 'ij' non-v) at backward cursor c."""
    if c >= 2 and word[c - 2 : c] == "ij":
        return False
    return c >= 1 and word[c - 1] not in _V


def _is_V(word: str, c: int) -> bool:
    """V = test(v or 'ij')."""
    if c >= 1 and word[c - 1] in _V:
        return True
    return c >= 2 and word[c - 2 : c] == "ij"


def _is_VX(word: str, c: int) -> bool:
    """VX = test(next v or 'ij')."""
    return _is_V(word, c - 1)


def _lengthen_V(word: str, c: int) -> str:
    """lengthen_V with backward cursor at c (do — failure is a no-op)."""
    if c < 1 or word[c - 1] in _V_WX:
        return word
    k = c - 1  # consonant position
    # [substring] among on what precedes position k
    head = word[:k]
    if head.endswith("eë"):
        return word[: k - 2] + "eëe" + word[k:]
    if head.endswith("ië"):
        return word[: k - 2] + "iee" + word[k:]
    if not head:
        return word
    ch = head[-1]
    pos = len(head) - 1  # index of the vowel
    if ch in _A | _O | _U or ch in ("a", "o", "u"):
        if ch in _A or ch in _O or ch in _U:
            b1 = head[pos - 1] if pos >= 1 else None
            if b1 is None or b1 not in _AEIOU:
                return word[:pos] + ch + word[pos:]
            return word
    if ch in _E:
        b1 = head[pos - 1] if pos >= 1 else None
        # clause A: non-AEIOU or atlimit
        if b1 is not None and b1 in _AEIOU:
            return word
        # clause B: not (AIOU or (E atlimit)) — examines b2
        b2 = head[pos - 2] if pos >= 2 else None
        if b1 is not None:
            if b2 is not None and b2 in _AIOU:
                return word
            if b2 is not None and b2 in _E and pos - 2 == 0:
                return word
            # clause C: not (next AIOU non-AEIOU) — blocks only when b3 ∈
            # AIOU AND b4 EXISTS and ∉ AEIOU (non-AEIOU must consume a
            # char, so it fails at the limit)
            b3 = head[pos - 3] if pos >= 3 else None
            b4 = head[pos - 4] if pos >= 4 else None
            if (
                b3 is not None
                and b3 in _AIOU
                and b4 is not None
                and b4 not in _AEIOU
            ):
                return word
        return word[:pos] + ch + word[pos:]
    return word


def _step1(word: str, p1: int, p2: int):
    n = len(word)

    def r1(c):
        return c >= p1

    for s in ("'s", "ies", "és", "aus", "es", "en", "nde", "s"):
        if not word.endswith(s):
            continue
        cut = n - len(s)
        if s == "'s":
            return word[:cut], True
        if s == "s":
            if not r1(cut):
                return word, False
            if cut >= 1 and word[cut - 1] == "t" and r1(cut - 1):
                return word, False
            if not _is_C(word, cut):
                return word, False
            return word[:cut], True
        if s == "ies":
            return (word[:cut] + "ie", True) if r1(cut) else (word, False)
        if s == "és":
            return (word[:cut] + "é", True) if r1(cut) else (word, False)
        if s == "aus":
            if r1(cut) and _is_V(word, cut):
                return word[:cut] + "au", True
            return word, False
        if s == "es":
            head = word[:cut]
            if head.endswith("ar") and r1(cut - 2) and _is_C(word, cut - 2):
                w = word[:cut]
                return _lengthen_V(w, cut), True
            if head.endswith("er") and r1(cut - 2) and _is_C(word, cut - 2):
                return word[:cut], True
            if r1(cut) and _is_C(word, cut):
                return word[:cut] + "e", True
            return word, False
        if s == "en":
            head = word[:cut]
            if head.endswith("hed") and r1(cut - 3):
                return word[: cut - 3] + "heid", True
            if head.endswith("nd"):
                return word[:cut], True
            if head.endswith("d") and r1(cut - 1) and _is_C(word, cut - 1):
                return word[: cut - 1], True
            if head.endswith(("i", "j")) and _is_V(word, cut - 1):
                return word[:cut], True
            if r1(cut) and _is_C(word, cut):
                w = word[:cut]
                return _lengthen_V(w, cut), True
            return word, False
        # 'nde'
        return word[:cut] + "nd", True
    return word, False


def _step2(word: str, p1: int, p2: int):
    n = len(word)

    def r1(c):
        return c >= p1

    for s in ("lijke", "ische", "ieve", "ene", "je", "ge", "de", "te",
              "se", "re", "le"):
        if not word.endswith(s):
            continue
        cut = n - len(s)
        if s == "je":
            # or-chain: a failing alternative falls through to the next one
            head = word[:cut]
            if head.endswith("'t"):
                return word[: cut - 2], True
            if head.endswith("et") and r1(cut - 2) and _is_C(word, cut - 2):
                return word[: cut - 2], True
            if head.endswith("rnt"):
                return word[: cut - 3] + "rn", True
            if head.endswith("t") and r1(cut - 1) and _is_VX(word, cut - 1):
                return word[: cut - 1], True
            if head.endswith("ink"):
                return word[: cut - 3] + "ing", True
            if head.endswith("mp"):
                return word[: cut - 2] + "m", True
            if head.endswith("'") and r1(cut - 1):
                return word[: cut - 1], True
            if r1(cut) and _is_C(word, cut):
                return word[:cut], True
            return word, False
        if s == "ge":
            return (word[:cut] + "g", True) if r1(cut) else (word, False)
        if s == "lijke":
            return (word[:cut] + "lijk", True) if r1(cut) else (word, False)
        if s == "ische":
            return (word[:cut] + "isch", True) if r1(cut) else (word, False)
        if s == "de":
            if r1(cut) and _is_C(word, cut):
                return word[:cut], True
            return word, False
        if s == "te":
            return (word[:cut] + "t", True) if r1(cut) else (word, False)
        if s == "se":
            return (word[:cut] + "s", True) if r1(cut) else (word, False)
        if s == "re":
            return (word[:cut] + "r", True) if r1(cut) else (word, False)
        if s == "le":
            if r1(cut):
                w = word[:cut] + "l"
                return _lengthen_V(w, len(w)), True
            return word, False
        if s == "ene":
            if r1(cut) and _is_C(word, cut):
                w = word[:cut] + "en"
                return _lengthen_V(w, len(w)), True
            return word, False
        if s == "ieve":
            if r1(cut) and _is_C(word, cut):
                return word[:cut] + "ief", True
            return word, False
    return word, False


def _step3(word: str, p1: int, p2: int):
    n = len(word)

    def r1(c):
        return c >= p1

    def r2(c):
        return c >= p2

    for s in ("iteit", "atie", "heid", "ster", "rder", "isme", "erij",
              "arij", "sel", "ing", "fie", "gie", "tst", "dst"):
        if not word.endswith(s):
            continue
        cut = n - len(s)
        if s == "atie":
            return (word[:cut] + "eer", True) if r1(cut) else (word, False)
        if s == "iteit":
            if r1(cut):
                w = word[:cut]
                return _lengthen_V(w, cut), True
            return word, False
        if s in ("heid", "sel", "ster"):
            return (word[:cut], True) if r1(cut) else (word, False)
        if s == "rder":
            return word[:cut] + "r", True
        if s in ("ing", "isme", "erij"):
            # these three share one action block: ('ild' <- 'er') or
            # (R1 delete lengthen_V)
            if word[:cut].endswith("ild"):
                return word[:cut] + "er", True
            if r1(cut):
                w = word[:cut]
                return _lengthen_V(w, cut), True
            return word, False
        if s == "arij":
            if r1(cut) and _is_C(word, cut):
                return word[:cut] + "aar", True
            return word, False
        if s == "fie":
            if r2(cut):
                w = word[:cut] + "f"
                return _lengthen_V(w, len(w)), True
            return word, False
        if s == "gie":
            if r2(cut):
                w = word[:cut] + "g"
                return _lengthen_V(w, len(w)), True
            return word, False
        if s == "tst":
            if r1(cut) and _is_C(word, cut):
                return word[:cut] + "t", True
            return word, False
        if s == "dst":
            if r1(cut) and _is_C(word, cut):
                return word[:cut] + "d", True
            return word, False
    return word, False


def _step4(word: str, p1: int, p2: int):
    n = len(word)

    def r1(c):
        return c >= p1

    first = (
        "achtiger", "achtigst", "ioneel", "atief", "achtig", "lijker",
        "lijkst", "eriger", "erigst", "baar", "naar", "laar", "raar",
        "tant", "erig", "end",
    )
    for s in first:
        if not word.endswith(s):
            continue
        cut = n - len(s)
        if s == "ioneel":
            if r1(cut):
                return word[:cut] + "ie", True
        elif s == "atief":
            if r1(cut):
                return word[:cut] + "eer", True
        elif s == "baar":
            if r1(cut):
                return word[:cut], True
        elif s in ("naar", "laar", "raar"):
            if r1(cut) and _is_V(word, cut):
                return word[:cut] + s[0], True
        elif s == "tant":
            if r1(cut):
                return word[:cut] + "teer", True
        elif s in ("lijker", "lijkst"):
            if r1(cut):
                return word[:cut] + "lijk", True
        elif s in ("achtig", "achtiger", "achtigst"):
            if r1(cut):
                return word[:cut], True
        else:
            # eriger/erigst/erig/end: R1 C delete lengthen_V
            if r1(cut) and _is_C(word, cut):
                w = word[:cut]
                return _lengthen_V(w, cut), True
        break  # first among failed (condition) → `or` tries second among
    for s in ("iger", "igst", "ig"):
        if word.endswith(s):
            cut = n - len(s)
            if (
                r1(cut)
                and not (word[:cut].endswith("inn") and cut == 3)
                and _is_C(word, cut)
            ):
                w = word[:cut]
                return _lengthen_V(w, cut), True
            return word, False
    return word, False


def _step7(word: str):
    for s, rep in (("kt", "k"), ("ft", "f"), ("pt", "p")):
        if word.endswith(s):
            return word[: len(word) - 2] + rep, True
    return word, False


def _step6(word: str):
    n = len(word)
    if n >= 2 and word[-1] == word[-2] and word[-1] in "bcdfghjklmpqrstvwxz":
        if word[-2:] == "nn":
            pass  # handled below
        else:
            return word[:-1], True
    if word.endswith("nn"):
        if not (n == 3 and word[0] == "i"):
            return word[:-1], True
        return word, False
    if word.endswith("v"):
        return word[:-1] + "f", True
    if word.endswith("z"):
        return word[:-1] + "s", True
    return word, False


def _step1c(word: str, p1: int):
    n = len(word)
    if not word.endswith(("d", "t")):
        return word, False
    cut = n - 1
    if cut < p1 or not _is_C(word, cut):
        return word, False
    if word.endswith("d"):
        if cut >= 1 and word[cut - 1] == "n" and cut - 1 >= p1:
            return word, False
        if word[:cut] == "in":
            return word[:cut] + "n", True
        return word[:cut], True
    # 't'
    if cut >= 1 and word[cut - 1] == "h" and cut - 1 >= p1:
        return word, False
    if word[:cut] == "en":
        return word, False
    return word[:cut], True


def _ge_tail_vowel_ok(rest: str) -> bool:
    """test hop 3; test(gopast('ij' or v) repeat('ij' or v) not atlimit)."""
    if len(rest) < 3:
        return False
    i = 0
    n = len(rest)
    found = False
    while i < n:
        if rest[i : i + 2] == "ij":
            found = True
            i += 2
            break
        if rest[i] in _V:
            found = True
            i += 1
            break
        i += 1
    if not found:
        return False
    while i < n:
        if rest[i : i + 2] == "ij":
            i += 2
        elif rest[i] in _V:
            i += 1
        else:
            break
    return i < n  # not atlimit


def _ge_tail_ok(rest: str) -> bool:
    """Lose_prefix check: vowel test PLUS the exception among (the among
    exists only in Lose_prefix, not Lose_infix)."""
    if not _ge_tail_vowel_ok(rest):
        return False
    for pat, ok in (("vali", True), ("vare", False), ("eft", False),
                    ("val", False), ("vaa", False)):
        if rest.startswith(pat):
            return ok
    return True


def _deumlaut_at(word: str, pos: int) -> str:
    if pos < len(word):
        if word[pos] == "ë":
            return word[:pos] + "e" + word[pos + 1 :]
        if word[pos] == "ï":
            return word[:pos] + "i" + word[pos + 1 :]
    return word


def stem_dutch(word: str) -> str:
    p1, p2 = _measure(word)
    stemmed = False

    w, ok = _step1(word, p1, p2)
    word = w
    stemmed = stemmed or ok
    # re-derive nothing: marks are left-anchored, deletions are suffixal
    w, ok = _step2(word, p1, p2)
    word = w
    stemmed = stemmed or ok
    w, ok = _step3(word, p1, p2)
    word = w
    stemmed = stemmed or ok
    w, ok = _step4(word, p1, p2)
    word = w
    stemmed = stemmed or ok

    # Lose_prefix
    ge_removed = False
    if word.startswith("ge") and _ge_tail_ok(word[2:]):
        word = word[2:]
        word = _deumlaut_at(word, 0)
        ge_removed = True
        p1, p2 = _measure(word)
    if ge_removed:
        w, ok = _step1c(word, p1)
        word = w
        stemmed = stemmed or True  # GE_removed sets stemmed

    # Lose_infix
    ge_removed2 = False
    idx = word.find("ge", 1)
    while idx != -1:
        if _ge_tail_vowel_ok(word[idx + 2 :]):
            word = word[:idx] + word[idx + 2 :]
            word = _deumlaut_at(word, idx)
            ge_removed2 = True
            p1, p2 = _measure(word)
            break
        idx = word.find("ge", idx + 1)
    if ge_removed2:
        w, ok = _step1c(word, p1)
        word = w
        stemmed = True

    w, ok = _step7(word)
    word = w
    stemmed = stemmed or ok
    if stemmed:
        w, ok = _step6(word)
        word = w
    return word
