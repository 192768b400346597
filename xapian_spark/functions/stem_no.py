"""Snowball Norwegian stemmer (Bokmål/Nynorsk) — pure-Python port of
xapian-core/languages/algorithms/norwegian.sbl; golden-validated against
xapian-data/stemming/norwegian/ in tests/test_stemmer.py.
"""

from __future__ import annotations

_V = frozenset("aeêioòóôuyæåø")
_S_ENDING = frozenset("bcdfghjlmnoptvyz")

_MAIN_DELETE = sorted(
    (
        "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
        "heten", "ar", "er", "heter", "as", "es", "edes", "endes", "enes",
        "hetenes", "ens", "hetens", "ets", "et", "het", "ast",
    ),
    key=len,
    reverse=True,
)

# 'ers' inner among: tails that KEEP 'ers' vs those that delete it
_ERS_KEEP = ("amm", "ast", "ind", "kap", "kk", "lt", "nk", "omm", "pp", "v", "øst")
_ERS_DELETE = ("giv", "hav", "skap")  # plus '' (always matches)

_OTHER_DELETE = sorted(
    (
        "leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
        "slov", "hetslov",
    ),
    key=len,
    reverse=True,
)


def _mark_p1(word: str) -> int:
    n = len(word)
    p1 = n
    i = 0
    while i < n and word[i] not in _V:
        i += 1
    if i < n:
        i += 1
        while i < n and word[i] in _V:
            i += 1
        if i < n:
            p1 = i + 1
    if n >= 3 and p1 < 3:
        p1 = 3
    return p1


def stem_norwegian(word: str) -> str:
    p1 = _mark_p1(word)

    # ---- main_suffix (longest among across all branches) ----
    n = len(word)
    region = word[p1:] if p1 < n else ""
    best = None
    for s in _MAIN_DELETE:
        if region.endswith(s):
            best = (len(s), "del")
            break
    for s, kind in (("ers", "ers"), ("s", "s"), ("erte", "erte"), ("ert", "ert")):
        if region.endswith(s) and (best is None or len(s) > best[0]):
            best = (len(s), kind)
    if best is not None:
        slen, kind = best
        if kind == "del":
            word = word[: n - slen]
        elif kind == "ers":
            head = word[: n - 3]
            # inner among: longest match over keep ∪ delete ∪ {''}
            m = ""
            for pat in _ERS_KEEP + _ERS_DELETE:
                if head.endswith(pat) and len(pat) > len(m):
                    m = pat
            if m in _ERS_DELETE or m == "":
                word = head
        elif kind == "s":
            prev = word[n - 2] if n >= 2 else ""
            prev2 = word[n - 3] if n >= 3 else ""
            ok = (
                prev in _S_ENDING
                or (prev == "r" and prev2 != "e")
                or (prev == "k" and (n < 3 or prev2 not in _V))
            )
            if ok:
                word = word[: n - 1]
        else:  # 'erte' / 'ert' → 'er'
            word = word[: n - slen] + "er"

    # ---- consonant_pair: 'dt'/'vt' within R1 → drop last char ----
    n = len(word)
    region = word[p1:] if p1 < n else ""
    if region.endswith(("dt", "vt")):
        word = word[: n - 1]

    # ---- other_suffix ----
    n = len(word)
    region = word[p1:] if p1 < n else ""
    for s in _OTHER_DELETE:
        if region.endswith(s):
            word = word[: n - len(s)]
            break
    return word
