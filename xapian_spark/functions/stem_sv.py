"""Snowball Swedish stemmer — pure-Python port of
xapian-core/languages/algorithms/swedish.sbl (Snowball 3.x version with the
2.0-era et_condition extension).

Validated against the reference's full golden vocabulary
(xapian-data/stemming/swedish/voc.txt → output.txt) in
tests/test_stemmer.py — same strategy as [stem_en].

Structure mirrors the .sbl routines: mark_regions / main_suffix /
consonant_pair / other_suffix, with Snowball's longest-match among
semantics.  All string work is on Python str (unicode chars — 'hop 3' is
3 characters, matching the reference's utf-8-aware runtime).
"""

from __future__ import annotations

_V = frozenset("aeiouyäåö")  # aeiouy äåö
_S_ENDING = frozenset("bcdfghjklmnoprtvy")
_OST_ENDING = frozenset("iklnprtuv")

# main_suffix among group that plain-deletes (longest match wins)
_MAIN_DELETE = sorted(
    (
        "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
        "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
        "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades",
        "andes", "ens", "arens", "hetens", "erns", "at", "andet", "het",
        "ast",
    ),
    key=len,
    reverse=True,
)

# et_condition's exclusion list: tails (before the 'et'/'ets' suffix) that
# block deletion (frihet, societet, komet, ...)
_ET_EXCL = (
    "h", "iet", "uit", "fab", "cit", "dit", "alit", "ilit", "mit", "nit",
    "pit", "rit", "sit", "tit", "ivit", "kvit", "xit", "kom", "rak", "pak",
    "stak",
)

_PAIRS = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")


def _mark_p1(word: str) -> int:
    """mark_regions: p1 = after first non-vowel following a vowel, but
    ≥ 3 (the x = hop 3 clamp)."""
    n = len(word)
    p1 = n
    # gopast v
    i = 0
    while i < n and word[i] not in _V:
        i += 1
    if i < n:
        i += 1  # past the vowel
        while i < n and word[i] in _V:
            i += 1
        if i < n:
            p1 = i + 1  # past the non-vowel
    if n >= 3 and p1 < 3:
        p1 = 3
    return p1


def _et_condition(word: str, end: int) -> bool:
    """et_condition at position ``end`` (chars word[:end] remain after
    stripping the et/ets suffix).

    NB: ``setlimit tomark p1 for ([substring])`` scopes the limit to the
    suffix match ONLY — by the time the among's action (and this condition)
    runs, the limit is back at the string start, so the lookbehind may
    cross p1 and ``atlimit`` means position 0."""
    # (non-v v not atlimit): going backwards from end
    i = end
    if i - 1 < 0 or word[i - 1] in _V:
        return False
    if i - 2 < 0 or word[i - 2] not in _V:
        return False
    if i - 2 == 0:  # not atlimit
        return False
    # and not among(...): the remaining tail must not end with any entry
    head = word[:end]
    for pat in _ET_EXCL:
        if head.endswith(pat):
            return False
    return True


def stem_swedish(word: str) -> str:
    p1 = _mark_p1(word)

    # ---- main_suffix (suffix must lie inside [p1, len)) ----
    n = len(word)
    region = word[p1:] if p1 < n else ""
    # longest among match across ALL branches (Snowball among semantics):
    # candidates are the delete-group, 's', and 'et'
    best = None  # (suffix_len, kind)
    for s in _MAIN_DELETE:
        if region.endswith(s):
            best = (len(s), "del")
            break  # _MAIN_DELETE is sorted longest-first
    for s, kind in (("s", "s"), ("et", "et")):
        if region.endswith(s) and (best is None or len(s) > best[0]):
            best = (len(s), kind)
    if best is not None:
        slen, kind = best
        if kind == "del":
            word = word[: n - slen]
        elif kind == "et":
            if _et_condition(word, n - 2):
                word = word[: n - 2]
        else:  # 's'
            cut = n - 1
            # ('et' et_condition ]) → delete 'ets'
            if word[:cut].endswith("et") and _et_condition(word, cut - 2):
                word = word[: cut - 2]
            elif cut >= 1 and word[cut - 1] in _S_ENDING:
                word = word[:cut]

    # ---- consonant_pair ----
    n = len(word)
    region = word[p1:] if p1 < n else ""
    for pair in _PAIRS:
        if region.endswith(pair):
            word = word[: n - 1]
            break

    # ---- other_suffix ----
    n = len(word)
    region = word[p1:] if p1 < n else ""
    for s in ("fullt", "öst", "lig", "els", "ig"):
        if region.endswith(s):
            if s == "fullt":
                word = word[: n - 5] + "full"
            elif s == "öst":
                if n - 4 >= 0 and word[n - 4] in _OST_ENDING:
                    word = word[: n - 3] + "ös"
            else:
                word = word[: n - len(s)]
            break
    return word
