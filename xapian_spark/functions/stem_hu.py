"""Snowball Hungarian stemmer — pure-Python port of
xapian-core/languages/algorithms/hungarian.sbl (noun inflections);
golden-validated against xapian-data/stemming/hungarian/.
"""

from __future__ import annotations

_V = frozenset("aeiouáéíóöőúüű")

_DOUBLES = (
    "ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs",
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn", "pp",
    "rr", "ss", "tt", "vv", "zz",
)

_CASE = sorted(
    (
        "ban ben ba be ra re nak nek val vel tól től ról ről ból ből "
        "hoz hez höz nál nél ig at et ot öt ért képp képpen kor ul ül "
        "vá vé onként enként anként ként en on an ön n t"
    ).split(),
    key=len,
    reverse=True,
)

_CASE_SPECIAL = (("ánként", "a"), ("én", "e"), ("án", "a"))

_CASE_OTHER = (
    ("ástul", "a"), ("éstül", "e"), ("astul", ""), ("estül", ""),
    ("stul", ""), ("stül", ""),
)

_PLURAL = (
    ("ák", "a"), ("ék", "e"), ("ök", ""), ("ak", ""), ("ok", ""),
    ("ek", ""), ("k", ""),
)

_OWNED = (
    ("oké", ""), ("öké", ""), ("aké", ""), ("eké", ""),
    ("éké", "e"), ("áké", "a"), ("ké", ""),
    ("ééi", "e"), ("áéi", "a"), ("éi", ""), ("éé", "e"), ("é", ""),
)

_SING_OWNER = (
    ("ünk", ""), ("unk", ""), ("ánk", "a"), ("énk", "e"), ("nk", ""),
    ("ájuk", "a"), ("éjük", "e"), ("juk", ""), ("jük", ""),
    ("uk", ""), ("ük", ""),
    ("em", ""), ("om", ""), ("am", ""), ("ám", "a"), ("ém", "e"), ("m", ""),
    ("od", ""), ("ed", ""), ("ad", ""), ("öd", ""), ("ád", "a"),
    ("éd", "e"), ("d", ""),
    ("ja", ""), ("je", ""), ("a", ""), ("e", ""), ("o", ""),
    ("á", "a"), ("é", "e"),
)

_PLUR_OWNER = (
    ("jaim", ""), ("jeim", ""), ("áim", "a"), ("éim", "e"),
    ("aim", ""), ("eim", ""), ("im", ""),
    ("jaid", ""), ("jeid", ""), ("áid", "a"), ("éid", "e"),
    ("aid", ""), ("eid", ""), ("id", ""),
    ("jai", ""), ("jei", ""), ("ái", "a"), ("éi", "e"),
    ("ai", ""), ("ei", ""), ("i", ""),
    ("jaink", ""), ("jeink", ""), ("eink", ""), ("aink", ""),
    ("áink", "a"), ("éink", "e"), ("ink", ""),
    ("jaitok", ""), ("jeitek", ""), ("aitok", ""), ("eitek", ""),
    ("áitok", "a"), ("éitek", "e"), ("itek", ""),
    ("jeik", ""), ("jaik", ""), ("aik", ""), ("eik", ""),
    ("áik", "a"), ("éik", "e"), ("ik", ""),
)


def _mark_p1(word: str) -> int:
    n = len(word)
    if n == 0:
        return 0
    if word[0] in _V:
        i = 1
        while i < n and word[i] in _V:
            i += 1
        if i < n:
            return i + 1
        return n
    i = 0
    while i < n and word[i] not in _V:
        i += 1
    if i < n:
        return i + 1
    return n


def _ends_double(word: str) -> bool:
    return word.endswith(_DOUBLES)


def _undouble(word: str) -> str:
    """next [hop 1] delete — remove the second-to-last char."""
    if len(word) >= 2:
        return word[:-2] + word[-1]
    return word


def _v_ending(word: str, p1: int) -> str:
    if word.endswith("á") and len(word) - 1 >= p1:
        return word[:-1] + "a"
    if word.endswith("é") and len(word) - 1 >= p1:
        return word[:-1] + "e"
    return word


def _table_step(word: str, p1: int, table) -> str:
    """Longest match over (suffix, repl) pairs with R1 condition."""
    n = len(word)
    for s, rep in sorted(table, key=lambda kv: -len(kv[0])):
        if word.endswith(s):
            if n - len(s) >= p1:
                return word[: n - len(s)] + rep
            return word
    return word


def stem_hungarian(word: str) -> str:
    p1 = _mark_p1(word)

    # instrum: al/el preceded by a double consonant
    n = len(word)
    for s in ("al", "el"):
        if word.endswith(s):
            cut = n - 2
            if cut >= p1 and _ends_double(word[:cut]):
                word = _undouble(word[:cut])
            break

    # case + v_ending
    n = len(word)
    for s in _CASE:
        if word.endswith(s):
            if n - len(s) >= p1:
                word = _v_ending(word[: n - len(s)], p1)
            break

    word = _table_step(word, p1, _CASE_SPECIAL)
    word = _table_step(word, p1, _CASE_OTHER)

    # factive: á/é preceded by a double consonant
    n = len(word)
    for s in ("á", "é"):
        if word.endswith(s):
            cut = n - 1
            if cut >= p1 and _ends_double(word[:cut]):
                word = _undouble(word[:cut])
            break

    word = _table_step(word, p1, _OWNED)
    word = _table_step(word, p1, _SING_OWNER)
    word = _table_step(word, p1, _PLUR_OWNER)
    word = _table_step(word, p1, _PLURAL)
    return word
