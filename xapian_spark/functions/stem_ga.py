"""Snowball Irish stemmer — pure-Python port of
xapian-core/languages/algorithms/irish.sbl; golden-validated against
xapian-data/stemming/irish/ in tests/test_stemmer.py.

initial_morph strips/normalizes eclipsis, lenition and contractions at the
FRONT of the word (forward among, longest prefix); the backward routines
run with the Snowball persistent cursor (see stem_eu notes).
"""

from __future__ import annotations

_V = frozenset("aeiouáéíóú")

_INITIAL = sorted(
    [
        ("h-", ("del",)), ("n-", ("del",)), ("t-", ("del",)),
        ("d'", ("del",)), ("d'fh", ("repl", "f")),
        ("m'", ("del",)), ("b'", ("del",)),
        ("sh", ("repl", "s")),
        ("mb", ("repl", "b")), ("gc", ("repl", "c")), ("nd", ("repl", "d")),
        ("bhf", ("repl", "f")), ("ng", ("repl", "g")), ("bp", ("repl", "p")),
        ("ts", ("repl", "s")), ("dt", ("repl", "t")),
        ("bh", ("repl", "b")), ("ch", ("repl", "c")), ("dh", ("repl", "d")),
        ("fh", ("repl", "f")), ("gh", ("repl", "g")), ("mh", ("repl", "m")),
        ("ph", ("repl", "p")), ("th", ("repl", "t")),
    ],
    key=lambda kv: -len(kv[0]),
)

_NOUN = sorted(
    [(s, "r1_del") for s in (
        "amh eamh abh eabh aibh ibh aimh imh "
        "aíocht íocht aíochta íochta"
    ).split()]
    + [(s, "r2_del") for s in "ire irí aire airí".split()],
    key=lambda kv: -len(kv[0]),
)

_DERIV = sorted(
    [(s, "r2_del") for s in (
        "acht eacht ach each eachtúil eachta achtúil achta"
    ).split()]
    + [(s, ("repl", "arc")) for s in "arcacht arcachtaí arcachta".split()]
    + [(s, ("repl", "gin")) for s in "gineach gineas ginis".split()]
    + [(s, ("repl", "graf")) for s in
       "grafaíoch grafaíocht grafaíochta grafaíochtaí".split()]
    + [(s, ("repl", "paite")) for s in "paite patach pataigh patacha".split()]
    + [(s, ("repl", "óid")) for s in "óideach óideacha óidigh".split()],
    key=lambda kv: -len(kv[0]),
)

_VERB = sorted(
    [(s, "rv_del") for s in "imid aimid ímid aímid faidh fidh".split()]
    + [(s, "r1_del") for s in "ain eadh adh áil tear tar".split()],
    key=lambda kv: -len(kv[0]),
)


def _mark_regions(word: str) -> tuple[int, int, int]:
    n = len(word)
    pV = p1 = p2 = n
    i = 0
    while i < n and word[i] not in _V:
        i += 1
    if i < n:
        pV = i + 1
        j = pV
        while j < n and word[j] in _V:
            j += 1
        if j < n:
            p1 = j + 1
            k = p1
            while k < n and word[k] not in _V:
                k += 1
            if k < n:
                k += 1
                while k < n and word[k] in _V:
                    k += 1
                if k < n:
                    p2 = k + 1
    return pV, p1, p2


def _bstep(word: str, c: int, table, pV: int, p1: int, p2: int):
    head = word[:c]
    for s, act in table:
        if head.endswith(s):
            cut = c - len(s)
            if act == "rv_del":
                if cut < pV:
                    return None
                return word[:cut] + word[c:], cut
            if act == "r1_del":
                if cut < p1:
                    return None
                return word[:cut] + word[c:], cut
            if act == "r2_del":
                if cut < p2:
                    return None
                return word[:cut] + word[c:], cut
            return word[:cut] + act[1] + word[c:], cut
    return None


def stem_irish(word: str) -> str:
    for s, act in _INITIAL:
        if word.startswith(s):
            word = (act[1] if act[0] == "repl" else "") + word[len(s):]
            break
    pV, p1, p2 = _mark_regions(word)
    # Each backward routine is invoked with `do X`, which saves the cursor
    # as DISTANCE FROM THE RIGHT END and restores it after — so every
    # routine matches at the end of the CURRENT word, whatever the previous
    # one deleted or replaced.
    for table in (_NOUN, _DERIV, _VERB):
        r = _bstep(word, len(word), table, pV, p1, p2)
        if r is not None:
            word, _ = r
    return word
