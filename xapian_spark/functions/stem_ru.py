"""Snowball Russian stemmer — pure-Python port of
xapian-core/languages/algorithms/russian.sbl; golden-validated against
xapian-data/stemming/russian/ in tests/test_stemmer.py.

The whole backward phase runs inside ``setlimit tomark pV``, so every
suffix match AND lookbehind condition is confined to [pV, end).
"""

from __future__ import annotations

_V = frozenset("аеиоуыэюя")

_PERF_AYA = ("вшись", "вши", "в")
_PERF_PLAIN = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")

_ADJECTIVE = sorted(
    (
        "ее ие ые ое ими ыми ей ий ый ой ем им ым ом его ого ему ому их "
        "ых ую юю ая яя ою ею"
    ).split(),
    key=len,
    reverse=True,
)

_PART_AYA = ("ющ", "щ", "ем", "нн", "вш")
_PART_PLAIN = ("ивш", "ывш", "ующ")

_VERB_AYA = (
    "ла на ете йте ли й л ем н ло но ет ют ны ть ешь нно"
).split()
_VERB_PLAIN = (
    "ила ыла ена ейте уйте ите или ыли ей уй ил ыл им ым ен ило ыло ено "
    "ят ует уют ит ыт ены ить ыть ишь ую ю"
).split()

_NOUN = sorted(
    (
        "а ев ов ие ье е иями ями ами еи ии и ией ей ой ий й иям ям ием "
        "ем ам ом о у ах иях ях ы ь ию ью ю ия ья я"
    ).split(),
    key=len,
    reverse=True,
)


def _mark_regions(word: str) -> tuple[int, int]:
    n = len(word)
    pV = p2 = n
    i = 0
    while i < n and word[i] not in _V:
        i += 1
    if i < n:
        pV = i + 1
        j = pV
        while j < n and word[j] in _V:
            j += 1
        # gopast non-v consumed; now find second region
        if j < n:
            j += 1
            k = j
            while k < n and word[k] not in _V:
                k += 1
            if k < n:
                k += 1
                while k < n and word[k] in _V:
                    k += 1
                if k < n:
                    p2 = k + 1
    return pV, p2


def _try_suffixes(word, pV, aya, plain):
    """Longest among match over aya∪plain; aya entries need а/я before
    (within the limit).  Returns new word or None."""
    n = len(word)
    region = word[pV:] if pV < n else ""
    for s in sorted(set(aya) | set(plain), key=len, reverse=True):
        if region.endswith(s):
            cut = n - len(s)
            if s in plain:
                return word[:cut]
            if cut - 1 >= pV and word[cut - 1] in "ая":
                return word[:cut]
            return None
    return None


def stem_russian(word: str) -> str:
    word = word.replace("ё", "е")
    pV, p2 = _mark_regions(word)

    def region():
        return word[pV:] if pV < len(word) else ""

    # perfective_gerund or (try reflexive; adjectival or verb or noun)
    r = _try_suffixes(word, pV, _PERF_AYA, _PERF_PLAIN)
    if r is not None:
        word = r
    else:
        # try reflexive
        for s in ("ся", "сь"):
            if region().endswith(s):
                word = word[: len(word) - len(s)]
                break
        # adjectival
        done = False
        n = len(word)
        for s in _ADJECTIVE:
            if region().endswith(s):
                word = word[: n - len(s)]
                done = True
                # try participle
                r = _try_suffixes(word, pV, _PART_AYA, _PART_PLAIN)
                if r is not None:
                    word = r
                break
        if not done:
            r = _try_suffixes(word, pV, _VERB_AYA, _VERB_PLAIN)
            if r is not None:
                word = r
            else:
                n = len(word)
                for s in _NOUN:
                    if region().endswith(s):
                        word = word[: n - len(s)]
                        break

    # try(['и'] delete)
    if region().endswith("и"):
        word = word[:-1]

    # derivational (R2)
    n = len(word)
    for s in ("ость", "ост"):
        if region().endswith(s) and n - len(s) >= p2:
            word = word[: n - len(s)]
            break

    # tidy_up
    n = len(word)
    reg = region()
    if reg.endswith("ейше") or reg.endswith("ейш"):
        cut = n - (4 if reg.endswith("ейше") else 3)
        word = word[:cut]
        # ['н'] 'н' delete
        if word[pV:].endswith("н") and len(word) - 2 >= pV and word[-2] == "н":
            word = word[:-1]
    elif reg.endswith("н"):
        if n - 2 >= pV and word[n - 2] == "н":
            word = word[:-1]
    elif reg.endswith("ь"):
        word = word[:-1]
    return word
