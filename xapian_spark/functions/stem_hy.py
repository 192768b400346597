"""Snowball Armenian stemmer — pure-Python port of
xapian-core/languages/algorithms/armenian.sbl; golden-validated against
xapian-data/stemming/armenian/.

The whole backward phase runs inside ``setlimit tomark pV``; ``ending``
additionally requires R2.  Tables transcribed in stringdef notation and
expanded programmatically.
"""

from __future__ import annotations

import re

_DEFS = {
    "a": "ա", "b": "բ", "g": "գ", "d": "դ", "ye": "ե", "z": "զ",
    "e": "է", "y": "ը", "dt": "թ", "zh": "ժ", "i": "ի", "l": "լ",
    "kh": "խ", "ts": "ծ", "k": "կ", "h": "հ", "dz": "ձ", "gh": "ղ",
    "djch": "ճ", "m": "մ", "j": "յ", "n": "ն", "sh": "շ", "vo": "ո",
    "ch": "չ", "p": "պ", "dj": "ջ", "r": "ռ", "s": "ս", "v": "վ",
    "t": "տ", "r'": "ր", "c": "ց", "u": "ւ", "bp": "փ", "q": "ք",
    "ev": "և", "o": "օ", "f": "ֆ",
}


def _x(pattern: str) -> str:
    return re.sub(r"\{([a-z']+)\}", lambda m: _DEFS[m.group(1)], pattern)


_V = frozenset(_x("{a}{e}{i}{o}{u}{ye}{vo}{y}"))

_ADJECTIVE = sorted([_x(p) for p in (
    "{b}{a}{r'} {p}{ye}{s} {vo}{r'}{e}{n} {vo}{v}{i}{n} {a}{k}{i} "
    "{l}{a}{j}{n} {r'}{vo}{r'}{d} {ye}{r'}{vo}{r'}{d} {a}{k}{a}{n} "
    "{a}{l}{i} {k}{vo}{t} {ye}{k}{ye}{n} {vo}{r'}{a}{k} {ye}{gh} "
    "{v}{vo}{u}{n} {ye}{r'}{ye}{n} {a}{r'}{a}{n} {ye}{n} {a}{v}{ye}{t} "
    "{g}{i}{n} {i}{v} {a}{t} {i}{n}"
).split()], key=len, reverse=True)

_VERB = sorted([_x(p) for p in (
    "{vo}{u}{m} {v}{vo}{u}{m} {a}{l}{vo}{u} {ye}{l}{vo}{u} {v}{ye}{l} "
    "{a}{n}{a}{l} {ye}{l}{vo}{u}{c} {a}{l}{vo}{u}{c} {y}{a}{l} "
    "{y}{ye}{l} {a}{l}{vo}{v} {ye}{l}{vo}{v} {a}{l}{i}{s} {ye}{l}{i}{s} "
    "{ye}{n}{a}{l} {a}{c}{n}{a}{l} {ye}{c}{n}{ye}{l} {c}{n}{ye}{l} "
    "{n}{ye}{l} {a}{t}{ye}{l} {vo}{t}{ye}{l} {k}{vo}{t}{ye}{l} "
    "{t}{ye}{l} {v}{a}{ts} {ye}{c}{v}{ye}{l} {a}{c}{v}{ye}{l} "
    "{ye}{c}{i}{r'} {a}{c}{i}{r'} {ye}{c}{i}{n}{q} {a}{c}{i}{n}{q} "
    "{v}{ye}{c}{i}{r'} {v}{ye}{c}{i}{n}{q} {v}{ye}{c}{i}{q} "
    "{v}{ye}{c}{i}{n} {a}{c}{r'}{i}{r'} {a}{c}{r'}{ye}{c} "
    "{a}{c}{r'}{i}{n}{q} {a}{c}{r'}{i}{q} {a}{c}{r'}{i}{n} {ye}{c}{i}{q} "
    "{a}{c}{i}{q} {ye}{c}{i}{n} {a}{c}{i}{n} {a}{c}{a}{r'} {a}{c}{a}{v} "
    "{a}{c}{a}{n}{q} {a}{c}{a}{q} {a}{c}{a}{n} {v}{ye}{c}{i} "
    "{a}{c}{r'}{i} {ye}{c}{a}{r'} {ye}{c}{a}{v} {c}{a}{n}{q} {c}{a}{q} "
    "{c}{a}{n} {a}{c}{a} {a}{c}{i} {ye}{c}{a} {ch}{ye}{l} {ye}{c}{i} "
    "{a}{r'} {a}{v} {a}{n}{q} {a}{q} {a}{n} {a}{l} {ye}{l} {ye}{c} "
    "{a}{c} {v}{ye} {a}"
).split()], key=len, reverse=True)

_NOUN = sorted([_x(p) for p in (
    "{a}{ts}{vo} {a}{n}{a}{k} {a}{n}{o}{c} {a}{r'}{a}{n} {a}{r'}{q} "
    "{p}{a}{n} {s}{t}{a}{n} {ye}{gh}{e}{n} {ye}{n}{q} {i}{k} {i}{ch} "
    "{i}{q} {m}{vo}{u}{n}{q} {j}{a}{k} {j}{vo}{u}{n} {vo}{n}{q} "
    "{vo}{r'}{d} {vo}{c} {ch}{ye}{q} {v}{a}{ts}{q} {v}{vo}{r'} "
    "{a}{v}{vo}{r'} {vo}{u}{dt}{j}{vo}{u}{n} {vo}{u}{k} {vo}{u}{h}{i} "
    "{vo}{u}{j}{dt} {vo}{u}{j}{q} {vo}{u}{s}{t} {vo}{u}{s} {c}{i} "
    "{a}{l}{i}{q} {a}{n}{i}{q} {i}{l} {i}{ch}{q} {vo}{u}{n}{q} "
    "{g}{a}{r'} {vo}{u} {a}{k} {a}{n} {q}"
).split()], key=len, reverse=True)

_ENDING = sorted([_x(p) for p in (
    "{n}{ye}{r'}{y} {n}{ye}{r'}{n} {n}{ye}{r'}{i} {n}{ye}{r'}{d} "
    "{ye}{r'}{i}{c} {n}{ye}{r'}{i}{c} {ye}{r'}{i} {ye}{r'}{d} "
    "{ye}{r'}{n} {ye}{r'}{y} {n}{ye}{r'}{i}{n} {vo}{u}{dt}{j}{a}{n}{n} "
    "{vo}{u}{dt}{j}{a}{n}{y} {vo}{u}{dt}{j}{a}{n}{s} "
    "{vo}{u}{dt}{j}{a}{n}{d} {vo}{u}{dt}{j}{a}{n} {ye}{r'}{i}{n} "
    "{i}{n} {s}{a} {vo}{dj} {i}{c} {ye}{r'}{vo}{v} {n}{ye}{r'}{vo}{v} "
    "{ye}{r'}{vo}{u}{m} {n}{ye}{r'}{vo}{u}{m} {vo}{u}{n} {vo}{u}{d} "
    "{v}{a}{n}{s} {v}{a}{n}{y} {v}{a}{n}{d} {a}{n}{y} {a}{n}{d} "
    "{v}{a}{n} {vo}{dj}{y} {vo}{dj}{s} {vo}{dj}{d} {vo}{c} {vo}{u}{c} "
    "{vo}{dj}{i}{c} {c}{i}{c} {v}{i}{c} {v}{i} {v}{vo}{v} {vo}{v} "
    "{a}{n}{vo}{v} {a}{n}{vo}{u}{m} {v}{a}{n}{i}{c} {a}{m}{b} {a}{n} "
    "{n}{ye}{r'} {ye}{r'} {v}{a} {y} {n} {d} {c} {i}"
).split()], key=len, reverse=True)


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


def _apply(word: str, table, lo: int) -> str:
    n = len(word)
    region = word[lo:] if lo < n else ""
    for s in table:
        if region.endswith(s):
            return word[: n - len(s)]
    return word


def _apply_ending(word: str, pV: int, p2: int) -> str:
    """[substring] (limited to pV) R2 among — the longest pV-region match
    commits, and R2 failure fails the routine without fallback."""
    n = len(word)
    region = word[pV:] if pV < n else ""
    for s in _ENDING:
        if region.endswith(s):
            cut = n - len(s)
            if cut >= p2:
                return word[:cut]
            return word
    return word


def stem_armenian(word: str) -> str:
    pV, p2 = _mark_regions(word)
    word = _apply_ending(word, pV, p2)
    word = _apply(word, _VERB, pV)
    word = _apply(word, _ADJECTIVE, pV)
    word = _apply(word, _NOUN, pV)
    return word
