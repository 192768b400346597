"""Snowball Hindi stemmer — pure-Python port of
xapian-core/languages/algorithms/hindi.sbl; golden-validated against
xapian-data/stemming/hindi/.

The leading ``next`` pins the backward limit after the first character
(minimum one-char stem); the implicit-a suffixes carry CONSONANT as an
among function (backtracks on failure).
"""

from __future__ import annotations

import re

_DEFS = {
    "a": "अ", "A": "आ", "i": "इ", "I": "ई", "u": "उ", "U": "ऊ",
    "q": "ऋ", "e": "ए", "E": "ऐ", "o": "ओ", "O": "औ",
    "_A": "ा", "_i": "ि", "_I": "ी", "_u": "ु", "_U": "ू",
    "_q": "ृ", "_e": "े", "_E": "ै", "_o": "ो", "_O": "ौ",
    "M": "ं", "H": "ः", "Mh": "ँ", "Z": "़", "virama": "्",
    "k": "क", "K": "ख", "g": "ग", "G": "घ", "f": "ङ",
    "c": "च", "C": "छ", "j": "ज", "J": "झ", "F": "ञ",
    "t": "ट", "T": "ठ", "d": "ड", "D": "ढ", "N": "ण",
    "w": "त", "W": "थ", "x": "द", "X": "ध", "n": "न",
    "p": "प", "P": "फ", "b": "ब", "B": "भ", "m": "म",
    "y": "य", "r": "र", "l": "ल", "v": "व",
    "S": "श", "R": "ष", "s": "स", "h": "ह", "lY": "ळ",
    "nZ": "ऩ", "rZ": "ऱ", "lYZ": "ऴ", "kZ": "क़", "KZ": "ख़",
    "gZ": "ग़", "jZ": "ज़", "dZ": "ड़", "DZ": "ढ़", "PZ": "फ़",
    "yZ": "य़",
}


def _x(pattern: str) -> str:
    return re.sub(r"\{(\w+)\}", lambda m: _DEFS[m.group(1)], pattern)


_CONSONANT = frozenset(_x(
    "{k}{K}{g}{G}{f}{c}{C}{j}{J}{F}{t}{T}{d}{D}{N}{w}{W}{x}{X}{n}"
    "{p}{P}{b}{B}{m}{y}{r}{l}{v}{S}{R}{s}{h}{lY}{Z}"
    "{nZ}{rZ}{lYZ}{kZ}{KZ}{gZ}{jZ}{dZ}{DZ}{PZ}{yZ}"
))

_PLAIN = [_x(p) for p in """
{virama} {a} {A} {i} {I} {u} {U} {e} {o} {e}{M} {o}{M} {A}{M}
{u}{A}{M} {u}{e}{M} {u}{o}{M} {A}{e}{M} {A}{o}{M}
{i}{y}{_A}{M} {i}{y}{_o}{M} {A}{i}{y}{_A}{M} {A}{i}{y}{_o}{M}
{A}{Mh} {i}{y}{_A}{Mh} {A}{i}{y}{_A}{Mh}
{a}{w}{_A}{e}{M} {a}{w}{_A}{o}{M} {a}{n}{_A}{e}{M} {a}{n}{_A}{o}{M}
{a}{w}{_A} {a}{w}{_I} {I}{M} {a}{w}{_I}{M} {a}{w}{_e}
{A}{w}{_A} {A}{w}{_I} {A}{w}{_I}{M} {A}{w}{_e}
{a}{n}{_A} {a}{n}{_I} {a}{n}{_e} {A}{n}{_A} {A}{n}{_e}
{U}{M}{g}{_A} {U}{M}{g}{_I} {A}{U}{M}{g}{_A} {A}{U}{M}{g}{_I}
{e}{M}{g}{_e} {e}{M}{g}{_I} {A}{e}{M}{g}{_e} {A}{e}{M}{g}{_I}
{o}{g}{_e} {o}{g}{_I} {A}{o}{g}{_e} {A}{o}{g}{_I}
{e}{g}{_A} {e}{g}{_I} {A}{e}{g}{_A} {A}{e}{g}{_I}
{A}{y}{_A} {A}{e} {A}{I} {A}{I}{M} {i}{e} {A}{o} {A}{i}{e}
{a}{k}{r} {A}{k}{r}
{_A} {_i} {_I} {_u} {_U} {_e} {_o} {_e}{M} {_o}{M} {_A}{M}
{_u}{A}{M} {_u}{e}{M} {_u}{o}{M} {_A}{e}{M} {_A}{o}{M}
{_i}{y}{_A}{M} {_i}{y}{_o}{M} {_A}{i}{y}{_A}{M} {_A}{i}{y}{_o}{M}
{_A}{Mh} {_i}{y}{_A}{Mh} {_A}{i}{y}{_A}{Mh} {_I}{M}
{_A}{w}{_A} {_A}{w}{_I} {_A}{w}{_I}{M} {_A}{w}{_e}
{_A}{n}{_A} {_A}{n}{_e}
{_U}{M}{g}{_A} {_U}{M}{g}{_I} {_A}{U}{M}{g}{_A} {_A}{U}{M}{g}{_I}
{_e}{M}{g}{_e} {_e}{M}{g}{_I} {_A}{e}{M}{g}{_e} {_A}{e}{M}{g}{_I}
{_o}{g}{_e} {_o}{g}{_I} {_A}{o}{g}{_e} {_A}{o}{g}{_I}
{_e}{g}{_A} {_e}{g}{_I} {_A}{e}{g}{_A} {_A}{e}{g}{_I}
{_A}{y}{_A} {_A}{e} {_A}{I} {_A}{I}{M} {_i}{e} {_A}{o} {_A}{i}{e}
{_A}{k}{r}
""".split()]

_CONS_COND = [_x(p) for p in """
{w}{_A}{e}{M} {w}{_A}{o}{M} {n}{_A}{e}{M} {n}{_A}{o}{M}
{w}{_A} {w}{_I} {w}{_I}{M} {w}{_e} {n}{_A} {n}{_I} {n}{_e} {k}{r}
""".split()]

_ALL = sorted(
    [(s, False) for s in _PLAIN] + [(s, True) for s in _CONS_COND],
    key=lambda kv: -len(kv[0]),
)


def stem_hindi(word: str) -> str:
    if len(word) < 1:
        return word
    n = len(word)
    for s, needs_cons in _ALL:
        if word.endswith(s):
            cut = n - len(s)
            if cut < 1:  # the leading `next` pins the limit after char 0
                continue
            if needs_cons:
                # CONSONANT among function — backtracks on failure; the
                # consumed char must stay within the limit
                if cut - 1 >= 1 and word[cut - 1] in _CONSONANT:
                    return word[:cut]
                continue
            return word[:cut]
    return word
