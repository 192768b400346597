"""Snowball Greek stemmer — pure-Python port of
xapian-core/languages/algorithms/greek.sbl; golden-validated against
xapian-data/stemming/greek/.

The recurring shapes: ``[] substring atlimit among(...)`` appends when the
remaining stem EQUALS an entry; without atlimit, when it ENDS WITH one.
``test1`` gates step 6's generic-ending removal.
"""

from __future__ import annotations

import re

_G = {
    "a": "α", "v": "β", "g": "γ", "d": "δ", "e": "ε", "z": "ζ",
    "i": "η", "th": "θ", "y": "ι", "k": "κ", "l": "λ", "m": "μ",
    "n": "ν", "x": "ξ", "o": "ο", "p": "π", "r": "ρ", "ss": "ς",
    "s": "σ", "t": "τ", "u": "υ", "f": "φ", "ch": "χ", "ps": "ψ",
    "oo": "ω",
}


def _x(p: str) -> str:
    return re.sub(r"\{(\w+)\}", lambda m: _G[m.group(1)], p)


def _xs(text: str) -> list[str]:
    return [_x(t) for t in text.split()]


_LOWER = {}
for _up, _lo in zip("ΑΒΓΔΕΖΗΘΙΚΛΜΝΞΟΠΡΣΤΥΦΧΨΩ", "αβγδεζηθικλμνξοπρστυφχψω"):
    _LOWER[_up] = _lo
_LOWER.update({
    "Ϊ": "ι", "Ϋ": "υ", "ά": "α", "έ": "ε", "ή": "η", "ί": "ι",
    "ό": "ο", "ύ": "υ", "ώ": "ω", "ΐ": "η", "ΰ": "υ", "ϊ": "η",
    "ϋ": "υ", "Ά": "α", "Έ": "ε", "Ή": "η", "Ί": "ι", "Ό": "ο",
    "Ύ": "υ", "Ώ": "ω", "ς": "σ",
})

_V = frozenset("αεηιουω")
_V2 = frozenset("αεηιοω")


def _ends_any(w, entries):
    for s in sorted(entries, key=len, reverse=True):
        if w.endswith(s):
            return True
    return False


def _equals_any(w, entries):
    return w in entries


class _St:
    __slots__ = ("w", "test1")

    def __init__(self, w):
        self.w = w
        self.test1 = True


def _strip(st, suffixes, unset=True):
    """Longest among suffix → delete; returns True on match."""
    for s in sorted(suffixes, key=len, reverse=True):
        if st.w.endswith(s):
            st.w = st.w[: len(st.w) - len(s)]
            if unset:
                st.test1 = False
            return True
    return False


def _step_1(st):
    table = [
        (_xs("{f}{a}{g}{y}{a} {f}{a}{g}{y}{o}{u} {f}{a}{g}{y}{oo}{n}"), _x("{f}{a}")),
        (_xs("{s}{k}{a}{g}{y}{a} {s}{k}{a}{g}{y}{o}{u} {s}{k}{a}{g}{y}{oo}{n}"), _x("{s}{k}{a}")),
        (_xs("{o}{l}{o}{g}{y}{o}{u} {o}{l}{o}{g}{y}{a} {o}{l}{o}{g}{y}{oo}{n}"), _x("{o}{l}{o}")),
        (_xs("{s}{o}{g}{y}{o}{u} {s}{o}{g}{y}{a} {s}{o}{g}{y}{oo}{n}"), _x("{s}{o}")),
        (_xs("{t}{a}{t}{o}{g}{y}{a} {t}{a}{t}{o}{g}{y}{o}{u} {t}{a}{t}{o}{g}{y}{oo}{n}"), _x("{t}{a}{t}{o}")),
        (_xs("{k}{r}{e}{a}{s} {k}{r}{e}{a}{t}{o}{s} {k}{r}{e}{a}{t}{a} {k}{r}{e}{a}{t}{oo}{n}"), _x("{k}{r}{e}")),
        (_xs("{p}{e}{r}{a}{s} {p}{e}{r}{a}{t}{o}{s} {p}{e}{r}{a}{t}{i} {p}{e}{r}{a}{t}{a} {p}{e}{r}{a}{t}{oo}{n}"), _x("{p}{e}{r}")),
        (_xs("{t}{e}{r}{a}{s} {t}{e}{r}{a}{t}{o}{s} {t}{e}{r}{a}{t}{a} {t}{e}{r}{a}{t}{oo}{n}"), _x("{t}{e}{r}")),
        (_xs("{f}{oo}{s} {f}{oo}{t}{o}{s} {f}{oo}{t}{a} {f}{oo}{t}{oo}{n}"), _x("{f}{oo}")),
        (_xs("{k}{a}{th}{e}{s}{t}{oo}{s} {k}{a}{th}{e}{s}{t}{oo}{t}{o}{s} {k}{a}{th}{e}{s}{t}{oo}{t}{a} {k}{a}{th}{e}{s}{t}{oo}{t}{oo}{n}"), _x("{k}{a}{th}{e}{s}{t}")),
        (_xs("{g}{e}{g}{o}{n}{o}{s} {g}{e}{g}{o}{n}{o}{t}{o}{s} {g}{e}{g}{o}{n}{o}{t}{a} {g}{e}{g}{o}{n}{o}{t}{oo}{n}"), _x("{g}{e}{g}{o}{n}")),
    ]
    all_pairs = sorted(
        [(s, rep) for ss, rep in table for s in ss], key=lambda kv: -len(kv[0])
    )
    for s, rep in all_pairs:
        if st.w.endswith(s):
            st.w = st.w[: len(st.w) - len(s)] + rep
            st.test1 = False
            return


def _s_step(st, suffixes, eq_append=None, ends_append=None):
    """Shape: strip suffix; then ((equals → append) or (ends → append));
    eq/ends_append: list of (entries, text)."""
    if not _strip(st, suffixes):
        return False
    for entries, text in (eq_append or []):
        if _equals_any(st.w, entries):
            st.w += text
            return True
    for entries, text in (ends_append or []):
        if _ends_any(st.w, entries):
            st.w += text
            return True
    return True


def _step_s1(st):
    _s_step(
        st,
        _xs("{y}{z}{a} {y}{z}{e}{s} {y}{z}{e} {y}{z}{a}{m}{e} {y}{z}{a}{t}{e} "
            "{y}{z}{a}{n} {y}{z}{a}{n}{e} {y}{z}{oo} {y}{z}{e}{y}{s} {y}{z}{e}{y} "
            "{y}{z}{o}{u}{m}{e} {y}{z}{e}{t}{e} {y}{z}{o}{u}{n} {y}{z}{o}{u}{n}{e}"),
        eq_append=[
            (_xs("{a}{n}{a}{m}{p}{a} {e}{m}{p}{a} {e}{p}{a} {x}{a}{n}{a}{p}{a} {p}{a} "
                 "{p}{e}{r}{y}{p}{a} {a}{th}{r}{o} {s}{u}{n}{a}{th}{r}{o} {d}{a}{n}{e}"),
             _G["y"]),
            (_xs("{m}{a}{r}{k} {k}{o}{r}{n} {a}{m}{p}{a}{r} {a}{r}{r} {v}{a}{th}{u}{r}{y} "
                 "{v}{a}{r}{k} {v} {v}{o}{l}{v}{o}{r} {g}{k}{r} {g}{l}{u}{k}{o}{r} "
                 "{g}{l}{u}{k}{u}{r} {y}{m}{p} {l} {l}{o}{u} {m}{a}{r} {m} {p}{r} "
                 "{m}{p}{r} {p}{o}{l}{u}{r} {p} {r} {p}{y}{p}{e}{r}{o}{r}"),
             _x("{y}{z}")),
        ],
    )


def _step_s2(st):
    _s_step(
        st,
        _xs("{oo}{th}{i}{k}{a} {oo}{th}{i}{k}{e}{s} {oo}{th}{i}{k}{e} "
            "{oo}{th}{i}{k}{a}{m}{e} {oo}{th}{i}{k}{a}{t}{e} {oo}{th}{i}{k}{a}{n} "
            "{oo}{th}{i}{k}{a}{n}{e}"),
        eq_append=[
            (_xs("{a}{l} {v}{y} {e}{n} {u}{ps} {l}{y} {z}{oo} {s} {ch}"),
             _x("{oo}{n}")),
        ],
    )


def _step_s3(st):
    if st.w == _x("{y}{s}{a}"):
        st.w = _x("{y}{s}")
        return
    _s_step(
        st,
        _xs("{y}{s}{a} {y}{s}{e}{s} {y}{s}{e} {y}{s}{a}{m}{e} {y}{s}{a}{t}{e} "
            "{y}{s}{a}{n} {y}{s}{a}{n}{e}"),
        eq_append=[
            (_xs("{a}{n}{a}{m}{p}{a} {a}{th}{r}{o} {e}{m}{p}{a} {e}{s}{e} "
                 "{e}{s}{oo}{k}{l}{e} {e}{p}{a} {x}{a}{n}{a}{p}{a} {e}{p}{e} "
                 "{p}{e}{r}{y}{p}{a} {s}{u}{n}{a}{th}{r}{o} {d}{a}{n}{e} {k}{l}{e} "
                 "{ch}{a}{r}{t}{o}{p}{a} {e}{x}{a}{r}{ch}{a} {m}{e}{t}{e}{p}{e} "
                 "{a}{p}{o}{k}{l}{e} {a}{p}{e}{k}{l}{e} {e}{k}{l}{e} {p}{e}"),
             _G["y"]),
            (_xs("{a}{n} {a}{f} {g}{e} {g}{y}{g}{a}{n}{t}{o}{a}{f} {g}{k}{e} "
                 "{d}{i}{m}{o}{k}{r}{a}{t} {k}{o}{m} {g}{k} {m} {p} "
                 "{p}{o}{u}{k}{a}{m} {o}{l}{o} {l}{a}{r}"),
             _x("{y}{s}")),
        ],
    )


def _step_s4(st):
    _s_step(
        st,
        _xs("{y}{s}{oo} {y}{s}{e}{y}{s} {y}{s}{e}{y} {y}{s}{o}{u}{m}{e} "
            "{y}{s}{e}{t}{e} {y}{s}{o}{u}{n} {y}{s}{o}{u}{n}{e}"),
        eq_append=[
            (_xs("{a}{n}{a}{m}{p}{a} {e}{m}{p}{a} {e}{s}{e} {e}{s}{oo}{k}{l}{e} "
                 "{e}{p}{a} {x}{a}{n}{a}{p}{a} {e}{p}{e} {p}{e}{r}{y}{p}{a} "
                 "{a}{th}{r}{o} {s}{u}{n}{a}{th}{r}{o} {d}{a}{n}{e} {k}{l}{e} "
                 "{ch}{a}{r}{t}{o}{p}{a} {e}{x}{a}{r}{ch}{a} {m}{e}{t}{e}{p}{e} "
                 "{a}{p}{o}{k}{l}{e} {a}{p}{e}{k}{l}{e} {e}{k}{l}{e} {p}{e}"),
             _G["y"]),
        ],
    )


def _step_s5(st):
    _s_step(
        st,
        _xs("{y}{s}{t}{o}{s} {y}{s}{t}{o}{u} {y}{s}{t}{o} {y}{s}{t}{e} "
            "{y}{s}{t}{o}{y} {y}{s}{t}{oo}{n} {y}{s}{t}{o}{u}{s} {y}{s}{t}{i} "
            "{y}{s}{t}{i}{s} {y}{s}{t}{a} {y}{s}{t}{e}{s}"),
        eq_append=[
            (_xs("{d}{a}{n}{e} {s}{u}{n}{a}{th}{r}{o} {k}{l}{e} {s}{e} "
                 "{e}{s}{oo}{k}{l}{e} {a}{s}{e} {p}{l}{e}"),
             _G["y"]),
            (_xs("{m} {p} {a}{p} {a}{r} {i}{d} {k}{t} {s}{k} {s}{ch} {u}{ps} "
                 "{f}{a} {ch}{r} {ch}{t} {a}{k}{t} {a}{o}{r} {a}{s}{ch} {a}{t}{a} "
                 "{a}{ch}{n} {a}{ch}{t} {g}{e}{m} {g}{u}{r} {e}{m}{p} {e}{u}{p} "
                 "{e}{ch}{th} {i}{f}{a} {k}{a}{th} {k}{a}{k} {k}{u}{l} {l}{u}{g} "
                 "{m}{a}{k} {m}{e}{g} {t}{a}{ch} {f}{y}{l} {ch}{oo}{r}"),
             _x("{y}{s}{t}")),
        ],
    )


def _step_s6(st):
    n0 = len(st.w)
    suf = _xs("{y}{s}{m}{o} {y}{s}{m}{o}{y} {y}{s}{m}{o}{s} {y}{s}{m}{o}{u} "
              "{y}{s}{m}{o}{u}{s} {y}{s}{m}{oo}{n}")
    if not _strip(st, suf):
        return
    for entries, text in [
        (_xs("{s}{e} {m}{e}{t}{a}{s}{e} {m}{y}{k}{r}{o}{s}{e} {e}{g}{k}{l}{e} "
             "{a}{p}{o}{k}{l}{e}"), _x("{y}{s}{m}")),
        (_xs("{d}{a}{n}{e} {a}{n}{t}{y}{d}{a}{n}{e}"), _G["y"]),
    ]:
        if _equals_any(st.w, entries):
            st.w += text
            return
    for a, b in sorted([
        (_x("{a}{g}{n}{oo}{s}{t}{y}{k}"), _x("{a}{g}{n}{oo}{s}{t}")),
        (_x("{a}{t}{o}{m}{y}{k}"), _x("{a}{t}{o}{m}")),
        (_x("{g}{n}{oo}{s}{t}{y}{k}"), _x("{g}{n}{oo}{s}{t}")),
        (_x("{e}{th}{n}{y}{k}"), _x("{e}{th}{n}")),
        (_x("{e}{k}{l}{e}{k}{t}{y}{k}"), _x("{e}{k}{l}{e}{k}{t}")),
        (_x("{s}{k}{e}{p}{t}{y}{k}"), _x("{s}{k}{e}{p}{t}")),
        (_x("{t}{o}{p}{y}{k}"), _x("{t}{o}{p}")),
        (_x("{a}{l}{e}{x}{a}{n}{d}{r}{y}{n}"), _x("{a}{l}{e}{x}{a}{n}{d}{r}")),
        (_x("{v}{u}{z}{a}{n}{t}{y}{n}"), _x("{v}{u}{z}{a}{n}{t}")),
        (_x("{th}{e}{a}{t}{r}{y}{n}"), _x("{th}{e}{a}{t}{r}")),
    ], key=lambda kv: -len(kv[0])):
        if st.w.endswith(a):
            st.w = st.w[: len(st.w) - len(a)] + b
            return


def _step_s7(st):
    _s_step(
        st,
        _xs("{a}{r}{a}{k}{y} {a}{r}{a}{k}{y}{a} {o}{u}{d}{a}{k}{y} {o}{u}{d}{a}{k}{y}{a}"),
        eq_append=[(_xs("{s} {ch}"), _x("{a}{r}{a}{k}"))],
    )


def _step_s8(st):
    ok = _strip(st, _xs(
        "{a}{k}{y} {a}{k}{y}{a} {y}{t}{s}{a} {y}{t}{s}{a}{s} {y}{t}{s}{e}{s} "
        "{y}{t}{s}{oo}{n} {a}{r}{a}{k}{y} {a}{r}{a}{k}{y}{a}"))
    if not ok:
        return
    for entries, text in [
        (_xs("{v}{a}{m}{v} {v}{r} {k}{a}{y}{m} {k}{o}{n} {k}{o}{r} {l}{a}{v}{r} "
             "{l}{o}{u}{l} {m}{e}{r} {m}{o}{u}{s}{t} {n}{a}{g}{k}{a}{s} {p}{l} {r} "
             "{r}{u} {s} {s}{k} {s}{o}{k} {s}{p}{a}{n} {t}{z} {f}{a}{r}{m} {ch} "
             "{k}{a}{p}{a}{k} {a}{l}{y}{s}{f} {a}{m}{v}{r} {a}{n}{th}{r} {k} "
             "{f}{u}{l} {k}{a}{t}{r}{a}{p} {k}{l}{y}{m} {m}{a}{l} {s}{l}{o}{v} {f} "
             "{s}{f} {t}{s}{e}{ch}{o}{s}{l}{o}{v}"), _x("{a}{k}")),
        (_xs("{v} {v}{a}{l} {g}{y}{a}{n} {g}{l} {z} {i}{g}{o}{u}{m}{e}{n} "
             "{k}{a}{r}{d} {m}{a}{k}{r}{u}{n} {n}{u}{f} {p}{a}{t}{e}{r} {p} "
             "{t}{o}{s} {t}{r}{y}{p}{o}{l}"), _x("{y}{t}{s}")),
    ]:
        if _equals_any(st.w, entries):
            st.w += text
            return
    if st.w.endswith(_x("{k}{o}{r}")):
        st.w += _x("{y}{t}{s}")


def _step_s9(st):
    _s_step(
        st,
        _xs("{y}{d}{y}{o} {y}{d}{y}{a} {y}{d}{y}{oo}{n}"),
        eq_append=[(_xs("{a}{y}{f}{n} {y}{r} {o}{l}{o} {ps}{a}{l}"), _x("{y}{d}"))],
        ends_append=[(_xs("{e} {p}{a}{y}{ch}{n}"), _x("{y}{d}"))],
    )


def _step_s10(st):
    _s_step(
        st,
        _xs("{y}{s}{k}{o}{s} {y}{s}{k}{o}{u} {y}{s}{k}{o} {y}{s}{k}{e}"),
        eq_append=[
            (_xs("{d} {y}{v} {m}{i}{n} {r} {f}{r}{a}{g}{k} {l}{u}{k} {o}{v}{e}{l}"),
             _x("{y}{s}{k}")),
        ],
    )


def _step_2a(st):
    if not _strip(st, _xs("{a}{d}{e}{s} {a}{d}{oo}{n}"), unset=False):
        return
    if not _ends_any(st.w, _xs(
        "{o}{k} {m}{a}{m} {m}{a}{n} {m}{p}{a}{m}{p} {p}{a}{t}{e}{r} "
        "{g}{y}{a}{g}{y} {n}{t}{a}{n}{t} {k}{u}{r} {th}{e}{y} {p}{e}{th}{e}{r}"
    )):
        st.w += _x("{a}{d}")


def _step_2b(st):
    if not _strip(st, _xs("{e}{d}{e}{s} {e}{d}{oo}{n}"), unset=False):
        return
    if _ends_any(st.w, _xs(
        "{o}{p} {y}{p} {e}{m}{p} {u}{p} {g}{i}{p} {d}{a}{p} {k}{r}{a}{s}{p} {m}{y}{l}"
    )):
        st.w += _x("{e}{d}")


def _step_2c(st):
    if not _strip(st, _xs("{o}{u}{d}{e}{s} {o}{u}{d}{oo}{n}"), unset=False):
        return
    if _ends_any(st.w, _xs(
        "{a}{r}{k} {k}{a}{l}{y}{a}{k} {p}{e}{t}{a}{l} {l}{y}{ch} {p}{l}{e}{x} "
        "{s}{k} {s} {f}{l} {f}{r} {v}{e}{l} {l}{o}{u}{l} {ch}{n} {s}{p} "
        "{t}{r}{a}{g} {f}{e}"
    )):
        st.w += _x("{o}{u}{d}")


def _step_2d(st):
    if not _strip(st, _xs("{e}{oo}{s} {e}{oo}{n}")):
        return
    if _equals_any(st.w, _xs("{th} {d} {e}{l} {g}{a}{l} {n} {p} {y}{d} {p}{a}{r}")):
        st.w += _G["e"]


def _step_3(st):
    if not _strip(st, _xs("{y}{a} {y}{o}{u} {y}{oo}{n}")):
        return
    if st.w[-1:] in _V:
        st.w += _G["y"]


def _step_4(st):
    if not _strip(st, _xs("{y}{k}{a} {y}{k}{o} {y}{k}{o}{u} {y}{k}{oo}{n}")):
        return
    if st.w[-1:] in _V:
        st.w += _x("{y}{k}")
        return
    if _equals_any(st.w, _xs(
        "{a}{l} {a}{d} {e}{n}{d} {a}{m}{a}{n} {a}{m}{m}{o}{ch}{a}{l} {i}{th} "
        "{a}{n}{i}{th} {a}{n}{t}{y}{d} {f}{u}{s} {v}{r}{oo}{m} {g}{e}{r} "
        "{e}{x}{oo}{d} {k}{a}{l}{p} {k}{a}{l}{l}{y}{n} {k}{a}{t}{a}{d} "
        "{m}{o}{u}{l} {m}{p}{a}{n} {m}{p}{a}{g}{y}{a}{t} {m}{p}{o}{l} "
        "{m}{p}{o}{s} {n}{y}{t} {x}{y}{k} {s}{u}{n}{o}{m}{i}{l} {p}{e}{t}{s} "
        "{p}{y}{t}{s} {p}{y}{k}{a}{n}{t} {p}{l}{y}{a}{t}{s} "
        "{p}{o}{s}{t}{e}{l}{n} {p}{r}{oo}{t}{o}{d} {s}{e}{r}{t} "
        "{s}{u}{n}{a}{d} {t}{s}{a}{m} {u}{p}{o}{d} {f}{y}{l}{o}{n} "
        "{f}{u}{l}{o}{d} {ch}{a}{s}"
    )):
        st.w += _x("{y}{k}")


def _step_5a(st):
    if st.w == _x("{a}{g}{a}{m}{e}"):
        st.w = _x("{a}{g}{a}{m}")
    _strip(st, _xs("{a}{g}{a}{m}{e} {i}{s}{a}{m}{e} {o}{u}{s}{a}{m}{e} "
                   "{i}{k}{a}{m}{e} {i}{th}{i}{k}{a}{m}{e}"))
    if not _strip(st, [_x("{a}{m}{e}")]):
        return
    if _equals_any(st.w, _xs(
        "{a}{n}{a}{p} {a}{p}{o}{th} {a}{p}{o}{k} {a}{p}{o}{s}{t} {v}{o}{u}{v} "
        "{x}{e}{th} {o}{u}{l} {p}{e}{th} {p}{y}{k}{r} {p}{o}{t} {s}{y}{ch} {ch}"
    )):
        st.w += _x("{a}{m}")


def _step_5b(st):
    if _strip(st, _xs(
        "{a}{g}{a}{n}{e} {i}{s}{a}{n}{e} {o}{u}{s}{a}{n}{e} {y}{o}{n}{t}{a}{n}{e} "
        "{y}{o}{t}{a}{n}{e} {y}{o}{u}{n}{t}{a}{n}{e} {o}{n}{t}{a}{n}{e} "
        "{o}{t}{a}{n}{e} {o}{u}{n}{t}{a}{n}{e} {i}{k}{a}{n}{e} {i}{th}{i}{k}{a}{n}{e}"
    )):
        if _equals_any(st.w, _xs("{t}{r} {t}{s}")):
            st.w += _x("{a}{g}{a}{n}")
    if not _strip(st, [_x("{a}{n}{e}")]):
        return
    if st.w[-1:] in _V2:
        st.w += _x("{a}{n}")
        return
    if _equals_any(st.w, _xs(
        "{v}{e}{t}{e}{r} {v}{o}{u}{l}{k} {v}{r}{a}{ch}{m} {g} {d}{r}{a}{d}{o}{u}{m} "
        "{th} {k}{a}{l}{p}{o}{u}{z} {k}{a}{s}{t}{e}{l} {k}{o}{r}{m}{o}{r} "
        "{l}{a}{o}{p}{l} {m}{oo}{a}{m}{e}{th} {m} {m}{o}{u}{s}{o}{u}{l}{m} {n} "
        "{o}{u}{l} {p} {p}{e}{l}{e}{k} {p}{l} {p}{o}{l}{y}{s} {p}{o}{r}{t}{o}{l} "
        "{s}{a}{r}{a}{k}{a}{t}{s} {s}{o}{u}{l}{t} {t}{s}{a}{r}{l}{a}{t} {o}{r}{f} "
        "{t}{s}{y}{g}{g} {t}{s}{o}{p} {f}{oo}{t}{o}{s}{t}{e}{f} {ch} "
        "{ps}{u}{ch}{o}{p}{l} {a}{g} {g}{a}{l} {g}{e}{r} {d}{e}{k} {d}{y}{p}{l} "
        "{a}{m}{e}{r}{y}{k}{a}{n} {o}{u}{r} {p}{y}{th} {p}{o}{u}{r}{y}{t} {s} "
        "{z}{oo}{n}{t} {y}{k} {k}{a}{s}{t} {k}{o}{p} {l}{y}{ch} "
        "{l}{o}{u}{th}{i}{r} {m}{a}{y}{n}{t} {m}{e}{l} {s}{y}{g} {s}{p} "
        "{s}{t}{e}{g} {t}{r}{a}{g} {t}{s}{a}{g} {f} {e}{r} {a}{d}{a}{p} "
        "{a}{th}{y}{g}{g} {a}{m}{i}{ch} {a}{n}{y}{k} {a}{n}{o}{r}{g} {a}{p}{i}{g} "
        "{a}{p}{y}{th} {a}{t}{s}{y}{g}{g} {v}{a}{s} {v}{a}{s}{k} "
        "{v}{a}{th}{u}{g}{a}{l} {v}{y}{o}{m}{i}{ch} {v}{r}{a}{ch}{u}{k} "
        "{d}{y}{a}{t} {d}{y}{a}{f} {e}{n}{o}{r}{g} {th}{u}{s} "
        "{k}{a}{p}{n}{o}{v}{y}{o}{m}{i}{ch} {k}{a}{t}{a}{g}{a}{l} {k}{l}{y}{v} "
        "{k}{o}{y}{l}{a}{r}{f} {l}{y}{v} {m}{e}{g}{l}{o}{v}{y}{o}{m}{i}{ch} "
        "{m}{y}{k}{r}{o}{v}{y}{o}{m}{i}{ch} {n}{t}{a}{v} {x}{i}{r}{o}{k}{l}{y}{v} "
        "{o}{l}{y}{g}{o}{d}{a}{m} {o}{l}{o}{g}{a}{l} {p}{e}{n}{t}{a}{r}{f} "
        "{p}{e}{r}{i}{f} {p}{e}{r}{y}{t}{r} {p}{l}{a}{t} {p}{o}{l}{u}{d}{a}{p} "
        "{p}{o}{l}{u}{m}{i}{ch} {s}{t}{e}{f} {t}{a}{v} {t}{e}{t} "
        "{u}{p}{e}{r}{i}{f} {u}{p}{o}{k}{o}{p} {ch}{a}{m}{i}{l}{o}{d}{a}{p} "
        "{ps}{i}{l}{o}{t}{a}{v}"
    )):
        st.w += _x("{a}{n}")


def _step_5c(st):
    _strip(st, [_x("{i}{s}{e}{t}{e}")])
    if not _strip(st, [_x("{e}{t}{e}")]):
        return
    if st.w[-1:] in _V2:
        st.w += _x("{e}{t}")
        return
    if _ends_any(st.w, _xs(
        "{o}{d} {a}{y}{r} {f}{o}{r} {t}{a}{th} {d}{y}{a}{th} {s}{ch} {e}{n}{d} "
        "{e}{u}{r} {t}{y}{th} {u}{p}{e}{r}{th} {r}{a}{th} {e}{n}{th} {r}{o}{th} "
        "{s}{th} {p}{u}{r} {a}{y}{n} {s}{u}{n}{d} {s}{u}{n} {s}{u}{n}{th} "
        "{ch}{oo}{r} {p}{o}{n} {v}{r} {k}{a}{th} {e}{u}{th} {e}{k}{th} {n}{e}{t} "
        "{r}{o}{n} {a}{r}{k} {v}{a}{r} {v}{o}{l} {oo}{f}{e}{l}"
    )):
        st.w += _x("{e}{t}")
        return
    if _equals_any(st.w, _xs(
        "{a}{v}{a}{r} {v}{e}{n} {e}{n}{a}{r} {a}{v}{r} {a}{d} {a}{th} {a}{n} "
        "{a}{p}{l} {v}{a}{r}{o}{n} {n}{t}{r} {s}{k} {k}{o}{p} {m}{p}{o}{r} "
        "{n}{y}{f} {p}{a}{g} {p}{a}{r}{a}{k}{a}{l} {s}{e}{r}{p} {s}{k}{e}{l} "
        "{s}{u}{r}{f} {t}{o}{k} {u} {d} {e}{m} {th}{a}{r}{r} {th}"
    )):
        st.w += _x("{e}{t}")


def _step_5d(st):
    if not _strip(st, _xs("{o}{n}{t}{a}{s} {oo}{n}{t}{a}{s}")):
        return
    if st.w == _x("{a}{r}{ch}"):
        st.w += _x("{o}{n}{t}")
    elif st.w.endswith(_x("{k}{r}{e}")):
        st.w += _x("{oo}{n}{t}")


def _step_5e(st):
    if not _strip(st, _xs("{o}{m}{a}{s}{t}{e} {y}{o}{m}{a}{s}{t}{e}")):
        return
    if st.w == _x("{o}{n}"):
        st.w += _x("{o}{m}{a}{s}{t}")


def _step_5f(st):
    if _strip(st, [_x("{y}{e}{s}{t}{e}")]):
        if _equals_any(st.w, _xs(
            "{p} {a}{p} {s}{u}{m}{p} {a}{s}{u}{m}{p} {a}{k}{a}{t}{a}{p} "
            "{a}{m}{e}{t}{a}{m}{f}"
        )):
            st.w += _x("{y}{e}{s}{t}")
    if not _strip(st, [_x("{e}{s}{t}{e}")]):
        return
    if _equals_any(st.w, _xs(
        "{a}{l} {a}{r} {e}{k}{t}{e}{l} {z} {m} {x} {p}{a}{r}{a}{k}{a}{l} "
        "{p}{r}{o} {n}{y}{s}"
    )):
        st.w += _x("{y}{e}{s}{t}")


def _step_5g(st):
    _strip(st, _xs("{i}{th}{i}{k}{a} {i}{th}{i}{k}{e}{s} {i}{th}{i}{k}{e}"))
    if not _strip(st, _xs("{i}{k}{a} {i}{k}{e}{s} {i}{k}{e}")):
        return
    if _ends_any(st.w, _xs(
        "{s}{k}{oo}{l} {s}{k}{o}{u}{l} {n}{a}{r}{th} {s}{f} {o}{th} {p}{y}{th}"
    )):
        st.w += _x("{i}{k}")
        return
    if _equals_any(st.w, _xs(
        "{d}{y}{a}{th} {th} {p}{a}{r}{a}{k}{a}{t}{a}{th} {p}{r}{o}{s}{th} "
        "{s}{u}{n}{th}"
    )):
        st.w += _x("{i}{k}")


def _step_5h(st):
    if not _strip(st, _xs("{o}{u}{s}{a} {o}{u}{s}{e}{s} {o}{u}{s}{e}")):
        return
    if _ends_any(st.w, _xs(
        "{p}{o}{d}{a}{r} {v}{l}{e}{p} {p}{a}{n}{t}{a}{ch} {f}{r}{u}{d} "
        "{m}{a}{n}{t}{y}{l} {m}{a}{l}{l} {k}{u}{m}{a}{t} {l}{a}{ch} {l}{i}{g} "
        "{f}{a}{g} {o}{m} {p}{r}{oo}{t}"
    )):
        st.w += _x("{o}{u}{s}")
        return
    if _equals_any(st.w, _xs(
        "{f}{a}{r}{m}{a}{k} {ch}{a}{d} {a}{g}{k} {a}{n}{a}{r}{r} {v}{r}{o}{m} "
        "{e}{k}{l}{y}{p} {l}{a}{m}{p}{y}{d} {l}{e}{ch} {m} {p}{a}{t} {r} {l} "
        "{m}{e}{d} {m}{e}{s}{a}{z} {u}{p}{o}{t}{e}{y}{n} {a}{m} {a}{y}{th} "
        "{a}{n}{i}{k} {d}{e}{s}{p}{o}{z} {e}{n}{d}{y}{a}{f}{e}{r} {d}{e} "
        "{d}{e}{u}{t}{e}{r}{e}{u} {k}{a}{th}{a}{r}{e}{u} {p}{l}{e} {t}{s}{a}"
    )):
        st.w += _x("{o}{u}{s}")


def _step_5i(st):
    if not _strip(st, _xs("{a}{g}{a} {a}{g}{e}{s} {a}{g}{e}")):
        return
    if st.w.endswith(_x("{k}{o}{l}{l}")):
        st.w += _x("{a}{g}")
        return
    blockers = _xs("{ps}{o}{f} {n}{a}{u}{l}{o}{ch}")
    for b in blockers:
        if st.w.endswith(b):
            return
    if _ends_any(st.w, _xs(
        "{o}{f} {p}{e}{l} {ch}{o}{r}{t} {l}{l} {s}{f} {r}{p} {f}{r} {p}{r} "
        "{l}{o}{ch} {s}{m}{i}{n}"
    )):
        st.w += _x("{a}{g}")
        return
    if _equals_any(st.w, _xs(
        "{a}{v}{a}{s}{t} {p}{o}{l}{u}{f} {a}{d}{i}{f} {p}{a}{m}{f} {r} {a}{s}{p} "
        "{a}{f} {a}{m}{a}{l} {a}{m}{a}{l}{l}{y} {a}{n}{u}{s}{t} {a}{p}{e}{r} "
        "{a}{s}{p}{a}{r} {a}{ch}{a}{r} {d}{e}{r}{v}{e}{n} {d}{r}{o}{s}{o}{p} "
        "{x}{e}{f} {n}{e}{o}{p} {n}{o}{m}{o}{t} {o}{l}{o}{p} {o}{m}{o}{t} "
        "{p}{r}{o}{s}{t} {p}{r}{o}{s}{oo}{p}{o}{p} {s}{u}{m}{p} {s}{u}{n}{t} {t} "
        "{u}{p}{o}{t} {ch}{a}{r} {a}{e}{y}{p} {a}{y}{m}{o}{s}{t} {a}{n}{u}{p} "
        "{a}{p}{o}{t} {a}{r}{t}{y}{p} {d}{y}{a}{t} {e}{n} {e}{p}{y}{t} "
        "{k}{r}{o}{k}{a}{l}{o}{p} {s}{y}{d}{i}{r}{o}{p} {l} {n}{a}{u} "
        "{o}{u}{l}{a}{m} {o}{u}{r} {p} {t}{r} {m}"
    )):
        st.w += _x("{a}{g}")


def _step_5j(st):
    if not _strip(st, _xs("{i}{s}{e} {i}{s}{o}{u} {i}{s}{a}")):
        return
    if _equals_any(st.w, _xs(
        "{n} {ch}{e}{r}{s}{o}{n} {d}{oo}{d}{e}{k}{a}{n} {e}{r}{i}{m}{o}{n} "
        "{m}{e}{g}{a}{l}{o}{n} {e}{p}{t}{a}{n}"
    )):
        st.w += _x("{i}{s}")


def _step_5k(st):
    if not _strip(st, [_x("{i}{s}{t}{e}")]):
        return
    if _equals_any(st.w, _xs(
        "{a}{s}{v} {s}{v} {a}{ch}{r} {ch}{r} {a}{p}{l} {a}{e}{y}{m}{n} "
        "{d}{u}{s}{ch}{r} {e}{u}{ch}{r} {k}{o}{y}{n}{o}{ch}{r} "
        "{p}{a}{l}{y}{m}{ps}"
    )):
        st.w += _x("{i}{s}{t}")


def _step_5l(st):
    if not _strip(st, _xs("{o}{u}{n}{e} {i}{s}{o}{u}{n}{e} {i}{th}{o}{u}{n}{e}")):
        return
    if _equals_any(st.w, _xs(
        "{n} {r} {s}{p}{y} {s}{t}{r}{a}{v}{o}{m}{o}{u}{t}{s} "
        "{k}{a}{k}{o}{m}{o}{u}{t}{s} {e}{x}{oo}{n}"
    )):
        st.w += _x("{o}{u}{n}")


def _step_5m(st):
    if not _strip(st, _xs("{o}{u}{m}{e} {i}{s}{o}{u}{m}{e} {i}{th}{o}{u}{m}{e}")):
        return
    if _equals_any(st.w, _xs(
        "{p}{a}{r}{a}{s}{o}{u}{s} {f} {ch} {oo}{r}{y}{o}{p}{l} {a}{z} "
        "{a}{l}{l}{o}{s}{o}{u}{s} {a}{s}{o}{u}{s}"
    )):
        st.w += _x("{o}{u}{m}")


_STEP6_SUFFIXES = sorted(_xs(
    "{a} {a}{g}{a}{t}{e} {a}{g}{a}{n} {a}{e}{y} {a}{m}{a}{y} {a}{n} {a}{s} "
    "{a}{s}{a}{y} {a}{t}{a}{y} {a}{oo} {e} {e}{y} {e}{y}{s} {e}{y}{t}{e} "
    "{e}{s}{a}{y} {e}{s} {e}{t}{a}{y} {y} {y}{e}{m}{a}{y} {y}{e}{m}{a}{s}{t}{e} "
    "{y}{e}{t}{a}{y} {y}{e}{s}{a}{y} {y}{e}{s}{a}{s}{t}{e} {y}{o}{m}{a}{s}{t}{a}{n} "
    "{y}{o}{m}{o}{u}{n} {y}{o}{m}{o}{u}{n}{a} {y}{o}{n}{t}{a}{n} "
    "{y}{o}{n}{t}{o}{u}{s}{a}{n} {y}{o}{s}{a}{s}{t}{a}{n} {y}{o}{s}{a}{s}{t}{e} "
    "{y}{o}{s}{o}{u}{n} {y}{o}{s}{o}{u}{n}{a} {y}{o}{t}{a}{n} {y}{o}{u}{m}{a} "
    "{y}{o}{u}{m}{a}{s}{t}{e} {y}{o}{u}{n}{t}{a}{y} {y}{o}{u}{n}{t}{a}{n} {i} "
    "{i}{d}{e}{s} {i}{d}{oo}{n} {i}{th}{e}{y} {i}{th}{e}{y}{s} {i}{th}{e}{y}{t}{e} "
    "{i}{th}{i}{k}{a}{t}{e} {i}{th}{i}{k}{a}{n} {i}{th}{o}{u}{n} {i}{th}{oo} "
    "{i}{k}{a}{t}{e} {i}{k}{a}{n} {i}{s} {i}{s}{a}{n} {i}{s}{a}{t}{e} "
    "{i}{s}{e}{y} {i}{s}{e}{s} {i}{s}{o}{u}{n} {i}{s}{oo} {o} {o}{y} {o}{m}{a}{y} "
    "{o}{m}{a}{s}{t}{a}{n} {o}{m}{o}{u}{n} {o}{m}{o}{u}{n}{a} {o}{n}{t}{a}{y} "
    "{o}{n}{t}{a}{n} {o}{n}{t}{o}{u}{s}{a}{n} {o}{s} {o}{s}{a}{s}{t}{a}{n} "
    "{o}{s}{a}{s}{t}{e} {o}{s}{o}{u}{n} {o}{s}{o}{u}{n}{a} {o}{t}{a}{n} {o}{u} "
    "{o}{u}{m}{a}{y} {o}{u}{m}{a}{s}{t}{e} {o}{u}{n} {o}{u}{n}{t}{a}{y} "
    "{o}{u}{n}{t}{a}{n} {o}{u}{s} {o}{u}{s}{a}{n} {o}{u}{s}{a}{t}{e} {u} {u}{s} "
    "{oo} {oo}{n}"
), key=len, reverse=True)


def _step_6(st):
    for s, rep in sorted([
        (_x("{m}{a}{t}{a}"), _x("{m}{a}")),
        (_x("{m}{a}{t}{oo}{n}"), _x("{m}{a}")),
        (_x("{m}{a}{t}{o}{s}"), _x("{m}{a}")),
    ], key=lambda kv: -len(kv[0])):
        if st.w.endswith(s):
            st.w = st.w[: len(st.w) - len(s)] + rep
            break
    if not st.test1:
        return
    for s in _STEP6_SUFFIXES:
        if st.w.endswith(s):
            st.w = st.w[: len(st.w) - len(s)]
            return


def _step_7(st):
    for s in sorted(_xs(
        "{e}{s}{t}{e}{r} {e}{s}{t}{a}{t} {o}{t}{e}{r} {o}{t}{a}{t} {u}{t}{e}{r} "
        "{u}{t}{a}{t} {oo}{t}{e}{r} {oo}{t}{a}{t}"
    ), key=len, reverse=True):
        if st.w.endswith(s):
            st.w = st.w[: len(st.w) - len(s)]
            return


def stem_greek(word: str) -> str:
    word = "".join(_LOWER.get(ch, ch) for ch in word)
    if len(word) < 3:
        return word
    st = _St(word)
    _step_1(st)
    for fn in (_step_s1, _step_s2, _step_s3, _step_s4, _step_s5, _step_s6,
               _step_s7, _step_s8, _step_s9, _step_s10, _step_2a, _step_2b,
               _step_2c, _step_2d, _step_3, _step_4, _step_5a, _step_5b,
               _step_5c, _step_5d, _step_5e, _step_5f, _step_5g, _step_5h,
               _step_5j, _step_5i, _step_5k, _step_5l, _step_5m, _step_6,
               _step_7):
        fn(st)
    return st.w
