"""Snowball Spanish stemmer — pure-Python port of
xapian-core/languages/algorithms/spanish.sbl; golden-validated against
xapian-data/stemming/spanish/ in tests/test_stemmer.py.
"""

from __future__ import annotations

_V = frozenset("aeiouáéíóúü")

_PRON = sorted(
    "me se sela selo selas selos la le lo las les los nos".split(),
    key=len,
    reverse=True,
)

# second among of attached_pronoun: (stem-suffix, action)
_PRON_PRE = sorted(
    [
        ("iéndo", ("resuffix", "iendo")),
        ("ándo", ("resuffix", "ando")),
        ("ár", ("resuffix", "ar")),
        ("ér", ("resuffix", "er")),
        ("ír", ("resuffix", "ir")),
        ("ando", ("del",)),
        ("iendo", ("del",)),
        ("ar", ("del",)),
        ("er", ("del",)),
        ("ir", ("del",)),
        ("yendo", ("u_del",)),
    ],
    key=lambda kv: -len(kv[0]),
)

_STD_R2 = (
    "anza anzas ico ica icos icas ismo ismos able ables ible ibles ista "
    "istas oso osa osos osas amiento amientos imiento imientos"
).split()
_STD_ADOR = (
    "adora ador ación adoras adores aciones ante antes ancia ancias acion"
).split()

_STD = sorted(
    [(s, "r2_del") for s in _STD_R2]
    + [(s, "ador") for s in _STD_ADOR]
    + [("logía", "log"), ("logías", "log")]
    + [("ución", "u"), ("uciones", "u"), ("ucion", "u")]
    + [("encia", "ente"), ("encias", "ente")]
    + [("amente", "amente"), ("mente", "mente")]
    + [("idad", "idad"), ("idades", "idad")]
    + [(s, "ivo") for s in ("iva", "ivo", "ivas", "ivos")],
    key=lambda kv: -len(kv[0]),
)

_Y_VERB = sorted(
    "ya ye yan yen yeron yendo yo yó yas yes yais yamos".split(),
    key=len,
    reverse=True,
)

_VERB_GU = ("éis", "emos", "en", "es")
_VERB_DEL = (
    "arían arías arán arás aríais aría aréis aríamos aremos ará aré "
    "erían erías erán erás eríais ería eréis eríamos eremos erá eré "
    "irían irías irán irás iríais iría iréis iríamos iremos irá iré "
    "aba ada ida ía ara iera ad ed id ase iese aste iste an aban ían "
    "aran ieran asen iesen aron ieron ado ido ando iendo ió ar er ir as "
    "abas adas idas ías aras ieras ases ieses ís áis abais íais arais "
    "ierais aseis ieseis asteis isteis ados idos amos ábamos íamos imos "
    "áramos iéramos iésemos ásemos"
).split()
_VERB = sorted(
    [(s, "gu") for s in _VERB_GU] + [(s, "del") for s in _VERB_DEL],
    key=lambda kv: -len(kv[0]),
)

_POSTLUDE = str.maketrans({"á": "a", "é": "e", "í": "i", "ó": "o", "ú": "u"})


def _mark_regions(word: str) -> tuple[int, int, int]:
    n = len(word)
    pV = p1 = p2 = n
    if n > 1:
        if word[0] in _V:
            if word[1] not in _V:
                j = 2
                while j < n and word[j] not in _V:
                    j += 1
                if j < n:
                    pV = j + 1
            else:
                j = 2
                while j < n and word[j] in _V:
                    j += 1
                if j < n:
                    pV = j + 1
        else:
            if word[1] not in _V:
                j = 2
                while j < n and word[j] not in _V:
                    j += 1
                if j < n:
                    pV = j + 1
            elif n > 2:
                pV = 3

    def next_region(start: int) -> int:
        i = start
        while i < n and word[i] not in _V:
            i += 1
        if i >= n:
            return n
        i += 1
        while i < n and word[i] in _V:
            i += 1
        if i >= n:
            return n
        return i + 1

    p1 = next_region(0)
    p2 = next_region(p1)
    return pV, p1, p2


def _attached_pronoun(word: str, pV: int) -> str:
    for p in _PRON:
        if not word.endswith(p):
            continue
        cut = len(word) - len(p)
        head = word[:cut]
        for pre, act in _PRON_PRE:
            if head.endswith(pre):
                start = cut - len(pre)
                if start < pV:
                    return word  # RV fails → routine fails
                if act[0] == "resuffix":
                    return head[: len(head) - len(pre)] + act[1]
                if act[0] == "u_del":
                    if head[: len(head) - len(pre)].endswith("u"):
                        return head
                    return word
                return head  # plain pronoun delete
            # among commits to longest — but here entries are distinct
        return word
    return word


def _standard_suffix(word: str, pV: int, p1: int, p2: int):
    n = len(word)

    def r2(cut):
        return cut >= p2

    for s, act in _STD:
        if not word.endswith(s):
            continue
        cut = n - len(s)
        if act == "r2_del":
            return word[:cut] if r2(cut) else None
        if act == "ador":
            if not r2(cut):
                return None
            w = word[:cut]
            if w.endswith("ic") and r2(len(w) - 2):
                w = w[:-2]
            return w
        if act in ("log", "u", "ente"):
            return word[:cut] + act if r2(cut) else None
        if act == "amente":
            if cut < p1:
                return None
            w = word[:cut]
            for t in ("iv", "os", "ic", "ad"):
                if w.endswith(t) and r2(len(w) - len(t)):
                    w = w[: len(w) - len(t)]
                    if t == "iv" and w.endswith("at") and r2(len(w) - 2):
                        w = w[:-2]
                    break
            return w
        if act == "mente":
            if not r2(cut):
                return None
            w = word[:cut]
            for t in ("ante", "able", "ible"):
                if w.endswith(t) and r2(len(w) - len(t)):
                    w = w[: len(w) - len(t)]
                    break
            return w
        if act == "idad":
            if not r2(cut):
                return None
            w = word[:cut]
            for t in ("abil", "ic", "iv"):
                if w.endswith(t):
                    if r2(len(w) - len(t)):
                        w = w[: len(w) - len(t)]
                    break
            return w
        # 'ivo' group
        if not r2(cut):
            return None
        w = word[:cut]
        if w.endswith("at") and r2(len(w) - 2):
            w = w[:-2]
        return w
    return None


def _y_verb_suffix(word: str, pV: int):
    n = len(word)
    region = word[pV:] if pV < n else ""
    for s in _Y_VERB:
        if region.endswith(s):
            cut = n - len(s)
            if word[:cut].endswith("u"):
                return word[:cut]
            return None  # matched but 'u' precondition fails
    return None


def _verb_suffix(word: str, pV: int):
    n = len(word)
    region = word[pV:] if pV < n else ""
    for s, act in _VERB:
        if region.endswith(s):
            cut = n - len(s)
            if act == "gu":
                # try('u' test 'g') ] delete — a preceding gu loses the u
                if cut >= 2 and word[cut - 1] == "u" and word[cut - 2] == "g":
                    cut -= 1
                return word[:cut]
            return word[:cut]
    return None


def _residual_suffix(word: str, pV: int) -> str:
    n = len(word)
    for s in ("os", "a", "o", "á", "í", "ó"):
        if word.endswith(s):
            cut = n - len(s)
            if cut >= pV:
                return word[:cut]
            return word
    for s in ("e", "é"):
        if word.endswith(s):
            cut = n - 1
            if cut >= pV:
                word = word[:cut]
                if (
                    word.endswith("u")
                    and len(word) >= 2
                    and word[-2] == "g"
                    and len(word) - 1 >= pV
                ):
                    word = word[:-1]
            return word
    return word


def stem_spanish(word: str) -> str:
    pV, p1, p2 = _mark_regions(word)
    word = _attached_pronoun(word, pV)
    r = _standard_suffix(word, pV, p1, p2)
    if r is None:
        r = _y_verb_suffix(word, pV)
    if r is None:
        r = _verb_suffix(word, pV)
    if r is not None:
        word = r
    word = _residual_suffix(word, pV)
    return word.translate(_POSTLUDE)
