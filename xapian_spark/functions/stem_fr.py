"""Snowball French stemmer — pure-Python port of
xapian-core/languages/algorithms/french.sbl; golden-validated against
xapian-data/stemming/french/ in tests/test_stemmer.py.

Notable Snowball semantics honored here (see stem_pt/stem_eu notes too):
- ``fail(C)`` branches in standard_suffix (amment/emment/ment/ments) modify
  the word and then FAIL the routine, so the verb-suffix routines run on
  the modified word;
- ``and`` restores the cursor as distance-from-end, so the Y/ç fixup after
  a successful suffix routine applies at the end of the current word;
- processing runs on the prelude-marked form (U/I/Y consonant markers,
  ë → 'He', ï → 'Hi', qu → 'qU').
"""

from __future__ import annotations

_V = frozenset("aeiouyâàëéêèïîôûù")
_ELISION = frozenset("cdjlmnst")
_OUX = frozenset("bhjlnp")
_KEEP_WITH_S = frozenset("aiouès")

_STD_R2_DEL = (
    "ance iqUe isme able iste eux ances iqUes ismes ables istes"
).split()
_ATEUR = "atrice ateur ation atrices ateurs ations".split()

_I_VERB = sorted(
    (
        "îmes ît îtes i ie ies ir ira irai iraIent irais irait iras irent "
        "irez iriez irions irons iront is issaIent issais issait issant "
        "issante issantes issants isse issent isses issez issiez issions "
        "issons it"
    ).split(),
    key=len,
    reverse=True,
)

_VERB_DEL = (
    "é ée ées és èrent er era erai eraIent erais erait eras erez eriez "
    "erions erons eront ez iez"
).split()
_VERB_E = (
    "âmes ât âtes a ai aIent ait ant ante antes ants as asse assent "
    "asses assiez assions"
).split()

_VERB = sorted(
    [("ions", "ions")]
    + [(s, "del") for s in _VERB_DEL]
    + [(s, "try_e") for s in _VERB_E]
    + [(s, "ais") for s in ("ais", "aise", "aises")]
    + [("eais", "del")],
    key=lambda kv: -len(kv[0]),
)


def _elisions(word: str) -> str:
    if len(word) > 2 and word[1] == "'" and word[0] in _ELISION:
        return word[2:]
    if len(word) > 3 and word[:2] == "qu" and word[2] == "'":
        return word[3:]
    return word


def _prelude(word: str) -> str:
    chars = list(word)
    i = 0
    out = []
    n = len(chars)
    while i < n:
        c = chars[i]
        if c in _V and i + 1 < n:
            nxt = chars[i + 1]
            if nxt == "u" and i + 2 < n and chars[i + 2] in _V:
                out.append(c)
                out.append("U")
                i += 2
                continue
            if nxt == "i" and i + 2 < n and chars[i + 2] in _V:
                out.append(c)
                out.append("I")
                i += 2
                continue
            if nxt == "y":
                out.append(c)
                out.append("Y")
                i += 2
                continue
        if c == "ë":
            out.append("He")
            i += 1
            continue
        if c == "ï":
            out.append("Hi")
            i += 1
            continue
        if c == "y" and i + 1 < n and chars[i + 1] in _V:
            out.append("Y")
            i += 1
            continue
        if c == "q" and i + 1 < n and chars[i + 1] == "u":
            out.append("q")
            out.append("U")
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _mark_regions(word: str) -> tuple[int, int, int]:
    n = len(word)
    pV = p1 = p2 = n
    if n >= 3 and word[0] in _V and word[1] in _V:
        pV = 3
    elif word.startswith(("par", "col", "tap")):
        pV = 3
    elif word.startswith("ni") and n >= 3 and word[2] in _V:
        pV = 3
    else:
        j = 1
        while j < n and word[j] not in _V:
            j += 1
        if j < n:
            pV = j + 1

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


_STD = sorted(
    [(s, "r2_del") for s in _STD_R2_DEL]
    + [(s, "ateur") for s in _ATEUR]
    + [("logie", "log"), ("logies", "log")]
    + [(s, "u") for s in ("usion", "ution", "usions", "utions")]
    + [("ence", "ent"), ("ences", "ent")]
    + [("ement", "ement"), ("ements", "ement")]
    + [("ité", "ite"), ("ités", "ite")]
    + [(s, "if") for s in ("if", "ive", "ifs", "ives")]
    + [("eaux", "eaux"), ("aux", "aux"), ("oux", "oux")]
    + [("euse", "euse"), ("euses", "euse")]
    + [("issement", "issement"), ("issements", "issement")]
    + [("amment", "amment"), ("emment", "emment")]
    + [("ment", "ment"), ("ments", "ment")],
    key=lambda kv: -len(kv[0]),
)


def _standard_suffix(word: str, pV: int, p1: int, p2: int):
    """Returns (word, ok) — ok False means the routine FAILED (possibly
    after modifying the word via a fail() branch)."""
    n = len(word)

    def r2(cut):
        return cut >= p2

    for s, act in _STD:
        if not word.endswith(s):
            continue
        cut = n - len(s)
        if act == "r2_del":
            return (word[:cut], True) if r2(cut) else (word, False)
        if act == "ateur":
            if not r2(cut):
                return word, False
            w = word[:cut]
            if w.endswith("ic"):
                if r2(len(w) - 2):
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
            return w, True
        if act in ("log", "u", "ent"):
            return (word[:cut] + act, True) if r2(cut) else (word, False)
        if act == "ement":
            if cut < pV:
                return word, False
            w = word[:cut]
            if w.endswith("iv") and r2(len(w) - 2):
                w = w[:-2]
                if w.endswith("at") and r2(len(w) - 2):
                    w = w[:-2]
            elif w.endswith("eus"):
                if r2(len(w) - 3):
                    w = w[:-3]
                elif len(w) - 3 >= p1:
                    w = w[:-3] + "eux"
            elif w.endswith("abl") and r2(len(w) - 3):
                w = w[:-3]
            elif w.endswith("iqU") and r2(len(w) - 3):
                w = w[:-3]
            elif w.endswith(("ièr", "Ièr")) and len(w) - 3 >= pV:
                w = w[:-3] + "i"
            return w, True
        if act == "ite":
            if not r2(cut):
                return word, False
            w = word[:cut]
            if w.endswith("abil"):
                if r2(len(w) - 4):
                    w = w[:-4]
                else:
                    w = w[:-4] + "abl"
            elif w.endswith("ic"):
                if r2(len(w) - 2):
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
            elif w.endswith("iv") and r2(len(w) - 2):
                w = w[:-2]
            return w, True
        if act == "if":
            if not r2(cut):
                return word, False
            w = word[:cut]
            if w.endswith("at") and r2(len(w) - 2):
                w = w[:-2]
                if w.endswith("ic"):
                    if r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
            return w, True
        if act == "eaux":
            return word[:cut] + "eau", True
        if act == "aux":
            return (word[:cut] + "al", True) if cut >= p1 else (word, False)
        if act == "oux":
            if cut >= 1 and word[cut - 1] in _OUX:
                return word[:cut] + "ou", True
            return word, False
        if act == "euse":
            if r2(cut):
                return word[:cut], True
            if cut >= p1:
                return word[:cut] + "eux", True
            return word, False
        if act == "issement":
            if cut >= p1 and cut >= 1 and word[cut - 1] not in _V:
                return word[:cut], True
            return word, False
        if act == "amment":
            if cut >= pV:
                return word[:cut] + "ant", False  # fail(<- 'ant')
            return word, False
        if act == "emment":
            if cut >= pV:
                return word[:cut] + "ent", False  # fail(<- 'ent')
            return word, False
        # 'ment'/'ments': test(v RV) fail(delete)
        if cut >= 1 and word[cut - 1] in _V and cut - 1 >= pV:
            return word[:cut], False  # fail(delete)
        return word, False
    return word, False


def _i_verb_suffix(word: str, pV: int):
    n = len(word)
    region = word[pV:] if pV < n else ""
    for s in _I_VERB:
        if region.endswith(s):
            cut = n - len(s)
            # not 'H' non-v — and the whole routine (condition included) is
            # inside `setlimit tomark pV for (...)`, so the lookbehind char
            # must itself lie within RV.  This is exactly what the
            # par/col/tap/audit RV exceptions rely on.
            if (
                cut - 1 >= pV
                and word[cut - 1] != "H"
                and word[cut - 1] not in _V
            ):
                return word[:cut]
            return None
    return None


def _verb_suffix(word: str, pV: int, p2: int):
    n = len(word)
    region = word[pV:] if pV < n else ""
    for s, act in _VERB:
        if region.endswith(s):
            cut = n - len(s)
            if act == "ions":
                return word[:cut] if cut >= p2 else None
            if act == "del":
                return word[:cut]
            if act == "try_e":
                # try('e' RV]): extend the deletion over a preceding 'e'
                if cut >= 1 and word[cut - 1] == "e" and cut - 1 >= pV:
                    cut -= 1
                return word[:cut]
            # 'ais' group: blocked by the not-among exception list
            head = word[:cut]
            if head.endswith("auv") or head.endswith("épl"):
                return None
            if head.endswith("al") and len(head) == 3:
                # 'al' (next atlimit): exactly one char before 'al'
                return None
            return word[:cut]
    return None


def _residual_suffix(word: str, pV: int, p2: int) -> str:
    # try(['s'] test('Hi' or non-keep_with_s) delete)
    n = len(word)
    if word.endswith("s") and n >= 2:
        prev = word[n - 2]
        if word[: n - 1].endswith("Hi") or prev not in _KEEP_WITH_S:
            word = word[: n - 1]
    n = len(word)
    region = word[pV:] if pV < n else ""
    for s in ("ière", "Ière", "ion", "ier", "Ier", "e"):
        if region.endswith(s):
            cut = n - len(s)
            if s == "ion":
                # the s/t lookbehind is inside the setlimit scope too
                if cut >= p2 and cut - 1 >= pV and word[cut - 1] in "st":
                    return word[:cut]
                return word
            if s == "e":
                return word[:cut]
            return word[:cut] + "i"
    return word


def _un_double(word: str) -> str:
    if word.endswith(("enn", "onn", "ett", "ell", "eill")):
        return word[:-1]
    return word


def _un_accent(word: str) -> str:
    n = len(word)
    i = n
    while i >= 1 and word[i - 1] not in _V:
        i -= 1
    if i == n:  # atleast 1 non-v failed
        return word
    if i >= 1 and word[i - 1] in ("é", "è"):
        return word[: i - 1] + "e" + word[i:]
    return word


def _postlude(word: str) -> str:
    return (
        word.replace("He", "ë")
        .replace("Hi", "ï")
        .replace("H", "")
        .replace("I", "i")
        .replace("U", "u")
        .replace("Y", "y")
    )


def stem_french(word: str) -> str:
    word = _elisions(word)
    word = _prelude(word)
    pV, p1, p2 = _mark_regions(word)

    w, ok = _standard_suffix(word, pV, p1, p2)
    word = w
    if not ok:
        r = _i_verb_suffix(word, pV)
        if r is None:
            r = _verb_suffix(word, pV, p2)
        if r is not None:
            word = r
            ok = True
    if ok:
        # and try(['Y'] <- 'i' or ['ç'] <- 'c') at the end of the word
        if word.endswith("Y"):
            word = word[:-1] + "i"
        elif word.endswith("ç"):
            word = word[:-1] + "c"
    else:
        word = _residual_suffix(word, pV, p2)

    word = _un_double(word)
    word = _un_accent(word)
    return _postlude(word)
