"""Snowball Romanian stemmer — pure-Python port of
xapian-core/languages/algorithms/romanian.sbl; golden-validated against
xapian-data/stemming/romanian/.
"""

from __future__ import annotations

_V = frozenset("aeiouâîă")

_STEP0 = sorted(
    [
        ("ului", ("del",)), ("ul", ("del",)),
        ("aua", ("repl", "a")),
        ("elor", ("repl", "e")), ("ele", ("repl", "e")), ("ea", ("repl", "e")),
        ("iilor", ("repl", "i")), ("iile", ("repl", "i")), ("iei", ("repl", "i")),
        ("iua", ("repl", "i")), ("ilor", ("repl", "i")), ("ii", ("repl", "i")),
        ("ile", ("ile",)),
        ("atei", ("repl", "at")),
        ("ație", ("repl", "ați")), ("ația", ("repl", "ați")),
    ],
    key=lambda kv: -len(kv[0]),
)

_COMBO = sorted(
    [(s, "abil") for s in ("abilitate", "abilitati", "abilități", "abilităi")]
    + [("ibilitate", "ibil")]
    + [(s, "iv") for s in ("ivitate", "ivitati", "ivităi", "ivități")]
    + [(s, "ic") for s in (
        "icitate icitati icităi icități icator icatori "
        "iciv iciva icive icivi icivă ical icala icale icali icală"
    ).split()]
    + [(s, "at") for s in (
        "ativ ativa ative ativi ativă ațiune atoare ator atori "
        "ătoare ător ători"
    ).split()]
    + [(s, "it") for s in (
        "itiv itiva itive itivi itivă ițiune itoare itor itori"
    ).split()],
    key=lambda kv: -len(kv[0]),
)

_STD_DEL = (
    "at ata ată ati ate ut uta ută uti ute it ita ită iti ite "
    "ic ica ice ici ică abil abila abile abili abilă "
    "ibil ibila ibile ibili ibilă oasa oasă oase os osi oși "
    "ant anta ante anti antă ator atori itate itati ităi ități "
    "iv iva ive ivi ivă"
).split()
_STD_IST = "ism isme ist ista iste isti istă iști".split()

_STD = sorted(
    [(s, "del") for s in _STD_DEL]
    + [("iune", "iune"), ("iuni", "iune")]
    + [(s, "ist") for s in _STD_IST],
    key=lambda kv: -len(kv[0]),
)

_VERB_NONV_U = (
    "are ere ire âre ind ând indu ându eze ească ez ezi ează esc "
    "ești ește ăsc ăști ăște am ai au eam eai ea eați eau iam iai "
    "ia iați iau ui ași arăm arăți ară uși urăm urăți ură iși irăm "
    "irăți iră âi âși ârăm ârăți âră asem aseși ase aserăm aserăți "
    "aseră isem iseși ise iserăm iserăți iseră âsem âseși âse "
    "âserăm âserăți âseră usem useși use userăm userăți useră"
).split()
_VERB_DEL = (
    "ăm ați em eți im iți âm âți seși serăm serăți seră sei se "
    "sesem seseși sese seserăm seserăți seseră"
).split()

_VERB = sorted(
    [(s, "nv_u") for s in _VERB_NONV_U] + [(s, "del") for s in _VERB_DEL],
    key=lambda kv: -len(kv[0]),
)


def _norm_prelude(word: str) -> str:
    word = word.replace("ş", "ș").replace("ţ", "ț")
    chars = list(word)
    n = len(chars)
    i = 0
    while i + 2 < n + 0:
        if chars[i] in _V and chars[i + 1] in ("u", "i") and i + 2 < n and chars[i + 2] in _V:
            chars[i + 1] = chars[i + 1].upper()
            i += 2
        else:
            i += 1
    return "".join(chars)


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


def stem_romanian(word: str) -> str:
    word = _norm_prelude(word)
    pV, p1, p2 = _mark_regions(word)

    # step_0 (R1, commit)
    n = len(word)
    for s, act in _STEP0:
        if word.endswith(s):
            cut = n - len(s)
            if cut >= p1:
                if act[0] == "del":
                    word = word[:cut]
                elif act[0] == "ile":
                    if not word[:cut].endswith("ab"):
                        word = word[:cut] + "i"
                else:
                    word = word[:cut] + act[1]
            break

    # standard_suffix: repeat combo_suffix, then the R2 among
    flag = False
    while True:
        n = len(word)
        hit = False
        for s, rep in _COMBO:
            if word.endswith(s):
                cut = n - len(s)
                if cut >= p1:
                    word = word[:cut] + rep
                    flag = True
                    hit = True
                break
        if not hit:
            break
    n = len(word)
    for s, act in _STD:
        if word.endswith(s):
            cut = n - len(s)
            if cut >= p2:
                if act == "del":
                    word = word[:cut]
                    flag = True
                elif act == "iune":
                    if word[:cut].endswith("ț"):
                        word = word[: cut - 1] + "t"
                        flag = True
                else:  # 'ist'
                    word = word[:cut] + "ist"
                    flag = True
            break

    # verb_suffix only if no standard suffix was removed
    if not flag:
        n = len(word)
        region = word[pV:] if pV < n else ""
        for s, act in _VERB:
            if region.endswith(s):
                cut = n - len(s)
                if act == "nv_u":
                    # (non-v or 'u') delete — within the pV limit
                    if cut - 1 >= pV and (
                        word[cut - 1] not in _V or word[cut - 1] == "u"
                    ):
                        word = word[:cut]
                else:
                    word = word[:cut]
                break

    # vowel_suffix (RV)
    n = len(word)
    for s in ("ie", "a", "e", "i", "ă"):
        if word.endswith(s):
            cut = n - len(s)
            if cut >= pV:
                word = word[:cut]
            break

    return word.replace("I", "i").replace("U", "u")
