"""Snowball Lithuanian stemmer — pure-Python port of
xapian-core/languages/algorithms/lithuanian.sbl; golden-validated against
xapian-data/stemming/lithuanian/.
"""

from __future__ import annotations

_V = frozenset("aeiyouąęįųėū")

_STEP1 = sorted((
    "as ias is ys o io ui iui ą ią į u iu e yje y au i an ai iai ų ių "
    "ams am iams iam us ius ais iais uose iuose uos iuos uosna iuosna "
    "ysna asis aisi osi ųsi uisi ąsi usi esi uo a ia os ios oj oje ioje "
    "osna iosna om oms ioms omis iomis ose iose on ion ė ės ei ę ėj ėje "
    "ėms es ėmis ėse ėsna ėn aus iaus umi iumi uje iuje iau ūs ums umis "
    "un iun ies ens enio eniui enį imi eniu enyje ie enie enys ims "
    "enims enis imis enimis yse enyse iem iems ame iame uosi iuosi iesi "
    "asi iasi amės iamės at ate iat iate atės iatės isi im imės it ite "
    "ome ot ote ėjo ėjosi otės eisi ėsi ėm ėme ėmės ėt ėte ėtės ausi "
    "omės siu siuosi si siesi s ysis sim sime sit site čiau čiausi tum "
    "tumei tumeis tumeisi tųsi tumėm tumėme tumėmės tute tumėt tumėte "
    "tumėtės k ki kimės uoti iuoti auti iauti oti ioti ėti yti inti "
    "inėti enti telėti terėti ti ąs iąs įs tųs simės sitės kite"
).split(), key=len, reverse=True)

_STEP2 = sorted((
    "ing išk ėt ot uot iuot yt iuk iul ėl yl učiuk uliuk utėlait ok iok "
    "sv šv zgan op iop ain ykšt ykšč esn aus iaus ias oj ioj aj iaj ąj "
    "iąj uoj iuoj iej ųj iųj ies uos iuos ais iais os ios ąs iąs dav "
    "ant iant int ėj ę ėję ęs siant dam auj jam iau am"
).split(), key=len, reverse=True)

_FIX_CONFLICTS = sorted([
    ("aitės", "aitė"), ("aite", "aitė"),
    ("uotės", "uotė"), ("uote", "uotė"),
    ("ėjime", "ėjimas"),
    ("esiu", "esys"), ("asius", "asys"),
    ("avime", "avimas"), ("ojime", "ojimas"),
    ("okatės", "okatė"), ("okate", "okatė"),
], key=lambda kv: -len(kv[0]))

_FIX_CHDZ = (("dž", "d"), ("č", "t"))


def _mark_p1(word: str) -> int:
    n = len(word)
    start = 1 if (word.startswith("a") and n > 6) else 0
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


def _del_step(word: str, p1: int, table) -> str:
    n = len(word)
    region = word[p1:] if p1 < n else ""
    for s in table:
        if region.endswith(s):
            return word[: n - len(s)]
    return word


def _fix_chdz(word: str) -> str:
    for s, rep in _FIX_CHDZ:
        if word.endswith(s):
            return word[: len(word) - len(s)] + rep
    return word


def stem_lithuanian(word: str) -> str:
    p1 = _mark_p1(word)
    # fix_conflicts
    n = len(word)
    for s, rep in _FIX_CONFLICTS:
        if word.endswith(s):
            word = word[: n - len(s)] + rep
            break
    word = _del_step(word, p1, _STEP1)
    word = _fix_chdz(word)
    # step2 repeated
    while True:
        w2 = _del_step(word, p1, _STEP2)
        if w2 == word:
            break
        word = w2
    word = _fix_chdz(word)
    if word.endswith("gd"):
        word = word[:-1]
    return word
