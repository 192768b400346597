"""Snowball Nepali stemmer — pure-Python port of
xapian-core/languages/algorithms/nepali.sbl; golden-validated against
xapian-data/stemming/nepali/.

Suffix tables are transcribed in the .sbl's {stringdef} notation and
expanded programmatically to Devanagari, avoiding copy errors.
"""

from __future__ import annotations

import re

_DEFS = {
    "dsc": "ँ", "dsa": "ं", "dli": "इ", "dlii": "ई",
    "dle": "ए", "dlka": "क", "dlkha": "ख", "dlg": "ग",
    "dlc": "छ", "dlta": "त", "dltha": "थ", "dld": "द",
    "dln": "न", "dlpa": "प", "dlpha": "फ", "dlb": "भ",
    "dlm": "म", "dly": "य", "dlr": "र", "dll": "ल",
    "dlv": "व", "dls": "स", "dlh": "ह", "dvsaa": "ा",
    "dvsi": "ि", "dvsii": "ी", "dvsu": "ु",
    "dvsuu": "ू", "dvse": "े", "dvsai": "ै",
    "dvso": "ो", "dvsau": "ौ", "dsv": "्",
}


def _x(pattern: str) -> str:
    return re.sub(r"\{(\w+)\}", lambda m: _DEFS[m.group(1)], pattern)


_CAT1_DEL = [_x(p) for p in (
    "{dlm}{dvsaa}{dlr}{dsv}{dlpha}{dlta}",
    "{dld}{dsv}{dlv}{dvsaa}{dlr}{dvsaa}",
    "{dls}{dsc}{dlg}{dvsai}",
    "{dls}{dsa}{dlg}",
    "{dls}{dsc}{dlg}",
    "{dll}{dvsaa}{dli}",
    "{dll}{dvsaa}{dlii}",
    "{dlpa}{dlc}{dvsi}",
    "{dll}{dvse}",
    "{dlr}{dlta}",
    "{dlm}{dvsai}",
    "{dlm}{dvsaa}",
)]
_CAT1_COND = [_x(p) for p in (
    "{dlka}{dvso}", "{dlka}{dvsaa}", "{dlka}{dvsi}",
    "{dlka}{dvsii}", "{dlka}{dvsai}",
)]
_E_LETTER = _x("{dle}")
_E_SIGN = _x("{dvse}")

_CAT2_NASAL = (_x("{dsc}"), _x("{dsa}"))
_CAT2_NASAL_PRE = [_x(p) for p in (
    "{dly}{dvsau}", "{dlc}{dvsau}", "{dln}{dvsau}", "{dltha}{dvse}",
)]
_CAT2_AI = _x("{dvsai}")
_CAT2_AI_PRE = _x("{dlta}{dsv}{dlr}")

_CAT3 = sorted(
    [_x(p) for p in (
        "{dltha}{dvsi}{dli}{dls}{dsv}",
        "{dlh}{dvsu}{dln}{dvse}{dlc}",
        "{dlh}{dvsu}{dln}{dsv}{dlc}",
        "{dln}{dvse}{dlc}{dls}{dsv}",
        "{dln}{dvse}{dlc}{dln}{dsv}",
        "{dli}{dle}{dlka}{dvsii}", "{dli}{dle}{dlka}{dvsaa}",
        "{dli}{dle}{dlka}{dvso}",
        "{dvsi}{dle}{dlka}{dvsii}", "{dvsi}{dle}{dlka}{dvsaa}",
        "{dvsi}{dle}{dlka}{dvso}",
        "{dli}{dlc}{dln}{dsv}", "{dvsi}{dlc}{dln}{dsv}",
        "{dli}{dlc}{dls}{dsv}", "{dvsi}{dlc}{dls}{dsv}",
        "{dle}{dlc}{dln}{dsv}", "{dvse}{dlc}{dln}{dsv}",
        "{dle}{dlc}{dls}{dsv}", "{dvse}{dlc}{dls}{dsv}",
        "{dlc}{dvsi}{dln}{dsv}", "{dlc}{dvse}{dls}{dsv}",
        "{dlc}{dsv}{dly}{dvsau}",
        "{dltha}{dvsi}{dln}{dsv}", "{dltha}{dvsi}{dly}{dvso}",
        "{dltha}{dvsi}{dly}{dvsau}", "{dltha}{dvsi}{dls}{dsv}",
        "{dltha}{dsv}{dly}{dvso}", "{dltha}{dsv}{dly}{dvsau}",
        "{dld}{dvsi}{dly}{dvso}",
        "{dld}{dvse}{dlkha}{dvsi}", "{dld}{dvse}{dlkha}{dvsii}",
        "{dll}{dvsaa}{dln}{dsv}",
        "{dlm}{dvsaa}{dltha}{dvsi}",
        "{dln}{dvse}{dlka}{dvsai}", "{dln}{dvse}{dlka}{dvsaa}",
        "{dln}{dvse}{dlka}{dvso}", "{dln}{dvse}{dlc}{dvsau}",
        "{dlh}{dvso}{dls}{dsv}",
        "{dli}{dln}{dsv}{dlc}", "{dvsi}{dln}{dsv}{dlc}",
        "{dln}{dvse}{dlc}{dvsu}",
        "{dli}{dlc}{dvsau}", "{dvsi}{dlc}{dvsau}",
        "{dli}{dls}{dsv}", "{dvsi}{dls}{dsv}",
        "{dvsi}{dly}{dvso}", "{dli}{dly}{dvso}",
        "{dle}{dlka}{dvsaa}", "{dvse}{dlka}{dvsaa}",
        "{dle}{dlka}{dvsii}", "{dvse}{dlka}{dvsii}",
        "{dle}{dlka}{dvsai}", "{dvse}{dlka}{dvsai}",
        "{dle}{dlka}{dvso}", "{dvse}{dlka}{dvso}",
        "{dle}{dlc}{dvsu}", "{dvse}{dlc}{dvsu}",
        "{dle}{dlc}{dvsau}", "{dvse}{dlc}{dvsau}",
        "{dlc}{dln}{dsv}", "{dlc}{dls}{dsv}",
        "{dltha}{dvsi}{dle}",
        "{dlpa}{dlr}{dsv}",
        "{dlb}{dly}{dvso}",
        "{dlh}{dlr}{dvsu}", "{dlh}{dlr}{dvsuu}",
        "{dvsi}{dld}{dvsaa}", "{dli}{dld}{dvsaa}",
        "{dvsi}{dld}{dvso}", "{dli}{dld}{dvso}",
        "{dvsi}{dld}{dvsai}", "{dli}{dld}{dvsai}",
        "{dln}{dvse}{dlc}",
        "{dli}{dlc}", "{dvsi}{dlc}", "{dle}{dlc}", "{dvse}{dlc}",
        "{dlc}{dvsu}", "{dlc}{dvse}", "{dlc}{dvsau}",
        "{dltha}{dvsii}", "{dltha}{dvse}",
        "{dld}{dvsaa}", "{dld}{dvsii}", "{dld}{dvsai}", "{dld}{dvso}",
        "{dln}{dvsu}", "{dln}{dvse}",
        "{dly}{dvso}", "{dly}{dvsau}",
        "{dlc}",
    )],
    key=len,
    reverse=True,
)

_CAT1_ALL = sorted(
    [(s, "del") for s in _CAT1_DEL] + [(s, "cond") for s in _CAT1_COND],
    key=lambda kv: -len(kv[0]),
)


def _cat1(word: str) -> str:
    n = len(word)
    for s, kind in _CAT1_ALL:
        if word.endswith(s):
            cut = n - len(s)
            if kind == "del":
                return word[:cut]
            head = word[:cut]
            # delete unless preceded by letter E or vowel-sign E
            if head.endswith(_E_LETTER) or head.endswith(_E_SIGN):
                return word
            return word[:cut]
    return word


def _cat2(word: str) -> str:
    n = len(word)
    if word.endswith(_CAT2_NASAL):
        head = word[: n - 1]
        # delete the nasal when preceded by any of यौ/छौ/नौ/थे
        for p in _CAT2_NASAL_PRE:
            if head.endswith(p):
                return head
        return word
    if word.endswith(_CAT2_AI):
        if word[: n - 1].endswith(_CAT2_AI_PRE):
            return word[: n - 1]
        return word
    return word


def _cat3(word: str):
    n = len(word)
    for s in _CAT3:
        if word.endswith(s):
            return word[: n - len(s)]
    return None


def stem_nepali(word: str) -> str:
    word = _cat1(word)
    while True:
        word = _cat2(word)
        r = _cat3(word)
        if r is None:
            break
        word = r
    return word
