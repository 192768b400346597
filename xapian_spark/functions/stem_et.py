"""Snowball Estonian stemmer — pure-Python port of
xapian-core/languages/algorithms/estonian.sbl (Linda Freienthal, 2019).

No golden vocabulary ships in xapian-data for Estonian; the port is
.sbl-faithful and pinned by morphology tests built from the .sbl's own
worked examples.  Structure: whole-word verb-exception table (aborts the
rest), R1-scoped suffix steps — emphasis (-gi/-ki), verb endings OR the
substantive chain (special nouns, case endings, plural, degrees, i-plural,
nu) — then kk/pp/tt undoubling before a final vowel.  Suffix matches are
limited to R1 but their context conditions (RV/LONGV/hop) see the whole
word.
"""

from __future__ import annotations

_V1 = frozenset("aeiouõäöü")
_RV = frozenset("aeiuo")
_KI = frozenset("kptgbdshfšzž")
_GI = frozenset("cjlmnqrvwxaeiouõäöü")
_LONGV = frozenset(["aa", "ee", "ii", "oo", "uu", "ää", "öö", "üü", "õõ"])

_EXC_RAW = {
    'joo': 'joon jood joob joote joome joovad jõin jõid jõi jõime jõite joomata juuakse joodakse juua jooma',
    'saa': 'saan saad saab saate saame saavad saaksin saaksid saaks saaksite saaksime sain said sai saite saime saamata saadakse saadi saama saada',
    'viima': 'viin viid viib viite viime viivad viiksin viiksid viiks viiksite viiksime viisin viisite viisime viimata viiakse viidi viima viia',
    'keesi': 'keen keeb keed kees keeme keete keevad keeksin keeks keeksid keeksime keeksite keemata keema keeta keedakse',
    'löö': 'löön lööd lööb lööme lööte löövad lööksin lööksid lööks lööksime lööksite löömata lüüakse löödakse löödi lööma lüüa',
    'lõi': 'lõin lõid lõi lõime lõite',
    'loo': 'loon lood loob loome loote loovad looksin looksid looks looksime looksite loomata luuakse loodi luua looma',
    'käisi': 'käin käib käid käis käime käite käivad käiksin käiks käiksid käiksime käiksite käimata käiakse käidi käia käima',
    'söö': 'söön sööb sööd sööme sööte söövad sööksin sööks sööksid sööksime sööksite sõin sõi sõid sõime sõite söömata süüakse söödakse söödi sööma süüa',
    'too': 'toon tood toob toote toome toovad tooksin tooksid tooks tooksite tooksime tõin tõid tõi tõime tõite toomata tuuakse toodi tooma tuua',
    'võisi': 'võin võid võib võime võis võite võivad võiksin võiksid võiks võiksime võiksite võimata võidakse võidi võida võima',
    'jääma': 'jään jääd jääb jääme jääte jäävad jääksin jääksid jääks jääksime jääksite jäime jäite jäin jäid jäi jäämata jäädakse jääda jääma jäädi',
    'müüsi': 'müün müüd müüb müüs müüme müüte müüvad müüksin müüksid müüks müüksime müüksite müümata müüakse müüdi müüa müüma',
    'luge': 'loeb loen loed loeme loete loevad loeks loeksin loeksid loeksime loeksite',
    'põde': 'põen põeb põed põeme põete põevad põeksin põeks põeksid põeksime põeksite',
    'ladu': 'laon laob laod laome laote laovad laoksin laoks laoksid laoksime laoksite',
    'tegi': 'teeksin teeks teeksid teeksime teeksite teen teeb teed teeme teete teevad tegemata tehakse tehti tegema teha',
    'nägi': 'näen näeb näed näeme näete näevad näeksin näeks näeksid näeksime näeksite nägemata nähakse nähti näha nägema',
}

_EXC = {w: rep for rep, ws in _EXC_RAW.items() for w in ws.split()}

_SPECIAL = sorted(
    [("lasse", "lase"), ("last", "lase"), ("lane", "lase"), ("lasi", "lase"),
     ("misse", "mise"), ("mist", "mise"), ("mine", "mise"), ("misi", "mise"),
     ("lisse", "lise"), ("list", "lise"), ("line", "lise"), ("lisi", "lise")],
    key=lambda kv: -len(kv[0]))

_VERB = sorted(
    [("nuksin", ""), ("nuksime", ""), ("nuksid", ""), ("nuksite", ""),
     ("ksin", ""), ("ksid", ""), ("ksime", ""), ("ksite", ""),
     ("mata", ""), ("takse", ""), ("dakse", ""), ("taks", ""), ("daks", ""),
     ("akse", "a"), ("sime", ""), ("site", ""), ("sin", ""),
     ("me", "V1"), ("da", "V1"), ("n", "V1"), ("b", "V1")],
    key=lambda kv: -len(kv[0]))

_CASE = sorted(
    [("sse", "RVL"), ("st", "RVL"), ("le", "RVL"), ("lt", "RVL"),
     ("ga", "RVL"), ("ks", "RVL"), ("ta", "RVL"), ("t", "HOP4"),
     ("s", "RVL"), ("l", "RVL")], key=lambda kv: -len(kv[0]))

_DEGREES = [("mai", True), ("ma", False), ("m", True)]  # (suffix, needs RV)


def _mark_p1(w: str) -> int:
    n = len(w)
    i = 0
    while i < n and w[i] not in _V1:
        i += 1
    while i < n and w[i] in _V1:
        i += 1
    return i + 1 if i < n else n


def _rv_or_longv(w: str, st: int) -> bool:
    return (st >= 1 and w[st - 1] in _RV) or w[max(0, st - 2):st] in _LONGV


def _emphasis(w: str, p1: int) -> str:
    n = len(w)
    st = n - 2
    if st < p1:
        return w
    suf = w[st:]
    if suf not in ("gi", "ki"):
        return w
    if st < 4:  # test hop 4 from the suffix start
        return w
    if suf == "gi":
        if w[st - 1] in _GI and w[st - 2:st] not in _LONGV:
            return w[:st]
    elif w[st - 1] in _KI:
        return w[:st]
    return w


def _verb(w: str, p1: int) -> str | None:
    n = len(w)
    for suf, act in _VERB:
        if w.endswith(suf):
            st = n - len(suf)
            if st < p1:
                return None
            if act == "V1":
                if st == 0 or w[st - 1] not in _V1:
                    return None
                return w[:st]
            return w[:st] + act
    return None


def _special_nouns(w: str, p1: int) -> str:
    n = len(w)
    for suf, rep in _SPECIAL:
        if w.endswith(suf):
            st = n - len(suf)
            if st >= p1:
                return w[:st] + rep
            return w
    return w


def _case_ending(w: str, p1: int) -> str:
    n = len(w)
    for suf, cond in _CASE:
        if w.endswith(suf):
            st = n - len(suf)
            if st < p1:
                return w
            if cond == "HOP4":
                if st < 4:
                    return w
            elif not _rv_or_longv(w, st):
                return w
            return w[:st]
    return w


def _plural3(w: str, p1: int) -> str:
    n = len(w)
    for suf in ("ikkude", "ikke", "ike", "sid", "te", "de", "d"):
        if w.endswith(suf):
            st = n - len(suf)
            if st < p1:
                return w
            if suf in ("ikkude", "ikke", "ike"):
                return w[:st] + "iku"
            if suf == "sid":
                if w[max(0, st - 2):st] in _LONGV:
                    return w
                return w[:st]
            if suf == "te":
                if st >= 4:
                    pre = w[:st]
                    if pre.endswith(("mis", "las", "lis")):
                        return w[:st] + "e"
                    if pre.endswith("t"):
                        return w  # kokkuvõtte: leave for undouble_kpt
                    return w[:st]
                return w[:st] + "t"  # torte -> tort
            if _rv_or_longv(w, st):  # de / d
                return w[:st]
            return w
    return w


def _degrees(w: str, p1: int) -> str:
    n = len(w)
    for suf, needs_rv in _DEGREES:
        if w.endswith(suf):
            st = n - len(suf)
            if st < p1:
                return w
            if needs_rv and not (st >= 1 and w[st - 1] in _RV):
                return w
            return w[:st]
    return w


def _i_plural(w: str, p1: int) -> str:
    n = len(w)
    if w.endswith("i") and n - 1 >= p1 and n >= 2 and w[n - 2] in _RV:
        return w[:n - 1]
    return w


def _nu(w: str, p1: int) -> str:
    n = len(w)
    for suf in ("nu", "tu", "du", "va"):
        if w.endswith(suf):
            st = n - 2
            if st >= p1:
                return w[:st]
            return w
    return w


def _undouble_kpt(w: str, p1: int) -> str:
    n = len(w)
    if n >= 3 and w[-1] in _V1 and p1 <= n - 1:
        if w[n - 3:n - 1] in ("kk", "pp", "tt"):
            return w[:n - 2] + w[n - 1]
    return w


def stem_estonian(word: str) -> str:
    rep = _EXC.get(word)
    if rep is not None:
        return rep
    p1 = _mark_p1(word)
    w = _emphasis(word, p1)
    w2 = _verb(w, p1)
    if w2 is not None:
        w = w2
    else:
        w = _special_nouns(w, p1)
        w = _case_ending(w, p1)
        w = _plural3(w, p1)
        w = _degrees(w, p1)
        w = _i_plural(w, p1)
        w = _nu(w, p1)
    return _undouble_kpt(w, p1)
