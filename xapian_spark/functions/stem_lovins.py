"""Snowball Lovins stemmer — pure-Python port of
xapian-core/languages/algorithms/lovins.sbl (Lovins 1968, via Snowball);
golden-validated against xapian-data/stemming/lovins/.

Every ending carries its Lovins condition A..CC as an among FUNCTION, so a
failing condition backtracks to the next (shorter) matching ending.
"""

from __future__ import annotations


def _cond(letter: str, w: str, c: int) -> bool:
    """Condition at cut position c over word w (prev = w[c-1] …)."""
    if letter == "A":
        return c >= 2
    if letter == "B":
        return c >= 3
    if letter == "C":
        return c >= 4
    if letter == "D":
        return c >= 5
    if letter == "E":
        return c >= 2 and w[c - 1] != "e"
    if letter == "F":
        return c >= 3 and w[c - 1] != "e"
    if letter == "G":
        return c >= 3 and w[c - 1] == "f"
    if letter == "H":
        return c >= 2 and (w[c - 1] == "t" or w[c - 2 : c] == "ll")
    if letter == "I":
        return c >= 2 and w[c - 1] not in "oe"
    if letter == "J":
        return c >= 2 and w[c - 1] not in "ae"
    if letter == "K":
        return c >= 3 and (
            w[c - 1] in "li" or (w[c - 1] == "e" and w[c - 3] == "u")
        )
    if letter == "L":
        if c < 2 or w[c - 1] in "ux":
            return False
        return not (w[c - 1] == "s" and w[c - 2] != "o")
    if letter == "M":
        return c >= 2 and w[c - 1] not in "acem"
    if letter == "N":
        # test hop 3; hop 2; then (not 's' or hop 2): minimum stem 3, and
        # when the char 3 back is 's' another two chars must exist
        # (Lovins: "minimum stem length = 4 after s")
        return c >= 3 and (w[c - 3] != "s" or c >= 4)
    if letter == "O":
        return c >= 2 and w[c - 1] in "li"
    if letter == "P":
        return c >= 2 and w[c - 1] != "c"
    if letter == "Q":
        return c >= 3 and w[c - 1] not in "ln"
    if letter == "R":
        return c >= 2 and w[c - 1] in "nr"
    if letter == "S":
        return c >= 2 and (
            w[c - 2 : c] == "dr" or (w[c - 1] == "t" and w[c - 2 : c - 1] != "t")
        )
    if letter == "T":
        return c >= 2 and (
            w[c - 1] == "s" or (w[c - 1] == "t" and w[c - 2 : c - 1] != "o")
        )
    if letter == "U":
        return c >= 2 and w[c - 1] in "lmnr"
    if letter == "V":
        return c >= 2 and w[c - 1] == "c"
    if letter == "W":
        return c >= 2 and w[c - 1] not in "su"
    if letter == "X":
        return c >= 2 and (
            w[c - 1] in "li"
            or (c >= 3 and w[c - 1] == "e" and w[c - 3] == "u")
        )
    if letter == "Y":
        return c >= 2 and w[c - 2 : c] == "in"
    if letter == "Z":
        return c >= 2 and w[c - 1] != "f"
    if letter == "AA":
        if c < 2:
            return False
        head = w[:c]
        return head.endswith(
            ("d", "f", "ph", "th", "l", "er", "or", "es", "t")
        )
    if letter == "BB":
        return c >= 3 and not w[:c].endswith(("met", "ryst"))
    # CC
    return c >= 2 and w[c - 1] == "l"


_ENDINGS_SRC = """
alistically B arizability A izationally B
antialness A arisations A arizations A entialness A
allically C antaneous A antiality A arisation A
arization A ationally B ativeness A eableness E
entations A entiality A entialize A entiation A
ionalness A istically A itousness A izability A
izational A
ableness A arizable A entation A entially A
eousness A ibleness A icalness A ionalism A
ionality A ionalize A iousness A izations A
lessness A
ability A aically A alistic B alities A
ariness E aristic A arizing A ateness A
atingly A ational B atively A ativism A
elihood E encible A entally A entials A
entiate A entness A fulness A ibility A
icalism A icalist A icality A icalize A
ication G icianry A ination A ingness A
ionally A isation A ishness A istical A
iteness A iveness A ivistic A ivities A
ization F izement A oidally A ousness A
aceous A acious B action G alness A
ancial A ancies A ancing B ariser A
arized A arizer A atable A ations B
atives A eature Z efully A encies A
encing A ential A enting C entist A
eously A ialist A iality A ialize A
ically A icance A icians A icists A
ifully A ionals A ionate D ioning A
ionist A iously A istics A izable E
lessly A nesses A oidism A
acies A acity A aging B aical A
alist A alism B ality A alize A
allic BB anced B ances B antic C
arial A aries A arily A arity B
arize A aroid A ately A ating I
ation B ative A ators A atory A
ature E early Y ehood A eless A
elity A ement A enced A ences A
eness E ening E ental A ented C
ently A fully A ially A icant A
ician A icide A icism A icist A
icity A idine I iedly A ihood A
inate A iness A ingly B inism J
inity CC ional A ioned A ished A
istic A ities A itous A ively A
ivity A izers F izing F oidal A
oides A otide A ously A
able A ably A ages B ally B
ance B ancy B ants B aric A
arly K ated I ates A atic B
ator A ealy Y edly E eful A
eity A ence A ency A ened E
enly E eous A hood A ials A
ians A ible A ibly A ical A
ides L iers A iful A ines M
ings N ions B ious A isms B
ists A itic H ized F izer F
less A lily A ness A ogen A
ward A wise A ying B yish A
acy A age B aic A als BB
ant B ars O ary F ata A
ate A eal Y ear Y ely E
ene E ent C ery E ese A
ful A ial A ian A ics A
ide L ied A ier A ies P
ily A ine M ing N ion Q
ish C ism B ist A ite AA
ity A ium A ive A ize F
oid A one R ous A
ae A al BB ar X as B
ed E en F es E ia A
ic A is A ly B on S
or T um U us V yl R
's A s' A
a A e A i A o A
s W y B
"""

_ENDINGS = []
_toks = _ENDINGS_SRC.split()
for _i in range(0, len(_toks), 2):
    _ENDINGS.append((_toks[_i], _toks[_i + 1]))
_ENDINGS.sort(key=lambda kv: -len(kv[0]))

_DOUBLES = ("bb", "dd", "gg", "ll", "mm", "nn", "pp", "rr", "ss", "tt")

_RESPELL = sorted(
    [
        ("iev", "ief"), ("uct", "uc"), ("umpt", "um"), ("rpt", "rb"),
        ("urs", "ur"), ("istr", "ister"), ("metr", "meter"),
        ("olv", "olut"), ("bex", "bic"), ("dex", "dic"), ("pex", "pic"),
        ("tex", "tic"), ("ax", "ac"), ("ex", "ec"), ("ix", "ic"),
        ("lux", "luc"), ("uad", "uas"), ("vad", "vas"), ("cid", "cis"),
        ("lid", "lis"), ("erid", "eris"), ("pand", "pans"),
        ("ond", "ons"), ("lud", "lus"), ("rud", "rus"), ("mit", "mis"),
        ("ert", "ers"), ("yt", "ys"), ("yz", "ys"),
        # conditional ones handled specially: ul, end, her, ent, et
        ("ul", None), ("end", None), ("her", None), ("ent", None),
        ("et", None),
    ],
    key=lambda kv: -len(kv[0]),
)


def stem_lovins(word: str) -> str:
    # endings (backtracking among functions)
    n = len(word)
    for s, cond in _ENDINGS:
        if word.endswith(s):
            cut = n - len(s)
            if _cond(cond, word, cut):
                word = word[:cut]
                break
    # undouble
    if word.endswith(_DOUBLES):
        word = word[:-1]
    # respell
    n = len(word)
    for s, rep in _RESPELL:
        if not word.endswith(s):
            continue
        cut = n - len(s)
        prev = word[cut - 1] if cut >= 1 else ""
        if s == "ul":
            # NB: prev may be '' (condition matching fails at the limit, so
            # `not 'a'` etc. SUCCEED on an empty stem)
            if not prev or prev not in "aio":
                return word[:cut] + "l"
            return word
        if s == "end":
            if prev != "s":
                return word[:cut] + "ens"
            return word
        if s == "her":
            if not prev or prev not in "pt":
                return word[:cut] + "hes"
            return word
        if s == "ent":
            if prev != "m":
                return word[:cut] + "ens"
            return word
        if s == "et":
            if prev != "n":
                return word[:cut] + "es"
            return word
        return word[:cut] + rep
    return word
