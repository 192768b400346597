"""Snowball Catalan stemmer — pure-Python port of
xapian-core/languages/algorithms/catalan.sbl; golden-validated against
xapian-data/stemming/catalan/ in tests/test_stemmer.py.
"""

from __future__ import annotations

_V = frozenset("aeiouáàéèíïóòúü")

_PRON = sorted(
    "'s 'hi 'ho 'l 'ls -ls -la -les -li vos se nos -nos -us us "
    "'n 'ns -n -ns 'm -me -m -te 't li lo los me sela selo selas selos le "
    "la las les ens ho hi".split(),
    key=len,
    reverse=True,
)

_STD_R1 = (
    "ar atge formes icte ictes ell ells ella és ès esc essa et ets eta "
    "eres eries ers ina ines able ls ió itat itats itzar iva ives ivisme "
    "ius fer ment amen ament aments ments ot sfera al als era ana iste "
    "aire eria esa eses esos or ícia ícies icis ici íci ícis ària àries "
    "alla ció cions nça nces ó dor all il ístic enc enca ís issa issos "
    "íssem íssiu issem isseu ísseu ós osa dora dores dors adura ble bles "
    "ívol ívola dís egar ejar ificar itar ables adors idores idors adora "
    "ació doras dur dures allengües ant ants ancia ancies atòria atòries "
    "tori toris ats ions ota isam ors ora ores isament bilitat bilitats "
    "ivitat ivitats ari aris ionisme ionista ionistes ialista ialistes "
    "ialisme ialismes ud uts uds encia encies ència ències ïtat ïtats "
    "atiu atius atives ativa ativitat ativitats ible ibles assa asses "
    "assos ent ents íssim íssima íssims íssimes ìssem ìsseu ìssin ims ima "
    "imes isme ista ismes istes inia inies íinia ínies ita ites triu "
    "trius oses osos ient otes ots"
).split()
_STD_R2 = "acions ada ades".split()
_STD_LOG = "logía logíes logia logies logi logis lógica lógics lógiques".split()
_STD_IC = "ic ica ics iques".split()
_STD_QC = "quíssim quíssims quíssimes quíssima".split()

_STD = sorted(
    [(s, "r1_del") for s in _STD_R1]
    + [(s, "r2_del") for s in _STD_R2]
    + [(s, ("r2_repl", "log")) for s in _STD_LOG]
    + [(s, ("r2_repl", "ic")) for s in _STD_IC]
    + [(s, ("r1_repl", "c")) for s in _STD_QC],
    key=lambda kv: -len(kv[0]),
)

_VERB_R1 = (
    "ador adora adors adores re ie ent ents udes arà eren "
    "ará arían arías arán arás aríais aria arian arien aries aràs "
    "aría aréis aríamos aremos ara aré arés "
    "erían erías erán erás eríais ería eréis eríamos eremos erá "
    "eré er erau erass "
    "irían irías irán irás iríais iría iréis iríamos iremos irá "
    "iré írem íreu íeu ia ies íem ìeu ien "
    "at ut uda ava aves avem ávem àvem àveu áveu aven au ats "
    "asseu esseu eresseu àsseu àssem àssim àssiu "
    "essen esses assen asses assim assiu "
    "éssen ésseu éssim éssiu éssem "
    "í ares àrem àreu àren aríem aríeu "
    "areu aren ant ïm ïu és ïen en es em am ams ïa ïes "
    "dre eix eixer tzar eixes ides ïdes it ït ïda "
    "aba ada ades ida ía iera ad ed its id ids ase iese aste iste an "
    "aban ían aran ieran asen iesen aron ieron ado ido iendo ió ar ir as "
    "ieu ii io ià ess essin essis ass assin assis essim èssim èssiu "
    "abas adas idas ías aras ieras ases ieses ís áis abais íais arais "
    "ierais aseis ieseis asteis isteis ados idos amos ábamos íamos imos "
    "ques áramos iéramos iésemos ásemos "
    "ira iran irem iren ires ireu iria irien iries irà iràs irè irìem "
    "irìeu isquen iguem igueu esqui esquin esquis eixi eixin eixis eixen "
    "eixo isin isis esques sis sin int iríem iríeu isc atges esca esquen "
    "issen isses issin issis isca issiu issim "
    "ïsc ïsca ïssin íssiu íssim ïssis ïguem ïgueu ïra ïren ïres "
    "ïsquen ïsques ïssen ïsses ïxo ïxen ïxes ïx "
    "ixo ixen ixes ix ixa inin inis ini ineu itza itzi itzeu itzis "
    "itzo itz itzà arem in às iï iïn iïs"
).split()

_VERB = sorted(
    [(s, "r1_del") for s in _VERB_R1] + [("ando", "r2_del")],
    key=lambda kv: -len(kv[0]),
)

_RESID = sorted(
    [(s, "r1_del") for s in (
        "os a o á à í ó e é eu iu is i ir s ì itz ï ïn ïs it"
    ).split()]
    + [("iqu", ("r1_repl", "ic"))],
    key=lambda kv: -len(kv[0]),
)

_CLEAN = str.maketrans(
    {"á": "a", "à": "a", "é": "e", "è": "e", "í": "i", "ì": "i",
     "ó": "o", "ò": "o", "ú": "u", "ü": "u", "ï": "i", "·": "."}
)


def _mark_regions(word: str) -> tuple[int, int]:
    n = len(word)

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
    return p1, p2


def _step(word: str, table, p1: int, p2: int):
    n = len(word)
    for s, act in table:
        if word.endswith(s):
            cut = n - len(s)
            if act == "r1_del":
                return word[:cut] if cut >= p1 else None
            if act == "r2_del":
                return word[:cut] if cut >= p2 else None
            kind, rep = act
            if kind == "r1_repl":
                return word[:cut] + rep if cut >= p1 else None
            return word[:cut] + rep if cut >= p2 else None
    return None


def stem_catalan(word: str) -> str:
    p1, p2 = _mark_regions(word)
    # attached_pronoun (R1 delete)
    n = len(word)
    for s in _PRON:
        if word.endswith(s):
            cut = n - len(s)
            if cut >= p1:
                word = word[:cut]
            break
    # standard_suffix or verb_suffix
    r = _step(word, _STD, p1, p2)
    if r is None:
        r = _step(word, _VERB, p1, p2)
    if r is not None:
        word = r
    # residual_suffix
    r = _step(word, _RESID, p1, p2)
    if r is not None:
        word = r
    return word.translate(_CLEAN)
