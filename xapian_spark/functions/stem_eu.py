"""Snowball Basque stemmer — pure-Python port of
xapian-core/languages/algorithms/basque.sbl; golden-validated against
xapian-data/stemming/basque/ in tests/test_stemmer.py.

Snowball semantics notes:
- ``repeat aditzak`` / ``repeat izenak`` run with a PERSISTENT backward
  cursor: each successful call leaves the cursor at the left end of its
  match, and the next call matches the suffix ending THERE — successive
  suffixes strip right-to-left until no among entry (or a failing region
  condition) matches.
- among commits to the longest matching entry; if its condition fails the
  routine fails (no backtracking to shorter entries).
- Region marks index from the left, so suffix deletions never invalidate
  them.
- ``do adjetiboak`` starts at the cursor left by the repeats (``do``
  only restores the cursor AFTER its body, measured as distance from
  the right end — utilities.cc replace bookkeeping).
"""

from __future__ import annotations

_V = frozenset("aeiou")

_ADITZAK = []
for _s in (
    "le la tzaile aldatu atu tzailea taile tailea pera gale galea "
    "gura kura kor korra or orra tun tuna gaitz gaitza "
    "kaitz kaitza ezin ezina tezin tezina errez erreza "
    "karri karria tzaga tzaka tzake tzeke ez eza tzez "
    "keta eta etan pen pena tze atze kuntza kunde kundea "
    "kune kunea kuna kera era kizun kizuna dura tura men mena "
    "go ago tio taldi taldia aldi aldia gune gunea bide bidea "
    "pide pidea gai gaia ki kin rekin kina kari karia ari tari etari "
    "gailu gailua kide kidea ide idea du ka kan an ean tu lari tatu "
    "rean tarazi arazi tzat bera dako"
).split():
    _ADITZAK.append((_s, "rv_del"))
for _s in "garri garria tza".split():
    _ADITZAK.append((_s, "r2_del"))
for _s in "atseden arabera baditu".split():
    _ADITZAK.append((_s, "noop"))

_IZENAK = []
for _s in (
    "ari aria bizia kari karia lari laria tari taria zain zaina "
    "tzain tzaina zale zalea tzale tzalea aizun orde ordea "
    "burua ohi ohia kintza gintzo gintzu tzu tzua "
    "tzo tzoa kuntza talde taldea eria keria teria di "
    "za ada tara etara tra ta tegi tegia keta z zko zkoa "
    "ti tia tsu tsua zu zua bera pera zto ztoa asi asia "
    "gile gilea estu estua larri larria nahi nahia "
    "koi koia oi oia goi min mina dun duna duru durua "
    "duri duria os osa oso osoa ar ara tar dar dara "
    "tiar tiara liar liara gabe gabea kabe kabea ga ge "
    "kada tasun tasuna asun asuna go mendu mendua mentu mentua "
    "mendi mendia zio zioa zino zinoa zione zionea ezia "
    "degi degia egi egia toki tokia leku lekua gintza alde "
    "aldea kalde kaldea gune gunea une unea una pe pea "
    "gibel gibela ondo ondoa arte artea aurre aurrea "
    "etxe etxea ola ontzi ontzia gela denda taldi taldia "
    "aldi aldia te tea zaro zaroa taro taroa oro oroa "
    "aro aroa ero eroa eroz eroza ka kan kana tako etako takoa "
    "kote kotea tzar tzarra handi handia kondo kondoa skila "
    "no noa ño ñoa ska xka zka tila to toa tto ttoa "
    "txo txoa txu txua anda anga urren urrena gai gaia "
    "gei geia eme emea kume kumea sa ko eko koa ena "
    "enea ne nea kor korra ez eza eta etan "
    "ki kia kin kina tu tua du dua ek "
    "tarik tariko tan ordu ordua oste ostea tzara "
    "ra antza behar ro giro ak zp ket "
    "kail kaila ail kirri kirria ngo ngoa ñi sko "
    "sta koitz koitza na garren garrena kera "
    "gerren gerrena garna kide tz tuko"
).split():
    _IZENAK.append((_s, "rv_del"))
for _s in "ora garri garria or buru ren tza".split():
    _IZENAK.append((_s, "r2_del"))
_IZENAK.append(("joka", ("repl", "jok")))
for _s in "tzen ten en tatu".split():
    _IZENAK.append((_s, "r1_del"))
_IZENAK.append(("trako", ("repl", "tra")))
_IZENAK.append(("minutuko", ("repl", "minutu")))
for _s in "zehar geldi igaro aurka".split():
    _IZENAK.append((_s, "noop"))

_ADJETIBOAK = []
for _s in (
    "era ero go tate tade date dade keria "
    "ki to ro la gi larik lanik ik ztik rik"
).split():
    _ADJETIBOAK.append((_s, "rv_del"))
_ADJETIBOAK.append(("zlea", ("repl", "z")))


def _compile(entries):
    # later duplicates override earlier ones? among entries are unique in
    # the .sbl; keep first occurrence, longest-first ordering for matching
    table = {}
    for s, act in entries:
        table.setdefault(s, act)
    return sorted(table.items(), key=lambda kv: -len(kv[0]))


_ADITZAK_T = _compile(_ADITZAK)
_IZENAK_T = _compile(_IZENAK)
_ADJETIBOAK_T = _compile(_ADJETIBOAK)


def _mark_regions(word: str) -> tuple[int, int, int]:
    n = len(word)
    pV = p1 = p2 = n
    # RV (Romance-style)
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
            else:
                if n > 2:
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


def _apply(word: str, c: int, table, pV: int, p1: int, p2: int):
    """One routine call at backward cursor c (suffix ends at c).
    Returns (word, new_cursor) or None on failure."""
    head = word[:c]
    for s, act in table:
        if head.endswith(s):
            cut = c - len(s)
            if act == "rv_del":
                if cut < pV:
                    return None
                return word[:cut] + word[c:], cut
            if act == "r2_del":
                if cut < p2:
                    return None
                return word[:cut] + word[c:], cut
            if act == "r1_del":
                if cut < p1:
                    return None
                return word[:cut] + word[c:], cut
            if act == "noop":
                return word, cut
            # ('repl', new): slice_from leaves the cursor at bra — the
            # LEFT edge of the replacement (utilities.cc:439-444)
            return word[:cut] + act[1] + word[c:], cut
    return None


def stem_basque(word: str) -> str:
    pV, p1, p2 = _mark_regions(word)
    c = len(word)
    # repeat aditzak
    while True:
        r = _apply(word, c, _ADITZAK_T, pV, p1, p2)
        if r is None:
            break
        word, c = r
    # repeat izenak
    while True:
        r = _apply(word, c, _IZENAK_T, pV, p1, p2)
        if r is None:
            break
        word, c = r
    # do adjetiboak
    r = _apply(word, c, _ADJETIBOAK_T, pV, p1, p2)
    if r is not None:
        word, c = r
    return word
