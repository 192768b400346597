"""Snowball Early-English stemmer — port of
xapian-core/languages/algorithms/earlyenglish.sbl.

The .sbl is byte-identical to english.sbl except Step_1b's delete group
additionally strips the archaic verb endings 'est' and 'eth'
(maketh → make, walkest → walk), so this delegates to the golden-exact
English port with that group extended.  The reference ships no golden
vocabulary for earlyenglish; stem_english itself is validated on the
full 42,649-pair English vocabulary.
"""

from __future__ import annotations

from .stem_en import stem_english


def stem_earlyenglish(word: str) -> str:
    return stem_english(word, _step1b_extra=("est", "eth"))
