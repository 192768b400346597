"""Stemmer registry — Xapian::Stem's language dispatch
(xapian-core/languages/stem.cc; aliases per the `// Alias:` headers of
languages/algorithms/*.sbl).

Each entry is a golden-validated pure-Python Snowball port (full reference
vocabulary, 0 mismatches — tests/test_stemmer.py).  The tokenizer UDFs
close over the chosen function, so executors run it vectorized per batch
with no per-call dispatch.
"""

from __future__ import annotations

from collections.abc import Callable


def get_stemmer(lang: str) -> Callable[[str], str]:
    lang = lang.lower()
    if lang in ("en", "english"):
        from .stem_en import stem_english

        return stem_english
    if lang in ("sv", "swedish"):
        from .stem_sv import stem_swedish

        return stem_swedish
    if lang in ("de", "german", "german2"):
        from .stem_de import stem_german

        return stem_german
    if lang in ("da", "danish"):
        from .stem_da import stem_danish

        return stem_danish
    if lang in ("nb", "nn", "no", "norwegian"):
        from .stem_no import stem_norwegian

        return stem_norwegian
    if lang in ("eu", "basque"):
        from .stem_eu import stem_basque

        return stem_basque
    if lang in ("ga", "irish"):
        from .stem_ga import stem_irish

        return stem_irish
    if lang in ("it", "italian"):
        from .stem_it import stem_italian

        return stem_italian
    if lang in ("ca", "catalan"):
        from .stem_ca import stem_catalan

        return stem_catalan
    if lang in ("pt", "portuguese"):
        from .stem_pt import stem_portuguese

        return stem_portuguese
    if lang in ("es", "spanish"):
        from .stem_es import stem_spanish

        return stem_spanish
    if lang in ("fr", "french"):
        from .stem_fr import stem_french

        return stem_french
    if lang in ("fi", "finnish"):
        from .stem_fi import stem_finnish

        return stem_finnish
    if lang in ("ru", "russian"):
        from .stem_ru import stem_russian

        return stem_russian
    if lang in ("nl", "dutch", "kraaij_pohlmann"):
        from .stem_nl import stem_dutch

        return stem_dutch
    if lang in ("id", "indonesian"):
        from .stem_id import stem_indonesian

        return stem_indonesian
    if lang in ("pl", "polish"):
        from .stem_pl import stem_polish

        return stem_polish
    if lang in ("ro", "romanian"):
        from .stem_ro import stem_romanian

        return stem_romanian
    if lang in ("hu", "hungarian"):
        from .stem_hu import stem_hungarian

        return stem_hungarian
    if lang in ("hi", "hindi"):
        from .stem_hi import stem_hindi

        return stem_hindi
    if lang in ("hy", "armenian"):
        from .stem_hy import stem_armenian

        return stem_armenian
    if lang in ("yi", "yiddish"):
        from .stem_yi import stem_yiddish

        return stem_yiddish
    if lang in ("ta", "tamil"):
        # NB: no reference golden vocabulary exists for Tamil — this port
        # is .sbl-reviewed but not vocabulary-validated (see stem_ta).
        from .stem_ta import stem_tamil

        return stem_tamil
    if lang in ("sr", "serbian"):
        from .stem_sr import stem_serbian

        return stem_serbian
    if lang in ("el", "greek"):
        from .stem_el import stem_greek

        return stem_greek
    if lang in ("tr", "turkish"):
        from .stem_tr import stem_turkish

        return stem_turkish
    if lang in ("lt", "lithuanian"):
        from .stem_lt import stem_lithuanian

        return stem_lithuanian
    if lang in ("ne", "nepali"):
        from .stem_ne import stem_nepali

        return stem_nepali
    if lang == "lovins":
        from .stem_lovins import stem_lovins

        return stem_lovins
    if lang == "dutch_porter":
        from .stem_nl_porter import stem_dutch_porter

        return stem_dutch_porter
    if lang in ("ar", "arabic"):
        # no reference golden vocabulary — .sbl-faithful port pinned by
        # morphology tests (see stem_ar docstring).
        from .stem_ar import stem_arabic

        return stem_arabic
    if lang in ("et", "estonian"):
        # no reference golden vocabulary — .sbl-faithful port pinned by
        # the .sbl's own worked examples (see stem_et docstring).
        from .stem_et import stem_estonian

        return stem_estonian
    if lang in ("eo", "esperanto"):
        # no reference golden vocabulary — .sbl-faithful port pinned by
        # morphology tests (see stem_eo docstring).
        from .stem_eo import stem_esperanto

        return stem_esperanto
    if lang == "earlyenglish":
        # no reference golden vocabulary — delegates to the golden-exact
        # English port with Step_1b extended by 'est'/'eth' (the .sbl's
        # only divergence from english.sbl).
        from .stem_earlyenglish import stem_earlyenglish

        return stem_earlyenglish
    if lang == "porter":
        from .stem_porter import stem_porter

        return stem_porter
    raise ValueError(
        f"unsupported stemmer {lang!r} (all 35 reference Snowball "
        "algorithms are available by ISO code or name, e.g. en/english, "
        "ar/arabic, el/greek, sr/serbian, porter, lovins, earlyenglish)"
    )
