"""Snowball Indonesian stemmer — pure-Python port of
xapian-core/languages/algorithms/indonesian.sbl (the Porter-style Bahasa
Indonesia stemmer with the paper's SUFFIX_KAN/SUFFIX_I amendments);
golden-validated against xapian-data/stemming/indonesian/.
"""

from __future__ import annotations

_V = frozenset("aeiou")


def _count_vowels(word: str) -> int:
    return sum(1 for c in word if c in _V)


def _remove_particle(word, measure):
    for s in ("kah", "lah", "pun"):
        if word.endswith(s):
            return word[: -len(s)], measure - 1
    return word, measure


def _remove_possessive(word, measure):
    for s in ("nya", "ku", "mu"):
        if word.endswith(s):
            return word[: -len(s)], measure - 1
    return word, measure


def _remove_suffix(word, measure, prefix):
    """Returns (word, measure, ok)."""
    if word.endswith("an"):
        if prefix != 3 and prefix != 2 and word[:-2].endswith("k"):
            return word[:-3], measure - 1, True
        if prefix != 1:
            return word[:-2], measure - 1, True
        return word, measure, False
    if word.endswith("i"):
        if prefix <= 2 and not word[:-1].endswith("s"):
            return word[:-1], measure - 1, True
        return word, measure, False
    return word, measure, False


def _remove_first_order_prefix(word, measure):
    """Returns (word, measure, prefix, offset, ok) — longest among match.

    ``offset`` is the forward-cursor position after the prefix action:
    0 for plain deletions, 1 for replacements (men+y→s, mem→p, …) — the
    later remove_second_order_prefix is cursor-anchored there.
    """
    for s in ("meng", "peng", "men", "pen", "mem", "pem", "ter", "di",
              "me", "ke"):
        if not word.startswith(s):
            continue
        rest = word[len(s):]
        if s in ("di", "meng", "me", "ter"):
            return rest, measure - 1, 1, 0, True
        if s == "men":
            if rest.startswith("y") and len(rest) >= 2 and rest[1] in _V:
                return "s" + rest[1:], measure - 1, 1, 1, True
            return rest, measure - 1, 1, 0, True
        if s in ("ke", "peng"):
            return rest, measure - 1, 3, 0, True
        if s == "pen":
            if rest.startswith("y") and len(rest) >= 2 and rest[1] in _V:
                return "s" + rest[1:], measure - 1, 3, 1, True
            return rest, measure - 1, 3, 0, True
        if s == "mem":
            if rest[:1] and rest[0] in _V:
                return "p" + rest, measure - 1, 1, 1, True
            return rest, measure - 1, 1, 0, True
        if s == "pem":
            if rest[:1] and rest[0] in _V:
                return "p" + rest, measure - 1, 3, 1, True
            return rest, measure - 1, 3, 0, True
    return word, measure, 0, 0, False


def _remove_second_order_prefix(word, measure, prefix):
    """Returns (word, measure, prefix, ok)."""
    if word.startswith("pe"):
        rest = word[2:]
        if rest.startswith("r"):
            return rest[1:], measure - 1, 2, True
        if rest.startswith("l") and rest[1:].startswith("ajar"):
            return rest[1:], measure - 1, prefix, True
        return rest, measure - 1, 2, True
    if word.startswith("be"):
        rest = word[2:]
        if rest.startswith("r"):
            return rest[1:], measure - 1, 4, True
        if rest.startswith("l") and rest[1:].startswith("ajar"):
            return rest[1:], measure - 1, 4, True
        if rest[:1] and rest[0] not in _V and rest[1:].startswith("er"):
            return rest, measure - 1, 4, True
        return word, measure, prefix, False
    return word, measure, prefix, False


def stem_indonesian(word: str) -> str:
    measure = _count_vowels(word)
    if measure <= 2:
        return word
    prefix = 0

    word, measure = _remove_particle(word, measure)
    if measure <= 2:
        return word
    word, measure = _remove_possessive(word, measure)
    if measure <= 2:
        return word

    w1, m1, prefix1, off, ok = _remove_first_order_prefix(word, measure)
    if ok:
        word, measure, prefix = w1, m1, prefix1
        # do( test(measure>2 remove_suffix) measure>2 second_order )
        if measure > 2:
            w2, m2, ok2 = _remove_suffix(word, measure, prefix)
            if ok2:
                # test(...) restores the cursor but keeps string changes;
                # sequence continues only if the suffix removal succeeded
                word, measure = w2, m2
                if measure > 2:
                    w3, m3, p3, ok3 = _remove_second_order_prefix(
                        word[off:], measure, prefix
                    )
                    if ok3:
                        word, measure, prefix = word[:off] + w3, m3, p3
    else:
        w2, m2, p2, ok2 = _remove_second_order_prefix(word, measure, prefix)
        if ok2:
            word, measure, prefix = w2, m2, p2
        if measure > 2:
            w3, m3, ok3 = _remove_suffix(word, measure, prefix)
            if ok3:
                word, measure = w3, m3
    return word
