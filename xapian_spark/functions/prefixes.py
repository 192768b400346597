"""Term-prefix conventions (xapian-omega/docs/termprefixes.rst:55-105).

Fields map to term-string prefixes (``S`` = title, ``XFOO`` = user field);
a ``:`` separator is inserted when the term text could be confused with
more prefix — prefix_needs_colon (queryparser/queryparser.lemony:113-119):
needed iff the term starts with an uppercase letter or ':' AND the prefix
is longer than one char and doesn't already end with ':'.
"""

from __future__ import annotations


def prefix_needs_colon(prefix: str, first_ch: str) -> bool:
    if not first_ch:
        return False
    if not (first_ch.isupper() or first_ch == ":"):
        return False
    return len(prefix) > 1 and not prefix.endswith(":")


def make_term(prefix: str, word: str) -> str:
    """prefix + [':'] + word (Term::make_term, queryparser.lemony:352-360)."""
    if not prefix:
        return word
    if prefix_needs_colon(prefix, word[:1]):
        return prefix + ":" + word
    return prefix + word
