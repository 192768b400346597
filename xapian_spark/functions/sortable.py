"""sortable_serialise / sortable_unserialise — order-preserving double↔bytes.

Byte-exact port of xapian-core/api/sortable-serialise.cc:49-262.  The Spark
engine stores native numeric columns (parquet min/max stats replace value
bounds), so this exists for byte-level parity with reference value slots —
e.g. migrating an existing Xapian database's serialized values, or emitting
golden-compatible slot bytes.  Vectorized wrappers provided for column use.
"""

from __future__ import annotations

import math
import struct

import pandas as pd

__all__ = ["sortable_serialise", "sortable_unserialise", "serialise_series"]

_MASK32 = 0xFFFFFFFF


def sortable_serialise(value: float) -> bytes:
    """api/sortable-serialise.cc:49-176."""
    if not math.isfinite(value):
        if value < 0:
            return b""  # negative infinity
        return b"\xff" * 9  # positive infinity (and NaN → +inf, like C code path)

    mantissa, exponent = math.frexp(value)

    if mantissa == 0.0 or exponent < -2039:
        return b"\x80"
    if exponent > 2055:
        return b"\xff" * 9

    negative = mantissa < 0
    if negative:
        mantissa = -mantissa

    next_b = 0x00 if negative else 0xE0

    exponent -= 8
    exponent_negative = exponent < 0
    if exponent_negative:
        exponent = -exponent
        next_b ^= 0x60

    buf = bytearray()
    if exponent < 8:
        next_b ^= 0x20
        next_b |= exponent << 2
        if negative ^ exponent_negative:
            next_b ^= 0x1C
    else:
        next_b |= exponent >> 6
        if negative ^ exponent_negative:
            next_b ^= 0x1F
        buf.append(next_b & 0xFF)
        next_b = (exponent << 2) & 0xFF
        if negative ^ exponent_negative:
            next_b ^= 0xFC

    mantissa *= 1 << (26 if negative else 27)
    word1 = int(mantissa)
    mantissa -= word1
    word2 = int(mantissa * 4294967296.0)

    if negative:
        word1 = (-word1) & _MASK32
        if word2 != 0:
            word1 = (word1 + 1) & _MASK32
        word2 = (-word2) & _MASK32

    word1 &= 0x03FFFFFF
    next_b |= word1 >> 24
    buf.append(next_b & 0xFF)
    buf.append((word1 >> 16) & 0xFF)
    buf.append((word1 >> 8) & 0xFF)
    buf.append(word1 & 0xFF)
    buf.append((word2 >> 24) & 0xFF)
    buf.append((word2 >> 16) & 0xFF)
    buf.append((word2 >> 8) & 0xFF)
    buf.append(word2 & 0xFF)

    while buf and buf[-1] == 0:
        buf.pop()
    return bytes(buf)


def _numfromstr(b: bytes, pos: int) -> int:
    return b[pos] if pos < len(b) else 0


def sortable_unserialise(value: bytes) -> float:
    """api/sortable-serialise.cc:186-262."""
    if len(value) == 1 and value[0] == 0x80:
        return 0.0
    if len(value) == 9 and value == b"\xff" * 9:
        return math.inf
    if len(value) == 0:
        return -math.inf

    first = _numfromstr(value, 0)
    i = 0

    first ^= (first & 0xC0) >> 1
    negative = not (first & 0x80)
    exponent_negative = bool(first & 0x40)
    explen = not (first & 0x20)
    exponent = first & 0x1F
    if not explen:
        exponent >>= 2
        if negative ^ exponent_negative:
            exponent ^= 0x07
    else:
        i += 1
        first = _numfromstr(value, i)
        exponent <<= 6
        exponent |= first >> 2
        if negative ^ exponent_negative:
            exponent ^= 0x07FF

    word1 = (first & 0x03) << 24
    i += 1
    word1 |= _numfromstr(value, i) << 16
    i += 1
    word1 |= _numfromstr(value, i) << 8
    i += 1
    word1 |= _numfromstr(value, i)

    word2 = 0
    if i < len(value):
        i += 1
        word2 = _numfromstr(value, i) << 24
        i += 1
        word2 |= _numfromstr(value, i) << 16
        i += 1
        word2 |= _numfromstr(value, i) << 8
        i += 1
        word2 |= _numfromstr(value, i)

    if negative:
        word1 = (-word1) & _MASK32
        if word2 != 0:
            word1 = (word1 + 1) & _MASK32
        word2 = (-word2) & _MASK32
        word1 &= 0x03FFFFFF
    else:
        word1 |= 1 << 26

    mantissa = 0.0
    if word2:
        mantissa = word2 / 4294967296.0
    mantissa += word1
    mantissa /= 1 << (26 if negative else 27)

    if exponent_negative:
        exponent = -exponent
    exponent += 8

    if negative:
        mantissa = -mantissa

    return math.ldexp(mantissa, exponent)


def serialise_series(values: pd.Series) -> pd.Series:
    """Batch wrapper for pandas-UDF use: double series → binary series."""
    return values.map(lambda v: sortable_serialise(float(v)) if v == v else b"\xff" * 9)
