"""Custom stateful streaming operators (applyInPandasWithState).

The foreachBatch segment writer (freshness.py) covers index freshness;
this module covers the other Structured Streaming shape the engine needs:
operators whose semantics REQUIRE cross-micro-batch state.  First up is
streaming exact-dedup — the reference's add_document replace-by-term
idiom (include/xapian/database.h replace_document(unique_term, doc))
applied to an unbounded stream: only the FIRST document with a given
content hash is emitted; later copies are suppressed for the life of the
stream, whichever micro-batch they arrive in.

Scale shape: state is partitioned by a 2-hex-char hash shard (256 groups
spread over the cluster), each group holding only its own seen-hash set —
state size is bounded by distinct content per shard, not stream length.
Two state representations:

- ``state='exact'``: a hash set.  Exact, but the serialized state grows
  with distinct content and is rewritten per batch that admits anything.
- ``state='bloom'``: a fixed-size bloom filter (``bloom_bits`` bits,
  ``bloom_hashes`` probes via Kirsch-Mitzenmacher double hashing over the
  md5 hex itself).  State size is CONSTANT per shard for the life of the
  stream — the 100 TB path.  Trade: false positives wrongly suppress a
  first-seen document at the filter's FP rate (~(1-e^{-kn/m})^k); no
  duplicate is ever emitted (no false negatives).

Both modes skip ``state.update`` entirely on micro-batches that admit
nothing new — duplicate-only batches cost zero state serialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

_BIT_MASK = np.array([1, 2, 4, 8, 16, 32, 64, 128], dtype=np.uint8)


class BloomFilter:
    """Fixed-size bloom filter over 32-hex md5 strings.

    Probe positions come from double hashing the hash's own hex halves
    (h1 + i·h2 mod m) — no extra hashing work per probe."""

    def __init__(self, bits: int = 1 << 20, k: int = 7, buf: bytes | None = None):
        if bits % 8:
            raise ValueError("bits must be a multiple of 8")
        self.m = bits
        self.k = k
        if buf is not None:
            self.arr = np.frombuffer(bytes(buf), dtype=np.uint8).copy()
            if len(self.arr) != bits // 8:
                raise ValueError("state buffer does not match bloom_bits")
        else:
            self.arr = np.zeros(bits // 8, dtype=np.uint8)

    def _positions(self, h: str) -> np.ndarray:
        a = int(h[:8], 16)
        b = int(h[8:16], 16) | 1  # odd → walks the whole table
        return (a + np.arange(self.k, dtype=np.int64) * b) % self.m

    def __contains__(self, h: str) -> bool:
        pos = self._positions(h)
        return bool(np.all(self.arr[pos >> 3] & _BIT_MASK[pos & 7]))

    def add(self, h: str) -> None:
        pos = self._positions(h)
        # unbuffered scatter-OR: two probes landing in the same byte must
        # BOTH set their bit (fancy-indexed |= keeps only one update)
        np.bitwise_or.at(self.arr, pos >> 3, _BIT_MASK[pos & 7])

    def tobytes(self) -> bytes:
        return self.arr.tobytes()


def _admit(seen, ids, hashes):
    """Shared first-seen loop: returns (out_ids, out_hashes, n_new).
    ``seen`` needs __contains__ and add() — a set or a BloomFilter."""
    out_ids, out_hashes, n_new = [], [], 0
    for did, h in zip(ids, hashes):
        if h not in seen:
            seen.add(h)
            n_new += 1
            out_ids.append(int(did))
            out_hashes.append(h)
    return out_ids, out_hashes, n_new


def streaming_first_seen(
    stream_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "content",
    state: str = "exact",
    bloom_bits: int = 1 << 20,
    bloom_hashes: int = 7,
) -> DataFrame:
    """(doc_id, content_hash) of each content hash's first-seen document.

    Streaming-only (Spark rejects applyInPandasWithState in batch
    queries); the batch equivalent is operators/dedup.exact_duplicates.
    See the module docstring for the ``state`` modes.
    """
    if state not in ("exact", "bloom"):
        raise ValueError("state must be 'exact' or 'bloom'")
    hashed = stream_df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.col(text_col)).alias("content_hash"),
    ).withColumn("shard", F.substring("content_hash", 1, 2))

    if state == "bloom":

        def dedup(key, pdfs, st):
            bf = BloomFilter(
                bloom_bits, bloom_hashes, buf=st.get[0] if st.exists else None
            )
            all_ids, all_hashes, total_new = [], [], 0
            for pdf in pdfs:
                ids, hs, n_new = _admit(bf, pdf["doc_id"], pdf["content_hash"])
                all_ids.extend(ids)
                all_hashes.extend(hs)
                total_new += n_new
            if total_new:  # duplicate-only batch → state untouched
                st.update((bf.tobytes(),))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(all_ids, dtype="int64"),
                    "content_hash": pd.Series(all_hashes, dtype=object),
                }
            )

        state_struct = "seen binary"
    else:

        def dedup(key, pdfs, st):
            seen = set(st.get[0]) if st.exists else set()
            all_ids, all_hashes, total_new = [], [], 0
            for pdf in pdfs:
                ids, hs, n_new = _admit(seen, pdf["doc_id"], pdf["content_hash"])
                all_ids.extend(ids)
                all_hashes.extend(hs)
                total_new += n_new
            if total_new:  # duplicate-only batch → no state rewrite
                st.update((sorted(seen),))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(all_ids, dtype="int64"),
                    "content_hash": pd.Series(all_hashes, dtype=object),
                }
            )

        state_struct = "seen array<string>"

    return hashed.groupBy("shard").applyInPandasWithState(
        dedup,
        outputStructType="doc_id long, content_hash string",
        stateStructType=state_struct,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
