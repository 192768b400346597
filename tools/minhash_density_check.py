"""Controlled superlinearity check for MinHash-LSH candidate pairs
(VERDICT r04 #8).

The round-4 soak saw candidate-pair volume grow faster than doc count on
the bench corpus.  Hypothesis: the bench corpus draws every doc from one
FIXED vocabulary, so the density of chance-similar pairs rises with n
(birthday effect over band signatures) — a property of that corpus, not
of the operator.

This script runs the same minhash pipeline (xxhash64 signatures, bands=2,
max_bucket_size cap on) on a corpus with duplicate density CONSTANT by
construction: each doc family owns a disjoint token universe, and a fixed
fraction of docs are near-copies of their family base.  Chance
cross-family collisions are impossible (no shared shingles), so candidate
pairs must scale with the number of true near-dup families, i.e.
linearly in n.

Usage: python tools/minhash_density_check.py [n_base] [growth_steps]
Defaults: n_base=160_000, steps=3 (n, 2n, 4n).  Prints one line per step
plus the pairwise growth ratios; also runs the bench corpus at the same
sizes for contrast.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

DUP_FRAC_MOD = 20  # every 20th doc is a near-dup of the previous one
TOKENS_PER_DOC = 30


def controlled_corpus(spark, n: int):
    """(doc_id, text): doc i's tokens are unique to family i//2 except that
    docs with i % DUP_FRAC_MOD == DUP_FRAC_MOD-1 are near-copies of doc
    i-1 (one token substituted) — constant near-dup density 1/DUP_FRAC_MOD,
    zero cross-family shingle overlap."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                i = int(i)
                dup = i % DUP_FRAC_MOD == DUP_FRAC_MOD - 1
                base = i - 1 if dup else i
                toks = [f"t{base}_{k}" for k in range(TOKENS_PER_DOC)]
                if dup:
                    toks[-1] = f"t{base}_sub"
                rows.append((i + 1, " ".join(toks)))
            yield pd.DataFrame(rows, columns=["doc_id", "text"])

    return spark.range(n).repartition(64).mapInPandas(gen, "doc_id long, text string")


def run_step(spark, docs, cap=200):
    from pyspark.sql import functions as F

    from xapian_spark.operators.dedup import (
        band_bucket_sizes,
        minhash_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    sh = shingles(docs, w=3)
    sig = minhash_signatures(sh, hash_impl="xxhash64")
    t0 = time.perf_counter()
    pairs = minhash_candidate_pairs(sig, bands=2, max_bucket_size=cap).count()
    sec = time.perf_counter() - t0
    dropped = band_bucket_sizes(sig, bands=2).filter(F.col("m") > cap).count()
    return pairs, sec, dropped


def main():
    from pyspark.sql import functions as F

    from xapian_spark.session import get_spark
    from xapian_spark.sources.corpus import corpus_df

    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 160_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    for label, make in (
        ("controlled", lambda n: controlled_corpus(spark, n)),
        (
            "bench-corpus",
            lambda n: corpus_df(spark, n, n_partitions=64).select(
                "doc_id", F.col("content").alias("text")
            ),
        ),
    ):
        prev = None
        print(f"== {label} (dup density constant by construction: "
              f"{label == 'controlled'}) ==", flush=True)
        for s in range(steps):
            n = n_base * (2**s)
            docs = make(n).persist()
            docs.count()
            pairs, sec, dropped = run_step(spark, docs)
            ratio = f" growth×{pairs / prev:.2f}" if prev else ""
            print(
                f"n={n}: pairs={pairs} ({sec:.1f}s, buckets_dropped={dropped})"
                f"{ratio}",
                flush=True,
            )
            docs.unpersist()
            prev = pairs


if __name__ == "__main__":
    main()
