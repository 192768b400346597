"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k against one query vector, computed
  with JVM-side higher-order functions (zip_with + aggregate) — no Python,
  no UDF, scales linearly and parallelizes perfectly (embarrassingly
  parallel scan + TakeOrdered).
- lsh_bucketed_topk: random-hyperplane LSH (sign of dot with md5-derived
  pseudo-random planes) → candidates share ≥1 band bucket with the query →
  exact cosine re-rank of candidates only. The scale path: bucket join
  replaces the full scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_col(vec_col: str, qvec: list[float]):
    q = F.array(*[F.lit(float(x)) for x in qvec])
    v = F.col(vec_col)
    dot = _dot(v, q)
    na = F.sqrt(_dot(v, v))
    nb = F.sqrt(_dot(q, q))
    return dot / (na * nb)


def brute_force_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    scored = emb.select(
        F.col(id_col),
        F.round(cosine_col(vec_col, qvec), round_digits).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)


def _plane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from md5 (portable)."""
    import hashlib

    out = []
    for j in range(dim):
        h = hashlib.md5(f"{seed}:{j}".encode()).hexdigest()
        out.append(int(h[:8], 16) / 0x7FFFFFFF - 1.0)  # roughly [-1, 1]
    return out


def lsh_signature_col(vec_col: str, dim: int, n_planes: int = 16):
    """Bit-string signature column: sign of dot(vec, plane_i)."""
    bits = []
    for s in range(1, n_planes + 1):
        p = F.array(*[F.lit(x) for x in _plane(dim, s)])
        bits.append(F.when(_dot(F.col(vec_col), p) > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_bucketed_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    round_digits: int = 4,
) -> DataFrame:
    """ANN: candidates = rows sharing ≥1 LSH band with the query, re-ranked
    by exact cosine. Recall < 1 by construction (approximate)."""
    dim = len(qvec)
    sig = lsh_signature_col(vec_col, dim, n_planes)
    width = n_planes // bands
    # query signature computed driver-side with the same planes
    import hashlib  # noqa: F401  (planes are md5-derived, see _plane)

    qsig = ""
    for s in range(1, n_planes + 1):
        p = _plane(dim, s)
        qsig += "1" if sum(float(a) * b for a, b in zip(qvec, p)) > 0 else "0"
    conds = None
    sigc = sig
    with_sig = emb.withColumn("_sig", sigc)
    for b in range(bands):
        lo = b * width
        cond = F.substring("_sig", lo + 1, width) == qsig[lo : lo + width]
        conds = cond if conds is None else (conds | cond)
    cand = with_sig.filter(conds)
    scored = cand.select(
        F.col(id_col),
        F.round(cosine_col(vec_col, qvec), round_digits).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)
