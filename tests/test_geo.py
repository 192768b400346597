"""Geospatial (xapian-core/geospatial/): haversine metric, distance
posting source, distance key maker — Column-math parity vs the pointwise
float64 implementation and known real-world distances."""

import math

import pytest


def test_great_circle_known_distances():
    from xapian_spark.operators.geo import great_circle_distance

    # London (51.5074, -0.1278) ↔ Paris (48.8566, 2.3522) ≈ 343-344 km
    d = great_circle_distance((51.5074, -0.1278), (48.8566, 2.3522))
    assert 340_000 < d < 348_000
    # identical points → 0; antipodes → radius·π
    assert great_circle_distance((10, 20), (10, 20)) == 0.0
    from xapian_spark.operators.geo import QUAD_EARTH_RADIUS_METRES as R

    d = great_circle_distance((0, 0), (0, 180))
    assert abs(d - R * math.pi) < 1.0


def test_column_matches_pointwise(spark):
    from pyspark.sql import functions as F

    from xapian_spark.operators.geo import (
        great_circle_distance,
        great_circle_distance_col,
    )

    pts = [(i, 40.0 + i * 0.7, -30.0 + i * 1.3) for i in range(50)]
    df = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    centre = (41.2, -28.9)
    got = {
        r["doc_id"]: r["d"]
        for r in df.select(
            "doc_id",
            great_circle_distance_col(F.col("lat"), F.col("lon"), centre).alias("d"),
        ).collect()
    }
    for i, lat, lon in pts:
        want = great_circle_distance((lat, lon), centre)
        assert abs(got[i] - want) <= 1e-6 * max(want, 1.0), (i, got[i], want)


def test_distance_posting_source_and_range(spark):
    from xapian_spark.operators.geo import (
        great_circle_distance,
        latlong_distance_source,
    )

    pts = [(1, 51.5074, -0.1278), (2, 48.8566, 2.3522), (3, 40.7128, -74.006)]
    docs = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    centre = (51.5074, -0.1278)
    src = latlong_distance_source(docs, centre, k1=1000.0, k2=1.0)
    rows = {r["doc_id"]: r["weight"] for r in src.collect()}
    # weight_from_distance: k1/(dist+k1); dist 0 → weight 1
    assert abs(rows[1] - 1.0) < 1e-12
    d_paris = great_circle_distance((48.8566, 2.3522), centre)
    assert abs(rows[2] - 1000.0 / (d_paris + 1000.0)) < 1e-12
    assert rows[1] > rows[2] > rows[3]
    # max_range drops New York but keeps Paris (bounding-box prefilter is
    # sound: no in-range doc lost)
    near = latlong_distance_source(docs, centre, max_range=500_000.0)
    assert {r["doc_id"] for r in near.collect()} == {1, 2}
    # k2 != 1 path
    src2 = latlong_distance_source(docs, centre, k1=1000.0, k2=2.0)
    w2 = {r["doc_id"] for r in src2.collect()}
    assert w2 == {1, 2, 3}


def test_distance_keymaker_sort(spark):
    from xapian_spark.operators.geo import latlong_distance_keys

    pts = [(1, 51.5, -0.12), (2, 48.85, 2.35), (3, 40.7, -74.0)]
    docs = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    keys = latlong_distance_keys(docs, (51.5, -0.12))
    ordered = [r["doc_id"] for r in keys.orderBy("distance", "doc_id").collect()]
    assert ordered == [1, 2, 3]


def test_posting_source_leaf_with_distance_boost(spark, index, matcher):
    """Q.PostingSource: external (doc_id, weight) DF as a query leaf —
    here a geo distance source AND_MAYBE-boosting a text query
    (ExternalPostList / matcher.cc external source path)."""
    from pyspark.sql import functions as F

    from xapian_spark.plans import query as Q

    base = matcher.matches(Q.Term("return")).select("doc_id").limit(50)
    ids = [r["doc_id"] for r in base.collect()]
    assert ids
    boost = spark.createDataFrame(
        [(d, 0.5 if d % 2 == 0 else 0.1) for d in ids],
        "doc_id long, weight double",
    )
    q = Q.AndMaybe(Q.Term("return"), Q.PostingSource(boost))
    plain = {r["doc_id"]: r["weight"] for r in matcher.matches(Q.Term("return")).collect()}
    boosted = {r["doc_id"]: r["weight"] for r in matcher.matches(q).collect()}
    assert set(boosted) == set(plain)
    for d in ids:
        want = plain[d] + (0.5 if d % 2 == 0 else 0.1)
        assert abs(boosted[d] - want) < 1e-9
    # pure source query ranks by its own weights
    top = matcher.mset_df(Q.PostingSource(boost), 5).collect()
    assert all(r["weight"] == 0.5 for r in top)
    # scale-weight applies to source weights
    sc = matcher.matches(Q.ScaleWeight(Q.PostingSource(boost), 2.0)).collect()
    assert {round(r["weight"], 9) for r in sc} == {1.0, 0.2}
