"""Grid-bucketed nearest-place join: brute-force parity + plan shape.

The grid join must return EXACTLY the brute-force cross-join answer —
the grid only generates candidate supersets. Parity is checked on a
seeded random sky plus adversarial placements: antimeridian straddlers,
near-pole points (full-ring fallback), over-the-pole neighbours, and
exact grid-boundary coordinates.
"""

import math
import random

import pytest
from pyspark.sql import functions as F

from distributed_extraction_framework_spark.operators.spatial import (
    EARTH_RADIUS_KM,
    haversine_km,
    nearest_places,
)


def _hav(lat1, lon1, lat2, lon2):
    dlat = math.radians(lat2 - lat1) / 2.0
    dlon = math.radians(lon2 - lon1) / 2.0
    a = (
        math.sin(dlat) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(dlon) ** 2
    )
    return 2.0 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


def _brute(points, places, radius_km, k=1):
    out = []
    for pid, plat, plon in points:
        cands = sorted(
            (
                (_hav(plat, plon, qlat, qlon), name)
                for name, qlat, qlon in places
                if _hav(plat, plon, qlat, qlon) <= radius_km
            ),
        )
        for d, name in cands[:k]:
            out.append((pid, name, round(d, 6)))
    return sorted(out)


def _run(spark, points, places, radius_km, k=1):
    pdf = spark.createDataFrame(points, "id string, lat double, lon double")
    qdf = spark.createDataFrame(places, "place string, lat double, lon double")
    got = nearest_places(pdf, qdf, radius_km, k=k)
    return sorted(
        (r["id"], r["place"], round(r["dist_km"], 6)) for r in got.collect()
    )


def test_random_sky_parity(spark):
    rng = random.Random(42)
    points = [
        (f"p{i}", rng.uniform(-85, 85), rng.uniform(-180, 180))
        for i in range(120)
    ]
    places = [
        (f"c{j}", rng.uniform(-85, 85), rng.uniform(-180, 180))
        for j in range(40)
    ]
    for radius in (500.0, 3000.0):
        assert _run(spark, points, places, radius) == _brute(
            points, places, radius
        )


def test_topk_parity(spark):
    rng = random.Random(7)
    points = [(f"p{i}", rng.uniform(-60, 60), rng.uniform(-180, 180))
              for i in range(40)]
    places = [(f"c{j}", rng.uniform(-60, 60), rng.uniform(-180, 180))
              for j in range(30)]
    assert _run(spark, points, places, 5000.0, k=3) == _brute(
        points, places, 5000.0, k=3
    )


def test_antimeridian_and_poles(spark):
    points = [
        ("seam_w", 10.0, -179.9),     # neighbour sits across the seam
        ("seam_e", 10.0, 179.8),
        ("near_pole", 89.5, 0.0),     # full-ring longitude fallback
        ("over_pole", 89.7, 10.0),    # nearest is across the pole
        ("boundary", 45.0, 90.0),     # exact cell-boundary coordinates
        ("lonely", -60.0, 60.0),      # nothing in range → no row
    ]
    places = [
        ("seam_pal", 10.05, 179.95),  # ~25 km from both seam points
        ("polar", 89.6, 170.0),       # over the pole from over_pole
        ("bnd_pal", 45.0, 90.0),      # distance 0, exact boundary
        ("far", 0.0, 0.0),
    ]
    for radius in (100.0, 1000.0):
        assert _run(spark, points, places, radius) == _brute(
            points, places, radius
        )


def test_no_cartesian_in_plan(spark):
    pdf = spark.createDataFrame(
        [("p", 1.0, 2.0)], "id string, lat double, lon double"
    )
    qdf = spark.createDataFrame(
        [("c", 1.0, 2.0)], "place string, lat double, lon double"
    )
    plan = nearest_places(pdf, qdf, 100.0)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_haversine_column_matches_math(spark):
    df = spark.range(1).select(
        haversine_km(F.lit(48.8566), F.lit(2.3522), F.lit(40.7128),
                     F.lit(-74.006)).alias("d")
    )
    got = df.collect()[0]["d"]
    assert got == pytest.approx(_hav(48.8566, 2.3522, 40.7128, -74.006))
    assert got == pytest.approx(5837.0, abs=5.0)  # Paris→NYC ≈ 5837 km


def test_bad_args(spark):
    df = spark.createDataFrame([("p", 0.0, 0.0)],
                               "id string, lat double, lon double")
    with pytest.raises(ValueError):
        nearest_places(df, df.withColumnRenamed("id", "place"), 0.0)
    with pytest.raises(ValueError):
        nearest_places(df, df.withColumnRenamed("id", "place"), 10.0, k=0)
