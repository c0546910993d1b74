"""Geohash parity: the closed-form 25-bit interleave (the shared SQL
string func_geohash_ops evaluates on BOTH engines) must equal the
canonical bisection geohash algorithm for every point."""

from __future__ import annotations

import random


def _gh_interleave(lat: float, lon: float) -> str:
    """Pure-python mirror of entry_queries._geohash_terms arithmetic."""
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    latq = min(int(((lat + 90.0) / 180.0) * 4096), 4095)
    lonq = min(int(((lon + 180.0) / 360.0) * 8192), 8191)
    v = 0
    for j in range(13):
        v += ((lonq >> (12 - j)) & 1) << (24 - 2 * j)
    for j in range(12):
        v += ((latq >> (11 - j)) & 1) << (23 - 2 * j)
    return "".join(alpha[(v >> (5 * (4 - k))) & 31] for k in range(5))


def _gh_bisection(lat: float, lon: float, precision: int = 5) -> str:
    """Canonical geohash encode (successive interval bisection)."""
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_i, lon_i = (-90.0, 90.0), (-180.0, 180.0)
    even, bit, ch, out = True, 0, 0, []
    while len(out) < precision:
        if even:
            mid = sum(lon_i) / 2
            if lon >= mid:
                ch, lon_i = (ch << 1) | 1, (mid, lon_i[1])
            else:
                ch, lon_i = ch << 1, (lon_i[0], mid)
        else:
            mid = sum(lat_i) / 2
            if lat >= mid:
                ch, lat_i = (ch << 1) | 1, (mid, lat_i[1])
            else:
                ch, lat_i = ch << 1, (lat_i[0], mid)
        even = not even
        bit += 1
        if bit == 5:
            out.append(alpha[ch])
            bit, ch = 0, 0
    return "".join(out)


def test_interleave_matches_bisection_on_known_points():
    for lat, lon, want in [(57.64911, 10.40744, "u4pru"),
                           (37.8324, 112.5584, "ww8p1")]:
        assert _gh_bisection(lat, lon) == want
        assert _gh_interleave(lat, lon) == want


def test_interleave_matches_bisection_randomized():
    rng = random.Random(42)
    for _ in range(500):
        lat = rng.uniform(-89.999, 89.999)
        lon = rng.uniform(-179.999, 179.999)
        assert _gh_interleave(lat, lon) == _gh_bisection(lat, lon), (lat, lon)


def test_sql_string_matches_python_mirror(spark):
    """The actual shared SQL string (via Spark F.expr) equals the
    python mirror — closing the loop expr == mirror == canonical."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.entry_queries import (
        _GEOHASH_CHARS, _geohash_terms)

    rng = random.Random(7)
    pts = [(i, rng.uniform(-89.9, 89.9), rng.uniform(-179.9, 179.9))
           for i in range(60)]
    df = spark.createDataFrame(pts, "i int, lat double, lon double")
    prep = df.select(
        "i", "lat", "lon",
        F.least(F.floor((F.col("lat") + 90.0) / 180.0 * 4096).cast("bigint"),
                F.lit(4095)).alias("latq"),
        F.least(F.floor((F.col("lon") + 180.0) / 360.0 * 8192).cast("bigint"),
                F.lit(8191)).alias("lonq"),
    )
    got = {r["i"]: r["gh"]
           for r in prep.withColumn("ghv", F.expr(_geohash_terms()))
           .select("i", F.expr(_GEOHASH_CHARS).alias("gh")).collect()}
    for i, lat, lon in pts:
        assert got[i] == _gh_bisection(lat, lon), (lat, lon)
