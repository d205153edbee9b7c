"""Grid-bucketed spatial join.

The reference stores MySQL spatial columns (``POLYGON boundary``,
``POINT coordinates`` — ``services/etlService.js:547-548``) but never
queries them; SURVEY §1.2/§7.3 maps them to plain columns plus custom
geo ops. This module supplies the missing query capability in the way
every distributed engine does it (GeoSpark/Sedona, BigQuery GIS):
bucket space into grid cells sized to the query radius, replicate the
small side into its 3×3 cell neighborhood, equi-join on cell id, then
apply the exact distance predicate. Turns an all-pairs theta join
into a hash join + narrow filter.

Determinism: the fixtures carry no coordinates, so both engines
synthesize integer points from the key via an LCG-style mix; the
distance test is exact 64-bit integer arithmetic — no trig, no
floats, no cross-engine ulp risk (haversine at the edge would break
hash-matching; squared Euclidean on projected integer coordinates is
the portable core, and the grid logic is identical for any metric
bounded by the cell size).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rsbsa_etl_spark import params as P


def _point(key: Column) -> tuple[Column, Column]:
    """deterministic integer point for a key (both engines share it)."""
    return (
        (key * P.GEO_AX) % P.GEO_MOD,
        (key * P.GEO_AY) % P.GEO_MOD,
    )


def radius_pairs(
    customers: DataFrame, suppliers: DataFrame, radius: int | None = None
) -> DataFrame:
    """all (supplier, customer) pairs within ``radius`` (Euclidean).

    Plan shape: the point side gets ONE cell key (narrow); the query
    side replicates into 9 neighbor cells and — being the small
    side × 9 — broadcasts, so the big point table is never shuffled.
    Cell width = radius guarantees every match lies in the 3×3
    neighborhood (any point farther than one cell away is farther
    than ``radius``). At 100 TB this is the Sedona partitioning
    story: grid id is the shuffle/broadcast key, skewed megacells
    can be salted like any hot hash key, and the exact predicate
    stays a codegen'd integer expression.
    """
    r = P.GEO_RADIUS if radius is None else radius
    g = r  # cell width == radius → 3×3 neighborhood suffices

    cx, cy = _point(F.col("c_custkey"))
    pts = customers.select(
        "c_custkey",
        cx.alias("x"),
        cy.alias("y"),
        F.floor(cx / g).alias("gx"),
        F.floor(cy / g).alias("gy"),
    )

    sx, sy = _point(F.col("s_suppkey"))
    offsets = F.expr(
        "array(-1,0,1)"
    )
    queries = (
        suppliers.select("s_suppkey", sx.alias("qx"), sy.alias("qy"))
        .withColumn("dgx", F.explode(offsets))
        .withColumn("dgy", F.explode(offsets))
        .select(
            "s_suppkey",
            "qx",
            "qy",
            (F.floor(F.col("qx") / g) + F.col("dgx")).alias("gx"),
            (F.floor(F.col("qy") / g) + F.col("dgy")).alias("gy"),
        )
    )
    dx = F.col("x") - F.col("qx")
    dy = F.col("y") - F.col("qy")
    dist2 = dx * dx + dy * dy
    return (
        pts.join(F.broadcast(queries), ["gx", "gy"])
        .where(dist2 <= F.lit(r * r))
        .select("s_suppkey", "c_custkey", dist2.alias("dist2"))
    )
