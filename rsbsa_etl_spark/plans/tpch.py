"""TPC-H-shaped analytical plans over the fixture star schema —
multi-join decision-support queries adapted to the fixture columns
(the fixtures drop o_shippriority / l_suppkey-cost columns, so these
are Q3/Q5/Q10 *shapes*, not the official text).

These exercise what single-operator queries cannot: join ORDER and
STRATEGY selection across 3–6 tables. The scale contract per query:

- dimension tables (region/nation/customer/supplier) broadcast —
  the lineitem/orders fact tables never shuffle for a dim join;
- selective predicates (segment, date window, returnflag) sit ON the
  scan (PushedFilters), so the fact read is pruned before any join;
- aggregates are partial before their one shuffle; top-k compiles to
  TakeOrderedAndProject.

At 100 TB the same plans hold: AQE picks broadcast for every dim
side (all ≪ the 10 MB default threshold even at SF100k for region/
nation; customer crosses over and degrades gracefully to shuffle
join on the already-aggregated side).

Money math is fixed-point (functions/numeric.py): revenue terms are
quantized to 1e-4 longs before summing, so group totals are
order-independent and oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rsbsa_etl_spark.functions.numeric import fixed_sum


def _revenue_term() -> Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def q3_segment_top_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1997-01-01",
    k: int = 10,
) -> DataFrame:
    """Q3 shape — top-k unshipped-revenue orders for one market
    segment: orders placed before the cutoff, lineitems shipped
    after it. customer (filtered to one segment) broadcasts into
    orders; the filtered orders key-set broadcasts into lineitem;
    revenue aggregates per order then TakeOrderedAndProject."""
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.where(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = lineitem.where(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(
            F.broadcast(ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(fixed_sum(_revenue_term(), 4, "revenue"))
        .select(
            "o_orderkey",
            F.unix_seconds("o_orderdate").alias("o_orderdate_s"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(k)
    )


def q5_nation_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """Q5 shape — revenue per nation within one region, counting only
    lineitems whose supplier and ordering customer share the nation
    (the classic "local supplier volume"). Six-table join: region →
    nation → (customer, supplier) broadcast chain into the
    orders⋈lineitem fact spine; one group-by on nation name."""
    nat = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    cust = customer.join(
        F.broadcast(nat), customer.c_nationkey == nat.n_nationkey
    ).select("c_custkey", F.col("n_nationkey").alias("c_nat"), "n_name")
    supp = supplier.join(
        F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey
    ).select("s_suppkey", F.col("n_nationkey").alias("s_nat"))
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(F.broadcast(ords), F.col("l_orderkey") == ords.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .where(F.col("c_nat") == F.col("s_nat"))
        .groupBy("n_name")
        .agg(fixed_sum(_revenue_term(), 4, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def q10_returned_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-07-01",
    k: int = 20,
) -> DataFrame:
    """Q10 shape — top-k customers by revenue lost to returns in one
    quarter-ish window: returned lineitems joined through their
    orders to the customer + nation dims. The fact spine shuffles
    once for the per-customer aggregate; both dims broadcast."""
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(F.broadcast(ords), li.l_orderkey == ords.o_orderkey)
        .groupBy("o_custkey")
        .agg(fixed_sum(_revenue_term(), 4, "revenue"))
        .join(customer, F.col("o_custkey") == customer.c_custkey)
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == nation.n_nationkey,
        )
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(k)
    )
