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

from pyspark.sql import Column, DataFrame, Window, functions as F

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


def _ts(s: str) -> Column:
    return F.lit(s).cast("timestamp")


def q1_pricing_summary(lineitem: DataFrame, cutoff: str = "2001-09-01") -> DataFrame:
    """Q1 shape — the classic pricing-summary report: one full scan,
    one partial-then-final hash aggregate on a 6-group key space.
    There is no join; the whole query is a single exchange of 6 rows
    after map-side partial aggregation, so it scales linearly with
    input and is the canonical scan-throughput probe.

    Money sums are fixed-point (order-independent longs); averages
    divide a fixed sum by the group count — every op correctly
    rounded IEEE, so the oracle hash-matches bit-for-bit. Quantities
    are integral doubles (sum is exact), surfaced as BIGINT."""
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        lineitem.where(F.col("l_shipdate") <= _ts(cutoff))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
            fixed_sum(F.col("l_extendedprice"), 2, "sum_base_price"),
            fixed_sum(disc_price, 4, "sum_disc_price"),
            fixed_sum(charge, 6, "sum_charge"),
            (F.sum("l_quantity") / cnt).alias("avg_qty"),
            (fixed_sum(F.col("l_extendedprice"), 2) / cnt).alias("avg_price"),
            (fixed_sum(F.col("l_discount"), 2) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q4_priority_late_ship(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    grace_days: int = 30,
) -> DataFrame:
    """Q4 shape — order-priority checking, adapted to the fixture
    (no l_commitdate/l_receiptdate): count orders per priority that
    had at least one lineitem shipped more than ``grace_days`` after
    the order date. EXISTS compiles to a LEFT SEMI join on
    l_orderkey with the lateness predicate as join residual — one
    shuffle on the key, the semi side deduplicates early (no row
    multiplication), then a 5-group aggregate.

    At 100 TB the semi join is the honest plan: the exists-set is
    proportional to orders, too big to broadcast, so a shuffled semi
    join on the equi key with AQE skew splitting is the floor."""
    o = orders.where(
        (F.col("o_orderdate") >= _ts(date_from)) & (F.col("o_orderdate") < _ts(date_to))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = lineitem.select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr(f"INTERVAL {int(grace_days)} DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q6_forecast_revenue(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    qty_below: int = 24,
) -> DataFrame:
    """Q6 shape — forecasting revenue change: a pure selective
    filter + global sum, zero joins, zero group keys. All three
    predicates (shipdate range, discount band, quantity cap) sit on
    the parquet scan as PushedFilters, so row groups outside the
    date range never leave disk — the query is I/O-pruned before
    Spark sees a row. The global sum is a single-row exchange of
    one long (fixed-point), the cheapest possible aggregate."""
    li = lineitem.where(
        (F.col("l_shipdate") >= _ts(date_from))
        & (F.col("l_shipdate") < _ts(date_to))
        & (F.col("l_discount") >= F.lit(disc_lo))
        & (F.col("l_discount") <= F.lit(disc_hi))
        & (F.col("l_quantity") < F.lit(float(qty_below)))
    )
    return li.agg(fixed_sum(F.col("l_extendedprice") * F.col("l_discount"), 4, "revenue"))


def q12_late_shipment_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    late_days: int = 60,
) -> DataFrame:
    """Q12 shape — shipping-priority audit, adapted (no l_shipmode):
    for lineitems shipped ≥ ``late_days`` after their order date in
    one year, count critical- vs normal-priority orders per
    linestatus. Fact-to-fact join on l_orderkey; the shipdate-window
    filter prunes lineitem at the scan, then one shuffle joins the
    two facts and a conditional aggregate (sum-of-CASE) folds both
    counters in a single pass — no second scan, no pivot."""
    li = lineitem.where(
        (F.col("l_shipdate") >= _ts(date_from)) & (F.col("l_shipdate") < _ts(date_to))
    ).select("l_orderkey", "l_linestatus", "l_shipdate")
    o = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr(f"INTERVAL {int(late_days)} DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q13_order_count_distribution(
    customer: DataFrame, orders: DataFrame, excl_priority: str = "5-LOW"
) -> DataFrame:
    """Q13 shape — customer order-count distribution: how many
    customers placed 0, 1, 2… qualifying orders. Aggregate-before-
    join: orders collapse to (custkey, count) partials map-side
    BEFORE touching customer, so the join input is |customers| rows,
    not |orders| — then a left join zero-fills customers with no
    qualifying orders and a second tiny aggregate histograms the
    counts. The naive left-join-then-count shape would shuffle the
    full orders fact; this one shuffles only its per-key counts."""
    per_cust = (
        orders.where(F.col("o_orderpriority") != excl_priority)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    counts = (
        customer.select("c_custkey")
        .join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q14_promo_revenue_share(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1996-09-01",
    date_to: str = "1996-10-01",
    promo_type: str = "PROMO",
) -> DataFrame:
    """Q14 shape — promotion effect: percentage of one month's
    revenue from promo-class parts. The part dimension broadcasts
    (it is a pure dim, ≪ threshold even at SF100k after pruning to
    two columns); lineitem is scan-pruned to the month before the
    join; both the promo and total sums fold in ONE conditional
    aggregate pass — a single scan, a broadcast, one 1-row shuffle.
    The share divides two fixed-point sums (exact longs), then one
    IEEE multiply/divide — bit-stable vs the oracle."""
    li = lineitem.where(
        (F.col("l_shipdate") >= _ts(date_from)) & (F.col("l_shipdate") < _ts(date_to))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = part.select("p_partkey", "p_type")
    rev = _revenue_term()
    promo = fixed_sum(F.when(F.col("p_type") == promo_type, rev).otherwise(F.lit(0.0)), 4)
    total = fixed_sum(rev, 4)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(((F.lit(100.0) * promo) / total).alias("promo_revenue_pct"))
    )


def q7_nation_trade(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """Q7 shape — volume shipping between two nations: revenue per
    (supplier nation, customer nation, ship year) for the two
    directed pairs. The nation filter is applied to BOTH dims before
    any fact touch, so customer/supplier shrink to 2/25ths and
    broadcast; orders is pre-pruned by the broadcast customer join
    (semi-selective) before the one fact-fact shuffle with lineitem
    on l_orderkey. Year extraction is on the already-joined rows.

    At 100 TB: the dims stay broadcast (2 nations of customers
    still ≪ fact); if they ever cross the threshold AQE degrades
    that edge to shuffle while the orderkey exchange is unchanged."""
    nat = nation.where(F.col("n_name").isin(nation_a, nation_b)).select(
        "n_nationkey", "n_name"
    )
    cust = customer.join(
        F.broadcast(nat), customer.c_nationkey == nat.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    supp = supplier.join(
        F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    li = lineitem.where(
        (F.col("l_shipdate") >= _ts(date_from)) & (F.col("l_shipdate") < _ts(date_to))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    ords = orders.select("o_orderkey", "o_custkey").join(
        F.broadcast(cust), F.col("o_custkey") == cust.c_custkey
    )
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(fixed_sum(_revenue_term(), 4, "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    region_name: str = "ASIA",
    target_nation: str = "NATION_3",
    part_type: str = "ECONOMY",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """Q8 shape — national market share: of all revenue for one part
    type sold to customers in one region over two years, what share
    was supplied by one nation, per order year. Every dimension
    (part filtered to a type, customers of one region, suppliers
    with their nation name) broadcasts into the orders⋈lineitem
    spine; numerator and denominator fold in one conditional
    fixed-sum pass per year, then a single IEEE divide — no second
    scan of the facts."""
    reg_nat = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey")
    cust = customer.join(
        F.broadcast(reg_nat), customer.c_nationkey == F.col("n_nationkey")
    ).select("c_custkey")
    supp = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    prt = part.where(F.col("p_type") == part_type).select("p_partkey")
    ords = orders.where(
        (F.col("o_orderdate") >= _ts(date_from)) & (F.col("o_orderdate") < _ts(date_to))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    rev = _revenue_term()
    target = fixed_sum(
        F.when(F.col("supp_nation") == target_nation, rev).otherwise(F.lit(0.0)), 4
    )
    total = fixed_sum(rev, 4)
    return (
        lineitem.select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
        )
        .join(F.broadcast(prt), F.col("l_partkey") == prt.p_partkey)
        .join(ords, F.col("l_orderkey") == ords.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((target / total).alias("mkt_share"))
        .orderBy("o_year")
    )


def q9_product_profit(
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    name_like: str = "%bolt%",
    cost_rate: float = 0.1,
) -> DataFrame:
    """Q9 shape — product-type profit by nation and year, adapted to
    the fixture (no partsupp.ps_supplycost): unit cost is modeled as
    ``cost_rate × p_retailprice``, so profit =
    rev − cost_rate × p_retailprice × l_quantity. part (LIKE-
    filtered) and supplier⋈nation broadcast; the only shuffle is
    lineitem⋈orders on l_orderkey (needed for the order year) plus
    the final (nation, year) aggregate. The LIKE predicate is
    evaluated on the broadcast build side — the fact scan never
    materializes part columns."""
    prt = part.where(F.col("p_name").like(name_like)).select(
        "p_partkey", "p_retailprice"
    )
    supp = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    ords = orders.select("o_orderkey", "o_orderdate")
    amount = _revenue_term() - F.lit(cost_rate) * F.col("p_retailprice") * F.col(
        "l_quantity"
    )
    return (
        lineitem.select(
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice", "l_discount",
        )
        .join(F.broadcast(prt), F.col("l_partkey") == prt.p_partkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(ords, F.col("l_orderkey") == ords.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(fixed_sum(amount, 4, "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q15_top_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """Q15 shape — top supplier(s) by quarterly revenue: aggregate
    lineitem per supplier, keep the max-revenue row(s), decorate
    with supplier attributes. The scalar max is computed once from
    the (tiny) aggregate and broadcast back as a cross-join of one
    row — the fixture-safe version of TPC-H's correlated view; ties
    all surface, ordered by key. Fixed-point revenue makes the
    equality-with-max comparison exact (descaled longs, not float
    noise)."""
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= _ts(date_from)) & (F.col("l_shipdate") < _ts(date_to))
        )
        .groupBy("l_suppkey")
        .agg(fixed_sum(_revenue_term(), 4, "total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q17_small_quantity_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    brand: str = "Brand#11",
    max_size: int = 10,
    qty_frac: float = 0.2,
    years: float = 7.0,
) -> DataFrame:
    """Q17 shape — small-lot revenue for one brand of small parts
    (container column absent → p_size cap stands in): lineitems
    whose quantity is below ``qty_frac`` × that part's average
    quantity. The target-part list broadcasts FIRST, so the per-part
    average aggregates only the ~brand-sized slice of lineitem, not
    the whole fact — the classic correlated subquery decorrelated as
    agg + self-join on the pruned subset. Quantities are integral
    doubles: the per-part mean (exact sum / count) and the 0.2×
    threshold are bit-deterministic."""
    tp = part.where(
        (F.col("p_brand") == brand) & (F.col("p_size") <= max_size)
    ).select("p_partkey")
    li_t = lineitem.select("l_partkey", "l_quantity", "l_extendedprice").join(
        F.broadcast(tp), F.col("l_partkey") == tp.p_partkey
    )
    thresholds = li_t.groupBy("l_partkey").agg(
        (F.lit(qty_frac) * (F.sum("l_quantity") / F.count(F.lit(1)))).alias("qty_cap")
    ).withColumnRenamed("l_partkey", "t_partkey")
    return (
        li_t.join(F.broadcast(thresholds), F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cap"))
        .agg((fixed_sum(F.col("l_extendedprice"), 2) / F.lit(years)).alias("avg_yearly"))
    )


def q18_large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    qty_threshold: int = 280,
    k: int = 100,
) -> DataFrame:
    """Q18 shape — large-volume ("top spender") customers: orders
    whose total lineitem quantity exceeds the threshold, with their
    customer. The HAVING filter collapses lineitem to per-order
    sums map-side first; the surviving key set is tiny (top ~1% of
    orders) and broadcasts into orders, which then broadcasts into
    customer — after the first partial aggregate nothing big moves.
    Output keeps the raw o_totalprice column (no arithmetic → no
    rounding concern) and epoch-seconds order date."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("sum_qty"))
        .where(F.col("sum_qty") > qty_threshold)
    )
    big_orders = orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
    return (
        customer.select("c_custkey", "c_name")
        .join(F.broadcast(big_orders), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.unix_seconds("o_orderdate").alias("o_orderdate_s"),
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(k)
    )


def q19_disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Q19 shape — three-arm disjunctive brand/size/quantity
    predicate (container/shipmode absent → size bands stand in).
    The whole OR-of-ANDs evaluates inside one broadcast hash join:
    part broadcasts pruned to (key, brand, size), the disjunction
    runs as the join residual in whole-stage codegen, and one global
    fixed sum comes back. No union-of-three-scans — one pass."""
    p = part.select("p_partkey", "p_brand", "p_size")
    li = lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    arm1 = (
        (F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1.0, 11.0))
    )
    arm2 = (
        (F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity").between(10.0, 20.0))
    )
    arm3 = (
        (F.col("p_brand") == "Brand#14") & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity").between(20.0, 30.0))
    )
    return j.where(arm1 | arm2 | arm3).agg(
        fixed_sum(_revenue_term(), 4, "revenue")
    )


def q2_min_cost_supplier(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    part_type: str = "LARGE",
    max_size: int = 25,
    k: int = 100,
) -> DataFrame:
    """Q2 shape — best supplier per part, adapted (no partsupp):
    the supply relation is derived as DISTINCT (l_partkey,
    l_suppkey) pairs from lineitem, and "cost" is the supplier's
    account balance (pick the minimum; ties break on s_suppkey).
    The pair-derivation is the one honest big shuffle (distinct on
    the fact); suppliers-in-region and the filtered part list both
    broadcast, and the per-part argmin is a window row_number over
    the already-pruned pair set — partitioned by p_partkey, so it
    scales with parts per region, never a global sort."""
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    prt = part.where(
        (F.col("p_type") == part_type) & (F.col("p_size") <= max_size)
    ).select("p_partkey", "p_name")
    reg_nat = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    supp = supplier.join(
        F.broadcast(reg_nat), supplier.s_nationkey == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("s_acctbal").asc(), F.col("s_suppkey").asc()
    )
    return (
        pairs.join(F.broadcast(prt), pairs.l_partkey == prt.p_partkey)
        .join(F.broadcast(supp), pairs.l_suppkey == F.col("s_suppkey"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.col("s_acctbal").desc(), F.col("p_partkey").asc())
        .limit(k)
    )


def q11_important_stock(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_1",
    over_avg: float = 2.0,
) -> DataFrame:
    """Q11 shape — important-stock identification, adapted (no
    ps_availqty/supplycost): per-part "stock value" is
    Σ l_quantity × p_retailprice over lineitems supplied by one
    nation's suppliers; keep parts whose value exceeds
    ``over_avg`` × the average per-part value. The scale-free
    threshold (vs TPC-H's fixed fraction) keeps the result
    non-degenerate at every SF. Suppliers-of-nation and part price
    broadcast; one shuffle aggregates per part; the scalar
    (total, n_parts) broadcasts back as a 1-row join — no second
    scan of the fact."""
    supp = supplier.join(
        F.broadcast(nation.where(F.col("n_name") == nation_name)),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey")
    per_part = (
        lineitem.select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_partkey")
        .agg(fixed_sum(F.col("l_quantity") * F.col("p_retailprice"), 2, "stock_value"))
    )
    totals = per_part.agg(
        F.sum("stock_value").alias("total_value"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.join(F.broadcast(totals))
        .where(
            F.col("stock_value")
            > (F.lit(over_avg) * F.col("total_value")) / F.col("n_parts")
        )
        .select("p_partkey", "stock_value")
        .orderBy(F.col("stock_value").desc(), F.col("p_partkey").asc())
    )


def q16_supplier_count_by_part(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    excl_brand: str = "Brand#25",
    excl_type: str = "PROMO",
    sizes: tuple = (1, 4, 9, 14, 19, 23, 36, 45),
) -> DataFrame:
    """Q16 shape — supplier breadth per part segment, adapted: the
    part-supplier relation derives from DISTINCT lineitem pairs;
    "complaint" suppliers (the NOT IN subquery) are modeled as
    negative-balance suppliers and removed with a broadcast anti
    join. count(DISTINCT l_suppkey) per (brand, type, size) then
    runs on the pruned pair set — the distinct-pair shuffle is the
    only fact-sized exchange."""
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    prt = part.where(
        (F.col("p_brand") != excl_brand)
        & (F.col("p_type") != excl_type)
        & (F.col("p_size").isin(*[int(s) for s in sizes]))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        pairs.join(F.broadcast(prt), pairs.l_partkey == prt.p_partkey)
        .join(F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
            F.col("p_size").asc(),
        )
    )


def q20_dominant_suppliers(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_1",
    name_like: str = "%bolt%",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    share: float = 0.5,
) -> DataFrame:
    """Q20 shape — suppliers holding excess share, adapted (no
    ps_availqty): a supplier qualifies if it shipped more than
    ``share`` of some bolt-class part's total quantity in the year
    — the "dominant supplier" rewrite of the availqty > ½·shipped
    test. One pass builds per-(part, supplier) and per-part sums
    from the same pruned scan (partial aggs share the shuffle key
    prefix); the share filter joins them on p_partkey; the
    surviving supplier set is tiny and semi-joins the
    nation-filtered supplier dim. Quantity sums are exact integral
    doubles — the share comparison is bit-stable."""
    prt = part.where(F.col("p_name").like(name_like)).select("p_partkey")
    li = (
        lineitem.where(
            (F.col("l_shipdate") >= _ts(date_from)) & (F.col("l_shipdate") < _ts(date_to))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(prt), F.col("l_partkey") == prt.p_partkey)
    )
    per_pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    per_part = li.groupBy("l_partkey").agg(F.sum("l_quantity").alias("part_qty")).withColumnRenamed("l_partkey", "t_partkey")
    dominant = (
        per_pair.join(F.broadcast(per_part), F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("supp_qty") > F.lit(share) * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            F.broadcast(nation.where(F.col("n_name") == nation_name)),
            supplier.s_nationkey == F.col("n_nationkey"),
        )
        .join(F.broadcast(dominant), supplier.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q21_waiting_suppliers(
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    k: int = 100,
) -> DataFrame:
    """Q21 shape — suppliers who kept finished orders waiting,
    adapted (no commit/receipt dates): in multi-supplier orders
    with status 'F', find the orders where exactly ONE supplier
    shipped last (the unique max l_shipdate holder) and count such
    orders per supplier. All three per-order reductions (max
    shipdate, distinct-supplier count, the at-max supplier set)
    group on l_orderkey, so the whole query is ONE shuffle key —
    Spark reuses the exchange across the aggregates; the final
    per-supplier count is a tiny second aggregate decorated by a
    broadcast supplier join."""
    li = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            orders.where(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        )
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("mx"),
        F.countDistinct("l_suppkey").alias("nsupp"),
    )
    at_max = (
        li.join(F.broadcast(per_order), "l_orderkey")
        .where(F.col("l_shipdate") == F.col("mx"))
        .select("l_orderkey", "l_suppkey", "nsupp")
        .distinct()
    )
    sole = (
        at_max.groupBy("l_orderkey", "nsupp")
        .agg(
            F.count(F.lit(1)).alias("n_at_max"),
            F.min("l_suppkey").alias("the_supp"),
        )
        .where((F.col("n_at_max") == 1) & (F.col("nsupp") > 1))
    )
    return (
        sole.groupBy("the_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("the_supp") == F.col("s_suppkey"),
        )
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(k)
    )


def q22_dormant_customers(
    customer: DataFrame,
    orders: DataFrame,
    codes: tuple = ("13", "31", "23", "29", "30", "18", "17"),
    since: str = "1999-01-01",
) -> DataFrame:
    """Q22 shape — global sales opportunity, adapted: customers in
    selected "country code" segments (last two digits of c_name —
    the fixture has no phone column) with above-average positive
    balance and NO orders since the cutoff (every fixture customer
    has old orders, so the official no-orders-ever test would be
    empty). The positive-balance average broadcasts as a 1-row
    scalar; dormancy is a shuffled LEFT ANTI against date-pruned
    orders (the exists-set is fact-sized — anti join on the key is
    the honest plan); the final rollup groups a handful of codes.
    Balances are 2-dp doubles: the fixed-sum average and the
    comparison are exact."""
    code = F.expr("right(c_name, 2)")
    cust = customer.select(
        "c_custkey", code.alias("cntrycode"), "c_acctbal"
    ).where(F.col("cntrycode").isin(*list(codes)))
    avg_bal = (
        customer.where(F.col("c_acctbal") > 0.0)
        .agg((fixed_sum(F.col("c_acctbal"), 2) / F.count(F.lit(1))).alias("avg_bal"))
    )
    recent = orders.where(F.col("o_orderdate") >= _ts(since)).select("o_custkey")
    return (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            fixed_sum(F.col("c_acctbal"), 2, "totacctbal"),
        )
        .orderBy("cntrycode")
    )
