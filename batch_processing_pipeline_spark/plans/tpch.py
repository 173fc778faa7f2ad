"""TPC-H query suite over the fixture star schema.

The classic decision-support workload a user of the reference engine's
relational surface would bring to 100 TB: multi-way star joins, correlated
and scalar subqueries, exists/not-exists, group-filter-having, windowed
argmax. Queries follow the official TPC-H formulations, adapted where the
fixture schema trims a column (no ``partsupp`` table, no
``l_shipmode/l_commitdate/l_receiptdate``, no ``c_phone/o_shippriority``);
each adaptation is noted in the query's docstring.

Scale notes (100 TB):
* ``nation``/``region`` are constant-size (25/5 rows) — always broadcast
  explicitly.
* ``customer``/``part``/``supplier`` grow with SF — left to the planner:
  at bench SF they broadcast via AQE; on a cluster their stats push the
  join to shuffled-hash/sort-merge. Hard-coding ``broadcast()`` on them
  would OOM executors at real scale, so the code deliberately does not.
* Every aggregate is expressed on the DataFrame API so Catalyst plans
  partial (map-side) aggregation before the exchange, and every filter is
  a plain column predicate that pushes into the parquet scan.

Floats that reach compared output go through the portable ``round4``
formula (functions/rounding.py) on both the Spark and oracle sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.catalog import table_path
from batch_processing_pipeline_spark.functions.rounding import (
    cents,
    round4,
    sql_cents,
    sql_round4,
)

R = sql_round4


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))

def _rev():
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


_REV_SQL = "l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)"


# Exact revenue in integer units of 1e-4 dollars (the r12 integer-cents
# sweep): l_extendedprice is exact cents E, l_discount exact hundredths D,
# so E·(100−D) is an exact long and the SUM is associative — both engines
# agree bit-for-bit at any scale (a double SUM diverges with group size;
# proven wrong at sf10 by dq20). Headroom: |unit| ≤ ~1e9/row → Σ exact to
# ~9e18 ≈ sf1000 for a global revenue sum.
def _rev_u():
    return cents(F.col("l_extendedprice")) * (
        F.lit(100).cast("long") - cents(F.col("l_discount"))
    )


_REV_U_SQL = (
    f"({sql_cents('l_extendedprice')} * (100 - {sql_cents('l_discount')}))"
)


def _sum_rev():
    """Exact SUM of per-line revenue, returned as double dollars."""
    return F.sum(_rev_u()) / F.lit(10000.0)


_SUM_REV_SQL = f"(SUM({_REV_U_SQL}) / CAST(10000.0 AS DOUBLE))"


def _ts(s: str):
    return F.lit(s).cast("timestamp")


TPCH_QUERIES: dict = {}
TPCH_ORACLES: dict[str, str] = {}


def tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    """Q1 pricing summary report — unmodified (all columns present).

    One scan, map-side partial aggregation on a 6-group key; the shipdate
    predicate pushes into the parquet scan.

    All money aggregates run on exact integer units (r12 sweep): cents for
    base price, 1e-4 dollars for disc_price, 1e-6 for charge (cents ×
    hundredths twice) — associative sums, so both engines agree at any
    scale. Quantity sums are exact already (integer-valued doubles) but go
    through longs too so the avg divisions see identical operands.
    Charge headroom: ≤ ~1.1e11/row in 1e-6 units → a single group stays
    exact to ~80M rows/group past sf10; beyond that switch to
    DECIMAL(38,0).
    """
    l = _t(spark, sf, "lineitem").where(F.col("l_shipdate") <= _ts("2001-09-01"))
    qty = F.col("l_quantity").cast("long")
    ep_c = cents(F.col("l_extendedprice"))
    dh = cents(F.col("l_discount"))
    th = cents(F.col("l_tax"))
    rev_u = ep_c * (F.lit(100).cast("long") - dh)
    charge_u = rev_u * (F.lit(100).cast("long") + th)
    n = F.count(F.lit(1))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        round4(F.sum(qty).cast("double")).alias("sum_qty"),
        round4(F.sum(ep_c) / F.lit(100.0)).alias("sum_base_price"),
        round4(F.sum(rev_u) / F.lit(10000.0)).alias("sum_disc_price"),
        round4(F.sum(charge_u) / F.lit(1000000.0)).alias("sum_charge"),
        round4(F.sum(qty).cast("double") / n).alias("avg_qty"),
        round4(F.sum(ep_c) / (F.lit(100.0) * n)).alias("avg_price"),
        round4(F.sum(dh) / (F.lit(100.0) * n)).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


TPCH_ORACLES["tpch_q1"] = f"""
    SELECT l_returnflag, l_linestatus,
           {R("CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)")} AS sum_qty,
           {R(f"SUM({sql_cents('l_extendedprice')}) / CAST(100.0 AS DOUBLE)")} AS sum_base_price,
           {R(f"SUM({_REV_U_SQL}) / CAST(10000.0 AS DOUBLE)")} AS sum_disc_price,
           {R(f"SUM({_REV_U_SQL} * (100 + {sql_cents('l_tax')})) / CAST(1000000.0 AS DOUBLE)")} AS sum_charge,
           {R("CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)")} AS avg_qty,
           {R(f"SUM({sql_cents('l_extendedprice')}) / (CAST(100.0 AS DOUBLE) * COUNT(*))")} AS avg_price,
           {R(f"SUM({sql_cents('l_discount')}) / (CAST(100.0 AS DOUBLE) * COUNT(*))")} AS avg_disc,
           COUNT(*)                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
"""


def tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    """Q3 shipping priority — adapted: no ``o_shippriority`` column and no
    LIMIT 10 (the driver's compare is order-insensitive; the full group
    set is the stronger check).

    Both date predicates push into their scans BEFORE the joins, so only
    the qualifying slice of orders/lineitem shuffles.
    """
    c = _t(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").where(F.col("o_orderdate") < _ts("1998-01-01"))
    l = _t(spark, sf, "lineitem").where(F.col("l_shipdate") > _ts("1998-01-01"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(round4(_sum_rev()).alias("revenue"))
    )


TPCH_ORACLES["tpch_q3"] = f"""
    SELECT l.l_orderkey, o.o_orderdate, {R(_SUM_REV_SQL)} AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey  = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate
"""


def tpch_q4(spark: SparkSession, sf: str) -> DataFrame:
    """Q4 order priority checking — adapted: the fixture has no
    ``l_commitdate``/``l_receiptdate``, so "late" is a lineitem shipped
    more than 60 days after the order date.

    The EXISTS is a left-semi join: lineitem rows never multiply the
    orders side, and only (orderkey, shipdate) columns leave the scan.
    """
    o = _t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    l = _t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (l.l_orderkey == o.o_orderkey)
        & (F.datediff(F.to_date(l.l_shipdate), F.to_date(o.o_orderdate)) > 60),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


TPCH_ORACLES["tpch_q4"] = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) > 60)
    GROUP BY o_orderpriority
"""


def tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    """Q5 local supplier volume — unmodified.

    The c_nationkey = s_nationkey condition rides on the lineitem-supplier
    join; nation/region broadcast (constant size at any SF).
    """
    n = F.broadcast(_t(spark, sf, "nation"))
    r = F.broadcast(_t(spark, sf, "region").where(F.col("r_name") == "ASIA"))
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    o = _t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    l = _t(spark, sf, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(round4(_sum_rev()).alias("revenue"))
    )


TPCH_ORACLES["tpch_q5"] = f"""
    SELECT n.n_name, {R(_SUM_REV_SQL)} AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey  = o.o_orderkey
    JOIN customer c ON o.o_custkey   = c.c_custkey
    JOIN supplier s ON l.l_suppkey   = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
"""


def tpch_q6(spark: SparkSession, sf: str) -> DataFrame:
    """Q6 forecasting revenue change — unmodified. Pure scan-side query:
    every predicate pushes into parquet, one partial-agg exchange of a
    single double."""
    l = _t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
        & (F.col("l_discount") >= F.lit(0.05))
        & (F.col("l_discount") <= F.lit(0.07))
        & (F.col("l_quantity") < F.lit(24.0))
    )
    disc_u = cents(F.col("l_extendedprice")) * cents(F.col("l_discount"))
    return l.agg(
        round4(F.sum(disc_u) / F.lit(10000.0)).alias("revenue")
    )


TPCH_ORACLES["tpch_q6"] = f"""
    SELECT {R(f"SUM({sql_cents('l_extendedprice')} * {sql_cents('l_discount')}) / CAST(10000.0 AS DOUBLE)")} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
      AND l_quantity < CAST(24.0 AS DOUBLE)
"""


def tpch_q7(spark: SparkSession, sf: str) -> DataFrame:
    """Q7 volume shipping between two nations, both directions, by ship
    year — unmodified. The nation pair filter applies to the broadcast
    dimension rows, so the fact tables are only filtered by join."""
    n1 = F.broadcast(_t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(_t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ))
    s = _t(spark, sf, "supplier")
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    l = _t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") <= _ts("1998-12-31"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, s.s_nationkey == F.col("s_nk"))
        .join(n2, c.c_nationkey == F.col("c_nk"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(round4(_sum_rev()).alias("revenue"))
    )


TPCH_ORACLES["tpch_q7"] = f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           {R(_SUM_REV_SQL)} AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE l.l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1998-12-31'
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY n1.n_name, n2.n_name, CAST(year(l.l_shipdate) AS INTEGER)
"""


def tpch_q8(spark: SparkSession, sf: str) -> DataFrame:
    """Q8 national market share — adapted: ``p_type = 'PROMO'`` (the
    fixture's type vocabulary is single-word).

    The selective part filter drives the funnel: lineitem joins the
    filtered part FIRST, so downstream joins see only promo lines.
    """
    p = _t(spark, sf, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    n1 = F.broadcast(_t(spark, sf, "nation"))
    r = F.broadcast(_t(spark, sf, "region").where(F.col("r_name") == "AMERICA"))
    n2 = F.broadcast(
        _t(spark, sf, "nation").select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
        )
    )
    s = _t(spark, sf, "supplier")
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") <= _ts("1998-12-31"))
    )
    l = _t(spark, sf, "lineitem")
    vol = (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, c.c_nationkey == n1.n_nationkey)
        .join(r, n1.n_regionkey == r.r_regionkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(n2, s.s_nationkey == F.col("s_nk"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev_u().alias("volume_u"),
            "nation",
        )
    )
    # exact integer numerator/denominator (r12 sweep); units cancel in the
    # ratio, so the only float ops are two correctly-rounded long→double
    # conversions and one division — identical in both engines
    share = F.sum(
        F.when(F.col("nation") == "NATION_3", F.col("volume_u")).otherwise(
            F.lit(0).cast("long")
        )
    ).cast("double") / F.sum("volume_u").cast("double")
    return vol.groupBy("o_year").agg(round4(share).alias("mkt_share"))


TPCH_ORACLES["tpch_q8"] = f"""
    WITH vol AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             {_REV_U_SQL} AS volume_u, n2.n_name AS nation
      FROM lineitem l
      JOIN part p     ON l.l_partkey  = p.p_partkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey  = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey  = s.s_suppkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE p.p_type = 'PROMO' AND r.r_name = 'AMERICA'
        AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
    )
    SELECT o_year,
           {R("CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume_u ELSE 0 END) AS DOUBLE) / CAST(SUM(volume_u) AS DOUBLE)")}
               AS mkt_share
    FROM vol GROUP BY o_year
"""


def tpch_q9(spark: SparkSession, sf: str) -> DataFrame:
    """Q9 product-type profit — adapted: the fixture has no ``partsupp``,
    so supply cost is modeled as ``0.6 × p_retailprice`` per unit.

    Part-name filter prunes part before the fact join; profit is computed
    per line map-side and partially aggregated before the exchange.
    """
    p = _t(spark, sf, "part").where(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    n = F.broadcast(_t(spark, sf, "nation"))
    s = _t(spark, sf, "supplier")
    o = _t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    l = _t(spark, sf, "lineitem")
    # exact 1e-4-dollar units (r12 sweep): 0.6·retailprice·qty =
    # 60·retail_cents·qty in 1e-4 units (retailprice 2-dec, qty integer)
    profit_u = _rev_u() - F.lit(60).cast("long") * cents(
        F.col("p_retailprice")
    ) * F.col("l_quantity").cast("long")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(round4(F.sum(profit_u) / F.lit(10000.0)).alias("sum_profit"))
    )


TPCH_ORACLES["tpch_q9"] = f"""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           {R(f"SUM({_REV_U_SQL} - 60 * {sql_cents('p.p_retailprice')} * CAST(l.l_quantity AS BIGINT)) / CAST(10000.0 AS DOUBLE)")}
               AS sum_profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey  = p.p_partkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INTEGER)
"""


def tpch_q10(spark: SparkSession, sf: str) -> DataFrame:
    """Q10 returned-item reporting — adapted: no ``c_address``/``c_phone``
    columns, no LIMIT 20 (order-insensitive compare; full set checked)."""
    n = F.broadcast(_t(spark, sf, "nation"))
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-07-01"))
        & (F.col("o_orderdate") < _ts("1997-10-01"))
    )
    l = _t(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("c_acctbal"), "n_name")
        .agg(round4(_sum_rev()).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            round4(F.col("c_acctbal")).alias("acctbal"),
            "n_name",
            "revenue",
        )
    )


TPCH_ORACLES["tpch_q10"] = f"""
    SELECT c.c_custkey, c.c_name, {R("c.c_acctbal")} AS acctbal, n.n_name,
           {R(_SUM_REV_SQL)} AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-07-01'
      AND o.o_orderdate <  TIMESTAMP '1997-10-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
"""


def tpch_q13(spark: SparkSession, sf: str) -> DataFrame:
    """Q13 customer order-count distribution — adapted: the excluded-
    comment predicate becomes an order-priority exclusion (no o_comment
    column). Two-level aggregation; the outer one is tiny."""
    c = _t(spark, sf, "customer").select("c_custkey")
    o = _t(spark, sf, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


TPCH_ORACLES["tpch_q13"] = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
"""


def tpch_q14(spark: SparkSession, sf: str) -> DataFrame:
    """Q14 promotion effect — adapted: promo test is ``p_type = 'PROMO'``
    (single-word type vocabulary). Scalar result."""
    p = _t(spark, sf, "part").select("p_partkey", "p_type")
    l = _t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-09-01"))
        & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    # exact integer numerator/denominator (r12 sweep); units cancel
    promo_u = F.sum(
        F.when(F.col("p_type") == "PROMO", _rev_u()).otherwise(
            F.lit(0).cast("long")
        )
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            round4(
                F.lit(100.0) * promo_u.cast("double")
                / F.sum(_rev_u()).cast("double")
            ).alias("promo_revenue")
        )
    )


TPCH_ORACLES["tpch_q14"] = f"""
    SELECT {R(f"CAST(100.0 AS DOUBLE) * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_U_SQL} ELSE 0 END) AS DOUBLE) / CAST(SUM({_REV_U_SQL}) AS DOUBLE)")}
               AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01'
"""


def tpch_q15(spark: SparkSession, sf: str) -> DataFrame:
    """Q15 top supplier — revenue per supplier in a quarter, keep the
    max-revenue supplier(s).

    The argmax compares ROUNDED revenues (both engines round first): the
    raw doubles differ in the last ulp across engines because their
    partial-sum orders differ, and a tie at the true max must not break
    differently. Window-max avoids a second scan of lineitem.
    """
    l = _t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    rev = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(round4(_sum_rev()).alias("total_revenue"))
    )
    # scalar max via aggregate + broadcast, not a whole-relation window
    # (supplier is SF-growing; Window.partitionBy() would funnel every
    # supplier row through one reducer)
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    top = rev.crossJoin(F.broadcast(mx)).where(
        F.col("total_revenue") == F.col("_mx")
    )
    s = _t(spark, sf, "supplier")
    return top.join(s, top.supplier_no == s.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


TPCH_ORACLES["tpch_q15"] = f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {R(_SUM_REV_SQL)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def tpch_q17(spark: SparkSession, sf: str) -> DataFrame:
    """Q17 small-quantity-order revenue — adapted: the container predicate
    becomes ``p_size <= 5`` (no p_container column).

    The correlated AVG subquery is a per-part pre-aggregation joined back
    — one extra shuffle of (partkey, avg) pairs instead of a re-scan per
    row, which is the scalable formulation of a correlated subquery.
    """
    p = _t(spark, sf, "part").where(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 5)
    ).select("p_partkey")
    l = _t(spark, sf, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    part_avg = l.groupBy(F.col("l_partkey").alias("avg_pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(part_avg, l.l_partkey == F.col("avg_pk"))
        .where(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            round4(
                F.sum(cents(F.col("l_extendedprice"))) / F.lit(700.0)
            ).alias("avg_yearly")
        )
    )


TPCH_ORACLES["tpch_q17"] = f"""
    SELECT {R(f"SUM({sql_cents('l.l_extendedprice')}) / CAST(700.0 AS DOUBLE)")} AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND p.p_size <= 5
      AND l.l_quantity < (
        SELECT CAST(0.2 AS DOUBLE) * AVG(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
"""


def tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    """Q18 large-volume customers — threshold 250 (the fixture's order
    size distribution tops out near 458; 250 selects the same ~top-2%% the
    official 300-of-7-lines threshold does).

    The HAVING pre-aggregation is a semi-join driver: only qualifying
    orderkeys reach the 3-way join.
    """
    l = _t(spark, sf, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .where(F.col("_sq") > F.lit(250.0))
        .select("l_orderkey")
    )
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (
        l.join(big, "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(round4(F.sum("l_quantity")).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            round4(F.col("o_totalprice")).alias("totalprice"),
            "sum_qty",
        )
    )


TPCH_ORACLES["tpch_q18"] = f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           {R("o.o_totalprice")} AS totalprice, {R("SUM(l.l_quantity)")} AS sum_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey  = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > CAST(250.0 AS DOUBLE)
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
"""


def tpch_q19(spark: SparkSession, sf: str) -> DataFrame:
    """Q19 discounted revenue — adapted: OR-of-three (brand, size-range,
    quantity-range) branches; the shipmode/shipinstruct legs don't exist
    in the fixture.

    The disjunction references both sides, so it stays a residual on the
    partkey equi-join — Catalyst still extracts the equi-key.
    """
    p = _t(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    l = _t(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1.0, 11.0)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10.0, 20.0)
    )
    b3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(20.0, 30.0)
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .where(b1 | b2 | b3)
        .agg(round4(_sum_rev()).alias("revenue"))
    )


TPCH_ORACLES["tpch_q19"] = f"""
    SELECT {R(_SUM_REV_SQL)} AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN CAST(1.0 AS DOUBLE) AND CAST(11.0 AS DOUBLE))
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN CAST(10.0 AS DOUBLE) AND CAST(20.0 AS DOUBLE))
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN CAST(20.0 AS DOUBLE) AND CAST(30.0 AS DOUBLE))
"""


def tpch_q22(spark: SparkSession, sf: str) -> DataFrame:
    """Q22 global sales opportunity — adapted: country code is
    ``c_nationkey`` (no c_phone column); candidate codes are the odd
    nationkeys below 14.

    The AVG threshold is one broadcast row; the NOT EXISTS is an
    anti-join — both scale-safe. The threshold comparison is EXACT
    INTEGER arithmetic (r12 sweep): ``acctbal > avg`` cross-multiplies to
    ``acctbal_cents · n > sum_cents`` so no float enters the boundary
    decision; the sign-safe ``cents`` handles the negative balances.
    "No orders" is "no orders since 2000-06-01" — every fixture customer
    has SOME order, which would make the official predicate vacuous.
    """
    c = _t(spark, sf, "customer").where(
        F.col("c_nationkey").isin([1, 3, 5, 7, 9, 11, 13])
    )
    avg_bal = c.where(F.col("c_acctbal") > F.lit(0.0)).agg(
        F.sum(cents(F.col("c_acctbal"))).alias("_sum_c"),
        F.count(F.lit(1)).alias("_n_c"),
    )
    o = (
        _t(spark, sf, "orders")
        .where(F.col("o_orderdate") >= _ts("2000-06-01"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(cents(F.col("c_acctbal")) * F.col("_n_c") > F.col("_sum_c"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            round4(
                F.sum(cents(F.col("c_acctbal"))) / F.lit(100.0)
            ).alias("totacctbal"),
        )
    )


TPCH_ORACLES["tpch_q22"] = f"""
    SELECT c.c_nationkey AS cntrycode, COUNT(*) AS numcust,
           {R(f"SUM({sql_cents('c.c_acctbal')}) / CAST(100.0 AS DOUBLE)")} AS totacctbal
    FROM customer c
    WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND {sql_cents('c.c_acctbal')} * (
        SELECT COUNT(*) FROM customer c2
        WHERE c2.c_acctbal > CAST(0.0 AS DOUBLE)
          AND c2.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      ) > (
        SELECT SUM({sql_cents('c2.c_acctbal')}) FROM customer c2
        WHERE c2.c_acctbal > CAST(0.0 AS DOUBLE)
          AND c2.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      )
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-06-01')
    GROUP BY c.c_nationkey
"""


# --------------------------------------------------------------------------
# Derived partsupp — unlocks the five queries the fixture's missing table
# blocked (q2, q11, q16, q20, q21).
#
# The fixture ships no ``partsupp`` parquet, so the relation is DERIVED
# deterministically from ``part`` × 4 supplier slots with pure integer
# arithmetic (+ * %) that evaluates bit-identically in Spark and DuckDB;
# the oracle SQL rebuilds the exact same relation as a CTE. Shapes follow
# the official TPC-H generator (4 suppliers per part, availqty 1..9999,
# supplycost 1.00..201.00).
#
# Scale shape: the derivation is two broadcast cross joins (a 4-row index
# relation and a 1-row supplier count) over the part scan — map-side only,
# zero shuffle, and Catalyst treats the result like any other relation
# (prunable columns, pushable predicates).
# --------------------------------------------------------------------------


def derived_partsupp(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic ``partsupp`` derived from part × 4 supplier slots.

    ``ps_suppkey = (p_partkey*7 + i*131) % count(supplier)`` gives each
    part 4 distinct suppliers for any supplier count not dividing 131·i
    (true for the fixture's power-of-ten counts at every SF).
    """
    p = _t(spark, sf, "part").select("p_partkey")
    s_cnt = _t(spark, sf, "supplier").agg(F.count(F.lit(1)).alias("s_cnt"))
    idx = spark.range(4).select(F.col("id").alias("i"))
    base = p.crossJoin(F.broadcast(idx)).crossJoin(F.broadcast(s_cnt))
    suppkey = (F.col("p_partkey") * F.lit(7) + F.col("i") * F.lit(131)) % F.col("s_cnt")
    availqty = ((F.col("p_partkey") * F.lit(11) + suppkey * F.lit(13)) % F.lit(9998) + F.lit(1)).cast("int")
    cost = F.lit(1.0) + (
        (F.col("p_partkey") * F.lit(31) + suppkey * F.lit(17) + F.lit(7)) % F.lit(20000)
    ).cast("double") / F.lit(100.0)
    return base.select(
        F.col("p_partkey").alias("ps_partkey"),
        suppkey.alias("ps_suppkey"),
        availqty.alias("ps_availqty"),
        cost.alias("ps_supplycost"),
    )


# The same relation as a SQL CTE (DuckDB oracle side). Pure +/*/% integer
# arithmetic — no engine-specific functions, no float rounding hazards
# (cost = 1.0 + int/100.0 is the identical IEEE expression both sides).
_PS_SQL = """partsupp AS (
      SELECT p_partkey AS ps_partkey,
             (p_partkey * 7 + i.i * 131) % s.s_cnt AS ps_suppkey,
             CAST((p_partkey * 11 + ((p_partkey * 7 + i.i * 131) % s.s_cnt) * 13) % 9998 + 1 AS INTEGER) AS ps_availqty,
             CAST(1.0 AS DOUBLE)
               + CAST((p_partkey * 31 + ((p_partkey * 7 + i.i * 131) % s.s_cnt) * 17 + 7) % 20000 AS DOUBLE)
                 / CAST(100.0 AS DOUBLE) AS ps_supplycost
      FROM part
      CROSS JOIN (VALUES (0), (1), (2), (3)) AS i(i)
      CROSS JOIN (SELECT COUNT(*) AS s_cnt FROM supplier) AS s
    )"""


def tpch_q2(spark: SparkSession, sf: str) -> DataFrame:
    """Q2 minimum-cost supplier — adapted: partsupp is the derived
    relation; predicate is ``p_size <= 10 AND p_type = 'ECONOMY'`` in
    EUROPE (fixture types are single-word; no p_mfgr/s_address columns);
    no LIMIT 100 (order-insensitive compare, full set is stronger).

    The correlated MIN subquery becomes a window-min over the part key on
    the SAME relation (one shuffle, one pass — same shape as q15's
    argmax): unlike a pre-aggregate joined back, the filtered join tree is
    never computed twice. nation/region broadcast; equality on
    ps_supplycost is safe because both engines derive bit-identical
    per-row doubles (no accumulation).
    """
    ps = derived_partsupp(spark, sf)
    n = F.broadcast(_t(spark, sf, "nation"))
    r = F.broadcast(_t(spark, sf, "region").where(F.col("r_name") == "EUROPE"))
    s = _t(spark, sf, "supplier")
    eu_supp = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = _t(spark, sf, "part").where(
        (F.col("p_size") <= 10) & (F.col("p_type") == "ECONOMY")
    ).select("p_partkey", "p_brand")
    sp = ps.join(eu_supp, ps.ps_suppkey == F.col("s_suppkey")).join(
        p, ps.ps_partkey == F.col("p_partkey")
    )
    w = Window.partitionBy("ps_partkey")
    return (
        sp.withColumn("_min_cost", F.min("ps_supplycost").over(w))
        .where(F.col("ps_supplycost") == F.col("_min_cost"))
        .select(
            round4(F.col("s_acctbal")).alias("acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            round4(F.col("ps_supplycost")).alias("supplycost"),
        )
    )


TPCH_ORACLES["tpch_q2"] = f"""
    WITH {_PS_SQL}
    SELECT {R("s.s_acctbal")} AS acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
           {R("ps.ps_supplycost")} AS supplycost
    FROM partsupp ps
    JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    JOIN part p     ON ps.ps_partkey = p.p_partkey
    WHERE r.r_name = 'EUROPE' AND p.p_size <= 10 AND p.p_type = 'ECONOMY'
      AND ps.ps_supplycost = (
        SELECT MIN(ps2.ps_supplycost)
        FROM partsupp ps2
        JOIN supplier s2 ON ps2.ps_suppkey = s2.s_suppkey
        JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.ps_partkey = ps.ps_partkey AND r2.r_name = 'EUROPE'
      )
"""


def tpch_q11(spark: SparkSession, sf: str) -> DataFrame:
    """Q11 important stock identification — adapted: derived partsupp;
    nation 'NATION_7'; threshold fraction 0.001 (the official 0.0001
    scales with 1/SF — 0.001 keeps the result set non-degenerate at
    fixture SFs).

    The total-value threshold is a 1-row aggregate broadcast back via
    cross join — no driver collect, no rescan. The threshold comparison is
    EXACT INTEGER arithmetic (r12 sweep): value and total are summed as
    long cents (supplycost is 2-decimal, availqty integer) and the 0.001
    fraction becomes the cross-multiplied ``1000·value_c > total_c`` —
    no float ever enters the boundary decision, in either engine.
    """
    ps = derived_partsupp(spark, sf)
    n = F.broadcast(_t(spark, sf, "nation").where(F.col("n_name") == "NATION_7"))
    s = _t(spark, sf, "supplier")
    nat_ps = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .select(
            "ps_partkey",
            (
                cents(F.col("ps_supplycost"))
                * F.col("ps_availqty").cast("long")
            ).alias("v_c"),
        )
    )
    per_part = nat_ps.groupBy("ps_partkey").agg(F.sum("v_c").alias("value_c"))
    total = nat_ps.agg(F.sum("v_c").alias("total_c"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value_c") * F.lit(1000).cast("long") > F.col("total_c"))
        .select(
            "ps_partkey",
            round4(F.col("value_c") / F.lit(100.0)).alias("value"),
        )
    )


TPCH_ORACLES["tpch_q11"] = f"""
    WITH {_PS_SQL},
    nat_ps AS (
      SELECT ps.ps_partkey,
             {sql_cents('ps.ps_supplycost')} * CAST(ps.ps_availqty AS BIGINT) AS v_c
      FROM partsupp ps
      JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_7'
    )
    SELECT ps_partkey, {R("SUM(v_c) / CAST(100.0 AS DOUBLE)")} AS value
    FROM nat_ps
    GROUP BY ps_partkey
    HAVING SUM(v_c) * 1000 > (SELECT SUM(v_c) FROM nat_ps)
"""


def tpch_q16(spark: SparkSession, sf: str) -> DataFrame:
    """Q16 parts/supplier relationship — adapted: derived partsupp;
    excluded brand/type are 'Brand#2'/'PROMO'; the "customer complaints"
    supplier exclusion becomes ``s_acctbal < 0`` (no s_comment column).

    The supplier exclusion is a broadcast anti join (the negative-balance
    relation is tiny at any SF); count(distinct) shuffles only the
    (brand, type, size, suppkey) quad after map-side dedup.
    """
    ps = derived_partsupp(spark, sf)
    p = _t(spark, sf, "part").where(
        (F.col("p_brand") != "Brand#2")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin([1, 4, 7, 10, 14, 19, 23, 36])
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = _t(spark, sf, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(p, ps.ps_partkey == F.col("p_partkey"))
        .join(F.broadcast(bad_supp), ps.ps_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


TPCH_ORACLES["tpch_q16"] = f"""
    WITH {_PS_SQL}
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON ps.ps_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#2' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 7, 10, 14, 19, 23, 36)
      AND ps.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
"""


def tpch_q20(spark: SparkSession, sf: str) -> DataFrame:
    """Q20 potential part promotion — adapted: derived partsupp; part
    filter ``p_name LIKE '%bolt%'``; ship-year 1997; nation 'NATION_3';
    the shipped-quantity correlation is per PART (the official per-
    (part, supplier) correlation is vacuous here because the derived
    partsupp's synthetic supplier slots rarely coincide with lineitem's
    independently generated l_suppkey values).

    Classic nested-EXISTS chain flattened to scale: the per-part
    shipped-quantity aggregate joins partsupp once (no correlated rescan),
    the qualifying partsupp keys reduce to a distinct suppkey set, and
    suppliers keep via a left-semi join. Only aggregates and key sets
    shuffle — lineitem is scanned exactly once.
    """
    p = _t(spark, sf, "part").where(F.col("p_name").like("%bolt%")).select("p_partkey")
    ps = derived_partsupp(spark, sf).join(
        F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"), "left_semi"
    )
    l = _t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    shipped = l.groupBy(F.col("l_partkey").alias("sq_pk")).agg(
        (F.lit(0.5) * F.sum("l_quantity")).alias("half_qty")
    )
    qualifying = (
        ps.join(shipped, F.col("ps_partkey") == F.col("sq_pk"))
        .where(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    n = F.broadcast(_t(spark, sf, "nation").where(F.col("n_name") == "NATION_3"))
    s = _t(spark, sf, "supplier")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(qualifying, s.s_suppkey == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


TPCH_ORACLES["tpch_q20"] = f"""
    WITH {_PS_SQL}
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
        SELECT ps.ps_suppkey
        FROM partsupp ps
        WHERE ps.ps_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%'
          )
          AND ps.ps_availqty > (
            SELECT CAST(0.5 AS DOUBLE) * SUM(l.l_quantity)
            FROM lineitem l
            WHERE l.l_partkey = ps.ps_partkey
              AND l.l_shipdate >= TIMESTAMP '1997-01-01'
              AND l.l_shipdate <  TIMESTAMP '1998-01-01'
          )
      )
"""


def tpch_q21(spark: SparkSession, sf: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting — adapted: the fixture has no
    l_commitdate/l_receiptdate, so "late" is shipped more than 60 days
    after the order date (same adaptation as q4); nation 'NATION_1'.

    The hardest join shape in the suite: for finished orders, a supplier
    is counted when its own line is late (inner join on the late slice),
    ANOTHER supplier has a line on the same order (left-semi on
    orderkey with suppkey inequality riding the join), and NO OTHER
    supplier is late on that order (left-anti, same shape). Both the
    semi and anti probe sides are (orderkey, suppkey) pairs — narrow
    relations, shuffled on orderkey, never multiplying the probe rows.
    """
    n = F.broadcast(_t(spark, sf, "nation").where(F.col("n_name") == "NATION_1"))
    s = _t(spark, sf, "supplier")
    o = _t(spark, sf, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    l = _t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) > 60

    # this supplier's late lines on finished orders
    l1 = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(late)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    # some other supplier has a line on the same order
    l2 = l.select(
        F.col("l_orderkey").alias("l2_ok"), F.col("l_suppkey").alias("l2_sk")
    )
    l1 = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("l2_ok"))
        & (F.col("l_suppkey") != F.col("l2_sk")),
        "left_semi",
    )
    # ... and no other supplier is ALSO late on that order
    l3 = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(late)
        .select(F.col("l_orderkey").alias("l3_ok"), F.col("l_suppkey").alias("l3_sk"))
    )
    l1 = l1.join(
        l3,
        (F.col("l_orderkey") == F.col("l3_ok"))
        & (F.col("l_suppkey") != F.col("l3_sk")),
        "left_anti",
    )
    return (
        l1.join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


TPCH_ORACLES["tpch_q21"] = """
    SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE n.n_name = 'NATION_1'
      AND o.o_orderstatus = 'F'
      AND date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l1.l_shipdate AS DATE)) > 60
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l3.l_shipdate AS DATE)) > 60
      )
    GROUP BY s.s_suppkey, s.s_name
"""


for _name in list(globals()):
    if _name.startswith("tpch_q") and callable(globals()[_name]):
        TPCH_QUERIES[_name] = globals()[_name]


def tpch_q12(spark: SparkSession, sf: str) -> DataFrame:
    """Q12 shipping modes and order priority — adapted: the fixture has no
    ``l_shipmode``/``l_commitdate``/``l_receiptdate``, so (a) shipmode is
    DERIVED deterministically per line (``CASE (l_orderkey*3 +
    l_linenumber) % 7`` — same portable-arithmetic precedent as the
    derived partsupp) and (b) "late" is shipped more than 60 days after
    the order date (same adaptation as q4/q21).

    Version-proof constructs (round-4 fix for the driver hash mismatch):
    lateness is ``datediff`` on DATE-cast columns (not ``+ INTERVAL``,
    whose timestamp arithmetic is timezone/version-sensitive across
    engines) and shipmode is a CASE ladder (not DuckDB list indexing).

    One lineitem scan with the mode filter applied before the join; the
    priority split is a conditional aggregation (no second pass).
    """
    modes = ["AIR", "FOB", "MAIL", "RAIL", "REG AIR", "SHIP", "TRUCK"]
    slot = (F.col("l_orderkey") * 3 + F.col("l_linenumber")) % 7
    shipmode = F.when(slot == 0, modes[0])
    for i, m in enumerate(modes[1:], start=1):
        shipmode = shipmode.when(slot == i, m)
    l = (
        _t(spark, sf, "lineitem")
        .withColumn("l_shipmode", shipmode)
        .where(F.col("l_shipmode").isin(["MAIL", "SHIP"]))
    )
    o = _t(spark, sf, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    late = (
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) > 60
    )
    high = F.col("o_orderpriority").isin(["1-URGENT", "2-HIGH"])
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(late)
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


TPCH_ORACLES["tpch_q12"] = """
    WITH l AS (
      SELECT l_orderkey,
             CASE CAST((l_orderkey * 3 + l_linenumber) % 7 AS BIGINT)
               WHEN 0 THEN 'AIR' WHEN 1 THEN 'FOB' WHEN 2 THEN 'MAIL'
               WHEN 3 THEN 'RAIL' WHEN 4 THEN 'REG AIR' WHEN 5 THEN 'SHIP'
               ELSE 'TRUCK' END AS l_shipmode,
             l_shipdate
      FROM lineitem
    )
    SELECT l.l_shipmode,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipmode IN ('MAIL', 'SHIP')
      AND date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) > 60
    GROUP BY l.l_shipmode
"""
TPCH_QUERIES["tpch_q12"] = tpch_q12
