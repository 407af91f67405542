package graft.operators

import graft.{Catalog, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Relational operator catalog — SURVEY.md §2.A rows 1–21 re-expressed as
  * idiomatic Spark DataFrame plans over the TESTDATA tables.
  *
  * Every query is declarative (Catalyst handles pushdown / pruning /
  * partial+final aggregation / exchange placement); `broadcast()` hints are
  * applied to dimension tables so the plans stay broadcast joins at any
  * fact-table scale. See Catalog.scala for the cross-engine determinism
  * rules (decimal casts, single-fp-division averages, ordered limits).
  *
  * Reference semantics evidence cited per query (flock files are under
  * /root/reference).
  */
object Relational {
  import Catalog.dec

  private def T(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  // Exact per-row decimal versions of the lineitem money columns.
  private def price(c: Column) = dec(c, 12, 2)
  private def pct(c: Column) = dec(c, 4, 2)

  /** q01 — TPC-H Q1 pricing summary: multi-key GROUP BY, two-phase hash
    * aggregate with SUM/AVG/COUNT (SURVEY §2.A rows 9/10/12; reference plan
    * flock/src/distributed_plan/planner.rs:233-255).
    */
  private val q01 = Q(
    "q01_pricing_summary",
    (s, d) => {
      import s.implicits._
      T(s, d, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02").cast(TimestampType))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity".cast(LongType)).as("sum_qty"),
          dec(sum(price($"l_extendedprice")), 38, 2).as("sum_base_price"),
          dec(sum(price($"l_extendedprice") * dec(lit(1) - pct($"l_discount"), 4, 2)), 38, 4)
            .as("sum_disc_price"),
          dec(sum(price($"l_extendedprice") * dec(lit(1) - pct($"l_discount"), 4, 2)
            * dec(lit(1) + pct($"l_tax"), 4, 2)), 38, 6).as("sum_charge"),
          dec(sum($"l_quantity") / count(lit(1)), 18, 6).as("avg_qty"),
          dec(sum(price($"l_extendedprice")).cast(DoubleType) / count(lit(1)), 18, 6)
            .as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DECIMAL(38,4)) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DECIMAL(38,6)) AS sum_charge,
        CAST(SUM(l_quantity) / COUNT(*) AS DECIMAL(18,6)) AS avg_qty,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS DECIMAL(18,6)) AS avg_price,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** q02 — projection + scalar arithmetic (NEXMark q1 `0.908 * price`,
    * reference benchmarks/src/nexmark/query/q1.sql:1-5; SURVEY §2.A rows
    * 3/18). Narrow ReadSchema: only 3 columns reach the scan.
    */
  private val q02 = Q(
    "q02_project_arith",
    (s, d) => {
      import s.implicits._
      T(s, d, "lineitem").select(
        $"l_orderkey",
        $"l_linenumber",
        dec(price($"l_extendedprice") * dec(lit(0.908), 5, 3), 18, 5).as("eur_price"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
        CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(0.908 AS DECIMAL(5,3)) AS DECIMAL(18,5)) AS eur_price
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** q03 — filter with modulo predicate (NEXMark q2 `auction % 123 = 0`,
    * reference query/q2.sql; plan planner.rs:122. SURVEY §2.A row 4).
    */
  private val q03 = Q(
    "q03_filter_mod",
    (s, d) => {
      import s.implicits._
      T(s, d, "lineitem")
        .filter($"l_orderkey" % 123 === 0)
        .select($"l_orderkey", $"l_partkey", $"l_quantity".cast(LongType).as("qty"))
    },
    Some("""
      SELECT l_orderkey, l_partkey, CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem WHERE l_orderkey % 123 = 0"""))

  /** q04 — TPC-H Q3 shipping priority: 3-way join + agg + ordered top-k
    * (SURVEY §2.A rows 5/9/13/14). customer is broadcast (dim ≪ fact at
    * every scale factor).
    */
  private val q04 = Q(
    "q04_shipping_priority",
    (s, d) => {
      import s.implicits._
      val cust = T(s, d, "customer").filter($"c_mktsegment" === "BUILDING")
      val ord = T(s, d, "orders").filter($"o_orderdate" < lit("1998-01-01").cast(TimestampType))
      val li = T(s, d, "lineitem").filter($"l_shipdate" > lit("1998-01-01").cast(TimestampType))
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate".cast(DateType).as("orderdate"))
        .agg(dec(sum(price($"l_extendedprice") * dec(lit(1) - pct($"l_discount"), 4, 2)), 38, 4)
          .as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    },
    Some("""
      SELECT l_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DECIMAL(38,4)) AS revenue
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_orderkey, orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  /** q05 — TPC-H Q5 shape: 6-way join through region→nation→customer→
    * orders→lineitem→supplier with the c_nationkey = s_nationkey residual
    * (SURVEY §2.A row 5; multi-way joins §2.A row 19). All dims broadcast.
    */
  private val q05 = Q(
    "q05_local_supplier_volume",
    (s, d) => {
      import s.implicits._
      val region = T(s, d, "region").filter($"r_name" === "ASIA")
      val nation = T(s, d, "nation")
      val cust = T(s, d, "customer")
      val supp = T(s, d, "supplier")
      val ord = T(s, d, "orders")
        .filter($"o_orderdate" >= lit("1996-01-01").cast(TimestampType) &&
          $"o_orderdate" < lit("1998-01-01").cast(TimestampType))
      val li = T(s, d, "lineitem")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .join(broadcast(supp),
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(dec(sum(price($"l_extendedprice") * dec(lit(1) - pct($"l_discount"), 4, 2)), 38, 4)
          .as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    },
    Some("""
      SELECT n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DECIMAL(38,4)) AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  /** q06 — TPC-H Q6 forecasting revenue change: tight conjunctive filter +
    * global agg; the whole predicate must reach the parquet scan as
    * PushedFilters (SURVEY §4.1 pushdown row).
    */
  private val q06 = Q(
    "q06_forecast_revenue",
    (s, d) => {
      import s.implicits._
      T(s, d, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01").cast(TimestampType) &&
          $"l_shipdate" < lit("1997-01-01").cast(TimestampType) &&
          $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
        .agg(dec(sum(price($"l_extendedprice") * pct($"l_discount")), 38, 4).as("revenue"),
          count(lit(1)).as("n"))
    },
    Some("""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(38,4)) AS revenue,
        COUNT(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""))

  /** q07 — EXISTS → left-semi join (TPC-H Q4 family; SURVEY §2.A row 19
    * EXISTS; reference tpch/queries/q4.sql).
    */
  private val q07 = Q(
    "q07_exists_semi",
    (s, d) => {
      import s.implicits._
      val ord = T(s, d, "orders")
        .filter($"o_orderdate" >= lit("1997-01-01").cast(TimestampType) &&
          $"o_orderdate" < lit("1997-07-01").cast(TimestampType))
      val li = T(s, d, "lineitem").filter($"l_quantity" >= 45)
      ord.join(li, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** q08 — NOT EXISTS → left-anti join (TPC-H Q21/Q22 family; SURVEY §2.A
    * row 19).
    */
  private val q08 = Q(
    "q08_not_exists_anti",
    (s, d) => {
      import s.implicits._
      val cust = T(s, d, "customer").filter($"c_acctbal" > 0)
      val ord = T(s, d, "orders")
        .filter($"o_orderdate" >= lit("2001-01-01").cast(TimestampType))
      cust.join(ord, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", dec($"c_acctbal", 12, 2).as("acctbal"))
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(12,2)) AS acctbal
      FROM customer
      WHERE c_acctbal > 0
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      ORDER BY c_custkey"""))

  /** q09 — CASE WHEN inside aggregation + conditional share ratio (TPC-H
    * Q8/Q14 family; SURVEY §2.A rows 18/19).
    */
  private val q09 = Q(
    "q09_promo_share",
    (s, d) => {
      import s.implicits._
      val li = T(s, d, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01").cast(TimestampType) &&
          $"l_shipdate" < lit("1996-07-01").cast(TimestampType))
      val part = T(s, d, "part")
      val rev = price($"l_extendedprice") * dec(lit(1) - pct($"l_discount"), 4, 2)
      li.join(broadcast(part), $"l_partkey" === $"p_partkey")
        .agg(
          dec(sum(when($"p_type" === "PROMO", rev).otherwise(dec(lit(0), 12, 2))), 38, 4)
            .as("promo_revenue"),
          dec(sum(rev), 38, 4).as("total_revenue"))
        .select($"promo_revenue", $"total_revenue",
          dec(lit(100.0) * $"promo_revenue".cast(DoubleType) / $"total_revenue".cast(DoubleType),
            18, 6).as("promo_pct"))
    },
    Some("""
      WITH a AS (
        SELECT
          CAST(SUM(CASE WHEN p_type = 'PROMO'
            THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(38,4)) AS promo_revenue,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DECIMAL(38,4)) AS total_revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00')
      SELECT promo_revenue, total_revenue,
        CAST(100.0 * CAST(promo_revenue AS DOUBLE) / CAST(total_revenue AS DOUBLE) AS DECIMAL(18,6)) AS promo_pct
      FROM a"""))

  /** q10 — TPC-H Q10 returned-item report: join + group + ordered top-20
    * (SURVEY §2.A rows 5/9/13/14).
    */
  private val q10 = Q(
    "q10_returned_items",
    (s, d) => {
      import s.implicits._
      val cust = T(s, d, "customer")
      val nation = T(s, d, "nation")
      val ord = T(s, d, "orders")
        .filter($"o_orderdate" >= lit("1996-10-01").cast(TimestampType) &&
          $"o_orderdate" < lit("1997-01-01").cast(TimestampType))
      val li = T(s, d, "lineitem").filter($"l_returnflag" === "R")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name")
        .agg(dec(sum(price($"l_extendedprice") * dec(lit(1) - pct($"l_discount"), 4, 2)), 38, 4)
          .as("revenue"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    },
    Some("""
      SELECT c_custkey, c_name, n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DECIMAL(38,4)) AS revenue
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  /** q11 — GROUP BY + HAVING (TPC-H Q11/Q18 family; SURVEY §2.A row 19). */
  private val q11 = Q(
    "q11_having",
    (s, d) => {
      import s.implicits._
      T(s, d, "lineitem")
        .groupBy($"l_orderkey")
        .agg(sum($"l_quantity".cast(LongType)).as("total_qty"),
          count(lit(1)).as("n_lines"))
        .filter($"total_qty" > 150)
        .orderBy($"total_qty".desc, $"l_orderkey")
    },
    Some("""
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
        COUNT(*) AS n_lines
      FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 150
      ORDER BY total_qty DESC, l_orderkey"""))

  /** q12 — IN subquery → left-semi on the subquery result (SURVEY §2.A
    * row 19 IN subqueries).
    */
  private val q12 = Q(
    "q12_in_subquery",
    (s, d) => {
      import s.implicits._
      val parts = T(s, d, "part")
        .filter($"p_size" >= 40 && $"p_brand".isin("Brand#11", "Brand#22", "Brand#33"))
        .select($"p_partkey")
      T(s, d, "lineitem")
        .join(broadcast(parts), $"l_partkey" === $"p_partkey", "left_semi")
        .groupBy($"l_partkey")
        .agg(sum($"l_quantity".cast(LongType)).as("qty"), count(lit(1)).as("n"))
        .orderBy($"l_partkey")
    },
    Some("""
      SELECT l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty, COUNT(*) AS n
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_size >= 40 AND p_brand IN ('Brand#11','Brand#22','Brand#33'))
      GROUP BY l_partkey ORDER BY l_partkey"""))

  /** q13 — LEFT OUTER JOIN + two-level aggregation (TPC-H Q13 customer
    * distribution; reference tpch/queries/q13.sql; SURVEY §2.A row 19).
    */
  private val q13 = Q(
    "q13_customer_distribution",
    (s, d) => {
      import s.implicits._
      val cust = T(s, d, "customer")
      val ord = T(s, d, "orders").filter($"o_orderpriority" =!= "5-LOW")
      cust.join(ord, $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    },
    Some("""
      SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey) t
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""))

  /** q14 — correlated scalar subquery (TPC-H Q17 small-quantity-order):
    * per-part average joined back; Catalyst decorrelates to an aggregate +
    * join (SURVEY §2.A row 19 correlated subqueries, §4.1 decorrelation).
    */
  private val q14 = Q(
    "q14_small_qty_orders",
    (s, d) => {
      import s.implicits._
      // Scale note: p_partkey → p_brand is 1:1, so semi-joining lineitem
      // against the brand's partkeys BEFORE the per-partkey aggregate is
      // exactly TPC-H Q17's correlated average — but the aggregate now runs
      // over the ~1% brand subset instead of the whole fact table (Catalyst
      // can't push the brand filter through the aggregate by itself).
      val brandParts = T(s, d, "part").filter($"p_brand" === "Brand#23").select($"p_partkey")
      val liBrand = T(s, d, "lineitem")
        .join(broadcast(brandParts), $"l_partkey" === $"p_partkey", "left_semi")
      val avgQty = liBrand.groupBy($"l_partkey".as("ak"))
        .agg((lit(0.2) * sum($"l_quantity") / count(lit(1))).as("qty_threshold"))
      liBrand
        .join(avgQty, $"l_partkey" === $"ak")
        .filter($"l_quantity" < $"qty_threshold")
        .agg(dec(sum(price($"l_extendedprice")), 38, 2).as("total_price"),
          count(lit(1)).as("n"))
    },
    Some("""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS total_price,
        COUNT(*) AS n
      FROM lineitem, part
      WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
        AND l_quantity < (SELECT 0.2 * SUM(l_quantity) / COUNT(*) FROM lineitem l2
                          WHERE l2.l_partkey = lineitem.l_partkey)"""))

  /** q15 — ranking window function: ROW_NUMBER per partition + top-3 filter
    * (NEXMark q6 double-rank pattern, reference query/q6.sql:6-28;
    * SURVEY §2.A row 15).
    */
  private val q15 = Q(
    "q15_window_rank",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      T(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast(LongType))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", dec($"o_totalprice", 12, 2).as("totalprice"), $"rn")
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS totalprice, rn
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
              ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders) t
      WHERE rn <= 3 ORDER BY o_custkey, o_orderkey"""))

  /** q16 — COUNT(DISTINCT …) multi-column (reference window/session.rs:
    * 235-247 uses count_distinct to size windows; SURVEY §2.A row 11).
    */
  private val q16 = Q(
    "q16_count_distinct",
    (s, d) => {
      import s.implicits._
      // Deliberately NOT `agg(countDistinct × 3)`: multiple DISTINCT
      // aggregates make Catalyst plan an Expand (one duplicated row set
      // per distinct column — 4× the fact table into the shuffle). The
      // expand-free form runs one distinct-then-count pass per column:
      // each pass shuffles only the (group, key) DISTINCT pairs after
      // map-side partial dedup, and the three tiny per-group counts
      // broadcast-join back together. At 100 TB the shuffle volume is
      // |distinct pairs| per pass instead of 4×|rows| — the right default
      // whenever keys repeat; p14 shows the sketch form when approximate
      // counts suffice.
      val li = T(s, d, "lineitem")
      // isNotNull matches COUNT(DISTINCT) exactly: SQL excludes NULL keys,
      // but a distinct-rows count would include one (group, NULL) row.
      def dcount(c: String, out: String) =
        li.select($"l_returnflag", col(c)).filter(col(c).isNotNull).distinct()
          .groupBy($"l_returnflag").agg(count(lit(1)).as(out))
      li.groupBy($"l_returnflag").agg(count(lit(1)).as("n_rows"))
        .join(dcount("l_orderkey", "n_orders"), "l_returnflag")
        .join(dcount("l_partkey", "n_parts"), "l_returnflag")
        .join(dcount("l_suppkey", "n_supps"), "l_returnflag")
        .select($"l_returnflag", $"n_orders", $"n_parts", $"n_supps",
          $"n_rows")
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders,
        COUNT(DISTINCT l_partkey) AS n_parts, COUNT(DISTINCT l_suppkey) AS n_supps,
        COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** q17 — global sort + LIMIT (SortExec + top-k; reference
    * driver/funcgen/dag.rs:662-683; SURVEY §2.A rows 13/14). Spark plans a
    * TakeOrderedAndProject — no full global sort is materialized.
    */
  private val q17 = Q(
    "q17_sort_limit",
    (s, d) => {
      import s.implicits._
      T(s, d, "lineitem")
        .select($"l_orderkey", $"l_linenumber", dec($"l_extendedprice", 12, 2).as("xprice"))
        .orderBy($"xprice".desc, $"l_orderkey", $"l_linenumber")
        .limit(100)
    },
    Some("""
      SELECT l_orderkey, l_linenumber, CAST(l_extendedprice AS DECIMAL(12,2)) AS xprice
      FROM lineitem ORDER BY xprice DESC, l_orderkey, l_linenumber LIMIT 100"""))

  /** q18 — equi-join with range residual predicate (NEXMark q4's
    * `b_date_time BETWEEN a_date_time AND expires`, reference
    * query/q4.sql:8-10; SURVEY §2.A row 6): shipdate within 30 days of the
    * order date.
    */
  private val q18 = Q(
    "q18_range_residual_join",
    (s, d) => {
      import s.implicits._
      val ord = T(s, d, "orders")
      val li = T(s, d, "lineitem")
      li.join(ord, $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate".between($"o_orderdate", $"o_orderdate" + expr("INTERVAL 30 DAYS")))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_fast_lines"),
          sum($"l_quantity".cast(LongType)).as("qty"))
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n_fast_lines,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 30 DAY
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** q19 — set operations UNION / INTERSECT / EXCEPT (SURVEY §2.A row 20 —
    * absent from the reference, free in Spark).
    */
  private val q19 = Q(
    "q19_set_ops",
    (s, d) => {
      import s.implicits._
      val buyers96 = T(s, d, "orders")
        .filter($"o_orderdate" >= lit("1996-01-01").cast(TimestampType) &&
          $"o_orderdate" < lit("1997-01-01").cast(TimestampType))
        .select($"o_custkey".as("custkey"))
      val buyers97 = T(s, d, "orders")
        .filter($"o_orderdate" >= lit("1997-01-01").cast(TimestampType) &&
          $"o_orderdate" < lit("1998-01-01").cast(TimestampType))
        .select($"o_custkey".as("custkey"))
      val both = buyers96.intersect(buyers97).withColumn("kind", lit("both"))
      val only96 = buyers96.except(buyers97).withColumn("kind", lit("only96"))
      val only97 = buyers97.except(buyers96).withColumn("kind", lit("only97"))
      both.unionAll(only96).unionAll(only97)
        .groupBy($"kind").agg(count(lit(1)).as("n_customers"))
        .orderBy($"kind")
    },
    Some("""
      WITH b96 AS (SELECT o_custkey AS custkey FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                     AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
           b97 AS (SELECT o_custkey AS custkey FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                     AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
           u AS (
             SELECT custkey, 'both' AS kind FROM (SELECT custkey FROM b96 INTERSECT SELECT custkey FROM b97)
             UNION ALL
             SELECT custkey, 'only96' AS kind FROM (SELECT custkey FROM b96 EXCEPT SELECT custkey FROM b97)
             UNION ALL
             SELECT custkey, 'only97' AS kind FROM (SELECT custkey FROM b97 EXCEPT SELECT custkey FROM b96))
      SELECT kind, COUNT(*) AS n_customers FROM u GROUP BY kind ORDER BY kind"""))

  /** q20 — ROLLUP grouping sets (SURVEY §2.A row 20). */
  private val q20 = Q(
    "q20_rollup",
    (s, d) => {
      import s.implicits._
      T(s, d, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), sum($"l_quantity".cast(LongType)).as("qty"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },
    Some("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  /** q21 — string functions: SUBSTRING / UPPER / LENGTH / LIKE / NOT LIKE /
    * concat (TPC-H SQL surface, SURVEY §2.A row 19).
    */
  private val q21 = Q(
    "q21_string_funcs",
    (s, d) => {
      import s.implicits._
      T(s, d, "part")
        .filter($"p_name".like("%gear%") && !$"p_type".like("ECONOMY%"))
        .select($"p_partkey",
          upper(substring($"p_name", 1, 8)).as("name_prefix"),
          length($"p_name").as("name_len"),
          concat($"p_brand", lit("/"), $"p_type").as("brand_type"))
        .orderBy($"p_partkey")
    },
    Some("""
      SELECT p_partkey, UPPER(SUBSTRING(p_name, 1, 8)) AS name_prefix,
        CAST(LENGTH(p_name) AS INT) AS name_len,
        p_brand || '/' || p_type AS brand_type
      FROM part WHERE p_name LIKE '%gear%' AND p_type NOT LIKE 'ECONOMY%'
      ORDER BY p_partkey"""))

  /** q22 — EXTRACT / date_trunc / interval date arithmetic (TPC-H Q7/Q9
    * EXTRACT(YEAR …); SURVEY §2.A row 19).
    */
  private val q22 = Q(
    "q22_date_parts",
    (s, d) => {
      import s.implicits._
      T(s, d, "orders")
        .groupBy(year($"o_orderdate").as("o_year"), month($"o_orderdate").as("o_month"))
        .agg(count(lit(1)).as("n_orders"),
          dec(sum(dec($"o_totalprice", 12, 2)), 38, 2).as("total"))
        .orderBy($"o_year", $"o_month")
    },
    Some("""
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
        CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS o_month,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS total
      FROM orders GROUP BY o_year, o_month ORDER BY o_year, o_month"""))

  /** q23 — full aggregate-function set MIN/MAX/AVG/SUM/COUNT over doubles
    * (NEXMark q11's count/min/max, reference query/q11.sql; SURVEY §2.A
    * row 10). Doubles go through exact per-row decimal casts.
    */
  private val q23 = Q(
    "q23_agg_functions",
    (s, d) => {
      import s.implicits._
      T(s, d, "events")
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n"),
          min($"value").as("min_v"),
          max($"value").as("max_v"),
          dec(sum(dec($"value", 12, 2)), 38, 2).as("sum_v"),
          dec(sum(dec($"value", 12, 2)).cast(DoubleType) / count(lit(1)), 18, 6).as("avg_v"),
          countDistinct($"user_id").as("n_users"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, COUNT(*) AS n, MIN(value) AS min_v, MAX(value) AS max_v,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_v,
        CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS DECIMAL(18,6)) AS avg_v,
        COUNT(DISTINCT user_id) AS n_users
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** q24 — dedup-by-group (NEXMark q8's GROUP BY dedup pattern, reference
    * query/q8.sql; SURVEY §2.A row 12): first order per customer.
    */
  private val q24 = Q(
    "q24_group_dedup",
    (s, d) => {
      import s.implicits._
      T(s, d, "orders")
        .groupBy($"o_custkey")
        .agg(min($"o_orderkey").as("first_orderkey"),
          min($"o_orderdate").cast(DateType).as("first_orderdate"))
        .orderBy($"o_custkey")
    },
    Some("""
      SELECT o_custkey, MIN(o_orderkey) AS first_orderkey,
        CAST(MIN(o_orderdate) AS DATE) AS first_orderdate
      FROM orders GROUP BY o_custkey ORDER BY o_custkey"""))

  /** q25 — join against own aggregate (NEXMark q7 "bid with max price",
    * reference query/q7.sql; SURVEY §2.A row 7): expressed Spark-first as a
    * rank-over-window instead of agg + self-join — one shuffle, no join.
    */
  private val q25 = Q(
    "q25_argmax_join",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"event_type").orderBy($"value".desc, $"event_id")
      T(s, d, "events")
        .withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .select($"event_type", $"event_id", $"user_id", $"value")
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, event_id, user_id, value FROM (
        SELECT event_type, event_id, user_id, value,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rk
        FROM events) t
      WHERE rk = 1 ORDER BY event_type"""))

  /** q26 — scalar/JSON expressions: get_json_object over the `props` column
    * + math exprs (sqrt/abs/round — reference funcgen/dag.rs:547-561 math
    * tests; SURVEY §2.A row 18).
    */
  private val q26 = Q(
    "q26_json_math",
    (s, d) => {
      import s.implicits._
      T(s, d, "events")
        .select($"event_id",
          get_json_object($"props", "$.k").cast(IntegerType).as("k"),
          dec(sqrt($"value"), 18, 6).as("sqrt_v"),
          dec(round($"value", 1), 12, 1).as("round_v"))
        .filter($"k" % 10 === 0)
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k,
        CAST(SQRT(value) AS DECIMAL(18,6)) AS sqrt_v,
        CAST(ROUND(value, 1) AS DECIMAL(12,1)) AS round_v
      FROM events
      WHERE CAST(json_extract_string(props, '$.k') AS INT) % 10 = 0
      ORDER BY event_id"""))

  /** q27 — as-of join (an operator Spark lacks natively, SURVEY build-guide
    * custom-operator case): for each event, the latest order of the same
    * user at or before the event time. Implemented with the scalable
    * union-merge algorithm — tag both sides, ONE shuffle on the key, sort
    * within partition, carry the last-seen right row forward — instead of
    * an inequality join (which explodes) or a per-key collect. Oracle:
    * DuckDB's native ASOF JOIN. Right side is pre-deduped per (key, time)
    * so ties are deterministic.
    */
  private val q27 = Q(
    "q27_asof_join",
    (s, d) => {
      import s.implicits._
      val ev = T(s, d, "events")
        .select($"user_id".as("k"), unix_micros($"ts").as("t_us"), $"event_id")
      val ord = T(s, d, "orders")
        .groupBy($"o_custkey".as("k"),
          unix_micros($"o_orderdate".cast(TimestampType)).as("t_us"))
        .agg(max($"o_orderkey").as("o_orderkey"))
      val left = ev.select($"k", $"t_us", lit(1).as("side"), $"event_id",
        lit(null).cast(LongType).as("o_orderkey"))
      val right = ord.select($"k", $"t_us", lit(0).as("side"),
        lit(null).cast(LongType).as("event_id"), $"o_orderkey")
      val w = Window.partitionBy($"k").orderBy($"t_us", $"side")
        .rowsBetween(Window.unboundedPreceding, 0)
      left.unionAll(right)
        .withColumn("matched", last($"o_orderkey", ignoreNulls = true).over(w))
        .filter($"side" === 1 && $"matched".isNotNull)
        .select($"event_id", $"k".as("user_id"), $"t_us", $"matched".as("o_orderkey"))
        .orderBy($"event_id")
    },
    Some("""
      WITH ev AS (SELECT user_id AS k, epoch_us(ts) AS t_us, event_id FROM events),
           ord AS (SELECT o_custkey AS k, epoch_us(o_orderdate) AS t_us,
                     MAX(o_orderkey) AS o_orderkey
                   FROM orders GROUP BY 1, 2)
      SELECT event_id, ev.k AS user_id, ev.t_us AS t_us, o_orderkey
      FROM ev ASOF JOIN ord ON ev.k = ord.k AND ev.t_us >= ord.t_us
      ORDER BY event_id"""))

  /** q28 — full window-function suite: lag/lead/rank/dense_rank + running
    * sum over frames (SURVEY §2.A row 15 depth beyond row_number).
    */
  private val q28 = Q(
    "q28_window_suite",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      T(s, d, "orders")
        .select($"o_custkey", $"o_orderkey",
          lag($"o_orderkey", 1).over(w).as("prev_order"),
          lead($"o_orderkey", 1).over(w).as("next_order"),
          rank().over(Window.partitionBy($"o_custkey")
            .orderBy($"o_orderpriority", $"o_orderkey")).cast(LongType).as("prio_rank"),
          dense_rank().over(Window.partitionBy($"o_custkey")
            .orderBy($"o_orderpriority")).cast(LongType).as("prio_dense"),
          dec(sum(dec($"o_totalprice", 12, 2))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)), 38, 2)
            .as("running_total"))
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey,
        lag(o_orderkey, 1) OVER w AS prev_order,
        lead(o_orderkey, 1) OVER w AS next_order,
        rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority, o_orderkey) AS prio_rank,
        dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS prio_dense,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,2)) AS running_total
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey"""))

  /** q29 — CUBE + GROUPING() (SURVEY §2.A row 20). */
  private val q29 = Q(
    "q29_cube_grouping",
    (s, d) => {
      import s.implicits._
      T(s, d, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          grouping($"o_orderstatus").as("g_status"),
          grouping($"o_orderpriority").as("g_prio"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    },
    Some("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_status,
        CAST(GROUPING(o_orderpriority) AS TINYINT) AS g_prio
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""))

  /** q30 — salted aggregation for hot keys: two-stage groupBy (key+salt →
    * key) that spreads a skewed key across partitions before the final
    * combine — the standard 100 TB skew pattern. Values must equal the
    * direct GROUP BY, which is exactly what the oracle runs.
    */
  private val q30 = Q(
    "q30_salted_agg",
    (s, d) => {
      import s.implicits._
      T(s, d, "events")
        .withColumn("salt", pmod(xxhash64($"event_id"), lit(16)))
        .groupBy($"event_type", $"salt")
        .agg(count(lit(1)).as("pn"), sum(dec($"value", 12, 2)).as("pv"))
        .groupBy($"event_type")
        .agg(sum($"pn").as("n"), dec(sum($"pv"), 38, 2).as("sum_v"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_v
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** q31 — per-key top-k via the custom TopKPerKey physical operator
    * (graft.plans — LogicalPlan + Strategy + bounded-heap exec; build-guide
    * tier (c)): top-3 orders per customer by totalprice. The oracle runs
    * the rank-filter formulation the operator replaces — equal result sets
    * prove the operator's semantics.
    */
  private val q31 = Q(
    "q31_topk_native",
    (s, d) => {
      import s.implicits._
      graft.plans.TopK.perKey(
        T(s, d, "orders").select($"o_custkey", $"o_orderkey",
          dec($"o_totalprice", 12, 2).as("totalprice")),
        keys = Seq($"o_custkey"),
        order = Seq($"totalprice".desc, $"o_orderkey".asc),
        k = 3)
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey, totalprice FROM (
        SELECT o_custkey, o_orderkey,
          CAST(o_totalprice AS DECIMAL(12,2)) AS totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
                             ORDER BY CAST(o_totalprice AS DECIMAL(12,2)) DESC,
                                      o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 3 ORDER BY o_custkey, o_orderkey"""))

  /** q32 — pivot: order counts per priority spread across status columns
    * (beyond the reference's surface; free via `groupBy().pivot()`).
    * Missing combinations become 0 on both sides (na.fill / CASE-count).
    */
  private val q32 = Q(
    "q32_pivot",
    (s, d) => {
      import s.implicits._
      T(s, d, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority,
        COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
        COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
        COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** q33 — unpivot/melt: wide part attributes into (attr, val) rows. */
  private val q33 = Q(
    "q33_unpivot",
    (s, d) => {
      import s.implicits._
      T(s, d, "part")
        .select($"p_partkey",
          $"p_size".cast(DoubleType).as("size"),
          dec($"p_retailprice", 12, 2).cast(DoubleType).as("retailprice"))
        .unpivot(Array($"p_partkey"), Array($"size", $"retailprice"),
          "attr", "val")
        .orderBy($"p_partkey", $"attr")
    },
    Some("""
      SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
      UNION ALL
      SELECT p_partkey, 'retailprice' AS attr,
        CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS val FROM part
      ORDER BY p_partkey, attr"""))

  /** q34 — TPC-H Q22 shape: uncorrelated scalar subquery in WHERE (global
    * average) + NOT EXISTS anti-join (SURVEY §2.A row 19).
    */
  private val q34 = Q(
    "q34_global_sales_opportunity",
    (s, d) => {
      import s.implicits._
      val cust = T(s, d, "customer")
      val avgBal = cust.filter($"c_acctbal" > 0)
        .agg((sum(dec($"c_acctbal", 12, 2)).cast(DoubleType) / count(lit(1)))
          .as("avg_bal"))
      val ord = T(s, d, "orders")
        .filter($"o_orderdate" >= lit("2000-01-01").cast(TimestampType))
      cust.crossJoin(broadcast(avgBal))
        .filter($"c_acctbal" > $"avg_bal")
        .join(ord, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("n_cust"),
          dec(sum(dec($"c_acctbal", 12, 2)), 38, 2).as("total_bal"))
        .orderBy($"c_nationkey")
    },
    Some("""
      SELECT c_nationkey, COUNT(*) AS n_cust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS total_bal
      FROM customer
      WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
                         FROM customer WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      GROUP BY c_nationkey ORDER BY c_nationkey"""))

  /** q35 — histogram via explicit bucket arithmetic (DuckDB 1.0 lacks
    * width_bucket; the single `value/50` double op + floor is
    * engine-identical).
    */
  private val q35 = Q(
    "q35_histogram",
    (s, d) => {
      import s.implicits._
      T(s, d, "events")
        .groupBy(floor($"value" / 50.0).cast(IntegerType).as("bucket"))
        .agg(count(lit(1)).as("n"),
          min($"value").as("min_v"), max($"value").as("max_v"))
        .orderBy($"bucket")
    },
    Some("""
      SELECT CAST(FLOOR(value / 50.0) AS INT) AS bucket, COUNT(*) AS n,
        MIN(value) AS min_v, MAX(value) AS max_v
      FROM events GROUP BY bucket ORDER BY bucket"""))

  /** q36 — MapType + generator/explode (Spark's UDTF-shaped operator,
    * §2.A row 21 adjacent): parse `props` JSON into a map and explode it
    * to (key, value) rows.
    */
  private val q36 = Q(
    "q36_map_explode",
    (s, d) => {
      import s.implicits._
      T(s, d, "events")
        .select($"event_id",
          explode(from_json($"props", MapType(StringType, IntegerType))))
        .select($"event_id", $"key", $"value")
        .orderBy($"event_id", $"key")
    },
    Some("""
      SELECT event_id, 'k' AS key, CAST(json_extract_string(props, '$.k') AS INT) AS value
      FROM events ORDER BY event_id, key"""))

  /** q37 — array functions: sort_array + slice + posexplode over the
    * embedding vectors (smallest 3 components per vector as rows).
    */
  private val q37 = Q(
    "q37_array_ops",
    (s, d) => {
      import s.implicits._
      T(s, d, "embeddings")
        .select($"vec_id",
          posexplode(slice(sort_array($"embedding"), 1, 3)).as(Seq("pos", "val")))
        .orderBy($"vec_id", $"pos")
    },
    Some("""
      SELECT vec_id, CAST(i - 1 AS INT) AS pos,
        CAST(list_sort(embedding)[i] AS FLOAT) AS val
      FROM embeddings, range(1, 4) r(i)
      ORDER BY vec_id, pos"""))

  /** q38 — FULL OUTER JOIN with real unmatched rows on BOTH sides:
    * per-customer 1996 revenue ⟗ per-customer 1997 revenue. Customers
    * active in only one of the years surface with a NULL on the other
    * side — the join shape LEFT/SEMI/ANTI can't express. Two partial
    * aggregates shrink each side BEFORE the join (aggregate-then-join, not
    * join-then-aggregate — at 100 TB the join input is per-customer rows,
    * not the fact table).
    */
  private val q38 = Q(
    "q38_full_outer",
    (s, d) => {
      import s.implicits._
      def revByYear(year: Int) =
        T(s, d, "orders")
          .filter(expr(s"EXTRACT(YEAR FROM o_orderdate) = $year"))
          .groupBy($"o_custkey")
          .agg(dec(sum(dec($"o_totalprice", 12, 2)), 38, 2).as(s"rev$year"))
      revByYear(1996).withColumnRenamed("o_custkey", "ck96").as("a")
        .join(revByYear(1997).withColumnRenamed("o_custkey", "ck97").as("b"),
          $"ck96" === $"ck97", "full_outer")
        .select(coalesce($"ck96", $"ck97").as("custkey"),
          $"rev1996", $"rev1997",
          ($"ck96".isNull || $"ck97".isNull).as("single_year"))
        .orderBy($"custkey")
    },
    Some("""
      WITH r96 AS (
        SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS rev1996
        FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996 GROUP BY o_custkey),
      r97 AS (
        SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS rev1997
        FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997 GROUP BY o_custkey)
      SELECT COALESCE(r96.o_custkey, r97.o_custkey) AS custkey,
        rev1996, rev1997,
        (r96.o_custkey IS NULL OR r97.o_custkey IS NULL) AS single_year
      FROM r96 FULL OUTER JOIN r97 ON r96.o_custkey = r97.o_custkey
      ORDER BY custkey"""))

  /** q39 — distribution + value window functions (SURVEY §2.A row 15
    * completing q28's ranking suite): ntile, percent_rank, cume_dist,
    * first/last/nth value. Determinism: the window's ORDER BY carries a
    * unique tiebreak (o_orderdate, o_orderkey), so RANGE and ROWS framing
    * coincide and every value column is single-valued; percent_rank and
    * cume_dist stay DOUBLE on both engines — one division of identical
    * exact integers is IEEE-identical, no decimal rounding in the path.
    * last/nth need the explicit full-partition frame on both sides (the
    * default frame stops at CURRENT ROW).
    */
  private val q39 = Q(
    "q39_window_distribution",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T(s, d, "orders")
        .select($"o_custkey", $"o_orderkey",
          ntile(4).over(w).cast(LongType).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cdist"),
          first_value($"o_orderkey").over(w).as("first_order"),
          last_value($"o_orderkey").over(full).as("last_order"),
          nth_value($"o_orderkey", 2).over(full).as("second_order"))
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey,
        CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        percent_rank() OVER w AS pct_rank,
        cume_dist() OVER w AS cdist,
        first_value(o_orderkey) OVER w AS first_order,
        last_value(o_orderkey) OVER
          (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
        nth_value(o_orderkey, 2) OVER
          (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey"""))

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24,
    q25, q26, q27, q28, q29, q30, q31, q32, q33, q34, q35, q36, q37, q38,
    q39)
}
