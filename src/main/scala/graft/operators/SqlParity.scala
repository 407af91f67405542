package graft.operators

import graft.{Q, Tables}

/** SQL front-end parity: the reference drives everything from SQL text
  * (Query.sql → DataFusion, flock/src/query.rs:82-103). These entries run
  * the EXACT SAME SQL string through `spark.sql` that the driver runs
  * through DuckDB as the oracle — one query text, two engines, equal
  * hashes. Dialect constraint: the shared text sticks to ANSI (timestamp
  * literals, explicit casts, comma joins, EXTRACT, ||), which both engines
  * parse identically.
  */
object SqlParity {
  private def sql(name: String, text: String): Q =
    Q(name,
      (s, d) => { Tables.registerAll(s, d); s.sql(text) },
      Some(text))

  private val pricing = sql("sql_q01_pricing",
    """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_base_price,
         COUNT(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""")

  private val topOrders = sql("sql_q03_top_orders",
    """SELECT l_orderkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DECIMAL(38,4)) AS revenue
       FROM customer, orders, lineitem
       WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         AND l_orderkey = o_orderkey
         AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY l_orderkey
       ORDER BY revenue DESC, l_orderkey LIMIT 10""")

  private val orderPriority = sql("sql_q04_order_priority",
    """SELECT o_orderpriority, COUNT(*) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
       GROUP BY o_orderpriority ORDER BY o_orderpriority""")

  private val volume = sql("sql_q05_volume",
    """SELECT n_name,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DECIMAL(38,4)) AS revenue
       FROM customer, orders, lineitem, supplier, nation, region
       WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY n_name ORDER BY revenue DESC, n_name""")

  private val yearly = sql("sql_q22_yearly",
    """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         o_orderstatus || '/' || o_orderpriority AS status_prio,
         COUNT(*) AS n
       FROM orders
       GROUP BY o_year, status_prio
       ORDER BY o_year, status_prio""")

  private val corr = sql("sql_q17_small_qty",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS total_price,
         COUNT(*) AS n
       FROM lineitem, part
       WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
         AND l_quantity < (SELECT 0.2 * SUM(l2.l_quantity) / COUNT(*)
                           FROM lineitem l2
                           WHERE l2.l_partkey = lineitem.l_partkey)""")

  private val custDist = sql("sql_q13_cust_dist",
    """SELECT c_count, COUNT(*) AS custdist FROM (
         SELECT c_custkey, COUNT(o_orderkey) AS c_count
         FROM customer LEFT OUTER JOIN orders
           ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
         GROUP BY c_custkey) t
       GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")

  private val antiJoin = sql("sql_q08_dormant",
    """SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(12,2)) AS acctbal
       FROM customer
       WHERE c_acctbal > 0
         AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                         AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')""")

  private val inSub = sql("sql_q12_in_parts",
    """SELECT l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
         COUNT(*) AS n
       FROM lineitem
       WHERE l_partkey IN (SELECT p_partkey FROM part
                           WHERE p_size >= 40
                             AND p_brand IN ('Brand#11','Brand#22','Brand#33'))
       GROUP BY l_partkey ORDER BY l_partkey""")

  val all: Seq[Q] = Seq(pricing, topOrders, orderPriority, volume, yearly,
    corr, custDist, antiJoin, inSub)
}
