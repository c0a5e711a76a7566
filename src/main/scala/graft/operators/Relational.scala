package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Relational OLAP core: TPC-H-style declarative plans over the star
  * schema. Every query is a pure DataFrame plan — Catalyst handles
  * predicate pushdown, column pruning, join selection (dims broadcast
  * under the session threshold) and AQE re-planning; nothing here
  * hand-schedules execution.
  *
  * Determinism contract with the DuckDB oracle: all money/quantity
  * aggregates run over exact DECIMAL(18,2) casts (double sums are
  * order-dependent and would hash-mismatch across engines); the final
  * value is cast back to DOUBLE, which is exact and identical on both
  * sides. Ratios divide two exact doubles (IEEE-identical). Dates are
  * emitted as 'yyyy-MM-dd' strings.
  */
object Relational {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  // ---- q1: wide hash aggregate (TPC-H Q1 flavor) ----
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
    val disc = dec(lit(1)) - dec(col("l_discount"))
    l.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * disc).cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * disc * (dec(lit(1)) + dec(col("l_tax"))))
          .cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // The sums are exact decimals on BOTH engines; the final double is
  // produced via a VARCHAR hop on the DuckDB side because its direct
  // DECIMAL(38,s)→DOUBLE cast is not correctly rounded once the
  // scaled integer exceeds 2^53 (1 ulp off at sf≥1 — caught by the
  // round-5 scale trail), while Spark's BigDecimal.doubleValue and
  // DuckDB's string→double parse are both correctly rounded at any
  // scale.
  private def d2d(sum: String) = s"CAST(CAST($sum AS VARCHAR) AS DOUBLE)"

  lazy val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       | ${d2d("sum(CAST(l_quantity AS DECIMAL(18,2)))")} AS sum_qty,
       | ${d2d("sum(CAST(l_extendedprice AS DECIMAL(18,2)))")} AS sum_base_price,
       | ${d2d("sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))")} AS sum_disc_price,
       | ${d2d("sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))))")} AS sum_charge,
       | count(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---- q2: filter + projection pushdown ----
  def q2FilterProject(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .filter(col("p_size") < 20 && col("p_type").isin("ECONOMY", "PROMO"))
      .select(col("p_partkey"), col("p_name"), col("p_type"),
        col("p_retailprice").cast("double").as("price"))
      .orderBy(col("p_partkey"))

  lazy val q2Sql: String =
    """SELECT p_partkey, p_name, p_type, CAST(p_retailprice AS DOUBLE) AS price
      |FROM part WHERE p_size < 20 AND p_type IN ('ECONOMY','PROMO')
      |ORDER BY p_partkey""".stripMargin

  // ---- q3: join + agg + topN (Q3 flavor) ----
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(spark, dir, "orders").filter(col("o_orderdate") < lit("1998-03-15"))
    val l = t(spark, dir, "lineitem").filter(col("l_shipdate") > lit("1998-03-15"))
    val disc = dec(lit(1)) - dec(col("l_discount"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(dec(col("l_extendedprice")) * disc).cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  lazy val q3Sql: String =
    """SELECT l_orderkey,
      | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE) AS revenue,
      | strftime(o_orderdate, '%Y-%m-%d') AS orderdate
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ---- q4: EXISTS → left-semi join (Q4 flavor) ----
  def q4Semijoin(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-07-01") && col("o_orderdate") < lit("1997-10-01"))
    val l = t(spark, dir, "lineitem")
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > expr("o_orderdate + INTERVAL 60 DAYS"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  lazy val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---- q5: snowflake multijoin (Q5 flavor) ----
  def q5Multijoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
    val l = t(spark, dir, "lineitem")
    val s = t(spark, dir, "supplier")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region").filter(col("r_name") === "ASIA")
    val disc = dec(lit(1)) - dec(col("l_discount"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * disc).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  lazy val q5Sql: String =
    """SELECT n_name,
      | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // ---- q6: tight scan + filter + single agg (Q6 flavor) ----
  def q6ScanFilter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount"))).cast("double").as("revenue"))

  lazy val q6Sql: String =
    """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  // ---- q7: window functions (row_number + running sum) ----
  def q7Window(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = t(spark, dir, "orders")
    val byPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val running = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.select(col("o_custkey"), col("o_orderkey"),
        row_number().over(byPrice).as("rnk"),
        sum(dec(col("o_totalprice"))).over(running).cast("double").as("running_spend"))
      .filter(col("rnk") <= 3)
      .orderBy(col("o_custkey"), col("rnk"))
  }

  lazy val q7Sql: String =
    """SELECT o_custkey, o_orderkey, rnk, running_spend FROM (
      |  SELECT o_custkey, o_orderkey,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
      |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_spend
      |  FROM orders) w
      |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin

  // ---- q8: distinct + count distinct ----
  def q8Distinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").filter(col("o_orderstatus") === "O")
      .agg(countDistinct(col("o_custkey")).as("n_custs"),
        countDistinct(col("o_orderpriority")).as("n_prios"),
        count(lit(1)).as("n_orders"))

  lazy val q8Sql: String =
    """SELECT count(DISTINCT o_custkey) AS n_custs, count(DISTINCT o_orderpriority) AS n_prios,
      |       count(*) AS n_orders
      |FROM orders WHERE o_orderstatus = 'O'""".stripMargin

  // ---- q9: global sort + limit (TakeOrderedAndProject) ----
  def q9SortLimit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast("double").as("price"))
      .orderBy(col("price").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)

  lazy val q9Sql: String =
    """SELECT l_orderkey, l_linenumber, CAST(l_extendedprice AS DOUBLE) AS price
      |FROM lineitem ORDER BY price DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin

  // ---- q10: NOT EXISTS → left-anti join ----
  def q10Antijoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").filter(col("o_orderstatus") === "F")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  lazy val q10Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  // ---- q11: group-by + HAVING ----
  def q11Having(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(dec(col("l_quantity"))).cast("double").as("qty"),
        count(lit(1)).as("n_lines"))
      .filter(col("qty") > 500.0)
      .orderBy(col("l_partkey"))

  lazy val q11Sql: String =
    """SELECT l_partkey, CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS qty,
      |       count(*) AS n_lines
      |FROM lineitem GROUP BY l_partkey
      |HAVING CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) > 500.0
      |ORDER BY l_partkey""".stripMargin

  // ---- q12: conditional (CASE) aggregation (Q12 flavor) ----
  def q12CaseAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val l = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01"))
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  lazy val q12Sql: String =
    """SELECT l_returnflag,
      | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      | CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders, lineitem
      |WHERE o_orderkey = l_orderkey
      |  AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- q13: left outer join + grouped count (Q13 flavor) ----
  def q13Outerjoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").filter(col("o_orderpriority") =!= "5-LOW")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  lazy val q13Sql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey) cc
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---- q14: ratio expression over agg (Q14 flavor) ----
  def q14Expr(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-09-01") && col("l_shipdate") < lit("1997-10-01"))
    val p = t(spark, dir, "part")
    val rev = dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount")))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(dec(lit(0)))).cast("double").as("promo_revenue"),
        sum(rev).cast("double").as("total_revenue"))
      .withColumn("promo_pct", lit(100.0) * col("promo_revenue") / col("total_revenue"))
  }

  lazy val q14Sql: String =
    """SELECT promo_revenue, total_revenue, 100.0 * promo_revenue / total_revenue AS promo_pct
      |FROM (
      |  SELECT
      |   CAST(sum(CASE WHEN p_type = 'PROMO'
      |        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
      |   CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE) AS total_revenue
      |  FROM lineitem, part
      |  WHERE l_partkey = p_partkey
      |    AND l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01') x""".stripMargin

  // ---- q15: agg-of-agg, top supplier by revenue (Q15 flavor) ----
  def q15MaxAgg(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-04-01"))
    val disc = dec(lit(1)) - dec(col("l_discount"))
    val revenue = l.groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_extendedprice")) * disc).cast("double").as("total_revenue"))
    val maxRev = revenue.agg(max(col("total_revenue")).as("m"))
    val s = t(spark, dir, "supplier")
    s.join(revenue, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(maxRev), col("total_revenue") === col("m"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  lazy val q15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey,
      |   CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier, revenue
      |WHERE s_suppkey = l_suppkey AND total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // ---- q16: set operations ----
  def q16Setop(spark: SparkSession, dir: String): DataFrame = {
    val building = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k"))
    val bigSpenders = t(spark, dir, "orders").filter(col("o_totalprice") > 300000.0)
      .select(col("o_custkey").as("k"))
    val withF = t(spark, dir, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("k"))
    building.union(bigSpenders).distinct().except(withF).orderBy(col("k"))
  }

  lazy val q16Sql: String =
    """(SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
      | UNION
      | SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000.0)
      |EXCEPT
      |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY k""".stripMargin

  // ---- q17: correlated scalar subquery (Q17 flavor) ----
  def q17ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
    val p = t(spark, dir, "part").filter(col("p_brand") === "Brand#23")
      .select(col("p_partkey"))
    // Semi-join lineitem down to the one brand's parts BEFORE the
    // per-part aggregate: p_partkey is unique, so the per-part avg over
    // the pruned rows is identical, and the aggregate input shrinks by
    // ~|parts|/|brand parts| (~500× at scale) instead of aggregating
    // all of lineitem for a one-brand query. Used twice but NOT
    // persisted: a second pruned broadcast-semi scan is cheaper than
    // leaking an unmanaged cached copy per invocation.
    val lp = l.join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
    // per-part avg quantity via exact sum/count, then double division
    val avgQ = lp.groupBy(col("l_partkey").as("ap"))
      .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"))
    lp.join(avgQ, col("l_partkey") === col("ap"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg((sum(dec(col("l_extendedprice"))).cast("double") / lit(7.0)).as("avg_yearly"))
  }

  lazy val q17Sql: String =
    """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
      |  AND l_quantity < 0.5 * (
      |    SELECT CAST(CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*)
      |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  // ---- q18: IN subquery over grouped HAVING (Q18 flavor) ----
  def q18InSubquery(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
    val big = l.groupBy(col("l_orderkey").as("bk"))
      .agg(sum(dec(col("l_quantity"))).cast("double").as("oq"))
      .filter(col("oq") > 150.0)
      .select(col("bk"))
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    o.join(big, col("o_orderkey") === col("bk"), "left_semi")
      .join(c, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_custkey"), col("o_orderkey"))
      .agg(sum(dec(col("l_quantity"))).cast("double").as("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(20)
  }

  lazy val q18Sql: String =
    """SELECT c_custkey, o_orderkey, CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (
      |    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |    HAVING CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) > 150.0)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_custkey, o_orderkey
      |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin

  // ---- q19: disjunctive multi-column predicates (Q19 flavor) ----
  def q19ComplexPred(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
    val p = t(spark, dir, "part")
    val pred =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) && col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) && col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#15" && col("p_size").between(1, 35) && col("l_quantity").between(20, 30))
    val disc = dec(lit(1)) - dec(col("l_discount"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(pred)
      .agg(sum(dec(col("l_extendedprice")) * disc).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  lazy val q19Sql: String =
    """SELECT
      | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE) AS revenue,
      | count(*) AS n_lines
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey AND (
      |  (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11) OR
      |  (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20) OR
      |  (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))""".stripMargin

  // ---- q20: ROLLUP grouping sets ----
  def q20Rollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_quantity"))).cast("double").as("qty"), count(lit(1)).as("cnt"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  lazy val q20Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS qty, count(*) AS cnt
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // ---- q21: CUBE grouping sets ----
  def q21Cube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("total"), count(lit(1)).as("cnt"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  lazy val q21Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      | CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total, count(*) AS cnt
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // ---- q25: explicit GROUPING SETS (the general form of q20/q21) ----
  // rollup/cube are fixed lattices; GROUPING SETS picks arbitrary ones
  // — here the two single-column marginals plus the grand total,
  // skipping the (flag, status) cross that a cube would also compute.
  // Same execution shape as rollup: one Expand + one hash aggregate.
  // l_quantity is integral in TPC-H, so BIGINT sums are exact.
  def q25GroupingSets(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"), count(lit(1)).as("cnt"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  lazy val q25Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty, count(*) AS cnt
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // ---- q51: grouping_id over a cube (level-tagged rollup rows) ----
  // Completes q20/q21/q25's super-aggregate family with the piece a
  // reporting layer actually keys on: `grouping_id()` distinguishes a
  // REAL NULL group value from a super-aggregate NULL (the classic
  // rollup-consumer bug), and the per-level tag lets one cube feed
  // every drill-down view without re-aggregation. Bit order is the
  // SQL standard's (first grouping column = most significant bit) on
  // both engines. Plan: one pass, cube expansion in the aggregate —
  // same cost class as q21.
  def q51GroupingId(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"),
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"),
        sum(col("l_quantity").cast("long")).as("qty"),
        count(lit(1)).as("cnt"))
      .orderBy(col("gid"), asc_nulls_first("l_returnflag"),
        asc_nulls_first("l_linestatus"))

  lazy val q51Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      | CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
      | CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
      | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty, count(*) AS cnt
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // ---- q52: gaps-and-islands (per-customer order-month streaks) ----
  // The classic sessionization-in-SQL shape: collapse each customer's
  // order history to distinct activity months, then group CONSECUTIVE
  // months into islands via the month-minus-rank trick (two rows are
  // in the same streak iff m - row_number() agrees). Per customer:
  // number of streaks, longest streak, total active months — the
  // engagement-tenure table a retention model trains on. Scale: the
  // window partitions by o_custkey (grow-with-data key, never a
  // global sort) over at most |months| rows per customer — bounded by
  // the calendar, not the order volume; the distinct() before it is
  // the only corpus-sized exchange. Mirrors the reference's repeated
  // per-entity traversal summaries (Runner.java:60 per-node rollups).
  def q52GapsIslands(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = t(spark, dir, "orders")
      .select(col("o_custkey"),
        (year(col("o_orderdate")).cast("long") * 12 +
          month(col("o_orderdate")).cast("long")).as("m"))
      .distinct()
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("m"))
    m.withColumn("grp", col("m") - row_number().over(w))
      .groupBy(col("o_custkey"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_streaks"),
        max(col("len")).as("max_streak"),
        sum(col("len")).as("active_months"))
      .orderBy(col("o_custkey"))
  }

  lazy val q52Sql: String =
    """WITH m AS (SELECT DISTINCT o_custkey,
      |    CAST(year(o_orderdate) AS BIGINT) * 12
      |      + CAST(month(o_orderdate) AS BIGINT) AS m
      |  FROM orders),
      |i AS (SELECT o_custkey,
      |    m - row_number() OVER (PARTITION BY o_custkey ORDER BY m) AS grp
      |  FROM m),
      |s AS (SELECT o_custkey, grp, count(*) AS len FROM i GROUP BY 1, 2)
      |SELECT o_custkey, count(*) AS n_streaks,
      |  CAST(max(len) AS BIGINT) AS max_streak,
      |  CAST(sum(len) AS BIGINT) AS active_months
      |FROM s GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // ---- q53: exact running distinct count (cumulative cardinality) ----
  // "Distinct customers to date" is the KPI that looks like it needs
  // a running COUNT(DISTINCT) over an ever-growing window — quadratic
  // if computed naively, and approximate if HLL'd. The exact linear
  // form: a customer enters the cumulative count exactly once, at its
  // FIRST month — so new_customers(month) = count of first
  // appearances, and the cumulative series is a running sum over the
  // |months|-row summary. Plan: two map-side-combined aggregates over
  // orders (per-month distinct actives; per-customer min month) and
  // one window over the bounded month summary — the q49 posture; the
  // corpus is scanned once per aggregate and never self-joined.
  def q53CumulativeDistinct(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val om = t(spark, dir, "orders")
      .select(col("o_custkey"), date_format(col("o_orderdate"), "yyyy-MM").as("month"))
    val monthly = om.distinct()
      .groupBy(col("month")).agg(count(lit(1)).as("active_customers"))
    val firsts = om.groupBy(col("o_custkey")).agg(min(col("month")).as("month"))
      .groupBy(col("month")).agg(count(lit(1)).as("new_customers"))
    val w = Window.orderBy(col("month"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monthly.join(firsts, Seq("month"), "left_outer")
      .withColumn("new_customers", coalesce(col("new_customers"), lit(0L)))
      .withColumn("cumulative_customers", sum(col("new_customers")).over(w))
      .select(col("month"), col("active_customers"), col("new_customers"),
        col("cumulative_customers"))
      .orderBy(col("month"))
  }

  lazy val q53Sql: String =
    """WITH om AS (SELECT o_custkey, strftime(o_orderdate, '%Y-%m') AS month
      |            FROM orders),
      |a AS (SELECT month, count(*) AS active_customers
      |      FROM (SELECT DISTINCT o_custkey, month FROM om) GROUP BY month),
      |f AS (SELECT month, count(*) AS new_customers
      |      FROM (SELECT o_custkey, min(month) AS month FROM om GROUP BY 1)
      |      GROUP BY month)
      |SELECT a.month, a.active_customers,
      |  CAST(coalesce(f.new_customers, 0) AS BIGINT) AS new_customers,
      |  CAST(sum(coalesce(f.new_customers, 0))
      |    OVER (ORDER BY a.month ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |    AS cumulative_customers
      |FROM a LEFT JOIN f ON a.month = f.month
      |ORDER BY a.month""".stripMargin

  // ---- q54: winsorized statistics (outlier-robust training stats) ----
  // The feature-engineering staple before fitting anything on heavy-
  // tailed money columns: clip at the exact discrete p01/p99 (the
  // e26/q46 percentile_disc ↔ quantile_disc convention) and report
  // the winsorized mean next to the raw one, plus how many rows each
  // tail clipped — the "is the mean three outliers in a trenchcoat"
  // check. Two passes over lineitem: a per-group percentile aggregate
  // (|groups| rows out), then the bounds broadcast back into one
  // map-side-combined clipped aggregate — no corpus-sized window, no
  // sort of the fact table. Exact integer cents end to end.
  def q54Winsorized(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
    val bounds = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile_disc(0.01) WITHIN GROUP (ORDER BY cents)")
          .cast("long").as("lo_cents"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY cents)")
          .cast("long").as("hi_cents"))
    li.join(broadcast(bounds), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"), col("lo_cents"), col("hi_cents"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("cents") < col("lo_cents"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(col("cents") > col("hi_cents"), 1L).otherwise(0L)).as("n_clip_hi"),
        expr("sum(cents) div count(1)").as("mean_cents"),
        expr("sum(greatest(lo_cents, least(hi_cents, cents))) div count(1)")
          .as("wmean_cents"))
      .select(col("l_returnflag"), col("n"), col("lo_cents"), col("hi_cents"),
        col("n_clip_lo"), col("n_clip_hi"), col("mean_cents"), col("wmean_cents"))
      .orderBy(col("l_returnflag"))
  }

  lazy val q54Sql: String =
    """WITH li AS (
      |  SELECT l_returnflag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM lineitem),
      |b AS (
      |  SELECT l_returnflag,
      |    CAST(quantile_disc(cents, 0.01) AS BIGINT) AS lo_cents,
      |    CAST(quantile_disc(cents, 0.99) AS BIGINT) AS hi_cents
      |  FROM li GROUP BY 1)
      |SELECT li.l_returnflag, count(*) AS n, b.lo_cents, b.hi_cents,
      |  CAST(sum(CASE WHEN cents < lo_cents THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clip_lo,
      |  CAST(sum(CASE WHEN cents > hi_cents THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clip_hi,
      |  CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents,
      |  CAST(sum(greatest(lo_cents, least(hi_cents, cents))) // count(*)
      |    AS BIGINT) AS wmean_cents
      |FROM li JOIN b USING (l_returnflag)
      |GROUP BY li.l_returnflag, b.lo_cents, b.hi_cents
      |ORDER BY l_returnflag""".stripMargin

  // ---- q55: ABC-XYZ inventory matrix (threshold classification) ----
  // The supply-chain segmentation every demand planner starts from:
  // ABC = revenue importance, XYZ = demand variability, crossed into
  // a 9-cell matrix. Classified the way it must be done at scale —
  // by THRESHOLDS, not by ranking: the textbook "sort parts by
  // revenue, take the top 80% of cumulative share" is a global sort
  // of a grow-with-data key; here A/B bounds are the exact discrete
  // p80/p50 of the per-part revenue distribution (one percentile
  // aggregate over the part summary, two scalars broadcast), and XYZ
  // uses exact integer relative variance in ppm — relvar = 10^6 ·
  // (n·Σq² − S²) DIV S² (the n·CV² identity, no float sqrt; X/Y/Z
  // cuts at 0.2e6/0.8e6). Monthly demand quantities are exact
  // integer units (×100). Two map-side-combined aggregates + one
  // broadcast join; the 9-row matrix out.
  def q55AbcXyz(spark: SparkSession, dir: String): DataFrame = {
    val monthly = t(spark, dir, "lineitem")
      .select(col("l_partkey"),
        date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        (dec(col("l_quantity")) * 100).cast("long").as("q"),
        (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
      .groupBy(col("l_partkey"), col("month"))
      .agg(sum(col("q")).as("mq"), sum(col("cents")).as("mc"))
    // sq2 accumulates DECIMAL(38,0) (SumWidthSpec / q74 convention):
    // mq is an uncapped per-(part,month) quantity sum, so mq² can
    // pass int64 per TERM on a skewed 100 TB corpus; the relvar
    // algebra runs wide and only the ppm ratio (≤1e6-ish domain)
    // narrows via the integral division
    val parts = monthly.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_months"), sum(col("mq")).as("sq"),
        sum((col("mq").cast("decimal(38,0)") * col("mq"))).as("sq2"),
        sum(col("mc")).as("rev_cents"))
      .withColumn("relvar_ppm",
        expr("""(CAST(n_months AS DECIMAL(38,0)) * sq2
                 - CAST(sq AS DECIMAL(38,0)) * sq) * 1000000
                div (CAST(sq AS DECIMAL(38,0)) * sq)"""))
    val cuts = parts.agg(
      expr("percentile_disc(0.80) WITHIN GROUP (ORDER BY rev_cents)")
        .cast("long").as("a_cut"),
      expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY rev_cents)")
        .cast("long").as("b_cut"))
    parts.crossJoin(broadcast(cuts))
      .withColumn("abc", when(col("rev_cents") >= col("a_cut"), "A")
        .when(col("rev_cents") >= col("b_cut"), "B").otherwise("C"))
      .withColumn("xyz", when(col("relvar_ppm") < 200000L, "X")
        .when(col("relvar_ppm") < 800000L, "Y").otherwise("Z"))
      .groupBy(col("abc"), col("xyz"))
      .agg(count(lit(1)).as("n_parts"), sum(col("rev_cents")).as("rev_cents"))
      .orderBy(col("abc"), col("xyz"))
  }

  lazy val q55Sql: String =
    """WITH m AS (
      |  SELECT l_partkey, strftime(l_shipdate, '%Y-%m') AS month,
      |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS mq,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS mc
      |  FROM lineitem GROUP BY 1, 2),
      |p AS (
      |  SELECT l_partkey, count(*) AS n_months, CAST(sum(mq) AS BIGINT) AS sq,
      |    CAST(sum(mq * mq) AS BIGINT) AS sq2,
      |    CAST(sum(mc) AS BIGINT) AS rev_cents
      |  FROM m GROUP BY 1),
      |pv AS (
      |  SELECT *, (n_months * sq2 - sq * sq) * 1000000 // (sq * sq)
      |    AS relvar_ppm FROM p),
      |c AS (
      |  SELECT CAST(quantile_disc(rev_cents, 0.80) AS BIGINT) AS a_cut,
      |    CAST(quantile_disc(rev_cents, 0.50) AS BIGINT) AS b_cut
      |  FROM pv)
      |SELECT
      |  CASE WHEN rev_cents >= a_cut THEN 'A'
      |       WHEN rev_cents >= b_cut THEN 'B' ELSE 'C' END AS abc,
      |  CASE WHEN relvar_ppm < 200000 THEN 'X'
      |       WHEN relvar_ppm < 800000 THEN 'Y' ELSE 'Z' END AS xyz,
      |  count(*) AS n_parts, CAST(sum(rev_cents) AS BIGINT) AS rev_cents
      |FROM pv, c GROUP BY 1, 2 ORDER BY abc, xyz""".stripMargin

  // ---- q56: weighted median / weighted quartiles ----
  // "At what order size does half the revenue sit?" — the weighted
  // median (and quartiles) of quantity weighted by revenue, per
  // return flag. Unlike q24/q46's row-count percentiles, each value counts
  // proportionally to its weight — the inventory/logistics question
  // (planes full of small orders vs ships full of bulk) that a plain
  // median hides. Two-phase at scale: phase 1 is one map-side-combined
  // aggregate to the BOUNDED (mode × quantity-level) grid — quantity
  // is a discrete 1..50 domain, so the grid is ≤ 7·50 rows at ANY
  // corpus size; phase 2's cumulative window runs over that bounded
  // summary only (the q40 posture — corpus-sized work never meets a
  // window). Weighted p-quantile = smallest level whose cumulative
  // weight reaches p of the total, all exact integer comparisons
  // (cw·4 ≥ tw etc. — no rational thresholds to disagree on).
  def q56WeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("qty"),
        (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
      .groupBy(col("l_returnflag"), col("qty"))
      .agg(sum(col("cents")).as("w"))
    val cum = Window.partitionBy(col("l_returnflag")).orderBy(col("qty"))
    val whole = Window.partitionBy(col("l_returnflag"))
    grid
      .withColumn("cw", sum(col("w")).over(cum))
      .withColumn("tw", sum(col("w")).over(whole))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_levels"),
        max(col("tw")).as("total_cents"),
        min(when(col("cw") * 4 >= col("tw"), col("qty"))).as("wq1_qty"),
        min(when(col("cw") * 2 >= col("tw"), col("qty"))).as("wmedian_qty"),
        min(when(col("cw") * 4 >= col("tw") * 3, col("qty"))).as("wq3_qty"))
      .orderBy(col("l_returnflag"))
  }

  lazy val q56Sql: String =
    """WITH g AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (
      |  SELECT l_returnflag, qty,
      |    CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY qty)
      |      AS BIGINT) AS cw,
      |    CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
      |  FROM g)
      |SELECT l_returnflag, count(*) AS n_levels,
      |  CAST(max(tw) AS BIGINT) AS total_cents,
      |  min(CASE WHEN cw * 4 >= tw THEN qty END) AS wq1_qty,
      |  min(CASE WHEN cw * 2 >= tw THEN qty END) AS wmedian_qty,
      |  min(CASE WHEN cw * 4 >= tw * 3 THEN qty END) AS wq3_qty
      |FROM c GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  // ---- q57: repeat-purchase latency (reorder gaps) ----
  // How long until a customer comes back? Per customer, the gaps in
  // days between CONSECUTIVE orders (lag over the customer's order
  // history), rolled up per market segment as exact discrete
  // percentiles — the retention/replenishment gauge behind every
  // "expected reorder window" model. The lag window partitions by
  // o_custkey — a grows-with-data key whose per-partition rows are
  // one customer's orders (bounded, tiny) — and only (custkey, date,
  // key) triples enter it, never the wide row. Tie days are ordered
  // by o_orderkey on both engines so same-date orders produce
  // deterministic zero gaps. The segment rollup joins the bounded
  // gap stream to the customer dim co-partitioned on custkey and
  // runs one percentile aggregate over 5 segment groups (q24
  // convention — discrete percentiles return actual day values,
  // bit-exact on both engines).
  def q57ReorderGaps(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("o_custkey"),
        datediff(col("o_orderdate"), col("prev")).cast("long").as("gap_days"))
    gaps
      .join(t(spark, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_days")).as("sum_days"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_days)")
          .cast("long").as("p50_days"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_days)")
          .cast("long").as("p90_days"))
      .orderBy(col("c_mktsegment"))
  }

  lazy val q57Sql: String =
    """WITH g AS (
      |  SELECT o_custkey,
      |    date_diff('day', lag(o_orderdate) OVER (
      |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |      o_orderdate) AS gap_days
      |  FROM orders),
      |gd AS (SELECT o_custkey, CAST(gap_days AS BIGINT) AS gap_days
      |       FROM g WHERE gap_days IS NOT NULL)
      |SELECT c.c_mktsegment, count(*) AS n_gaps,
      |  CAST(sum(gap_days) AS BIGINT) AS sum_days,
      |  CAST(quantile_disc(gap_days, 0.5) AS BIGINT) AS p50_days,
      |  CAST(quantile_disc(gap_days, 0.9) AS BIGINT) AS p90_days
      |FROM gd JOIN customer c ON gd.o_custkey = c.c_custkey
      |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin

  // ---- q58: multi-count-distinct in one aggregate ----
  // The monthly-health dashboard row: distinct buyers, parts,
  // suppliers AND orders per ship month — FOUR count-distincts over
  // different keys in ONE aggregate. Physically this is Spark's
  // Expand shape: each input row fans out once per distinct-column
  // group, partial distinct aggregation runs map-side per group, and
  // only the surviving (month, key-group, key) triples shuffle —
  // the standard multi-distinct plan (never four separate scans, and
  // never a row-set collect). q8 gates a single count-distinct; this
  // pins the multi-key Expand variant a reporting workload actually
  // issues. Month comes from l_shipdate so the whole query reads one
  // fact table; values are key columns only (the wide row never
  // enters the Expand).
  def q58MultiDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        col("o_custkey"), col("l_partkey"), col("l_suppkey"), col("l_orderkey"))
      .groupBy(col("month"))
      .agg(countDistinct(col("o_custkey")).as("n_buyers"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("month"))

  lazy val q58Sql: String =
    """SELECT strftime(l_shipdate, '%Y-%m') AS month,
      |  count(DISTINCT o_custkey) AS n_buyers,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_suppliers,
      |  count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY month""".stripMargin

  // ---- q59: running balance + drawdown per part ----
  // The inventory-ledger shape: per part, shipments replayed in
  // time order (returns subtract), tracking the RUNNING net balance
  // — final position, the deepest drawdown and the highest peak per
  // part, the stockout/overstock gauge a replenishment model reads.
  // The cumulative window partitions by l_partkey — a grows-with-
  // data key whose per-partition rows are one part's movements
  // (bounded by the part's own activity, ~30 rows at any TPC-H
  // scale) — and only (key, date, line-id, qty-delta) tuples enter
  // it. Replay order is pinned (shipdate, orderkey, linenumber) on
  // both engines so same-day movements are deterministic. One
  // map-side-combined aggregate collapses the ledger to |part| rows.
  def q59PartDrawdown(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"),
        when(col("l_returnflag") === "R", -col("l_quantity").cast("long"))
          .otherwise(col("l_quantity").cast("long")).as("delta"))
      .withColumn("run", sum(col("delta")).over(w))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_moves"), max(col("run")).as("peak"),
        min(col("run")).as("trough"), sum(col("delta")).as("final_qty"))
      .orderBy(col("l_partkey"))
  }

  lazy val q59Sql: String =
    """WITH led AS (
      |  SELECT l_partkey,
      |    CASE WHEN l_returnflag = 'R' THEN -CAST(l_quantity AS BIGINT)
      |         ELSE CAST(l_quantity AS BIGINT) END AS delta,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN -CAST(l_quantity AS BIGINT)
      |                  ELSE CAST(l_quantity AS BIGINT) END) OVER (
      |      PARTITION BY l_partkey
      |      ORDER BY l_shipdate, l_orderkey, l_linenumber) AS BIGINT) AS run
      |  FROM lineitem)
      |SELECT l_partkey, count(*) AS n_moves,
      |  CAST(max(run) AS BIGINT) AS peak, CAST(min(run) AS BIGINT) AS trough,
      |  CAST(sum(delta) AS BIGINT) AS final_qty
      |FROM led GROUP BY 1 ORDER BY l_partkey""".stripMargin

  // ---- q60: market concentration (Herfindahl–Hirschman index) ----
  // The antitrust/market-structure gauge: per ship month, each
  // supplier's revenue share in exact ppm and HHI = Σ share² — the
  // index regulators bucket at 1 500/2 500 points (here in ppm² DIV
  // 10^6, so the classic 0..10 000-point scale × 100). Shares use
  // the one-integer-division convention (rev·10^6 DIV total) so the
  // gate is bit-exact; the squared sum stays far under int64 (≤
  // 10^12). Two map-side-combined aggregates — (month, supplier)
  // revenue, then the month rollup — with the month totals joined
  // back on the BOUNDED month key (broadcast-sized at any corpus
  // scale); no window, no corpus-row shuffle beyond the first
  // aggregate's combine output.
  def q60Hhi(spark: SparkSession, dir: String): DataFrame = {
    val ms = t(spark, dir, "lineitem")
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        col("l_suppkey"),
        (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
      .groupBy(col("month"), col("l_suppkey"))
      .agg(sum(col("cents")).as("rev"))
    val tot = ms.groupBy(col("month")).agg(sum(col("rev")).as("tot"))
    ms.join(broadcast(tot), Seq("month"))
      .withColumn("share_ppm", expr("rev * 1000000 div tot"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_suppliers"),
        max(col("share_ppm")).as("top_share_ppm"),
        sum(expr("share_ppm * share_ppm")).as("sq"))
      .withColumn("hhi", expr("sq div 1000000"))
      .select(col("month"), col("n_suppliers"), col("top_share_ppm"),
        col("hhi"))
      .orderBy(col("month"))
  }

  lazy val q60Sql: String =
    """WITH ms AS (
      |  SELECT strftime(l_shipdate, '%Y-%m') AS month, l_suppkey,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS rev
      |  FROM lineitem GROUP BY 1, 2),
      |t AS (SELECT month, CAST(sum(rev) AS BIGINT) AS tot
      |      FROM ms GROUP BY 1),
      |s AS (SELECT ms.month, rev * 1000000 // tot AS share_ppm
      |      FROM ms JOIN t USING (month))
      |SELECT month, count(*) AS n_suppliers,
      |  CAST(max(share_ppm) AS BIGINT) AS top_share_ppm,
      |  CAST(sum(share_ppm * share_ppm) AS BIGINT) // 1000000 AS hhi
      |FROM s GROUP BY 1 ORDER BY month""".stripMargin

  // ---- q61: grouped OLS regression, exact-integer (price ~ qty) ----
  // Per brand, the least-squares slope of line-value (cents) on
  // quantity — the workhorse "fit a trend per group" operator done as
  // ONE map-side-combined aggregate: each group carries (n, Σx, Σy,
  // Σxy, Σx²) and the slope comes out of the closed form
  // (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) — no per-group iteration, no
  // second pass, no ml library. The per-row products stay in BIGINT
  // (x ≤ 50, y ≤ 1e7 cents ⇒ Σxy < 9.2e18 up to ~sf1000); the
  // COMBINATION arithmetic promotes to DECIMAL(38,0) (HUGEINT on the
  // oracle side) because n·Σxy genuinely needs ~1e28 at sf100. Slope
  // ships as sign-split ppm (q50's err_ppm convention — both engines
  // truncate a positive magnitude, so floor-vs-trunc on negatives can
  // never bite), plus the through-origin slope Σxy/Σx² and the unit
  // price Σy/Σx as cross-checks. Degenerate groups (zero x-variance)
  // drop on both sides.
  def q61Regression(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_partkey"),
        col("l_quantity").cast("long").as("x"),
        (dec(col("l_extendedprice")) * 100).cast("long").as("y"))
    val p = t(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand").as("brand"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("brand"))
      // sxy accumulates DECIMAL(38,0) (SumWidthSpec / q74 convention):
      // x·y ≈ 5e8 per term, so a 100 TB per-brand sum (~2e10 rows)
      // crosses int64 while DuckDB's HUGEINT does not; sxx is widened
      // with it for uniformity (the downstream cov/varx algebra was
      // already decimal)
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum((col("x").cast("decimal(38,0)") * col("y"))).as("sxy"),
        sum((col("x").cast("decimal(38,0)") * col("x"))).as("sxx"))
      .withColumn("cov", expr(
        """CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"""))
      .withColumn("varx", expr(
        """CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"""))
      .filter(col("n") >= 2 && col("varx") > 0)
      .select(col("brand"), col("n").as("n_items"),
        expr("CAST(CAST(sign(cov) AS BIGINT) * CAST(abs(cov) * 1000000 div varx AS BIGINT) AS BIGINT)")
          .as("slope_ppm"),
        expr("CAST(CAST(sxy AS DECIMAL(38,0)) * 1000000 div sxx AS BIGINT)").as("slope0_ppm"),
        expr("CAST(sy div sx AS BIGINT)").as("avg_unit_cents"))
      .orderBy(col("brand"))
  }

  lazy val q61Sql: String =
    """WITH j AS (
      |  SELECT p.p_brand AS brand, CAST(l_quantity AS BIGINT) AS x,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      |s AS (
      |  SELECT brand, CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(x * y) AS HUGEINT) AS sxy,
      |    CAST(sum(x * x) AS HUGEINT) AS sxx
      |  FROM j GROUP BY 1),
      |c AS (
      |  SELECT brand, n, sxy, sxx, sx, sy,
      |    n * sxy - sx * sy AS cov, n * sxx - sx * sx AS varx
      |  FROM s)
      |SELECT brand, CAST(n AS BIGINT) AS n_items,
      |  CAST(CAST(sign(cov) AS HUGEINT)
      |    * (abs(cov) * 1000000 // varx) AS BIGINT) AS slope_ppm,
      |  CAST(sxy * 1000000 // sxx AS BIGINT) AS slope0_ppm,
      |  CAST(sy // sx AS BIGINT) AS avg_unit_cents
      |FROM c WHERE n >= 2 AND varx > 0
      |ORDER BY brand""".stripMargin

  // ---- q62: chi-square contingency (categorical association) ----
  // Is order priority independent of customer market segment? The
  // Pearson chi-square contingency table, per cell: observed count,
  // expected count E = R·C/N (shipped in exact milli-units — one
  // integer division, never a float), and the cell's chi-square
  // contribution (O−E)²/E rewritten divisor-free as
  // (O·N − R·C)² / (N·R·C) and shipped in exact ppm. The feature-
  // association gauge a pipeline runs before one-hot-crossing two
  // categoricals. Scale shape: ONE map-side-combined count over the
  // bounded |priorities|×|segments| cell domain; marginals re-
  // aggregate the 25-row cell table (no second corpus pass); the
  // joins are on bounded keys. The squared numerator genuinely needs
  // DECIMAL(38,0): (O·N)² ~ 1e30 at sf100 (O·N itself stays in
  // BIGINT to ~sf300, but the square does not).
  def q62Chi2(spark: SparkSession, dir: String): DataFrame = {
    val cells = t(spark, dir, "orders")
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority").as("priority"),
        col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("observed"))
    val rm = cells.groupBy(col("priority")).agg(sum(col("observed")).as("r"))
    val cm = cells.groupBy(col("segment")).agg(sum(col("observed")).as("c"))
    val n = cells.agg(sum(col("observed")).as("n"))
    cells.join(broadcast(rm), Seq("priority")).join(broadcast(cm), Seq("segment"))
      .crossJoin(broadcast(n))
      .select(col("priority"), col("segment"), col("observed"),
        expr("CAST(CAST(r AS DECIMAL(38,0)) * c * 1000 div n AS BIGINT)")
          .as("expected_milli"),
        expr("""CAST((CAST(observed AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)
               |  * (CAST(observed AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)
               |  * 1000000 div (CAST(n AS DECIMAL(38,0)) * r * c) AS BIGINT)""".stripMargin)
          .as("contrib_ppm"))
      .orderBy(col("priority"), col("segment"))
  }

  lazy val q62Sql: String =
    """WITH cells AS (
      |  SELECT o.o_orderpriority AS priority, c.c_mktsegment AS segment,
      |    count(*) AS observed
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |rm AS (SELECT priority, CAST(sum(observed) AS HUGEINT) AS r
      |       FROM cells GROUP BY 1),
      |cm AS (SELECT segment, CAST(sum(observed) AS HUGEINT) AS c
      |       FROM cells GROUP BY 1),
      |n AS (SELECT CAST(sum(observed) AS HUGEINT) AS n FROM cells)
      |SELECT cells.priority, cells.segment, cells.observed,
      |  CAST(rm.r * cm.c * 1000 // n.n AS BIGINT) AS expected_milli,
      |  CAST((CAST(cells.observed AS HUGEINT) * n.n - rm.r * cm.c)
      |    * (CAST(cells.observed AS HUGEINT) * n.n - rm.r * cm.c)
      |    * 1000000 // (n.n * rm.r * cm.c) AS BIGINT) AS contrib_ppm
      |FROM cells JOIN rm USING (priority) JOIN cm USING (segment) CROSS JOIN n
      |ORDER BY priority, segment""".stripMargin

  // ---- q63: Benford first-digit audit ----
  // The classic forensic-accounting screen: the leading digit of
  // naturally-occurring amounts follows log10(1+1/d); a ledger whose
  // digit shares drift from that is synthetic or manipulated. Digit
  // shares in exact ppm against the hardcoded Benford table (the 9
  // constants are pre-rounded to ppm and shared verbatim by both
  // engines — no runtime logarithm to drift). Leading digit via ONE
  // string head over the integer cents (exact — no float log10
  // binning); the whole query is a map-side-combined count over a
  // 9-value domain. Note the synthetic uniform prices will NOT be
  // Benford — the point of the gauge is the delta column.
  private val BenfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  def q63Benford(spark: SparkSession, dir: String): DataFrame = {
    val digits = t(spark, dir, "lineitem")
      .select((dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
      .filter(col("cents") >= 1)
      .select(substring(col("cents").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("total"))
    val bport = BenfordPpm
      .map { case (d, p) => s"WHEN $d THEN ${p}L" }.mkString(" ")
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("n * 1000000 div total").as("share_ppm"),
        expr(s"CAST(CASE digit $bport END AS BIGINT)").as("benford_ppm"))
      .withColumn("delta_ppm", col("share_ppm") - col("benford_ppm"))
      .orderBy(col("digit"))
  }

  lazy val q63Sql: String = {
    val bcase = BenfordPpm
      .map { case (d, p) => s"WHEN $d THEN $p" }.mkString(" ")
    s"""WITH d AS (
       |  SELECT CAST(substr(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |    AS VARCHAR), 1, 1) AS BIGINT) AS digit
       |  FROM lineitem
       |  WHERE CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) >= 1),
       |g AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g)
       |SELECT digit, n,
       |  n * 1000000 // total AS share_ppm,
       |  CAST(CASE digit $bcase END AS BIGINT) AS benford_ppm,
       |  n * 1000000 // total - CAST(CASE digit $bcase END AS BIGINT)
       |    AS delta_ppm
       |FROM g CROSS JOIN t ORDER BY digit""".stripMargin
  }

  // ---- q64: duplicate-invoice screen (same payer, same amount) ----
  // The forensic twin of q63: two orders by the SAME customer for the
  // IDENTICAL total amount are double-payment / double-billing
  // suspects, binned by how far apart they were placed (a same-week
  // twin is a likely duplicate; a year apart is a subscription).
  // "Identical" is quantized to the same $1000 band (the synthetic
  // totals are continuous-uniform, so exact-cents twins never occur;
  // a real screen would tighten the band). The self-join key is the
  // (custkey, amount-band) COMPOSITE — cardinality ~|customers|·500,
  // so bucket sizes stay tiny and pair volume is Σk² over
  // same-band-same-customer groups, nowhere near a blow-up;
  // canonical orderkey order counts each pair once. Output is a
  // bounded gap-bucket histogram.
  def q64DupInvoices(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
        expr("CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 100000 AS BIGINT)")
          .as("band"),
        col("o_orderdate").as("d"))
    val pairs = o.as("a").join(o.as("b"),
        col("a.c") === col("b.c") && col("a.band") === col("b.band")
          && col("a.k") < col("b.k"))
      .select(col("a.c").as("cust"),
        abs(datediff(col("b.d"), col("a.d"))).cast("long").as("gap_days"))
    pairs
      .withColumn("gap_bucket",
        when(col("gap_days") === 0, "a_same_day")
          .when(col("gap_days") <= 7, "b_within_week")
          .when(col("gap_days") <= 30, "c_within_month")
          .when(col("gap_days") <= 90, "d_within_quarter")
          .otherwise("e_later"))
      .groupBy(col("gap_bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("cust")).as("n_customers"),
        min(col("gap_days")).as("min_gap"),
        max(col("gap_days")).as("max_gap"))
      .orderBy(col("gap_bucket"))
  }

  lazy val q64Sql: String =
    """WITH o AS (
      |  SELECT o_orderkey AS k, o_custkey AS c,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100000
      |      AS band,
      |    o_orderdate AS d
      |  FROM orders),
      |p AS (
      |  SELECT a.c AS cust, abs(date_diff('day', a.d, b.d)) AS gap_days
      |  FROM o a JOIN o b ON a.c = b.c AND a.band = b.band AND a.k < b.k),
      |g AS (
      |  SELECT cust, gap_days,
      |    CASE WHEN gap_days = 0 THEN 'a_same_day'
      |         WHEN gap_days <= 7 THEN 'b_within_week'
      |         WHEN gap_days <= 30 THEN 'c_within_month'
      |         WHEN gap_days <= 90 THEN 'd_within_quarter'
      |         ELSE 'e_later' END AS gap_bucket
      |  FROM p)
      |SELECT gap_bucket, count(*) AS n_pairs,
      |  count(DISTINCT cust) AS n_customers,
      |  CAST(min(gap_days) AS BIGINT) AS min_gap,
      |  CAST(max(gap_days) AS BIGINT) AS max_gap
      |FROM g GROUP BY gap_bucket ORDER BY gap_bucket""".stripMargin

  // ---- q65: catalog growth (new vs cumulative vs active per month) ----
  // The assortment-velocity dashboard (t31's Heaps curve, relational
  // edition): per ship month, how many parts shipped for the FIRST
  // time, the cumulative catalog ever shipped, and the distinct
  // parts active that month — new≫active means churn-heavy range,
  // cumulative plateau means assortment saturation. Scale shape:
  // first-seen is one map-side-combined min per part (month strings
  // order lexicographically); the monthly rollups are bounded-domain
  // aggregates; the running catalog total is a window over |months|
  // rows — the two-phase posture, never a corpus-sized sort. Exact
  // distinct for n_active (the q8 posture; q33's HLL is the sketch
  // path when exactness can be traded).
  def q65CatalogGrowth(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_partkey"),
        date_format(col("l_shipdate"), "yyyy-MM").as("month"))
    val active = li.groupBy(col("month"))
      .agg(countDistinct(col("l_partkey")).as("n_active"))
    val news = li.groupBy(col("l_partkey")).agg(min(col("month")).as("month"))
      .groupBy(col("month")).agg(count(lit(1)).as("n_new"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("month"))
      .rowsBetween(Window.unboundedPreceding, 0)
    active.join(news, Seq("month"), "left_outer")
      .na.fill(0L, Seq("n_new"))
      .withColumn("n_catalog", sum(col("n_new")).over(w))
      .select(col("month"), col("n_new"), col("n_catalog"), col("n_active"))
      .orderBy(col("month"))
  }

  lazy val q65Sql: String =
    """WITH li AS (
      |  SELECT l_partkey, strftime(l_shipdate, '%Y-%m') AS month
      |  FROM lineitem),
      |act AS (SELECT month, count(DISTINCT l_partkey) AS n_active
      |        FROM li GROUP BY 1),
      |fm AS (SELECT l_partkey, min(month) AS month FROM li GROUP BY 1),
      |nw AS (SELECT month, count(*) AS n_new FROM fm GROUP BY 1),
      |j AS (SELECT act.month, COALESCE(nw.n_new, 0) AS n_new, act.n_active
      |      FROM act LEFT JOIN nw ON act.month = nw.month)
      |SELECT month, CAST(n_new AS BIGINT) AS n_new,
      |  CAST(sum(n_new) OVER (ORDER BY month
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_catalog,
      |  n_active
      |FROM j ORDER BY month""".stripMargin

  // ---- q66: cohort LTV triangle (revenue by first-order cohort) ----
  // The finance counterpart of e9's user-retention matrix: customers
  // cohorted by FIRST order month; for each (cohort, months-since-
  // first) cell, the revenue in exact cents, the cumulative revenue
  // down the cohort's row, and cumulative cents per cohort member —
  // the LTV curve a margin model discounts. Scale shape: first-order
  // month is one map-side-combined min per customer; the activity
  // join is orders ⋈ cohorts co-partitioned on custkey (e9's shape);
  // month_n is exact integer month arithmetic on 'yyyy-MM' strings
  // (never date subtraction in float days); the triangle itself is
  // bounded |months|² rows and the running sum windows over one
  // cohort's ≤|months| cells. All-integer.
  def q66CohortLtv(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = t(spark, dir, "orders")
      .select(col("o_custkey").as("cust"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
    val cohorts = o.groupBy(col("cust")).agg(min(col("month")).as("cohort"))
    val sizes = cohorts.groupBy(col("cohort")).agg(count(lit(1)).as("n_customers"))
    val monthN = expr(
      """(CAST(substring(month, 1, 4) AS BIGINT) * 12
        |  + CAST(substring(month, 6, 2) AS BIGINT))
        | - (CAST(substring(cohort, 1, 4) AS BIGINT) * 12
        |  + CAST(substring(cohort, 6, 2) AS BIGINT))""".stripMargin)
    val cells = o.join(cohorts, Seq("cust"))
      .withColumn("month_n", monthN)
      .groupBy(col("cohort"), col("month_n"))
      .agg(sum(col("cents")).as("revenue_cents"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("month_n"))
      .rowsBetween(Window.unboundedPreceding, 0)
    cells.join(broadcast(sizes), Seq("cohort"))
      .withColumn("cum_cents", sum(col("revenue_cents")).over(w))
      .select(col("cohort"), col("month_n"), col("revenue_cents"),
        col("cum_cents"), col("n_customers"),
        expr("cum_cents div n_customers").as("ltv_cents"))
      .orderBy(col("cohort"), col("month_n"))
  }

  lazy val q66Sql: String =
    """WITH o AS (
      |  SELECT o_custkey AS cust, strftime(o_orderdate, '%Y-%m') AS month,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders),
      |ch AS (SELECT cust, min(month) AS cohort FROM o GROUP BY 1),
      |sz AS (SELECT cohort, count(*) AS n_customers FROM ch GROUP BY 1),
      |cells AS (
      |  SELECT ch.cohort,
      |    (CAST(substring(o.month, 1, 4) AS BIGINT) * 12
      |       + CAST(substring(o.month, 6, 2) AS BIGINT))
      |    - (CAST(substring(ch.cohort, 1, 4) AS BIGINT) * 12
      |       + CAST(substring(ch.cohort, 6, 2) AS BIGINT)) AS month_n,
      |    CAST(sum(o.cents) AS BIGINT) AS revenue_cents
      |  FROM o JOIN ch ON o.cust = ch.cust
      |  GROUP BY 1, 2)
      |SELECT c.cohort, c.month_n, c.revenue_cents,
      |  CAST(sum(c.revenue_cents) OVER (PARTITION BY c.cohort
      |    ORDER BY c.month_n ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
      |  sz.n_customers,
      |  CAST(sum(c.revenue_cents) OVER (PARTITION BY c.cohort
      |    ORDER BY c.month_n ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |    // sz.n_customers AS ltv_cents
      |FROM cells c JOIN sz ON c.cohort = sz.cohort
      |ORDER BY c.cohort, c.month_n""".stripMargin

  // ---- q68: movers & shakers (month-over-month rank delta) ----
  // The leaderboard-churn report: brands ranked by revenue within
  // each month (DESC, name tiebreak), joined to their own previous-
  // month rank; delta = prev − curr (positive = climbed). Reveals
  // churn the raw totals hide — a #1 that's been #1 for a year vs a
  // brand that jumped eight places. Scale shape: the corpus collapses
  // to the bounded |months|×|brands| summary FIRST (one map-side
  // aggregate); ranking windows partition by month over ≤|brands|
  // rows; the self-join key is integer month index arithmetic
  // (yyyy-MM strings), so no date-diff ambiguity. First month drops
  // (no predecessor) on both engines.
  def q68TopMovers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mi = expr(
      """CAST(substring(month, 1, 4) AS BIGINT) * 12
        | + CAST(substring(month, 6, 2) AS BIGINT)""".stripMargin)
    val rev = t(spark, dir, "lineitem")
      .join(t(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        col("p_brand").as("brand"))
      .agg(sum((dec(col("l_extendedprice")) * 100).cast("long")).as("cents"))
      .withColumn("mi", mi)
    val w = Window.partitionBy(col("mi"))
      .orderBy(col("cents").desc, col("brand"))
    val ranked = rev.withColumn("rank", row_number().over(w).cast("long"))
    ranked.as("cur").join(ranked.as("prev"),
        col("cur.brand") === col("prev.brand")
          && col("cur.mi") === col("prev.mi") + 1)
      .select(col("cur.month").as("month"), col("cur.brand").as("brand"),
        col("cur.cents").as("cents"), col("cur.rank").as("rank"),
        col("prev.rank").as("prev_rank"),
        (col("prev.rank") - col("cur.rank")).as("delta"))
      .orderBy(col("month"), col("rank"))
  }

  lazy val q68Sql: String =
    """WITH rev AS (
      |  SELECT strftime(l_shipdate, '%Y-%m') AS month, p.p_brand AS brand,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT month, brand, cents,
      |    CAST(substring(month, 1, 4) AS BIGINT) * 12
      |      + CAST(substring(month, 6, 2) AS BIGINT) AS mi,
      |    CAST(row_number() OVER (PARTITION BY month
      |      ORDER BY cents DESC, brand) AS BIGINT) AS rank
      |  FROM rev)
      |SELECT cur.month, cur.brand, cur.cents, cur.rank,
      |  prev.rank AS prev_rank, prev.rank - cur.rank AS delta
      |FROM r cur JOIN r prev
      |  ON cur.brand = prev.brand AND cur.mi = prev.mi + 1
      |ORDER BY cur.month, cur.rank""".stripMargin

  // ---- q67: share-of-parent hierarchy report (region ▸ nation) ----
  // The percent-of-parent report pattern every BI layer renders:
  // revenue per nation, each nation's share OF ITS REGION and each
  // region's share of the global total, both in exact ppm with the
  // one-division convention (shares of one parent sum to ~10⁶ with
  // only truncation slack — spec-pinned). ONE corpus aggregate at
  // the leaf grain (nation); region and global totals re-aggregate
  // the |nations|-row leaf table; dimension joins are broadcast.
  // This is the q20 rollup turned inside out: rollup gives the
  // totals as extra rows, this gives them as RATIO columns on the
  // leaf rows — what a treemap/drill-down UI actually binds to.
  def q67ShareOfParent(spark: SparkSession, dir: String): DataFrame = {
    val leaf = t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .join(broadcast(t(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("cents"))
    val reg = leaf.groupBy(col("region")).agg(sum(col("cents")).as("rcents"))
    val tot = leaf.agg(sum(col("cents")).as("gcents"))
    leaf.join(broadcast(reg), Seq("region")).crossJoin(broadcast(tot))
      .select(col("region"), col("nation"), col("cents"),
        expr("cents * 1000000 div rcents").as("share_of_region_ppm"),
        expr("rcents * 1000000 div gcents").as("region_share_ppm"))
      .orderBy(col("region"), col("nation"))
  }

  lazy val q67Sql: String =
    """WITH leaf AS (
      |  SELECT r.r_name AS region, n.n_name AS nation,
      |    CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM customer c
      |  JOIN orders o ON c.c_custkey = o.o_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  GROUP BY 1, 2),
      |reg AS (SELECT region, CAST(sum(cents) AS BIGINT) AS rcents
      |        FROM leaf GROUP BY 1),
      |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS gcents FROM leaf)
      |SELECT leaf.region, leaf.nation, leaf.cents,
      |  leaf.cents * 1000000 // reg.rcents AS share_of_region_ppm,
      |  reg.rcents * 1000000 // tot.gcents AS region_share_ppm
      |FROM leaf JOIN reg USING (region) CROSS JOIN tot
      |ORDER BY leaf.region, leaf.nation""".stripMargin

  // ---- q69: order-count distribution incl. zero (TPC-H Q13 shape) ----
  // "How many customers placed k orders" — the engagement histogram
  // whose hardest row is k = 0: an inner join loses exactly the
  // customers the business asks about. Plan order matters at scale:
  // orders are aggregated to per-customer counts FIRST (map-side
  // combine shrinks the fact stream to |customers| rows), and only
  // that pre-combined table left-joins the customer dimension — the
  // classic Q13 mistake is the reverse order, outer-joining the raw
  // fact table and shuffling |orders| rows with null-padding. The
  // priority filter keeps the count non-degenerate (Q13's comment
  // filter adapted to this schema).
  def q69CountDistribution(spark: SparkSession, dir: String): DataFrame = {
    val oc = t(spark, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("k"))
    t(spark, dir, "customer").select(col("c_custkey"))
      .join(oc, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("k"), lit(0L)).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  lazy val q69Sql: String =
    """WITH oc AS (
      |  SELECT o_custkey, count(*) AS k FROM orders
      |  WHERE o_orderpriority <> '1-URGENT' GROUP BY o_custkey)
      |SELECT COALESCE(k, 0) AS c_count, count(*) AS custdist
      |FROM customer LEFT JOIN oc ON c_custkey = o_custkey
      |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---- q70: group share vs a global threshold (TPC-H Q11 shape) ----
  // Parts whose revenue exceeds a fixed fraction (1/10000) of the
  // global total — the "significant stock" HAVING-against-scalar
  // pattern. ONE fact aggregate feeds both sides: the global total
  // re-aggregates the |parts|-row table and broadcasts as a one-row
  // frame; the threshold compare is cross-multiplied
  // (value·10⁴ > total) so it stays in exact DECIMAL — no
  // double-rounded fraction to drift between engines.
  def q70GlobalShareFilter(spark: SparkSession, dir: String): DataFrame = {
    val pv = t(spark, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
        .as("v"))
    val tot = pv.agg(sum(col("v")).as("total"))
    pv.crossJoin(broadcast(tot))
      .filter(col("v") * 10000 > col("total"))
      .select(col("l_partkey"), col("v").cast("double").as("value"))
      .orderBy(desc("value"), col("l_partkey"))
  }

  lazy val q70Sql: String =
    s"""WITH pv AS (
       |  SELECT l_partkey,
       |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
       |        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS v
       |  FROM lineitem GROUP BY l_partkey),
       |tot AS (SELECT sum(v) AS total FROM pv)
       |SELECT l_partkey, ${d2d("v")} AS value
       |FROM pv CROSS JOIN tot WHERE v * 10000 > total
       |ORDER BY value DESC, l_partkey""".stripMargin

  // ---- q71: sole-blame suppliers (TPC-H Q21 shape) ----
  // Q21's "suppliers who kept waiting orders" adapted to this
  // schema: in multi-supplier orders where EXACTLY ONE supplier has
  // a returned line, that supplier takes the blame — the
  // exists/not-exists pair expressed as ONE per-order aggregate
  // (two conditional count-distincts + the blamed id as a
  // conditional max, valid exactly because n_ret = 1), instead of
  // Q21's textbook double self-join of the fact table against
  // itself — at 100 TB one combined aggregate over lineitem beats
  // two extra E-row joins.
  def q71SoleBlame(spark: SparkSession, dir: String): DataFrame = {
    val per = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
          .as("n_ret"),
        max(when(col("l_returnflag") === "R", col("l_suppkey"))).as("blamed"))
    per.filter(col("n_supp") >= 2 && col("n_ret") === 1)
      .join(broadcast(t(spark, dir, "supplier")),
        col("blamed") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_suppkey"))
  }

  lazy val q71Sql: String =
    """WITH per AS (
      |  SELECT l_orderkey,
      |    count(DISTINCT l_suppkey) AS n_supp,
      |    count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
      |      AS n_ret,
      |    max(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS blamed
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT s_suppkey, s_name, count(*) AS numwait
      |FROM per JOIN supplier ON blamed = s_suppkey
      |WHERE n_supp >= 2 AND n_ret = 1
      |GROUP BY s_suppkey, s_name
      |ORDER BY numwait DESC, s_suppkey""".stripMargin

  // ---- q72: dormant prospects (TPC-H Q22 shape) ----
  // Well-funded customers (strictly above the positive-balance
  // average) with no URGENT order, rolled up by market segment — the
  // scalar-subquery + anti-join pair (this generator gives every
  // customer at least one order, so Q22's never-ordered predicate is
  // adapted to the urgent subset to stay non-degenerate). The
  // average compare is cross-multiplied (bal·n > Σbal) so it stays
  // in exact DECIMAL on both engines (DuckDB's avg(DECIMAL) returns
  // DOUBLE — a rounding seam the cross-multiplication never opens).
  // Anti join probes the filtered o_custkey set; the one-row (Σ, n)
  // frame broadcasts.
  def q72Prospects(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val s = c.filter(dec(col("c_acctbal")) > dec(lit(0)))
      .agg(sum(dec(col("c_acctbal"))).as("tot"), count(lit(1)).as("n"))
    c.crossJoin(broadcast(s))
      .filter(dec(col("c_acctbal")) * col("n") > col("tot"))
      .join(t(spark, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }

  lazy val q72Sql: String =
    s"""WITH s AS (
       |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS tot, count(*) AS n
       |  FROM customer WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 0)
       |SELECT c_mktsegment, count(*) AS numcust,
       |  ${d2d("sum(CAST(c_acctbal AS DECIMAL(18,2)))")} AS totacctbal
       |FROM customer CROSS JOIN s
       |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > tot
       |  AND c_custkey NOT IN (
       |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---- q73: cheapest-supplier-per-part argmin (TPC-H Q2 shape) ----
  // The correlated min-per-group shape. Classic Q2 re-probes the
  // supply table with a correlated MIN subquery and joins back; here
  // the argmin is ONE pass — min(struct(cost, supplier, payload))
  // over the lineitem-derived (part, supplier) unit-cost catalog
  // (this schema has no partsupp; the min-observed-price catalog
  // stands in for it). The struct carries the display columns, so
  // there is NO window and NO join-back self-join: two hash
  // aggregates total. The region-restricted supplier dim and the
  // size/type-filtered part dim broadcast BEFORE the first aggregate,
  // pruning the big scan's groups (Q2's own plan shape). Ties break
  // to the smallest supplier key — the struct's second field —
  // mirrored by the oracle's correlated min(l_suppkey) tie-break.
  // The oracle is deliberately the CLASSIC correlated-subquery form:
  // it certifies the one-pass argmin ≡ the Q2 shape.
  def q73MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val regSupp = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val pt = t(spark, dir, "part")
      .filter(col("p_size") >= 30 && col("p_type") =!= "PROMO")
      .select(col("p_partkey"), col("p_brand"))
    t(spark, dir, "lineitem")
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .join(broadcast(regSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("p_brand"), col("l_suppkey"),
        col("s_name"), col("n_name"))
      .agg(min((dec(col("l_extendedprice")) * 100).cast("long")).as("cost_cents"))
      .groupBy(col("p_partkey"), col("p_brand"))
      .agg(min(struct(col("cost_cents"), col("l_suppkey"),
        col("s_name"), col("n_name"))).as("m"))
      .select(col("p_partkey"), col("p_brand"),
        col("m.l_suppkey").as("s_suppkey"), col("m.s_name").as("s_name"),
        col("m.n_name").as("n_name"), col("m.cost_cents").as("cost_cents"))
      .orderBy(col("cost_cents"), col("p_partkey"))
      .limit(100)
  }

  lazy val q73Sql: String =
    """WITH rs AS (
      |  SELECT s_suppkey, s_name, n_name FROM supplier, nation, region
      |  WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |    AND r_name = 'EUROPE'),
      |pairs AS (
      |  SELECT p_partkey, p_brand, l_suppkey, s_name, n_name,
      |    min(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS cost_cents
      |  FROM lineitem, part, rs
      |  WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
      |    AND p_size >= 30 AND p_type <> 'PROMO'
      |  GROUP BY 1, 2, 3, 4, 5)
      |SELECT p_partkey, p_brand, l_suppkey AS s_suppkey, s_name, n_name,
      |  cost_cents
      |FROM pairs p
      |WHERE cost_cents = (SELECT min(cost_cents) FROM pairs p2
      |                    WHERE p2.p_partkey = p.p_partkey)
      |  AND l_suppkey = (SELECT min(l_suppkey) FROM pairs p3
      |                   WHERE p3.p_partkey = p.p_partkey
      |                     AND p3.cost_cents = p.cost_cents)
      |ORDER BY cost_cents, p_partkey LIMIT 100""".stripMargin

  // ---- q74: profit by nation and year (TPC-H Q9 shape) ----
  // Multi-table join + SIGNED expression aggregate, kept in exact
  // integer arithmetic end to end: amount is in dollars·10⁻⁴
  // (ep_cents · (100 − disc_pct) − 100 · retail_cents · qty — the
  // retail-price column stands in for Q9's ps_supplycost, so per-row
  // profit is genuinely negative for discounted rows and the SUM
  // exercises signed cents). disc_pct and qty are exact integers
  // (discounts are 2-decimal, quantities integral — both engines
  // truncate identically). Supplier⋈nation broadcasts; the
  // name-filtered part slice gets NO hint — it is corpus-propor-
  // tional at 100 TB, so AQE picks broadcast vs shuffle by measured
  // size. One big shuffle (lineitem⋈orders on orderkey), one hash
  // aggregate on (nation, year).
  def q74ProfitByNationYear(spark: SparkSession, dir: String): DataFrame = {
    val pt = t(spark, dir, "part").filter(col("p_name").like("%bolt%"))
      .select(col("p_partkey"),
        (dec(col("p_retailprice")) * 100).cast("long").as("retail_cents"))
    val sn = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val epCents = (dec(col("l_extendedprice")) * 100).cast("long")
    val discPct = (dec(col("l_discount")) * 100).cast("long")
    val qty = col("l_quantity").cast("long")
    t(spark, dir, "lineitem")
      .join(pt, col("l_partkey") === col("p_partkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .join(t(spark, dir, "orders")
          .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), col("o_year"))
      // accumulate in DECIMAL(38,0) and only then narrow: Spark's
      // non-ANSI long sum wraps silently on overflow while DuckDB
      // sums BIGINT terms in HUGEINT — per-term magnitude is ~1e10
      // cents⁴, so a 100 TB per-group sum can pass int64; the wide
      // accumulator makes both engines exact to 38 digits. The final
      // BIGINT narrowing is the one remaining narrowing site, and on
      // a >int64 sum the engines diverge LOUDLY-vs-NULL rather than
      // silently wrapping: Spark's non-ANSI decimal(38,0)→long cast
      // yields NULL while DuckDB's HUGEINT→BIGINT cast raises — a
      // hash mismatch either way, never a silently-equal wrong value
      .agg(sum((epCents * (lit(100L) - discPct) -
          lit(100L) * col("retail_cents") * qty).cast("decimal(38,0)"))
        .cast("long").as("profit_c4"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  lazy val q74Sql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |        * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      - 100 * CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |        * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_c4
      |FROM lineitem, part, supplier, nation, orders
      |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
      |  AND l_orderkey = o_orderkey AND s_nationkey = n_nationkey
      |  AND p_name LIKE '%bolt%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  // ---- q75: volume shipping between two nations (TPC-H Q7 shape) ----
  // The bidirectional nation-pair join: revenue flowing between
  // NATION_3 and NATION_7 in either direction, by supplier nation ×
  // customer nation × ship year. The two nation dims broadcast
  // PRE-FILTERED to the pair (inner joins then restrict the fact
  // stream before the big lineitem⋈orders shuffle sees a group), and
  // the cross-pair predicate keeps only the two off-diagonal
  // combinations. Exact DECIMAL revenue, VARCHAR-hop double emission
  // (the §5 sf1 lesson).
  def q75VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_3", "NATION_7")
    val sn = t(spark, dir, "nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    val cn = t(spark, dir, "nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))
    val disc = dec(lit(1)) - dec(col("l_discount"))
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("snk"))
      .join(broadcast(cn), col("c_nationkey") === col("cnk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(dec(col("l_extendedprice")) * disc).cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  lazy val q75Sql: String =
    s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
       |  ${d2d("sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))")} AS revenue
       |FROM lineitem, orders, customer, supplier, nation sn, nation cn
       |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
       |  AND l_suppkey = s_suppkey AND s_nationkey = sn.n_nationkey
       |  AND c_nationkey = cn.n_nationkey
       |  AND sn.n_name IN ('NATION_3', 'NATION_7')
       |  AND cn.n_name IN ('NATION_3', 'NATION_7')
       |  AND sn.n_name <> cn.n_name
       |  AND l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l_shipdate < TIMESTAMP '1998-01-01'
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---- q76: national market share (TPC-H Q8 shape) ----
  // NATION_5's share of PROMO-part revenue sold to ASIA customers,
  // by order year: share = nation_vol / total_vol, BOTH emitted as
  // exact-decimal-sums-cast-double anchors next to the IEEE ratio
  // (one division of two identically-derived doubles — the q14/q70
  // ratio convention). The conditional numerator is a CASE inside
  // the same aggregate pass — one scan, one shuffle, no self-join.
  def q76MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val vol = dec(col("l_extendedprice")) *
      (dec(lit(1)) - dec(col("l_discount")))
    val nat = when(col("supp_nation") === "NATION_5", vol)
      .otherwise(dec(lit(0)))
    t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part").filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(t(spark, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1998-01-01"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")
        .select(col("n_nationkey").as("cnk"), col("n_regionkey"))),
        col("c_nationkey") === col("cnk"))
      .join(broadcast(t(spark, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(t(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(spark, dir, "nation")
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(nat).cast("double").as("nation_vol"),
        sum(vol).cast("double").as("total_vol"))
      .select(col("o_year"), col("nation_vol"), col("total_vol"),
        (col("nation_vol") / col("total_vol")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  lazy val q76Sql: String = {
    val vol = "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
    s"""WITH g AS (
       |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |    ${d2d(s"sum(CASE WHEN sn.n_name = 'NATION_5' THEN $vol ELSE CAST(0 AS DECIMAL(18,2)) END)")} AS nation_vol,
       |    ${d2d(s"sum($vol)")} AS total_vol
       |  FROM lineitem, part, orders, customer, nation cn, region, supplier,
       |    nation sn
       |  WHERE l_partkey = p_partkey AND p_type = 'PROMO'
       |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
       |    AND c_nationkey = cn.n_nationkey AND cn.n_regionkey = r_regionkey
       |    AND r_name = 'ASIA' AND l_suppkey = s_suppkey
       |    AND s_nationkey = sn.n_nationkey
       |    AND o_orderdate >= TIMESTAMP '1996-01-01'
       |    AND o_orderdate < TIMESTAMP '1998-01-01'
       |  GROUP BY 1)
       |SELECT o_year, nation_vol, total_vol,
       |  nation_vol / total_vol AS mkt_share
       |FROM g ORDER BY o_year""".stripMargin
  }

  // ---- q77: top-share suppliers (TPC-H Q20 shape) ----
  // Suppliers shipping an ABOVE-AVERAGE share of some bolt part: per
  // (part, supplier) shipped quantity vs the part total, kept when
  // qty·n_suppliers > total — the mean-share compare CROSS-MULTIPLIED
  // so it stays in exact integers (the q72 avg lesson; a fixed
  // dominance multiple was measured scale-DEGENERATE: 2·sq > tq gave
  // 0 rows at every sf because shares dilute as the supplier pool
  // grows — the mean-relative rule is non-degenerate at any scale).
  // Q20's availqty stands in as the shipped-quantity share since
  // this schema has no partsupp. Two stacked aggregates (pair, then
  // part total joined back to the pair rows — the total rides a
  // part-keyed exchange of |parts| rows, never a window), then the
  // supplier dim broadcasts onto the survivors.
  def q77TopShareSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val pairs = t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part")
        .filter(col("p_name").like("%bolt%")).select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sq"))
      .localCheckpoint(true)
    val tot = pairs.groupBy(col("l_partkey"))
      .agg(sum(col("sq")).as("tq"), count(lit(1)).as("ns"))
    pairs.join(tot, Seq("l_partkey"))
      .filter(col("sq") * col("ns") > col("tq"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_parts"), sum(col("sq")).as("qty_sum"))
      .join(broadcast(t(spark, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_parts"), col("qty_sum"))
      .orderBy(col("s_suppkey"))
  }

  lazy val q77Sql: String =
    """WITH pairs AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
      |  FROM lineitem, part
      |  WHERE l_partkey = p_partkey AND p_name LIKE '%bolt%'
      |  GROUP BY 1, 2),
      |tot AS (SELECT l_partkey, CAST(sum(sq) AS BIGINT) AS tq,
      |          count(*) AS ns
      |        FROM pairs GROUP BY 1)
      |SELECT s_suppkey, s_name, count(*) AS n_parts,
      |  CAST(sum(sq) AS BIGINT) AS qty_sum
      |FROM pairs JOIN tot USING (l_partkey)
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE sq * ns > tq
      |GROUP BY 1, 2 ORDER BY s_suppkey""".stripMargin

  // ---- q78: returned-item reporting (TPC-H Q10 shape) ----
  // Lost revenue per customer from returned line items in one
  // quarter, top 20: the classic join+agg+TakeOrderedAndProject.
  // Revenue stays exact DECIMAL through the aggregate; the top-20
  // sort is (revenue DESC, c_custkey) — the custkey tiebreak makes
  // the LIMIT boundary deterministic on both engines even under
  // equal revenues. The returnflag and date filters push to the two
  // fact scans; nation broadcasts.
  def q78ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val disc = dec(lit(1)) - dec(col("l_discount"))
    t(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
      .join(t(spark, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-07-01") &&
            col("o_orderdate") < lit("1996-10-01"))
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * disc).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  lazy val q78Sql: String =
    s"""SELECT c_custkey, c_name, n_name,
       |  ${d2d("sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))")} AS revenue
       |FROM lineitem, orders, customer, nation
       |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
       |  AND c_nationkey = n_nationkey AND l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1996-07-01'
       |  AND o_orderdate < TIMESTAMP '1996-10-01'
       |GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // ---- q79: supplier variety per part class (TPC-H Q16 shape) ----
  // Distinct-supplier counts per (brand, type, size) over the
  // lineitem-derived part-supplier pairs, EXCLUDING blacklisted
  // suppliers (negative balance stands in for Q16's complaint
  // filter) via an anti-join — the NOT IN shape. The pair distinct
  // and the count-distinct collapse into the same two-level
  // aggregate; the small blacklist broadcasts as the anti build
  // side.
  def q79SupplierVariety(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(t(spark, dir, "supplier")
        .filter(dec(col("s_acctbal")) < dec(lit(0)))
        .select(col("s_suppkey").as("l_suppkey"))), Seq("l_suppkey"), "left_anti")
      .join(broadcast(t(spark, dir, "part").filter(col("p_brand") =!= "Brand#1")
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))

  lazy val q79Sql: String =
    """SELECT p_brand, p_type, p_size,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1'
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier
      |    WHERE CAST(s_acctbal AS DECIMAL(18,2)) < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ---- q26: pivot (wide aggregate over an enumerated domain) ----
  // Values are ENUMERATED (Seq("F","O")) so the pivot compiles to
  // CASE-filtered aggregates in ONE pass — no extra distinct-values
  // job, no second scan; at scale this is just a hash aggregate whose
  // row width is the domain size.
  def q26Pivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(col("l_quantity").cast("long")))
      .select(col("l_returnflag"), col("F").as("qty_f"), col("O").as("qty_o"))
      .orderBy(col("l_returnflag"))

  lazy val q26Sql: String =
    """SELECT l_returnflag,
      | CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_f,
      | CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_o
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- q22: string ops + anti join + global-avg filter (Q22 flavor) ----
  def q22StringOps(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").filter(col("o_orderstatus") === "F")
    val posAvg = c.filter(col("c_acctbal") > 0.0)
      .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("a"))
    c.join(broadcast(posAvg))
      .filter(col("c_acctbal") > col("a") && col("c_name").like("Customer%"))
      .join(o, col("o_custkey") === col("c_custkey"), "left_anti")
      .withColumn("tail", substring(col("c_name"), -2, 2))
      .groupBy(col("tail"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy(col("tail"))
  }

  lazy val q22Sql: String =
    """SELECT tail, count(*) AS numcust,
      | CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS totacctbal
      |FROM (
      |  SELECT c_custkey, c_acctbal, substring(c_name, length(c_name) - 1, 2) AS tail
      |  FROM customer
      |  WHERE c_acctbal > (
      |      SELECT CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*)
      |      FROM customer WHERE c_acctbal > 0.0)
      |    AND c_name LIKE 'Customer%'
      |    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')) x
      |GROUP BY tail ORDER BY tail""".stripMargin

  // ---- q23: KMV (k-minimum-values) distinct-count sketch ----
  // The deterministic, oracle-exact cousin of HyperLogLog: hash every
  // key with shared integer arithmetic, keep the k smallest DISTINCT
  // hashes via the mergeable [[graft.functions.KmvAggregator]] (each
  // partition maintains a k-min buffer, merge = union+trim, the
  // shuffle moves k·P pre-combined values — not the full distinct
  // stream a `distinct → sort → limit` plan would move), estimate
  // |D| ≈ (k-1)·M / h_k. The key is mod-reduced by M BEFORE the
  // multiply, so the arithmetic never exceeds ~5.7e18 < 2^63 at any
  // key scale; mathematically identical to (key·A) mod M, shared with
  // the oracle. Integer floor division keeps the estimate bit-exact.
  def q23KmvSketch(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    val k = 256
    t(spark, dir, "lineitem")
      .select((((col("l_orderkey") % 2147483647L) * 2654435761L) % 2147483647L).as("h"))
      .agg(expr("graft_kmv256(h)").as("s"))
      .select(col("s.k").as("k"),
        // NULL on empty input (hk = 0), like the oracle's max() over
        // zero rows — and no ANSI divide-by-zero
        expr(s"CASE WHEN s.hk > 0 THEN (($k - 1) * 2147483647L) DIV s.hk END")
          .as("estimate"))
  }

  lazy val q23Sql: String =
    """WITH kmin AS (
      |  SELECT DISTINCT ((l_orderkey % 2147483647) * 2654435761) % 2147483647 AS h
      |  FROM lineitem ORDER BY h LIMIT 256)
      |SELECT count(*) AS k, (CAST(255 AS BIGINT) * 2147483647) // max(h) AS estimate
      |FROM kmin""".stripMargin

  // ---- q24: exact discrete percentiles per group ----
  // percentile_disc (an actual data value, no interpolation) keeps the
  // result bit-exact across engines. The sort happens per (small)
  // group inside the aggregate — at scale this is the standard
  // sort-based aggregate, shuffling only (key, value) pairs.
  def q24Percentile(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("p50"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)").as("p95"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))

  lazy val q24Sql: String =
    """SELECT l_returnflag,
      |  quantile_disc(l_extendedprice, 0.5) AS p50,
      |  quantile_disc(l_extendedprice, 0.95) AS p95,
      |  count(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- q27: lead/lag — inter-order gaps per customer ----
  // The offset-window family (lag/lead) q7's rank/frame windows don't
  // cover: per customer ordered by (date, key), days since the
  // previous order and until the next. One shuffle on o_custkey (a
  // grow-with-data key), no frame state — offset windows are O(1) per
  // row. Gap arithmetic is integer day counts (exact on both engines).
  def q27LeadLag(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
          .as("gap_days"),
        datediff(lead(col("o_orderdate"), 1).over(w), col("o_orderdate"))
          .as("next_gap_days"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  lazy val q27Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      |  CAST(date_diff('day',
      |    lag(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |    o_orderdate) AS INTEGER) AS gap_days,
      |  CAST(date_diff('day', o_orderdate,
      |    lead(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) AS INTEGER) AS next_gap_days
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---- q28: frame-bounded moving aggregates (trailing 3 orders) ----
  // Bounded ROWS frames — q7's running sum is unbounded-preceding;
  // here the frame is the last 3 rows, so window state is O(frame) per
  // partition. Moving sum is an exact decimal; the moving average
  // divides that decimal's double by the frame row count (single IEEE
  // division — deterministic across engines).
  def q28MovingFrames(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-2, Window.currentRow)
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("mov_sum"),
        (sum(dec(col("o_totalprice"))).over(w).cast("double")
          / count(lit(1)).over(w)).as("mov_avg"),
        max(col("o_totalprice").cast("double")).over(w).as("mov_max"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  lazy val q28Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS VARCHAR) AS DOUBLE) AS mov_sum,
      |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS VARCHAR) AS DOUBLE)
      |    / count(*) OVER w AS mov_avg,
      |  max(CAST(o_totalprice AS DOUBLE)) OVER w AS mov_max
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---- q29: ntile quartiles + first_value per partition ----
  // Distribution windows: ntile(4) buckets each order within its
  // priority class by price (ties broken by o_orderkey — bucket
  // assignment is a pure function of the total order, deterministic).
  //
  // A literal `ntile(4) OVER (PARTITION BY priority ...)` funnels each
  // class into ONE task's sort — |classes| is FIXED (5), so at sf10
  // that was five 3M-row sorts (33 s, the round's one measured
  // scale-killer). ntile is a pure function of (rank within class,
  // class size), so compute the DISTRIBUTED rank instead — the t6
  // two-phase pattern applied to ordering, with a DETERMINISTIC
  // shard key (integer price buckets), so no sampled range
  // boundaries and no dependency on exchange reuse between the two
  // consumers of the sharded table:
  //  1. bin = -(cents DIV BinWidth) — ascending bin ≡ descending
  //     price, bit-identical bucket edges on any engine; the heavy
  //     window partitions by (class, bin) and sorts only a bucket's
  //     rows (BinWidth is the scale knob, t6's span analog: shrink
  //     it to raise parallelism / bound the per-bucket sort);
  //  2. per-(class, bin) counts → class totals + exclusive running
  //     offsets over the tiny counts table, broadcast back;
  //     rank = local row_number + offset;
  //  3. ntile/first_value from (rank, n) by the SQL-standard formula
  //     (first n%4 buckets get one extra row).
  private val NtileBinCents = 1000000L  // $10k rank shards

  def q29Ntile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = t(spark, dir, "orders")
      .select(col("o_orderpriority").as("cls"), col("o_orderkey"),
        col("o_totalprice").cast("double").as("price"),
        (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
      .withColumn("bin", expr(s"-(cents DIV $NtileBinCents)"))
    val wLocal = Window.partitionBy(col("cls"), col("bin"))
      .orderBy(col("price").desc, col("o_orderkey"))
    val local = o.withColumn("lr", row_number().over(wLocal))
    val parts = o.groupBy(col("cls"), col("bin")).agg(count(lit(1)).as("c"))
    val wOff = Window.partitionBy(col("cls")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts
      .withColumn("off", coalesce(sum(col("c")).over(wOff), lit(0L)))
      .select(col("cls"), col("bin"), col("off"))
    val totals = parts.groupBy(col("cls")).agg(sum(col("c")).as("n"))
    val ranked = local
      .join(broadcast(offsets), Seq("cls", "bin"))
      .join(broadcast(totals), Seq("cls"))
      .withColumn("r", col("lr") + col("off"))
    // SQL-standard ntile: base = n DIV k, extra = n % k; the first
    // `extra` buckets carry base+1 rows
    val q = expr("""CASE WHEN r <= (n DIV 4 + 1) * (n % 4)
                   |  THEN (r - 1) DIV (n DIV 4 + 1) + 1
                   |  ELSE n % 4 + (r - 1 - (n DIV 4 + 1) * (n % 4)) DIV (n DIV 4) + 1
                   |END""".stripMargin)
    val tops = ranked.filter(col("r") === 1)
      .select(col("cls"), col("o_orderkey").as("top_order"))
    ranked
      .withColumn("quartile", q.cast("int"))
      .groupBy(col("cls"), col("quartile"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("price")).as("min_price"),
        max(col("price")).as("max_price"))
      .join(broadcast(tops), Seq("cls"))
      .select(col("cls").as("o_orderpriority"), col("quartile"),
        col("n_orders"), col("min_price"), col("max_price"), col("top_order"))
      .orderBy(col("o_orderpriority"), col("quartile"))
  }

  lazy val q29Sql: String =
    """WITH q AS (
      |  SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE) AS price,
      |    ntile(4) OVER (PARTITION BY o_orderpriority
      |                   ORDER BY o_totalprice DESC, o_orderkey) AS quartile,
      |    first_value(o_orderkey) OVER (PARTITION BY o_orderpriority
      |                   ORDER BY o_totalprice DESC, o_orderkey) AS top_order
      |  FROM orders)
      |SELECT o_orderpriority, quartile, count(*) AS n_orders,
      |  min(price) AS min_price, max(price) AS max_price,
      |  min(top_order) AS top_order
      |FROM q GROUP BY o_orderpriority, quartile
      |ORDER BY o_orderpriority, quartile""".stripMargin

  // ---- q30: fixed-width histogram (width_bucket shape) ----
  // Bin by integer CENT arithmetic — price×100 is exact in cents, the
  // bucket is a pure integer floor-division, so bin assignment is
  // bit-identical on both engines at any value (a double-division
  // binning would disagree exactly at bucket edges). One map-side-
  // combined aggregate over the scan; output is |buckets| rows.
  private val HistWidthCents = 5000000L  // $50k buckets

  def q30Histogram(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("cents", (dec(col("o_totalprice")) * 100).cast("long"))
      .withColumn("bin", expr(s"cents DIV $HistWidthCents"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_orders"),
        (min(col("cents")).cast("double") / 100).as("min_price"),
        (max(col("cents")).cast("double") / 100).as("max_price"))
      .orderBy(col("bin"))

  lazy val q30Sql: String =
    s"""WITH c AS (
       |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM orders)
       |SELECT cents // $HistWidthCents AS bin, count(*) AS n_orders,
       |  CAST(min(cents) AS DOUBLE) / 100 AS min_price,
       |  CAST(max(cents) AS DOUBLE) / 100 AS max_price
       |FROM c GROUP BY bin ORDER BY bin""".stripMargin

  // ---- q31: count-min sketch — bounded-memory heavy-hitter counts ----
  // The frequency-sketch sibling of q23's KMV distinct sketch: a
  // d×w counter grid where cell (r, h_r(k)) accumulates every
  // occurrence of key k, and est(k) = min_r grid[r][h_r(k)] ≥ true
  // count (overcounts only — collisions add, never subtract). The
  // sketch is O(d·w) CONSTANT memory at any stream size and merges by
  // cell-wise sum, so at 100 TB it's one map-side-combined aggregate
  // shuffling ≤ d·w pre-combined rows per partition — the streaming/
  // distributed answer to "top keys without a full groupBy". Here the
  // gate builds the grid, then audits it against the EXACT top-20
  // heavy hitters (TakeOrdered — no global window): est ≥ exact always,
  // and `overcount` exposes the collision error the d/w knobs price.
  // The row hashes are the shared (k + r·131)·2654435761 integer
  // construction (exact on both engines; products stay < 2^63 for
  // keys < ~3.4e9 — at larger key domains widen to the 128-bit hash).
  private[graft] val CmsRows = 4
  private[graft] val CmsWidth = 64

  private[graft] def cmsBucket(kCol: String, rCol: String): String =
    s"(($kCol + $rCol * 131) * 2654435761L) % 1000003 % $CmsWidth"

  def q31CountMin(spark: SparkSession, dir: String): DataFrame = {
    val items = t(spark, dir, "lineitem")
      .select(col("l_partkey").cast("long").as("k"))
    // the sketch: d·w cells, map-side combined (256 rows total here)
    val cells = items
      .select(col("k"), explode(expr(s"sequence(0, ${CmsRows - 1})")).as("r"))
      .withColumn("bucket", expr(cmsBucket("k", "r")))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    // exact top-20 heavy hitters via TakeOrderedAndProject — a
    // distributed bounded top-k, NOT a single-partition window sort
    val top = items.groupBy(col("k")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("k")).limit(20)
    val probes = top
      .select(col("k"), col("exact_cnt"),
        explode(expr(s"sequence(0, ${CmsRows - 1})")).as("r"))
      .withColumn("bucket", expr(cmsBucket("k", "r")))
    probes.join(broadcast(cells), Seq("r", "bucket"))
      .groupBy(col("k"), col("exact_cnt"))
      .agg(min(col("c")).as("cms_est"))
      .select(col("k").as("part_key"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overcount"))
      .orderBy(col("part_key"))
  }

  lazy val q31Sql: String =
    s"""WITH items AS (SELECT CAST(l_partkey AS BIGINT) AS k FROM lineitem),
       |cells AS (
       |  SELECT g.r, ((k + g.r * 131) * 2654435761) % 1000003 % $CmsWidth AS bucket,
       |    count(*) AS c
       |  FROM items, generate_series(0, ${CmsRows - 1}) g(r) GROUP BY 1, 2),
       |top AS (
       |  SELECT k, count(*) AS exact_cnt FROM items GROUP BY k
       |  ORDER BY exact_cnt DESC, k LIMIT 20),
       |probes AS (
       |  SELECT t.k, t.exact_cnt, g.r,
       |    ((t.k + g.r * 131) * 2654435761) % 1000003 % $CmsWidth AS bucket
       |  FROM top t, generate_series(0, ${CmsRows - 1}) g(r))
       |SELECT p.k AS part_key, p.exact_cnt, min(c.c) AS cms_est,
       |  min(c.c) - p.exact_cnt AS overcount
       |FROM probes p JOIN cells c ON c.r = p.r AND c.bucket = p.bucket
       |GROUP BY p.k, p.exact_cnt ORDER BY part_key""".stripMargin

  // ---- q32: grouped correlation / covariance / regression slope ----
  // The bivariate-statistics aggregate class (corr/covar_pop/
  // regr_slope). NOT the built-in `corr`: its running-moment
  // accumulation is IEEE-order-dependent, so two engines (or two
  // partitionings of the same engine!) disagree in the last bits. The
  // exact form: six integer power sums (n, Σx, Σy, Σx², Σy², Σxy) in
  // one map-side-combined aggregate — quantity as units, price as
  // cents — then ONE fixed-shape double expression per statistic:
  //   cov = (n·Σxy − ΣxΣy)/n², corr = (n·Σxy − ΣxΣy)/(√(n·Σx²−Σx²̇)·
  //   √(n·Σy²−Σy²̇)), slope = (n·Σxy − ΣxΣy)/(n·Σx²−Σx²̇).
  // Same tree on both engines ⇒ bit-exact, and DETERMINISTIC under
  // any partitioning — the property the built-in can't give. Power
  // sums accumulate as DECIMAL(38,0) (Σy² ~ 1.2e14/row clears BIGINT
  // near 80k rows; DuckDB's HUGEINT matches): exact integers, cast to
  // double once at the end. One shuffle of 6 pre-combined cells per
  // group; 100 TB-safe by construction.
  def q32Corr(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem").select(
      col("l_returnflag"),
      expr("cast(l_quantity as bigint)").as("x"),
      (dec(col("l_extendedprice")) * 100).cast("long").as("y"))
    def dsum(e: org.apache.spark.sql.Column) = sum(e.cast("decimal(38,0)"))
    val g = l.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
        dsum(col("x") * col("x")).as("sxx"),
        dsum(col("y") * col("y")).as("syy"),
        dsum(col("x") * col("y")).as("sxy"))
    val nD = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = nD * d("sxy") - d("sx") * d("sy")
    val varx = nD * d("sxx") - d("sx") * d("sx")
    val vary = nD * d("syy") - d("sy") * d("sy")
    // a zero-variance group (every x or y identical — degenerate
    // inputs, single-row groups) has no defined corr/slope: NULL on
    // both engines, not an ANSI divide-by-zero
    def safe(numr: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      numr / when(den =!= 0.0, den)
    g.select(col("l_returnflag"), col("n"),
        (num / (nD * nD)).as("cov_qty_price"),
        safe(num, sqrt(varx) * sqrt(vary)).as("corr_qty_price"),
        safe(num, varx).as("regr_slope"))
      .orderBy(col("l_returnflag"))
  }

  // ---- q33: HyperLogLog distinct sketch — bounded-memory cardinality ----
  // Completes the sketch family: q23 KMV (exact-k distinct), q31 CMS
  // (frequency), q33 HLL (the fixed-register distinct estimator that
  // ships in every production engine — approx_count_distinct's
  // algorithm, built here as a RELATIONAL register table so the gate
  // can audit the exact state, not just the estimate). 64 registers
  // (p=6): bucket = h mod 64, rho = trailing-zero rank of the
  // remaining 26 bits (the Flajolet-Martin geometric statistic; same
  // analysis as leading-zeros since the bits are iid uniform), register
  // = max rho. The register table is ONE map-side-combined aggregate —
  // O(64) state per group at any stream size, mergeable by cell-wise
  // max, shuffling ≤ 64 pre-combined rows per partition per group:
  // the 100 TB answer to count-distinct without q8's full expand.
  // The harmonic mean Σ 2^-M_j is computed EXACTLY in integers —
  // Σ 2^(maxM−M_j) over a common 2^maxM denominator (+ 2^maxM per
  // empty register) — so every gated column but the final estimate is
  // an exact integer, and the estimate itself is ONE fixed-shape
  // double expression (identical tree on both engines ⇒ bit-exact).
  // Exact distinct per group is joined alongside: `hll_raw` vs
  // `n_exact` exposes the ±1.04/√64 ≈ 13% error band p prices.
  private val HllBuckets = 64 // p = 6; registers per group
  private val HllRhoMax = 27  // w has 26 bits; rho(0) ≔ 27

  /** (grp, bucket, m) HLL register table of a (grp, k) frame — the
    * mergeable sketch state (cell-wise max merges two corpora; the
    * spec pins the law). A plain multiplicative spread is bijective
    * on low bits, so trailing-zero statistics inherit the key
    * structure (measured: 24-96% estimate error on sequential
    * orderkeys); the xor-shift-multiply finalizer avalanches every
    * bit, and the 2^27 multiplier keeps products < 2^59 (the q31
    * overflow discipline). The +offset kills the zero fixed point
    * (hash(0)=0 for any xor-multiply chain; orderkey 0 exists and
    * its rho-27 outlier register measurably skewed the harmonic
    * mean). */
  def hllRegistersOf(items: DataFrame): DataFrame =
    items
      .withColumn("x0", expr("(k + 1469598103L) % 4294967296L"))
      .withColumn("x1", expr("(((x0 div 65536) ^ x0) * 73244475L) % 4294967296L"))
      .withColumn("x2", expr("(((x1 div 65536) ^ x1) * 73244475L) % 4294967296L"))
      .withColumn("h", expr("(x2 div 65536) ^ x2"))
      .withColumn("bucket", expr(s"h % $HllBuckets"))
      .withColumn("w", expr(s"h div $HllBuckets"))
      .withColumn("rho",
        expr(s"CASE WHEN w = 0 THEN $HllRhoMax ELSE cast(log2(w & -w) as int) + 1 END"))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).as("m"))

  /** The estimate from a register table: exact-integer harmonic sum
    * (common 2^maxM denominator, empty registers contribute 2^maxM)
    * + ONE fixed-shape double expression. */
  def hllEstimateOf(regs: DataFrame): DataFrame = {
    val mx = regs.groupBy(col("grp"))
      .agg(max(col("m")).as("maxm"), count(lit(1)).as("nhit"))
    regs.join(mx, Seq("grp"))
      .groupBy(col("grp"), col("maxm"), col("nhit"))
      .agg(sum(expr("shiftleft(cast(1 as bigint), maxm - m)")).as("s_hit"))
      .withColumn("s_sum",
        col("s_hit") + expr(s"($HllBuckets - nhit) * shiftleft(cast(1 as bigint), maxm)"))
      .select(col("grp"), col("nhit").as("n_buckets_hit"),
        col("maxm").as("max_rho"), col("s_sum"),
        expr(s"0.709 * $HllBuckets.0 * $HllBuckets.0" +
          " * cast(shiftleft(cast(1 as bigint), maxm) as double)" +
          " / cast(s_sum as double)").as("hll_raw"))
  }

  def q33Hll(spark: SparkSession, dir: String): DataFrame = {
    val items = t(spark, dir, "lineitem")
      .select(col("l_returnflag").as("grp"), col("l_orderkey").cast("long").as("k"))
    val exact = items.groupBy(col("grp"))
      .agg(countDistinct(col("k")).as("n_exact"))
    hllEstimateOf(hllRegistersOf(items))
      .join(exact, Seq("grp"))
      .select(col("grp").as("l_returnflag"), col("n_exact"),
        col("n_buckets_hit"), col("max_rho"), col("s_sum"), col("hll_raw"))
      .orderBy(col("l_returnflag"))
  }

  /** Parameterized DuckDB mirror of [[hllRegistersOf]] ∘
    * [[hllEstimateOf]] + the exact distinct joined alongside — one
    * oracle body for every consumer of the register machinery (q33
    * groups by returnflag; e13 groups by tumbling hour), so a change
    * to the hash or the harmonic sum updates every gate in lockstep. */
  def hllSqlFor(table: String, grpExpr: String, keyExpr: String,
      grpName: String): String =
    s"""WITH items AS (
       |  SELECT $grpExpr AS g, $keyExpr AS k FROM $table),
       |x0 AS (SELECT g, (k + 1469598103) % 4294967296 AS x0 FROM items),
       |x1 AS (SELECT g,
       |         (xor(x0 // 65536, x0) * 73244475) % 4294967296 AS x1 FROM x0),
       |x2 AS (SELECT g,
       |         (xor(x1 // 65536, x1) * 73244475) % 4294967296 AS x2 FROM x1),
       |h AS (SELECT g, xor(x2 // 65536, x2) AS h FROM x2),
       |b AS (SELECT g, h % $HllBuckets AS bucket, h // $HllBuckets AS w FROM h),
       |r AS (SELECT g, bucket,
       |        CASE WHEN w = 0 THEN $HllRhoMax
       |             ELSE CAST(log2(w & -w) AS INTEGER) + 1 END AS rho FROM b),
       |regs AS (SELECT g, bucket, max(rho) AS m FROM r GROUP BY 1, 2),
       |mx AS (SELECT g, max(m) AS maxm, count(*) AS nhit
       |       FROM regs GROUP BY 1),
       |s AS (SELECT regs.g, maxm, nhit,
       |        CAST(sum(CAST(1 AS BIGINT) << (maxm - m)) AS BIGINT) AS s_hit
       |      FROM regs JOIN mx USING (g) GROUP BY 1, 2, 3),
       |e AS (SELECT g, count(DISTINCT k) AS n_exact FROM items GROUP BY 1)
       |SELECT s.g AS $grpName, e.n_exact,
       |  CAST(nhit AS BIGINT) AS n_buckets_hit, maxm AS max_rho,
       |  s_hit + ($HllBuckets - nhit) * (CAST(1 AS BIGINT) << maxm) AS s_sum,
       |  0.709 * $HllBuckets.0 * $HllBuckets.0
       |    * CAST(CAST(1 AS BIGINT) << maxm AS DOUBLE)
       |    / CAST(s_hit + ($HllBuckets - nhit) * (CAST(1 AS BIGINT) << maxm) AS DOUBLE)
       |    AS hll_raw
       |FROM s JOIN e USING (g) ORDER BY s.g""".stripMargin

  lazy val q33Sql: String =
    hllSqlFor("lineitem", "l_returnflag", "CAST(l_orderkey AS BIGINT)",
      "l_returnflag")

  lazy val q32Sql: String =
    """WITH l AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      |  FROM lineitem),
      |s AS (
      |  SELECT l_returnflag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      |  FROM l GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS cov_qty_price,
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / NULLIF(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |       * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0) AS corr_qty_price,
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0) AS regr_slope
      |FROM s ORDER BY l_returnflag""".stripMargin

  // ---- q34: grouped top-k via the bounded aggregate (no window) ----
  // "Top 5 parts by revenue per supplier" — the canonical grouped
  // arg-max. The naive `row_number() OVER (PARTITION BY supplier)`
  // ships EVERY (supplier, part) row through the window exchange and
  // sorts full groups to keep 5; the bounded top-k aggregate
  // (s1's `graft_top_neighbors5`) keeps O(k) state per supplier,
  // map-side combines, and shuffles only k·P pre-trimmed rows — the
  // same replacement that fixed s1's per-query sort, applied to the
  // relational side. Revenue is exact integer cents (decimal-cast
  // then ×100 — the double is exact ≤ 2^53), so the gate is exact and
  // the aggregate's (value DESC, id ASC) tie-break mirrors the
  // oracle's row_number ORDER BY.
  def q34TopPerGroup(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    t(spark, dir, "lineitem")
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum((dec(col("l_extendedprice")) * 100).cast("long")).as("rev_cents"))
      .groupBy(col("l_suppkey"))
      .agg(expr("graft_top_neighbors5(cast(rev_cents as double), l_partkey)")
        .as("top"))
      .select(col("l_suppkey"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("l_suppkey"), col("p.neighbor_id").as("l_partkey"),
        col("p.cosine").cast("long").as("rev_cents"),
        (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col("l_suppkey"), col("rank"))
  }

  lazy val q34Sql: String =
    """WITH pr AS (
      |  SELECT l_suppkey, l_partkey,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |         AS BIGINT) AS rev_cents
      |  FROM lineitem GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER (PARTITION BY l_suppkey
      |        ORDER BY rev_cents DESC, l_partkey) AS rank FROM pr)
      |SELECT l_suppkey, l_partkey, rev_cents, rank FROM r
      |WHERE rank <= 5 ORDER BY l_suppkey, rank""".stripMargin

  // ---- q35: unpivot (wide measures → long rows), q26's inverse ----
  // The reshape pair's other half: three exact-decimal measure
  // columns per return flag stacked into (measure, value) rows via
  // `stack` — a generator expression evaluated IN the projection
  // (one codegen'd stage over the tiny aggregate output, no join, no
  // explode of anything corpus-sized; the only shuffle is the
  // group-by that built the measures). Oracle is the literal 3-way
  // UNION ALL an engine without UNPIVOT writes.
  def q35Unpivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)")
          - dec(col("l_discount")))).cast("double").as("sum_disc"))
      .selectExpr("l_returnflag",
        """stack(3, 'sum_qty', sum_qty, 'sum_base', sum_base,
          |'sum_disc', sum_disc) AS (measure, value)""".stripMargin)
      .orderBy(col("l_returnflag"), col("measure"))

  lazy val q35Sql: String =
    """WITH a AS (
      |  SELECT l_returnflag,
      |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base,
      |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE) AS sum_disc
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
      |UNION ALL
      |SELECT l_returnflag, 'sum_base', sum_base FROM a
      |UNION ALL
      |SELECT l_returnflag, 'sum_disc', sum_disc FROM a
      |ORDER BY l_returnflag, measure""".stripMargin

  // ---- q36: RANGE (value-based) window frames — trailing 30 days ----
  // The frame class q28's ROWS frames don't cover: a RANGE frame keys
  // the window on the ORDER VALUE (here: days since epoch date), so a
  // row's trailing sum spans a fixed TIME interval regardless of how
  // many rows fall in it — the "revenue in the last 30 days" query
  // every sales dashboard runs, and the SQL-standard case where ROWS
  // and RANGE genuinely disagree (multiple orders on one day are all
  // peers: each sees the full day's total). Partition key o_custkey
  // grows with data, rows per partition are orders-per-customer
  // (bounded); sums are exact integer cents; day numbers are exact
  // integer datediffs — both engines agree bit-for-bit, including the
  // all-peers-included tie rule.
  def q36RangeFrames(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("days"))
      .rangeBetween(-30, 0)
    t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), to_date(lit("1992-01-01"))).cast("long")
          .as("days"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      .withColumn("trail30_cents", sum(col("cents")).over(w))
      .orderBy(col("o_orderkey"))
  }

  lazy val q36Sql: String =
    """WITH o AS (
      |  SELECT o_orderkey, o_custkey,
      |    CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS days,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders)
      |SELECT o_orderkey, o_custkey, days, cents,
      |  CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY days
      |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail30_cents
      |FROM o ORDER BY o_orderkey""".stripMargin

  // ---- q37: Bloom-filter runtime pre-filter (semi-join reduction) ----
  // Completes the sketch family (q23 KMV: distinct, q31 CMS:
  // frequency, q33 HLL: cardinality) with MEMBERSHIP — the sketch
  // that ships as a join runtime filter: build an m-bit Bloom filter
  // over the dim-side key set, broadcast it, and drop fact rows at
  // the SCAN, before they reach the join shuffle. Spark has its own
  // bloom runtime filter; this one is engine-portable, auditable
  // (every bit position is integer arithmetic the oracle recomputes),
  // and gated on its real quality numbers: rows pruned, false-positive
  // count — the m/k knobs priced the way d8/d12 price the LSH bands.
  //
  // Build = ONE map-side-combined bit_or aggregate into ≤ 32 rows
  // (32 × 32-bit words — 32-bit words by d3's convention: bit 63 sign
  // games differ across engines): O(m) state at ANY build size,
  // mergeable word-wise like q33's registers. Probe = two broadcast
  // word lookups per fact row inside the scan's codegen stage; the
  // fact table never shuffles. Positions come from q33's avalanche
  // chain (h%1024, (h÷1024)%1024 — double hashing from one 32-bit
  // hash). At gate scale 662 set bits in 1024 give a measured-honest
  // ~23% FP rate — both verdict branches live; production sizes m to
  // n·10 bits for ~1% at k=2.
  private[operators] val BloomBits = 1024
  def q37BloomFilter(spark: SparkSession, dir: String): DataFrame = {
    val keys = t(spark, dir, "part").filter(col("p_type") === "PROMO")
      .select(col("p_partkey").cast("long").as("k")).distinct()
    val probe = bloomVerdictOf(keys,
      t(spark, dir, "lineitem").select(col("l_partkey").cast("long").as("k")))
    probe.agg(count(lit(1)).as("n_probe"),
      sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass_bloom"),
      sum(when(col("is_true"), 1L).otherwise(0L)).as("n_true"),
      sum(when(col("pass") && col("is_true").isNull, 1L).otherwise(0L))
        .as("n_false_pos"))
  }

  /** The per-row Bloom verdict over any distinct key frame `keys` and
    * probe frame (both with a long `k` column): (k, pass, is_true) —
    * factored so the spec can pin the no-false-negative law (every
    * member key passes, the property a runtime filter is allowed to
    * rely on). */
  def bloomVerdictOf(keys: DataFrame, probeKeys: DataFrame,
      bits: Int = BloomBits): DataFrame = {
    def hashed(df: DataFrame): DataFrame = df
      .withColumn("x0", expr("(k + 1469598103L) % 4294967296L"))
      .withColumn("x1", expr("(((x0 div 65536) ^ x0) * 73244475L) % 4294967296L"))
      .withColumn("x2", expr("(((x1 div 65536) ^ x1) * 73244475L) % 4294967296L"))
      .withColumn("h", expr("(x2 div 65536) ^ x2"))
      .withColumn("p1", expr(s"h % $bits"))
      .withColumn("p2", expr(s"(h div $bits) % $bits"))
    val bloom = hashed(keys)
      .select(explode(array(col("p1"), col("p2"))).as("pos"))
      .select(expr("pos div 32").as("word"),
        expr("shiftleft(cast(1 as bigint), cast(pos % 32 as int))").as("mask"))
      .groupBy(col("word")).agg(expr("bit_or(mask)").as("bits"))
    hashed(probeKeys)
      .join(broadcast(bloom.withColumnRenamed("word", "w1")
        .withColumnRenamed("bits", "b1")),
        expr("p1 div 32") === col("w1"), "left_outer")
      .join(broadcast(bloom.withColumnRenamed("word", "w2")
        .withColumnRenamed("bits", "b2")),
        expr("p2 div 32") === col("w2"), "left_outer")
      .withColumn("pass",
        (coalesce(col("b1"), lit(0L))
          .bitwiseAND(expr("shiftleft(cast(1 as bigint), cast(p1 % 32 as int))")) =!= 0L)
          && (coalesce(col("b2"), lit(0L))
            .bitwiseAND(expr("shiftleft(cast(1 as bigint), cast(p2 % 32 as int))")) =!= 0L))
      .join(broadcast(keys.select(col("k"), lit(true).as("is_true"))),
        Seq("k"), "left_outer")
      .select(col("k"), col("pass"), col("is_true"))
  }

  lazy val q37Sql: String =
    s"""WITH keys AS (
       |  SELECT DISTINCT CAST(p_partkey AS BIGINT) AS k
       |  FROM part WHERE p_type = 'PROMO'),
       |kh AS (
       |  SELECT k, xor(x2 // 65536, x2) AS h FROM (
       |    SELECT k, (xor(x1 // 65536, x1) * 73244475) % 4294967296 AS x2 FROM (
       |      SELECT k, (xor(x0 // 65536, x0) * 73244475) % 4294967296 AS x1 FROM (
       |        SELECT k, (k + 1469598103) % 4294967296 AS x0 FROM keys)))),
       |kp AS (
       |  SELECT k, h % $BloomBits AS p1, (h // $BloomBits) % $BloomBits AS p2
       |  FROM kh),
       |bloom AS (
       |  SELECT pos // 32 AS word,
       |    bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS bits
       |  FROM (SELECT unnest([p1, p2]) AS pos FROM kp) GROUP BY 1),
       |lh AS (
       |  SELECT k, xor(x2 // 65536, x2) AS h FROM (
       |    SELECT k, (xor(x1 // 65536, x1) * 73244475) % 4294967296 AS x2 FROM (
       |      SELECT k, (xor(x0 // 65536, x0) * 73244475) % 4294967296 AS x1 FROM (
       |        SELECT k, (k + 1469598103) % 4294967296 AS x0 FROM (
       |          SELECT CAST(l_partkey AS BIGINT) AS k FROM lineitem))))),
       |lp AS (
       |  SELECT k, h % $BloomBits AS p1, (h // $BloomBits) % $BloomBits AS p2
       |  FROM lh),
       |verdict AS (
       |  SELECT lp.k,
       |    (coalesce(b1.bits, 0) & (CAST(1 AS BIGINT) << CAST(p1 % 32 AS INTEGER))) != 0
       |      AND
       |    (coalesce(b2.bits, 0) & (CAST(1 AS BIGINT) << CAST(p2 % 32 AS INTEGER))) != 0
       |      AS pass,
       |    t.is_true
       |  FROM lp
       |  LEFT JOIN bloom b1 ON p1 // 32 = b1.word
       |  LEFT JOIN bloom b2 ON p2 // 32 = b2.word
       |  LEFT JOIN (SELECT k, true AS is_true FROM keys) t ON lp.k = t.k)
       |SELECT count(*) AS n_probe,
       |  CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_bloom,
       |  CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       |  CAST(sum(CASE WHEN pass AND is_true IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_false_pos
       |FROM verdict""".stripMargin

  // ---- q38: median absolute deviation (robust dispersion) ----
  // The robust-statistics row next to q24 (percentiles) and q32
  // (moments): MAD = median(|x − median(x)|), the dispersion measure
  // outliers can't drag (stddev moves arbitrarily with one bad row;
  // MAD has a 50% breakdown point — why data-quality monitors
  // threshold on it, e11's z-score rule being the moment-based
  // contrast). Two exact passes: per-group median via percentile_disc
  // (an actual data value), broadcast back (|groups| rows), then the
  // deviation median over exact integer cents — every gated column
  // integer, no interpolation anywhere. Only (group, cents) pairs
  // shuffle into each percentile sort; 100 TB-safe like q24.
  def q38Mad(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
    val med = l.groupBy(col("l_returnflag"))
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)")
        .cast("long").as("median_cents"))
    l.join(broadcast(med), Seq("l_returnflag"))
      .withColumn("dev", abs(col("cents") - col("median_cents")))
      .groupBy(col("l_returnflag"), col("median_cents"))
      .agg(count(lit(1)).as("n"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dev)")
          .cast("long").as("mad_cents"))
      .select(col("l_returnflag"), col("n"), col("median_cents"),
        col("mad_cents"))
      .orderBy(col("l_returnflag"))
  }

  lazy val q38Sql: String =
    """WITH l AS (
      |  SELECT l_returnflag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM lineitem),
      |med AS (
      |  SELECT l_returnflag,
      |    CAST(quantile_disc(cents, 0.5) AS BIGINT) AS median_cents
      |  FROM l GROUP BY 1)
      |SELECT l.l_returnflag, count(*) AS n, med.median_cents,
      |  CAST(quantile_disc(abs(cents - median_cents), 0.5) AS BIGINT) AS mad_cents
      |FROM l JOIN med USING (l_returnflag)
      |GROUP BY 1, 3 ORDER BY l_returnflag""".stripMargin

  // ---- q39: grouped statistical mode (most frequent value) ----
  // The third robust-statistics gauge next to q24's percentiles and
  // q38's MAD: the modal quantity per (returnflag, linestatus). Two
  // map-side-combined hash aggregates — count per (group, value),
  // then one min(struct(-cnt, value)) per group — no window, no
  // per-group sort anywhere (the q34 lesson applied to argmax): the
  // first agg shuffles at most |groups|·|distinct values| rows, the
  // second |groups|. Ties break to the SMALLEST value via the
  // struct's lexicographic order, so the answer is deterministic and
  // engine-portable at any scale.
  def q39Mode(spark: SparkSession, dir: String): DataFrame = {
    val cnt = t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("long").as("qty"))
      .groupBy(col("l_returnflag"), col("l_linestatus"), col("qty"))
      .agg(count(lit(1)).as("cnt"))
    cnt.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(min(struct((-col("cnt")).as("nc"), col("qty").as("q"))).as("m"),
        sum(col("cnt")).as("n"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("m.q").as("mode_qty"), (-col("m.nc")).as("mode_count"), col("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  lazy val q39Sql: String =
    """WITH c AS (
      |  SELECT l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT) AS qty,
      |    count(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2, 3),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY l_returnflag, l_linestatus
      |              ORDER BY cnt DESC, qty) AS rk,
      |    sum(cnt) OVER (PARTITION BY l_returnflag, l_linestatus) AS n
      |  FROM c)
      |SELECT l_returnflag, l_linestatus, qty AS mode_qty, cnt AS mode_count,
      |  CAST(n AS BIGINT) AS n
      |FROM r WHERE rk = 1 ORDER BY 1, 2""".stripMargin

  // ---- q40: Pareto / ABC analysis (cumulative revenue share) ----
  // The 80/20 table every category manager reads: brands ranked by
  // revenue, cumulative share, A/B/C class cut at 70%/95%. The heavy
  // work is ONE map-side-combined aggregate over lineitem ⋈ broadcast
  // part (exact decimal cents); the running-total window then orders
  // the |brands|-row SUMMARY — a bounded dimension, never the fact
  // stream (the q29 lesson: windows may sort summaries, not data).
  // The grand total rides the same window frame (range unbounded both
  // ways would be a second pass; a broadcast one-row total join costs
  // nothing at |brands| rows). Shares in integer ppm of exact cents.
  def q40Pareto(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum((dec(col("l_extendedprice")) * 100).cast("long"))
        .as("rev_cents"))
    val w = Window.orderBy(col("rev_cents").desc, col("p_brand"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = rev.agg(sum(col("rev_cents")).as("total_cents"))
    rev.crossJoin(broadcast(tot))
      .withColumn("cum_cents", sum(col("rev_cents")).over(w))
      // 1e6 · cum_cents tops BIGINT once corpus revenue passes ~9e12
      // cents (sf1 already does) — the ppm ratio multiplies in
      // DECIMAL(38,0), the q32/v7 wide-integer posture
      .withColumn("cum_ppm",
        expr("cast(1000000 * cast(cum_cents as decimal(38,0)) div total_cents as bigint)"))
      .withColumn("abc_class",
        when(col("cum_ppm") <= 700000L, "A")
          .when(col("cum_ppm") <= 950000L, "B").otherwise("C"))
      .select(col("p_brand"), col("rev_cents"), col("cum_cents"),
        col("cum_ppm"), col("abc_class"))
      .orderBy(col("cum_ppm"))
  }

  lazy val q40Sql: String =
    """WITH rev AS (
      |  SELECT p_brand,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT)
      |      AS rev_cents
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1),
      |c AS (
      |  SELECT p_brand, rev_cents,
      |    CAST(sum(rev_cents) OVER (ORDER BY rev_cents DESC, p_brand
      |                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |      AS cum_cents,
      |    CAST((SELECT sum(rev_cents) FROM rev) AS BIGINT) AS total_cents
      |  FROM rev)
      |SELECT p_brand, rev_cents, cum_cents,
      |  CAST(1000000 * CAST(cum_cents AS HUGEINT) // total_cents AS BIGINT)
      |    AS cum_ppm,
      |  CASE WHEN 1000000 * CAST(cum_cents AS HUGEINT) // total_cents
      |            <= 700000 THEN 'A'
      |       WHEN 1000000 * CAST(cum_cents AS HUGEINT) // total_cents
      |            <= 950000 THEN 'B'
      |       ELSE 'C' END AS abc_class
      |FROM c ORDER BY cum_ppm""".stripMargin

  // ---- q41: band (non-equi) self-join, bucketed into an equi-join ----
  // Same-brand part pairs whose retail prices differ by at most
  // BandCents. Writing the |Δprice| <= band predicate directly gives
  // Catalyst nothing to hash on — it plans a nested-loop join that is
  // O(n²) per brand at 100 TB. The classic range-join rewrite: bucket
  // prices into band-width cells, explode the LEFT side to probe its
  // own cell and both neighbors, equi-join on (brand, cell), then
  // apply the band predicate as a cheap residual filter. Any
  // qualifying pair's cells differ by at most 1, and each right row
  // lives in exactly one cell, so every pair is matched exactly once —
  // no distinct needed. Shuffle volume is 3×|part| instead of a
  // per-brand cross product; cell count grows with the data, so
  // parallelism does too.
  private val BandCents = 100L

  def q41BandJoin(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part")
      .select(col("p_partkey").as("k"), col("p_brand").as("brand"),
        (dec(col("p_retailprice")) * 100).cast("long").as("cents"))
      .withColumn("cell", expr(s"cents div $BandCents"))
    val probes = p.select(col("k"), col("brand"), col("cents"),
      explode(array(col("cell") - 1, col("cell"), col("cell") + 1)).as("cell"))
    probes.as("x")
      .join(p.as("y"),
        col("x.brand") === col("y.brand") && col("x.cell") === col("y.cell")
          && col("x.k") < col("y.k"))
      .filter(abs(col("x.cents") - col("y.cents")) <= BandCents)
      .groupBy(col("x.brand").as("brand"))
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("x.cents") - col("y.cents"))).as("min_gap_cents"),
        max(abs(col("x.cents") - col("y.cents"))).as("max_gap_cents"),
        sum(abs(col("x.cents") - col("y.cents"))).as("sum_gap_cents"))
      .orderBy(col("brand"))
  }

  lazy val q41Sql: String =
    s"""WITH p AS (
       |  SELECT p_partkey AS k, p_brand AS brand,
       |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM part)
       |SELECT x.brand, count(*) AS n_pairs,
       |  CAST(min(abs(x.cents - y.cents)) AS BIGINT) AS min_gap_cents,
       |  CAST(max(abs(x.cents - y.cents)) AS BIGINT) AS max_gap_cents,
       |  CAST(sum(abs(x.cents - y.cents)) AS BIGINT) AS sum_gap_cents
       |FROM p x JOIN p y
       |  ON x.brand = y.brand AND x.k < y.k
       |  AND abs(x.cents - y.cents) <= $BandCents
       |GROUP BY x.brand ORDER BY x.brand""".stripMargin

  // ---- q42: skyline (Pareto frontier) via two-phase running min ----
  // Parts minimized on (price, size): keep p unless some q has
  // cents<=, size<= with one strict. 2-D skyline reduces to running
  // minima: dominated iff  min(size | cents < c) <= s  OR
  // min(size | cents = c) < s. A single global RANGE window computes
  // that but serializes into ONE task at 100 TB, so the strictly-
  // cheaper min is two-phase (the t6 prefix-sum shape): per price-
  // shard windows run in parallel (shard count grows with the data),
  // and only the |shards|-row summary takes a global window; the
  // exclusive cross-shard prefix min broadcasts back. Bit-identical
  // to the one-window formulation for any shard width — the oracle
  // uses the direct single-window SQL, and Round11OpsSpec proves ≡
  // the NOT EXISTS definition.
  private val SkyShardCents = 1000L

  def q42Skyline(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = t(spark, dir, "part")
      .select(col("p_partkey").as("k"), col("p_brand").as("brand"),
        (dec(col("p_retailprice")) * 100).cast("long").as("cents"),
        col("p_size").cast("long").as("psize"))
      .withColumn("shard", expr(s"cents div $SkyShardCents"))
    // phase 1: per-shard minima; exclusive prefix min over the tiny summary
    val sMin = p.groupBy(col("shard")).agg(min(col("psize")).as("smin"))
    val pw = Window.orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prior = sMin.withColumn("pmin", min(col("smin")).over(pw))
      .select(col("shard"), col("pmin"))
    // phase 2: within-shard strictly-cheaper min, parallel across shards
    val ww = Window.partitionBy(col("shard")).orderBy(col("cents"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val ew = Window.partitionBy(col("cents"))
    p.join(broadcast(prior), Seq("shard"))
      .withColumn("m1", least(min(col("psize")).over(ww), col("pmin")))
      .withColumn("m2", min(col("psize")).over(ew))
      .filter((col("m1").isNull || col("m1") > col("psize"))
        && col("m2") >= col("psize"))
      .select(col("k"), col("brand"), col("cents"), col("psize"))
      .orderBy(col("cents"), col("psize"), col("k"))
  }

  lazy val q42Sql: String =
    """WITH p AS (
      |  SELECT p_partkey AS k, p_brand AS brand,
      |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    CAST(p_size AS BIGINT) AS psize
      |  FROM part),
      |w AS (
      |  SELECT k, brand, cents, psize,
      |    min(psize) OVER (ORDER BY cents
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1,
      |    min(psize) OVER (PARTITION BY cents) AS m2
      |  FROM p)
      |SELECT k, brand, cents, psize FROM w
      |WHERE (m1 IS NULL OR m1 > psize) AND m2 >= psize
      |ORDER BY cents, psize, k""".stripMargin

  // ---- q43: relative-rank window functions (percent_rank / cume_dist) ----
  // The remaining ANSI window-rank surface after q7 (row_number), q27
  // (lead/lag), q29 (ntile) and q34 (top-k): each customer's orders
  // ranked RELATIVELY by spend — dense_rank, percent_rank
  // ((rank−1)/(n−1)) and cume_dist (rows≤ / n). Both engines divide
  // the same exact integers once, so the doubles are bit-identical
  // (the t2 single-division contract). Partition key is o_custkey —
  // cardinality grows with the data and each customer holds a bounded
  // handful of orders, so no q29-style fixed-class serialization.
  def q43RankFunctions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("cents"))
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
      .withColumn("drank", dense_rank().over(w).cast("long"))
      .withColumn("prank", percent_rank().over(w))
      .withColumn("cdist", cume_dist().over(w))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  lazy val q43Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |  CAST(dense_rank() OVER w AS BIGINT) AS drank,
      |  percent_rank() OVER w AS prank,
      |  cume_dist() OVER w AS cdist
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---- q44: point-in-time (leakage-free) feature aggregation ----
  // The feature-engineering shape every training pipeline needs and
  // most get wrong: for each order, the customer's history STRICTLY
  // BEFORE it (count / spend / max of prior orders) — an expanding
  // window that must exclude the current row, or the feature leaks
  // its own label. rowsBetween(unboundedPreceding, -1) is the
  // point-in-time cut; ties on order date resolve by o_orderkey
  // identically in both engines, so "prior" is well defined. The
  // window partitions by o_custkey — grows with the data, bounded
  // rows per key — and the output is the feature table a model
  // trains on, exact integer cents.
  def q44PitFeatures(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
      .withColumn("prior_n", count(lit(1)).over(w))
      .withColumn("prior_sum_cents", coalesce(sum(col("cents")).over(w), lit(0L)))
      .withColumn("prior_max_cents", coalesce(max(col("cents")).over(w), lit(0L)))
      .drop("o_orderdate")
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  lazy val q44Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |  CAST(count(*) OVER w AS BIGINT) AS prior_n,
      |  coalesce(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    OVER w AS BIGINT), 0) AS prior_sum_cents,
      |  coalesce(CAST(max(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    OVER w AS BIGINT), 0) AS prior_max_cents
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---- q45: association lift over co-purchase pairs ----
  // Market-basket lift: for part pairs bought together in ≥2 orders,
  // lift = P(a,b) / (P(a)·P(b)) — computed as the exact integer
  // n_both·N·1e6 div (n_a·n_b) in ppm (lift > 1e6 means genuinely
  // associated, not just popular). Pair generation is the g28 shape
  // (per-order, bounded order size, shared bucket cap); supports are
  // one map-side-combined count per part joined back onto the
  // ≥2-support pair table — candidate-scale, never |part|². The
  // total-order count N rides a broadcast one-row frame. The classic
  // recommender / feature-correlation primitive.
  private def LiftOrderCap = graft.operators.graph.GraphOps.CoOrderCap

  def q45BasketLift(spark: SparkSession, dir: String): DataFrame = {
    // shares g28's DfCache'd membership + pair tables — one build
    // serves the support graph (g28) and the lift scores (q45)
    val capped = graft.operators.graph.GraphOps.coPurchaseMembers(spark, dir)
    val support = capped.groupBy(col("pk")).agg(count(lit(1)).as("n_part"))
    val totals = capped.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_orders_total"))
    val pairs = graft.operators.graph.GraphOps.coPurchasePairs(spark, dir)
      .withColumnRenamed("n_orders", "n_both")
      .filter(col("n_both") >= 2)
    pairs
      .join(support.select(col("pk").as("part_a"), col("n_part").as("n_a")), Seq("part_a"))
      .join(support.select(col("pk").as("part_b"), col("n_part").as("n_b")), Seq("part_b"))
      .crossJoin(broadcast(totals))
      .withColumn("lift_ppm", expr(
        "cast(1000000 * cast(n_both as decimal(38,0)) * n_orders_total div (n_a * n_b) as bigint)"))
      .select(col("part_a"), col("part_b"), col("n_both"), col("n_a"),
        col("n_b"), col("lift_ppm"))
      .orderBy(col("part_a"), col("part_b"))
  }

  lazy val q45Sql: String =
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |okc AS (SELECT ok FROM li GROUP BY ok HAVING count(*) <= $LiftOrderCap),
       |capped AS (SELECT li.* FROM li JOIN okc USING (ok)),
       |sup AS (SELECT pk, count(*) AS n_part FROM capped GROUP BY pk),
       |tot AS (SELECT count(DISTINCT ok) AS n_orders_total FROM capped),
       |p AS (SELECT x.pk AS part_a, y.pk AS part_b, count(*) AS n_both
       |      FROM capped x JOIN capped y ON x.ok = y.ok AND x.pk < y.pk
       |      GROUP BY 1, 2 HAVING count(*) >= 2)
       |SELECT p.part_a, p.part_b, p.n_both,
       |  CAST(a.n_part AS BIGINT) AS n_a, CAST(b.n_part AS BIGINT) AS n_b,
       |  CAST(1000000 * CAST(p.n_both AS HUGEINT) * t.n_orders_total
       |       // (a.n_part * b.n_part) AS BIGINT) AS lift_ppm
       |FROM p JOIN sup a ON p.part_a = a.pk
       |JOIN sup b ON p.part_b = b.pk
       |CROSS JOIN tot t
       |ORDER BY part_a, part_b""".stripMargin

  // ---- q46: interpolated (continuous) quartiles ----
  // q24/q38 cover exact DISCRETE percentiles; this is the
  // interpolated family (SQL percentile_cont / R type-7): quartiles
  // of order value per priority class. The doubles stay bit-identical
  // across engines because every interpolation input is exact — cents
  // are integers < 2^26, the quartile fractions are dyadic
  // (0.25/0.5/0.75 = powers of two), so lo + (hi−lo)·frac is one
  // exactly-representable product and one exact sum. Spark's
  // `percentile` aggregate buffers per-group values (groups here are
  // the bounded priority vocabulary); at 100 TB the two-phase binned
  // rank (the q29/q38 machinery) is the posture for high-cardinality
  // groups.
  def q46PercentileCont(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderpriority"),
        (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        expr("percentile(cents, array(0.25D, 0.5D, 0.75D))").as("qs"))
      .select(col("o_orderpriority"), col("n_orders"),
        element_at(col("qs"), 1).as("q1"),
        element_at(col("qs"), 2).as("median"),
        element_at(col("qs"), 3).as("q3"))
      .orderBy(col("o_orderpriority"))

  lazy val q46Sql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
      |                0.25) AS q1,
      |  quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
      |                0.5) AS median,
      |  quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
      |                0.75) AS q3
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---- q47: sketch algebra — KMV union / intersection estimates ----
  // THE property that makes sketches worth shipping at 100 TB: they
  // merge. Two customer sets — A = customers with an urgent-priority
  // order, B = customers with a high-value order — are sketched
  // independently (each a k-min buffer, mergeable across partitions),
  // the union sketch is the same aggregate over the concatenated hash
  // streams (≡ merging the two sketches: k-min of a union), and
  // |A∩B| falls out by inclusion–exclusion on the three estimates.
  // Every number is the q23 integer estimator — bit-exact on both
  // engines. At cluster scale each sketch is O(k) state per grouping,
  // and set algebra over pre-built sketches never rescans the data.
  private val HighValueCents = 15000000L // $150k

  def q47SketchAlgebra(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    val k = 256
    def est(s: String) =
      expr(s"CASE WHEN $s.hk > 0 THEN ((${k - 1}) * 2147483647L) DIV $s.hk END")
    val o = t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderpriority"),
        (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
      .withColumn("h",
        ((col("o_custkey") % 2147483647L) * 2654435761L) % 2147483647L)
    val a = o.filter(col("o_orderpriority") === "1-URGENT").select(col("h"))
    val b = o.filter(col("cents") > HighValueCents).select(col("h"))
    a.agg(expr("graft_kmv256(h)").as("sa"))
      .crossJoin(b.agg(expr("graft_kmv256(h)").as("sb")))
      .crossJoin(a.union(b).agg(expr("graft_kmv256(h)").as("su")))
      .select(
        est("sa").as("est_a"), est("sb").as("est_b"), est("su").as("est_union"),
        (est("sa") + est("sb") - est("su")).as("est_intersect"))
  }

  lazy val q47Sql: String =
    s"""WITH o AS (
       |  SELECT o_custkey, o_orderpriority,
       |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
       |    ((o_custkey % 2147483647) * 2654435761) % 2147483647 AS h
       |  FROM orders),
       |ka AS (SELECT DISTINCT h FROM o WHERE o_orderpriority = '1-URGENT'
       |       ORDER BY h LIMIT 256),
       |kb AS (SELECT DISTINCT h FROM o WHERE cents > $HighValueCents
       |       ORDER BY h LIMIT 256),
       |ku AS (SELECT DISTINCT h FROM (
       |         SELECT h FROM o WHERE o_orderpriority = '1-URGENT'
       |         UNION ALL SELECT h FROM o WHERE cents > $HighValueCents)
       |       ORDER BY h LIMIT 256),
       |ea AS (SELECT (CAST(255 AS BIGINT) * 2147483647) // max(h) AS e FROM ka),
       |eb AS (SELECT (CAST(255 AS BIGINT) * 2147483647) // max(h) AS e FROM kb),
       |eu AS (SELECT (CAST(255 AS BIGINT) * 2147483647) // max(h) AS e FROM ku)
       |SELECT ea.e AS est_a, eb.e AS est_b, eu.e AS est_union,
       |  ea.e + eb.e - eu.e AS est_intersect
       |FROM ea, eb, eu""".stripMargin

  // ---- q48: frequent 3-itemsets (Apriori's inner step, done flat) ----
  // q45 scores PAIRS; this is the next lattice level — part triples
  // bought together in ≥2 orders, the candidate set an association-
  // rule miner expands. Generation stays per-order over the SAME
  // DfCache'd capped membership table (one build serves g28 + q45 +
  // q48): two ordered self-joins ON THE ORDER KEY, so the within-key
  // blowup is C(order size, 3) — a constant per row under the shared
  // cap, total work linear in |lineitem|, never |part|³. The ≥2
  // support filter prunes to the repeat signal; top-100 with a full
  // lexicographic tie-break bounds the output at any scale.
  def q48Itemset3(spark: SparkSession, dir: String): DataFrame = {
    val capped = graft.operators.graph.GraphOps.coPurchaseMembers(spark, dir)
    capped.as("x")
      .join(capped.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .join(capped.as("z"),
        col("y.ok") === col("z.ok") && col("y.pk") < col("z.pk"))
      .groupBy(col("x.pk").as("part_a"), col("y.pk").as("part_b"),
        col("z.pk").as("part_c"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 2)
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"),
        col("part_c"))
      .limit(100)
  }

  lazy val q48Sql: String = {
    val cap = graft.operators.graph.GraphOps.CoOrderCap
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |okc AS (SELECT ok FROM li GROUP BY ok HAVING count(*) <= $cap),
       |capped AS (SELECT li.* FROM li JOIN okc USING (ok))
       |SELECT x.pk AS part_a, y.pk AS part_b, z.pk AS part_c,
       |  count(*) AS n_orders
       |FROM capped x
       |JOIN capped y ON x.ok = y.ok AND x.pk < y.pk
       |JOIN capped z ON y.ok = z.ok AND y.pk < z.pk
       |GROUP BY 1, 2, 3 HAVING count(*) >= 2
       |ORDER BY n_orders DESC, part_a, part_b, part_c LIMIT 100""".stripMargin
  }

  // ---- q49: month-over-month growth (period-over-period KPI) ----
  // The reporting primitive every dashboard leads with: monthly
  // revenue with its prior-period delta in ppm. The heavy work is ONE
  // map-side-combined aggregate over orders (exact integer cents);
  // the lag window orders only the |months|-row SUMMARY — rows
  // bounded by the stream's lifetime in months, the q40/e11 posture,
  // never by order volume. Growth can be NEGATIVE, and Spark's `div`
  // truncates toward zero while DuckDB's `//` floors — so the ppm is
  // sign(Δ)·(|Δ|·1e6 div prev): division only ever sees non-negative
  // integers, where the two semantics agree bit-for-bit (the
  // cross-engine trap is designed out, not papered over).
  def q49MomGrowth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = t(spark, dir, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
      .groupBy(col("month"))
      .agg(sum(col("cents")).as("rev_cents"), count(lit(1)).as("n_orders"))
    m.withColumn("prev_cents",
        lag(col("rev_cents"), 1).over(Window.orderBy(col("month"))))
      .withColumn("growth_ppm", expr(
        """CASE WHEN prev_cents IS NOT NULL AND prev_cents > 0 THEN
          |  CAST(sign(rev_cents - prev_cents) AS BIGINT)
          |    * (abs(rev_cents - prev_cents) * 1000000 div prev_cents)
          |END""".stripMargin))
      .select(col("month"), col("n_orders"), col("rev_cents"),
        col("prev_cents"), col("growth_ppm"))
      .orderBy(col("month"))
  }

  lazy val q49Sql: String =
    """WITH m AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS rev_cents,
      |    count(*) AS n_orders
      |  FROM orders GROUP BY 1),
      |w AS (SELECT *, lag(rev_cents) OVER (ORDER BY month) AS prev_cents FROM m)
      |SELECT month, n_orders, rev_cents, prev_cents,
      |  CASE WHEN prev_cents IS NOT NULL AND prev_cents > 0 THEN
      |    CAST(sign(rev_cents - prev_cents) AS BIGINT)
      |      * (abs(rev_cents - prev_cents) * 1000000 // prev_cents)
      |  END AS growth_ppm
      |FROM w ORDER BY month""".stripMargin

  // ---- q50: self-join-size (F2) estimation — AMS count-sketch ----
  // The query-optimizer statistic behind join-size estimates: the
  // second frequency moment F2 = Σ_k c_k² IS the self-equi-join
  // cardinality of the key column. Exact F2 needs a full groupBy; the
  // AMS/count-sketch answers it in O(d·w) state: cells accumulate
  // SIGNED counts (sign = one hash bit), est_r = Σ_w cell², median
  // over d rows — unbiased with rel-σ ≈ √(2/w) (Alon–Matias–Szegedy
  // 1996; Charikar's count-sketch form). Two measured lessons landed
  // here: (1) the q31-style CMS square bound (min_r Σ (Σc)²) read 30×
  // over at w=64 — an upper bound, not an estimate — and was
  // replaced; (2) affine sign hashes collapse on SEQUENTIAL part keys
  // (four variants measured 6× under to 5× over — the q33
  // bijective-low-bits lesson again), so bucket AND sign come from
  // disjoint bits of the shared xor-shift-multiply avalanche, r
  // folded into the seed: measured 1.67M vs 1.86M exact (10%, inside
  // the √(2/64) band), row spread 1.49–2.57M. Squares in
  // DECIMAL(38,0)/HUGEINT (cell² clears BIGINT past ~3e9 — q32
  // posture); one map-side-combined grid, 5·w cells, |1| row out.
  private val AmsRows = 5 // odd → percentile_disc(0.5) is the true middle

  def q50F2Sketch(spark: SparkSession, dir: String): DataFrame = {
    val items = t(spark, dir, "lineitem")
      .select(col("l_partkey").cast("long").as("k"))
    val big = DecimalType(38, 0)
    val est = items
      .select(col("k"), explode(expr(s"sequence(0, ${AmsRows - 1})")).as("r"))
      .withColumn("x0", expr("(k + 1469598103L + r * 2654435761L) % 4294967296L"))
      .withColumn("x1", expr("(((x0 div 65536) ^ x0) * 73244475L) % 4294967296L"))
      .withColumn("x2", expr("(((x1 div 65536) ^ x1) * 73244475L) % 4294967296L"))
      .withColumn("h", expr("(x2 div 65536) ^ x2"))
      .groupBy(col("r"), expr(s"(h div 2) % $CmsWidth").as("bucket"))
      .agg(sum(expr("1 - 2 * (h % 2)")).as("c"))
      .groupBy(col("r"))
      .agg(sum(col("c").cast(big) * col("c")).cast("long").as("row_f2"))
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY row_f2)")
        .as("est_d"))
      // percentile_disc returns DOUBLE but picks an ACTUAL element —
      // the long cast is exact (row_f2 ≤ 2^53 here; see DECIMAL note)
      .select(col("est_d").cast("long").as("est_f2"))
    val exact = items.groupBy(col("k")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c").cast(big) * col("c")).cast("long").as("exact_f2"))
    exact.crossJoin(broadcast(est))
      .select(col("exact_f2"), col("est_f2"),
        expr("""CAST(sign(est_f2 - exact_f2) AS BIGINT)
               |  * (abs(est_f2 - exact_f2) * 1000000 div exact_f2)"""
          .stripMargin).as("err_ppm"))
  }

  lazy val q50Sql: String =
    s"""WITH items AS (SELECT CAST(l_partkey AS BIGINT) AS k FROM lineitem),
       |hx AS (
       |  SELECT r, xor(x2 // 65536, x2) AS h FROM (
       |    SELECT r, (xor(x1 // 65536, x1) * 73244475) % 4294967296 AS x2 FROM (
       |      SELECT r, (xor(x0 // 65536, x0) * 73244475) % 4294967296 AS x1 FROM (
       |        SELECT g.r, (k + 1469598103 + g.r * 2654435761) % 4294967296 AS x0
       |        FROM items, generate_series(0, ${AmsRows - 1}) g(r)) t0) t1) t2),
       |cells AS (
       |  SELECT r, (h // 2) % $CmsWidth AS bucket,
       |    sum(1 - 2 * (h % 2)) AS c
       |  FROM hx GROUP BY 1, 2),
       |est AS (SELECT quantile_disc(row_f2, 0.5) AS est_f2 FROM (
       |  SELECT r, CAST(sum(CAST(c AS HUGEINT) * c) AS BIGINT) AS row_f2
       |  FROM cells GROUP BY r)),
       |ex AS (SELECT CAST(sum(CAST(c AS HUGEINT) * c) AS BIGINT) AS exact_f2
       |  FROM (SELECT count(*) AS c FROM items GROUP BY k))
       |SELECT ex.exact_f2, est.est_f2,
       |  CAST(sign(est.est_f2 - ex.exact_f2) AS BIGINT)
       |    * (abs(est.est_f2 - ex.exact_f2) * 1000000 // ex.exact_f2) AS err_ppm
       |FROM ex CROSS JOIN est""".stripMargin

  /** queries-map fragment: name → builder */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_grouping_id" -> (q51GroupingId _),
    "q52_gaps_islands" -> (q52GapsIslands _),
    "q53_cumulative_distinct" -> (q53CumulativeDistinct _),
    "q54_winsorized" -> (q54Winsorized _),
    "q55_abc_xyz" -> (q55AbcXyz _),
    "q56_weighted_median" -> (q56WeightedMedian _),
    "q57_reorder_gaps" -> (q57ReorderGaps _),
    "q58_multi_distinct" -> (q58MultiDistinct _),
    "q59_part_drawdown" -> (q59PartDrawdown _),
    "q60_hhi" -> (q60Hhi _),
    "q61_regression" -> (q61Regression _),
    "q62_chi2" -> (q62Chi2 _),
    "q63_benford" -> (q63Benford _),
    "q64_dup_invoices" -> (q64DupInvoices _),
    "q65_catalog_growth" -> (q65CatalogGrowth _),
    "q66_cohort_ltv" -> (q66CohortLtv _),
    "q67_share_of_parent" -> (q67ShareOfParent _),
    "q68_top_movers" -> (q68TopMovers _),
    "q69_count_distribution" -> (q69CountDistribution _),
    "q70_global_share" -> (q70GlobalShareFilter _),
    "q71_sole_blame" -> (q71SoleBlame _),
    "q72_prospects" -> (q72Prospects _),
    "q73_min_cost_supplier" -> (q73MinCostSupplier _),
    "q74_profit" -> (q74ProfitByNationYear _),
    "q75_volume_shipping" -> (q75VolumeShipping _),
    "q76_market_share" -> (q76MarketShare _),
    "q77_top_share_suppliers" -> (q77TopShareSuppliers _),
    "q78_returned_items" -> (q78ReturnedItems _),
    "q79_supplier_variety" -> (q79SupplierVariety _),
    "q50_f2_sketch" -> (q50F2Sketch _),
    "q49_mom_growth" -> (q49MomGrowth _),
    "q48_itemset3" -> (q48Itemset3 _),
    "q47_sketch_algebra" -> (q47SketchAlgebra _),
    "q46_percentile_cont" -> (q46PercentileCont _),
    "q45_basket_lift" -> (q45BasketLift _),
    "q44_pit_features" -> (q44PitFeatures _),
    "q43_rank_functions" -> (q43RankFunctions _),
    "q42_skyline" -> (q42Skyline _),
    "q41_band_join" -> (q41BandJoin _),
    "q40_pareto" -> (q40Pareto _),
    "q39_mode" -> (q39Mode _),
    "q38_mad" -> (q38Mad _),
    "q37_bloom_filter" -> (q37BloomFilter _),
    "q36_range_frames" -> (q36RangeFrames _),
    "q35_unpivot" -> (q35Unpivot _),
    "q34_top_per_group" -> (q34TopPerGroup _),
    "q33_hll" -> (q33Hll _),
    "q32_corr" -> (q32Corr _),
    "q31_countmin" -> (q31CountMin _),
    "q30_histogram" -> (q30Histogram _),
    "q27_lead_lag" -> (q27LeadLag _),
    "q28_moving_frames" -> (q28MovingFrames _),
    "q29_ntile" -> (q29Ntile _),
    "q23_kmv_sketch" -> (q23KmvSketch _),
    "q24_percentile" -> (q24Percentile _),
    "q1_agg" -> (q1Agg _),
    "q2_filter_project" -> (q2FilterProject _),
    "q3_join_agg" -> (q3JoinAgg _),
    "q4_semijoin" -> (q4Semijoin _),
    "q5_multijoin" -> (q5Multijoin _),
    "q6_scan_filter" -> (q6ScanFilter _),
    "q7_window" -> (q7Window _),
    "q8_distinct" -> (q8Distinct _),
    "q9_sort_limit" -> (q9SortLimit _),
    "q10_antijoin" -> (q10Antijoin _),
    "q11_having" -> (q11Having _),
    "q12_case_agg" -> (q12CaseAgg _),
    "q13_outerjoin" -> (q13Outerjoin _),
    "q14_expr" -> (q14Expr _),
    "q15_maxagg" -> (q15MaxAgg _),
    "q16_setop" -> (q16Setop _),
    "q17_scalar_subquery" -> (q17ScalarSubquery _),
    "q18_in_subquery" -> (q18InSubquery _),
    "q19_complex_pred" -> (q19ComplexPred _),
    "q20_rollup" -> (q20Rollup _),
    "q21_cube" -> (q21Cube _),
    "q22_string_ops" -> (q22StringOps _),
    "q25_grouping_sets" -> (q25GroupingSets _),
    "q26_pivot" -> (q26Pivot _))

  /** oracle-map fragment: name → DuckDB SQL */
  val oracles: Map[String, String] = Map(
    "q51_grouping_id" -> q51Sql,
    "q52_gaps_islands" -> q52Sql,
    "q53_cumulative_distinct" -> q53Sql,
    "q54_winsorized" -> q54Sql,
    "q55_abc_xyz" -> q55Sql,
    "q56_weighted_median" -> q56Sql,
    "q57_reorder_gaps" -> q57Sql,
    "q58_multi_distinct" -> q58Sql,
    "q59_part_drawdown" -> q59Sql,
    "q60_hhi" -> q60Sql,
    "q61_regression" -> q61Sql,
    "q62_chi2" -> q62Sql,
    "q63_benford" -> q63Sql,
    "q64_dup_invoices" -> q64Sql,
    "q65_catalog_growth" -> q65Sql,
    "q66_cohort_ltv" -> q66Sql,
    "q67_share_of_parent" -> q67Sql,
    "q68_top_movers" -> q68Sql,
    "q69_count_distribution" -> q69Sql,
    "q70_global_share" -> q70Sql,
    "q71_sole_blame" -> q71Sql,
    "q72_prospects" -> q72Sql,
    "q73_min_cost_supplier" -> q73Sql,
    "q74_profit" -> q74Sql,
    "q75_volume_shipping" -> q75Sql,
    "q76_market_share" -> q76Sql,
    "q77_top_share_suppliers" -> q77Sql,
    "q78_returned_items" -> q78Sql,
    "q79_supplier_variety" -> q79Sql,
    "q50_f2_sketch" -> q50Sql,
    "q49_mom_growth" -> q49Sql,
    "q48_itemset3" -> q48Sql,
    "q47_sketch_algebra" -> q47Sql,
    "q46_percentile_cont" -> q46Sql,
    "q45_basket_lift" -> q45Sql,
    "q44_pit_features" -> q44Sql,
    "q43_rank_functions" -> q43Sql,
    "q42_skyline" -> q42Sql,
    "q41_band_join" -> q41Sql,
    "q40_pareto" -> q40Sql,
    "q39_mode" -> q39Sql,
    "q38_mad" -> q38Sql,
    "q37_bloom_filter" -> q37Sql,
    "q36_range_frames" -> q36Sql,
    "q35_unpivot" -> q35Sql,
    "q34_top_per_group" -> q34Sql,
    "q33_hll" -> q33Sql,
    "q32_corr" -> q32Sql,
    "q31_countmin" -> q31Sql,
    "q30_histogram" -> q30Sql,
    "q27_lead_lag" -> q27Sql,
    "q28_moving_frames" -> q28Sql,
    "q29_ntile" -> q29Sql,
    "q23_kmv_sketch" -> q23Sql,
    "q24_percentile" -> q24Sql,
    "q1_agg" -> q1Sql,
    "q2_filter_project" -> q2Sql,
    "q3_join_agg" -> q3Sql,
    "q4_semijoin" -> q4Sql,
    "q5_multijoin" -> q5Sql,
    "q6_scan_filter" -> q6Sql,
    "q7_window" -> q7Sql,
    "q8_distinct" -> q8Sql,
    "q9_sort_limit" -> q9Sql,
    "q10_antijoin" -> q10Sql,
    "q11_having" -> q11Sql,
    "q12_case_agg" -> q12Sql,
    "q13_outerjoin" -> q13Sql,
    "q14_expr" -> q14Sql,
    "q15_maxagg" -> q15Sql,
    "q16_setop" -> q16Sql,
    "q17_scalar_subquery" -> q17Sql,
    "q18_in_subquery" -> q18Sql,
    "q19_complex_pred" -> q19Sql,
    "q20_rollup" -> q20Sql,
    "q21_cube" -> q21Sql,
    "q22_string_ops" -> q22Sql,
    "q25_grouping_sets" -> q25Sql,
    "q26_pivot" -> q26Sql)
}
