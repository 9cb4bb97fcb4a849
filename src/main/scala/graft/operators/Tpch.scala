package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Batch analytics over the star schema — the "SQL surface" of the
  * engine (reference expresses its flagship in Blink SQL, see
  * /root/reference src/main/scala/com/hong/hotItems/HotItems_3_SQL.scala:45-61;
  * we get the whole relational surface from Catalyst).
  *
  * Oracle-parity conventions (driver hashes values after sorting columns
  * by name):
  *   - money sums: per-row expression is computed in double (bit-exact in
  *     both engines), cast to decimal BEFORE summing (exact, order-free
  *     summation), final result cast back to double. The ORACLE side
  *     routes decimal→double through VARCHAR: DuckDB's direct
  *     DECIMAL→DOUBLE cast is not correctly rounded (can be 1 ulp off),
  *     while string→double parsing is — matching Spark's
  *     BigDecimal.doubleValue exactly.
  *   - averages: exact decimal sum cast to double, divided by count —
  *     one double division, identical in both engines.
  *   - timestamps in outputs: cast to epoch-second BIGINT.
  *
  * Scale notes: groupBy aggregations are partial/final HashAggregate
  * (map-side combine), so the shuffle carries only per-group partials.
  * Dimension tables (region/nation/customer/supplier/part) are
  * broadcast — no shuffle of the fact table for those joins.
  */
object Tpch {

  /** TPC-H Q1-style pricing summary over lineitem. */
  def q1PricingSummary(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(28,10)"))
          .cast("double").as("sum_disc_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
          .cast("decimal(28,10)")).cast("double").as("sum_charge"),
        (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style: top-10 unshipped-revenue orders for one segment.
    * customer scales with the fact tables (~150k rows x SF), so no
    * broadcast hint: AQE picks broadcast when it actually fits and
    * shuffle-join on custkey otherwise (co-partitioned with the
    * orders side). orders⋈lineitem shuffles on the order key — the
    * natural co-partitioning at scale. */
  def q3TopOrders(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(spark, d).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(spark, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li   = Tables.lineitem(spark, d).filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(28,10)"))
        .cast("double").as("revenue"))
      .select(col("l_orderkey"),
        graft.functions.ColumnFunctions.epochSeconds(col("o_orderdate")).as("orderdate_epoch"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS orderdate_epoch,
      |  o_orderpriority,
      |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-style: revenue by nation within one region and date range.
    * Only nation/region (25 / 5 rows — genuinely fixed-size) are
    * broadcast; customer scales with SF and is shuffle-joined on
    * custkey (AQE may still broadcast it at small SF). Only
    * orders⋈lineitem and orders⋈customer shuffle. */
  def q5LocalSupplierVolume(spark: SparkSession, d: String): DataFrame = {
    val region = Tables.region(spark, d).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, d)
    val cust   = Tables.customer(spark, d)
    val ord = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, d)
    val dims = cust
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(dims, col("o_custkey") === col("c_custkey"))
      .groupBy(col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(28,10)"))
        .cast("double").as("revenue"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name""".stripMargin
}
