package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** The UDx surface (SURVEY §2.10): typed `Aggregator`s registered via
  * `functions.udaf`, usable from both the Dataset API and `spark.sql`.
  * These mirror the reference's hand-rolled AggregateFunctions — kept
  * deliberately: they are the extension template even though builtins
  * (`avg`, `count(DISTINCT)`) cover the same queries.
  */
object Udx {

  /** Incremental average with exact decimal summation — the reference's
    * MyAvgAgg (hotItems/HotItems.scala:116-128: (sum, count)
    * accumulator). The buffer sum is a DECIMAL-like BigDecimal at scale
    * 10 so merge order never changes the result (oracle-reproducible:
    * CAST(sum(CAST(v AS DECIMAL(28,10))) AS DOUBLE) / count(*)). */
  object DecimalAvgAgg extends Aggregator[Double, (BigDecimal, Long), Double] {
    private def dec(v: Double): BigDecimal =
      BigDecimal(v).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    def zero: (BigDecimal, Long) = (BigDecimal(0).setScale(10), 0L)
    def reduce(b: (BigDecimal, Long), v: Double): (BigDecimal, Long) =
      (b._1 + dec(v), b._2 + 1)
    def merge(a: (BigDecimal, Long), b: (BigDecimal, Long)): (BigDecimal, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (BigDecimal, Long)): Double =
      if (b._2 == 0) Double.NaN else b._1.toDouble / b._2
    def bufferEncoder: Encoder[(BigDecimal, Long)] =
      Encoders.kryo[(BigDecimal, Long)] // buffer is opaque; exactness > codegen here
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Exact distinct count with a Set buffer — the reference's
    * UvCountAgg (networkflow/analysis/UniqueVisitor_02_Set.scala:53-62:
    * Set accumulator, merge = union). Memory is O(distinct) per group —
    * the same trade the reference documents; use
    * approx_count_distinct when that's unacceptable (its bloom/HLL
    * successor, UniqueVisitor_03). */
  object ExactDistinctAgg extends Aggregator[Long, Set[Long], Long] {
    def zero: Set[Long] = Set.empty
    def reduce(b: Set[Long], v: Long): Set[Long] = b + v
    def merge(a: Set[Long], b: Set[Long]): Set[Long] = a ++ b
    def finish(b: Set[Long]): Long = b.size.toLong
    def bufferEncoder: Encoder[Set[Long]] = Encoders.kryo[Set[Long]]
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column forms for the DataFrame API. */
  def decimalAvg(c: Column): Column = udaf(DecimalAvgAgg).apply(c)
  def exactDistinct(c: Column): Column = udaf(ExactDistinctAgg).apply(c)

  /** Register both under SQL names (usable in spark.sql text). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("decimal_avg", udaf(DecimalAvgAgg))
    spark.udf.register("exact_distinct", udaf(ExactDistinctAgg))
  }
}
