package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dataset-profiling operators — the "look before you shuffle"
  * diagnostics a 100 TB pipeline runs before committing to a plan:
  *
  *  - [[profileTable]]: per-column null/distinct census of a table —
  *    the schema-quality report run on every new ingest drop.
  *  - [[keySkewReport]]: the per-key count distribution of a join /
  *    groupBy key — the measurement that decides broadcast vs
  *    shuffle vs salting (SURVEY §2.5's two-phase salted agg exists
  *    precisely for the skew this op quantifies).
  *
  * Both emit pure int64 columns (exact associative counts, integer
  * percentile selection, ppm share via integer division), so the
  * DuckDB oracle hash-matches bit-for-bit.
  */
object Profiling {

  /** Per-column profile of the events table: for every column, the
    * null count, non-null count, and exact distinct count — one row
    * per column.
    *
    * Plan: ONE scan, one Aggregate carrying all 6 count-distinct
    * aggregates (Catalyst plans multi-distinct via Expand — the rows
    * are replicated per distinct column map-side, then partially
    * aggregated before the single exchange), then a 1-row → 6-row
    * `stack` projection. No joins, no window.
    *
    * Scale note: EXACT distinct per column is the oracle-checkable
    * contract here; at 10¹¹ rows you would swap `count(distinct c)`
    * for `approx_count_distinct(c)` (HLL++, one pass, no Expand) —
    * the same switch the UV family already demonstrates
    * (unique_visitors vs unique_visitors_approx). The null/non-null
    * census is map-side-combined either way.
    *
    * `ts` is profiled at microsecond precision (the [[Tables.events]]
    * ns→µs contract; the oracle profiles `epoch_us(ts)` so both
    * engines census the same value). */
  def profileTable(spark: SparkSession, d: String): DataFrame =
    profileFrom(Tables.events(spark, d))

  /** Source-agnostic census body — also the plan function of the
    * streaming face (`StreamingJobs.snapshotUpdate(stream,
    * Profiling.profileFrom)`: a continuously-updated data-quality
    * census over an ingest feed, exact at every snapshot — the
    * StreamingProfileSpec parity test pins convergence to the batch
    * answer). */
  def profileFrom(ev: DataFrame): DataFrame = {
    val cols = ev.columns.toSeq
    def aggsFor(c: String): Seq[Column] = Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c"))
    val one = ev.agg(count(lit(1)).as("n_rows"),
      cols.flatMap(aggsFor): _*)
    val stackArgs = cols.map(c =>
      s"'$c', n_rows - nn_$c, nn_$c, nd_$c").mkString(", ")
    one.select(expr(
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_nonnull, n_distinct)"))
      .orderBy("col_name")
  }

  def profileTableSql(): String = {
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val selects = cols.map { c =>
      val v = if (c == "ts") "epoch_us(ts)" else c
      s"""SELECT '$c' AS col_name,
         |       count(*) - count($v) AS n_null,
         |       count($v) AS n_nonnull,
         |       count(DISTINCT $v) AS n_distinct
         |FROM events""".stripMargin
    }
    selects.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Distribution of per-key row counts for a grouping/join key — one
    * summary row: key cardinality, row total, min/median/p90/p99/max
    * per-key count (exact nearest-rank percentiles), and the heaviest
    * key's parts-per-million share of all rows. A top1_ppm near 10⁶/n
    * says "uniform — shuffle freely"; a large one says "salt this key
    * or broadcast the other side".
    *
    * Exact percentiles without a corpus-scale sort: per-key counts
    * (one map-side-combined shuffle) collapse to the COUNT-OF-COUNTS
    * relation — at most one row per distinct frequency value, the
    * same ≪-corpus bound as vocab_growth's bucket axis — then a
    * cumulative window over that tiny relation selects the smallest
    * count c with `cum_keys · m ≥ n_keys · q` (integer cross-multiply,
    * no float quantile, no rounding ambiguity). The single-partition
    * window is over the bounded count-of-counts axis, never the data.
    *
    * Everything int64: counts are associative sums; percentile picks
    * are min-over-filter; top1_ppm = (max_cnt · 10⁶) div n_rows. */
  def keySkewReport(spark: SparkSession, d: String,
                    key: String = "user_id"): DataFrame =
    keySkewFrom(Tables.events(spark, d), key)

  /** Source-agnostic body — also the plan function of the streaming
    * face (`StreamingJobs.snapshotUpdate(stream, keySkewFrom(_))`: a
    * continuously-updated skew monitor over an ingest feed; see
    * StreamingProfileSpec's parity test). */
  def keySkewFrom(ev: DataFrame, key: String = "user_id"): DataFrame = {
    val counts = ev.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(
      count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
      min(col("cnt")).as("min_cnt"), max(col("cnt")).as("max_cnt"))
    val cc = counts.groupBy("cnt").agg(count(lit(1)).as("nk"))
    val w = Window.orderBy("cnt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cc.select(col("cnt"), sum(col("nk")).over(w).as("cum_keys"))
    val picks = cum.crossJoin(broadcast(tot)).agg(
      min(when(col("cum_keys") * 2 >= col("n_keys"), col("cnt"))).as("p50_cnt"),
      min(when(col("cum_keys") * 10 >= col("n_keys") * 9, col("cnt"))).as("p90_cnt"),
      min(when(col("cum_keys") * 100 >= col("n_keys") * 99, col("cnt"))).as("p99_cnt"))
    broadcast(tot).crossJoin(picks)
      .select(col("n_keys"), col("n_rows"), col("min_cnt"),
        col("p50_cnt"), col("p90_cnt"), col("p99_cnt"), col("max_cnt"),
        expr("(max_cnt * 1000000) div n_rows").as("top1_ppm"))
  }

  def keySkewReportSql(key: String = "user_id"): String =
    s"""WITH counts AS (
       |  SELECT $key, count(*) AS cnt FROM events GROUP BY 1
       |), tot AS (
       |  SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows,
       |         min(cnt) AS min_cnt, max(cnt) AS max_cnt
       |  FROM counts
       |), cc AS (
       |  SELECT cnt, count(*) AS nk FROM counts GROUP BY 1
       |), cum AS (
       |  SELECT cnt, CAST(sum(nk) OVER (ORDER BY cnt ROWS BETWEEN
       |           UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_keys
       |  FROM cc
       |), picks AS (
       |  SELECT min(CASE WHEN cum_keys * 2 >= n_keys THEN cnt END) AS p50_cnt,
       |         min(CASE WHEN cum_keys * 10 >= n_keys * 9 THEN cnt END) AS p90_cnt,
       |         min(CASE WHEN cum_keys * 100 >= n_keys * 99 THEN cnt END) AS p99_cnt
       |  FROM cum CROSS JOIN tot
       |)
       |SELECT n_keys, n_rows, min_cnt, p50_cnt, p90_cnt, p99_cnt, max_cnt,
       |       (max_cnt * 1000000) // n_rows AS top1_ppm
       |FROM tot CROSS JOIN picks""".stripMargin
}
