package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Tuned for the driver's local[32] single-JVM harness, but every knob
  * here is the one you'd also set on a 1000-executor cluster:
  *   - AQE on (runtime re-plan: skew joins, coalesced shuffle partitions)
  *   - UTC session time zone (oracle parity + cluster determinism)
  *   - shuffle partitions sized to the parallelism actually available,
  *     never the 200 default (on a real cluster: 2-3x total cores, and
  *     AQE coalesces down from there).
  */
object GraftSession {
  def apply(appName: String = "graft",
            master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
            shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      // native engine extensions (custom codegen expressions, SQL names)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // bitmapJaccard joins up to 2·256 flat long columns per pair row;
      // keep whole-stage codegen alive above the 100-field default
      // (TextOps.bitmapJaccard scaladoc — ADVICE r3)
      .config("spark.sql.codegen.maxFields", "1024")
      // driver testdata events.ts is TIMESTAMP(NANOS) — read as Long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
