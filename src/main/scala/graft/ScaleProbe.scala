package graft

import org.apache.spark.sql.functions._

/** Prefilter-geometry probe at a given scale dir (VERDICT r13 #2) —
  * dev tooling, never run by the driver. Prints the contamination
  * prefilter's data-sized Bloom geometry for the registered split
  * (benchmark = doc_id % 10 == 7): distinct benchmark gram count, the
  * derived (k, mBits) from `GraftBloom.geometryFor`, the broadcast
  * payload in bytes (k·mBits/8 — what every executor receives), and
  * the flagged-candidate counts, so PLANS.md can pin m sizing and
  * broadcast bytes at the 100× corpus decade (~300k grams) alongside
  * the timing table.
  *
  * Usage: sbt "runMain graft.ScaleProbe [sfDir]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession("graft-scale-probe")
    import graft.operators.TextOps
    val docs = graft.sources.Tables.documents(spark, d)
    val bench = docs.filter(col("doc_id") % 10 === 7)
    val nGrams = TextOps.benchmarkGramCount(bench, 5)
    val (k, mBits) = graft.plans.GraftBloom.geometryFor(nGrams)
    val out = TextOps.contaminationBloom(spark, d)
    // coalesce: with ZERO candidate rows the sums are null and getLong
    // would NPE — an empty prefilter result should print zeros (ADVICE r14)
    val agg = out.agg(count(lit(1)),
      coalesce(sum("n_flagged"), lit(0L)),
      coalesce(sum("n_exact"), lit(0L)),
      coalesce(sum(when(col("n_exact") > 0, 1L).otherwise(0L)), lit(0L)))
      .collect()(0)
    val arriving = docs.filter(col("doc_id") % 10 =!= 7).count()
    println(s"""{"probe":"bloom_geometry","sf":"$d",""" +
      s""""bench_grams":$nGrams,"k":$k,"m_bits":$mBits,""" +
      s""""broadcast_bytes":${k.toLong * mBits / 8},""" +
      s""""arriving_docs":$arriving,"candidates":${agg.getLong(0)},""" +
      s""""flagged_grams":${agg.getLong(1)},"exact_grams":${agg.getLong(2)},""" +
      s""""truly_contaminated":${agg.getLong(3)}}""")
    spark.stop()
  }
}
