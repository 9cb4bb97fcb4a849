package graft

import org.apache.spark.sql.functions._

/** Micro-bench for the portable hash pair (dev tooling, VERDICT r11
  * #5): times lo+hi over the sf0.1 prefilter gram relation with the
  * SAME tag (the universal call shape — the thread-local pair memo
  * makes hi reuse lo's digest) vs DIFFERENT tags (every call a fresh
  * digest — the r11 cost of the pair). Prints one line; the ratio is
  * the hash-stage speedup contamination_bloom_sql and every
  * hash64Pair consumer inherit.
  *
  * Usage: sbt "runMain graft.HashBench [sfDir]"
  */
object HashBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession("graft-hash-bench")
    import graft.operators.TextOps
    // ×32 replication so the digest dominates the scan/agg overhead
    // (each replica gets a distinct suffix — no memo crosstalk between
    // rows, which would understate the unpaired cost)
    val g = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr(TextOps.toksExpr).as("toks"))
      .filter(size(col("toks")) >= 5)
      .select(explode(array_distinct(expr(TextOps.shinglesExpr(5)))).as("g0"))
      .select(explode(expr("transform(sequence(0, 31), i -> concat(g0, ' ', i))")).as("gram"))
      .repartition(32)
      .localCheckpoint(true)
    val n = g.count()
    def time(tagHi: String): Double = {
      val t0 = System.nanoTime()
      g.select(expr("graft_hash_lo('bl', gram)").as("lo"),
          expr(s"graft_hash_hi('$tagHi', gram)").as("hi"))
        .agg(sum(col("lo") % 1000000L), sum(col("hi") % 1000000L)).collect()
      (System.nanoTime() - t0) / 1e9
    }
    time("bl"); time("b2") // warm both shapes
    val paired = (1 to 5).map(_ => time("bl")).min
    val unpaired = (1 to 5).map(_ => time("b2")).min
    println(f"[hashbench] grams=$n paired=$paired%.3f s unpaired=$unpaired%.3f s ratio=${unpaired / paired}%.2f")
    spark.stop()
  }
}
