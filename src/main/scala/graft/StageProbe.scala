package graft

import org.apache.spark.sql.functions._

/** Stage decomposition of the bench's top-3 (VERDICT r14 next #6) —
  * dev tooling, never run by the driver. contamination_bloom_sql /
  * contamination_bloom / cross_dedup_persisted top the r14 sf0.1 bench
  * (4.10 / 3.94 / 3.71 s); all three are linear-class and gate-green,
  * but no round has named which stage owns the constant. This probe
  * times cumulative prefixes of each pipeline so PLANS.md can pin
  * tokenize vs probe vs sign vs serve, and a shave (or a written
  * "irreducible because …") can target the real stage.
  *
  * Prefix timing, not instrumentation: each step materializes a strict
  * prefix of the real plan (same expressions, same order), so
  * step_i − step_{i−1} ≈ the added stage's cost under identical scan/
  * codegen conditions. Each step runs `reps` times, min taken (warm
  * JIT/page-cache posture — the bench is warm too).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.StageProbe"
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val reps = sys.env.get("SPARK_GRAFT_PROBE_REPS").map(_.toInt).getOrElse(3)
    val spark = GraftSession("graft-stage-probe")
    import graft.operators.TextOps

    def best(run: () => Unit): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }.min

    // ---- contamination_bloom: scan → tokenize+shingle → hash →
    //      bench sizing → bloom build+probe → per-doc agg ----
    locally {
      val docs = graft.sources.Tables.documents(spark, d)
      val scanSec = best(() => docs.select(col("doc_id"), col("text"))
        .agg(count(lit(1)), sum(length(col("text")))).collect())
      val grams = docs.withColumn("toks", expr(TextOps.toksExpr))
        .filter(size(col("toks")) >= 5)
        .select(col("doc_id"),
          explode(array_distinct(expr(TextOps.shinglesExpr(5)))).as("gram"))
      val gramSec = best(() =>
        grams.agg(count(lit(1))).collect())
      val (lo, hi) = graft.functions.ColumnFunctions.hash64Pair(
        col("gram"), TextOps.BloomTag)
      val hashed = grams.select(col("doc_id"), col("gram"),
        lo.as("lo"), hi.as("hi"))
      val hashSec = best(() =>
        hashed.agg(count(lit(1)), max(col("lo")), min(col("hi"))).collect())
      val sizeSec = best(() =>
        hashed.filter(col("doc_id") % 10 === 7)
          .select("gram").distinct().count())
      // bloom build + probe, no exact join / no groupBy: how much of
      // the tail is the filter itself vs the gram-string exact join
      val bench = hashed.filter(col("doc_id") % 10 === 7)
      val (kk, mm) = graft.plans.GraftBloom.geometryFor(
        bench.select("gram").distinct().count())
      val bloom = bench.agg(graft.plans.GraftFunctions.bloomState(
        col("lo"), col("hi"), kk, mm).as("bf"))
      val probeSec = best(() =>
        hashed.filter(col("doc_id") % 10 =!= 7)
          .crossJoin(broadcast(bloom))
          .withColumn("flagged", graft.plans.GraftFunctions.bloomContains(
            col("bf"), col("lo"), col("hi")))
          .agg(count(lit(1)), sum(col("flagged").cast("long"))).collect())
      val benchGrams = bench.select("gram").distinct()
        .withColumn("is_exact", lit(1L))
      val joinSec = best(() =>
        hashed.filter(col("doc_id") % 10 =!= 7)
          .crossJoin(broadcast(bloom))
          .withColumn("flagged", graft.plans.GraftFunctions.bloomContains(
            col("bf"), col("lo"), col("hi")))
          .join(broadcast(benchGrams), Seq("gram"), "left")
          .agg(count(lit(1)), sum(col("flagged").cast("long")),
            sum(coalesce(col("is_exact"), lit(0L)))).collect())
      val fullSec = best(() =>
        TextOps.contaminationBloom(spark, d).collect())
      println(s"""{"probe":"contamination_bloom","sf":"$d",""" +
        f""""scan_sec":$scanSec%.2f,"tokenize_shingle_sec":$gramSec%.2f,""" +
        f""""hash_sec":$hashSec%.2f,"bench_sizing_sec":$sizeSec%.2f,""" +
        f""""build_probe_sec":$probeSec%.2f,"probe_exact_join_sec":$joinSec%.2f,""" +
        f""""full_sec":$fullSec%.2f}""")
    }

    // ---- contamination_bloom_sql: the spark.sql text twin — same
    //      logical plan modulo parsing; the delta vs the DSL form is
    //      the SQL-surface overhead ----
    locally {
      val sqlSec = best(() =>
        graft.operators.SqlSurface.contaminationBloomSqlText(spark, d).collect())
      println(s"""{"probe":"contamination_bloom_sql","sf":"$d",""" +
        f""""full_sec":$sqlSec%.2f}""")
    }

    // ---- cross_dedup_persisted: corpus sign (sha+minhash+shingles) →
    //      store save → load+serve (batch sign + band join + verify) ----
    locally {
      val path = graft.sources.IndexStore.artifactPath(
        "dedupprobe", s"$d|src5")
      val signSec = best(() => {
        val (sha, bands, sets) = TextOps.dedupSignatureFrames(
          spark, d, col("source") =!= "src5")
        // materialize all three signature relations without writing
        sha.agg(count(lit(1))).collect()
        bands.agg(count(lit(1))).collect()
        sets.agg(count(lit(1))).collect()
      })
      val saveSec = best(() => {
        val (sha, bands, sets) = TextOps.dedupSignatureFrames(
          spark, d, col("source") =!= "src5")
        graft.sources.IndexStore.saveDedupSignatures(spark, sha, bands, sets, path)
      })
      val serveSec = best(() =>
        TextOps.crossDedupAgainstStore(spark, d, path, "src5").collect())
      val fullSec = best(() =>
        TextOps.crossDedupPersisted(spark, d, "src5").collect())
      println(s"""{"probe":"cross_dedup_persisted","sf":"$d",""" +
        f""""corpus_sign_sec":$signSec%.2f,"sign_and_save_sec":$saveSec%.2f,""" +
        f""""load_serve_sec":$serveSec%.2f,"full_sec":$fullSec%.2f}""")
    }

    spark.stop()
  }
}
