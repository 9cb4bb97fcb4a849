package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DataPipeline

/** Training-data curation semantics: each quality rule fires on a
  * crafted doc, sampling is deterministic and proportional, packing
  * invariants hold per shard. */
class DataPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftdocs").toString
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("quality filter: every rule fires on its crafted document") {
    val good = "the quick brown fox jumps over a lazy dog again today"
    val dir = docsDir(Seq(
      0L -> good,                                      // keep
      1L -> "just four small words",                   // too_short (4 < 5)
      2L -> "a b c d e f g h i j",                     // avg_tok_len_low (1.0)
      3L -> ("the " + "pneumonoultramicroscopics " * 9), // avg_tok_len_high
      4L -> "the #### $$$$ %%%% ^^^^ &&&& !!!! ****",  // symbol_heavy
      5L -> "quick brown fox jumps over lazy dog every day"))  // no_stopwords
    val got = DataPipeline.qualityFilter(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(0L -> "keep", 1L -> "too_short", 2L -> "avg_tok_len_low",
      3L -> "avg_tok_len_high", 4L -> "symbol_heavy", 5L -> "no_stopwords"))
  }

  test("stratified sample: deterministic, proportional, edge fractions exact") {
    val all = graft.sources.Tables.documents(spark, sf)
    val byLang = all.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // fraction 0 removes the stratum entirely; 1.0 (default) passes through
    val s0 = DataPipeline.stratifiedSample(spark, sf, Map("en" -> 0.0))
    val s0Langs = s0.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!s0Langs.contains("en"))
    assert(byLang.filter(_._1 != "en") == s0Langs)
    // half-sampling lands near half (hash uniformity), deterministically
    val h1 = DataPipeline.stratifiedSample(spark, sf, Map("en" -> 0.5), seed = 7)
      .filter(col("lang") === "en").count()
    val h2 = DataPipeline.stratifiedSample(spark, sf, Map("en" -> 0.5), seed = 7)
      .filter(col("lang") === "en").count()
    assert(h1 == h2)
    val en = byLang("en").toDouble
    assert(h1 > en * 0.35 && h1 < en * 0.65, s"sampled $h1 of $en")
    // different seed, different sample (same size ballpark)
    val h3 = DataPipeline.stratifiedSample(spark, sf, Map("en" -> 0.5), seed = 8)
      .filter(col("lang") === "en").count()
    assert(h3 > en * 0.35 && h3 < en * 0.65)
  }

  test("packing: per-shard running offsets, budget bounds, chunk monotonicity") {
    val budget = 64L
    val packed = DataPipeline.packDocuments(spark, sf, budget = budget, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(packed.nonEmpty)
    packed.groupBy(_._2).foreach { case (_, docs) =>
      val ordered = docs.sortBy(_._1)
      var before = 0L
      ordered.foreach { case (_, _, nTok, packId, offset) =>
        assert(packId == before / budget)     // chunk of the first token
        assert(offset == before % budget)     // position inside the chunk
        assert(offset >= 0 && offset < budget)
        before += nTok
      }
    }
    // every doc packed exactly once
    assert(packed.map(_._1).distinct.length == packed.length)
  }

  test("curationPipeline: each decision path fires on its crafted document") {
    val base = "the quick brown fox " + (1 to 30).map(i => s"tok$i").mkString(" ")
    val near = base.replace("tok7", "zz") // near-dup of base, shorter
    val dir = docsDir(Seq(
      0L -> base,   // kept: passes quality, exact keeper, cluster rep
      1L -> base,   // exact_dup: same content, higher doc_id
      2L -> near,   // near_dup: survives quality+exact, loses rep choice
      3L -> "tiny") // too_short: quality gate fires first
    )
    val got = DataPipeline.curationPipeline(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("decision"), r.getAs[Long]("kept"))).toMap
    assert(got == Map(
      0L -> ("kept", 1L),
      1L -> ("exact_dup", 0L),
      2L -> ("near_dup", 0L),
      3L -> ("too_short", 0L)))
  }

  test("curationReport: rollup partitions the corpus, token sums exact") {
    val base = "the quick brown fox " + (1 to 30).map(i => s"tok$i").mkString(" ")
    val near = base.replace("tok7", "zz")
    val dir = docsDir(Seq(0L -> base, 1L -> base, 2L -> near, 3L -> "tiny"))
    val got = DataPipeline.curationReport(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // one decision each (crafted in the pipeline test above); base/near
    // are 34 whitespace tokens, 'tiny' is 1
    assert(got == Map(
      "kept" -> ((1L, 34L)), "exact_dup" -> ((1L, 34L)),
      "near_dup" -> ((1L, 34L)), "too_short" -> ((1L, 1L))))
  }

  test("dataset split: stable under corpus growth, fractions in range") {
    import spark.implicits._
    val full = DataPipeline.datasetSplit(spark, sf, 0.05, 0.05).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val n = full.size.toDouble
    val shares = full.values.groupBy(identity).view.mapValues(_.size / n).toMap
    // 3σ binomial bands around the 5%/5%/90% targets
    assert(math.abs(shares.getOrElse("val", 0.0) - 0.05) < 0.03, shares)
    assert(math.abs(shares.getOrElse("test", 0.0) - 0.05) < 0.03, shares)
    assert(shares("train") > 0.85)
    // stability: recomputing over HALF the corpus leaves every common
    // document's assignment unchanged (the hash-cut property a
    // row_number cut does not have)
    val dir = java.nio.file.Files.createTempDirectory("graftsplit").toString
    graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val half = DataPipeline.datasetSplit(spark, dir, 0.05, 0.05).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(half.forall { case (id, s) => full(id) == s })
  }

  test("splitLeakage: planted cross-split copy flags 1.0, unique eval doc 0.0") {
    // learn the deterministic assignment first, then plant the leak:
    // one eval doc becomes a byte-copy of a train doc (leak_frac 1.0),
    // every other doc keeps its id-unique tokens (leak_frac 0.0)
    val base = (0L until 200L).map(i =>
      (i, s"a$i b$i c$i d$i e$i f$i g$i"))
    val dir0 = docsDir(base)
    val split = DataPipeline.datasetSplit(spark, dir0, 0.2, 0.2).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val trainId = split.collectFirst { case (id, "train") => id }.get
    val evalIds = split.filter(_._2 != "train").keys.toSeq.sorted
    val (leakId, cleanId) = (evalIds.head, evalIds(1))
    val dir = docsDir(base.map { case (id, t) =>
      (id, if (id == leakId) base(trainId.toInt)._2 else t)
    })
    val got = DataPipeline.splitLeakage(spark, dir, 5, 0.2, 0.2).collect()
      .map(r => r.getLong(1) ->
        ((r.getString(0), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(leakId) == ((split(leakId), 3L, 3L, 1.0)))
    assert(got(cleanId) == ((split(cleanId), 3L, 0L, 0.0)))
    // exactly the eval docs are audited — never the train side
    assert(got.keySet == split.filter(_._2 != "train").keySet)
    assert(got.forall { case (_, (s, n, l, f)) =>
      s != "train" && l <= n && f >= 0.0 && f <= 1.0 })
  }

  test("mixture sample: α=0.5 temperature up-weights the low-resource source") {
    import spark.implicits._
    // 900 docs from source A, 100 from B → proportional share 0.3 each;
    // α=0.5 allocation: w=(30,10), T=300, t=(225,75) → keep rates
    // (0.25, 0.75): B is up-weighted 2.5×, A slightly down-weighted
    val dir = java.nio.file.Files.createTempDirectory("graftmix").toString
    (0 until 1000).map { i =>
      (i.toLong, s"tok$i text", "en", if (i < 900) "A" else "B", 9L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DataPipeline.mixtureSample(spark, dir, tFrac = 0.3)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = got.getOrElse("A", 0L).toDouble
    val b = got.getOrElse("B", 0L).toDouble
    // binomial 3σ bands around the exact allocation targets
    assert(math.abs(a - 225) <= 3 * math.sqrt(900 * 0.25 * 0.75), s"A=$a")
    assert(math.abs(b - 75) <= 3 * math.sqrt(100 * 0.75 * 0.25), s"B=$b")
    // the rebalance property itself: B above its proportional share,
    // A below, and the total near T
    assert(b / 100.0 > 0.3 && a / 900.0 < 0.3)
    // determinism: a second run is bit-identical
    val again = DataPipeline.mixtureSample(spark, dir, tFrac = 0.3)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("datasetCard: hand-counted one-row datasheet on a crafted corpus") {
    import spark.implicits._
    // 4 docs, one exact twin pair; vocab {aa,bb,cc,dd}; 2 langs, 2 sources
    val dir = java.nio.file.Files.createTempDirectory("graftcard").toString
    Seq(
      (0L, "aa bb aa", "en", "s1"),
      (1L, "aa bb aa", "en", "s2"),   // exact dup of 0
      (2L, "cc dd", "fr", "s1"),
      (3L, "", "en", "s1"))           // empty: 0 tokens
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = DataPipeline.datasetCard(spark, dir).collect().head
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_tokens") == 8L)          // 3 + 3 + 2 + 0
    assert(r.getAs[Long]("n_unique_contents") == 3L) // dup pair collapses
    assert(r.getAs[Long]("vocab_size") == 4L)
    assert(r.getAs[Long]("n_sources") == 2L)
    assert(r.getAs[Long]("n_langs") == 2L)
    assert(r.getAs[Long]("min_chars") == 0L && r.getAs[Long]("max_chars") == 8L)
    assert(r.getAs[Double]("exact_dup_rate") == 1.0 / 4.0)
    assert(r.getAs[Double]("mean_doc_tokens") == 8.0 / 4.0)
  }

  test("clusterSizeHist conserves documents and clusters") {
    val assign = graft.operators.TextOps.neardupClusters(spark, sf)
    val nDocs = assign.count()
    val nClusters = assign.select("cluster_id").distinct().count()
    val hist = graft.operators.TextOps.clusterSizeHist(spark, sf).collect()
      .map(r => (r.getAs[Long]("cluster_size"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("n_docs")))
    assert(hist.map(h => h._1 * h._2).sum == nDocs)
    assert(hist.map(_._2).sum == nClusters)
    assert(hist.forall(h => h._3 == h._1 * h._2))
    // sf0.001 has crafted near-dups: at least one multi-doc cluster
    assert(hist.exists(_._1 >= 2L))
  }

  test("importance_sample: deterministic, length-upweighted, IPW-unbiased") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf)
    val nDocs = docs.count().toDouble
    val meanChars = docs.agg(avg(col("n_chars"))).collect().head.getDouble(0)
    val s1 = graft.operators.DataPipeline.importanceSample(spark, sf)
    val rows = s1.collect()
    assert(rows.nonEmpty && rows.length < nDocs)
    // deterministic: a second run selects the identical set
    assert(graft.operators.DataPipeline.importanceSample(spark, sf)
      .collect().map(_.getLong(0)).toSet == rows.map(_.getLong(0)).toSet)
    // upweighting: longer docs are likelier, so the raw sample mean
    // length exceeds the corpus mean...
    val sampleMean = rows.map(_.getAs[Long]("n_chars").toDouble).sum / rows.length
    assert(sampleMean > meanChars)
    // ...and the IPW-corrected estimates recover corpus totals within
    // sampling error (Horvitz–Thompson): Σ ipw ≈ N, Σ ipw·len ≈ Σ len
    val estN = rows.map(_.getAs[Double]("ipw")).sum
    assert(math.abs(estN - nDocs) / nDocs < 0.15, s"estN=$estN vs $nDocs")
    val totChars = docs.agg(sum(col("n_chars"))).collect().head.getLong(0).toDouble
    val estChars = rows.map(r => r.getAs[Double]("ipw") * r.getAs[Long]("n_chars")).sum
    assert(math.abs(estChars - totChars) / totChars < 0.15)
    // p is the stated formula, ipw its exact inverse
    rows.foreach { r =>
      val w = r.getAs[Long]("n_chars").toDouble / (r.getAs[Long]("n_chars") + 500.0)
      assert(r.getAs[Double]("p") == math.min(1.0, 0.6 * w))
      assert(r.getAs[Double]("ipw") == 1.0 / r.getAs[Double]("p"))
    }
  }
}
