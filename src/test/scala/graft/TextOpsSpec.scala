package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.ColumnFunctions
import graft.operators.TextOps

/** Text-pipeline operator semantics: portable-hash parity with DuckDB,
  * LSH recall on crafted near-duplicates, and cross-validation of the
  * approximate (minhash) vs exact (all-pairs Jaccard) dedup paths. */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("minhashLsh pair relation is memoized per session (shared subtree)") {
    // neardup_clusters / cluster_reps / curation_pipeline all consume
    // this relation; the memo makes a session pay the signature→band→
    // verify subtree once. Same instance ⇒ same persisted blocks.
    val a = TextOps.minhashLsh(spark, sf)
    val b = TextOps.minhashLsh(spark, sf)
    assert(a eq b)
    assert(a.storageLevel.useMemory, "memoized pair relation must be persisted")
    // a different threshold is a different relation, not a stale hit
    assert(!(TextOps.minhashLsh(spark, sf, 0.7) eq a))
  }

  test("hash64/md5Lower64 match DuckDB md5_number_lower goldens") {
    import spark.implicits._
    val got = Seq("abc", "the quick").toDF("s")
      .select(ColumnFunctions.md5Lower64(col("s")).cast("string"))
      .collect().map(_.getString(0))
    // SELECT md5_number_lower('abc'), md5_number_lower('the quick') in DuckDB
    assert(got.toSeq == Seq("8250560606382298838", "8832313459881608"))
    val seeded = Seq("spark graft").toDF("s")
      .select(ColumnFunctions.hash64(col("s"), 0)).collect().map(_.getLong(0))
    // SELECT (md5_number_lower('0:spark graft') % 9223372036854775783::UBIGINT)::BIGINT
    assert(seeded.toSeq == Seq(3627467534477731596L))
  }

  test("hash64Pair + derived double-hash match DuckDB lower/upper goldens") {
    import spark.implicits._
    val (lo, hi) = ColumnFunctions.hash64Pair(col("s"), "mh")
    val p = ColumnFunctions.HashPrime
    val g3 = ((lo.cast("decimal(21,0)") + lit(3L) * hi.cast("decimal(21,0)")) % lit(p)).cast("long")
    val got = Seq("abc", "the quick").toDF("s").select(lo, hi, g3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // SELECT (md5_number_lower('mh:'||s) % p)::BIGINT, (md5_number_upper(…) % p)::BIGINT,
    //        ((lo::HUGEINT + 3*hi::HUGEINT) % p)::BIGINT  in DuckDB
    assert(got == Seq(
      (5623659039962297221L, 8260406742845501516L, 2734763157934474420L),
      (8829717554030173605L, 5455292087381511200L, 6748849742465155639L)))
  }

  test("docSimilarTopK: identical docs are mutual top matches at score 1") {
    import spark.implicits._
    val a = (1 to 40).map(i => s"w$i").mkString(" ")
    val b = (1 to 40).map(i => s"x$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graftdst").toString
    Seq((0L, a), (1L, a), (2L, b), (3L, b + " " + b))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.docSimilarTopK(spark, dir, k = 1, kTopics = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // identical content: rank-1 mutual match at cosine 1 (up to the
    // sqrt(x)·sqrt(x) ulp)
    assert(rows(0L)._1 == 1L && math.abs(rows(0L)._2 - 1.0) < 1e-12)
    assert(rows(1L)._1 == 0L && math.abs(rows(1L)._2 - 1.0) < 1e-12)
    // doc 3 repeats doc 2's tokens — same DIRECTION, so TF-cosine 1.0
    assert(rows(2L)._1 == 3L && math.abs(rows(2L)._2 - 1.0) < 1e-12)
    // ranks per doc are unique and every present doc got exactly k rows
    assert(rows.size == 4)
  }

  test("docSimilarTopK hot-cell escalation: forced cap keeps the planted matches") {
    import spark.implicits._
    val a = (1 to 40).map(i => s"w$i").mkString(" ")
    val b = (1 to 40).map(i => s"x$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graftdsthot").toString
    Seq((0L, a), (1L, a), (2L, b), (3L, b + " " + b))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // maxCell=1 < cell size (2) forces the banded term-vector sign-LSH:
    // identical / same-direction term vectors agree on every band, so
    // the planted matches survive the escaped branch with equal scores
    val rows = TextOps.docSimilarTopK(spark, dir, k = 1, kTopics = 2, maxCell = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows(0L)._1 == 1L && math.abs(rows(0L)._2 - 1.0) < 1e-12)
    assert(rows(1L)._1 == 0L && math.abs(rows(1L)._2 - 1.0) < 1e-12)
    assert(rows(2L)._1 == 3L && math.abs(rows(2L)._2 - 1.0) < 1e-12)
    assert(rows.size == 4)
  }

  test("docSimilarTopK forced cap on the real corpus: candidate subset, contiguous ranks") {
    val sf = "/root/testdata/sf0.001"
    def m(maxCell: Long) = TextOps.docSimilarTopK(spark, sf, maxCell = maxCell)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getInt(3)))).toMap
    val exact = m(4096)
    val banded = m(1)
    assert(exact.nonEmpty && banded.nonEmpty)
    // same exact-int arithmetic wherever both branches rank a pair
    banded.foreach { case (pair, (s, _)) =>
      exact.get(pair).foreach { case (es, _) => assert(s == es) } }
    // ranks stay contiguous from 1 per doc on the candidate-restricted branch
    banded.groupBy(_._1._1).foreach { case (_, rs) =>
      val ranks = rs.values.map(_._2).toSeq.sorted
      assert(ranks == (1 to ranks.size))
    }
    assert(m(1) == banded) // deterministic across runs
  }

  test("lshBandStats: identical docs collide in every band, counts consistent") {
    import spark.implicits._
    val a = (1 to 40).map(i => s"w$i").mkString(" ")
    val b = (1 to 40).map(i => s"x$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graftlshs").toString
    Seq((0L, a), (1L, a), (2L, b), (3L, b + " tail"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.lshBandStats(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.keySet == Set(0, 1, 2, 3)) // 4 bands
    rows.values.foreach { case (nb, mx, cp, nd) =>
      assert(nd == 4L)        // every doc has shingles, lands in each band
      assert(mx >= 2L)        // docs 0/1 are identical → shared bucket
      assert(cp >= 1L)        // ... which predicts at least their pair
      assert(nb <= nd)        // buckets cannot exceed banded docs
      // Σ C(cnt,2) over buckets is consistent with nb/mx bounds
      assert(cp <= nd * (nd - 1) / 2)
    }
  }

  test("minhash LSH finds crafted near-duplicates and skips unrelated docs") {
    import spark.implicits._
    val base = ("w" + (1 to 40).mkString(" w")).split(" ").mkString(" ") // w1..w40
    val nearDup = base.replace("w20", "w99") // 1 token of 40 changed
    val other = ("x" + (1 to 40).mkString(" x")).split(" ").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graftdocs").toString
    Seq((0L, base, "en", "s", base.length.toLong),
        (1L, nearDup, "en", "s", nearDup.length.toLong),
        (2L, other, "en", "s", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = TextOps.minhashLsh(spark, dir, threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("minhash LSH equals the exact all-pairs form on the test corpus") {
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = key(TextOps.ngramJaccard(spark, sf, 0.5))
    val lsh = key(TextOps.minhashLsh(spark, sf, 0.5))
    assert(lsh.subsetOf(exact)) // LSH+verify can never invent a pair
    assert(exact.nonEmpty && lsh.size >= (exact.size * 9) / 10) // ≥90 % recall
  }

  test("neardup clusters == union-find over the minhash pair graph") {
    val pairs = TextOps.minhashLsh(spark, sf, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = TextOps.neardupClusters(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(clusters.length == nDocs)                    // one row per doc
    // reference union-find over the same pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    clusters.foreach { case (doc, cl, canon) =>
      assert(cl == find(doc), s"doc $doc: cluster $cl != union-find ${find(doc)}")
      assert(canon == (if (doc == cl) 1L else 0L))
    }
    assert(pairs.nonEmpty)                              // graph is non-trivial
    // the distributed min-label branch must agree with the driver branch
    val viaPregel = TextOps.neardupClusters(spark, sf, 0.5, maxDriverPairs = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(viaPregel.sortBy(_._1).toSeq == clusters.sortBy(_._1).toSeq)
  }

  test("neardup clusters propagate across a chain (A~B~C, A!~C)") {
    import spark.implicits._
    val toks = (1 to 40).map(i => s"w$i").toArray
    def mutate(t: Array[String], ps: Seq[Int]) =
      t.zipWithIndex.map { case (w, i) => if (ps.contains(i)) s"m$i" else w }
    val a = toks.mkString(" ")
    val b = mutate(toks, Seq(3, 9, 15, 21)).mkString(" ")      // j(a,b)~0.66
    val c = mutate(toks, Seq(3, 9, 15, 21, 27, 31, 35, 38)).mkString(" ")
    val d = (1 to 40).map(i => s"x$i").mkString(" ")           // unrelated
    val dir = java.nio.file.Files.createTempDirectory("graftcc").toString
    Seq((0L, a), (1L, b), (2L, c), (3L, d))
      .map { case (i, t) => (i, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cl = TextOps.neardupClusters(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // j(a,c)~0.42 < 0.5: a,c connect only THROUGH b — needs >1 round
    assert(cl.toSeq == Seq((0L, 0L, 1L), (1L, 0L, 0L), (2L, 0L, 0L), (3L, 3L, 1L)))
  }

  test("repetition stats: degenerate text scores high, varied text low") {
    import spark.implicits._
    val looped = ("spam ham " * 20).trim                     // 2 distinct tokens
    val varied = (1 to 40).map(i => s"u$i").mkString(" ")    // all distinct
    val dir = java.nio.file.Files.createTempDirectory("graftrep").toString
    Seq((0L, looped), (1L, varied))
      .map { case (i, t) => (i, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.repetitionStats(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    // looped doc, n=2: 39 bigram occurrences, 2 distinct ("spam ham"/"ham spam")
    assert(rows((0L, 2)) == ((39L, 2L, 1.0 - 2.0 / 39.0, 20.0 / 39.0)))
    // varied doc: every gram unique → dup_frac 0, top_frac 1/total
    assert(rows((1L, 2)) == ((39L, 39L, 0.0, 1.0 / 39.0)))
    assert(rows((1L, 3)) == ((38L, 38L, 0.0, 1.0 / 38.0)))
    assert(rows((0L, 3))._3 > 0.9)                           // 3-grams also degenerate
  }

  test("contamination: planted benchmark overlap found, clean docs absent") {
    import spark.implicits._
    val bench = (1 to 30).map(i => s"b$i").mkString(" ")     // doc 7 ≡ benchmark slice
    val leak = "z1 z2 " + (1 to 10).map(i => s"b$i").mkString(" ") // 10-token overlap
    val clean = (1 to 30).map(i => s"c$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graftcont").toString
    Seq((7L, bench), (1L, leak), (2L, clean))
      .map { case (i, t) => (i, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.contamination(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // leak shares b1..b10 → six distinct 5-grams (b1..b5 … b6..b10)
    assert(got.toSeq == Seq((1L, 7L, 6L)))
  }

  test("crossDedupPersisted: signature-store round-trip serves identical verdicts") {
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // the persisted path (corpus signed once → parquet store → new
    // batch joins the loaded artifact) must be verdict-identical to
    // the inline query, which is hash-checked against DuckDB
    assert(key(TextOps.crossDedupPersisted(spark, sf)) ==
      key(TextOps.crossDedup(spark, sf)))
    // the stored relations honor the plain-parquet contract
    val path = graft.sources.IndexStore.artifactPath("dedup", s"$sf|src5")
    val (sha, bands, shingles) =
      graft.sources.IndexStore.loadDedupSignatures(spark, path)
    assert(sha.columns.toSeq == Seq("h", "cid"))
    assert(bands.columns.toSeq == Seq("doc_id", "band", "x", "y"))
    assert(shingles.columns.toSeq == Seq("doc_id", "sh"))
    // corpus-only: no src5 (new-batch) doc leaked into the store
    val newIds = graft.sources.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("source") === "src5")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bands.select("doc_id").distinct().collect()
      .map(_.getLong(0)).toSet.intersect(newIds).isEmpty)
  }

  test("signature store append: keepers join the corpus, next batch sees them") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // corpus c, batch b1 (all unique → all keepers), batch b2 (one copy
    // of a b1 text, one copy of a corpus text, one fresh text)
    val t = (i: Int) => s"doc number $i with its own distinct words w$i x$i y$i"
    val rows = Seq(
      (1L, t(1), "c"), (2L, t(2), "c"), (3L, t(3), "c"),
      (11L, t(11), "b1"), (12L, t(12), "b1"),
      (21L, t(11), "b2"), (22L, t(2), "b2"), (23L, t(23), "b2"))
    val dir = java.nio.file.Files.createTempDirectory("graftstore").toString
    rows.map { case (i, x, s) => (i, x, "en", s, x.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val path = java.nio.file.Files.createTempDirectory("graftsig").toString + "/store"
    // day 0: sign the corpus once
    val (s0, b0, g0) = TextOps.dedupSignatureFrames(spark, dir, col("source") === "c")
    graft.sources.IndexStore.saveDedupSignatures(spark, s0, b0, g0, path)
    // day 1: b1 arrives, all keepers
    def verdicts(src: String) =
      TextOps.crossDedupAgainstStore(spark, dir, path, src).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val v1 = verdicts("b1")
    assert(v1 == Map(11L -> (("keep", -1L)), 12L -> (("keep", -1L))))
    // keepers' signatures APPEND — no corpus re-sign
    val (s1, b1, g1) = TextOps.dedupSignatureFrames(spark, dir, col("source") === "b1")
    graft.sources.IndexStore.appendDedupSignatures(spark, s1, b1, g1, path)
    // day 2: b2 sees the appended keepers AND the original corpus, and
    // the store-served verdicts equal the inline query whose corpus is
    // everything non-b2 (c ∪ b1) — hash-checked machinery, same result
    val v2 = verdicts("b2")
    assert(v2(21L) == (("exact", 11L)) && v2(22L) == (("exact", 2L)) &&
      v2(23L)._1 == "keep")
    val inline = TextOps.crossDedup(spark, dir, "b2").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(v2 == inline)
  }

  test("torn append: load serves the prior generation; retry excludes orphans") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.IndexStore
    val t = (i: Int) => s"doc number $i with its own distinct words w$i x$i y$i"
    val rows = Seq(
      (1L, t(1), "c"), (2L, t(2), "c"), (3L, t(3), "c"),
      (11L, t(11), "b1"), (12L, t(12), "b1"))
    val dir = java.nio.file.Files.createTempDirectory("grafttorn").toString
    rows.map { case (i, x, s) => (i, x, "en", s, x.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val path = java.nio.file.Files.createTempDirectory("graftsig2").toString + "/store"
    val (s0, b0, g0) = TextOps.dedupSignatureFrames(spark, dir, col("source") === "c")
    IndexStore.saveDedupSignatures(spark, s0, b0, g0, path)
    val (shaBefore, bandsBefore, setsBefore) = {
      val (a, b, c) = IndexStore.loadDedupSignatures(spark, path)
      (a.count(), b.count(), c.count())
    }
    // simulate a crash BETWEEN the relation appends and the meta
    // rewrite: the relation dirs gain part files the manifest never
    // names (exactly what appendDedupSignatures leaves if killed after
    // its three writes) — r11 behavior was a permanent throw here
    val (s1, b1, g1) = TextOps.dedupSignatureFrames(spark, dir, col("source") === "b1")
    s1.write.mode("append").parquet(s"$path/sha")
    b1.write.mode("append").parquet(s"$path/bands")
    g1.write.mode("append").parquet(s"$path/shingles")
    // load still succeeds and serves the PRIOR consistent generation
    val (sha2, bands2, sets2) = IndexStore.loadDedupSignatures(spark, path)
    assert(sha2.count() == shaBefore && bands2.count() == bandsBefore &&
      sets2.count() == setsBefore)
    // verdicts against the recovered store don't see the torn batch:
    // a copy of a b1 text stays "keep" (b1 never made it in)
    val v = TextOps.crossDedupAgainstStore(spark, dir, path, "b1").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v == Map(11L -> "keep", 12L -> "keep"))
    // the ingest RETRY re-appends the batch; the new manifest includes
    // the retry's files but never the orphans — counts grow by exactly
    // one batch, not two
    IndexStore.appendDedupSignatures(spark, s1, b1, g1, path)
    val (sha3, _, _) = IndexStore.loadDedupSignatures(spark, path)
    assert(sha3.count() == shaBefore + 2) // b1 has two docs
    val v2 = TextOps.crossDedupAgainstStore(spark, dir, path, "b1").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(v2 == Map(11L -> (("exact", 11L)), 12L -> (("exact", 12L))))
    // vacuum reclaims exactly the torn append's orphans (3 relations ×
    // the orphan write's part files); the store reloads identically
    val deleted = IndexStore.vacuumDedupStore(spark, path)
    assert(deleted > 0, "vacuum found no orphans after a torn append")
    val (sha4, bands4, sets4) = IndexStore.loadDedupSignatures(spark, path)
    assert(sha4.count() == shaBefore + 2)
    assert(IndexStore.vacuumDedupStore(spark, path) == 0) // idempotent
    val v3 = TextOps.crossDedupAgainstStore(spark, dir, path, "b1").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(v3 == v2)
  }

  test("torn META write: incomplete meta generation is skipped, prior serves (ADVICE r12)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.IndexStore
    val t = (i: Int) => s"doc number $i with its own distinct words w$i x$i y$i"
    val rows = Seq((1L, t(1), "c"), (2L, t(2), "c"), (11L, t(11), "b1"))
    val dir = java.nio.file.Files.createTempDirectory("graftmetatorn").toString
    rows.map { case (i, x, s) => (i, x, "en", s, x.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val path = java.nio.file.Files.createTempDirectory("graftmetasig").toString + "/store"
    val (s0, b0, g0) = TextOps.dedupSignatureFrames(spark, dir, col("source") === "c")
    IndexStore.saveDedupSignatures(spark, s0, b0, g0, path)
    val before = {
      val (a, b, c) = IndexStore.loadDedupSignatures(spark, path)
      (a.count(), b.count(), c.count())
    }
    // simulate a crash DURING the meta write: a NEWER generation dir
    // exists, holds garbage bytes, and has no _SUCCESS marker — the
    // r12 in-place overwrite would have deleted meta before this point
    // and bricked the store; the versioned reader must skip it (it
    // would throw if it tried to read the junk parquet)
    val gens = new java.io.File(s"$path/meta").listFiles()
      .filter(_.getName.matches("v\\d+")).map(_.getName.drop(1).toLong).sorted
    val junk = new java.io.File(s"$path/meta/v${gens.last + 1}")
    junk.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(junk, "part-00000.parquet").toPath,
      Array[Byte](0x13, 0x37, 0x13, 0x37))
    val after = {
      val (a, b, c) = IndexStore.loadDedupSignatures(spark, path)
      (a.count(), b.count(), c.count())
    }
    assert(after == before, "incomplete meta generation was not skipped")
    // the next writer allocates PAST the torn generation (no reuse of
    // a junk dir) and the store keeps working end to end
    val (s1, b1, g1) = TextOps.dedupSignatureFrames(spark, dir, col("source") === "b1")
    IndexStore.appendDedupSignatures(spark, s1, b1, g1, path)
    val (sha2, _, _) = IndexStore.loadDedupSignatures(spark, path)
    assert(sha2.count() == before._1 + 1)
  }

  test("append manifests name ONLY this append's files: alien in-flight part files never leak in (ADVICE r16)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.IndexStore
    val t = (i: Int) => s"doc number $i with its own distinct words w$i x$i y$i"
    val rows = Seq((1L, t(1), "c"), (2L, t(2), "c"), (11L, t(11), "b1"))
    val dir = java.nio.file.Files.createTempDirectory("graftalien").toString
    rows.map { case (i, x, s) => (i, x, "en", s, x.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val path = java.nio.file.Files.createTempDirectory("graftaliensig")
      .toString + "/store"
    val (s0, b0, g0) = TextOps.dedupSignatureFrames(spark, dir, col("source") === "c")
    IndexStore.saveDedupSignatures(spark, s0, b0, g0, path)
    val base = IndexStore.loadDedupSignatures(spark, path)._1.count()
    // an ALIEN not-yet-committed append's part files land in the
    // relation dirs (the racing-writer window the old dir-diff
    // manifest could capture: snapshot → alien write → diff); the
    // per-append subdir scheme must keep them out of OUR manifest
    Seq(("deadbeefcafe0000111122223333", 999L)).toDF("h", "cid")
      .write.parquet(s"$path/sha/append-alien0000")
    val (sA, bA, gA) = TextOps.dedupSignatureFrames(spark, dir, col("source") === "b1")
    IndexStore.appendDedupSignatures(spark, sA, bA, gA, path)
    val (sha1, _, _) = IndexStore.loadDedupSignatures(spark, path)
    assert(sha1.count() == base + 1,
      "alien in-flight part file leaked into the append's manifest")
    assert(!sha1.collect().map(_.getLong(1)).contains(999L))
    // the alien file is an orphan the vacuum reclaims
    assert(IndexStore.vacuumDedupStore(spark, path) > 0)
    assert(IndexStore.loadDedupSignatures(spark, path)._1.count() == base + 1)
  }

  test("single-writer CAS: an appender whose base advanced underneath it fails loudly (VERDICT r13 #4)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.IndexStore
    val t = (i: Int) => s"doc number $i with its own distinct words w$i x$i y$i"
    val rows = Seq((1L, t(1), "c"), (2L, t(2), "c"),
      (11L, t(11), "b1"), (21L, t(21), "b2"))
    val dir = java.nio.file.Files.createTempDirectory("graftcas").toString
    rows.map { case (i, x, s) => (i, x, "en", s, x.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val path = java.nio.file.Files.createTempDirectory("graftcassig").toString + "/store"
    val (s0, b0, g0) = TextOps.dedupSignatureFrames(spark, dir, col("source") === "c")
    IndexStore.saveDedupSignatures(spark, s0, b0, g0, path)
    val base = IndexStore.loadDedupSignatures(spark, path)._1.count()
    // writer A appends batch b1; the interleave seam fires writer B's
    // FULL append (batch b2) inside A's meta commit — i.e. B commits
    // AFTER A read its manifest, the classic lost-update interleave
    // that used to resolve last-writer-wins with B's rows vanishing
    val (sA, bA, gA) = TextOps.dedupSignatureFrames(spark, dir, col("source") === "b1")
    val (sB, bB, gB) = TextOps.dedupSignatureFrames(spark, dir, col("source") === "b2")
    IndexStore.metaWriteInterleave = Some(() =>
      IndexStore.appendDedupSignatures(spark, sB, bB, gB, path))
    val e = intercept[IllegalStateException] {
      try IndexStore.appendDedupSignatures(spark, sA, bA, gA, path)
      finally IndexStore.metaWriteInterleave = None
    }
    assert(e.getMessage.contains("concurrent writer"),
      s"error does not name the violation: ${e.getMessage}")
    assert(e.getMessage.contains(path))
    // the loader serves a CONSISTENT generation: the winner's (B's)
    // append is in, the loser's (A's) is NOT silently half-merged
    val (sha1, bands1, sets1) = IndexStore.loadDedupSignatures(spark, path)
    assert(sha1.count() == base + 1, "winner's append missing or loser's leaked")
    assert(bands1.count() > 0 && sets1.count() > 0)
    // the loser's orphaned part files (its relation appends landed
    // before its meta was rejected) are reclaimable, and the retry
    // from the CURRENT manifest succeeds normally
    assert(IndexStore.vacuumDedupStore(spark, path) > 0,
      "aborted append left no reclaimable orphans?")
    IndexStore.appendDedupSignatures(spark, sA, bA, gA, path)
    assert(IndexStore.loadDedupSignatures(spark, path)._1.count() == base + 2)
  }

  test("generation claims stay bounded: commits clean their own, vacuum reclaims crashed writers' (VERDICT r14 #1)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.IndexStore
    val t = (i: Int) => s"claim doc $i with distinct words cw$i cx$i cy$i"
    val rows = (1 to 6).map(i => (i.toLong, t(i), "en", s"s$i", t(i).length.toLong))
    val dir = java.nio.file.Files.createTempDirectory("graftclaim").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val path = java.nio.file.Files.createTempDirectory("graftclaimsig").toString + "/store"
    def claims(): Seq[String] = {
      val m = new java.io.File(s"$path/meta")
      if (!m.exists()) Seq.empty
      else m.listFiles().map(_.getName).filter(_.endsWith(".claim")).toSeq.sorted
    }
    def latestGen(): Long = new java.io.File(s"$path/meta").listFiles()
      .filter(_.getName.matches("v\\d+")).map(_.getName.drop(1).toLong).max
    val (s0, b0, g0) = TextOps.dedupSignatureFrames(spark, dir, col("source") === "s1")
    IndexStore.saveDedupSignatures(spark, s0, b0, g0, path)
    // N successful appends: every commit deletes its own claim, so the
    // claim listing stays EMPTY — not one-junk-file-per-append
    (2 to 4).foreach { i =>
      val (s, b, g) = TextOps.dedupSignatureFrames(spark, dir, col("source") === s"s$i")
      IndexStore.appendDedupSignatures(spark, s, b, g, path)
      assert(claims().isEmpty, s"successful append $i leaked claims: ${claims()}")
    }
    // a writer that crashed between claim and generation write leaves
    // a stale claim; the next append allocates PAST it and commits
    val crashed = latestGen() + 1
    new java.io.File(s"$path/meta/v$crashed.claim").createNewFile()
    val (s5, b5, g5) = TextOps.dedupSignatureFrames(spark, dir, col("source") === "s5")
    IndexStore.appendDedupSignatures(spark, s5, b5, g5, path)
    assert(latestGen() > crashed, "allocation failed to skip the crashed claim")
    assert(claims() == Seq(s"v$crashed.claim"))
    // vacuum reclaims it (≤ newest complete generation ⇒ provably dead)…
    assert(IndexStore.vacuumDedupStore(spark, path) >= 1)
    assert(claims().isEmpty, s"stale claim survived vacuum: ${claims()}")
    // …but never touches a claim BEYOND the newest complete generation —
    // that may be an in-flight writer between its claim and its commit
    val inflight = latestGen() + 3
    new java.io.File(s"$path/meta/v$inflight.claim").createNewFile()
    IndexStore.vacuumDedupStore(spark, path)
    assert(claims() == Seq(s"v$inflight.claim"),
      "vacuum deleted a possibly-in-flight claim")
    // the store still appends normally around the live claim
    val (s6, b6, g6) = TextOps.dedupSignatureFrames(spark, dir, col("source") === "s6")
    IndexStore.appendDedupSignatures(spark, s6, b6, g6, path)
    assert(IndexStore.loadDedupSignatures(spark, path)._1.count() == 6)
  }

  test("sampled-stats ngram_jaccard: identical output, scaled estimates, no bitmap pick") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e12))
    // output is strategy-independent (all exact), so any sample fraction
    // must reproduce the exact-stats result bit-for-bit
    val exact = TextOps.ngramJaccard(spark, sf).collect().map(key).toSet
    val sampled = TextOps.ngramJaccard(spark, sf, 0.5, statsSampleFraction = 0.5)
      .collect().map(key).toSet
    assert(sampled == exact && exact.nonEmpty)
    // the scaled estimates land near the exact stats (doc sampling is
    // unbiased for nDocs/rows and /f² for the join size)
    val sets = TextOps.shingleSets(spark, sf)
    val full = TextOps.jaccardStats(sets)
    val est = TextOps.jaccardStats(sets, 0.5)
    assert(math.abs(est.nDocs - full.nDocs) <= full.nDocs / 2)
    assert(math.abs(est.rows - full.rows) <= full.rows / 2)
    assert(est.vocab <= full.vocab && est.vocab > 0)
  }

  test("prefix-filtered ngram_jaccard equals the naive inverted-index form") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e12))
    val fast = TextOps.ngramJaccard(spark, sf).collect().map(key).toSet
    val naive = TextOps.ngramJaccardNaive(spark, sf).collect().map(key).toSet
    assert(fast == naive && fast.nonEmpty)
  }

  test("jaccardVerify array kernel is bit-identical to the explode-join form (VERDICT r15 next #1)") {
    // real documents, candidates from the exact prefix filter (a
    // superset of every qualifying pair); thresholds cover the
    // registered dedup gate (0.5), a looser gate, and the calibration
    // caller's 0.0 (where the inter>0 row-drop semantics must match).
    // Doubles compared EXACTLY — the kernel divides the same integers.
    val sets = TextOps.shingleSets(spark, sf)
    val cands = TextOps.prefixCandidates(sets, 0.3)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    Seq(0.0, 0.3, 0.5).foreach { t =>
      val kernel = key(TextOps.jaccardVerify(cands, sets, t))
      val naive = key(TextOps.jaccardVerifyNaive(cands, sets, t))
      assert(kernel == naive && kernel.nonEmpty,
        s"kernel/naive mismatch at threshold $t: ${kernel.size} vs ${naive.size}")
      // the asymmetric (batch-broadcast) form must produce the same
      // rows bit for bit — same arrays, same integers, different
      // physical shape (the crossDedup serve kernel)
      val asym = key(TextOps.jaccardVerifyAsym(cands, sets, t))
      assert(asym == naive,
        s"asym/naive mismatch at threshold $t: ${asym.size} vs ${naive.size}")
      // size-gate fallback (VERDICT r16 wrong #3, the withBloomFlag
      // pattern): a zero byte ceiling FORCES the symmetric-kernel
      // path — rows must stay identical through both shapes
      val gated = key(TextOps.jaccardVerifyAsym(cands, sets, t,
        maxBatchBytes = 0L))
      assert(gated == naive,
        s"gated-fallback mismatch at threshold $t: ${gated.size} vs ${naive.size}")
      // r17: the batch-scan estimate path (one narrow scan of the
      // arriving docs instead of re-deriving the candidate subtree)
      // must route BOTH sides of the gate to identical rows — tiny
      // ceiling forces the symmetric kernel, huge ceiling the asym one
      val batch = graft.sources.Tables.documents(spark, sf)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text"))
      val cheapGated = key(TextOps.jaccardVerifyAsym(cands, sets, t,
        maxBatchBytes = 0L, batchDocs = Some(batch)))
      val cheapAsym = key(TextOps.jaccardVerifyAsym(cands, sets, t,
        batchDocs = Some(batch)))
      assert(cheapGated == naive && cheapAsym == naive,
        s"batch-scan estimate path mismatch at threshold $t")
    }
    // the exact size bound prunes without output change by ALGEBRA:
    // J <= min/max, so a pair it drops could never pass the threshold
    // — pin the bound's arithmetic on a crafted edge (ratio == t)
    import spark.implicits._
    val edge = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (2L, "c"), (2L, "d"))
      .toDF("doc_id", "sh")
    val pair = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    // na=2, nb=4: ratio 0.5 == threshold — must NOT be pruned by the
    // slack form even though J = 2/4 = 0.5 exactly qualifies
    assert(TextOps.jaccardVerify(pair, edge, 0.5).collect()
      .map(_.getDouble(2)).toSeq == Seq(0.5))
  }

  test("all three FORCED strategies produce identical pairs (audit hook)") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e12))
    val byStrategy = Seq(TextOps.BitmapAllPairs, TextOps.PrefixFiltered,
        TextOps.DirectInverted)
      .map(s => TextOps.ngramJaccardWith(spark, sf, 0.5, s).collect().map(key).toSet)
    assert(byStrategy.head.nonEmpty)
    assert(byStrategy.distinct.size == 1,
      s"forced strategies disagree: sizes ${byStrategy.map(_.size)}")
  }

  test("prefix filtering collapses a planted stop-shingle posting list") {
    import spark.implicits._
    // 30 docs, 10 shingles each, ALL sharing the stop-shingle "of the";
    // docs 0 and 1 additionally share c1..c8 (J = 9/11 ≥ 0.5)
    val hot = "of the"
    val sets = (
      Seq((0L, hot)) ++ (1 to 8).map(i => (0L, s"c$i")) ++ Seq((0L, "x0")) ++
      Seq((1L, hot)) ++ (1 to 8).map(i => (1L, s"c$i")) ++ Seq((1L, "x1")) ++
      (2 until 30).flatMap(dId =>
        Seq((dId.toLong, hot)) ++ (1 to 9).map(i => (dId.toLong, s"u${dId}_$i")))
    ).toDF("doc_id", "sh")
    val cands = TextOps.prefixCandidates(sets, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the hot shingle alone would make every pair a candidate (435);
    // the prefix filter keeps exactly the one qualifying pair
    assert(cands == Set((0L, 1L)))
  }

  test("jaccard strategy chooser: bitmap for dense small corpora, prefix for stop-shingle, direct for dense-unprunable") {
    import spark.implicits._
    // stop-shingle corpus (same shape as the collapse test)
    val hot = "of the"
    val stopSets = (
      Seq((0L, hot)) ++ (1 to 8).map(i => (0L, s"c$i")) ++ Seq((0L, "x0")) ++
      Seq((1L, hot)) ++ (1 to 8).map(i => (1L, s"c$i")) ++ Seq((1L, "x1")) ++
      (2 until 30).flatMap(dId =>
        Seq((dId.toLong, hot)) ++ (1 to 9).map(i => (dId.toLong, s"u${dId}_$i")))
    ).toDF("doc_id", "sh")
    val stopStats = TextOps.jaccardStats(stopSets)
    // small corpus → bitmap under default caps…
    assert(TextOps.chooseJaccardStrategy(stopStats,
      TextOps.prefixJoinRows(stopSets, 0.5)) == TextOps.BitmapAllPairs)
    // …but with bitmap ruled out (the at-scale shape), the hot shingle
    // collapses out of the prefixes → prefix filtering wins
    assert(TextOps.chooseJaccardStrategy(stopStats,
      TextOps.prefixJoinRows(stopSets, 0.5), maxBitmapDocs = 0) == TextOps.PrefixFiltered)
    // the real corpus is DENSE (tiny shared vocab, df ≈ nDocs/17): with
    // bitmap ruled out, pruning can't win → direct inverted index
    val denseSets = sources.Tables.documents(spark, sf)
      .withColumn("toks", expr("split(trim(text), '\\\\s+')"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks)-2), i -> toks[i] || ' ' || toks[i+1])")).as("sh"))
      .distinct()
    assert(TextOps.chooseJaccardStrategy(TextOps.jaccardStats(denseSets),
      TextOps.prefixJoinRows(denseSets, 0.5), maxBitmapDocs = 0) == TextOps.DirectInverted)
  }

  test("dedup_exact keeps one row per distinct text with the lowest doc_id") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftdocs2").toString
    Seq((5L, "aa bb cc", "en", "s", 8L), (3L, "aa bb cc", "en", "s", 8L),
        (7L, "dd ee ff", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.dedupExact(spark, dir)
      .select("keeper_id", "n_copies").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((3L, 2L), (7L, 1L)))
  }

  test("text stats and langId agree with hand-computed values") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftdocs3").toString
    Seq((1L, "the cat and the hat", "en", "s", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val st = TextOps.textStats(spark, dir).collect().head
    assert(st.getAs[Int]("n_tokens") == 5)
    assert(st.getAs[Int]("n_distinct_tokens") == 4)
    assert(st.getAs[Double]("stopword_ratio") == 3.0 / 5) // the, and, the
    assert(st.getAs[Double]("avg_token_len") == 15.0 / 5)
    val li = TextOps.langId(spark, dir).collect().head
    assert(li.getAs[String]("lang_pred") == "en")
    assert(li.getAs[Double]("score_en") == 3.0 / 5)
  }

  test("simhash of identical docs is identical; near-dups are Hamming-close") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val near = base.replace("tok7", "tok99")
    val far = (1 to 30).map(i => s"other$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graftdocs4").toString
    Seq((0L, base, "en", "s", 1L), (1L, base, "en", "s", 1L),
        (2L, near, "en", "s", 1L), (3L, far, "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val h = TextOps.simhash(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h(0L) == h(1L))
    assert(ham(h(0L), h(2L)) < ham(h(0L), h(3L)))
    assert(ham(h(0L), h(2L)) <= 12) // 1/30 tokens changed: few bits flip
  }

  test("docQuantiles equals Spark's builtin percentile per (lang, q)") {
    val got = TextOps.docQuantiles(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Double]("q")) ->
        r.getAs[Double]("quantile")).toMap
    val base = spark.read.parquet(s"$sf/documents.parquet")
    val exp = Seq(0.25, 0.5, 0.75).flatMap { q =>
      base.groupBy("lang")
        .agg(percentile(col("n_chars"), lit(q)).as("p")).collect()
        .map(r => (r.getAs[String]("lang"), q) -> r.getAs[Double]("p"))
    }.toMap
    assert(got.keySet == exp.keySet)
    // the rank-interpolate plan must agree with the buffering builtin
    // EXACTLY (quarter-fraction arithmetic is exact in double)
    got.foreach { case (k, v) => assert(v == exp(k), s"$k: $v != ${exp(k)}") }
  }

  test("tokenTopK is the head of the full token-frequency table") {
    val top = TextOps.tokenTopK(spark, sf, 10).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("cnt")))
    assert(top.length == 10)
    assert(top.map(_._2).sliding(2).forall(s => s.head >= s.last))
    val full = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").count().collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("count")).toMap
    top.foreach { case (t, c) => assert(full(t) == c) }
    // the cut is correct: nothing outside the top-10 beats the 10th
    val floor10 = top.last._2
    assert(full.count { case (_, c) => c > floor10 } <= 9)
  }

  test("clusterReps keeps the longest member of each multi-doc cluster") {
    import spark.implicits._
    val text = (1 to 40).map(i => s"tok$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graftdocs5").toString
    Seq((0L, text, "en", "s", 10L), (1L, text, "en", "s", 20L),
        (2L, "completely different words entirely", "en", "s", 33L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val reps = TextOps.clusterReps(spark, dir).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("rep_id"),
        r.getAs[Long]("n_docs")))
    // one non-singleton cluster {0,1}; rep = doc 1 (longer n_chars);
    // the singleton doc 2 is suppressed
    assert(reps.toSeq == Seq((0L, 1L, 2L)))
  }

  test("editDistancePairs verifies simhash candidates with exact distances") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val near = base.replace("tok7", "tok99")
    val far = (1 to 30).map(i => s"other$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graftdocs6").toString
    Seq((0L, base, "en", "s", 1L), (1L, base, "en", "s", 1L),
        (2L, near, "en", "s", 1L), (3L, far, "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.editDistancePairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("edit_dist")).toMap
    // the exact-dup pair always survives banding (identical simhash)
    assert(got.get((0L, 1L)).contains(0L))
    // every reported distance equals an independent recomputation
    val texts = Map(0L -> base, 1L -> base, 2L -> near, 3L -> far)
    got.foreach { case ((a, b), dist) =>
      val exp = spark.sql(
        s"SELECT levenshtein('${texts(a)}', '${texts(b)}')").head().getInt(0)
      assert(dist == exp, s"pair ($a,$b)")
    }
    // the far doc shares no tokens — it must never verify at 0.4·len
    assert(!got.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("containmentPairs detects a quoted doc that symmetric Jaccard misses") {
    import spark.implicits._
    val small = "q1 q2 q3 q4 q5 q6"
    val big = s"intro words here $small outro words trail"
    val other = (1 to 12).map(i => s"z$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graftcont").toString
    Seq((0L, small), (1L, big), (2L, other))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.containmentPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("containment")).toMap
    // the small doc is fully contained (all 5 bigrams appear in big)
    assert(got == Map((0L, 1L) -> 1.0))
    // the symmetric detector scores the same pair J = 5/11 — below 0.5
    val jac = TextOps.ngramJaccard(spark, dir, 0.5).collect()
    assert(jac.isEmpty)
  }

  test("containment strategies: bitmap and prefix forms are output-identical") {
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("inter"), r.getAs[Long]("na"),
        r.getAs[Double]("containment"))).toSet
    val sets = TextOps.shingleSets(spark, sf)
    val viaBitmap = key(TextOps.bitmapContainment(sets,
      sets.select("sh").distinct().count(), 0.8))
    val viaPrefix = key(TextOps.prefixContainment(sets, 0.8))
    assert(viaBitmap == viaPrefix && viaBitmap.nonEmpty)
  }

  test("dupSpans finds maximal cross-doc and within-doc duplicated spans") {
    import spark.implicits._
    // docs 0/1 share an 8-token block at different offsets; doc 3 repeats
    // a 5-token run within itself; doc 2 is all-unique control
    val block = "a b c d e f g h"
    val d0 = s"$block p q r s t u"
    val d1 = s"x1 x2 $block y1 y2"
    val d2 = (1 to 12).map(i => s"u$i").mkString(" ")
    val d3 = "m1 m2 m3 m4 m5 z m1 m2 m3 m4 m5"
    val dir = java.nio.file.Files.createTempDirectory("graftspans").toString
    Seq((0L, d0), (1L, d1), (2L, d2), (3L, d3))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.dupSpans(spark, dir, l = 5).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_id"),
        r.getAs[Long]("span_start"), r.getAs[Long]("span_end"),
        r.getAs[Long]("span_tokens"), r.getAs[Long]("n_dup_grams"))).toSet
    assert(got == Set(
      (0L, 1L, 0L, 7L, 8L, 4L),   // the shared block, grams 0..3 merged
      (1L, 1L, 2L, 9L, 8L, 4L),   // same block, offset by the x-prefix
      (3L, 1L, 0L, 4L, 5L, 1L),   // within-doc repeat: first occurrence
      (3L, 2L, 6L, 10L, 5L, 1L))) // second occurrence, its own island

    // scrubSpans cuts exactly the covered tokens and reassembles the rest
    val clean = TextOps.scrubSpans(spark, dir, l = 5).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_removed"), r.getAs[String]("clean_text")))).toMap
    assert(clean(0L) == ((8L, "p q r s t u")))
    assert(clean(1L) == ((8L, "x1 x2 y1 y2")))
    assert(clean(2L) == ((0L, d2)))          // untouched control
    assert(clean(3L) == ((10L, "z")))        // both repeats cut, gap kept
  }

  test("winnowPairs: w+k-1 token match guarantees a shared fingerprint") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftwin").toString
    // k=4, w=4 → guarantee threshold is a 7-token shared run
    val run = "q1 q2 q3 q4 q5 q6 q7"
    val rows = Seq(
      (1L, s"a1 a2 a3 a4 a5 $run a6 a7 a8 a9"),
      (2L, s"b1 b2 b3 b4 $run b5 b6 b7 b8 b9 b10"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"), // no overlap
      (4L, "d1 d2 d3")) // fewer than w grams → no fingerprints at all
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = TextOps.winnowPairs(spark, dir, minShared = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists { case (a, b, n) => a == 1L && b == 2L && n >= 1 },
      s"guaranteed pair (1,2) missing from ${pairs.toSeq}")
    assert(!pairs.exists { case (a, b, _) => Set(a, b).contains(3L) || Set(a, b).contains(4L) })
  }

  test("docTopics: total partition, content-identical docs share a topic") {
    val assign = TextOps.docTopics(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // every tokenized doc gets exactly one topic
    assert(assign.keySet == docs.filter(_._2.trim.nonEmpty).map(_._1).toSet)
    assert(assign.values.toSet.size > 1) // not one degenerate cluster
    // identical term vectors → identical distances → identical topic
    docs.groupBy(_._2).values.filter(_.size > 1).foreach { dup =>
      assert(dup.map(d => assign(d._1)).toSet.size == 1)
    }
  }

  test("crossDedup: exact wins over near, near needs Jaccard, unique keeps") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftxd").toString
    val base = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val rainbow = "red orange yellow green blue indigo violet amber teal " +
      "cyan magenta maroon olive navy coral pearl slate bronze copper gold"
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "old"),
      (1L, base, "old"),
      (10L, base, "old"),                    // second exact twin: min id must win
      (2L, rainbow, "old"))
    val fresh = Seq(
      (100L, base, "new"),                   // exact twin of 1 AND 10 (and near) → exact, match 1
      (101L, rainbow.replace("gold", "silver"), "new"), // 1-token edit → near of 2
      (102L, "completely different content sharing nothing with anything else", "new"))
    (corpus ++ fresh).map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.crossDedup(spark, dir, newSource = "new").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(
      100L -> (("exact", 1L)),
      101L -> (("near", 2L)),
      102L -> (("keep", -1L))))
  }

  test("minhashCalibration: identical docs estimate 1.0, estimator invariants hold") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextOps.minhashCalibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, m, est, j) =>
      assert(a < b && m >= 0 && m <= 8)
      assert(est == m / 8.0)
      assert(j >= 0.0 && j <= 1.0)
      // identical shingle sets give identical signatures: exact J = 1
      // must be estimated perfectly (the converse may not hold)
      if (j == 1.0) assert(m == 8L, s"pair ($a,$b) J=1 but matches=$m")
    }
    // the corpus ships exact duplicates — at least one perfect pair
    assert(rows.exists { case (_, _, m, _, j) => m == 8L && j == 1.0 })
  }

  test("simhashCalibration: invariants, perfect pairs, Charikar mapping on real near-dups") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextOps.simhashCalibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, h, agree, cos) =>
      assert(a < b && h >= 0 && h <= 60)
      assert(agree == (60 - h) / 60.0)
      assert(cos >= 0.0 && cos <= 1.0 + 1e-12)
      // identical shingle sets vote identically: cos = 1 forces hamming 0
      if (cos >= 1.0 - 1e-12) assert(h == 0, s"pair ($a,$b) cos=1 but hamming=$h")
    }
    // the corpus ships exact duplicates — at least one perfect pair
    assert(rows.exists { case (_, _, h, _, cos) => h == 0 && cos >= 1.0 - 1e-12 })
    // every simhashPairs survivor appears with the same hamming (the
    // calibration relation is the UNCAPPED candidate set)
    val capped = TextOps.simhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val byPair = rows.map { case (a, b, h, _, _) => (a, b) -> h }.toMap
    capped.foreach { case (p, h) =>
      assert(byPair.get(p).contains(h), s"pair $p missing or hamming differs")
    }
    // Charikar mapping on genuinely similar candidates: bit agreement
    // tracks 1 - acos(cos)/pi within estimator noise (60 bits => the
    // binomial std dev is ~0.065 at p=0.5; use a generous band and
    // only assert where the relation is meaningful)
    val similar = rows.filter(_._5 >= 0.8)
    assert(similar.nonEmpty)
    similar.foreach { case (a, b, _, agree, cos) =>
      val predicted = 1.0 - math.acos(math.min(cos, 1.0)) / math.Pi
      assert(math.abs(agree - predicted) <= 0.25,
        s"pair ($a,$b): agree=$agree predicted=$predicted cos=$cos")
    }
  }

  test("jaccardPlanReport agrees with the chooser and its volume invariants") {
    val sf = "/root/testdata/sf0.001"
    val r = TextOps.jaccardPlanReport(spark, sf).collect().head
    val (nDocs, vocab, rows, direct, pf) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nDocs > 0 && vocab > 0 && rows >= vocab)
    // the prefix relation is a subset of the postings: its candidate
    // volume can never exceed the direct join's
    assert(pf <= direct)
    assert(r.getLong(5) == (vocab + 63) / 64)
    // the report's CASE must reproduce the Scala chooser's pick
    val expected = TextOps.chosenStrategy(spark, sf) match {
      case TextOps.BitmapAllPairs => "bitmap"
      case TextOps.PrefixFiltered => "prefix"
      case TextOps.DirectInverted => "direct"
    }
    assert(r.getString(6) == expected)
  }
}
