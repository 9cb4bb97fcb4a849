package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Corpus

/** Corpus curation operators: TF-IDF ranking on a hand-checked corpus,
  * CDC chunk re-synchronization under prefix insertion (the property
  * that makes content-defined chunking a sub-document dedup tool), and
  * PII scrub counts/redaction on crafted text. */
class CorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftcorpus").toString
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("tokenFreqHist conserves token instances and vocabulary size") {
    val sf = "/root/testdata/sf0.001"
    val hist = Corpus.tokenFreqHist(spark, sf).collect()
      .map(r => (r.getAs[Long]("occurrences"), r.getAs[Long]("n_tokens")))
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .filter(length(col("t")) > 0)
    val nInstances = toks.count()
    val nVocab = toks.distinct().count()
    // Σ occ·n_tokens = every token instance; Σ n_tokens = the vocabulary
    assert(hist.map { case (o, n) => o * n }.sum == nInstances)
    assert(hist.map(_._2).sum == nVocab)
    assert(hist.map(_._1).distinct.length == hist.length)
  }

  test("pmiBigrams: collocated pair scores over independent pair, exact ratio") {
    // "ice cream" always collocates; "milk" and "tea" co-occur only by
    // chance next to fillers. PMI(ice,cream) = c_xy*N^2/(B*c_x*c_y).
    val dir = docsDir(Seq(
      (0L, "ice cream milk a tea b ice cream a milk"),
      (1L, "tea a ice cream b milk a b tea a"),
      (2L, "ice cream a b milk tea a ice cream b")))
    val rows = Corpus.pmiBigrams(spark, dir, k = 5, minCount = 2).collect()
      .map(r => (r.getAs[String]("bigram"), r.getAs[Long]("c_xy"),
        r.getAs[Double]("pmi_ratio")))
    val ic = rows.find(_._1 == "ice cream").get
    // hand counts: c_xy=5, c_ice=5, c_cream=5, N=30 tokens, B=27 bigrams
    assert(ic._2 == 5L)
    assert(ic._3 == (5.0 * 30 * 30) / (27.0 * 5 * 5))
    // the perfect collocation outranks every other surviving bigram
    assert(rows.forall(r => r._1 == "ice cream" || r._3 <= ic._3))
  }

  test("mix report and dup rate agree with independent totals") {
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val mix = Corpus.sourceMixReport(spark, sf).collect()
    assert(mix.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // duplicate totals across sources == corpus docs - distinct contents
    val dup = Corpus.dupRateBySource(spark, sf).collect()
    val nDistinct = docs.select(sha2(col("text"), 256)).distinct().count()
    assert(dup.map(_.getAs[Long]("n_dups")).sum == docs.count() - nDistinct)
    dup.foreach { r =>
      val rate = r.getAs[Double]("dup_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(rate == r.getAs[Long]("n_dups").toDouble / r.getAs[Long]("n_docs"))
    }
  }

  test("tfidfTopK ranks a doc-specific term above corpus-wide terms") {
    // "apple" appears in all 3 docs (df=3); "zebra" only in doc 0 (df=1).
    // doc 0: tf(zebra)=2 -> score 2*3/1=6; tf(apple)=1 -> 1*3/3=1.
    val dir = docsDir(Seq(
      (0L, "apple zebra zebra"),
      (1L, "apple pear pear"),
      (2L, "apple plum")))
    val top = Corpus.tfidfTopK(spark, dir, k = 1)
      .select("doc_id", "term", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(top == Set((0L, "zebra", 6.0), (1L, "pear", 6.0), (2L, "plum", 3.0)))
  }

  test("tfidfTopK under a hot stopword: exact answers, no per-term window, one scan") {
    // 500 docs ALL containing "the" (df=500 — the skew key), each with a
    // unique term; the round-5 plan put all 500 (doc,"the") rows through
    // ONE window-partition task — the round-6 plan must carry df through
    // a map-side-combined aggregate + join instead
    val dir = docsDir((0L until 500L).map(i => (i, s"the term$i term$i")))
    val q = Corpus.tfidfTopK(spark, dir, k = 1)
    val got = q.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
        r.getAs[Long]("tf"), r.getAs[Long]("df"))).toSet
    // unique term wins every doc: tf=2, df=1, score 2*500/1
    assert(got == (0L until 500L).map(i => (i, s"term$i", 2L, 1L)).toSet)
    val plan = q.queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("doc_id")),
      s"per-term window leaked back into the plan:\n${windows.mkString("\n")}")
    assert(plan.contains("ReusedExchange"), "tokenization scan no longer shared")
  }

  test("cdcChunks: identical docs share all chunk hashes; prefix insertion re-syncs") {
    val body = (1 to 60).map(i => s"w$i").mkString(" ")
    val dir = docsDir(Seq(
      (0L, body),
      (1L, body), // exact duplicate: every chunk shared
      (2L, "intro tokens added here " + body))) // shifted copy: interior chunks re-sync
    val chunks = Corpus.cdcChunks(spark, dir)
      .select("doc_id", "chunk_id", "chunk_hash", "n_tokens").collect()
    def hashes(id: Long) = chunks.filter(_.getLong(0) == id).map(_.getLong(2)).toSet
    assert(hashes(0L) == hashes(1L), "exact duplicate must chunk identically")
    // content-defined boundaries re-synchronize after the first boundary
    // inside the shared body, so doc 2 shares most interior chunks
    val shared = hashes(0L).intersect(hashes(2L))
    assert(shared.nonEmpty, "shifted copy must still share interior chunks")
    // per-doc token counts must partition the document exactly
    val tokSum = chunks.filter(_.getLong(0) == 0L).map(_.getLong(3)).sum
    assert(tokSum == 60L)
    // dup_count: chunks shared by docs 0 and 1 appear >= 2 times
    val dup = Corpus.cdcChunks(spark, dir)
      .filter(col("doc_id") === 0L).select("dup_count").collect().map(_.getLong(0))
    assert(dup.forall(_ >= 2L))
  }

  test("chunkDocuments: stride/overlap cover every token, trailing chunk short") {
    // doc 0: 100 tokens with size=10, overlap=2 → stride 8,
    // nchunks = ceil(98/8) = 13; doc 1 fits one chunk; doc 2 is the
    // n = size boundary (exactly one chunk, no overlap-only trailer)
    val dir = docsDir(Seq(
      (0L, (1 to 100).map(i => s"w$i").mkString(" ")),
      (1L, "a b c"),
      (2L, (1 to 10).map(i => s"v$i").mkString(" "))))
    val rows = Corpus.chunkDocuments(spark, dir, size = 10, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val d0 = rows.filter(_._1 == 0L).sortBy(_._2)
    assert(d0.length == 13)
    assert(d0.map(_._3).toSeq == (0 until 13).map(_ * 8L))
    assert(d0.dropRight(1).forall(_._4 == 10L) && d0.last._4 == 4L) // 96..100
    // full coverage: every token index falls in some chunk
    val covered = d0.flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered == (0L until 100L).toSet)
    assert(rows.filter(_._1 == 1L).toSeq == Seq((1L, 0L, 0L, 3L)))
    assert(rows.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 10L)))
    // identical windows hash identically: doc 0 chunk 0 vs a fresh doc
    // with the same first 10 tokens
    val dir2 = docsDir(Seq((7L, (1 to 10).map(i => s"w$i").mkString(" "))))
    val h7 = Corpus.chunkDocuments(spark, dir2, size = 10, overlap = 2)
      .collect().head.getLong(4)
    val h0 = Corpus.chunkDocuments(spark, dir, size = 10, overlap = 2)
      .filter(col("chunk_id") === 0L && col("doc_id") === 0L)
      .collect().head.getLong(4)
    assert(h7 == h0)
  }

  test("corpusCoverage flags a re-crawled doc as redundant, novel content as not") {
    import spark.implicits._
    val seenText = (1 to 30).map(i => s"w$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graftcov").toString
    Seq(
      (0L, seenText, "en", "src0", seenText.length.toLong), // new: exact re-crawl
      (1L, (1 to 30).map(i => s"z$i").mkString(" "), "en", "src1", 0L), // new: novel
      (2L, seenText, "en", "src9", seenText.length.toLong)) // seen corpus
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Corpus.corpusCoverage(spark, dir)
      .select("doc_id", "coverage", "redundant").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).sortBy(_._1)
    assert(got(0) == ((0L, 1.0, true)), s"re-crawl must be fully covered: ${got(0)}")
    assert(got(1) == ((1L, 0.0, false)), s"novel doc must be uncovered: ${got(1)}")
    assert(got.length == 2, "seen-corpus docs are not scored")
  }

  test("ngramNovelty: fresh content 1.0, exact copy 0.0, partial overlap exact ratio") {
    val dir = docsDir(Seq(
      (0L, "a b c d"),        // shingles {abc, bcd} — all first-seen here
      (1L, "a b c d"),        // exact copy: 0 novel
      (2L, "a b c x y z"),    // {abc, bcx, cxy, xyz}: abc seen, 3 of 4 novel
      (3L, "q r")))           // < 3 tokens: no shingles, absent
    val got = Corpus.ngramNovelty(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"),
          r.getAs[Long]("n_shared"), r.getAs[Double]("novelty")))).toMap
    // doc0 {abc(df3), bcd(df2)}: both novel, both shared
    // doc1 exact copy: 0 novel, both shared
    // doc2 {abc(df3), bcx, cxy, xyz}: 3 novel, 1 shared
    assert(got == Map(
      0L -> (2L, 2L, 2L, 1.0),
      1L -> (2L, 0L, 2L, 0.0),
      2L -> (4L, 3L, 1L, 0.75)))
    // plan shape: no window anywhere (first-seen is a groupBy, not
    // min() OVER (PARTITION BY shingle) — the skew-wall form), and the
    // distinct (doc, shingle) exchange is shared — one tokenization scan
    val q = Corpus.ngramNovelty(spark, dir)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition"))
    assert(plan.contains("ReusedExchange"))
  }

  test("corpusCoverage omits shingle-less (<3-token) docs, matching the oracle") {
    val dir = docsDir(Seq(
      (0L, "only two"), // new batch, no 3-gram shingles
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")))) // seen corpus
      // doc 0 is src0 (new), doc 1 is src1... docsDir uses source "s";
      // with no seen-side split both docs land in "new" → rebuild below
    import spark.implicits._
    Seq((0L, "only two", "en", "src0", 8L),
        (1L, (1 to 10).map(i => s"w$i").mkString(" "), "en", "src9", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Corpus.corpusCoverage(spark, dir).collect()
    assert(got.isEmpty, s"a 2-token doc has no 3-gram shingles to score: ${got.toSeq}")
  }

  test("attributionAsof: at-or-before click per purchase, ties click-first, no-click null") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftasof").toString
    def ev(id: Long, us: Long, u: Long, t: String) =
      (id, new java.sql.Timestamp(us / 1000), u, t, 0.0, "{}")
    // user 1: click@10s, purchase@20s (attributed to 10s), click@30s,
    //         purchase@30s (TIE: attributed to the same-instant click)
    // user 2: purchase@5s with no prior click -> null
    Seq(ev(0, 10000000L, 1, "click"), ev(1, 20000000L, 1, "purchase"),
        ev(2, 30000000L, 1, "click"), ev(3, 30000000L, 1, "purchase"),
        ev(4, 5000000L, 2, "purchase"), ev(5, 6000000L, 2, "view"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Stateful.attributionAsof(spark, dir)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, Some(10000000L), Some(10000000L)),
      (3L, Some(30000000L), Some(0L)),
      (4L, None, None)))
  }

  test("piiScrubOn counts and redacts emails, IPs, phone numbers") {
    import spark.implicits._
    val rows = Seq(
      (1L, "contact bob.smith+x@corp.example.org from 192.168.0.17 or +1-650-555-0199 now"),
      (2L, "no pii here at all"))
      .toDF("id", "text")
    val got = Corpus.piiScrubOn(rows, "id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(_._1)
    assert(got(0) == ((1L, 1L, 1L, 1L,
      "contact <EMAIL> from <IP> or <PHONE> now")))
    assert(got(1) == ((2L, 0L, 0L, 0L, "no pii here at all")))
  }

  test("pii_scrub driver query: error events carry exactly one extra IP") {
    val sf = "/root/testdata/sf0.001"
    val out = Corpus.piiScrub(spark, sf)
    val byIps = out.groupBy("n_ips").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byIps.keySet == Set(1L, 2L), s"expected ip counts {1,2}, got $byIps")
    assert(out.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1).count() == 0)
    assert(out.filter(col("redacted").contains("@")).count() == 0)
  }

  test("source_overlap counts shared content fingerprints per source pair") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta"
    val dir = java.nio.file.Files.createTempDirectory("graftoverlap").toString
    Seq(
      (0L, shared, "A"),                      // identical doc in A and B
      (1L, shared, "B"),
      (2L, s"$shared extra trailing words", "B"), // near-dup may collide too
      (3L, "one two three four five six", "C"),   // C shares nothing
      (4L, "seven eight nine ten eleven twelve", "A"))
      .map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Corpus.sourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // identical docs always share the fingerprint: (A,B) >= 1; C never pairs
    assert(got.getOrElse(("A", "B"), 0L) >= 1L)
    assert(!got.keys.exists { case (a, b) => a == "C" || b == "C" })
  }

  test("lmBigramScore: micro-averaged conditional probability, hand counts") {
    // corpus bigrams: (a,b):3, (b,a):1, (b,c):1; contexts c(a,.)=3, c(b,.)=2
    val dir = docsDir(Seq(
      (0L, "a b a b"),
      (1L, "a b c"),
      (2L, "x")))
    val rows = Corpus.lmBigramScore(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("hit_mass"),
          r.getAs[Long]("ctx_mass"), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toMap
    // doc 0: positions (a,b)+(b,a)+(a,b) -> hits 3+1+3=7 over ctx 3+2+3=8
    assert(rows(0L) == ((3L, 7L, 8L, Some(7.0 / 8.0))))
    // doc 1: (a,b)+(b,c) -> hits 3+1=4 over ctx 3+2=5
    assert(rows(1L) == ((2L, 4L, 5L, Some(4.0 / 5.0))))
    // doc 2: <2 tokens -> zero masses, NULL score, but the row survives
    assert(rows(2L) == ((0L, 0L, 0L, None)))
  }

  test("vocabGrowth: cumulative docs/tokens/types and first-seen buckets") {
    // maxp1=4, nBuckets=2: docs 0,1 -> bucket 0; docs 2,3 -> bucket 1
    val dir = docsDir(Seq(
      (0L, "a b"),
      (1L, "a c"),
      (2L, "a d"),
      (3L, "b e f")))
    val rows = Corpus.vocabGrowth(spark, dir, nBuckets = 2).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("docs_cum"), r.getAs[Long]("tokens_cum"),
          r.getAs[Long]("types_cum"), r.getAs[Double]("ttr")))
      .toMap
    // bucket 0 introduces {a,b,c}; bucket 1 adds {d,e,f} (b is NOT new)
    assert(rows(0L) == ((2L, 4L, 3L, 3.0 / 4.0)))
    assert(rows(1L) == ((4L, 9L, 6L, 6.0 / 9.0)))
  }

  test("oovRate: sub-cutoff tokens count as OOV, exact per-doc ratios") {
    // counts: common x5 (in-vocab at minCount=3), both x3 (in), rare x1/x2 (out)
    val dir = docsDir(Seq(
      (0L, "common common common both rare1"),
      (1L, "common common both both rare2 rare2"),
      (2L, "")))
    val rows = Corpus.oovRate(spark, dir, minCount = 3L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(rows(0L) == ((5L, 1L, Some(1.0 / 5.0))))
    assert(rows(1L) == ((6L, 2L, Some(2.0 / 6.0))))
    // empty doc: zero tokens, NULL rate, row survives
    assert(rows(2L) == ((0L, 0L, None)))
  }

  test("textrankKeywords: hub centrality, symmetry, damping floor, mass bound") {
    // star graph: hub adjacent to each of a b c (once each); x-y is an
    // isolated 2-cycle. Symmetric leaves a b c must tie exactly; the hub
    // (3 incident edges) must outrank every leaf.
    val dir = docsDir(Seq(
      (0L, "hub a"), (1L, "hub b"), (2L, "hub c"), (3L, "x y")))
    val got = Corpus.textrankKeywords(spark, dir, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set("hub", "a", "b", "c", "x", "y"))
    assert(Set(got("a"), got("b"), got("c")).size == 1)
    assert(got("hub") > got("a") && got("hub") > got("x"))
    // x and y each give their whole (damped) rank to the other: the
    // 2-cycle fixed point is SCALE (up to floor-division dust)
    assert(got("x") == got("y"))
    assert(math.abs(got("x") - Corpus.RankScale) <= 2)
    // every node holds at least the damping base; total rank never
    // exceeds the injected mass |V|·SCALE (floor division only loses)
    assert(got.values.forall(_ >= Corpus.RankBase))
    assert(got.values.sum <= got.size * Corpus.RankScale)
  }

  test("textrankKeywords is deterministic and k-bounded on real documents") {
    val sf = "/root/testdata/sf0.001"
    val a = Corpus.textrankKeywords(spark, sf, k = 15).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val b = Corpus.textrankKeywords(spark, sf, k = 15).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq && a.length == 15)
    // ranks are sorted desc, ties broken by token asc
    assert(a.toSeq == a.sortBy { case (t, r) => (-r, t) }.toSeq)
  }

  test("textrankKeywords: 100 deep rounds complete under the checkpoint guard, values invariant") {
    val dir = docsDir(Seq(
      (0L, "hub a hub b hub c a b"), (1L, "x y x z y z hub a"),
      (2L, "a b c x y z hub hub")))
    // invariance: a run that rebases every 7 rounds equals one that
    // never checkpoints (lineage cut, values untouched)
    def rowsOf(iters: Int, every: Int) =
      Corpus.textrankKeywords(spark, dir, k = 10, iters = iters,
        checkpointEvery = every)
    assert(rowsOf(25, 7).collect().toSeq == rowsOf(25, 1000).collect().toSeq)
    // deep iteration: 100 rounds with the DEFAULT guard completes and
    // keeps plan depth flat — the final frame roots at the last rebase,
    // so it carries at most Checkpoints.Every rounds of joins (+ the
    // adjacency build), not all 100
    val deep = rowsOf(100, graft.Checkpoints.Every)
    val joinCount = deep.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.size
    assert(joinCount <= 2 * graft.Checkpoints.Every, s"plan carries $joinCount joins")
    val got = deep.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // PageRank invariants still hold at the deep fixed point
    assert(got.values.forall(_ >= Corpus.RankBase))
    assert(got("hub") == got.values.max)
  }
}
