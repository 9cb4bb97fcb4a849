package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ColumnFunctions.{hash64, HashPrime}
import graft.sources.Tables

/** Training-data curation operators over the `documents` table — the
  * steps between "raw corpus" and "pretraining batches" that a 100 TB
  * pipeline runs after dedup (builder brief: first-class alongside
  * SURVEY §2): heuristic quality filtering, deterministic stratified
  * sampling for data mixing, and sharded concat-then-chunk sequence
  * packing. All three are exact, hash-seeded (replayable), and
  * oracle-expressible; none shuffles more than once.
  */
object DataPipeline {

  /** Shared tokenizer — ONE definition for all parity-critical ops. */
  private def toksExpr = TextOps.toksExpr
  private val stopwords = Seq("the", "a", "of", "and", "is", "to", "in")

  // ---- heuristic quality filter (C4/Gopher-style rules) ---------------

  /** Rule-based quality filter: per-document keep/drop with the FIRST
    * failing rule as the reason (C4-style: length bounds, mean token
    * length bounds, symbol ratio, stopword evidence). Pure per-row
    * expressions — zero shuffle, embarrassingly parallel at any scale;
    * the filter composes with every downstream operator as a plain
    * `.filter(keep)`. */
  def qualityFilter(spark: SparkSession, d: String,
                    minTokens: Int = 5, maxTokens: Int = 10000,
                    minAvgTokLen: Double = 2.0, maxAvgTokLen: Double = 12.0,
                    maxSymbolRatio: Double = 0.3): DataFrame = {
    val stopArr = array(stopwords.map(lit): _*)
    Tables.documents(spark, d)
      .withColumn("toks", expr(toksExpr))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("avg_tok_len",
        length(regexp_replace(col("text"), "\\s+", "")).cast("double") / col("n_tokens"))
      .withColumn("symbol_ratio",
        (length(col("text")) - length(regexp_replace(col("text"), "[^A-Za-z0-9\\s]", "")))
          .cast("double") / length(col("text")))
      .withColumn("has_stopword",
        size(filter(col("toks"), t => array_contains(stopArr, t))) > 0)
      .select(col("doc_id"), col("n_tokens"),
        when(col("n_tokens") < minTokens, "too_short")
          .when(col("n_tokens") > maxTokens, "too_long")
          .when(col("avg_tok_len") < minAvgTokLen, "avg_tok_len_low")
          .when(col("avg_tok_len") > maxAvgTokLen, "avg_tok_len_high")
          .when(col("symbol_ratio") > maxSymbolRatio, "symbol_heavy")
          .when(!col("has_stopword"), "no_stopwords")
          .otherwise("keep").as("verdict"))
      .withColumn("keep", col("verdict") === "keep")
  }

  def qualityFilterSql(minTokens: Int = 5, maxTokens: Int = 10000,
                       minAvgTokLen: Double = 2.0, maxAvgTokLen: Double = 12.0,
                       maxSymbolRatio: Double = 0.3): String = {
    val stops = stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents
       |), m AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
       |      / len(toks) AS avg_tok_len,
       |    CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g'))
       |      AS DOUBLE) / length(text) AS symbol_ratio,
       |    len(list_filter(toks, t -> t IN ($stops))) > 0 AS has_stopword
       |  FROM t
       |)
       |SELECT doc_id, n_tokens,
       |  CASE WHEN n_tokens < $minTokens THEN 'too_short'
       |       WHEN n_tokens > $maxTokens THEN 'too_long'
       |       WHEN avg_tok_len < $minAvgTokLen THEN 'avg_tok_len_low'
       |       WHEN avg_tok_len > $maxAvgTokLen THEN 'avg_tok_len_high'
       |       WHEN symbol_ratio > $maxSymbolRatio THEN 'symbol_heavy'
       |       WHEN NOT has_stopword THEN 'no_stopwords'
       |       ELSE 'keep' END AS verdict,
       |  CASE WHEN n_tokens < $minTokens THEN false
       |       WHEN n_tokens > $maxTokens THEN false
       |       WHEN avg_tok_len < $minAvgTokLen THEN false
       |       WHEN avg_tok_len > $maxAvgTokLen THEN false
       |       WHEN symbol_ratio > $maxSymbolRatio THEN false
       |       WHEN NOT has_stopword THEN false
       |       ELSE true END AS keep
       |FROM m""".stripMargin
  }

  /** Per-source quality scorecard — [[qualityFilter]]'s verdicts rolled
    * up by crawl source: document count, pass count, pass rate, and the
    * dominant failure reason (max count, reason-string tie-break) per
    * source. THE report a crawl-ops team reads to decide which feeds to
    * keep, re-fetch, or drop. Verdicts stay per-row expressions; the
    * rollup is two map-side-combined aggregates over (source) and
    * (source, verdict) plus a WindowGroupLimit pick of the top failure
    * — no joins wider than the 20-row source sliver. */
  def sourceQuality(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = qualityFilter(spark, d)
      .join(Tables.documents(spark, d).select(col("doc_id"), col("source")), "doc_id")
    val bySrc = v.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      count(when(col("keep"), lit(1))).as("n_pass"))
    val fails = v.filter(!col("keep"))
      .groupBy("source", "verdict").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("source")).orderBy(col("n").desc, col("verdict"))
    val topFail = fails.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("source"), col("verdict").as("top_reject_reason"))
    bySrc.join(topFail, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_pass"),
        (col("n_pass").cast("double") / col("n_docs").cast("double")).as("pass_rate"),
        coalesce(col("top_reject_reason"), lit("none")).as("top_reject_reason"))
  }

  def sourceQualitySql(): String =
    s"""WITH q AS (
       |${qualityFilterSql()}
       |), v AS (
       |  SELECT q.doc_id, q.keep, q.verdict, d.source
       |  FROM q JOIN documents d ON d.doc_id = q.doc_id
       |), by_src AS (
       |  SELECT source, count(*) AS n_docs,
       |         count(CASE WHEN keep THEN 1 END) AS n_pass
       |  FROM v GROUP BY 1
       |), top_fail AS (
       |  SELECT source, verdict AS top_reject_reason FROM (
       |    SELECT source, verdict, row_number() OVER (
       |      PARTITION BY source ORDER BY count(*) DESC, verdict) AS rn
       |    FROM v WHERE NOT keep GROUP BY source, verdict
       |  ) WHERE rn = 1
       |)
       |SELECT b.source, b.n_docs, b.n_pass,
       |       CAST(b.n_pass AS DOUBLE) / b.n_docs AS pass_rate,
       |       coalesce(t.top_reject_reason, 'none') AS top_reject_reason
       |FROM by_src b LEFT JOIN top_fail t ON t.source = b.source""".stripMargin

  // ---- deterministic stratified sampling (data mixing) ----------------

  /** Per-stratum deterministic sampling — the data-mixing step: keep a
    * document iff its portable hash falls under the stratum's
    * fraction. Seeded and replayable (same corpus + seed ⇒ same
    * sample, on any cluster size); unsampled strata pass through with
    * fraction 1.0. Pure per-row filter — no shuffle, no state; at
    * 100 TB this is a pushed-down predicate on the scan. */
  /** Fraction → integer hash threshold, computed ONCE driver-side with
    * exact BigDecimal arithmetic and inlined into both the Spark plan
    * and the oracle SQL — the keep decision is then a pure BIGINT
    * compare with zero cross-engine rounding surface. */
  private def thresholds(fractions: Map[String, Double]): Map[String, Long] =
    fractions.map { case (l, f) =>
      require(f >= 0.0 && f <= 1.0, s"fraction for '$l' must be in [0,1]")
      l -> (BigDecimal(f) * BigDecimal(HashPrime)).toLong
    }

  def stratifiedSample(spark: SparkSession, d: String,
                       fractions: Map[String, Double],
                       seed: Int = 0): DataFrame = {
    val thr = thresholds(fractions).foldLeft(lit(HashPrime)) {
      case (acc, (lang, t)) => when(col("lang") === lang, lit(t)).otherwise(acc)
    }
    Tables.documents(spark, d)
      .filter(hash64(col("doc_id"), seed) < thr)
      .select(col("doc_id"), col("lang"))
  }

  def stratifiedSampleSql(fractions: Map[String, Double], seed: Int = 0): String = {
    val cases = thresholds(fractions)
      .map { case (l, t) => s"WHEN lang = '$l' THEN $t" }.mkString(" ")
    s"""SELECT doc_id, lang FROM documents
       |WHERE (md5_number_lower('$seed:' || doc_id) % ${HashPrime}::UBIGINT)::BIGINT
       |    < (CASE $cases ELSE ${HashPrime} END)""".stripMargin
  }

  // ---- temperature mixture sampling (α-weighted source rebalance) -----

  /** Temperature-based source mixture sampling — the multilingual-LM
    * data-mix step (public technique: α-smoothed sampling from
    * multilingual BERT / Lample & Conneau, "Cross-lingual Language
    * Model Pretraining", NeurIPS'19): sample sources with probability
    * ∝ countᵅ instead of ∝ count, so low-resource sources are
    * up-weighted relative to their share. α is FIXED at 0.5 and
    * realized as the INTEGER weight w_s = ⌊√c_s⌋: a general α needs
    * pow(), whose last-ulp behavior is libm-specific and would poison
    * cross-engine hash parity; √ is IEEE correctly-rounded in both
    * engines and the floor makes everything after it exact integer
    * arithmetic. The target sample size T = ⌊tFrac·N⌋ is allocated as
    * t_s = ⌊T·w_s / Σw⌋ docs per source, and a document is kept iff
    * hash(doc_id)·c_s < p·t_s — the keep-fraction compare t_s/c_s
    * CROSS-MULTIPLIED into exact integer form (decimal on the Spark
    * side, HUGEINT in DuckDB), so there is no division and no float
    * rounding surface anywhere; t_s ≥ c_s degenerates to keep-all,
    * giving min(1, ·) for free.
    *
    * Scale: the allocation table is one map-side-combined groupBy over
    * the source column (a pruned one-column scan) collapsed to
    * |sources| rows; the sample itself is a broadcast join of that
    * sliver onto the corpus scan plus a pure per-row hash filter — no
    * full-data shuffle at any point. Deterministic and replayable:
    * same corpus + seed ⇒ same sample on any cluster. */
  def mixtureSample(spark: SparkSession, d: String, tFrac: Double = 0.3,
                    seed: Int = 2): DataFrame = {
    require(tFrac >= 0.0 && tFrac <= 1.0, "tFrac must be in [0,1]")
    val docs = Tables.documents(spark, d)
    val counts = docs.groupBy("source").agg(count(lit(1)).as("c_s"))
      .withColumn("w_s", floor(sqrt(col("c_s").cast("double"))).cast("long"))
    val tot = counts.agg(sum(col("w_s")).as("sum_w"), sum(col("c_s")).as("n_docs"))
    val alloc = counts.crossJoin(broadcast(tot))
      .withColumn("t_s", expr(
        s"(CAST(floor($tFrac * n_docs) AS BIGINT) * w_s) DIV sum_w"))
      .select(col("source"), col("c_s"), col("t_s"))
    docs.join(broadcast(alloc), "source")
      .filter(hash64(col("doc_id"), seed).cast("decimal(20,0)")
          * col("c_s").cast("decimal(12,0)")
        < lit(HashPrime).cast("decimal(20,0)") * col("t_s").cast("decimal(12,0)"))
      .select(col("doc_id"), col("source"))
  }

  def mixtureSampleSql(tFrac: Double = 0.3, seed: Int = 2): String =
    s"""WITH c AS (
       |  SELECT source, count(*) AS c_s,
       |         CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS w_s
       |  FROM documents GROUP BY 1
       |), tot AS (
       |  SELECT CAST(sum(w_s) AS BIGINT) AS sum_w,
       |         CAST(sum(c_s) AS BIGINT) AS n_docs
       |  FROM c
       |), a AS (
       |  SELECT source, c_s,
       |         (CAST(floor($tFrac * n_docs) AS BIGINT) * w_s) // sum_w AS t_s
       |  FROM c, tot
       |)
       |SELECT d.doc_id, d.source
       |FROM documents d JOIN a ON d.source = a.source
       |WHERE ((md5_number_lower('$seed:' || d.doc_id)
       |        % ${HashPrime}::UBIGINT)::HUGEINT) * a.c_s
       |    < ${HashPrime}::HUGEINT * a.t_s""".stripMargin

  /** Per-document IMPORTANCE sampling with inverse-probability
    * weights — the length/quality-weighted Bernoulli sampler a
    * curation mix uses to upweight valuable documents (public idiom:
    * Horvitz–Thompson inverse-probability weighting; deterministic
    * inclusion via the portable hash family, so the sample is
    * replayable and oracle-checkable). Each document's inclusion
    * probability p = rate · w with the saturating length weight
    * w = n_chars/(n_chars + 500) ∈ (0,1); include iff
    * hash64(doc_id)/P < p, and emit ipw = 1/p so any downstream sum
    * over the sample unbiasedly estimates the corpus sum.
    *
    * Determinism discipline: p uses only +,·,/ on exact integers
    * (correctly-rounded IEEE ops — bit-identical in any engine); the
    * decision compares CAST(h AS DOUBLE) (correctly-rounded long→
    * double, identical both sides) against p·P — no transcendentals,
    * no corpus-dependent normalizer whose FP sum order could flip a
    * boundary row. Scale shape: one scan, zero shuffles — the filter
    * and projections are all row-local codegen. */
  def importanceSample(spark: SparkSession, d: String, rate: Double = 0.6,
                       seed: Int = 11): DataFrame = {
    require(rate > 0.0 && rate <= 1.0, "rate must be in (0,1]")
    val w = col("n_chars").cast("double") /
      (col("n_chars").cast("double") + lit(500.0))
    val p = least(lit(1.0), lit(rate) * w)
    Tables.documents(spark, d)
      .withColumn("p", p)
      .filter(hash64(col("doc_id"), seed).cast("double")
        < col("p") * lit(HashPrime.toDouble))
      .select(col("doc_id"), col("source"), col("n_chars"), col("p"),
        (lit(1.0) / col("p")).as("ipw"))
  }

  def importanceSampleSql(rate: Double = 0.6, seed: Int = 11): String =
    s"""SELECT doc_id, source, n_chars, p, 1.0/p AS ipw
       |FROM (
       |  SELECT doc_id, source, n_chars,
       |         least(1.0, $rate * (n_chars / (n_chars + 500.0))) AS p,
       |         (md5_number_lower('$seed:' || doc_id)
       |          % ${HashPrime}::UBIGINT)::BIGINT AS h
       |  FROM documents
       |)
       |WHERE CAST(h AS DOUBLE) < p * ${HashPrime}.0""".stripMargin

  // ---- deterministic train/val/test split -----------------------------

  /** Deterministic dataset split: each document lands in train / val /
    * test by its portable doc_id hash against exact integer thresholds
    * (the [[stratifiedSample]] BigDecimal recipe — no float compare
    * anywhere). Hash-based means the split is STABLE under corpus
    * growth: a document's assignment never changes when neighbors are
    * added or removed (contrast a row_number cut, which reshuffles
    * every run), and it is reproducible on any cluster size. Pure
    * per-row projection — zero shuffle, and a downstream
    * `filter(split = 'train')` is a pushed-down predicate. */
  def datasetSplit(spark: SparkSession, d: String, valFrac: Double = 0.01,
                   testFrac: Double = 0.01, seed: Int = 3): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac <= 1.0,
      "val/test fractions must be non-negative and sum to <= 1")
    val thrVal = (BigDecimal(valFrac) * BigDecimal(HashPrime)).toLong
    val thrTest = (BigDecimal(valFrac + testFrac) * BigDecimal(HashPrime)).toLong
    Tables.documents(spark, d)
      .withColumn("h", hash64(col("doc_id"), seed))
      .select(col("doc_id"), col("source"),
        when(col("h") < thrVal, "val")
          .when(col("h") < thrTest, "test")
          .otherwise("train").as("split"))
  }

  def datasetSplitSql(valFrac: Double = 0.01, testFrac: Double = 0.01,
                      seed: Int = 3): String = {
    val thrVal = (BigDecimal(valFrac) * BigDecimal(HashPrime)).toLong
    val thrTest = (BigDecimal(valFrac + testFrac) * BigDecimal(HashPrime)).toLong
    s"""SELECT doc_id, source,
       |  CASE WHEN h < $thrVal THEN 'val'
       |       WHEN h < $thrTest THEN 'test'
       |       ELSE 'train' END AS split
       |FROM (SELECT doc_id, source,
       |        (md5_number_lower('$seed:' || doc_id)
       |         % ${HashPrime}::UBIGINT)::BIGINT AS h
       |      FROM documents)""".stripMargin
  }

  /** Train→eval LEAKAGE audit over [[datasetSplit]]'s own assignment —
    * the check a split is not allowed to skip: for every val/test
    * document, how many of its distinct n-grams also occur anywhere in
    * the train split. A doc-level split is necessary but NOT sufficient
    * (near-duplicates and quoted passages leak content across splits
    * even when doc ids split cleanly); `leak_frac` near 1 marks an
    * eval doc whose content the model trains on anyway. Exact by
    * construction: eval grams shuffle-join the distinct train-gram
    * relation on gram.
    *
    * Scale: the EVAL side is the small one (valFrac+testFrac of the
    * corpus) — the join shuffles eval grams against train grams
    * co-partitioned on gram, with the train side's distinct collapsing
    * map-side; nothing broadcasts a corpus-sized relation. At 100 TB
    * the bloom prefilter ([[TextOps.contaminationBloom]]'s shape, with
    * train as the filter source) routes the bulk of CLEAN eval grams
    * around the exact join, which then runs on the flagged sliver. */
  def splitLeakage(spark: SparkSession, d: String, n: Int = 5,
                   valFrac: Double = 0.01, testFrac: Double = 0.01,
                   seed: Int = 3): DataFrame = {
    val split = datasetSplit(spark, d, valFrac, testFrac, seed)
      .select("doc_id", "split")
    val grams = Tables.documents(spark, d)
      .withColumn("toks", expr(toksExpr))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        explode(array_distinct(expr(TextOps.shinglesExpr(n)))).as("gram"))
      .join(split, "doc_id")
    val trainGrams = grams.filter(col("split") === "train")
      .select("gram").distinct().withColumn("leaked", lit(1L))
    grams.filter(col("split") =!= "train")
      .join(trainGrams, Seq("gram"), "left")
      .groupBy("split", "doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("leaked"), lit(0L))).as("n_leaked"))
      .withColumn("leak_frac",
        col("n_leaked").cast("double") / col("n_grams"))
  }

  def splitLeakageSql(n: Int = 5, valFrac: Double = 0.01,
                      testFrac: Double = 0.01, seed: Int = 3): String = {
    val thrVal = (BigDecimal(valFrac) * BigDecimal(HashPrime)).toLong
    val thrTest = (BigDecimal(valFrac + testFrac) * BigDecimal(HashPrime)).toLong
    val parts = (1 to n).map(j => if (j == 1) "toks[i]" else s"toks[i+${j - 1}]")
      .mkString(" || ' ' || ")
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |           FROM documents),
       |g AS (SELECT DISTINCT doc_id,
       |        unnest(list_transform(range(1, len(toks) - ${n - 2}),
       |               i -> $parts)) AS gram
       |      FROM t WHERE len(toks) >= $n),
       |s AS (SELECT doc_id,
       |        CASE WHEN h < $thrVal THEN 'val'
       |             WHEN h < $thrTest THEN 'test'
       |             ELSE 'train' END AS split
       |      FROM (SELECT doc_id,
       |              (md5_number_lower('$seed:' || doc_id)
       |               % ${HashPrime}::UBIGINT)::BIGINT AS h
       |            FROM documents)),
       |gg AS (SELECT g.doc_id, g.gram, s.split FROM g JOIN s USING (doc_id)),
       |tg AS (SELECT DISTINCT gram FROM gg WHERE split = 'train')
       |SELECT e.split, e.doc_id, count(*)::BIGINT AS n_grams,
       |       sum(CASE WHEN tg.gram IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
       |         AS n_leaked,
       |       sum(CASE WHEN tg.gram IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
       |         / count(*) AS leak_frac
       |FROM gg e LEFT JOIN tg ON tg.gram = e.gram
       |WHERE e.split <> 'train'
       |GROUP BY 1, 2""".stripMargin
  }

  // ---- sequence packing (concat-then-chunk, sharded) ------------------

  /** Concat-then-chunk sequence packing — the GPT-pretraining batching
    * step: documents are concatenated in a deterministic order and cut
    * into `budget`-token chunks; each document records the chunk its
    * first token lands in and its offset inside it. Sharded for scale:
    * the corpus is split into `nShards` hash-shards and the running
    * token count is per-shard, so the cumulative-sum window runs on
    * `nShards` independent partitions instead of one global ordered
    * partition — the difference between a parallel plan and a
    * single-partition bottleneck at 100 TB. Pack identity is
    * (shard, pack_id). */
  def packDocuments(spark: SparkSession, d: String, budget: Long = 2048,
                    nShards: Int = 32): DataFrame = {
    require(budget >= 1 && nShards >= 1, "budget and nShards must be >= 1")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, d)
      .withColumn("n_tokens", size(expr(toksExpr)).cast("long"))
      .withColumn("shard", pmod(hash64(col("doc_id"), 1), lit(nShards.toLong)))
      .withColumn("tokens_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        (col("tokens_before") / budget).cast("long").as("pack_id"),
        (col("tokens_before") % budget).as("offset"))
  }

  def packDocumentsSql(budget: Long = 2048, nShards: Int = 32): String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       |    (md5_number_lower('1:' || doc_id) % ${HashPrime}::UBIGINT)::BIGINT
       |      % $nShards AS shard
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, shard, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS tokens_before
       |  FROM t
       |)
       |SELECT doc_id, shard, n_tokens,
       |  CAST(tokens_before // $budget AS BIGINT) AS pack_id,
       |  CAST(tokens_before % $budget AS BIGINT) AS offset
       |FROM c""".stripMargin

  // ---- end-to-end curation pipeline -----------------------------------

  /** The whole curation flow as ONE query — per document, the final
    * keep/drop decision with its reason, applying the stages in cost
    * order exactly as a 100 TB run would:
    *
    *  1. quality gate ([[qualityFilter]], per-row, zero shuffle) — a
    *     failing doc drops with its first failing rule as the reason;
    *  2. exact dedup among quality survivors — non-keepers (lowest
    *     doc_id per sha-256 wins) drop as 'exact_dup';
    *  3. near-dup representative selection among the remaining docs —
    *     within each [[TextOps.neardupClusters]] cluster the longest
    *     survivor (tie: lowest doc_id) stays, the rest drop as
    *     'near_dup'.
    *
    * Cluster structure is content-based, so it is computed once on the
    * full corpus (the LSH-bounded pair stream); only REPRESENTATIVE
    * selection is restricted to stage-1/2 survivors — the kept doc is
    * always itself a quality-passing, exact-unique document. Every
    * stage joins on doc_id/hash/cluster keys: broadcastable slivers at
    * the tail, map-side-combined aggregates elsewhere. */
  def curationPipeline(spark: SparkSession, d: String,
                       threshold: Double = 0.5): DataFrame = {
    val q = qualityFilter(spark, d).select(col("doc_id"), col("verdict"))
    val hashed = Tables.documents(spark, d)
      .select(col("doc_id"), sha2(col("text"), 256).as("h"), col("n_chars"))
    val qKeep = q.filter(col("verdict") === "keep").select(col("doc_id"))
    val keepers = hashed.join(qKeep, "doc_id")
      .groupBy("h").agg(min(col("doc_id")).as("keeper"))
    val clusters = TextOps.neardupClusters(spark, d, threshold)
      .select(col("doc_id"), col("cluster_id"))
    val survivors = hashed.join(qKeep, "doc_id").join(keepers, "h")
      .filter(col("doc_id") === col("keeper"))
      .select(col("doc_id"), col("n_chars"))
    val reps = survivors.join(clusters, "doc_id")
      .withColumn("rn", row_number().over(Window.partitionBy(col("cluster_id"))
        .orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("rep"))
    q.join(hashed, "doc_id")
      .join(keepers, Seq("h"), "left")
      .join(clusters, "doc_id")
      .join(reps, Seq("cluster_id"), "left")
      .select(col("doc_id"),
        when(col("verdict") =!= "keep", col("verdict"))
          .when(col("doc_id") =!= col("keeper"), lit("exact_dup"))
          .when(col("doc_id") =!= col("rep"), lit("near_dup"))
          .otherwise(lit("kept")).as("decision"))
      .withColumn("kept", (col("decision") === "kept").cast("long"))
  }

  def curationPipelineSql(threshold: Double = 0.5): String =
    s"""WITH q AS (
       |  SELECT doc_id, verdict FROM (
       |${qualityFilterSql()}
       |  )
       |), hashed AS (
       |  SELECT doc_id, sha256(text) AS h, n_chars FROM documents
       |), keepers AS (
       |  SELECT h, min(hashed.doc_id) AS keeper
       |  FROM hashed JOIN q USING (doc_id)
       |  WHERE q.verdict = 'keep' GROUP BY h
       |), cl AS (
       |  SELECT doc_id, cluster_id FROM (
       |${TextOps.neardupClustersSql(threshold)}
       |  )
       |), survivors AS (
       |  SELECT hashed.doc_id, hashed.n_chars
       |  FROM hashed JOIN q USING (doc_id) JOIN keepers USING (h)
       |  WHERE q.verdict = 'keep' AND hashed.doc_id = keepers.keeper
       |), reps AS (
       |  SELECT cluster_id, doc_id AS rep FROM (
       |    SELECT c.cluster_id, s.doc_id,
       |           row_number() OVER (PARTITION BY c.cluster_id
       |                              ORDER BY s.n_chars DESC, s.doc_id) AS rn
       |    FROM survivors s JOIN cl c USING (doc_id)
       |  ) WHERE rn = 1
       |)
       |SELECT q.doc_id,
       |  CASE WHEN q.verdict <> 'keep' THEN q.verdict
       |       WHEN q.doc_id <> keepers.keeper THEN 'exact_dup'
       |       WHEN q.doc_id <> reps.rep THEN 'near_dup'
       |       ELSE 'kept' END AS decision,
       |  CAST(CASE WHEN q.verdict <> 'keep' THEN q.verdict
       |            WHEN q.doc_id <> keepers.keeper THEN 'exact_dup'
       |            WHEN q.doc_id <> reps.rep THEN 'near_dup'
       |            ELSE 'kept' END = 'kept' AS BIGINT) AS kept
       |FROM q
       |JOIN hashed USING (doc_id)
       |LEFT JOIN keepers USING (h)
       |JOIN cl USING (doc_id)
       |LEFT JOIN reps USING (cluster_id)""".stripMargin

  /** The curation FUNNEL summary — what each pipeline decision cost in
    * documents and tokens ("dedup bought X% of the token budget back"):
    * [[curationPipeline]]'s per-doc decisions rolled up to (decision,
    * n_docs, n_tokens), the headline numbers a run report / dataset
    * card quotes next to the mixing weights. Exact int64 counts.
    *
    * Scale: inherits the (session-memoized) pipeline lineage, adds one
    * tokenize scan for exact token counts, one doc_id join and a
    * ≤5-group map-side-combined fold — nothing corpus-ordered. */
  def curationReport(spark: SparkSession, d: String,
                     threshold: Double = 0.5): DataFrame = {
    val dec = curationPipeline(spark, d, threshold)
      .select(col("doc_id"), col("decision"))
    val toks = Tables.documents(spark, d).select(col("doc_id"),
      org.apache.spark.sql.functions.size(expr(graft.operators.TextOps.toksExpr))
        .cast("long").as("n_toks"))
    dec.join(toks, "doc_id")
      .groupBy("decision")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
  }

  def curationReportSql(threshold: Double = 0.5): String =
    s"""WITH cp AS (
       |  SELECT * FROM (
       |${curationPipelineSql(threshold)}
       |  )
       |), tk AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_toks
       |  FROM documents
       |)
       |SELECT cp.decision, count(*) AS n_docs,
       |       CAST(sum(tk.n_toks) AS BIGINT) AS n_tokens
       |FROM cp JOIN tk USING (doc_id) GROUP BY 1""".stripMargin

  // ---- dataset card (one-row corpus datasheet) ------------------------

  /** The one-row corpus DATASHEET — the numbers every dataset card /
    * mixing decision starts from (Gebru et al. 2021, "Datasheets for
    * Datasets" — public): document and token totals, distinct-content
    * count (→ exact-dup rate), vocabulary size, source/lang coverage,
    * length extremes, mean tokens per document. All counts exact
    * int64; the two ratios are single divisions of exact integers.
    *
    * Scale: two scans — one feeding a single multi-countDistinct
    * aggregate (Catalyst expands to the standard two-phase exact
    * distinct), one token explosion feeding an exact vocab count; the
    * 1-row results cross-join by broadcast. Nothing here is
    * corpus-ordered. */
  def datasetCard(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
      .withColumn("toks", Corpus.cleanToksExpr)
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("toks"))).as("n_tokens"),
      countDistinct(sha2(col("text"), 256)).as("n_unique_contents"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      min(col("n_chars")).as("min_chars"),
      max(col("n_chars")).as("max_chars"))
    val vocab = docs.select(explode(col("toks")).as("token"))
      .agg(countDistinct(col("token")).as("vocab_size"))
    base.crossJoin(broadcast(vocab))
      .select(col("n_docs"), col("n_tokens"), col("n_unique_contents"),
        col("vocab_size"), col("n_sources"), col("n_langs"),
        col("min_chars"), col("max_chars"),
        ((col("n_docs") - col("n_unique_contents")).cast("double") /
          col("n_docs").cast("double")).as("exact_dup_rate"),
        (col("n_tokens").cast("double") / col("n_docs").cast("double"))
          .as("mean_doc_tokens"))
  }

  def datasetCardSql(): String =
    """WITH t AS (
      |  SELECT doc_id, text, source, lang, n_chars,
      |         list_filter(string_split_regex(trim(text), '\s+'),
      |                     tok -> length(tok) > 0) AS toks
      |  FROM documents
      |), base AS (
      |  SELECT count(*) AS n_docs,
      |         CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
      |         count(DISTINCT sha256(text)) AS n_unique_contents,
      |         count(DISTINCT source) AS n_sources,
      |         count(DISTINCT lang) AS n_langs,
      |         min(n_chars) AS min_chars, max(n_chars) AS max_chars
      |  FROM t
      |), v AS (
      |  SELECT count(DISTINCT token) AS vocab_size
      |  FROM (SELECT unnest(toks) AS token FROM t)
      |)
      |SELECT n_docs, n_tokens, n_unique_contents, vocab_size,
      |       n_sources, n_langs, min_chars, max_chars,
      |       CAST(n_docs - n_unique_contents AS DOUBLE) / CAST(n_docs AS DOUBLE) AS exact_dup_rate,
      |       CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_doc_tokens
      |FROM base CROSS JOIN v""".stripMargin
}
