package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.ColumnFunctions.{hash64, HashPrime}

/** Text-pipeline operators over the `documents` table — the
  * training-data-preparation half of the engine (builder brief; SURVEY
  * §7 step 8): exact dedup, text statistics, language ID, document
  * fingerprinting, n-gram Jaccard near-dup pairs, MinHash-LSH fuzzy
  * dedup, and SimHash. Everything is engine-portable (md5-based hash
  * family, exact integer/decimal arithmetic) so the DuckDB oracle can
  * recompute results bit-for-bit.
  *
  * Scale shapes (the 100 TB lens):
  *   - dedupExact / textStats / langId / fingerprint / simhash: embar-
  *     rassingly parallel scans + one map-side-combined aggregation.
  *   - minhashLsh: the scale path for fuzzy dedup — candidates come
  *     from equality joins on (band, signature) buckets, never from the
  *     O(n²) all-pairs product; the exact-Jaccard verify runs only on
  *     candidates.
  *   - ngramJaccard: the exact form, with a statistics-driven choice
  *     between three exact strategies (bitmap all-pairs for dense
  *     small-vocab corpora, provably-lossless prefix-filtered
  *     candidates for the Zipf/stop-shingle regime — the shape that
  *     survives 100 TB — and the direct inverted-index join as the
  *     dense fallback). minhashLsh remains the approximate scale path.
  */
object TextOps {

  /** Whitespace tokens of the trimmed text (0-based SQL array) — THE
    * tokenizer every parity-critical operator shares (Corpus and
    * DataPipeline reuse this definition; the DuckDB twins all assume
    * string_split_regex(trim(text), '\s+')). */
  private[graft] val toksExpr = "split(trim(text), '\\\\s+')"

  private def docs(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d).withColumn("toks", expr(toksExpr))

  /** Word n-gram shingles, SQL-expression form (Spark arrays 0-based).
    * Docs with fewer than k tokens yield an EMPTY array: without the
    * guard, sequence(0, negative) runs DESCENDING and the negative
    * indices throw INVALID_ARRAY_INDEX under Spark 4's strict array
    * access — and the oracle's range(1, len-k+1) is empty for short
    * docs, so empty is also the parity-correct answer. */
  private[graft] def shinglesExpr(k: Int): String = {
    val parts = (0 until k).map(j => if (j == 0) "toks[i]" else s"toks[i+$j]")
      .mkString(" || ' ' || ")
    s"CASE WHEN size(toks) >= $k THEN transform(sequence(0, size(toks)-$k), i -> $parts) " +
      s"ELSE array() END"
  }

  // ---- exact dedup ---------------------------------------------------

  /** Exact content dedup: sha-256 the text, keep the lowest doc_id per
    * hash. One map-side-combined shuffle on the hash; at 100 TB the
    * groups stay tiny (hash collisions == true dups), no skew. */
  def dedupExact(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))

  val dedupExactSql: String =
    """SELECT sha256(text) AS content_hash, min(doc_id) AS keeper_id,
      |       count(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  /** Normalized exact dedup — [[dedupExact]] with a CANONICAL key:
    * Unicode NFC + simple per-code-point lowercase + whitespace-run
    * collapse (the native codegen'd
    * [[graft.plans.CanonicalText]] expression), so byte-different
    * encodings of the same text (NFD vs NFC sources, case variants,
    * re-wrapped whitespace) fall into one group. `n_variants` counts
    * the distinct RAW byte forms each canonical group absorbed —
    * exactly the duplicates plain byte-hash dedup misses. Same
    * one-shuffle map-side-combined plan as [[dedupExact]]. */
  def normalizedDedup(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .groupBy(sha2(graft.plans.GraftFunctions.canonicalText(col("text")), 256)
        .as("canon_hash"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"),
        countDistinct(sha2(col("text"), 256)).as("n_variants"))

  val normalizedDedupSql: String =
    """SELECT sha256(trim(regexp_replace(lower(nfc_normalize(text)),
      |                                  '\s+', ' ', 'g'))) AS canon_hash,
      |       min(doc_id) AS keeper_id, count(*) AS n_copies,
      |       count(DISTINCT sha256(text)) AS n_variants
      |FROM documents GROUP BY 1""".stripMargin

  // ---- text statistics ----------------------------------------------

  private val stopwords = Seq("the", "a", "of", "and", "is", "to", "in")

  /** Per-document quality statistics: sizes, token counts, subword
    * (BPE-ish regex) count, stopword ratio. Pure per-row expressions —
    * no shuffle at all; whole-stage-codegen end to end. */
  def textStats(spark: SparkSession, d: String): DataFrame = {
    val stopArr = array(stopwords.map(lit): _*)
    docs(spark, d).select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(col("toks")).as("n_tokens"),
      size(array_distinct(col("toks"))).as("n_distinct_tokens"),
      size(expr("regexp_extract_all(text, '\\\\w+|[^\\\\w\\\\s]', 0)")).as("n_subwords"),
      (size(filter(col("toks"), t => array_contains(stopArr, t))).cast("double") /
        size(col("toks"))).as("stopword_ratio"),
      (length(regexp_replace(col("text"), "\\s+", "")).cast("double") /
        size(col("toks"))).as("avg_token_len"))
  }

  val textStatsSql: String = {
    val stops = stopwords.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id,
       |  length(text) AS n_chars,
       |  len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       |  len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS n_distinct_tokens,
       |  len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_subwords,
       |  CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
       |       t -> t IN ($stops))) AS DOUBLE)
       |    / len(string_split_regex(trim(text), '\\s+')) AS stopword_ratio,
       |  CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
       |    / len(string_split_regex(trim(text), '\\s+')) AS avg_token_len
       |FROM documents""".stripMargin
  }

  // ---- language identification ---------------------------------------

  private val langStops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  /** Stopword-profile language ID — the classic n-gram/function-word
    * heuristic: score each language by its function-word hit ratio,
    * argmax with a fixed priority for ties. Per-row expressions only. */
  def langId(spark: SparkSession, d: String): DataFrame = {
    val base = docs(spark, d)
    val scored = langStops.foldLeft(base) { case (df, (lang, stops)) =>
      val arr = array(stops.map(lit): _*)
      df.withColumn(s"score_$lang",
        size(filter(col("toks"), t => array_contains(arr, t))).cast("double") /
          size(col("toks")))
    }
    val Seq(en, de, fr, es) = langStops.map(l => col(s"score_${l._1}"))
    scored.select(
      col("doc_id"),
      when(en >= de && en >= fr && en >= es, "en")
        .when(de >= fr && de >= es, "de")
        .when(fr >= es, "fr")
        .otherwise("es").as("lang_pred"),
      en.as("score_en"))
  }

  val langIdSql: String = {
    def hits(stops: Seq[String]) = {
      val l = stops.map(s => s"'$s'").mkString(", ")
      s"CAST(len(list_filter(toks, t -> t IN ($l))) AS DOUBLE) / len(toks)"
    }
    val Seq(en, de, fr, es) = langStops.map(l => hits(l._2))
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |           FROM documents),
       |s AS (SELECT doc_id, $en AS s_en, $de AS s_de, $fr AS s_fr, $es AS s_es FROM t)
       |SELECT doc_id,
       |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
       |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
       |       WHEN s_fr >= s_es THEN 'fr'
       |       ELSE 'es' END AS lang_pred,
       |  s_en AS score_en
       |FROM s""".stripMargin
  }

  // ---- document fingerprint ------------------------------------------

  /** Rolling-hash document fingerprint: min portable hash over word
    * 3-gram shingles (minhash with one permutation — winnowing's
    * degenerate form). Identical docs ⇒ identical fingerprints;
    * near-identical docs collide with probability = their Jaccard. */
  def fingerprint(spark: SparkSession, d: String): DataFrame =
    docs(spark, d)
      .select(col("doc_id"), explode(expr(shinglesExpr(3))).as("sh"))
      .groupBy(col("doc_id"))
      .agg(min(hash64(col("sh"), 0)).as("fingerprint"))

  val fingerprintSql: String =
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |           FROM documents),
       |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)-1),
       |              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
       |       FROM t)
       |SELECT doc_id,
       |  min((md5_number_lower('0:' || sh) % ${HashPrime}::UBIGINT)::BIGINT) AS fingerprint
       |FROM sh GROUP BY 1""".stripMargin

  // ---- n-gram Jaccard near-dup pairs (exact form) --------------------

  /** Exact-Jaccard verification of a candidate pair set — the per-PAIR
    * array kernel (VERDICT r15 next #1). Each doc's distinct shingles
    * fold ONCE to an array (a groupBy over the docs the candidate set
    * touches), each pair joins its two arrays by doc id, and the
    * intersection is `size(array_intersect)` per row. The counts are
    * the same integers the explode form aggregated, so the jaccard
    * double divides identically and the output is bit-identical —
    * spec-pinned against [[jaccardVerifyNaive]] on real documents.
    *
    * Why this shape: the former explode form materialized
    * O(pairs × shingles-per-doc) rows — cands joined against the
    * exploded shingle relation per side, then a per-pair groupBy. At
    * the 100× dedup store that is ~625M intermediate rows shuffled for
    * 2.5M candidate pairs (the face-6 parity replay's dominant term).
    * The kernel form ships each doc's array once per pair through two
    * doc-id hash joins and intersects in the map stage — the shape the
    * STREAMING face already used (`streamingCrossDedupFrom`).
    *
    * Before any intersection, pairs are pruned by the EXACT size bound
    * J(a,b) ≤ min(na,nb)/max(na,nb) (the all-pairs length filter —
    * Bayardo et al., "Scaling Up All Pairs Similarity Search"):
    * min/max < threshold proves J < threshold with no estimator in the
    * loop. The calibrated MinHash-estimate gate the r15 verdict
    * proposed is VACUOUS at the registered 8-hash geometry — a
    * measured sf0.001 qualifying pair sits at est 0.625 with exact
    * J 0.909 (downward error 0.284 > the 0.25 that would prune
    * anything a band join admits) — see PLANS.md round-16 note. The
    * 1e-9 slack covers the ratio division's rounding; a true ratio
    * ≥ threshold can never fall below it. Shared by [[ngramJaccard]],
    * [[minhashLsh]], [[minhashCalibration]] and [[crossDedupServe]]. */
  private[graft] def jaccardVerify(cands: DataFrame, sets: DataFrame,
                                   threshold: Double): DataFrame = {
    val arrs = sets.groupBy("doc_id").agg(collect_list(col("sh")).as("shs"))
    cands
      .join(arrs.select(col("doc_id").as("doc_a"), col("shs").as("sa")), "doc_a")
      .join(arrs.select(col("doc_id").as("doc_b"), col("shs").as("sb")), "doc_b")
      .withColumn("na", size(col("sa")))
      .withColumn("nb", size(col("sb")))
      .filter(least(col("na"), col("nb")).cast("double") >=
        (lit(threshold) - lit(1e-9)) * greatest(col("na"), col("nb")))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .filter(col("inter") > 0)
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Ceiling on the estimated bytes of [[jaccardVerifyAsym]]'s
    * batch-side broadcast (VERDICT r16 wrong #3 — the bloom-literal
    * gate pattern applied to the serve kernel): the asym form
    * broadcasts the arriving batch's full per-doc shingle ARRAYS, not
    * just candidate ids, so an unusually large "batch" would build a
    * multi-GB broadcast that fails late in the driver where the
    * symmetric kernel merely shuffles. Above the ceiling the serve
    * falls back to [[jaccardVerify]] — bit-identical output (same
    * arrays, same integers, same division; spec-forced through both
    * paths), just a pairwise array shuffle instead of a broadcast.
    * 256 MB: comfortably under executor/driver broadcast budgets at
    * default cluster sizing while letting any sanely-sliced ingest
    * batch (≤ ~100k docs × ~KB arrays) take the fast path. */
  private[graft] val AsymBatchMaxBytes: Long = 256L << 20

  /** ASYMMETRIC form of [[jaccardVerify]] for batch×corpus candidate
    * sets (doc_a from a bounded arriving batch, doc_b from the corpus
    * side) — the crossDedup serve kernel. The symmetric kernel ships
    * BOTH shingle arrays through a shuffle once per pair; at the 100×
    * dedup store that is 47.4M pairs × ~KB arrays ≈ a 100 GB exchange
    * that StageProbe r16 measured as ~90% of the serve wall (the
    * intersects themselves are ~2 s of 32-way CPU). This form ships
    * each CORPUS array once per doc (pairs pre-grouped per doc_b, one
    * doc_b join), and the BATCH side rides a broadcast — bounded by
    * the arriving batch, the exact contract the band-join candidate-id
    * semi-join already assumes — so per-pair shuffle is two longs.
    * Output is bit-identical to [[jaccardVerify]] (same arrays, same
    * integer intersection, same division; spec-pinned).
    *
    * The batch side's broadcast bytes are ESTIMATED first; above
    * `maxBatchBytes` the symmetric kernel serves instead
    * ([[AsymBatchMaxBytes]]). When the caller supplies the arriving
    * batch's raw `(doc_id, text)` frame (`batchDocs` — every dedup
    * serve has it in hand), the estimate is ONE narrow scan of the
    * batch: per-doc word-2-gram shingle bytes are bounded by
    * 18·length(text)+48 (bigram chars ≤ 2·chars + one space per
    * bigram, ≤ (len+1)/2 bigrams, ×3 UTF-8 worst case, +20 B/shingle
    * and +24 B/doc of unsafe-row overhead). Without `batchDocs` the
    * estimate aggregates the candidate-pruned shingle relation itself
    * — exact, but it forces the band-join candidate subtree to
    * compute EAGERLY a second time (once for the estimate, once in
    * the served plan), which the r17 baseline measured as ~2 s of the
    * cross_dedup wall at sf0.1 (guide §1.2/§2.4: don't compute things
    * twice). The bound is deliberately conservative: it only moves
    * WHERE the fallback engages (≈14 MB of batch text at the 256 MB
    * ceiling vs ≈50 MB under the exact estimate); both kernels return
    * bit-identical rows, so the gate quantity can never change
    * results — only which plan shape serves them. */
  private[graft] def jaccardVerifyAsym(cands: DataFrame, sets: DataFrame,
                                       threshold: Double,
                                       maxBatchBytes: Long = AsymBatchMaxBytes,
                                       batchDocs: Option[DataFrame] = None)
      : DataFrame = {
    val aIds = cands.select(col("doc_a").as("doc_id")).distinct()
    val bIds = cands.select(col("doc_b").as("doc_id")).distinct()
    val aSets = sets.join(broadcast(aIds), Seq("doc_id"), "left_semi")
    val estBytes = batchDocs match {
      case Some(docs) =>
        docs.agg(coalesce(sum(length(col("text")).cast("long") * lit(18L)
          + lit(48L)), lit(0L))).head.getLong(0)
      case None =>
        val est = aSets
          .agg(coalesce(sum(length(col("sh").cast("string")) + lit(20L)), lit(0L))
                 .as("bytes"),
               (countDistinct(col("doc_id")) * lit(24L)).as("docBytes"))
          .head
        est.getLong(0) + est.getLong(1)
    }
    if (estBytes > maxBatchBytes)
      return jaccardVerify(cands, sets, threshold)
    val arrsA = aSets
      .groupBy("doc_id").agg(collect_list(col("sh")).as("sa"))
      .select(col("doc_id").as("doc_a"), col("sa"))
    val arrsB = sets.join(broadcast(bIds), Seq("doc_id"), "left_semi")
      .groupBy("doc_id").agg(collect_list(col("sh")).as("sb"))
      .select(col("doc_id").as("doc_b"), col("sb"))
    cands.groupBy(col("doc_b")).agg(collect_list(col("doc_a")).as("das"))
      .join(arrsB, "doc_b")
      .select(col("doc_b"), col("sb"), explode(col("das")).as("doc_a"))
      .join(broadcast(arrsA), "doc_a")
      .withColumn("na", size(col("sa")))
      .withColumn("nb", size(col("sb")))
      .filter(least(col("na"), col("nb")).cast("double") >=
        (lit(threshold) - lit(1e-9)) * greatest(col("na"), col("nb")))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .filter(col("inter") > 0)
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** The explode-join twin of [[jaccardVerify]] — O(pairs × shingles)
    * intermediate rows. Retained ONLY as the in-repo oracle for the
    * kernel spec (TextOpsSpec pins bit-identical output on real docs);
    * no production path calls it. */
  private[graft] def jaccardVerifyNaive(cands: DataFrame, sets: DataFrame,
                                        threshold: Double): DataFrame = {
    val sizes = sets.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cands
      .join(sets.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id"), col("n").as("na")), col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sizes.select(col("doc_id"), col("n").as("nb")), col("doc_b") === col("doc_id")).drop("doc_id")
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Prefix-filtered candidate pairs (Bayardo et al., "Scaling Up All
    * Pairs Similarity Search"; Chaudhuri et al. prefix filtering) — the
    * bound on the hot-shingle quadratic tail:
    *
    * Canonical shingle order = (document frequency asc, shingle asc);
    * each doc keeps only its first `n − ceil(t·n) + 1` shingles (its
    * PREFIX), and candidates come from the inverted-index join over
    * prefixes only.
    *
    * Completeness proof: J(a,b) ≥ t ⇒ α = |a∩b| ≥ t·|a∪b| ≥
    * t·max(na,nb), so α ≥ ceil(t·na) and α ≥ ceil(t·nb). Suppose no
    * common element lies in BOTH prefixes, and (wlog) a's max prefix
    * element e precedes b's max prefix element f in the canonical
    * order. Any common c ∈ pref(a) has order ≤ e < f so it would also
    * sit inside b's prefix — excluded by assumption; hence every common
    * element lies in a's suffix, which has only ceil(t·na) − 1 < α
    * elements. Contradiction. So the prefix join finds every
    * qualifying pair — results are EXACTLY those of the naive
    * inverted-index join (tested against it).
    *
    * Scale effect: a stop-shingle ("of the") has maximal df, so it
    * sorts LAST in the canonical order and enters a doc's prefix only
    * when the doc has almost nothing rarer — its posting list in the
    * prefix relation collapses, where the naive join paid k² pairs. */
  private[graft] def prefixRelation(sets: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sizes = sets.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val dfreq = sets.groupBy("sh").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))
    sets.join(dfreq, "sh")
      .withColumn("rn", row_number().over(wDoc))
      .join(sizes, "doc_id")
      .filter(col("rn") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select(col("doc_id"), col("sh"))
  }

  private[graft] def prefixCandidates(sets: DataFrame, threshold: Double): DataFrame = {
    val prefix = prefixRelation(sets, threshold)
    prefix.as("a").join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Direct inverted-index aggregation: the shingle self-join feeding
    * the intersection count straight into a groupBy — no candidate
    * materialization, no re-join. Optimal for DENSE corpora (where
    * almost every pair is a candidate anyway, so pruning can't win and
    * re-joining costs extra); its weakness is the unbounded hot-shingle
    * posting list (k docs sharing one shingle → k² join rows). */
  private def directJaccard(sets: DataFrame, threshold: Double): DataFrame = {
    val sizes = sets.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sets.as("a").join(sets.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id"), col("n").as("na")), col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sizes.select(col("doc_id"), col("n").as("nb")), col("doc_b") === col("doc_id")).drop("doc_id")
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Per-document word-bitmap relation (doc_id, w0..w{nWords−1}, n) of
    * a distinct-shingle frame — the dense-regime encoding both
    * [[bitmapJaccard]] and [[bitmapContainment]] score pairs over.
    * Session-memoized keyed by the CANONICALIZED logical plan of
    * `sets` (structural equality — the same corpus lineage hits
    * regardless of which operator asks) + vocab: each consumer reads
    * the bitmap twice (both join sides), two registered queries share
    * it, and the relation is docs × nWords longs — far SMALLER than
    * the shingle frame it folds. Deterministic build (stable
    * shingle→bit ranking), so sharing cannot change a hash. */
  private def docBitmaps(sets: DataFrame, vocab: Long): DataFrame =
    // keyed by the OWNING session too (ADVICE r7): canonicalization
    // normalizes expr ids, so logically identical plans from different
    // sessions must not share a frame persisted under a stopped one
    bitmapCache.getOrBuild(
      (sets.sparkSession, sets.queryExecution.analyzed.canonicalized, vocab)) {
        import org.apache.spark.sql.expressions.Window
        val nWords = ((vocab + 63) / 64).toInt
        // stable shingle → bit index; bounded by maxBitmapVocab, so the
        // single-partition ranking window is trivially small
        val vocabIdx = sets.select(col("sh")).distinct()
          .withColumn("idx", row_number().over(Window.orderBy(col("sh"))) - 1)
        val ids = sets.join(broadcast(vocabIdx), "sh").select(col("doc_id"), col("idx"))
        // per-word OR via SUM: idx values are distinct per doc, so each
        // bit is added exactly once — the simhash static-aggregate trick
        val words = (0 until nWords).map { w =>
          sum(when(expr("idx DIV 64") === w,
            expr("shiftleft(CAST(1 AS BIGINT), CAST(idx % 64 AS INT))")).otherwise(0L)).as(s"w$w")
        }
        ids.groupBy("doc_id")
          .agg(words.head, (words.tail :+ count(lit(1)).as("n")): _*)
          .persist()
      }

  private val bitmapCache = new graft.SessionMemo[
    (org.apache.spark.sql.SparkSession,
     org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Long),
    DataFrame]("doc_bitmaps")

  /** Bitmap all-pairs: when the shingle VOCABULARY is small (the dense
    * small-vocab regime where candidate pruning is hopeless), encode
    * each doc's shingle set as ⌈vocab/64⌉ longs and score every pair
    * with word-wise AND + POPCNT inside one broadcast nested-loop join —
    * no 10⁷-row shuffle, no groupBy. C(n,2)·⌈vocab/64⌉ word-ops, chosen
    * only under the doc/vocab caps in [[chooseJaccardStrategy]]. */
  private def bitmapJaccard(sets: DataFrame, vocab: Long, threshold: Double): DataFrame = {
    val nWords = ((vocab + 63) / 64).toInt
    val bm = docBitmaps(sets, vocab)
    // keep the words as FLAT long columns (not an array): the popcount
    // sum below is then a plain builtin expression tree — whole-stage
    // codegen, zero allocation per pair (a zip_with/aggregate HOF form
    // measured 10× slower: per-pair array alloc + boxed lambdas).
    // WSCG requires the joined row's field count (2·nWords + 4) under
    // spark.sql.codegen.maxFields — GraftSession raises it to 1024 so
    // the property holds all the way to the 16384-vocab cap (256 word
    // columns); on a default-config session the upper end of the cap
    // falls back to interpreted eval, still exact (ADVICE r3)
    val a = bm.select(col("doc_id").as("doc_a") +:
      (0 until nWords).map(w => col(s"w$w").as(s"a$w")) :+ col("n").as("na"): _*)
    val b = bm.select(col("doc_id").as("doc_b") +:
      (0 until nWords).map(w => col(s"w$w").as(s"b$w")) :+ col("n").as("nb"): _*)
    val inter = (0 until nWords)
      .map(w => bit_count(col(s"a$w").bitwiseAND(col(s"b$w"))).cast("long"))
      .reduce(_ + _)
    // size-compatibility pruning INSIDE the join condition, evaluated
    // before the nWords-term popcount sum: J(A,B) ≥ t ⇒ |A∩B| ≥
    // t·|A∪B| ⇒ na ≥ t·nb (and symmetrically), since na ≥ inter and
    // union ⊇ either set. Exact — a pair it drops cannot reach the
    // threshold; for t ≤ 0 both conjuncts are vacuously true (sizes
    // ≥ 1 > t·anything), so output is unchanged in the degenerate case
    a.join(broadcast(b), col("doc_a") < col("doc_b") &&
        col("na").cast("double") >= lit(threshold) * col("nb") &&
        col("nb").cast("double") >= lit(threshold) * col("na"))
      .withColumn("inter", inter)
      // inter > 0 keeps the all-pairs form identical to the inverted-
      // index strategies even at threshold <= 0: a pair sharing no
      // shingle never appears in a posting-list join, so it must not
      // appear here either (ADVICE r3)
      .filter(col("inter") > 0)
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** The (doc_id, shingle) set relation every Jaccard strategy and the
    * stats pass share — distinct bigram shingles per document. */
  /** Distinct word-bigram shingles per document. Deliberately NOT
    * session-memoized (unlike the pair-relation memo): an A/B bench
    * showed the consumers' cost lives in their pair joins, not this
    * scan, and the exploded relation is LARGER than its input — at
    * 100 TB re-scanning the pruned parquet beats caching a blown-up
    * intermediate. */
  private[graft] def shingleSets(spark: SparkSession, d: String): DataFrame =
    shingleSetsOf(docs(spark, d))

  /** [[shingleSets]] over an ARBITRARY prepared docs frame (doc_id,
    * toks) — lets batch-scoped callers shingle ONLY the rows they
    * hold instead of the whole corpus. */
  private[graft] def shingleSetsOf(docsDf: DataFrame): DataFrame =
    docsDf
      .select(col("doc_id"), explode(expr(shinglesExpr(2))).as("sh")).distinct()

  /** Exact corpus statistics driving the strategy choice — all exact
    * counts, so the chosen plan is deterministic for a given corpus
    * (and the DuckDB oracle, which always computes the naive form,
    * stays bit-identical since every strategy is exact). */
  private[graft] case class JaccardStats(nDocs: Long, vocab: Long, rows: Long,
                                         directJoinRows: Long)

  /** `sampleFraction < 1` estimates the stats from a deterministic
    * doc-level sample (portable hash of doc_id, so repeatable) and
    * scales them back up: under doc-sampling at rate f, E[rows]=f·rows
    * and E[Σdf(df−1)]=f²·Σdf(df−1), so /f and /f² are unbiased; vocab
    * is reported as observed (a lower bound — fine, it only gates the
    * bitmap cap, and the sampling regime is far beyond that cap
    * anyway). Sampled stats drive ONLY the strategy choice; every
    * strategy then runs exact on the full corpus, so the output is
    * identical either way (VERDICT r3 minor #4: at 100 TB the stats
    * pass must not be a second full scan). Both aggregates (shingle-df
    * rollup and distinct-doc count) are fused into one job via a
    * 1-row × 1-row cross join — one action, one stage graph. */
  /** Deterministic doc-level sample shared by every stats estimator:
    * keep a doc iff hash64(doc_id, seed 7) mod 1e6 falls under the
    * fraction. jaccardStats and prefixJoinRows MUST draw from the same
    * sample (same seed, same modulus) for their estimates to be
    * comparable — hence one definition. */
  private def sampleDocs(sets: DataFrame, fraction: Double): (DataFrame, Double) =
    if (fraction >= 1.0) (sets, 1.0)
    else (sets.filter(pmod(hash64(col("doc_id"), 7), lit(1000000L)) <
      math.round(fraction * 1000000L)), fraction)

  private[graft] def jaccardStats(sets: DataFrame, sampleFraction: Double = 1.0): JaccardStats = {
    val (s, f) = sampleDocs(sets, sampleFraction)
    val shingleAgg = s.groupBy("sh").agg(count(lit(1)).as("df"))
      .agg(count(lit(1)).as("vocab"),
        coalesce(sum(col("df")), lit(0L)).cast("long").as("rows"),
        coalesce(sum(col("df") * (col("df") - 1)), lit(0L)).cast("long").as("dj2"))
    val docAgg = s.agg(countDistinct(col("doc_id")).as("nDocs"))
    val r = shingleAgg.crossJoin(docAgg).head()
    JaccardStats(
      math.round(r.getLong(3) / f), r.getLong(0),
      math.round(r.getLong(1) / f), math.round(r.getLong(2) / (2.0 * f * f)))
  }

  /** Join-size of the prefix-filtered candidate generation — only
    * computed when the bitmap path is ruled out. Same doc-sampling
    * contract as [[jaccardStats]] (estimate scales /f²; the df-order
    * prefix selection on the sample approximates the full one — the
    * estimate drives only the choice, never the result). */
  private[graft] def prefixJoinRows(sets: DataFrame, threshold: Double,
                                    sampleFraction: Double = 1.0): Long = {
    val (s, f) = sampleDocs(sets, sampleFraction)
    val raw = prefixRelation(s, threshold)
      .groupBy("sh").agg(count(lit(1)).as("pdf"))
      .agg(coalesce(sum(col("pdf") * (col("pdf") - 1)), lit(0L)).cast("long"))
      .head().getLong(0)
    math.round(raw / (2.0 * f * f))
  }

  /** Session memos of the chooser statistics (r17): both stats passes
    * are eager scalar jobs that ran at QUERY CONSTRUCTION on every
    * invocation — ngram_jaccard paid the sampled pair (stats +
    * prefix-join rows) and containment_pairs the full-scan stats per
    * call, all deterministic per (session, dir, params). The cached
    * values are plain numbers (no persisted relation, so nothing here
    * can block scan pruning the way the reverted shingle-set memo
    * did); the fraction/threshold keys are Double bit-patterns. */
  private val statsCache = new graft.SessionMemo[
    (SparkSession, String, Long), JaccardStats]("jaccard_stats")
  private val pfRowsCache = new graft.SessionMemo[
    (SparkSession, String, Long, Long), Long]("prefix_join_rows")

  private[graft] def jaccardStatsFor(spark: SparkSession, d: String,
                                     sampleFraction: Double): JaccardStats =
    statsCache.getOrBuild(
      (spark, d, java.lang.Double.doubleToLongBits(sampleFraction))) {
      jaccardStats(shingleSets(spark, d), sampleFraction)
    }

  private[graft] def prefixJoinRowsFor(spark: SparkSession, d: String,
                                       threshold: Double,
                                       sampleFraction: Double): Long =
    pfRowsCache.getOrBuild(
      (spark, d, java.lang.Double.doubleToLongBits(threshold),
        java.lang.Double.doubleToLongBits(sampleFraction))) {
      prefixJoinRows(shingleSets(spark, d), threshold, sampleFraction)
    }

  private[graft] sealed trait JaccardStrategy
  private[graft] case object BitmapAllPairs extends JaccardStrategy
  private[graft] case object PrefixFiltered extends JaccardStrategy
  private[graft] case object DirectInverted extends JaccardStrategy

  /** Cost-based strategy choice (AQE-spirit, driven by exact stats):
    *
    *  - [[BitmapAllPairs]] when docs and vocabulary fit the bitmap caps
    *    and C(n,2)·words is within a constant factor of the inverted
    *    join (word-ops are ~30× cheaper than shuffled join rows).
    *  - [[PrefixFiltered]] when pruned candidate generation plus its
    *    re-join verification undercuts the direct join — the Zipf /
    *    stop-shingle regime, the only shape that survives 100 TB.
    *  - [[DirectInverted]] otherwise — the dense regime, where nearly
    *    every pair is a genuine candidate and nothing can be pruned
    *    (output-bound, inherently quadratic in that case).
    */
  private[graft] def chooseJaccardStrategy(
      s: JaccardStats, pfRows: => Long,
      maxBitmapDocs: Long = 32768, maxBitmapVocab: Long = 16384): JaccardStrategy = {
    // degenerate corpora (0/1 docs, empty vocab) have no pairs; the
    // inverted-index form returns empty without building a bitmap
    // (bitmapJaccard on vocab=0 would have no word columns — ADVICE r3)
    if (s.nDocs < 2 || s.vocab == 0) return DirectInverted
    // costs in Double: the products (nDocs² · words, pfRows · avgDoc)
    // overflow Long exactly at the corpus sizes where a wrong flip to a
    // quadratic strategy hurts most (ADVICE r3); Double loses only
    // precision, never sign or magnitude, and the choice is a ~32×
    // comparison where 1-ulp error is irrelevant
    val words = ((s.vocab + 63) / 64).toDouble
    val pairOps = s.nDocs.toDouble * (s.nDocs - 1).toDouble / 2.0 * words
    if (s.nDocs <= maxBitmapDocs && s.vocab <= maxBitmapVocab &&
        pairOps <= 32.0 * s.directJoinRows.toDouble) BitmapAllPairs
    else {
      val avgDoc = s.rows.toDouble / s.nDocs.toDouble
      if (pfRows.toDouble * (1.0 + 2.0 * avgDoc) < s.directJoinRows.toDouble) PrefixFiltered
      else DirectInverted
    }
  }

  /** Exact bigram-shingle Jaccard near-duplicate pairs, with a
    * statistics-driven choice between three EXACT strategies (bitmap
    * all-pairs / prefix-filtered / direct inverted index — identical
    * output, same oracle; see [[chooseJaccardStrategy]]). The naive
    * single-strategy form is kept as [[ngramJaccardNaive]] for the
    * equivalence tests. */
  /** `statsSampleFraction < 1` runs the stats pass on a doc-level
    * sample (the 100 TB regime — don't full-scan twice just to pick a
    * plan). Sampled stats never select the bitmap strategy: its caps
    * demand exact nDocs/vocab, and any corpus worth sampling is far
    * past them. Output is identical at any fraction — all strategies
    * are exact; only the plan choice is estimated. */
  def ngramJaccard(spark: SparkSession, d: String, threshold: Double = 0.5,
                   statsSampleFraction: Double = 1.0): DataFrame = {
    val sets = shingleSets(spark, d)
    val stats = jaccardStatsFor(spark, d, statsSampleFraction)
    val bitmapDocsCap = if (statsSampleFraction >= 1.0) 32768L else 0L
    chooseJaccardStrategy(stats,
        prefixJoinRowsFor(spark, d, threshold, statsSampleFraction),
        maxBitmapDocs = bitmapDocsCap) match {
      case BitmapAllPairs => bitmapJaccard(sets, stats.vocab, threshold)
      case PrefixFiltered => jaccardVerify(prefixCandidates(sets, threshold), sets, threshold)
      case DirectInverted => directJaccard(sets, threshold)
    }
  }

  /** Run a SPECIFIC strategy regardless of the chooser — the plan-audit
    * and equivalence-test hook (all three are exact, so output is
    * identical; only the physical plan differs). */
  private[graft] def ngramJaccardWith(spark: SparkSession, d: String, threshold: Double,
                                      strategy: JaccardStrategy): DataFrame = {
    val sets = shingleSets(spark, d)
    strategy match {
      case BitmapAllPairs => bitmapJaccard(sets, jaccardStats(sets).vocab, threshold)
      case PrefixFiltered => jaccardVerify(prefixCandidates(sets, threshold), sets, threshold)
      case DirectInverted => directJaccard(sets, threshold)
    }
  }

  /** The chooser's pick for a corpus — audit/introspection hook. */
  private[graft] def chosenStrategy(spark: SparkSession, d: String,
                                    threshold: Double = 0.5): JaccardStrategy = {
    val sets = shingleSets(spark, d)
    chooseJaccardStrategy(jaccardStatsFor(spark, d, 1.0),
      prefixJoinRowsFor(spark, d, threshold, 1.0))
  }

  /** The naive inverted-index form — reference semantics for the
    * strategy equivalence tests; not registered as a query. */
  private[graft] def ngramJaccardNaive(spark: SparkSession, d: String,
                                       threshold: Double = 0.5): DataFrame = {
    val sets = shingleSets(spark, d)
    directJaccard(sets, threshold)
  }

  /** The [[chooseJaccardStrategy]] cost model as a USER-FACING planning
    * report — one row: corpus stats (docs, shingle vocabulary, posting
    * rows), the candidate-volume estimates each strategy would pay
    * (`direct_join_rows` = Σ df·(df−1)/2 hot-shingle join rows,
    * `pf_rows` = the same sum over the df-ordered prefix relation,
    * `bitmap_words` = the per-pair AND/POPCNT width), and the
    * strategy the chooser would pick. The "should I even run exact
    * all-pairs here?" check: on a near-dup-heavy crawl (the 10×-sf0.1
    * scale run in PLANS.md) direct_join_rows grows ~quadratically in
    * the duplication factor while the corpus only grows linearly — a
    * pipeline reads this report and routes to minhash_lsh instead.
    * Same decision inputs as the chooser (exact full-corpus stats,
    * default caps), but computed as ONE DataFrame with no driver
    * collect, so it is itself 100 TB-runnable: two map-side-combined
    * aggregations over one shingle scan plus the prefix rollup (a
    * window per doc over its own shingles — bounded by doc length).
    *
    * Exactness: every stat is an integer sum (df·(df−1) is even, so
    * `div 2` is exact); the `chosen` CASE replicates the Scala cost
    * comparison with the identical double expression shapes, so the
    * DuckDB twin hash-matches bit-for-bit. */
  def jaccardPlanReport(spark: SparkSession, d: String,
                        threshold: Double = 0.5): DataFrame = {
    val sets = shingleSets(spark, d)
    val dfreq = sets.groupBy("sh").agg(count(lit(1)).as("df"))
    val sagg = dfreq.agg(
      count(lit(1)).as("vocab"),
      coalesce(sum(col("df")), lit(0L)).cast("long").as("shingle_rows"),
      expr("coalesce(sum(df * (df - 1)), 0) div 2").as("direct_join_rows"))
    val dagg = sets.agg(countDistinct(col("doc_id")).as("n_docs"))
    val pf = prefixRelation(sets, threshold)
      .groupBy("sh").agg(count(lit(1)).as("pdf"))
      .agg(expr("coalesce(sum(pdf * (pdf - 1)), 0) div 2").as("pf_rows"))
    sagg.crossJoin(dagg).crossJoin(pf)
      .select(col("n_docs"), col("vocab"), col("shingle_rows"),
        col("direct_join_rows"), col("pf_rows"),
        expr("(vocab + 63) div 64").as("bitmap_words"),
        expr(
          """CASE
            |  WHEN n_docs < 2 OR vocab = 0 THEN 'direct'
            |  WHEN n_docs <= 32768 AND vocab <= 16384 AND
            |       CAST(n_docs AS DOUBLE) * CAST(n_docs - 1 AS DOUBLE) / 2.0 *
            |         CAST((vocab + 63) div 64 AS DOUBLE)
            |         <= 32.0 * CAST(direct_join_rows AS DOUBLE) THEN 'bitmap'
            |  WHEN CAST(pf_rows AS DOUBLE) *
            |         (1.0 + 2.0 * (CAST(shingle_rows AS DOUBLE) /
            |                       CAST(n_docs AS DOUBLE)))
            |         < CAST(direct_join_rows AS DOUBLE) THEN 'prefix'
            |  ELSE 'direct'
            |END""".stripMargin).as("chosen"))
  }

  def jaccardPlanReportSql(threshold: Double = 0.5): String =
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |           FROM documents),
       |d AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(toks)),
       |             i -> toks[i] || ' ' || toks[i+1])) AS sh
       |      FROM t),
       |dfreq AS (SELECT sh, count(*) AS df FROM d GROUP BY 1),
       |sagg AS (SELECT count(*) AS vocab,
       |                CAST(coalesce(sum(df), 0) AS BIGINT) AS shingle_rows,
       |                CAST(coalesce(sum(df * (df - 1)), 0) // 2 AS BIGINT)
       |                  AS direct_join_rows
       |         FROM dfreq),
       |dagg AS (SELECT count(DISTINCT doc_id) AS n_docs FROM d),
       |sizes AS (SELECT doc_id, count(*) AS n FROM d GROUP BY 1),
       |pr AS (SELECT doc_id, sh FROM (
       |         SELECT d.doc_id, d.sh, s.n,
       |                row_number() OVER (PARTITION BY d.doc_id
       |                                   ORDER BY f.df, d.sh) AS rn
       |         FROM d JOIN dfreq f USING (sh) JOIN sizes s USING (doc_id))
       |       WHERE rn <= n - CAST(ceil($threshold * n) AS BIGINT) + 1),
       |pf AS (SELECT CAST(coalesce(sum(pdf * (pdf - 1)), 0) // 2 AS BIGINT)
       |              AS pf_rows
       |       FROM (SELECT sh, count(*) AS pdf FROM pr GROUP BY 1))
       |SELECT n_docs, vocab, shingle_rows, direct_join_rows, pf_rows,
       |       CAST((vocab + 63) // 64 AS BIGINT) AS bitmap_words,
       |       CASE
       |         WHEN n_docs < 2 OR vocab = 0 THEN 'direct'
       |         WHEN n_docs <= 32768 AND vocab <= 16384 AND
       |              CAST(n_docs AS DOUBLE) * CAST(n_docs - 1 AS DOUBLE) / 2.0 *
       |                CAST((vocab + 63) // 64 AS DOUBLE)
       |                <= 32.0 * CAST(direct_join_rows AS DOUBLE) THEN 'bitmap'
       |         WHEN CAST(pf_rows AS DOUBLE) *
       |                (1.0 + 2.0 * (CAST(shingle_rows AS DOUBLE) /
       |                              CAST(n_docs AS DOUBLE)))
       |                < CAST(direct_join_rows AS DOUBLE) THEN 'prefix'
       |         ELSE 'direct'
       |       END AS chosen
       |FROM sagg CROSS JOIN dagg CROSS JOIN pf""".stripMargin

  def ngramJaccardSql(threshold: Double = 0.5): String =
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |           FROM documents),
       |d AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(toks)),
       |             i -> toks[i] || ' ' || toks[i+1])) AS sh
       |      FROM t),
       |sizes AS (SELECT doc_id, count(*) AS n FROM d GROUP BY 1),
       |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |          FROM d a JOIN d b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |       CAST(inter AS DOUBLE) / (na.n + nb.n - inter) AS jaccard
       |FROM pairs
       |JOIN sizes na ON doc_a = na.doc_id
       |JOIN sizes nb ON doc_b = nb.doc_id
       |WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= $threshold""".stripMargin

  // ---- asymmetric containment (quote / subset detection) --------------

  /** Directed containment pairs: |A∩B| / |A| ≥ `threshold` reported as
    * (doc_a = the CONTAINED doc, doc_b = the container) — the
    * asymmetric relation symmetric Jaccard misses: a tweet quoted
    * inside an article scores J ≈ |tweet|/|article| ≈ 0 but
    * containment ≈ 1. The subset/quote/excerpt detector of the dedup
    * family (the asymmetric variant of Bayardo et al.'s all-pairs
    * similarity — public technique).
    *
    * Two exact strategies, cost-chosen like [[ngramJaccard]]'s (same
    * corpus-regime logic, measured on this corpus):
    *
    *  - [[bitmapContainment]] under the bitmap caps — the DENSE /
    *    small-vocab regime. Containment admits NO size-compatibility
    *    pruning (for t ≤ 1 one direction of any pair always passes the
    *    size test), and on a dense corpus the asymmetric prefix filter
    *    collapses (measured here: prefix×full candidates = 10.0M of
    *    the 12.5M possible pairs, then a ~|A|-row verify EACH — minutes
    *    at sf0.1), so scoring all C(n,2) pairs with word-wise AND +
    *    POPCNT is both exact and the fastest in-caps form.
    *  - [[prefixContainment]] beyond the caps — the Zipf / 100 TB
    *    regime where shingle rarity is real: only the contained side
    *    is prefix-pruned (completeness needs no order argument —
    *    α = |A∩B| ≥ ceil(t·nA) cannot fit in the ceil(t·nA)−1-element
    *    suffix), the df-asc order keeps hot posting lists meeting only
    *    prefix slivers, and exact verification touches candidates
    *    only. */
  def containmentPairs(spark: SparkSession, d: String,
                       threshold: Double = 0.8): DataFrame = {
    val sets = shingleSets(spark, d)
    val stats = jaccardStatsFor(spark, d, 1.0)
    if (stats.nDocs >= 2 && stats.vocab > 0 &&
        stats.nDocs <= 32768 && stats.vocab <= 16384)
      bitmapContainment(sets, stats.vocab, threshold)
    else prefixContainment(sets, threshold)
  }

  /** Dense-regime containment: per-doc word bitmaps (the
    * [[bitmapJaccard]] encoding), every a<b pair scored once with the
    * codegen'd popcount sum, both DIRECTED rows emitted from the one
    * undirected intersection. */
  private[graft] def bitmapContainment(sets: DataFrame, vocab: Long,
                                       threshold: Double): DataFrame = {
    val nWords = ((vocab + 63) / 64).toInt
    val bm = docBitmaps(sets, vocab)
    val a = bm.select(col("doc_id").as("da") +:
      (0 until nWords).map(w => col(s"w$w").as(s"a$w")) :+ col("n").as("nda"): _*)
    val b = bm.select(col("doc_id").as("db") +:
      (0 until nWords).map(w => col(s"w$w").as(s"b$w")) :+ col("n").as("ndb"): _*)
    val inter = (0 until nWords)
      .map(w => bit_count(col(s"a$w").bitwiseAND(col(s"b$w"))).cast("long"))
      .reduce(_ + _)
    a.join(broadcast(b), col("da") < col("db"))
      .withColumn("inter", inter)
      .filter(col("inter") > 0) // parity with the posting-list form
      .select(explode(array(
        struct(col("da").as("ca"), col("db").as("cb"),
          col("inter").as("i"), col("nda").as("nn")),
        struct(col("db").as("ca"), col("da").as("cb"),
          col("inter").as("i"), col("ndb").as("nn")))).as("p"))
      .select(col("p.ca").as("doc_a"), col("p.cb").as("doc_b"),
        col("p.i").as("inter"), col("p.nn").as("na"),
        (col("p.i").cast("double") / col("p.nn")).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Zipf-regime containment: asymmetric prefix filter + bounded
    * verify (see [[containmentPairs]]). */
  private[graft] def prefixContainment(sets: DataFrame,
                                       threshold: Double): DataFrame = {
    val sizes = sets.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val cands = prefixRelation(sets, threshold).as("a")
      .join(sets.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val inter = cands
      .join(sets.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .select(col("doc_a"), col("doc_b"), col("inter"), col("na"),
        (col("inter").cast("double") / col("na")).as("containment"))
      .filter(col("containment") >= threshold)
  }

  def containmentPairsSql(threshold: Double = 0.8): String =
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |           FROM documents),
       |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
       |              i -> toks[i] || ' ' || toks[i+1])) AS sh
       |       FROM t),
       |d AS (SELECT DISTINCT doc_id, sh FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS n FROM d GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |          FROM d a JOIN d b ON a.sh = b.sh AND a.doc_id <> b.doc_id
       |          GROUP BY 1, 2)
       |SELECT i.doc_a, i.doc_b, i.inter, s.n AS na,
       |       CAST(i.inter AS DOUBLE) / s.n AS containment
       |FROM inter i JOIN sizes s ON s.doc_id = i.doc_a
       |WHERE CAST(i.inter AS DOUBLE) / s.n >= $threshold""".stripMargin

  // ---- MinHash + LSH fuzzy dedup -------------------------------------

  private val MinhashSeeds = 0 until 8 // 8 hashes → 4 bands × 2 rows

  /** MinHash signatures (8 portable hashes over bigram shingles),
    * computed inline per shingle instance: the map-side hash work stays
    * inside one codegen stage feeding the partial-aggregate mins — no
    * extra shuffle. (Measured alternative: dedup-shingles-then-join
    * halves the md5 calls but adds two shuffles and ran ~2× slower.)
    * The 8-hash family costs ONE md5 per instance, not 8: both 64-bit
    * halves of the digest give independent mod-p values (lo, hi), and
    * g_s = (lo + s·hi) mod p (Kirsch–Mitzenmacher) derives the rest
    * with long/decimal arithmetic — measured ~2× on the whole query
    * (the digest over the shingle string dominated the map side). */
  private def signatures(spark: SparkSession, d: String): DataFrame =
    signaturesOf(docs(spark, d))

  /** [[signatures]] over an ARBITRARY prepared docs frame (doc_id,
    * toks) — the batch-scoped entry: per-doc MinHash is independent of
    * every other document, so signing a filtered frame yields rows
    * identical to signing the corpus and filtering after, without
    * paying the corpus. */
  private def signaturesOf(docsDf: DataFrame): DataFrame = {
    val sh = docsDf
      .select(col("doc_id"), explode(expr(shinglesExpr(2))).as("sh"))
    val (lo, hi) = graft.functions.ColumnFunctions.hash64Pair(col("sh"), "mh")
    val mins = MinhashSeeds.map { s =>
      val g = if (s == 0) lo
        // lo + s·hi ≤ 8·(p−1) overflows Long → DECIMAL(21,0) intermediate
        else ((lo.cast("decimal(21,0)") + lit(s.toLong) * hi.cast("decimal(21,0)"))
          % lit(HashPrime)).cast("long")
      min(g).as(s"h$s")
    }
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** Bigram-shingle array of a text Column, computed PER ROW (no
    * tokenization relation) — the streaming-side twin of
    * [[shinglesExpr]] (same trim/split/concat conventions). */
  private[graft] def rowShingles(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-row MinHash band array over a text Column — the SAME hash
    * family as [[signatures]] (one md5 per shingle instance,
    * Kirsch–Mitzenmacher double hashing, 4 bands × 2 rows), but
    * computed with higher-order array functions instead of an
    * explode+groupBy, so it works on an unbounded stream row by row
    * (graft.streaming.StreamingJobs.streamingCrossDedup). Returns an
    * array of 4 (band, x, y) structs; shingle-less rows get null mins,
    * which never equality-match a corpus band. */
  private[graft] def rowBands(text: Column): Column = {
    val hp = transform(rowShingles(text), s => {
      val (lo, hi) = graft.functions.ColumnFunctions.hash64Pair(s, "mh")
      struct(lo.as("lo"), hi.as("hi"))
    })
    val sigs = MinhashSeeds.map { s =>
      if (s == 0) array_min(transform(hp, p => p("lo")))
      else array_min(transform(hp, p =>
        ((p("lo").cast("decimal(21,0)") +
          lit(s.toLong) * p("hi").cast("decimal(21,0)")) % lit(HashPrime))
          .cast("long")))
    }
    array(MinhashSeeds.grouped(2).zipWithIndex.map { case (ss, bi) =>
      struct(lit(bi).as("band"), sigs(ss.head).as("x"), sigs(ss.last).as("y"))
    }.toSeq: _*)
  }

  /** Static-corpus band + shingle-set relation for the stream-static
    * dedup face: (cid, band, x, y, cshd) — [[signatures]]' band family
    * over an arbitrary (doc_id, text) frame plus the distinct-shingle
    * array the exact-Jaccard verify needs. At 100 TB this relation is
    * maintained by the batch pipeline as a table bucketed by
    * (band, x, y). */
  private[graft] def corpusBands(corpus: DataFrame): DataFrame = {
    val base = corpus.select(col("doc_id").as("cid"),
      rowBands(col("text")).as("bands"),
      array_distinct(rowShingles(col("text"))).as("cshd"))
    base.select(col("cid"), explode(col("bands")).as("b"), col("cshd"))
      .select(col("cid"), col("b.band").as("band"), col("b.x").as("x"),
        col("b.y").as("y"), col("cshd"))
  }

  /** MinHash-LSH fuzzy dedup, the scale path: band the 8-hash signature
    * into 4 bands of 2 rows, bucket-join within bands for candidate
    * pairs (equality join — no all-pairs product anywhere), then verify
    * candidates with exact bigram Jaccard and keep pairs ≥ threshold.
    * At J=0.9 a pair is caught with P = 1-(1-0.81)^4 ≈ 99.9 %; at the
    * corpus background (J≈0.03) bands almost never collide, so the
    * verify stage sees ~0.3 % of all pairs. */
  def minhashLsh(spark: SparkSession, d: String, threshold: Double = 0.5): DataFrame =
    pairCache.getOrBuild((spark, d, threshold))(
      minhashLshCompute(spark, d, threshold).persist())

  /** Session-scoped memo of the LSH-verified pair relation:
    * neardup_clusters, cluster_reps and curation_pipeline all consume
    * the SAME multi-second signature→band→verify subtree, and an
    * analytics session (one Bench/Verify run, a notebook) should pay
    * it once, not once per consumer. Keyed by (session, dir,
    * threshold); the cached frame is a persisted SLIVER (verified dup
    * pairs, not corpus data), values are deterministic, so sharing
    * cannot change any result hash. At 100 TB the same role is played
    * by a materialized pairs table the ingest pipeline maintains. */
  private val pairCache =
    new graft.SessionMemo[(SparkSession, String, Double), DataFrame]("lsh_pairs")

  /** The (doc_id, band, x, y) LSH band relation of [[signatures]] —
    * shared by the pair join and the [[lshBandStats]] tuning report. */
  private def bandRelation(spark: SparkSession, d: String): DataFrame = {
    val sig = signatures(spark, d)
    val bandCols = MinhashSeeds.grouped(2).zipWithIndex.map { case (ss, bi) =>
      struct(lit(bi).as("band"), col(s"h${ss.head}").as("x"), col(s"h${ss.last}").as("y"))
    }.toSeq
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band"), col("b.x"), col("b.y"))
  }

  private def minhashLshCompute(spark: SparkSession, d: String, threshold: Double): DataFrame = {
    val bands = bandRelation(spark, d)
    val cands = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.x") === col("b.x") &&
        col("a.y") === col("b.y") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // exact-Jaccard verification of CANDIDATES ONLY — this is the whole
    // point of LSH: the inverted-index join runs over |cands|·|shingles
    // per doc| rows, never over every pair sharing a hot shingle
    val sets = shingleSets(spark, d)
    jaccardVerify(cands, sets, threshold)
  }

  /** DuckDB twin of the tokenize→shingle→signature→[[bandRelation]]
    * prefix (t, sh, sig, bands CTEs) — shared by [[minhashLshSql]] and
    * [[lshBandStatsSql]]. */
  private def lshBandsSqlPrefix: String = {
    // same double-hashing family as [[signatures]]: one md5, two halves
    val lo = s"(md5_number_lower('mh:' || sh) % ${HashPrime}::UBIGINT)::BIGINT"
    val hi = s"(md5_number_upper('mh:' || sh) % ${HashPrime}::UBIGINT)::BIGINT"
    val h = (s: Int) =>
      if (s == 0) s"min($lo)"
      else s"min(((($lo)::HUGEINT + $s * ($hi)::HUGEINT) % ${HashPrime})::BIGINT)"
    s"""t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |           FROM documents),
       |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
       |              i -> toks[i] || ' ' || toks[i+1])) AS sh
       |       FROM t),
       |sig AS (SELECT doc_id, ${MinhashSeeds.map(s => s"${h(s)} AS h$s").mkString(", ")}
       |        FROM sh GROUP BY 1),
       |bands AS (${MinhashSeeds.grouped(2).zipWithIndex.map { case (ss, bi) =>
                    s"SELECT doc_id, $bi AS band, h${ss.head} AS x, h${ss.last} AS y FROM sig"
                  }.mkString(" UNION ALL ")})""".stripMargin
  }

  def minhashLshSql(threshold: Double = 0.5): String = {
    s"""WITH $lshBandsSqlPrefix,
       |cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |          FROM bands a JOIN bands b
       |            ON a.band = b.band AND a.x = b.x AND a.y = b.y
       |           AND a.doc_id < b.doc_id),
       |d AS (SELECT DISTINCT doc_id, sh FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS n FROM d GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |          FROM d a JOIN d b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT c.doc_a, c.doc_b,
       |       CAST(inter AS DOUBLE) / (na.n + nb.n - inter) AS jaccard
       |FROM cands c
       |JOIN inter USING (doc_a, doc_b)
       |JOIN sizes na ON c.doc_a = na.doc_id
       |JOIN sizes nb ON c.doc_b = nb.doc_id
       |WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= $threshold""".stripMargin
  }

  /** LSH band-tuning telemetry — the report that says whether the
    * (bands × rows) parameters still fit the corpus: per band, the
    * distinct bucket count, the LARGEST bucket (a viral bucket means a
    * degenerate signature — stop-shingle-heavy near-empty docs — and
    * quadratic candidate fanout), the exact candidate-pair volume
    * Σ C(bucket, 2) the pair join would emit, and the banded doc
    * count. Watch max_bucket and candidate_pairs grow out of
    * proportion to n_docs → re-tune bands/rows or pre-filter
    * degenerate docs. Output (band, n_buckets, max_bucket,
    * candidate_pairs, n_docs).
    *
    * Scale: the [[signatures]] subtree plus one (band,x,y)-keyed
    * map-side-combined count and one |bands|-group fold — strictly
    * cheaper than the pair join it predicts; candidate_pairs comes
    * from bucket COUNTS (cnt·(cnt−1)/2), never from materializing
    * pairs. */
  def lshBandStats(spark: SparkSession, d: String): DataFrame =
    bandRelation(spark, d)
      .groupBy("band", "x", "y").agg(count(lit(1)).as("cnt"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_buckets"),
        max(col("cnt")).as("max_bucket"),
        sum(expr("cnt * (cnt - 1) DIV 2")).as("candidate_pairs"),
        sum(col("cnt")).as("n_docs"))

  def lshBandStatsSql(): String =
    s"""WITH $lshBandsSqlPrefix,
       |bk AS (SELECT band, x, y, count(*) AS cnt FROM bands GROUP BY 1, 2, 3)
       |SELECT band, count(*) AS n_buckets,
       |       CAST(max(cnt) AS BIGINT) AS max_bucket,
       |       CAST(sum(cnt * (cnt - 1) // 2) AS BIGINT) AS candidate_pairs,
       |       CAST(sum(cnt) AS BIGINT) AS n_docs
       |FROM bk GROUP BY 1""".stripMargin

  /** MinHash calibration: estimated-vs-exact Jaccard for every LSH
    * candidate pair — the quality-control report that closes the
    * "measure, don't guess" loop on the banding parameters
    * ([[lshBandStats]] predicts candidate VOLUME; this measures
    * candidate QUALITY). Per band-collision pair: the number of
    * agreeing signature components (the unbiased MinHash estimator —
    * Broder 1997, "On the resemblance and containment of documents"),
    * the implied estimate matches/8, and the exact bigram Jaccard
    * (0.0 when a degenerate hash collision produced a candidate with
    * no shared shingle). A calibration where high-estimate pairs
    * score low exact Jaccard means the signature family is too short
    * for the corpus's shingle distribution — add hashes or rows per
    * band before trusting LSH verdicts at scale.
    *
    * Scale: the [[signatures]]/[[bandRelation]] subtree (shared with
    * the pair join), the banded candidate join, one 8-column
    * signature probe per side, and the candidates-only exact verify —
    * the same sliver-sized relations minhash_lsh itself touches,
    * never all-pairs. */
  def minhashCalibration(spark: SparkSession, d: String): DataFrame =
    calibCache.getOrBuild((spark, d))(
      minhashCalibrationCompute(spark, d).persist())

  /** Session memo of the calibration relation (the [[pairCache]]
    * rationale: a sliver-sized deterministic result over the same
    * multi-second signature subtree — pay it once per session). */
  private val calibCache =
    new graft.SessionMemo[(SparkSession, String), DataFrame]("minhash_calibration")

  private def minhashCalibrationCompute(spark: SparkSession, d: String): DataFrame = {
    val sig = signatures(spark, d)
    val bands = bandRelation(spark, d)
    val cands = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.x") === col("b.x") &&
        col("a.y") === col("b.y") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sa = sig.select(col("doc_id").as("doc_a") +:
      MinhashSeeds.map(s => col(s"h$s").as(s"a$s")): _*)
    val sb = sig.select(col("doc_id").as("doc_b") +:
      MinhashSeeds.map(s => col(s"h$s").as(s"b$s")): _*)
    val matches = MinhashSeeds.map(s =>
      when(col(s"a$s") === col(s"b$s"), 1L).otherwise(0L)).reduce(_ + _)
    val exact = jaccardVerify(cands, shingleSets(spark, d), 0.0)
    cands.join(sa, "doc_a").join(sb, "doc_b")
      .select(col("doc_a"), col("doc_b"), matches.as("sig_matches"))
      .join(exact, Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"), col("sig_matches"),
        // denominator is the seed-family size, never a literal: if
        // MinhashSeeds ever widens, the estimate stays correct (ADVICE r8)
        (col("sig_matches").cast("double") / lit(MinhashSeeds.size.toDouble))
          .as("est_jaccard"),
        coalesce(col("jaccard"), lit(0.0)).as("jaccard"))
  }

  def minhashCalibrationSql(): String = {
    val matches = MinhashSeeds
      .map(s => s"CASE WHEN sa.h$s = sb.h$s THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH $lshBandsSqlPrefix,
       |cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |          FROM bands a JOIN bands b
       |            ON a.band = b.band AND a.x = b.x AND a.y = b.y
       |           AND a.doc_id < b.doc_id),
       |m AS (SELECT c.doc_a, c.doc_b, CAST($matches AS BIGINT) AS sig_matches
       |      FROM cands c
       |      JOIN sig sa ON sa.doc_id = c.doc_a
       |      JOIN sig sb ON sb.doc_id = c.doc_b),
       |d AS (SELECT DISTINCT doc_id, sh FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS n FROM d GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |          FROM d a JOIN d b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT m.doc_a, m.doc_b, m.sig_matches,
       |       CAST(m.sig_matches AS DOUBLE) / ${MinhashSeeds.size}.0
       |         AS est_jaccard,
       |       coalesce(CAST(i.inter AS DOUBLE) / (na.n + nb.n - i.inter), 0.0)
       |         AS jaccard
       |FROM m
       |LEFT JOIN inter i ON i.doc_a = m.doc_a AND i.doc_b = m.doc_b
       |JOIN sizes na ON m.doc_a = na.doc_id
       |JOIN sizes nb ON m.doc_b = nb.doc_id""".stripMargin
  }

  /** SimHash calibration — the [[minhashCalibration]] twin for the
    * second LSH family (closes the same measure-don't-guess loop for
    * the 60-bit fingerprint): per band-collision candidate pair, the
    * Hamming distance, the observed bit-agreement fraction
    * `(60 − hamming)/60` — Charikar 2002's random-hyperplane estimator
    * of `1 − θ/π` — and the EXACT cosine between the two documents'
    * distinct-bigram incidence vectors (`|A∩B| / √(|A|·|B|)`, the
    * similarity the ±1 vote construction approximates). A pair planted
    * as a near-dup must show bit_agree ≈ 1 − acos(cos)/π; degenerate
    * band collisions surface as high-hamming/low-cos rows. The trig
    * mapping itself is asserted in tests, not emitted: cos()/acos()
    * are not correctly-rounded across engines, while every emitted
    * column here is integer arithmetic, one IEEE division, and one
    * IEEE sqrt — bit-identical in Spark and DuckDB.
    *
    * Scale: the [[simhash]] relation (memoized, one long per doc), its
    * 4×15-bit band self-join (the same sliver [[simhashPairs]] buckets
    * on), one XOR+POPCNT per candidate, and the candidates-only
    * shingle-intersection verify — never all-pairs. Session-memoized
    * like the minhash sliver (same rationale: deterministic,
    * sliver-sized, probed by repeated bench passes). */
  def simhashCalibration(spark: SparkSession, d: String): DataFrame =
    simCalibCache.getOrBuild((spark, d))(
      simhashCalibrationCompute(spark, d).persist())

  private val simCalibCache =
    new graft.SessionMemo[(SparkSession, String), DataFrame]("simhash_calibration")

  private def simhashCalibrationCompute(spark: SparkSession, d: String): DataFrame = {
    val sim = simhash(spark, d)
    val bands = sim.select(col("doc_id"), col("simhash"),
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("chunk", expr("shiftright(simhash, CAST(band * 15 AS INT)) & 32767"))
    val cands = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("ha"), col("b.simhash").as("hb"))
      .distinct()
    val sets = shingleSets(spark, d)
    val sizes = sets.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cands.select("doc_a", "doc_b")
      .join(sets.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    cands
      .withColumn("hamming",
        graft.plans.GraftFunctions.hamming64(col("ha"), col("hb")))
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("hamming"),
        ((lit(60) - col("hamming")).cast("double") / lit(60.0)).as("bit_agree"),
        (coalesce(col("inter"), lit(0L)).cast("double") /
          sqrt((col("na") * col("nb")).cast("double"))).as("cos"))
  }

  def simhashCalibrationSql(): String =
    s"""WITH $simhashCtes,
       |bands AS (SELECT doc_id, simhash, band,
       |            (simhash >> (band * 15)) & 32767 AS chunk
       |          FROM sim, range(0, 4) r(band)),
       |cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |            a.simhash AS ha, b.simhash AS hb
       |          FROM bands a JOIN bands b
       |            ON a.band = b.band AND a.chunk = b.chunk
       |           AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |            count(*) AS inter
       |          FROM tok a JOIN tok b
       |            ON a.tok = b.tok AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT c.doc_a, c.doc_b,
       |       CAST(bit_count(xor(c.ha, c.hb)) AS INTEGER) AS hamming,
       |       CAST(60 - bit_count(xor(c.ha, c.hb)) AS DOUBLE)
       |         / CAST(60 AS DOUBLE) AS bit_agree,
       |       COALESCE(CAST(i.inter AS DOUBLE), 0.0)
       |         / sqrt(CAST(na.n * nb.n AS DOUBLE)) AS cos
       |FROM cands c
       |LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
       |JOIN sizes na ON na.doc_id = c.doc_a
       |JOIN sizes nb ON nb.doc_id = c.doc_b""".stripMargin

  /** Incremental (cross-corpus) dedup — the "dedup the NEW crawl
    * against everything already ingested" pipeline stage, distinct
    * from [[minhashLsh]]'s whole-corpus self-join: only `newSource`
    * documents are scored, only new×corpus pairs are candidates, and
    * each new document gets ONE verdict —
    *
    *  - `exact`: byte-identical to a corpus document (sha-256 equality
    *    join; the shuffle key is the 32-byte digest, never the text);
    *  - `near`: no exact twin, but an LSH band collision with a corpus
    *    document verified at exact bigram Jaccard ≥ `threshold`;
    *  - `keep`: neither.
    *
    * `match_id` is the smallest matching corpus doc_id under the
    * verdict's tier (−1 for keep) — deterministic, so the DuckDB twin
    * hash-matches. Reuses [[signatures]]' banded MinHash family and
    * [[jaccardVerify]]'s candidates-only exact verify.
    *
    * Scale: the asymmetric shape is the point — a daily batch is
    * orders of magnitude smaller than the accumulated corpus, so the
    * new side's bands broadcast, the corpus side never self-joins, and
    * the verify stage touches only new×corpus collisions. In a real
    * deployment the corpus band/signature relation is precomputed once
    * and stored (bucketed by (band,x,y)); here both sides derive from
    * one table to stay within the harness's single-dir contract. */
  def crossDedup(spark: SparkSession, d: String, newSource: String = "src5",
                 threshold: Double = 0.5): DataFrame = {
    val src = Tables.documents(spark, d).select(col("doc_id"), col("source"), col("text"))
    val bands = signatures(spark, d)
      .select(col("doc_id"), explode(array(crossDedupBandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band"), col("b.x"), col("b.y"))
      .join(src.select(col("doc_id"), col("source")), "doc_id")
    crossDedupServe(
      src.filter(col("source") === newSource).select(col("doc_id"), col("text")),
      src.filter(col("source") =!= newSource)
        .select(sha2(col("text"), 256).as("h"), col("doc_id").as("cid")),
      bands.filter(col("source") =!= newSource),
      bands.filter(col("source") === newSource),
      shingleSets(spark, d), threshold)
  }

  private def crossDedupBandCols: Seq[Column] =
    MinhashSeeds.grouped(2).zipWithIndex.map { case (ss, bi) =>
      struct(lit(bi).as("band"), col(s"h${ss.head}").as("x"), col(s"h${ss.last}").as("y"))
    }.toSeq

  /** The SERVING core of cross-corpus dedup — verdicts for a new batch
    * against CORPUS-side relations that may be inline ([[crossDedup]])
    * or loaded from the persisted signature store
    * ([[crossDedupPersisted]]): serving never re-signs the corpus. */
  private def crossDedupServe(newDocs: DataFrame, corpusSha: DataFrame,
                              corpusBands: DataFrame, newBands: DataFrame,
                              sets: DataFrame, threshold: Double): DataFrame = {
    val exact = newDocs
      .select(col("doc_id"), sha2(col("text"), 256).as("h"))
      .join(corpusSha, "h")
      .groupBy("doc_id").agg(min(col("cid")).as("exact_id"))
    val cands = newBands.as("a")
      .join(corpusBands.as("b"),
        col("a.band") === col("b.band") && col("a.x") === col("b.x") &&
        col("a.y") === col("b.y"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // the ASYMMETRIC verify kernel (r16): per-side candidate-id
    // semi-joins prune the shingle relation to candidate docs before
    // any shuffle (the r15 move, now split per side), each corpus
    // array ships ONCE per candidate doc, and the batch side's arrays
    // broadcast — per-pair shuffle is two longs where the symmetric
    // kernel shipped ~KB arrays per pair (47.4M pairs at the 100×
    // store — StageProbe r16 measured that exchange as ~90% of the
    // serve wall). Identical verdicts: same arrays, same integers.
    val near = jaccardVerifyAsym(cands, sets, threshold,
        batchDocs = Some(newDocs))
      .groupBy(col("doc_a").as("doc_id")).agg(min(col("doc_b")).as("near_id"))
    newDocs.select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_id").isNotNull, lit("exact"))
          .when(col("near_id").isNotNull, lit("near"))
          .otherwise(lit("keep")).as("verdict"),
        coalesce(col("exact_id"), col("near_id"), lit(-1L)).as("match_id"))
  }

  /** [[crossDedup]] served from the PERSISTED corpus signature store —
    * the incremental-ingest production shape: the corpus side (content
    * hashes, LSH bands, shingle sets — the expensive, corpus-sized
    * relations) is signed ONCE and saved via
    * `IndexStore.saveDedupSignatures`; every arriving batch computes
    * only its OWN hashes/bands/shingles and joins the loaded artifact.
    * Deterministic signing + lossless artifact ⇒ identical verdicts,
    * so this query SHARES cross_dedup's DuckDB oracle.
    *
    * Scale: re-signing a 100 TB corpus per arriving batch is the cost
    * this store removes — the daily ingest job appends new keepers to
    * the artifact instead (the same relations, so append is a parquet
    * write). Per batch, the work is O(batch) signing + the band
    * equi-join against the store. */
  def crossDedupPersisted(spark: SparkSession, d: String,
                          newSource: String = "src5",
                          threshold: Double = 0.5): DataFrame = {
    val path = graft.sources.IndexStore.artifactPath("dedup", s"$d|$newSource")
    val (sha, bands, sets) =
      dedupSignatureFrames(spark, d, col("source") =!= newSource)
    graft.sources.IndexStore.saveDedupSignatures(spark, sha, bands, sets, path)
    crossDedupAgainstStore(spark, d, path, newSource, threshold)
  }

  /** The signature relations of the docs matching `pred` — the unit
    * the store saves ([[crossDedupPersisted]]) and appends (keepers
    * joining the corpus via `IndexStore.appendDedupSignatures`):
    * (content sha → doc, LSH band keys, shingle sets). */
  def dedupSignatureFrames(spark: SparkSession, d: String, pred: Column)
      : (DataFrame, DataFrame, DataFrame) =
    // filter FIRST, sign the filtered frame: per-doc sha/MinHash/
    // shingles are independent of every other document, so this yields
    // rows identical to the former sign-corpus-then-join shape — but a
    // slice append signs O(slice), not O(corpus) (the former shape
    // paid a full-corpus MinHash pass per call, measured as a
    // superlinear term of the 100× ingest-loop decade)
    dedupSignatureFramesOf(Tables.documents(spark, d).filter(pred))

  /** [[dedupSignatureFrames]] over an ARBITRARY (doc_id, text) frame —
    * the unit a foreachBatch ingest loop signs per arriving batch
    * ([[graft.streaming.StreamingJobs]].crossDedupIngestLoop). */
  private[graft] def dedupSignatureFramesOf(base: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val withToks = base.withColumn("toks", expr(toksExpr))
    val sha = base
      .select(sha2(col("text"), 256).as("h"), col("doc_id").as("cid"))
    val bands = signaturesOf(withToks)
      .select(col("doc_id"), explode(array(crossDedupBandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band"), col("b.x"), col("b.y"))
    (sha, bands, shingleSetsOf(withToks))
  }

  /** Serve one arriving (doc_id, text) batch against pre-loaded corpus
    * signature relations — the foreachBatch ingest loop's per-batch
    * body: sign the batch, run [[crossDedupServe]] (the asym verify
    * kernel) against the mounted relations. Verdicts are identical to
    * [[crossDedupAgainstStore]] over the same rows: each doc's verdict
    * depends only on itself vs the store, so batch boundaries cannot
    * change answers. */
  private[graft] def crossDedupServeAgainst(
      corpus: (DataFrame, DataFrame, DataFrame),
      newDocs: DataFrame, threshold: Double): DataFrame = {
    val (cSha, cBands, cSets) = corpus
    val (_, newBands, newSets) =
      dedupSignatureFramesOf(newDocs.select(col("doc_id"), col("text")))
    crossDedupServe(newDocs.select(col("doc_id"), col("text")),
      cSha, cBands, newBands, cSets.union(newSets).distinct(), threshold)
  }

  /** Dedup an arriving batch against an EXISTING signature store — the
    * steady-state ingest entry: only the batch is signed; the corpus
    * side arrives from `IndexStore.loadDedupSignatures`.
    *
    * Batch-size contract: the serve kernel broadcasts the BATCH side's
    * shingle arrays ([[jaccardVerifyAsym]]), sized for sanely-sliced
    * ingest batches; a batch whose estimated arrays exceed
    * [[AsymBatchMaxBytes]] (256 MB ≈ ~100k KB-sized docs) is served by
    * the symmetric shuffle kernel automatically — identical verdicts,
    * no driver-side failure mode. */
  def crossDedupAgainstStore(spark: SparkSession, d: String, path: String,
                             newSource: String,
                             threshold: Double = 0.5): DataFrame =
    // (the union inside crossDedupServeAgainst is DISTINCT: a doc
    // present on BOTH sides — an already-appended batch re-served
    // against the store, the ingest-retry shape — would otherwise
    // double its shingle rows and zero the Jaccard denominator
    // (na + nb − inter) on its self-pair)
    crossDedupServeAgainst(
      graft.sources.IndexStore.loadDedupSignatures(spark, path),
      Tables.documents(spark, d).filter(col("source") === newSource)
        .select(col("doc_id"), col("text")), threshold)

  def crossDedupSql(newSource: String = "src5", threshold: Double = 0.5): String = {
    val lo = s"(md5_number_lower('mh:' || sh) % ${HashPrime}::UBIGINT)::BIGINT"
    val hi = s"(md5_number_upper('mh:' || sh) % ${HashPrime}::UBIGINT)::BIGINT"
    val h = (s: Int) =>
      if (s == 0) s"min($lo)"
      else s"min(((($lo)::HUGEINT + $s * ($hi)::HUGEINT) % ${HashPrime})::BIGINT)"
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |           FROM documents),
       |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
       |              i -> toks[i] || ' ' || toks[i+1])) AS sh
       |       FROM t),
       |sig AS (SELECT doc_id, ${MinhashSeeds.map(s => s"${h(s)} AS h$s").mkString(", ")}
       |        FROM sh GROUP BY 1),
       |bands AS (${MinhashSeeds.grouped(2).zipWithIndex.map { case (ss, bi) =>
                    s"SELECT doc_id, $bi AS band, h${ss.head} AS x, h${ss.last} AS y FROM sig"
                  }.mkString(" UNION ALL ")}),
       |bsrc AS (SELECT b.*, d.source FROM bands b JOIN documents d USING (doc_id)),
       |cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |          FROM bsrc a JOIN bsrc b
       |            ON a.band = b.band AND a.x = b.x AND a.y = b.y
       |          WHERE a.source = '$newSource' AND b.source <> '$newSource'),
       |dd AS (SELECT DISTINCT doc_id, sh FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS n FROM dd GROUP BY 1),
       |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS inter
       |          FROM cands c
       |          JOIN dd a ON a.doc_id = c.doc_a
       |          JOIN dd b ON b.doc_id = c.doc_b AND b.sh = a.sh
       |          GROUP BY 1, 2),
       |near AS (SELECT i.doc_a AS doc_id, min(i.doc_b) AS near_id
       |         FROM inter i
       |         JOIN sizes na ON na.doc_id = i.doc_a
       |         JOIN sizes nb ON nb.doc_id = i.doc_b
       |         WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= $threshold
       |         GROUP BY 1),
       |exact AS (SELECT dn.doc_id, min(dc.doc_id) AS exact_id
       |          FROM documents dn JOIN documents dc ON dn.text = dc.text
       |          WHERE dn.source = '$newSource' AND dc.source <> '$newSource'
       |          GROUP BY 1)
       |SELECT n.doc_id,
       |       CASE WHEN e.exact_id IS NOT NULL THEN 'exact'
       |            WHEN nr.near_id IS NOT NULL THEN 'near'
       |            ELSE 'keep' END AS verdict,
       |       COALESCE(e.exact_id, nr.near_id, -1) AS match_id
       |FROM documents n
       |LEFT JOIN exact e ON e.doc_id = n.doc_id
       |LEFT JOIN near nr ON nr.doc_id = n.doc_id
       |WHERE n.source = '$newSource'""".stripMargin
  }

  // ---- SimHash --------------------------------------------------------

  /** 60-bit SimHash over distinct bigram shingles (portable hash, seed
    * 42): per bit, majority vote of the shingles' hash bits. Near-dup
    * docs land within small Hamming distance; downstream bucketing
    * (4×15-bit chunks, [[simhashPairs]]) gives another LSH family.
    * Bigram features, not unigrams: over a small shared vocabulary,
    * unigram word-sets collide wholesale (this corpus: 448 pairs at
    * Hamming 0) while bigrams separate near-dups (≤12) from background
    * (≥15) cleanly. Bits 0..59 keep the value signed-safe in both
    * engines. */
  def simhash(spark: SparkSession, d: String): DataFrame =
    simhashCache.getOrBuild((spark, d)) {
      val toks = docs(spark, d)
        .select(col("doc_id"),
          explode(array_distinct(expr(shinglesExpr(2)))).as("tok"))
        .withColumn("h", hash64(col("tok"), 42))
      // 60 static vote aggregates instead of a 60× bit-explode: the
      // shuffle carries 60 partial sums per doc, never |shingles|×60 rows
      val votes = (0 until 60).map { i =>
        sum(when(col("h").bitwiseAND(lit(1L << i)) > 0, 1).otherwise(-1)).as(s"v$i")
      }
      val value = (0 until 60)
        .map(i => when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce(_ + _)
      toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
        .select(col("doc_id"), value.as("simhash"))
        .persist()
    }

  /** Session memo of the simhash relation (one long per doc — tiny):
    * simhash, simhash_pairs and edit_distance_pairs all fold the same
    * tokenize→shingle→vote subtree; deterministic, so shared. */
  private val simhashCache = new graft.SessionMemo[
    (SparkSession, String), DataFrame]("simhash")

  private val simhashCtes: String =
    s"""t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |           FROM documents),
       |tok AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(toks)),
       |               i -> toks[i] || ' ' || toks[i+1])) AS tok FROM t),
       |h AS (SELECT doc_id,
       |        (md5_number_lower('42:' || tok) % ${HashPrime}::UBIGINT)::BIGINT AS h
       |      FROM tok),
       |votes AS (SELECT doc_id, bit, CAST(pow(2, bit) AS BIGINT) AS mask,
       |            sum(CASE WHEN (h & CAST(pow(2, bit) AS BIGINT)) > 0
       |                     THEN 1 ELSE -1 END) AS vote
       |          FROM h, range(0, 60) r(bit) GROUP BY 1, 2, 3),
       |sim AS (SELECT doc_id,
       |          CAST(sum(CASE WHEN vote > 0 THEN mask ELSE 0 END) AS BIGINT) AS simhash
       |        FROM votes GROUP BY 1)""".stripMargin

  val simhashSql: String =
    s"WITH $simhashCtes\nSELECT doc_id, simhash FROM sim"

  /** SimHash near-dup pairs — the second LSH family: band the 60-bit
    * fingerprint into 4×15-bit chunks, bucket-join on (band, chunk),
    * verify candidates with the native codegen'd [[graft.plans.Hamming64]]
    * expression (one XOR+POPCNT per pair inside whole-stage codegen).
    * Hamming ≤ 12 over 60 bits (with a matching 15-bit band) cleanly
    * selects this corpus's planted near-dups. */
  def simhashPairs(spark: SparkSession, d: String, maxHamming: Int = 12): DataFrame = {
    val sim = simhash(spark, d)
    val bands = sim.select(col("doc_id"), col("simhash"),
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("chunk", expr("shiftright(simhash, CAST(band * 15 AS INT)) & 32767"))
    val cands = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("ha"), col("b.simhash").as("hb"))
      .distinct()
    cands
      .withColumn("hamming", graft.plans.GraftFunctions.hamming64(col("ha"), col("hb")))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  def simhashPairsSql(maxHamming: Int = 12): String =
    s"""WITH $simhashCtes,
       |bands AS (SELECT doc_id, simhash, band,
       |            (simhash >> (band * 15)) & 32767 AS chunk
       |          FROM sim, range(0, 4) r(band)),
       |cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |            a.simhash AS ha, b.simhash AS hb
       |          FROM bands a JOIN bands b
       |            ON a.band = b.band AND a.chunk = b.chunk
       |           AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
       |FROM cands
       |WHERE bit_count(xor(ha, hb)) <= $maxHamming""".stripMargin

  // ---- repetition quality signal -------------------------------------

  /** Within-document repetition signals (the Gopher/MassiveText quality
    * family: Rae et al. 2021 §A1.1): per document and n-gram order
    * n ∈ {2,3}, the fraction of n-gram occurrences that are duplicates
    * (1 − distinct/total) and the share of occurrences taken by the
    * single most frequent n-gram. High values flag boilerplate and
    * degenerate machine-generated text that per-doc length/punctuation
    * stats ([[textStats]]) miss. Long format: one row per (doc, n).
    *
    * Scale: both orders ride ONE tagged explode → one
    * (doc,n,gram)-keyed count with map-side combine → one (doc,n)
    * roll-up. Strictly per-document — no cross-doc join, nothing
    * grows with corpus size except the embarrassingly parallel scan. */
  def repetitionStats(spark: SparkSession, d: String): DataFrame = {
    val base = docs(spark, d)
    def tagged(n: Int) =
      base.filter(size(col("toks")) >= n)
        .select(col("doc_id"), lit(n).as("n"),
          explode(expr(shinglesExpr(n))).as("gram"))
    val counts = tagged(2).union(tagged(3))
      .groupBy("doc_id", "n", "gram").agg(count(lit(1)).as("cnt"))
    counts.groupBy("doc_id", "n")
      .agg(sum(col("cnt")).as("n_grams"), count(lit(1)).as("n_distinct"),
        max(col("cnt")).as("top_cnt"))
      .select(col("doc_id"), col("n"), col("n_grams"), col("n_distinct"),
        (lit(1.0) - col("n_distinct").cast("double") / col("n_grams").cast("double"))
          .as("dup_frac"),
        (col("top_cnt").cast("double") / col("n_grams").cast("double"))
          .as("top_frac"))
  }

  /** DuckDB twin of [[repetitionStats]] — integer counts divided in
    * double (IEEE-identical in both engines, no decimal routing
    * needed). */
  val repetitionStatsSql: String =
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |           FROM documents),
       |g AS (
       |  SELECT doc_id, 2 AS n, unnest(list_transform(range(1, len(toks)),
       |           i -> toks[i] || ' ' || toks[i+1])) AS gram
       |  FROM t WHERE len(toks) >= 2
       |  UNION ALL
       |  SELECT doc_id, 3 AS n, unnest(list_transform(range(1, len(toks)-1),
       |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
       |  FROM t WHERE len(toks) >= 3
       |),
       |c AS (SELECT doc_id, n, gram, count(*) AS cnt FROM g GROUP BY 1, 2, 3)
       |SELECT doc_id, n, CAST(sum(cnt) AS BIGINT) AS n_grams,
       |       count(*) AS n_distinct,
       |       1.0 - CAST(count(*) AS DOUBLE) / CAST(CAST(sum(cnt) AS BIGINT) AS DOUBLE)
       |         AS dup_frac,
       |       CAST(max(cnt) AS DOUBLE) / CAST(CAST(sum(cnt) AS BIGINT) AS DOUBLE)
       |         AS top_frac
       |FROM c GROUP BY 1, 2""".stripMargin

  // ---- benchmark contamination ---------------------------------------

  /** Train/eval contamination check (the n-gram-overlap decontamination
    * step of GPT-3 appendix C / PaLM §7): which training documents
    * share at least `minShared` distinct word n-grams with a held-out
    * benchmark set. Output: one row per contaminated (doc, bench doc)
    * pair with the distinct-shared-gram count. The benchmark here is a
    * deterministic slice of `documents` (doc_id ≡ benchRes mod
    * benchMod) standing in for an external eval table; [[contaminationWith]]
    * takes an arbitrary benchmark DataFrame.
    *
    * Scale: inverted-index equality join on the n-gram — never a doc ×
    * bench product. Real eval sets are tiny (thousands of docs), so the
    * gram-exploded benchmark side broadcasts and the check is one
    * map-side join over the corpus scan; n ≥ 5 word grams make hot-key
    * skew (stopword shingles) a non-issue. */
  def contamination(spark: SparkSession, d: String, n: Int = 5,
                    benchMod: Int = 10, benchRes: Int = 7,
                    minShared: Long = 1L): DataFrame = {
    val grams = docs(spark, d).filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(array_distinct(expr(shinglesExpr(n)))).as("gram"))
    contaminationWith(
      grams.filter(col("doc_id") % benchMod =!= benchRes),
      grams.filter(col("doc_id") % benchMod === benchRes)
        .select(col("doc_id").as("bench_id"), col("gram")),
      minShared)
  }

  /** [[contaminationWith]] driven by an ARBITRARY benchmark frame
    * (VERDICT r7 #6 — the registered exercise of the public overload):
    * the benchmark is one SOURCE slice of the corpus — the shape of a
    * real held-out eval suite living in its own table — and the corpus
    * is every other source. Same inverted-index join and scale
    * argument as [[contamination]]. */
  def contaminationBySource(spark: SparkSession, d: String,
                            benchSource: String, n: Int = 4,
                            minShared: Long = 2L): DataFrame = {
    val g = docs(spark, d).filter(size(col("toks")) >= n)
      .select(col("doc_id"), col("source"),
        explode(array_distinct(expr(shinglesExpr(n)))).as("gram"))
    contaminationWith(
      g.filter(col("source") =!= benchSource).select(col("doc_id"), col("gram")),
      g.filter(col("source") === benchSource)
        .select(col("doc_id").as("bench_id"), col("gram")),
      minShared)
  }

  /** DuckDB twin of [[contaminationBySource]]. */
  def contaminationBySourceSql(benchSource: String, n: Int = 4,
                               minShared: Long = 2L): String = {
    val parts = (1 to n).map(j => if (j == 1) "toks[i]" else s"toks[i+${j - 1}]")
      .mkString(" || ' ' || ")
    s"""WITH t AS (SELECT doc_id, source,
       |             string_split_regex(trim(text), '\\s+') AS toks
       |           FROM documents),
       |g AS (SELECT DISTINCT doc_id, source,
       |        unnest(list_transform(range(1, len(toks) - ${n - 2}),
       |               i -> $parts)) AS gram
       |      FROM t WHERE len(toks) >= $n)
       |SELECT c.doc_id, b.doc_id AS bench_id, count(*) AS n_shared
       |FROM g c JOIN g b USING (gram)
       |WHERE c.source <> '$benchSource' AND b.source = '$benchSource'
       |GROUP BY 1, 2
       |HAVING count(*) >= $minShared""".stripMargin
  }

  /** Core of [[contamination]]: corpus (doc_id, gram) × benchmark
    * (bench_id, gram) inverted-index join, distinct-overlap count. */
  def contaminationWith(corpus: DataFrame, bench: DataFrame,
                        minShared: Long): DataFrame =
    corpus.join(bench, "gram")
      .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)

  /** DuckDB twin of [[contamination]]. */
  def contaminationSql(n: Int = 5, benchMod: Int = 10, benchRes: Int = 7,
                       minShared: Long = 1L): String = {
    val parts = (1 to n).map(j => if (j == 1) "toks[i]" else s"toks[i+${j - 1}]")
      .mkString(" || ' ' || ")
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |           FROM documents),
       |g AS (SELECT DISTINCT doc_id,
       |        unnest(list_transform(range(1, len(toks) - ${n - 2}),
       |               i -> $parts)) AS gram
       |      FROM t WHERE len(toks) >= $n)
       |SELECT c.doc_id, b.doc_id AS bench_id, count(*) AS n_shared
       |FROM g c JOIN g b USING (gram)
       |WHERE c.doc_id % $benchMod <> $benchRes AND b.doc_id % $benchMod = $benchRes
       |GROUP BY 1, 2
       |HAVING count(*) >= $minShared""".stripMargin
  }

  // ---- bloom-prefiltered contamination -------------------------------

  /** Hash-pair tag for the bloom membership family. */
  private[graft] val BloomTag = "bl"

  /** Session memo of the auto-derived prefilter geometry: the sizing
    * distinct-count is deterministic per (dir, split, n), and a bench
    * pass should pay the counting job once, not once per call of each
    * of the three prefilter faces. */
  private val bloomGeomCache = new graft.SessionMemo[
    (SparkSession, String, Int, Int, Int, java.lang.Double),
    (Int, Int)]("bloom_geometry")

  private[operators] def bloomGeometry(spark: SparkSession, d: String, n: Int,
                                       benchMod: Int, benchRes: Int,
                                       targetFpr: Double)(count: => Long): (Int, Int) =
    bloomGeomCache.getOrBuild(
      (spark, d, n, benchMod, benchRes, Double.box(targetFpr)))(
      graft.plans.GraftBloom.geometryFor(count, targetFpr))

  /** The benchmark n-gram set folded to ONE Bloom filter row — the
    * broadcastable artifact both the batch prefilter and the streaming
    * face probe. Stays a DataFrame (no driver collect, no plan
    * literal): the broadcast ships m/8 bytes to every executor, the
    * exact 100 TB role the family exists for. */
  private[graft] def benchmarkBloom(benchmark: DataFrame, n: Int,
                                    k: Int, mBits: Int): DataFrame = {
    val grams = benchmark.withColumn("toks", expr(toksExpr))
      .filter(size(col("toks")) >= n)
      .select(explode(array_distinct(expr(shinglesExpr(n)))).as("gram"))
    val (lo, hi) = graft.functions.ColumnFunctions.hash64Pair(col("gram"), BloomTag)
    grams.agg(graft.plans.GraftFunctions
      .bloomState(lo, hi, k, mBits).as("bf"))
  }

  /** Distinct n-gram count of a benchmark frame — the sizing input to
    * `GraftBloom.geometryFor`, derived by the SAME gram pipeline as
    * [[benchmarkBloom]] so the filter is sized for exactly the items
    * it will hold. */
  private[graft] def benchmarkGramCount(benchmark: DataFrame, n: Int): Long =
    benchmark.withColumn("toks", expr(toksExpr))
      .filter(size(col("toks")) >= n)
      .select(explode(array_distinct(expr(shinglesExpr(n)))).as("gram"))
      .distinct().count()

  /** Attach a built filter's probe verdict to a frame of hashed grams,
    * gated on the PLAN-TIME serialized size (VERDICT r15 wrong #1 —
    * `GraftBloom.serializedBytes(k, mBits)`, geometry only, no data
    * inspection):
    *
    *  - at or below `maxLiteralBytes` the filter frame collects ONCE
    *    (bounded: the exact payload a broadcast would ship) and probes
    *    as a binary LITERAL — codegen reads the constant pool instead
    *    of re-copying a joined binary per probed row, the r15 move
    *    that made the contamination decade flat;
    *  - above it, collecting a multi-hundred-MB array to the driver
    *    and re-serializing it into EVERY stage's task binary is
    *    strictly worse than a torrent broadcast (ships once, shared
    *    across stages) and fails late — so the filter STAYS a one-row
    *    frame riding a broadcast crossJoin, paying the per-row
    *    getBinary copy to stay alive.
    *
    * Identical bits either way (`TextOpsSpec` forces a tiny threshold
    * through both paths, batch and streaming). `flagCol` is BOOLEAN. */
  private[graft] def withBloomFlag(probes: DataFrame, filterDf: DataFrame,
                                   k: Int, mBits: Int,
                                   lo: Column, hi: Column, flagCol: String,
                                   maxLiteralBytes: Long =
                                     graft.plans.GraftBloom.LiteralMaxBytes): DataFrame =
    if (graft.plans.GraftBloom.serializedBytes(k, mBits) <= maxLiteralBytes) {
      val bfBytes = filterDf.collect()(0).getAs[Array[Byte]]("bf")
      probes.withColumn(flagCol,
        graft.plans.GraftFunctions.bloomContains(lit(bfBytes), lo, hi))
    } else {
      probes.crossJoin(broadcast(filterDf.select(col("bf").as("__graft_bf"))))
        .withColumn(flagCol,
          graft.plans.GraftFunctions.bloomContains(col("__graft_bf"), lo, hi))
        .drop("__graft_bf")
    }

  /** The decontamination PREFILTER: the benchmark n-gram set folded to
    * a Bloom filter (graft.plans.GraftBloom — m bits that broadcast),
    * probed per corpus gram with `bloom_contains`. Output per candidate
    * document: distinct-gram count, bloom-flagged count, and the exact
    * benchmark-overlap count — so the query MEASURES the false-positive
    * rate (n_flagged − n_exact over the gram population) while pinning
    * the no-false-negative guarantee (n_flagged ≥ n_exact, and every
    * [[contamination]] hit is in this candidate set).
    *
    * Geometry is SIZED FROM THE DATA by default (VERDICT r11 #1):
    * `GraftBloom.geometryFor(count(distinct benchmark grams),
    * targetFpr)` — k segments meeting 2^−k ≤ targetFpr at per-segment
    * fill ≈ 1/2 (m = ⌈1.443·n⌉ word-rounded). The previous fixed
    * 4×4096 stress geometry SATURATED at 10× (every doc flagged —
    * the prefilter did zero work at exactly the scale it exists for);
    * it survives only in [[bloomCalibration]], whose point is
    * measuring error. The DuckDB oracle derives the SAME m from its
    * own gram count in pure integer arithmetic, so every count stays
    * an exact integer over deterministic bits and the oracle replays
    * the filter bit-for-bit — false positives included.
    *
    * Scale: the exact inverted-index join ([[contamination]]) must
    * materialize and broadcast the benchmark GRAM STRINGS (tens of MB
    * for a real eval suite); the prefilter broadcasts ~2.5 BYTES per
    * benchmark gram (k·1.443 bits) and probes each corpus gram in O(k)
    * word reads with no join at all — stage 2 then runs the exact join
    * only on the flagged sliver (n_flagged > 0 docs). At 100 TB that
    * sliver is the contaminated tail plus the measured per-gram FPR of
    * honest docs, not the corpus. The sizing count is one O(benchmark)
    * distinct-count job at plan build — benchmark-sized, not
    * corpus-sized. Pass explicit k/mBits > 0 to pin a geometry. */
  def contaminationBloom(spark: SparkSession, d: String, n: Int = 5,
                         benchMod: Int = 10, benchRes: Int = 7,
                         k: Int = 0, mBits: Int = 0,
                         targetFpr: Double = graft.plans.GraftBloom.DefaultTargetFpr,
                         maxLiteralBytes: Long =
                           graft.plans.GraftBloom.LiteralMaxBytes): DataFrame = {
    val grams = docs(spark, d).filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        explode(array_distinct(expr(shinglesExpr(n)))).as("gram"))
    val (lo, hi) = graft.functions.ColumnFunctions.hash64Pair(col("gram"), BloomTag)
    val hashed = grams.select(col("doc_id"), col("gram"),
      lo.as("lo"), hi.as("hi"))
    val bench = hashed.filter(col("doc_id") % benchMod === benchRes)
    val (kk, mm) =
      if (k > 0 && mBits > 0) (k, mBits)
      else bloomGeometry(spark, d, n, benchMod, benchRes, targetFpr)(
        bench.select("gram").distinct().count())
    // the built filter probes via the size-gated [[withBloomFlag]]:
    // below the ceiling it COLLECTS once (bounded: k·mBits/8 bytes —
    // the exact payload the previous broadcast shipped) and rides the
    // plan as a BINARY LITERAL read from the codegen constant pool,
    // where a crossJoin'd binary COLUMN is re-COPIED from the joined
    // row on every probe (UnsafeRow.getBinary) — measured at sf0.1 as
    // ~80% of this query's wall (StageProbe r15); above the ceiling it
    // falls back to that broadcast-column form rather than serializing
    // a giant literal into every task binary (VERDICT r15 wrong #1)
    val filterDf = bench.agg(
      graft.plans.GraftFunctions.bloomState(col("lo"), col("hi"), kk, mm)
        .as("bf"))
    val benchGrams = bench.select("gram").distinct()
      .withColumn("is_exact", lit(1L))
    withBloomFlag(hashed.filter(col("doc_id") % benchMod =!= benchRes),
        filterDf, kk, mm, col("lo"), col("hi"), "flagged", maxLiteralBytes)
      .join(broadcast(benchGrams), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(col("flagged").cast("long")).as("n_flagged"),
        sum(coalesce(col("is_exact"), lit(0L))).as("n_exact"))
      .filter(col("n_flagged") > 0)
  }

  /** DuckDB twin of [[contaminationBloom]]. In auto-geometry mode
    * (k/mBits = 0, the registered default) the `gm` CTE derives the
    * per-segment bit count from DuckDB's OWN distinct-benchmark-gram
    * count with the exact integer formula of `GraftBloom.mBitsFor`
    * (`//` is BIGINT division), and k inlines as the targetFpr-only
    * constant `GraftBloom.kFor` — both engines size the identical
    * filter from the identical count, so the bits still replay
    * bit-for-bit. */
  def contaminationBloomSql(n: Int = 5, benchMod: Int = 10, benchRes: Int = 7,
                            k: Int = 0, mBits: Int = 0,
                            targetFpr: Double = graft.plans.GraftBloom.DefaultTargetFpr): String = {
    val parts = (1 to n).map(j => if (j == 1) "toks[i]" else s"toks[i+${j - 1}]")
      .mkString(" || ' ' || ")
    val auto = !(k > 0 && mBits > 0)
    val kk = if (auto) graft.plans.GraftBloom.kFor(targetFpr) else k
    val mExpr = if (auto) "(SELECT m FROM gm)" else mBits.toString
    val gmCte = if (auto)
      s"""gm AS (SELECT greatest(64, (((count(DISTINCT gram) * 1443 + 999) // 1000
         |          + 63) // 64) * 64) AS m
         |       FROM g WHERE doc_id % $benchMod = $benchRes),
         |""".stripMargin
    else ""
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |           FROM documents),
       |g AS (SELECT DISTINCT doc_id,
       |        unnest(list_transform(range(1, len(toks) - ${n - 2}),
       |               i -> $parts)) AS gram
       |      FROM t WHERE len(toks) >= $n),
       |${gmCte}h AS (SELECT doc_id, gram,
       |        (md5_number_lower('$BloomTag:' || gram)
       |         % ${HashPrime}::UBIGINT)::BIGINT AS lo,
       |        (md5_number_upper('$BloomTag:' || gram)
       |         % ${HashPrime}::UBIGINT)::BIGINT AS hi
       |      FROM g),
       |bits AS (SELECT DISTINCT r.s,
       |           ((lo::HUGEINT + r.s * hi::HUGEINT) % ${HashPrime})::BIGINT
       |             % $mExpr AS bit
       |         FROM h CROSS JOIN range($kk) AS r(s)
       |         WHERE doc_id % $benchMod = $benchRes),
       |bgrams AS (SELECT DISTINCT gram FROM g WHERE doc_id % $benchMod = $benchRes),
       |probe AS (SELECT doc_id, gram, lo, hi FROM h
       |          WHERE doc_id % $benchMod <> $benchRes),
       |pb AS (SELECT doc_id, gram, r.s,
       |         ((lo::HUGEINT + r.s * hi::HUGEINT) % ${HashPrime})::BIGINT
       |           % $mExpr AS bit
       |       FROM probe CROSS JOIN range($kk) AS r(s)),
       |flag AS (SELECT pb.doc_id, pb.gram FROM pb
       |         JOIN bits USING (s, bit)
       |         GROUP BY pb.doc_id, pb.gram HAVING count(*) = $kk)
       |SELECT p.doc_id, count(*)::BIGINT AS n_grams,
       |       sum(CASE WHEN f.gram IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
       |         AS n_flagged,
       |       sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
       |         AS n_exact
       |FROM probe p
       |LEFT JOIN flag f ON f.doc_id = p.doc_id AND f.gram = p.gram
       |LEFT JOIN bgrams b ON b.gram = p.gram
       |GROUP BY p.doc_id
       |HAVING sum(CASE WHEN f.gram IS NOT NULL THEN 1 ELSE 0 END) > 0""".stripMargin
  }

  /** Estimator audit for the bloom prefilter, in the family's
    * calibration convention (minhash_calibration / simhash_calibration /
    * cms_calibration): one row over the GRAM population — members must
    * all flag (the zero-false-negative guarantee as a testable column
    * pair), non-members flag at the measured FPR, and the prediction
    * the filter's own fill gauge implies (mean fill^k) sits alongside
    * for comparison. Both rates are float64 arithmetic over exact
    * integers (division + a multiplication chain — each operation
    * correctly rounded, so the DuckDB twin reproduces the bits and the
    * gate hashes doubles too). Same deliberately mid-loaded stress
    * geometry as [[contaminationBloom]]: a production-sized filter
    * would measure FPR = 0 on this corpus and audit nothing. */
  def bloomCalibration(spark: SparkSession, d: String, n: Int = 5,
                       benchMod: Int = 10, benchRes: Int = 7,
                       k: Int = 4, mBits: Int = 4096): DataFrame = {
    val grams = docs(spark, d).filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        explode(array_distinct(expr(shinglesExpr(n)))).as("gram"))
    val benchGrams = grams.filter(col("doc_id") % benchMod === benchRes)
      .select("gram").distinct()
    val (blo, bhi) = graft.functions.ColumnFunctions.hash64Pair(col("gram"), BloomTag)
    // collected-literal probe, same move as contaminationBloom: the
    // filter and its fill gauge are ONE bounded row
    val bloomRow = benchGrams.select(blo.as("lo"), bhi.as("hi"))
      .agg(graft.plans.GraftFunctions.bloomState(col("lo"), col("hi"), k, mBits)
        .as("bf"))
      .withColumn("bits_set", graft.plans.GraftFunctions.bloomBitsSet(col("bf")))
      .collect()(0)
    val bfBytes = bloomRow.getAs[Array[Byte]]("bf")
    val bitsSet = bloomRow.getAs[Long]("bits_set")
    val probes = grams.filter(col("doc_id") % benchMod =!= benchRes)
      .select("gram").distinct()
      .select(col("gram"), blo.as("lo"), bhi.as("hi"))
      .join(broadcast(benchGrams.withColumn("is_member", lit(1L))),
        Seq("gram"), "left")
      .withColumn("flagged",
        graft.plans.GraftFunctions.bloomContains(lit(bfBytes), col("lo"), col("hi"))
          .cast("long"))
      .withColumn("member", coalesce(col("is_member"), lit(0L)))
    val agg = probes.agg(
      count(lit(1)).as("n_probes"),
      sum(col("member")).as("n_members"),
      sum(col("member") * col("flagged")).as("members_flagged"),
      sum(lit(1L) - col("member")).as("n_nonmembers"),
      sum((lit(1L) - col("member")) * col("flagged")).as("nonmembers_flagged"),
      max(lit(bitsSet)).as("bits_set"))
    val fill = col("bits_set").cast("double") / lit(k.toLong * mBits)
    agg.select(col("n_probes"), col("n_members"), col("members_flagged"),
      col("n_nonmembers"), col("nonmembers_flagged"), col("bits_set"),
      (col("nonmembers_flagged").cast("double") / col("n_nonmembers"))
        .as("measured_fpr"),
      (1 to k).map(_ => fill).reduce(_ * _).as("predicted_fpr"))
  }

  def bloomCalibrationSql(n: Int = 5, benchMod: Int = 10, benchRes: Int = 7,
                          k: Int = 4, mBits: Int = 4096): String = {
    val parts = (1 to n).map(j => if (j == 1) "toks[i]" else s"toks[i+${j - 1}]")
      .mkString(" || ' ' || ")
    val fill = s"(bits_set::DOUBLE / ${k.toLong * mBits})"
    val predicted = Seq.fill(k)(fill).mkString(" * ")
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |           FROM documents),
       |g AS (SELECT DISTINCT doc_id,
       |        unnest(list_transform(range(1, len(toks) - ${n - 2}),
       |               i -> $parts)) AS gram
       |      FROM t WHERE len(toks) >= $n),
       |bgrams AS (SELECT DISTINCT gram FROM g WHERE doc_id % $benchMod = $benchRes),
       |pgrams AS (SELECT DISTINCT gram FROM g WHERE doc_id % $benchMod <> $benchRes),
       |bh AS (SELECT gram,
       |         (md5_number_lower('$BloomTag:' || gram)
       |          % ${HashPrime}::UBIGINT)::BIGINT AS lo,
       |         (md5_number_upper('$BloomTag:' || gram)
       |          % ${HashPrime}::UBIGINT)::BIGINT AS hi
       |       FROM bgrams),
       |bits AS (SELECT DISTINCT r.s,
       |           ((lo::HUGEINT + r.s * hi::HUGEINT) % ${HashPrime})::BIGINT
       |             % $mBits AS bit
       |         FROM bh CROSS JOIN range($k) AS r(s)),
       |ph AS (SELECT gram,
       |         (md5_number_lower('$BloomTag:' || gram)
       |          % ${HashPrime}::UBIGINT)::BIGINT AS lo,
       |         (md5_number_upper('$BloomTag:' || gram)
       |          % ${HashPrime}::UBIGINT)::BIGINT AS hi
       |       FROM pgrams),
       |pb AS (SELECT gram, r.s,
       |         ((lo::HUGEINT + r.s * hi::HUGEINT) % ${HashPrime})::BIGINT
       |           % $mBits AS bit
       |       FROM ph CROSS JOIN range($k) AS r(s)),
       |flag AS (SELECT pb.gram FROM pb JOIN bits USING (s, bit)
       |         GROUP BY pb.gram HAVING count(*) = $k),
       |probe AS (SELECT p.gram,
       |            CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END AS member,
       |            CASE WHEN f.gram IS NOT NULL THEN 1 ELSE 0 END AS flagged
       |          FROM pgrams p
       |          LEFT JOIN bgrams b ON b.gram = p.gram
       |          LEFT JOIN flag f ON f.gram = p.gram),
       |sums AS (SELECT count(*)::BIGINT AS n_probes,
       |           sum(member)::BIGINT AS n_members,
       |           sum(member * flagged)::BIGINT AS members_flagged,
       |           sum(1 - member)::BIGINT AS n_nonmembers,
       |           sum((1 - member) * flagged)::BIGINT AS nonmembers_flagged,
       |           (SELECT count(*) FROM bits)::BIGINT AS bits_set
       |         FROM probe)
       |SELECT n_probes, n_members, members_flagged, n_nonmembers,
       |       nonmembers_flagged, bits_set,
       |       nonmembers_flagged::DOUBLE / n_nonmembers AS measured_fpr,
       |       $predicted AS predicted_fpr
       |FROM sums""".stripMargin
  }

  // ---- near-dup cluster resolution -----------------------------------

  /** The step every pair-emitting dedup operator needs to become an
    * actual dedup: connected components over the [[minhashLsh]] near-dup
    * graph, one canonical document kept per component. Output is one
    * row per document: its cluster id (the minimum doc_id reachable
    * through near-dup edges — singletons are their own cluster) and an
    * is_canonical 0/1 keep flag (reference intent: the keep-lowest-id
    * convention of `dedup_exact`, lifted from exact-hash groups to
    * fuzzy-match components).
    *
    * Execution is Pregel-style min-label propagation: labels start as
    * each node's own id; each round every node takes the min of its
    * label and its neighbors' labels (one equality join on the
    * symmetrized edge list + one map-side-combined min-agg per round);
    * stop when no label changed. Rounds = graph diameter, and near-dup
    * graphs are overwhelmingly tiny star/clique components (this
    * corpus: diameter ≤ 2, so 2-3 rounds), so the loop is short and
    * each round is a bounded shuffle of |V|+|E| rows — no transitive
    * closure is ever materialized. The per-round driver action is one
    * count() on changed labels (a scalar, not a collect). At 100 TB the
    * same loop holds (edges ≪ docs after LSH banding); for adversarial
    * high-diameter graphs [[propagateLabels]] escalates automatically
    * to the alternating large-star/small-star variant
    * ([[largeStarSmallStar]], Kiveris et al.) after a bounded round
    * cap — O(log n) rounds regardless of diameter, equivalence-tested
    * against union-find on a diameter-32 path (ClusterResolutionSpec). */
  def neardupClusters(spark: SparkSession, d: String, threshold: Double = 0.5,
                      maxDriverPairs: Long = 1L << 20): DataFrame = {
    // the pair relation is the session-memoized [[minhashLsh]] frame —
    // persisted there, shared with cluster_reps/curation_pipeline
    val pairs = minhashLsh(spark, d, threshold)
      .select(col("doc_a"), col("doc_b"))
    val nPairs = pairs.count()
    // cost-based strategy pick, same pattern as [[chooseJaccardStrategy]]:
    // the pair set is already LSH-banded AND exact-verified, so it is a
    // sliver of the corpus — when it fits the driver comfortably, a
    // local union-find replaces the whole iterative job graph (the
    // collect is of a bounded aggregate, not of corpus data). Past the
    // cap, distributed min-label propagation takes over.
    val clustered =
      if (nPairs <= maxDriverPairs) driverUnionFind(spark, pairs)
      else propagateLabels(pairs)
    val out = Tables.documents(spark, d).select(col("doc_id"))
      .join(clustered, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    out.select(col("doc_id"), col("cluster_id"),
      (col("doc_id") === col("cluster_id")).cast("long").as("is_canonical"))
  }

  /** Small-graph branch: path-compressed union-find on the driver with
    * min-id roots; returns (doc_id, cluster_id) for edge endpoints
    * only (singletons are filled by the caller's left join). */
  private[graft] def driverUnionFind(spark: SparkSession, pairs: DataFrame): DataFrame = {
    val es = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    // iterative find: min-id union (no rank) can build chains linear in
    // the component size, and at the 2^20-pair cap a recursive walk
    // would overflow the driver thread stack before compression kicks in
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (c != r) { val n = parent.getOrElse(c, c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = es.flatMap { case (a, b) => Seq(a, b) }.distinct
    val se = spark; import se.implicits._
    broadcast(nodes.map(n => (n, find(n))).toSeq.toDF("doc_id", "cluster_id"))
  }

  /** Scale branch: Pregel-style min-label propagation over edge
    * endpoints only — per round ONE equality join + ONE map-side-
    * combined min-agg; rounds = component diameter (near-dup graphs:
    * tiny stars/cliques). Convergence is probed join-free via the
    * exact decimal label sum, which is strictly monotone decreasing
    * and stalls exactly at the fixpoint. Diameter-many rounds is the
    * right cost for the star/clique components LSH produces, but an
    * adversarial chain-shaped component would make it linear — so past
    * `maxRounds` un-converged rounds the loop hands the SAME pair set
    * to [[largeStarSmallStar]] (Kiveris et al.), whose alternating
    * contractions finish in O(log n) rounds regardless of diameter.
    * The wasted prefix is `maxRounds` bounded shuffles of an
    * LSH-verified sliver — a constant, not a scale term. */
  private[graft] def propagateLabels(pairs: DataFrame, maxRounds: Int = 8): DataFrame = {
    val edges = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("node")),
        struct(col("doc_b").as("src"), col("doc_a").as("node")))).as("e"))
      .select(col("e.src"), col("e.node")).persist()
    var labels = edges.select(col("node")).distinct()
      .withColumn("label", col("node")).persist()
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val msgs = edges.join(labels.withColumnRenamed("node", "src"), "src")
        .select(col("node"), col("label"))
      // localCheckpoint (eager), not persist: persist caps recompute but
      // the LOGICAL plan still nests every prior round, and Catalyst
      // re-analysis goes super-linear with depth — the classic iterative-
      // algorithm trap. Checkpointing rebases each round on a LogicalRDD,
      // keeping per-round planning cost constant.
      val next = labels.union(msgs).groupBy("node")
        .agg(min(col("label")).as("label")).localCheckpoint(true)
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels.unpersist()
      labels = next
      rounds += 1
    }
    edges.unpersist()
    if (!converged) {
      labels.unpersist()
      largeStarSmallStar(pairs)
    } else
      labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Adversarial-diameter escalation: alternating large-star/small-star
    * connected components (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14 — public algorithm). Each round is
    * two (groupBy-min + equality-join) passes over the edge sliver:
    *
    *  - large-star(u): link every neighbor v > u to m = min(Γ(u) ∪ {u});
    *  - small-star(u): over larger→smaller directed edges, link u and
    *    all its smaller neighbors to their minimum.
    *
    * Both preserve connectivity; the composition halves component
    * height per round, so a diameter-D chain finishes in O(log D)
    * rounds where min-label propagation needs D. Fixpoint = every
    * component a star centered at its minimum id; the final directed
    * (larger → smaller) edge list IS the (doc_id, cluster_id) map for
    * non-center nodes (centers/singletons are filled by the caller's
    * left-join-coalesce, same contract as [[driverUnionFind]]). */
  private[graft] def largeStarSmallStar(pairs: DataFrame): DataFrame = {
    // canonical directed form: (a, b) with a > b, self-loops dropped
    def canon(df: DataFrame): DataFrame =
      df.select(greatest(col("a"), col("b")).as("a"),
                least(col("a"), col("b")).as("b"))
        .where(col("a") =!= col("b")).distinct()
    var edges = canon(pairs.select(col("doc_a").as("a"), col("doc_b").as("b")))
      .persist()
    var nEdges = edges.count()
    var done = nEdges == 0L
    while (!done) {
      // large-star: symmetrize, m(u) = min(Γ(u) ∪ {u}), link v>u to m
      val sym = edges.select(col("a").as("u"), col("b").as("v"))
        .union(edges.select(col("b").as("u"), col("a").as("v")))
      val mLarge = sym.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val afterLarge = canon(
        sym.join(mLarge, "u").where(col("v") > col("u"))
          .select(col("v").as("a"), col("m").as("b"))).persist()
      // small-star: directed a>b; per center a link {b…, a} to min(b…)
      val mSmall = afterLarge.groupBy("a").agg(min(col("b")).as("m"))
      // localCheckpoint, not persist: the loop-carried edge set must not
      // nest every prior round's plan (see propagateLabels)
      val next = canon(
        afterLarge.join(mSmall, "a")
          .select(explode(array(
            struct(col("b").as("x"), col("m").as("y")),
            struct(col("a").as("x"), col("m").as("y")))).as("e"))
          .select(col("e.x").as("a"), col("e.y").as("b"))).localCheckpoint(true)
      val nNext = next.count()
      done = nNext == nEdges && next.except(edges).isEmpty
      afterLarge.unpersist()
      edges.unpersist()
      edges = next
      nEdges = nNext
    }
    edges.select(col("a").as("doc_id"), col("b").as("cluster_id"))
  }

  /** DuckDB twin of [[neardupClusters]]: the [[minhashLshSql]] pair
    * query nested as a CTE, then a recursive reachability closure —
    * min reachable id ≡ the propagation fixpoint (both compute the
    * component minimum; UNION set-semantics terminates the recursion
    * on the cyclic symmetrized graph). */
  def neardupClustersSql(threshold: Double = 0.5): String =
    s"""WITH RECURSIVE pairs AS (
       |${minhashLshSql(threshold)}
       |), edges AS (
       |  SELECT doc_a AS src, doc_b AS node FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS node FROM pairs
       |), reach(node, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.node, r.r FROM reach r JOIN edges e ON e.src = r.node
       |)
       |SELECT node AS doc_id, min(r) AS cluster_id,
       |       CAST(node = min(r) AS BIGINT) AS is_canonical
       |FROM reach GROUP BY node""".stripMargin

  // ---- canonical-representative selection ----------------------------

  /** Per near-dup cluster, the document to KEEP — longest text wins,
    * ties to the lowest doc_id (the usual "best representative"
    * curation policy after fuzzy dedup; cf. the keep-lowest-id rule of
    * [[dedupExact]]). Only non-singleton clusters surface: singletons
    * need no decision and would dominate the output at scale.
    *
    * Scale: clusters come from [[neardupClusters]] (LSH-bounded pair
    * stream, never all-pairs). Cluster sizes are a map-side-combined
    * groupBy (NOT an unordered count window — that shape would force
    * the whole corpus through one exchange just to discard
    * singletons), and the keep-longest rank compiles to Partial+Final
    * WindowGroupLimit, so each map task emits one candidate per
    * cluster before its shuffle. The final inner join against the
    * ≥2-sized clusters drops singletons and is broadcast-able: true
    * dup clusters are a sliver of the corpus. */
  def clusterReps(spark: SparkSession, d: String, threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = neardupClusters(spark, d, threshold)
    val sizes = clusters.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
    val winners = clusters
      .join(Tables.documents(spark, d).select(col("doc_id"), col("n_chars")), "doc_id")
      .withColumn("rn", row_number().over(Window.partitionBy(col("cluster_id"))
        .orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rn") === 1)
    winners.join(sizes, "cluster_id")
      .select(col("cluster_id"), col("doc_id").as("rep_id"), col("n_docs"))
  }

  def clusterRepsSql(threshold: Double = 0.5): String =
    s"""WITH sized AS (
       |  SELECT c.cluster_id, d.doc_id, d.n_chars
       |  FROM (
       |${neardupClustersSql(threshold)}
       |  ) c JOIN documents d USING (doc_id)
       |)
       |SELECT cluster_id, rep_id, n_docs FROM (
       |  SELECT cluster_id, doc_id AS rep_id,
       |         count(*) OVER (PARTITION BY cluster_id) AS n_docs,
       |         row_number() OVER (PARTITION BY cluster_id
       |                            ORDER BY n_chars DESC, doc_id) AS rn
       |  FROM sized
       |) WHERE rn = 1 AND n_docs >= 2""".stripMargin

  /** Near-dup CLUSTER-SIZE histogram — the one-screen duplication
    * profile of a corpus (how much is singletons, how much lives in
    * pathological mega-clusters): for each cluster size, how many
    * clusters and how many documents they hold. The standard readout
    * for choosing a dedup keep-policy and for spotting boilerplate
    * explosions before they dominate a training mix.
    *
    * Scale: inherits [[neardupClusters]]'s audited (and session-
    * memoized) pair lineage, then two strictly-shrinking map-side-
    * combined aggregations (corpus → clusters → sizes); ≤ |corpus|
    * then ≤ |distinct sizes| rows. All counts exact int64. */
  def clusterSizeHist(spark: SparkSession, d: String, threshold: Double = 0.5): DataFrame =
    neardupClusters(spark, d, threshold)
      .groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))

  def clusterSizeHistSql(threshold: Double = 0.5): String =
    s"""SELECT cluster_size, count(*) AS n_clusters,
       |       CAST(cluster_size * count(*) AS BIGINT) AS n_docs
       |FROM (
       |  SELECT cluster_id, count(*) AS cluster_size
       |  FROM (
       |${neardupClustersSql(threshold)}
       |  ) GROUP BY 1
       |) GROUP BY 1""".stripMargin

  // ---- edit-distance verify over LSH candidates ----------------------

  /** Character-level near-dup pairs: SimHash-band candidates verified
    * by RELATIVE Levenshtein distance (dist ≤ maxRel · longer-text
    * length) — the expensive exact metric the hash sketches
    * approximate, run only where it is affordable. The O(|a|·|b|)
    * dynamic program never touches the full pair space: candidates
    * come from [[simhashPairs]]'s 4×15-bit band equality joins, so the
    * verify cost is O(candidates), not O(n²).
    *
    * `levenshtein` is a codegen'd builtin in both engines (identical
    * classic-DP semantics on this ASCII corpus), so the oracle is
    * bit-exact. */
  def editDistancePairs(spark: SparkSession, d: String, maxRel: Double = 0.4,
                        maxHamming: Int = 12): DataFrame = {
    val texts = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    simhashPairs(spark, d, maxHamming)
      .join(texts.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
      .join(texts.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
      .withColumn("edit_dist", levenshtein(col("ta"), col("tb")).cast("long"))
      .filter(col("edit_dist") <= lit(maxRel) * greatest(length(col("ta")), length(col("tb"))))
      .select(col("doc_a"), col("doc_b"), col("edit_dist"))
  }

  def editDistancePairsSql(maxRel: Double = 0.4, maxHamming: Int = 12): String =
    s"""WITH cand AS (
       |  SELECT doc_a, doc_b FROM (
       |${simhashPairsSql(maxHamming)}
       |  ) s
       |), scored AS (
       |  -- one levenshtein DP per candidate: score in a subquery, filter
       |  -- on the alias (projection+WHERE would run the O(|a|·|b|) DP twice)
       |  SELECT c.doc_a, c.doc_b,
       |         CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
       |         greatest(length(da.text), length(db.text)) AS max_len
       |  FROM cand c
       |  JOIN documents da ON da.doc_id = c.doc_a
       |  JOIN documents db ON db.doc_id = c.doc_b
       |)
       |SELECT doc_a, doc_b, edit_dist FROM scored
       |WHERE edit_dist <= $maxRel * max_len""".stripMargin

  // ---- distributed exact quantiles -----------------------------------

  /** Exact per-language document-length quantiles via RANGE-PARTITIONED
    * order statistics — the DISTRIBUTED form of exact quantiles.
    * Spark's builtin `percentile` aggregate buffers every value of a
    * group in executor memory (an OpenHashMap per group), and the naive
    * `row_number() OVER (PARTITION BY lang ORDER BY v)` pushes an
    * entire language through ONE task's external sort; at 100 TB a
    * single language is billions of rows, so neither survives. Instead:
    *
    *  1. bucket each value into a fixed-width value range
    *     (`b = floor(v / W)` — order-preserving, so every rank in
    *     bucket b is ≥ every rank in bucket b−1, and ties of equal v
    *     land in the same bucket);
    *  2. count per (lang, bucket) — ONE map-side-combined shuffle of
    *     the full data, emitting only (lang, bucket, cnt) slivers;
    *  3. on that tiny relation, prefix-sum the counts per lang to get
    *     each bucket's global start rank, and per-lang totals n → the
    *     two bracketing ranks lo/hi per quantile;
    *  4. semi-join the data back to ONLY the buckets that contain a
    *     bracketing rank (broadcast — ≤ 2·|qs| buckets per lang) and
    *     rank inside those buckets: `row_number() OVER (PARTITION BY
    *     lang, b ORDER BY v) − 1 + start` = the exact global rank.
    *
    * No task ever sorts more than one bucket (~n/B rows); the plan has
    * >1 task per language by construction. Bucket boundaries are
    * static (no sampling pass) because the domain here is a document
    * length; for an unbounded/skewed domain, sample-derived boundaries
    * (RangePartitioner-style) slot into step 1 without touching the
    * rank arithmetic — balance affects only performance, never the
    * answer.
    *
    * Quantiles are restricted to quarter fractions (k/4): with integer
    * data, pos = q·(n−1), frac, and vlo + (vhi−vlo)·frac are all exact
    * in IEEE double (multiplying by 0.25/0.5/0.75 is exact), so the
    * linear-interpolation result is bit-identical across engines and
    * evaluation orders — no float-parity risk in the oracle hash. */
  def docQuantiles(spark: SparkSession, d: String,
                   qs: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.forall(q => (q * 4) == math.rint(q * 4) && q >= 0 && q <= 1),
      "quarter-fraction quantiles only (exact-arithmetic guarantee)")
    val bucketWidth = 64.0d
    val base = Tables.documents(spark, d)
      .select(col("lang"), col("n_chars").cast("double").as("v"))
      .withColumn("b", floor(col("v") / bucketWidth).cast("long"))
    // (lang, bucket) → cnt: the only full-data shuffle, map-side combined
    val bCounts = base.groupBy("lang", "b").agg(count(lit(1)).as("cnt"))
    // tiny relation from here on: prefix-sum per lang → bucket start rank
    val wStart = Window.partitionBy(col("lang")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withStart = bCounts.withColumn("start",
      coalesce(sum(col("cnt")).over(wStart), lit(0L)))
    val qx = bCounts.groupBy("lang").agg(sum(col("cnt")).as("n"))
      .select(col("lang"), col("n"), explode(array(qs.map(lit): _*)).as("q"))
      .withColumn("pos", col("q") * (col("n") - 1))
      .withColumn("lo", floor(col("pos")).cast("long"))
      .withColumn("hi", ceil(col("pos")).cast("long"))
    // buckets that contain a bracketing rank: start <= r < start + cnt
    val needed = withStart.as("bk")
      .join(qx.as("t"), col("bk.lang") === col("t.lang") &&
        ((col("t.lo") >= col("bk.start") && col("t.lo") < col("bk.start") + col("bk.cnt")) ||
         (col("t.hi") >= col("bk.start") && col("t.hi") < col("bk.start") + col("bk.cnt"))))
      .select(col("bk.lang").as("lang"), col("bk.b").as("b"), col("bk.start").as("start"))
      .distinct()
    // rank only inside the bracketing buckets — each (lang, b) its own task
    val ranked = base.join(broadcast(needed), Seq("lang", "b"))
      .withColumn("rk",
        row_number().over(Window.partitionBy(col("lang"), col("b")).orderBy(col("v")))
          - 1 + col("start"))
    // renamed projections break the shared-lineage ambiguity of the
    // double self-join back to `ranked`
    val loSide = ranked.select(col("lang").as("l_lang"), col("rk").as("l_rk"),
      col("v").as("v_lo"))
    val hiSide = ranked.select(col("lang").as("h_lang"), col("rk").as("h_rk"),
      col("v").as("v_hi"))
    loSide
      .join(broadcast(qx), col("l_lang") === col("lang") && col("l_rk") === col("lo"))
      .join(hiSide, col("h_lang") === col("lang") && col("h_rk") === col("hi"))
      .select(col("lang"), col("q"),
        (col("v_lo") + (col("v_hi") - col("v_lo")) * (col("pos") - col("lo")))
          .as("quantile"))
  }

  def docQuantilesSql(qs: Seq[Double] = Seq(0.25, 0.5, 0.75)): String = {
    val vals = qs.map(q => s"($q)").mkString(", ")
    s"""WITH ranked AS (
       |  SELECT lang, CAST(n_chars AS DOUBLE) AS v,
       |         row_number() OVER (PARTITION BY lang ORDER BY n_chars) - 1 AS rk
       |  FROM documents
       |), qx AS (
       |  SELECT lang, count(*) AS n, CAST(q AS DOUBLE) AS q
       |  FROM documents, (VALUES $vals) AS qs(q)
       |  GROUP BY lang, q
       |), pts AS (
       |  SELECT lang, q, q * (n - 1) AS pos,
       |         CAST(floor(q * (n - 1)) AS BIGINT) AS lo,
       |         CAST(ceil(q * (n - 1)) AS BIGINT) AS hi
       |  FROM qx
       |)
       |SELECT p.lang, p.q,
       |       vlo.v + (vhi.v - vlo.v) * (p.pos - p.lo) AS quantile
       |FROM pts p
       |JOIN ranked vlo ON vlo.lang = p.lang AND vlo.rk = p.lo
       |JOIN ranked vhi ON vhi.lang = p.lang AND vhi.rk = p.hi""".stripMargin
  }

  // ---- corpus heavy hitters ------------------------------------------

  /** The (token, cnt) occurrence relation — THE corpus token-frequency
    * table every vocabulary-level operator shares (tokenTopK here;
    * Corpus.tokenFreqHist and Corpus.pmiBigrams' unigram side), so the
    * empty-token convention lives in exactly one place. One explode +
    * one map-side-combined count shuffle. */
  private[graft] def tokenCounts(spark: SparkSession, d: String): DataFrame =
    docs(spark, d)
      .select(explode(col("toks")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** DuckDB twin of [[tokenCounts]] — splice as a CTE/subquery. */
  private[graft] val tokenCountsSql: String =
    """SELECT token, count(*) AS cnt FROM (
      |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
      |    FROM documents
      |  ) WHERE length(token) > 0
      |  GROUP BY token""".stripMargin

  /** Top-k most frequent tokens corpus-wide (vocabulary head — stopword
    * discovery, tokenizer sanity, Zipf-fit checks). [[tokenCounts]] →
    * TakeOrdered top-k (orderBy+limit never global-sorts: each
    * partition keeps a k-heap and the driver merges k·p rows). Ties
    * break on the token string so the cut is deterministic. */
  def tokenTopK(spark: SparkSession, d: String, k: Int = 20): DataFrame =
    tokenCounts(spark, d)
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  def tokenTopKSql(k: Int = 20): String =
    s"""SELECT token, cnt FROM (
       |  $tokenCountsSql
       |)
       |ORDER BY cnt DESC, token
       |LIMIT $k""".stripMargin

  /** EXACT frequent tokens (support > n/k) via a two-pass
    * sketch-then-verify plan — the Misra–Gries '82 / Agarwal et al.
    * PODS'12 mergeable-summaries pattern:
    *
    *  1. Sketch pass: ONE global [[graft.plans.FreqSketch]] aggregate
    *     (map-side partial per split, O(k) buffer, merged to ≤ k
    *     candidate tokens) + the exact total token count in the same
    *     aggregate — the MG invariant guarantees every token with true
    *     count > n/k is among the candidates.
    *  2. Verify pass: re-scan tokens, broadcast-semi-join against the
    *     ≤ k candidates, exact count of candidates only, keep
    *     `cnt·k > n` (integer compare — no float threshold).
    *
    * Output is EXACT (the sketch decides what gets shuffled, never what
    * is reported), so the DuckDB oracle is the plain GROUP BY/HAVING
    * form. Scale story vs. a single exact groupBy: at web-corpus scale
    * the token long tail dominates the shuffle (billions of hapax
    * keys); here the shuffle after pass 2's map-side semi-join carries
    * only occurrences of ≤ k head tokens, and pass 1 shuffles one O(k)
    * sketch row per task. Two corpus scans traded for a
    * vocabulary-free shuffle — the right trade when the scan is
    * column-pruned parquet and the vocabulary is Zipf. */
  def heavyHitters(spark: SparkSession, d: String, k: Int = 48): DataFrame = {
    val toks = docs(spark, d)
      .select(explode(col("toks")).as("token"))
      .filter(length(col("token")) > 0)
    val sketch = toks.agg(
      graft.plans.GraftFunctions.freqSketch(col("token"), k).as("cands"),
      count(lit(1)).as("n"))
    val cands = sketch.select(explode(col("cands")).as("token"), col("n"))
    toks.join(broadcast(cands), Seq("token"))
      .groupBy(col("token"), col("n"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > col("n"))
      .select(col("token"), col("cnt"))
  }

  def heavyHittersSql(k: Int = 48): String =
    s"""WITH t AS (
       |  SELECT token FROM (
       |    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
       |    FROM documents
       |  ) WHERE length(token) > 0
       |), n AS (SELECT count(*) AS n FROM t)
       |SELECT token, count(*) AS cnt
       |FROM t, n
       |GROUP BY token, n.n
       |HAVING count(*) * $k > n.n""".stripMargin

  // ---- Count-Min token-frequency sketches (frequency as data) --------

  /** CM geometry shared by the three cms_* queries and their oracles —
    * one definition so Spark and the SQL twins can never drift. */
  private val CmsDepth = graft.plans.GraftCms.DefaultDepth
  private val CmsWidth = graft.plans.GraftCms.DefaultWidth

  /** Hash-pair tag for the CM token family (distinct from minhash's
    * "mh" so bucket structure is independent of the signature family). */
  private[operators] val CmsTag = "cms"

  /** (source, token, lo, hi) — one md5 per token instance, both
    * portable 64-bit halves (Kirsch–Mitzenmacher base pair). */
  private def cmsTokenHashes(spark: SparkSession, d: String): DataFrame = {
    val toks = docs(spark, d)
      .select(col("source"), explode(col("toks")).as("token"))
      .filter(length(col("token")) > 0)
    val (lo, hi) = graft.functions.ColumnFunctions.hash64Pair(col("token"), CmsTag)
    toks.select(col("source"), col("token"), lo.as("lo"), hi.as("hi"))
  }

  /** Per-source Count-Min sketch leaves — the frequency twin of the
    * per-day bitmap/theta leaves: each source folds to ONE d×w counter
    * matrix, so the shuffle after the map-side partial carries
    * O(sources · d·w·8) bytes regardless of vocabulary size (vs the
    * exact tf relation's O(distinct-tokens) rows — the long tail that
    * dominates a web-corpus shuffle). */
  private def cmsSourceLeaves(spark: SparkSession, d: String,
                              depth: Int = CmsDepth,
                              width: Int = CmsWidth): DataFrame =
    cmsTokenHashes(spark, d)
      .groupBy("source")
      .agg(graft.plans.GraftFunctions.cmsState(col("lo"), col("hi"),
        lit(1L), depth, width).as("sk"))

  /** DuckDB twin of the merged sketch's bucket mass table: mass of
    * (row s, bucket) = Σ cnt over tokens hashing there — counter
    * addition commutes, so the global bucket table equals the merged
    * per-source leaves bucket-for-bucket. Splice as a CTE; expects a
    * CTE `h(token, cnt, lo, hi)` in scope. */
  private def cmsBucketsSql(depth: Int, width: Int): String =
    s"""SELECT r.s, ((h.lo::HUGEINT + r.s * h.hi::HUGEINT) % ${HashPrime})::BIGINT
       |         % $width AS bkt,
       |       sum(h.cnt)::BIGINT AS mass
       |  FROM h CROSS JOIN range($depth) AS r(s)
       |  GROUP BY r.s, bkt""".stripMargin

  /** The token→(lo, hi) hash CTE twin — md5_number_lower/_upper of
    * "cms:&lt;token&gt;" mod p, the verified hash64Pair byte order. */
  private def cmsHashSql: String =
    s"""SELECT token, cnt,
       |    (md5_number_lower('$CmsTag:' || token)
       |     % ${HashPrime}::UBIGINT)::BIGINT AS lo,
       |    (md5_number_upper('$CmsTag:' || token)
       |     % ${HashPrime}::UBIGINT)::BIGINT AS hi
       |  FROM tf""".stripMargin

  /** Head-token count estimates from the MERGED per-source CM leaves,
    * next to the exact counts — the "probe the sketch, don't re-scan
    * the text" query. Probes are the exact global top-k tokens
    * (deterministic tie-break on the token string); `overcount` is the
    * sketch's additive error on each, bounded by (e/width)·N per row
    * with prob 1 − e^(−depth).
    *
    * Every number is an exact integer (counters are sums; est is a min
    * of sums), so the DuckDB oracle replays the whole sketch from the
    * same portable hash pair and hash-matches bit-for-bit — the CM
    * analog of the bitmap family's oracle story.
    *
    * Scale: the sketch side shuffles O(sources·d·w); the probe side is
    * the head of the exact tf relation (already needed by tokenTopK's
    * TakeOrdered) cross-joined with a broadcast 1-row merged sketch —
    * zero extra text scans. */
  def cmsTopkEst(spark: SparkSession, d: String, k: Int = 50): DataFrame = {
    val merged = cmsSourceLeaves(spark, d)
      .agg(graft.plans.GraftFunctions.cmsMerge(col("sk")).as("sk"))
    val probes = tokenCounts(spark, d)
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)
    val (lo, hi) = graft.functions.ColumnFunctions.hash64Pair(col("token"), CmsTag)
    probes.crossJoin(broadcast(merged))
      .select(col("token"), col("cnt"),
        graft.plans.GraftFunctions.cmsEst(col("sk"), lo, hi).as("est"))
      .withColumn("overcount", col("est") - col("cnt"))
  }

  def cmsTopkEstSql(k: Int = 50): String =
    s"""WITH tf AS (
       |  $tokenCountsSql
       |), h AS (
       |  $cmsHashSql
       |), bs AS (
       |  ${cmsBucketsSql(CmsDepth, CmsWidth)}
       |), probe AS (
       |  SELECT token, cnt, lo, hi FROM h ORDER BY cnt DESC, token LIMIT $k
       |)
       |SELECT p.token, p.cnt, min(bs.mass)::BIGINT AS est,
       |       (min(bs.mass) - p.cnt)::BIGINT AS overcount
       |FROM probe p
       |JOIN bs ON bs.bkt = ((p.lo::HUGEINT + bs.s * p.hi::HUGEINT)
       |                     % ${HashPrime})::BIGINT % $CmsWidth
       |GROUP BY p.token, p.cnt""".stripMargin

  /** Sketch error profile over the WHOLE vocabulary: for every distinct
    * token, the CM overestimate est − cnt; reported as a one-row
    * summary (probe count, exactly-answered count, max/total
    * overestimate, exact corpus mass from the sketch vs the tf
    * relation — equal by the row-mass invariant). The calibration
    * query of the family, like theta_calibration / qsample_calibration:
    * it MEASURES the (e/w)·N bound instead of citing it.
    *
    * Geometry is a deliberately TIGHT stress config (depth 4 × width
    * 8): the test corpus vocabulary is far below the production
    * width's collision point, so at 4×2048 every probe would come back
    * exact and the calibration would measure nothing — at width 8 the
    * rows are forced to collide and the oracle must replay every
    * collision bit-for-bit (a far stronger check of the bucket/min
    * machinery; production queries keep the 4×2048 default). */
  def cmsCalibration(spark: SparkSession, d: String,
                     depth: Int = 4, width: Int = 8): DataFrame = {
    val merged = cmsSourceLeaves(spark, d, depth, width)
      .agg(graft.plans.GraftFunctions.cmsMerge(col("sk")).as("sk"))
    val (lo, hi) = graft.functions.ColumnFunctions.hash64Pair(col("token"), CmsTag)
    tokenCounts(spark, d)
      .crossJoin(broadcast(merged))
      .select(col("cnt"),
        (graft.plans.GraftFunctions.cmsEst(col("sk"), lo, hi) - col("cnt")).as("over"),
        graft.plans.GraftFunctions.cmsTotal(col("sk")).as("total_sketch"))
      .agg(
        count(lit(1)).as("n_probes"),
        sum(when(col("over") === 0, 1L).otherwise(0L)).as("n_exact"),
        max(col("over")).as("max_over"),
        sum(col("over")).as("sum_over"),
        sum(col("cnt")).as("total_tokens"),
        max(col("total_sketch")).as("total_sketch"))
  }

  def cmsCalibrationSql(depth: Int = 4, width: Int = 8): String =
    s"""WITH tf AS (
       |  $tokenCountsSql
       |), h AS (
       |  $cmsHashSql
       |), bs AS (
       |  ${cmsBucketsSql(depth, width)}
       |), est AS (
       |  SELECT h.token, h.cnt, min(bs.mass)::BIGINT - h.cnt AS ov
       |  FROM h
       |  JOIN bs ON bs.bkt = ((h.lo::HUGEINT + bs.s * h.hi::HUGEINT)
       |                       % ${HashPrime})::BIGINT % $width
       |  GROUP BY h.token, h.cnt
       |)
       |SELECT count(*)::BIGINT AS n_probes,
       |       sum(CASE WHEN ov = 0 THEN 1 ELSE 0 END)::BIGINT AS n_exact,
       |       max(ov)::BIGINT AS max_over,
       |       sum(ov)::BIGINT AS sum_over,
       |       sum(cnt)::BIGINT AS total_tokens,
       |       sum(cnt)::BIGINT AS total_sketch
       |FROM est""".stripMargin

  /** Pairwise token-mix affinity of sources from their CM leaves: the
    * inner product Σ_t fₐ(t)·fᵦ(t) estimated sketch-to-sketch
    * (Cormode–Muthukrishnan §4.2 — min over rows of the bucket dot
    * product, never an underestimate) next to the exact join value.
    * The sketch side needs NO token join — two 64 KiB columns answer
    * "do these sources share a vocabulary mix", which at 100 TB is the
    * difference between a broadcast of leaves and a shuffle of two tf
    * relations. */
  def cmsSourceAffinity(spark: SparkSession, d: String): DataFrame = {
    val leaves = cmsSourceLeaves(spark, d)
    val est = leaves.as("a").join(leaves.as("b"),
        col("a.source") < col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
        graft.plans.GraftFunctions.cmsInnerProduct(col("a.sk"), col("b.sk"))
          .as("est_ip"))
    val tf = cmsTokenHashes(spark, d)
      .groupBy("source", "token").agg(count(lit(1)).as("cnt"))
    val exact = tf.as("x").join(tf.as("y"),
        col("x.token") === col("y.token") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(sum(col("x.cnt") * col("y.cnt")).as("exact_ip"))
    est.join(exact, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        coalesce(col("exact_ip"), lit(0L)).as("exact_ip"), col("est_ip"),
        (col("est_ip") - coalesce(col("exact_ip"), lit(0L))).as("over_ip"))
  }

  def cmsSourceAffinitySql(): String =
    s"""WITH tok AS (
       |  SELECT source, token FROM (
       |    SELECT source,
       |           unnest(string_split_regex(trim(text), '\\s+')) AS token
       |    FROM documents
       |  ) WHERE length(token) > 0
       |), tf AS (
       |  SELECT source, token, count(*) AS cnt FROM tok GROUP BY source, token
       |), h AS (
       |  SELECT source, token, cnt,
       |      (md5_number_lower('$CmsTag:' || token)
       |       % ${HashPrime}::UBIGINT)::BIGINT AS lo,
       |      (md5_number_upper('$CmsTag:' || token)
       |       % ${HashPrime}::UBIGINT)::BIGINT AS hi
       |  FROM tf
       |), bs AS (
       |  SELECT source, r.s,
       |         ((h.lo::HUGEINT + r.s * h.hi::HUGEINT) % ${HashPrime})::BIGINT
       |           % $CmsWidth AS bkt,
       |         sum(h.cnt)::BIGINT AS mass
       |  FROM h CROSS JOIN range($CmsDepth) AS r(s)
       |  GROUP BY source, r.s, bkt
       |), pairs AS (
       |  SELECT a.source AS source_a, b.source AS source_b
       |  FROM (SELECT DISTINCT source FROM tf) a
       |  JOIN (SELECT DISTINCT source FROM tf) b ON a.source < b.source
       |), ip AS (
       |  -- every (pair, row) gets a dot, zero included: a row s whose
       |  -- buckets are disjoint contributes dot = 0 and must win the
       |  -- min (Spark's cms_inner_product includes zero rows; an
       |  -- inner join here would silently drop them and overestimate)
       |  SELECT p.source_a, p.source_b, r.s,
       |         coalesce(sum(x.mass * y.mass), 0)::BIGINT AS dot
       |  FROM pairs p
       |  CROSS JOIN range($CmsDepth) AS r(s)
       |  LEFT JOIN bs x ON x.source = p.source_a AND x.s = r.s
       |  LEFT JOIN bs y ON y.source = p.source_b AND y.s = r.s AND y.bkt = x.bkt
       |  GROUP BY p.source_a, p.source_b, r.s
       |), estq AS (
       |  SELECT source_a, source_b, min(dot)::BIGINT AS est_ip
       |  FROM ip GROUP BY source_a, source_b
       |), exact AS (
       |  SELECT x.source AS source_a, y.source AS source_b,
       |         sum(x.cnt * y.cnt)::BIGINT AS exact_ip
       |  FROM tf x JOIN tf y ON x.token = y.token AND x.source < y.source
       |  GROUP BY x.source, y.source
       |)
       |SELECT e.source_a, e.source_b,
       |       coalesce(x.exact_ip, 0)::BIGINT AS exact_ip, e.est_ip,
       |       (e.est_ip - coalesce(x.exact_ip, 0))::BIGINT AS over_ip
       |FROM estq e
       |LEFT JOIN exact x
       |  ON x.source_a = e.source_a AND x.source_b = e.source_b""".stripMargin

  // ---- duplicated-substring spans (span-level exact dedup) ------------

  /** Seed of the dup-span gram hash (arbitrary, fixed for replay). */
  private val DupSpanSeed = 7

  /** Maximal duplicated token spans per document — SPAN-level exact
    * dedup, the granularity between whole-document [[dedupExact]] and
    * paragraph [[Corpus.cdcChunks]]: a boilerplate header or license
    * block repeated across documents is reported as one (start, end)
    * token range per occurrence, ready for cut-and-keep-the-rest
    * scrubbing (the Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", ACL'22 notion of duplicate text spans —
    * public technique; they use a suffix array, which is inherently
    * single-machine, so the distributed form here is the standard
    * gram-cover approximation).
    *
    * Semantics: an `l`-token gram instance is *duplicated* when the
    * identical gram occurs at ≥ 2 positions corpus-wide (a second
    * document OR a within-document repeat). A duplicated gram at
    * position p covers tokens [p, p+l−1]; overlapping or adjacent
    * covered ranges merge into maximal spans (gaps-and-islands with
    * merge condition pos ≤ prev + l). Every reported span is therefore
    * ≥ l tokens and its every token sits inside some duplicated gram.
    *
    * Scale shape: the positioned gram stream shuffles ONCE on the gram
    * hash (`repartition(h)` — explicitly placed so BOTH consumers read
    * the same exchange: the per-gram occurrence count aggregates on
    * top of it with no second exchange, and the count join-back probes
    * it sort-merge with both sides already h-partitioned; the
    * tokenization + md5 scan runs exactly once). A viral gram is a
    * single (h, cnt) row — the count is a groupBy, never a
    * per-partition window, so there is no hot-key window wall, and the
    * join-back fanout is 1:1 per position row. The island windows
    * partition by doc_id — state bounded by document length. Survivors
    * of the cnt ≥ 2 filter are the only rows that reach the doc_id
    * exchange; the final span aggregate reuses that partitioning
    * (subset clustering), adding no exchange. */
  /** Positions of DUPLICATED `l`-gram instances — the shared core of
    * [[dupSpans]] (report) and [[scrubSpans]] (rewrite). One scan: the
    * positioned gram stream shuffles once on the gram hash and both
    * consumers (occurrence count, count join-back) read that exchange. */
  private def dupGramPositions(spark: SparkSession, d: String, l: Int): DataFrame =
    dupGramCache.getOrBuild((spark, d, l))(
      dupGramPositionsBuild(spark, d, l).persist())

  /** Session memo of the duplicated-gram position SLIVER (covered
    * positions only — far smaller than the gram stream it filters):
    * dup_spans and scrub_spans share it, and each bench/verify pass
    * re-paid the 1-md5-per-gram shuffle otherwise. Deterministic. */
  private val dupGramCache = new graft.SessionMemo[
    (SparkSession, String, Int), DataFrame]("dup_gram_positions")

  private def dupGramPositionsBuild(spark: SparkSession, d: String, l: Int): DataFrame = {
    require(l >= 2, "span gram order must be >= 2")
    val pos = docs(spark, d)
      .select(col("doc_id"), posexplode(expr(shinglesExpr(l))).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        hash64(col("g"), DupSpanSeed).as("h"))
      .repartition(col("h"))
    // count(CASE WHEN doc_id NOT NULL AND pos >= 0 THEN 1 END), not
    // count(*): the value is identical (doc_id is never null, pos never
    // negative), but a plain count lets column pruning strip doc_id and
    // pos from this branch's exchange, making it canonically DIFFERENT
    // from the probe branch's and defeating ReuseExchange (two
    // tokenization+md5 scans). pos needs the `>= 0` form specifically:
    // it is generator output, so `isNotNull(pos)` constant-folds away
    // and the column gets pruned anyway. The nullable, non-foldable
    // dependency keeps both branches bit-identical, so the gram shuffle
    // materializes once and is read by both.
    val cnt = pos.groupBy("h")
      .agg(count(when(col("doc_id").isNotNull && col("pos") >= 0, lit(1)))
        .as("cnt"))
      .filter(col("cnt") >= 2)
    pos.join(cnt, "h").select(col("doc_id"), col("pos"))
  }

  /** DuckDB twin of [[dupGramPositions]]: CTE list ending at
    * `d(doc_id, pos)`, spliced into both span-family oracles. */
  private def dupGramPositionsSql(l: Int): String = {
    val gram = (0 until l).map(j => if (j == 0) "toks[i]" else s"toks[i+$j]")
      .mkString(" || ' ' || ")
    s"""t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |           FROM documents),
       |p AS (SELECT doc_id,
       |             unnest(list_transform(range(1, len(toks) - ${l - 2}),
       |               i -> {'pos': i - 1,
       |                     'h': (md5_number_lower('$DupSpanSeed:' || ($gram))
       |                           % ${HashPrime}::UBIGINT)::BIGINT})) AS s
       |      FROM t),
       |pos AS (SELECT doc_id, CAST(s.pos AS BIGINT) AS pos, s.h AS h FROM p),
       |c AS (SELECT h, count(*) AS cnt FROM pos GROUP BY 1),
       |d AS (SELECT pos.doc_id, pos.pos
       |      FROM pos JOIN c USING (h) WHERE c.cnt >= 2)""".stripMargin
  }

  /** Seed of the feature-hash dimension assignment (fixed for replay). */
  private val FeatureHashSeed = 13

  /** Hashing-trick term vectors (Weinberger et al., "Feature Hashing
    * for Large Scale Multitask Learning", ICML'09): each token maps to
    * dimension hash(token) mod `dim`, per-document counts are the
    * vector entries — model-free featurization of text into a fixed
    * dim space (the bridge from the documents table to every
    * vector-space operator: clustering, cheap similarity, drift
    * reports). Sparse output (doc_id, dim, tf) — exact integers.
    * One explode + one (doc_id, dim)-keyed map-side-combined shuffle;
    * vocabulary size never appears in the plan, which is the entire
    * point of the hashing trick at 100 TB. */
  def docTermVectors(spark: SparkSession, d: String, dim: Int = 64): DataFrame =
    termVecCache.getOrBuild((spark, d, dim)) {
      docs(spark, d)
        .select(col("doc_id"), explode(col("toks")).as("token"))
        .filter(length(col("token")) > 0)
        .select(col("doc_id"),
          pmod(hash64(col("token"), FeatureHashSeed), lit(dim.toLong)).as("dim"))
        .groupBy("doc_id", "dim")
        .agg(count(lit(1)).as("tf"))
        .persist()
    }

  /** Session memo of doc_similar_topk's DENSE per-doc vector relation
    * (arr, n², topic) — the per-call prep the query re-aggregated from
    * the sparse memo on every invocation (r17). Deterministic given
    * (dir, cell budget, dim, iters); ~n rows × dim doubles persisted.
    * The chooser's largest-cell count and both pair-join sides read
    * this one cached build. */
  private val denseDocVecCache = new graft.SessionMemo[
    (SparkSession, String, Int, Int, Int), DataFrame]("doc_similar_dense")

  /** Session memo of the sparse term-vector relation (r17): the same
    * hook as [[docTopics]]' assignment memo, one layer lower —
    * doc_similar_topk alone re-derived this chain twice per call (the
    * corpus-size count that picks the cell count, then the dense
    * build), and doc_topics/topic_keywords/doc_term_vectors each paid
    * it again. Deterministic, so every consumer shares one persisted
    * (doc_id, dim, tf) build per (session, dir, dim) with no result
    * change. At 100 TB this is the materialized feature-hash relation
    * a curation pipeline keeps next to the corpus. */
  private val termVecCache = new graft.SessionMemo[
    (SparkSession, String, Int), DataFrame]("doc_term_vectors")

  def docTermVectorsSql(dim: Int = 64): String =
    s"""SELECT doc_id, ((md5_number_lower('$FeatureHashSeed:' || token)
       |                % ${HashPrime}::UBIGINT)::BIGINT % $dim) AS dim,
       |       count(*) AS tf
       |FROM (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
       |  FROM documents
       |) WHERE length(token) > 0
       |GROUP BY 1, 2""".stripMargin

  /** Model-free topic-style document clustering: deterministic Lloyd
    * k-means ([[Similarity.ivfTrainFullFrom]] — the same audited chain
    * as ivf_train, bit-exact oracle twin) over [[docTermVectors]]'
    * hashed term-frequency vectors, densified to `dim` doubles. This is
    * content clustering WITHOUT an embedding model — the corpus
    * diversity / mixture-partitioning tool when no encoder is in the
    * loop; documents about the same tokens land in the same topic.
    * Output (doc_id, topic) — one assignment row per tokenized doc.
    *
    * Scale: the sparse→dense build is one (doc_id)-keyed aggregate
    * (dim-bounded map per doc); the chain is the ivf_train plan —
    * per iteration O(n·k·dim) map-side work, one (list,pos) agg
    * shuffle, one k×dim broadcast. Tokenless documents have no vector
    * and are absent, matching the oracle. */
  def docTopics(spark: SparkSession, d: String, k: Int = 6, dim: Int = 64,
                iters: Int = 2): DataFrame =
    topicCache.getOrBuild((spark, d, k, dim, iters)) {
      val dense = docTermVectors(spark, d, dim)
        .groupBy("doc_id")
        .agg(map_from_entries(
          collect_list(struct(col("dim").cast("int").as("k"),
            col("tf").cast("double").as("v")))).as("m"))
        .select(col("doc_id").as("vec_id"),
          transform(sequence(lit(0), lit(dim - 1)),
            i => coalesce(element_at(col("m"), i), lit(0.0))).as("embedding"))
      Similarity.ivfTrainFullFrom(dense, k, iters)._1
        .select(col("vec_id").as("doc_id"), col("list_id").as("topic"))
        .persist()
    }

  /** Session memo of the [[docTopics]] assignment — the same hook as
    * [[minhashLsh]]'s pair relation and Similarity's trained-IVF index:
    * the hashed-TF Lloyd chain is deterministic, so every consumer
    * (doc_topics, topic_keywords, ad-hoc reports) shares one persisted
    * n-row build per (session, dir, k, dim, iters) without any result
    * hash changing. At 100 TB this is the materialized topic-assignment
    * relation a curation pipeline maintains next to the corpus. */
  private val topicCache = new graft.SessionMemo[
    (SparkSession, String, Int, Int, Int), DataFrame]("doc_topics")

  def docTopicsSql(k: Int = 6, dim: Int = 64, iters: Int = 2): String = {
    val eBody =
      s"""SELECT d.doc_id AS vec_id, r.pos, CAST(coalesce(s.tf, 0) AS DOUBLE) AS v
         |  FROM (SELECT DISTINCT doc_id FROM sp) d
         |  CROSS JOIN (SELECT unnest(range(0, $dim)) AS pos) r
         |  LEFT JOIN sp s ON s.doc_id = d.doc_id AND s.dim = r.pos""".stripMargin
    s"""WITH sp AS (
       |${docTermVectorsSql(dim)}
       |), ${Similarity.ivfChainSqlFrom(k, iters, "t", eBody)}
       |SELECT vec_id AS doc_id, list_id AS topic FROM ta$iters""".stripMargin
  }

  /** Similar-document search WITHOUT an embedding model — the text-side
    * twin of the ANN family: sparse TF-cosine top-k over
    * [[docTermVectors]]' hashed vectors, with the quadratic confined to
    * [[docTopics]]' trained topic cells (the semdedup shape: a
    * document is only compared to its content cluster). Dots are
    * EXACT int64 sums of integer term frequencies; only the final
    * norm division is floating point — oracle-parity by construction.
    * Output (doc_id, similar_id, score, rank) — k rows per document
    * that shares a cell with at least one other document.
    *
    * Scale: pairs join on the trained cell only, ONE row per pair
    * carrying a dense exact-int dot (the sparse (topic, dim)
    * inverted-index alternative multiplies the pair stream by every
    * shared dimension — measured 8× slower at sf0.1); cell count
    * follows the corpus (kTopics = 0 → ⌈√n⌉ — [[Similarity.semDedup]]'s
    * argument), one per-doc WindowGroupLimit, and the assignment rides
    * the [[docTopics]] session memo. A topically HOMOGENEOUS corpus
    * collapses Lloyd cells regardless of their count — the
    * stats-driven chooser (the [[Similarity.embeddingNearDup]]
    * pattern) guards it: one largest-cell count decides the plan, and
    * beyond `maxCell` hot cells are refined by banded sign-LSH over
    * the term vectors ([[Similarity.bandedCellPairs]]) so the pair
    * stream stays O(nBands · maxCell · n); the top-k then ranks over
    * the candidate set (the documented recall trade — near-identical
    * term vectors agree on every band). */
  def docSimilarTopK(spark: SparkSession, d: String, k: Int = 3,
                     kTopics: Int = 0, dim: Int = 64, iters: Int = 2,
                     maxCell: Long = 4096, nBands: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dense = denseDocVecCache.getOrBuild((spark, d, kTopics, dim, iters)) {
      val tv = docTermVectors(spark, d, dim)
      // cells scale with the corpus (kTopics = 0 → ⌈√n⌉, floor 2) — the
      // semdedup argument: fixed cells go quadratic at 100×
      val nl = if (kTopics > 0) kTopics
        else math.max(2, math.ceil(math.sqrt(
          tv.select("doc_id").distinct().count().toDouble)).toInt)
      val assign = docTopics(spark, d, nl, dim, iters)
      // dense exact-integer vectors: ONE pair row carries the whole dot
      // (the sparse (topic, dim) inverted-index join multiplies the pair
      // stream by d̄ shared dims — measured 24× slower at sf0.1)
      // double-valued arrays + the codegen dot kernel: every entry is an
      // integer tf < 2^53, so products and the 64-term sum are EXACT in
      // double arithmetic — bit-identical to the oracle's integer fold
      // (the aggregate(zip_with(...)) HOF form allocates a pair-sized
      // array per candidate; the native kernel measured >2× on this join)
      tv.groupBy("doc_id")
        .agg(map_from_entries(collect_list(
          struct(col("dim").cast("int").as("k"),
            col("tf").cast("double").as("v")))).as("m"))
        .select(col("doc_id"),
          transform(sequence(lit(0), lit(dim - 1)),
            i => coalesce(element_at(col("m"), i), lit(0.0))).as("arr"))
        .withColumn("n2",
          graft.plans.GraftFunctions.dotF64(col("arr"), col("arr")))
        .join(assign, "doc_id")
        .persist()
    }
    val dot = graft.plans.GraftFunctions.dotF64(col("aa"), col("ab"))
    // hot-cell chooser: one tiny count over the memoized assignment
    // decides the physical plan (see scaladoc)
    val largest = dense.groupBy("topic").count()
      .agg(coalesce(max("count"), lit(0L))).head().getLong(0)
    val scored = if (largest <= maxCell) {
      val a = dense.select(col("doc_id").as("da"), col("topic"),
        col("arr").as("aa"), col("n2").as("na2"))
      val b = dense.select(col("doc_id").as("db"), col("topic"),
        col("arr").as("ab"), col("n2").as("nb2"))
      a.join(b, Seq("topic"))
        .filter(col("da") =!= col("db"))
        .select(col("da").as("doc_id"), col("db").as("similar_id"),
          (dot.cast("double") / (sqrt(col("na2")) * sqrt(col("nb2")))).as("score"))
    } else {
      val bw = Similarity.bandWidth(largest, maxCell)
      val bands = math.min(nBands, 64 / bw)
      val cand = Similarity.bandedCellPairs(
        dense.select(col("topic"), col("doc_id"), col("arr")),
        "topic", "doc_id", col("arr"), dim, bw, bands)
      // band agreement is symmetric: one undirected candidate feeds
      // both directed rows, like containment_pairs' bitmap regime
      cand.select(col("lo").as("da"), col("hi").as("db"))
        .union(cand.select(col("hi").as("da"), col("lo").as("db")))
        .join(dense.select(col("doc_id").as("da"), col("arr").as("aa"),
          col("n2").as("na2")), "da")
        .join(dense.select(col("doc_id").as("db"), col("arr").as("ab"),
          col("n2").as("nb2")), "db")
        .select(col("da").as("doc_id"), col("db").as("similar_id"),
          (dot.cast("double") / (sqrt(col("na2")) * sqrt(col("nb2")))).as("score"))
    }
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("similar_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** DuckDB twin of [[docSimilarTopK]]: the [[docTopicsSql]] chain as
    * the cell assignment, the same exact-integer dot fold, the same
    * rank cut. */
  def docSimilarTopKSql(k: Int = 3, kTopics: Int = 0, dim: Int = 64,
                        iters: Int = 2): String = {
    val eBody =
      s"""SELECT d.doc_id AS vec_id, r.pos, CAST(coalesce(s.tf, 0) AS DOUBLE) AS v
         |  FROM (SELECT DISTINCT doc_id FROM sp) d
         |  CROSS JOIN (SELECT unnest(range(0, $dim)) AS pos) r
         |  LEFT JOIN sp s ON s.doc_id = d.doc_id AND s.dim = r.pos""".stripMargin
    val nlExpr = if (kTopics > 0) kTopics.toString
      else "(SELECT GREATEST(2, CAST(ceil(sqrt(count(DISTINCT doc_id))) AS BIGINT)) FROM sp)"
    // sparse dots equal the dense Spark fold (zeros contribute nothing);
    // the LEFT JOIN + coalesce keeps the share-no-dim same-cell pairs
    // the dense form scores at 0
    s"""WITH sp AS (
       |${docTermVectorsSql(dim)}
       |), ${Similarity.ivfChainSqlFromDynamic(nlExpr, iters, "t", eBody)},
       |assign AS (SELECT vec_id AS doc_id, list_id AS topic FROM ta$iters),
       |n2 AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2 FROM sp GROUP BY 1),
       |cellpairs AS (
       |  SELECT ta.doc_id AS da, tb.doc_id AS db
       |  FROM assign ta JOIN assign tb
       |    ON tb.topic = ta.topic AND tb.doc_id <> ta.doc_id
       |), dots AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db,
       |         CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
       |  FROM sp a JOIN assign ta ON ta.doc_id = a.doc_id
       |  JOIN assign tb ON tb.topic = ta.topic
       |  JOIN sp b ON b.doc_id = tb.doc_id AND b.dim = a.dim
       |           AND b.doc_id <> a.doc_id
       |  GROUP BY 1, 2
       |), scored AS (
       |  SELECT cp.da AS doc_id, cp.db AS similar_id,
       |         CAST(coalesce(dots.dot, 0) AS DOUBLE) /
       |           (sqrt(na.n2) * sqrt(nb.n2)) AS score
       |  FROM cellpairs cp
       |  LEFT JOIN dots ON dots.da = cp.da AND dots.db = cp.db
       |  JOIN n2 na ON cp.da = na.doc_id
       |  JOIN n2 nb ON cp.db = nb.doc_id
       |)
       |SELECT doc_id, similar_id, score, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |                               ORDER BY score DESC, similar_id) AS rank
       |  FROM scored
       |) WHERE rank <= $k""".stripMargin
  }

  /** The interpretability face of [[docTopics]]: per topic, the `top`
    * highest-total-frequency tokens (tie-broken on the token) — the
    * "what is this cluster about" report attached to every model-free
    * clustering. One token explode joined to the assignment (doc-keyed
    * shuffle), a (topic, token) map-side-combined count, and a
    * WindowGroupLimit top-k over k·|vocab-per-topic| rows. */
  def topicKeywords(spark: SparkSession, d: String, k: Int = 6, dim: Int = 64,
                    iters: Int = 2, top: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs(spark, d)
      .select(col("doc_id"), explode(col("toks")).as("token"))
      .filter(length(col("token")) > 0)
    val tf = toks.join(docTopics(spark, d, k, dim, iters), "doc_id")
      .groupBy("topic", "token").agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("topic")).orderBy(col("tf").desc, col("token"))
    tf.withColumn("rank", row_number().over(w)).filter(col("rank") <= top)
  }

  def topicKeywordsSql(k: Int = 6, dim: Int = 64, iters: Int = 2,
                       top: Int = 3): String = {
    val eBody =
      s"""SELECT d.doc_id AS vec_id, r.pos, CAST(coalesce(s.tf, 0) AS DOUBLE) AS v
         |  FROM (SELECT DISTINCT doc_id FROM sp) d
         |  CROSS JOIN (SELECT unnest(range(0, $dim)) AS pos) r
         |  LEFT JOIN sp s ON s.doc_id = d.doc_id AND s.dim = r.pos""".stripMargin
    s"""WITH sp AS (
       |${docTermVectorsSql(dim)}
       |), ${Similarity.ivfChainSqlFrom(k, iters, "t", eBody)},
       |assign AS (SELECT vec_id AS doc_id, list_id AS topic FROM ta$iters),
       |tok AS (
       |  SELECT doc_id, token FROM (
       |    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
       |    FROM documents
       |  ) WHERE length(token) > 0
       |),
       |tf AS (SELECT topic, token, count(*) AS tf
       |       FROM tok JOIN assign USING (doc_id) GROUP BY 1, 2)
       |SELECT topic, token, tf, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY topic
       |                               ORDER BY tf DESC, token) AS rank
       |  FROM tf
       |) WHERE rank <= $top""".stripMargin
  }

  /** Seed of the winnowing gram hash (arbitrary, fixed for replay). */
  private val WinnowSeed = 11

  /** Winnowing fingerprint overlap (Schleimer, Wilkerson & Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD'03 — the MOSS algorithm): hash every token `k`-gram, slide
    * a window of `w` consecutive gram positions over each document,
    * and in each window select the minimal hash (rightmost on ties).
    * The selected set is a ~2/(w+1)-density LOCAL fingerprint with the
    * winnowing guarantee: any match of at least w+k−1 consecutive
    * tokens between two documents shares at least one selected
    * fingerprint — position-aware where [[docFingerprint]]'s global
    * MinHash is not. The report is the MOSS use: document pairs
    * sharing ≥ `minShared` distinct fingerprint values, with the
    * shared count.
    *
    * Plan shape: selection is decided PER POSITION from w−1 lags and
    * leads in one per-document ordered window — position p is the
    * rightmost argmin of some complete window W_s = [s, s+w−1] iff
    *
    *   max(p−w+1, 0, Lp+1) ≤ min(p, n−w, Rp−w)
    *
    * where Lp = nearest q < p with h[q] < h[p] and Rp = nearest q > p
    * with h[q] ≤ h[p] (strict vs non-strict encodes the rightmost tie
    * rule; only neighbors within w−1 positions can bind, which is what
    * makes the lag/lead form complete). That is O(n) rows through ONE
    * sort — no w× window-membership explode, no per-(doc, s)
    * micro-partition aggregate (measured 5× on this corpus). The
    * DuckDB oracle keeps the literal explode-windows/argmin form, so
    * the hash-match doubles as the equivalence proof of the
    * characterization. The pair report is an inverted-index equality
    * join on the fingerprint VALUE over the ~2/(w+1)-dense selected
    * set — the same candidates-only shape as [[minhashLsh]], with
    * hot-value skew bounded by the winnowing density (a boilerplate
    * gram repeated across documents selects at most once per window
    * span, and the df-capped strategies of [[ngramJaccard]] apply
    * unchanged if a corpus needs them). */
  private[graft] def winnowFps(spark: SparkSession, d: String,
                               k: Int, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2 && w >= 2, "winnowing needs k >= 2, w >= 2")
    // the gram count n is NOT projected as size(<gram array expr>):
    // projection collapse would inline the full transform(...) into
    // every downstream reference and rebuild the whole per-doc gram
    // array PER EXPLODED ROW (measured 4× on this stage). A per-doc
    // window count over the already-exploded rows shares the window
    // exchange the lag/lead pass needs anyway.
    val base = docs(spark, d)
      .select(col("doc_id"), posexplode(expr(shinglesExpr(k))).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        hash64(col("g"), WinnowSeed).as("h"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
    val wdoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // nearest strictly-smaller hash to the left / smaller-or-equal to the
    // right, within w−1 positions (coalesce picks the NEAREST: j ascending)
    val lp = coalesce((1 until w).map(j =>
      when(lag(col("h"), j).over(wdoc) < col("h"), col("pos") - j)) :+
      lit(null).cast("long"): _*)
    val rp = coalesce((1 until w).map(j =>
      when(lead(col("h"), j).over(wdoc) <= col("h"), col("pos") + j)) :+
      lit(null).cast("long"): _*)
    val lower = greatest(col("pos") - (w - 1), lit(0L),
      coalesce(lp + lit(1L), lit(0L)))
    val upper = least(col("pos"), col("n") - w,
      coalesce(rp - lit(w.toLong), col("pos")))
    base
      .withColumn("lower", lower).withColumn("upper", upper)
      .filter(col("lower") <= col("upper"))
      .select(col("doc_id"), col("h")).distinct()
  }

  def winnowPairs(spark: SparkSession, d: String, k: Int = 4, w: Int = 4,
                  minShared: Int = 2): DataFrame = {
    val fps = winnowFps(spark, d, k, w)
    fps.as("a").join(fps.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  def winnowPairsSql(k: Int = 4, w: Int = 4, minShared: Int = 2): String = {
    val gram = (0 until k).map(j => if (j == 0) "toks[i]" else s"toks[i+$j]")
      .mkString(" || ' ' || ")
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |           FROM documents),
       |g AS (SELECT doc_id, len(toks) - ${k - 1} AS n,
       |             unnest(list_transform(range(1, len(toks) - ${k - 2}),
       |               i -> {'pos': i - 1,
       |                     'h': (md5_number_lower('$WinnowSeed:' || ($gram))
       |                           % ${HashPrime}::UBIGINT)::BIGINT})) AS s
       |      FROM t),
       |p AS (SELECT doc_id, CAST(n AS BIGINT) AS n, CAST(s.pos AS BIGINT) AS pos,
       |             s.h AS h
       |      FROM g WHERE n >= $w),
       |m AS (SELECT doc_id, pos, h,
       |             unnest(range(greatest(pos - ${w - 1}, 0),
       |                          least(pos, n - $w) + 1)) AS s
       |      FROM p),
       |wmin AS (SELECT doc_id, s, min(h) AS wmin FROM m GROUP BY 1, 2),
       |sel AS (SELECT m.doc_id, m.s, max(m.pos) AS pos, max(m.h) AS h
       |        FROM m JOIN wmin ON wmin.doc_id = m.doc_id AND wmin.s = m.s
       |                        AND m.h = wmin.wmin
       |        GROUP BY 1, 2),
       |fp AS (SELECT DISTINCT doc_id, h FROM sel)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
       |FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
       |GROUP BY 1, 2
       |HAVING count(*) >= $minShared""".stripMargin
  }

  def dupSpans(spark: SparkSession, d: String, l: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wo = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    dupGramPositions(spark, d, l)
      .withColumn("prev", lag(col("pos"), 1).over(wo))
      .withColumn("ni", when(col("prev").isNull || col("pos") > col("prev") + l, 1L)
        .otherwise(0L))
      .withColumn("span_id",
        sum(col("ni")).over(wo.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("pos")).as("span_start"), max(col("pos")).as("mx"),
        count(lit(1)).as("n_dup_grams"))
      .select(col("doc_id"), col("span_id"), col("span_start"),
        (col("mx") + l - 1).as("span_end"),
        (col("mx") + l - col("span_start")).as("span_tokens"),
        col("n_dup_grams"))
  }

  def dupSpansSql(l: Int = 5): String =
    s"""WITH ${dupGramPositionsSql(l)},
       |i AS (SELECT doc_id, pos,
       |             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
       |                    OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + $l
       |                  THEN 1 ELSE 0 END AS ni
       |      FROM d),
       |isl AS (SELECT doc_id, pos,
       |               CAST(sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT)
       |                 AS span_id
       |        FROM i)
       |SELECT doc_id, span_id, min(pos) AS span_start,
       |       max(pos) + ${l - 1} AS span_end,
       |       max(pos) + $l - min(pos) AS span_tokens,
       |       count(*) AS n_dup_grams
       |FROM isl GROUP BY 1, 2""".stripMargin

  /** Span-level dedup REWRITE — [[dupSpans]]' consumer: every token
    * covered by a duplicated gram is cut, and the document is
    * reassembled from the surviving tokens (clean_text is
    * space-normalized: the tokenizer's join, not the original
    * whitespace). The aggressive form — every occurrence of duplicated
    * material goes, including the first; pair with [[dedupExact]]
    * keepers when one canonical copy should survive.
    *
    * Scale: the covered-position stream is the [[dupGramPositions]]
    * relation exploded by exactly `l` offsets — LINEAR in duplicated
    * grams (never a positions × spans range join); the anti-join and
    * the reassembly aggregate both key on doc_id with per-document
    * bounded state. Three corpus scans total (gram hash stream, token
    * positions, per-doc token counts) — the gram stream itself stays
    * single-scan via the shared exchange. */
  def scrubSpans(spark: SparkSession, d: String, l: Int = 5): DataFrame = {
    val base = docs(spark, d)
    val ptok = base
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
    val covered = dupGramPositions(spark, d, l)
      .select(col("doc_id"),
        explode(expr(s"sequence(pos, pos + ${l - 1})")).as("pos"))
      .distinct()
    val kept = ptok.join(covered, Seq("doc_id", "pos"), "left_anti")
    val keptAgg = kept.groupBy("doc_id").agg(
      expr("concat_ws(' ', transform(array_sort(collect_list(struct(pos, tok))), s -> s.tok))")
        .as("clean_text"),
      count(lit(1)).as("n_kept"))
    base.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  def scrubSpansSql(l: Int = 5): String =
    s"""WITH ${dupGramPositionsSql(l)},
       |cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + $l)) AS cpos FROM d),
       |ptok AS (SELECT doc_id, CAST(s.pos AS BIGINT) AS pos, s.tok AS tok FROM (
       |  SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
       |           i -> {'pos': i - 1, 'tok': toks[i]})) AS s
       |  FROM t)),
       |kept AS (SELECT pt.doc_id, pt.pos, pt.tok FROM ptok pt
       |         WHERE NOT EXISTS (SELECT 1 FROM cov
       |                           WHERE cov.doc_id = pt.doc_id
       |                             AND cov.cpos = pt.pos)),
       |ka AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
       |              count(*) AS n_kept
       |       FROM kept GROUP BY 1),
       |tot AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t)
       |SELECT tot.doc_id, tot.n_tokens,
       |       coalesce(ka.n_kept, 0) AS n_kept,
       |       tot.n_tokens - coalesce(ka.n_kept, 0) AS n_removed,
       |       coalesce(ka.clean_text, '') AS clean_text
       |FROM tot LEFT JOIN ka USING (doc_id)""".stripMargin
}
