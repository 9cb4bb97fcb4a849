package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.ColumnFunctions.{hash64, HashPrime}

/** Corpus-level curation operators (builder brief: "the operations a
  * large-scale training-data pipeline would need") that sit between
  * [[TextOps]] (dedup family) and [[DataPipeline]] (mixing/packing):
  *
  *  - [[tfidfTopK]]: per-document top-k terms by TF-IDF — keyword
  *    extraction / domain tagging for data mixing.
  *  - [[cdcChunks]]: content-defined chunking (rolling-hash
  *    breakpoints) — the sub-document dedup granularity: a paragraph
  *    shared by two documents yields bit-identical chunks even when
  *    its byte offset differs, because chunk boundaries depend only on
  *    content, not position (Muthitacharoen et al., LBFS, SOSP'01 —
  *    public technique).
  *  - [[piiScrub]]: regex PII redaction (emails / IPv4 / phone
  *    numbers) with per-document match counts — the compliance pass
  *    every pretraining corpus runs.
  *
  * All three are engine-portable (md5 hash family, integer/double
  * arithmetic with fixed operation order) so the DuckDB oracle
  * recomputes them bit-for-bit.
  *
  * Scale shapes: tfidfTopK is two map-side-combined aggregations plus
  * one term-keyed join (high-df terms fan out 1:1 per (doc,term) row —
  * no skew blowup) and a per-doc WindowGroupLimit. cdcChunks windows
  * inside a document (bounded state) and aggregates per (doc, chunk).
  * piiScrub is a pure per-row projection — zero shuffle.
  */
object Corpus {

  /** Shared tokenizer — ONE definition for all parity-critical ops. */
  private def toksExpr = TextOps.toksExpr

  // ---- TF-IDF keyword extraction --------------------------------------

  /** Per-document top-k terms by TF-IDF. The score is the RATIONAL form
    * tf · N / df (not the log form): same ranking for fixed N, but every
    * value is an exact small-integer product/quotient in IEEE double, so
    * Spark and the oracle agree bit-for-bit — ln() last-ulp differences
    * would break hash parity for zero ranking benefit.
    *
    * ONE scan: df (docs containing the term = tf rows per term) is a
    * map-side-combined `groupBy(term).count()` over the tf relation,
    * joined back on term — NOT a `count(*) OVER (PARTITION BY term)`
    * window. The window form is a skew wall: a stopword's partition
    * holds df ≈ nDocs rows and ONE task drags the stage at 100×; the
    * groupBy moves only (term, partial-count) per map partition, and
    * the join-back skew is splittable by AQE's skew-join (impossible
    * for a window). Still a single tokenization pass: both branches
    * (tf→join probe, tf→df agg) share the identical
    * scan→explode→partial-agg→exchange(doc_id,term) subtree, so
    * ReuseExchange materializes that shuffle once. The total-doc
    * count N rides in as a broadcast scalar (footer-only count-star
    * scan), not a driver action, so the whole plan stays lazy. */
  def tfidfTopK(spark: SparkSession, d: String, k: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, d)
    val tf = docs.select(col("doc_id"), explode(expr(toksExpr)).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // count(CASE WHEN tf > 0 THEN 1 END), not count(*): tf >= 1 always, so
    // the value is identical — but a plain count(*) (or count of any
    // provably-non-null function of tf) lets Catalyst prune tf's count
    // buffer from this branch's inner aggregate, making its
    // exchange(doc_id,term) subtree canonically DIFFERENT from the probe
    // branch's and defeating ReuseExchange (two tokenization scans). The
    // nullable, non-foldable dependency keeps both branches' partial
    // aggregates bit-identical, so the tokenization shuffle materializes
    // once and is read by both.
    val dfByTerm = tf.groupBy("term")
      .agg(count(when(col("tf") > 0, lit(1))).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(dfByTerm, Seq("term"))
      .crossJoin(broadcast(total))
      .withColumn("score",
        col("tf").cast("double") * col("n_docs").cast("double") / col("df").cast("double"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("doc_id", "term", "tf", "df", "score", "rank")
  }

  def tfidfTopKSql(k: Int = 3): String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
       |), tok AS (
       |  SELECT doc_id, unnest(toks) AS term FROM t
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
       |), tfdf AS (
       |  SELECT doc_id, term, tf, count(*) OVER (PARTITION BY term) AS df FROM tf
       |), n AS (
       |  SELECT count(*) AS n_docs FROM documents
       |)
       |SELECT doc_id, term, tf, df, score, rank FROM (
       |  SELECT doc_id, term, tf, df,
       |    CAST(tf AS DOUBLE) * CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE) AS score,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY CAST(tf AS DOUBLE) * CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE) DESC,
       |               term) AS rank
       |  FROM tfdf CROSS JOIN n
       |) WHERE rank <= $k""".stripMargin

  // ---- content-defined chunking (sub-document dedup) ------------------

  /** Content-defined chunks: a boundary falls AFTER token t whenever
    * hash64(t) ≡ 0 (mod `modB`) — expected chunk length `modB` tokens.
    * chunk_id is the running boundary count before the token (a
    * per-document ordered window, bounded state), chunk_hash the
    * portable hash of the space-joined chunk text, and dup_count how
    * many chunks corpus-wide share that hash — sub-document dedup at
    * paragraph granularity: identical passages chunk identically
    * regardless of their position in the host document.
    *
    * Scale: the cumulative window partitions by doc_id (bounded by
    * document length, never corpus length), the chunk aggregate is
    * map-side combined, and dup_count is one chunk_hash-keyed window —
    * three bounded shuffles, no quadratic anywhere. */
  def cdcChunks(spark: SparkSession, d: String, modB: Int = 8): DataFrame = {
    require(modB >= 1, "modB must be >= 1")
    val tok = Tables.documents(spark, d)
      .select(col("doc_id"), posexplode(expr(toksExpr)).as(Seq("pos", "tok")))
      .withColumn("bnd",
        when(pmod(hash64(col("tok"), 2), lit(modB.toLong)) === 0, 1L).otherwise(0L))
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunks = tok
      .withColumn("chunk_id", coalesce(sum(col("bnd")).over(wRun), lit(0L)))
      .groupBy("doc_id", "chunk_id")
      .agg(count(lit(1)).as("n_tokens"),
        expr("concat_ws(' ', transform(array_sort(collect_list(struct(pos, tok))), s -> s.tok))")
          .as("chunk_text"))
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        hash64(col("chunk_text"), 0).as("chunk_hash"))
    chunks.withColumn("dup_count",
      count(lit(1)).over(Window.partitionBy(col("chunk_hash"))))
  }

  def cdcChunksSql(modB: Int = 8): String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
       |), p AS (
       |  SELECT doc_id, unnest(range(1, len(toks)+1)) AS i, toks FROM t
       |), tok AS (
       |  SELECT doc_id, i - 1 AS pos, toks[i] AS tok,
       |    CASE WHEN (md5_number_lower('2:' || toks[i]) % ${HashPrime}::UBIGINT)::BIGINT
       |              % $modB = 0 THEN 1 ELSE 0 END AS bnd
       |  FROM p
       |), c AS (
       |  SELECT doc_id, pos, tok,
       |    CAST(COALESCE(SUM(bnd) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS chunk_id
       |  FROM tok
       |), g AS (
       |  SELECT doc_id, chunk_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    (md5_number_lower('0:' || string_agg(tok, ' ' ORDER BY pos))
       |      % ${HashPrime}::UBIGINT)::BIGINT AS chunk_hash
       |  FROM c GROUP BY 1, 2
       |)
       |SELECT doc_id, chunk_id, n_tokens, chunk_hash,
       |  CAST(count(*) OVER (PARTITION BY chunk_hash) AS BIGINT) AS dup_count
       |FROM g""".stripMargin

  // ---- fixed-size context-window chunking -----------------------------

  /** Fixed-size token chunking with overlap — the context-window prep
    * every pretraining / RAG pipeline runs before packing: each
    * document yields chunks of `size` tokens starting every
    * stride = size − overlap tokens; the trailing chunk keeps whatever
    * remains, and a would-be chunk containing ONLY already-seen
    * overlap tokens is not emitted (⌈(n − overlap)/stride⌉ chunks for
    * n > size, one otherwise). Output (doc_id, chunk_id, start_tok,
    * n_tokens, chunk_hash) — the hash stands in for the chunk text
    * (same narrow-relation convention as [[cdcChunks]]; slice the
    * token array by start_tok/n_tokens to materialize text).
    * [[cdcChunks]] is the content-defined contrast: these chunks are
    * position-stable, those are content-stable.
    *
    * Scale: one tokenize scan and a per-row transform explode — NO
    * shuffle, no window, no join; chunk fanout is bounded by
    * n/stride per document. The plan is a single WholeStageCodegen
    * span over the scan, which is the whole point at 100 TB. */
  def chunkDocuments(spark: SparkSession, d: String, size: Int = 64,
                     overlap: Int = 16): DataFrame = {
    require(size >= 1 && overlap >= 0 && overlap < size,
      "need size >= 1 and 0 <= overlap < size")
    val stride = size - overlap
    Tables.documents(spark, d)
      .select(col("doc_id"), expr(toksExpr).as("toks"))
      .withColumn("n",
        org.apache.spark.sql.functions.size(col("toks")).cast("long"))
      .withColumn("nchunks",
        when(col("n") <= size, lit(1L))
          .otherwise(expr(s"(n - $overlap + $stride - 1) DIV $stride")))
      .select(col("doc_id"), col("toks"),
        explode(expr("sequence(0L, nchunks - 1)")).as("chunk_id"))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("ctoks",
        expr(s"slice(toks, CAST(start_tok + 1 AS INT), $size)"))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        org.apache.spark.sql.functions.size(col("ctoks")).cast("long").as("n_tokens"),
        graft.functions.ColumnFunctions.hash64(
          concat_ws(" ", col("ctoks")), 0).as("chunk_hash"))
  }

  def chunkDocumentsSql(size: Int = 64, overlap: Int = 16): String = {
    val stride = size - overlap
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
       |), m AS (
       |  SELECT doc_id, toks, len(toks) AS n,
       |    CASE WHEN len(toks) <= $size THEN 1
       |         ELSE (len(toks) - $overlap + $stride - 1) // $stride END AS nchunks
       |  FROM t
       |), c AS (
       |  SELECT doc_id, unnest(range(0, nchunks)) AS chunk_id, toks FROM m
       |)
       |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       |  CAST(chunk_id * $stride AS BIGINT) AS start_tok,
       |  CAST(len(toks[chunk_id * $stride + 1 : chunk_id * $stride + $size]) AS BIGINT) AS n_tokens,
       |  (md5_number_lower('0:' ||
       |     array_to_string(toks[chunk_id * $stride + 1 : chunk_id * $stride + $size], ' '))
       |   % ${HashPrime}::UBIGINT)::BIGINT AS chunk_hash
       |FROM c""".stripMargin
  }

  // ---- incremental-ingestion coverage (anti/semi-join dedup) ----------

  /** Default "new batch" partition for the driver query: the first five
    * source shards; everything else is the already-ingested corpus. */
  private val NewSources = (0 to 4).map(i => s"src$i")

  /** Redundancy of a NEW ingestion batch against the SEEN corpus: per
    * new-batch document, the fraction of its distinct word 3-gram
    * shingles already present anywhere in the seen corpus, plus a
    * `redundant` flag at ≥ `redundantAt`. The incremental-ingestion
    * question ("is this crawl snapshot mostly content we already
    * have?") — coverage is content-based, so it catches re-crawls and
    * near-copies exact-hash dedup misses.
    *
    * Scale: seen-side distinct is map-side combined; the LEFT join on
    * the shingle key has no fanout (the seen side is distinct, so each
    * new-side row matches at most once, hot Zipf shingles included);
    * total and covered counts come from ONE pass over the joined
    * relation (count(*) vs count(hit)), so the new batch is
    * tokenized/deduped once, not twice. No all-pairs anything. */
  def corpusCoverage(spark: SparkSession, d: String,
                     newSources: Seq[String] = NewSources,
                     redundantAt: Double = 0.8): DataFrame = {
    val sh = Tables.documents(spark, d)
      .withColumn("toks", expr(toksExpr))
      .select(col("doc_id"), col("source"),
        explode(expr(TextOps.shinglesExpr(3))).as("s"))
    val isNew = col("source").isin(newSources: _*)
    val newSh = sh.filter(isNew).select("doc_id", "s").distinct()
    val seen = sh.filter(!isNew).select("s").distinct().withColumn("hit", lit(1))
    newSh.join(seen, Seq("s"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_covered"))
      .withColumn("coverage",
        col("n_covered").cast("double") / col("n_shingles").cast("double"))
      .withColumn("redundant", col("coverage") >= redundantAt)
  }

  /** Temporal novelty of each document against all EARLIER documents
    * (doc_id as ingestion order — the curation question "how much of
    * this document is content the corpus has never seen before?"):
    * per document, the count of its distinct word 3-gram shingles, the
    * count whose corpus-wide FIRST occurrence (minimum doc_id) is this
    * document, and their ratio. Boilerplate/template text scores near
    * 0; genuinely fresh content scores near 1 — the per-document
    * complement of [[corpusCoverage]]'s batch-level redundancy view.
    *
    * Alongside novelty, `n_shared` counts the doc's shingles that occur
    * in ≥ 2 documents (shingle document frequency from the same
    * first-seen aggregate) — the boilerplate/template signal, and an
    * independent axis from novelty (a novel shingle can still end up
    * shared once later docs copy it).
    *
    * Scale: distinct (doc, shingle) is one map-side-combined shuffle;
    * first-seen + df is a groupBy over it (a hot Zipf shingle collapses
    * to ONE (shingle, min, df) row — no window, no skew wall); the join
    * back has no fanout (one row per shingle). The df count is also
    * what KEEPS the plan single-scan: a min-only aggregate is
    * duplicate-agnostic, so Catalyst would eliminate the distinct under
    * it and give this branch its own tokenization scan — count(*) is
    * duplicate-sensitive, the distinct stays, both branches share one
    * canonical exchange(doc_id, s) subtree, and the executed plan shows
    * ReusedExchange. Docs with < 3 tokens have no shingles and are
    * absent, matching the oracle. */
  def ngramNovelty(spark: SparkSession, d: String): DataFrame = {
    val sh = Tables.documents(spark, d)
      .withColumn("toks", expr(toksExpr))
      .select(col("doc_id"), explode(expr(TextOps.shinglesExpr(3))).as("s"))
      .distinct()
    val first = sh.groupBy("s").agg(min(col("doc_id")).as("first_doc"),
      count(lit(1)).as("df"))
    sh.join(first, Seq("s"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("first_doc") === col("doc_id"), lit(1))).as("n_novel"),
        count(when(col("df") > 1, lit(1))).as("n_shared"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_shingles").cast("double"))
  }

  def ngramNoveltySql(): String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents
       |), sh AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_transform(range(1, len(toks)-1),
       |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
       |  FROM t
       |), f AS (
       |  SELECT s, min(doc_id) AS first_doc, count(*) AS df FROM sh GROUP BY 1
       |), agg AS (
       |  SELECT doc_id, count(*) AS n_shingles,
       |         count(CASE WHEN first_doc = doc_id THEN 1 END) AS n_novel,
       |         count(CASE WHEN df > 1 THEN 1 END) AS n_shared
       |  FROM sh JOIN f USING (s) GROUP BY 1
       |)
       |SELECT doc_id, n_shingles, n_novel, n_shared,
       |  CAST(n_novel AS DOUBLE) / CAST(n_shingles AS DOUBLE) AS novelty
       |FROM agg""".stripMargin

  def corpusCoverageSql(newSources: Seq[String] = NewSources,
                        redundantAt: Double = 0.8): String = {
    val list = newSources.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id, source,
       |    unnest(list_transform(range(1, len(toks)-1),
       |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
       |  FROM t
       |), newsh AS (
       |  SELECT DISTINCT doc_id, s FROM sh WHERE source IN ($list)
       |), seen AS (
       |  SELECT DISTINCT s, 1 AS hit FROM sh WHERE source NOT IN ($list)
       |), agg AS (
       |  SELECT doc_id, count(*) AS n_shingles, count(hit) AS n_covered
       |  FROM newsh LEFT JOIN seen USING (s) GROUP BY 1
       |)
       |SELECT doc_id, n_shingles, n_covered,
       |  CAST(n_covered AS DOUBLE) / CAST(n_shingles AS DOUBLE) AS coverage,
       |  CAST(n_covered AS DOUBLE) / CAST(n_shingles AS DOUBLE)
       |    >= $redundantAt AS redundant
       |FROM agg""".stripMargin
  }

  // ---- PII scrubbing ---------------------------------------------------

  // Patterns kept inside the Java-regex ∩ RE2 common dialect (no
  // lookaround, no backrefs) so Spark and DuckDB match identically.
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[graft] val PhoneRe = "\\+\\d[\\d-]{6,14}\\d"

  /** PII scrub over any (id, text) relation: per-row match counts for
    * emails / IPv4s / phone numbers plus the redacted text (matches
    * replaced by <EMAIL>/<IP>/<PHONE>, in that fixed order so the
    * engines agree on overlaps). Pure per-row regex projection — zero
    * shuffle, embarrassingly parallel at any scale; Spark's codegen'd
    * RegExpReplace/RegExpExtractAll keep it inside whole-stage codegen. */
  def piiScrubOn(rows: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    rows.select(col(idCol),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>").as("redacted"))
  }

  /** Deterministic PII-bearing log lines derived from the events table.
    * The driver corpus is PII-free by construction (zero digits or '@'
    * in any document), so — same pattern as late_events' simulated
    * arrival — the registered query synthesizes its input
    * deterministically from real table columns; the oracle builds the
    * identical lines, and the scrubber does real, varying work
    * ('error' events carry a second IP, so counts differ by row). */
  private def logLines(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d).select(col("event_id"),
      concat(
        lit("uid="), col("user_id").cast("string"),
        lit(" email=user"), col("user_id").cast("string"), lit("@example.com"),
        lit(" ip=10.0."), pmod(col("user_id"), lit(256L)).cast("string"),
        lit("."), pmod(col("event_id"), lit(256L)).cast("string"),
        lit(" phone=+1-555-"), lpad(pmod(col("event_id"), lit(10000L)).cast("string"), 4, "0"),
        lit(" type="), col("event_type"),
        when(col("event_type") === "error",
          concat(lit(" peer=192.168.1."), pmod(col("user_id"), lit(200L)).cast("string")))
          .otherwise(lit(""))).as("line"))

  /** Driver-contract PII scrub (events-derived log lines). */
  def piiScrub(spark: SparkSession, d: String): DataFrame =
    piiScrubOn(logLines(spark, d), "event_id", "line")

  def piiScrubSql: String =
    s"""WITH lines AS (
       |  SELECT event_id,
       |    'uid=' || user_id || ' email=user' || user_id || '@example.com ip=10.0.' ||
       |    (user_id % 256) || '.' || (event_id % 256) ||
       |    ' phone=+1-555-' || lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0') ||
       |    ' type=' || event_type ||
       |    CASE WHEN event_type = 'error'
       |         THEN ' peer=192.168.1.' || (user_id % 200) ELSE '' END AS line
       |  FROM events
       |)
       |SELECT event_id,
       |  CAST(len(regexp_extract_all(line, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(line, '$Ipv4Re')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(line, '$PhoneRe')) AS BIGINT) AS n_phones,
       |  regexp_replace(
       |    regexp_replace(
       |      regexp_replace(line, '$EmailRe', '<EMAIL>', 'g'),
       |      '$Ipv4Re', '<IP>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g') AS redacted
       |FROM lines""".stripMargin

  // ---- token frequency histogram (Zipf QA) ---------------------------

  /** Frequency-of-frequencies: for each occurrence count, how many
    * distinct tokens occur exactly that often. THE corpus-health
    * fingerprint — a natural corpus follows Zipf (hapax-heavy, long
    * tail); machine-generated or template text shows mass spikes at
    * specific counts. Two map-side-combined aggregations, each output
    * strictly smaller than the last; nothing scales with corpus size
    * except the scan. */
  def tokenFreqHist(spark: SparkSession, d: String): DataFrame =
    TextOps.tokenCounts(spark, d)
      .select(col("cnt").as("occurrences"))
      .groupBy("occurrences").agg(count(lit(1)).as("n_tokens"))

  def tokenFreqHistSql: String =
    s"""SELECT occurrences, count(*) AS n_tokens FROM (
       |  SELECT cnt AS occurrences FROM (
       |  ${TextOps.tokenCountsSql}
       |  )
       |) GROUP BY occurrences""".stripMargin

  // ---- data-mixing reports -------------------------------------------

  /** Per (source, lang) mixing report: document count, token volume,
    * and mean document length — the numbers a data-mixing decision
    * reads before setting [[DataPipeline.stratifiedSample]] fractions.
    * One map-side-combined aggregate over a per-row tokenization;
    * the mean routes through exact integer sums (sum/count division,
    * one double op — engine-identical). */
  def sourceMixReport(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .withColumn("n_toks",
        size(expr(s"filter($toksExpr, t -> length(t) > 0)")).cast("long"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))

  val sourceMixReportSql: String =
    """SELECT source, lang, count(*) AS n_docs,
      |       CAST(sum(len(list_filter(string_split_regex(trim(text), '\s+'),
      |                                tok -> length(tok) > 0))) AS BIGINT) AS n_tokens,
      |       CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
      |FROM documents
      |GROUP BY source, lang""".stripMargin

  /** Per-source duplicate rate: the fraction of a source's documents
    * whose exact content already exists under a lower doc_id — the
    * first quantity a crawl-quality review asks for. Reuses the
    * [[TextOps.dedupExact]] keeper rule; one hash aggregate + one
    * source aggregate, both map-side combined. The rate is a single
    * long/long double division — engine-identical. */
  def dupRateBySource(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), sha2(col("text"), 256).as("h"))
    val keepers = docs.groupBy("h").agg(min(col("doc_id")).as("keeper"))
    docs.join(keepers, "h")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("doc_id") =!= col("keeper")).cast("long")).as("n_dups"))
      .withColumn("dup_rate",
        col("n_dups").cast("double") / col("n_docs"))
  }

  val dupRateBySourceSql: String =
    """WITH hashed AS (
      |  SELECT doc_id, source, sha256(text) AS h FROM documents
      |), keepers AS (
      |  SELECT h, min(doc_id) AS keeper FROM hashed GROUP BY h
      |)
      |SELECT source, count(*) AS n_docs,
      |       CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
      |       CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS DOUBLE)
      |         / count(*) AS dup_rate
      |FROM hashed JOIN keepers USING (h)
      |GROUP BY source""".stripMargin

  /** Cross-source content-overlap matrix: for every source pair, how
    * many distinct content fingerprints ([[TextOps.fingerprint]]'s
    * 3-gram minhash — identical docs always collide, near-identical
    * ones with probability = their Jaccard) appear in BOTH sources —
    * the mirror-detection / scrape-provenance report that tells a
    * crawl review WHERE [[dupRateBySource]]'s duplicates come from
    * (content syndicated across sites vs re-crawled within one).
    * Keyed on the fingerprint rather than the exact sha-256 because
    * syndicated copies differ by boilerplate: exact-hash overlap is a
    * subset of this report.
    *
    * Scale: the fingerprint is one map-side-combined per-doc aggregate
    * over the shingle stream; distinct (fingerprint, source) shrinks
    * again; the self-join meets on the fingerprint key where each
    * group holds at most |sources| rows, so the pair fanout per
    * content is ≤ C(|sources|,2) — bounded by the (small) source
    * universe, never by corpus size; the final aggregate is ≤
    * |sources|² rows. Both join sides are the same distinct subtree,
    * so its exchange materializes once. */
  def sourceOverlap(spark: SparkSession, d: String): DataFrame = {
    val fp = Tables.documents(spark, d)
      .withColumn("toks", expr(toksExpr))
      .select(col("doc_id"), col("source"),
        explode(expr(TextOps.shinglesExpr(3))).as("sh"))
      .groupBy("doc_id", "source")
      .agg(min(hash64(col("sh"), 0)).as("f"))
    val hs = fp.select("f", "source").distinct()
    hs.as("a")
      .join(hs.as("b"), col("a.f") === col("b.f") && col("a.source") < col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared"))
  }

  val sourceOverlapSql: String =
    s"""WITH t AS (SELECT doc_id, source,
       |                  string_split_regex(trim(text), '\\s+') AS toks
       |           FROM documents),
       |sh AS (SELECT doc_id, source, unnest(list_transform(range(1, len(toks)-1),
       |              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
       |       FROM t),
       |fp AS (SELECT doc_id, source,
       |              min((md5_number_lower('0:' || sh)
       |                   % ${HashPrime}::UBIGINT)::BIGINT) AS f
       |       FROM sh GROUP BY 1, 2),
       |hs AS (SELECT DISTINCT f, source FROM fp)
       |SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
       |FROM hs a JOIN hs b ON a.f = b.f AND a.source < b.source
       |GROUP BY 1, 2""".stripMargin

  // ---- PMI collocations ----------------------------------------------

  /** Top-k bigram collocations by pointwise mutual information
    * (Church & Hanks 1990, "Word association norms, mutual
    * information, and lexicography" — public technique) — phrase
    * mining for tokenizer vocab construction and boilerplate
    * discovery. The score is the RATIONAL PMI form (the [[tfidfTopK]]
    * trick): p(xy)/(p(x)p(y)) = c_xy·N²/(B·c_x·c_y) with N = token
    * instances, B = bigram instances — identical ranking to log-PMI,
    * but every factor is an exact integer-valued double and the whole
    * expression is one fixed-shape multiply/divide chain, so the
    * oracle hash matches bit-for-bit (ln() last-ulp drift would break
    * it for zero ranking benefit).
    *
    * Scale: unigram and bigram counts are separate map-side-combined
    * aggregations of the same scan lineage; the corpus totals ride a
    * 1-row broadcast; the two unigram joins are broadcast-able (vocab
    * ≪ corpus) or plain shuffles at worst; the final top-k is
    * TakeOrdered. `minCount` prunes the hapax noise PMI is notorious
    * for BEFORE the joins. */
  def pmiBigrams(spark: SparkSession, d: String, k: Int = 30,
                 minCount: Long = 5): DataFrame = {
    // pair over the EMPTY-FILTERED token sequence: split('\s+') emits an
    // empty first/last element for docs with leading/trailing non-space
    // whitespace (trim strips spaces only), and pairing the raw array
    // would then credit such docs with phantom bigrams in B
    val toks = Tables.documents(spark, d)
      .withColumn("toks", expr(s"filter($toksExpr, t -> length(t) > 0)"))
    val uni = TextOps.tokenCounts(spark, d)
      .select(col("token"), col("cnt").as("c"))
    val bi = toks.select(explode(expr(
        "CASE WHEN size(toks) >= 2 THEN transform(sequence(0, size(toks)-2), " +
        "i -> struct(toks[i] AS x, toks[i+1] AS y)) ELSE array() END")).as("bg"))
      .select(col("bg.x").as("x"), col("bg.y").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    // B must count ALL bigram instances, not just the kept ones — derive
    // from unigram totals: B = Σ_doc (len-1) = N - n_docs(with ≥1 token),
    // exact because `toks` is already empty-filtered
    val docsWithToks = toks
      .filter(size(col("toks")) >= 1)
      .agg(count(lit(1)).as("n_docs"))
    val nb = uni.agg(sum(col("c")).as("n_uni")).crossJoin(docsWithToks)
      .select(col("n_uni"), (col("n_uni") - col("n_docs")).as("n_bi"))
    bi
      .join(uni.select(col("token").as("x"), col("c").as("c_x")), "x")
      .join(uni.select(col("token").as("y"), col("c").as("c_y")), "y")
      .crossJoin(broadcast(nb))
      .select(concat_ws(" ", col("x"), col("y")).as("bigram"),
        col("c_xy"),
        ((col("c_xy").cast("double") * col("n_uni") * col("n_uni")) /
          (col("n_bi").cast("double") * col("c_x") * col("c_y"))).as("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("bigram"))
      .limit(k)
  }

  def pmiBigramsSql(k: Int = 30, minCount: Long = 5): String =
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'),
       |                             tok -> length(tok) > 0) AS toks
       |  FROM documents
       |), uni AS (
       |  SELECT token, cnt AS c FROM (
       |  ${TextOps.tokenCountsSql}
       |  )
       |), bi AS (
       |  SELECT x, y, count(*) AS c_xy FROM (
       |    SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS x,
       |           unnest(list_transform(range(1, len(toks)), i -> toks[i+1])) AS y
       |    FROM t
       |  ) GROUP BY x, y HAVING count(*) >= $minCount
       |), nb AS (
       |  SELECT (SELECT sum(c) FROM uni) AS n_uni,
       |         (SELECT sum(c) FROM uni) -
       |         (SELECT count(*) FROM t WHERE len(toks) >= 1) AS n_bi
       |)
       |SELECT x || ' ' || y AS bigram, c_xy,
       |       (CAST(c_xy AS DOUBLE) * n_uni * n_uni) /
       |       (CAST(n_bi AS DOUBLE) * cx.c * cy.c) AS pmi_ratio
       |FROM bi
       |JOIN uni cx ON cx.token = bi.x
       |JOIN uni cy ON cy.token = bi.y
       |CROSS JOIN nb
       |ORDER BY pmi_ratio DESC, bigram
       |LIMIT $k""".stripMargin

  // ---- Bigram-LM quality scoring --------------------------------------

  /** Empty-token-filtered tokens of `text` — materialize as a column
    * BEFORE [[bigramsOfToks]] (the projection-collapse trap: inlining
    * the tokenizer into the transform re-evaluates it per position). */
  private[graft] def cleanToksExpr = expr(s"filter($toksExpr, t -> length(t) > 0)")

  /** Adjacent-token bigram structs of a materialized `toks` column. */
  private[graft] def bigramsOfToks = expr(
    "CASE WHEN size(toks) >= 2 THEN transform(sequence(0, size(toks)-2), " +
    "i -> struct(toks[i] AS x, toks[i+1] AS y)) ELSE " +
    "array() END")

  /** The corpus bigram model: (bi = (x, y, c_xy), ctx = (x, c_x)) —
    * built in batch, probed by both [[lmBigramScore]] and the
    * stream-static [[graft.streaming.StreamingJobs.streamingLmScore]]. */
  private[graft] def bigramModel(docs: DataFrame): (DataFrame, DataFrame) = {
    val pos = docs.withColumn("toks", cleanToksExpr)
      .select(col("doc_id"), explode(bigramsOfToks).as("bg"))
      .select(col("doc_id"), col("bg.x").as("x"), col("bg.y").as("y"))
    val bi = pos.groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
    (bi, bi.groupBy("x").agg(sum(col("c_xy")).as("c_x")))
  }

  /** Per-document bigram language-model fit — the exact-arithmetic
    * analog of perplexity-based quality filtering (Wenzek et al. 2020
    * CCNet; Heafield 2011 KenLM — public technique): documents whose
    * word transitions are common corpus-wide score high; garbled or
    * out-of-domain text scores low. Instead of mean log-probability
    * (ln() last-ulp drift breaks bit-parity for zero ranking benefit —
    * the [[pmiBigrams]] lesson), the score is the MICRO-AVERAGED
    * conditional probability over the doc's bigram positions i:
    *
    *   lm_score = Σᵢ c(xᵢ,yᵢ) / Σᵢ c(xᵢ,·)
    *
    * with c(x,y) the corpus bigram count and c(x,·) = Σ_y c(x,y) the
    * left-context mass (both from the SAME bigram relation — the
    * context side needs no second tokenization pass). Both sums are
    * exact int64; the one final division of two exact integers is
    * deterministic IEEE, so the oracle hash matches bit-for-bit.
    * Documents with <2 tokens surface with zero masses and NULL score
    * (left join keeps the output total over `documents`).
    *
    * Scale: the bigram-count and context-mass relations are vocab²-
    * and vocab-sized map-side-combined aggregations, tiny next to the
    * corpus; the probe joins are keyed by (x,y) / x — the stopword-
    * context key IS skewed, which AQE's skew-join splits (a window
    * over `partition by x` would not be splittable — same reasoning
    * as [[tfidfTopK]]'s df join). Per-doc reduction is an ordinary
    * doc_id-keyed agg. No global sort, no driver action. */
  def lmBigramScore(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val pos = docs.withColumn("toks", cleanToksExpr)
      .select(col("doc_id"), explode(bigramsOfToks).as("bg"))
      .select(col("doc_id"), col("bg.x").as("x"), col("bg.y").as("y"))
    val (bi, ctx) = bigramModel(docs)
    val perDoc = pos
      .join(bi, Seq("x", "y"))
      .join(ctx, Seq("x"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("c_xy")).as("hit_mass"),
        sum(col("c_x")).as("ctx_mass"))
    Tables.documents(spark, d).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("hit_mass"), lit(0L)).as("hit_mass"),
        coalesce(col("ctx_mass"), lit(0L)).as("ctx_mass"),
        (col("hit_mass").cast("double") / col("ctx_mass").cast("double"))
          .as("lm_score"))
  }

  def lmBigramScoreSql(): String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
      |                             tok -> length(tok) > 0) AS toks
      |  FROM documents
      |), pos AS (
      |  SELECT doc_id,
      |         unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS x,
      |         unnest(list_transform(range(1, len(toks)), i -> toks[i+1])) AS y
      |  FROM t
      |), bi AS (
      |  SELECT x, y, count(*) AS c_xy FROM pos GROUP BY 1, 2
      |), ctx AS (
      |  SELECT x, CAST(sum(c_xy) AS BIGINT) AS c_x FROM bi GROUP BY 1
      |), per_doc AS (
      |  SELECT p.doc_id, count(*) AS n_bigrams,
      |         CAST(sum(bi.c_xy) AS BIGINT) AS hit_mass,
      |         CAST(sum(ctx.c_x) AS BIGINT) AS ctx_mass
      |  FROM pos p
      |  JOIN bi  ON bi.x = p.x AND bi.y = p.y
      |  JOIN ctx ON ctx.x = p.x
      |  GROUP BY 1
      |)
      |SELECT d.doc_id,
      |       coalesce(n_bigrams, 0) AS n_bigrams,
      |       coalesce(hit_mass, 0) AS hit_mass,
      |       coalesce(ctx_mass, 0) AS ctx_mass,
      |       CAST(hit_mass AS DOUBLE) / CAST(ctx_mass AS DOUBLE) AS lm_score
      |FROM documents d LEFT JOIN per_doc USING (doc_id)""".stripMargin

  // ---- Vocabulary growth (Heaps'-law fingerprint) ---------------------

  /** Cumulative vocabulary-growth curve: the corpus in `nBuckets`
    * doc_id slices, reporting cumulative documents, token instances,
    * distinct types, and the running type/token ratio at each slice
    * boundary — the Heaps'-law fingerprint (Heaps 1978 — public).
    * A corpus whose curve flattens early is repetitive/templated; one
    * that keeps climbing is diverse — the corpus-level complement of
    * the per-document [[graft.operators.TextOps]] repetition_stats.
    *
    * Exactness: every column is integer arithmetic (bucket = integer
    * DIV on doc_id; cumulative sums of exact longs); ttr is a single
    * final division of two exact int64 — bit-reproducible. "First
    * appearance" of a type is min(bucket) over its occurrences — an
    * associative agg, NOT a first-seen sort.
    *
    * Scale: two map-side-combined aggregations over one tokenization
    * scan (per-bucket doc/token tallies; per-token min-bucket →
    * per-bucket new-type counts) and a window over ≤ nBuckets rows —
    * the only ordered structure is the bounded bucket axis, never the
    * corpus. */
  def vocabGrowth(spark: SparkSession, d: String, nBuckets: Int = 20): DataFrame = {
    val docs = Tables.documents(spark, d)
      .withColumn("toks", expr(s"filter($toksExpr, t -> length(t) > 0)"))
    val maxp1 = docs.agg((max(col("doc_id")) + 1).as("maxp1"))
    val bucketed = docs.crossJoin(broadcast(maxp1))
      .withColumn("bucket", expr(s"CAST((doc_id * $nBuckets) DIV maxp1 AS BIGINT)"))
    val perBucket = bucketed.groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(size(col("toks"))).as("n_tokens"))
    val newTypes = bucketed
      .select(col("bucket"), explode(col("toks")).as("token"))
      .groupBy("token").agg(min(col("bucket")).as("fb"))
      .groupBy(col("fb").as("bucket")).agg(count(lit(1)).as("new_types"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket.join(newTypes, Seq("bucket"), "left")
      .select(col("bucket"), col("n_docs"), col("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .select(col("bucket"),
        sum(col("n_docs")).over(w).as("docs_cum"),
        sum(col("n_tokens")).over(w).as("tokens_cum"),
        sum(col("new_types")).over(w).as("types_cum"))
      .withColumn("ttr",
        when(col("tokens_cum") > 0,
          col("types_cum").cast("double") / col("tokens_cum").cast("double")))
  }

  def vocabGrowthSql(nBuckets: Int = 20): String =
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'),
       |                             tok -> length(tok) > 0) AS toks
       |  FROM documents
       |), m AS (SELECT max(doc_id) + 1 AS maxp1 FROM t),
       |b AS (
       |  SELECT doc_id, toks,
       |         CAST((doc_id * $nBuckets) // maxp1 AS BIGINT) AS bucket
       |  FROM t CROSS JOIN m
       |), pb AS (
       |  SELECT bucket, count(*) AS n_docs,
       |         CAST(sum(len(toks)) AS BIGINT) AS n_tokens
       |  FROM b GROUP BY 1
       |), fs AS (
       |  SELECT fb AS bucket, count(*) AS new_types FROM (
       |    SELECT token, min(bucket) AS fb FROM (
       |      SELECT bucket, unnest(toks) AS token FROM b
       |    ) GROUP BY token
       |  ) GROUP BY 1
       |), j AS (
       |  SELECT pb.bucket, n_docs, n_tokens,
       |         coalesce(new_types, 0) AS new_types
       |  FROM pb LEFT JOIN fs ON fs.bucket = pb.bucket
       |)
       |SELECT bucket,
       |       CAST(sum(n_docs) OVER w AS BIGINT) AS docs_cum,
       |       CAST(sum(n_tokens) OVER w AS BIGINT) AS tokens_cum,
       |       CAST(sum(new_types) OVER w AS BIGINT) AS types_cum,
       |       CASE WHEN sum(n_tokens) OVER w > 0
       |            THEN CAST(sum(new_types) OVER w AS DOUBLE) /
       |                 CAST(sum(n_tokens) OVER w AS DOUBLE)
       |       END AS ttr
       |FROM j
       |WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
       |             AND CURRENT ROW)""".stripMargin

  // ---- Tokenizer vocabulary coverage ----------------------------------

  /** Per-document out-of-vocabulary rate against the corpus's own
    * closed vocabulary at a FREQUENCY CUTOFF (tokens occurring
    * ≥ minCount times) — the tokenizer-coverage check run before
    * committing to a vocabulary: documents dense in sub-cutoff tokens
    * (foreign scripts, codes, OCR noise) surface with high oov_rate.
    * The cutoff form (not top-V) is deliberate: membership is a pure
    * per-token predicate, so the vocabulary needs NO global ranking —
    * a top-V vocab would need a total order over the (corpus-scale)
    * token-count relation, this needs only `c >= minCount`.
    *
    * Exactness: counts are exact int64; oov_rate is one final division
    * of two exact integers (NULL for token-less docs).
    *
    * Scale: one tokenization scan feeding a map-side-combined vocab
    * count, then a token-keyed probe join (hot tokens are skewed —
    * AQE-splittable, same shape as [[lmBigramScore]]) and a doc_id
    * agg. The vocab relation never leaves the cluster; no sort. */
  def oovRate(spark: SparkSession, d: String, minCount: Long = 5L): DataFrame = {
    val docs = Tables.documents(spark, d)
    val tok = docs.withColumn("toks", cleanToksExpr)
      .select(col("doc_id"), explode(col("toks")).as("token"))
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .select(col("token"), lit(1L).as("in_vocab"))
    val perDoc = tok.join(vocab, Seq("token"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"))
  }

  def oovRateSql(minCount: Long = 5L): String =
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'),
       |                             tok -> length(tok) > 0) AS toks
       |  FROM documents
       |), tok AS (
       |  SELECT doc_id, unnest(toks) AS token FROM t
       |), vocab AS (
       |  SELECT token FROM tok GROUP BY 1 HAVING count(*) >= $minCount
       |), per_doc AS (
       |  SELECT tok.doc_id, count(*) AS n_tokens,
       |         CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
       |  FROM tok LEFT JOIN vocab v ON v.token = tok.token
       |  GROUP BY 1
       |)
       |SELECT d.doc_id,
       |       coalesce(n_tokens, 0) AS n_tokens,
       |       coalesce(n_oov, 0) AS n_oov,
       |       CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_rate
       |FROM documents d LEFT JOIN per_doc USING (doc_id)""".stripMargin

  // ---- TextRank keyword extraction (iterative PageRank) ---------------

  /** Rank-iteration fixed point scale: ranks start at `RankScale` and
    * the damping base is `0.15 · RankScale`. Ranks themselves stay
    * inside int64 (hub rank ≤ |V|·SCALE, and a corpus whose total rank
    * mass exceeds 2⁶³ has no usable fixed-point encoding at ANY scale)
    * — but the per-edge product `r · w` does NOT: `w` is a corpus-wide
    * adjacent-bigram count (stop-word pairs grow linearly with corpus
    * size, ~10¹² at the 100 TB regime), so `r · w` can pass 2⁶³ and
    * would silently wrap in non-ANSI Spark (ADVICE r8). The iteration
    * therefore widens exactly the two intermediates that can overflow
    * — the edge product and the `85 · m` damping numerator — to 128-bit
    * integer arithmetic (DECIMAL(38,0) in Spark, HUGEINT in DuckDB;
    * 38 digits ≈ 2¹²⁶ covers r·w ≤ 10¹⁸·10¹² with 8 digits to spare),
    * then narrows back to int64 after each floor division, whose
    * quotient is ≤ r (since w ≤ s) resp. ≤ m. Floor division of
    * non-negative 128-bit integers is bit-identical across both
    * engines, so the oracle contract is unchanged. */
  private[graft] val RankScale = 1000000000L
  private[graft] val RankBase  = RankScale * 15L / 100L // (1-d)·SCALE, d = 0.85

  /** The symmetrized token co-occurrence graph + per-node strength,
    * session-memoized because the 10 rank iterations (and repeated
    * bench passes) all probe the same static relation. Schema:
    * (x, y, w, s) — edge x→y with weight w = #adjacencies in either
    * order and s = Σ_y w (x's total strength). */
  private val textrankAdjCache =
    new graft.SessionMemo[(SparkSession, String), DataFrame]("textrank_adj")

  private def textrankAdj(spark: SparkSession, d: String): DataFrame =
    textrankAdjCache.getOrBuild((spark, d)) {
      val docs = Tables.documents(spark, d).withColumn("toks", cleanToksExpr)
      val pos = docs
        .select(explode(bigramsOfToks).as("bg"))
        .select(col("bg.x").as("x"), col("bg.y").as("y"))
        .filter(col("x") =!= col("y"))
      val edges = pos
        .union(pos.select(col("y").as("x"), col("x").as("y")))
        .groupBy("x", "y").agg(count(lit(1)).as("w"))
      val strength = edges.groupBy("x").agg(sum(col("w")).as("s"))
      edges.join(strength, Seq("x")).persist()
    }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004, "TextRank:
    * Bringing Order into Texts" — public technique): weighted PageRank
    * over the corpus-wide token co-occurrence graph; the top-k tokens
    * by stationary rank are the corpus's keywords. The graph is the
    * adjacent-token relation (window = 2), symmetrized (each unordered
    * adjacency weights both directions), self-loops dropped.
    *
    * **Exact-arithmetic iteration** (the [[pmiBigrams]] lesson, taken
    * one step further — here the whole ALGORITHM is integer):
    * ranks live at fixed-point scale [[RankScale]];
    * each of `iters` rounds computes, entirely in exact integers
    * (int64 state, 128-bit intermediates — see [[RankScale]]),
    *
    *   r'(y) = 0.15·SCALE + (85 · Σ_x (r(x)·w_xy div s_x)) div 100
    *
    * with `div` = floor division in both engines. Integer sums are
    * associative, so partial aggregation and any merge order give
    * bit-identical results — the DuckDB oracle (an UNROLLED chain of
    * `iters` CTEs, same expression shapes) hash-matches exactly.
    * Float PageRank could not be oracle-hashed: contribution sums
    * reassociate across partitions and last-ulp drift compounds per
    * iteration.
    *
    * Scale: this is the repo's iterative-graph-algorithm shape. The
    * corpus is scanned ONCE (graph construction — map-side-combined
    * bigram count); every iteration then runs over the vocab-sized
    * edge relation, tiny next to the corpus, shuffled on a stable key
    * (y) so AQE coalesces it. The static (edges ⋈ strength) relation
    * is persisted via the session memo — the 10 iteration joins and
    * the final top-k all reuse one materialization instead of
    * re-tokenizing per iteration. Lineage grows linearly in `iters`
    * (each step references the cached adjacency + the previous ranks)
    * but is CAPPED by [[graft.Checkpoints]]: every ~20 rounds the rank
    * frame rebases onto an eager localCheckpoint (superseded
    * checkpoints released), so arbitrary user-supplied `iters` keeps
    * flat per-round planning cost. At the canonical 10 no checkpoint
    * fires and the plan is identical to the unguarded form; results
    * are value-identical either way (CorpusSpec pins it). Final top-k
    * is TakeOrdered (per-partition k-heap), never a global sort. */
  def textrankKeywords(spark: SparkSession, d: String, k: Int = 30,
                       iters: Int = 10,
                       checkpointEvery: Int = graft.Checkpoints.Every): DataFrame = {
    val adj = textrankAdj(spark, d)
    val guard = graft.Checkpoints.guard(checkpointEvery)
    var ranks = adj.select(col("x").as("token")).distinct()
      .withColumn("r", lit(RankScale))
    for (i <- 1 to iters) {
      ranks = adj.join(ranks, adj("x") === ranks("token"))
        // widen ONLY the product: r·w can exceed 2^63 at corpus scale
        // (w = corpus-wide bigram count); the div-s quotient is ≤ r,
        // so `div` narrows safely back to int64 (RankScale scaladoc)
        .select(col("y"),
          expr("(cast(r as decimal(38,0)) * w) div s").as("contrib"))
        .groupBy("y").agg(sum(col("contrib")).as("m"))
        .select(col("y").as("token"),
          (lit(RankBase) +
            expr("(85 * cast(m as decimal(38,0))) div 100")).as("r"))
      ranks = guard(ranks, i, iters)
    }
    ranks
      .select(col("token"), col("r").as("rank_scaled"))
      .orderBy(col("rank_scaled").desc, col("token"))
      .limit(k)
  }

  /** DuckDB twin of [[textrankKeywords]] — the `iters` rank rounds
    * unrolled as chained CTEs (DuckDB, like PostgreSQL, forbids
    * aggregates in a recursive CTE term, and a fixed iteration count
    * is the algorithm's contract anyway). */
  def textrankKeywordsSql(k: Int = 30, iters: Int = 10): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT a.y AS token,
         |         CAST($RankBase +
         |              (85 * sum((CAST(r.r AS HUGEINT) * a.w) // a.s)) // 100
         |              AS BIGINT) AS r
         |  FROM adj a JOIN r${i - 1} r ON r.token = a.x
         |  GROUP BY a.y
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (
       |  SELECT list_filter(string_split_regex(trim(text), '\\s+'),
       |                     tok -> length(tok) > 0) AS toks
       |  FROM documents
       |), pos AS (
       |  SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS x,
       |         unnest(list_transform(range(1, len(toks)), i -> toks[i+1])) AS y
       |  FROM t
       |), pd AS (
       |  SELECT x, y FROM pos WHERE x <> y
       |), edges AS (
       |  SELECT x, y, CAST(count(*) AS BIGINT) AS w FROM (
       |    SELECT x, y FROM pd UNION ALL SELECT y AS x, x AS y FROM pd
       |  ) GROUP BY x, y
       |), strength AS (
       |  SELECT x, CAST(sum(w) AS BIGINT) AS s FROM edges GROUP BY x
       |), adj AS (
       |  SELECT e.x, e.y, e.w, s.s FROM edges e JOIN strength s ON s.x = e.x
       |), r0 AS (
       |  SELECT x AS token, CAST($RankScale AS BIGINT) AS r FROM strength
       |),
       |$iterCtes
       |SELECT token, r AS rank_scaled FROM r$iters
       |ORDER BY rank_scaled DESC, token
       |LIMIT $k""".stripMargin
  }
}
