package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Embedding similarity search over the `embeddings` table
  * (vec_id BIGINT, embedding ARRAY<FLOAT> (64-dim), label INT).
  *
  * Two operators (builder brief: "brute-force cosine top-k as the
  * baseline; an IVF or LSH-bucketed variant as the scale path"):
  *
  *  - [[annCosineTopK]]: exact brute force — every query scored against
  *    every candidate. The query side is tiny and broadcast; at scale
  *    the candidate scan streams through executors once, and the top-k
  *    is a per-query WindowGroupLimit (no global sort).
  *  - [[annIvfTopK]]: IVF — `label` is the precomputed coarse partition
  *    (k-means assignment happens upstream; the column ships with the
  *    table). Probe the nprobe nearest centroids per query, then score
  *    only vectors inside probed cells: the scan shrinks by
  *    nprobe/nlists, the classic IVF trade (recall vs cost).
  *
  * Oracle-parity arithmetic: per-element products are IEEE doubles
  * (identical in any engine), then summed EXACTLY as DECIMAL(38,30)
  * (order-free), surfaced as double; sqrt/division are single double
  * ops. Two precision subtleties, both observed as real mismatches:
  * (1) scale 14 lets a float product land on a decimal-rounding TIE
  * where Spark (HALF_UP) and DuckDB (HALF_EVEN) split — scale 30 sits
  * below every terminating product expansion, so no rounding decision
  * exists; (2) Spark's double→decimal cast parses Double.toString
  * (SHORTEST repr), DuckDB's casts the exact binary expansion — the
  * oracle therefore routes products through VARCHAR (shortest repr on
  * both sides) before the decimal cast. Physically, dot products run as SCALAR
  * zip_with folds with a DECIMAL accumulator ([[exactDot]]) — one row
  * per vector pair, no position explosion (the oracle's relational
  * position-join computes the same exact sums; decimal addition is
  * order-free, so the two shapes agree bit-for-bit). The plain-double
  * [[cosine]] remains the fastest map-side form for pipelines that
  * don't need oracle parity.
  */
object Similarity {

  /** Scalar cosine similarity of two float-array columns — zip_with +
    * aggregate fold, fully codegen-compatible; use this inside other
    * pipelines. (Not the oracle-parity form: fold order is
    * element-order, fine for ranking, not for bit-compare.) */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = graft.plans.GraftFunctions.dotF64(x, y)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact decimal-sum dot product of two numeric-array columns: per-
    * element double products (IEEE-identical in any engine) cast to
    * DECIMAL(38,30) (shortest-repr, no rounding decision — see class
    * doc) and folded exactly. One scalar expression per row. */
  def exactDot(a: String, b: String): Column = expr(
    s"""CAST(aggregate(
       |  zip_with($a, $b,
       |    (x, y) -> CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(38,30))),
       |  CAST(0 AS DECIMAL(38,30)),
       |  (acc, v) -> CAST(acc + v AS DECIMAL(38,30))) AS DOUBLE)""".stripMargin)

  /** Exact decimal-sum squared-L2 distance (same parity contract as
    * [[exactDot]]): per-element double differences squared
    * (IEEE-identical in any engine), folded as DECIMAL(38,30),
    * surfaced as a correctly-rounded double. */
  def exactSqDist(a: String, b: String): Column = expr(
    s"""CAST(aggregate(
       |  zip_with($a, $b,
       |    (x, y) -> CAST((CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) *
       |                   (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) AS DECIMAL(38,30))),
       |  CAST(0 AS DECIMAL(38,30)),
       |  (acc, v) -> CAST(acc + v AS DECIMAL(38,30))) AS DOUBLE)""".stripMargin)

  /** Vectors with their exact L2 norms attached. */
  private def withNorm(spark: SparkSession, d: String): DataFrame =
    Tables.embeddings(spark, d)
      .withColumn("norm", sqrt(exactDot("embedding", "embedding")))

  /** Brute-force exact cosine top-k: convenience form where vectors
    * with vec_id < nQueries are the query set (the driver-contract
    * query); delegates to the arbitrary-query-set overload. */
  def annCosineTopK(spark: SparkSession, d: String, k: Int = 5, nQueries: Int = 10): DataFrame =
    annCosineTopK(spark, d,
      Tables.embeddings(spark, d).filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding")), k)

  /** Brute-force exact cosine top-k over an ARBITRARY query set
    * (VERDICT r3 #5): `queries` needs (query_id BIGINT, embedding
    * ARRAY<numeric>); any other columns are ignored. Every embeddings-
    * table vector with vec_id ≠ query_id is a candidate.
    *
    * Broadcast-size bound: the full query side (vector + norm, ≈ dim·8
    * bytes/row) is broadcast to every executor — keep it ≲ 10⁵ 64-dim
    * rows (≈ 50 MB) or raise spark.sql.autoBroadcastJoinThreshold /
    * pre-partition the queries and union the results. The candidate
    * scan streams once regardless of query count, one scalar dot per
    * (query, candidate) pair; the top-k is a per-query
    * WindowGroupLimit (no global sort). */
  def annCosineTopK(spark: SparkSession, d: String, queries: DataFrame, k: Int): DataFrame = {
    val e = withNorm(spark, d)
    val q = queries.select(col("query_id"), col("embedding").as("qe"))
      .withColumn("qn", sqrt(exactDot("qe", "qe")))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"), col("norm").as("cn"))
    // two-phase exact top-k: rank all pairs by the cheap all-double
    // score, keep everything within 1e-6 of each query's k-th best,
    // then exact-score only those survivors. Identity proof: an exact
    // top-k member's double score is within ~1e-13 of its exact score,
    // so it sits above (double k-th − 2e-13) > cutoff; every excluded
    // pair's exact score is below the exact k-th, so survivor ranks ≤ k
    // equal the global exact ranks.
    val approxDot = graft.plans.GraftFunctions.dotF64(col("qe"), col("ce"))
    val pre = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("approx", approxDot / (col("qn") * col("cn")))
    val wPre = Window.partitionBy(col("query_id")).orderBy(col("approx").desc)
    val kth = pre.withColumn("pre_rn", row_number().over(wPre))
      .filter(col("pre_rn") === k)
      .select(col("query_id"), col("approx").as("kth_approx"))
    val survivors = pre.join(broadcast(kth), Seq("query_id"), "left")
      .filter(col("kth_approx").isNull || // fewer than k candidates: keep all
        col("approx") >= col("kth_approx") - 1e-6)
    val scored = survivors.select(col("query_id"), col("neighbor_id"),
      (exactDot("qe", "ce") / (col("qn") * col("cn"))).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Arbitrary-query-set face of the [[annCosineTopK]] overload,
    * registered under the hash oracle (VERDICT r7 #6): the query set
    * is every embeddings-table row matching `pred` (a SQL boolean over
    * its columns), instead of the fixed vec_id < nQueries prefix. */
  def annCosineTopKWhere(spark: SparkSession, d: String, pred: String,
                         k: Int = 5): DataFrame =
    annCosineTopK(spark, d,
      Tables.embeddings(spark, d).filter(expr(pred))
        .select(col("vec_id").as("query_id"), col("embedding")), k)

  def annCosineTopKSql(k: Int = 5, nQueries: Int = 10): String =
    annCosineTopKSqlWhere(k, s"q.vec_id < $nQueries")

  /** [[annCosineTopKSql]] with an arbitrary query-set predicate over
    * the embeddings table (`q` is the query-side alias) — the oracle
    * twin of the arbitrary-query [[annCosineTopK]] overload. */
  def annCosineTopKSqlWhere(k: Int, queryPred: String): String =
    s"""WITH p AS (
       |  SELECT vec_id, label, unnest(range(1, len(embedding)+1)) AS i, embedding
       |  FROM embeddings
       |), v AS (
       |  SELECT vec_id, label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v FROM p
       |), n AS (
       |  SELECT vec_id, sqrt(CAST(CAST(sum(CAST(CAST(v*v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE)) AS norm
       |  FROM v GROUP BY 1
       |), dots AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         CAST(CAST(sum(CAST(CAST(q.v * c.v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS dot
       |  FROM v q JOIN v c ON q.pos = c.pos AND c.vec_id <> q.vec_id
       |  WHERE $queryPred
       |  GROUP BY 1, 2
       |), scored AS (
       |  SELECT query_id, neighbor_id, dot / (qn.norm * cn.norm) AS score
       |  FROM dots
       |  JOIN n qn ON query_id = qn.vec_id
       |  JOIN n cn ON neighbor_id = cn.vec_id
       |)
       |SELECT query_id, neighbor_id, score, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY score DESC, neighbor_id) AS rank
       |  FROM scored
       |) WHERE rank <= $k""".stripMargin

  /** IVF approximate top-k: centroids are the element-wise means of
    * each label cell; per query, probe the `nprobe` nearest centroids
    * (by the same exact cosine) and run the brute-force scoring only
    * inside probed cells. Recall < 1 by design — the oracle replicates
    * the index, not exact search; tests measure recall vs
    * [[annCosineTopK]]. */
  def annIvfTopK(spark: SparkSession, d: String, k: Int = 5, nQueries: Int = 10,
                 nprobe: Int = 2): DataFrame =
    annIvfTopK(spark, d,
      Tables.embeddings(spark, d).filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding")), k, nprobe)

  /** IVF top-k over an ARBITRARY query set (VERDICT r3 #5) — same
    * (query_id, embedding) contract and broadcast-size bound as the
    * [[annCosineTopK]] overload; the probed-cell restriction shrinks
    * the candidate scan by nprobe/nlists on top of it. */
  def annIvfTopK(spark: SparkSession, d: String, queries: DataFrame, k: Int,
                 nprobe: Int): DataFrame =
    ivfTopKImpl(Tables.embeddings(spark, d), queries, k, nprobe)

  /** IVF search body over an arbitrary labeled base (vec_id, embedding,
    * label) — shared by the table-label path and the [[ivfTrain]]ed
    * path; the physical plan is identical either way. */
  private def ivfTopKImpl(base: DataFrame, queries: DataFrame, k: Int,
                          nprobe: Int,
                          centOpt: Option[DataFrame] = None): DataFrame = {
    val e = base.withColumn("norm", sqrt(exactDot("embedding", "embedding")))
    // centroid arrays: exact element-wise means, assembled back into an
    // array ordered by position (tiny: one row per label); trained
    // callers pass the session-memoized relation instead
    val cent = centOpt.getOrElse(base
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "fv")))
      .groupBy("label", "pos")
      .agg((sum(col("fv").cast("double").cast("decimal(38,30)")).cast("double") /
        count(lit(1))).as("cv"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), s -> s.cv)").as("cemb"))
      .withColumn("cnorm", sqrt(exactDot("cemb", "cemb"))))
    val q = queries.select(col("query_id"), col("embedding").as("qe"))
      .withColumn("qn", sqrt(exactDot("qe", "qe")))
    // query ↔ centroid scores → top-nprobe labels per query
    val qc = cent.join(broadcast(q))
      .select(col("query_id"), col("label"),
        (exactDot("qe", "cemb") / (col("qn") * col("cnorm"))).as("cscore"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("cscore").desc, col("label"))
    val probed = qc.withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe).select("query_id", "label")
    // scalar scoring restricted to probed cells; probed and the query
    // vectors are broadcast-sized
    val cand = e.select(col("vec_id").as("neighbor_id"), col("label"),
        col("embedding").as("ce"), col("norm").as("cn"))
      .join(broadcast(probed), "label")
      .filter(col("neighbor_id") =!= col("query_id"))
    val scored = cand.join(broadcast(q), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        (exactDot("qe", "ce") / (col("qn") * col("cn"))).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Per-dimension corpus moments of the embedding space — the
    * whitening / normalization-prep and drift-detection report: for
    * every dimension, exact decimal-summed mean and population
    * variance (E[x²] − E[x]², both folds decimal so the only float
    * rounding is the final division/subtraction — engine-identical),
    * plus min/max. ONE posexplode scan into one (pos)-keyed map-side-
    * combined aggregate — dim rows out, no joins, no windows; at any
    * corpus size this is a single pass with a dim-sized shuffle. */
  def embeddingDimStats(spark: SparkSession, d: String): DataFrame =
    Tables.embeddings(spark, d)
      .select(posexplode(col("embedding")).as(Seq("pos", "fv")))
      .select(col("pos").cast("long").as("dim"), col("fv").cast("double").as("v"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        (sum(col("v").cast("decimal(38,30)")).cast("double") / count(lit(1)))
          .as("mean"),
        ((sum((col("v") * col("v")).cast("decimal(38,30)")).cast("double") /
          count(lit(1))) -
          (sum(col("v").cast("decimal(38,30)")).cast("double") / count(lit(1))) *
          (sum(col("v").cast("decimal(38,30)")).cast("double") / count(lit(1))))
          .as("variance"),
        min(col("v")).as("vmin"), max(col("v")).as("vmax"))

  def embeddingDimStatsSql(): String =
    """WITH p AS (
      |  SELECT unnest(range(1, len(embedding)+1)) AS i, embedding FROM embeddings
      |), v AS (
      |  SELECT CAST(i - 1 AS BIGINT) AS dim, CAST(embedding[i] AS DOUBLE) AS v FROM p
      |)
      |SELECT dim, count(*) AS n,
      |       CAST(CAST(sum(CAST(CAST(v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) / count(*) AS mean,
      |       CAST(CAST(sum(CAST(CAST(v*v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) / count(*)
      |         - (CAST(CAST(sum(CAST(CAST(v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) / count(*))
      |           * (CAST(CAST(sum(CAST(CAST(v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) / count(*)) AS variance,
      |       min(v) AS vmin, max(v) AS vmax
      |FROM v GROUP BY 1""".stripMargin

  /** Upper-triangle covariance matrix of the embedding dimensions —
    * the input to whitening / decorrelation decisions (OPQ-style
    * rotation ahead of PQ codebooks, redundant-dimension detection,
    * anisotropy diagnosis of an embedding space). Same decimal-exact
    * discipline as [[embeddingDimStats]]: float×float products are
    * exact in double (24+24 < 53 mantissa bits), each product routes
    * through decimal(38,30) so the cross-partition sum is associative
    * and order-free, and cov = E[xy] − E[x]E[y] is evaluated in a
    * fixed operation order both engines share.
    *
    * Scale: ONE scan, no join, via the [[graft.plans.CovGram]] kernel —
    * the whole d(d+1)/2 upper triangle folds inside ONE aggregation
    * buffer per map partition (count + d + d(d+1)/2 exact decimal
    * sums), so the single exchange moves one buffer per partition and
    * NOTHING is exploded. The generator form this replaced (explode
    * d(d+1)/2 pair structs per row into a 2,080-group hash aggregate
    * with three interpreted decimal sums each) paid 41.6 M exploded
    * rows at the 10× embeddings dir and was the measured dominant
    * cost of the rotated-PQ train chain (PLANS.md round-14 sweep);
    * the kernel computes the identical exact sums — bit-parity with
    * the generator form is pinned in SimilaritySpec, and the DuckDB
    * oracle is unchanged. */
  def embeddingCovariance(spark: SparkSession, d: String): DataFrame =
    Tables.embeddings(spark, d)
      .agg(graft.plans.GraftFunctions.covGram(
        col("embedding").cast("array<double>")).as("cg"))
      .select(explode(col("cg")).as("p"))
      .select(col("p.di").as("di"), col("p.dj").as("dj"),
        col("p.n").as("n"), col("p.mean_i").as("mean_i"),
        col("p.mean_j").as("mean_j"), col("p.cov").as("cov"))

  def embeddingCovarianceSql(): String =
    """WITH pairs AS (
      |  SELECT unnest(flatten(list_transform(range(1, len(embedding)+1), i ->
      |           list_transform(range(i, len(embedding)+1), j ->
      |             {'di': i-1, 'dj': j-1,
      |              'x': CAST(embedding[i] AS DOUBLE),
      |              'y': CAST(embedding[j] AS DOUBLE)})))) AS s
      |  FROM embeddings
      |), v AS (
      |  SELECT CAST(s.di AS BIGINT) AS di, CAST(s.dj AS BIGINT) AS dj,
      |         s.x AS x, s.y AS y
      |  FROM pairs
      |)
      |SELECT di, dj, count(*) AS n,
      |       CAST(CAST(sum(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) / count(*) AS mean_i,
      |       CAST(CAST(sum(CAST(CAST(y AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) / count(*) AS mean_j,
      |       CAST(CAST(sum(CAST(CAST(x*y AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) / count(*)
      |         - (CAST(CAST(sum(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) / count(*))
      |           * (CAST(CAST(sum(CAST(CAST(y AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) / count(*)) AS cov
      |FROM v GROUP BY 1, 2""".stripMargin

  /** Embedding-space outlier report — corrupt / degenerate vector
    * detection (zeroed rows, encoder failures, wrong-model mixtures)
    * before vectors poison an ANN index or a semantic-dedup pass.
    * Score = exact squared L2 distance to the corpus mean vector
    * ([[exactSqDist]] parity contract); a vector is flagged when its
    * score exceeds `ratioCap` × the corpus mean score — a RATIONAL
    * multiple of a deterministic double, so the flag is bit-stable in
    * both engines (no sqrt, no σ estimate: by Markov's inequality at
    * most 1/ratioCap of the corpus can ever be flagged).
    *
    * Scale: three shuffle-free passes over the table (dimension means;
    * per-row score; score mean), the only exchanges a dim-sized mean
    * aggregate and two 1-row broadcasts. No joins keyed by data, no
    * windows — per-row work is one O(dim) codegen'd fold. */
  def embeddingOutliers(spark: SparkSession, d: String, ratioCap: Double = 4.0): DataFrame = {
    val e = Tables.embeddings(spark, d)
    // per-dimension decimal-exact means, assembled in dimension order
    val meanVec = e
      .select(posexplode(col("embedding")).as(Seq("pos", "fv")))
      .groupBy(col("pos"))
      .agg((sum(col("fv").cast("double").cast("decimal(38,30)")).cast("double") /
        count(lit(1))).as("m"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
        .as("mean_vec"))
    val scored = e.crossJoin(broadcast(meanVec))
      .select(col("vec_id"), exactSqDist("embedding", "mean_vec").as("dist2"))
    val thr = scored.agg(
      (sum(col("dist2").cast("decimal(38,30)")).cast("double") / count(lit(1)))
        .as("mean_dist2"))
    scored.crossJoin(broadcast(thr))
      .select(col("vec_id"), col("dist2"),
        (col("dist2") / col("mean_dist2")).as("dist2_ratio"),
        (col("dist2") > lit(ratioCap) * col("mean_dist2")).as("is_outlier"))
  }

  def embeddingOutliersSql(ratioCap: Double = 4.0): String =
    s"""WITH p AS (
       |  SELECT vec_id, unnest(range(1, len(embedding)+1)) AS i, embedding FROM embeddings
       |), v AS (
       |  SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
       |         CAST(embedding[i] AS DOUBLE) AS v
       |  FROM p
       |), m AS (
       |  SELECT dim,
       |         CAST(CAST(sum(CAST(CAST(v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) / count(*) AS m
       |  FROM v GROUP BY 1
       |), d2 AS (
       |  SELECT v.vec_id,
       |         CAST(CAST(sum(CAST(CAST((v.v - m.m)*(v.v - m.m) AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS dist2
       |  FROM v JOIN m USING (dim) GROUP BY 1
       |), t AS (
       |  SELECT CAST(CAST(sum(CAST(CAST(dist2 AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) / count(*) AS mean_dist2
       |  FROM d2
       |)
       |SELECT vec_id, dist2, dist2 / mean_dist2 AS dist2_ratio,
       |       dist2 > $ratioCap * mean_dist2 AS is_outlier
       |FROM d2 CROSS JOIN t""".stripMargin

  /** k-NN GRAPH over the whole embeddings table — every vector is a
    * query (graph-based diversity pruning, neighborhood dedup, and the
    * build step of graph-ANN indexes). The coarse quantizer is a
    * TRAINED IVF partition ([[ivfTrainFullFrom]], the audited Lloyd
    * chain) with `nlists` scaled to corpus size (default ⌈√n⌉, floor
    * 8) — so cells SHRINK as the corpus grows: |cell| ≈ √n and the
    * cell-keyed candidate volume n·nprobe·√n stays sub-quadratic at
    * any scale, where a fixed cell universe (e.g. the metadata label
    * column) would go quadratic. Probing semantics match
    * [[annIvfTopKTrained]] (probe the `nprobe` nearest trained cells
    * by exact cosine against the final-assignment means, rank inside
    * probed cells), but a different physical shape, because the query
    * side here IS the table and must not be broadcast:
    *
    *  - only the nlists×dim (≈ √n·dim) centroid table broadcasts;
    *  - each vector's probed-cell assignment joins cell members by a
    *    LIST-keyed shuffle join (candidate volume n·nprobe·|cell| —
    *    the standard IVF knn-graph cost, partitioned by cell; a hot
    *    cell is AQE skew-join territory, and more lists shrink cells);
    *  - pair scoring preranks with the codegen'd [[graft.plans.DotF64]]
    *    double kernel and exact-decimal-rescores only survivors within
    *    1e-6 of each query's k-th best (same identity proof as
    *    [[annCosineTopK]]);
    *  - prerank cutoff, survivor filter and final rank share ONE
    *    (query_id)-partitioned sort — one window exchange.
    *
    * `nlists = 0` (the default) derives ⌈√n⌉ from one count job; pass
    * an explicit nlists to pin the partition (tests do, to compare
    * against [[annIvfTopKTrained]] on the identical index).
    *
    * Output (query_id, neighbor_id, score, rank) — n·k edges of the
    * directed k-NN graph. */
  def knnGraph(spark: SparkSession, d: String, k: Int = 3, nprobe: Int = 2,
               nlists: Int = 0, iters: Int = 2): DataFrame =
    knnGraphCache.getOrBuild((spark, d, k, nprobe, nlists, iters))(
      knnGraphBuild(spark, d, k, nprobe, nlists, iters).persist())

  /** Session memo of the [[knnGraph]] edge relation (same hook as the
    * trained-index memo it rides on): the graph is n·k rows — SMALLER
    * than its input — and knn_label_vote re-consumes the identical
    * edges, so a session pays the probe + rescore once. At 100 TB the
    * edge relation is exactly what a pipeline would materialize as a
    * table between the index build and its graph consumers. */
  private val knnGraphCache = new graft.SessionMemo[
    (SparkSession, String, Int, Int, Int, Int), DataFrame]("knn_graph")

  private def knnGraphBuild(spark: SparkSession, d: String, k: Int, nprobe: Int,
                            nlists: Int, iters: Int): DataFrame = {
    val raw = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val nl = if (nlists > 0) nlists
      else math.max(8, math.ceil(math.sqrt(raw.count().toDouble)).toInt)
    // goes through the MEMOIZED ivfTrainFull: the index is built once
    // per (session, dir, nl, iters) and reused across calls/queries
    val assign = ivfTrainFull(spark, d, nl, iters)._1
    val en = withNorm(spark, d)
    // members re-labeled by the trained assignment; probing centroids
    // are the exact element-wise means of the FINAL cells (identical
    // recipe to ivfTopKImpl, so knnGraph ≡ annIvfTopKTrained per query),
    // session-memoized alongside the index itself
    val e = en.select(col("vec_id"), col("embedding"), col("norm"))
      .join(assign, "vec_id")
    val cent = probeCentroids(spark, d, nl, iters)
    val q = en.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      col("norm").as("qn"))
    // the probe itself is two-phase (the n·nlists exact decimal folds
    // were the hot spot): codegen'd double centroid scores for every
    // (vector, cell), exact rescore only for cells within 1e-6 of each
    // vector's nprobe-th best — same identity proof as the pair
    // scoring below and the Lloyd argmin
    val qcPre = q.join(broadcast(cent))
      .withColumn("capprox",
        graft.plans.GraftFunctions.dotF64(col("qe"), col("cemb")) /
          (col("qn") * col("cnorm")))
    val wCPre = Window.partitionBy(col("query_id")).orderBy(col("capprox").desc, col("list_id"))
    val wCAll = Window.partitionBy(col("query_id"))
    val qc = qcPre
      .withColumn("cpre_rn", row_number().over(wCPre))
      .withColumn("ckth", max(when(col("cpre_rn") === nprobe, col("capprox"))).over(wCAll))
      .filter(col("ckth").isNull || col("capprox") >= col("ckth") - 1e-6)
      .select(col("query_id"), col("qe"), col("qn"), col("list_id"),
        (exactDot("qe", "cemb") / (col("qn") * col("cnorm"))).as("cscore"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("cscore").desc, col("list_id"))
    val probed = qc.withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qe"), col("qn"), col("list_id"))
    val cand = probed.join(
        e.select(col("list_id"), col("vec_id").as("neighbor_id"),
          col("embedding").as("ce"), col("norm").as("cn")), "list_id")
      .filter(col("neighbor_id") =!= col("query_id"))
    val pre = cand.withColumn("approx",
      graft.plans.GraftFunctions.dotF64(col("qe"), col("ce")) / (col("qn") * col("cn")))
    val wPre = Window.partitionBy(col("query_id")).orderBy(col("approx").desc, col("neighbor_id"))
    val wAll = Window.partitionBy(col("query_id"))
    val survivors = pre
      .withColumn("pre_rn", row_number().over(wPre))
      .withColumn("kth", max(when(col("pre_rn") === k, col("approx"))).over(wAll))
      .filter(col("kth").isNull || col("approx") >= col("kth") - 1e-6)
    val scored = survivors.select(col("query_id"), col("neighbor_id"),
      (exactDot("qe", "ce") / (col("qn") * col("cn"))).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** DuckDB twin of the TRAINED-quantizer [[knnGraph]]: nlists derives
    * from the same ⌈√n⌉ rule in a scalar CTE, the Lloyd chain is the
    * shared [[ivfChainSqlFromDynamic]] unroll, probing centroids are
    * the final-assignment means, membership joins through the
    * assignment CTE. */
  def knnGraphSql(k: Int = 3, nprobe: Int = 2, iters: Int = 2): String =
    s"""WITH knl AS (
       |  SELECT GREATEST(8, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS nlists
       |  FROM embeddings
       |), ${ivfChainSqlFromDynamic("(SELECT nlists FROM knl)", iters, "kg",
            s"""SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
               |  FROM (SELECT vec_id, unnest(range(1, len(embedding)+1)) AS i, embedding
               |        FROM embeddings)""".stripMargin)},
       | n AS (
       |  SELECT vec_id, sqrt(CAST(CAST(sum(CAST(CAST(v*v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE)) AS norm
       |  FROM kge GROUP BY 1
       |), cent AS (
       |  SELECT a.list_id, e.pos,
       |         CAST(CAST(sum(CAST(CAST(e.v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) / count(*) AS cv
       |  FROM kge e JOIN kga$iters a USING (vec_id) GROUP BY 1, 2
       |), cn AS (
       |  SELECT list_id, sqrt(CAST(CAST(sum(CAST(CAST(cv*cv AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE)) AS cnorm
       |  FROM cent GROUP BY 1
       |), qc AS (
       |  SELECT q.vec_id AS query_id, cent.list_id,
       |         CAST(CAST(sum(CAST(CAST(q.v * cent.cv AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS dot
       |  FROM kge q JOIN cent ON q.pos = cent.pos
       |  GROUP BY 1, 2
       |), cscore AS (
       |  SELECT query_id, qc.list_id, dot / (n.norm * cn.cnorm) AS cscore
       |  FROM qc JOIN cn ON qc.list_id = cn.list_id JOIN n ON query_id = n.vec_id
       |), probed AS (
       |  SELECT query_id, list_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY cscore DESC, list_id) AS pr
       |    FROM cscore
       |  ) WHERE pr <= $nprobe
       |), dots AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         CAST(CAST(sum(CAST(CAST(q.v * c.v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS dot
       |  FROM kge q
       |  JOIN probed pb ON pb.query_id = q.vec_id
       |  JOIN kga$iters a ON a.list_id = pb.list_id
       |  JOIN kge c ON c.vec_id = a.vec_id AND c.pos = q.pos AND c.vec_id <> q.vec_id
       |  GROUP BY 1, 2
       |), scored AS (
       |  SELECT query_id, neighbor_id, dot / (qn.norm * cnn.norm) AS score
       |  FROM dots
       |  JOIN n qn ON query_id = qn.vec_id
       |  JOIN n cnn ON neighbor_id = cnn.vec_id
       |)
       |SELECT query_id, neighbor_id, score, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY score DESC, neighbor_id) AS rank
       |  FROM scored
       |) WHERE rank <= $k""".stripMargin

  /** Neighborhood label agreement over the k-NN graph — the standard
    * label-noise / mislabel-detection report of a curation pipeline
    * (flag vectors whose semantic neighborhood votes against their
    * own label; reviewers triage the disagreements). Each vector's
    * [[knnGraph]] neighbors vote with their `label`; the majority
    * (ties to the smaller label) becomes `knn_label`. Output
    * (vec_id, label, knn_label, n_votes, agree ∈ {0,1}) — one row per
    * vector.
    *
    * Scale: rides the session-memoized trained index through
    * [[knnGraph]] (n·k edge rows), one (query, label)-keyed map-side-
    * combined count, one per-query WindowGroupLimit — nothing beyond
    * the graph build itself. */
  def knnLabelVote(spark: SparkSession, d: String, k: Int = 3,
                   nprobe: Int = 2, iters: Int = 2): DataFrame = {
    val lbl = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label").cast("int").as("label"))
    val votes = knnGraph(spark, d, k, nprobe, 0, iters)
      .join(lbl.select(col("vec_id").as("neighbor_id"),
        col("label").as("nlabel")), "neighbor_id")
      .groupBy("query_id", "nlabel").agg(count(lit(1)).as("n_votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("n_votes").desc, col("nlabel"))
    val top = votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("query_id").as("vec_id"), col("nlabel").as("knn_label"),
        col("n_votes"))
    lbl.join(top, "vec_id")
      .select(col("vec_id"), col("label"), col("knn_label"), col("n_votes"),
        when(col("label") === col("knn_label"), lit(1)).otherwise(lit(0))
          .as("agree"))
  }

  /** DuckDB twin of [[knnLabelVote]]: the full [[knnGraphSql]] runs as
    * a nested-CTE subquery, then the same vote/rank/agree chain. */
  def knnLabelVoteSql(k: Int = 3, nprobe: Int = 2, iters: Int = 2): String =
    s"""WITH g AS (
       |  SELECT * FROM (
       |${knnGraphSql(k, nprobe, iters)}
       |  )
       |), votes AS (
       |  SELECT g.query_id AS vec_id, CAST(e.label AS INT) AS nlabel,
       |         count(*) AS n_votes
       |  FROM g JOIN embeddings e ON e.vec_id = g.neighbor_id
       |  GROUP BY 1, 2
       |), top AS (
       |  SELECT vec_id, nlabel AS knn_label, n_votes FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY n_votes DESC, nlabel) AS rn
       |    FROM votes
       |  ) WHERE rn = 1
       |)
       |SELECT e.vec_id, CAST(e.label AS INT) AS label, top.knn_label,
       |       top.n_votes,
       |       CASE WHEN CAST(e.label AS INT) = top.knn_label
       |            THEN 1 ELSE 0 END AS agree
       |FROM embeddings e JOIN top ON e.vec_id = top.vec_id""".stripMargin

  /** Multi-round label propagation over the k-NN graph (Zhu &
    * Ghahramani 2002, "Learning from labeled and unlabeled data with
    * label propagation" — public technique): a small SEED set keeps
    * its ground-truth label (clamping); every other vector is
    * re-labeled each round by the majority label of its [[knnGraph]]
    * neighbors under the PREVIOUS round's labeling (synchronous
    * update, ties to the smaller label, NULL while no neighbor is
    * labeled yet). After `rounds` rounds a label has propagated up to
    * `rounds` hops from the seeds — the standard way a curation
    * pipeline turns a thin human-labeled slice into corpus-wide weak
    * labels. Seeds here are `vec_id % seedMod = 0` — deterministic
    * and oracle-expressible; a real pipeline would join its own seed
    * table.
    *
    * Exactness: votes are integer counts with a total-order tie-break
    * and the update is pure integer/CASE logic, so the unrolled-CTE
    * DuckDB twin hash-matches bit-for-bit ([[knnGraphSql]] supplies
    * the identical edge relation).
    *
    * Scale: one graph build (session-memoized, n·k edge rows) +
    * per round one neighbor-keyed hash join, one (node, label)
    * map-side-combined count, one per-node WindowGroupLimit — all
    * over the n·k edge relation, never the embeddings. Lineage grows
    * linearly over the CACHED edges but is capped by
    * [[graft.Checkpoints]] — every ~20 rounds the label frame rebases
    * onto an eager localCheckpoint, so user-supplied `rounds` in the
    * 100s keeps flat per-round planning cost; at the canonical 3 no
    * checkpoint fires and results are value-identical either way
    * (SimilaritySpec pins the invariance). */
  def labelSpread(spark: SparkSession, d: String, k: Int = 3,
                  rounds: Int = 3, seedMod: Int = 4, nprobe: Int = 2,
                  iters: Int = 2,
                  checkpointEvery: Int = graft.Checkpoints.Every): DataFrame = {
    val guard = graft.Checkpoints.guard(checkpointEvery)
    val g = knnGraph(spark, d, k, nprobe, 0, iters)
      .select(col("query_id"), col("neighbor_id"))
    val base = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label").cast("int").as("true_label"),
        (col("vec_id") % seedMod === 0).as("is_seed"))
    var lbl = base.select(col("vec_id"),
      when(col("is_seed"), col("true_label")).as("label"))
    for (round <- 1 to rounds) {
      val votes = g
        .join(lbl.select(col("vec_id").as("neighbor_id"),
          col("label").as("nlabel")), "neighbor_id")
        .filter(col("nlabel").isNotNull)
        .groupBy("query_id", "nlabel").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("c").desc, col("nlabel"))
      val top = votes.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("query_id").as("vec_id"), col("nlabel"))
      lbl = base.join(top, Seq("vec_id"), "left")
        .select(col("vec_id"),
          when(col("is_seed"), col("true_label"))
            .otherwise(col("nlabel")).as("label"))
      lbl = guard(lbl, round, rounds)
    }
    // seed is a pure function of vec_id — a projection, not a join
    lbl.select(col("vec_id"),
      when(col("vec_id") % seedMod === 0, 1).otherwise(0).as("seed"),
      col("label"))
  }

  /** Connected components over the [[embeddingNearDup]] pair graph —
    * the embedding-space twin of TextOps.neardupClusters (symmetry the
    * curation surface was missing: text pairs → clusters existed,
    * embedding pairs → clusters did not). One row per vector:
    * (vec_id, cluster_id = min vec_id of its component,
    * is_canonical) — the downstream keep/drop unit of semantic dedup
    * when verdicts should be transitive (A≈B≈C collapses to one
    * cluster even when A-C alone misses the threshold).
    *
    * Scale: identical machinery and cost model as the text form —
    * the pair stream is cell-bounded (never all-pairs), the
    * cost-chosen component branch is driver union-find under the
    * pair cap (a bounded aggregate, not corpus data) with
    * distributed min-label propagation above it, and singletons are
    * filled by a left join against the vectors table. The pair
    * relation comes persisted from [[embeddingNearDup]]'s session
    * memo, so the strategy-picking `count()` and the clustering pass
    * read ONE materialization — the cell-stats job and pair join run
    * once per (session, params), not once per consumer (ADVICE r8). */
  def embeddingClusters(spark: SparkSession, d: String,
                        threshold: Double = 0.4,
                        maxDriverPairs: Long = 1L << 20): DataFrame = {
    val pairs = embeddingNearDup(spark, d, threshold)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val nPairs = pairs.count()
    val clustered =
      (if (nPairs <= maxDriverPairs) TextOps.driverUnionFind(spark, pairs)
       else TextOps.propagateLabels(pairs))
        .withColumnRenamed("doc_id", "vec_id")
    Tables.embeddings(spark, d).select(col("vec_id"))
      .join(clustered, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster_id"), col("vec_id")).as("cluster_id"))
      .select(col("vec_id"), col("cluster_id"),
        (col("vec_id") === col("cluster_id")).cast("long").as("is_canonical"))
  }

  /** DuckDB twin of [[embeddingClusters]] — the neardupClustersSql
    * recursive-reachability recipe over the embedding pair relation. */
  def embeddingClustersSql(threshold: Double = 0.4): String =
    s"""WITH RECURSIVE pairs AS (
       |${embeddingNearDupSql(threshold)}
       |), edges AS (
       |  SELECT vec_a AS src, vec_b AS node FROM pairs
       |  UNION ALL
       |  SELECT vec_b AS src, vec_a AS node FROM pairs
       |), reach(node, r) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT e.node, r.r FROM reach r JOIN edges e ON e.src = r.node
       |)
       |SELECT node AS vec_id, min(r) AS cluster_id,
       |       CAST(node = min(r) AS BIGINT) AS is_canonical
       |FROM reach GROUP BY node""".stripMargin

  /** Per-node triangle count and local clustering coefficient of the
    * k-NN graph (Watts & Strogatz 1998 "Collective dynamics of
    * 'small-world' networks" — public technique): the structural
    * quality report of an ANN index. A healthy semantic neighborhood
    * is transitive — my neighbors are each other's neighbors — so low
    * clustering flags regions where the quantizer's cells cut through
    * true neighborhoods (the same failure recall floors catch, but
    * label-free and per-vector). Edges are the UNDIRECTED support of
    * [[knnGraph]] (canonical a<b pairs); a triangle {a,b,c} is
    * enumerated once via the a<b<c ordered edge join; each node of it
    * gets +1. Output per graph node: degree, triangle count, and
    * clustering = 2·t / (deg·(deg−1)) (NULL when deg < 2).
    *
    * Exactness: degrees and triangle counts are integer aggregates;
    * the coefficient is one final division of exact integers — the
    * unrolled [[knnGraphSql]] oracle chain hash-matches.
    *
    * Scale: everything after the (memoized) graph build runs on the
    * n·k edge relation: the triangle join is edges ⋈ edges on the
    * shared middle node — fanout bounded by max degree ≤ 2k — then
    * one membership semi-join against the canonical edge set and a
    * node-keyed count. No embeddings are touched. */
  def knnTriangles(spark: SparkSession, d: String, k: Int = 3,
                   nprobe: Int = 2, iters: Int = 2): DataFrame = {
    val g = knnGraph(spark, d, k, nprobe, 0, iters)
    val und = g.select(
        least(col("query_id"), col("neighbor_id")).as("a"),
        greatest(col("query_id"), col("neighbor_id")).as("b"))
      .distinct()
    val deg = und.select(col("a").as("v"))
      .union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("degree"))
    // ordered two-path a<b<c through middle node b, closed by (a,c)
    val tri = und.as("e1")
      .join(und.as("e2"), col("e1.b") === col("e2.a"))
      .join(und.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("ta"), col("e1.b").as("tb"), col("e2.b").as("tc"))
    val perNode = tri.select(explode(array(col("ta"), col("tb"), col("tc"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("v"), "left")
      .select(col("v").as("vec_id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2,
          (coalesce(col("triangles"), lit(0L)) * 2).cast("double") /
            (col("degree") * (col("degree") - 1)).cast("double"))
          .as("clustering"))
  }

  /** DuckDB twin of [[knnTriangles]] — [[knnGraphSql]] as the edge CTE,
    * then the identical canonicalize / ordered-triangle / count chain. */
  def knnTrianglesSql(k: Int = 3, nprobe: Int = 2, iters: Int = 2): String =
    s"""WITH g AS (
       |  SELECT query_id, neighbor_id FROM (
       |${knnGraphSql(k, nprobe, iters)}
       |  )
       |), und AS (
       |  SELECT DISTINCT LEAST(query_id, neighbor_id) AS a,
       |                  GREATEST(query_id, neighbor_id) AS b
       |  FROM g
       |), deg AS (
       |  SELECT v, count(*) AS degree FROM (
       |    SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und
       |  ) GROUP BY 1
       |), tri AS (
       |  SELECT e1.a AS ta, e1.b AS tb, e2.b AS tc
       |  FROM und e1
       |  JOIN und e2 ON e2.a = e1.b
       |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
       |), per_node AS (
       |  SELECT v, count(*) AS triangles FROM (
       |    SELECT ta AS v FROM tri UNION ALL
       |    SELECT tb AS v FROM tri UNION ALL
       |    SELECT tc AS v FROM tri
       |  ) GROUP BY 1
       |)
       |SELECT deg.v AS vec_id, deg.degree,
       |       coalesce(per_node.triangles, 0) AS triangles,
       |       CASE WHEN deg.degree >= 2
       |            THEN CAST(coalesce(per_node.triangles, 0) * 2 AS DOUBLE) /
       |                 CAST(deg.degree * (deg.degree - 1) AS DOUBLE)
       |       END AS clustering
       |FROM deg LEFT JOIN per_node ON per_node.v = deg.v""".stripMargin

  /** DuckDB twin of [[labelSpread]] — [[knnGraphSql]] as the edge CTE,
    * then the `rounds` synchronous updates unrolled (the
    * textrank_keywords pattern: fixed iteration count, chained CTEs). */
  def labelSpreadSql(k: Int = 3, rounds: Int = 3, seedMod: Int = 4,
                     nprobe: Int = 2, iters: Int = 2): String = {
    val roundCtes = (1 to rounds).map { i =>
      s"""v$i AS (
         |  SELECT g.query_id AS vec_id, l.label AS nlabel, count(*) AS c
         |  FROM g JOIN l${i - 1} l ON l.vec_id = g.neighbor_id
         |  WHERE l.label IS NOT NULL
         |  GROUP BY 1, 2
         |), t$i AS (
         |  SELECT vec_id, nlabel FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY c DESC, nlabel) AS rn
         |    FROM v$i
         |  ) WHERE rn = 1
         |), l$i AS (
         |  SELECT e.vec_id,
         |         CASE WHEN e.vec_id % $seedMod = 0 THEN CAST(e.label AS INT)
         |              ELSE t$i.nlabel END AS label
         |  FROM embeddings e LEFT JOIN t$i ON t$i.vec_id = e.vec_id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH g AS (
       |  SELECT query_id, neighbor_id FROM (
       |${knnGraphSql(k, nprobe, iters)}
       |  )
       |), l0 AS (
       |  SELECT vec_id,
       |         CASE WHEN vec_id % $seedMod = 0 THEN CAST(label AS INT)
       |         END AS label
       |  FROM embeddings
       |),
       |$roundCtes
       |SELECT e.vec_id,
       |       CASE WHEN e.vec_id % $seedMod = 0 THEN 1 ELSE 0 END AS seed,
       |       l$rounds.label
       |FROM embeddings e JOIN l$rounds ON l$rounds.vec_id = e.vec_id""".stripMargin
  }

  // ---- IVF index training (deterministic seeded k-means) -------------

  /** Builds the coarse IVF partition from scratch — the upstream step
    * [[annIvfTopK]] otherwise assumes precomputed: Lloyd's k-means,
    * fully deterministic. Seeds are the `nlists` vectors with the
    * smallest portable hash of vec_id (a TakeOrdered limit — no global
    * sort materializes); each iteration broadcasts the nlists×dim
    * centroid table, scores every vector with the exact decimal
    * squared-L2 fold, takes the (dist, list_id)-tie-broken argmin, and
    * recomputes element-wise means exactly (decimal sums / count, the
    * same parity recipe as the IVF centroid build). Every arithmetic
    * step is engine-portable, so the integer ASSIGNMENT hash-matches
    * the unrolled-CTE DuckDB twin ([[ivfTrainSql]]) bit-for-bit.
    *
    * Scale: per iteration O(n·nlists·dim) map-side work plus one
    * (list,pos)-keyed agg shuffle; the only broadcast is nlists×dim
    * doubles, and iters is a small constant — the classic Spark
    * k-means shape. */
  def ivfTrain(spark: SparkSession, d: String, nlists: Int = 8,
               iters: Int = 2): DataFrame =
    ivfTrainFull(spark, d, nlists, iters)._1

  /** [[ivfTrain]] plus the centroid table the final assignment was
    * scored against (c_{iters−1}) — the coarse codebook [[ivfPqTopK]]
    * computes residuals from.
    *
    * MEMOIZED per (session, dir, nlists, iters), the same hook as
    * TextOps' pair-relation memo: an IVF index is built once and
    * queried many times — ivf_train, ann_ivf_trained, ivf_pq_topk,
    * semantic_mix and knn_graph all start from this chain, and a
    * session should pay each distinct partition once. The cached
    * frames are a persisted n-row assignment + an nlists-row centroid
    * table; training is deterministic, so sharing cannot change any
    * result hash. At 100 TB the same role is played by a materialized
    * index relation the ingest pipeline maintains. */
  private[operators] def ivfTrainFull(spark: SparkSession, d: String,
                                      nlists: Int, iters: Int): (DataFrame, DataFrame) =
    trainCache.getOrBuild((spark, d, nlists, iters)) {
      val (assign, cent) = ivfTrainFullFrom(
        Tables.embeddings(spark, d).select(col("vec_id"), col("embedding")),
        nlists, iters)
      (assign.persist(), cent.persist())
    }

  private val trainCache = new graft.SessionMemo[
    (SparkSession, String, Int, Int), (DataFrame, DataFrame)]("ivf_train")

  /** Session-memoized PROBING centroids of the trained index —
    * (list_id, cemb, cnorm): exact element-wise means of the FINAL
    * assignment cells with exact norms, persisted once per (session,
    * dir, nlists, iters) and shared by [[knnGraph]] and
    * [[annIvfTopKTrained]] (consumers must NOT unpersist it). */
  private[operators] def probeCentroids(spark: SparkSession, d: String,
                                        nlists: Int, iters: Int): DataFrame =
    probeCentCache.getOrBuild((spark, d, nlists, iters)) {
      val assign = ivfTrainFull(spark, d, nlists, iters)._1
      Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
        .join(assign, "vec_id")
        .select(col("list_id"), posexplode(col("embedding")).as(Seq("pos", "fv")))
        .groupBy("list_id", "pos")
        .agg((sum(col("fv").cast("double").cast("decimal(38,30)")).cast("double") /
          count(lit(1))).as("cv"))
        .groupBy("list_id")
        .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), s -> s.cv)").as("cemb"))
        .withColumn("cnorm", sqrt(exactDot("cemb", "cemb")))
        .persist()
    }

  private val probeCentCache = new graft.SessionMemo[
    (SparkSession, String, Int, Int), DataFrame]("probe_centroids")

  /** The Lloyd chain over an ARBITRARY (vec_id, embedding) frame —
    * shared by the embeddings-table path and vector sources built from
    * other tables (TextOps.docTopics' hashed term vectors). */
  private[graft] def ivfTrainFullFrom(vectors: DataFrame,
                                          nlists: Int, iters: Int): (DataFrame, DataFrame) = {
    require(nlists >= 1 && iters >= 1, "nlists and iters must be >= 1")
    val e = vectors.select(col("vec_id"), col("embedding"))
    val seeds = e
      .withColumn("h", graft.functions.ColumnFunctions.hash64(col("vec_id"), 0))
      .orderBy(col("h"), col("vec_id")).limit(nlists)
    // the rank window runs over the already-limited nlists rows only
    val wSeed = Window.orderBy(col("h"), col("vec_id"))
    var cent = seeds
      .withColumn("list_id", (row_number().over(wSeed) - 1).cast("long"))
      .select(col("list_id"), col("embedding").cast("array<double>").as("cemb"))
    var assign: DataFrame = null
    for (it <- 1 to iters) {
      assign = coarseAssign(e, cent)
      if (it < iters)
        cent = e.join(assign, "vec_id")
          .select(col("list_id"), posexplode(col("embedding")).as(Seq("pos", "fv")))
          .groupBy("list_id", "pos")
          .agg((sum(col("fv").cast("double").cast("decimal(38,30)")).cast("double") /
            count(lit(1))).as("cv"))
          .groupBy("list_id")
          .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), s -> s.cv)").as("cemb"))
    }
    (assign, cent)
  }

  /** Exact nearest-centroid assignment of a (vec_id, embedding) frame
    * against a FIXED centroid table — the Lloyd loop's scoring step
    * ([[ivfTrainFullFrom]]) and the encoder [[appendIvfPq]] reuses for
    * ARRIVING vectors: two-phase argmin (codegen'd double-distance
    * prune within 1e-6 of the per-vector minimum, exact decimal fold
    * on survivors), (dist, list_id) tie-break. One shared body keeps
    * the assignment arithmetic identical whether a vector arrives at
    * train time or after publication. */
  private[operators] def coarseAssign(e: DataFrame, cent: DataFrame): DataFrame = {
    val wKey = Window.partitionBy(col("vec_id"))
    val scored = e.join(broadcast(cent))
      .withColumn("dd", doubleSqDist(col("embedding"), col("cemb")))
      .withColumn("mind", min(col("dd")).over(wKey))
      .filter(col("dd") <= col("mind") + 1e-6)
      .select(col("vec_id"), col("list_id"),
        exactSqDist("embedding", "cemb").as("dist"))
    val wa = wKey.orderBy(col("dist"), col("list_id"))
    scored.withColumn("rn", row_number().over(wa))
      .filter(col("rn") === 1).select(col("vec_id"), col("list_id"))
  }

  /** IVF top-k over a SELF-TRAINED index: [[ivfTrain]] assignments
    * replace the table's label column, then the identical search body
    * runs. The end-to-end ANN story with no precomputed partition. */
  def annIvfTopKTrained(spark: SparkSession, d: String, k: Int = 5,
                        nQueries: Int = 10, nprobe: Int = 2,
                        nlists: Int = 8, iters: Int = 2): DataFrame = {
    val base = Tables.embeddings(spark, d).drop("label")
      .join(ivfTrain(spark, d, nlists, iters).withColumnRenamed("list_id", "label"),
        "vec_id")
    ivfTopKImpl(base,
      Tables.embeddings(spark, d).filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding")), k, nprobe,
      centOpt = Some(probeCentroids(spark, d, nlists, iters)
        .withColumnRenamed("list_id", "label")))
  }

  /** [[annIvfTopKTrained]] served from a PERSISTED index — the full
    * production round-trip as one query: train (session-memoized) →
    * `IndexStore.saveIvf` (parquet artifact) → `IndexStore.loadIvf`
    * (validated) → probe. Results are identical to the fresh-train
    * path by construction (training is deterministic and the artifact
    * is lossless), so this query SHARES ann_ivf_trained's DuckDB
    * oracle — the gate proves the artifact round-trip loses nothing.
    *
    * The artifact lands under java.io.tmpdir keyed by (dir, nlists,
    * iters): this query's job is exercising the save/load path, so it
    * pays the write every run; a real pipeline calls saveIvf once in
    * ingest and loadIvf in serving jobs. */
  def annIvfTopKPersisted(spark: SparkSession, d: String, k: Int = 5,
                          nQueries: Int = 10, nprobe: Int = 2,
                          nlists: Int = 8, iters: Int = 2): DataFrame = {
    val path = graft.sources.IndexStore.artifactPath("ivf", s"$d|$nlists|$iters")
    buildAnnIvf(spark, d, path, nlists, iters)
    annIvfTopKAt(spark, d, path, k, nQueries, nprobe)
  }

  /** Train the uncompressed IVF index and publish it at `path` — the
    * ingest half of the load-only serving split (VERDICT r13 #3). */
  def buildAnnIvf(spark: SparkSession, d: String, path: String,
                  nlists: Int = 8, iters: Int = 2): Unit =
    graft.sources.IndexStore.saveIvf(spark, ivfTrain(spark, d, nlists, iters),
      probeCentroids(spark, d, nlists, iters), path, nlists, iters)

  /** LOAD-ONLY IVF serving from an explicit index path: the loaded
    * assignment labels the corpus, the loaded centroids probe — never
    * trains, fails fast on an absent/torn artifact. */
  def annIvfTopKAt(spark: SparkSession, d: String, path: String,
                   k: Int = 5, nQueries: Int = 10,
                   nprobe: Int = 2): DataFrame = {
    val (assign, cents) = graft.sources.IndexStore.loadIvf(spark, path)
    val base = Tables.embeddings(spark, d).drop("label")
      .join(assign.withColumnRenamed("list_id", "label"), "vec_id")
    ivfTopKImpl(base,
      Tables.embeddings(spark, d).filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding")), k, nprobe,
      centOpt = Some(cents.withColumnRenamed("list_id", "label")))
  }

  /** Semantic-diversity mix report — the data-mixing view of embedding
    * space: every vector is assigned to its [[ivfTrain]]ed cell, and
    * each (cell, label) pair reports its size, the cell total, and its
    * share of the cell. Answers "which semantic regions are dominated
    * by one source, and which are underrepresented?" — the
    * embedding-space complement of [[graft.operators.Corpus]]'s
    * source_mix_report, driven by content geometry instead of
    * provenance metadata.
    *
    * Scale: the k-means assignment is the audited [[ivfTrain]] plan;
    * on top of it sit two map-side-combined aggregations (cell totals
    * derive from the (cell, label) counts, not a second pass over the
    * vectors) and a cell-keyed join of two nlists-sized slivers. The
    * share is one long/long double division — engine-identical. */
  def semanticMix(spark: SparkSession, d: String, nlists: Int = 8,
                  iters: Int = 2): DataFrame = {
    val lab = Tables.embeddings(spark, d).select(col("vec_id"), col("label"))
      .join(ivfTrain(spark, d, nlists, iters), "vec_id")
    val byLabel = lab.groupBy("list_id", "label")
      .agg(count(lit(1)).as("n_vecs"))
    val cells = byLabel.groupBy("list_id").agg(sum(col("n_vecs")).as("cell_total"))
    byLabel.join(cells, Seq("list_id"))
      .withColumn("share",
        col("n_vecs").cast("double") / col("cell_total").cast("double"))
  }

  /** DuckDB twin of [[semanticMix]]: [[ivfTrainSql]] nested as the
    * assignment CTE, then the same two aggregations + join. */
  def semanticMixSql(nlists: Int = 8, iters: Int = 2): String =
    s"""WITH assign AS (
       |${ivfTrainSql(nlists, iters)}
       |), lab AS (
       |  SELECT a.list_id, e.label FROM assign a JOIN embeddings e USING (vec_id)
       |), byl AS (
       |  SELECT list_id, label, count(*) AS n_vecs FROM lab GROUP BY 1, 2
       |), cells AS (
       |  SELECT list_id, CAST(sum(n_vecs) AS BIGINT) AS cell_total
       |  FROM byl GROUP BY 1
       |)
       |SELECT list_id, label, n_vecs, cell_total,
       |       CAST(n_vecs AS DOUBLE) / CAST(cell_total AS DOUBLE) AS share
       |FROM byl JOIN cells USING (list_id)""".stripMargin

  /** DuckDB twin of [[ivfTrain]]: the Lloyd loop unrolled into CTE
    * layers (d$i = exact distances, a$i = argmin assignment, c$i =
    * exact-mean centroids). VARCHAR-routed casts mirror Spark's
    * shortest-repr double→decimal semantics (class doc). */
  def ivfTrainSql(nlists: Int = 8, iters: Int = 2): String =
    s"WITH ${ivfChainSql(nlists, iters, "")}\nSELECT vec_id, list_id FROM a$iters"

  /** CTE list (no WITH, no final SELECT) of the [[ivfTrain]] Lloyd
    * chain, every CTE name prefixed with `pre` so the chain can
    * coexist with the PQ chain inside one query (the ivf-pq oracle).
    * Exposes ${pre}e (positions), ${pre}a$iters (the assignment) and
    * ${pre}c${iters−1} (the centroids it was scored against). */
  private def ivfChainSql(nlists: Int, iters: Int, pre: String): String =
    ivfChainSqlFrom(nlists, iters, pre,
      s"""SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
         |  FROM (SELECT vec_id, unnest(range(1, len(embedding)+1)) AS i, embedding
         |        FROM embeddings)""".stripMargin)

  /** [[ivfChainSql]] over an ARBITRARY positions relation: `eBody` is a
    * SELECT producing (vec_id, pos, v) — the DuckDB twin of
    * [[ivfTrainFullFrom]]'s source parameterization. Seeds derive from
    * the distinct vec_ids OF THAT relation (identical to the
    * embeddings-table form for non-empty vectors). */
  private[operators] def ivfChainSqlFrom(nlists: Int, iters: Int, pre: String,
                                         eBody: String): String = {
    val P = graft.functions.ColumnFunctions.HashPrime
    val header =
      s"""${pre}e AS (
         |  $eBody
         |), ${pre}seeds AS (
         |  SELECT vec_id, row_number() OVER (ORDER BY h, vec_id) - 1 AS list_id
         |  FROM (SELECT vec_id,
         |          (md5_number_lower('0:' || vec_id) % ${P}::UBIGINT)::BIGINT AS h
         |        FROM (SELECT DISTINCT vec_id FROM ${pre}e)
         |        ORDER BY h, vec_id LIMIT $nlists)
         |), ${pre}c0 AS (
         |  SELECT s.list_id, e.pos, e.v AS cv
         |  FROM ${pre}seeds s JOIN ${pre}e e USING (vec_id)
         |)""".stripMargin
    header + ivfChainSteps(iters, pre)
  }

  /** [[ivfChainSqlFrom]] with nlists supplied as a SQL scalar
    * EXPRESSION (e.g. a subquery over a data-derived CTE) instead of a
    * compile-time constant — the seed cut becomes a rank filter over
    * the same (h, vec_id) total order, which is equivalent to the
    * LIMIT form for any constant value. Lets oracles scale nlists with
    * the corpus (knn_graph's ⌈√n⌉ rule) while staying one static SQL
    * string. */
  private[operators] def ivfChainSqlFromDynamic(nlistsExpr: String, iters: Int,
                                                pre: String, eBody: String): String = {
    val P = graft.functions.ColumnFunctions.HashPrime
    val header =
      s"""${pre}e AS (
         |  $eBody
         |), ${pre}seeds AS (
         |  SELECT vec_id, rn - 1 AS list_id FROM (
         |    SELECT vec_id, row_number() OVER (ORDER BY h, vec_id) AS rn
         |    FROM (SELECT vec_id,
         |            (md5_number_lower('0:' || vec_id) % ${P}::UBIGINT)::BIGINT AS h
         |          FROM (SELECT DISTINCT vec_id FROM ${pre}e))
         |  ) WHERE rn <= $nlistsExpr
         |), ${pre}c0 AS (
         |  SELECT s.list_id, e.pos, e.v AS cv
         |  FROM ${pre}seeds s JOIN ${pre}e e USING (vec_id)
         |)""".stripMargin
    header + ivfChainSteps(iters, pre)
  }

  /** The unrolled Lloyd iteration CTEs (d$i distances, a$i argmin
    * assignment, c$i recomputed means) shared by both seed-header
    * forms above. */
  private def ivfChainSteps(iters: Int, pre: String): String = {
    (1 to iters).map { i =>
      val dist =
        s""", ${pre}d$i AS (
           |  SELECT e.vec_id, c.list_id,
           |    CAST(CAST(sum(CAST(CAST((e.v - c.cv) * (e.v - c.cv) AS VARCHAR)
           |      AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS dist
           |  FROM ${pre}e e JOIN ${pre}c${i - 1} c ON e.pos = c.pos GROUP BY 1, 2
           |), ${pre}a$i AS (
           |  SELECT vec_id, list_id FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |                                 ORDER BY dist, list_id) AS rn FROM ${pre}d$i
           |  ) WHERE rn = 1
           |)""".stripMargin
      val recompute = if (i < iters)
        s""", ${pre}c$i AS (
           |  SELECT a.list_id, e.pos,
           |    CAST(CAST(sum(CAST(CAST(e.v AS VARCHAR) AS DECIMAL(38,30)))
           |      AS VARCHAR) AS DOUBLE) / count(*) AS cv
           |  FROM ${pre}e e JOIN ${pre}a$i a USING (vec_id) GROUP BY 1, 2
           |)""".stripMargin
      else ""
      dist + recompute
    }.mkString
  }

  // ---- product quantization (PQ codebooks + ADC search) ---------------

  /** Per-vector subvectors: dim split into `nSub` contiguous blocks of
    * dim/nSub — one row per (vec_id, sub_id), the relation every PQ
    * stage shares. */
  private def subvectors(base: DataFrame, nSub: Int, dim: Int): DataFrame = {
    val subDim = dim / nSub
    val subs = (0 until nSub).map { j =>
      struct(lit(j.toLong).as("sub_id"),
        slice(col("embedding").cast("array<double>"), j * subDim + 1, subDim).as("sv"))
    }
    base.select(col("vec_id"), explode(array(subs: _*)).as("s"))
      .select(col("vec_id"), col("s.sub_id").as("sub_id"), col("s.sv").as("sv"))
  }

  /** PQ codebooks via the same deterministic Lloyd recipe as
    * [[ivfTrain]], run independently per subspace in ONE set of jobs
    * (every aggregate and argmin just adds sub_id to its key): dim is
    * cut into `nSub` blocks, each block gets `nCodes` centroids, and a
    * vector's code word is the per-block argmin. Returns the codebook
    * (sub_id, code, cemb) — nSub·nCodes rows, broadcast-sized by
    * construction. Seeds are the `nCodes` lowest-hash vectors' own
    * subvectors, so codebooks across subspaces share one seed scan. */
  private[graft] def pqCodebook(base: DataFrame, nSub: Int, nCodes: Int,
                                iters: Int, dim: Int): DataFrame = {
    val sv = subvectors(base, nSub, dim)
    val seedIds = base
      .withColumn("h", graft.functions.ColumnFunctions.hash64(col("vec_id"), 0))
      .orderBy(col("h"), col("vec_id")).limit(nCodes)
    val wSeed = Window.orderBy(col("h"), col("vec_id"))
    val seeds = seedIds.withColumn("code", (row_number().over(wSeed) - 1).cast("long"))
      .select(col("vec_id"), col("code"))
    var cent = sv.join(seeds, "vec_id")
      .select(col("sub_id"), col("code"), col("sv").as("cemb"))
    for (it <- 1 to iters) {
      val assign = pqAssign(sv, cent)
      if (it < iters)
        cent = sv.join(assign, Seq("vec_id", "sub_id"))
          .select(col("sub_id"), col("code"), posexplode(col("sv")).as(Seq("pos", "fv")))
          .groupBy("sub_id", "code", "pos")
          .agg((sum(col("fv").cast("decimal(38,30)")).cast("double") /
            count(lit(1))).as("cv"))
          .groupBy("sub_id", "code")
          .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), s -> s.cv)").as("cemb"))
    }
    cent
  }

  /** All-double squared-L2 — the codegen'd prerank twin of
    * [[exactSqDist]] (fold order element-order; |double − exact| ≲
    * 1e-12 at these magnitudes, dwarfed by the 1e-6 prune margin). */
  private def doubleSqDist(a: Column, b: Column): Column =
    graft.plans.GraftFunctions.sqDistF64(a, b)

  /** Nearest code word per (vec_id, sub_id) — exact decimal squared-L2
    * argmin, (dist, code) tie-break. Two-phase (same identity argument
    * as [[annCosineTopK]]'s prerank): the cheap all-double distance
    * prunes to candidates within 1e-6 of the per-key double minimum —
    * the true exact argmin always survives (its double distance sits
    * within ~1e-12 of its exact one) — and only survivors (≈1 per key
    * off tie points) pay the decimal fold. The min-window and the
    * argmin window share (vec_id, sub_id) partitioning, so the prune
    * adds no exchange. */
  private def pqAssign(sv: DataFrame, cent: DataFrame): DataFrame = {
    val wKey = Window.partitionBy(col("vec_id"), col("sub_id"))
    val pruned = sv.join(broadcast(cent), "sub_id")
      .withColumn("dd", doubleSqDist(col("sv"), col("cemb")))
      .withColumn("mind", min(col("dd")).over(wKey))
      .filter(col("dd") <= col("mind") + 1e-6)
    val scored = pruned.select(col("vec_id"), col("sub_id"), col("code"),
      exactSqDist("sv", "cemb").as("dist"))
    val w = wKey.orderBy(col("dist"), col("code"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("sub_id"), col("code"))
  }

  /** PQ encode: each vector compressed to nSub code words — at 100 TB
    * this is the memory story (64 floats → nSub bytes per vector, a
    * 32× shrink at the defaults), the precondition for RAM-resident
    * ANN over corpora whose raw vectors don't fit. Output is one
    * integer row per (vec_id, sub_id); the codebook is trained inline
    * (deterministic, so encode is replayable end to end). */
  def pqEncode(spark: SparkSession, d: String, nSub: Int = 8, nCodes: Int = 16,
               iters: Int = 2, dim: Int = 64): DataFrame =
    pqCodesCache.getOrBuild((spark, d, nSub, nCodes, iters, dim)) {
      require(dim % nSub == 0, s"dim $dim must divide into $nSub subspaces")
      val base = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
      val cent = pqRawCodebook(spark, d, nSub, nCodes, iters, dim)
      pqAssign(subvectors(base, nSub, dim), cent).persist()
    }

  /** Session memos of the RAW-vector PQ artifacts (the trained-index-
    * memo hook): pq_encode, pq_adc_topk and pq_distortion all start
    * from the identical embeddings-table codebook (nSub·nCodes rows)
    * and code relation (n·nSub integers) — both SMALLER than their
    * input, both deterministic, so a session pays the Lloyd chain
    * once and no result hash can change. ivf_pq_topk's RESIDUAL
    * codebook is a different relation and keeps its own build. */
  private def pqRawCodebook(spark: SparkSession, d: String, nSub: Int,
                            nCodes: Int, iters: Int, dim: Int): DataFrame =
    pqCbCache.getOrBuild((spark, d, nSub, nCodes, iters, dim)) {
      val base = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
      pqCodebook(base, nSub, nCodes, iters, dim).persist()
    }

  private val pqCbCache = new graft.SessionMemo[
    (SparkSession, String, Int, Int, Int, Int), DataFrame]("pq_codebook")
  private val pqCodesCache = new graft.SessionMemo[
    (SparkSession, String, Int, Int, Int, Int), DataFrame]("pq_codes")

  // ---- covariance-driven (OPQ-style) rotated PQ ----------------------

  /** Deterministic cyclic Jacobi eigendecomposition of a symmetric
    * matrix (Golub & Van Loan §8.5 — public classic): fixed sweep
    * order, sqrt-based rotation formulas (every op IEEE correctly
    * rounded), so the eigenbasis is reproducible bit-for-bit from the
    * same input. 64×64 at 12 sweeps is ~24k rotations — microseconds,
    * driver-side. Returns (eigenvalues, V with eigenvectors as
    * COLUMNS). */
  private[operators] def jacobiEigen(a0: Array[Array[Double]], sweeps: Int = 12)
      : (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 1 to sweeps; p <- 0 until n - 1; q <- p + 1 until n) {
      val apq = a(p)(q)
      if (math.abs(apq) > 1e-300) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
        val t = (if (theta >= 0) 1.0 else -1.0) /
          (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        var k = 0
        while (k < n) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - s * akq; a(k)(q) = s * akp + c * akq
          k += 1
        }
        k = 0
        while (k < n) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - s * aqk; a(q)(k) = s * apk + c * aqk
          k += 1
        }
        k = 0
        while (k < n) {
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - s * vkq; v(k)(q) = s * vkp + c * vkq
          k += 1
        }
      }
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** The covariance-derived PQ rotation (VERDICT r11 #4 — this is
    * what CONSUMES [[embeddingCovariance]]): eigendecompose the
    * covariance the query emits, then allocate eigen-directions to
    * subspaces by GREEDY VARIANCE BALANCE (descending eigenvalue to
    * the least-loaded open subspace — the parametric eigenvalue-
    * allocation move of Ge et al., "Optimized Product Quantization",
    * CVPR 2013, balancing variance instead of log-variance because
    * k-means distortion tracks a subspace's variance SUM). The result
    * is an ORTHONORMAL matrix (a permuted eigenbasis): distances are
    * preserved exactly, each subspace sees decorrelated, variance-
    * balanced coordinates, and the measured codebook distortion drops
    * ~5% on the synthetic corpus (PLANS.md) — on a PCA-shaped real
    * embedding space the gap is the whole point of OPQ. Returns
    * (R with R(j)(k) = component j of the k-th allocated direction,
    * max |RᵀR − I| as the orthonormality witness). */
  /** Session memo of the rotation derivation: the covariance query is
    * an exact-decimal scan of the whole base (the single most expensive
    * input of the rotated family — VERDICT r13 #1's remaining cost once
    * the rotation APPLY went codegen), and the matrix is deterministic,
    * so a session derives it once; [[whitenedBase]], [[pqRotationFor]],
    * and every `_persisted` round-trip share this entry. */
  private val rotationCache = new graft.SessionMemo[
    (SparkSession, String, Int, Int),
    (Array[Array[Double]], Double)]("pq_rotation")

  private[operators] def pqWhitenRotation(spark: SparkSession, d: String,
                                          nSub: Int, dim: Int)
      : (Array[Array[Double]], Double) =
    rotationCache.getOrBuild((spark, d, nSub, dim)) {
      pqWhitenRotationUncached(spark, d, nSub, dim)
    }

  private def pqWhitenRotationUncached(spark: SparkSession, d: String,
                                       nSub: Int, dim: Int)
      : (Array[Array[Double]], Double) = {
    val cov = Array.ofDim[Double](dim, dim)
    embeddingCovariance(spark, d).collect().foreach { r =>
      val (i, j, c) = (r.getAs[Long]("di").toInt, r.getAs[Long]("dj").toInt,
        r.getAs[Double]("cov"))
      cov(i)(j) = c; cov(j)(i) = c
    }
    val (w, v) = jacobiEigen(cov)
    val order = (0 until dim).sortBy(i => (-w(i), i))
    val subDim = dim / nSub
    val alloc = Array.fill(nSub)(List.empty[Int])
    val loads = new Array[Double](nSub)
    order.foreach { i =>
      val open = (0 until nSub).filter(alloc(_).length < subDim)
      val j = open.minBy(jj => (loads(jj), jj))
      alloc(j) = alloc(j) :+ i
      loads(j) += w(i)
    }
    val slots = alloc.toSeq.flatten
    val r = Array.tabulate(dim, dim)((j, k) => v(j)(slots(k)))
    var err = 0.0
    var a = 0
    while (a < dim) {
      var b = 0
      while (b < dim) {
        var dot = 0.0
        var j = 0
        while (j < dim) { dot += r(j)(a) * r(j)(b); j += 1 }
        err = math.max(err, math.abs(dot - (if (a == b) 1.0 else 0.0)))
        b += 1
      }
      a += 1
    }
    (r, err)
  }

  /** Rotate an embedding frame by R via the codegen'd
    * [[graft.plans.MatVecF64]] kernel (the matrix rides as ONE
    * broadcast row, never a plan literal). Each output coordinate is a
    * DOUBLE fold of the per-term IEEE products in ascending-j order —
    * a pinned fold order is just as engine-portable as the round-13
    * exact-decimal fold (every add/mul is correctly rounded, so two
    * engines folding the same terms in the same order agree bit for
    * bit), and the DuckDB oracle replays exactly that order with
    * `list_reduce` ([[ivfPqRotatedTopKSql]]'s `rote` CTE). VERDICT r13
    * #1: the decimal HOF form this replaces ran ~16M interpreted boxed
    * decimal ops over the sf0.1 base — 6.3× the plain bundle's whole
    * train chain; this is one fused loop inside whole-stage codegen. */
  private def rotateEmbeddings(spark: SparkSession, base: DataFrame,
                               r: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    val rotDf = Seq(Tuple1(r.map(_.toSeq).toSeq)).toDF("rot")
    base.crossJoin(broadcast(rotDf))
      .select(col("vec_id"),
        graft.plans.GraftFunctions.matVecF64(col("embedding"), col("rot"))
          .as("embedding"))
  }

  /** The covariance rotation of a scale dir as a plain matrix — the
    * public face [[graft.SparkEntry]]'s data-dependent oracle and the
    * persisted-bundle round-trip use (R(j)(i) = component j of
    * allocated direction i; deterministic given the corpus). */
  def pqRotationFor(spark: SparkSession, d: String, nSub: Int = 8,
                    dim: Int = 64): Array[Array[Double]] =
    pqWhitenRotation(spark, d, nSub, dim)._1

  /** Per-subspace distortion of a PQ codebook trained on an ARBITRARY
    * (vec_id, embedding) frame — [[pqDistortion]]'s core over any
    * base, shared by the plain and rotated sides of the comparison. */
  private def pqDistortionFrom(base: DataFrame, nSub: Int, nCodes: Int,
                               iters: Int, dim: Int): DataFrame = {
    val cent = pqCodebook(base, nSub, nCodes, iters, dim)
    val sv = subvectors(base, nSub, dim)
    val codes = pqAssign(sv, cent)
    sv.join(codes, Seq("vec_id", "sub_id"))
      .join(broadcast(cent), Seq("sub_id", "code"))
      .select(col("sub_id"), exactSqDist("sv", "cemb").as("se"))
      .groupBy("sub_id")
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("se").cast("decimal(38,30)")).cast("double").as("total_sqerr"))
      .select(col("sub_id"), col("n_vectors"), col("total_sqerr"),
        (col("total_sqerr") / col("n_vectors")).as("mse"))
  }

  /** Whitened-vs-plain PQ comparison (VERDICT r11 #4) — the query
    * that turns the covariance TELEMETRY into a measured CAPABILITY.
    * One row per subspace: the PLAIN codebook's exact-decimal
    * distortion (hash-matched by the DuckDB oracle — the same chain
    * as pq_distortion) plus three pinned facts about the
    * covariance-rotated codebook, computed engine-side on the same
    * seeds over the SAME vectors:
    *
    *  - `rot_orthonormal`: max |RᵀR − I| ≤ 1e-9 — the rotation is a
    *    true isometry (distances preserved, so a rotated index
    *    answers the ORIGINAL metric exactly);
    *  - `rot_not_worse`: rotated per-subspace MSE ≤ 1.15 × plain —
    *    no subspace degrades materially;
    *  - `rot_total_ok`: rotated TOTAL distortion ≤ 1.02 × plain —
    *    measured ~0.94 on this corpus (PLANS.md), i.e. the rotation
    *    actually HELPS ~5% even on a near-isotropic synthetic space.
    *
    * The oracle pins the booleans as literal TRUE, so a rotation that
    * stops earning its keep is a HASH FAILURE (the theta_calibration
    * contract shape). The recall floor vs plain IVF/ADC is pinned in
    * SimilaritySpec on the same probes. */
  /** Session memo of the rotated side's distortion relation (8 rows):
    * the rotation + rotated Lloyd chain is deterministic, and a bench
    * pass should pay it once — the pqRawCodebook memo pattern. */
  private val whitenCache = new graft.SessionMemo[
    (SparkSession, String, Int, Int, Int, Int),
    (DataFrame, Double)]("pq_whiten")

  /** Session memo of the covariance-ROTATED embedding base (persisted)
    * + the rotation's orthonormality witness — shared by the compare
    * query and the rotated-ADC/rotated-IVFADC serving faces (ADVICE
    * r12: the serving face used to persist its own rotated copy per
    * call and never unpersist it). Eviction unpersists via the memo's
    * standard hook. */
  private val whitenBaseCache = new graft.SessionMemo[
    (SparkSession, String, Int, Int), (DataFrame, Double)]("pq_whiten_base")

  private[operators] def whitenedBase(spark: SparkSession, d: String,
                                      nSub: Int, dim: Int): (DataFrame, Double) =
    whitenBaseCache.getOrBuild((spark, d, nSub, dim)) {
      val (r, err) = pqWhitenRotation(spark, d, nSub, dim)
      val base = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
      (rotateEmbeddings(spark, base, r).persist(), err)
    }

  def pqWhitenCompare(spark: SparkSession, d: String, nSub: Int = 8,
                      nCodes: Int = 16, iters: Int = 2,
                      dim: Int = 64): DataFrame = {
    require(dim % nSub == 0, s"dim $dim must divide into $nSub subspaces")
    val (rotDist, orthoErr) = whitenCache.getOrBuild(
      (spark, d, nSub, nCodes, iters, dim)) {
        val (rb, err) = whitenedBase(spark, d, nSub, dim)
        (pqDistortionFrom(rb, nSub, nCodes, iters, dim).persist(), err)
      }
    val plain = pqDistortion(spark, d, nSub, nCodes, iters, dim)
    val rot = rotDist
      .select(col("sub_id"), col("mse").as("mse_rot"),
        col("total_sqerr").as("ts_rot"))
    val totals = rot.agg(sum(col("ts_rot")).as("rot_total"))
      .crossJoin(plain.agg(sum(col("total_sqerr")).as("plain_total")))
    plain.join(rot, "sub_id")
      .crossJoin(broadcast(totals))
      .select(col("sub_id"), col("n_vectors"), col("total_sqerr"), col("mse"),
        lit(orthoErr <= 1e-9).as("rot_orthonormal"),
        (col("mse_rot") <= col("mse") * lit(1.15)).as("rot_not_worse"),
        (col("rot_total") <= col("plain_total") * lit(1.02)).as("rot_total_ok"))
  }

  /** DuckDB twin of [[pqWhitenCompare]]: the plain distortion chain
    * (exact), booleans as the pinned literal facts. */
  def pqWhitenCompareSql(nSub: Int = 8, nCodes: Int = 16, iters: Int = 2,
                         dim: Int = 64): String =
    s"""SELECT sub_id, n_vectors, total_sqerr, mse,
       |       TRUE AS rot_orthonormal, TRUE AS rot_not_worse,
       |       TRUE AS rot_total_ok
       |FROM (${pqDistortionSql(nSub, nCodes, iters, dim)})""".stripMargin

  /** [[pqAdcTopK]] over an arbitrary (vec_id, embedding) frame — the
    * plain and rotated ADC share this core so the recall comparison
    * trains/seeds/scans identically on both sides. */
  private def pqAdcTopKFrom(base: DataFrame, k: Int, nQueries: Int,
                            nSub: Int, nCodes: Int, iters: Int,
                            dim: Int): DataFrame = {
    val cent = pqCodebook(base, nSub, nCodes, iters, dim)
    val codes = pqAssign(subvectors(base, nSub, dim), cent)
    val qsv = subvectors(base.filter(col("vec_id") < nQueries), nSub, dim)
      .withColumnRenamed("vec_id", "query_id").withColumnRenamed("sv", "qsv")
    val lut = qsv.join(broadcast(cent), "sub_id")
      .select(col("query_id"), col("sub_id"), col("code"),
        exactSqDist("qsv", "cemb").as("ld"))
    val approx = codes.join(broadcast(lut), Seq("sub_id", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("ld").cast("decimal(38,30)")).cast("double").as("adist"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adist"), col("neighbor_id"))
    approx.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** PQ-ADC top-k in the COVARIANCE-ROTATED basis — the serving face
    * of [[pqWhitenCompare]]'s rotation: base and queries rotate by the
    * same orthonormal R (an isometry, so the ranking targets the
    * ORIGINAL metric), codebooks train on the rotated frame with the
    * same seeds. SimilaritySpec pins its recall@k against exact ground
    * truth to a floor of the plain ADC's recall on the same probes. */
  def pqWhitenAdcTopK(spark: SparkSession, d: String, k: Int = 5,
                      nQueries: Int = 10, nSub: Int = 8, nCodes: Int = 16,
                      iters: Int = 2, dim: Int = 64): DataFrame = {
    require(dim % nSub == 0, s"dim $dim must divide into $nSub subspaces")
    pqAdcTopKFrom(whitenedBase(spark, d, nSub, dim)._1,
      k, nQueries, nSub, nCodes, iters, dim)
  }

  /** Scalar int8 quantization — the training-free third member of the
    * compression family (IVF partitions, PQ codes, SQ8 scalars; the
    * public FAISS ScalarQuantizer / vector-DB int8 shape): each vector
    * is rescaled by its own max-|x| and every dimension rounds to a
    * signed byte, code = ⌊x·127/scale + ½⌋ ∈ [−127, 127] — a 4× shrink
    * with reconstruction error ≤ scale/254 per dimension, no codebook
    * to train or broadcast.
    *
    * Exactness: scale is max(|x|) — an order-insensitive exact
    * aggregate over the float→double-cast elements — and the code
    * expression is one fixed-shape double chain (·127 / scale + 0.5,
    * floor) evaluated identically by both engines, so the oracle
    * hash-matches bit-for-bit (round-half-up via ⌊·+½⌋, NOT round():
    * engines disagree on banker's-vs-away rounding, floor they agree
    * on). Zero vectors emit code 0 with scale 0.
    *
    * Scale: a pure per-row projection — scale and codes both come
    * from array HOFs on the vector column, so the plan is one codegen
    * scan + posexplode with ZERO shuffle (pinned in PlanAuditSpec):
    * at 100 TB this runs at scan speed, the point of SQ8. */
  def sq8Encode(spark: SparkSession, d: String): DataFrame =
    Tables.embeddings(spark, d)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .withColumn("scale", expr("array_max(transform(emb, x -> abs(x)))"))
      .select(col("vec_id"), col("scale"),
        posexplode(col("emb")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("pos").cast("long").as("pos"),
        when(col("scale") > 0,
          floor(col("v") * lit(127.0) / col("scale") + lit(0.5)).cast("int"))
          .otherwise(lit(0)).as("code"),
        col("scale"))

  def sq8EncodeSql(): String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      |  FROM embeddings
      |), s AS (
      |  SELECT vec_id, emb,
      |         list_max(list_transform(emb, x -> abs(x))) AS scale
      |  FROM e
      |), p AS (
      |  SELECT vec_id, scale, emb,
      |         unnest(range(1, len(emb)+1)) AS i
      |  FROM s
      |)
      |SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
      |       CASE WHEN scale > 0
      |            THEN CAST(floor(emb[i] * 127.0 / scale + 0.5) AS INT)
      |            ELSE 0 END AS code,
      |       scale
      |FROM p""".stripMargin

  /** PQ-ADC approximate top-k: queries score against the CODEBOOK once
    * (a per-query lookup table of nSub·nCodes exact subdistances), and
    * a vector's approximate distance is the sum of the nSub LUT
    * entries its codes select — the scan never touches raw candidate
    * vectors, only their integer codes. The classic asymmetric
    * distance computation: broadcast LUT, one (query,vec)-keyed sum,
    * per-query top-k window. */
  def pqAdcTopK(spark: SparkSession, d: String, k: Int = 5, nQueries: Int = 10,
                nSub: Int = 8, nCodes: Int = 16, iters: Int = 2,
                dim: Int = 64): DataFrame = {
    require(dim % nSub == 0, s"dim $dim must divide into $nSub subspaces")
    val base = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val cent = pqRawCodebook(spark, d, nSub, nCodes, iters, dim)
    val codes = pqEncode(spark, d, nSub, nCodes, iters, dim)
    val qsv = subvectors(base.filter(col("vec_id") < nQueries), nSub, dim)
      .withColumnRenamed("vec_id", "query_id").withColumnRenamed("sv", "qsv")
    val lut = qsv.join(broadcast(cent), "sub_id")
      .select(col("query_id"), col("sub_id"), col("code"),
        exactSqDist("qsv", "cemb").as("ld"))
    val approx = codes.join(broadcast(lut), Seq("sub_id", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("ld").cast("decimal(38,30)")).cast("double").as("adist"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adist"), col("neighbor_id"))
    approx.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** DuckDB twin of [[pqEncode]]: the per-subspace Lloyd loop unrolled
    * — identical CTE structure to [[ivfTrainSql]] with sub_id added to
    * every key (pos // subDim names the subspace, pos % subDim the
    * position inside it). */
  def pqEncodeSql(nSub: Int = 8, nCodes: Int = 16, iters: Int = 2,
                  dim: Int = 64): String =
    s"${pqSqlChain(nSub, nCodes, iters, dim)}\nSELECT vec_id, sub_id, code FROM a$iters"

  /** DuckDB twin of [[pqAdcTopK]]: the [[pqEncodeSql]] chain extended
    * with the per-query LUT and the code-indexed distance sum. */
  def pqAdcTopKSql(k: Int = 5, nQueries: Int = 10, nSub: Int = 8,
                   nCodes: Int = 16, iters: Int = 2, dim: Int = 64): String =
    s"""${pqSqlChain(nSub, nCodes, iters, dim)}, lut AS (
       |  SELECT q.vec_id AS query_id, c.sub_id, c.code,
       |    CAST(CAST(sum(CAST(CAST((q.v - c.cv) * (q.v - c.cv) AS VARCHAR)
       |      AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS ld
       |  FROM e q JOIN c${iters - 1} c ON q.sub_id = c.sub_id AND q.spos = c.spos
       |  WHERE q.vec_id < $nQueries
       |  GROUP BY 1, 2, 3
       |), adc AS (
       |  SELECT l.query_id, a.vec_id AS neighbor_id,
       |    CAST(CAST(sum(CAST(CAST(l.ld AS VARCHAR) AS DECIMAL(38,30)))
       |      AS VARCHAR) AS DOUBLE) AS adist
       |  FROM a$iters a JOIN lut l ON a.sub_id = l.sub_id AND a.code = l.code
       |  WHERE a.vec_id <> l.query_id
       |  GROUP BY 1, 2
       |)
       |SELECT query_id, neighbor_id, adist, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY adist, neighbor_id) AS rank
       |  FROM adc
       |) WHERE rank <= $k""".stripMargin

  /** Per-subspace quantization distortion of the PQ codebook — the
    * index-quality telemetry every PQ deployment watches (a subspace
    * whose MSE dwarfs the others needs more codes or an OPQ rotation;
    * rising distortion on fresh data means the codebook no longer fits
    * the distribution and needs retraining). One row per subspace:
    * (sub_id, n_vectors, total_sqerr, mse), exact decimal sums.
    *
    * Scale: rides the [[pqCodebook]]/[[pqAssign]] chain (broadcast
    * codebook, per-row argmin), then ONE nSub-group map-side-combined
    * aggregate — the fixed-universe-group shape of
    * embedding_dim_stats; no join beyond the broadcast. */
  def pqDistortion(spark: SparkSession, d: String, nSub: Int = 8,
                   nCodes: Int = 16, iters: Int = 2, dim: Int = 64): DataFrame = {
    require(dim % nSub == 0, s"dim $dim must divide into $nSub subspaces")
    val base = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val cent = pqRawCodebook(spark, d, nSub, nCodes, iters, dim)
    val sv = subvectors(base, nSub, dim)
    val codes = pqEncode(spark, d, nSub, nCodes, iters, dim)
    sv.join(codes, Seq("vec_id", "sub_id"))
      .join(broadcast(cent), Seq("sub_id", "code"))
      .select(col("sub_id"), exactSqDist("sv", "cemb").as("se"))
      .groupBy("sub_id")
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("se").cast("decimal(38,30)")).cast("double").as("total_sqerr"))
      .select(col("sub_id"), col("n_vectors"), col("total_sqerr"),
        (col("total_sqerr") / col("n_vectors")).as("mse"))
  }

  /** DuckDB twin of [[pqDistortion]]: the [[pqEncodeSql]] chain plus
    * the per-(vec, sub) exact squared error and the nSub-group fold. */
  def pqDistortionSql(nSub: Int = 8, nCodes: Int = 16, iters: Int = 2,
                      dim: Int = 64): String =
    s"""${pqSqlChain(nSub, nCodes, iters, dim)}, se AS (
       |  SELECT e.vec_id, e.sub_id,
       |    CAST(CAST(sum(CAST(CAST((e.v - c.cv) * (e.v - c.cv) AS VARCHAR)
       |      AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS se
       |  FROM e
       |  JOIN a$iters a ON a.vec_id = e.vec_id AND a.sub_id = e.sub_id
       |  JOIN c${iters - 1} c ON c.sub_id = e.sub_id AND c.code = a.code
       |                      AND c.spos = e.spos
       |  GROUP BY 1, 2
       |), agg AS (
       |  SELECT sub_id, count(*) AS n_vectors,
       |    CAST(CAST(sum(CAST(CAST(se AS VARCHAR) AS DECIMAL(38,30)))
       |      AS VARCHAR) AS DOUBLE) AS total_sqerr
       |  FROM se GROUP BY 1
       |)
       |SELECT sub_id, n_vectors, total_sqerr,
       |       total_sqerr / n_vectors AS mse
       |FROM agg""".stripMargin

  // ---- IVF-PQ: coarse cells + residual product quantization ----------

  /** IVF-PQ top-k — the billion-scale ANN architecture (IVFADC: Jégou,
    * Douze & Schmid, "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011 — public technique): a TRAINED coarse
    * quantizer ([[ivfTrain]]'s deterministic k-means — metadata labels
    * don't align with L2 geometry, measured cell-recall barely above
    * random) restricts the scan to `nprobe` probed cells per query,
    * and the fine distance runs over RESIDUALS r = v − centroid(cell)
    * encoded with a product quantizer. Residual encoding is what
    * separates this from [[pqAdcTopK]]: residual magnitudes are a
    * cell-diameter fraction of raw magnitudes, so the same nSub·nCodes
    * codebook quantizes far more precisely — the reason real systems
    * train PQ on residuals.
    *
    * Query side: top-`nprobe` cells by exact squared-L2 to the
    * centroids; per probed cell the query's OWN residual (q −
    * centroid) builds the nSub·nCodes LUT of exact subdistances; a
    * candidate joins the LUT of ITS cell on (list_id, sub_id, code)
    * and its approximate distance is the nSub-term exact-decimal sum.
    * The ADC short-list (top 4k by approximate distance) is then
    * RE-RANKED with the exact distance — the IVFADC-R refinement from
    * the same paper: a 16-code subquantizer localizes well but orders
    * a short-list poorly, so the few raw vectors the short-list names
    * are fetched and scored exactly.
    *
    * Scale: centroids and codebook are broadcast-sized by construction
    * (nlists·dim, nSub·nCodes·subDim); the LUT is nQueries·nprobe·
    * nSub·nCodes rows — broadcast; the candidate side touches ONLY
    * integer codes of vectors in probed cells (the RAM-resident
    * precondition), and the single data shuffle is the final
    * (query, neighbor) sum. Training cost is the audited [[ivfTrain]]
    * plan plus the [[pqCodebook]] Lloyd chain on the residual
    * relation — same shapes. */
  def ivfPqTopK(spark: SparkSession, d: String, k: Int = 5, nQueries: Int = 10,
                nprobe: Int = 2, nlists: Int = 8, ivfIters: Int = 2,
                nSub: Int = 8, nCodes: Int = 16,
                iters: Int = 2, dim: Int = 64,
                rerankDepth: Int = 0): DataFrame =
    ivfPqTopK(spark, d,
      Tables.embeddings(spark, d).filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding")),
      k, nprobe, nlists, ivfIters, nSub, nCodes, iters, dim, rerankDepth)

  /** Session memo of the IVF-PQ INDEX bundle (cent, residual codebook,
    * cell-tagged codes) — the per-call persists above covered only one
    * call's plan; bench passes and the arbitrary-query overload
    * rebuilt the training chain each time. All three artifacts are
    * index-sized (nlists·dim, nSub·nCodes·subDim, n·nSub ints),
    * deterministic, and query-independent — exactly what a production
    * IVF-PQ system materializes once at build time. */
  private def ivfPqIndex(spark: SparkSession, d: String, nlists: Int,
                         ivfIters: Int, nSub: Int, nCodes: Int, iters: Int,
                         dim: Int): (DataFrame, DataFrame, DataFrame) =
    ivfPqIndexFromBase(spark, d, "plain",
      Tables.embeddings(spark, d).select(col("vec_id"), col("embedding")),
      () => ivfTrainFull(spark, d, nlists, ivfIters),
      nlists, ivfIters, nSub, nCodes, iters, dim)

  /** [[ivfPqIndex]] trained over an ARBITRARY (vec_id, embedding)
    * base — the rotated serving face trains in the covariance
    * eigenbasis, the plain face on the raw table; `tag` keeps the two
    * bundles apart in the session memo. */
  private def ivfPqIndexFromBase(spark: SparkSession, d: String, tag: String,
                                 base: DataFrame,
                                 train: () => (DataFrame, DataFrame),
                                 nlists: Int, ivfIters: Int, nSub: Int,
                                 nCodes: Int, iters: Int, dim: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val (cent, cb, codes, _) = ivfPqIndexCache.getOrBuild(
      (spark, d, tag, nlists, ivfIters, nSub, nCodes, iters, dim)) {
        // trained coarse quantizer: assignment + the centroids it was
        // scored against (broadcast-sized: nlists rows). cent's LINEAGE
        // is a full Lloyd iteration — persist so the probe and LUT
        // branches don't re-train it (the table itself is nlists rows).
        val (assign, cent0) = train()
        val cent = cent0.persist()
        // residual relation: r = v − centroid(assigned cell), element-
        // wise. Materialized once: every Lloyd stage of the PQ chain
        // (seeds join, per-iteration distance + recompute), the encode
        // pass, and the cell join re-derive it otherwise — ~6 recomputes
        // of the ivfTrain+join subtree. Production IVF-PQ materializes
        // residual codes the same way; storage is n×dim doubles.
        val resid = base.join(assign, "vec_id").join(broadcast(cent), "list_id")
          .select(col("vec_id"), col("list_id"),
            zip_with(col("embedding").cast("array<double>"), col("cemb"),
              (x, y) => x - y).as("embedding"))
          .persist()
        val rb = resid.select(col("vec_id"), col("embedding"))
        val cb = pqCodebook(rb, nSub, nCodes, iters, dim).persist()
        val codes = pqAssign(subvectors(rb, nSub, dim), cb)
          .join(resid.select(col("vec_id"), col("list_id")), "vec_id")
          .persist()
        // resid rides in the cached value so eviction unpersists it too
        (cent, cb, codes, resid)
      }
    (cent, cb, codes)
  }

  private val ivfPqIndexCache = new graft.SessionMemo[
    (SparkSession, String, String, Int, Int, Int, Int, Int, Int),
    (DataFrame, DataFrame, DataFrame, DataFrame)]("ivf_pq_index")

  /** The ROTATED IVF-PQ index bundle (VERDICT r12 #1): coarse + PQ
    * trained on the [[whitenedBase]] covariance-eigenbasis frame with
    * the same deterministic seeds as the plain bundle. */
  private def ivfPqRotIndex(spark: SparkSession, d: String, nlists: Int,
                            ivfIters: Int, nSub: Int, nCodes: Int, iters: Int,
                            dim: Int): (DataFrame, DataFrame, DataFrame) = {
    val (rb, err) = whitenedBase(spark, d, nSub, dim)
    require(err <= 1e-9,
      f"rotated IVF-PQ: covariance rotation not orthonormal (witness $err%.3g)")
    ivfPqIndexFromBase(spark, d, "rotated", rb,
      () => ivfTrainFullFrom(rb, nlists, ivfIters),
      nlists, ivfIters, nSub, nCodes, iters, dim)
  }

  /** IVF-PQ top-k over an ARBITRARY query set — the same (query_id,
    * embedding) contract and broadcast-size bound as the
    * [[annCosineTopK]]/[[annIvfTopK]] overloads; everything a query
    * contributes (probed cells, residual LUT) is nprobe·nSub·nCodes
    * rows, so the broadcast budget is queries × that, independent of
    * the corpus. */
  def ivfPqTopK(spark: SparkSession, d: String, queries: DataFrame, k: Int,
                nprobe: Int, nlists: Int, ivfIters: Int,
                nSub: Int, nCodes: Int, iters: Int, dim: Int,
                rerankDepth: Int): DataFrame = {
    require(dim % nSub == 0, s"dim $dim must divide into $nSub subspaces")
    val base = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val (cent, cb, codes) =
      ivfPqIndex(spark, d, nlists, ivfIters, nSub, nCodes, iters, dim)
    ivfPqServe(base, queries, cent, cb, codes, k, nprobe, nSub, dim, nCodes,
      rerankDepth = rerankDepth)
  }

  /** The SERVING half of IVF-PQ — probe → residual LUT → cell-
    * restricted ADC → exact re-rank — over an index bundle that can
    * come from the session memo ([[ivfPqTopK]]) OR from a persisted
    * artifact ([[ivfPqTopKPersisted]] via `IndexStore.loadIvfPq`):
    * serving never retrains. */
  /** Default IVFADC-R shortlist depth (VERDICT r14 wrong #2): the r14
    * 10× sweep measured that a FIXED 4k shortlist makes recall FALL as
    * nprobe rises — extra probed cells flood the shortlist with
    * quantization noise that displaces true neighbors before the exact
    * re-rank sees them (plain 16-code recall 0.148→0.136 raising
    * nprobe 4→8), and that doubling depth lifts every swept cell
    * 1.3–1.7× at invisible serve cost (the re-rank join is
    * O(queries·rerank) over raw vectors — noise next to the ADC join).
    * So the default SCALES with the probe budget, with the measured
    * coarse-subquantizer penalty (nCodes<64 orders the shortlist about
    * one depth-doubling worse), instead of silently under-serving a
    * caller who turns nprobe up: max(4k, 2·nprobe·k·coarsePenalty).
    * At the registered budget (k=5, nprobe=2, nCodes=16) this is 40.
    *
    * Visibility is `private[graft]` (not `private[operators]`) ONLY so
    * the contract spec in package graft can pin the monotone/floor/
    * penalty shape (SimilaritySpec); nothing outside tests should call
    * it — serving paths resolve the depth internally (ADVICE r15). */
  private[graft] def defaultRerankDepth(k: Int, nprobe: Int,
                                            nCodes: Int): Int = {
    val coarsePenalty = if (nCodes < 64) 2 else 1
    math.max(4 * k, 2 * nprobe * k * coarsePenalty)
  }

  private[operators] def ivfPqServe(base: DataFrame, queries: DataFrame,
                                    cent: DataFrame, cb: DataFrame,
                                    codes: DataFrame, k: Int, nprobe: Int,
                                    nSub: Int, dim: Int, nCodes: Int,
                                    rerankBase: Option[DataFrame] = None,
                                    rerankQueries: Option[DataFrame] = None,
                                    rerankDepth: Int = 0): DataFrame = {
    // probe: top-nprobe cells per query by exact centroid distance
    val q = queries.select(col("query_id"),
      col("embedding").cast("array<double>").as("qe"))
    val qc = cent.join(broadcast(q))
      .select(col("query_id"), col("list_id"), col("qe"), col("cemb"),
        exactSqDist("qe", "cemb").as("cdist"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist"), col("list_id"))
    val probed = qc.withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
    // per-probed-cell residual query → subvector slices → exact LUT
    val subDim = dim / nSub
    val rq = probed.select(col("query_id"), col("list_id"),
      zip_with(col("qe"), col("cemb"), (x, y) => x - y).as("rqe"))
    val rqsv = rq.select(col("query_id"), col("list_id"),
      explode(array((0 until nSub).map { j =>
        struct(lit(j.toLong).as("sub_id"),
          slice(col("rqe"), j * subDim + 1, subDim).as("qsv"))
      }: _*)).as("s"))
      .select(col("query_id"), col("list_id"),
        col("s.sub_id").as("sub_id"), col("s.qsv").as("qsv"))
    val lut = rqsv.join(broadcast(cb), "sub_id")
      .select(col("query_id"), col("list_id"), col("sub_id"), col("code"),
        exactSqDist("qsv", "cemb").as("ld"))
    // ADC restricted to probed cells: codes meet the LUT of their cell
    val approx = codes.join(broadcast(lut), Seq("list_id", "sub_id", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("ld").cast("decimal(38,30)")).cast("double").as("adist"))
    // IVFADC-R re-rank: exact-rescore ONLY the top-`rerank` ADC
    // candidates per query — raw vectors are touched O(queries·rerank)
    // times, so the scan stays codes-only while the final ranking is
    // exact (the quantization error of a 16-code subquantizer is too
    // coarse to order the short-list; re-ranking is how the published
    // system closes that gap). rerankDepth > 0 overrides
    // [[defaultRerankDepth]], which scales the shortlist with the
    // probe budget so raising nprobe can never silently LOWER recall
    val rerank = if (rerankDepth > 0) rerankDepth
                 else defaultRerankDepth(k, nprobe, nCodes)
    val wR = Window.partitionBy(col("query_id")).orderBy(col("adist"), col("neighbor_id"))
    val shortlist = approx.withColumn("arn", row_number().over(wR))
      .filter(col("arn") <= rerank).drop("arn")
    // re-rank space: by default the probing space itself; the ROTATED
    // bundle shortlists in the eigenbasis but re-ranks against the
    // ORIGINAL vectors/queries (an isometry, so either ranks the true
    // metric — original-space distances are the published contract)
    val rBase = rerankBase.getOrElse(base)
    val rQ = rerankQueries
      .map(_.select(col("query_id"),
        col("embedding").cast("array<double>").as("qe")))
      .getOrElse(q)
    val exact = shortlist
      .join(rBase.select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("ce")), "neighbor_id")
      .join(broadcast(rQ), "query_id")
      .select(col("query_id"), col("neighbor_id"), col("adist"),
        exactSqDist("qe", "ce").as("dist"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** DuckDB twin of [[ivfPqTopK]]: the iv-prefixed [[ivfChainSql]]
    * trains the coarse quantizer, the [[pqSqlChain]] Lloyd loop runs on
    * the residual `e` relation it yields, then probe → residual LUT →
    * cell-restricted ADC. */
  /** Arbitrary-query-set face of the [[ivfPqTopK]] overload, registered
    * under the hash oracle (VERDICT r7 #6) — same predicate contract as
    * [[annCosineTopKWhere]]. */
  def ivfPqTopKWhere(spark: SparkSession, d: String, pred: String,
                     k: Int = 5, nprobe: Int = 2, nlists: Int = 8,
                     ivfIters: Int = 2, nSub: Int = 8, nCodes: Int = 16,
                     iters: Int = 2, dim: Int = 64): DataFrame =
    ivfPqTopK(spark, d,
      Tables.embeddings(spark, d).filter(expr(pred))
        .select(col("vec_id").as("query_id"), col("embedding")),
      k, nprobe, nlists, ivfIters, nSub, nCodes, iters, dim, rerankDepth = 0)

  /** [[ivfPqTopK]] served from a PERSISTED index bundle — the
    * compressed-index production round-trip: train (session-memoized)
    * → `IndexStore.saveIvfPq` (coarse centroids + residual codebook +
    * cell-tagged codes as three parquet relations) →
    * `IndexStore.loadIvfPq` (validated) → [[ivfPqServe]]. Deterministic
    * training + lossless artifact ⇒ identical results, so this query
    * SHARES ivf_pq_topk's DuckDB oracle. Serving from the artifact
    * touches raw vectors only in the O(queries·rerank) re-rank join —
    * the bundle (nlists·dim + nSub·nCodes·subDim + n·nSub ints) is the
    * whole index a serving cluster needs. */
  def ivfPqTopKPersisted(spark: SparkSession, d: String, k: Int = 5,
                         nQueries: Int = 10, nprobe: Int = 2,
                         nlists: Int = 8, ivfIters: Int = 2,
                         nSub: Int = 8, nCodes: Int = 16,
                         iters: Int = 2, dim: Int = 64): DataFrame = {
    val path = graft.sources.IndexStore.artifactPath(
      "ivfpq", s"$d|$nlists|$nSub|$nCodes")
    buildIvfPq(spark, d, path, nlists, ivfIters, nSub, nCodes, iters, dim)
    ivfPqTopKAt(spark, d, path, k, nQueries, nprobe, nSub, dim)
  }

  // ---- load-only ANN serving posture (VERDICT r13 #3) ------------------
  // The ingest/serving split the leaf store got in r13, extended to the
  // ANN bundles: `build*(d, path)` trains once at an EXPLICIT durable
  // path; `*At(path)` faces NEVER train — an absent or torn store fails
  // fast naming the artifact (IndexStore.loadIvfPq/loadIvf validation),
  // never silently falls back to a fresh train, and the executed plan
  // touches raw vectors only on the query side and the
  // O(queries·rerank) re-rank join (pinned in SimilaritySpec). The
  // registered `_persisted` queries are now build-then-serve over these
  // exact faces, so the round-trip oracle gates the same code a serving
  // cluster runs against a mounted path.

  /** Train the plain IVF-PQ bundle and publish it at `path` — the
    * ingest half of the compressed-index serving split. */
  def buildIvfPq(spark: SparkSession, d: String, path: String,
                 nlists: Int = 8, ivfIters: Int = 2, nSub: Int = 8,
                 nCodes: Int = 16, iters: Int = 2, dim: Int = 64): Unit = {
    val (cent, cb, codes) =
      ivfPqIndex(spark, d, nlists, ivfIters, nSub, nCodes, iters, dim)
    graft.sources.IndexStore.saveIvfPq(spark, cent, cb, codes, path,
      nlists, nSub, nCodes)
  }

  /** Train the ROTATED IVF-PQ bundle (rotation relation included) and
    * publish it at `path`. */
  def buildIvfPqRotated(spark: SparkSession, d: String, path: String,
                        nlists: Int = 8, ivfIters: Int = 2, nSub: Int = 8,
                        nCodes: Int = 16, iters: Int = 2,
                        dim: Int = 64): Unit = {
    import spark.implicits._
    val (cent, cb, codes) =
      ivfPqRotIndex(spark, d, nlists, ivfIters, nSub, nCodes, iters, dim)
    val r0 = pqRotationFor(spark, d, nSub, dim)
    val rotDf = Seq((dim.toLong, r0.map(_.toSeq).toSeq)).toDF("dim", "rot")
    graft.sources.IndexStore.saveIvfPq(spark, cent, cb, codes, path,
      nlists, nSub, nCodes, rotation = Some(rotDf))
  }

  /** LOAD-ONLY IVF-PQ serving from an explicit bundle path: probe →
    * residual LUT → cell-restricted ADC → exact re-rank, with every
    * index relation read from the artifact — never trains, fails fast
    * on an absent/torn/rotated-basis bundle. */
  def ivfPqTopKAt(spark: SparkSession, d: String, path: String,
                  k: Int = 5, nQueries: Int = 10, nprobe: Int = 2,
                  nSub: Int = 8, dim: Int = 64,
                  rerankDepth: Int = 0): DataFrame = {
    val (cent, cb, codes, rot, nCodes) =
      graft.sources.IndexStore.loadIvfPq(spark, path)
    require(rot.isEmpty,
      s"ivfpq bundle at $path was trained in a rotated basis — serve it " +
        "via ivfPqRotatedTopKAt, not the plain serving path")
    val base = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    ivfPqServe(base,
      base.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding")),
      cent, cb, codes, k, nprobe, nSub, dim, nCodes,
      rerankDepth = rerankDepth)
  }

  /** LOAD-ONLY rotated IVF-PQ serving: the LOADED rotation matrix (one
    * dim×dim row — bounded collect by construction) rotates base and
    * queries into the bundle's training basis, the shortlist forms
    * there, and the re-rank scores ORIGINAL vectors. Never trains. */
  def ivfPqRotatedTopKAt(spark: SparkSession, d: String, path: String,
                         k: Int = 5, nQueries: Int = 10, nprobe: Int = 2,
                         nSub: Int = 8, dim: Int = 64,
                         rerankDepth: Int = 0): DataFrame = {
    val (cent, cb, codes, rotRel, nCodes) =
      graft.sources.IndexStore.loadIvfPq(spark, path)
    require(rotRel.isDefined,
      s"ivfpq bundle at $path: rotated serving requires the rotation " +
        "relation — this bundle was trained unrotated (serve it via " +
        "ivfPqTopKAt)")
    val loaded = rotRel.get.collect()
    require(loaded.length == 1 && loaded.head.getAs[Long]("dim") == dim.toLong,
      s"ivfpq bundle at $path: rotation relation malformed")
    val r = loaded.head.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("rot")
      .map(_.toArray).toArray
    val orig = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val rb = rotateEmbeddings(spark, orig, r)
    ivfPqServe(rb,
      rb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding")),
      cent, cb, codes, k, nprobe, nSub, dim, nCodes,
      rerankBase = Some(orig),
      rerankQueries = Some(orig.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding"))),
      rerankDepth = rerankDepth)
  }

  /** Mount an IVF-PQ bundle ONCE for steady-state serving (VERDICT r14
    * #5): load + validate the artifact a single time, persist the
    * index relations (and, for a rotated bundle, the rotated corpus
    * base), and return a serve closure over ARBITRARY
    * (query_id, embedding) frames — the shape a streaming foreachBatch
    * loop calls per micro-batch. Per batch the only new work is
    * query-proportional: the probe/LUT broadcast (nprobe·nSub·nCodes
    * rows per query), the cell-restricted ADC join against the
    * persisted codes, and the O(queries·rerank) exact re-rank — no
    * retraining, no artifact re-read, no corpus re-rotation. The
    * bundle self-describes its basis: a rotated bundle's loaded matrix
    * (one dim×dim row — bounded collect by construction) rotates the
    * corpus once at mount time and each query batch at serve time,
    * with the re-rank scoring ORIGINAL vectors, exactly the
    * [[ivfPqRotatedTopKAt]] contract. The persisted relations live for
    * the session (mount once per process, the face-8 cross-process
    * posture). */
  def mountIvfPq(spark: SparkSession, d: String, path: String,
                 k: Int = 5, nprobe: Int = 2, nSub: Int = 8,
                 dim: Int = 64, rerankDepth: Int = 0)
      : DataFrame => DataFrame = {
    val (cent0, cb0, codes0, rotRel, nCodes) =
      graft.sources.IndexStore.loadIvfPq(spark, path)
    val cent = cent0.persist()
    val cb = cb0.persist()
    val codes = codes0.persist()
    val orig = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding")).persist()
    rotRel match {
      case None =>
        (queries: DataFrame) =>
          ivfPqServe(orig, queries, cent, cb, codes, k, nprobe, nSub, dim,
            nCodes, rerankDepth = rerankDepth)
      case Some(rel) =>
        val loaded = rel.collect()
        require(loaded.length == 1 &&
            loaded.head.getAs[Long]("dim") == dim.toLong,
          s"ivfpq bundle at $path: rotation relation malformed")
        val r = loaded.head
          .getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("rot")
          .map(_.toArray).toArray
        val rb = rotateEmbeddings(spark, orig, r).persist()
        (queries: DataFrame) => {
          val rq = rotateEmbeddings(spark,
            queries.select(col("query_id").as("vec_id"), col("embedding")), r)
            .select(col("vec_id").as("query_id"), col("embedding"))
          ivfPqServe(rb, rq, cent, cb, codes, k, nprobe, nSub, dim, nCodes,
            rerankBase = Some(orig), rerankQueries = Some(queries),
            rerankDepth = rerankDepth)
        }
    }
  }

  /** INCREMENTAL APPEND to a published IVF-PQ bundle (VERDICT r15 next
    * #6) — the ANN store's daily-ingest move, completing the
    * train-once/mount-once/serve-many posture with the dedup store's
    * append step: arriving vectors are encoded with the bundle's OWN
    * trained artifacts — rotated by the stored matrix iff the bundle
    * trained rotated, coarse-assigned to the TRAINED centroids by the
    * exact training argmin ([[coarseAssign]] — the shared body, so an
    * appended vector lands in the same cell a retrain's final scoring
    * pass would put it), residual-encoded against the TRAINED
    * codebooks ([[pqAssign]]) — and the code rows join the store as a
    * CAS generation (`IndexStore.appendIvfPqCodes`: torn appends stay
    * invisible, concurrent writers abort). NOTHING retrains, so serve
    * answers over the grown bundle equal a batch re-encode with the
    * same frozen artifacts bit-for-bit (spec-pinned), and recall
    * drifts only as far as the frozen quantizer misfits the new data —
    * measured vs full retrain at 10× in PLANS.md (round 16).
    *
    * `vecs` is (vec_id, embedding); vec_ids must be new to the store
    * (the caller's contract, same as dedup-keeper appends — re-served
    * batches dedup upstream). */
  def appendIvfPq(spark: SparkSession, path: String, vecs: DataFrame,
                  nSub: Int = 8, dim: Int = 64): Unit = {
    require(dim % nSub == 0, s"dim $dim must divide into $nSub subspaces")
    // fail-fast shape validation (ADVICE r16): the caller's nSub/dim
    // must match the TRAINED bundle — a mismatched nSub would split
    // residuals at the wrong subDim against the stored codebook and
    // silently append corrupt code rows. n_sub comes from the SAME
    // validated-load meta read the bundle load needs anyway (r17: was
    // a second meta-generation read job per append).
    val (cent, cb, _, rotRel, meta) =
      graft.sources.IndexStore.loadIvfPqWithMeta(spark, path)
    val trainedNSub = meta.getAs[Int]("n_sub")
    require(nSub == trainedNSub,
      s"ivfpq bundle at $path: trained with n_sub=$trainedNSub, append called with nSub=$nSub")
    val trainedDim = cent.select(size(col("cemb"))).head.getInt(0)
    require(dim == trainedDim,
      s"ivfpq bundle at $path: trained at dim=$trainedDim, append called with dim=$dim")
    val base = rotRel match {
      case None => vecs.select(col("vec_id"), col("embedding"))
      case Some(rel) =>
        val loaded = rel.collect()
        require(loaded.length == 1 &&
            loaded.head.getAs[Long]("dim") == dim.toLong,
          s"ivfpq bundle at $path: rotation relation malformed")
        val r = loaded.head
          .getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("rot")
          .map(_.toArray).toArray
        rotateEmbeddings(spark,
          vecs.select(col("vec_id"), col("embedding")), r)
    }
    val assign = coarseAssign(base, cent.select(col("list_id"), col("cemb")))
    val resid = base.join(assign, "vec_id")
      .join(broadcast(cent.select(col("list_id"), col("cemb"))), "list_id")
      .select(col("vec_id"), col("list_id"),
        zip_with(col("embedding").cast("array<double>"), col("cemb"),
          (x, y) => x - y).as("embedding"))
    val newCodes = pqAssign(
        subvectors(resid.select(col("vec_id"), col("embedding")), nSub, dim), cb)
      .join(resid.select(col("vec_id"), col("list_id")), "vec_id")
    graft.sources.IndexStore.appendIvfPqCodes(spark, newCodes, path)
  }

  /** The APPEND posture as a REGISTERED, hash-gated query (round 16 —
    * appendIvfPq's oracle surface): train the coarse quantizer and
    * residual PQ on the BASE subset only (`vec_id % baseMod ≠
    * baseRes`), publish, encode the ARRIVING remainder against the
    * frozen artifacts via [[appendIvfPq]], and serve the standard
    * top-k over the grown bundle from the full corpus relation. The
    * DuckDB twin ([[ivfPqAppendedTopKSql]]) replays the whole posture
    * — base-only training, frozen-artifact assignment/encode of the
    * arrivals, union of the code relations, probe → LUT → ADC →
    * re-rank — so the append path's answers are bit-gated by the
    * oracle at both SFs, not just spec-pinned. */
  def ivfPqTopKAppendedPersisted(spark: SparkSession, d: String, k: Int = 5,
                                 nQueries: Int = 10, nprobe: Int = 2,
                                 nlists: Int = 8, ivfIters: Int = 2,
                                 nSub: Int = 8, nCodes: Int = 16,
                                 iters: Int = 2, dim: Int = 64,
                                 baseMod: Int = 4, baseRes: Int = 3): DataFrame = {
    val path = graft.sources.IndexStore.artifactPath(
      "ivfpqapp", s"$d|$nlists|$nSub|$nCodes|$baseMod|$baseRes")
    val emb = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val base = emb.filter(col("vec_id") % baseMod =!= baseRes)
    val (cent, cb, codes) = ivfPqIndexFromBase(spark, d,
      s"appendbase:$baseMod:$baseRes", base,
      () => ivfTrainFullFrom(base, nlists, ivfIters),
      nlists, ivfIters, nSub, nCodes, iters, dim)
    // save OVERWRITES the code relation wholesale (fresh manifest), so
    // a re-run of this query re-publishes base-only codes and the
    // append below re-adds the arrivals exactly once — idempotent
    graft.sources.IndexStore.saveIvfPq(spark, cent, cb, codes, path,
      nlists, nSub, nCodes)
    appendIvfPq(spark, path,
      emb.filter(col("vec_id") % baseMod === baseRes), nSub, dim)
    ivfPqTopKFrom(spark, path, emb,
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding")),
      k, nprobe, nSub, dim)
  }

  /** DuckDB twin of [[ivfPqTopKAppendedPersisted]]: the training CTEs
    * ([[ivfChainSqlFrom]] + [[pqSqlChain]]) see ONLY the base subset —
    * seeds, Lloyd iterations, and codebooks all derive from it, exactly
    * as the published bundle does — then `apa`/`apcode` assign and
    * encode the arriving vectors against the FROZEN final centroids
    * (ivc) and codebooks (c): the same exact-decimal argmins with the
    * same (dist, list_id)/(dist, code) tie-breaks `coarseAssign` and
    * `pqAssign` use, so the frozen-encoder contract replays bit for
    * bit. The serve half is [[ivfPqTopKSqlWhere]]'s chain over the
    * UNIONED assignment/code relations and the full positions. */
  def ivfPqAppendedTopKSql(k: Int = 5, nQueries: Int = 10, nprobe: Int = 2,
                           nlists: Int = 8, ivfIters: Int = 2,
                           nSub: Int = 8, nCodes: Int = 16, iters: Int = 2,
                           dim: Int = 64, baseMod: Int = 4,
                           baseRes: Int = 3): String =
    s"""${ivfPqAppendedChainSql(k, nQueries, nprobe, nlists, ivfIters, nSub,
           nCodes, iters, dim, baseMod, baseRes)}
       |SELECT query_id, neighbor_id, adist, dist, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY dist, neighbor_id) AS rank
       |  FROM ex
       |) WHERE rank <= $k""".stripMargin

  /** The WITH-clause of the appended-posture replay, through `ex` (the
    * exact distances of the re-rank shortlist) — shared by the topk
    * twin above and the drift monitor's twin
    * ([[ivfPqAppendDriftSql]]). */
  private def ivfPqAppendedChainSql(k: Int, nQueries: Int, nprobe: Int,
                                    nlists: Int, ivfIters: Int,
                                    nSub: Int, nCodes: Int, iters: Int,
                                    dim: Int, baseMod: Int,
                                    baseRes: Int): String = {
    val subDim = dim / nSub
    val iN = ivfIters
    val basePred = s"vec_id % $baseMod <> $baseRes"
    val eBody =
      s"""SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
         |  FROM (SELECT vec_id, unnest(range(1, len(embedding)+1)) AS i, embedding
         |        FROM embeddings WHERE $basePred)""".stripMargin
    val residPrelude =
      s"""${ivfChainSqlFrom(nlists, ivfIters, "iv", eBody)}, e AS (
         |  SELECT b.vec_id, CAST(b.pos // $subDim AS BIGINT) AS sub_id,
         |         b.pos % $subDim AS spos, b.v - c.cv AS v
         |  FROM ive b
         |  JOIN iva$iN a USING (vec_id)
         |  JOIN ivc${iN - 1} c ON c.list_id = a.list_id AND c.pos = b.pos
         |)""".stripMargin
    s"""${pqSqlChain(nSub, nCodes, iters, dim, Some(residPrelude))}, alle AS (
       |  SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
       |  FROM (SELECT vec_id, unnest(range(1, len(embedding)+1)) AS i, embedding
       |        FROM embeddings)
       |), apd AS (
       |  SELECT e.vec_id, c.list_id,
       |    CAST(CAST(sum(CAST(CAST((e.v - c.cv) * (e.v - c.cv) AS VARCHAR)
       |      AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS dist
       |  FROM alle e JOIN ivc${iN - 1} c ON e.pos = c.pos
       |  WHERE NOT ($basePred)
       |  GROUP BY 1, 2
       |), apa AS (
       |  SELECT vec_id, list_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY dist, list_id) AS rn FROM apd
       |  ) WHERE rn = 1
       |), fulla AS (
       |  SELECT vec_id, list_id FROM iva$iN
       |  UNION ALL SELECT vec_id, list_id FROM apa
       |), appe AS (
       |  SELECT b.vec_id, CAST(b.pos // $subDim AS BIGINT) AS sub_id,
       |         b.pos % $subDim AS spos, b.v - c.cv AS v
       |  FROM alle b
       |  JOIN apa a USING (vec_id)
       |  JOIN ivc${iN - 1} c ON c.list_id = a.list_id AND c.pos = b.pos
       |), apld AS (
       |  SELECT r.vec_id, r.sub_id, c.code,
       |    CAST(CAST(sum(CAST(CAST((r.v - c.cv) * (r.v - c.cv) AS VARCHAR)
       |      AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS dist
       |  FROM appe r JOIN c${iters - 1} c ON r.sub_id = c.sub_id AND r.spos = c.spos
       |  GROUP BY 1, 2, 3
       |), apcode AS (
       |  SELECT vec_id, sub_id, code FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub_id
       |                                 ORDER BY dist, code) AS rn FROM apld
       |  ) WHERE rn = 1
       |), fullcodes AS (
       |  SELECT vec_id, sub_id, code FROM a$iters
       |  UNION ALL SELECT vec_id, sub_id, code FROM apcode
       |), qd AS (
       |  SELECT q.vec_id AS query_id, c.list_id,
       |    CAST(CAST(sum(CAST(CAST((q.v - c.cv) * (q.v - c.cv) AS VARCHAR)
       |      AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS cdist
       |  FROM alle q JOIN ivc${iN - 1} c ON q.pos = c.pos
       |  WHERE q.vec_id < $nQueries
       |  GROUP BY 1, 2
       |), probe AS (
       |  SELECT query_id, list_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY cdist, list_id) AS pr FROM qd
       |  ) WHERE pr <= $nprobe
       |), rq AS (
       |  SELECT q.vec_id AS query_id, pb.list_id, q.pos, q.v - c.cv AS v
       |  FROM alle q
       |  JOIN probe pb ON pb.query_id = q.vec_id
       |  JOIN ivc${iN - 1} c ON c.list_id = pb.list_id AND c.pos = q.pos
       |  WHERE q.vec_id < $nQueries
       |), rqe AS (
       |  SELECT query_id, list_id, CAST(pos // $subDim AS BIGINT) AS sub_id,
       |         pos % $subDim AS spos, v
       |  FROM rq
       |), lut AS (
       |  SELECT r.query_id, r.list_id, r.sub_id, c.code,
       |    CAST(CAST(sum(CAST(CAST((r.v - c.cv) * (r.v - c.cv) AS VARCHAR)
       |      AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS ld
       |  FROM rqe r JOIN c${iters - 1} c ON r.sub_id = c.sub_id AND r.spos = c.spos
       |  GROUP BY 1, 2, 3, 4
       |), adc AS (
       |  SELECT l.query_id, a.vec_id AS neighbor_id,
       |    CAST(CAST(sum(CAST(CAST(l.ld AS VARCHAR) AS DECIMAL(38,30)))
       |      AS VARCHAR) AS DOUBLE) AS adist
       |  FROM fullcodes a
       |  JOIN fulla la ON la.vec_id = a.vec_id
       |  JOIN lut l ON l.list_id = la.list_id AND l.sub_id = a.sub_id
       |             AND l.code = a.code
       |  WHERE a.vec_id <> l.query_id
       |  GROUP BY 1, 2
       |), rr AS (
       |  SELECT query_id, neighbor_id, adist FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY adist, neighbor_id) AS arn
       |    FROM adc
       |  ) WHERE arn <= ${defaultRerankDepth(k, nprobe, nCodes)}
       |), ex AS (
       |  SELECT r.query_id, r.neighbor_id, r.adist,
       |    CAST(CAST(sum(CAST(CAST((q.v - n.v) * (q.v - n.v) AS VARCHAR)
       |      AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS dist
       |  FROM rr r
       |  JOIN alle q ON q.vec_id = r.query_id
       |  JOIN alle n ON n.vec_id = r.neighbor_id AND n.pos = q.pos
       |  GROUP BY 1, 2, 3
       |)""".stripMargin
  }

  /** LOAD-ONLY serving over a CALLER-SUPPLIED raw-vector corpus — the
    * grown-bundle face [[appendIvfPq]] implies: once vectors append
    * past the original table, the raw corpus for the exact re-rank is
    * the caller's own relation (table ∪ arrivals), not a parquet dir
    * this library can name. Self-describing basis, the
    * [[mountIvfPq]] contract: a rotated bundle rotates base and
    * queries by its STORED matrix and re-ranks ORIGINALS. */
  def ivfPqTopKFrom(spark: SparkSession, path: String, base: DataFrame,
                    queries: DataFrame, k: Int = 5, nprobe: Int = 2,
                    nSub: Int = 8, dim: Int = 64,
                    rerankDepth: Int = 0): DataFrame = {
    val (cent, cb, codes, rotRel, nCodes) =
      graft.sources.IndexStore.loadIvfPq(spark, path)
    val orig = base.select(col("vec_id"), col("embedding"))
    rotRel match {
      case None =>
        ivfPqServe(orig, queries, cent, cb, codes, k, nprobe, nSub, dim,
          nCodes, rerankDepth = rerankDepth)
      case Some(rel) =>
        val loaded = rel.collect()
        require(loaded.length == 1 &&
            loaded.head.getAs[Long]("dim") == dim.toLong,
          s"ivfpq bundle at $path: rotation relation malformed")
        val r = loaded.head
          .getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("rot")
          .map(_.toArray).toArray
        val rq = rotateEmbeddings(spark,
          queries.select(col("query_id").as("vec_id"), col("embedding")), r)
          .select(col("vec_id").as("query_id"), col("embedding"))
        ivfPqServe(rotateEmbeddings(spark, orig, r), rq, cent, cb, codes,
          k, nprobe, nSub, dim, nCodes,
          rerankBase = Some(orig), rerankQueries = Some(queries),
          rerankDepth = rerankDepth)
    }
  }

  /** APPEND-DRIFT MONITOR over a grown IVF-PQ bundle (VERDICT r16 next
    * #5): serve a deterministic probe set through the bundle
    * ([[ivfPqTopKFrom]] — frozen artifacts, appended codes included)
    * and report, per probe, how many served top-k neighbors survive in
    * the EXACT brute-force top-k over the same corpus — recall@k of
    * the frozen-encoder index. The 100× drift table's production rule
    * ("monitor rotated recall, retrain on budget breach") is now a
    * QUERY a deployment schedules, not a judgment call: run this after
    * appends, alert when recall crosses the budget. Deterministic by
    * construction — exact-decimal distances and (dist, neighbor_id)
    * tie-breaks on BOTH sides — so the monitor itself is hash-gated by
    * its DuckDB twin. Output: (query_id, hits, recall). */
  def ivfPqAppendDriftAt(spark: SparkSession, path: String, base: DataFrame,
                         k: Int = 5, nQueries: Int = 10, nprobe: Int = 2,
                         nSub: Int = 8, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val corpus = base.select(col("vec_id"), col("embedding"))
    val probes = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val served = ivfPqTopKFrom(spark, path, corpus, probes, k, nprobe,
        nSub, dim)
      .select(col("query_id"), col("neighbor_id"))
    // exact side: brute-force top-k in the SERVE metric (squared L2),
    // queries broadcast (bounded probe set), same tie-break
    val exact = corpus
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("ce"))
      .crossJoin(broadcast(probes.select(col("query_id"),
        col("embedding").cast("array<double>").as("qe"))))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        exactSqDist("qe", "ce").as("dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("neighbor_id"))
    val exTop = exact.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k).select(col("query_id"), col("neighbor_id"))
    val hits = served.join(exTop, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("h"))
    probes.select(col("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("h"), lit(0L)).as("hits"),
        (coalesce(col("h"), lit(0L)).cast("double") / k).as("recall"))
  }

  /** The drift monitor as a REGISTERED, hash-gated query: rebuild the
    * deterministic appended posture ([[ivfPqTopKAppendedPersisted]]'s
    * — base-only training via the SHARED session memo, publish, append
    * the arrivals with frozen artifacts) at its own store path, then
    * run [[ivfPqAppendDriftAt]] over the grown bundle. The posture IS
    * the product: what ships is the monitor face; the rebuild exists so
    * the DuckDB twin can replay the exact store this report serves. */
  def ivfPqAppendDrift(spark: SparkSession, d: String, k: Int = 5,
                       nQueries: Int = 10, nprobe: Int = 2,
                       nlists: Int = 8, ivfIters: Int = 2, nSub: Int = 8,
                       nCodes: Int = 16, iters: Int = 2, dim: Int = 64,
                       baseMod: Int = 4, baseRes: Int = 3): DataFrame = {
    val path = graft.sources.IndexStore.artifactPath(
      "ivfpqdrift", s"$d|$nlists|$nSub|$nCodes|$baseMod|$baseRes")
    val emb = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val base = emb.filter(col("vec_id") % baseMod =!= baseRes)
    val (cent, cb, codes) = ivfPqIndexFromBase(spark, d,
      s"appendbase:$baseMod:$baseRes", base,
      () => ivfTrainFullFrom(base, nlists, ivfIters),
      nlists, ivfIters, nSub, nCodes, iters, dim)
    graft.sources.IndexStore.saveIvfPq(spark, cent, cb, codes, path,
      nlists, nSub, nCodes)
    appendIvfPq(spark, path, emb.filter(col("vec_id") % baseMod === baseRes),
      nSub, dim)
    ivfPqAppendDriftAt(spark, path, emb, k, nQueries, nprobe, nSub, dim)
  }

  /** DuckDB twin of [[ivfPqAppendDrift]]: the appended-posture chain
    * ([[ivfPqAppendedChainSql]] — base-only training, frozen-artifact
    * encode of arrivals, union serve) reduced to the served id set,
    * joined against the brute-force exact top-k (same exact-decimal
    * distance, same (dist, neighbor_id) tie-break) — per-probe hit
    * counts and recall@k. */
  def ivfPqAppendDriftSql(k: Int = 5, nQueries: Int = 10, nprobe: Int = 2,
                          nlists: Int = 8, ivfIters: Int = 2, nSub: Int = 8,
                          nCodes: Int = 16, iters: Int = 2, dim: Int = 64,
                          baseMod: Int = 4, baseRes: Int = 3): String =
    s"""${ivfPqAppendedChainSql(k, nQueries, nprobe, nlists, ivfIters, nSub,
           nCodes, iters, dim, baseMod, baseRes)}, served AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY dist, neighbor_id) AS rank
       |    FROM ex
       |  ) WHERE rank <= $k
       |), exd AS (
       |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
       |    CAST(CAST(sum(CAST(CAST((q.v - n.v) * (q.v - n.v) AS VARCHAR)
       |      AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS dist
       |  FROM alle q
       |  JOIN alle n ON n.pos = q.pos AND n.vec_id <> q.vec_id
       |  WHERE q.vec_id < $nQueries
       |  GROUP BY 1, 2
       |), extop AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY dist, neighbor_id) AS rk
       |    FROM exd
       |  ) WHERE rk <= $k
       |), agree AS (
       |  SELECT s.query_id, count(*) AS h
       |  FROM served s JOIN extop e
       |    ON e.query_id = s.query_id AND e.neighbor_id = s.neighbor_id
       |  GROUP BY 1
       |)
       |SELECT q.query_id, COALESCE(a.h, 0) AS hits,
       |       CAST(COALESCE(a.h, 0) AS DOUBLE) / $k AS recall
       |FROM (SELECT vec_id AS query_id FROM embeddings
       |      WHERE vec_id < $nQueries) q
       |LEFT JOIN agree a USING (query_id)""".stripMargin

  /** ROTATED IVFADC serving (VERDICT r12 #1 — pq_whiten_compare's
    * measured rotation finally SERVES): coarse quantizer and residual
    * PQ train in the covariance eigenbasis ([[whitenedBase]] — the
    * codegen'd pinned-order double rotation, so both engines see
    * bit-identical rotated values), queries probe ROTATED, the ADC shortlist forms in the
    * rotated space where the variance-balanced subspaces quantize
    * tighter, and the final re-rank scores the shortlist against the
    * ORIGINAL vectors — the rotation is an isometry, so the original
    * metric is exactly the one the rotated index approximates, and the
    * published (query_id, neighbor_id, adist, dist, rank) contract is
    * the same shape as [[ivfPqTopK]]'s.
    *
    * Oracle: [[ivfPqRotatedTopKSql]] replays the ENTIRE chain in
    * DuckDB — the rotation matrix rides as a literal (it derives
    * deterministically from the hash-verified embedding_covariance
    * relation; `graft.Verify` computes it at dump time), the rotated
    * base re-derives bit-for-bit via the pinned-order double fold,
    * and train/probe/ADC/re-rank are the [[ivfPqTopKSqlWhere]] CTEs —
    * so the hash gate pins the rotated SERVING path end to end, not
    * just a comparison telemetry row. Recall floor vs the plain
    * bundle is pinned in SimilaritySpec on the standard probes. */
  def ivfPqRotatedTopK(spark: SparkSession, d: String, k: Int = 5,
                       nQueries: Int = 10, nprobe: Int = 2,
                       nlists: Int = 8, ivfIters: Int = 2,
                       nSub: Int = 8, nCodes: Int = 16,
                       iters: Int = 2, dim: Int = 64,
                       rerankDepth: Int = 0): DataFrame = {
    require(dim % nSub == 0, s"dim $dim must divide into $nSub subspaces")
    val (rb, _) = whitenedBase(spark, d, nSub, dim)
    val (cent, cb, codes) =
      ivfPqRotIndex(spark, d, nlists, ivfIters, nSub, nCodes, iters, dim)
    val orig = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    ivfPqServe(rb,
      rb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding")),
      cent, cb, codes, k, nprobe, nSub, dim, nCodes,
      rerankBase = Some(orig),
      rerankQueries = Some(orig.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding"))),
      rerankDepth = rerankDepth)
  }

  /** [[ivfPqRotatedTopK]] served from a PERSISTED bundle that CARRIES
    * THE ROTATION (saveIvfPq's `rotation` relation, format v2): load
    * validates the rotation is present (a rotated bundle probed as
    * plain fails fast, and vice versa), the loaded matrix — not a
    * fresh derivation — rotates base and queries, and the serve chain
    * is [[ivfPqServe]] unchanged. Deterministic training + lossless
    * artifact ⇒ identical results, so this SHARES
    * ivf_pq_rotated_topk's oracle. */
  def ivfPqRotatedTopKPersisted(spark: SparkSession, d: String, k: Int = 5,
                                nQueries: Int = 10, nprobe: Int = 2,
                                nlists: Int = 8, ivfIters: Int = 2,
                                nSub: Int = 8, nCodes: Int = 16,
                                iters: Int = 2, dim: Int = 64): DataFrame = {
    val path = graft.sources.IndexStore.artifactPath(
      "ivfpqrot", s"$d|$nlists|$nSub|$nCodes")
    buildIvfPqRotated(spark, d, path, nlists, ivfIters, nSub, nCodes,
      iters, dim)
    ivfPqRotatedTopKAt(spark, d, path, k, nQueries, nprobe, nSub, dim)
  }

  /** DuckDB twin of [[ivfPqRotatedTopK]]: the rotation matrix as a
    * literal (computed by the caller from the same covariance chain —
    * `graft.Verify` passes [[pqRotationFor]]'s matrix at oracle-dump
    * time), the rotated base re-derived with the kernel's pinned
    * ascending-j double fold (`list_reduce`), then the
    * [[ivfPqTopKSqlWhere]] train/probe/ADC CTEs over the rotated
    * positions, with the final re-rank on ORIGINAL positions. */
  def ivfPqRotatedTopKSql(r: Array[Array[Double]], k: Int = 5,
                          nQueries: Int = 10, nprobe: Int = 2,
                          nlists: Int = 8, ivfIters: Int = 2,
                          nSub: Int = 8, nCodes: Int = 16, iters: Int = 2,
                          dim: Int = 64): String = {
    val subDim = dim / nSub
    val iN = ivfIters
    // the matrix rides as ONE STRING literal parsed element-wise with
    // CAST(VARCHAR AS DOUBLE) — strtod, correctly rounded. A bare
    // numeric literal would NOT round-trip: DuckDB parses it as
    // DECIMAL and its decimal→double conversion is off by 1 ulp for
    // ~16% of full-precision doubles (measured round 13).
    val mat = r.map(_.map(java.lang.Double.toString).mkString(","))
      .mkString(";")
    val residPrelude =
      s"""rmat AS (SELECT list_transform(string_split('$mat', ';'),
         |  r -> list_transform(string_split(r, ','),
         |       s -> CAST(s AS DOUBLE))) AS m),
         |orig AS (SELECT vec_id,
         |           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |         FROM embeddings),
         |rp AS (SELECT vec_id, emb, unnest(range(1, ${dim + 1})) AS i FROM orig),
         |rote AS (
         |  -- the engine's MatVecF64 kernel: per output coordinate a
         |  -- DOUBLE fold of the IEEE per-term products in ascending-j
         |  -- order, seeded 0.0 — list_reduce replays that exact order,
         |  -- so both engines see bit-identical rotated values without
         |  -- the decimal detour
         |  SELECT vec_id, i - 1 AS pos,
         |    list_reduce(
         |      list_prepend(CAST(0 AS DOUBLE),
         |        list_transform(range(1, ${dim + 1}), j -> emb[j] * m[j][i])),
         |      (acc, x) -> acc + x) AS v
         |  FROM rp CROSS JOIN rmat
         |),
         |oe AS (SELECT vec_id, i - 1 AS pos, emb[i] AS v FROM rp),
         |${ivfChainSqlFrom(nlists, ivfIters, "iv", "SELECT vec_id, pos, v FROM rote")}, e AS (
         |  SELECT b.vec_id, CAST(b.pos // $subDim AS BIGINT) AS sub_id,
         |         b.pos % $subDim AS spos, b.v - c.cv AS v
         |  FROM ive b
         |  JOIN iva$iN a USING (vec_id)
         |  JOIN ivc${iN - 1} c ON c.list_id = a.list_id AND c.pos = b.pos
         |)""".stripMargin
    val queryPred = s"q.vec_id < $nQueries"
    s"""${pqSqlChain(nSub, nCodes, iters, dim, Some(residPrelude))}, qd AS (
       |  SELECT q.vec_id AS query_id, c.list_id,
       |    CAST(CAST(sum(CAST(CAST((q.v - c.cv) * (q.v - c.cv) AS VARCHAR)
       |      AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS cdist
       |  FROM ive q JOIN ivc${iN - 1} c ON q.pos = c.pos
       |  WHERE $queryPred
       |  GROUP BY 1, 2
       |), probe AS (
       |  SELECT query_id, list_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY cdist, list_id) AS pr FROM qd
       |  ) WHERE pr <= $nprobe
       |), rq AS (
       |  SELECT q.vec_id AS query_id, pb.list_id, q.pos, q.v - c.cv AS v
       |  FROM ive q
       |  JOIN probe pb ON pb.query_id = q.vec_id
       |  JOIN ivc${iN - 1} c ON c.list_id = pb.list_id AND c.pos = q.pos
       |  WHERE $queryPred
       |), rqe AS (
       |  SELECT query_id, list_id, CAST(pos // $subDim AS BIGINT) AS sub_id,
       |         pos % $subDim AS spos, v
       |  FROM rq
       |), lut AS (
       |  SELECT r.query_id, r.list_id, r.sub_id, c.code,
       |    CAST(CAST(sum(CAST(CAST((r.v - c.cv) * (r.v - c.cv) AS VARCHAR)
       |      AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS ld
       |  FROM rqe r JOIN c${iters - 1} c ON r.sub_id = c.sub_id AND r.spos = c.spos
       |  GROUP BY 1, 2, 3, 4
       |), adc AS (
       |  SELECT l.query_id, a.vec_id AS neighbor_id,
       |    CAST(CAST(sum(CAST(CAST(l.ld AS VARCHAR) AS DECIMAL(38,30)))
       |      AS VARCHAR) AS DOUBLE) AS adist
       |  FROM a$iters a
       |  JOIN iva$iN la ON la.vec_id = a.vec_id
       |  JOIN lut l ON l.list_id = la.list_id AND l.sub_id = a.sub_id
       |             AND l.code = a.code
       |  WHERE a.vec_id <> l.query_id
       |  GROUP BY 1, 2
       |), rr AS (
       |  SELECT query_id, neighbor_id, adist FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY adist, neighbor_id) AS arn
       |    FROM adc
       |  ) WHERE arn <= ${defaultRerankDepth(k, nprobe, nCodes)}
       |), ex AS (
       |  SELECT r.query_id, r.neighbor_id, r.adist,
       |    CAST(CAST(sum(CAST(CAST((q.v - n.v) * (q.v - n.v) AS VARCHAR)
       |      AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS dist
       |  FROM rr r
       |  JOIN oe q ON q.vec_id = r.query_id
       |  JOIN oe n ON n.vec_id = r.neighbor_id AND n.pos = q.pos
       |  GROUP BY 1, 2, 3
       |)
       |SELECT query_id, neighbor_id, adist, dist, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY dist, neighbor_id) AS rank
       |  FROM ex
       |) WHERE rank <= $k""".stripMargin
  }

  def ivfPqTopKSql(k: Int = 5, nQueries: Int = 10, nprobe: Int = 2,
                   nlists: Int = 8, ivfIters: Int = 2,
                   nSub: Int = 8, nCodes: Int = 16, iters: Int = 2,
                   dim: Int = 64): String =
    ivfPqTopKSqlWhere(k, s"q.vec_id < $nQueries", nprobe, nlists,
      ivfIters, nSub, nCodes, iters, dim)

  /** [[ivfPqTopKSql]] with an arbitrary query-set predicate over the
    * embeddings table (`q` is the query-side alias) — the oracle twin
    * of the arbitrary-query [[ivfPqTopK]] overload. */
  def ivfPqTopKSqlWhere(k: Int, queryPred: String, nprobe: Int = 2,
                        nlists: Int = 8, ivfIters: Int = 2,
                        nSub: Int = 8, nCodes: Int = 16, iters: Int = 2,
                        dim: Int = 64): String = {
    val subDim = dim / nSub
    val iN = ivfIters
    val residPrelude =
      s"""${ivfChainSql(nlists, ivfIters, "iv")}, e AS (
         |  SELECT b.vec_id, CAST(b.pos // $subDim AS BIGINT) AS sub_id,
         |         b.pos % $subDim AS spos, b.v - c.cv AS v
         |  FROM ive b
         |  JOIN iva$iN a USING (vec_id)
         |  JOIN ivc${iN - 1} c ON c.list_id = a.list_id AND c.pos = b.pos
         |)""".stripMargin
    s"""${pqSqlChain(nSub, nCodes, iters, dim, Some(residPrelude))}, qd AS (
       |  SELECT q.vec_id AS query_id, c.list_id,
       |    CAST(CAST(sum(CAST(CAST((q.v - c.cv) * (q.v - c.cv) AS VARCHAR)
       |      AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS cdist
       |  FROM ive q JOIN ivc${iN - 1} c ON q.pos = c.pos
       |  WHERE $queryPred
       |  GROUP BY 1, 2
       |), probe AS (
       |  SELECT query_id, list_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY cdist, list_id) AS pr FROM qd
       |  ) WHERE pr <= $nprobe
       |), rq AS (
       |  SELECT q.vec_id AS query_id, pb.list_id, q.pos, q.v - c.cv AS v
       |  FROM ive q
       |  JOIN probe pb ON pb.query_id = q.vec_id
       |  JOIN ivc${iN - 1} c ON c.list_id = pb.list_id AND c.pos = q.pos
       |  WHERE $queryPred
       |), rqe AS (
       |  SELECT query_id, list_id, CAST(pos // $subDim AS BIGINT) AS sub_id,
       |         pos % $subDim AS spos, v
       |  FROM rq
       |), lut AS (
       |  SELECT r.query_id, r.list_id, r.sub_id, c.code,
       |    CAST(CAST(sum(CAST(CAST((r.v - c.cv) * (r.v - c.cv) AS VARCHAR)
       |      AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS ld
       |  FROM rqe r JOIN c${iters - 1} c ON r.sub_id = c.sub_id AND r.spos = c.spos
       |  GROUP BY 1, 2, 3, 4
       |), adc AS (
       |  SELECT l.query_id, a.vec_id AS neighbor_id,
       |    CAST(CAST(sum(CAST(CAST(l.ld AS VARCHAR) AS DECIMAL(38,30)))
       |      AS VARCHAR) AS DOUBLE) AS adist
       |  FROM a$iters a
       |  JOIN iva$iN la ON la.vec_id = a.vec_id
       |  JOIN lut l ON l.list_id = la.list_id AND l.sub_id = a.sub_id
       |             AND l.code = a.code
       |  WHERE a.vec_id <> l.query_id
       |  GROUP BY 1, 2
       |), rr AS (
       |  SELECT query_id, neighbor_id, adist FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY adist, neighbor_id) AS arn
       |    FROM adc
       |  ) WHERE arn <= ${defaultRerankDepth(k, nprobe, nCodes)}
       |), ex AS (
       |  SELECT r.query_id, r.neighbor_id, r.adist,
       |    CAST(CAST(sum(CAST(CAST((q.v - n.v) * (q.v - n.v) AS VARCHAR)
       |      AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS dist
       |  FROM rr r
       |  JOIN ive q ON q.vec_id = r.query_id
       |  JOIN ive n ON n.vec_id = r.neighbor_id AND n.pos = q.pos
       |  GROUP BY 1, 2, 3
       |)
       |SELECT query_id, neighbor_id, adist, dist, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY dist, neighbor_id) AS rank
       |  FROM ex
       |) WHERE rank <= $k""".stripMargin
  }

  /** Shared CTE chain: positions → subspaces → seeds → unrolled Lloyd
    * loop, ending at assignment a$iters; also exposes c${iters-1}, the
    * FINAL codebook (the centroids a$iters was scored against).
    * `ePrelude`, when given, replaces the raw (p, e) source CTEs — it
    * must end by defining `e(vec_id, sub_id, spos, v)`; the ivf-pq
    * oracle uses this to train the chain on RESIDUAL values. */
  private def pqSqlChain(nSub: Int, nCodes: Int, iters: Int, dim: Int,
                         ePrelude: Option[String] = None): String = {
    val subDim = dim / nSub
    val P = graft.functions.ColumnFunctions.HashPrime
    val eDef = ePrelude.getOrElse(
      s"""p AS (
         |  SELECT vec_id, unnest(range(1, len(embedding)+1)) AS i, embedding
         |  FROM embeddings
         |), e AS (
         |  SELECT vec_id, CAST((i - 1) // $subDim AS BIGINT) AS sub_id,
         |         (i - 1) % $subDim AS spos, CAST(embedding[i] AS DOUBLE) AS v
         |  FROM p
         |)""".stripMargin)
    // seeds derive from e's OWN distinct vec_ids — the Spark twin
    // (pqCodebook) seeds from the frame it trains on, and an ePrelude
    // that restricts training (the append oracle's base-only chain)
    // must restrict seeding identically: seeding from the full table
    // would pick ids with no rows in e, which silently drop at the c0
    // join and shrink the codebook (measured: 80 of 128 rows). For the
    // full-table chains this is the identical seed set.
    val header =
      s"""WITH $eDef, seeds AS (
         |  SELECT vec_id, row_number() OVER (ORDER BY h, vec_id) - 1 AS code
         |  FROM (SELECT vec_id,
         |          (md5_number_lower('0:' || vec_id) % ${P}::UBIGINT)::BIGINT AS h
         |        FROM (SELECT DISTINCT vec_id FROM e)
         |        ORDER BY h, vec_id LIMIT $nCodes)
         |), c0 AS (
         |  SELECT e.sub_id, s.code, e.spos, e.v AS cv
         |  FROM seeds s JOIN e USING (vec_id)
         |)""".stripMargin
    val steps = (1 to iters).map { i =>
      val dist =
        s""", d$i AS (
           |  SELECT e.vec_id, e.sub_id, c.code,
           |    CAST(CAST(sum(CAST(CAST((e.v - c.cv) * (e.v - c.cv) AS VARCHAR)
           |      AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS dist
           |  FROM e JOIN c${i - 1} c ON e.sub_id = c.sub_id AND e.spos = c.spos
           |  GROUP BY 1, 2, 3
           |), a$i AS (
           |  SELECT vec_id, sub_id, code FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub_id
           |                                 ORDER BY dist, code) AS rn FROM d$i
           |  ) WHERE rn = 1
           |)""".stripMargin
      val recompute = if (i < iters)
        s""", c$i AS (
           |  SELECT e.sub_id, a.code, e.spos,
           |    CAST(CAST(sum(CAST(CAST(e.v AS VARCHAR) AS DECIMAL(38,30)))
           |      AS VARCHAR) AS DOUBLE) / count(*) AS cv
           |  FROM e JOIN a$i a ON e.vec_id = a.vec_id AND e.sub_id = a.sub_id
           |  GROUP BY 1, 2, 3
           |)""".stripMargin
      else ""
      dist + recompute
    }.mkString
    s"$header$steps"
  }

  /** Column-argument exact dot (same arithmetic as [[exactDot]]). */
  private def exactDotCols(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"),
        (x, y) => (x * y).cast("decimal(38,30)")),
      lit(java.math.BigDecimal.ZERO).cast("decimal(38,30)"),
      (acc, v) => (acc + v).cast("decimal(38,30)")).cast("double")

  /** ±1 hyperplane j, derived from the portable hash (parity of
    * hash64("j:i")) — identical in the JVM, the Spark plan, and the
    * DuckDB oracle. */
  private def hyperplane(j: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      if (Multimodal.md5Lower64Mod(s"$j:$i".getBytes("UTF-8")) % 2 == 0) 1.0 else -1.0
    }

  /** Random-hyperplane (sign) LSH near-dup pairs — the second ANN scale
    * path next to IVF: each vector's bucket is the sign pattern of
    * `nBits` exact dot products with deterministic ±1 hyperplanes;
    * cosine-similar vectors share buckets with high probability, and
    * candidate pairs come from an equality join on the bucket (never
    * all-pairs). Survivors get the exact cosine + threshold, with the
    * same two-phase refine as [[embeddingNearDup]]. */
  /** Long column whose low `nBits` bits are the hyperplane-dot signs of
    * the vector column `emb`. Sign via the cheap double fold when it's
    * safely away from zero (|double − exact| < 1e-13, so |double| >
    * 1e-6 fixes the sign); the exact decimal fold only breaks the rare
    * near-zero tie — deterministic and oracle-replicable either way.
    * Shared with TextOps.docSimilarTopK's hot-cell escalation (term
    * vectors instead of embeddings — hence the column parameter). */
  private[operators] def signBits(nBits: Int, dim: Int = 64,
                                  emb: Column = col("embedding")): Column =
    (0 until nBits).map { j =>
      val plane = typedLit(hyperplane(j, dim))
      val ad = graft.plans.GraftFunctions.dotF64(emb, plane)
      val dot = when(abs(ad) > 1e-6, ad).otherwise(exactDotCols(emb, plane))
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Banded sign-LSH candidate pairs within `cellCol` cells — the
    * shared hot-cell escalation of [[embeddingNearDup]], [[semDedup]]
    * and TextOps.docSimilarTopK: `bands` projections of `w`
    * hyperplane-sign bits each over the vector column `emb`; candidates
    * are (lo, hi) id pairs agreeing on (cell, band, band-value) for ANY
    * band, deduplicated. Pair volume is O(bands · E[subcell] · n) with
    * E[subcell] ≈ cell/2^w — linear in corpus size, never
    * all-pairs-per-cell. */
  private[operators] def bandedCellPairs(e: DataFrame, cellCol: String,
                                         idCol: String, emb: Column, dim: Int,
                                         w: Int, bands: Int): DataFrame = {
    val banded = e.withColumn("sbits", signBits(bands * w, dim, emb))
      .select(col(cellCol), col(idCol),
        explode(array((0 until bands).map(j => struct(
          lit(j).as("band"),
          shiftrightunsigned(col("sbits"), j * w)
            .bitwiseAND(lit((1L << w) - 1)).as("bval"))): _*)).as("bb"))
      .select(col(cellCol), col(idCol),
        col("bb.band").as("band"), col("bb.bval").as("bval"))
    banded.as("x").join(banded.as("y"),
        col(s"x.$cellCol") === col(s"y.$cellCol") &&
          col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("lo"), col(s"y.$idCol").as("hi"))
      .distinct()
  }

  /** Sub-cell width for the banded escalation: enough sign bits that
    * the expected refined cell is back under `maxCell`. */
  private[operators] def bandWidth(largest: Long, maxCell: Long): Int =
    math.min(math.max(1,
      math.ceil(math.log(largest.toDouble / maxCell) / math.log(2)).toInt), 16)

  def embeddingLshNearDup(spark: SparkSession, d: String, nBits: Int = 12,
                          threshold: Double = 0.4): DataFrame = {
    val e = withNorm(spark, d)
    val bucketed = e.withColumn("bucket", signBits(nBits))
    val a = bucketed.select(col("bucket"), col("vec_id").as("vec_a"),
      col("embedding").as("ea"), col("norm").as("na"))
    val b = bucketed.select(col("bucket"), col("vec_id").as("vec_b"),
      col("embedding").as("eb"), col("norm").as("nb"))
    val approxDot = graft.plans.GraftFunctions.dotF64(col("ea"), col("eb"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .filter(approxDot / (col("na") * col("nb")) >= threshold - 1e-6)
      .select(col("vec_a"), col("vec_b"),
        (exactDotCols(col("ea"), col("eb")) / (col("na") * col("nb"))).as("score"))
      .filter(col("score") >= threshold)
  }

  def embeddingLshNearDupSql(nBits: Int = 12, threshold: Double = 0.4): String = {
    val P = graft.functions.ColumnFunctions.HashPrime
    s"""WITH p AS (
       |  SELECT vec_id, unnest(range(1, len(embedding)+1)) AS i, embedding
       |  FROM embeddings
       |), v AS (
       |  SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v FROM p
       |), n AS (
       |  SELECT vec_id, sqrt(CAST(CAST(sum(CAST(CAST(v*v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE)) AS norm
       |  FROM v GROUP BY 1
       |), planes AS (
       |  SELECT j, pos,
       |         CASE WHEN (md5_number_lower(j || ':' || pos) % ${P}::UBIGINT) % 2 = 0
       |              THEN 1.0 ELSE -1.0 END AS s
       |  FROM range(0, $nBits) r(j), range(0, 64) q(pos)
       |), bits AS (
       |  SELECT v.vec_id, pl.j,
       |         CASE WHEN CAST(CAST(sum(CAST(CAST(v.v * pl.s AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) > 0
       |              THEN CAST(pow(2, pl.j) AS BIGINT) ELSE 0 END AS bit
       |  FROM v JOIN planes pl ON v.pos = pl.pos
       |  GROUP BY 1, 2
       |), buckets AS (
       |  SELECT vec_id, CAST(sum(bit) AS BIGINT) AS bucket FROM bits GROUP BY 1
       |), dots AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |         CAST(CAST(sum(CAST(CAST(va.v * vb.v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS dot
       |  FROM buckets a
       |  JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |  JOIN v va ON va.vec_id = a.vec_id
       |  JOIN v vb ON vb.vec_id = b.vec_id AND vb.pos = va.pos
       |  GROUP BY 1, 2
       |)
       |SELECT vec_a, vec_b, dot / (na.norm * nb.norm) AS score
       |FROM dots
       |JOIN n na ON vec_a = na.vec_id
       |JOIN n nb ON vec_b = nb.vec_id
       |WHERE dot / (na.norm * nb.norm) >= $threshold""".stripMargin
  }

  /** Exact within-cell pairs: equality join on the cell key, two-phase
    * refine (the cheap all-double cosine — whole-stage codegen — prunes
    * the pair stream first; the exact decimal score is computed only
    * for survivors; the 1e-6 margin dwarfs the ~1e-13 double-vs-exact
    * gap, so results are identical to the unprefiltered form). Pair
    * volume is quadratic in the largest cell — callers must bound the
    * cell size ([[embeddingNearDup]]'s chooser does). */
  private def cellNearDup(e: DataFrame, cellCols: Seq[String],
                          threshold: Double): DataFrame = {
    val a = e.select((cellCols.map(col) :+ col("vec_id").as("vec_a") :+
      col("embedding").as("ea") :+ col("norm").as("na")): _*)
    val b = e.select((cellCols.map(col) :+ col("vec_id").as("vec_b") :+
      col("embedding").as("eb") :+ col("norm").as("nb")): _*)
    val approxDot = graft.plans.GraftFunctions.dotF64(col("ea"), col("eb"))
    a.join(b, cellCols)
      .filter(col("vec_a") < col("vec_b"))
      .filter(approxDot / (col("na") * col("nb")) >= threshold - 1e-6)
      .select(col("vec_a"), col("vec_b"),
        (exactDot("ea", "eb") / (col("na") * col("nb"))).as("score"))
      .filter(col("score") >= threshold)
  }

  /** Embedding-cosine near-duplicate pairs — the fourth dedup flavor
    * (brief: "embedding-cosine near-dup"), with a statistics-driven
    * bound on the within-cell quadratic (VERDICT r3 #1):
    *
    *  - when the LARGEST label cell holds ≤ `maxCell` vectors, pairs
    *    come from the exact within-cell equality join (quadratic, but
    *    provably ≤ C(maxCell, 2) pairs per cell — the small/medium-SF
    *    regime, and the branch the DuckDB oracle replicates exactly);
    *  - when any cell exceeds the cap, each cell is REFINED by banded
    *    sign-LSH: `nBands` projections of `w` hyperplane-sign bits
    *    each, `w = ceil(log2(largest/maxCell))`, candidates = pairs
    *    agreeing on (label, band, band-value) for ANY band, verified
    *    with the same exact cosine. Expected sub-cell size ≈
    *    cell/2^w ≤ maxCell, so the pair stream is O(nBands · maxCell ·
    *    n) — LINEAR in corpus size, never all-pairs-per-cell. Recall
    *    for a pair at cosine s is 1 − (1 − p^w)^nBands with
    *    p = 1 − acos(s)/π (≈ 0.93+ for true near-dups s ≥ 0.9 at
    *    w = 8, 8 bands) — a documented index trade, exactly like
    *    [[annIvfTopK]]'s nprobe recall.
    *
    * Both branches score survivors with the exact decimal cosine, so
    * any pair BOTH would emit carries an identical score. (This corpus
    * plants no embedding dups — max within-cell cosine is ≈0.47 — so
    * the default threshold surfaces "most similar" pairs; detection of
    * true dups and the banded branch are covered by tests with crafted
    * vectors and a forced cap.)
    *
    * The pair relation is session-memoized (the minhash_lsh pairCache
    * rationale): it is sliver-sized, deterministic, and consumed by
    * several operators per session — embedding_neardup itself,
    * [[embeddingClusters]]'s count-then-cluster (which would otherwise
    * evaluate the cell-stats job and the pair join twice per call —
    * ADVICE r8), and repeated bench passes. */
  def embeddingNearDup(spark: SparkSession, d: String, threshold: Double = 0.4,
                       maxCell: Long = 4096, nBands: Int = 8): DataFrame =
    nearDupPairCache.getOrBuild((spark, d, threshold, maxCell, nBands))(
      embeddingNearDupCompute(spark, d, threshold, maxCell, nBands).persist())

  private val nearDupPairCache = new graft.SessionMemo[
    (SparkSession, String, Double, Long, Int), DataFrame]("embedding_neardup")

  private def embeddingNearDupCompute(spark: SparkSession, d: String,
                                      threshold: Double, maxCell: Long,
                                      nBands: Int): DataFrame = {
    val e = withNorm(spark, d)
    // one tiny stats job (ngramJaccard-chooser pattern): cells per
    // label, max — at 100 TB this is a map-side-combined count, and the
    // answer decides which physical plan runs
    val largest = e.groupBy("label").count()
      .agg(coalesce(max("count"), lit(0L))).head().getLong(0)
    if (largest <= maxCell) cellNearDup(e, Seq("label"), threshold)
    else {
      val w = bandWidth(largest, maxCell)
      val bands = math.min(nBands, 64 / w)
      val cand = bandedCellPairs(e, "label", "vec_id", col("embedding"), 64, w, bands)
        .select(col("lo").as("vec_a"), col("hi").as("vec_b"))
      val withVecs = cand
        .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
          col("norm").as("na")), "vec_a")
        .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
          col("norm").as("nb")), "vec_b")
      val approxDot = graft.plans.GraftFunctions.dotF64(col("ea"), col("eb"))
      withVecs
        .filter(approxDot / (col("na") * col("nb")) >= threshold - 1e-6)
        .select(col("vec_a"), col("vec_b"),
          (exactDot("ea", "eb") / (col("na") * col("nb"))).as("score"))
        .filter(col("score") >= threshold)
    }
  }

  def embeddingNearDupSql(threshold: Double = 0.4): String =
    s"""WITH p AS (
       |  SELECT vec_id, label, unnest(range(1, len(embedding)+1)) AS i, embedding
       |  FROM embeddings
       |), v AS (
       |  SELECT vec_id, label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v FROM p
       |), n AS (
       |  SELECT vec_id, sqrt(CAST(CAST(sum(CAST(CAST(v*v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE)) AS norm
       |  FROM v GROUP BY 1
       |), dots AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |         CAST(CAST(sum(CAST(CAST(a.v * b.v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS dot
       |  FROM v a JOIN v b ON a.label = b.label AND a.pos = b.pos
       |                   AND a.vec_id < b.vec_id
       |  GROUP BY 1, 2
       |)
       |SELECT vec_a, vec_b, dot / (na.norm * nb.norm) AS score
       |FROM dots
       |JOIN n na ON vec_a = na.vec_id
       |JOIN n nb ON vec_b = nb.vec_id
       |WHERE dot / (na.norm * nb.norm) >= $threshold""".stripMargin

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", arXiv:2303.09540):
    * semantic deduplication over a TRAINED partition of the embedding
    * space — cluster with the same ⌈√n⌉-list Lloyd quantizer as
    * [[knnGraph]] (the session-memoized [[ivfTrainFull]] index, so a
    * session sharing knn_graph / ann_ivf_trained pays training once),
    * then within each cluster drop every vector that has an earlier
    * cluster-mate (lower vec_id) at cosine ≥ `threshold`. Output is a
    * per-vector verdict relation (vec_id, list_id, verdict, dup_of,
    * score): `drop` rows carry their smallest-id qualifying mate and
    * that pair's exact cosine; `keep` rows carry nulls.
    *
    * Contract notes vs the paper: the paper keeps one *random* (or
    * farthest-from-centroid) member per ε-ball; this keeps the
    * smallest vec_id — deterministic, oracle-checkable, and the same
    * keep-first rule every dedup operator here uses. The default
    * threshold is tuned to this synthetic corpus (no planted embedding
    * dups; within-cell cosines top out near 0.5) — production SemDeDup
    * runs at ≈ 0.95+.
    *
    * Scale: the quadratic is confined within trained cells, and the
    * cell count grows as √n, so per-cell membership stays ≈ √n and the
    * pair stream is O(n^1.5) TOTAL — never all-pairs. (Contrast
    * [[embeddingNearDup]], whose cells are the static label partition
    * refined by sign-LSH; here cell granularity follows the corpus.)
    * Pair scoring preranks with the codegen'd double kernel and
    * exact-decimal-rescores only survivors inside the 1e-6 margin —
    * the same identity argument as [[annCosineTopK]]. One hot-cell
    * shuffle (AQE skew-split pinned for the same join shape in
    * SkewSpec); everything else is broadcast or map-side. */
  def semDedup(spark: SparkSession, d: String, threshold: Double = 0.4,
               nlists: Int = 0, iters: Int = 2,
               maxCell: Long = 4096, nBands: Int = 8): DataFrame = {
    val raw = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val nl = if (nlists > 0) nlists
      else math.max(8, math.ceil(math.sqrt(raw.count().toDouble)).toInt)
    val assign = ivfTrainFull(spark, d, nl, iters)._1
    val e = withNorm(spark, d)
      .select(col("vec_id"), col("embedding"), col("norm"))
      .join(assign, "vec_id")
    // degenerate-corpus bound (round 8): a topically homogeneous corpus
    // collapses Lloyd cells regardless of their ceil(sqrt(n)) count and
    // the within-cell join goes quadratic in the hot cell — the same
    // stats-driven chooser as embeddingNearDup decides the physical
    // plan from one tiny count over the memoized assignment, and
    // beyond maxCell hot cells are REFINED by banded sign-LSH
    // (bandedCellPairs), bounding pairs at O(nBands·maxCell·n) with the
    // documented recall trade; both branches share the exact rescore
    val largest = e.groupBy("list_id").count()
      .agg(coalesce(max("count"), lit(0L))).head().getLong(0)
    val approx = graft.plans.GraftFunctions.dotF64(col("ea"), col("eb")) /
      (col("na") * col("nb"))
    val rawPairs = if (largest <= maxCell) {
      val a = e.select(col("list_id"), col("vec_id").as("dup_of"),
        col("embedding").as("ea"), col("norm").as("na"))
      val b = e.select(col("list_id"), col("vec_id"),
        col("embedding").as("eb"), col("norm").as("nb"))
      a.join(b, "list_id").filter(col("dup_of") < col("vec_id"))
    } else {
      val w = bandWidth(largest, maxCell)
      val bands = math.min(nBands, 64 / w)
      bandedCellPairs(e, "list_id", "vec_id", col("embedding"), 64, w, bands)
        .select(col("lo").as("dup_of"), col("hi").as("vec_id"))
        .join(e.select(col("vec_id").as("dup_of"), col("embedding").as("ea"),
          col("norm").as("na")), "dup_of")
        .join(e.select(col("vec_id"), col("embedding").as("eb"),
          col("norm").as("nb")), "vec_id")
    }
    val pairs = rawPairs
      .filter(approx >= threshold - 1e-6)
      .select(col("vec_id"),
        col("dup_of"), (exactDot("ea", "eb") / (col("na") * col("nb"))).as("score"))
      .filter(col("score") >= threshold)
    // smallest qualifying mate + its score in one agg: dup_of is unique
    // within the group, so the struct min is the (min dup_of) row
    val best = pairs.groupBy("vec_id")
      .agg(min(struct(col("dup_of"), col("score"))).as("m"))
      .select(col("vec_id"), col("m.dup_of").as("dup_of"),
        col("m.score").as("score"))
    e.select(col("vec_id"), col("list_id")).join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("list_id"),
        when(col("dup_of").isNull, lit("keep")).otherwise(lit("drop")).as("verdict"),
        col("dup_of"), col("score"))
  }

  /** DuckDB twin of [[semDedup]]: same dynamic-⌈√n⌉ Lloyd chain as
    * [[knnGraphSql]], within-cluster a<b pair dots through the
    * assignment CTE, smallest-mate pick as a rank-1 window. */
  def semDedupSql(threshold: Double = 0.4, iters: Int = 2): String =
    s"""WITH snl AS (
       |  SELECT GREATEST(8, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS nlists
       |  FROM embeddings
       |), ${ivfChainSqlFromDynamic("(SELECT nlists FROM snl)", iters, "sd",
            s"""SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
               |  FROM (SELECT vec_id, unnest(range(1, len(embedding)+1)) AS i, embedding
               |        FROM embeddings)""".stripMargin)},
       | n AS (
       |  SELECT vec_id, sqrt(CAST(CAST(sum(CAST(CAST(v*v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE)) AS norm
       |  FROM sde GROUP BY 1
       |), dots AS (
       |  SELECT b.vec_id AS vec_id, a.vec_id AS dup_of,
       |         CAST(CAST(sum(CAST(CAST(a.v * b.v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS dot
       |  FROM sde a
       |  JOIN sda$iters ma ON ma.vec_id = a.vec_id
       |  JOIN sda$iters mb ON mb.list_id = ma.list_id AND mb.vec_id > ma.vec_id
       |  JOIN sde b ON b.vec_id = mb.vec_id AND b.pos = a.pos
       |  GROUP BY 1, 2
       |), scored AS (
       |  SELECT dots.vec_id AS vec_id, dots.dup_of AS dup_of,
       |         dot / (na.norm * nb.norm) AS score
       |  FROM dots
       |  JOIN n na ON dots.dup_of = na.vec_id
       |  JOIN n nb ON dots.vec_id = nb.vec_id
       |  WHERE dot / (na.norm * nb.norm) >= $threshold
       |), best AS (
       |  SELECT vec_id, dup_of, score FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dup_of) AS rn
       |    FROM scored
       |  ) WHERE rn = 1
       |)
       |SELECT m.vec_id, m.list_id,
       |       CASE WHEN best.dup_of IS NULL THEN 'keep' ELSE 'drop' END AS verdict,
       |       best.dup_of, best.score
       |FROM sda$iters m LEFT JOIN best ON m.vec_id = best.vec_id""".stripMargin

  def annIvfTopKSql(k: Int = 5, nQueries: Int = 10, nprobe: Int = 2): String =
    s"""WITH p AS (
       |  SELECT vec_id, label, unnest(range(1, len(embedding)+1)) AS i, embedding
       |  FROM embeddings
       |), v AS (
       |  SELECT vec_id, label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v FROM p
       |), n AS (
       |  SELECT vec_id, sqrt(CAST(CAST(sum(CAST(CAST(v*v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE)) AS norm
       |  FROM v GROUP BY 1
       |), cent AS (
       |  SELECT label, pos,
       |         CAST(CAST(sum(CAST(CAST(v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) / count(*) AS cv
       |  FROM v GROUP BY 1, 2
       |), cn AS (
       |  SELECT label, sqrt(CAST(CAST(sum(CAST(CAST(cv*cv AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE)) AS cnorm
       |  FROM cent GROUP BY 1
       |), qc AS (
       |  SELECT q.vec_id AS query_id, cent.label,
       |         CAST(CAST(sum(CAST(CAST(q.v * cent.cv AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS dot
       |  FROM v q JOIN cent ON q.pos = cent.pos
       |  WHERE q.vec_id < $nQueries
       |  GROUP BY 1, 2
       |), cscore AS (
       |  SELECT query_id, qc.label, dot / (n.norm * cn.cnorm) AS cscore
       |  FROM qc JOIN cn ON qc.label = cn.label JOIN n ON query_id = n.vec_id
       |), probed AS (
       |  SELECT query_id, label FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY cscore DESC, label) AS pr
       |    FROM cscore
       |  ) WHERE pr <= $nprobe
       |), dots AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         CAST(CAST(sum(CAST(CAST(q.v * c.v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS dot
       |  FROM v q
       |  JOIN probed pb ON pb.query_id = q.vec_id
       |  JOIN v c ON c.label = pb.label AND c.pos = q.pos AND c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $nQueries
       |  GROUP BY 1, 2
       |), scored AS (
       |  SELECT query_id, neighbor_id, dot / (qn.norm * cnn.norm) AS score
       |  FROM dots
       |  JOIN n qn ON query_id = qn.vec_id
       |  JOIN n cnn ON neighbor_id = cnn.vec_id
       |)
       |SELECT query_id, neighbor_id, score, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY score DESC, neighbor_id) AS rank
       |  FROM scored
       |) WHERE rank <= $k""".stripMargin

  /** DuckDB twin of [[annIvfTopKTrained]]: the [[ivfChainSqlFrom]]
    * Lloyd unroll replaces the label column, probing centroids are the
    * exact means of the FINAL assignment cells (ivfTopKImpl's recipe),
    * then the identical probe/score/rank body as [[annIvfTopKSql]]. */
  def annIvfTopKTrainedSql(k: Int = 5, nQueries: Int = 10, nprobe: Int = 2,
                           nlists: Int = 8, iters: Int = 2): String =
    s"""WITH ${ivfChainSqlFrom(nlists, iters, "tr",
          s"""SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
             |  FROM (SELECT vec_id, unnest(range(1, len(embedding)+1)) AS i, embedding
             |        FROM embeddings)""".stripMargin)},
       | n AS (
       |  SELECT vec_id, sqrt(CAST(CAST(sum(CAST(CAST(v*v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE)) AS norm
       |  FROM tre GROUP BY 1
       |), cent AS (
       |  SELECT a.list_id, e.pos,
       |         CAST(CAST(sum(CAST(CAST(e.v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) / count(*) AS cv
       |  FROM tre e JOIN tra$iters a USING (vec_id) GROUP BY 1, 2
       |), cn AS (
       |  SELECT list_id, sqrt(CAST(CAST(sum(CAST(CAST(cv*cv AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE)) AS cnorm
       |  FROM cent GROUP BY 1
       |), qc AS (
       |  SELECT q.vec_id AS query_id, cent.list_id,
       |         CAST(CAST(sum(CAST(CAST(q.v * cent.cv AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS dot
       |  FROM tre q JOIN cent ON q.pos = cent.pos
       |  WHERE q.vec_id < $nQueries
       |  GROUP BY 1, 2
       |), cscore AS (
       |  SELECT query_id, qc.list_id, dot / (n.norm * cn.cnorm) AS cscore
       |  FROM qc JOIN cn ON qc.list_id = cn.list_id JOIN n ON query_id = n.vec_id
       |), probed AS (
       |  SELECT query_id, list_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY cscore DESC, list_id) AS pr
       |    FROM cscore
       |  ) WHERE pr <= $nprobe
       |), dots AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         CAST(CAST(sum(CAST(CAST(q.v * c.v AS VARCHAR) AS DECIMAL(38,30))) AS VARCHAR) AS DOUBLE) AS dot
       |  FROM tre q
       |  JOIN probed pb ON pb.query_id = q.vec_id
       |  JOIN tra$iters a ON a.list_id = pb.list_id
       |  JOIN tre c ON c.vec_id = a.vec_id AND c.pos = q.pos AND c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $nQueries
       |  GROUP BY 1, 2
       |), scored AS (
       |  SELECT query_id, neighbor_id, dot / (qn.norm * cnn.norm) AS score
       |  FROM dots
       |  JOIN n qn ON query_id = qn.vec_id
       |  JOIN n cnn ON neighbor_id = cnn.vec_id
       |)
       |SELECT query_id, neighbor_id, score, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY score DESC, neighbor_id) AS rank
       |  FROM scored
       |) WHERE rank <= $k""".stripMargin
}
