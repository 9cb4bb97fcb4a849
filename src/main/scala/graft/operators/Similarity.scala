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
  * both sides) before the decimal cast. The position-explode dot product keeps everything relational —
  * the scalar zip_with fold ([[cosine]]) is the map-side form for
  * pipelines that don't need bit-parity with an external oracle.
  */
object Similarity {

  /** Scalar cosine similarity of two float-array columns — zip_with +
    * aggregate fold, fully codegen-compatible; use this inside other
    * pipelines. (Not the oracle-parity form: fold order is
    * element-order, fine for ranking, not for bit-compare.) */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = aggregate(
      zip_with(x.cast("array<double>"), y.cast("array<double>"), (p, q) => p * q),
      lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** (id, pos, v) long-form view of the vectors. */
  private def vals(spark: SparkSession, d: String): DataFrame =
    Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("pos", "fv")))
      .select(col("vec_id"), col("label"), col("pos"), col("fv").cast("double").as("v"))

  private def decSum(c: Column): Column =
    sum(c.cast("decimal(38,30)")).cast("double")

  /** Exact L2 norms per vector. */
  private def norms(v: DataFrame): DataFrame =
    v.groupBy("vec_id").agg(sqrt(decSum(col("v") * col("v"))).as("norm"))

  /** Brute-force exact cosine top-k: vectors with vec_id < nQueries are
    * the query set, every other vector is a candidate. */
  def annCosineTopK(spark: SparkSession, d: String, k: Int = 5, nQueries: Int = 10): DataFrame = {
    val v = vals(spark, d)
    val n = norms(v)
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("pos"), col("v").as("qv"))
    // the query side is tiny by construction → broadcast it: the
    // candidate scan streams once with a map-side hash join + partial
    // agg instead of shuffling 64-key position partitions
    val dots = v.select(col("vec_id").as("neighbor_id"), col("pos"), col("v").as("cv"))
      .join(broadcast(q), "pos")
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(decSum(col("qv") * col("cv")).as("dot"))
    val scored = dots
      .join(n.select(col("vec_id").as("query_id"), col("norm").as("qn")), "query_id")
      .join(n.select(col("vec_id").as("neighbor_id"), col("norm").as("cn")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        (col("dot") / (col("qn") * col("cn"))).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  def annCosineTopKSql(k: Int = 5, nQueries: Int = 10): String =
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
       |  WHERE q.vec_id < $nQueries
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
                 nprobe: Int = 2): DataFrame = {
    val v = vals(spark, d)
    val n = norms(v)
    // centroid long-form: exact mean per (label, pos), then its norm
    val cent = v.groupBy("label", "pos")
      .agg((decSum(col("v")) / count(lit(1))).as("cv"))
    val centNorm = cent.groupBy("label")
      .agg(sqrt(decSum(col("cv") * col("cv"))).as("cnorm"))
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("pos"), col("v").as("qv"))
    // query ↔ centroid scores → top-nprobe labels per query
    val qc = q.join(cent, "pos")
      .groupBy("query_id", "label")
      .agg(decSum(col("qv") * col("cv")).as("dot"))
      .join(centNorm, "label")
      .join(n.select(col("vec_id").as("query_id"), col("norm").as("qn")), "query_id")
      .select(col("query_id"), col("label"),
        (col("dot") / (col("qn") * col("cnorm"))).as("cscore"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("cscore").desc, col("label"))
    val probed = qc.withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe).select("query_id", "label")
    // brute-force scoring restricted to probed cells; probed (queries ×
    // nprobe rows) and the query vectors are broadcast-sized
    val cand = v.select(col("vec_id").as("neighbor_id"), col("label"), col("pos"), col("v").as("cv"))
      .join(broadcast(probed), "label")
      .filter(col("neighbor_id") =!= col("query_id"))
    val dots = cand.join(broadcast(q), Seq("query_id", "pos"))
      .groupBy("query_id", "neighbor_id")
      .agg(decSum(col("qv") * col("cv")).as("dot"))
    val scored = dots
      .join(n.select(col("vec_id").as("query_id"), col("norm").as("qn")), "query_id")
      .join(n.select(col("vec_id").as("neighbor_id"), col("norm").as("cn")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        (col("dot") / (col("qn") * col("cn"))).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs — the fourth dedup flavor
    * (brief: "embedding-cosine near-dup"). All-pairs cosine is O(n²);
    * the scale path restricts candidate pairs to the same IVF cell
    * (label), the embedding analog of LSH banding: a near-duplicate
    * pair lands in the same cell with high probability, and the scan
    * shrinks by the cell count. Exact decimal-sum scoring as above.
    * (This corpus plants no embedding dups — max within-cell cosine is
    * ≈0.47 — so the default threshold surfaces "most similar" pairs;
    * detection of true dups is covered by tests with crafted vectors.) */
  def embeddingNearDup(spark: SparkSession, d: String, threshold: Double = 0.4): DataFrame = {
    val v = vals(spark, d)
    val n = norms(v)
    val dots = v.as("a").join(v.as("b"),
        col("a.label") === col("b.label") && col("a.pos") === col("b.pos") &&
        col("a.vec_id") < col("b.vec_id"))
      .groupBy(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .agg(decSum(col("a.v") * col("b.v")).as("dot"))
    dots
      .join(n.select(col("vec_id").as("vec_a"), col("norm").as("na")), "vec_a")
      .join(n.select(col("vec_id").as("vec_b"), col("norm").as("nb")), "vec_b")
      .select(col("vec_a"), col("vec_b"), (col("dot") / (col("na") * col("nb"))).as("score"))
      .filter(col("score") >= threshold)
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
}
