package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable ANN-index artifacts — the trained IVF index as PARQUET.
  *
  * The session memo (graft.SessionMemo) makes a session pay each
  * training once; this store makes the FLEET pay it once: the ingest
  * pipeline trains and `save`s, every serving job `load`s — the
  * standard production split (FAISS/ScaNN ship the same train-offline
  * / mmap-online contract; here the artifact is two plain parquet
  * relations any engine can read, not an opaque binary).
  *
  * Layout under `path/`:
  *   - `assign/`    (vec_id BIGINT, list_id BIGINT) — one row per vector
  *   - `centroids/` (list_id BIGINT, cemb ARRAY<DOUBLE>, cnorm DOUBLE)
  *     — the probing centroids with exact norms
  *   - `meta/`      one row: format version + training params + counts
  *
  * Training is deterministic (hash-seeded Lloyd, exact decimal means),
  * so a saved index is REPRODUCIBLE: re-training from the same corpus
  * bit-matches the artifact, and results served from a loaded index
  * hash-match results served from a fresh train — pinned by the
  * `ann_ivf_persisted` query sharing `ann_ivf_trained`'s DuckDB oracle.
  *
  * Scale: the assignment is n rows of two BIGINTs (KBs per million
  * vectors in parquet), the centroid table nlists rows — loading is a
  * partition-pruned scan, never a retrain; at 100 TB the save runs in
  * the ingest DAG and serving clusters mount the path read-only.
  */
object IndexStore {

  /** Bumped on any layout/semantics change; load fails fast on skew. */
  val FormatVersion = 1

  def saveIvf(spark: SparkSession, assign: DataFrame, centroids: DataFrame,
              path: String, nlists: Int, iters: Int): Unit = {
    assign.select(col("vec_id"), col("list_id"))
      .write.mode("overwrite").parquet(s"$path/assign")
    centroids.select(col("list_id"), col("cemb"), col("cnorm"))
      .write.mode("overwrite").parquet(s"$path/centroids")
    val nVecs = spark.read.parquet(s"$path/assign").count()
    val nCents = spark.read.parquet(s"$path/centroids").count()
    import spark.implicits._
    Seq((FormatVersion, nlists, iters, nVecs, nCents))
      .toDF("format_version", "nlists", "iters", "n_vectors", "n_centroids")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Loads and VALIDATES the artifact: wrong format version, empty
    * relations, or a centroid count that disagrees with meta all fail
    * fast with the reason — a serving job must never probe a
    * half-written or stale-layout index silently. */
  def loadIvf(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val meta = spark.read.parquet(s"$path/meta").collect()
    require(meta.length == 1, s"ivf index at $path: meta must be one row, got ${meta.length}")
    val m = meta.head
    require(m.getAs[Int]("format_version") == FormatVersion,
      s"ivf index at $path: format ${m.getAs[Int]("format_version")} != expected $FormatVersion (retrain and re-save)")
    val assign = spark.read.parquet(s"$path/assign")
    val cents = spark.read.parquet(s"$path/centroids")
    val nCents = cents.count()
    require(nCents == m.getAs[Long]("n_centroids") && nCents > 0,
      s"ivf index at $path: ${nCents} centroid rows vs meta ${m.getAs[Long]("n_centroids")}")
    (assign, cents)
  }
}
