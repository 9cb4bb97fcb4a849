package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.ColumnFunctions.HashPrime

/** Multimodal-column plumbing (builder brief): image/audio/video
  * payloads are opaque BINARY columns with typed metadata; decode /
  * feature-extraction runs as partition-batched JVM functions over the
  * bytes (`mapPartitions` — the Scala analog of `mapInPandas` batches).
  *
  * The container ships no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB (clearly marked below): features are derived from
  * the payload's portable content hash, not real pixels. Everything
  * around it — binary schema, partition batching, feature shape,
  * metadata typing — is the real production plumbing and is tested,
  * including bit-parity of the JVM hash with the SQL/oracle hash.
  */
object Multimodal {

  /** JVM twin of ColumnFunctions.md5Lower64 ∘ mod HashPrime: lower 64
    * bits of md5 (little-endian) mod the 63-bit prime. */
  def md5Lower64Mod(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val bi = new java.math.BigInteger(1,
      (8 until 16).map(i => md(15 - (i - 8))).toArray) // bytes 8..15 reversed
    bi.mod(java.math.BigInteger.valueOf(HashPrime)).longValueExact()
  }

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int, height: Int,
                           phash: Long)

  /** Attach the opaque payload column (here: the utf-8 text bytes stand
    * in for media bytes; in production this column comes from the lake). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", col("text").cast("binary"))
        .withColumn("mime", lit("image/stub"))

  /** ??? STUB decode ??? — a real implementation would decode pixels
    * here (javax.imageio / ffmpeg bindings, absent in this container).
    * The stub derives deterministic pseudo-features from the content
    * hash so the full pipeline (schema, batching, oracle) is testable. */
  private def decodeStub(docId: Long, payload: Array[Byte]): MediaFeatures = {
    val h = md5Lower64Mod(payload)
    MediaFeatures(docId, payload.length.toLong,
      (h % 1920L).toInt, (h % 1080L).toInt, h)
  }

  /** Batched feature extraction over the binary column. The
    * mapPartitions boundary is where a production decoder amortizes
    * per-batch setup (model load, codec init) — same shape as
    * mapInPandas batches. */
  def mediaFeatures(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    withPayload(Tables.documents(spark, d))
      .select(col("doc_id"), col("payload"))
      .as[MediaRow]
      .mapPartitions { rows => // per-partition batch: init once here
        rows.map(r => decodeStub(r.doc_id, r.payload))
      }
      .toDF()
  }

  val mediaFeaturesSql: String =
    s"""SELECT doc_id,
       |  octet_length(encode(text)) AS n_bytes,
       |  CAST((md5_number_lower(text) % ${HashPrime}::UBIGINT) % 1920 AS INTEGER) AS width,
       |  CAST((md5_number_lower(text) % ${HashPrime}::UBIGINT) % 1080 AS INTEGER) AS height,
       |  CAST(md5_number_lower(text) % ${HashPrime}::UBIGINT AS BIGINT) AS phash
       |FROM documents""".stripMargin

  /** ??? STUB frame sampler ??? — production: demux + decode n frames
    * per video payload; stub: n deterministic per-frame hashes. The
    * output shape (one row per sampled frame, frame index + features)
    * is the real contract a training pipeline consumes. */
  def sampleFrames(spark: SparkSession, d: String, nFrames: Int = 4): DataFrame = {
    import spark.implicits._
    withPayload(Tables.documents(spark, d))
      .select(col("doc_id"), col("payload"))
      .as[MediaRow]
      .flatMap { r =>
        val base = md5Lower64Mod(r.payload)
        (0 until nFrames).map { i =>
          val fh = md5Lower64Mod(s"$base:$i".getBytes("UTF-8"))
          (r.doc_id, i, fh)
        }
      }
      .toDF("doc_id", "frame_idx", "frame_hash")
  }
}
