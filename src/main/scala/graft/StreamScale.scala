package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming-face scale spot-run (VERDICT r9 #4) — dev tooling, never
  * run by the driver. Drives the three state-shaped streaming faces
  * over a make_scale_dir corpus (default the 10× dir) through the REAL
  * file source (micro-batches arrive as day/slice files in event-time
  * order, the production ingest shape — no MemoryStream, no driver
  * addData), with the state store chosen by `SPARK_GRAFT_STATE_STORE`
  * (set `rocksdb` for the off-heap posture this run exists to
  * evidence), and prints one JSON line per face: rows, wall seconds,
  * micro-batch count, peak state rows/bytes from
  * `StreamingQueryProgress.stateOperators`, and the RocksDB custom
  * metrics (memory usage, SST file bytes) when that provider is live.
  *
  * Faces and why these three (the state-heaviest contracts):
  *  - `topn_update`: watermarked windowed counts + update-mode fold —
  *    store state is (window × user) rows; eviction under watermark is
  *    what bounds it, and the run proves it holds at 10× volume.
  *  - `semdedup_stream`: the chained two-stateful-aggregate pipeline
  *    with a broadcast model and cell-sized stream-static fanout — the
  *    most plan-complex stateful face.
  *  - `snapshot_partitioned`: driver-checkpoint retention (no state
  *    store) — per-batch trigger durations must stay FLAT as total
  *    ingest grows; peak block-store bytes ≈ the retained partitions.
  */
object StreamScale {
  private def metricsLine(face: String, rows: Long, wallSec: Double,
                          q: StreamingQuery, extra: String = ""): String = {
    val progs = q.recentProgress
    val sos = progs.flatMap(_.stateOperators)
    val maxRows = if (sos.isEmpty) 0L else sos.map(_.numRowsTotal).max
    val maxMem = if (sos.isEmpty) 0L else sos.map(_.memoryUsedBytes).max
    // RocksDB-provider custom metrics, last progress wins (cumulative)
    val rocks = sos.lastOption.map { so =>
      import scala.jdk.CollectionConverters._
      so.customMetrics.asScala.collect {
        case (k, v) if k.startsWith("rocksdb") &&
          (k.contains("Memory") || k.contains("SstFile") ||
            k.contains("TotalBytes")) => s""""$k":$v"""
      }.toSeq.sorted.mkString("{", ",", "}")
    }.getOrElse("{}")
    val durs = progs.map(p =>
      Option(p.durationMs.get("triggerExecution")).map(_.longValue()).getOrElse(0L))
      .filter(_ > 0)
    s"""{"face":"$face","rows":$rows,"wall_sec":${f"$wallSec%.1f"},""" +
      s""""batches":${durs.length},"batch_ms":${durs.mkString("[", ",", "]")},""" +
      s""""max_state_rows":$maxRows,"max_state_bytes":$maxMem,"rocksdb":$rocks$extra}"""
  }

  private def writeSlices(df: DataFrame, sliceCol: String, dir: String): Int = {
    // sequential single-file writes: the file source orders batches by
    // modification time, so slices arrive in event-time order and the
    // watermark can evict as it would in production
    val slices = df.select(sliceCol).distinct().orderBy(sliceCol)
      .collect().map(_.get(0))
    slices.zipWithIndex.foreach { case (s, i) =>
      df.filter(col(sliceCol) <=> lit(s)).coalesce(1).write
        .mode(if (i == 0) "overwrite" else "append").parquet(dir)
      Thread.sleep(1100) // distinct mtimes → deterministic arrival order
    }
    slices.length
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfbig10")
    val work = sys.env.getOrElse("SPARK_GRAFT_STREAM_WORK", "/tmp/stream_scale")
    val spark = GraftSession("graft-stream-scale")
    import graft.operators.EventAnalytics
    import graft.sources.Tables
    import graft.streaming.StreamingJobs

    val provider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass").getOrElse("hdfs-default")
    println(s"""{"provider":"$provider","sf":"$sfDir"}""")

    // ---- shared event ingest: one file per day, arriving in order ----
    val ev = Tables.events(spark, sfDir)
      // watermarks require TIMESTAMP (not NTZ); session TZ is UTC so the
      // instant is unchanged
      .withColumn("ts", col("ts").cast("timestamp"))
      .select(col("ts"), col("user_id"), col("event_type"), col("event_id"), col("value"))
      .withColumn("day", EventAnalytics.dayKey(col("ts")))
    val evDir = s"$work/events"
    writeSlices(ev, "day", evDir)
    val evSchema = ev.schema

    // ---- face 1: watermarked windowed counts + update-mode fold ----
    locally {
      val stream = spark.readStream.schema(evSchema)
        .option("maxFilesPerTrigger", 1).parquet(evDir)
      val counts = StreamingJobs.windowedCounts(
        stream, "1 hour", None, Seq(col("user_id")), wmDelay = "1 hour")
      @volatile var emitted = 0L
      val t0 = System.nanoTime()
      val q = StreamingJobs.topNUpdate(counts) { (batch, _) =>
        emitted += batch.count()
      }
      try q.processAllAvailable() finally q.stop()
      println(metricsLine("topn_update", emitted, (System.nanoTime() - t0) / 1e9, q))
    }

    // ---- face 2: chained-stateful streaming SemDeDup ----
    locally {
      val corpus = Tables.embeddings(spark, sfDir)
      // arrivals: a 1-in-29 slice of the corpus (live gating against the
      // full reference model is the production shape; arrival count sets
      // state size, corpus size sets model+fanout cost)
      val vecs = corpus.filter(col("vec_id") % 29 === 0)
        .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("vec_id") % 240))
        .withColumn("slice", (col("vec_id") % 240 / 60).cast("int"))
      val vDir = s"$work/vecs"
      writeSlices(vecs.select(col("ts"), col("vec_id"), col("embedding"), col("slice")),
        "slice", vDir)
      // watermark-flush sentinel: one far-future arrival so the last
      // real windows close (append mode emits on watermark passage)
      vecs.limit(1)
        .withColumn("ts", timestamp_seconds(lit(1700000000L + 7200)))
        .withColumn("slice", lit(99))
        .select(col("ts"), col("vec_id"), col("embedding"), col("slice"))
        .coalesce(1).write.mode("append").parquet(vDir)
      val nArrivals = vecs.count()
      val stream = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(
          vecs.select("ts", "vec_id", "embedding", "slice").schema.fields))
        .option("maxFilesPerTrigger", 1).parquet(vDir)
      @volatile var emitted = 0L
      val t0 = System.nanoTime()
      val out = StreamingJobs.streamingSemDedup(stream, corpus)
      val q = out.writeStream.outputMode("append")
        .foreachBatch { (b: DataFrame, _: Long) => emitted += b.count() }
        .start()
      try q.processAllAvailable() finally q.stop()
      println(metricsLine("semdedup_stream", emitted, (System.nanoTime() - t0) / 1e9, q,
        s""","arrivals":$nArrivals"""))
    }

    // ---- face 3: retention-partitioned snapshot (daily leaf grain) ----
    locally {
      val stream = spark.readStream.schema(evSchema)
        .option("maxFilesPerTrigger", 1).parquet(evDir)
      @volatile var leafRows = 0L
      val t0 = System.nanoTime()
      val q = StreamingJobs.snapshotUpdatePartitioned(
        stream, "day", EventAnalytics.eventDailyLeafFrom,
        retainPartitions = 3)({ (res, _) => leafRows += res.count() })
      try q.processAllAvailable() finally q.stop()
      val storage = spark.sparkContext.getRDDStorageInfo
      val cachedBytes = storage.map(_.memSize).sum
      println(metricsLine("snapshot_partitioned", leafRows,
        (System.nanoTime() - t0) / 1e9, q,
        s""","retained_block_bytes":$cachedBytes,"retained_rdds":${storage.length}"""))
    }

    spark.stop()
  }
}
