package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Sinks + the side-output abstraction (SURVEY §2.2).
  *
  * Flink side outputs (`OutputTag`) have no 1:1 Spark primitive; the
  * engine's pattern is the tagged union: stateful operators emit an
  * `outcome`/tag column (see Machines.TxMatchMachine,
  * BlacklistMachine), and [[splitByTag]] / [[routeByTag]] fan the one
  * result out to per-tag destinations — in batch as plain filtered
  * frames, in streaming inside foreachBatch (single state pass, n
  * sinks, no duplicated computation).
  */
object Sinks {

  /** Batch side-output splitter: one tagged frame → per-tag frames. */
  def splitByTag(df: DataFrame, tagCol: String, tags: Seq[String]): Map[String, DataFrame] =
    tags.map(t => t -> df.filter(df(tagCol) === t)).toMap

  /** Streaming side-output router: run the tagged stream once per
    * micro-batch and hand each tag's slice to its writer (the batch is
    * cached so n tags don't recompute the state pass n times). */
  def routeByTag(stream: DataFrame, tagCol: String,
                 writers: Map[String, DataFrame => Unit]): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      batch.persist()
      try writers.foreach { case (tag, write) => write(batch.filter(batch(tagCol) === tag)) }
      finally batch.unpersist()
    }

  /** Console sink (the reference's `print()` everywhere). */
  def console(stream: DataFrame, mode: String = "append"): StreamingQuery =
    stream.writeStream.outputMode(mode).format("console").start()

  /** Named in-memory table sink — the test/debug sink. */
  def memory(stream: DataFrame, name: String, mode: String = "append"): StreamingQuery =
    stream.writeStream.outputMode(mode).format("memory").queryName(name).start()

  /** Producer-side projection to the Kafka writer contract (`value`
    * required; `key`/`topic` optional columns) — shared by
    * [[kafkaLines]] and the broker-less contract test. */
  def toKafkaRecords(df: DataFrame): DataFrame =
    df.select(df("line").cast("string").as("value"))

  /** Kafka producer harness (reference hotItems/KafkaProducerUtil
    * .scala:13-34: replay a fixture file into a topic line by line) —
    * writes the `line` column as record values. ENVIRONMENT NOTE: no
    * Kafka connector/broker artifact exists in this sandbox (see
    * StreamSources.kafkaLines); KafkaContractSpec verifies the
    * [[toKafkaRecords]] projection and the missing-datasource failure
    * mode instead of a live produce. */
  def kafkaLines(df: DataFrame, brokers: String, topic: String): Unit =
    toKafkaRecords(df)
      .write.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .save()

  /** Bucketed managed-table writer — the co-located-join path (brief:
    * "bucketing for co-located joins"): two tables bucketed by the same
    * key into the same bucket count join with ZERO exchanges — at
    * 100 TB this removes the dominant shuffle from every fact⋈fact join
    * that repeats a key (orders⋈customer on custkey, orders⋈lineitem on
    * orderkey). sortBy makes the sort-merge join scan-ready too. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Partitioned parquet appender — the durable batch sink. */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("append")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** JSONL exporter — the training-corpus delivery format (one JSON
    * object per line, optionally partitioned, e.g. by the
    * dataset_split assignment or lang). Files compress per partition;
    * at 100 TB the partition columns are the ones downstream trainers
    * shard on. */
  def jsonl(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).json(path)
  }
}
