package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 TEST DOUBLE for the Kafka source — closes the last testable
  * inch of the Kafka gap in a sandbox with no connector artifact and
  * zero egress (KafkaContractSpec's documented probe): a real
  * `TableProvider` registered under the format name `kafka-test`
  * that exposes EXACTLY [[StreamSources.kafkaRecordSchema]] and
  * validates EXACTLY the options `StreamSources.kafkaLines` plumbs
  * for the real connector (`kafka.bootstrap.servers`, `subscribe`,
  * `startingOffsets`). Driving `kafkaLines(..., format = "kafka-test")`
  * therefore runs the ENTIRE streaming path — DataSourceRegister
  * lookup, options plumbing, schema resolution, micro-batch planning,
  * offset tracking, record→line projection, downstream transforms —
  * end to end; the ONLY behavior difference from production is which
  * provider the format string resolves to.
  *
  * Records served per topic are registered by tests via [[KafkaTestProvider.setTopic]]
  * (value bytes = the registered lines; key null, partition 0, offsets
  * dense from 0, timestamp epoch — the shape the reference's replay
  * harness KafkaProducerUtil.scala:13-34 produces). Appending more
  * lines to a topic between micro-batches models a live producer:
  * `latestOffset` grows and the next batch picks up the tail. */
class KafkaTestProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kafka-test"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StreamSources.kafkaRecordSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KafkaTestTable()
}

object KafkaTestProvider {
  private val topics =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[String]]()

  /** Register (replace) the value lines the double serves for `topic`. */
  def setTopic(topic: String, lines: Seq[String]): Unit =
    topics.put(topic, lines.toVector)

  /** Append lines — a "producer" writing between micro-batches. */
  def appendTopic(topic: String, lines: Seq[String]): Unit =
    topics.merge(topic, lines.toVector, (a, b) => a ++ b)

  private[sources] def linesFor(topic: String): Vector[String] =
    Option(topics.get(topic)).getOrElse(Vector.empty)
}

private[sources] class KafkaTestTable extends Table with SupportsRead {
  override def name(): String = "kafka-test"
  override def schema(): StructType = StreamSources.kafkaRecordSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // the options the REAL connector requires must have been plumbed
    // through — a missing one is a loud failure here, as it would be
    // against a live broker
    require(options.containsKey("kafka.bootstrap.servers"),
      "kafka-test: option kafka.bootstrap.servers is required")
    val topic = options.get("subscribe")
    require(topic != null && topic.nonEmpty,
      "kafka-test: option subscribe is required")
    val starting = Option(options.get("startingOffsets")).getOrElse("latest")
    require(starting == "earliest" || starting == "latest",
      s"kafka-test: unsupported startingOffsets '$starting'")
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = StreamSources.kafkaRecordSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new KafkaTestStream(topic, starting)
      }
    }
  }
}

private[sources] case class KafkaTestOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/** Offset semantics mirror the real source: initial = earliest (0) or
  * latest (current end); each micro-batch covers [start, end) record
  * offsets of the single test partition. */
private[sources] class KafkaTestStream(topic: String, starting: String)
  extends MicroBatchStream {
  private def size: Long = KafkaTestProvider.linesFor(topic).size.toLong
  override def initialOffset(): Offset =
    KafkaTestOffset(if (starting == "earliest") 0L else size)
  override def latestOffset(): Offset = KafkaTestOffset(size)
  override def deserializeOffset(json: String): Offset =
    KafkaTestOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KafkaTestOffset].n.toInt
    val e = end.asInstanceOf[KafkaTestOffset].n.toInt
    if (e <= s) Array.empty
    else Array(KafkaTestPartition(topic, s,
      KafkaTestProvider.linesFor(topic).slice(s, e)))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new KafkaTestReaderFactory
}

/** The record slice rides INSIDE the partition descriptor (serialized
  * to the task) — executors must not depend on the driver-side topic
  * registry. */
private[sources] case class KafkaTestPartition(topic: String, startOffset: Int,
                                               values: Vector[String])
  extends InputPartition

private[sources] class KafkaTestReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val kp = p.asInstanceOf[KafkaTestPartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < kp.values.size }
      override def get(): InternalRow = InternalRow(
        null,                                   // key
        kp.values(i).getBytes("UTF-8"),         // value
        UTF8String.fromString(kp.topic),        // topic
        0,                                      // partition
        (kp.startOffset + i).toLong,            // offset
        0L,                                     // timestamp (epoch micros)
        0)                                      // timestampType
      override def close(): Unit = ()
    }
  }
}
