package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed views of the driver testdata tables (TESTDATA.md) plus the
  * reference's record types re-expressed as Spark case classes
  * (reference: /root/reference src/main/scala/com/hong — see SURVEY.md §1.1).
  *
  * Scale note: all loaders are plain `spark.read.parquet` — scans get
  * column pruning + predicate pushdown from Catalyst for free; at 100 TB
  * the same call reads a partitioned table and prunes partitions.
  */
object Tables {

  /** Load one driver parquet table by name from a scale-factor dir. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame    = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame    = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame  = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame    = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame  = load(spark, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS); Spark reads it as Long via
    * spark.sql.legacy.parquet.nanosAsLong. Convert to microsecond
    * timestamp with integer division (DIV, not fp — nano epochs exceed
    * 2^53 and would lose precision in a double), matching DuckDB's
    * ns→us truncation. */
  def events(spark: SparkSession, d: String): DataFrame = {
    val df = load(spark, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _ => df
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")

  /** The documents table's contract schema — enforced on JSONL ingest
    * so a malformed feed cannot silently widen/retype columns. */
  val documentsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))

  /** JSONL document ingest — the de-facto training-corpus interchange
    * format (one JSON object per line). Schema is ENFORCED (no
    * inference pass — at 100 TB schema inference is a full extra scan);
    * malformed lines land in `_corrupt` instead of failing the job or
    * silently disappearing, so ingest QA can count and sample them.
    * Line-delimited JSON splits by newline, so a 100 TB feed
    * parallelizes like any text source. Note Spark's
    * QUERY_ONLY_CORRUPT_RECORD_COLUMN rule: a query referencing ONLY
    * `_corrupt` must cache/save the parsed frame first. */
  def documentsJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(documentsSchema.add("_corrupt", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
}

/** Record types of the reference engine (SURVEY.md §1.1), used by the
  * streaming jobs and their tests. Event time is epoch seconds (Long)
  * exactly as in the reference CSVs; `timestamp_seconds` turns it into
  * a Spark event-time column.
  */
object Records {
  // reference: hotItems/HotItems.scala:211-220
  case class UserBehavior(userId: Long, itemId: Long, categoryId: Int, behavior: String, timestamp: Long)
  case class ItemViewCount(itemId: Long, windowEnd: Long, count: Long)
  // reference: networkflow/analysis/NetworkFlowTopNPage*.scala:178-186
  case class ApacheLogEvent(ip: String, userId: String, eventTime: Long, method: String, url: String)
  case class PageViewCount(url: String, windowEnd: Long, count: Long)
  // reference: market/SimulateMarketEvenSource.scala:44-47
  case class MarketUserBehavior(userId: String, behavior: String, channel: String, timestamp: Long)
  // reference: market/AdAnalysisByProvince_BlackList.scala:158-168
  case class AdClickEvent(userId: Long, adId: Long, province: String, city: String, timestamp: Long)
  case class BlackListWarning(userId: Long, adId: Long, msg: String)
  // reference: loginmonitor/LoginFail.scala:104-106
  case class LoginEvent(userId: Long, ip: String, eventType: String, eventTime: Long)
  case class Warning(userId: Long, firstFailTime: Long, lastFailTime: Long, warningMsg: String)
  // reference: orderpay_detect/OrderTimeout_CEP.scala:102-103, OrderPayTxMatch_2Flow_Co.scala:131
  case class OrderEvent(orderId: Long, eventType: String, txId: String, eventTime: Long)
  case class OrderResult(orderId: Long, resultMsg: String)
  case class ReceiptEvent(txId: String, payChannel: String, timestamp: Long)
}

/** CSV parsers for the reference's file formats (batch or streaming:
  * the same schema works for `spark.read.csv` and `spark.readStream.csv`).
  * reference CSV shapes: SURVEY.md §2.3 / FIXTURES.md §A.
  */
object CsvSources {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.functions._

  val userBehaviorSchema: StructType = StructType(Seq(
    StructField("userId", LongType), StructField("itemId", LongType),
    StructField("categoryId", IntegerType), StructField("behavior", StringType),
    StructField("timestamp", LongType)))

  val loginEventSchema: StructType = StructType(Seq(
    StructField("userId", LongType), StructField("ip", StringType),
    StructField("eventType", StringType), StructField("eventTime", LongType)))

  val orderEventSchema: StructType = StructType(Seq(
    StructField("orderId", LongType), StructField("eventType", StringType),
    StructField("txId", StringType), StructField("eventTime", LongType)))

  val receiptEventSchema: StructType = StructType(Seq(
    StructField("txId", StringType), StructField("payChannel", StringType),
    StructField("timestamp", LongType)))

  val adClickSchema: StructType = StructType(Seq(
    StructField("userId", LongType), StructField("adId", LongType),
    StructField("province", StringType), StructField("city", StringType),
    StructField("timestamp", LongType)))

  def readUserBehavior(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(userBehaviorSchema).csv(path)
      .withColumn("ts", timestamp_seconds(col("timestamp")))

  def readLoginEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(loginEventSchema).csv(path)
      .withColumn("ts", timestamp_seconds(col("eventTime")))

  def readOrderEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(orderEventSchema).csv(path)
      .withColumn("ts", timestamp_seconds(col("eventTime")))

  def readReceiptEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(receiptEventSchema).csv(path)
      .withColumn("ts", timestamp_seconds(col("timestamp")))

  def readAdClicks(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(adClickSchema).csv(path)
      .withColumn("ts", timestamp_seconds(col("timestamp")))

  // Typed views — Dataset[CaseClass] is the engine's analog of the
  // reference's DataStream[CaseClass] (SURVEY §1.2); the extra `ts`
  // column is tolerated by as[] and available when the frame is used
  // untyped (e.g. for watermarks).
  import org.apache.spark.sql.{Dataset, Encoders, SparkSession => SS}

  def loginEvents(spark: SS, path: String): Dataset[Records.LoginEvent] =
    readLoginEvents(spark, path).as(Encoders.product[Records.LoginEvent])

  def orderEvents(spark: SS, path: String): Dataset[Records.OrderEvent] =
    readOrderEvents(spark, path).as(Encoders.product[Records.OrderEvent])

  def receiptEvents(spark: SS, path: String): Dataset[Records.ReceiptEvent] =
    readReceiptEvents(spark, path).as(Encoders.product[Records.ReceiptEvent])

  def adClickEvents(spark: SS, path: String): Dataset[Records.AdClickEvent] =
    readAdClicks(spark, path).as(Encoders.product[Records.AdClickEvent])

  def userBehavior(spark: SS, path: String): Dataset[Records.UserBehavior] =
    readUserBehavior(spark, path).as(Encoders.product[Records.UserBehavior])

  /** apache.log line parse as a frame transform (input: one string
    * column named `line`) — the same parse serves batch files, the
    * socket stream, and a Kafka value stream (SURVEY §2.3: one logical
    * format, any physical source).
    * reference: networkflow/analysis/NetworkFlowTopNPage*.scala:33-42 */
  def parseApacheLines(lines: DataFrame): DataFrame =
    lines.select(split(col("line"), " ").as("f"))
      .select(
        col("f").getItem(0).as("ip"),
        col("f").getItem(1).as("userId"),
        to_timestamp(col("f").getItem(3), "dd/MM/yyyy:HH:mm:ss").as("ts"),
        col("f").getItem(5).as("method"),
        col("f").getItem(6).as("url"))

  /** apache.log parser: space-separated, wall-format timestamp. */
  def readApacheLog(spark: SparkSession, path: String): DataFrame =
    parseApacheLines(spark.read.text(path).select(col("value").as("line")))

  /** UserBehavior CSV-line parse as a frame transform (input: one
    * string column named `line`) — the parse step the reference runs
    * on each Kafka record value (hotItems/HotItems.scala:49-56:
    * split(",") → UserBehavior). Same logical format as
    * [[readUserBehavior]], lifted to line-shaped sources (Kafka,
    * socket, generators). */
  def parseUserBehaviorLines(lines: DataFrame): DataFrame =
    lines.select(from_csv(col("line"), userBehaviorSchema,
        Map.empty[String, String]).as("r"))
      .select(col("r.*"))
      .withColumn("ts", timestamp_seconds(col("timestamp")))
}
