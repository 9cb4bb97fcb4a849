package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Bottom-k row sample with a value payload — mergeable QUANTILES as
  * data, the third leg of the sketch-as-column family ([[BitmapState]]
  * exact sets, [[GraftTheta]] approximate sets, this for approximate
  * quantiles/row counts).
  *
  * Public lineage, cited by name: bottom-k (min-hash) coordinated
  * samples of Cohen & Kaplan ("Summarizing data using bottom-k
  * sketches", PODC'07) over the same KMV/theta machinery as
  * [[GraftTheta]]: hash each row's UNIQUE key with SplitMix64 and keep
  * the k smallest hashes — a uniform, deterministic, ORDER- and
  * PARTITION-INDEPENDENT sample of the group's rows (same final state
  * for any insert/merge order, so Spark's nondeterministic partial-
  * aggregation order cannot change results — the property t-digest and
  * randomized KLL lack, and the reason this family can be HASH-checked
  * against an oracle). Each retained entry carries the row's value, so
  * the empirical quantile of the sample estimates the group quantile
  * with rank error O(1/√k), and the KMV θ estimates the group's ROW
  * COUNT for free.
  *
  * Quantiles don't sum, don't max, and don't fold — like exact
  * distincts they are non-decomposable, which is exactly why the
  * serving-fold stage split ([[graft.streaming.ServingFolds]]) needs
  * them as MERGEABLE STATE rather than finished numbers: per-leaf
  * samples OR together (sample union + re-trim) into any rollup grain.
  *
  * Quantile interpolation matches Spark's exact `percentile` (linear
  * between the two straddling order statistics at rank q·(n−1)), so in
  * exact mode (group rows ≤ k — every row retained) the estimate
  * EQUALS the exact percentile bit for bit.
  */
object GraftQSample {

  /** Default retained-sample budget: 4096 (hash, value) pairs = 64 KiB
    * ceiling per group; rank error ≈ √(q(1−q)/k) ≤ 0.8 % at the
    * median. */
  val DefaultK = 4096

  private val TwoPow63 = 9223372036854775808.0

  /** Mutable aggregation state: the ≤ k rows with smallest key-hash,
    * all with hash < theta; the KMV eviction rule of
    * [[GraftTheta.Buf]]. A (vanishingly rare, but deterministic)
    * 63-bit hash collision keeps the SMALLER value so merge order
    * cannot matter. */
  final class Buf(val k: Int) {
    var theta: Long = Long.MaxValue
    val map: java.util.TreeMap[java.lang.Long, java.lang.Double] =
      new java.util.TreeMap()

    def insertHash(h: Long, v: Double): Unit =
      if (h < theta) {
        val prev = map.get(h)
        if (prev == null || prev.doubleValue() > v) map.put(h, v)
        if (map.size > k) {
          theta = map.lastKey()
          map.remove(theta)
        }
      }

    def insertId(id: Long, v: Double): Unit =
      insertHash(GraftTheta.hash63(id), v)

    def mergeIn(oTheta: Long, hs: Array[Long], vs: Array[Double]): Unit = {
      if (oTheta < theta) {
        theta = oTheta
        map.tailMap(theta, /*inclusive=*/ true).clear()
      }
      var i = 0
      while (i < hs.length) { insertHash(hs(i), vs(i)); i += 1 }
    }

    /** KMV row-count estimate (exact while θ is at the ceiling). */
    def countEstimate: Double =
      if (theta == Long.MaxValue) map.size.toDouble
      else map.size.toDouble * (TwoPow63 / theta)
  }

  /** Wire layout: int32 k | int64 theta | int32 n | n × int64 hash
    * (ascending) | n × float64 value (hash-aligned). */
  def serialize(b: Buf): Array[Byte] = {
    val n = b.map.size
    val bb = java.nio.ByteBuffer.allocate(16 + 16 * n)
    bb.putInt(b.k).putLong(b.theta).putInt(n)
    val it = b.map.entrySet().iterator()
    val vs = new Array[Double](n)
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      vs(i) = e.getValue
      i += 1
    }
    i = 0
    while (i < n) { bb.putDouble(vs(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val (k, theta, hs, vs) = view(bytes)
    val b = new Buf(k)
    b.theta = theta
    var i = 0
    while (i < hs.length) { b.map.put(hs(i), vs(i)); i += 1 }
    b
  }

  private def view(bytes: Array[Byte]): (Int, Long, Array[Long], Array[Double]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val theta = bb.getLong
    val n = bb.getInt
    val hs = new Array[Long](n)
    val vs = new Array[Double](n)
    var i = 0
    while (i < n) { hs(i) = bb.getLong; i += 1 }
    i = 0
    while (i < n) { vs(i) = bb.getDouble; i += 1 }
    (k, theta, hs, vs)
  }

  /** Fold `o` into `b` — the ONE extraction loop every merge path
    * (state aggregate, merge aggregate, serving folds) goes through. */
  def mergeBufs(b: Buf, o: Buf): Buf = {
    val n = o.map.size
    val hs = new Array[Long](n)
    val vs = new Array[Double](n)
    val it = o.map.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      hs(i) = e.getKey
      vs(i) = e.getValue
      i += 1
    }
    b.mergeIn(o.theta, hs, vs)
    b
  }

  /** Serialized union for non-aggregate call sites — the
    * [[GraftTheta.union]]/[[GraftBloom.union]] twin. */
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    serialize(mergeBufs(deserialize(a), deserialize(b)))

  /** Empirical quantile of the retained sample — Spark `percentile`
    * interpolation (linear at rank q·(n−1)), null for an empty
    * sample. Rejects q outside [0, 1] like Spark's own percentile
    * (an out-of-range rank would otherwise index past the array deep
    * inside an executor task). */
  def quantile(bytes: Array[Byte], q: Double): Any = {
    require(q >= 0.0 && q <= 1.0,
      s"qsample_quantile: percentage q must be in [0, 1], got $q")
    val (_, _, _, vs) = view(bytes)
    if (vs.isEmpty) return null
    java.util.Arrays.sort(vs)
    val pos = q * (vs.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) vs(lo)
    else vs(lo) + (pos - lo) * (vs(hi) - vs(lo))
  }

  /** KMV row-count estimate from the serialized bytes. */
  def countEstimate(bytes: Array[Byte]): Double = {
    val (_, theta, hs, _) = view(bytes)
    if (theta == Long.MaxValue) hs.length.toDouble
    else hs.length.toDouble * (TwoPow63 / theta)
  }
}

/** `qsample_state(id, value [, k])` — build a bottom-k value sample
  * keyed on a UNIQUE row id (event_id, doc_id): mergeable quantile
  * state as a column. O(k) memory per group at any row count; merge =
  * sample union + re-trim, so partial aggregation and map-side combine
  * hold, and the result is independent of partitioning. */
case class QSampleState(
    left: Expression,
    right: Expression,
    k: Int = GraftQSample.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GraftQSample.Buf]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k > 1, "qsample_state sample budget k must exceed 1")

  override def prettyName: String = "qsample_state"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType, DoubleType | FloatType | LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"qsample_state requires (integral id, numeric value), got ($l, $r)")
    }

  override def createAggregationBuffer(): GraftQSample.Buf =
    new GraftQSample.Buf(k)

  override def update(buf: GraftQSample.Buf, input: InternalRow): GraftQSample.Buf = {
    val idv = left.eval(input)
    val vv = right.eval(input)
    if (idv != null && vv != null) {
      val id = idv match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      val v = vv match {
        case d: java.lang.Double => d.doubleValue()
        case f: java.lang.Float => f.doubleValue()
        case l: java.lang.Long => l.doubleValue()
        case i: java.lang.Integer => i.doubleValue()
      }
      buf.insertId(id, v)
    }
    buf
  }

  override def merge(b1: GraftQSample.Buf, b2: GraftQSample.Buf): GraftQSample.Buf =
    GraftQSample.mergeBufs(b1, b2)

  override def eval(buf: GraftQSample.Buf): Any = GraftQSample.serialize(buf)
  override def serialize(buf: GraftQSample.Buf): Array[Byte] =
    GraftQSample.serialize(buf)
  override def deserialize(bytes: Array[Byte]): GraftQSample.Buf =
    GraftQSample.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QSampleState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QSampleState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): QSampleState =
    copy(left = l, right = r)
}

/** `qsample_merge(sk)` — union-fold aggregate over serialized samples:
  * fold leaf-grain quantile state into any coarser grain (the serving-
  * fold move for non-decomposable quantiles). Same budget-follows-
  * input contract as [[ThetaMerge]]. */
case class QSampleMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GraftQSample.Buf]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def prettyName: String = "qsample_merge"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"qsample_merge requires BINARY sample bytes, got $other")
  }

  override def createAggregationBuffer(): GraftQSample.Buf =
    new GraftQSample.Buf(GraftQSample.DefaultK)

  override def update(buf: GraftQSample.Buf, input: InternalRow): GraftQSample.Buf = {
    val v = child.eval(input)
    if (v != null) merge(buf, GraftQSample.deserialize(v.asInstanceOf[Array[Byte]]))
    else buf
  }

  private def isEmpty(b: GraftQSample.Buf): Boolean =
    b.theta == Long.MaxValue && b.map.isEmpty

  /** The buffer starts at DefaultK; the budget FOLLOWS the first
    * non-empty input (the doc contract, and the [[CmsMerge]]/
    * [[BloomMerge]] convention) — without this, folding k=16384 leaves
    * through a k=4096 buffer silently re-trims the sample. A true
    * mixture of budgets fails fast. */
  override def merge(b1: GraftQSample.Buf, b2: GraftQSample.Buf): GraftQSample.Buf =
    if (b1.k != b2.k && isEmpty(b1)) b2
    else if (b1.k != b2.k && isEmpty(b2)) b1
    else {
      require(b1.k == b2.k, s"qsample_merge: k mismatch (${b1.k} vs ${b2.k})")
      GraftQSample.mergeBufs(b1, b2)
    }

  override def eval(buf: GraftQSample.Buf): Any = GraftQSample.serialize(buf)
  override def serialize(buf: GraftQSample.Buf): Array[Byte] =
    GraftQSample.serialize(buf)
  override def deserialize(bytes: Array[Byte]): GraftQSample.Buf =
    GraftQSample.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QSampleMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QSampleMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QSampleMerge =
    copy(child = newChild)
}

/** `qsample_quantile(sk, q)` — empirical quantile of a serialized
  * sample, Spark-`percentile` interpolation (exact-mode equality). */
case class QSampleQuantile(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "qsample_quantile"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"qsample_quantile requires (BINARY sample bytes, DOUBLE q), got ($l, $r)")
    }

  override protected def nullSafeEval(bytes: Any, q: Any): Any =
    GraftQSample.quantile(bytes.asInstanceOf[Array[Byte]],
      q.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, q) => {
      val res = ctx.freshName("res")
      s"""
         |Object $res = graft.plans.GraftQSample.quantile($b, $q);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $res).doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QSampleQuantile =
    copy(left = l, right = r)
}

/** `qsample_count(sk)` — KMV row-count estimate of a serialized
  * sample (exact while the group had ≤ k rows). */
case class QSampleCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "qsample_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"qsample_count requires BINARY sample bytes, got $other")
  }

  override protected def nullSafeEval(bytes: Any): Any =
    GraftQSample.countEstimate(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GraftQSample.countEstimate($c)")

  override protected def withNewChildInternal(newChild: Expression): QSampleCount =
    copy(child = newChild)
}
