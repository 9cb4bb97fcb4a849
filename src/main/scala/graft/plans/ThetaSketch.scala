package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, LongType}

/** KMV/theta distinct sketch — the APPROXIMATE, unbounded-domain twin
  * of the exact [[BitmapState]] set algebra. The exact bitmaps answer
  * card/AND/OR/ANDNOT questions exactly but pay O(domain/8) bytes per
  * cell (sharded to stay bounded); a theta sketch answers the same
  * four questions within ~1/√k relative error from a FIXED 8·k-byte
  * sample, for any id domain, with no shard bookkeeping — the right
  * trade at 100 TB when the question is "roughly how many" rather
  * than "exactly which".
  *
  * Public lineage, cited by name: the k-minimum-values estimator of
  * Beyer et al. (SIGMOD'07, "On Synopses for Distinct-Value Estimation
  * Under Multiset Operations") and the generalized theta-sketch
  * framework of Dasgupta et al. (the Apache DataSketches line): a
  * sketch is (θ, S) with S = the distinct hash values < θ retained so
  * far; |S|/θ̂ (θ̂ = θ/2⁶³ ∈ (0,1]) estimates the distinct count, and
  * because every sketch is a uniform sample of the SAME hash space
  * below its own θ, set expressions evaluate by intersecting/merging
  * the samples below θ' = min(θₐ, θᵦ) and scaling by θ'. While θ is
  * still at its 2⁶³ ceiling the sketch is in EXACT mode (it has seen
  * ≤ k distinct values and |S| IS the count) — estimates degrade to
  * sampling only past k distinct, the same "exact small, approximate
  * huge" posture as Spark's own HLL++ but with set algebra.
  *
  * This file implements the sketch as Catalyst aggregates/scalars over
  * a serialized little-struct layout (see [[GraftTheta]]), mirroring
  * the bitmap family surface: `theta_state` (aggregate → bytes),
  * `theta_merge` (OR-fold aggregate over bytes → bytes), and the
  * scalar estimators `theta_card` / `theta_and_card` / `theta_or_card`
  * / `theta_andnot_card`. Reference provenance: the reference's
  * UniqueVisitor_03_Bloom.scala:96-176 solves daily UV with a lossy
  * Redis bloom-bitmap; held as mergeable DATA with honest error bars,
  * the same budget also answers every cross-day set question.
  */
object GraftTheta {

  /** Default retained-sample budget: 4096 hashes = 32 KiB ceiling per
    * group, relative standard error ≈ 1/√k ≈ 1.6 %. */
  val DefaultK = 4096

  private val TwoPow63 = 9223372036854775808.0 // 2^63 as double

  /** SplitMix64 finalizer (public domain, Steele et al. "Fast
    * Splittable Pseudorandom Number Generators") — the id→hash mix.
    * Output masked to [0, 2⁶³−1): the sketch keeps values strictly
    * below θ whose ceiling is Long.MaxValue, so the (measure-zero)
    * topmost value is folded down one to stay representable. */
  def hash63(id: Long): Long = {
    var z = id + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= (z >>> 31)
    val h = z >>> 1
    if (h == Long.MaxValue) h - 1 else h
  }

  /** Mutable aggregation state: the ≤ k smallest distinct hashes seen,
    * all strictly below `theta`. Insert keeps the invariant by
    * evicting the current maximum once size exceeds k and clamping
    * θ to the evicted value — the KMV "(k+1)-th smallest" rule. */
  final class Buf(val k: Int) {
    var theta: Long = Long.MaxValue
    val set: java.util.TreeSet[java.lang.Long] = new java.util.TreeSet()

    def insertHash(h: Long): Unit =
      if (h < theta && set.add(h) && set.size > k) {
        val m = set.last()
        set.remove(m)
        theta = m
      }

    def insertId(id: Long): Unit = insertHash(hash63(id))

    /** Exact |S| while θ is at the ceiling; |S|/θ̂ past it. */
    def estimate: Double =
      if (theta == Long.MaxValue) set.size.toDouble
      else set.size.toDouble * (TwoPow63 / theta)

    def mergeIn(oTheta: Long, oValues: Array[Long]): Unit = {
      if (oTheta < theta) {
        theta = oTheta
        // drop own retained values no longer below the tighter θ
        set.tailSet(theta, /*inclusive=*/ true).clear()
      }
      var i = 0
      while (i < oValues.length) { insertHash(oValues(i)); i += 1 }
    }
  }

  /** Wire layout: int32 k | int64 theta | int32 n | n × int64 sorted
    * ascending (big-endian, the JDK ByteBuffer default). */
  def serialize(b: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + 8 * b.set.size)
    bb.putInt(b.k).putLong(b.theta).putInt(b.set.size)
    val it = b.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new Buf(bb.getInt)
    b.theta = bb.getLong
    var n = bb.getInt
    while (n > 0) { b.set.add(bb.getLong); n -= 1 }
    b
  }

  private final case class View(k: Int, theta: Long, values: Array[Long])

  private def view(bytes: Array[Byte]): View = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val theta = bb.getLong
    val n = bb.getInt
    val vs = new Array[Long](n)
    var i = 0
    while (i < n) { vs(i) = bb.getLong; i += 1 }
    View(k, theta, vs)
  }

  private def scale(count: Long, theta: Long): Double =
    if (theta == Long.MaxValue) count.toDouble
    else count.toDouble * (TwoPow63 / theta)

  /** Distinct-count estimate of one serialized sketch. */
  def card(bytes: Array[Byte]): Double = {
    val v = view(bytes)
    scale(v.values.length.toLong, v.theta)
  }

  /** |A ∩ B| estimate: common retained hashes below min(θₐ, θᵦ),
    * scaled by that θ — both value arrays arrive sorted, so one merge
    * walk, zero allocation. */
  def andCard(a: Array[Byte], b: Array[Byte]): Double = {
    val (x, y) = (view(a), view(b))
    val t = math.min(x.theta, y.theta)
    var i = 0; var j = 0; var c = 0L
    while (i < x.values.length && j < y.values.length &&
        x.values(i) < t && y.values(j) < t) {
      val d = java.lang.Long.compare(x.values(i), y.values(j))
      if (d == 0) { c += 1; i += 1; j += 1 }
      else if (d < 0) i += 1
      else j += 1
    }
    scale(c, t)
  }

  /** |A ∪ B| estimate: distinct retained hashes of either side below
    * min(θₐ, θᵦ), scaled. (The scalar two-sketch form; for unions
    * across many rows use the [[ThetaMerge]] aggregate, which also
    * re-trims to k.) */
  def orCard(a: Array[Byte], b: Array[Byte]): Double = {
    val (x, y) = (view(a), view(b))
    val t = math.min(x.theta, y.theta)
    var i = 0; var j = 0; var c = 0L
    while ((i < x.values.length && x.values(i) < t) ||
        (j < y.values.length && y.values(j) < t)) {
      val xi = if (i < x.values.length && x.values(i) < t) x.values(i) else Long.MaxValue
      val yj = if (j < y.values.length && y.values(j) < t) y.values(j) else Long.MaxValue
      val d = java.lang.Long.compare(xi, yj)
      c += 1
      if (d == 0) { i += 1; j += 1 }
      else if (d < 0) i += 1
      else j += 1
    }
    scale(c, t)
  }

  /** |A \ B| estimate: retained hashes of A below min(θₐ, θᵦ) absent
    * from B's sample — valid because below θᵦ, B's sample is exhaustive
    * over B's hashed elements. */
  def andNotCard(a: Array[Byte], b: Array[Byte]): Double = {
    val (x, y) = (view(a), view(b))
    val t = math.min(x.theta, y.theta)
    var i = 0; var j = 0; var c = 0L
    while (i < x.values.length && x.values(i) < t) {
      while (j < y.values.length && y.values(j) < x.values(i)) j += 1
      if (j >= y.values.length || y.values(j) != x.values(i)) c += 1
      i += 1
    }
    scale(c, t)
  }

  /** Serialized merge of two serialized sketches (for generated code /
    * non-aggregate call sites). */
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val x = deserialize(a)
    val y = view(b)
    x.mergeIn(y.theta, y.values)
    serialize(x)
  }
}

/** Shared scaffold for the two theta aggregates. */
abstract class ThetaAggBase extends TypedImperativeAggregate[GraftTheta.Buf]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  def child: Expression
  def k: Int

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): GraftTheta.Buf = new GraftTheta.Buf(k)

  override def merge(b1: GraftTheta.Buf, b2: GraftTheta.Buf): GraftTheta.Buf = {
    val it = b2.set.iterator()
    val vs = new Array[Long](b2.set.size)
    var i = 0
    while (it.hasNext) { vs(i) = it.next(); i += 1 }
    b1.mergeIn(b2.theta, vs)
    b1
  }

  override def eval(buf: GraftTheta.Buf): Any = GraftTheta.serialize(buf)

  override def serialize(buf: GraftTheta.Buf): Array[Byte] = GraftTheta.serialize(buf)
  override def deserialize(bytes: Array[Byte]): GraftTheta.Buf =
    GraftTheta.deserialize(bytes)
}

/** `theta_state(id [, k])` — build a theta sketch of an integral id
  * column: the sketch-as-column emitter, O(k) memory per group at ANY
  * id cardinality (contrast [[BitmapState]]'s exact-but-sharded
  * domain). Merge = sample union with re-trim, so partial aggregation
  * and map-side combine hold. */
case class ThetaState(
    child: Expression,
    k: Int = GraftTheta.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  require(k > 1, "theta_state sample budget k must exceed 1")

  override def prettyName: String = "theta_state"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_state requires an integral id column, got $other " +
        "(hash strings first, e.g. hash64(col))")
  }

  override def update(buf: GraftTheta.Buf, input: InternalRow): GraftTheta.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val id = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      buf.insertId(id)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaState =
    copy(child = newChild)
}

/** `theta_merge(sk)` — union-fold aggregate over serialized sketches:
  * the approximate twin of [[BitmapMergeCard]]'s OR-fold, emitting the
  * MERGED SKETCH (compose with `theta_card` for the estimate, or keep
  * folding). The buffer's k follows the first input sketch — inputs
  * built with one budget merge losslessly; mixed budgets degrade to
  * the tightest θ, which is exactly the theta-framework contract. */
case class ThetaMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  override def prettyName: String = "theta_merge"
  override def k: Int = GraftTheta.DefaultK

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_merge requires BINARY sketch bytes, got $other")
  }

  private def isEmpty(b: GraftTheta.Buf): Boolean =
    b.theta == Long.MaxValue && b.set.isEmpty

  /** The buffer starts at DefaultK; the budget FOLLOWS the first
    * non-empty input (the doc contract, and the [[CmsMerge]]/
    * [[BloomMerge]] convention) — without this, folding k=16384 leaves
    * through a k=4096 buffer silently re-trims the sample and doubles
    * the error. A true mixture of budgets fails fast. */
  override def merge(b1: GraftTheta.Buf, b2: GraftTheta.Buf): GraftTheta.Buf =
    if (b1.k != b2.k && isEmpty(b1)) b2
    else if (b1.k != b2.k && isEmpty(b2)) b1
    else {
      require(b1.k == b2.k, s"theta_merge: k mismatch (${b1.k} vs ${b2.k})")
      super.merge(b1, b2)
    }

  override def update(buf: GraftTheta.Buf, input: InternalRow): GraftTheta.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val o = GraftTheta.deserialize(v.asInstanceOf[Array[Byte]])
      merge(buf, o)
    } else buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaMerge =
    copy(child = newChild)
}

/** `theta_card(sk)` — distinct-count estimate of a serialized sketch
  * (exact while the sketch has seen ≤ k distinct ids). Codegen'd
  * single static call, same shape as [[BitmapCard]]. */
case class ThetaCard(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_card"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_card requires BINARY sketch bytes, got $other")
  }

  override protected def nullSafeEval(bytes: Any): Any =
    GraftTheta.card(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GraftTheta.card($c)")

  override protected def withNewChildInternal(newChild: Expression): ThetaCard =
    copy(child = newChild)
}

/** Scaffold for the three binary theta estimators — each a codegen'd
  * static call into the sorted-merge kernels of [[GraftTheta]]. */
abstract class ThetaBinaryCard extends BinaryExpression {
  override def dataType: DataType = DoubleType
  protected def kernel: String

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, BINARY) sketch bytes, " +
        s"got (${left.dataType}, ${right.dataType})")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.GraftTheta.$kernel($a, $b)")
}

/** `theta_and_card(a, b)` — |A ∩ B| estimate of two sketches. */
case class ThetaAndCard(left: Expression, right: Expression) extends ThetaBinaryCard {
  override def prettyName: String = "theta_and_card"
  override protected def kernel: String = "andCard"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftTheta.andCard(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaAndCard =
    copy(left = l, right = r)
}

/** `theta_or_card(a, b)` — |A ∪ B| estimate of two sketches. */
case class ThetaOrCard(left: Expression, right: Expression) extends ThetaBinaryCard {
  override def prettyName: String = "theta_or_card"
  override protected def kernel: String = "orCard"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftTheta.orCard(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaOrCard =
    copy(left = l, right = r)
}

/** `theta_andnot_card(a, b)` — |A \ B| estimate of two sketches. */
case class ThetaAndNotCard(left: Expression, right: Expression) extends ThetaBinaryCard {
  override def prettyName: String = "theta_andnot_card"
  override protected def kernel: String = "andNotCard"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftTheta.andNotCard(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaAndNotCard =
    copy(left = l, right = r)
}
