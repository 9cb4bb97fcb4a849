package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Count-Min frequency sketch — the FREQUENCY member of the
  * sketch-as-column family (exact sets: [[BitmapState]]; approximate
  * sets: [[GraftTheta]]; approximate quantiles: [[GraftQSample]]; this:
  * approximate per-item counts). A d×w counter matrix answers "how
  * often did item t occur" within an additive overestimate of at most
  * εN (ε = e/w, N = total weight) from O(d·w) fixed bytes per group,
  * for ANY item cardinality — the right budget when the question is
  * "roughly how hot is this token across 100 TB" and re-scanning text
  * is off the table.
  *
  * Public lineage, cited by name: Cormode & Muthukrishnan, "An Improved
  * Data Stream Summary: The Count-Min Sketch and its Applications"
  * (J. Algorithms 2005); the d-row hash family is derived by
  * Kirsch–Mitzenmacher double hashing g_s = (lo + s·hi) mod p from the
  * repo's ONE-digest portable pair (ColumnFunctions.hash64Pair — the
  * same family the minhash signatures use), so every bucket index is
  * replayable in DuckDB (`md5_number_lower/_upper … % p`, HUGEINT
  * arithmetic) and the whole sketch is oracle-checkable: counters are
  * order-insensitive exact integer sums, NOT floating estimates.
  * Contrast [[FreqSketch]] (Misra–Gries): MG keeps candidate top-k
  * item LABELS but its retained set is arrival-order-dependent; CM is
  * deterministic data answering point queries for any probe item.
  *
  * Scale shape: `group → cms_state` gets map-side partial aggregation
  * (each map partition folds its rows into one d·w matrix), so the
  * shuffle moves O(groups · d·w·8) bytes regardless of token
  * cardinality — vs the exact tf relation's O(distinct-tokens) rows.
  * Merge is element-wise add (commutative, associative), so per-source
  * / per-day leaves stored as columns re-aggregate to any coarser
  * grain without touching text.
  *
  * Reference provenance: the reference keeps only windowed exact
  * counts (hong/hotItems HotItems.scala CountAgg) and must re-read the
  * stream for every new question; counts held as mergeable sketch DATA
  * answer post-hoc per-item probes at any rollup grain.
  */
object GraftCms {

  /** Default geometry: 4 rows × 2048 buckets = 64 KiB per sketch;
    * overestimate ≤ (e/2048)·N ≈ 0.13 %·N each probe with failure
    * probability e⁻⁴ ≈ 1.8 % per probe. */
  val DefaultDepth = 4
  val DefaultWidth = 2048

  val HashPrime: Long = graft.functions.ColumnFunctions.HashPrime

  /** (a + b) mod p for a, b ∈ [0, p): the true sum is < 2p < 2⁶⁴, so
    * it wraps at most once in unsigned 64-bit — one wrapping add and
    * one unsigned conditional subtract, no wide arithmetic. */
  @inline private def addModP(a: Long, b: Long): Long = {
    val t = a + b // wrapping; unsigned value is exact (< 2p < 2^64)
    if (java.lang.Long.compareUnsigned(t, HashPrime) >= 0) t - HashPrime else t
  }

  /** Mutable aggregation state: row-major d×w long counters. */
  final class Buf(val depth: Int, val width: Int) {
    val counters: Array[Long] = new Array[Long](depth * width)

    /** Fold one item occurrence (weight w) given its portable hash
      * pair: row s uses bucket g_s mod width, g_s = (lo + s·hi) mod p
      * built incrementally with [[addModP]]. */
    def insert(lo: Long, hi: Long, w: Long): Unit = {
      GraftBloom.checkHashPair(lo, hi)
      var g = lo
      var s = 0
      while (s < depth) {
        counters(s * width + (g % width).toInt) += w
        g = addModP(g, hi)
        s += 1
      }
    }

    def mergeIn(o: Buf): Unit = {
      require(o.depth == depth && o.width == width,
        s"cms_merge: geometry mismatch ($depth×$width vs ${o.depth}×${o.width})")
      var i = 0
      while (i < counters.length) { counters(i) += o.counters(i); i += 1 }
    }
  }

  /** Wire layout: int32 depth | int32 width | d·w × int64 row-major
    * counters (big-endian, the JDK ByteBuffer default). */
  def serialize(b: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * b.counters.length)
    bb.putInt(b.depth).putInt(b.width)
    var i = 0
    while (i < b.counters.length) { bb.putLong(b.counters(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new Buf(bb.getInt, bb.getInt)
    var i = 0
    while (i < b.counters.length) { b.counters(i) = bb.getLong; i += 1 }
    b
  }

  @inline private def header(bytes: Array[Byte]): (Int, Int) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    (bb.getInt, bb.getInt)
  }

  /** Add serialized counters straight into a live buffer — the
    * zero-allocation fold kernel (the `GraftBitmaps.orInto` pattern):
    * the merge-aggregate's hot path runs once per INPUT ROW, so a
    * per-row 64 KiB Buf allocation scales GC with row count. */
  def addInto(b: Buf, bytes: Array[Byte]): Unit = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.getInt(0) == b.depth && bb.getInt(4) == b.width,
      s"cms_merge: geometry mismatch (${b.depth}×${b.width} vs ${bb.getInt(0)}×${bb.getInt(4)})")
    var i = 0
    while (i < b.counters.length) { b.counters(i) += bb.getLong(8 + 8 * i); i += 1 }
  }

  @inline private def counterAt(bytes: Array[Byte], idx: Int): Long =
    java.nio.ByteBuffer.wrap(bytes).getLong(8 + 8 * idx)

  /** Point estimate for the item with portable hash pair (lo, hi):
    * min over rows of the item's bucket — never an underestimate,
    * over by at most the colliding mass in the LIGHTEST row. Reads the
    * d counters straight from the serialized bytes, zero allocation. */
  def est(bytes: Array[Byte], lo: Long, hi: Long): Long = {
    GraftBloom.checkHashPair(lo, hi)
    val (depth, width) = header(bytes)
    var g = lo
    var m = Long.MaxValue
    var s = 0
    while (s < depth) {
      val c = counterAt(bytes, s * width + (g % width).toInt)
      if (c < m) m = c
      g = addModP(g, hi)
      s += 1
    }
    m
  }

  /** Inner-product estimate min_s Σ_b A[s][b]·B[s][b] ≥ Σ_t fₐ(t)·fᵦ(t)
    * (Cormode–Muthukrishnan §4.2) — the "how similar are two token
    * mixes" kernel, from two 64 KiB columns instead of a token join.
    * Exact for the Σ-product within +ε·Nₐ·Nᵦ; caller owns the overflow
    * bound Nₐ·Nᵦ < 2⁶³ (≈ 3·10⁹ tokens a side). */
  def innerProduct(a: Array[Byte], b: Array[Byte]): Long = {
    val (depth, width) = header(a)
    val (d2, w2) = header(b)
    require(d2 == depth && w2 == width,
      s"cms_inner_product: geometry mismatch ($depth×$width vs ${d2}×$w2)")
    val ba = java.nio.ByteBuffer.wrap(a)
    val bb = java.nio.ByteBuffer.wrap(b)
    var m = Long.MaxValue
    var s = 0
    while (s < depth) {
      var dot = 0L
      var j = 0
      while (j < width) {
        val idx = 8 + 8 * (s * width + j)
        dot += ba.getLong(idx) * bb.getLong(idx)
        j += 1
      }
      if (dot < m) m = dot
      s += 1
    }
    m
  }

  /** Exact total weight folded into the sketch: every row holds the
    * full mass, so row 0's sum IS N (no estimation involved). */
  def total(bytes: Array[Byte]): Long = {
    val (_, width) = header(bytes)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var n = 0L
    var j = 0
    while (j < width) { n += bb.getLong(8 + 8 * j); j += 1 }
    n
  }

  /** Serialized merge for non-aggregate call sites (serving folds). */
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val x = deserialize(a)
    x.mergeIn(deserialize(b))
    serialize(x)
  }
}

/** Shared scaffold for the two CM aggregates. */
abstract class CmsAggBase extends TypedImperativeAggregate[GraftCms.Buf] {
  def depth: Int
  def width: Int

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): GraftCms.Buf =
    new GraftCms.Buf(depth, width)

  override def merge(b1: GraftCms.Buf, b2: GraftCms.Buf): GraftCms.Buf = {
    b1.mergeIn(b2)
    b1
  }

  override def eval(buf: GraftCms.Buf): Any = GraftCms.serialize(buf)
  override def serialize(buf: GraftCms.Buf): Array[Byte] = GraftCms.serialize(buf)
  override def deserialize(bytes: Array[Byte]): GraftCms.Buf =
    GraftCms.deserialize(bytes)
}

/** `cms_state(lo, hi [, weight])` — fold item occurrences into a
  * Count-Min sketch, where (lo, hi) is the item's PRE-COMPUTED portable
  * hash pair (ColumnFunctions.hash64Pair — codegen'd columns, one md5
  * per item instance) and weight defaults to 1. Taking the pair rather
  * than the raw string keeps the digest in whole-stage codegen and the
  * aggregate allocation-free per row. */
case class CmsState(
    lo: Expression,
    hi: Expression,
    weight: Expression,
    depth: Int = GraftCms.DefaultDepth,
    width: Int = GraftCms.DefaultWidth,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends CmsAggBase
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  require(depth >= 1 && width >= 2, "cms_state needs depth ≥ 1, width ≥ 2")

  override def prettyName: String = "cms_state"
  override def first: Expression = lo
  override def second: Expression = hi
  override def third: Expression = weight

  override def checkInputDataTypes(): TypeCheckResult =
    (lo.dataType, hi.dataType, weight.dataType) match {
      case (LongType, LongType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cms_state requires (BIGINT lo, BIGINT hi [, integral weight]), got $other " +
          "(derive lo/hi with the portable hash pair, e.g. hash64Pair(col, tag))")
    }

  override def update(buf: GraftCms.Buf, input: InternalRow): GraftCms.Buf = {
    val l = lo.eval(input)
    val h = hi.eval(input)
    val w = weight.eval(input)
    if (l != null && h != null && w != null) {
      val wl = w match {
        case x: java.lang.Long => x.longValue()
        case x: java.lang.Integer => x.longValue()
      }
      buf.insert(l.asInstanceOf[Long], h.asInstanceOf[Long], wl)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): CmsState =
    copy(lo = f, hi = s, weight = t)
}

/** `cms_merge(sk)` — element-wise-add fold of serialized CM sketches:
  * re-aggregates per-source / per-day sketch leaves to a coarser grain
  * exactly (counter addition commutes — the merged sketch is
  * byte-identical to one built over the union). Geometry follows the
  * first input; mismatched geometries fail fast. */
case class CmsMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends CmsAggBase
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def prettyName: String = "cms_merge"
  // empty-buffer sentinel geometry; real geometry adopted on first merge
  override def depth: Int = GraftCms.DefaultDepth
  override def width: Int = GraftCms.DefaultWidth

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_merge requires BINARY sketch bytes, got $other")
  }

  private def isZero(b: GraftCms.Buf): Boolean = {
    var i = 0
    while (i < b.counters.length) {
      if (b.counters(i) != 0L) return false
      i += 1
    }
    true
  }

  override def merge(b1: GraftCms.Buf, b2: GraftCms.Buf): GraftCms.Buf =
    // adopt the other side's geometry while this buffer is still empty
    // (covers non-default-geometry inputs folding into a fresh buffer)
    if ((b1.depth != b2.depth || b1.width != b2.width) && isZero(b1)) b2
    else if ((b1.depth != b2.depth || b1.width != b2.width) && isZero(b2)) b1
    else { b1.mergeIn(b2); b1 }

  override def update(buf: GraftCms.Buf, input: InternalRow): GraftCms.Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val bytes = v.asInstanceOf[Array[Byte]]
    val bb = java.nio.ByteBuffer.wrap(bytes)
    // geometry adoption needs a real Buf (first non-empty input only);
    // every subsequent row folds allocation-free off the bytes
    if ((bb.getInt(0) != buf.depth || bb.getInt(4) != buf.width) && isZero(buf))
      GraftCms.deserialize(bytes)
    else { GraftCms.addInto(buf, bytes); buf }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMerge =
    copy(child = newChild)
}

/** `cms_est(sk, lo, hi)` — point count estimate for the item with
  * portable hash pair (lo, hi): min over rows, ≥ true count, over by
  * ≤ (e/width)·N with probability 1 − e^(−depth). Codegen'd static
  * call reading counters straight from the bytes. */
case class CmsEst(sk: Expression, lo: Expression, hi: Expression)
  extends TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_est"
  override def first: Expression = sk
  override def second: Expression = lo
  override def third: Expression = hi

  override def checkInputDataTypes(): TypeCheckResult =
    (sk.dataType, lo.dataType, hi.dataType) match {
      case (BinaryType, LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cms_est requires (BINARY sketch, BIGINT lo, BIGINT hi), got $other")
    }

  override protected def nullSafeEval(s: Any, l: Any, h: Any): Any =
    GraftCms.est(s.asInstanceOf[Array[Byte]],
      l.asInstanceOf[Long], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, l, h) => s"graft.plans.GraftCms.est($s, $l, $h)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): CmsEst =
    copy(sk = f, lo = s, hi = t)
}

/** `cms_inner_product(a, b)` — Σ_t fₐ(t)·fᵦ(t) estimate of two
  * sketches: the token-mix affinity of two corpora WITHOUT a token
  * join. Never an underestimate. */
case class CmsInnerProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_inner_product"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_inner_product requires (BINARY, BINARY) sketch bytes, " +
        s"got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftCms.innerProduct(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.GraftCms.innerProduct($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsInnerProduct =
    copy(left = l, right = r)
}

/** `cms_total(sk)` — the EXACT total weight folded into a sketch
  * (every row holds the full mass; row 0's sum is N, no estimation). */
case class CmsTotal(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_total"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_total requires BINARY sketch bytes, got $other")
  }

  override protected def nullSafeEval(bytes: Any): Any =
    GraftCms.total(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GraftCms.total($c)")

  override protected def withNewChildInternal(newChild: Expression): CmsTotal =
    copy(child = newChild)
}
