package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The repo's portable 64-bit hash pair as NATIVE SQL functions —
  * `graft_hash_lo(tag, s)` / `graft_hash_hi(tag, s)`: the (lower,
  * upper) little-endian 64-bit halves of md5("<tag>:" + s), each mod
  * the 63-bit HashPrime. Bit-identical to
  * `ColumnFunctions.hash64Pair` (the md5/conv/substring column chain —
  * pinned by a SurfaceSpec equality test over real grams) and to
  * DuckDB's `md5_number_lower/_upper … % p`, so every sketch family
  * (minhash bands, cms, bloom) becomes REACHABLE FROM PURE SQL TEXT:
  * `bloom_state(graft_hash_lo('bl', gram), graft_hash_hi('bl', gram))`
  * is a complete oracle-replayable pipeline with no DataFrame code.
  *
  * One md5 per call vs the column chain's one md5 + 16 substring/conv
  * nodes — the JVM kernel is also the FASTER form of the same hash. */
object GraftHash {
  private val P = java.math.BigInteger.valueOf(
    graft.functions.ColumnFunctions.HashPrime)

  private def digest(tag: UTF8String, s: UTF8String): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(tag.getBytes)
    md.update(':'.toByte)
    md.update(s.getBytes)
    md.digest()
  }

  /** Little-endian long from md5 bytes [from, from+8), mod p. */
  private def leMod(md: Array[Byte], from: Int): Long = {
    val be = new Array[Byte](8)
    var i = 0
    while (i < 8) { be(i) = md(from + 7 - i); i += 1 }
    new java.math.BigInteger(1, be).mod(P).longValueExact()
  }

  def lo(tag: UTF8String, s: UTF8String): Long = leMod(digest(tag, s), 8)
  def hi(tag: UTF8String, s: UTF8String): Long = leMod(digest(tag, s), 0)
}

abstract class Hash64Base extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING tag, STRING value), got $other")
    }
}

/** `graft_hash_lo(tag, s)` — lower half of the portable pair. */
case class Hash64Lo(left: Expression, right: Expression) extends Hash64Base {
  override def prettyName: String = "graft_hash_lo"
  override protected def nullSafeEval(t: Any, s: Any): Any =
    GraftHash.lo(t.asInstanceOf[UTF8String], s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s) => s"graft.plans.GraftHash.lo($t, $s)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Hash64Lo =
    copy(left = l, right = r)
}

/** `graft_hash_hi(tag, s)` — upper half of the portable pair. */
case class Hash64Hi(left: Expression, right: Expression) extends Hash64Base {
  override def prettyName: String = "graft_hash_hi"
  override protected def nullSafeEval(t: Any, s: Any): Any =
    GraftHash.hi(t.asInstanceOf[UTF8String], s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s) => s"graft.plans.GraftHash.hi($t, $s)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Hash64Hi =
    copy(left = l, right = r)
}
