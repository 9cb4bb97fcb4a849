package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.{BigDecimal => JBigDecimal, BigInteger}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Accumulator for [[CovGram]]: the exact upper-triangle second-moment
  * state of a fixed-dimension embedding stream — row count, per-dim
  * Σx, and per-(i≤j) Σ(x_i·x_j), every sum an EXACT scale-30 decimal
  * (order-free, so partial buffers merge associatively like any other
  * aggregation state). `dim` is -1 until the first row fixes it. */
final class CovGramBuf(var dim: Int, var n: Long,
                       var sumDim: Array[JBigDecimal],
                       var sumXY: Array[JBigDecimal]) {
  def this() = this(-1, 0L, null, null)
  def init(d: Int): Unit = {
    dim = d
    sumDim = Array.fill(d)(JBigDecimal.ZERO)
    sumXY = Array.fill(d * (d + 1) / 2)(JBigDecimal.ZERO)
  }
}

/** The covariance Gram scan as ONE aggregate (VERDICT r13 measured
  * follow-up): the d(d+1)/2 generator form of
  * [[graft.operators.Similarity.embeddingCovariance]] paid an
  * exploded row PER PAIR — 2,080 UnsafeRows and three interpreted
  * DECIMAL(38,30) hash-agg sums per input vector (41.6 M exploded
  * rows at the 10× embeddings dir), which the r14 recall sweep
  * measured as the dominant cost of the rotated-PQ train chain once
  * the matvec kernel removed the rotation-apply cost. This kernel
  * folds the whole upper triangle per input row inside ONE
  * aggregation buffer: no explode, no per-pair shuffle rows — the
  * single exchange moves one (count + d + d(d+1)/2)-sum buffer per
  * map partition, the exact partial-aggregation shape the generator
  * form approximated with 2,080 hash groups.
  *
  * ARITHMETIC CONTRACT (bit-parity with the generator form, pinned in
  * SimilaritySpec): each element and each product routes through
  * Spark's own double→DECIMAL(38,30) cast (`Decimal(x)` +
  * `changePrecision(38,30)` — the shortest-decimal-representation
  * HALF_UP rounding `CAST(x AS DECIMAL(38,30))` performs), sums
  * accumulate EXACTLY at scale 30 (Spark's decimal Sum does the same:
  * exact adds, one final precision check), the final sum re-checks
  * precision ≤ 38, and the output doubles evaluate in the generator
  * form's fixed operation order: mean = Σx→double / n,
  * cov = Σxy→double / n − (Σx→double / n)·(Σy→double / n). The DuckDB
  * oracle (`embeddingCovarianceSql`) is UNCHANGED — exact decimal
  * sums are order-free, so both engines land the same doubles.
  *
  * Two documented fail-fast deviations, both only reachable on inputs
  * that are already data bugs (the generator form silently produced
  * partial triangles / skewed counts there): a null ELEMENT inside a
  * vector, and a vector whose length differs from the first row's.
  * Whole-null rows are skipped exactly as the generator form skipped
  * them (no pairs, no count). */
case class CovGram(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CovGramBuf]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def prettyName: String = "cov_gram"
  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("di", LongType, nullable = false),
    StructField("dj", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("mean_i", DoubleType, nullable = false),
    StructField("mean_j", DoubleType, nullable = false),
    StructField("cov", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> (cast float embeddings first), got $other")
  }

  override def createAggregationBuffer(): CovGramBuf = new CovGramBuf()

  /** Spark's CAST(double AS DECIMAL(38,30)) exactly: shortest decimal
    * representation, HALF_UP to scale 30. */
  private def dec30(x: Double): JBigDecimal = {
    val d = org.apache.spark.sql.types.Decimal(x)
    if (!d.changePrecision(38, 30))
      throw new ArithmeticException(
        s"$prettyName: value $x does not fit DECIMAL(38,30)")
    d.toJavaBigDecimal
  }

  override def update(buf: CovGramBuf, input: InternalRow): CovGramBuf = {
    val v = child.eval(input)
    if (v == null) return buf // generator form: null row → no pairs, no count
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val d = arr.numElements()
    if (d == 0) return buf // generator form: empty array → no pairs
    if (buf.dim < 0) buf.init(d)
    else if (d != buf.dim)
      throw new IllegalArgumentException(
        s"$prettyName: ragged embedding column — saw length $d after length " +
          s"${buf.dim}; covariance over mixed dimensionalities is a data bug " +
          "(the replaced generator form silently averaged partial triangles here)")
    val x = new Array[Double](d)
    var i = 0
    while (i < d) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"$prettyName: null element at dimension $i — scrub null embedding " +
            "elements upstream; a partial vector has no covariance contribution")
      x(i) = arr.getDouble(i)
      i += 1
    }
    buf.n += 1
    i = 0
    var t = 0
    while (i < d) {
      val xi = x(i)
      buf.sumDim(i) = buf.sumDim(i).add(dec30(xi))
      var j = i
      while (j < d) {
        buf.sumXY(t) = buf.sumXY(t).add(dec30(xi * x(j)))
        j += 1; t += 1
      }
      i += 1
    }
    buf
  }

  override def merge(b1: CovGramBuf, b2: CovGramBuf): CovGramBuf = {
    if (b2.dim < 0) return b1
    if (b1.dim < 0) return b2
    if (b1.dim != b2.dim)
      throw new IllegalArgumentException(
        s"$prettyName: merging buffers of dimension ${b1.dim} and ${b2.dim}")
    b1.n += b2.n
    var i = 0
    while (i < b1.sumDim.length) { b1.sumDim(i) = b1.sumDim(i).add(b2.sumDim(i)); i += 1 }
    i = 0
    while (i < b1.sumXY.length) { b1.sumXY(i) = b1.sumXY(i).add(b2.sumXY(i)); i += 1 }
    b1
  }

  /** Decimal sum → double exactly as `sum(...decimal...).cast("double")`:
    * re-check the (38,30) bound Spark's Sum enforces at eval, then the
    * same BigDecimal→double conversion the Cast performs. */
  private def sumToDouble(s: JBigDecimal): Double = {
    if (s.precision > 38)
      throw new ArithmeticException(
        s"$prettyName: sum overflows DECIMAL(38,30) — the generator form " +
          "would null out here; shard the corpus before the covariance scan")
    s.doubleValue
  }

  override def eval(buf: CovGramBuf): Any = {
    if (buf.dim < 0) return new GenericArrayData(Array.empty[Any])
    val d = buf.dim
    val n = buf.n
    val meanDim = new Array[Double](d)
    var i = 0
    while (i < d) { meanDim(i) = sumToDouble(buf.sumDim(i)) / n; i += 1 }
    val rows = new Array[Any](d * (d + 1) / 2)
    i = 0
    var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val cov = sumToDouble(buf.sumXY(t)) / n - meanDim(i) * meanDim(j)
        rows(t) = InternalRow(i.toLong, j.toLong, n, meanDim(i), meanDim(j), cov)
        j += 1; t += 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: CovGramBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.dim)
    out.writeLong(buf.n)
    if (buf.dim >= 0) {
      def writeDec(v: JBigDecimal): Unit = {
        val b = v.unscaledValue.toByteArray
        out.writeInt(b.length); out.write(b)
      }
      buf.sumDim.foreach(writeDec)
      buf.sumXY.foreach(writeDec)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CovGramBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val dim = in.readInt()
    val n = in.readLong()
    val buf = new CovGramBuf()
    if (dim >= 0) {
      buf.dim = dim
      buf.n = n
      def readDec(): JBigDecimal = {
        val b = new Array[Byte](in.readInt()); in.readFully(b)
        new JBigDecimal(new BigInteger(b), 30)
      }
      buf.sumDim = Array.fill(dim)(readDec())
      buf.sumXY = Array.fill(dim * (dim + 1) / 2)(readDec())
    } else buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CovGram =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovGram =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CovGram =
    copy(child = newChild)
}
