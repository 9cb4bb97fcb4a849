package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.Machines._
import graft.streaming.StateMachineRunner
import scala.util.Random

/** Seeded randomized properties (SURVEY §5e): plan invariants that must
  * hold for ANY input, checked over deterministic random corpora. */
class PropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("windowed counts are invariant under input permutation") {
    import spark.implicits._
    val rnd = new Random(42)
    val rows = Seq.tabulate(500)(i => (rnd.nextInt(20).toLong, rnd.nextInt(100000).toLong))
    def agg(data: Seq[(Long, Long)]) = data.toDF("uid", "secs")
      .withColumn("ts", timestamp_seconds(col("secs")))
      .groupBy(window(col("ts"), "1 hour"), col("uid")).count()
      .select(col("window.end").cast("long").as("we"), col("uid"), col("count"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(agg(rows) == agg(rnd.shuffle(rows)))
  }

  test("approx UV is within 3·rsd of exact UV in every window (both SFs)") {
    // quantifies the rows-only CORRECTNESS entry (VERDICT r3 #6): the
    // HLL++ sketch is built with rsd=0.01, so the standard-error bound
    // |approx − exact| / exact ≤ 3·rsd must hold per window (99.7%
    // band; the corpora are fixed, so this is a deterministic check)
    val rsd = 0.01
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = operators.EventAnalytics.uniqueVisitors(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val approx = operators.EventAnalytics.uniqueVisitorsApprox(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(approx.keySet == exact.keySet, s"window sets differ at $dir")
      assert(exact.nonEmpty)
      approx.foreach { case (w, a) =>
        val e = exact(w)
        val relErr = math.abs(a - e).toDouble / e
        assert(relErr <= 3 * rsd,
          s"$dir window $w: approx=$a exact=$e relErr=$relErr > ${3 * rsd}")
      }
    }
  }

  test("hot_users_topn rows are a subset of the full windowed counts, rn bounded") {
    val top = operators.EventAnalytics.hotUsersTopN(spark, sf).collect()
    assert(top.nonEmpty)
    assert(top.forall(_.getAs[Int]("rn") <= 5))
    val perWindow = top.groupBy(_.getAs[Long]("window_end"))
    perWindow.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rn"))
      // counts are non-increasing with rank within a window
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a.getAs[Long]("cnt") >= b.getAs[Long]("cnt"); case _ => true
      })
    }
  }

  test("login-fail machine ≡ lag-based CEP form on random sequences") {
    val rnd = new Random(7)
    val within = 10L
    for (_ <- 1 to 200) {
      var t = 0L
      val evs = Seq.fill(rnd.nextInt(30) + 1) {
        t += rnd.nextInt(8) + 1 // strictly increasing times
        Flagged(t, t, rnd.nextBoolean())
      }
      val machine = StateMachineRunner
        .runSorted(new LoginFailMachine(2, within), evs.iterator).toList
      val lagForm = evs.sliding(2).collect {
        case Seq(a, b) if a.flag && b.flag && b.tsUs - a.tsUs <= within => (a.tsUs, b.tsUs)
      }.toList
      assert(machine == lagForm)
    }
  }

  test("order-timeout machine: every create yields exactly one outcome") {
    val rnd = new Random(11)
    for (_ <- 1 to 200) {
      var t = 0L
      val evs = Seq.fill(rnd.nextInt(40) + 1) {
        t += rnd.nextInt(10) + 1
        Flagged(t, t, rnd.nextBoolean())
      }
      val out = StateMachineRunner
        .runSorted(new OrderTimeoutMachine(12), evs.iterator).toList
      val creates = evs.filter(_.flag).map(_.tsUs)
      assert(out.count(_.status != "paid_no_create") == creates.size)
      assert(out.filter(_.status == "timeout").forall(o => o.resultUs == o.createUs + 12))
      assert(out.filter(_.status == "paid").forall(o => o.resultUs - o.createUs <= 12))
    }
  }

  test("runPartition over shuffled partitioning equals per-key runSorted") {
    val rnd = new Random(23)
    val keys = Seq("a", "b", "c", "d")
    val evs = keys.flatMap { k =>
      var t = 0L
      Seq.fill(20) { t += rnd.nextInt(10) + 1; (k, Flagged(t, t, rnd.nextBoolean())) }
    }
    val m = new OrderTimeoutMachine(9)
    val partitioned = StateMachineRunner
      .runPartition(m, evs.sortBy(e => (e._1, e._2.tsUs)).iterator).toList
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val perKey = evs.groupBy(_._1).map { case (k, es) =>
      k -> StateMachineRunner.runSorted(m, es.map(_._2).sortBy(_.tsUs).iterator).toList
    }
    assert(partitioned == perKey)
  }

  test("bitmap set algebra == Scala Set algebra over random id sets") {
    val rnd = new Random(7)
    def randSet() = Set.fill(rnd.nextInt(200))(rnd.nextInt(5000).toLong)
    def bs(xs: Set[Long]): Array[Byte] = {
      val b = new java.util.BitSet()
      xs.foreach(i => b.set(i.toInt))
      b.toByteArray
    }
    (1 to 100).foreach { _ =>
      val (a, c) = (randSet(), randSet())
      assert(graft.plans.GraftBitmaps.andCard(bs(a), bs(c)) == (a & c).size.toLong)
      assert(graft.plans.GraftBitmaps.orCard(bs(a), bs(c)) == (a | c).size.toLong)
      assert(graft.plans.GraftBitmaps.andNotCard(bs(a), bs(c)) == (a -- c).size.toLong)
      assert(graft.plans.GraftBitmaps.andNotCard(bs(c), bs(a)) == (c -- a).size.toLong)
      assert(graft.plans.GraftBitmaps.card(bs(a)) == a.size.toLong)
      assert(graft.plans.GraftBitmaps.card(
        graft.plans.GraftBitmaps.orInto(
          graft.plans.GraftBitmaps.orInto(Array.emptyByteArray, bs(a)), bs(c)))
        == (a | c).size.toLong)
      // OR-fold across simulated partials (split c arbitrarily) —
      // update/merge associativity of the bitmap_merge_card aggregate
      // (buffer IS the serialized byte layout — the orInto kernel path)
      val agg = graft.plans.BitmapMergeCard(
        org.apache.spark.sql.catalyst.expressions.BoundReference(
          0, org.apache.spark.sql.types.BinaryType, nullable = false))
      val (c1, c2) = c.splitAt(c.size / 2)
      var b1 = agg.createAggregationBuffer()
      b1 = agg.update(b1, org.apache.spark.sql.catalyst.InternalRow(bs(a)))
      b1 = agg.update(b1, org.apache.spark.sql.catalyst.InternalRow(bs(c1)))
      var b2 = agg.createAggregationBuffer()
      b2 = agg.update(b2, org.apache.spark.sql.catalyst.InternalRow(bs(c2)))
      val merged = agg.merge(agg.deserialize(agg.serialize(b1)), b2)
      assert(agg.eval(merged) == (a | c).size.toLong)
    }
  }

  test("theta sketch algebra: error bounds and merge determinism, random sets") {
    import graft.plans.GraftTheta
    val rnd = new Random(11)
    val k = 512
    val tol = 4.0 / math.sqrt(k)      // card/union bound, ~4 sigma
    val setTol = tol * 1.6            // set ops compound two samples
    def sketch(ids: Iterable[Long]): Array[Byte] = {
      val b = new GraftTheta.Buf(k)
      ids.foreach(b.insertId)
      GraftTheta.serialize(b)
    }
    (1 to 20).foreach { _ =>
      // disjoint tagged pools give KNOWN intersection/difference truth
      def draw(n: Int, tag: Long) =
        Set.fill(n)((tag << 40) | rnd.nextLong(1L << 39))
      val shared = draw(8000 + rnd.nextInt(8000), 1)
      val aOnly = draw(8000 + rnd.nextInt(8000), 2)
      val cOnly = draw(8000 + rnd.nextInt(8000), 3)
      val a = shared ++ aOnly
      val c = shared ++ cOnly
      val u = (a ++ c).size.toDouble
      val (sa, sc) = (sketch(a), sketch(c))
      assert(math.abs(GraftTheta.card(sa) - a.size) <= a.size * tol)
      assert(math.abs(GraftTheta.orCard(sa, sc) - u) <= u * tol)
      // intersection/difference error scales with the UNION (theta
      // framework: both sides' samples thin at the same rate)
      assert(math.abs(GraftTheta.andCard(sa, sc) - shared.size) <= u * setTol)
      assert(math.abs(GraftTheta.andNotCard(sa, sc) - aOnly.size) <= u * setTol)
      // KMV state is order- and partition-independent: merging
      // arbitrary partials is BYTE-identical to the one-shot sketch
      val parts = a.toSeq.grouped(math.max(1, a.size / 3)).map(sketch).toSeq
      val merged = parts.reduce(GraftTheta.union)
      assert(java.util.Arrays.equals(merged, sa))
      // the theta_merge AGGREGATE adopts the k=512 budget from its
      // first input (the buffer starts at DefaultK=4096 — without
      // adoption the fold silently re-trims and reports k=4096)
      val agg = graft.plans.ThetaMerge(
        org.apache.spark.sql.catalyst.expressions.BoundReference(
          0, org.apache.spark.sql.types.BinaryType, nullable = false))
      var buf = agg.createAggregationBuffer()
      parts.foreach { p =>
        buf = agg.update(buf, org.apache.spark.sql.catalyst.InternalRow(p))
      }
      assert(java.util.Arrays.equals(
        agg.eval(agg.deserialize(agg.serialize(buf))).asInstanceOf[Array[Byte]], sa))
      // exact mode: below k the estimate IS the count
      val small = draw(k / 2, 4)
      assert(GraftTheta.card(sketch(small)) == small.size.toDouble)
    }
  }

  test("bottom-k quantile sample: rank-error bounds and merge determinism") {
    import graft.plans.GraftQSample
    val rnd = new Random(13)
    val k = 512
    def rankTol(q: Double) = 4.0 * math.sqrt(q * (1 - q) / k)
    def sample(rows: Seq[(Long, Double)]): Array[Byte] = {
      val b = new GraftQSample.Buf(k)
      rows.foreach { case (id, v) => b.insertId(id, v) }
      GraftQSample.serialize(b)
    }
    // Spark-percentile interpolation over a sorted array (the kernel's
    // exact-mode contract)
    def exactQ(vs: Array[Double], q: Double): Double = {
      val s = vs.sorted
      val pos = q * (s.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      if (lo == hi) s(lo) else s(lo) + (pos - lo) * (s(hi) - s(lo))
    }
    (1 to 20).foreach { round =>
      val n = 20000 + rnd.nextInt(30000)
      // a lumpy, skewed distribution — exp of a gaussian
      val rows = (0 until n).map(i =>
        ((round.toLong << 32) + i, math.exp(rnd.nextGaussian())))
      val vs = rows.map(_._2).toArray
      val sk = sample(rows)
      Seq(0.1, 0.5, 0.9).foreach { q =>
        val est = GraftQSample.quantile(sk, q).asInstanceOf[Double]
        // translate the rank bound to value space via the true quantile
        // at rank ± tol — the honest bound for ANY distribution
        val loB = exactQ(vs, math.max(0, q - rankTol(q)))
        val hiB = exactQ(vs, math.min(1, q + rankTol(q)))
        assert(est >= loB && est <= hiB,
          s"q=$q est=$est outside [$loB, $hiB] n=$n")
      }
      // KMV count bound
      assert(math.abs(GraftQSample.countEstimate(sk) - n) <= n * (4.0 / math.sqrt(k)))
      // merge of arbitrary partials is BYTE-identical to one-shot
      val parts = rows.grouped(math.max(1, n / 4)).map(sample).toSeq
      val merged = parts.reduce { (x, y) =>
        val bx = GraftQSample.deserialize(x)
        val by = GraftQSample.deserialize(y)
        val hs = new Array[Long](by.map.size)
        val vv = new Array[Double](by.map.size)
        val it = by.map.entrySet().iterator()
        var i = 0
        while (it.hasNext) { val e = it.next(); hs(i) = e.getKey; vv(i) = e.getValue; i += 1 }
        bx.mergeIn(by.theta, hs, vv)
        GraftQSample.serialize(bx)
      }
      assert(java.util.Arrays.equals(merged, sk))
      // the qsample_merge AGGREGATE adopts the k=512 budget from its
      // first input (buffer starts at DefaultK=4096)
      val agg = graft.plans.QSampleMerge(
        org.apache.spark.sql.catalyst.expressions.BoundReference(
          0, org.apache.spark.sql.types.BinaryType, nullable = false))
      var buf = agg.createAggregationBuffer()
      rows.grouped(math.max(1, n / 4)).map(sample).foreach { p =>
        buf = agg.update(buf, org.apache.spark.sql.catalyst.InternalRow(p))
      }
      assert(java.util.Arrays.equals(
        agg.eval(agg.deserialize(agg.serialize(buf))).asInstanceOf[Array[Byte]], sk))
      // exact mode: a small group's sample quantile IS the percentile
      val smallRows = rows.take(k / 2)
      val smallSk = sample(smallRows)
      Seq(0.25, 0.5, 0.75).foreach { q =>
        assert(GraftQSample.quantile(smallSk, q) ==
          exactQ(smallRows.map(_._2).toArray, q))
      }
    }
  }

  test("count-min sketch == brute-force BigInt replica over random multisets") {
    import graft.plans.GraftCms
    val rnd = new Random(17)
    val P = BigInt(graft.functions.ColumnFunctions.HashPrime)
    def randHash(): Long = (BigInt(63, rnd) mod P).toLong
    (1 to 40).foreach { round =>
      val depth = 1 + rnd.nextInt(5)
      val width = 2 + rnd.nextInt(63)
      // random vocabulary with random weights; (lo, hi) stand in for
      // the portable md5 pair — any values in [0, p) are legal
      val items = (0 until (5 + rnd.nextInt(200))).map { i =>
        (randHash(), randHash(), 1L + rnd.nextInt(1000))
      }
      def bucket(lo: Long, hi: Long, s: Int): Int =
        (((BigInt(lo) + BigInt(s) * BigInt(hi)) mod P) mod BigInt(width)).toInt
      val b = new GraftCms.Buf(depth, width)
      items.foreach { case (lo, hi, w) => b.insert(lo, hi, w) }
      val sk = GraftCms.serialize(b)
      // exact row mass invariant: every row holds the full mass
      val n = items.map(_._3).sum
      assert(GraftCms.total(sk) == n)
      // point estimates: never below truth; exactly the BigInt
      // replica's min-over-rows bucket sum (validates the wrapping
      // addModP iteration against wide arithmetic — the overflow edge)
      items.foreach { case (lo, hi, w) =>
        val replica = (0 until depth).map { s =>
          items.collect { case (l2, h2, w2)
            if bucket(l2, h2, s) == bucket(lo, hi, s) => w2 }.sum
        }.min
        val est = GraftCms.est(sk, lo, hi)
        assert(est >= w && est == replica,
          s"round=$round d=$depth w=$width est=$est replica=$replica")
      }
      // merge of arbitrary partials is BYTE-identical to one-shot
      val (i1, i2) = items.splitAt(rnd.nextInt(items.length + 1))
      def buildSk(xs: Seq[(Long, Long, Long)]): Array[Byte] = {
        val bb = new GraftCms.Buf(depth, width)
        xs.foreach { case (lo, hi, w) => bb.insert(lo, hi, w) }
        GraftCms.serialize(bb)
      }
      assert(java.util.Arrays.equals(
        GraftCms.union(buildSk(i1), buildSk(i2)), sk))
      // inner product: ≥ exact Σ f_a·f_b and == the replica min-over-
      // rows bucket dot (disjoint-vs-self gives the two extremes)
      val other = items.map { case (lo, hi, _) => (lo, hi, 1L + rnd.nextInt(50)) }
      val skO = buildSk(other)
      val exactIp = items.zip(other).map { case ((_, _, wa), (_, _, wb)) => wa * wb }.sum
      val ipReplica = (0 until depth).map { s =>
        val ma = items.groupBy { case (lo, hi, _) => bucket(lo, hi, s) }
          .view.mapValues(_.map(_._3).sum)
        val mb = other.groupBy { case (lo, hi, _) => bucket(lo, hi, s) }
          .view.mapValues(_.map(_._3).sum)
        ma.map { case (bk, wa) => wa * mb.getOrElse(bk, 0L) }.sum
      }.min
      val ip = GraftCms.innerProduct(sk, skO)
      assert(ip >= exactIp && ip == ipReplica)
      // the cms_merge aggregate adopts geometry from its first
      // non-empty input (buffers start at the default 4×2048)
      val agg = graft.plans.CmsMerge(
        org.apache.spark.sql.catalyst.expressions.BoundReference(
          0, org.apache.spark.sql.types.BinaryType, nullable = false))
      var buf = agg.createAggregationBuffer()
      buf = agg.update(buf, org.apache.spark.sql.catalyst.InternalRow(buildSk(i1)))
      var buf2 = agg.createAggregationBuffer()
      buf2 = agg.update(buf2, org.apache.spark.sql.catalyst.InternalRow(buildSk(i2)))
      val merged = agg.merge(agg.deserialize(agg.serialize(buf)), buf2)
      assert(java.util.Arrays.equals(agg.eval(merged).asInstanceOf[Array[Byte]], sk))
    }
  }

  test("bloom filter == brute-force BigInt bit replica over random sets") {
    import graft.plans.GraftBloom
    val rnd = new Random(19)
    val P = BigInt(graft.functions.ColumnFunctions.HashPrime)
    def randHash(): Long = (BigInt(63, rnd) mod P).toLong
    (1 to 30).foreach { round =>
      val k = 1 + rnd.nextInt(6)
      val mBits = 64 << rnd.nextInt(4) // 64..512: small enough to collide
      val items = Set.fill(5 + rnd.nextInt(120))((randHash(), randHash())).toSeq
      // wide-arithmetic replica of the partitioned bit layout: segment s
      // sets bit ((lo + s·hi) mod p) mod m — validates the wrapping
      // addModP iteration in Buf.insert against BigInt truth
      def bit(lo: Long, hi: Long, s: Int): Int =
        (((BigInt(lo) + BigInt(s) * BigInt(hi)) mod P) mod BigInt(mBits)).toInt
      val replica = (0 until k).map { s =>
        items.map { case (lo, hi) => bit(lo, hi, s) }.toSet
      }
      def build(xs: Seq[(Long, Long)]): Array[Byte] = {
        val b = new GraftBloom.Buf(k, mBits)
        xs.foreach { case (lo, hi) => b.insert(lo, hi) }
        GraftBloom.serialize(b)
      }
      val sk = build(items)
      // exact fill invariant vs the replica
      assert(GraftBloom.bitsSet(sk) == replica.map(_.size).sum.toLong)
      // no false negatives, ever
      items.foreach { case (lo, hi) =>
        assert(GraftBloom.contains(sk, lo, hi))
      }
      // probes answer exactly what the replica's bits imply — false
      // positives included (membership == all k segment bits set)
      (1 to 200).foreach { _ =>
        val (lo, hi) = (randHash(), randHash())
        val expected = (0 until k).forall(s => replica(s)(bit(lo, hi, s)))
        assert(GraftBloom.contains(sk, lo, hi) == expected)
      }
      // insertion is idempotent; merge of arbitrary partials (with
      // duplicates across them) is BYTE-identical to one-shot
      val (i1, i2) = items.splitAt(rnd.nextInt(items.length + 1))
      assert(java.util.Arrays.equals(
        GraftBloom.union(build(i1 ++ i2.take(3)), build(i2)), sk))
      // the bloom_merge aggregate adopts geometry from its first
      // non-empty input (buffers start at the default 5×2^16)
      val agg = graft.plans.BloomMerge(
        org.apache.spark.sql.catalyst.expressions.BoundReference(
          0, org.apache.spark.sql.types.BinaryType, nullable = false))
      var buf = agg.createAggregationBuffer()
      buf = agg.update(buf, org.apache.spark.sql.catalyst.InternalRow(build(i1)))
      var buf2 = agg.createAggregationBuffer()
      buf2 = agg.update(buf2, org.apache.spark.sql.catalyst.InternalRow(build(i2)))
      val merged = agg.merge(agg.deserialize(agg.serialize(buf)), buf2)
      assert(java.util.Arrays.equals(agg.eval(merged).asInstanceOf[Array[Byte]], sk))
    }
  }

  test("bloom geometryFor: meets the FPR target at measured fill; kernel contract") {
    import graft.plans.GraftBloom
    // k = smallest with 2^-k ≤ fpr; exercised over decades
    assert(GraftBloom.kFor(0.5) == 1 && GraftBloom.kFor(0.01) == 7 &&
      GraftBloom.kFor(1e-4) == 14 && GraftBloom.kFor(6.2e-5) == 14 &&
      GraftBloom.kFor(6.0e-5) == 15)
    // m = ceil(1.443 n) word-rounded, floor 64 — the exact integer
    // formula the DuckDB geometry CTE mirrors with // division
    assert(GraftBloom.mBitsFor(0) == 64 && GraftBloom.mBitsFor(44) == 64 &&
      GraftBloom.mBitsFor(45) == 128 && GraftBloom.mBitsFor(2326) == 3392 &&
      GraftBloom.mBitsFor(1000000) == 1443008)
    // measured FPR of an auto-sized filter on random items ≈ 2^-k:
    // fill ≤ ~1/2 by construction, so non-members pass all k segments
    // at ≤ ~2^-k — assert within 4× slack of the target
    val rnd = new Random(23)
    val P = BigInt(graft.functions.ColumnFunctions.HashPrime)
    def randHash(): Long = (BigInt(63, rnd) mod P).toLong
    val items = Vector.fill(5000)((randHash(), randHash()))
    val (k, m) = GraftBloom.geometryFor(items.size.toLong, 0.01)
    val b = new GraftBloom.Buf(k, m)
    items.foreach { case (lo, hi) => b.insert(lo, hi) }
    val sk = GraftBloom.serialize(b)
    val fp = (1 to 20000).count { _ =>
      GraftBloom.contains(sk, randHash(), randHash())
    }
    assert(fp.toDouble / 20000 <= 0.04, s"measured FPR ${fp / 20000.0} > 4×0.01")
    // ADVICE r11: out-of-contract hash inputs fail fast with the
    // portable-pair message, not an array-index error in an executor
    val bad = intercept[IllegalArgumentException](b.insert(-1L, 5L))
    assert(bad.getMessage.contains("portable hash pair"))
    val bad2 = intercept[IllegalArgumentException](
      GraftBloom.contains(sk, 5L, Long.MaxValue))
    assert(bad2.getMessage.contains("portable hash pair"))
    val bad3 = intercept[IllegalArgumentException] {
      val c = new graft.plans.GraftCms.Buf(2, 64)
      c.insert(5L, -3L, 1L)
    }
    assert(bad3.getMessage.contains("portable hash pair"))
  }
}
