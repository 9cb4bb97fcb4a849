package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guard — the scale properties the scaladocs
  * promise, pinned by assertion so a future edit cannot silently
  * reintroduce a scale-killer (the round-6 winnow lesson: a plan can
  * be correct, green, and 10× off its intended shape).
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Representative cross-section: every operator family, cheap to plan. */
  private val representative = Seq(
    "q1_pricing_summary", "q3_top_orders", "q5_region_revenue",
    "hot_users_topn", "session_windows", "event_rollup", "latest_snapshot",
    "minhash_lsh", "simhash_pairs", "winnow_pairs", "cross_dedup",
    "heavy_hitters", "tfidf_topk", "doc_quantiles", "doc_term_vectors",
    "ann_cosine_topk", "knn_graph", "embedding_dim_stats",
    "attribution_asof", "contamination",
    "lm_bigram_score", "vocab_growth", "embedding_covariance", "semdedup",
    "textrank_keywords", "label_spread", "profile_table", "key_skew_report",
    "retention_cohorts", "contamination_bloom", "split_leakage",
    "cross_dedup_persisted", "ann_ivf_persisted",
    "event_daily_leaf_store", "rolling_active_users_store",
    "pq_whiten_compare", "uv_theta_daily_sql", "cms_topk_est_sql")

  test("retention_cohorts joins only broadcast bitmap relations — the " +
    "event volume is touched by exactly one aggregation scan") {
    val df = SparkEntry.queries("retention_cohorts")(spark, sf)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // the day×offset intersection matrix and the cohort join are both
    // KiB-sized bitmap relations — broadcast, never shuffled pair-wise
    assert(plan.contains("BroadcastHashJoin"),
      s"retention_cohorts lost its broadcast joins:\n$plan")
    Seq("SortMergeJoin", "CartesianProduct").foreach { op =>
      assert(!plan.contains(op),
        s"retention_cohorts plans a $op over the bitmap relations:\n$plan")
    }
  }

  test("user_churn / audience_overlap: joins run on reused bitmap relations " +
    "— one event-volume aggregation, no cartesian") {
    Seq("user_churn", "audience_overlap").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect() // finalize the adaptive plan
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$plan")
      // daily/typed bitmap relation appears in 3-4 branches of the DAG
      // but is BUILT once: the identical scan+partial-agg+exchange
      // subtree must be reused, not re-scanned per consumer
      assert(plan.contains("ReusedExchange") || plan.contains("TableCacheQueryStage"),
        s"$name re-scans the event volume per join branch:\n$plan")
    }
  }

  test("contamination_bloom probes a plan-literal filter — no per-row " +
    "filter join, and the gram volume is never shuffle-joined") {
    val df = SparkEntry.queries("contamination_bloom")(spark, sf)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // r15: the filter bytes ride the plan as a collected literal
    // (k·mBits/8 bytes, the exact former broadcast payload) — a
    // BroadcastNestedLoopJoin here would mean the probe regressed to a
    // joined binary COLUMN, whose per-row UnsafeRow.getBinary copy was
    // measured as ~80% of this query's sf0.1 wall (StageProbe r15);
    // the only join left is the broadcast exact-overlap calibration
    assert(plan.contains("BroadcastHashJoin"),
      s"contamination_bloom lost its broadcast exact-overlap join:\n$plan")
    Seq("SortMergeJoin", "CartesianProduct", "BroadcastNestedLoopJoin")
      .foreach { op =>
        assert(!plan.contains(op),
          s"contamination_bloom plans a $op over the gram volume:\n$plan")
      }
  }

  test("rolling_active_users_store serves from the leaf artifact — the " +
    "events table is never scanned") {
    val df = SparkEntry.queries("rolling_active_users_store")(spark, sf)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // the whole point of the leaf store: the serving fold reads the
    // KiB-sized leaf parquet, not the event volume — an events scan
    // here means the store stopped being the source of truth
    assert(!plan.contains("events.parquet"),
      s"rolling_active_users_store scans the event volume:\n$plan")
    assert(plan.contains("graft_leafstore") || plan.contains("leaves"),
      s"rolling_active_users_store does not read the leaf store:\n$plan")
  }

  test("chunk_documents is one codegen scan — no shuffle, no join, no window") {
    val df = SparkEntry.queries("chunk_documents")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    Seq("Exchange", "Join", "Window", "Sort").foreach { op =>
      assert(!plan.contains(op),
        s"chunk_documents plans a $op — the zero-shuffle contract broke:\n$plan")
    }
  }

  test("lsh_band_stats derives candidate volume from bucket counts, " +
    "never a pair join") {
    val df = SparkEntry.queries("lsh_band_stats")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"lsh_band_stats materializes pairs instead of counting buckets:\n$plan")
  }

  test("semdedup confines the pair quadratic to trained cells and never " +
    "references the static label partition") {
    val df = SparkEntry.queries("semdedup")(spark, sf)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // pairs come from a list_id-keyed equality join on the TRAINED
    // assignment — cell-keyed shuffle, no label cells, no cartesian
    assert(plan.contains("list_id"),
      s"semdedup lost the trained-cell pair join:\n$plan")
    assert(!plan.contains("label#"),
      s"semdedup references the static label column:\n$plan")
  }

  test("no representative query plans a CartesianProduct") {
    representative.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$plan")
    }
  }

  test("textrank iterations ride the memoized adjacency, never re-tokenizing") {
    val df = SparkEntry.queries("textrank_keywords")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // all 10 rank rounds must read the cached (x,y,w,s) relation; a
    // documents FileScan OUTSIDE an InMemoryRelation's cached build
    // subtree means an iteration rebuilt the graph from the corpus
    // (InMemoryRelation PRINTS its build plan inline — drop those
    // subtrees by tree indentation before scanning for FileScan)
    def indent(l: String): Int = { val i = l.indexOf("+-"); if (i < 0) l.length else i }
    val live = new StringBuilder
    var skipBelow = -1
    plan.linesIterator.foreach { l =>
      if (skipBelow >= 0 && indent(l) <= skipBelow) skipBelow = -1
      if (skipBelow < 0) {
        if (l.contains("InMemoryRelation")) skipBelow = indent(l)
        else live.append(l).append('\n')
      }
    }
    assert(plan.contains("InMemoryTableScan"),
      s"textrank_keywords does not consume the memoized adjacency:\n$plan")
    assert(!live.toString.contains("FileScan"),
      s"textrank_keywords re-scans the corpus inside the iteration:\n$plan")
  }

  test("profile_table is one scan — multi-distinct Expand, no join") {
    val df = SparkEntry.queries("profile_table")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("FileScan")) == 1,
      s"profile_table must census in ONE scan:\n$plan")
    assert(!plan.contains("Join"), s"profile_table plans a join:\n$plan")
    assert(plan.contains("Expand"),
      s"profile_table lost the multi-distinct Expand shape:\n$plan")
  }

  test("sq8_encode is one codegen scan — no shuffle, no join, no window") {
    val df = SparkEntry.queries("sq8_encode")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    Seq("Exchange", "Join", "Window", "Sort").foreach { op =>
      assert(!plan.contains(op),
        s"sq8_encode plans a $op — the scan-speed contract broke:\n$plan")
    }
  }

  test("winnow_pairs reuses ONE fingerprint pipeline for both join sides") {
    val df = SparkEntry.queries("winnow_pairs")(spark, sf)
    df.collect() // finalize THIS frame's adaptive plan (count() would plan a new query)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"winnow_pairs self-join no longer reuses the fp exchange:\n$plan")
  }

  test("cross_dedup pushes the new-batch source filter into the scan") {
    val plan = SparkEntry.queries("cross_dedup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(source,src5)"),
      s"cross_dedup new-batch filter not pushed to the parquet scan:\n$plan")
  }

  test("cross_dedup verify: batch-side shingle arrays arrive by broadcast, never per-pair shuffle (r16 asym kernel)") {
    // the asym kernel's contract: the pair stream joins the BATCH
    // side's per-doc arrays (sa) via a broadcast hash join — a
    // sort-merge or shuffled-hash join keyed on doc_a shipping sa
    // would mean the 47M-pair × KB-array exchange is back
    val df = SparkEntry.queries("cross_dedup")(spark, sf)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    val badJoin = plan.linesIterator.exists(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")) &&
        l.contains("doc_a") && plan.contains("sa#"))
    assert(plan.contains("BroadcastHashJoin"),
      s"cross_dedup verify lost its broadcast join:\n$plan")
    assert(!badJoin,
      s"cross_dedup verify ships batch arrays through a shuffle join:\n$plan")
  }

  test("knn_graph probes cells from the trained-centroid broadcast, " +
    "members join by shuffle") {
    // the coarse quantizer must be the TRAINED nlists-sized centroid
    // table arriving by broadcast (≈ sqrt(n)·dim rows — never the
    // corpus), and the probed→members candidate join must be a
    // cell-keyed shuffle join, never a broadcast of the full table
    val df = SparkEntry.queries("knn_graph")(spark, sf)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"knn_graph lost the trained-centroid broadcast:\n$plan")
    // the trained chain is present: the Lloyd argmin ranks by exact
    // decimal distance over list_id cells (no `label#` column survives
    // anywhere in the physical plan — the static-label quantizer is gone)
    assert(plan.contains("list_id"),
      s"knn_graph no longer keys cells by trained list_id:\n$plan")
    assert(!plan.contains("label#"),
      s"knn_graph still references the static label column:\n$plan")
  }

  test("lm_bigram_score probes by join, never a per-context window") {
    // the stopword context key is skewed; a `partition by x` window
    // could not be skew-split, the (x,y)/x joins can — the plan must
    // contain no WindowExec at all
    val plan = SparkEntry.queries("lm_bigram_score")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"lm_bigram_score reintroduced a per-context window:\n$plan")
  }

  test("vocab_growth: corpus max arrives broadcast, one bounded window") {
    // the maxp1 scalar joins by BroadcastNestedLoopJoin (1-row build
    // side), and the only ordered structure is the single window over
    // the <= nBuckets bucket axis — never a corpus-wide sort
    val df = SparkEntry.queries("vocab_growth")(spark, sf)
    df.collect()
    // the adaptive plan prints Final AND Initial sections — count only final
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"vocab_growth maxp1 scalar no longer broadcast:\n$plan")
    assert(plan.sliding("Window ".length).count(_ == "Window ") <= 1,
      s"vocab_growth grew a second window:\n$plan")
  }

  test("embedding_covariance is one scan, one agg exchange, no join") {
    // the CovGram kernel folds the whole upper triangle in ONE
    // aggregation buffer (ObjectHashAggregate — matches the
    // "HashAggregate" assertion below): the single exchange moves one
    // buffer per map partition, nothing is exploded pre-aggregation;
    // any join or second shuffle means the join-free shape regressed
    val df = SparkEntry.queries("embedding_covariance")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Join"),
      s"embedding_covariance grew a join:\n$plan")
    assert(plan.contains("HashAggregate"),
      s"embedding_covariance lost its hash aggregate:\n$plan")
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") <= 1,
      s"embedding_covariance needs exactly one shuffle:\n$plan")
  }

  test("heavy_hitters' exact pass shuffles candidates, not the vocabulary") {
    // the verify-pass join must BUILD on the <= k candidate side (a
    // broadcast), never shuffle the full token stream by token value
    val plan = SparkEntry.queries("heavy_hitters")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"heavy_hitters verify pass lost its broadcast semi-join:\n$plan")
  }
}
