package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** The SQL-text entry point (reference hotItems/HotItems_3_SQL.scala:
  * 45-61: Blink `hop` windowed agg + ROW_NUMBER Top-N as one SQL
  * string). Catalyst gives us the full surface; the reference query
  * ports with only `hop(...)` → `window(ts, size, slide)` and
  * `hop_end(...)` → `window.end` renames (SURVEY §3.2). Registered
  * views make every engine table reachable from `spark.sql`.
  */
object SqlSurface {

  /** Register the engine tables of a scale dir as temp views. */
  def registerViews(spark: SparkSession, d: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings").foreach { t =>
      Tables.load(spark, d, t).createOrReplaceTempView(t)
    }

  /** The flagship Top-N in pure SQL — must produce byte-identical
    * results to EventAnalytics.hotUsersTopN (the DataFrame form). */
  def hotUsersTopNSql(spark: SparkSession, d: String, n: Int = 5): DataFrame = {
    Tables.events(spark, d).createOrReplaceTempView("events")
    spark.sql(
      s"""SELECT window_end, user_id, cnt, rn FROM (
         |  SELECT window_end, user_id, cnt,
         |         ROW_NUMBER() OVER (PARTITION BY window_end
         |                            ORDER BY cnt DESC, user_id) AS rn
         |  FROM (
         |    SELECT CAST(CAST(window.end AS TIMESTAMP_LTZ) AS BIGINT) AS window_end,
         |           user_id, count(*) AS cnt
         |    FROM events
         |    GROUP BY window(ts, '1 hour', '5 minutes'), user_id
         |  )
         |) WHERE rn <= $n""".stripMargin)
  }

  /** The sharded bitmap cohort-retention query in pure SQL — the
    * injected extension functions (`bitmap_state`, `bitmap_card`,
    * `bitmap_and_card`) driven from SQL text, byte-identical to
    * [[EventAnalytics.retentionCohorts]] (the DataFrame form shares
    * its DuckDB oracle). */
  def retentionCohortsSqlText(spark: SparkSession, d: String): DataFrame = {
    Tables.events(spark, d).createOrReplaceTempView("events")
    val shardBits = EventAnalytics.RetentionShardBits
    spark.sql(
      s"""WITH daily AS (
        |  SELECT CAST(floor(CAST(CAST(ts AS TIMESTAMP_LTZ) AS BIGINT) / 86400) AS BIGINT) AS day,
        |         shiftright(user_id, $shardBits) AS shard,
        |         bitmap_state(user_id & ${(1L << shardBits) - 1}) AS bm
        |  FROM events
        |  GROUP BY 1, 2
        |),
        |cohorts AS (
        |  SELECT day, sum(bitmap_card(bm)) AS cohort_users FROM daily GROUP BY 1
        |),
        |ret AS (
        |  SELECT a.day, o.offset_days,
        |         sum(coalesce(bitmap_and_card(a.bm, b.bm), 0L)) AS retained_users
        |  FROM daily a
        |  CROSS JOIN (SELECT explode(array(${EventAnalytics.RetentionOffsets
             .map(o => s"${o}L").mkString(", ")})) AS offset_days) o
        |  LEFT JOIN daily b
        |    ON b.day = a.day + o.offset_days AND b.shard = a.shard
        |  GROUP BY 1, 2
        |)
        |SELECT r.day, r.offset_days, c.cohort_users, r.retained_users,
        |       r.retained_users / c.cohort_users AS retention_rate
        |FROM ret r JOIN cohorts c USING (day)""".stripMargin)
  }

  /** The sharded-bitmap rolling-actives (WAU) query in pure SQL — the
    * injected OR-FOLD aggregate (`bitmap_merge_card`) driven from SQL
    * text (VERDICT r10 task 2: the union half of the bitmap set
    * algebra was Scala-only), byte-identical to
    * [[EventAnalytics.rollingActiveUsers]] (the DataFrame form shares
    * its DuckDB oracle). Same plan family as the DataFrame twin: one
    * event-volume shuffle into (day, shard) bitmaps, ≤7-row KiB
    * fanout, per-(serve_day, shard) OR-fold, shard sum. */
  /** The bitmap churn decomposition in pure SQL — drives the NEW
    * `bitmap_andnot_card` leg of the set algebra from SQL text,
    * byte-identical to [[EventAnalytics.userChurn]] (the DataFrame
    * form shares its DuckDB oracle). `X''` is the empty-set bitmap for
    * shards present on only one side of the full outer join. */
  /** The decontamination PREFILTER in pure SQL — the injected
    * `graft_hash_lo`/`graft_hash_hi` portable pair feeding
    * `bloom_state`/`bloom_contains` from SQL text: the whole
    * sketch-family pipeline with no DataFrame code, byte-identical to
    * [[TextOps.contaminationBloom]] (the DataFrame form shares its
    * DuckDB oracle). Geometry is sized from the counted benchmark
    * grams by default (the same `GraftBloom.geometryFor` the DataFrame
    * form uses — here the count runs as one SQL aggregate first,
    * because `bloom_state`'s k/m arguments must be plan-time literals);
    * pass explicit k/mBits > 0 to pin one. */
  def contaminationBloomSqlText(spark: SparkSession, d: String, n: Int = 5,
                                benchMod: Int = 10, benchRes: Int = 7,
                                k: Int = 0, mBits: Int = 0,
                                targetFpr: Double = graft.plans.GraftBloom.DefaultTargetFpr): DataFrame = {
    Tables.documents(spark, d).createOrReplaceTempView("documents")
    val (kk, mm) =
      if (k > 0 && mBits > 0) (k, mBits)
      else TextOps.bloomGeometry(spark, d, n, benchMod, benchRes, targetFpr)(
        spark.sql(
          s"""SELECT count(DISTINCT gram) FROM (
             |  SELECT doc_id, explode(array_distinct(${TextOps.shinglesExpr(n)})) AS gram
             |  FROM (SELECT doc_id, ${TextOps.toksExpr} AS toks FROM documents)
             |  WHERE size(toks) >= $n
             |) WHERE doc_id % $benchMod = $benchRes""".stripMargin)
          .head().getLong(0))
    spark.sql(
      s"""WITH t AS (SELECT doc_id, ${TextOps.toksExpr} AS toks FROM documents),
         |g AS (SELECT doc_id,
         |        explode(array_distinct(${TextOps.shinglesExpr(n)})) AS gram
         |      FROM t WHERE size(toks) >= $n),
         |h AS (SELECT doc_id, gram,
         |        graft_hash_lo('bl', gram) AS lo,
         |        graft_hash_hi('bl', gram) AS hi
         |      FROM g),
         |bloom AS (SELECT bloom_state(lo, hi, $kk, $mm) AS bf
         |          FROM h WHERE doc_id % $benchMod = $benchRes),
         |bgrams AS (SELECT DISTINCT gram FROM g
         |           WHERE doc_id % $benchMod = $benchRes)
         |SELECT p.doc_id, count(1) AS n_grams,
         |       -- scalar subquery, not CROSS JOIN: Spark evaluates it
         |       -- once and embeds the filter as a plan literal, where
         |       -- a joined binary column re-copies the filter bytes
         |       -- from every probed row (StageProbe r15: ~80% of wall)
         |       sum(CAST(bloom_contains((SELECT bf FROM bloom), p.lo, p.hi)
         |         AS BIGINT)) AS n_flagged,
         |       sum(CASE WHEN bg.gram IS NOT NULL THEN 1L ELSE 0L END)
         |         AS n_exact
         |FROM h p
         |LEFT JOIN bgrams bg ON bg.gram = p.gram
         |WHERE p.doc_id % $benchMod <> $benchRes
         |GROUP BY p.doc_id
         |HAVING n_flagged > 0""".stripMargin)
  }

  /** The theta daily-UV accuracy contract from pure SQL text — the
    * injected `theta_state`/`theta_card` driven with no DataFrame
    * code, byte-identical to [[EventAnalytics.uvThetaDaily]] (shares
    * its DuckDB oracle). Closes VERDICT r11 #7's theta leg: every
    * sketch family is now exercised FROM SQL by a hash-gated query. */
  def uvThetaDailySqlText(spark: SparkSession, d: String): DataFrame = {
    Tables.events(spark, d).createOrReplaceTempView("events")
    val tol = EventAnalytics.ThetaTol
    spark.sql(
      s"""SELECT day, users,
         |       abs(est - users) <= users * $tol AS within_tol
         |FROM (
         |  SELECT CAST(floor(CAST(CAST(ts AS TIMESTAMP_LTZ) AS BIGINT) / 86400) AS BIGINT) AS day,
         |         count(DISTINCT user_id) AS users,
         |         theta_card(theta_state(user_id)) AS est
         |  FROM events GROUP BY 1
         |)""".stripMargin)
  }

  /** The bottom-k quantile accuracy contract from pure SQL text —
    * `qsample_state`/`qsample_quantile`/`qsample_count` with no
    * DataFrame code, byte-identical to
    * [[EventAnalytics.valueQuantilesDaily]] (shares its oracle). */
  def valueQuantilesDailySqlText(spark: SparkSession, d: String): DataFrame = {
    Tables.events(spark, d).createOrReplaceTempView("events")
    val tol = EventAnalytics.ThetaTol
    spark.sql(
      s"""WITH daily AS (
         |  SELECT CAST(floor(CAST(CAST(ts AS TIMESTAMP_LTZ) AS BIGINT) / 86400) AS BIGINT) AS day,
         |         count(1) AS n,
         |         percentile(value, array(0.10, 0.25, 0.50, 0.90)) AS ex,
         |         qsample_state(event_id, value) AS sk
         |  FROM events GROUP BY 1
         |), sp AS (SELECT *, ex[3] - ex[0] + 1e-9 AS spread FROM daily)
         |SELECT day, n,
         |       abs(qsample_quantile(sk, 0.25D) - ex[1]) <= spread * $tol AS p25_ok,
         |       abs(qsample_quantile(sk, 0.50D) - ex[2]) <= spread * $tol AS p50_ok,
         |       abs(qsample_quantile(sk, 0.90D) - ex[3]) <= spread * $tol AS p90_ok,
         |       abs(qsample_count(sk) - n) <= n * $tol AS count_ok
         |FROM sp""".stripMargin)
  }

  /** The Count-Min frequency estimates from pure SQL text —
    * `cms_state`/`cms_merge`/`cms_est` over the portable hash pair
    * with no DataFrame code, byte-identical to [[TextOps.cmsTopkEst]]
    * (shares its DuckDB oracle): per-source leaves fold with
    * `cms_state`, merge across sources, and the exact top-k tokens
    * probe the merged sketch. */
  def cmsTopkEstSqlText(spark: SparkSession, d: String, k: Int = 50): DataFrame = {
    Tables.documents(spark, d).createOrReplaceTempView("documents")
    val tag = TextOps.CmsTag
    spark.sql(
      s"""WITH tok AS (
         |  SELECT source, token FROM (
         |    SELECT source, explode(toks) AS token
         |    FROM (SELECT source, ${TextOps.toksExpr} AS toks FROM documents)
         |  ) WHERE length(token) > 0
         |), tf AS (
         |  SELECT token, count(1) AS cnt FROM tok GROUP BY 1
         |  ORDER BY cnt DESC, token LIMIT $k
         |), leaves AS (
         |  SELECT source,
         |         cms_state(graft_hash_lo('$tag', token),
         |                   graft_hash_hi('$tag', token)) AS sk
         |  FROM tok GROUP BY source
         |), merged AS (SELECT cms_merge(sk) AS sk FROM leaves)
         |SELECT t.token, t.cnt,
         |       cms_est(m.sk, graft_hash_lo('$tag', t.token),
         |               graft_hash_hi('$tag', t.token)) AS est,
         |       cms_est(m.sk, graft_hash_lo('$tag', t.token),
         |               graft_hash_hi('$tag', t.token)) - t.cnt AS overcount
         |FROM tf t CROSS JOIN merged m""".stripMargin)
  }

  def userChurnSqlText(spark: SparkSession, d: String): DataFrame = {
    Tables.events(spark, d).createOrReplaceTempView("events")
    val shardBits = EventAnalytics.RetentionShardBits
    spark.sql(
      s"""WITH daily AS (
        |  SELECT CAST(floor(CAST(CAST(ts AS TIMESTAMP_LTZ) AS BIGINT) / 86400) AS BIGINT) AS day,
        |         shiftright(user_id, $shardBits) AS shard,
        |         bitmap_state(user_id & ${(1L << shardBits) - 1}) AS bm
        |  FROM events
        |  GROUP BY 1, 2
        |),
        |prev AS (SELECT day + 1 AS day, shard, bm AS pbm FROM daily),
        |present AS (SELECT DISTINCT day FROM daily),
        |j AS (
        |  SELECT coalesce(d.day, p.day) AS day,
        |         coalesce(d.bm, X'') AS bm,
        |         coalesce(p.pbm, X'') AS pbm
        |  FROM daily d
        |  FULL OUTER JOIN prev p ON p.day = d.day AND p.shard = d.shard
        |)
        |SELECT day,
        |       sum(bitmap_card(bm)) AS active_users,
        |       sum(bitmap_andnot_card(bm, pbm)) AS new_users,
        |       sum(bitmap_and_card(bm, pbm)) AS retained_users,
        |       sum(bitmap_andnot_card(pbm, bm)) AS churned_users
        |FROM j JOIN present USING (day)
        |GROUP BY 1""".stripMargin)
  }

  /** The leaf-store WAU serve from PURE SQL TEXT (VERDICT r12 #6):
    * the loaded leaf relation rides as the `leaf_store` temp view, the
    * per-(day, shard) daily bitmaps come from a `bitmap_merge` group
    * fold over the stored leaves, and the serve fold is the same
    * fanout/OR-fold SQL as [[rollingActiveUsersSqlText]] — so the
    * whole durable serving layer is SQL-reachable end to end,
    * byte-identical to [[EventAnalytics.rollingActiveUsersFromStore]]
    * (shares rolling_active_users' DuckDB oracle, and the plan reads
    * the store, never events). */
  def rollingActiveUsersStoreSqlText(spark: SparkSession, d: String): DataFrame = {
    EventAnalytics.registerLeafStoreView(spark, d)
    val w = EventAnalytics.RollingActiveWindowDays
    spark.sql(
      s"""WITH daily AS (
        |  SELECT day, shard, bitmap_merge(users_bm) AS bm
        |  FROM leaf_store
        |  GROUP BY 1, 2
        |),
        |fanned AS (
        |  SELECT d.day + o.off AS serve_day, d.day AS src_day, d.shard, d.bm
        |  FROM daily d
        |  CROSS JOIN (SELECT explode(sequence(0L, ${w - 1}L)) AS off) o
        |),
        |present AS (SELECT DISTINCT day AS serve_day FROM daily),
        |win AS (SELECT f.* FROM fanned f JOIN present p USING (serve_day)),
        |users AS (
        |  SELECT serve_day, shard, bitmap_merge_card(bm) AS card
        |  FROM win GROUP BY 1, 2
        |),
        |agg AS (SELECT serve_day, sum(card) AS active_users FROM users GROUP BY 1),
        |cover AS (
        |  SELECT serve_day, count(DISTINCT src_day) AS days_covered
        |  FROM win GROUP BY 1
        |)
        |SELECT a.serve_day AS day, c.days_covered, a.active_users
        |FROM agg a JOIN cover c USING (serve_day)""".stripMargin)
  }

  /** Cohort retention served from the leaf store in PURE SQL text —
    * [[rollingActiveUsersStoreSqlText]]'s retention sibling: daily
    * bitmaps fold from the stored leaves with `bitmap_merge`, then the
    * offsets/AND-popcount serve SQL of [[retentionCohortsSqlText]].
    * Shares retention_cohorts' DuckDB oracle. */
  def retentionCohortsStoreSqlText(spark: SparkSession, d: String): DataFrame = {
    EventAnalytics.registerLeafStoreView(spark, d)
    spark.sql(
      s"""WITH daily AS (
        |  SELECT day, shard, bitmap_merge(users_bm) AS bm
        |  FROM leaf_store
        |  GROUP BY 1, 2
        |),
        |cohorts AS (
        |  SELECT day, sum(bitmap_card(bm)) AS cohort_users FROM daily GROUP BY 1
        |),
        |ret AS (
        |  SELECT a.day, o.offset_days,
        |         sum(coalesce(bitmap_and_card(a.bm, b.bm), 0L)) AS retained_users
        |  FROM daily a
        |  CROSS JOIN (SELECT explode(array(${EventAnalytics.RetentionOffsets
             .map(o => s"${o}L").mkString(", ")})) AS offset_days) o
        |  LEFT JOIN daily b
        |    ON b.day = a.day + o.offset_days AND b.shard = a.shard
        |  GROUP BY 1, 2
        |)
        |SELECT r.day, r.offset_days, c.cohort_users, r.retained_users,
        |       r.retained_users / c.cohort_users AS retention_rate
        |FROM ret r JOIN cohorts c USING (day)""".stripMargin)
  }

  /** The daily leaf GRAIN itself served from the store in PURE SQL
    * text (VERDICT r13 #7 — the one store question that still lacked a
    * `_sql` twin): the (day, type, hour) fold of the stored leaves
    * with `bitmap_card` popcounts, byte-identical to
    * [[EventAnalytics.eventDailyLeafStore]] and sharing
    * event_daily_leaf's DuckDB oracle — with this, EVERY question the
    * durable leaf artifact answers (leaf grain, WAU, retention, churn)
    * is reachable from pure SQL text over the `leaf_store` view. */
  def eventDailyLeafStoreSqlText(spark: SparkSession, d: String): DataFrame = {
    EventAnalytics.registerLeafStoreView(spark, d)
    spark.sql(
      """SELECT day, event_type, hour,
        |       sum(cnt) AS cnt,
        |       sum(bitmap_card(users_bm)) AS users
        |FROM leaf_store
        |GROUP BY 1, 2, 3""".stripMargin)
  }

  /** Churn decomposition served from the leaf store in PURE SQL text —
    * completes the set: every bitmap serving question (WAU, retention,
    * churn) is now answerable from the durable artifact by a SQL-only
    * client. Shares user_churn's DuckDB oracle. */
  def userChurnStoreSqlText(spark: SparkSession, d: String): DataFrame = {
    EventAnalytics.registerLeafStoreView(spark, d)
    spark.sql(
      s"""WITH daily AS (
        |  SELECT day, shard, bitmap_merge(users_bm) AS bm
        |  FROM leaf_store
        |  GROUP BY 1, 2
        |),
        |prev AS (SELECT day + 1 AS day, shard, bm AS pbm FROM daily),
        |present AS (SELECT DISTINCT day FROM daily),
        |j AS (
        |  SELECT coalesce(d.day, p.day) AS day,
        |         coalesce(d.bm, X'') AS bm,
        |         coalesce(p.pbm, X'') AS pbm
        |  FROM daily d
        |  FULL OUTER JOIN prev p ON p.day = d.day AND p.shard = d.shard
        |)
        |SELECT day,
        |       sum(bitmap_card(bm)) AS active_users,
        |       sum(bitmap_andnot_card(bm, pbm)) AS new_users,
        |       sum(bitmap_and_card(bm, pbm)) AS retained_users,
        |       sum(bitmap_andnot_card(pbm, bm)) AS churned_users
        |FROM j JOIN present USING (day)
        |GROUP BY 1""".stripMargin)
  }

  def rollingActiveUsersSqlText(spark: SparkSession, d: String): DataFrame = {
    Tables.events(spark, d).createOrReplaceTempView("events")
    val shardBits = EventAnalytics.RetentionShardBits
    val w = EventAnalytics.RollingActiveWindowDays
    spark.sql(
      s"""WITH daily AS (
        |  SELECT CAST(floor(CAST(CAST(ts AS TIMESTAMP_LTZ) AS BIGINT) / 86400) AS BIGINT) AS day,
        |         shiftright(user_id, $shardBits) AS shard,
        |         bitmap_state(user_id & ${(1L << shardBits) - 1}) AS bm
        |  FROM events
        |  GROUP BY 1, 2
        |),
        |fanned AS (
        |  SELECT d.day + o.off AS serve_day, d.day AS src_day, d.shard, d.bm
        |  FROM daily d
        |  CROSS JOIN (SELECT explode(sequence(0L, ${w - 1}L)) AS off) o
        |),
        |present AS (SELECT DISTINCT day AS serve_day FROM daily),
        |win AS (SELECT f.* FROM fanned f JOIN present p USING (serve_day)),
        |users AS (
        |  SELECT serve_day, shard, bitmap_merge_card(bm) AS card
        |  FROM win GROUP BY 1, 2
        |),
        |agg AS (SELECT serve_day, sum(card) AS active_users FROM users GROUP BY 1),
        |cover AS (
        |  SELECT serve_day, count(DISTINCT src_day) AS days_covered
        |  FROM win GROUP BY 1
        |)
        |SELECT a.serve_day AS day, c.days_covered, a.active_users
        |FROM agg a JOIN cover c USING (serve_day)""".stripMargin)
  }
}
