package graft.streaming

import graft.plans.{GraftBitmaps, GraftQSample, GraftTheta}

/** Serving-side folds over retention-partitioned LEAF rows — the other
  * half of the stage split [[StreamingJobs.snapshotUpdatePartitioned]]
  * documents: aggregates ABOVE the partition grain (a rollup's
  * per-type subtotal, its grand total, a cube's per-hour slice) are
  * not incremental over a retention-bounded window, so they move out
  * of the stream into a fold over the serving store's per-partition
  * leaf rows. Counts fold by sum; EXACT distinct users fold by
  * bitwise-OR of the leaves' [[graft.plans.BitmapState]] bytes +
  * popcount, PER SHARD and then summed over shards — the leaf grain is
  * sharded on (user_id >> 20) with the local id in the bitmap
  * (VERDICT r10 #1), so the id domain is unbounded: shards partition
  * the id space and their popcounts add exactly. Which is why the leaf
  * carries the bitmap, not the count: counts don't merge, bitmaps do.
  *
  * Scale shape: the fold input is one row per retained
  * (day, event_type, hour, shard) — days × |types| × 24 × ⌈ids/2^20⌉,
  * KiB-to-MiB-sized metadata regardless of event volume, the same
  * reduction topNUpdate's serving-side ranking rides on. Runs wherever
  * the serving store lives; plain Scala, no Spark session needed. The
  * OR/popcount kernels are the zero-allocation byte loops of
  * [[graft.plans.GraftBitmaps]].
  *
  * gid convention matches `grouping_id()` with (event_type, hour)
  * listed first-to-last = high-to-low bit, identical in Spark and
  * DuckDB/Postgres: (type,hour)=0, (type)=1, (hour)=2, ()=3. */
object ServingFolds {

  /** One serving-store leaf row: the [[graft.operators.EventAnalytics
    * .eventDailyLeafFrom]] grain minus the day key (folds don't care
    * which retained day a leaf came from). `usersBm` holds the LOCAL
    * ids of `shard` (id & 0xFFFFF of ids with id >> 20 == shard). */
  final case class LeafCell(eventType: String, hour: Long, shard: Long,
                            cnt: Long, usersBm: Array[Byte])

  /** A folded grouping-set row: null eventType/hour = aggregated-out
    * (subtotal), exactly like the SQL rollup/cube output rows. */
  final case class SetRow(eventType: Option[String], hour: Option[Long],
                          cnt: Long, users: Long, gid: Long)

  /** Exact distinct users across sharded bitmap fragments: OR within
    * each shard (local-id sets union), popcount, sum over shards
    * (shards partition the id space — no id exists in two shards). */
  private def orPopSharded(cells: Iterable[(Long, Array[Byte])]): Long =
    cells.groupBy(_._1).valuesIterator.map { frags =>
      GraftBitmaps.card(frags.iterator.map(_._2)
        .foldLeft(Array.emptyByteArray)(GraftBitmaps.orInto))
    }.sum

  private def fold(leaves: Iterable[LeafCell],
                   key: LeafCell => (Option[String], Option[Long]),
                   gid: Long): Seq[SetRow] =
    leaves.groupBy(key).map { case ((t, h), cells) =>
      SetRow(t, h, cells.iterator.map(_.cnt).sum,
        orPopSharded(cells.map(c => (c.shard, c.usersBm))), gid)
    }.toSeq

  /** ROLLUP(event_type, hour) from leaves: grouping sets
    * (type,hour), (type), () — the [[graft.operators.EventAnalytics
    * .eventRollupFrom]] output (cnt + exact users + gid) rebuilt
    * exactly over whatever days the retention window holds. */
  def rollupFold(leaves: Iterable[LeafCell]): Seq[SetRow] =
    fold(leaves, c => (Some(c.eventType), Some(c.hour)), 0L) ++
      fold(leaves, c => (Some(c.eventType), None), 1L) ++
      fold(leaves, _ => (None, None), 3L)

  /** CUBE(event_type, hour) from leaves: rollup's sets plus the
    * per-hour slice (gid 2) — the [[graft.operators.EventAnalytics
    * .eventCubeFrom]] output shape (which carries cnt + gid; its
    * `users` here comes free from the same fold). */
  def cubeFold(leaves: Iterable[LeafCell]): Seq[SetRow] =
    rollupFold(leaves) ++ fold(leaves, c => (None, Some(c.hour)), 2L)

  /** A folded cohort-retention row: of `cohortUsers` distinct users
    * active on `day`, `retainedUsers` were active again on
    * `day + offsetDays`. */
  final case class RetentionRow(day: Long, offsetDays: Long,
                                cohortUsers: Long, retainedUsers: Long)

  /** Per-(day, shard) merged bitmap of DAY-KEYED leaves — the shared
    * first stage of the cross-day set-algebra folds. */
  private def dayShardBitmaps(leaves: Iterable[(Long, LeafCell)])
      : Map[Long, Map[Long, Array[Byte]]] =
    leaves.groupBy(_._1).map { case (d, cs) =>
      d -> cs.groupBy(_._2.shard).map { case (s, frags) =>
        s -> frags.iterator.map(_._2.usersBm)
          .foldLeft(Array.emptyByteArray)(GraftBitmaps.orInto)
      }
    }

  /** Cohort retention from DAY-KEYED leaves: OR a day's leaf bitmaps
    * into its exact per-shard active-user sets, then intersect day
    * pairs shard-by-shard at each offset — the serving-side twin of
    * [[graft.operators.EventAnalytics.retentionCohorts]], over
    * whatever days the retention window holds, exact at ANY id
    * cardinality (the sharded grain). Same KiB-sized input as the
    * other folds; days whose +offset partner has aged out (or not
    * arrived) report 0 retained, exactly like the batch query's
    * trailing days. */
  def retentionFold(leaves: Iterable[(Long, LeafCell)],
                    offsets: Seq[Long] =
                      graft.operators.EventAnalytics.RetentionOffsets)
      : Seq[RetentionRow] = {
    val byDay = dayShardBitmaps(leaves)
    for {
      (d, shards) <- byDay.toSeq
      k <- offsets
    } yield {
      val retained = byDay.get(d + k).map { other =>
        shards.iterator.map { case (s, bm) =>
          other.get(s).map(GraftBitmaps.andCard(bm, _)).getOrElse(0L)
        }.sum
      }.getOrElse(0L)
      RetentionRow(d, k, shards.valuesIterator.map(GraftBitmaps.card).sum,
        retained)
    }
  }

  /** A folded day-over-day churn row: of `activeUsers` distinct users
    * on `day`, `newUsers` were absent the previous day and
    * `retainedUsers` present; `churnedUsers` of the PREVIOUS day's
    * actives went missing. */
  final case class ChurnRow(day: Long, activeUsers: Long, newUsers: Long,
                            retainedUsers: Long, churnedUsers: Long)

  /** Day-over-day churn decomposition from DAY-KEYED leaves — the
    * serving-side twin of [[graft.operators.EventAnalytics.userChurn]],
    * riding the ANDNOT leg of the bitmap algebra
    * ([[GraftBitmaps.andNotCard]]): per day with data, intersect/
    * subtract its per-shard active sets against the previous day's,
    * shard by shard (a shard present on only one side is all-new or
    * all-churned — the missing side is the empty set). Exact at any id
    * cardinality, over whatever days the retention window holds; a day
    * whose predecessor has aged out reports all actives as new and no
    * churn, exactly like the batch query's first day. */
  def churnFold(leaves: Iterable[(Long, LeafCell)]): Seq[ChurnRow] = {
    val byDay = dayShardBitmaps(leaves)
    byDay.toSeq.map { case (d, shards) =>
      val prev = byDay.getOrElse(d - 1, Map.empty[Long, Array[Byte]])
      val active = shards.valuesIterator.map(GraftBitmaps.card).sum
      val fresh = shards.iterator.map { case (s, bm) =>
        prev.get(s).map(GraftBitmaps.andNotCard(bm, _))
          .getOrElse(GraftBitmaps.card(bm))
      }.sum
      val retained = shards.iterator.map { case (s, bm) =>
        prev.get(s).map(GraftBitmaps.andCard(bm, _)).getOrElse(0L)
      }.sum
      val churned = prev.iterator.map { case (s, pbm) =>
        shards.get(s).map(GraftBitmaps.andNotCard(pbm, _))
          .getOrElse(GraftBitmaps.card(pbm))
      }.sum
      ChurnRow(d, active, fresh, retained, churned)
    }
  }

  /** A folded rolling-actives row: `activeUsers` distinct users were
    * active in the trailing `daysCovered`-days-with-data window ending
    * at `day` (window span = windowDays; daysCovered < windowDays at
    * series start or across gaps). */
  final case class RollingActiveRow(day: Long, daysCovered: Long,
                                    activeUsers: Long)

  /** Trailing-window exact distinct actives (WAU for windowDays = 7)
    * from DAY-KEYED leaves — the serving-side twin of
    * [[graft.operators.EventAnalytics.rollingActiveUsers]]: OR the
    * window's per-shard bitmaps, popcount, sum over shards. One row
    * per day with data, over whatever days the retention window holds,
    * exact at any id cardinality. */
  def rollingActiveFold(leaves: Iterable[(Long, LeafCell)],
                        windowDays: Int =
                          graft.operators.EventAnalytics.RollingActiveWindowDays)
      : Seq[RollingActiveRow] = {
    val byDay = dayShardBitmaps(leaves)
    byDay.keysIterator.map { d =>
      val window = ((d - windowDays + 1) to d).filter(byDay.contains)
      val active = window.flatMap(wd => byDay(wd).toSeq)
        .groupBy(_._1).valuesIterator.map { frags =>
          GraftBitmaps.card(frags.iterator.map(_._2)
            .foldLeft(Array.emptyByteArray)(GraftBitmaps.orInto))
        }.sum
      RollingActiveRow(d, window.size.toLong, active)
    }.toSeq
  }

  // ---- approximate-family folds over the SKETCH daily leaf grain ----
  // ([[graft.operators.EventAnalytics.sketchDailyLeafFrom]]: one row
  // per day with a theta user-sketch and a bottom-k value sample).
  // Same stage split as the bitmap folds, but the leaf is O(k) bytes
  // at ANY id cardinality — no shard bookkeeping; estimates carry the
  // families' ~1/√k error contracts.

  /** One sketch-grain leaf: the day's exact row count, theta sketch of
    * its user ids, bottom-k sample of its values. */
  final case class SketchCell(cnt: Long, usersSk: Array[Byte],
                              valuesSk: Array[Byte])

  /** Merge duplicate-day fragments (a serving store that appends
    * rather than upserts) into one cell per day — both sketches union
    * deterministically. */
  private def byDaySketch(leaves: Iterable[(Long, SketchCell)])
      : Map[Long, SketchCell] =
    leaves.groupBy(_._1).map { case (d, cs) =>
      d -> cs.map(_._2).reduce { (a, b) =>
        SketchCell(a.cnt + b.cnt, GraftTheta.union(a.usersSk, b.usersSk),
          mergeSamples(a.valuesSk, b.valuesSk))
      }
    }

  private def mergeSamples(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    GraftQSample.union(a, b)

  /** A theta cohort-retention row: ESTIMATED cohort size and retained
    * count at `day` + `offsetDays` (exact while days stay below the
    * sketch budget k). */
  final case class ThetaRetentionRow(day: Long, offsetDays: Long,
                                     cohortEst: Double, retainedEst: Double)

  /** Cohort retention from sketch leaves — the approximate serving
    * twin of [[retentionFold]]: one theta intersection per day pair
    * instead of per-shard bitmap ANDs. */
  def retentionFoldTheta(leaves: Iterable[(Long, SketchCell)],
                         offsets: Seq[Long] =
                           graft.operators.EventAnalytics.RetentionOffsets)
      : Seq[ThetaRetentionRow] = {
    val byDay = byDaySketch(leaves)
    for {
      (d, cell) <- byDay.toSeq
      k <- offsets
    } yield ThetaRetentionRow(d, k, GraftTheta.card(cell.usersSk),
      byDay.get(d + k).map(o => GraftTheta.andCard(cell.usersSk, o.usersSk))
        .getOrElse(0.0))
  }

  /** A theta rolling-actives row — [[RollingActiveRow]]'s estimate
    * twin. */
  final case class ThetaRollingRow(day: Long, daysCovered: Long,
                                   activeEst: Double)

  /** Trailing-window distinct actives from sketch leaves — union-fold
    * the window's theta sketches, estimate once. */
  def rollingActiveFoldTheta(leaves: Iterable[(Long, SketchCell)],
                             windowDays: Int =
                               graft.operators.EventAnalytics.RollingActiveWindowDays)
      : Seq[ThetaRollingRow] = {
    val byDay = byDaySketch(leaves)
    byDay.keysIterator.map { d =>
      val window = ((d - windowDays + 1) to d).filter(byDay.contains)
      val merged = window.map(byDay(_).usersSk).reduce(GraftTheta.union)
      ThetaRollingRow(d, window.size.toLong, GraftTheta.card(merged))
    }.toSeq
  }

  /** A folded window-quantile row: estimated quantile values (exact
    * while the window's rows stay below the sample budget k) plus the
    * exact row count carried by the leaves. */
  final case class QuantileRow(day: Long, daysCovered: Long, cnt: Long,
                               quantiles: Seq[Option[Double]])

  /** Trailing-window value quantiles from sketch leaves — quantiles
    * don't fold, their SAMPLES do: union the window's bottom-k samples
    * and read the requested quantiles off the merged sample. The
    * serving-side answer to "p50/p90 latency over the last 7 days"
    * without re-scanning any events. */
  def quantileFold(leaves: Iterable[(Long, SketchCell)],
                   qs: Seq[Double],
                   windowDays: Int = 1): Seq[QuantileRow] = {
    val byDay = byDaySketch(leaves)
    byDay.keysIterator.map { d =>
      val window = ((d - windowDays + 1) to d).filter(byDay.contains)
      val merged = window.map(byDay(_).valuesSk).reduce(mergeSamples)
      // an empty merged sample (every value that window was NULL) is
      // None, never a fabricated 0.0 — unboxing the kernel's null
      // through asInstanceOf[Double] would silently report p50 = 0
      QuantileRow(d, window.size.toLong, window.map(byDay(_).cnt).sum,
        qs.map(q => Option(GraftQSample.quantile(merged, q))
          .map(_.asInstanceOf[Double])))
    }.toSeq
  }
}
