package graft.streaming

/** Serving-side folds over retention-partitioned LEAF rows — the other
  * half of the stage split [[StreamingJobs.snapshotUpdatePartitioned]]
  * documents: aggregates ABOVE the partition grain (a rollup's
  * per-type subtotal, its grand total, a cube's per-hour slice) are
  * not incremental over a retention-bounded window, so they move out
  * of the stream into a fold over the serving store's per-partition
  * leaf rows. Counts fold by sum; EXACT distinct users fold by
  * bitwise-OR of the leaves' [[graft.plans.BitmapState]] bytes +
  * popcount — which is why the leaf carries the bitmap, not the
  * count: counts don't merge, bitmaps do.
  *
  * Scale shape: the fold input is one row per retained
  * (day, event_type, hour) — days × |types| × 24, KiB-sized metadata
  * regardless of event volume, the same reduction topNUpdate's
  * serving-side ranking rides on. Runs wherever the serving store
  * lives; plain Scala, no Spark session needed.
  *
  * gid convention matches `grouping_id()` with (event_type, hour)
  * listed first-to-last = high-to-low bit, identical in Spark and
  * DuckDB/Postgres: (type,hour)=0, (type)=1, (hour)=2, ()=3. */
object ServingFolds {

  /** One serving-store leaf row: the [[graft.operators.EventAnalytics
    * .eventDailyLeafFrom]] grain minus the day key (folds don't care
    * which retained day a leaf came from). */
  final case class LeafCell(eventType: String, hour: Long, cnt: Long,
                            usersBm: Array[Byte])

  /** A folded grouping-set row: null eventType/hour = aggregated-out
    * (subtotal), exactly like the SQL rollup/cube output rows. */
  final case class SetRow(eventType: Option[String], hour: Option[Long],
                          cnt: Long, users: Long, gid: Long)

  private def orPop(bms: Iterable[Array[Byte]]): Long = {
    val acc = new java.util.BitSet()
    bms.foreach(b => acc.or(java.util.BitSet.valueOf(b)))
    acc.cardinality().toLong
  }

  private def fold(leaves: Iterable[LeafCell],
                   key: LeafCell => (Option[String], Option[Long]),
                   gid: Long): Seq[SetRow] =
    leaves.groupBy(key).map { case ((t, h), cells) =>
      SetRow(t, h, cells.iterator.map(_.cnt).sum, orPop(cells.map(_.usersBm)), gid)
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

  /** Cohort retention from DAY-KEYED leaves: OR a day's leaf bitmaps
    * into its exact active-user set, then intersect day pairs at each
    * offset — the serving-side twin of
    * [[graft.operators.EventAnalytics.retentionCohorts]], over
    * whatever days the retention window holds. Same KiB-sized input
    * as the other folds; days whose +offset partner has aged out (or
    * not arrived) report 0 retained, exactly like the batch query's
    * trailing days.
    *
    * Domain note: leaves carry UNSHARDED bitmaps, so this fold is
    * exact for id domains within one leaf bitmap's capacity (2^20
    * default); the batch query's shard split is the unbounded-domain
    * form. */
  def retentionFold(leaves: Iterable[(Long, LeafCell)],
                    offsets: Seq[Long] =
                      graft.operators.EventAnalytics.RetentionOffsets)
      : Seq[RetentionRow] = {
    val byDay: Map[Long, java.util.BitSet] = leaves.groupBy(_._1).map {
      case (d, cs) =>
        val acc = new java.util.BitSet()
        cs.foreach { case (_, c) => acc.or(java.util.BitSet.valueOf(c.usersBm)) }
        d -> acc
    }
    for {
      (d, bm) <- byDay.toSeq
      k <- offsets
    } yield {
      val retained = byDay.get(d + k).map { other =>
        val x = bm.clone().asInstanceOf[java.util.BitSet]
        x.and(other)
        x.cardinality().toLong
      }.getOrElse(0L)
      RetentionRow(d, k, bm.cardinality().toLong, retained)
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
    * window's leaf bitmaps, popcount. One row per day with data, over
    * whatever days the retention window holds. Same domain note as
    * [[retentionFold]] (unsharded leaf bitmaps). */
  def rollingActiveFold(leaves: Iterable[(Long, LeafCell)],
                        windowDays: Int =
                          graft.operators.EventAnalytics.RollingActiveWindowDays)
      : Seq[RollingActiveRow] = {
    val byDay: Map[Long, Iterable[LeafCell]] =
      leaves.groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2) }
    byDay.keysIterator.map { d =>
      val window = ((d - windowDays + 1) to d).filter(byDay.contains)
      RollingActiveRow(d, window.size.toLong,
        orPop(window.flatMap(wd => byDay(wd).map(_.usersBm))))
    }.toSeq
  }
}
