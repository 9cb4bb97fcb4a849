package graft

import org.apache.spark.sql.DataFrame

/** Lineage-depth guard for loop-carried DataFrames.
  *
  * Iterative operators (textrank_keywords, label_spread, the streaming
  * snapshot faces) rebuild a frame from its previous version each
  * round; the lazy plan therefore deepens linearly in the round count,
  * and Catalyst's analysis/optimization cost — and the serialized task
  * binary — grow with it. At the canonical small round counts this is
  * irrelevant (the r7/r8 doc position), but those counts are CALLER
  * arguments: a user asking for 100s of rounds would hit multi-second
  * planning stalls and, eventually, codegen/stack limits with no
  * warning. The guard makes deep iteration safe by construction:
  * every [[Every]] rounds the loop rebases onto an EAGER
  * `localCheckpoint` (plan depth resets to 1) and releases the block
  * store of the checkpoint it supersedes, so storage held is one
  * checkpoint per loop, not the whole history of them.
  *
  * Checkpointing never changes values — only where lineage is cut — so
  * operator results (and the DuckDB oracle hashes) are identical with
  * the guard on or off; CorpusSpec/SimilaritySpec pin that invariance.
  * At canonical round counts (< [[Every]]) no checkpoint fires at all
  * and the physical plan is byte-identical to the unguarded form.
  */
object Checkpoints {
  /** Default rebase period: deep enough that canonical round counts
    * (3-10 everywhere in this repo) never pay a materialization, small
    * enough that planning cost stays flat into the 100s of rounds. */
  val Every = 20

  /** One loop's rebase state: call [[LoopGuard.apply]] on the
    * loop-carried frame each round; it checkpoints on period boundaries
    * (never on the final round — the caller's terminal action cuts that
    * lineage anyway) and frees the superseded checkpoint's blocks. The
    * LAST checkpoint intentionally stays alive: the returned frame's
    * lineage roots in it (standard persist contract — GC reclaims it
    * with the frame). */
  final class LoopGuard(every: Int) {
    require(every >= 1, "checkpoint period must be >= 1")
    private var prev: Option[DataFrame] = None

    def apply(df: DataFrame, round: Int, totalRounds: Int): DataFrame =
      if (round % every != 0 || round >= totalRounds) df
      else {
        val next = df.localCheckpoint(true)
        prev.foreach(release)
        prev = Some(next)
        next
      }
  }

  def guard(every: Int = Every): LoopGuard = new LoopGuard(every)

  /** Unpersists the block store behind a localCheckpoint'd frame
    * (Dataset.unpersist only clears cacheManager entries — checkpoint
    * blocks live on the LogicalRDD and otherwise wait for GC-driven
    * ContextCleaner reclamation). */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))
}
