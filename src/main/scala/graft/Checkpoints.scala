package graft

import org.apache.spark.sql.Dataset

/** Deterministic release of `localCheckpoint` blocks.
  *
  * `Dataset.unpersist` only touches CacheManager entries, so a
  * checkpointed frame's RDD blocks linger until the ContextCleaner GCs
  * the RDD reference — in a long session the blocks of every
  * per-operator-call checkpoint accumulate between periodic GCs. A
  * checkpointed Dataset's logical plan IS the `LogicalRDD` wrapping the
  * persisted RDD, so the blocks can be dropped the moment the last
  * consumer has materialized, mirroring the `persist()/unpersist()`
  * discipline the operators already follow for cached frames.
  */
object Checkpoints {
  /** Best-effort: unpersists the checkpointed RDD behind `ds` (no-op for
    * non-checkpoint plans). Only call once every downstream consumer of
    * `ds` has been materialized — the blocks are NOT recomputable.
    */
  def free(ds: Dataset[_]): Unit = ds.queryExecution.logical match {
    case lr: org.apache.spark.sql.execution.LogicalRDD =>
      lr.rdd.unpersist(blocking = false)
    case _ => ()
  }
}
