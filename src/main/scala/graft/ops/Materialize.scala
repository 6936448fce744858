package graft.ops

import org.apache.spark.sql.DataFrame

/** Materialization strategy for multi-consumer subplans.
  *
  * Several operators pin an expensive subplan that feeds 2+ consumers
  * (the range-partitioned frame in [[Windows.surrogateKey]], the dedup
  * inverted indexes, the per-round connected-component labels). The
  * DEFAULT everywhere is [[Materialize.Local]] — a lazy local checkpoint:
  * blocks live on executor local disks with NO lineage fallback. That is
  * the fastest option and correct on a healthy cluster, but one lost
  * executor fails the job, and for surrogateKey a recompute without the
  * pin could silently re-sample range boundaries and desync offsets.
  *
  * The executor-loss contract, explicitly:
  *  - [[Materialize.Local]]: executor loss => job failure (retry from the
  *    start). Right for local mode, short jobs, and clusters where a full
  *    retry is cheaper than durable writes.
  *  - [[Materialize.Reliable]]: checkpoint to the fault-tolerant store
  *    configured via `sparkContext.setCheckpointDir` — survives executor
  *    loss; the job continues from the checkpointed blocks. Right for
  *    long-running 100 TB jobs.
  *  - [[Materialize.Path]]: eager parquet materialization at an explicit
  *    path — durable, inspectable, resumable across driver restarts (the
  *    write-time-index pattern applied to intermediates).
  */
sealed trait Materialize {
  def apply(df: DataFrame): DataFrame = this match {
    case Materialize.Local    => df.localCheckpoint(false)
    case Materialize.Reliable => df.checkpoint(false)
    case Materialize.Path(dir) =>
      df.write.mode("overwrite").parquet(dir)
      df.sparkSession.read.parquet(dir)
  }
}

object Materialize {
  /** Lazy local checkpoint: executor blocks, no lineage fallback. */
  case object Local extends Materialize

  /** Lazy reliable checkpoint (requires `setCheckpointDir`); survives
    * executor loss.
    */
  case object Reliable extends Materialize

  /** Eager parquet materialization at `dir`: durable and inspectable. */
  final case class Path(dir: String) extends Materialize
}
