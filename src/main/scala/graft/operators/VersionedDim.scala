package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.model.Turn

/** Slowly-changing evidence dimension (north rule: "broadcast /
  * stream-stream stateful join annotates turns against a slowly-
  * changing evidence dimension").
  *
  * The scalable realization is a VERSIONED broadcast: each dimension
  * snapshot (an SCD-2 effective-dated version) is compiled into its own
  * match index; a turn is annotated against the snapshot effective at
  * its EVENT TIME (binary search over version epochs) — so annotation
  * stays map-only and deterministic for a given input stream +
  * dimension history, while the dimension can change under a running
  * stream (re-broadcast per micro-batch is the streaming deployment;
  * foreachBatch naturally picks up a refreshed broadcast).
  *
  * A true stream-stream interval join would shuffle the 10^12-turn fact
  * stream against dimension updates; with a knowledge-base-sized
  * dimension that is strictly worse — documented trade, not an
  * omission.
  */
final case class VersionedDimIndex(epochsMs: Array[Long], versions: Array[DimIndex]) {
  require(epochsMs.length == versions.length && epochsMs.nonEmpty)
  require(epochsMs.zip(epochsMs.tail).forall { case (a, b) => a < b },
    "epochs must be strictly increasing")

  /** The dimension version effective at `tsMillis`: the last epoch
    * <= ts; before the first epoch the first version applies (the
    * reference semantics of "the knowledge base as loaded").
    */
  def at(tsMillis: Long): DimIndex = {
    var lo = 0; var hi = epochsMs.length - 1
    if (tsMillis <= epochsMs(0)) return versions(0)
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (epochsMs(mid) <= tsMillis) lo = mid else hi = mid - 1
    }
    versions(lo)
  }
}

object VersionedDim {

  /** Compile effective-dated dimension snapshots into a versioned
    * index. Each snapshot is (epochMs, flat evidence DataFrame).
    */
  def build(spark: SparkSession,
            snapshots: Seq[(Long, DataFrame)],
            ctCfg: CtConfig,
            selectCt: Either[String, Seq[String]] = Left("highest")): Broadcast[VersionedDimIndex] = {
    val sorted = snapshots.sortBy(_._1)
    val idx = VersionedDimIndex(
      sorted.map(_._1).toArray,
      sorted.map { case (_, df) => DimIndex.build(spark, df, ctCfg, selectCt) }.toArray)
    spark.sparkContext.broadcast(idx)
  }

  /** Map-only annotation against the event-time-effective version. */
  def annotate(turns: Dataset[Turn],
               bc: Broadcast[VersionedDimIndex]): Dataset[Annotation] = {
    import turns.sparkSession.implicits._
    turns.mapPartitions { it =>
      val vidx = bc.value
      it.map(t => MatchKernel.annotateTurn(t, vidx.at(t.ts.getTime)))
    }
  }
}
