package graft.tools

import org.apache.spark.sql.functions._
import graft.Pipeline
import graft.operators.SkewAgg
import graft.sources.Synth

/** Skew-mitigation evidence: a holistic per-conversation aggregate
  * (collect_list) on a severely hot-keyed stream, direct vs salted
  * two-stage. Usage: SkewBench [nConvs] [hotMult]
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val nConvs = args.lift(0).map(_.toInt).getOrElse(2000)
    val hotMult = args.lift(1).map(_.toInt).getOrElse(400)
    val sp = ScaleBench.session(32)
    import sp.implicits._
    sp.sparkContext.setLogLevel("ERROR")
    // 4 hot conversations carry hotMult x the turns of the other convs
    val cfg = Synth.TurnGenConfig(nConvs = nConvs, turnsPerConv = 50,
      nGenes = Pipeline.DefaultGenes, hotConvs = 4, hotMult = hotMult)
    val bc = Pipeline.cachedIndex(sp)
    val ann = graft.operators.MatchKernel
      .annotate(Synth.transcripts(sp, cfg), bc).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = ann.count()
    val hotShare = ann.filter(col("conv_id") < "conv00004").count()
    println(f"[skew] rows=$total hot4share=${hotShare * 100.0 / total}%.1f%%")

    def time(name: String)(f: => Long): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        assert(n == total, s"$name materialized $n list elements")
      }
      println(f"[skew] $name%-18s best=$best%.2fs")
    }
    // force full list materialization (count() alone lets Catalyst
    // prune the collect_list away)
    time("direct_collect") {
      ann.groupBy(col("conv_id"))
        .agg(array_sort(collect_list(col("turn_idx"))).as("idxs"))
        .select(sum(size(col("idxs")))).collect()(0).getLong(0)
    }
    time("salted_collect") {
      SkewAgg.saltedTurnList(ann, salts = 32)
        .select(sum(size(col("turn_idxs")))).collect()(0).getLong(0)
    }
    sp.stop()
  }
}
