package graft.tools

import org.apache.spark.sql.functions._
import graft.Pipeline
import graft.sources.Synth

/** Sustained-throughput headline: annotate N turns generated in-flight
  * (pure per-index synthesis — no I/O floor) through the full kernel +
  * windowed rollup at 32 cores. Usage: Sustained [nTurns]
  */
object Sustained {
  def main(args: Array[String]): Unit = {
    val nTurns = args.lift(0).map(_.toLong).getOrElse(100000000L)
    val sp = ScaleBench.session(32)
    sp.sparkContext.setLogLevel("ERROR")
    val conv = (nTurns / 25L).toInt.max(1)
    val cfg = Synth.TurnGenConfig(nConvs = conv, turnsPerConv = 25,
      nGenes = Pipeline.DefaultGenes, hotConvs = conv / 100, hotMult = 5)
    val bc = Pipeline.cachedIndex(sp)
    var best = Double.MaxValue
    var rows = 0L
    for (_ <- 1 to 2) {
      val t0 = System.nanoTime()
      rows = graft.operators.MatchKernel
        .annotate(Synth.transcripts(sp, cfg), bc).toDF()
        .groupBy(window(col("ts"), "1 hour"), col("data_type"), col("highest_tier"))
        .agg(count(lit(1)).as("n")).agg(sum("n")).collect()(0).getLong(0)
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    println(f"""{"rows":$rows,"best_sec":$best%.2f,"turns_per_sec":${rows / best}%.0f}""")
    sp.stop()
  }
}
