package graft.tools

import graft.Pipeline
import graft.model.Turn

/** Phase-level scaling probe with interleaved sessions and multiple
  * reps to defeat machine noise. Diagnostic tool, not part of the
  * driver contract.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/tmp/graft_scale_src_20000000")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val results = collection.mutable.Map.empty[(Int, String), Double]
      .withDefaultValue(Double.MaxValue)

    for (round <- 1 to reps; cores <- Seq(8, 32)) {
      val sp = ScaleBench.session(cores)
      import sp.implicits._
      sp.sparkContext.setLogLevel("ERROR")
      val bc = Pipeline.cachedIndex(sp)
      val turns = sp.read.parquet(srcDir).as[Turn]
      def gcMs: Long = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .asScala.map(_.getCollectionTime).sum
      }
      def time(name: String)(f: => Long): Unit = {
        val g0 = gcMs
        val t0 = System.nanoTime()
        val n = f
        val sec = (System.nanoTime() - t0) / 1e9
        val gc = gcMs - g0
        results((cores, name)) = math.min(results((cores, name)), sec)
        println(f"[probe] round=$round cores=$cores $name%-10s rows=$n t=$sec%.2fs gc=${gc}ms")
      }
      time("parse") { turns.map(t => graft.operators.MatchKernel.parse(t).geneKey).filter(_ != null).count() }
      time("kernel") {
        graft.operators.MatchKernel.annotate(turns, bc)
          .filter(_.highest_tier != null).count()
      }
      time("kernelstr") {
        turns.mapPartitions { it =>
          val idx = bc.value
          it.map(t => graft.operators.MatchKernel.annotateTurn(t, idx).highest_tier)
        }.filter(_ != null).count()
      }
      sp.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
    for (((cores, name), t) <- results.toSeq.sortBy(x => (x._1._2, x._1._1)))
      println(f"[best] cores=$cores $name%-10s $t%.2fs (${20800000 / t / 1e6}%.2f M/s)")
  }
}
