package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Pipeline
import graft.sources.Synth

/** The literal north-rule evidence: the SAME job submitted via
  * spark-submit to a real standalone cluster (separate executor JVMs)
  * at two cluster sizes — N and 4N executors. Inherits master/executor
  * topology entirely from spark-submit flags; prints one JSON line.
  *
  * Run (see BENCH.md §R2.9 for the cluster bring-up):
  *   spark-submit --master spark://127.0.0.1:7077 \
  *     --class graft.tools.ClusterBench \
  *     --executor-cores 4 --executor-memory 6g \
  *     --total-executor-cores <8|32> \
  *     target/scala-2.13/civicutilsspark_2.13-0.1.0.jar 20000000
  */
object ClusterBench {
  def main(args: Array[String]): Unit = {
    val nTurns = args.lift(0).map(_.toLong).getOrElse(20000000L)
    val spark = SparkSession.builder().appName("graft-cluster-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // defaultParallelism is unreliable before executors register: the
    // submit script passes the granted core count explicitly
    val cores = args.lift(1).map(_.toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
    spark.conf.set("spark.sql.shuffle.partitions", cores.toString)

    val conv = (nTurns / 25L).toInt.max(1)
    val cfg = Synth.TurnGenConfig(nConvs = conv, turnsPerConv = 25,
      nGenes = Pipeline.DefaultGenes, hotConvs = conv / 100, hotMult = 5)
    // generated in-flight on the executors, pinned in executor memory —
    // same protocol as ScaleBench (BENCH.md §1)
    val turns = Synth.transcripts(spark, cfg).repartition(cores * 4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    turns.count()
    val bc = Pipeline.cachedIndex(spark)

    var best = Double.MaxValue
    var rows = 0L
    for (_ <- 1 to 4) {
      val t0 = System.nanoTime()
      rows = graft.operators.MatchKernel.annotate(turns, bc).toDF()
        .groupBy(window(col("ts"), "1 hour"), col("data_type"), col("highest_tier"))
        .agg(count(lit(1)).as("n"))
        .agg(sum(col("n"))).collect()(0).getLong(0)
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    // executor infos include the driver: subtract it
    val execs = spark.sparkContext.statusTracker.getExecutorInfos.length - 1
    println(f"""{"executors":$execs,"cores":$cores,"rows":$rows,"best_sec":$best%.2f,"turns_per_sec":${rows / best}%.0f}""")
    spark.stop()
  }
}
