package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query isolation bench (guide §1.4): times individual declared
  * queries outside the frozen Bench harness, with optional plan dump.
  *
  * Usage: runMain graft.tools.BenchExtra <reps> <q1> [q2 ...]
  *   env SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench
  *   env GRAFT_PLAN_DIR — if set, writes <dir>/<query>.txt with
  *   explain("formatted") before timing
  *   env GRAFT_NOOP=1 — time a noop-sink write (forces every column)
  *   instead of the bench's count() action
  *
  * Timing methodology matches Bench.scala: wall time around the action,
  * near-dup/CC operator caches released after each rep so repeats don't
  * feed on persisted intermediates.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(1)
    val wanted = args.drop(1).toSet
    val planDir = sys.env.get("GRAFT_PLAN_DIR")
    val useNoop = sys.env.get("GRAFT_NOOP").contains("1")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite)
      b.config("spark.local.dir", "/dev/shm/graft-local")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    graft.Pipeline.cachedIndex(spark)
    val qs = graft.SparkEntry.queries.filter { case (n, _) =>
      wanted.isEmpty || wanted.contains(n) }
    qs.foreach { case (name, fn) =>
      planDir.foreach { d =>
        val f = new java.io.File(d); f.mkdirs()
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(s"$d/$name.txt")
        try w.write(plan) finally w.close()
      }
      val times = (1 to reps).map { _ =>
        spark.sparkContext.setJobDescription(s"bench-extra:$name")
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        if (useNoop) df.write.format("noop").mode("overwrite").save()
        else df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.operators.NearDup.unpersistAll()
        graft.operators.Components.releaseAll()
        dt
      }
      if (times.nonEmpty)
        println(f"""BENCHX $name reps=$reps min=${times.min}%.3f med=${
          times.sorted.apply(times.size / 2)}%.3f all=${
          times.map(t => f"$t%.3f").mkString(",")}""")
      else println(s"BENCHX $name plan-only")
    }
    spark.stop()
  }
}
