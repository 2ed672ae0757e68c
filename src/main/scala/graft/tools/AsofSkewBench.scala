package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Planted-hot-key bench for the AS-OF join (the r5 `weak` finding):
  * 10% of all events land on ONE key, so the single-window form sorts
  * that key's whole timeline in one task while the bucketed form
  * splits it across (key, time-bucket) partitions.
  *
  * Usage: runMain graft.tools.AsofSkewBench [nEvents] [reps]
  *   env SPARK_GRAFT_CPUS as usual. Prints per-variant wall seconds
  *   (noop sink — computation only) for: uniform/single-window,
  *   uniform/bucketed, hot/single-window, hot/bucketed.
  */
object AsofSkewBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(8000000L)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite)
      b.config("spark.local.dir", "/dev/shm/graft-local")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nKeys = 1000
    def events(hot: Boolean) = spark.range(n).select(
      col("id").as("event_id"),
      (if (hot) when(col("id") % 10 === 0, lit("hot"))
        .otherwise(concat(lit("k"), (col("id") % nKeys).cast("string")))
      else concat(lit("k"), (col("id") % nKeys).cast("string"))).as("k"),
      timestamp_seconds(lit(1700000000L) +
        pmod(xxhash64(col("id")), lit(864000L))).as("ts"))
    val dim = spark.range(nKeys.toLong * 20).select(
      concat(lit("k"), (col("id") % nKeys).cast("string")).as("k"),
      timestamp_seconds(lit(1700000000L) + (col("id") / nKeys) * 43200L).as("ts"),
      (col("id") / nKeys).cast("int").as("ver"),
      concat(lit("p"), (col("id") / nKeys).cast("string")).as("plan"))

    def time(label: String, mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        spark.sparkContext.setJobDescription(s"asof-skew:$label")
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.operators.NearDup.unpersistAll()
        dt
      }
      println(f"ASOFBENCH $label n=$n min=${ts.min}%.2f all=${
        ts.map(t => f"$t%.2f").mkString(",")}")
    }

    for (hot <- Seq(false, true)) {
      val tag = if (hot) "hot10pct" else "uniform"
      val ev = events(hot)
      time(s"$tag/single-window",
        graft.operators.VersionedDim.asofJoin(ev, dim, "k", "ts", "ver",
          Seq("plan", "ver"), nBuckets = 1))
      time(s"$tag/bucketed-auto",
        graft.operators.VersionedDim.asofJoin(ev, dim, "k", "ts", "ver",
          Seq("plan", "ver")))
    }
    spark.stop()
  }
}
