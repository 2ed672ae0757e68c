package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-curve evidence for the pair-work operator family on the r6
  * grouped-pair-explode implementation: exact-jaccard and MinHash
  * near-dup over r× replications of the sf0.1 documents corpus.
  *
  * Replicas are token-salted (every token prefixed with the replica
  * tag), so shingle vocabularies are disjoint across replicas:
  * cross-replica similarity is exactly 0 and the TRUE pair count
  * scales linearly in r — any super-linear runtime is the operator's
  * own doing, not the fixture's. A final planted-hot variant appends
  * one shared 4-token phrase to EVERY doc, pushing a handful of
  * shingles' doc frequency to corpus size (>> maxDocFreq): the cap
  * must engage (observed via NearDup.lastCapDropped) and the runtime
  * must stay near the un-planted curve instead of going quadratic.
  *
  * Usage: runMain graft.tools.ScalePairBench [reps-per-point]
  *   env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench.
  */
object ScalePairBench {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n0 = base.count()

    def corpus(r: Int, plantHot: Boolean) = {
      val parts = (0 until r).map { k =>
        base.select((col("doc_id") + k.toLong * 10000000L).as("doc_id"),
          // disjoint shingle space per replica: prefix every token
          regexp_replace(col("text"), "(^|\\s)", "$1r" + k + "x").as("text"))
      }
      val u = parts.reduce(_ unionByName _)
      if (!plantHot) u
      else u.select(col("doc_id"),
        concat(col("text"),
          lit(" common boiler plate footer phrase")).as("text"))
    }

    for (r <- Seq(1, 2, 4, 10); hot <- Seq(false, true)) {
      if (!hot || r == 10) {
        val docs = corpus(r, hot)
        val times = (1 to reps).map { _ =>
          spark.sparkContext.setJobDescription(
            s"scale-pair:jaccard r=$r hot=$hot")
          val t0 = System.nanoTime()
          val pairs = graft.operators.NearDup.jaccardNearDups(
            docs, "doc_id", "text", threshold = 0.5, maxDocFreq = 10000)
            .count()
          val dt = (System.nanoTime() - t0) / 1e9
          graft.operators.NearDup.unpersistAll()
          (dt, pairs)
        }
        println(f"SCALEPAIR jaccard r=$r docs=${n0 * r} hot=$hot " +
          f"min=${times.map(_._1).min}%.2f all=${
            times.map(t => f"${t._1}%.2f").mkString(",")} " +
          f"pairs=${times.head._2} capDropped=${
            graft.operators.NearDup.lastCapDropped}")
      }
    }
    for (r <- Seq(1, 4, 10)) {
      val docs = corpus(r, plantHot = false)
      val times = (1 to reps).map { _ =>
        spark.sparkContext.setJobDescription(s"scale-pair:minhash r=$r")
        val t0 = System.nanoTime()
        val pairs = graft.operators.NearDup.minhashNearDups(
          docs, "doc_id", "text", k = 64, bands = 32, threshold = 0.5)
          .count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.operators.NearDup.unpersistAll()
        (dt, pairs)
      }
      println(f"SCALEPAIR minhash r=$r docs=${n0 * r} " +
        f"min=${times.map(_._1).min}%.2f pairs=${times.head._2}")
    }
    spark.stop()
  }
}
