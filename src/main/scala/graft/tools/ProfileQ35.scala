package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the q35 embedding near-dup pipeline. */
object ProfileQ35 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    def time(label: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"PROF $label rep$i ${(System.nanoTime() - t0) / 1e9}%.2fs n=$n")
        graft.operators.NearDup.unpersistAll()
      }
    }
    val emb = docs.select(col("doc_id"),
      graft.operators.TextOps.hashEmbedding(col("text"), 64).as("vec"))
    time("hashEmbedding-only") {
      emb.write.format("noop").mode("overwrite").save(); 0L
    }
    time("sigs") {
      emb.select(col("doc_id"), graft.operators.Similarity.hyperplaneSigs(
        col("vec"), 10, 64, 101).as("sigs"))
        .write.format("noop").mode("overwrite").save(); 0L
    }
    time("full-q35") {
      graft.operators.NearDup.embeddingNearDups(
        emb, "doc_id", "vec", threshold = 0.8).count()
    }
    spark.stop()
  }
}
