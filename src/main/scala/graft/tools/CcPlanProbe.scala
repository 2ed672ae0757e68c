package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the physical plan of ONE large-star∘small-star round over a
  * checkpointed edge leaf — the per-round stage/exchange count is what
  * drives CC latency at moderate graph sizes.
  */
object CcPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = spark.range(100000L)
      .select(col("id").as("u"), (col("id") / 7).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .localCheckpoint(true)
    val round = graft.operators.Components.oneRound(edges)
    round.explain("formatted")
    // execute so AQE's final plan (with reuse decisions) is visible
    round.count()
    println("==== AFTER EXECUTION (AQE final) ====")
    round.explain("formatted")
    spark.stop()
  }
}
