package graft.tools

import org.apache.spark.sql.SparkSession

/** Local smoke driver: runs SparkEntry.entry the same way the round
  * driver does (rows>0 check) and prints a sample.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(10, truncate = false)
    require(n > 0, "entry returned no rows")
    spark.stop()
  }
}
