package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name subset (builder-side
    // iteration aid; the driver passes exactly two args)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, f) => (s, o, Some(f.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // engine-produced relations FIRST: oracle SQL reads them back via
    // read_parquet, and q28 must see the same (session-cached) IVF
    // candidates the dump materialized. The dump dir lives NEXT TO
    // outDir, not inside it: the driver's checker enumerates every
    // outDir subdirectory as a query result, and the array-columned
    // dump relations made its pandas compare emit a spurious `_rel`
    // error row (CORRECTNESS_r02). The dir is NAMED AFTER outDir (so
    // concurrent runs with different outDirs never share it) and is
    // wiped up front (so a dump that fails this run cannot leave the
    // oracle silently reading a previous run's stale parquet).
    val relDir = new java.io.File(
      new java.io.File(outDir).getAbsoluteFile.getParentFile,
      s"graft_rel_${new java.io.File(outDir).getName}").getAbsolutePath
    locally {
      val root = java.nio.file.Paths.get(relDir)
      if (java.nio.file.Files.exists(root)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      }
    }
    val oracleSel = SparkEntry.oracleSql.filter { case (k, _) =>
      only.forall(_.contains(k)) }
    val needRels = oracleSel.values.exists(_.contains(SparkEntry.RelToken))
    if (needRels) SparkEntry.relationDumps.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$relDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] dump $name failed: ${e.getMessage}")
      }
      graft.operators.NearDup.unpersistAll()
      graft.operators.Components.releaseAll()
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      graft.operators.NearDup.unpersistAll()
      graft.operators.Components.releaseAll()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = oracleSel
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace(SparkEntry.RelToken, relDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
