package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Physical-plan audit over every `SparkEntry.queries` entry: counts
  * the plan features that matter at 100 TB (shuffles by kind, join
  * strategies, codegen spans, anything quadratic) and writes the
  * PLANS.md table. The point is a standing, regenerable record that
  * every shipped query's plan was inspected — not just the ones with
  * explicit PlanQualitySpec pins.
  *
  * Usage: PlanAudit [sfDir] [outFile]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val outFile = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE OFF for the audit only: adaptive roots print initial plans
      // without whole-stage-codegen markers, and the audit wants the
      // static planner's strategy + codegen shape (production sessions
      // keep AQE on; it can only improve on what's audited here, e.g.
      // demoting a sort-merge join to broadcast at runtime)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // intentional non-equi joins: brute-force ANN baselines broadcast
    // the tiny query side against every item by design
    val intendedNlj = Set("q10_ann_quantized")

    def count(plan: String, marker: String): Int =
      marker.r.findAllMatchIn(plan).size

    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val hashEx = count(plan, "Exchange hashpartitioning")
        val rangeEx = count(plan, "Exchange rangepartitioning")
        val singleEx = count(plan, "Exchange SinglePartition")
        val bhj = count(plan, "BroadcastHashJoin")
        val smj = count(plan, "SortMergeJoin")
        val shj = count(plan, "ShuffledHashJoin")
        val nlj = count(plan, "BroadcastNestedLoopJoin")
        val cart = count(plan, "CartesianProduct")
        // codegen stages appear as "*(id)" prefixes in plan toString
        val codegen = """\*\(\d+\)""".r.findAllMatchIn(plan)
          .map(_.matched).toSet.size
        val flag =
          if (cart > 0) "CARTESIAN!"
          else if (nlj > 0 && !intendedNlj(name)) "NLJ!"
          else if (nlj > 0) "nlj-by-design"
          else ""
        f"| $name | $hashEx | $rangeEx | $singleEx | $bhj | $smj | $shj | $nlj | $codegen | $flag |"
      } catch {
        case e: Throwable =>
          s"| $name | - | - | - | - | - | - | - | - | ERROR: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(80)} |"
      }
    }

    val header =
      """# PLANS — physical-plan audit of every driver query
        |
        |Regenerate: `sbt "runMain graft.tools.PlanAudit"` (sf0.001,
        |local[8], AQE disabled so codegen stages are visible — production sessions keep AQE on). Columns: shuffle Exchanges by
        |partitioning kind, join strategies, whole-stage-codegen spans
        |(distinct `*(id)` stages). Flags: CARTESIAN!/NLJ! mark
        |quadratic join strategies — `nlj-by-design` is the brute-force
        |ANN baseline that deliberately broadcasts the tiny query side
        |(its LSH/IVF siblings are the scale paths). Range exchanges
        |come from the presentation `orderBy` each query ends with
        |(driver-contract determinism), not from the operator itself;
        |SinglePartition exchanges come from `limit` collection.
        |
        |""".stripMargin
    val body = header +
      "| query | hashEx | rangeEx | singleEx | BHJ | SMJ | SHJ | NLJ | codegen | flag |\n" +
      "|---|---|---|---|---|---|---|---|---|---|\n" +
      rows.mkString("\n") + "\n"
    Files.write(Paths.get(outFile), body.getBytes("UTF-8"))
    println(s"wrote $outFile (${rows.size} queries)")
    val bad = rows.count(r => r.contains("CARTESIAN!") || r.contains("NLJ!") ||
      r.contains("ERROR"))
    println(s"""{"queries":${rows.size},"flagged":$bad}""")
    spark.stop()
  }
}
