package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{EvidenceFilter, FilterConfig}
import graft.sources.Synth

/** Cross-validation dump: writes (a) the synthetic evidence dimension
  * as the reference's nested var_map JSON and (b) the Spark-filtered
  * flat output for a battery of filter configs, so the ACTUAL reference
  * implementation (civicutils/filtering.py) can be run on (a) and
  * compared with (b) — an independent oracle for the 17 predicate
  * families' NULL/partial/counting semantics.
  */
object FilterDump {

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Flat leaf-row encoding shared by both sides of the comparison. */
  def leafString(gene: String, varId: String, mp: String, evType: String,
                 disease: String, drug: String, evidence: String,
                 level: String, item: String): String =
    Seq(gene, varId, mp, evType, disease, drug, evidence, level, item)
      .mkString("%%")

  val configs: Seq[(String, FilterConfig)] = Seq(
    "tcga_default" -> FilterConfig(
      evidenceTypeNotIn = Seq("FUNCTIONAL", "ONCOGENIC"),
      evidenceStatusIn = Seq("ACCEPTED"),
      varOriginNotIn = Seq("GERMLINE")),
    "disease_drug" -> FilterConfig(
      diseaseIn = Seq("BLADDER"), drugNameNotIn = Seq("TRAME"),
      minCivicScore = 5.0),
    "types_counts" -> FilterConfig(
      varTypeIn = Seq("MISSENSE"), minEvidenceItems = 3,
      evidenceLevelIn = Seq("A", "B", "C")),
    "gene_rating" -> FilterConfig(
      geneIdIn = (0 until 8).map(i => Synth.geneName(i.toLong)),
      minVariants = 10, sourceTypeIn = Seq("PUBMED"),
      minEvidenceRating = 3.0),
    "dir_sig" -> FilterConfig(
      evidenceDirIn = Seq("SUPPORTS"),
      evidenceClinsigNotIn = Seq("RESISTANCE"),
      varNameNotIn = Seq("EXON")),
    "null_probes" -> FilterConfig(
      varOriginIn = Seq("SOMATIC"), // NULL origin must fail this
      drugNameIn = Seq("NIB"),      // partial; non-PREDICTIVE unaffected
      evidenceStatusNotIn = Seq("REJECTED")))

  def main(args: Array[String]): Unit = {
    val outDir = args.lift(0).getOrElse("/tmp/filter_xval")
    Files.createDirectories(Paths.get(outDir))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows = Synth.evidenceRows(12, 42L)
    // (a) nested var_map JSON in reference structure
    val vm = graft.ref.RefModel.buildVarMap(rows)
    val sb = new StringBuilder("{")
    var firstG = true
    for ((gene, geneData) <- vm) {
      if (!firstG) sb.append(","); firstG = false
      sb.append(q(gene)).append(":{")
      var firstV = true
      for ((varId, v) <- geneData) {
        if (!firstV) sb.append(","); firstV = false
        sb.append(q(varId)).append(":{")
        sb.append(q("name")).append(":").append(q(v.name)).append(",")
        sb.append(q("hgvs")).append(":[").append(v.hgvs.map(q).mkString(",")).append("],")
        sb.append(q("types")).append(":[").append(v.types.map(q).mkString(",")).append("]")
        for ((mpId, mp) <- v.mps) {
          sb.append(",").append(q(mpId)).append(":{")
          sb.append(q("name")).append(":").append(q(s"$gene mp")).append(",")
          sb.append(q("civic_score")).append(":").append(mp.civicScore).append(",")
          sb.append(q("n_evidence_items")).append(":").append(mp.nEvidenceItems).append(",")
          sb.append(q("evidence_items")).append(":{")
          var firstT = true
          for ((evType, byDisease) <- mp.evidenceItems) {
            if (!firstT) sb.append(","); firstT = false
            sb.append(q(evType)).append(":{")
            sb.append(byDisease.map { case (disease, byDrug) =>
              q(disease) + ":{" + byDrug.map { case (drug, byEv) =>
                q(drug) + ":{" + byEv.map { case (ev, byLevel) =>
                  q(ev) + ":{" + byLevel.map { case (level, items) =>
                    q(level) + ":[" + items.map(q).mkString(",") + "]"
                  }.mkString(",") + "}"
                }.mkString(",") + "}"
              }.mkString(",") + "}"
            }.mkString(","))
            sb.append("}")
          }
          sb.append("}}")
        }
        sb.append("}")
      }
      sb.append("}")
    }
    sb.append("}")
    Files.writeString(Paths.get(s"$outDir/varmap.json"), sb.toString)

    // (b) Spark-filtered flat outputs per config
    import spark.implicits._
    val dim = Synth.evidenceDim(spark, 12, 42L).toDF()
    for ((name, cfg) <- configs) {
      val filtered = EvidenceFilter(dim, cfg)
      val leaves = filtered.select(
        col("gene_key"), col("var_id"), col("mp_id"), col("evidence_type"),
        col("disease"), col("drug"),
        concat_ws(":", col("direction"), col("significance")).as("ev"),
        col("level"),
        concat(col("source_type"), lit("_"), col("source_id"), lit(":"),
          col("evidence_status"), lit(":"), col("source_status"), lit(":"),
          col("variant_origin"), lit(":"),
          coalesce(col("rating").cast("string"), lit("NULL"))).as("item"),
        col("n_evidence_items"))
        .collect()
      val leafJson = leaves.map { r =>
        q(leafString(r.getString(0), r.getString(1), r.getString(2),
          r.getString(3), r.getString(4), r.getString(5), r.getString(6),
          r.getString(7), r.getString(8)))
      }.sorted
      val counts = leaves.map(r =>
        (s"${r.getString(0)}%%${r.getString(1)}%%${r.getString(2)}",
          r.getInt(9))).distinct.sortBy(_._1)
      val body = "{" + q("leaves") + ":[" + leafJson.mkString(",") + "]," +
        q("counts") + ":{" +
        counts.map { case (k, n) => q(k) + ":" + n }.mkString(",") + "}}"
      Files.writeString(Paths.get(s"$outDir/spark_$name.json"), body)
      println(s"[dump] $name leaves=${leafJson.length}")
    }
    spark.stop()
  }
}
