package graft.operators

import scala.collection.mutable
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.EvidenceRow

/** Denormalized annotated output table — the reference's `write_match`
  * sink (reference: civicutils/read_and_write.py:460-634) with the
  * nested evidence-string assembly of `write_evidences`
  * (read_and_write.py:401-457) and the row shape of
  * `write_output_line` (read_and_write.py:353-398).
  *
  * Scale shape: every per-variant output fragment (scores, types,
  * evidence strings per type) depends ONLY on the dimension, so it is
  * pre-rendered once per variant, broadcast, and stitched per turn
  * map-side — the fact stream is never joined or shuffled.
  *
  * Replicated reference quirks (parity path, SURVEY.md §7.3):
  *  - `write_drug` is effectively always true (the self-comparison
  *    `evidence_type == evidence_type`, read_and_write.py:596-597), so
  *    non-predictive evidences render a "|NULL" drug field;
  *  - empty columns are ".", tier is written without the "tier_"
  *    prefix, list columns are ";"-joined.
  * Ordering: the reference relies on dict insertion order; here every
  * fragment follows `dim_order` (documented canonical order).
  */
object OutputAssembly {

  /** S8 (YAML half): minimal YAML dump of any DataFrame — one YAML
    * list item per row, column names as keys (reference
    * write_to_yaml, read_and_write.py:289-301, which yaml.dump()s a
    * record map). Strings are single-quoted with '' escaping, numerics
    * and booleans plain, null is `~`, arrays render as inline flow
    * lists. Emits a one-string-column Dataset: write with
    * `.write.text(...)` — per-partition formatting, never
    * materializes on the driver.
    */
  def yamlLines(df: DataFrame): Dataset[String] = {
    import df.sparkSession.implicits._
    val names = df.columns
    // strings with control characters (newlines above all) switch to
    // YAML double-quoted style with \n/\r/\t/\xNN escapes: a raw
    // newline inside a single-quoted scalar would corrupt the document
    // AND break the one-line-per-key .write.text contract
    def quote(s: String): String =
      if (s.forall(_ >= ' '))
        "'" + s.replace("'", "''") + "'"
      else "\"" + s.flatMap {
        case '\\' => "\\\\"
        case '"' => "\\\""
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\x${c.toInt}%02x"
        case c => c.toString
      } + "\""
    def scalar(v: Any): String = v match {
      case null => "~"
      case s: String => quote(s)
      case b: Boolean => b.toString
      case n @ (_: Int | _: Long | _: Double | _: Float | _: Short | _: Byte) => n.toString
      case d: java.math.BigDecimal => d.toPlainString
      case t: java.sql.Timestamp => "'" + t.toString + "'"
      case d: java.sql.Date => "'" + d.toString + "'"
      case seq: scala.collection.Seq[_] =>
        seq.map(scalar).mkString("[", ", ", "]")
      case other => quote(other.toString)
    }
    df.map { row =>
      names.zipWithIndex.map { case (n, i) =>
        val pfx = if (i == 0) "- " else "  "
        s"$pfx$n: ${scalar(row.get(i))}"
      }.mkString("\n")
    }
  }

  /** Pre-rendered output fragments for one variant record. */
  final case class VarRender(
      scores: List[String],             // "GENE:NAME:MP:score" per mp
      typesString: String,              // "GENE:NAME:t1,t2"
      evStrings: Map[String, List[String]]) // evidence type -> rendered strings

  val sortedEvidenceTypes: Seq[String] =
    Seq("PREDICTIVE", "DIAGNOSTIC", "PROGNOSTIC", "PREDISPOSING")

  /** Render one evidence-type subtree for a variant
    * (write_evidences, read_and_write.py:401-457):
    * DISEASE[|CT][|DRUG](DIR,SIG(LEVEL(ID,..),LEVEL(..)))
    */
  private def renderEvidences(
      rows: Seq[EvidenceRow], writeCt: Boolean,
      writeComplete: Boolean, ctOf: EvidenceRow => String): List[String] = {
    // group preserving dim_order-first-seen at every level
    val out = mutable.ArrayBuffer.empty[String]
    val byCtDisease = mutable.LinkedHashMap.empty[(String, String), mutable.LinkedHashMap[String, mutable.LinkedHashMap[String, mutable.LinkedHashMap[String, mutable.ArrayBuffer[EvidenceRow]]]]]
    for (r <- rows.sortBy(_.dim_order)) {
      val ct = ctOf(r)
      byCtDisease
        .getOrElseUpdate((ct, r.disease), mutable.LinkedHashMap.empty)
        .getOrElseUpdate(r.drug, mutable.LinkedHashMap.empty)
        .getOrElseUpdate(s"${r.direction}:${r.significance}", mutable.LinkedHashMap.empty)
        .getOrElseUpdate(r.level, mutable.ArrayBuffer.empty) += r
    }
    for (((ct, disease), byDrug) <- byCtDisease; (drug, byEv) <- byDrug;
         (evidence, byLevel) <- byEv) {
      val Array(dir, sig) = evidence.split(":", -1)
      // write_drug is always true in the reference (see header note)
      val prefix =
        if (writeCt && ct.nonEmpty) s"$disease|${ct.toUpperCase}|$drug("
        else s"$disease|$drug("
      val levels = byLevel.map { case (level, items) =>
        val ids = items.map { r =>
          if (writeComplete)
            s"${r.source_type}_${r.source_id}:${r.evidence_status}:${r.source_status}:${r.variant_origin}:${r.rating.map(_.toString).getOrElse("NULL")}"
          else s"${r.source_type}_${r.source_id}"
        }
        s"$level(${ids.mkString(",")})"
      }
      out += s"$prefix$dir,$sig(${levels.mkString(",")}))"
    }
    out.toList
  }

  /** Build the broadcastable per-variant render table from the
    * (filtered, ct-annotated+selected) dimension rows.
    */
  def buildRenders(spark: SparkSession, dim: DataFrame, ctCfg: CtConfig,
                   selectCt: Either[String, Seq[String]] = Left("highest"),
                   writeCt: Boolean = false,
                   writeComplete: Boolean = false): Broadcast[Map[(String, String), VarRender]] = {
    import spark.implicits._
    val ctSel = CtClassifier.select(CtClassifier.annotate(dim, ctCfg), selectCt)
    val collected = ctSel
      .select(struct(dim.columns.toIndexedSeq.map(col): _*).as("_1"), col("ct").as("_2"))
      .as[(EvidenceRow, String)].collect()
    spark.sparkContext.broadcast(
      buildRendersLocal(collected.toIndexedSeq, writeCt, writeComplete))
  }

  /** Driver-side assembly (dimension is broadcast-small). */
  def buildRendersLocal(rows: Seq[(EvidenceRow, String)], writeCt: Boolean,
                        writeComplete: Boolean): Map[(String, String), VarRender] = {
    val byVar = rows.groupBy { case (r, _) => (r.gene_key, r.var_id) }
    byVar.map { case ((gene, varId), vrows) =>
      val sorted = vrows.sortBy(_._1.dim_order)
      val name = sorted.head._1.var_name.toUpperCase
      val types = sorted.head._1.var_types match {
        case ts if ts.isEmpty => Seq("NULL")
        case ts => ts.map(_.toUpperCase)
      }
      val mps = mutable.LinkedHashMap.empty[String, Double]
      for ((r, _) <- sorted) mps.getOrElseUpdate(r.mp_id, r.civic_score)
      val scores = mps.toList.map { case (mp, score) =>
        s"$gene:$name:$mp:$score"
      }
      val typesString = s"$gene:$name:${types.mkString(",")}"
      val ctByRow = vrows.map { case (r, ct) => r -> ct }.toMap
      val evStrings = sortedEvidenceTypes.map { et =>
        val etRows = sorted.map(_._1).filter(_.evidence_type == et)
        val rendered =
          if (etRows.isEmpty) Nil
          else {
            // group per mp, prefix fragments with GENE:NAME:MP:
            val byMp = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[EvidenceRow]]
            for (r <- etRows)
              byMp.getOrElseUpdate(r.mp_id, mutable.ArrayBuffer.empty) += r
            byMp.toList.flatMap { case (mp, rws) =>
              renderEvidences(rws.toSeq, writeCt, writeComplete, ctByRow)
                .map(s => s"$gene:$name:$mp:$s")
            }
          }
        et -> rendered
      }.toMap
      (gene, varId) -> VarRender(scores, typesString, evStrings)
    }
  }

  /** One output row per (annotated turn, non-empty tier) — the
    * denormalized table write_match produces; map-only over the
    * annotation stream with broadcast renders.
    */
  def writeMatchTable(ann: Dataset[Annotation],
                      bc: Broadcast[Map[(String, String), VarRender]],
                      writeSupport: Boolean = true): DataFrame = {
    import ann.sparkSession.implicits._
    val specialCases = Set("NON_SNV_MATCH_ONLY", "NON_CNV_MATCH_ONLY", "NON_EXPR_MATCH_ONLY")
    ann.mapPartitions { it =>
      val renders = bc.value
      it.flatMap { a =>
        val tiers = Seq(
          ("tier_1", a.tier_1, a.ds_tier_1), ("tier_1b", a.tier_1b, a.ds_tier_1b),
          ("tier_2", a.tier_2, a.ds_tier_2), ("tier_3", a.tier_3, a.ds_tier_3))
        val rowsOut = tiers.flatMap { case (tier, matched, ds) =>
          if (matched.isEmpty) None
          else {
            val scores = mutable.ArrayBuffer.empty[String]
            val types = mutable.ArrayBuffer.empty[String]
            val evs = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]]
            for (varId <- matched if !specialCases.contains(varId.toUpperCase);
                 r <- renders.get((a.gene_key, varId))) {
              scores ++= r.scores
              types += r.typesString
              for (et <- sortedEvidenceTypes; s <- r.evStrings.getOrElse(et, Nil))
                evs.getOrElseUpdate(et, mutable.ArrayBuffer.empty) += s
            }
            def dot(xs: Seq[String]) = if (xs.isEmpty) "." else xs.mkString(";")
            Some((a.conv_id, a.turn_idx, a.gene_key, a.data_type,
              tier.stripPrefix("tier_"),
              dot(scores.toSeq), dot(types.toSeq),
              if (writeSupport) dot(ds.map(_.toUpperCase)) else ".",
              dot(evs.getOrElse("PREDICTIVE", Nil).toSeq),
              dot(evs.getOrElse("DIAGNOSTIC", Nil).toSeq),
              dot(evs.getOrElse("PROGNOSTIC", Nil).toSeq),
              dot(evs.getOrElse("PREDISPOSING", Nil).toSeq)))
          }
        }
        // tier_4 rows: all annotation columns empty (write_match:624-630)
        val t4 =
          if (a.tier_4)
            Seq((a.conv_id, a.turn_idx, a.gene_key, a.data_type, "4",
              ".", ".", ".", ".", ".", ".", "."))
          else Nil
        rowsOut ++ t4
      }
    }.toDF("conv_id", "turn_idx", "gene_key", "data_type", "tier",
      "civic_scores", "civic_var_types", "civic_drug_support",
      "civic_predictive", "civic_diagnostic", "civic_prognostic",
      "civic_predisposing")
  }
}
