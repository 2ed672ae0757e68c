package graft.operators

import scala.collection.mutable
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.EvidenceRow

/** Secondary reports: the drug-targets table (reference:
  * write_drug_targets, read_and_write.py:636-711 + the drug_target
  * accumulation in process_drug_support, match.py:1377-1437), per-line
  * best-annotation prioritization (W3, Query_CIViCutils.py:285-338),
  * and the re-grouped consensus across selected records
  * (reprocess_drug_support_across_selected_variants, match.py:1509-1655).
  */
object Reports {

  /** One PREDICTIVE evidence head entry for a variant, in dimension
    * order: the (ct, disease, drug) triples the reference walks when
    * accumulating drug targets (first-seen wins per (drug, gene)).
    */
  final case class PredEntry(drug: String, ct: String, disease: String,
                             evidence: String, entryIdx: Int)

  /** Per-variant PREDICTIVE entries from the ct-selected dimension. */
  def buildPredEntries(rows: Seq[(EvidenceRow, String)])
      : Map[(String, String), List[PredEntry]] = {
    rows.filter(_._1.evidence_type == "PREDICTIVE")
      .groupBy { case (r, _) => (r.gene_key, r.var_id) }
      .map { case (key, vrows) =>
        // ct order ct>gt>nct, then dim_order first-seen
        val ordered = vrows.sortBy { case (r, ct) =>
          (graft.model.Cts.rank(ct), r.dim_order) }
        val seen = mutable.LinkedHashMap.empty[(String, String, String), mutable.ArrayBuffer[String]]
        for ((r, ct) <- ordered)
          seen.getOrElseUpdate((ct, r.disease, r.drug), mutable.ArrayBuffer.empty) +=
            s"${r.direction}:${r.significance}(${r.level}(${r.source_type}_${r.source_id}))"
        key -> seen.zipWithIndex.map { case (((ct, disease, drug), evs), i) =>
          PredEntry(drug, ct, disease, evs.mkString(";"), i)
        }.toList
      }
  }

  /** Drug-targets report: for every drug with matched PREDICTIVE
    * evidence, the first (by deterministic processing order) matched
    * record per gene, plus the gene-frequency ranking
    * (A3: groupBy drug, countDistinct gene, orderBy desc).
    * Reference emission order within ties follows dict insertion; the
    * canonical tie-break here is drug name — documented deviation.
    */
  def drugTargets(ann: Dataset[Annotation],
                  bcPred: Broadcast[Map[(String, String), List[PredEntry]]],
                  bcNames: Broadcast[Map[(String, String), String]]): DataFrame = {
    import ann.sparkSession.implicits._
    val specials = Set("NON_SNV_MATCH_ONLY", "NON_CNV_MATCH_ONLY", "NON_EXPR_MATCH_ONLY")
    val exploded = ann.mapPartitions { it =>
      val pred = bcPred.value
      val names = bcNames.value
      it.flatMap { a =>
        val tiers = Seq("tier_1" -> a.tier_1, "tier_1b" -> a.tier_1b,
          "tier_2" -> a.tier_2, "tier_3" -> a.tier_3)
        for {
          ((tier, ids), tierIdx) <- tiers.zipWithIndex
          (varId, varIdx) <- ids.zipWithIndex
          if !specials.contains(varId.toUpperCase)
          e <- pred.getOrElse((a.gene_key, varId), Nil)
        } yield (e.drug, a.gene_key, names.getOrElse((a.gene_key, varId), varId),
          tier, "PREDICTIVE", e.ct, e.disease, e.evidence,
          a.conv_id, a.turn_idx, tierIdx, varIdx, e.entryIdx)
      }
    }.toDF("drug", "gene", "civic_variant", "tier", "evidence_type", "ct",
      "disease", "evidence", "conv_id", "turn_idx", "tier_idx", "var_idx", "entry_idx")

    // first-seen per (drug, gene) in deterministic processing order
    val w = Window.partitionBy(col("drug"), col("gene"))
      .orderBy(col("conv_id"), col("turn_idx"), col("tier_idx"),
        col("var_idx"), col("entry_idx"))
    val first = exploded.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")

    // drug frequency = number of distinct genes targeted
    val freq = first.groupBy(col("drug"))
      .agg(countDistinct(col("gene")).as("n_genes"))
    first.join(freq, Seq("drug"))
      .orderBy(col("n_genes").desc, col("drug"), col("gene"))
      .select("drug", "n_genes", "gene", "civic_variant", "tier",
        "evidence_type", "ct", "disease", "evidence", "conv_id", "turn_idx")
  }

  /** A2: consensus recomputed ACROSS a chosen set of annotation rows —
    * the coarser-grouping vote (match.py:1509-1655). Emits the long
    * form "DRUG:CT:RESULT:#pos|#neg|#unk|#dns" (the reference includes
    * counts only in this variant, match.py:1652).
    */
  def reprocessAcross(ann: Dataset[Annotation], bc: Broadcast[DimIndex]): Seq[String] = {
    import ann.sparkSession.implicits._
    val specials = Set("NON_SNV_MATCH_ONLY", "NON_CNV_MATCH_ONLY", "NON_EXPR_MATCH_ONLY")
    // one (drug:ct prefix, counts) tuple per (row, tier, matched var,
    // entry); final reduce per (drug, ct) key only — tiny shuffle
    val acc = ann.mapPartitions { it =>
      val idx = bc.value
      it.flatMap { a =>
        idx.genes.get(a.gene_key).toSeq.flatMap { gd =>
          val pos = gd.varIds.zipWithIndex.toMap
          for {
            ids <- Seq(a.tier_1, a.tier_1b, a.tier_2, a.tier_3)
            varId <- ids if !specials.contains(varId.toUpperCase)
            p <- pos.get(varId).toSeq
            j <- gd.varSupIdx(p).indices
          } yield {
            val c = gd.varSupCnt(p)
            (gd.drugCtPrefix(gd.varSupIdx(p)(j)),
              (c(4 * j), c(4 * j + 1), c(4 * j + 2), c(4 * j + 3)))
          }
        }
      }
    }.groupByKey(_._1)
      .mapValues(_._2)
      .reduceGroups((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4))
      .collect()
    acc.toSeq.sortBy(_._1)
      .map { case (prefix, (p, n, ub, ud)) =>
        prefix + graft.functions.Nomenclature.consensus(p, n, ub, ud) +
          s":$p|$n|$ub|$ud"
      }
  }

  /** W3: per-line best-annotation prioritization for multi-annotation
    * inputs (Query_CIViCutils.py:285-338): highest tier first, then
    * most matched ids, then first-encountered annotation.
    */
  def prioritizePerLine(annotated: DataFrame): DataFrame = {
    val tierRank = when(col("highest_tier") === "tier_1", 0)
      .when(col("highest_tier") === "tier_1b", 1)
      .when(col("highest_tier") === "tier_2", 2)
      .when(col("highest_tier") === "tier_3", 3)
      .otherwise(4)
    val nMatches = size(col("tier_1")) + size(col("tier_1b")) +
      size(col("tier_2")) + size(col("tier_3"))
    val w = Window.partitionBy(col("conv_id"), col("turn_idx"))
      .orderBy(tierRank.asc, nMatches.desc, col("annot_idx").asc)
    annotated.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Variant-name lookup helper for drugTargets. */
  def buildNameMap(spark: SparkSession, dim: DataFrame): Broadcast[Map[(String, String), String]] = {
    val names = dim.groupBy(col("gene_key"), col("var_id"))
      .agg(first(col("var_name")).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2).toUpperCase)
      .toMap
    spark.sparkContext.broadcast(names)
  }
}
