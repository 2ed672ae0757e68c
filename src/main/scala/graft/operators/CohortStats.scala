package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A7 cohort statistics — the per-sample analysis layer of the
  * reference's process_civic_predictions.py (:101-226 feature/mean
  * accumulators, :228-287 evaluate_consensus_support), with
  * conversation = sample:
  *
  *  - per-tier variant counts and the matched fraction
  *    (all_civic_variants analog: turns whose highest tier is not
  *    tier_4);
  *  - mean matched variants per tier: total matched ids in the turn's
  *    assigned tier / number of turns assigned that tier
  *    (process_mean_feature_per_tier semantics, 0.0 when the tier is
  *    empty);
  *  - the drug-consensus distribution: per drug, the consensus strings
  *    ("DRUG:CT:CIVIC_*") collected across the conversation's turns at
  *    their assigned tier, classified all-support / all-resistance /
  *    all-conflict / all-unknown / mixed exactly as
  *    evaluate_consensus_support does.
  *
  * Two hash aggregations on conv_id (partial map-side combine, one
  * shuffle each) + one join — no windows, no driver collection; holds
  * at any conversation count.
  */
object CohortStats {

  /** Per-conversation stats over an annotation relation (the columns
    * of `MatchKernel.Annotation`).
    */
  def perConversation(ann: DataFrame): DataFrame = {
    def isTier(t: String) = when(col("highest_tier") === t, 1L).otherwise(0L)
    def tierMatches(t: String) =
      when(col("highest_tier") === s"tier_$t", size(col(s"tier_$t")).cast("long"))
        .otherwise(0L)
    def meanPerTier(t: String) = {
      val n = sum(isTier(s"tier_$t"))
      when(n > 0, round(sum(tierMatches(t)).cast("double") / n, 4)).otherwise(0.0)
    }
    val base = ann.groupBy(col("conv_id")).agg(
      count(lit(1)).as("n_turns"),
      sum(isTier("tier_1")).as("n_tier_1"),
      sum(isTier("tier_1b")).as("n_tier_1b"),
      sum(isTier("tier_2")).as("n_tier_2"),
      sum(isTier("tier_3")).as("n_tier_3"),
      sum(isTier("tier_4")).as("n_tier_4"),
      round(sum(when(col("highest_tier") =!= "tier_4", 1L).otherwise(0L))
        .cast("double") / count(lit(1)), 4).as("frac_civic"),
      meanPerTier("1").as("mean_matched_tier1"),
      meanPerTier("1b").as("mean_matched_tier1b"),
      meanPerTier("2").as("mean_matched_tier2"),
      meanPerTier("3").as("mean_matched_tier3"))

    // drug support strings at the turn's ASSIGNED tier only (the rows
    // the reference's parser reads from the written output)
    val dsAtTier =
      when(col("highest_tier") === "tier_1", col("ds_tier_1"))
        .when(col("highest_tier") === "tier_1b", col("ds_tier_1b"))
        .when(col("highest_tier") === "tier_2", col("ds_tier_2"))
        .when(col("highest_tier") === "tier_3", col("ds_tier_3"))
        .otherwise(array().cast("array<string>"))
    val exploded = ann
      .select(col("conv_id"), explode(dsAtTier).as("ds"))
      .select(col("conv_id"),
        split(col("ds"), ":").getItem(0).as("drug"),
        split(col("ds"), ":").getItem(1).as("ct"),
        split(col("ds"), ":").getItem(2).as("support"))
    // per-"ct"-class feature counts (process_feature_per_ct analog:
    // distinct drugs observed per cancer-type class)
    val ctDist = exploded.groupBy(col("conv_id")).agg(
      countDistinct(when(col("ct") === "CT", col("drug"))).as("n_drugs_ct"),
      countDistinct(when(col("ct") === "GT", col("drug"))).as("n_drugs_gt"),
      countDistinct(when(col("ct") === "NCT", col("drug"))).as("n_drugs_nct"))
    val perDrug = exploded
      .groupBy(col("conv_id"), col("drug"))
      .agg(
        sum(when(col("support") === "CIVIC_SUPPORT", 1L).otherwise(0L)).as("n_sup"),
        sum(when(col("support") === "CIVIC_RESISTANCE", 1L).otherwise(0L)).as("n_res"),
        sum(when(col("support") === "CIVIC_CONFLICT", 1L).otherwise(0L)).as("n_con"),
        sum(when(col("support") === "CIVIC_UNKNOWN", 1L).otherwise(0L)).as("n_unk"))
    // evaluate_consensus_support classification (reference :241-267)
    def only(a: org.apache.spark.sql.Column, rest: org.apache.spark.sql.Column*) =
      a > 0 && rest.map(_ === 0).reduce(_ && _)
    val classified = perDrug.withColumn("cls",
      when(only(col("n_sup"), col("n_res"), col("n_con"), col("n_unk")), "all_support")
        .when(only(col("n_res"), col("n_sup"), col("n_con"), col("n_unk")), "all_resistance")
        .when(only(col("n_con"), col("n_sup"), col("n_res"), col("n_unk")), "all_conflict")
        .when(only(col("n_unk"), col("n_sup"), col("n_res"), col("n_con")), "all_unknown")
        .otherwise("mixed"))
    val drugDist = classified.groupBy(col("conv_id")).agg(
      count(lit(1)).as("n_drugs"),
      sum(when(col("cls") === "all_support", 1L).otherwise(0L)).as("n_all_support_drugs"),
      sum(when(col("cls") === "all_resistance", 1L).otherwise(0L)).as("n_all_resistance_drugs"),
      sum(when(col("cls") === "all_conflict", 1L).otherwise(0L)).as("n_all_conflict_drugs"),
      sum(when(col("cls") === "all_unknown", 1L).otherwise(0L)).as("n_all_unknown_drugs"),
      sum(when(col("cls") === "mixed", 1L).otherwise(0L)).as("n_mixed_drugs"))

    base.join(drugDist, Seq("conv_id"), "left")
      .join(ctDist, Seq("conv_id"), "left")
      .na.fill(0L, Seq("n_drugs", "n_all_support_drugs", "n_all_resistance_drugs",
        "n_all_conflict_drugs", "n_all_unknown_drugs", "n_mixed_drugs",
        "n_drugs_ct", "n_drugs_gt", "n_drugs_nct"))
  }
}
