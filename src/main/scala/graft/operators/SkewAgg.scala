package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted-key skew mitigation for hot conversations (north rule).
  *
  * When per-conversation aggregates are NOT map-side combinable (e.g.
  * collect_list of turns, or any holistic aggregate), a hot `conv_id`
  * funnels into one reducer. The standard fix is two-stage salting:
  * partial aggregate on (conv_id, salt), final merge on conv_id — the
  * hot key's rows spread over `salts` reducers in stage 1 and only
  * `salts` pre-aggregated rows meet in stage 2.
  *
  * (For plain counts/sums Spark's hash aggregate already partial-
  * aggregates map-side, so salting is a no-op win there; these helpers
  * exist for the aggregation shapes where it is not, and to make the
  * skew plan explicit and testable. The session automaton cannot be
  * salted — per-conversation state is inherently keyed — which is why
  * its state is O(1) per conversation by design.)
  */
object SkewAgg {

  /** Per-conversation tier counts via explicit two-stage salted
    * aggregation. Equivalent to groupBy(conv_id) — verified in tests.
    */
  def saltedTierCounts(ann: DataFrame, salts: Int = 16): DataFrame = {
    val tiers = Seq("tier_1", "tier_1b", "tier_2", "tier_3", "tier_4")
    val partials = tiers.map(t =>
      count(when(col("highest_tier") === t, 1)).as(s"_$t"))
    val finals = tiers.map(t => sum(col(s"_$t")).as(s"n_$t"))
    ann
      .withColumn("_salt", pmod(hash(col("turn_idx")), lit(salts)))
      .groupBy(col("conv_id"), col("_salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col("conv_id"))
      .agg(finals.head, finals.tail: _*)
  }

  /** Salted collect: per-conversation ordered turn-index list via
    * partial collect_list on (conv_id, salt) + flatten + sort — the
    * holistic-aggregate shape that genuinely needs salting.
    */
  def saltedTurnList(ann: DataFrame, salts: Int = 16): DataFrame =
    ann
      .withColumn("_salt", pmod(hash(col("turn_idx")), lit(salts)))
      .groupBy(col("conv_id"), col("_salt"))
      .agg(collect_list(col("turn_idx")).as("_part"))
      .groupBy(col("conv_id"))
      .agg(array_sort(flatten(collect_list(col("_part")))).as("turn_idxs"))

  /** Recommended AQE skew settings for the join/aggregate paths. */
  def applyAqeSkewSettings(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
  }
}
