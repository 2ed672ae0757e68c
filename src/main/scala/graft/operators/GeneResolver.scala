package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Dimension-side identifier resolution — the reference's
  * `query_civic` gene selection (reference: civicutils/query.py:8-77):
  * keep only the dimension records whose identifier matches the input
  * key set; for symbol identifiers the match runs against the UNION of
  * record name and aliases (query.py:54-65, U1/J3 in SURVEY.md §2.7).
  *
  * Faithful scope note: aliases only influence which records load —
  * the tier-match lookup itself stays exact on the input's gene string
  * (the reference keys `var_map` by record symbol, match.py:590), so an
  * input using an alias still lands on tier_4. That quirk is preserved.
  */
object GeneResolver {

  /** Restrict `dim` to genes whose name-or-alias matches `inputGenes`.
    * Both key sets are broadcast-small; the dim scan stays a semi-join.
    */
  def resolve(dim: DataFrame, aliasTable: DataFrame,
              inputGenes: DataFrame): DataFrame = {
    val symbols = aliasTable
      .select(col("gene_key"), upper(trim(col("alias"))).as("sym"))
      .union(dim.select(col("gene_key"),
        upper(trim(col("gene_key"))).as("sym")).distinct())
    val wanted = inputGenes
      .select(upper(trim(col("gene"))).as("sym")).distinct()
    val matchedGenes = symbols
      .join(broadcast(wanted), Seq("sym"), "left_semi")
      .select(col("gene_key")).distinct()
    dim.join(broadcast(matchedGenes), Seq("gene_key"), "left_semi")
  }
}

/** Typed consensus-vote Aggregator — the reference's majority vote
  * (match.py:1480-1493) as a reusable `Aggregator[IN, BUF, OUT]`
  * (SURVEY.md §2.12). Input = response class strings
  * (POSITIVE/NEGATIVE/UNKNOWN_BLANK/UNKNOWN_DNS), output = the
  * consensus label. Registrable via `functions.udaf` for SQL use.
  */
object ConsensusAggregator
    extends Aggregator[String, (Long, Long, Long, Long), String] {
  override def zero: (Long, Long, Long, Long) = (0L, 0L, 0L, 0L)
  override def reduce(b: (Long, Long, Long, Long), cls: String): (Long, Long, Long, Long) =
    cls match {
      case "POSITIVE" => (b._1 + 1, b._2, b._3, b._4)
      case "NEGATIVE" => (b._1, b._2 + 1, b._3, b._4)
      case "UNKNOWN_BLANK" => (b._1, b._2, b._3 + 1, b._4)
      case "UNKNOWN_DNS" => (b._1, b._2, b._3, b._4 + 1)
      case other => throw new IllegalArgumentException(s"bad response class '$other'")
    }
  override def merge(a: (Long, Long, Long, Long), b: (Long, Long, Long, Long)): (Long, Long, Long, Long) =
    (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4)
  override def finish(b: (Long, Long, Long, Long)): String =
    graft.functions.Nomenclature.consensus(b._1, b._2, b._3, b._4)
  override def bufferEncoder: Encoder[(Long, Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
