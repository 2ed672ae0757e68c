package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence preparation for training: chunking long documents into
  * overlapping token windows, and packing short documents into
  * fixed-token-budget bins. Both are deterministic pure functions of
  * the input (no RNG, no partitioning dependence), so corpus builds
  * are reproducible and replay-safe.
  */
object Chunking {

  /** Explode each document into overlapping `window`-token chunks at
    * `stride` spacing — the standard context-window preparation step
    * (stride < window keeps train-time context overlap). The final
    * partial window is kept (a document shorter than `window` yields
    * exactly one chunk). Map-only: tokens are projected ONCE per row
    * and the chunk windows slice that attribute, so nothing shuffles
    * and the tokenizer never re-runs per chunk.
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  window: Int = 64, stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = docs.select(col(idCol), TextOps.tokens(col(textCol)).as("_toks"))
    // chunk count via non-negative integer arithmetic ONLY: floor
    // division of a negative dividend truncates toward zero in Spark
    // but floors in other engines — greatest(n-window, 0) keeps the
    // dividend non-negative so every engine agrees
    val nExtra = greatest(size(col("_toks")) - window, lit(0))
    toks
      .withColumn("_extra", nExtra)
      .withColumn("_n_chunks", expr(s"(_extra + ${stride - 1}) div $stride") + 1)
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), col("_n_chunks") - 1),
        i => struct(
          concat_ws(" ", slice(col("_toks"), i * stride + 1, lit(window)))
            .as("chunk_text"),
          size(slice(col("_toks"), i * stride + 1, lit(window)))
            .as("n_chunk_tokens")))))
      .select(col(idCol), col("pos").as("chunk_idx"),
        col("col.chunk_text").as("chunk_text"),
        col("col.n_chunk_tokens").as("n_chunk_tokens"))
  }

  /** Greedy sequential packing: within each stratum (ordered by
    * `orderCol`, then `tieBreakCols`) documents fill `budget`-token
    * bins by running token count — bin =
    * floor(preceding-cumulative-tokens / budget). The deterministic
    * streaming-pack shape real corpus builders use: a document landing
    * on a boundary overflows its bin rather than splitting (chunk
    * first if splitting is wanted). One window function over the
    * stratum ordering — the shuffle is the stratum partitioning
    * itself, nothing more.
    *
    * Determinism contract: bin assignment is a pure function of the
    * input ONLY when (orderCol, tieBreakCols...) is a total order
    * within each stratum — rows tied on the full ordering can swap
    * cumulative positions across runs/partitionings, changing bin
    * assignment. Callers whose orderCol is not unique (e.g. a
    * timestamp) must pass a unique tiebreak column (e.g. the doc id).
    */
  def packBins(docs: DataFrame, strataCol: String, orderCol: String,
               tokCol: String, budget: Int = 1024,
               tieBreakCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col(orderCol) +: tieBreakCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("_prev", coalesce(sum(col(tokCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"_prev div $budget"))
      .drop("_prev")
  }
}
