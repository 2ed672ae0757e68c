package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Corpus relevance scoring (TF-IDF / BM25) for a fixed query-term
  * set — the retrieval primitive a curation pipeline uses to pull
  * topic-targeted subsets out of a web-scale corpus.
  *
  * Scale shape: the fact-side pass is explode→broadcast-semi-filter on
  * the tiny term set, so the only shuffled rows are (doc, matched
  * term) — bounded by |terms| per document, NOT by document length.
  * The document-frequency relation is |terms| rows, broadcast back.
  * Corpus-level scalars (N, avgdl) are one partial-aggregated scan.
  */
object Relevance {

  /** Per-(doc, term) term frequencies restricted to `terms` — the
    * shared first stage. Filtering BEFORE the groupBy is the scale
    * decision: the shuffle carries only query-term hits.
    */
  private def termFreqs(docs: DataFrame, idCol: String, textCol: String,
                        terms: Seq[String]): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).as("doc"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .join(broadcast(terms.toDF("term")), Seq("term"))
      .groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Integer-exact quantized TF-IDF: score_q = Σ_t tf(d,t) · idf_q(t)
    * with idf_q(t) = (N · scale) div df(t) — integer division, so the
    * score is bit-identical on any engine and any partitioning (the
    * same trick as Similarity.quantizedCosine: quantize first, then
    * only exact integer arithmetic). The quantized idf is a monotone
    * image of N/df, so rankings match unquantized TF-IDF up to the
    * 1/scale quantization step.
    *
    * Overflow discipline (ANSI mode throws rather than wrapping):
    * N·scale·max_tf·|terms| must stay under 2^63 — at N=10^12 docs
    * pass scale=10^3, not the default 10^6.
    */
  def tfIdfQuantized(docs: DataFrame, idCol: String, textCol: String,
                     terms: Seq[String], scale: Long = 1000000L): DataFrame = {
    val n = docs.count()
    val tf = termFreqs(docs, idCol, textCol, terms)
    val idf = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("idf_q", expr(s"${n * scale}L div df"))
    tf.join(broadcast(idf), Seq("term"))
      .groupBy(col("doc"))
      .agg(sum(col("tf") * col("idf_q")).as("score_q"))
      .select(col("doc").as(idCol), col("score_q"))
  }

  /** Cross-engine-exact quantized Okapi BM25 at the standard
    * (k1 = 1.2, b = 0.75): score_q = Σ_t idf_q(t) · tfpart_q(d,t),
    * all-integer once the two quantizations land, so the score is
    * bit-identical on any engine and any partitioning (the q43
    * rounding-law discipline — no double is ever summed).
    *
    *  - tf-part: with k1 = 6/5 and b = 3/4 the Okapi ratio
    *    tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) is exactly
    *    (22·tf·Σdl) / (10·tf·Σdl + 3·Σdl + 9·dl·N) after multiplying
    *    through by 10·Σdl (avgdl = Σdl/N) — pure integers;
    *    tfpart_q = that ratio scaled by `scale` under integer `div`.
    *  - idf_q(t) = floor(ln(1 + (N − df + 0.5)/(df + 0.5)) · 1000):
    *    the ln argument is exact (IEEE ops over exact integers), and
    *    the 1e-3 quantization step is ~12 orders of magnitude coarser
    *    than a possible last-ulp ln() divergence between libm
    *    implementations, so the floor image is portable.
    *
    * Overflow discipline (ANSI mode throws rather than wrapping):
    * 22·max_tf·Σdl·scale must stay under 2^63 — at web scale pass a
    * smaller `scale`, exactly as `tfIdfQuantized` documents.
    * Rankings match double-precision `bm25` up to the quantization
    * steps (pinned in the spec).
    */
  def bm25Quantized(docs: DataFrame, idCol: String, textCol: String,
                    terms: Seq[String], scale: Long = 1000000L): DataFrame = {
    val n = docs.count()
    if (n == 0)
      return docs.select(col(idCol), lit(0L).as("score_q")).limit(0)
    val lens = docs.select(col(idCol).as("doc"),
      size(TextOps.tokens(col(textCol))).cast("long").as("dl"))
    val sumDl = lens.agg(sum(col("dl"))).head().getLong(0)
    val tf = termFreqs(docs, idCol, textCol, terms)
    val idf = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("idf_q",
        floor(log(lit(1.0) +
          (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5)) * 1000)
          .cast("long"))
    val tfpartQ = expr(
      s"(22L * tf * ${sumDl}L * ${scale}L) div " +
        s"(10L * tf * ${sumDl}L + 3L * ${sumDl}L + 9L * dl * ${n}L)")
    tf.join(broadcast(idf), Seq("term"))
      .join(lens, Seq("doc"))
      .groupBy(col("doc"))
      .agg(sum(col("idf_q") * tfpartQ).as("score_q"))
      .select(col("doc").as(idCol), col("score_q"))
  }

  /** CCNet-style unigram-LM quality scoring: train a unigram LM on
    * the corpus itself, score every document by its total and mean
    * quantized negative log-likelihood, and bucket into
    * head/middle/tail by the corpus quartiles of the mean — the
    * classic perplexity-filter shape (Wenzek et al., "CCNet", LREC
    * 2020) with the corpus standing in for the clean LM corpus.
    *
    * Cross-engine exactness (the q43/q56 discipline): per token TYPE,
    * nll_q(t) = floor(-ln(count(t)/total) · 1000) — the ln argument
    * is an exact IEEE quotient of exact integers and the 1e-3 floor
    * grid is ~12 orders coarser than any libm last-ulp divergence —
    * then ONLY integers are summed: score_q(d) = Σ_t tf·nll_q(t),
    * mean_nll_q = score_q div n_tok. Quartile thresholds interpolate
    * at exactly-representable 0.25/0.75 positions over integers
    * (the q46 exact-median argument), so the head/middle/tail split
    * is bit-identical on any engine and partitioning.
    *
    * Scale shape: one explode pass; the LM is a (token -> count)
    * aggregation joined back on the token key (AQE broadcasts it when
    * the vocabulary is small); the two quartile scalars are the only
    * driver values. Overflow: score_q ≤ n_tok · 1000·ln(total) —
    * at 10^12 tokens that is n_tok · 27 631, nowhere near 2^63.
    */
  def lmScoreQuantized(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    // the token explode feeds three consumers (total count, the LM
    // aggregation, the per-doc term frequencies) and the scored
    // relation two (the quartile action + the caller's) — persist
    // both so the corpus is exploded once and scored once
    val tok = CacheRegistry.persistTracked(
      docs.select(col(idCol).as("doc"),
        explode(TextOps.tokens(col(textCol))).as("term")))
    val total = tok.count()
    // empty corpus: percentile over zero rows is NULL and getDouble
    // would NPE — return the empty result with the right schema (the
    // same guard bm25 documents)
    if (total == 0)
      return docs.select(col(idCol), lit(0L).as("n_tok"),
        lit(0L).as("score_q"), lit(0L).as("mean_nll_q"),
        lit("middle").as("bucket")).limit(0)
    val nll = tok.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .withColumn("nll_q",
        floor(-log(col("cnt").cast("double") / total) * 1000).cast("long"))
      .select(col("term"), col("nll_q"))
    val scored = CacheRegistry.persistTracked(tok
      .groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .join(nll, Seq("term"))
      .groupBy(col("doc"))
      .agg(sum(col("tf") * col("nll_q")).as("score_q"),
        sum(col("tf")).as("n_tok"))
      .withColumn("mean_nll_q", expr("score_q div n_tok")))
    val th = scored.agg(
      percentile(col("mean_nll_q"), lit(0.25)).as("q1"),
      percentile(col("mean_nll_q"), lit(0.75)).as("q3")).head()
    val (q1, q3) = (th.getDouble(0), th.getDouble(1))
    scored.select(col("doc").as(idCol), col("n_tok"), col("score_q"),
      col("mean_nll_q"),
      when(col("mean_nll_q") <= q1, "head")
        .when(col("mean_nll_q") > q3, "tail")
        .otherwise("middle").as("bucket"))
  }

  /** Okapi BM25 over the query-term set (double-precision — the
    * engine-facing scorer; cross-engine checks use the quantized
    * variant above because ln() is not bit-portable).
    * idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5));
    * tf-part = tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl)).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val n = docs.count()
    // empty corpus: avg(dl) is NULL and getDouble would NPE — return
    // the empty result with the right schema instead. (A non-empty
    // corpus always has avgdl >= 1: the tokenizer yields one empty
    // token for blank text, so dl is never 0.)
    if (n == 0)
      return docs.select(col(idCol), lit(0.0).as("bm25")).limit(0)
    val lens = docs.select(col(idCol).as("doc"),
      size(TextOps.tokens(col(textCol))).as("dl"))
    val avgdl = lens.agg(avg(col("dl"))).head().getDouble(0)
    val tf = termFreqs(docs, idCol, textCol, terms)
    val idf = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("idf",
        log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5)))
    val tfPart: Column =
      col("tf") * (k1 + 1) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    tf.join(broadcast(idf), Seq("term"))
      .join(lens, Seq("doc"))
      .groupBy(col("doc"))
      .agg(sum(col("idf") * tfPart).as("bm25"))
      .select(col("doc").as(idCol), col("bm25"))
  }
}
