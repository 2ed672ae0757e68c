package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, shingling, fingerprinting, quality scoring, language
  * identification. All pure Column expressions (whole-stage codegen,
  * no UDFs) so they survive a 100x scale-up as map-only work.
  */
object TextOps {

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** BPE-ish pre-tokenization count: word pieces, punctuation runs —
    * a GPT-2-style pre-tokenizer pattern restricted to ASCII classes so
    * engines agree on the dialect.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"), lit(0)))

  /** Word n-gram shingles, hashed to 64-bit — the input to
    * MinHash/Jaccard. Distinct, so downstream set ops are exact.
    * Computed by the native one-pass HashedShinglesExpression: the
    * composed-Column form re-ran the regex tokenizer once per shingle
    * index (O(tokens²) regex work per row — 5.6 s for a 5k-doc pass vs
    * sub-second native).
    */
  def shingles(text: Column, n: Int = 3): Column =
    graft.plans.TextExprs.shinglesHashed(
      org.apache.spark.sql.SparkSession.active, text, n)

  /** The declarative shingle form (kept as the cross-checkable
    * reference for the native expression's semantics).
    */
  def shinglesColumnar(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0)) ),
        i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** Whole-document fingerprint over normalized text (md5 so an
    * external SQL oracle can reproduce it byte-for-byte).
    */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** 64-bit rolling fingerprint (xxhash64 of normalized text) — the
    * cheap dedup key for exact dedup at scale.
    */
  def fingerprint64(text: Column): Column =
    xxhash64(regexp_replace(trim(lower(text)), "\\s+", " "))

  // ---------------------------------------------------------------------
  // Quality scoring (length / punctuation / stopword / repetition)
  // ---------------------------------------------------------------------

  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "be", "this", "are", "was")

  /** Per-document quality features. Integer counts are exact across
    * engines; ratios are rounded for oracle comparison.
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nTok = size(toks)
    val nChar = length(text)
    val nPunct = size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))
    val nDigit = size(regexp_extract_all(text, lit("[0-9]"), lit(0)))
    val nStop = size(filter(toks, t =>
      t.isin(stopwords: _*)))
    val nUniq = size(array_distinct(toks))
    Seq(
      "n_tokens" -> nTok,
      "n_chars_m" -> nChar,
      "punct_ratio" -> round(nPunct.cast("double") / greatest(nChar, lit(1)), 4),
      "digit_ratio" -> round(nDigit.cast("double") / greatest(nChar, lit(1)), 4),
      "stopword_ratio" -> round(nStop.cast("double") / greatest(nTok, lit(1)), 4),
      "uniq_ratio" -> round(nUniq.cast("double") / greatest(nTok, lit(1)), 4),
      "mean_word_len" -> round(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          greatest(nTok, lit(1)), 4))
  }

  /** Composite quality score in [0,1]: rewards stopword presence and
    * lexical diversity, penalizes punctuation/digit noise — the usual
    * cheap pretraining-corpus heuristics.
    *
    * Deliberately NOT rounded: the factors are the (rounded,
    * cross-engine-equal) feature ratios, so the IEEE product is
    * bit-identical across engines — but re-rounding the product is NOT
    * (a product landing exactly on a 5e-5 boundary, e.g. 0.18055,
    * rounds differently under Spark's shortest-decimal HALF_UP vs an
    * engine rounding the binary value; observed at sf0.01, q38).
    */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text).toMap
    val lenOk = when(f("n_tokens") >= 10 && f("n_tokens") <= 100000, 1.0)
      .otherwise(0.3)
    val stopOk = when(f("stopword_ratio") >= 0.05, 1.0).otherwise(0.5)
    val noise = f("punct_ratio") + f("digit_ratio")
    lenOk * stopOk * f("uniq_ratio") * (lit(1.0) - least(noise, lit(1.0)))
  }

  // ---------------------------------------------------------------------
  // Language identification (stopword-profile heuristic)
  // ---------------------------------------------------------------------

  private val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "von", "mit", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "dans", "une", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "por", "para", "una", "que"))

  /** Cheap n-gram/stopword language id: argmax over per-language
    * stopword hits; "und" (undetermined) when no profile scores.
    * Computed by the native one-pass LangIdExpression — the composed
    * form inlined the regex tokenizer into every profile filter
    * (~9 splits per row).
    */
  def langId(text: Column): Column =
    graft.plans.TextExprs.langid(
      org.apache.spark.sql.SparkSession.active, text)

  /** The declarative language-id form (kept as the cross-checkable
    * reference for the native expression's semantics; also the shape
    * the DuckDB oracle mirrors).
    */
  def langIdColumnar(text: Column): Column = {
    val toks = tokens(text)
    val scores = langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words: _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && s > 0, lang).otherwise(acc)
    }
  }

  /** Feature-hashed text embedding (native one-pass expression;
    * near-duplicate texts map to near-parallel vectors — the input to
    * the embedding-cosine near-dup path).
    */
  def hashEmbedding(text: Column, dim: Int = 64): Column =
    graft.plans.TextExprs.hashEmbedding(
      org.apache.spark.sql.SparkSession.active, text, dim)

  /** Document-table feature extraction used by entry queries: ONE
    * map-only select — every column is a pure expression over the same
    * row, so there is nothing to join (a self-join here would be a
    * needless full shuffle of the corpus).
    */
  def documentStats(docs: DataFrame): DataFrame =
    docs.select(
      (col("doc_id") +:
        qualityFeatures(col("text")).map { case (n, c) => c.as(n) }) ++
      Seq(
        qualityScore(col("text")).as("quality"),
        langId(col("text")).as("lang_pred"),
        fingerprintMd5(col("text")).as("fp_md5"),
        bpeTokenCount(col("text")).as("n_bpe_tokens")): _*)
}
