package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring duplicate-SPAN detection (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", arXiv:2107.06499,
  * re-expressed relationally): the famous suffix-array pass that finds
  * token ranges repeated verbatim anywhere in the corpus — the dedup
  * level BETWEEN whole-document near-dup (MinHash/SimHash, NearDup)
  * and paragraph dedup: boilerplate sentences, license headers and
  * quoted passages that repeat inside otherwise-unique documents.
  *
  * The paper builds one giant suffix array — a single-machine
  * formulation. The Spark-native shape replaces it with fixed-width
  * window hashing (the standard distributed approximation, same family
  * as the paper's own MinHash baseline):
  *
  *  1. every k-token window of every document hashes to 64 bits
  *     (map-only; one tokenize per row, windows via a higher-order
  *     transform over the token array);
  *  2. a corpus-wide count per window hash (groupBy on 8-byte keys —
  *     map-side partial aggregation bounds the shuffle by the
  *     per-partition DISTINCT window count, not the token count);
  *  3. windows whose hash occurs >= minCount times corpus-wide are
  *     duplicated; a semi-join marks their positions (equi-join on the
  *     8-byte hash — AQE broadcasts the duplicated-hash side when it
  *     is small, which it is on real corpora where duplication is the
  *     tail, and falls back to a shuffle join when it is not);
  *  4. per document, overlapping/touching duplicated windows merge
  *     into maximal spans (gaps-and-islands over a window PARTITIONED
  *     BY doc — per-partition state is bounded by a single document's
  *     length, so this window never concentrates a corpus-scale key
  *     the way the connected-components stars can).
  *
  * Semantics vs the suffix array: a repeated substring of length
  * >= k tokens is found exactly (all its k-windows collide and merge
  * into one span covering it); repeats shorter than k are invisible —
  * k IS the paper's minimum match length (they use 50 BPE tokens;
  * tests use a small k so synthetic fixtures trip it). Within-document
  * repetition counts toward minCount, as in the paper. The only
  * deviation from exactness is 64-bit hash collisions
  * (P ~ W^2/2^65 for W distinct windows: at a 10^12-token corpus,
  * ~0.03 expected false window matches — and a false match only
  * widens one span by one window).
  *
  * Returns (doc_id, span_start, span_end, span_tokens): token-index
  * spans, end exclusive, ordered within a doc by span_start. Documents
  * with no duplicated window emit no row. Callers remove or mask the
  * spans; the spans themselves are the audit trail.
  */
object SpanDedup {

  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 8, minCount: Int = 2): DataFrame = {
    require(k >= 1, s"window width k must be >= 1, got $k")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    // (doc_id, pos, win_h): one row per FULL k-token window, hashed by
    // the native one-pass expression (window_hashes): one tokenize
    // scan per row, no per-window string materialization (the
    // composed transform/slice/concat_ws form re-allocated every
    // window as a string — kept as the parity cross-check below).
    // The join/agg payload is 8-byte hashes — window TEXT never
    // shuffles. Docs shorter than k emit an empty array, which
    // posexplode drops.
    val wins = docs.select(col(idCol).as("doc_id"),
      posexplode(graft.plans.TextExprs.windowHashes(
        docs.sparkSession, col(textCol), k)))
      .toDF("doc_id", "pos", "win_h")
    spansFromWins(wins, k, minCount)
  }

  /** Declarative window derivation (the form `window_hashes` replaces):
    * positions identical, hash values engine-internal either way.
    * Parity-pinned in DataOpsSpec; not a hot path.
    */
  private[graft] def duplicateSpansColumnar(docs: DataFrame, idCol: String,
      textCol: String, k: Int, minCount: Int = 2): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= k)
    val wins = toks.select(col("doc_id"),
      posexplode(transform(
        sequence(lit(0), size(col("toks")) - k),
        i => xxhash64(concat_ws(" ", slice(col("toks"), i + 1, lit(k)))))))
      .toDF("doc_id", "pos", "win_h")
    spansFromWins(wins, k, minCount)
  }

  private def spansFromWins(wins: DataFrame, k: Int, minCount: Int): DataFrame = {
    // corpus-wide occurrence count per window hash; keep only the
    // duplicated tail. count(*) not countDistinct(doc): within-doc
    // repeats are duplication too (paper semantics).
    val dupH = wins.groupBy(col("win_h"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select(col("win_h"))
    // deliberate second derivation of `wins` (tokenize+explode runs
    // twice): at corpus scale the exploded window relation is ~tokens×
    // wider than the source and cannot be cached; two map-only passes
    // over the source beat materializing it (same trade as the
    // inverted-index jaccard path)
    val dupPos = wins.join(dupH, Seq("win_h"), "left_semi")
    // gaps-and-islands: windows at pos p cover [p, p+k); consecutive
    // duplicated windows with pos <= prev_pos + k overlap or touch —
    // one contiguous duplicated region. Window partitioned per doc.
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = dupPos
      .withColumn("prev", lag(col("pos"), 1).over(byDoc))
      .withColumn("new_island",
        when(col("prev").isNull || col("pos") > col("prev") + k, 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + k).cast("long").as("span_end"))
    spans.select(col("doc_id"), col("span_start"), col("span_end"),
      (col("span_end") - col("span_start")).as("span_tokens"))
  }

  /** Apply the span pass: drop every token inside a duplicated span and
    * reassemble the remainder — the transform the paper actually
    * performs on C4/LM1B (they delete the repeated range, keeping the
    * unique flanks). One equi-join on doc_id attaches each document's
    * (few) spans as an array; token filtering is then a per-row
    * higher-order `filter` over the token array — no token-level
    * shuffle (the exploded-token ∘ range-anti-join formulation would
    * shuffle every token in the corpus; this shuffles only doc-level
    * rows). Documents with no duplicated span pass through with
    * tokenizer normalization (lowercase, collapsed whitespace) —
    * clean_text is canonical-form for every row, so the operator is
    * idempotent.
    *
    * Returns (doc_id, clean_text, n_tok, n_removed); a fully-duplicated
    * document emits clean_text = ''.
    */
  def removeDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                           k: Int = 8, minCount: Int = 2): DataFrame = {
    val spans = duplicateSpans(docs, idCol, textCol, k, minCount)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"))
    docs.select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("toks"))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("spans", coalesce(col("spans"),
        array().cast("array<struct<span_start:bigint,span_end:bigint>>")))
      .select(col("doc_id"),
        concat_ws(" ", filter(col("toks"), (t, i) =>
          !exists(col("spans"), sp =>
            i >= sp.getField("span_start") && i < sp.getField("span_end"))))
          .as("clean_text"),
        size(col("toks")).cast("long").as("n_tok"),
        aggregate(col("spans"), lit(0L),
          (acc, sp) => acc + sp.getField("span_end") - sp.getField("span_start"))
          .as("n_removed"))
  }

  /** Corpus-level summary of the duplicated-span pass: per document,
    * how many tokens sit inside duplicated spans and the duplicated
    * fraction — the number the paper reports (3.1% of C4 tokens are
    * part of a >=50-token repeat) and the quantity a pipeline
    * thresholds on. Emits one row per input document (zero spans =
    * zero dup_tokens), so it composes as a filter stage.
    */
  def duplicateSpanStats(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 8, minCount: Int = 2): DataFrame = {
    val spans = duplicateSpans(docs, idCol, textCol, k, minCount)
      .groupBy(col("doc_id"))
      .agg(sum(col("span_tokens")).as("dup_tokens"),
        count(lit(1)).as("n_spans"))
    docs.select(col(idCol).as("doc_id"),
        size(TextOps.tokens(col(textCol))).cast("long").as("n_tok"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
  }
}
