package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at corpus scale: MinHash+LSH banding,
  * SimHash hamming banding, and exact n-gram Jaccard verification.
  *
  * Scale shape: signatures are map-only; the ONLY shuffle is on LSH
  * band buckets (tiny keys), and the candidate self-join runs on the
  * bucket-grouped id lists — never an all-pairs cross join. This is the
  * standard shingle -> minhash -> band -> bucket-join pipeline.
  */
object NearDup {

  /** k minhash values over a shingle array. Each hash h_j(x) =
    * xxhash64-mix of (shingle, j); array_min per j. Pure Columns —
    * k array traversals, all inside codegen.
    */
  def minhashSignature(shingleCol: Column, k: Int = 32): Column =
    array((0 until k).map { j =>
      array_min(transform(shingleCol, s => xxhash64(s, lit(j))))
    }: _*)

  /** LSH band keys: hash r consecutive signature slots per band.
    * Probability two docs share a band = 1-(1-J^r)^b.
    */
  def bandKeys(sigCol: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",",
          slice(sigCol, b * rows + 1, rows))).as("bucket"))
    }: _*)

  /** Candidate near-duplicate pairs via MinHash LSH, verified with
    * exact Jaccard over the shingle sets. Returns (doc_a, doc_b,
    * jaccard) with doc_a < doc_b, jaccard >= threshold.
    */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      nShingle: Int = 3, k: Int = 32,
                      bands: Int = 8, threshold: Double = 0.7): DataFrame = {
    val rows = k / bands
    val withSig = docs
      .select(col(idCol).as("doc"), TextOps.shingles(col(textCol), nShingle).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), k))
    // explode band keys -> shuffle on (band, bucket) only
    val banded = withSig
      .select(col("doc"), col("sh"),
        explode(bandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("doc"), col("sh"), col("bk.band"), col("bk.bucket"))
    // bucket self-join: pairs co-located in >=1 band
    val a = banded.alias("a")
    val b = banded.alias("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
    // exact verification on the candidate set
    cand
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Dedup plan from near-dup pairs: keep the smallest id of each
    * connected component's star (greedy: drop any doc that has a
    * near-dup with a smaller id — one pass, no iterative connected
    * components; adequate for dedup-keep-one semantics).
    */
  def dedupKeepFirst(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    docs.join(pairs.select(col("doc_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  // ---------------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------------

  /** 64-bit SimHash over token hashes: bit i of the signature is the
    * sign of sum over tokens of (+1/-1 for bit i of xxhash64(token)).
    * Pure Columns: per-bit popcount via aggregate over the token-hash
    * array (64 aggregates, all codegen).
    */
  def simhash64(text: Column): Column = {
    val hashes = transform(TextOps.tokens(text), t => xxhash64(t))
    val n = size(hashes)
    (0 until 64).map { i =>
      val ones = size(filter(hashes,
        h => shiftright(h, i).bitwiseAND(lit(1L)) === lit(1L)))
      // bit set when ones > n/2 (majority of +1 contributions)
      when(ones * 2 > n, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dups within maxHamming, using the pigeonhole banding
    * trick: split the 64-bit signature into (maxHamming+1) chunks — two
    * docs within the distance bound must agree on at least one chunk,
    * so the join key is (chunk index, chunk value), never all-pairs.
    */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val nChunks = maxHamming + 1
    val chunkBits = 64 / nChunks
    val withSig = docs.select(col(idCol).as("doc"),
      simhash64(col(textCol)).as("sig"))
    val chunks = withSig.select(col("doc"), col("sig"),
      explode(array((0 until nChunks).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sig"), c * chunkBits)
            .bitwiseAND(lit((1L << chunkBits) - 1)).as("v"))
      }: _*)).as("ck"))
      .select(col("doc"), col("sig"), col("ck.chunk"), col("ck.v"))
    val a = chunks.alias("a"); val b = chunks.alias("b")
    a.join(b,
        col("a.chunk") === col("b.chunk") && col("a.v") === col("b.v") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        hamming(col("a.sig"), col("b.sig")).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxHamming)
  }
}
