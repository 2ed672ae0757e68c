package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate / exact nearest-neighbor search over an embedding column
  * (ARRAY<FLOAT>).
  *
  * - `bruteTopK`: exact cosine top-k of a (small, broadcast) query set
  *   against the corpus — the correctness baseline. One broadcast join,
  *   one shuffle for the per-query top-k.
  * - `lshTopK`: random-hyperplane LSH — corpus and queries are bucketed
  *   by sign patterns; candidates share a bucket in >=1 table. The scale
  *   path: the corpus is never cross-joined.
  * - `quantizedDot`: integer-quantized dot product — deterministic
  *   across engines (used by the SQL oracle; float summation order is
  *   engine-specific, int arithmetic is exact).
  */
object Similarity {

  /** Sequential-fold double dot product of two float arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Integer-quantized dot product: round(x*scale) per slot, exact
    * 64-bit integer accumulation.
    */
  def quantizedDot(a: Column, b: Column, scale: Int = 1000): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        round(x.cast("double") * scale).cast("long") *
        round(y.cast("double") * scale).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Exact cosine top-k: broadcast the query set, score map-side,
    * per-query top-k via window rank.
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int = 10): DataFrame = {
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("item_vec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val scored = c.join(broadcast(q), col("item_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("item_vec"), col("query_vec")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("item_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("item_id"), col("cos"))
  }

  /** IVF (inverted-file) ANN: k-means centroids partition the corpus
    * into cells; queries probe the `nProbe` nearest cells and re-rank
    * candidates exactly. The 100 TB scale path: the corpus is bucketed
    * once (map + small centroid broadcast), queries touch
    * nProbe/nCentroids of the data, and nothing ever cross-joins.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int = 10, nCentroids: Int = 16,
              nProbe: Int = 4, seed: Long = 7L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.{Vector => MlVector, Vectors}
    val toVec = udf((a: Seq[Float]) =>
      Vectors.dense(a.map(_.toDouble).toArray))
    val feat = corpus.withColumn("features", toVec(col(vecCol)))
    val model = new KMeans().setK(nCentroids).setSeed(seed)
      .setMaxIter(10).fit(feat)
    val centers: Array[Array[Double]] = model.clusterCenters.map(_.toArray)

    def dist2(a: Seq[Float], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { val d = a(i) - c(i); s += d * d; i += 1 }
      s
    }
    val assignUdf = udf((a: Seq[Float]) =>
      centers.indices.minBy(i => dist2(a, centers(i))))
    val probeUdf = udf((a: Seq[Float]) =>
      centers.indices.sortBy(i => dist2(a, centers(i))).take(nProbe))

    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("item_vec"))
      .withColumn("cell", assignUdf(col("item_vec")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
      .withColumn("cell", explode(probeUdf(col("query_vec"))))
    val cand = c.join(broadcast(q), Seq("cell"))
      .filter(col("item_id") =!= col("query_id"))
      .dropDuplicates("query_id", "item_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("item_id"))
    cand.withColumn("cos", round(cosine(col("item_vec"), col("query_vec")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("item_id"), col("cos"))
  }

  /** Random-hyperplane signature: bit j = sign(dot(v, h_j)) where the
    * hyperplane h_j is a deterministic pseudo-random +-1 vector derived
    * from (j, slot index) hashes — no stored planes, reproducible
    * everywhere.
    */
  def hyperplaneSig(vec: Column, nBits: Int = 16, seed: Int = 7): Column =
    (0 until nBits).map { j =>
      // +-1 pattern per slot: parity of xxhash64(slot, j, seed)
      val s = aggregate(
        zip_with(vec,
          transform(sequence(lit(0), size(vec) - 1),
            i => xxhash64(i, lit(j), lit(seed)).bitwiseAND(lit(1L)) * 2 - 1),
          (x, sgn) => x.cast("double") * sgn.cast("double")),
        lit(0.0), (acc, x) => acc + x)
      when(s > 0, shiftleft(lit(1), j)).otherwise(lit(0))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed ANN: candidates = pairs sharing a signature in >=1 of
    * `nTables` independent hash tables; exact cosine re-ranking on the
    * candidate set only.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int = 10, nBits: Int = 12,
              nTables: Int = 4): DataFrame = {
    def sigs(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        explode(array((0 until nTables).map { t =>
          struct(lit(t).as("table"),
            hyperplaneSig(col(vecCol), nBits, seed = 7 + t).as("sig"))
        }: _*)).as("ts"))
        .select(col(id), col(vec), col("ts.table"), col("ts.sig"))
    val c = sigs(corpus, "item_id", "item_vec")
    val q = sigs(queries, "query_id", "query_vec")
    val cand = c.join(q,
        c("table") === q("table") && c("sig") === q("sig") &&
        col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("query_vec"), col("item_id"), col("item_vec"))
      .dropDuplicates("query_id", "item_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("item_id"))
    cand.withColumn("cos", round(cosine(col("item_vec"), col("query_vec")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("item_id"), col("cos"))
  }
}
