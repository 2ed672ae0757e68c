package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewAgg
import graft.plans.GraftFunctions
import graft.sources.Synth

/** Custom Catalyst expression (codegen path + SQL registration) and
  * salted skew aggregation equivalence.
  */
class PlansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("PStartExpression: Column API, SQL registration, codegen plan") {
    import spark.implicits._
    val df = Seq("p.Val600Glu", "P.GLU55FS", "c.1799T>A", "MUTATION")
      .toDF("s")
    GraftFunctions.register(spark)
    val got = df.select(GraftFunctions.pStart(col("s")).as("p"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("P.VAL600"), Some("P.GLU55"), None, None))

    df.createOrReplaceTempView("pstart_probe")
    val sqlGot = spark.sql("SELECT p_start(s) FROM pstart_probe")
      .collect().map(r => Option(r.getString(0)))
    assert(sqlGot.toSeq == Seq(Some("P.VAL600"), Some("P.GLU55"), None, None))

    // agreement with the pure-Scala rule on generated strings
    for (s <- Seq("p.Pro61=", "p.Ter130Tyrext*?", "P.VAL600", "x")) {
      val viaExpr = df.sparkSession.sql(s"SELECT p_start('$s')").collect()(0)
      assert(Option(viaExpr.getString(0)) ==
        graft.functions.Nomenclature.extractPStart(s))
    }

    // the expression participates in whole-stage codegen (no ScalaUDF);
    // probe on a range source (a local Seq folds to LocalTableScan)
    val plan = spark.range(100)
      .select(GraftFunctions.pStart(concat(lit("P.VAL"), col("id"))))
      .queryExecution.executedPlan.toString
    // "*(n)" marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("salted aggregation equals direct groupBy on skewed data") {
    import spark.implicits._
    val cfg = Synth.TurnGenConfig(nConvs = 20, turnsPerConv = 10,
      nGenes = 12, hotConvs = 2, hotMult = 15)
    val ann = Pipeline.annotate(
      spark.createDataset(Synth.transcriptRows(cfg)),
      Pipeline.cachedIndex(spark, 12)).toDF()

    val salted = SkewAgg.saltedTierCounts(ann, salts = 8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val direct = ann.groupBy(col("conv_id"))
      .agg(
        count(when(col("highest_tier") === "tier_1", 1)).as("a"),
        count(when(col("highest_tier") === "tier_1b", 1)).as("b"),
        count(when(col("highest_tier") === "tier_2", 1)).as("c"),
        count(when(col("highest_tier") === "tier_3", 1)).as("d"),
        count(when(col("highest_tier") === "tier_4", 1)).as("e"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(salted == direct)
    // hot conversations really are hot in the fixture
    val sizes = ann.groupBy("conv_id").count().collect().map(_.getLong(1))
    assert(sizes.max >= 10 * sizes.min)

    val lists = SkewAgg.saltedTurnList(ann, salts = 8).collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    for ((conv, idxs) <- lists)
      assert(idxs == idxs.sorted, s"unsorted salted list for $conv")
    assert(lists.values.map(_.size).sum == ann.count())
  }

  test("native shingles match the declarative form set-for-set") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
    // hash functions differ (splitmix vs xxhash64) but both hash the
    // same shingle STRINGS, so per-doc set sizes and every pairwise
    // intersection size must agree exactly
    val both = docs.select(col("doc_id"),
      graft.operators.TextOps.shingles(col("text"), 3).as("nat"),
      graft.operators.TextOps.shinglesColumnar(col("text"), 3).as("dec"))
      .collect()
    for (r <- both)
      assert(r.getSeq[Long](1).size == r.getSeq[Long](2).size,
        s"shingle cardinality drift for doc ${r.get(0)}")
    val pairs = both.take(30)
    for (a <- pairs; b <- pairs if a.getLong(0) < b.getLong(0)) {
      val ni = a.getSeq[Long](1).toSet.intersect(b.getSeq[Long](1).toSet).size
      val di = a.getSeq[Long](2).toSet.intersect(b.getSeq[Long](2).toSet).size
      assert(ni == di, s"pairwise intersection drift ${a.get(0)}/${b.get(0)}")
    }
    // edge cases the quirk replication covers: empty and short texts
    import spark.implicits._
    val edge = Seq("", "   ", "one", "one two", "one two three four")
      .toDF("text")
      .select(graft.operators.TextOps.shingles(col("text"), 3).as("nat"),
        graft.operators.TextOps.shinglesColumnar(col("text"), 3).as("dec"))
      .collect()
    for (r <- edge)
      assert(r.getSeq[Long](0).size == r.getSeq[Long](1).size, r.toString)
  }

  test("native langid matches the declarative form on the corpus + edges") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val drift = docs.select(
      graft.operators.TextOps.langId(col("text")).as("nat"),
      graft.operators.TextOps.langIdColumnar(col("text")).as("dec"))
      .filter(col("nat") =!= col("dec")).count()
    assert(drift == 0)
    val edge = Seq("", "   ", "la la la", "the la", "zzz qqq",
      "der und la le el y", "est est la la").toDF("text")
      .select(graft.operators.TextOps.langId(col("text")).as("nat"),
        graft.operators.TextOps.langIdColumnar(col("text")).as("dec"))
      .collect()
    for (r <- edge) assert(r.getString(0) == r.getString(1), r.toString)
  }

  test("native quantized cosine is bit-identical to the Column form") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = emb.limit(40).select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(emb.limit(40).select(col("vec_id").as("ib"), col("embedding").as("vb")))
      .filter(col("ia") < col("ib"))
    val drift = pairs.select(
      graft.operators.Similarity.quantizedCosine(col("va"), col("vb")).as("nat"),
      graft.operators.Similarity.quantizedCosineColumnar(col("va"), col("vb")).as("dec"))
      .filter(col("nat") =!= col("dec")).count()
    assert(drift == 0)
  }

  test("native quantized dot is bit-identical to the Column form") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = emb.select(col("embedding").as("va")).limit(200)
      .crossJoin(emb.select(col("embedding").as("vb")).limit(50))
    val drift = pairs.select(
      graft.operators.Similarity.quantizedDot(col("va"), col("vb")).as("nat"),
      graft.operators.Similarity.quantizedDotColumnar(col("va"), col("vb")).as("dec"))
      .filter(col("nat") =!= col("dec")).count()
    assert(drift == 0)
  }

  test("native hyperplane signature is bit-identical to the Column form") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(300)
    for ((nBits, seed) <- Seq((4, 7), (12, 9), (16, 23))) {
      val drift = emb.select(
        graft.operators.Similarity.hyperplaneSig(col("embedding"), nBits, seed).as("nat"),
        graft.operators.Similarity.hyperplaneSigColumnar(col("embedding"), nBits, seed).as("dec"))
        .filter(col("nat") =!= col("dec")).count()
      assert(drift == 0, s"signature drift at nBits=$nBits seed=$seed")
    }
  }

  test("multi-table hyperplane signatures == per-table signatures, bit for bit") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(300)
    for ((nBits, nTables, base) <- Seq((10, 8, 101), (4, 8, 7), (12, 3, 9))) {
      val drift = emb.select(
        graft.operators.Similarity.hyperplaneSigs(
          col("embedding"), nBits, nTables, base).as("multi"),
        array((0 until nTables).map(t =>
          graft.operators.Similarity.hyperplaneSig(
            col("embedding"), nBits, base + t)): _*).as("per"))
        .filter(col("multi") =!= col("per")).count()
      assert(drift == 0,
        s"multi-table drift at nBits=$nBits nTables=$nTables base=$base")
    }
  }
}
