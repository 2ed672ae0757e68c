package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CohortStats, ReformatCivic}
import graft.sources.{RawEvidenceLeaf, Synth}

/** S5 reformat_civic drug reshaping (reference query.py:214-246) and
  * A7 cohort stats (process_civic_predictions.py:101-287).
  */
class ReformatSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def leaf(et: String, drugs: Seq[String], inter: String) =
    RawEvidenceLeaf("G1", "1", "V600E", et, "CANCER", drugs, inter,
      "SUPPORTS", "SENSITIVITYRESPONSE", "A", "PUBMED", "1", "ACCEPTED", "SOMATIC")

  private def reshape(leaves: RawEvidenceLeaf*): Seq[(String, Int)] = {
    import spark.implicits._
    ReformatCivic.reshapeDrugs(spark.createDataset(leaves).toDF())
      .select(col("drug"), col("drug_order"))
      .as[(String, Int)].collect().toSeq
  }

  /** Driver-side transcription of the reference algorithm
    * (query.py:214-246) used as the parity oracle.
    */
  private def refReshape(drugsRaw: Seq[String], inter: Option[String]): List[String] = {
    var drugs = List.empty[String]
    for (d <- drugsRaw; n = d.trim.toUpperCase if !drugs.contains(n))
      drugs = drugs :+ n
    for (i <- inter.map(_.trim.toUpperCase) if i != "SUBSTITUTES")
      drugs = List(drugs.sorted.mkString("+"))
    if (drugs.isEmpty) List("NULL") else drugs
  }

  test("S5: COMBINATION/SEQUENTIAL sort + join, SUBSTITUTES explodes") {
    assert(reshape(leaf("PREDICTIVE", Seq("TRAMETINIB", "DABRAFENIB"), "Combination"))
      == Seq(("DABRAFENIB+TRAMETINIB", 0)))
    assert(reshape(leaf("PREDICTIVE", Seq("B", "A", "C"), "SEQUENTIAL"))
      == Seq(("A+B+C", 0)))
    assert(reshape(leaf("PREDICTIVE", Seq("B", "A"), "Substitutes")).toSet
      == Set(("B", 0), ("A", 1)))
  }

  test("S5: normalization, dedup (first occurrence), NULL backfill, [\"\"] quirk") {
    assert(reshape(leaf("PREDICTIVE", Seq(" dabrafenib ", "DABRAFENIB"), null))
      == Seq(("DABRAFENIB", 0)))
    // dedup keeps first occurrence before the combination sort
    assert(reshape(leaf("PREDICTIVE", Seq("b", "B ", "a"), "COMBINATION"))
      == Seq(("A+B", 0)))
    // PREDICTIVE without drugs and all non-PREDICTIVE leaves -> "NULL"
    assert(reshape(leaf("PREDICTIVE", Nil, null)) == Seq(("NULL", 0)))
    assert(reshape(leaf("PROGNOSTIC", Nil, null)) == Seq(("NULL", 0)))
    // reference quirk (query.py:227-236): empty drugs + a combining
    // interaction yield [""] (the join of nothing), NOT ["NULL"]
    assert(reshape(leaf("PREDICTIVE", Nil, "COMBINATION")) == Seq(("", 0)))
  }

  test("S5: non-PREDICTIVE evidence with drugs raises (query.py:238-240)") {
    val e = intercept[Exception] {
      reshape(leaf("DIAGNOSTIC", Seq("DABRAFENIB"), null))
    }
    assert(e.getMessage.contains("PREDICTIVE"))
  }

  test("S5: generator parity vs reference-transcribed reshape on every leaf") {
    import spark.implicits._
    val raw = Synth.rawEvidenceRows(12, Pipeline.DefaultSeed)
    val got = ReformatCivic.reshapeDrugs(spark.createDataset(raw).toDF())
      .select(col("gene_key"), col("var_id"), col("source_id"),
        col("drug_order"), col("drug"))
      .as[(String, String, String, Int, String)].collect()
      .groupBy(t => (t._1, t._2, t._3))
      .view.mapValues(_.sortBy(_._4).map(_._5).toList).toMap
    // the raw generator keys leaves by (gene, var, source_id) uniquely
    // often enough for a per-leaf comparison; collisions would compare
    // a concatenation, which only strengthens the check
    val want = raw.groupBy(l => (l.gene_key, l.var_id, l.source_id))
      .view.mapValues(_.toList.flatMap(l =>
        refReshape(l.drugs, Option(l.drug_interaction)))).toMap
    assert(got.keySet == want.keySet)
    for ((k, g) <- got) assert(g.sorted == want(k).sorted, s"leaf $k")
    // the reshaped dimension is consumable by the parity var_map builder
    val flat = raw.filter(_.evidence_type == "PREDICTIVE").take(5).flatMap { l =>
      refReshape(l.drugs, Option(l.drug_interaction)).map { d =>
        graft.model.EvidenceRow(l.gene_key, l.var_id, l.var_name, Nil,
          List("MISSENSE_VARIANT"), 0L, l.var_id + "-0", l.var_name, 1.0, 1,
          l.evidence_type, l.disease, d, l.direction, l.significance,
          l.level, l.source_type, l.source_id, l.evidence_status,
          l.evidence_status, l.variant_origin, None)
      }
    }
    assert(graft.ref.RefModel.buildVarMap(flat.toSeq).nonEmpty)
  }

  test("S5: randomized drug-list/interaction cases match the transcription") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pool = Vector("DAB", "tram ", " Vem", "cetux", "ERL", "dab", "X+Y")
    val inters = Vector(null, null, "SUBSTITUTES", "Substitutes",
      "COMBINATION", "SEQUENTIAL", " sequential ")
    val cases = (0 until 300).map { i =>
      val n = rnd.nextInt(4) // 0..3 drugs
      val drugs = Seq.fill(n)(pool(rnd.nextInt(pool.size)))
      (i, drugs, inters(rnd.nextInt(inters.size)))
    }
    val raw = cases.map { case (i, drugs, inter) =>
      RawEvidenceLeaf(s"G$i", i.toString, "V", "PREDICTIVE", "CANCER",
        drugs, inter, "SUPPORTS", "S", "A", "PUBMED", i.toString,
        "ACCEPTED", "SOMATIC")
    }
    val got = ReformatCivic.reshapeDrugs(spark.createDataset(raw).toDF())
      .select(col("var_id"), col("drug_order"), col("drug"))
      .as[(String, Int, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toList).toMap
    for ((i, drugs, inter) <- cases) {
      val want = refReshape(drugs, Option(inter))
      assert(got(i.toString) == want,
        s"case $i drugs=$drugs inter=$inter: got ${got(i.toString)}, want $want")
    }
  }

  test("A7: cohort stats tier fractions and drug-consensus distribution") {
    val stats = CohortStats.perConversation(Pipeline.run(spark,
      Synth.TurnGenConfig(nConvs = 30, turnsPerConv = 10, nGenes = 20)))
      .collect().map(r => r.getAs[String]("conv_id") -> r).toMap
    assert(stats.size == 30)
    for ((_, r) <- stats) {
      val n = r.getAs[Long]("n_turns")
      val tiers = Seq("n_tier_1", "n_tier_1b", "n_tier_2", "n_tier_3", "n_tier_4")
        .map(r.getAs[Long](_)).sum
      assert(tiers == n, "tier counts partition the turns")
      val fc = r.getAs[Double]("frac_civic")
      assert(fc >= 0.0 && fc <= 1.0)
      assert(math.abs(fc - (n - r.getAs[Long]("n_tier_4")).toDouble / n) < 1e-3)
      val drugs = r.getAs[Long]("n_drugs")
      val cls = Seq("n_all_support_drugs", "n_all_resistance_drugs",
        "n_all_conflict_drugs", "n_all_unknown_drugs", "n_mixed_drugs")
        .map(r.getAs[Long](_)).sum
      assert(cls == drugs, "consensus classes partition the drugs")
    }
    // hand-checked single conversation: one tier_1 turn with two drug
    // supports of opposite polarity for the same drug -> 1 mixed drug
    import spark.implicits._
    val one = Seq(
      operators.Annotation("c1", 0, "user", new java.sql.Timestamp(0L),
        "G1", "SNV", Seq("100"), Nil, Nil, Nil, tier_4 = false, "tier_1",
        Seq("DAB:CT:CIVIC_SUPPORT", "DAB:CT:CIVIC_RESISTANCE"), Nil, Nil, Nil),
      operators.Annotation("c1", 1, "user", new java.sql.Timestamp(0L),
        "G1", "SNV", Nil, Nil, Nil, Nil, tier_4 = true, "tier_4",
        Nil, Nil, Nil, Nil))
    val s1 = CohortStats.perConversation(one.toDF()).collect()(0)
    assert(s1.getAs[Long]("n_tier_1") == 1 && s1.getAs[Long]("n_tier_4") == 1)
    assert(s1.getAs[Double]("frac_civic") == 0.5)
    assert(s1.getAs[Double]("mean_matched_tier1") == 1.0)
    assert(s1.getAs[Long]("n_drugs") == 1 && s1.getAs[Long]("n_mixed_drugs") == 1)
  }
}
