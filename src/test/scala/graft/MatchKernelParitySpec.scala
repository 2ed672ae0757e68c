package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Nomenclature
import graft.model.Cts
import graft.operators.{CtConfig, DimIndex, MatchKernel}
import graft.ref.RefModel
import graft.sources.Synth

/** Bit-for-bit parity of the Spark match kernel against the naive
  * RefModel transcription of the reference pipeline, on deterministic
  * synthetic data covering every tier path (SURVEY.md §5.2 item 2).
  */
class MatchKernelParitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val seed = 42L
  private val nGenes = 12
  private val ctCfg = CtConfig(
    diseaseNameNotIn = Seq("small"),
    diseaseNameIn = Seq("bladder"),
    altDiseaseNames = Seq("cancer", "solid tumor"))

  private lazy val dimRows = Synth.evidenceRows(nGenes, seed)
  private lazy val idx = {
    val dim = Synth.evidenceDim(spark, nGenes, seed)
    DimIndex.build(spark, dim.toDF(), ctCfg, Left("highest"))
  }
  private lazy val refVarMap = {
    val vm = RefModel.buildVarMap(dimRows)
    RefModel.annotateCt(vm, List("small"), List("bladder"),
      List("cancer", "solid tumor"))
    RefModel.filterCt(vm, Left("highest"))
    vm
  }

  private val turnCfg = Synth.TurnGenConfig(
    nConvs = 40, turnsPerConv = 12, nGenes = nGenes,
    unknownGeneFrac = 0.2, seed = seed)

  test("tier classification parity across all data types") {
    val turns = Synth.transcriptRows(turnCfg)
    assert(turns.nonEmpty)
    var checked = 0
    val tierSeen = collection.mutable.Set.empty[String]
    for (t <- turns) {
      val got = MatchKernel.annotateTurn(t, idx)
      val p = MatchKernel.parse(t)
      val want = p.dataType match {
        case "SNV" => RefModel.matchVariantsInCivic(
          p.geneKey, p.variants, refVarMap, "SNV", p.impacts, p.exons)
        case "CNV" => RefModel.matchVariantsInCivic(
          p.geneKey, p.variants, refVarMap, "CNV")
        case _ => RefModel.matchExpressionInCivic(p.geneKey,
          Nomenclature.getExpressionStrings(p.geneKey, p.logfc), refVarMap)
      }
      assert(got.tier_1 == want.tier1, s"tier_1 mismatch for $t")
      assert(got.tier_1b == want.tier1b, s"tier_1b mismatch for $t")
      assert(got.tier_2 == want.tier2, s"tier_2 mismatch for $t")
      assert(got.tier_3 == want.tier3, s"tier_3 mismatch for $t")
      assert(got.tier_4 == want.tier4, s"tier_4 mismatch for $t")
      tierSeen += got.highest_tier
      checked += 1
    }
    assert(checked == turns.size)
    // the fixture must exercise every tier path
    assert(tierSeen == Set("tier_1", "tier_1b", "tier_2", "tier_3", "tier_4"),
      s"fixture coverage gap: $tierSeen")
  }

  test("consensus drug-support parity (canonical drug, ct order)") {
    val turns = Synth.transcriptRows(turnCfg.copy(nConvs = 25))
    var withSupport = 0
    for (t <- turns) {
      val got = MatchKernel.annotateTurn(t, idx)
      val p = MatchKernel.parse(t)
      val want = p.dataType match {
        case "SNV" => RefModel.matchVariantsInCivic(
          p.geneKey, p.variants, refVarMap, "SNV", p.impacts, p.exons)
        case "CNV" => RefModel.matchVariantsInCivic(
          p.geneKey, p.variants, refVarMap, "CNV")
        case _ => RefModel.matchExpressionInCivic(p.geneKey,
          Nomenclature.getExpressionStrings(p.geneKey, p.logfc), refVarMap)
      }
      val ref = RefModel.processDrugSupport(
        Seq((p.geneKey, t.text, want)), refVarMap)
      def canon(xs: Seq[String]): Seq[String] =
        xs.sortBy { s =>
          val parts = s.split(":")
          (parts.dropRight(2).mkString(":"), Cts.rank(parts(parts.length - 2).toLowerCase))
        }
      for ((tier, gotDs) <- Seq(
          "tier_1" -> got.ds_tier_1, "tier_1b" -> got.ds_tier_1b,
          "tier_2" -> got.ds_tier_2, "tier_3" -> got.ds_tier_3)) {
        val wantDs = ref((p.geneKey, t.text, tier)).drugSupport
        assert(canon(gotDs) == canon(wantDs),
          s"drug support mismatch for $t tier=$tier")
        if (gotDs.nonEmpty) withSupport += 1
      }
    }
    assert(withSupport > 10, s"fixture too weak: only $withSupport tier-supports")
  }

  test("index covers sentinel and fallback paths") {
    // a gene with records but, for some data type, none of that kind
    val anySentinel = Synth.transcriptRows(turnCfg).exists { t =>
      val a = MatchKernel.annotateTurn(t, idx)
      a.tier_3.exists(_.startsWith("NON_"))
    }
    assert(anySentinel, "fixtures never hit NON_*_MATCH_ONLY sentinel")
  }
}
