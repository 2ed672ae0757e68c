package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Turn
import graft.operators.VersionedDim
import graft.sources.Synth

/** Slowly-changing dimension: annotation picks the snapshot effective
  * at the turn's event time.
  */
class VersionedDimSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("turns before/after a dimension change resolve against their epoch") {
    import spark.implicits._
    val epoch0 = 1700000000000L
    val epoch1 = epoch0 + 86400000L // v2 effective one day later
    // v1 knows 8 genes; v2 knows 12 (ENT0008..ENT0011 appear)
    val v1 = Synth.evidenceDim(spark, 8, 42L).toDF()
    val v2 = Synth.evidenceDim(spark, 12, 42L).toDF()
    val bc = VersionedDim.build(spark, Seq(epoch0 -> v1, epoch1 -> v2),
      Pipeline.defaultCt)

    def turn(idx: Int, gene: String, off: Long) =
      Turn("c1", idx, "assistant", s"$gene AMP", "", new Timestamp(epoch0 + off))
    val turns = spark.createDataset(Seq(
      turn(0, "ENT0009", 1000L),              // before v2 -> unknown gene
      turn(1, "ENT0009", 86400000L + 1000L),  // after v2 -> known
      turn(2, "ENT0001", 1000L),              // stable gene, v1
      turn(3, "ENT0001", 86400000L + 1000L))) // stable gene, v2

    val got = VersionedDim.annotate(turns, bc).collect()
      .map(a => a.turn_idx -> a.highest_tier).toMap
    assert(got(0) == "tier_4", "ENT0009 must be unknown before its epoch")
    assert(got(1) != "tier_4", "ENT0009 must resolve after the v2 epoch")
    assert(got(2) == got(3), "stable gene resolves identically across epochs")
  }

  test("epoch lookup: boundaries and monotonicity") {
    import spark.implicits._
    val v = Synth.evidenceDim(spark, 4, 42L).toDF()
    val bc = VersionedDim.build(spark,
      Seq(1000L -> v, 2000L -> v, 3000L -> v), Pipeline.defaultCt)
    val idx = bc.value
    assert(idx.at(500L) eq idx.versions(0))   // before first epoch
    assert(idx.at(1000L) eq idx.versions(0))
    assert(idx.at(1999L) eq idx.versions(0))
    assert(idx.at(2000L) eq idx.versions(1))
    assert(idx.at(99999L) eq idx.versions(2))
  }
}
