package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import graft.operators.Multimodal

/** Pins the ===STUB=== codec boundary (Multimodal.scala): golden-binary
  * fixtures freeze the blob byte layout the decode stub parses, and
  * property tests pin the resize header math and frame-sample counts —
  * so a future real codec swap is observable at exactly this seam.
  */
class MultimodalSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def md5(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  test("golden binaries: blob layout and decode are frozen") {
    // (id, kind) -> (width, height, nFrames, byteLen, md5 of the blob)
    val golden = Seq(
      (0L, "image") -> (84, 252, 1, 585, "d55c0c23ce1b089e61b020515af67279"),
      (1L, "audio") -> (168, 108, 1, 595, "07acbabdc36f70f9bc0c95bc67547b2a"),
      (2L, "video") -> (16, 68, 20, 1242, "88fd1fc3ecd01e21e71babdb5368a887"),
      (7L, "video") -> (184, 28, 8, 615, "edfd95c6b7819c027625ab488c064485"))
    for (((id, kind), (w, h, f, len, hash)) <- golden) {
      val b = Multimodal.syntheticBlob(id, kind)
      assert(md5(b) == hash, s"blob ($id,$kind) bytes changed")
      assert(b.length == len)
      assert(Multimodal.decodeStub(b) == ((w, h, f)), s"decode ($id,$kind)")
    }
    // corrupt magic must be rejected, not misparsed
    val bad = Multimodal.syntheticBlob(0L, "image").clone()
    bad(0) = 0x00
    assertThrows[IllegalArgumentException](Multimodal.decodeStub(bad))
  }

  test("resize rewrites header dims only; decode(resize(b)) == requested") {
    check(Prop.forAll(Gen.choose(0L, 500L), Gen.choose(1, 4096),
      Gen.choose(1, 4096), Gen.oneOf("image", "audio", "video")) {
      (id, w, h, kind) =>
        val b = Multimodal.syntheticBlob(id, kind)
        val (_, _, f0) = Multimodal.decodeStub(b)
        val r = Multimodal.resizeStub(b, w, h)
        val (w1, h1, f1) = Multimodal.decodeStub(r)
        (w1, h1) == ((w, h)) && f1 == f0 && r.length <= 16 + 64
    })
  }

  test("frame sampling emits ceil(nFrames/stride) rows per video") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, 60)
    for (stride <- Seq(1, 3, 5, 7)) {
      val got = Multimodal.sampleFrames(media, stride)
        .groupBy("media_id").count().as[(Long, Long)].collect().toMap
      val want = media.collect().filter(_.kind == "video").map { m =>
        val (_, _, f) = Multimodal.decodeStub(m.payload)
        m.media_id -> ((f + stride - 1) / stride).toLong
      }.toMap
      assert(got == want, s"stride=$stride")
    }
  }

  test("feature stub: fixed dim, bounded values, deterministic") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, 30)
    val a = Multimodal.features(media, dim = 8)
      .as[(Long, String, Array[Float])].collect().sortBy(_._1)
    val b = Multimodal.features(media, dim = 8)
      .as[(Long, String, Array[Float])].collect().sortBy(_._1)
    assert(a.length == 30)
    for (((id1, _, v1), (id2, _, v2)) <- a.zip(b)) {
      assert(id1 == id2 && v1.sameElements(v2), "features must be deterministic")
      assert(v1.length == 8 && v1.forall(x => x >= -1f && x <= 1f))
    }
  }
}
