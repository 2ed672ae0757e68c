package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import graft.operators.Multimodal

/** Pins the multimodal codec surface: the REAL BMP/WAV codecs are
  * cross-checked against committed golden files produced by an
  * INDEPENDENT encoder (python struct packing — see
  * src/test/resources/golden.{bmp,wav}), round-trip property tests pin
  * encode/decode identity and the real nearest-neighbor resize, and
  * golden-binary fixtures freeze the remaining ===STUB=== video blob
  * layout so a future real video codec swap is observable at exactly
  * that seam.
  */
class MultimodalSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100), p)
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

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/$name")
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  test("REAL BMP codec decodes an independently-encoded golden file") {
    val b = resource("golden.bmp") // 4x2, written by python struct, not our encoder
    assert(Multimodal.decodeBmp(b) == ((4, 2)))
    assert(Multimodal.decodeMeta(b) == ((4, 2, 1)))
    // every pixel, exact (top-left origin)
    val want = Seq(
      (0, 0, 0xFF0000), (1, 0, 0x00FF00), (2, 0, 0x0000FF), (3, 0, 0xFFFFFF),
      (0, 1, 0x000000), (1, 1, 0x808080), (2, 1, 0x123456), (3, 1, 0xABCDEF))
    for ((x, y, p) <- want)
      assert(Multimodal.bmpPixel(b, x, y) == p,
        f"pixel ($x,$y): got ${Multimodal.bmpPixel(b, x, y)}%06x want $p%06x")
  }

  test("REAL WAV codec decodes an independently-encoded golden file") {
    val w = resource("golden.wav") // 8 kHz mono, 5 samples, python-encoded
    assert(Multimodal.decodeWav(w) == ((8000, 1, 5)))
    assert(Multimodal.decodeMeta(w) == ((8000, 1, 5)))
  }

  test("BMP encode/decode/pixel round-trip (property)") {
    check(Prop.forAll(Gen.choose(1, 24), Gen.choose(1, 24),
      Gen.choose(0L, 100000L)) { (w, h, seed) =>
      def pix(x: Int, y: Int): Int =
        (graft.sources.Synth.mix(seed, x.toLong, y.toLong) & 0xFFFFFF).toInt
      val b = Multimodal.encodeBmp(w, h, pix)
      Multimodal.decodeBmp(b) == ((w, h)) &&
        (0 until w).forall(x => (0 until h).forall(y =>
          Multimodal.bmpPixel(b, x, y) == pix(x, y)))
    })
  }

  test("WAV encode/decode round-trip (property)") {
    check(Prop.forAll(Gen.choose(1, 3), Gen.choose(1, 200),
      Gen.choose(1000, 48000)) { (ch, frames, rate) =>
      val samples = Array.tabulate(ch * frames)(i => (i * 31 - 500).toShort)
      val w = Multimodal.encodeWav(rate, ch, samples)
      Multimodal.decodeWav(w) == ((rate, ch, frames))
    })
  }

  test("REAL resize: nearest-neighbor resamples actual pixels") {
    val b = resource("golden.bmp")
    val r = Multimodal.resize(b, 2, 1)
    assert(Multimodal.decodeBmp(r) == ((2, 1)))
    // x' = x*4/2, y' = 0: picks source pixels (0,0) and (2,0)
    assert(Multimodal.bmpPixel(r, 0, 0) == 0xFF0000)
    assert(Multimodal.bmpPixel(r, 1, 0) == 0x0000FF)
    // upscale: every target pixel replicates its source neighbor
    val up = Multimodal.resize(b, 8, 4)
    assert(Multimodal.decodeBmp(up) == ((8, 4)))
    assert(Multimodal.bmpPixel(up, 0, 0) == 0xFF0000)
    assert(Multimodal.bmpPixel(up, 7, 3) == 0xABCDEF)
    assert(Multimodal.bmpPixel(up, 3, 1) == 0x00FF00) // (3*4/8, 1*2/4) = (1,0)
  }

  test("golden binaries: the remaining video STUB blob layout is frozen") {
    // (id) -> (width, height, nFrames, byteLen, md5 of the blob)
    val golden = Seq(
      2L -> (16, 68, 20, 1242, "88fd1fc3ecd01e21e71babdb5368a887"),
      7L -> (184, 28, 8, 615, "edfd95c6b7819c027625ab488c064485"))
    for ((id, (w, h, f, len, hash)) <- golden) {
      val b = Multimodal.syntheticBlob(id, "video")
      assert(md5(b) == hash, s"stub blob $id bytes changed")
      assert(b.length == len)
      assert(Multimodal.decodeStub(b) == ((w, h, f)), s"decode $id")
    }
    // corrupt magic must be rejected, not misparsed
    val bad = Multimodal.syntheticBlob(2L, "video").clone()
    bad(0) = 0x00
    assertThrows[IllegalArgumentException](Multimodal.decodeStub(bad))
  }

  test("stub resize keeps the video header contract") {
    check(Prop.forAll(Gen.choose(0L, 500L), Gen.choose(1, 4096),
      Gen.choose(1, 4096)) { (id, w, h) =>
      val b = Multimodal.syntheticBlob(id, "video")
      val (_, _, f0) = Multimodal.decodeStub(b)
      val r = Multimodal.resize(b, w, h)
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

  test("features: real image/audio statistics, bounded, deterministic") {
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
    // real image features: hand-checked channel means of golden.bmp
    // (sum R = 827, G = 895, B = 963 over 8 pixels)
    val golden = Seq(Multimodal.MediaRow(99L, "image", resource("golden.bmp")))
    val gf = Multimodal.features(spark.createDataset(golden), dim = 8)
      .as[(Long, String, Array[Float])].collect().head._3
    assert(math.abs(gf(0) - (827.0 / 8 / 127.5 - 1)) < 1e-6)
    assert(math.abs(gf(1) - (895.0 / 8 / 127.5 - 1)) < 1e-6)
    assert(math.abs(gf(2) - (963.0 / 8 / 127.5 - 1)) < 1e-6)
    // real audio features: golden.wav samples (0,1000,-1000,32767,-32768)
    // mean = -0.2, peak = 32768, zero-crossings = 3 of 4 transitions
    val gw = Multimodal.features(spark.createDataset(
      Seq(Multimodal.MediaRow(98L, "audio", resource("golden.wav")))), dim = 8)
      .as[(Long, String, Array[Float])].collect().head._3
    assert(math.abs(gw(0) - (-0.2 / 32768.0)) < 1e-9)
    assert(math.abs(gw(2) - (32768.0 / 32768.0 * 2 - 1)) < 1e-6)
    assert(math.abs(gw(3) - (3.0 / 4 * 2 - 1)) < 1e-6)
  }
}
