package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import graft.operators.Multimodal

/** Pins the multimodal codec surface: the REAL BMP/WAV/y4m codecs are
  * cross-checked against committed golden files produced by an
  * INDEPENDENT encoder (python struct/byte packing — see
  * src/test/resources/golden.{bmp,wav,y4m}), round-trip property tests
  * pin encode/decode identity and the real nearest-neighbor resizes,
  * and hostile-header cases pin that corrupt payloads FAIL the decode
  * instead of being misparsed or spinning the frame walk.
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

  test("REAL audio resample: frame picks, channel preservation, round numbers") {
    // 4 frames at 8 kHz, stereo: L = 100,200,300,400 / R = -1,-2,-3,-4
    val src = Multimodal.encodeWav(8000, 2,
      Array[Short](100, -1, 200, -2, 300, -3, 400, -4))
    // downsample 2x: target frame i picks source frame i*8000/4000 = 2i
    val down = Multimodal.resampleWav(src, 4000)
    assert(Multimodal.decodeWav(down) == ((4000, 2, 2)))
    val dBuf = java.nio.ByteBuffer.wrap(down)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(Seq(dBuf.getShort(44), dBuf.getShort(46),
      dBuf.getShort(48), dBuf.getShort(50)) == Seq(100, -1, 300, -3))
    // upsample 2x: each source frame replicated twice (nearest)
    val up = Multimodal.resampleWav(src, 16000)
    assert(Multimodal.decodeWav(up) == ((16000, 2, 8)))
    val uBuf = java.nio.ByteBuffer.wrap(up)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(Seq(0, 1, 2, 3).map(i => uBuf.getShort(44 + i * 4)) ==
      Seq(100, 100, 200, 200))
    // identity rate is a frame-exact round trip
    assert(java.util.Arrays.equals(Multimodal.resampleWav(src, 8000), src))
    // golden.wav survives the decode contract after resampling
    val g = Multimodal.resampleWav(resource("golden.wav"), 11025)
    assert(Multimodal.decodeWav(g)._1 == 11025)
  }

  test("REAL y4m codec decodes an independently-encoded golden file") {
    val v = resource("golden.y4m") // 4x2 C420jpeg, 2 frames, python-encoded
    assert(Multimodal.decodeY4m(v) == ((4, 2, 2)))
    assert(Multimodal.decodeMeta(v) == ((4, 2, 2)))
    // exact luma planes, per frame
    assert(Multimodal.y4mFrameY(v, 0).map(_ & 0xFF).toSeq ==
      Seq(0, 50, 100, 150, 200, 250, 10, 60))
    assert(Multimodal.y4mFrameY(v, 1).map(_ & 0xFF).toSeq ==
      Seq(255, 255, 255, 255, 0, 0, 0, 0))
    assertThrows[IllegalArgumentException](Multimodal.y4mFrameY(v, 2))
  }

  test("y4m encode/decode/frame round-trip (property)") {
    check(Prop.forAll(Gen.choose(1, 12), Gen.choose(1, 12),
      Gen.choose(1, 8), Gen.choose(0L, 100000L)) { (w2, h2, f, seed) =>
      val (w, h) = (w2 * 2, h2 * 2) // 4:2:0 needs even dims
      val fb = w * h + 2 * (w / 2) * (h / 2)
      val frames = (0 until f).map(fi => Array.tabulate(fb)(i =>
        (graft.sources.Synth.mix(seed, fi.toLong, i.toLong) & 0xFF).toByte))
      val v = Multimodal.encodeY4m(w, h, frames)
      Multimodal.decodeY4m(v) == ((w, h, f)) &&
        (0 until f).forall(fi => java.util.Arrays.equals(
          Multimodal.y4mFrameY(v, fi),
          java.util.Arrays.copyOf(frames(fi), w * h)))
    })
  }

  test("REAL y4m resize resamples every plane of every frame") {
    val v = resource("golden.y4m")
    val r = Multimodal.resize(v, 2, 2)
    assert(Multimodal.decodeY4m(r) == ((2, 2, 2)))
    // nearest-neighbor on frame 0 luma: (x*4/2, y*2/2) picks (0,0),(2,0),(0,1),(2,1)
    assert(Multimodal.y4mFrameY(r, 0).map(_ & 0xFF).toSeq ==
      Seq(0, 100, 200, 10))
    // upscale keeps replicated neighbors
    val up = Multimodal.resize(v, 8, 4)
    assert(Multimodal.decodeY4m(up) == ((8, 4, 2)))
    assert((Multimodal.y4mFrameY(up, 1)(0) & 0xFF) == 255)
    assert((Multimodal.y4mFrameY(up, 1)(8 * 3) & 0xFF) == 0) // bottom row
  }

  test("hostile y4m headers fail the decode instead of misparsing") {
    val v = resource("golden.y4m")
    // bad magic
    val bad = v.clone(); bad(0) = 'X'.toByte
    assertThrows[IllegalArgumentException](Multimodal.decodeY4m(bad))
    // truncated final frame
    assertThrows[IllegalArgumentException](
      Multimodal.decodeY4m(java.util.Arrays.copyOf(v, v.length - 3)))
    // absurd dimensions must fail before any frame math
    assertThrows[IllegalArgumentException](Multimodal.decodeY4m(
      "YUV4MPEG2 W2000000 H2000000 C420jpeg\nFRAME\n".getBytes("US-ASCII")))
    // garbage between frames
    val garbled = v.clone()
    val fIdx = new String(v, "ISO-8859-1").indexOf("FRAME", 20)
    garbled(fIdx) = 'G'.toByte
    assertThrows[IllegalArgumentException](Multimodal.decodeY4m(garbled))
    // unterminated stream header
    assertThrows[IllegalArgumentException](
      Multimodal.decodeY4m("YUV4MPEG2 W4 H2".getBytes("US-ASCII")))
  }

  test("frame sampling emits ceil(nFrames/stride) rows with real luma means") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, 60)
    for (stride <- Seq(1, 3, 5, 7)) {
      val got = Multimodal.sampleFrames(media, stride)
        .groupBy("media_id").count().as[(Long, Long)].collect().toMap
      val want = media.collect().filter(_.kind == "video").map { m =>
        val (_, _, f) = Multimodal.decodeY4m(m.payload)
        m.media_id -> ((f + stride - 1) / stride).toLong
      }.toMap
      assert(got == want, s"stride=$stride")
    }
    // real per-frame luma: golden.y4m frame means are 102.5 and 127.5
    val g = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "video", resource("golden.y4m"))))
    val rows = Multimodal.sampleFrames(g, 1)
      .orderBy("frame_idx")
      .as[(Long, Int, Int, Int, Double)].collect()
    assert(rows.map(_._5).toSeq == Seq(102.5, 127.5))
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
    // REAL video features, hand-checked over the independently-encoded
    // golden.y4m (4x2, 2 frames): Y values frame0 = 0,50,100,150,200,
    // 250,10,60 and frame1 = 255x4,0x4 -> n=16, sum=1840 (mean 115),
    // sum2=401300 (var 11856.25); per-pixel |frame delta| sum = 1240
    // over 8 pixels (meanDelta 155); luma hist (64-wide bins) =
    // (8,1,1,6)
    val gv = Multimodal.features(spark.createDataset(
      Seq(Multimodal.MediaRow(97L, "video", resource("golden.y4m")))), dim = 8)
      .as[(Long, String, Array[Float])].collect().head._3
    assert(math.abs(gv(0) - (115.0 / 127.5 - 1)) < 1e-6)          // Y mean
    assert(math.abs(gv(1) - (math.sqrt(11856.25) / 127.5 - 1)) < 1e-6) // Y std
    assert(math.abs(gv(2) - (155.0 / 127.5 - 1)) < 1e-6)          // temporal
    assert(math.abs(gv(3) - (2.0 / 64 * 2 - 1)) < 1e-6)           // frames
    assert(math.abs(gv(4) - (8.0 / 16 * 2 - 1)) < 1e-6)
    assert(math.abs(gv(5) - (1.0 / 16 * 2 - 1)) < 1e-6)
    assert(math.abs(gv(6) - (1.0 / 16 * 2 - 1)) < 1e-6)
    assert(math.abs(gv(7) - (6.0 / 16 * 2 - 1)) < 1e-6)
  }
}
