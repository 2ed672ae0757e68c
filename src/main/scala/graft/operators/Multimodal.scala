package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Synth

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * BINARY columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample operators.
  *
  * The Spark-side shape is the production one throughout: schemas,
  * partition-friendly batch processing (mapPartitions over the binary
  * column — the Scala analog of mapInPandas batches), deterministic
  * outputs, no driver involvement.
  *
  * Codec status:
  *  - image: REAL 24-bit uncompressed BMP codec (encode, decode,
  *    per-pixel access, nearest-neighbor resize) — pure JVM, no
  *    libraries;
  *  - audio: REAL PCM WAV codec (encode, RIFF chunk-walk decode) —
  *    pure JVM;
  *  - video: ===STUB=== — a deterministic 16-byte fake header
  *    (`decodeStub`), because no pure-JVM video container/codec is
  *    feasible and the container ships no media libraries. The stub
  *    boundary is pinned by golden-binary tests so a real codec swap
  *    is observable at exactly this seam.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded metadata. Semantics per kind:
    *  - image: (width, height) pixels, n_frames = 1;
    *  - audio: width = sample rate (Hz), height = channel count,
    *    n_frames = samples per channel;
    *  - video (stub): fake header dims and frame count.
    */
  final case class MediaMeta(
      media_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, n_bytes: Int)

  // ---------------------------------------------------------------------
  // REAL image codec: 24-bit uncompressed BMP (BITMAPINFOHEADER)
  // ---------------------------------------------------------------------

  /** Encode a 24-bit bottom-up BMP; `pixel(x, y)` returns 0xRRGGBB with
    * (0,0) the top-left corner.
    */
  def encodeBmp(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "bmp dims must be positive")
    val rowSize = (width * 3 + 3) / 4 * 4 // rows padded to 4 bytes
    val dataSize = rowSize * height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize).putInt(0).putInt(54) // file size, reserved, pixel offset
    buf.putInt(40).putInt(width).putInt(height)    // BITMAPINFOHEADER
    buf.putShort(1).putShort(24)                   // planes, bpp
    buf.putInt(0).putInt(dataSize)                 // BI_RGB, image size
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 DPI, palette
    var y = height - 1 // BMP stores rows bottom-up
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val p = pixel(x, y)
        buf.put((p & 0xFF).toByte)          // B
          .put(((p >> 8) & 0xFF).toByte)    // G
          .put(((p >> 16) & 0xFF).toByte)   // R
        x += 1
      }
      var pad = rowSize - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Parse a 24-bit uncompressed BMP header -> (width, height). */
  def decodeBmp(payload: Array[Byte]): (Int, Int) = {
    require(payload.length >= 54 && payload(0) == 'B' && payload(1) == 'M',
      "not a BMP payload")
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val width = buf.getInt(18)
    val height = buf.getInt(22)
    require(buf.getShort(28) == 24, "only 24-bit BMP supported")
    require(buf.getInt(30) == 0, "only uncompressed (BI_RGB) BMP supported")
    require(width > 0 && height > 0, "top-down/degenerate BMP unsupported")
    // dimension sanity first (a hostile header width would overflow Int
    // row-size math and defeat the truncation check), then the
    // truncation guard in Long arithmetic: truncated payloads must fail
    // the decode, not AIOOBE a pixel read
    require(width <= (1 << 20) && height <= (1 << 20),
      "implausible BMP dimensions")
    val rowSize = (width.toLong * 3 + 3) / 4 * 4
    require(payload.length.toLong >= buf.getInt(10).toLong + rowSize * height,
      "truncated BMP pixel data")
    (width, height)
  }

  /** Read pixel (x, y) of a 24-bit BMP as 0xRRGGBB, (0,0) top-left. */
  def bmpPixel(payload: Array[Byte], x: Int, y: Int): Int = {
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val width = buf.getInt(18)
    val height = buf.getInt(22)
    val off = buf.getInt(10)
    val rowSize = (width * 3 + 3) / 4 * 4
    val base = off + (height - 1 - y) * rowSize + x * 3
    ((payload(base + 2) & 0xFF) << 16) |
      ((payload(base + 1) & 0xFF) << 8) |
      (payload(base) & 0xFF)
  }

  /** REAL nearest-neighbor resample of a 24-bit BMP — re-encodes actual
    * pixels, not just the header.
    */
  def resizeBmp(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val (w0, h0) = decodeBmp(payload)
    encodeBmp(w, h, (x, y) =>
      bmpPixel(payload, (x.toLong * w0 / w).toInt, (y.toLong * h0 / h).toInt))
  }

  // ---------------------------------------------------------------------
  // REAL audio codec: PCM WAV (RIFF/WAVE, 16-bit)
  // ---------------------------------------------------------------------

  /** Encode interleaved 16-bit PCM samples as a canonical WAV file. */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0,
      "samples must be a whole number of frames")
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
    buf.putShort(1)                                   // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2)              // byte rate
      .putShort((channels * 2).toShort).putShort(16)  // block align, bits
    buf.put("data".getBytes).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** RIFF chunk walk -> (sampleRate, channels, framesPerChannel,
    * data-chunk byte offset). Tolerates extra chunks in any order.
    */
  private def wavInfo(payload: Array[Byte]): (Int, Int, Int, Int) = {
    require(payload.length >= 44 &&
      new String(payload, 0, 4) == "RIFF" && new String(payload, 8, 4) == "WAVE",
      "not a WAV payload")
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var rate = -1; var channels = -1; var bits = -1
    var dataSize = -1; var dataOff = -1
    while (pos + 8 <= payload.length && (rate < 0 || dataSize < 0)) {
      val id = new String(payload, pos, 4)
      val size = buf.getInt(pos + 4)
      // a corrupt negative chunk size would stall or reverse the walk:
      // fail the decode instead of spinning the executor thread forever
      require(size >= 0, s"corrupt RIFF chunk size $size")
      if (id == "fmt ") {
        require(buf.getShort(pos + 8) == 1, "only PCM WAV supported")
        channels = buf.getShort(pos + 10)
        rate = buf.getInt(pos + 12)
        bits = buf.getShort(pos + 22)
      } else if (id == "data") { dataSize = size; dataOff = pos + 8 }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(rate > 0 && channels > 0 && dataSize >= 0, "missing fmt/data chunk")
    require(bits == 16, s"only 16-bit PCM supported, got $bits")
    // header-claimed data must actually be present: the featurizer
    // reads dataSize bytes from dataOff
    require(dataOff.toLong + dataSize <= payload.length, "truncated WAV data chunk")
    (rate, channels, dataSize / (channels * 2), dataOff)
  }

  /** Decode a PCM WAV header -> (sampleRate, channels, framesPerChannel). */
  def decodeWav(payload: Array[Byte]): (Int, Int, Int) = {
    val (r, c, f, _) = wavInfo(payload)
    (r, c, f)
  }

  // ---------------------------------------------------------------------
  // ===STUB=== video: deterministic fake 16-byte header (no pure-JVM
  // video codec is feasible; boundary pinned by MultimodalSpec goldens)
  // ---------------------------------------------------------------------

  /** Fake media blob: 16-byte header (magic, width, height, nFrames)
    * followed by deterministic pseudo-random body bytes.
    */
  def syntheticBlob(id: Long, kind: String): Array[Byte] = {
    val h = Synth.mix(1234L, id, kind.hashCode.toLong)
    val width = 16 + (Math.floorMod(h, 64L)).toInt * 4
    val height = 16 + (Math.floorMod(h >>> 8, 64L)).toInt * 4
    val nFrames = if (kind == "video") 1 + Math.floorMod(h >>> 16, 30L).toInt else 1
    val bodyLen = 256 + Math.floorMod(h >>> 24, 1024L).toInt
    val buf = ByteBuffer.allocate(16 + bodyLen)
    buf.putInt(0x4D454447) // magic "MEDG"
    buf.putInt(width); buf.putInt(height); buf.putInt(nFrames)
    var i = 0
    while (i < bodyLen) { buf.put((Synth.mix(h, i.toLong, 5L) & 0xFF).toByte); i += 1 }
    buf.array()
  }

  /** ===STUB=== parse of the fake 16-byte video header. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val buf = ByteBuffer.wrap(payload)
    require(buf.getInt() == 0x4D454447, "bad media magic")
    (buf.getInt(), buf.getInt(), buf.getInt())
  }

  // ---------------------------------------------------------------------
  // Synthetic media generation (deterministic, distributed)
  // ---------------------------------------------------------------------

  /** Deterministic real BMP: dims and per-pixel 0xRRGGBB derived from
    * the id via the repo's splitmix chain.
    */
  def syntheticImage(id: Long): Array[Byte] = {
    val h = Synth.mix(4321L, id, 17L)
    val w = 8 + Math.floorMod(h, 24L).toInt
    val ht = 8 + Math.floorMod(h >>> 8, 24L).toInt
    encodeBmp(w, ht, (x, y) => (Synth.mix(h, x.toLong, y.toLong) & 0xFFFFFF).toInt)
  }

  /** Deterministic real WAV: 8 kHz, 1-2 channels, 128-383 frames of
    * pseudo-random 16-bit PCM.
    */
  def syntheticAudio(id: Long): Array[Byte] = {
    val h = Synth.mix(8765L, id, 23L)
    val frames = 128 + Math.floorMod(h, 256L).toInt
    val channels = 1 + Math.floorMod(h >>> 16, 2L).toInt
    encodeWav(8000, channels,
      Array.tabulate(frames * channels)(i => (Synth.mix(h, i.toLong, 31L) & 0xFFFF).toShort))
  }

  /** Deterministic media table generator (distributed, per-index):
    * real BMP images, real PCM WAVs, stub video blobs.
    */
  def mediaTable(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      (i % 3) match {
        case 0 => MediaRow(i, "image", syntheticImage(i))
        case 1 => MediaRow(i, "audio", syntheticAudio(i))
        case _ => MediaRow(i, "video", syntheticBlob(i, "video"))
      }
    }
  }

  /** Format-sniffing metadata decode: real BMP/WAV parsers, stub header
    * parse for the fake video container.
    */
  def decodeMeta(payload: Array[Byte]): (Int, Int, Int) =
    if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M') {
      val (w, h) = decodeBmp(payload); (w, h, 1)
    } else if (payload.length >= 12 && new String(payload, 0, 4) == "RIFF") {
      decodeWav(payload)
    } else decodeStub(payload) // ===STUB=== video fallback

  /** Batch decode: mapPartitions over the binary column — one pass,
    * fixed-size metadata out, no driver involvement.
    */
  def decode(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val (w, h, f) = decodeMeta(m.payload)
      MediaMeta(m.media_id, m.kind, w, h, f, m.payload.length)
    })
  }

  /** REAL feature extraction for images (channel means + gray std +
    * 4-bin gray histogram) and audio (level/dynamics + 4-bin |sample|
    * histogram); hash-derived ===STUB=== for video. All slots lie in
    * [-1, 1]; `dim` beyond the 8 computed slots zero-pads (truncates
    * below). One mapPartitions pass, fixed-size vectors out.
    */
  def features(media: Dataset[MediaRow], dim: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    def fit(v: Array[Float]): Array[Float] =
      if (v.length == dim) v
      else java.util.Arrays.copyOf(v, dim)
    media.mapPartitions(_.map { m =>
      val vec: Array[Float] = m.payload match {
        case p if p.length >= 2 && p(0) == 'B' && p(1) == 'M' =>
          val (w, h) = decodeBmp(p)
          var sr = 0L; var sg = 0L; var sb = 0L
          var sGray = 0.0; var sGray2 = 0.0
          val hist = new Array[Int](4)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val px = bmpPixel(p, x, y)
              val r = (px >> 16) & 0xFF; val g = (px >> 8) & 0xFF; val b = px & 0xFF
              sr += r; sg += g; sb += b
              val gray = (r + g + b) / 3.0
              sGray += gray; sGray2 += gray * gray
              hist(math.min(3, (gray / 64).toInt)) += 1
              x += 1
            }
            y += 1
          }
          val n = (w * h).toDouble
          val mean = sGray / n
          val std = math.sqrt(math.max(0, sGray2 / n - mean * mean))
          fit(Array(
            (sr / n / 127.5 - 1).toFloat, (sg / n / 127.5 - 1).toFloat,
            (sb / n / 127.5 - 1).toFloat, (std / 127.5 - 1).toFloat,
            (hist(0) / n * 2 - 1).toFloat, (hist(1) / n * 2 - 1).toFloat,
            (hist(2) / n * 2 - 1).toFloat, (hist(3) / n * 2 - 1).toFloat))
        case p if p.length >= 12 && new String(p, 0, 4) == "RIFF" =>
          val (_, channels, frames, base) = wavInfo(p)
          val buf = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
          val n = frames * channels
          require(n > 0, "empty WAV: no samples to featurize")
          var sum = 0.0; var sum2 = 0.0; var peak = 0; var zc = 0
          val hist = new Array[Int](4)
          var i = 0
          var prev = 0
          while (i < n) {
            val s = buf.getShort(base + i * 2).toInt
            sum += s; sum2 += s.toDouble * s
            if (math.abs(s) > peak) peak = math.abs(s)
            if (i > 0 && (s ^ prev) < 0) zc += 1
            hist(math.min(3, math.abs(s) / 8192)) += 1
            prev = s
            i += 1
          }
          val mean = sum / n
          val rms = math.sqrt(sum2 / n)
          fit(Array(
            (mean / 32768.0).toFloat, (rms / 32768.0 * 2 - 1).toFloat,
            (peak / 32768.0 * 2 - 1).toFloat,
            (zc.toDouble / math.max(1, n - 1) * 2 - 1).toFloat,
            (hist(0).toDouble / n * 2 - 1).toFloat,
            (hist(1).toDouble / n * 2 - 1).toFloat,
            (hist(2).toDouble / n * 2 - 1).toFloat,
            (hist(3).toDouble / n * 2 - 1).toFloat))
        case p => // ===STUB=== video: hash-derived embedding stand-in
          val base = java.util.Arrays.hashCode(p).toLong
          Array.tabulate(dim)(j =>
            (Math.floorMod(Synth.mix(base, j.toLong, 11L), 2000L) - 1000L).toFloat / 1000f)
      }
      (m.media_id, m.kind, vec)
    }).toDF("media_id", "kind", "embedding")
  }

  /** Resize dispatch: REAL nearest-neighbor pixel resample for BMP
    * images; header-rewrite ===STUB=== for the fake video container.
    */
  def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
    if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M')
      resizeBmp(payload, w, h)
    else resizeStub(payload, w, h)

  /** ===STUB=== resize for the fake video container: rewrites the
    * header dims, truncates body proportionally.
    */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val (_, _, f) = decodeStub(payload)
    val out = ByteBuffer.allocate(16 + 64)
    out.putInt(0x4D454447); out.putInt(w); out.putInt(h); out.putInt(f)
    out.put(payload, 16, math.min(64, payload.length - 16))
    out.array()
  }

  /** Frame sampling for video rows: every `stride`-th frame index as
    * its own row (media_id, frame_idx) — the explode-shaped op a video
    * pipeline needs; payload slicing stubbed to header-carry.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 5): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val (w, h, f) = decodeStub(m.payload)
      (0 until f by stride).map(i => (m.media_id, i, w, h))
    }.toDF("media_id", "frame_idx", "width", "height")
  }
}
