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
  * Codec status — ALL REAL, pure JVM, no libraries:
  *  - image: 24-bit uncompressed BMP (encode, decode, per-pixel
  *    access, nearest-neighbor resize);
  *  - audio: PCM WAV (encode, RIFF chunk-walk decode, 16-bit);
  *  - video: YUV4MPEG2 (encode, stream/FRAME-walk decode, per-frame
  *    luma access, per-plane nearest-neighbor resize) — the
  *    uncompressed planar interchange format of the mjpegtools suite.
  *    Compressed codecs (JPEG/H.264/AAC…) stay out of scope: decoding
  *    them needs media libraries this container does not ship; the
  *    operator surface (schema, batch shape, per-frame explode) is
  *    identical either way.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded metadata. Semantics per kind:
    *  - image: (width, height) pixels, n_frames = 1;
    *  - audio: width = sample rate (Hz), height = channel count,
    *    n_frames = samples per channel;
    *  - video: (width, height) pixels from the real y4m stream header,
    *    n_frames = FRAME markers counted by the codec walk.
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

  /** REAL nearest-neighbor audio resample to `newRate` Hz: picks the
    * source frame nearest each target instant per channel and
    * re-encodes a canonical WAV — the audio member of the resize
    * family (images/video resample pixels, audio resamples frames).
    * Nearest-neighbor (no interpolation filter) keeps it deterministic
    * and integer-exact; production anti-aliased resampling would slot
    * in behind the same signature.
    */
  def resampleWav(payload: Array[Byte], newRate: Int): Array[Byte] = {
    require(newRate > 0, "target rate must be positive")
    val (rate, channels, frames, dataOff) = wavInfo(payload)
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val outFrames = (frames.toLong * newRate / rate).toInt.max(
      if (frames > 0) 1 else 0)
    val out = new Array[Short](outFrames * channels)
    var i = 0
    while (i < outFrames) {
      val src = (i.toLong * rate / newRate).toInt.min(frames - 1)
      var c = 0
      while (c < channels) {
        out(i * channels + c) =
          buf.getShort(dataOff + (src * channels + c) * 2)
        c += 1
      }
      i += 1
    }
    encodeWav(newRate, channels, out)
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
  // REAL video codec: YUV4MPEG2 (uncompressed planar YUV — the public
  // y4m interchange format of the mjpegtools suite; text stream header
  // + per-frame FRAME markers + raw planes)
  // ---------------------------------------------------------------------

  /** Bytes per frame for a y4m colorspace tag; even dims required for
    * subsampled chroma. Long math first, plausibility-bounded — a
    * hostile header must fail the decode, not overflow the frame walk.
    */
  private def y4mFrameBytes(cs: String, w: Int, h: Int): Int = {
    require(w > 0 && h > 0, "y4m dims must be positive")
    require(w <= (1 << 20) && h <= (1 << 20), "implausible y4m dimensions")
    val yBytes = w.toLong * h
    val total = cs match {
      case "C420" | "C420jpeg" | "C420mpeg2" | "C420paldv" =>
        require(w % 2 == 0 && h % 2 == 0, "4:2:0 y4m requires even dims")
        yBytes + 2 * (w / 2).toLong * (h / 2)
      case "C422" =>
        require(w % 2 == 0, "4:2:2 y4m requires even width")
        yBytes * 2
      case "C444" => yBytes * 3
      case "Cmono" => yBytes
      case other => throw new IllegalArgumentException(
        s"unsupported y4m colorspace $other")
    }
    require(total <= Int.MaxValue, "y4m frame too large")
    total.toInt
  }

  /** Parse the stream header -> (width, height, colorspace, body
    * offset). Tolerates extra tags (F/I/A/X) in any order; the header
    * line must terminate within 256 bytes (an unterminated header is
    * a corrupt stream, not an infinite scan).
    */
  private def y4mHeader(payload: Array[Byte]): (Int, Int, String, Int) = {
    require(payload.length >= 10 &&
      new String(payload, 0, 9, "US-ASCII") == "YUV4MPEG2",
      "not a YUV4MPEG2 payload")
    val bound = math.min(payload.length, 256)
    var nl = 9
    while (nl < bound && payload(nl) != '\n') nl += 1
    require(nl < bound, "unterminated y4m stream header")
    val tags = new String(payload, 9, nl - 9, "US-ASCII").trim
      .split(" ").filter(_.nonEmpty)
    var w = -1; var h = -1; var cs = "C420jpeg" // spec default is 4:2:0
    tags.foreach { t =>
      t.charAt(0) match {
        case 'W' => w = t.substring(1).toInt
        case 'H' => h = t.substring(1).toInt
        case 'C' => cs = t
        case _ => () // F/I/A/X tags don't affect the layout
      }
    }
    require(w > 0 && h > 0, "y4m header missing W/H")
    (w, h, cs, nl + 1)
  }

  /** ONE walk over the FRAME markers -> (width, height, per-frame data
    * offsets). Every frame must carry its full plane payload; trailing
    * garbage or a truncated final frame fails the walk. This is the
    * shared single pass every consumer (decode, features, frame
    * sampling) indexes into — per-frame point access re-walking the
    * stream would make F-frame processing O(F²).
    */
  private def y4mFrameOffsets(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val (w, h, cs, body) = y4mHeader(payload)
    val fb = y4mFrameBytes(cs, w, h)
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    var pos = body
    while (pos < payload.length) {
      require(pos + 5 <= payload.length &&
        new String(payload, pos, 5, "US-ASCII") == "FRAME",
        s"corrupt y4m: expected FRAME marker at offset $pos")
      val bound = math.min(payload.length, pos + 256)
      var nl = pos + 5
      while (nl < bound && payload(nl) != '\n') nl += 1
      require(nl < bound, "unterminated y4m FRAME header")
      require(nl + 1 + fb.toLong <= payload.length, "truncated y4m frame data")
      offs += nl + 1
      pos = nl + 1 + fb
    }
    (w, h, offs.toArray)
  }

  /** (width, height, nFrames) of a y4m stream. */
  def decodeY4m(payload: Array[Byte]): (Int, Int, Int) = {
    val (w, h, offs) = y4mFrameOffsets(payload)
    (w, h, offs.length)
  }

  /** The Y (luma) plane of frame `idx` — point access; batch consumers
    * use the offset index directly so the walk happens once.
    */
  def y4mFrameY(payload: Array[Byte], idx: Int): Array[Byte] = {
    val (w, h, offs) = y4mFrameOffsets(payload)
    require(idx >= 0 && idx < offs.length,
      s"y4m frame $idx out of range (${offs.length} frames)")
    java.util.Arrays.copyOfRange(payload, offs(idx), offs(idx) + w * h)
  }

  /** Encode planar frames as a canonical y4m stream. Each frame must
    * be the full plane payload for the colorspace.
    */
  def encodeY4m(width: Int, height: Int, frames: Seq[Array[Byte]],
                colorspace: String = "C420jpeg"): Array[Byte] = {
    val fb = y4mFrameBytes(colorspace, width, height)
    frames.foreach(f => require(f.length == fb,
      s"frame must carry $fb bytes, got ${f.length}"))
    val hdr = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 $colorspace\n"
      .getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = ByteBuffer.allocate(hdr.length + frames.size * (marker.length + fb))
    out.put(hdr)
    frames.foreach { f => out.put(marker); out.put(f) }
    out.array()
  }

  /** REAL nearest-neighbor video resize: resamples every plane of
    * every frame (luma at full resolution, chroma at its subsampled
    * resolution) and re-encodes a valid y4m stream.
    */
  def resizeY4m(payload: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
    val (w, h, cs, body) = y4mHeader(payload)
    val fb = y4mFrameBytes(cs, w, h)
    val fb2 = y4mFrameBytes(cs, w2, h2) // validates target dims for cs
    def resamplePlane(src: Array[Byte], srcOff: Int, sw: Int, sh: Int,
                      dst: Array[Byte], dstOff: Int, dw: Int, dh: Int): Unit = {
      var y = 0
      while (y < dh) {
        val sy = (y.toLong * sh / dh).toInt
        var x = 0
        while (x < dw) {
          dst(dstOff + y * dw + x) =
            src(srcOff + sy * sw + (x.toLong * sw / dw).toInt)
          x += 1
        }
        y += 1
      }
    }
    // plane layout per colorspace: (plane width, plane height) pairs
    def planes(pw: Int, ph: Int): Seq[(Int, Int)] = cs match {
      case "C420" | "C420jpeg" | "C420mpeg2" | "C420paldv" =>
        Seq((pw, ph), (pw / 2, ph / 2), (pw / 2, ph / 2))
      case "C422" => Seq((pw, ph), (pw / 2, ph), (pw / 2, ph))
      case "C444" => Seq((pw, ph), (pw, ph), (pw, ph))
      case _ => Seq((pw, ph)) // Cmono
    }
    val srcPlanes = planes(w, h)
    val dstPlanes = planes(w2, h2)
    val outFrames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = body
    while (pos < payload.length) {
      require(pos + 5 <= payload.length &&
        new String(payload, pos, 5, "US-ASCII") == "FRAME", "corrupt y4m")
      val bound = math.min(payload.length, pos + 256)
      var nl = pos + 5
      while (nl < bound && payload(nl) != '\n') nl += 1
      require(nl < bound, "unterminated y4m FRAME header")
      require(nl + 1 + fb.toLong <= payload.length, "truncated y4m frame data")
      val frame = new Array[Byte](fb2)
      var srcOff = nl + 1
      var dstOff = 0
      srcPlanes.zip(dstPlanes).foreach { case ((sw, sh), (dw, dh)) =>
        resamplePlane(payload, srcOff, sw, sh, frame, dstOff, dw, dh)
        srcOff += sw * sh
        dstOff += dw * dh
      }
      outFrames += frame
      pos = nl + 1 + fb
    }
    encodeY4m(w2, h2, outFrames.toSeq, cs)
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

  /** Deterministic real y4m video: 4:2:0, even 16-46 px dims, 1-30
    * frames of pseudo-random planes.
    */
  def syntheticVideo(id: Long): Array[Byte] = {
    val h = Synth.mix(1234L, id, 29L)
    val w = 16 + Math.floorMod(h, 16L).toInt * 2
    val ht = 16 + Math.floorMod(h >>> 8, 16L).toInt * 2
    val nFrames = 1 + Math.floorMod(h >>> 16, 30L).toInt
    val fb = w * ht + 2 * (w / 2) * (ht / 2)
    val frames = (0 until nFrames).map { f =>
      Array.tabulate(fb)(i => (Synth.mix(h, f.toLong, i.toLong) & 0xFF).toByte)
    }
    encodeY4m(w, ht, frames)
  }

  /** Deterministic media table generator (distributed, per-index):
    * real BMP images, real PCM WAVs, real y4m videos.
    */
  def mediaTable(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      (i % 3) match {
        case 0 => MediaRow(i, "image", syntheticImage(i))
        case 1 => MediaRow(i, "audio", syntheticAudio(i))
        case _ => MediaRow(i, "video", syntheticVideo(i))
      }
    }
  }

  /** Format-sniffing metadata decode: real BMP/WAV/y4m parsers; an
    * unrecognized magic fails the decode (hostile/garbage payloads
    * must never be misparsed as media).
    */
  def decodeMeta(payload: Array[Byte]): (Int, Int, Int) =
    if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M') {
      val (w, h) = decodeBmp(payload); (w, h, 1)
    } else if (payload.length >= 12 && new String(payload, 0, 4) == "RIFF") {
      decodeWav(payload)
    } else decodeY4m(payload)

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

  /** REAL feature extraction for all three kinds: images (channel
    * means + gray std + 4-bin gray histogram), audio (level/dynamics +
    * 4-bin |sample| histogram), and video (decoded Y-plane mean/std,
    * mean frame-to-frame luma delta, frame count, 4-bin luma
    * histogram — from the y4m codec's single offset walk). All slots
    * lie in [-1, 1]; `dim` beyond the 8 computed slots zero-pads
    * (truncates below). One mapPartitions pass, fixed-size vectors out.
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
        case p => // REAL y4m video: luma statistics + temporal activity
          // one offset walk, then in-place reads — no per-frame copies
          val (w, h, offs) = y4mFrameOffsets(p)
          val f = offs.length
          // a header-only stream (0 frames) is a valid y4m but has
          // nothing to featurize — fail like the empty-WAV branch does
          // rather than emit an all-NaN vector into the ANN paths
          require(f > 0, "empty y4m: no frames to featurize")
          val yLen = w * h
          val n = yLen.toLong * f
          var sum = 0.0; var sum2 = 0.0
          val hist = new Array[Long](4)
          var dSum = 0.0 // mean |frame-to-frame| luma delta
          var fi = 0
          while (fi < f) {
            val off = offs(fi)
            val prevOff = if (fi > 0) offs(fi - 1) else -1
            var i = 0
            while (i < yLen) {
              val v = p(off + i) & 0xFF
              sum += v; sum2 += v.toDouble * v
              hist(v / 64) += 1
              if (prevOff >= 0) dSum += math.abs(v - (p(prevOff + i) & 0xFF))
              i += 1
            }
            fi += 1
          }
          val mean = sum / n
          val std = math.sqrt(math.max(0, sum2 / n - mean * mean))
          val meanDelta =
            if (f > 1) dSum / (w.toLong * h * (f - 1)) else 0.0
          fit(Array(
            (mean / 127.5 - 1).toFloat, (std / 127.5 - 1).toFloat,
            (meanDelta / 127.5 - 1).toFloat,
            (math.min(f, 64) / 64.0 * 2 - 1).toFloat,
            (hist(0).toDouble / n * 2 - 1).toFloat,
            (hist(1).toDouble / n * 2 - 1).toFloat,
            (hist(2).toDouble / n * 2 - 1).toFloat,
            (hist(3).toDouble / n * 2 - 1).toFloat))
      }
      (m.media_id, m.kind, vec)
    }).toDF("media_id", "kind", "embedding")
  }

  /** Resize dispatch: REAL nearest-neighbor pixel resample for both
    * BMP images and y4m videos (per-plane, per-frame).
    */
  def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
    if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M')
      resizeBmp(payload, w, h)
    else resizeY4m(payload, w, h)

  /** Frame sampling for video rows: every `stride`-th frame as its own
    * row with REAL per-frame luma statistics — the explode-shaped op a
    * video pipeline needs. One FRAME-marker walk per payload (the
    * offset index), then only the sampled Y planes are read, in place.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 5): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val (w, h, offs) = y4mFrameOffsets(m.payload)
      val yLen = w * h
      (0 until offs.length by stride).map { i =>
        val off = offs(i)
        var s = 0L
        var j = 0
        while (j < yLen) { s += (m.payload(off + j) & 0xFF); j += 1 }
        (m.media_id, i, w, h, s.toDouble / yLen)
      }
    }.toDF("media_id", "frame_idx", "width", "height", "y_mean")
  }
}
