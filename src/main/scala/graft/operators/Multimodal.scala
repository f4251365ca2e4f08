package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** §2.D multimodal-column plumbing.
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct —
  * the schema a 100 TB image/audio/video corpus would use (payload +
  * modality + nominal dims). Decode / feature-extraction runs batch-wise in
  * `mapPartitions` over a typed Dataset: partition-preserving, no shuffle,
  * executor-local — exactly where a real JNI/FFmpeg/PIL decode would sit.
  *
  * Decode is REAL for the lossless formats the JDK itself ships decoders
  * for — PNG/BMP/GIF via `javax.imageio` ([[decodeImage]]: payload bytes →
  * deterministic grayscale plane feeding the real box-filter
  * [[resizePlane]] and the real DCT [[dctPHash]]) and WAV/PCM via
  * `javax.sound.sampled` ([[decodeAudio]]: header parse + explicit
  * integer frame unpacking → mono PCM feeding [[audioFeatures]]), zero
  * new dependencies. Payloads that are NEITHER (the synthetic text-byte
  * corpus, and the lossy codecs the JDK lacks — JPEG/MP3/AAC/video) fall
  * back to the clearly-marked STUB kernels (`decodeStub`/`resizeStub`) —
  * deterministic fakes that keep the Spark-side plumbing (schema,
  * batching, partitioning, typed encoders) exercised end-to-end.
  */
object Multimodal {

  case class MediaRecord(
      media_id: Long,
      payload: Array[Byte],
      modality: String,
      width: Int,
      height: Int,
      source: String
  )

  case class MediaFeatures(
      media_id: Long,
      source: String,
      n_bytes: Int,
      features: Array[Double]
  )

  val FeatureDim = 8

  /** STUB decode: byte-histogram-ish deterministic fake features standing in
    * for a real image/audio decode (libs absent in this container).
    */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    val f = new Array[Double](FeatureDim)
    var i = 0
    while (i < payload.length) {
      f(i % FeatureDim) += (payload(i) & 0xff) / 255.0
      i += 1
    }
    if (payload.length > 0) { var j = 0; while (j < FeatureDim) { f(j) /= payload.length; j += 1 } }
    f
  }

  /** REAL bytes→plane decode via the JDK's own `javax.imageio` readers
    * (PNG, BMP, GIF — lossless, deterministic; no external libraries).
    * Returns the (width, height, row-major grayscale plane) of a
    * decodable image payload, or None for anything the JDK cannot read
    * (which routes to the STUB kernels). Grayscale conversion is integer
    * ITU-R BT.601 luma `(299·r + 587·g + 114·b) / 1000` over the sRGB
    * values `getRGB` returns — pure integer arithmetic, so the plane is
    * bit-identical across JVMs and platforms, the property every dedup
    * artifact downstream (pHash, md5 chunk keys) requires.
    */
  /** Magic-byte gate: only the LOSSLESS formats whose JDK decode is
    * bit-deterministic (PNG, BMP, GIF). JPEG is deliberately excluded —
    * ImageIO decodes it, but IDCT rounding may differ across JDK builds,
    * and dedup artifacts (pHash, chunk keys) must be stable.
    */
  private def losslessMagic(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      ((p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
        (p(0) == 'B' && p(1) == 'M') ||
        (p(0) == 'G' && p(1) == 'I' && p(2) == 'F'))

  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try {
      if (!losslessMagic(payload)) return None
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) None
        else {
          val plane = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              plane(y * w + x) = lum.toByte
              x += 1
            }
            y += 1
          }
          Some((w, h, plane))
        }
      }
    } catch { case _: Exception => None }

  /** REAL plane resize: exact integer box-filter average — each output
    * pixel is the floor-mean of its source rectangle (`[ox·w/outW,
    * (ox+1)·w/outW)` per axis, never empty). Integer sums and one
    * floor-divide per pixel: deterministic everywhere, no Graphics2D
    * (whose interpolation is platform-dependent).
    */
  def resizePlane(plane: Array[Byte], w: Int, h: Int, outW: Int, outH: Int): Array[Byte] = {
    require(plane.length == w * h, s"plane is ${plane.length} bytes, expected ${w * h}")
    val out = new Array[Byte](outW * outH)
    var oy = 0
    while (oy < outH) {
      val y0 = oy * h / outH
      val y1 = math.max((oy + 1) * h / outH, y0 + 1)
      var ox = 0
      while (ox < outW) {
        val x0 = ox * w / outW
        val x1 = math.max((ox + 1) * w / outW, x0 + 1)
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += (plane(y * w + x) & 0xff); x += 1 }
          y += 1
        }
        out(oy * outW + ox) = (s / ((y1 - y0).toLong * (x1 - x0))).toByte
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** [[FeatureDim]]-dim features of a REAL decoded plane: global mean and
    * variance, the four quadrant means (all /255), plus mean horizontal
    * and vertical absolute gradient — the plane statistics an image
    * quality gate keys on. Integer sums, one float divide per feature:
    * deterministic and partition-order-free.
    */
  def planeFeatures(w: Int, h: Int, plane: Array[Byte]): Array[Double] = {
    val n = plane.length.toLong
    var s = 0L; var s2 = 0L
    val q = new Array[Long](4); val qn = new Array[Long](4)
    var gx = 0L; var gy = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = plane(y * w + x) & 0xff
        s += v; s2 += v.toLong * v
        val qi = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
        q(qi) += v; qn(qi) += 1
        if (x > 0) gx += math.abs(v - (plane(y * w + x - 1) & 0xff))
        if (y > 0) gy += math.abs(v - (plane((y - 1) * w + x) & 0xff))
        x += 1
      }
      y += 1
    }
    val mean = s.toDouble / n
    Array(
      mean / 255.0,
      (s2.toDouble / n - mean * mean) / (255.0 * 255.0),
      (if (qn(0) > 0) q(0).toDouble / qn(0) else 0.0) / 255.0,
      (if (qn(1) > 0) q(1).toDouble / qn(1) else 0.0) / 255.0,
      (if (qn(2) > 0) q(2).toDouble / qn(2) else 0.0) / 255.0,
      (if (qn(3) > 0) q(3).toDouble / qn(3) else 0.0) / 255.0,
      (if (w > 1) gx.toDouble / (h.toLong * (w - 1)) else 0.0) / 255.0,
      (if (h > 1) gy.toDouble / (w.toLong * (h - 1)) else 0.0) / 255.0)
  }

  // --- REAL audio decode (WAV/PCM via the JDK's own javax.sound.sampled) ----

  /** RIFF/WAVE magic gate — the lossless-container analogue of
    * [[losslessMagic]]: WAV holds raw PCM frames, so "decode" is pure
    * byte unpacking with no codec math, bit-deterministic everywhere.
    * Lossy codecs (MP3/AAC/OGG) have no JDK decoder and stay on the
    * honest stub path, exactly like JPEG on the image leg.
    */
  private def wavMagic(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** REAL bytes→PCM decode: `javax.sound.sampled` parses the WAV header
    * (format, rate, channels, width), then the frames are unpacked HERE
    * with explicit integer arithmetic — endianness, signedness, and the
    * stereo→mono downmix (floor-mean over channels) are all integer ops,
    * so the sample array is bit-identical across JVMs and platforms (the
    * same property [[decodeImage]] guarantees for pixel planes). Output
    * samples are normalized to signed 16-bit range regardless of source
    * width (8→shift left 8, 24/32→shift right to 16) so downstream
    * features see one domain. Returns (sampleRate, channels, monoSamples)
    * or None for anything that is not plain PCM (routes to the stub).
    */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      if (!wavMagic(payload)) return None
      val in  = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val signed =
          if (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) true
          else if (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED) false
          else return None
        val bits = fmt.getSampleSizeInBits
        val ch   = fmt.getChannels
        if ((bits != 8 && bits != 16 && bits != 24 && bits != 32) || ch < 1 || ch > 8)
          return None
        val bytesPer = bits / 8
        val frameLen = in.getFrameLength
        if (frameLen <= 0 || frameLen > (1L << 24)) return None
        val raw = in.readAllBytes()
        val n   = (raw.length / (bytesPer * ch)).toInt
        if (n == 0) return None
        val big  = fmt.isBigEndian
        val out  = new Array[Int](n)
        val bias = if (signed) 0L else 1L << (bits - 1) // unsigned → centered
        var f = 0
        while (f < n) {
          var acc = 0L
          var c   = 0
          while (c < ch) {
            val off = (f * ch + c) * bytesPer
            var v   = 0L
            var b   = 0
            while (b < bytesPer) {
              val byteVal = raw(off + (if (big) b else bytesPer - 1 - b)) & 0xffL
              v = (v << 8) | byteVal
              b += 1
            }
            // sign-extend signed samples; center unsigned ones
            val sv =
              if (signed) (v << (64 - bits)) >> (64 - bits)
              else v - bias
            acc += sv
            c += 1
          }
          val mono = if (ch == 1) acc else Math.floorDiv(acc, ch.toLong)
          // normalize width to the signed-16 domain
          out(f) =
            (if (bits == 8) mono << 8
             else if (bits == 16) mono
             else mono >> (bits - 16)).toInt
          f += 1
        }
        Some((fmt.getSampleRate.toInt, ch, out))
      } finally in.close()
    } catch { case _: Exception => None }

  /** [[FeatureDim]]-dim features of a REAL decoded PCM stream — the audio
    * analogue of [[planeFeatures]], in the exact kernel shape a quality /
    * silence / clipping gate consumes: mean |amplitude|, RMS, peak, zero-
    * crossing rate, and the 4-quarter RMS envelope (all normalized to
    * [0,1] against full-scale 32768). Integer sums throughout; the only
    * float ops are one divide per feature and IEEE-exact `sqrt` — the
    * same determinism argument as the image features.
    */
  def audioFeatures(samples: Array[Int]): Array[Double] = {
    val n  = samples.length
    val fs = 32768.0
    var sAbs = 0L; var s2 = 0L; var peak = 0L; var zc = 0L
    val q2 = new Array[Long](4); val qn = new Array[Long](4)
    var i = 0
    while (i < n) {
      val v = samples(i)
      val a = math.abs(v.toLong)
      sAbs += a; s2 += v.toLong * v
      if (a > peak) peak = a
      if (i > 0 && ((samples(i - 1) >= 0) != (v >= 0))) zc += 1
      val qi = (i.toLong * 4 / n).toInt.min(3)
      q2(qi) += v.toLong * v; qn(qi) += 1
      i += 1
    }
    def seg(k: Int): Double =
      if (qn(k) == 0) 0.0 else math.sqrt(q2(k).toDouble / qn(k)) / fs
    Array(
      sAbs.toDouble / n / fs,
      math.sqrt(s2.toDouble / n) / fs,
      peak.toDouble / fs,
      if (n > 1) zc.toDouble / (n - 1) else 0.0,
      seg(0), seg(1), seg(2), seg(3))
  }

  /** Build a media table from `documents` (text bytes stand in for media
    * payloads — same binary-column plumbing).
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        lit("image/fake").as("modality"),
        lit(64).as("width"),
        lit(64).as("height"),
        col("source")
      )
      .as[MediaRecord]
  }

  /** D2 batch decode, streamed per partition — the iterator shape a
    * vectorized (batched) UDF would use. REAL path first: a payload the
    * JDK decodes ([[decodeImage]]) gets [[planeFeatures]] of its actual
    * pixel plane; anything else (the synthetic text-byte corpus, formats
    * without a JDK reader) falls back to the STUB byte-histogram features.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val feats = decodeImage(r.payload) match {
          case Some((w, h, plane)) => planeFeatures(w, h, plane)
          case None =>
            decodeAudio(r.payload) match {
              case Some((_, _, samples)) => audioFeatures(samples)
              case None                  => decodeStub(r.payload)
            }
        }
        MediaFeatures(r.media_id, r.source, r.payload.length, feats)
      }
    }
  }

  /** STUB resize: deterministic byte-domain downscale standing in for a
    * real image resize (no imaging libs in this container). Keeps the
    * batch/partition shape a real resize kernel would have: pure function
    * of (payload, target dims), map-only.
    */
  def resizeStub(payload: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    val out = new Array[Byte](outW * outH)
    if (payload.nonEmpty) {
      var i = 0
      while (i < out.length) {
        out(i) = payload((i.toLong * payload.length / out.length).toInt)
        i += 1
      }
    }
    out
  }

  /** D3b map-side resize over the media table. REAL path for decodable
    * images: decode → integer box-filter [[resizePlane]] → raw grayscale
    * plane payload (`modality = image/gray-raw`, the decoded working
    * format downstream feature/hash stages consume). Non-decodable
    * payloads keep the STUB byte-domain downscale.
    */
  def resize(media: Dataset[MediaRecord], outW: Int, outH: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      decodeImage(r.payload) match {
        case Some((w, h, plane)) =>
          r.copy(payload = resizePlane(plane, w, h, outW, outH),
            modality = "image/gray-raw", width = outW, height = outH)
        case None =>
          r.copy(payload = resizeStub(r.payload, outW, outH), width = outW, height = outH)
      }
    })
  }

  /** Frame sampler for "video" payloads: every Nth fixed-size frame slice.
    * Real frame extraction is the same shape with a codec behind it (STUB).
    */
  def sampleFrames(
      media: Dataset[MediaRecord],
      frameBytes: Int,
      everyNth: Int
  ): DataFrame = {
    import media.sparkSession.implicits._
    media
      .flatMap { r =>
        val nFrames = r.payload.length / frameBytes
        (0 until nFrames by everyNth).map { f =>
          (r.media_id, f, r.payload.slice(f * frameBytes, (f + 1) * frameBytes))
        }
      }
      .toDF("media_id", "frame_idx", "frame")
  }

  // --- D4 q31: full pipe as a queries entry (oracled) ----------------------
  /** DuckDB oracle for [[pipeline]]: [[decodeStub]]'s f0 feature is a
    * deterministic left-fold over the payload bytes at positions ≡ 0 mod 8
    * (`f(0) += b_i/255.0`, then `/n`), which DuckDB reproduces in the same
    * IEEE evaluation order — per-row f0 is bit-identical. The only
    * engine-order-dependent value is the per-source `avg(f0)` group sum;
    * `round(..., 4)` absorbs the last-ulp summation-order difference
    * (values sit ~1e-13 from any rounding boundary; same slack q27/q30
    * rely on for their rounded doubles).
    */
  val pipelineSql: String =
    """WITH f AS (
      |  SELECT doc_id, source, length(text) AS n_bytes,
      |    CASE WHEN length(text) = 0 THEN 0.0 ELSE
      |      list_reduce(list_prepend(0.0::DOUBLE,
      |        list_transform(range(1, length(text) + 1, 8), p -> ord(text[p]) / 255.0)),
      |        (a, x) -> a + x) / length(text) END AS f0
      |  FROM documents)
      |SELECT source, count(*) AS n_media, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |  round(avg(f0), 4) AS avg_f0
      |FROM f GROUP BY source ORDER BY source""".stripMargin

  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(mediaTable(spark, dir))
    feats
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(expr("features[0]")), 4).as("avg_f0")
      )
      .orderBy(col("source"))
  }

  // --- D5: multimodal dedup (exact bytes + perceptual-hash bands) ------------

  case class MediaSig(media_id: Long, exact_key: String, phash: Long)

  /** Candidate pairs whose pHash hamming distance exceeds this are
    * dropped after the band join. */
  val PHashHammingMax = 8

  /** pHash plane edge: the decoded image is downscaled to 32×32 before
    * the DCT — the classic pHash recipe. */
  val PHashN = 32

  /** Low-frequency block edge: the top-left 8×8 DCT coefficients carry
    * the hash. */
  val PHashBlock = 8

  /** DCT-II cosine basis, built once. StrictMath keeps the hash
    * bit-identical across JVMs/platforms (Math.cos may differ by an ulp
    * under intrinsics, which could flip a bit whose coefficient ties the
    * median) — pHash values must be stable artifacts, like the text
    * fingerprints.
    */
  private lazy val PHashCos: Array[Array[Double]] =
    Array.tabulate(PHashN, PHashN)((k, x) =>
      StrictMath.cos(StrictMath.PI * (2 * x + 1) * k / (2.0 * PHashN)))

  /** REAL 32×32 DCT-II perceptual hash over a decoded grayscale plane —
    * pure arithmetic, no imaging libraries: mean-center the plane, 2-D
    * DCT via two separable 1-D passes against [[PHashCos]], keep the
    * top-left [[PHashBlock]]² low-frequency block, and set bit i when
    * the i-th of the 63 AC coefficients exceeds their median (the 32nd
    * smallest of 63 — exact order statistic, no interpolation; the DC
    * term is excluded). The hash is EXACTLY invariant to global
    * brightness shifts — not only in the DCT algebra but in IEEE
    * arithmetic: byte-plane pixel sums are exact integers in doubles, so
    * `mean(p + c) = mean(p) + c` exactly and the centered plane is
    * bit-identical under the shift (spec-pinned; without centering,
    * float residue on near-zero coefficients clustered at the median
    * flips bits). Bits pack into the low 63 bits of a Long, so the
    * 4×16-bit band split in [[mediaDedupOf]] rides unchanged. Only the
    * DECODE remains a stub; from the plane on, this is the production
    * hash.
    */
  def dctPHash(plane: Array[Byte]): Long = {
    val n = PHashN
    require(plane.length == n * n, s"dctPHash expects a $n x $n plane, got ${plane.length}")
    val cosT = PHashCos
    var sum = 0.0
    var pi  = 0
    while (pi < plane.length) { sum += (plane(pi) & 0xff); pi += 1 }
    val mean = sum / plane.length
    // rows pass: r(y)(u) = Σ_x (p(y,x) − mean)·cos[u][x]  (only u < block needed)
    val b = PHashBlock
    val rows = Array.ofDim[Double](n, b)
    var y = 0
    while (y < n) {
      var u = 0
      while (u < b) {
        var s = 0.0
        var x = 0
        while (x < n) { s += ((plane(y * n + x) & 0xff) - mean) * cosT(u)(x); x += 1 }
        rows(y)(u) = s
        u += 1
      }
      y += 1
    }
    // columns pass: c(v,u) = Σ_y r(y)(u)·cos[v][y]
    val coefs = new Array[Double](b * b)
    var v = 0
    while (v < b) {
      var u = 0
      while (u < b) {
        var s = 0.0
        var yy = 0
        while (yy < n) { s += rows(yy)(u) * cosT(v)(yy); yy += 1 }
        coefs(v * b + u) = s
        u += 1
      }
      v += 1
    }
    val ac  = java.util.Arrays.copyOfRange(coefs, 1, b * b) // 63 ACs, DC dropped
    val med = { val srt = ac.clone(); java.util.Arrays.sort(srt); srt(31) }
    var ph = 0L
    var i  = 0
    while (i < ac.length) {
      if (ac(i) > med) ph |= 1L << i
      i += 1
    }
    ph
  }

  /** Per-media dedup signatures, computed where a real pipeline computes
    * them — executor-local `mapPartitions` beside the decode: the exact
    * key is md5 over the RAW payload bytes (byte-identical copies across
    * re-crawls/mirrors), and the perceptual hash is the REAL [[dctPHash]]
    * over the 32×32 plane. For decodable images the plane is the REAL
    * decode+downscale ([[decodeImage]] → [[resizePlane]] — the full
    * production pHash pipeline, end to end); non-decodable payloads keep
    * the stub byte-plane so the synthetic corpus still exercises the
    * banding/verify machinery.
    */
  def mediaSignatures(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { m =>
          md.reset()
          val ek = md.digest(m.payload).map(b => f"$b%02x").mkString
          val plane = decodeImage(m.payload) match {
            case Some((w, h, p)) => resizePlane(p, w, h, PHashN, PHashN)
            case None            => resizeStub(m.payload, PHashN, PHashN)
          }
          MediaSig(m.media_id, ek, dctPHash(plane))
        }
      }
      .toDF()
  }

  /** D5: multimodal near-dup pairs — the q25/q26 machinery applied to the
    * binary-column modality: 4×16-bit pHash bands block candidates
    * (hamming ≤ 3 guarantees a shared band; wider radii are caught
    * best-effort like q26), buckets are [[TextOps.MaxBucket]]-capped so a
    * degenerate constant-payload corpus can't go quadratic, and the exact
    * hamming + byte-identity verdicts ride the pair row. Output per pair:
    * hamming distance and whether the pair is byte-identical — the
    * dedup-policy input ("drop exact copies, review perceptual ones").
    */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame =
    mediaDedupOf(mediaTable(spark, dir))

  def mediaDedupOf(media: Dataset[MediaRecord]): DataFrame = {
    val sig = mediaSignatures(media)
    val bandStructs = (0 until 4).map { bIdx =>
      struct(
        lit(bIdx).as("band"),
        (shiftrightunsigned(col("phash"), bIdx * 16).bitwiseAND(lit(0xffffL))).as("bh"))
    }
    val bands = sig.select(
      col("media_id"),
      col("exact_key"),
      col("phash"),
      explode(array(bandStructs: _*)).as("bd"))
    bands
      .select(col("bd.band").as("band"), col("bd.bh").as("bh"),
        struct(col("media_id"), col("exact_key"), col("phash")).as("m"))
      .groupBy(col("band"), col("bh"))
      .agg(
        count(lit(1)).as("nb"),
        // bounded cap+1 heap + exact count (the bucketPairs rule): a viral
        // bucket clamps at cap+1 rows of state, then its count drops it
        graft.functions.Expressions.collect_topk(col("m"), TextOps.MaxBucket + 1).as("ms"))
      .filter(col("nb").between(2, TextOps.MaxBucket))
      .select(array_sort(col("ms")).as("ms"))
      .select(explode(expr(TextOps.pairExpansionSql(
        "ms",
        "a.media_id AS media_a, b.media_id AS media_b, " +
          "a.phash AS pa, b.phash AS pb, " +
          "CAST(a.exact_key = b.exact_key AS BOOLEAN) AS exact_dup"))).as("p"))
      .select(col("p.media_a").as("media_a"), col("p.media_b").as("media_b"),
        expr("bit_count(p.pa ^ p.pb)").cast("int").as("hamming"), col("p.exact_dup"))
      .distinct()
      .filter(col("hamming") <= PHashHammingMax)
      .orderBy(col("media_a"), col("media_b"))
  }

  // --- D6: binary-payload CDC chunk store ------------------------------------

  case class MediaChunk(media_id: Long, chunk_idx: Int, h: String, clen: Int)

  /** q189's content-defined boundary rule on RAW BYTES (same constants:
    * 8-byte rolling polynomial sum, 2654435761 multiplicative mix, bits
    * 20-25 zero → 1-in-64 rate, ~64-byte mean chunks) — the storage
    * grain a media lake dedups and syncs on. Byte-domain chunking is
    * exactly what restic/borg/LBFS do to images and video: a re-encoded
    * header or prepended EXIF block shifts every FIXED window, but
    * content-defined boundaries re-align immediately (spec-pinned:
    * prefix-edited payload keeps > 0.5 of its bytes deduplicated).
    */
  val MmCdcWindow = 8
  val MmCdcMask   = 63L

  private[operators] def cdcCutsBytes(p: Array[Byte]): Array[Int] = {
    val n = p.length
    val w = MmCdcWindow
    if (n == 0) return Array.empty[Int]
    val cuts = scala.collection.mutable.ArrayBuffer[Int](0)
    if (n >= w) {
      var i = w
      while (i <= n) {
        var sum = 0L
        var j   = 0
        while (j < w) {
          // same 31-power weights as the text kernel, byte-valued lanes
          sum += (p(i - 1 - j) & 0xff).toLong * CdcBytePows(j)
          j += 1
        }
        if ((((sum % 1048576L) * 2654435761L % 4294967296L) / 1048576L) % (MmCdcMask + 1L) == 0L)
          cuts += i
        i += 1
      }
    }
    if (cuts.last != n) cuts += n
    cuts.toArray
  }

  private val CdcBytePows: Array[Long] =
    Iterator.iterate(1L)(_ * 31L).take(MmCdcWindow).toArray

  /** Chunk grain over the media table: one mapPartitions pass, one md5
    * per chunk — the executor-local kernel shape every D-op uses.
    */
  def mediaChunks(media: Dataset[MediaRecord]): Dataset[MediaChunk] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { m =>
        val cuts = cdcCutsBytes(m.payload)
        (0 until cuts.length - 1).iterator.map { k =>
          md.reset()
          val chunk = java.util.Arrays.copyOfRange(m.payload, cuts(k), cuts(k + 1))
          MediaChunk(m.media_id, k,
            md.digest(chunk).map(b => f"$b%02x").mkString, chunk.length)
        }
      }
    }
  }

  /** D6: per-media chunk-level dedup statistics under q189's min-owner
    * rule — the byte-exact complement of D5's perceptual pairs: D5 says
    * "these two images LOOK the same", this says "this fraction of the
    * lake's bytes is LITERALLY already stored". Hash-groupBy + join-back
    * only (never payload×payload); the chunk store keyed by `h` is what
    * an E12-style Bloom gate or q198's sync planner rides at the media
    * grain.
    */
  def mediaChunkDedup(spark: SparkSession, dir: String): DataFrame =
    mediaChunkDedupOf(mediaTable(spark, dir))

  def mediaChunkDedupOf(media: Dataset[MediaRecord]): DataFrame = {
    val chunks = mediaChunks(media).toDF()
    val cached = graft.core.CacheScope.persist(chunks)
    val owners = cached.groupBy(col("h")).agg(min(col("media_id")).as("owner"))
    cached
      .join(owners, "h")
      .groupBy(col("media_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("clen")).as("n_bytes"),
        sum(when(col("owner") < col("media_id"), 1L).otherwise(0L)).as("dup_chunks"),
        sum(when(col("owner") < col("media_id"), col("clen")).otherwise(0L)).as("dup_bytes"))
      .select(
        col("media_id"), col("n_chunks"), col("n_bytes"), col("dup_chunks"), col("dup_bytes"),
        round(col("dup_bytes").cast("double") / col("n_bytes").cast("double"), 4)
          .as("dup_ratio"))
      .orderBy(col("media_id"))
  }
}
