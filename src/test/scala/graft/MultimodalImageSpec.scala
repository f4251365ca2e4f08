package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.operators.Multimodal
import graft.operators.Multimodal._

/** D2/D3b/D5 on REAL image bytes: the JDK's own PNG codec feeds the
  * integer-luma decode, the box-filter resize, and the DCT pHash — the
  * full production pipeline with zero stubs in the path. The stub path
  * stays covered by OperatorsSpec over the synthetic text-byte corpus.
  */
class MultimodalImageSpec extends SparkSpec {

  /** Deterministic grayscale-in-RGB PNG: gradient + a bright block, all
    * values in [20, 245] so a +10 brightness shift never clamps.
    */
  private def png(w: Int, h: Int, shift: Int = 0, block: Boolean = true): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val base = 20 + x * 160 / w + y * 40 / h
      val inBlock = block && x >= w / 4 && x < w / 2 && y >= h / 4 && y < h / 2
      val v = math.min(235, base + (if (inBlock) 30 else 0)) + shift
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def rec(id: Long, payload: Array[Byte]): MediaRecord =
    MediaRecord(id, payload, "image/png", 0, 0, "fixture")

  test("decodeImage: PNG round-trips the exact integer-luma plane; text bytes return None") {
    val bytes = png(40, 24)
    val Some((w, h, plane)) = Multimodal.decodeImage(bytes)
    assert((w, h) == (40, 24))
    // gray pixels: r = g = b = v, so BT.601 integer luma is exactly v
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until h; x <- 0 until w)
      assert((plane(y * w + x) & 0xff) == (img.getRGB(x, y) & 0xff))
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(Array.empty[Byte]).isEmpty)
  }

  test("resizePlane: integer box-filter means, checked cell by cell") {
    val (w, h) = (6, 4)
    val plane = Array.tabulate(w * h)(i => (i * 7 % 251).toByte)
    val out = Multimodal.resizePlane(plane, w, h, 3, 2)
    for (oy <- 0 until 2; ox <- 0 until 3) {
      val vals = for (y <- oy * 2 until (oy + 1) * 2; x <- ox * 2 until (ox + 1) * 2)
        yield (plane(y * w + x) & 0xff).toLong
      assert((out(oy * 3 + ox) & 0xff) == (vals.sum / vals.length).toInt)
    }
  }

  test("D2: real PNG payloads get plane features (not the byte stub), partition-invariant") {
    import spark.implicits._
    val bytes = png(64, 48)
    val media = Seq(rec(1L, bytes), rec(2L, png(64, 48, block = false))).toDS()
    val got = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val Some((w, h, plane)) = Multimodal.decodeImage(bytes)
    assert(got(0).features.toSeq == Multimodal.planeFeatures(w, h, plane).toSeq)
    assert(got(0).features.toSeq != Multimodal.decodeStub(bytes).toSeq)
    // block raises the top-left quadrant's mean vs the blockless twin
    assert(got(0).features(2) > got(1).features(2))
    val re = Multimodal.extractFeatures(media.repartition(3)).collect().sortBy(_.media_id)
    assert(re.map(_.features.toSeq).toSeq == got.map(_.features.toSeq).toSeq)
  }

  test("D3b: resize decodes real PNGs and emits the box-filtered gray plane") {
    import spark.implicits._
    val bytes = png(64, 48)
    val media = Seq(rec(1L, bytes)).toDS()
    val out = Multimodal.resize(media, 16, 12).collect().head
    assert((out.width, out.height, out.modality) == (16, 12, "image/gray-raw"))
    val Some((w, h, plane)) = Multimodal.decodeImage(bytes)
    assert(out.payload.toSeq == Multimodal.resizePlane(plane, w, h, 16, 12).toSeq)
    // non-decodable payloads keep the stub byte-domain path
    val stubOut = Multimodal.resize(
      Seq(rec(2L, "just text".getBytes("UTF-8"))).toDS(), 16, 12).collect().head
    assert(stubOut.payload.toSeq ==
      Multimodal.resizeStub("just text".getBytes("UTF-8"), 16, 12).toSeq)
    assert(stubOut.modality == "image/png") // untouched marker: no decode happened
  }

  test("D5: the full real pipeline (PNG → decode → resize → DCT pHash) is brightness-invariant") {
    import spark.implicits._
    val base    = png(64, 64)
    val shifted = png(64, 64, shift = 10)          // same structure, +10 brightness
    val other   = png(64, 64, block = false)       // structurally different
    assert(!java.util.Arrays.equals(base, shifted))
    val media = Seq(rec(1L, base), rec(2L, shifted), rec(3L, other)).toDS()
    val sig = Multimodal.mediaSignatures(media).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sig(1L) == sig(2L), "pHash must be exactly brightness-shift invariant end-to-end")
    assert(java.lang.Long.bitCount(sig(1L) ^ sig(3L)) > PHashHammingMax,
      s"structurally different image too close: ${java.lang.Long.bitCount(sig(1L) ^ sig(3L))}")
    // and the dedup operator surfaces exactly the perceptual pair
    val pairs = Multimodal.mediaDedupOf(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
    assert(pairs.toSeq == Seq((1L, 2L, 0, false)))
  }
}
