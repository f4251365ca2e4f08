package graft

import graft.operators.Multimodal
import graft.operators.Multimodal._

/** D2 on REAL audio bytes: the JDK's own WAV writer/parser feeds the
  * integer PCM unpack and the amplitude/RMS/zero-crossing features — the
  * audio leg's analogue of MultimodalImageSpec (round 8's PNG precedent).
  * Lossy codecs stay on the honest stub path, exercised here too.
  */
class MultimodalAudioSpec extends SparkSpec {

  // canonical WAV byte fixtures shared with the E54 streaming spec
  import WavFixtures.{wav16, wav8}

  test("decodeAudio: 16-bit mono WAV round-trips the exact samples; text/empty return None") {
    val samples = Array(0, 1000, -1000, 32767, -32768, 123, -1)
    val Some((rate, ch, out)) = Multimodal.decodeAudio(wav16(samples))
    assert(rate == 8000 && ch == 1)
    assert(out.toSeq == samples.toSeq)
    assert(Multimodal.decodeAudio("not audio at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeAudio(Array.empty[Byte]).isEmpty)
    // a RIFF header over garbage must fail closed, not throw
    val junk = "RIFFxxxxWAVEgarbage".getBytes("UTF-8")
    assert(Multimodal.decodeAudio(junk).isEmpty)
  }

  test("decodeAudio: stereo downmix is the exact floor-mean of the channels") {
    // L = 1000, R = 3000 → mono 2000; L = -1001, R = 1000 → floor(-1/2)·? = floorDiv(-1, 2) = -1
    val interleaved = Array(1000, 3000, -1001, 1000)
    val Some((_, ch, out)) = Multimodal.decodeAudio(wav16(interleaved, channels = 2))
    assert(ch == 2)
    assert(out.toSeq == Seq(2000, Math.floorDiv(-1001 + 1000, 2)))
  }

  test("decodeAudio: 8-bit unsigned samples center at 128 and scale to the 16-bit domain") {
    val Some((_, _, out)) = Multimodal.decodeAudio(wav8(Array(128, 129, 127, 255, 0)))
    assert(out.toSeq == Seq(0, 1 << 8, -(1 << 8), 127 << 8, -(128 << 8)))
  }

  test("audioFeatures: square wave has exact closed-form amplitude/RMS/peak/zcr") {
    val a = 8192 // power of two: every normalized feature is IEEE-exact
    val samples = Array.tabulate(64)(i => if (i % 2 == 0) a else -a)
    val f = Multimodal.audioFeatures(samples)
    assert(f(0) == a / 32768.0) // mean |amplitude|
    assert(f(1) == a / 32768.0) // RMS of a square wave = amplitude
    assert(f(2) == a / 32768.0) // peak
    assert(f(3) == 1.0)         // sign flips every sample
    (4 to 7).foreach(k => assert(f(k) == a / 32768.0)) // quarter RMS envelope
  }

  test("audioFeatures: doubling amplitude exactly doubles every level feature") {
    val samples  = Array.tabulate(96)(i => ((i * 37) % 4001) - 2000)
    val doubled  = samples.map(_ * 2)
    val f1 = Multimodal.audioFeatures(samples)
    val f2 = Multimodal.audioFeatures(doubled)
    // ×2 is exact in IEEE doubles: |x|, x², sqrt all scale bit-exactly
    (0 to 2).foreach(k => assert(f2(k) == 2 * f1(k)))
    assert(f2(3) == f1(3)) // zero-crossing rate is amplitude-invariant
    (4 to 7).foreach(k => assert(f2(k) == 2 * f1(k)))
  }

  test("D2: real WAV payloads get PCM features (not the byte stub), partition-invariant") {
    import spark.implicits._
    val quiet = wav16(Array.tabulate(256)(i => if (i % 2 == 0) 100 else -100))
    val loud  = wav16(Array.tabulate(256)(i => if (i % 2 == 0) 16384 else -16384))
    val text  = "plain text payload".getBytes("UTF-8")
    val recs = Seq(
      MediaRecord(1L, quiet, "audio/wav", 0, 0, "fx"),
      MediaRecord(2L, loud, "audio/wav", 0, 0, "fx"),
      MediaRecord(3L, text, "text/plain", 0, 0, "fx"))
    def featsOf(parts: Int): Map[Long, Seq[Double]] =
      Multimodal.extractFeatures(spark.createDataset(recs).repartition(parts))
        .collect().map(m => m.media_id -> m.features.toSeq).toMap
    val f = featsOf(1)
    assert(f(1) == Multimodal.audioFeatures(Array.tabulate(256)(i => if (i % 2 == 0) 100 else -100)).toSeq)
    assert(f(2)(1) == 16384 / 32768.0) // RMS of the loud square wave, exact
    assert(f(3) == Multimodal.decodeStub(text).toSeq) // non-media stays on the stub
    assert(featsOf(3) == f) // partitioning cannot change a per-row decode
  }
}
