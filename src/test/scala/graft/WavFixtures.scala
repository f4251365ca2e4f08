package graft

import java.io.ByteArrayOutputStream

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Shared WAV byte fixtures for the audio specs (MultimodalAudioSpec, the
  * E54 streaming monitor) — one canonical byte layout, so the suites can
  * never silently test different containers.
  */
object WavFixtures {

  /** Canonical WAV bytes from integer samples via `AudioSystem.write` —
    * 16-bit signed little-endian, interleaved when stereo.
    */
  def wav16(samples: Array[Int], channels: Int = 1, rate: Float = 8000f): Array[Byte] = {
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, channels,
      2 * channels, rate, false)
    val raw = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length / channels)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** 8-bit unsigned mono WAV (byte values 0..255, 128 = silence). */
  def wav8(samples: Array[Int], rate: Float = 8000f): Array[Byte] = {
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED, rate, 8, 1, 1, rate, false)
    val raw = samples.map(v => (v & 0xff).toByte)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }
}
