package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem, UnsupportedAudioFileException}

/** REAL audio decoding for `audio/`-prefixed mimes via the JDK's bundled
  * `javax.sound.sampled` (the WAV/AIFF/AU readers ship with every JVM —
  * no new dependency), the audio analog of [[ImageIoDecoder]]: the
  * multimodal STUB now covers video only.
  *
  * [[MediaMeta]] field mapping for audio (documented contract, mirrored
  * by the q_media_audio_meta oracle):
  *   - `width`  = sample rate in Hz,
  *   - `height` = channel count,
  *   - `nFrames` = PCM frame count (one frame = one sample per channel),
  *   - `durationMs` = frames * 1000 / rate (floor),
  *   - undecodable payload → the explicit `(-1, -1, 0, 0)` marker (the
  *     image decoder's contract): curation filters on `width > 0`.
  *
  * `features` are real signal statistics: the clip is mono-mixed and
  * normalized to [−1, 1), split into `dim` contiguous windows, and each
  * dimension is that window's RMS amplitude — an honest energy envelope
  * (swap in an audio encoder without touching the Spark plumbing).
  * `sampleFrames` performs real segmentation: `k` contiguous PCM runs,
  * each re-encoded as a STANDALONE WAV (header + slice) so downstream
  * stages can decode segments independently. `resize` has no audio
  * meaning (resampling is a DSP codec concern) and delegates to the
  * fallback, as every non-audio mime does.
  *
  * Thread-safety: `AudioSystem` readers are static and thread-safe for
  * independent streams; the decoder holds no mutable state. */
final class WavAudioDecoder(fallback: MediaDecoder = FakeDecoder) extends MediaDecoder {

  private def isAudio(mime: String): Boolean =
    mime != null && mime.startsWith("audio/")

  /** Decode to (format, raw PCM bytes); None when no reader matches or
    * the payload is truncated/corrupt. */
  private def read(bytes: Array[Byte]): Option[(AudioFormat, Array[Byte])] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try Some((in.getFormat, in.readAllBytes()))
      finally in.close()
    } catch {
      case _: UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  override def decode(bytes: Array[Byte], mime: String): MediaMeta =
    if (!isAudio(mime)) fallback.decode(bytes, mime)
    else read(bytes) match {
      case None => MediaMeta(mime, -1, -1, 0, 0L)
      case Some((fmt, pcm)) =>
        val frames = if (fmt.getFrameSize > 0) pcm.length / fmt.getFrameSize else 0
        val rate = fmt.getSampleRate.toInt
        MediaMeta(mime, rate, fmt.getChannels, frames,
          if (rate > 0) frames.toLong * 1000L / rate else 0L)
    }

  /** Mono-mixed samples normalized to [−1, 1) — PCM16 signed LE and PCM8
    * unsigned, the formats the JDK WAV reader emits. */
  private def monoSamples(fmt: AudioFormat, pcm: Array[Byte]): Array[Double] = {
    val ch = fmt.getChannels
    val bits = fmt.getSampleSizeInBits
    val frameSize = fmt.getFrameSize
    if (frameSize <= 0 || ch <= 0) return Array.empty
    val n = pcm.length / frameSize
    val out = new Array[Double](n)
    var f = 0
    while (f < n) {
      var sum = 0.0
      var c = 0
      while (c < ch) {
        val off = f * frameSize + c * (bits / 8)
        val v =
          if (bits == 16) {
            val lo = pcm(off) & 0xff
            val hi = pcm(off + 1)
            ((hi << 8) | lo).toShort / 32768.0
          } else if (bits == 8) ((pcm(off) & 0xff) - 128) / 128.0
          else 0.0
        sum += v
        c += 1
      }
      out(f) = sum / ch
      f += 1
    }
    out
  }

  override def features(bytes: Array[Byte], mime: String, dim: Int): Array[Float] =
    if (!isAudio(mime)) fallback.features(bytes, mime, dim)
    else read(bytes) match {
      case None => new Array[Float](dim) // undecodable → zero vector
      case Some((fmt, pcm)) =>
        val s = monoSamples(fmt, pcm)
        val out = new Array[Float](dim)
        if (s.nonEmpty) {
          var d = 0
          while (d < dim) {
            val from = d.toLong * s.length / dim
            val until = (d + 1).toLong * s.length / dim
            if (until > from) {
              var acc = 0.0
              var i = from.toInt
              while (i < until) { acc += s(i) * s(i); i += 1 }
              out(d) = math.sqrt(acc / (until - from)).toFloat
            }
            d += 1
          }
        }
        out
    }

  override def sampleFrames(bytes: Array[Byte], mime: String, maxFrames: Int): Seq[Array[Byte]] =
    if (!isAudio(mime)) fallback.sampleFrames(bytes, mime, maxFrames)
    else if (maxFrames <= 0) Seq.empty
    else read(bytes) match {
      case None => Seq.empty
      case Some((fmt, pcm)) =>
        val frameSize = fmt.getFrameSize
        val total = if (frameSize > 0) pcm.length / frameSize else 0
        if (total == 0) Seq.empty
        else {
          val k = math.min(maxFrames, total)
          (0 until k).map { i =>
            val from = i.toLong * total / k
            val until = (i + 1).toLong * total / k
            val slice = java.util.Arrays.copyOfRange(
              pcm, from.toInt * frameSize, until.toInt * frameSize)
            WavAudioDecoder.encodeWav(fmt, slice)
          }
        }
    }

  override def resize(bytes: Array[Byte], mime: String, width: Int, height: Int): Array[Byte] =
    // width/height carry no audio meaning; resampling is a DSP concern
    // outside this decoder's honest scope — delegate like non-audio mimes
    fallback.resize(bytes, mime, width, height)
}

object WavAudioDecoder {

  /** Re-encode raw PCM under `fmt` as a standalone WAV byte array. */
  private[multimodal] def encodeWav(fmt: AudioFormat, pcm: Array[Byte]): Array[Byte] = {
    val frames = if (fmt.getFrameSize > 0) pcm.length / fmt.getFrameSize else 0
    val stream = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    try AudioSystem.write(stream, AudioFileFormat.Type.WAVE, bos)
    finally stream.close()
    bos.toByteArray
  }

  /** Deterministic PCM16 test clip: a Nyquist-rate square wave (samples
    * alternate +amp/−amp every frame, all channels in phase). With the
    * default amp 16384 every normalized sample is ±0.5 EXACTLY, so any
    * window's RMS is exactly 0.5 — the oracle literal needs no float
    * tolerance. The audio analog of [[ImageIoDecoder.testCardPng]]. */
  def testToneWav(rate: Int, channels: Int, frames: Int, amp: Short = 16384): Array[Byte] = {
    val fmt = new AudioFormat(rate.toFloat, 16, channels, /* signed = */ true, /* bigEndian = */ false)
    val pcm = new Array[Byte](frames * channels * 2)
    var f = 0
    while (f < frames) {
      val v: Short = if (f % 2 == 0) amp else (-amp).toShort
      var c = 0
      while (c < channels) {
        val off = (f * channels + c) * 2
        pcm(off) = (v & 0xff).toByte
        pcm(off + 1) = ((v >> 8) & 0xff).toByte
        c += 1
      }
      f += 1
    }
    encodeWav(fmt, pcm)
  }
}
