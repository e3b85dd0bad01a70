package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Real WAV decode via javax.sound.sampled: header/PCM parsing, the
  * audio MediaMeta field mapping, exact square-wave RMS, standalone-WAV
  * segmentation, and the undecodable marker. */
class WavAudioDecoderSpec extends AnyFunSuite {

  private val dec = new WavAudioDecoder()

  test("decode parses rate/channels/frames/duration from the real header") {
    val wav = WavAudioDecoder.testToneWav(rate = 8000, channels = 2, frames = 4000)
    val m = dec.decode(wav, "audio/wav")
    assert(m == MediaMeta("audio/wav", 8000, 2, 4000, 500L))
  }

  test("undecodable payload returns the explicit (-1,-1) marker") {
    val m = dec.decode("definitely not audio".getBytes("UTF-8"), "audio/wav")
    assert(m == MediaMeta("audio/wav", -1, -1, 0, 0L))
  }

  test("non-audio mime delegates to the fallback decoder") {
    val bytes = Array[Byte](1, 2, 3)
    assert(dec.decode(bytes, "video/mp4") == FakeDecoder.decode(bytes, "video/mp4"))
  }

  test("windowed RMS of the ±0.5 square wave is exactly 0.5 per window") {
    val wav = WavAudioDecoder.testToneWav(rate = 16000, channels = 1, frames = 1600)
    val f = dec.features(wav, "audio/wav", dim = 4)
    assert(f.toSeq == Seq(0.5f, 0.5f, 0.5f, 0.5f))
  }

  test("stereo mono-mix preserves the in-phase square amplitude") {
    val wav = WavAudioDecoder.testToneWav(rate = 16000, channels = 2, frames = 1600)
    val f = dec.features(wav, "audio/wav", dim = 2)
    assert(f.toSeq == Seq(0.5f, 0.5f))
  }

  test("sampleFrames re-encodes standalone decodable WAV segments that tile the clip") {
    val wav = WavAudioDecoder.testToneWav(rate = 8000, channels = 1, frames = 4001)
    val segs = dec.sampleFrames(wav, "audio/wav", maxFrames = 3)
    assert(segs.length == 3)
    val metas = segs.map(b => dec.decode(b, "audio/wav"))
    assert(metas.forall(m => m.width == 8000 && m.height == 1))
    assert(metas.map(_.nFrames).sum == 4001) // uneven split still tiles exactly
  }

  test("corrupt payload yields no segments; features yield the zero vector") {
    val junk = "nope".getBytes("UTF-8")
    assert(dec.sampleFrames(junk, "audio/wav", maxFrames = 2).isEmpty)
    assert(dec.features(junk, "audio/wav", dim = 3).toSeq == Seq(0f, 0f, 0f))
  }
}
