package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Real multi-frame GIF decode: frame counts and summed delays come from
  * actually reading the sequence, sampled frames re-decode as standalone
  * single-frame clips with pixel fidelity (solid-color frames survive
  * the GIF palette exactly), and corrupt payloads surface the (-1,-1)
  * marker instead of fabricated values. */
class GifVideoDecoderSpec extends AnyFunSuite {

  private val dec = new GifVideoDecoder()

  test("decode reads frame count and summed GCE delays from the sequence") {
    val bytes = GifVideoDecoder.testAnimGif(24, 16, nFrames = 6, delayCs = 4)
    val m = dec.decode(bytes, "video/gif")
    assert(m == MediaMeta("video/gif", 24, 16, 6, 6L * 4 * 10))
  }

  test("single-frame clip decodes with its own delay") {
    val bytes = GifVideoDecoder.testAnimGif(8, 8, nFrames = 1, delayCs = 25)
    val m = dec.decode(bytes, "video/gif")
    assert(m == MediaMeta("video/gif", 8, 8, 1, 250L))
  }

  test("corrupt payload yields the (-1,-1) marker, empty frames, zero features") {
    val junk = "definitely not a gif".getBytes("UTF-8")
    assert(dec.decode(junk, "video/gif") == MediaMeta("video/gif", -1, -1, 0, 0L))
    assert(dec.sampleFrames(junk, "video/gif", 4).isEmpty)
    assert(dec.features(junk, "video/gif", 4).toSeq == Seq(0f, 0f, 0f, 0f))
  }

  test("sampled frames re-decode as standalone 1-frame clips with exact pixels") {
    val n = 5
    val bytes = GifVideoDecoder.testAnimGif(10, 6, nFrames = n, delayCs = 2)
    val frames = dec.sampleFrames(bytes, "video/gif", maxFrames = 3)
    assert(frames.size == 3)
    for ((fb, i) <- frames.zipWithIndex) {
      val fm = dec.decode(fb, "video/gif")
      assert(fm.width == 10 && fm.height == 6 && fm.nFrames == 1 && fm.durationMs == 0L)
      // evenly-spaced source index i*n/take; solid fills survive the
      // palette exactly, so the sampled frame's pixel proves WHICH
      // source frame was taken
      val srcIdx = i * n / 3
      val want = new java.awt.Color(40 * (srcIdx % 6) + 15, 32, 200 - 24 * (srcIdx % 8)).getRGB
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb))
      assert(img.getRGB(3, 3) == want, s"frame $i (source $srcIdx)")
    }
  }

  test("a clip shorter than the budget samples every frame once") {
    val bytes = GifVideoDecoder.testAnimGif(8, 8, nFrames = 2, delayCs = 1)
    assert(dec.sampleFrames(bytes, "video/gif", maxFrames = 3).size == 2)
  }

  test("resize transcodes the whole animation: frame count and duration survive") {
    val bytes = GifVideoDecoder.testAnimGif(32, 20, nFrames = 4, delayCs = 3)
    val out = dec.resize(bytes, "video/gif", 8, 5)
    assert(dec.decode(out, "video/gif") == MediaMeta("video/gif", 8, 5, 4, 4L * 3 * 10))
    // frame identity survives the scale: frame 2's solid fill
    val f = dec.sampleFrames(out, "video/gif", 4)(2)
    val want = new java.awt.Color(40 * 2 + 15, 32, 200 - 24 * 2).getRGB
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
    assert(img.getRGB(2, 2) == want)
  }

  test("features are frame-0 luma: solid color gives a flat exact grid") {
    val bytes = GifVideoDecoder.testAnimGif(16, 16, nFrames = 3, delayCs = 1)
    // frame 0 fill: rgb(15, 32, 200)
    val want = ((0.299 * 15 + 0.587 * 32 + 0.114 * 200) / 255.0 - 0.5).toFloat
    val fs = dec.features(bytes, "video/gif", 4)
    assert(fs.forall(f => math.abs(f - want) < 1e-6), fs.toSeq.toString)
  }

  test("non-gif mimes delegate to the fallback") {
    val junk = Array[Byte](1, 2, 3)
    assert(dec.decode(junk, "video/mp4") == FakeDecoder.decode(junk, "video/mp4"))
  }
}
