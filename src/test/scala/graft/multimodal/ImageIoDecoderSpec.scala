package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Real `javax.imageio` decode behind [[MediaDecoder]]: header-true
  * dimensions, actual-pixel features, bilinear resize round-trip, the
  * explicit undecodable marker, and audio/video delegation to the stub
  * (the remaining container-justified STUB surface). */
class ImageIoDecoderSpec extends AnyFunSuite {

  private val dec = new ImageIoDecoder()

  test("decode reads real PNG headers, not payload hashes") {
    for ((w, h) <- Seq((17, 9), (64, 48), (3, 5), (128, 1))) {
      val png = ImageIoDecoder.testCardPng(w, h)
      val m = dec.decode(png, "image/png")
      assert((m.width, m.height, m.nFrames, m.durationMs) == ((w, h, 1, 0L)))
      assert(m.mime == "image/png")
    }
  }

  test("undecodable image payloads return the explicit (-1,-1) marker") {
    val m = dec.decode("not an image".getBytes("UTF-8"), "image/png")
    assert((m.width, m.height, m.nFrames) == ((-1, -1, 0)))
  }

  test("resize produces a real image at the target dimensions") {
    val png = ImageIoDecoder.testCardPng(64, 48)
    val out = dec.resize(png, "image/png", 10, 7)
    val m = dec.decode(out, "image/png")
    assert((m.width, m.height) == ((10, 7)))
    // undecodable input passes through untouched
    val junk = "junk".getBytes("UTF-8")
    assert(dec.resize(junk, "image/png", 10, 7) eq junk)
  }

  test("features come from decoded pixels: white card ~ +0.5, black card ~ -0.5") {
    import java.awt.image.BufferedImage
    def solid(rgb: Int): Array[Byte] = {
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val white = dec.features(solid(0xffffff), "image/png", 4)
    val black = dec.features(solid(0x000000), "image/png", 4)
    assert(white.length == 4 && black.length == 4)
    white.foreach(v => assert(math.abs(v - 0.5f) < 1e-3, s"white cell $v"))
    black.foreach(v => assert(math.abs(v + 0.5f) < 1e-3, s"black cell $v"))
    // deterministic
    assert(dec.features(solid(0xffffff), "image/png", 4).toSeq == white.toSeq)
  }

  test("a still image is its own single frame; non-image mimes delegate to the stub") {
    val png = ImageIoDecoder.testCardPng(5, 5)
    val frames = dec.sampleFrames(png, "image/png", 8)
    assert(frames.length == 1 && (frames.head sameElements png))
    val bytes = "audio payload bytes".getBytes("UTF-8")
    assert(dec.decode(bytes, "audio/wav") == FakeDecoder.decode(bytes, "audio/wav"))
    assert(dec.features(bytes, "video/mp4", 8).toSeq ==
      FakeDecoder.features(bytes, "video/mp4", 8).toSeq)
  }
}
