package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** REAL image decoding for `image/`-prefixed mimes via the JDK's bundled
  * `javax.imageio` (PNG/JPEG/GIF/BMP readers ship with every JVM — no
  * new dependency), narrowing the multimodal STUB to audio/video only:
  *
  *   - `decode`: width/height from the actual image header; an
  *     undecodable payload returns the explicit `(-1, -1)` marker meta
  *     rather than fabricated dimensions — a curation pipeline filters
  *     on it (`width > 0`) instead of crashing mid-scan or silently
  *     keeping garbage;
  *   - `features`: real pixel statistics — mean luminance over a
  *     `g×g` grid (g = ⌈√dim⌉), centered to [−0.5, 0.5] — a stand-in
  *     visual descriptor computed from actual decoded pixels (swap in a
  *     vision encoder without touching the Spark plumbing);
  *   - `resize`: actual decode → bilinear scale → PNG re-encode;
  *   - `sampleFrames`: a still image is its own single frame;
  *   - any non-image mime delegates to the `fallback` decoder
  *     ([[FakeDecoder]] by default — the audio/video STUB, still
  *     container-justified: no codec libraries here).
  *
  * Thread-safety: `ImageIO` static readers are thread-safe for
  * independent streams; the decoder holds no mutable state, so one
  * instance serves a whole executor. Disk caching is disabled
  * process-wide ([[ImageIoDecoder.useCacheOff]]) — executor-local
  * decode must never spill scratch files per image. */
final class ImageIoDecoder(fallback: MediaDecoder = FakeDecoder) extends MediaDecoder {

  private def isImage(mime: String): Boolean =
    mime != null && mime.startsWith("image/")

  private def read(bytes: Array[Byte]): BufferedImage = {
    ImageIoDecoder.useCacheOff
    try ImageIO.read(new ByteArrayInputStream(bytes)) // null if no reader matches
    catch { case _: java.io.IOException => null } // truncated/corrupt payload
  }

  override def decode(bytes: Array[Byte], mime: String): MediaMeta =
    if (!isImage(mime)) fallback.decode(bytes, mime)
    else {
      val img = read(bytes)
      if (img == null) MediaMeta(mime, -1, -1, 0, 0L)
      else MediaMeta(mime, img.getWidth, img.getHeight, nFrames = 1, durationMs = 0L)
    }

  override def features(bytes: Array[Byte], mime: String, dim: Int): Array[Float] =
    if (!isImage(mime)) fallback.features(bytes, mime, dim)
    else {
      val img = read(bytes)
      if (img == null) new Array[Float](dim) // undecodable → zero vector
      else ImageIoDecoder.lumaGrid(img, dim)
    }

  override def resize(bytes: Array[Byte], mime: String, width: Int, height: Int): Array[Byte] =
    if (!isImage(mime)) fallback.resize(bytes, mime, width, height)
    else {
      val img = read(bytes)
      if (img == null) bytes // undecodable: pass through untouched
      else {
        val scaled = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
        val gfx = scaled.createGraphics()
        try {
          gfx.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          gfx.drawImage(img, 0, 0, width, height, null)
        } finally gfx.dispose()
        val bos = new ByteArrayOutputStream()
        ImageIO.write(scaled, "png", bos)
        bos.toByteArray
      }
    }

  override def sampleFrames(bytes: Array[Byte], mime: String, maxFrames: Int): Seq[Array[Byte]] =
    if (!isImage(mime)) fallback.sampleFrames(bytes, mime, maxFrames)
    else if (bytes == null || bytes.isEmpty || maxFrames <= 0) Seq.empty
    else Seq(bytes) // a still image is its single frame
}

object ImageIoDecoder {
  /** Idempotent process-wide switch: decode from memory, never via the
    * default temp-file cache (an executor decoding millions of images
    * must not hit the local disk per payload). */
  lazy val useCacheOff: Unit = ImageIO.setUseCache(false)

  /** Mean-luminance grid descriptor over a decoded frame — the stand-in
    * visual embedding shared by the image decoder and the GIF video
    * decoder (frame 0): g×g cells (g = ⌈√dim⌉), ITU-R BT.601 luma,
    * centered to [−0.5, 0.5]; cells beyond the image stay 0. */
  def lumaGrid(img: BufferedImage, dim: Int): Array[Float] = {
    val g = math.ceil(math.sqrt(dim.toDouble)).toInt.max(1)
    val out = new Array[Float](dim)
    val w = img.getWidth
    val h = img.getHeight
    var d = 0
    while (d < dim) {
      val cx = d % g
      val cy = d / g
      // cell bounds (empty cells beyond the g×g grid stay 0)
      val x0 = cx * w / g; val x1 = math.max(x0 + 1, (cx + 1) * w / g)
      val y0 = cy * h / g; val y1 = math.max(y0 + 1, (cy + 1) * h / g)
      if (cy < g && x0 < w && y0 < h) {
        var sum = 0.0
        var n = 0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = img.getRGB(x, y)
            // ITU-R BT.601 luma from the sRGB bytes
            val lum = 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            sum += lum / 255.0
            n += 1
            x += 1
          }
          y += 1
        }
        if (n > 0) out(d) = (sum / n - 0.5).toFloat
      }
      d += 1
    }
    out
  }

  /** PNG-encode a synthetic RGB test card (deterministic gradient) —
    * shared by the fixture spec and the oracle-checked metadata query so
    * both exercise REAL encode→decode round-trips without any bundled
    * binary fixture. */
  def testCardPng(width: Int, height: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((x * 255 / math.max(1, width - 1)) << 16) |
          ((y * 255 / math.max(1, height - 1)) << 8) | 0x40)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
