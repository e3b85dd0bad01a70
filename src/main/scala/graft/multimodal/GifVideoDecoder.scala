package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.metadata.IIOMetadataNode
import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}

/** REAL video decode for ONE container format — multi-frame GIF — via
  * the JDK's bundled `javax.imageio` GIF reader/writer (no codec
  * dependency), narrowing the multimodal STUB to codec video (H.264
  * etc., which genuinely has no pure-JDK decoder):
  *
  *   - `decode`: frame count from the actual image sequence
  *     (`getNumImages(true)`), width/height from frame 0, duration as
  *     the SUM of per-frame GraphicControlExtension delays (the GIF
  *     delay unit is centiseconds → ×10 ms); an undecodable payload
  *     returns the `(-1, -1)` marker meta, the same curation contract
  *     as the image/audio decoders;
  *   - `sampleFrames`: evenly-spaced REAL frames re-encoded as
  *     standalone single-frame GIFs — each sampled payload decodes
  *     again through this same decoder (n_frames = 1, zero duration),
  *     which is what a frame-sampling training pipeline feeds to a
  *     vision encoder;
  *   - `features`: the luminance-grid descriptor over frame 0's actual
  *     pixels (the [[ImageIoDecoder]] stand-in descriptor, applied to
  *     the first frame — swap in a video encoder without touching the
  *     Spark plumbing);
  *   - `resize`: a real transcode — every frame bilinear-scaled and
  *     re-encoded with its original delay, so frame count and duration
  *     survive the scale;
  *   - any non-`video/gif` mime delegates to `fallback`.
  *
  * Thread-safety: reader/writer instances are created per call (ImageIO
  * SPI instances are NOT thread-safe across concurrent use, unlike the
  * static `ImageIO.read`); creation is cheap next to the decode. */
final class GifVideoDecoder(fallback: MediaDecoder = FakeDecoder) extends MediaDecoder {

  private def isGifVideo(mime: String): Boolean =
    mime != null && (mime == "video/gif" || mime == "image/gif+anim")

  /** GIF image-metadata tree name (the javax.imageio published schema). */
  private val GifImageMeta = "javax_imageio_gif_image_1.0"

  private def withReader[A](bytes: Array[Byte])(f: javax.imageio.ImageReader => A): Option[A] = {
    ImageIoDecoder.useCacheOff
    val readers = ImageIO.getImageReadersByFormatName("gif")
    if (!readers.hasNext) return None
    val reader = readers.next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, false, false)
      // force a header parse so corrupt payloads fail HERE, not lazily
      if (reader.getNumImages(true) <= 0) None else Some(f(reader))
    } catch {
      // any decode failure on an untrusted payload — truncated stream,
      // malformed LZW table, bogus metadata attribute — maps to the
      // undecodable marker rather than failing the Spark task
      case scala.util.control.NonFatal(_) => None
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** Per-frame delay in centiseconds from the GraphicControlExtension
    * node (0 when the extension is absent). */
  private def frameDelayCs(reader: javax.imageio.ImageReader, i: Int): Int = {
    val root = reader.getImageMetadata(i).getAsTree(GifImageMeta).asInstanceOf[IIOMetadataNode]
    var child = root.getFirstChild
    while (child != null) {
      if (child.getNodeName == "GraphicControlExtension") {
        val raw = child.asInstanceOf[IIOMetadataNode].getAttribute("delayTime")
        // absent/empty/garbage attribute on a malformed payload = no delay
        return try { if (raw == null || raw.isEmpty) 0 else raw.toInt }
        catch { case _: NumberFormatException => 0 }
      }
      child = child.getNextSibling
    }
    0
  }

  override def decode(bytes: Array[Byte], mime: String): MediaMeta =
    if (!isGifVideo(mime)) fallback.decode(bytes, mime)
    else withReader(bytes) { reader =>
      val n = reader.getNumImages(true)
      val first = reader.read(0)
      val totalCs = (0 until n).map(frameDelayCs(reader, _).toLong).sum
      MediaMeta(mime, first.getWidth, first.getHeight, n, totalCs * 10L)
    }.getOrElse(MediaMeta(mime, -1, -1, 0, 0L))

  override def features(bytes: Array[Byte], mime: String, dim: Int): Array[Float] =
    if (!isGifVideo(mime)) fallback.features(bytes, mime, dim)
    else withReader(bytes) { reader =>
      ImageIoDecoder.lumaGrid(reader.read(0), dim)
    }.getOrElse(new Array[Float](dim))

  override def sampleFrames(bytes: Array[Byte], mime: String, maxFrames: Int): Seq[Array[Byte]] =
    if (!isGifVideo(mime)) fallback.sampleFrames(bytes, mime, maxFrames)
    else if (maxFrames <= 0) Seq.empty
    else withReader(bytes) { reader =>
      val n = reader.getNumImages(true)
      val take = math.min(maxFrames, n)
      // evenly-spaced frame indices over the sequence (floor spacing,
      // first frame always included)
      (0 until take).map { i =>
        val idx = i * n / take
        GifVideoDecoder.encodeGif(Seq((reader.read(idx), 0)))
      }
    }.getOrElse(Seq.empty)

  override def resize(bytes: Array[Byte], mime: String, width: Int, height: Int): Array[Byte] =
    if (!isGifVideo(mime)) fallback.resize(bytes, mime, width, height)
    else withReader(bytes) { reader =>
      // a real transcode: EVERY frame bilinear-scaled, per-frame delays
      // preserved — the resized clip keeps its frame count and duration
      val n = reader.getNumImages(true)
      val frames = (0 until n).map { i =>
        val scaled = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
        val g = scaled.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(reader.read(i), 0, 0, width, height, null)
        } finally g.dispose()
        (scaled, frameDelayCs(reader, i))
      }
      GifVideoDecoder.encodeGif(frames)
    }.getOrElse(bytes)
}

object GifVideoDecoder {

  /** Encode `(frame, delayCs)` pairs as one (possibly animated) GIF via
    * the JDK writer, stamping each frame's GraphicControlExtension
    * delay. Shared by `sampleFrames`/`resize` and the test fixture.
    * Frames are normalized to RGB first: re-encoding a decoded
    * TYPE_BYTE_INDEXED frame directly makes the writer derive a fresh
    * palette from metadata that no longer matches the pixel indices
    * (observed as black frames) — drawing onto an RGB canvas makes the
    * writer quantize from actual pixel values instead. */
  def encodeGif(framesRaw: Seq[(BufferedImage, Int)]): Array[Byte] = {
    require(framesRaw.nonEmpty, "encodeGif: no frames")
    val frames = framesRaw.map { case (img, delay) =>
      if (img.getType == BufferedImage.TYPE_INT_RGB) (img, delay)
      else {
        val rgb = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
        val g = rgb.createGraphics()
        try g.drawImage(img, 0, 0, null) finally g.dispose()
        (rgb, delay)
      }
    }
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for ((img, delayCs) <- frames) {
        val meta = writer.getDefaultImageMetadata(
          ImageTypeSpecifier.createFromRenderedImage(img), writer.getDefaultWriteParam)
        val root = meta.getAsTree(meta.getNativeMetadataFormatName).asInstanceOf[IIOMetadataNode]
        val gce = new IIOMetadataNode("GraphicControlExtension")
        gce.setAttribute("disposalMethod", "none")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("delayTime", delayCs.toString)
        gce.setAttribute("transparentColorIndex", "0")
        root.appendChild(gce)
        meta.setFromTree(meta.getNativeMetadataFormatName, root)
        writer.writeToSequence(new IIOImage(img, null, meta), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

  /** Deterministic animated test clip: `nFrames` solid-gradient frames
    * at `w`×`h` with a uniform per-frame delay — frame i's fill encodes
    * i so sampled frames are distinguishable. */
  def testAnimGif(w: Int, h: Int, nFrames: Int, delayCs: Int): Array[Byte] = {
    val frames = (0 until nFrames).map { i =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try {
        g.setColor(new java.awt.Color(40 * (i % 6) + 15, 32, 200 - 24 * (i % 8)))
        g.fillRect(0, 0, w, h)
      } finally g.dispose()
      (img, delayCs)
    }
    encodeGif(frames)
  }
}
