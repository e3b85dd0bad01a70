package graft.embed

/** Minimal reader for the published `safetensors` container format —
  * the standard Hugging Face weights layout (`model.safetensors`):
  *
  * {{{
  *   [u64 little-endian header length N]
  *   [N bytes of JSON: { tensor_name: {dtype, shape, data_offsets:[b,e]},
  *                       "__metadata__"?: {...} }]
  *   [raw little-endian tensor data, offsets relative to this section]
  * }}}
  *
  * Supports the dtypes a BERT/MiniLM checkpoint actually ships (F32;
  * F64 accepted for completeness) and fails fast with the tensor name
  * on anything else. Jackson rides on Spark's own classpath — no new
  * dependency (the [[graft.text.HfTokenizerJson]] posture). */
object SafeTensors {

  final case class Tensor(shape: Array[Int], data: Array[Float]) {
    def rows: Int = shape(0)
    def cols: Int = { require(shape.length == 2); shape(1) }
  }

  def load(path: String): Map[String, Tensor] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    require(bytes.length >= 8, s"$path: truncated safetensors (no header length)")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val headerLen = bb.getLong(0)
    require(headerLen > 0 && headerLen <= bytes.length - 8,
      s"$path: bad safetensors header length $headerLen")
    val json = new String(bytes, 8, headerLen.toInt, java.nio.charset.StandardCharsets.UTF_8)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val dataStart = 8 + headerLen.toInt
    val out = Map.newBuilder[String, Tensor]
    root.fields().forEachRemaining { e =>
      val name = e.getKey
      if (name != "__metadata__") {
        val node = e.getValue
        val dtype = node.path("dtype").asText("")
        val shapeNode = node.path("shape")
        require(shapeNode.isArray, s"$path: tensor '$name' has no shape array")
        val shape = (0 until shapeNode.size()).map(shapeNode.get(_).asInt()).toArray
        val offs = node.path("data_offsets")
        require(offs.isArray && offs.size() == 2, s"$path: tensor '$name' has no data_offsets")
        val begin = dataStart + offs.get(0).asLong()
        val end = dataStart + offs.get(1).asLong()
        require(end <= bytes.length, s"$path: tensor '$name' data_offsets past EOF")
        val n = shape.foldLeft(1L)(_ * _).toInt
        val data = new Array[Float](n)
        dtype match {
          case "F32" =>
            require(end - begin == n.toLong * 4, s"$path: tensor '$name' F32 size mismatch")
            val fb = java.nio.ByteBuffer.wrap(bytes, begin.toInt, (end - begin).toInt)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
            fb.get(data)
          case "F64" =>
            require(end - begin == n.toLong * 8, s"$path: tensor '$name' F64 size mismatch")
            val db = java.nio.ByteBuffer.wrap(bytes, begin.toInt, (end - begin).toInt)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).asDoubleBuffer()
            var i = 0
            while (i < n) { data(i) = db.get(i).toFloat; i += 1 }
          case other =>
            throw new IllegalArgumentException(
              s"$path: tensor '$name' has dtype '$other'; only F32/F64 load here")
        }
        out += name -> Tensor(shape, data)
      }
    }
    out.result()
  }

  /** Write tensors in the same format (F32) — the test-fixture path and
    * the round-trip counterpart of [[load]]. Deterministic layout:
    * tensors serialized in the given insertion order. */
  def write(path: String, tensors: Seq[(String, Tensor)]): Unit = {
    var off = 0L
    val entries = tensors.map { case (name, t) =>
      val begin = off
      off += t.data.length.toLong * 4
      (name, t, begin, off)
    }
    val header = entries.map { case (name, t, b, e) =>
      val shape = t.shape.mkString(",")
      s""""$name":{"dtype":"F32","shape":[$shape],"data_offsets":[$b,$e]}"""
    }.mkString("{", ",", "}")
    val hb = header.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = java.nio.ByteBuffer.allocate(8 + hb.length + off.toInt)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(hb.length.toLong).put(hb)
    entries.foreach { case (_, t, _, _) => t.data.foreach(bb.putFloat) }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bb.array())
    ()
  }
}
