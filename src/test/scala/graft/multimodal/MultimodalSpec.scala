package graft.multimodal

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def media(n: Int, seed: Long = 9L): Seq[(Long, Array[Byte], String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val bytes = new Array[Byte](64 + rnd.nextInt(192))
      rnd.nextBytes(bytes)
      (i.toLong, bytes, if (i % 2 == 0) "image/png" else "video/mp4")
    }
  }

  test("extractMetadata: typed struct, deterministic, null-safe") {
    val rows = media(10)
    val df = (rows :+ ((99L, null.asInstanceOf[Array[Byte]], "image/png")))
      .toDF("id", "payload", "mime")
    val out = Multimodal.extractMetadata(df, "payload", "mime").orderBy("id")
    val schema = out.schema("media_meta").dataType
    assert(schema == Multimodal.MetaSchema)
    val metas = out.collect()
    assert(metas.length == 11)
    val first = metas.head.getAs[Row]("media_meta")
    assert(first.getAs[String]("mime") == "image/png")
    assert(first.getAs[Int]("width") >= 64 && first.getAs[Int]("height") >= 64)
    assert(metas.last.isNullAt(metas.last.fieldIndex("media_meta")))
    // deterministic (byte arrays excluded: Row.toString prints identities)
    val proj = Multimodal.extractMetadata(df, "payload", "mime")
      .select("id", "mime", "media_meta").orderBy("id")
    assert(proj.collect().toSeq == proj.collect().toSeq)
  }

  test("mediaFeatures: fixed dim, batch-size invariant, null → empty") {
    val df = (media(7) :+ ((99L, null.asInstanceOf[Array[Byte]], "image/png")))
      .toDF("id", "payload", "mime")
    val a = Multimodal.mediaFeatures(df, "payload", "mime", dim = 16, batchSize = 2)
      .select($"id", $"media_features").as[(Long, Seq[Float])].collect().toMap
    val b = Multimodal.mediaFeatures(df, "payload", "mime", dim = 16, batchSize = 32)
      .select($"id", $"media_features").as[(Long, Seq[Float])].collect().toMap
    assert(a == b)
    assert(a(0L).length == 16)
    assert(a(99L).isEmpty)
  }

  test("sampleFrames: explodes up to maxFrames, reassembles to the payload") {
    val rows = media(4)
    val df = rows.toDF("id", "payload", "mime")
    val frames = Multimodal.sampleFrames(df, "payload", "mime", maxFrames = 4)
    val byId = frames.select($"id", $"frame_idx", $"frame").as[(Long, Int, Array[Byte])]
      .collect().groupBy(_._1)
    rows.foreach { case (id, payload, _) =>
      val fs = byId(id).sortBy(_._2)
      assert(fs.length == 4)
      assert(fs.map(_._2).toSeq == Seq(0, 1, 2, 3)) // ordinal frame ids
      assert(fs.flatMap(_._3).toSeq == payload.toSeq) // frames reassemble
    }
  }

  test("resizeMedia: length scales with pixel ratio, clamped, null-safe, deterministic") {
    val rows = media(10)
    val df = (rows :+ ((99L, null.asInstanceOf[Array[Byte]], "image/png")))
      .toDF("id", "payload", "mime")
    val out = Multimodal.resizeMedia(df, "payload", "mime", 256, 256).orderBy("id").collect()
    assert(out.length == 11)
    rows.sortBy(_._1).zip(out.dropRight(1)).foreach { case ((_, bytes, mime), r) =>
      val resized = r.getAs[Array[Byte]]("resized")
      val meta = FakeDecoder.decode(bytes, mime)
      val expect = math.max(1L, math.min(bytes.length.toLong,
        (bytes.length * ((256L * 256).toDouble / (meta.width.toLong * meta.height))).toLong)).toInt
      assert(resized.length == expect)
      assert(resized.sameElements(bytes.take(expect))) // deterministic prefix
    }
    assert(out.last.isNullAt(out.last.fieldIndex("resized")))
  }

  test("mapPartitions plumbing preserves partitioning (no shuffle)") {
    val df = media(32).toDF("id", "payload", "mime").repartition(4)
    val out = Multimodal.mediaFeatures(df, "payload", "mime", dim = 8)
    assert(out.rdd.getNumPartitions == 4)
    // the only Exchange is the explicit input repartition — mediaFeatures
    // itself must not add one
    val exchanges = "Exchange".r.findAllIn(out.queryExecution.executedPlan.toString).length
    assert(exchanges == 1, s"expected only the input repartition Exchange, got $exchanges")
  }
}
