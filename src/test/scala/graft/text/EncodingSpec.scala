package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EncodingSpec extends SparkSpec {
  import spark.implicits._

  private def fnv(s: String): Long = {
    var h = 0xcbf29ce484222325L
    s.codePoints().forEach { cp => h ^= cp; h *= 0x100000001b3L }
    h
  }

  test("ids are FNV-1a of each token, floorMod dim, position-indexed") {
    val docs = Seq((7L, "Spark joins, spark WINDOWS")).toDF("doc_id", "text")
    val out = Encoding.featureHashIds(docs, "text", "doc_id", dim = 1 << 20)
      .orderBy("pos").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    // tokenizer lowercases and drops punctuation
    val expected = Seq("spark", "joins", "spark", "windows").zipWithIndex
      .map { case (t, i) => (i.toLong, java.lang.Math.floorMod(fnv(t), (1 << 20).toLong)) }
    assert(out.toSeq === expected)
    // same token, same id — position does not enter the hash
    assert(out(0)._2 === out(2)._2)
  }

  test("ids stay within [0, dim) for small dims (collision-bounded space)") {
    val docs = Seq((0L, "a b c d e f g h i j k l m n o p")).toDF("doc_id", "text")
    val out = Encoding.featureHashIds(docs, "text", "doc_id", dim = 7)
    assert(out.filter(col("token_id") < 0 || col("token_id") >= 7).isEmpty)
    assert(out.count() === 16)
  }
}
