package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("no false negatives vs the exact gram join") {
    val en = docs.filter(col("lang") === "en")
    val rest = docs.filter(col("lang") =!= "en")
    val bloom = BloomDecontaminate.fitBloom(en, "text", n = 3)
    val flagged = BloomDecontaminate.probe(rest, "text", "doc_id", bloom, n = 3)
      .filter(col("contaminated"))
      .select("doc_id").as[Long].collect().toSet
    // exact overlap in the same direction: rest docs sharing a 3-gram
    // with the en split (overlap() returns the TEST side's doc ids)
    val exact = Decontaminate.overlap(en, rest, "text", "doc_id", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(exact.nonEmpty, "fixture should produce genuine overlap")
    assert(exact.subsetOf(flagged), s"false negatives: ${(exact -- flagged).take(5)}")
  }

  test("false-positive rate is small at the shared config, zero false negatives") {
    val en = docs.filter(col("lang") === "en")
    val rest = docs.filter(col("lang") =!= "en")
    val bloom = BloomDecontaminate.fitBloom(en, "text", n = 3)
    val flagged = BloomDecontaminate.probe(rest, "text", "doc_id", bloom, n = 3)
    val exactDocs = Decontaminate.overlap(en, rest, "text", "doc_id", n = 3)
      .select("doc_id").as[Long].collect().toSet
    val fps = flagged.filter(col("contaminated"))
      .select("doc_id").as[Long].collect().toSet -- exactDocs
    // per-DOC FP inflation stays loose-bounded: a doc with hundreds of
    // grams compounds the ~1% per-gram rate, but the flagged set should
    // not explode past the true set
    assert(fps.size <= math.max(5, exactDocs.size), s"fp docs: ${fps.size} vs true ${exactDocs.size}")
  }

  test("deterministic across runs; short docs probe to zero grams") {
    val en = docs.filter(col("lang") === "en")
    val bloom1 = BloomDecontaminate.fitBloom(en, "text", n = 3)
    val bloom2 = BloomDecontaminate.fitBloom(en, "text", n = 3)
    assert(bloom1.toSeq === bloom2.toSeq)
    val tiny = Seq((1L, "hi"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = BloomDecontaminate.probe(tiny, "text", "doc_id", bloom1, n = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(0L, 0L))
    assert(out.forall(!_.getBoolean(3)))
  }

  test("config validation fails fast") {
    val en = docs.filter(col("lang") === "en").limit(5)
    intercept[IllegalArgumentException] {
      BloomDecontaminate.fitBloom(en, "text", mBits = 1000) // not a power of two
    }
    val bloom = BloomDecontaminate.fitBloom(en, "text", mBits = 1 << 10)
    intercept[IllegalArgumentException] {
      BloomDecontaminate.probe(en, "text", "doc_id", bloom, mBits = 1 << 16)
    }
  }

  test("broadcast path flags identically to the literal path, bit for bit") {
    // a 2^21-bit set is above LiteralMaxBits → broadcast + BloomFlaggedExpr;
    // forcing literalMaxBits high runs the same config through the literal
    // Column algebra. The two must agree on every row.
    val en = docs.filter(col("lang") === "en")
    val rest = docs.filter(col("lang") =!= "en")
    val m = 1 << 21
    val bloom = BloomDecontaminate.fitBloom(en, "text", n = 3, mBits = m)
    val viaBroadcast = BloomDecontaminate
      .probe(rest, "text", "doc_id", bloom, n = 3, mBits = m)
      .orderBy("doc_id").collect().toSeq
    val viaLiteral = BloomDecontaminate
      .probe(rest, "text", "doc_id", bloom, n = 3, mBits = m, literalMaxBits = m)
      .orderBy("doc_id").collect().toSeq
    assert(viaBroadcast === viaLiteral)
    assert(viaBroadcast.exists(_.getBoolean(3)), "fixture should flag something")
  }

  test("large-m probe plan carries no bitset literal and stays scan-speed") {
    val en = docs.filter(col("lang") === "en")
    val m = 1 << 21
    val bloom = BloomDecontaminate.fitBloom(en, "text", n = 3, mBits = m)
    val probe = BloomDecontaminate
      .probe(docs.filter(col("lang") =!= "en"), "text", "doc_id", bloom, n = 3, mBits = m)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_flagged"), plan)
    // the literal path's signature pieces must be absent: no getbit over
    // an element_at into a plan-embedded array
    assert(!plan.contains("getbit"), plan)
    assert(!plan.contains("Join") && !plan.contains("Exchange") && !plan.contains("ScalaUDF"), plan)
    assert("FileScan parquet".r.findAllIn(plan).length === 1, plan)
  }

  test("probe plan is scan-speed: no join, no shuffle, no UDF") {
    val en = docs.filter(col("lang") === "en")
    val bloom = BloomDecontaminate.fitBloom(en, "text", n = 3)
    val plan = BloomDecontaminate
      .probe(docs.filter(col("lang") =!= "en"), "text", "doc_id", bloom, n = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    assert("FileScan parquet".r.findAllIn(plan).length === 1, plan)
  }
}
