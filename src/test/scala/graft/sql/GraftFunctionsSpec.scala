package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("SQL names resolve to the Column-API plans (one implementation)") {
    val docs = Seq((0L, "The Quick, brown fox! 42"), (1L, ""), (2L, "vive la France"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("gf_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, clean_text(text) AS cleaned, word_count(text) AS wc,
           lang_id(text) AS pl FROM gf_docs ORDER BY doc_id""").collect()
    val viaApi = docs.select(
        col("doc_id"),
        graft.text.TextFunctions.cleanText(col("text")).as("cleaned"),
        graft.text.TextFunctions.wordCount(col("text")).as("wc"),
        graft.text.TextAnalysis.langId(col("text")).as("pl"))
      .orderBy("doc_id").collect()
    assert(viaSql.toSeq == viaApi.toSeq)
  }

  test("tokenize_plain and shingle_keys are SQL-callable with literal args") {
    val r = spark.sql(
      "SELECT tokenize_plain('a b c d')[0].token AS t0, size(shingle_keys('a b c d', 2)) AS nk")
      .head()
    assert(r.getString(0) == "a" && r.getInt(1) == 3)
  }

  test("fingerprint expressions are SQL-callable and equal the Scala API") {
    val docs = Seq((0L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("gf_fp")
    val viaSql = spark.sql(
      """SELECT simhash64(text) AS fp,
           minhash_signature(text, 32, 3, 42) AS sig FROM gf_fp""").head()
    val viaApi = graft.dedup.Dedup.simHashes(docs, "text", "doc_id").head().getLong(1)
    val sigApi = graft.dedup.Dedup
      .minHashSignatures(docs, "text", "doc_id", numHashes = 32, shingleSize = 3, seed = 42L)
      .head().getSeq[Long](1)
    assert(viaSql.getLong(0) === viaApi)
    assert(viaSql.getSeq[Long](1) === sigApi)
  }

  test("similarity expressions are SQL-callable and equal the Scala API") {
    val r = spark.sql(
      """SELECT round(cosine_sim(array(3.0F, 4.0F), array(3.0F, 4.0F)), 9) AS cs,
           cosine_sim(array(0.0F, 0.0F), array(1.0F, 1.0F)) AS zn,
           int_dot(array(1, 2, 3), array(4, 5, 6)) AS d,
           lsh_band_hashes(minhash_signature('a b c d e f g', 8, 2, 42), 4) AS bands""")
      .head()
    assert(r.getDouble(0) == 1.0)
    assert(r.isNullAt(1)) // zero norm → null, the Column-API contract
    assert(r.getLong(2) == 32L)
    assert(r.getSeq[org.apache.spark.sql.Row](3).length == 4)
  }

  test("registration is idempotent and arity is checked") {
    GraftFunctions.register(spark) // second call must not throw
    val e = intercept[Exception] {
      spark.sql("SELECT clean_text('a', 'b')").collect()
    }
    assert(e.getMessage.contains("1 argument") || e.getMessage.contains("clean_text"))
  }
}
