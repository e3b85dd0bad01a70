package graft.text

import graft.SparkSpec

class CorpusProfileSpec extends SparkSpec {

  test("hand-checked profile") {
    import spark.implicits._
    val df = Seq(
      ("en", "a b c"),
      ("en", "a a"),
      ("de", ""))
      .toDF("lang", "text")
    val r = CorpusProfile.profile(df, "text", langCol = Some("lang")).head()
    assert(r.getLong(0) == 3L) // n_docs counts the empty doc too
    assert(r.getLong(1) == 5L)
    assert(math.abs(r.getDouble(2) - 5.0 / 3) < 1e-12)
    assert(r.getLong(3) == 3L) // vocab {a, b, c}
    assert(r.getLong(4) == 2L)
  }

  test("empty corpus yields a defined all-zero row; langCol is optional") {
    import spark.implicits._
    val r = CorpusProfile.profile(
      Seq.empty[(String, String)].toDF("lang", "text"), "text").head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L)
    assert(r.getDouble(2) == 0.0)
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L)
  }
}
