package graft.text

import graft.SparkSpec

class TokenFrequenciesSpec extends SparkSpec {

  import spark.implicits._

  test("tokenFrequenciesMap equals the distributed DataFrame path") {
    val df = Seq(
      "the quick brown fox",
      "the lazy dog",
      "",
      null.asInstanceOf[String]).toDF("text")
    val viaDf = TokenFrequencies
      .tokenFrequencies(df, "text")
      .as[(String, Long)]
      .collect()
      .toMap
    val viaMap = TokenFrequencies.tokenFrequenciesMap(df, "text")
    assert(viaMap == viaDf)
    assert(viaMap("the") == 2L && viaMap("fox") == 1L)
  }
}
