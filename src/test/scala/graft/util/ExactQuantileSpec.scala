package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExactQuantileSpec extends SparkSpec {
  import spark.implicits._

  /** Reference semantics: percentile_disc = the row at rank ceil(q·n) of
    * the ascending sort (DuckDB quantile_disc, probed empirically). */
  private def disc(vals: Seq[Double], q: Double): Double =
    vals.sorted.apply(math.ceil(q * vals.length).toInt - 1)

  test("matches percentile_disc rank selection across sizes and q") {
    for (n <- Seq(1, 5, 7, 10, 253); q <- Seq(0.1, 0.5, 0.9, 1.0)) {
      val vals = (1 to n).map(i => i * 1.37)
      val df = vals.toDF("v").repartition(4)
      assert(ExactQuantile.quantileDisc(df, "v", q) === disc(vals, q),
        s"n=$n q=$q")
    }
  }

  test("duplicate-heavy values select the same row as the sorted rank") {
    val vals = Seq(1.0, 1.0, 1.0, 2.5, 2.5, 7.0, 7.0, 7.0, 7.0, 9.0)
    val df = vals.toDF("v").repartition(3)
    for (q <- Seq(0.2, 0.5, 0.8, 0.9))
      assert(ExactQuantile.quantileDisc(df, "v", q) === disc(vals, q))
  }

  test("nulls are ignored; all-null or empty input fails fast") {
    val df = Seq[Option[Double]](Some(3.0), None, Some(1.0), None, Some(2.0))
      .toDF("v")
    assert(ExactQuantile.quantileDisc(df, "v", 0.5) === 2.0)
    val empty = Seq.empty[Option[Double]].toDF("v")
    intercept[IllegalArgumentException] {
      ExactQuantile.quantileDisc(empty, "v", 0.5)
    }
    intercept[IllegalArgumentException] {
      ExactQuantile.quantileDisc(df, "v", 0.0)
    }
  }

  test("selection leaves no persisted RDDs or CacheManager entries behind") {
    val df = (1 to 100).map(_.toDouble).toDF("v").repartition(5)
    ExactQuantile.quantileDisc(df, "v", 0.9)
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("agrees with DuckDB quantile_disc on the sf0.001 curation scores") {
    // End-to-end against the real scored frame shape: integer-free
    // continuous doubles, many partitions.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val scored = graft.text.LanguageModel
      .unigramCrossEntropy(docs, "text", "doc_id")
    val vals = scored.select(col("bits_per_token")).as[Double].collect().toSeq
    val got = ExactQuantile.quantileDisc(scored, "bits_per_token", 0.9)
    assert(got === disc(vals, 0.9))
  }
}
