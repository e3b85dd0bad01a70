package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScrubSpec extends SparkSpec {

  private def scrubOne(text: String): String = {
    import spark.implicits._
    Seq(text).toDF("text").select(Scrub.scrub(col("text")).as("s"))
      .head().getString(0)
  }

  test("urls are redacted through the next whitespace, schemes and www") {
    assert(scrubOne("see https://spark.apache.org/docs?q=1 now") == "see <URL> now")
    assert(scrubOne("see HTTP://X.COM/a,b now") == "see <URL> now")
    assert(scrubOne("see www.data.net/x#frag now") == "see <URL> now")
  }

  test("emails are redacted, including dots and plus tags") {
    assert(scrubOne("ping bob.smith+x@mail.example.co today") == "ping <EMAIL> today")
  }

  test("an address inside a url belongs to the url") {
    assert(scrubOne("x https://h.io/login?user=a@b.com y") == "x <URL> y")
  }

  test("control characters are stripped; tab and newline survive") {
    assert(scrubOne("a\u0000b\u0007c\u007fd") == "abcd")
    assert(scrubOne("a\tb\nc") == "a\tb\nc")
  }

  test("clean text and null pass through unchanged") {
    assert(scrubOne("plain words only here") == "plain words only here")
    import spark.implicits._
    val r = Seq(Option.empty[String]).toDF("text")
      .select(Scrub.scrub(col("text")).as("s")).head()
    assert(r.isNullAt(0))
  }

  test("pure elementwise projection — no shuffle, no UDF") {
    import spark.implicits._
    val plan = Seq("t").toDF("text").select(Scrub.scrub(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("ScalaUDF"), plan)
  }
}
