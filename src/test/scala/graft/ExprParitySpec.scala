package graft

import org.apache.spark.sql.functions._

/** Codegen vs interpreted parity for the round's new native
  * expressions: whole-stage codegen runs the generated Java, while
  * `spark.sql.codegen.wholeStage=false` forces the interpreted `eval` —
  * both must produce identical results (the standard Expression
  * hardening check, applied to MatVecExpr and TokenCountExpr). */
class ExprParitySpec extends SparkSpec {

  import spark.implicits._

  private def withWholeStage[T](on: Boolean)(body: => T): T = {
    val key = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(key)
    spark.conf.set(key, on.toString)
    try body
    finally spark.conf.set(key, prev)
  }

  test("MatVecExpr: codegen == interpreted == reference rotation") {
    val rnd = new scala.util.Random(5)
    val r = Array.fill(8, 8)(rnd.nextGaussian())
    val df = (0L until 50L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("id", "v").repartition(3)
    def run(on: Boolean) = withWholeStage(on) {
      df.select($"id", graft.similarity.Opq.rotateCol($"v", r).as("y"))
        .orderBy("id").as[(Long, Seq[Float])].collect().toSeq
    }
    val gen = run(true)
    val interp = run(false)
    assert(gen == interp)
    // reference arithmetic: double accumulation in index order → float
    def rotRef(v: Seq[Float]): Seq[Float] =
      r.map(row => row.zip(v).map { case (a, x) => a * x.toDouble }.sum.toFloat).toSeq
    val vecs = df.orderBy("id").as[(Long, Seq[Float])].collect()
    vecs.zip(gen).foreach { case ((_, v), (_, y)) => assert(y == rotRef(v)) }
  }

  test("TokenCountExpr: codegen == interpreted == size(tokenize), nulls count 0") {
    val df = Seq(
      (1L, "spark window merge"), (2L, ""), (3L, null: String), (4L, "a b  c   d"))
      .toDF("id", "text").repartition(2)
    def run(on: Boolean) = withWholeStage(on) {
      df.select($"id", graft.text.Tokenize.tokenCount($"text").as("n"))
        .orderBy("id").as[(Long, Int)].collect().toSeq
    }
    val gen = run(true)
    val interp = run(false)
    assert(gen == interp)
    val viaSize = df
      .select($"id", size(graft.text.Tokenize.tokenize($"text")).as("n"))
      .orderBy("id").as[(Long, Int)].collect().toSeq
    assert(gen == viaSize)
    assert(gen.find(_._1 == 3L).map(_._2).contains(0))
  }
}
