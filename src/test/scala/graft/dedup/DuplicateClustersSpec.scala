package graft.dedup

import graft.SparkSpec

class DuplicateClustersSpec extends SparkSpec {

  private def clustersOf(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    Dedup.duplicateClusters(pairs.toDF("id_a", "id_b"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  test("non-transitive pairs merge into one component; disjoint groups stay apart") {
    // 1≈2 and 2≈3 without 1≈3 — the reason clustering exists at all
    val c = clustersOf(Seq((1L, 2L), (2L, 3L), (5L, 6L)))
    assert(c(1L) == (1L, 3L) && c(2L) == (1L, 3L) && c(3L) == (1L, 3L))
    assert(c(5L) == (5L, 2L) && c(6L) == (5L, 2L))
  }

  test("labels propagate across a path longer than one round") {
    // 10-9-8-7: the min label (7) needs 3 rounds to reach vertex 10
    val c = clustersOf(Seq((9L, 10L), (8L, 9L), (7L, 8L)))
    assert(Set(7L, 8L, 9L, 10L).forall(c(_) == (7L, 4L)))
  }

  test("reversed/duplicated edges are harmless") {
    val c = clustersOf(Seq((2L, 1L), (1L, 2L), (2L, 3L)))
    assert(Set(1L, 2L, 3L).forall(c(_) == (1L, 3L)))
  }

  test("non-convergence throws instead of returning a partial clustering") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Dedup.duplicateClusters(
        Seq((7L, 8L), (8L, 9L), (9L, 10L)).toDF("id_a", "id_b"),
        maxIterations = 1)
    }
  }
}
