package graft

import org.scalatest.funsuite.AnyFunSuite

class FeaturesSpec extends AnyFunSuite {
  test("all reference features report compiled (single-artifact build)") {
    assert(Features.compiledFeatures ==
      Set("full", "cache", "tokenization", "embedding", "topic-modeling"))
    assert(Features.isCompiled("embedding") && !Features.isCompiled("nope"))
  }
}
