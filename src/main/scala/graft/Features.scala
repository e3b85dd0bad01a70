package graft

/** `compiled_features()` parity shim (reference
  * `/root/reference/src/lib.rs:38-61`, SURVEY §2.8): the reference gates
  * operator groups behind Cargo features and its Python wrappers raise
  * before registering an expression whose feature is absent. This build is
  * a single artifact, so every feature is always present — the shim exists
  * so callers porting feature-probe code keep working unchanged. */
object Features {

  /** The reference's feature names, all compiled in here. */
  val compiledFeatures: Set[String] =
    Set("full", "cache", "tokenization", "embedding", "topic-modeling")

  def isCompiled(feature: String): Boolean = compiledFeatures.contains(feature)
}
