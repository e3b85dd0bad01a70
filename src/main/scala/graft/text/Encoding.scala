package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary-free document encoding for model training (beyond-reference
  * pipeline operator): token → integer id by FEATURE HASHING (Weinberger
  * et al. 2009, "Feature Hashing for Large Scale Multitask Learning") —
  * `id = hash(token) mod dim`.
  *
  * Scale design (100 TB): a frozen-vocabulary encode needs a global
  * vocabulary build (corpus-wide distinct + an ordering to assign dense
  * ids — a driver-scale artifact that must then broadcast to every
  * executor and be versioned between runs). The hashing trick removes
  * that coordination point entirely: the encode is a pure elementwise
  * Column program — one scan, ZERO shuffle, nothing broadcast, bitwise
  * reproducible across runs and engines — at the cost of a collision
  * rate bounded by vocab/dim. The hash is the engine's oracle-checkable
  * FNV-1a 64 ([[TextAnalysis.fnv1a64]], codegen'd — buckets need the
  * avalanche the polynomial 31-hash lacks), so the whole encode is
  * independently re-derivable in SQL.
  */
object Encoding {

  /** `(id, pos, token_id)` rows: position-indexed hashed token ids per
    * document. `dim` is the hashed id space (power of two keeps the mod
    * cheap; collisions are the documented trade-off). */
  def featureHashIds(
      df: DataFrame,
      textCol: String,
      idCol: String,
      dim: Int = 1 << 20,
      model: String = TokenizerModels.PlainWordsEn): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    df.select(
        col(idCol),
        posexplode(Tokenize.tokenize(col(textCol), model)).as(Seq("pos", "t")))
      .select(
        col(idCol),
        col("pos").cast("long").as("pos"),
        pmod(TextAnalysis.fnv1a64(col("t.token")), lit(dim.toLong)).as("token_id"))
  }
}
