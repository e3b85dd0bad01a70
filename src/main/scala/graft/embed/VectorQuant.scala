package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization — the storage/serving layout
  * large vector corpora actually persist (4× smaller than float32, and
  * int8 dot products are the SIMD fast path in every ANN runtime):
  * `scale = max|x| / 127`, `q_i = round(x_i / scale)` clamped to ±127,
  * zero vectors quantize to all-zero with scale 0.
  *
  * Scale design (100 TB): pure elementwise Column program over the
  * vector array — one scan, zero shuffle, no UDF; every step (`/`, `*`,
  * `abs`, `round` half-away-from-zero) is identically defined in Spark
  * and DuckDB on doubles, so the full quantization is exactly
  * recomputable by the SQL oracle (float→double widening is exact).
  * Reconstruction error is bounded by `scale/2` per component — the spec
  * pins the dequantized cosine against the exact one. */
object VectorQuant {

  /** `(id, scale, qvec[, keep...])` — the per-vector scale (double) and
    * the int8 codes as `array<int>` (Spark has no int8 array; the codes
    * are all in [−127, 127], the storage layer narrows them). `keep`
    * columns ride along unchanged, so a caller can quantize a frame that
    * already carries routing metadata (an IVF cell id) without a join
    * back — the whole program stays one elementwise scan. */
  def quantizeInt8(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      keep: Seq[Column] = Nil): DataFrame = {
    // one fused codegen'd loop per vector ([[QuantizeInt8Expr]]) — the
    // HOF Column program this replaces ran CodegenFallback-interpreted
    // on every corpus row of the serving scans; field values identical
    // (spec- and oracle-pinned). Codegen subexpression elimination
    // collapses the two field reads to one evaluation.
    val q = org.apache.spark.sql.graft.Bridge.column(
      QuantizeInt8Expr(org.apache.spark.sql.graft.Bridge.expression(col(vecCol))))
    df.select(
      Seq(
        col(idCol),
        q.getField("scale").as("scale"),
        q.getField("qvec").as("qvec")) ++ keep: _*)
  }

  /** Dequantize back to doubles: `x̂_i = q_i · scale`. */
  def dequantize(df: DataFrame, qvecCol: String = "qvec", scaleCol: String = "scale") =
    df.withColumn("xhat",
      transform(col(qvecCol), q => q.cast("double") * col(scaleCol)))
}
