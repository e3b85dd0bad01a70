package graft.embed

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed vector aggregation: dimension-wise centroids per group —
  * the embedding-analytics verb behind per-cluster/per-language profiling,
  * IVF coarse-quantizer refresh, and drift monitoring over an embedding
  * column.
  *
  * Scale design (100 TB): a typed [[Aggregator]] keeps the aggregation in
  * Spark's hash-aggregate machinery with '''map-side partial
  * aggregation''' — each task folds its vectors into ONE `(sums, count)`
  * buffer per group, and only those dim-length buffers cross the wire
  * (one per task per group), never the vectors. The obvious alternative —
  * `posexplode` → `groupBy(key, dim)` — shuffles `rows × dims` records;
  * `collect_list` per group holds every vector in executor memory. Both
  * lose by orders of magnitude at corpus scale.
  *
  * Mixed or empty inputs: null/empty vectors contribute nothing; groups
  * with only empty vectors yield an empty centroid. Ragged dimensions are
  * rejected (fail fast — silently truncating would corrupt the mean).
  */
object VectorAgg {

  /** Aggregation buffer: running per-dimension sums + vector count. */
  final case class CentroidBuf(sums: Array[Double], n: Long)

  /** Mean vector per group. Buffer arithmetic is in Double — Float
    * accumulation loses ~half the mantissa by a few million rows. */
  final class CentroidAggregator extends Aggregator[Seq[Float], CentroidBuf, Seq[Double]] {
    override def zero: CentroidBuf = CentroidBuf(Array.emptyDoubleArray, 0L)

    private def add(buf: CentroidBuf, sums: Array[Double], n: Long): CentroidBuf = {
      if (sums.isEmpty) buf
      else if (buf.sums.isEmpty) CentroidBuf(sums, n)
      else {
        require(buf.sums.length == sums.length,
          s"ragged vector dimensions: ${buf.sums.length} vs ${sums.length}")
        val out = buf.sums.clone()
        var i = 0
        while (i < out.length) { out(i) += sums(i); i += 1 }
        CentroidBuf(out, buf.n + n)
      }
    }

    override def reduce(buf: CentroidBuf, v: Seq[Float]): CentroidBuf =
      if (v == null || v.isEmpty) buf
      else add(buf, v.iterator.map(_.toDouble).toArray, 1L)

    override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf =
      add(a, b.sums, b.n)

    override def finish(buf: CentroidBuf): Seq[Double] =
      if (buf.n == 0L) Seq.empty
      else buf.sums.iterator.map(_ / buf.n).toSeq

    override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** The centroid aggregate as a Column, for use inside any `groupBy`. */
  def centroid(vec: Column): Column = udaf(new CentroidAggregator).apply(vec)

  /** Per-group mean vectors: `(keyCol, centroid: Array[Double])`. */
  def centroids(df: DataFrame, vecCol: String, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(centroid(col(vecCol)).as("centroid"))
}
