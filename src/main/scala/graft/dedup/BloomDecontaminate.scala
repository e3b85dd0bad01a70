package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Bloom-filter decontamination — the scan-speed alternative to the exact
  * gram-join [[Decontaminate]] (beyond-reference curation operator; the
  * GPT-3-style eval/train n-gram screen re-shaped for the case where even
  * the distinct-gram join is the bottleneck).
  *
  * At 100 TB the exact overlap pays one gram-keyed exchange over the
  * training corpus. This operator removes that exchange entirely: the
  * eval split's n-gram keys fit into an m-bit Bloom set (ONE bounded
  * aggregation — ≤ m/64 longs to the driver), and the training scan
  * probes it elementwise — no join, no shuffle, no UDF; the whole probe
  * is codegen'd Column algebra over the fused [[graft.text.ShingleKeysExpr]]
  * stream and the bitset LITERAL. False positives occur at the standard
  * Bloom rate ((fill)^k) and are DETERMINISTIC: positions are seeded FNV
  * hashes of the gram key's decimal string, so the oracle re-derives the
  * exact flag set, false positives included. No false negatives ever —
  * every true overlap is flagged (spec-pinned against the exact join).
  *
  * Config contract: `mBits` a power of two (the position modulus must
  * divide 2^64 so signed/unsigned folds agree across engines, the
  * q_encode_ids argument), sized so eval-gram fill stays well under 1
  * (fill 0.2 and k = 3 give ~1% FP — tune m to the eval split, not the
  * training corpus: only the SMALL side is stored).
  */
object BloomDecontaminate {

  /** Position j of a gram key: FNV-1a of `"j:" + key` mod `mBits` — both
    * factors already oracle-recomputable (fnvSql + the power-of-two
    * modulus argument). */
  private def position(key: Column, j: Int, mBits: Int): Column =
    pmod(TextAnalysis.fnv1a64(concat(lit(s"$j:"), key.cast("string"))), lit(mBits.toLong))

  /** Fit: the m-bit Bloom set of the eval split's n-gram keys as
    * `Array[Long]` (LSB-first within each word). One scan, one bounded
    * aggregation: bit masks combine map-side via `bit_or`, and the driver
    * receives at most `mBits/64` rows. */
  def fitBloom(
      eval: DataFrame,
      textCol: String,
      n: Int = 3,
      mBits: Int = 1 << 16,
      numHashes: Int = 3): Array[Long] = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 64, got $mBits")
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    val keys = eval.select(explode(TextAnalysis.shingleKeys(col(textCol), n)).as("key"))
    val posCols = (0 until numHashes).map(j => position(col("key"), j, mBits))
    val words = keys
      .select(explode(array(posCols: _*)).as("pos"))
      .select(
        (col("pos") / lit(64L)).cast("int").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("m"))
      .groupBy("w")
      .agg(expr("bit_or(m)").as("bits"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Largest bitset carried as a plan literal: 2^20 bits = 128 KiB of
    * words. Above this the bitset rides a broadcast variable consumed by
    * the native [[BloomFlaggedExpr]] — identical flags, no giant literal
    * serialized into every task's plan (and through codegen). */
  val LiteralMaxBits: Int = 1 << 20

  /** Probe: `(id, n_grams, n_flagged, contaminated)` per training
    * document — elementwise, zero exchanges, at scan speed in both
    * regimes. Small bitsets (≤ `literalMaxBits`) are pure Column algebra
    * over a single array literal and the native `getbit`; large bitsets
    * are broadcast once per executor and probed by the codegen'd
    * [[BloomFlaggedExpr]] with bit-identical hash positions. */
  def probe(
      df: DataFrame,
      textCol: String,
      idCol: String,
      bloom: Array[Long],
      n: Int = 3,
      mBits: Int = 1 << 16,
      numHashes: Int = 3,
      literalMaxBits: Int = LiteralMaxBits): DataFrame = {
    require(bloom.length == mBits / 64,
      s"bloom has ${bloom.length} words, expected ${mBits / 64} for mBits=$mBits")
    val keyed = df.select(col(idCol), TextAnalysis.shingleKeys(col(textCol), n).as("__keys"))
    val flagged: Column =
      if (mBits <= literalMaxBits) {
        val bloomLit = typedLit(bloom.toSeq)
        def hit(key: Column): Column =
          (0 until numHashes)
            .map { j =>
              val pos = position(key, j, mBits)
              call_function("getbit",
                element_at(bloomLit, (pos / lit(64L)).cast("int") + lit(1)),
                (pos % lit(64L)).cast("int")) === lit(1)
            }
            .reduce(_ && _)
        size(filter(col("__keys"), hit _)).cast("long")
      } else {
        val bc = df.sparkSession.sparkContext.broadcast(bloom)
        org.apache.spark.sql.graft.Bridge.column(
          BloomFlaggedExpr(
            org.apache.spark.sql.graft.Bridge.expression(col("__keys")), bc, mBits, numHashes))
      }
    keyed
      .select(
        col(idCol),
        size(col("__keys")).cast("long").as("n_grams"),
        flagged.as("n_flagged"))
      .withColumn("contaminated", col("n_flagged") > 0)
  }
}
