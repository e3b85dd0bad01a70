package graft.sql

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.col

import graft.text.{Fnv1aExpr, ShingleKeysExpr, TextAnalysis, TextFunctions, TokenizeExpr}

/** SQL surface for the engine: registers the text operators as session
  * functions so every elementwise capability is reachable from
  * `spark.sql("SELECT clean_text(text) ...")` — the "a reference user
  * can run every query they run today" contract extended to the SQL
  * entry point, not just the Column API.
  *
  * Mechanism: Catalyst-native `Expression` builders go straight into the
  * session `FunctionRegistry` (the lightweight end of the
  * `SparkSessionExtensions.injectFunction` ladder — same builder shape,
  * registerable on an ALREADY-BUILT session, which is what a notebook or
  * the driver harness has). Column-composition operators reuse their
  * existing implementations through the Column↔Expression bridge, so the
  * SQL name and the Scala API can never drift: they are one plan. */
object GraftFunctions {

  /** Wrap a Column→Column operator as a 1-arg SQL function builder: the
    * Column composition converts EAGERLY to a Catalyst tree (builtins as
    * `UnresolvedFunction`s the analyzer's fixpoint resolves) — see
    * `Bridge.resolvedExpression` for why the lazy wrapper won't do here. */
  private def columnFn(f: Column => Column): Seq[Expression] => Expression = {
    case Seq(e) =>
      org.apache.spark.sql.graft.Bridge.resolvedExpression(
        f(org.apache.spark.sql.graft.Bridge.column(e)))
    case other =>
      throw new IllegalArgumentException(s"expected 1 argument, got ${other.length}")
  }

  private def intLiteral(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an INT literal, got $other")
  }

  /** INT literals widen — SQL `42` parses as INT, `42L` as BIGINT. */
  private def longLiteral(e: Expression, what: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  /** All registrations, name → builder. */
  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "clean_text" -> columnFn(TextFunctions.cleanText),
    "word_count" -> columnFn(TextFunctions.wordCount),
    "char_count" -> columnFn(TextFunctions.charCount),
    "sentence_count" -> columnFn(TextFunctions.sentenceCount),
    "lang_id" -> columnFn(TextAnalysis.langId),
    "doc_fingerprint" -> columnFn(TextAnalysis.fingerprint),
    "fnv1a64" -> { exprs =>
      require(exprs.length == 1, s"fnv1a64(text): got ${exprs.length} args")
      Fnv1aExpr(exprs.head)
    },
    "tokenize_plain" -> { exprs =>
      require(exprs.length == 1, s"tokenize_plain(text): got ${exprs.length} args")
      TokenizeExpr(exprs.head, lowercase = true, removePunct = true)
    },
    "shingle_keys" -> { exprs =>
      require(exprs.length == 2, s"shingle_keys(text, k): got ${exprs.length} args")
      ShingleKeysExpr(exprs.head, intLiteral(exprs(1), "k"))
    },
    "simhash64" -> { exprs =>
      require(exprs.length == 1, s"simhash64(text): got ${exprs.length} args")
      graft.dedup.SimHashExpr(exprs.head)
    },
    "minhash_signature" -> { exprs =>
      require(exprs.length == 4,
        s"minhash_signature(text, numHashes, shingleSize, seed): got ${exprs.length} args")
      graft.dedup.MinHashExpr(exprs.head,
        intLiteral(exprs(1), "numHashes"),
        intLiteral(exprs(2), "shingleSize"),
        longLiteral(exprs(3), "seed"))
    },
    "lsh_band_hashes" -> { exprs =>
      require(exprs.length == 2, s"lsh_band_hashes(signature, bands): got ${exprs.length} args")
      graft.dedup.BandHashesExpr(exprs.head, intLiteral(exprs(1), "bands"))
    },
    "cosine_sim" -> { exprs =>
      require(exprs.length == 2, s"cosine_sim(a, b): got ${exprs.length} args")
      graft.similarity.CosineSimExpr(exprs.head, exprs(1))
    },
    "int_dot" -> { exprs =>
      require(exprs.length == 2, s"int_dot(a, b): got ${exprs.length} args")
      graft.similarity.IntDotExpr(exprs.head, exprs(1))
    })

  /** Idempotently register every function on `spark`'s session registry. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.sql.GraftFunctions", name),
        builder)
    }

  /** Idempotently install the graft optimizer rules on an ALREADY-BUILT
    * session via `experimental.extraOptimizations` (the post-build end of
    * the ladder [[GraftExtensions]] covers at session-build time). */
  def installOptimizerRule(spark: SparkSession): Unit = {
    val rules = Seq(TokenStringsRewrite, TokenCountRewrite)
    val cur = spark.experimental.extraOptimizations
    val missing = rules.filterNot(cur.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations = cur ++ missing
  }

  private[sql] def allBuilders: Seq[(String, Seq[Expression] => Expression)] = builders
}

/** The `spark.sql.extensions` entry point — the canonical production
  * deployment: `--conf spark.sql.extensions=graft.sql.GraftExtensions`
  * gives every session the graft SQL functions AND the optimizer
  * rewrites with no driver-side code. The same builders/rules as
  * [[GraftFunctions.register]]/[[GraftFunctions.installOptimizerRule]] —
  * one implementation, two registration ladders. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.allBuilders.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo("graft.sql.GraftFunctions", name),
          builder))
    }
    ext.injectOptimizerRule(_ => TokenStringsRewrite)
    ext.injectOptimizerRule(_ => TokenCountRewrite)
  }
}
