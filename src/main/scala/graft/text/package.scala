package graft

import org.apache.spark.sql.Column

/** User-facing API surface mirroring the reference's `.text.*` expression
  * namespace (`/root/reference/polars_text/namespace.py:10-29`):
  *
  * {{{
  * import graft.text.implicits._
  * df.select($"text".text.cleanText, $"text".text.tokenize())
  * }}}
  */
package object text {
  object implicits {
    implicit class TextColumnOps(private val c: Column) extends AnyVal {
      def text: TextNamespace = new TextNamespace(c)
    }
  }

  final class TextNamespace(private val c: Column) extends AnyVal {
    def cleanText: Column = TextFunctions.cleanText(c)
    def wordCount: Column = TextFunctions.wordCount(c)
    def charCount: Column = TextFunctions.charCount(c)
    def sentenceCount: Column = TextFunctions.sentenceCount(c)
    def tokenize(
        model: String = TokenizerModels.PlainWordsEn,
        lowercase: Boolean = true,
        removePunct: Boolean = true): Column =
      Tokenize.tokenize(c, model, lowercase, removePunct)
    def concordance(
        searchWord: String,
        numLeftTokens: Int = 5,
        numRightTokens: Int = 5,
        regex: Boolean = false,
        caseSensitive: Boolean = false): Column =
      Concordance.concordanceCol(c, searchWord, numLeftTokens, numRightTokens, regex, caseSensitive)
    def embedding(modelId: String = graft.embed.EmbedderRegistry.DefaultModelId): Column =
      graft.embed.Embedders.embedding(c, modelId)
    def langId: Column = TextAnalysis.langId(c)
    def fingerprint: Column = TextAnalysis.fingerprint(c)
  }
}
