package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass token statistics over a space-delimited text:
  * `struct(n_tokens, n_stop, n_vowels)` — the three numbers the
  * document-prep quality gate and the vowel-ratio language heuristic
  * consume.
  *
  * Semantics match the declarative formulation exactly, so the SQL
  * oracle replays unchanged:
  *   - `n_tokens` ≡ `size(split(text, ' '))` ≡ the row count of
  *     `unnest(string_split(text, ' '))`: segments BETWEEN single
  *     spaces, so consecutive spaces contribute empty tokens and the
  *     count is always `#spaces + 1`.
  *   - `n_stop`   ≡ the count of segments byte-equal to one of the
  *     `stopwords`.
  *   - `n_vowels` ≡ `length(text) − length(regexp_replace(text,
  *     '[aeiou]', ''))`: occurrences of the five ASCII vowels as code
  *     points. Byte counting is exact in UTF-8 (continuation bytes have
  *     the high bit set, so an ASCII byte is always a whole code point).
  *
  * Why an expression instead of `split`/`filter`/`regexp_replace`: the
  * functions form allocates the token array per row, routes the
  * stopword test through an interpreted HigherOrderFunction (which
  * splits the whole-stage-codegen span), and scans the text twice more
  * for the vowel regex. This is one branch-free byte scan with zero
  * allocation — on a 100 TB corpus the per-row constant IS the job —
  * and it collapses the plan's generated-code volume (the r18 bench
  * flagged `pipeline_docs`' first-run codegen+JIT cost; see SCALE.md).
  */
case class SpaceTokenStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(stopwords.nonEmpty, "need at least one stopword")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_vowels", LongType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"space_token_stats needs a string, got $t")
    }

  // stopword byte images, precomputed once per expression instance
  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var nTokens = 1L
    var nStop = 0L
    var nVowels = 0L
    var segStart = 0
    var i = 0
    while (i <= bytes.length) {
      val atEnd = i == bytes.length
      val b = if (atEnd) ' '.toByte else bytes(i)
      if (b == ' ') {
        if (isStop(bytes, segStart, i - segStart)) nStop += 1
        if (!atEnd) nTokens += 1
        segStart = i + 1
      } else if (b == 'a' || b == 'e' || b == 'i' || b == 'o' || b == 'u') {
        nVowels += 1
      }
      i += 1
    }
    InternalRow(nTokens, nStop, nVowels)
  }

  private def isStop(bytes: Array[Byte], off: Int, len: Int): Boolean = {
    var s = 0
    while (s < stopBytes.length) {
      val sw = stopBytes(s)
      if (sw.length == len) {
        var j = 0
        while (j < len && bytes(off + j) == sw(j)) j += 1
        if (j == len) return true
      }
      s += 1
    }
    false
  }

  override protected def withNewChildInternal(newChild: Expression): SpaceTokenStats =
    copy(child = newChild)
}
