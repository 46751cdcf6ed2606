package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Canonical composition is the first step of any multilingual corpus
  * pipeline: the same user-visible text arrives both precomposed
  * ("é" U+00E9) and decomposed ("e"+U+0301) across sources, and every
  * downstream equality — exact dedup hashes, shingle joins, vocabulary
  * grouping — silently treats them as different documents unless the
  * text is normalized first. Spark ships no normalize function; this is
  * the JDK's `java.text.Normalizer` (public, ICU-free) wrapped with a
  * quick-check fast path so the common already-NFC case costs one scan
  * and zero allocations.
  *
  * NFC (not NFKC) on purpose: canonical composition is lossless and
  * round-trips display-identical text; compatibility folding (fullwidth
  * forms, ligatures) is a lossy editorial choice a pipeline should opt
  * into separately.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize needs string, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static entry shared by interpreted eval and generated code. The
    * isNormalized quick-check returns MAYBE only near combining marks,
    * so ASCII-heavy corpora skip the allocation entirely.
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
