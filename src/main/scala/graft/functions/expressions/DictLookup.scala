package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hash-table dictionary probe as a native codegen'd expression: maps a
  * string key to its dense vocabulary id, null on miss (the left-join
  * convention).
  *
  * This is the engine's "apply a small side-input dictionary" primitive
  * (reference data.py:21-23 probes a driver-held python dict per cell).
  * A join-based encoding of W dictionary columns plans W broadcast
  * joins — W operators whose analysis cost grows with schema width and
  * which re-probe the same vocabulary relation per column. Here the
  * dictionary rides the expression itself: one O(1) probe per cell
  * inside whole-stage codegen, zero joins, zero shuffles, and the table
  * ships to executors once per stage with the task-binary broadcast.
  *
  * Sized for vocabularies that fit on the driver — the same class of
  * side input [[graft.car.Vocab.saveJson]] already collects by design.
  * A vocabulary beyond driver memory should use a distributed join
  * against the vocab frame instead.
  */
case class DictLookup(child: Expression,
    dict: java.util.HashMap[UTF8String, java.lang.Long])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dict_lookup needs a string key, got $t")
    }

  // null result on miss is the value itself being null — UnaryExpression
  // already short-circuits a null child
  override def nullSafeEval(input: Any): Any =
    dict.get(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("dict", dict, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_v = (java.lang.Long) $mapRef.get($c);
      if (${ev.value}_v == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_v.longValue();
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): DictLookup =
    copy(child = newChild)
}
