package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Luhn-validated card-number redaction
  * ([[graft.pipeline.PiiNorm.scrubCc]]) as a native codegen'd
  * expression: a regex alone cannot express the mod-10 checksum, and a
  * UDF would leave whole-stage codegen — this stays one static call per
  * row, returning the input by reference when nothing matches.
  */
final case class ScrubCreditCards(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_scrub_cc"

  override protected def nullSafeEval(input: Any): Any =
    graft.pipeline.PiiNorm.scrubCc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.pipeline.PiiNorm$$.MODULE$$.scrubCc($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): ScrubCreditCards =
    copy(child = newChild)
}
