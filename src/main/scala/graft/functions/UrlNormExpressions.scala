package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** host → lowercase punycode/ASCII form (RFC 3490 ToASCII through the
  * JDK's `java.net.IDN`, see [[graft.pipeline.UrlNorm.idnAscii]]) — a
  * native expression so internationalized-host mapping stays inside
  * whole-stage codegen; the common all-ASCII host short-circuits without
  * allocating.
  */
final case class IdnAscii(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_idn_ascii"

  override protected def nullSafeEval(input: Any): Any =
    graft.pipeline.UrlNorm.idnAscii(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.pipeline.UrlNorm$$.MODULE$$.idnAscii($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): IdnAscii =
    copy(child = newChild)
}

/** RFC 3986 §6.2.2 percent-encoding normalization (uppercase escape hex,
  * decode unreserved escapes — [[graft.pipeline.UrlNorm.percentNormalize]])
  * as a native codegen'd expression; escape-free strings pass through
  * by reference.
  */
final case class PercentNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_percent_normalize"

  override protected def nullSafeEval(input: Any): Any =
    graft.pipeline.UrlNorm.percentNormalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.pipeline.UrlNorm$$.MODULE$$.percentNormalize($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): PercentNormalize =
    copy(child = newChild)
}
