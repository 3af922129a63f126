package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** host → registrable domain under the bundled Public Suffix List
  * ([[graft.pipeline.Psl]]) — a native expression rather than a UDF or a
  * broadcast join: the rule sets are classpath data every executor
  * already has, the lookup is O(labels) hash probes, and `doGenCode`
  * emits a static call so the op stays inside whole-stage codegen with
  * zero shuffle. NULL when the host is itself a public suffix or
  * malformed (callers filter or coalesce).
  */
final case class RegistrableDomainPsl(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_registrable_domain_psl"

  override protected def nullSafeEval(input: Any): Any =
    graft.pipeline.Psl.registrable(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.pipeline.Psl$$.MODULE$$.registrable($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): RegistrableDomainPsl =
    copy(child = newChild)
}
