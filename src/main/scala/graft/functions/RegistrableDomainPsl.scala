package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** host → registrable domain under the Public Suffix List
  * ([[graft.pipeline.Psl]]) — a native expression rather than a UDF or a
  * broadcast join: the rule sets are data every executor loads once (the
  * bundled classpath snapshot by default; a custom `rulesPath` swaps in
  * a newer full download, read lazily per JVM through the storage
  * layer), the lookup is O(labels) hash probes, and `doGenCode` emits a
  * static call so the op stays inside whole-stage codegen with zero
  * shuffle. NULL when the host is itself a public suffix or malformed
  * (callers filter or coalesce).
  */
final case class RegistrableDomainPsl(child: Expression,
    rulesPath: Option[String] = None) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_registrable_domain_psl"

  /** The rule file's version (mtime), stat'd ONCE per plan on the driver
    * and carried into the executors' (path, version) rule cache: an
    * overwritten rule file takes effect on the next query without a JVM
    * restart, while this plan stays pinned to the version it saw. A
    * STRICT val — a lazy one would only be forced on the codegen path
    * (doGenCode bakes it as a literal) and the interpreted-eval fallback
    * could serialize the expression unforced, letting each executor stat
    * the file itself and pin divergent versions mid-swap.
    */
  private val rulesVersion: Long =
    rulesPath.map(graft.pipeline.Psl.versionOf).getOrElse(0L)

  override protected def nullSafeEval(input: Any): Any = rulesPath match {
    case None => graft.pipeline.Psl.registrable(input.asInstanceOf[UTF8String])
    case Some(p) => graft.pipeline.Psl.registrable(
      input.asInstanceOf[UTF8String], UTF8String.fromString(p), rulesVersion)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    rulesPath match {
      case None =>
        nullSafeCodeGen(ctx, ev, c => s"""
          ${ev.value} = graft.pipeline.Psl$$.MODULE$$.registrable($c);
          ${ev.isNull} = ${ev.value} == null;""")
      case Some(p) =>
        val pathRef = ctx.addReferenceObj("pslPath",
          UTF8String.fromString(p), classOf[UTF8String].getName)
        val ver = s"${rulesVersion}L" // driver-side stat, baked as a literal
        nullSafeCodeGen(ctx, ev, c => s"""
          ${ev.value} = graft.pipeline.Psl$$.MODULE$$.registrable($c, $pathRef, $ver);
          ${ev.isNull} = ${ev.value} == null;""")
    }

  override protected def withNewChildInternal(newChild: Expression): RegistrableDomainPsl =
    copy(child = newChild)
}
