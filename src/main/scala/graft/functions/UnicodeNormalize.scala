package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical/compatibility normalization (`java.text.Normalizer`
  * NFC/NFD/NFKC/NFKD) as a native codegen'd expression — the
  * pre-tokenization pass that folds full-width forms (`Ａ１`→`A1`),
  * ligatures (`ﬁ`→`fi`) and combining sequences (`e`+U+0301→`é`) to one
  * spelling before counting, hashing or dedup. A UDF would leave
  * whole-stage codegen; this stays one static call per row, with an
  * is-normalized fast path that returns ASCII/already-normal strings by
  * reference.
  */
final case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  UnicodeNormalize.formOf(form) // validate at construction, not per row

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_unicode_normalize"

  // resolved once at plan time; serialized with the expression so neither
  // eval path re-parses the form string per row
  @transient private lazy val resolvedForm: java.text.Normalizer.Form =
    UnicodeNormalize.formOf(form)

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], resolvedForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the referenced object is the resolved java.text.Normalizer.Form enum
    // constant, not the form STRING — the generated code calls straight
    // into the enum-typed hot path with zero per-row string matching
    val formRef = ctx.addReferenceObj("nfForm", resolvedForm,
      "java.text.Normalizer.Form")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UnicodeNormalize$$.MODULE$$.normalize($c, $formRef);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {

  def formOf(form: String): java.text.Normalizer.Form = form.toUpperCase match {
    case "NFC" => java.text.Normalizer.Form.NFC
    case "NFD" => java.text.Normalizer.Form.NFD
    case "NFKC" => java.text.Normalizer.Form.NFKC
    case "NFKD" => java.text.Normalizer.Form.NFKD
    case other => throw new IllegalArgumentException(
      s"unknown normalization form '$other' (NFC|NFD|NFKC|NFKD)")
  }

  /** Codegen hot path: already-normalized input (all ASCII trivially is)
    * returns by reference without allocating. Takes the RESOLVED form —
    * the expression bakes the enum constant into its generated code.
    */
  def normalize(s: UTF8String, f: java.text.Normalizer.Form): UTF8String = {
    if (s == null) return null
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  /** String-form convenience for non-expression callers. */
  def normalize(s: UTF8String, form: String): UTF8String =
    if (s == null) null else normalize(s, formOf(form))
}
