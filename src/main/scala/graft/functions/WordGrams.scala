package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams of normalized text as a native expression — the
  * shared shingle primitive behind n-gram dedup verification and
  * benchmark decontamination.
  *
  * The declarative formulation (`transform(sequence(...), i =>
  * concat_ws(" ", slice(toks, i+1, n)))` + `array_distinct`) evaluates
  * interpreted per element and copies a token sub-array per gram —
  * O(tokens × n) allocations per document outside codegen. This is one
  * tight JVM pass (same tokenization as [[MinHashSig]], whose oracle
  * parity pins the semantics): lowercase, whitespace-split, sliding
  * windows joined with single spaces, first-occurrence distinct. Texts
  * shorter than `n` words collapse to one whole-text gram.
  */
final case class WordGrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_grams"

  override protected def nullSafeEval(input: Any): Any =
    WordGrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordGrams$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

object WordGrams {
  def compute(input: UTF8String, n: Int): ArrayData = {
    val toks = input.toString.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (toks.length >= n) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    } else {
      out.add(UTF8String.fromString(toks.mkString(" ")))
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  def wordGrams(text: Column, n: Int = 3): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      WordGrams(org.apache.spark.sql.GraftSqlBridge.expressionOf(text), n))
}
