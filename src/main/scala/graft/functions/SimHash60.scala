package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** 60-bit SimHash from an array of (portable md5-derived) token hashes —
  * native replacement for the higher-order-function bit-vote formulation,
  * which evaluates an interpreted per-token lambda for each of the 60
  * bits (60×tokens lambda calls per row; this is one tight loop). Bit j
  * of the result is set iff more token hashes have bit j set than clear —
  * identical semantics to Dedup.simhashFromHashes, which the DuckDB
  * oracle replays.
  */
final case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash60$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  def compute(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 60) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  def simhash60(tokenHashes: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      SimHash60(org.apache.spark.sql.GraftSqlBridge.expressionOf(tokenHashes)))
}
