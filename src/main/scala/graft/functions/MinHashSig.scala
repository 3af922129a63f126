package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a native Catalyst expression — the fast path for
  * the dedup pipelines.
  *
  * The declarative higher-order-function formulation (Dedup.
  * minhashSignatureFromShingles) evaluates one interpreted `aggregate`
  * pass over the shingle array PER hash function (64 passes/row, each
  * allocating per element). This expression does one tight JVM loop per
  * row and uses the standard two-hash family h_i(s) = h1(s) + i·h2(s)
  * (Kirsch–Mitzenmacher), so each shingle is hashed twice, not 64 times.
  * `doGenCode` emits a static call, so the expression stays inside
  * whole-stage codegen (no fallback row iterator). The FNV-1a64 family is
  * pure 64-bit arithmetic — the DuckDB correctness oracle replays it
  * exactly.
  */
final case class MinHashSig(child: Expression, numHashes: Int, shingleN: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], numHashes, shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSig$$.MODULE$$.compute($c, $numHashes, $shingleN)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** One pass over the text: tokenize, shingle, two FNV hashes per
    * distinct shingle, rolling min per hash function.
    */
  def compute(input: UTF8String, numHashes: Int, shingleN: Int): ArrayData = {
    val text = input.toString
    val toks = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    val shingleIt: Iterator[String] =
      if (toks.length >= shingleN) toks.sliding(shingleN).map(_.mkString(" "))
      else Iterator.single(toks.mkString(" "))
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val seen = new java.util.HashSet[String]()
    shingleIt.foreach { s =>
      if (seen.add(s)) {
        val h1 = fnv1a64(s, 0xcbf29ce484222325L)
        val h2 = fnv1a64(s, 0x84222325cbf29ce4L) | 1L
        var i = 0
        while (i < numHashes) {
          val h = h1 + i * h2
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
    }
    new GenericArrayData(sig)
  }

  private def fnv1a64(s: String, seed: Long): Long = {
    var h = seed
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Column-level entry point. */
  def minhashSig(text: Column, numHashes: Int = 64, shingleN: Int = 3): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      MinHashSig(org.apache.spark.sql.GraftSqlBridge.expressionOf(text), numHashes, shingleN))
}
