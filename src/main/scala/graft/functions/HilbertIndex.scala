package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve distance of an n-dimensional bucket coordinate — the
  * alternative space-filling curve for clustering layout. Morton (bit
  * interleave, `ZOrder.withZColumn`) is cheaper to compute but jumps
  * across space at power-of-two boundaries; the Hilbert walk moves one
  * bucket at a time, so consecutive rows in the written order are always
  * neighbors in EVERY curve dimension — per-file [min,max] ranges come
  * out tighter and column-stats pruning skips more files for the same
  * layout cost (one range shuffle).
  *
  * Algorithm: John Skilling, "Programming the Hilbert curve", AIP Conf.
  * Proc. 707 (2004) — the standard public transpose formulation: undo the
  * per-level rotations/reflections in place, Gray-encode, then read the
  * index out by MSB-first bit interleave. One tight loop per row, native
  * eval + codegen via a static call (no boxing beyond the input array).
  */
final case class HilbertIndex(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override protected def nullSafeEval(input: Any): Any =
    HilbertIndex.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HilbertIndex$$.MODULE$$.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): HilbertIndex =
    copy(child = newChild)
}

object HilbertIndex {

  /** Hilbert distance of `coords` (each in [0, 2^bits)). Requires
    * n * bits <= 63 so the distance fits a positive long.
    */
  def compute(coords: ArrayData, bits: Int): Long = {
    val n = coords.numElements()
    val x = new Array[Long](n)
    var i = 0
    while (i < n) { x(i) = coords.getLong(i); i += 1 }

    // Skilling AxestoTranspose: inverse undo, then Gray encode
    val m = 1L << (bits - 1)
    var q = m
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p // invert low bits of x(0)
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t } // exchange
        i += 1
      }
      q >>= 1
    }
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) {
      if ((x(n - 1) & q) != 0L) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }

    // transpose -> index: MSB-first interleave across dimensions
    var h = 0L
    var bit = bits - 1
    while (bit >= 0) {
      i = 0
      while (i < n) {
        h = (h << 1) | ((x(i) >> bit) & 1L)
        i += 1
      }
      bit -= 1
    }
    h
  }

  def hilbert(bucketArray: Column, bits: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      HilbertIndex(org.apache.spark.sql.GraftSqlBridge.expressionOf(bucketArray), bits))
}
