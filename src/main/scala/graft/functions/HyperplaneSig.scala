package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Random-hyperplane LSH signature as a native expression. The plane
  * coefficient for (dimension i, plane p) is
  * `(parseHex15(md5(s"${i}_$p")) % 2001 - 1000) / 1000.0` — exactly the
  * formula the HOF version evaluated per row with Spark's md5/conv
  * expressions, and exactly what the DuckDB oracle replays. Here the
  * coefficient table is computed ONCE per JVM (driver formula == Spark
  * formula == DuckDB formula, since md5 is md5), and each row pays one
  * tight dims×planes loop instead of dims×planes md5 calls.
  */
final case class HyperplaneSig(child: Expression, planes: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_sig"

  // def, not val: child.dataType resolves only after analysis
  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneSig.compute(input.asInstanceOf[ArrayData], planes, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneSig$$.MODULE$$.compute($c, $planes, $elemIsFloat)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  // coefficient cache, grown on demand; indexed [plane][dim]
  @volatile private var table: Array[Array[Double]] = Array.empty

  private def coeff(i: Int, p: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${i}_$p".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    ((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L).toDouble / 1000.0
  }

  private def ensure(planes: Int, dims: Int): Array[Array[Double]] = {
    val t = table
    if (t.length >= planes && (planes == 0 || t(0).length >= dims)) return t
    synchronized {
      val cur = table
      if (cur.length >= planes && (planes == 0 || cur(0).length >= dims)) return cur
      val np = math.max(planes, cur.length)
      val nd = math.max(dims, if (cur.isEmpty) 0 else cur(0).length)
      val fresh = Array.tabulate(np, nd)((p, i) => coeff(i, p))
      table = fresh
      fresh
    }
  }

  def compute(vec: ArrayData, planes: Int, elemIsFloat: Boolean): Long = {
    val n = vec.numElements()
    val w = ensure(planes, n)
    var sig = 0L
    var p = 0
    while (p < planes) {
      val row = w(p)
      var proj = 0.0
      var i = 0
      while (i < n) {
        val v = if (elemIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        proj += v * row(i)
        i += 1
      }
      if (proj > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  def hyperplaneSig(vec: Column, planes: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      HyperplaneSig(org.apache.spark.sql.GraftSqlBridge.expressionOf(vec), planes))
}
