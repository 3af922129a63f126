package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

/** Native vector math over `array<double>` — the hot loops behind the
  * similarity-search family. The declarative forms
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) are higher-order
  * functions, which Spark evaluates INTERPRETED (no whole-stage codegen
  * for lambda bodies): ~µs per 64-dim pair, which dominates the pairwise
  * stages (SemDeDup compares ~10⁶ pairs per bucket batch). These are one
  * tight JVM loop per pair.
  *
  * IEEE-exactness contract (pinned by the DuckDB oracles): accumulation
  * order is ascending-index left fold seeded at 0.0 for each of dot, |a|²
  * and |b|² — bit-identical to both the declarative fold and the
  * oracle's `list_reduce`. Null element or length mismatch → null,
  * matching null propagation through `zip_with`.
  */
object VecMath {

  def cosineNative(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(VecCosine(
      org.apache.spark.sql.GraftSqlBridge.expressionOf(a.cast("array<double>")),
      org.apache.spark.sql.GraftSqlBridge.expressionOf(b.cast("array<double>"))))

  def l2Native(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(VecL2(
      org.apache.spark.sql.GraftSqlBridge.expressionOf(a.cast("array<double>")),
      org.apache.spark.sql.GraftSqlBridge.expressionOf(b.cast("array<double>"))))

  /** (dot, |a|, |b|) → cosine with the 0-denominator guard. */
  def cosineOf(x: ArrayData, y: ArrayData): Any = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val a = x.getDouble(i); val b = y.getDouble(i)
      dot += a * b; na += a * a; nb += b * b
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  def l2Of(x: ArrayData, y: ArrayData): Any = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }
}

final case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def prettyName: String = "graft_vec_cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.cosineOf(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""Object r = graft.functions.VecMath$$.MODULE$$.cosineOf($a, $b);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) r).doubleValue(); }
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)
}

final case class VecL2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def prettyName: String = "graft_vec_l2"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.l2Of(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""Object r = graft.functions.VecMath$$.MODULE$$.l2Of($a, $b);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) r).doubleValue(); }
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecL2 =
    copy(left = l, right = r)
}
