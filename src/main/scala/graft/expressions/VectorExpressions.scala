package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Custom codegen'd vector kernels (brief's preferred extension path:
  * a native Catalyst Expression with doGenCode beats interpreted
  * higher-order folds in the hot path). Both accumulate in double in
  * sequential index order — bit-identical to the interpreted fold
  * `aggregate(zip_with(a, b, f), 0.0, +)` they replace and to the
  * DuckDB oracle's `list_sum(list_transform(range, i -> f(a[i], b[i])))`,
  * so swapping the implementation cannot change a hash-compared result.
  * Element types float and double are supported independently per side
  * (an IVF centroid is a double array probed by float queries). */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  /** Scalar combine in Java source; operands are double variables. */
  protected def combineJava(x: String, y: String): String
  /** Scalar combine for interpreted eval. */
  protected def combine(x: Double, y: Double): Double

  private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (lt, rt) = (elemType(left).get, elemType(right).get)
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += combine(get(xs, i, lt), get(ys, i, rt))
      i += 1
    }
    s
  }

  private def getterJava(t: DataType): String =
    if (t == FloatType) "getFloat" else "getDouble"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (lg, rg) = (getterJava(elemType(left).get), getterJava(elemType(right).get))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.$lg($i);
         |  double $y = (double) $b.$rg($i);
         |  ${ev.value} += ${combineJava(x, y)};
         |}
       """.stripMargin
    })
  }
}

/** dot_f(a, b) = Σ a_i * b_i */
case class DotProductF(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "dot_f"
  override protected def combineJava(x: String, y: String): String = s"$x * $y"
  override protected def combine(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** l2sq_f(a, b) = Σ (a_i - b_i)² */
case class L2SquaredF(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "l2sq_f"
  override protected def combineJava(x: String, y: String): String = s"($x - $y) * ($x - $y)"
  override protected def combine(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
