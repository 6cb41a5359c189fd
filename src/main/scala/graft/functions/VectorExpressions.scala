package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftSqlBridge.column

/** Native Catalyst expressions for the vector hot path.
  *
  * The built-in higher-order-function formulation (`aggregate(zip_with(...))`)
  * is CodegenFallback: every row pays boxed lambda evaluation (~1.5 ms/row
  * for a 64-dim dot product measured locally — three orders of magnitude
  * over native). These expressions emit a tight primitive loop inside
  * WholeStageCodegen instead, which is what survives a 100 TB scan.
  *
  * Math parity: accumulate left-to-right in double over float or double
  * element arrays — exactly the summation order of the HOF form and of the
  * DuckDB oracle (`list_cosine_similarity(CAST(x AS DOUBLE[]), ...)`), so
  * switching implementations never changes results.
  */
object VectorExpressions {

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(s"expected array, got $other")
  }

  private def getterName(et: DataType): String = et match {
    case FloatType => "getFloat"
    case DoubleType => "getDouble"
    case IntegerType => "getInt"
    case LongType => "getLong"
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  private def getD(a: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  /** Sequential-order dot product of two numeric arrays, in double. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val (lt, rt) = (elemType(left), elemType(right))
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += getD(x, i, lt) * getD(y, i, rt); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val (lg, rg) = (getterName(elemType(left)), getterName(elemType(right)))
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
        |int n = Math.min($a.numElements(), $b.numElements());
        |double s = 0.0;
        |for (int i = 0; i < n; i++) {
        |  s += ((double)$a.$lg(i)) * ((double)$b.$rg(i));
        |}
        |${ev.value} = s;
        """.stripMargin
      })
    }
  }

  /** L2 norm of a numeric array, in double (sequential sum of squares). */
  case class L2Norm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override protected def withNewChildInternal(newChild: Expression): L2Norm =
      copy(child = newChild)

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val et = elemType(child)
      var s = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) { val v = getD(x, i, et); s += v * v; i += 1 }
      math.sqrt(s)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val g = getterName(elemType(child))
      nullSafeCodeGen(ctx, ev, a => {
        s"""
        |int n = $a.numElements();
        |double s = 0.0;
        |for (int i = 0; i < n; i++) {
        |  double v = (double)$a.$g(i);
        |  s += v * v;
        |}
        |${ev.value} = Math.sqrt(s);
        """.stripMargin
      })
    }
  }

  /** Squared L2 distance between two numeric arrays, in double. */
  case class L2DistanceSq(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): L2DistanceSq =
      copy(left = newLeft, right = newRight)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val (lt, rt) = (elemType(left), elemType(right))
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = getD(x, i, lt) - getD(y, i, rt); s += d * d; i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val (lg, rg) = (getterName(elemType(left)), getterName(elemType(right)))
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
        |int n = Math.min($a.numElements(), $b.numElements());
        |double s = 0.0;
        |for (int i = 0; i < n; i++) {
        |  double d = ((double)$a.$lg(i)) - ((double)$b.$rg(i));
        |  s += d * d;
        |}
        |${ev.value} = s;
        """.stripMargin
      })
    }
  }

  // Column-API entry points
  def dotNative(a: Column, b: Column): Column = column(DotProduct(expr(a), expr(b)))
  def l2NormNative(a: Column): Column = column(L2Norm(expr(a)))
  def l2DistanceSqNative(a: Column, b: Column): Column = column(L2DistanceSq(expr(a), expr(b)))

  private def expr(c: Column): Expression =
    org.apache.spark.sql.GraftSqlBridge.expression(c)
}
