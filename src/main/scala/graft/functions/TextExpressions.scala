package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.GraftSqlBridge.{column, expression}

/** Native Catalyst expressions for the text hot path (the
  * [[VectorExpressions]] pattern applied to strings).
  *
  * Motivation, measured: higher-order functions are CodegenFallback with
  * NO common-subexpression elimination, so
  * `transform(sequence(1, length(norm)-2), i -> substr(norm, i, 3))`
  * re-evaluates the inlined `norm` — in language ID, two regexes and a
  * lowercase — once per ELEMENT, and the optimizer re-inlines the alias
  * through every Project/Generate barrier short of a checkpoint
  * (16.5 s vs 2.3 s at sf0.1). A unary expression evaluates its child
  * exactly once per row by construction, immune to projection collapse.
  */
object TextExpressions {

  /** All overlapping character trigrams of a string — `n-2` substrings for
    * an `n`-char input, empty below 3 chars. Character (codepoint)
    * semantics match `substring`/DuckDB `substr` on the ASCII-normalized
    * inputs language ID feeds it.
    */
  case class CharTrigrams(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override protected def withNewChildInternal(newChild: Expression): CharTrigrams =
      copy(child = newChild)

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String]
      val n = s.numChars()
      val m = math.max(n - 2, 0)
      val out = new Array[Any](m)
      var i = 0
      while (i < m) { out(i) = s.substring(i, i + 3); i += 1 }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val (n, m, arr, i) = (ctx.freshName("n"), ctx.freshName("m"),
          ctx.freshName("arr"), ctx.freshName("i"))
        s"""
        |int $n = $a.numChars();
        |int $m = Math.max($n - 2, 0);
        |UTF8String[] $arr = new UTF8String[$m];
        |for (int $i = 0; $i < $m; $i++) {
        |  $arr[$i] = $a.substring($i, $i + 3);
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
        """.stripMargin
      })
  }

  def charTrigrams(c: Column): Column = column(CharTrigrams(expression(c)))
}
