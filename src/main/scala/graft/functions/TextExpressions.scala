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

  /** [[CharTrigrams]] generalized to width `n` — overlapping character
    * n-grams, `len-n+1` substrings, empty below `n` chars. Same native
    * rationale: the child (in multiscript shingling, a regexp_replace
    * normalization) evaluates exactly once per row.
    */
  case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, s"n >= 1, got $n")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override protected def withNewChildInternal(newChild: Expression): CharNgrams =
      copy(child = newChild)

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String]
      val m = math.max(s.numChars() - n + 1, 0)
      val out = new Array[Any](m)
      var i = 0
      while (i < m) { out(i) = s.substring(i, i + n); i += 1 }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val (m, arr, i) = (ctx.freshName("m"), ctx.freshName("arr"), ctx.freshName("i"))
        s"""
        |int $m = Math.max($a.numChars() - $n + 1, 0);
        |UTF8String[] $arr = new UTF8String[$m];
        |for (int $i = 0; $i < $m; $i++) {
        |  $arr[$i] = $a.substring($i, $i + $n);
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
        """.stripMargin
      })
  }

  def charNgrams(c: Column, n: Int): Column = column(CharNgrams(expression(c), n))

  /** DISTINCT word n-gram shingles of a token array — `join(" ")` of each
    * length-`n` window, first-occurrence order (the `array_distinct`
    * contract), empty below `n` tokens.
    *
    * Why native (the [[CharTrigrams]] rationale): the column form —
    * `when(size(toks) < n, []).otherwise(array_distinct(transform(
    * sequence(...), i -> concat_ws(element_at(toks, ...)))))` — is a
    * lambda HOF under a CASE, so CSE skips it and projection collapse
    * re-inlines the tokenizer (`regexp_extract_all` + `lower`) into the
    * CASE condition and into the lambda — re-tokenizing per shingle.
    * Measured on q_decontaminate at sf0.1: 9.5 s (guarded HOF) vs 2.4 s
    * (pre-guard HOF) vs ~1 s native. This expression reads its child
    * once per row and handles the short-doc guard internally.
    */
  case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, s"shingle width must be >= 1 (got $n)")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override protected def withNewChildInternal(newChild: Expression): WordShingles =
      copy(child = newChild)

    override def nullSafeEval(input: Any): Any =
      WordShinglesHelper.compute(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.WordShinglesHelper.compute($a, $n);")
  }

  def wordShingles(toks: Column, n: Int): Column =
    column(WordShingles(expression(toks), n))

  /** C4 line-filter statistics in ONE pass over the text:
    * `struct<n_lines, n_kept, cleaned>` where a line counts if it trims
    * (spaces only, the `trim`/DuckDB parity) to non-empty, and is KEPT if
    * it additionally ends in terminal punctuation (`.`, `!`, `?`, `"`)
    * and holds at least `minLineWords` whitespace-separated words;
    * `cleaned` is the kept lines rejoined with newlines.
    *
    * Why native (the [[CharTrigrams]] rationale): the declarative form —
    * `filter(transform(split(text,"\n"), trim), pred)` referenced by
    * n_lines / n_kept / kept_frac / cleaned / n_sentences / keep — is a
    * lambda HOF, so CSE skips it and projection collapse re-inlines the
    * whole split-trim-filter chain into every consumer (~7 evaluations
    * per row). This expression generates code (a static helper call), so
    * subexpression elimination runs it once per row no matter how many
    * struct fields the projection reads. Semantics are byte-identical to
    * the column form: space-only trim, Java `\s` word boundaries,
    * last-char punctuation test.
    */
  case class C4LineStats(child: Expression, minLineWords: Int) extends UnaryExpression {
    override def dataType: DataType = C4LineStats.schema
    override protected def withNewChildInternal(newChild: Expression): C4LineStats =
      copy(child = newChild)

    override def nullSafeEval(input: Any): Any =
      C4LineStatsHelper.compute(input.asInstanceOf[UTF8String], minLineWords)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.C4LineStatsHelper.compute($a, $minLineWords);")
  }

  object C4LineStats {
    val schema: StructType = StructType(Seq(
      StructField("n_lines", LongType, nullable = false),
      StructField("n_kept", LongType, nullable = false),
      StructField("cleaned", StringType, nullable = false)))
  }

  def c4LineStats(c: Column, minLineWords: Int): Column =
    column(C4LineStats(expression(c), minLineWords))
}

/** Static helper the generated code calls (top-level object = Java static
  * forwarder, resolvable from janino-compiled projections).
  */
object C4LineStatsHelper {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  def compute(s: UTF8String, minWords: Int): InternalRow = {
    val text = s.toString
    val len = text.length
    var nLines = 0L
    var nKept = 0L
    val sb = new java.lang.StringBuilder
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || text.charAt(i) == '\n') {
        var a = start
        var b = i
        // space-only trim: parity with Spark `trim` and DuckDB trim()
        while (a < b && text.charAt(a) == ' ') a += 1
        while (b > a && text.charAt(b - 1) == ' ') b -= 1
        if (b > a) {
          nLines += 1L
          val last = text.charAt(b - 1)
          if (last == '.' || last == '!' || last == '?' || last == '"') {
            // words = maximal runs of non-\s chars (Java regex \s set)
            var w = 0
            var inWord = false
            var j = a
            while (j < b) {
              val c = text.charAt(j)
              val ws = c == ' ' || c == '\t' || c == '\u000B' || c == '\f' ||
                c == '\r' || c == '\n'
              if (ws) inWord = false
              else if (!inWord) { w += 1; inWord = true }
              j += 1
            }
            if (w >= minWords) {
              nKept += 1L
              if (sb.length > 0) sb.append('\n')
              sb.append(text, a, b)
            }
          }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(
      Array[Any](nLines, nKept, UTF8String.fromString(sb.toString)))
  }
}

/** Static helper for [[TextExpressions.WordShingles]] (top-level object =
  * Java static forwarder, resolvable from janino-compiled projections).
  */
object WordShinglesHelper {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  private val Space = UTF8String.fromString(" ")

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val size = arr.numElements()
    val m = size - n + 1
    if (m <= 0) return new GenericArrayData(new Array[Any](0))
    // LinkedHashSet: dedupe with first-occurrence order, the
    // array_distinct contract the dedup-family oracles replay
    val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
