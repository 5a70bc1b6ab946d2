package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Solr's function-query syntax ({!func} / sort-by-function), compiled to
  * a Catalyst Column.
  *
  * Reference: solr/core/src/java/org/apache/solr/search/ValueSourceParser
  * .java (the standard parser table) and the lucene/queries function
  * classes it builds:
  *  - linear(x,m,c) = m*x+c (LinearFloatFunction.java:53)
  *  - recip(x,m,a,b) = a/(m*x+b) (ReciprocalFloatFunction.java:60)
  *  - scale(x,minTo,maxTo): min/max of x over the corpus scaled into
  *    [minTo,maxTo] (ScaleFloatFunction.java:56 — the reference walks all
  *    values once to find min/max; here that walk is ONE distributed
  *    agg computed at compile time)
  *  - map(x,min,max,target[,def]) (RangeMapFloatFunction.java:57)
  *  - if(test,a,b) with numeric-!=0 truthiness, def(x,d)=coalesce,
  *    exists(x)=isNotNull, not/and/or booleans as 1.0/0.0
  *  - sum/sub/product/div/pow/abs/sqrt/log(base 10)/ln/max/min
  *  - strdist(a,b,'edit') = 1 - lev/maxLen (LevensteinDistance.java —
  *    the commons-lang form the reference delegates to)
  *
  * Field references resolve through `fields`; numeric literals and
  * 'quoted'/"quoted" strings are literals. */
object FuncQuery {

  def compile(src: String, fields: Map[String, Column],
              corpus: DataFrame = null): Column =
    new P(src, fields, Option(corpus)).parseAll()

  private final class P(src: String, fields: Map[String, Column],
                        corpus: Option[DataFrame]) {
    private var i = 0
    private def ws(): Unit = while (i < src.length && src.charAt(i).isWhitespace) i += 1
    private def peek: Char = if (i < src.length) src.charAt(i) else '\u0000'
    private def expect(c: Char): Unit = {
      ws()
      if (peek != c) throw new IllegalArgumentException(
        s"expected '$c' at $i in: $src")
      i += 1
    }

    def parseAll(): Column = {
      val c = value()
      ws()
      if (i != src.length)
        throw new IllegalArgumentException(s"trailing input at $i in: $src")
      c
    }

    private def ident(): String = {
      ws()
      val start = i
      while (i < src.length && (src.charAt(i).isLetterOrDigit ||
        src.charAt(i) == '_' || src.charAt(i) == '.')) i += 1
      src.substring(start, i)
    }

    private def value(): Column = {
      ws()
      val c = peek
      if (c == '\'' || c == '"') {
        i += 1
        val start = i
        while (i < src.length && src.charAt(i) != c) i += 1
        val s = src.substring(start, i)
        i += 1
        lit(s)
      } else if (c.isDigit || c == '-' || c == '+' ||
        (c == '.' && i + 1 < src.length && src.charAt(i + 1).isDigit)) {
        val start = i
        if (c == '-' || c == '+') i += 1
        while (i < src.length && (src.charAt(i).isDigit || src.charAt(i) == '.' ||
          src.charAt(i) == 'e' || src.charAt(i) == 'E' ||
          ((src.charAt(i) == '-' || src.charAt(i) == '+') &&
            (src.charAt(i - 1) == 'e' || src.charAt(i - 1) == 'E')))) i += 1
        lit(src.substring(start, i).toDouble)
      } else {
        val name = ident()
        ws()
        if (peek == '(') { i += 1; val c = call(name); expect(')'); c }
        else name match {
          // bare boolean/math constants (BoolConstValueSource,
          // DoubleConstValueSource — usable with or without parens)
          case "true" => lit(1.0)
          case "false" => lit(0.0)
          case "e" => lit(math.E)
          case "pi" => lit(math.Pi)
          case _ => fields.getOrElse(name, throw new IllegalArgumentException(
            s"unknown field '$name' in: $src")).cast("double")
        }
      }
    }

    private def args(): Seq[Column] = {
      ws()
      if (peek == ')') return Nil
      val out = Vector.newBuilder[Column]
      out += value()
      ws()
      while (peek == ',') { i += 1; out += value(); ws() }
      out.result()
    }

    private def truthy(c: Column): Column = c =!= lit(0.0)
    private def bool(c: Column): Column = when(c, lit(1.0)).otherwise(lit(0.0))

    private def call(name: String): Column = {
      if (name == "field") {
        // FieldValueSource by quoted-or-bare name: resolve the raw string
        ws()
        val f =
          if (peek == '\'' || peek == '"') {
            val q = peek; i += 1
            val start = i
            while (i < src.length && src.charAt(i) != q) i += 1
            val out = src.substring(start, i); i += 1; out
          } else ident()
        return fields.getOrElse(f, throw new IllegalArgumentException(
          s"unknown field '$f' in: $src")).cast("double")
      }
      val a = args()
      def n(k: Int): Unit = require(a.length == k, s"$name takes $k args")
      name match {
        case "mod" => n(2); a(0) % a(1)
        // XOrFunction (MultiBoolFunction chained ^): true when an ODD
        // number of arguments are true
        case "xor" => bool(a.map(truthy).reduce(_ =!= _))
        case "e" => n(0); lit(math.E)
        case "pi" => n(0); lit(math.Pi)
        case "true" => n(0); lit(1.0)
        case "false" => n(0); lit(0.0)
        // LiteralValueSource: the literal string itself
        case "literal" => n(1); a(0)
        case "sum" | "add" => a.reduce(_ + _)
        case "sub" => n(2); a(0) - a(1)
        case "product" | "mul" => a.reduce(_ * _)
        case "div" => n(2); a(0) / a(1)
        case "pow" => n(2); pow(a(0), a(1))
        case "abs" => n(1); abs(a(0))
        case "sqrt" => n(1); sqrt(a(0))
        case "log" => n(1); log10(a(0)) // Solr log() is base 10
        case "ln" => n(1); log(a(0))
        case "max" => greatest(a: _*)
        case "min" => least(a: _*)
        case "linear" => n(3); a(1) * a(0) + a(2) // slope, intercept
        case "recip" => n(4); a(2) / (a(1) * a(0) + a(3)) // a/(m*x+b)
        case "map" =>
          require(a.length == 4 || a.length == 5, "map takes 4 or 5 args")
          val dflt = if (a.length == 5) a(4) else a(0)
          when(a(0) >= a(1) && a(0) <= a(2), a(3)).otherwise(dflt)
        case "scale" =>
          n(3)
          val df = corpus.getOrElse(throw new IllegalArgumentException(
            "scale() needs the corpus DataFrame to find the source min/max"))
          val row = df.agg(min(a(0)).cast("double"), max(a(0)).cast("double")).head()
          val (lo, hi) = (row.getDouble(0), row.getDouble(1))
          // ScaleFloatFunction: constant when the source is constant
          if (hi == lo) a(1)
          else (a(0) - lit(lo)) * (a(2) - a(1)) / lit(hi - lo) + a(1)
        case "if" => n(3); when(truthy(a(0)), a(1)).otherwise(a(2))
        case "def" => n(2); coalesce(a(0), a(1))
        case "exists" => n(1); bool(a(0).isNotNull)
        case "not" => n(1); bool(!truthy(a(0)))
        case "and" => bool(a.map(truthy).reduce(_ && _))
        case "or" => bool(a.map(truthy).reduce(_ || _))
        case "strdist" =>
          n(3) // strdist(a, b, 'edit'): 1 - lev/maxLen
          lit(1.0) - levenshtein(a(0), a(1)).cast("double") /
            greatest(length(a(0)), length(a(1))).cast("double")
        case other => throw new IllegalArgumentException(
          s"unknown function '$other' in: $src")
      }
    }
  }
}
