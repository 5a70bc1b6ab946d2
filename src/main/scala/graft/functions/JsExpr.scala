package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference `expressions` module's Javascript-ish arithmetic language
  * (lucene/expressions/src/java/org/apache/lucene/expressions/js/
  * Javascript.g, JavascriptCompiler.java), compiled to a Spark Column
  * instead of JVM bytecode — Catalyst codegen replaces ASM.
  *
  * Semantics preserved from the reference compiler:
  *  - everything is a double; comparisons and boolean ops yield 1.0/0.0,
  *    an operand is "true" iff != 0 (JavascriptCompiler.java:300-340)
  *  - bitwise ops and shifts work on the (long) cast of the operands with
  *    Java's 6-bit shift-count masking ("4195 << 66" == "4195 << 2",
  *    TestJavascriptOperations.java:217)
  *  - hex (0x..) and octal (0..) literals parse as longs
  *    (JavascriptCompiler.java:279-282)
  *  - precedence chain: ?: < || < && < | < ^ < & < ==/!= < relational <
  *    shifts < +- < * / % < unary (Javascript.g:254-307)
  *  - the DEFAULT_FUNCTIONS table (JavascriptCompiler.properties): abs,
  *    acos(h), asin(h), atan(h), atan2, ceil, cos(h), exp, floor,
  *    haversin, ln, log10, logn, max, min, pow, sin(h), sqrt, tan(h).
  *    haversin follows SloppyMath.haversin's formula with exact trig and
  *    the WGS84 mean diameter (the reference interpolates a per-latitude
  *    diameter table; documented approximation, km-scale agreement).
  *
  * Variables resolve through the caller's bindings (the reference's
  * `Bindings` → ValueSource; here name → Column). Dotted/indexed names
  * (VariableContext.java) are legal identifier characters here.
  */
object JsExpr {

  def compile(src: String, bindings: Map[String, Column]): Column =
    new Parser(src, bindings).parse()

  // ---- tokenizer ----

  private sealed trait Tok
  private case class Num(v: Double) extends Tok
  private case class Ident(name: String) extends Tok
  private case class Op(s: String) extends Tok
  private case object End extends Tok

  private val Ops = List( // longest first
    ">>>", "<<", ">>", "<=", ">=", "==", "!=", "&&", "||",
    "(", ")", ",", "?", ":", "<", ">", "!", "~", "&", "|", "^",
    "+", "-", "*", "/", "%")

  private def tokenize(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < n && src.charAt(i + 1).isDigit)) {
        val start = i
        if (c == '0' && i + 1 < n && (src.charAt(i + 1) == 'x' || src.charAt(i + 1) == 'X')) {
          i += 2
          while (i < n && Character.digit(src.charAt(i), 16) >= 0) i += 1
          out += Num(java.lang.Long.parseLong(src.substring(start + 2, i), 16).toDouble)
        } else if (c == '0' && i + 1 < n && src.charAt(i + 1) >= '0' && src.charAt(i + 1) <= '7') {
          i += 1
          while (i < n && src.charAt(i) >= '0' && src.charAt(i) <= '7') i += 1
          out += Num(java.lang.Long.parseLong(src.substring(start + 1, i), 8).toDouble)
        } else {
          while (i < n && (src.charAt(i).isDigit || src.charAt(i) == '.')) i += 1
          if (i < n && (src.charAt(i) == 'e' || src.charAt(i) == 'E')) {
            i += 1
            if (i < n && (src.charAt(i) == '+' || src.charAt(i) == '-')) i += 1
            while (i < n && src.charAt(i).isDigit) i += 1
          }
          out += Num(java.lang.Double.parseDouble(src.substring(start, i)))
        }
      } else if (c.isLetter || c == '_' || c == '$') {
        val start = i
        while (i < n && (src.charAt(i).isLetterOrDigit || "._$[]'\"".indexOf(src.charAt(i)) >= 0))
          i += 1
        out += Ident(src.substring(start, i))
      } else {
        Ops.find(op => src.startsWith(op, i)) match {
          case Some(op) => out += Op(op); i += op.length
          case None => throw new IllegalArgumentException(
            s"unexpected character '$c' at $i in expression: $src")
        }
      }
    }
    (out += End).result()
  }

  // ---- parser (recursive descent along Javascript.g's chain) ----

  private final class Parser(src: String, bindings: Map[String, Column]) {
    private val toks = tokenize(src)
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def expect(op: String): Unit = next() match {
      case Op(`op`) =>
      case t => throw new IllegalArgumentException(s"expected '$op', got $t in: $src")
    }
    private def isOp(s: String): Boolean = peek == Op(s)
    private def eat(s: String): Boolean = { val m = isOp(s); if (m) pos += 1; m }

    def parse(): Column = {
      val c = conditional()
      if (peek != End)
        throw new IllegalArgumentException(s"trailing input at token $pos in: $src")
      c
    }

    private def truthy(c: Column): Column = c =!= lit(0.0)
    private def bool(c: Column): Column = when(c, lit(1.0)).otherwise(lit(0.0))
    private def asLong(c: Column): Column = c.cast("long")

    private def conditional(): Column = {
      val cond = logicalOr()
      if (eat("?")) {
        val a = conditional(); expect(":"); val b = conditional()
        when(truthy(cond), a).otherwise(b)
      } else cond
    }

    private def logicalOr(): Column = {
      var c = logicalAnd()
      while (eat("||")) c = bool(truthy(c) || truthy(logicalAnd()))
      c
    }

    private def logicalAnd(): Column = {
      var c = bitwiseOr()
      while (eat("&&")) c = bool(truthy(c) && truthy(bitwiseOr()))
      c
    }

    private def bitwiseOr(): Column = {
      var c = bitwiseXor() // "||" is its own token (longest-first lexing)
      while (eat("|")) c = (asLong(c).bitwiseOR(asLong(bitwiseXor()))).cast("double")
      c
    }

    private def bitwiseXor(): Column = {
      var c = bitwiseAnd()
      while (eat("^")) c = (asLong(c).bitwiseXOR(asLong(bitwiseAnd()))).cast("double")
      c
    }

    private def bitwiseAnd(): Column = {
      var c = equality()
      while (eat("&")) c = (asLong(c).bitwiseAND(asLong(equality()))).cast("double")
      c
    }

    private def equality(): Column = {
      var c = relational()
      var done = false
      while (!done) {
        if (eat("==")) c = bool(c === relational())
        else if (eat("!=")) c = bool(c =!= relational())
        else done = true
      }
      c
    }

    private def relational(): Column = {
      var c = shift()
      var done = false
      while (!done) {
        if (eat("<=")) c = bool(c <= shift())
        else if (eat(">=")) c = bool(c >= shift())
        else if (eat("<")) c = bool(c < shift())
        else if (eat(">")) c = bool(c > shift())
        else done = true
      }
      c
    }

    private def shift(): Column = {
      var c = additive()
      var done = false
      while (!done) {
        // Java long shifts mask the count to 6 bits (JVM LSHL/LSHR/LUSHR)
        if (eat("<<")) c = call_function("shiftleft",
          asLong(c), asLong(additive()).cast("int")).cast("double")
        else if (eat(">>>")) c = call_function("shiftrightunsigned",
          asLong(c), asLong(additive()).cast("int")).cast("double")
        else if (eat(">>")) c = call_function("shiftright",
          asLong(c), asLong(additive()).cast("int")).cast("double")
        else done = true
      }
      c
    }

    private def additive(): Column = {
      var c = multiplicative()
      var done = false
      while (!done) {
        if (eat("+")) c = c + multiplicative()
        else if (eat("-")) c = c - multiplicative()
        else done = true
      }
      c
    }

    // Java double semantics under Spark's ANSI mode: x/0 is +-Infinity
    // (NaN for 0/0) and x%0 is NaN, never an error
    private def javaDiv(a: Column, b: Column): Column =
      coalesce(try_divide(a, b),
        when(a > 0, lit(Double.PositiveInfinity))
          .when(a < 0, lit(Double.NegativeInfinity))
          .otherwise(lit(Double.NaN)))
    private def javaMod(a: Column, b: Column): Column =
      coalesce(try_mod(a, b), lit(Double.NaN))

    private def multiplicative(): Column = {
      var c = unary()
      var done = false
      while (!done) {
        if (eat("*")) c = c * unary()
        else if (eat("/")) c = javaDiv(c, unary())
        else if (eat("%")) c = javaMod(c, unary())
        else done = true
      }
      c
    }

    private def unary(): Column =
      if (eat("+")) unary()
      else if (eat("-")) -unary()
      else if (eat("!")) bool(!truthy(unary()))
      else if (eat("~")) bitwise_not(asLong(unary())).cast("double")
      else primary()

    private def primary(): Column = next() match {
      case Num(v) => lit(v)
      case Op("(") => val c = conditional(); expect(")"); c
      case Ident(name) if isOp("(") =>
        pos += 1
        val args = Vector.newBuilder[Column]
        if (!isOp(")")) {
          args += conditional()
          while (eat(",")) args += conditional()
        }
        expect(")")
        callFn(name, args.result())
      case Ident(name) =>
        bindings.getOrElse(name, throw new IllegalArgumentException(
          s"unbound variable '$name' in expression: $src")).cast("double")
      case t => throw new IllegalArgumentException(s"unexpected $t in: $src")
    }

    private def callFn(name: String, a: Seq[Column]): Column = {
      def one = { require(a.length == 1, s"$name takes 1 arg"); a(0) }
      def two = { require(a.length == 2, s"$name takes 2 args"); (a(0), a(1)) }
      name match {
        case "abs" => abs(one)
        case "acos" => acos(one)
        case "asin" => asin(one)
        case "atan" => atan(one)
        case "atan2" => val (y, x) = two; atan2(y, x)
        // MathUtil.{acosh,asinh,atanh} (lucene/core/.../util/MathUtil.java)
        case "acosh" => val x = one; log(x + sqrt(x * x - 1.0))
        case "asinh" =>
          val x = one
          signum(x) * log(abs(x) + sqrt(abs(x) * abs(x) + 1.0))
        case "atanh" =>
          val x = one
          signum(x) * lit(0.5) * log((lit(1.0) + abs(x)) / (lit(1.0) - abs(x)))
        case "ceil" => ceil(one).cast("double")
        case "cos" => cos(one)
        case "cosh" => cosh(one)
        case "exp" => exp(one)
        case "floor" => floor(one).cast("double")
        case "ln" => log(one)
        case "log10" => log10(one)
        case "logn" => val (b, x) = two; log(x) / log(b) // MathUtil.log(base, x)
        case "max" => val (x, y) = two; greatest(x, y)
        case "min" => val (x, y) = two; least(x, y)
        case "pow" => val (x, y) = two; pow(x, y)
        case "sin" => sin(one)
        case "sinh" => sinh(one)
        case "sqrt" => sqrt(one)
        case "tan" => tan(one)
        case "tanh" => tanh(one)
        case "haversin" => // SloppyMath.haversin shape, exact trig
          require(a.length == 4, "haversin takes 4 args")
          val toRad = math.Pi / 180d
          val x1 = a(0) * toRad; val x2 = a(2) * toRad
          val h1 = lit(1.0) - cos(x1 - x2)
          val h2 = lit(1.0) - cos((a(1) - a(3)) * toRad)
          val h = (h1 + cos(x1) * cos(x2) * h2) / 2.0
          lit(2 * 6371.0087714) * asin(least(lit(1.0), sqrt(h)))
        case other => throw new IllegalArgumentException(s"unknown function '$other'")
      }
    }
  }
}
