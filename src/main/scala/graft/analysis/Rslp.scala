package graft.analysis

/** RSLP rule-file stemming (reference pt/RSLPStemmerBase.java:84 — the
  * Orengo et al. "Removedor de Sufixos da Lingua Portuguesa" algorithm and
  * its Galician adaptation). Steps come from the reference's own .rslp
  * resource files (shipped verbatim: pt/portuguese.rslp, gl/galician.rslp);
  * each step is an ordered first-match rule list with per-rule minimum stem
  * sizes and whole-word or suffix exception lists.
  */
object Rslp {

  final case class Rule(suffix: String, min: Int, repl: String,
                        exceptions: Array[String], wholeWord: Boolean) {
    def matches(w: String): Boolean =
      w.length - suffix.length >= min && w.endsWith(suffix) && {
        if (exceptions == null) true
        else if (wholeWord) !exceptions.contains(w)
        else !exceptions.exists(w.endsWith)
      }
    def replace(w: String): String =
      w.substring(0, w.length - suffix.length) + repl
  }

  final class Step(val name: String, min0: Int, conds: Array[String],
                   rules: Vector[Rule]) {
    // a zero min means "derive from the rules" (Step ctor in the reference)
    private val min =
      if (min0 != 0) min0 else rules.map(r => r.min + r.suffix.length).min
    def apply(w: String): String = {
      if (w.length < min) return w
      if (conds != null && !conds.exists(w.endsWith)) return w
      rules.find(_.matches(w)) match {
        case Some(r) => r.replace(w)
        case None    => w
      }
    }
  }

  private val headerRe =
    """^\{\s*"([^"]*)",\s*([0-9]+),\s*(0|1),\s*\{(.*)\},\s*$""".r
  private val stripRe = """^\{\s*"([^"]*)",\s*([0-9]+)\s*\}\s*(,|(\}\s*;))$""".r
  private val repRe =
    """^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)"\}\s*(,|(\}\s*;))$""".r
  private val excRe =
    """^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)",\s*\{(.*)\}\s*\}\s*(,|(\}\s*;))$""".r

  private def parseList(s: String): Array[String] =
    if (s.isEmpty) null
    else s.split(',').map(x => { val t = x.trim; t.substring(1, t.length - 1) })

  /** Parse a .rslp steps file into name -> Step. */
  def parse(text: String): Map[String, Step] = {
    val lines = text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && l(0) != '#').toVector
    val steps = Map.newBuilder[String, Step]
    var i = 0
    while (i < lines.length) {
      lines(i) match {
        case headerRe(name, min, typ, condList) =>
          val wholeWord = typ == "1"
          val rules = Vector.newBuilder[Rule]
          var done = false
          while (!done && { i += 1; i < lines.length }) {
            val l = lines(i)
            l match {
              case stripRe(suf, m, _, _) =>
                rules += Rule(suf, m.toInt, "", null, wholeWord)
              case repRe(suf, m, rep, _, _) =>
                rules += Rule(suf, m.toInt, rep, null, wholeWord)
              case excRe(suf, m, rep, exc, _, _) =>
                rules += Rule(suf, m.toInt, rep, parseList(exc), wholeWord)
              case other =>
                throw new IllegalArgumentException(s"bad RSLP rule: $other")
            }
            if (l.endsWith(";")) done = true
          }
          steps += name -> new Step(name, min.toInt, parseList(condList),
            rules.result())
        case other =>
          throw new IllegalArgumentException(s"bad RSLP header: $other")
      }
      i += 1
    }
    steps.result()
  }

  private def resourceText(path: String): String = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private lazy val gl = parse(resourceText("/graft/rslp/galician.rslp"))
  private lazy val pt = parse(resourceText("/graft/rslp/portuguese.rslp"))

  private def fold(w: String, m: Map[Char, Char]): String =
    w.map(c => m.getOrElse(c, c))

  private val glAccents = Map('á' -> 'a', 'é' -> 'e', 'ê' -> 'e',
    'í' -> 'i', 'ó' -> 'o', 'ú' -> 'u')
  private val ptAccents: Map[Char, Char] =
    ("àáâãäå".map(_ -> 'a') ++ Seq('ç' -> 'c') ++ "èéêë".map(_ -> 'e') ++
      "ìíîï".map(_ -> 'i') ++ Seq('ñ' -> 'n') ++ "òóôõö".map(_ -> 'o') ++
      "ùúûü".map(_ -> 'u') ++ "ýÿ".map(_ -> 'y')).toMap

  /** Full Galician RSLP flow (reference gl/GalicianStemmer.java:50).
    * NOTE: the reference's "suffix not removed" checks compare buffer
    * LENGTHS — a same-length replacement counts as not-removed but its
    * mutation is kept, so the next step sees the replaced form. */
  def galician(word: String): String = {
    var w = word.toLowerCase(java.util.Locale.ROOT)
    w = gl("Plural")(w)
    w = gl("Unification")(w)
    w = gl("Adverb")(w)
    var oldLen = -1
    while (w.length != oldLen) { oldLen = w.length; w = gl("Augmentative")(w) }
    val lenBefore = w.length
    w = gl("Noun")(w)
    if (w.length == lenBefore) w = gl("Verb")(w)
    w = gl("Vowel")(w)
    fold(w, glAccents)
  }

  /** Plural-only Galician (reference gl/GalicianMinimalStemmer.java). */
  def galicianMinimal(word: String): String =
    gl("Plural")(word.toLowerCase(java.util.Locale.ROOT))

  /** Full Portuguese RSLP flow (reference pt/PortugueseStemmer.java:48);
    * length-compared not-removed checks as in `galician`. */
  def portuguese(word: String): String = {
    var w = word.toLowerCase(java.util.Locale.ROOT)
    w = pt("Plural")(w)
    w = pt("Adverb")(w)
    w = pt("Feminine")(w)
    w = pt("Augmentative")(w)
    val len1 = w.length
    w = pt("Noun")(w)
    if (w.length == len1) {
      val len2 = w.length
      w = pt("Verb")(w)
      if (w.length == len2) w = pt("Vowel")(w)
    }
    fold(w, ptAccents)
  }
}
