package graft.analysis

/** Phonetic encoders (reference surface: Solr PhoneticFilterFactory,
  * solr/core/src/java/org/apache/solr/analysis/... + lucene/analysis/
  * phonetic backed by commons-codec). */
object Phonetic {

  /** US-census Soundex code (the classic 4-char letter+3-digit form the
    * reference exposes via Solr's PhoneticFilterFactory + commons-codec
    * Soundex; algorithm is public — Knuth TAOCP vol. 3 §5.4): consonant
    * classes b f p v=1, c g j k q s x z=2, d t=3, l=4, m n=5, r=6;
    * adjacent same-code letters collapse; h/w are transparent between
    * same-code consonants; vowels reset; pad with zeros. Empty/non-letter
    * leading input returns "" (filter passes the token through). */
  def soundex(w: String): String = {
    var i = 0
    while (i < w.length && !w.charAt(i).isLetter) i += 1
    if (i == w.length) return ""
    @inline def code(c: Char): Int = c match {
      case 'b' | 'f' | 'p' | 'v' => 1
      case 'c' | 'g' | 'j' | 'k' | 'q' | 's' | 'x' | 'z' => 2
      case 'd' | 't' => 3
      case 'l' => 4
      case 'm' | 'n' => 5
      case 'r' => 6
      case _ => 0 // vowels + h/w/y
    }
    val sb = new java.lang.StringBuilder(4)
    val first = Character.toLowerCase(w.charAt(i))
    sb.append(Character.toUpperCase(first))
    var last = code(first)
    i += 1
    while (i < w.length && sb.length < 4) {
      val c = Character.toLowerCase(w.charAt(i))
      val k = code(c)
      if (k > 0 && k != last) { sb.append(k); last = k }
      else if (c != 'h' && c != 'w') last = k // vowel (incl. y) resets
      i += 1
    }
    while (sb.length < 4) sb.append('0')
    sb.toString
  }

  // ------------------------------------------------------------------
  // commons-codec-backed filters. The reference's BeiderMorseFilter,
  // DaitchMokotoffSoundexFilter and PhoneticFilter (lucene/analysis/
  // phonetic/src/java/.../BeiderMorseFilter.java:37,
  // DaitchMokotoffSoundexFilter.java:37, PhoneticFilter.java:35) are
  // thin TokenFilters over org.apache.commons.codec.language — the same
  // library on Spark's own classpath — so these use the identical
  // engine and carry only the filter semantics (alternate extraction,
  // same-position injection, pass-through rules).
  // ------------------------------------------------------------------

  import org.apache.commons.codec.language.bm.{Languages, NameType, PhoneticEngine, RuleType}

  // PhoneticEngine is immutable/thread-safe; one per JVM
  @transient private lazy val bmExact =
    new PhoneticEngine(NameType.GENERIC, RuleType.EXACT, true)
  @transient private lazy val bmApprox =
    new PhoneticEngine(NameType.GENERIC, RuleType.APPROX, true)
  @transient private lazy val dmEncoder =
    new org.apache.commons.codec.language.DaitchMokotoffSoundex()

  private val bmTokenRe = "[^()|-]+".r
  private val dmTokenRe = "[^|]+".r

  /** Beider-Morse alternates of one token, in BeiderMorseFilter order:
    * the maximal `[^()|-]+` runs of the engine encoding; a token whose
    * encoding yields none (e.g. digits) passes through unchanged. */
  def beiderMorse(term: String, exact: Boolean = true,
                  languages: Set[String] = Set.empty): Seq[String] = {
    val engine = if (exact) bmExact else bmApprox
    val encoded =
      if (languages.isEmpty) engine.encode(term)
      else {
        val js = new java.util.HashSet[String]()
        languages.foreach(js.add)
        engine.encode(term, Languages.LanguageSet.from(js))
      }
    val alts = bmTokenRe.findAllIn(encoded).toVector
    if (alts.isEmpty) Vector(term) else alts
  }

  /** Daitch-Mokotoff Soundex codes of one token (`[^|]+` runs of the
    * branching encoder output). Empty input passes through. */
  def dmSoundex(term: String): Seq[String] = {
    if (term.isEmpty) return Vector(term)
    val alts = dmTokenRe.findAllIn(dmEncoder.soundex(term)).toVector
    if (alts.isEmpty) Vector(term) else alts
  }

  /** BeiderMorseFilter over a flat token stream: each token is replaced
    * by its alternates, all at the token's original position (the filter
    * emits the first alternate with the original posInc and the rest at
    * posInc=0). */
  def beiderMorseFlat(terms: Array[String], positions: Array[Int],
                      exact: Boolean = true,
                      languages: Set[String] = Set.empty)
      : (Array[String], Array[Int]) = {
    val t = Array.newBuilder[String]
    val p = Array.newBuilder[Int]
    var i = 0
    while (i < terms.length) {
      beiderMorse(terms(i), exact, languages).foreach { a =>
        t += a; p += positions(i)
      }
      i += 1
    }
    (t.result(), p.result())
  }

  /** DaitchMokotoffSoundexFilter over a flat stream. inject=true keeps
    * the original token first with the codes behind it at the same
    * position; inject=false replaces it with the codes. */
  def dmSoundexFlat(terms: Array[String], positions: Array[Int],
                    inject: Boolean): (Array[String], Array[Int]) = {
    val t = Array.newBuilder[String]
    val p = Array.newBuilder[Int]
    var i = 0
    while (i < terms.length) {
      if (inject) { t += terms(i); p += positions(i) }
      val codes = dmTokenRe.findAllIn(dmEncoder.soundex(terms(i))).toVector
      if (codes.isEmpty && !inject) { t += terms(i); p += positions(i) }
      else codes.foreach { c => t += c; p += positions(i) }
      i += 1
    }
    (t.result(), p.result())
  }

  /** Generic PhoneticFilter over a flat stream (reference
    * PhoneticFilter.java): encode each token with a named commons-codec
    * encoder; inject=true emits the code then the original at the same
    * position; an encoding that is empty, fails, or equals the input
    * leaves the original token alone. Encoder names follow Solr's
    * PhoneticFilterFactory registry. */
  def phoneticFlat(terms: Array[String], positions: Array[Int],
                   encoder: String, inject: Boolean)
      : (Array[String], Array[Int]) = {
    val enc: String => String = encoderByName(encoder)
    val t = Array.newBuilder[String]
    val p = Array.newBuilder[Int]
    var i = 0
    while (i < terms.length) {
      val w = terms(i)
      val code =
        try {
          val v = enc(w)
          if (v.nonEmpty && v != w) v else null
        } catch { case _: Exception => null }
      if (code == null) { t += w; p += positions(i) }
      else {
        t += code; p += positions(i)
        if (inject) { t += w; p += positions(i) }
      }
      i += 1
    }
    (t.result(), p.result())
  }

  /** Solr PhoneticFilterFactory encoder registry (the commons-codec
    * encoders the reference factory accepts). */
  def encoderByName(name: String): String => String = {
    import org.apache.commons.codec.language._
    name.toLowerCase(java.util.Locale.ROOT) match {
      case "metaphone" =>
        val e = new Metaphone(); w => e.encode(w)
      case "doublemetaphone" =>
        val e = new DoubleMetaphone(); w => e.encode(w)
      case "soundex" =>
        val e = new Soundex(); w => e.encode(w)
      case "refinedsoundex" =>
        val e = new RefinedSoundex(); w => e.encode(w)
      case "caverphone" | "caverphone2" =>
        val e = new Caverphone2(); w => e.encode(w)
      case "caverphone1" =>
        val e = new Caverphone1(); w => e.encode(w)
      case "colognephonetic" =>
        val e = new ColognePhonetic(); w => e.encode(w)
      case "nysiis" =>
        val e = new Nysiis(); w => e.encode(w)
      case other => sys.error(s"unknown phonetic encoder: $other")
    }
  }
}
