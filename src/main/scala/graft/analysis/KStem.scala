package graft.analysis

/** KStem — Bob Krovetz' morphological stemmer (Krovetz, "Viewing
  * Morphology as an Inference Process", SIGIR 1993): inflectional and
  * derivational endings are removed ONLY when the candidate root (or a
  * productive transform of it) is found in a built-in head-word
  * dictionary, so `memorial` stays and `memorize` -> `memorize` while
  * `aging` -> `age`. This is the reference's other English stemmer
  * (Solr KStemFilterFactory).
  *
  * Reference semantics:
  * lucene/analysis/common/src/java/org/apache/lucene/analysis/en/KStemmer.java:71-1521
  * (rule order: plural, past tense, aspect, -ity, -ness, -ion, -er/-or,
  * -ly, -al, dictionary check, -ive, -ize, -ment, -ble, -ism, -ic,
  * -ncy, -nce; each rule tries candidates against the dictionary and
  * first match wins). Dictionary data (head words, exceptions, direct
  * conflations incl. nationalities) is the reference's public word-list
  * data (KStemData1-8), loaded from resources. Pinned by the reference's
  * own 12,130-pair golden file (kstem_examples.txt) in KStemSpec.
  *
  * Mutable single-word state -> one instance per thread (ThreadLocal in
  * [[KStem.stem]]); safe inside Spark task threads.
  */
object KStem {

  private val MaxWordLen = 50

  final case class Entry(root: String, exception: Boolean)

  private[analysis] val dict: java.util.HashMap[String, Entry] = {
    val d = new java.util.HashMap[String, Entry](40000)
    def res(name: String) = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(s"/graft/kstem/$name"), "UTF-8")
    for (w <- res("exceptions.txt").getLines())
      d.put(w, Entry(w, exception = true))
    for (line <- res("conflations.txt").getLines()) {
      val Array(w, root) = line.split('\t')
      d.put(w, Entry(root, exception = false))
    }
    val default = Entry(null, exception = false)
    for (w <- res("dict.txt").getLines())
      if (!d.containsKey(w)) d.put(w, default)
    d
  }

  private val impl = ThreadLocal.withInitial[Impl](() => new Impl)

  /** Stem one lowercase term (non [a-z] terms pass through unchanged,
    * like the reference filter before a required LowerCaseFilter). */
  def stem(term: String): String = impl.get.stem(term)

  private final class Impl {
    private val word = new java.lang.StringBuilder(64)
    private var j = 0 // index of final letter in stem (within word)
    private var k = 0 // index of final letter in word
    private var matchedEntry: Entry = _

    private def wordLength = k + 1
    private def stemLength = j + 1

    private def isCons(i: Int): Boolean = {
      val ch = word.charAt(i)
      if (ch == 'a' || ch == 'e' || ch == 'i' || ch == 'o' || ch == 'u') false
      else if (ch != 'y' || i == 0) true
      else !isCons(i - 1)
    }
    private def isVowel(i: Int) = !isCons(i)

    private def endsIn(s: String): Boolean = {
      if (s.length > k) return false
      val r = word.length - s.length
      j = k
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) != word.charAt(r + i)) return false
        i += 1
      }
      j = r - 1
      true
    }
    private def endsIn2(a: Char, b: Char): Boolean =
      if (2 > k) false
      else if (word.charAt(k - 1) == a && word.charAt(k) == b) { j = k - 2; true }
      else false
    private def endsIn3(a: Char, b: Char, c: Char): Boolean =
      if (3 > k) false
      else if (word.charAt(k - 2) == a && word.charAt(k - 1) == b &&
        word.charAt(k) == c) { j = k - 3; true }
      else false
    private def endsIn4(a: Char, b: Char, c: Char, d: Char): Boolean =
      if (4 > k) false
      else if (word.charAt(k - 3) == a && word.charAt(k - 2) == b &&
        word.charAt(k - 1) == c && word.charAt(k) == d) { j = k - 4; true }
      else false

    private def setLength(n: Int): Unit = word.setLength(n)
    private def write(c: Char): Unit = word.append(c)
    private def append(s: String): Unit = word.append(s)
    private def setCharAt(i: Int, c: Char): Unit = word.setCharAt(i, c)

    /** replace the current suffix (chars after j) with s */
    private def setSuffix(s: String): Unit = {
      setLength(j + 1); append(s); k = j + s.length
    }

    private def lookup(): Boolean = {
      matchedEntry = dict.get(word.toString)
      matchedEntry != null
    }
    private def matched = matchedEntry != null

    private def wordInDict(): Entry = {
      if (matchedEntry != null) return matchedEntry
      val e = dict.get(word.toString)
      if (e != null && !e.exception) matchedEntry = e // cache non-exceptions
      e
    }

    private def doubleC(i: Int): Boolean =
      i >= 1 && word.charAt(i) == word.charAt(i - 1) && isCons(i)

    private def vowelInStem: Boolean =
      (0 until stemLength).exists(isVowel)

    /* plurals to singular, -ies -> y */
    private def plural(): Unit = {
      if (word.charAt(k) != 's') return
      if (endsIn3('i', 'e', 's')) {
        setLength(j + 3); k -= 1
        if (lookup()) return // calories -> calorie
        k += 1; write('s')
        setSuffix("y"); lookup(); ()
      } else if (endsIn2('e', 's')) {
        setLength(j + 2); k -= 1 // try just removing the "s"
        // exceptions are NOT honored here (aides -> aide) but a double-s
        // root is refused (crosses must not become crosse)
        val tryE = j > 0 && !(word.charAt(j) == 's' && word.charAt(j - 1) == 's')
        if (tryE && lookup()) return
        setLength(j + 1); k -= 1 // try removing the "es"
        if (lookup()) return
        write('e'); k += 1 // default: retain the "e"
        if (!tryE) lookup()
        ()
      } else if (wordLength > 3 && word.charAt(k - 1) != 's' &&
        !endsIn3('o', 'u', 's')) {
        // not "-ous" / double s: drop the final "s"
        setLength(k); k -= 1; lookup(); ()
      }
    }

    /* past tense: -ed removal, -ied -> y */
    private def pastTense(): Unit = {
      if (wordLength <= 4) return // fled stays (direct conflation handles it)
      if (endsIn3('i', 'e', 'd')) {
        setLength(j + 3); k -= 1
        if (lookup()) return // died -> die
        k += 1; write('d')
        setSuffix("y"); lookup()
        return
      }
      if (endsIn2('e', 'd') && vowelInStem) {
        setLength(j + 2); k = j + 1 // root ending in 'e'?
        val entry = wordInDict()
        if (entry != null && !entry.exception) return
        setLength(j + 1); k = j // try removing the "ed"
        if (lookup()) return
        if (doubleC(k)) { // backfilled -> backfill, not backfille
          setLength(k); k -= 1
          if (lookup()) return
          write(word.charAt(k)); k += 1; lookup()
          return
        }
        if (word.charAt(0) == 'u' && word.charAt(1) == 'n') {
          write('e'); write('d'); k += 2 // un- prefix: leave the word alone
          return
        }
        setLength(j + 1); write('e'); k = j + 1 // microcoded -> microcode
      }
    }

    /* -ing endings */
    private def aspect(): Unit = {
      if (wordLength <= 5) return
      if (endsIn3('i', 'n', 'g') && vowelInStem) {
        setCharAt(j + 1, 'e'); setLength(j + 2); k = j + 1 // try stem + 'e'
        val entry = wordInDict()
        if (entry != null && !entry.exception) return
        setLength(k); k -= 1 // remove the 'e' (and 'ing')
        if (lookup()) return
        if (doubleC(k)) {
          k -= 1; setLength(k + 1)
          if (lookup()) return
          write(word.charAt(k)) // default: keep the consonant doubled
          k += 1; lookup()
          return
        }
        if (j > 0 && isCons(j) && isCons(j - 1)) {
          k = j; setLength(k + 1) // two consonants: no trailing 'e'
          return
        }
        setLength(j + 1); write('e'); k = j + 1 // microcoding -> microcode
      }
    }

    private def ityEndings(): Unit = {
      val oldK = k
      if (endsIn3('i', 't', 'y')) {
        setLength(j + 1); k = j // try just removing -ity
        if (lookup()) return
        write('e'); k = j + 1 // try -ity -> -e
        if (lookup()) return
        setCharAt(j + 1, 'i'); append("ty"); k = oldK // restore
        if (j > 0 && word.charAt(j - 1) == 'i' && word.charAt(j) == 'l') {
          setLength(j - 1); append("le"); k = j // -ability/-ibility -> -ble
          lookup(); return
        }
        if (j > 0 && word.charAt(j - 1) == 'i' && word.charAt(j) == 'v') {
          setLength(j + 1); write('e'); k = j + 1 // -ivity -> -ive
          lookup(); return
        }
        if (j > 0 && word.charAt(j - 1) == 'a' && word.charAt(j) == 'l') {
          setLength(j + 1); k = j // -ality: just drop it
          lookup(); return
        }
        if (lookup()) return // immunity -> immune, but capacity stays
        setLength(j + 1); k = j // default: remove -ity altogether
      }
    }

    private def nessEndings(): Unit = {
      if (endsIn4('n', 'e', 's', 's')) { // very productive: just accept
        setLength(j + 1); k = j
        if (word.charAt(j) == 'i') setCharAt(j, 'y')
        lookup(); ()
      }
    }

    private def ionEndings(): Unit = {
      val oldK = k
      if (!endsIn3('i', 'o', 'n')) return
      if (endsIn("ization")) { // -ize is productive: accept as root
        setLength(j + 3); write('e'); k = j + 3
        lookup(); return
      }
      if (endsIn("ition")) {
        setLength(j + 1); write('e'); k = j + 1
        if (lookup()) return // definition -> define
        setLength(j + 1); append("ition"); k = oldK // restore
      } else if (endsIn("ation")) {
        setLength(j + 3); write('e'); k = j + 3
        if (lookup()) return // elimination -> eliminate
        setLength(j + 1); write('e'); k = j + 1
        if (lookup()) return
        setLength(j + 1); k = j // resignation -> resign
        if (lookup()) return
        setLength(j + 1); append("ation"); k = oldK // restore
      }
      // -ication AFTER -ation (complication -> complicate, not comply)
      if (endsIn("ication")) {
        setLength(j + 1); write('y'); k = j + 1
        if (lookup()) return // amplification -> amplify
        setLength(j + 1); append("ication"); k = oldK // restore
      }
      j = k - 3 // plain -ion (already matched above)
      setLength(j + 1); write('e'); k = j + 1
      if (lookup()) return
      setLength(j + 1); k = j
      if (lookup()) return
      setLength(j + 1); append("ion"); k = oldK // restore
    }

    private def erAndOrEndings(): Unit = {
      val oldK = k
      if (word.charAt(k) != 'r') return
      if (endsIn4('i', 'z', 'e', 'r')) { // -ize is productive
        setLength(j + 4); k = j + 3
        lookup(); return
      }
      if (endsIn2('e', 'r') || endsIn2('o', 'r')) {
        val wordChar = word.charAt(j + 1) // remember -er vs -or
        if (doubleC(j)) {
          setLength(j); k = j - 1
          if (lookup()) return
          write(word.charAt(j - 1)) // restore the doubled consonant
        }
        if (word.charAt(j) == 'i') { // -ier
          setCharAt(j, 'y'); setLength(j + 1); k = j
          if (lookup()) return
          setCharAt(j, 'i'); write('e') // restore
        }
        if (word.charAt(j) == 'e') { // -eer
          setLength(j); k = j - 1
          if (lookup()) return
          write('e')
        }
        setLength(j + 2); k = j + 1 // remove the -r
        if (lookup()) return
        setLength(j + 1); k = j // remove -er/-or
        if (lookup()) return
        write('e'); k = j + 1 // -or -> -e
        if (lookup()) return
        setLength(j + 1); write(wordChar); write('r'); k = oldK // restore
      }
    }

    private def lyEndings(): Unit = {
      val oldK = k
      if (endsIn2('l', 'y')) {
        setCharAt(j + 2, 'e') // -ly -> -le
        if (lookup()) return
        setCharAt(j + 2, 'y')
        setLength(j + 1); k = j // just remove the -ly
        if (lookup()) return
        if (j > 0 && word.charAt(j - 1) == 'a' && word.charAt(j) == 'l')
          return // -ally always -> -al
        append("ly"); k = oldK // restore
        if (j > 0 && word.charAt(j - 1) == 'a' && word.charAt(j) == 'b') {
          setCharAt(j + 2, 'e'); k = j + 2 // -ably always -> -able
          return
        }
        if (word.charAt(j) == 'i') { // militarily -> military
          setLength(j); write('y'); k = j
          if (lookup()) return
          setLength(j); append("ily"); k = oldK // restore
        }
        setLength(j + 1); k = j // default: remove -ly
      }
    }

    private def alEndings(): Unit = {
      val oldK = k
      if (wordLength < 4) return
      if (endsIn2('a', 'l')) {
        setLength(j + 1); k = j // just remove the -al
        if (lookup()) return
        if (doubleC(j)) {
          setLength(j); k = j - 1
          if (lookup()) return
          write(word.charAt(j - 1)) // restore doubled consonant
        }
        setLength(j + 1); write('e'); k = j + 1 // -al -> -e
        if (lookup()) return
        setLength(j + 1); append("um"); k = j + 2 // optimal -> optimum
        if (lookup()) return
        setLength(j + 1); append("al"); k = oldK // restore
        if (j > 0 && word.charAt(j - 1) == 'i' && word.charAt(j) == 'c') {
          setLength(j - 1); k = j - 2 // remove -ical
          if (lookup()) return
          setLength(j - 1); write('y'); k = j - 1 // bibliographical -> -y
          if (lookup()) return
          setLength(j - 1); append("ic"); k = j // default: -ical -> -ic
          lookup(); return
        }
        if (word.charAt(j) == 'i') { // -ial removal
          setLength(j); k = j - 1
          if (lookup()) return
          append("ial"); k = oldK; lookup(); ()
        }
      }
    }

    private def iveEndings(): Unit = {
      val oldK = k
      if (endsIn3('i', 'v', 'e')) {
        setLength(j + 1); k = j // remove -ive entirely
        if (lookup()) return
        write('e'); k = j + 1 // -ive -> -e
        if (lookup()) return
        setLength(j + 1); append("ive") // restore
        if (j > 0 && word.charAt(j - 1) == 'a' && word.charAt(j) == 't') {
          setCharAt(j - 1, 'e'); setLength(j); k = j - 1 // -ative -> -e
          if (lookup()) return
          setLength(j - 1) // just remove -ative
          if (lookup()) return
          append("ative"); k = oldK // restore
        }
        setCharAt(j + 2, 'o'); setCharAt(j + 3, 'n') // -ive -> -ion
        if (lookup()) return
        setCharAt(j + 2, 'v'); setCharAt(j + 3, 'e'); k = oldK // restore
      }
    }

    private def izeEndings(): Unit = {
      val oldK = k
      if (endsIn3('i', 'z', 'e')) {
        setLength(j + 1); k = j // remove -ize entirely
        if (lookup()) return
        write('i')
        if (doubleC(j)) {
          setLength(j); k = j - 1
          if (lookup()) return
          write(word.charAt(j - 1))
        }
        setLength(j + 1); write('e'); k = j + 1 // -ize -> -e
        if (lookup()) return
        setLength(j + 1); append("ize"); k = oldK // restore
      }
    }

    private def mentEndings(): Unit = {
      val oldK = k
      if (endsIn4('m', 'e', 'n', 't')) {
        setLength(j + 1); k = j
        if (lookup()) return
        append("ment"); k = oldK // restore
      }
    }

    private def bleEndings(): Unit = {
      val oldK = k
      if (endsIn3('b', 'l', 'e')) {
        if (!(word.charAt(j) == 'a' || word.charAt(j) == 'i')) return
        val wordChar = word.charAt(j)
        setLength(j); k = j - 1 // just remove the ending
        if (lookup()) return
        if (doubleC(k)) {
          setLength(k); k -= 1
          if (lookup()) return
          k += 1; write(word.charAt(k - 1))
        }
        setLength(j); write('e'); k = j // -a/ible -> -e
        if (lookup()) return
        setLength(j); append("ate"); k = j + 2 // compensable -> compensate
        if (lookup()) return
        setLength(j); write(wordChar); append("ble"); k = oldK // restore
      }
    }

    private def ismEndings(): Unit = {
      if (endsIn3('i', 's', 'm')) { // very productive: just accept
        setLength(j + 1); k = j; lookup(); ()
      }
    }

    private def icEndings(): Unit = {
      if (endsIn2('i', 'c')) {
        setLength(j + 3); append("al"); k = j + 4 // canonic -> canonical
        if (lookup()) return
        setCharAt(j + 1, 'y'); setLength(j + 2); k = j + 1 // -ic -> -y
        if (lookup()) return
        setCharAt(j + 1, 'e') // -ic -> -e
        if (lookup()) return
        setLength(j + 1); k = j // remove -ic altogether
        if (lookup()) return
        append("ic"); k = j + 2 // restore
      }
    }

    private def ncyEndings(): Unit = {
      if (endsIn3('n', 'c', 'y')) {
        if (!(word.charAt(j) == 'e' || word.charAt(j) == 'a')) return
        setCharAt(j + 2, 't'); setLength(j + 3); k = j + 2 // -ncy -> -nt
        if (lookup()) return
        setCharAt(j + 2, 'c'); write('e'); k = j + 3 // default: -nce
        lookup(); ()
      }
    }

    private def nceEndings(): Unit = {
      val oldK = k
      if (endsIn3('n', 'c', 'e')) {
        val wordChar = word.charAt(j)
        if (!(wordChar == 'e' || wordChar == 'a')) return
        setLength(j); write('e'); k = j // adherance -> adhere
        if (lookup()) return
        setLength(j); k = j - 1 // disappearance -> disappear
        if (lookup()) return
        write(wordChar); append("nce"); k = oldK // restore
      }
    }

    def stem(term: String): String = {
      k = term.length - 1
      if (k <= 1 || k >= MaxWordLen - 1) return term
      val direct = dict.get(term)
      if (direct != null) return if (direct.root != null) direct.root else term
      var i = 0
      while (i < term.length) {
        val ch = term.charAt(i)
        if (ch < 'a' || ch > 'z') return term // lowercase alpha only
        i += 1
      }
      word.setLength(0); word.append(term)
      matchedEntry = null
      var done = false
      def step(f: () => Unit): Unit =
        if (!done) { f(); if (matched) done = true }
      step(() => plural())
      step(() => pastTense())
      step(() => aspect())
      step(() => ityEndings())
      step(() => nessEndings())
      step(() => ionEndings())
      step(() => erAndOrEndings())
      step(() => lyEndings())
      step(() => alEndings())
      if (!done) wordInDict() // cache a dictionary hit before -ive etc.
      step(() => iveEndings())
      step(() => izeEndings())
      step(() => mentEndings())
      step(() => bleEndings())
      step(() => ismEndings())
      step(() => icEndings())
      step(() => ncyEndings())
      if (!done) nceEndings()
      val e = matchedEntry
      if (e != null && e.root != null) e.root else word.toString
    }
  }
}
