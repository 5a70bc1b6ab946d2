package graft.analysis

/** The classic Caumanns German stemmer (reference
  * analysis/common/.../de/GermanStemmer.java — "A Fast and Simple
  * Stemming Algorithm for German Words", Jörg Caumanns; the stemmer
  * behind GermanStemFilter / Solr's GermanStemFilterFactory, distinct
  * from the light/minimal/snowball German chains).
  *
  * Faithful to the reference's exact behavior, INCLUDING its quirks —
  * the golden data.txt vectors depend on them:
  *  - `substCount =+ 2` in the "sch" masking branch ASSIGNS 2 (a
  *    typo for +=, shipped for years) — reproduced;
  *  - substitution masks (`sch/ch/ei/ie/ig/st` -> `$§%&#!`, double
  *    chars -> `*`) mutate the buffer mid-scan with the reference's
  *    index handling;
  *  - strip() length guards use buffer.length + substCount;
  *  - optimize() runs between strip and resubstitute, so the "erin*"
  *    check sees the masked form and z->x applies to the masked buffer.
  */
object GermanCaumanns {

  def stem(term0: String): String = {
    val term = term0.toLowerCase(java.util.Locale.GERMAN)
    if (!term.forall(Character.isLetter)) return term
    val sb = new java.lang.StringBuilder(term)
    val substCount = substitute(sb)
    val sc = new Counter(substCount)
    strip(sb, sc)
    optimize(sb, sc)
    resubstitute(sb)
    removeParticleDenotion(sb)
    sb.toString
  }

  private final class Counter(var n: Int)

  /** strip(): the seven base suffixes, context-free but for the length
    * guards (GermanStemmer.java:92-126). */
  private def strip(sb: java.lang.StringBuilder, sc: Counter): Unit = {
    var doMore = true
    while (doMore && sb.length > 3) {
      val len = sb.length
      if (len + sc.n > 5 && sb.substring(len - 2) == "nd")
        sb.delete(len - 2, len)
      else if (len + sc.n > 4 && sb.substring(len - 2) == "em")
        sb.delete(len - 2, len)
      else if (len + sc.n > 4 && sb.substring(len - 2) == "er")
        sb.delete(len - 2, len)
      else if (sb.charAt(len - 1) == 'e') sb.deleteCharAt(len - 1)
      else if (sb.charAt(len - 1) == 's') sb.deleteCharAt(len - 1)
      else if (sb.charAt(len - 1) == 'n') sb.deleteCharAt(len - 1)
      else if (sb.charAt(len - 1) == 't') sb.deleteCharAt(len - 1)
      else doMore = false
    }
  }

  /** optimize() (GermanStemmer.java:132-146). */
  private def optimize(sb: java.lang.StringBuilder, sc: Counter): Unit = {
    if (sb.length > 5 && sb.substring(sb.length - 5) == "erin*") {
      sb.deleteCharAt(sb.length - 1)
      strip(sb, sc)
    }
    if (sb.length > 0 && sb.charAt(sb.length - 1) == 'z')
      sb.setCharAt(sb.length - 1, 'x')
  }

  /** removeParticleDenotion() — drops the first "ge" of a "gege" run
    * (GermanStemmer.java:149-160). */
  private def removeParticleDenotion(sb: java.lang.StringBuilder): Unit =
    if (sb.length > 4) {
      var c = 0
      var done = false
      while (!done && c < sb.length - 3) {
        if (sb.substring(c, c + 4) == "gege") {
          sb.delete(c, c + 2)
          done = true
        }
        c += 1
      }
    }

  /** substitute() (GermanStemmer.java:171-233) — returns the FINAL
    * substCount, reproducing the `=+ 2` assignment in the sch branch. */
  private def substitute(sb: java.lang.StringBuilder): Int = {
    var substCount = 0
    var c = 0
    while (c < sb.length) {
      if (c > 0 && sb.charAt(c) == sb.charAt(c - 1))
        sb.setCharAt(c, '*')
      else if (sb.charAt(c) == 'ä') sb.setCharAt(c, 'a')
      else if (sb.charAt(c) == 'ö') sb.setCharAt(c, 'o')
      else if (sb.charAt(c) == 'ü') sb.setCharAt(c, 'u')
      else if (sb.charAt(c) == 'ß') {
        sb.setCharAt(c, 's')
        sb.insert(c + 1, 's')
        substCount += 1
      }
      if (c < sb.length - 1) {
        if (c < sb.length - 2 && sb.charAt(c) == 's' &&
          sb.charAt(c + 1) == 'c' && sb.charAt(c + 2) == 'h') {
          sb.setCharAt(c, '$')
          sb.delete(c + 1, c + 3)
          substCount = 2 // the reference's `substCount =+ 2` typo: ASSIGN
        } else if (sb.charAt(c) == 'c' && sb.charAt(c + 1) == 'h') {
          sb.setCharAt(c, '§'); sb.deleteCharAt(c + 1); substCount += 1
        } else if (sb.charAt(c) == 'e' && sb.charAt(c + 1) == 'i') {
          sb.setCharAt(c, '%'); sb.deleteCharAt(c + 1); substCount += 1
        } else if (sb.charAt(c) == 'i' && sb.charAt(c + 1) == 'e') {
          sb.setCharAt(c, '&'); sb.deleteCharAt(c + 1); substCount += 1
        } else if (sb.charAt(c) == 'i' && sb.charAt(c + 1) == 'g') {
          sb.setCharAt(c, '#'); sb.deleteCharAt(c + 1); substCount += 1
        } else if (sb.charAt(c) == 's' && sb.charAt(c + 1) == 't') {
          sb.setCharAt(c, '!'); sb.deleteCharAt(c + 1); substCount += 1
        }
      }
      c += 1
    }
    substCount
  }

  /** resubstitute() (GermanStemmer.java:239-270). */
  private def resubstitute(sb: java.lang.StringBuilder): Unit = {
    var c = 0
    while (c < sb.length) {
      sb.charAt(c) match {
        case '*' => sb.setCharAt(c, sb.charAt(c - 1))
        case '$' => sb.setCharAt(c, 's'); sb.insert(c + 1, "ch")
        case '§' => sb.setCharAt(c, 'c'); sb.insert(c + 1, 'h')
        case '%' => sb.setCharAt(c, 'e'); sb.insert(c + 1, 'i')
        case '&' => sb.setCharAt(c, 'i'); sb.insert(c + 1, 'e')
        case '#' => sb.setCharAt(c, 'i'); sb.insert(c + 1, 'g')
        case '!' => sb.setCharAt(c, 's'); sb.insert(c + 1, 't')
        case _ =>
      }
      c += 1
    }
  }
}
