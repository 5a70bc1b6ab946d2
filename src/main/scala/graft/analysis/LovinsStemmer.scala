package graft.analysis

/** Lovins stemmer (reference ext/LovinsStemmer.java; the published Lovins
  * 1968 algorithm as encoded by the public snowball lovins script): one
  * pass removes the LONGEST of 294 endings whose contextual condition
  * holds on the remaining stem — Snowball's among-with-routines semantics
  * fall back to the next shorter ending when a condition fails — then a
  * final double consonant is undoubled and one of 34 respell rules fixes
  * the tail. Verified against the reference golden vocabulary
  * (TestSnowballVocabData lovins). */
object LovinsStemmer {

  // (ending, condition-code); among order from the published table
  private val endings: Array[(String, String)] = Array(
    ("s'", "A"), ("a", "A"), ("ia", "A"), ("ata", "A"),
    ("ic", "A"), ("aic", "A"), ("allic", "BB"), ("aric", "A"),
    ("atic", "B"), ("itic", "H"), ("antic", "C"), ("istic", "A"),
    ("alistic", "B"), ("aristic", "A"), ("ivistic", "A"), ("ed", "E"),
    ("anced", "B"), ("enced", "A"), ("ished", "A"), ("ied", "A"),
    ("ened", "E"), ("ioned", "A"), ("ated", "I"), ("ented", "C"),
    ("ized", "F"), ("arized", "A"), ("oid", "A"), ("aroid", "A"),
    ("hood", "A"), ("ehood", "A"), ("ihood", "A"), ("elihood", "E"),
    ("ward", "A"), ("e", "A"), ("ae", "A"), ("ance", "B"),
    ("icance", "A"), ("ence", "A"), ("ide", "L"), ("icide", "A"),
    ("otide", "A"), ("age", "B"), ("able", "A"), ("atable", "A"),
    ("izable", "E"), ("arizable", "A"), ("ible", "A"), ("encible", "A"),
    ("ene", "E"), ("ine", "M"), ("idine", "I"), ("one", "R"),
    ("ature", "E"), ("eature", "Z"), ("ese", "A"), ("wise", "A"),
    ("ate", "A"), ("entiate", "A"), ("inate", "A"), ("ionate", "D"),
    ("ite", "AA"), ("ive", "A"), ("ative", "A"), ("ize", "F"),
    ("alize", "A"), ("icalize", "A"), ("ialize", "A"), ("entialize", "A"),
    ("ionalize", "A"), ("arize", "A"), ("ing", "N"), ("ancing", "B"),
    ("encing", "A"), ("aging", "B"), ("ening", "E"), ("ioning", "A"),
    ("ating", "I"), ("enting", "C"), ("ying", "B"), ("izing", "F"),
    ("arizing", "A"), ("ish", "C"), ("yish", "A"), ("i", "A"),
    ("al", "BB"), ("ical", "A"), ("aical", "A"), ("istical", "A"),
    ("oidal", "A"), ("eal", "Y"), ("ial", "A"), ("ancial", "A"),
    ("arial", "A"), ("ential", "A"), ("ional", "A"), ("ational", "B"),
    ("izational", "A"), ("ental", "A"), ("ful", "A"), ("eful", "A"),
    ("iful", "A"), ("yl", "R"), ("ism", "B"), ("icism", "A"),
    ("oidism", "A"), ("alism", "B"), ("icalism", "A"), ("ionalism", "A"),
    ("inism", "J"), ("ativism", "A"), ("um", "U"), ("ium", "A"),
    ("ian", "A"), ("ician", "A"), ("en", "F"), ("ogen", "A"),
    ("on", "S"), ("ion", "Q"), ("ation", "B"), ("ication", "G"),
    ("entiation", "A"), ("ination", "A"), ("isation", "A"), ("arisation", "A"),
    ("entation", "A"), ("ization", "F"), ("arization", "A"), ("action", "G"),
    ("o", "A"), ("ar", "X"), ("ear", "Y"), ("ier", "A"),
    ("ariser", "A"), ("izer", "F"), ("arizer", "A"), ("or", "T"),
    ("ator", "A"), ("s", "W"), ("'s", "A"), ("as", "B"),
    ("ics", "A"), ("istics", "A"), ("es", "E"), ("ances", "B"),
    ("ences", "A"), ("ides", "L"), ("oides", "A"), ("ages", "B"),
    ("ies", "P"), ("acies", "A"), ("ancies", "A"), ("encies", "A"),
    ("aries", "A"), ("ities", "A"), ("alities", "A"), ("ivities", "A"),
    ("ines", "M"), ("nesses", "A"), ("ates", "A"), ("atives", "A"),
    ("ings", "N"), ("is", "A"), ("als", "BB"), ("ials", "A"),
    ("entials", "A"), ("ionals", "A"), ("isms", "B"), ("ians", "A"),
    ("icians", "A"), ("ions", "B"), ("ations", "B"), ("arisations", "A"),
    ("entations", "A"), ("izations", "A"), ("arizations", "A"), ("ars", "O"),
    ("iers", "A"), ("izers", "F"), ("ators", "A"), ("less", "A"),
    ("eless", "A"), ("ness", "A"), ("eness", "E"), ("ableness", "A"),
    ("eableness", "E"), ("ibleness", "A"), ("ateness", "A"), ("iteness", "A"),
    ("iveness", "A"), ("ativeness", "A"), ("ingness", "A"), ("ishness", "A"),
    ("iness", "A"), ("ariness", "E"), ("alness", "A"), ("icalness", "A"),
    ("antialness", "A"), ("entialness", "A"), ("ionalness", "A"), ("fulness", "A"),
    ("lessness", "A"), ("ousness", "A"), ("eousness", "A"), ("iousness", "A"),
    ("itousness", "A"), ("entness", "A"), ("ants", "B"), ("ists", "A"),
    ("icists", "A"), ("us", "V"), ("ous", "A"), ("eous", "A"),
    ("aceous", "A"), ("antaneous", "A"), ("ious", "A"), ("acious", "B"),
    ("itous", "A"), ("ant", "B"), ("icant", "A"), ("ent", "C"),
    ("ement", "A"), ("izement", "A"), ("ist", "A"), ("icist", "A"),
    ("alist", "A"), ("icalist", "A"), ("ialist", "A"), ("ionist", "A"),
    ("entist", "A"), ("y", "B"), ("acy", "A"), ("ancy", "B"),
    ("ency", "A"), ("ly", "B"), ("ealy", "Y"), ("ably", "A"),
    ("ibly", "A"), ("edly", "E"), ("iedly", "A"), ("ely", "E"),
    ("ately", "A"), ("ively", "A"), ("atively", "A"), ("ingly", "B"),
    ("atingly", "A"), ("ily", "A"), ("lily", "A"), ("arily", "A"),
    ("ally", "B"), ("ically", "A"), ("aically", "A"), ("allically", "C"),
    ("istically", "A"), ("alistically", "B"), ("oidally", "A"), ("ially", "A"),
    ("entially", "A"), ("ionally", "A"), ("ationally", "B"), ("izationally", "B"),
    ("entally", "A"), ("fully", "A"), ("efully", "A"), ("ifully", "A"),
    ("enly", "E"), ("arly", "K"), ("early", "Y"), ("lessly", "A"),
    ("ously", "A"), ("eously", "A"), ("iously", "A"), ("ently", "A"),
    ("ary", "F"), ("ery", "E"), ("icianry", "A"), ("atory", "A"),
    ("ity", "A"), ("acity", "A"), ("icity", "A"), ("eity", "A"),
    ("ality", "A"), ("icality", "A"), ("iality", "A"), ("antiality", "A"),
    ("entiality", "A"), ("ionality", "A"), ("elity", "A"), ("ability", "A"),
    ("izability", "A"), ("arizability", "A"), ("ibility", "A"), ("inity", "CC"),
    ("arity", "B"), ("ivity", "A"))

  // candidates sorted longest-first for the fallback scan
  private val byLength: Array[(String, String)] =
    endings.sortBy(-_._1.length)

  private val doubles = Array("bb", "dd", "gg", "ll", "mm", "nn", "pp",
    "rr", "ss", "tt")

  /** Contextual conditions (Lovins table, letters A..CC): `s` is the stem
    * remaining after removing the candidate ending. */
  private def cond(code: String, s: String): Boolean = {
    val n = s.length
    @inline def last = s(n - 1)
    code match {
      case "A" => n >= 2
      case "B" => n >= 3
      case "C" => n >= 4
      case "D" => n >= 5
      case "E" => n >= 2 && last != 'e'
      case "F" => n >= 3 && last != 'e'
      case "G" => n >= 3 && last == 'f'
      case "H" => n >= 2 && (last == 't' || s.endsWith("ll"))
      case "I" => n >= 2 && last != 'o' && last != 'e'
      case "J" => n >= 2 && last != 'a' && last != 'e'
      case "K" => n >= 3 && (last == 'l' || last == 'i' ||
        (last == 'e' && s(n - 3) == 'u'))
      case "L" => n >= 2 && last != 'u' && last != 'x' &&
        (last != 's' || s(n - 2) == 'o')
      case "M" => n >= 2 && last != 'a' && last != 'c' && last != 'e' &&
        last != 'm'
      case "N" => n >= 3 && (s(n - 3) != 's' || n >= 4)
      case "O" => n >= 2 && (last == 'l' || last == 'i')
      case "P" => n >= 2 && last != 'c'
      case "Q" => n >= 3 && last != 'l' && last != 'n'
      case "R" => n >= 2 && (last == 'n' || last == 'r')
      case "S" => n >= 2 && (s.endsWith("dr") ||
        (last == 't' && !s.endsWith("tt")))
      case "T" => n >= 2 && (last == 's' ||
        (last == 't' && s(n - 2) != 'o'))
      case "U" => n >= 2 && (last == 'l' || last == 'm' || last == 'n' ||
        last == 'r')
      case "V" => n >= 2 && last == 'c'
      case "W" => n >= 2 && last != 's' && last != 'u'
      case "X" => n >= 2 && (last == 'l' || last == 'i' ||
        (last == 'e' && n >= 3 && s(n - 3) == 'u'))
      case "Y" => n >= 2 && s.endsWith("in")
      case "Z" => n >= 2 && last != 'f'
      case "AA" => n >= 2 && (last == 'd' || last == 'f' || last == 'l' ||
        last == 't' || s.endsWith("ph") || s.endsWith("th") ||
        s.endsWith("er") || s.endsWith("or") || s.endsWith("es"))
      case "BB" => n >= 3 && !s.endsWith("met") && !s.endsWith("ryst")
      case "CC" => n >= 2 && last == 'l'
      case _ => false
    }
  }

  // respell rules: (match, notPrecededBy, replacement); longest match,
  // no fallback (the inner condition failing removes nothing)
  private val respell: Array[(String, String, String)] = Array(
    ("uad", "", "uas"), ("vad", "", "vas"), ("cid", "", "cis"),
    ("lid", "", "lis"), ("erid", "", "eris"), ("pand", "", "pans"),
    ("end", "s", "ens"), ("ond", "", "ons"), ("lud", "", "lus"),
    ("rud", "", "rus"), ("ul", "aio", "l"), ("her", "pt", "hes"),
    ("metr", "", "meter"), ("istr", "", "ister"), ("urs", "", "ur"),
    ("uct", "", "uc"), ("et", "n", "es"), ("mit", "", "mis"),
    ("ent", "m", "ens"), ("umpt", "", "um"), ("rpt", "", "rb"),
    ("ert", "", "ers"), ("yt", "", "ys"), ("iev", "", "ief"),
    ("olv", "", "olut"), ("ax", "", "ac"), ("ex", "", "ec"),
    ("bex", "", "bic"), ("dex", "", "dic"), ("pex", "", "pic"),
    ("tex", "", "tic"), ("ix", "", "ic"), ("lux", "", "luc"),
    ("yz", "", "ys"))

  def stem(word: String): String = {
    var w = word.toLowerCase(java.util.Locale.ROOT)
    // endings: longest whose condition holds on the stem
    var i = 0
    var done = false
    while (!done && i < byLength.length) {
      val (suf, code) = byLength(i)
      if (w.endsWith(suf) && cond(code, w.substring(0, w.length - suf.length))) {
        w = w.substring(0, w.length - suf.length)
        done = true
      }
      i += 1
    }
    // undouble
    if (doubles.exists(w.endsWith)) w = w.substring(0, w.length - 1)
    // respell: longest matching rule; a not-preceded condition that fails
    // blocks the rule without fallback
    var best: (String, String, String) = null
    respell.foreach { r =>
      if ((best == null || r._1.length > best._1.length) && w.endsWith(r._1))
        best = r
    }
    if (best != null) {
      val at = w.length - best._1.length
      if (best._2.isEmpty || at == 0 || !best._2.contains(w(at - 1)))
        w = w.substring(0, at) + best._3
    }
    w
  }
}
