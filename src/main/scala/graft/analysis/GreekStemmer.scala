package graft.analysis

/** Greek stemmer (reference analysis/common/.../el/GreekStemmer.java —
  * Georgios Ntais' published algorithm, "Development of a Stemmer for the
  * Greek Language", KTH 2006, with the reference's extensions) plus the
  * GreekLowerCaseFilter.java normalization (final sigma + tonos/dialytika
  * folding). Operates on lowercase Greek; words < 4 chars pass through.
  *
  * Structure: 21 "short" rules each strip one inflectional family and may
  * re-add a protected stem fragment via exception lists; the "long list"
  * (rule 21) fires only when nothing else did; rule 22 strips comparative
  * superlatives last. */
object GreekStemmer {

  /** GreekLowerCaseFilter.java: lowercase + fold final sigma to sigma +
    * strip tonos/dialytika from vowels. */
  def lowerCase(w: String): String = {
    val sb = new java.lang.StringBuilder(w.length)
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      val m: Char = c match {
        case 'ς' => 'σ' // final sigma -> sigma
        case 'Ά' | 'ά' => 'α' // alpha
        case 'Έ' | 'έ' => 'ε' // epsilon
        case 'Ή' | 'ή' => 'η' // eta
        case 'Ί' | 'Ϊ' | 'ί' | 'ϊ' | 'ΐ' =>
          'ι' // iota
        case 'Ύ' | 'Ϋ' | 'ύ' | 'ϋ' | 'ΰ' =>
          'υ' // upsilon
        case 'Ό' | 'ό' => 'ο' // omicron
        case 'Ώ' | 'ώ' => 'ω' // omega
        case '΢' => 'ς' // reserved (back-compat)
        case other => Character.toLowerCase(other)
      }
      sb.append(m)
      i += 1
    }
    sb.toString
  }

  @inline private def ends(s: Array[Char], len: Int, suf: String): Boolean = {
    val m = suf.length
    if (m > len) return false
    var i = 0
    while (i < m) {
      if (s(len - m + i) != suf.charAt(i)) return false
      i += 1
    }
    true
  }

  @inline private def stemIs(s: Array[Char], len: Int,
                             set: Set[String]): Boolean =
    set.contains(new String(s, 0, len))

  @inline private def vowel(s: Array[Char], len: Int): Boolean =
    len > 0 && ("αεηιουω".indexOf(s(len - 1).toInt) >= 0)

  @inline private def vowelNoY(s: Array[Char], len: Int): Boolean =
    len > 0 && ("αεηιοω".indexOf(s(len - 1).toInt) >= 0)

  def stem(w0: String): String = {
    if (w0.length < 4) return w0
    val s = new Array[Char](w0.length + 8) // rules re-add up to 5 chars
    w0.getChars(0, w0.length, s, 0)
    var len = w0.length
    val origLen = len
    len = rule0(s, len); len = rule1(s, len); len = rule2(s, len)
    len = rule3(s, len); len = rule4(s, len); len = rule5(s, len)
    len = rule6(s, len); len = rule7(s, len); len = rule8(s, len)
    len = rule9(s, len); len = rule10(s, len); len = rule11(s, len)
    len = rule12(s, len); len = rule13(s, len); len = rule14(s, len)
    len = rule15(s, len); len = rule16(s, len); len = rule17(s, len)
    len = rule18(s, len); len = rule19(s, len); len = rule20(s, len)
    if (len == origLen) len = rule21(s, len)
    len = rule22(s, len)
    if (len == w0.length) w0 else new String(s, 0, len)
  }

  private def rule0(s: Array[Char], len0: Int): Int = {
    val len = len0
    if (len > 9 && (ends(s, len, "καθεστωτοσ") || ends(s, len, "καθεστωτων")))
      return len - 4
    if (len > 8 && (ends(s, len, "γεγονοτοσ") || ends(s, len, "γεγονοτων")))
      return len - 4
    if (len > 8 && ends(s, len, "καθεστωτα")) return len - 3
    if (len > 7 && (ends(s, len, "τατογιου") || ends(s, len, "τατογιων")))
      return len - 4
    if (len > 7 && ends(s, len, "γεγονοτα")) return len - 3
    if (len > 7 && ends(s, len, "καθεστωσ")) return len - 2
    // NB the reference's own parenthesization: the first alternative is
    // guarded by len>6, the rest of the ||-chain is not (Java operator
    // precedence bug preserved verbatim for parity)
    if (len > 6 && (ends(s, len, "σκαγιου")) || ends(s, len, "σκαγιων") ||
        ends(s, len, "ολογιου") || ends(s, len, "ολογιων") ||
        ends(s, len, "κρεατοσ") || ends(s, len, "κρεατων") ||
        ends(s, len, "περατοσ") || ends(s, len, "περατων") ||
        ends(s, len, "τερατοσ") || ends(s, len, "τερατων")) return len - 4
    if (len > 6 && ends(s, len, "τατογια")) return len - 3
    if (len > 6 && ends(s, len, "γεγονοσ")) return len - 2
    if (len > 5 && (ends(s, len, "φαγιου") || ends(s, len, "φαγιων") ||
        ends(s, len, "σογιου") || ends(s, len, "σογιων"))) return len - 4
    if (len > 5 && (ends(s, len, "σκαγια") || ends(s, len, "ολογια") ||
        ends(s, len, "κρεατα") || ends(s, len, "περατα") ||
        ends(s, len, "τερατα"))) return len - 3
    if (len > 4 && (ends(s, len, "φαγια") || ends(s, len, "σογια") ||
        ends(s, len, "φωτοσ") || ends(s, len, "φωτων"))) return len - 3
    if (len > 4 && (ends(s, len, "κρεασ") || ends(s, len, "περασ") ||
        ends(s, len, "τερασ"))) return len - 2
    if (len > 3 && ends(s, len, "φωτα")) return len - 2
    if (len > 2 && ends(s, len, "φωσ")) return len - 1
    len
  }

  private def rule1(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 4 && (ends(s, len, "αδεσ") || ends(s, len, "αδων"))) {
      len -= 4
      if (!(ends(s, len, "οκ") || ends(s, len, "μαμ") || ends(s, len, "μαν") ||
        ends(s, len, "μπαμπ") || ends(s, len, "πατερ") ||
        ends(s, len, "γιαγι") || ends(s, len, "νταντ") ||
        ends(s, len, "κυρ") || ends(s, len, "θει") || ends(s, len, "πεθερ")))
        len += 2 // add back -αδ
    }
    len
  }

  private def rule2(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 4 && (ends(s, len, "εδεσ") || ends(s, len, "εδων"))) {
      len -= 4
      if (ends(s, len, "οπ") || ends(s, len, "ιπ") || ends(s, len, "εμπ") ||
        ends(s, len, "υπ") || ends(s, len, "γηπ") || ends(s, len, "δαπ") ||
        ends(s, len, "κρασπ") || ends(s, len, "μιλ"))
        len += 2 // add back -εδ
    }
    len
  }

  private def rule3(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 5 && (ends(s, len, "ουδεσ") || ends(s, len, "ουδων"))) {
      len -= 5
      if (ends(s, len, "αρκ") || ends(s, len, "καλιακ") ||
        ends(s, len, "πεταλ") || ends(s, len, "λιχ") ||
        ends(s, len, "πλεξ") || ends(s, len, "σκ") || ends(s, len, "σ") ||
        ends(s, len, "φλ") || ends(s, len, "φρ") || ends(s, len, "βελ") ||
        ends(s, len, "λουλ") || ends(s, len, "χν") || ends(s, len, "σπ") ||
        ends(s, len, "τραγ") || ends(s, len, "φε"))
        len += 3 // add back -ουδ
    }
    len
  }

  private val exc4 = Set("θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ")

  private def rule4(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 3 && (ends(s, len, "εωσ") || ends(s, len, "εων"))) {
      len -= 3
      if (stemIs(s, len, exc4)) len += 1 // add back -ε
    }
    len
  }

  private def rule5(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 2 && ends(s, len, "ια")) {
      len -= 2
      if (vowel(s, len)) len += 1 // add back -ι
    } else if (len > 3 && (ends(s, len, "ιου") || ends(s, len, "ιων"))) {
      len -= 3
      if (vowel(s, len)) len += 1
    }
    len
  }

  private val exc6 = Set("αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ",
    "αντιδ", "φυσ", "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ",
    "μουλ", "μπαν", "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ",
    "πετσ", "πιτσ", "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ",
    "συναδ", "τσαμ", "υποδ", "φιλον", "φυλοδ", "χασ")

  private def rule6(s: Array[Char], len0: Int): Int = {
    var len = len0
    var removed = false
    if (len > 3 && (ends(s, len, "ικα") || ends(s, len, "ικο"))) {
      len -= 3; removed = true
    } else if (len > 4 && (ends(s, len, "ικου") || ends(s, len, "ικων"))) {
      len -= 4; removed = true
    }
    if (removed && (vowel(s, len) || stemIs(s, len, exc6)))
      len += 2 // add back -ικ
    len
  }

  private val exc7 = Set("αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ",
    "ουλ", "πεθ", "πικρ", "ποτ", "σιχ", "χ")

  private def rule7(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len == 5 && ends(s, len, "αγαμε")) return len - 1
    if (len > 7 && ends(s, len, "ηθηκαμε")) len -= 7
    else if (len > 6 && ends(s, len, "ουσαμε")) len -= 6
    else if (len > 5 && (ends(s, len, "αγαμε") || ends(s, len, "ησαμε") ||
      ends(s, len, "ηκαμε"))) len -= 5
    if (len > 3 && ends(s, len, "αμε")) {
      len -= 3
      if (stemIs(s, len, exc7)) len += 2 // add back -αμ
    }
    len
  }

  private val exc8a = Set("τρ", "τσ")
  private val exc8b = Set("βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ",
    "καλπουζ", "καστελ", "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν",
    "ουλ", "π", "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ",
    "τσαρλατ", "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ",
    "γαλ", "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ",
    "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ",
    "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ",
    "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ",
    "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ",
    "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ",
    "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ", "περιτρ",
    "πλατ", "πολυδαπ", "πολυμηχ", "στεφ", "ταβ", "τετ", "υπερηφ", "υποκοπ",
    "χαμηλοδαπ", "ψηλοταβ")

  private def rule8(s: Array[Char], len0: Int): Int = {
    var len = len0
    var removed = false
    // Java operator-precedence quirks preserved: only the FIRST
    // alternative of each chain is guarded by the len test
    if (len > 8 && ends(s, len, "ιουντανε")) { len -= 8; removed = true }
    else if (len > 7 && ends(s, len, "ιοντανε") || ends(s, len, "ουντανε") ||
      ends(s, len, "ηθηκανε")) { len -= 7; removed = true }
    else if (len > 6 && ends(s, len, "ιοτανε") || ends(s, len, "οντανε") ||
      ends(s, len, "ουσανε")) { len -= 6; removed = true }
    else if (len > 5 && ends(s, len, "αγανε") || ends(s, len, "ησανε") ||
      ends(s, len, "οτανε") || ends(s, len, "ηκανε")) {
      len -= 5; removed = true
    }
    if (removed && stemIs(s, len, exc8a)) {
      len += 4
      s(len - 4) = 'α'; s(len - 3) = 'γ'; s(len - 2) = 'α'; s(len - 1) = 'ν'
    }
    if (len > 3 && ends(s, len, "ανε")) {
      len -= 3
      if (vowelNoY(s, len) || stemIs(s, len, exc8b)) len += 2 // -αν
    }
    len
  }

  private val exc9 = Set("αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν",
    "απλ", "βαρον", "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ", "παρακαλ",
    "σερπ", "σκελ", "συρφ", "τοκ", "υ", "δ", "εμ", "θαρρ", "θ")

  private def rule9(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 5 && ends(s, len, "ησετε")) len -= 5
    if (len > 3 && ends(s, len, "ετε")) {
      len -= 3
      if (stemIs(s, len, exc9) || vowelNoY(s, len) ||
        ends(s, len, "οδ") || ends(s, len, "αιρ") || ends(s, len, "φορ") ||
        ends(s, len, "ταθ") || ends(s, len, "διαθ") || ends(s, len, "σχ") ||
        ends(s, len, "ενδ") || ends(s, len, "ευρ") || ends(s, len, "τιθ") ||
        ends(s, len, "υπερθ") || ends(s, len, "ραθ") || ends(s, len, "ενθ") ||
        ends(s, len, "ροθ") || ends(s, len, "σθ") || ends(s, len, "πυρ") ||
        ends(s, len, "αιν") || ends(s, len, "συνδ") || ends(s, len, "συν") ||
        ends(s, len, "συνθ") || ends(s, len, "χωρ") || ends(s, len, "πον") ||
        ends(s, len, "βρ") || ends(s, len, "καθ") || ends(s, len, "ευθ") ||
        ends(s, len, "εκθ") || ends(s, len, "νετ") || ends(s, len, "ρον") ||
        ends(s, len, "αρκ") || ends(s, len, "βαρ") || ends(s, len, "βολ") ||
        ends(s, len, "ωφελ")) len += 2 // add back -ετ
    }
    len
  }

  private def rule10(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 5 && (ends(s, len, "οντασ") || ends(s, len, "ωντασ"))) {
      len -= 5
      if (len == 3 && ends(s, len, "αρχ")) {
        len += 3 // add back *ντ as οντ
        s(len - 3) = 'ο'
      }
      if (ends(s, len, "κρε")) {
        len += 3 // add back *ντ as ωντ
        s(len - 3) = 'ω'
      }
    }
    len
  }

  private def rule11(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 6 && ends(s, len, "ομαστε")) {
      len -= 6
      if (len == 2 && ends(s, len, "ον")) len += 5 // add back -ομαστ
    } else if (len > 7 && ends(s, len, "ιομαστε")) {
      len -= 7
      if (len == 2 && ends(s, len, "ον")) {
        len += 5
        s(len - 5) = 'ο'; s(len - 4) = 'μ'; s(len - 3) = 'α'
        s(len - 2) = 'σ'; s(len - 1) = 'τ'
      }
    }
    len
  }

  private val exc12a = Set("π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ")
  private val exc12b = Set("αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ",
    "προ", "νισ")

  private def rule12(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 5 && ends(s, len, "ιεστε")) {
      len -= 5
      if (stemIs(s, len, exc12a)) len += 4 // add back -ιεστ
    }
    if (len > 4 && ends(s, len, "εστε")) {
      len -= 4
      if (stemIs(s, len, exc12b)) len += 3 // add back -εστ
    }
    len
  }

  private val exc13 = Set("διαθ", "θ", "παρακαταθ", "προσθ", "συνθ")

  private def rule13(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 6 && ends(s, len, "ηθηκεσ")) len -= 6
    else if (len > 5 && (ends(s, len, "ηθηκα") || ends(s, len, "ηθηκε")))
      len -= 5
    var removed = false
    if (len > 4 && ends(s, len, "ηκεσ")) { len -= 4; removed = true }
    else if (len > 3 && (ends(s, len, "ηκα") || ends(s, len, "ηκε"))) {
      len -= 3; removed = true
    }
    if (removed && (stemIs(s, len, exc13) || ends(s, len, "σκωλ") ||
      ends(s, len, "σκουλ") || ends(s, len, "ναρθ") || ends(s, len, "σφ") ||
      ends(s, len, "οθ") || ends(s, len, "πιθ"))) len += 2 // add back -ηκ
    len
  }

  private val exc14 = Set("φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ",
    "λαμπιδ", "λεχ", "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν", "αμ",
    "αιθ", "ανηκ", "δεσποζ", "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε",
    "τσα")

  private def rule14(s: Array[Char], len0: Int): Int = {
    var len = len0
    var removed = false
    if (len > 5 && ends(s, len, "ουσεσ")) { len -= 5; removed = true }
    else if (len > 4 && (ends(s, len, "ουσα") || ends(s, len, "ουσε"))) {
      len -= 4; removed = true
    }
    if (removed && (stemIs(s, len, exc14) || vowel(s, len) ||
      ends(s, len, "ποδαρ") || ends(s, len, "βλεπ") ||
      ends(s, len, "πανταχ") || ends(s, len, "φρυδ") ||
      ends(s, len, "μαντιλ") || ends(s, len, "μαλλ") ||
      ends(s, len, "κυματ") || ends(s, len, "λαχ") || ends(s, len, "ληγ") ||
      ends(s, len, "φαγ") || ends(s, len, "ομ") || ends(s, len, "πρωτ")))
      len += 3 // add back -ουσ
    len
  }

  private val exc15a = Set("αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ",
    "αφ", "αμαλ", "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν",
    "δροσοπ", "ξεφ", "νεοπ", "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ",
    "συμπ", "συντ", "τ", "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ", "αποτ",
    "αρτιπ", "διατ", "εν", "επιτ", "κροκαλοπ", "σιδηροπ", "λ", "ναυ",
    "ουλαμ", "ουρ", "π", "τρ", "μ")
  private val exc15b = Set("ψοφ", "ναυλοχ")

  private def rule15(s: Array[Char], len0: Int): Int = {
    var len = len0
    var removed = false
    if (len > 4 && ends(s, len, "αγεσ")) { len -= 4; removed = true }
    else if (len > 3 && (ends(s, len, "αγα") || ends(s, len, "αγε"))) {
      len -= 3; removed = true
    }
    if (removed) {
      val cond1 = stemIs(s, len, exc15a) || ends(s, len, "οφ") ||
        ends(s, len, "πελ") || ends(s, len, "χορτ") || ends(s, len, "λλ") ||
        ends(s, len, "σφ") || ends(s, len, "ρπ") || ends(s, len, "φρ") ||
        ends(s, len, "πρ") || ends(s, len, "λοχ") || ends(s, len, "σμην")
      val cond2 = stemIs(s, len, exc15b) || ends(s, len, "κολλ")
      if (cond1 && !cond2) len += 2 // add back -αγ
    }
    len
  }

  private val exc16 = Set("ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον",
    "επταν")

  private def rule16(s: Array[Char], len0: Int): Int = {
    var len = len0
    var removed = false
    if (len > 4 && ends(s, len, "ησου")) { len -= 4; removed = true }
    else if (len > 3 && (ends(s, len, "ησε") || ends(s, len, "ησα"))) {
      len -= 3; removed = true
    }
    if (removed && stemIs(s, len, exc16)) len += 2 // add back -ησ
    len
  }

  private val exc17 = Set("ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ",
    "ευχρ", "κοινοχρ", "παλιμψ")

  private def rule17(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 4 && ends(s, len, "ηστε")) {
      len -= 4
      if (stemIs(s, len, exc17)) len += 3 // add back -ηστ
    }
    len
  }

  private val exc18 = Set("ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ",
    "εξων")

  private def rule18(s: Array[Char], len0: Int): Int = {
    var len = len0
    var removed = false
    if (len > 6 && (ends(s, len, "ησουνε") || ends(s, len, "ηθουνε"))) {
      len -= 6; removed = true
    } else if (len > 4 && ends(s, len, "ουνε")) { len -= 4; removed = true }
    if (removed && stemIs(s, len, exc18)) {
      len += 3
      s(len - 3) = 'ο'; s(len - 2) = 'υ'; s(len - 1) = 'ν'
    }
    len
  }

  private val exc19 = Set("παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ",
    "ασουσ")

  private def rule19(s: Array[Char], len0: Int): Int = {
    var len = len0
    var removed = false
    if (len > 6 && (ends(s, len, "ησουμε") || ends(s, len, "ηθουμε"))) {
      len -= 6; removed = true
    } else if (len > 4 && ends(s, len, "ουμε")) { len -= 4; removed = true }
    if (removed && stemIs(s, len, exc19)) {
      len += 3
      s(len - 3) = 'ο'; s(len - 2) = 'υ'; s(len - 1) = 'μ'
    }
    len
  }

  private def rule20(s: Array[Char], len0: Int): Int = {
    val len = len0
    if (len > 5 && (ends(s, len, "ματων") || ends(s, len, "ματοσ")))
      len - 3
    else if (len > 4 && ends(s, len, "ματα")) len - 2
    else len
  }

  private def rule21(s: Array[Char], len: Int): Int = {
    if (len > 9 && ends(s, len, "ιοντουσαν")) return len - 9
    if (len > 8 && (ends(s, len, "ιομασταν") || ends(s, len, "ιοσασταν") ||
      ends(s, len, "ιουμαστε") || ends(s, len, "οντουσαν"))) return len - 8
    if (len > 7 && (ends(s, len, "ιεμαστε") || ends(s, len, "ιεσαστε") ||
      ends(s, len, "ιομουνα") || ends(s, len, "ιοσαστε") ||
      ends(s, len, "ιοσουνα") || ends(s, len, "ιουνται") ||
      ends(s, len, "ιουνταν") || ends(s, len, "ηθηκατε") ||
      ends(s, len, "ομασταν") || ends(s, len, "οσασταν") ||
      ends(s, len, "ουμαστε"))) return len - 7
    if (len > 6 && (ends(s, len, "ιομουν") || ends(s, len, "ιονταν") ||
      ends(s, len, "ιοσουν") || ends(s, len, "ηθειτε") ||
      ends(s, len, "ηθηκαν") || ends(s, len, "ομουνα") ||
      ends(s, len, "οσαστε") || ends(s, len, "οσουνα") ||
      ends(s, len, "ουνται") || ends(s, len, "ουνταν") ||
      ends(s, len, "ουσατε"))) return len - 6
    if (len > 5 && (ends(s, len, "αγατε") || ends(s, len, "ιεμαι") ||
      ends(s, len, "ιεται") || ends(s, len, "ιεσαι") ||
      ends(s, len, "ιοταν") || ends(s, len, "ιουμα") ||
      ends(s, len, "ηθεισ") || ends(s, len, "ηθουν") ||
      ends(s, len, "ηκατε") || ends(s, len, "ησατε") ||
      ends(s, len, "ησουν") || ends(s, len, "ομουν") ||
      ends(s, len, "ονται") || ends(s, len, "ονταν") ||
      ends(s, len, "οσουν") || ends(s, len, "ουμαι") ||
      ends(s, len, "ουσαν"))) return len - 5
    if (len > 4 && (ends(s, len, "αγαν") || ends(s, len, "αμαι") ||
      ends(s, len, "ασαι") || ends(s, len, "αται") || ends(s, len, "ειτε") ||
      ends(s, len, "εσαι") || ends(s, len, "εται") || ends(s, len, "ηδεσ") ||
      ends(s, len, "ηδων") || ends(s, len, "ηθει") || ends(s, len, "ηκαν") ||
      ends(s, len, "ησαν") || ends(s, len, "ησει") || ends(s, len, "ησεσ") ||
      ends(s, len, "ομαι") || ends(s, len, "οταν"))) return len - 4
    if (len > 3 && (ends(s, len, "αει") || ends(s, len, "εισ") ||
      ends(s, len, "ηθω") || ends(s, len, "ησω") || ends(s, len, "ουν") ||
      ends(s, len, "ουσ"))) return len - 3
    if (len > 2 && (ends(s, len, "αν") || ends(s, len, "ασ") ||
      ends(s, len, "αω") || ends(s, len, "ει") || ends(s, len, "εσ") ||
      ends(s, len, "ησ") || ends(s, len, "οι") || ends(s, len, "οσ") ||
      ends(s, len, "ου") || ends(s, len, "υσ") || ends(s, len, "ων")))
      return len - 2
    if (len > 1 && vowel(s, len)) return len - 1
    len
  }

  private def rule22(s: Array[Char], len: Int): Int = {
    if (ends(s, len, "εστερ") || ends(s, len, "εστατ")) len - 5
    else if (ends(s, len, "οτερ") || ends(s, len, "οτατ") ||
      ends(s, len, "υτερ") || ends(s, len, "υτατ") ||
      ends(s, len, "ωτερ") || ends(s, len, "ωτατ")) len - 4
    else len
  }
}
