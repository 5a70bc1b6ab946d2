package graft.analysis

/** Locale-aware collation keys — CollationKeyAnalyzer (JDK collator,
  * reference lucene/analysis/common/src/java/org/apache/lucene/collation/
  * CollationKeyAnalyzer.java:30-110) and ICUCollationKeyAnalyzer /
  * ICUCollationDocValuesField (lucene/analysis/icu/src/java/org/apache/
  * lucene/collation/ICUCollationKeyAnalyzer.java:40-90,
  * ICUCollationDocValuesField.java): a token's index term becomes its
  * binary collation key, so locale-correct sorting and range queries
  * reduce to unsigned byte-order comparison — exactly what Spark's
  * BinaryType ordering does, making a distributed ORDER BY / range filter
  * over the key column semantics-identical to the reference's
  * SortField.Type.STRING over collated doc values.
  *
  * ICU4J is the reference's own backing library for the ICU variant and
  * ships on the Spark classpath (same environmental stance as
  * `analysis/IcuText`).
  */
object Collation {

  /** ICU collation key bytes (ICUCollationDocValuesField.setStringValue:
    * collator.getCollationKey(value).toByteArray). `strength` is an ICU
    * Collator strength constant (e.g. Collator.PRIMARY) when given. */
  def icuKey(locale: String, strength: Option[Int] = None): String => Array[Byte] = {
    val base = com.ibm.icu.text.Collator.getInstance(
      new com.ibm.icu.util.ULocale(locale))
    strength.foreach(base.setStrength)
    // ICU collators are not thread-safe; freeze() makes getCollationKey
    // safely shareable across Spark task threads.
    val c = base.freeze()
    (s: String) => c.getCollationKey(s).toByteArray
  }

  /** JDK collation key bytes (CollationKeyAnalyzer path —
    * java.text.CollationKey.toByteArray). java.text.Collator is not
    * thread-safe either; clone per call site via ThreadLocal. */
  def jdkKey(locale: String): String => Array[Byte] = {
    val loc = java.util.Locale.forLanguageTag(locale)
    val tl = ThreadLocal.withInitial(() => java.text.Collator.getInstance(loc))
    (s: String) => tl.get().getCollationKey(s).toByteArray
  }

  /** Executor-side cached en tertiary key (objects are never serialized,
    * so the frozen collator is built once per JVM, not shipped). */
  @transient private lazy val enKey = icuKey("en")
  def enKeyOf(s: String): Array[Byte] = enKey(s)

  /** Unsigned lexicographic byte compare — Spark BinaryType order. */
  def compareKeys(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** TermRangeQuery-over-collation-keys membership
    * (CollationTestBase.testFarsiRangeQueryCollating shape). */
  def inRange(key: String => Array[Byte])(term: String, lo: String, hi: String,
                                          incLo: Boolean, incHi: Boolean): Boolean = {
    val k = key(term)
    val cl = compareKeys(k, key(lo))
    val ch = compareKeys(k, key(hi))
    (if (incLo) cl >= 0 else cl > 0) && (if (incHi) ch <= 0 else ch < 0)
  }
}
