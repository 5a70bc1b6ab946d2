package graft.search

/** Solr's minimum-should-match spec language (`mm=` on dismax/eDisMax) —
  * reference solr/core/src/java/org/apache/solr/util/SolrPluginUtils.java:
  * 593-654 (setMinShouldMatch / calculateMinShouldMatch): plain ints,
  * negative ints ("all but n"), percentages with FLOAT truncation
  * semantics, and space-separated "upper<spec" conditionals evaluated
  * left to right against the optional-clause count.
  *
  * The percentage path is kept in Float exactly like the reference
  * ((result*percent) * (1/100f) then int truncation) — e.g. 25% of 4 is
  * 1 only because 100*0.01f rounds UP to 1.0f. */
object MinShouldMatch {

  def calculate(optionalClauseCount: Int, spec0: String): Int = {
    var result = optionalClauseCount
    var spec = spec0.trim

    if (spec.indexOf('<') >= 0) {
      // conditional spec(s): strip whitespace around '<', split on ' '
      spec = spec.replaceAll("(\\s+<\\s*)|(\\s*<\\s+)", "<")
      spec.split(" ").foreach { s =>
        val parts = s.split("<")
        val upperBound = parts(0).toInt
        if (optionalClauseCount <= upperBound) return result
        else result = calculate(optionalClauseCount, parts(1))
      }
      return result
    }

    if (spec.indexOf('%') >= 0) {
      val percent = spec.substring(0, spec.length - 1).toInt
      val calc: Float = (result * percent) * (1 / 100f)
      result = if (calc < 0) result + calc.toInt else calc.toInt
    } else {
      val calc = spec.toInt
      result = if (calc < 0) result + calc else calc
    }

    if (optionalClauseCount < result) optionalClauseCount
    else if (result < 0) 0
    else result
  }

  /** setMinShouldMatch: applied only when positive (BoolQ default 0 =
    * plain disjunction). */
  def forClauses(optionalClauseCount: Int, spec: String): Int = {
    val msm = calculate(optionalClauseCount, spec)
    if (msm > 0) msm else 0
  }
}
