package graft.search

import scala.collection.mutable

/** Compile + run support for [[TermAutomatonQ]] (reference
  * lucene/sandbox/.../search/TermAutomatonQuery.java,
  * TermAutomatonScorer.java).
  *
  * `compile` mirrors TermAutomatonQuery.finish() (:146-210): ANY arcs are
  * rewritten to arcs on EVERY alphabet symbol (terms and the ANY sentinel
  * itself — after the rewrite an ANY arc also advances on a query term's
  * own token), leading/trailing ANY arcs are rejected, and the NFA is
  * determinized by subset construction.
  *
  * `countMatches` mirrors TermAutomatonScorer.countMatches (:212-330):
  * per-position state ENTRY lists (the reference's PosState.add does not
  * dedup, so an acceptance counts once per entering path — two distinct
  * DFA predecessor states stepping into the same accept state count
  * twice), a fresh start from the initial state on every real token, and
  * one ANY step per position increment through gaps between query-term
  * tokens (the lastPos->pos loop at :253-277, including its peter-out
  * early exit).
  */
object TermAutomatonDfa {

  /** Determinized automaton: `terms` sorted alphabet; symbol id =
    * alphabet index, ANY = terms.length; `delta(state)(symbol)` -> next
    * state or -1; state 0 is initial. */
  final case class Dfa(terms: Array[String], delta: Array[Array[Int]],
                       accept: Array[Boolean]) extends Serializable {
    def hasAny: Boolean = delta.exists(_(terms.length) != -1)
  }

  def compile(q: TermAutomatonQ): Dfa = {
    val terms = q.transitions.map(_._3).distinct.sorted.toArray
    val tid = terms.zipWithIndex.toMap
    val nSym = terms.length + 1 // last symbol = ANY
    // the reference's finish() rejects automata that lead or end with ANY
    require(!q.anyTransitions.exists(_._1 == 0),
      "automaton cannot lead with an ANY transition")
    require(!q.anyTransitions.exists { case (_, to) => q.accept(to) },
      "automaton cannot end with an ANY transition")
    require(q.transitions.forall { case (f, t, _) =>
      f >= 0 && f < q.numStates && t >= 0 && t < q.numStates },
      "transition state out of range")
    // NFA transition sets; ANY arcs expand to every symbol (finish()'s
    // min=0..termCount translation)
    val nfa = Array.fill(q.numStates, nSym)(Set.empty[Int])
    q.transitions.foreach { case (f, t, term) =>
      nfa(f)(tid(term)) += t }
    q.anyTransitions.foreach { case (f, t) =>
      var s = 0; while (s < nSym) { nfa(f)(s) += t; s += 1 } }
    // subset construction from {0}
    val idx = mutable.LinkedHashMap[Set[Int], Int](Set(0) -> 0)
    val queue = mutable.Queue(Set(0))
    val rows = mutable.ArrayBuffer.empty[Array[Int]]
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      val row = Array.fill(nSym)(-1)
      var a = 0
      while (a < nSym) {
        val nxt = s.flatMap(st => nfa(st)(a))
        if (nxt.nonEmpty)
          row(a) = idx.getOrElseUpdate(nxt, { queue.enqueue(nxt); idx.size })
        a += 1
      }
      rows += row
    }
    val accept = idx.keysIterator
      .map(s => s.exists(q.accept)).toArray
    Dfa(terms, rows.toArray, accept)
  }

  /** TokenStreamToTermAutomatonQuery (reference sandbox
    * TokenStreamToTermAutomatonQuery.java:37-115): build a
    * [[TermAutomatonQ]] from a token graph of (term, posInc, posLength)
    * — one automaton state per token-graph position, each token an arc
    * from its position to position+posLength, the literal term "*" an
    * ANY arc, the last created state the sole accept. posInc > 1 (holes)
    * is rejected like the reference ("to accept any term, use '*'"). */
  def fromTokens(tokens: Seq[(String, Int, Int)]): TermAutomatonQ = {
    require(tokens.nonEmpty, "empty token stream")
    var pos = -1
    var maxState = -1
    val trans = mutable.ArrayBuffer.empty[(Int, Int, String)]
    val anyTrans = mutable.ArrayBuffer.empty[(Int, Int)]
    tokens.foreach { case (term, posInc, posLen) =>
      require(pos > -1 || posInc > 0, "first token must advance position")
      require(posInc <= 1,
        "cannot handle holes; to accept any term, use '*' term")
      if (posInc > 0) pos += posInc
      val endPos = pos + posLen
      maxState = math.max(maxState, endPos)
      if (term == "*") anyTrans += ((pos, endPos))
      else trans += ((pos, endPos, term))
    }
    TermAutomatonQ(maxState + 1, Set(maxState), trans.toSeq, anyTrans.toSeq)
  }

  /** Per-doc freq walk over `tokens` = (position, termId) ascending by
    * (position, termId); termId is the index into `dfa.terms`. */
  def countMatches(dfa: Dfa, tokens: Seq[(Int, Int)]): Int = {
    val anyId = dfa.terms.length
    val hasAny = dfa.hasAny
    val states = mutable.Map.empty[Int, List[Int]].withDefaultValue(Nil)
    var lastPos = -1
    var freq = 0
    tokens.foreach { case (pos, tidTok) =>
      if (hasAny && lastPos != -1 && pos > lastPos) {
        // advance ANY arcs one position at a time from lastPos to pos;
        // stop early once a gap position holds no states (peter-out)
        val startLp = lastPos
        var lp = lastPos
        var cont = true
        while (cont && lp < pos) {
          val st = states(lp)
          if (st.isEmpty && lp > startLp) cont = false
          else {
            st.foreach { s =>
              val ns = dfa.delta(s)(anyId)
              if (ns != -1) states(lp + 1) ::= ns
            }
            lp += 1
          }
        }
      }
      // entries strictly before lastPos can never advance again
      if (pos > lastPos && states.nonEmpty)
        states.keysIterator.filter(_ < pos).toArray.foreach(states.remove)
      // match the current token from live states, then a fresh start
      states(pos).foreach { s =>
        val ns = dfa.delta(s)(tidTok)
        if (ns != -1) {
          states(pos + 1) ::= ns
          if (dfa.accept(ns)) freq += 1
        }
      }
      val ns0 = dfa.delta(0)(tidTok)
      if (ns0 != -1) {
        states(pos + 1) ::= ns0
        if (dfa.accept(ns0)) freq += 1
      }
      lastPos = pos
    }
    freq
  }
}
