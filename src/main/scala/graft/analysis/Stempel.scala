package graft.analysis

import java.io.{BufferedInputStream, DataInputStream}

/** Polish stemming via the Stempel (Egothor) patch-command trie — the
  * reference's analysis/stempel module: a word walks a (multi-)trie keyed on
  * its reversed characters; the value found last on the path is a "patch
  * command" string (pairs of [-RDI][param]) that Diff.apply replays onto the
  * word from its end to produce the stem.
  *
  * Read path only (the shipped table is used as-is, like the KStem/Hunspell
  * dictionaries): deserialization follows Trie(DataInput)
  * (stempel/src/java/org/egothor/stemmer/Trie.java:85-94, Row.java:78-88,
  * MultiTrie.java:83-90), lookup follows Trie.getLastOnPath
  * (Trie.java:274-295) and MultiTrie2.getLastOnPath
  * (MultiTrie2.java:140-173 with cannotFollow/skip/lengthPP,
  * :289-333), patching follows Diff.apply (Diff.java:106-151), and the
  * filter/analyzer contract follows StempelFilter.java:71-83 (strictly
  * longer than minLength=3, unstemmable words pass unchanged) and
  * PolishAnalyzer.java:139-148 (standard -> lowercase -> stop -> stempel).
  * Table: the reference's published stemmer_20000.tbl
  * (stempel/src/resources/org/apache/lucene/analysis/pl/).
  */
object Stempel {

  private final class TRow(n: Int, in: DataInputStream) {
    // parallel sorted arrays keyed by cell char (Row.java keeps a TreeMap;
    // only cmd and ref matter on the read path)
    val chars = new Array[Char](n)
    val cmds = new Array[Int](n)
    val refs = new Array[Int](n)
    locally {
      var i = 0
      while (i < n) {
        chars(i) = in.readChar()
        cmds(i) = in.readInt()
        in.readInt() // cnt
        refs(i) = in.readInt()
        in.readInt() // skip
        i += 1
      }
      // table rows arrive in TreeMap (sorted) order already; sort defensively
      val order = chars.indices.sortBy(chars)
      val c2 = order.map(chars).toArray; val m2 = order.map(cmds).toArray
      val r2 = order.map(refs).toArray
      Array.copy(c2, 0, chars, 0, n); Array.copy(m2, 0, cmds, 0, n)
      Array.copy(r2, 0, refs, 0, n)
    }
    private def at(ch: Char): Int = java.util.Arrays.binarySearch(chars, ch)
    def getCmd(ch: Char): Int = { val i = at(ch); if (i >= 0) cmds(i) else -1 }
    def getRef(ch: Char): Int = { val i = at(ch); if (i >= 0) refs(i) else -1 }
  }

  private final class STrie(in: DataInputStream) {
    val forward: Boolean = in.readBoolean()
    val root: Int = in.readInt()
    val cmds: Array[String] = Array.fill(in.readInt())(in.readUTF())
    val rows: Array[TRow] = Array.fill(in.readInt())(new TRow(in.readInt() max 0, in))

    /** Trie.getLastOnPath (Trie.java:274-295): walk key chars (reversed
      * when !forward), remembering the last cell command passed. */
    def getLastOnPath(key: CharSequence): String = {
      if (key.length == 0) throw new IndexOutOfBoundsException("empty key")
      var now = rows(root)
      var last: String = null
      var i = 0
      def charAt(j: Int): Char =
        if (forward) key.charAt(j) else key.charAt(key.length - 1 - j)
      while (i < key.length - 1) {
        val ch = charAt(i)
        val w = now.getCmd(ch)
        if (w >= 0) last = cmds(w)
        val r = now.getRef(ch)
        if (r < 0 || r >= rows.length) return last
        now = rows(r)
        i += 1
      }
      val w = now.getCmd(charAt(key.length - 1))
      if (w >= 0) cmds(w) else last
    }
  }

  /** MultiTrie2 walk (MultiTrie2.java:140-173). */
  private final class SMultiTrie2(in: DataInputStream) {
    val forward: Boolean = in.readBoolean()
    private val by: Int = in.readInt()
    require(by >= 1, s"bad MultiTrie BY=$by")
    val tries: Array[STrie] = Array.fill(in.readInt())(new STrie(in))

    private def cannotFollow(after: Char, goes: Char): Boolean =
      (after == '-' || after == 'D') && after == goes

    private def skip(s: CharSequence, count: Int): CharSequence =
      if (forward) s.subSequence(count, s.length)
      else s.subSequence(0, s.length - count)

    private def lengthPP(cmd: CharSequence): Int = {
      var len = 0
      var i = 0
      while (i < cmd.length) {
        val c = cmd.charAt(i); i += 1
        c match {
          case '-' | 'D' => len += cmd.charAt(i) - 'a' + 1
          case 'R' => len += 1
          case _ => // 'I'
        }
        i += 1
      }
      len
    }

    def getLastOnPath(key0: CharSequence): String = {
      val result = new StringBuilder
      try {
        var key = key0
        var lastkey = key0
        var lastch = ' '
        val p = new Array[CharSequence](tries.length)
        var i = 0
        var done = false
        while (!done && i < tries.length) {
          val r = tries(i).getLastOnPath(lastkey)
          if (r == null || (r.length == 1 && r.charAt(0) == '*'))
            done = true
          else if (cannotFollow(lastch, r.charAt(0)))
            done = true
          else {
            lastch = r.charAt(r.length - 2)
            p(i) = r
            if (p(i).charAt(0) == '-') {
              if (i > 0) key = skip(key, lengthPP(p(i - 1)))
              key = skip(key, lengthPP(p(i)))
            }
            result.append(r)
            if (key.length != 0) lastkey = key
            i += 1
          }
        }
      } catch { case _: IndexOutOfBoundsException => }
      result.toString
    }
  }

  /** Diff.apply (Diff.java:106-151): replay [-RDI] pairs from the end. */
  def diffApply(dest: StringBuilder, diff: CharSequence): Unit = {
    if (diff == null) return
    var pos = dest.length - 1
    if (pos < 0) return
    try {
      var i = 0
      while (i < diff.length / 2) {
        val cmd = diff.charAt(2 * i)
        val param = diff.charAt(2 * i + 1)
        val parNum = param - 'a' + 1
        cmd match {
          case '-' => pos = pos - parNum + 1
          case 'R' => dest.setCharAt(pos, param)
          case 'D' =>
            val o = pos
            pos -= parNum - 1
            dest.delete(pos, o + 1)
          case 'I' => pos += 1; dest.insert(pos, param)
          case _ =>
        }
        pos -= 1
        i += 1
      }
    } catch { case _: IndexOutOfBoundsException => }
  }

  private lazy val table: Either[STrie, SMultiTrie2] = {
    val res = getClass.getResourceAsStream("/graft/stempel/stemmer_20000.tbl")
    require(res != null, "missing stempel table resource")
    val in = new DataInputStream(new BufferedInputStream(res))
    try {
      val method = in.readUTF().toUpperCase(java.util.Locale.ROOT)
      if (method.indexOf('M') < 0) Left(new STrie(in))
      else Right(new SMultiTrie2(in))
    } finally in.close()
  }

  /** StempelStemmer.stem: null when no patch path exists or the patched
    * buffer is empty (caller keeps the original term then). */
  def stem(word: String): Option[String] = {
    val cmd =
      try table.fold(_.getLastOnPath(word), _.getLastOnPath(word))
      catch { case _: IndexOutOfBoundsException => null }
    if (cmd == null) return None
    val sb = new StringBuilder(word)
    diffApply(sb, cmd)
    if (sb.nonEmpty) Some(sb.toString) else None
  }

  /** StempelFilter.incrementToken (StempelFilter.java:71-83): words of
    * length <= 3 pass through; unstemmable words pass through. */
  def filter(term: String): String =
    if (term.length <= 3) term
    else stem(term).getOrElse(term)
}
