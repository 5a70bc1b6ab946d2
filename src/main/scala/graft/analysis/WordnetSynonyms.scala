package graft.analysis

/** Wordnet prolog synonym parser (reference
  * analysis/common/.../synonym/WordnetSynonymParser.java — the
  * `s(synsetId,wordNum,'text',pos,...)` format of wordnet's prologdb):
  * consecutive lines sharing the 9-char synset id (chars 2..11) form a
  * synset; the quoted text unescapes `''` -> `'`; single-member synsets
  * are dropped (addInternal's size <= 1 check).
  *
  * Output is raw (lhs, rhs) pairs for [[Analyzer.compileSynonyms]]:
  *  - expand=true: every member maps to every OTHER member (the
  *    reference adds i->j for all pairs; the identity pair is the
  *    original token, which this engine's index-time expansion keeps
  *    implicitly);
  *  - expand=false: every non-first member maps to the FIRST member
  *    (the reference's contraction add(synset[i], synset[0])). */
object WordnetSynonyms {

  def parse(lines: Seq[String],
            expand: Boolean = true): Seq[(String, Seq[String])] = {
    val out = Seq.newBuilder[(String, Seq[String])]
    var lastId = ""
    val synset = Vector.newBuilder[String]
    var size = 0
    def flush(): Unit = {
      val ss = synset.result()
      if (ss.size > 1) {
        if (expand)
          ss.foreach(m => out += m -> ss.filterNot(_ == m))
        else
          ss.drop(1).foreach(m => out += m -> Seq(ss.head))
      }
      synset.clear(); size = 0
    }
    lines.filter(_.trim.nonEmpty).foreach { line =>
      require(line.length > 11 && line.startsWith("s("),
        s"invalid wordnet line: $line")
      val id = line.substring(2, 11)
      if (id != lastId) flush()
      val start = line.indexOf('\'') + 1
      val end = line.lastIndexOf('\'')
      require(start > 0 && end > start, s"invalid wordnet line: $line")
      synset += line.substring(start, end).replace("''", "'")
      size += 1
      lastId = id
    }
    flush()
    out.result()
  }
}
