package graft.sources

import com.fasterxml.jackson.core.{JsonFactory, JsonToken, JsonParser => JParser}
import scala.collection.mutable

/** Streaming JSON-to-records reader — Solr's JsonRecordReader (reference
  * solr/solrj/src/java/org/apache/solr/common/util/JsonRecordReader
  * .java:1), the engine of the JSON update handler's split mode
  * (`/update/json/docs` with `split=` and `f=` params, JsonLoader
  * .handleSplitMode). One JSON document (or a sequence of root values)
  * streams into records framed by the `split` path, with field mappings:
  * {{{
  *   /a/b              split: each object at the path is one record
  *   name:/a/b/c       leaf mapped to `name`
  *   "/a/b/" + "*"     wildcard: every scalar directly under the path
  *   "/a/b/" + "**"    recursive wildcard: every scalar at any depth
  *   "$FQN:/" + "**"   recursive with dotted fully-qualified names
  *   'split1 | split2' multiple record roots
  * }}}
  *
  * Reference behaviors reproduced exactly:
  *  - Values collected in frames: a frame pushes for a record node AND
  *    for every object outside a record; fields purge when their frame's
  *    object closes (commonField siblings persist across the records
  *    inside the same enclosing object, never across sequential roots).
  *  - putValue promotes scalar -> list only on the SECOND value with the
  *    same name (single values stay scalars — multiValued is not
  *    forced).
  *  - Name resolution order at a key: exact child, then `*` child, then
  *    the inherited `**` node.
  *  - `**` leaves walk nested objects/arrays recursively; `$FQN` names
  *    prefix the wrapper chain joined with '.'.
  *  - LONG -> Long, floating -> Double, big integers -> String, boolean
  *    -> Boolean, null dropped; empty arrays drop; unknown subtrees are
  *    skipped with a depth counter.
  *  - Path segments may quote '/' inside single quotes (splitEscapeQuote);
  *    wildcards are only allowed terminal; split may not start with '//'.
  *  - The parser accepts noggit-style leniency used by Solr docs: single
  *    quotes and unquoted field names.
  */
final class JsonRecordReader private (splitPath: String) {
  import JsonRecordReader._

  private val root = new JNode("/", null)

  splitPath.split("\\|").map(_.trim).filter(_.nonEmpty).foreach { sp =>
    require(!sp.startsWith("//"), s"split cannot start with '//': $sp")
    addField(sp, sp, isRecord = true)
  }

  def addField(path: String, fieldName: String,
               isRecord: Boolean = false): this.type = {
    require(path.startsWith("/"), s"All paths must start with '/' $path")
    var segs = splitEscapeQuote(path)
    if (segs.isEmpty) { if (isRecord) root.isRecord = true; return this }
    if (segs.head.trim.isEmpty) segs = segs.tail
    if (segs.isEmpty) { if (isRecord) root.isRecord = true; return this }
    build(root, segs, fieldName, isRecord, path)
    optimize(root)
    this
  }

  private def build(at: JNode, paths: List[String], fieldName: String,
                    isRecord: Boolean, full: String): Unit = {
    val seg = paths.head
    require(seg.nonEmpty, s"all pieces in path must be non empty $full")
    val n = at.children.getOrElseUpdate(seg, new JNode(seg, at))
    if (paths.tail.isEmpty) {
      if (isRecord) {
        require(seg != "*" && seg != "**", s"split cannot end in a wildcard")
        n.isRecord = true; n.splitPath = fieldName
      } else {
        if (seg == "*") at.wildChild = n
        if (seg == "**") { at.recWildChild = n; n.recWildChild = n }
        n.isLeaf = true
        n.fieldName = if (fieldName == "$FQN") { n.useFqn = true; null }
                      else fieldName
      }
    } else {
      require(at.name != "*" && at.name != "**",
        s"wild cards are allowed only in the end $full")
      build(n, paths.tail, fieldName, isRecord, full)
    }
  }

  private def optimize(n: JNode): Unit = {
    for (c <- n.children.values) {
      if (n.recWildChild != null && c.recWildChild == null)
        c.recWildChild = n.recWildChild
      optimize(c)
    }
  }

  private def splitEscapeQuote(s: String): List[String] = {
    val parts = s.split("/", -1).toList
    val out = mutable.ListBuffer[String]()
    var i = 0
    while (i < parts.length) {
      val sb = new StringBuilder(parts(i))
      var q = parts(i).count(_ == '\'')
      while (q % 2 == 1 && i + 1 < parts.length) {
        i += 1; sb.append('/').append(parts(i))
        q += parts(i).count(_ == '\'')
      }
      out += sb.toString
      i += 1
    }
    out.toList.reverse.dropWhile(_.isEmpty).reverse
  }

  // ---------------- parsing ----------------

  def getAllRecords(json: String): Seq[Map[String, Any]] = {
    val out = mutable.ArrayBuffer[Map[String, Any]]()
    streamRecords(json, (rec, _) => out += rec)
    out.toSeq
  }

  def streamRecords(json: String,
                    handler: (Map[String, Any], String) => Unit): Unit = {
    val p = factory.createParser(json)
    val st = new JState(handler)
    try {
      var t = p.nextToken()
      while (t != null) {
        t match {
          case JsonToken.START_OBJECT =>
            objectStart(root, p, st, recordStarted = false, null)
          case JsonToken.START_ARRAY =>
            var e = p.nextToken()
            while (e != JsonToken.END_ARRAY) {
              if (e == JsonToken.START_OBJECT)
                objectStart(root, p, st, recordStarted = false, null)
              e = p.nextToken()
            }
          case _ =>
        }
        t = p.nextToken()
      }
    } finally p.close()
  }

  /** One wrapper per walked non-leaf/nested level (the reference's
    * MethodFrameWrapper): carries the name chain for $FQN. */
  private final class Frame(val node: JNode, val parent: Frame,
                            val name: String) {
    def fqn(leaf: String): String = {
      val sb = new StringBuilder
      def pre(f: Frame): Unit = if (f != null) {
        pre(f.parent); if (f.parent != null) sb.append('.')
        sb.append(f.name)
      }
      pre(this)
      sb.append('.').append(leaf).toString
    }
    def walk(t: JsonToken, p: JParser, st: JState,
             recordStarted: Boolean): Unit = t match {
      case JsonToken.START_OBJECT =>
        objectStart(node, p, st, recordStarted, this)
      case JsonToken.START_ARRAY =>
        var e = p.nextToken()
        while (e != JsonToken.END_ARRAY) {
          if (e == JsonToken.START_OBJECT)
            objectStart(node, p, st, recordStarted, this)
          e = p.nextToken()
        }
      case _ =>
    }
  }

  /** Parser positioned just after START_OBJECT of an object at `node`'s
    * level; returns after the matching END_OBJECT. */
  private def objectStart(node: JNode, p: JParser, st: JState,
                          recordStarted: Boolean, wrapper: Frame): Unit = {
    val nowStarted = recordStarted || node.isRecord
    val frame: mutable.Set[String] =
      if (node.isRecord || !recordStarted) {
        val f = mutable.Set[String](); st.frames.push(f); f
      } else st.frames.top
    try {
      var t = p.nextToken()
      while (t != JsonToken.END_OBJECT) {
        require(t == JsonToken.FIELD_NAME, s"unexpected token $t")
        val name = p.currentName()
        var n = node.children.getOrElse(name, null)
        if (n == null) n = node.wildChild
        if (n == null) n = node.recWildChild
        if (n != null) {
          if (n.isLeaf) {
            val v = p.nextToken()
            val nameInRecord =
              if (n.fieldName != null) n.fieldName
              else if (n.useFqn && wrapper != null) wrapper.fqn(name)
              else name
            val runnable =
              if ((v == JsonToken.START_OBJECT || v == JsonToken.START_ARRAY)
                && n.recWildChild != null)
                new Frame(n, wrapper, name)
              else null
            val value = parseFieldValue(v, p, st, runnable, nowStarted)
            if (value != null) {
              st.put(frame, nameInRecord, value)
            }
          } else {
            val v = p.nextToken()
            new Frame(n, wrapper, name).walk(v, p, st, nowStarted)
          }
        } else {
          p.nextToken() match {
            case JsonToken.START_ARRAY | JsonToken.START_OBJECT => p.skipChildren()
            case _ =>
          }
        }
        t = p.nextToken()
      }
      if (node.isRecord) st.emit(node.splitPath)
    } finally {
      if (node.isRecord || !recordStarted) {
        // DELIBERATE DEVIATION from the reference
        // (JsonRecordReader.java:417-421): Solr only removes the frame's
        // values and NEVER pops the stack, so with nested split paths
        // ('/a | /a/b') a non-record sibling object AFTER a closed inner
        // record peeks the closed record's STALE frame — its fields then
        // escape the outer record's purge and leak into the NEXT record.
        // We pop, so sibling fields register against the live enclosing
        // frame and are purged with it (JsonRecordReaderSpec pins this:
        // "nested split paths do not leak sibling fields across records").
        val purge = st.frames.pop()
        purge.foreach(st.values.remove)
      }
    }
  }

  /** parseSingleFieldValue / parseArrayFieldValue. */
  private def parseFieldValue(t: JsonToken, p: JParser, st: JState,
                              runnable: Frame,
                              recordStarted: Boolean): Any = t match {
    case JsonToken.START_ARRAY =>
      val lst = mutable.ArrayBuffer[Any]()
      var e = p.nextToken()
      while (e != JsonToken.END_ARRAY) {
        val v = parseFieldValue(e, p, st, runnable, recordStarted)
        if (v != null) lst += v
        e = p.nextToken()
      }
      // keep the mutable buffer: a LATER value with the same name
      // appends INTO the stored list (reference putValue on a List)
      if (lst.isEmpty) null else lst
    case JsonToken.START_OBJECT =>
      if (runnable != null) {
        runnable.walk(JsonToken.START_OBJECT, p, st, recordStarted)
        null
      } else { p.skipChildren(); null }
    case other =>
      JsonRecordReader.jsonScalar(other, p) match {
        case JsonRecordReader.NotScalar =>
          throw new RuntimeException(s"Error parsing JSON field value: $other")
        case v => v
      }
  }
}

object JsonRecordReader {

  /** One lenient (noggit-style) factory per JVM, shared with
    * [[JsonUpdate]]. */
  private[sources] val factory: JsonFactory = {
    val f = new JsonFactory()
    f.enable(JParser.Feature.ALLOW_SINGLE_QUOTES)
    f.enable(JParser.Feature.ALLOW_UNQUOTED_FIELD_NAMES)
    f
  }

  /** Scalar token coercion shared with [[JsonUpdate]]: LONG -> Long,
    * floating -> Double, big integers -> String, booleans native, null
    * -> null. Returns NotScalar for structural tokens. */
  private[sources] object NotScalar
  private[sources] def jsonScalar(t: JsonToken, p: JParser): Any = t match {
    case JsonToken.VALUE_STRING => p.getText
    case JsonToken.VALUE_NUMBER_INT =>
      p.getNumberType match {
        case JParser.NumberType.BIG_INTEGER => p.getText
        case _ => java.lang.Long.valueOf(p.getLongValue)
      }
    case JsonToken.VALUE_NUMBER_FLOAT =>
      java.lang.Double.valueOf(p.getDoubleValue)
    case JsonToken.VALUE_TRUE  => java.lang.Boolean.TRUE
    case JsonToken.VALUE_FALSE => java.lang.Boolean.FALSE
    case JsonToken.VALUE_NULL  => null
    case _ => NotScalar
  }

  /** Field mappings: `name:/path` or bare `/path` (field named by its
    * JSON key) — JsonRecordReader.getInst. */
  def getInst(split: String, fieldMappings: Seq[String]): JsonRecordReader = {
    val r = new JsonRecordReader(split)
    for (s <- fieldMappings) {
      val idx = s.indexOf(':')
      if (idx > 0) r.addField(s.substring(idx + 1), s.substring(0, idx))
      else r.addField(s, null)
    }
    r
  }

  private final class JNode(val name: String, val parent: JNode) {
    val children = mutable.LinkedHashMap[String, JNode]()
    var fieldName: String = _
    var splitPath: String = _
    var isLeaf = false
    var isRecord = false
    var useFqn = false
    var wildChild: JNode = _
    var recWildChild: JNode = _
  }

  private final class JState(val handler: (Map[String, Any], String) => Unit) {
    val values = mutable.LinkedHashMap[String, Any]()
    val frames = mutable.Stack[mutable.Set[String]]()

    /** scalar first; promote to list on the second value (putValue). */
    def put(frame: mutable.Set[String], field: String, v: Any): Unit = {
      values.get(field) match {
        case None => values(field) = v
        case Some(l: mutable.ArrayBuffer[_]) =>
          l.asInstanceOf[mutable.ArrayBuffer[Any]] += v
        case Some(prev) =>
          values(field) = mutable.ArrayBuffer[Any](prev, v)
      }
      if (frame != null) frame += field
    }

    def emit(splitPath: String): Unit = {
      val snap = values.map {
        case (k, l: mutable.ArrayBuffer[_]) => k -> l.toList
        case (k, l: List[_]) => k -> l
        case (k, v) => k -> v
      }.toMap
      handler(snap, splitPath)
    }
  }
}
