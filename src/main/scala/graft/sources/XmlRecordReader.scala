package graft.sources

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Streaming XPath-subset record reader — the DataImportHandler's
  * XPathEntityProcessor engine (reference solr/contrib/dataimporthandler
  * XPathRecordReader.java:1, XPathEntityProcessor.java:60) re-expressed
  * for Spark: one XML document per input row, flattened into records by
  * a `forEach` xpath with field xpaths collected along the way.
  *
  * Supported xpath subset (the reference's, XPathRecordReader.java:19-31):
  * {{{
  *   /a/b/c                 element text
  *   /a/b/@attr             attribute of an element
  *   /a/b[@k]/c             predicate: attribute present
  *   /a/b[@k='v']/c         predicate: attribute equals (quoted / may hold '/')
  *   /a//b, //b             any-descendant element
  *   forEach: 'xp1 | xp2'   multiple record roots
  * }}}
  *
  * Reference behaviors reproduced exactly:
  *  - Records emit at the forEach element's END_ELEMENT; values collected
  *    in outer scopes persist across records (commonField), values
  *    collected inside the record frame purge when it closes.
  *  - A non-record element inside a record that closes without having
  *    matched ALL its known children pushes a null into every unmatched
  *    multi-valued descendant field (putNulls — keeps parallel
  *    multi-valued lists index-aligned, TestXPathRecordReader
  *    testPutNullTest).
  *  - An attribute inside a started record stores even when absent
  *    (null list entry); outside a record only present values store.
  *  - FLATTEN swallows child elements and keeps collecting their text
  *    (child elements are NOT matched while flattening).
  *  - Text for a non-flatten node is the concatenation of its DIRECT
  *    character runs only (mixed content: child element text excluded).
  *  - Wildcard ('//') nodes match at any depth below their anchor, both
  *    while on the spec tree and while skipping unknown subtrees (the
  *    local-name descendant cache).
  *  - Element names match by LOCAL name (namespace prefixes ignored).
  *  - forEach may not start with '//'; field xpaths must start with '/'.
  */
object XmlRecordReader {

  private val AttrPred = "(\\S*?)?(\\[@)(\\S*?)(='(.*?)')?(\\])".r.pattern

  /** One preconfigured StAX factory per JVM (the reference's static
    * factory — XPathRecordReader.java:638); per-document factory lookup
    * would dominate small-document parse cost. */
  private lazy val factory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  private final class TreeNode(var name: String, val parent: TreeNode) {
    var segment: String = name // raw xpath segment (incl. predicates)
    var fieldName: String = _
    var forEachPath: String = _
    var attributes: mutable.Buffer[TreeNode] = _
    var children: mutable.Buffer[TreeNode] = _
    var wildChildren: mutable.Buffer[TreeNode] = _
    var attrPreds: List[(String, String)] = Nil // (attr, value-or-null)
    var wildAncestor: TreeNode = _
    var hasText = false
    var multiValued = false
    var isRecord = false
    var flatten = false
  }

  /** Values sink: map + frame bookkeeping (stack of record frames). */
  private final class ParseState(val handler: (Map[String, AnyRef], String) => Unit) {
    val values = mutable.LinkedHashMap[String, AnyRef]()
    val frames = mutable.Stack[mutable.Set[String]]()

    def put(field: String, value: String, multi: Boolean,
            frame: mutable.Set[String]): Unit = {
      if (multi) {
        val buf = values.getOrElseUpdate(field,
          mutable.ArrayBuffer[String]()).asInstanceOf[mutable.ArrayBuffer[String]]
        buf += value
      } else values(field) = value
      if (frame != null) frame += field
    }

    def emit(forEachPath: String): Unit = {
      // deep-copy list values so later appends don't mutate emitted rows
      val snap = values.map {
        case (k, v: mutable.ArrayBuffer[_]) => k -> v.toList
        case (k, v) => k -> v
      }.toMap
      handler(snap.asInstanceOf[Map[String, AnyRef]], forEachPath)
    }
  }
}

/** NOT Serializable by design: a reader holds a mutable spec tree.
  * Construct one per partition (what [[XmlRecords.fromXml]] does) rather
  * than closing over a driver-built instance. */
final class XmlRecordReader(forEachXpath: String) {
  import XmlRecordReader._

  private val root = new TreeNode("/", null)
  private var optimised = false

  forEachXpath.split("\\|").map(_.trim).filter(_.nonEmpty).foreach { fe =>
    require(!fe.startsWith("//"), s"forEach cannot start with '//': $fe")
    insert(fe, fe, multiValued = false, isRecord = true, flatten = false)
  }

  def addField(name: String, xpath: String, multiValued: Boolean,
               flatten: Boolean = false): XmlRecordReader = {
    insert(xpath, name, multiValued, isRecord = false, flatten)
    optimised = false
    this
  }

  // ---------- spec-tree construction ----------------------------------

  private def insert(xpath: String, name: String, multiValued: Boolean,
                     isRecord: Boolean, flatten: Boolean): Unit = {
    require(xpath.startsWith("/"), s"xpath must start with '/' : $xpath")
    var segs = splitEscapeQuote(xpath)
    if (segs.nonEmpty && segs.head.trim.isEmpty) segs = segs.tail
    build(root, segs, name, multiValued, isRecord, flatten)
  }

  private def build(at: TreeNode, paths: List[String], fieldName: String,
                    multiValued: Boolean, isRecord: Boolean,
                    flatten: Boolean): Unit = paths match {
    case seg :: rest if rest.isEmpty && seg.startsWith("@") =>
      if (at.attributes == null) at.attributes = mutable.Buffer()
      val a = new TreeNode(seg.substring(1), at)
      a.fieldName = fieldName; a.multiValued = multiValued
      at.attributes += a
    case seg :: rest if seg.isEmpty =>
      // '//' produced an empty segment: next segment is a wildcard child
      if (at.wildChildren == null) at.wildChildren = mutable.Buffer()
      val n = getOrAdd(rest.head, at, at.wildChildren)
      finishOrRecurse(n, rest.tail, fieldName, multiValued, isRecord, flatten)
    case seg :: rest =>
      if (at.children == null) at.children = mutable.Buffer()
      val n = getOrAdd(seg, at, at.children)
      finishOrRecurse(n, rest, fieldName, multiValued, isRecord, flatten)
    case Nil => // unreachable: xpath always yields at least one segment
  }

  private def finishOrRecurse(n: TreeNode, rest: List[String],
                              fieldName: String, multiValued: Boolean,
                              isRecord: Boolean, flatten: Boolean): Unit =
    if (rest.isEmpty) {
      if (isRecord) { n.isRecord = true; n.forEachPath = fieldName }
      else {
        n.hasText = true; n.fieldName = fieldName
        n.multiValued = multiValued; n.flatten = flatten
      }
    } else build(n, rest, fieldName, multiValued, isRecord, flatten)

  private def getOrAdd(seg: String, parent: TreeNode,
                       list: mutable.Buffer[TreeNode]): TreeNode =
    list.find(_.segment == seg).getOrElse {
      val n = new TreeNode(seg, parent)
      // parse [@attr] / [@attr='value'] predicates off the segment
      val m = AttrPred.matcher(seg)
      if (m.find()) {
        n.name = m.group(1)
        var start = m.start(2)
        var go = true
        while (go) {
          if (!m.find(start)) go = false
          else {
            n.attrPreds = n.attrPreds :+ (m.group(3) -> m.group(5))
            start = m.end(6)
          }
        }
      }
      list += n
      n
    }

  /** Split on '/' but re-join splits that landed inside a quoted
    * attribute value (x[@t='a/b']) — reference splitEscapeQuote. */
  private def splitEscapeQuote(s: String): List[String] = {
    val parts = s.split("/", -1)
    val out = mutable.ListBuffer[String]()
    var i = 0
    while (i < parts.length) {
      val sb = new StringBuilder(parts(i))
      var quotes = parts(i).count(_ == '\'')
      while (quotes % 2 == 1 && i + 1 < parts.length) {
        i += 1
        sb.append('/').append(parts(i))
        quotes += parts(i).count(_ == '\'')
      }
      out += sb.toString
      i += 1
    }
    // keep the leading empty segment(s): insert() strips exactly ONE so
    // '//x' (two empties) still presents one empty segment = wildcard.
    // TRAILING empties drop (the reference's limit-0 split): '/a/b/'
    // reads as '/a/b'.
    out.toList.reverse.dropWhile(_.isEmpty).reverse
  }

  /** Propagate wildcard-bearing ancestors down so matching can leap back
    * toward the root in one hop per level. */
  private def optimise(n: TreeNode, wa: TreeNode): Unit = {
    n.wildAncestor = wa
    val nextWa = if (n.wildChildren != null) n else wa
    // the reference's buildOptimise walks plain children only: a wildcard
    // node's own subtree keeps a null wild-ancestor (no re-matching of
    // '//' names within an already-matched wildcard element)
    if (n.children != null) n.children.foreach(optimise(_, nextWa))
  }

  // ---------- parsing -------------------------------------------------

  def streamRecords(xml: String,
                    handler: (Map[String, AnyRef], String) => Unit): Unit = {
    if (!optimised) { optimise(root, null); optimised = true }
    val parser = XmlRecordReader.factory
      .createXMLStreamReader(new java.io.StringReader(xml))
    val st = new ParseState(handler)
    try parseNode(root, parser, st, recordStarted = false)
    catch { case e: javax.xml.stream.XMLStreamException =>
      throw new RuntimeException(e)
    } finally parser.close()
  }

  def getAllRecords(xml: String): Seq[Map[String, AnyRef]] = {
    val out = mutable.ArrayBuffer[Map[String, AnyRef]]()
    streamRecords(xml, (rec, _) => out += rec)
    out.toSeq
  }

  /** The recursive element consumer: called with the parser positioned on
    * this node's START_ELEMENT; returns after its END_ELEMENT. */
  private def parseNode(node: TreeNode, parser: XMLStreamReader,
                        st: ParseState, recordStarted: Boolean): Unit = {
    val nowStarted = recordStarted || node.isRecord
    val frame: mutable.Set[String] =
      if (node.isRecord) { val f = mutable.Set[String](); st.frames.push(f); f }
      else if (recordStarted) st.frames.top
      else null
    try {
      if (node.attributes != null && node != root) {
        for (a <- node.attributes) {
          val v = parser.getAttributeValue(null, a.name)
          // inside a record even an absent attribute stores (null entry)
          if (v != null || (recordStarted && !node.isRecord))
            st.put(a.fieldName, v, a.multiValued, frame)
        }
      }
      val childrenFound = mutable.Set[TreeNode]()
      val text = new StringBuilder
      var flattenedDepth = 0
      var done = false
      while (!done) {
        parser.next() match {
          case XMLStreamConstants.END_ELEMENT =>
            if (flattenedDepth > 0) flattenedDepth -= 1
            else {
              if (node.hasText && frame != null)
                st.put(node.fieldName, text.toString, node.multiValued, frame)
              if (node.isRecord) st.emit(node.forEachPath)
              if (node.children != null && recordStarted && !node.isRecord &&
                !node.children.forall(childrenFound.contains))
                node.children.filterNot(childrenFound.contains)
                  .foreach(putNulls(_, st, frame))
              done = true
            }
          case e @ (XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA |
                    XMLStreamConstants.SPACE) if node.hasText || node.flatten =>
            if (node.hasText) text.append(parser.getText)
          case XMLStreamConstants.START_ELEMENT =>
            if (node.flatten) flattenedDepth += 1
            else startElement(node, parser, st, childrenFound, nowStarted)
          case XMLStreamConstants.END_DOCUMENT => done = true
          case _ =>
        }
      }
    } finally {
      if ((node.isRecord || !recordStarted) && st.frames.nonEmpty) {
        val purge = st.frames.pop()
        purge.foreach(st.values.remove)
      }
    }
  }

  /** A START_ELEMENT at `node`'s level: recurse if it matches a known
    * child or any ancestor's wildcard; otherwise skip the subtree while
    * still matching the wildcard local-name cache inside it. */
  private def startElement(node: TreeNode, parser: XMLStreamReader,
                           st: ParseState, childrenFound: mutable.Set[TreeNode],
                           recordStarted: Boolean): Unit = {
    val matched = matchNode(parser, node.children)
    if (matched != null) {
      childrenFound += matched
      parseNode(matched, parser, st, recordStarted)
      return
    }
    val descendCache = mutable.Map[String, TreeNode]()
    var dn = node
    var wildMatched: TreeNode = null
    while (dn != null && wildMatched == null) {
      if (dn.wildChildren != null) {
        wildMatched = matchNode(parser, dn.wildChildren)
        if (wildMatched == null)
          // plain put — later (root-ward) entries OVERWRITE, matching the
          // reference's HashMap.put walk (XPathRecordReader.java:364): the
          // root-most '//' spec wins a shared local name
          dn.wildChildren.foreach(n => descendCache.update(n.name, n))
      }
      dn = if (wildMatched == null) dn.wildAncestor else dn
    }
    if (wildMatched != null) {
      childrenFound += wildMatched
      parseNode(wildMatched, parser, st, recordStarted)
      return
    }
    // unknown subtree: skip, but wildcard names can still match inside
    var depth = 1
    while (depth != 0) {
      parser.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          descendCache.get(parser.getLocalName) match {
            case Some(nn) =>
              childrenFound += nn
              parseNode(nn, parser, st, recordStarted)
            case None => depth += 1
          }
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ =>
      }
    }
  }

  private def matchNode(parser: XMLStreamReader,
                        list: mutable.Buffer[TreeNode]): TreeNode = {
    if (list == null) return null
    val local = parser.getLocalName
    list.find { n =>
      n.name == local && n.attrPreds.forall { case (k, want) =>
        val v = parser.getAttributeValue(null, k)
        v != null && (want == null || want == v)
      }
    }.orNull
  }

  /** Index-alignment nulls for every unmatched multi-valued descendant
    * (reference putNulls). */
  private def putNulls(n: TreeNode, st: ParseState,
                       frame: mutable.Set[String]): Unit = {
    if (n.attributes != null)
      n.attributes.filter(_.multiValued)
        .foreach(a => st.put(a.fieldName, null, multi = true, frame))
    if (n.hasText && n.multiValued)
      st.put(n.fieldName, null, multi = true, frame)
    if (n.children != null) n.children.foreach(putNulls(_, st, frame))
  }
}

/** Spark integration for the XPath record reader. */
object XmlRecords {
  /** Flatten an XML-string column into records: one output row per
    * forEach match, with `passThrough` input columns retained. Fields
    * are (name, xpath, multiValued, flatten); multi-valued fields emit
    * array<string> (with null entries where the reference puts them),
    * others string. The spec tree builds once per partition; each row's
    * document parses streaming — fully data-parallel over documents. */
  def fromXml(df: DataFrame, xmlCol: String, forEach: String,
              fields: Seq[(String, String, Boolean, Boolean)],
              passThrough: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val passIdx = passThrough.map(c => c -> inSchema.fieldIndex(c))
    val xmlIdx = inSchema.fieldIndex(xmlCol)
    val outSchema = StructType(
      passIdx.map { case (c, i) => inSchema(i).copy(name = c) } ++
        fields.map { case (n, _, multi, _) =>
          if (multi) StructField(n, ArrayType(StringType, containsNull = true))
          else StructField(n, StringType)
        })
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      val rr = new XmlRecordReader(forEach)
      fields.foreach { case (n, xp, multi, flat) => rr.addField(n, xp, multi, flat) }
      it.flatMap { row =>
        val xml = row.getString(xmlIdx)
        if (xml == null) Iterator.empty
        else rr.getAllRecords(xml).iterator.map { rec =>
          val pass = passIdx.map { case (_, i) => row.get(i) }
          val vals = fields.map { case (n, _, multi, _) =>
            rec.get(n).map {
              case l: List[_] if multi => l.asInstanceOf[List[String]]
              case s => s
            }.orNull
          }
          Row.fromSeq(pass ++ vals)
        }
      }
    }(enc)
  }
}
