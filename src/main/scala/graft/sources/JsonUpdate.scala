package graft.sources

import com.fasterxml.jackson.core.{JsonFactory, JsonToken, JsonParser => JParser}
import scala.collection.mutable

/** Solr JSON update command mode (/update/json — reference
  * handler/loader/JsonLoader.java:60-470): the command grammar
  * `{"add": {...}, "delete": ..., "commit": {}, ...}` parsed into typed
  * update commands.
  *
  * Reference behaviors reproduced exactly:
  *  - Top level: an OBJECT of (repeatable) command keys, or a bare ARRAY
  *    of docs = implicit adds; "add" may hold one `{doc:...}` object or
  *    an array of raw docs (handleAdds).
  *  - parseAdd: `doc` (exactly one), `overwrite`, `commitWithin`,
  *    `boost`; the doc's boost applies at OBJECT_END.
  *  - parseDoc: duplicate field names accumulate multi-valued;
  *    `_childDocuments_` is an array of nested docs; a field value may
  *    be an extended object `{boost, value, ...other}` — other keys
  *    become an extendedInfo map (this is how atomic-update commands
  *    like {"set": v} ride) with `value` folded in; null values yield a
  *    zero-value field.
  *  - delete: scalar id (numbers/booleans stringified via getString),
  *    array of deletes, or a map with id/query/commitWithin/_version_/
  *    _route_; missing id AND query is an error.
  *  - commit/optimize accept an options object (waitSearcher,
  *    openSearcher, ...); rollback takes an empty object.
  *  - Single quotes and unquoted names accepted (noggit leniency).
  */
object JsonUpdate {

  sealed trait Cmd
  final case class Add(doc: Doc, overwrite: Boolean = true,
                       commitWithin: Long = -1,
                       boost: Double = 1.0) extends Cmd
  final case class Delete(id: Option[String], query: Option[String],
                          commitWithin: Long = -1,
                          version: Option[Long] = None,
                          route: Option[String] = None) extends Cmd
  final case class Commit(optimize: Boolean,
                          options: Map[String, Any]) extends Cmd
  case object Rollback extends Cmd

  /** One raw addField entry; `value` is a scalar, a List, a Map
    * (extendedInfo) or null. */
  final case class FieldEntry(name: String, value: Any, boost: Double)

  final case class Doc(entries: Seq[FieldEntry], children: Seq[Doc]) {
    /** Flattened non-null values of a field across duplicate entries
      * (SolrInputField.getValues posture). */
    def valuesOf(name: String): Seq[Any] =
      entries.filter(_.name == name).flatMap {
        case FieldEntry(_, null, _) => Nil
        case FieldEntry(_, l: Seq[_], _) => l
        case FieldEntry(_, v, _) => Seq(v)
      }
    def boostOf(name: String): Double =
      entries.find(_.name == name).map(_.boost).getOrElse(1.0)
  }

  // factory + scalar coercion shared with JsonRecordReader
  private def factory: JsonFactory = JsonRecordReader.factory

  def parse(content: String, defaultOverwrite: Boolean = true,
            defaultCommitWithin: Long = -1): Seq[Cmd] = {
    val out = mutable.ArrayBuffer[Cmd]()
    val p = factory.createParser(content)
    try {
      var t = p.nextToken()
      while (t != null) {
        t match {
          case JsonToken.START_ARRAY => // bare doc array = implicit adds
            handleAdds(p, out, defaultOverwrite, defaultCommitWithin)
          case JsonToken.START_OBJECT =>
            var e = p.nextToken()
            while (e != JsonToken.END_OBJECT) {
              require(e == JsonToken.FIELD_NAME, s"unexpected $e")
              p.currentName() match {
                case "add" =>
                  p.nextToken() match {
                    case JsonToken.START_OBJECT =>
                      out += parseAdd(p, defaultOverwrite, defaultCommitWithin)
                    case JsonToken.START_ARRAY =>
                      handleAdds(p, out, defaultOverwrite, defaultCommitWithin)
                    case other => sys.error(s"add expects object/array, got $other")
                  }
                case "commit" =>
                  out += Commit(optimize = false, commitOptions(p))
                case "optimize" =>
                  out += Commit(optimize = true, commitOptions(p))
                case "delete" => handleDelete(p, out, defaultCommitWithin)
                case "rollback" =>
                  require(p.nextToken() == JsonToken.START_OBJECT &&
                    p.nextToken() == JsonToken.END_OBJECT, "rollback {}")
                  out += Rollback
                case other => sys.error(s"Unknown command '$other'")
              }
              e = p.nextToken()
            }
          case _ =>
        }
        t = p.nextToken()
      }
    } finally p.close()
    out.toSeq
  }

  private def handleAdds(p: JParser, out: mutable.ArrayBuffer[Cmd],
                         ow: Boolean, cw: Long): Unit = {
    var e = p.nextToken()
    while (e != JsonToken.END_ARRAY) {
      require(e == JsonToken.START_OBJECT, s"doc expected, got $e")
      out += Add(parseDoc(p), ow, cw)
      e = p.nextToken()
    }
  }

  private def parseAdd(p: JParser, ow0: Boolean, cw0: Long): Add = {
    var doc: Doc = null
    var ow = ow0; var cw = cw0; var boost = 1.0
    var e = p.nextToken()
    while (e != JsonToken.END_OBJECT) {
      require(e == JsonToken.FIELD_NAME, s"key expected, got $e")
      p.currentName() match {
        case "doc" =>
          require(doc == null, "Multiple documents in same add command")
          require(p.nextToken() == JsonToken.START_OBJECT, "doc object")
          doc = parseDoc(p)
        case "overwrite" => p.nextToken(); ow = p.getBooleanValue
        case "commitWithin" => p.nextToken(); cw = p.getLongValue
        case "boost" => p.nextToken(); boost = p.getDoubleValue
        case other => sys.error(s"Unknown key '$other'")
      }
      e = p.nextToken()
    }
    require(doc != null, "Missing solr document")
    Add(doc, ow, cw, boost)
  }

  /** Parser positioned after the doc's START_OBJECT. */
  private def parseDoc(p: JParser): Doc = {
    val entries = mutable.ArrayBuffer[FieldEntry]()
    val children = mutable.ArrayBuffer[Doc]()
    var e = p.nextToken()
    while (e != JsonToken.END_OBJECT) {
      require(e == JsonToken.FIELD_NAME, s"field name expected, got $e")
      val name = p.currentName()
      if (name == "_childDocuments_") {
        require(p.nextToken() == JsonToken.START_ARRAY, "child docs array")
        var c = p.nextToken()
        while (c != JsonToken.END_ARRAY) {
          require(c == JsonToken.START_OBJECT, "child doc object")
          children += parseDoc(p)
          c = p.nextToken()
        }
      } else {
        val v = p.nextToken()
        if (v == JsonToken.START_OBJECT) {
          // extended value: {boost, value, ...extendedInfo}
          var boost = 1.0
          var value: Any = null
          var ext: mutable.LinkedHashMap[String, Any] = null
          var k = p.nextToken()
          while (k != JsonToken.END_OBJECT) {
            require(k == JsonToken.FIELD_NAME, s"label expected, got $k")
            p.currentName() match {
              case "boost" => p.nextToken(); boost = p.getDoubleValue
              case "value" => value = normalValue(p.nextToken(), p)
              case other =>
                if (ext == null) ext = mutable.LinkedHashMap()
                ext(other) = normalValue(p.nextToken(), p)
            }
            k = p.nextToken()
          }
          if (ext != null) {
            if (value != null) ext("value") = value
            entries += FieldEntry(name, ext.toMap, boost)
          } else entries += FieldEntry(name, value, boost)
        } else entries += FieldEntry(name, normalValue(v, p), 1.0)
      }
      e = p.nextToken()
    }
    Doc(entries.toSeq, children.toSeq)
  }

  private def normalValue(t: JsonToken, p: JParser): Any = t match {
    case JsonToken.START_ARRAY =>
      val lst = mutable.ArrayBuffer[Any]()
      var e = p.nextToken()
      while (e != JsonToken.END_ARRAY) {
        // keep JSON nulls: JsonLoader.parseArrayFieldValue adds EVERY
        // element, so ["a",null,"b"] is 3 values (one null) in command mode
        // (the null-dropping coercion is only the split-mode reader's rule)
        lst += normalValue(e, p)
        e = p.nextToken()
      }
      lst.toList
    // a nested OBJECT as a field value is an ERROR in the 5.2 reference
    // (JsonLoader.parseSingleFieldValue default case) — later Solr adds
    // parseObjectFieldValue; we match the reference version
    case other =>
      JsonRecordReader.jsonScalar(other, p) match {
        case JsonRecordReader.NotScalar =>
          sys.error(s"Error parsing JSON field value: $other")
        case v => v
      }
  }

  /** delete: scalar | array | map (JsonLoader.handleDeleteCommand). */
  private def handleDelete(p: JParser, out: mutable.ArrayBuffer[Cmd],
                           cw: Long): Unit = {
    p.nextToken() match {
      case JsonToken.START_ARRAY =>
        var e = p.nextToken()
        while (e != JsonToken.END_ARRAY) {
          singleDelete(e, p, out, cw)
          e = p.nextToken()
        }
      case t => singleDelete(t, p, out, cw)
    }
  }

  private def singleDelete(t: JsonToken, p: JParser,
                           out: mutable.ArrayBuffer[Cmd], cw0: Long): Unit =
    t match {
      case JsonToken.START_OBJECT =>
        var id: Option[String] = None
        var query: Option[String] = None
        var cw = cw0
        var version: Option[Long] = None
        var route: Option[String] = None
        var e = p.nextToken()
        while (e != JsonToken.END_OBJECT) {
          require(e == JsonToken.FIELD_NAME, s"key expected, got $e")
          p.currentName() match {
            // a JSON null id is treated as absent (not Some(null)): it
            // must not satisfy the id-or-query check below and would NPE
            // any consumer of id.get downstream
            case "id" => p.nextToken(); id = Option(scalarString(p))
            case "query" => p.nextToken(); query = Some(p.getText)
            case "commitWithin" => p.nextToken(); cw = p.getLongValue
            case "_version_" => p.nextToken(); version = Some(p.getLongValue)
            case "_route_" => p.nextToken(); route = Some(p.getText)
            case other => sys.error(s"Unknown key '$other'")
          }
          e = p.nextToken()
        }
        require(id.isDefined || query.isDefined,
          "Missing id or query for delete")
        out += Delete(id, query, cw, version, route)
      case _ =>
        out += Delete(Some(scalarString(p)), None, cw0)
    }

  /** getString: numbers/booleans stringify, null stays null. */
  private def scalarString(p: JParser): String = p.currentToken() match {
    case JsonToken.VALUE_NULL => null
    case _ => p.getText
  }

  private def commitOptions(p: JParser): Map[String, Any] = {
    require(p.nextToken() == JsonToken.START_OBJECT, "options object")
    val m = mutable.LinkedHashMap[String, Any]()
    var e = p.nextToken()
    while (e != JsonToken.END_OBJECT) {
      require(e == JsonToken.FIELD_NAME, s"key expected, got $e")
      val k = p.currentName()
      m(k) = normalValue(p.nextToken(), p)
      e = p.nextToken()
    }
    m.toMap
  }
}
