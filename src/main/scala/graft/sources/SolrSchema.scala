package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Solr schema.xml binding: fieldType / field / dynamicField / copyField
  * declarations with the reference's exact wildcard semantics
  * (solr/core/src/java/org/apache/solr/schema/IndexSchema.java:999-1160):
  *
  *  - a dynamicField pattern is `*suffix` (NameEndsWith), `prefix*`
  *    (NameStartsWith) or a literal name (NameEquals) — `*` is only
  *    valid at one end (isValidFieldGlob);
  *  - dynamic fields resolve LONGEST regex first
  *    (DynamicReplacement.compareTo, dynamicFieldListToSortedArray);
  *    explicit fields always win over dynamic ones (getFieldOrNull);
  *  - copyField sources/dests may be globs: a glob source paired with a
  *    dynamic dest substitutes the source remainder into the dest
  *    pattern (DynamicCopy.getTargetField: remainder + subst); an
  *    explicit source may target a dynamic dest only when the dest has
  *    no asterisk (registerCopyField:929-936, the "only supports a
  *    dynamic destination with an asterisk if the source also has an
  *    asterisk" rule); maxChars truncates the copied value
  *    (CopyField.getLimitedValue: val.substring(0, maxChars) when
  *    val.length >= maxChars);
  *  - copyFieldTargetCounts backs isCopyFieldTarget.
  *
  * The Spark side ([[bind]]) maps a DataFrame whose column names are
  * Solr field names through the schema: every column must resolve to an
  * explicit or dynamic field (Solr's unknown-field 400), and every
  * copyField materializes its destination column — multi-valued dests
  * collect contributions in (dynamic-copies-then-explicit, declaration)
  * order exactly like getCopyFieldsList; a single-valued dest receiving
  * more than one value is the reference's index-time error. */
object SolrSchema {

  final case class FieldType(name: String, clazz: String,
                             analyzer: Option[String])

  final case class SchemaField(name: String, typeName: String,
                               multiValued: Boolean, indexed: Boolean,
                               stored: Boolean)

  // ---- DynamicPattern (IndexSchema.java:1000-1044) ----
  sealed abstract class DynamicPattern(val regex: String,
                                       protected val fixedStr: String) {
    def matches(name: String): Boolean
    def remainder(name: String): String
    def subst(replacement: String): String
    final def length: Int = regex.length
  }
  private final class NameStartsWith(rx: String)
      extends DynamicPattern(rx, rx.substring(0, rx.length - 1)) {
    def matches(n: String): Boolean = n.startsWith(fixedStr)
    def remainder(n: String): String = n.substring(fixedStr.length)
    def subst(r: String): String = fixedStr + r
  }
  private final class NameEndsWith(rx: String)
      extends DynamicPattern(rx, rx.substring(1)) {
    def matches(n: String): Boolean = n.endsWith(fixedStr)
    def remainder(n: String): String =
      n.substring(0, n.length - fixedStr.length)
    def subst(r: String): String = r + fixedStr
  }
  private final class NameEquals(rx: String)
      extends DynamicPattern(rx, rx) {
    def matches(n: String): Boolean = regex == n
    def remainder(n: String): String = ""
    def subst(r: String): String = fixedStr
  }
  object DynamicPattern {
    def create(regex: String): DynamicPattern =
      if (regex.startsWith("*")) new NameEndsWith(regex)
      else if (regex.endsWith("*")) new NameStartsWith(regex)
      else new NameEquals(regex)
    def isEquals(p: DynamicPattern): Boolean = p.isInstanceOf[NameEquals]
  }

  final case class DynamicField(prototype: SchemaField) {
    val pattern: DynamicPattern = DynamicPattern.create(prototype.name)
    def matches(name: String): Boolean = pattern.matches(name)
    def regex: String = pattern.regex
    def makeSchemaField(name: String): SchemaField =
      prototype.copy(name = name)
  }

  /** One resolved copy instruction for a concrete source field. */
  final case class CopyField(source: SchemaField, dest: SchemaField,
                             maxChars: Int) {
    /** CopyField.getLimitedValue */
    def limitedValue(v: String): String =
      if (maxChars == 0 || v.length < maxChars) v
      else v.substring(0, maxChars)
  }

  private final case class DynamicCopy(pattern: DynamicPattern,
                                       destination: DynamicField,
                                       maxChars: Int) {
    def matches(name: String): Boolean = pattern.matches(name)
    /** DynamicCopy.getTargetField: remainder -> subst */
    def targetField(sourceField: String): SchemaField =
      destination.makeSchemaField(
        destination.pattern.subst(pattern.remainder(sourceField)))
  }

  /** isValidFieldGlob (IndexSchema.java): at most one '*', only at an
    * end. */
  def isValidGlob(s: String): Boolean = {
    val stars = s.count(_ == '*')
    stars == 0 ||
      (stars == 1 && (s.startsWith("*") || s.endsWith("*")))
  }

  final class Schema(val types: Map[String, FieldType],
                     val fields: Map[String, SchemaField],
                     dynamicList: Seq[DynamicField],
                     copyDecls: Seq[(String, String, Int)]) {

    /** Longest regex first; stable for ties (declaration order) —
      * dynamicFieldListToSortedArray + DynamicReplacement.compareTo. */
    val dynamicFields: Array[DynamicField] =
      dynamicList.sortBy(-_.pattern.length).toArray

    private val copyFieldsMap =
      mutable.LinkedHashMap[String, mutable.ArrayBuffer[CopyField]]()
    private val dynamicCopies = mutable.ArrayBuffer[DynamicCopy]()
    private val targetCounts = mutable.LinkedHashMap[String, Int]()

    copyDecls.foreach { case (s, d, m) => registerCopyField(s, d, m) }

    /** getFieldOrNull: explicit first, then first (longest) matching
      * dynamic. */
    def fieldOrNull(name: String): Option[SchemaField] =
      fields.get(name).orElse(
        dynamicFields.find(_.matches(name)).map(_.makeSchemaField(name)))

    def field(name: String): SchemaField =
      fieldOrNull(name).getOrElse(
        throw new IllegalArgumentException(s"undefined field: $name"))

    def dynamicPattern(name: String): Option[String] =
      dynamicFields.find(_.matches(name)).map(_.regex)

    def isCopyFieldTarget(name: String): Boolean =
      targetCounts.contains(name)

    /** registerCopyField (IndexSchema.java:846-940). */
    private def registerCopyField(source: String, dest: String,
                                  maxChars: Int): Unit = {
      require(isValidGlob(source),
        s"copyField source :'$source' is an invalid glob: only one asterisk, at the start or end")
      require(isValidGlob(dest),
        s"copyField dest :'$dest' is an invalid glob: only one asterisk, at the start or end")
      val sourceIsGlob = source.contains("*")
      var sourceSchemaField = fields.get(source)
      // a glob that matches some explicit field is handled as a glob
      val sourceIsExplicitFieldGlob = sourceSchemaField.isEmpty &&
        sourceIsGlob && {
          val rx = java.util.regex.Pattern.compile(source.replace("*", ".*"))
          fields.keysIterator.exists(f => rx.matcher(f).matches())
        }
      var sourceIsDynamicFieldReference = false
      var destSchemaField = fields.get(dest)
      var destDynamicField: Option[DynamicField] = None
      if (destSchemaField.isEmpty ||
        (sourceSchemaField.isEmpty && !sourceIsExplicitFieldGlob)) {
        dynamicFields.foreach { df =>
          if (sourceSchemaField.isEmpty && !sourceIsDynamicFieldReference &&
            !sourceIsExplicitFieldGlob && df.matches(source))
            sourceIsDynamicFieldReference = true
          if (destSchemaField.isEmpty) {
            if (dest == df.regex) {
              destDynamicField = Some(df)
              destSchemaField = Some(df.prototype)
            } else if (df.matches(dest)) {
              val f = df.makeSchemaField(dest)
              destSchemaField = Some(f)
              destDynamicField = Some(DynamicField(f))
            }
          }
        }
      }
      require(sourceSchemaField.isDefined || sourceIsGlob ||
        sourceIsDynamicFieldReference,
        s"copyField source :'$source' is not a glob and doesn't match any explicit field or dynamicField")
      require(destSchemaField.isDefined,
        s"copyField dest :'$dest' is not an explicit field and doesn't match a dynamicField")
      def count(): Unit =
        targetCounts(destSchemaField.get.name) =
          targetCounts.getOrElse(destSchemaField.get.name, 0) + 1
      if (sourceIsGlob || sourceIsDynamicFieldReference) {
        val destDyn = destDynamicField.getOrElse(
          DynamicField(destSchemaField.get))
        if (!sourceIsGlob && destDynamicField.isEmpty) {
          // source: no-asterisk dynamic field ref ; dest: explicit field
          val src = field(source)
          copyFieldsMap.getOrElseUpdate(source, mutable.ArrayBuffer()) +=
            CopyField(src, destSchemaField.get, maxChars)
          count()
        } else {
          dynamicCopies += DynamicCopy(DynamicPattern.create(source),
            destDyn, maxChars)
          count()
        }
      } else {
        destDynamicField match {
          case Some(dd) if !DynamicPattern.isEquals(dd.pattern) =>
            throw new IllegalArgumentException(
              "copyField only supports a dynamic destination with an " +
                "asterisk if the source also has an asterisk")
          case Some(dd) =>
            // explicit source -> asterisk-free dynamic dest ref: the
            // reference registers a DynamicCopy (:929-933)
            dynamicCopies += DynamicCopy(DynamicPattern.create(source),
              dd, maxChars)
            count()
          case None =>
            copyFieldsMap.getOrElseUpdate(source, mutable.ArrayBuffer()) +=
              CopyField(sourceSchemaField.getOrElse(field(source)),
                destSchemaField.get, maxChars)
            count()
        }
      }
    }

    /** getCopyFieldsList: dynamic copies (declaration order) then the
      * fixed map's entries. */
    def copyFieldsList(sourceField: String): Seq[CopyField] =
      dynamicCopies.toSeq.filter(_.matches(sourceField)).map(dc =>
        CopyField(field(sourceField), dc.targetField(sourceField),
          dc.maxChars)) ++
        copyFieldsMap.get(sourceField).map(_.toSeq).getOrElse(Nil)

    /** Bind a DataFrame of Solr-named columns: resolve every column
      * (unknown field = the reference's 400), then materialize every
      * copyField destination. Multi-valued dests collect contributions
      * as an array in getCopyFieldsList-then-declaration order; a
      * single-valued dest with >1 contribution (or a contribution on
      * top of its own source column) raises, like the reference's
      * index-time multiple-values error. maxChars truncation applies
      * per contribution. */
    def bind(df: DataFrame): DataFrame = {
      val cols = df.columns.toSeq
      cols.foreach(field) // unknown column -> error
      val contributions =
        mutable.LinkedHashMap[String, mutable.ArrayBuffer[Column]]()
      cols.foreach { c =>
        copyFieldsList(c).foreach { cf =>
          val v =
            if (cf.maxChars == 0) col(c).cast("string")
            else when(length(col(c).cast("string")) < cf.maxChars,
              col(c).cast("string"))
              .otherwise(substring(col(c).cast("string"), 1, cf.maxChars))
          contributions.getOrElseUpdate(cf.dest.name,
            mutable.ArrayBuffer()) += v
        }
      }
      contributions.foldLeft(df) { case (acc, (dest, vs)) =>
        val f = field(dest)
        val own = if (cols.contains(dest)) 1 else 0
        if (!f.multiValued && vs.length + own > 1)
          throw new IllegalArgumentException(
            s"multiple values encountered for non multiValued copy field " +
              s"$dest")
        if (f.multiValued) {
          val all = (if (own == 1) Seq(col(dest).cast("string")) else Nil) ++
            vs.toSeq
          acc.withColumn(dest, array(all: _*))
        } else acc.withColumn(dest, vs.head)
      }
    }
  }

  /** Spark type of a schema field, from its fieldType's solr class
    * (schema/TrieField.java + StrField/TextField/BoolField): what a
    * migrator needs to materialize a typed DataFrame column for a Solr
    * field. multiValued fields wrap in an array. */
  def sparkType(types: Map[String, FieldType],
                f: SchemaField): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    val elem: DataType =
      types.get(f.typeName).map(_.clazz).getOrElse("") match {
        case "solr.TrieIntField" | "solr.IntField" => IntegerType
        case "solr.TrieLongField" | "solr.LongField" => LongType
        case "solr.TrieFloatField" | "solr.FloatField" => FloatType
        case "solr.TrieDoubleField" | "solr.DoubleField" => DoubleType
        case "solr.TrieDateField" | "solr.DateField" => TimestampType
        case "solr.BoolField" => BooleanType
        case "solr.BinaryField" => BinaryType
        case _ => StringType // StrField, TextField, unknown
      }
    if (f.multiValued) ArrayType(elem) else elem
  }

  /** Parse schema.xml (both nested <types>/<fields> and flat layouts). */
  def parse(xml: String): Schema = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      false)
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(new java.io.StringReader(xml))
    val types = mutable.LinkedHashMap[String, FieldType]()
    val fields = mutable.LinkedHashMap[String, SchemaField]()
    val dyn = mutable.ArrayBuffer[DynamicField]()
    val copies = mutable.ArrayBuffer[(String, String, Int)]()
    var inFieldType: String = null
    var inFieldTypeClass: String = ""
    var inAnalyzer = false
    var analyzerName: String = null
    def attr(name: String): Option[String] = {
      val n = r.getAttributeCount
      (0 until n).find(i => r.getAttributeLocalName(i) == name)
        .map(r.getAttributeValue)
    }
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "fieldType" | "fieldtype" =>
              inFieldType = attr("name").getOrElse(
                sys.error("fieldType needs a name"))
              inFieldTypeClass = attr("class").getOrElse("")
              analyzerName = null
            case "analyzer" if inFieldType != null =>
              inAnalyzer = true
            case "tokenizer" | "filter" if inAnalyzer =>
              // record the chain very coarsely: the graft analyzer name
              // rides in a class-derived tag (full chain fidelity is the
              // Analysis module's job, not the schema binder's)
              if (analyzerName == null)
                analyzerName = attr("class").getOrElse("")
            case "field" =>
              val name = attr("name").get
              fields(name) = SchemaField(name,
                attr("type").getOrElse("string"),
                attr("multiValued").exists(_.toBoolean),
                attr("indexed").forall(_.toBoolean),
                attr("stored").forall(_.toBoolean))
            case "dynamicField" =>
              val name = attr("name").get
              require(isValidGlob(name) && name.contains("*"),
                s"dynamicField must have an asterisk at one end: $name")
              dyn += DynamicField(SchemaField(name,
                attr("type").getOrElse("string"),
                attr("multiValued").exists(_.toBoolean),
                attr("indexed").forall(_.toBoolean),
                attr("stored").forall(_.toBoolean)))
            case "copyField" =>
              copies += ((attr("source").get, attr("dest").get,
                attr("maxChars").map(_.toInt).getOrElse(0)))
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "fieldType" | "fieldtype" =>
              if (inFieldType != null)
                types(inFieldType) = FieldType(inFieldType,
                  inFieldTypeClass, Option(analyzerName))
              inFieldType = null
            case "analyzer" => inAnalyzer = false
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    new Schema(types.toMap, fields.toMap, dyn.toSeq, copies.toSeq)
  }
}
