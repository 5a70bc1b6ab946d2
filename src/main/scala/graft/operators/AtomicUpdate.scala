package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One atomic-update instruction against one document: apply `op` to
  * `field` with `values`, in ascending `seq` order within the doc (Solr
  * applies a partial document's modifiers in field order; `seq` makes
  * that order explicit and shuffle-stable). */
final case class FieldOp(seq: Long, field: String, op: String,
                         values: Seq[String])

/** A document in the SolrInputDocument shape: unique key + an ordered
  * multivalued field map (every Solr field is a name -> collection of
  * values; single-valued fields are one-element lists). */
final case class FieldDoc(id: String, fields: Map[String, Seq[String]])

/** Solr field-level atomic updates (reference
  * solr/core/src/java/org/apache/solr/update/processor/AtomicUpdateDocumentMerger.java:77-214
  * and the realtime-get + merge + reindex flow in
  * DistributedUpdateProcessor.getUpdatedDocument): a partial document of
  * {op: value} modifiers is merged into the CURRENT stored fields of the
  * target doc, and the merged full document is re-indexed. Op semantics,
  * each with the reference's exact quirks:
  *
  *  - `set`     — replace the field wholesale (`doSet` -> setField);
  *                an empty value list removes the field (set-to-null).
  *  - `add`     — append values to the existing collection (`doAdd` ->
  *                addField; creates the field when missing).
  *  - `inc`     — numeric increment of the FIRST existing value; the
  *                result is written back as a SINGLE value (doInc calls
  *                setField with the scalar — a multivalued field
  *                collapses). A missing field is SET to the increment
  *                (doInc's null branch). Int/long vs float/double typing
  *                follows the schema (`numeric` map here).
  *  - `remove`  — for each requested value, remove the FIRST matching
  *                occurrence only (doRemove -> Collection.remove(Object),
  *                java.util.List semantics).
  *  - `removeregex` — collect every value the pattern FULLY matches
  *                (doRemoveRegex -> Matcher.matches, not find), then
  *                remove ALL occurrences of the collected values
  *                (removeAll) — note the first/all asymmetry vs `remove`.
  *
  * Updating the unique-key field is an error (merge() guards it with a
  * 400); modifiers addressed at a MISSING document start from an empty
  * document (the upsert branch of getUpdatedDocument). Documents with no
  * modifiers pass through unchanged.
  *
  * Spark shape, 100-TB posture: the updates frame is grouped once on the
  * doc key (sort_array over (seq,...) structs keeps application order
  * without a window), then a single key equi-join against the stored
  * docs — AQE broadcasts it when the update batch is small, falls back
  * to a shuffle join when it isn't; the merge itself is a narrow per-row
  * map. No driver-side iteration, no skew surface beyond the join key
  * itself (unique doc ids). */
object AtomicUpdate {

  /** Apply one doc's modifier list to its field map. Pure, driver-free;
    * also the unit under direct property testing. */
  def applyOps(fields: Map[String, Seq[String]], ops: Seq[FieldOp],
               idField: String,
               numeric: Map[String, String]): Map[String, Seq[String]] = {
    var f = fields
    ops.sortBy(_.seq).foreach { o =>
      if (o.field == idField)
        throw new IllegalArgumentException(
          s"Invalid update of id field: ${o.field}") // Solr 400
      val vs = Option(o.values).getOrElse(Seq.empty)
      o.op match {
        case "set" =>
          f = if (vs.isEmpty) f - o.field else f.updated(o.field, vs)
        case "add" =>
          f = f.updated(o.field, f.getOrElse(o.field, Seq.empty) ++ vs)
        case "inc" =>
          val incBy = vs.head
          f.get(o.field).flatMap(_.headOption) match {
            case None => f = f.updated(o.field, Seq(incBy))
            case Some(first) =>
              val out = numeric.getOrElse(o.field, "long") match {
                case "double" => (first.toDouble + incBy.toDouble).toString
                case _        => (first.toLong + incBy.toLong).toString
              }
              f = f.updated(o.field, Seq(out)) // collapses to a scalar
          }
        case "remove" =>
          f.get(o.field).foreach { cur =>
            var rem = cur.toBuffer
            vs.foreach { v =>
              val i = rem.indexOf(v) // first occurrence only
              if (i >= 0) rem.remove(i)
            }
            f = f.updated(o.field, rem.toSeq)
          }
        case "removeregex" =>
          f.get(o.field).foreach { cur =>
            val pats = vs.map(_.r.pattern)
            val doomed = cur.filter(v =>
              pats.exists(_.matcher(v).matches())).toSet
            f = f.updated(o.field, cur.filterNot(doomed)) // all occurrences
          }
        case other =>
          // reference logs-and-ignores unknown ops (merge() default arm)
          ()
      }
    }
    f
  }

  /** Merge an updates frame into a docs frame.
    *
    * @param docs    (id STRING, fields MAP<STRING, ARRAY<STRING>>)
    * @param updates (id STRING, seq LONG, field STRING, op STRING,
    *                values ARRAY<STRING>)
    * @param numeric field -> "long" | "double" for `inc` typing
    * @return        the post-merge docs frame, same shape as `docs`,
    *                including upserted docs whose id only appeared in
    *                `updates`.
    */
  def merge(docs: DataFrame, updates: DataFrame,
            idField: String = "id",
            numeric: Map[String, String] = Map.empty): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ops = updates
      .select(col("id").as("_1"),
        struct(col("seq"), col("field"), col("op"), col("values")).as("o"))
      .groupBy($"_1").agg(sort_array(collect_list($"o")).as("_3"))
    val idf = idField
    val num = numeric
    docs.select(col("id").as("_1"), col("fields").as("_2"))
      .join(ops, Seq("_1"), "full_outer")
      .as[(String, Map[String, Seq[String]], Seq[FieldOp])]
      .map { case (id, f0, o0) =>
        val f = Option(f0).getOrElse(Map.empty[String, Seq[String]])
        FieldDoc(id, if (o0 == null) f else applyOps(f, o0, idf, num))
      }
      .toDF("id", "fields")
  }

  /** Corpus adapter: atomic updates over the engine's DocInput stored
    * fields (repo,path = the unique key; lang/content updatable). Returns
    * full merged DocInput rows ready for IndexBuilder.updateDocs — the
    * realtime-get -> merge -> updateDocument flow of the reference, with
    * the stored fields coming from the source-of-truth table (SURVEY
    * §2.1: stored fields are a join back to the source). */
  def mergeDocInputs(docs: DataFrame, updates: DataFrame): DataFrame = {
    val sep = "\u0000"
    val asFieldDocs = docs.select(
      concat(col("repo"), lit(sep), col("path")).as("id"),
      map(lit("lang"), array(col("lang")),
          lit("content"), array(col("content"))).as("fields"))
    val keyed = updates.select(
      concat(col("repo"), lit(sep), col("path")).as("id"),
      col("seq"), col("field"), col("op"), col("values"))
    merge(asFieldDocs, keyed)
      .select(
        split(col("id"), sep).getItem(0).as("repo"),
        split(col("id"), sep).getItem(1).as("path"),
        element_at(col("fields"), "lang").getItem(0).as("lang"),
        element_at(col("fields"), "content").getItem(0).as("content"))
      .withColumn("commit", md5(col("content")))
      .select("repo", "path", "commit", "lang", "content")
  }
}
