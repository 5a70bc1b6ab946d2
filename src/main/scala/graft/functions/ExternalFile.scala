package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ExternalFileField / FileFloatSource (reference
  * solr/core/src/java/org/apache/solr/schema/ExternalFileField.java:47,
  * solr/core/src/java/org/apache/solr/search/function/FileFloatSource
  * .java:241-325): per-doc float values sourced OUTSIDE the index from
  * `external_<field>` lines "key=value", exposed as a function-query
  * ValueSource (sort/boost by a frequently-updated signal without
  * reindexing).
  *
  * Replicated semantics:
  *  - the delimiter is the LAST '=' on the line (keys may contain '=',
  *    FileFloatSource.java:280-284);
  *  - unparsable floats are skipped and do NOT erase an earlier value
  *    (:289-295 continue before vals[] assignment);
  *  - later lines overwrite earlier ones (vals[doc] = fval in file
  *    order, :310-311);
  *  - keys missing from the index are ignored; docs missing from the
  *    file get defVal (:241-244).
  *
  * Spark shape: the "file" is a (lineNo, line) frame; parse is one
  * narrow pass, last-wins is one keyed max_by agg, application is a
  * (usually broadcast) left join + coalesce(default) — no index rebuild,
  * same as the reference's reload-on-commit cache.
  */
object ExternalFile {

  /** Parse external-file lines into (key, value), last occurrence wins. */
  def parse(lines: Dataset[(Long, String)]): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines
      .flatMap { case (lineNo, line) =>
        val d = line.lastIndexOf('=')
        if (d < 0) None
        else {
          val key = line.substring(0, d)
          try Some((key, line.substring(d + 1).toFloat, lineNo))
          catch { case _: NumberFormatException => None }
        }
      }
      .toDF("key", "value", "line_no")
      .groupBy("key")
      .agg(max_by(col("value"), col("line_no")).as("value"))
  }

  /** Attach the external value to `docs` as column `ext` (defVal when
    * the doc's key has no line). The parsed frame is tiny relative to
    * the corpus — broadcast it. */
  def joinValues(docs: DataFrame, keyCol: String, parsed: DataFrame,
                 defVal: Float): DataFrame =
    docs.join(broadcast(parsed), docs(keyCol) === parsed("key"), "left")
      .withColumn("ext", coalesce(col("value"), lit(defVal)))
      .drop("key", "value")
}
