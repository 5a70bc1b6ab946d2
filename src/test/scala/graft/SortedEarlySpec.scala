package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Index-sorted early termination (SortingMergePolicy +
  * EarlyTerminatingSortingCollector analog): the per-segment take(k)
  * union must equal the full sort's top-k for arbitrary k and segment
  * layouts, including ties straddling segment boundaries. */
class SortedEarlySpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  test("per-segment take(k) union == full-sort top-k across layouts") {
    // deterministic data with HEAVY ties (n_chars has only 13 distinct
    // values over 700 rows) so tie groups straddle segment boundaries
    val rows = (0L until 700L).map(i => (i, (i * 37 % 13) * 100))
    for (nSegs <- Seq(1, 3, 4, 7); k <- Seq(1, 5, 23)) {
      val dir = SparkSuite.tmpDir(s"graft-se-$nSegs-$k")
      rows.toDF("doc_id", "n_chars")
        .repartitionByRange(nSegs, col("n_chars").desc, col("doc_id"))
        .sortWithinPartitions(col("n_chars").desc, col("doc_id"))
        .write.mode("overwrite").parquet(dir)
      val got = SparkEntry.sortedEarlyTopK(spark, dir, k)
        .as[(Long, Long)].collect().toSeq
      val want = rows.sortBy { case (id, nc) => (-nc, id) }.take(k)
      assert(got == want, s"nSegs=$nSegs k=$k")
    }
  }
}
