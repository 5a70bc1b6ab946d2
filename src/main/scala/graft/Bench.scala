package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // time every one-off index/fixture build explicitly so the query
    // entries measure pure query latency, not build + query
    def timedBuild(body: => Any): Double = {
      val t0 = System.nanoTime()
      try body catch { case _: Throwable => }
      (System.nanoTime() - t0) / 1e9
    }
    val builds = Seq(
      "ft_index_build" -> timedBuild(SparkEntry.reader(spark, sfDir)),
      "ft_nrt_build" -> timedBuild(SparkEntry.nrtReader(spark, sfDir)),
      "ft_stemmed_build" -> timedBuild(SparkEntry.stemmedReader(spark, sfDir)),
      "ft_lang_builds" -> timedBuild(SparkEntry.langReaders(spark, sfDir,
        Seq("german", "french", "spanish", "portuguese", "russian",
          "swedish", "finnish", "hungarian", "norwegian", "czech"))),
      "ft_syn_build" -> timedBuild(SparkEntry.synReader(spark, sfDir)),
      "ft_compound_build" -> timedBuild(SparkEntry.compoundReader(spark, sfDir)),
      "ft_rev_build" -> timedBuild(SparkEntry.revReader(spark, sfDir)),
      "ft_delete_build" -> timedBuild(SparkEntry.deletedReaders(spark, sfDir)),
      "ft_update_build" -> timedBuild(SparkEntry.updatedReaders(spark, sfDir)),
      "ft_sorted_build" -> timedBuild(SparkEntry.sortedDocsDir(spark, sfDir)),
      "ann_ivf_build" -> timedBuild {
        val (c, a) = SparkEntry.ivfIndex(spark, sfDir); c.count(); a.count()
      },
      "dedup_minhash_build" ->
        timedBuild(SparkEntry.minhashPairs(spark, sfDir).count()))
    val results = builds.toMap ++
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    // The driver stores only the last ~2000 chars of output, so the ONE
    // JSON line is laid out to survive a front truncation: per-query
    // times rounded to ms and sorted ascending (the expensive,
    // informative entries land at the END), with metric/value/sf as the
    // final keys.
    def r3(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.toSeq.sortBy(_._2)
      .map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"queries":$qs,"n_queries":${results.size},"unit":"sec","sf":"$sfDir","metric":"total","value":${r3(total)}}""")
    spark.stop()
  }
}
