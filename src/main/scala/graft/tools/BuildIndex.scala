package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index._
import graft.search.{BoolQ, JoinScorer, Occur, QueryParser}

/** Production entrypoint for `spark-submit` on a real cluster:
  *
  * {{{
  * spark-submit --class graft.tools.BuildIndex app.jar \
  *   build <inputTable.parquet> <indexDir> \
  *     [numDocParts] [numBuckets] [shufflePartitions] [hotDfThreshold]
  * spark-submit --class graft.tools.BuildIndex app.jar \
  *   query <indexDir> <numBuckets> "<classic query>" [k]
  * spark-submit --class graft.tools.BuildIndex app.jar \
  *   check <indexDir> <numBuckets> [inputTable.parquet]
  * spark-submit --class graft.tools.BuildIndex app.jar \
  *   delete <indexDir> <numBuckets> "<classic query>"
  * spark-submit --class graft.tools.BuildIndex app.jar \
  *   compact <indexDir> <outDir> [numDocParts] [numBuckets]
  * spark-submit --class graft.tools.BuildIndex app.jar \
  *   snapshot <indexDir> <name>
  * spark-submit --class graft.tools.BuildIndex app.jar \
  *   backup <indexDir> <name> <destDir>
  * }}}
  *
  * No `master`/memory settings here — spark-submit owns cluster sizing
  * (the N-vs-4N executors of the north rule). A killed build re-submitted
  * with the same arguments resumes from its per-stage lineage markers.
  * Sizing guidance at 10^12-file scale: numDocParts ~ totalDocs / 5e5
  * (segment invert batches), shufflePartitions ~ clusterCores * 2-3,
  * hotDfThreshold ~ totalDocs / 100 with saltShift chunking hot terms to
  * ~1e6-posting chunks.
  */
object BuildIndex {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("graft-" + args(0)).getOrCreate()
    args(0) match {
      case "build" =>
        val Array(_, input, dir) = args.take(3)
        val cfg = IndexConfig(
          numDocParts = if (args.length > 3) args(3).toInt else 256,
          numBuckets = if (args.length > 4) args(4).toInt else 64,
          shufflePartitions = if (args.length > 5) args(5).toInt else 256,
          hotDfThreshold = if (args.length > 6) args(6).toLong else 100000L)
        IndexBuilder.build(spark, spark.read.parquet(input), dir, cfg)
        val r = new IndexReader(spark, dir, cfg.numBuckets, cacheData = false)
        println(s"[build] done: maxDoc=${r.collStats.maxDoc} " +
          s"sumTtf=${r.collStats.sumTotalTermFreq} -> $dir")
      case "query" =>
        val Array(_, dir, nb, q) = args.take(4)
        val k = if (args.length > 4) args(4).toInt else 10
        val r = new IndexReader(spark, dir, nb.toInt)
        new JoinScorer(r).topK(QueryParser.parse(q), k).show(k, false)
      case "check" =>
        val Array(_, dir, nb) = args.take(3)
        val src = if (args.length > 3) Some(spark.read.parquet(args(3))) else None
        val r = new IndexReader(spark, dir, nb.toInt, cacheData = false)
        val res = CheckIndex.run(r, src).collect()
        res.foreach(c => println(f"[check] ${c.check}%-24s ${c.violations}"))
        if (res.exists(_.violations > 0)) sys.exit(2)
      case "delete" =>
        val Array(_, dir, nb, q) = args.take(4)
        val cfg = IndexConfig(numBuckets = nb.toInt)
        val n = IndexBuilder.deleteByQuery(spark, dir, cfg,
          QueryParser.parse(q))
        println(s"[delete] tombstoned $n docs (stats unchanged until " +
          s"compact) -> $dir/deletes")
      case "compact" =>
        val Array(_, dir, out) = args.take(3)
        val cfg = IndexConfig(
          numDocParts = if (args.length > 3) args(3).toInt else 256,
          numBuckets = if (args.length > 4) args(4).toInt else 64)
        IndexBuilder.compact(spark, dir, out, cfg)
        val r = new IndexReader(spark, out, cfg.numBuckets, cacheData = false)
        println(s"[compact] done: maxDoc=${r.collStats.maxDoc} " +
          s"sumTtf=${r.collStats.sumTotalTermFreq} -> $out")
      case "snapshot" =>
        val Array(_, dir, name) = args.take(3)
        val m = Snapshot.create(spark, dir, name)
        println(s"[snapshot] pinned '$name': ${m.subs.size} sub-index(es), " +
          s"${m.subs.map(_.deleteFiles.size).sum} tombstone file(s)")
      case "backup" =>
        val Array(_, dir, name, dest) = args.take(4)
        Snapshot.backup(dir, name, dest)
        println(s"[backup] snapshot '$name' -> $dest (self-contained; " +
          "open it directly to restore)")
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
