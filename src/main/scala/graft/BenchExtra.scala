package graft

import graft.log.LogSpec
import graft.table.IceTable
import org.apache.spark.sql.SparkSession

/**
 * Dev-only benchmark harness for the optimization rounds (guide §1.4). NOT
 * the round artifact — `graft.Bench` stays the frozen measurement contract.
 * Differences from Bench:
 *   - warms the JVM first (small replay + one pass of each selected query at
 *     sf0.001) so per-query times are not dominated by cold JIT/codegen, the
 *     same thermal state the full Bench's query leg runs in (its ingest legs
 *     precede the query timings);
 *   - SPARK_GRAFT_ONLY=csv filters to a query subset;
 *   - SPARK_GRAFT_QREPS=k times each query k times and reports min
 *     (best-of-k suppresses the documented 2.4x host noise).
 * Methodology is otherwise identical: fn(spark, sfDir).queryExecution
 * .toRdd.count() at local[32], shuffle.partitions=32, AQE on.
 */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_QREPS", "1").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sel = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // warmup: replay (engine codegen paths) + one untimed pass per query at
    // sf0.001 (query-specific codegen)
    if (!sys.env.get("SPARK_GRAFT_NOWARM").contains("1")) {
      val dir = java.nio.file.Files.createTempDirectory("graft-warm")
      try {
        val t = IceTable.create(s"$dir/table", numBuckets = 32)
        graft.driver.ReplayJob.replayGenerated(spark, t,
          LogSpec(nEvents = 200000, nRepos = 500, nPathsPerRepo = 400),
          nEpochs = 1)
      } finally
        org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
      sel.foreach { case (n, fn) =>
        try { fn(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count(); () }
        catch { case e: Throwable =>
          System.err.println(s"[warm] $n failed: ${e.getMessage}") }
      }
    }
    val results = sel.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).queryExecution.toRdd.count(); () }
        catch { case e: Throwable =>
          System.err.println(s"[benchx] $name FAILED: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"bench":"extra","queries":$qs%s,"total_query_sec":$total%.2f,"sf":"$sfDir%s","reps":$reps%d}""")
    spark.stop()
  }
}
