package graft

import graft.log.LogSpec
import graft.table.IceTable
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only profiling probe (guide §1/§7): run ONE query (args(0)) after a
  * JVM warmup, with a listener printing every Spark job's wall time and
  * description — shows where a multi-job engine query spends its time.
  * Not part of the measurement contract. */
object ProbeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // extra session confs for A/B probes: "k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    if (sys.env.get("SPARK_GRAFT_CODEGEN_LOG").contains("1"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
        org.apache.logging.log4j.Level.INFO)
    val fn = SparkEntry.queries(name)
    // warmup: engine + this query at sf0.001
    val dir = java.nio.file.Files.createTempDirectory("graft-warm")
    try {
      val t = IceTable.create(s"$dir/table", numBuckets = 32)
      graft.driver.ReplayJob.replayGenerated(spark, t,
        LogSpec(nEvents = 200000, nRepos = 500, nPathsPerRepo = 400),
        nEpochs = 1)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    try { fn(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count(); () }
    catch { case e: Throwable => System.err.println(s"[warm] ${e.getMessage}") }

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
          System.err.println(f"[job] ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $desc")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val reps = sys.env.getOrElse("SPARK_GRAFT_QREPS", "1").toInt
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      System.err.println(f"[probe] $name rep $i total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
