package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Round-8 profiler for the index build: runs the REAL
  * SparkEntry.warmIndex and prints every Spark job's wall time with its
  * description/callsite, so the build's internal stages can be ranked
  * without touching the frozen bench. Not part of the driver contract.
  */
object BuildJobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-build-prof")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val stageName = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse(stageName)
        starts.put(j.jobId, (System.nanoTime(),
          s"${j.stageInfos.size}st $desc"))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.get(j.jobId)).foreach { case (t0, desc) =>
          val s = (System.nanoTime() - t0) / 1e9
          println(f"[job] ${j.jobId}%3d  $s%7.3f s  $desc")
        }
      }
    })

    val t0 = System.nanoTime()
    SparkEntry.warmIndex(spark, sfDir)
    println(f"[build] total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    Thread.sleep(500)
    spark.stop()
  }
}
