package graft

import org.apache.spark.sql.SparkSession

/** Round-8 repeat-profiler: runs chosen gates N times inside ONE JVM and
  * prints every rep (min = the signal on a noisy host). Not part of the
  * frozen driver bench.
  *
  *   sbt "runMain graft.RepProf <reps> <gate> [gate ...]"
  */
object RepProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val gates = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-rep-prof")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // slow-job tracer: any Spark job over 2 s prints its first stage's
    // callsite, so intermittent stalls attribute to a concrete operator
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId,
            (System.nanoTime(), j.stageInfos.lastOption.map(_.name).getOrElse("?")))
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          Option(starts.get(j.jobId)).foreach { case (t0, name) =>
            val s = (System.nanoTime() - t0) / 1e9
            if (s > 2.0) println(f"[slowjob] ${j.jobId}%3d $s%7.3f s  $name")
          }
      })
    SparkEntry.warmIndex(spark, sfDir)
    gates.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[rep] $name%-24s min ${ts.min}%7.3f  " +
        ts.map(t => f"$t%.3f").mkString(" "))
    }
    spark.stop()
  }
}
