package graft

import scala.collection.mutable.LinkedHashMap

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one warm session, every SparkEntry query timed
  * once (the index build for the BM25 queries is timed separately as
  * `index_build`). Prints exactly ONE JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = LinkedHashMap.empty[String, Double]
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // index build (extract+tokenize+tf+dict+postings+blocks) over documents
    results += "index_build" -> time(SparkEntry.warmIndex(spark, sfDir))

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      results += name -> (try time(fn(spark, sfDir).count())
        catch { case _: Throwable => -1.0 })
    }

    val qs = results.map { case (k, v) => "\"" + k + f"""":${v}%.3f""" }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
