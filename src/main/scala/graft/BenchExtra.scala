package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-8 optimization-side profiler (guide §1.4): NOT part of the frozen
  * driver bench. Times individual gates through the noop sink (so the
  * computation is measured, not the count() pruning), twice each (cold
  * plan+JIT vs warm), labels jobs, and dumps `.explain("formatted")` for
  * the queries under optimization to plans/r08/. Usage:
  *
  *   sbt "runMain graft.BenchExtra [gate ...]"     // default: hot set
  *   SPARK_GRAFT_PLANS_SUFFIX=_after               // plan file suffix
  */
object BenchExtra {

  private val HotSet = Seq(
    "chunk_typed", "dedup_jaccard_pairs", "dedup_clusters", "dedup_minhash",
    "sym_code_extract", "sym_code_search", "sym_code_search_indexed",
    "sim_ivfpq_topk", "sim_ivf_kpp_topk", "a3_edges_indegree",
    "p3_regex_batch", "dedup_simhash", "sim_lsh_neardups")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLANS_SUFFIX", "_before")
    val plansDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "/root/repo/plans/r08")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val gates = if (args.nonEmpty) args.toSeq else HotSet
    new java.io.File(plansDir).mkdirs()

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm the shared artifacts once (index + symbol artifacts), so the
    // per-gate numbers measure the OPERATOR like the driver bench's warm
    // session does after its first-touch gates
    val tWarm = time(SparkEntry.warmIndex(spark, sfDir))
    println(f"[extra] warm_index $tWarm%.3f s")

    gates.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[extra] unknown gate: $name")
        case Some(fn) =>
          spark.sparkContext.setJobDescription(s"extra:$name")
          val df1 = fn(spark, sfDir)
          val plan = df1.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          val pw = new java.io.PrintWriter(s"$plansDir/$name$suffix.txt")
          try pw.write(plan) finally pw.close()
          val t1 = time(noop(df1))
          val t2 = time(noop(fn(spark, sfDir)))
          val t3 = time(fn(spark, sfDir).count())
          println(f"[extra] $name%-28s noop_cold $t1%7.3f  noop_warm $t2%7.3f  count $t3%7.3f")
      }
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
