package graft
import org.apache.spark.sql.functions._
import graft.corpus.PagesCorpus
import graft.tokenize.Tokenizer
object TfProf {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-tfprof").toString
    val corpus = s"${System.getProperty("java.io.tmpdir")}/graft-scale-corpus-" +
      s"$n-${ScalingBench.WorkloadVersion}"
    val pages = (if (java.nio.file.Files.exists(java.nio.file.Paths.get(corpus, "_SUCCESS")))
        spark.read.parquet(corpus) else PagesCorpus.pages(spark, n, parts = 64).toDF())
      .withColumn("text2", col("text")).select(col("doc_id"), col("text2").as("text"))
    pages.write.mode("overwrite").parquet(s"$out/pages")
    val p = spark.read.parquet(s"$out/pages")
    def t[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[tfprof] $name ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    // A: current — explode + groupBy shuffle
    t("A explode+groupBy") {
      p.select(col("doc_id"), explode(Tokenizer.tokensCol(col("text"))).as("term"))
        .groupBy("term", "doc_id").agg(count(lit(1)).cast("int").as("tf"))
        .write.mode("overwrite").parquet(s"$out/tfA")
    }
    // B: doc-local typed flatMap, zero shuffle
    t("B flatMap doc-local") {
      p.select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, text) =>
          val m = new java.util.HashMap[String, Integer]()
          Tokenizer.tokenize(text).foreach(t0 => m.merge(t0, 1, (a, b) => a + b))
          val b = Vector.newBuilder[(String, Long, Int)]
          m.forEach((k, v) => b += ((k, id, v.intValue)))
          b.result()
        }.toDF("term", "doc_id", "tf")
        .write.mode("overwrite").parquet(s"$out/tfB")
    }
    // repeat to null out warmup
    t("A2 explode+groupBy") {
      p.select(col("doc_id"), explode(Tokenizer.tokensCol(col("text"))).as("term"))
        .groupBy("term", "doc_id").agg(count(lit(1)).cast("int").as("tf"))
        .write.mode("overwrite").parquet(s"$out/tfA2")
    }
    t("B2 flatMap doc-local") {
      p.select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, text) =>
          val m = new java.util.HashMap[String, Integer]()
          Tokenizer.tokenize(text).foreach(t0 => m.merge(t0, 1, (a, b) => a + b))
          val b = Vector.newBuilder[(String, Long, Int)]
          m.forEach((k, v) => b += ((k, id, v.intValue)))
          b.result()
        }.toDF("term", "doc_id", "tf")
        .write.mode("overwrite").parquet(s"$out/tfB2")
    }
    val ca = spark.read.parquet(s"$out/tfA").count()
    val cb = spark.read.parquet(s"$out/tfB").count()
    println(s"[tfprof] rowsA=$ca rowsB=$cb equal=${ca == cb}")
    spark.stop()
    ScalingBench.deleteRecursively(out)
  }
}
