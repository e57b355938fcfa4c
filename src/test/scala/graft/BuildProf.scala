package graft

import org.apache.spark.sql.functions._
import graft.corpus.PagesCorpus
import graft.extract.Extract
import graft.tokenize.Tokenizer
import graft.index.{Bm25, PostingBlocks}

/** Stage-level profile of the index build (scratch tool, not shipped). */
object BuildProf {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = java.nio.file.Files.createTempDirectory("graft-prof").toString
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val raw = PagesCorpus.pages(spark, n, parts = 64).toDF()
    t("0 corpus gen (count only)") { raw.count() }
    t("1 extract+safety (count)") {
      raw.withColumn("text", Extract.extractText(col("html")))
        .where(col("text").isNotNull && Extract.safe(col("text"))).count()
    }
    val pages = raw.withColumn("text", Extract.extractText(col("html")))
      .where(col("text").isNotNull && Extract.safe(col("text")))
      .select("doc_id", "url", "text")
    t("2 tokenize+explode (count)") {
      pages.select(explode(Tokenizer.tokensCol(col("text"))).as("t")).count()
    }
    val tf = graft.index.IndexBuilder.termFrequencies(pages)
    t("3 tf agg + write") { tf.write.parquet(s"$out/tf") }
    val tfR = spark.read.parquet(s"$out/tf")
    t("4 docLens") { tfR.groupBy("doc_id").agg(first("doc_len")).count() }
    t("5 terms dict + write") {
      graft.index.IndexBuilder.writeDictionary(spark, tfR, n, s"$out/terms")
    }
    val termsR = spark.read.parquet(s"$out/terms")
    t("6 postings join+sort+write") {
      tfR.drop("term") // v3 tf carries the computed term_id
        .join(broadcast(termsR.select("term_id", "idf")), Seq("term_id"))
        .select(col("term_id"), col("doc_id"),
          Bm25.impactCol(col("tf").cast("double"),
            col("doc_len").cast("double"), 500.0, col("idf")).as("impact"))
        .repartitionByRange(col("term_id"))
        .sortWithinPartitions("term_id", "doc_id")
        .write.parquet(s"$out/postings")
    }
    t("7 blocks encode+bucketed write") {
      PostingBlocks.writeBlocks(spark.read.parquet(s"$out/postings"), out, 64)
    }
    spark.stop()
    ScalingBench.deleteRecursively(out)
  }
}
