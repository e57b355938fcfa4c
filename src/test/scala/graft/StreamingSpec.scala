package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.corpus.PagesCorpus
import graft.streaming.IncrementalIndex
import graft.tokenize.Tokenizer

/** Streaming incremental maintenance (reference ST1/ST2 semantics:
  * watcher-driven re-index, append-only, latest state wins).
  */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("currentTf heals v1 batches (no doc_len) exactly via per-batch tf sums") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft-stream-v1v2").toString
    // v1 batch (pre-doc_len schema), written directly as a legacy dir
    Seq(("alpha", 1L, 2, 0L), ("beta", 1L, 3, 0L), ("gamma", 2L, 4, 0L))
      .toDF("term", "doc_id", "tf", "batch")
      .write.parquet(s"$idx/stream_tf/batch=0")
    // v2 batch carrying doc_len (doc 2 re-indexed: latest wins)
    Seq(("delta", 2L, 7, 1L, 7L))
      .toDF("term", "doc_id", "tf", "batch", "doc_len")
      .write.parquet(s"$idx/stream_tf/batch=1")
    val got = IncrementalIndex.currentTf(spark, idx)
      .select("term", "doc_id", "tf", "doc_len")
      .as[(String, Long, Int, Long)].collect().toSet
    assert(got == Set(
      ("alpha", 1L, 2, 5L), // healed: 2 + 3
      ("beta", 1L, 3, 5L),
      ("delta", 2L, 7, 7L))) // v2 value kept; batch-0 doc 2 superseded
  }

  test("incremental stream ingests new files and updates overwrite old state") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-stream-src").toString
    val idx = Files.createTempDirectory("graft-stream-idx").toString

    // wave 1: docs 0..49
    val wave1 = PagesCorpus.pages(spark, 50, parts = 2)
      .select("doc_id", "url", "text")
    wave1.write.mode(SaveMode.Overwrite).parquet(s"$src/wave1")
    val schema = wave1.schema

    val q1 = IncrementalIndex.start(spark, s"$src/wave*", idx, schema)
    q1.awaitTermination()

    // currentTf carries doc_len (v2 tf schema); compare the tf triples
    val tf1 = IncrementalIndex.currentTf(spark, idx)
      .select("term", "doc_id", "tf")
    val batchTf1 = wave1.where(graft.extract.Extract.safe(col("text")))
      .select(col("doc_id"), explode(Tokenizer.tokensCol(col("text"))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).cast("int").as("tf"))
    assert(tf1.count() == batchTf1.count())
    assert(tf1.except(batchTf1).isEmpty && batchTf1.except(tf1).isEmpty)

    // wave 2: docs 50..79 arrive + doc 1 is MODIFIED (new content)
    val wave2 = PagesCorpus.pages(spark, 80, parts = 2)
      .where(col("doc_id") >= 50)
      .select("doc_id", "url", "text")
      .unionAll(Seq((1L, PagesCorpus.url(1),
        "completely new body with replacement tokens only"))
        .toDF("doc_id", "url", "text"))
    wave2.write.mode(SaveMode.Overwrite).parquet(s"$src/wave2")

    val q2 = IncrementalIndex.start(spark, s"$src/wave*", idx, schema)
    q2.awaitTermination()

    val tf2 = IncrementalIndex.currentTf(spark, idx)
      .select("term", "doc_id", "tf")
    // new docs present
    assert(tf2.where(col("doc_id") === 60).count() > 0)
    // modified doc: latest wins — old tokens gone, new tokens present
    val doc1Terms = tf2.where(col("doc_id") === 1)
      .select("term").as[String].collect().toSet
    assert(doc1Terms == Set("completely", "new", "body", "with",
      "replacement", "tokens", "only"))
    // unmodified docs unchanged
    val d5a = tf1.where(col("doc_id") === 5).orderBy("term")
      .collect().map(_.toString).toSeq
    val d5b = tf2.where(col("doc_id") === 5).orderBy("term")
      .collect().map(_.toString).toSeq
    assert(d5a == d5b)
    // docs dimension tracks latest doc_len
    val dl = IncrementalIndex.currentDocs(spark, idx)
      .where(col("doc_id") === 1).select("doc_len").head().getLong(0)
    assert(dl == 7L)

    // compaction: streamed state -> full serving index, query-identical
    // to a single-node oracle over the SAME latest-wins state
    val out = Files.createTempDirectory("graft-stream-compact").toString
    val served = IncrementalIndex.compact(spark, idx, out)
    val docsNow = IncrementalIndex.currentDocs(spark, idx).count()
    assert(served.stats.num_docs == docsNow)
    val hits = graft.query.Bm25Query
      .searchBlocks(served, "replacement tokens", 10).collect()
    assert(hits.map(_.doc_id).toSeq == Seq(1L))
    // a term from doc 1's OLD body that appears nowhere else must be gone
    val tf2Terms = tf2.where(col("doc_id") === 1).count()
    assert(tf2Terms == 7L)
  }
}
