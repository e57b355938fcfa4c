package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: the flagship entry query must return rows. */
class EntrySpec extends AnyFunSuite {
  test("SparkEntry.entry returns hits on sf0.001") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists)
    val df = SparkEntry.entry(TestSpark.spark)
    assert(df.count() > 0)
    assert(df.columns.toSet == Set("doc_id", "score"))
  }
}
