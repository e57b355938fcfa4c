package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sub-document chunking — chunk-level retrieval units, the Spark
  * re-expression of the reference's fixed-window chunker with overlap
  * (/root/reference/src/semantic/chunking.rs:20-28: line windows of
  * `chunk_size` stepping by `chunk_size - overlap`).
  *
  * Chunk c of a doc covers lines [c*step, c*step + size) with
  * step = size - overlap; trailing chunks may be short, chunk ids are
  * contiguous from 0. Implementation is line-membership driven — each
  * line generates the (small, bounded by ceil(size/step)) set of chunk
  * ids it belongs to via `sequence`, then one groupBy(doc_id, chunk)
  * reassembles chunk text in line order. Everything stays in Catalyst
  * builtins (codegen; no UDF), and the shuffle key (doc_id, chunk) is
  * fine-grained enough that giant docs spread over many reducers.
  */
object Chunking {

  def chunks(pages: DataFrame, sizeLines: Int = 8, overlap: Int = 2): DataFrame = {
    require(sizeLines > 0 && overlap >= 0 && overlap < sizeLines,
      "need 0 <= overlap < sizeLines")
    val step = sizeLines - overlap
    val lines = pages.select(col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("ln0", "line")))
    // line L belongs to chunks c with c*step <= L < c*step + size:
    // c_min = 0 for L < size else (L - size)/step + 1, c_max = L/step
    // (all values nonnegative, so double-divide + trunc-cast is exact)
    val cMin = when(col("ln0") < sizeLines, lit(0L))
      .otherwise(((col("ln0") - sizeLines) / step).cast("long") + 1)
    val cMax = (col("ln0") / step).cast("long")
    lines
      .select(col("doc_id"), col("ln0"), col("line"),
        explode(sequence(cMin, cMax)).as("chunk"))
      .groupBy("doc_id", "chunk")
      .agg(
        min("ln0").as("start_line"),
        max("ln0").as("end_line"),
        count(lit(1)).as("n_lines"),
        concat_ws("\n",
          transform(array_sort(collect_list(struct(col("ln0"), col("line")))),
            _.getField("line"))).as("chunk_text"))
  }
}
