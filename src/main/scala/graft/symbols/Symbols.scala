package graft.symbols

import java.util.Locale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Symbols-only search mode — the Spark re-expression of the reference's
  * symbol subsystem: extraction (/root/reference/src/symbols/extractor.rs:
  * 8-123, tree-sitter there) and `search_symbols`
  * (src/search/engine.rs:1628-1824), 15% of the validator's load-test
  * workload (src/bin/fast_code_search_validator.rs:744-768).
  *
  * The extraction stand-in for web text: one symbol per line — the line's
  * first token (length > 2, lowercased), kind cycled from the line number
  * (the reference's kinds come from tree-sitter node types; the STRUCTURE
  * — an exploded `symbols(doc_id, name, kind, line)` table feeding a
  * name-field search — is the operator being grafted, and a real extractor
  * drops in as another `extract`). Search semantics mirror the reference:
  * case-insensitive containment on the name, exact name == query doubled
  * (engine.rs:1795-1800), top-k by (score DESC, doc_id ASC).
  */
object Symbols {

  /** `pages(doc_id, text) -> symbols(doc_id, name, kind, line)` (line is
    * 1-based). Pure Catalyst — split/filter/posexplode stay in codegen.
    */
  def extract(pages: DataFrame): DataFrame =
    pages
      .select(col("doc_id"),
        posexplode(split(col("text"), "\n")).as(Seq("ln0", "line")))
      .select(col("doc_id"),
        (col("ln0") + 1).cast("int").as("line"),
        get(filter(split(lower(col("line")), "[^a-z0-9]+"),
          t => length(t) > lit(2)), lit(0)).as("name"))
      .where(col("name").isNotNull)
      .select(col("doc_id"), col("name"),
        when(col("line") % 3 === 1, "def")
          .when(col("line") % 3 === 2, "ref")
          .otherwise("use").as("kind"),
        col("line"))

  /** Symbols-only top-k: docs scored by their matching symbols
    * (containment, exact-name weight x2), with the first matching line
    * exposed (the reference returns the symbol's line per match).
    */
  def search(symbols: DataFrame, query: String, k: Int): DataFrame = {
    val q = query.trim.toLowerCase(Locale.ROOT)
    val kk = math.max(1, math.min(k, 1000))
    symbols
      .where(col("name").contains(q))
      .withColumn("w",
        when(col("name") === q, lit(2.0)).otherwise(lit(1.0)))
      .groupBy("doc_id")
      .agg(sum("w").as("score"),
        count(lit(1)).cast("long").as("n_matches"),
        min("line").as("first_line"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(kk)
  }
}
