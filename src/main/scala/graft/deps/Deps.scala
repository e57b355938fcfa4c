package graft.deps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document dependency graph — the Spark re-expression of the reference's
  * import-resolution subsystem (/root/reference/src/dependencies/mod.rs):
  *
  *   - import resolution (mod.rs:87-137): an import key (a path string
  *     there, any join key here — for web pages, a site/hub key) resolves
  *     to a canonical target doc via a broadcast hash join — the
  *     reference's filename inverted index IS a hash-join build side
  *     (SURVEY.md §2.3 J2);
  *   - in-degree maintenance (mod.rs:57-70,140-158): groupBy-count over
  *     the edges table;
  *   - dependents/dependencies lookup (mod.rs:166-179, engine.rs:
  *     2163-2170): filtered scans of the edges table, both directions;
  *   - dependency score boost `1 + log10(n) * 0.5` (engine.rs:2003-2007):
  *     a static-rank column on the docs dimension, multiplied into the
  *     relevance score at query time.
  *
  * Scale shape: edges are (long, long) rows; resolution broadcasts only
  * the target dictionary (one row per import key — bounded by the number
  * of link targets, not docs); in-degree is one map-side-combinable
  * aggregation.
  */
object Deps {

  /** J2: resolve `imports(from_doc, import_key)` against
    * `targets(import_key, to_doc)` (small — broadcast side). Self-edges
    * dropped like the reference (mod.rs:105 `from != to`).
    */
  def resolveEdges(imports: DataFrame, targets: DataFrame,
      broadcastTargets: Boolean = true): DataFrame =
    imports
      .join(if (broadcastTargets) broadcast(targets) else targets,
        Seq("import_key"))
      .where(col("from_doc") =!= col("to_doc"))
      .select("from_doc", "to_doc")

  /** href-attribute extraction from html content — the web analog of the
    * reference's import parsing out of file content (engine.rs:839-866 +
    * dependencies/mod.rs:87-137 parse imports per language; a web page's
    * "imports" are its anchors). Pure Catalyst `regexp_extract_all`,
    * codegen'd, no UDF.
    */
  val HrefPattern = "href=\"([^\"]+)\""

  def hrefs(html: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract_all(html, lit(HrefPattern), lit(1))

  /** Full content path: pages(doc_id, html) -> resolved edges. The url
    * dictionary `urlToDoc(import_key, to_doc)` (one row per known page
    * url) broadcasts into the resolution join; hrefs pointing outside the
    * corpus simply do not resolve (inner join) — the reference drops
    * unresolvable imports the same way (mod.rs:118-123).
    */
  def edgesFromHtml(pages: DataFrame, urlToDoc: DataFrame): DataFrame =
    // NO broadcast hint: a full-corpus url dictionary is doc-count-sized
    // (way past any executor broadcast budget at web scale) — the join
    // shuffles on the url key, and AQE upgrades it to a broadcast join at
    // runtime whenever the dictionary actually is small.
    // Par.spread: the href regex scan is row-wise CPU work — see Par.
    resolveEdges(
      graft.Par.spread(pages).select(col("doc_id").as("from_doc"),
        explode(hrefs(col("html"))).as("import_key")),
      urlToDoc, broadcastTargets = false)

  /** A3: in-degree per target doc. */
  def inDegree(edges: DataFrame): DataFrame =
    edges.groupBy(col("to_doc").as("doc_id"))
      .agg(count(lit(1)).as("in_degree"))

  /** J4: docs that depend on `id` (reference get_dependents). */
  def dependents(edges: DataFrame, id: Long): DataFrame =
    edges.where(col("to_doc") === id).select("from_doc")

  /** J4: docs that `id` depends on (reference get_dependencies). */
  def dependencies(edges: DataFrame, id: Long): DataFrame =
    edges.where(col("from_doc") === id).select("to_doc")

  /** A4: per-doc static rank from the dependency graph — the reference's
    * boost formula `1.0 + log10(dep_count) * 0.5` for docs with at least
    * one dependent (engine.rs:2003-2007), 1.0 otherwise (docs absent from
    * this table default to 1.0 at join time).
    */
  def staticRank(edges: DataFrame): DataFrame =
    inDegree(edges).select(
      col("doc_id"),
      (lit(1.0) + log10(col("in_degree").cast("double")) * 0.5)
        .as("static_rank"))
}
