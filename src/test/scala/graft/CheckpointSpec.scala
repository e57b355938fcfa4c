package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.checkpoint.CheckpointedBuild
import graft.corpus.PagesCorpus
import graft.query.Bm25Query

/** Kill-and-resume fixture (FIXTURES.md §4): interrupt the build after k
  * committed units, resume, assert (a) committed units not recomputed
  * (manifest timestamps unchanged), (b) final index content-identical to
  * an uninterrupted build.
  */
class CheckpointSpec extends AnyFunSuite {

  private val n = 300L
  private lazy val spark = TestSpark.spark

  private case class Boom() extends RuntimeException("injected kill")

  test("kill after 3 tf slices, resume, index content-identical") {
    val dirA = Files.createTempDirectory("graft-ckpt-a").toString
    val dirB = Files.createTempDirectory("graft-ckpt-b").toString
    val raw = PagesCorpus.pages(spark, n, parts = 4).toDF()

    // uninterrupted reference build
    val idxB = CheckpointedBuild.build(spark, raw, dirB, slices = 6)

    // interrupted build: die after the 3rd committed tf slice
    var committed = 0
    intercept[Boom] {
      CheckpointedBuild.build(spark, raw, dirA, slices = 6,
        onUnitCommitted = (stage, _) => {
          if (stage == "tf") { committed += 1; if (committed == 3) throw Boom() }
        })
    }
    assert((0 until 3).forall(p =>
      CheckpointedBuild.isCommitted(s"$dirA/tf/slice=$p")))
    assert((3 until 6).forall(p =>
      !CheckpointedBuild.isCommitted(s"$dirA/tf/slice=$p")))

    // snapshot manifest timestamps of the committed slices
    val before = CheckpointedBuild.manifest(spark, dirA)
      .where(col("stage") === "tf")
      .collect().map(r => r.getAs[Int]("part") -> r.getAs[Long]("committed_at")).toMap
    assert(before.keySet == Set(0, 1, 2))

    // resume
    val idxA = CheckpointedBuild.build(spark, raw, dirA, slices = 6)

    // (a) committed units were skipped: their manifest rows are untouched
    val after = CheckpointedBuild.manifest(spark, dirA)
      .where(col("stage") === "tf")
      .collect().map(r => r.getAs[Int]("part") -> r.getAs[Long]("committed_at")).toMap
    assert(after.size == 6)
    (0 until 3).foreach(p => assert(after(p) == before(p), s"slice $p recomputed"))

    // (b) content-identical index tables
    def canon(path: String, table: String, cols: Seq[String]): Seq[String] = {
      spark.read.parquet(s"$path/$table").select(cols.map(col): _*)
        .collect().map(_.toString).sorted.toSeq
    }
    assert(canon(dirA, "docs", Seq("doc_id", "url", "doc_len")) ==
      canon(dirB, "docs", Seq("doc_id", "url", "doc_len")))
    assert(canon(dirA, "terms", Seq("term_id", "term", "df", "idf")) ==
      canon(dirB, "terms", Seq("term_id", "term", "df", "idf")))
    assert(canon(dirA, "postings", Seq("term_id", "doc_id", "impact")) ==
      canon(dirB, "postings", Seq("term_id", "doc_id", "impact")))
    assert(canon(dirA, "blocks", Seq("term_id", "block_id", "n", "block_max")) ==
      canon(dirB, "blocks", Seq("term_id", "block_id", "n", "block_max")))
    assert(idxA.stats == idxB.stats)

    // and queries agree end-to-end
    val q = PagesCorpus.vocab(2)
    val a = Bm25Query.searchBlocks(idxA, q, 10).collect().map(h => (h.doc_id, h.score))
    val b = Bm25Query.searchBlocks(idxB, q, 10).collect().map(h => (h.doc_id, h.score))
    assert(a.toSeq == b.toSeq)
  }

  test("mutated input on resume: staleness triage rebuilds only the stale slice") {
    val dirA = Files.createTempDirectory("graft-ckpt-stale-a").toString
    val dirC = Files.createTempDirectory("graft-ckpt-stale-c").toString
    val raw = PagesCorpus.pages(spark, n, parts = 4).toDF()
    CheckpointedBuild.build(spark, raw, dirA, slices = 6)
    val before = CheckpointedBuild.manifest(spark, dirA)
      .where(col("stage") === "tf")
      .collect().map(r => r.getAs[Int]("part") -> r.getAs[Long]("committed_at")).toMap

    // mutate ONE doc (doc 123 lives in slice 2 of [0,300) x 6)
    val newHtml = "resumemutation fresh content for the stale slice check"
      .getBytes("UTF-8")
    val mutated = raw.withColumn("html",
      when(col("doc_id") === 123L, lit(newHtml)).otherwise(col("html")))

    // resume over the mutated input; fresh build as the ground truth
    val idxA = CheckpointedBuild.build(spark, mutated, dirA, slices = 6)
    val idxC = CheckpointedBuild.build(spark, mutated, dirC, slices = 6)

    // triage: slice 2 stale (recomputed), all others valid (untouched)
    val after = CheckpointedBuild.manifest(spark, dirA)
      .where(col("stage") === "tf")
      .collect().map(r => r.getAs[Int]("part") -> r.getAs[Long]("committed_at")).toMap
    assert(after(2) != before(2), "stale slice must be recomputed")
    Seq(0, 1, 3, 4, 5).foreach(p =>
      assert(after(p) == before(p), s"valid slice $p must not be recomputed"))
    val rec = CheckpointedBuild.manifest(spark, dirA)
      .where(col("stage") === "reconcile").collect()
    assert(rec.length == 1)
    assert(rec.head.getAs[String]("lineage") == "valid=5 stale=1 removed=0")

    // rebuilt index == from-scratch build of the mutated input
    def canon(path: String, table: String, cols: Seq[String]): Seq[String] =
      spark.read.parquet(s"$path/$table").select(cols.map(col): _*)
        .collect().map(_.toString).sorted.toSeq
    assert(canon(dirA, "docs", Seq("doc_id", "url", "doc_len")) ==
      canon(dirC, "docs", Seq("doc_id", "url", "doc_len")))
    assert(canon(dirA, "terms", Seq("term_id", "term", "df", "idf")) ==
      canon(dirC, "terms", Seq("term_id", "term", "df", "idf")))
    assert(canon(dirA, "postings", Seq("term_id", "doc_id", "impact")) ==
      canon(dirC, "postings", Seq("term_id", "doc_id", "impact")))
    assert(idxA.stats == idxC.stats)
    // the mutated content is actually served
    val hits = Bm25Query.searchBlocks(idxA, "resumemutation", 10).collect()
    assert(hits.map(_.doc_id).toSeq == Seq(123L))
  }

  test("resume with changed blockBits invalidates blocks, not tf slices") {
    val dirA = Files.createTempDirectory("graft-ckpt-cfg-a").toString
    val dirC = Files.createTempDirectory("graft-ckpt-cfg-c").toString
    val raw = PagesCorpus.pages(spark, n, parts = 4).toDF()
    CheckpointedBuild.build(spark, raw, dirA, slices = 4, blockBits = 8)
    val before = CheckpointedBuild.manifest(spark, dirA)
      .collect().map(r =>
        (r.getAs[String]("stage"), r.getAs[Int]("part")) ->
          r.getAs[Long]("committed_at")).toMap

    // resume with a DIFFERENT block geometry; fresh build = ground truth
    val idxA = CheckpointedBuild.build(spark, raw, dirA, slices = 4, blockBits = 6)
    val idxC = CheckpointedBuild.build(spark, raw, dirC, slices = 4, blockBits = 6)

    val after = CheckpointedBuild.manifest(spark, dirA)
      .collect().map(r =>
        (r.getAs[String]("stage"), r.getAs[Int]("part")) ->
          r.getAs[Long]("committed_at")).toMap
    // blocks rebuilt; tf/docs/terms/postings untouched
    assert(after(("blocks", 0)) != before(("blocks", 0)),
      "blocks must be rebuilt under the new blockBits")
    (0 until 4).foreach(p => assert(after(("tf", p)) == before(("tf", p)),
      s"tf slice $p must not be recomputed on a blockBits-only change"))
    Seq("docs", "terms", "postings", "stats").foreach(st =>
      assert(after((st, 0)) == before((st, 0)), s"$st must not be recomputed"))
    // config_reconcile row records the invalidation
    val cr = CheckpointedBuild.manifest(spark, dirA)
      .where(col("stage") === "config_reconcile").collect()
    assert(cr.length == 1)
    assert(cr.head.getAs[String]("lineage").contains("blockBits"))

    // rebuilt blocks == from-scratch blocks at the new geometry
    def canon(path: String, table: String, cols: Seq[String]): Seq[String] =
      spark.read.parquet(s"$path/$table").select(cols.map(col): _*)
        .collect().map(_.toString).sorted.toSeq
    assert(canon(dirA, "blocks", Seq("term_id", "block_id", "n", "block_max")) ==
      canon(dirC, "blocks", Seq("term_id", "block_id", "n", "block_max")))
    assert(idxA.blocksMeta == idxC.blocksMeta)
    val q = PagesCorpus.vocab(2)
    assert(Bm25Query.searchBlocks(idxA, q, 10).collect().map(h => (h.doc_id, h.score)).toSeq ==
      Bm25Query.searchBlocks(idxC, q, 10).collect().map(h => (h.doc_id, h.score)).toSeq)
  }

  test("bm25-config change after a mid-terms kill keeps committed " +
      "terms_part units AND their manifest rows (ADVICE r6: invalidation " +
      "matches exact unit names, not the terms_ prefix)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ckpt-bm25").toString
    val raw = PagesCorpus.pages(spark, n, parts = 4).toDF()
    // die after the 2nd committed terms_part slice — partials 0/1 are on
    // disk (the GC only runs after terms commits)
    intercept[Boom] {
      CheckpointedBuild.build(spark, raw, dir, slices = 4,
        onUnitCommitted = (stage, p) =>
          if (stage == "terms_part" && p == 1) throw Boom())
    }
    val before = CheckpointedBuild.manifest(spark, dir)
      .where(col("stage") === "terms_part")
      .collect().map(r => r.getAs[Int]("part") -> r.getAs[Long]("committed_at"))
      .toMap
    assert(before.keySet == Set(0, 1))
    // simulate a bm25 parameter change: rewrite the persisted PRIOR
    // fingerprint (K1/B are compile-time constants) — the reconcile then
    // invalidates terms/postings/blocks but must keep the partials, data
    // AND lineage rows
    val cfg = spark.read.parquet(s"$dir/manifest/config_0")
      .as[graft.checkpoint.ManifestRow].head()
    val mutated = cfg.copy(lineage = cfg.lineage.replaceAll(
      "bm25=[^;]*", "bm25=9.9,0.55"))
    Seq(mutated).toDS().write.mode("overwrite")
      .parquet(s"$dir/manifest/config_0")
    CheckpointedBuild.build(spark, raw, dir, slices = 4)
    val afterRows = CheckpointedBuild.manifest(spark, dir)
      .where(col("stage") === "terms_part")
      .collect().map(r => r.getAs[Int]("part") -> r.getAs[Long]("committed_at"))
      .toMap
    // pre-fix, rmManifestPrefix("terms") deleted terms_part_0/1's rows
    // (prefix collision); the data-dir markers skipped the recompute, so
    // the loss was SILENT — exactly what this asserts against
    assert(afterRows.keySet == Set(0, 1, 2, 3))
    assert(afterRows(0) == before(0) && afterRows(1) == before(1),
      "committed partials' manifest rows must survive a bm25-only change")
    // the reconcile recorded the bm25 invalidation
    val cr = CheckpointedBuild.manifest(spark, dir)
      .where(col("stage") === "config_reconcile").collect()
    assert(cr.length == 1 && cr.head.getAs[String]("lineage").contains("bm25"))
  }

  test("kill mid-postings: committed postings slices are not recomputed") {
    val dirA = Files.createTempDirectory("graft-ckpt-post-a").toString
    val dirB = Files.createTempDirectory("graft-ckpt-post-b").toString
    val raw = PagesCorpus.pages(spark, n, parts = 4).toDF()
    val idxB = CheckpointedBuild.build(spark, raw, dirB, slices = 6)

    // die after the 3rd committed postings slice
    var committed = 0
    intercept[Boom] {
      CheckpointedBuild.build(spark, raw, dirA, slices = 6,
        onUnitCommitted = (stage, _) => {
          if (stage == "postings") {
            committed += 1; if (committed == 3) throw Boom()
          }
        })
    }
    assert((0 until 3).forall(p =>
      CheckpointedBuild.isCommitted(s"$dirA/postings/slice=$p")))
    assert((3 until 6).forall(p =>
      !CheckpointedBuild.isCommitted(s"$dirA/postings/slice=$p")))
    val before = CheckpointedBuild.manifest(spark, dirA)
      .where(col("stage") === "postings")
      .collect().map(r => r.getAs[Int]("part") -> r.getAs[Long]("committed_at")).toMap

    val idxA = CheckpointedBuild.build(spark, raw, dirA, slices = 6)
    val after = CheckpointedBuild.manifest(spark, dirA)
      .where(col("stage") === "postings")
      .collect().map(r => r.getAs[Int]("part") -> r.getAs[Long]("committed_at")).toMap
    assert(after.size == 6)
    (0 until 3).foreach(p =>
      assert(after(p) == before(p), s"postings slice $p recomputed"))

    def canon(path: String, table: String, cols: Seq[String]): Seq[String] =
      spark.read.parquet(s"$path/$table").select(cols.map(col): _*)
        .collect().map(_.toString).sorted.toSeq
    assert(canon(dirA, "postings", Seq("term_id", "doc_id", "impact")) ==
      canon(dirB, "postings", Seq("term_id", "doc_id", "impact")))
    assert(canon(dirA, "blocks", Seq("term_id", "block_id", "n", "block_max")) ==
      canon(dirB, "blocks", Seq("term_id", "block_id", "n", "block_max")))
    assert(idxA.stats == idxB.stats)
    val q = PagesCorpus.vocab(2)
    assert(Bm25Query.searchBlocks(idxA, q, 10).collect().map(h => (h.doc_id, h.score)).toSeq ==
      Bm25Query.searchBlocks(idxB, q, 10).collect().map(h => (h.doc_id, h.score)).toSeq)
  }

  test("kill mid-blocks: committed blocks_enc units are not recomputed") {
    val dirA = Files.createTempDirectory("graft-ckpt-blk-a").toString
    val dirB = Files.createTempDirectory("graft-ckpt-blk-b").toString
    val raw = PagesCorpus.pages(spark, n, parts = 4).toDF()
    // blockBits=6 => 64-doc blocks; 300 docs over 6 slices align to
    // 64-wide units [0,64) [64,128) [128,192) [192,256) [256,300) — five
    // non-empty blocks_enc units
    val idxB = CheckpointedBuild.build(spark, raw, dirB, slices = 6,
      blockBits = 6)

    // die after the 2nd committed blocks_enc unit
    var committed = 0
    intercept[Boom] {
      CheckpointedBuild.build(spark, raw, dirA, slices = 6, blockBits = 6,
        onUnitCommitted = (stage, _) => {
          if (stage == "blocks_enc") {
            committed += 1; if (committed == 2) throw Boom()
          }
        })
    }
    assert((0 until 2).forall(u =>
      CheckpointedBuild.isCommitted(s"$dirA/blocks_enc/unit=$u")))
    assert(!CheckpointedBuild.isCommitted(s"$dirA/blocks_enc/unit=2"))
    assert(!CheckpointedBuild.isCommitted(s"$dirA/blocks"))
    val before = CheckpointedBuild.manifest(spark, dirA)
      .where(col("stage") === "blocks_enc")
      .collect().map(r => r.getAs[Int]("part") -> r.getAs[Long]("committed_at")).toMap
    assert(before.keySet == Set(0, 1))

    val idxA = CheckpointedBuild.build(spark, raw, dirA, slices = 6,
      blockBits = 6)
    val after = CheckpointedBuild.manifest(spark, dirA)
      .where(col("stage") === "blocks_enc")
      .collect().map(r => r.getAs[Int]("part") -> r.getAs[Long]("committed_at")).toMap
    assert(after.size == 5) // unit 5 is past hi -> empty, never commits
    (0 until 2).foreach(u =>
      assert(after(u) == before(u), s"blocks_enc unit $u recomputed"))

    // full bit-level content identity of the serving blocks table
    def blocksBytes(path: String): Map[(Long, Long), (Int, Seq[Byte], Seq[Byte], Double)] =
      spark.read.parquet(s"$path/blocks").collect().map { r =>
        (r.getAs[Long]("term_id"), r.getAs[Long]("block_id")) ->
          ((r.getAs[Int]("n"), r.getAs[Array[Byte]]("docs_enc").toSeq,
            r.getAs[Array[Byte]]("impacts_enc").toSeq,
            r.getAs[Double]("block_max")))
      }.toMap
    assert(blocksBytes(dirA) == blocksBytes(dirB))
    assert(idxA.stats == idxB.stats)
    val q = PagesCorpus.vocab(2)
    assert(Bm25Query.searchBlocks(idxA, q, 10).collect().map(h => (h.doc_id, h.score)).toSeq ==
      Bm25Query.searchBlocks(idxB, q, 10).collect().map(h => (h.doc_id, h.score)).toSeq)
  }

  test("kill mid-terms: committed terms_part slices are not recomputed") {
    val dirA = Files.createTempDirectory("graft-ckpt-trm-a").toString
    val dirB = Files.createTempDirectory("graft-ckpt-trm-b").toString
    val raw = PagesCorpus.pages(spark, n, parts = 4).toDF()
    val idxB = CheckpointedBuild.build(spark, raw, dirB, slices = 6)

    // die after the 2nd committed terms_part slice
    var committed = 0
    intercept[Boom] {
      CheckpointedBuild.build(spark, raw, dirA, slices = 6,
        onUnitCommitted = (stage, _) => {
          if (stage == "terms_part") {
            committed += 1; if (committed == 2) throw Boom()
          }
        })
    }
    assert((0 until 2).forall(p =>
      CheckpointedBuild.isCommitted(s"$dirA/terms_part/slice=$p")))
    assert(!CheckpointedBuild.isCommitted(s"$dirA/terms_part/slice=2"))
    assert(!CheckpointedBuild.isCommitted(s"$dirA/terms"))
    val before = CheckpointedBuild.manifest(spark, dirA)
      .where(col("stage") === "terms_part")
      .collect().map(r => r.getAs[Int]("part") -> r.getAs[Long]("committed_at")).toMap
    assert(before.keySet == Set(0, 1))

    val idxA = CheckpointedBuild.build(spark, raw, dirA, slices = 6)
    val after = CheckpointedBuild.manifest(spark, dirA)
      .where(col("stage") === "terms_part")
      .collect().map(r => r.getAs[Int]("part") -> r.getAs[Long]("committed_at")).toMap
    assert(after.size == 6)
    (0 until 2).foreach(p =>
      assert(after(p) == before(p), s"terms_part slice $p recomputed"))
    // partials GC'd once terms committed
    assert(!Files.exists(Paths.get(s"$dirA/terms_part")))

    // dictionary content identity vs the uninterrupted build (and vs the
    // BATCH writer's dictionary semantics: same rows, same idf bits)
    def dict(path: String): Set[(String, Long, Long, Double)] =
      spark.read.parquet(s"$path/terms").collect().map(r =>
        (r.getAs[String]("term"), r.getAs[Long]("df"),
          r.getAs[Long]("term_id"), r.getAs[Double]("idf"))).toSet
    assert(dict(dirA) == dict(dirB))
    assert(dict(dirA).nonEmpty)
    // derived dims exist and match in content
    def rev(path: String): Set[(String, Long)] =
      spark.read.parquet(s"$path/terms_rev").collect().map(r =>
        (r.getAs[String]("term_rev"), r.getAs[Long]("term_id"))).toSet
    assert(rev(dirA) == rev(dirB))
    assert(idxA.stats == idxB.stats)
    val q = PagesCorpus.vocab(3)
    assert(Bm25Query.searchBlocks(idxA, q, 10).collect().map(h => (h.doc_id, h.score)).toSeq ==
      Bm25Query.searchBlocks(idxB, q, 10).collect().map(h => (h.doc_id, h.score)).toSeq)
  }

  test("resume of a dir with committed units but NO config manifest " +
      "invalidates everything (pre-fingerprinting dirs)") {
    val dirA = Files.createTempDirectory("graft-ckpt-noconfig").toString
    val raw = PagesCorpus.pages(spark, n, parts = 4).toDF()
    CheckpointedBuild.build(spark, raw, dirA, slices = 4)
    val before = CheckpointedBuild.manifest(spark, dirA)
      .where(col("stage") === "tf")
      .collect().map(r => r.getAs[Int]("part") -> r.getAs[Long]("committed_at")).toMap

    // simulate a pre-upgrade checkpoint dir: committed units, no config_0
    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(rmrf)
      p.delete(); ()
    }
    rmrf(new java.io.File(s"$dirA/manifest/config_0"))

    val idxA = CheckpointedBuild.build(spark, raw, dirA, slices = 4)
    val after = CheckpointedBuild.manifest(spark, dirA)
      .where(col("stage") === "tf")
      .collect().map(r => r.getAs[Int]("part") -> r.getAs[Long]("committed_at")).toMap
    // unknown prior config => every stage rebuilt (the committed units
    // could carry any schema; trusting them can silently mix v1/v3 tf)
    (0 until 4).foreach(p =>
      assert(after(p) != before(p), s"tf slice $p must be rebuilt"))
    val cr = CheckpointedBuild.manifest(spark, dirA)
      .where(col("stage") === "config_reconcile").collect()
    assert(cr.nonEmpty)
    assert(cr.head.getAs[String]("lineage").contains("missing-config"))
    assert(idxA.stats.num_docs > 0)
  }

  test("manifest carries lineage and metrics per unit") {
    val dir = Files.createTempDirectory("graft-ckpt-m").toString
    CheckpointedBuild.build(spark, PagesCorpus.pages(spark, 100L, parts = 2).toDF(),
      dir, slices = 2)
    val m = CheckpointedBuild.manifest(spark, dir).collect()
    val stages = m.map(_.getAs[String]("stage")).toSet
    assert(stages == Set("config", "tf", "docs", "terms_part", "terms",
      "postings", "blocks_enc", "blocks", "stats"))
    m.foreach { r =>
      assert(r.getAs[Long]("rows") >= 0)
      assert(r.getAs[String]("lineage").nonEmpty)
    }
    // tf slices carry their docId range lineage
    val tf0 = m.find(r => r.getAs[String]("stage") == "tf" && r.getAs[Int]("part") == 0).get
    assert(tf0.getAs[String]("lineage").startsWith("doc_id:["))
  }
}
