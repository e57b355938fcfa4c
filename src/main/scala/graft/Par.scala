package graft

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism spread for narrow CPU-heavy operators
  * (guide §2.2/§6, round 8).
  *
  * A small corpus stored as one parquet file plans as ONE scan task
  * (`spark.sql.files.maxPartitionBytes` = 128 MB, and a single row group
  * cannot split), so per-row regex/hash/tokenize work runs on one core
  * of a 32-core session — the extraction-heavy operators were measured
  * spending most of their wall time inside that single task. When the
  * input is estimated SMALLER than one scan split (logical-plan
  * statistics — file sizes for parquet scans; no physical planning, no
  * job), a round-robin repartition (a sub-MB Exchange here) unlocks
  * every core; any input big enough to plan multiple scan tasks — every
  * real corpus at scale — passes through untouched, so no shuffle is
  * ever added to a large scan. An UNKNOWN size estimates huge and is
  * likewise untouched (the safe direction). Use on row-wise operators
  * only: their output is partition-invariant, so results are unchanged
  * by construction.
  */
object Par {

  /** Small daemon pool for overlapping INDEPENDENT Spark actions of one
    * logical operation (guide §2.6) — artifact writes, driver collects of
    * unrelated dimensions. Concurrency never changes results: callers
    * only parallelize actions with no data dependency.
    */
  lazy val ec: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(4,
        new java.util.concurrent.ThreadFactory {
          private val n = new java.util.concurrent.atomic.AtomicInteger(0)
          def newThread(r: Runnable): Thread = {
            val t = new Thread(r, s"graft-par-${n.getAndIncrement()}")
            t.setDaemon(true); t
          }
        }))

  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxPart = spark.sessionState.conf.filesMaxPartitionBytes
    val plan = df.queryExecution.optimizedPlan
    // FILE-source leaves only: their size statistics are the actual file
    // bytes, so "smaller than one scan split" is a fact. Generated /
    // in-memory / checkpointed sources estimate garbage (a synthetic
    // 200k-doc corpus estimated ~8 B/row and would have been shuffled
    // whole) and already carry their creator's chosen parallelism —
    // never touched.
    val allFileLeaves = plan.collectLeaves().forall {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation.isInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
      case _ => false
    }
    if (target > 1 && allFileLeaves &&
        plan.stats.sizeInBytes < BigInt(maxPart))
      df.repartition(target)
    else df
  }
}
