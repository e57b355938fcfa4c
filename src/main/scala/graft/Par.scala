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
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxPart = spark.sessionState.conf.filesMaxPartitionBytes
    if (target > 1 &&
        df.queryExecution.optimizedPlan.stats.sizeInBytes < BigInt(maxPart))
      df.repartition(target)
    else df
  }
}
