package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Watermarked event-time windowed aggregation as a STREAM — the
  * Structured-Streaming twin of the batch `st_windowed_events` gate
  * (hourly count + value sum per event type).
  *
  * Semantics: `withWatermark(ts, 1 hour)` + append mode emits each hourly
  * window exactly once, when the watermark (max event time seen minus the
  * delay) passes the window end — late rows inside the delay still land in
  * their window, later ones are dropped. State is bounded by the number of
  * open windows x event types (the watermark is what makes an infinite
  * stream aggregable with finite state at 100 TB/day event volumes).
  * Output is plain parquet, so the batch engine (and the DuckDB oracle)
  * can read the emitted windows directly.
  */
object EventWindows {

  def start(spark: SparkSession, sourceDir: String, outDir: String,
      schema: StructType,
      delay: String = "1 hour",
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Int = 1): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(
        unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n_events"), col("total_value"))
      .writeStream
      .trigger(trigger)
      .outputMode("append")
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .format("parquet")
      .option("path", s"$outDir/windows")
      .start()
}
