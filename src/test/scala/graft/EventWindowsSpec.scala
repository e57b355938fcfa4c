package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.streaming.EventWindows

class EventWindowsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val base = 1767225600000L // 2026-01-01T00:00:00Z

  /** Deterministic events: hour h, type t, minute offset m. */
  private def ev(h: Int, m: Int, t: String, v: Double) =
    (new Timestamp(base + h * 3600000L + m * 60000L), t, v)

  test("watermarked hourly windows emit once, match the batch aggregation") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-ev-src").toString
    val out = Files.createTempDirectory("graft-ev-out").toString

    // wave 1: hours 0..2; wave 2: hours 3..5; wave 3 carries a row for
    // hour 0 that is 5+ hours late — far past the 1h delay AND past the
    // window's eviction, so the watermark must drop it. (Spark's delay is
    // a lower bound: a late row can still merge while its window state is
    // live; only eviction makes the drop guaranteed — hence the row
    // arrives two watermark advances after its window.)
    val wave1 = Seq(
      ev(0, 5, "view", 1.0), ev(0, 20, "view", 2.0), ev(0, 40, "click", 1.5),
      ev(1, 10, "view", 3.0), ev(1, 50, "click", 0.5),
      ev(2, 30, "view", 1.0)).toDF("ts", "event_type", "value")
    val wave2 = Seq(
      ev(3, 15, "click", 2.0), ev(4, 10, "view", 4.0),
      ev(5, 45, "view", 1.0), ev(5, 50, "click", 1.0)
    ).toDF("ts", "event_type", "value")
    val wave3 = Seq(
      ev(6, 30, "view", 7.0),
      ev(0, 59, "view", 100.0) // 5.5h late, window long evicted
    ).toDF("ts", "event_type", "value")
    // one file per wave: the file source has no event-time ordering across
    // files, so a wave must arrive atomically for the watermark trace to
    // be deterministic (in production the upstream writer commits whole
    // time-ordered batches the same way)
    wave1.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$src/w1")
    Thread.sleep(1200)
    wave2.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$src/w2")
    Thread.sleep(1200)
    wave3.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$src/w3")

    val q = EventWindows.start(spark, s"$src/w*", out, wave1.schema)
    q.awaitTermination()

    val got = spark.read.parquet(s"$out/windows")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    // batch ground truth over ON-TIME rows only (the late hour-0 row must
    // NOT appear: its window was emitted and evicted long before)
    val onTime = wave1.unionAll(wave2)
      .unionAll(wave3.where(col("value") =!= 100.0))
    val truth = onTime
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    // every emitted window is exactly a ground-truth window
    assert(got.subsetOf(truth), s"emitted rows diverge: ${got -- truth}")
    // the early hours MUST have been emitted (watermark passed them);
    // the final hour may legitimately still be open at stream end
    val emittedHours = got.map(_._1)
    Seq(0, 1, 2, 3, 4).foreach { h =>
      assert(emittedHours.contains(base / 1000 + h * 3600L),
        s"hour $h should have been flushed by the watermark")
    }
    // hour-0 'view' aggregate excludes the late row (value 100 dropped)
    val h0view = got.find(r => r._1 == base / 1000 && r._2 == "view").get
    assert(h0view._3 == 2L && h0view._4 == 3.0)
  }
}
