package graft

import graft.streaming.IncrementalStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming E2/O3 upgrade path: exactly-once continuous load and
  * event-time windowed aggregation, driven synchronously with
  * Trigger.AvailableNow over parquet fixtures.
  */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-stream").toString

  test("continuousLoad: AvailableNow drains the source once; re-run picks up only new files") {
    val src = tmp(); val dst = tmp(); val ckpt = tmp()
    val t1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    t1.write.mode("append").parquet(s"$src/t.parquet")

    val schema = spark.read.parquet(s"$src/t.parquet").schema
    def runOnce(): Unit = {
      val q = IncrementalStream.continuousLoad(
        IncrementalStream.readTableStream(spark, src, "t", schema),
        dst, "t", ckpt, Trigger.AvailableNow())
      q.awaitTermination(60000)
    }
    runOnce()
    assert(spark.read.parquet(s"$dst/t.parquet").count() == 2)

    // append a new source file; only it is processed (checkpointed offsets)
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(s"$src/t.parquet")
    runOnce()
    val out = spark.read.parquet(s"$dst/t.parquet")
    assert(out.count() == 3)
    assert(rows(out) == Set(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
  }

  test("windowedCounts: event-time windows over int64-nanos ts with watermark") {
    val src = tmp(); val ckpt = tmp()
    val hour = 3600L * 1000000000L
    val base = 1704067200L * 1000000000L // 2024-01-01T00:00Z in ns
    Seq(
      (base + 1L, "click", 1.0),
      (base + hour / 2, "click", 2.0),
      (base + hour + 1L, "view", 5.0),
    ).toDF("ts", "event_type", "value")
      .write.parquet(s"$src/events.parquet")

    val schema = spark.read.parquet(s"$src/events.parquet").schema
    val stream = IncrementalStream.readTableStream(spark, src, "events", schema)
    val agg = IncrementalStream.windowedCounts(stream, "ts", "event_type", "value")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val out = spark.table("win_out").collect()
      .map(r => (r.getTimestamp(0).toInstant.toString, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(out == Set(
      ("2024-01-01T00:00:00Z", "click", 2L, 3.0),
      ("2024-01-01T01:00:00Z", "view", 1L, 5.0)))
  }
}
