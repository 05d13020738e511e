package graft

import graft.engine.{Scheduler, Tables}
import java.time.{Duration, LocalDateTime}
import java.nio.file.Files

/** S9 CSV sink, S11 layer reset, O2/O3 scheduling math. */
class MiscSpec extends SparkSpecBase {
  import spark.implicits._

  test("S9 CSV sink round-trips with header") {
    val dir = Files.createTempDirectory("csv").toString
    Tables.writeCsv(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), s"$dir/out")
    val back = spark.read.option("header", "true").csv(s"$dir/out")
    assert(back.columns.toSeq == Seq("id", "v") && back.count() == 2)
  }

  test("S11 resetLayers drops and recreates directories") {
    val dir = Files.createTempDirectory("layers").toString
    Seq((1, "x")).toDF("a", "b").write.parquet(s"$dir/raw/t.parquet")
    Tables.resetLayers(Seq(s"$dir/raw", s"$dir/silver"))
    val raw = new java.io.File(s"$dir/raw")
    assert(raw.isDirectory && raw.listFiles().isEmpty)
    assert(new java.io.File(s"$dir/silver").isDirectory)
  }

  test("O2 delay math: future → positive delay, past → run now") {
    val now = LocalDateTime.of(2026, 8, 12, 12, 0)
    assert(Scheduler.delayUntil(now.plusMinutes(90), now) == Duration.ofMinutes(90))
    assert(Scheduler.delayUntil(now.minusDays(1), now) == Duration.ZERO)
    var ran = false
    Scheduler.runOnce(now.minusHours(1), () => now,
      d => fail("must not sleep for past times")) { () => ran = true }
    assert(ran)
  }

  test("O3 recurring: N iterations with sleeps between") {
    var runs = 0; var sleeps = 0
    Scheduler.runEvery(5, Some(3), _ => sleeps += 1)(() => runs += 1)
    assert(runs == 3 && sleeps == 2)
  }
}
