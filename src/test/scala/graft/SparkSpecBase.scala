package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for all suites (SparkSession.getOrCreate reuses
  * the singleton across suites in the forked test JVM).
  */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  /** Registered scratch dir, swept when the forked test JVM exits. */
  def tmpDir(prefix: String): String = TestTmp.dir(prefix)
}

/** Shutdown-hook sweep for test scratch directories: a full `sbt test`
  * used to strand thousands of createTempDirectory dirs in /tmp — after
  * a day of runs the listing/inode pressure measurably skewed bench
  * timings on the same machine (the r15 bench-vs-bench forensics found
  * 5000+ stale dirs inflating artifact-heavy rows ~25%). Register every
  * scratch dir here; the hook deletes them when the suite JVM exits, so
  * mid-run debugging still sees live files.
  */
object TestTmp {
  private val dirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.forEach(f =>
      try graft.northstar.Artifacts.deleteRec(f)
      catch { case _: Throwable => () })
  }))
  def dir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(d.toFile)
    d.toString
  }
}
