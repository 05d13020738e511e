package graft

import org.apache.spark.sql.SparkSession

/** Second-JVM worker for the cross-process MUTATION race test
  * (ArtifactRaceSpec, VERDICT r14 task 6): appends `batches` disjoint
  * document slices into a shared appendable winnow index while the spec
  * JVM concurrently removes a different slice set. The `_SUCCESS`
  * marker delete is the cross-process mutex, so concurrent mutators are
  * expected to fail LOUDLY sometimes — this worker retries those; any
  * other failure (or retry starvation) exits nonzero.
  *
  * Stdout: `start=<ms> end=<ms> retries=<n>` (epoch millis — nanoTime
  * origins are not comparable across JVMs) — the spec asserts the
  * two processes' mutation windows actually overlapped.
  */
object ArtifactMutateRaceMain {

  /** The shared deterministic corpus both JVMs generate: ~20 words with
    * a common prefix phrase so sketches share some fingerprint buckets.
    */
  def docText(i: Int): String =
    s"shared preamble phrase alpha beta gamma delta epsilon " +
      s"document $i unique${i}a unique${i}b unique${i}c " +
      s"zeta eta theta iota kappa closing shared phrase tail"

  def docs(spark: SparkSession, ids: Seq[Int]) = {
    import spark.implicits._
    ids.map(i => (i.toLong, docText(i))).toDF("doc_id", "text")
  }

  /** Retry a mutation through loud mutex losses (the documented
    * concurrent-mutator failure mode); anything else rethrows.
    */
  def retryLoud(maxMs: Long)(op: => Unit): Int = {
    val deadline = System.nanoTime() + maxMs * 1000000L
    var retries = 0
    while (true) {
      try { op; return retries }
      catch {
        case e: IllegalArgumentException
            if e.getMessage != null &&
              (e.getMessage.contains("commit marker") ||
                e.getMessage.contains("no _SUCCESS marker")) =>
          retries += 1
          if (System.nanoTime() > deadline)
            throw new IllegalStateException(
              s"mutation starved after $retries loud losses", e)
          Thread.sleep(50)
      }
    }
    retries
  }

  def main(args: Array[String]): Unit = {
    val path = args(0)
    val startId = args(1).toInt
    val batches = args(2).toInt
    val batchSize = args(3).toInt
    val spark = SparkSession.builder()
      .master("local[3]")
      .appName("graft-mutate-race-worker")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val t0 = System.currentTimeMillis()
    // go-file handshake: the spec holds its removals until this lands,
    // so the two processes' mutation windows genuinely overlap
    if (args.length > 4)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(args(4)), Array.empty[Byte]): Unit
    var retries = 0
    for (b <- 0 until batches) {
      val ids = (0 until batchSize).map(j => startId + b * batchSize + j)
      retries += retryLoud(60000) {
        graft.northstar.Artifacts.appendWinnowIndex(
          docs(spark, ids), path, maxBucket = 100)
      }
    }
    val t1 = System.currentTimeMillis()
    println(s"start=$t0 end=$t1 retries=$retries")
    spark.stop()
  }
}
