package graft

import org.apache.spark.sql.SparkSession

/** t1-equivalent smoke: runs SparkEntry.entry exactly as the driver does
  * (rows > 0 on sf0.001) and prints the count. Usage: runMain graft.Smoke
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = DevSession.local("4", "graft-smoke")
    // one execution, not two: count() and show() each re-ran the whole
    // flagship pipeline (code-review r14); the flagship output is a
    // small aggregate frame, so a full collect is driver-safe
    val rows = SparkEntry.entry(spark).collect()
    rows.take(5).foreach(r => println(s"[smoke] $r"))
    println(s"[smoke] entry rows=${rows.length} " +
      (if (rows.nonEmpty) "OK" else "EMPTY"))
    spark.stop()
    // a zero-row flagship must FAIL a scripted gate ('Smoke && deploy')
    // — the old exit 0 let it proceed on EMPTY (code-review r14)
    if (rows.isEmpty) sys.exit(1)
  }
}
