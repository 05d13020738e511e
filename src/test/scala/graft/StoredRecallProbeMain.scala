package graft

import org.apache.spark.sql.SparkSession

/** One-off measurement main for the `ns_knn_ivf_stored_recall` oracle
  * constant: runs the contract row at a given sf dir and prints the
  * (n_queries, n_hits) row. Not a test — invoked manually via
  * `Test/runMain graft.StoredRecallProbeMain <sfDir>` when the pinned
  * constant needs (re)measuring after an intentional fit change.
  */
object StoredRecallProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val master = if (args.length > 1) args(1) else "local[8]"
    val shuffleParts = if (args.length > 2) args(2) else "8"
    val spark = SparkSession.builder()
      .master(master)
      .appName("stored-recall-probe")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Seq("ns_knn_ivf_stored_recall", "ns_knn_ivfpq_stored_recall")
      .foreach { name =>
        SparkEntry.queries(name)(spark, dir).collect()
          .foreach(r => println(s"[stored-recall-probe] $name $r"))
      }
    spark.stop()
  }
}
