package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection: prints `.explain("formatted")` for selected queries so
  * pushdown / pruning / join-strategy regressions are visible.
  * Usage: runMain graft.Plans [queryName ...]  (default: a key subset)
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_flagship", "s2_scan_incremental", "j1_autojoin",
               "a1_multi_agg", "ns_knn_brute", "ns_minhash_pairs")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
