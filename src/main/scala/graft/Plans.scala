package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection: prints `.explain("formatted")` for selected queries so
  * pushdown / pruning / join-strategy regressions are visible.
  * Usage: runMain graft.Plans [queryName ...]  (default: a key subset)
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = DevSession.local("4", "graft-plans")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_flagship", "s2_scan_incremental", "j1_autojoin",
               "a1_multi_agg", "ns_knn_brute", "ns_minhash_pairs")
    // SparkEntry.queries is a def that rebuilds the full contract map —
    // evaluate it ONCE, and answer a typo with the near-matches instead
    // of a bare key-not-found after full session startup that also
    // skipped every later name and spark.stop (code-review r14)
    val qs = SparkEntry.queries
    try names.foreach { n =>
      println(s"\n========== $n ==========")
      qs.get(n) match {
        case Some(fn) => fn(spark, dir).explain("formatted")
        case None =>
          // an empty normalized fragment matches EVERY name — list the
          // count instead of 8 arbitrary "similar" queries
          val frag = n.replaceAll("[^A-Za-z0-9_]", "").take(6)
          val near =
            if (frag.isEmpty) Nil
            else qs.keys.filter(_.contains(frag)).take(8).toSeq
          println(s"[plans] unknown query '$n'" +
            (if (near.nonEmpty) s"; similar: ${near.mkString(", ")}"
             else s"; ${qs.size} known queries"))
      }
    } finally spark.stop()
  }
}
