package graft

import graft.engine.{Aggregations, Tables}
import graft.engine.Aggregations.AggSpec
import graft.northstar.{Dedup, Ivf, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe: replicates the sf0.1 tables in-memory (x10 lineitem = 6M
  * rows, x8 documents = 40k docs, x5 embeddings = 10k vectors with
  * distinct ids) and runs the heavyweight operators, printing row counts
  * and wall times. Not part of the driver contract — a local check that
  * plan shapes survive an order-of-magnitude growth without memory
  * blowups or quadratic cliffs. Usage: runMain graft.ScaleProbe
  */
object ScaleProbe {

  private def replicate(df: DataFrame, times: Int, idCol: String,
                        stride: Long): DataFrame =
    (0 until times).map(i =>
      df.withColumn(idCol, col(idCol) + lit(i * stride))).reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale] $name%-28s rows=$n%-9d ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val li = replicate(Tables.table(spark, dir, "lineitem"), 10, "l_orderkey", 10000000L)
    val orders = Tables.table(spark, dir, "orders")
    timed("flagship agg 6M x10 join") {
      val joined = li.join(orders, li("l_orderkey") % 10000000L === orders("o_orderkey"))
      Aggregations.aggregate(joined, AggSpec(
        Seq("l_returnflag", "l_linestatus", "o_orderstatus"),
        Seq("l_quantity"), Seq("sum", "count"))).get.count()
    }

    val docs = replicate(Tables.table(spark, dir, "documents"), 8, "doc_id", 1000000L)
    timed("minhashPairs 40k docs") {
      Dedup.minhashPairs(docs, threshold = 0.5).count()
    }
    timed("simhashPairs 40k docs") {
      Dedup.simhashPairs(docs, maxHamming = 6, maxBucket = 200).count()
    }
    timed("exact dedup 40k docs") {
      Dedup.exactByText(docs).count()
    }

    timed("clusterCollapse 40k docs") {
      Dedup.collapseByPairs(docs, Dedup.minhashPairs(docs, threshold = 0.5))
        .filter(col("is_keeper")).count()
    }

    val emb = replicate(Tables.table(spark, dir, "embeddings"), 5, "vec_id", 1000000L)
    timed("lshTopK 10k corpus, 50 queries") {
      Similarity.lshTopK(emb.filter(col("vec_id") < 50), emb, k = 10).count()
    }
    timed("cosineNearDupPairs 10k") {
      Similarity.cosineNearDupPairs(emb, threshold = 0.35).count()
    }
    // auto-sampled k-means: wall time should stay ~flat as the corpus
    // replicates (the sample is bounded at nCells*256 rows either way)
    val emb1 = Tables.table(spark, dir, "embeddings")
    timed("ivf fitCentroids 2k corpus") {
      Ivf.fitCentroids(emb1, nCells = 8).length.toLong
    }
    timed("ivf fitCentroids 10k corpus (x5)") {
      Ivf.fitCentroids(emb, nCells = 8).length.toLong
    }
    spark.stop()
  }
}
