package graft

import graft.engine.Bucketing
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: same result, zero shuffle exchanges. */
class BucketingSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucketed fact-fact join plans without exchanges and matches plain join") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select("o_orderkey", "o_totalprice")
      Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", 4)
      Bucketing.writeBucketed(o, "b_orders", "o_orderkey", 4)

      val joined = Bucketing.joinBucketed(spark,
        "b_lineitem", "l_orderkey", "b_orders", "o_orderkey")
      assert(Bucketing.isShuffleFree(joined),
        joined.queryExecution.executedPlan.toString.take(600))

      val expected = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
      assert(joined.count() == expected)

      // and the plain parquet-to-parquet join DOES shuffle (sanity check
      // that isShuffleFree actually discriminates)
      val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      assert(!Bucketing.isShuffleFree(plain))
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
