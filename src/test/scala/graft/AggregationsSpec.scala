package graft

import graft.engine.Aggregations
import graft.engine.Aggregations.AggSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** A1–A6 semantics (transformations_code.py:168-184, front_end.py:471-818,
  * data_extraction.py:90-92), incl. the pandas null-group-key drop.
  */
class AggregationsSpec extends SparkSpecBase {
  import scala.jdk.CollectionConverters._

  private def sales = {
    val schema = StructType(Seq(
      StructField("category", StringType),
      StructField("region", StringType),
      StructField("amount", DoubleType),
      StructField("qty", LongType),
    ))
    spark.createDataFrame(Seq(
      Row("a", "e", 10.0, 1L),
      Row("a", "e", 20.0, null),
      Row("b", "w", 30.0, 3L),
      Row(null, "w", 99.0, 9L), // pandas groupby drops this row
    ).asJava, schema)
  }

  test("A1: {col}_{func} naming, group keys as columns, null group keys dropped") {
    val out = Aggregations.aggregate(sales,
      AggSpec(Seq("category"), Seq("amount", "qty"),
              Seq("sum", "mean", "min", "max", "count"))).get
    assert(out.columns.toSeq == Seq("category",
      "amount_sum", "amount_mean", "amount_min", "amount_max", "amount_count",
      "qty_sum", "qty_mean", "qty_min", "qty_max", "qty_count"))
    val byCat = out.collect().map(r => r.getString(0) -> r).toMap
    assert(byCat.keySet == Set("a", "b")) // null key dropped
    assert(byCat("a").getAs[Double]("amount_sum") == 30.0)
    assert(byCat("a").getAs[Double]("amount_mean") == 15.0)
    // count is non-null count of the aggregated column (pandas count)
    assert(byCat("a").getAs[Long]("qty_count") == 1L)
    assert(byCat("a").getAs[Long]("qty_sum") == 1L)
  }

  test("A1: multi-key grouping keeps rows whose OTHER key is non-null") {
    val out = Aggregations.aggregate(sales,
      AggSpec(Seq("category", "region"), Seq("amount"), Seq("sum"))).get
    assert(out.count() == 2) // (a,e), (b,w); (null,w) dropped
  }

  test("A3 guard: missing column → None, not failure") {
    assert(Aggregations.aggregate(sales,
      AggSpec(Seq("nope"), Seq("amount"), Seq("sum"))).isEmpty)
    assert(Aggregations.aggregate(sales,
      AggSpec(Seq("category"), Seq("nope"), Seq("sum"))).isEmpty)
  }

  test("A1: unsupported function throws IllegalArgumentException") {
    intercept[IllegalArgumentException] {
      Aggregations.aggregate(sales,
        AggSpec(Seq("category"), Seq("amount"), Seq("median")))
    }
  }

  test("A4 pie: groupby(cat)[value].sum with null categories dropped") {
    val out = Aggregations.pie(sales, "category", "amount")
    assert(out.columns.toSeq == Seq("category", "amount_sum"))
    assert(rows(out) == Set(Seq("a", 30.0), Seq("b", 30.0)))
  }

  test("A5 histogram: right-closed equal-width buckets (pandas value_counts parity)") {
    import spark.implicits._
    val df = (0 to 100).map(_.toDouble).toDF("x")
    val out = Aggregations.histogram(df, "x", 10).collect()
    assert(out.length == 10)
    assert(out.map(_.getAs[Long]("cnt")).sum == 101)
    assert(out.head.getAs[Int]("bucket") == 0)
    assert(out.head.getAs[Double]("lo") == 0.0)
    // right-closed: boundary 10 lands DOWN in bucket 0 (pandas cut),
    // and min is admitted into bucket 0 (include_lowest) → 0..10 = 11
    assert(out.head.getAs[Long]("cnt") == 11)
    assert(out.last.getAs[Int]("bucket") == 9)
    assert(out.last.getAs[Long]("cnt") == 10) // 91..100 incl. max
  }

  test("A5 histogram: empty buckets emit with cnt 0 (pandas value_counts(bins=N) shape)") {
    import spark.implicits._
    // skewed: everything in the first and last bucket — the old groupBy
    // silently omitted the 8 interior buckets and a bar chart rendered
    // a different shape than the reference (code-review r14)
    val df = Seq(0.0, 0.0, 0.0, 100.0).toDF("x")
    val out = Aggregations.histogram(df, "x", 10).collect()
    assert(out.length == 10)
    val byBucket = out.map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(byBucket(0) == 3L && byBucket(9) == 1L)
    assert((1 to 8).forall(byBucket(_) == 0L))
  }

  test("A5 histogram: non-positive bins refused (0 divided into an Infinity-width garbage frame)") {
    import spark.implicits._
    val df = Seq(1.0, 2.0).toDF("x")
    assertThrows[IllegalArgumentException](Aggregations.histogram(df, "x", 0))
    assertThrows[IllegalArgumentException](Aggregations.histogram(df, "x", -3))
  }

  test("A5 histogram: constant column → all counts in bucket 0; all-null → empty") {
    import spark.implicits._
    val const = Seq(5.0, 5.0, 5.0).toDF("x")
    val out = Aggregations.histogram(const, "x", 7).collect()
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(out.size == 7 && out(0) == 3L)
    assert((1 to 6).forall(out(_) == 0L))
    val allNull = Seq[Option[Double]](None, None).toDF("x")
    assert(Aggregations.histogram(allNull, "x", 5).count() == 0)
  }

  test("A5 histogram: NaN values dropped like the reference's dropna, not poisoning width") {
    import spark.implicits._
    val df = Seq(0.0, 5.0, 10.0, Double.NaN).toDF("x")
    val out = Aggregations.histogram(df, "x", bins = 2).collect()
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    // NaN would make max()=NaN and every bucket NaN; dropped, the three
    // real values split right-closed: boundary 5 lands DOWN (ceil rule)
    assert(out == Map(0 -> 2L, 1 -> 1L))
  }

  test("A3 guard: empty aggCols or funcs → None (skip, not crash)") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("v", "g")
    assert(Aggregations.aggregate(df, AggSpec(Seq("g"), Nil, Seq("sum"))).isEmpty)
    assert(Aggregations.aggregate(df, AggSpec(Seq("g"), Seq("v"), Nil)).isEmpty)
    // reference guard is `if groupby_cols and agg_cols and agg_funcs`
    // (scheduler.py:157): empty groupBy skips too — never a 1-row
    // global aggregate the reference pipeline would not emit
    assert(Aggregations.aggregate(df, AggSpec(Nil, Seq("v"), Seq("sum"))).isEmpty)
  }

  test("A6 watermark: scalar max of FIRST column") {
    import spark.implicits._
    val df = Seq((3L, "x"), (9L, "y"), (5L, "z")).toDF("event_id", "v")
    val r = Aggregations.watermark(df).collect()(0)
    assert(r.getLong(0) == 9L)
    assert(Aggregations.watermark(df).columns.toSeq == Seq("max_event_id"))
  }
}
