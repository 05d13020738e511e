package graft

import graft.functions.aggkernels
import org.apache.spark.sql.functions._

/** [[graft.functions.CollectListCapped]]: the bounded-state collect
  * behind single-shuffle LSH bucket capping (ADVICE r10 #2). The
  * contract under test: groups at or under the cap are COMPLETE (equal
  * to built-in collect_list), groups over the cap carry exactly `limit`
  * elements — all genuine members — through both the partial and merge
  * aggregation paths, so the cap+1/filter pattern keeps complete
  * buckets and drops over-cap ones without ever holding an unbounded
  * buffer.
  */
class AggKernelsSpec extends SparkSpecBase {
  import spark.implicits._

  test("under-cap groups are complete: capped collect equals built-in collect_list") {
    val df = (1 to 100).map(i => (i % 10, i)).toDF("k", "v").repartition(7)
    val capped = df.groupBy("k")
      .agg(sort_array(aggkernels.collect_list_capped(col("v"), 11)).as("xs"))
    val full = df.groupBy("k")
      .agg(sort_array(collect_list(col("v"))).as("xs"))
    assert(rows(capped) == rows(full) && capped.count() == 10)
  }

  test("hot keys stop at the cap across many partitions; elements are genuine members") {
    val df = (1 to 10000).map(i => ("hot", i)).toDF("k", "v").repartition(13)
    val out = df.groupBy("k")
      .agg(aggkernels.collect_list_capped(col("v"), 25).as("xs")).collect()
    assert(out.length == 1)
    val xs = out.head.getSeq[Int](1)
    // exactly the cap, no duplicates, every element a real input value
    assert(xs.length == 25 && xs.toSet.size == 25)
    assert(xs.forall(v => v >= 1 && v <= 10000))
  }

  test("cap+1/filter pattern: kept buckets complete and deterministic, over-cap buckets dropped") {
    // 3 keys: sizes 3, 5, 40 — cap at 5 keeps the first two complete
    val rowsIn = (1 to 3).map(i => ("a", i)) ++ (1 to 5).map(i => ("b", i)) ++
      (1 to 40).map(i => ("c", i))
    val df = rowsIn.toDF("k", "v").repartition(6)
    val kept = df.groupBy("k")
      .agg(aggkernels.collect_list_capped(col("v"), 6).as("xs"))
      .filter(size(col("xs")) <= 5)
      .select(col("k"), sort_array(col("xs")).as("xs"))
    assert(rows(kept) == Set(
      Seq("a", Seq(1, 2, 3)), Seq("b", Seq(1, 2, 3, 4, 5))))
  }

  test("works on non-primitive elements (strings) and under a groupBy with other aggregates") {
    val df = Seq(("x", "aa"), ("x", "bb"), ("y", "cc")).toDF("k", "s")
    val out = df.groupBy("k").agg(
      sort_array(aggkernels.collect_list_capped(col("s"), 10)).as("xs"),
      count(lit(1)).as("n"))
    assert(rows(out) == Set(Seq("x", Seq("aa", "bb"), 2L), Seq("y", Seq("cc"), 1L)))
  }

  test("non-positive limit is rejected at construction") {
    intercept[IllegalArgumentException] {
      aggkernels.collect_list_capped(col("v"), 0)
    }
  }
}
