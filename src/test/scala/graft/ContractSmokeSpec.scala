package graft

/** Contract-wide smoke guard: every `SparkEntry.queries` entry must build
  * and execute at sf0.001 without coming back as the 1-column errors-as-data
  * `Error` frame. This is the structural fix for the round-5 failure mode
  * where a broken column name in a q_sql_* entry "succeeded" with a 1-row
  * Error table and only the driver's DuckDB oracle caught it — here it fails
  * `sbt test` instead.
  */
class ContractSmokeSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"contract query $name executes and is not an Error frame") {
      val df = SparkEntry.queries(name)(spark, dir)
      val fields = df.schema.fieldNames.toSeq
      assert(fields != Seq("Error"),
        s"$name returned the errors-as-data frame: ${df.collect().mkString("; ").take(500)}")
      val n = df.count()
      assert(n >= 0, s"$name failed to materialize")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
