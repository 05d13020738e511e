package graft

/** Contract-wide smoke guard: every `SparkEntry.queries` entry must build
  * and execute at sf0.001 without coming back as the 1-column errors-as-data
  * `Error` frame. This is the structural fix for the round-5 failure mode
  * where a broken column name in a q_sql_* entry "succeeded" with a 1-row
  * Error table and only the driver's DuckDB oracle caught it — here it fails
  * `sbt test` instead.
  *
  * Mutation-tested (round 7): renaming `o_custkey` → `o_custkey_BROKEN` in
  * `q_sql_topn` makes this suite fail with UNRESOLVED_COLUMN, confirming
  * the guard is live, not vacuous.
  */
class ContractSmokeSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  /** Queries allowed to be empty at sf0.001. Currently NONE: a Verify
    * dump at sf0.001 (round 7) showed every contract query returns rows,
    * so any zero-row result is a regression — a silently-broken filter,
    * join key, or over-tightened threshold. If a deliberate retuning
    * legitimately empties a pair-mining query at this sf, add it here.
    */
  private val mayBeEmpty: Set[String] = Set.empty

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"contract query $name executes and is not an Error frame") {
      val df = SparkEntry.queries(name)(spark, dir)
      val fields = df.schema.fieldNames.toSeq
      if (fields == Seq("Error"))
        fail(s"$name returned the errors-as-data frame: " +
          df.collect().mkString("; ").take(500))
      val n = df.count()
      assert(n > 0 || mayBeEmpty(name),
        s"$name materialized 0 rows at sf0.001 and is not in the expected-empty allowlist")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no shadowed query keys in source; every oracle key names a query") {
    // a Map literal silently keeps the LAST duplicate key — a name
    // collision drops the original query from the contract with no
    // runtime signal (caught live in r11: a second ns_corpus_report
    // shadowed the per-language health rollup). Scan the source for
    // duplicate `"name" -> ((s, dir)` entries.
    val src = scala.io.Source.fromFile(
      "src/main/scala/graft/SparkEntry.scala")(scala.io.Codec.UTF8).mkString
    val names = """"([a-z0-9_]+)" -> \(\(s, dir\)""".r
      .findAllMatchIn(src).map(_.group(1)).toSeq
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty, s"duplicate query keys shadow earlier ones: $dups")
    assert(names.size == SparkEntry.queries.size,
      s"${names.size} query literals in source but " +
        s"${SparkEntry.queries.size} map entries — a key is shadowed")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracleSql keys with no matching query (rename drift): $orphans")
  }
}
