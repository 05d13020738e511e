package graft

import graft.engine.{Sql, Tables, TemplateSqlGenerator}

/** Q2 end-to-end: question → template SQL → extract → execute. */
class TemplateSqlSpec extends SparkSpecBase {
  import spark.implicits._

  lazy val gen = new TemplateSqlGenerator(Map(
    "orders" -> Seq("order_id", "customer_id", "total", "status"),
    "customers" -> Seq("customer_id", "name", "city")))

  test("top-N by measure") {
    assert(gen.generate("show top 5 orders by total", "") ==
      "SELECT * FROM orders ORDER BY total DESC LIMIT 5;")
  }

  test("group-by total with fuzzy table/column names") {
    assert(gen.generate("total totals by status in order", "") ==
      "SELECT status, sum(total) AS total_total FROM orders GROUP BY status;")
  }

  test("count by group / count all / filter by id") {
    assert(gen.generate("number of orders by status", "") ==
      "SELECT status, count(*) AS n FROM orders GROUP BY status;")
    assert(gen.generate("how many customers", "") ==
      "SELECT count(*) AS n FROM customers;")
    assert(gen.generate("orders with customer_id = 7", "") ==
      "SELECT * FROM orders WHERE customer_id = 7;")
    // non-numeric filter values quote (code-review r13: interpolated
    // bare, 'pending' would parse as a COLUMN reference and fail)
    assert(gen.generate("orders with status = pending", "") ==
      "SELECT * FROM orders WHERE status = 'pending';")
  }

  test("unmatched question → extractSelect None (errors-as-data surface)") {
    val out = gen.generate("please write a poem", "")
    assert(Sql.extractSelect(out).isEmpty)
    // the r13 ModelSqlGenerator bug class, re-found in the template
    // fail() sentinel (code-review r14): a question CONTAINING the word
    // "select" must not turn the comment sentinel into runnable SQL
    val out2 = gen.generate("select me a nice poem about databases", "")
    assert(Sql.extractSelect(out2).isEmpty, out2)
  }

  test("'how many ... with filter' routes to a FILTERED count") {
    // byId alone returned full rows (right rows, wrong shape); a bare
    // countAll would count ALL orders (numerically wrong) — the
    // filtered-count template keeps both the aggregate and the
    // predicate (code-review r14, both passes)
    assert(gen.generate("how many orders with status = 5", "") ==
      "SELECT count(*) AS n FROM orders WHERE status = 5;")
    assert(gen.generate("how many orders with status = pending", "") ==
      "SELECT count(*) AS n FROM orders WHERE status = 'pending';")
    // the narrower shapes still fire on their own
    assert(gen.generate("how many customers", "") ==
      "SELECT count(*) AS n FROM customers;")
    assert(gen.generate("orders with status = 5", "") ==
      "SELECT * FROM orders WHERE status = 5;")
  }

  test("model adapter: reference prompt shape, model output used when it is SQL") {
    var seen: String = null
    val model = new Sql.ModelSqlGenerator(p => {
      seen = p; "SELECT 1 AS one;"
    })
    assert(model.generate("how many orders", "CREATE TABLE orders (id number)")
      == "SELECT 1 AS one;")
    // the reference's exact training-time prompt (text_to_sql.py:110-115)
    assert(seen ==
      "Tables:\nCREATE TABLE orders (id number)\n\nQuestion:\nhow many orders\n\nAnswer:\n")
  }

  test("model adapter: garbage or throwing model falls back to the template generator") {
    val garbage = new Sql.ModelSqlGenerator(_ => "no sql here", Some(gen))
    assert(garbage.generate("how many customers", "") ==
      "SELECT count(*) AS n FROM customers;")
    val crashes = new Sql.ModelSqlGenerator(
      _ => throw new RuntimeException("inference down"), Some(gen))
    assert(crashes.generate("how many customers", "") ==
      "SELECT count(*) AS n FROM customers;")
    // no fallback → errors-as-data surface (extractSelect None)
    val bare = new Sql.ModelSqlGenerator(_ => "nope")
    assert(Sql.extractSelect(bare.generate("q", "")).isEmpty)
    // the no-SQL sentinel must survive a question CONTAINING "select":
    // embedding the raw question used to make the sentinel itself match
    // extractSelect and run as garbage SQL (code-review r13)
    assert(Sql.extractSelect(
      bare.generate("select the best suppliers for me", "")).isEmpty)
  }

  test("end-to-end against live tables: question → SQL → result frame") {
    val dir = "/root/testdata/sf0.001"
    val tables = Tables.open(spark, dir, Seq("orders", "customer"))
    val g = TemplateSqlGenerator.fromTables(tables)
    val sql = g.generate("number of orders by o_orderpriority",
      Sql.renderSchema(tables))
    val df = Sql.runSql(spark, Sql.extractSelect(sql).get.stripSuffix(";"))
    assert(df.columns.toSeq == Seq("o_orderpriority", "n"))
    assert(df.count() == 5)
  }
}
