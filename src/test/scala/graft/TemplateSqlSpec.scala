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
  }

  test("unmatched question → extractSelect None (errors-as-data surface)") {
    val out = gen.generate("please write a poem", "")
    assert(Sql.extractSelect(out).isEmpty)
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
