package graft

import graft.engine.Mapping
import graft.engine.Mapping.TableMeta

/** J1–J6 (mapping.py:105-181): FK-first key inference, deterministic
  * semantic fallback, exact aliasing scheme, pairwise sweep + passthrough.
  * Fixtures follow FIXTURES.md §B (customers_mini / orders_mini / misc).
  */
class MappingSpec extends SparkSpecBase {
  import spark.implicits._

  private def customers = Seq(
    (1L, "Ada", "London"), (2L, "Alan", "Wilmslow"))
    .toDF("customer_id", "name", "city")
  private def orders = Seq(
    (10L, 1L, 100.0), (11L, 1L, 150.0), (12L, 2L, 99.0))
    .toDF("order_id", "customer_id", "total")
  private def misc = Seq(("x", "note")).toDF("code", "note")

  test("J2 aliasing: key once under t1 name, others suffixed _{table}, t2 key dropped") {
    val out = Mapping.join(customers, "customers", "customer_id",
                           orders, "orders", "customer_id")
    assert(out.columns.toSeq == Seq("customer_id",
      "name_customers", "city_customers", "order_id_orders", "total_orders"))
    assert(out.count() == 3)
  }

  test("J2 generalization: differently-named keys join, t1 key name survives") {
    val o2 = orders.withColumnRenamed("customer_id", "cust_ref")
    val out = Mapping.join(customers, "c", "customer_id", o2, "o", "cust_ref")
    assert(out.columns.toSeq == Seq("customer_id",
      "name_c", "city_c", "order_id_o", "total_o"))
    assert(out.count() == 3)
  }

  test("J3 FK-first beats semantic inference") {
    val k = Mapping.inferKey(
      customers.columns.toSeq, TableMeta(fk = None),
      orders.columns.toSeq, TableMeta(fk = Some("customer_id")))
    assert(k == Some(("customer_id", "customer_id")))
  }

  test("J4 semantic inference: exact shared name scores 1.0; ≥0.8 similar names pair up; below-threshold → None") {
    assert(Mapping.inferSemanticKey(
      Seq("customer_id", "name"), Seq("order_id", "customer_id"))
      .map(t => (t._1, t._2)) == Some(("customer_id", "customer_id")))
    assert(Mapping.inferSemanticKey(
      Seq("c_custkey"), Seq("o_custkey")).isDefined)   // 0.888
    assert(Mapping.inferSemanticKey(
      Seq("code"), Seq("total_price")).isEmpty)
  }

  test("J6 sweep: joins named {t1}_{t2}_merged, both directions consumed, unjoinable passthrough") {
    val out = Mapping.mergeTables(
      Map("customers" -> customers, "orders" -> orders, "misc" -> misc),
      names = Seq("customers", "orders", "misc"))
    assert(out.keySet == Set("customers_orders_merged", "misc"))
    assert(out("misc").columns.toSeq == Seq("code", "note"))
    assert(out("customers_orders_merged").count() == 3)
  }

  test("J6 sweep: all tables unjoinable → all passthrough") {
    val out = Mapping.mergeTables(
      Map("misc" -> misc, "customers" -> customers),
      names = Seq("customers", "misc"))
    assert(out.keySet == Set("customers", "misc"))
  }
}
