package graft

import java.nio.file.Files

import graft.engine.Extraction
import graft.sources.{JdbcPartitioning, JdbcStore, ParquetStore}

/** JDBC source/sink behind the Store surface — the reference's MySQL IO
  * (data_extraction.py:119-121, front_end.py:54-65) run hermetically
  * against embedded Derby (shipped in Spark's jars).
  */
class JdbcStoreSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshDb(): JdbcStore = {
    val dir = TestTmp.dir("graftdb")
    JdbcStore(
      url = s"jdbc:derby:$dir/db;create=true",
      props = Map("driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver"))
  }

  test("S1/S7 JDBC: write overwrite + read round-trips rows and schema") {
    val db = freshDb()
    val src = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "v", "x")
    db.write(src, "t", "overwrite")
    val got = db.read(spark, "t")
    assert(rows(got) == rows(src))
    assert(got.schema("id").dataType.typeName == "long")
    // overwrite replaces, not appends
    db.write(src, "t", "overwrite")
    assert(db.read(spark, "t").count() == 2)
  }

  test("S8 JDBC append adds rows; exists() distinguishes present/absent") {
    val db = freshDb()
    assert(!db.exists(spark, "t"))
    db.write(Seq((1L, "a")).toDF("id", "v"), "t", "overwrite")
    assert(db.exists(spark, "t"))
    db.write(Seq((2L, "b")).toDF("id", "v"), "t", "append")
    assert(db.read(spark, "t").count() == 2)
  }

  test("exists() escapes LIKE metacharacters: myxtable must not satisfy a my_table probe") {
    // advice r13: getTables treats '_' as a single-char wildcard, so an
    // unescaped probe for a dropped my_table matched a sibling myxtable
    val db = freshDb()
    db.write(Seq((1L, "a")).toDF("id", "v"), "myxtable", "overwrite")
    assert(db.exists(spark, "myxtable"))
    assert(!db.exists(spark, "my_table"))
    db.write(Seq((1L, "a")).toDF("id", "v"), "my_table", "overwrite")
    assert(db.exists(spark, "my_table"))
  }

  test("E2 incremental through JDBC target: watermark, delta-only append") {
    val db = freshDb()
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val r1 = Extraction.incrementalLoad(spark, v1, db, "t")
    assert(r1.rows == 2)
    val v2 = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
    val r2 = Extraction.incrementalLoad(spark, v2, db, "t")
    assert(r2.rows == 2) // only ids 3,4 past watermark 2
    assert(db.read(spark, "t").count() == 4)
    val r3 = Extraction.incrementalLoad(spark, v2, db, "t")
    assert(r3.rows == 0)
  }

  test("E2 JDBC→JDBC: watermark filter is pushed into the source's WHERE clause") {
    val srcDb = freshDb(); val dstDb = freshDb()
    srcDb.write((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"), "t")
    Extraction.incrementalLoad(spark, srcDb.read(spark, "t"), dstDb, "t")
    // second pull: only rows past watermark 50 — and the filter must reach
    // the JDBC scan (database-side WHERE), not run as a Spark Filter node
    srcDb.write((51L to 60L).map(i => (i, s"v$i")).toDF("id", "v"), "t", "append")
    val source = srcDb.read(spark, "t")
    val delta = Extraction.incrementalRows(source, Some(dstDb.read(spark, "t")))
    val plan = delta.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"watermark predicate not pushed to JDBC:\n$plan")
    val r = Extraction.incrementalLoad(spark, source, dstDb, "t")
    assert(r.rows == 10)
    assert(dstDb.read(spark, "t").count() == 60)
  }

  test("E3 config job runs Full Refresh + Incremental across JDBC stores") {
    val srcDb = freshDb(); val dstDb = freshDb()
    srcDb.write(Seq((1L, "a")).toDF("id", "v"), "full_t")
    srcDb.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "inc_t")
    val rs = Extraction.runJob(spark, srcDb, dstDb, Seq(
      Extraction.TableJob("full_t", "Full Refresh"),
      Extraction.TableJob("inc_t", "Incremental Load"),
      Extraction.TableJob("missing", "Full Refresh")))
    assert(rs.count(_.isRight) == 2 && rs.count(_.isLeft) == 1)
    assert(dstDb.read(spark, "full_t").count() == 1)
    assert(dstDb.read(spark, "inc_t").count() == 2)
  }

  test("E1/E2 mixed stores: JDBC source → parquet target and back") {
    val db = freshDb()
    val dir = TestTmp.dir("graft")
    db.write((1L to 10L).map(i => (i, i * 2.0)).toDF("id", "x"), "t")
    // DB → parquet
    val r1 = Extraction.fullRefresh(db.read(spark, "t"), ParquetStore(dir), "t")
    assert(r1.rows == 10)
    // parquet → DB (append path via incremental)
    val db2 = freshDb()
    val r2 = Extraction.incrementalLoad(
      spark, ParquetStore(dir).read(spark, "t"), db2, "t")
    assert(r2.rows == 10)
    assert(rows(db2.read(spark, "t")) == rows(db.read(spark, "t")))
  }

  test("type fidelity through JDBC: timestamp, decimal, and nulls round-trip") {
    val db = freshDb()
    val ts = java.sql.Timestamp.valueOf("2024-06-01 12:34:56.789")
    val src = Seq(
      (1L, Option(ts), Option(BigDecimal("12345.67")), Option("x")),
      (2L, None, None, None),
    ).toDF("id", "t", "money", "s")
      .select($"id", $"t", $"money".cast("decimal(12,2)").as("money"), $"s")
    db.write(src, "typed", "overwrite")
    val got = db.read(spark, "typed")
    assert(got.schema("money").dataType.typeName == "decimal(12,2)")
    assert(got.schema("t").dataType.typeName == "timestamp")
    assert(rows(got) == rows(src))
  }

  test("partitioned JDBC read: explicit bounds and derived bounds split the scan") {
    val db = freshDb()
    db.write((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"), "t")
    val explicit = db.copy(
      partitioning = Some(JdbcPartitioning("id", 1L, 100L, 4)))
      .read(spark, "t")
    assert(explicit.rdd.getNumPartitions == 4)
    assert(explicit.count() == 100)
    val derived = db.readPartitioned(spark, "t", "id", 5)
    assert(derived.rdd.getNumPartitions == 5)
    assert(derived.count() == 100)
    // empty table: derived-bounds read degrades to a plain scan
    db.write(Seq.empty[(Long, String)].toDF("id", "v"), "e")
    assert(db.readPartitioned(spark, "e", "id", 5).count() == 0)
  }
}
