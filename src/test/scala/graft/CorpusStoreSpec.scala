package graft

import java.nio.file.Files

import graft.engine.Extraction
import graft.northstar.Dedup
import graft.sources.{CsvStore, JsonlStore}
import org.apache.spark.sql.types._

/** CSV / JSON-Lines corpus stores behind the same Store surface as
  * parquet and JDBC — the ingestion formats real LLM-corpus dumps arrive
  * in.
  */
class CorpusStoreSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp() = TestTmp.dir("graft-corpus")

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("JSONL round-trip with explicit schema; feeds the dedup pipeline") {
    val store = JsonlStore(tmp(), Map("docs" -> docSchema))
    val docs = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "something else entirely")).toDF("doc_id", "text")
    store.write(docs, "docs")
    val got = store.read(spark, "docs")
    assert(got.schema("doc_id").dataType == LongType) // no inference pass
    assert(rows(got.select("doc_id", "text")) == rows(docs))
    // jsonl → exact dedup end-to-end
    val keep = Dedup.exactByText(got).collect()
    assert(keep.map(_.getAs[Long]("keep_id")).toSet == Set(1L, 3L))
  }

  test("CSV round-trip with explicit schema and header") {
    val store = CsvStore(tmp(), Map("t" -> StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))))
    val src = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    store.write(src, "t")
    val got = store.read(spark, "t")
    assert(got.schema("id").dataType == LongType)
    assert(rows(got) == rows(src))
  }

  test("E1/E2 run against corpus stores: jsonl source → parquet target") {
    val jl = JsonlStore(tmp(), Map("docs" -> docSchema))
    jl.write(Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text"), "docs")
    val dst = tmp()
    val r = Extraction.fullRefresh(jl.read(spark, "docs"),
      graft.sources.ParquetStore(dst), "docs")
    assert(r.rows == 2)
    // incremental: append one doc to the jsonl layer, pull only the delta
    jl.write(Seq((3L, "z")).toDF("doc_id", "text"), "docs", "append")
    val r2 = Extraction.incrementalLoad(spark, jl.read(spark, "docs"),
      graft.sources.ParquetStore(dst), "docs")
    assert(r2.rows == 1)
    assert(spark.read.parquet(s"$dst/docs.parquet").count() == 3)
  }
}
