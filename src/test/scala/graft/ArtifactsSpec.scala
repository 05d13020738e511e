package graft

import graft.northstar.{Artifacts, Ivf, TextAnalysis}
import org.apache.spark.sql.functions._

/** Pinned-parameter serving artifacts (BPE merge table, IVF centroids):
  * parquet round-trip fidelity, loud parameter-mismatch failure, and the
  * train-once/serve-by-load contract.
  */
class ArtifactsSpec extends SparkSpecBase {
  import spark.implicits._

  private def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("BPE merges round-trip parquet in learned order; serving with the loaded table is bit-identical") {
    val induced = TextAnalysis.bpeInduct(docs, rounds = 5)
    val direct = induced.collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val path = s"${tempDir("bpeart")}/merges"
    Artifacts.saveBpeMerges(induced, path, rounds = 5)
    val loaded = Artifacts.loadBpeMerges(spark, path, rounds = 5)
    assert(loaded == direct)
    // serving: identical output frame through the stored artifact
    val a = TextAnalysis.bpeApply(docs, direct)
      .select("doc_id", "n_words", "n_pieces").collect().map(_.toSeq).toSet
    val b = TextAnalysis.bpeApply(docs, loaded)
      .select("doc_id", "n_words", "n_pieces").collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("BPE artifact with mismatched rounds fails loudly at load") {
    val path = s"${tempDir("bpeart")}/merges"
    Artifacts.saveBpeMerges(
      TextAnalysis.bpeInduct(docs.limit(50), rounds = 3), path, rounds = 3)
    val e = intercept[IllegalArgumentException] {
      Artifacts.loadBpeMerges(spark, path, rounds = 5)
    }
    assert(e.getMessage.contains("rounds=3"))
  }

  test("bpeMergesFor serves BY LOADING: same cache key returns the stored table, not a retrain") {
    val key = s"artifacts-spec-bpe-${System.nanoTime()}"
    val first = Artifacts.bpeMergesFor(docs, key, rounds = 3)
    assert(first.nonEmpty)
    // different corpus content, same key: a retrain would learn different
    // merges; serve-by-load returns the stored table unchanged
    val other = Seq((1L, "zz zz zz zz qq qq")).toDF("doc_id", "text")
    assert(Artifacts.bpeMergesFor(other, key, rounds = 3) == first)
    // a different rounds value under the same corpus key is a DIFFERENT
    // artifact (rounds rides in the path AND the pinned column)
    val r2 = Artifacts.bpeMergesFor(docs, key, rounds = 2)
    assert(r2 == first.take(2))
  }

  test("LM heads round-trip parquet; serving with loaded heads is bit-identical; mismatch fails loudly") {
    val (vocab, total) = TextAnalysis.lmHead(docs, topK = 25)
    val path = s"${tempDir("lmart")}/head"
    Artifacts.saveLmHead(spark, vocab, total, path, topK = 25)
    val (lv, lt) = Artifacts.loadLmHead(spark, path, topK = 25)
    assert(lv == vocab && lt == total)
    val a = TextAnalysis.scoreWithLm(docs, vocab, total)
      .collect().map(_.toSeq).toSet
    val b = TextAnalysis.scoreWithLm(docs, lv, lt)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
    assert(intercept[IllegalArgumentException] {
      Artifacts.loadLmHead(spark, path, topK = 50)
    }.getMessage.contains("topK=25"))
    // bigram head: round-trip + mismatch
    val bg = TextAnalysis.bigramHead(docs, topK = 40)
    val bpath = s"${tempDir("lmart")}/bg"
    Artifacts.saveBigramHead(spark, bg, bpath, topK = 40)
    assert(Artifacts.loadBigramHead(spark, bpath, topK = 40) == bg)
    assert(intercept[IllegalArgumentException] {
      Artifacts.loadBigramHead(spark, bpath, topK = 10)
    }.getMessage.contains("topK=40"))
  }

  test("lmHeadFor / bigramHeadFor serve by loading the stored heads") {
    val key = s"artifacts-spec-lm-${System.nanoTime()}"
    val first = Artifacts.lmHeadFor(docs, key, topK = 10)
    val other = Seq((1L, "zz zz zz")).toDF("doc_id", "text")
    // same key, different corpus: serve-by-load returns the stored head
    assert(Artifacts.lmHeadFor(other, key, topK = 10) == first)
    val bfirst = Artifacts.bigramHeadFor(docs, key, topK = 10)
    assert(Artifacts.bigramHeadFor(other, key, topK = 10) == bfirst)
  }

  test("IVF centroids round-trip parquet with exact float equality; probing parity") {
    val fit = Ivf.fitCentroids(emb, nCells = 4)
    val path = s"${tempDir("ivfart")}/centroids"
    Artifacts.saveIvfCentroids(spark, fit, path, nCells = 4, seed = 42L)
    val loaded = Artifacts.loadIvfCentroids(spark, path, nCells = 4, seed = 42L)
    assert(loaded.map(_.toSeq).toSeq == fit.map(_.toSeq).toSeq)
    val q = emb.filter(col("vec_id") < 3)
    val a = Ivf.ivfTopK(q, emb, fit, k = 5, nProbe = 2)
      .collect().map(_.toSeq).toSet
    val b = Ivf.ivfTopK(q, emb, loaded, k = 5, nProbe = 2)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("IVF artifact with mismatched parameters fails loudly at load") {
    val path = s"${tempDir("ivfart")}/centroids"
    Artifacts.saveIvfCentroids(spark, Ivf.fitCentroids(emb, nCells = 4),
      path, nCells = 4, seed = 42L)
    assert(intercept[IllegalArgumentException] {
      Artifacts.loadIvfCentroids(spark, path, nCells = 8, seed = 42L)
    }.getMessage.contains("nCells=4"))
    assert(intercept[IllegalArgumentException] {
      Artifacts.loadIvfCentroids(spark, path, nCells = 4, seed = 7L)
    }.getMessage.contains("seed=42"))
  }

  test("ivfCentroidsFor serves by loading the stored quantizer") {
    val key = s"artifacts-spec-ivf-${System.nanoTime()}"
    val first = Artifacts.ivfCentroidsFor(emb, key, nCells = 4)
    // shifted corpus under the same key: a refit would move centroids;
    // serve-by-load returns the stored quantizer
    val shifted = emb.withColumn("embedding",
      transform(col("embedding"), x => x + lit(10.0f)))
    val again = Artifacts.ivfCentroidsFor(shifted, key, nCells = 4)
    assert(again.map(_.toSeq).toSeq == first.map(_.toSeq).toSeq)
  }
}
