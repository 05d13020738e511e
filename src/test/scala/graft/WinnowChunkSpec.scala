package graft

import graft.northstar.Dedup
import org.apache.spark.sql.functions._

/** Chunked winnowing sketch (VERDICT r10 watch #2): documents longer
  * than `chunkTokens` are sketched in overlapping token chunks so peak
  * per-row memory is O(chunkTokens), not O(doc length). The contract
  * under test: short documents are bit-identical to the unchunked
  * sketch (the default bound chunks nothing in testdata), a chunked
  * long-document sketch is a SUPERSET of its unchunked sketch with only
  * the small chunk-tail density overhead, and the window+k-1 detection
  * guarantee survives the two sides of a join using DIFFERENT
  * chunkTokens (the bound is a memory knob, not a pinned sketch
  * parameter).
  *
  * Also here: the [[Dedup.releasePersisted]] caller-side cache-release
  * contract (ADVICE r10 #4).
  */
class WinnowChunkSpec extends SparkSpecBase {
  import spark.implicits._

  lazy val corpus = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  private def skRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("short documents: default chunk bound is bit-identical to the unchunked sketch") {
    val chunkedDefault = skRows(Dedup.winnowSketch(corpus))
    val unchunked = skRows(Dedup.winnowSketch(corpus, chunkTokens = 1 << 20))
    assert(chunkedDefault == unchunked && chunkedDefault.nonEmpty)
  }

  test("long document: chunked sketch is a superset with only chunk-tail overhead") {
    val k = 5; val window = 4; val chunk = 64
    val doc = Seq((1L, (1 to 600).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val unchunked = skRows(Dedup.winnowSketch(doc, k, window,
      chunkTokens = 1 << 20))
    val chunked = skRows(Dedup.winnowSketch(doc, k, window,
      chunkTokens = chunk))
    assert(unchunked.subsetOf(chunked), "chunking must never LOSE a selection")
    // overhead is bounded by the per-chunk tail term: each chunk's
    // end-clamped windows can add at most window-1 distinct extra
    // selections beyond the unchunked set
    val stride = chunk - (window + k - 2)
    val nChunks = math.ceil((600 - (window + k - 2)).toDouble / stride).toInt
    assert(chunked.size <= unchunked.size + nChunks * (window - 1),
      s"chunked=${chunked.size} unchunked=${unchunked.size} nChunks=$nChunks")
  }

  test("detection guarantee holds across mismatched chunkTokens on the two join sides") {
    val shared = (1 to 8).map(i => s"sh_$i") // window + k - 1 = 8 tokens
    val a = Seq((1L, ((1 to 200).map(i => s"a_$i").take(97) ++ shared ++
      (98 to 200).map(i => s"a_$i")).mkString(" "))).toDF("doc_id", "text")
    val b = Seq((2L, ((1 to 50).map(i => s"b_$i").take(13) ++ shared ++
      (14 to 50).map(i => s"b_$i")).mkString(" "))).toDF("doc_id", "text")
    // side A sketched with a tiny memory bound (chunks), side B unchunked
    val skA = Dedup.winnowSketch(a, chunkTokens = 16)
    val skB = Dedup.winnowSketch(b, chunkTokens = 1 << 20)
    val hits = skA.select(col("fp"))
      .join(skB.select(col("fp")), Seq("fp")).count()
    assert(hits > 0, "shared run must surface a shared selected fingerprint")
    // and a disjoint doc pairs with neither
    val c = Seq((3L, (1 to 60).map(i => s"c_$i").mkString(" ")))
      .toDF("doc_id", "text")
    val skC = Dedup.winnowSketch(c, chunkTokens = 16)
    assert(skA.select("fp").join(skC.select("fp"), Seq("fp")).count() == 0)
  }

  test("fused sketch kernel equals the legacy higher-order-expression formulation") {
    // the r20 optimization swapped winnowSketch's construction from the
    // transform/slice/md5 expression chain onto the fused
    // TextOps.winnowSketch kernel; this pins value-identity against the
    // legacy formulation (spelled verbatim below) across the edge
    // domain: blank/1/k-1/k/k+window token docs, repeated tokens
    // (duplicate grams), multibyte tokens, and chunk-boundary lengths
    // (chunk-1 / chunk / chunk+1 / several strides)
    def legacy(docs: org.apache.spark.sql.DataFrame, k: Int, window: Int,
               chunkTokens: Int) = {
      def fpsOf(toks: org.apache.spark.sql.Column) =
        transform(
          sequence(lit(1), greatest(lit(1), size(toks) - lit(k - 1))),
          i => md5(array_join(slice(toks, i, lit(k)), " ").cast("binary")))
      def selsOf(fps: org.apache.spark.sql.Column) =
        transform(sequence(lit(1), size(fps)),
          j => array_min(slice(fps, j, lit(window))))
      def sketchOf(toks: org.apache.spark.sql.Column) =
        element_at(transform(array(fpsOf(toks)), fps => selsOf(fps)), 1)
      val stride = chunkTokens - (window + k - 2)
      val w = col("w")
      val chunked = flatten(transform(
        sequence(lit(1),
          greatest(lit(1), size(w) - lit(window + k - 2)), lit(stride)),
        s => sketchOf(slice(w, s, lit(chunkTokens)))))
      docs.select(col("doc_id").as("doc"),
          when(col("text").isNull || length(trim(col("text"))) === 0,
            array().cast("array<string>"))
            .otherwise(split(Dedup.normText(col("text")), " ")).as("w"))
        .filter(size(w) > 0)
        .select(col("doc"), explode(array_distinct(
          when(size(w) <= chunkTokens, sketchOf(w))
            .otherwise(chunked))).as("fp"))
    }
    val wordsOf = (n: Int, tag: String) =>
      (1 to n).map(i => s"${tag}_${i % 7}").mkString(" ")
    val docs = Seq(
      1L -> "", 2L -> "one", 3L -> "two words", 4L -> wordsOf(2, "x"),
      5L -> wordsOf(3, "y"), 6L -> wordsOf(6, "z"), 7L -> wordsOf(11, "r"),
      8L -> wordsOf(12, "s"), 9L -> wordsOf(13, "t"), 10L -> wordsOf(29, "u"),
      11L -> "héllo wörld ünï códe rêpeat héllo wörld ünï códe rêpeat",
      12L -> ("  Mixed   CASE\t and \n runs  " * 6)).toDF("doc_id", "text")
    for ((k, window, chunk) <- Seq((3, 2, 12), (5, 4, 12), (2, 5, 6))) {
      val kernel = skRows(Dedup.winnowSketch(docs, k, window,
        chunkTokens = chunk))
      val legacyRows = legacy(docs, k, window, chunk).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(kernel == legacyRows,
        s"k=$k window=$window chunk=$chunk: kernel " +
          s"${(kernel -- legacyRows).take(3)} vs legacy " +
          s"${(legacyRows -- kernel).take(3)}")
    }
  }

  test("chunkTokens below one window+gram span is rejected") {
    intercept[IllegalArgumentException] {
      Dedup.winnowSketch(corpus, k = 5, window = 4, chunkTokens = 7).count()
    }
  }

  test("releasePersisted frees the frames dedup ops cached (caller-side contract)") {
    val sc = spark.sparkContext
    Dedup.releasePersisted() // drain anything earlier suites left behind
    val before = sc.getPersistentRDDs.keySet
    // minhashPairs persists its banded-signature frame via materializeOnce
    Dedup.minhashPairs(corpus.limit(100)).count()
    val during = sc.getPersistentRDDs.keySet -- before
    assert(during.nonEmpty, "op must have registered persisted blocks")
    Dedup.releasePersisted()
    assert((sc.getPersistentRDDs.keySet & during).isEmpty,
      "release must unpersist every frame the ops registered")
    // idempotent and safe to call with nothing pending
    Dedup.releasePersisted()
  }
}
