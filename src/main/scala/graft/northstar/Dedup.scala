package graft.northstar

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines
  * (BASELINE.json north-star; SURVEY.md §7.4).
  *
  * All variants follow the scalable pattern: per-row signature computation
  * (narrow, codegen'd higher-order functions — no UDFs, no shuffle), then
  * ONE shuffle keyed on a compact signature (band hash / simhash chunk /
  * normalized text hash), then pairwise verification only within buckets.
  * Candidate generation never compares all pairs — at 100 TB the bucket
  * join is the only O(n) shuffle and bucket sizes stay bounded because the
  * band keyspace is 2^64.
  *
  * Everything is deterministic: hash family = xxhash64 with literal seeds
  * (Spark's seed parameter), so results are reproducible across runs and
  * cluster sizes.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup on a key expression: keep the row with the minimum id per
    * normalized-text group. groupBy+min is Spark's scalable exact dedup
    * (map-side partial min, one shuffle on the text hash).
    */
  def exactByText(df: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    df.groupBy(normText(col(textCol)).as("norm_text"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Whitespace-collapsed, lower-cased, trimmed view of a text column —
    * the canonical form all text dedup/fingerprint ops key on.
    */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  // -------------------------------------------------------------- minhash

  /** Word n-gram shingles of the normalized text (distinct). */
  def shingles(c: Column, n: Int = 3): Column = {
    val toks = split(normText(c), " ")
    // sliding word n-grams via transform over start offsets
    val grams = transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => array_join(slice(toks, i + lit(1), lit(n)), " "))
    array_distinct(grams)
  }

  /** k minhash values over the shingle set: h_i = min over shingles of
    * xxhash64(shingle, seed=i). Pure per-row expression (no shuffle); the
    * nested transform stays inside whole-stage codegen.
    */
  def minhashSignature(shingleCol: Column, k: Int = 16): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleCol,
        s => xxhash64(s, i))))

  /** MinHash-LSH candidate pairs: signatures banded (bands × rowsPerBand =
    * k), documents sharing any band bucket become candidates, then exact
    * shingle-Jaccard filters to >= threshold. One explode (×bands), one
    * shuffle on (band, bandHash), pairwise work only inside buckets.
    *
    * Output: (doc_a, doc_b, jaccard), doc_a < doc_b, deduped across bands.
    */
  def minhashPairs(df: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", k: Int = 16, bands: Int = 4,
                   threshold: Double = 0.7): DataFrame = {
    val rowsPer = k / bands
    val sig = df.select(col(idCol).as("id"),
        shingles(col(textCol)).as("sh"))
      .withColumn("mh", minhashSignature(col("sh"), k))
    val bandHashes = array((0 until bands).map(b =>
      xxhash64(slice(col("mh"), b * rowsPer + 1, rowsPer), lit(b))): _*)
    val banded = sig.select(col("id"), col("sh"), posexplode(bandHashes))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val a = banded.select(col("band"), col("band_hash"),
      col("id").as("doc_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .groupBy("doc_a", "doc_b").agg(max("jaccard").as("jaccard"))
  }

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(1.0)).otherwise(inter / uni)
  }

  /** n-gram Jaccard similarity scored for explicit candidate pairs
    * (pairsDf: doc_a, doc_b) — the verification half of near-dup dedup,
    * reusable against candidates from any generator (LSH, metadata, etc.).
    */
  def jaccardForPairs(docs: DataFrame, pairs: DataFrame,
                      textCol: String = "text", idCol: String = "doc_id",
                      n: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
    pairs
      .join(sh.withColumnRenamed("id", "doc_a").withColumnRenamed("sh", "sh_a"), Seq("doc_a"))
      .join(sh.withColumnRenamed("id", "doc_b").withColumnRenamed("sh", "sh_b"), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
  }

  // -------------------------------------------------------------- simhash

  /** The 64 bit masks 1L<<0 .. 1L<<63 as an array literal — lets bit tests
    * run inside array lambdas (Spark's shiftright/shiftleft only take
    * Scala-Int shift amounts, not Columns).
    */
  private val bitMasks: Column =
    typedLit((0 until 64).map(i => 1L << i))

  /** 64-bit SimHash of the token set: bit j of the fingerprint is 1 iff
    * sum over tokens of (bit j of xxhash64(token) ? +1 : -1) > 0.
    * Folded per-row with aggregate/zip_with — no shuffle, no UDF.
    */
  def simhash(textC: Column): Column = {
    val toks = array_distinct(split(normText(textC), " "))
    val counts = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc, bitMasks,
        (a, m) => a + when(xxhash64(t).bitwiseAND(m) =!= 0L, lit(1L))
                        .otherwise(lit(-1L))))
    aggregate(
      zip_with(counts, bitMasks,
        (cnt, m) => when(cnt > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-dup candidates: fingerprints sharing any of four 16-bit
    * chunks collide (pigeonhole: any pair within Hamming distance 3 shares
    * a chunk), then exact Hamming distance filters to <= maxHamming.
    */
  def simhashPairs(df: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val chunkVals = array((0 until 4).map(i =>
      shiftright(col("sig"), i * 16).bitwiseAND(lit(0xFFFFL))): _*)
    val chunked = sigs.select(col("id"), col("sig"), posexplode(chunkVals))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    val a = chunked.select(col("chunk"), col("chunk_val"),
      col("id").as("doc_a"), col("sig").as("sig_a"))
    val b = chunked.select(col("chunk"), col("chunk_val"),
      col("id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("doc_a", "doc_b").agg(min("hamming").as("hamming"))
  }
}
