package graft.northstar

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (ArrayType(FloatType)) — BASELINE.json north-star (SURVEY.md §7.4).
  *
  * Baseline: brute-force cosine top-k (exact). Scale path: random-
  * hyperplane LSH — embeddings bucketed by the sign pattern of dot
  * products with `nPlanes` deterministic pseudo-random hyperplanes, the
  * query joins only its bucket (plus optional multi-probe neighbors).
  * At 100 TB the brute-force cross join is O(queries × corpus) and only
  * viable for small query sets; the LSH variant turns it into a bucket
  * equi-join whose shuffle is O(corpus), independent of query count.
  *
  * All math is codegen'd higher-order functions (zip_with/aggregate) over
  * the float arrays — no UDFs, no driver-side vectors. Hyperplanes are
  * generated from xxhash64(dim, plane) so the whole index is deterministic
  * and needs no model state.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm of a float-array column. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either side has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Exact brute-force top-k: every query row against every corpus row,
    * ranked per query. Correct at any scale but O(|queries| × |corpus|) —
    * the oracle baseline the ANN variant is measured against.
    * Output: (query_id, neighbor_id, rank), self-match excluded.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int = 10,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for
    * (dim, plane, table): xxhash64 → uniform in [-1, 1). Matches across
    * sessions and cluster sizes — the "index" is pure arithmetic.
    */
  private def planeComponent(dim: Column, plane: Int, table: Int): Column =
    (xxhash64(dim, lit(plane), lit(table)).cast("double") /
      lit(Long.MaxValue.toDouble))

  /** LSH bucket id for one hash table: sign bits of the embedding's dot
    * products with `nPlanes` hyperplanes packed into a long.
    */
  def hyperplaneBucket(vec: Column, nPlanes: Int, table: Int = 0): Column =
    (0 until nPlanes).map { p =>
      val d = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(i, p, table)),
        lit(0.0), (acc, v) => acc + v)
      when(d > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce[Column]((a, b) => a.bitwiseOR(b))

  /** All `nTables` bucket ids, each table's id offset into its own keyspace
    * so buckets never collide across tables.
    */
  def hyperplaneBuckets(vec: Column, nPlanes: Int, nTables: Int): Column =
    array((0 until nTables).map(t =>
      hyperplaneBucket(vec, nPlanes, t) + lit(t.toLong << 32)): _*)

  /** ANN top-k via multi-table hyperplane LSH: a row is a candidate for a
    * query iff they share a bucket in ANY of the `nTables` independent
    * tables (recall ≈ 1-(1-p^nPlanes)^nTables, p = 1-θ/π). Candidates are
    * deduped across tables before ranking. The shuffle is the bucket
    * equi-join: O(corpus × nTables) rows, independent of query count —
    * the 100 TB path where brute force is O(queries × corpus).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int = 10,
              nPlanes: Int = 4, nTables: Int = 8, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(hyperplaneBuckets(col(vecCol), nPlanes, nTables)).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      explode(hyperplaneBuckets(col(vecCol), nPlanes, nTables)).as("bucket"))
    val candidates = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "qv", "cv")
      .dropDuplicates("query_id", "neighbor_id")
    val scored = candidates.select(col("query_id"), col("neighbor_id"),
      cosine(col("qv"), col("cv")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: corpus self-joined within LSH
    * buckets, kept when cosine >= threshold (the embedding flavor of
    * near-dup dedup).
    */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double = 0.95,
                         nPlanes: Int = 8, idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    // single table suffices: true near-dups (cos ≥ 0.95, θ ≤ 18°) agree on
    // each hyperplane with p ≈ 0.9, so p^8 ≈ 0.43 per table — acceptable
    // for dedup sweeps; raise to multi-table for exhaustive passes
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      hyperplaneBucket(col(vecCol), nPlanes).as("bucket"))
    val a = c.select(col("bucket"), col("id").as("doc_a"), col("v").as("va"))
    val b = c.select(col("bucket"), col("id").as("doc_b"), col("v").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), cosine(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= threshold)
      .groupBy("doc_a", "doc_b").agg(max("sim").as("sim"))
  }
}
