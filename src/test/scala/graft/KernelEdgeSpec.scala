package graft

import graft.functions.{texthash, vectors}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Edge cases for the custom codegen kernels: nulls, empties, mismatched
  * dims, SQL-path nulls — both the interpreted (nullSafeEval) and codegen
  * paths must agree.
  */
class KernelEdgeSpec extends SparkSpecBase {
  import scala.jdk.CollectionConverters._
  import spark.implicits._

  test("vec_cosine: null input → null; empty arrays → 0; mismatched dims fail loudly") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType)), StructField("b", ArrayType(FloatType))))
    val df = spark.createDataFrame(Seq(
      Row(null, Seq(1f)), Row(Seq.empty[Float], Seq.empty[Float])).asJava,
      schema)
    val out = df.select(vectors.vec_cosine($"a", $"b")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) == 0.0)
    // pre-r14 a dim mismatch silently scored the common PREFIX — a
    // 384-dim probe against 768-dim embeddings returned plausible
    // cosines with no signal; now it names the problem like the
    // PQ/centroid kernels do
    val bad = spark.createDataFrame(
      Seq(Row(Seq(1f, 0f, 5f), Seq(1f, 0f))).asJava, schema)
    def allMessages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val e = intercept[Throwable] {
      bad.select(vectors.vec_cosine($"a", $"b")).collect()
    }
    assert(allMessages(e).contains("dimension mismatch"), allMessages(e))
    val e2 = intercept[Throwable] {
      bad.select(vectors.vec_dot($"a", $"b")).collect()
    }
    assert(allMessages(e2).contains("dimension mismatch"), allMessages(e2))
  }

  test("minhash_sig / simhash64: null → null, empty and blank strings deterministic") {
    val df = Seq(Some(""), Some("   "), Some("x"), None).toDF("t")
    val out = df.select(texthash.minhash_sig($"t"), texthash.simhash64($"t")).collect()
    assert(out(3).isNullAt(0) && out(3).isNullAt(1))
    assert(out(0).getAs[scala.collection.Seq[Long]](0).size == 16)
    // empty and whitespace-only normalize identically
    assert(out(0).getAs[scala.collection.Seq[Long]](0) ==
           out(1).getAs[scala.collection.Seq[Long]](0))
    assert(out(0).getLong(1) == out(1).getLong(1))
  }

  test("kernels are locale-proof: a Turkish default locale cannot move fingerprints") {
    // VERDICT r11 task 4: the kernels lower-case with Locale.ROOT
    // because a tr-locale executor JVM lowercases "I" to dotless ı,
    // which would silently shift every token, signature, and stopword
    // count with the machine's locale. Pin results under the default
    // locale, re-evaluate with tr as the JVM default, and require
    // equality — the pre-r11 toLowerCase() kernel fails this test.
    import graft.functions.TextOps
    import graft.northstar.TextAnalysis
    val texts = Seq(
      (1L, "IT IS A TITLE WITH CAPITAL I LETTERS"),
      (2L, "I think It Is fine"),
      (3L, "III II I Istanbul LIKING"))
    val df = texts.toDF("doc_id", "text")
    def probe() = {
      val sigs = df.select($"doc_id", texthash.minhash_sig($"text"),
          texthash.simhash64($"text"),
          texthash.text_stats($"text", TextOps.DefaultStopwords))
        .collect()
        .map(r => (r.getLong(0), r.getAs[scala.collection.Seq[Long]](1).toSeq,
          r.getLong(2), r.getAs[scala.collection.Seq[Long]](3).toSeq)).toSet
      val lang = df.select($"doc_id", TextAnalysis.languageId($"text"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      (sigs, lang)
    }
    val before = probe()
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      // sanity: the hostile locale really is hostile on this JVM
      assert("TITLE".toLowerCase != "title",
        "tr locale did not take effect — test would prove nothing")
      assert(probe() == before)
    } finally java.util.Locale.setDefault(saved)
  }

  test("minhash_est: zero-length signature → 0.0; identical → 1.0") {
    val df = Seq((Seq(1L, 2L), Seq(1L, 2L)), (Seq.empty[Long], Seq.empty[Long]))
      .toDF("a", "b")
    val out = df.select(texthash.minhash_est($"a", $"b")).collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(1.0, 0.0))
  }

  test("SQL path: kernels return null on null input through codegen") {
    graft.functions.registry.registerAll(spark)
    val r = spark.sql(
      "SELECT vec_cosine(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))), " +
      "simhash64(CAST(NULL AS STRING))").collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("lsh_buckets: table ids partition the keyspace (no cross-table collisions)") {
    val df = Seq(Seq(1f, 2f, 3f)).toDF("v")
    val buckets = df.select(vectors.lsh_buckets($"v", 4, 8)).collect()(0)
      .getAs[scala.collection.Seq[Long]](0)
    assert(buckets.size == 8)
    assert(buckets.map(_ >> 32).toSeq == (0L until 8L))
  }

  test("bloom_gram_hits: null → null, empty/blank deterministic, empty filter hits nothing") {
    import graft.northstar.Dedup
    val bench = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val bloom = Dedup.benchmarkBloom(bench)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val df = spark.createDataFrame(Seq(
      Row(1L, null), Row(2L, ""), Row(3L, "   "),
      Row(4L, "alpha beta gamma")).asJava, schema)
    val out = Dedup.decontaminateBloom(df, bloom).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    assert(out(1L).isEmpty, "null text → null hits")
    assert(out(2L).exists(_ >= 0) && out(3L).exists(_ >= 0),
      "blank text must not throw")
    assert(out(4L).contains(1), "the one shared 3-gram hits")
    // a filter built from an empty benchmark flags nothing
    val empty = Dedup.benchmarkBloom(bench.filter($"doc_id" < 0))
    val clean = Dedup.decontaminateBloom(
      Seq((9L, "alpha beta gamma delta")).toDF("doc_id", "text"), empty)
      .collect()(0).getInt(2)
    assert(clean == 0)
    // a non-string child now COERCES via the declared input type (the
    // MinHashSig/TextStats convention) instead of passing analysis
    // undeclared and dying as a ClassCastException deep in an executor
    // (code-review r14): doc_id 4 hashes as the text "4" — zero hits
    val coerced = df.filter($"doc_id" === 4L)
      .select(graft.functions.bloomops.bloom_gram_hits($"doc_id", bloom))
      .collect()(0).getInt(0)
    assert(coerced == 0)
  }

  test("minhashPairsAgainst / sourceEntropy: empty slices and blank text are safe") {
    import graft.northstar.{Dedup, TextAnalysis}
    val docs = Seq((1L, "s1", "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "source", "text")
    val emptySlice = docs.filter($"doc_id" < 0).select("doc_id", "text")
    // empty incoming OR empty corpus → empty pair list, no crash
    assert(Dedup.minhashPairsAgainst(
      emptySlice, docs.select("doc_id", "text"), threshold = 0.5).count() == 0)
    assert(Dedup.minhashPairsAgainst(
      docs.select("doc_id", "text"), emptySlice, threshold = 0.5).count() == 0)
    // blank-only source contributes no terms (filtered), never a NaN ln
    val blanks = Seq((1L, "s1", "alpha beta"), (2L, "s2", "  "))
      .toDF("doc_id", "source", "text")
    val ent = TextAnalysis.sourceEntropy(blanks).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("entropy_e4")).toMap
    assert(ent.keySet == Set("s1"), "all-blank source yields no row")
    assert(ent("s1") >= 0)
  }

  test("profile_hits: one-pass counts match HOF filters; null/empty/dup semantics") {
    val profiles = Seq(Seq("the", "and"), Seq("der", "und"))
    val df = Seq(Some("The the AND cat"), Some(""), Some("   "), None,
      Some("und der und")).toDF("t")
    val out = df.select(texthash.profile_hits($"t", profiles).as("h")).collect()
    assert(out(0).getAs[scala.collection.Seq[Int]]("h") == Seq(3, 0)) // dups counted, case-folded
    assert(out(1).getAs[scala.collection.Seq[Int]]("h") == Seq(0, 0))
    assert(out(2).getAs[scala.collection.Seq[Int]]("h") == Seq(0, 0))
    assert(out(3).isNullAt(0))
    assert(out(4).getAs[scala.collection.Seq[Int]]("h") == Seq(0, 3))
    // parity with the interpreted HOF formulation on arbitrary text
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val hof = org.apache.spark.sql.functions.size(
      org.apache.spark.sql.functions.filter(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.trim($"text")), "\\s+"),
        x => x.isin(profiles.head: _*)))
    val cmp = docs.select(
      org.apache.spark.sql.functions.get(
        texthash.profile_hits($"text", profiles),
        org.apache.spark.sql.functions.lit(0)).as("kernel"),
      hof.as("hof"))
    assert(cmp.filter($"kernel" =!= $"hof").count() == 0)
  }

  test("BloomGramHits: content-equal filters compare equal (canonicalization/CSE-able)") {
    import graft.functions.{BloomGramHits, BloomOps}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    bf.putBinary("alpha beta gamma".getBytes("UTF-8"))
    val bytes = BloomOps.serialize(bf)
    val a = BloomGramHits(Literal("x"), bytes, 3)
    val b = BloomGramHits(Literal("x"), bytes.clone(), 3) // distinct array, same content
    assert(a == b && a.hashCode == b.hashCode)
    assert(a.semanticEquals(b))
    assert(a != BloomGramHits(Literal("x"), bytes, 4))
    val other = BloomOps.serialize(
      org.apache.spark.util.sketch.BloomFilter.create(100, 0.01))
    assert(a != BloomGramHits(Literal("x"), other, 3))
  }

  test("bm25: blank/short/null-free edges — no hits no row, sub-minLen terms invisible") {
    import graft.northstar.TextAnalysis
    val docs = Seq(
      (1L, ""),              // blank: dl=0... no hits → no row
      (2L, "a b c"),         // all tokens below minTermLen=3 → no row
      (3L, "cat cat"),       // hits
      (4L, "   cat   "),     // whitespace-heavy, still tokenizes
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, Seq("cat")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.keySet == Set(3L, 4L))
    assert(out(3L) == 2 && out(4L) == 1) // dl counts qualifying terms only
    // serve path agrees on the same edges
    val (dfm, n, s) = TextAnalysis.bm25Stats(docs, Seq("cat"))
    assert(dfm == Map("cat" -> 2L) && n == 4L && s == 3L)
    val served = TextAnalysis.scoreWithBm25(docs, dfm, n, s).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(served.keySet == Set(3L, 4L))
    // a query term absent from the corpus: df=0 pins idf at the max —
    // finite, and docs still produce no row (no hits)
    val (dfm2, n2, s2) = TextAnalysis.bm25Stats(docs, Seq("zzz"))
    assert(dfm2 == Map("zzz" -> 0L))
    assert(TextAnalysis.scoreWithBm25(docs, dfm2, n2, s2).count() == 0)
  }

  test("pq/jl kernels reject a per-row codebook/matrix column at the API boundary") {
    // ADVICE r12 #2: the kernels cache the converted codebook by object
    // identity, sound only for plan constants — a per-row column must
    // fail loudly at Column construction, not silently serve stale data
    import org.apache.spark.sql.functions.typedLit
    val perRow = $"embedding" // any non-foldable expression
    intercept[IllegalArgumentException] {
      vectors.pq_encode($"embedding", perRow, 2, 4)
    }
    intercept[IllegalArgumentException] {
      vectors.pq_adc_cosine($"embedding", $"codes", perRow, 2, 4)
    }
    intercept[IllegalArgumentException] {
      vectors.jl_project($"embedding", perRow, 4, 10000)
    }
    // literals still pass (the sanctioned path)
    vectors.pq_encode($"embedding", typedLit(Seq(1f, 2f)), 1, 1): Unit
    // COMPOSED constants pass too (code-review r13): array(lit...) and
    // a cast of a literal fold to one value — the identity cache is
    // sound for them, so rejecting them would break callers that
    // worked before the r12 boundary check
    import org.apache.spark.sql.functions.{array, lit}
    vectors.pq_encode($"embedding", array(lit(1f), lit(2f)), 1, 1): Unit
    vectors.jl_project($"embedding",
      typedLit(Seq(1f, 2f, 3f, 4f)).cast("array<float>"), 4, 10000): Unit
    // ...but non-deterministic expressions are NOT constants even with
    // literal children
    intercept[IllegalArgumentException] {
      vectors.jl_project($"embedding",
        array(org.apache.spark.sql.functions.rand(7).cast("float")), 1, 10000)
    }
  }

  test("best_cell_in: null → null, empty group → null, zero vector, " +
       "tie → higher cell, shape mismatch fails loudly") {
    import org.apache.spark.sql.functions.{col, typedLit}
    import spark.implicits._
    def run(vec: Seq[Float], flat: Seq[Float], cells: Seq[Int]) =
      Seq(Tuple1(vec)).toDF("v").select(
        graft.functions.vectors.best_cell_in(col("v"),
          typedLit(flat), typedLit(cells)).as("b")).head()
    // plain argmax: c7=(1,0) ties the query direction, c3=(0,1) doesn't
    val r = run(Seq(2f, 0f), Seq(1f, 0f, 0f, 1f), Seq(7, 3))
    assert(r.getStruct(0).getInt(1) == 7)
    assert(math.abs(r.getStruct(0).getDouble(0) - 1.0) < 1e-12)
    // duplicate centroids: the cellOf tie contract — HIGHER cell wins
    val tie = run(Seq(1f, 1f), Seq(1f, 1f, 1f, 1f), Seq(2, 9))
    assert(tie.getStruct(0).getInt(1) == 9)
    // zero query vector: cosine defined as 0 everywhere → sim 0, tie
    // resolution still picks the highest cell
    val z = run(Seq(0f, 0f), Seq(1f, 0f, 0f, 1f), Seq(4, 1))
    assert(z.getStruct(0).getDouble(0) == 0.0)
    assert(z.getStruct(0).getInt(1) == 4)
    // empty packed group → null (no argmax to take)
    val e = run(Seq(1f, 0f), Seq.empty, Seq.empty)
    assert(e.isNullAt(0))
    // null vector → null through the codegen null gate
    val n = Seq(Tuple1(null.asInstanceOf[Seq[Float]])).toDF("v").select(
      graft.functions.vectors.best_cell_in(col("v"),
        typedLit(Seq(1f, 0f)), typedLit(Seq(0)))).head()
    assert(n.isNullAt(0))
    // flat length must be nCells*dim — a truncated sub-matrix would
    // otherwise score a silent prefix
    val ex = intercept[Exception] {
      run(Seq(1f, 0f), Seq(1f, 0f, 0f), Seq(5, 6))
    }
    assert(ex.getMessage != null
      && ex.getMessage.contains("shape mismatch"), ex.getMessage)
  }

  test("top_cells_in == nearest_cells over the full centroid set; " +
       "take past the group returns every cell once") {
    import org.apache.spark.sql.functions.{col, typedLit}
    import spark.implicits._
    // same ordering contract (cosine desc, tie -> higher cell) with the
    // matrix as PER-ROW DATA instead of a plan literal — the packed
    // kernel must replay the literal kernel on identical inputs
    val rnd = new scala.util.Random(31)
    val dim = 6
    val cents = Array.fill(5)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    cents(3) = cents(1).clone() // duplicate centroid: tie -> higher id
    val flat = cents.flatten.toSeq
    val df = (0 until 40).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "v")
    val got = df.select(col("vec_id"),
        graft.functions.vectors.top_cells_in(col("v"), typedLit(flat),
          typedLit(Seq(0, 1, 2, 3, 4)), 3).as("packed"),
        graft.functions.vectors.nearest_cells(col("v"),
          typedLit(flat), 5, 3).as("lit"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"vec ${r.getLong(0)}: ${r.getSeq[Int](1)} vs ${r.getSeq[Int](2)}")
    }
    // take beyond the group size: every cell exactly once, best first
    val all = df.limit(3).select(
        graft.functions.vectors.top_cells_in(col("v"), typedLit(flat),
          typedLit(Seq(0, 1, 2, 3, 4)), 99)).collect()
    all.foreach(r => assert(r.getSeq[Int](0).sorted == (0 until 5).toList))
  }
}
