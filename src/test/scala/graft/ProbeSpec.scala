package graft

import graft.northstar.{Ivf, Probe}
import org.apache.spark.sql.functions.{col, lit, when}

/** Distributed linear-probe training: exact-integer recurrence,
  * partition-order invariance, learning on separable data, and the
  * frozen-scorer serving contract.
  */
class ProbeSpec extends SparkSpecBase {
  import spark.implicits._

  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** Driver-side BigInt replay of one training step — the same
    * recurrence [[Probe.trainStepQ]] distributes.
    */
  private def stepRef(rows: Seq[(Seq[Long], Long)],
                      w: Seq[Long]): Seq[Long] = {
    val n = rows.size
    val d = BigInt(2) * n * 10000L * 10000L
    w.indices.map { j =>
      val g = rows.map { case (q, y) =>
        val m = q.indices.map(i => BigInt(q(i)) * w(i)).sum
        (m - BigInt(y) * 100000000L) * q(j)
      }.sum
      val wp = BigInt(w(j)) * d - g
      ((wp.abs * 2 + d) / (d * 2) * wp.signum).toLong
    }
  }

  private def quantized(df: org.apache.spark.sql.DataFrame,
                        splitAt: Int): Seq[(Seq[Long], Long)] =
    df.select(Ivf.quantizeVec(col("embedding")).as("q"),
        Probe.target(col("label"), splitAt).as("y"))
      .collect()
      .map(r => (r.getSeq[Long](0).toSeq, r.getLong(1))).toSeq

  test("trainStepQ matches the driver-side BigInt recurrence from zero and from nonzero weights") {
    val ref = quantized(emb, splitAt = 5)
    val w1 = Probe.trainStepQ(emb, Seq.fill(64)(0L))
    assert(w1 == stepRef(ref, Seq.fill(64)(0L)))
    val w2 = Probe.trainStepQ(emb, w1)
    assert(w2 == stepRef(ref, w1))
    assert(Probe.trainQ(emb, iters = 2) == w2)
  }

  test("training is partition-order and partition-count invariant") {
    val w = Probe.trainQ(emb, iters = 2)
    assert(Probe.trainQ(emb.repartition(7), iters = 2) == w)
    assert(Probe.trainQ(emb.orderBy(col("vec_id").desc), iters = 2) == w)
  }

  test("a linearly separable direction is learned: sign(x0) labels classified perfectly") {
    // synthetic set where y = sign of the first component: the probe
    // must pick up a dominant w(0) and classify every training row
    val data = (0 until 200).map { i =>
      val x0 = if (i % 2 == 0) 0.8f else -0.8f
      val noise = Array.tabulate(63)(j =>
        (((i * 31 + j * 17) % 11) - 5) / 100.0f)
      (i.toLong, (x0 +: noise).toSeq, if (i % 2 == 0) 0 else 9)
    }.toDF("vec_id", "embedding", "label")
    val w = Probe.trainQ(data, iters = 2)
    assert(math.abs(w.head) == w.map(math.abs).max,
      s"w0 not dominant: ${w.take(5)}")
    val scored = Probe.scoreQ(data, w)
      .join(data.select(col("vec_id"), col("label")), "vec_id")
      .select(col("pred"), col("label")).collect()
    assert(scored.forall(r => r.getInt(0) == (if (r.getInt(1) < 5) 1 else 0)))
  }

  test("scoreQ margin is the exact integer dot of quantized vectors and weights") {
    val w = Probe.trainQ(emb, iters = 1)
    val got = Probe.scoreQ(emb, w).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val ref = emb.select(col("vec_id"), Ivf.quantizeVec(col("embedding")))
      .collect().map { r =>
        val m = r.getSeq[Long](1).zip(w).map { case (a, b) => a * b }.sum
        r.getLong(0) -> ((m, if (m >= 0) 1 else 0))
      }.toMap
    assert(got == ref && got.nonEmpty)
  }

  test("scoreQ fails loudly on null or wrong-dimension vectors, never silent null preds") {
    def allMessages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val w = Probe.trainQ(emb, iters = 1)
    // a nulled vector used to null the margin, and the null pred row
    // silently vanished from any downstream filter(pred === 1) keep-set
    val withNull = emb.select(col("vec_id"),
      when(col("vec_id") === emb.select("vec_id").head().getLong(0),
          lit(null).cast("array<float>"))
        .otherwise(col("embedding")).as("embedding"))
    val e1 = intercept[Throwable] { Probe.scoreQ(withNull, w).collect() }
    assert(allMessages(e1).contains("scoreQ"), allMessages(e1))
    // zip_with pads a short vector with nulls — same silent-null shape
    val short = emb.select(col("vec_id"),
      org.apache.spark.sql.functions.slice(col("embedding"), 1, 8)
        .as("embedding"))
    val e2 = intercept[Throwable] { Probe.scoreQ(short, w).collect() }
    assert(allMessages(e2).contains("scoreQ"), allMessages(e2))
    // intact corpus still scores every row
    assert(Probe.scoreQ(emb, w).count() == emb.count())
  }

  test("dimension mismatch and empty input fail loudly") {
    intercept[IllegalArgumentException] {
      Probe.trainStepQ(emb, Seq.fill(32)(0L))
    }
    intercept[IllegalArgumentException] {
      Probe.trainStepQ(emb.filter(col("vec_id") < 0), Seq.fill(64)(0L))
    }
  }

  test("mixed-dimension and null-label corpora are rejected, not silently partially trained") {
    // sum() skips null gradient terms, so without the strict row-count
    // checks these corpora would train on wrong gradients under a
    // nondeterministic n (code-review r12)
    val good = (0 until 10).map(i => (i.toLong, Seq.fill(4)(0.1f), 1))
    val short = Seq((99L, Seq.fill(2)(0.1f), 1))
    val mixed = (good ++ short).toDF("vec_id", "embedding", "label")
    val e1 = intercept[IllegalArgumentException] {
      Probe.trainStepQ(mixed, Seq.fill(4)(0L))
    }
    assert(e1.getMessage.contains("refusing to train"), e1.getMessage)
    val nullLab = good.toDF("vec_id", "embedding", "label")
      .withColumn("label",
        when(col("vec_id") === 3L, lit(null)).otherwise(col("label")))
    val e2 = intercept[IllegalArgumentException] {
      Probe.trainStepQ(nullLab, Seq.fill(4)(0L))
    }
    assert(e2.getMessage.contains("null residual"), e2.getMessage)
  }

  test("null and empty embedding vectors are rejected, not silently dropped") {
    // plain posexplode emits ZERO rows for a null/empty vector, so the
    // row would vanish uniformly from every position — n and n_valid
    // would agree on the reduced corpus and training would silently
    // proceed on different weights (code-review r12); posexplode_outer
    // + the null-pos check refuse instead
    val good = (0 until 10).map(i => (i.toLong, Seq.fill(4)(0.1f), 1))
    val withNull = good.toDF("vec_id", "embedding", "label")
      .withColumn("embedding",
        when(col("vec_id") === 3L, lit(null)).otherwise(col("embedding")))
    val e1 = intercept[IllegalArgumentException] {
      Probe.trainStepQ(withNull, Seq.fill(4)(0L))
    }
    assert(e1.getMessage.contains("null or empty"), e1.getMessage)
    val withEmpty = good.toDF("vec_id", "embedding", "label")
      .withColumn("embedding",
        when(col("vec_id") === 3L,
          lit(Array.empty[Float])).otherwise(col("embedding")))
    val e2 = intercept[IllegalArgumentException] {
      Probe.trainStepQ(withEmpty, Seq.fill(4)(0L))
    }
    assert(e2.getMessage.contains("null or empty"), e2.getMessage)
  }
}
