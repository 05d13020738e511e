package graft.northstar

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear-probe TRAINING — the model-based quality/topic
  * filter of modern corpus curation, trained in-engine instead of
  * imported as a fixed direction ([[Similarity.probeScore]] serves one).
  *
  * The trainer runs a fixed number of full-batch gradient-descent steps
  * on squared loss (a least-squares linear classifier: the classic
  * closed-form linear probe, fit iteratively so the per-step cost model
  * is one distributed pass). Every step is EXACT INTEGER arithmetic in
  * the [[Ivf.lloydStepQ]] discipline, so the result is bit-deterministic
  * across engines, partition counts, and row orders, and a DuckDB replay
  * of the same recurrence reproduces the weights exactly:
  *
  *  - vectors quantize to the 1e4 grid (qx = round(1e4·x), exact: f32
  *    widens to double losslessly), weights live on the same 1e4 grid;
  *  - the margin Σⱼ wⱼ·qxⱼ is 64-bit integer (|w|≤~1e5, |qx|≤~1e4,
  *    dim·1e9 ≪ 2⁶³);
  *  - per-dimension gradient terms are 64-bit integer per row and
  *    accumulate in DECIMAL(38,0), so the sum is overflow-safe and
  *    order-independent to ~1e9+ rows (headroom ~1e23 per dim at 1e9
  *    rows vs 1e38 capacity);
  *  - the update wⱼ ← rnd(2n·10⁸·wⱼ − Gⱼ, 2n·10⁸) — i.e. learning rate
  *    1/2 on the AVERAGE gradient, then re-rounded to the 1e4 grid —
  *    uses round-half-away-from-zero expressed as floor division of
  *    non-negative integers, which every engine computes identically.
  *
  * Plan shape per step: one narrow pass (quantize + margin + residual) →
  * posexplode (dim rows per vector) → one (pos) aggregate whose partial
  * aggregation collapses the explode to dim·shufflePartitions rows
  * before the exchange. The dim-row update table is the only driver
  * materialization — the sanctioned bounded collect. At 100 TB each
  * step is one scan + one tiny shuffle; iterations are fixed and small
  * (a linear probe on normalized features converges in a handful of
  * lr=1/2 steps because the empirical Hessian has eigenvalues ≤ 1).
  *
  * Labels binarize as y = +1 when `labelCol` < `splitAt` else −1 (the
  * one-vs-rest curation shape: "keep" classes vs the rest).
  */
object Probe {

  /** Quantization grid for vectors and weights (the [[Ivf.quantizeVec]]
    * grid).
    */
  val Scale: Long = 10000L

  /** ±1 target from an integer class label. A null label stays null —
    * `when(...).otherwise(-1)` would silently assign every unlabeled
    * row to the negative class; propagating the null instead lets
    * [[trainStepQ]]'s strict row-count check reject the corpus loudly.
    */
  def target(labelCol: Column, splitAt: Int): Column =
    when(labelCol.isNull, lit(null).cast("long"))
      .when(labelCol < splitAt, 1L).otherwise(-1L)

  /** Integer margin Σⱼ wⱼ·qxⱼ of a quantized vector against integer
    * weights (scale 1e8 = weight grid × vector grid). Pure narrow
    * codegen'd arithmetic — the serving path has no shuffle and no
    * driver state beyond the dim-sized literal.
    */
  def marginQ(vec: Column, w: Seq[Long]): Column =
    aggregate(
      zip_with(Ivf.quantizeVec(vec), typedLit(w), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)

  /** One exact full-batch gradient step; returns the updated weight
    * vector (1e4 grid). `w` must have one entry per embedding
    * dimension.
    */
  def trainStepQ(emb: DataFrame, w: Seq[Long], splitAt: Int = 5,
                 labelCol: String = "label",
                 vecCol: String = "embedding"): Seq[Long] = {
    val dim = w.length
    // qx is projected ONCE and both the residual and the exploded
    // gradient terms read the projection — Spark codegen does not CSE
    // across independent expression trees, so inlining quantizeVec in
    // both places would pay the 64-element cast+round pass twice per
    // row in the dominant full-corpus scan
    val g = emb
      .select(Ivf.quantizeVec(col(vecCol)).as("qx"),
        target(col(labelCol), splitAt).as("y"))
      // residual r = margin − y·1e8: the margin target sits on the same
      // 1e8 scale as the margin itself
      .select((aggregate(zip_with(col("qx"), typedLit(w), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x) -
          col("y") * lit(Scale * Scale)).as("r"),
        col("qx"))
      // per-row gradient term q·r fits a long (≤ ~1e4·7e10); the SUM
      // accumulates in DECIMAL(38,0) so no corpus size overflows it
      // posexplode_OUTER: a null or EMPTY vector would emit zero rows
      // under plain posexplode and vanish uniformly from every
      // position — n and n_valid would agree on the silently reduced
      // corpus and training would proceed on different weights. The
      // outer form emits one pos=null row for such vectors, which the
      // null-pos check below turns into the loud refusal the contract
      // promises.
      .select(col("r"), posexplode_outer(col("qx")).as(Seq("pos", "q")))
      .groupBy("pos")
      .agg(sum((col("q") * col("r")).cast("decimal(38,0)")).as("g"),
        count(lit(1)).as("n"), count(col("r")).as("n_valid"))
      .collect()
    require(g.nonEmpty, "probe training set is empty")
    require(!g.exists(_.isNullAt(0)),
      s"corpus contains null or empty $vecCol vectors; refusing to " +
        "train on a partial corpus")
    require(g.length == dim,
      s"embedding dim ${g.length} != weight dim $dim")
    // STRICT input validation: sum() silently SKIPS null gradient
    // terms, so without these checks a corpus with mixed vector
    // dimensions, null vectors, or null labels would train on wrong
    // gradients under a nondeterministic row count. Any such row nulls
    // its residual (zip_with pads the shorter side with null; a null
    // label nulls the target), so count(r) < count(*) at every
    // position the row emits; a short vector additionally splits the
    // per-position row counts. Both fingerprints fail loudly here.
    g.foreach { row =>
      require(row.getLong(2) == row.getLong(3),
        s"pos ${row.getInt(0)}: ${row.getLong(2) - row.getLong(3)} rows " +
          s"with a null residual — vector dim != $dim, or null " +
          s"$vecCol/$labelCol values; refusing to train on a partial corpus")
    }
    val ns = g.map(_.getLong(2)).distinct
    require(ns.length == 1,
      s"per-position row counts differ (${ns.sorted.mkString(",")}) — " +
        s"corpus mixes vector dimensions; refusing to train")
    val n = ns.head
    val byPos = g.map(row =>
      row.getInt(0) -> BigInt(row.getDecimal(1).toBigInteger)).toMap
    require(byPos.size == dim,
      s"embedding dim ${byPos.size} != weight dim $dim")
    // w' = rnd(d·w − G, d), d = 2n·10⁸: lr=1/2 on the average gradient,
    // re-rounded to the 1e4 grid. rnd is round-half-away-from-zero via
    // floor division of non-negatives — engine-agnostic.
    val d = BigInt(2) * n * Scale * Scale
    (0 until dim).map { j =>
      val wp = BigInt(w(j)) * d - byPos(j)
      ((wp.abs * 2 + d) / (d * 2) * wp.signum).toLong
    }
  }

  /** Fixed-iteration training from zero weights. `iters` is small and
    * pinned (the determinism contract: no data-dependent stopping).
    */
  def trainQ(emb: DataFrame, dim: Int = 64, iters: Int = 2,
             splitAt: Int = 5, labelCol: String = "label",
             vecCol: String = "embedding"): Seq[Long] = {
    require(iters >= 1, "iters must be >= 1")
    var w: Seq[Long] = Seq.fill(dim)(0L)
    var i = 0
    while (i < iters) { w = trainStepQ(emb, w, splitAt, labelCol, vecCol); i += 1 }
    w
  }

  /** Frozen-probe scorer: (id, score_q, pred) with score_q the integer
    * margin (scale 1e8) and pred = score_q ≥ 0. ZERO-shuffle narrow
    * pass — the nightly-ingest serving shape, stream-safe (no state).
    */
  def scoreQ(df: DataFrame, w: Seq[Long], idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    // loud per-row guard: a null vector (or one whose dim differs from
    // the frozen weights — zip_with pads the shorter side with null)
    // nulled the margin, and the silent null pred dropped those rows
    // from any downstream filter(pred === 1) keep-set with no signal —
    // the same silent-partial-corpus hazard the training side's
    // n/n_valid checks refuse (code-review r14). Fused into the margin
    // expression so the path stays narrow and codegen'd.
    val m = when(
      col(vecCol).isNull || size(col(vecCol)) =!= w.length,
      raise_error(concat(
        lit(s"scoreQ: null or wrong-dimension vector (weights carry " +
          s"dim ${w.length}, row has "),
        coalesce(size(col(vecCol)).cast("string"), lit("null")),
        lit(") at "), col(idCol).cast("string"))).cast("long")
    ).otherwise(marginQ(col(vecCol), w))
    df.select(col(idCol), m.as("score_q"),
      (m >= 0).cast("int").as("pred"))
  }
}
