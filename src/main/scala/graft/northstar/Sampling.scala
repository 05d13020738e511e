package graft.northstar

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data mixtures (BASELINE.json
  * north-star; SURVEY.md §7.4): which documents enter an epoch's mix, at
  * what rate per stratum (language, source, quality band), decided by
  * pure id arithmetic — no RNG state. The same call on any cluster size,
  * partitioning, or retry selects the same rows (unlike
  * `DataFrame.sample`, whose per-partition seeds shift with the split
  * layout), and the selection predicate is plain SQL any engine can
  * audit or replay.
  */
object Sampling {

  /** Knuth multiplicative hash constant (2^32 / golden ratio; also
    * xxHash32 PRIME32_1) — first-round multiplier.
    */
  val Knuth = 2654435761L

  /** xxHash32 PRIME32_2 — second-round multiplier, coprime to both
    * [[Knuth]] and [[MixMod]].
    */
  val Mix2 = 2246822519L

  /** Mixing modulus: the Mersenne prime 2^31 - 1. Large enough that
    * whole-corpus id ranges (billions of documents) occupy distinct
    * residues, small enough that every intermediate product stays under
    * 2^63: (MixMod-1) * max(Knuth, Mix2) ≈ 5.7e18 < 9.2e18, so the
    * arithmetic is overflow-exact in Spark ANSI mode AND in any int64
    * SQL engine replaying the oracle.
    */
  val MixMod = 2147483647L

  /** Pseudo-uniform unit value in [0,1) from a non-negative integer id.
    * Not cryptographic — just well-spread for consecutive ids. Two
    * multiplicative rounds over Z_{2^31-1}: each round is a bijection on
    * residues (MixMod is prime and divides neither constant), so the
    * unit is EXACTLY uniform over the 2^31 - 1 buckets — keep fractions
    * are exact to ~4.7e-10 — and only ids congruent mod 2^31 - 1 ever
    * share a fate (the r7 single-round form folded ids mod 1e6 first,
    * which correlated every sampling decision across ids 1e6 apart).
    * The id is reduced mod MixMod BEFORE the first multiply: `id *
    * Knuth` raw would overflow Long past ids of ~3.4e9, which a 100 TB
    * corpus exceeds.
    *
    * MIGRATION (r8): the two-round mix reassigned every hash-derived
    * decision — train/val/test splits, stratified/temperature samples,
    * epoch shuffles — relative to the pre-r8 single-round form. Any
    * split or sample PERSISTED by an earlier build must be regenerated
    * wholesale, never mixed with newly computed assignments: an old
    * persisted train split joined with a new val split would overlap
    * (eval leakage by construction). See CHANGELOG.md.
    */
  def hashUnit(id: Column): Column = {
    // Two input fixes (code-review r13), both invisible to the pinned
    // non-negative-numeric-id oracles:
    //   - non-numeric ids (URL/UUID corpus keys): a lossy cast yielded
    //     null, and `filter(null < rate)` silently dropped 100% of the
    //     corpus from every Bernoulli sampler — hash such ids through
    //     xxhash64 instead. Genuinely null ids still yield a null unit
    //     (assignSplit surfaces them as a null split; pre-clean ids
    //     before Bernoulli sampling).
    //   - negative ids: sign-preserving % gave a unit in (-1, 0), so
    //     samplers kept such rows UNCONDITIONALLY and assignSplit
    //     routed them all into the first split — reduce with pmod, the
    //     same fix epochShuffle already carries.
    // try_cast, not cast: under ANSI a non-numeric string would THROW
    // here rather than return null for the coalesce to catch
    val base = coalesce(id.try_cast("long"), when(id.isNotNull, xxhash64(id)))
    pmod(pmod(pmod(base, lit(MixMod)) * Knuth, lit(MixMod)) * Mix2,
      lit(MixMod)) / lit(MixMod.toDouble)
  }

  /** Deterministic train/val/test (or any named) split assignment: the
    * hash-unit value falls into cumulative weight bands. Every row gets
    * exactly one split; the same id lands in the same split on any
    * cluster, partitioning, or rerun — the property that keeps eval
    * sets stable across pipeline runs. Weights are taken as given
    * (normalize to 1 for exact fractions). Narrow projection, no
    * shuffle.
    */
  def assignSplit(df: DataFrame, weights: Seq[(String, Double)],
                  idCol: String = "doc_id",
                  outCol: String = "split"): DataFrame = {
    require(weights.nonEmpty, "at least one split required")
    // degenerate weights refused at the boundary (the temperatureRates/
    // mixturePlan discipline): an all-zero vector made every cumulative
    // band 0.0 and silently routed 100% of the corpus into the LAST
    // split; a negative weight produces non-monotonic bands that starve
    // a split (code-review r14)
    require(weights.forall(_._2 >= 0) && weights.map(_._2).sum > 0,
      s"need non-negative split weights with a sum > 0, got " +
        weights.map { case (n, w) => s"$n=$w" }.mkString(", "))
    val total = weights.map(_._2).sum
    val u = hashUnit(col(idCol)) * total
    val cum = weights.scanLeft(0.0)(_ + _._2).tail
    val assigned = weights.init.zip(cum.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), hi)) =>
        Some(acc.fold(when(u < hi, name))(_.when(u < hi, name)))
      }
      .fold(lit(weights.last._1): Column)(_.otherwise(weights.last._1))
    // an id that hashes to null (null id, or a non-numeric string id
    // under a lossy cast) must NOT silently land in the last split —
    // every when() is null there, and the otherwise() fallback would
    // route 100% of such rows into one split with no signal. A null
    // split is visible downstream instead.
    df.withColumn(outCol,
      when(u.isNull, lit(null).cast("string")).otherwise(assigned))
  }

  /** Bernoulli sample at per-stratum rates: keep a row iff
    * hashUnit(id) < rate(stratum). Rates are monotone — raising a
    * stratum's rate only ADDS rows, never swaps them — so mixture
    * re-weighting between epochs reuses the cached subsets. Narrow
    * projection + filter: no shuffle, no sort, scale-free.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       idCol: String = "doc_id"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hashUnit(col(idCol)) < rate)
  }

  /** Temperature-based stratum rebalancing (the multilingual-mixture
    * downsampling of XLM/mT5-style pipelines): with target distribution
    * p_s ∝ count_s^alpha, the per-row keep rate that realizes it by
    * Bernoulli thinning is rate_s ∝ count_s^(alpha-1), normalized so the
    * SMALLEST stratum keeps everything (thinning can only remove rows) —
    * i.e. rate_s = (count_min / count_s)^(1-alpha). alpha = 1 reproduces
    * the natural distribution (no thinning); alpha → 0 approaches a
    * uniform mix. The whole decision is derived from the data in ONE
    * plan: stratum counts (tiny: one row per stratum) are aggregated,
    * broadcast back, and the keep predicate is the same deterministic
    * [[hashUnit]] arithmetic as [[stratifiedSample]] — reproducible on
    * any cluster size and replayable as plain SQL.
    *
    * alpha = 0.5 is the cross-engine-exact setting: the rate is then
    * `sqrt(cmin/c)`, and IEEE 754 requires sqrt (unlike pow) to be
    * correctly rounded, so Spark and any ANSI oracle compute the
    * bit-identical threshold. Other alphas go through `pow` (documented
    * 1-ulp wobble — fine for production, not for hash-compare oracles).
    */
  def temperatureSample(df: DataFrame, stratumCol: String,
                        alpha: Double = 0.5,
                        idCol: String = "doc_id"): DataFrame =
    df.join(broadcast(temperatureRates(df, stratumCol, alpha)), stratumCol)
      .filter(hashUnit(col(idCol)) < col("__rate"))
      .select(df.columns.map(col): _*)

  /** The per-stratum keep rates [[temperatureSample]] derives, as a tiny
    * (stratumCol, __rate) frame — one row per stratum, broadcastable.
    * Factored out so composed pipelines (Curation.funnel's single-pass
    * stage flags) share the EXACT rate arithmetic with the sampler.
    */
  def temperatureRates(df: DataFrame, stratumCol: String,
                       alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1] required, got $alpha")
    import org.apache.spark.sql.expressions.Window
    // null strata are EXCLUDED from the distribution: groupBy would
    // give them their own (typically tiny) group, and a 10-row
    // null-lang group setting cmin would poison every real stratum's
    // rate by orders of magnitude. Null-stratum rows also get no rate
    // row, so temperatureSample's inner join drops them — sample over
    // the labeled distribution only (route unlabeled rows through
    // stratifiedSample's defaultRate if they should be kept).
    val counts = df.filter(col(stratumCol).isNotNull)
      .groupBy(stratumCol).agg(count(lit(1)).as("__c"))
    // cmin as a whole-frame window over the counts, NOT a second
    // aggregate branch: an agg + crossJoin would expand the `df`
    // subtree twice, doubling the upstream corpus scans everywhere the
    // rates ride as a broadcast side (Curation run/funnel). The window
    // input is one row per stratum — single-partition is safe at any
    // corpus size.
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ratio = min(col("__c")).over(wAll).cast("double") /
      col("__c").cast("double")
    val rateExpr =
      if (alpha == 0.5) sqrt(ratio) else pow(ratio, lit(1.0 - alpha))
    counts.select(col(stratumCol), rateExpr.as("__rate"))
  }

  /** Quantile-floor curation: drop every row whose `valueCol` is <= the
    * corpus `num/den`-quantile of that column — e.g. num=1, den=10 drops
    * (at least) the shortest decile of documents by token count, the
    * classic length-floor rule. The threshold is the k-th smallest value
    * (k = ceil(n * num/den)) derived ENTIRELY in integer arithmetic, so
    * any SQL engine replays the identical cut: no percentile-interpolation
    * or disc-boundary convention to disagree on, and ties at the
    * threshold are all dropped (order-independent).
    *
    * Scale shape: the quantile comes from a histogram over DISTINCT
    * values (one shuffle to value-domain size), then a cumulative window
    * over that tiny frame — never a global sort or top-k over rows. Token
    * counts / char lengths / integer scores have domains of ~1e5 distinct
    * values at any corpus size, so the window input stays KB-sized at
    * 100 TB. (For unbounded continuous domains, bucket first or use
    * approx_percentile.) The 1-row threshold is broadcast back.
    */
  def quantileFloor(df: DataFrame, valueCol: String,
                    num: Long = 1, den: Long = 10): DataFrame =
    df.crossJoin(broadcast(quantileThresholdFrame(df, valueCol, num, den)))
      .filter(col(valueCol) > col("__thr"))
      .select(df.columns.map(col): _*)

  /** The [[quantileFloor]] cut as a 1-row frame (`__thr` = the k-th
    * smallest value, k = ceil(n*num/den)) — also the freezable artifact
    * for serving the same cut statelessly (Curation.freeze).
    */
  def quantileThresholdFrame(df: DataFrame, valueCol: String,
                             num: Long, den: Long): DataFrame = {
    require(num > 0 && den > 0 && num <= den, s"need 0 < $num/$den <= 1")
    import org.apache.spark.sql.expressions.Window
    // the quantile is over NON-NULL values: nulls sort first in the
    // cumulative window, so an unfiltered null histogram row would
    // absorb the low quantiles (a 20%-null column makes the 1/10 floor
    // drop nothing) while never being an emittable cut itself
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(valueCol).agg(count(lit(1)).as("__c"))
    val wCum = Window.orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // smallest v with cum(v) >= k  ⟺  den*cum >= num*n  (integer-exact)
    hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .filter(col("__cum") * den >= col("__n") * num)
      .agg(min(col(valueCol)).as("__thr"))
  }

  /** Mixture planning: given target per-source SHARES (integer
    * proportions, e.g. web 5 : wiki 3 : books 2) and an epoch token
    * budget, derive per source the token target, the Bernoulli
    * admission rate that realizes it, the expected admitted tokens, and
    * the deficit where the corpus cannot supply its share — the
    * "can we hit this mix?" planning row a training run signs off on
    * before sampling. EVERY derived number is integer arithmetic
    * (`div`, e6-scaled rates), so the plan replays exactly in any SQL
    * engine; feed `rate_e6 / 1e6` per source to [[stratifiedSample]]
    * to execute it. Declared sources absent from the corpus surface as
    * full-deficit rows (n_tokens 0) — the under-supply alarm. Shape:
    * one per-source aggregate + a shares-literal left join; budgets up
    * to ~9e12 tokens stay overflow-exact (budget × 1e6 < 2^63).
    */
  def mixturePlan(df: DataFrame, shares: Map[String, Long],
                  budgetTokens: Long, sourceCol: String = "source",
                  textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive, got $budgetTokens")
    // the e6-scaled rate arithmetic needs target_tokens * 1e6 < 2^63;
    // enforcing the documented bound here turns a silently-wrapped
    // (or ANSI-thrown) negative rate into a clear error at the API
    require(budgetTokens <= 9000000000000L,
      s"budgetTokens > 9e12 overflows the e6 rate arithmetic, got $budgetTokens")
    require(shares.nonEmpty && shares.values.forall(_ >= 0)
      && shares.values.sum > 0, s"need non-negative shares with a sum > 0")
    // the budget bound alone doesn't prevent share * budgetTokens from
    // wrapping int64 (code-review r14): a raw-count share (5e9 docs) at
    // a 9e12 budget is 4.5e22 — silently negative targets in non-ANSI,
    // a mid-job throw under ANSI. Shares are WEIGHTS; normalize large
    // ones before calling.
    require(shares.values.max <= Long.MaxValue / budgetTokens,
      s"share ${shares.values.max} * budget $budgetTokens overflows " +
        "int64 — pass normalized shares (ratios, not raw counts)")
    val spark = df.sparkSession
    import spark.implicits._
    val totalShares = shares.values.sum
    val sharesDf = shares.toSeq.toDF(sourceCol, "share")
    val stats = df.groupBy(sourceCol).agg(
      count(lit(1)).as("n_docs"),
      sum(TextAnalysis.tokenCount(col(textCol)).cast("long")).as("n_tokens"))
    sharesDf.join(stats, Seq(sourceCol), "left")
      .select(col(sourceCol),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("share"),
        expr(s"share * $budgetTokens div $totalShares").as("target_tokens"))
      .withColumn("rate_e6", when(col("n_tokens") > 0,
          least(lit(1000000L), expr("target_tokens * 1000000 div n_tokens")))
        .otherwise(lit(0L)))
      .withColumn("expected_tokens", expr("n_tokens * rate_e6 div 1000000"))
      .withColumn("deficit_tokens",
        greatest(lit(0L), col("target_tokens") - col("expected_tokens")))
  }

  /** ALL nBuckets-1 quantile cuts of `valueCol` from ONE value-histogram
    * pass, as a single broadcastable row holding the sorted cut array —
    * the statistic side for quantile BUCKETING (perplexity head/middle/
    * tail bands, length deciles) where [[quantileThresholdFrame]] yields
    * one cut. Computing each cut as its own aggregate branch would
    * expand the input subtree B-1 times (B-1 corpus scans); here the
    * cumulative histogram emits, per distinct value, exactly the k's
    * for which that value is the cut: cut_k = min{v : B*cum(v) >= k*n},
    * so row v covers k in ((B*cumPrev) div n, (B*cum) div n]. All
    * integer arithmetic (`div`), replayable as plain SQL; a value that
    * spans multiple quantile bands appears multiple times, so bucket =
    * count(cuts < x) correctly skips the swallowed bands. The collect
    * side is B-1 values — broadcastable at any corpus size.
    */
  def quantileCuts(df: DataFrame, valueCol: String,
                   nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"need nBuckets >= 2, got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // non-null values only (see quantileThresholdFrame): an unfiltered
    // null row claims low k's whose __cut collect_list then SKIPS
    // (null element), silently shortening the cuts array and shifting
    // every downstream band by one
    df.filter(col(valueCol).isNotNull)
      .groupBy(valueCol).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__hi",
        least(lit(nBuckets - 1L), expr(s"__cum * $nBuckets div __n")))
      .withColumn("__lo",
        greatest(lit(1L), expr(s"(__cum - __c) * $nBuckets div __n + 1")))
      .filter(col("__hi") >= col("__lo"))
      // cuts keep the value column's NATIVE type (the
      // quantileThresholdFrame convention): a cast("long") here would
      // silently truncate fractional cuts for double-typed value columns
      .select(explode(sequence(col("__lo"), col("__hi"))).as("__k"),
        col(valueCol).as("__cut"))
      .agg(sort_array(collect_list(col("__cut"))).as("__cuts"))
  }

  /** Deterministic epoch-order shuffle for training-data serving: every
    * row gets a (bucket, pos) coordinate — a seeded pseudo-random
    * permutation split into `nBuckets` independent shards. bucket =
    * mixed hash mod nBuckets; pos = rank of the mixed hash within the
    * bucket (ties broken by id). Reading shards in bucket order, each
    * sorted by pos, replays the exact same global order on any cluster
    * size or retry; a different `seed` yields a different permutation
    * per epoch. The seed is mixed ADDITIVELY before the two-round
    * multiplicative mix (same [[hashUnit]] arithmetic, kept as an
    * integer), which stays a bijection on residues mod 2^31 - 1, so the
    * sort key takes ~2.1e9 distinct values and no two ids collide more
    * under one seed than another.
    *
    * Scale shape: the only wide op is one window partitioned by bucket —
    * nBuckets-way parallel, never a global sort. Size nBuckets to the
    * target shard count (e.g. 10k at 100 TB) so each bucket's sort fits
    * an executor.
    */
  def epochShuffle(df: DataFrame, nBuckets: Int, seed: Long = 0L,
                   idCol: String = "doc_id"): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    import org.apache.spark.sql.expressions.Window
    // pmod, not %: Spark % keeps the dividend's sign, so a negative
    // seed (or negative id) would emit negative __h and bucket ids
    // outside the promised [0, nBuckets) — a partitionBy("bucket")
    // writer would land rows in shards no reader enumerates. Identical
    // to % for the non-negative inputs every existing oracle uses.
    // The id basis carries the SAME non-numeric fix as [[hashUnit]]
    // (code-review r14 — only the pmod half had been carried): a lossy
    // cast on UUID/URL ids yielded null for every row, landing the
    // whole corpus in one null "bucket" outside [0, nBuckets). The
    // xxhash64 fallback is pre-reduced into [0, MixMod) so adding the
    // seed cannot overflow; the numeric branch is untouched — the
    // pinned seed=7 oracle values are unchanged.
    val base = coalesce(col(idCol).try_cast("long"),
      when(col(idCol).isNotNull, pmod(xxhash64(col(idCol)), lit(MixMod))))
    val h = pmod(pmod(pmod(base + lit(seed),
      lit(MixMod)) * Knuth, lit(MixMod)) * Mix2, lit(MixMod))
    val withKey = df.withColumn("__h", h)
      .withColumn("bucket", pmod(col("__h"), lit(nBuckets)).cast("long"))
    val w = Window.partitionBy("bucket").orderBy(col("__h"), col(idCol))
    withKey.withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }
}
