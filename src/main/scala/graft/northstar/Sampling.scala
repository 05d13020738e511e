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

  /** Knuth multiplicative hash constant (2^32 / golden ratio). */
  val Knuth = 2654435761L

  /** Hash-unit denominator: 1e6 buckets ≈ 6 decimal digits of rate
    * resolution.
    */
  val Buckets = 1000000L

  /** Pseudo-uniform unit value in [0,1) from a non-negative integer id.
    * Not cryptographic — just well-spread for consecutive ids. The id is
    * reduced mod Buckets BEFORE the multiply: `id * Knuth` raw would
    * overflow Long (ANSI error) past ids of ~3.4e9, which a 100 TB
    * corpus exceeds; since gcd(Knuth, Buckets) = 1 the multiply is a
    * bijection on residues, so the reduced form keeps the spread and
    * stays exact for ANY id.
    */
  def hashUnit(id: Column): Column =
    id.cast("long") % Buckets * Knuth % Buckets / lit(Buckets.toDouble)

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
    val total = weights.map(_._2).sum
    val u = hashUnit(col(idCol)) * total
    val cum = weights.scanLeft(0.0)(_ + _._2).tail
    val assigned = weights.init.zip(cum.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), hi)) =>
        Some(acc.fold(when(u < hi, name))(_.when(u < hi, name)))
      }
      .fold(lit(weights.last._1): Column)(_.otherwise(weights.last._1))
    df.withColumn(outCol, assigned)
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
}
