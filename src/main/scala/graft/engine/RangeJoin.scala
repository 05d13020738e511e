package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join without a nested loop.
  *
  * Spark's planner turns `f JOIN i ON f.t BETWEEN i.lo AND i.hi` into
  * BroadcastNestedLoopJoin — O(|facts| × |intervals|), a quadratic cliff
  * at scale even with an equi key alongside. The standard scalable
  * re-expression buckets both sides into fixed-width bins of the time
  * axis: each interval is exploded to the bins it overlaps, facts carry
  * their single bin, and the join becomes an equi-join on (key, bin)
  * whose candidate set the exact BETWEEN predicate then filters. With
  * binWidth chosen >= the typical interval length, fan-out is ~2 bins
  * per interval; the shuffle is O(facts + intervals × binsPerInterval),
  * never all-pairs.
  */
object RangeJoin {

  /** Join fact rows (instant `tCol`, keyed by `keyCol`) to interval rows
    * ([loCol, hiCol], same key): inner join, both sides' columns kept,
    * one output row per (fact, containing interval). Time columns must
    * be integral (epoch-µs or similar).
    */
  def binned(facts: DataFrame, intervals: DataFrame, keyCol: String,
             tCol: String, loCol: String, hiCol: String,
             binWidth: Long, maxBinsPerInterval: Long = 1L << 20)
      : DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive, got $maxBinsPerInterval")
    // exact floor division via decimal: double division misrounds at
    // epoch-nanos magnitudes (> 2^53), and a fact computing its bin from
    // t while the interval computes from lo must agree at boundaries
    def binOf(c: Column): Column =
      floor(c.cast("decimal(20,0)") / lit(binWidth)).cast("long")
    // reserved-name guard (the saltedJoin discipline): withColumn would
    // silently OVERWRITE a caller's __bin and the final drop would then
    // remove their column from the output entirely (code-review r14)
    require(!facts.columns.contains("__bin")
        && !intervals.columns.contains("__bin"),
      "binned range join reserves the __bin column; rename it on the inputs")
    // ...and refuse OTHER shared names at the API boundary (code-review
    // r18, the same discipline): a shared tCol/loCol/hiCol name throws
    // AMBIGUOUS_REFERENCE at the post-join filter, and any other shared
    // name yields a duplicate-column output frame that crashes on the
    // first downstream col() — only the USING key may appear on both
    val factsLower = facts.columns
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val shared = intervals.columns.filter(c =>
      !c.equalsIgnoreCase(keyCol) &&
        factsLower.contains(c.toLowerCase(java.util.Locale.ROOT)))
    require(shared.isEmpty,
      s"binned range join: columns ${shared.mkString(", ")} exist on " +
        "BOTH sides (only the key may) — rename or prune one side first")
    val f = facts.withColumn("__bin", binOf(col(tCol)))
    // per-row interval sanity fused INTO the sequence bound (a dropped
    // side-channel column would be pruned by the optimizer and never
    // evaluate): one inverted interval (hi < lo — sequence() expands it
    // as a full DESCENDING range) or one unit-mismatched row (hi in
    // nanos against a micro-sized binWidth → a trillion-element
    // sequence) otherwise aborts or OOMs the whole job on a single
    // dirty row (code-review r14). Loud and per-row, naming the bound —
    // not a silent filter that would make dirty rows vanish.
    val hiBin = when(
      col(hiCol) < col(loCol) ||
        binOf(col(hiCol)) - binOf(col(loCol)) >= maxBinsPerInterval,
      raise_error(concat(
        lit(s"range join: interval [$loCol, $hiCol] = ["), col(loCol),
        lit(", "), col(hiCol),
        lit(s"] is inverted or spans >= $maxBinsPerInterval bins of " +
          s"width $binWidth — wrong time unit, or raise " +
          "maxBinsPerInterval"))).cast("long")
    ).otherwise(binOf(col(hiCol)))
    val i = intervals.withColumn("__bin",
      explode(sequence(binOf(col(loCol)), hiBin)))
    // a fact meets an interval in exactly one bin (its own), so no
    // post-join dedupe is needed
    f.join(i, Seq(keyCol, "__bin"))
      .filter(col(tCol) >= col(loCol) && col(tCol) <= col(hiCol))
      .drop("__bin")
  }
}
