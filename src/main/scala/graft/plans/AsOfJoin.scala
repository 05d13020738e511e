package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single right row with the greatest
  * right timestamp <= the left timestamp, per key — the canonical
  * event-to-latest-snapshot operator that plain equi-joins can't express
  * (and the reference lacks entirely, SURVEY.md §2.9).
  *
  * Implemented by COMPOSITION (preference order (a) of the custom-operator
  * ladder): tag and union both sides, then one window pass per key carries
  * the latest right payload forward onto left rows. Cost = one shuffle on
  * the key + one sort on (ts, side) — the same price as a sort-merge join,
  * with no range-explosion and no per-key driver loops, so it scales to
  * arbitrarily many keys/rows. A dedicated LogicalPlan+SparkPlan would
  * only shave the union overhead; the plan shape is already optimal.
  *
  * Ties: right rows sort BEFORE left rows at equal timestamps, so a right
  * row exactly at the left timestamp matches (>= semantics, like DuckDB's
  * ASOF JOIN). Callers should de-duplicate multiple right rows per
  * (key, ts) first if they need a deterministic payload choice.
  */
object AsOfJoin {

  /** @param left       probe side (events)
    * @param right      reference side (snapshots); its payload columns are
    *                   emitted with `rightPrefix`
    * @param leftKey    join key column in left
    * @param rightKey   join key column in right
    * @param leftTs     event-time column in left
    * @param rightTs    event-time column in right
    * @param joinType   "inner" drops left rows with no prior right row;
    *                   "left" keeps them with null payload
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               rightPrefix: String = "asof_",
               joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"asofJoin supports inner/left, got $joinType")
    val rightPayload = right.columns.filter(c => c != rightKey && c != rightTs).toSeq
    val leftCols = left.columns.toSeq

    // __m marks "a right row has been seen": carried through the same
    // window, it distinguishes no-match from a legitimately-null payload
    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__m", lit(null).cast("int"))
      .select(Seq(col("__k"), col("__ts"), col("__side"), col("__m")) ++
        leftCols.map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"$rightPrefix$c")): _*)
    val r = right
      .withColumn("__k", col(rightKey)).withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__m", lit(1))
      .select(Seq(col("__k"), col("__ts"), col("__side"), col("__m")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(c => col(c).as(s"$rightPrefix$c")): _*)

    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(Seq(col("__side"),
        last(col("__m"), ignoreNulls = true).over(w).as("__m")) ++
        leftCols.map(col) ++
        rightPayload.map(c =>
          last(col(s"$rightPrefix$c"), ignoreNulls = true).over(w)
            .as(s"$rightPrefix$c")): _*)
    val onlyLeft = carried.filter(col("__side") === 1)
    (if (joinType == "left") onlyLeft
     else onlyLeft.filter(col("__m").isNotNull))
      .drop("__side", "__m")
  }
}
