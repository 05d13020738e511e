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
  *
  * Schema note: left columns come back NULLABLE regardless of their
  * input nullability — they round-trip through the union, where the
  * right side contributes null literals. Values are never actually null
  * beyond the input's own nulls; re-assert non-null downstream if a
  * sink needs required fields (code-review r14, documented limitation
  * of the union formulation).
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
    // CASE-INSENSITIVE exclusion like the rest of the resolution here
    // (code-review r18): a case-mismatched rightKey/rightTs that the
    // join itself accepts used to leak the key/ts column into the
    // prefixed payload output
    val rightPayload = right.columns.filter(c =>
      !c.equalsIgnoreCase(rightKey) && !c.equalsIgnoreCase(rightTs)).toSeq
    val leftCols = left.columns.toSeq
    // fail at the API boundary, not as an ambiguous-column
    // AnalysisException deep inside the window plan. CASE-INSENSITIVE
    // (Spark resolution is), and __seen included — a right payload
    // column named __seen would duplicate the struct's marker field
    // and AMBIGUOUS_REFERENCE at the final getField (code-review r14).
    val reserved = Seq("__k", "__ts", "__side", "__p", "__seen")
    require(!(leftCols ++ right.columns.toSeq)
        .exists(c => reserved.contains(c.toLowerCase(java.util.Locale.ROOT))),
      s"asofJoin reserves column names ${reserved.mkString(", ")}")
    val prefixedLower = rightPayload
      .map(c => (rightPrefix + c).toLowerCase(java.util.Locale.ROOT)).toSet
    val clash = leftCols
      .filter(c => prefixedLower.contains(c.toLowerCase(java.util.Locale.ROOT)))
    require(clash.isEmpty,
      s"left columns collide with prefixed right payload: ${clash.mkString(", ")}")
    // string-vs-numeric ts or key pairs would union-widen to STRING and
    // compare LEXICOGRAPHICALLY ('99' > '100') — silently wrong matches
    // where a real join comparison would coerce both to bigint
    // (code-review r14); mismatched non-string pairs that cannot widen
    // still fail loudly in unionByName
    // CASE-INSENSITIVE field lookup like Spark's own resolution: a
    // strict StructType.apply would crash calls ("Ts" vs "ts") that the
    // join itself accepts (code-review r14, third pass)
    def fieldType(df: DataFrame, name: String,
                  side: String): org.apache.spark.sql.types.DataType =
      df.schema.fields
        .find(_.name.equalsIgnoreCase(name)).map(_.dataType)
        .getOrElse(throw new IllegalArgumentException(
          s"asofJoin: column $name not found on the $side side"))
    def noSilentWiden(a: org.apache.spark.sql.types.DataType,
                      b: org.apache.spark.sql.types.DataType,
                      what: String): Unit = {
      import org.apache.spark.sql.types._
      require((a == StringType) == (b == StringType),
        s"asofJoin $what types ${a.simpleString} vs ${b.simpleString} " +
          "would union-widen to string and compare lexicographically — " +
          "cast one side explicitly")
      // integral-vs-floating widens to DOUBLE, which is exact only to
      // 2^53 — epoch-nanos longs collapse adjacent values there, so a
      // right row 1ns in the FUTURE could round equal and match
      // "at-or-before" (code-review r18: the same misrounding class
      // RangeJoin.binOf guards with decimal division)
      def integral(t: DataType) = t match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      def floating(t: DataType) = t == FloatType || t == DoubleType
      require(!(integral(a) && floating(b)) && !(floating(a) && integral(b)),
        s"asofJoin $what types ${a.simpleString} vs ${b.simpleString} " +
          "would union-widen to double and lose integer precision past " +
          "2^53 (epoch-nanos collapse there) — cast one side explicitly")
    }
    noSilentWiden(fieldType(left, leftTs, "left"),
      fieldType(right, rightTs, "right"), "timestamp")
    noSilentWiden(fieldType(left, leftKey, "left"),
      fieldType(right, rightKey, "right"), "key")

    // NULL semantics match a real (Duck-style ASOF) join: a right row
    // with a null key or null timestamp can never match anything —
    // unfiltered, a null timestamp sorts FIRST (ascending nulls-first)
    // and would match every left row as if it were "before everything",
    // and null keys would pair with null-key left rows through
    // partitionBy's null grouping. Left rows with null key/ts simply
    // never see a prior right row: dropped under inner, null payload
    // under left — exactly join semantics.
    val rr = right.filter(col(rightKey).isNotNull && col(rightTs).isNotNull)

    // the right payload travels as ONE nullable struct (__p): carrying
    // payload columns independently (per-column last(ignoreNulls)) would
    // stitch values from DIFFERENT right rows whenever the matched row
    // holds a null in some column — the struct is all-or-nothing, so the
    // emitted payload is always one real right row. The constant __seen
    // field keeps the struct non-empty (payload-less right sides) and
    // doubles as the match marker: carried __p is null iff no prior
    // right row exists.
    val pType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__seen",
        org.apache.spark.sql.types.IntegerType, nullable = false) +:
      rightPayload.map(c => right.schema(c).copy(name = c)))
    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(Seq(col("__k"), col("__ts"), col("__side"),
        lit(null).cast(pType).as("__p")) ++ leftCols.map(col): _*)
    val r = rr
      .withColumn("__k", col(rightKey)).withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(Seq(col("__k"), col("__ts"), col("__side"),
        struct((lit(1).as("__seen") +: rightPayload.map(col)): _*)
          .cast(pType).as("__p")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(Seq(col("__side"),
        last(col("__p"), ignoreNulls = true).over(w).as("__p")) ++
        leftCols.map(col): _*)
    val onlyLeft = carried.filter(col("__side") === 1)
    (if (joinType == "left") onlyLeft
     else onlyLeft.filter(col("__p").isNotNull))
      .select(leftCols.map(col) ++
        rightPayload.map(c =>
          col("__p").getField(c).as(s"$rightPrefix$c")): _*)
  }
}
