package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A1–A6: the reference's aggregation surface
  * (/root/reference/ETL_Pipeline_Entire/transformations_code.py:168-184,
  * front_end.py:471-497, 798-818; data_extraction.py:90-92).
  *
  * Scale notes: every aggregate here is a hash aggregate with map-side
  * partial aggregation — Spark combines per-partition before the single
  * shuffle on the group keys, so reduce-side traffic is O(groups), not
  * O(rows). The histogram is two scalar-agg passes (no wide shuffle at all).
  * Skewed group keys are handled by AQE's skew handling; nothing collects
  * rows to the driver.
  */
object Aggregations {

  /** Group-by + per-column function list, reference UI vocabulary
    * (front_end.py:471-473): sum, mean, min, max, count.
    */
  case class AggSpec(groupBy: Seq[String], aggCols: Seq[String],
                     funcs: Seq[String] = Seq("sum"))

  /** pandas agg-name → Spark function. `mean` ≡ SQL AVG (null-skipping);
    * `count` counts non-null values of the column (pandas count), i.e.
    * Spark count(col) not count(*).
    */
  private def fn(name: String): Column => Column = name match {
    case "sum"   => sum
    case "mean"  => avg
    case "min"   => min
    case "max"   => max
    case "count" => count
    case other => throw new IllegalArgumentException(
      s"unsupported agg function: $other (reference supports sum/mean/min/max/count)")
  }

  /** A1 multi-function hash aggregate with the reference's flattened
    * "{col}_{func}" output naming and group keys restored as columns
    * (transformations_code.py:177-181). Returns None when any referenced
    * column is missing — the A3 skip-not-fail eligibility guard
    * (transformations_code.py:175).
    *
    * Pandas parity: groupby drops null group keys → pre-filter them out
    * (SURVEY.md §7.5.3).
    */
  def aggregate(df: DataFrame, spec: AggSpec): Option[DataFrame] = {
    val have = df.columns.toSet
    if (!(spec.groupBy ++ spec.aggCols).forall(have)) return None
    // a malformed spec with no group keys, no agg columns or no
    // functions is SKIPPED like a missing column (A3), not a failure:
    // the reference guard is `if groupby_cols and agg_cols and
    // agg_funcs` (scheduler.py:157), so an empty groupBy never emits a
    // 1-row global aggregate there and must not here either
    if (spec.groupBy.isEmpty || spec.aggCols.isEmpty || spec.funcs.isEmpty)
      return None
    val exprs = spec.aggCols.flatMap(c =>
      spec.funcs.map(f => fn(f)(col(c)).as(s"${c}_$f")))
    val cleaned = df.na.drop(spec.groupBy)
    Some(cleaned.groupBy(spec.groupBy.map(col): _*)
      .agg(exprs.head, exprs.tail: _*))
  }

  /** A4 pie-chart aggregate: groupby(category)[value].sum()
    * (front_end.py:818).
    */
  def pie(df: DataFrame, category: String, value: String): DataFrame =
    df.na.drop(Seq(category)).groupBy(col(category))
      .agg(sum(col(value)).as(s"${value}_sum"))

  /** A5 histogram (front_end.py:798-806): N equal-width buckets over
    * [min, max] of a numeric column, count per bucket, ordered by bucket.
    *
    * Pandas `value_counts(bins=N)` parity (code-review r14): intervals
    * are RIGHT-closed — an interior boundary value lands in the LOWER
    * bucket (bucket = ceil((x-min)·N/(max-min)) − 1, with x == min
    * clamped into bucket 0 the way pandas' include_lowest admits the
    * left edge) — and ALL N buckets are emitted, zero counts included
    * (pd.cut is categorical; empty intervals still render as bars).
    * The old floor rule sent boundaries UP and groupBy silently omitted
    * empty buckets, so a UI bar chart of skewed data drew a different
    * shape with missing bars versus the reference. lo/hi stay the exact
    * arithmetic edges (pandas displays a first edge nudged down 0.1% of
    * range — a display artifact, not a binning difference, since
    * include_lowest puts x == min in bucket 0 either way).
    *
    * Two-pass: one scalar agg for (min, max), then a per-row bucket
    * projection + hash aggregate, left-joined onto the N-row bucket
    * spine; a constant column (max == min) puts everything in bucket 0.
    * Output: (bucket, lo, hi, cnt) ordered by bucket — the frame the UI
    * renders.
    */
  def histogram(df: DataFrame, column: String, bins: Int = 20): DataFrame = {
    // bins = 0 divided by zero into an Infinity width and a single
    // bucket=-1 garbage row; negative bins produced NaN bounds
    require(bins > 0, s"bins must be positive, got $bins")
    // NaN is dropped like the reference's dropna(): Spark's max() would
    // return NaN (NaN sorts above every double) and poison width + every
    // bucket expression, collapsing the whole histogram
    val clean = df.filter(col(column).isNotNull &&
      !isnan(col(column).cast("double")))
    val row = clean.agg(min(col(column)).cast("double").as("mn"),
                     max(col(column)).cast("double").as("mx")).collect()(0)
    if (row.isNullAt(0))  // all-null or empty input
      return df.sparkSession.emptyDataFrame
        .selectExpr("CAST(0 AS INT) bucket", "CAST(0.0 AS DOUBLE) lo",
                    "CAST(0.0 AS DOUBLE) hi", "CAST(0 AS BIGINT) cnt")
        .limit(0)
    val (mn, mx) = (row.getDouble(0), row.getDouble(1))
    val width = (mx - mn) / bins
    // right-closed: ceil sends an interior boundary DOWN; greatest(.,1)
    // admits x == min into bucket 0 (include_lowest); least(., bins)
    // guards the one-ulp case where (mx-mn)·N/(mx-mn) rounds past N
    val bucket =
      if (mx == mn) lit(0)
      else (least(greatest(ceil((col(column).cast("double") - lit(mn)) *
                bins / lit(mx - mn)), lit(1L)), lit(bins.toLong)) - 1)
        .cast("int")
    val counts = clean
      .select(bucket.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
    // N-row bucket spine so EMPTY buckets still emit (pandas parity)
    df.sparkSession.range(bins)
      .select(col("id").cast("int").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
              (lit(mn) + col("bucket") * lit(width)).as("lo"),
              (lit(mn) + (col("bucket") + 1) * lit(width)).as("hi"),
              coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy("bucket")
  }

  /** A6 watermark aggregate: scalar MAX of the table's first column
    * (data_extraction.py:90-92; ordinal-0 watermark assumption, SURVEY.md
    * §7.5.4).
    */
  def watermark(df: DataFrame): DataFrame = {
    val first = df.columns.head
    df.agg(max(col(first)).as(s"max_$first"))
  }
}
