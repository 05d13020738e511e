package graft.engine

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration: AQE on
  * (skew-join handling + runtime coalescing), shuffle parallelism sized to
  * the machine instead of the 200 default, UTC session time for stable
  * date semantics, and ns-parquet tolerance. On a real cluster the same
  * settings apply with shufflePartitions sized to total cores (or left to
  * AQE's coalescing with a high initial value).
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registry.registerAll(spark)
    spark
  }
}
