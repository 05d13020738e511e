package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: pre-shuffle fact tables by join key at WRITE
  * time so repeated joins/aggregations on that key run with NO exchange —
  * the co-located-join primitive for 100 TB star schemas where the same
  * fact⋈fact join runs in every pipeline (bucketing pays one shuffle at
  * ingest instead of one per query).
  *
  * Bucketed tables live in the session catalog/warehouse (Spark bucketing
  * metadata is table-level, not plain-directory parquet).
  */
object Bucketing {

  /** Write a table bucketed (and sorted) by `key` into the catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed catalog tables on their bucket keys. With
    * matching bucket counts Catalyst plans a sort-merge join with ZERO
    * Exchange operators on either side. Same-named keys — the common
    * case of two facts bucketed on the same column — join USING the
    * key, so the output carries ONE copy; the condition form would
    * keep both and every downstream `col(k1)` would throw
    * AMBIGUOUS_REFERENCE (code-review r14, the `SkewJoin.saltedJoin`
    * hazard).
    */
  def joinBucketed(spark: SparkSession, t1: String, k1: String,
                   t2: String, k2: String): DataFrame = {
    val a = spark.table(t1)
    val b = spark.table(t2)
    // Same-key detection FOLLOWS the session's resolution mode (advice
    // r18): under the default case-insensitive resolution "ID" vs "id"
    // IS the same key — the condition branch would keep both copies and
    // recreate the ambiguous-reference hazard the USING form exists to
    // avoid (code-review r14/r18) — but under spark.sql.caseSensitive=
    // true they are genuinely distinct columns and collapsing them into
    // a USING join on k1 mis-resolves the right side.
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    val sameKey = if (caseSensitive) k1 == k2 else k1.equalsIgnoreCase(k2)
    if (sameKey) a.join(b, Seq(k1))
    else a.join(b, a(k1) === b(k2))
  }

  /** True when the executed plan contains no shuffle exchange — the
    * property bucketing buys. Exposed for tests/monitoring.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !hasShuffle(df.queryExecution.executedPlan)

  /** Plan-tree walk for any shuffle exchange — hash, range,
    * SinglePartition, AND RoundRobinPartitioning (`repartition(n)`),
    * which the old string match missed (advice r13). A
    * BroadcastExchange is not a shuffle and must not fail the check.
    * Recurses through the AQE wrapper and query-stage/reused-exchange
    * leaf nodes, which hide their inner plans from a plain `collect`.
    */
  private def hasShuffle(
      p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
    case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
      true
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      hasShuffle(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      hasShuffle(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      hasShuffle(r.child)
    case other => other.children.exists(hasShuffle) ||
      other.subqueries.exists(hasShuffle)
  }

  /** Bucket-once / join-many: the content-keyed catalog table for a
    * frame (the [[graft.northstar.Artifacts]] train-once discipline
    * applied to physical layout). The table name folds a digest of
    * `contentKey` + bucket spec, so:
    *   - repeat calls in one session reuse the already-written table —
    *     the ingest shuffle is paid ONCE, every subsequent fact⋈fact
    *     join on `key` plans with zero Exchange on that edge;
    *   - regenerated source data (new contentKey) lands in a NEW table
    *     instead of silently serving stale buckets.
    *
    * The table name also folds the JVM's runtime name: the in-memory
    * catalog is per-JVM (a second process always sees tableExists ==
    * false), so without it two processes sharing a warehouse dir (Bench
    * and Verify in parallel) would both rm + saveAsTable the SAME
    * location concurrently — `this.synchronized` only serializes one
    * JVM. Per-process names make the write single-writer by
    * construction; a leftover directory from a recycled pid is still
    * cleared before rewriting. Production deployments replace this
    * whole discipline with a real shared metastore (the table then
    * survives across sessions and is written once cluster-wide) and
    * apply retention to superseded content keys.
    */
  def bucketedTableFor(df: DataFrame, baseName: String, contentKey: String,
                       key: String, buckets: Int): DataFrame = {
    val spark = df.sparkSession
    // length-prefixed fields (code-review r18): a bare '|' join let
    // ("v2|x", "k") and ("v2", "x|k") digest identically — and content
    // keys are commonly delimiter-joined composites — silently serving
    // a table bucketed on the wrong key or built from other content
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${contentKey.length}:$contentKey|${key.length}:$key|$buckets"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    val jvmTag = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getName.replaceAll("[^A-Za-z0-9]", "")
      .toLowerCase(java.util.Locale.ROOT)
    val name = s"graft_b_${baseName}_${digest}_$jvmTag"
    this.synchronized {
      if (!spark.catalog.tableExists(name)) {
        // leftover-location cleanup through the HADOOP filesystem, at
        // the CURRENT database's managed path: the old java.io.File
        // delete silently no-oped on an hdfs://S3 warehouse (and on any
        // non-default database, whose tables live under <wh>/<db>.db/),
        // so a recycled jvmTag hit 'location already exists' — the
        // exact failure the delete exists to prevent (code-review r14;
        // the resetLayers/Stores FS class)
        val wh = spark.conf.get("spark.sql.warehouse.dir")
        val db = spark.catalog.currentDatabase
        val dir = if (db == "default") s"$wh/${name.toLowerCase(java.util.Locale.ROOT)}"
                  else s"$wh/$db.db/${name.toLowerCase(java.util.Locale.ROOT)}"
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p))
          require(fs.delete(p, true),
            s"bucketedTableFor: could not clear leftover location $dir")
        writeBucketed(df, name, key, buckets)
      }
    }
    spark.table(name)
  }
}
