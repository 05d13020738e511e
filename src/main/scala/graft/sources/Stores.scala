package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.engine.Tables

/** Pluggable table storage behind the engine's IO surface.
  *
  * The reference's entire IO layer is a MySQL database reached over
  * SQLAlchemy (/root/reference/ETL_Pipeline_Entire/data_extraction.py:119-121
  * builds the engine; front_end.py:54-65 is the connect form; every
  * bronze/silver/gold layer is a database). Here the same surface is a
  * `Store` trait with two implementations:
  *
  *   - [[ParquetStore]]: a parquet directory per layer (the default the
  *     rest of the engine and the driver testdata use).
  *   - [[JdbcStore]]: any JDBC database — the direct analogue of the
  *     reference's MySQL layers. Tested hermetically against embedded
  *     Derby (shipped with Spark), but the options are plain Spark JDBC
  *     options, so MySQL/Postgres work by changing the URL.
  *
  * Scale notes (JDBC):
  *   - Reads are partitioned when a [[JdbcPartitioning]] is given —
  *     Spark issues one bounded-range query per partition instead of a
  *     single-threaded full pull. [[JdbcStore.readPartitioned]] derives
  *     the bounds from a 1-row min/max query so callers only name the
  *     split column.
  *   - Filter pushdown: Spark's JDBC relation compiles Catalyst
  *     predicates into the WHERE clause, so the incremental-load
  *     watermark filter (Extraction.incrementalRows) executes in the
  *     database, not in Spark — only new rows cross the wire.
  *   - Writes batch `batchsize` rows per INSERT round-trip (the
  *     reference's `chunksize=1000`, data_extraction.py:51) and run one
  *     connection per partition in parallel.
  */
trait Store {

  /** S1: read one table (lazy — no IO until an action). */
  def read(spark: SparkSession, table: String): DataFrame

  /** S7/S8: write (mode = "overwrite" drop+recreate | "append"). */
  def write(df: DataFrame, table: String, mode: String = "overwrite"): Unit

  /** Does the table exist (for incremental-load's create-vs-append)? */
  def exists(spark: SparkSession, table: String): Boolean

  /** Read a table that may be absent. */
  def readIfExists(spark: SparkSession, table: String): Option[DataFrame] =
    if (exists(spark, table)) Some(read(spark, table)) else None
}

/** Existence probe through the session's HADOOP filesystem, not
  * java.io.File: reads and writes resolve paths via Hadoop, so an
  * HDFS/S3 layer dir (the cluster case) is invisible to a local-File
  * check — `exists` would be permanently false there, and
  * `Extraction.incrementalLoad` reads "absent" as create-from-scratch,
  * silently OVERWRITING the accumulated target with the current source
  * window every run (the same blip-to-data-loss class `JdbcStore
  * .exists` guards against).
  */
private object StorePath {
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}

/** The parquet-directory store the rest of the engine defaults to. */
final case class ParquetStore(dir: String) extends Store {
  override def read(spark: SparkSession, table: String): DataFrame =
    Tables.table(spark, dir, table)

  override def write(df: DataFrame, table: String, mode: String): Unit =
    Tables.write(df, dir, table, mode)

  override def exists(spark: SparkSession, table: String): Boolean =
    StorePath.exists(spark, s"$dir/$table.parquet")
}

/** CSV-directory store (`$dir/$table.csv`, header row). Reads use the
  * explicit schema from `schemas` when present — schema inference costs a
  * full extra pass over the data, which at corpus scale is a second scan
  * of everything; production tables should always be registered.
  */
final case class CsvStore(dir: String,
    schemas: Map[String, org.apache.spark.sql.types.StructType] = Map.empty)
    extends Store {
  override def read(spark: SparkSession, table: String): DataFrame = {
    // multiLine: corpus text routinely embeds newlines; the writer
    // quotes them, and a multiLine=false reader would split records at
    // every embedded newline — silent row corruption in PERMISSIVE mode
    val r = spark.read.option("header", "true").option("multiLine", "true")
    schemas.get(table) match {
      case Some(s) => r.schema(s).csv(s"$dir/$table.csv")
      case None    => r.option("inferSchema", "true").csv(s"$dir/$table.csv")
    }
  }

  override def write(df: DataFrame, table: String, mode: String): Unit =
    df.write.mode(mode).option("header", "true").csv(s"$dir/$table.csv")

  override def exists(spark: SparkSession, table: String): Boolean =
    StorePath.exists(spark, s"$dir/$table.csv")
}

/** JSON-Lines store (`$dir/$table.jsonl`) — the standard interchange
  * format for LLM training corpora (one JSON document per line, so the
  * file splits cleanly across partitions; gzip members don't, prefer
  * zstd/uncompressed for large dumps). Same schema discipline as
  * [[CsvStore]]: explicit schema skips the inference pass.
  */
final case class JsonlStore(dir: String,
    schemas: Map[String, org.apache.spark.sql.types.StructType] = Map.empty)
    extends Store {
  override def read(spark: SparkSession, table: String): DataFrame = {
    val path = s"$dir/$table.jsonl"
    schemas.get(table) match {
      case Some(s) => spark.read.schema(s).json(path)
      case None    => spark.read.json(path)
    }
  }

  override def write(df: DataFrame, table: String, mode: String): Unit =
    df.write.mode(mode).json(s"$dir/$table.jsonl")

  override def exists(spark: SparkSession, table: String): Boolean =
    StorePath.exists(spark, s"$dir/$table.jsonl")
}

/** Bounded-range read parallelism for a JDBC table: `num` concurrent
  * queries over `[lower, upper]` of integral `column`.
  */
final case class JdbcPartitioning(column: String, lower: Long, upper: Long,
                                  num: Int)

/** JDBC-backed store — the reference's MySQL layer re-expressed as Spark
  * JDBC options. `props` carries driver/user/password; `fetchSize` tunes
  * the read cursor; `batchSize` is rows per INSERT batch on write.
  */
final case class JdbcStore(
    url: String,
    props: Map[String, String] = Map.empty,
    fetchSize: Int = 10000,
    batchSize: Int = 1000,
    partitioning: Option[JdbcPartitioning] = None) extends Store {

  private def connProps: java.util.Properties = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    p.setProperty("fetchsize", fetchSize.toString)
    p
  }

  override def read(spark: SparkSession, table: String): DataFrame =
    partitioning match {
      case Some(jp) =>
        spark.read.jdbc(url, table, jp.column, jp.lower, jp.upper, jp.num,
          connProps)
      case None =>
        spark.read.jdbc(url, table, connProps)
    }

  /** Partitioned read with bounds derived from a 1-row min/max query —
    * the scale path when the caller knows the split column but not the
    * range. Falls back to a single-partition read on an empty table.
    * The column is quoted via the URL's JdbcDialect, not hard-coded
    * ANSI double quotes: MySQL (the reference's own database) parses
    * "id" as a STRING LITERAL without ANSI_QUOTES sql_mode, so MIN
    * returned the constant 'id' and the bounds read died on a
    * ClassCastException (code-review r14); the dialect emits backticks
    * for MySQL and double quotes for ANSI databases.
    */
  def readPartitioned(spark: SparkSession, table: String, column: String,
                      num: Int): DataFrame = {
    val q = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
      .quoteIdentifier(column)
    val bounds = spark.read
      .jdbc(url, s"(SELECT MIN($q) lo, MAX($q) hi FROM $table) b",
        connProps)
      .collect()(0)
    if (bounds.isNullAt(0)) read(spark, table)
    else {
      val (lo, hi) = (bounds.getAs[Number](0).longValue,
        bounds.getAs[Number](1).longValue)
      copy(partitioning = Some(JdbcPartitioning(column, lo, hi, num)))
        .read(spark, table)
    }
  }

  override def write(df: DataFrame, table: String, mode: String): Unit = {
    // explicit mapping, case-insensitive like the file stores (which
    // hand the string to Spark for validation): anything else fails
    // loudly — the old `else Overwrite` silently DROPPED the table for
    // modes like "ignore" or "error"
    val saveMode = mode.toLowerCase match {
      case "append"    => SaveMode.Append
      case "overwrite" => SaveMode.Overwrite
      case other => throw new IllegalArgumentException(
        s"JdbcStore supports append/overwrite, got $other")
    }
    df.write
      .mode(saveMode)
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, connProps)
  }

  override def exists(spark: SparkSession, table: String): Boolean = {
    // a transient connection failure must NOT read as "table absent":
    // incrementalLoad turns absent into mode=overwrite, so the old
    // catch-all converted a DB blip into dropping the accumulated
    // target. Probe CONNECTIVITY first with a raw driver connection
    // (dialect-neutral — Derby has no FROM-less SELECT) and let that
    // failure propagate; only a failed probe of the TABLE itself means
    // absent.
    //
    // DriverManager only sees drivers visible to the CALLER's
    // classloader; a driver jar shipped via --jars lives in Spark's
    // executor/session loader, so a raw getConnection on a fresh JVM
    // would throw "No suitable driver" on a healthy database. Register
    // through Spark's DriverRegistry first — it wraps drivers from
    // foreign classloaders so DriverManager accepts them.
    Option(connProps.getProperty("driver")).foreach { cls =>
      org.apache.spark.sql.execution.datasources.jdbc.DriverRegistry
        .register(cls)
    }
    // answer the absence question from CATALOG METADATA on the live
    // probe connection, not by running a query and catching everything:
    // the old shape (schema query + catch-all false) still turned any
    // post-connect transient — socket read timeout, statement cancel,
    // interrupt — into "absent" → overwrite. With getTables, a failure
    // AFTER a successful connect propagates; only a genuinely missing
    // catalog entry returns false. Databases differ in stored identifier
    // case (Derby/Oracle upper, Postgres lower), so probe the exact,
    // upper, and lower spellings.
    val conn = java.sql.DriverManager.getConnection(url, connProps)
    try {
      val meta = conn.getMetaData
      val (schemaPat, namePat) = table.lastIndexOf('.') match {
        case -1 => (null: String, table)
        case i  => (table.substring(0, i), table.substring(i + 1))
      }
      // getTables treats its schema/table args as LIKE patterns where
      // '_' and '%' are wildcards — unescaped, a dropped `my_table`
      // matches a sibling `myxtable` and exists() answers true
      // (advice r13). Escaping via getSearchStringEscape is NOT
      // portable (derby-10.16 reports "" and treats a backslash as a
      // literal name character, so an escaped pattern matches
      // nothing); instead keep the pattern as-is — wildcards only
      // OVER-match — and require an exact TABLE_NAME/TABLE_SCHEM
      // equality on the returned rows.
      def has(s: String, n: String): Boolean = {
        val rs = meta.getTables(null, s, n, null)
        try {
          var found = false
          while (!found && rs.next()) {
            // MySQL-style drivers report the schema in TABLE_CAT and
            // return null TABLE_SCHEM, so a strict TABLE_SCHEM
            // equality would read an existing schema-qualified table
            // as absent (and the incremental caller would overwrite
            // it). When TABLE_SCHEM is null, fall back to comparing
            // TABLE_CAT — an unconditional accept would let a
            // same-named table in a DIFFERENT database satisfy the
            // probe (code-review r14); only when the driver reports
            // neither does the row match on name alone — nothing left
            // to discriminate on, and accepting is the FAIL-SAFE
            // direction: a false "exists" makes the incremental caller
            // read a missing table and fail loudly, while a false
            // "absent" would full-refresh OVERWRITE an existing target.
            val ts = rs.getString("TABLE_SCHEM")
            val tc = rs.getString("TABLE_CAT")
            found = rs.getString("TABLE_NAME") == n &&
              (s == null || ts == s ||
                (ts == null && (tc == s || tc == null)))
          }
          found
        } finally rs.close()
      }
      // catalog-term drivers (MySQL Connector/J): databases are
      // CATALOGS, so getTables(null, "warehouse", ...) never applies
      // the qualifier and — with nullCatalogMeansCurrent — searches
      // only the connection's current db, reading an existing
      // warehouse.gold_daily as ABSENT, the exact false-absent →
      // overwrite loss this method defends against (code-review r14).
      // Probe the qualifier as the CATALOG argument too.
      def hasCat(c: String, n: String): Boolean = {
        val rs = meta.getTables(c, null, n, null)
        try {
          var found = false
          while (!found && rs.next()) {
            val tc = rs.getString("TABLE_CAT")
            found = rs.getString("TABLE_NAME") == n &&
              (tc == c || tc == null)
          }
          found
        } finally rs.close()
      }
      def up(s: String) =
        if (s == null) null else s.toUpperCase(java.util.Locale.ROOT)
      def low(s: String) =
        if (s == null) null else s.toLowerCase(java.util.Locale.ROOT)
      has(schemaPat, namePat) || has(up(schemaPat), up(namePat)) ||
        has(low(schemaPat), low(namePat)) ||
        (schemaPat != null &&
          (hasCat(schemaPat, namePat) || hasCat(up(schemaPat), up(namePat)) ||
            hasCat(low(schemaPat), low(namePat))))
    } finally conn.close()
  }
}
