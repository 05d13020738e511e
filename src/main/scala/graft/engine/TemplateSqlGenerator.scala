package graft.engine

import graft.engine.Sql.SqlGenerator

/** Deterministic template-based NL→SQL generator — the headless stand-in
  * for the reference's local T5 model (text_to_sql.py:95-148). The
  * generation contract is identical (schema text + question in, SQL string
  * out, consumed through Sql.extractSelect → Sql.runSql), so swapping a
  * real model back in is a one-line change at the call site.
  *
  * Covered question shapes = the reference's own example set
  * (text_to_sql.py:178-182, front_end.py:716-724): top-N by measure,
  * filter by id, group-by totals, per-group counts, plain row counts.
  * Column/table names are resolved against the rendered schema with
  * SchemaMatch so questions may use approximate names.
  */
class TemplateSqlGenerator(tables: Map[String, Seq[String]])
    extends SqlGenerator {

  private def resolveTable(word: String): Option[String] =
    SchemaMatch.findSimilarColumn(word, tables.keys.toSeq, 0.6)

  private def resolveColumn(word: String, table: String): Option[String] =
    SchemaMatch.findSimilarColumn(word, tables(table), 0.5)

  private val topN =
    """(?i)top\s+(\d+)\s+(\w+)\s+by\s+(\w+)""".r.unanchored
  private val totalBy =
    """(?i)total\s+(\w+)\s+by\s+(\w+)\s+(?:in|from)\s+(\w+)""".r.unanchored
  private val countBy =
    """(?i)(?:number|count)\s+of\s+(\w+)\s+by\s+(\w+)""".r.unanchored
  private val countAll =
    """(?i)how\s+many\s+(\w+)""".r.unanchored
  private val countFiltered =
    """(?i)how\s+many\s+(\w+)\s+with\s+(\w+)\s*=\s*(\w+)""".r.unanchored
  private val byId =
    """(?i)(\w+)\s+with\s+(\w+)\s*=\s*(\w+)""".r.unanchored

  def generate(question: String, schema: String): String = question match {
    case topN(n, tableW, colW) =>
      (for { t <- resolveTable(tableW); c <- resolveColumn(colW, t) }
        yield s"SELECT * FROM $t ORDER BY $c DESC LIMIT $n;").getOrElse(fail(question))
    case totalBy(valW, keyW, tableW) =>
      (for { t <- resolveTable(tableW); v <- resolveColumn(valW, t)
             k <- resolveColumn(keyW, t) }
        yield s"SELECT $k, sum($v) AS total_$v FROM $t GROUP BY $k;").getOrElse(fail(question))
    case countBy(tableW, keyW) =>
      (for { t <- resolveTable(tableW); k <- resolveColumn(keyW, t) }
        yield s"SELECT $k, count(*) AS n FROM $t GROUP BY $k;").getOrElse(fail(question))
    // countFiltered FIRST: "how many orders with status = 5" asks for a
    // FILTERED count — byId alone returned full rows (right rows, wrong
    // shape) and a bare countAll would count ALL orders (numerically
    // wrong, the worse failure — code-review r14, both passes). Both
    // narrower templates still fire on their own shapes below.
    case countFiltered(tableW, colW, v) =>
      val lit = if (v.forall(_.isDigit)) v else s"'$v'"
      (for { t <- resolveTable(tableW); c <- resolveColumn(colW, t) }
        yield s"SELECT count(*) AS n FROM $t WHERE $c = $lit;")
        .getOrElse(fail(question))
    case countAll(tableW) =>
      resolveTable(tableW)
        .map(t => s"SELECT count(*) AS n FROM $t;").getOrElse(fail(question))
    case byId(tableW, colW, v) =>
      // quote non-numeric values: interpolated bare, "with nation =
      // brazil" would parse brazil as a COLUMN and fail resolution
      // instead of filtering (the \w+ capture admits alphabetics)
      val lit = if (v.forall(_.isDigit)) v else s"'$v'"
      (for { t <- resolveTable(tableW); c <- resolveColumn(colW, t) }
        yield s"SELECT * FROM $t WHERE $c = $lit;").getOrElse(fail(question))
    case _ => fail(question)
  }

  /** Unrecognized questions yield a comment-only string, which
    * Sql.extractSelect maps to None — the same failure surface as a model
    * emitting garbage. The raw question rides in the comment for
    * diagnosability; extractSelect ignores comment lines, so a question
    * containing the word "select" cannot turn the sentinel itself into
    * runnable garbage SQL (the r13 ModelSqlGenerator bug class,
    * re-found here by code-review r14).
    */
  private def fail(q: String): String =
    s"-- no template matched: ${q.replaceAll("[\\r\\n]+", " ")}"
}

object TemplateSqlGenerator {
  /** Build from live DataFrames (column lists via schema). */
  def fromTables(tables: Map[String, org.apache.spark.sql.DataFrame]): TemplateSqlGenerator =
    new TemplateSqlGenerator(tables.map { case (n, df) => n -> df.columns.toSeq })
}
