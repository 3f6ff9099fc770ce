package graft.adapter

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Driver-side result-table algebra — the Spark-native equivalent of the
  * reference's agate wrapper over an Arrow RecordBatch
  * (crates/dbt-agate/src/table.rs:377-384, method surface :878-1042).
  *
  * These are always *small* driver-side tables (query-status results, seeds
  * metadata, `run_query` outputs feeding Jinja control flow) — never
  * distributed data, so a local Vector[Seq[Any]] is the right shape.
  */
final case class AgateTable(
    columnNames: Vector[String],
    columnTypes: Vector[String],
    rows: Vector[Vector[Any]]) {

  def numRows: Int = rows.length
  def numColumns: Int = columnNames.length

  private def colIdx(name: String): Int = {
    val i = columnNames.indexOf(name)
    require(i >= 0, s"no such column: $name (have ${columnNames.mkString(",")})")
    i
  }

  /** Column projection (table.rs:940). */
  def select(names: Seq[String]): AgateTable = {
    val idx = names.map(colIdx)
    AgateTable(
      idx.map(columnNames).toVector,
      idx.map(columnTypes).toVector,
      rows.map(r => idx.map(r).toVector))
  }

  /** Column rename (table.rs:989). */
  def rename(mapping: Map[String, String]): AgateTable =
    copy(columnNames = columnNames.map(n => mapping.getOrElse(n, n)))

  /** Distinct values of a column (table.rs:174). */
  def columnDistinct(name: String): Vector[Any] =
    rows.map(_(colIdx(name))).distinct

  /** Sorted values of a column (table.rs:183). */
  def columnSorted(name: String): Vector[Any] =
    rows.map(_(colIdx(name))).sortBy(v => Option(v).map(_.toString).getOrElse(""))

  /** Rows with nulls in the given column dropped (table.rs:192). */
  def withoutNulls(name: String): AgateTable = {
    val i = colIdx(name)
    copy(rows = rows.filter(r => r(i) != null))
  }

  /** Group into sub-tables by column value (table.rs:1042 → TableSet). */
  def groupBy(name: String): Map[Any, AgateTable] = {
    val i = colIdx(name)
    rows.groupBy(_(i)).map { case (k, rs) => k -> copy(rows = rs) }
  }

  def cell(row: Int, col: String): Any = rows(row)(colIdx(col))

  /** Rows as name→value maps (vec_of_rows.rs view). */
  def dictRows: Vector[Map[String, Any]] =
    rows.map(r => columnNames.zip(r).toMap)

  def printTable(maxRows: Int = 20): String = {
    val shown = rows.take(maxRows)
    val widths = columnNames.indices.map { i =>
      (columnNames(i).length +: shown.map(r => String.valueOf(r(i)).length)).max
    }
    def fmt(vals: Seq[String]) =
      vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString("| ", " | ", " |")
    (fmt(columnNames) +:
      fmt(widths.map("-" * _)) +:
      shown.map(r => fmt(r.map(String.valueOf(_))))).mkString("\n")
  }
}

object AgateTable {
  val empty: AgateTable = AgateTable(Vector.empty, Vector.empty, Vector.empty)

  /** Collect a (small!) DataFrame into a driver-side table. Callers cap the
    * row count; this is for statuses and metadata, not data movement. */
  def fromDataFrame(df: DataFrame, maxRows: Int = 10000): AgateTable = {
    val schema: StructType = df.schema
    val rows = df.limit(maxRows).collect()
    AgateTable(
      schema.fields.map(_.name).toVector,
      schema.fields.map(_.dataType.sql).toVector,
      rows.map(r => r.toSeq.toVector).toVector)
  }

  def fromRows(rows: Seq[Map[String, Any]]): AgateTable =
    if (rows.isEmpty) empty
    else {
      val names = rows.head.keys.toVector
      AgateTable(names, names.map(_ => "STRING"),
        rows.map(r => names.map(n => r.getOrElse(n, null))).toVector)
    }
}
