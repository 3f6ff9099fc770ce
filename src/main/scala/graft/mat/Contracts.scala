package graft.mat

import graft.core.Node
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.types.DataType

/** Model contracts: when `contract: enforced`, the compiled query's schema
  * must match the declared columns (name, type, order-insensitive) BEFORE
  * anything is written (reference: DbtContract
  * crates/dbt-schemas/src/schemas/common.rs:531; column spec DDL
  * MA/relations/column/columns_spec_ddl.sql; dbt's
  * assert_columns_equivalent behavior). Only analysis runs here — no job
  * is launched; Catalyst resolves the plan and yields the output schema.
  */
object Contracts {

  final case class Violation(column: String, expected: String, actual: String,
      reason: String) {
    override def toString = f"$column%-24s $expected%-18s $actual%-18s $reason"
  }

  /** Normalize a declared type string through Spark's parser so
    * `bigint` == `BIGINT` == `long`. Unparseable strings compare raw. */
  private def normalize(dt: String): String =
    try CatalystSqlParser.parseDataType(dt).sql.toLowerCase
    catch { case _: Exception => dt.trim.toLowerCase }

  private def sparkTypeSql(dt: DataType): String = dt.sql.toLowerCase

  /** Throws with a dbt-style diff table when the contract is violated. */
  def enforce(spark: SparkSession, node: Node, compiledSql: String): Unit = {
    val declared = node.config.contractColumns
    if (declared.isEmpty)
      throw new IllegalStateException(
        s"${node.uniqueId}: contract is enforced but no columns with " +
          "data_type are declared in the model's yml")
    val actual = spark.sql(compiledSql).schema
    val actualByName = actual.fields.map(f => f.name.toLowerCase -> f).toMap
    val declaredNames = declared.map(_._1.toLowerCase).toSet

    val violations = Seq.newBuilder[Violation]
    declared.foreach { case (name, dt) =>
      actualByName.get(name.toLowerCase) match {
        case None =>
          violations += Violation(name, normalize(dt), "-", "missing in definition")
        case Some(f) if sparkTypeSql(f.dataType) != normalize(dt) =>
          violations += Violation(name, normalize(dt), sparkTypeSql(f.dataType),
            "data type mismatch")
        case _ =>
      }
    }
    actual.fields.filterNot(f => declaredNames(f.name.toLowerCase)).foreach { f =>
      violations += Violation(f.name, "-", sparkTypeSql(f.dataType),
        "missing in contract")
    }

    val vs = violations.result()
    if (vs.nonEmpty)
      throw new IllegalStateException(
        s"${node.uniqueId}: this model has an enforced contract that failed\n" +
          f"${"column_name"}%-24s ${"contract_type"}%-18s ${"definition_type"}%-18s reason\n" +
          vs.mkString("\n"))
  }
}
