package graft.core

/** Relation type, mirroring the reference's `RelationType`
  * (reference: crates/dbt-schemas/src/schemas/relations/base.rs:112-672). */
sealed trait RelationType { def name: String }
object RelationType {
  case object Table extends RelationType { val name = "table" }
  case object View extends RelationType { val name = "view" }
  case object Cte extends RelationType { val name = "cte" }
  case object MaterializedView extends RelationType { val name = "materialized_view" }
  case object External extends RelationType { val name = "external" }

  def parse(s: String): RelationType = s match {
    case "table" => Table
    case "view" => View
    case "cte" => Cte
    case "materialized_view" => MaterializedView
    case _ => External
  }
}

/** A database.schema.identifier triple with Spark (backtick) quoting.
  *
  * The reference models this as the `BaseRelation` trait
  * (crates/dbt-schemas/src/schemas/relations/base.rs:112); here a plain
  * case class suffices — Spark has a single catalog namespace and backtick
  * quoting rules.
  */
final case class Relation(
    database: Option[String],
    schema: String,
    identifier: String,
    relType: RelationType = RelationType.Table) {

  def isTable: Boolean = relType == RelationType.Table
  def isView: Boolean = relType == RelationType.View
  def isCte: Boolean = relType == RelationType.Cte

  private def quote(part: String): String =
    if (part.matches("[A-Za-z_][A-Za-z0-9_]*")) part
    else "`" + part.replace("`", "``") + "`"

  /** Fully-qualified, Spark-quoted name used in rendered SQL. */
  def fqn: String =
    (database.toSeq :+ schema :+ identifier).map(quote).mkString(".")

  /** Stable key for caches/artifacts. */
  def key: String = (database.toSeq :+ schema :+ identifier).mkString(".")

  def withIdentifier(id: String): Relation = copy(identifier = id)
  def withType(t: RelationType): Relation = copy(relType = t)

  /** Staged-swap helpers mirroring make_intermediate/backup_relation
    * (reference: dbt-adapters/macros/relations/create_intermediate.sql). */
  def intermediate: Relation = withIdentifier(identifier + "__dbt_tmp")
  def backup: Relation = withIdentifier(identifier + "__dbt_backup")

  override def toString: String = fqn
}

object Relation {
  def apply(schema: String, identifier: String): Relation =
    Relation(None, schema, identifier)
}
