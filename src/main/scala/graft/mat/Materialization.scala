package graft.mat

import graft.adapter.SparkAdapter
import graft.core._
import org.apache.spark.sql.DataFrame

/** Result of materializing one node (reference: RunResultOutput,
  * crates/dbt-schemas/src/schemas/run_results.rs:124). */
final case class MatResult(
    relation: Relation,
    status: String, // success | error | skipped | pass | warn | fail
    message: String = "",
    rowsAffected: Long = -1L)

/** One materialization strategy — the Spark-native equivalent of a dbt
  * materialization macro program (reference registry:
  * crates/dbt-schemas/src/materialization_resolver.rs:11-21). The engine
  * resolves `config.materialized` to one of these and invokes it with the
  * compiled relation input. */
trait Materialization {
  def name: String
  def run(ctx: MatContext): MatResult
}

/** Everything a materialization needs: the adapter, the target relation,
  * the compiled model as a DataFrame thunk (lazy so is_incremental-style
  * double rendering can re-evaluate), and run flags. */
final case class MatContext(
    adapter: SparkAdapter,
    node: Node,
    target: Relation,
    compiled: () => DataFrame,
    fullRefresh: Boolean = false,
    /** Injected "now" so snapshot/freshness runs are deterministic in
      * tests; production passes the wall clock. */
    now: java.sql.Timestamp = new java.sql.Timestamp(System.currentTimeMillis()),
    /** Microbatch scan pruning: compiles the model with the batch window
      * [start, end) pushed into every event_time-declaring upstream ref
      * (dbt's microbatch input filter, model_config.rs:209-210) so each
      * batch's source scans prune instead of re-reading the full input.
      * None → the runner filters the compiled output only. */
    compiledBatch: Option[(java.sql.Timestamp, java.sql.Timestamp) => DataFrame] = None,
    /** --event-time-start was given: the [begin, now) window is an
      * explicit backfill to reprocess EXACTLY (dbt's semantics for a
      * named window) — window runners must not resume from the target's
      * max event_time. */
    explicitBackfill: Boolean = false,
    /** --empty: the compiled input is schema-only. Trainer artifacts
      * built under it are DEGENERATE (empty LM counts, quantiles,
      * centroids) — they get marked so a later REAL run fails loudly
      * instead of silently scoring under them. Dedup index state built
      * empty stays legal (an empty corpus has settled nothing). */
    emptyMode: Boolean = false,
    /** Render a project macro `name(arg_dict)` with the run context —
      * custom incremental strategies dispatch through this
      * (base_adapter.rs:339 get_incremental_strategy_macro). */
    macroRenderer: Option[(String, Map[String, Any]) => String] = None) {
  def spark = adapter.spark
  def config: NodeConfig = node.config
}

object Materializations {
  /** Most-specific-wins resolution, like the reference's
    * materialization_resolver.rs:96-120 (we have one adapter, so the table
    * is flat). */
  def resolve(name: String): Materialization = name match {
    case "view" => ViewMat
    case "table" => TableMat
    case "materialized_view" => MaterializedViewMat
    case "incremental" => IncrementalMat
    case "snapshot" => SnapshotMat
    case "seed" => SeedMat
    case "ephemeral" => EphemeralMat
    case "clone" => CloneMat
    case "pipeline" => PipelineMat
    case "streaming_table" => StreamingTableMat
    case other => throw new IllegalArgumentException(
      s"unknown materialization: $other")
  }
}

/** CREATE OR REPLACE VIEW of the compiled SQL
  * (reference: MA/materializations/models/view.sql:1-72). The compiled SQL
  * text is carried on the node; views need the text, not a DataFrame. */
object ViewMat extends Materialization {
  val name = "view"
  def run(ctx: MatContext): MatResult = {
    ctx.adapter.createView(ctx.target.withType(RelationType.View), ctx.node.rawSql)
    MatResult(ctx.target.withType(RelationType.View), "success")
  }
}

/** CTAS via the intermediate/backup/rename swap
  * (reference: MA/materializations/models/table.sql:1-64; Spark override
  * MS/materializations/table.sql). `partition_by` maps to
  * df.write.partitionBy — at 100 TB the partition spec is the difference
  * between full scans and partition-pruned reads downstream. */
object TableMat extends Materialization {
  val name = "table"
  def run(ctx: MatContext): MatResult = {
    ctx.adapter.writeTableAtomic(ctx.compiled(), ctx.target,
      ctx.config.partitionBy, ctx.config.sortBy,
      ctx.config.clusteredBy, ctx.config.buckets, ctx.config.zorderBy,
      ctx.config.layoutCurve, ctx.config.fileFormat)
    applyTblProperties(ctx)
    MatResult(ctx.target, "success")
  }

  /** dbt-spark `tblproperties:` — applied AFTER the swap so the live
    * table (not a doomed intermediate) carries them. Single quotes in
    * keys/values escape; shared by table and pipeline models. */
  private[mat] def applyTblProperties(ctx: MatContext): Unit =
    if (ctx.config.tblProperties.nonEmpty) {
      def esc(s: String) = s.replace("'", "''")
      val kvs = ctx.config.tblProperties.toSeq.sortBy(_._1)
        .map { case (k, v) => s"'${esc(k)}' = '${esc(v)}'" }
        .mkString(", ")
      ctx.adapter.execute(
        s"ALTER TABLE ${ctx.target.fqn} SET TBLPROPERTIES ($kvs)")
      ()
    }
}

/** No Spark MV: emulated as a table plus a recorded build recipe. The
  * reference's scenario ladder (MA/materializations/models/
  * materialized_view.sql:56-123 materialized_view_get_build_sql) is
  * preserved: create when absent, replace on --full-refresh, plain data
  * refresh when the recorded configuration matches, and the
  * on_configuration_change modes (apply / continue / fail) when it
  * doesn't. The recorded configuration rides on the table as a
  * TBLPROPERTY; "refresh" re-runs the CTAS (our refresh recipe), which at
  * 100 TB is exactly what a non-incremental MV refresh costs anyway. */
object MaterializedViewMat extends Materialization {
  val name = "materialized_view"
  private val PropKey = "graft.mv.config"

  /** The configuration whose drift triggers on_configuration_change: the
    * storage-shape config Spark honors (partitioning). */
  private def fingerprint(ctx: MatContext): String =
    ctx.config.partitionBy.mkString(",")

  private def recordedConfig(ctx: MatContext): Option[String] =
    scala.util.Try {
      ctx.spark.sql(
        s"SHOW TBLPROPERTIES ${ctx.target.fqn} ('$PropKey')")
        .collect().headOption.map(_.getString(1))
        .filterNot(_.contains("does not have property"))
    }.toOption.flatten

  private def build(ctx: MatContext): Unit = {
    ctx.adapter.writeTableAtomic(ctx.compiled(), ctx.target,
      ctx.config.partitionBy, ctx.config.sortBy)
    ctx.adapter.execute(
      s"ALTER TABLE ${ctx.target.fqn} SET TBLPROPERTIES ('$PropKey' = '${fingerprint(ctx)}')",
      fetch = false)
  }

  def run(ctx: MatContext): MatResult = {
    val exists = ctx.adapter.relationExists(ctx.target)
    if (!exists) {
      build(ctx)
      MatResult(ctx.target, "success", "materialized_view created")
    } else if (ctx.fullRefresh) {
      build(ctx)
      MatResult(ctx.target, "success", "materialized_view replaced (--full-refresh)")
    } else if (recordedConfig(ctx).forall(_ == fingerprint(ctx))) {
      // no configuration drift → data refresh only
      build(ctx)
      MatResult(ctx.target, "success", "materialized_view refreshed")
    } else ctx.config.extra.get("on_configuration_change")
      .map(graft.project.Yaml.str).getOrElse("apply") match {
      case "apply" =>
        build(ctx)
        MatResult(ctx.target, "success", "configuration changes applied")
      case "continue" =>
        System.err.println(s"[warn] Configuration changes were identified and " +
          s"`on_configuration_change` was set to `continue` for `${ctx.target.fqn}`")
        MatResult(ctx.target, "success", "configuration changes skipped (continue)")
      case "fail" =>
        MatResult(ctx.target, "error", "Configuration changes were identified and " +
          s"`on_configuration_change` was set to `fail` for `${ctx.target.fqn}`")
      case other =>
        MatResult(ctx.target, "error", s"unknown on_configuration_change: $other")
    }
  }
}

/** Ephemeral: no DDL — the model is inlined as a CTE into consumers at
  * compile time (reference: DbtMaterialization::Ephemeral common.rs:226).
  * Running one directly is a no-op. */
object EphemeralMat extends Materialization {
  val name = "ephemeral"
  def run(ctx: MatContext): MatResult =
    MatResult(ctx.target.withType(RelationType.Cte), "success", "ephemeral: inlined as CTE")
}

/** clone: zero-copy `SHALLOW CLONE` when the source is a Delta table
  * (MA/materializations/models/clone/clone.sql can_clone_table branch);
  * on plain parquet fall back to the reference's view-of-target path
  * (clone.sql:50-60 "create_or_replace_view relation as select * from
  * defer_relation"). */
object CloneMat extends Materialization {
  val name = "clone"
  def run(ctx: MatContext): MatResult = {
    val src = ctx.node.relation.getOrElse(
      throw new IllegalArgumentException("clone requires a source relation"))
    if (graft.adapter.DeltaSupport.shallowClone(ctx.adapter.spark, src, ctx.target))
      return MatResult(ctx.target, "success",
        s"cloned ${src.fqn} via SHALLOW CLONE (zero-copy)")
    ctx.adapter.createView(ctx.target.withType(RelationType.View),
      s"SELECT * FROM ${src.fqn}")
    MatResult(ctx.target.withType(RelationType.View), "success",
      s"cloned ${src.fqn} as view (no zero-copy on parquet)")
  }
}
