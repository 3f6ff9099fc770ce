package graft

/** Log hygiene for the measurement mains (Bench/Verify/BenchWrite/
  * BenchGrowth): demote WindowExec's "Moving all data to a single
  * partition" warning to ERROR.
  *
  * Every remaining emitter in the engine is a rank window over rows an
  * upstream `limit(k)` already cut to k (bm25/vmr/weighted-sample/
  * gap-regularity leaderboards) — one partition of k rows is the
  * point, audited per-operator and gated by PlanCheckSpec for the real
  * scale shapes. No plan-side spelling can silence the message:
  * Spark's optimizer FOLDS a constant `partitionBy(lit(0))` away
  * before WindowExec checks for an empty partition spec (verified on
  * 4.1: the warning still fires), so the log category is the only
  * lever that keeps measurement logs clean — and real scale smells
  * visible — without changing plans.
  *
  * Library code never calls this: a user embedding the operators keeps
  * stock Spark logging. */
object LogTuning {
  def quietBenignWindowWarning(): Unit =
    Seq("org.apache.spark.sql.execution.window.WindowExec",
        "org.apache.spark.sql.execution.window.WindowExecBase")
      .foreach(n => org.apache.logging.log4j.core.config.Configurator
        .setLevel(n, org.apache.logging.log4j.Level.ERROR))
}
