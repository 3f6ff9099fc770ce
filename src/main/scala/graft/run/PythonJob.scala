package graft.run

import graft.adapter.SparkAdapter
import graft.core.{Node, Relation}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Python model execution bridge — the engine's `submit_python_job`
  * (reference: crates/dbt-adapter/src/funcs.rs:107; dbt's python model
  * contract: the file defines `def model(dbt, session)` returning a
  * dataframe).
  *
  * Two modes, selected by `spark.graft.pythonInputMode`:
  *
  *   - `export` (default): the DEV bridge. Each ref/source input is
  *     exported as a parquet handoff, a generated wrapper script gives the
  *     model a pandas-based `dbt` shim (`dbt.ref(...)` →
  *     `pd.read_parquet`), and the returned frame lands back as parquet
  *     that the JVM side writes through the adapter's staged-swap CTAS.
  *     Honest boundary: this copies input data, which is fine for the
  *     dev-sized slices it exists for (pair with `--sample`), and wrong
  *     for 100 TB — hence:
  *   - `fqn`: the CLUSTER shape. No data moves; the configured
  *     interpreter (a user spark-submit wrapper, mirroring how
  *     submit_python_job hands the compiled source to the warehouse's
  *     python runtime) receives the model file and a manifest carrying
  *     each input's catalog FQN + storage location plus the output
  *     location, and owns the read/compute/write.
  *
  * No interpreter configured (`spark.graft.pythonInterpreter` conf or
  * `GRAFT_PYTHON` env) ⇒ the caller reports the structured
  * "no submit_python_job" error — same behavior as before this bridge.
  */
object PythonJob {

  /** Invoke the configured interpreter on one model. Returns (mode, output
    * parquet path); throws on a nonzero exit or a missing export-mode
    * output. `isIncremental` surfaces as `dbt.is_incremental` in the shim
    * (dbt's python incremental contract: the model sees the flag, the
    * engine applies the strategy to the returned frame). */
  private def invoke(spark: SparkSession, node: Node,
      inputs: Map[String, (DataFrame, String)], target: Relation,
      interpreter: String, isIncremental: Boolean): (String, Path) = {
    val mode = spark.conf.getOption("spark.graft.pythonInputMode")
      .getOrElse("export")
    val dir = Files.createTempDirectory(s"graft_py_${node.name}_")
    val outPath = dir.resolve("output.parquet")
    val manifestPath = dir.resolve("manifest.json")
    val inputEntries: Map[String, String] = mode match {
      case "fqn" => inputs.map { case (k, (_, fqn)) => k -> fqn }
      case _ => inputs.map { case (k, (df, _)) =>
        val p = dir.resolve(s"in_${k.replaceAll("[^A-Za-z0-9_]", "_")}.parquet")
        df.write.parquet(p.toString)
        k -> p.toString
      }
    }
    Files.writeString(manifestPath, graft.jinja.Json.write(Map(
      "model_path" -> node.path,
      "inputs" -> inputEntries,
      "input_mode" -> mode,
      "output" -> outPath.toString,
      "this" -> target.fqn,
      "is_incremental" -> isIncremental,
      "config" -> Map("materialized" -> node.config.materialized))))
    // export mode runs our wrapper; fqn mode hands the model file straight
    // to the interpreter (it owns the contract, e.g. a spark-submit shim)
    val script: Path = mode match {
      case "fqn" => java.nio.file.Paths.get(node.path)
      case _ =>
        val w = dir.resolve("graft_wrapper.py")
        Files.writeString(w, wrapperPy)
        w
    }
    val cmd = (interpreter.split("\\s+").toSeq :+ script.toString :+
      manifestPath.toString).asJava
    val pb = new ProcessBuilder(cmd)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val code = proc.waitFor()
    if (code != 0) throw new IllegalStateException(
      s"python model failed (exit $code): ${out.takeRight(800)}")
    if (!Files.exists(outPath) && mode != "fqn")
      throw new IllegalStateException("python model produced no output parquet")
    (mode, outPath)
  }

  /** Export-mode invocation returning the model's frame WITHOUT writing it
    * — the incremental materialization consumes this as its compiled-query
    * producer and owns the merge/append. The fqn-mode check runs BEFORE
    * the interpreter: in that mode the interpreter owns the write, so
    * spawning it first would execute the full job and then disagree with
    * the error the node reports. */
  def produce(spark: SparkSession, node: Node,
      inputs: Map[String, (DataFrame, String)], target: Relation,
      interpreter: String, isIncremental: Boolean): DataFrame = {
    if (spark.conf.getOption("spark.graft.pythonInputMode").contains("fqn"))
      throw new IllegalStateException(
        s"incremental python model ${node.name} needs export input mode — " +
          "in fqn mode the interpreter owns the write and the engine cannot " +
          "apply the incremental strategy")
    val (_, outPath) =
      invoke(spark, node, inputs, target, interpreter, isIncremental)
    spark.read.parquet(outPath.toString)
  }

  /** The generated wrapper for `export` mode: manifest-driven pandas
    * shim around the user's `model(dbt, session)`. */
  private val wrapperPy: String =
    """import json, sys, importlib.util
      |
      |manifest = json.load(open(sys.argv[1]))
      |import pandas as pd
      |
      |class _Config:
      |    def __init__(self, conf):
      |        self._conf = dict(conf)
      |    def __call__(self, **kw):          # dbt.config(materialized=...)
      |        self._conf.update(kw)
      |    def get(self, key, default=None):
      |        return self._conf.get(key, default)
      |
      |class _Dbt:
      |    def __init__(self, m):
      |        self._inputs = m["inputs"]
      |        self.config = _Config(m.get("config", {}))
      |        self.this = m.get("this", "")
      |        self.is_incremental = m.get("is_incremental", False)
      |    def ref(self, *parts):
      |        key = ".".join(parts)   # 'pkg.model' beats a bare-name collision
      |        if key in self._inputs:
      |            return pd.read_parquet(self._inputs[key])
      |        return pd.read_parquet(self._inputs[parts[-1]])
      |    def source(self, source_name, table_name):
      |        return pd.read_parquet(self._inputs[source_name + "." + table_name])
      |
      |dbt = _Dbt(manifest)
      |spec = importlib.util.spec_from_file_location("graft_py_model", manifest["model_path"])
      |mod = importlib.util.module_from_spec(spec)
      |spec.loader.exec_module(mod)
      |if not hasattr(mod, "model"):
      |    raise RuntimeError("python model must define model(dbt, session)")
      |result = mod.model(dbt, None)
      |result.to_parquet(manifest["output"], index=False)
      |""".stripMargin

  /** Run one python model node. `inputs` maps the dbt-side input key
    * (`<ref name>` or `<source>.<table>`) to (DataFrame, catalog fqn or
    * storage path). Writes the model output to `target` via the
    * adapter's staged swap on success. Table-materialized; returns the
    * success message and throws (like every materialization) on
    * interpreter failure. */
  def run(spark: SparkSession, adapter: SparkAdapter, node: Node,
      inputs: Map[String, (DataFrame, String)], target: Relation,
      interpreter: String): String = {
    val (mode, outPath) =
      invoke(spark, node, inputs, target, interpreter, isIncremental = false)
    if (mode != "fqn") {
      val result = spark.read.parquet(outPath.toString)
      adapter.writeTableAtomic(result, target,
        node.config.partitionBy, node.config.sortBy)
    }
    s"python model ok via $interpreter ($mode mode)"
  }
}
