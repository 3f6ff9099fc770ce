package graft

import graft.project.ProjectLoader
import graft.run.Runner
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** Python model execution bridge (reference: crates/dbt-adapter/src/funcs.rs:107
  * submit_python_job). The image carries no python, so the interpreter is a
  * stub shell script — exactly the seam submit_python_job exposes: the engine
  * hands (script, manifest) to a configured runtime and consumes the output
  * location. The stub verifies the contract from the outside.
  */
class PythonJobSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def write(dir: Path, rel: String, content: String): Path = {
    val p = dir.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
    p
  }

  private def pyProject(name: String): Path = {
    val proj = Files.createTempDirectory(s"graft_${name}")
    write(proj, "dbt_project.yml",
      s"""name: $name
         |model-paths: ["models"]
         |""".stripMargin)
    write(proj, "models/base.sql", "select 1 as id union all select 2 as id")
    write(proj, "models/enriched.py",
      """def model(dbt, session):
        |    df = dbt.ref('base')
        |    df["doubled"] = df["id"] * 2
        |    return df
        |""".stripMargin)
    proj
  }

  test("python model nodes join the DAG with refs/sources harvested from source") {
    val proj = pyProject("pydag")
    write(proj, "models/sources.yml",
      """sources:
        |  - name: raw
        |    schema: g_pydag_src
        |    tables:
        |      - name: events
        |""".stripMargin)
    write(proj, "models/multi.py",
      """def model(dbt, session):
        |    a = dbt.ref('base')
        |    b = dbt.source('raw', 'events')
        |    c = dbt.ref('pydag', 'base')   # two-arg package-qualified form
        |    return a
        |""".stripMargin)
    val r = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = "g_pydag",
      warehouseLocation = Some(Files.createTempDirectory("g_pydag_wh").toString))
    val node = r.resolved.nodes("model.pydag.multi")
    assert(node.config.extra.get("language").contains("python"))
    assert(node.dependsOn.contains("model.pydag.base"), node.dependsOn)
    assert(node.dependsOn.contains("source.raw.events"), node.dependsOn)
    // the one- and two-arg refs to the same model dedupe to one edge
    assert(node.dependsOn.count(_ == "model.pydag.base") == 1, node.dependsOn)
    assert(node.parseError.isEmpty)
  }

  test("python models take YAML configs: tags, schema, alias; view rejected") {
    val proj = Files.createTempDirectory("graft_pycfg")
    write(proj, "dbt_project.yml",
      """name: pycfg
        |model-paths: ["models"]
        |models:
        |  pycfg:
        |    +tags: ["nightly"]
        |""".stripMargin)
    write(proj, "models/base.sql", "select 1 as id")
    write(proj, "models/enriched.py",
      """def model(dbt, session):
        |    return dbt.ref('base')
        |""".stripMargin)
    write(proj, "models/schema.yml",
      """models:
        |  - name: enriched
        |    config:
        |      alias: enriched_tbl
        |      schema: g_pycfg_alt
        |""".stripMargin)
    val r = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = "g_pycfg",
      warehouseLocation = Some(Files.createTempDirectory("g_pycfg_wh").toString))
    val node = r.resolved.nodes("model.pycfg.enriched")
    assert(node.config.tags == Seq("nightly"), node.config.tags)
    assert(node.relation.map(r => (r.schema, r.identifier))
      .contains(("g_pycfg_alt", "enriched_tbl")), node.relation)
    // materialized: view is impossible for python — loud resolve error
    val bad = Files.createTempDirectory("graft_pybadmat")
    write(bad, "dbt_project.yml", "name: pybadmat\nmodel-paths: [\"models\"]\n")
    write(bad, "models/v.py", "def model(dbt, session):\n    return None\n")
    write(bad, "models/schema.yml",
      """models:
        |  - name: v
        |    config: {materialized: view}
        |""".stripMargin)
    val e = intercept[Exception] {
      new Runner(spark, ProjectLoader.load(bad.toString),
        targetSchema = "g_pybadmat").resolved
    }
    assert(e.getMessage.contains("not supported"), e.getMessage)
  }

  test("incremental python models merge through the engine's strategy") {
    val proj = Files.createTempDirectory("graft_pyincr")
    write(proj, "dbt_project.yml", "name: pyincr\nmodel-paths: [\"models\"]\n")
    write(proj, "models/events.py",
      """def model(dbt, session):
        |    return None  # replaced by the stub; contract is the manifest
        |""".stripMargin)
    write(proj, "models/schema.yml",
      """models:
        |  - name: events
        |    config:
        |      materialized: incremental
        |      incremental_strategy: merge
        |      unique_key: id
        |""".stripMargin)
    val work = Files.createTempDirectory("graft_pyincrstub")
    import spark.implicits._
    val first = work.resolve("first").toString
    val second = work.resolve("second").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1).write.parquet(first)
    Seq((2L, "B"), (3L, "c")).toDF("id", "v").coalesce(1).write.parquet(second)
    val marker = work.resolve("ran_once")
    // run 1 delivers `first`; later runs deliver `second`, and the stub
    // records the manifest's is_incremental flag per run
    val flags = work.resolve("flags.txt")
    val stub = write(work, "stub.sh",
      s"""#!/bin/bash
         |set -e
         |out=$$(sed -n 's/.*"output": "\\([^"]*\\)".*/\\1/p' "$$2")
         |grep -o '"is_incremental": [a-z]*' "$$2" >> $flags
         |if [ -f $marker ]; then cp -r $second "$$out"
         |else cp -r $first "$$out"; touch $marker; fi
         |""".stripMargin)
    val schema = "g_pyincr"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    spark.conf.set("spark.graft.pythonInterpreter", s"bash $stub")
    try {
      def runOnce() = new Runner(spark, ProjectLoader.load(proj.toString),
        targetSchema = schema,
        warehouseLocation = Some(Files.createTempDirectory("g_pyincr_wh").toString))
        .run()
      val r1 = runOnce().find(_.uniqueId == "model.pyincr.events").get
      assert(r1.status == "success", r1.message)
      assert(spark.table(s"$schema.events").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq(1L -> "a", 2L -> "b"))
      val r2 = runOnce().find(_.uniqueId == "model.pyincr.events").get
      assert(r2.status == "success", r2.message)
      // merge on unique_key: 2 updated in place, 3 appended, 1 untouched
      assert(spark.table(s"$schema.events").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq(1L -> "a", 2L -> "B", 3L -> "c"))
      // the shim saw is_incremental=false then true
      assert(Files.readString(flags).trim.linesIterator.toSeq ==
        Seq("\"is_incremental\": false", "\"is_incremental\": true"))
    } finally spark.conf.unset("spark.graft.pythonInterpreter")
  }

  test("compile writes python models as .py without Jinja-rendering f-strings") {
    val proj = pyProject("pycompile")
    // f-string braces would blow up a Jinja render; compile must not try
    write(proj, "models/braces.py",
      """def model(dbt, session):
        |    df = dbt.ref('base')
        |    df["label"] = f"{{'k': 1}}"
        |    return df
        |""".stripMargin)
    val rc = graft.cli.Main.run(spark, graft.cli.Main.parseArgs(
      Array("compile", "--project-dir", proj.toString)))
    assert(rc == 0)
    val compiled = proj.resolve("target/compiled")
    assert(Files.exists(compiled.resolve("braces.py")))
    assert(Files.exists(compiled.resolve("enriched.py")))
    assert(Files.exists(compiled.resolve("base.sql")))
    assert(!Files.exists(compiled.resolve("braces.sql")))
    assert(Files.readString(compiled.resolve("braces.py")).contains("f\"{{'k': 1}}\""))
  }

  test("pre/post hooks and grants run for python models") {
    val proj = pyProject("pyhooks")
    write(proj, "models/schema.yml",
      """models:
        |  - name: enriched
        |    config:
        |      pre_hook: "create table g_pyhooks.pre_marker as select 1 as x"
        |      post_hook: "create table g_pyhooks.post_marker as select 2 as x"
        |""".stripMargin)
    val work = Files.createTempDirectory("graft_pyhookstub")
    import spark.implicits._
    val premade = work.resolve("premade").toString
    Seq((1L, 2L)).toDF("id", "doubled").coalesce(1).write.parquet(premade)
    val stub = write(work, "stub.sh",
      s"""#!/bin/bash
         |set -e
         |out=$$(sed -n 's/.*"output": "\\([^"]*\\)".*/\\1/p' "$$2")
         |cp -r $premade "$$out"
         |""".stripMargin)
    val schema = "g_pyhooks"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    spark.conf.set("spark.graft.pythonInterpreter", s"bash $stub")
    try {
      val r = new Runner(spark, ProjectLoader.load(proj.toString),
        targetSchema = schema,
        warehouseLocation = Some(Files.createTempDirectory("g_pyhooks_wh").toString))
      val results = r.run()
      val py = results.find(_.uniqueId == "model.pyhooks.enriched").get
      assert(py.status == "success", py.message)
      assert(spark.table(s"$schema.pre_marker").count() == 1)
      assert(spark.table(s"$schema.post_marker").count() == 1)
    } finally spark.conf.unset("spark.graft.pythonInterpreter")
  }

  test("no interpreter configured => structured submit_python_job error") {
    val proj = pyProject("pynointerp")
    spark.conf.unset("spark.graft.pythonInterpreter")
    val schema = "g_pynointerp"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val r = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema,
      warehouseLocation = Some(Files.createTempDirectory("g_pynointerp_wh").toString))
    val results = r.run()
    val py = results.find(_.uniqueId == "model.pynointerp.enriched").get
    assert(py.status == "error", py.message)
    assert(py.message.contains("no submit_python_job"), py.message)
    // the SQL parent still built — a broken python leaf doesn't poison the DAG
    assert(results.find(_.uniqueId == "model.pynointerp.base").get.status == "success")
  }

  test("export mode: inputs exported as parquet, output lands via staged swap") {
    val proj = pyProject("pyexport")
    val work = Files.createTempDirectory("graft_pystub")
    // what the "python" run produces — pre-written by spark, copied into
    // place by the stub (no python in this image)
    import spark.implicits._
    val premade = work.resolve("premade").toString
    Seq((1L, 2L), (2L, 4L)).toDF("id", "doubled")
      .coalesce(1).write.parquet(premade)
    val capture = work.resolve("manifest_capture.json")
    // stub interpreter: args are (wrapper.py, manifest.json) — extract the
    // output path from the manifest, deliver the premade parquet there
    val stub = write(work, "stub.sh",
      s"""#!/bin/bash
         |set -e
         |out=$$(sed -n 's/.*"output": "\\([^"]*\\)".*/\\1/p' "$$2")
         |cp -r $premade "$$out"
         |cp "$$2" $capture
         |""".stripMargin)
    val schema = "g_pyexport"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    spark.conf.set("spark.graft.pythonInterpreter", s"bash $stub")
    try {
      val r = new Runner(spark, ProjectLoader.load(proj.toString),
        targetSchema = schema,
        warehouseLocation = Some(Files.createTempDirectory("g_pyexport_wh").toString))
      val results = r.run()
      val py = results.find(_.uniqueId == "model.pyexport.enriched").get
      assert(py.status == "success", py.message)
      // output table exists with the stub's rows
      val out = spark.table(s"$schema.enriched")
      assert(out.count() == 2)
      assert(out.columns.toSet == Set("id", "doubled"))
      // the manifest carried an exported-parquet input for the ref
      val manifest = Files.readString(capture)
      assert(manifest.contains("\"base\""), manifest)
      val inPath = raw""""base": "([^"]+)"""".r
        .findFirstMatchIn(manifest).map(_.group(1))
      assert(inPath.isDefined, manifest)
      assert(Files.exists(Path.of(inPath.get)), s"input parquet gone: $inPath")
      assert(spark.read.parquet(inPath.get).count() == 2)
    } finally spark.conf.unset("spark.graft.pythonInterpreter")
  }

  test("fqn mode: no data movement — manifest carries catalog FQNs only") {
    val proj = pyProject("pyfqn")
    val work = Files.createTempDirectory("graft_pyfqnstub")
    val capture = work.resolve("capture.txt")
    val stub = write(work, "stub.sh",
      s"""#!/bin/bash
         |echo "script=$$1" > $capture
         |cat "$$2" >> $capture
         |""".stripMargin)
    val schema = "g_pyfqn"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    spark.conf.set("spark.graft.pythonInterpreter", s"bash $stub")
    spark.conf.set("spark.graft.pythonInputMode", "fqn")
    try {
      val r = new Runner(spark, ProjectLoader.load(proj.toString),
        targetSchema = schema,
        warehouseLocation = Some(Files.createTempDirectory("g_pyfqn_wh").toString))
      val results = r.run()
      val py = results.find(_.uniqueId == "model.pyfqn.enriched").get
      assert(py.status == "success", py.message)
      val cap = Files.readString(capture)
      // the interpreter received the MODEL file itself (it owns the contract)
      assert(cap.contains("script=") && cap.contains("enriched.py"), cap)
      // input is the catalog fqn, not an exported path
      assert(cap.contains(s""""base": "$schema.base""""), cap)
      assert(cap.contains(""""input_mode": "fqn""""), cap)
      // no output table expected from the engine side in fqn mode: the
      // interpreter owns the write; engine reports success on exit 0
    } finally {
      spark.conf.unset("spark.graft.pythonInterpreter")
      spark.conf.unset("spark.graft.pythonInputMode")
    }
  }

  test("custom incremental strategies dispatch for python models too") {
    val proj = Files.createTempDirectory("graft_pycustom")
    write(proj, "dbt_project.yml", "name: pycustom\nmodel-paths: [\"models\"]\n")
    write(proj, "macros/theirs.sql",
      """{% macro get_incremental_theirs_sql(arg_dict) %}
        |INSERT INTO {{ arg_dict['target_relation'] }}
        |SELECT * FROM {{ arg_dict['temp_relation'] }}
        |{% endmacro %}
        |""".stripMargin)
    write(proj, "models/events.py",
      "def model(dbt, session):\n    return None  # stub-delivered\n")
    write(proj, "models/schema.yml",
      """models:
        |  - name: events
        |    config:
        |      materialized: incremental
        |      incremental_strategy: theirs
        |""".stripMargin)
    val work = Files.createTempDirectory("graft_pycustomstub")
    import spark.implicits._
    val premade = work.resolve("premade").toString
    Seq((1L, "x")).toDF("id", "v").coalesce(1).write.parquet(premade)
    val stub = write(work, "stub.sh",
      s"""#!/bin/bash
         |set -e
         |out=$$(sed -n 's/.*"output": "\\([^"]*\\)".*/\\1/p' "$$2")
         |cp -r $premade "$$out"
         |""".stripMargin)
    val schema = "g_pycustom"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    spark.conf.set("spark.graft.pythonInterpreter", s"bash $stub")
    try {
      val loc = Files.createTempDirectory("g_pycustom_wh").toString
      def runOnce() = new Runner(spark, ProjectLoader.load(proj.toString),
        targetSchema = schema, warehouseLocation = Some(loc)).run()
      assert(runOnce().forall(_.status == "success"))
      assert(spark.table(s"$schema.events").count() == 1)
      // second run routes through the custom macro → INSERTs the batch again
      val r2 = runOnce().find(_.uniqueId == "model.pycustom.events").get
      assert(r2.status == "success", r2.message)
      assert(spark.table(s"$schema.events").count() == 2)
    } finally spark.conf.unset("spark.graft.pythonInterpreter")
  }

  test("--empty feeds python models zero-row inputs") {
    val proj = pyProject("pyempty")
    val work = Files.createTempDirectory("graft_pyemptystub")
    val capture = work.resolve("manifest.json")
    import spark.implicits._
    val premade = work.resolve("premade").toString
    Seq.empty[(Long, Long)].toDF("id", "doubled")
      .coalesce(1).write.parquet(premade)
    val stub = write(work, "stub.sh",
      s"""#!/bin/bash
         |set -e
         |out=$$(sed -n 's/.*"output": "\\([^"]*\\)".*/\\1/p' "$$2")
         |cp -r $premade "$$out"
         |cp "$$2" $capture
         |""".stripMargin)
    val schema = "g_pyempty"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    spark.conf.set("spark.graft.pythonInterpreter", s"bash $stub")
    try {
      val r = new Runner(spark, ProjectLoader.load(proj.toString),
        targetSchema = schema, emptyMode = true,
        warehouseLocation = Some(Files.createTempDirectory("g_pyempty_wh").toString))
      val results = r.run()
      // base has no refs so --empty leaves its literal rows; the python
      // node's exported INPUT must still be zero rows (the LIMIT 0 contract)
      val base = results.find(_.uniqueId == "model.pyempty.base").get
      assert(base.status == "success", base.message)
      val py = results.find(_.uniqueId == "model.pyempty.enriched").get
      assert(py.status == "success", py.message)
      // the exported ref input really was zero rows
      val manifest = Files.readString(capture)
      val inPath = raw""""base": "([^"]+)"""".r
        .findFirstMatchIn(manifest).map(_.group(1)).get
      assert(spark.read.parquet(inPath).count() == 0)
    } finally spark.conf.unset("spark.graft.pythonInterpreter")
  }

  test("failing interpreter surfaces exit code and tail of output") {
    val proj = pyProject("pyfail")
    val work = Files.createTempDirectory("graft_pyfailstub")
    val stub = write(work, "stub.sh",
      """#!/bin/bash
        |echo "ModuleNotFoundError: no module named pandas" >&2
        |exit 3
        |""".stripMargin)
    val schema = "g_pyfail"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    spark.conf.set("spark.graft.pythonInterpreter", s"bash $stub")
    try {
      val r = new Runner(spark, ProjectLoader.load(proj.toString),
        targetSchema = schema,
        warehouseLocation = Some(Files.createTempDirectory("g_pyfail_wh").toString))
      val results = r.run()
      val py = results.find(_.uniqueId == "model.pyfail.enriched").get
      assert(py.status == "error", py.message)
      assert(py.message.contains("exit 3"), py.message)
      assert(py.message.contains("ModuleNotFoundError"), py.message)
    } finally spark.conf.unset("spark.graft.pythonInterpreter")
  }
}
