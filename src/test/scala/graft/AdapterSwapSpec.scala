package graft

import graft.adapter.SparkAdapter
import graft.core.Relation
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Staged-swap rewrite of PARTITIONED managed tables. Regression: renaming
  * a managed partitioned table moves its root directory but leaves the
  * per-partition catalog locations pointing at the old root — so after
  * tmp→target rename the scan read 0 rows, and dropping the backup purged
  * the stale locations, deleting the just-swapped-in data. renameRelation
  * must re-sync partition metadata after every rename. */
class AdapterSwapSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("rewriting an existing partitioned table keeps data and locations") {
    import spark.implicits._
    val schema = "g_swap_spec"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val wh = java.nio.file.Files.createTempDirectory("graft_swap_wh").toString
    val a = new SparkAdapter(spark, schema, Some(wh))
    val rel = Relation(schema, "pt")
    val df = Seq((0, "a"), (1, "b"), (2, "c"), (3, "d"), (4, "e")).toDF("k", "v")
    a.writeTableAtomic(df, rel, partitionBy = Seq("k"))
    assert(a.read(rel).count() == 5)
    // second build goes through backup/rename swap — previously emptied it
    a.writeTableAtomic(df, rel, partitionBy = Seq("k"))
    assert(a.read(rel).count() == 5)
    // and a third, to prove the state after one swap is itself re-swappable
    a.writeTableAtomic(df.filter($"k" < 3), rel, partitionBy = Seq("k"))
    assert(a.read(rel).count() == 3)
    // every registered partition location lives under the table root
    val locs = spark.sql(s"SHOW PARTITIONS ${rel.fqn}").collect().map(_.getString(0))
      .map(p => spark.sql(s"DESCRIBE FORMATTED ${rel.fqn} PARTITION ($p)")
        .filter("col_name = 'Location'").collect()(0).getString(1))
    assert(locs.nonEmpty && locs.forall(_.contains("/pt/k=")), locs.mkString(", "))
  }
}
