package graft

import graft.funcs.CrossDb
import graft.ops.Audit
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Relation-diff auditing + the pivot/unpivot macro twins. */
class AuditSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("compareRelations labels all four statuses") {
    import spark.implicits._
    val a = Seq((1L, "x", 10), (2L, "y", 20), (3L, "z", 30), (4L, "w", 40))
      .toDF("id", "s", "v")
    val b = Seq((1L, "x", 10),        // identical
      (2L, "y", 99),                  // changed (v differs)
      (4L, "W", 40),                  // changed (s differs)
      (5L, "new", 50))                // only_in_b; id=3 only_in_a
      .toDF("id", "s", "v")
    val out = Audit.compareRelations(a, b, Seq("id"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "identical", 2L -> "changed", 3L -> "only_in_a",
      4L -> "changed", 5L -> "only_in_b"))
  }

  test("compareRelations is null-safe on keys and compared columns") {
    import spark.implicits._
    val a = Seq[(java.lang.Long, String)]((null, "k"), (1L, null), (2L, "v"))
      .toDF("id", "s")
    val b = Seq[(java.lang.Long, String)]((null, "k"), (1L, null), (2L, null))
      .toDF("id", "s")
    val out = Audit.compareRelations(a, b, Seq("id"), Seq("s"))
      .collect().map(r => Option(r.get(0)) -> r.getString(1)).toMap
    // NULL key matches NULL key; NULL value <=> NULL value is identical
    assert(out(None) == "identical")
    assert(out(Some(1L)) == "identical")
    assert(out(Some(2L)) == "changed")
  }

  test("compareSummary counts match the row-level statuses") {
    import spark.implicits._
    val a = (1 to 10).map(i => (i.toLong, i * 2)).toDF("id", "v")
    val b = (3 to 12).map(i => (i.toLong, if (i % 2 == 0) i * 2 else -1))
      .toDF("id", "v")
    val got = Audit.compareSummary(a, b, Seq("id"), Seq("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ids 1,2 only_in_a; 11,12 only_in_b; 3..10 shared: evens identical
    // (4,6,8,10), odds changed (3,5,7,9)
    assert(got == Map("only_in_a" -> 2L, "only_in_b" -> 2L,
      "identical" -> 4L, "changed" -> 4L))
  }

  test("profile: one row per column with exact counts and string min/max") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((3L, "b"), (1L, null),
      (2L, "a"), (null, "b")).toDF("id", "s")
    val out = Audit.profile(df, Seq("id", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toMap
    assert(out("id") == ((4L, 1L, 3L, "1", "3")))
    assert(out("s") == ((4L, 1L, 2L, "a", "b")))
    intercept[IllegalArgumentException] { Audit.profile(df, Seq.empty) }
    // one scan feeds the whole profile: no Union of per-column queries
    val plan = Audit.profile(df, Seq("id", "s"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Union"))
  }

  test("pivotColumns aggregates per pinned value with dbt defaults") {
    import spark.implicits._
    val df = Seq(("u1", "click"), ("u1", "click"), ("u1", "view"),
      ("u2", "view"), ("u2", "other")).toDF("u", "t")
    val cols = CrossDb.pivotColumns(col("t"), Seq("click", "view"))
    val out = df.groupBy(col("u")).agg(cols.head, cols.tail: _*)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // sum(case when=v then 1 else 0): unlisted values count to no column
    assert(out == Map("u1" -> ((2L, 1L)), "u2" -> ((0L, 1L))))
    // max agg variant with custom then/else
    val mx = CrossDb.pivotColumns(col("t"), Seq("click"), agg = "max",
      thenValue = lit(5), elseValue = lit(-5))
    val got = df.groupBy(col("u")).agg(mx.head)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("u1" -> 5, "u2" -> -5))
    intercept[IllegalArgumentException] {
      CrossDb.pivotColumns(col("t"), Seq("x"), agg = "avg")
    }
  }

  test("unpivot melts pinned columns through one stack generator") {
    import spark.implicits._
    val df = Seq((1L, 10, 1.5), (2L, 20, 2.5)).toDF("id", "a", "b")
    val out = CrossDb.unpivot(df, Seq("id"), Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(out == Map((1L, "a") -> 10.0, (1L, "b") -> 1.5,
      (2L, "a") -> 20.0, (2L, "b") -> 2.5))
    // no Union in the plan: one scan, one generator
    val plan = CrossDb.unpivot(df, Seq("id"), Seq("a", "b"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Union"))
    intercept[IllegalArgumentException] {
      CrossDb.unpivot(df, Seq("id"), Seq.empty)
    }
  }

  test("keySkew ranks hot keys, profiles NULL, ties break on key text") {
    import spark.implicits._
    val df = (Seq.fill(6)("hot") ++ Seq.fill(2)("b") ++ Seq.fill(2)("a") ++
      Seq(null.asInstanceOf[String]))
      .map(Tuple1(_)).toDF("k")
    val out = graft.ops.Audit.keySkew(df, "k", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // 11 rows total; the 2-2 tie between a and b breaks on key asc
    assert(out.toSeq == Seq(
      ("hot", 6L, math.rint(6.0 / 11.0 * 1e6) / 1e6),
      ("a", 2L, math.rint(2.0 / 11.0 * 1e6) / 1e6),
      ("b", 2L, math.rint(2.0 / 11.0 * 1e6) / 1e6)))
    // NULL keys surface as a profiled value, not a dropped row
    val withNullTop = graft.ops.Audit.keySkew(df, "k", k = 4)
      .collect().map(_.getString(0))
    assert(withNullTop.contains("<NULL>"))
    // one input scan, zero cached state: the total branch must be
    // served by exchange reuse, not a .cache() that lingers in the
    // block manager across audits (round-11 advice)
    val executed = graft.ops.Audit.keySkew(df, "k", k = 3)
    executed.collect()
    val plan = executed.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"keySkew total branch did not reuse the counts exchange:\n$plan")
    assert(!plan.contains("InMemoryTableScan"),
      "keySkew must not cache (leaks distinct-key-sized blocks)")
  }

  test("kAnonymity: violator counts, NULL tuples group as values") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1)), ("a", Some(1)), ("a", Some(1)),   // group of 3: safe
      ("b", Some(2)), ("b", Some(2)),                   // group of 2: risky
      ("c", None), ("c", None)                          // NULL tuple: 2, risky
    ).toDF("q1", "q2")
    val r = graft.ops.Audit.kAnonymity(df, Seq("q1", "q2"), k = 3).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((7L, 3L, 2L, 4L)))
    assert(r.getDouble(4) == math.rint(4.0 / 7.0 * 1e6) / 1e6)
    intercept[IllegalArgumentException] {
      graft.ops.Audit.kAnonymity(df, Seq.empty, k = 3)
    }
  }

  test("benford: integer-cents leading digit, drops non-positive/NULL") {
    import spark.implicits._
    val df = Seq(Some(1.0), Some(2.0), Some(19.99), Some(0.0), Some(-5.0),
      Option.empty[Double]).map(Tuple1(_)).toDF("v")
    val out = graft.ops.Audit.benford(df, "v")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    // 1.0→100, 19.99→1999 both lead with 1; 2.0→200 leads with 2;
    // zero, negative, and NULL are out of scope
    assert(out(1) == ((2L, math.rint(2.0 / 3.0 * 1e6) / 1e6,
      math.rint(math.log10(2.0) * 1e6) / 1e6)))
    assert(out(2) == ((1L, math.rint(1.0 / 3.0 * 1e6) / 1e6,
      math.rint(math.log10(1.5) * 1e6) / 1e6)))
    assert(out.size == 2)
  }
}
