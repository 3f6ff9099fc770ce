package graft

import graft.ops.Stats
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Windowed exact quantiles: type-1 (discrete) semantics, integer
  * target indexing, no per-group buffering. */
class StatsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("quantile values match the sort-and-index definition") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = for {
      g <- Seq("a", "b", "c")
      _ <- 0 until (if (g == "a") 101 else 37)
    } yield (g, rnd.nextInt(1000))
    val df = rows.toDF("g", "v")
    val got = Stats.quantilesByGroup(df, "g", "v",
      Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2))
      .toMap
    // reference: sorted values, index ceil(p*n) (1-based)
    for ((g, vs) <- rows.groupBy(_._1)) {
      val sorted = vs.map(_._2).sorted
      val n = sorted.size
      for ((label, num, den) <- Seq(("p50", 1, 2), ("p90", 9, 10),
          ("p99", 99, 100))) {
        val k = (n * num + den - 1) / den
        assert(got((g, label)) == sorted(k - 1),
          s"$g/$label: ${got((g, label))} != ${sorted(k - 1)}")
      }
    }
    // exactly one row per (group, quantile)
    assert(got.size == 9)
  }

  test("ties and tiny groups stay well-defined; plan has no group buffers") {
    import spark.implicits._
    // all-equal values: every quantile is that value; n=1 group: ditto
    val df = (Seq.fill(10)(("t", 5)) :+ (("one", 42))).toDF("g", "v")
    val out = Stats.quantilesByGroup(df, "g", "v", Seq(("p50", 1, 2),
      ("p99", 99, 100)))
    val got = out.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(got == Map(("t", "p50") -> 5, ("t", "p99") -> 5,
      ("one", "p50") -> 42, ("one", "p99") -> 42))
    // scale shape: pure window ranking — no collect_list/sort_array
    // aggregation buffers anywhere in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"), plan.take(2000))
  }

  /** Type-1 discrete median of a non-empty seq: value at 1-based rank
    * ⌈n/2⌉ — the (num=1, den=2) case of quantilesByGroup's indexing. */
  private def median(vs: Seq[Long]): Long = {
    val sorted = vs.sorted
    sorted((sorted.size + 1) / 2 - 1)
  }

  test("madOutliers matches the sort-and-index MAD definition") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = for {
      g <- Seq("a", "b")
      _ <- 0 until (if (g == "a") 100 else 33)
    } yield (g, rnd.nextInt(1000).toLong)
    val got = graft.ops.Stats.madOutliers(rows.toDF("g", "v"), "g", "v", k = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.length == rows.length, "one output row per input row")
    for ((g, vs) <- rows.groupBy(_._1).view.mapValues(_.map(_._2))) {
      val med = median(vs)
      val mad = median(vs.map(v => math.abs(v - med)))
      got.filter(_._1._1 == g).foreach { case ((_, v), (gm, gmad, flag)) =>
        assert(gm == med && gmad == mad, s"$g: median/MAD mismatch")
        assert(flag == (math.abs(v - med) > 3 * mad),
          s"$g v=$v: flag $flag != |${v - med}| > 3*$mad")
      }
    }
  }

  test("madOutliers degenerate group: MAD = 0 flags every off-median value") {
    import spark.implicits._
    // >half the group identical ⇒ median = 7, every |dev| ranks ⌈n/2⌉ at 0
    // ⇒ MAD = 0 ⇒ ANY other value is an outlier (the standard MAD caveat
    // documented on the op); a duplicate of the median is NOT flagged
    val df = (Seq.fill(6)(("d", 7L)) ++ Seq(("d", 8L), ("d", 100L)))
      .toDF("g", "v")
    val got = graft.ops.Stats.madOutliers(df, "g", "v", k = 3)
      .select("v", "group_median", "group_mad", "is_outlier")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(got.forall { case (_, med, mad, _) => med == 7L && mad == 0L })
    assert(got.filter(_._1 == 7L).forall(!_._4), "median copies keep")
    assert(got.filter(_._1 != 7L).forall(_._4), "off-median values flagged")
  }

  test("winsorize clips to the exact type-1 [p1, p99] band per group") {
    import spark.implicits._
    val df = ((1L to 100L).map(g => ("g", java.lang.Long.valueOf(g))) ++
      Seq(("one", java.lang.Long.valueOf(42L)),
        ("g", null.asInstanceOf[java.lang.Long])))
      .toDF("grp", "v")
    val out = graft.ops.Stats.winsorize(df, "grp", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // 100-value group: lo = rank ceil(100/100)=1 → 1, hi = rank 99 → 99
    assert(out(("g", 1L)) == ((1L, 99L, 1L)))
    assert(out(("g", 100L)) == ((1L, 99L, 99L)), "max clips to p99")
    assert(out(("g", 50L)) == ((1L, 99L, 50L)), "mid passes through")
    // singleton group: lo = hi = the value, nothing clips
    assert(out(("one", 42L)) == ((42L, 42L, 42L)))
    // the NULL row was dropped: 101 g-rows in, 100 + 1 rows out
    assert(out.size == 101)
  }

  test("frozen halves reproduce the inline operators on their training input") {
    import spark.implicits._
    val df = ((1L to 100L).map(g => ("g", java.lang.Long.valueOf(g))) ++
      Seq(("one", java.lang.Long.valueOf(42L)),
        ("g", null.asInstanceOf[java.lang.Long])))
      .toDF("grp", "v")
    // clipWithBounds ∘ winsorizeBounds ≡ winsorize, row for row
    val inline = graft.ops.Stats.winsorize(df, "grp", "v")
      .select("grp", "v", "clipped").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val bounds = graft.ops.Stats.winsorizeBounds(df, "grp", "v")
    val frozen = graft.ops.Stats.clipWithBounds(df, "grp", "v", bounds)
      .select("grp", "v", "clipped").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(frozen == inline)
    // madFlagWithBounds ∘ madBounds ≡ madOutliers flags
    val mdf = Seq(("m", 1L), ("m", 2L), ("m", 3L), ("m", 1000L),
      ("s", 7L)).toDF("grp", "v")
    val inlineFlags = graft.ops.Stats.madOutliers(mdf, "grp", "v", k = 3)
      .select("grp", "v", "is_outlier").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).sorted.toSeq
    val frozenFlags = graft.ops.Stats.madFlagWithBounds(mdf, "grp", "v",
      k = 3, graft.ops.Stats.madBounds(mdf, "grp", "v"))
      .select("grp", "v", "is_outlier").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).sorted.toSeq
    assert(frozenFlags == inlineFlags)
  }

  test("frozen halves on held-out data: stored bounds rule; unseen groups pass") {
    import spark.implicits._
    val train = (1L to 8L).map(i => ("a", i)).toDF("grp", "v")
    val bounds = graft.ops.Stats.winsorizeBounds(train, "grp", "v",
      1, 4, 3, 4) // p25=2, p75=6
    val held = Seq[(String, java.lang.Long)](("a", 0L), ("a", 100L),
      ("z", 999L), ("a", null), (null, 5L)).toDF("grp", "v")
    val got = graft.ops.Stats.clipWithBounds(held, "grp", "v", bounds)
      .select("grp", "v", "clipped").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // seen group clips to the STORED band; unseen passes; NULLs drop
    assert(got == Map(("a", 0L) -> 2L, ("a", 100L) -> 6L,
      ("z", 999L) -> 999L))
    val fence = graft.ops.Stats.madBounds(train, "grp", "v") // med 4, mad 2
    val flags = graft.ops.Stats.madFlagWithBounds(
      Seq(("a", 4L), ("a", 11L), ("z", 50L)).toDF("grp", "v"),
      "grp", "v", k = 3, fence)
      .select("grp", "v", "is_outlier").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    // |11−4| = 7 > 3·2; the unseen group has no fence to violate
    assert(flags == Map(("a", 4L) -> false, ("a", 11L) -> true,
      ("z", 50L) -> false))
  }

  test("madOutliers drops NULL values before ranking") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Long)](("n", 1L), ("n", null),
      ("n", 2L), ("n", 3L), ("n", null), ("n", 1000L)).toDF("g", "v")
    val out = graft.ops.Stats.madOutliers(df, "g", "v", k = 3).collect()
    // 4 non-null rows survive; median over {1,2,3,1000} = 2 (rank 2 of 4),
    // devs {1,0,1,998} ⇒ MAD = 1 (rank 2 of sorted {0,1,1,998})
    assert(out.length == 4)
    val byV = out.map(r => r.getLong(1) ->
      (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(byV(1000L) == ((2L, 1L, true)))
    assert(byV(1L) == ((2L, 1L, false)))
  }

  test("corrByGroup matches the hand formula and handles degenerate groups") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Long, java.lang.Long)](
      // perfect positive: y = 2x + 1
      ("pos", 1L, 3L), ("pos", 2L, 5L), ("pos", 3L, 7L),
      // perfect negative: y = -x
      ("neg", 1L, -1L), ("neg", 2L, -2L), ("neg", 5L, -5L),
      // hand-computable: (1,2),(2,1),(3,4)
      ("mix", 1L, 2L), ("mix", 2L, 1L), ("mix", 3L, 4L),
      // zero x-variance
      ("flat", 7L, 1L), ("flat", 7L, 2L),
      // NULLs dropped, leaving a perfect pair
      ("nul", 1L, 1L), ("nul", null, 9L), ("nul", 2L, 2L), ("nul", 3L, null)
    ).toDF("g", "x", "y")
    val out = graft.ops.Stats.corrByGroup(df, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(out("pos") == ((3L, Some(1.0))))
    assert(out("neg") == ((3L, Some(-1.0))))
    // mix: n=3 sx=6 sy=7 sxy=16 sxx=14 syy=21; cov=48-42=6,
    // varx=42-36=6, vary=63-49=14 ⇒ r = 6/sqrt(84)
    val expected = BigDecimal(6.0 / math.sqrt(6.0 * 14.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("mix") == ((3L, Some(expected))))
    assert(out("flat") == ((2L, None)))
    assert(out("nul") == ((2L, Some(1.0))))
  }

  test("trimmedMean drops the exact [p1, p99] tails and averages the rest") {
    import spark.implicits._
    // g: values 1..100 → lo = value at rank ceil(1·100/100) = 1,
    // hi = value at rank ceil(99·100/100) = 99; kept 1..99, mean 50
    // s: singleton group — lo = hi = the value, kept as-is
    // n: NULL rows must be dropped before ranking
    val df = ((1 to 100).map(i => ("g", i: java.lang.Integer)) ++
      Seq(("s", 7: java.lang.Integer), ("n", 5: java.lang.Integer),
        ("n", null.asInstanceOf[java.lang.Integer]))).toDF("k", "v")
    val out = graft.ops.Stats.trimmedMean(df, "k", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out("g") == ((99L, 50.0)))
    assert(out("s") == ((1L, 7.0)))
    assert(out("n") == ((1L, 5.0)))
  }

  test("linregByGroup: hand fit, zero-x-variance NULL, NULL drop") {
    import spark.implicits._
    val df = Seq(
      // g: y = 2x - 1 exactly
      ("g", 1: java.lang.Integer, 1: java.lang.Integer),
      ("g", 2: java.lang.Integer, 3: java.lang.Integer),
      ("g", 3: java.lang.Integer, 5: java.lang.Integer),
      // v: all x equal → den = 0 → NULL fit
      ("v", 4: java.lang.Integer, 1: java.lang.Integer),
      ("v", 4: java.lang.Integer, 9: java.lang.Integer),
      // n: NULL row dropped, remaining pair fits exactly
      ("n", 0: java.lang.Integer, 5: java.lang.Integer),
      ("n", 2: java.lang.Integer, 9: java.lang.Integer),
      ("n", null.asInstanceOf[java.lang.Integer], 7: java.lang.Integer))
      .toDF("k", "x", "y")
    val out = graft.ops.Stats.linregByGroup(df, "k", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out("g") == ((3L, Some(2.0), Some(-1.0))))
    assert(out("v") == ((2L, None, None)))
    assert(out("n") == ((2L, Some(2.0), Some(5.0))))
  }

  test("modeByGroup: argmax with (count desc, value asc) ties, NULL drop") {
    import spark.implicits._
    val df = Seq(
      // a: clear winner
      ("a", "x"), ("a", "x"), ("a", "y"),
      // b: 2-2 tie → lexicographically smaller value wins
      ("b", "z"), ("b", "z"), ("b", "m"), ("b", "m"),
      // c: only NULLs → no row at all
      ("c", null.asInstanceOf[String]),
      // d: NULL doesn't outvote a real value
      ("d", null.asInstanceOf[String]), ("d", null.asInstanceOf[String]),
      ("d", "q")).toDF("k", "v")
    val out = graft.ops.Stats.modeByGroup(df, "k", "v")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(out == Map("a" -> (("x", 2L)), "b" -> (("m", 2L)),
      "d" -> (("q", 1L))))
  }

  test("histogramEquiWidth: bin edges, clamping, shares") {
    import spark.implicits._
    val df = Seq(("g", 0L), ("g", 4L), ("g", 5L), ("g", 10L), ("g", -3L))
      .map { case (k, v) => (k, Option(v)) }.toDF("k", "v")
    val out = graft.ops.Stats.histogramEquiWidth(df, "k", "v",
      lo = 0L, hi = 10L, bins = 2)
      .collect().map(r => r.getInt(1) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // 0, 4, and the clamped -3 land in bin 0; 5 and the clamped 10 in 1
    assert(out == Map(0 -> ((3L, 0.6)), 1 -> ((2L, 0.4))))
  }

  test("weightedMedianByGroup: mass pulls the median, uniform = type-1") {
    import spark.implicits._
    val df = Seq(
      // heavy tail: one value carries 10/12 of the mass
      ("h", 1L, Some(1L)), ("h", 2L, Some(1L)), ("h", 3L, Some(10L)),
      // uniform weights reproduce the LOWER median (type-1)
      ("u", 1L, Some(1L)), ("u", 2L, Some(1L)), ("u", 3L, Some(1L)),
      ("u", 4L, Some(1L)),
      // tied values pool their weight
      ("t", 5L, Some(1L)), ("t", 5L, Some(1L)), ("t", 1L, Some(1L)),
      // zero/NULL weights out of scope → only v=9 remains
      ("z", 9L, Some(2L)), ("z", 1L, Some(0L)), ("z", 2L, None)
    ).toDF("k", "v", "w")
    val out = graft.ops.Stats.weightedMedianByGroup(df, "k", "v", "w")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      "h" -> ((12L, 3L)), "u" -> ((4L, 2L)),
      "t" -> ((3L, 5L)), "z" -> ((2L, 9L))))
  }

  test("corrMatrix: single scan, pairwise r, listwise NULL deletion") {
    import spark.implicits._
    // y = 2x (r = 1), z anti-correlated with x (r = −1 on these points);
    // one row with a NULL z must drop from EVERY pair (listwise)
    val df = Seq(
      (1L, 2L, Some(3L)), (2L, 4L, Some(2L)), (3L, 6L, Some(1L)),
      (9L, 99L, Option.empty[Long])).toDF("x", "y", "z")
    val out = graft.ops.Stats.corrMatrix(df, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), Option(r.get(3))))).toMap
    assert(out(("x", "y")) == ((3L, Some(1.0))))
    assert(out(("x", "z")) == ((3L, Some(-1.0))))
    assert(out(("y", "z")) == ((3L, Some(-1.0))))
    assert(out.size == 3)
    // a constant column has zero variance: NULL r against anything
    val cst = Seq((1L, 5L), (2L, 5L)).toDF("a", "b")
    val r2 = graft.ops.Stats.corrMatrix(cst, Seq("a", "b")).head()
    assert(r2.isNullAt(3))
    intercept[IllegalArgumentException] {
      graft.ops.Stats.corrMatrix(df, Seq("x"))
    }
  }

  test("giniByGroup: hand values, extremes, zero-sum NULL, NULL drop") {
    import spark.implicits._
    val df = Seq(
      ("g", Some(1L)), ("g", Some(2L)), ("g", Some(3L)), ("g", Some(4L)),
      ("top", Some(0L)), ("top", Some(0L)), ("top", Some(0L)),
      ("top", Some(10L)),
      ("even", Some(5L)), ("even", Some(5L)),
      ("zero", Some(0L)), ("zero", Some(0L)),
      ("nul", Some(7L)), ("nul", None)).toDF("k", "x")
    val out = graft.ops.Stats.giniByGroup(df, "k", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2))))).toMap
    // [1,2,3,4]: W=30, S=10 → 2·30/(4·10) − 5/4 = 0.25
    assert(out("g") == ((4L, Some(0.25))))
    // one member holds everything → (n−1)/n = 0.75
    assert(out("top") == ((4L, Some(0.75))))
    // perfectly even → 0
    assert(out("even") == ((2L, Some(0.0))))
    // zero total mass: concentration undefined
    assert(out("zero") == ((2L, None)))
    // NULL dropped → singleton, G = 2·7/(1·7) − 2 = 0
    assert(out("nul") == ((1L, Some(0.0))))
  }

  test("momentsByGroup: hand moments, zero-variance NULLs, NULL drop") {
    import spark.implicits._
    val df = Seq(
      ("g", Some(1L)), ("g", Some(2L)), ("g", Some(9L)),
      ("c", Some(5L)), ("c", Some(5L)),
      ("n", Some(3L)), ("n", None)).toDF("k", "x")
    val out = graft.ops.Stats.momentsByGroup(df, "k", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          Option(r.get(4)), Option(r.get(5))))).toMap
    // x = [1,2,9]: B = 3·86 − 144 = 114, A = 9·738 − 9·12·86 + 2·1728
    // = 810, C = 27·6578 − 36·12·738 + 18·144·86 − 3·20736 = 19494;
    // skew = 810/(114·√114), excess kurtosis = 19494/114² − 3 = −1.5
    val skew = math.rint(810.0 / (114.0 * math.sqrt(114.0)) * 1e6) / 1e6
    assert(out("g") == ((3L, 4.0, math.rint(114.0 / 9.0 * 1e6) / 1e6,
      Some(skew), Some(-1.5))))
    // constant group: variance 0, shape undefined
    assert(out("c") == ((2L, 5.0, 0.0, None, None)))
    // singleton after NULL drop: variance 0, shape undefined
    assert(out("n") == ((1L, 3.0, 0.0, None, None)))
  }
}
