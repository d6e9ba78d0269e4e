package graft

import java.sql.Timestamp

import org.apache.spark.sql.{functions => F}

import graft.operators.{Similarity, TextAnalysis, TimeSeries}

/** Behavior specs for the series-regularization, LM-scoring, and MMR
  * operators (the oracle rows prove engine parity; these prove the
  * SEMANTICS on hand-built edge fixtures). */
class TimeSeriesLmMmrSpec extends SparkSpec {
  import spark.implicits._

  describe("TimeSeries.resampleHourlyLocf") {
    // key "a": observations in hours H, H+3 (gap of 2); key "b": one hour
    val h0 = 473352L // 2024-01-01 00:xx UTC
    def ts(hour: Long, min: Int) = new Timestamp((hour * 3600 + min * 60) * 1000)
    val events = Seq(
      ("a", ts(h0, 5), 10.0),
      ("a", ts(h0, 45), 30.0),
      ("a", ts(h0 + 3, 1), 7.0),
      ("b", ts(h0 + 1, 0), 1.0)
    ).toDF("event_type", "ts", "value")

    lazy val out = TimeSeries.resampleHourlyLocf(events, "event_type", "ts", "value")
      .orderBy("event_type", "bucket_hour").collect()

    it("emits every bucket between a key's first and last observation") {
      out.map(r => (r.getString(0), r.getLong(1))) shouldBe Array(
        ("a", h0), ("a", h0 + 1), ("a", h0 + 2), ("a", h0 + 3), ("b", h0 + 1))
    }

    it("zero-fills counts and carries averages forward across gaps") {
      val a = out.filter(_.getString(0) == "a")
      a.map(_.getLong(2)) shouldBe Array(2L, 0L, 0L, 1L) // cnt
      a.map(r => Option(r.get(3))) shouldBe Array(Some(20.0), None, None, Some(7.0))
      a.map(_.getDouble(4)) shouldBe Array(20.0, 20.0, 20.0, 7.0) // locf
    }

    it("trailing moving average spans gap buckets") {
      val a = out.filter(_.getString(0) == "a")
      // cnt series 2,0,0,1 -> ma4: 2, 1, 2/3, 3/4
      a.map(_.getDouble(5)) shouldBe Array(2.0, 1.0, 0.6667, 0.75)
    }
  }

  describe("TimeSeries.funnel") {
    def at(s: Long) = new Timestamp(s * 1000)
    it("counts stages only in order, anchored at the earliest qualifying event") {
      val ev = Seq(
        // u1 completes in order
        (1L, "view", at(10)), (1L, "click", at(20)), (1L, "purchase", at(30)),
        // u2: click BEFORE the first view -> stalls at view
        (2L, "click", at(5)), (2L, "view", at(10)),
        // u3: purchase before click -> reaches click only
        (3L, "view", at(10)), (3L, "purchase", at(15)), (3L, "click", at(20)),
        // u4: never views (click+purchase don't count)
        (4L, "click", at(10)), (4L, "purchase", at(20))
      ).toDF("user_id", "event_type", "ts")
      val out = TimeSeries.funnel(ev, "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"))
        .collect().map(r => (r.getString(0), r.getLong(2))).toMap
      out shouldBe Map("view" -> 3L, "click" -> 2L, "purchase" -> 1L)
    }
    it("anchoring is earliest-first, not best-path: a later view cannot rescue a stalled user") {
      // u5 views at 10 and 50, clicks at 40: click counts (40 > 10);
      // u6 views at 10, clicks at 5 and never again: stalls even though
      // a view at 50 follows the click (first view anchors).
      val ev = Seq(
        (5L, "view", at(10)), (5L, "view", at(50)), (5L, "click", at(40)),
        (6L, "view", at(10)), (6L, "click", at(5)), (6L, "view", at(50))
      ).toDF("user_id", "event_type", "ts")
      val out = TimeSeries.funnel(ev, "user_id", "event_type", "ts", Seq("view", "click"))
        .collect().map(r => (r.getString(0), r.getLong(2))).toMap
      out shouldBe Map("view" -> 2L, "click" -> 1L)
    }
  }

  describe("TimeSeries.topPaths") {
    def at(s: Long) = new Timestamp(s * 1000)
    it("counts first-depth journeys with deterministic tie-breaks and ranking") {
      val ev = Seq(
        // two users share view>click>purchase
        (1L, "view", at(10), 100L), (1L, "click", at(20), 101L), (1L, "purchase", at(30), 102L),
        (2L, "view", at(10), 200L), (2L, "click", at(25), 201L), (2L, "purchase", at(30), 202L),
        // one user: click>view — and a 5th event beyond depth is ignored
        (3L, "click", at(5), 300L), (3L, "view", at(10), 301L),
        // u4: simultaneous events — event_id breaks the tie (401 before 402)
        (4L, "view", at(10), 401L), (4L, "error", at(10), 402L)
      ).toDF("user_id", "event_type", "ts", "event_id")
      val out = TimeSeries.topPaths(ev, "user_id", "ts", "event_type", "event_id",
          depth = 3, k = 10)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      out.head shouldBe ((1L, "view>click>purchase", 2L))
      // count-1 paths rank by path asc
      out.drop(1).map(_._2) shouldBe Array("click>view", "view>error")
      out.map(_._3).drop(1).toSet shouldBe Set(1L)
    }
    it("k truncates the ranking") {
      val ev = (1 to 9).map(u =>
        (u.toLong, s"t$u", at(u.toLong), u.toLong)).toDF("user_id", "event_type", "ts", "event_id")
      TimeSeries.topPaths(ev, "user_id", "ts", "event_type", "event_id",
        depth = 2, k = 3).count() shouldBe 3
    }
  }

  describe("TimeSeries.mannKendall") {
    def day(i: Int) = java.sql.Date.valueOf(f"2024-01-${i + 1}%02d")
    def mk(series: Seq[(String, Int, Long)]) =
      TimeSeries.mannKendall(
        series.map { case (k, d, x) => (k, day(d), x) }.toDF("k", "t", "x"),
        "k", "t", "x")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3),
            if (r.isNullAt(4)) Double.NaN else r.getDouble(4),
            if (r.isNullAt(5)) null else r.getBoolean(5))).toMap

    it("hand case: strictly increasing 5-point series has S = 10 and rejects at n=10") {
      // n=5 monotone: S = C(5,2) = 10, Var = 5·4·15/18; z = 9/√16.667
      val inc = (0 until 5).map(i => ("up", i, (i + 1).toLong))
      val r5 = mk(inc)("up")
      r5._2 shouldBe 10L
      r5._3 shouldBe (5.0 * 4 * 15 / 18 +- 1e-6) // round-6 output snap
      r5._4 shouldBe (9.0 / math.sqrt(5.0 * 4 * 15 / 18) +- 1e-4)
      // n=10 monotone: S = 45, z = 44/√(10·9·25/18) = 3.93 > 1.96
      val r10 = mk((0 until 10).map(i => ("up", i, (i + 1).toLong)))("up")
      r10._2 shouldBe 45L
      r10._5 shouldBe true
    }

    it("reversal negates S exactly; a constant series has NULL z") {
      val xs = Seq(3L, 7L, 2L, 9L, 9L, 4L, 8L)
      val a = mk(xs.zipWithIndex.map { case (x, i) => ("f", i, x) })("f")
      val b = mk(xs.reverse.zipWithIndex.map { case (x, i) => ("r", i, x) })("r")
      b._2 shouldBe -a._2
      b._3 shouldBe a._3 // tie correction is order-free
      val c = mk((0 until 6).map(i => ("c", i, 5L)))("c")
      c._3 shouldBe 0.0 // all tied: zero variance
      c._4.isNaN shouldBe true
    }

    it("tie correction matches the published formula under heavy ties") {
      // values 1,1,2,2,2: ties t = {2, 3} → corr = 2·1·9 + 3·2·11 = 84;
      // Var = (5·4·15 − 84)/18 = 12
      val r = mk(Seq(1L, 1L, 2L, 2L, 2L).zipWithIndex.map { case (x, i) => ("t", i, x) })("t")
      r._3 shouldBe 12.0
    }
  }

  describe("TimeSeries.theilSen") {
    def ts(rows: Seq[(String, Int, Long)]) =
      TimeSeries.theilSen(rows.toDF("k", "t", "x"), "k", "t", "x")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap

    it("hand case: median pair slope and Conover intercept") {
      // t=[0,1,2,3], x=[1,3,2,7]: slopes sorted [-1,.5,2,2,2,5] ->
      // median 2; intercept = median(x - 2t) = median(1,1,-2,1) = 1
      val r = ts(Seq(("a", 0, 1L), ("a", 1, 3L), ("a", 2, 2L), ("a", 3, 7L)))("a")
      r shouldBe ((4L, 6L, 2.0, 1.0))
    }

    it("is exact on a noiseless line and immune to one wild outlier") {
      val clean = (0 until 10).map(i => ("c", i, 3L * i + 5))
      ts(clean)("c")._3 shouldBe 3.0
      ts(clean)("c")._4 shouldBe 5.0
      // poison one point: OLS slope would move; the pair-slope median doesn't
      val dirty = clean.map { case (k, t0, x) => if (t0 == 4) (k, t0, 1000L) else (k, t0, x) }
      ts(dirty)("c")._3 shouldBe 3.0
    }

    it("keys are independent and a flat series has slope 0") {
      val r = ts((0 until 5).map(i => ("f", i, 7L)) ++
        (0 until 5).map(i => ("up", i, i.toLong)))
      r("f")._3 shouldBe 0.0
      r("up")._3 shouldBe 1.0
      r("up")._4 shouldBe 0.0
    }
  }

  describe("TimeSeries.acf") {
    def day(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2026, 3, 1).plusDays(i.toLong))

    it("a perfectly periodic series autocorrelates to exactly 1 at its period") {
      // period 3, repeating [1, 5, 9] over 18 days
      val rows = (0 until 18).map(i => ("p", day(i), Seq(1L, 5L, 9L)(i % 3)))
      val out = TimeSeries.acf(rows.toDF("k", "t", "x"), "k", "t", "x", maxLag = 7)
        .collect().map(r => r.getInt(1) -> (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
      out(3) shouldBe 1.0
      out(6) shouldBe 1.0
      out(1).asInstanceOf[Double] should be < 0.0 // within-period anticorrelation
    }

    it("a constant series has NULL acf (zero variance) and lags count overlapping days") {
      val rows = (0 until 10).map(i => ("c", day(i), 4L))
      val out = TimeSeries.acf(rows.toDF("k", "t", "x"), "k", "t", "x", maxLag = 3)
        .collect().map(r => r.getInt(1) -> (r.getLong(2), r.isNullAt(3))).toMap
      out(1) shouldBe ((9L, true))
      out(3) shouldBe ((7L, true))
    }

    it("keys are independent: one key's rhythm does not leak into another's lags") {
      val periodic = (0 until 12).map(i => ("p", day(i), Seq(2L, 8L)(i % 2)))
      val trending = (0 until 12).map(i => ("up", day(i), i.toLong))
      val out = TimeSeries.acf((periodic ++ trending).toDF("k", "t", "x"),
          "k", "t", "x", maxLag = 2)
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3)).toMap
      out(("p", 2)) shouldBe 1.0
      out(("p", 1)) shouldBe -1.0
      out(("up", 1)) shouldBe 1.0 // a clean linear trend is lag-1 perfect
    }
  }

  describe("TimeSeries.cohortRetention") {
    it("buckets by first-activity week and counts distinct users per offset") {
      val wkUs = 604800000000L
      def at(wk: Long, extra: Long) = new Timestamp((wk * wkUs + extra) / 1000)
      val ev = Seq(
        (1L, at(100, 0)), (1L, at(100, 5000000L)), // twice in cohort week: counted once
        (1L, at(102, 0)), // back at offset 2
        (2L, at(100, 0)), (2L, at(101, 0)), // offsets 0 and 1
        (3L, at(101, 0)) // later cohort
      ).toDF("user_id", "ts")
      val out = TimeSeries.cohortRetention(ev, "user_id", "ts")
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      out shouldBe Map(
        (100L, 0L) -> 2L, (100L, 1L) -> 1L, (100L, 2L) -> 1L,
        (101L, 0L) -> 1L)
    }
  }

  describe("TableStats.columnStats") {
    it("reports rows, nulls, and NDV per column from one scan") {
      val df = Seq(
        (1L, Some("a")), (2L, Some("a")), (3L, None), (4L, Some("b"))
      ).toDF("id", "v")
      val out = graft.operators.TableStats.columnStats(df, Seq("id", "v"))
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      out("id") shouldBe ((4L, 0L, 4L))
      out("v") shouldBe ((4L, 1L, 2L)) // NDV excludes NULL
      // approx variant keeps the schema and is exact at this cardinality
      val approx = graft.operators.TableStats.columnStats(df, Seq("id", "v"), approx = true)
        .collect().map(r => (r.getString(0), r.getLong(3))).toMap
      approx("id") shouldBe 4L
    }
    it("partialStats from disjoint batches merge to the full-table stats") {
      val b1 = Seq((1L, Some("a")), (2L, Some("b")), (3L, None)).toDF("id", "v")
      val b2 = Seq((4L, Some("a")), (5L, Some("c")), (6L, None)).toDF("id", "v")
      val merged = graft.operators.TableStats.mergeStats(
        graft.operators.TableStats.partialStats(b1, Seq("id", "v"))
          .unionByName(graft.operators.TableStats.partialStats(b2, Seq("id", "v"))))
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      merged("id") shouldBe ((6L, 0L, 6L)) // HLL exact at tiny cardinality
      merged("v") shouldBe ((6L, 2L, 3L)) // a,b,c across batches; NULLs not sketched
    }
    it("streaming stats maintenance: merged partials track the stream exactly (MemoryStream e2e)") {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      val statsDir = java.nio.file.Files.createTempDirectory("graft-sstats").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft-sstats-ckpt").toString
      val input = MemoryStream[(Long, String)]
      val q = graft.streaming.StreamingTableStats.attach(
        input.toDS().toDF("id", "v"), ckpt, statsDir, Seq("id", "v"), triggerMillis = 100)
      try {
        input.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
        input.addData((3L, "a"), (4L, null.asInstanceOf[String])); q.processAllAvailable()
      } finally q.stop()
      val out = graft.streaming.StreamingTableStats.merged(spark, statsDir)
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      out("id") shouldBe ((4L, 0L, 4L))
      out("v") shouldBe ((4L, 1L, 2L))
    }

    it("joinCardinality equals the real join size without executing the join") {
      val a = Seq(1L, 1L, 2L, 3L, 3L, 3L).toDF("k")
      val b = Seq(1L, 3L, 3L, 9L).toDF("k")
      graft.operators.TableStats.joinCardinality(a, b, "k")
        .collect()(0).getLong(0) shouldBe a.join(b, "k").count() // 2*1 + 3*2 = 8
      // empty intersection -> 0, not null
      val c = Seq(100L).toDF("k")
      graft.operators.TableStats.joinCardinality(a, c, "k")
        .collect()(0).getLong(0) shouldBe 0L
    }
  }

  describe("TextAnalysis.lmScore") {
    it("scores corpus-typical word sequences as more likely than rare ones") {
      // "a b" appears 3x as a bigram; "a z" once — same context w1="a"
      val docs = Seq(
        (1L, "a b c"), (2L, "a b c"), (3L, "a b"),
        (4L, "a z")
      ).toDF("doc_id", "text")
      val nll = TextAnalysis.lmScore(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      nll(3L) should be < nll(4L) // common bigram beats rare bigram
      nll(1L) shouldBe nll(2L) // identical docs score identically
    }

    it("drops docs with fewer than two tokens (no bigrams)") {
      val docs = Seq((1L, "solo"), (2L, "two tokens")).toDF("doc_id", "text")
      val ids = TextAnalysis.lmScore(docs, "doc_id", "text")
        .select("doc_id").as[Long].collect()
      ids shouldBe Array(2L)
    }
  }

  describe("Similarity.mmrRerank") {
    // 4-dim toy: query q along e1; c1≈c2 both close to q (redundant),
    // c3 less relevant but diverse. At diversity-heavy λ=0.3 MMR must
    // pick c3 at rank 2 where plain top-k would pick the redundant twin
    // (sim(c2,c1)≈1.0 costs 0.7 of penalty; c3's 0.596 costs far less).
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)), // query
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)), // c1: most relevant
      (2L, Array(0.9f, 0.11f, 0.0f, 0.0f)), // c2: c1's near-twin
      (3L, Array(0.6f, 0.0f, 0.8f, 0.0f)) // c3: diverse
    ).toDF("vec_id", "embedding")

    lazy val picks = Similarity.mmrRerank(
      vecs, vecs.filter(F.col("vec_id") === 0L), "vec_id", "embedding",
      nCand = 3, k = 3, lambda = 0.3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2)))

    it("rank 1 is the plain most-relevant candidate") {
      picks.head shouldBe ((1, 1L))
    }

    it("diversification demotes the redundant near-twin") {
      picks.map(_._2) shouldBe Array(1L, 3L, 2L)
    }

    it("selects each candidate at most once") {
      picks.map(_._2).distinct.length shouldBe picks.length
    }
  }
}
