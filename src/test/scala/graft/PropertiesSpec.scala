package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Row, functions => F}
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.model.Schemas
import graft.operators.AuditQueries

/** Property-based checks (ScalaCheck) for the invariants the reference
  * relies on but never tests (SURVEY §5): dedup idempotence, cursor-resume
  * safety under arbitrary batches, and cap monotonicity. */
object PropertiesSpec extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // each case runs Spark jobs; keep it tight

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val genEvent: Gen[(String, Long)] = for {
    guid <- Gen.chooseNum(0, 30).map(i => s"g$i") // small key space → collisions
    at <- Gen.chooseNum(0L, 86400L)
  } yield (guid, at)

  private val genBatch: Gen[List[(String, Long)]] = Gen.listOfN(40, genEvent)

  private def df(batch: List[(String, Long)]) =
    batch.toDF("guid", "secs")
      .withColumn("created_at", F.timestamp_seconds(F.col("secs") + 1))
      .withColumn("event_type", F.lit("t"))
      .drop("secs")

  private val emptyGuids = Seq.empty[String].toDF("guid")

  property("dedup is idempotent: store(batch ++ batch) == store(batch)") =
    Prop.forAll(genBatch) { batch =>
      val once = AuditQueries.dedupAgainst(df(batch), emptyGuids)
        .select("guid").collect().map(_.getString(0)).sorted.toSeq
      val twice = AuditQueries.dedupAgainst(df(batch ++ batch), emptyGuids)
        .select("guid").collect().map(_.getString(0)).sorted.toSeq
      once == twice
    }

  property("dedup output keys = distinct(batch) minus existing") =
    Prop.forAll(genBatch, genBatch) { (batch, stored) =>
      val out = AuditQueries.dedupAgainst(df(batch), df(stored).select("guid"))
        .select("guid").collect().map(_.getString(0)).toSet
      val expect = batch.map(_._1).toSet -- stored.map(_._1).toSet
      out == expect
    }

  property("unshipped = events at/after cursor except the shipped guid, capped earliest-first") =
    Prop.forAll(genBatch, Gen.chooseNum(0L, 86400L), Gen.chooseNum(1, 50)) { (batch, curSecs, cap) =>
      val uniq = batch.distinctBy(_._1)
      val events = df(uniq)
      val cursorTs = new Timestamp((curSecs + 1) * 1000L)
      val shippedGuid = uniq.headOption.map(_._1).getOrElse("none")
      val cursors = Seq(("s", cursorTs, shippedGuid)).toDF("name", "updated_at", "shipped_id")
      val got = AuditQueries.unshipped(events, cursors, "s", batchCap = cap, payloadCols = Seq("guid"))
        .collect().map(_.getString(0)).toSet
      val eligible = uniq.filter { case (_, at) => (at + 1) * 1000L >= cursorTs.getTime }
      val capped = eligible.sortBy { case (g, at) => (at, g) }.take(cap)
      val expect = capped.map(_._1).filterNot(_ == shippedGuid).toSet
      got == expect
    }

  property("ingest sequence is dense, unique, and respects (created_at, guid) order") =
    Prop.forAll(genBatch) { batch =>
      val uniq = batch.distinctBy(_._1)
      Prop.collect(uniq.size) {
        val out = AuditQueries.assignIngestSeq(df(uniq), base = 0L)
          .select("id", "created_at", "guid").collect()
          .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2))).sortBy(_._1)
        val ids = out.map(_._1).toSeq
        val ordered = out.map(x => (x._2.getTime, x._3)).toSeq
        ids == (1L to uniq.size.toLong) && ordered == ordered.sorted
      }
    }

  property("splitOnCheck partitions the batch exactly") =
    Prop.forAll(genBatch) { batch =>
      val d = df(batch).withColumn("created_at",
        F.when(F.col("guid") === "g0", F.lit(Schemas.epoch)).otherwise(F.col("created_at")))
      val (ok, bad) = AuditQueries.splitOnCheck(d)
      ok.count() + bad.count() == batch.size
    }

  // ---- shaping-operator invariants (round-2 operators) ----

  private val genDocs: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(1, 25)
    docs <- Gen.listOfN(n, for {
      id <- Gen.chooseNum(0L, 1000L)
      words <- Gen.chooseNum(1, 40)
      toks <- Gen.listOfN(words, Gen.oneOf("a", "b", "cc", "ddd", "ee", "f"))
    } yield (id, toks.mkString(" ")))
  } yield docs.distinctBy(_._1)

  property("chunkDocs with overlap=0 partitions every token exactly once") =
    Prop.forAll(genDocs) { docs =>
      val d = docs.toDF("doc_id", "text")
      val chunks = graft.operators.DataShaping
        .chunkDocs(d, "doc_id", "text", chunkTokens = 7, overlap = 0)
        .groupBy("doc_id").agg(F.sum("chunk_len").as("toks")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = docs.map { case (id, t) => id -> t.split(" ").length.toLong }.toMap
      chunks == expected
    }

  property("chunkDocs with overlap: consecutive chunk starts differ by chunk−overlap") =
    Prop.forAll(genDocs) { docs =>
      val d = docs.toDF("doc_id", "text")
      val starts = graft.operators.DataShaping
        .chunkDocs(d, "doc_id", "text", chunkTokens = 8, overlap = 3)
        .select("doc_id", "tok_start").collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).sorted.toSeq).toMap
      starts.values.forall(s =>
        s.head == 1L && s.sliding(2).forall(w => w.size < 2 || w(1) - w(0) == 5L))
    }

  property("stratifiedSample is a deterministic subset, monotone in the threshold") =
    Prop.forAll(genDocs) { docs =>
      val d = docs.toDF("doc_id", "text").withColumn("src", F.lit("s"))
      def ids(hex: String) = graft.operators.DataShaping
        .stratifiedSample(d, "doc_id", "src", Map.empty, hex)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val lo = ids("20"); val hi = ids("80"); val all = docs.map(_._1).toSet
      lo.subsetOf(hi) && hi.subsetOf(all) && ids("20") == lo // deterministic re-run
    }

  property("temperatureSample: alpha=1 keeps everything; the max group always survives whole; deterministic") =
    Prop.forAll(genDocs) { docs =>
      val d = docs.toDF("doc_id", "text")
        .withColumn("src", F.when(F.col("doc_id") % 3 === 0, "big").otherwise("small"))
      def kept(alpha: Double) = graft.operators.DataShaping
        .temperatureSample(d, "src", "doc_id", alpha)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val all = docs.map(_._1).toSet
      val k1 = kept(1.0)
      val k05 = kept(0.5)
      // alpha=1: every group's q = (n/nmax)^1 … only the MAX group has q=1;
      // smaller groups keep a subset — so assert subset + max-group totality
      val bySrc = docs.map(_._1).groupBy(i => if (i % 3 == 0) "big" else "small")
      val maxSrc = bySrc.maxBy(_._2.size)._1
      val maxIds = bySrc(maxSrc).toSet
      k1.subsetOf(all) && maxIds.subsetOf(k1) && maxIds.subsetOf(k05) &&
        k05 == kept(0.5) // deterministic re-run
    }

  property("packSequences conserves tokens and never exceeds budget except single-doc packs") =
    Prop.forAll(genDocs) { docs =>
      val budget = 16L
      val d = docs.toDF("doc_id", "text")
        .withColumn("n_tokens", F.size(F.split(F.col("text"), " ")).cast("long"))
      val packs = graft.operators.DataShaping
        .packSequences(d, "doc_id", "n_tokens", budget)
        .groupBy("pack_id")
        .agg(F.sum("n_tokens").as("toks"), F.count(F.lit(1)).as("n"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      val total = docs.map(_._2.split(" ").length.toLong).sum
      packs.map(_._1).sum == total &&
        // a pack only exceeds the budget via its LAST doc (boundary is on
        // the exclusive running sum), so over-budget packs of 1 doc are
        // legitimate; multi-doc packs start under budget by construction
        packs.forall { case (toks, n) => n >= 1 && (toks - budget < 40L) }
    }

  property("repetition ratios live in [0,1] and distinct<=total") =
    Prop.forAll(genDocs) { docs =>
      val out = graft.operators.TextAnalysis
        .repetition(docs.toDF("doc_id", "text"), "doc_id", "text").collect()
      out.forall { r =>
        val (total, distinct) = (r.getLong(1), r.getLong(2))
        val (dup, top) = (r.getDouble(3), r.getDouble(4))
        distinct <= total && dup >= 0.0 && dup <= 1.0 && top > 0.0 && top <= 1.0
      }
    }

  property("interleave16 is a bijection on 16-bit pairs") =
    Prop.forAll(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L),
      Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L)) { (a1, b1, a2, b2) =>
      val z = Seq((a1, b1), (a2, b2)).toDF("a", "b")
        .select(graft.operators.Layout.interleave16(F.col("a"), F.col("b")).as("z"))
        .collect().map(_.getLong(0))
      (z(0) == z(1)) == (a1 == a2 && b1 == b2)
    }

  property("kAnonymize keeps only groups >= k and is idempotent") =
    Prop.forAll(genBatch, Gen.chooseNum(1L, 4L)) { (batch, k) =>
      val df = batch.toDF("g", "at").select(F.col("g"), (F.col("at") % 3).as("q"))
      val once = graft.operators.DataShaping.kAnonymize(df, Seq("g", "q"), k)
      val sizes = once.groupBy("g", "q").count().collect().map(_.getLong(2))
      val twice = graft.operators.DataShaping.kAnonymize(once, Seq("g", "q"), k)
      sizes.forall(_ >= k) && twice.count() == once.count()
    }

  property("weightedReservoir returns exactly min(k, group size) rows per group") =
    Prop.forAll(genDocs, Gen.chooseNum(1, 5)) { (docs, k) =>
      val df = docs.toDF("doc_id", "text")
        .withColumn("grp", (F.col("doc_id") % 2).cast("string"))
        .withColumn("w", F.length(F.col("text")).cast("double") + 1.0)
      val out = graft.operators.DataShaping
        .weightedReservoir(df, "doc_id", "grp", "w", k)
      val perGroup = out.groupBy("grp").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val truth = df.groupBy("grp").count().collect()
        .map(r => r.getString(0) -> math.min(k.toLong, r.getLong(1))).toMap
      perGroup == truth
    }

  // ---- round-13 stats invariants --------------------------------------

  private val genVals: Gen[List[Int]] =
    Gen.listOfN(30, Gen.chooseNum(1, 40)).suchThat(_.distinct.size >= 2)

  property("spearman is EXACTLY invariant under strictly monotone transforms") =
    Prop.forAll(genVals, genVals) { (xs, ys) =>
      val pairs = xs.zip(ys).map { case (x, y) => (x.toDouble, y.toDouble) }
      def rho(p: Seq[(Double, Double)]) = graft.operators.Drift
        .spearman(p.toDF("a", "b"), "a", "b").collect().head
      val base = rho(pairs)
      // exp and cube are strictly increasing: ranks — hence ρ — unchanged
      val mono = rho(pairs.map { case (x, y) => (math.exp(x / 10), y * y * y) })
      (base.isNullAt(1) && mono.isNullAt(1)) ||
        (!base.isNullAt(1) && base.getDouble(1) == mono.getDouble(1))
    }

  property("gini is scale-invariant and 0 iff all values equal") =
    Prop.forAll(genVals, Gen.chooseNum(2, 9)) { (xs, c) =>
      def g(v: Seq[Double]) = graft.operators.RobustStats
        .gini(v.zipWithIndex.map { case (x, i) => (i.toString, x) }.toDF("k", "v"),
          "k", "v").collect().head.getDouble(2)
      val base = g(xs.map(_.toDouble))
      val scaled = g(xs.map(x => (x * c).toDouble))
      math.abs(base - scaled) <= 2e-6 && // round-6 on both sides
        ((xs.distinct.size == 1) == (base == 0.0))
    }

  property("log-rank χ² is symmetric under swapping the cohort labels") =
    Prop.forAll(genVals, genVals) { (da, db) =>
      val rows = da.map(d => (d, d % 3 != 0, "a")) ++ db.map(d => (d, d % 3 != 0, "b"))
      def lr(rs: Seq[(Int, Boolean, String)]) = graft.operators.Survival
        .logRank(rs.map { case (d, o, g) => (d, if (o) 1 else 0, g) }
          .toDF("dur", "obs", "g"), "dur", "obs", "g").collect()
      val x = lr(rows)
      val y = lr(rows.map { case (d, o, g) => (d, o, if (g == "a") "b" else "a") })
      (x.isEmpty && y.isEmpty) || {
        val (rx, ry) = (x.head, y.head)
        // o/e columns swap sides; χ² agrees to rounding (the two sides'
        // E-sums are separate IEEE accumulations, equal only in reals)
        rx.getLong(2) == ry.getLong(4) && rx.getLong(4) == ry.getLong(2) &&
          ((rx.isNullAt(6) && ry.isNullAt(6)) ||
            math.abs(rx.getDouble(6) - ry.getDouble(6)) <= 2e-6)
      }
    }

  property("welch t negates under swapping the slices; df and rejection hold") =
    Prop.forAll(genVals, genVals) { (xs, ys) =>
      val rows = xs.map(x => ("a", x.toDouble)) ++ ys.map(y => ("b", y.toDouble))
      val fwd = graft.operators.Drift
        .welchT(rows.toDF("s", "v"), "s", "v", "a", "b").collect().head
      val rev = graft.operators.Drift
        .welchT(rows.toDF("s", "v"), "s", "v", "b", "a").collect().head
      (fwd.isNullAt(4) && rev.isNullAt(4)) ||
        (fwd.getDouble(4) == -rev.getDouble(4) &&
          fwd.getDouble(5) == rev.getDouble(5) &&
          fwd.getBoolean(6) == rev.getBoolean(6))
    }

  // ---- round-15 evaluation invariants ----------------------------------

  private val genScored: Gen[List[(Int, Boolean)]] = Gen.listOfN(30, for {
    s <- Gen.chooseNum(0, 8)
    y <- Gen.oneOf(true, false)
  } yield (s, y))

  property("rocAuc flips the label: auc(y) + auc(!y) = 1 on two-class inputs") =
    Prop.forAll(genScored) { rows =>
      val df = rows.map { case (s, y) => (s.toDouble, y) }.toDF("s", "y")
      val a = graft.operators.Evaluation.rocAuc(df, "s", "y").collect().head
      val b = graft.operators.Evaluation
        .rocAuc(df.withColumn("y", !F.col("y")), "s", "y").collect().head
      (a.isNullAt(2) && b.isNullAt(2)) ||
        math.abs(a.getDouble(2) + b.getDouble(2) - 1.0) <= 2.5e-6
    }

  property("binary mcc negates under prediction flip") =
    Prop.forAll(genScored) { rows =>
      val df = rows.map { case (s, y) => (s % 2 == 0, y) }.toDF("p", "y")
      val a = graft.operators.Evaluation.mcc(df, "p", "y").collect().head
      val b = graft.operators.Evaluation
        .mcc(df.withColumn("p", !F.col("p")), "p", "y").collect().head
      (a.isNullAt(2) && b.isNullAt(2)) ||
        math.abs(a.getDouble(2) + b.getDouble(2)) <= 2.5e-6
    }

  property("mcnemar is symmetric in the classifiers up to the disagreement labels") =
    Prop.forAll(genScored) { rows =>
      val df = rows.map { case (s, y) => (s % 2 == 0, s % 3 == 0, y) }
        .toDF("a", "b", "y")
      val fwd = graft.operators.Evaluation.mcnemar(df, "a", "b", "y").collect().head
      val rev = graft.operators.Evaluation.mcnemar(df, "b", "a", "y").collect().head
      fwd.getLong(1) == rev.getLong(2) && fwd.getLong(2) == rev.getLong(1) &&
        ((fwd.isNullAt(3) && rev.isNullAt(3)) ||
          fwd.getDouble(3) == rev.getDouble(3))
    }

  property("Murphy identity: brier = reliability − resolution + uncertainty at value bins") =
    Prop.forAll(genScored) { rows =>
      // dyadic-grid probabilities keep every moment exact
      val df = rows.map { case (s, y) => (s / 8.0, y) }.toDF("p", "y")
      val r = graft.operators.Evaluation.brierDecomposition(df, "p", "y")
        .collect().head
      math.abs(r.getDouble(3) - r.getDouble(4) + r.getDouble(5)
        - r.getDouble(2)) <= 3e-6
    }

  property("coxPhMulti on ONE covariate agrees with the binary coxPh fit") =
    Prop.forAll(Gen.listOfN(16, for {
      dur <- Gen.chooseNum(0, 8)
      obs <- Gen.oneOf(0, 1)
      x <- Gen.oneOf(0, 1)
    } yield (dur, obs, x))) { subj =>
      // coxPh groups sort "a0" < "b1", matching x = 0/1
      val g = subj.map { case (d, o, x) => (d, o, if (x == 1) "b1" else "a0") }
      val ph = graft.operators.Survival
        .coxPh(g.toDF("dur", "obs", "g"), "dur", "obs", "g").collect()
      val mu = graft.operators.Survival
        .coxPhMulti(subj.toDF("dur", "obs", "x"), "dur", "obs", Seq("x")).collect()
      // coxPh is EMPTY on no-events AND on single-cohort inputs; multi
      // still emits a NULL-estimate row for a constant covariate with
      // events — only the both-present case aligns
      if (ph.isEmpty) true
      else {
        mu.nonEmpty && {
          val a = ph.head; val b = mu.head
          a.getLong(2) == b.getLong(2) && // d_total
            ((a.isNullAt(3) && b.isNullAt(3)) ||
              (!a.isNullAt(3) && !b.isNullAt(3) &&
                math.abs(a.getDouble(3) - b.getDouble(3)) <= 2e-5 &&
                math.abs(a.getDouble(5) - b.getDouble(5)) <= 2e-5))
        }
      }
    }

  property("coxPhCont on a 0/1 covariate agrees with coxPhMulti (same fit, different algebra)") =
    Prop.forAll(Gen.listOfN(60, for {
      dur <- Gen.chooseNum(1, 10)
      obs <- Gen.oneOf(0, 1)
      x <- Gen.oneOf(0, 1)
    } yield (dur, obs, x))) { subj =>
      val mu = graft.operators.Survival
        .coxPhMulti(subj.toDF("dur", "obs", "x"), "dur", "obs", Seq("x")).collect()
      val co = graft.operators.Survival
        .coxPhCont(subj.map { case (d, o, x) => (d, o, x.toDouble) }
          .toDF("dur", "obs", "x"), "dur", "obs", "x").collect()
      // cont is EMPTY on no events; multi additionally emits a row there
      if (co.isEmpty) mu.isEmpty || mu.head.getLong(2) == 0L
      else {
        val a = mu.head; val b = co.head
        a.getLong(1) == b.getLong(1) && a.getLong(2) == b.getLong(2) &&
          ((a.isNullAt(3) && b.isNullAt(3)) ||
            (!a.isNullAt(3) && !b.isNullAt(3) &&
              math.abs(a.getDouble(3) - b.getDouble(3)) <= 2e-5 &&
              math.abs(a.getDouble(5) - b.getDouble(5)) <= 2e-5))
      }
    }

  private val genWordList: Gen[List[String]] =
    Gen.listOfN(30, Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))

  property("unigram Viterbi segmentations concatenate back to the word and never beat the char floor twice over") =
    Prop.forAll(genWordList) { words =>
      val vocab = words.groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }.toSeq
      val model = graft.operators.UnigramLM.trainFromVocab(vocab)
      val lp = model.toMap
      vocab.forall { case (w, _) =>
        graft.operators.UnigramLM.viterbi(w, lp, 4).exists { case (_, seg) =>
          val parts = seg.split('|').filter(_.nonEmpty)
          parts.mkString == w && parts.length >= 1 && parts.length <= w.length
        }
      }
    }

  property("langid NB is deterministic: row order and partitioning never move a prediction") =
    Prop.forAll(Gen.listOfN(20, for {
      lang <- Gen.oneOf("aa", "zz")
      n <- Gen.chooseNum(3, 10)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'z'))
    } yield (lang, cs.mkString))) { docs0 =>
      // exact integer micro-nat sums are order-free BY CONSTRUCTION —
      // assert it: a shuffled, repartitioned corpus trains and scores
      // to the identical per-doc prediction (a float-scored NB could
      // flip argmax under aggregation-order ties; this one cannot)
      val docs = docs0.zipWithIndex.map { case ((l, t), i) => (i.toLong, t, l) }
      val once = docs.toDF("doc_id", "text", "lang")
      val shuffled = scala.util.Random.shuffle(docs)
        .toDF("doc_id", "text", "lang").repartition(7)
      val p1 = graft.operators.LangIdNB.trainScore(once, "text", "lang", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      val p2 = graft.operators.LangIdNB.trainScore(shuffled, "text", "lang", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      p1 == p2
    }
}
