package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * Each query is forced with a `noop` sink write (full materialization of
  * every column — `count()` would let Catalyst prune the scan to nothing).
  * Failures are reported per-query under "errors" and NEVER folded into the
  * timing total (VERDICT r1 finding: a -1 sentinel in the sum let failing
  * queries masquerade as fast ones).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // ambient machine load, sampled before ANY Spark work (see the
    // provable-idleness note below) — the number that answers "was the
    // box otherwise idle", which load.start (post-warmup) cannot
    val loadAmbient =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // STRUCTURAL within-run-inflation fix (r15 verdict: the GC-cadence
      // default didn't protect the driver's artifact). Even with the UI
      // disabled, the in-memory AppStatusStore/SQLAppStatusListener retain
      // up to 1000 jobs / 1000 stages / 1000 SQL executions WITH task
      // metrics — a ~560-execution bench run accumulates hundreds of MB of
      // live (unGCable) status data across the run, which is exactly the
      // old-gen pressure the r15 close measured. Cap the retention so the
      // live set stays flat no matter how many queries the run times.
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "50")
      .config("spark.ui.retainedTasks", "2000")
      .config("spark.sql.ui.retainedExecutions", "10")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def jstr(s: String): String = graft.util.Json.str(s)

    // optional comma-separated filter for local iteration; driver passes none
    val only = args.headOption.map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // Untimed warmup pass: JIT, codegen (janino) compilation, parquet footer
    // caches, and shuffle machinery all initialize here so the timed pass
    // measures steady-state engine throughput (first-run overhead was up to
    // 10s on an otherwise-0.5s query). Data is still read from disk each run.
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () } // failures are reported by the timed pass
    }
    // the warmup exists for JIT/codegen/parquet-footer warmup (infra), NOT
    // result reuse: operators that persist() intermediates (the set-sim
    // family) would otherwise serve the timed pass straight from the
    // CacheManager via canonical-plan matching, and the "measurement" would
    // be a cache read. Dropping cached data keeps the timed pass honest.
    spark.catalog.clearCache()
    // localCheckpoint RDD blocks are NOT freed by clearCache (they live in
    // the block manager until the ContextCleaner collects the plan), so the
    // checkpoint-bearing operators would otherwise accumulate residency
    // across the alphabetical query order and, on a memory-pressured
    // machine, inflate later heavy queries 4-5× (round-5 driver snapshot).
    // Synchronous on purpose: blocking=false would race the next timing.
    def dropLingeringRdds(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    dropLingeringRdds()
    // Self-diagnosing timing: ≥2 timed runs per query BY DEFAULT so the
    // artifact itself can distinguish a real regression from a contended
    // machine (round-7/8 lesson: single-run numbers swung 3-5× on
    // block-manager-heavy queries with zero code changes, and the artifact
    // could not prove it was environmental). Headline per-query number is
    // the MIN of the runs — the least-contended observation and the best
    // steady-state throughput estimate on a shared box; the full sorted
    // spread per query is persisted alongside so a wide min↔max gap reads
    // as "contended run", a tight one as "trust the number".
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    def loadAvg(): Double =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // PROVABLE-idleness instrumentation (r11→r13 verdicts asked for a
    // close bench with "load < 2 both ends" three rounds running — an ask
    // the old fields could never satisfy: load.start was sampled AFTER
    // the warmup pass, so the 1-min loadavg it reports is dominated by
    // the bench's OWN 32-core warmup, idle machine or not). Two fields
    // separate ambient from self-inflicted load:
    //  - load.ambient: loadavg BEFORE any Spark work — the machine's
    //    actual background load;
    //  - load.other_cpu_frac: over the timed window, the fraction of
    //    total machine CPU consumed by processes OTHER than this JVM
    //    (from /proc/stat busy jiffies minus /proc/self/stat utime+stime)
    //    — ~0 on an idle box even while the bench itself runs hot.
    def procJiffies(): (Long, Long) = try {
      val cpu = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).get(0)
        .trim.split("\\s+").drop(1).map(_.toLong)
      val total = cpu.sum
      val busy = total - cpu(3) - (if (cpu.length > 4) cpu(4) else 0L)
      (busy, total)
    } catch { case _: Throwable => (-1L, -1L) }
    def selfJiffies(): Long = try {
      val f = java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/self/stat"))
      // fields 14/15 (utime, stime) — after the parenthesized comm field
      val rest = f.substring(f.lastIndexOf(')') + 2).split(" ")
      rest(11).toLong + rest(12).toLong
    } catch { case _: Throwable => -1L }
    val (busy0, total0) = procJiffies()
    val self0 = selfJiffies()
    val loadStart = loadAvg()
    val timings = Seq.newBuilder[(String, Seq[Double])]
    val errors = Seq.newBuilder[(String, String)]
    // ADAPTIVE full GC BETWEEN timed windows (r16 verdict item 6): the r15
    // close observed within-run inflation — the embedding family measured
    // 4-10× its isolated cost in one full 277-query pass — and r16's
    // cadence-1 GC fixed it in the driver's own artifact (q_embed_drift
    // 4.74 → 0.38 s), but taxed every SHORT query a fixed ~0.3-0.8 s
    // pause (the r16 small-row creep: tpch q7/q8/q9/q21, q_cusum,
    // q_winnow, q_textrank). What the GC actually buys is bounding
    // OLD-GEN CARRYOVER between measurements, so the trigger is now that
    // thing itself: collect only when heap use has grown past 1/16th of
    // max heap (floored at 256 MB) since the last collection — the
    // divisor the r17 A/B actually ran — two long reads before each
    // timed window, free when nothing accumulated, the same bounded pause
    // when something did. The check runs before EVERY timed run, not just
    // per query: the r16 artifact's systematic run-2 tasksec doubling on
    // the graph family was run-1 residue that a per-query-only GC never
    // saw. The status-store retention caps in the session builder above
    // remove the main LIVE accumulation; this clears the dead residue
    // (evicted codegen classes, dropped blocks).
    // DEFAULT stays the forced per-query cadence (gcEvery=1): the r17
    // A/B (full 286×2 runs, same box, same binary) measured adaptive-only
    // at 290.4 s with tpch_q8/q9/token_budget/dup_inflation 2×-inflated,
    // cadence-1 + adaptive-between-runs at 282.6 s with those rows back
    // at their r16 cost — and the r16 "small-row creep" attributed to
    // the GC pause did NOT reproduce (cusum/winnow/textrank moved at
    // noise level between the two). SPARK_GRAFT_BENCH_GC_EVERY=0 selects
    // adaptive-only; N>1 a sparser fixed cadence.
    val gcEvery = sys.env.getOrElse("SPARK_GRAFT_BENCH_GC_EVERY", "1").toInt
    val rt = Runtime.getRuntime
    // threshold low enough to keep the ContextCleaner serviced — its
    // reference queue only drains on collections, and hundreds of stale
    // broadcasts/RDD blocks from prior queries are exactly the carryover
    // the r16 run-2 inflation was made of — while still skipping the
    // pause across strings of sub-100 MB queries (the r16 creep)
    val gcHeapDelta = math.max(rt.maxMemory() / 16, 256L * 1024 * 1024)
    var usedAtGc = rt.totalMemory() - rt.freeMemory()
    var sinceGc = 0
    def maybeGc(force: Boolean): Unit = {
      val used = rt.totalMemory() - rt.freeMemory()
      if (force || used - usedAtGc > gcHeapDelta) {
        System.gc()
        usedAtGc = rt.totalMemory() - rt.freeMemory()
        sinceGc = 0
      }
    }
    // Per-query TASK-TIME accounting (r15 verdict item 6): a 0.1-0.4 s
    // Spark scheduling floor dominates 200+ per-query wall ratios, so the
    // artifact also records the sum of executor task durations per timed
    // run ("tasksec"). busy ≈ tasksec/cpus is the floor-free signal: a
    // wall regression with flat tasksec is scheduling/JVM noise, a tasksec
    // regression is a real plan change. The listener bus is drained before
    // each sample so tasks are charged to the query that ran them.
    val taskMillis = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null) taskMillis.addAndGet(te.taskInfo.duration)
    })
    def drainedTaskSec(): Double = {
      org.apache.spark.graftbridge.ListenerBridge
        .waitUntilListenerBusEmpty(spark.sparkContext)
      taskMillis.get() / 1000.0
    }
    val taskSecs = scala.collection.mutable.Map.empty[String, Seq[Double]]
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      sinceGc += 1
      try {
        val measured = (1 to runs).map { _ =>
          maybeGc(force = gcEvery > 0 && sinceGc >= gcEvery)
          val busy0 = drainedTaskSec()
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          // between timed executions, not inside them: a query's own
          // checkpoint blocks must not outlive its measurement window
          dropLingeringRdds()
          (dt, drainedTaskSec() - busy0)
        }.sortBy(_._1)
        timings += name -> measured.map(_._1)
        taskSecs(name) = measured.map(_._2)
      } catch {
        case e: Throwable =>
          errors += name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
      }
    }
    val loadEnd = loadAvg()
    val (busy1, total1) = procJiffies()
    val self1 = selfJiffies()
    val otherCpuFrac =
      if (busy0 < 0 || self0 < 0 || total1 <= total0) -1.0
      else math.max(0.0,
        ((busy1 - busy0) - (self1 - self0)).toDouble / (total1 - total0))
    val ts = timings.result()
    val es = errors.result()
    // true median: even run counts average the two middle values
    // (times(n/2) alone is the upper-middle — it reports the MAX of 2)
    def median(sorted: Seq[Double]): Double = {
      val mid = sorted.size / 2
      if (sorted.size % 2 == 1) sorted(mid) else (sorted(mid - 1) + sorted(mid)) / 2.0
    }
    def fmt(v: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    val qs = ts.map { case (k, v) => s"${jstr(k)}:${fmt(v.head)}" }.mkString("{", ",", "}")
    val spread = ts.map { case (k, v) =>
      s"${jstr(k)}:${v.map(fmt).mkString("[", ",", "]")}"
    }.mkString("{", ",", "}")
    // per-run executor task seconds, index-aligned with `spread` (both are
    // sorted by that run's wall time) — tasksec/cpus is the floor-free
    // per-query busy signal the wall ratios can't provide
    val taskJson = ts.map { case (k, _) =>
      s"${jstr(k)}:${taskSecs.getOrElse(k, Seq.empty).map(fmt).mkString("[", ",", "]")}"
    }.mkString("{", ",", "}")
    val ejson = es.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = ts.map(_._2.head).sum
    val medianTotal = ts.map(t => median(t._2)).sum
    val loadJson =
      s"""{"start":$loadStart,"end":$loadEnd,"ambient":$loadAmbient,""" +
        s""""other_cpu_frac":${fmt(otherCpuFrac)},"cpus":${Runtime.getRuntime.availableProcessors}}"""
    val full =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"runs":$runs,"median_total":${fmt(medianTotal)},"spread":$spread,"tasksec":$taskJson,"load":$loadJson,"failed":${es.size},"errors":$ejson,"sf":${jstr(sfDir)}}"""
    // Measurement-contract fix (r19 verdict item 1, "parsed": null in every
    // round so far): stdout carries exactly ONE JSON line — the full contract
    // line with the complete per-query map — and it is the LAST thing this
    // process prints, with no sbt "[info] " prefix (see run/outputStrategy in
    // build.sbt). The previous layout printed the full line mid-stream and a
    // second, queries-less summary line after it, so a parser that keeps the
    // last JSON object found no per-query map. The sidecar file keeps the
    // identical payload for humans and for per-round archiving. Timing
    // methodology (noop sink, min-of-2 runs, per-query GC cadence) unchanged.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), full + "\n")
    catch { case e: Throwable => System.err.println(s"bench_full write failed: $e") }
    spark.stop()
    println(full)
  }
}
