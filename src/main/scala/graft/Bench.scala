package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every registered query against
  * SPARK_GRAFT_SF_DIR. A query that throws is reported explicitly in
  * "errors" (and as -1 in its per-query line) instead of being silently
  * folded into the total — a bench can't look green with broken queries.
  *
  * Output layout (round-7 fix): the driver captures only the LAST ~2000
  * characters of stdout, so the round-6 single giant JSON line (with
  * "total" printed FIRST) self-truncated — BENCH_r06.json had parsed:null
  * and the front ~30 query timings missing. Now:
  *  - one SHORT JSON line per query as it completes, carrying the median,
  *    the raw per-rep times, and /proc/loadavg at completion (rep-level
  *    contention evidence lives in stdout and in the detail file);
  *  - the FULL result (all queries, reps, loadavg, uptime) is written to
  *    BENCH_DETAIL.json in the working directory;
  *  - the LAST line is a compact summary (total, counts, start/end load,
  *    the 10 slowest query medians) small enough to always survive the
  *    tail capture and parse. A contended run (e.g. round-6 q44 46.5 s vs
  *    2.4 s idle) is now diagnosable from the artifact alone: loadavg >>
  *    ncpus at the slow query's completion line says "box was busy",
  *    divergent reps inside one query say "transient spike".
  *
  * Each query is timed SPARK_GRAFT_BENCH_REPS times (default 3) and the
  * MEDIAN is reported: single-shot numbers at codegen-dominated fixture
  * scale swing ±2× with run order and JIT state, which made round-over-round
  * comparison noise-bound. The median of 3 is stable across consecutive
  * bench invocations.
  *
  * Round-8: the artifact RESISTS contention instead of merely recording it.
  * Round-7 forensics: a single contended window let one 836 s rep (q57,
  * load 7.2) and neighbors set official medians 6–16× above idle-box truth.
  * Three countermeasures, all per query:
  *  - ADAPTIVE REPS: if max(rep)/min(rep) > 3 after the base reps, up to 2
  *    extra reps run — a transient spike gets outvoted by the honest
  *    majority instead of owning the median of 3;
  *  - MEDIAN AND MIN are both reported. min is the contention-immune bound
  *    (a busy box can only make a rep slower, never faster), so a reader
  *    comparing rounds has a number no co-tenant can inflate;
  *  - a "contended": true flag when the spread stays > 3× even after the
  *    extra reps, backed by the per-query /proc/stat CPU-steal delta
  *    (field 8 of the aggregate cpu line — on this firecracker VM steal,
  *    i.e. the hypervisor running someone else on our vCPU, is the real
  *    confounder; loadavg only sees our own runqueue).
  *
  * Round-16: contended queries are additionally RE-MEASURED in a detected
  * low-steal window after the main pass (`quiet_min` in BENCH_DETAIL) —
  * the r15 q92/q156 manual forensics, automated. See the quiet-window
  * block in main for the acceptance rule and budget.
  *
  * Round-17: the whole run is BUDGET-AWARE (r16's driver artifact was
  * timeout-killed ~200/260 queries in; r15's full run fit in 1519 s, so
  * the external ceiling is ~1800 s and this main must land under it on
  * its own):
  *  - SPARK_GRAFT_BENCH_BUDGET_SEC (default 1500) is a hard wall for the
  *    WHOLE main, measured from entry;
  *  - a query whose FIRST rep exceeds SPARK_GRAFT_BENCH_SLOW_REP_SEC
  *    (default 8) runs 2 steady-state reps instead of 3 — the ~15
  *    multi-poll streaming sims dominate the suite, and their medians at
  *    2 reps equal their mins, which is the number read anyway;
  *  - past 70% of the main-pass share of the budget every query drops to
  *    2 reps; past 90%, to 1 (coverage beats reps — a 260/260 artifact
  *    with thin reps is strictly more useful than a rich 200/260 one);
  *  - BENCH_DETAIL.json is rewritten INCREMENTALLY after every query and
  *    every quiet re-measure, so even an external kill leaves a
  *    full-evidence artifact for everything that ran;
  *  - the quiet-window pass budget is derived from the time REMAINING
  *    (capped by SPARK_GRAFT_BENCH_QUIET_SEC), not a flat 900 s.
  *  Quiet-window targets now also include DRIFT: any query whose min
  *  regressed > 20% vs the prior committed BENCH_DETAIL.json floor
  *  (min of its min and accepted quiet_min) gets a quiet verdict even
  *  when no contention flag fired — the r16 q57/q125/q55 pattern, where
  *  real steal flew under the StealFrac flag and unexplained floor
  *  regressions shipped without a verdict. Drift targets run FIRST
  *  (ordered by regression ratio), since they carry a round-over-round
  *  claim the contended-only ones don't.
  *
  * Between queries the JVM is returned to a known-clean state so query k's
  * number does not depend on queries 1..k-1 (round-5 forensics: q44 read
  * 22.9 s in the 66-query bench vs 7.0 s standalone, and untouched queries
  * drifted ±2 s round-over-round — shared-JVM residue, not the operators):
  *  - `clearCache` drops catalog-tracked Dataset persists;
  *  - `getPersistentRDDs` + unpersist drops what clearCache cannot see —
  *    `localCheckpoint` RDDs and any RDD-level persist;
  *  - `System.gc()` + a short settle lets the ContextCleaner reclaim
  *    broadcast blocks (broadcasts are reference-collected, so without an
  *    explicit GC they accumulate across all 66 queries and the heavy tail
  *    pays the heap pressure).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val benchT0 = System.nanoTime()
    def elapsedSec(): Double = (System.nanoTime() - benchT0) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "1500").toDouble
    val slowRepSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SLOW_REP_SEC", "8").toDouble
    // the main pass may spend up to this much; the rest is the quiet
    // pass's reserve (it shrinks further if the main pass overruns)
    val mainBudgetSec = budgetSec * 0.75
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

    // untimed warmup: JVM/codegen/parquet-footer costs land here, not on
    // whichever query happens to sort first. OMM fixture generation and a
    // first read of every table family are warmed too — otherwise the
    // alphabetically-first omm_* query pays fixture generation for the
    // whole family and the per-query table misattributes the cost.
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      graft.omm.OmmFixtures.ensure(spark)
      spark.read.parquet(graft.omm.OmmFixtures.path("deviation_cases"))
        .limit(1).count()
      Seq("lineitem", "orders", "events", "documents", "embeddings")
        .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count())
    } catch { case _: Throwable => () }

    // drop every form of cached state a query (or rep) can leave behind;
    // see the class doc for why clearCache alone is not enough
    def resetJvmState(settle: Boolean): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      if (settle) {
        System.gc()
        Thread.sleep(100)
      }
    }

    // sbt's in-process `run` replaces System.out with a logger that
    // prefixes every line with "[info] " — which breaks a per-line
    // json.loads in the capturing driver (every BENCH_r1..r6 artifact has
    // parsed:null). FileDescriptor.out is the real fd 1, untouched by the
    // logger swap: JSON written here reaches the capture raw.
    val rawOut = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true, "UTF-8")

    // 1-minute loadavg: the contention witness. Reading it per query (not
    // once at the end) is what lets the artifact distinguish "slow operator"
    // from "busy box" after the fact.
    def loadavg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(' ')(0).toDouble
      catch { case _: Throwable => -1.0 }
    def uptimeSec(): Double =
      try scala.io.Source.fromFile("/proc/uptime").mkString.split(' ')(0).toDouble
      catch { case _: Throwable => -1.0 }
    // cumulative CPU-steal jiffies (USER_HZ=100): aggregate "cpu" line,
    // field 8 after the label (user nice system idle iowait irq softirq
    // STEAL). Deltas across a query expose hypervisor co-tenancy that
    // loadavg cannot see — the adjudicated confounder of rounds 6–7.
    def stealJiffies(): Long =
      try scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu "))
        .map(_.trim.split("\\s+")(8).toLong).getOrElse(-1L)
      catch { case _: Throwable => -1L }
    def r3(v: Double): Double = math.rint(v * 1000) / 1000 // ms precision, short JSON

    // STATIC-plan fingerprint: preorder nodeName walk of the prepared
    // physical plan (AQE wrapper unwrapped to its INITIAL plan — the df
    // is never executed for this, so no runtime re-planning has
    // happened; subqueries included), hashed. The walk must run on
    // executedPlan, not sparkPlan: EnsureRequirements only runs in the
    // preparation phase, so sparkPlan carries no Exchange nodes at all.
    // Node names carry no expression ids, so the fingerprint is stable
    // across sessions — equal fp across rounds means the FORMULATION
    // did not change, and a timing drift must be environmental (the
    // r12→r14 q92 question, answerable from artifacts alone from this
    // round on). Captured from the last rep's DataFrame, so
    // side-effecting (streaming-ingest) queries are never re-run for
    // it; accessing executedPlan only plans. Caveat: spill-terminal
    // queries (CacheHygiene.spillToTempParquet pattern) return a
    // read-back scan, so several of them share one fingerprint — their
    // inner-DAG drift is covered by plan specs, not this hash.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case s: QueryStageExec => unwrap(s.plan)
      case other => other
    }
    def planWalk(p: SparkPlan): Seq[String] = {
      val h = unwrap(p)
      h.nodeName +: (h.children.flatMap(planWalk) ++
        h.subqueries.flatMap(planWalk))
    }
    def planInfo(df: org.apache.spark.sql.DataFrame): (String, String) =
      try {
        val names = planWalk(df.queryExecution.executedPlan)
        val sha = java.security.MessageDigest.getInstance("SHA-1")
          .digest(names.mkString("|").getBytes("UTF-8"))
          .take(4).map(b => f"$b%02x").mkString
        val scans = names.count(_.contains("Scan"))
        val xchg = names.count(_ == "Exchange")
        val bcast = names.count(_ == "BroadcastExchange")
        (sha, s""""scans":$scans,"xchg":$xchg,"bcast":$bcast""")
      } catch { case _: Throwable => ("na", """"scans":-1""") }

    // Prior committed floors (min of min and accepted quiet_min per
    // query) parsed from the LAST round's BENCH_DETAIL.json before this
    // run overwrites it — the reference for the drift-triggered quiet
    // re-measure. The format is this file's own emission, so a strict
    // regex is reliable; parse failures just mean an empty reference.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
    val priorFloor: Map[String, Double] = try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(detailPath)), "UTF-8")
      val entryRe = ("\"([^\"]+)\":\\{\"median\":[^,]*,\"min\":(-?[0-9.eE+]+)," +
        "\"reps\":\\[[^\\]]*\\],\"load\":[^,]*,\"steal_d\":[^,]*," +
        "\"contended\":(?:true|false)" +
        "(?:,\"quiet_min\":(-?[0-9.eE+]+),\"quiet_steal_d\":-?\\d+," +
        "\"quiet_reps\":\\d+(?:,\"quiet_why\":\"[^\"]*\")?)?,\"plan\":").r
      entryRe.findAllMatchIn(txt).flatMap { m =>
        val mn = m.group(2).toDouble
        val qm = Option(m.group(3)).map(_.toDouble).filter(_ >= 0)
        val floor = qm.fold(mn)(math.min(mn, _))
        if (mn >= 0) Some(m.group(1) -> floor) else None
      }.toMap
    } catch { case _: Throwable => Map.empty }

    val loadStart = loadavg()
    val stealStart = stealJiffies()
    var errors = Map.empty[String, String]
    // a rep's spread counts as contaminated when max/min exceeds this: an
    // honest fixture-scale rep varies ±2× with JIT state; 3× is outside that
    val SpreadLimit = 3.0
    val ExtraReps = 2
    // steal-aware verdict: hypervisor co-tenancy that inflates EVERY rep
    // evenly never trips the median/min spread (r13: a query with ~219
    // stolen CPU-seconds recorded spread 1.28 and flew under the flag), so
    // a query is also contended when its stolen CPU-seconds (steal_d/100,
    // USER_HZ=100) exceed this fraction of its summed rep wall-time
    val StealFrac = 0.25
    case class QRes(name: String, median: Double, min: Double,
                    times: Vector[Double], load: Double, stealD: Long,
                    contended: Boolean, planFp: String, planCounts: String)
    case class Quiet(min: Double, stealD: Long, reps: Int, why: String)

    // incremental artifact: rewritten after EVERY query and quiet
    // re-measure, so an external kill leaves full evidence for
    // everything that ran (the r16 driver artifact died with its detail
    // file never written)
    val quietAcc = scala.collection.mutable.LinkedHashMap.empty[String, Quiet]
    def writeDetail(results: Seq[QRes], done: Boolean): Unit = {
      val total = results.collect { case r if r.median >= 0 => r.median }.sum
      val totalMin = results.collect { case r if r.min >= 0 => r.min }.sum
      val flagship = results.find(_.name == "omm_envelope")
      val es = errors.map { case (k, v) => s"${q(k)}:${q(v)}" }
        .mkString("{", ",", "}")
      val entries = results.map { r =>
        val quietPart = quietAcc.get(r.name)
          .map(qq => s""","quiet_min":${qq.min},"quiet_steal_d":${qq.stealD},"quiet_reps":${qq.reps},"quiet_why":${q(qq.why)}""")
          .getOrElse("")
        s"""${q(r.name)}:{"median":${r.median},"min":${r.min},"reps":[${r.times.mkString(",")}],"load":${r.load},"steal_d":${r.stealD},"contended":${r.contended}$quietPart,"plan":{"fp":${q(r.planFp)},${r.planCounts}}}"""
      }.mkString("{", ",", "}")
      val detail =
        s"""{"metric":"total","value":$total,"value_min":$totalMin,"flagship_sec":${r3(flagship.map(_.median).getOrElse(-1.0))},"flagship_min":${r3(flagship.map(_.min).getOrElse(-1.0))},"unit":"sec","complete":$done,"queries":$entries,"errors":$es,"n_errors":${errors.size},"n_contended":${results.count(_.contended)},"reps":$reps,"sf":${q(sfDir)},"cpus":${q(cpus)},"budget_sec":$budgetSec,"elapsed_sec":${r3(elapsedSec())},"load_start":$loadStart,"load_end":${loadavg()},"steal_start":$stealStart,"steal_end":${stealJiffies()},"uptime_sec":${uptimeSec()}}"""
      try java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
        detail.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable => System.err.println(s"detail write failed: $e") }
    }
    // SPARK_GRAFT_BENCH_ONLY=q92_...,q140_... restricts the run — the
    // quiet-window re-measure loop (drift forensics) without paying the
    // full sweep; unset = every registered query (the driver contract)
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val resultsAcc = scala.collection.mutable.ArrayBuffer.empty[QRes]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      // full reset + GC before each query so its reps start from the same
      // heap/broadcast state regardless of position in the alphabet
      resetJvmState(settle = true)
      val stealQ0 = stealJiffies()
      var failed = false
      var lastDf: org.apache.spark.sql.DataFrame = null
      def runRep(): Double = {
        // drop persisted relations left by a previous rep of the same query:
        // cache lookup is by canonicalized plan, so without this a
        // persist-using query's reps 2..n would read rep 1's cache and the
        // median would under-report its real cost
        resetJvmState(settle = false)
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          df.count()
          lastDf = df
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            errors += name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
            failed = true
            -1.0
        }
      }
      // budget-aware target rep count: coverage beats reps. Past 70% of
      // the main-pass budget everything drops to 2 reps, past 90% to 1;
      // and a query whose FIRST rep is slow (the streaming sims) caps at
      // 2 regardless — its median at 3 reps equals its min anyway, and
      // those third reps alone cost the r16 run minutes it didn't have.
      val pace = elapsedSec() / mainBudgetSec
      var target =
        if (pace >= 0.9) 1
        else if (pace >= 0.7) math.min(reps, 2)
        else reps
      var times = Vector.empty[Double]
      var i = 0
      while (!failed && i < target) {
        val t = runRep()
        if (t >= 0) {
          times = times :+ t
          if (i == 0 && t > slowRepSec && target > 2) target = 2
        }
        i += 1
      }
      def median(ts: Vector[Double]): Double = ts.sorted.apply(ts.size / 2)
      def spreadOk(ts: Vector[Double]): Boolean =
        ts.size < 2 || ts.max / ts.min.max(1e-9) <= SpreadLimit
      def stealSoFar(): Long = {
        val s1 = stealJiffies()
        if (s1 >= 0 && stealQ0 >= 0) s1 - stealQ0 else -1L
      }
      def stealHigh(ts: Vector[Double]): Boolean = {
        val wall = ts.sum
        val d = stealSoFar()
        d >= 0 && wall > 0 && d / 100.0 > StealFrac * wall
      }
      // adaptive reps: a transient contention spike that owned one of 3 reps
      // gets outvoted by honest extras; stop once the median is within
      // SpreadLimit of the contention-immune min (median trustworthy again)
      // AND the stolen-CPU fraction is back under StealFrac — sustained
      // steal inflates every rep evenly, so the extras give the query more
      // chances to land a quiet rep that pulls min (the headline companion)
      // down even when the median stays polluted
      var extras = 0
      while (!failed && target > 1 && extras < ExtraReps &&
             elapsedSec() < 0.9 * mainBudgetSec &&
             ((!spreadOk(times) &&
               median(times) / times.min.max(1e-9) > SpreadLimit) ||
              stealHigh(times))) {
        val t = runRep()
        if (t >= 0) times = times :+ t
        extras += 1
      }
      val med = if (failed || times.isEmpty) -1.0 else median(times)
      val mn = if (times.isEmpty) -1.0 else times.min
      // contended = EITHER the median is still more than SpreadLimit above
      // the contention-immune min after the extra reps (transient spike the
      // extras could not outvote), OR the query's stolen CPU-seconds exceed
      // StealFrac of its summed rep wall-time (even steal the spread test
      // is blind to). Raw max/min spread is NOT used: it can never clear
      // once one rep spiked, so it would over-report. The spread clause
      // needs >= 2 reps by construction; the steal clause is meaningful
      // for ANY rep count — its whole point is catching even inflation a
      // single rep cannot reveal through spread.
      val contended = !failed && times.nonEmpty &&
        ((times.size >= 2 &&
          median(times) / times.min.max(1e-9) > SpreadLimit) ||
         stealHigh(times))
      val load = loadavg()
      val stealD = stealSoFar()
      val (fp, pc) =
        if (failed || lastDf == null) ("na", """"scans":-1""")
        else planInfo(lastDf)
      lastDf = null
      // one short evidence line per query, printed BEFORE the summary so a
      // tail capture keeps the summary; the detail file keeps everything
      rawOut.println(s"""{"q":${q(name)},"median":${r3(med)},"min":${r3(mn)},"reps":[${times.map(r3).mkString(",")}],"load":$load,"steal_d":$stealD,"contended":$contended,"fp":${q(fp)}}""")
      resultsAcc += QRes(name, med, mn, times, load, stealD, contended, fp, pc)
      writeDetail(resultsAcc.toSeq, done = false)
    }
    val results: Seq[QRes] = resultsAcc.toSeq
    // QUIET-WINDOW RE-MEASURE (automated r15 forensics): every query the
    // main pass flagged contended gets re-repped inside a low-steal
    // window, so round-over-round comparisons read `quiet_min` instead of
    // needing the manual dedicated-window runs r15 did for q92/q156. A
    // window opens when a 2 s /proc/stat probe shows ≤ 40 stolen jiffies
    // (≈ 0.2 stolen cpu-s/s on this 32-cpu box; idle steal here is ~0 —
    // the hypervisor steals proportionally to load, SCALE.md r15). A rep
    // is ACCEPTED only if the steal DURING it stayed under StealFrac of
    // its wall — the same rule the contended verdict uses — so an
    // accepted quiet_min is a steal-clean floor by construction. The
    // whole pass shares one wall-clock budget (SPARK_GRAFT_BENCH_QUIET_SEC,
    // default 900 s); queries the budget never reached record quiet_min
    // -1 with their attempt count.
    val quietCapSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_QUIET_SEC", "900").toDouble
    // the quiet pass spends what the wall budget has LEFT (minus a stop
    // margin for the summary + spark.stop), capped by the env knob — a
    // flat 900 s on top of a long main pass is how r16 overran its kill
    val quietBudgetSec = math.max(0.0,
      math.min(quietCapSec, budgetSec - elapsedSec() - 30.0))
    val quietDeadline = System.nanoTime() + (quietBudgetSec * 1e9).toLong
    def quietWindowOpen(): Boolean = {
      val s0 = stealJiffies()
      Thread.sleep(2000)
      val s1 = stealJiffies()
      s0 >= 0 && s1 >= 0 && s1 - s0 <= 40
    }
    // DRIFT targets: min regressed > 20% vs the prior committed floor —
    // quiet-verdicted even when no contention flag fired (the r16
    // q57/q125/q55 pattern: real steal under the StealFrac radar).
    // Worst regression first: each carries a round-over-round claim.
    val drift: Seq[(QRes, Double)] = results
      .filter(_.min >= 0)
      .flatMap(r => priorFloor.get(r.name)
        .filter(pf => pf > 0 && r.min > 1.2 * pf)
        .map(pf => r -> r.min / pf))
      .sortBy(-_._2)
    val driftNames = drift.map(_._1.name).toSet
    // SPARK_GRAFT_BENCH_QUIET_ALL=1 re-measures EVERY successful query
    // (validation / richer artifacts), not just drift + contended
    val quietTargets: Seq[(QRes, String)] =
      if (sys.env.get("SPARK_GRAFT_BENCH_QUIET_ALL").contains("1"))
        results.filter(_.median >= 0).map { r =>
          r -> (if (driftNames(r.name)) "drift"
                else if (r.contended) "contended" else "all")
        }
      else drift.map { case (r, _) =>
        r -> (if (r.contended) "drift+contended" else "drift")
      } ++ results.filter(r => r.contended && !driftNames(r.name))
        .map(r => r -> "contended")
    quietTargets.foreach { case (r, why) =>
      val fn = SparkEntry.queries(r.name)
      var accepted = Vector.empty[Double]
      var stealTot = 0L
      var attempts = 0
      while (accepted.size < 2 && System.nanoTime() < quietDeadline) {
        if (quietWindowOpen()) {
          resetJvmState(settle = false)
          val s0 = stealJiffies()
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, sfDir).count(); true }
            catch { case _: Throwable => false }
          val wall = (System.nanoTime() - t0) / 1e9
          val d = { val s1 = stealJiffies(); if (s1 >= 0 && s0 >= 0) s1 - s0 else -1L }
          attempts += 1
          if (d >= 0) stealTot += d
          if (ok && d >= 0 && d / 100.0 <= StealFrac * wall)
            accepted = accepted :+ wall
        }
      }
      val qm = if (accepted.isEmpty) -1.0 else accepted.min
      rawOut.println(s"""{"q":${q(r.name)},"quiet_min":${r3(qm)},"quiet_steal_d":$stealTot,"quiet_reps":$attempts,"quiet_why":${q(why)}}""")
      quietAcc(r.name) = Quiet(qm, stealTot, attempts, why)
      writeDetail(results, done = false)
    }

    val loadEnd = loadavg()
    val stealEnd = stealJiffies()
    val total = results.collect { case r if r.median >= 0 => r.median }.sum
    // contention-immune companion total: a co-tenant can only inflate reps,
    // never deflate them, so sum-of-mins is the floor no busy box can move
    val totalMin = results.collect { case r if r.min >= 0 => r.min }.sum
    // flagship (the reference's own envelope pipeline) surfaced as a
    // headline field so the 4 s slow-poll-budget check is machine-readable
    // per round without digging into the per-query map
    val flagship = results.find(_.name == "omm_envelope")
    val flagshipSec = r3(flagship.map(_.median).getOrElse(-1.0))
    val flagshipMin = r3(flagship.map(_.min).getOrElse(-1.0))
    val es = errors.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")

    // final (complete) artifact on disk — the incremental writer has been
    // keeping it current all run; this stamps "complete": true
    writeDetail(results, done = true)

    // compact trailing summary: total LAST on stdout, slowest-10 medians
    // in-line (q44-class outliers are thus always in-artifact), bounded
    // size (~600 chars for 91 queries) so the 2000-char tail always holds
    // a parseable JSON object even with sbt's epilogue after it
    val slow = results.filter(_.median >= 0).sortBy(-_.median).take(10)
      .map { r => s"${q(r.name)}:${r3(r.median)}" }.mkString("{", ",", "}")
    // contended queries by name (capped at 10 to keep the tail bounded):
    // for these, trust "min"/"value_min", not the median — the per-query
    // lines above carry the rep + steal evidence
    val contendedNames = results.filter(_.contended).take(10)
      .map(r => q(r.name)).mkString("[", ",", "]")
    spark.stop()
    // print the summary AFTER spark.stop() so no late executor/log line can
    // land between it and the end of the capture window
    rawOut.println(s"""{"metric":"total","value":${r3(total)},"value_min":${r3(totalMin)},"flagship_sec":$flagshipSec,"flagship_min":$flagshipMin,"unit":"sec","n_queries":${results.size},"errors":$es,"n_errors":${errors.size},"n_contended":${results.count(_.contended)},"n_quiet":${quietAcc.size},"n_drift":${drift.size},"budget_sec":$budgetSec,"elapsed_sec":${r3(elapsedSec())},"contended":$contendedNames,"reps":$reps,"sf":${q(sfDir)},"load_start":$loadStart,"load_end":$loadEnd,"steal_start":$stealStart,"steal_end":$stealEnd,"slowest":$slow,"detail":${q(detailPath)}}""")
    if (errors.nonEmpty) sys.exit(1)
  }
}
