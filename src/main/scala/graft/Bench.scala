package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every inventory query on
  * SPARK_GRAFT_SF_DIR and prints per-query seconds as JSON.
  *
  * Each query is materialized through the `noop` sink — `count()` would
  * let Catalyst prune projections and undercount the real work; noop
  * executes the full plan and discards rows (no disk in the timing).
  *
  * Output protocol (the artifact consumer preserves only a bounded
  * ~2 KB TAIL of stdout and parses a JSON line from it):
  *   1. first line  — `metric:"total_full"`: ALL per-query timings plus
  *      the per-query cold-built artifact map (head-truncated in the
  *      durable tail; the complete copy is also written to the
  *      `queries_file` path below, best-effort).
  *   2. last line   — `metric:"total"`: compact and ALWAYS inside the
  *      tail — total/median/worst-10, per-family seconds, which
  *      queries cold-built which artifacts, and load averages. This
  *      is the line cross-round comparison should parse: any >1.5×
  *      per-query move is attributable to cold-build (the `cold` map),
  *      ambient load (`load_avg_*`), or code — without builder notes.
  *      Both lines print AFTER spark.stop() so no shutdown WARN can
  *      land after them, and the SAME summary object (plus the full
  *      per-query maps) is mirrored to `queries_file`
  *      (bench/last_bench.json) at top level — the belt to stdout's
  *      suspenders after BENCH_r14 archived the file yet parsed null
  *      from the tail.
  */
object Bench {

  /** Artifact roots whose published markers define cold/warm state. */
  private val ArtifactRoots = Seq(
    "/tmp/graft-artifact-cache", "/tmp/graft-postings-cache",
    "/tmp/graft-ivf-cache", "/tmp/graft-incpostings-cache")

  /** Published-artifact markers currently on disk, as compact labels
    * (parent-dir name with fingerprint digit runs collapsed). A query
    * that ADDS one paid that build — its timing is a cold number. */
  private def artifactState(): Set[String] = {
    def walk(f: java.io.File, depth: Int): Seq[java.io.File] =
      if (!f.exists()) Seq.empty
      else if (f.isFile) {
        if (f.getName == "_GRAFT_DONE" || f.getName == "CURRENT") Seq(f)
        else Seq.empty
      } else if (depth <= 0) Seq.empty
      else Option(f.listFiles()).getOrElse(Array.empty).toSeq
        .flatMap(walk(_, depth - 1))
    ArtifactRoots.flatMap { r =>
      walk(new java.io.File(r), 4).map { m =>
        val owner = m.getParentFile
        val root = new java.io.File(r).getName
          .stripPrefix("graft-").stripSuffix("-cache")
        // Label = ROOT-RELATIVE owner path (digit runs collapsed): the
        // corpus-identifying parent dir must stay in the label, or two
        // corpora's same-named artifacts collapse to one set entry and
        // a rebuild hides behind the other's marker.
        val rel = owner.getPath.stripPrefix(r).stripPrefix("/")
        s"$root:${rel.replaceAll("[0-9]{6,}", "#")}"
      }
    }.toSet
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    // Dev knobs for scale experiments: SPARK_GRAFT_SHUFFLE_PARTITIONS
    // overrides the partition count; SPARK_GRAFT_INIT_PARTITIONS sets
    // AQE's pre-coalesce partition number (size-based partitioning —
    // big shuffles keep many partitions, small ones coalesce down).
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val builder = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_INIT_PARTITIONS").foreach(n => builder
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", n))
    sys.env.get("SPARK_GRAFT_JARS").foreach(j => builder.config("spark.jars", j))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/codegen paths so the first measured query isn't
    // charged for session startup.
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()

    // Dev-only subset filter: SPARK_GRAFT_ONLY=q1,q2 benches just those.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // Cache hygiene: session-lifetime memos (Dedup.materialized, the CC
    // memo, SimJoin persists) are useful WITHIN a query family but were
    // found to pressure the heap for the alphabetically-later scalar
    // batteries. Drop everything at each family boundary (prefix before
    // the first '_') so no query is charged for another family's cache.
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadStart = os.getSystemLoadAverage
    // The ML twins (m1/m1b/m2/m2b) deliberately share one cached
    // embeddings view — grouping them keeps the boundary clear from
    // evicting the cache they were built to share.
    def family(name: String): String = {
      val f = name.takeWhile(_ != '_')
      if (f.startsWith("m1") || f.startsWith("m2")) "ml" else f
    }
    var prevFam = ""
    var artifactsBefore = artifactState()
    val famSecs = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val coldBuilds = scala.collection.mutable.LinkedHashMap.empty[String, Seq[String]]
    val results = selected.map { case (name, fn) =>
      val fam = family(name)
      if (prevFam.nonEmpty && fam != prevFam) spark.catalog.clearCache()
      prevFam = fam
      // Per-query load sample (r11 verdict #7): the 1-minute load
      // average AT QUERY START, so a tail-of-run ambient-load move is
      // attributable from the artifact alone — the r11 link-predict
      // 1.5× question needed a rerun to answer; this answers it in
      // place alongside the cold map.
      val loadAt = os.getSystemLoadAverage
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val secs = (System.nanoTime() - t0) / 1e9
      val after = artifactState()
      val built = (after -- artifactsBefore).toSeq.sorted
      if (built.nonEmpty) coldBuilds(name) = built
      artifactsBefore = after
      // Reporting families are COARSER than the cache-hygiene boundary
      // (trailing digits stripped: a1/a9/a → "a") so the final line's
      // per-family map stays well inside the consumer's bounded tail.
      val rfam = fam.replaceAll("[0-9]+$", "")
      famSecs(rfam) = famSecs.getOrElse(rfam, 0.0) + secs
      (name, secs, loadAt)
    }
    val loadEnd = os.getSystemLoadAverage
    // Millisecond precision: full-double formatting would halve how many
    // per-query timings fit the durable tail. 1 ms ≪ run-to-run noise.
    def ms(v: Double): String = (math.rint(v * 1000) / 1000).toString
    def jmap(kvs: Seq[(String, String)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jmap(results.map { case (k, v, _) => k -> ms(v) })
    // Per-query 1-min load samples, 2-decimal (the attribution map).
    def l2(v: Double): String = (math.rint(v * 100) / 100).toString
    val loads = jmap(results.map { case (k, _, l) => k -> l2(l) })
    val coldJson = jmap(coldBuilds.toSeq.take(12).map { case (q, arts) =>
      q -> arts.mkString("[\"", "\",\"", "\"]")
    })
    val total = results.map(_._2).sum
    val fams = jmap(famSecs.toSeq.map { case (k, v) => k -> ms(v) })

    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench/last_bench.json")
    val times = results.map(_._2).sorted
    val median =
      if (times.isEmpty) 0.0
      else if (times.size % 2 == 1) times(times.size / 2)
      else (times(times.size / 2 - 1) + times(times.size / 2)) / 2
    val worst = results.sortBy(-_._2).take(10)
    val worst10 = jmap(worst.map { case (k, v, _) => k -> ms(v) })
    // Load samples FOR the worst-10 (the queries whose moves need
    // attribution) — full per-query loads are in line 1 + the file.
    val worstLoads = jmap(worst.map { case (k, _, l) => k -> l2(l) })
    // Self-adjudicating worst-10 (r13 verdict #7): the driver totals of
    // the last two rounds were dominated by ambient load and needed
    // builder re-runs to interpret. Re-run each worst-10 query twice
    // more and report the MEDIAN of its three samples plus the spread
    // (max-min): a structural regression shows a high median with a
    // tight spread; an ambient spike shows a low median with a wide
    // spread. Runs keep the main pass's family-boundary cache hygiene
    // and walk in the original (alphabetical) order so family memos
    // behave as they did in the measured pass.
    val byName = selected.toMap
    val worstSet = worst.map(_._1).toSet
    val med3Samples = scala.collection.mutable.LinkedHashMap
      .empty[String, Seq[Double]]
    worst.map(_._1).foreach(n => med3Samples(n) =
      Seq(results.find(_._1 == n).get._2))
    for (pass <- 1 to 2) {
      var prev = ""
      selected.filter(p => worstSet(p._1)).foreach { case (name, fn) =>
        val fam = family(name)
        if (prev.nonEmpty && fam != prev) spark.catalog.clearCache()
        prev = fam
        val t0 = System.nanoTime()
        // a FAILED re-run's elapsed time is not a sample — a fast
        // failure would drag the reported median below what the query
        // actually costs (r14 advice); only successful runs count
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name re-run $pass failed: ${e.getMessage}")
            false
          }
        if (ok)
          med3Samples(name) = med3Samples(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    val worstMed3 = jmap(worst.map { case (k, _, _) =>
      k -> ms(med3Samples(k).sorted.apply(med3Samples(k).size / 2)) })
    val worstSpread = jmap(worst.map { case (k, _, _) =>
      val s = med3Samples(k); k -> ms(s.max - s.min) })
    // cold per query as COUNTS here (names are in line 1 + the file):
    // keeps this line safely inside the ~2 KB durable tail. The
    // families map moved to line 1 + the file for the same reason —
    // r13's final line OVERFLOWED the consumer's 2000-char tail
    // (BENCH_r13 parsed:null), which defeated the whole
    // self-adjudication purpose; this line must parse WHOLE.
    val coldCounts = jmap(coldBuilds.toSeq.take(12)
      .map { case (q, arts) => q -> arts.size.toString })
    // the summary WITHOUT the closing brace, so the durable file can
    // append the full per-query detail at the SAME top level — the
    // driver archives queries_file, and r14's parsed:null showed the
    // stdout tail alone cannot be trusted to end at this line
    val summaryBody = s""""metric":"total","value":${ms(total)},"unit":"sec","n_queries":${results.size},"median":${ms(median)},"worst10":$worst10,"worst10_median3":$worstMed3,"worst10_spread":$worstSpread,"worst10_loads":$worstLoads,"cold":$coldCounts,"n_cold_builds":${coldBuilds.size},"queries_file":"$outFile","sf":"$sfDir","load_avg_start":$loadStart,"load_avg_end":$loadEnd"""

    // Durable copy FIRST: the summary object at the file's top level
    // (r14 verdict #3 — BENCH_r14 parsed:null while the driver archived
    // this very file), with the full per-query maps as extra top-level
    // fields. One JSON object, parseable however much of stdout
    // survives.
    try {
      val f = new java.io.File(outFile)
      Option(f.getParentFile).foreach(_.mkdirs())
      val w = new java.io.OutputStreamWriter(new java.io.FileOutputStream(f),
        java.nio.charset.StandardCharsets.UTF_8)
      try w.write(s"""{$summaryBody,"queries":$qs,"loads":$loads,"families":$fams,"cold_names":$coldJson}\n""")
      finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    // SUMMARY-only side file (fixed path next to queries_file): exactly
    // the bytes of the final stdout line, so any consumer that misses
    // the stdout tail can parse the identical object from disk.
    try {
      val sf = new java.io.File(
        Option(new java.io.File(outFile).getParentFile)
          .getOrElse(new java.io.File(".")), "SUMMARY.json")
      val w = new java.io.OutputStreamWriter(new java.io.FileOutputStream(sf),
        java.nio.charset.StandardCharsets.UTF_8)
      try w.write(s"{$summaryBody}\n") finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write SUMMARY.json: ${e.getMessage}")
    }

    // Stop Spark BEFORE the stdout protocol lines: executor/shutdown
    // WARNs printing after the summary were the likeliest reason the
    // consumer's "last line" was not the summary (r14 verdict #3).
    spark.stop()
    println(s"""{"metric":"total_full","value":${ms(total)},"unit":"sec","queries":$qs,"loads":$loads,"families":$fams,"cold":$coldJson,"n_cold_builds":${coldBuilds.size},"sf":"$sfDir","load_avg_start":$loadStart,"load_avg_end":$loadEnd}""")
    // LAST line — compact, always fully inside the consumer's bounded
    // tail, nothing printed after it.
    println(s"{$summaryBody}")
  }
}
