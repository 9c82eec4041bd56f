package graft

import graft.operators.{Maintenance, Sketches}
import org.apache.spark.sql.functions._

/** Maintenance / pipeline ops: incremental-merge associativity, SCD2
  * interval invariants, funnel monotonicity, bloom guarantees, index
  * equivalence, bootstrap sanity. */
class MaintenanceSpec extends SparkSuite {

  test("rollup merge over any split equals the full recompute") {
    val o = Tables(spark, sf001, "orders")
    def roll(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("o_orderpriority"), year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("rev"))
    // Three arbitrary increments (hash-split), merged pairwise in two
    // different orders — counts must equal the full rollup exactly.
    val parts = (0 until 3).map(i => roll(o.where(abs(hash(col("o_orderkey"))) % 3 === i)))
    val keys = Seq("o_orderpriority", "yr")
    val m1 = Maintenance.mergeRollups(Maintenance.mergeRollups(parts(0), parts(1), keys), parts(2), keys)
    val m2 = Maintenance.mergeRollups(parts(2), Maintenance.mergeRollups(parts(1), parts(0), keys), keys)
    val full = roll(o)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val (r1, r2, f) = (rows(m1), rows(m2), rows(full))
    assert(r1.view.mapValues(_._1).toMap === f.view.mapValues(_._1).toMap)
    assert(r2.view.mapValues(_._1).toMap === f.view.mapValues(_._1).toMap)
    // Sums agree to FP-merge tolerance.
    f.foreach { case (k, (_, rev)) =>
      assert(math.abs(r1(k)._2 - rev) <= 1e-6 * math.abs(rev), s"$k")
    }
  }

  test("delta-join refresh equals full recompute for any two-sided split") {
    val o = Tables(spark, sf001, "orders").select(col("o_orderkey"), col("o_orderpriority"))
    val li = Tables(spark, sf001, "lineitem").select(col("l_orderkey"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
    def j(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      a.join(b, a("o_orderkey") === b("l_orderkey"))
    def roll(df: org.apache.spark.sql.DataFrame) = df.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("rev"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val full = rows(roll(j(o, li)))
    // Two unrelated split choices — the identity must hold for both.
    for ((oc, lc) <- Seq(
        (col("o_orderkey") % 4 === 0, col("l_orderkey") % 9 === 0),
        (abs(hash(col("o_orderkey"))) % 3 === 0, abs(hash(col("l_orderkey"))) % 2 === 0))) {
      val (oOld, oNew) = (o.where(!oc), o.where(oc))
      val (lOld, lNew) = (li.where(!lc), li.where(lc))
      val inc = roll(j(oOld, lOld))
        .unionByName(roll(j(oNew, lOld).unionByName(j(oOld, lNew)).unionByName(j(oNew, lNew))))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("n")).as("n"), sum(col("rev")).as("rev"))
      assert(rows(inc) === full)
    }
  }

  test("incremental CC merge equals full propagation over all edges") {
    // The delta identity for graphs: contract-base + delta-CC + relabel
    // must reproduce min-label CC over the union — checked directly
    // against the same propagation run on all edges at once.
    val full = operators.DedupCluster
      .connectedComponents(operators.Dedup.lshCandidatesRaw(spark, sf001))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val inc = SparkEntry.queries("inc_cc_merge")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc === full)
    assert(inc.nonEmpty)
    // The query must not pin new plain caches in the block manager for
    // the rest of the session (the r9 leak: the LSH pair frame and the
    // CC label frames stayed persisted). localCheckpoint residue is the
    // only allowed growth — everything else must be unpersisted by the
    // time the result materializes.
    val leaked = spark.sparkContext.getPersistentRDDs
      .filter { case (id, rdd) => !before.contains(id) && !rdd.isCheckpointed }
    assert(leaked.isEmpty,
      s"inc_cc_merge leaked non-checkpoint caches: ${leaked.keys.toSeq.sorted}")
  }

  test("scd2 as-of snapshot returns exactly one interval per active user") {
    val snap = SparkEntry.queries("scd2_asof_snapshot")(spark, sf001)
    val perUser = snap.groupBy("user_id").count().where(col("count") =!= 1).count()
    assert(perUser === 0L)
    // T is inside the observed range, so every user with events before T
    // is represented.
    val active = Tables(spark, sf001, "events")
      .where(unix_micros(col("ts")) <= 1705276800000000L)
      .select("user_id").distinct().count()
    assert(snap.count() === active)
  }

  test("scd2 intervals tile each user's history: contiguous, one current row") {
    val h = SparkEntry.queries("scd2_history")(spark, sf001)
    val e = Tables(spark, sf001, "events")
    // One open (is_current) interval per user.
    val cur = h.groupBy("user_id").agg(sum("is_current").as("nc"))
      .where(col("nc") =!= 1).count()
    assert(cur === 0L)
    // valid_to of each closed interval equals the next valid_from —
    // by construction via lead(); verify no overlaps/gaps remain.
    val bad = h.where(col("valid_to").isNotNull && col("valid_to") <= col("valid_from")).count()
    assert(bad === 0L)
    // Interval event counts sum back to each user's event total.
    val sums = h.groupBy("user_id").agg(sum("n_events").as("n")).orderBy("user_id").collect()
    val truth = e.groupBy("user_id").agg(count(lit(1)).as("n")).orderBy("user_id").collect()
    assert(sums.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      truth.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("funnel steps are monotone and non-trivial on testdata") {
    val r = SparkEntry.queries("ev_funnel")(spark, sf001).collect()(0)
    val (s1, s2, s3) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(s1 >= s2 && s2 >= s3, s"funnel not monotone: $s1 $s2 $s3")
    assert(s3 > 0, "no user completed the funnel — gap bounds too tight for testdata")
  }

  test("bloom prefilter never drops a true match; false positives stay rare") {
    val r = SparkEntry.queries("bloom_prefilter")(spark, sf001).collect()(0)
    val (total, cand, truth) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(cand >= truth, "a bloom filter must not have false negatives")
    assert(cand - truth <= math.max(total / 20L, 50L),
      s"fp rows ${cand - truth} of $total — fill factor off")
    assert(truth > 0 && cand < total)
  }

  test("inverted-index AND retrieval equals the direct text predicate") {
    val viaIndex = SparkEntry.queries("idx_inverted_and")(spark, sf001)
      .collect().map(_.getLong(0)).toSet
    val direct = Tables(spark, sf001, "documents")
      .where(array_contains(graft.functions.Text.tokens(col("text")), "query") &&
        array_contains(graft.functions.Text.tokens(col("text")), "window"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaIndex === direct)
  }

  test("poisson bootstrap resample is corpus-sized and mean-preserving-ish") {
    val r = SparkEntry.queries("samp_bootstrap")(spark, sf001).collect()(0)
    val (n, k) = (r.getLong(0), r.getLong(1))
    assert(math.abs(k - n).toDouble / n < 0.10, s"resample $k vs corpus $n")
    val (bm, m) = (r.getDouble(2), r.getDouble(3))
    assert(math.abs(bm - m) / m < 0.10, s"bootstrap mean $bm vs mean $m")
  }

  test("dq gate reports zero violations on the clean snapshot") {
    val r = SparkEntry.queries("dq_constraints")(spark, sf001).collect()(0)
    (0 until r.length).foreach(i => assert(r.getLong(i) === 0L, s"violation col $i"))
  }

  test("snapshot diff statuses are exactly attributable to the mutation classes") {
    val docs = Tables(spark, sf001, "documents")
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0))
    val expected = Map(
      "removed" -> ids.count(_ % 97 == 0).toLong,
      "changed" -> ids.count(i => i % 31 == 0 && i % 97 != 0).toLong,
      "added" -> ids.count(_ % 89 == 0).toLong,
      "unchanged" -> ids.count(i => i % 97 != 0 && i % 31 != 0).toLong)
    val got = SparkEntry.queries("maint_snapshot_diff")(spark, sf001)
      .groupBy(col("status")).agg(sum(col("n")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("compaction exec rewrites each planned bin as one file, rows preserved") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("compact-src").toString
    // 8 single-file parquet shards of one schema, uneven sizes.
    val perShard = (1 to 8).map { i =>
      val rows = i * 40L
      val df = spark.range(rows).selectExpr("id", s"repeat('x', ${i * 20}) AS pad")
      val tmp = s"$src/.w$i"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(s"$src/f$i.parquet"))
      def rmr(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rmr); f.delete()
      }
      rmr(new java.io.File(tmp))
      rows
    }
    val out = Files.createTempDirectory("compact-out").toString
    val target = 16L * 1024
    val stats = Maintenance.compactExec(spark, src, target, out).collect()
    // The executor rewrites exactly the MULTI-FILE bins (single-file
    // bins are skipped, Delta-OPTIMIZE style): recompute the expected
    // partition from the plan and compare.
    val byName = (1 to 8).map(i => f"f$i.parquet" -> perShard(i - 1)).toMap
    val plan = Maintenance
      .compactionPlan(Maintenance.listParquetFiles(spark, src), target)
      .collect().map(r => r.getLong(0) -> r.getString(3).split(",").toSeq)
    val multi = plan.filter(_._2.length > 1).toMap
    assert(stats.map(_.getLong(0)).toSet === multi.keySet)
    assert(stats.map(_.getLong(1)).sum === multi.values.map(_.length.toLong).sum)
    stats.foreach { r =>
      val expectRows = multi(r.getLong(0)).map(byName).sum
      assert(r.getLong(2) === expectRows, s"bin ${r.getLong(0)} rows")
      val files = new java.io.File(s"$out/bin=${r.getLong(0)}").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files === 1, s"bin ${r.getLong(0)}")
    }
    // There is at least one multi-file bin in this fixture, and a
    // RE-RUN with a bigger target swaps the output dir wholesale — no
    // stale bins from the first plan survive.
    assert(multi.nonEmpty)
    val stats2 = Maintenance.compactExec(spark, src, 4 * target, out).collect()
    val bins2 = stats2.map(r => s"bin=${r.getLong(0)}").toSet
    val onDisk = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("bin=")).toSet
    assert(onDisk === bins2, "reused outDir carries only the new plan's bins")
  }

  test("compaction plan over the real FS listing partitions the files and bounds bins") {
    val target = 64L * 1024
    val manifest = Maintenance.listParquetFiles(spark, sf001)
    val files = manifest.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(files.keySet === Set("region", "nation", "customer", "supplier",
      "part", "orders", "lineitem", "events", "documents", "embeddings")
      .map(_ + ".parquet"))
    val plan = Maintenance.compactionPlan(manifest, target).collect()
    val planned = plan.flatMap(_.getString(3).split(","))
    // Exact partition of the input: every file planned exactly once.
    assert(planned.sorted.toSeq === files.keys.toSeq.sorted)
    plan.foreach { r =>
      val (bytes, oversized) = (r.getLong(2), r.getBoolean(4))
      val members = r.getString(3).split(",")
      assert(bytes === members.map(files).sum, s"bin ${r.getLong(0)} byte sum")
      // An above-target FILE is always alone in its bin (sequential
      // rule) and flagged; a multi-file bin can legitimately total up
      // to just under 2x target (first member starts anywhere inside
      // the bin's byte span), so the bound for unflagged bins is 2x.
      if (members.exists(files(_) > target)) {
        assert(members.length === 1 && oversized, s"oversized bin ${r.getLong(0)}")
      } else {
        assert(!oversized, s"bin ${r.getLong(0)} flag")
        assert(bytes < 2 * target, s"bin ${r.getLong(0)} over 2x target")
      }
    }
    // The sequential rule never leaves two adjacent bins both under
    // half-target (that would mean a merge was missed): total bins is
    // at most ceil(total/target) + number of oversized files.
    val total = files.values.sum
    val nOversized = files.values.count(_ > target)
    assert(plan.length <= (total + target - 1) / target + nOversized)
  }

  test("compaction re-run with an empty plan preserves the existing output") {
    import java.nio.file.Files
    // A source where every bin is single-file (each file bigger than
    // the target): the plan is empty — the re-run-on-already-compacted
    // scenario. The executor must publish NOTHING and must NOT destroy
    // whatever the previous run put at outDir.
    val src = Files.createTempDirectory("compact-rerun-src").toString
    val df = spark.range(2000).selectExpr("id", "repeat('y', 64) AS pad")
    df.coalesce(1).write.mode("overwrite").parquet(s"$src/.w")
    val part = new java.io.File(s"$src/.w").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, java.nio.file.Paths.get(s"$src/big.parquet"))
    val out = Files.createTempDirectory("compact-rerun-out").toString
    Files.writeString(java.nio.file.Paths.get(s"$out/previous-output.txt"), "keep me")
    // target=1 byte: consecutive running sums differ by whole file
    // sizes, so every file lands in its own bin — all single-file,
    // nothing to rewrite.
    val stats = operators.Maintenance.compactExec(spark, src, target = 1L, out)
    assert(stats.collect().isEmpty)
    assert(Files.readString(java.nio.file.Paths.get(s"$out/previous-output.txt")) == "keep me",
      "re-run destroyed the previous output")
  }

  test("vacuum plan lists exactly the aged members of multi-file compaction bins") {
    val vacuum = SparkEntry.queries("maint_vacuum_plan")(spark, sf001).collect()
      .map(r => (r.getAs[String]("file"), r.getAs[Long]("bin"))).toSet
    val plan = SparkEntry.queries("maint_compact_plan")(spark, sf001).collect()
    val multiBinFiles = plan.filter(_.getAs[Long]("n_files") > 1)
      .flatMap(r => r.getAs[String]("files").split(",").map(_ -> r.getAs[Long]("bin")))
      .toSet
    val singleBinFiles = plan.filter(_.getAs[Long]("n_files") == 1)
      .flatMap(_.getAs[String]("files").split(",")).toSet
    // Agreement by construction: every vacuumed file sits in a
    // multi-file bin of the SAME plan (same bin id), none in a
    // single-file bin, and all are older than the retention cutoff.
    assert(vacuum.subsetOf(multiBinFiles))
    assert(vacuum.forall { case (f, _) => !singleBinFiles.contains(f) })
    assert(vacuum.forall { case (f, _) => f.take(10) < "2024-01-15" })
    // And completeness: every aged multi-bin member IS vacuumed —
    // non-vacuously (an empty plan would pass every assertion above).
    val agedMulti = multiBinFiles.filter(_._1.take(10) < "2024-01-15")
    assert(vacuum === agedMulti)
    assert(vacuum.nonEmpty)
  }
}
