package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Results are materialized with the `noop` datasource writer — a plain
  * `count()` would let Catalyst prune the expensive projections (signatures,
  * buckets) out of the measured plan.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-ups so JVM/codegen startup isn't billed to the first queries: a
    // trivial scan, plus a 64-doc run of the tokenize→shingle→hash pipeline
    // (first execution pays regex + whole-stage-codegen + JIT compilation
    // that is otherwise charged to whichever documents query runs first).
    spark.read.parquet(s"$sfDir/region.parquet").write.format("noop")
      .mode("overwrite").save()
    locally {
      import org.apache.spark.sql.functions._
      import graft.functions.{HashFunctions => H, TextFunctions => T}
      spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
        .select(T.tokenize(col("text")).as("tokens"))
        .select(explode(T.kShingles(col("tokens"), 2)).as("shingle"))
        .groupBy("shingle").count()
        .select(H.md5Hash(lit(0), col("shingle")).as("h"))
        .write.format("noop").mode("overwrite").save()
    }
    // one warmed pass of the Structured Streaming machinery (file source →
    // stateful complete-mode agg → memory sink) so the micro-batch planner,
    // state-store provider, and sink classes JIT here instead of inside the
    // first stream_* gate's measured reps. Best-effort: a warm-up failure
    // (concurrent clobber, unwritable tmpdir) must never abort the bench —
    // it just forfeits the warm start. The dir is per-corpus so concurrent
    // benches at different scale factors cannot clobber each other's
    // staged files mid-stream.
    try {
      import org.apache.spark.sql.functions._
      val tmp = sys.props("java.io.tmpdir") +
        s"/graft-bench-stream-warm-${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
      spark.read.parquet(s"$sfDir/region.parquet").write.mode("overwrite").parquet(tmp)
      val schema = spark.read.parquet(tmp).schema
      val q = spark.readStream.schema(schema).parquet(tmp)
        .groupBy(col("r_regionkey") % 2).count()
        .writeStream.format("memory").queryName("graft_bench_stream_warm")
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      spark.sql("DROP TABLE IF EXISTS graft_bench_stream_warm")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] streaming warm-up skipped: ${e.getMessage}")
    }
    // one throwaway execution of a curate-shaped composite (round-11
    // verdict task 3): the multi-job pipeline class (mojibake repair →
    // per-domain window cap → KN scoring → scalar collect → final filter)
    // launches several Spark jobs per query and pays a distinct JIT/codegen
    // bill that the single-job warm-ups above never touch — historically
    // billed to whichever curate gate ran first (4.7 s settled vs 22.5 s
    // cold in r11). Runs on a staged 256-doc subset so the warm-up stays
    // seconds-bounded at any scale factor. Best-effort like the streaming
    // warm-up: a failure forfeits the warm start, never the bench.
    try {
      val tmp = sys.props("java.io.tmpdir") +
        s"/graft-bench-curate-warm-${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
      spark.read.parquet(s"$sfDir/documents.parquet").limit(256)
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      SparkEntry.queries("pipeline_curate_v6")(spark, tmp)
        .write.format("noop").mode("overwrite").save()
      SparkUtil.releaseScopedCaches()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] curate warm-up skipped: ${e.getMessage}")
    }

    // HOST-CHURN CALIBRATION PROBE (round-18 verdict task 1): a fixed,
    // deterministic, CPU-bound query — an in-memory hash-agg over a
    // generated range, zero I/O, zero shuffle beyond the single-row
    // reduce — timed at suite start, middle, and end and printed as
    // {"calib":[s1,s2,s3]} in the artifact tail. The artifact then
    // self-normalizes: a slowest-20 outlier against a 3× calibration
    // drift reads as host churn; against ~1.0× it reads as a real code
    // regression. Expected quiet-host value: ~2.2 s per probe at 32
    // threads (PERF.md round-19 notes the watch value; the probe is
    // whole-stage-codegen'd xxhash64 over spark.range, so its cost
    // tracks available CPU and nothing else).
    val calibRows = sys.env.get("SPARK_GRAFT_CALIB_ROWS")
      .flatMap(_.toLongOption).getOrElse(3_000_000_000L)
    def calibrate(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      // pmod bounds the summand so the 3e9-row sum stays inside a long
      // under ANSI mode; xxhash64 carries the CPU load
      val r = spark.range(0L, calibRows, 1L, cpus.toInt)
        .select(sum(pmod(xxhash64(col("id")), lit(1000000L))).as("h"))
        .collect()(0).getLong(0)
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] calib $dt%.3f s (checksum $r)")
      dt
    }
    val calib = scala.collection.mutable.ArrayBuffer.empty[Double]
    calib += calibrate()

    // min of N reps per query: single-shot numbers on a shared host carry
    // ±2× scheduler/JIT noise; the minimum is the standard steady-state
    // estimator and stays honest (every rep does the full work — caches are
    // swept between reps).
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS")
      .flatMap(_.toIntOption).getOrElse(2).max(1)
    // per-query shuffle read/write rides along with the seconds: the ladder
    // claims ("decision shuffles are hash/int-sized") are re-validated by
    // every bench run, not re-measured ad hoc (round-10 verdict task 5)
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    // local-iteration / scale-validation escape hatch (the Verify
    // SPARK_GRAFT_ONLY convention): SPARK_GRAFT_BENCH_ONLY=q1,q2 benches a
    // subset — used by the sf1 flagship validation run
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach(o => System.err.println(
      s"[bench] *** SPARK_GRAFT_BENCH_ONLY ACTIVE — ${o.size} queries ***"))
    // reps policy (round-19 verdict task 7): min-of-N for EVERY query,
    // including the slowest bucket. The round-17 single-shot carve-out for
    // ≥5 s gates saved ~10 min of suite wall but made the slowest-20 —
    // exactly the rows regression adjudication reads — single-sample on a
    // host whose single-shot readings swing up to 8×; three rounds of
    // churn-vs-regression ambiguity cost more than the carve-out saved.
    // The env knob restores a floor (gates whose first rep lands at or
    // above it report single-shot) for local iteration.
    val singleRepFloor = sys.env.get("SPARK_GRAFT_BENCH_SINGLE_REP_FLOOR")
      .flatMap(_.toDoubleOption).getOrElse(Double.MaxValue)
    val benched = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val midAt = benched.size / 2
    val results = benched.zipWithIndex.map { case ((name, fn), qi) =>
      if (qi == midAt && qi > 0) calib += calibrate() // mid-suite probe
      var bestT = Double.MaxValue
      var bestShuf = (0L, 0L)
      // iterator, not Range.takeWhile: a strict Range evaluates the
      // predicate for every element up front (bestT still MaxValue), so
      // the adaptive cut would never engage
      (1 to reps).iterator.takeWhile(r => r == 1 || bestT < singleRepFloor ||
          bestT == Double.MaxValue /* failed rep: keep retrying */).foreach { _ =>
        meter.reset()
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        val shuf = meter.settle(spark.sparkContext)
        // each query fits/caches its own index; drop it so later queries are
        // measured against a clean storage pool, not a 60-query cache
        // backlog. clearCache covers Dataset caches; the RDD sweep catches
        // anything persisted below the Dataset layer. All engine persists
        // are recomputable (no truncated-lineage checkpoints), so the sweep
        // is always safe. blocking: an async sweep would still be evicting
        // blocks inside the next rep's timed region.
        SparkUtil.releaseScopedCaches() // drain the scoped-cache registry first
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        if (ok && dt < bestT) { bestT = dt; bestShuf = shuf }
      }
      (name, if (bestT < Double.MaxValue) bestT else -1.0, bestShuf)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // [readMB, writeMB] per query, from the rep that produced the reported
    // minimum (bytes are plan-determined and rep-stable; pairing them with
    // the kept rep keeps the row self-consistent)
    val shufs = results.map { case (k, _, (r, w)) =>
      "\"" + k + "\":[" + f"${r / 1e6}%.3f" + "," + f"${w / 1e6}%.3f" + "]"
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum
    // shuffle_mb rides on its OWN line, printed FIRST (round-19 verdict
    // task 8): the driver retains only the TAIL of this process's output,
    // and r15–r18 lost their per-query dicts because shuffle_mb tripled
    // the contract line past the retained window. Shuffle bytes are the
    // expendable prefix; the contract line below stays small enough to
    // survive any plausible tail window.
    println(f"""{"metric":"shuffle_mb_detail","shuffle_mb":$shufs,"sf":"$sfDir"}""")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    // repeat the total LAST so every BENCH_r*.json tail carries it even if
    // the window is tiny
    println(f"""{"total":$total%.3f,"unit":"sec","n_queries":${results.size},"sf":"$sfDir"}""")
    // round-over-round regression adjudication from the artifact alone
    // (round-17 verdict task 1): the driver's tail window keeps only the
    // last few lines, so the top-20 slowest queries — the only ones whose
    // movement can explain a total swing — are repeated here compactly.
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(20)
      .map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"slowest":$slowest}""")
    // suite-end calibration probe, then the tail line the regression scan
    // divides the slowest-20 by before claiming anything (quiet host:
    // every element near the PERF.md watch value and flat across the
    // suite; a churned host shows inflated and/or wildly uneven probes)
    calib += calibrate()
    val calibJson = calib.map(v => f"$v%.3f").mkString("[", ",", "]")
    println(s"""{"calib":$calibJson,"calib_rows":$calibRows}""")
    spark.stop()
  }
}
