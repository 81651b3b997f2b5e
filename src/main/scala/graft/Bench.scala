package graft


/** Driver benchmark: one timed pass over every SURVEY §2 query at
  * SPARK_GRAFT_SF_DIR, after warming the session (FS cache, JIT,
  * parquet footers) so per-query numbers reflect steady-state cost
  * rather than first-touch overhead.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // One engine posture everywhere: the timings must come from the
    // same session config graft.engine.Session defines.
    val spark = graft.engine.Session
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt,
        appName = "graft-bench")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }

    // Optional comma-separated query filter for local iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    val catalog = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }

    // Steady-state warmup: run every (selected) query once at the
    // smallest SF so the timed pass measures query cost, not
    // first-touch JIT/codegen compilation (generated-code cache is
    // keyed by source, so the sfDir pass reuses compiled classes).
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    // Canonical-path compare: trailing slashes, relative paths, or
    // symlinks must not defeat the warmDir == sfDir guards (a raw
    // string compare would subtract the stream-startup baseline from
    // timings measured on the same data, clamping streaming keys to 0).
    def canon(p: String): String =
      try new java.io.File(p).getCanonicalPath catch { case _: Throwable => p }
    val warmIsTimed = canon(warmDir) == canon(sfDir)
    if (new java.io.File(warmDir).isDirectory && !warmIsTimed)
      catalog.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => }
        spark.catalog.clearCache()
      }

    // Streaming keys pay a fixed micro-batch pipeline cost per
    // start() — source discovery, memory-sink setup, trigger
    // scheduling — that is session overhead, not per-row processing,
    // and does not shrink with data size. Measure it once as the
    // best-of-3 time of a no-op stream over the (tiny) warm dir and
    // report streaming keys net of it; the baseline itself is
    // published in the JSON so nothing is hidden (BENCH_NOTES.md).
    val streamingKeys = Set("c9_stream_window", "c10_stream_dedup",
      "c12_stream_enrich", "c22_stream_join", "c24_stream_ewma",
      "c25_stream_quality", "c26_stream_neardup")
    // Guards: the baseline is only meaningful when the timed queries
    // read a different (larger) source than the warm dir it is
    // measured on — at sfDir == warmDir the subtraction would clamp
    // every streaming key to ~0 — and it is wasted work when the
    // SPARK_GRAFT_ONLY filter selects no streaming key at all.
    val streamStartup: Double =
      if (!warmIsTimed &&
          catalog.exists { case (n, _) => streamingKeys(n) } &&
          new java.io.File(s"$warmDir/events.parquet").exists) {
        (1 to 3).map { i =>
          val t0 = System.nanoTime()
          try graft.streaming.StreamingOps.runToTable(
            graft.streaming.StreamingOps.readEventsStream(spark, warmDir)
              .select("event_id"),
            spark, s"bench_stream_noop_$i", "append").count()
          catch { case _: Throwable => }
          (System.nanoTime() - t0) / 1e9
        }.min
      } else 0.0

    // Best-of-N timing (min per query across passes): a query's cost
    // is a property of the plan, not of whatever else the host was
    // doing during one pass; the pass count is reported in the JSON.
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    require(passes >= 1, s"SPARK_GRAFT_PASSES must be >= 1, got $passes")
    // Banding-tuner attribution: per (pass, key), how many tuner
    // sampling runs vs memo hits the query triggered and what the
    // runs cost. A healthy steady state shows runs only in pass 1
    // (memo hits after); runs in pass >= 2 mean one-off tuning cost
    // is leaking into the best-of-N min (the r9 d14 regression
    // pattern — see BENCH_NOTES.md).
    val tunerByPass =
      collection.mutable.Map.empty[String, Vector[(Long, Long, Double)]]
    val timings = (1 to passes).map { _ =>
      catalog.map { case (name, fn) =>
        val tb = graft.dedup.Dedup.tunerStats
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch {
            case e: Throwable =>
              System.err.println(s"BENCH FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
              false
          }
        // Per-query persists must not accumulate across the run —
        // cached tables from one query would squeeze executor memory
        // for the next (untimed bookkeeping, after the clock stops).
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        val td = graft.dedup.Dedup.tunerStats - tb
        // Every pass appends (quiet passes as zeros) so vector index
        // == pass number stays truthful; keys that never touched the
        // tuner are filtered out at emission.
        tunerByPass(name) = tunerByPass.getOrElse(name, Vector.empty) :+
          ((td.runs, td.memoHits, td.nanos / 1e9))
        (name, dt, ok)
      }
    }
    val results = timings.transpose.map { rs =>
      val raw = rs.map(_._2).min
      val net = if (streamingKeys(rs.head._1))
        math.max(raw - streamStartup, 0.0) else raw
      (rs.head._1, net, rs.forall(_._3))
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val tuner = tunerByPass.toSeq.sortBy(_._1)
      .filter(_._2.exists(v => v._1 > 0 || v._2 > 0))
      .map { case (k, vs) =>
        val runs = vs.map(_._1).mkString("[", ",", "]")
        val hits = vs.map(_._2).mkString("[", ",", "]")
        // locale-independent formatting: an f"%.3f" under a
        // comma-decimal locale would corrupt the machine-parsed JSON
        val secs = vs.map(v => (math.round(v._3 * 1000) / 1000.0).toString)
          .mkString("[", ",", "]")
        s"\"" + k + s"\":{\"runs\":$runs,\"memo_hits\":$hits,\"tune_sec\":$secs}"
      }.mkString("{", ",", "}")
    // Testdata provenance: the driver regenerated /root/testdata
    // mid-round-10 (ts encoding changed), which makes cross-generation
    // bench comparisons silently meaningless. Fingerprint the input
    // files (name, size, mtime-ms — content-stable enough to detect a
    // regeneration, cheap enough to run every bench) so any two
    // BENCH_*.json are comparable iff their fingerprints match.
    val fp = {
      val files = Option(new java.io.File(canon(sfDir)).listFiles())
        .getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      val desc = files.map(f => s"${f.getName}:${f.length}:${f.lastModified}")
        .mkString("\n")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(desc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.map("%02x".format(_)).mkString
    }
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"passes":$passes,"stream_startup":$streamStartup,"tuner":$tuner,"sf":"$sfDir","testdata_fp":"$fp"}"""
    println(json)
    // Persist the complete per-query map: stdout capture can truncate
    // (round-3's file lost the tail of the 90-key line), a file can't.
    // The default filename carries the SF-dir basename (BENCH_sf0.1
    // .json, BENCH_sf1.0.json, ...) so a run at one SF can never
    // silently clobber the committed baseline of another — the exact
    // gotcha BENCH_NOTES.md documents from rounds 6 and 7.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      s"BENCH_${new java.io.File(canon(sfDir)).getName}.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
