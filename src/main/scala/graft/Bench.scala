package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the scale-factor dir
  * given by SPARK_GRAFT_SF_DIR (default sf0.1) and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},
  *   "heavy":{...},"failed":[...],"sf":...}`.
  *
  * A warm-up pass (table counts + one full query) runs before any
  * timing so JIT/codegen/classloader costs are not attributed to the
  * first measured query.
  *
  * Failures are LOUD: a query that throws records no timing — it lands
  * in "failed" and the process exits nonzero, so a regression can never
  * masquerade as a fast partial run.
  *
  * The "heavy" section re-times the scale-sensitive queries on an
  * sf1-equivalent input ([[HeavyData]]: key-offset copies of the sf0.1
  * tables). At sf0.1 everything sits on Spark's overhead floor and a
  * plan that recomputes a subtree or joins before filtering is
  * invisible; at ~10x it costs seconds — track these numbers
  * round-over-round. Each heavy query runs in a FRESH forked JVM
  * ([[tools.HeavyRunner]]) with SPARK_GRAFT_HEAVY_N timed runs (default
  * 3) and per-run GC seconds — in-session numbers inherited the main
  * loop's heap/JIT state and were irreproducible (18/56/101 s spreads
  * for identical code). Disable with SPARK_GRAFT_HEAVY=0.
  */
object Bench {

  /** Queries whose cost actually scales with the fact tables — the
    * plan-regression canaries. Scan/agg (q01), selective join chains
    * (q03/q07/q18), the flagship windowed pipeline (e3), session
    * windows over events (w4), the dedup signature + candidate chain
    * (d2/d3 on a near-duplicate-saturated corpus), brute-force ANN
    * (n1). */
  private val heavyQueries = Seq("q01_pricing_summary", "q03_shipping",
    "q07_volume_shipping", "q18_large_orders", "e3_pipeline_streams",
    "e4_legacy_poisoning", "w4_session_window", "d2_minhash_sig",
    "d3_lsh_pairs", "d5_ngram_jaccard", "d12_substring_runs",
    "d14_chunk_dedup", "n1_ann_topk", "n5_ann_kmeans",
    "t17_bigram_familiarity",
    // round 5: the partsupp stand-in aggregation (the widest new
    // exchange), cell-blocked pairwise dedup on the near-dup-saturated
    // corpus, and the corpus-as-codes PQ scan
    "q02_min_cost_supplier", "d16_semantic_dedup", "n8_ann_pq",
    // round 5b: the composed FineWeb chain (verify feeds clustering —
    // the production dedup job) and the bloom-prefiltered
    // decontamination (codegen probe at scan speed + exact verify)
    "e6_dedup_pipeline", "d17_bloom_decontaminate",
    // the custom-physical-operator top-k next to its declarative twin
    // (n1): same answer, phase-1 shuffle removed
    "n9_ann_topk_local")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val heavyCopies = sys.env.getOrElse("SPARK_GRAFT_HEAVY", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val failed = scala.collection.mutable.ListBuffer[String]()

    /** One timed run; None (and a failure record) if the query threw. */
    def once(name: String, dir: String): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir).count()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed += name
          None
      }
    }

    // ---- warm-up (untimed) ----
    Tables.all.foreach(n => Tables.load(spark, sfDir, n).count())
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()

    // ---- timed runs, stable order, best-of-3 (variance control:
    // co-tenant noise/GC spikes were observed surviving best-of-2) ----
    val results = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val runs = Seq(once(name, sfDir), once(name, sfDir), once(name, sfDir)).flatten
      if (runs.size == 3) Some(name -> runs.min) else None
    }

    // ---- heavy tier: FRESH JVM per query, n timed runs each, GC
    // seconds recorded per run. In-session heavy numbers inherit the
    // main loop's JVM/heap/JIT state and were measured 18/56/101 s for
    // the same code — the fork is what makes the flagship's scale
    // numbers reproducible. Falls back to in-session best-of-2 only if
    // the compiled-classes dir can't be located (e.g. assembly run). ----
    case class HeavyResult(name: String, walls: Seq[Double], gcs: Seq[Double],
                           loads: Seq[Double], cpus: Seq[Double])
    val heavyN = sys.env.getOrElse("SPARK_GRAFT_HEAVY_N", "3").toInt
    val heavy: Seq[HeavyResult] = if (heavyCopies > 1) {
      val heavyDir = sys.env.getOrElse("SPARK_GRAFT_HEAVY_DIR",
        s"/tmp/graft_heavy_x$heavyCopies")
      HeavyData.ensure(spark, sfDir, heavyDir, heavyCopies)
      val classes = new java.io.File("target/scala-2.13/classes").getAbsoluteFile
      if (classes.isDirectory) {
        val javaBin = new java.io.File(
          new java.io.File(sys.props("java.home"), "bin"), "java").getPath
        val cp = classes.getPath + java.io.File.pathSeparator + "/opt/spark/jars/*"
        heavyQueries.flatMap { q =>
          val cmd = Seq(javaBin) ++ tools.HeavyRunner.jdk17AddOpens ++ Seq(
            s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
            "-cp", cp, "graft.tools.HeavyRunner", heavyDir, heavyN.toString, q)
          val pb = new ProcessBuilder(cmd: _*)
          pb.redirectError(ProcessBuilder.Redirect.INHERIT)
          val proc = pb.start()
          val out = scala.io.Source.fromInputStream(proc.getInputStream).mkString
          val code = proc.waitFor()
          val parsed = out.linesIterator
            .find(l => l.startsWith("HEAVY\t") && l.split("\t")(1) == q)
            .map { l =>
              val f = l.split("\t")
              def opt(i: Int) = f.lift(i)
                .map(_.split(",").toSeq.map(_.toDouble)).getOrElse(Seq.empty)
              HeavyResult(q, f(2).split(",").toSeq.map(_.toDouble),
                f(3).split(",").toSeq.map(_.toDouble), opt(4), opt(5))
            }
          if (code != 0 || parsed.isEmpty) {
            System.err.println(s"[bench] heavy $q runner FAILED (exit $code)")
            failed += q
          }
          parsed
        }
      } else {
        System.err.println("[bench] no classes dir; heavy tier in-session")
        SparkEntry.clearCaches(spark)
        spark.catalog.clearCache()
        System.gc()
        Tables.load(spark, heavyDir, "lineitem").count()
        heavyQueries.flatMap { n =>
          // same query semantics as the fork path: resolve() swaps in
          // the heavy variants (persisted e3/e4 fixtures, production
          // d16 config) — SparkEntry.queries here would time DIFFERENT
          // work under the same JSON key
          def one(): Option[Double] = {
            // untimed, BETWEEN runs: let the ContextCleaner drop dead
            // shuffle/broadcast state (the cleaner-starvation effect
            // HeavyRunner documents — big heaps may never GC on their
            // own and consecutive big-shuffle runs multiply in cost)
            System.gc()
            val t0 = System.nanoTime()
            try {
              tools.HeavyRunner.resolve(n)(spark, heavyDir)
                .write.format("noop").mode("overwrite").save()
              Some((System.nanoTime() - t0) / 1e9)
            } catch {
              case e: Throwable =>
                System.err.println(s"[bench] heavy $n FAILED: ${e.getMessage}")
                failed += n
                None
            }
          }
          val runs = Seq(one(), one()).flatten
          if (runs.nonEmpty)
            Some(HeavyResult(n, runs, Seq.empty, Seq.empty, Seq.empty))
          else None
        }
      }
    } else Seq.empty

    def obj(kv: Seq[(String, Double)]) =
      kv.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def arrObj(kv: Seq[(String, Seq[Double])]) =
      kv.map { case (k, v) => "\"" + k + "\":" + v.mkString("[", ",", "]") }
        .mkString("{", ",", "}")
    val failedJson = failed.distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // heavy value = min wall; heavy_gc = GC seconds of that same run;
    // heavy_runs/heavy_gc_runs = the full series for variance checks.
    val heavyMin = heavy.map(h => h.name -> h.walls.min)
    val heavyGc = heavy.collect { case h if h.gcs.nonEmpty =>
      h.name -> h.gcs(h.walls.indexOf(h.walls.min)) }
    println(s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":${obj(results)},"heavy":${obj(heavyMin)},""" +
      s""""heavy_gc":${obj(heavyGc)},""" +
      s""""heavy_runs":${arrObj(heavy.map(h => h.name -> h.walls))},""" +
      s""""heavy_gc_runs":${arrObj(heavy.map(h => h.name -> h.gcs))},""" +
      s""""heavy_load_runs":${arrObj(heavy.map(h => h.name -> h.loads))},""" +
      s""""heavy_cpu_runs":${arrObj(heavy.map(h => h.name -> h.cpus))},""" +
      s""""heavy_n":$heavyN,""" +
      s""""heavy_copies":$heavyCopies,"failed":$failedJson,"sf":"$sfDir"}""")
    SparkEntry.clearCaches(spark)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
