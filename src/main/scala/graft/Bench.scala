package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark — one JSON line on stdout.
  *
  * Noise protocol (SURVEY §6): queries run in FIXED sorted order,
  * INTERLEAVED round-robin (A,B,C,A,B,C — not A,A,A,B,B,B), ≥5 rounds,
  * reporting each query's min across rounds. Back-to-back reps let one
  * query's JIT/GC/page-cache state leak into its own later reps while
  * a single cold round poisons a neighbor permanently; interleaving
  * spreads transient interference across all queries so the per-query
  * min converges on steady state. Round-over-round comparison showed
  * >2× per-query swings on byte-identical code under the old
  * back-to-back min-of-3; only interleaved minima are trustworthy as a
  * regression signal (and totals remain the most stable headline).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // size-based AQE coalescing (Spark docs' recommended setting):
      // reduce-stage task counts follow advisoryPartitionSizeInBytes
      // instead of defaultParallelism — tiny stages stop paying 32
      // tasks of pure scheduling overhead locally, and at cluster
      // scale partitions stay in the advisory byte range either way
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: initialize codegen, parquet reader, shuffle machinery so
    // per-query timings reflect steady state rather than JVM startup
    spark.range(1000000).selectExpr("sum(id)").collect()
    // partial data dirs (focused scale series) may lack region
    val warmTable =
      if (new java.io.File(s"$sfDir/region.parquet").exists()) "region"
      else "documents"
    spark.read.parquet(s"$sfDir/$warmTable.parquet").count()

    // optional subset (comma-separated names) for focused scale series
    // over partial data dirs (e.g. the documents-only sf10 run)
    val onlyFilter: String => Boolean =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY")
        .map(_.split(",").map(_.trim).toSet)
        .map(s => s.contains(_: String)).getOrElse(_ => true)
    val names = SparkEntry.queries.keys.toSeq.filter(onlyFilter).sorted // fixed order every round
    val best = scala.collection.mutable.Map.empty[String, Double]
    // rep-1 (cold) time per query, reported beside the min: probe
    // queries whose first rep builds/loads index state show their
    // cold-serving cost without it ever being conflated with the
    // steady-state minima the contract line reports
    val cold = scala.collection.mutable.Map.empty[String, Double]
    // a throwing query must NOT hide as a fast time-to-fail number: its
    // error is carried into the JSON and fails the run (non-zero exit)
    val errs = scala.collection.mutable.Map.empty[String, String]
    for (_ <- 1 to reps; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          errs(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
      }
      val sec = (System.nanoTime() - t0) / 1e9
      if (!cold.contains(name)) cold(name) = sec
      best.updateWith(name)(prev => Some(prev.fold(sec)(math.min(_, sec))))
    }
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\n\\r\\t]", " ") + "\""
    val qs = names.map(k => s"\"" + k + "\":" + best(k)).mkString("{", ",", "}")
    val errJson = errs.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + jstr(v) }.mkString("{", ",", "}")
    val total = names.map(best).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir","reps":$reps}"""
    // informational lines FIRST (cold rep-1 times + short summary) —
    // the full contract line must be the LAST stdout line so any
    // tail-anchored capture recovers the per-query map (r13/r14 lost
    // per-query regression tracking to a trailing summary line)
    val coldQs = names.map(k => s"\"" + k + "\":" + cold(k)).mkString("{", ",", "}")
    println(s"""{"metric":"cold_rep1","queries_rep1":$coldQs,"sf":"$sfDir"}""")
    println(s"""{"bench_total":$total,"n":${names.size},"n_errors":${errs.size},"sf":"$sfDir","reps":$reps}""")
    // a whole-file copy is always parseable regardless of any
    // capture-window size (belt and braces beside the stdout contract)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception => System.err.println(s"bench_out write failed: $e") }
    spark.stop()
    println(line)
    if (errs.nonEmpty) {
      System.err.println(s"BENCH FAILED: ${errs.size} queries threw: ${errs.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
