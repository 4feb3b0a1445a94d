package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // Default to the whole box: the round-10 sf10 sweep silently ran its
    // first wave on local[4] (an eighth of a 32-core host) because the old
    // default mirrored the driver's sf0.01 setting. Correctness output is
    // parallelism-invariant (every query's row order is deterministic),
    // so the only effect of more cores is wall-clock.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    System.err.println(s"[verify] running local[$cpus] on $sfDir")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Scale sweeps read SINGLE parquet files per table; the default
      // 128 MiB maxPartitionBytes gives a 500 MiB sf100 documents file
      // only 4 input splits, and every codegen stage PIPELINED onto that
      // scan (explode → join → agg) inherits 4-way parallelism on a
      // 32-core box (round-11 finding: sf100 stage 172 ran exactly 4
      // tasks for 70+ minutes — the round-9 parallelism-inheritance class
      // at the scan itself, where no repartition sits upstream to fix
      // it). 16 MiB is the same knob a real cluster tunes for its
      // executor count; tiny driver fixtures still get 1 split.
      .config("spark.sql.files.maxPartitionBytes", (16L * 1024 * 1024).toString)
      // same AQE coalescing floor as Bench (see Bench.scala): keeps
      // CPU-dense reduce stages at the session's parallelism on small
      // inputs; inert at scale where partitions exceed the advisory size
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE", "128k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional comma-separated query filter (as in Bench) for targeted
    // re-verification of new queries at expensive scale factors
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // Resumable scale sweeps: with SPARK_GRAFT_RESUME=1, skip any query
    // whose output already landed (Spark writes _SUCCESS last) — a
    // multi-hour sf10+ run that dies (round-11: the OOM killer took the
    // JVM mid-sweep when a co-tenant DuckDB compare ballooned) restarts
    // where it left off instead of from zero.
    val resume = sys.env.get("SPARK_GRAFT_RESUME").contains("1")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // written BEFORE the query loop: an overlapped oracle sweep
    // (dev/sweep_overlap.sh) needs the twin SQL as soon as the first
    // query output lands, and a sweep the OOM killer interrupts must
    // still leave the compare side runnable.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .filter { case (name, _) =>
        val done = resume &&
          Files.exists(Paths.get(s"$outDir/$name/_SUCCESS"))
        if (done) System.err.println(s"[verify] $name already done, skipped")
        !done
      }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(
          f"[verify] $name done in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // queries that persist intermediates (dedup/ANN) must not leak cached
      // blocks into the rest of the session
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
