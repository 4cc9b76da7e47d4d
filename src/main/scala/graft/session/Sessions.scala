package graft.session

import org.apache.spark.sql.SparkSession

/** SparkSession factory.
  *
  * Capability parity with the reference's session factory
  * (`utils/spark_session_creator.py:10-68`): the reference builds a
  * YARN+Hive session from a per-table resource config (executor
  * instances/memory/cores, shuffle partitions). Here the same knobs are
  * exposed as a plain config map; the `local` profile is what tests and
  * the driver use, the `cluster` profile documents the settings a real
  * 1000-executor deployment would submit with (master/resources come from
  * spark-submit, not code).
  */
object Sessions {

  /** Defaults shared by all profiles. AQE replaces most of the reference's
    * hand-tuned `spark.sql.shuffle.partitions` plumbing
    * (`raw_load.py:19`, `daily_load.py:28`, `history_load.py:39`):
    * partition coalescing and skew-join splitting re-plan at runtime,
    * which is what actually survives a 100x scale-up.
    */
  private val common: Seq[(String, String)] = Seq(
    "spark.sql.session.timeZone" -> "UTC",
    // Whole-stage-codegen class cache (STATIC conf — takes effect only
    // at session build). The 100-entry default thrashes on any
    // many-query workload: one pass of this engine's 281-query suite
    // pushes ~3000 generated classes through it, so by the time a
    // query's NEXT pass runs its classes are long evicted and every
    // pass pays Janino recompilation plus a cold-JIT execution of the
    // fresh classes (round-10 measurement: the same pageRank run is
    // 3.5 s with warm classes, 7.5-8.3 s after an eviction — the
    // round-9 "graph family swings 2.6x on an unchanged plan" mystery
    // in full). Sized to hold the whole suite's classes; a long-lived
    // production driver wants the same headroom.
    "spark.sql.codegen.cache.maxEntries" -> "8192",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.parquet.compression.codec" -> "snappy",
    // Older driver-testdata generations wrote events.ts as a parquet
    // NANOS timestamp, which Spark's vectorized reader rejects; this
    // reads it as a long that Tables.load / SparkEntry.eventsStream
    // truncate to µs. Newer generations write MICROS (unaffected by
    // this flag). Set once here so no query builder mutates session
    // state as a side effect.
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    // Benchmarks/tests run many short-lived stateful streaming queries;
    // the background state-store maintenance task races session shutdown
    // and spews RpcEnv-stopped stack traces into stdout. One-shot
    // AvailableNow queries don't need maintenance — push it out past any
    // plausible run length.
    "spark.sql.streaming.stateStore.maintenanceInterval" -> "3600s",
    // One-shot AvailableNow streams emit everything in their data
    // batches (append joins/dedup emit on arrival; complete/update
    // sinks emit per data batch; the only declared stateful op with
    // timeouts, upsertWithTtl, is not wired to a no-data dependency).
    // The trailing no-data micro-batch would only purge state that the
    // imminent stop discards anyway — skipping it saves a full round of
    // per-partition state-store commits per streaming query.
    "spark.sql.streaming.noDataMicroBatches.enabled" -> "false",
    // The reference disables auto-broadcast for the history job so its
    // only broadcast is the explicit hint (`history_load.py:40`). We keep
    // auto-broadcast ON globally (dimension tables at any SF are tiny)
    // and rely on explicit broadcast() hints where the optimizer cannot
    // know the small side is small.
    "spark.sql.autoBroadcastJoinThreshold" -> (64L * 1024 * 1024).toString
  )

  /** Scratch root for shuffle spills and streaming checkpoints: prefer
    * RAM-backed /dev/shm when writable — stateful streaming commits
    * hundreds of small state-store files per micro-batch, which cost
    * disk round trips on /tmp and microseconds on tmpfs — falling back
    * to java.io.tmpdir. Unique per JVM; removed on exit (checkpoints
    * resolved under a conf root are not auto-deleted by Spark).
    */
  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(): Unit
  }

  private lazy val scratchRoot: String = {
    val shm = new java.io.File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) shm
               else new java.io.File(sys.props("java.io.tmpdir"))
    // sweep siblings a dead JVM left behind (halt() skips hooks; a hook
    // can also race still-writing executor threads and lose): anything
    // older than an hour is not a live session's scratch
    Option(base.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.getName.startsWith("graft-scratch-") &&
          f.lastModified < System.currentTimeMillis() - 3600L * 1000) rmTree(f)
    }
    val dir = new java.io.File(base, s"graft-scratch-${java.util.UUID.randomUUID()}")
    dir.mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      rmTree(dir)
      if (dir.exists) rmTree(dir) // once more if a late writer raced the sweep
    }))
    dir.getAbsolutePath
  }

  /** A path under this JVM's scratch root (tmpfs when available) — for
    * per-run staging that should be fast, survive across benchmark
    * passes within the JVM, and vanish with it.
    */
  def scratchPath(sub: String): String = s"$scratchRoot/$sub"

  /** Delete this JVM's scratch dir immediately — for mains that end in
    * `Runtime.halt` (which skips shutdown hooks, e.g. Bench's
    * clean-last-line discipline). Idempotent; tmpfs scratch must not
    * outlive the run that created it.
    */
  def cleanupScratch(): Unit = rmTree(new java.io.File(scratchRoot))

  /** Confs for sessions graft itself builds (local, TestSpark) — NOT
    * part of [[common]]/[[tuned]], because tuned() feeds an EXTERNAL
    * builder: overwriting `spark.sql.extensions` there would silently
    * drop a deployment's own extension (Delta, Iceberg, ...), and
    * force-enabling the window guard would turn a user job's working
    * global window into a hard optimizer failure. External deployments
    * opt in per job: `--conf spark.sql.extensions=graft.ext.GraftExtensions
    * --conf spark.graft.failOnGlobalWindow=true`.
    */
  val graftManaged: Seq[(String, String)] = Seq(
    // native-kernel SQL functions + the GlobalWindowGuard scale lint;
    // the guard conf is ON so each Verify/Bench/test run re-proves the
    // "no unbounded global windows" discipline
    "spark.sql.extensions" -> "graft.ext.GraftExtensions",
    "spark.graft.failOnGlobalWindow" -> "true")

  /** Local profile. `streamIntegrity` (default ON) keeps Spark 4.1's
    * checkpoint-file checksums and state-commit validation — the
    * correctness gate (Verify) and tests run with every safety net the
    * cluster profile has. The BENCH-flavored entrypoints (Bench, Time,
    * the profiling tools) pass `streamIntegrity = false`: Spark 4.1
    * defaults every checkpoint-file write to a paired checksum file
    * (create + write + rename twice per state delta / offset / commit
    * log entry) plus a per-commit validation round-trip, and on tmpfs
    * checkpoints that machinery — not the engine — is the dominant
    * stateful micro-batch floor (measured round 11: see README bench
    * notes). Scoping the override to the bench flavor means the
    * published numbers measure the engine while verify runs keep the
    * integrity checks (round-11 advice).
    */
  def local(cores: Int = 32, shufflePartitions: Int = 32,
            appName: String = "graft",
            streamIntegrity: Boolean = true): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.ui.enabled", "false")
      // unique warehouse per session: the catalog is in-memory (gone on
      // exit) but saveAsTable locations persist on disk — a stale dir
      // from a previous run would fail the next run's CREATE TABLE with
      // LOCATION_ALREADY_EXISTS
      .config("spark.sql.warehouse.dir",
        s"target/tmp/warehouse-${java.util.UUID.randomUUID()}")
      .config("spark.local.dir", s"$scratchRoot/local")
      .config("spark.sql.streaming.checkpointLocation", s"$scratchRoot/ckpt")
    if (!streamIntegrity) {
      b.config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      b.config("spark.sql.streaming.stateStore.commitValidation.enabled", "false")
    }
    common.foreach { case (k, v) => b.config(k, v) }
    graftManaged.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    quietCheckpointRelease()
    spark
  }

  /** The bench flavor: identical to [[local]] with the streaming
    * integrity-check overhead scoped OUT (see the `streamIntegrity`
    * doc above) — the flavor every published number comes from.
    */
  def localBench(cores: Int = 32, shufflePartitions: Int = 32,
                 appName: String = "graft-bench"): SparkSession =
    local(cores, shufflePartitions, appName, streamIntegrity = false)

  /** Iterative operators (Cluster.connectedComponents) deterministically
    * release dead localCheckpoint blocks each round; Spark logs a WARN
    * per release ("lineage has been truncated...") aimed at accidental
    * unpersists. Ours are intentional — the frames are provably dead —
    * so silence that one logger rather than spamming every run.
    */
  def quietCheckpointRelease(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD", org.apache.logging.log4j.Level.ERROR)

  /** Apply graft defaults to an externally-created session builder —
    * the path a spark-submit cluster deployment uses.
    */
  def tuned(b: SparkSession.Builder): SparkSession.Builder = {
    // NOTE deliberately NOT graftManaged (see its scaladoc) and NOT
    // quietCheckpointRelease (process-global logger change — graft's
    // own sessions accept that tradeoff, an external app must not have
    // its MapPartitionsRDD warnings silenced as a side effect of
    // borrowing conf defaults)
    common.foreach { case (k, v) => b.config(k, v) }
    b
  }
}
