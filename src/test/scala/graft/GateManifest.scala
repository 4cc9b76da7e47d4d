package graft

/** Self-describing gate manifest: one JSON object per declared query —
  * oracle-SQL md5, plan-shape metrics (from the PlanGate golden), and
  * the latest bench median — so rounds can be diffed MECHANICALLY
  * (`git diff MANIFEST.json`) instead of via README prose: an oracle
  * edit, a plan-shape change, or a >noise bench move each shows up as
  * a one-line diff naming the query.
  *
  * Regenerate after a bench run:
  * `sbt "Test/runMain graft.GateManifest"` (reads
  * `src/test/resources/plan-metrics-sf0.001.json` and
  * `target/bench-latest.json`; bench medians are omitted if no bench
  * has run). InventorySpec pins that the manifest, when present,
  * covers exactly the declared inventory.
  */
object GateManifest {

  val path = "MANIFEST.json"

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** `"name": {...}` lines of the plan-metrics golden. */
  private def planLines(): Map[String, String] = {
    val f = new java.io.File(PlanMetrics.goldenPath)
    if (!f.exists()) Map.empty
    else java.nio.file.Files.readString(f.toPath).linesIterator.flatMap { l =>
      "^\"([A-Za-z0-9_]+)\": (\\{.*\\}),?$".r.findFirstMatchIn(l.trim)
        .map(m => m.group(1) -> m.group(2))
    }.toMap
  }

  /** Per-query medians from the headline map in bench-latest.json. */
  private def benchMedians(): Map[String, String] = {
    val f = new java.io.File("target/bench-latest.json")
    if (!f.exists()) Map.empty
    else {
      val txt = java.nio.file.Files.readString(f.toPath)
      val qIdx = txt.indexOf("\"queries\":{")
      if (qIdx < 0) Map.empty
      else {
        val start = qIdx + "\"queries\":{".length
        val end = txt.indexOf('}', start)
        "\"([A-Za-z0-9_]+)\":(-?[0-9.]+)".r
          .findAllMatchIn(txt.substring(start, end))
          .map(m => m.group(1) -> m.group(2)).toMap
      }
    }
  }

  /** Streaming shape pins from the bench's trigger-phase section:
    * micro-batch count and stateful-operator count per query. These are
    * the plan-shape equivalent for streams (the batch PlanGate cannot
    * see a streaming query's physical plan — it replans per trigger),
    * so a dropped watermark/stateful operator or a changed staging
    * split shows up as a MANIFEST diff and fails InventorySpec's
    * coverage pin.
    */
  private def streamShapes(): Map[String, String] = {
    val f = new java.io.File("target/bench-latest.json")
    if (!f.exists()) Map.empty
    else {
      val txt = java.nio.file.Files.readString(f.toPath)
      val sIdx = txt.indexOf("\"stream\":{")
      if (sIdx < 0) Map.empty
      else {
        // bound at the section's close (entries are flat objects, so
        // the first "}}"): objects after a future trailing field must
        // not leak into the shape map
        val rest = txt.substring(sIdx + "\"stream\":{".length)
        val close = rest.indexOf("}}")
        val body = if (close >= 0) rest.substring(0, close + 1) else rest
        // fields parsed INDIVIDUALLY per query object — a pin to
        // Bench's exact field ORDER silently yielded zero records on
        // any reorder/insertion, which (pre-round-12) erased the
        // stream-shape gate without a signal (round-11 advice)
        val parsed = "\"([A-Za-z0-9_]+)\":\\{([^}]*)\\}".r
          .findAllMatchIn(body)
          .flatMap { m =>
            def field(k: String): Option[String] =
              ("\"" + k + "\":(\\d+)").r.findFirstMatchIn(m.group(2)).map(_.group(1))
            for (t <- field("n_triggers"); ops <- field("state_ops"))
              yield m.group(1) -> s"""{"n_triggers":$t,"state_ops":$ops}"""
          }.toMap
        require(body.trim.startsWith("}") || parsed.nonEmpty,
          "bench-latest.json has a non-empty stream section but zero " +
            "records parsed — Bench's streamJson format drifted; fix " +
            "streamShapes() before regenerating MANIFEST")
        parsed
      }
    }
  }

  def render(): String = {
    val plans = planLines()
    val bench = benchMedians()
    val streams = streamShapes()
    val rows = SparkEntry.oracleSql.toSeq.sortBy(_._1).map { case (name, sql) =>
      val parts = Seq(
        Some("\"oracle_md5\":\"" + md5(sql) + "\""),
        plans.get(name).map(p => "\"plan\":" + p),
        streams.get(name).map(s => "\"stream\":" + s),
        bench.get(name).map(b => "\"bench_median_s\":" + b)
      ).flatten.mkString(",")
      "\"" + name + "\": {" + parts + "}"
    }
    rows.mkString("{\n", ",\n", "\n}\n")
  }

  def main(args: Array[String]): Unit = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), render())
    println(s"wrote $path")
  }
}
