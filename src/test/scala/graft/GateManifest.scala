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
        val body = txt.substring(sIdx + "\"stream\":{".length)
        ("\"([A-Za-z0-9_]+)\":\\{\"n_triggers\":(\\d+),\"data_triggers\":(\\d+)," +
          "\"input_rows\":(\\d+),\"state_ops\":(\\d+)").r
          .findAllMatchIn(body)
          .map(m => m.group(1) ->
            s"""{"n_triggers":${m.group(2)},"state_ops":${m.group(5)}}""")
          .toMap
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
