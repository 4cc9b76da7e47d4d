package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract invariant: the declared inventory is 100%
  * oracle-backed — every query has oracle SQL and no oracle is
  * orphaned. A one-sided entry silently downgrades the correctness
  * gate (rows-only check) or is dead weight; fail loudly instead.
  */
class InventorySpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private def sfPresent = new java.io.File(s"$sfDir/lineitem.parquet").exists()

  // One schema pass shared by the array and type-parity canaries:
  // building a query's DataFrame is cheap for batch plans but runs the
  // stream for stream_* entries, so don't pay it twice.
  private lazy val querySchemas: Map[String, org.apache.spark.sql.types.StructType] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(TestSpark.spark, sfDir).schema
    }

  // Oracle result schemas via Spark's own analyzer (no execution):
  // register the sf tables as temp views and analyze each oracle SQL.
  // DuckDB and Spark agree on the numeric kinds this canary compares
  // (COUNT/row_number → bigint, avg/round → double); oracles Spark
  // can't parse are collected as Left and pinned by the allowlist test.
  private lazy val oracleSchemas: Map[String, Either[String, org.apache.spark.sql.types.StructType]] = {
    val spark = TestSpark.spark
    for (f <- new java.io.File(sfDir).listFiles(); if f.getName.endsWith(".parquet"))
      spark.read.parquet(f.getPath)
        .createOrReplaceTempView(f.getName.stripSuffix(".parquet"))
    TypeParity.registerOracleStubs(spark)
    // oracles quote reserved words DuckDB-style ("timestamp")
    spark.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", "true")
    try SparkEntry.oracleSql.map { case (name, sql) =>
      name -> (try Right(spark.sql(TypeParity.duckdbToSpark(sql)).schema)
               catch { case e: Exception =>
                 Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(160)) })
    } finally spark.conf.unset("spark.sql.ansi.doubleQuotedIdentifiers")
  }

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphaned oracles: ${(o -- q).toSeq.sorted}")
  }

  // The round-5 failure mode, pinned: one combinatorially-generated
  // oracle (dedup_winnow, 6.2 MB of SQL, >4 min of DuckDB) blew the
  // driver's correctness-gate budget and zeroed the whole round's
  // signal. SQL size is the proxy we can check in-JVM: an oracle that
  // explodes textually is exactly the nested-re-inlining bug class,
  // and everything hand-written sits orders of magnitude below these
  // caps (round-6 worst: ~20 KB single, ~190 KB total).
  test("gate budget: no oracle SQL above 64 KB, whole set under 512 KB") {
    val sizes = SparkEntry.oracleSql.view.mapValues(_.length).toMap
    val over = sizes.filter(_._2 > 64 * 1024)
    assert(over.isEmpty,
      s"oracle SQL over 64 KB (combinatorial generation?): " +
        over.map { case (n, s) => s"$n=${s / 1024}KB" }.mkString(", "))
    val total = sizes.values.sum
    assert(total <= 512 * 1024,
      s"oracle_sql.json would be ${total / 1024} KB serialized (cap 512 KB) " +
        "— the driver's DuckDB gate has a finite budget; put the biggest " +
        "oracles on a diet before declaring them")
  }

  // The round-6 failure mode, pinned: the driver's comparator sorts
  // result frames with pandas, and a top-level array/map column raises
  // `TypeError: unhashable type: 'numpy.ndarray'` inside sort_values —
  // the row goes ERR and the query's signal is lost (r6:
  // corpus_inverted_index, text_winnow). Declared results must be flat:
  // join/sort/explode or string-join any collection before returning.
  test("gate shape: no declared query returns a top-level array or map column") {
    import org.apache.spark.sql.types.{ArrayType, MapType}
    assume(sfPresent)
    val bad = querySchemas.toSeq.sortBy(_._1).flatMap { case (name, schema) =>
      schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(bad.isEmpty,
      s"array/map-typed output columns crash the driver's pandas " +
        s"comparator (sort_values on ndarray) — flatten or string-join " +
        s"them: ${bad.mkString(", ")}")
  }

  // The rounds-4/6/7 failure mode, pinned: the driver's hasher
  // stringifies values, so an engine column emitted as DOUBLE (20.0)
  // hash-mismatches an oracle COUNT(*) BIGINT (20) even when every
  // value is numerically identical (cdc_churn_stats r4, q12_ship_delay
  // r6, stream_topk r7). Compare integral-vs-floating kind per shared
  // column between the engine schema and the oracle SQL analyzed by
  // Spark itself.
  test("gate types: integral-vs-floating kind parity with each oracle") {
    assume(sfPresent)
    val bad = SparkEntry.queries.keySet.toSeq.sorted.flatMap { name =>
      oracleSchemas(name) match {
        case Right(oschema) => TypeParity.mismatches(querySchemas(name), oschema)
          .map(m => s"$name.$m")
        case Left(_) => Nil // pinned by the allowlist test below
      }
    }
    assert(bad.isEmpty,
      s"integral-vs-floating output kind mismatch vs oracle — the " +
        s"driver's hasher stringifies (20.0 != 20), cast the engine " +
        s"column to the oracle's kind: ${bad.mkString(", ")}")
  }

  // Oracles Spark's analyzer rejects get no type-parity coverage; pin
  // them so a new DuckDB-only construct can't silently opt a query out.
  test("gate types: Spark-unanalyzable oracles match the pinned allowlist") {
    assume(sfPresent)
    val skipped = oracleSchemas.collect { case (n, Left(_)) => n }.toSet
    assert(skipped == TypeParity.duckdbOnlyOracles,
      s"unexpected new unanalyzable oracles ${(skipped -- TypeParity.duckdbOnlyOracles).toSeq.sorted} " +
        s"or stale allowlist entries ${(TypeParity.duckdbOnlyOracles -- skipped).toSeq.sorted}; " +
        s"details: ${oracleSchemas.collect { case (n, Left(e)) if !TypeParity.duckdbOnlyOracles(n) => s"$n: $e" }.mkString("; ")}")
  }

  // Self-test: the canary must actually fire on the class it guards —
  // a planted COUNT(*) oracle (bigint) vs an engine double.
  test("gate types: canary fires on a planted double-vs-bigint query") {
    import org.apache.spark.sql.types._
    val engine = StructType(Seq(StructField("g", StringType), StructField("n", DoubleType)))
    val oracle = StructType(Seq(StructField("g", StringType), StructField("n", LongType)))
    assert(TypeParity.mismatches(engine, oracle).nonEmpty)
    assert(TypeParity.mismatches(oracle, oracle).isEmpty)
  }

  // MANIFEST.json is the mechanical round-diff surface; a query added
  // without regenerating it (sbt "Test/runMain graft.GateManifest")
  // would silently fall out of the diffable record.
  test("gate manifest: MANIFEST.json covers exactly the declared inventory") {
    val f = new java.io.File(GateManifest.path)
    assume(f.exists())
    val names = "^\"([A-Za-z0-9_]+)\": \\{".r
    val inManifest = java.nio.file.Files.readString(f.toPath)
      .linesIterator.flatMap(l => names.findFirstMatchIn(l.trim).map(_.group(1))).toSet
    val declared = SparkEntry.queries.keySet
    assert(inManifest == declared,
      s"manifest drift - regenerate: sbt \"Test/runMain graft.GateManifest\"; " +
        s"missing=${(declared -- inManifest).toSeq.sorted} " +
        s"stale=${(inManifest -- declared).toSeq.sorted}")
  }

  // Streaming queries have no PlanGate shape pin (their physical plan
  // is rebuilt per trigger), so their MANIFEST record carries the
  // stream-shape equivalent instead: micro-batch count + stateful
  // operator count from the bench's trigger-phase listener. Pin that
  // every declared stream_* query has one with a stateful operator and
  // at least one micro-batch — a query that silently lost its
  // watermark/stateful op (or stopped streaming at all) would
  // otherwise only show up as an unexplained wall-clock move.
  test("gate streams: MANIFEST carries n_triggers/state_ops for every stream query") {
    val f = new java.io.File(GateManifest.path)
    assume(f.exists())
    val txt = java.nio.file.Files.readString(f.toPath)
    // assert, not assume (round-11 advice): the gate is established as
    // of r11's MANIFEST — a regeneration from a bench-latest.json whose
    // stream section was dropped (or a missing bench file) must FAIL
    // here, not silently cancel the pin
    assert(txt.contains("\"stream\":"),
      "MANIFEST carries no stream-shape records — regenerate from a " +
        "bench run whose stream section is present (run Bench, then " +
        "sbt \"Test/runMain graft.GateManifest\")")
    val entry = "^\"([A-Za-z0-9_]+)\": \\{.*\"stream\":\\{\"n_triggers\":(\\d+),\"state_ops\":(\\d+)\\}".r
    val shapes = txt.linesIterator.flatMap { l =>
      entry.findFirstMatchIn(l.trim).map(m =>
        m.group(1) -> (m.group(2).toInt, m.group(3).toInt))
    }.toMap
    val declared = SparkEntry.queries.keySet.filter(_.startsWith("stream_"))
    val missing = declared.filterNot(shapes.contains)
    assert(missing.isEmpty,
      s"stream queries without a MANIFEST stream-shape record (regenerate " +
        s"after a bench run: sbt \"Test/runMain graft.GateManifest\"): " +
        missing.toSeq.sorted.mkString(", "))
    val degenerate = declared.toSeq.sorted.flatMap { q =>
      val (t, ops) = shapes(q)
      (if (t < 1) Seq(s"$q: n_triggers=$t") else Nil) ++
        (if (ops < 1) Seq(s"$q: state_ops=$ops") else Nil)
    }
    assert(degenerate.isEmpty,
      s"degenerate stream shapes (lost stateful operator or never " +
        s"triggered): ${degenerate.mkString(", ")}")
  }

  test("README's query count matches the declared inventory") {
    val readme = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val m = "(\\d+)-query inventory".r.findFirstMatchIn(readme)
    assert(m.isDefined, "README no longer states the inventory size")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"README says ${m.get.group(1)}, inventory is ${SparkEntry.queries.size}")
  }
}
