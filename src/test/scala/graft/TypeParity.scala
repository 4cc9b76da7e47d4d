package graft

import org.apache.spark.sql.types._

/** Numeric-kind parity between an engine result schema and its oracle's
  * result schema (see InventorySpec's type canary). The driver's
  * comparator stringifies values before hashing, so integral-vs-floating
  * disagreement on a column ("20" vs "20.0") is a guaranteed hash
  * mismatch even when every value is numerically identical — the failure
  * class behind the only red rows of rounds 4, 6, and 7.
  *
  * Only the integral/floating axis is compared: decimals, strings,
  * dates, etc. map to "other" and are never flagged, because the oracle
  * schema here comes from Spark's analyzer as a DuckDB proxy and the two
  * engines' decimal-widening rules differ in ways that don't affect the
  * driver's stringified hash.
  */
object TypeParity {

  private def kind(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "integral"
    case FloatType | DoubleType => "floating"
    case _ => "other"
  }

  /** Shared-column kind mismatches, formatted `col: engine=t oracle=t`. */
  def mismatches(engine: StructType, oracle: StructType): Seq[String] = {
    val o = oracle.fields.map(f => f.name -> f.dataType).toMap
    engine.fields.toSeq.flatMap { f =>
      o.get(f.name).flatMap { odt =>
        val (ke, ko) = (kind(f.dataType), kind(odt))
        if (ke != ko && ke != "other" && ko != "other")
          Some(s"${f.name}: engine=${f.dataType.simpleString} oracle=${odt.simpleString}")
        else None
      }
    }
  }

  /** Rewrite the oracle's DuckDB dialect into Spark-analyzable SQL for
    * TYPE ANALYSIS ONLY — never executed, so value-level divergence
    * (range's exclusive end vs sequence's inclusive, 0- vs 1-based
    * subscripts, dropped ORDER BY inside string_agg) is fine; what must
    * be preserved is each output column's numeric kind, and every
    * mapping below is kind-preserving (DuckDB and Spark agree on the
    * result types of the renamed functions).
    */
  def duckdbToSpark(sql: String): String = {
    var s = sql
    // recursion first: it gates whether the analyzer sees the rest
    s = unrollRecursiveCtes(s)
    // composites before the generic renames they'd otherwise collide with
    s = s.replaceAll("(?i)unnest\\(generate_series\\(([^()]*)\\)\\)", "explode(sequence($1))")
    s = s.replaceAll("(?i)(?<![A-Za-z0-9_])generate_series\\(([^()]*)\\)", "explode(sequence($1))")
    s = s.replaceAll("(?i)\\bAS\\s+MATERIALIZED\\b", "AS")
    // `FROM range(n) t(c)` is a valid Spark TVF — protect it, then map
    // scalar range() (DuckDB list) to sequence() (Spark array)
    s = s.replaceAll("(?i)\\b(FROM|JOIN)(\\s+)range\\(", "$1$2__rangetvf(")
    s = s.replaceAll("(?i)(?<![A-Za-z0-9_])range\\(", "sequence(")
    s = s.replace("__rangetvf(", "range(")
    // DuckDB correlates FROM-clause table functions implicitly; Spark
    // needs the LATERAL keyword spelled out
    s = s.replaceAll("(?i)\\b(FROM|JOIN)(\\s+[A-Za-z0-9_]+(?:\\s+[A-Za-z0-9_]+)?\\s*),\\s*(?:LATERAL\\s+)?unnest\\(",
      "$1$2, LATERAL unnest(")
    val renames = Seq(
      "unnest" -> "explode", "string_split_regex" -> "split",
      "string_split" -> "split", "list_transform" -> "transform",
      "list_filter" -> "filter", "list_distinct" -> "array_distinct",
      "list_sort" -> "array_sort", "list_max" -> "array_max",
      "list_intersect" -> "array_intersect", "list_prepend" -> "array_prepend",
      "array_to_string" -> "array_join", "arg_max" -> "max_by",
      "strpos" -> "instr", "ord" -> "ascii", "list_contains" -> "array_contains",
      "quantile_cont" -> "percentile", "make_timestamp" -> "timestamp_micros",
      "len" -> "size", "list" -> "collect_list")
    for ((from, to) <- renames)
      s = s.replaceAll(s"(?i)(?<![A-Za-z0-9_])$from\\(", s"$to(")
    // DuckDB's 1-arg range(n)/greatest(x) forms
    s = s.replaceAll("(?i)(?<![A-Za-z0-9_])sequence\\(\\s*([A-Za-z0-9_.]+)\\s*\\)", "sequence(0, $1)")
    s = s.replaceAll("(?i)(?<![A-Za-z0-9_])greatest\\(\\s*([A-Za-z0-9_.]+)\\s*\\)", "($1)")
    s = s.replaceAll("(?i)\\bHUGEINT\\b", "DECIMAL(38,0)")
    s = s.replaceAll("(?i)\\b([A-Z]+)\\[\\]", "ARRAY<$1>")
    s = s.replaceAll("(?i)\\bVARCHAR\\b", "STRING")
    // DuckDB regexp_replace 'g' flag; Spark replaces globally by default
    s = s.replaceAll(",\\s*'g'\\)", ")")
    // quoted datetime unit → bare keyword
    s = s.replaceAll("(?i)date_diff\\('(\\w+)'\\s*,", "date_diff($1,")
    // ASOF JOIN → plain JOIN (the inequality ON clause types the same)
    s = s.replaceAll("(?i)\\bASOF\\s+", "")
    // inline IGNORE NULLS → Spark's two-arg form
    s = s.replaceAll("(?i)\\s+IGNORE\\s+NULLS\\)", ", true)")
    // JSON ->> extraction
    s = s.replaceAll("([A-Za-z_][A-Za-z0-9_.]*)\\s*->>\\s*('[^']*')", "get_json_object($1, $2)")
    // Spark's array_prepend demands exact element-type agreement where
    // DuckDB's list_prepend coerces; the prepended FNV offset never
    // changes the list's element KIND, so drop it for typing
    s = dropFirstArg(s, "array_prepend")
    // DuckDB 2-arg list_reduce appears only in HUGEINT fingerprint
    // folds (FNV64) whose decimal kind is outside the integral/floating
    // parity axis — and Spark's reduce() demands exact accumulator-type
    // agreement that DuckDB's decimal propagation can't satisfy. Stand
    // in a decimal literal of the same kind.
    s = rewriteListReduce(s)
    s = dropAggOrderBy(s)
    // DuckDB allows arbitrary expressions in LIMIT; Spark wants a
    // foldable literal — the row count never affects the schema
    s = stubUnfoldableLimit(s)
    quoteAwarePass(s)
  }

  /** TYPE-ANALYSIS unrolling of `WITH RECURSIVE`: Spark rejects the
    * plain-UNION recursion the closure oracles run in DuckDB, but a
    * recursive CTE's schema IS its base branch's schema (SQL requires
    * the branches union-compatible), so for typing it suffices to drop
    * the RECURSIVE keyword and truncate every SELF-REFERENCING CTE
    * body at its first top-level UNION — the recursive branch
    * disappears, the base branch carries the kinds. Non-recursive CTEs
    * in the same WITH clause (e.g. the symmetrized `edges` UNION) are
    * left intact.
    */
  private def unrollRecursiveCtes(sql: String): String = {
    if (!"(?i)\\bWITH\\s+RECURSIVE\\b".r.findFirstIn(sql).isDefined) return sql
    val s = sql.replaceAll("(?i)\\bWITH\\s+RECURSIVE\\b", "WITH")
    val out = new StringBuilder
    // position after "WITH "
    val withM = "(?i)\\bWITH\\s+".r.findFirstMatchIn(s).get
    out.append(s.substring(0, withM.end))
    var i = withM.end
    var more = true
    while (more) {
      // identifier
      val nameStart = i
      while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
      val name = s.substring(nameStart, i)
      // up to and including the opening paren of "AS ("
      val bodyOpen = s.indexOf('(', i)
      out.append(s.substring(nameStart, bodyOpen + 1))
      // balanced, quote-aware body scan recording top-level UNIONs
      var j = bodyOpen + 1; var depth = 0; var inQ = false
      var firstUnion = -1
      while (j < s.length && !(depth == 0 && !inQ && s.charAt(j) == ')')) {
        val c = s.charAt(j)
        if (inQ) { if (c == '\'') inQ = false }
        else c match {
          case '\'' => inQ = true
          case '(' => depth += 1
          case ')' => depth -= 1
          case 'U' | 'u' if depth == 0 && firstUnion < 0 &&
              s.regionMatches(true, j, "UNION", 0, 5) &&
              (j == 0 || !s.charAt(j - 1).isLetterOrDigit) &&
              (j + 5 >= s.length || !s.charAt(j + 5).isLetterOrDigit) =>
            firstUnion = j
          case _ =>
        }
        j += 1
      }
      val body = s.substring(bodyOpen + 1, j)
      val selfRef = ("(?i)(?<![A-Za-z0-9_])" +
        java.util.regex.Pattern.quote(name) + "(?![A-Za-z0-9_])").r
        .findFirstIn(body).isDefined
      out.append(
        if (selfRef && firstUnion >= 0) s.substring(bodyOpen + 1, firstUnion)
        else body)
      out.append(')')
      i = j + 1
      // next CTE or the main query
      var k = i
      while (k < s.length && s.charAt(k).isWhitespace) k += 1
      if (k < s.length && s.charAt(k) == ',') { out.append(s.substring(i, k + 1)); i = k + 1 }
      else { out.append(s.substring(i)); more = false }
      // skip whitespace before the next identifier
      if (more) { while (i < s.length && s.charAt(i).isWhitespace) { out.append(s.charAt(i)); i += 1 } }
    }
    out.toString
  }

  /** `LIMIT <non-numeric expression>` → `LIMIT 100`, consuming the
    * expression up to the first unbalanced `)` or top-level newline.
    */
  private def stubUnfoldableLimit(sql: String): String = {
    val m = java.util.regex.Pattern.compile("(?i)\\bLIMIT\\s+").matcher(sql)
    val out = new StringBuilder
    var last = 0
    while (m.find()) {
      val exprStart = m.end()
      if (exprStart < sql.length && !sql.charAt(exprStart).isDigit) {
        var i = exprStart; var depth = 0; var stop = false
        while (i < sql.length && !stop) {
          sql.charAt(i) match {
            case '(' => depth += 1; i += 1
            case ')' => if (depth == 0) stop = true else { depth -= 1; i += 1 }
            case '\n' if depth == 0 => stop = true
            case _ => i += 1
          }
        }
        out.append(sql.substring(last, m.end())).append("100")
        last = i
      }
    }
    if (last == 0) sql else { out.append(sql.substring(last)); out.toString }
  }

  /** `fn(ARG1, rest)` → `(rest)` — balanced-paren, quote-aware removal
    * of a call head and its first argument.
    */
  private def dropFirstArg(sql: String, fn: String): String = {
    val marker = fn + "("
    var s = sql
    var idx = s.indexOf(marker)
    while (idx >= 0) {
      var i = idx + marker.length
      var depth = 0; var inQ = false
      while (i < s.length && !(depth == 0 && !inQ && s.charAt(i) == ',')) {
        val c = s.charAt(i)
        if (inQ) { if (c == '\'') inQ = false }
        else c match {
          case '\'' => inQ = true
          case '(' | '[' => depth += 1
          case ')' | ']' => depth -= 1
          case _ =>
        }
        i += 1
      }
      s = s.substring(0, idx) + "(" + s.substring(i + 1)
      idx = s.indexOf(marker)
    }
    s
  }

  /** Replace each balanced `list_reduce(...)` call with
    * `CAST(0 AS DECIMAL(38,0))` — the kind-correct stand-in for the
    * HUGEINT folds these oracles use it for.
    */
  private def rewriteListReduce(sql: String): String = {
    val marker = "list_reduce("
    var s = sql
    var idx = s.indexOf(marker)
    while (idx >= 0) {
      var i = idx + marker.length
      var depth = 1; var inQ = false
      while (i < s.length && depth > 0) {
        val c = s.charAt(i)
        if (inQ) { if (c == '\'') inQ = false }
        else c match {
          case '\'' => inQ = true
          case '(' | '[' => depth += 1
          case ')' | ']' => depth -= 1
          case _ =>
        }
        i += 1
      }
      s = s.substring(0, idx) + "CAST(0 AS DECIMAL(38,0))" + s.substring(i)
      idx = s.indexOf(marker)
    }
    s
  }

  /** Drop DuckDB's in-aggregate ordering modifier (`string_agg(x, ','
    * ORDER BY y)`, `collect_list(x ORDER BY y)`) — order can't change a
    * result type. Only groups headed by a known aggregate are touched,
    * so window `OVER (... ORDER BY ...)` clauses survive.
    */
  private def dropAggOrderBy(sql: String): String = {
    val heads = Set("string_agg", "collect_list", "first", "last", "max_by", "min_by")
    val out = new StringBuilder(sql.length)
    var i = 0; var inQ = false
    // stack of (isTrackedAggGroup)
    val stack = scala.collection.mutable.Stack[Boolean]()
    def prevWord: String = {
      var j = out.length - 1
      while (j >= 0 && (out.charAt(j).isLetterOrDigit || out.charAt(j) == '_')) j -= 1
      out.substring(j + 1).toLowerCase
    }
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inQ) { out.append(c); if (c == '\'') inQ = false; i += 1 }
      else c match {
        case '\'' => inQ = true; out.append(c); i += 1
        case '(' => stack.push(heads(prevWord)); out.append(c); i += 1
        case ')' => if (stack.nonEmpty) stack.pop(); out.append(c); i += 1
        case 'O' | 'o' if stack.nonEmpty && stack.top &&
            sql.regionMatches(true, i, "ORDER", 0, 5) &&
            (i + 5 < sql.length) && sql.charAt(i + 5).isWhitespace =>
          // skip to this group's closing paren (tracking nesting/quotes)
          var depth = 0; var q = false
          while (i < sql.length && !(depth == 0 && !q && sql.charAt(i) == ')')) {
            val ch = sql.charAt(i)
            if (q) { if (ch == '\'') q = false }
            else ch match {
              case '\'' => q = true
              case '(' => depth += 1
              case ')' => depth -= 1
              case _ =>
            }
            i += 1
          }
        case ch => out.append(ch); i += 1
      }
    }
    out.toString
  }

  /** `//` → DIV and literal `[...]` → array(...), skipping quoted
    * regions. A `[` is a literal opener unless it follows an
    * identifier/`)`/`]` (then it's a subscript, which Spark parses).
    */
  private final class BracketGroup(val literal: Boolean, val openPos: Int) {
    var parens = 0
    var sawColon = false
  }

  private def quoteAwarePass(s: String): String = {
    val out = new StringBuilder(s.length + 16)
    val bracket = scala.collection.mutable.Stack[BracketGroup]()
    var i = 0; var inS = false; var inD = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inS) { out.append(c); if (c == '\'') inS = false; i += 1 }
      else if (inD) { out.append(c); if (c == '"') inD = false; i += 1 }
      else c match {
        case '\'' => inS = true; out.append(c); i += 1
        case '"' => inD = true; out.append(c); i += 1
        case '/' if i + 1 < s.length && s.charAt(i + 1) == '/' =>
          out.append(" DIV "); i += 2
        case '(' =>
          if (bracket.nonEmpty) bracket.top.parens += 1
          out.append(c); i += 1
        case ')' =>
          if (bracket.nonEmpty) bracket.top.parens -= 1
          out.append(c); i += 1
        case ':' =>
          if (bracket.nonEmpty && bracket.top.parens == 0) bracket.top.sawColon = true
          out.append(c); i += 1
        case '[' =>
          // subscript iff it follows an identifier/)/], except when that
          // "identifier" is an SQL keyword (SELECT [1,2] is a literal)
          var j = out.length - 1
          while (j >= 0 && out.charAt(j).isWhitespace) j -= 1
          val subscript =
            if (j < 0) false
            else out.charAt(j) match {
              case ')' | ']' => true
              case p if p.isLetterOrDigit || p == '_' =>
                var k = j
                while (k >= 0 && (out.charAt(k).isLetterOrDigit || out.charAt(k) == '_')) k -= 1
                !sqlKeywords(out.substring(k + 1, j + 1).toUpperCase)
              case _ => false
            }
          bracket.push(new BracketGroup(!subscript, out.length))
          out.append(if (subscript) "[" else "array("); i += 1
        case ']' =>
          if (bracket.isEmpty) { out.append(']'); i += 1 }
          else {
            val g = bracket.pop()
            if (g.literal) out.append(')')
            else if (g.sawColon)
              // DuckDB slice x[a:b]: array-typed like x itself — drop
              // the whole subscript, the value is irrelevant to typing
              out.setLength(g.openPos)
            else out.append(']')
            i += 1
          }
        case ch => out.append(ch); i += 1
      }
    }
    out.toString
  }

  /** DuckDB scalar functions with no Spark spelling — registered as
    * type-stub UDFs (never executed; only their result types matter).
    */
  def registerOracleStubs(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("epoch_us",
      (t: java.sql.Timestamp) => if (t == null) 0L else t.getTime * 1000L)
    spark.udf.register("strftime",
      (t: java.sql.Timestamp, fmt: String) => fmt)
    spark.udf.register("list_sum",
      (xs: scala.collection.Seq[Double]) => if (xs == null) 0.0 else xs.sum)
    spark.udf.register("list_dot_product",
      (a: scala.collection.Seq[Double], b: scala.collection.Seq[Double]) =>
        if (a == null || b == null) 0.0 else a.lazyZip(b).map(_ * _).sum)
    spark.udf.register("regexp_matches",
      (s: String, re: String) => s != null && re.r.findFirstIn(s).isDefined)
    spark.udf.register("xor", (a: Long, b: Long) => a ^ b)
  }

  private val sqlKeywords: Set[String] = Set(
    "SELECT", "WHEN", "THEN", "ELSE", "END", "AS", "IN", "ON", "AND", "OR",
    "NOT", "UNION", "ALL", "DISTINCT", "BY", "CASE", "FROM", "WHERE",
    "RETURN", "VALUES", "OVER", "BETWEEN", "IS", "NULL", "LIKE", "EXISTS")

  /** Oracles whose SQL uses DuckDB-only constructs Spark's analyzer
    * rejects even after [[duckdbToSpark]] — these get rows/hash coverage
    * from the driver but no in-JVM type-parity coverage. Keep this list
    * justified: each entry should name the construct.
    *
    * EMPTY since round 9: the recursive-closure oracles type through
    * [[unrollRecursiveCtes]] and `q_dq_checks` was rewritten from
    * LATERAL VALUES to a plain UNION ALL stack (identical DuckDB
    * results) — every declared oracle is canary-covered. Keep the set
    * (and its pinning test) so any future DuckDB-only construct must
    * be named here to opt out.
    */
  val duckdbOnlyOracles: Set[String] = Set.empty
}
