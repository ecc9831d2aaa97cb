package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Cross-front-end consistency SWEEP (round-10 advice #8): every stored
  * DuckDB oracle in the relational families runs through `spark.sql`
  * (translated to Spark dialect — mechanically where the dialects only
  * differ in spelling, via an explicit hand twin where the construct
  * differs structurally) over the registered temp views, and the result
  * must equal the DataFrame form row-for-row. This promotes "SQL and
  * DataFrame agree" from a 4-query sample to an engine property over
  * 80+ queries; a failure here is a real dialect-consistency finding.
  *
  * Exclusions are explicit and reasoned, never silent: DuckDB `ASOF
  * JOIN` has no Spark SQL spelling (the engine's as-of support is the
  * AsOfJoin OPERATOR tier — `graft.plans.AsOfJoin` — which the
  * DataFrame form of those queries exercises).
  */
class SqlFrontEndSweepSpec extends SparkSpec {

  /** DuckDB → Spark where the dialects differ only in spelling. */
  private def translate(sql: String): String = {
    var s = sql
    // strftime → date_format (same arg order); %-tokens → java patterns
    s = s.replace("strftime(", "date_format(")
      .replace("generate_series(", "sequence(")
      .replace("unnest(", "explode(")
      .replace("%Y", "yyyy").replace("%m", "MM").replace("%d", "dd")
      .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss")
    // intdiv: spaced ` // ` only — a bare replace would corrupt the
    // `https?://` inside regex pattern literals (found by this sweep)
    s = s.replace(" // ", " div ")
    s = s.replace("quantile_cont", "percentile")
    s = s.replace("arg_max(", "max_by(").replace("arg_min(", "min_by(")
    s = s.replace("epoch_ms(", "unix_millis(")
    s = s.replace("json_extract_string(", "get_json_object(")
    s = s.replace("unnest(sequence(", "explode(sequence(")
    s = "INTERVAL '(\\d+) (\\w+)'".r.replaceAllIn(s,
      m => s"interval ${m.group(1)} ${m.group(2)}")
    // DuckDB 2-arg regexp_extract returns the whole match; Spark's
    // default group is 1 — pin group 0 explicitly
    s = "regexp_extract\\(([^,()]+), ('[^']*')\\)".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(
        s"regexp_extract(${m.group(1)}, ${m.group(2)}, 0)"))
    // DuckDB len() is array length too; these oracles use it on arrays
    s = s.replace("len(regexp_extract_all(", "size(regexp_extract_all(")
    // Spark regexp_extract_all's default group is 1: a group-less
    // pattern needs an explicit wrapping group
    s = "regexp_extract_all\\(([^,()]+), '(\\[[^']*\\])'\\)".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(
        s"regexp_extract_all(${m.group(1)}, '(${m.group(2)})', 1)"))
    s = "isodow\\(([^()]+)\\)".r.replaceAllIn(s,
      m => s"(weekday(${m.group(1)}) + 1)")
    // quoted output identifiers → backticks; only in `AS "NAME"`
    // position — a bare rule would corrupt "k" inside JSON patterns
    s = "AS \"([A-Za-z]\\w*)\"".r.replaceAllIn(s, m => s"AS `${m.group(1)}`")
    // DATE::DATE arithmetic: DuckDB date − date is INTEGER days
    s = "(\\w+)::DATE - DATE '([0-9-]+)'".r.replaceAllIn(s,
      m => s"datediff(day, DATE '${m.group(2)}', CAST(${m.group(1)} AS DATE))")
    s = s.replace("(d1 - d0)", "(datediff(day, d0, d1))")
    s = "\\bd0 \\+ (CAST\\(.*? AS INTEGER\\))".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(
        s"date_add(d0, ${m.group(1)})"))
    // CAST(x AS VARCHAR) → STRING (Spark VARCHAR wants a length)
    s = s.replace(" AS VARCHAR)", " AS STRING)")
    // datediff('day', ...) → datediff(day, ...): Spark wants the unit bare
    s = "(date_diff|datediff)\\('(\\w+)',".r.replaceAllIn(s,
      m => s"${m.group(1)}(${m.group(2)},")
    // DATE − DATE is INTEGER days in DuckDB, INTERVAL in Spark
    s = "CAST\\((\\w+) AS DATE\\) - DATE '([0-9-]+)'".r.replaceAllIn(s,
      m => s"datediff(day, DATE '${m.group(2)}', CAST(${m.group(1)} AS DATE))")
    // aggregate FILTER (cond) shorthand → FILTER (WHERE cond)
    s = "FILTER \\((?!WHERE)".r.replaceAllIn(s, "FILTER (WHERE ")
    // fn(x IGNORE NULLS) → fn(x) IGNORE NULLS
    s = "\\(([^()]+) IGNORE NULLS\\)".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(
        s"(${m.group(1)}) IGNORE NULLS"))
    // string_agg(x, sep ORDER BY o) → listagg WITHIN GROUP
    s = "string_agg\\(([^,]+),\\s*('[^']*')\\s+ORDER BY ([^)]+)\\)".r
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        s"listagg(${m.group(1)}, ${m.group(2)}) WITHIN GROUP (ORDER BY ${m.group(3)})"))
    // regexp_matches(x, p) → x RLIKE p
    s = "regexp_matches\\(([^,]+),\\s*('[^']*')\\)".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(
        s"(${m.group(1)} RLIKE ${m.group(2)})"))
    // DuckDB regexp_replace global flag: Spark replaces all by default
    s = s.replace(", 'g')", ")")
    // regex character classes survive Spark's string-literal escaping
    s = s.replace("\\s", "\\\\s").replace("\\d", "\\\\d").replace("\\w", "\\\\w")
    // 1-based list index → element_at FIRST (or the list-literal rule
    // would eat `rc[1]`), then numeric list literals → array(); the
    // literal rule requires a leading digit so regex classes like [.]
    // survive untouched
    s = "\\b([a-z_][a-z0-9_]*)\\[(\\d+)\\]".r.replaceAllIn(s,
      m => s"element_at(${m.group(1)}, ${m.group(2)})")
    s = "\\[(\\d[0-9., eE+-]*)\\]".r.replaceAllIn(s, m => s"array(${m.group(1)})")
    s
  }

  /** Structurally different constructs get an explicit Spark twin. */
  private val twins: Map[String, String] = Map(
    "a22_weighted_percentiles" ->
      """WITH c AS (
        |  SELECT CAST(round(round(l_extendedprice, 2) * 100, 0) AS BIGINT)
        |    AS cents, CAST(l_quantity AS BIGINT) AS w
        |  FROM lineitem),
        |r AS (SELECT cents, sum(w) AS w FROM c GROUP BY cents),
        |cum AS (SELECT cents,
        |  CAST(sum(w) OVER (ORDER BY cents) AS BIGINT) AS cw FROM r),
        |tot AS (SELECT CAST(sum(w) AS BIGINT) AS wtot FROM c),
        |q AS (SELECT explode(array(25, 50, 75, 90)) AS qpct)
        |SELECT qpct, min(cents) AS value_cents
        |FROM cum, tot, q WHERE cw * 100 >= qpct * wtot
        |GROUP BY qpct ORDER BY qpct""".stripMargin,
    "e4_gap_fill" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    count(*) AS n, round(sum(value), 4) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |spans AS (SELECT event_type, min(h) AS h0, max(h) AS h1
        |  FROM hourly GROUP BY 1),
        |grid AS (SELECT event_type,
        |  explode(sequence(h0, h1, interval 1 hour)) AS h FROM spans)
        |SELECT g.event_type, date_format(g.h, 'yyyy-MM-dd HH:mm:ss') AS hour,
        |  CAST(coalesce(hh.n, 0) AS BIGINT) AS n,
        |  coalesce(hh.sum_value, 0.0) AS sum_value
        |FROM grid g LEFT JOIN hourly hh
        |  ON g.event_type = hh.event_type AND g.h = hh.h
        |ORDER BY 1, 2""".stripMargin,
    "f6_array_funcs" ->
      """SELECT p_partkey,
        |  size(split(p_name, ' ')) AS n_tokens,
        |  size(array_distinct(split(p_name, ' '))) AS n_distinct,
        |  array_join(array_sort(split(p_name, ' ')), ',') AS sorted_toks,
        |  array_join(slice(split(p_name, ' '), 1, 2), ',') AS first2,
        |  array_join(reverse(split(p_name, ' ')), ',') AS reversed,
        |  element_at(split(p_name, ' '), -1) AS last_tok
        |FROM part ORDER BY p_partkey""".stripMargin,
    "f14_ip_cidr" ->
      """WITH ips AS (
        |  SELECT event_id, user_id,
        |    concat('10.', (user_id * 37) % 256, '.',
        |      (user_id div 256) % 256, '.', user_id % 256) AS ip
        |  FROM events),
        |parsed AS (
        |  SELECT event_id, user_id,
        |    CAST(element_at(split(ip, '\\.'), 1) AS BIGINT) * 16777216
        |      + CAST(element_at(split(ip, '\\.'), 2) AS BIGINT) * 65536
        |      + CAST(element_at(split(ip, '\\.'), 3) AS BIGINT) * 256
        |      + CAST(element_at(split(ip, '\\.'), 4) AS BIGINT) AS ipnum
        |  FROM ips),
        |blocks AS (
        |  SELECT * FROM VALUES
        |    ('10.0.0.0/10', CAST(167772160 AS BIGINT), 10),
        |    ('10.64.0.0/10', CAST(171966464 AS BIGINT), 10),
        |    ('10.128.0.0/9', CAST(176160768 AS BIGINT), 9)
        |  AS blocks(cidr, base, plen))
        |SELECT cidr, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(min(ipnum) AS BIGINT) AS min_ip,
        |  CAST(max(ipnum) AS BIGINT) AS max_ip
        |FROM parsed JOIN blocks
        |  ON shiftright(ipnum, 32 - plen) = shiftright(base, 32 - plen)
        |GROUP BY cidr ORDER BY cidr""".stripMargin)

  /** Constructs with no Spark SQL spelling — excluded with the reason. */
  private val excluded: Map[String, String] = Map(
    "j6_asof" -> "DuckDB ASOF JOIN syntax; Spark's as-of is the AsOfJoin operator tier",
    "j12_asof_native" -> "DuckDB ASOF JOIN syntax; Spark's as-of is the AsOfJoin operator tier",
    "j14_bucketed_asof" -> "DuckDB ASOF JOIN syntax; Spark's as-of is the AsOfJoin operator tier",
    "e9_timebound_funnel" -> "DuckDB ASOF JOIN syntax; Spark's as-of is the AsOfJoin operator tier",
    "e14_funnel_steps" -> "DuckDB ASOF JOIN syntax; Spark's as-of is the AsOfJoin operator tier",
    "f13_unicode_norm" -> "DuckDB nfc_normalize has no Spark SQL builtin; the DataFrame form uses the engine's normalizer expression",
    "e23_markov_attribution" -> "the oracle's vector-carrying recursive CTE leans on DuckDB list(x ORDER BY y) aggregation and list_position, neither of which Spark SQL spells; the operator's chain solve is driver arithmetic over a bounded LUT, not a SQL plan")

  private def norm(v: Any): String = v match {
    case null => "∅"
    case d: java.lang.Double =>
      val r = math.rint(d * 1e6) / 1e6
      if (r == 0.0) "0" else r.toString
    case f: java.lang.Float => norm(java.lang.Double.valueOf(f.doubleValue()))
    case b: java.math.BigDecimal => norm(java.lang.Double.valueOf(b.doubleValue()))
    case d: java.sql.Date => d.toString
    case t: java.sql.Timestamp => t.toString
    case seq: scala.collection.Seq[_] => seq.map(norm).mkString("[", ",", "]")
    case other => other.toString
  }

  private def canon(df: DataFrame): Seq[Seq[String]] = {
    import org.apache.spark.sql.functions.col
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(r => r.toSeq.map(norm).toList).toSeq
      .sortBy(_.mkString(""))
  }

  test("SQL front end: 80+ relational oracles run via spark.sql and equal the DataFrame form") {
    GraftCatalog.register(spark, sf0001)
    val fams = "^(?:[aefjwq]\\d+_|set\\d*_|cat\\d+_)".r
    val names = graft.SparkEntry.oracleSql.keys
      .filter(n => fams.findFirstIn(n).isDefined)
      .filterNot(excluded.contains)
      .toSeq.sorted
    assert(names.size >= 80, s"only ${names.size} queries in the sweep")
    val failures = names.flatMap { n =>
      try {
        val sql = twins.getOrElse(n, translate(graft.SparkEntry.oracleSql(n)))
        val viaSql = canon(spark.sql(sql))
        val viaDf = canon(graft.SparkEntry.queries(n)(spark, sf0001))
        if (viaSql == viaDf) None
        else {
          val diff = viaSql.diff(viaDf).take(2)
          Some(s"$n: ${viaSql.size} vs ${viaDf.size} rows; sql-only sample: $diff")
        }
      } catch {
        case e: Exception =>
          Some(s"$n: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.take(2).mkString(" | ")}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size}/${names.size} dialect findings:\n${failures.mkString("\n")}")
  }
}
