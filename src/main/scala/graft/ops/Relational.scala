package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Relational operator surface (SURVEY.md §2.B–H).
  *
  * Each query is a named `(SparkSession, sfDir) => DataFrame` paired with
  * ANSI SQL the driver runs in DuckDB over the same parquet. Conventions
  * for hash-stable comparison (SURVEY.md §7.4):
  *   - every aggregate/computed column aliased identically on both sides;
  *   - double sums via exact decimal (see [[Tables.dsum]]);
  *   - windowed/approximate doubles rounded;
  *   - timestamps surfaced as epoch microseconds (`unix_micros` /
  *     `epoch_us(CAST(ts AS TIMESTAMP))` — both truncate the parquet-ns
  *     source to us);
  *   - deterministic ORDER BY with explicit tiebreaks on both sides.
  */
object Relational {

  /** q01 — grouped aggregation over lineitem (reference D1;
    * incident_ops.py:52-61 batch counts generalized to TPC-H Q1 shape). */
  def q01Agg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("sum_disc_price"),
        (dsum($"l_discount") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02 — top-N-per-group window (reference E1; cluster_ops.py:39-53
    * last-5-batches-per-cluster recast: last 5 events per user). */
  def q02TopNPerGroup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".desc, $"event_id".desc)
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"), $"rn")
      .orderBy($"user_id", $"rn")
  }
  val q02Sql: String =
    """SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, rn
      |FROM (
      |  SELECT user_id, event_id, ts,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |                       ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn <= 5
      |ORDER BY user_id, rn""".stripMargin

  /** q03 — argmin-per-group join (reference C1; pattern_ops.py:30-43:
    * earliest log per cluster + cluster size + concat template H1). */
  def q03ArgminJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d).as("e")
    val agg = events(s, d).groupBy($"event_type")
      .agg(min($"event_id").as("first_event"), count(lit(1)).as("total_count"))
      .as("t")
    ev.join(agg, $"e.event_type" === $"t.event_type" &&
        $"e.event_id" === $"t.first_event")
      .select($"e.event_type", $"t.first_event", $"t.total_count",
        concat_ws(" | ", $"e.event_type", $"e.props").as("template"))
      .orderBy($"e.event_type")
  }
  val q03Sql: String =
    """SELECT e.event_type, t.first_event, t.total_count,
      |  concat_ws(' | ', e.event_type, e.props) AS template
      |FROM events e
      |JOIN (SELECT event_type, MIN(event_id) AS first_event,
      |             COUNT(*) AS total_count
      |      FROM events GROUP BY event_type) t
      |  ON e.event_type = t.event_type AND e.event_id = t.first_event
      |ORDER BY e.event_type""".stripMargin

  /** q04 — filters: IN-list + BETWEEN + grouped count (reference B3/B5/D1;
    * run_incremental_batch.py:59-65 batch framing). */
  def q04FilterCounts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .filter($"event_type".isin("error", "signup") &&
        $"event_id".between(100, 1000000))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"user_id")
  }
  val q04Sql: String =
    """SELECT user_id, COUNT(*) AS cnt
      |FROM events
      |WHERE event_type IN ('error','signup')
      |  AND event_id BETWEEN 100 AND 1000000
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** q05 — anti join: customers with no high-value order (reference C2
    * inverse; incident_ops.py:31-33 to-create set as left_anti). */
  def q05AntiJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val big = orders(s, d).filter($"o_totalprice" > 400000.0)
    customer(s, d)
      .join(big, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }
  val q05Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  /** q06 — semi join: customers having a big order (reference C2;
    * incident_ops.py:7-13 existence probe, set-oriented). */
  def q06SemiJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bigOrders = orders(s, d).filter($"o_totalprice" > 100000.0)
    customer(s, d)
      .join(bigOrders, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_mktsegment")
      .orderBy($"c_custkey")
  }
  val q06Sql: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
      |ORDER BY c_custkey""".stripMargin

  /** q07 — integer-division bucketed histogram (reference D4/H5;
    * run_training_batch.py:218-227 virtual batches). */
  def q07BucketHist(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy($"event_type", floor($"event_id" / 100).as("batch_id"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"event_type", $"batch_id")
  }
  val q07Sql: String =
    """SELECT event_type, CAST(FLOOR(event_id / 100) AS BIGINT) AS batch_id,
      |  COUNT(*) AS cnt
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q08 — distinct count per group (reference D5; nunique). */
  def q08Distinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy($"event_type")
  }
  val q08Sql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
      |  COUNT(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q09 — top-k by count (reference D6/F4; value_counts().head(3)). */
  def q09TopK(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"event_type")
      .limit(3)
  }
  val q09Sql: String =
    """SELECT event_type, COUNT(*) AS cnt FROM events
      |GROUP BY event_type ORDER BY cnt DESC, event_type LIMIT 3""".stripMargin

  /** q10 — pivot / crosstab (reference D10; visualise_results.py:27
    * pd.crosstab recast: docs per source × lang). */
  def q10Pivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val langs = Seq("de", "en", "es", "fr", "zh")
    val p = documents(s, d)
      .groupBy($"source")
      .pivot("lang", langs)
      .agg(count(lit(1)))
    p.select($"source" +: langs.map(l => coalesce(col(l), lit(0L)).as(l)): _*)
      .orderBy($"source")
  }
  val q10Sql: String =
    """SELECT source,
      |  COUNT(CASE WHEN lang = 'de' THEN 1 END) AS de,
      |  COUNT(CASE WHEN lang = 'en' THEN 1 END) AS en,
      |  COUNT(CASE WHEN lang = 'es' THEN 1 END) AS es,
      |  COUNT(CASE WHEN lang = 'fr' THEN 1 END) AS fr,
      |  COUNT(CASE WHEN lang = 'zh' THEN 1 END) AS zh
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** q11 — lag / velocity within group (reference E2;
    * volume_analyzer.py:52-60 counts[-1]-counts[-2]). */
  def q11Lag(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    events(s, d)
      .select($"event_id", $"user_id", $"value",
        lag($"value", 1).over(w).as("prev_value"))
      .withColumn("delta", $"value" - $"prev_value")
      .orderBy($"event_id")
  }
  val q11Sql: String =
    """SELECT event_id, user_id, value,
      |  LAG(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
      |  value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS delta
      |FROM events ORDER BY event_id""".stripMargin

  /** q12 — rolling window aggregate (reference E3;
    * volume_analyzer.py:62-68 last-5 mean/std per cluster). */
  def q12Rolling(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
      .rowsBetween(-4, 0)
    events(s, d)
      .select($"event_id", $"user_id",
        round(avg($"value").over(w), 4).as("roll_mean"),
        round(stddev_pop($"value").over(w), 4).as("roll_std"))
      .orderBy($"event_id")
  }
  val q12Sql: String =
    """SELECT event_id, user_id,
      |  ROUND(AVG(value) OVER w, 4) AS roll_mean,
      |  ROUND(STDDEV_POP(value) OVER w, 4) AS roll_std
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
      |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** q13 — global sort + limit (reference F1/F3; top orders by price). */
  def q13SortLimit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .limit(10)
  }
  val q13Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** q14 — scalar string functions (reference H1/H3/H9; concat_ws label
    * + substring truncate, validate_quality.py:18,112). */
  def q14Strings(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select($"doc_id",
        concat_ws("_", $"source", $"lang").as("src_lang"),
        substring($"text", 1, 60).as("head"),
        length($"text").as("text_len"),
        $"n_chars")
      .orderBy($"doc_id")
  }
  val q14Sql: String =
    """SELECT doc_id, concat_ws('_', source, lang) AS src_lang,
      |  substring(text, 1, 60) AS head, length(text) AS text_len, n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q15 — JSON extraction (reference H10/A11; parsed_data → typed col). */
  def q15Json(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .select($"event_id",
        get_json_object($"props", "$.k").cast("int").as("k_val"))
      .orderBy($"event_id")
  }
  val q15Sql: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
      |FROM events ORDER BY event_id""".stripMargin

  /** q16 — z-score ranking (reference H8/J5; volume_analyzer.py:125-147
    * batch-relative z over per-cluster counts). */
  def q16ZScore(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cnts = events(s, d).groupBy($"user_id").agg(count(lit(1)).as("cnt"))
    val stats = cnts.agg(avg($"cnt").as("mu"),
      stddev_pop($"cnt").as("sigma"))
    cnts.crossJoin(stats)
      .select($"user_id", $"cnt",
        round(($"cnt" - $"mu") / ($"sigma" + lit(1e-5)), 4).as("z"))
      .orderBy($"user_id")
  }
  val q16Sql: String =
    """WITH cnts AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id),
      |stats AS (SELECT AVG(cnt) AS mu, STDDEV_POP(cnt) AS sigma FROM cnts)
      |SELECT user_id, cnt, ROUND((cnt - mu) / (sigma + 1e-5), 4) AS z
      |FROM cnts CROSS JOIN stats ORDER BY user_id""".stripMargin

  /** q17 — join + aggregate: revenue per nation (reference C3 enrichment
    * join; broadcast dimension). */
  def q17JoinAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    customer(s, d)
      .join(orders(s, d), $"c_custkey" === $"o_custkey")
      .join(broadcast(nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(dsum($"o_totalprice").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy($"n_name")
  }
  val q17Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** q18 — outer join + null predicate (reference B4; nullable cluster_id
    * as unprocessed marker: orders without any lineitem rows). */
  def q18OuterNull(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = lineitem(s, d).groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n_lines"))
    orders(s, d)
      .join(li, $"o_orderkey" === $"l_orderkey", "left_outer")
      .select($"o_orderkey", coalesce($"n_lines", lit(0L)).as("n_lines"),
        $"n_lines".isNull.as("is_unmatched"))
      .orderBy($"o_orderkey")
  }
  val q18Sql: String =
    """SELECT o_orderkey, COALESCE(t.n_lines, 0) AS n_lines,
      |  t.n_lines IS NULL AS is_unmatched
      |FROM orders
      |LEFT JOIN (SELECT l_orderkey, COUNT(*) AS n_lines
      |           FROM lineitem GROUP BY l_orderkey) t
      |  ON o_orderkey = l_orderkey
      |ORDER BY o_orderkey""".stripMargin

  /** q19 — tumbling event-time window (reference I3; per-batch volume
    * counts as 1-hour tumbling windows over the event stream). */
  def q19Tumbling(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros($"w.start").as("window_start_us"),
        $"event_type", $"cnt")
      .orderBy($"window_start_us", $"event_type")
  }
  val q19Sql: String =
    """SELECT epoch_us(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))) AS window_start_us,
      |  event_type, COUNT(*) AS cnt
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q20 — set ops: union + except shape (reference §2.G extended surface:
    * high-value users via purchases UNION errors, minus signups). */
  def q20SetOps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d)
    val purchasers = ev.filter($"event_type" === "purchase" && $"value" > 150.0)
      .select($"user_id")
    val erroring = ev.filter($"event_type" === "error" && $"value" > 150.0)
      .select($"user_id")
    purchasers.union(erroring).distinct()
      .orderBy($"user_id")
  }
  val q20Sql: String =
    """SELECT DISTINCT user_id FROM (
      |  SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150.0
      |  UNION ALL
      |  SELECT user_id FROM events WHERE event_type = 'error' AND value > 150.0)
      |ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg" -> (q01Agg _),
    "q02_topn_per_group" -> (q02TopNPerGroup _),
    "q03_argmin_join" -> (q03ArgminJoin _),
    "q04_filter_counts" -> (q04FilterCounts _),
    "q05_anti_join" -> (q05AntiJoin _),
    "q06_semi_join" -> (q06SemiJoin _),
    "q07_bucket_hist" -> (q07BucketHist _),
    "q08_distinct" -> (q08Distinct _),
    "q09_topk" -> (q09TopK _),
    "q10_pivot" -> (q10Pivot _),
    "q11_lag" -> (q11Lag _),
    "q12_rolling" -> (q12Rolling _),
    "q13_sort_limit" -> (q13SortLimit _),
    "q14_strings" -> (q14Strings _),
    "q15_json" -> (q15Json _),
    "q16_zscore" -> (q16ZScore _),
    "q17_join_agg" -> (q17JoinAgg _),
    "q18_outer_null" -> (q18OuterNull _),
    "q19_tumbling" -> (q19Tumbling _),
    "q20_set_ops" -> (q20SetOps _))

  val oracleSql: Map[String, String] = Map(
    "q01_agg" -> q01Sql,
    "q02_topn_per_group" -> q02Sql,
    "q03_argmin_join" -> q03Sql,
    "q04_filter_counts" -> q04Sql,
    "q05_anti_join" -> q05Sql,
    "q06_semi_join" -> q06Sql,
    "q07_bucket_hist" -> q07Sql,
    "q08_distinct" -> q08Sql,
    "q09_topk" -> q09Sql,
    "q10_pivot" -> q10Sql,
    "q11_lag" -> q11Sql,
    "q12_rolling" -> q12Sql,
    "q13_sort_limit" -> q13Sql,
    "q14_strings" -> q14Sql,
    "q15_json" -> q15Sql,
    "q16_zscore" -> q16Sql,
    "q17_join_agg" -> q17Sql,
    "q18_outer_null" -> q18Sql,
    "q19_tumbling" -> q19Sql,
    "q20_set_ops" -> q20Sql)
}
