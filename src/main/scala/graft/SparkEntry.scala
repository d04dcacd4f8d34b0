package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.Scalars
import graft.operators._

/** Driver contract (see SURVEY.md §2.C — one entry per declared operator,
  * with DuckDB oracle SQL wherever the semantics are ANSI-SQL-expressible).
  *
  * Determinism conventions shared by every query/oracle pair (FIXTURES.md):
  *  - every result ends with ORDER BY on a unique, non-null key set;
  *  - money aggregates accumulate in DECIMAL (order-independent) and surface
  *    as DOUBLE; float averages/transcendentals are rounded to kill
  *    cross-engine ulp noise;
  *  - timestamps surface as epoch milliseconds (bigint) — the fixtures are
  *    nanosecond-precision and ms is the grain both engines floor to
  *    identically;
  *  - DuckDB-side casts align integer widths with Spark output types
  *    (year→INT, ceil/floor→BIGINT, len→INT, …).
  */
object SparkEntry {

  /** Flagship query on sf0.001: the TPC-H-Q1-shaped aggregate. */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggHash(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // core relational
    "q_scan_project"   -> (Relational.scanProject _),
    "q_filter"         -> (Relational.filter _),
    "q_sort_limit"     -> (Relational.sortLimit _),
    "q_agg_hash"       -> (Relational.aggHash _),
    "q_agg_distinct"   -> (Relational.aggDistinct _),
    "q_agg_approx"     -> (Relational.aggApprox _),
    "q_agg_approx_pct" -> (Relational.aggApproxPercentile _),
    "q_agg_pct_exact"  -> (Quantiles.aggPercentileExact _),
    "q_agg_rollup"     -> (Relational.aggRollup _),
    "q_agg_cube"       -> (Relational.aggCube _),
    "q_agg_gsets"      -> (Relational.aggGroupingSets _),
    "q_agg_pivot"      -> (Relational.aggPivot _),
    "q_agg_corr"       -> (Relational.corrProfile _),
    "q_agg_moments"    -> (Relational.momentsProfile _),
    "q_agg_hist"       -> ((s: SparkSession, d: String) => Relational.histogram(s, d)),
    "q_agg_hist_eq"    -> ((s: SparkSession, d: String) => Quantiles.histogramEqDepth(s, d)),
    "q_agg_zscore"     -> ((s: SparkSession, d: String) => Relational.zscoreOutliers(s, d)),
    // joins
    "q_join_inner"     -> (Relational.joinInner _),
    "q_join_broadcast" -> (Relational.joinBroadcast _),
    "q_join_left"      -> (Relational.joinLeft _),
    "q_join_semi"      -> (Relational.joinSemi _),
    "q_join_anti"      -> (Relational.joinAnti _),
    "q_join_full"      -> (Relational.joinFull _),
    "q_join_range"     -> (TimeOps.rangeJoin _),
    "q_join_asof"      -> (TimeOps.asofJoin _),
    "q_join_asof_nearest" -> (TimeOps.asofNearest _),
    "q_join_skew"      -> ((s: SparkSession, d: String) => Relational.joinSalted(s, d)),
    // set ops
    "q_union"          -> (Relational.setUnion _),
    "q_intersect"      -> (Relational.setIntersect _),
    "q_except"         -> (Relational.setExcept _),
    // windows
    "q_window_rank"    -> (Windows.windowRank _),
    "q_window_frame"   -> (Windows.windowFrame _),
    "q_topk_pergroup"  -> (Windows.topKPerGroup _),
    "q_batch_split"    -> (Windows.batchSplit _),
    // scalar functions
    "q_str_funcs"      -> (Scalars.strFuncs _),
    "q_date_funcs"     -> (Scalars.dateFuncs _),
    "q_math_funcs"     -> (Scalars.mathFuncs _),
    "q_array_map_funcs" -> (Scalars.arrayFuncs _),
    "q_to_json"        -> (Scalars.toJson _),
    "q_from_json"      -> (Scalars.fromJson _),
    // event-time
    "q_stream_tumbling" -> (TimeOps.tumbling _),
    "q_stream_sliding"  -> (TimeOps.sliding _),
    "q_window_dau"      -> (TimeOps.dau _),
    "q_stream_session"  -> (TimeOps.session _),
    "q_window_gap"      -> (TimeOps.eventGaps _),
    "q_partition_route" -> (TimeOps.partitionRoute _),
    // dedup
    "q_dedup_exact"    -> (Dedup.exact _),
    "q_dedup_norm"     -> (Dedup.normalizeDedup _),
    "q_dedup_near"     -> ((s: SparkSession, d: String) => Dedup.minhashLsh(s, d)),
    "q_dedup_simhash"  -> ((s: SparkSession, d: String) => Dedup.simhash(s, d)),
    "q_dedup_ngram"    -> ((s: SparkSession, d: String) => Dedup.ngramJaccard(s, d)),
    "q_dedup_embed"    -> ((s: SparkSession, d: String) => Dedup.embedCosine(s, d)),
    "q_dedup_substring" -> ((s: SparkSession, d: String) => Dedup.substringDup(s, d)),
    "q_span_scrub"     -> ((s: SparkSession, d: String) => Dedup.spanScrub(s, d)),
    "q_dedup_incremental" -> ((s: SparkSession, d: String) => Dedup.incrementalDedup(s, d)),
    "q_dedup_cluster"  -> ((s: SparkSession, d: String) => Dedup.nearDupClusters(s, d)),
    "q_dedup_semantic" -> ((s: SparkSession, d: String) => Dedup.semanticClusters(s, d)),
    // similarity search
    "q_sim_cosine"     -> ((s: SparkSession, d: String) => Similarity.cosineTopK(s, d)),
    "q_sim_ann"        -> ((s: SparkSession, d: String) => Similarity.annLsh(s, d)),
    "q_sim_ivf"        -> ((s: SparkSession, d: String) => Similarity.ivf(s, d)),
    "q_sim_ivf_trained" -> ((s: SparkSession, d: String) => Similarity.ivfTrained(s, d)),
    "q_sim_ivf_pq"     -> ((s: SparkSession, d: String) => Similarity.ivfPq(s, d)),
    "q_sim_ivf_pq_res" -> ((s: SparkSession, d: String) => Similarity.ivfPqResidual(s, d)),
    "q_sim_ivf_pq_stored" -> ((s: SparkSession, d: String) => Similarity.ivfPqStored(s, d)),
    "q_sim_knn_join"   -> ((s: SparkSession, d: String) => Similarity.knnJoin(s, d)),
    "q_sim_centroids"  -> (Similarity.centroids _),
    "q_embed_quantize" -> (Similarity.quantizeInt8 _),
    "q_embed_codes"    -> (Similarity.quantizeCodesStr _),
    // text analysis
    "q_text_analysis"  -> (Text.wordCount _),
    "q_lang_id"        -> (Text.langId _),
    "q_quality_score"  -> (Text.qualityScore _),
    "q_token_count"    -> (Text.tokenCount _),
    "q_text_entropy"   -> (Text.tokenEntropy _),
    "q_vocab_topk"     -> ((s: SparkSession, d: String) => Text.vocabTopK(s, d)),
    "q_text_bigrams"   -> ((s: SparkSession, d: String) => Text.bigramTopK(s, d)),
    "q_text_collocations" -> ((s: SparkSession, d: String) => Text.collocations(s, d)),
    "q_vocab_heavy"    -> ((s: SparkSession, d: String) => Text.vocabHeavy(s, d)),
    "q_funnel"         -> (TimeOps.funnel _),
    "q_window_retention" -> (TimeOps.retention _),
    "q_text_tfidf"     -> ((s: SparkSession, d: String) => Text.tfidfTopTerms(s, d)),
    "q_fingerprint"    -> (Text.fingerprint _),
    "q_fingerprint_rolling" -> (Text.rollingFingerprint _),
    "q_quality_repetition" -> (Text.repetition _),
    "q_quality_gate"   -> (Text.qualityGate _),
    "q_quality_lm"     -> (Text.unigramLm _),
    "q_split_assign"   -> (Text.hashSplit _),
    // training-data prep
    "q_chunk_split"    -> ((s: SparkSession, d: String) => TrainPrep.chunk(s, d)),
    "q_contamination"  -> (TrainPrep.contamination _),
    "q_pii_scrub"      -> (TrainPrep.piiScrub _),
    "q_sample_stratified" -> (TrainPrep.sampleStratified _),
    "q_curriculum_bins" -> (TrainPrep.curriculumBins _),
    "q_source_mix"     -> (TrainPrep.sourceMix _),
    "q_mix_temperature" -> (TrainPrep.mixTemperature _),
    "q_sample_weighted" -> (TrainPrep.sampleWeighted _),
    "q_sample_group"   -> (TrainPrep.sampleGroup _),
    "q_agg_mode"       -> (TrainPrep.modeProfile _),
    "q_profile_stats"  -> ((s, dir) => TrainPrep.profileStats(s, dir)),
    "q_pack_sequences" -> ((s: SparkSession, d: String) => TrainPrep.packSequences(s, d)),
    // multimodal
    "q_multimodal_stats"  -> (Multimodal.stats _),
    "q_multimodal_decode" -> (Multimodal.decodePipeline _),
    "q_multimodal_frames" -> ((s: SparkSession, d: String) => Multimodal.framePipeline(s, d)),
    "q_multimodal_parse"  -> (Multimodal.parsePipeline _),
    "q_multimodal_body"   -> (Multimodal.bodyPipeline _),
  )

  def oracleSql: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, CAST(FLOOR(l_quantity) AS INT) AS qty_int, l_returnflag AS flag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, qty_int, flag""".stripMargin,

    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        |FROM lineitem
        |WHERE (l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0)
        |   OR (l_returnflag = 'R' AND l_tax IS NOT NULL AND l_shipdate >= TIMESTAMP '1999-01-01')
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag""".stripMargin,

    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "q_agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  ROUND(AVG(l_quantity), 4) AS avg_qty,
        |  ROUND(AVG(l_discount), 4) AS avg_disc,
        |  COUNT(1) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_part,
        |  COUNT(DISTINCT l_suppkey) AS nd_supp, COUNT(1) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, COUNT(1) AS cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, COUNT(1) AS cnt
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_agg_gsets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, COUNT(1) AS cnt
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_agg_pivot" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY 1 ORDER BY hour_ms""".stripMargin,

    "q_join_inner" ->
      """SELECT o_orderpriority, COUNT(1) AS line_cnt,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // salting is plan-shape only: the oracle is the UNSALTED join — the
    // hash compare proves replicate-and-salt changed nothing semantically
    "q_join_skew" ->
      """SELECT c_mktsegment, COUNT(1) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_sample_group" ->
      """SELECT lang, doc_id, smp_rank FROM (
        |  SELECT lang, doc_id, ROW_NUMBER() OVER (
        |    PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS smp_rank
        |  FROM documents) t
        |WHERE smp_rank <= 20 ORDER BY lang, smp_rank""".stripMargin,

    "q_agg_mode" ->
      """WITH c AS (SELECT lang, source, COUNT(1) AS n FROM documents GROUP BY 1, 2),
        |t AS (SELECT lang, source, n,
        |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, source) AS rn,
        |  SUM(n) OVER (PARTITION BY lang) AS lang_docs FROM c)
        |SELECT lang, source AS top_source, n AS n_docs,
        |  ROUND(CAST(n AS DOUBLE) / lang_docs * 10000) / 10000 AS share
        |FROM t WHERE rn = 1 ORDER BY lang""".stripMargin,

    "q_window_gap" ->
      """WITH g AS (SELECT user_id, epoch_ms(ts) -
        |    LAG(epoch_ms(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts), event_id) AS gap_ms
        |  FROM events)
        |SELECT user_id, COUNT(1) AS n_events, COUNT(gap_ms) AS n_gaps,
        |  CAST(SUM(CASE WHEN gap_ms > 21600000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS long_gaps,
        |  MAX(gap_ms) AS max_gap_ms,
        |  ROUND(AVG(gap_ms) * 10000) / 10000 AS avg_gap_ms
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_join_broadcast" ->
      """SELECT r_name, COUNT(1) AS cust_cnt,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS order_cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    "q_agg_pct_exact" ->
      """WITH q AS (SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.5) AS p50,
        |    quantile_cont(l_extendedprice, 0.95) AS p95
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(0.5 AS DOUBLE) AS p, ROUND(p50 * 10000) / 10000 AS pct FROM q
        |UNION ALL
        |SELECT l_returnflag, CAST(0.95 AS DOUBLE) AS p, ROUND(p95 * 10000) / 10000 AS pct FROM q
        |ORDER BY l_returnflag, p""".stripMargin,

    "q_join_full" ->
      """WITH u AS (SELECT o_custkey AS uk, COUNT(1) AS urgent_cnt FROM orders
        |           WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey),
        |     f AS (SELECT o_custkey AS fk, COUNT(1) AS finished_cnt FROM orders
        |           WHERE o_orderstatus = 'F' GROUP BY o_custkey)
        |SELECT COALESCE(uk, fk) AS custkey,
        |  COALESCE(urgent_cnt, 0) AS urgent_cnt,
        |  COALESCE(finished_cnt, 0) AS finished_cnt
        |FROM u FULL OUTER JOIN f ON uk = fk
        |ORDER BY custkey""".stripMargin,

    "q_join_range" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events)
        |SELECT a.user_id AS user_id, COUNT(1) AS pair_cnt
        |FROM e a JOIN e b ON a.user_id = b.user_id
        |  AND b.ts_ms > a.ts_ms AND b.ts_ms <= a.ts_ms + 300000
        |GROUP BY a.user_id ORDER BY user_id""".stripMargin,

    "q_join_asof" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        |p AS (SELECT event_id AS p_id, user_id, ts_ms AS p_ms FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS c_id, user_id AS c_user, ts_ms AS c_ms FROM e WHERE event_type = 'click'),
        |j AS (SELECT p_id, user_id, p_ms, c_id, c_ms,
        |        ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY c_ms DESC, c_id DESC) AS rn
        |      FROM p JOIN c ON user_id = c_user AND c_ms <= p_ms)
        |SELECT p_id, user_id, p_ms, c_id, c_ms FROM j WHERE rn = 1 ORDER BY p_id""".stripMargin,

    "q_join_asof_nearest" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        |p AS (SELECT event_id AS p_id, user_id, ts_ms AS p_ms FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS c_id, user_id AS c_user, ts_ms AS c_ms FROM e WHERE event_type = 'click'),
        |j AS (SELECT p_id, user_id, p_ms, c_id, c_ms,
        |        ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY
        |          abs(c_ms - p_ms) ASC,
        |          CASE WHEN c_ms <= p_ms THEN 0 ELSE 1 END ASC,
        |          CASE WHEN c_ms <= p_ms THEN -c_id ELSE c_id END ASC) AS rn
        |      FROM p JOIN c ON user_id = c_user)
        |SELECT p_id, user_id, p_ms, c_id, c_ms FROM j WHERE rn = 1 ORDER BY p_id""".stripMargin,

    "q_union" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000.0
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY custkey""".stripMargin,

    "q_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000.0
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY custkey""".stripMargin,

    "q_except" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000.0
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY custkey""".stripMargin,

    "q_window_rank" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice, rnk, drnk, rn FROM (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice,
        |    CAST(RANK() OVER w AS INT) AS rnk,
        |    CAST(DENSE_RANK() OVER w AS INT) AS drnk,
        |    CAST(ROW_NUMBER() OVER w AS INT) AS rn
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)) t
        |WHERE rn <= 20 ORDER BY o_orderpriority, rn""".stripMargin,

    "q_window_frame" ->
      """SELECT event_id, user_id,
        |  ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
        |  ROUND(LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS prev_value,
        |  ROUND(LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS next_value
        |FROM events ORDER BY event_id""".stripMargin,

    "q_topk_pergroup" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_batch_split" ->
      """SELECT l_returnflag, batch_id, COUNT(1) AS rows_in_batch FROM (
        |  SELECT l_returnflag,
        |    CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_orderkey, l_linenumber) - 1) / 1000) AS BIGINT) AS batch_id
        |  FROM lineitem) t
        |GROUP BY l_returnflag, batch_id ORDER BY l_returnflag, batch_id""".stripMargin,

    "q_str_funcs" ->
      """SELECT c_custkey, UPPER(c_name) AS name_upper, LOWER(c_mktsegment) AS seg_lower,
        |  SUBSTRING(c_name, 1, 8) AS name_prefix,
        |  TRIM('  ' || c_mktsegment || ' ') AS seg_trim,
        |  CONCAT_WS('-', c_mktsegment, c_custkey) AS seg_key,
        |  REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS name_digits,
        |  STRING_SPLIT(c_name, '#')[1] AS name_stem,
        |  c_name LIKE '%1%' AS has_one,
        |  CAST(LENGTH(c_name) AS INT) AS name_len
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(YEAR(o_orderdate) AS INT) AS o_year,
        |  CAST(MONTH(o_orderdate) AS INT) AS o_month,
        |  CAST(DAY(o_orderdate) AS INT) AS o_day,
        |  CAST(QUARTER(o_orderdate) AS INT) AS o_quarter,
        |  epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms,
        |  CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
        |  STRFTIME(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_math_funcs" ->
      """SELECT o_orderkey,
        |  ROUND(o_totalprice, 2) AS price_r1,
        |  ABS(o_totalprice - 100000.0) AS abs_diff,
        |  CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil,
        |  CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
        |  o_totalprice * o_totalprice AS price_sq,
        |  ROUND(LN(o_totalprice), 4) AS price_ln,
        |  ROUND(SQRT(o_totalprice), 4) AS price_sqrt,
        |  o_orderkey % 97 AS key_mod
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_array_map_funcs" ->
      """SELECT vec_id, CAST(LEN(embedding) AS INT) AS dim,
        |  ROUND(list_sum(CAST(embedding[1:4] AS DOUBLE[])), 4) + 0 AS head4_sum,
        |  ROUND(sqrt(list_sum([x * x FOR x IN CAST(embedding AS DOUBLE[])])), 4) AS l2_norm,
        |  ROUND(list_sum([abs(x) FOR x IN CAST(embedding AS DOUBLE[])]), 4) AS l1_norm,
        |  ROUND(list_max([abs(x) FOR x IN CAST(embedding AS DOUBLE[])]), 4) AS linf_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_to_json" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(to_json(struct_pack(l_orderkey := l_orderkey, l_linenumber := l_linenumber,
        |    l_returnflag := l_returnflag, l_linestatus := l_linestatus)) AS VARCHAR) AS doc
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, doc""".stripMargin,

    "q_from_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket
        |FROM events ORDER BY event_id""".stripMargin,

    "q_stream_tumbling" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, event_type,
        |  COUNT(1) AS cnt, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start_ms, event_type""".stripMargin,

    "q_stream_sliding" ->
      """SELECT window_start_ms, COUNT(1) AS cnt FROM (
        |  SELECT CAST((FLOOR(epoch_ms(ts) / 1800000) - k) * 1800000 AS BIGINT) AS window_start_ms
        |  FROM events CROSS JOIN (VALUES (0), (1)) o(k)) t
        |GROUP BY window_start_ms ORDER BY window_start_ms""".stripMargin,

    "q_window_dau" ->
      """SELECT window_start_ms, COUNT(DISTINCT user_id) AS active_users, COUNT(1) AS events FROM (
        |  SELECT user_id, CAST((FLOOR(epoch_ms(ts) / 1800000) - k) * 1800000 AS BIGINT) AS window_start_ms
        |  FROM events CROSS JOIN (VALUES (0), (1)) o(k)) t
        |GROUP BY window_start_ms ORDER BY window_start_ms""".stripMargin,

    "q_stream_session" ->
      """WITH e AS (SELECT event_id, user_id, value, epoch_ms(ts) AS ts_ms FROM events),
        |f AS (SELECT *, CASE WHEN ts_ms - LAG(ts_ms) OVER w > 1800000 THEN 1
        |                     WHEN LAG(ts_ms) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
        |g AS (SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM f)
        |SELECT user_id, session_id, COUNT(1) AS n_events, MIN(ts_ms) AS session_start_ms,
        |  MAX(ts_ms) AS session_end_ms, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM g GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    "q_partition_route" ->
      """SELECT event_type, COUNT(1) AS n_rows, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_dedup_exact" ->
      """SELECT user_id, event_type, event_id, ts_ms FROM (
        |  SELECT user_id, event_type, event_id, epoch_ms(ts) AS ts_ms,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY epoch_ms(ts), event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q_dedup_norm" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |     variants AS (SELECT doc_id + 1000000 AS doc_id,
        |                    '  ' || upper(text) || ' ' || chr(9) AS text
        |                  FROM base WHERE doc_id % 5 = 0),
        |     all_docs AS (SELECT doc_id, text FROM base
        |                  UNION ALL SELECT doc_id, text FROM variants),
        |     keyed AS (SELECT doc_id, md5(text) AS raw_key,
        |                 md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS norm_key
        |               FROM all_docs)
        |SELECT norm_key, COUNT(1) AS n_docs, COUNT(DISTINCT raw_key) AS n_raw_forms,
        |  MIN(doc_id) AS keep_id
        |FROM keyed GROUP BY norm_key HAVING COUNT(1) > 1
        |ORDER BY keep_id""".stripMargin,

    // mirrors Dedup.incrementalDedup's streaming-policy decision from
    // string shingles: batch doc (doc_id % 3 = 0) dropped iff it shares
    // ANY distinct 3-gram shingle with a corpus doc (% 3 <> 0) or with a
    // smaller-id batch doc; sub-3-token docs have no shingles and land
    "q_dedup_incremental" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT doc_id,
        |         list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |           FOR i IN generate_series(1, len(tk) - 2)]) AS shingles
        |       FROM d WHERE len(tk) >= 3),
        |g AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
        |bg AS (SELECT * FROM g WHERE doc_id % 3 = 0),
        |corpus_hit AS (SELECT DISTINCT b.doc_id FROM bg b
        |               JOIN (SELECT DISTINCT shingle FROM g WHERE doc_id % 3 <> 0) c
        |               USING (shingle)),
        |first_id AS (SELECT shingle, MIN(doc_id) AS fid FROM bg GROUP BY 1),
        |within_hit AS (SELECT DISTINCT b.doc_id FROM bg b
        |               JOIN first_id f USING (shingle) WHERE b.doc_id > f.fid),
        |drops AS (SELECT doc_id FROM corpus_hit
        |          UNION SELECT doc_id FROM within_hit)
        |SELECT dd.doc_id, (drops.doc_id IS NULL) AS kept
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) dd
        |LEFT JOIN drops ON dd.doc_id = drops.doc_id
        |ORDER BY dd.doc_id""".stripMargin,

    "q_dedup_ngram" ->
      """WITH d AS (SELECT doc_id, lang, CAST(FLOOR(n_chars / 100) AS INT) AS blk,
        |             list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |               FOR i IN generate_series(1, len(tk) - 2)]) AS shingles
        |           FROM (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS tk
        |                 FROM documents) s WHERE len(tk) >= 3),
        |sh AS (SELECT doc_id, lang, blk, unnest(shingles) AS shingle FROM d),
        |freq AS (SELECT lang, blk, shingle, COUNT(1) AS df FROM sh GROUP BY 1, 2, 3),
        |cold AS (SELECT sh.* FROM sh JOIN freq USING (lang, blk, shingle) WHERE df <= 25),
        |cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        |         FROM cold x JOIN cold y ON x.lang = y.lang AND x.blk = y.blk
        |           AND x.shingle = y.shingle AND x.doc_id < y.doc_id)
        |SELECT a_id, b_id, inter, jaccard FROM (
        |  SELECT a_id, b_id,
        |    CAST(len(list_intersect(da.shingles, db.shingles)) AS INT) AS inter,
        |    ROUND(CAST(len(list_intersect(da.shingles, db.shingles)) AS DOUBLE)
        |      / (len(da.shingles) + len(db.shingles) - len(list_intersect(da.shingles, db.shingles))), 4) AS jaccard
        |  FROM cand JOIN d da ON cand.a_id = da.doc_id
        |  JOIN d db ON cand.b_id = db.doc_id) t
        |WHERE jaccard >= 0.2 ORDER BY a_id, b_id""".stripMargin,

    "q_dedup_substring" ->
      """WITH d AS (SELECT doc_id,
        |             list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |               FOR i IN generate_series(1, len(tk) - 2)]) AS grams
        |           FROM (SELECT doc_id, string_split(text, ' ') AS tk
        |                 FROM documents) s WHERE len(tk) >= 3),
        |g AS (SELECT doc_id, unnest(grams) AS gram FROM d),
        |f AS (SELECT gram, COUNT(1) AS nd FROM g GROUP BY 1),
        |p AS (SELECT g.doc_id, COUNT(1) AS n_grams,
        |    CAST(SUM(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams,
        |    ROUND(SUM(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(1), 4) AS dup_frac
        |  FROM g JOIN f USING (gram) GROUP BY g.doc_id)
        |SELECT dd.doc_id, COALESCE(n_grams, 0) AS n_grams,
        |  COALESCE(dup_grams, 0) AS dup_grams,
        |  COALESCE(dup_frac, 0.0) AS dup_frac,
        |  COALESCE(dup_frac, 0.0) < 0.8 AS keep
        |FROM documents dd LEFT JOIN p ON dd.doc_id = p.doc_id
        |ORDER BY dd.doc_id""".stripMargin,

    // span-level removal: POSITIONAL grams (every occurrence), df over
    // distinct containing docs, covered tokens = any position spanned by a
    // df>=2 gram occurrence, runs marked by the lag(t)=t-1 start flag —
    // mirrors Dedup.spanScrubOn step for step
    "q_span_scrub" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk
        |           FROM documents),
        |g AS (SELECT doc_id, i AS pos,
        |        tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS gram
        |      FROM (SELECT doc_id, tk,
        |              unnest(generate_series(1, len(tk) - 2)) AS i
        |            FROM d WHERE len(tk) >= 3) s),
        |f AS (SELECT gram FROM (
        |        SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY 1)
        |      WHERE nd >= 2),
        |cov AS (SELECT DISTINCT doc_id, pos + unnest([0, 1, 2]) AS t
        |        FROM g JOIN f USING (gram)),
        |covl AS (SELECT c.doc_id, c.t, len(d.tk[c.t]) AS tok_len
        |         FROM cov c JOIN d USING (doc_id)),
        |m AS (SELECT doc_id, t, tok_len,
        |        CASE WHEN LAG(t) OVER (PARTITION BY doc_id ORDER BY t) = t - 1
        |             THEN 0 ELSE 1 END AS is_start
        |      FROM covl),
        |p AS (SELECT doc_id, COUNT(1) AS tokens_removed,
        |        CAST(SUM(is_start) AS BIGINT) AS spans_removed,
        |        CAST(SUM(tok_len) + COUNT(1) - SUM(is_start) AS BIGINT)
        |          AS chars_removed
        |      FROM m GROUP BY 1)
        |SELECT dd.doc_id,
        |  CAST(len(string_split(dd.text, ' ')) AS BIGINT) AS n_tokens,
        |  COALESCE(tokens_removed, 0) AS tokens_removed,
        |  COALESCE(spans_removed, 0) AS spans_removed,
        |  COALESCE(chars_removed, 0) AS chars_removed,
        |  ROUND(COALESCE(tokens_removed, 0) * 1.0
        |    / len(string_split(dd.text, ' ')), 4) AS span_frac
        |FROM documents dd LEFT JOIN p ON dd.doc_id = p.doc_id
        |ORDER BY dd.doc_id""".stripMargin,

    "q_dedup_cluster" ->
      """WITH RECURSIVE d AS (SELECT doc_id, lang, CAST(FLOOR(n_chars / 100) AS INT) AS blk,
        |             list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |               FOR i IN generate_series(1, len(tk) - 2)]) AS shingles
        |           FROM (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS tk
        |                 FROM documents) s WHERE len(tk) >= 3),
        |sh AS (SELECT doc_id, lang, blk, unnest(shingles) AS shingle FROM d),
        |freq AS (SELECT lang, blk, shingle, COUNT(1) AS df FROM sh GROUP BY 1, 2, 3),
        |cold AS (SELECT sh.* FROM sh JOIN freq USING (lang, blk, shingle) WHERE df <= 25),
        |cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        |         FROM cold x JOIN cold y ON x.lang = y.lang AND x.blk = y.blk
        |           AND x.shingle = y.shingle AND x.doc_id < y.doc_id),
        |pairs AS (SELECT a_id, b_id FROM (
        |  SELECT a_id, b_id,
        |    ROUND(CAST(len(list_intersect(da.shingles, db.shingles)) AS DOUBLE)
        |      / (len(da.shingles) + len(db.shingles) - len(list_intersect(da.shingles, db.shingles))), 4) AS jaccard
        |  FROM cand JOIN d da ON cand.a_id = da.doc_id
        |  JOIN d db ON cand.b_id = db.doc_id) t
        |  WHERE jaccard >= 0.2),
        |edges AS (SELECT a_id AS s, b_id AS dd FROM pairs
        |          UNION SELECT b_id, a_id FROM pairs),
        |reach(id, r) AS (
        |  SELECT s, s FROM edges
        |  UNION
        |  SELECT reach.id, edges.dd FROM reach JOIN edges ON reach.r = edges.s),
        |lab AS (SELECT id, MIN(r) AS cluster_rep FROM reach GROUP BY id),
        |sz AS (SELECT cluster_rep, CAST(COUNT(1) AS INT) AS cluster_size FROM lab GROUP BY cluster_rep)
        |SELECT lab.id AS doc_id, lab.cluster_rep, lab.id = lab.cluster_rep AS is_rep, sz.cluster_size
        |FROM lab JOIN sz USING (cluster_rep) ORDER BY doc_id""".stripMargin,

    // same pair semantics as q_dedup_embed (bands + rounded-cosine >= 0.3),
    // then connected components + a singleton-complete left join-back
    "q_dedup_semantic" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |             list_sum([a * a FOR a IN CAST(embedding AS DOUBLE[])]) AS nrm
        |           FROM embeddings),
        |${operators.Hyperplanes.sqlBandKeysCte},
        |bsz AS (SELECT band, bkey FROM keys GROUP BY band, bkey
        |        HAVING COUNT(1) BETWEEN 2 AND 100),
        |cand AS (SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
        |         FROM keys x JOIN keys y ON x.band = y.band AND x.bkey = y.bkey
        |           AND x.vec_id < y.vec_id
        |         JOIN bsz ON x.band = bsz.band AND x.bkey = bsz.bkey),
        |pairs AS (SELECT a_id, b_id FROM (
        |  SELECT a_id, b_id,
        |    ROUND(list_sum([ea.v[i] * eb.v[i] FOR i IN generate_series(1, len(ea.v))])
        |      / (sqrt(ea.nrm) * sqrt(eb.nrm)), 4) + 0 AS cosine
        |  FROM cand JOIN e ea ON cand.a_id = ea.vec_id
        |  JOIN e eb ON cand.b_id = eb.vec_id) t
        |  WHERE cosine >= 0.3),
        |edges AS (SELECT a_id AS s, b_id AS dd FROM pairs
        |          UNION SELECT b_id, a_id FROM pairs),
        |reach(id, r) AS (
        |  SELECT s, s FROM edges
        |  UNION
        |  SELECT reach.id, edges.dd FROM reach JOIN edges ON reach.r = edges.s),
        |lab AS (SELECT id, MIN(r) AS rep FROM reach GROUP BY id),
        |sz AS (SELECT rep, CAST(COUNT(1) AS INT) AS n FROM lab GROUP BY rep)
        |SELECT em.vec_id,
        |  COALESCE(lab.rep, em.vec_id) AS cluster_rep,
        |  COALESCE(lab.id = lab.rep, TRUE) AS is_rep,
        |  COALESCE(sz.n, 1) AS cluster_size
        |FROM embeddings em LEFT JOIN lab ON em.vec_id = lab.id
        |LEFT JOIN sz ON lab.rep = sz.rep
        |ORDER BY em.vec_id""".stripMargin,

    "q_dedup_embed" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
        |             list_sum([a * a FOR a IN CAST(embedding AS DOUBLE[])]) AS nrm
        |           FROM embeddings),
        |${operators.Hyperplanes.sqlBandKeysCte},
        |bsz AS (SELECT band, bkey FROM keys GROUP BY band, bkey
        |        HAVING COUNT(1) BETWEEN 2 AND 100),
        |cand AS (SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
        |         FROM keys x JOIN keys y ON x.band = y.band AND x.bkey = y.bkey
        |           AND x.vec_id < y.vec_id
        |         JOIN bsz ON x.band = bsz.band AND x.bkey = bsz.bkey)
        |SELECT a_id, b_id, cosine FROM (
        |  SELECT a_id, b_id,
        |    ROUND(list_sum([ea.v[i] * eb.v[i] FOR i IN generate_series(1, len(ea.v))])
        |      / (sqrt(ea.nrm) * sqrt(eb.nrm)), 4) + 0 AS cosine
        |  FROM cand JOIN e ea ON cand.a_id = ea.vec_id
        |  JOIN e eb ON cand.b_id = eb.vec_id) t
        |WHERE cosine >= 0.3 ORDER BY a_id, b_id""".stripMargin,

    "q_sim_cosine" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
        |             list_sum([a * a FOR a IN CAST(embedding AS DOUBLE[])]) AS nrm
        |           FROM embeddings),
        |p AS (SELECT v AS pv, nrm AS pn FROM e WHERE vec_id = 0)
        |SELECT vec_id, label,
        |  ROUND(list_sum([e.v[i] * p.pv[i] FOR i IN generate_series(1, len(e.v))])
        |    / (sqrt(e.nrm) * sqrt(p.pn)), 4) + 0 AS cosine
        |FROM e CROSS JOIN p WHERE vec_id <> 0
        |ORDER BY cosine DESC, vec_id ASC LIMIT 20""".stripMargin,

    "q_sim_ann" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
        |             list_sum([a * a FOR a IN CAST(embedding AS DOUBLE[])]) AS nrm
        |           FROM embeddings),
        |${operators.Hyperplanes.sqlBandKeysCte},
        |k4 AS (SELECT * FROM keys WHERE band < 4),
        |p AS (SELECT band, bkey FROM k4 WHERE vec_id = 0),
        |cand AS (SELECT DISTINCT k4.vec_id FROM k4 JOIN p USING (band, bkey)
        |         WHERE k4.vec_id <> 0),
        |pv AS (SELECT v, nrm FROM e WHERE vec_id = 0)
        |SELECT e.vec_id, e.label,
        |  ROUND(list_sum([e.v[i] * pv.v[i] FOR i IN generate_series(1, len(e.v))])
        |    / (sqrt(e.nrm) * sqrt(pv.nrm)), 4) + 0 AS cosine
        |FROM cand JOIN e ON cand.vec_id = e.vec_id CROSS JOIN pv
        |ORDER BY cosine DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    "q_sim_knn_join" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |             list_sum([a * a FOR a IN CAST(embedding AS DOUBLE[])]) AS nrm
        |           FROM embeddings),
        |${operators.Hyperplanes.sqlBandKeysCte},
        |pk AS (SELECT vec_id AS probe_id, band, bkey FROM keys WHERE vec_id < 10),
        |cand AS (SELECT DISTINCT pk.probe_id, keys.vec_id
        |         FROM keys JOIN pk USING (band, bkey) WHERE keys.vec_id >= 10),
        |scored AS (SELECT cand.probe_id, cand.vec_id,
        |    ROUND(list_sum([ec.v[i] * ep.v[i] FOR i IN generate_series(1, len(ec.v))])
        |      / (sqrt(ec.nrm) * sqrt(ep.nrm)), 4) + 0 AS cosine
        |  FROM cand JOIN e ec ON cand.vec_id = ec.vec_id
        |  JOIN e ep ON cand.probe_id = ep.vec_id)
        |SELECT probe_id, vec_id, cosine, rn FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY cosine DESC, vec_id ASC) AS INT) AS rn
        |  FROM scored) t
        |WHERE rn <= 3 ORDER BY probe_id, rn""".stripMargin,

    "q_sim_centroids" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ex AS (SELECT label, dim, v[dim] AS x
        |       FROM e, (SELECT unnest(generate_series(1, 64)) AS dim) d),
        |c AS (SELECT label, dim, AVG(x) AS c FROM ex GROUP BY label, dim)
        |SELECT label, ROUND(sqrt(SUM(c * c)), 4) AS centroid_norm, COUNT(1) AS dims
        |FROM c GROUP BY label ORDER BY label""".stripMargin,

    "q_embed_quantize" ->
      // bit-exact, NO rounding: max is order-independent, scale is one
      // IEEE division, each residual term is the same floor/mul/sub
      // sequence, and list_sum's left fold matches the expression's
      // accumulation order (the vec_dot precedent). floor(x/s + 0.5) is
      // the shared half-up rounding — DuckDB round() and Java Math.round
      // disagree on negative halves.
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v, list_max([abs(x) FOR x IN v]) / 127.0 AS scale
        |      FROM e WHERE len(v) > 0
        |        AND len([x FOR x IN v IF x IS NULL]) = 0)
        |SELECT vec_id, scale,
        |  list_sum([(x - floor(x / scale + 0.5) * scale) *
        |            (x - floor(x / scale + 0.5) * scale) FOR x IN v])
        |    / len(v) AS mse,
        |  CAST(len(v) AS INT) AS n
        |FROM s WHERE scale > 0 ORDER BY vec_id""".stripMargin,

    "q_embed_codes" ->
      // exact: scale is one IEEE division (hash-compared at 10 significant
      // digits like every double), codes are integers from the SAME
      // floor(x/s + 0.5) both engines evaluate identically — serialized as
      // ONE comma-joined string because the driver comparator sorts/hashes
      // scalar cells only (an array column crashed it in r16); integer
      // rendering is canonical in both engines so the join is lossless
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v, list_max([abs(x) FOR x IN v]) / 127.0 AS scale
        |      FROM e WHERE len(v) > 0
        |        AND len([x FOR x IN v IF x IS NULL]) = 0)
        |SELECT vec_id, scale,
        |  array_to_string([CAST(floor(x / scale + 0.5) AS INT) FOR x IN v], ',') AS codes
        |FROM s WHERE scale > 0 ORDER BY vec_id""".stripMargin,

    "q_quality_lm" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |              FROM documents),
        |tf AS (SELECT tok, COUNT(1) AS c FROM toks GROUP BY tok),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM tf)
        |SELECT doc_id, CAST(COUNT(1) AS INT) AS n_tokens,
        |  ROUND(AVG(ln(CAST(t AS DOUBLE) / c)) * 10000) / 10000 AS avg_neg_logp
        |FROM toks JOIN tf USING (tok) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_text_analysis" ->
      """SELECT token, COUNT(1) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |WHERE LENGTH(token) > 0 AND token NOT IN ('the','a','of','to','in','and','is')
        |GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 100""".stripMargin,

    "q_lang_id" ->
      """SELECT doc_id, lang, n_tokens, en_hits,
        |  ROUND(CAST(en_hits AS DOUBLE) / n_tokens, 4) AS en_ratio,
        |  ROUND(CAST(en_hits AS DOUBLE) / n_tokens, 4) >= 0.05 AS pred_en
        |FROM (
        |  SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |    CAST(len([t FOR t IN string_split(text, ' ')
        |      IF t IN ('the','a','of','to','in','and','is')]) AS INT) AS en_hits
        |  FROM documents) t
        |ORDER BY doc_id""".stripMargin,

    "q_quality_score" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars, CAST(len(tk) AS INT) AS n_tokens,
        |    ROUND(CAST(n_chars - len(tk) + 1 AS DOUBLE) / len(tk), 4) AS mean_tok_len,
        |    ROUND(CAST(len([w FOR w IN tk IF w IN ('the','a','of','to','in','and','is')]) AS DOUBLE) / len(tk), 4) AS stop_ratio,
        |    ROUND(CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 4) AS ttr
        |  FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS tk FROM documents) s)
        |SELECT doc_id, n_chars, n_tokens, mean_tok_len, stop_ratio, ttr,
        |  ROUND(LEAST(n_tokens / 100.0, 1.0) * 0.5 + ttr * 0.3 + LEAST(stop_ratio * 4.0, 1.0) * 0.2, 4) AS quality
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_curriculum_bins" ->
      """WITH t AS (
        |  SELECT doc_id, lang, CAST(len(tk) AS INT) AS n_tokens,
        |    ROUND(CAST(len([w FOR w IN tk IF w IN ('the','a','of','to','in','and','is')]) AS DOUBLE) / len(tk), 4) AS stop_ratio,
        |    ROUND(CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 4) AS ttr
        |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents) s),
        |     sc AS (SELECT lang,
        |       ROUND(LEAST(n_tokens / 100.0, 1.0) * 0.5 + ttr * 0.3 + LEAST(stop_ratio * 4.0, 1.0) * 0.2, 4) AS quality
        |     FROM t),
        |     q AS (SELECT lang,
        |       ROUND(quantile_cont(quality, 0.25), 4) AS q1,
        |       ROUND(quantile_cont(quality, 0.5), 4) AS q2,
        |       ROUND(quantile_cont(quality, 0.75), 4) AS q3
        |     FROM sc GROUP BY lang),
        |     b AS (SELECT sc.lang, sc.quality,
        |       1 + CASE WHEN sc.quality > q.q1 THEN 1 ELSE 0 END
        |         + CASE WHEN sc.quality > q.q2 THEN 1 ELSE 0 END
        |         + CASE WHEN sc.quality > q.q3 THEN 1 ELSE 0 END AS bin
        |     FROM sc JOIN q USING (lang))
        |SELECT lang, bin, COUNT(1) AS docs,
        |  MIN(quality) AS lo_score, MAX(quality) AS hi_score
        |FROM b GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS INT) AS bpe_tokens,
        |  CAST(LENGTH(text) AS INT) AS n_chars,
        |  ROUND(CAST(LENGTH(text) AS DOUBLE) / len(regexp_extract_all(text, '[a-z]{1,4}')), 4) AS chars_per_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_agg_corr" ->
      """SELECT l_returnflag, COUNT(1) AS n,
        |  ROUND(corr(l_quantity, l_extendedprice) * 10000) / 10000 AS corr_qty_price,
        |  ROUND(corr(l_discount, l_extendedprice) * 10000) / 10000 AS corr_disc_price,
        |  ROUND(stddev_samp(l_quantity) * 10000) / 10000 AS stddev_qty,
        |  ROUND(var_samp(l_discount) * 10000) / 10000 AS var_disc,
        |  ROUND(avg(l_extendedprice) * 10000) / 10000 AS avg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // raw power sums: l_quantity is integral <= 50, so s1..s4 are exact
    // integers below 2^53 in both engines — the moment arithmetic below
    // is bit-identical, not merely close. `+ 0` normalizes DuckDB's -0.0
    // on the possibly-negative moments (Spark renders 0.0).
    "q_agg_moments" ->
      """WITH a AS (
        |  SELECT l_returnflag, COUNT(1) AS n,
        |    SUM(l_quantity) AS s1,
        |    SUM(l_quantity*l_quantity) AS s2,
        |    SUM(l_quantity*l_quantity*l_quantity) AS s3,
        |    SUM(l_quantity*l_quantity*l_quantity*l_quantity) AS s4
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  ROUND((s1/n) * 10000) / 10000 AS avg_qty,
        |  ROUND(sqrt(s2/n - (s1/n)*(s1/n)) * 10000) / 10000 AS stddev_pop,
        |  ROUND((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n))
        |    / pow(s2/n - (s1/n)*(s1/n), 1.5) * 10000) / 10000 + 0 AS skewness,
        |  ROUND(((s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
        |      - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
        |    / ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3)
        |    * 10000) / 10000 + 0 AS kurtosis_ex
        |FROM a ORDER BY l_returnflag""".stripMargin,

    "q_agg_hist" ->
      // bucket = floor(x / width): fixture prices carry 2 decimals, so the
      // double division only lands ON an integer boundary when x is an
      // exact multiple of the width — where IEEE division is exact — so
      // the bucket id needs no rounding convention
      """WITH b AS (SELECT l_returnflag AS grp,
        |             CAST(floor(l_extendedprice / 10000) AS INT) AS bucket
        |           FROM lineitem),
        |c AS (SELECT grp, bucket, COUNT(1) AS cnt FROM b GROUP BY grp, bucket)
        |SELECT grp, bucket, cnt,
        |  ROUND(CAST(cnt AS DOUBLE) / SUM(cnt) OVER (PARTITION BY grp)
        |    * 10000) / 10000 AS share
        |FROM c ORDER BY grp, bucket""".stripMargin,

    // equi-depth: exact interpolated octile edges, rows equal to an edge
    // bin DOWN (x <= edge), empty bins absent on both sides; edges are
    // compared unrounded (strictly between adjacent distinct values, or
    // exactly on one — see Quantiles.histogramEqDepthOn)
    "q_agg_hist_eq" ->
      """WITH e AS (SELECT l_returnflag AS grp,
        |    quantile_cont(l_extendedprice, 0.125) AS e0,
        |    quantile_cont(l_extendedprice, 0.25) AS e1,
        |    quantile_cont(l_extendedprice, 0.375) AS e2,
        |    quantile_cont(l_extendedprice, 0.5) AS e3,
        |    quantile_cont(l_extendedprice, 0.625) AS e4,
        |    quantile_cont(l_extendedprice, 0.75) AS e5,
        |    quantile_cont(l_extendedprice, 0.875) AS e6
        |  FROM lineitem GROUP BY 1),
        |b AS (SELECT l.l_returnflag AS grp,
        |    CASE WHEN l_extendedprice <= e0 THEN 0
        |         WHEN l_extendedprice <= e1 THEN 1
        |         WHEN l_extendedprice <= e2 THEN 2
        |         WHEN l_extendedprice <= e3 THEN 3
        |         WHEN l_extendedprice <= e4 THEN 4
        |         WHEN l_extendedprice <= e5 THEN 5
        |         WHEN l_extendedprice <= e6 THEN 6 ELSE 7 END AS bin,
        |    CASE WHEN l_extendedprice <= e0 THEN e0
        |         WHEN l_extendedprice <= e1 THEN e1
        |         WHEN l_extendedprice <= e2 THEN e2
        |         WHEN l_extendedprice <= e3 THEN e3
        |         WHEN l_extendedprice <= e4 THEN e4
        |         WHEN l_extendedprice <= e5 THEN e5
        |         WHEN l_extendedprice <= e6 THEN e6 ELSE NULL END AS hi
        |  FROM lineitem l JOIN e ON l.l_returnflag = e.grp),
        |c AS (SELECT grp, bin, COUNT(1) AS cnt, MAX(hi) AS hi
        |      FROM b GROUP BY 1, 2)
        |SELECT grp, bin, cnt,
        |  ROUND(CAST(cnt AS DOUBLE) / SUM(cnt) OVER (PARTITION BY grp)
        |    * 10000) / 10000 AS share,
        |  ROUND(hi * 10000) / 10000 AS hi
        |FROM c ORDER BY grp, bin""".stripMargin,

    "q_text_entropy" ->
      // H = ln(n) - sum(c*ln(c))/n over per-doc token counters; the `+ 0`
      // normalizes a possible IEEE -0.0 (uniform docs compute ln(n) -
      // n*ln(n)/n, which can land an ulp below zero; DuckDB keeps -0.0,
      // Spark does not)
      """WITH c AS (SELECT doc_id, tok, COUNT(1) AS c FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents) t
        |  GROUP BY doc_id, tok),
        |d AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |        CAST(COUNT(1) AS INT) AS distinct_tokens,
        |        SUM(c * ln(c)) AS clc
        |      FROM c GROUP BY doc_id)
        |SELECT doc_id, n_tokens, distinct_tokens,
        |  ROUND((ln(n_tokens) - clc / n_tokens) * 10000) / 10000 + 0 AS entropy,
        |  CASE WHEN distinct_tokens > 1 THEN
        |    ROUND((ln(n_tokens) - clc / n_tokens)
        |      / ln(CAST(distinct_tokens AS DOUBLE)) * 10000) / 10000 + 0
        |  END AS entropy_ratio
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_agg_zscore" ->
      """WITH st AS (SELECT event_type, avg(value) AS mu,
        |              stddev_samp(value) AS sd
        |            FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.value,
        |  ROUND((e.value - st.mu) / st.sd * 10000) / 10000 AS z
        |FROM events e JOIN st USING (event_type)
        |WHERE abs(e.value - st.mu) > 3 * st.sd
        |ORDER BY event_type, event_id""".stripMargin,

    "q_window_retention" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |               CAST(FLOOR(epoch_ms(ts) / 86400000) AS BIGINT) AS day
        |             FROM events),
        |     per AS (SELECT user_id, MIN(day) AS cohort_day,
        |               LIST(day) AS days
        |             FROM act GROUP BY user_id)
        |SELECT cohort_day, COUNT(1) AS n_users,
        |  CAST(SUM(CASE WHEN list_contains(days, cohort_day + 1) THEN 1 ELSE 0 END) AS BIGINT) AS d1_retained,
        |  CAST(SUM(CASE WHEN list_contains(days, cohort_day + 7) THEN 1 ELSE 0 END) AS BIGINT) AS d7_retained,
        |  ROUND(CAST(SUM(CASE WHEN list_contains(days, cohort_day + 1) THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(1) * 10000) / 10000 AS d1_rate,
        |  ROUND(CAST(SUM(CASE WHEN list_contains(days, cohort_day + 7) THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(1) * 10000) / 10000 AS d7_rate
        |FROM per GROUP BY cohort_day ORDER BY cohort_day""".stripMargin,

    "q_text_bigrams" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |     big AS (SELECT doc_id, tk[i] || ' ' || tk[i + 1] AS bigram
        |             FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 1)) AS i) g
        |             WHERE len(tk) >= 2),
        |     per AS (SELECT doc_id, bigram, COUNT(1) AS c FROM big GROUP BY doc_id, bigram)
        |SELECT bigram, CAST(SUM(c) AS BIGINT) AS occurrences, COUNT(1) AS doc_freq
        |FROM per GROUP BY bigram
        |ORDER BY occurrences DESC, doc_freq DESC, bigram LIMIT 50""".stripMargin,

    // lift = pair_docs·N / (na·nb): every factor an exact integer count,
    // ordered on the ROUNDED value — PMI ranking without cross-engine ln
    "q_text_collocations" ->
      """WITH d AS (SELECT doc_id, list_sort(list_distinct(string_split(text, ' ')))[1:24] AS tk
        |           FROM documents),
        |dd AS (SELECT doc_id, tk FROM d WHERE len(tk) >= 2),
        |t AS (SELECT doc_id, unnest(tk) AS tok FROM dd),
        |nd AS (SELECT tok, COUNT(1) AS n FROM t GROUP BY tok),
        |ntot AS (SELECT COUNT(1) AS nd_total FROM dd),
        |p AS (SELECT x.tok AS tok_a, y.tok AS tok_b, COUNT(1) AS pair_docs
        |      FROM t x JOIN t y ON x.doc_id = y.doc_id AND x.tok < y.tok
        |      GROUP BY 1, 2 HAVING COUNT(1) >= 3)
        |SELECT tok_a, tok_b, pair_docs,
        |  ROUND(CAST(pair_docs AS DOUBLE) * nd_total / (na.n * nb.n) * 10000) / 10000 AS lift
        |FROM p JOIN nd na ON p.tok_a = na.tok JOIN nd nb ON p.tok_b = nb.tok
        |CROSS JOIN ntot
        |ORDER BY lift DESC, pair_docs DESC, tok_a, tok_b LIMIT 50""".stripMargin,

    "q_vocab_topk" ->
      """WITH per AS (SELECT doc_id, token, COUNT(1) AS c
        |             FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |                   FROM documents)
        |             GROUP BY doc_id, token),
        |     v AS (SELECT token, CAST(SUM(c) AS BIGINT) AS occurrences,
        |             COUNT(1) AS doc_freq
        |           FROM per GROUP BY token)
        |SELECT token, occurrences, doc_freq FROM v
        |ORDER BY doc_freq DESC, occurrences DESC, token LIMIT 50""".stripMargin,

    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        |     s1 AS (SELECT user_id, MIN(ts_ms) AS t FROM e
        |            WHERE event_type = 'view' GROUP BY user_id),
        |     s2 AS (SELECT e.user_id, MIN(e.ts_ms) AS t FROM e
        |            JOIN s1 USING (user_id)
        |            WHERE e.event_type = 'click' AND e.ts_ms > s1.t
        |            GROUP BY e.user_id),
        |     s3 AS (SELECT e.user_id, MIN(e.ts_ms) AS t FROM e
        |            JOIN s2 USING (user_id)
        |            WHERE e.event_type = 'purchase' AND e.ts_ms > s2.t
        |            GROUP BY e.user_id),
        |     u AS (SELECT 1 AS step_n, 'view' AS step, COUNT(1) AS users FROM s1
        |           UNION ALL SELECT 2, 'click', COUNT(1) FROM s2
        |           UNION ALL SELECT 3, 'purchase', COUNT(1) FROM s3)
        |SELECT step_n, step, users,
        |  ROUND(CAST(users AS DOUBLE) / LAG(users) OVER (ORDER BY step_n) * 10000) / 10000 AS conv_from_prev
        |FROM u ORDER BY step_n""".stripMargin,

    "q_text_tfidf" ->
      """WITH tf AS (SELECT doc_id, token, COUNT(1) AS c
        |            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |                  FROM documents)
        |            GROUP BY doc_id, token),
        |     wn AS (SELECT doc_id, token, c,
        |              SUM(c) OVER (PARTITION BY doc_id) AS n_tok FROM tf),
        |     df AS (SELECT token, COUNT(1) AS df FROM tf GROUP BY token),
        |     nd AS (SELECT CAST(COUNT(1) AS DOUBLE) AS n_docs FROM documents),
        |     x AS (SELECT w.doc_id, w.token,
        |             ROUND((CAST(w.c AS DOUBLE) / w.n_tok) *
        |               ln(nd.n_docs / df.df) * 10000) / 10000 + 0 AS tfidf
        |           FROM wn w JOIN df USING (token) CROSS JOIN nd),
        |     r AS (SELECT doc_id, token, tfidf,
        |             ROW_NUMBER() OVER (PARTITION BY doc_id
        |               ORDER BY tfidf DESC, token) AS rank FROM x)
        |SELECT doc_id, token, tfidf, rank FROM r WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id, md5(TRIM(LOWER(text))) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_quality_repetition" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |b AS (SELECT doc_id, len(tk) AS n_tokens,
        |        [tk[i] || ' ' || tk[i+1] FOR i IN generate_series(1, len(tk) - 1)] AS g2
        |      FROM tk WHERE len(tk) >= 2),
        |tf AS (SELECT doc_id, MAX(c) AS max_tf FROM
        |        (SELECT doc_id, t, COUNT(1) AS c FROM
        |          (SELECT doc_id, unnest(tk) AS t FROM tk) u
        |         GROUP BY doc_id, t) f
        |       GROUP BY doc_id)
        |SELECT b.doc_id, CAST(n_tokens AS INT) AS n_tokens,
        |  ROUND(1 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 4) AS dup_2gram_frac,
        |  ROUND(CAST(max_tf AS DOUBLE) / n_tokens, 4) AS top_token_frac
        |FROM b JOIN tf USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q_quality_gate" ->
      """WITH tk AS (SELECT doc_id, n_chars, string_split(text, ' ') AS tk FROM documents),
        |sig AS (SELECT doc_id, COALESCE(len(tk), 0) AS n_tokens,
        |          CASE WHEN len(tk) >= 2 THEN
        |            ROUND(CAST(n_chars - len(tk) + 1 AS DOUBLE) / len(tk), 4) END AS mean_tok_len,
        |          CASE WHEN len(tk) >= 2 THEN
        |            ROUND(CAST(len(list_filter(tk, t -> t IN ('the','a','of','to','in','and','is'))) AS DOUBLE) / len(tk), 4) END AS stop_ratio,
        |          CASE WHEN len(tk) >= 2 THEN
        |            ROUND(1 - CAST(len(list_distinct([tk[i] || ' ' || tk[i+1]
        |              FOR i IN generate_series(1, len(tk) - 1)])) AS DOUBLE) / (len(tk) - 1), 4) END AS dup_2gram_frac
        |        FROM tk),
        |f AS (SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
        |        n_tokens < 20 AS too_short,
        |        COALESCE(mean_tok_len < 3.0 OR mean_tok_len > 10.0, FALSE) AS bad_tok_len,
        |        COALESCE(stop_ratio < 0.01, FALSE) AS low_stopword,
        |        COALESCE(dup_2gram_frac > 0.08, FALSE) AS repetitive
        |      FROM sig)
        |SELECT doc_id, n_tokens, too_short, bad_tok_len, low_stopword, repetitive,
        |  NOT (too_short OR bad_tok_len OR low_stopword OR repetitive) AS keep
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_profile_stats" ->
      """WITH a AS (SELECT COUNT(1) AS n,
        |  COUNT(1) - COUNT(l_quantity) AS q_nulls, COUNT(DISTINCT l_quantity) AS q_nd,
        |    MIN(l_quantity) AS q_min, MAX(l_quantity) AS q_max,
        |  COUNT(1) - COUNT(l_discount) AS d_nulls, COUNT(DISTINCT l_discount) AS d_nd,
        |    MIN(l_discount) AS d_min, MAX(l_discount) AS d_max,
        |  COUNT(1) - COUNT(l_tax) AS t_nulls, COUNT(DISTINCT l_tax) AS t_nd,
        |    MIN(l_tax) AS t_min, MAX(l_tax) AS t_max,
        |  COUNT(1) - COUNT(l_shipdate) AS s_nulls, COUNT(DISTINCT l_shipdate) AS s_nd,
        |    CAST(epoch_ms(MIN(l_shipdate)) AS DOUBLE) AS s_min,
        |    CAST(epoch_ms(MAX(l_shipdate)) AS DOUBLE) AS s_max,
        |  COUNT(1) - COUNT(l_returnflag) AS r_nulls, COUNT(DISTINCT l_returnflag) AS r_nd
        |  FROM lineitem)
        |SELECT 'l_quantity' AS col_name, n AS n_rows, q_nulls AS n_nulls, q_nd AS n_distinct, q_min AS min_num, q_max AS max_num FROM a
        |UNION ALL SELECT 'l_discount', n, d_nulls, d_nd, d_min, d_max FROM a
        |UNION ALL SELECT 'l_tax', n, t_nulls, t_nd, t_min, t_max FROM a
        |UNION ALL SELECT 'l_shipdate', n, s_nulls, s_nd, s_min, s_max FROM a
        |UNION ALL SELECT 'l_returnflag', n, r_nulls, r_nd, NULL, NULL FROM a
        |ORDER BY col_name""".stripMargin,

    "q_source_mix" ->
      """WITH a AS (SELECT source, lang, COUNT(1) AS n_docs,
        |             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
        |             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |           FROM documents GROUP BY source, lang)
        |SELECT source, lang, n_docs, sum_tokens, sum_chars,
        |  ROUND(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 4) AS doc_share,
        |  ROUND(CAST(sum_tokens AS DOUBLE) / SUM(sum_tokens) OVER (), 4) AS token_share
        |FROM a ORDER BY source, lang""".stripMargin,

    "q_mix_temperature" ->
      """WITH a AS (SELECT lang, COUNT(1) AS n_docs,
        |             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
        |           FROM documents GROUP BY lang),
        |     b AS (SELECT lang, n_docs, sum_tokens,
        |             CAST(sum_tokens AS DOUBLE) / SUM(sum_tokens) OVER () AS p,
        |             POWER(CAST(sum_tokens AS DOUBLE) / SUM(sum_tokens) OVER (), 0.3) AS pa
        |           FROM a),
        |     c AS (SELECT lang, n_docs, sum_tokens, p, pa / SUM(pa) OVER () AS w FROM b)
        |SELECT lang, n_docs, sum_tokens,
        |  ROUND(p * 10000) / 10000 AS p_raw,
        |  ROUND(w * 10000) / 10000 AS p_weight,
        |  ROUND(w / p * 10000) / 10000 AS upsample
        |FROM c ORDER BY lang""".stripMargin,

    "q_sample_weighted" ->
      """WITH a AS (SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
        |           FROM documents GROUP BY lang),
        |     b AS (SELECT lang, CAST(sum_tokens AS DOUBLE) / SUM(sum_tokens) OVER () AS p,
        |             POWER(CAST(sum_tokens AS DOUBLE) / SUM(sum_tokens) OVER (), 0.3) AS pa
        |           FROM a),
        |     r AS (SELECT lang, LEAST(CAST(1.0 AS DOUBLE),
        |             CAST(0.5 AS DOUBLE) * (pa / SUM(pa) OVER ()) / p) AS rate FROM b),
        |     rt AS (SELECT lang, rate,
        |             printf('%04x', CAST(FLOOR(ROUND(rate * 10000) / 10000 * 65536) AS BIGINT)) AS thr FROM r),
        |     k AS (SELECT d.lang, rt.rate,
        |             CASE WHEN ROUND(rt.rate * 10000) / 10000 >= 1.0 OR substr(md5(d.text), 1, 4) < rt.thr
        |               THEN 1 ELSE 0 END AS kept
        |           FROM documents d JOIN rt ON d.lang = rt.lang)
        |SELECT lang, COUNT(1) AS n_docs, CAST(SUM(kept) AS BIGINT) AS kept_docs,
        |  ROUND(MIN(rate) * 10000) / 10000 AS target_rate,
        |  ROUND(CAST(SUM(kept) AS DOUBLE) / COUNT(1) * 10000) / 10000 AS kept_frac
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

    "q_split_assign" ->
      """SELECT lang, split, COUNT(1) AS docs FROM (
        |  SELECT lang, CASE WHEN SUBSTRING(md5(text), 1, 2) < 'cc' THEN 'train'
        |                    WHEN SUBSTRING(md5(text), 1, 2) < 'e6' THEN 'val'
        |                    ELSE 'test' END AS split
        |  FROM documents) t
        |GROUP BY lang, split ORDER BY lang, split""".stripMargin,

    "q_chunk_split" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |c AS (SELECT doc_id, len(tk) AS n, tk,
        |        unnest(generate_series(0, CAST(CEIL(GREATEST(len(tk) - 32, 0) / 16.0) AS INT))) AS chunk_idx
        |      FROM d)
        |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
        |  CAST(chunk_idx * 16 AS INT) AS start_tok,
        |  CAST(LEAST(32, n - chunk_idx * 16) AS INT) AS chunk_len,
        |  tk[chunk_idx * 16 + 1] AS head_token
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_contamination" ->
      """WITH d AS (SELECT doc_id, list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |             FOR i IN generate_series(1, len(tk) - 2)]) AS shingles
        |           FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) s
        |           WHERE len(tk) >= 3),
        |ev AS (SELECT DISTINCT unnest(shingles) AS gram FROM d WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id, len(shingles) AS n_grams, unnest(shingles) AS gram
        |       FROM d WHERE doc_id % 97 <> 0)
        |SELECT doc_id, CAST(n_grams AS INT) AS n_grams,
        |  CAST(COUNT(1) AS INT) AS hit_grams,
        |  ROUND(CAST(COUNT(1) AS DOUBLE) / n_grams, 4) AS contamination
        |FROM tr JOIN ev USING (gram)
        |GROUP BY doc_id, n_grams ORDER BY doc_id""".stripMargin,

    "q_pii_scrub" ->
      """SELECT c_custkey,
        |  regexp_replace(c_name, '[0-9]{6,}', '<ID>', 'g') AS scrubbed,
        |  CAST(len(regexp_extract_all(c_name, '[0-9]{6,}')) AS INT) AS n_redactions,
        |  CAST(LENGTH(c_name) - LENGTH(regexp_replace(c_name, '[0-9]{6,}', '', 'g')) AS INT) AS chars_redacted
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_sample_stratified" ->
      """SELECT lang, COUNT(1) AS n_docs,
        |  CAST(SUM(CASE WHEN SUBSTRING(md5(text), 1, 2) <
        |    (CASE WHEN lang = 'en' THEN '80' ELSE '40' END) THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
        |  ROUND(CAST(SUM(CASE WHEN SUBSTRING(md5(text), 1, 2) <
        |    (CASE WHEN lang = 'en' THEN '80' ELSE '40' END) THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(1), 4) AS kept_frac
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_pack_sequences" ->
      """WITH d AS (SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
        |           FROM documents),
        |c AS (SELECT lang, doc_id, n_tokens,
        |        CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |      FROM d)
        |SELECT lang, CAST(FLOOR((cum - n_tokens) / 2048.0) AS BIGINT) AS seq_id,
        |  COUNT(1) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |  ROUND(CAST(SUM(n_tokens) AS DOUBLE) / 2048.0, 4) AS fill_ratio
        |FROM c GROUP BY lang, seq_id ORDER BY lang, seq_id""".stripMargin,

    "q_multimodal_stats" ->
      """SELECT lang, label, COUNT(1) AS cnt, ROUND(AVG(n_chars), 2) AS avg_chars,
        |  ROUND(AVG(sqrt(list_sum([x * x FOR x IN CAST(embedding AS DOUBLE[])]))), 4) AS avg_norm
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |GROUP BY lang, label ORDER BY lang, label""".stripMargin,

    "q_multimodal_decode" ->
      """SELECT lang, COUNT(1) AS cnt,
        |  ROUND(AVG(64 + strlen(text) % 640), 2) AS avg_width,
        |  ROUND(AVG(64 + strlen(text) % 480), 2) AS avg_height,
        |  CAST(MAX(strlen(text)) AS INT) AS max_bytes
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_multimodal_frames" ->
      """WITH m AS (
        |  SELECT doc_id, lang, strlen(text) AS n_bytes,
        |    1 + strlen(text) % 16 AS frames,
        |    CAST(FLOOR((64 + strlen(text) % 640) / 2) AS INT) AS rs_width,
        |    CAST(FLOOR((64 + strlen(text) % 480) / 2) AS INT) AS rs_height
        |  FROM documents),
        |f AS (SELECT doc_id, lang, rs_width, rs_height,
        |        unnest(generate_series(0, frames - 1)) AS frame_idx
        |      FROM m)
        |SELECT lang, COUNT(1) AS sampled_frames, COUNT(DISTINCT doc_id) AS docs,
        |  ROUND(AVG(rs_width), 2) AS avg_rs_width,
        |  ROUND(AVG(rs_height), 2) AS avg_rs_height
        |FROM f WHERE frame_idx % 4 = 0
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // the oracle recomputes the GM01 header fields ARITHMETICALLY from the
    // doc columns the fixture encoded them from (doc_id, n_chars — not
    // derivable from body length), while the Spark side must recover them
    // from the payload BYTES it wrote: an endianness/offset/magic bug on
    // either side fails the hash instead of cancelling out
    "q_multimodal_parse" ->
      """SELECT lang,
        |  COUNT(1) FILTER (WHERE doc_id % 97 <> 0) AS cnt_ok,
        |  COUNT(1) FILTER (WHERE doc_id % 97 = 0) AS cnt_bad,
        |  ROUND(AVG(64 + n_chars % 640) FILTER (WHERE doc_id % 97 <> 0), 2) AS avg_width,
        |  ROUND(AVG(64 + (n_chars * 7) % 480) FILTER (WHERE doc_id % 97 <> 0), 2) AS avg_height,
        |  CAST(SUM(1 + doc_id % 4) FILTER (WHERE doc_id % 97 <> 0) AS BIGINT) AS sum_channels,
        |  CAST(MAX(1 + n_chars % 16) FILTER (WHERE doc_id % 97 <> 0) AS INT) AS max_frames,
        |  CAST(SUM(strlen(text)) FILTER (WHERE doc_id % 97 <> 0) AS BIGINT) AS sum_body_bytes
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // NOTE: ascii(substr(text, ...)) samples CHARACTERS while Spark
    // samples body BYTES — equivalent ONLY because the documents fixture
    // is pure ASCII (asserted: strlen == length at every SF). A non-ASCII
    // fixture would fail this gate loudly rather than silently diverge.
    "q_multimodal_body" ->
      """WITH amps AS (
        |  SELECT lang, doc_id % 97 = 0 AS bad,
        |    [ascii(substr(text, 1 + i*7, 1)) FOR i IN generate_series(0, (strlen(text)-1)//7)] AS a
        |  FROM documents)
        |SELECT lang,
        |  COUNT(1) FILTER (WHERE NOT bad) AS cnt_ok,
        |  COUNT(1) FILTER (WHERE bad) AS cnt_bad,
        |  CAST(SUM(len(a)) FILTER (WHERE NOT bad) AS BIGINT) AS n_samples,
        |  ROUND(SUM(list_sum(a)) FILTER (WHERE NOT bad) / SUM(len(a)) FILTER (WHERE NOT bad) * 10000) / 10000 AS mean_amp,
        |  CAST(MAX(list_max(a)) FILTER (WHERE NOT bad) AS INT) AS max_amp
        |FROM amps GROUP BY lang ORDER BY lang""".stripMargin,
  )
}
