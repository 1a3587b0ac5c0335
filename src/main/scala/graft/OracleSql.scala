package graft

/** DuckDB-runnable ANSI SQL oracles for SparkEntry.queries. Each mirrors
  * the Spark computation exactly (same arithmetic order, same rounding,
  * same column names/types) so the driver's sorted-column value-hash
  * compare passes. LISA permutation queries have no SQL equivalent and
  * are intentionally omitted (rows-only check).
  */
object OracleSql {

  /** Deterministic point derivation — must match SynthGeo.customerPoints
    * bit-for-bit (integer modulo then exact-double multiply).
    */
  private val PTS =
    """pts AS (
      SELECT CAST(c_custkey AS BIGINT) AS gid,
             CAST((c_custkey * 193) % 997 AS DOUBLE) * 0.13 AS x,
             CAST((c_custkey * 499) % 991 AS DOUBLE) * 0.17 AS y
      FROM customer)"""

  private val VALS =
    """vals AS (
      SELECT CAST(c_custkey AS BIGINT) AS gid,
             CAST(c_acctbal AS DOUBLE) AS value
      FROM customer)"""

  private val RATES =
    """r AS (
      SELECT CAST(c_custkey AS BIGINT) AS gid,
             CAST((c_custkey * 7) % 30 + 1 AS DOUBLE) AS e,
             CAST((c_custkey % 100) + 50 AS DOUBLE) AS b
      FROM customer)"""

  /** kNN(4) ranked pairs via window over the cross join — the oracle for
    * the cell-ring kNN engine.
    */
  private val KNN4 =
    s"""$PTS,
      allpairs AS (
        SELECT a.gid AS gid, b.gid AS nbr,
               sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) AS dist
        FROM pts a JOIN pts b ON a.gid <> b.gid),
      knn AS (
        SELECT gid, nbr, rk FROM (
          SELECT gid, nbr, dist,
                 row_number() OVER (PARTITION BY gid ORDER BY dist, nbr) AS rk
          FROM allpairs) t
        WHERE rk <= 4)"""

  private val CELLS =
    """cells AS (
      SELECT CAST(p_partkey AS BIGINT) AS gid,
             CAST(p_partkey % 45 AS BIGINT) AS cx,
             CAST(floor(p_partkey / 45.0) AS BIGINT) AS cy
      FROM part)"""

  /** GeoDa percentile (plotting positions + linear interpolation) over
    * CTEs `s(val, rk)` and `n(cnt)`; `pctExpr` is a SQL double expr.
    */
  private def pct(pctExpr: String): String =
    s"""(SELECT CASE
          WHEN $pctExpr <= 100.0/cnt*0.5 THEN (SELECT val FROM s WHERE rk = 0)
          WHEN $pctExpr >= 100.0/cnt*(cnt-0.5) THEN (SELECT val FROM s WHERE rk = CAST(cnt AS BIGINT)-1)
          ELSE (SELECT s1.val + ($pctExpr*cnt/100.0 - 0.5 - floor($pctExpr*cnt/100.0 - 0.5)) * (s2.val - s1.val)
                FROM s s1, s s2
                WHERE s1.rk = CAST(floor($pctExpr*cnt/100.0 - 0.5) AS BIGINT)
                  AND s2.rk = CAST(least(floor($pctExpr*cnt/100.0 - 0.5)+1, cnt-1) AS BIGINT))
        END FROM n)"""

  private val SORTED_VALS =
    """t AS (SELECT CAST(c_acctbal AS DOUBLE) AS val FROM customer),
      s AS (SELECT val, row_number() OVER (ORDER BY val) - 1 AS rk FROM t),
      n AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM t)"""

  private def hingeSql(h: String): String =
    s"""WITH $SORTED_VALS,
       qs AS (SELECT ${pct("25.0")} AS q1, ${pct("50.0")} AS q2,
                     ${pct("75.0")} AS q3)
       SELECT bidx, brk FROM (
         SELECT CAST(1 AS BIGINT) AS bidx, round(q1 - $h*(q3-q1), 4) AS brk FROM qs
         UNION ALL SELECT CAST(2 AS BIGINT), round(q1, 4) FROM qs
         UNION ALL SELECT CAST(3 AS BIGINT), round(q2, 4) FROM qs
         UNION ALL SELECT CAST(4 AS BIGINT), round(q3, 4) FROM qs
         UNION ALL SELECT CAST(5 AS BIGINT), round(q3 + $h*(q3-q1), 4) FROM qs) t
       ORDER BY bidx"""

  val all: Map[String, String] = Map(
    "q01_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base,
           count(*) AS n_rows
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",

    "q02_join_agg" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
           count(*) AS n_orders
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",

    "q03_window_top_order" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) t
         WHERE rn = 1 ORDER BY o_custkey""",

    "q04_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",

    "q05_anti_join" ->
      """SELECT c_custkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_totalprice > 200000.0)
         ORDER BY c_custkey""",

    "q10_points_cells" ->
      s"""WITH $PTS
         SELECT gid, x, y,
           (CAST(floor(x / 4.0) AS BIGINT) + 1048576) * 2097152 +
           (CAST(floor(y / 4.0) AS BIGINT) + 1048576) AS cell
         FROM pts ORDER BY gid""",

    "q11_knn_pairs" ->
      s"""WITH $KNN4
         SELECT gid, nbr, CAST(rk AS BIGINT) AS rk FROM knn
         ORDER BY gid, rk""",

    "q12_distband_pairs" ->
      s"""WITH $PTS
         SELECT a.gid AS gid, b.gid AS nbr
         FROM pts a JOIN pts b ON a.gid <> b.gid
         WHERE sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) <= 8.0
         ORDER BY gid, nbr""",

    "q13_min_dist_threshold" ->
      s"""WITH $PTS,
         mind AS (
           SELECT a.gid, min(sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y))) AS d
           FROM pts a JOIN pts b ON a.gid <> b.gid GROUP BY a.gid)
         SELECT max(d) AS mdt FROM mind""",

    "q14_spatial_lag" ->
      s"""WITH $KNN4, $VALS
         SELECT k.gid AS gid, round(avg(v.value), 4) AS lag
         FROM knn k JOIN vals v ON k.nbr = v.gid
         GROUP BY k.gid ORDER BY gid""",

    "q15_moran_stat" ->
      s"""WITH $KNN4, $VALS,
         z AS (SELECT gid,
                 (value - avg(value) OVER ()) / stddev_samp(value) OVER () AS z
               FROM vals),
         lagt AS (SELECT k.gid, avg(z2.z) AS lag
                  FROM knn k JOIN z z2 ON k.nbr = z2.gid GROUP BY k.gid)
         SELECT z.gid AS gid, round(z.z * lagt.lag, 4) AS moran_i
         FROM z JOIN lagt ON z.gid = lagt.gid ORDER BY gid""",

    "q16_queen_pairs" ->
      s"""WITH $CELLS
         SELECT a.gid AS gid, b.gid AS nbr
         FROM cells a JOIN cells b
           ON a.gid <> b.gid AND abs(a.cx-b.cx) <= 1 AND abs(a.cy-b.cy) <= 1
         ORDER BY gid, nbr""",

    "q17_rook_pairs" ->
      s"""WITH $CELLS
         SELECT a.gid AS gid, b.gid AS nbr
         FROM cells a JOIN cells b
           ON a.gid <> b.gid AND abs(a.cx-b.cx) + abs(a.cy-b.cy) = 1
         ORDER BY gid, nbr""",

    "q18_queen_order2" ->
      s"""WITH $CELLS,
         adj AS (
           SELECT a.gid AS gid, b.gid AS nbr
           FROM cells a JOIN cells b
             ON a.gid <> b.gid AND abs(a.cx-b.cx) <= 1 AND abs(a.cy-b.cy) <= 1),
         hop2 AS (
           SELECT DISTINCT a.gid AS gid, b.nbr AS nbr
           FROM adj a JOIN adj b ON a.nbr = b.gid WHERE a.gid <> b.nbr)
         SELECT gid, nbr FROM (
           SELECT gid, nbr FROM hop2 EXCEPT SELECT gid, nbr FROM adj) t
         ORDER BY gid, nbr""",

    "q19_pip_join" ->
      s"""WITH $PTS, $CELLS
         SELECT p.gid AS gid, c.gid AS pid
         FROM pts p JOIN cells c
           ON p.x >= c.cx * 4.0 - 0.0005 AND p.x < (c.cx + 1) * 4.0 - 0.0005
          AND p.y >= c.cy * 4.0 - 0.0005 AND p.y < (c.cy + 1) * 4.0 - 0.0005
         ORDER BY gid, pid""",

    "q20_excess_risk" ->
      s"""WITH $RATES,
         tot AS (SELECT sum(e) AS se, sum(b) AS sb FROM r)
         SELECT gid, e / b / (se / sb) AS risk FROM r, tot ORDER BY gid""",

    "q21_eb_rate" ->
      s"""WITH $RATES,
         tot AS (SELECT sum(e) AS se, sum(b) AS sb,
                        CAST(count(*) AS DOUBLE) AS n FROM r),
         t1t AS (SELECT gid, e, b, e/b AS rr, se/sb AS t1, sb, n FROM r, tot),
         t2t AS (SELECT greatest(
                   sum(b*(rr-t1)*(rr-t1))/max(sb) - max(t1)/(max(sb)/max(n)),
                   0.0) AS t2 FROM t1t)
         SELECT gid,
           round((t2/(t2 + t1/b)) * rr + (1 - t2/(t2 + t1/b)) * t1, 6) AS ebrate
         FROM t1t, t2t ORDER BY gid""",

    "q22_spatial_rate" ->
      s"""WITH $KNN4, $RATES,
         nbrs AS (SELECT k.gid, sum(r2.e) AS sne, sum(r2.b) AS snb
                  FROM knn k JOIN r r2 ON k.nbr = r2.gid GROUP BY k.gid)
         SELECT r.gid AS gid,
           (r.e + coalesce(sne, 0.0)) / (r.b + coalesce(snb, 0.0)) AS srate
         FROM r LEFT JOIN nbrs ON r.gid = nbrs.gid ORDER BY gid""",

    "q23_spatial_eb" ->
      s"""WITH $KNN4, $RATES,
         hoodpairs AS (
           SELECT gid, nbr FROM knn
           UNION ALL SELECT gid, gid AS nbr FROM r),
         nb AS (SELECT h.gid, r2.e AS ev, r2.b AS bv
                FROM hoodpairs h JOIN r r2 ON h.nbr = r2.gid),
         hood AS (SELECT gid, sum(ev) AS se, sum(bv) AS sb,
                         CAST(count(*) AS DOUBLE) AS n FROM nb GROUP BY gid),
         wt1 AS (SELECT nb.gid, nb.ev, nb.bv, nb.ev/nb.bv AS rr,
                        h.se/h.sb AS t1, h.sb, h.n
                 FROM nb JOIN hood h ON nb.gid = h.gid),
         t2 AS (SELECT gid,
                  sum(bv*(rr-t1)*(rr-t1))/max(sb) - max(t1)/(max(sb)/max(n)) AS t2raw,
                  max(t1) AS t1 FROM wt1 GROUP BY gid)
         SELECT r.gid AS gid,
           round((greatest(t2raw, 0.0)/(greatest(t2raw, 0.0) + t1/r.b)) * (r.e/r.b)
             + (1 - greatest(t2raw, 0.0)/(greatest(t2raw, 0.0) + t1/r.b)) * t1,
             6) AS sebrate
         FROM r LEFT JOIN t2 ON r.gid = t2.gid ORDER BY gid""",

    "q24_hinge15_breaks" -> hingeSql("1.5"),
    "q24b_hinge30_breaks" -> hingeSql("3.0"),

    "q25_stddev_breaks" ->
      s"""WITH m AS (SELECT avg(CAST(c_acctbal AS DOUBLE)) AS mu,
                            stddev_samp(CAST(c_acctbal AS DOUBLE)) AS sd
                     FROM customer)
         SELECT bidx, brk FROM (
           SELECT CAST(1 AS BIGINT) AS bidx, round(mu - 2*sd, 4) AS brk FROM m
           UNION ALL SELECT CAST(2 AS BIGINT), round(mu - sd, 4) FROM m
           UNION ALL SELECT CAST(3 AS BIGINT), round(mu, 4) FROM m
           UNION ALL SELECT CAST(4 AS BIGINT), round(mu + sd, 4) FROM m
           UNION ALL SELECT CAST(5 AS BIGINT), round(mu + 2*sd, 4) FROM m) t
         ORDER BY bidx""",

    "q26_quantile_breaks" ->
      s"""WITH $SORTED_VALS
         SELECT bidx, brk FROM (
           SELECT CAST(1 AS BIGINT) AS bidx, round(${pct("(100.0 * 1) / 6")}, 4) AS brk
           UNION ALL SELECT CAST(2 AS BIGINT), round(${pct("(100.0 * 2) / 6")}, 4)
           UNION ALL SELECT CAST(3 AS BIGINT), round(${pct("(100.0 * 3) / 6")}, 4)
           UNION ALL SELECT CAST(4 AS BIGINT), round(${pct("(100.0 * 4) / 6")}, 4)
           UNION ALL SELECT CAST(5 AS BIGINT), round(${pct("(100.0 * 5) / 6")}, 4)) t
         ORDER BY bidx""",

    "q26b_percentile_breaks" ->
      s"""WITH $SORTED_VALS
         SELECT bidx, brk FROM (
           SELECT CAST(1 AS BIGINT) AS bidx, round(${pct("1.0")}, 4) AS brk
           UNION ALL SELECT CAST(2 AS BIGINT), round(${pct("10.0")}, 4)
           UNION ALL SELECT CAST(3 AS BIGINT), round(${pct("50.0")}, 4)
           UNION ALL SELECT CAST(4 AS BIGINT), round(${pct("90.0")}, 4)
           UNION ALL SELECT CAST(5 AS BIGINT), round(${pct("99.0")}, 4)) t
         ORDER BY bidx""",

    "q61_codec_roundtrip" ->
      s"""WITH $KNN4
         SELECT gid, count(*) AS n_nbrs, min(nbr) AS nbr_min
         FROM knn GROUP BY gid ORDER BY gid""",

    "q63_weights_astext" ->
      s"""WITH $KNN4
         SELECT gid, CAST(gid AS VARCHAR) || ':[' ||
           string_agg(CAST(nbr AS VARCHAR), ',' ORDER BY rk) || ']' AS txt
         FROM knn GROUP BY gid ORDER BY gid""",

    "q64_rasterize" ->
      s"""WITH $PTS,
         r AS (SELECT (CAST(floor(x / 4.0) AS BIGINT) + 1048576) * 2097152 +
                      (CAST(floor(y / 4.0) AS BIGINT) + 1048576) AS cell,
                      x FROM pts)
         SELECT cell, count(*) AS n, round(sum(x), 4) AS sum_val,
                round(avg(x), 4) AS avg_val
         FROM r GROUP BY cell ORDER BY cell""",

    "q65_vectorize" ->
      s"""WITH $PTS,
         r AS (SELECT DISTINCT
                 (CAST(floor(x / 4.0) AS BIGINT) + 1048576) * 2097152 +
                 (CAST(floor(y / 4.0) AS BIGINT) + 1048576) AS cell FROM pts)
         SELECT cell,
           CAST((cell - (cell % 2097152)) / 2097152 - 1048576 AS DOUBLE) * 4.0 AS x0,
           CAST((cell % 2097152) - 1048576 AS DOUBLE) * 4.0 AS y0
         FROM r ORDER BY cell""",

    "q66_zonal_stats" ->
      s"""WITH $PTS, $CELLS,
         praster AS (
           SELECT (CAST(floor(x / 4.0) AS BIGINT) + 1048576) * 2097152 +
                  (CAST(floor(y / 4.0) AS BIGINT) + 1048576) AS cell,
                  count(*) AS n
           FROM pts GROUP BY 1),
         zone AS (
           SELECT gid AS pid,
                  (cx + 1048576) * 2097152 + (cy + 1048576) AS cell
           FROM cells)
         SELECT z.pid AS pid, CAST(sum(p.n) AS BIGINT) AS n_points,
                count(*) AS n_cells
         FROM zone z JOIN praster p ON z.cell = p.cell
         GROUP BY z.pid ORDER BY pid""",

    "q50_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n
         FROM documents GROUP BY md5(text) ORDER BY h""",

    "q51_token_count" ->
      """SELECT doc_id,
           CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
             AS n_tokens
         FROM documents ORDER BY doc_id""",

    "q52_text_quality" ->
      """SELECT doc_id,
           CAST(length(text) AS BIGINT) AS len,
           CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)
             AS n_spaces,
           CAST(length(text) - length(replace(text, '.', '')) AS BIGINT)
             AS n_periods,
           round(CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
             / CAST(length(text) AS DOUBLE), 6) AS space_ratio
         FROM documents ORDER BY doc_id""",

    "q60_event_hourly" ->
      """SELECT event_type,
           CAST(floor(epoch(ts) / 3600.0) AS BIGINT) AS hr,
           count(*) AS n, round(sum(value), 4) AS sum_val
         FROM events GROUP BY 1, 2 ORDER BY 1, 2"""
  )
}
