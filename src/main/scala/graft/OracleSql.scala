package graft

/** DuckDB-runnable ANSI SQL oracles for SparkEntry.queries. Each mirrors
  * the Spark computation exactly (same arithmetic order, same rounding,
  * same column names/types) so the driver's sorted-column value-hash
  * compare passes. LISA queries oracle-check their statistic columns in
  * SQL; the permutation p-values and cluster labels (no SQL equivalent)
  * are value-checked by committed goldens plus the independent C-harness
  * pins on Guerry (GuerrySpec).
  *
  * Rendering convention: every `round(...)` is wrapped `(round(...) + 0.0)`.
  * DuckDB's round preserves IEEE sign-of-zero (round(-1e-6, 4) = -0.0) while
  * Spark's round goes through BigDecimal, which has no signed zero — so a
  * tiny negative rounding to zero renders "-0.0" on the oracle side and
  * "0.0" on the Spark side, failing the driver's value-hash compare even
  * though the numbers are equal (r5's q101 red cell). `x + 0.0` maps -0.0
  * to +0.0 and is the identity on every other double, eliminating the
  * whole class at zero numeric cost.
  */
object OracleSql {

  /** Shared IVFADC oracle chain (q109 + q111): coarse IVF train,
    * bucketing, residuals, residual-PQ train+encode, probes, per-cell
    * LUT parts, ADC scores, rank. Ends with the `ranked` CTE.
    */
  private val IvfAdcCtes: String = """nrm AS (
           SELECT vec_id AS id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         u AS (
           SELECT id, CASE WHEN nr = 0 THEN v
                      ELSE list_transform(v, x -> x / nr) END AS unit
           FROM (SELECT id, v,
                   sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum'))
                     AS nr
                 FROM nrm) t),
         cseeds AS (
           SELECT CAST(row_number() OVER (ORDER BY id) AS INT) - 1 AS cid,
                  unit AS cunit
           FROM (SELECT id, unit FROM u ORDER BY id LIMIT 8) s),
         csim1 AS (
           SELECT c.id, c.unit, s.cid,
             list_aggregate(list_transform(range(1, len(c.unit) + 1),
               i -> c.unit[i] * s.cunit[i]), 'sum') AS sim
           FROM u c CROSS JOIN cseeds s),
         casg AS (SELECT id, unit, cid FROM (
             SELECT id, unit, cid, row_number() OVER (PARTITION BY id
               ORDER BY sim DESC, cid) AS rk FROM csim1) t
           WHERE rk = 1),
         ccpos AS (
           SELECT cid, pos, avg(unit[CAST(pos AS INT)]) AS m
           FROM (SELECT cid, unit, unnest(range(1, len(unit) + 1)) AS pos
                 FROM casg) x
           GROUP BY cid, pos),
         ccent AS (SELECT cid, list(m ORDER BY pos) AS cunit
                   FROM ccpos GROUP BY cid),
         csim2 AS (
           SELECT c.id, c.unit, ct.cid,
             list_aggregate(list_transform(range(1, len(c.unit) + 1),
               i -> c.unit[i] * ct.cunit[i]), 'sum') AS sim
           FROM u c CROSS JOIN ccent ct),
         bucketed AS (SELECT id, unit, cid AS ccid FROM (
             SELECT id, unit, cid, row_number() OVER (PARTITION BY id
               ORDER BY sim DESC, cid) AS rk FROM csim2) t
           WHERE rk = 1),
         resid AS (
           SELECT b.id, b.ccid,
             list_transform(range(1, len(b.unit) + 1),
               i -> b.unit[i] - ct.cunit[i]) AS runit
           FROM bucketed b JOIN ccent ct ON ct.cid = b.ccid),
         js AS (SELECT CAST(unnest(range(0, 4)) AS INT) AS sub),
         subsr AS (
           SELECT id, ccid, sub, runit[(sub*16+1):((sub+1)*16)] AS svec
           FROM resid CROSS JOIN js),
         rseeds0 AS (
           SELECT CAST(row_number() OVER (ORDER BY id) AS INT) - 1 AS cid,
                  runit
           FROM (SELECT id, runit FROM resid ORDER BY id LIMIT 8) s),
         rseeds AS (
           SELECT sub, cid, runit[(sub*16+1):((sub+1)*16)] AS cvec
           FROM rseeds0 CROSS JOIN js),
         rseedsn AS (
           SELECT sub, cid, cvec,
             list_aggregate(list_transform(cvec, x -> x * x), 'sum') AS cn2
           FROM rseeds),
         rsc1 AS (
           SELECT s.id, s.sub, s.svec, c.cid,
             list_aggregate(list_transform(range(1, len(s.svec) + 1),
               i -> s.svec[i] * c.cvec[i]), 'sum') - 0.5 * c.cn2 AS score
           FROM subsr s JOIN rseedsn c ON s.sub = c.sub),
         rasg AS (SELECT id, sub, svec, cid FROM (
             SELECT id, sub, svec, cid, row_number() OVER (
               PARTITION BY id, sub ORDER BY score DESC, cid) AS rk
             FROM rsc1) t WHERE rk = 1),
         rcpos AS (
           SELECT sub, cid, pos, avg(svec[CAST(pos AS INT)]) AS mval
           FROM (SELECT sub, cid, svec,
                   unnest(range(1, len(svec) + 1)) AS pos
                 FROM rasg) x
           GROUP BY sub, cid, pos),
         rcent AS (SELECT sub, cid, list(mval ORDER BY pos) AS cvec
                   FROM rcpos GROUP BY sub, cid),
         rcentn AS (
           SELECT sub, cid, cvec,
             list_aggregate(list_transform(cvec, x -> x * x), 'sum') AS cn2
           FROM rcent),
         rsc2 AS (
           SELECT s.id, s.ccid, s.sub, c.cid,
             list_aggregate(list_transform(range(1, len(s.svec) + 1),
               i -> s.svec[i] * c.cvec[i]), 'sum') - 0.5 * c.cn2 AS score
           FROM subsr s JOIN rcentn c ON s.sub = c.sub),
         codes AS (SELECT id, ccid, sub, cid AS code FROM (
             SELECT id, ccid, sub, cid, row_number() OVER (
               PARTITION BY id, sub ORDER BY score DESC, cid) AS rk
             FROM rsc2) t WHERE rk = 1),
         qprobe0 AS (
           SELECT q.id AS qid, q.unit AS qunit, ct.cid AS ccid,
             ct.cunit,
             list_aggregate(list_transform(range(1, len(q.unit) + 1),
               i -> q.unit[i] * ct.cunit[i]), 'sum') AS sim
           FROM u q CROSS JOIN ccent ct WHERE q.id < 5),
         qprobe AS (SELECT qid, ccid, sim AS qc, qunit, cunit FROM (
             SELECT qid, ccid, sim, qunit, cunit, row_number() OVER (
               PARTITION BY qid ORDER BY sim DESC, ccid) AS rk
             FROM qprobe0) t WHERE rk <= 2),
         qres AS (
           SELECT qid, ccid, qc,
             list_transform(range(1, len(qunit) + 1),
               i -> qunit[i] - cunit[i]) AS runit
           FROM qprobe),
         qsubr AS (
           SELECT qid, ccid, qc, sub,
                  runit[(sub*16+1):((sub+1)*16)] AS svec
           FROM qres CROSS JOIN js),
         parts AS (
           SELECT q.qid, c.id, q.qc, c.sub,
             list_aggregate(list_transform(range(1, len(q.svec) + 1),
               i -> q.svec[i] * ct.cvec[i]), 'sum') AS p
           FROM codes c
           JOIN qsubr q ON q.ccid = c.ccid AND q.sub = c.sub
           JOIN rcentn ct ON ct.sub = c.sub AND ct.cid = c.code
           WHERE c.id <> q.qid),
         scored AS (
           SELECT qid, id,
             any_value(qc) + list_aggregate(list(p ORDER BY sub), 'sum')
               AS cosine
           FROM parts GROUP BY qid, id),
         ranked AS (SELECT qid, id, cosine,
             row_number() OVER (PARTITION BY qid
               ORDER BY cosine DESC, id) AS rk
           FROM scored)"""


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
        SELECT gid, nbr, dist, rk FROM (
          SELECT gid, nbr, dist,
                 row_number() OVER (PARTITION BY gid ORDER BY dist, nbr) AS rk
          FROM allpairs) t
        WHERE rk <= 4)"""

  /** kNN(6) variant (neighbor-match geometry side). */
  private val KNN6 =
    s"""$PTS,
      allpairs AS (
        SELECT a.gid AS gid, b.gid AS nbr,
               sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) AS dist
        FROM pts a JOIN pts b ON a.gid <> b.gid),
      knn6 AS (
        SELECT gid, nbr FROM (
          SELECT gid, nbr, dist,
                 row_number() OVER (PARTITION BY gid ORDER BY dist, nbr) AS rk
          FROM allpairs) t
        WHERE rk <= 6)"""

  /** binary indicator var used by the join-count queries — mirrors
    * SparkEntry.binaryVar bit-for-bit (integer modulo).
    */
  private val BINVAR =
    """bin AS (
      SELECT CAST(c_custkey AS BIGINT) AS gid,
             CASE WHEN (c_custkey * 13) % 7 < 3 THEN 1.0 ELSE 0.0 END AS x
      FROM customer)"""

  /** standardized value vector (GeoDa sample-sd convention). */
  private val ZVALS =
    """z AS (
      SELECT gid,
             (value - avg(value) OVER ()) / stddev_samp(value) OVER () AS z
      FROM vals)"""

  private val CELLS =
    """cells AS (
      SELECT CAST(p_partkey AS BIGINT) AS gid,
             CAST(p_partkey % 45 AS BIGINT) AS cx,
             CAST(floor(p_partkey / 45.0) AS BIGINT) AS cy
      FROM part)"""

  /** GeoDa percentile (plotting positions + linear interpolation) over
    * CTEs `sT(val, rk)` and `nT(cnt)`; `pctExpr` is a SQL double expr.
    */
  private def pctT(pctExpr: String, sT: String, nT: String): String =
    s"""(SELECT CASE
          WHEN $pctExpr <= 100.0/cnt*0.5 THEN (SELECT val FROM $sT WHERE rk = 0)
          WHEN $pctExpr >= 100.0/cnt*(cnt-0.5) THEN (SELECT val FROM $sT WHERE rk = CAST(cnt AS BIGINT)-1)
          ELSE (SELECT s1.val + ($pctExpr*cnt/100.0 - 0.5 - floor($pctExpr*cnt/100.0 - 0.5)) * (s2.val - s1.val)
                FROM $sT s1, $sT s2
                WHERE s1.rk = CAST(floor($pctExpr*cnt/100.0 - 0.5) AS BIGINT)
                  AND s2.rk = CAST(least(floor($pctExpr*cnt/100.0 - 0.5)+1, cnt-1) AS BIGINT))
        END FROM $nT)"""

  private def pct(pctExpr: String): String = pctT(pctExpr, "s", "n")

  private val SORTED_VALS =
    """t AS (SELECT CAST(c_acctbal AS DOUBLE) AS val FROM customer),
      s AS (SELECT val, row_number() OVER (ORDER BY val) - 1 AS rk FROM t),
      n AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM t)"""

  /** super-tile assignment over `pts` — mirrors Tiling.cellIdCol at
    * tileSize 40.0 (the tile queries q67-q74).
    */
  private val TILES40 =
    """tiles AS (SELECT gid,
         (CAST(floor(x / 40.0) AS BIGINT) + 1048576) * 2097152 +
         (CAST(floor(y / 40.0) AS BIGINT) + 1048576) AS tile
       FROM pts)"""

  /** Per-TILE GeoDa percentile break: one row per tile with the break at
    * `pctExpr` over rank table `sT(tile, val, rk)` and count table
    * `tc(tile, cnt)`. The sa/sb join ranks are clamped into [0, cnt-1] —
    * out-of-range ranks only arise when a WHEN branch (not ELSE) is
    * taken, so clamping never changes the selected value but keeps the
    * inner joins from dropping single-row tiles.
    */
  private def tileBrkCte(name: String, pctExpr: String, sT: String,
                         extraFrom: String = ""): String =
    s"""$name AS (
       SELECT c.tile,
         CASE WHEN $pctExpr <= 100.0 / c.cnt * 0.5 THEN s0.val
              WHEN $pctExpr >= 100.0 / c.cnt * (c.cnt - 0.5) THEN sl.val
              ELSE sa.val + ($pctExpr * c.cnt / 100.0 - 0.5
                     - floor($pctExpr * c.cnt / 100.0 - 0.5))
                   * (sb.val - sa.val)
         END AS brk
       FROM tc c $extraFrom
       JOIN $sT s0 ON s0.tile = c.tile AND s0.rk = 0
       JOIN $sT sl ON sl.tile = c.tile AND sl.rk = CAST(c.cnt AS BIGINT) - 1
       JOIN $sT sa ON sa.tile = c.tile AND sa.rk =
         CAST(greatest(floor($pctExpr * c.cnt / 100.0 - 0.5), 0) AS BIGINT)
       JOIN $sT sb ON sb.tile = c.tile AND sb.rk =
         CAST(least(greatest(floor($pctExpr * c.cnt / 100.0 - 0.5), 0) + 1,
                    c.cnt - 1) AS BIGINT))"""

  private def hingeSql(h: String): String =
    s"""WITH $SORTED_VALS,
       qs AS (SELECT ${pct("25.0")} AS q1, ${pct("50.0")} AS q2,
                     ${pct("75.0")} AS q3)
       SELECT bidx, brk FROM (
         SELECT CAST(1 AS BIGINT) AS bidx, (round(q1 - $h*(q3-q1), 4) + 0.0) AS brk FROM qs
         UNION ALL SELECT CAST(2 AS BIGINT), (round(q1, 4) + 0.0) FROM qs
         UNION ALL SELECT CAST(3 AS BIGINT), (round(q2, 4) + 0.0) FROM qs
         UNION ALL SELECT CAST(4 AS BIGINT), (round(q3, 4) + 0.0) FROM qs
         UNION ALL SELECT CAST(5 AS BIGINT), (round(q3 + $h*(q3-q1), 4) + 0.0) FROM qs) t
       ORDER BY bidx"""

  val all: Map[String, String] = Map(
    "q01_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           (round(sum(l_extendedprice), 2) + 0.0) AS sum_base,
           count(*) AS n_rows
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",

    "q02_join_agg" ->
      """SELECT n_name, (round(sum(o_totalprice), 2) + 0.0) AS revenue,
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
         SELECT k.gid AS gid, (round(avg(v.value), 4) + 0.0) AS lag
         FROM knn k JOIN vals v ON k.nbr = v.gid
         GROUP BY k.gid ORDER BY gid""",

    // global Moran's I with Cliff-Ord moments: S0/S1/S2 replayed over
    // the row-standardized kNN graph, variance under normality and
    // randomization
    "q91_global_moran" ->
      s"""WITH $KNN4, $VALS,
         deg AS (SELECT gid, count(*) AS d FROM knn GROUP BY gid),
         w AS (SELECT k.gid, k.nbr, 1.0/deg.d AS w
               FROM knn k JOIN deg USING (gid)),
         wr AS (SELECT a.gid, a.nbr, a.w, b.w AS wrev
                FROM w a LEFT JOIN w b
                  ON b.gid = a.nbr AND b.nbr = a.gid),
         s01 AS (SELECT sum(w) AS s0,
                   sum(pow(w + coalesce(wrev, 0), 2) /
                     (CASE WHEN wrev IS NULL THEN 1.0 ELSE 2.0 END)) AS s1
                 FROM wr),
         rsums AS (SELECT gid, sum(w) AS rsum FROM w GROUP BY gid),
         csums AS (SELECT nbr AS gid, sum(w) AS csum FROM w GROUP BY nbr),
         s2t AS (SELECT sum(pow(coalesce(rsum, 0) + coalesce(csum, 0), 2))
                   AS s2
                 FROM rsums FULL JOIN csums USING (gid)),
         mt AS (SELECT avg(value) AS m FROM vals),
         zm AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                  sum(pow(value - m, 2)) AS sz2,
                  sum(pow(value - m, 4)) AS sz4
                FROM vals, mt),
         numt AS (SELECT sum(w.w * (vi.value - m) * (vj.value - m)) AS num
                  FROM w JOIN vals vi ON w.gid = vi.gid
                         JOIN vals vj ON w.nbr = vj.gid, mt),
         base AS (SELECT n, s0, s1, s2, n/s0*num/sz2 AS i,
                    -1.0/(n-1) AS e_i, n*sz4/(sz2*sz2) AS k
                  FROM numt, s01, s2t, zm),
         v AS (SELECT i, e_i,
                 (n*n*s1 - n*s2 + 3*s0*s0)/((n*n-1)*s0*s0) - e_i*e_i
                   AS var_norm,
                 (n*((n*n-3*n+3)*s1 - n*s2 + 3*s0*s0)
                   - k*((n*n-n)*s1 - 2*n*s2 + 6*s0*s0))
                   / ((n-1)*(n-2)*(n-3)*s0*s0) - e_i*e_i AS var_rand
               FROM base)
         SELECT (round(i, 6) + 0.0) AS i, (round(e_i, 6) + 0.0) AS e_i,
           (round(var_norm, 8) + 0.0) AS var_norm,
           (round((i-e_i)/sqrt(var_norm), 6) + 0.0) AS z_norm,
           (round(var_rand, 8) + 0.0) AS var_rand,
           (round((i-e_i)/sqrt(var_rand), 6) + 0.0) AS z_rand
         FROM v""",

    // global BB join count: binary weights, nonfree-sampling moments
    // (p2/p3/p4 hypergeometric factors, S-moment index decomposition)
    "q98_global_joincount" ->
      s"""WITH $KNN4, $BINVAR,
         w AS (SELECT gid, nbr, 1.0 AS w FROM knn),
         wr AS (SELECT a.gid, a.nbr, a.w, b.w AS wrev
                FROM w a LEFT JOIN w b
                  ON b.gid = a.nbr AND b.nbr = a.gid),
         s01 AS (SELECT sum(w) AS s0,
                   sum(pow(w + coalesce(wrev, 0), 2) /
                     (CASE WHEN wrev IS NULL THEN 1.0 ELSE 2.0 END)) AS s1
                 FROM wr),
         rsums AS (SELECT gid, sum(w) AS rsum FROM w GROUP BY gid),
         csums AS (SELECT nbr AS gid, sum(w) AS csum FROM w GROUP BY nbr),
         s2t AS (SELECT sum(pow(coalesce(rsum, 0) + coalesce(csum, 0), 2))
                   AS s2
                 FROM rsums FULL JOIN csums USING (gid)),
         cnts AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS n1
                  FROM bin),
         numt AS (SELECT sum(w.w * bi.x * bj.x) AS num
                  FROM w JOIN bin bi ON w.gid = bi.gid
                         JOIN bin bj ON w.nbr = bj.gid),
         base AS (SELECT num, s0, s1, s2,
                    n1*(n1-1)/(n*(n-1)) AS p2,
                    n1*(n1-1)*(n1-2)/(n*(n-1)*(n-2)) AS p3,
                    n1*(n1-1)*(n1-2)*(n1-3)/(n*(n-1)*(n-2)*(n-3)) AS p4
                  FROM numt, s01, s2t, cnts),
         v AS (SELECT 0.5*num AS bb, 0.5*s0*p2 AS e_bb,
                 0.25*(s1*p2 + (s2 - 2*s1)*p3 + (s0*s0 + s1 - s2)*p4)
                   - pow(0.5*s0*p2, 2) AS var_rand
               FROM base)
         SELECT (round(bb, 6) + 0.0) AS bb, (round(e_bb, 6) + 0.0) AS e_bb,
           (round(var_rand, 8) + 0.0) AS var_rand,
           (round((bb - e_bb)/sqrt(var_rand), 6) + 0.0) AS z_rand
         FROM v""",

    // global Geary's c, same S-moments, Cliff-Ord variances
    "q92_global_geary" ->
      s"""WITH $KNN4, $VALS,
         deg AS (SELECT gid, count(*) AS d FROM knn GROUP BY gid),
         w AS (SELECT k.gid, k.nbr, 1.0/deg.d AS w
               FROM knn k JOIN deg USING (gid)),
         wr AS (SELECT a.gid, a.nbr, a.w, b.w AS wrev
                FROM w a LEFT JOIN w b
                  ON b.gid = a.nbr AND b.nbr = a.gid),
         s01 AS (SELECT sum(w) AS s0,
                   sum(pow(w + coalesce(wrev, 0), 2) /
                     (CASE WHEN wrev IS NULL THEN 1.0 ELSE 2.0 END)) AS s1
                 FROM wr),
         rsums AS (SELECT gid, sum(w) AS rsum FROM w GROUP BY gid),
         csums AS (SELECT nbr AS gid, sum(w) AS csum FROM w GROUP BY nbr),
         s2t AS (SELECT sum(pow(coalesce(rsum, 0) + coalesce(csum, 0), 2))
                   AS s2
                 FROM rsums FULL JOIN csums USING (gid)),
         mt AS (SELECT avg(value) AS m FROM vals),
         zm AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                  sum(pow(value - m, 2)) AS sz2,
                  sum(pow(value - m, 4)) AS sz4
                FROM vals, mt),
         numt AS (SELECT sum(w.w * pow(vi.value - vj.value, 2)) AS num
                  FROM w JOIN vals vi ON w.gid = vi.gid
                         JOIN vals vj ON w.nbr = vj.gid),
         base AS (SELECT n, s0, s1, s2,
                    (n-1)/(2.0*s0)*num/sz2 AS c, n*sz4/(sz2*sz2) AS k
                  FROM numt, s01, s2t, zm),
         v AS (SELECT c,
                 ((2*s1 + s2)*(n-1) - 4*s0*s0)/(2*(n+1)*s0*s0) AS var_norm,
                 ((n-1)*s1*(n*n - 3*n + 3 - (n-1)*k)
                   - 0.25*((n-1)*s2*(n*n + 3*n - 6 - (n*n - n + 2)*k))
                   + s0*s0*(n*n - 3 - (n-1)*(n-1)*k))
                   / (n*(n-2)*(n-3)*s0*s0) AS var_rand
               FROM base)
         SELECT (round(c, 6) + 0.0) AS c, 1.0 AS e_c,
           (round(var_norm, 8) + 0.0) AS var_norm,
           (round((c-1)/sqrt(var_norm), 6) + 0.0) AS z_norm,
           (round(var_rand, 8) + 0.0) AS var_rand,
           (round((c-1)/sqrt(var_rand), 6) + 0.0) AS z_rand
         FROM v""",

    "q15_moran_stat" ->
      s"""WITH $KNN4, $VALS,
         z AS (SELECT gid,
                 (value - avg(value) OVER ()) / stddev_samp(value) OVER () AS z
               FROM vals),
         lagt AS (SELECT k.gid, avg(z2.z) AS lag
                  FROM knn k JOIN z z2 ON k.nbr = z2.gid GROUP BY k.gid)
         SELECT z.gid AS gid, (round(z.z * lagt.lag, 4) + 0.0) AS moran_i
         FROM z JOIN lagt ON z.gid = lagt.gid ORDER BY gid""",

    "q16_queen_pairs" ->
      s"""WITH $CELLS
         SELECT a.gid AS gid, b.gid AS nbr
         FROM cells a JOIN cells b
           ON a.gid <> b.gid AND abs(a.cx-b.cx) <= 1 AND abs(a.cy-b.cy) <= 1
         ORDER BY gid, nbr""",

    // GeoDa weights summary: degree stats of the queen graph with
    // islands from the node-universe left join
    "q89_weights_summary" ->
      s"""WITH $CELLS,
         p AS (SELECT a.gid AS gid, b.gid AS nbr
               FROM cells a JOIN cells b
                 ON a.gid <> b.gid AND abs(a.cx-b.cx) <= 1
                AND abs(a.cy-b.cy) <= 1),
         deg AS (SELECT c.gid, count(p.nbr) AS deg
                 FROM cells c LEFT JOIN p ON p.gid = c.gid
                 GROUP BY c.gid)
         SELECT count(*) AS n_obs, CAST(sum(deg) AS BIGINT) AS n_nonzero,
           min(deg) AS min_nbrs, max(deg) AS max_nbrs,
           (round(avg(deg), 6) + 0.0) AS mean_nbrs,
           CAST(median(deg) AS DOUBLE) AS median_nbrs,
           (round(sum(deg) * 100.0 / (count(*) * count(*)), 6) + 0.0)
             AS pct_nonzero,
           CAST(sum(CASE WHEN deg = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_islands
         FROM deg""",

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

    "q19s_pip_salted" ->
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
           (round((t2/(t2 + t1/b)) * rr + (1 - t2/(t2 + t1/b)) * t1, 6) + 0.0) AS ebrate
         FROM t1t, t2t ORDER BY gid""",

    // differential local Moran: signed-sum event-value change per
    // minted location (late half minus early half), zero-filled over
    // the customer universe, then standardize + lag
    "q101_differential_moran" ->
      s"""WITH $KNN4, $VALS,
         nc AS (SELECT count(*) AS n FROM vals),
         diff AS (SELECT (user_id % (SELECT n FROM nc)) + 1 AS gid,
                    (round(sum(CASE WHEN epoch(ts) < 1705363200
                                   THEN -value ELSE value END), 6) + 0.0) AS d
                  FROM events GROUP BY 1),
         dv AS (SELECT v.gid, coalesce(diff.d, 0.0) AS v
                FROM vals v LEFT JOIN diff ON v.gid = diff.gid),
         z AS (SELECT gid,
                 (v - avg(v) OVER ()) / stddev_samp(v) OVER () AS z
               FROM dv),
         lagt AS (SELECT k.gid, avg(z2.z) AS lag
                  FROM knn k JOIN z z2 ON k.nbr = z2.gid GROUP BY k.gid)
         SELECT z.gid AS gid, (round(z.z * lagt.lag, 4) + 0.0) AS diff_moran
         FROM z JOIN lagt ON z.gid = lagt.gid ORDER BY gid""",

    // Benjamini-Hochberg FDR relabeling: cutoff = max p_(k) with
    // p_(k) <= k*alpha/n over ranks in (p, gid) order
    "q102_fdr_significance" ->
      """WITH pv AS (SELECT CAST(c_custkey AS BIGINT) AS gid,
             CAST((c_custkey*13) % 997 AS DOUBLE)/997.0 AS p,
             CAST(c_custkey % 5 AS DOUBLE) AS c
           FROM customer),
         rk AS (SELECT gid, p, c,
                  row_number() OVER (ORDER BY p, gid) AS k,
                  count(*) OVER () AS n
                FROM pv),
         ct AS (SELECT max(p) AS cut FROM rk WHERE p <= k*0.05/n)
         SELECT gid, p, c,
           CASE WHEN p <= coalesce(cut, -1.0) THEN c ELSE 0.0 END AS c_adj
         FROM pv, ct ORDER BY gid""",

    // Local Moran over the EB-smoothed rate: q21's shrinkage algebra,
    // rounded, then the q30 standardize + lag composition
    "q100_local_moran_ebrate" ->
      s"""WITH $KNN4, $RATES,
         tot AS (SELECT sum(e) AS se, sum(b) AS sb,
                        CAST(count(*) AS DOUBLE) AS n FROM r),
         t1t AS (SELECT gid, e, b, e/b AS rr, se/sb AS t1, sb, n
                 FROM r, tot),
         t2t AS (SELECT greatest(
                   sum(b*(rr-t1)*(rr-t1))/max(sb) - max(t1)/(max(sb)/max(n)),
                   0.0) AS t2 FROM t1t),
         eb AS (SELECT gid,
                  (round((t2/(t2 + t1/b)) * rr + (1 - t2/(t2 + t1/b)) * t1,
                    6) + 0.0) AS v
                FROM t1t, t2t),
         z AS (SELECT gid,
                 (v - avg(v) OVER ()) / stddev_samp(v) OVER () AS z
               FROM eb),
         lagt AS (SELECT k.gid, avg(z2.z) AS lag
                  FROM knn k JOIN z z2 ON k.nbr = z2.gid GROUP BY k.gid)
         SELECT z.gid AS gid, (round(z.z * lagt.lag, 4) + 0.0) AS moran_eb
         FROM z JOIN lagt ON z.gid = lagt.gid ORDER BY gid""",

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
           (round((greatest(t2raw, 0.0)/(greatest(t2raw, 0.0) + t1/r.b)) * (r.e/r.b)
             + (1 - greatest(t2raw, 0.0)/(greatest(t2raw, 0.0) + t1/r.b)) * t1,
             6) + 0.0) AS sebrate
         FROM r LEFT JOIN t2 ON r.gid = t2.gid ORDER BY gid""",

    "q24_hinge15_breaks" -> hingeSql("1.5"),
    "q24b_hinge30_breaks" -> hingeSql("3.0"),

    // equal-interval classification: 5 interior cuts of [min, max] / 6
    "q96_equal_breaks" ->
      """WITH m AS (SELECT min(CAST(c_acctbal AS DOUBLE)) AS lo,
                           max(CAST(c_acctbal AS DOUBLE)) AS hi
                    FROM customer)
         SELECT bidx, brk FROM (
           SELECT CAST(1 AS BIGINT) AS bidx,
                  (round(lo + 1*(hi-lo)/6, 4) + 0.0) AS brk FROM m
           UNION ALL SELECT CAST(2 AS BIGINT), (round(lo + 2*(hi-lo)/6, 4) + 0.0) FROM m
           UNION ALL SELECT CAST(3 AS BIGINT), (round(lo + 3*(hi-lo)/6, 4) + 0.0) FROM m
           UNION ALL SELECT CAST(4 AS BIGINT), (round(lo + 4*(hi-lo)/6, 4) + 0.0) FROM m
           UNION ALL SELECT CAST(5 AS BIGINT), (round(lo + 5*(hi-lo)/6, 4) + 0.0) FROM m
         ) ORDER BY bidx""",

    "q25_stddev_breaks" ->
      s"""WITH m AS (SELECT avg(CAST(c_acctbal AS DOUBLE)) AS mu,
                            stddev_samp(CAST(c_acctbal AS DOUBLE)) AS sd
                     FROM customer)
         SELECT bidx, brk FROM (
           SELECT CAST(1 AS BIGINT) AS bidx, (round(mu - 2*sd, 4) + 0.0) AS brk FROM m
           UNION ALL SELECT CAST(2 AS BIGINT), (round(mu - sd, 4) + 0.0) FROM m
           UNION ALL SELECT CAST(3 AS BIGINT), (round(mu, 4) + 0.0) FROM m
           UNION ALL SELECT CAST(4 AS BIGINT), (round(mu + sd, 4) + 0.0) FROM m
           UNION ALL SELECT CAST(5 AS BIGINT), (round(mu + 2*sd, 4) + 0.0) FROM m) t
         ORDER BY bidx""",

    "q26_quantile_breaks" ->
      s"""WITH $SORTED_VALS
         SELECT bidx, brk FROM (
           SELECT CAST(1 AS BIGINT) AS bidx, (round(${pct("(100.0 * 1) / 6")}, 4) + 0.0) AS brk
           UNION ALL SELECT CAST(2 AS BIGINT), (round(${pct("(100.0 * 2) / 6")}, 4) + 0.0)
           UNION ALL SELECT CAST(3 AS BIGINT), (round(${pct("(100.0 * 3) / 6")}, 4) + 0.0)
           UNION ALL SELECT CAST(4 AS BIGINT), (round(${pct("(100.0 * 4) / 6")}, 4) + 0.0)
           UNION ALL SELECT CAST(5 AS BIGINT), (round(${pct("(100.0 * 5) / 6")}, 4) + 0.0)) t
         ORDER BY bidx""",

    "q26b_percentile_breaks" ->
      s"""WITH $SORTED_VALS
         SELECT bidx, brk FROM (
           SELECT CAST(1 AS BIGINT) AS bidx, (round(${pct("1.0")}, 4) + 0.0) AS brk
           UNION ALL SELECT CAST(2 AS BIGINT), (round(${pct("10.0")}, 4) + 0.0)
           UNION ALL SELECT CAST(3 AS BIGINT), (round(${pct("50.0")}, 4) + 0.0)
           UNION ALL SELECT CAST(4 AS BIGINT), (round(${pct("90.0")}, 4) + 0.0)
           UNION ALL SELECT CAST(5 AS BIGINT), (round(${pct("99.0")}, 4) + 0.0)) t
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
         SELECT cell, count(*) AS n, (round(sum(x), 4) + 0.0) AS sum_val,
                (round(avg(x), 4) + 0.0) AS avg_val
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
           (round(CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
             / CAST(length(text) AS DOUBLE), 6) + 0.0) AS space_ratio
         FROM documents ORDER BY doc_id""",

    "q60_event_hourly" ->
      """SELECT event_type,
           CAST(floor(epoch(ts) / 3600.0) AS BIGINT) AS hr,
           count(*) AS n, (round(sum(value), 4) + 0.0) AS sum_val
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    // Gopher-style duplicate-n-gram fractions; n-grams via per-doc
    // ordered window leads, same single-space tokenization as q51
    "q80_repetition" ->
      """WITH s AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS a
                    FROM documents),
         toks AS (SELECT doc_id, unnest(a) AS tok,
                         generate_subscripts(a, 1) AS i FROM s),
         grams AS (
           SELECT doc_id, tok AS g1,
                  tok || ' ' || lead(tok, 1) OVER w AS g2,
                  tok || ' ' || lead(tok, 1) OVER w || ' ' ||
                    lead(tok, 2) OVER w AS g3
           FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
         agg AS (
           SELECT doc_id,
                  count(g1) AS n1, count(DISTINCT g1) AS d1,
                  count(g2) AS n2, count(DISTINCT g2) AS d2,
                  count(g3) AS n3, count(DISTINCT g3) AS d3
           FROM grams GROUP BY doc_id)
         SELECT doc_id AS id, CAST(n1 AS BIGINT) AS n_words,
           (round(CASE WHEN n1 = 0 THEN 0.0
                      ELSE 1.0 - CAST(d1 AS DOUBLE) / n1 END, 6) + 0.0)
             AS dup_word_frac,
           (round(CASE WHEN n2 = 0 THEN 0.0
                      ELSE 1.0 - CAST(d2 AS DOUBLE) / n2 END, 6) + 0.0)
             AS dup_bigram_frac,
           (round(CASE WHEN n3 = 0 THEN 0.0
                      ELSE 1.0 - CAST(d3 AS DOUBLE) / n3 END, 6) + 0.0)
             AS dup_trigram_frac
         FROM agg ORDER BY id""",

    // benchmark decontamination: distinct-trigram overlap vs the
    // doc_id % 37 == 0 "benchmark" slice; same gram construction as q80
    "q82_decontaminate" ->
      """WITH s AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS a
                    FROM documents),
         toks AS (SELECT doc_id, unnest(a) AS tok,
                         generate_subscripts(a, 1) AS i FROM s),
         grams AS (
           SELECT doc_id, tok || ' ' || lead(tok, 1) OVER w || ' ' ||
                    lead(tok, 2) OVER w AS g3
           FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
         dg AS (SELECT DISTINCT doc_id, g3 FROM grams WHERE g3 IS NOT NULL),
         bench AS (SELECT DISTINCT g3 FROM dg WHERE doc_id % 37 = 0),
         agg AS (
           SELECT d.doc_id, count(*) AS n_ngrams,
                  count(b.g3) AS n_contaminated
           FROM dg d LEFT JOIN bench b ON d.g3 = b.g3
           GROUP BY d.doc_id)
         SELECT d0.doc_id AS id,
           CAST(coalesce(a.n_ngrams, 0) AS BIGINT) AS n_ngrams,
           CAST(coalesce(a.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           (round(CASE WHEN coalesce(a.n_ngrams, 0) = 0 THEN 0.0
                      ELSE CAST(a.n_contaminated AS DOUBLE) / a.n_ngrams END,
             6) + 0.0) AS contamination_frac
         FROM documents d0 LEFT JOIN agg a ON d0.doc_id = a.doc_id
         ORDER BY id""",

    // url canonicalization + url-level dedup over six deterministic
    // messy spellings per page; the five regex steps mirror
    // Webtext.canonicalUrl exactly (RE2 'g' flags / \1 backrefs are the
    // DuckDB spellings of Spark's global-replace / $1)
    "q83_url_dedup" ->
      """WITH p AS (
           SELECT doc_id, CAST(doc_id % 200 AS BIGINT) AS page,
                  1704067200 + doc_id % 86400 AS ts
           FROM documents),
         u AS (
           SELECT CASE doc_id % 6
               WHEN 0 THEN 'https://site-' || CAST(page % 97 AS VARCHAR) ||
                 '.example/page/' || CAST(page AS VARCHAR)
               WHEN 1 THEN 'HTTPS://SITE-' || CAST(page % 97 AS VARCHAR) ||
                 '.EXAMPLE/page/' || CAST(page AS VARCHAR)
               WHEN 2 THEN 'https://site-' || CAST(page % 97 AS VARCHAR) ||
                 '.example/page/' || CAST(page AS VARCHAR) ||
                 '?utm_source=feed&utm_campaign=x'
               WHEN 3 THEN 'https://site-' || CAST(page % 97 AS VARCHAR) ||
                 '.example/page/' || CAST(page AS VARCHAR) || '#section-2'
               WHEN 4 THEN 'https://site-' || CAST(page % 97 AS VARCHAR) ||
                 '.example/page/' || CAST(page AS VARCHAR) || '/'
               ELSE 'https://site-' || CAST(page % 97 AS VARCHAR) ||
                 '.example:443/page/' || CAST(page AS VARCHAR)
             END AS url, ts
           FROM p),
         c1 AS (SELECT url, ts,
                  regexp_replace(
                    regexp_replace(url, '#.*', ''),
                    '[?&](utm_[A-Za-z]+|fbclid|gclid)=[^&]*', '', 'g') AS v
                FROM u),
         c2 AS (SELECT url, ts,
                  regexp_replace(
                    regexp_replace(v, '^([^?&]*)&', '\1?'), '\?$', '') AS v
                FROM c1),
         c3 AS (SELECT url, ts,
                  regexp_replace(lower(regexp_extract(v, '^[^/?#]*//[^/?#]*')),
                    ':(80|443)$', '')
                    || regexp_replace(v, '^[^/?#]*//[^/?#]*', '') AS v
                FROM c2),
         c4 AS (SELECT url, ts,
                  CASE WHEN contains(v, '?') THEN v
                       ELSE regexp_replace(v, '/+$', '') END AS curl
                FROM c3)
         SELECT curl, count(*) AS n_pages, count(DISTINCT url) AS n_urls,
           min(url) AS keep_url, CAST(min(ts) AS BIGINT) AS first_ts
         FROM c4 GROUP BY curl ORDER BY curl""",

    // C4-style corpus-wide paragraph dedup: first occurrence per
    // distinct paragraph wins (doc_id, position order), documents
    // reassembled from survivors; minting mirrors q85's Spark side
    "q85_paragraph_dedup" ->
      """WITH d AS (SELECT doc_id,
             'shared header paragraph' || chr(10) || coalesce(text, '') ||
             chr(10) || 'footer ' || CAST(doc_id % 7 AS VARCHAR) AS t
           FROM documents),
         s AS (SELECT doc_id, string_split(t, chr(10)) AS a FROM d),
         p AS (SELECT doc_id, unnest(a) AS para,
                      generate_subscripts(a, 1) AS i FROM s),
         w AS (SELECT doc_id, para, i,
                 row_number() OVER (PARTITION BY para
                   ORDER BY doc_id, i) AS rn
               FROM p),
         r AS (SELECT doc_id,
                 string_agg(para, chr(10) ORDER BY i) AS text_dedup,
                 count(*) AS n_kept
               FROM w WHERE rn = 1 GROUP BY doc_id)
         SELECT o.doc_id AS id, coalesce(r.text_dedup, '') AS text_dedup,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_paras_kept,
           CAST(len(o.a) AS BIGINT) AS n_paras
         FROM s o LEFT JOIN r ON o.doc_id = r.doc_id ORDER BY id""",

    // PII redaction: byte-identical RE2∩Java patterns, counts on the
    // raw text, sequential email → phone → ip replacement
    "q86_pii_redact" ->
      """WITH d AS (SELECT doc_id,
             coalesce(text, '') || ' contact user' ||
             CAST(doc_id AS VARCHAR) || '@example.com or +1 555-000-' ||
             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
             ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
           FROM documents)
         SELECT doc_id AS id,
           CAST(len(regexp_extract_all(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '\+\d[\d -]{7,}\d')) AS BIGINT)
             AS n_phones,
           CAST(len(regexp_extract_all(t,
             '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS BIGINT) AS n_ips,
           regexp_replace(regexp_replace(regexp_replace(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             '<EMAIL>', 'g'),
             '\+\d[\d -]{7,}\d', '<PHONE>', 'g'),
             '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g')
             AS text_redacted
         FROM d ORDER BY id""",

    // near-dup cluster resolution: connected components of the minted
    // Lehmer pair graph; oracle = recursive min-label closure (labels
    // only propagate downhill, so the UNION-dedup fixpoint is the
    // reachable-minimum per node)
    "q87_dup_clusters" ->
      """WITH RECURSIVE
         nn AS (SELECT count(*) AS n FROM documents),
         e0 AS (SELECT doc_id AS u,
                  ((doc_id*48271) % 2147483647) % (SELECT n FROM nn) AS v
                FROM documents WHERE doc_id % 3 <> 0),
         e AS (SELECT least(u,v) AS u, greatest(u,v) AS v
               FROM e0 WHERE u <> v),
         eb AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
         reach(id, lbl) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT eb.v, r.lbl FROM reach r JOIN eb ON eb.u = r.id
           WHERE r.lbl < eb.v),
         cc AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id)
         SELECT id, component FROM cc ORDER BY id""",

    // composed dedup: keep the canonical (min-id) doc per duplicate
    // cluster with the count of members dropped alongside it
    "q88_dedup_survivors" ->
      """WITH RECURSIVE
         nn AS (SELECT count(*) AS n FROM documents),
         e0 AS (SELECT doc_id AS u,
                  ((doc_id*48271) % 2147483647) % (SELECT n FROM nn) AS v
                FROM documents WHERE doc_id % 3 <> 0),
         e AS (SELECT least(u,v) AS u, greatest(u,v) AS v
               FROM e0 WHERE u <> v),
         eb AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
         reach(id, lbl) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT eb.v, r.lbl FROM reach r JOIN eb ON eb.u = r.id
           WHERE r.lbl < eb.v),
         cc AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
         sz AS (SELECT component, count(*) - 1 AS n_dupes_removed
                FROM cc GROUP BY component)
         SELECT d.doc_id, d.lang, d.n_chars,
           CAST(sz.n_dupes_removed AS BIGINT) AS n_dupes_removed
         FROM documents d
         JOIN cc ON d.doc_id = cc.id AND cc.id = cc.component
         JOIN sz USING (component)
         ORDER BY d.doc_id""",

    // the full curation chain: repetition gate (rounded trigram dup
    // frac), hashed-model gate, decontamination gate (bench docs
    // dropped), then the per-language token-budget draw — each stage's
    // algebra verbatim from its standalone oracle
    "q99_curation_full_chain" ->
      """WITH s AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS a
                    FROM documents),
         toks AS (SELECT doc_id, unnest(a) AS tok,
                         generate_subscripts(a, 1) AS i FROM s),
         rg AS (SELECT doc_id, tok || ' ' || lead(tok,1) OVER w || ' ' ||
                  lead(tok,2) OVER w AS g3
                FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
         ragg AS (SELECT doc_id, count(g3) AS n3, count(DISTINCT g3) AS d3
                  FROM rg GROUP BY doc_id),
         rep AS (SELECT doc_id,
                   (round(CASE WHEN n3 = 0 THEN 0.0
                         ELSE 1.0 - CAST(d3 AS DOUBLE)/n3 END, 6) + 0.0) AS dtf
                 FROM ragg),
         mw AS (SELECT i AS bucket,
                  ((i*2654435761) % 2000)/1000.0 - 1.0 AS weight
                FROM generate_series(0, 1023) g(i)),
         mb AS (SELECT doc_id,
                  ('0x' || substr(md5(tok),1,8))::BIGINT % 1024 AS bucket
                FROM toks WHERE tok <> ''),
         mtf AS (SELECT doc_id, bucket, count(*) AS tf
                 FROM mb GROUP BY 1, 2),
         msc AS (SELECT mtf.doc_id,
                   (round(sum(mtf.tf * mw.weight) + 0.1, 6) + 0.0) AS score
                 FROM mtf JOIN mw USING (bucket) GROUP BY mtf.doc_id),
         model AS (SELECT d.doc_id, coalesce(msc.score, 0.1) AS score
                   FROM documents d
                   LEFT JOIN msc ON d.doc_id = msc.doc_id),
         dg AS (SELECT DISTINCT doc_id, g3 FROM rg WHERE g3 IS NOT NULL),
         bench AS (SELECT DISTINCT g3 FROM dg WHERE doc_id % 37 = 0),
         dagg AS (SELECT d.doc_id, count(*) AS n_ngrams,
                    count(b.g3) AS n_cont
                  FROM dg d LEFT JOIN bench b ON d.g3 = b.g3
                  GROUP BY d.doc_id),
         decon AS (SELECT d0.doc_id,
                     (round(CASE WHEN coalesce(a.n_ngrams, 0) = 0 THEN 0.0
                           ELSE CAST(a.n_cont AS DOUBLE)/a.n_ngrams END, 6) + 0.0)
                       AS cf
                   FROM documents d0
                   LEFT JOIN dagg a ON d0.doc_id = a.doc_id),
         keep AS (SELECT d.doc_id, d.lang, d.text FROM documents d
                  JOIN rep USING (doc_id) JOIN model USING (doc_id)
                  JOIN decon USING (doc_id)
                  WHERE rep.dtf <= 0.2 AND model.score >= 0.0
                    AND decon.cf < 0.5 AND d.doc_id % 37 <> 0),
         kd AS (SELECT lang, doc_id, (doc_id*48271) % 2147483647 AS k,
                  CAST(len(list_filter(string_split(coalesce(text, ''), ' '),
                    t -> t <> '')) AS BIGINT) AS n_tokens
                FROM keep),
         kc AS (SELECT lang, doc_id, n_tokens,
                  sum(n_tokens) OVER (PARTITION BY lang ORDER BY k, doc_id
                    ROWS UNBOUNDED PRECEDING) AS cum
                FROM kd)
         SELECT lang, doc_id AS sample_id, n_tokens
         FROM kc WHERE cum - n_tokens < 1500 ORDER BY lang, sample_id""",

    // unigram log-prob scoring: top-50 vocab (count desc, ties by
    // token), OOV floored at count 1, per-doc mean of ln(n/total)
    "q97_unigram_logprob" ->
      """WITH t AS (SELECT doc_id,
             unnest(string_split(coalesce(text, ''), ' ')) AS token
           FROM documents),
         tk AS (SELECT doc_id, token FROM t WHERE token <> ''),
         tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM tk),
         v AS (SELECT token, count(*) AS n FROM tk
               GROUP BY token ORDER BY n DESC, token LIMIT 50),
         sc AS (SELECT tk.doc_id,
                  avg(ln(CAST(coalesce(v.n, 1) AS DOUBLE) / total)) AS alp,
                  count(*) AS n_tokens
                FROM tk LEFT JOIN v USING (token), tot
                GROUP BY tk.doc_id)
         SELECT d.doc_id AS id, (round(coalesce(sc.alp, 0.0), 6) + 0.0) AS avg_logp,
           CAST(coalesce(sc.n_tokens, 0) AS BIGINT) AS n_tokens
         FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
         ORDER BY id""",

    // model-based quality scoring: md5-hashed bag-of-words buckets,
    // minted linear coefficients, sigmoid output — rounding at 6
    // decimals makes the value order-invariant across engines
    "q90_quality_model" ->
      """WITH w AS (SELECT i AS bucket,
             ((i*2654435761) % 2000)/1000.0 - 1.0 AS weight
           FROM generate_series(0, 1023) g(i)),
         t AS (SELECT doc_id,
                 unnest(string_split(coalesce(text, ''), ' ')) AS tok
               FROM documents),
         b AS (SELECT doc_id,
                 ('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS bucket
               FROM t WHERE tok <> ''),
         tf AS (SELECT doc_id, bucket, count(*) AS tf FROM b GROUP BY 1, 2),
         sc AS (SELECT tf.doc_id,
                  (round(sum(tf.tf * w.weight) + 0.1, 6) + 0.0) AS score
                FROM tf JOIN w USING (bucket) GROUP BY tf.doc_id)
         SELECT d.doc_id AS id, coalesce(sc.score, 0.1) AS score,
           (round(1.0/(1.0 + exp(-coalesce(sc.score, 0.1))), 6) + 0.0) AS prob
         FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
         ORDER BY id""",

    // corpus vocabulary top-k: global token counts, ties by token text
    "q84_vocab_topk" ->
      """WITH t AS (SELECT unnest(string_split(coalesce(text, ''), ' '))
                      AS token
                    FROM documents)
         SELECT token, count(*) AS n FROM t
         GROUP BY token ORDER BY n DESC, token LIMIT 100""",

    // product quantization replayed end to end: normalize (q57's nrm/u
    // CTEs), slice each unit vector into 4 subspaces of 16 dims, seed
    // every subspace from the FIRST 8 vectors in id order (the q57b
    // seeding convention — no per-subspace window needed), one
    // Euclidean Lloyd sweep per subspace (argmin |s-c|^2 = argmax
    // s.c - 0.5|c|^2, ties to min cid), then re-assign against the
    // swept centroids = the codes
    "q108_pq_encode" ->
      """WITH nrm AS (
           SELECT vec_id AS id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         u AS (
           SELECT id, CASE WHEN nr = 0 THEN v
                      ELSE list_transform(v, x -> x / nr) END AS unit
           FROM (SELECT id, v,
                   sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum'))
                     AS nr
                 FROM nrm) t),
         js AS (SELECT CAST(unnest(range(0, 4)) AS INT) AS sub),
         subsu AS (
           SELECT id, sub, unit[(sub*16+1):((sub+1)*16)] AS svec
           FROM u CROSS JOIN js),
         seeds0 AS (
           SELECT CAST(row_number() OVER (ORDER BY id) AS INT) - 1 AS cid,
                  unit
           FROM (SELECT id, unit FROM u ORDER BY id LIMIT 8) s),
         seeds AS (
           SELECT sub, cid, unit[(sub*16+1):((sub+1)*16)] AS cvec
           FROM seeds0 CROSS JOIN js),
         seedsn AS (
           SELECT sub, cid, cvec,
             list_aggregate(list_transform(cvec, x -> x * x), 'sum') AS cn2
           FROM seeds),
         sc1 AS (
           SELECT s.id, s.sub, s.svec, c.cid,
             list_aggregate(list_transform(range(1, len(s.svec) + 1),
               i -> s.svec[i] * c.cvec[i]), 'sum') - 0.5 * c.cn2 AS score
           FROM subsu s JOIN seedsn c ON s.sub = c.sub),
         asg AS (SELECT id, sub, svec, cid FROM (
             SELECT id, sub, svec, cid, row_number() OVER (
               PARTITION BY id, sub ORDER BY score DESC, cid) AS rk
             FROM sc1) t WHERE rk = 1),
         cpos AS (
           SELECT sub, cid, pos, avg(svec[CAST(pos AS INT)]) AS mval
           FROM (SELECT sub, cid, svec,
                   unnest(range(1, len(svec) + 1)) AS pos
                 FROM asg) x
           GROUP BY sub, cid, pos),
         cent AS (SELECT sub, cid, list(mval ORDER BY pos) AS cvec
                  FROM cpos GROUP BY sub, cid),
         centn AS (
           SELECT sub, cid, cvec,
             list_aggregate(list_transform(cvec, x -> x * x), 'sum') AS cn2
           FROM cent),
         sc2 AS (
           SELECT s.id, s.sub, c.cid,
             list_aggregate(list_transform(range(1, len(s.svec) + 1),
               i -> s.svec[i] * c.cvec[i]), 'sum') - 0.5 * c.cn2 AS score
           FROM subsu s JOIN centn c ON s.sub = c.sub)
         SELECT id, sub, cid AS code FROM (
             SELECT id, sub, cid, row_number() OVER (
               PARTITION BY id, sub ORDER BY score DESC, cid) AS rk
             FROM sc2) t
         WHERE rk = 1 ORDER BY id, sub""",

    // ADC top-10: q108's train+encode CTE chain, then each (query,
    // vector) pair scores as the sub-ordered sum of
    // dot(query subvector, assigned sub-centroid) — the per-sub
    // partials are summed via list(p ORDER BY sub) so the fold order
    // matches Spark's zip_with/aggregate left-to-right accumulation
    "q108b_pq_adc" ->
      """WITH nrm AS (
           SELECT vec_id AS id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         u AS (
           SELECT id, CASE WHEN nr = 0 THEN v
                      ELSE list_transform(v, x -> x / nr) END AS unit
           FROM (SELECT id, v,
                   sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum'))
                     AS nr
                 FROM nrm) t),
         js AS (SELECT CAST(unnest(range(0, 4)) AS INT) AS sub),
         subsu AS (
           SELECT id, sub, unit[(sub*16+1):((sub+1)*16)] AS svec
           FROM u CROSS JOIN js),
         seeds0 AS (
           SELECT CAST(row_number() OVER (ORDER BY id) AS INT) - 1 AS cid,
                  unit
           FROM (SELECT id, unit FROM u ORDER BY id LIMIT 8) s),
         seeds AS (
           SELECT sub, cid, unit[(sub*16+1):((sub+1)*16)] AS cvec
           FROM seeds0 CROSS JOIN js),
         seedsn AS (
           SELECT sub, cid, cvec,
             list_aggregate(list_transform(cvec, x -> x * x), 'sum') AS cn2
           FROM seeds),
         sc1 AS (
           SELECT s.id, s.sub, s.svec, c.cid,
             list_aggregate(list_transform(range(1, len(s.svec) + 1),
               i -> s.svec[i] * c.cvec[i]), 'sum') - 0.5 * c.cn2 AS score
           FROM subsu s JOIN seedsn c ON s.sub = c.sub),
         asg AS (SELECT id, sub, svec, cid FROM (
             SELECT id, sub, svec, cid, row_number() OVER (
               PARTITION BY id, sub ORDER BY score DESC, cid) AS rk
             FROM sc1) t WHERE rk = 1),
         cpos AS (
           SELECT sub, cid, pos, avg(svec[CAST(pos AS INT)]) AS mval
           FROM (SELECT sub, cid, svec,
                   unnest(range(1, len(svec) + 1)) AS pos
                 FROM asg) x
           GROUP BY sub, cid, pos),
         cent AS (SELECT sub, cid, list(mval ORDER BY pos) AS cvec
                  FROM cpos GROUP BY sub, cid),
         centn AS (
           SELECT sub, cid, cvec,
             list_aggregate(list_transform(cvec, x -> x * x), 'sum') AS cn2
           FROM cent),
         sc2 AS (
           SELECT s.id, s.sub, c.cid,
             list_aggregate(list_transform(range(1, len(s.svec) + 1),
               i -> s.svec[i] * c.cvec[i]), 'sum') - 0.5 * c.cn2 AS score
           FROM subsu s JOIN centn c ON s.sub = c.sub),
         codes AS (SELECT id, sub, cid AS code FROM (
             SELECT id, sub, cid, row_number() OVER (
               PARTITION BY id, sub ORDER BY score DESC, cid) AS rk
             FROM sc2) t WHERE rk = 1),
         qsub AS (SELECT id AS qid, sub, svec FROM subsu WHERE id < 5),
         parts AS (
           SELECT q.qid, c.id, c.sub,
             list_aggregate(list_transform(range(1, len(q.svec) + 1),
               i -> q.svec[i] * ct.cvec[i]), 'sum') AS p
           FROM codes c
           JOIN qsub q ON q.sub = c.sub
           JOIN centn ct ON ct.sub = c.sub AND ct.cid = c.code
           WHERE c.id <> q.qid),
         scored AS (
           SELECT qid, id,
             list_aggregate(list(p ORDER BY sub), 'sum') AS cosine
           FROM parts GROUP BY qid, id),
         ranked AS (SELECT qid, id, cosine,
             row_number() OVER (PARTITION BY qid
               ORDER BY cosine DESC, id) AS rk
           FROM scored)
         SELECT qid, id, CAST(rk AS BIGINT) AS rk,
                (round(cosine, 6) + 0.0) AS cosine
         FROM ranked WHERE rk <= 10 ORDER BY qid, rk""",

    // grouped MG sketches at capacity >= per-group vocabulary: exact,
    // so the grouped token counts are the oracle
    "q112_vocab_sketch_by_lang" ->
      """WITH t AS (SELECT lang,
                      unnest(string_split(coalesce(text, ''), ' '))
                        AS token
                    FROM documents)
         SELECT lang, token, count(*) AS n FROM t
         GROUP BY lang, token ORDER BY lang, n DESC, token""",

    // weighted MG sketch at capacity >= distinct hosts: exact, so the
    // groupBy-sum is the oracle (q79's synthetic page shape)
    "q110_host_bytes_sketch" ->
      """WITH pages AS (
           SELECT 'https://site-' || CAST(doc_id % 97 AS VARCHAR) ||
                  '.example/page/' || CAST(doc_id AS VARCHAR) AS url,
                  text
           FROM documents)
         SELECT split_part(url, '/', 3) AS host,
                CAST(sum(length(text)) AS BIGINT) AS total
         FROM pages GROUP BY 1
         ORDER BY total DESC, host LIMIT 50""",

    // IVFADC replayed end to end: coarse IVF training (q57b's chain at
    // 8 cells, cosine assignment, ties min cid), bucketing against the
    // swept coarse centroids, RESIDUALS unit - cunit, the q108 residual
    // PQ chain (first-8-id seeds, Euclidean sweep, re-assign = codes),
    // query probes (top-2 cells by dot), per-(query, cell) residual
    // LUTs, score = q·c_cell + sub-ordered sum of residual lookups
    "q109_ivfadc" ->
      s"""WITH $IvfAdcCtes
         SELECT qid, id, CAST(rk AS BIGINT) AS rk,
                (round(cosine, 6) + 0.0) AS cosine
         FROM ranked WHERE rk <= 10 ORDER BY qid, rk""",

    // two-stage retrieval: q109's chain shortlists 30 candidates per
    // query, exact cosine over the original units re-scores ONLY the
    // shortlist, top-10 re-ranked — same fold-order dot as q57
    "q111_ivfadc_rerank" ->
      s"""WITH $IvfAdcCtes,
         shortl AS (SELECT qid, id FROM ranked WHERE rk <= 30),
         exact AS (
           SELECT s.qid, s.id,
             list_aggregate(list_transform(range(1, len(c.unit) + 1),
               i -> c.unit[i] * q.unit[i]), 'sum') AS cosine
           FROM shortl s
           JOIN u c ON c.id = s.id
           JOIN u q ON q.id = s.qid),
         rer AS (SELECT qid, id, cosine,
             row_number() OVER (PARTITION BY qid
               ORDER BY cosine DESC, id) AS rk
           FROM exact)
         SELECT qid, id, CAST(rk AS BIGINT) AS rk,
                (round(cosine, 6) + 0.0) AS cosine
         FROM rer WHERE rk <= 10 ORDER BY qid, rk""",

    // the Misra-Gries sketch at capacity >= distinct-token cardinality
    // never sheds, so its counts are exactly the groupBy counts and the
    // q84 oracle is the oracle (tie order count desc, token asc on both
    // sides)
    "q107_vocab_sketch" ->
      """WITH t AS (SELECT unnest(string_split(coalesce(text, ''), ' '))
                      AS token
                    FROM documents)
         SELECT token, count(*) AS n FROM t
         GROUP BY token ORDER BY n DESC, token LIMIT 100""",

    // composed curation chain: q80's trigram-repetition fractions gate
    // the corpus, then the q78 deterministic per-stratum draw
    "q81_curation_pipeline" ->
      """WITH s AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS a
                    FROM documents),
         toks AS (SELECT doc_id, unnest(a) AS tok,
                         generate_subscripts(a, 1) AS i FROM s),
         grams AS (
           SELECT doc_id,
                  tok || ' ' || lead(tok, 1) OVER w || ' ' ||
                    lead(tok, 2) OVER w AS g3
           FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
         rep AS (
           SELECT doc_id, count(g3) AS n3, count(DISTINCT g3) AS d3
           FROM grams GROUP BY doc_id),
         keep AS (
           SELECT d.doc_id, d.lang
           FROM documents d JOIN rep r ON d.doc_id = r.doc_id
           WHERE (round(CASE WHEN r.n3 = 0 THEN 0.0
                            ELSE 1.0 - CAST(r.d3 AS DOUBLE) / r.n3 END, 6) + 0.0)
                   <= 0.2
             AND d.n_chars >= 100)
         SELECT lang, doc_id AS sample_id, CAST(rk AS BIGINT) AS rk
         FROM (SELECT lang, doc_id,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY (doc_id * 48271) % 2147483647, doc_id) AS rk
               FROM keep) t
         WHERE rk <= 3 ORDER BY lang, rk""",

    // ---- corpus curation ----
    // deterministic stratified sample: the engine's partial top-k
    // aggregate must reproduce the window formulation row-for-row
    "q78_stratified_sample" ->
      """SELECT lang, source, doc_id AS sample_id, CAST(rk AS BIGINT) AS rk
         FROM (SELECT lang, source, doc_id,
                 row_number() OVER (PARTITION BY lang, source
                   ORDER BY (doc_id * 48271) % 2147483647, doc_id) AS rk
               FROM documents) t
         WHERE rk <= 5 ORDER BY lang, source, rk""",
    // per-domain stats over the minted synthetic urls (same derivation
    // as q62's pages CTE), host = 3rd '/'-separated field
    "q79_domain_stats" ->
      """WITH pages AS (
           SELECT 'https://site-' || CAST(doc_id % 97 AS VARCHAR) ||
                  '.example/page/' || CAST(doc_id AS VARCHAR) AS url,
                  text, lang
           FROM documents)
         SELECT split_part(url, '/', 3) AS host,
                count(*) AS n_pages,
                CAST(sum(length(text)) AS BIGINT) AS total_chars,
                CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         FROM pages GROUP BY 1 ORDER BY host""",

    // ---- LISA statistic oracles (kernel lag/sum/indicator algebra) ----
    "q30_local_moran" ->
      s"""WITH $KNN4, $VALS, $ZVALS,
         lagt AS (SELECT k.gid, avg(z2.z) AS lag
                  FROM knn k JOIN z z2 ON k.nbr = z2.gid GROUP BY k.gid)
         SELECT z.gid AS gid, (round(z.z * lagt.lag, 4) + 0.0) AS moran_i
         FROM z JOIN lagt ON z.gid = lagt.gid ORDER BY gid""",

    // bivariate local Moran: z of the first variable times the kNN
    // neighbor lag of the second's z (both sample-sd standardized)
    "q93_local_bimoran" ->
      s"""WITH $KNN4, $VALS,
         v2 AS (SELECT gid, CAST((gid*7) % 30 + 1 AS DOUBLE) AS value2
                FROM vals),
         zx AS (SELECT gid, (value - avg(value) OVER ()) /
                  stddev_samp(value) OVER () AS z
                FROM vals),
         zy AS (SELECT gid, (value2 - avg(value2) OVER ()) /
                  stddev_samp(value2) OVER () AS z
                FROM v2),
         lagt AS (SELECT k.gid, avg(zy.z) AS lag
                  FROM knn k JOIN zy ON k.nbr = zy.gid GROUP BY k.gid)
         SELECT zx.gid AS gid, (round(zx.z * lagt.lag, 4) + 0.0) AS bimoran_i
         FROM zx JOIN lagt ON zx.gid = lagt.gid ORDER BY gid""",

    // token-budget mixture draw: greedy admit per language stratum in
    // Lehmer order until 2000 tokens accumulated (oracle = the naive
    // running-sum window the bucketed prefix sum must reproduce)
    "q94_token_budget_sample" ->
      """WITH d AS (SELECT lang, doc_id,
             (doc_id*48271) % 2147483647 AS k,
             CAST(len(list_filter(string_split(coalesce(text, ''), ' '),
               t -> t <> '')) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (SELECT lang, doc_id, k, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY k, doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
           FROM d)
         SELECT lang, doc_id AS sample_id, n_tokens
         FROM c WHERE cum - n_tokens < 2000 ORDER BY lang, sample_id""",

    "q31_local_g" ->
      s"""WITH $KNN4, $VALS,
         tot AS (SELECT sum(value) AS sall FROM vals),
         num AS (SELECT k.gid, sum(v2.value) AS sn
                 FROM knn k JOIN vals v2 ON k.nbr = v2.gid GROUP BY k.gid)
         SELECT v.gid AS gid, (round(num.sn / (tot.sall - v.value), 8) + 0.0) AS g
         FROM vals v JOIN num ON v.gid = num.gid, tot ORDER BY gid""",

    "q32_local_gstar" ->
      s"""WITH $KNN4, $VALS,
         tot AS (SELECT sum(value) AS sall FROM vals),
         num AS (SELECT k.gid, sum(v2.value) AS sn
                 FROM knn k JOIN vals v2 ON k.nbr = v2.gid GROUP BY k.gid)
         SELECT v.gid AS gid, (round((num.sn + v.value) / tot.sall, 8) + 0.0) AS gstar
         FROM vals v JOIN num ON v.gid = num.gid, tot ORDER BY gid""",

    "q33_local_geary" ->
      s"""WITH $KNN4, $VALS, $ZVALS,
         g AS (SELECT k.gid, avg((za.z - zb.z) * (za.z - zb.z)) AS c
               FROM knn k JOIN z za ON k.gid = za.gid
                          JOIN z zb ON k.nbr = zb.gid
               GROUP BY k.gid)
         SELECT gid, (round(c, 4) + 0.0) AS geary FROM g ORDER BY gid""",

    "q34_local_joincount" ->
      s"""WITH $KNN4, $BINVAR,
         s AS (SELECT k.gid, sum(b2.x) AS snbr, count(*) AS nn
               FROM knn k JOIN bin b2 ON k.nbr = b2.gid GROUP BY k.gid)
         SELECT b.gid AS gid, CAST(b.x * s.snbr AS BIGINT) AS jc,
                CAST(s.nn AS BIGINT) AS nn,
                CAST(CASE WHEN b.x = 1.0 AND b.x * s.snbr > 0 THEN 1 ELSE 0
                     END AS BIGINT) AS sig_def
         FROM bin b JOIN s ON b.gid = s.gid ORDER BY gid""",

    "q35_local_bijoincount" ->
      s"""WITH $KNN4, $BINVAR,
         b2t AS (SELECT gid, x AS x1, 1.0 - x AS x2 FROM bin),
         s AS (SELECT k.gid, sum(n2.x2) AS snbr, count(*) AS nn
               FROM knn k JOIN b2t n2 ON k.nbr = n2.gid GROUP BY k.gid)
         SELECT b.gid AS gid, CAST(b.x1 * s.snbr AS BIGINT) AS bjc,
                CAST(s.nn AS BIGINT) AS nn,
                CAST(CASE WHEN b.x1 = 1.0 AND b.x1 * s.snbr > 0 THEN 1 ELSE 0
                     END AS BIGINT) AS sig_def
         FROM b2t b JOIN s ON b.gid = s.gid ORDER BY gid""",

    "q36_local_multijoincount" ->
      s"""WITH $KNN4,
         mv AS (SELECT CAST(c_custkey AS BIGINT) AS gid,
                  (CASE WHEN (c_custkey * 13) % 7 < 3 THEN 1.0 ELSE 0.0 END) *
                  (CASE WHEN (c_custkey * 11) % 5 < 2 THEN 1.0 ELSE 0.0 END)
                    AS prod
                FROM customer),
         s AS (SELECT k.gid, sum(m2.prod) AS snbr, count(*) AS nn
               FROM knn k JOIN mv m2 ON k.nbr = m2.gid GROUP BY k.gid)
         SELECT m.gid AS gid, CAST(m.prod * s.snbr AS BIGINT) AS mjc,
                CAST(s.nn AS BIGINT) AS nn,
                CAST(CASE WHEN m.prod = 1.0 AND m.prod * s.snbr > 0 THEN 1
                     ELSE 0 END AS BIGINT) AS sig_def
         FROM mv m JOIN s ON m.gid = s.gid ORDER BY gid""",

    "q37_quantile_lisa" ->
      s"""WITH $KNN4, $SORTED_VALS,
         ind AS (SELECT CAST(c_custkey AS BIGINT) AS gid,
                   CASE WHEN
                     (CASE WHEN CAST(c_acctbal AS DOUBLE) >= ${pct("20.0")} THEN 1 ELSE 0 END) +
                     (CASE WHEN CAST(c_acctbal AS DOUBLE) >= ${pct("40.0")} THEN 1 ELSE 0 END) +
                     (CASE WHEN CAST(c_acctbal AS DOUBLE) >= ${pct("60.0")} THEN 1 ELSE 0 END) +
                     (CASE WHEN CAST(c_acctbal AS DOUBLE) >= ${pct("80.0")} THEN 1 ELSE 0 END)
                     = 4 THEN 1.0 ELSE 0.0 END AS x
                 FROM customer),
         s2 AS (SELECT k.gid, sum(i2.x) AS snbr
                FROM knn k JOIN ind i2 ON k.nbr = i2.gid GROUP BY k.gid)
         SELECT i.gid AS gid, CAST(i.x * s2.snbr AS BIGINT) AS qjc,
                CAST(CASE WHEN i.x = 1.0 AND i.x * s2.snbr > 0 THEN 1 ELSE 0
                     END AS BIGINT) AS sig_def
         FROM ind i JOIN s2 ON i.gid = s2.gid ORDER BY gid""",

    "q38_multiquantile_lisa" ->
      s"""WITH $KNN4,
         t1 AS (SELECT CAST(c_acctbal AS DOUBLE) AS val FROM customer),
         sa AS (SELECT val, row_number() OVER (ORDER BY val) - 1 AS rk FROM t1),
         na AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM t1),
         t2 AS (SELECT CAST((c_custkey * 17) % 1000 AS DOUBLE) AS val FROM customer),
         sb AS (SELECT val, row_number() OVER (ORDER BY val) - 1 AS rk FROM t2),
         nb AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM t2),
         ind AS (SELECT CAST(c_custkey AS BIGINT) AS gid,
                   (CASE WHEN CAST(c_acctbal AS DOUBLE) >= ${pctT("75.0", "sa", "na")}
                    THEN 1.0 ELSE 0.0 END) *
                   (CASE WHEN CAST((c_custkey * 17) % 1000 AS DOUBLE) < ${pctT("25.0", "sb", "nb")}
                    THEN 1.0 ELSE 0.0 END) AS x
                 FROM customer),
         s2 AS (SELECT k.gid, sum(i2.x) AS snbr
                FROM knn k JOIN ind i2 ON k.nbr = i2.gid GROUP BY k.gid)
         SELECT i.gid AS gid, CAST(i.x * s2.snbr AS BIGINT) AS mqjc,
                CAST(CASE WHEN i.x = 1.0 AND i.x * s2.snbr > 0 THEN 1 ELSE 0
                     END AS BIGINT) AS sig_def
         FROM ind i JOIN s2 ON i.gid = s2.gid ORDER BY gid""",

    "q39_local_multigeary" ->
      s"""WITH $KNN4,
         mv AS (SELECT CAST(c_custkey AS BIGINT) AS gid,
                       CAST(c_acctbal AS DOUBLE) AS v1,
                       CAST((c_custkey * 17) % 1000 AS DOUBLE) AS v2
                FROM customer),
         z2 AS (SELECT gid,
                  (v1 - avg(v1) OVER ()) / stddev_samp(v1) OVER () AS z1,
                  (v2 - avg(v2) OVER ()) / stddev_samp(v2) OVER () AS z2
                FROM mv),
         g AS (SELECT k.gid,
                 (avg((za.z1 - zb.z1) * (za.z1 - zb.z1)) +
                  avg((za.z2 - zb.z2) * (za.z2 - zb.z2))) / 2.0 AS c
               FROM knn k JOIN z2 za ON k.gid = za.gid
                          JOIN z2 zb ON k.nbr = zb.gid
               GROUP BY k.gid)
         SELECT gid, (round(c, 4) + 0.0) AS mgeary FROM g ORDER BY gid""",

    // ---- neighbor match: two kNNs + exact hypergeometric tail ----
    "q42_neighbor_match" ->
      s"""WITH $KNN6,
         av AS (SELECT CAST(c_custkey AS BIGINT) AS gid,
                       CAST(c_acctbal AS DOUBLE) AS a1,
                       CAST((c_custkey * 17) % 1000 AS DOUBLE) AS a2
                FROM customer),
         apairs AS (SELECT a.gid AS gid, b.gid AS anbr,
                      sqrt((a.a1-b.a1)*(a.a1-b.a1) + (a.a2-b.a2)*(a.a2-b.a2))
                        AS adist
                    FROM av a JOIN av b ON a.gid <> b.gid),
         aknn AS (SELECT gid, anbr FROM (
                    SELECT gid, anbr, adist,
                      row_number() OVER (PARTITION BY gid
                        ORDER BY adist, anbr) AS rk
                    FROM apairs) t WHERE rk <= 6),
         cardt AS (SELECT g.gid, count(*) AS c
                   FROM knn6 g JOIN aknn a
                     ON g.gid = a.gid AND g.nbr = a.anbr
                   GROUP BY g.gid),
         nn AS (SELECT CAST(count(*) AS DOUBLE) - 1.0 AS bn FROM customer),
         hyp AS (SELECT tv.v,
                   CASE WHEN tv.v <= 0 THEN 1.0
                        ELSE least(1.0, sum(CASE WHEN tx.x >= tv.v THEN exp(
                          (lgamma(7.0) - lgamma(CAST(tx.x AS DOUBLE) + 1.0)
                             - lgamma(7.0 - CAST(tx.x AS DOUBLE)))
                          + (lgamma(bn - 5.0) - lgamma(7.0 - CAST(tx.x AS DOUBLE))
                             - lgamma(bn - 11.0 + CAST(tx.x AS DOUBLE)))
                          - (lgamma(bn + 1.0) - lgamma(7.0) - lgamma(bn - 5.0))
                        ) END)) END AS p
                 FROM generate_series(0, 6) tv(v)
                 CROSS JOIN generate_series(1, 6) tx(x) CROSS JOIN nn
                 GROUP BY tv.v)
         SELECT a.gid AS gid, CAST(coalesce(cardt.c, 0) AS BIGINT) AS card,
                (round(hyp.p, 8) + 0.0) AS p
         FROM av a LEFT JOIN cardt ON a.gid = cardt.gid
         JOIN hyp ON hyp.v = coalesce(cardt.c, 0)
         ORDER BY gid""",

    // ---- weights variants ----
    "q11k_kernel_knn" ->
      s"""WITH $KNN4,
         bw AS (SELECT gid, max(dist) AS bw FROM knn GROUP BY gid),
         w AS (SELECT k.gid, k.nbr,
                 (round(CASE WHEN k.dist / b.bw >= 1 THEN 0.0
                       ELSE 1.0 - k.dist / b.bw END, 9) + 0.0) AS w
               FROM knn k JOIN bw b ON k.gid = b.gid
               UNION ALL SELECT gid, gid AS nbr, 1.0 AS w FROM pts)
         SELECT gid, nbr, w FROM w ORDER BY gid, nbr""",

    "q12k_kernel_distband" ->
      s"""WITH $PTS,
         prs AS (SELECT * FROM (
                   SELECT a.gid AS gid, b.gid AS nbr,
                     sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) AS dist
                   FROM pts a JOIN pts b ON a.gid <> b.gid) t
                 WHERE dist <= 8.0),
         w AS (SELECT gid, nbr,
                 (round(CASE WHEN dist / 8.0 >= 1 THEN 0.0
                       ELSE 0.75 * (1.0 - (dist/8.0) * (dist/8.0)) END, 9) + 0.0) AS w
               FROM prs
               UNION ALL SELECT gid, gid AS nbr, 1.0 AS w FROM pts)
         SELECT gid, nbr, w FROM w ORDER BY gid, nbr""",

    "q43_knn_sub" ->
      s"""WITH $KNN4
         SELECT gid, nbr, CAST(rk AS BIGINT) AS rk FROM knn
         WHERE gid >= 100 AND gid < 200 ORDER BY gid, rk""",

    "q44_weights_fids" ->
      """SELECT CAST(c_custkey AS BIGINT) AS gid FROM customer
         ORDER BY gid""",

    "q45_weights_json" ->
      s"""WITH $KNN4,
         rows_ AS (SELECT gid,
                     '"' || CAST(gid AS VARCHAR) || '":[[' ||
                     string_agg(CAST(nbr AS VARCHAR), ',' ORDER BY rk) ||
                     '],[' || string_agg('1.0', ',' ORDER BY rk) || ']]' AS r
                   FROM knn GROUP BY gid)
         SELECT '{' || string_agg(r, ',' ORDER BY gid) || '}' AS js
         FROM rows_""",

    "q63b_weights_astext_gwt" ->
      s"""WITH $KNN4
         SELECT gid, CAST(gid AS VARCHAR) || ':[' ||
           string_agg(CAST(nbr AS VARCHAR), ',' ORDER BY rk) || ']:[' ||
           string_agg(CAST((round(1.0/dist, 4) + 0.0) AS VARCHAR), ',' ORDER BY rk)
           || ']' AS txt
         FROM knn GROUP BY gid ORDER BY gid""",

    // ---- tile-windowed LISA (window-trim semantics) ----
    "q67_tile_moran" ->
      s"""WITH $KNN4, $VALS,
         tiles AS (SELECT gid,
                     (CAST(floor(x / 40.0) AS BIGINT) + 1048576) * 2097152 +
                     (CAST(floor(y / 40.0) AS BIGINT) + 1048576) AS tile
                   FROM pts),
         tv AS (SELECT t.gid, t.tile, v.value
                FROM tiles t JOIN vals v ON t.gid = v.gid),
         tmom AS (SELECT tile, avg(value) AS m, stddev_samp(value) AS sd,
                         count(*) AS cnt
                  FROM tv GROUP BY tile),
         zt AS (SELECT tv.gid, tv.tile,
                  CASE WHEN m2.cnt <= 1 THEN tv.value
                       WHEN m2.sd = 0 OR m2.sd IS NULL THEN tv.value - m2.m
                       ELSE (tv.value - m2.m) / m2.sd END AS z
                FROM tv JOIN tmom m2 ON tv.tile = m2.tile),
         tn AS (SELECT k.gid, k.nbr FROM knn k
                JOIN zt a ON k.gid = a.gid
                JOIN zt b ON k.nbr = b.gid AND a.tile = b.tile),
         lagt AS (SELECT tn.gid, avg(zb.z) AS lag
                  FROM tn JOIN zt zb ON tn.nbr = zb.gid GROUP BY tn.gid)
         SELECT zt.gid AS gid, zt.tile AS tile,
                (round(coalesce(zt.z * lagt.lag, 0.0), 4) + 0.0) AS stat
         FROM zt LEFT JOIN lagt ON zt.gid = lagt.gid ORDER BY gid""",

    // per-tile bivariate Moran: per-window standardization of both
    // variables, lag over the second's z with in-tile neighbor trim
    "q95_tile_bimoran" ->
      s"""WITH $KNN4, $VALS,
         tiles AS (SELECT gid,
                     (CAST(floor(x / 40.0) AS BIGINT) + 1048576) * 2097152 +
                     (CAST(floor(y / 40.0) AS BIGINT) + 1048576) AS tile
                   FROM pts),
         v2 AS (SELECT gid, CAST((gid*7) % 30 + 1 AS DOUBLE) AS value
                FROM vals),
         tvx AS (SELECT t.gid, t.tile, v.value
                 FROM tiles t JOIN vals v ON t.gid = v.gid),
         tvy AS (SELECT t.gid, t.tile, v.value
                 FROM tiles t JOIN v2 v ON t.gid = v.gid),
         momx AS (SELECT tile, avg(value) AS m, stddev_samp(value) AS sd,
                         count(*) AS cnt
                  FROM tvx GROUP BY tile),
         zx AS (SELECT tvx.gid, tvx.tile,
                  CASE WHEN m2.cnt <= 1 THEN tvx.value
                       WHEN m2.sd = 0 OR m2.sd IS NULL
                         THEN tvx.value - m2.m
                       ELSE (tvx.value - m2.m) / m2.sd END AS z
                FROM tvx JOIN momx m2 ON tvx.tile = m2.tile),
         momy AS (SELECT tile, avg(value) AS m, stddev_samp(value) AS sd,
                         count(*) AS cnt
                  FROM tvy GROUP BY tile),
         zy AS (SELECT tvy.gid, tvy.tile,
                  CASE WHEN m2.cnt <= 1 THEN tvy.value
                       WHEN m2.sd = 0 OR m2.sd IS NULL
                         THEN tvy.value - m2.m
                       ELSE (tvy.value - m2.m) / m2.sd END AS z
                FROM tvy JOIN momy m2 ON tvy.tile = m2.tile),
         tn AS (SELECT k.gid, k.nbr FROM knn k
                JOIN zx a ON k.gid = a.gid
                JOIN zx b ON k.nbr = b.gid AND a.tile = b.tile),
         lagt AS (SELECT tn.gid, avg(zyb.z) AS lag
                  FROM tn JOIN zy zyb ON tn.nbr = zyb.gid GROUP BY tn.gid)
         SELECT zx.gid AS gid, zx.tile AS tile,
                (round(coalesce(zx.z * lagt.lag, 0.0), 4) + 0.0) AS stat
         FROM zx LEFT JOIN lagt ON zx.gid = lagt.gid ORDER BY gid""",

    "q69_tile_joincount" ->
      s"""WITH $KNN4, $BINVAR,
         tiles AS (SELECT gid,
                     (CAST(floor(x / 40.0) AS BIGINT) + 1048576) * 2097152 +
                     (CAST(floor(y / 40.0) AS BIGINT) + 1048576) AS tile
                   FROM pts),
         tb AS (SELECT t.gid, t.tile, b.x
                FROM tiles t JOIN bin b ON t.gid = b.gid),
         tn AS (SELECT k.gid, k.nbr FROM knn k
                JOIN tb a ON k.gid = a.gid
                JOIN tb b ON k.nbr = b.gid AND a.tile = b.tile),
         s AS (SELECT tn.gid, sum(nb.x) AS snbr, count(*) AS nn
               FROM tn JOIN tb nb ON tn.nbr = nb.gid GROUP BY tn.gid)
         SELECT t.gid AS gid, t.tile AS tile,
                CAST(t.x * coalesce(s.snbr, 0) AS BIGINT) AS jc,
                CAST(coalesce(s.nn, 0) AS BIGINT) AS nn,
                CAST(CASE WHEN coalesce(s.nn, 0) > 0 AND t.x = 1.0
                          AND t.x * coalesce(s.snbr, 0) > 0
                     THEN 1 ELSE 0 END AS BIGINT) AS sig_def
         FROM tb t LEFT JOIN s ON t.gid = s.gid ORDER BY gid""",

    "q70_tile_multigeary" ->
      s"""WITH $KNN4,
         mv AS (SELECT CAST(c_custkey AS BIGINT) AS gid,
                       CAST(c_acctbal AS DOUBLE) AS v1,
                       CAST((c_custkey * 17) % 1000 AS DOUBLE) AS v2
                FROM customer),
         $TILES40,
         tv AS (SELECT t.gid, t.tile, m.v1, m.v2
                FROM tiles t JOIN mv m ON t.gid = m.gid),
         tmom AS (SELECT tile, avg(v1) AS m1, stddev_samp(v1) AS s1,
                         avg(v2) AS m2, stddev_samp(v2) AS s2,
                         count(*) AS cnt
                  FROM tv GROUP BY tile),
         zt AS (SELECT tv.gid, tv.tile,
                  CASE WHEN q.cnt <= 1 THEN tv.v1
                       WHEN q.s1 = 0 OR q.s1 IS NULL THEN tv.v1 - q.m1
                       ELSE (tv.v1 - q.m1) / q.s1 END AS z1,
                  CASE WHEN q.cnt <= 1 THEN tv.v2
                       WHEN q.s2 = 0 OR q.s2 IS NULL THEN tv.v2 - q.m2
                       ELSE (tv.v2 - q.m2) / q.s2 END AS z2
                FROM tv JOIN tmom q ON tv.tile = q.tile),
         tn AS (SELECT k.gid, k.nbr FROM knn k
                JOIN zt a ON k.gid = a.gid
                JOIN zt b ON k.nbr = b.gid AND a.tile = b.tile),
         g AS (SELECT tn.gid,
                 (avg((za.z1 - zb.z1) * (za.z1 - zb.z1)) +
                  avg((za.z2 - zb.z2) * (za.z2 - zb.z2))) / 2.0 AS c
               FROM tn JOIN zt za ON tn.gid = za.gid
                       JOIN zt zb ON tn.nbr = zb.gid
               GROUP BY tn.gid)
         SELECT zt.gid AS gid, zt.tile AS tile,
                (round(coalesce(g.c, 0.0), 4) + 0.0) AS mgeary
         FROM zt LEFT JOIN g ON zt.gid = g.gid ORDER BY gid""",

    "q71_tile_quantile" ->
      s"""WITH $KNN4, $VALS,
         $TILES40,
         tv AS (SELECT t.gid, t.tile, v.value
                FROM tiles t JOIN vals v ON t.gid = v.gid),
         ts AS (SELECT tile, value AS val,
                  row_number() OVER (PARTITION BY tile ORDER BY value) - 1
                    AS rk
                FROM tv),
         tc AS (SELECT tile, CAST(count(*) AS DOUBLE) AS cnt
                FROM tv GROUP BY tile),
         bis AS (SELECT unnest([1, 2, 3, 4]) AS bi),
         ${tileBrkCte("brks", "(20.0 * g.bi)", "ts",
           extraFrom = "CROSS JOIN bis g")},
         ind AS (SELECT tv.gid, tv.tile,
                   CASE WHEN (SELECT count(*) FROM brks b
                              WHERE b.tile = tv.tile AND tv.value >= b.brk)
                        = 4 THEN 1.0 ELSE 0.0 END AS x
                 FROM tv),
         tn AS (SELECT k.gid, k.nbr FROM knn k
                JOIN ind a ON k.gid = a.gid
                JOIN ind b ON k.nbr = b.gid AND a.tile = b.tile),
         s AS (SELECT tn.gid, sum(i2.x) AS snbr, count(*) AS nn
               FROM tn JOIN ind i2 ON tn.nbr = i2.gid GROUP BY tn.gid)
         SELECT i.gid AS gid, i.tile AS tile,
                CAST(i.x * coalesce(s.snbr, 0) AS BIGINT) AS qjc,
                CAST(coalesce(s.nn, 0) AS BIGINT) AS nn,
                CAST(CASE WHEN coalesce(s.nn, 0) > 0 AND i.x = 1.0
                          AND i.x * coalesce(s.snbr, 0) > 0
                     THEN 1 ELSE 0 END AS BIGINT) AS sig_def
         FROM ind i LEFT JOIN s ON i.gid = s.gid ORDER BY gid""",

    "q72_tile_bijoincount" ->
      s"""WITH $KNN4, $BINVAR,
         $TILES40,
         tb AS (SELECT t.gid, t.tile, b.x AS x1, 1.0 - b.x AS x2
                FROM tiles t JOIN bin b ON t.gid = b.gid),
         tn AS (SELECT k.gid, k.nbr FROM knn k
                JOIN tb a ON k.gid = a.gid
                JOIN tb b ON k.nbr = b.gid AND a.tile = b.tile),
         s AS (SELECT tn.gid, sum(nb.x2) AS snbr, count(*) AS nn
               FROM tn JOIN tb nb ON tn.nbr = nb.gid GROUP BY tn.gid)
         SELECT t.gid AS gid, t.tile AS tile,
                CAST(t.x1 * coalesce(s.snbr, 0) AS BIGINT) AS bjc,
                CAST(coalesce(s.nn, 0) AS BIGINT) AS nn,
                CAST(CASE WHEN coalesce(s.nn, 0) > 0 AND t.x1 = 1.0
                          AND t.x1 * coalesce(s.snbr, 0) > 0
                     THEN 1 ELSE 0 END AS BIGINT) AS sig_def
         FROM tb t LEFT JOIN s ON t.gid = s.gid ORDER BY gid""",

    "q73_tile_multijoincount" ->
      s"""WITH $KNN4,
         mv AS (SELECT CAST(c_custkey AS BIGINT) AS gid,
                  (CASE WHEN (c_custkey * 13) % 7 < 3 THEN 1.0 ELSE 0.0 END) *
                  (CASE WHEN (c_custkey * 11) % 5 < 2 THEN 1.0 ELSE 0.0 END)
                    AS prod
                FROM customer),
         $TILES40,
         tb AS (SELECT t.gid, t.tile, m.prod
                FROM tiles t JOIN mv m ON t.gid = m.gid),
         tn AS (SELECT k.gid, k.nbr FROM knn k
                JOIN tb a ON k.gid = a.gid
                JOIN tb b ON k.nbr = b.gid AND a.tile = b.tile),
         s AS (SELECT tn.gid, sum(nb.prod) AS snbr, count(*) AS nn
               FROM tn JOIN tb nb ON tn.nbr = nb.gid GROUP BY tn.gid)
         SELECT t.gid AS gid, t.tile AS tile,
                CAST(t.prod * coalesce(s.snbr, 0) AS BIGINT) AS mjc,
                CAST(coalesce(s.nn, 0) AS BIGINT) AS nn,
                CAST(CASE WHEN coalesce(s.nn, 0) > 0 AND t.prod = 1.0
                          AND t.prod * coalesce(s.snbr, 0) > 0
                     THEN 1 ELSE 0 END AS BIGINT) AS sig_def
         FROM tb t LEFT JOIN s ON t.gid = s.gid ORDER BY gid""",

    "q74_tile_multiquantile" ->
      s"""WITH $KNN4,
         mv AS (SELECT CAST(c_custkey AS BIGINT) AS gid,
                       CAST(c_acctbal AS DOUBLE) AS v1,
                       CAST((c_custkey * 17) % 1000 AS DOUBLE) AS v2
                FROM customer),
         $TILES40,
         tv AS (SELECT t.gid, t.tile, m.v1, m.v2
                FROM tiles t JOIN mv m ON t.gid = m.gid),
         s1r AS (SELECT tile, v1 AS val,
                   row_number() OVER (PARTITION BY tile ORDER BY v1) - 1
                     AS rk
                 FROM tv),
         s2r AS (SELECT tile, v2 AS val,
                   row_number() OVER (PARTITION BY tile ORDER BY v2) - 1
                     AS rk
                 FROM tv),
         tc AS (SELECT tile, CAST(count(*) AS DOUBLE) AS cnt
                FROM tv GROUP BY tile),
         ${tileBrkCte("b1", "75.0", "s1r")},
         ${tileBrkCte("b2", "25.0", "s2r")},
         ind AS (SELECT tv.gid, tv.tile,
                   (CASE WHEN tv.v1 >= b1.brk THEN 1.0 ELSE 0.0 END) *
                   (CASE WHEN tv.v2 < b2.brk THEN 1.0 ELSE 0.0 END) AS x
                 FROM tv JOIN b1 ON tv.tile = b1.tile
                         JOIN b2 ON tv.tile = b2.tile),
         tn AS (SELECT k.gid, k.nbr FROM knn k
                JOIN ind a ON k.gid = a.gid
                JOIN ind b ON k.nbr = b.gid AND a.tile = b.tile),
         s AS (SELECT tn.gid, sum(i2.x) AS snbr, count(*) AS nn
               FROM tn JOIN ind i2 ON tn.nbr = i2.gid GROUP BY tn.gid)
         SELECT i.gid AS gid, i.tile AS tile,
                CAST(i.x * coalesce(s.snbr, 0) AS BIGINT) AS mqjc,
                CAST(coalesce(s.nn, 0) AS BIGINT) AS nn,
                CAST(CASE WHEN coalesce(s.nn, 0) > 0 AND i.x = 1.0
                          AND i.x * coalesce(s.snbr, 0) > 0
                     THEN 1 ELSE 0 END AS BIGINT) AS sig_def
         FROM ind i LEFT JOIN s ON i.gid = s.gid ORDER BY gid""",

    "q75_tile_g" ->
      s"""WITH $KNN4, $VALS,
         $TILES40,
         tv AS (SELECT t.gid, t.tile, v.value
                FROM tiles t JOIN vals v ON t.gid = v.gid),
         tot AS (SELECT tile, sum(value) AS sall FROM tv GROUP BY tile),
         tn AS (SELECT k.gid, k.nbr FROM knn k
                JOIN tv a ON k.gid = a.gid
                JOIN tv b ON k.nbr = b.gid AND a.tile = b.tile),
         num AS (SELECT tn.gid, sum(nb.value) AS sn
                 FROM tn JOIN tv nb ON tn.nbr = nb.gid GROUP BY tn.gid)
         SELECT v.gid AS gid, v.tile AS tile,
                (round(CASE WHEN num.sn IS NULL
                           OR tot.sall - v.value = 0 THEN 0.0
                      ELSE num.sn / (tot.sall - v.value) END, 8) + 0.0) AS g
         FROM tv v JOIN tot ON v.tile = tot.tile
         LEFT JOIN num ON v.gid = num.gid ORDER BY gid""",

    "q76_tile_gstar" ->
      s"""WITH $KNN4, $VALS,
         $TILES40,
         tv AS (SELECT t.gid, t.tile, v.value
                FROM tiles t JOIN vals v ON t.gid = v.gid),
         tot AS (SELECT tile, sum(value) AS sall FROM tv GROUP BY tile),
         tn AS (SELECT k.gid, k.nbr FROM knn k
                JOIN tv a ON k.gid = a.gid
                JOIN tv b ON k.nbr = b.gid AND a.tile = b.tile),
         num AS (SELECT tn.gid, sum(nb.value) AS sn
                 FROM tn JOIN tv nb ON tn.nbr = nb.gid GROUP BY tn.gid)
         SELECT v.gid AS gid, v.tile AS tile,
                (round(CASE WHEN num.sn IS NULL OR tot.sall = 0 THEN 0.0
                      ELSE (num.sn + v.value) / tot.sall END, 8) + 0.0) AS gstar
         FROM tv v JOIN tot ON v.tile = tot.tile
         LEFT JOIN num ON v.gid = num.gid ORDER BY gid""",

    "q77_tile_geary" ->
      s"""WITH $KNN4, $VALS,
         $TILES40,
         tv AS (SELECT t.gid, t.tile, v.value
                FROM tiles t JOIN vals v ON t.gid = v.gid),
         tmom AS (SELECT tile, avg(value) AS m, stddev_samp(value) AS sd,
                         count(*) AS cnt
                  FROM tv GROUP BY tile),
         zt AS (SELECT tv.gid, tv.tile,
                  CASE WHEN m2.cnt <= 1 THEN tv.value
                       WHEN m2.sd = 0 OR m2.sd IS NULL THEN tv.value - m2.m
                       ELSE (tv.value - m2.m) / m2.sd END AS z
                FROM tv JOIN tmom m2 ON tv.tile = m2.tile),
         tn AS (SELECT k.gid, k.nbr FROM knn k
                JOIN zt a ON k.gid = a.gid
                JOIN zt b ON k.nbr = b.gid AND a.tile = b.tile),
         g AS (SELECT tn.gid, avg((za.z - zb.z) * (za.z - zb.z)) AS c
               FROM tn JOIN zt za ON tn.gid = za.gid
                       JOIN zt zb ON tn.nbr = zb.gid
               GROUP BY tn.gid)
         SELECT zt.gid AS gid, zt.tile AS tile,
                (round(coalesce(g.c, 0.0), 4) + 0.0) AS geary
         FROM zt LEFT JOIN g ON zt.gid = g.gid ORDER BY gid""",

    // ---- webtext north-rule chain (md5 geocode replayed in SQL) ----
    "q62_webtext_moran" ->
      s"""WITH pages AS (
           SELECT 'https://site-' || CAST(doc_id % 97 AS VARCHAR) ||
                  '.example/page/' || CAST(doc_id AS VARCHAR) AS url,
                  text
           FROM documents),
         geo AS (
           SELECT CAST(('0x' || substr(md5(url), 17, 15)) AS BIGINT) AS gid,
                  CAST(CAST(('0x' || substr(md5(url), 1, 8)) AS BIGINT)
                    % 18000 AS DOUBLE) / 100.0 AS x,
                  CAST(CAST(('0x' || substr(md5(url), 9, 8)) AS BIGINT)
                    % 18000 AS DOUBLE) / 100.0 AS y,
                  CAST(length(text) AS DOUBLE) AS value
           FROM pages),
         allp AS (SELECT a.gid AS gid, b.gid AS nbr,
                    sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) AS dist
                  FROM geo a JOIN geo b ON a.gid <> b.gid),
         wknn AS (SELECT gid, nbr FROM (
                    SELECT gid, nbr, dist,
                      row_number() OVER (PARTITION BY gid
                        ORDER BY dist, nbr) AS rk
                    FROM allp) t WHERE rk <= 4),
         zw AS (SELECT gid,
                  (value - avg(value) OVER ()) / stddev_samp(value) OVER ()
                    AS z
                FROM geo),
         lagw AS (SELECT k.gid, avg(z2.z) AS lag
                  FROM wknn k JOIN zw z2 ON k.nbr = z2.gid GROUP BY k.gid)
         SELECT zw.gid AS gid, (round(zw.z * lagw.lag, 4) + 0.0) AS moran_i
         FROM zw JOIN lagw ON zw.gid = lagw.gid ORDER BY gid""",

    // ---- LLM-data ops ----
    "q53_lang_id" ->
      """WITH words AS (
           SELECT doc_id, unnest(list_filter(
             string_split_regex(lower(text), '\s+'), w -> w <> '')) AS w
           FROM documents),
         profiles AS (SELECT * FROM (VALUES
           ('en','the'),('en','and'),('en','of'),('en','to'),('en','in'),
           ('en','is'),('en','that'),
           ('de','der'),('de','die'),('de','und'),('de','das'),('de','ist'),
           ('de','nicht'),('de','ein'),
           ('fr','le'),('fr','la'),('fr','et'),('fr','les'),('fr','des'),
           ('fr','est'),('fr','une'),
           ('es','el'),('es','la'),('es','de'),('es','que'),('es','los'),
           ('es','es'),('es','una'),
           ('it','il'),('it','di'),('it','che'),('it','la'),('it','per'),
           ('it','con'),('it','del')) t(lang, w)),
         sc AS (SELECT w.doc_id, p.lang, count(*) AS s
                FROM words w JOIN profiles p ON w.w = p.w GROUP BY 1, 2),
         tot AS (SELECT doc_id, sum(s) AS t FROM sc GROUP BY 1),
         best AS (SELECT doc_id, lang, s,
                    row_number() OVER (PARTITION BY doc_id
                      ORDER BY s DESC, lang) AS rn
                  FROM sc)
         SELECT d.doc_id AS id,
                coalesce(b.lang, 'und') AS lang_pred,
                coalesce((round(CAST(b.s AS DOUBLE) / t.t, 6) + 0.0), 0.0)
                  AS confidence
         FROM documents d
         LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.doc_id = b.doc_id
         LEFT JOIN tot t ON d.doc_id = t.doc_id
         ORDER BY id""",

    "q56_ngram_jaccard" ->
      """WITH ws AS (
           SELECT doc_id, list_filter(
             string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
           FROM documents),
         sh AS (
           SELECT doc_id, unnest(list_distinct(CASE
             WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
             WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             ELSE list_transform(range(1, len(w) - 1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
           END)) AS s
           FROM ws),
         cnt AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY 1),
         prs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM documents a JOIN documents b
                   ON b.doc_id = a.doc_id + 1),
         inter AS (SELECT p.id_a, p.id_b, count(*) AS ni
                   FROM prs p
                   JOIN sh sa ON sa.doc_id = p.id_a
                   JOIN sh sb ON sb.doc_id = p.id_b AND sa.s = sb.s
                   GROUP BY 1, 2)
         SELECT p.id_a AS id_a, p.id_b AS id_b,
                (round(CAST(coalesce(i.ni, 0) AS DOUBLE) /
                  (ca.nsh + cb.nsh - coalesce(i.ni, 0)), 6) + 0.0) AS jaccard
         FROM prs p
         LEFT JOIN inter i ON p.id_a = i.id_a AND p.id_b = i.id_b
         JOIN cnt ca ON ca.doc_id = p.id_a
         JOIN cnt cb ON cb.doc_id = p.id_b
         ORDER BY id_a""",

    "q57_ann_brute" ->
      """WITH nrm AS (
           SELECT vec_id AS id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         u AS (
           SELECT id, CASE WHEN nr = 0 THEN v
                      ELSE list_transform(v, x -> x / nr) END AS unit
           FROM (SELECT id, v,
                   sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum'))
                     AS nr
                 FROM nrm) t),
         scored AS (
           SELECT q.qid, c.id,
             list_aggregate(list_transform(range(1, len(c.unit) + 1),
               i -> c.unit[i] * q.qunit[i]), 'sum') AS cosine
           FROM u c
           CROSS JOIN (SELECT id AS qid, unit AS qunit FROM u WHERE id < 5) q
           WHERE c.id <> q.qid),
         ranked AS (SELECT qid, id, cosine,
                      row_number() OVER (PARTITION BY qid
                        ORDER BY cosine DESC, id) AS rk
                    FROM scored)
         SELECT qid, id, CAST(rk AS BIGINT) AS rk, (round(cosine, 6) + 0.0) AS cosine
         FROM ranked WHERE rk <= 10 ORDER BY qid, rk""",

    "q57b_ann_ivf" ->
      """WITH nrm AS (
           SELECT vec_id AS id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         u AS (
           SELECT id, CASE WHEN nr = 0 THEN v
                      ELSE list_transform(v, x -> x / nr) END AS unit
           FROM (SELECT id, v,
                   sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum'))
                     AS nr
                 FROM nrm) t),
         seeds AS (
           SELECT CAST(row_number() OVER (ORDER BY id) AS INT) - 1 AS cid,
                  unit AS cunit
           FROM (SELECT id, unit FROM u ORDER BY id LIMIT 16) s),
         sim1 AS (
           SELECT c.id, c.unit, s.cid,
             list_aggregate(list_transform(range(1, len(c.unit) + 1),
               i -> c.unit[i] * s.cunit[i]), 'sum') AS sim
           FROM u c CROSS JOIN seeds s),
         asg AS (SELECT id, unit, cid FROM (
             SELECT id, unit, cid, row_number() OVER (PARTITION BY id
               ORDER BY sim DESC, cid) AS rk FROM sim1) t
           WHERE rk = 1),
         cposx AS (
           SELECT cid, unnest(range(1, len(unit) + 1)) AS pos, unit
           FROM asg),
         cpos AS (
           SELECT cid, pos, avg(unit[CAST(pos AS INT)]) AS m
           FROM cposx GROUP BY cid, pos),
         cent AS (SELECT cid, list(m ORDER BY pos) AS cunit
                  FROM cpos GROUP BY cid),
         sim2 AS (
           SELECT c.id, c.unit, ct.cid,
             list_aggregate(list_transform(range(1, len(c.unit) + 1),
               i -> c.unit[i] * ct.cunit[i]), 'sum') AS sim
           FROM u c CROSS JOIN cent ct),
         bucketed AS (SELECT id, unit, cid FROM (
             SELECT id, unit, cid, row_number() OVER (PARTITION BY id
               ORDER BY sim DESC, cid) AS rk FROM sim2) t
           WHERE rk = 1),
         qsim AS (
           SELECT q.id AS qid, q.unit AS qunit, ct.cid,
             list_aggregate(list_transform(range(1, len(q.unit) + 1),
               i -> q.unit[i] * ct.cunit[i]), 'sum') AS sim
           FROM u q CROSS JOIN cent ct WHERE q.id < 5),
         probes AS (SELECT qid, qunit, cid FROM (
             SELECT qid, qunit, cid, row_number() OVER (PARTITION BY qid
               ORDER BY sim DESC, cid) AS rk FROM qsim) t
           WHERE rk <= 4),
         scored AS (
           SELECT p.qid, b.id,
             list_aggregate(list_transform(range(1, len(b.unit) + 1),
               i -> b.unit[i] * p.qunit[i]), 'sum') AS cosine
           FROM probes p JOIN bucketed b ON p.cid = b.cid
           WHERE b.id <> p.qid),
         ranked AS (SELECT qid, id, cosine,
             row_number() OVER (PARTITION BY qid
               ORDER BY cosine DESC, id) AS rk
           FROM scored)
         SELECT qid, id, CAST(rk AS BIGINT) AS rk, (round(cosine, 6) + 0.0) AS cosine
         FROM ranked WHERE rk <= 10 ORDER BY qid, rk""",

    // SemDeDup flat path, replayed end to end: the h0..hx CTE chain is
    // Spark's xxhash64(bigint) (seed 42, XXH64 one-lane finalization)
    // in HUGEINT mod-2^64 arithmetic — 64-bit multiplies go through
    // 32-bit limbs because a HUGEINT product of two 64-bit values can
    // overflow 2^127; rotations are (x*2^r mod 2^64) + (x div 2^(64-r));
    // logical right shifts are floor division (values are non-negative).
    // Verified bit-exact against Spark's xxhash64 before wiring in.
    // Then: hash-scattered seed draw (ORDER BY xx, id LIMIT k — exactly
    // Similarity.scatteredCentroids), one Lloyd sweep (q57b's pattern),
    // cid-keyed exact-cosine pairs at threshold 0.85, recursive-CTE
    // min-label connected components (q87's pattern, labels only
    // propagate downhill), and the keep rule: per component, lowest
    // similarity-to-own-centroid wins, ties by min id.
    "q104_semantic_dedup" ->
      """WITH RECURSIVE
         corp AS (
           SELECT CAST(vec_id AS BIGINT) AS id, embedding FROM embeddings
           UNION ALL
           SELECT CAST(vec_id AS BIGINT) + 1000000, embedding FROM embeddings),
         nrm AS (SELECT id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM corp),
         u AS (SELECT id, CASE WHEN nr = 0 THEN v ELSE list_transform(v, x -> x / nr) END AS unit
               FROM (SELECT id, v, sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nr FROM nrm) t),
         h0 AS (SELECT id, CAST(id AS HUGEINT) AS x FROM corp),
         h1 AS (SELECT id, (((x)%4294967296)*668265295 + ((((x)//4294967296)*668265295 + ((x)%4294967296)*3266489917) % 4294967296) * 4294967296) % 18446744073709551616 AS x FROM h0),
         h2 AS (SELECT id, (((x) * 2147483648::HUGEINT) % 18446744073709551616 + (x) // 8589934592::HUGEINT) AS x FROM h1),
         h3 AS (SELECT id, (((x)%4294967296)*2246822535 + ((((x)//4294967296)*2246822535 + ((x)%4294967296)*2654435761) % 4294967296) * 4294967296) % 18446744073709551616 AS x FROM h2),
         h4 AS (SELECT id, xor(2870177450012600311::HUGEINT, x) AS x FROM h3),
         h5 AS (SELECT id, (((x) * 134217728::HUGEINT) % 18446744073709551616 + (x) // 137438953472::HUGEINT) AS x FROM h4),
         h6 AS (SELECT id, ((((x)%4294967296)*2246822535 + ((((x)//4294967296)*2246822535 + ((x)%4294967296)*2654435761) % 4294967296) * 4294967296) % 18446744073709551616 + 9650029242287828579) % 18446744073709551616 AS x FROM h5),
         h7 AS (SELECT id, xor(x, x // 8589934592::HUGEINT) AS x FROM h6),
         h8 AS (SELECT id, (((x)%4294967296)*668265295 + ((((x)//4294967296)*668265295 + ((x)%4294967296)*3266489917) % 4294967296) * 4294967296) % 18446744073709551616 AS x FROM h7),
         h9 AS (SELECT id, xor(x, x // 536870912::HUGEINT) AS x FROM h8),
         ha AS (SELECT id, (((x)%4294967296)*2654435833 + ((((x)//4294967296)*2654435833 + ((x)%4294967296)*374761393) % 4294967296) * 4294967296) % 18446744073709551616 AS x FROM h9),
         hx AS (SELECT id, CAST(CASE WHEN y >= 9223372036854775808::HUGEINT
                       THEN y - 18446744073709551616::HUGEINT ELSE y END AS BIGINT) AS xx
                FROM (SELECT id, xor(x, x // 4294967296::HUGEINT) AS y FROM ha) t),
         seeds AS (
           SELECT CAST(row_number() OVER (ORDER BY hx.xx, u.id) AS INT) - 1 AS cid, u.unit AS cunit
           FROM u JOIN hx ON u.id = hx.id ORDER BY hx.xx, u.id LIMIT 16),
         sim1 AS (
           SELECT c.id, c.unit, s.cid, list_aggregate(list_transform(range(1, len(c.unit) + 1), i -> c.unit[i] * s.cunit[i]), 'sum') AS sim
           FROM u c CROSS JOIN seeds s),
         asg AS (SELECT id, unit, cid FROM (
             SELECT id, unit, cid, row_number() OVER (PARTITION BY id ORDER BY sim DESC, cid) AS rk
             FROM sim1) t WHERE rk = 1),
         cpos AS (SELECT cid, pos, avg(unit[CAST(pos AS INT)]) AS m
                  FROM (SELECT cid, unnest(range(1, len(unit) + 1)) AS pos, unit FROM asg) t
                  GROUP BY cid, pos),
         cent AS (SELECT cid, list(m ORDER BY pos) AS cunit FROM cpos GROUP BY cid),
         sim2 AS (
           SELECT c.id, c.unit, ct.cid, list_aggregate(list_transform(range(1, len(c.unit) + 1), i -> c.unit[i] * ct.cunit[i]), 'sum') AS sim
           FROM u c CROSS JOIN cent ct),
         assigned AS (SELECT id, unit, cid FROM (
             SELECT id, unit, cid, row_number() OVER (PARTITION BY id ORDER BY sim DESC, cid) AS rk
             FROM sim2) t WHERE rk = 1),
         prs AS (
           SELECT a.id AS u, b.id AS v
           FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.id < b.id
           WHERE list_aggregate(list_transform(range(1, len(a.unit) + 1), i -> a.unit[i] * b.unit[i]), 'sum') >= 0.85),
         eb AS (SELECT u, v FROM prs UNION SELECT v, u FROM prs),
         reach(id, lbl) AS (
           SELECT id, id FROM corp
           UNION
           SELECT eb.v, r.lbl FROM reach r JOIN eb ON eb.u = r.id WHERE r.lbl < eb.v),
         cc AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
         csim AS (
           SELECT a.id, list_aggregate(list_transform(range(1, len(a.unit) + 1), i -> a.unit[i] * ct.cunit[i]), 'sum') AS cs
           FROM assigned a JOIN cent ct ON a.cid = ct.cid),
         ranked AS (
           SELECT cc.id, cc.component,
             row_number() OVER (PARTITION BY cc.component ORDER BY csim.cs, cc.id) AS rk
           FROM cc JOIN csim ON cc.id = csim.id)
         SELECT id, component, (rk = 1) AS keep FROM ranked ORDER BY id""",

    "q58b_quality" ->
      """WITH f AS (
           SELECT doc_id AS id,
                  CAST(length(text) AS DOUBLE) AS n_chars,
                  len(string_split_regex(text, '\s+')) AS tokens,
                  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                    AS DOUBLE) AS alpha,
                  len(string_split_regex(lower(text),
                    '\b(the|and|of|to|in|is|that|a|for|it)\b')) - 1 AS stop
           FROM documents),
         g AS (
           SELECT id, n_chars, CAST(tokens AS BIGINT) AS n_tokens,
                  CASE WHEN n_chars > 0 THEN alpha / n_chars ELSE 0.0 END
                    AS alpha_ratio,
                  CASE WHEN tokens > 0 THEN CAST(stop AS DOUBLE) / tokens
                       ELSE 0.0 END AS stopword_ratio,
                  CASE WHEN tokens > 0 THEN n_chars / tokens ELSE 0.0 END
                    AS mwl
           FROM f)
         SELECT id, n_chars, n_tokens,
                (round(alpha_ratio, 6) + 0.0) AS alpha_ratio,
                (round(stopword_ratio, 6) + 0.0) AS stopword_ratio,
                CASE WHEN n_tokens >= 10 AND alpha_ratio > 0.6
                       AND stopword_ratio > 0.05 AND mwl BETWEEN 3 AND 12
                     THEN 1.0 ELSE 0.0 END AS quality
         FROM g ORDER BY id"""
  )
}
