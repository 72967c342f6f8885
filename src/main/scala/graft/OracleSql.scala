package graft

/** DuckDB oracle SQL for SparkEntry.queries (driver contract). Each oracle
  * re-derives the operator's semantics in portable SQL over the same
  * parquet tables, with expression shapes chosen so double arithmetic is
  * bit-identical to the Spark side (same IEEE ops in the same order) and
  * aggregates are decimal/integer-exact.
  */
object OracleSql {

  /** Morton even-bit spread of a BIGINT column (<= 26 significant bits),
    * the same magic-mask sequence as graft.geom.CellIndex.spreadBits.
    * `v` must be a bare column name (the expression inlines it 32x).
    */
  private def spread(v: String): String = {
    val a = s"(($v | ($v << 16)) & 281470681808895)"
    val b = s"(($a | ($a << 8)) & 71777214294589695)"
    val c = s"(($b | ($b << 4)) & 1085102592571150095)"
    val d = s"(($c | ($c << 2)) & 3689348814741910323)"
    s"(($d | ($d << 1)) & 6148914691236517205)"
  }

  /** Clamped grid coordinate: floor((v - min) / span * 2^level). */
  private def gridIx(v: String, min: Double, span: Double, level: Int): String = {
    val n = (1L << level).toDouble
    s"CAST(least(greatest(floor(($v + ${-min}) / $span * $n), 0), ${n.toLong - 1}) AS BIGINT)"
  }

  private def cellId(ix: String, iy: String, level: Int): String =
    s"((CAST($level AS BIGINT) << 53) | ${spread(ix)} | (${spread(iy)} << 1))"

  /** Fixture label points: pinned kernel outputs (see PolylabelSpec; the
    * values for poly1/poly3/ell/degenerates/hole are the reference's own
    * assert_eq constants, /root/reference/src/lib.rs:400-501).
    */
  private val fixtureValues: String = Seq(
    ("degenerate_a", "0.0", "0.0"),
    ("degenerate_b", "0.0", "0.0"),
    ("ell", "0.5625", "0.5625"),
    ("hexagon_two_holes", "2.515625", "2.828125"),
    ("norway", "10.29301152092468", "61.6784192527327"),
    ("poly1", "59.356155563645696", "121.83919629746435"),
    ("poly2", "16.89453125", "16.89453125"),
    ("poly3", "-0.45556816445920356", "51.54848888202887"),
    ("square_with_hole", "35.15625", "35.15625"))
    .map { case (n, x, y) => s"('$n', CAST('$x' AS DOUBLE), CAST('$y' AS DOUBLE))" }
    .mkString(", ")

  private val rectCte =
    """rects AS (
      |  SELECT 'r' || p_partkey AS poly_id,
      |         ((p_partkey % 360) / 10.0 - 18.0) AS cx,
      |         ((p_partkey * 7 % 180) / 10.0 - 9.0) AS cy,
      |         ((p_size % 10 + 1) / 10.0 + 0.05) AS hw,
      |         ((p_size * 3 % 10 + 1) / 10.0 + 0.05) AS hh
      |  FROM part)""".stripMargin

  val all: Map[String, String] = Map(

    "q_polylabel_fixtures" ->
      s"""SELECT * FROM (VALUES $fixtureValues) AS t(poly_id, x, y)
         |ORDER BY poly_id""".stripMargin,

    "q_cell_of" ->
      s"""WITH pts AS (
         |  SELECT ((l_orderkey % 3600) / 10.0 - 180.0) AS x,
         |         ((l_partkey % 1800) / 10.0 - 90.0) AS y
         |  FROM lineitem),
         |ij AS (
         |  SELECT ${gridIx("x", -180.0, 360.0, 12)} AS ix,
         |         ${gridIx("y", -90.0, 180.0, 12)} AS iy
         |  FROM pts),
         |c AS (SELECT ${cellId("ix", "iy", 12)} AS cell_id FROM ij)
         |SELECT cell_id,
         |       ((CAST(11 AS BIGINT) << 53) | ((cell_id & 9007199254740991) >> 2)) AS parent_id,
         |       COUNT(*) AS n
         |FROM c GROUP BY cell_id, parent_id ORDER BY cell_id""".stripMargin,

    "q_cover_rect" ->
      s"""WITH $rectCte,
         |b AS (
         |  SELECT poly_id,
         |         ${gridIx("(cx - hw)", -180.0, 360.0, 8)} AS ix0,
         |         ${gridIx("(cx + hw)", -180.0, 360.0, 8)} AS ix1,
         |         ${gridIx("(cy - hh)", -90.0, 180.0, 8)} AS iy0,
         |         ${gridIx("(cy + hh)", -90.0, 180.0, 8)} AS iy1
         |  FROM rects),
         |gx AS (
         |  SELECT poly_id, iy0, iy1, xs.range AS ix
         |  FROM b JOIN range(0, 256) xs ON xs.range BETWEEN ix0 AND ix1),
         |g AS (
         |  SELECT poly_id, ix, ys.range AS iy
         |  FROM gx JOIN range(0, 256) ys ON ys.range BETWEEN iy0 AND iy1)
         |SELECT poly_id, ${cellId("ix", "iy", 8)} AS cell_id
         |FROM g ORDER BY poly_id, cell_id""".stripMargin,

    "q_pip_join" ->
      s"""WITH pts AS (
         |  SELECT o_orderkey AS point_id,
         |         ((o_orderkey % 360) / 10.0 - 18.0) AS x,
         |         ((o_custkey % 180) / 10.0 - 9.0) AS y
         |  FROM orders),
         |$rectCte
         |SELECT point_id, poly_id
         |FROM pts, rects
         |WHERE x > cx - hw AND x < cx + hw AND y > cy - hh AND y < cy + hh
         |ORDER BY point_id, poly_id""".stripMargin,

    "q_knn_join" ->
      s"""WITH pts AS (
         |  SELECT c_custkey AS point_id,
         |         ((c_custkey % 360) / 10.0 - 18.0) AS x,
         |         ((c_custkey * 7 % 180) / 10.0 - 9.0) AS y
         |  FROM customer),
         |lab AS (
         |  SELECT 's' || s_suppkey AS poly_id,
         |         ((s_suppkey * 13 % 360) / 10.0 - 18.0) AS lx,
         |         ((s_suppkey * 29 % 180) / 10.0 - 9.0) AS ly
         |  FROM supplier),
         |d AS (
         |  SELECT point_id, poly_id,
         |         (x - lx) * (x - lx) + (y - ly) * (y - ly) AS d2
         |  FROM pts, lab),
         |rk AS (
         |  SELECT point_id, poly_id,
         |         row_number() OVER (PARTITION BY point_id ORDER BY d2, poly_id) AS rank
         |  FROM d)
         |SELECT point_id, poly_id, rank FROM rk WHERE rank <= 3
         |ORDER BY point_id, rank""".stripMargin,

    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(CAST(l_quantity AS DECIMAL(18,3))) AS sum_qty,
        |       sum(CAST(l_extendedprice AS DECIMAL(18,3))) AS sum_base,
        |       count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_window_topk" ->
      """WITH j AS (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY c_mktsegment
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT c_mktsegment, rk, o_orderkey,
        |       CAST(o_totalprice AS DECIMAL(18,3)) AS price
        |FROM j WHERE rk <= 5
        |ORDER BY c_mktsegment, rk""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_tile_assign" ->
      s"""WITH imgs AS (
         |  SELECT t.range AS id,
         |         'img-' || lpad(CAST(t.range AS VARCHAR), 8, '0') AS image_id,
         |         (2 + (t.range % 3)) AS nx,
         |         (2 + ((t.range // 3) % 3)) AS ny,
         |         (-20.0 + (t.range * 7919 % 3900) / 100.0) AS fx0,
         |         (30.0 + (t.range * 104729 % 2900) / 100.0) AS fy0,
         |         (0.1 + (t.range * 13 % 90) / 100.0) AS wdeg,
         |         (0.1 + (t.range * 29 % 90) / 100.0) AS hdeg
         |  FROM range(0, 240) t),
         |tiles AS (
         |  SELECT image_id, CAST(tx.range AS INT) AS tile_ix, CAST(ty.range AS INT) AS tile_iy,
         |         (fx0 + (tx.range + 0.5) * (wdeg / nx)) AS cx,
         |         ((fy0 + hdeg) - (ty.range + 0.5) * (hdeg / ny)) AS cy
         |  FROM imgs
         |  JOIN range(0, 4) tx ON tx.range < nx
         |  JOIN range(0, 4) ty ON ty.range < ny),
         |ij AS (
         |  SELECT image_id, tile_ix, tile_iy,
         |         ${gridIx("cx", -180.0, 360.0, 12)} AS ix,
         |         ${gridIx("cy", -90.0, 180.0, 12)} AS iy
         |  FROM tiles)
         |SELECT image_id, tile_ix, tile_iy, ${cellId("ix", "iy", 12)} AS cell_id
         |FROM ij ORDER BY image_id, tile_ix, tile_iy""".stripMargin,

    "q_events_window" ->
      """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS bucket,
        |       event_type,
        |       count(*) AS n,
        |       sum(CAST(value AS DECIMAL(18,4))) AS sum_value
        |FROM events
        |GROUP BY bucket, event_type
        |ORDER BY bucket, event_type""".stripMargin)
}
