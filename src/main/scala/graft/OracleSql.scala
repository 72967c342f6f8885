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

  /** Positional codepoint packing of a token (= TextOps.tokenInt; each
    * codepoint reduced mod 131 before the positional multiply so non-ASCII
    * codepoints cannot overflow BIGINT in either engine).
    */
  private def tokenInt(c: String): String =
    (0 until 8).map { k =>
      s"(CAST(ascii(substr($c, ${k + 1}, 1)) AS BIGINT) % 131) * ${math.pow(131.0, k).toLong}"
    }.mkString(" + ")

  /** Token stream with ordinal (constant-bound range + filter — DuckDB's
    * range() can't be laterally correlated). The 1..511 bound IS the
    * operator contract (TextOps.MaxTokens): both engines consider exactly
    * the first 511 tokens of a document.
    */
  private val toksCte =
    """toks AS (
      |  SELECT doc_id, lang, CAST(t.range AS INT) AS pos,
      |         list_extract(string_split(text, ' '), CAST(t.range AS INT)) AS tok
      |  FROM documents, range(1, 512) t
      |  WHERE t.range <= len(string_split(text, ' ')))""".stripMargin

  /** Distinct word-3-gram shingles per doc (= TextOps.shingles3). */
  private val shinglesCte =
    s"""$toksCte,
       |shw AS (
       |  SELECT doc_id, lang, tok,
       |         lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t2,
       |         lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t3
       |  FROM toks),
       |sh AS (
       |  SELECT DISTINCT doc_id, lang, tok || ' ' || t2 || ' ' || t3 AS shingle
       |  FROM shw WHERE t3 IS NOT NULL)""".stripMargin

  /** Minhash signature + LSH band candidates (= Dedup's 16-hash, 4-row-
    * band derivation, uncollapsed direct form) — shared by the dedup
    * closure ctes and the estimate oracle. Exposes `sig(doc_id, j, minh)`
    * and `cand(doc_a, doc_b)`.
    */
  private lazy val minhashCandCte =
    s"""$shinglesCte,
       |sints AS (
       |  SELECT DISTINCT doc_id,
       |    (((${tokenInt("list_extract(string_split(shingle, ' '), 1)")}) % 1000000007 * 31
       |      + (${tokenInt("list_extract(string_split(shingle, ' '), 2)")}) % 1000000007) % 1000000007 * 31
       |      + (${tokenInt("list_extract(string_split(shingle, ' '), 3)")}) % 1000000007) % 1000000007 AS s
       |  FROM sh),
       |params AS (
       |  SELECT CAST(h.range AS INT) AS j,
       |         (h.range * 2654435761 + 1) % 1000000007 AS a,
       |         (h.range * 40503 + 7) % 1000000007 AS b
       |  FROM range(0, 16) h),
       |sig AS (
       |  SELECT doc_id, j, min((a * s + b) % 1000000007) AS minh
       |  FROM sints, params GROUP BY doc_id, j),
       |banded AS (
       |  SELECT doc_id, j // 4 AS band,
       |         sum(minh * (CASE j % 4 WHEN 1 THEN 31 WHEN 2 THEN 961 WHEN 3 THEN 29791 ELSE 1 END)) AS band_key
       |  FROM sig GROUP BY doc_id, band),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM banded x JOIN banded y
       |    ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id)""".stripMargin

  /** Minhash-LSH pairs closed into components by recursive-CTE label
    * propagation (= Dedup.minhashLshPairs + Components.connectedComponents
    * at 16 hashes / 4-row bands / Jaccard >= 1/2) — the shared closure
    * behind q_dedup_clusters and q_dedup_corpus. Callers prepend
    * `WITH RECURSIVE ` and use `cc(rid, component)`.
    */
  private lazy val dedupCcCte =
    s"""$minhashCandCte,
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS inter
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.doc_a
       |  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT doc_a, doc_b
       |  FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
       |  WHERE inter * 2 >= (sa.n + sb.n - inter) * 1),
       |ue AS (SELECT doc_a AS u, doc_b AS v FROM pairs
       |       UNION SELECT doc_b, doc_a FROM pairs),
       |reach(rid, r) AS (
       |  SELECT u, u FROM ue
       |  UNION
       |  SELECT e.v, x.r FROM reach x JOIN ue e ON e.u = x.rid),
       |cc AS (SELECT rid, min(r) AS component FROM reach GROUP BY rid)""".stripMargin

  /** Quantized embedding components (= Similarity.quantized); i is
    * 0-based to match posexplode.
    */
  private val quantCte =
    """qv AS (
      |  SELECT vec_id, CAST(t.range AS INT) AS i,
      |         CAST(round(CAST(embedding[CAST(t.range AS INT) + 1] AS DOUBLE) * 1000.0) AS BIGINT) AS q
      |  FROM embeddings, range(0, 64) t)""".stripMargin

  /** Sign-LSH bucket per vector (= Similarity.lshBuckets with 8 planes
    * over 64 dims) — shared by q_embed_ann, q_embed_ann_mp, and
    * q_embed_neardup so the plane-weight closed form lives in ONE place.
    */
  private val lshCte =
    """wts AS (
      |  SELECT CAST(j.range AS INT) AS j, CAST(i.range AS INT) AS i,
      |         ((j.range * 64 + i.range) * 2654435761 % 2001) - 1000 AS w
      |  FROM range(0, 8) j, range(0, 64) i),
      |proj AS (
      |  SELECT qv.vec_id, wts.j, sum(qv.q * wts.w) AS proj
      |  FROM qv JOIN wts ON qv.i = wts.i
      |  GROUP BY 1, 2),
      |bk AS (
      |  SELECT vec_id,
      |         sum(CASE WHEN proj > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS bucket
      |  FROM proj GROUP BY vec_id)""".stripMargin

  private val rectCte =
    """rects AS (
      |  SELECT 'r' || p_partkey AS poly_id,
      |         ((p_partkey % 360) / 10.0 - 18.0) AS cx,
      |         ((p_partkey * 7 % 180) / 10.0 - 9.0) AS cy,
      |         ((p_size % 10 + 1) / 10.0 + 0.05) AS hw,
      |         ((p_size * 3 % 10 + 1) / 10.0 + 0.05) AS hh
      |  FROM part)""".stripMargin

  /** Shared by q_pip_join and q_salted_join (salting must not change the
    * join's truth).
    */
  private val pipJoinOracle: String =
    s"""WITH pts AS (
       |  SELECT o_orderkey AS point_id,
       |         ((o_orderkey % 360) / 10.0 - 18.0) AS x,
       |         ((o_custkey % 180) / 10.0 - 9.0) AS y
       |  FROM orders),
       |$rectCte
       |SELECT point_id, poly_id
       |FROM pts, rects
       |WHERE x > cx - hw AND x < cx + hw AND y > cy - hh AND y < cy + hh
       |ORDER BY point_id, poly_id""".stripMargin

  /** Shared by q_events_window (batch) and q_stream_window (Structured
    * Streaming over the same file; epoch-aligned tumbling windows).
    */
  private val eventsWindowOracle: String =
    """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS bucket,
      |       event_type,
      |       count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS sum_value_e4
      |FROM events
      |GROUP BY bucket, event_type
      |ORDER BY bucket, event_type""".stripMargin

  private val knnJoinOracle: String =
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
       |ORDER BY point_id, rank""".stripMargin

  // radius join: brute-force theta join over the same synthetic tables
  // as the kNN oracle; d2 <= 4.0 (radius 2.0) mirrors the Spark
  // expression shape exactly (products + sums, no sqrt on the compare)
  private val radiusJoinOracle: String =
    s"""WITH pts AS (
       |  SELECT c_custkey AS point_id,
       |         ((c_custkey % 360) / 10.0 - 18.0) AS x,
       |         ((c_custkey * 7 % 180) / 10.0 - 9.0) AS y
       |  FROM customer),
       |lab AS (
       |  SELECT 's' || s_suppkey AS poly_id,
       |         ((s_suppkey * 13 % 360) / 10.0 - 18.0) AS lx,
       |         ((s_suppkey * 29 % 180) / 10.0 - 9.0) AS ly
       |  FROM supplier)
       |SELECT point_id, poly_id
       |FROM pts, lab
       |WHERE (x - lx) * (x - lx) + (y - ly) * (y - ly) <= 4.0
       |ORDER BY point_id, poly_id""".stripMargin

  val all: Map[String, String] = Map(

    "q_radius_join" -> radiusJoinOracle,
    "q_radius_join_part" -> radiusJoinOracle,

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

    "q_pip_join" -> pipJoinOracle,
    "q_salted_join" -> pipJoinOracle,

    "q_knn_join" -> knnJoinOracle,
    "q_knn_join_part" -> knnJoinOracle,
    "q_knn_adaptive" -> knnJoinOracle,

    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,3))) * 1000 AS BIGINT) AS sum_qty_milli,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,3))) * 1000 AS BIGINT) AS sum_base_milli,
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
        |       CAST(CAST(o_totalprice AS DECIMAL(18,3)) * 1000 AS BIGINT) AS price_milli
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

    "q_dedup_exact" ->
      """SELECT min(doc_id) AS rep_id, count(*) AS n
        |FROM documents GROUP BY text ORDER BY rep_id""".stripMargin,

    "q_dedup_ngram" ->
      s"""WITH $shinglesCte,
         |rare AS (
         |  SELECT lang, shingle FROM sh
         |  GROUP BY lang, shingle HAVING count(*) <= 50),
         |shr AS (SELECT sh.* FROM sh JOIN rare USING (lang, shingle)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM shr a JOIN shr b
         |    ON a.lang = b.lang AND a.shingle = b.shingle AND a.doc_id < b.doc_id),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT c.doc_a, c.doc_b, count(*) AS inter
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.doc_a
         |  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, inter, (sa.n + sb.n - inter) AS uni
         |FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |WHERE inter * 2 >= (sa.n + sb.n - inter) * 1
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q_dedup_minhash" ->
      s"""WITH $shinglesCte,
         |sints AS (
         |  SELECT DISTINCT doc_id,
         |    (((${tokenInt("list_extract(string_split(shingle, ' '), 1)")}) % 1000000007 * 31
         |      + (${tokenInt("list_extract(string_split(shingle, ' '), 2)")}) % 1000000007) % 1000000007 * 31
         |      + (${tokenInt("list_extract(string_split(shingle, ' '), 3)")}) % 1000000007) % 1000000007 AS s
         |  FROM sh),
         |params AS (
         |  SELECT CAST(h.range AS INT) AS j,
         |         (h.range * 2654435761 + 1) % 1000000007 AS a,
         |         (h.range * 40503 + 7) % 1000000007 AS b
         |  FROM range(0, 16) h),
         |sig AS (
         |  SELECT doc_id, j, min((a * s + b) % 1000000007) AS minh
         |  FROM sints, params GROUP BY doc_id, j),
         |banded AS (
         |  SELECT doc_id, j // 4 AS band,
         |         sum(minh * (CASE j % 4 WHEN 1 THEN 31 WHEN 2 THEN 961 WHEN 3 THEN 29791 ELSE 1 END)) AS band_key
         |  FROM sig GROUP BY doc_id, band),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM banded x JOIN banded y
         |    ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT c.doc_a, c.doc_b, count(*) AS inter
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.doc_a
         |  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, inter, (sa.n + sb.n - inter) AS uni
         |FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |WHERE inter * 2 >= (sa.n + sb.n - inter) * 1
         |ORDER BY doc_a, doc_b""".stripMargin,

    // streaming exact-dedup: one row per distinct text, projected to
    // key-derived columns (same fingerprint expression as q_fingerprint,
    // grouped by the text itself)
    "q_stream_dedup" ->
      """WITH dt AS (SELECT DISTINCT text FROM documents)
        |SELECT CAST(sum(CAST(ascii(substr(text, CAST(k.range AS INT), 1)) AS BIGINT)
        |         * ((k.range * 2654435761) % 65536)) % 1000000007 AS BIGINT) AS fp,
        |       CAST(length(text) AS BIGINT) AS n_chars
        |FROM dt, range(1, 65) k
        |GROUP BY text
        |ORDER BY fp, n_chars""".stripMargin,

    // bounded-state dedup truth: every distinct text emits once (run 1);
    // the distinct %3 texts emit ONCE MORE (run 3 arrives after their
    // state expired). occ distinguishes the two emissions of one text so
    // GROUP BY yields two identical output rows, mirroring the stream.
    "q_stream_dedup_wm" ->
      """WITH dt AS (SELECT DISTINCT text FROM documents),
        |re AS (SELECT DISTINCT text FROM documents WHERE doc_id % 3 = 0),
        |em AS (SELECT text, 0 AS occ FROM dt UNION ALL SELECT text, 1 FROM re)
        |SELECT CAST(sum(CAST(ascii(substr(text, CAST(k.range AS INT), 1)) AS BIGINT)
        |         * ((k.range * 2654435761) % 65536)) % 1000000007 AS BIGINT) AS fp,
        |       CAST(length(text) AS BIGINT) AS n_chars
        |FROM em, range(1, 65) k
        |GROUP BY text, occ
        |ORDER BY fp, n_chars""".stripMargin,

    // decontamination: sh carries every document's distinct shingles;
    // split by source via a join back to documents
    "q_contamination" ->
      s"""WITH $shinglesCte,
         |shs AS (
         |  SELECT s.doc_id, s.shingle, d.source
         |  FROM sh s JOIN documents d USING (doc_id)),
         |ev AS (SELECT doc_id, shingle FROM shs WHERE source = 'src0'),
         |tr AS (SELECT DISTINCT shingle FROM shs WHERE source <> 'src0'),
         |tot AS (SELECT doc_id, count(*) AS total FROM ev GROUP BY doc_id),
         |mt AS (SELECT e.doc_id, count(*) AS matched
         |       FROM ev e JOIN tr USING (shingle) GROUP BY e.doc_id)
         |SELECT tot.doc_id, coalesce(mt.matched, 0) AS matched, tot.total
         |FROM tot LEFT JOIN mt USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // the same minhash pair derivation, closed into clusters by a
    // recursive-CTE label propagation; documents in no pair keep their
    // own id (LEFT JOIN + coalesce)
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $dedupCcCte
         |SELECT d.doc_id AS id, coalesce(cc.component, d.doc_id) AS component
         |FROM documents d LEFT JOIN cc ON cc.rid = d.doc_id
         |ORDER BY id""".stripMargin,

    // signature-only Jaccard estimate (est = matching minhash components
    // of 16): the direct uncollapsed formulation — the engine's collapse
    // + re-expansion is estimate-invariant (identical texts => identical
    // signatures), same argument as q_dedup_minhash
    "q_dedup_minhash_est" ->
      s"""WITH $minhashCandCte,
         |est AS (
         |  SELECT c.doc_a, c.doc_b,
         |         sum(CASE WHEN a.minh = b.minh THEN 1 ELSE 0 END) AS est
         |  FROM cand c
         |  JOIN sig a ON a.doc_id = c.doc_a
         |  JOIN sig b ON b.doc_id = c.doc_b AND b.j = a.j
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, CAST(est AS BIGINT) AS est
         |FROM est
         |WHERE est * 2 >= 16 * 1
         |ORDER BY doc_a, doc_b""".stripMargin,

    // cluster-representative selection over the same closure: longest
    // text wins, lowest doc_id breaks ties (window formulation here; the
    // engine uses the equivalent map-side-combinable max(struct) argmax)
    "q_dedup_corpus" ->
      s"""WITH RECURSIVE $dedupCcCte,
         |asg AS (
         |  SELECT d.doc_id, coalesce(cc.component, d.doc_id) AS component, d.n_chars
         |  FROM documents d LEFT JOIN cc ON cc.rid = d.doc_id),
         |sel AS (
         |  SELECT component, doc_id, n_chars,
         |         row_number() OVER (PARTITION BY component
         |                            ORDER BY n_chars DESC, doc_id) AS rk,
         |         count(*) OVER (PARTITION BY component) AS n_members
         |  FROM asg)
         |SELECT component, doc_id, n_chars, CAST(n_members AS BIGINT) AS n_members
         |FROM sel WHERE rk = 1
         |ORDER BY component""".stripMargin,

    "q_simhash" -> {
      // 64-bit: bits 0..31 from hlo, 32..63 from hhi (= Dedup.simhash).
      // The sign bit's weight is written as (-9223372036854775807 - 1):
      // the bare literal would parse as negate(2^63) and promote to
      // HUGEINT in DuckDB. Negative term added LAST so partials stay in
      // BIGINT range under overflow checking.
      val sums = (0 until 64).map { b =>
        val h = if (b < 32) s"(hlo >> $b)" else s"(hhi >> ${b - 32})"
        s"sum(($h % 2) * 2 - 1) AS s$b"
      }.mkString(", ")
      val pack = (0 until 63).map(b =>
        s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ") +
        " + (CASE WHEN s63 > 0 THEN (-9223372036854775807 - 1) ELSE 0 END)"
      s"""WITH $toksCte,
         |th AS (
         |  SELECT doc_id,
         |         ((${tokenInt("tok")}) % 1000000007) * 48271 % 4294967296 AS hlo,
         |         ((${tokenInt("tok")}) % 998244353) * 69621 % 4294967296 AS hhi
         |  FROM toks),
         |bits AS (
         |  SELECT doc_id, $sums
         |  FROM th GROUP BY doc_id)
         |SELECT doc_id, $pack AS simhash
         |FROM bits ORDER BY doc_id""".stripMargin
    },

    "q_text_quality" ->
      s"""WITH $toksCte,
         |tk AS (
         |  SELECT doc_id, count(*) AS n_tokens,
         |         CAST(sum(CAST(ceil(length(tok) / 4.0) AS BIGINT)) AS BIGINT) AS n_subwords,
         |         CAST(sum(CASE WHEN tok IN ('the', 'a', 'of', 'and') THEN 1 ELSE 0 END) AS BIGINT) AS stop_hits
         |  FROM toks GROUP BY doc_id)
         |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
         |       tk.n_tokens, tk.n_subwords, tk.stop_hits
         |FROM documents d JOIN tk ON d.doc_id = tk.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // Gopher-style repetition signals: non-distinct 3-gram stream via
    // lead windows over the same toks contract (identical multiset to
    // the Spark side's array construction); integer division for the
    // fixed-point milli ratios; < 3-token docs excluded in both engines
    "q_repetition" ->
      s"""WITH $toksCte,
         |grw AS (
         |  SELECT doc_id,
         |         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS gram,
         |         lead(tok, 2) OVER w AS t3
         |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
         |g AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |         CAST(count(DISTINCT gram) AS BIGINT) AS n_gram_distinct
         |  FROM grw WHERE t3 IS NOT NULL GROUP BY doc_id),
         |tc AS (
         |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt
         |  FROM toks GROUP BY doc_id, tok),
         |top AS (
         |  SELECT doc_id, tok AS top_tok, cnt AS top_tok_cnt FROM (
         |    SELECT doc_id, tok, cnt,
         |           row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, tok) AS rn
         |    FROM tc) WHERE rn = 1),
         |tot AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
         |  FROM toks GROUP BY doc_id)
         |SELECT g.doc_id, tot.n_tokens, top.top_tok, top.top_tok_cnt,
         |       CAST((top.top_tok_cnt * 1000) // tot.n_tokens AS BIGINT) AS top_tok_milli,
         |       g.n_grams, g.n_gram_distinct,
         |       CAST(((g.n_grams - g.n_gram_distinct) * 1000) // g.n_grams AS BIGINT) AS dup_gram_milli
         |FROM g
         |JOIN top ON g.doc_id = top.doc_id
         |JOIN tot ON g.doc_id = tot.doc_id
         |ORDER BY g.doc_id""".stripMargin,

    "q_lang_id" ->
      s"""WITH $toksCte,
         |sc AS (
         |  SELECT doc_id,
         |    CAST(sum(CASE WHEN tok IN ('der','die','das','und','ist') THEN 1 ELSE 0 END) AS BIGINT) AS score_de,
         |    CAST(sum(CASE WHEN tok IN ('the','a','of','and','is') THEN 1 ELSE 0 END) AS BIGINT) AS score_en,
         |    CAST(sum(CASE WHEN tok IN ('el','la','de','y','es') THEN 1 ELSE 0 END) AS BIGINT) AS score_es,
         |    CAST(sum(CASE WHEN tok IN ('le','la','de','et','est') THEN 1 ELSE 0 END) AS BIGINT) AS score_fr
         |  FROM toks GROUP BY doc_id)
         |SELECT doc_id,
         |  CASE WHEN score_de = greatest(score_de, score_en, score_es, score_fr)
         |            AND greatest(score_de, score_en, score_es, score_fr) > 0 THEN 'de'
         |       WHEN score_en = greatest(score_de, score_en, score_es, score_fr)
         |            AND greatest(score_de, score_en, score_es, score_fr) > 0 THEN 'en'
         |       WHEN score_es = greatest(score_de, score_en, score_es, score_fr)
         |            AND greatest(score_de, score_en, score_es, score_fr) > 0 THEN 'es'
         |       WHEN score_fr = greatest(score_de, score_en, score_es, score_fr)
         |            AND greatest(score_de, score_en, score_es, score_fr) > 0 THEN 'fr'
         |       ELSE 'und' END AS predicted,
         |  score_de, score_en, score_es, score_fr
         |FROM sc ORDER BY doc_id""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id,
        |       CAST(sum(CAST(ascii(substr(text, CAST(k.range AS INT), 1)) AS BIGINT)
        |           * ((k.range * 2654435761) % 65536)) % 1000000007 AS BIGINT) AS fp
        |FROM documents, range(1, 65) k
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // deterministic splitter: (id mod 1e6) * 2654435761 mod 1e6 — the
    // constant is coprime to 1e6, so the map is a bijection on [0, 1e6)
    // and `< ppm` keeps the exact fraction; pure integer arithmetic
    // mirrors Spark bit-exactly
    "q_sample_stratified" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE ((doc_id % 1000000) * 2654435761) % 1000000 <
        |      CASE lang WHEN 'en' THEN 250000 WHEN 'zh' THEN 600000
        |                WHEN 'de' THEN 100000 ELSE 50000 END
        |ORDER BY doc_id""".stripMargin,

    "q_sample_quota" ->
      """SELECT doc_id, lang, rank FROM (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY ((doc_id % 1000000) * 2654435761) % 1000000, doc_id) AS rank
        |  FROM documents) t
        |WHERE rank <= 20 ORDER BY doc_id""".stripMargin,

    "q_embed_topk" ->
      s"""WITH $quantCte,
         |dots AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS vec_id, CAST(sum(a.q * b.q) AS BIGINT) AS dot
         |  FROM qv a JOIN qv b ON a.i = b.i AND a.vec_id < 10 AND a.vec_id <> b.vec_id
         |  GROUP BY 1, 2),
         |rk AS (
         |  SELECT query_id, vec_id, dot,
         |         row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rank
         |  FROM dots)
         |SELECT query_id, vec_id, dot, rank FROM rk WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    "q_embed_ann" ->
      s"""WITH $quantCte,
         |$lshCte,
         |cand AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS vec_id
         |  FROM bk a JOIN bk b ON a.bucket = b.bucket
         |    AND a.vec_id < 10 AND a.vec_id <> b.vec_id),
         |dots AS (
         |  SELECT c.query_id, c.vec_id, CAST(sum(qa.q * qb.q) AS BIGINT) AS dot
         |  FROM cand c
         |  JOIN qv qa ON qa.vec_id = c.query_id
         |  JOIN qv qb ON qb.vec_id = c.vec_id AND qb.i = qa.i
         |  GROUP BY 1, 2),
         |rk AS (
         |  SELECT query_id, vec_id, dot,
         |         row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rank
         |  FROM dots)
         |SELECT query_id, vec_id, dot, rank FROM rk WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    "q_embed_ann_mp" ->
      s"""WITH $quantCte,
         |$lshCte,
         |qp AS (
         |  SELECT bk.vec_id AS query_id,
         |         CASE WHEN p.range = -1 THEN bucket
         |              ELSE xor(bucket, (CAST(1 AS BIGINT) << CAST(p.range AS INT))) END AS bucket
         |  FROM bk, range(-1, 8) p WHERE bk.vec_id < 10),
         |cand AS (
         |  SELECT qp.query_id, b.vec_id
         |  FROM qp JOIN bk b ON qp.bucket = b.bucket AND qp.query_id <> b.vec_id),
         |dots AS (
         |  SELECT c.query_id, c.vec_id, CAST(sum(qa.q * qb.q) AS BIGINT) AS dot
         |  FROM cand c
         |  JOIN qv qa ON qa.vec_id = c.query_id
         |  JOIN qv qb ON qb.vec_id = c.vec_id AND qb.i = qa.i
         |  GROUP BY 1, 2),
         |rk AS (
         |  SELECT query_id, vec_id, dot,
         |         row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rank
         |  FROM dots)
         |SELECT query_id, vec_id, dot, rank FROM rk WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    // IVF-Flat ANN (= Similarity.annTopKIvf nLists=16 nProbe=2): the
    // codebook is the quantized vectors of vec_ids [0,16); every vector
    // joins its exact-integer-L2-nearest centroid's list (ties toward the
    // lower centroid id); queries probe their 2 nearest lists; exact
    // integer dot re-ranks candidates.
    "q_embed_ivf" ->
      s"""WITH $quantCte,
         |ctq AS (SELECT vec_id AS cid, i, q FROM qv WHERE vec_id < 16),
         |dst AS (
         |  SELECT v.vec_id, c.cid, sum((v.q - c.q) * (v.q - c.q)) AS d2
         |  FROM qv v JOIN ctq c ON v.i = c.i
         |  GROUP BY 1, 2),
         |asg AS (
         |  SELECT vec_id, cid,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rnk
         |  FROM dst),
         |dlist AS (SELECT vec_id, cid AS list FROM asg WHERE rnk = 1),
         |qlist AS (
         |  SELECT vec_id AS query_id, cid AS list
         |  FROM asg WHERE vec_id < 10 AND rnk <= 2),
         |cand AS (
         |  SELECT ql.query_id, d.vec_id
         |  FROM qlist ql JOIN dlist d ON ql.list = d.list AND ql.query_id <> d.vec_id),
         |dots AS (
         |  SELECT c.query_id, c.vec_id, CAST(sum(qa.q * qb.q) AS BIGINT) AS dot
         |  FROM cand c
         |  JOIN qv qa ON qa.vec_id = c.query_id
         |  JOIN qv qb ON qb.vec_id = c.vec_id AND qb.i = qa.i
         |  GROUP BY 1, 2),
         |rk AS (
         |  SELECT query_id, vec_id, dot,
         |         row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rank
         |  FROM dots)
         |SELECT query_id, vec_id, dot, rank FROM rk WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    // k-means-trained IVF: two unrolled Lloyd iterations (assign by
    // exact-integer L2 argmin with (d2, cid) tie-break = ivf_nearest;
    // centroid component = floor(mean), exact in a double at these
    // magnitudes; lists that lose every member keep their previous
    // centroid via the LEFT JOIN + coalesce), then the same probe /
    // candidate / re-rank tail as q_embed_ivf against the trained book
    "q_embed_ivf_kmeans" ->
      s"""WITH $quantCte,
         |c0 AS (SELECT vec_id AS cid, i, q FROM qv WHERE vec_id < 16),
         |dst1 AS (
         |  SELECT v.vec_id, c.cid, sum((v.q - c.q) * (v.q - c.q)) AS d2
         |  FROM qv v JOIN c0 c ON v.i = c.i GROUP BY 1, 2),
         |asg1 AS (
         |  SELECT vec_id, cid,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rnk
         |  FROM dst1),
         |l1 AS (SELECT vec_id, cid AS list FROM asg1 WHERE rnk = 1),
         |s1 AS (
         |  SELECT l.list AS cid, v.i,
         |         CAST(floor(sum(v.q) * 1.0 / count(*)) AS BIGINT) AS q
         |  FROM l1 l JOIN qv v USING (vec_id) GROUP BY 1, 2),
         |c1 AS (
         |  SELECT p.cid, p.i, coalesce(s.q, p.q) AS q
         |  FROM c0 p LEFT JOIN s1 s ON s.cid = p.cid AND s.i = p.i),
         |dst2 AS (
         |  SELECT v.vec_id, c.cid, sum((v.q - c.q) * (v.q - c.q)) AS d2
         |  FROM qv v JOIN c1 c ON v.i = c.i GROUP BY 1, 2),
         |asg2 AS (
         |  SELECT vec_id, cid,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rnk
         |  FROM dst2),
         |l2 AS (SELECT vec_id, cid AS list FROM asg2 WHERE rnk = 1),
         |s2 AS (
         |  SELECT l.list AS cid, v.i,
         |         CAST(floor(sum(v.q) * 1.0 / count(*)) AS BIGINT) AS q
         |  FROM l2 l JOIN qv v USING (vec_id) GROUP BY 1, 2),
         |c2 AS (
         |  SELECT p.cid, p.i, coalesce(s.q, p.q) AS q
         |  FROM c1 p LEFT JOIN s2 s ON s.cid = p.cid AND s.i = p.i),
         |dstf AS (
         |  SELECT v.vec_id, c.cid, sum((v.q - c.q) * (v.q - c.q)) AS d2
         |  FROM qv v JOIN c2 c ON v.i = c.i GROUP BY 1, 2),
         |asgf AS (
         |  SELECT vec_id, cid,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rnk
         |  FROM dstf),
         |dlist AS (SELECT vec_id, cid AS list FROM asgf WHERE rnk = 1),
         |qlist AS (
         |  SELECT vec_id AS query_id, cid AS list
         |  FROM asgf WHERE vec_id < 10 AND rnk <= 2),
         |cand AS (
         |  SELECT ql.query_id, d.vec_id
         |  FROM qlist ql JOIN dlist d ON ql.list = d.list AND ql.query_id <> d.vec_id),
         |dots AS (
         |  SELECT c.query_id, c.vec_id, CAST(sum(qa.q * qb.q) AS BIGINT) AS dot
         |  FROM cand c
         |  JOIN qv qa ON qa.vec_id = c.query_id
         |  JOIN qv qb ON qb.vec_id = c.vec_id AND qb.i = qa.i
         |  GROUP BY 1, 2),
         |rk AS (
         |  SELECT query_id, vec_id, dot,
         |         row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rank
         |  FROM dots)
         |SELECT query_id, vec_id, dot, rank FROM rk WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    "q_embed_neardup" ->
      s"""WITH $quantCte,
         |$lshCte,
         |meta AS (
         |  SELECT e.vec_id, e.label, bk.bucket
         |  FROM embeddings e JOIN bk ON e.vec_id = bk.vec_id),
         |okgrp AS (
         |  -- hot-band guard (= Similarity.nearDupPairs bucketMax=65536):
         |  -- an over-threshold (label, bucket) group generates no pairs
         |  SELECT label, bucket FROM meta GROUP BY 1, 2 HAVING count(*) <= 65536),
         |cand AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM meta a JOIN meta b
         |    ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  JOIN okgrp g ON g.label = a.label AND g.bucket = a.bucket),
         |n AS (SELECT vec_id, sum(q * q) AS n2 FROM qv GROUP BY 1),
         |dots AS (
         |  SELECT c.vec_a, c.vec_b, CAST(sum(qa.q * qb.q) AS BIGINT) AS dot
         |  FROM cand c
         |  JOIN qv qa ON qa.vec_id = c.vec_a
         |  JOIN qv qb ON qb.vec_id = c.vec_b AND qb.i = qa.i
         |  GROUP BY 1, 2)
         |SELECT vec_a, vec_b, dot
         |FROM dots JOIN n na ON vec_a = na.vec_id JOIN n nb ON vec_b = nb.vec_id
         |WHERE dot > 0 AND dot * dot * 10000 >= 900 * na.n2 * nb.n2
         |ORDER BY vec_a, vec_b""".stripMargin,

    "q_events_window" -> eventsWindowOracle,
    "q_stream_window" -> eventsWindowOracle,

    // Watermark truth (q_stream_late): batch B's base rows are all late
    // beyond the batch-A watermark (dropped), and batch B's sentinel
    // window never closes in append mode — so the emitted stream equals a
    // plain batch aggregate over exactly batch A (on-time 2/3 + sentinel
    // at max+20min). Same bucket/sum shapes as eventsWindowOracle.
    "q_stream_late" ->
      """WITH base AS (
        |  SELECT ts, event_type, value FROM events WHERE event_id % 3 <> 0
        |  UNION ALL
        |  SELECT (SELECT max(ts) FROM events) + INTERVAL 20 MINUTE AS ts,
        |         'sentinel' AS event_type, CAST(0.0 AS DOUBLE) AS value
        |)
        |SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS bucket,
        |       event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS sum_value_e4
        |FROM base
        |GROUP BY bucket, event_type
        |ORDER BY bucket, event_type""".stripMargin,

    // Cross-modal caption join (q_caption_join): the media table is
    // closed-form (media_id = med-%08d, caption = 'media caption i',
    // every 7th caption replaced by document (3i mod |documents|) text),
    // so DuckDB reconstructs it from range() and replays the same
    // caption = text left join.
    "q_caption_join" ->
      """WITH media AS (
        |  SELECT i AS mid,
        |         printf('med-%08d', i) AS media_id,
        |         CASE WHEN i % 7 = 0
        |              THEN (SELECT d.text FROM documents d
        |                    WHERE d.doc_id = (i * 3) % (SELECT count(*) FROM documents))
        |              ELSE 'media caption ' || CAST(i AS VARCHAR) END AS caption
        |  FROM range(0, 300) t(i)
        |)
        |SELECT m.media_id, coalesce(d.doc_id, -1) AS matched_doc
        |FROM media m LEFT JOIN documents d ON m.caption = d.text
        |ORDER BY media_id, matched_doc""".stripMargin,

    "q_geojson" -> {
      val sq = Seq( // gj-0: square with one hole
        (0, 0, "0.0", "0.0"), (0, 1, "4.0", "0.0"), (0, 2, "4.0", "4.0"),
        (0, 3, "0.0", "4.0"), (0, 4, "0.0", "0.0"),
        (1, 0, "1.5", "1.5"), (1, 1, "2.5", "1.5"), (1, 2, "2.5", "2.5"),
        (1, 3, "1.5", "2.5"), (1, 4, "1.5", "1.5"))
        .map { case (r, i, x, y) =>
          s"('gj-0', $r, $i, CAST('$x' AS DOUBLE), CAST('$y' AS DOUBLE))" }
      val tri = Seq( // gj-1: triangle, no holes
        (0, 0, "-10.5", "20.25"), (0, 1, "-8.0", "20.25"),
        (0, 2, "-8.0", "22.75"), (0, 3, "-10.5", "20.25"))
        .map { case (r, i, x, y) =>
          s"('gj-1', $r, $i, CAST('$x' AS DOUBLE), CAST('$y' AS DOUBLE))" }
      s"""SELECT * FROM (VALUES ${(sq ++ tri).mkString(", ")})
         |AS t(poly_id, ring, i, x, y)
         |ORDER BY poly_id, ring, i""".stripMargin
    },

    "q_rasterize" ->
      s"""WITH $rectCte,
         |b AS (
         |  SELECT poly_id, cx, cy, hw, hh,
         |         ${gridIx("(cx - hw)", -180.0, 360.0, 8)} AS ix0,
         |         ${gridIx("(cx + hw)", -180.0, 360.0, 8)} AS ix1,
         |         ${gridIx("(cy - hh)", -90.0, 180.0, 8)} AS iy0,
         |         ${gridIx("(cy + hh)", -90.0, 180.0, 8)} AS iy1
         |  FROM rects),
         |gx AS (
         |  SELECT poly_id, cx, cy, hw, hh, iy0, iy1, xs.range AS ix
         |  FROM b JOIN range(0, 256) xs ON xs.range BETWEEN ix0 AND ix1),
         |g AS (
         |  SELECT poly_id, cx, cy, hw, hh, ix, ys.range AS iy
         |  FROM gx JOIN range(0, 256) ys ON ys.range BETWEEN iy0 AND iy1),
         |cells AS (
         |  SELECT poly_id, cx, cy, hw, hh, ${cellId("ix", "iy", 8)} AS cell_id,
         |         (-180.0 + (ix / 256.0) * 360.0) AS rminx,
         |         (-90.0 + (iy / 256.0) * 180.0) AS rminy,
         |         ((-180.0 + ((ix + 1) / 256.0) * 360.0) - (-180.0 + (ix / 256.0) * 360.0)) AS rw,
         |         ((-90.0 + ((iy + 1) / 256.0) * 180.0) - (-90.0 + (iy / 256.0) * 180.0)) AS rh
         |  FROM g)
         |SELECT poly_id, cell_id,
         |       CAST(sum(CASE WHEN (rminx + ((si.range + 0.5) / 8) * rw) > (cx - hw)
         |                      AND (rminx + ((si.range + 0.5) / 8) * rw) < (cx + hw)
         |                      AND (rminy + ((sj.range + 0.5) / 8) * rh) > (cy - hh)
         |                      AND (rminy + ((sj.range + 0.5) / 8) * rh) < (cy + hh)
         |                THEN 1 ELSE 0 END) AS BIGINT) AS hits64
         |FROM cells, range(0, 8) si, range(0, 8) sj
         |GROUP BY poly_id, cell_id
         |ORDER BY poly_id, cell_id""".stripMargin,

    "q_scalar_fns" ->
      s"""WITH $rectCte,
         |ij AS (
         |  SELECT poly_id,
         |         ${gridIx("cx", -180.0, 360.0, 12)} AS ix12,
         |         ${gridIx("cy", -90.0, 180.0, 12)} AS iy12,
         |         ${gridIx("cx", -180.0, 360.0, 6)} AS ix6,
         |         ${gridIx("cy", -90.0, 180.0, 6)} AS iy6
         |  FROM rects),
         |c AS (SELECT poly_id, ${cellId("ix12", "iy12", 12)} AS cell12, ix6, iy6 FROM ij)
         |SELECT poly_id, TRUE AS inside, TRUE AS sd_pos, cell12,
         |       ((CAST(11 AS BIGINT) << 53) | ((cell12 & 9007199254740991) >> 2)) AS cell11,
         |       CAST((least(ix6 + 2, 63) - greatest(ix6 - 2, 0) + 1)
         |          * (least(iy6 + 2, 63) - greatest(iy6 - 2, 0) + 1) AS INT) AS kring_n,
         |       FALSE AS label_nan
         |FROM c ORDER BY poly_id""".stripMargin,

    "q_sink_metrics" ->
      """SELECT CAST(c_custkey % 16 AS INT) AS bucket, count(*) AS n_rows
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_resume" ->
      """SELECT CAST(c_custkey % 16 AS INT) AS bucket, count(*) AS n_rows
        |FROM customer WHERE c_custkey % 16 >= 8
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_multimodal" ->
      """WITH m AS (
        |  SELECT t.range AS id,
        |         'med-' || lpad(CAST(t.range AS VARCHAR), 8, '0') AS media_id,
        |         CASE WHEN t.range % 2 = 0 THEN 'audio' ELSE 'video' END AS kind,
        |         CASE WHEN t.range % 2 = 0 THEN 0
        |              ELSE CAST(25 * (1 + t.range % 10) AS INT) END AS n_frames,
        |         CASE WHEN t.range % 2 = 0 THEN 1000 + (t.range % 9000)
        |              ELSE (1 + t.range % 10) * 1000 END AS duration_ms
        |  FROM range(0, 500) t)
        |SELECT media_id, kind, n_frames, duration_ms,
        |       CASE WHEN kind = 'video' THEN CAST(ceil(n_frames / 7.0) AS BIGINT)
        |            ELSE CAST(0 AS BIGINT) END AS n_frames_sampled,
        |       CASE WHEN kind = 'audio' THEN CAST(8 AS BIGINT)
        |            ELSE CAST(0 AS BIGINT) END AS n_windows
        |FROM m ORDER BY media_id""".stripMargin,

    // mirrors q_phash_neardup's closed-form construction: per-id group g,
    // parity-coded base value (distance irrelevant to the oracle — only
    // XOR of the planted masks survives within a group, and cross-group
    // pairs are >= 16-6 bits apart, beyond t=3), planted 1/2/3-bit masks
    // at the same positions, pairs within a group at bit_count(xor) <= 3
    "q_phash_neardup" ->
      """WITH ids AS (SELECT t.range AS id FROM range(0, 240) t),
        |base AS (
        |  SELECT 'img-' || lpad(CAST(id AS VARCHAR), 8, '0') AS image_id,
        |         id % 60 AS g, CAST(0 AS BIGINT) AS mask
        |  FROM ids),
        |tp AS (
        |  SELECT id, id % 60 AS g,
        |         (id * 7) % 61 AS p1,
        |         ((id * 7) % 61 + 1 + id % 31) % 61 AS p2,
        |         (((id * 7) % 61 + 1 + id % 31) % 61 + 1 + (id * 3) % 29) % 61 AS p3
        |  FROM ids WHERE id % 4 <> 0),
        |twin AS (
        |  SELECT 'prt-' || lpad(CAST(id AS VARCHAR), 8, '0') AS image_id, g,
        |         (CAST(1 AS BIGINT) << CAST(p1 AS INT))
        |         | (CASE WHEN id % 4 >= 2 THEN (CAST(1 AS BIGINT) << CAST(p2 AS INT)) ELSE 0 END)
        |         | (CASE WHEN id % 4 >= 3 THEN (CAST(1 AS BIGINT) << CAST(p3 AS INT)) ELSE 0 END) AS mask
        |  FROM tp),
        |m AS (SELECT * FROM base UNION ALL SELECT * FROM twin)
        |SELECT a.image_id AS id_a, b.image_id AS id_b,
        |       CAST(bit_count(xor(a.mask, b.mask)) AS BIGINT) AS dist
        |FROM m a JOIN m b ON a.g = b.g AND a.image_id < b.image_id
        |WHERE bit_count(xor(a.mask, b.mask)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // same closed-form pair set, then connected components as a
    // recursive-CTE label propagation (set-semantics UNION reaches the
    // fixpoint; min reachable label per node = the component's min id)
    "q_cc_clusters" ->
      """WITH RECURSIVE ids AS (SELECT t.range AS id FROM range(0, 240) t),
        |base AS (
        |  SELECT 'img-' || lpad(CAST(id AS VARCHAR), 8, '0') AS image_id,
        |         id % 60 AS g, CAST(0 AS BIGINT) AS mask
        |  FROM ids),
        |tp AS (
        |  SELECT id, id % 60 AS g,
        |         (id * 7) % 61 AS p1,
        |         ((id * 7) % 61 + 1 + id % 31) % 61 AS p2,
        |         (((id * 7) % 61 + 1 + id % 31) % 61 + 1 + (id * 3) % 29) % 61 AS p3
        |  FROM ids WHERE id % 4 <> 0),
        |twin AS (
        |  SELECT 'prt-' || lpad(CAST(id AS VARCHAR), 8, '0') AS image_id, g,
        |         (CAST(1 AS BIGINT) << CAST(p1 AS INT))
        |         | (CASE WHEN id % 4 >= 2 THEN (CAST(1 AS BIGINT) << CAST(p2 AS INT)) ELSE 0 END)
        |         | (CASE WHEN id % 4 >= 3 THEN (CAST(1 AS BIGINT) << CAST(p3 AS INT)) ELSE 0 END) AS mask
        |  FROM tp),
        |m AS (SELECT * FROM base UNION ALL SELECT * FROM twin),
        |pairs AS (
        |  SELECT a.image_id AS id_a, b.image_id AS id_b
        |  FROM m a JOIN m b ON a.g = b.g AND a.image_id < b.image_id
        |  WHERE bit_count(xor(a.mask, b.mask)) <= 3),
        |ue AS (SELECT id_a AS u, id_b AS v FROM pairs
        |       UNION SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT u, u FROM ue
        |  UNION
        |  SELECT e.v, r.r FROM reach r JOIN ue e ON e.u = r.id)
        |SELECT id, min(r) AS component FROM reach GROUP BY id
        |ORDER BY id""".stripMargin,

    "q_phash_groups" ->
      """WITH imgs AS (
        |  SELECT t.range AS id,
        |         'img-' || lpad(CAST(t.range AS VARCHAR), 8, '0') AS image_id,
        |         CASE WHEN t.range % 17 = 16 AND t.range >= 9
        |              THEN t.range - 9 ELSE t.range END AS render_id
        |  FROM range(0, 240) t),
        |grp AS (
        |  SELECT render_id, min(image_id) AS rep_id, count(*) AS n,
        |         string_agg(image_id, ',' ORDER BY image_id) AS ids
        |  FROM imgs GROUP BY render_id)
        |SELECT rep_id, n, ids FROM grp WHERE n > 1 ORDER BY rep_id""".stripMargin)
}
