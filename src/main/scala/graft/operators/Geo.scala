package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial search — the Solr 5.2 spatial surface (LatLonType `geofilt` /
  * `bbox` filters, `geodist()` sort, `facet.heatmap` grid faceting)
  * re-expressed as Spark Column algebra.
  *
  * Reference: solr/core/src/java/org/apache/solr/search/SpatialFilterQParserPlugin.java
  * (geofilt/bbox), solr/core/src/java/org/apache/solr/search/function/distance/
  * HaversineConstFunction.java (geodist), solr/core/src/java/org/apache/solr/
  * handler/component/SpatialHeatmapFacets.java (facet.heatmap over the
  * PrefixTree grid), lucene/spatial/src/java/org/apache/lucene/spatial/prefix/
  * (RPT: grid approximation then exact verify).
  *
  * Design for scale: every predicate here is a deterministic scalar
  * expression over two double columns — whole-stage-codegen'd, no UDFs.
  * `geofilt` is two-phase like the reference's recursive-prefix-tree
  * strategy: a *sargable* bounding-box range predicate (pushed to the
  * parquet scan, prunes row groups / partitions by lat/lon min-max stats)
  * followed by the exact haversine test on the survivors. A 100 TB corpus
  * partitioned or sorted by a grid cell key therefore reads only the
  * cells intersecting the query circle.
  */
object Geo {

  /** Mean earth radius in km, the same constant Solr's geofilt uses
    * (org.apache.lucene.util.SloppyMath / DistanceUtils.EARTH_MEAN_RADIUS_KM). */
  final val EarthRadiusKm = 6371.0087714

  /** Great-circle distance in km between (lat1,lon1) and (lat2,lon2),
    * all in degrees — haversine formula as pure Column algebra
    * (HaversineConstFunction analog; codegen-friendly, no UDF). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2d
    val dLon = radians(lon2 - lon1) / 2d
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    lit(2d * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Degrees of latitude per km (and of longitude per km at the equator). */
  private val DegPerKm = 360.0 / (2.0 * math.Pi * EarthRadiusKm)

  /** `{!bbox}` — pure range filter on the point columns. Sargable: Spark
    * pushes both conjuncts into the parquet scan. */
  def bboxFilter(df: DataFrame, latCol: String, lonCol: String,
                 latMin: Double, latMax: Double,
                 lonMin: Double, lonMax: Double): DataFrame =
    df.filter(col(latCol) >= latMin && col(latCol) <= latMax &&
      col(lonCol) >= lonMin && col(lonCol) <= lonMax)

  /** A convex test polygon over Europe, CCW in (lon, lat) — shared by the
    * geo_polygon query and its SQL oracle so the edge constants cannot
    * drift between the two. */
  val EuropePoly: Seq[(Double, Double)] =
    Seq((-10.0, 35.0), (30.0, 35.0), (40.0, 55.0), (10.0, 62.0), (-12.0, 50.0))

  /** Convex-polygon filter (the polygon shapes lucene-spatial accepts via
    * Spatial4j/JTS, planar approximation): point-in-convex-polygon as the
    * conjunction of per-edge half-plane tests — cross((v2−v1), (p−v1)) ≥ 0
    * for every CCW edge. Pure sargable arithmetic predicates, fully
    * codegen'd, no UDF, no shuffle. */
  def convexPolygonFilter(df: DataFrame, latCol: String, lonCol: String,
                          verts: Seq[(Double, Double)]): DataFrame = {
    require(verts.length >= 3, "polygon needs >= 3 vertices")
    val px = col(lonCol)
    val py = col(latCol)
    val pred = verts.indices.map { i =>
      val (x1, y1) = verts(i)
      val (x2, y2) = verts((i + 1) % verts.length)
      (lit(x2 - x1) * (py - lit(y1)) - lit(y2 - y1) * (px - lit(x1))) >= 0d
    }.reduce(_ && _)
    df.filter(pred)
  }

  /** `{!geofilt sfield pt d}` — docs within `radiusKm` of (clat, clon).
    * Two-phase: bounding-box pre-filter (grid approximation, pushed down)
    * then exact haversine verify — the RPT Intersects shape. */
  def geofilt(df: DataFrame, latCol: String, lonCol: String,
              clat: Double, clon: Double, radiusKm: Double): DataFrame = {
    val dLat = radiusKm * DegPerKm
    val latLo = math.max(-90.0, clat - dLat)
    val latHi = math.min(90.0, clat + dLat)
    // Longitude width grows with latitude; at the circle's extreme
    // latitudes cos() is smallest, so size the box there (with slack).
    val maxAbsLat = math.min(89.9, math.max(math.abs(latLo), math.abs(latHi)))
    val dLon = dLat / math.cos(math.toRadians(maxAbsLat))
    val lonLo = clon - dLon
    val lonHi = clon + dLon
    val boxed =
      if (dLon >= 180.0) df.filter(col(latCol) >= latLo && col(latCol) <= latHi)
      else if (lonLo < -180.0 || lonHi > 180.0) {
        // Antimeridian wrap: the box crosses ±180, so the longitude
        // predicate is the UNION of two ranges (lon >= loW OR lon <= hiW)
        // — without this, docs on the far side of the dateline are pruned
        // before the exact haversine verify (haversine itself is
        // wrap-safe: sin((360−x)/2) = sin(x/2)). Both bounds can't wrap
        // at once since dLon < 180.
        val loW = if (lonLo < -180.0) lonLo + 360.0 else lonLo
        val hiW = if (lonHi > 180.0) lonHi - 360.0 else lonHi
        df.filter(col(latCol) >= latLo && col(latCol) <= latHi &&
          (col(lonCol) >= loW || col(lonCol) <= hiW))
      }
      else bboxFilter(df, latCol, lonCol, latLo, latHi, lonLo, lonHi)
    boxed.filter(
      haversineKm(col(latCol), col(lonCol), lit(clat), lit(clon)) <= radiusKm)
  }

  /** `sort=geodist() asc` + rows=k — k nearest docs to (clat, clon).
    * orderBy(...).limit(k) plans as TakeOrderedAndProject: per-partition
    * heaps + driver merge, no full sort, no shuffle of the corpus. */
  def nearest(df: DataFrame, latCol: String, lonCol: String,
              clat: Double, clon: Double, k: Int,
              tieBreak: String): DataFrame =
    df.withColumn("dist_km",
        haversineKm(col(latCol), col(lonCol), lit(clat), lit(clon)))
      .orderBy(col("dist_km").asc, col(tieBreak).asc)
      .limit(k)

  /** Flat grid cell id at `level` — the PrefixTree-cell analog used by
    * heatmaps and as a co-location / partitioning key at scale: docs in
    * the same cell land in the same partition, so a geofilt touches only
    * the cells its bbox intersects. 4^level cells over the globe. */
  def gridCell(latCol: Column, lonCol: Column, level: Int): Column = {
    val n = 1 << level
    val x = least(lit(n - 1), floor((lonCol + 180.0) / 360.0 * n)).cast("int")
    val y = least(lit(n - 1), floor((latCol + 90.0) / 180.0 * n)).cast("int")
    concat(x.cast("string"), lit("_"), y.cast("string"))
  }

  /** `facet.heatmap` — counts per grid cell over a bounding box
    * (SpatialHeatmapFacets analog). One groupBy over the boxed rows;
    * cells are integer (row, col) buckets of size (latMax-latMin)/rows ×
    * (lonMax-lonMin)/cols. */
  def heatmap(df: DataFrame, latCol: String, lonCol: String,
              latMin: Double, latMax: Double, lonMin: Double, lonMax: Double,
              gridRows: Int, gridCols: Int): DataFrame = {
    val boxed = bboxFilter(df, latCol, lonCol, latMin, latMax, lonMin, lonMax)
    val r = least(lit(gridRows - 1),
      floor((col(latCol) - latMin) / ((latMax - latMin) / gridRows))).cast("long")
    val c = least(lit(gridCols - 1),
      floor((col(lonCol) - lonMin) / ((lonMax - lonMin) / gridCols))).cast("long")
    boxed.groupBy(r.as("cell_row"), c.as("cell_col"))
      .agg(count(lit(1)).as("cnt"))
  }
}
