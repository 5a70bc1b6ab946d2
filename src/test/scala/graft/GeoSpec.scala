package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Geo

/** Spatial operators (Solr 5.2 geofilt/bbox/geodist/facet.heatmap
  * analogs): haversine against known city distances, geofilt two-phase ==
  * brute-force haversine filter, heatmap cell mass conservation, grid
  * cell clamping at the antimeridian/pole edge. */
class GeoSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  // (name, lat, lon)
  private val cities = Seq(
    ("paris", 48.8566, 2.3522), ("london", 51.5074, -0.1278),
    ("nyc", 40.7128, -74.0060), ("tokyo", 35.6762, 139.6503),
    ("sydney", -33.8688, 151.2093), ("anchorage", 61.2181, -149.9003),
    ("quito", -0.1807, -78.4678), ("reykjavik", 64.1466, -21.9426))

  private lazy val df = cities.toDF("name", "lat", "lon")

  private def havKm(lat1: Double, lon1: Double,
                    lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1) / 2
    val dLon = math.toRadians(lon2 - lon1) / 2
    val a = math.sin(dLat) * math.sin(dLat) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.sin(dLon) * math.sin(dLon)
    2 * Geo.EarthRadiusKm * math.asin(math.sqrt(a))
  }

  test("haversineKm matches known great-circle distances") {
    val got = df.filter(col("name") === "london")
      .select(Geo.haversineKm(col("lat"), col("lon"),
        lit(48.8566), lit(2.3522)).as("d"))
      .as[Double].head()
    // Paris-London great-circle is ~343.5 km
    assert(math.abs(got - 343.5) < 1.5, s"got $got")
    assert(math.abs(got - havKm(51.5074, -0.1278, 48.8566, 2.3522)) < 1e-9)
  }

  test("geofilt == brute-force haversine filter (bbox loses nothing)") {
    for (r <- Seq(500.0, 2000.0, 9000.0)) {
      val fast = Geo.geofilt(df, "lat", "lon", 48.8566, 2.3522, r)
        .select("name").as[String].collect().toSet
      val brute = cities
        .filter(c => havKm(c._2, c._3, 48.8566, 2.3522) <= r)
        .map(_._1).toSet
      assert(fast == brute, s"radius $r: $fast vs $brute")
    }
  }

  test("convex polygon filter == brute winding test, grid sweep") {
    // dense deterministic grid crossing all edges of the test polygon
    val pts = for (la <- -90 to 90 by 3; lo <- -180 to 180 by 7)
      yield (s"p${la}_$lo", la.toDouble + 0.5, lo.toDouble + 0.5)
    val verts = Geo.EuropePoly
    def inside(lat: Double, lon: Double): Boolean =
      verts.indices.forall { i =>
        val (x1, y1) = verts(i)
        val (x2, y2) = verts((i + 1) % verts.length)
        (x2 - x1) * (lat - y1) - (y2 - y1) * (lon - x1) >= 0
      }
    val got = Geo.convexPolygonFilter(
      pts.toDF("name", "lat", "lon"), "lat", "lon", verts)
      .select("name").as[String].collect().toSet
    val want = pts.filter(p => inside(p._2, p._3)).map(_._1).toSet
    assert(got == want && want.nonEmpty && want.size < pts.size)
  }

  test("nearest returns k closest in distance order") {
    val got = Geo.nearest(df, "lat", "lon", 48.8566, 2.3522, 3, "name")
      .select("name").as[String].collect().toSeq
    val want = cities.sortBy(c => (havKm(c._2, c._3, 48.8566, 2.3522), c._1))
      .take(3).map(_._1)
    assert(got == want)
  }

  test("heatmap conserves mass and buckets correctly") {
    val cells = Geo.heatmap(df, "lat", "lon", -90.0, 90.0, -180.0, 180.0, 4, 4)
    val total = cells.agg(sum("cnt")).as[Long].head()
    assert(total == cities.size)
    // paris (48.86, 2.35): row floor((48.86+90)/45)=3, col floor((2.35+180)/90)=2
    val parisCell = cells
      .filter(col("cell_row") === 3 && col("cell_col") === 2)
      .select("cnt").as[Long].head()
    assert(parisCell >= 1)
  }

  test("geofilt at the antimeridian: wrap-split bbox loses nothing") {
    val pts = Seq(
      ("fiji", -17.7134, 178.0650), ("westside", -16.5, -179.9),
      ("eastside", -16.5, 179.9), ("vanuatu", -17.7333, 168.3273),
      ("hawaii", 19.8968, -155.5828))
    val d = pts.toDF("name", "lat", "lon")
    // circle centers on BOTH sides of the dateline, radii that straddle it
    for ((clat, clon, r) <- Seq((-17.0, 179.95, 300.0), (-17.0, -179.95, 300.0),
        (-17.0, 178.0, 1500.0), (0.0, -180.0, 3000.0))) {
      val fast = Geo.geofilt(d, "lat", "lon", clat, clon, r)
        .select("name").as[String].collect().toSet
      val brute = pts.filter(p => havKm(p._2, p._3, clat, clon) <= r)
        .map(_._1).toSet
      assert(fast == brute, s"center ($clat,$clon) r=$r: $fast vs $brute")
      assert(brute.nonEmpty, s"degenerate case ($clat,$clon,$r)")
    }
  }

  test("gridCell clamps the closed upper edge") {
    val got = Seq((90.0, 180.0), (-90.0, -180.0), (0.0, 0.0))
      .toDF("lat", "lon")
      .select(Geo.gridCell(col("lat"), col("lon"), 2).as("c"))
      .as[String].collect().toSeq
    assert(got == Seq("3_3", "0_0", "2_2"))
  }
}
