package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** GeoOps: haversine sanity, and the band-grid joins' EXACTNESS — the
  * spherical band construction must reproduce the brute-force all-pairs
  * answer row-for-row at any cell size, including the designed hard
  * cases (date-line wrap, empty neighborhoods, polar bands collapsing
  * to a single all-longitude cell). */
class GeoSpec extends SparkSpec {

  private def brute(l: DataFrame, r: DataFrame): Seq[(Long, Long, Double)] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lid")).orderBy(col("km"), col("rid"))
    l.crossJoin(r)
      .withColumn("km", GeoOps.haversineKm(col("llat"), col("llon"), col("rlat"), col("rlon")))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("lid"), col("rid"), col("km"))
      .collect().toSeq.map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).sorted
  }

  private def grid(l: DataFrame, r: DataFrame, cellDeg: Double): Seq[(Long, Long, Double)] =
    GeoOps.nearest(l, "lid", "llat", "llon", r, "rid", "rlat", "rlon", cellDeg)
      .collect().toSeq.map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).sorted

  private def pts(rows: Seq[(Long, Double, Double)], p: String): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF(s"${p}id", s"${p}lat", s"${p}lon")
  }

  test("haversine: known city distance within 1 km") {
    val s = spark
    import s.implicits._
    val d = Seq((48.8566, 2.3522, 51.5074, -0.1278)).toDF("a", "b", "c", "d")
      .select(GeoOps.haversineKm(col("a"), col("b"), col("c"), col("d")))
      .collect()(0).getDouble(0)
    assert(math.abs(d - 343.5) < 1.0, s"Paris-London came out $d km")
  }

  test("grid nearest equals brute force on derived global coords, multiple cell sizes") {
    val l = pts((1L to 300L).map(i => (i, (i * 37 % 1700) / 10.0 - 85.0,
      (i * 91 % 3600) / 10.0 - 180.0)), "l")
    val r = pts((1L to 40L).map(i => (i, (i * 53 % 1700) / 10.0 - 85.0,
      (i * 131 % 3600) / 10.0 - 180.0)), "r")
    val exact = brute(l, r)
    for (cell <- Seq(5.0, 15.0, 45.0))
      assert(grid(l, r, cell) === exact, s"cellDeg=$cell diverged from brute force")
  }

  test("date-line wrap: neighbor across ±180 found by the grid path") {
    val l = pts(Seq((1L, 10.0, -179.5)), "l")
    val r = pts(Seq((1L, 10.0, 179.5), (2L, 10.0, 0.0)), "r")
    val out = grid(l, r, 10.0)
    assert(out.map(t => (t._1, t._2)) === Seq((1L, 1L)))
    assert(out.head._3 < 120.0) // ~110 km across the line, not half the globe
  }

  test("empty neighborhood falls back and still finds the global nearest") {
    val l = pts(Seq((1L, 0.0, 0.0)), "l")
    val r = pts(Seq((7L, 60.0, 120.0)), "r") // far outside any 3×3 at 5°
    assert(grid(l, r, 5.0).map(t => (t._1, t._2)) === Seq((1L, 7L)))
  }

  test("polar latitudes (single-cell bands) stay exact") {
    val l = pts(Seq((1L, 88.0, 10.0), (2L, -88.5, -170.0)), "l")
    val r = pts((1L to 12L).map(i => (i, 86.0 + (i % 5) * 0.8,
      i * 30.0 - 180.0)), "r")
    assert(grid(l, r, 3.0) === brute(l, r))
  }

  private def bruteRadius(l: DataFrame, r: DataFrame, radius: Double): Seq[(Long, Long)] =
    l.crossJoin(r)
      .withColumn("km", GeoOps.haversineKm(col("llat"), col("llon"), col("rlat"), col("rlon")))
      .where(col("km") <= radius)
      .select(col("lid"), col("rid"))
      .collect().toSeq.map(x => (x.getLong(0), x.getLong(1))).sorted

  private def gridRadius(l: DataFrame, r: DataFrame, radius: Double,
      cellDeg: Double): Seq[(Long, Long)] =
    GeoOps.withinRadius(l, "lid", "llat", "llon", r, "rid", "rlat", "rlon",
        radius, cellDeg)
      .collect().toSeq.map(x => (x.getLong(0), x.getLong(1))).sorted

  test("withinRadius equals brute force: pair sets identical, no duplicates") {
    val l = pts((1L to 300L).map(i => (i, (i * 37 % 1700) / 10.0 - 85.0,
      (i * 91 % 3600) / 10.0 - 180.0)), "l")
    val r = pts((1L to 40L).map(i => (i, (i * 53 % 1700) / 10.0 - 85.0,
      (i * 131 % 3600) / 10.0 - 180.0)), "r")
    for ((radius, cell) <- Seq((500.0, 10.0), (1500.0, 20.0), (3000.0, 45.0))) {
      val exact = bruteRadius(l, r, radius)
      val got = gridRadius(l, r, radius, cell)
      assert(got === exact, s"radius=$radius cell=$cell diverged")
      assert(got.distinct === got, s"radius=$radius cell=$cell emitted duplicates")
    }
  }

  test("withinRadius: date-line pair found, polar over-the-pole pair found") {
    val l = pts(Seq((1L, 10.0, -179.8), (2L, 87.0, 0.0)), "l")
    val r = pts(Seq((1L, 10.0, 179.8), (2L, 87.0, 179.0), (3L, 10.0, 0.0)), "r")
    // r2 is ~660 km from l2 straight over the pole — fixed-width lon cells
    // would put them far apart; the polar band is ONE cell, so the grid
    // path pairs them directly (withinRadius has no fallback to hide in)
    assert(gridRadius(l, r, 700.0, 10.0) === bruteRadius(l, r, 700.0))
  }

  test("withinRadius refuses a radius wider than the lat window") {
    val l = pts(Seq((1L, 0.0, 0.0)), "l")
    intercept[IllegalArgumentException] {
      GeoOps.withinRadius(l, "lid", "llat", "llon", l, "lid", "llat", "llon",
        radiusKm = 2000.0, cellDeg = 5.0)
    }
  }

  test("nearest ladder: the 5×5 middle tier resolves sparse rows before any all-pairs") {
    // neighbor ~1.5 cells away: outside the 3×3 certificate (one cell
    // width ≈ 555 km at 5°) but inside the 5×5 window and under its
    // per-band bound — the middle tier must certify it, so the exact
    // fallback sees NOTHING
    val l = pts(Seq((1L, 0.0, 0.0)), "l")
    val r = pts(Seq((7L, 0.0, 7.5), (8L, 40.0, 120.0)), "r")
    assert(grid(l, r, 5.0) === brute(l, r))
    val unresolved = GeoOps.nearestUnresolvedAfterLadder(
      l, "lid", "llat", "llon", r, "rid", "rlat", "rlon", cellDeg = 5.0)
    assert(unresolved.count() === 0L,
      "a 1.5-cell neighbor must certify in the 5×5 tier, not reach the cross join")
    // and a truly isolated row DOES pass the ladder to the exact fallback
    val far = pts(Seq((2L, 0.0, 0.0)), "l")
    val onlyFar = pts(Seq((9L, 60.0, 120.0)), "r")
    assert(grid(far, onlyFar, 5.0).map(t => (t._1, t._2)) === Seq((2L, 9L)))
    assert(GeoOps.nearestUnresolvedAfterLadder(
      far, "lid", "llat", "llon", onlyFar, "rid", "rlat", "rlon", 5.0).count() === 1L)
  }

  test("ladder bounds are sound lower bounds on out-of-5×5 distance") {
    // brute-force check of the certificate math: for a grid of cell sizes,
    // sample points in several bands and verify every out-of-window right
    // point is at least bounds(band) away (soundness is what exactness
    // rests on; tightness is not claimed)
    for (cell <- Seq(5.0, 15.0, 30.0)) {
      val counts = GeoOps.bandCellCounts(cell)
      val bounds = GeoOps.ladderBounds(cell, counts)
      assert(bounds.length === counts.length)
      assert(bounds.forall(b => b > 0.0 && b <= 2 * cell * GeoOps.KmPerDeg))
      // latitude escape is always covered: two full bands of separation
      assert(bounds.forall(_ <= 2 * cell * GeoOps.KmPerDeg + 1e-9))
    }
  }

  test("out-of-domain latitude keys into the nearest polar band instead of mis-indexing") {
    // lat < -90 used to produce a NEGATIVE band index, which element_at
    // resolves from the END of the counts array (silent wrong cell count)
    val l = pts(Seq((1L, -95.0, 10.0)), "l") // invalid input, clamped to -90
    val r = pts(Seq((1L, -89.0, 10.0), (2L, 50.0, 10.0)), "r")
    val out = grid(l, r, 10.0)
    assert(out.map(t => (t._1, t._2)) === Seq((1L, 1L)))
  }

  private def bruteK(l: DataFrame, r: DataFrame, k: Int): Seq[(Long, Int, Long, Double)] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lid")).orderBy(col("km"), col("rid"))
    l.crossJoin(r)
      .withColumn("km", GeoOps.haversineKm(col("llat"), col("llon"), col("rlat"), col("rlon")))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select(col("lid"), col("rn"), col("rid"), round(col("km"), 6).as("km"))
      .collect().toSeq.map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getDouble(3))).sorted
  }

  private def gridK(l: DataFrame, r: DataFrame, k: Int,
      cellDeg: Double): Seq[(Long, Int, Long, Double)] =
    GeoOps.nearestK(l, "lid", "llat", "llon", r, "rid", "rlat", "rlon", k, cellDeg)
      .select(col("lid"), col("rank"), col("rid"), round(col("km"), 6).as("km"))
      .collect().toSeq.map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getDouble(3))).sorted

  test("nearestK equals brute-force top-k at several cell sizes, ladder and fallback included") {
    val l = pts((1L to 200L).map(i => (i, (i * 37 % 1700) / 10.0 - 85.0,
      (i * 91 % 3600) / 10.0 - 180.0)), "l")
    val r = pts((1L to 30L).map(i => (i, (i * 53 % 1700) / 10.0 - 85.0,
      (i * 131 % 3600) / 10.0 - 180.0)), "r")
    for (cell <- Seq(5.0, 15.0, 45.0))
      assert(gridK(l, r, 3, cell) === bruteK(l, r, 3), s"cellDeg=$cell diverged")
    // k larger than |R| returns exactly what exists, still exact
    val fewR = pts(Seq((1L, 10.0, 10.0), (2L, 60.0, -120.0)), "r")
    assert(gridK(l, fewR, 5, 15.0) === bruteK(l, fewR, 5))
  }

  // ---------------------------------------------------------------- fences

  private def kite(id: Long, clat: Double, clon: Double, dy: Double, dx: Double) =
    (id, Seq((clat + dy, clon), (clat, clon + dx), (clat - dy, clon), (clat, clon - dx)))

  private def fences(rows: Seq[(Long, Seq[(Double, Double)])]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("gid", "raw")
      .select(col("gid"), expr(
        "transform(raw, v -> named_struct('lat', v._1, 'lon', v._2))").as("verts"))
  }

  private def bruteFence(points: DataFrame, polys: DataFrame): Seq[(Long, Long)] =
    points.crossJoin(polys)
      .where(GeoOps.pointInPolygon(col("plat"), col("plon"), col("verts")))
      .select(col("pid"), col("gid"))
      .collect().toSeq.map(x => (x.getLong(0), x.getLong(1))).sorted

  private def gridFence(points: DataFrame, polys: DataFrame,
      cellDeg: Double): Seq[(Long, Long)] =
    GeoOps.geofence(points, "pid", "plat", "plon", polys, "gid", "verts", cellDeg)
      .collect().toSeq.map(x => (x.getLong(0), x.getLong(1))).sorted

  test("geofence equals the brute-force ray cast at several cell sizes") {
    val points = pts((1L to 400L).map(i => (i, (i * 37 % 1700) / 10.0 - 85.0,
      (i * 91 % 3600) / 10.0 - 180.0)), "p")
    val polys = fences((0L to 24L).map { i =>
      kite(i, (i * 97 % 1400) / 10.0 - 70.0, (i * 139 % 3300) / 10.0 - 165.0,
        2.0 + (i * 7 % 80) / 10.0, 2.0 + (i * 11 % 80) / 10.0)
    })
    val exact = bruteFence(points, polys)
    assert(exact.nonEmpty, "fixture produced no containments — test is vacuous")
    for (cell <- Seq(5.0, 15.0, 45.0))
      assert(gridFence(points, polys, cell) === exact, s"cellDeg=$cell diverged")
  }

  test("geofence hard cases: point in two overlapping fences, concave fence, bbox-only miss") {
    // overlapping kites: the point is inside BOTH → two output rows
    val p = pts(Seq((1L, 10.0, 10.0)), "p")
    val two = fences(Seq(kite(1, 10.0, 10.0, 5.0, 5.0), kite(2, 11.0, 10.0, 4.0, 4.0)))
    assert(gridFence(p, two, 10.0) === Seq((1L, 1L), (1L, 2L)))
    // concave chevron: the notch point is inside the bbox but OUTSIDE the
    // polygon — ray parity must reject what a bbox test would accept
    val s = spark
    import s.implicits._
    val chevron = Seq((3L, Seq((0.0, 0.0), (10.0, 5.0), (0.0, 10.0), (8.0, 5.0))))
      .toDF("gid", "raw")
      .select(col("gid"), expr(
        "transform(raw, v -> named_struct('lat', v._1, 'lon', v._2))").as("verts"))
    val notch = pts(Seq((2L, 3.0, 5.0)), "p")  // inside bbox, in the notch
    val wing = pts(Seq((3L, 5.0, 2.6)), "p")   // genuinely inside the left wing
    assert(gridFence(notch, chevron, 10.0) === Seq.empty)
    assert(gridFence(wing, chevron, 10.0) === Seq((3L, 3L)))
  }

  test("splitAtAntimeridian: date-line fences match points on BOTH sides, exactly once") {
    // a kite straddling the date line: center lon 180, wings at 175 / -175
    val s2 = spark
    import s2.implicits._
    val raw = Seq((1L, Seq((5.0, 175.0), (0.0, -175.0), (-5.0, 175.0), (0.0, 177.0))),
      (2L, Seq((20.0, 10.0), (25.0, 15.0), (20.0, 20.0), (15.0, 15.0)))) // non-crossing passthrough
      .toDF("gid", "raw")
      .select(col("gid"), expr(
        "transform(raw, v -> named_struct('lat', v._1, 'lon', v._2))").as("verts"))
    val split = GeoOps.splitAtAntimeridian(raw, "verts")
    // crossing fence -> two halves; non-crossing fence -> one unchanged row
    assert(split.groupBy("gid").count().orderBy("gid")
      .as[(Long, Long)].collect().toSeq === Seq((1L, 2L), (2L, 1L)))
    // no output vertex list crosses: every edge jump stays under 180
    val jumps = split.select(expr(
      """aggregate(sequence(0, size(verts) - 1), 0D, (acc, i) ->
           greatest(acc, abs(element_at(verts, i + 1).lon -
             element_at(verts, CAST(pmod(i + 1, size(verts)) AS INT) + 1).lon)))"""))
      .as[Double].collect()
    assert(jumps.forall(_ <= 180.0), s"split halves still cross: ${jumps.toSeq}")

    // geofence over the split fences: west-side, east-side, seam-adjacent
    // inside points match ONCE; outside points never
    val points = pts(Seq(
      (1L, 0.0, 178.0),   // inside, west of the seam
      (2L, 0.0, -178.0),  // inside, east of the seam
      (3L, 0.0, 179.999), // inside, hugging the seam
      (4L, 0.0, 170.0),   // west of the fence entirely
      (5L, 8.0, 180.0),   // north of the fence
      (6L, 17.0, 15.0)    // inside the non-crossing fence
    ), "p")
    val got = GeoOps.geofence(points, "pid", "plat", "plon",
      GeoOps.splitAtAntimeridian(raw, "verts"), "gid", "verts", 10.0)
      .collect().toSeq.map(x => (x.getLong(0), x.getLong(1))).sorted
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L), (6L, 2L)))

    // the splitter is exact w.r.t. the spherical fence: brute-force ray
    // cast in a LOCAL frame shifted so the fence is contiguous agrees
    val shifted = Seq((1L, Seq((5.0, -5.0), (0.0, 5.0), (-5.0, -5.0), (0.0, -3.0))))
      .toDF("gid", "raw")
      .select(col("gid"), expr(
        "transform(raw, v -> named_struct('lat', v._1, 'lon', v._2))").as("verts"))
    val shiftedPts = pts(Seq((1L, 0.0, -2.0), (2L, 0.0, 2.0), (3L, 0.0, -0.001),
      (4L, 0.0, -10.0), (5L, 8.0, 0.0)), "p")
    val local = bruteFence(shiftedPts, shifted).map(_._1)
    assert(got.filter(_._2 == 1L).map(_._1) === local,
      "split-fence matches must equal the contiguous-frame ray cast")
  }

  test("splitLonLat degenerate and refusal cases") {
    // non-crossing passthrough is IDENTITY (no unwrap drift)
    assert(GeoOps.splitLonLat(Seq(1.0, 2.0, 3.0), Seq(10.0, 20.0, 15.0)) ===
      Seq((Seq(1.0, 2.0, 3.0), Seq(10.0, 20.0, 15.0))))
    // a polygon wrapping more than 360 degrees is refused loudly
    intercept[IllegalArgumentException] {
      GeoOps.splitLonLat(Seq(0.0, 10.0, 0.0, -10.0, 0.0, 10.0),
        Seq(0.0, 120.0, -120.0, 0.0, 120.0, -120.0))
    }
  }
}

