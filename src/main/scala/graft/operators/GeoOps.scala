package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Geospatial primitives: haversine distance as pure column arithmetic
  * (codegen'd, no UDF) and an EXACT nearest-neighbor join that scales —
  * the all-pairs cross join a naive nearest computes is replaced by a
  * grid-cell equi-join with a per-row soundness certificate:
  *
  *   1. bucket both sides into `cellDeg`-degree grid cells (longitude
  *      cells wrap modulo 360° so the date line is an ordinary neighbor
  *      boundary; latitude cells clamp at the poles),
  *   2. candidate pairs = left row × right rows in its 3×3 neighbor
  *      cells — an equi-join on the cell key, so candidate volume tracks
  *      cell occupancy, never |L|·|R|,
  *   3. CERTIFICATE: a point anywhere in the center cell is ≥ one full
  *      cell width from the 3×3 window's boundary, so if the best
  *      candidate's distance ≤ that width (in km, with the longitude
  *      width scaled by the window's worst-case cos(lat) — conservative),
  *      nothing outside the window can beat it: the grid answer is
  *      PROVABLY exact for that row,
  *   4. rows without a certificate (empty neighborhood, or best candidate
  *      too far, or high latitude where the lon guarantee collapses) fall
  *      back to the exact all-pairs pass — correctness never depends on
  *      the grid, only speed does. With `cellDeg` sized to the right
  *      side's density the fallback fraction is ~0; the fallback input is
  *      only those rows, not the corpus.
  *
  * Ties break on (distance, right id) in BOTH paths, so the result is
  * deterministic and identical to the brute-force definition row-for-row.
  */
object GeoOps {

  val EarthRadiusKm = 6371.0088
  /** km per degree of great-circle arc. */
  val KmPerDeg: Double = math.Pi * EarthRadiusKm / 180.0

  /** Great-circle distance in km between two (lat, lon) pairs, degrees.
    * Pure `functions` arithmetic — whole-stage codegen keeps it in the
    * scan/join stage. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Exact nearest right-neighbor per left row.
    *
    * @param left     rows to resolve; must carry a unique `leftId`
    * @param right    candidate set (id, lat, lon)
    * @param cellDeg  grid cell width in degrees — the density knob: cells
    *                 should be sized so a typical nearest neighbor is
    *                 within one cell width
    * Output: (leftId columns…, nearest right id, `km`). */
  def nearest(left: DataFrame, leftId: String, latL: String, lonL: String,
      right: DataFrame, rightId: String, latR: String, lonR: String,
      cellDeg: Double): DataFrame = {
    require(cellDeg > 0 && cellDeg <= 90, s"cellDeg $cellDeg out of (0, 90]")
    val nx = math.ceil(360.0 / cellDeg).toInt
    def cy(lat: Column) = floor((lat + 90.0) / cellDeg).cast("int")
    def cx(lon: Column) = pmod(floor((lon + 180.0) / cellDeg).cast("int"), lit(nx))

    val l = left.select(col(leftId).as("__lid"),
      col(latL).cast("double").as("__llat"), col(lonL).cast("double").as("__llon"))
    val r = right.select(col(rightId).as("__rid"),
      col(latR).cast("double").as("__rlat"), col(lonR).cast("double").as("__rlon"))
      .withColumn("__cy", cy(col("__rlat")))
      .withColumn("__cx", cx(col("__rlon")))

    // left fans out to its 3×3 neighborhood (lon wraps, lat rows outside
    // [0, 180/cellDeg) are simply empty); right stays one row per point
    val offsets = array((for (dy <- -1 to 1; dx <- -1 to 1)
      yield struct(lit(dy).as("dy"), lit(dx).as("dx"))): _*)
    val lCells = l
      .withColumn("__o", explode(offsets))
      .withColumn("__cy", cy(col("__llat")) + col("__o.dy"))
      .withColumn("__cx", pmod(cx(col("__llon")) + col("__o.dx"), lit(nx)))
      .drop("__o")

    val w = Window.partitionBy(col("__lid")).orderBy(col("km"), col("__rid"))
    val best = lCells.join(r, Seq("__cy", "__cx"))
      .withColumn("km",
        haversineKm(col("__llat"), col("__llon"), col("__rlat"), col("__rlon")))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("__lid"), col("__llat"), col("__llon"), col("__rid"), col("km"))

    // soundness certificate: distance from anywhere in the center cell to
    // the 3×3 boundary is ≥ one cell width — cellDeg·111 km in latitude,
    // cos-scaled by the window's worst-case |lat| in longitude (the span
    // reaches |lat| + 2·cellDeg; capped below 90° so cos > 0 — beyond the
    // cap the certificate is 0 and the row falls back)
    val worstLat = least(abs(col("__llat")) + lit(2 * cellDeg), lit(89.999))
    val guarantee = lit(cellDeg * KmPerDeg) * least(lit(1.0), cos(radians(worstLat)))
    val certified = best.where(col("km") <= guarantee)
      .select(col("__lid"), col("__rid"), col("km"))

    // exact fallback for uncertified rows ONLY: all-pairs vs the right
    // side (broadcast when small; the fraction of rows here is the knob
    // cellDeg controls, not a correctness parameter)
    val unresolved = l.join(certified.select(col("__lid")), Seq("__lid"), "left_anti")
    val fallback = unresolved.crossJoin(r.drop("__cy", "__cx"))
      .withColumn("km",
        haversineKm(col("__llat"), col("__llon"), col("__rlat"), col("__rlon")))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("__lid"), col("__rid"), col("km"))

    certified.unionAll(fallback)
      .select(col("__lid").as(leftId), col("__rid").as(s"nearest_$rightId"),
        col("km"))
  }

  /** Exact distance join: every (left, right) pair within `radiusKm`.
    * The naive definition is |L|·|R| haversine evaluations; here the
    * candidate set is the same 3×3 grid-cell equi-join as [[nearest]],
    * made EXACT by a per-LEFT-ROW certificate that is static in the
    * row's latitude (no candidate inspection needed):
    *
    *   - latitude is globally safe by construction: a pair within r km
    *     differs by ≤ r/[[KmPerDeg]] degrees of latitude, and the
    *     `require` pins cellDeg ≥ that, so the partner's lat cell is
    *     within ±1 always;
    *   - longitude: from haversine, d ≥ 2R·asin(cos φmax · sin(Δλ/2))
    *     with φmax the larger |lat| of the pair — bounded by
    *     |latL| + cellDeg (the partner is ≤ one lat cell away). A
    *     partner OUTSIDE the 3×3 window has wrapped Δλ > cellDeg, hence
    *     d ≥ 2R·asin(cos(|latL|+cellDeg)·sin(cellDeg/2)); when that
    *     bound ≥ r, no out-of-window point can be within r and the grid
    *     candidates are complete for the row.
    *
    * Left rows failing the bound (high latitudes, where lon degrees
    * shrink in km) go to the exact all-pairs fallback — correctness
    * never depends on the grid; the certified fraction is what cellDeg
    * tunes. Pairs are emitted exactly once: the two paths partition the
    * LEFT side, and in the grid path a right row lives in exactly one
    * cell while a left row probes 9 distinct cells (nx ≥ 4, so the
    * wrapped offsets never alias).
    *
    * Output: one row per qualifying pair — (leftId, rightId, `km`). */
  def withinRadius(left: DataFrame, leftId: String, latL: String, lonL: String,
      right: DataFrame, rightId: String, latR: String, lonR: String,
      radiusKm: Double, cellDeg: Double): DataFrame = {
    require(cellDeg > 0 && cellDeg <= 90, s"cellDeg $cellDeg out of (0, 90]")
    require(radiusKm > 0 && radiusKm <= cellDeg * KmPerDeg,
      s"radiusKm $radiusKm exceeds one lat cell (${cellDeg * KmPerDeg} km) — " +
        "raise cellDeg so the 3x3 window covers the radius")
    val nx = math.ceil(360.0 / cellDeg).toInt
    def cy(lat: Column) = floor((lat + 90.0) / cellDeg).cast("int")
    def cx(lon: Column) = pmod(floor((lon + 180.0) / cellDeg).cast("int"), lit(nx))

    val l = left.select(col(leftId).as("__lid"),
      col(latL).cast("double").as("__llat"), col(lonL).cast("double").as("__llon"))
    val r = right.select(col(rightId).as("__rid"),
      col(latR).cast("double").as("__rlat"), col(lonR).cast("double").as("__rlon"))

    // static per-row certificate: out-of-window lower bound ≥ radius
    val phiMax = least(abs(col("__llat")) + lit(cellDeg), lit(89.999))
    val outOfWindowKm = lit(2 * EarthRadiusKm) *
      asin(cos(radians(phiMax)) * sin(lit(math.toRadians(cellDeg) / 2)))
    val lTagged = l.withColumn("__cert", outOfWindowKm >= radiusKm)

    val offsets = array((for (dy <- -1 to 1; dx <- -1 to 1)
      yield struct(lit(dy).as("dy"), lit(dx).as("dx"))): _*)
    val lCells = lTagged.where(col("__cert"))
      .withColumn("__o", explode(offsets))
      .withColumn("__cy", cy(col("__llat")) + col("__o.dy"))
      .withColumn("__cx", pmod(cx(col("__llon")) + col("__o.dx"), lit(nx)))
      .drop("__o", "__cert")
    val rCells = r.withColumn("__cy", cy(col("__rlat")))
      .withColumn("__cx", cx(col("__rlon")))

    val dist = haversineKm(col("__llat"), col("__llon"), col("__rlat"), col("__rlon"))
    val gridPairs = lCells.join(rCells, Seq("__cy", "__cx"))
      .withColumn("km", dist).where(col("km") <= radiusKm)

    val fallbackPairs = lTagged.where(!col("__cert")).drop("__cert")
      .crossJoin(r)
      .withColumn("km", dist).where(col("km") <= radiusKm)

    gridPairs.select(col("__lid"), col("__rid"), col("km"))
      .unionAll(fallbackPairs.select(col("__lid"), col("__rid"), col("km")))
      .select(col("__lid").as(leftId), col("__rid").as(rightId), col("km"))
  }
}
