package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial primitives: haversine distance as pure column arithmetic
  * (codegen'd, no UDF) and EXACT nearest-neighbor / radius joins that
  * scale — the all-pairs cross join the naive definitions compute is
  * replaced by a SPHERICAL BAND GRID equi-join with a uniform per-row
  * soundness certificate:
  *
  *   - latitude splits into `cellDeg`-degree BANDS; within each band,
  *     longitude splits into cells whose angular width grows with
  *     latitude (width = 2·asin(sin(cellDeg/2) / cos(φmax + cellDeg)),
  *     φmax = the band's poleward edge) so a cell's KM width never
  *     shrinks below one band height — near the poles a band collapses
  *     to ONE cell covering all longitudes;
  *   - candidate pairs = left row × right rows in its 3×3 (band, cell)
  *     neighborhood (longitude wraps, so the date line is an ordinary
  *     cell boundary) — an equi-join on the (band, cell) key, so
  *     candidate volume tracks cell occupancy, never |L|·|R|;
  *   - UNIFORM CERTIFICATE (independent of latitude, the point of the
  *     band construction): any point outside the 3×3 window is at least
  *     `cellDeg`·[[GeoOps.KmPerDeg]] km away. Out-of-window in latitude
  *     means ≥ one full band of separation (d ≥ R·Δφ); out-of-window in
  *     longitude inside a neighbor band b means wrapped Δλ > that band's
  *     cell width W_b, and haversine gives d ≥ 2R·asin(cos φmax_b ·
  *     sin(W_b/2)) ≥ 2R·asin(sin(cellDeg/2)) = cellDeg·KmPerDeg by the
  *     width choice. Conversely a partner WITHIN that distance is proven
  *     inside the window: both endpoints' latitudes are ≤ φmax_b +
  *     cellDeg (bands are ±1), so Δλ ≤ W_b — which is why the width
  *     formula pads cos by one extra band.
  *
  * [[withinRadius]] therefore needs NO fallback (radius is `require`d
  * ≤ one cell width in km, so the grid candidates are complete for every
  * row); [[nearest]] falls back to the exact all-pairs pass only for
  * rows whose true nearest neighbor is farther than one cell width —
  * the data-density knob `cellDeg` controls, never a correctness
  * parameter. Ties break on (distance, right id) in all paths, so the
  * results are deterministic and identical to the brute-force
  * definitions row-for-row.
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

  /** Per-band longitude cell counts for `cellDeg` bands: band b spans
    * [b·cellDeg − 90, (b+1)·cellDeg − 90); its cell count makes each
    * cell's angular width ≥ 2·asin(sin(cellDeg/2)/cos(φmax + cellDeg))
    * (1 cell when the padded cos can't support it — the polar caps).
    * O(180/cellDeg) ints, embedded as an array literal → codegen'd
    * lookup, no join. */
  private[operators] def bandCellCounts(cellDeg: Double): Array[Int] = {
    val nBands = math.ceil(180.0 / cellDeg).toInt
    val halfCell = math.sin(math.toRadians(cellDeg) / 2)
    Array.tabulate(nBands) { b =>
      val lo = b * cellDeg - 90.0
      val hi = math.min(90.0, lo + cellDeg)
      val phiMax = math.max(math.abs(lo), math.abs(hi))
      val padded = math.min(90.0, phiMax + cellDeg)
      val c = math.cos(math.toRadians(padded))
      if (c <= halfCell) 1
      else math.max(1, math.floor(math.Pi / math.asin(halfCell / c)).toInt)
    }
  }

  private def bandOf(lat: Column, cellDeg: Double, nBands: Int): Column = {
    // Clamp to the valid domain first: a lat outside [-90, 90] would
    // produce a band index outside [0, nBands), and element_at resolves a
    // NEGATIVE index from the END of the counts array — silently assigning
    // a wrong cell count and voiding the exactness certificate. Clamped,
    // an out-of-domain point keys into the nearest polar band; the
    // distance predicate still sees the raw coordinates, so garbage input
    // degrades to garbage distances, never to a wrong index.
    val cl = greatest(lit(-90.0), least(lit(90.0), lat))
    least(floor((cl + 90.0) / cellDeg).cast("int"), lit(nBands - 1))
  }

  /** (band, cell) key columns for a point, via the band→cellCount array. */
  private def keyOf(lat: Column, lon: Column, cellDeg: Double,
      counts: Array[Int]): (Column, Column) = {
    val b = bandOf(lat, cellDeg, counts.length)
    val nx = element_at(array(counts.map(lit(_)): _*), b + 1)
    val cx = pmod(floor((lon + 180.0) / 360.0 * nx).cast("int"), nx)
    (b, cx)
  }

  /** The ≤9 distinct (band, cell) probe keys of a left point: bands ±1
    * (clamped at the poles), and within each band the cell indices
    * covering lon ± one of THAT band's cells (wrapping). array_distinct
    * before explode — a polar band with < 3 cells would otherwise emit
    * duplicate keys and double-count pairs. */
  private def probeKeys(lat: Column, lon: Column, cellDeg: Double,
      counts: Array[Int]): Column = {
    val nBands = counts.length
    val b0 = bandOf(lat, cellDeg, nBands)
    val keys = for (dy <- -1 to 1; dx <- -1 to 1) yield {
      val b = b0 + dy
      val nx = element_at(array(counts.map(lit(_)): _*), b + 1)
      val cx = pmod(floor((lon + 180.0) / 360.0 * nx).cast("int") + dx, nx)
      when(b >= 0 && b < nBands, struct(b.as("band"), cx.as("cx")))
        .otherwise(lit(null))
    }
    array_distinct(filter(array(keys: _*), _.isNotNull))
  }

  /** Exact nearest right-neighbor per left row.
    *
    * @param left     rows to resolve; must carry a unique `leftId`
    * @param right    candidate set (id, lat, lon)
    * @param cellDeg  band height in degrees — the density knob: size it
    *                 so a typical nearest neighbor is within one cell
    *                 width (cellDeg·[[KmPerDeg]] km); rows whose nearest
    *                 is farther fall back to the exact all-pairs pass
    * Output: (leftId columns…, nearest right id, `km`). */
  def nearest(left: DataFrame, leftId: String, latL: String, lonL: String,
      right: DataFrame, rightId: String, latR: String, lonR: String,
      cellDeg: Double): DataFrame = {
    require(cellDeg > 0 && cellDeg <= 90, s"cellDeg $cellDeg out of (0, 90]")
    val counts = bandCellCounts(cellDeg)

    val l = left.select(col(leftId).as("__lid"),
      col(latL).cast("double").as("__llat"), col(lonL).cast("double").as("__llon"))
    val (rb, rcx) = keyOf(col("__rlat"), col("__rlon"), cellDeg, counts)
    val r = right.select(col(rightId).as("__rid"),
      col(latR).cast("double").as("__rlat"), col(lonR).cast("double").as("__rlon"))
      .withColumn("__band", rb).withColumn("__cx", rcx)

    val lCells = l
      .withColumn("__k", explode(probeKeys(col("__llat"), col("__llon"), cellDeg, counts)))
      .withColumn("__band", col("__k.band"))
      .withColumn("__cx", col("__k.cx"))
      .drop("__k")

    // argmin as a PARTIAL-AGGREGABLE min(struct(km, rid)) — combines
    // map-side, so the shuffle carries one row per left id instead of
    // sorting the full candidate set (a row_number window would); the
    // struct's lexicographic order IS the (distance, right id) tie-break
    def argmin(cands: DataFrame): DataFrame = cands
      .withColumn("km",
        haversineKm(col("__llat"), col("__llon"), col("__rlat"), col("__rlon")))
      .groupBy(col("__lid"))
      .agg(min(struct(col("km"), col("__rid"))).as("__b"))
      .select(col("__lid"), col("__b.__rid").as("__rid"), col("__b.km").as("km"))

    // lazy checkpoint: `best` feeds BOTH the certified filter and the
    // unresolved anti-join — without it the grid join would execute twice
    val best = argmin(lCells.join(r, Seq("__band", "__cx"))).localCheckpoint(false)

    // uniform certificate: out-of-window points are ≥ one cell width away
    // at EVERY latitude (see object doc) — a best candidate at or under
    // that distance is provably the global nearest
    val certified = best.where(col("km") <= cellDeg * KmPerDeg)

    // exact fallback ONLY for rows with no candidate within one cell
    // width (sparse data / empty neighborhoods) — never a latitude class
    val unresolved = l.join(certified.select(col("__lid")), Seq("__lid"), "left_anti")
    val fallback = argmin(unresolved.crossJoin(r.drop("__band", "__cx")))

    certified.unionAll(fallback)
      .select(col("__lid").as(leftId), col("__rid").as(s"nearest_$rightId"),
        col("km"))
  }

  /** Exact distance join: every (left, right) pair within `radiusKm` —
    * NO fallback path: the `require` pins the radius at or under one
    * cell width in km, and the uniform certificate (object doc) proves
    * every partner within that distance sits inside the left row's 3×3
    * (band, cell) window, at every latitude including the poles. Pairs
    * are emitted exactly once: a right row lives in exactly ONE cell and
    * the left row's probe-key set is array_distinct'ed.
    *
    * Output: one row per qualifying pair — (leftId, rightId, `km`). */
  def withinRadius(left: DataFrame, leftId: String, latL: String, lonL: String,
      right: DataFrame, rightId: String, latR: String, lonR: String,
      radiusKm: Double, cellDeg: Double): DataFrame = {
    require(cellDeg > 0 && cellDeg <= 90, s"cellDeg $cellDeg out of (0, 90]")
    require(radiusKm > 0 && radiusKm <= cellDeg * KmPerDeg,
      s"radiusKm $radiusKm exceeds one cell width (${cellDeg * KmPerDeg} km) — " +
        "raise cellDeg so the 3x3 window covers the radius")
    val counts = bandCellCounts(cellDeg)

    val l = left.select(col(leftId).as("__lid"),
      col(latL).cast("double").as("__llat"), col(lonL).cast("double").as("__llon"))
    val (rb, rcx) = keyOf(col("__rlat"), col("__rlon"), cellDeg, counts)
    val r = right.select(col(rightId).as("__rid"),
      col(latR).cast("double").as("__rlat"), col(lonR).cast("double").as("__rlon"))
      .withColumn("__band", rb).withColumn("__cx", rcx)

    val lCells = l
      .withColumn("__k", explode(probeKeys(col("__llat"), col("__llon"), cellDeg, counts)))
      .withColumn("__band", col("__k.band"))
      .withColumn("__cx", col("__k.cx"))
      .drop("__k")

    lCells.join(r, Seq("__band", "__cx"))
      .withColumn("km",
        haversineKm(col("__llat"), col("__llon"), col("__rlat"), col("__rlon")))
      .where(col("km") <= radiusKm)
      .select(col("__lid").as(leftId), col("__rid").as(rightId), col("km"))
  }
}
