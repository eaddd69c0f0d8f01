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

  /** The ≤(2r+1)² distinct (band, cell) probe keys of a left point:
    * bands ±`radius` (clamped at the poles), and within each band the
    * cell indices covering lon ± `radius` of THAT band's cells
    * (wrapping). array_distinct before explode — a polar band with
    * < 2r+1 cells would otherwise emit duplicate keys and double-count
    * pairs. radius=1 is the certified 3×3 window; radius=2 the
    * [[nearest]] ladder's middle tier. */
  private def probeKeys(lat: Column, lon: Column, cellDeg: Double,
      counts: Array[Int], radius: Int = 1): Column = {
    val nBands = counts.length
    val b0 = bandOf(lat, cellDeg, nBands)
    val keys = for (dy <- -radius to radius; dx <- -radius to radius) yield {
      val b = b0 + dy
      val nx = element_at(array(counts.map(lit(_)): _*), b + 1)
      val cx = pmod(floor((lon + 180.0) / 360.0 * nx).cast("int") + dx, nx)
      when(b >= 0 && b < nBands, struct(b.as("band"), cx.as("cx")))
        .otherwise(lit(null))
    }
    array_distinct(filter(array(keys: _*), _.isNotNull))
  }

  /** Per-band lower bound (km) on the distance to any point OUTSIDE a
    * left row's 5×5 probe window — the middle tier's certificate, one
    * double per band, computed driver-side from the counts array and
    * embedded as a literal:
    *
    *   - out-of-window in LATITUDE means ≥ 2 complete bands of
    *     separation: d ≥ R·Δφ ≥ 2·cellDeg·[[KmPerDeg]];
    *   - out-of-window in LONGITUDE inside a neighbor band b' (within
    *     ±2) means a wrapped gap > 2 of that band's cells (cx difference
    *     ≥ 3): with both latitudes ≤ φmax_b' + 2·cellDeg, haversine gives
    *     d ≥ 2R·asin(cos(φmax_b' + 2·cellDeg) · sin(W_b')), W_b' = the
    *     band's actual cell width 2π/nx. Bands with ≤ 5 cells contribute
    *     no longitude bound (the ±2 window wraps them fully — no
    *     out-of-window-in-longitude partner exists there).
    *
    * The certificate needs only SOUNDNESS (a lower bound), not the 3×3
    * tier's tight uniformity: a best-in-window candidate at or under the
    * bound is provably the global nearest. Near the poles the longitude
    * term can collapse to 0 via cos — those bands simply certify nothing
    * through longitude and fall to the latitude term or the exact pass. */
  private[operators] def ladderBounds(cellDeg: Double,
      counts: Array[Int]): Array[Double] = {
    val latBound = 2 * cellDeg * KmPerDeg
    Array.tabulate(counts.length) { b =>
      val lonBounds = ((b - 2) to (b + 2))
        .filter(bb => bb >= 0 && bb < counts.length && counts(bb) > 5)
        .map { bb =>
          val lo = bb * cellDeg - 90.0
          val hi = math.min(90.0, lo + cellDeg)
          val phiPad = math.min(90.0,
            math.max(math.abs(lo), math.abs(hi)) + 2 * cellDeg)
          val w = 2 * math.Pi / counts(bb)
          2 * EarthRadiusKm * math.asin(math.min(1.0,
            math.cos(math.toRadians(phiPad)) * math.sin(math.min(math.Pi / 2, w))))
        }
      (latBound +: lonBounds).min
    }
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

    // MIDDLE TIER for rows with no candidate within one cell width: widen
    // to the 5×5 window before any all-pairs pass. Certified by the
    // per-band [[ladderBounds]] (everything outside the window is at
    // least that far), so the exact fallback's blast radius is capped to
    // rows whose nearest exceeds ~two cell widths — a mis-sized cellDeg
    // degrades in stages instead of straight to |unresolved|·|R|
    val unresolved3 = l.join(certified.select(col("__lid")), Seq("__lid"), "left_anti")
      .localCheckpoint(false) // feeds the 5×5 join AND the next anti-join
    val bounds = ladderBounds(cellDeg, counts)
    val l5 = unresolved3
      .withColumn("__b0", bandOf(col("__llat"), cellDeg, counts.length))
      .withColumn("__k",
        explode(probeKeys(col("__llat"), col("__llon"), cellDeg, counts, radius = 2)))
      .withColumn("__band", col("__k.band"))
      .withColumn("__cx", col("__k.cx"))
      .drop("__k")
    // argmin keyed on (__lid, __b0): __b0 is functional on __lid, riding
    // along so the certificate can index the per-band bound array
    val best5 = l5.join(r, Seq("__band", "__cx"))
      .withColumn("km",
        haversineKm(col("__llat"), col("__llon"), col("__rlat"), col("__rlon")))
      .groupBy(col("__lid"), col("__b0"))
      .agg(min(struct(col("km"), col("__rid"))).as("__b"))
      .select(col("__lid"), col("__b0"), col("__b.__rid").as("__rid"), col("__b.km").as("km"))
      .localCheckpoint(false)
    val certified5 = best5
      .where(col("km") <= element_at(array(bounds.map(lit(_)): _*), col("__b0") + 1))
      .drop("__b0")

    // exact fallback ONLY for rows the widened window could not certify
    val unresolved5 = unresolved3
      .join(certified5.select(col("__lid")), Seq("__lid"), "left_anti")
    val fallback = argmin(unresolved5.crossJoin(r.drop("__band", "__cx")))

    certified.unionAll(certified5).unionAll(fallback)
      .select(col("__lid").as(leftId), col("__rid").as(s"nearest_$rightId"),
        col("km"))
  }

  /** Exact K nearest right neighbors per left row — the top-k
    * generalization of [[nearest]], same band grid, same certificate
    * ladder. Per tier the aggregation is the bounded
    * [[graft.functions.TopKAggregator]] (each partition emits at most k
    * candidates per left id, so O(|L|·k) rows cross the shuffle — never
    * the full candidate set a row_number window would sort); a tier
    * CERTIFIES a row when it found at least k in-window candidates and
    * the k-th distance is at or under the tier's bound — every
    * out-of-window point is then provably no closer than any of the k.
    * Rows with fewer than k in-window candidates ride the ladder down to
    * the exact all-pairs pass (which returns however many exist). Right
    * ids must be integral (the bounded buffer is (long, double)).
    * Output: (leftId, rank 1..k, rightId, km); ties (km, right id) —
    * row-for-row the brute-force answer. */
  def nearestK(left: DataFrame, leftId: String, latL: String, lonL: String,
      right: DataFrame, rightId: String, latR: String, lonR: String,
      k: Int, cellDeg: Double): DataFrame = {
    import graft.functions.TopKAggregator
    require(cellDeg > 0 && cellDeg <= 90, s"cellDeg $cellDeg out of (0, 90]")
    require(k >= 1, s"k $k must be >= 1")
    val ridType = right.schema(rightId).dataType
    require(ridType == org.apache.spark.sql.types.LongType ||
        ridType == org.apache.spark.sql.types.IntegerType,
      s"nearestK right id '$rightId' must be integral, got $ridType " +
        "(the bounded top-k buffer is (long, double))")
    val counts = bandCellCounts(cellDeg)
    val bounds = ladderBounds(cellDeg, counts)
    val topk = udaf(new TopKAggregator(k), TopKAggregator.inputEncoder)

    val l = left.select(col(leftId).as("__lid"),
      col(latL).cast("double").as("__llat"), col(lonL).cast("double").as("__llon"))
    val (rb, rcx) = keyOf(col("__rlat"), col("__rlon"), cellDeg, counts)
    val r = right.select(col(rightId).cast("long").as("__rid"),
      col(latR).cast("double").as("__rlat"), col(lonR).cast("double").as("__rlon"))
      .withColumn("__band", rb).withColumn("__cx", rcx)

    // top-k per left id; score = -km so the DESC aggregator ranks by
    // ascending distance, ids ASC on ties — the brute-force order
    def best(cands: DataFrame): DataFrame = cands
      .withColumn("km",
        haversineKm(col("__llat"), col("__llon"), col("__rlat"), col("__rlon")))
      .groupBy(col("__lid"), col("__b0"))
      .agg(topk(col("__rid"), -col("km")).as("__nn"))
    def gridTier(src: DataFrame, radius: Int): DataFrame = best(
      src.withColumn("__b0", bandOf(col("__llat"), cellDeg, counts.length))
        .withColumn("__k",
          explode(probeKeys(col("__llat"), col("__llon"), cellDeg, counts, radius)))
        .withColumn("__band", col("__k.band"))
        .withColumn("__cx", col("__k.cx"))
        .drop("__k")
        .join(r, Seq("__band", "__cx")))
    // certified iff k candidates exist in-window AND the k-th is at or
    // under the tier bound: nothing outside the window can displace any
    def certify(tier: DataFrame, bound: Column): DataFrame =
      tier.where(size(col("__nn")) >= k &&
        -element_at(col("__nn"), k).getField("score") <= bound)

    val c3 = certify(gridTier(l, 1), lit(cellDeg * KmPerDeg)).localCheckpoint(false)
    val u3 = l.join(c3.select(col("__lid")), Seq("__lid"), "left_anti")
      .localCheckpoint(false)
    val boundsArr = array(bounds.map(lit(_)): _*)
    val c5 = certify(gridTier(u3, 2), element_at(boundsArr, col("__b0") + 1))
      .localCheckpoint(false)
    val u5 = u3.join(c5.select(col("__lid")), Seq("__lid"), "left_anti")
    val fb = best(u5.crossJoin(r.drop("__band", "__cx"))
      .withColumn("__b0", lit(0)))

    c3.unionAll(c5).unionAll(fb)
      .select(col("__lid"), posexplode(col("__nn")))
      .select(col("__lid").as(leftId), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as(rightId), (-col("col.score")).as("km"))
  }

  /** Debug/spec hook: the left ids still unresolved after the 5×5 middle
    * tier — exactly the rows [[nearest]] sends to the all-pairs fallback. */
  private[operators] def nearestUnresolvedAfterLadder(
      left: DataFrame, leftId: String, latL: String, lonL: String,
      right: DataFrame, rightId: String, latR: String, lonR: String,
      cellDeg: Double): DataFrame = {
    val counts = bandCellCounts(cellDeg)
    val l = left.select(col(leftId).as("__lid"),
      col(latL).cast("double").as("__llat"), col(lonL).cast("double").as("__llon"))
    val (rb, rcx) = keyOf(col("__rlat"), col("__rlon"), cellDeg, counts)
    val r = right.select(col(rightId).as("__rid"),
      col(latR).cast("double").as("__rlat"), col(lonR).cast("double").as("__rlon"))
      .withColumn("__band", rb).withColumn("__cx", rcx)
    val bounds = ladderBounds(cellDeg, counts)
    def tier(src: DataFrame, radius: Int, threshold: Column): DataFrame = {
      val cells = src
        .withColumn("__b0", bandOf(col("__llat"), cellDeg, counts.length))
        .withColumn("__k",
          explode(probeKeys(col("__llat"), col("__llon"), cellDeg, counts, radius)))
        .withColumn("__band", col("__k.band"))
        .withColumn("__cx", col("__k.cx"))
        .drop("__k")
      val best = cells.join(r, Seq("__band", "__cx"))
        .withColumn("km",
          haversineKm(col("__llat"), col("__llon"), col("__rlat"), col("__rlon")))
        .groupBy(col("__lid"), col("__b0"))
        .agg(min(struct(col("km"), col("__rid"))).as("__b"))
        .select(col("__lid"), col("__b0"), col("__b.km").as("km"))
      src.join(best.where(col("km") <= threshold).select(col("__lid")),
        Seq("__lid"), "left_anti")
    }
    val after3 = tier(l, 1, lit(cellDeg * KmPerDeg))
    tier(after3, 2,
      element_at(array(bounds.map(lit(_)): _*), col("__b0") + 1))
      .select(col("__lid").as(leftId))
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

  /** Ray-casting point-in-polygon as a pure column expression (codegen'd
    * HOF — no UDF): `verts` is an `array<struct<lat,lon>>` tracing a
    * SIMPLE polygon (closing edge implied); edges are straight lines in
    * (lat, lon) space — the planar geofencing convention, right for
    * region-scale fences where geodesic curvature within an edge is
    * negligible. Crossing parity of the eastward ray from the point;
    * horizontal edges contribute nothing (the y-straddle test is false,
    * and non-ANSI/ANSI double division by zero is ±Inf/NaN, never a
    * throw). Boundary points follow the standard half-open convention. */
  def pointInPolygon(lat: Column, lon: Column, verts: Column): Column = {
    val n = size(verts)
    val crossings = filter(sequence(lit(0), n - 1), i => {
      val a = element_at(verts, i + 1)
      val b = element_at(verts, pmod(i + 1, n) + 1)
      val y1 = a.getField("lat"); val x1 = a.getField("lon")
      val y2 = b.getField("lat"); val x2 = b.getField("lon")
      ((y1 > lat) =!= (y2 > lat)) &&
        (lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1)
    })
    size(crossings) % 2 === 1
  }

  /** GEOFENCE join: every (point, polygon) pair where the point lies
    * inside the polygon — the third geo shape after nearest/radius
    * ("which region is this point in"). Exact w.r.t. the planar
    * [[pointInPolygon]] semantics, and NEVER all-pairs:
    *
    *   - each polygon registers under the (band, cell) keys its bounding
    *     box overlaps (per band, the cx range is computed with THAT
    *     band's cell count, capped at one full wrap so a wide polygon
    *     can't emit duplicate keys);
    *   - each point keys into its single cell; the candidate set is the
    *     equi-join — volume tracks fence density, not |points|·|fences|;
    *   - completeness: a containing polygon's bbox covers the point, the
    *     band/cx formulas are monotone in lat/lon, so the point's key is
    *     always in the polygon's cover — a fence smaller than one cell
    *     registers in ≤ 4 keys and there is no fallback path at all;
    *   - the exact ray-cast runs only inside the candidate cells.
    *
    * `verts` must not cross the antimeridian — run crossing fences
    * through [[splitAtAntimeridian]] first (the two clipped halves
    * together match exactly the points the original spherical fence
    * contains); size `cellDeg` near the fence scale so covers stay small.
    * Output: (pointId, polyId). */
  def geofence(points: DataFrame, pointId: String, latP: String, lonP: String,
      polygons: DataFrame, polyId: String, vertsCol: String,
      cellDeg: Double): DataFrame = {
    require(cellDeg > 0 && cellDeg <= 90, s"cellDeg $cellDeg out of (0, 90]")
    val counts = bandCellCounts(cellDeg)
    val countsArr = array(counts.map(lit(_)): _*)
    val lats = transform(col("__verts"), v => v.getField("lat"))
    val lons = transform(col("__verts"), v => v.getField("lon"))
    val polys = polygons
      .select(col(polyId).as("__gid"), col(vertsCol).as("__verts"))
      .withColumn("__latmin", array_min(lats)).withColumn("__latmax", array_max(lats))
      .withColumn("__lonmin", array_min(lons)).withColumn("__lonmax", array_max(lons))
    val cover = polys
      .withColumn("__band", explode(sequence(
        bandOf(col("__latmin"), cellDeg, counts.length),
        bandOf(col("__latmax"), cellDeg, counts.length))))
      .withColumn("__nx", element_at(countsArr, col("__band") + 1))
      // cap the range length at one full wrap: a bbox spanning most of a
      // small band's circle would otherwise emit the same cx twice via pmod
      .withColumn("__cx", explode(sequence(
        floor((col("__lonmin") + 180.0) / 360.0 * col("__nx")).cast("int"),
        least(
          floor((col("__lonmax") + 180.0) / 360.0 * col("__nx")).cast("int"),
          floor((col("__lonmin") + 180.0) / 360.0 * col("__nx")).cast("int")
            + col("__nx") - 1))))
      .withColumn("__cx", pmod(col("__cx"), col("__nx")))
      .select(col("__gid"), col("__verts"), col("__band"), col("__cx"))
    val (pb, pcx) = keyOf(col("__plat"), col("__plon"), cellDeg, counts)
    val pts = points.select(col(pointId).as("__pid"),
      col(latP).cast("double").as("__plat"), col(lonP).cast("double").as("__plon"))
      .withColumn("__band", pb).withColumn("__cx", pcx)
    pts.join(cover, Seq("__band", "__cx"))
      .where(pointInPolygon(col("__plat"), col("__plon"), col("__verts")))
      .select(col("__pid").as(pointId), col("__gid").as(polyId))
  }

  /** Split one polygon's vertex lists at the antimeridian. A polygon
    * CROSSES when some edge's longitude jump exceeds 180° (the short-way
    * convention: an edge 170° → −170° runs through ±180, not around the
    * globe). Longitudes are first unwrapped into one continuous chain,
    * then the polygon is Sutherland–Hodgman-clipped against the single
    * seam meridian inside its span, and each half is shifted by a
    * constant multiple of 360° back into [−180°, 180°] — the seam edge
    * lands at +180 on the west half and −180 on the east half, so neither
    * output crosses. Non-crossing polygons pass through unchanged; parts
    * degenerating below 3 vertices drop. The total unwrapped span must
    * stay under 360° (a fence is a region, not a globe wrap). */
  private[operators] def splitLonLat(lats: Seq[Double], lons: Seq[Double])
      : Seq[(Seq[Double], Seq[Double])] = {
    val n = lats.length
    if (n < 3) return Seq((lats, lons))
    val crosses = (0 until n).exists { i =>
      math.abs(lons((i + 1) % n) - lons(i)) > 180.0
    }
    if (!crosses) return Seq((lats, lons))
    val ux = new Array[Double](n)
    ux(0) = lons.head
    for (i <- 1 until n) {
      var d = lons(i) - lons(i - 1)
      while (d > 180.0) d -= 360.0
      while (d <= -180.0) d += 360.0
      ux(i) = ux(i - 1) + d
    }
    // the closing edge must also take the short way, or the "polygon" is
    // not a simple region in unwrapped space
    require(math.abs(ux(0) - ux(n - 1)) <= 180.0,
      "splitAtAntimeridian: closing edge spans more than 180 degrees")
    val lo = ux.min; val hi = ux.max
    require(hi - lo < 360.0,
      s"splitAtAntimeridian: polygon spans ${hi - lo} degrees of longitude")
    val seams = {
      val kLo = math.ceil((lo - 180.0) / 360.0).toInt
      val kHi = math.floor((hi - 180.0) / 360.0).toInt
      (kLo to kHi).map(m => 180.0 + 360.0 * m).filter(b => b > lo && b < hi)
    }
    if (seams.isEmpty) { // unwrap alone removed the jump (span < 360, no seam inside)
      val shift = 360.0 * math.round((lo + hi) / 2 / 360.0)
      return Seq((lats, ux.toSeq.map(_ - shift)))
    }
    val seam = seams.head
    def clip(keep: Double => Boolean): (Seq[Double], Seq[Double]) = {
      val outLat = Seq.newBuilder[Double]; val outLon = Seq.newBuilder[Double]
      for (i <- 0 until n) {
        val j = (i + 1) % n
        val (y1, x1) = (lats(i), ux(i)); val (y2, x2) = (lats(j), ux(j))
        if (keep(x1)) { outLat += y1; outLon += x1 }
        if (keep(x1) != keep(x2)) {
          val t = (seam - x1) / (x2 - x1)
          outLat += y1 + t * (y2 - y1); outLon += seam
        }
      }
      (outLat.result(), outLon.result())
    }
    val m = math.round((seam - 180.0) / 360.0)
    val west = clip(_ <= seam) // seam edge at +180 after the shift
    val east = clip(_ >= seam) // seam edge at −180 after the shift
    Seq((west, -360.0 * m), (east, -360.0 * (m + 1))).collect {
      case ((pl, px), shift) if pl.length >= 3 => (pl, px.map(_ + shift))
    }
  }

  /** Antimeridian-safe fence preprocessing for [[geofence]]: each polygon
    * crossing ±180° splits into its two clipped halves (same `polyId`,
    * one row per half); non-crossing polygons pass through unchanged. A
    * point inside the original spherical fence is inside EXACTLY one
    * half (the seam itself follows each half's half-open edge
    * convention), so `geofence(points, …, splitAtAntimeridian(fences,
    * "verts"), …)` is the crossing-tolerant join with no duplicate
    * pairs. The scalar UDF runs on the FENCES side only — the small
    * dimension table; the points side stays pure column arithmetic. */
  def splitAtAntimeridian(polygons: DataFrame, vertsCol: String): DataFrame = {
    val split = udf((lats: Seq[Double], lons: Seq[Double]) => splitLonLat(lats, lons))
    polygons
      .withColumn("__part", explode(split(
        transform(col(vertsCol), _.getField("lat")),
        transform(col(vertsCol), _.getField("lon")))))
      .withColumn(vertsCol, zip_with(col("__part._1"), col("__part._2"),
        (la, lo) => struct(la.as("lat"), lo.as("lon"))))
      .drop("__part")
  }
}
