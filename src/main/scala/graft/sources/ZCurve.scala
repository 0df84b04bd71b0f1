package graft.sources

/** Driver-side Z-curve (Morton) math for the z-ordered layout's READ path.
  *
  * A z-sorted table serves a two-dimensional box predicate as a small set
  * of ONE-dimensional z-ranges: every quadtree-aligned cell of the
  * (x, y) plane occupies a contiguous z interval, so recursively splitting
  * the box into aligned cells yields ranges a columnar reader turns into
  * row-group stats skips on the single z column (the classic
  * BIGMIN/LITMAX decomposition, here as an explicit quadtree cover —
  * UB-tree literature, Bayer 1997). The decomposition is data-independent
  * O(ranges) driver work: at 100 TB the cost of planning the scan does not
  * grow with the table at all, only with the requested precision.
  *
  * Exactness contract: [[ranges]] returns a SUPERSET cover of the box's
  * z-values (cells smaller than `2^floorBits` per side are emitted whole,
  * and a `maxRanges` budget merges the smallest gaps), so callers must
  * re-apply the exact box predicate on the survivors — which
  * `Layout.zBoxQuery` does. Mirrors `ops.LayoutOps.zValue` bit-for-bit
  * (LayoutSpec pins the two against each other).
  */
object ZCurve {

  /** 16-bit × 16-bit Morton interleave: bit i of `x` → bit 2i, bit i of
    * `y` → bit 2i+1. Driver-side twin of the codegen'd
    * `ops.LayoutOps.zValue`.
    */
  def z(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  /** Inverse of [[z]]. */
  def deinterleave(zv: Long): (Long, Long) = {
    var x = 0L; var y = 0L; var i = 0
    while (i < 16) {
      x |= ((zv >> (2 * i)) & 1L) << i
      y |= ((zv >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }

  /** Decompose the inclusive box [xLo,xHi]×[yLo,yHi] (16-bit quantized
    * coordinates) into ≤ `maxRanges` sorted, disjoint, inclusive z ranges
    * covering every z in the box.
    *
    *   - recursion stops at `floorBits` cell side (2^floorBits points per
    *     side): partially-covered floor cells are emitted whole — bounded
    *     slop the caller's residual predicate removes;
    *   - the quadtree visit emits ranges in ascending z order; adjacent
    *     ranges merge for free, and if more than `maxRanges` remain, only
    *     the `maxRanges−1` LARGEST z-gaps survive as split points (the
    *     optimal coalescing for a fixed range budget: every smaller gap
    *     admits fewer false-positive z values than any kept gap).
    */
  def ranges(
      xLo: Long, xHi: Long, yLo: Long, yHi: Long,
      floorBits: Int = 4, maxRanges: Int = 32): Vector[(Long, Long)] = {
    require(maxRanges >= 1 && floorBits >= 0 && floorBits <= 16)
    if (xLo > xHi || yLo > yHi) return Vector.empty
    val bx0 = math.max(0L, xLo); val bx1 = math.min(65535L, xHi)
    val by0 = math.max(0L, yLo); val by1 = math.min(65535L, yHi)
    if (bx0 > bx1 || by0 > by1) return Vector.empty
    val out = Vector.newBuilder[(Long, Long)]
    def rec(xPre: Long, yPre: Long, bits: Int): Unit = {
      val shift = 16 - bits
      val side = 1L << shift
      val cx0 = xPre << shift; val cx1 = cx0 + side - 1
      val cy0 = yPre << shift; val cy1 = cy0 + side - 1
      if (cx1 < bx0 || cx0 > bx1 || cy1 < by0 || cy0 > by1) return
      val inside = cx0 >= bx0 && cx1 <= bx1 && cy0 >= by0 && cy1 <= by1
      if (inside || shift <= floorBits) {
        val zBase = z(cx0, cy0)
        out += ((zBase, zBase + side * side - 1))
      } else {
        // children visited in z order keeps the emitted ranges ascending
        var c = 0
        while (c < 4) {
          rec(xPre * 2 + (c & 1), yPre * 2 + (c >> 1), bits + 1)
          c += 1
        }
      }
    }
    rec(0L, 0L, 0)
    val raw = out.result()
    // merge adjacent, then keep only the (maxRanges-1) widest gaps
    val merged = raw.foldLeft(Vector.empty[(Long, Long)]) {
      case (acc :+ last, r) if r._1 <= last._2 + 1 => acc :+ ((last._1, math.max(last._2, r._2)))
      case (acc, r) => acc :+ r
    }
    if (merged.size <= maxRanges) merged
    else {
      val gaps = merged.sliding(2).zipWithIndex.collect {
        case (Vector(a, b), i) => (b._1 - a._2, i)
      }.toVector
      val keep = gaps.sortBy(-_._1).take(maxRanges - 1).map(_._2).toSet
      val res = Vector.newBuilder[(Long, Long)]
      var start = merged.head._1
      var end = merged.head._2
      merged.indices.drop(1).foreach { i =>
        if (keep.contains(i - 1)) { res += ((start, end)); start = merged(i)._1 }
        end = merged(i)._2
      }
      res += ((start, end))
      res.result()
    }
  }
}
