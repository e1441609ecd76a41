package graft.s2

import org.scalatest.funsuite.AnyFunSuite

/** Coverer ACCURACY (not just validity): the reference documents median
  * covering-area / region-area ratios over random spherical caps
  * (`S2RegionCoverer.cs:163-173`): max_cells 4 -> 3.32, 8 -> 1.98,
  * 12 -> 1.66. This spec reproduces the experiment (1000 seeded
  * log-uniform-area caps) and requires our medians within 1.5x of the
  * reference table — a coverer that is valid but sloppy (e.g. stops
  * subdividing too early) fails here. */
class CovererAccuracySpec extends AnyFunSuite {

  private val RefMedian = Map(4 -> 3.32, 8 -> 1.98, 12 -> 1.66)

  private def randomCaps(n: Int, seed: Long): Seq[S2Cap] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n) {
      val v = S2Point.normalize(S2Point(rnd.nextGaussian(), rnd.nextGaussian(), rnd.nextGaussian()))
      // area log-uniform over ~7 decades, from tiny caps up to ~0.4 sr
      val area = 4 * math.Pi * math.pow(10, -(rnd.nextDouble() * 7) - 1)
      val angle = math.acos(math.max(-1.0, 1.0 - area / (2 * math.Pi)))
      S2Cap.fromAxisAngle(v, angle)
    }
  }

  test("median covering area ratio within 1.5x of the reference table") {
    val caps = randomCaps(1000, seed = 20260817L)
    for ((maxCells, refMedian) <- RefMedian) {
      val coverer = new S2RegionCoverer().setMaxCells(maxCells)
      val ratios = caps.map { cap =>
        coverer.getCoveringUnion(cap).exactArea / cap.area
      }.sorted
      val median = ratios(ratios.size / 2)
      info(f"max_cells=$maxCells%2d median ratio = $median%.2f (reference $refMedian%.2f)")
      assert(median >= 1.0, s"covering smaller than the region at maxCells=$maxCells")
      assert(median <= refMedian * 1.5,
        f"median ratio $median%.2f exceeds 1.5x reference $refMedian%.2f at maxCells=$maxCells")
    }
  }
}
