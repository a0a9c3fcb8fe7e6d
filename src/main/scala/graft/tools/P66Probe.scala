package graft.tools

import graft.operators.Multimodal

/** Fixture-design probe for p66 (the NONZERO-hamming perceptual-hash
  * oracle row): sweeps (step, delta) perturbation parameters over the
  * candidate fixture family and prints, per parameter point, the
  * distribution of pHash hamming distances across the planted pairs —
  * the evidence the committed `perturbedPHashFixture` constants and
  * the pinned per-pair distances in p66's oracle were derived from.
  * Pure function work (no SparkSession): [[Multimodal.pHash64]] is
  * StrictMath bit-stable, so the distances printed here are the
  * distances every JVM computes forever.
  *
  * Run: sbt "runMain graft.tools.P66Probe [nPairs]"
  */
object P66Probe {

  // splitmix64 finalizer — the probe's local copy of the fixture mixer
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Candidate fixture: doc 2k = texture in [0,192); doc 2k+1 = same
    * texture with +delta on every `step`-th pixel (no clamping:
    * 191 + delta must stay <= 255). Texture seed space offset by
    * 0x700000000L so p66 textures are independent of p63's. */
  def gen(id: Long, step: Int, delta: Int): Array[Byte] = {
    val w = 32; val h = 32
    val rgb = new Array[Byte](w * h * 3)
    val bump = if (id % 2 == 1) delta else 0
    var idx = 0
    while (idx < w * h) {
      val base = ((mix64(0x700000000L + (id / 2) * 4096L + idx) >>> 16) % 192).toInt
      val v = (base + (if (idx % step == 0) bump else 0)).toByte
      rgb(3 * idx) = v; rgb(3 * idx + 1) = v; rgb(3 * idx + 2) = v
      idx += 1
    }
    Multimodal.encodeBmp(w, h, rgb)
  }

  def main(args: Array[String]): Unit = {
    val nPairs = if (args.nonEmpty) args(0).toInt else 100
    for (step <- Seq(23, 37, 53, 97); delta <- Seq(8, 16, 24, 32, 48)) {
      val dists = (0 until nPairs).map { k =>
        val a = Multimodal.pHash64(gen(2L * k, step, delta)).get
        val b = Multimodal.pHash64(gen(2L * k + 1, step, delta)).get
        java.lang.Long.bitCount(a ^ b)
      }
      val hist = dists.groupBy(identity).view.mapValues(_.size).toMap
      val in13 = dists.count(d => d >= 1 && d <= 3)
      println(f"step=$step%3d delta=$delta%2d  in[1..3]=$in13%3d  " +
        hist.toSeq.sortBy(_._1).map { case (d, n) => s"$d:$n" }.mkString(" "))
    }
    // the committed fixture parameters: full per-pair evidence
    val (step, delta) = (53, 32)
    val dists = (0 until nPairs).map { k =>
      val a = Multimodal.pHash64(gen(2L * k, step, delta)).get
      val b = Multimodal.pHash64(gen(2L * k + 1, step, delta)).get
      k -> java.lang.Long.bitCount(a ^ b)
    }
    println(s"pinned params step=$step delta=$delta over $nPairs pairs:")
    println("dists per k: " + dists.map(_._2).mkString(","))
    println("qualifying d1 ids (dist in 1..3): " +
      dists.filter(d => d._2 >= 1 && d._2 <= 3)
        .map(d => 2 * d._1).mkString(", "))
  }
}
