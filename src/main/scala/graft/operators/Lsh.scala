package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Deterministic random-hyperplane generation for sign-LSH over embeddings.
  *
  * Components are derived from md5 of a fixed seed string, so signatures are
  * reproducible across runs, engines, and cluster sizes — no RNG state to
  * ship to executors (the planes are tiny plan-time literals).
  */
object Lsh {
  private def md5Int(s: String): Int = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) |
      ((d(2) & 0xff) << 8) | (d(3) & 0xff)
  }

  /** `numPlanes` hyperplanes of dimension `dim`, components in [-1, 1). */
  def hyperplanes(numPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(numPlanes, dim) { (h, j) =>
      md5Int(s"graft-lsh:$h:$j").toDouble / Int.MaxValue.toDouble
    }
}
