package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Property pins for the metric-uncertainty trio (q391 ANOVA,
  * q392 block jackknife, q393 deterministic Poisson bootstrap): every
  * fixed-point number in each output is recomputed from the raw events
  * fixture with BigInt arithmetic — the same defined truncations, none
  * of the engine's code paths. */
class UncertaintySpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  private def cents(v: Double): Long = math.floor(v * 100.0 + 0.5).toLong

  private def md5U32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  private def events(): Array[(String, Long, java.sql.Date, Long)] =
    graft.Tables.load(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        to_date(col("ts")).as("day"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDate(2),
        cents(r.getDouble(3))))

  test("q391: every fixed-point cell recomputes from raw data, and the " +
    "sum-of-squares identity closes exactly on the defined truncations") {
    val ev = events()
    val byG = ev.groupBy(_._1).map { case (g, rs) =>
      val n = BigInt(rs.length)
      val s = rs.map(r => BigInt(r._4)).sum
      val q = rs.map(r => BigInt(r._4) * r._4).sum
      (g, (n, s, q, (s * s) / n))
    }
    val n = byG.values.map(_._1).sum
    val s = byG.values.map(_._2).sum
    val q = byG.values.map(_._3).sum
    val sumSsg = byG.values.map(_._4).sum
    val k = BigInt(byG.size)
    val ssb = sumSsg - (s * s) / n
    val ssw = q - sumSsg
    val f = BigInt(1000000) * ssb * (n - k) / ((k - 1) * ssw)
    val got = graft.SparkEntry.queries("q391_anova_f")(spark, sf)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8)))).toMap
    assert(got.keySet == byG.keySet, s"group sets differ: ${got.keySet}")
    byG.foreach { case (g, (ng, sg, _, _)) =>
      val w = got(g)
      assert(w._1 == ng.toLong && w._2 == sg.toLong &&
        w._3 == (BigInt(100) * sg / ng).toLong,
        s"group $g per-group stats diverge: $w")
      assert(w._4 == ssb.toLong && w._5 == ssw.toLong &&
        w._6 == (k - 1).toLong && w._7 == (n - k).toLong &&
        w._8 == f.toLong,
        s"group $g global stats diverge: $w vs ($ssb, $ssw, $f)")
    }
    // the decomposition must close: SSB + SSW = ΣX² − ⌊S²/n⌋ exactly
    assert(ssb + ssw == q - (s * s) / n, "SS identity broken")
    assert(ssb > 0 && ssw > 0, s"degenerate fixture: ssb=$ssb ssw=$ssw")
  }

  test("q392: every leave-one-day-out estimate and the jackknife " +
    "variance recompute from raw data; day totals conserve") {
    val ev = events()
    val byD = ev.groupBy(_._3.toString).map { case (d, rs) =>
      (d, (BigInt(rs.length), rs.map(r => BigInt(r._4)).sum))
    }
    val n = byD.values.map(_._1).sum
    val s = byD.values.map(_._2).sum
    val g = BigInt(byD.size)
    val dels = byD.map { case (d, (nd, sd)) =>
      (d, (BigInt(10000) * (s - sd)) / (n - nd))
    }
    val bar = dels.values.sum / g
    val jkVar = (g - 1) * dels.values.map(t => (t - bar) * (t - bar)).sum / g
    val theta = BigInt(10000) * s / n
    val got = graft.SparkEntry.queries("q392_jackknife_day")(spark, sf)
      .collect()
      .map(r => (r.getDate(0).toString, (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet == byD.keySet, s"day sets differ: ${got.size}")
    assert(got.size >= 10, s"too few blocks for a jackknife: ${got.size}")
    byD.foreach { case (d, (nd, sd)) =>
      val w = got(d)
      assert(w._1 == nd.toLong && w._2 == sd.toLong,
        s"day $d totals diverge: $w")
      assert(w._3 == dels(d).toLong, s"day $d theta_del diverges: $w")
      assert(w._4 == theta.toLong && w._5 == g.toLong &&
        w._6 == jkVar.toLong,
        s"day $d global stats diverge: $w vs ($theta, $g, $jkVar)")
    }
    assert(jkVar > 0, "degenerate fixture: zero jackknife variance")
  }

  test("q394: trimmed and winsorized means recompute from a plain " +
    "sort of the raw cents; cuts are the exact order statistics") {
    val ev = events()
    val got = graft.SparkEntry.queries("q394_trimmed_mean")(spark, sf)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))).toMap
    val byG = ev.groupBy(_._1)
    assert(got.keySet == byG.keySet)
    byG.foreach { case (g, rs) =>
      val xs = rs.map(_._4).sorted
      val n = xs.length
      val k = n / 20
      assert(k >= 1, s"group $g too small to trim: n=$n")
      val loCut = xs(k)
      val hiCut = xs(n - k - 1)
      val s0 = xs.map(BigInt(_)).sum
      val ts = xs.slice(k, n - k).map(BigInt(_)).sum
      val ws = ts + BigInt(k) * loCut + BigInt(k) * hiCut
      val want = (n.toLong, k.toLong, loCut, hiCut,
        (BigInt(10000) * s0 / n).toLong,
        (BigInt(10000) * ts / (n - 2 * k)).toLong,
        (BigInt(10000) * ws / n).toLong)
      assert(got(g) == want, s"group $g diverges: ${got(g)} vs $want")
      // a robust mean must land inside its own cut window
      assert(got(g)._6 >= 10000L * loCut && got(g)._6 <= 10000L * hiCut,
        s"group $g trimmed mean outside [lo_cut, hi_cut]")
    }
  }

  test("q395: every pair's tie-corrected U and z² recompute from " +
    "doubled midranks over a plain sort; U is antisymmetric-bounded") {
    val ev = events()
    val got = graft.SparkEntry.queries("q395_mann_whitney")(spark, sf)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val byG = ev.groupBy(_._1).map { case (g, rs) => (g, rs.map(_._4)) }
    val want = (for {
      ta <- byG.keys; tb <- byG.keys if ta < tb
    } yield {
      val (as, bs) = (byG(ta), byG(tb))
      val merged = (as ++ bs).groupBy(identity)
        .map { case (v, vs) => (v, vs.length.toLong) }.toSeq.sortBy(_._1)
      var below = 0L
      var r12 = BigInt(0)
      var ties = BigInt(0)
      val na = as.length.toLong
      val nb = bs.length.toLong
      val aCount = as.groupBy(identity).map { case (v, vs) =>
        (v, vs.length.toLong) }
      merged.foreach { case (v, nt) =>
        val r2 = 2 * below + nt + 1
        r12 += BigInt(aCount.getOrElse(v, 0L)) * r2
        ties += BigInt(nt) * nt * nt - nt
        below += nt
      }
      val u2 = r12 - BigInt(na) * (na + 1)
      val n = na + nb
      val den = BigInt(na) * nb *
        (BigInt(n + 1) * n * (n - 1) - ties)
      val delta = u2 - BigInt(na) * nb
      val z2 = BigInt(1000000) * delta * delta * 3 * n * (n - 1) / den
      ((ta, tb), (na, nb, u2.toLong, ties.toLong, z2.toLong))
    }).toMap
    assert(got == want, s"rank-sum census diverges: " +
      s"${(got.toSet -- want.toSet).take(2)} vs " +
      s"${(want.toSet -- got.toSet).take(2)}")
    got.foreach { case ((ta, tb), (na, nb, u2, _, _)) =>
      assert(u2 >= 0L && u2 <= 2L * na * nb,
        s"pair ($ta,$tb) U out of range: $u2")
    }
  }

  test("q393: replicate weights, every replicate mean, and the CI " +
    "envelope recompute from the md5 inverse-CDF; weights average ~1") {
    val ev = events()
    val thresholds =
      Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L, 4279248373L)
    def weight(b: Long, id: Long): Long = {
      val u = md5U32(s"$b:$id")
      thresholds.indexWhere(u < _) match {
        case -1 => 5L
        case i => i.toLong
      }
    }
    val reps = for (b <- 0L until 32L; r <- ev)
      yield (r._1, b, weight(b, r._2), BigInt(r._4))
    // Poisson(1) sanity: the deterministic weights must average ~1
    val wBar = reps.map(_._3).sum.toDouble / reps.size
    assert(wBar > 0.9 && wBar < 1.1, s"weight mean $wBar off Poisson(1)")
    val means = reps.groupBy(t => (t._1, t._2)).toSeq.collect {
      case ((g, _), rs) if rs.map(_._3).sum > 0 =>
        (g, (BigInt(10000) * rs.map(t => t._4 * t._3).sum /
          rs.map(t => BigInt(t._3)).sum))
    }.toSeq
    val want = means.groupBy(_._1).map { case (g, ms) =>
      val vs = ms.map(_._2)
      (g, (vs.min.toLong, vs.max.toLong, ms.size.toLong))
    }
    val byG = ev.groupBy(_._1)
    val got = graft.SparkEntry.queries("q393_poisson_bootstrap")(spark, sf)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == want.keySet, s"group sets differ: ${got.keySet}")
    want.foreach { case (g, (lo, hi, breps)) =>
      val w = got(g)
      val rs = byG(g)
      val point = BigInt(10000) * rs.map(r => BigInt(r._4)).sum / rs.length
      assert(w._1 == rs.length.toLong && w._2 == point.toLong,
        s"group $g point stats diverge: $w")
      assert(w._3 == lo && w._4 == hi && w._5 == breps,
        s"group $g envelope diverges: $w vs ($lo, $hi, $breps)")
      assert(lo <= hi && breps == 32L,
        s"group $g envelope malformed: ($lo, $hi, $breps)")
      assert(lo < point && point < hi,
        s"group $g point outside its own envelope — resampling " +
          s"degenerate: ($lo, $point, $hi)")
    }
  }
}
