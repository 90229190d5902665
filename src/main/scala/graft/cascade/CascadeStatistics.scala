package graft.cascade

/** Calibrated parameters of the Olsson (1998) microcanonical cascade
  * (reference: melodist/cascade.py:39-160). Matrices are indexed
  * [belowabove (0/1)][boxtype-1 (0..3)]; wxx adds a leading 7-bin weight
  * class axis. Pure driver-side value, broadcast into jobs as literals. */
final case class CascadeStatistics(
    p01: Array[Array[Double]],
    p10: Array[Array[Double]],
    pxx: Array[Array[Double]],
    wxx: Array[Array[Array[Double]]],
    threshold: Array[Double],
    percentile: Double) {

  def scaled(f: Double): CascadeStatistics = copy(
    p01 = p01.map(_.map(_ * f)), p10 = p10.map(_.map(_ * f)),
    pxx = pxx.map(_.map(_ * f)), wxx = wxx.map(_.map(_.map(_ * f))))

  def plus(o: CascadeStatistics): CascadeStatistics = copy(
    p01 = add2(p01, o.p01), p10 = add2(p10, o.p10), pxx = add2(pxx, o.pxx),
    wxx = wxx.zip(o.wxx).map { case (a, b) => add2(a, b) })

  private def add2(a: Array[Array[Double]], b: Array[Array[Double]]) =
    a.zip(b).map { case (x, y) => x.zip(y).map { case (u, v) => u + v } }

  /** cumulative wxx over the class axis (disagg branching CDF). */
  def wxxCum: Array[Array[Array[Double]]] = {
    val cum = Array.ofDim[Double](7, 2, 4)
    for (k <- 0 until 7; b <- 0 until 2; t <- 0 until 4)
      cum(k)(b)(t) = wxx(k)(b)(t) + (if (k > 0) cum(k - 1)(b)(t) else 0.0)
    cum
  }
}

object CascadeStatistics {

  object BoxTypes {
    val dry = 0; val starting = 1; val enclosed = 2; val ending = 3
    val isolated = 4
  }

  /** histogram class bounds exactly as the reference hardcodes them
    * (precipitation.py:145, 465-466) — rounded 4-decimal sevenths. */
  val wClassBounds: Array[Double] =
    Array(0.0, 0.1429, 0.2857, 0.4286, 0.5714, 0.7143, 0.8571, 1.0)
  /** class centers used for x/x draws: bounds[k+1] - 1/14. */
  val wClassCenters: Array[Double] =
    (0 until 7).map(k => wClassBounds(k + 1) - 1.0 / 14.0).toArray

  val defaultThreshold: Array[Double] =
    Array(1.67093133, 2.46694444, 3.66730902, 5.39878419, 8.04924471)

  def zero(percentile: Double = 50): CascadeStatistics = CascadeStatistics(
    Array.ofDim[Double](2, 4), Array.ofDim[Double](2, 4),
    Array.ofDim[Double](2, 4), Array.ofDim[Double](7, 2, 4),
    defaultThreshold.clone(), percentile)

  /** fill_with_sample_data (cascade.py:53-110) — fallback statistics for
    * series too short to calibrate. */
  def sampleData(percentile: Double = 50): CascadeStatistics = {
    val p01 = Array(
      Array(0.576724636119866, 0.238722774405744, 0.166532122130638,
        0.393474644666218),
      Array(0.303345245644811, 0.0490956843857575, 0.0392403031072856,
        0.228441890034704))
    val p10 = Array(
      Array(0.158217002255554, 0.256581140990052, 0.557852226779526,
        0.422638238585814),
      Array(0.0439831163244427, 0.0474928027621488, 0.303675296728195,
        0.217512052135178))
    val pxx = Array(
      Array(0.265058361624580, 0.504696084604205, 0.275615651089836,
        0.183887116747968),
      Array(0.652671638030746, 0.903411512852094, 0.657084400164519,
        0.554046057830118))
    val wxx = Array(
      Array(
        Array(0.188389148850583, 0.0806836453984190, 0.0698113025807722,
          0.0621499191745602),
        Array(0.240993281622128, 0.0831019646519721, 0.0415130545715575,
          0.155284541403192)),
      Array(
        Array(0.190128959522795, 0.129220679033862, 0.0932213021787505,
          0.193080698516532),
        Array(0.196379692358065, 0.108549414860949, 0.0592714297292217,
          0.0421945385836429)),
      Array(
        Array(0.163043672107111, 0.152063537378127, 0.102823783410167,
          0.0906028835221283),
        Array(0.186579466868095, 0.189705690316132, 0.0990207345993082,
          0.107831389238912)),
      Array(
        Array(0.197765724699431, 0.220046257566978, 0.177876233348082,
          0.261288786454262),
        Array(0.123823472714948, 0.220514673922285, 0.102486496386323,
          0.101975538893918)),
      Array(
        Array(0.114435243444815, 0.170857634762767, 0.177327072603662,
          0.135362730582518),
        Array(0.0939211776723413, 0.174291820501902, 0.125275822078525,
          0.150842841725936)),
      Array(
        Array(0.0988683809545079, 0.152323481100248, 0.185606883566286,
          0.167242856061538),
        Array(0.0760275616817939, 0.127275603247149, 0.202466168603738,
          0.186580243138018)),
      Array(
        Array(0.0473688704207573, 0.0948047647595988, 0.193333422312280,
          0.0902721256884624),
        Array(0.0822753470826286, 0.0965608324996108, 0.369966294031327,
          0.255290907016382)))
    CascadeStatistics(p01, p10, pxx, wxx, defaultThreshold.clone(),
      percentile)
  }
}
