package graft.stats

import graft.agg.Aggregations
import org.apache.commons.math3.analysis.MultivariateFunction
import org.apache.commons.math3.fitting.leastsquares.{
  LeastSquaresBuilder, LevenbergMarquardtOptimizer}
import org.apache.commons.math3.linear.{Array2DRowRealMatrix, ArrayRealVector}
import org.apache.commons.math3.optim.{InitialGuess, MaxEval, SimpleBounds}
import org.apache.commons.math3.optim.nonlinear.scalar.{
  GoalType, ObjectiveFunction}
import org.apache.commons.math3.optim.nonlinear.scalar.noderiv.{
  NelderMeadSimplex, SimplexOptimizer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Driver-side nonlinear calibration fits on commons-math3, mirroring the
  * reference's scipy fits (wind.py:75-93, radiation.py:251-344). The data
  * path stays in Spark: aggregate to small paired frames, collect, fit.
  */
object Fitting {

  /** generic Levenberg-Marquardt least squares with forward-difference
    * jacobian (scipy curve_fit's default algorithm). */
  def leastSquares(model: Array[Double] => Array[Double],
      target: Array[Double], p0: Array[Double],
      maxEval: Int = 10000): Array[Double] = {
    val n = target.length
    val valueFn =
      new org.apache.commons.math3.analysis.MultivariateVectorFunction {
        def value(p: Array[Double]): Array[Double] = model(p)
      }
    val jacobianFn =
      new org.apache.commons.math3.analysis.MultivariateMatrixFunction {
        def value(params: Array[Double]): Array[Array[Double]] = {
          val f0 = model(params)
          val jac = Array.ofDim[Double](n, params.length)
          for (j <- params.indices) {
            val h = math.max(1e-8, math.abs(params(j)) * 1e-8)
            val pj = params.clone(); pj(j) += h
            val fj = model(pj)
            for (i <- 0 until n) jac(i)(j) = (fj(i) - f0(i)) / h
          }
          jac
        }
      }
    val problem = new LeastSquaresBuilder()
      .start(p0)
      .target(target)
      .model(valueFn, jacobianFn)
      .maxEvaluations(maxEval)
      .maxIterations(maxEval)
      .build()
    new LevenbergMarquardtOptimizer().optimize(problem).getPoint.toArray
  }

  /** Nelder-Mead minimization (reference fit_bristow_campbell_params uses
    * scipy minimize on |mean bias|). */
  def nelderMead(f: Array[Double] => Double, p0: Array[Double],
      maxEval: Int = 10000): Array[Double] = {
    val opt = new SimplexOptimizer(1e-12, 1e-12)
    opt.optimize(
      new MaxEval(maxEval),
      new ObjectiveFunction(new MultivariateFunction {
        def value(p: Array[Double]): Double = f(p)
      }),
      GoalType.MINIMIZE,
      new InitialGuess(p0),
      new NelderMeadSimplex(p0.length)).getPoint
  }

  private def cosineWindCore(daily: Array[Double], hrs: Array[Double],
      obs: Array[Double]): Array[Double] =
    leastSquares(
      p => daily.indices.map { i =>
        p(0) * daily(i) * math.cos(math.Pi * (hrs(i) - p(2)) / 12.0) +
          p(1) * daily(i)
      }.toArray,
      obs, Array(1.0, 1.0, 1.0))

  /** fit_cosine_function (wind.py:75-93): fit (a, b, t_shift) of
    * a·w̄·cos(π(t−t_shift)/12) + b·w̄ against observed hourly wind.
    * `hourlyWind`: (timestamp, wind). */
  def fitCosineWind(hourlyWind: DataFrame): (Double, Double, Double) = {
    val paired = hourlyWind
      .withColumn("date", to_date(col("timestamp")))
      .withColumn("h", hour(col("timestamp")))
      .groupBy(col("date"))
      .agg(avg(col("wind")).as("daily"))
      .join(hourlyWind.withColumn("date", to_date(col("timestamp"))),
        "date")
      .where(col("wind").isNotNull && col("daily").isNotNull)
      .select(col("daily"), hour(col("timestamp")).cast("double").as("h"),
        col("wind"))
      .collect()
    val res = cosineWindCore(paired.map(_.getDouble(0)),
      paired.map(_.getDouble(1)), paired.map(_.getDouble(2)))
    (res(0), res(1), res(2))
  }

  /** Per-station fit_cosine_function at fleet scale: one LM fit per
    * station, run INSIDE the executors via groupByKey + mapGroups — no
    * driver collect, stations fit in parallel across the cluster. Each
    * task holds one station's paired hourly series (bounded: decades of
    * hourly data per station is <1M rows). Returns one row per station:
    * (stationCols..., a, b, t_shift). Station key columns are treated
    * as strings (they are IDs); values must not contain U+0001. */
  def fitCosineWindByStation(hourlyWind: DataFrame,
      stationCols: Seq[String]): DataFrame = {
    require(stationCols.nonEmpty, "stationCols must be non-empty")
    val spark = hourlyWind.sparkSession
    import spark.implicits._
    val sep = "\u0001"
    val withDate = hourlyWind
      .withColumn("date", to_date(col("timestamp")))
    val daily = withDate
      .groupBy(stationCols.map(col) :+ col("date"): _*)
      .agg(avg(col("wind")).as("daily"))
    val paired = withDate.join(daily, stationCols :+ "date")
      .where(col("wind").isNotNull && col("daily").isNotNull)
      .select(concat_ws(sep, stationCols.map(col): _*).as("k"),
        col("daily"), hour(col("timestamp")).cast("double").as("h"),
        col("wind"))
      .as[(String, Double, Double, Double)]
    val fitted = paired.groupByKey(_._1).mapGroups { (k, it) =>
      val rows = it.toArray
      val res = cosineWindCore(rows.map(_._2), rows.map(_._3),
        rows.map(_._4))
      (k, res(0), res(1), res(2))
    }.toDF("k", "a", "b", "t_shift")
    val restored = stationCols.zipWithIndex.foldLeft(fitted) {
      case (d, (c, i)) => d.withColumn(c, split(col("k"), sep)(i))
    }
    restored.select(stationCols.map(col) ++
      Seq(col("a"), col("b"), col("t_shift")): _*)
  }

  /** Shared per-station fit skeleton: rows reduced to double vectors,
    * grouped by the concatenated station key, fitted INSIDE the
    * executors (one task per station, stations in parallel), key split
    * back into columns. Station key columns are treated as strings and
    * must not contain U+0001. */
  private def perStation(df: DataFrame, stationCols: Seq[String],
      fields: Seq[org.apache.spark.sql.Column], outNames: Seq[String])(
      fit: Array[Array[Double]] => Array[Double]): DataFrame = {
    require(stationCols.nonEmpty, "stationCols must be non-empty")
    val spark = df.sparkSession
    import spark.implicits._
    val sep = "\u0001"
    val keyed = df
      .select(concat_ws(sep, stationCols.map(col): _*).as("k"),
        array(fields.map(_.cast("double")): _*).as("vals"))
      .as[(String, Array[Double])]
    val fitted = keyed.groupByKey(_._1).mapGroups { (k, it) =>
      (k, fit(it.map(_._2).toArray))
    }.toDF("k", "p")
    val withOut = outNames.zipWithIndex.foldLeft(fitted) {
      case (d, (n, i)) => d.withColumn(n, col("p")(i))
    }
    val restored = stationCols.zipWithIndex.foldLeft(withOut) {
      case (d, (c, i)) => d.withColumn(c, split(col("k"), sep)(i))
    }
    restored.select(stationCols.map(col) ++ outNames.map(col): _*)
  }

  private def angstroemCore(ssd: Array[Double], dl: Array[Double],
      pot: Array[Double], obs: Array[Double]): (Double, Double) = {
    val res = leastSquares(
      p => ssd.indices.map(i =>
        (p(0) + p(1) * ssd(i) / dl(i)) * pot(i)).toArray,
      obs, Array(0.25, 0.75))
    (res(0), res(1))
  }

  /** fit_angstroem_params (radiation.py:314-344): least squares of
    * (a + b·ssd/daylen)·pot against observed daily radiation — linear in
    * (a, b), solved by LM like scipy from p0=(0.25, 0.75). Input frame
    * needs columns ssd, daylength, pot, obs. */
  def fitAngstroem(daily: DataFrame): (Double, Double) = {
    val rows = daily
      .where(col("ssd").isNotNull && col("daylength").isNotNull &&
        col("pot").isNotNull && col("obs").isNotNull)
      .select(col("ssd"), col("daylength"), col("pot"), col("obs"))
      .collect()
    angstroemCore(rows.map(_.getDouble(0)), rows.map(_.getDouble(1)),
      rows.map(_.getDouble(2)), rows.map(_.getDouble(3)))
  }

  /** Per-station Angstroem fit on executors — one LM fit per station
    * via mapGroups, no driver collect. Input needs stationCols + ssd,
    * daylength, pot, obs. Returns (stationCols..., a, b). */
  def fitAngstroemByStation(daily: DataFrame, stationCols: Seq[String])
      : DataFrame =
    perStation(
      daily.where(col("ssd").isNotNull && col("daylength").isNotNull &&
        col("pot").isNotNull && col("obs").isNotNull),
      stationCols,
      Seq(col("ssd"), col("daylength"), col("pot"), col("obs")),
      Seq("a", "b")) { rows =>
      val (a, b) = angstroemCore(rows.map(_(0)), rows.map(_(1)),
        rows.map(_(2)), rows.map(_(3)))
      Array(a, b)
    }

  /** fit_bristow_campbell_params (radiation.py:251-280): minimize
    * |mean(bc(tmin, tmax, pot, A, C) − obs)| from (0.75, 2.4). The B term
    * uses monthly mean ΔT exactly like the forward model. Input frame
    * needs columns date, tmin, tmax, pot, obs (complete pairs only). */
  def fitBristowCampbell(daily: DataFrame): (Double, Double) = {
    val rows = daily
      .where(col("tmin").isNotNull && col("tmax").isNotNull &&
        col("pot").isNotNull && col("obs").isNotNull)
      .orderBy(col("date"))
      .select(col("date"), col("tmin"), col("tmax"), col("pot"),
        col("obs"), month(col("date")).as("m"))
      .collect()
    bristowCore(rows.map(_.getDate(0).toLocalDate),
      rows.map(_.getDouble(1)), rows.map(_.getDouble(2)),
      rows.map(_.getDouble(3)), rows.map(_.getDouble(4)),
      rows.map(_.getInt(5)))
  }

  /** Per-station Bristow-Campbell fit on executors (mapGroups, no
    * driver collect). Input needs stationCols + date, tmin, tmax, pot,
    * obs. Returns (stationCols..., A, C). */
  def fitBristowCampbellByStation(daily: DataFrame,
      stationCols: Seq[String]): DataFrame =
    perStation(
      daily.where(col("tmin").isNotNull && col("tmax").isNotNull &&
        col("pot").isNotNull && col("obs").isNotNull),
      stationCols,
      Seq(datediff(col("date"), lit("1970-01-01")), col("tmin"),
        col("tmax"), col("pot"), col("obs"), month(col("date"))),
      Seq("A", "C")) { unsorted =>
      val rows = unsorted.sortBy(_(0))
      val (a, c) = bristowCore(
        rows.map(r => java.time.LocalDate.ofEpochDay(r(0).toLong)),
        rows.map(_(1)), rows.map(_(2)), rows.map(_(3)), rows.map(_(4)),
        rows.map(_(5).toInt))
      Array(a, c)
    }

  /** Distributed CLOSED-FORM least squares of `y` on (1, x1, x2) —
    * unlike the collect-and-optimize fits above, this one never
    * collects data: the 3×3 normal-equation Gram matrix is NINE exact
    * integer sums computed in ONE map-side-combined aggregation over
    * the full frame, and only that single row reaches the driver. At
    * 100 TB the plan is a scan + one 9-column partial-agg reduce —
    * the cheapest possible shape for model fitting.
    *
    * Inputs must be integral columns (micro-quantized upstream);
    * per-row products are computed in long (callers keep |x|,|y|
    * below ~3e9 so products fit) and summed in decimal(38,0), so the
    * sums are EXACT at any row count and the derived weights are
    * bit-reproducible across partitionings and engines: both sides
    * convert the same exact integers to doubles and run the same
    * fixed-order Cramer formulas. `ridge` adds to the x1/x2 diagonal
    * (intercept unpenalized).
    *
    * Returns (b0, b1, b2): yhat = b0 + b1·x1 + b2·x2. */
  def fitPlaneMicro(df: DataFrame, x1Col: String, x2Col: String,
      yCol: String, ridge: Double = 0.0): (Double, Double, Double) = {
    val x1 = col(x1Col).cast("long")
    val x2 = col(x2Col).cast("long")
    val y = col(yCol).cast("long")
    def dsum(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(38,0)"))
    val r = df.agg(
      count(lit(1)).as("n"),
      dsum(x1).as("sx1"), dsum(x2).as("sx2"), dsum(y).as("sy"),
      dsum(x1 * x1).as("s11"), dsum(x1 * x2).as("s12"),
      dsum(x2 * x2).as("s22"),
      dsum(x1 * y).as("s1y"), dsum(x2 * y).as("s2y")).head()
    val n = r.getLong(0).toDouble
    def d(i: Int) = r.getDecimal(i).doubleValue()
    val (sx1, sx2, sy) = (d(1), d(2), d(3))
    val s11 = d(4) + ridge
    val s12 = d(5)
    val s22 = d(6) + ridge
    val (s1y, s2y) = (d(7), d(8))
    // Cramer's rule in a FIXED operation order — the DuckDB oracle
    // spells out the same expressions, so the doubles agree bit-for-bit
    val det = n * (s11 * s22 - s12 * s12) -
      sx1 * (sx1 * s22 - s12 * sx2) + sx2 * (sx1 * s12 - s11 * sx2)
    require(det != 0.0,
      "singular normal equations — x1/x2 are collinear or constant")
    val b0 = (sy * (s11 * s22 - s12 * s12) -
      sx1 * (s1y * s22 - s12 * s2y) + sx2 * (s1y * s12 - s11 * s2y)) / det
    val b1 = (n * (s1y * s22 - s12 * s2y) -
      sy * (sx1 * s22 - s12 * sx2) + sx2 * (sx1 * s2y - s1y * sx2)) / det
    val b2 = (n * (s11 * s2y - s1y * s12) -
      sx1 * (sx1 * s2y - s1y * sx2) + sy * (sx1 * s12 - s11 * sx2)) / det
    (b0, b1, b2)
  }

  private def bristowCore(dates: Array[java.time.LocalDate],
      tmin: Array[Double], tmax: Array[Double], pot: Array[Double],
      obs: Array[Double], mon: Array[Int]): (Double, Double) = {
    val n = dates.length
    // tmin_nextday on the calendar; last row self-fills
    val byDate = dates.zipWithIndex.toMap
    val tminNext = Array.tabulate(n) { i =>
      byDate.get(dates(i).plusDays(1)).map(tmin).getOrElse(
        if (i == n - 1) tmin(i) else Double.NaN)
    }
    val dT = Array.tabulate(n)(i => tmax(i) - (tmin(i) + tminNext(i)) / 2)
    val mAvg = (1 to 12).map { m =>
      val xs = dT.indices.filter(i => mon(i) == m && !dT(i).isNaN)
      m -> (if (xs.isEmpty) Double.NaN
            else xs.map(dT).sum / xs.length)
    }.toMap
    def bias(p: Array[Double]): Double = {
      val diffs = (0 until n).flatMap { i =>
        val b = 0.036 * math.exp(-0.154 * mAvg(mon(i)))
        val trans = p(0) * (1 - math.exp(-b * math.pow(dT(i), p(1))))
        val r0 = trans * pot(i)
        if (r0.isNaN || obs(i).isNaN) None else Some(r0 - obs(i))
      }
      math.abs(diffs.sum / diffs.length)
    }
    val res = nelderMead(bias, Array(0.75, 2.4))
    (res(0), res(1))
  }
}
