package graft.stats

import graft.cascade.CascadeStatistics
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Station calibration parameters with a JSON representation that is
  * byte-compatible with the reference's StationStatistics.to_json/from_json
  * (melodist/stationstatistics.py:194-288): same keys, same pandas
  * to_json shapes (column-oriented frames keyed by stringified labels,
  * MultiIndex reset to level_0/level_1/level_2 columns). */
final case class WindStats(a: Option[Double], b: Option[Double],
    tShift: Option[Double])

final case class HumStats(a0: Option[Double], a1: Option[Double],
    kr: Option[Int],
    monthHourPrecipMean: Option[Seq[(Int, Int, Boolean, Double)]])

final case class TempStats(maxDelta: Option[Map[Int, Double]],
    meanCourse: Option[Map[(Int, Int), Double]])

final case class GlobStats(angstroem: Map[Int, (Double, Double)],
    bristcamp: Map[Int, (Double, Double)],
    meanCourse: Option[Map[(Int, Int), Double]])

final case class PrecipStats(months: Option[Seq[Seq[Int]]],
    stats: Option[Seq[Either[CascadeStatistics, Seq[CascadeStatistics]]]])

final case class StationStats(temp: TempStats, wind: WindStats,
    precip: PrecipStats, hum: HumStats, glob: GlobStats) {
  def toJsonString: String = StationStats.write(this)
  def writeJson(path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      toJsonString)
}

object StationStats {

  def default: StationStats = StationStats(
    TempStats(None, None), WindStats(None, None, None),
    PrecipStats(None, None), HumStats(None, None, None, None),
    GlobStats((1 to 12).map(_ -> (0.25, 0.75)).toMap,
      (1 to 12).map(_ -> (0.75, 2.4)).toMap, None))

  // ------------------------------------------------------------- writing

  private def jnum(d: Double): JValue =
    if (d.isNaN) JNull else JDouble(d)

  /** pandas Series.to_json: {"label": value} */
  private def series(m: Map[Int, Double]): JValue =
    JObject(m.toSeq.sortBy(_._1).map { case (k, v) =>
      k.toString -> jnum(v) }: _*)

  /** pandas DataFrame.to_json (columns orient): month -> hour -> value */
  private def courseJson(mc: Map[(Int, Int), Double]): JValue =
    JObject((1 to 12).map { m =>
      m.toString -> JObject((0 to 23).map { h =>
        h.toString -> jnum(mc.getOrElse((m, h), Double.NaN)) }: _*)
    }: _*)

  private def paramFrame(m: Map[Int, (Double, Double)], c1: String,
      c2: String): JValue =
    JObject(
      c1 -> JObject(m.toSeq.sortBy(_._1).map { case (k, v) =>
        k.toString -> jnum(v._1) }: _*),
      c2 -> JObject(m.toSeq.sortBy(_._1).map { case (k, v) =>
        k.toString -> jnum(v._2) }: _*))

  private def cascJson(c: CascadeStatistics): JValue = JObject(
    "p01" -> arr2(c.p01), "p10" -> arr2(c.p10), "pxx" -> arr2(c.pxx),
    "wxx" -> JArray(c.wxx.map(arr2).toList),
    "threshold" -> JArray(c.threshold.map(jnum).toList),
    "percentile" ->
      (if (c.percentile == c.percentile.floor) JInt(c.percentile.toInt)
       else JDouble(c.percentile)))

  private def arr2(a: Array[Array[Double]]): JValue =
    JArray(a.map(row => JArray(row.map(jnum).toList)).toList)

  def write(s: StationStats): String = {
    val mhpm: JValue = s.hum.monthHourPrecipMean.map { entries =>
      val sorted = entries.sortBy(e => (e._1, e._2, e._3))
      JObject(
        "level_0" -> JObject(sorted.zipWithIndex.map { case (e, i) =>
          i.toString -> (JInt(e._1): JValue) }: _*),
        "level_1" -> JObject(sorted.zipWithIndex.map { case (e, i) =>
          i.toString -> (JInt(e._2): JValue) }: _*),
        "level_2" -> JObject(sorted.zipWithIndex.map { case (e, i) =>
          i.toString -> (JBool(e._3): JValue) }: _*),
        "hum" -> JObject(sorted.zipWithIndex.map { case (e, i) =>
          i.toString -> jnum(e._4) }: _*))
    }.getOrElse(JNull)

    val stats: JValue = s.precip.stats.map { seq =>
      JArray(seq.map {
        case Left(c) => cascJson(c)
        case Right(list) => JArray(list.map(cascJson).toList)
      }.toList)
    }.getOrElse(JNull)

    val j = JObject(
      "temp" -> JObject(
        "max_delta" -> s.temp.maxDelta.map(series).getOrElse(JNull),
        "mean_course" -> s.temp.meanCourse.map(courseJson)
          .getOrElse(JNull)),
      "wind" -> JObject(
        "a" -> s.wind.a.map(jnum).getOrElse(JNull),
        "b" -> s.wind.b.map(jnum).getOrElse(JNull),
        "t_shift" -> s.wind.tShift.map(jnum).getOrElse(JNull)),
      "precip" -> JObject(
        "months" -> s.precip.months.map(m => JArray(m.map(season =>
          JArray(season.map(x => JInt(x): JValue).toList)).toList))
          .getOrElse(JNull),
        "stats" -> stats),
      "hum" -> JObject(
        "a0" -> s.hum.a0.map(jnum).getOrElse(JNull),
        "a1" -> s.hum.a1.map(jnum).getOrElse(JNull),
        "kr" -> s.hum.kr.map(k => JInt(k): JValue).getOrElse(JNull),
        "month_hour_precip_mean" -> mhpm),
      "glob" -> JObject(
        "angstroem" -> paramFrame(s.glob.angstroem, "a", "b"),
        "bristcamp" -> paramFrame(s.glob.bristcamp, "a", "c"),
        "mean_course" -> s.glob.meanCourse.map(courseJson)
          .getOrElse(JNull)))
    JsonMethods.pretty(JsonMethods.render(j))
  }

  // ------------------------------------------------------------- reading

  private def dbl(v: JValue): Double = v match {
    case JDouble(d) => d
    case JInt(i) => i.toDouble
    case JDecimal(d) => d.toDouble
    case JLong(l) => l.toDouble
    case JNull => Double.NaN
    case other => throw new IllegalArgumentException(s"not a number: $other")
  }

  private def optDbl(v: JValue): Option[Double] = v match {
    case JNull | JNothing => None
    case x => Some(dbl(x))
  }

  private def readSeries(v: JValue): Option[Map[Int, Double]] = v match {
    case JObject(fields) =>
      Some(fields.map { case (k, x) => k.toInt -> dbl(x) }.toMap)
    case _ => None
  }

  private def readCourse(v: JValue): Option[Map[(Int, Int), Double]] =
    v match {
      case JObject(cols) => Some(cols.flatMap {
        case (m, JObject(rows)) =>
          rows.map { case (h, x) => (m.toInt, h.toInt) -> dbl(x) }
        case _ => Nil
      }.toMap)
      case _ => None
    }

  private def readParamFrame(v: JValue, c1: String, c2: String)
      : Map[Int, (Double, Double)] = v match {
    case obj: JObject =>
      val m1 = readSeries(obj \ c1).getOrElse(Map.empty)
      val m2 = readSeries(obj \ c2).getOrElse(Map.empty)
      m1.keySet.intersect(m2.keySet).map(k => k -> (m1(k), m2(k))).toMap
    case _ => Map.empty
  }

  private def readCasc(j: JValue): CascadeStatistics = {
    def a2(v: JValue): Array[Array[Double]] = v match {
      case JArray(rows) => rows.map {
        case JArray(xs) => xs.map(dbl).toArray
        case _ => Array.empty[Double]
      }.toArray
      case _ => Array.empty
    }
    val wxx = (j \ "wxx") match {
      case JArray(ks) => ks.map(a2).toArray
      case _ => Array.empty[Array[Array[Double]]]
    }
    val thr = (j \ "threshold") match {
      case JArray(xs) => xs.map(dbl).toArray
      case _ => Array.empty[Double]
    }
    CascadeStatistics(a2(j \ "p01"), a2(j \ "p10"), a2(j \ "pxx"), wxx,
      thr, dbl(j \ "percentile"))
  }

  def parse(json: String): StationStats = {
    val j = JsonMethods.parse(json)

    val mhpm: Option[Seq[(Int, Int, Boolean, Double)]] =
      (j \ "hum" \ "month_hour_precip_mean") match {
        case JObject(_) =>
          val node = j \ "hum" \ "month_hour_precip_mean"
          def column(name: String): Map[String, JValue] = (node \ name) match {
            case JObject(fields) => fields.toMap
            case _ => Map.empty
          }
          val l0 = column("level_0"); val l1 = column("level_1")
          val l2 = column("level_2")
          // value column carries the series name (usually "hum"): the one
          // remaining key
          val valueCol = node match {
            case JObject(fields) => fields.collectFirst {
              case (k, _) if !k.startsWith("level_") => k
            }.getOrElse("hum")
            case _ => "hum"
          }
          val vals = column(valueCol)
          Some(l0.keys.toSeq.sortBy(_.toInt).map { i =>
            (dbl(l0(i)).toInt, dbl(l1(i)).toInt,
              l2(i) match {
                case JBool(b) => b
                case other => dbl(other) != 0.0
              }, dbl(vals(i)))
          })
        case _ => None
      }

    val stats: Option[Seq[Either[CascadeStatistics,
        Seq[CascadeStatistics]]]] =
      (j \ "precip" \ "stats") match {
        case JArray(items) => Some(items.map {
          case arr: JArray => Right(arr.arr.map(readCasc))
          case obj => Left(readCasc(obj))
        })
        case _ => None
      }

    val months: Option[Seq[Seq[Int]]] = (j \ "precip" \ "months") match {
      case JArray(items) => Some(items.map {
        case JArray(xs) => xs.map(x => dbl(x).toInt)
        case _ => Nil
      })
      case _ => None
    }

    StationStats(
      temp = TempStats(readSeries(j \ "temp" \ "max_delta"),
        readCourse(j \ "temp" \ "mean_course")),
      wind = WindStats(optDbl(j \ "wind" \ "a"), optDbl(j \ "wind" \ "b"),
        optDbl(j \ "wind" \ "t_shift")),
      precip = PrecipStats(months, stats),
      hum = HumStats(optDbl(j \ "hum" \ "a0"), optDbl(j \ "hum" \ "a1"),
        optDbl(j \ "hum" \ "kr").map(_.toInt), mhpm),
      glob = GlobStats(
        readParamFrame(j \ "glob" \ "angstroem", "a", "b"),
        readParamFrame(j \ "glob" \ "bristcamp", "a", "c"),
        readCourse(j \ "glob" \ "mean_course")))
  }

  def readJson(path: String): StationStats = {
    val src = scala.io.Source.fromFile(path)
    try parse(src.mkString) finally src.close()
  }
}
