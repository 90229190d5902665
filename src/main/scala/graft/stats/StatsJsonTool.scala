package graft.stats

/** CLI: round-trip a stats JSON through the Scala model
  * (`runMain graft.stats.StatsJsonTool in.json out.json`) — used to prove
  * reference interop (its from_json reads our output). */
object StatsJsonTool {
  def main(args: Array[String]): Unit = {
    val Array(in, out) = args
    StationStats.readJson(in).writeJson(out)
  }
}
