package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev-loop filter, exact full names, the same contract as Bench's
    // (a prefix match here would silently verify a wider scope than
    // Bench runs); the driver sets no env, so it always dumps the
    // full registry
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def wanted(name: String) = only.forall(_.contains(name))
    SparkEntry.queries.filter(q => wanted(q._1)).foreach {
      case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
    }
    // q145 forensics: dump the k-means fit provenance (seed ids,
    // per-iteration centroid md5s, final centroids) next to the gate
    // output, so a driver-side hash red localizes to seeding or a
    // specific Lloyd iteration in one diff instead of a multi-round
    // forensic stall. k/iters come from the gate's own definition —
    // the dump can never trace a different model than q145 compares.
    if (wanted("q145_kmeans_clusters")) try {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val (model, trace) = graft.similarity.KMeans.fitTraced(
        emb, "embedding", "vec_id",
        k = graft.queries.SimilarityQueriesImpl.KMeansGateK,
        iters = graft.queries.SimilarityQueriesImpl.KMeansGateIters)
      val dbg = new StringBuilder
      dbg ++= "{\"seed_ids\": ["
      dbg ++= trace.seedIds.map(s => "\"" + s + "\"").mkString(", ")
      dbg ++= "], \"centroid_md5s\": ["
      dbg ++= trace.centroidMd5s.map(h => "\"" + h + "\"")
        .mkString(", ")
      dbg ++= "], \"final_centroids\": ["
      dbg ++= model.centroids
        .map(c => c.mkString("[", ",", "]")).mkString(", ")
      dbg ++= "]}"
      Files.writeString(Paths.get(s"$outDir/q145_model.json"),
        dbg.toString)
    } catch { case e: Throwable =>
      System.err.println(s"[verify] q145_model dump failed: " +
        e.getMessage)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
