package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Queries with no SQL-expressible oracle (hash loops, graph algorithms,
  * permutation p-values, image decode) are additionally checked against
  * COMMITTED GOLDEN files: `golden/<sf>.tsv` holds `name rows md5` of the
  * canonically-rendered sorted rows. Generate/refresh with
  * `SPARK_GRAFT_WRITE_GOLDENS=1` (provenance: golden/README.md); every
  * normal run compares and emits `<outDir>/golden_check.json`.
  */
object Verify {

  /** Queries whose only value check is the committed golden. */
  val goldenQueries: Seq[String] = Seq(
    "q27_natural_breaks", "q30f_local_moran_full", "q40_skater",
    "q41_redcap_ward", "q54_minhash_dedup", "q55_simhash_dup",
    "q58_fingerprint", "q59_multimodal_image", "q59b_multimodal_rgb",
    "q68_embedding_neardup",
    "q103_image_neardup", "q104_semantic_dedup",
    "q104b_semantic_dedup_twolevel", "q105_image_resize",
    "q106_image_resize_rgb")

  /** (rowCount, md5) over sorted canonical row renderings — column-order
    * sensitive, row-order insensitive, null/array/binary safe. Doubles
    * render via Double.toString (shortest-roundtrip, stable across
    * partitionings per the determinism probe) after normalizing IEEE
    * negative zero to +0.0 (`x + 0.0`) — the identity everywhere else —
    * so goldens can never diverge on sign-of-zero rendering (the class
    * behind r5's q101 oracle miss; see OracleSql's matching convention).
    */
  def canon(df: org.apache.spark.sql.DataFrame): (Long, String) = {
    def cell(v: Any): String = v match {
      case null => "∅"
      case d: java.lang.Double => java.lang.Double.toString(d + 0.0)
      case f: java.lang.Float => java.lang.Float.toString(f + 0.0f)
      case a: scala.collection.Seq[_] => a.map(cell).mkString("[", ",", "]")
      case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
      case x => String.valueOf(x)
    }
    val lines = df.collect().map(_.toSeq.map(cell).mkString("|")).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    lines.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    (lines.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val goldenGot = scala.collection.mutable.LinkedHashMap.empty[String, (Long, String)]
    // SPARK_GRAFT_ONLY=q104_semantic_dedup,q87_dup_clusters — builder-side
    // focused runs (same contract as Bench's filter); the golden compare
    // below only iterates over queries that actually ran, and golden
    // REFRESH under a filter merges into the existing file (never truncates)
    val only: Set[String] = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.nonEmpty && !only.contains(name)) ()
      else
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        if (goldenQueries.contains(name))
          goldenGot(name) = canon(spark.read.parquet(s"$outDir/$name"))
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }

    // ---- committed-golden compare (or refresh) ----
    val sfName = Paths.get(sfDir).getFileName.toString
    val goldenPath = Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_GOLDEN_DIR", "golden"), s"$sfName.tsv")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    if (sys.env.get("SPARK_GRAFT_WRITE_GOLDENS").contains("1")) {
      Files.createDirectories(goldenPath.getParent)
      // merge-over-existing so a SPARK_GRAFT_ONLY-filtered refresh never
      // truncates the other queries' committed entries
      val merged = scala.collection.mutable.LinkedHashMap.empty[String, (Long, String)]
      if (Files.exists(goldenPath))
        Files.readAllLines(goldenPath).toArray(Array.empty[String])
          .filter(_.nonEmpty).foreach { l =>
            val Array(n, r, h) = l.split("\t"); merged(n) = (r.toLong, h)
          }
      goldenGot.foreach { case (n, v) => merged(n) = v }
      val body = merged.map { case (n, (rows, h)) => s"$n\t$rows\t$h" }
        .mkString("", "\n", "\n")
      Files.writeString(goldenPath, body)
      println(s"[verify] wrote ${goldenGot.size} goldens to $goldenPath" +
        s" (${merged.size} total entries)")
    } else if (Files.exists(goldenPath)) {
      val want = Files.readAllLines(goldenPath).toArray(Array.empty[String])
        .filter(_.nonEmpty).map { l =>
          val Array(n, r, h) = l.split("\t"); n -> (r.toLong, h)
        }.toMap
      val checks = goldenGot.map { case (n, (rows, h)) =>
        val ok = want.get(n).contains((rows, h))
        val status = if (ok) "OK" else if (!want.contains(n)) "NO_GOLDEN"
          else s"MISMATCH got ($rows,$h) want ${want(n)}"
        println(s"[verify] golden $n: $status")
        s"${q(n)}: {${q("golden_match")}: $ok, ${q("rows")}: $rows, ${q("md5")}: ${q(h)}}"
      }
      Files.writeString(Paths.get(s"$outDir/golden_check.json"),
        checks.mkString("{", ",", "}"))
    } else {
      System.err.println(s"[verify] no golden file $goldenPath — " +
        "run with SPARK_GRAFT_WRITE_GOLDENS=1 to create")
    }

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
