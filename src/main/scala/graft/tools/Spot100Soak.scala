package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 100×-replica spot soak (r13 verdict item 2): all standing scale
  * evidence is 10× — this upgrades the five flagship dedup/eval
  * pipelines to the brief's "survives 100×" bar. Synthesizes a
  * 100-replica copy of the sf0.1 documents/events tables under
  * `target/sf10` (the two tables the flagships read), then times each
  * flagship at sf0.1, sf1 (10×) and sf10 (100×) in one session,
  * interleaved.
  *
  * Replica fidelity (r14 review fixed two corruptions in the first
  * cut): (1) doc_id offsets use 10⁹ per replica, clear of q179's
  * +5·10⁸ variant-id arithmetic — with the sf1-style 10⁷ offset,
  * replica i's variant ids collided exactly with replica (i+50)'s
  * base ids, handing entity resolution a corpus with duplicate record
  * ids; (2) text uses [[permuteText]] — a full-alphabet permutation
  * family, NOT the sf1 two-alphabet rotation, whose 12-rotation first
  * class made replicas with equal residue share every common-word
  * shingle and would have inflated cross-replica candidates
  * superlinearly, contaminating the very linearity readout this tool
  * exists to produce.
  *
  * The number to read is r100_10 = t(100×)/t(10×): a linear operator
  * sits near 10 with its fixed overhead amortized; a quadratic one
  * explodes. Writes BENCH_100x.json at the repo root.
  *
  * Usage: `sbt "runMain graft.tools.Spot100Soak"` (builds target/sf1
  * via the ScaleSoak builder if absent; ~10 GiB heap recommended). */
object Spot100Soak {

  private val REPLICAS = 100
  // per-replica key offset: must clear q179's +5e8 variant-id shift
  // AND the sf0.1 key maxima (see the object doc)
  private val OFF100 = 1000000000L

  /** Per-replica full-alphabet permutation π_i = ρ^(i mod 26) ∘
    * σ^(i div 26): ρ rotates the natural alphabet, σ rotates a fixed
    * scrambled ordering. Any two distinct replicas differ on every
    * letter when they share a ρ- or σ-power (a nonidentity rotation
    * has no fixed points), and on all but ~1 letter otherwise — so no
    * letter CLASS (and hence no common-word shingle family) is shared
    * across replicas, unlike a single rotation family. i = 0 is the
    * identity. */
  private def permuteText(c: org.apache.spark.sql.Column,
      i: Int): org.apache.spark.sql.Column = {
    val nat = "abcdefghijklmnopqrstuvwxyz"
    val scr = "qwertyuiopasdfghjklzxcvbnm"
    val a = i % 26; val b = (i / 26) % 26
    if (a == 0 && b == 0) c
    else {
      val target = nat.map { x =>
        val sx = scr((scr.indexOf(x) + b) % 26) // σ^b
        nat((nat.indexOf(sx) + a) % 26)         // then ρ^a
      }.mkString
      translate(c, nat, target)
    }
  }

  /** The five flagships named by the r13 verdict — LSH dedup, exact
    * PPJoin, blocked entity resolution, near-dup CC clusters, HLL
    * trailing distinct — plus the r14 winnowing tier end-to-end, plus
    * (r14 verdict item 2) the streaming STATE tier: session window,
    * hopping window, streaming dedup, streaming near-dup tagging and
    * drift-on-arrival. The replicas offset user_id/event_id/doc_id, so
    * the streaming legs measure state ROWS × commit cost at 100× keys —
    * the honest failure mode of watermarked state at corpus scale. */
  private val flagships = Seq(
    "q66_lsh_near_dup", "q190_setsim_join", "q179_entity_resolution",
    "q121_neardup_clusters", "q214_trailing_approx",
    "q238_winnow_dedup",
    "q101_streaming_session", "q108_streaming_hopping",
    "q109_streaming_distinct", "q148_streaming_dedup",
    "q243_streaming_drift",
    // r16 (verdict item 5): the two end-to-end COMPOSITION gates — a
    // lost checkpoint or re-analysis barrier in a composition shows up
    // superlinearly here where the per-stage gates stay linear, and
    // compositions are what a 100 TB curation run actually executes
    "q244_curation_pipeline", "q248_multimodal_pipeline")

  /** Which fixture table(s) each flagship reads — the denominator of
    * the r17 row-count evidence (verdict item 4): a flat r100/10 ratio
    * could also be produced by a fixture-pruning bug that silently
    * reads a tenth of the corpus, so each BENCH_100x entry now records
    * the INPUT rows actually present at each scale (metadata-only
    * parquet counts) alongside the query's own output rows. */
  private val inputTables: Map[String, Seq[String]] = Map(
    "q66_lsh_near_dup" -> Seq("documents"),
    "q190_setsim_join" -> Seq("documents"),
    "q179_entity_resolution" -> Seq("documents"),
    "q121_neardup_clusters" -> Seq("documents"),
    "q214_trailing_approx" -> Seq("events"),
    "q238_winnow_dedup" -> Seq("documents"),
    "q101_streaming_session" -> Seq("events"),
    "q108_streaming_hopping" -> Seq("events"),
    "q109_streaming_distinct" -> Seq("events"),
    "q148_streaming_dedup" -> Seq("events"),
    "q243_streaming_drift" -> Seq("events"),
    "q244_curation_pipeline" -> Seq("documents"),
    "q248_multimodal_pipeline" -> Seq("documents"))

  private def buildSf10(spark: SparkSession, src: String,
      dst: String): Unit = {
    def raw(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def writeReplicated(name: String,
        f: (DataFrame, Int) => DataFrame): Unit = {
      val base = raw(name)
      (0 until REPLICAS).map(i => f(base, i)).reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
    }
    writeReplicated("documents", (d, i) => d
      .withColumn("doc_id", col("doc_id") + lit(i * OFF100))
      .withColumn("text", permuteText(col("text"), i)))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    writeReplicated("events", (d, i) => d
      .withColumn("event_id", col("event_id") + lit(i * OFF100))
      .withColumn("user_id", col("user_id") + lit(i * OFF100)))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val sf1 = "target/sf1"
    val sf10 = "target/sf10"
    val sent1 = java.nio.file.Paths.get(s"$sf1/_BUILD_COMPLETE")
    if (!java.nio.file.Files.exists(sent1)) {
      println("building target/sf1 (10x sf0.1)...")
      ScaleSoak.buildSf1(spark, src, sf1)
      java.nio.file.Files.write(sent1, Array.emptyByteArray)
    }
    val sent10 = java.nio.file.Paths.get(s"$sf10/_BUILD_COMPLETE")
    if (!java.nio.file.Files.exists(sent10)) {
      println("building target/sf10 (100x sf0.1, documents+events)...")
      buildSf10(spark, src, sf10)
      java.nio.file.Files.write(sent10, Array.emptyByteArray)
    }
    def time(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      graft.Bench.force(fn(spark, dir))
      (System.nanoTime() - t0) / 1e9
    }
    val torun = if (args.isEmpty) flagships else flagships.filter(args.toSet)
    // fixture input rows per (table, scale): metadata-only counts,
    // memoized — shared across the flagships reading the same table
    val tableRows = scala.collection.mutable.Map.empty[(String, String), Long]
    def rowsIn(q: String, dir: String): Long =
      inputTables(q).map(t => tableRows.getOrElseUpdate((t, dir),
        spark.read.parquet(s"$dir/$t.parquet").count())).sum
    // output rows: one untimed count per (query, scale) AFTER the timed
    // min-of-2 (count() prunes compute, so it must never be the timed
    // body — it only needs cardinality)
    def rowsOut(q: String, dir: String): Long =
      graft.SparkEntry.queries(q)(spark, dir).count()
    // warm all three scales once, then min-of-2 interleaved (the
    // ScaleSoak contention discipline)
    torun.foreach { q => time(q, src); time(q, sf1); time(q, sf10) }
    def measure(q: String): (Double, Double, Double) = {
      val a01 = time(q, src); val a1 = time(q, sf1); val a10 = time(q, sf10)
      val b01 = time(q, src); val b1 = time(q, sf1); val b10 = time(q, sf10)
      (math.min(a01, b01), math.min(a1, b1), math.min(a10, b10))
    }
    val rows0 = torun.map { q =>
      val (t01, t1, t10) = measure(q)
      val ri = (rowsIn(q, src), rowsIn(q, sf1), rowsIn(q, sf10))
      val ro = (rowsOut(q, src), rowsOut(q, sf1), rowsOut(q, sf10))
      println(f"[spot100] $q sf0.1=$t01%.2fs sf1=$t1%.2fs sf10=$t10%.2fs " +
        f"r10=${t1 / t01}%.2f r100_10=${t10 / t1}%.2f " +
        f"r100=${t10 / t01}%.2f rows_in=${ri._1}/${ri._2}/${ri._3} " +
        s"rows_out=${ro._1}/${ro._2}/${ro._3}")
      (q, t01, t1, t10, ri, ro)
    }
    // MECHANIZED solo re-run (r17 verdict item 6): twice in r17 a
    // soak-batch measurement recorded a ~2× artifact (JVM interference
    // from the surrounding batch) that only a solo re-run exposed. Any
    // entry whose sf10 time moved >25% vs its prior recording is now
    // automatically re-measured at the END of the batch — no other soak
    // query in flight, the closest one JVM gets to a solo run — and
    // every written entry carries a `solo` provenance flag.
    val priorSf10: Map[String, Double] = {
      val p = java.nio.file.Paths.get("BENCH_100x.json")
      if (!java.nio.file.Files.exists(p)) Map.empty
      else try {
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        val root = JsonMethods.parse(
          new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
        (root \ "queries") match {
          case JObject(fields) => fields.collect {
            case (q, JObject(vs)) => vs.toMap.get("sf10_sec").collect {
              case JDouble(x) => q -> x
              case JInt(x) => q -> x.toDouble
              case JDecimal(x) => q -> x.toDouble
            }
          }.flatten.toMap
          case _ => Map.empty
        }
      } catch { case scala.util.control.NonFatal(_) => Map.empty }
    }
    val rows = rows0.map { case (q, t01, t1, t10, ri, ro) =>
      val moved = priorSf10.get(q).exists(p =>
        math.abs(t10 - p) / math.max(p, 1e-9) > 0.25)
      if (!moved) (q, t01, t1, t10, ri, ro, false)
      else {
        val (s01, s1, s10) = measure(q)
        println(f"[spot100] $q SOLO re-measure (moved >25%% vs prior " +
          f"${priorSf10(q)}%.2fs): sf0.1=$s01%.2fs sf1=$s1%.2fs " +
          f"sf10=$s10%.2fs")
        (q, s01, s1, s10, ri, ro, true)
      }
    }
    def fmt(d: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(d))
    // CUMULATIVE like ScaleSoak (a subset re-run must not clobber the
    // recorded table); this batch's measurements win on collision.
    // Parsed with json4s, NOT a regex: the first cut's "(q[\\w]+)"
    // pattern matched the top-level "queries" key with a non-brace-
    // balanced value capture, so every cumulative re-run spliced a
    // corrupt fragment back into the file (r14 advice, medium).
    val prior: Seq[(String, String)] = {
      val p = java.nio.file.Paths.get("BENCH_100x.json")
      if (!java.nio.file.Files.exists(p)) Seq.empty
      else {
        // raise on an unreadable prior rather than silently rewriting
        // the file from this batch only (r15 review: a parse failure
        // here once dropped six recorded flagship rows) — the operator
        // deletes/fixes the file deliberately instead
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        val root = JsonMethods.parse(
          new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
        (root \ "queries") match {
          case JObject(fields) =>
            val qs = fields.collect {
              case (q, obj: JObject) if q.matches("q\\d+.*") =>
                q -> JsonMethods.compact(JsonMethods.render(obj))
            }
            require(qs.size == fields.size, "BENCH_100x.json: prior " +
              "'queries' has non-qNN keys (corrupt / legacy nested " +
              s"shape?) — fix or remove the file: ${fields.map(_._1)}")
            qs
          case other => throw new IllegalStateException(
            s"BENCH_100x.json: 'queries' is not an object: $other — " +
              "fix or remove the file")
        }
      }
    }
    val fresh = rows.map { case (q, t01, t1, t10, ri, ro, solo) =>
      q -> (s"""{"sf01_sec": ${fmt(t01)}, "sf1_sec": ${fmt(t1)}, """ +
        s""""sf10_sec": ${fmt(t10)}, "ratio_10x": ${fmt(t1 / t01)}, """ +
        s""""ratio_100x_over_10x": ${fmt(t10 / t1)}, """ +
        s""""ratio_100x": ${fmt(t10 / t01)}, """ +
        s""""rows_in": [${ri._1}, ${ri._2}, ${ri._3}], """ +
        s""""rows_out": [${ro._1}, ${ro._2}, ${ro._3}], """ +
        s""""solo": $solo}""")
    }
    val merged = scala.collection.mutable.LinkedHashMap.empty[String, String]
    prior.foreach { case (q, v) => merged(q) = v }
    fresh.foreach { case (q, v) => merged(q) = v }
    val json = merged.map { case (q, v) => s""""$q": $v""" }
      .mkString("{\"replicas\": 100, \"queries\": {", ", ", "}}")
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_100x.json"),
      json.getBytes("UTF-8"))
    println(s"wrote BENCH_100x.json (${merged.size} queries)")
    spark.stop()
  }
}
