package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: measured scaling evidence for the flagship LLM-pipeline
  * queries. Generates a deterministic N× corpus (documents +
  * embeddings, same schema/shape as `/root/testdata/sf0.1`), times
  * the flagship queries at 1× (sf0.1) and N× (min-of-2, cold cache
  * per pass), and prints the observed scaling exponent per query:
  * `exp = ln(tN / t1) / ln(N)` — 1.0 is perfectly linear, anything
  * materially above needs a plan explanation. Results are recorded in
  * SCALE.md.
  *
  * {{{ sbt "runMain graft.ScaleBench [multiplier] [workDir]" }}}
  */
object ScaleBench {

  /** Queries whose 100×-claims SCALE.md argues — the ones worth a
    * measured datapoint.
    */
  private val Flagship = Seq("q37_minhash_sig", "q38_lsh_candidates",
    "q89_clean_corpus", "q102_incremental_neardup",
    "q104_semantic_decontaminate", "q108_training_shard")

  private val Vocab: Array[String] = Array(
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "vector", "join", "shuffle", "cache", "disk", "node", "task",
    "stage", "plan", "code", "codegen", "map", "reduce", "skew", "salt")

  private val Langs = Array("en", "en", "en", "de", "es", "fr", "zh")

  /** Per-id deterministic draws, re-derivable for ANY id — the dup
    * machinery below needs a base document's own draws to resolve
    * what text it actually carries.
    */
  private def draws(id: Long): (String, String, Double, Long, Int) = {
    val rnd = new scala.util.Random(id * 0x9E3779B97F4A7C15L + 42L)
    val source = "src" + rnd.nextInt(16)
    val lang = Langs(rnd.nextInt(Langs.length))
    val roll = rnd.nextDouble()
    val base = id - 1 - rnd.nextInt(200)
    val mutSeed = rnd.nextInt(1 << 20)
    (source, lang, roll, base, mutSeed)
  }

  private def baseWords(id: Long): Array[String] = {
    val rnd = new scala.util.Random(id * 0x9E3779B97F4A7C15L + 7L)
    val n = 15 + rnd.nextInt(46)
    Array.fill(n)(Vocab(rnd.nextInt(Vocab.length)))
  }

  /** The words document `id` actually carries: exact dups (roll <
    * .05) copy their base's RESOLVED text (recursing through chains —
    * copying the base's seed instead would miss bases that are
    * themselves dups, silently deflating the planted-dup rate the
    * scaling measurement depends on); near-dups (roll < .08) mutate
    * exactly one word to a GUARANTEED-different word.
    */
  private def textWords(id: Long): Array[String] = {
    val (_, _, roll, base, mutSeed) = draws(id)
    if (id >= 200 && roll < 0.05) textWords(base)
    else if (id >= 200 && roll < 0.08) {
      val w = textWords(base).clone()
      val m = new scala.util.Random(mutSeed)
      val i = m.nextInt(w.length)
      val shift = 1 + m.nextInt(Vocab.length - 1)
      w(i) = Vocab((Vocab.indexOf(w(i)) + shift) % Vocab.length)
      w
    } else baseWords(id)
  }

  /** Write documents.parquet + embeddings.parquet at `mult`× the
    * sf0.1 row counts. Deterministic per (id, mult): rerunning
    * produces byte-identical data.
    */
  private[graft] def generate(spark: SparkSession, dir: String,
      mult: Int): Unit = {
    import spark.implicits._
    val nDocs = 5000L * mult
    val docs = spark.range(nDocs).as[Long].mapPartitions(_.map { id =>
      // ~5% exact dups of a recent doc, ~3% near-dups (one word off)
      val (source, lang, _, _, _) = draws(id)
      val text = textWords(id).mkString(" ")
      (id, text, lang, source, text.length.toLong)
    }).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val nVecs = 2000L * mult
    val embeddings = spark.range(nVecs).as[Long].mapPartitions(_.map { id =>
      val rnd = new scala.util.Random(id * 0x9E3779B97F4A7C15L + 99L)
      val label = rnd.nextInt(10)
      val vec = Array.tabulate(64) { d =>
        // cluster structure: label-deterministic center + noise, so
        // the LSH buckets/centroid assignments have real geometry
        val c = new scala.util.Random(label * 7919L + d).nextDouble() * 2 - 1
        (0.6 * c + 0.4 * (rnd.nextDouble() * 2 - 1)).toFloat
      }
      (id, vec, label)
    }).toDF("vec_id", "embedding", "label")
    embeddings.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  private def timeQueries(spark: SparkSession,
      dir: String): Map[String, Double] = {
    val fns = SparkEntry.queries
    Flagship.map { name =>
      val times = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fns(name)(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val work = args.lift(1).getOrElse("/tmp/graft-scale")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scaled = s"$work/x$mult"
    if (!new java.io.File(s"$scaled/documents.parquet").exists()) {
      println(s"[scale] generating ${mult}x corpus at $scaled")
      generate(spark, scaled, mult)
    }
    // warm both read paths untimed (Bench methodology)
    for (d <- Seq(base, scaled); t <- Seq("documents", "embeddings"))
      spark.read.parquet(s"$d/$t.parquet")
        .write.format("noop").mode("overwrite").save()
    // one untimed pass of every flagship query absorbs per-query
    // codegen/JIT — without it the 1× pass (which runs first) eats
    // the warmup and the measured ratios flatter the scaling
    val fns = SparkEntry.queries
    Flagship.foreach { q =>
      spark.catalog.clearCache()
      fns(q)(spark, base).write.format("noop").mode("overwrite").save()
    }

    val t1 = timeQueries(spark, base)
    val tN = timeQueries(spark, scaled)
    println(f"[scale] ${"query"}%-28s ${"1x"}%8s ${mult + "x"}%8s ratio   exp")
    Flagship.foreach { q =>
      val r = tN(q) / t1(q)
      val exp = math.log(r) / math.log(mult.toDouble)
      println(f"[scale] $q%-28s ${t1(q)}%7.2fs ${tN(q)}%7.2fs ${r}%5.1f× ${exp}%5.2f")
    }
    spark.stop()
  }
}
