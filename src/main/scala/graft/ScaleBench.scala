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
    "q104_semantic_decontaminate", "q108_training_shard",
    "q109_pq_adc_search", "q110_pack_sharded", "q112_bpe_apply")

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

  /** `runMain graft.ScaleBench skew` — the packing-straggler
    * experiment: a corpus where ONE source carries 80% of all tokens
    * (the crawl reality the shard budget exists for), packed
    * per-source (single window task for the hot source) vs per
    * (source, shard). Prints both wall times; the delta IS the
    * straggler.
    */
  private def skewExperiment(spark: SparkSession, work: String): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = s"$work/skew"
    if (!new java.io.File(s"$dir/docs.parquet").exists()) {
      println(s"[scale] generating skewed packing corpus at $dir")
      // 10M docs, 80% in one source — tokens only (packing input)
      spark.range(10000000L).as[Long].map { id =>
        val rnd = new scala.util.Random(id * 0x9E3779B97F4A7C15L + 5L)
        val source =
          if (rnd.nextDouble() < 0.8) "hot" else "src" + rnd.nextInt(15)
        (source, id, 50 + rnd.nextInt(100))
      }.toDF("source", "doc_id", "n_tok")
        .write.mode("overwrite").parquet(s"$dir/docs.parquet")
    }
    val docs = spark.read.parquet(s"$dir/docs.parquet")
    docs.write.format("noop").mode("overwrite").save() // warm
    def time(label: String, budget: Long): Double = {
      val times = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.ops.Packing.packBins(docs, 2048, budget)
          .groupBy("source", "shard", "bin")
          .agg(count(lit(1)), sum("n_tok"))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val t = times.min
      println(f"[scale] pack $label%-22s ${t}%6.2fs")
      t
    }
    val unsharded = time("per-source", Long.MaxValue)
    val sharded = time("per-(source,shard)", 1000000L)
    println(f"[scale] straggler speedup ${unsharded / sharded}%4.1f×")
  }

  /** `runMain graft.ScaleBench cdc` — the CDC ingest scaling
    * experiment SCALE.md's claims were missing datapoints for:
    * (a) a 1×→10× volume interval (single-table and 10-table demux),
    * publishing the time-scaling exponent like the query table, and
    * (b) a segment-count sweep at CONSTANT volume (1/8/32 feed
    * files) — the source's parallelism unit is the segment, so
    * rows/s should rise with segment count until cores saturate,
    * and the 1-segment number is the reference's parallelism-1 shape.
    * Feeds are derived deterministically from the sf events table
    * (replicas get distinct event_ids); every measurement is
    * min-of-2 with a fresh checkpoint/sink per pass.
    */
  private def cdcExperiment(spark: SparkSession, work: String,
      mult: Int = 10): Unit = {
    // mult=1 would duplicate the 1× rows and divide the exponent by
    // ln(1) = 0 (NaN) — an interval needs two distinct points
    require(mult >= 2, s"cdc experiment multiplier must be >= 2, got $mult")
    import org.apache.spark.sql.functions._
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$base/events.parquet")
    val n1 = events.count()

    def makeFeed(dir: String, mult: Int, tables: Int, segments: Int): Long = {
      // reuse only a COMPLETE feed: a bare exists() would silently
      // measure the partial output of a killed prior run (text writes
      // drop _SUCCESS last; mode=overwrite below replaces partials)
      if (!new java.io.File(dir, "_SUCCESS").exists()) {
        // replicate with disjoint event_ids (routing/offset fields
        // stay unique); repartition pins the SEGMENT count — the
        // source's unit of parallelism — independent of volume
        val rep = events.crossJoin(
            spark.range(mult).toDF("rep"))
          .select((col("event_id") + col("rep") * 1000000000L).as("event_id"),
            col("user_id"), col("event_type"), col("value"), col("ts"))
        Bench.envelopeLines(rep, tables)
          .repartition(segments).write.mode("overwrite").text(dir)
      }
      n1 * mult
    }

    def run(feedDir: String, rows: Long, tables: Int,
        zonemap: Seq[String] = Nil): Double = {
      val times = (1 to 2).map { _ =>
        val tmp = java.nio.file.Files.createTempDirectory("graft-scale-cdc-")
        val pipeline = new graft.streaming.CdcPipeline(spark,
          graft.streaming.CdcConfig("scale", Bench.eventsRegistry(tables),
            s"$tmp/sink", offsetStorePath = Some(s"$tmp/offsets"),
            zonemapColumns = zonemap))
        val t0 = System.nanoTime()
        pipeline.startFeed(graft.source.Dsv2Feed(feedDir), s"$tmp/ck",
          org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .awaitTermination()
        val dt = (System.nanoTime() - t0) / 1e9
        require(pipeline.recordCount == rows,
          s"ingest row mismatch: ${pipeline.recordCount} != $rows")
        dt
      }
      times.min
    }

    println(f"[scale] ${"cdc experiment"}%-26s ${"rows"}%9s ${"sec"}%7s ${"rows/s"}%9s")
    def report(label: String, rows: Long, t: Double): Unit =
      println(f"[scale] $label%-26s $rows%9d ${t}%6.2fs ${rows / t}%,9.0f")

    // volume interval at a fixed 8-segment feed: exponent vs data
    val vol = for ((m, tables) <- Seq((1, 1), (mult, 1), (1, 10), (mult, 10)))
      yield {
        val dir = s"$work/cdcfeed_m${m}_t${tables}_s8"
        val rows = makeFeed(dir, m, tables, 8)
        val t = run(dir, rows, tables)
        report(s"volume m=${m}x tables=$tables", rows, t)
        (m, tables) -> t
      }
    val m = vol.toMap
    for (tables <- Seq(1, 10)) {
      val exp = math.log(m((mult, tables)) / m((1, tables))) /
        math.log(mult.toDouble)
      println(f"[scale] cdc 1x->${mult}x exponent (tables=$tables): ${exp}%5.2f")
    }

    // segment sweep at constant mult× volume: parallelism is the knob.
    // s=8 is the SAME configuration the volume loop already measured —
    // reuse that number rather than re-measuring it into a second,
    // inconsistent row for the identical setup
    for (seg <- Seq(1, 8, 32)) {
      val (rows, t) =
        if (seg == 8) (n1 * mult, m((mult, 1)))
        else {
          val dir = s"$work/cdcfeed_m${mult}_t1_s$seg"
          val rows = makeFeed(dir, mult, 1, seg)
          (rows, run(dir, rows, 1))
        }
      report(s"segments=$seg (${mult}x, 1 tbl)", rows, t)
    }

    // sink zone-map manifest overhead: same mult× 1-table feed, with
    // `sink.zonemap.columns` maintaining a per-table manifest behind
    // every micro-batch write — the per-batch cost is one directory
    // listing plus a stats scan of the batch's NEW files only
    val zmDir = s"$work/cdcfeed_m${mult}_t1_s8"
    val zmRows = makeFeed(zmDir, mult, 1, 8)
    val zt = run(zmDir, zmRows, 1, zonemap = Seq("event_id", "_ts"))
    report(s"zonemap on (${mult}x, 1 tbl)", zmRows, zt)
    println(f"[scale] zonemap ingest overhead ${(zt / m((mult, 1)) - 1) * 100}%+.1f%%")
  }

  /** Deterministic 32×32 RGB PNG for media-corpus generation — real
    * JDK-encoded bytes so the measured decode path is the production
    * one, re-derivable per id (same discipline as `draws`).
    */
  private[graft] def pngBytes(id: Long, w: Int = 32, h: Int = 32): Array[Byte] = {
    val rnd = new scala.util.Random(id * 0x9E3779B97F4A7C15L + 7L)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rnd.nextInt(0x1000000)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private[graft] def jpegBytes(id: Long, w: Int = 16,
      h: Int = 16): Array[Byte] = {
    val rnd = new scala.util.Random(id * 0x9E3779B97F4A7C15L + 13L)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rnd.nextInt(0x1000000)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** A 3-frame MJPEG/AVI container (the generator mirror of the
    * `Multimodal.sampleAviFrames` walk).
    */
  private[graft] def aviBytes(id: Long): Array[Byte] = {
    def fcc(s: String) = s.getBytes("US-ASCII")
    def u32(n: Int) = Array((n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
      ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte)
    def chunk(cc: String, data: Array[Byte]) =
      fcc(cc) ++ u32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    val movi = chunk("LIST", fcc("movi") ++
      (0 until 3).flatMap(k => chunk("00dc", jpegBytes(id * 3 + k))).toArray)
    val body = fcc("AVI ") ++
      chunk("LIST", fcc("hdrl") ++ chunk("avih", new Array[Byte](56))) ++ movi
    fcc("RIFF") ++ u32(body.length) ++ body
  }

  /** `runMain graft.ScaleBench multimodal [workDir] [mult]` — the
    * binary-path scaling datapoint: a deterministic PNG corpus at 1×
    * and N×, timed through `Multimodal.resizeImages` (full decode →
    * integer resample → re-encode) and `extractFeatures`, plus an
    * MJPEG/AVI corpus through `sampleAviFrames` (container walk +
    * 3 JPEG frame decodes per row). All are mapPartitions over a
    * binary column — no shuffle, so the exponent should track data
    * volume (~1.0 at constant parallelism) and the rows/s should
    * hold flat; anything super-linear means the binary path shuffled
    * or collected somewhere.
    */
  private def multimodalExperiment(spark: SparkSession, work: String,
      mult: Int): Unit = {
    // mult=1 would collapse dirs to one key and print 0/0 = NaN
    // exponents — fail fast instead of emitting garbage measurements
    require(mult > 1, s"multiplier must be > 1 (got $mult)")
    import spark.implicits._
    import graft.multimodal.Multimodal
    val base = 20000L
    def gen(dir: String, n: Long): Unit =
      if (!new java.io.File(dir).exists()) {
        println(s"[scale] generating $n-image corpus at $dir")
        spark.range(n).repartition(64)
          .map(id => Multimodal.MediaRow(id, "image/png", pngBytes(id)))
          .write.mode("overwrite").parquet(dir)
      }
    def time(dir: String, n: Long,
        op: org.apache.spark.sql.Dataset[Multimodal.MediaRow] =>
          org.apache.spark.sql.Dataset[_]): Double = {
      val media = spark.read.parquet(dir).as[Multimodal.MediaRow]
      (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        op(media).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val dirs = Seq(1 -> s"$work/media_x1", mult -> s"$work/media_x$mult")
    dirs.foreach { case (m, d) => gen(d, base * m) }
    // untimed warm pass (Bench methodology: JIT + page cache)
    dirs.foreach { case (_, d) =>
      spark.read.parquet(d).write.format("noop").mode("overwrite").save() }
    for ((label, op) <- Seq[(String,
        org.apache.spark.sql.Dataset[Multimodal.MediaRow] =>
          org.apache.spark.sql.Dataset[_])](
      "resizeImages 32->16" -> (m => Multimodal.resizeImages(m, 16, 16)),
      "extractFeatures" -> (m => Multimodal.extractFeatures(m)))) {
      val ts = dirs.map { case (m, d) =>
        val n = base * m
        val t = time(d, n, op)
        println(f"[scale] multimodal $label%-20s ${m}x $n%8d imgs ${t}%6.2fs ${n / t}%,9.0f rows/s")
        m -> t
      }.toMap
      val exp = math.log(ts(mult) / ts(1)) / math.log(mult.toDouble)
      println(f"[scale] multimodal $label 1x->${mult}x exponent: ${exp}%5.2f")
    }
    // MJPEG/AVI frame extraction: same map-only shape (container walk
    // + 3 per-frame JPEG decodes per row), measured on its own corpus
    val aviBase = base / 4 // 3 frames/row ≈ same decode volume
    val aviDirs = Seq(1 -> s"$work/avi_x1", mult -> s"$work/avi_x$mult")
    aviDirs.foreach { case (m, d) =>
      if (!new java.io.File(d).exists()) {
        println(s"[scale] generating ${aviBase * m}-video corpus at $d")
        spark.range(aviBase * m).repartition(64)
          .map(id => Multimodal.MediaRow(id, "video/avi", aviBytes(id)))
          .write.mode("overwrite").parquet(d)
      }
    }
    aviDirs.foreach { case (_, d) =>
      spark.read.parquet(d).write.format("noop").mode("overwrite").save() }
    val ts = aviDirs.map { case (m, d) =>
      val n = aviBase * m
      val t = time(d, n, ds => Multimodal.sampleAviFrames(ds, 1, 16, 16))
      println(f"[scale] multimodal sampleAviFrames      ${m}x $n%8d vids ${t}%6.2fs ${n / t}%,9.0f rows/s")
      m -> t
    }.toMap
    val aviExp = math.log(ts(mult) / ts(1)) / math.log(mult.toDouble)
    println(f"[scale] multimodal sampleAviFrames 1x->${mult}x exponent: ${aviExp}%5.2f")
  }

  /** Deterministic n-frame animated GIF (32×32 frames, distinct
    * pattern per (id, frame)) for the sample-only decode experiment.
    */
  private[graft] def gifBytes(id: Long, frames: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      var k = 0
      while (k < frames) {
        val img = new java.awt.image.BufferedImage(32, 32,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 32) {
          var x = 0
          while (x < 32) {
            img.setRGB(x, y,
              (((id * 31 + k * 7 + x) & 0xff) << 16).toInt |
                (((y * 5 + k) & 0xff) << 8))
            x += 1
          }
          y += 1
        }
        w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        k += 1
      }
      w.endWriteSequence()
    } finally { w.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Sample-only GIF decode: at everyK = k only ceil(frames/k) of a
    * GIF's rasters are LZW-decoded (round 9 — previously every frame
    * decoded and most were dropped). Measured as wall time of
    * `sampleGifFrames` over one corpus at k = 1 / 5 / frames:
    * time should fall roughly with sampled-frame count, floored by
    * the per-asset container walk.
    */
  private def gifExperiment(spark: SparkSession, work: String): Unit = {
    import spark.implicits._
    import graft.multimodal.Multimodal
    val n = 2000L; val frames = 20
    val dir = s"$work/gif_${n}x$frames"
    if (!new java.io.File(dir).exists()) {
      println(s"[scale] generating $n-GIF corpus ($frames frames each) at $dir")
      spark.range(n).repartition(64)
        .map(id => Multimodal.MediaRow(id, "image/gif", gifBytes(id, frames)))
        .write.mode("overwrite").parquet(dir)
    }
    spark.read.parquet(dir).write.format("noop").mode("overwrite").save()
    def time(k: Int): Double = {
      val media = spark.read.parquet(dir).as[Multimodal.MediaRow]
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        Multimodal.sampleGifFrames(media, k, 16, 16)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    time(1) // untimed warmup
    println(f"[scale] ${"gif sample-only decode"}%-26s ${"frames"}%9s ${"sec"}%7s")
    val ts = Seq(1, 5, frames).map { k =>
      val sampled = n * ((frames + k - 1) / k)
      val t = time(k)
      println(f"[scale]   everyK=$k%-3d decodes $sampled%9d $t%7.2f")
      k -> t
    }.toMap
    println(f"[scale]   k=1 -> k=5 speedup ${ts(1) / ts(5)}%.2fx " +
      f"(20x fewer decodes: ${ts(1) / ts(frames)}%.2fx)")
  }

  /** `runMain graft.ScaleBench ann [mult] [work]` — the maintained-
    * ANN-index experiment: at 1× and mult× embedding corpora, time a
    * full IVF rebuild, an incremental delta (0.1% updates + 0.05%
    * deletes), and a probe-2 search. The claim being measured is the
    * one that justifies [[graft.ops.AnnIndex]] at 100 TB: rebuild
    * cost grows with the CORPUS, delta cost grows with the DELTA —
    * so at mult× the rebuild/delta ratio should widen by ~mult.
    *
    * The experiment also PINS the pruned search's recall at scale —
    * the q70 discipline where it binds statistically (the fuzz suite's
    * per-seed floor is three tiny corpora at top-3, one rank swap of
    * margin): nprobe=2-of-16 top-10 vs the GLOBAL exact top-10, the
    * oracle being the index's OWN full probe (nprobe = all centroids
    * degenerates IVF to an exact scan — fuzz-proven equal to
    * brute-force cosine, and no re-derived kernel to drift),
    * measured at BOTH lifecycle points: freshly built AND after the
    * maintenance delta, where an assignment bug degrading the probed
    * cells' contents would hide from a fresh-built-only pin. The
    * require()d floor (shared by both pins) means a prune/assignment
    * regression FAILS the bench run instead of silently trading
    * recall for the speed numbers printed beside it.
    */
  private def annExperiment(spark: SparkSession, work: String,
      mult: Int): Unit = {
    import org.apache.spark.sql.functions._
    import graft.ops.AnnIndex
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val centroids = 16
    val topK = 10
    println(f"[scale] ${"ann experiment"}%-24s ${"vecs"}%9s ${"rebuild"}%8s ${"delta"}%8s ${"search"}%8s ${"recall@2"}%9s ratio")
    val ratios = Seq(1, mult).map { m =>
      val dir = s"$work/ann_x$m"
      if (!new java.io.File(s"$dir/embeddings.parquet").exists())
        generate(spark, dir, m)
      val e0 = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      e0.write.format("noop").mode("overwrite").save() // warm the read
      val n = e0.count()
      val idx = s"$dir/index"
      val cb = AnnIndex.seedCentroids(spark, e0, centroids)
      AnnIndex.build(spark, e0, cb, idx) // untimed warmup build (JIT)
      val tBuild = time(AnnIndex.build(spark, e0, cb, idx))
      val q = e0.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("e").as("qe"))
      def hitSet(nprobe: Int): Set[(Long, Long)] =
        AnnIndex.search(spark, idx, q, nprobe, topK)
          .select("qid", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      // ONE recall measurement, pinned at ONE shared floor, run at
      // both lifecycle points — a floor or oracle change edited in
      // one place cannot leave the two pins measuring different
      // contracts. Measured 0.74 at 2k vectors / 0.94 at 2M
      // (`ScaleBench ann 1000`) on the generated 10-cluster corpus,
      // IDENTICAL fresh-built and post-delta — recall RISES with
      // corpus size because the neighbors concentrate into the probed
      // cells as clusters fill in. The floor sits under the small-
      // corpus measurement with margin for tie churn, far above a
      // hollowed-out probe: a regression dropping one of the two
      // probed cells' postings lands ~0.5 and fails loudly
      def recallAt2(tag: String): Double = {
        val exact = hitSet(centroids)
        val r = (hitSet(2) intersect exact).size.toDouble / exact.size
        require(r >= 0.65,
          f"$tag nprobe=2 recall $r%.2f fell below the pinned floor 0.65")
        r
      }
      // fresh-built (pre-delta, so the exact oracle's corpus is e0)
      val recall = recallAt2("fresh-built")
      val up = e0.filter(col("vec_id") % 1000 === 1)
        .withColumn("e", transform(col("e"), x => -x))
      val del = e0.filter(col("vec_id") % 2000 === 3).select("vec_id")
      val tDelta = time(AnnIndex.applyDelta(spark, idx, up, del))
      // the MAINTAINED index too (same full-probe exact oracle over
      // the index's own live set): a delta assignment bug that
      // degrades what the probed cells contain would hide from the
      // fresh-built pin alone
      val recallD = recallAt2("post-delta")
      val tSearch = time(AnnIndex.search(spark, idx, q, 2, topK)
        .write.format("noop").mode("overwrite").save())
      val ratio = tBuild / tDelta
      println(f"[scale]   x$m%-22d $n%9d $tBuild%7.2fs $tDelta%7.2fs $tSearch%7.2fs $recall%9.2f $ratio%5.1f× (post-delta recall $recallD%.2f)")
      ratio
    }
    println(f"[scale] ann rebuild/delta ratio widened ${ratios(1) / ratios(0)}%4.1f× from 1x to ${mult}x; recall@nprobe=2 require()d >= 0.65 fresh-built AND post-delta")
  }

  /** `runMain graft.ScaleBench zonemap [millions] [work]` — the
    * read-side file-skipping experiment: a z-ordered two-dimension
    * layout with a min/max+bloom manifest, a 2-D range aggregate and
    * a point lookup answered through the manifest vs a full scan.
    * The candidate-file counts are the 100 TB story (files not
    * opened); the wall-clock delta on one warm local box understates
    * it by construction.
    */
  /** Current-table maintenance: a `keys`-key changelog materialized
    * once, then a 1% delta folded incrementally vs the full
    * TimeTravel.currentState recompute — the rebuild-vs-delta ratio
    * that justifies the maintained table (cost ∝ delta, not corpus).
    */
  private def currentTableExperiment(spark: SparkSession, work: String,
      keysK: Int): Unit = {
    import org.apache.spark.sql.functions._
    val keys = keysK * 1000L
    val sink = s"$work/ct_sink_$keysK"
    val cur = s"$work/ct_cur_$keysK"
    def rows(ids: org.apache.spark.sql.DataFrame, tsBase: Long,
        op: String = "UPDATE") =
      ids.select(col("id"), concat(lit("v"), col("id")).as("name"),
        lit(op).as("_op"), (lit(tsBase) + col("id")).as("_ts"),
        lit("f1").as("_binlog_file_internal"),
        (lit(tsBase) + col("id")).as("_binlog_pos_internal"),
        lit("2024-01-01").as("dt"))
    new java.io.File(sink).delete(); new java.io.File(cur).delete()
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(sink))
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(cur))
    // 3 versions per key: the reason a current table EXISTS is a
    // changelog several times the live set — every consumer otherwise
    // re-pays the full history per read
    for (w <- 0 until 3)
      rows(spark.range(keys).toDF("id"), 1000000L * (w + 1))
        .write.mode("append").partitionBy("dt").parquet(sink)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // bucket sizing law: a delta fold rewrites
    // ~min(deltaKeys, buckets)/buckets of the table, so the win needs
    // buckets ≫ the typical delta's KEY count while each bucket stays
    // a sane file size — 256 buckets against a 10-key delta here (the
    // hot-entity CDC shape: few entities change, often)
    val tBuild = time(graft.streaming.CurrentTable.sync(spark, sink, cur,
      Seq("id"), buckets = 256))
    rows(spark.range(10).toDF("id"), 9000000L)
      .write.mode("append").partitionBy("dt").parquet(sink)
    val tDelta = time(graft.streaming.CurrentTable.sync(spark, sink, cur,
      Seq("id")))
    // the honest alternatives: materializing the same queryable table
    // from scratch per refresh, and serving each read by a full
    // changelog scan instead of reading the table
    val scratch = s"$work/ct_scratch_$keysK"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(scratch))
    val tFull = time(
      graft.ops.TimeTravel.currentState(spark, sink, Seq("id"))
        .write.mode("overwrite").parquet(scratch))
    def drainCount(df: org.apache.spark.sql.DataFrame): Unit =
      df.agg(count(lit(1))).write.format("noop").mode("overwrite").save()
    val tReadCur = time(drainCount(
      graft.streaming.CurrentTable.read(spark, cur)))
    val tReadScan = time(drainCount(
      graft.ops.TimeTravel.currentState(spark, sink, Seq("id"))))
    val n = graft.streaming.CurrentTable.read(spark, cur).count()
    require(n == keys, s"current table rows $n != $keys")
    println(f"[scale] currenttable ${keys} keys: first sync " +
      f"${tBuild}%6.2fs; 10-key delta fold ${tDelta}%5.2fs vs " +
      f"from-scratch rematerialize ${tFull}%5.2fs " +
      f"(${tFull / tDelta}%4.1fx); read current ${tReadCur}%5.2fs vs " +
      f"per-query log scan ${tReadScan}%5.2fs")
    // sink compaction under the maintained table: a rewrite renames
    // every file, so a cursor that tracks by name sees the whole
    // partition as fresh. Without the swap hook the sync re-folds it
    // wholesale (SAFE — retained tombstones win every rematch — but
    // O(partition)); with CurrentTable.onSinkRewrite it is a no-op.
    val order = graft.ops.TimeTravel.defaultOrder("mysql")
    def compactOnce(): Seq[String] = {
      graft.streaming.Compaction.compactPartitions(spark, sink,
        Seq("2024-01-01"), keys, order)
      val dtDir = new java.io.File(s"$sink/dt=2024-01-01")
      dtDir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.toString).toSeq
    }
    compactOnce()
    val tRefold = time(graft.streaming.CurrentTable.sync(spark, sink,
      cur, Seq("id")))
    val added = compactOnce()
    graft.streaming.CurrentTable.onSinkRewrite(spark, sink, cur,
      Seq(s"$sink/dt=2024-01-01"), added)
    val tSwap = time {
      val r = graft.streaming.CurrentTable.sync(spark, sink, cur,
        Seq("id"))
      require(r == ((0, 0)), s"cursor swap left fresh files: $r")
    }
    println(f"[scale] currenttable ${keys} keys, post-compaction " +
      f"sync: blind re-fold ${tRefold}%5.2fs vs cursor swap " +
      f"${tSwap}%5.2fs (${tRefold / tSwap}%4.1fx)")
    // point lookups: the bucket prune reads ≤ probe-count of the 256
    // buckets; the honest alternative semi-joins the probe against a
    // full table scan
    val probe = spark.range(10).toDF("id")
    val tLookup = time(drainCount(
      graft.streaming.CurrentTable.lookup(spark, cur, Seq("id"), probe)))
    val tScanJoin = time(drainCount(
      graft.streaming.CurrentTable.read(spark, cur)
        .join(probe, Seq("id"), "left_semi")))
    println(f"[scale] currenttable ${keys} keys, 10-key lookup: " +
      f"bucket-pruned ${tLookup}%5.2fs vs full-scan semi-join " +
      f"${tScanJoin}%5.2fs (${tScanJoin / tLookup}%4.1fx)")
    // tombstone census: with all tombstones YOUNGER than the horizon,
    // a censused prune scans zero buckets; the census-less legacy
    // table pays the full-table scan the census exists to skip
    rows(spark.range(5).toDF("id"), 9900000L, op = "DELETE")
      .write.mode("append").partitionBy("dt").parquet(sink)
    graft.streaming.CurrentTable.sync(spark, sink, cur, Seq("id"))
    val tCensus = time(require(graft.streaming.CurrentTable
      .pruneTombstones(spark, cur, 1L) == 0L, "pruned a young tombstone"))
    // strip the census line → the pre-census layout
    val stateP = s"$cur/_synced.txt"
    val nbLine = scala.io.Source.fromFile(stateP).getLines().next()
    graft.streaming.AtomicFiles.write(stateP, nbLine,
      spark.sparkContext.hadoopConfiguration)
    val tNoCensus = time(require(graft.streaming.CurrentTable
      .pruneTombstones(spark, cur, 1L) == 0L, "pruned a young tombstone"))
    println(f"[scale] currenttable ${keys} keys, young-tombstone " +
      f"prune: censused ${tCensus}%5.2fs (0 buckets scanned) vs " +
      f"census-less full scan ${tNoCensus}%5.2fs " +
      f"(${tNoCensus / tCensus}%4.1fx)")
  }

  /** `runMain graft.ScaleBench cursorshard [parts] [work]` — the
    * sharded-cursor claim: per-batch cursor IO must stay FLAT as
    * partitions (and thus lifetime file count) accumulate, because a
    * scoped sync reads/writes only the batch partitions' sidecars.
    * Measures a one-partition delta sync against the same table at
    * 1/4, 1/2 and full partition counts — the pre-sharding layout
    * rewrote the whole folded-file list per sync, so its per-batch
    * cost grew with table AGE; flat timings here are the fix's
    * observable.
    */
  private def cursorShardExperiment(spark: SparkSession, work: String,
      parts: Int): Unit = {
    import org.apache.spark.sql.functions._
    val sink = s"$work/cs_sink_$parts"
    val cur = s"$work/cs_cur_$parts"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(sink))
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(cur))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def addPartition(p: Int, files: Int): Unit =
      for (fno <- 0 until files)
        spark.range(p * 1000L + fno * 100L, p * 1000L + fno * 100L + 100L)
          .select(col("id"), concat(lit("v"), col("id")).as("name"),
            lit("UPDATE").as("_op"), (col("id") + lit(p * 1000L)).as("_ts"),
            lit("f1").as("_binlog_file_internal"),
            (col("id") + lit(p * 1000L)).as("_binlog_pos_internal"),
            lit(f"2024-01-${(p % 28) + 1}%02d-p$p").as("dt"))
          .coalesce(1)
          .write.mode("append").partitionBy("dt").parquet(sink)
    println("[scale] cursorshard: partitions  sidecars  delta-sync(s)  " +
      "sidecars-rewritten")
    val checkpoints = Seq(parts / 4, parts / 2, parts).distinct
    var built = 0
    for (target <- checkpoints) {
      while (built < target) { addPartition(built, 4); built += 1 }
      // full sync brings the cursor up to date over everything so far
      graft.streaming.CurrentTable.sync(spark, sink, cur, Seq("id"),
        buckets = 64)
      val cursorDir = new java.io.File(s"$cur/_cursor")
      val sidecars = cursorDir.listFiles().count(_.getName.endsWith(".txt"))
      // the steady-state shape: one hot partition gets a delta file,
      // the batch syncs scoped to it
      val hot = "dt=2024-01-01-p0"
      val before = cursorDir.listFiles()
        .filter(_.getName.endsWith(".txt"))
        .map(f => f.getName -> f.lastModified()).toMap
      Thread.sleep(1100) // mtime granularity
      addPartition(0, 1)
      val tDelta = time(graft.streaming.CurrentTable.sync(spark, sink,
        cur, Seq("id"), scope = Some(Seq(hot))))
      val rewritten = cursorDir.listFiles()
        .filter(_.getName.endsWith(".txt"))
        .map(f => f.getName -> f.lastModified())
        .count { case (n, m) => before.get(n).forall(_ != m) }
      println(f"[scale] cursorshard: $built%10d  $sidecars%8d  " +
        f"$tDelta%13.2f  $rewritten%18d")
      require(rewritten == 1,
        s"scoped sync rewrote $rewritten sidecars at $built partitions")
    }
    println("[scale] cursorshard: flat delta-sync time + 1 sidecar " +
      "rewritten at every table age = per-batch cursor IO is " +
      "delta-sized, not table-sized")
  }

  /** `runMain graft.ScaleBench rescale [keysK] [work]` — the
    * re-bucketing claim: a table born at 8 buckets and grown far past
    * them pays O(table/8) on EVERY point lookup and — because a few-key
    * delta usually touches most of 8 buckets — O(table) on every delta
    * fold. One `CurrentTable.rescale` to 256 (a single full-table
    * rewrite, the same cost class as the table's first sync) converts
    * both to O(table·keys/256): the experiment times the same 5-key
    * lookup and the same 10-key delta sync before and after, plus the
    * rescale itself against the initial build.
    */
  private def rescaleExperiment(spark: SparkSession, work: String,
      keysK: Int): Unit = {
    import org.apache.spark.sql.functions._
    val keys = keysK * 1000L
    val sink = s"$work/rs_sink_$keysK"
    val cur = s"$work/rs_cur_$keysK"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(sink))
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(cur))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.agg(count(lit(1))).write.format("noop").mode("overwrite").save()
    def rows(ids: org.apache.spark.sql.DataFrame, tsBase: Long) =
      ids.select(col("id"), concat(lit("v"), col("id")).as("name"),
        lit("UPDATE").as("_op"), (lit(tsBase) + col("id")).as("_ts"),
        lit("f1").as("_binlog_file_internal"),
        (lit(tsBase) + col("id")).as("_binlog_pos_internal"),
        lit("2024-01-01").as("dt"))
    rows(spark.range(keys).toDF("id"), 1000000L)
      .write.mode("append").partitionBy("dt").parquet(sink)
    // born narrow: 8 buckets was right when the table was 100× smaller
    val tBuild = time(graft.streaming.CurrentTable.sync(spark, sink,
      cur, Seq("id"), buckets = 8))
    val probe = spark.range(5).toDF("id")
    def lookupOnce(): Double = time(drain(
      graft.streaming.CurrentTable.lookup(spark, cur, Seq("id"), probe)))
    def deltaOnce(ts: Long): Double = {
      rows(spark.range(37L, 47L).toDF("id"), ts)
        .write.mode("append").partitionBy("dt").parquet(sink)
      time(graft.streaming.CurrentTable.sync(spark, sink, cur, Seq("id")))
    }
    lookupOnce() // warm the read path once; both layouts then compare cold-equal
    val tLook8 = lookupOnce()
    val tDelta8 = deltaOnce(2000000L)
    val tRescale = time(require(graft.streaming.CurrentTable.rescale(
      spark, cur, Seq("id"), 256) == 256, "rescale did not apply"))
    val tLook256 = lookupOnce()
    val tDelta256 = deltaOnce(3000000L)
    val n = graft.streaming.CurrentTable.read(spark, cur).count()
    require(n == keys, s"rescale lost keys: $n != $keys")
    println(f"[scale] rescale ${keys} keys: 5-key lookup " +
      f"${tLook8}%5.2fs @8 buckets -> ${tLook256}%5.2fs @256 " +
      f"(${tLook8 / tLook256}%4.1fx); 10-key delta fold " +
      f"${tDelta8}%5.2fs -> ${tDelta256}%5.2fs " +
      f"(${tDelta8 / tDelta256}%4.1fx); the rescale itself " +
      f"${tRescale}%5.2fs vs first sync ${tBuild}%5.2fs " +
      f"(${tRescale / tBuild}%4.1fx, same full-rewrite cost class)")
  }

  /** `runMain graft.ScaleBench rollup [keysK] [work]` — the
    * maintained-rollup claim: keeping `GROUP BY cat` aggregates fresh
    * over a changing keyed table costs either a full recompute per
    * refresh (O(table), the thing warehouses schedule) or, with
    * RollupTable, whatever the sync's own delta costs plus a
    * partials-sized read. Measures: the one-time attach (full build),
    * a 10-key delta sync before vs after attach (the maintenance
    * overhead rides the fold), and serving the aggregate from the
    * rollup vs recomputing it from the table — equality asserted.
    */
  private def rollupExperiment(spark: SparkSession, work: String,
      keysK: Int): Unit = {
    import org.apache.spark.sql.functions._
    val keys = keysK * 1000L
    val sink = s"$work/ru_sink_$keysK"
    val cur = s"$work/ru_cur_$keysK"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(sink))
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(cur))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def rows(ids: org.apache.spark.sql.DataFrame, tsBase: Long) =
      ids.select(col("id"),
        concat(lit("c"), pmod(col("id"), lit(1000L))).as("cat"),
        (col("id") % 97L).cast("double").as("amount"),
        lit("UPDATE").as("_op"), (lit(tsBase) + col("id")).as("_ts"),
        lit("f1").as("_binlog_file_internal"),
        (lit(tsBase) + col("id")).as("_binlog_pos_internal"),
        lit("2024-01-01").as("dt"))
    rows(spark.range(keys).toDF("id"), 1000000L)
      .write.mode("append").partitionBy("dt").parquet(sink)
    graft.streaming.CurrentTable.sync(spark, sink, cur, Seq("id"),
      buckets = 64)
    def deltaOnce(ts: Long): Double = {
      rows(spark.range(37L, 47L).toDF("id"), ts)
        .write.mode("append").partitionBy("dt").parquet(sink)
      time(graft.streaming.CurrentTable.sync(spark, sink, cur, Seq("id")))
    }
    val tDeltaPlain = deltaOnce(2000000L)
    val spec = graft.ops.RollupTable.Spec(Seq("cat"), Seq(
      graft.ops.RollupTable.Agg("count", "*", "n"),
      graft.ops.RollupTable.Agg("sum", "amount", "total"),
      graft.ops.RollupTable.Agg("min", "amount", "lo"),
      graft.ops.RollupTable.Agg("max", "amount", "hi"),
      // the sketch measure rides the same maintenance: 97 distinct
      // amounts per group < k, so the estimate is EXACT and equality
      // with the direct aggregate below pins it at this scale too
      graft.ops.RollupTable.Agg("countd", "amount", "d_amt")))
    val tAttach = time(
      graft.ops.RollupTable.attach(spark, cur, "by_cat", spec))
    val tDeltaMaint = deltaOnce(3000000L)
    def recompute() = graft.streaming.CurrentTable.read(spark, cur)
      .groupBy("cat").agg(count(lit(1)).as("n"), sum("amount").as("total"),
        min("amount").as("lo"), max("amount").as("hi"),
        graft.functions.KmvSketch.kmvDistinct(spark,
          graft.functions.KmvSketch.md5Hash60(col("amount")), 256)
          .as("d_amt"))
    // warm both read paths once, then time
    drain(recompute())
    drain(graft.ops.RollupTable.read(spark, cur, "by_cat"))
    val tServe = time(drain(graft.ops.RollupTable.read(spark, cur, "by_cat")))
    val tRecompute = time(drain(recompute()))
    val served = graft.ops.RollupTable.read(spark, cur, "by_cat")
      .select("cat", "n", "total", "lo", "hi", "d_amt")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    val direct = recompute()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    require(served == direct, "rollup diverged from recompute")
    println(f"[scale] rollup ${keys} keys / 1000 groups: attach " +
      f"${tAttach}%5.2fs (once); 10-key delta sync ${tDeltaPlain}%5.2fs " +
      f"plain -> ${tDeltaMaint}%5.2fs maintained " +
      f"(${tDeltaMaint / tDeltaPlain}%4.2fx); serving the aggregate " +
      f"${tRecompute}%5.2fs recompute -> ${tServe}%5.2fs rollup " +
      f"(${tRecompute / tServe}%4.1fx)")
  }

  /** `runMain graft.ScaleBench index [keysK] [work]` — the secondary
    * bloom-index claim: a point lookup on a NON-key column scans
    * every bucket without it (the layout prunes by primary key
    * only); with per-bucket blooms the driver tests the probe
    * against ≤ buckets tiny bitsets and reads only candidate
    * buckets. Times the same selective probe both ways on the same
    * table — equality asserted — plus the maintenance overhead on a
    * 10-key delta sync.
    */
  private def indexExperiment(spark: SparkSession, work: String,
      keysK: Int): Unit = {
    import org.apache.spark.sql.functions._
    val keys = keysK * 1000L
    val sink = s"$work/ix_sink_$keysK"
    val cur = s"$work/ix_cur_$keysK"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(sink))
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(cur))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def rows(ids: org.apache.spark.sql.DataFrame, tsBase: Long) =
      ids.select(col("id"),
        concat(lit("u"), col("id"), lit("@example.com")).as("email"),
        lit("UPDATE").as("_op"), (lit(tsBase) + col("id")).as("_ts"),
        lit("f1").as("_binlog_file_internal"),
        (lit(tsBase) + col("id")).as("_binlog_pos_internal"),
        lit("2024-01-01").as("dt"))
    rows(spark.range(keys).toDF("id"), 1000000L)
      .write.mode("append").partitionBy("dt").parquet(sink)
    graft.streaming.CurrentTable.sync(spark, sink, cur, Seq("id"),
      buckets = 64)
    def deltaOnce(ts: Long): Double = {
      rows(spark.range(37L, 47L).toDF("id"), ts)
        .write.mode("append").partitionBy("dt").parquet(sink)
      time(graft.streaming.CurrentTable.sync(spark, sink, cur, Seq("id")))
    }
    val tDeltaPlain = deltaOnce(2000000L)
    val tAttach = time(
      graft.ops.BucketIndex.attach(spark, cur, "email"))
    val tDeltaMaint = deltaOnce(3000000L)
    import spark.implicits._
    val probe = Seq("u123457@example.com").toDF("email")
    def byIndex() = graft.ops.BucketIndex.lookupBy(spark, cur,
      "email", probe)
    def byScan() = graft.streaming.CurrentTable.read(spark, cur)
      .join(probe, Seq("email"), "left_semi")
    drain(byScan()); drain(byIndex()) // warm both paths
    val tScan = time(drain(byScan()))
    val tIndex = time(drain(byIndex()))
    val a = byIndex().select("id").collect().map(_.getLong(0)).toSet
    val b = byScan().select("id").collect().map(_.getLong(0)).toSet
    require(a == b && a == Set(123457L), s"index diverged: $a vs $b")
    val readBuckets = byIndex().inputFiles
      .flatMap(_.split('/').find(_.startsWith("kb="))).toSet.size
    println(f"[scale] index ${keys} keys / 64 buckets: attach " +
      f"${tAttach}%5.2fs (once); 10-key delta sync ${tDeltaPlain}%5.2fs " +
      f"plain -> ${tDeltaMaint}%5.2fs maintained " +
      f"(${tDeltaMaint / tDeltaPlain}%4.2fx); 1-value non-key lookup " +
      f"${tScan}%5.2fs full scan -> ${tIndex}%5.2fs via index " +
      f"(${tScan / tIndex}%4.1fx, read $readBuckets/64 buckets)")
  }

  /** `runMain graft.ScaleBench reader [keysK] [work]` — the prepared
    * point-lookup claim: a serving process probing one current table
    * repeatedly re-pays per-call driver fixed costs (orphan check,
    * root read, full bucket listing, a parquet footer open for
    * schema) through `CurrentTable.lookup`; `CurrentTable.reader`
    * pays them once and revalidates per call with one small root
    * read. Times N sequential small probes both ways, same table,
    * same keys — and one probe AFTER a fold, pinning that the handle
    * sees new data without help.
    */
  private def readerExperiment(spark: SparkSession, work: String,
      keysK: Int): Unit = {
    import org.apache.spark.sql.functions._
    val keys = keysK * 1000L
    val sink = s"$work/rd_sink_$keysK"
    val cur = s"$work/rd_cur_$keysK"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(sink))
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(cur))
    def rows(ids: org.apache.spark.sql.DataFrame, tsBase: Long) =
      ids.select(col("id"), concat(lit("v"), col("id")).as("name"),
        lit("UPDATE").as("_op"), (lit(tsBase) + col("id")).as("_ts"),
        lit("f1").as("_binlog_file_internal"),
        (lit(tsBase) + col("id")).as("_binlog_pos_internal"),
        lit("2024-01-01").as("dt"))
    rows(spark.range(keys).toDF("id"), 1000000L)
      .write.mode("append").partitionBy("dt").parquet(sink)
    graft.streaming.CurrentTable.sync(spark, sink, cur, Seq("id"),
      buckets = 256)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val n = 50
    def probes(i: Int) = spark.createDataFrame(Seq(
      Tuple1(i.toLong), Tuple1(i + 1000L), Tuple1(i + 2000L))).toDF("id")
    def drain(df: org.apache.spark.sql.DataFrame): Long = df.count()
    // warm both paths once (codegen, FS metadata cache)
    drain(graft.streaming.CurrentTable.lookup(spark, cur, Seq("id"),
      probes(0)))
    val handle = graft.streaming.CurrentTable.reader(spark, cur, Seq("id"))
    drain(handle.lookup(probes(0)))
    val tLookup = time(for (i <- 1 to n)
      require(drain(graft.streaming.CurrentTable.lookup(spark, cur,
        Seq("id"), probes(i))) == 3))
    val tReader = time(for (i <- 1 to n)
      require(drain(handle.lookup(probes(i))) == 3))
    // the handle is not a stale snapshot: a fold lands and the very
    // next call serves it
    rows(spark.range(keys, keys + 5L).toDF("id"), 9000000L)
      .write.mode("append").partitionBy("dt").parquet(sink)
    graft.streaming.CurrentTable.sync(spark, sink, cur, Seq("id"))
    require(drain(handle.lookup(
        spark.createDataFrame(Seq(Tuple1(keys + 1L))).toDF("id"))) == 1,
      "reader missed a fold")
    println(f"[scale] reader ${keys} keys, $n sequential 3-key probes: " +
      f"one-shot lookup ${tLookup}%5.2fs (${tLookup / n * 1000}%5.0f ms" +
      f"/probe) vs prepared reader ${tReader}%5.2fs " +
      f"(${tReader / n * 1000}%5.0f ms/probe, ${tLookup / tReader}%4.1fx)")
  }

  /** `runMain graft.ScaleBench indexbig [bigKeysM] [work]` — the
    * index-at-its-own-scale claim: probe cost must grow far slower
    * than the bloom sidecar, because candidate selection is
    * cluster-side — the probe hashes broadcast onto a distributed
    * sidecar scan and only candidate bucket ids (ints) reach the
    * driver. (The r13 design collected the WHOLE sidecar per probe:
    * cost ∝ sidecar bytes, ~120 GB/probe at a correctly-sized 100 TB
    * index.) Two auto-sized tables — 2M keys (~MB sidecar) and
    * `bigKeysM` million keys (default 96 ⇒ a >100 MB sidecar at
    * honest ~30% filter fill). Also times the prepared IndexReader,
    * which pins the bloom frame so repeated probes skip even the
    * distributed re-scan.
    */
  private def indexBigExperiment(spark: SparkSession, work: String,
      bigKeysM: Int): Unit = {
    import org.apache.spark.sql.functions._
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    import spark.implicits._
    val n = 10
    def probe(i: Int) = Seq(s"u${1000 + i}@example.com").toDF("email")
    // a sidecar's on-disk size is ~rows x 1.25 B at the auto sizing
    // (10 bits/row at ~30% fill is near-incompressible) — so a
    // >100 MB sidecar honestly requires tens of millions of live
    // rows, not an inflated empty filter (mostly-zero bitsets
    // RLE-compress to nothing and would fake the experiment)
    val sizes = Seq(("small", 2000000L), ("big", bigKeysM * 1000000L))
    val results = for ((label, keys) <- sizes) yield {
      val sink = s"$work/ixb_sink_$label"
      val cur = s"$work/ixb_cur_$label"
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(sink))
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(cur))
      spark.range(keys).select(col("id"),
          concat(lit("u"), col("id"), lit("@example.com")).as("email"),
          lit("CREATE").as("_op"), (lit(1000L) + col("id")).as("_ts"),
          lit("f1").as("_binlog_file_internal"),
          col("id").as("_binlog_pos_internal"),
          lit("2024-01-01").as("dt"))
        .write.mode("append").partitionBy("dt").parquet(sink)
      graft.streaming.CurrentTable.sync(spark, sink, cur, Seq("id"),
        buckets = 256)
      // 32 groups so maintenance IO is measurable per group (auto
      // would give 1-2 at this size; a 100 TB sidecar auto-sizes to
      // the 1024 cap)
      val tAttach = time(graft.ops.BucketIndex.attach(spark, cur,
        "email", numGroups = 32))
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val ixDir = new java.io.File(s"$cur/_index/email")
      def sidecar() = walk(ixDir).filter(_.getName.endsWith(".parquet"))
      val files = sidecar().size
      val mb = sidecar().map(_.length()).sum / 1e6
      def oneShot(i: Int): Long = graft.ops.BucketIndex.lookupBy(spark,
        cur, "email", probe(i)).count()
      require(oneShot(0) == 1) // warm
      val tProbe = time(for (i <- 1 to n) require(oneShot(i) == 1))
      val rd = graft.ops.BucketIndex.reader(spark, cur, "email")
      require(rd.lookup(probe(0)).count() == 1) // warm + pin
      val tReader = time(for (i <- 1 to n)
        require(rd.lookup(probe(i)).count() == 1))
      rd.close()
      // maintenance at delta grain: a 10-key sync touches ≤ 10 of the
      // 32 groups — the rewritten bytes are the touched groups', not
      // the sidecar's (pre-grouping, every sync re-wrote all of it)
      val preBytes = sidecar().map(_.length()).sum
      val preNames = sidecar().map(_.getPath).toSet
      spark.range(keys, keys + 10L).select(col("id"),
          concat(lit("u"), col("id"), lit("@example.com")).as("email"),
          lit("CREATE").as("_op"), (lit(9000000L) + col("id")).as("_ts"),
          lit("f1").as("_binlog_file_internal"),
          col("id").as("_binlog_pos_internal"),
          lit("2024-01-02").as("dt"))
        .write.mode("append").partitionBy("dt").parquet(sink)
      val tDelta = time(graft.streaming.CurrentTable.sync(spark, sink,
        cur, Seq("id")))
      val rewrittenMb = sidecar().filterNot(f => preNames(f.getPath))
        .map(_.length()).sum / 1e6
      println(f"[scale] indexbig $label: $keys keys / 256 buckets / " +
        f"32 groups, attach ${tAttach}%6.1fs, sidecar ${mb}%7.1f MB " +
        f"in $files file(s): lookupBy ${tProbe / n * 1000}%6.0f " +
        f"ms/probe, IndexReader ${tReader / n * 1000}%6.0f ms/probe; " +
        f"10-key delta sync ${tDelta}%5.1fs rewrote " +
        f"${rewrittenMb}%7.1f of ${preBytes / 1e6}%7.1f MB")
      (mb, tProbe / n, tReader / n)
    }
    val (mb0, p0, r0) = results(0); val (mb1, p1, r1) = results(1)
    println(f"[scale] indexbig: ${mb1 / mb0}%4.0fx sidecar growth -> " +
      f"${p1 / p0}%4.2fx one-shot probe, ${r1 / r0}%4.2fx prepared " +
      "probe (r13's driver-side selection moved the whole sidecar per " +
      "probe: cost would track the bytes)")
  }

  /** `runMain graft.ScaleBench indexskew [keysM] [work]` — the
    * skew-sizing claim: auto-sizing designs for the p99 per-bucket
    * live count, so the HOT bucket of a key-skewed table keeps ~1%
    * fpp where the global-average rule degrades it toward coin-flip
    * candidacy — on exactly the bucket most probes light up. Measured
    * A/B through the public API: the average-sized variant attaches
    * with `numBits` forced to what the r14 rule would have picked,
    * the p99 variant is the plain auto attach; both probe the same
    * absent values and count how often the hot bucket enters the
    * candidate set (every hit = reading the biggest bucket for
    * nothing). Skew fixture: `keysM` million uniform keys into 64
    * buckets, then every bucket but the hottest thinned to a tenth
    * with DELETEs — built distributedly (the doomed-id frame never
    * touches the driver).
    */
  private def indexSkewExperiment(spark: SparkSession, work: String,
      keysM: Int): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val keys = keysM * 1000000L
    val sink = s"$work/ixs_sink"
    val cur = s"$work/ixs_cur"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(sink))
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(cur))
    def envelope(df: org.apache.spark.sql.DataFrame, op: String,
        tsBase: Long, dt: String) =
      df.select(col("id"),
        concat(lit("u"), col("id"), lit("@example.com")).as("email"),
        lit(op).as("_op"), (lit(tsBase) + col("id")).as("_ts"),
        lit("f1").as("_binlog_file_internal"),
        col("id").as("_binlog_pos_internal"), lit(dt).as("dt"))
    envelope(spark.range(keys).toDF, "CREATE", 1000L, "2024-01-01")
      .write.mode("append").partitionBy("dt").parquet(sink)
    graft.streaming.CurrentTable.sync(spark, sink, cur, Seq("id"),
      buckets = 64)
    val live0 = graft.streaming.CurrentTable.read(spark, cur)
    val hot = live0.groupBy("kb").count()
      .orderBy(desc("count")).limit(1).collect()(0).getInt(0)
    envelope(live0.filter(col("kb") =!= hot &&
        pmod(col("id"), lit(10)) =!= 0).select("id"),
      "DELETE", 500000000L, "2024-01-02")
      .write.mode("append").partitionBy("dt").parquet(sink)
    graft.streaming.CurrentTable.sync(spark, sink, cur, Seq("id"))
    val counts = graft.streaming.CurrentTable.read(spark, cur)
      .groupBy("kb").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val hotRows = counts(hot)
    val avgRows = counts.values.sum / 64
    def bitsOf(): Int = {
      // read-all-and-close (the specs' pattern) — a held-open
      // Source leaks a file handle per measured variant
      val lines = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(s"$cur/_index/email/_meta.txt"))
      lines.toArray.map(_.toString)
        .find(_.startsWith("bits=")).get.stripPrefix("bits=").toInt
    }
    val nProbes = 40
    def measure(label: String, tAttach: Double): Unit = {
      var hotHits = 0
      var cand = 0L
      for (i <- 1 to nProbes) {
        val c = graft.ops.BucketIndex.candidateFrameFor(spark, cur,
            "email", Seq(s"ghost$i@example.com").toDF("email"))
          .collect().map(_.getInt(0)).distinct
        cand += c.length
        if (c.contains(hot)) hotHits += 1
      }
      println(f"[scale] indexskew $label: ${bitsOf()} bits/shard, " +
        f"attach ${tAttach}%5.1fs -> hot-bucket candidacy " +
        f"$hotHits/$nProbes absent probes, " +
        f"${cand.toDouble / nProbes}%5.2f candidate buckets/probe " +
        f"(hot $hotRows rows, avg $avgRows)")
    }
    // A: the r14 global-average rule, forced through the public knob —
    // autoSize ITSELF fed the average instead of the p99, so the A/B
    // can never drift from the real sizing arithmetic
    val avgBits = graft.ops.BucketIndex.autoSize(avgRows)._1
    val tAvg = time(graft.ops.BucketIndex.attach(spark, cur, "email",
      numBits = avgBits))
    measure("avg-sized", tAvg)
    graft.ops.BucketIndex.detach(spark, cur, "email")
    // B: the p99 auto sizing
    val tAuto = time(graft.ops.BucketIndex.attach(spark, cur, "email"))
    measure("p99-sized", tAuto)
  }

  /** `runMain graft.ScaleBench evolvedreader [keysK] [work]` — the
    * cross-fork serving claim: `lookupEvolved` re-pays PER FORK and
    * PER CALL the fixed driver costs (orphan/marker checks, root
    * reads, full bucket listings, footer opens) a prepared
    * `CurrentTable.evolvedReader` pays once and revalidates with one
    * small root read per fork. Times N sequential small probes both
    * ways over a 3-fork table, then lands a fold on one fork and
    * pins that the held handle serves it on the very next call.
    */
  private def evolvedReaderExperiment(spark: SparkSession, work: String,
      keysK: Int): Unit = {
    import org.apache.spark.sql.functions._
    val keys = keysK * 1000L
    val root = s"$work/evr"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // base + two forks, each adding a column, each with its own
    // maintained current table (the runbook shape q126/q127 pin)
    val dirs = Seq(s"$root/s1_db__t", s"$root/s1_db__t_v20240301",
      s"$root/s1_db__t_v20240601")
    for ((dir, f) <- dirs.zipWithIndex) {
      val slice = spark.range(f * keys / 3, (f + 1) * keys / 3)
        .select(col("id"), concat(lit(s"v$f"), col("id")).as("name"),
          lit("UPDATE").as("_op"),
          (lit(1000000L * (f + 1)) + col("id")).as("_ts"),
          lit("f1").as("_binlog_file_internal"),
          col("id").as("_binlog_pos_internal"),
          lit("2024-01-01").as("dt"))
      val shaped = (0 until f).foldLeft(slice)((d, i) =>
        d.withColumn(s"extra$i", col("id") * (i + 2)))
      shaped.write.mode("append").partitionBy("dt").parquet(dir)
      graft.streaming.CurrentTable.sync(spark, dir, s"${dir}__current",
        Seq("id"), buckets = 64)
    }
    val n = 25
    def probes(i: Int) = spark.createDataFrame(Seq(
      Tuple1(i.toLong), Tuple1(i + keys / 3), Tuple1(i + 2 * keys / 3)))
      .toDF("id")
    def drain(df: org.apache.spark.sql.DataFrame): Long = df.count()
    def oneShot(i: Int): Long =
      drain(graft.streaming.CurrentTable.lookupEvolved(spark, root,
        "s1", "db", "t", Seq("id"), probes(i)))
    require(oneShot(0) == 3) // warm
    val handle = graft.streaming.CurrentTable.evolvedReader(spark, root,
      "s1", "db", "t", Seq("id"))
    require(drain(handle.lookup(probes(0))) == 3)
    val tOneShot = time(for (i <- 1 to n) require(oneShot(i) == 3))
    val tHandle = time(for (i <- 1 to n)
      require(drain(handle.lookup(probes(i))) == 3))
    // a fold on one fork: the held handle serves it next call (rows
    // carry the fork's full schema — a narrower file would be a DDL
    // event, not a fold)
    val late = spark.range(keys, keys + 5L)
      .select(col("id"), concat(lit("late"), col("id")).as("name"),
        lit("UPDATE").as("_op"), (lit(9000000L) + col("id")).as("_ts"),
        lit("f1").as("_binlog_file_internal"),
        col("id").as("_binlog_pos_internal"),
        lit("2024-01-02").as("dt"))
    (0 until 2).foldLeft(late)((d, i) =>
        d.withColumn(s"extra$i", col("id") * (i + 2)))
      .write.mode("append").partitionBy("dt").parquet(dirs.last)
    graft.streaming.CurrentTable.sync(spark, dirs.last,
      s"${dirs.last}__current", Seq("id"))
    require(drain(handle.lookup(spark.createDataFrame(
        Seq(Tuple1(keys + 1L))).toDF("id"))) == 1,
      "evolvedReader missed a fold")
    println(f"[scale] evolvedreader ${keys} keys x 3 forks, $n " +
      f"sequential 3-key probes: one-shot lookupEvolved ${tOneShot}%5.2fs " +
      f"(${tOneShot / n * 1000}%5.0f ms/probe) vs prepared handle " +
      f"${tHandle}%5.2fs (${tHandle / n * 1000}%5.0f ms/probe, " +
      f"${tOneShot / tHandle}%4.1fx)")
  }

  /** `runMain graft.ScaleBench ctorder [keysK] [work]` — the
    * within-bucket order claim: a current table whose buckets are
    * sorted on a column serves narrow filters on that column by
    * parquet row-group/page stat pruning; an unsorted table decodes
    * everything. Same data, same buckets, same filter — only the
    * persisted `orderBy` differs.
    */
  private def ctOrderExperiment(spark: SparkSession, work: String,
      keysK: Int): Unit = {
    import org.apache.spark.sql.functions._
    val keys = keysK * 1000L
    val sink = s"$work/cto_sink_$keysK"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(sink))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.agg(count(lit(1))).write.format("noop").mode("overwrite").save()
    def steady(f: => org.apache.spark.sql.DataFrame): Double = {
      drain(f); time(drain(f))
    }
    // value column decorrelated from both id and bucket (a large odd
    // multiplier mod a domain) so only the SORT can make file stats
    // tight on it
    spark.range(keys).select(col("id"),
        (col("id") * 2654435761L % 1000000L).as("v"),
        lit("CREATE").as("_op"), (lit(1000L) + col("id")).as("_ts"),
        lit("f1").as("_binlog_file_internal"),
        col("id").as("_binlog_pos_internal"),
        lit("2024-01-01").as("dt"))
      .write.mode("append").partitionBy("dt").parquet(sink)
    val times = for (ordered <- Seq(false, true)) yield {
      val cur = s"$work/cto_cur_${keysK}_$ordered"
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(cur))
      val tSync = time(graft.streaming.CurrentTable.sync(spark, sink,
        cur, Seq("id"), buckets = 16,
        orderBy = if (ordered) Seq("v") else Nil))
      // 0.1% of the value domain — the "recent slice" shape
      val tScan = steady(graft.streaming.CurrentTable.read(spark, cur)
        .filter(col("v").between(500000L, 500999L)))
      (tSync, tScan)
    }
    val Seq((sU, fU), (sS, fS)) = times
    println(f"[scale] ctorder ${keys} keys, 16 buckets, 0.1%% filter " +
      f"on v: unsorted sync ${sU}%5.2fs scan ${fU}%5.2fs; sorted sync " +
      f"${sS}%5.2fs scan ${fS}%5.2fs (${fU / fS}%4.2fx scan win; the " +
      "sort rides the fold's existing per-bucket exchange)")
  }

  /** `runMain graft.ScaleBench evolved [keysK] [work]` — the
    * cross-fork current-state claim (`CurrentTable.readEvolved`,
    * q126): merging the forks' maintained CURRENT tables moves
    * ≤ #keys × #forks rows, while the full-log alternative
    * (`EvolvedRead.stateAll`) re-reads and re-ranks the WHOLE
    * changelog per query. Cost of the log path ∝ log DEPTH, cost of
    * the merge ∝ key count — so the experiment sweeps depth at fixed
    * keys to expose the crossover, rather than cherry-picking one
    * depth where either side happens to win.
    */
  private def evolvedExperiment(spark: SparkSession, work: String,
      keysK: Int): Unit = {
    import org.apache.spark.sql.functions._
    val keys = keysK * 1000L
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.agg(count(lit(1))).write.format("noop").mode("overwrite").save()
    // steady-state: first pass absorbs page-cache + codegen for each
    // plan shape, second pass measures the plan
    def steady(f: => org.apache.spark.sql.DataFrame): Double = {
      drain(f); time(drain(f))
    }
    println("[scale] evolved: log-depth  sync-once(s)  readEvolved(s)  " +
      "stateAll(s)  ratio")
    for (versions <- Seq(5, 25)) {
      val root = s"$work/ev_root_${keysK}_$versions"
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root))
      val base = s"$root/ev_db__t"
      val fork = s"$root/ev_db__t_v20240701"
      // base era: `versions` full versions of every key, pre-evolution
      // schema
      for (v <- 1 to versions)
        spark.range(keys).select(col("id"),
            concat(lit(s"v$v-"), col("id")).as("name"),
            lit("UPDATE").as("_op"),
            (lit(v * 10000000L) + col("id")).as("_ts"),
            lit("f1").as("_binlog_file_internal"),
            (lit(v * 10000000L) + col("id")).as("_binlog_pos_internal"),
            lit(f"2024-01-$v%02d").as("dt"))
          .write.mode("append").partitionBy("dt").parquet(base)
      // fork era: half the keys change under the evolved schema (adds
      // `extra`), and every 100th id is deleted post-fork — the
      // fork's tombstones must keep those keys dead across the merge
      spark.range(keys).filter(col("id") % 2 === 0)
        .select(col("id"), concat(lit("f-"), col("id")).as("name"),
          when(col("id") % 100 === 0, "DELETE").otherwise("UPDATE")
            .as("_op"),
          (lit(900000000L) + col("id")).as("_ts"),
          lit("f2").as("_binlog_file_internal"),
          (lit(900000000L) + col("id")).as("_binlog_pos_internal"),
          (col("id") * 2).as("extra"), lit("2024-07-01").as("dt"))
        .write.mode("append").partitionBy("dt").parquet(fork)
      val tSync = time {
        graft.streaming.CurrentTable.sync(spark, base,
          s"${base}__current", Seq("id"), buckets = 128)
        graft.streaming.CurrentTable.sync(spark, fork,
          s"${fork}__current", Seq("id"), buckets = 128)
      }
      val tEv = steady(graft.streaming.CurrentTable.readEvolved(
        spark, root, "ev", "db", "t", Seq("id")))
      val tLog = steady(graft.ops.EvolvedRead.stateAll(spark, root,
        "ev", "db", "t", Seq("id"), Long.MaxValue))
      val n = graft.streaming.CurrentTable.readEvolved(spark, root,
        "ev", "db", "t", Seq("id")).count()
      require(n == keys - keys / 100,
        s"evolved state rows $n != ${keys - keys / 100}")
      println(f"[scale] evolved: ${versions + 1}%9d  ${tSync}%12.2f  " +
        f"${tEv}%14.2f  ${tLog}%11.2f  ${tLog / tEv}%5.2fx")
      // cross-fork POINT lookups: bucket-pruned per fork (<= probe
      // buckets of 128 read per fork) vs the full evolved read +
      // semi-join a caller without lookupEvolved would write
      val probe = spark.range(10).select((col("id") * 97 % keys).as("id"))
      val tLk = steady(graft.streaming.CurrentTable.lookupEvolved(
        spark, root, "ev", "db", "t", Seq("id"), probe))
      val tLkScan = steady(graft.streaming.CurrentTable.readEvolved(
          spark, root, "ev", "db", "t", Seq("id"))
        .join(probe, Seq("id"), "left_semi"))
      println(f"[scale] evolved: 10-key lookupEvolved ${tLk}%5.2fs vs " +
        f"readEvolved+semi-join ${tLkScan}%5.2fs " +
        f"(${tLkScan / tLk}%4.1fx) at depth ${versions + 1}")
    }
    println("[scale] evolved: readEvolved is flat in log depth (reads " +
      "<= keys x forks current rows); stateAll grows with every " +
      "change ever written — the sync is paid once, the read is paid " +
      "per query")
  }

  /** Auto-compaction under a many-small-batches ingest: the same feed
    * replayed one file per micro-batch with the compactor off vs on —
    * ingest overhead (the rewrites ride the batch loop), final sink
    * file count (the thing the feature bounds), and the read-side
    * wall a fragmented vs compacted table costs a full scan.
    */
  private def autoCompactExperiment(spark: SparkSession, work: String,
      batches: Int): Unit = {
    import org.apache.spark.sql.functions._
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$base/events.parquet")
    val feed = s"$work/acfeed_$batches"
    if (!new java.io.File(feed, "_SUCCESS").exists())
      Bench.envelopeLines(events, 1).repartition(batches)
        .write.mode("overwrite").text(feed)
    val rows = events.count()
    def one(label: String, after: Int): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-scale-ac-")
      val p = new graft.streaming.CdcPipeline(spark,
        graft.streaming.CdcConfig("ac", Bench.eventsRegistry(1),
          s"$tmp/sink", compactAfterFiles = after))
      val t0 = System.nanoTime()
      p.runAvailableNow(feed, s"$tmp/ck") // one feed file per batch
      val tIngest = (System.nanoTime() - t0) / 1e9
      require(p.recordCount == rows,
        s"ingest row mismatch: ${p.recordCount} != $rows")
      val dir = s"$tmp/sink/ac_bench__events"
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      val nFiles =
        try walk.toArray.map(_.toString)
          .count(s => s.endsWith(".parquet") && !s.contains("._"))
        finally walk.close()
      val t1 = System.nanoTime()
      spark.read.parquet(dir).agg(count(lit(1)), sum("value")).collect()
      val tRead = (System.nanoTime() - t1) / 1e9
      println(f"[scale] autocompact $label ($batches batches): " +
        f"ingest ${tIngest}%6.2fs, sink files $nFiles%5d, " +
        f"full read ${tRead}%5.2fs")
    }
    one("off     ", 0)
    one("after=12", 12)
  }

  /** Index-served vs corpus-scan BM25: the maintained inverted index
    * pays one tokenize+group build, then each query touches only its
    * terms' postings buckets — the full-scan kernel re-tokenizes the
    * whole corpus per query. Synthetic corpus: `docs` documents of
    * 100 zipf-ish tokens over a 1000-term vocabulary (real documents
    * run hundreds of tokens; the scan side's cost is ∝ corpus TOKENS,
    * the index side's ∝ matching postings).
    */
  private def textIndexExperiment(spark: SparkSession, work: String,
      docsK: Int): Unit = {
    import org.apache.spark.sql.functions._
    val n = docsK * 1000L
    val dir = s"$work/ti_docs_$docsK"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(99)),
          i => concat(lit("t"),
            pmod(pmod(hash(col("id") * 31 + i), lit(1009)) *
              pmod(hash(i), lit(7)), lit(1000))))).as("text"))
        .write.mode("overwrite").parquet(dir)
    }
    val docs = spark.read.parquet(dir)
    docs.write.format("noop").mode("overwrite").save() // warm the read
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val idx = s"$work/ti_idx_$docsK"
    val tBuild = time(graft.ops.TextIndex.build(spark, docs, idx))
    val terms = Seq("t1", "t42", "t999")
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    drain(graft.api.Graft.bm25(docs, terms)) // warm
    val tScan = time(drain(graft.api.Graft.bm25(docs, terms)))
    drain(graft.ops.TextIndex.search(spark, idx, terms)) // warm
    val tIdx = time(drain(graft.ops.TextIndex.search(spark, idx, terms)))
    val tDelta = time(graft.ops.TextIndex.applyDelta(spark, idx,
      docs.limit(1000), docs.select("doc_id").limit(100)))
    println(f"[scale] textindex ${n} docs: build ${tBuild}%5.2fs, " +
      f"query scan ${tScan}%5.2fs vs index ${tIdx}%5.2fs " +
      f"(${tScan / tIdx}%4.1fx), delta(1k up/100 del) ${tDelta}%5.2fs")
  }

  /** Fanout A/B for the inverted index's postings bucket count — the
    * round-16 knob: the SAME corpus built at a deliberately-undersized
    * fanout vs at the fanout [[graft.ops.TextIndex.rebuildAdvice]]
    * itself recommends (the compared variant is FED by the public
    * advisory, so the comparison can never drift from the real sizing
    * arithmetic — the indexskew discipline). A term query reads its
    * terms' buckets whole, so per-query postings IO ∝ corpus/fanout;
    * the advisory's recommendation should buy back ~(rec/small)× of
    * that scan.
    */
  private def textIndexFanoutExperiment(spark: SparkSession, work: String,
      docsK: Int): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val n = docsK * 1000L
    val dir = s"$work/tif_docs_$docsK"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(99)),
          i => concat(lit("t"),
            pmod(pmod(hash(col("id") * 31 + i), lit(1009)) *
              pmod(hash(i), lit(7)), lit(1000))))).as("text"))
        .write.mode("overwrite").parquet(dir)
    }
    val docs = spark.read.parquet(dir)
    docs.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val terms = Seq("t1", "t42", "t999")
    // pruned postings bytes per query: the terms' tb= dirs' on-disk
    // size — the IO a term lookup pays as laid out, the metric that
    // dominates at corpus scale (wall-clock at bench scale carries
    // per-query fixed costs — census aggregate, broadcasts, job
    // setup — that fanout cannot and should not change)
    def prunedBytes(idx: String, nb: Int): Long = {
      // the index's OWN routing — a re-derived hash expression here
      // could silently drift and report garbage IO numbers
      val tbs = graft.ops.TextIndex.bucketsOf(spark, terms, nb)
      // Hadoop FS listing, not java.io.File: a local-only listing
      // would silently report 0 MB if this bench ever ran against an
      // HDFS/S3 work dir — a wrong number is worse than a slow one
      val conf = spark.sessionState.newHadoopConf()
      tbs.map { tb =>
        val p = new org.apache.hadoop.fs.Path(s"$idx/postings/tb=$tb")
        val fs = p.getFileSystem(conf)
        if (!fs.exists(p)) 0L
        else fs.listStatus(p)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .map(_.getLen).sum
      }.sum
    }
    def measure(nb: Int): (Double, Double, Long) = {
      val idx = s"$work/tif_idx_${docsK}_$nb"
      val tBuild = time(
        graft.ops.TextIndex.build(spark, docs, idx, termBuckets = nb))
      drain(graft.ops.TextIndex.search(spark, idx, terms)) // warm
      val tQ = (1 to 3).map(_ =>
        time(drain(graft.ops.TextIndex.search(spark, idx, terms)))).min
      (tBuild, tQ, prunedBytes(idx, nb))
    }
    val small = 4
    val (bSmall, qSmall, ioSmall) = measure(small)
    val st = graft.ops.TextIndex.loadStats(spark,
      s"$work/tif_idx_${docsK}_$small")
    // target sized so ~1M posting rows land per bucket at the
    // recommendation — a plausible serving budget
    val rec = graft.ops.TextIndex.rebuildAdvice(st, 1000000L)
      .getOrElse(sys.error(s"advisory silent at $st — raise docsK"))
      .termBuckets
    val (bRec, qRec, ioRec) = measure(rec)
    println(f"[scale] textindexfanout ${n} docs " +
      f"(${st.postingRows} postings): fanout $small -> query " +
      f"${qSmall}%5.2fs / ${ioSmall / 1048576}%d MB postings read " +
      f"(build ${bSmall}%5.2fs); advisory-recommended fanout $rec -> " +
      f"query ${qRec}%5.2fs / ${ioRec / 1048576}%d MB " +
      f"(build ${bRec}%5.2fs): ${qSmall / qRec}%4.2fx time, " +
      f"${ioSmall.toDouble / math.max(1L, ioRec)}%4.1fx IO")
  }

  /** Convergence A/B for the round-17 SKEW FLOOR — the indexskew
    * discipline applied to the advisory LOOP itself: a corpus whose
    * vocabulary deliberately collision-concentrates at a small fanout
    * (terms picked into ONE bucket with the index's OWN routing,
    * `TextIndex.bucketOfTerms`) trips the p99 band while volume alone
    * fits the current buckets — a SKEW-driven grow. The experiment
    * then ACTS on the advisory's recommendation exactly as
    * `Graft.textIndexHealth` spells it (fanout AND floor into the
    * fresh build) and re-measures: pass = the floored index reads
    * back SILENT in one step, while the SAME measured stats with the
    * floor stripped advise shrinking below the count that just
    * tripped — the cron oscillation the floor closes, demonstrated on
    * real measured postings, not a fixture. Self-validating: every
    * claimed shape is require()d, so a drift in the advisory
    * arithmetic fails the run instead of printing a stale story.
    */
  private def textIndexFloorExperiment(spark: SparkSession, work: String,
      docsK: Int): Unit = {
    import org.apache.spark.sql.functions._
    import graft.ops.TextIndex
    val n = docsK * 1000L
    val nbSmall = 4
    // vocabulary engineered with the index's own routing: ~300 terms
    // that all hash into one bucket at fanout 4, plus a few spread
    // terms so no bucket is empty
    val perTerm = TextIndex.bucketOfTerms(spark,
      (0 until 4000).map(i => s"term$i"), nbSmall)
    val hotBucket = perTerm.values.head
    // the "floored re-measurement is silent" require below needs the
    // hot postings to split ~evenly between the hot bucket's two
    // mod-(2*nb) residues after the grow — xxhash64 guarantees no
    // such balance, so the hot terms are picked in PAIRS, half per
    // residue, verified with the index's own routing at the grown
    // fanout: a lopsided random draw (>~200/100) would keep p99 over
    // the trip line at fanout 8 and fail the run against the FIXTURE,
    // not the advisory
    val hotAll = perTerm.collect {
      case (t, b) if b == hotBucket => t }.toSeq.sorted
    val grownOf = TextIndex.bucketOfTerms(spark, hotAll, 2 * nbSmall)
    val (resLo, resHi) = hotAll.partition(t => grownOf(t) == hotBucket)
    val hotTerms = (resLo.take(150) ++ resHi.take(150)).sorted
    val coldTerms = perTerm.collect {
      case (t, b) if b != hotBucket => t }.toSeq.sorted.take(30)
    require(resLo.size >= 150 && resHi.size >= 150 &&
        coldTerms.size == 30,
      s"vocabulary too small: ${resLo.size}/${resHi.size} hot " +
        s"residues / ${coldTerms.size} cold")
    val hotLit = array(hotTerms.map(lit): _*)
    val coldLit = array(coldTerms.map(lit): _*)
    // 9 hot terms + 1 cold term per doc, deterministic by id — ~90%
    // of postings land in the hot bucket at fanout 4
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ",
        (0 until 9).map(i => element_at(hotLit,
          (pmod(col("id") * 7 + i, lit(hotTerms.size)) + 1)
            .cast("int"))) :+
          element_at(coldLit,
            (pmod(col("id"), lit(coldTerms.size)) + 1).cast("int")): _*)
        .as("text"))
    val small = s"$work/tifl_idx_${docsK}_4"
    TextIndex.build(spark, docs, small, termBuckets = nbSmall)
    val st4 = TextIndex.loadStats(spark, small)
    val target = 3L * n // ideal = round(10n/3n) = 3 fits 4 buckets
    val grow = TextIndex.rebuildAdvice(st4, target).getOrElse(
      sys.error(s"skew grow must fire at $st4"))
    require(grow.termBuckets == 2 * nbSmall &&
      grow.termBucketsFloor == grow.termBuckets,
      s"expected a skew grow flooring at its own recommendation: $grow")
    // act on the advice EXACTLY as the health check spells it
    val grown = s"$work/tifl_idx_${docsK}_${grow.termBuckets}"
    TextIndex.build(spark, docs, grown,
      termBuckets = grow.termBuckets,
      termBucketsFloor = grow.termBucketsFloor)
    val st8 = TextIndex.loadStats(spark, grown)
    val floored = TextIndex.rebuildAdvice(st8, target)
    val stripped = TextIndex.rebuildAdvice(
      st8.copy(termBucketsFloor = 0), target)
    require(floored.isEmpty,
      s"floored re-measurement must be silent, got $floored at $st8")
    require(stripped.exists(_.termBuckets <= nbSmall),
      s"floor-stripped stats must reproduce the shrink-back: $stripped")
    println(f"[scale] textindexfloor ${n} docs " +
      f"(${st4.postingRows} postings): fanout 4 p99 share " +
      f"${100.0 * st4.p99Rows / st4.postingRows}%.0f%% -> skew grow " +
      f"Rebuild(${grow.termBuckets}, floor ${grow.termBucketsFloor}) " +
      f"(ideal fits 4 buckets: collision skew, not volume); acted on " +
      f"-> floored advice None (converged in ONE step); same measured " +
      f"stats floor-stripped -> ${stripped.get} = shrink back below " +
      "the count that just tripped, the cron loop the floor closes")
  }

  /** `runMain graft.ScaleBench indexcompact [docsK] [work]` — the
    * WHEN-to-compact advisory measured end to end on real churn (the
    * `textindexfloor` discipline applied to the family's other
    * maintenance verdict, shared by all three maintained indexes via
    * [[graft.ops.IndexCompaction]]): a text index whose corpus was
    * half-rewritten TWICE carries a tombstone backlog of exactly its
    * live row count — the 2× read-amplification line — so the
    * one-call `Graft.textIndexMaintenance` (round 19; the experiment
    * consumes the prioritized verdict exactly as a fleet cron would)
    * must verdict COMPACT-FIRST with the exact reclaimable count, the
    * as-laid-out raw rows must be 2× the live rows, acting on the
    * advised in-place call must fold the backlog away (raw == live,
    * zero tombstones), and the next maintenance window must read back
    * SILENT on both axes (the deferred sizing measurement lands
    * in-band on the folded layout). Search wall-clock before/after is printed (the
    * postings scan halves; fixed per-query work dampens the ratio on
    * a warm local box — the row counts are the term that scales).
    * Every claimed shape is require()d, so advisory drift fails the
    * run instead of printing a stale story.
    */
  private def indexCompactExperiment(spark: SparkSession, work: String,
      docsK: Int): Unit = {
    import org.apache.spark.sql.functions._
    import graft.ops.TextIndex
    import graft.api.Graft
    require(docsK > 0, s"indexcompact needs docsK > 0, got $docsK")
    val n = docsK * 1000L
    // 10 DISTINCT terms per doc (10 consecutive ints mod a 1000-term
    // vocabulary), shifted per rewrite wave so updates really replace
    // the doc's postings
    def docs(shift: Int,
        ids: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      spark.range(n).filter(ids(col("id")))
        .select(col("id").as("doc_id"), concat_ws(" ",
          (0 until 10).map(j => concat(lit("w"),
            pmod(col("id") * 13 + j + shift, lit(1000)))): _*).as("text"))
    val all = (_: org.apache.spark.sql.Column) => lit(true)
    val evens = (c: org.apache.spark.sql.Column) => c % 2 === 0
    val dir = s"$work/ticompact_$docsK"
    TextIndex.build(spark, docs(0, all), dir)
    // the sizing target rides the corpus (the live mean rows/bucket),
    // so the SIZING axis is deterministically in-band at any docsK —
    // ideal == current fanout, p99/mean ≈ 1.7 on the uniform
    // vocabulary — and the one-call maintenance verdict isolates the
    // COMPACT axis this experiment measures (round 19: the experiment
    // consumes Graft.textIndexMaintenance, the prioritized one-call,
    // so the compact-before-resize ordering is exercised at scale,
    // not just in GraftApiSpec's 60-doc fixture)
    val target = math.max(1L, 10L * n / TextIndex.TermBuckets)
    require(Graft.textIndexMaintenance(spark, dir, target).isEmpty,
      "a fresh index must measure silent on both axes")
    // churn: the even half of the corpus rewritten twice — raw grows
    // to 2x the live postings (10n + 5n + 5n raw vs 10n live), plus
    // n tombstone rows: backlog 11n >= live 10n, the family threshold
    val noDel = spark.range(0).select(col("id").as("doc_id"))
    TextIndex.applyDelta(spark, dir, docs(7, evens), noDel)
    TextIndex.applyDelta(spark, dir, docs(14, evens), noDel)
    val terms = Seq("w1", "w501", "w998")
    def timeSearch(): Double = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      TextIndex.search(spark, dir, terms)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min
    timeSearch() // untimed warmup (JIT + page cache)
    val tBefore = timeSearch()
    val h = Graft.textIndexMaintenance(spark, dir, target) match {
      case Some(Graft.CompactFirst(health)) => health
      case other => sys.error(
        s"a 2x-backlogged index must verdict compact-first, got $other")
    }
    require(h.stats.rawRows == 2 * h.stats.liveRows &&
      h.stats.liveRows == 10 * n && h.stats.tombstoneRows == n &&
      h.recommended == 11 * n,
      s"expected raw 2x live (${20 * n}/${10 * n}) + $n tombstones: $h")
    // act EXACTLY as the health check spells it (in place, no swap)
    TextIndex.compact(spark, dir)
    val after = TextIndex.compactStats(spark, dir)
    require(after.rawRows == 10 * n && after.liveRows == 10 * n &&
      after.tombstoneRows == 0L,
      s"compact must fold the backlog away: $after")
    // the pure silence verdict over the stats just measured — a
    // second one-call health here would re-scan 2M postings between
    // the two timed searches for numbers `after` already holds
    require(graft.ops.IndexCompaction.compactAdvice(after).isEmpty,
      "acted-on compact advice must re-measure silent")
    val tAfter = timeSearch()
    // the NEXT maintenance window (timed searches done): the one call
    // must read silence on BOTH axes — no compact owed, and the
    // deferred sizing measurement lands in-band on the folded layout
    require(Graft.textIndexMaintenance(spark, dir, target).isEmpty,
      "post-compact maintenance must converge to silence on both axes")
    println(f"[scale] indexcompact ${n} docs: churn left raw " +
      f"${h.stats.rawRows} = 2.0x live ${h.stats.liveRows} postings " +
      f"+ ${h.stats.tombstoneRows} tombstones -> the one-call " +
      f"maintenance verdicts COMPACT-FIRST (reclaimable " +
      f"${h.recommended}, sizing deferred); acted on in place -> raw " +
      f"${after.rawRows} == live, next-window verdict None on both " +
      f"axes (converged); 3-term search $tBefore%.2fs as laid out vs " +
      f"$tAfter%.2fs compacted (${tBefore / tAfter}%.2fx)")
  }

  private def zonemapExperiment(spark: SparkSession, work: String,
      millions: Int): Unit = {
    import org.apache.spark.sql.functions._
    import graft.ops.{ZOrder, ZoneMaps}
    val n = millions * 1000000L
    val dir = s"$work/zm_data_$millions"
    val man = s"$work/zm_man_$millions"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      ZOrder.layout(spark.range(n).select(
          (col("id") % 256).as("u"),
          ((col("id") / 256) % 256).cast("long").as("h"),
          (col("id") % 97).cast("double").as("v"),
          col("id").as("k")),
        col("u"), col("h"), bits = 8, partitions = 64)
        .write.mode("overwrite").parquet(dir)
    }
    // the Bloom sizing law, demonstrated both ways: the 4 Ki-bit
    // default saturates at ~1M keys/file (fill → 1, prunes nothing);
    // sized ~10× keys-per-file it prunes to the holding file
    val keysPerFile = n / 64
    val sizedBits = (java.lang.Long.highestOneBit(keysPerFile * 10) * 2).toInt
    ZoneMaps.build(spark, dir, s"$man-sat", Seq("k"),
      bloomColumns = Seq("k")) // default bits: saturates on purpose
    ZoneMaps.build(spark, dir, man, Seq("u", "h", "k"),
      bloomColumns = Seq("k"), bloomBits = sizedBits)
    println(f"[scale] zonemap bloom fill: default-bits " +
      f"${ZoneMaps.bloomFillRatio(spark, s"$man-sat", "k")}%.3f " +
      f"(saturated), sized-bits ($sizedBits) " +
      f"${ZoneMaps.bloomFillRatio(spark, man, "k")}%.3f")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def agg(df: org.apache.spark.sql.DataFrame): Unit =
      df.agg(count(lit(1)), sum("v")).write.format("noop")
        .mode("overwrite").save()
    val ranges = Seq(("u", 16L: Any, 31L: Any), ("h", 32L: Any, 63L: Any))
    val full = spark.read.parquet(dir)
      .filter(col("u").between(16, 31) && col("h").between(32, 63))
    agg(full) // warm
    val tFull = time(agg(full))
    val nCand = ZoneMaps.candidateFilesAll(spark, dir, man, ranges).size
    val tPruned = time(agg(ZoneMaps.prunedReadAll(spark, dir, man, ranges)))
    val nAll = spark.read.parquet(dir).inputFiles.length
    println(f"[scale] zonemap 2-D range: $nCand/$nAll files, " +
      f"full ${tFull}%5.2fs vs pruned ${tPruned}%5.2fs " +
      f"(${tFull / tPruned}%4.1fx)")
    val key = n / 2
    val tFullPt = time(agg(spark.read.parquet(dir)
      .filter(col("k") === key)))
    val nPt = ZoneMaps.candidateFilesPoint(spark, dir, man, "k", key).size
    val tPt = time(agg(ZoneMaps.prunedLookup(spark, dir, man, "k", key)))
    println(f"[scale] zonemap point lookup: $nPt/$nAll files, " +
      f"full ${tFullPt}%5.2fs vs bloom ${tPt}%5.2fs (${tFullPt / tPt}%4.1fx)")
    // planner-integrated path: the SAME 2-D range as a plain filter
    // over ZoneMapTable — Catalyst pushes the conjuncts down, the
    // FileIndex prunes at listFiles time, no prunedRead call anywhere
    val (zmt, idx) = graft.ops.ZoneMapTable.withIndex(spark, dir, man)
    val viaPlanner = zmt
      .filter(col("u").between(16, 31) && col("h").between(32, 63))
    val tPlanner = time(agg(viaPlanner))
    val dropped = idx.prunedFileCount.get()
    println(f"[scale] zonemap planner path: ${nAll - dropped}/$nAll " +
      f"files via pushed filters, ${tPlanner}%5.2fs " +
      f"(vs full ${tFull}%5.2fs, explicit pruned ${tPruned}%5.2fs)")
    // the opt-in rule: a PLAIN read with ZoneMapAuto enabled — same
    // skipping through the sibling-manifest convention; the delta vs
    // tPlanner is the rule's own planning cost (manifest re-read per
    // planned query)
    val sib = new org.apache.hadoop.fs.Path(s"$dir._zonemaps")
    val hfs = sib.getFileSystem(spark.sessionState.newHadoopConf())
    if (!hfs.exists(sib))
      org.apache.hadoop.fs.FileUtil.copy(hfs,
        new org.apache.hadoop.fs.Path(man), hfs, sib, false,
        spark.sessionState.newHadoopConf())
    // apples to apples: BOTH sides construct the DataFrame fresh
    // (spark.read re-lists and re-infers schema per call — that cost
    // is the plain read's own, rule or no rule)
    def plainRead() = agg(spark.read.parquet(dir)
      .filter(col("u").between(16, 31) && col("h").between(32, 63)))
    plainRead() // warm FS caches
    val tOff = time(plainRead())
    graft.ops.ZoneMapAuto.enable(spark)
    val tAuto = try { plainRead(); time(plainRead()) }
    finally graft.ops.ZoneMapAuto.disable(spark)
    println(f"[scale] zonemap auto rule: plain read ${tOff}%5.2fs off " +
      f"vs ${tAuto}%5.2fs on — verdicts cached per manifest version, " +
      "so a warm query pays one mtime check; the win is the files " +
      "not opened")
  }

  /** The snapshot-sharding datapoint SCALE.md's "scan rate × 1/N"
    * claim was missing: one Derby table (default 100k rows),
    * snapshotted through `JdbcSnapshot.snapshotFrame` at
    * numPartitions 1 vs 4, min-of-2 each. Derby is embedded — both
    * sides share one JVM and one page cache — so the measured win is
    * bounded by the database half, not the Spark half; the number
    * reported is what IS, same policy as the ingest rows.
    */
  private def jdbcExperiment(spark: SparkSession, rows: Int): Unit = {
    import graft.model.TableSpec
    import graft.streaming.JdbcSnapshot
    val url = "jdbc:derby:memory:graftscale"
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("graft-derby-scale-").toString)
    val conn = java.sql.DriverManager.getConnection(s"$url;create=true")
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE APP.SNAP(ID INTEGER NOT NULL, VAL VARCHAR(64))")
      st.close()
      conn.setAutoCommit(false)
      val ps = conn.prepareStatement("INSERT INTO APP.SNAP VALUES (?, ?)")
      for (i <- 1 to rows) {
        ps.setInt(1, i)
        ps.setString(2, f"value-$i%08d-${i * 2654435761L}%016x")
        ps.addBatch()
        if (i % 5000 == 0) { ps.executeBatch(); conn.commit() }
      }
      ps.executeBatch(); conn.commit()
      ps.close()
    } finally conn.close()

    val spec = TableSpec("APP", "SNAP",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ID",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("VAL",
          org.apache.spark.sql.types.StringType))))
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    def onePass(parts: Int): Double = {
      val opts =
        if (parts == 1) Map.empty[String, String]
        else Map("partitionColumn" -> "ID", "lowerBound" -> "1",
          "upperBound" -> rows.toString, "numPartitions" -> parts.toString)
      val t0 = System.nanoTime()
      JdbcSnapshot.snapshotFrame(spark, url, props, "APP.SNAP", spec,
        None, 1700000000000L, partitionOptions = opts)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    onePass(1) // untimed warmup: JDBC driver + codegen init
    println(f"[scale] ${"jdbc snapshot"}%-26s ${"rows"}%9s ${"sec"}%7s ${"rows/s"}%9s")
    val times = Seq(1, 4).map { parts =>
      val t = math.min(onePass(parts), onePass(parts))
      println(f"[scale]   numPartitions=$parts%-16s $rows%9d $t%7.2f ${rows / t}%9.0f")
      parts -> t
    }.toMap
    println(f"[scale]   1->4 speedup ${times(1) / times(4)}%.2fx " +
      "(embedded Derby bounds the win: one JVM, one page cache)")
  }

  /** The live-tail datapoint: N rows inserted through real AFTER
    * triggers into a Derby changelog, drained by one
    * [[graft.source.JdbcChangelogTailer]] poll into envelope
    * segments, then ingested by the DSv2 source + pipeline. Two
    * numbers: drain+publish rows/s (the single-threaded poller — the
    * same parallelism-1 shape as the reference's source operator) and
    * ingest rows/s (parallel across the published segments' byte
    * splits). The poller is ONE thread by design: the tail is bounded
    * by change RATE, not table size, and ordering within a table
    * needs one writer; Spark-side ingest is where the parallelism is.
    */
  private def tailExperiment(spark: SparkSession, rows: Int): Unit = {
    import graft.model.{TableRegistry, TableSpec}
    import graft.source.JdbcChangelogTailer
    import graft.streaming.{CdcConfig, CdcPipeline}
    val url = "jdbc:derby:memory:grafttailscale"
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("graft-derby-scale-").toString)
    val spec = TableSpec("APP", "TAILT",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ID",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("VAL",
          org.apache.spark.sql.types.StringType))))
    val conn = java.sql.DriverManager.getConnection(s"$url;create=true")
    val tTrig = try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE APP.TAILT(ID INTEGER NOT NULL, VAL VARCHAR(64))")
      JdbcChangelogTailer.changelogDdl(spec,
        Map("ID" -> "INTEGER NOT NULL", "VAL" -> "VARCHAR(64)"))
        .foreach(st.executeUpdate)
      st.close()
      conn.setAutoCommit(false)
      val ps = conn.prepareStatement("INSERT INTO APP.TAILT VALUES (?, ?)")
      val t0 = System.nanoTime()
      for (i <- 1 to rows) {
        ps.setInt(1, i)
        ps.setString(2, f"value-$i%08d-${i * 2654435761L}%016x")
        ps.addBatch()
        if (i % 5000 == 0) { ps.executeBatch(); conn.commit() }
      }
      ps.executeBatch(); conn.commit()
      ps.close()
      (System.nanoTime() - t0) / 1e9
    } finally conn.close()

    val feed = java.nio.file.Files.createTempDirectory("graft-tail-feed-")
    val tailer = new JdbcChangelogTailer(url,
      Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"), Seq(spec),
      feed.toString)
    val t1 = System.nanoTime()
    val published = tailer.pollOnce()
    val tDrain = (System.nanoTime() - t1) / 1e9
    require(published == rows, s"published $published of $rows")

    val out = java.nio.file.Files.createTempDirectory("graft-tail-out-")
    val ck = java.nio.file.Files.createTempDirectory("graft-tail-ck-")
    val pipeline = new CdcPipeline(spark, CdcConfig("tailscale",
      TableRegistry(Seq(spec)), out.toString))
    val t2 = System.nanoTime()
    pipeline.startFeed(graft.source.Dsv2Feed(feed.toString), ck.toString,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .awaitTermination()
    val tIngest = (System.nanoTime() - t2) / 1e9
    val landed = spark.read.parquet(s"$out/tailscale_APP__TAILT").count()
    require(landed == rows, s"landed $landed of $rows")
    println(f"[scale] ${"live tail"}%-26s ${"rows"}%9s ${"sec"}%7s ${"rows/s"}%9s")
    println(f"[scale]   ${"trigger-insert"}%-24s $rows%9d $tTrig%7.2f ${rows / tTrig}%9.0f")
    println(f"[scale]   ${"drain+publish (1 thread)"}%-24s $rows%9d $tDrain%7.2f ${rows / tDrain}%9.0f")
    println(f"[scale]   ${"dsv2 ingest"}%-24s $rows%9d $tIngest%7.2f ${rows / tIngest}%9.0f")
  }

  /** The table-parallelism datapoint: N Derby tables (default 8 ×
    * 25k rows) snapshotted through `JdbcSnapshot.writeSnapshot` with
    * `tableParallelism` 1 vs 4. Same embedded-Derby caveat as the
    * sharding experiment — one JVM, one page cache bounds the win;
    * on a real server the overlap also hides N−1 network round-trip
    * latencies, which an embedded database has none of.
    */
  private def jdbcTablesExperiment(spark: SparkSession, tables: Int,
      rows: Int): Unit = {
    import graft.model.{TableRegistry, TableSpec}
    import graft.streaming.{CdcConfig, JdbcSnapshot}
    val url = "jdbc:derby:memory:grafttables"
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("graft-derby-scale-").toString)
    val conn = java.sql.DriverManager.getConnection(s"$url;create=true")
    try {
      val st = conn.createStatement()
      conn.setAutoCommit(false)
      for (t <- 1 to tables) {
        st.executeUpdate(
          s"CREATE TABLE APP.SNAP$t(ID INTEGER NOT NULL, VAL VARCHAR(64))")
        val ps = conn.prepareStatement(s"INSERT INTO APP.SNAP$t VALUES (?, ?)")
        for (i <- 1 to rows) {
          ps.setInt(1, i)
          ps.setString(2, f"value-$i%08d-${i * 2654435761L}%016x")
          ps.addBatch()
          if (i % 5000 == 0) { ps.executeBatch(); conn.commit() }
        }
        ps.executeBatch(); conn.commit()
        ps.close()
      }
      st.close()
    } finally conn.close()

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ID",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("VAL",
        org.apache.spark.sql.types.StringType)))
    val registry = TableRegistry(
      (1 to tables).map(t => TableSpec("APP", s"SNAP$t", schema)))
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    def onePass(par: Int): Double = {
      val out = java.nio.file.Files.createTempDirectory("graft-partab-")
      val cfg = CdcConfig(s"partab$par", registry, out.toString)
      val t0 = System.nanoTime()
      val counts = JdbcSnapshot.writeSnapshot(spark, cfg, url, props,
        1700000000000L, tableParallelism = par)
      require(counts.values.sum == tables.toLong * rows,
        s"bad counts: $counts")
      (System.nanoTime() - t0) / 1e9
    }
    onePass(1) // untimed warmup
    println(f"[scale] ${"jdbc table parallelism"}%-26s ${"tables"}%7s ${"sec"}%7s")
    val times = Seq(1, 4).map { par =>
      val t = math.min(onePass(par), onePass(par))
      println(f"[scale]   parallelism=$par%-17s $tables%7d $t%7.2f")
      par -> t
    }.toMap
    println(f"[scale]   1->4 speedup ${times(1) / times(4)}%.2fx " +
      "(embedded Derby bounds the win: one JVM, one page cache)")
  }

  /** ONE session builder for all three experiment branches — a
    * config tweak applied to one branch and not the others would
    * silently change that experiment's measurement conditions.
    */
  private def buildSession(extra: Map[String, String] = Map.empty): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("cdc")) {
      val spark = buildSession()
      cdcExperiment(spark, args.lift(1).getOrElse("/tmp/graft-scale"),
        args.lift(2).map(_.toInt).getOrElse(10))
      spark.stop()
      return
    }
    if (args.headOption.contains("gif")) {
      val spark = buildSession(Map(
        "spark.sql.files.maxPartitionBytes" -> (4 * 1024 * 1024).toString))
      gifExperiment(spark, args.lift(1).getOrElse("/tmp/graft-scale"))
      spark.stop()
      return
    }
    if (args.headOption.contains("zonemap")) {
      val spark = buildSession()
      zonemapExperiment(spark, args.lift(2).getOrElse("/tmp/graft-scale"),
        args.lift(1).map(_.toInt).getOrElse(20))
      spark.stop()
      return
    }
    if (args.headOption.contains("currenttable")) {
      val spark = buildSession()
      currentTableExperiment(spark,
        args.lift(2).getOrElse("/tmp/graft-scale"),
        args.lift(1).map(_.toInt).getOrElse(2000))
      spark.stop()
      return
    }
    if (args.headOption.contains("cursorshard")) {
      val spark = buildSession()
      cursorShardExperiment(spark,
        args.lift(2).getOrElse("/tmp/graft-scale"),
        args.lift(1).map(_.toInt).getOrElse(64))
      spark.stop()
      return
    }
    if (args.headOption.contains("reader")) {
      val spark = buildSession()
      readerExperiment(spark,
        args.lift(2).getOrElse("/tmp/graft-scale"),
        args.lift(1).map(_.toInt).getOrElse(2000))
      spark.stop()
      return
    }
    if (args.headOption.contains("rollup")) {
      val spark = buildSession()
      rollupExperiment(spark,
        args.lift(2).getOrElse("/tmp/graft-scale"),
        args.lift(1).map(_.toInt).getOrElse(2000))
      spark.stop()
      return
    }
    if (args.headOption.contains("index")) {
      val spark = buildSession()
      indexExperiment(spark,
        args.lift(2).getOrElse("/tmp/graft-scale"),
        args.lift(1).map(_.toInt).getOrElse(2000))
      spark.stop()
      return
    }
    if (args.headOption.contains("indexbig")) {
      val spark = buildSession()
      indexBigExperiment(spark,
        args.lift(2).getOrElse("/tmp/graft-scale"),
        args.lift(1).map(_.toInt).getOrElse(96))
      spark.stop()
      return
    }
    if (args.headOption.contains("indexskew")) {
      val spark = buildSession()
      indexSkewExperiment(spark,
        args.lift(2).getOrElse("/tmp/graft-scale"),
        args.lift(1).map(_.toInt).getOrElse(8))
      spark.stop()
      return
    }
    if (args.headOption.contains("evolvedreader")) {
      val spark = buildSession()
      evolvedReaderExperiment(spark,
        args.lift(2).getOrElse("/tmp/graft-scale"),
        args.lift(1).map(_.toInt).getOrElse(600))
      spark.stop()
      return
    }
    if (args.headOption.contains("rescale")) {
      val spark = buildSession()
      rescaleExperiment(spark,
        args.lift(2).getOrElse("/tmp/graft-scale"),
        args.lift(1).map(_.toInt).getOrElse(2000))
      spark.stop()
      return
    }
    if (args.headOption.contains("ctorder")) {
      val spark = buildSession()
      ctOrderExperiment(spark,
        args.lift(2).getOrElse("/tmp/graft-scale"),
        args.lift(1).map(_.toInt).getOrElse(10000))
      spark.stop()
      return
    }
    if (args.headOption.contains("evolved")) {
      val spark = buildSession()
      evolvedExperiment(spark,
        args.lift(2).getOrElse("/tmp/graft-scale"),
        args.lift(1).map(_.toInt).getOrElse(2000))
      spark.stop()
      return
    }
    if (args.headOption.contains("autocompact")) {
      val spark = buildSession()
      autoCompactExperiment(spark,
        args.lift(2).getOrElse("/tmp/graft-scale"),
        args.lift(1).map(_.toInt).getOrElse(30))
      spark.stop()
      return
    }
    if (args.headOption.contains("textindex")) {
      val spark = buildSession()
      textIndexExperiment(spark, args.lift(2).getOrElse("/tmp/graft-scale"),
        args.lift(1).map(_.toInt).getOrElse(1000))
      spark.stop()
      return
    }
    if (args.headOption.contains("textindexfanout")) {
      val spark = buildSession()
      textIndexFanoutExperiment(spark,
        args.lift(2).getOrElse("/tmp/graft-scale"),
        args.lift(1).map(_.toInt).getOrElse(400))
      spark.stop()
      return
    }
    if (args.headOption.contains("indexcompact")) {
      val spark = buildSession()
      indexCompactExperiment(spark,
        args.lift(2).getOrElse("/tmp/graft-scale"),
        args.lift(1).map(_.toInt).getOrElse(200))
      spark.stop()
      return
    }
    if (args.headOption.contains("textindexfloor")) {
      val spark = buildSession()
      textIndexFloorExperiment(spark,
        args.lift(2).getOrElse("/tmp/graft-scale"),
        args.lift(1).map(_.toInt).getOrElse(200))
      spark.stop()
      return
    }
    if (args.headOption.contains("ann")) {
      val spark = buildSession(Map(
        "spark.sql.files.maxPartitionBytes" -> (4 * 1024 * 1024).toString))
      annExperiment(spark, args.lift(2).getOrElse("/tmp/graft-scale"),
        args.lift(1).map(_.toInt).getOrElse(10))
      spark.stop()
      return
    }
    if (args.headOption.contains("jdbc")) {
      val spark = buildSession()
      jdbcExperiment(spark, args.lift(1).map(_.toInt).getOrElse(100000))
      spark.stop()
      return
    }
    if (args.headOption.contains("tail")) {
      val spark = buildSession()
      tailExperiment(spark, args.lift(1).map(_.toInt).getOrElse(100000))
      spark.stop()
      return
    }
    if (args.headOption.contains("jdbctables")) {
      val spark = buildSession()
      jdbcTablesExperiment(spark, args.lift(1).map(_.toInt).getOrElse(8),
        args.lift(2).map(_.toInt).getOrElse(25000))
      spark.stop()
      return
    }
    if (args.headOption.contains("skew")) {
      val spark = buildSession()
      skewExperiment(spark, args.lift(1).getOrElse("/tmp/graft-scale"))
      spark.stop()
      return
    }
    if (args.headOption.contains("multimodal")) {
      val spark = buildSession(Map(
        // media parquet rows are ~1 KB binaries in generated multi-MB
        // files; split small so the decode work parallelizes
        "spark.sql.files.maxPartitionBytes" -> (4 * 1024 * 1024).toString))
      multimodalExperiment(spark, args.lift(1).getOrElse("/tmp/graft-scale"),
        args.lift(2).map(_.toInt).getOrElse(10))
      spark.stop()
      return
    }
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val work = args.lift(1).getOrElse("/tmp/graft-scale")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // small split size: the fixture tables are single parquet files
    val spark = buildSession(Map(
      "spark.sql.files.maxPartitionBytes" -> (4 * 1024 * 1024).toString))

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
