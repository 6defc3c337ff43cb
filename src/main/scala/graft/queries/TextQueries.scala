package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.DupClusters

/** Text-analysis and document-dedup operators over the documents
  * table — the LLM-data-pipeline surface (BASELINE.json north star):
  * token stats, quality scoring, fingerprinting, exact dedup,
  * MinHash+LSH, SimHash, n-gram Jaccard near-dup.
  *
  * Scale notes (100 TB): every per-doc op here is a pure projection
  * (no shuffle); MinHash signatures are computed by a native one-pass
  * kernel — no explode, no aggregation. Pair generation only
  * ever joins on shingle/band equality, so the shuffle key is the
  * shingle hash and skew is bounded by shingle frequency; the exact
  * Jaccard join is reserved for LSH-candidate pairs at scale (here it
  * runs on the full table because the fixture is 500 docs).
  */
object TextQueries {

  /** Normalized whitespace-token array — THE library tokenization
    * rule (shared with `examples.CorpusPipeline` so the shipped
    * walkthrough counts tokens exactly like the oracle-checked
    * queries).
    */
  private[graft] def toks(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Stage the token array as a real column FIRST. Expressions that
    * index the array inside a lambda (element_at(t, i)) re-evaluate
    * their whole subtree per element — with split() inlined that means
    * re-tokenizing the document once per shingle (measured 13× slower
    * at sf0.1). A staged projection binds `t` to an attribute, and
    * CollapseProject keeps the stages separate because the alias is
    * expensive and multiply-referenced.
    */
  private def withToks(df: DataFrame, keep: Column*): DataFrame =
    df.select(keep :+ toks(col("text")).as("t"): _*)

  /** The shared tokenizer staged over a `(doc_id, text)` frame — the
    * ONE rule the BM25 kernel (q111, `Graft.bm25`) and the maintained
    * inverted index ([[graft.ops.TextIndex]]) tokenize with, so
    * index-served scores cannot drift from the audited kernel.
    */
  private[graft] def tokenized(docs: DataFrame): DataFrame =
    withToks(docs, col("doc_id"))

  /** Distinct word n-gram shingles (n=3) over the staged tokens;
    * <n tokens ⇒ empty (the kernel's loop bound).
    */
  private def withShingles(df: DataFrame, keep: Column*): DataFrame =
    withNgrams(df, 3, "sh", keep: _*)

  /** The shingle kernel, parameterized by n — ONE implementation for
    * the 3-gram near-dup family (q37-q39) and the 8-gram
    * decontamination grams (q74): distinct word n-grams over the
    * staged token column, empty below n tokens. Native expression
    * (TextHashes.NGrams): the HOF formulation
    * (array_distinct(transform(...))) is interpreted per element and
    * re-evaluates its element_at chain per gram — the kernel is one
    * call per row and stays inside codegen; TextHashesSpec
    * property-checks the two produce identical arrays.
    */
  private def withNgrams(df: DataFrame, n: Int, out: String,
      keep: Column*): DataFrame =
    withToks(df, keep: _*).select(keep :+
      graft.functions.TextHashes.ngrams(df.sparkSession, col("t"), n)
        .as(out): _*)

  /** Non-overlapping 8-token chunk kernel over the staged tokens —
    * ONE implementation for the span family (q75's metric and q99's
    * rewrite must cut identical spans or the rewrite diverges from
    * the measurement). Guard: <8 tokens ⇒ empty.
    */
  private def chunksExpr: Column = {
    val t = col("t")
    when(size(t) < 8, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(t).divide(8).cast("int")),
        i => concat_ws(" ",
          (1 to 8).map(j => element_at(t, (i - 1) * 8 + j)): _*)))
  }

  /** DuckDB rendering of the same chunk list. */
  private val DuckChunks: String =
    s"""list_transform(
       |   generate_series(1, greatest(len(t) // 8, 0)),
       |   i -> ${(0 until 8).map(j => s"t[(i-1)*8+${j + 1}]").mkString(" || ' ' || ")})""".stripMargin

  /** DuckDB rendering of the same n-gram set. */
  private def duckNgrams(n: Int): String =
    s"""list_distinct(list_transform(
       | generate_series(1, greatest(len(t) - ${n - 1}, 0)),
       | i -> ${(0 until n).map(j => s"t[i+$j]").mkString(" || ' ' || ")}))""".stripMargin

  /** DuckDB rendering of the 3-gram shingle set. */
  private val DuckShingles = duckNgrams(3)

  private val Stopwords = Seq("the", "a", "and", "of", "to", "in")

  /** GPT-2-style pretokenizer (simplified: no trailing-space
    * lookahead — RE2 has no lookahead). Shared verbatim between the
    * Spark plan and the DuckDB oracle.
    */
  private val BpePattern =
    """'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"""

  /** Winnowing parameters: k-gram length, winnow window, and the
    * polynomial base powers base^(k-1-j) as exact longs (base 31,
    * k 8 → max term 31^7·255 ≈ 7e12 — no overflow, no modulus needed,
    * bit-identical across engines).
    */
  private val FpK = 8
  private val FpW = 4
  private val FpPow: Array[Long] =
    Array.iterate(1L, FpK)(_ * 31L).reverse

  /** Per-language keep thresholds over the 16^15 hash domain, as
    * EXACT long literals shared with the oracle SQL (a rate×domain
    * product would round differently in Scala doubles vs DuckDB
    * decimals). 2^58 = 25%, 3·2^58 = 75%: downsample dominant English,
    * keep most of the rest — the corpus-rebalancing shape.
    */
  private val SampleThresholds: Seq[(String, Long)] = Seq(
    "de" -> (3L << 58), "en" -> (1L << 58), "es" -> (3L << 58),
    "fr" -> (3L << 58), "zh" -> (3L << 58))

  /** Language-ID trigram profiles, sorted by language code (the sort
    * order IS the tie-break order). A real deployment would load
    * trained profiles; these are deterministic harness fixtures.
    */
  private val LangIdProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "sch", "ein", "ich", "en "),
    "en" -> Seq("the", "ing", "and", " th", "er ", "ow ", "row"),
    "es" -> Seq("el ", "la ", "de ", "ión", "os ", "ent", "ue "),
    "fr" -> Seq("le ", "les", "de ", "ent", "que", "ux ", "ion"),
    "zh" -> Seq("zh ", "sh ", "ng ", "ian", "ao ", "uan", "ei "))

  /** k MinHash functions: ONE 32-bit md5-prefix hash per shingle, k
    * linear mixes, min per mix — a native one-pass kernel
    * (graft.functions.TextHashes.MinHashSig). The previous formulation
    * (k seeded md5 digests per shingle, interpreted transform per k)
    * was the slowest bench query at 8.7 s/sf0.1; one digest + k
    * integer mixes computes the same family class ~6× cheaper. Pure
    * per-row computation — scales as a map. Constants shared with the
    * oracle via interpolation.
    */
  private val K = graft.functions.TextHashes.MinHashK
  private def mhCols: Seq[Column] =
    (0 until K).map(k => element_at(col("sig"), k + 1).as(s"mh$k"))
  private def withSig(spark: SparkSession, shl: DataFrame): DataFrame =
    shl.select(col("doc_id"),
        graft.functions.TextHashes.minhashSig(spark, col("sh")).as("sig"))
      .select(col("doc_id") +: mhCols: _*)
  private def duckSig: String = duckSigFrom("documents")
  /** The same signature CTE chain over any (doc_id, text) relation —
    * q113 runs it over the post-delta corpus.
    */
  private def duckSigFrom(from: String): String = {
    import graft.functions.TextHashes.{MixA, MixB, MixP}
    s"""toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
       |         FROM $from),
       |sh AS (SELECT doc_id, $DuckShingles AS s FROM toks),
       |hs AS (SELECT doc_id,
       |   list_transform(s, x -> ('0x'||substr(md5(x),1,8))::BIGINT) AS h
       | FROM sh),
       |sig AS (SELECT doc_id,
       |${(0 until K).map(k =>
          s"  list_aggregate(list_transform(h, x -> (${MixA(k)}*x + ${MixB(k)}) % $MixP), 'min') AS mh$k")
          .mkString(",\n")}
       | FROM hs)""".stripMargin
  }

  /** Connected components over a pair CTE as DuckDB CTEs (ONE
    * implementation shared by q59/q67/q89 — a tie-break or labeling
    * change must move all three oracles together): yields
    * `cl(doc_id, cluster)` with cluster = minimum member. The named
    * CTE must have columns (d1, d2); the WITH must be RECURSIVE.
    */
  private def duckComponents(pairCte: String = "cand") =
    s"""edges AS (SELECT d1 AS a, d2 AS b FROM $pairCte
       |          UNION SELECT d2, d1 FROM $pairCte),
       |reach(src, dst) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
       |cl AS (SELECT src AS doc_id, min(dst) AS cluster
       |       FROM reach GROUP BY src)""".stripMargin
  private val DuckComponents = duckComponents()

  /** (doc_id, band, bucket) rows from a signature frame — ONE
    * banding scheme for the symmetric pair-gen (lshPipeline) and the
    * asymmetric new-vs-index probe (q102). '|'-separated long minima
    * (the hex minima had fixed width; longs need a separator so 12|3
    * and 1|23 can't collide). concat (not concat_ws) so a no-shingle
    * doc's null minima yield a null bucket — never a candidate,
    * matching the oracle's null-propagating ||.
    */
  private def withBands(sig: DataFrame): DataFrame = {
    def bucket(ks: Range): Column = md5(concat(
      ks.flatMap(k => Seq(col(s"mh$k").cast("string"), lit("|")))
        .dropRight(1): _*))
    sig.select(col("doc_id"), explode(array(
      struct(lit(0).as("band"), bucket(0 until 4).as("bucket")),
      struct(lit(1).as("band"), bucket(4 until 8).as("bucket"))))
      .as("b"))
      .select(col("doc_id"), col("b.band").as("band"),
        col("b.bucket").as("bucket"))
  }

  /** (doc_id, band, bucket) for any (doc_id, text) frame — every
    * stage is a projection/explode, so this runs unchanged on a
    * STREAMING frame. The single banding entry point the streaming
    * near-dup gate (EventTimeOps.nearDupGate) shares with the batch
    * index build: an index written by the batch path and a probe
    * banded by the stream can never disagree on the scheme.
    */
  private[graft] def docBands(spark: SparkSession, docs: DataFrame): DataFrame =
    withBands(withSig(spark, withShingles(docs, col("doc_id"))))

  /** Symmetric candidate pairs (d1 < d2) from a bands frame — ONE
    * join implementation for the oracle-checked q38 pipeline and the
    * public facade (graft.api.Graft.nearDupCandidates), so the
    * library's pair semantics can't fork from the hash-checked path.
    */
  private[graft] def candidatesFromBands(bands: DataFrame): DataFrame =
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()

  /** Shared LSH pipeline: staged shingles → signatures → banded
    * candidate pairs. Returns (candidates, shingles, signatures);
    * the signature frame is the one lshPipeline already persisted
    * internally — callers needing signatures (q90) must reuse it,
    * not recompute the kernel.
    */
  private def lshPipeline(spark: SparkSession, dir: String,
      keepShingles: Boolean = false): (DataFrame, DataFrame, DataFrame) = {
    // documents is one small parquet file (1-2 scan partitions); the
    // md5-heavy signature compute needs all cores
    val docs = Tables(spark, dir).documents
      .repartition(spark.sparkContext.defaultParallelism)
    // the shingle frame is the heaviest intermediate: cache it only
    // for the caller that actually reuses it (q39's candidate verify)
    val shl0 = withShingles(docs, col("doc_id"))
    val shl = if (keepShingles) shl0.persist() else shl0
    val sig = withSig(spark, shl).persist()
    (candidatesFromBands(withBands(sig)), shl, sig)
  }

  /** DuckDB rendering of the same banding scheme. */
  private val DuckBands: String =
    """bands AS (
      |  SELECT doc_id, 0 AS band,
      |    md5(mh0 || '|' || mh1 || '|' || mh2 || '|' || mh3) AS bucket FROM sig
      |  UNION ALL
      |  SELECT doc_id, 1 AS band,
      |    md5(mh4 || '|' || mh5 || '|' || mh6 || '|' || mh7) AS bucket FROM sig)""".stripMargin

  /** Exact shingle-overlap scaffold for candidate PAIRS — ONE
    * implementation for every exact-Jaccard verify (q39, q90, q102):
    * explode the staged shingles, count per-pair shared shingles
    * (inner join — whether zero-overlap pairs survive is the
    * caller's left-join decision), and the per-doc set sizes.
    * Returns (inter: (a, b, i), sizes: (doc_id, sz)) keyed by the
    * caller's pair column names.
    */
  private def pairOverlap(pairs: DataFrame, shl: DataFrame,
      a: String, b: String): (DataFrame, DataFrame) = {
    val shx = shl.select(col("doc_id"), explode(col("sh")).as("tok"))
    val sizes = shl.select(col("doc_id"), size(col("sh")).as("sz"))
    val inter = broadcast(pairs)
      .join(shx.as("pa"), col(a) === col("pa.doc_id"))
      .join(shx.as("pb"),
        col(b) === col("pb.doc_id") && col("pb.tok") === col("pa.tok"))
      .groupBy(a, b).agg(count(lit(1)).as("i"))
    (inter, sizes)
  }

  /** DuckDB rendering of the same scaffold (CTEs shx, sizes, inter). */
  private def duckPairOverlap(pairCte: String, a: String, b: String): String =
    s"""shx AS (SELECT doc_id, unnest(s) AS tok FROM sh),
       |sizes AS (SELECT doc_id, len(s) AS sz FROM sh),
       |inter AS (SELECT c.$a, c.$b, count(*) AS i
       |          FROM $pairCte c
       |          JOIN shx a ON a.doc_id = c.$a
       |          JOIN shx b ON b.doc_id = c.$b AND b.tok = a.tok
       |          GROUP BY 1, 2)""".stripMargin

  /** The clean-corpus survivor stages — ONE implementation for the
    * q89 funnel and the q108 training-shard capstone (a drop rule
    * changed in one and not the other would silently fork the
    * pipeline's meaning): s1 quality floor, s2 exact-fingerprint
    * dedup (keep min doc_id), s3 near-dup cluster dedup (keep each
    * cluster's minimum), s4 holdout + 8-gram decontamination. All
    * four persisted — each feeds the next stage AND the accounting.
    */
  /** Memoized per (session, dir): q89 and q108 both invoke the
    * stages, and Bench runs each query twice — without memoization
    * every invocation persisted a fresh copy of all four survivor
    * frames (plus the internal gram frame) and nothing ever
    * unpersisted, so cached copies accumulated per run. One shared
    * set per session is the lake-checkpoint shape the persists stand
    * in for anyway.
    */
  // SINGLE-slot memo, not a map: q89 and q108 share one cached stage
  // set within a (session, dir), which is all the sharing that
  // exists; a growing map would pin every session/dir ever seen for
  // the JVM lifetime (a WeakHashMap keyed by session cannot help —
  // the cached DataFrames strongly reference their session, the
  // value-refers-to-key pitfall that defeats key reclamation). A new
  // session or dir replaces the slot, UNPERSISTING the replaced
  // entry's frames (dropping the JVM reference alone would leave
  // their blocks registered in Spark's CacheManager). The one stale
  // pin that remains is the most recent session until the next call.
  private final case class StagesSlot(spark: SparkSession, dir: String,
    frames: (DataFrame, DataFrame, DataFrame, DataFrame),
    internal: Seq[DataFrame])
  @volatile private var stagesSlot: StagesSlot = null

  private def cleanStages(spark: SparkSession,
      dir: String): (DataFrame, DataFrame, DataFrame, DataFrame) = synchronized {
    // a memo entry is only valid while its frames are still cached:
    // Verify/Bench clearCache() between queries, and handing back
    // unpersisted frames would recompute the stage chain once per
    // accounting consumer — rebuild (fresh persists) instead
    val cur = stagesSlot
    val valid = cur != null && (cur.spark eq spark) && cur.dir == dir &&
      Seq(cur.frames._1, cur.frames._2, cur.frames._3, cur.frames._4)
        .forall(_.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    if (valid) cur.frames
    else {
      if (cur != null && !cur.spark.sparkContext.isStopped)
        (Seq(cur.frames._1, cur.frames._2, cur.frames._3, cur.frames._4)
          ++ cur.internal).foreach(_.unpersist(blocking = false))
      stagesSlot = null // a failed rebuild must not resurrect the old slot
      val (t, internal) = buildCleanStages(spark, dir)
      stagesSlot = StagesSlot(spark, dir, t, internal)
      t
    }
  }

  /** Explicit release of the memoized stage set: the slot otherwise
    * pins the most recent (session, dir)'s survivor + internal frames
    * in executor storage until the NEXT cleanStages call with a
    * different key or an external clearCache — fine for Verify/Bench
    * (which clearCache between queries), a leak for a long-lived user
    * session that ran q89/q108 once. Exposed as
    * [[graft.api.Graft.releaseStageCache]].
    */
  private[graft] def releaseStages(): Unit = synchronized {
    val cur = stagesSlot
    if (cur != null) {
      if (!cur.spark.sparkContext.isStopped)
        (Seq(cur.frames._1, cur.frames._2, cur.frames._3, cur.frames._4)
          ++ cur.internal).foreach(_.unpersist(blocking = false))
      stagesSlot = null
    }
  }

  /** Returns the four survivor stages plus every INTERNAL frame the
    * build persisted (the gram frame and lshPipeline's signature
    * frame), so the memo slot can release them all on replacement.
    */
  private def buildCleanStages(spark: SparkSession, dir: String)
      : ((DataFrame, DataFrame, DataFrame, DataFrame), Seq[DataFrame]) = {
    val docs = Tables(spark, dir).documents
    val s1 = withToks(docs, col("doc_id"))
      .filter(size(col("t")) >= 30).select("doc_id").persist()
    val s2 = docs
      .select(col("doc_id"), md5(regexp_replace(lower(trim(col("text"))),
        "\\s+", " ")).as("f"))
      .join(s1, "doc_id")
      .groupBy("f").agg(min("doc_id").as("doc_id"))
      .select("doc_id").persist()
    // LSH candidate pairs restricted to survivors, min-label
    // components, keep each cluster's minimum member
    val (cand, _, sig) = lshPipeline(spark, dir)
    val cand2 = cand
      .join(s2.withColumnRenamed("doc_id", "d1"), "d1")
      .join(s2.withColumnRenamed("doc_id", "d2"), "d2")
    val dropped3 = DupClusters.clusters(cand2)
      .filter(col("doc_id") =!= col("cluster")).select("doc_id")
    val s3 = s2.join(dropped3, Seq("doc_id"), "left_anti").persist()
    // drop the held-out benchmark split + anything sharing an 8-gram
    // with it (the q74 rule). Grams are computed only for benchmark ∪
    // stage-3 survivors — at scale the gram explosion must track the
    // SURVIVOR set, not the raw corpus
    val g8src = docs.join(
      s3.unionByName(docs.filter(col("doc_id") % 11 === 0)
        .select("doc_id")).distinct(),
      Seq("doc_id"), "left_semi")
    val g8 = withNgrams(g8src, 8, "g", col("doc_id")).persist()
    val bench = g8.filter(col("doc_id") % 11 === 0)
      .select(explode(col("g")).as("gram")).distinct()
    val cont = g8.join(s3, "doc_id").filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), explode(col("g")).as("gram"))
      .join(broadcast(bench), "gram")
      .select("doc_id").distinct()
    val s4 = s3.filter(col("doc_id") % 11 =!= 0)
      .join(cont, Seq("doc_id"), "left_anti").persist()
    ((s1, s2, s3, s4), Seq(g8, sig))
  }

  /** BM25 scoring kernel — ONE implementation for the oracle-checked
    * q111 and the `Graft.bm25` facade: Okapi tf saturation
    * `tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))` per query term, weighted
    * by the Robertson IDF in RATIONAL form ((N−df+0.5)/(df+0.5) — no
    * ln, transcendentals are not bit-stable cross-engine), per-term
    * products summed in fixed term order. Input is a staged
    * `(doc_id, t)` token frame; output `(doc_id, bm25)` for every
    * doc matching ≥1 term, unranked — the caller picks its top-k.
    * The corpus stats (N, Σdl, per-term df) are ONE aggregate row
    * broadcast back; the corpus never shuffles.
    *
    * (k1 + 1) and (1 − b) are computed driver-side: for the default
    * 1.2/0.75 both round to the exact doubles the oracle's literals
    * denote (1.2+1 == 2.2 bitwise; 0.75/0.25 are exact binary).
    */
  private[graft] def bm25Scores(d: DataFrame, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // NO persist (the decontaminateDocs rule): the facade returns a
    // lazy frame, so a cached intermediate would leak per call. The
    // frequency projection feeds the stats row and the scoring —
    // recomputing it is one extra map-only pass, no shuffle.
    val f = d.select(col("doc_id") +: size(col("t")).as("dl") +:
      terms.indices.map(i => size(filter(col("t"),
        x => x === terms(i))).as(s"f$i")): _*)
    val s = f.agg(count(lit(1)).as("n"),
      (sum("dl").as("sdl") +: terms.indices.map(i =>
        sum(when(col(s"f$i") > 0, 1).otherwise(0)).as(s"df$i"))): _*)
    val score = terms.indices.map { i =>
      ((col("n") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5))) *
        ((col(s"f$i") * lit(k1 + 1)) / (col(s"f$i") + lit(k1) *
          (lit(1 - b) + lit(b) * col("dl")
            / (col("sdl") * lit(1.0) / col("n")))))
    }.reduce(_ + _)
    f.crossJoin(broadcast(s))
      .filter(terms.indices.map(i => col(s"f$i")).reduce(_ + _) > 0)
      .select(col("doc_id"), round(score, 6).as("bm25"))
  }

  /** Facade entry: BM25 over a caller-supplied `(doc_id, text)`
    * frame — tokenizes with the module's shared rule, then scores.
    */
  private[graft] def bm25Docs(docs: DataFrame, terms: Seq[String],
      k1: Double, b: Double): DataFrame =
    bm25Scores(withToks(docs, col("doc_id")), terms, k1, b)

  /** Benchmark-decontamination kernel — ONE implementation for the
    * oracle-checked q74 and the `Graft.decontaminate` facade: from a
    * `(doc_id, g: ARRAY<STRING>)` gram frame split by `isBench`,
    * flag every train doc sharing any gram with the benchmark side
    * and report per-doc contamination. The benchmark gram set goes
    * through [[graft.ops.Probes.broadcastIfSmall]]: tiny (every real
    * eval suite) ⇒ the broadcast plan q74 plan-asserts; oversized (a
    * caller feeding something corpus-shaped) ⇒ an unhinted shuffled
    * join on `gram` — same rows, working plan, no driver OOM.
    */
  private[graft] def gramDecontaminate(grams: DataFrame, isBench: Column,
      maxBroadcastRows: Long = graft.ops.Probes.DefaultMaxRows): DataFrame = {
    val bench = grams.filter(isBench)
      .select(explode(col("g")).as("gram")).distinct()
    val train = grams.filter(!isBench)
    val hits = train.select(col("doc_id"), explode(col("g")).as("gram"))
      .join(graft.ops.Probes.broadcastIfSmall(bench, maxBroadcastRows),
        "gram") // grams are distinct per doc
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    train.select(col("doc_id"), size(col("g")).as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n"), lit(0L)).as("n_contaminated"),
        (coalesce(col("n"), lit(0L)) > 0).as("contaminated"),
        round(coalesce(col("n"), lit(0L)) * lit(1.0)
          / greatest(col("n_grams"), lit(1)), 4).as("contamination"))
  }

  /** Facade entry: decontaminate caller-supplied `(doc_id, text)`
    * frames (train vs benchmark) with the q74 kernel — n-gram width
    * and the broadcast row cap are the caller's knobs.
    */
  private[graft] def decontaminateDocs(train: DataFrame, bench: DataFrame,
      n: Int, maxBroadcastRows: Long): DataFrame = {
    val tagged = train
      .select(col("doc_id"), col("text"), lit(false).as("_bench"))
      .unionByName(bench
        .select(col("doc_id"), col("text"), lit(true).as("_bench")))
    // NO persist here: the facade returns a lazy frame, so a cached
    // intermediate would outlive the call with no one to release it —
    // a per-call storage leak for loop callers (per-batch
    // decontamination). The gram stages are map-only native kernels,
    // so the extra recompute across the kernel's subplans is linear
    // CPU, not a shuffle; callers who care persist their INPUT frames
    // (which they own and can unpersist).
    val grams = withNgrams(tagged, n, "g", col("doc_id"), col("_bench"))
    gramDecontaminate(grams, col("_bench"), maxBroadcastRows)
  }

  /** DuckDB rendering of the q107 BPE training block — CTEs `words`,
    * `w0..w3`, `p1..p3`, `t1..t3` (t_i = step i's merged pair) —
    * shared by the training oracle (q107) and the apply oracle
    * (q112), so the merge table both queries reason about is derived
    * exactly once.
    */
  private def duckBpePairsCte(w: String, p: String): String =
    s"""$p AS (SELECT l.pair, sum(l.freq) AS c FROM (
       |  SELECT freq, unnest(list_transform(
       |      generate_series(1, len(a) - 1),
       |      i -> a[i] || ' ' || a[i+1])) AS pair
       |  FROM (SELECT string_split(trim(s), ' ') AS a, freq FROM $w)) l
       |  GROUP BY 1)""".stripMargin

  private def duckBpeStepCtes(i: Int): String = {
    val (w0, p, t, w1) = (s"w${i - 1}", s"p$i", s"t$i", s"w$i")
    // the merged pair comes in via a SCALAR subquery, not a cross
    // join: a fully-fused vocabulary makes t_i EMPTY, and `FROM w, t`
    // would then empty every later CTE (diverging from the engine's
    // early-stopping loop). NULL pair coalesces to chr(1), which can
    // never occur in the space-padded [a-z] symbol streams, so the
    // replace is a no-op — exactly the engine's "no more merges".
    s"""${duckBpePairsCte(w0, p)},
       |$t AS (SELECT pair, c FROM $p ORDER BY c DESC, pair LIMIT 1),
       |$w1 AS (SELECT replace(replace(s, ' ' || tp || ' ',
       |    ' ' || replace(tp, ' ', '') || ' '), ' ' || tp || ' ',
       |    ' ' || replace(tp, ' ', '') || ' ') AS s, freq
       |  FROM (SELECT s, freq,
       |          coalesce((SELECT pair FROM $t), chr(1)) AS tp FROM $w0))""".stripMargin
  }

  private def DuckBpeTrain: String =
    s"""words AS (SELECT lower(w) AS word, count(*) AS freq
       |  FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
       |        FROM documents)
       |  WHERE regexp_matches(w, '^[a-z]{2,12}$$') GROUP BY 1),
       |w0 AS (SELECT ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS s,
       |         freq FROM words),
       |${duckBpeStepCtes(1)},
       |${duckBpeStepCtes(2)},
       |${duckBpeStepCtes(3)}""".stripMargin

  /** The corpus-derived `(s, freq)` vocabulary frame q107 trains on
    * and q112 applies to — one tokenization rule for both.
    */
  private def bpeVocab(spark: SparkSession, dir: String): DataFrame =
    withToks(Tables(spark, dir).documents)
      .select(explode(col("t")).as("w"))
      .filter(col("w").rlike("^[a-z]{2,12}$"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w").as("word"), concat(lit(" "),
        regexp_replace(col("w"), "(.)", "$1 ")).as("s"), col("freq"))

  /** The distributed BPE merge loop over a `(s, freq)` vocabulary
    * frame (`s` = space-delimited symbols with leading/trailing pad):
    * per step, count adjacent-symbol pairs weighted by word
    * frequency, pull exactly ONE row (the argmax pair, tie-break
    * lexicographic), fuse it with two greedy-leftmost replace passes.
    * Stops early when no pairs remain (vocabulary fully fused).
    *
    * Storage is bounded at TWO cached vocabulary frames regardless of
    * merge depth: step k's argmax pull materializes frame k-1's
    * cache, at which point frame k-2 (whose only consumer was the
    * construction of k-1) is unpersisted; both trailing frames are
    * released on return. A 50k-merge production run therefore holds
    * two vocabulary copies, not 50k — BpeDeepMergeSpec drives ≥50
    * merges and asserts the persisted-RDD delta returns to zero.
    */
  private[graft] def bpeMerges(words: DataFrame,
      steps: Int): Seq[(Int, String, String, Long)] = {
    // guard like withNgrams: a word fully merged to ONE symbol has
    // no pairs — Spark's sequence(1, 0) counts DOWN and would index
    // element_at(a, 0); DuckDB's generate_series(1, 0) is empty
    def pairsExpr(a: Column): Column =
      when(size(a) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(a) - 1),
          i => concat(element_at(a, i), lit(" "), element_at(a, i + 1))))
    var cur = words.persist()
    var prev: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= steps && !exhausted) {
      val top = cur
        // stage the symbol array as an attribute first — element_at
        // inside the lambda would re-split per pair (the withToks
        // 13× trap)
        .select(col("freq"), split(trim(col("s")), " ").as("a"))
        .select(col("freq"), explode(pairsExpr(col("a"))).as("pair"))
        .groupBy("pair").agg(sum("freq").as("c"))
        .orderBy(col("c").desc, col("pair")).limit(1)
        .collect() // ONE row: the argmax pair (bounded driver pull)
      // that pull materialized `cur` — the frame `cur` was built from
      // has no remaining consumer and can be released now
      if (prev != null) { prev.unpersist(); prev = null }
      if (top.isEmpty) exhausted = true
      else {
        val (pair, c) = (top(0).getString(0), top(0).getLong(1))
        // TWO replace passes = exact symbol-level greedy merge: a
        // single pass misses every second occurrence in an adjacency
        // chain ('x y x y' — the shared delimiter space is consumed
        // by the previous match), and after pass one the skipped
        // occurrences are pairwise non-adjacent, so pass two catches
        // them all. Same two passes in the oracle.
        def sub(c: Column): Column = regexp_replace(c,
          java.util.regex.Pattern.quote(s" $pair "),
          java.util.regex.Matcher.quoteReplacement(
            s" ${pair.replace(" ", "")} "))
        // persist per step: the DupClusters pattern — without it step
        // k re-executes every prior merge chain from the base frame
        // (and a production-depth merge loop would die on lineage)
        prev = cur
        cur = cur.withColumn("s", sub(sub(col("s")))).persist()
        merges += ((step, pair, pair.replace(" ", ""), c))
        step += 1
      }
    }
    // the result is driver-local; every frame this loop cached goes
    cur.unpersist()
    if (prev != null) prev.unpersist()
    merges.toSeq
  }

  /** DuckDB rendering of the same four stages (CTEs s1..s4 on top of
    * the duckCand block; callers prepend WITH RECURSIVE).
    */
  private def duckCleanStages: String =
    s"""$duckCand,
       |s1 AS (SELECT doc_id FROM toks WHERE len(t) >= 30),
       |fp AS (SELECT d.doc_id,
       |    md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g')) AS f
       |  FROM documents d JOIN s1 ON d.doc_id = s1.doc_id),
       |s2 AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
       |candf AS (SELECT d1, d2 FROM cand
       |  WHERE d1 IN (SELECT doc_id FROM s2)
       |    AND d2 IN (SELECT doc_id FROM s2)),
       |${duckComponents("candf")},
       |s3 AS (SELECT s2.doc_id FROM s2 LEFT JOIN cl
       |    ON s2.doc_id = cl.doc_id
       |  WHERE cl.cluster IS NULL OR cl.cluster = s2.doc_id),
       |g8 AS (SELECT doc_id, ${duckNgrams(8)} AS g FROM toks),
       |bench AS (SELECT DISTINCT unnest(g) AS gram FROM g8
       |          WHERE doc_id % 11 = 0),
       |tg AS (SELECT g8.doc_id, unnest(g8.g) AS gram
       |       FROM g8 JOIN s3 ON g8.doc_id = s3.doc_id
       |       WHERE g8.doc_id % 11 <> 0),
       |cont AS (SELECT DISTINCT tg.doc_id FROM tg
       |         JOIN bench USING (gram)),
       |s4 AS (SELECT doc_id FROM s3 WHERE doc_id % 11 <> 0
       |       AND doc_id NOT IN (SELECT doc_id FROM cont))""".stripMargin

  /** DuckDB CTEs for the banded candidate pairs (shared by q38/q39/q59). */
  private def duckCand: String =
    s"""$duckSig,
       |$DuckBands,
       |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.bucket = b.bucket
       |          AND a.doc_id < b.doc_id)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Token counting (whitespace tokenizer) + type-token ratio.
    QueryDef(
      "q33_token_stats",
      """SELECT doc_id,
        | CAST(len(t) AS INTEGER) AS n_tokens,
        | CAST(len(list_distinct(t)) AS INTEGER) AS n_uniq,
        | round(len(list_distinct(t)) * 1.0 / len(t), 4) AS ttr,
        | round(length(regexp_replace(lower(trim(text)), '\s+', '', 'g'))
        |       * 1.0 / len(t), 4) AS avg_tok_len
        |FROM (SELECT doc_id, text,
        |        string_split_regex(lower(trim(text)), '\s+') AS t
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val t = col("t")
      withToks(Tables(spark, dir).documents, col("doc_id"), col("text"))
        .select(
          col("doc_id"),
          size(t).as("n_tokens"),
          size(array_distinct(t)).as("n_uniq"),
          round(size(array_distinct(t)) * lit(1.0) / size(t), 4).as("ttr"),
          round(length(regexp_replace(lower(trim(col("text"))), "\\s+", ""))
            * lit(1.0) / size(t), 4).as("avg_tok_len"))
        .orderBy("doc_id")
    },

    // Quality scoring: length/stopword/punctuation signals + banding.
    QueryDef(
      "q34_quality_score",
      s"""SELECT doc_id, n_chars,
         | CAST(len(t) AS INTEGER) AS n_tokens,
         | round(len(list_filter(t, x -> x IN (${Stopwords.map("'" + _ + "'").mkString(",")})))
         |       * 1.0 / len(t), 4) AS stopword_ratio,
         | round(len(regexp_extract_all(text, '[[:punct:]]')) * 1.0
         |       / greatest(length(text), 1), 4) AS punct_ratio,
         | CASE WHEN len(t) >= 60 THEN 'long'
         |      WHEN len(t) >= 30 THEN 'medium' ELSE 'short' END AS len_band
         |FROM (SELECT *, string_split_regex(lower(trim(text)), '\\s+') AS t
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val t = col("t")
      val stops = array(Stopwords.map(lit): _*)
      withToks(Tables(spark, dir).documents,
        col("doc_id"), col("n_chars"), col("text"))
        .select(
          col("doc_id"), col("n_chars"),
          size(t).as("n_tokens"),
          round(size(filter(t, x => array_contains(stops, x)))
            * lit(1.0) / size(t), 4).as("stopword_ratio"),
          round(regexp_count(col("text"), lit("\\p{Punct}")) * lit(1.0)
            / greatest(length(col("text")), lit(1)), 4).as("punct_ratio"),
          when(size(t) >= 60, "long").when(size(t) >= 30, "medium")
            .otherwise("short").as("len_band"))
        .orderBy("doc_id")
    },

    // Document fingerprint: md5 over whitespace-normalized lowercase
    // text — the exact-dedup key.
    QueryDef(
      "q35_fingerprint",
      """SELECT doc_id,
        | md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).documents.select(
        col("doc_id"),
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("fp"))
        .orderBy("doc_id")
    },

    // Exact dedup summary over the fingerprint (hash-groupBy dedup).
    QueryDef(
      "q36_exact_dedup",
      """SELECT count(*) AS n_docs,
        | count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
        |   AS n_distinct,
        | CAST(count(*) - count(DISTINCT
        |   md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS BIGINT)
        |   AS n_dup_rows
        |FROM documents""".stripMargin) { (spark, dir) =>
      val fp = md5(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
      Tables(spark, dir).documents
        .select(fp.as("fp"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_distinct"),
          (count(lit(1)) - countDistinct(col("fp"))).as("n_dup_rows"))
    },

    // MinHash signatures (k=8, one digest + k mixes, no explode —
    // map-only; native one-pass kernel).
    QueryDef(
      "q37_minhash_sig",
      s"""WITH $duckSig
         |SELECT doc_id, ${(0 until K).map("mh" + _).mkString(", ")}
         |FROM sig ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val docs = Tables(spark, dir).documents
        .repartition(spark.sparkContext.defaultParallelism)
      withSig(spark, withShingles(docs, col("doc_id")))
        .orderBy("doc_id")
    },

    // LSH candidate pairs: 2 bands x 4 rows; docs sharing a band
    // bucket are near-dup candidates. The join key is the band hash,
    // so at scale this is a single shuffle on bucket.
    QueryDef(
      "q38_lsh_candidates",
      s"""WITH $duckCand
         |SELECT d1, d2 FROM cand ORDER BY d1, d2""".stripMargin) {
      (spark, dir) =>
        lshPipeline(spark, dir)._1.orderBy("d1", "d2")
    },

    // Exact n-gram Jaccard verification of the LSH candidates — the
    // full dedup pipeline (signature → bands → candidates → exact
    // verify ≥ 0.8). All-pairs exact Jaccard is O(n²) in shared-
    // shingle frequency and measured 4× the cost of this at sf0.1;
    // verifying candidates is the shape that survives 100 TB.
    QueryDef(
      "q39_jaccard_neardup",
      s"""WITH $duckCand,
         |${duckPairOverlap("cand", "d1", "d2")}
         |SELECT d1, d2,
         | round(i * 1.0 / (s1.sz + s2.sz - i), 3) AS jaccard
         |FROM inter
         |JOIN sizes s1 ON d1 = s1.doc_id
         |JOIN sizes s2 ON d2 = s2.doc_id
         |WHERE i * 1.0 / (s1.sz + s2.sz - i) >= 0.8
         |ORDER BY d1, d2""".stripMargin) { (spark, dir) =>
      val (cand, shl, _) = lshPipeline(spark, dir, keepShingles = true)
      val (inter, sizes) = pairOverlap(cand, shl, "d1", "d2")
      inter
        .join(broadcast(sizes.as("s1")), col("d1") === col("s1.doc_id"))
        .join(broadcast(sizes.as("s2")), col("d2") === col("s2.doc_id"))
        .withColumn("jaccard_raw",
          col("i") * lit(1.0) / (col("s1.sz") + col("s2.sz") - col("i")))
        .filter(col("jaccard_raw") >= 0.8)
        .select(col("d1"), col("d2"), round(col("jaccard_raw"), 3).as("jaccard"))
        .orderBy("d1", "d2")
    },

    // 32-bit SimHash over token hashes; the per-bit majority vote is
    // generated as 32 conditional sums in both engines.
    QueryDef(
      "q40_simhash",
      s"""WITH toks AS (SELECT doc_id,
         |   unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
         | FROM documents),
         |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM toks),
         |s AS (SELECT doc_id,
         |${(0 until 32).map(b =>
            s"  sum(((h >> $b) & 1) * 2 - 1) AS s$b").mkString(",\n")}
         | FROM h GROUP BY doc_id)
         |SELECT doc_id, CAST(${(0 until 32).map(b =>
            s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")}
         |  AS BIGINT) AS simhash
         |FROM s ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val h = Tables(spark, dir).documents
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
        .withColumn("h", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
      val sums = (0 until 32).map(b =>
        sum(shiftright(col("h"), b).bitwiseAND(1) * 2 - 1).as(s"s$b"))
      val sim = (0 until 32)
        .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _)
      h.groupBy("doc_id").agg(sums.head, sums.tail: _*)
        .select(col("doc_id"), sim.cast("long").as("simhash"))
        .orderBy("doc_id")
    },

    // Duplicate-cluster formation: connected components over the LSH
    // candidate pairs, labeled by minimum member (the canonical doc).
    // Spark: distributed min-label propagation; oracle: recursive CTE
    // reachability + min — independent algorithms, same fixpoint.
    QueryDef(
      "q59_dup_clusters",
      s"""WITH RECURSIVE $duckCand,
         |$DuckComponents
         |SELECT doc_id, cluster FROM cl ORDER BY doc_id""".stripMargin) {
      (spark, dir) =>
        DupClusters.clusters(lshPipeline(spark, dir)._1)
          .orderBy("doc_id")
    },

    // Rolling-hash fingerprinting (MOSS winnowing): polynomial k-gram
    // hashes over the normalized char stream, then the min of each w
    // consecutive hashes — the near-dup fingerprint scheme that
    // detects shared substrings, where q35's whole-document md5 only
    // catches exact copies. Hash constants are Scala-side and
    // interpolated into the oracle (base^j powers as exact long
    // literals; max value ~6e13, far from overflow). Map-only per doc.
    QueryDef(
      "q65_winnow_fingerprint", {
        val terms = (0 until FpK).map(j =>
          s"CAST(cs[CAST(i+$j AS INT)] AS BIGINT)*${FpPow(j)}")
          .mkString(" + ")
        val mins = (0 until FpW).map(j => s"hs[CAST(i+$j AS INT)]")
          .mkString("least(", ", ", ")")
        s"""WITH d AS (SELECT doc_id,
           |   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
           | FROM documents),
           |c AS (SELECT doc_id, list_transform(
           |   generate_series(1, length(t)),
           |   i -> ascii(substr(t, CAST(i AS INT), 1))) AS cs FROM d),
           |h AS (SELECT doc_id, list_transform(
           |   generate_series(1, greatest(len(cs)-${FpK - 1}, 0)),
           |   i -> $terms) AS hs FROM c),
           |w AS (SELECT doc_id, hs, list_distinct(list_transform(
           |   generate_series(1, greatest(len(hs)-${FpW - 1}, 0)),
           |   i -> $mins)) AS fp FROM h)
           |SELECT doc_id, CAST(len(hs) AS INTEGER) AS n_windows,
           | CAST(len(fp) AS INTEGER) AS n_fp,
           | coalesce(CAST(list_sum(fp) AS BIGINT), 0) AS fp_sum
           |FROM w ORDER BY doc_id""".stripMargin
      }) { (spark, dir) =>
      // native kernels (graft.functions.TextHashes): the HOF
      // formulation of the same arithmetic was interpreted and 4.4s
      // steady at sf0.1; the primitive-loop expressions are ~40ms
      val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
      val hashed = Tables(spark, dir).documents
        .select(col("doc_id"), norm.as("t"))
        .select(col("doc_id"),
          graft.functions.TextHashes.rollingHash(spark, col("t"), FpK)
            .as("hs"))
      hashed.select(col("doc_id"), col("hs"), array_distinct(
          graft.functions.TextHashes.windowMin(spark, col("hs"), FpW))
          .as("fp"))
        .select(col("doc_id"),
          size(col("hs")).as("n_windows"),
          size(col("fp")).as("n_fp"),
          coalesce(aggregate(col("fp"), lit(0L), (acc, x) => acc + x),
            lit(0L)).as("fp_sum"))
        .orderBy("doc_id")
    },

    // Deterministic stratified sampling — corpus rebalancing by
    // language, the subset-selection op of a training-data pipeline.
    // Keep decisions hash on doc_id (15-hex md5 prefix → [0, 16^15)),
    // so the sample is reproducible run-to-run, engine-to-engine, and
    // under repartitioning — unlike rand()-based TABLESAMPLE. Map-only:
    // a filter, no shuffle beyond the output ORDER BY.
    QueryDef(
      "q64_stratified_sample", {
        val rates = SampleThresholds.map { case (l, t) =>
          s"WHEN lang = '$l' THEN $t"
        }.mkString(" ")
        s"""SELECT doc_id, lang
           |FROM (SELECT doc_id, lang,
           |  ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT AS hv,
           |  CASE $rates ELSE 0 END AS threshold
           | FROM documents)
           |WHERE hv < threshold
           |ORDER BY doc_id""".stripMargin
      }) { (spark, dir) =>
      val threshold = SampleThresholds.map { case (l, t) =>
        when(col("lang") === l, lit(t))
      }.reduce(coalesce(_, _))
      Tables(spark, dir).documents
        .select(col("doc_id"), col("lang"),
          graft.functions.KmvSketch.md5Hash60(col("doc_id")).as("hv"),
          coalesce(threshold, lit(0L)).as("threshold"))
        .filter(col("hv") < col("threshold"))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    },

    // Deterministic global shuffle + stable sharding — the
    // reproducibility primitive every training run needs: the corpus
    // ordered by a seeded content-free hash (re-running ANY subset of
    // the pipeline reproduces the exact order; no rand(), no
    // partition-index dependence) and sharded by the same hash. The
    // audit aggregates per shard: size, the shard's first/last doc in
    // shuffle order (min_by/max_by on the hash — exact cross-engine
    // because the md5 recipe is the q64 one DuckDB mirrors), and a
    // membership checksum. Shape at scale: the shuffle is one
    // range-sort by hv (∝ corpus, the op's definition); sharding is
    // map-only arithmetic on the same hash.
    QueryDef(
      "q123_deterministic_shuffle",
      """WITH h AS (SELECT doc_id,
        |  ('0x'||substr(md5('42:'||CAST(doc_id AS VARCHAR)),1,15))::BIGINT
        |    AS hv
        | FROM documents)
        |SELECT CAST(hv % 8 AS BIGINT) AS shard,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(arg_min(doc_id, hv) AS BIGINT) AS first_doc,
        | CAST(arg_max(doc_id, hv) AS BIGINT) AS last_doc,
        | CAST(sum(doc_id) AS BIGINT) AS sum_doc
        |FROM h GROUP BY 1 ORDER BY shard""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).documents
        .select(col("doc_id"), graft.functions.KmvSketch.md5Hash60(
          concat(lit("42:"), col("doc_id").cast("string"))).as("hv"))
        .groupBy((col("hv") % 8).as("shard"))
        .agg(count(lit(1)).as("n"),
          min_by(col("doc_id"), col("hv")).as("first_doc"),
          max_by(col("doc_id"), col("hv")).as("last_doc"),
          sum("doc_id").as("sum_doc"))
        .orderBy("shard")
    },

    // Gopher-style repetition signals: the share of the most frequent
    // word and the duplicate-bigram fraction — the classic "remove
    // degenerate repetitive documents" filters of an LLM data
    // pipeline. Word counts go through an explode + two-level
    // aggregate (distributed, no per-doc state); bigrams pair
    // adjacent staged tokens with zip_with over slices (sequence()
    // would run DESCENDING for 1-token docs). Raw doubles: single
    // exact-int divisions are bit-identical across engines.
    QueryDef(
      "q62_repetition",
      """WITH d AS (SELECT doc_id,
        |   string_split_regex(lower(trim(text)), '\s+') AS t
        | FROM documents),
        |w AS (SELECT doc_id, unnest(t) AS w FROM d),
        |wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
        |top AS (SELECT doc_id, CAST(max(c) AS DOUBLE) AS maxc,
        |   CAST(sum(c) AS BIGINT) AS n FROM wc GROUP BY 1),
        |b AS (SELECT doc_id, list_transform(generate_series(1, len(t)-1),
        |   i -> t[i] || ' ' || t[i+1]) AS bg FROM d)
        |SELECT top.doc_id, CAST(n AS INTEGER) AS n_tokens,
        | maxc / n AS top_word_frac,
        | CASE WHEN len(bg) = 0 THEN 0.0
        |      ELSE 1.0 - len(list_distinct(bg)) * 1.0 / len(bg)
        | END AS dup_bigram_frac
        |FROM top JOIN b ON top.doc_id = b.doc_id
        |ORDER BY top.doc_id""".stripMargin) { (spark, dir) =>
      val docs = Tables(spark, dir).documents
      // the staged token frame feeds BOTH aggregate branches of the
      // join below — persist so documents is scanned and tokenized
      // once, not once per branch
      val t = withToks(docs, col("doc_id")).persist()
      val top = t.select(col("doc_id"), explode(col("t")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(max("c").cast("double").as("maxc"), sum("c").as("n"))
      val big = t.select(col("doc_id"), zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => concat(a, lit(" "), b)).as("bg"))
        .select(col("doc_id"), size(col("bg")).as("nbg"),
          size(array_distinct(col("bg"))).as("ubg"))
      top.join(big, "doc_id")
        .select(col("doc_id"), col("n").cast("int").as("n_tokens"),
          (col("maxc") / col("n")).as("top_word_frac"),
          // a <2-token doc has NO bigrams — that is zero repetition,
          // not maximal (1 - 0/1 would score it 1.0 and a Gopher-style
          // filter would drop every short document)
          when(col("nbg") === 0, lit(0.0))
            .otherwise(lit(1.0) - col("ubg") * lit(1.0) / col("nbg"))
            .as("dup_bigram_frac"))
        .orderBy("doc_id")
    },

    // BPE-style subword pretokenization (the GPT-2 pretokenizer split,
    // minus its trailing-space lookahead, which RE2 lacks): contraction
    // suffixes, space-prefixed letter runs, digit runs, punctuation
    // runs. n_bpe/n_words ("fertility") is the token-budget metric an
    // LLM-data pipeline tracks per document. Same regex string feeds
    // Java (Spark) and RE2 (DuckDB) — both match leftmost-first.
    QueryDef(
      "q61_bpe_tokens", {
        val sqlPat = BpePattern.replace("'", "''")
        s"""SELECT doc_id,
           | CAST(len(regexp_extract_all(text, '$sqlPat')) AS INTEGER)
           |   AS n_bpe,
           | CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER)
           |   AS n_words,
           | round(len(regexp_extract_all(text, '$sqlPat')) * 1.0 /
           |   greatest(len(string_split_regex(trim(text), '\\s+')), 1), 4)
           |   AS fertility
           |FROM documents ORDER BY doc_id""".stripMargin
      }) { (spark, dir) =>
      Tables(spark, dir).documents
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
            .as("n_bpe"),
          size(split(trim(col("text")), "\\s+")).as("n_words"))
        .select(col("doc_id"), col("n_bpe"), col("n_words"),
          round(col("n_bpe") * lit(1.0) /
            greatest(col("n_words"), lit(1)), 4).as("fertility"))
        .orderBy("doc_id")
    },

    // Canonical-document selection — the step AFTER near-dup
    // clustering in a dedup pipeline: per duplicate cluster keep the
    // "best" member (here: longest text, doc_id tiebreak) and record
    // cluster size. Composes q38's candidates and q59's components
    // with a quality-ranked pick; at scale this is one extra window
    // over the (doc, cluster) frame — cluster count ∝ dups, not corpus.
    QueryDef(
      "q67_canonical_docs",
      s"""WITH RECURSIVE $duckCand,
         |$DuckComponents,
         |m AS (SELECT cl.cluster, cl.doc_id, d.n_chars,
         |        row_number() OVER (PARTITION BY cl.cluster
         |          ORDER BY d.n_chars DESC, cl.doc_id) AS rn
         |      FROM cl JOIN documents d ON cl.doc_id = d.doc_id)
         |SELECT cluster, doc_id AS canonical_doc, n_chars AS canon_chars,
         |  CAST((SELECT count(*) FROM cl c2 WHERE c2.cluster = m.cluster)
         |    AS BIGINT) AS n_members
         |FROM m WHERE rn = 1 ORDER BY cluster""".stripMargin) { (spark, dir) =>
      val clusters = DupClusters.clusters(lshPipeline(spark, dir)._1)
      val sizes = clusters.groupBy("cluster")
        .agg(count(lit(1)).as("n_members"))
      val w = Window.partitionBy("cluster")
        .orderBy(col("n_chars").desc, col("doc_id"))
      clusters
        .join(Tables(spark, dir).documents.select("doc_id", "n_chars"),
          "doc_id")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .join(broadcast(sizes), "cluster")
        .select(col("cluster"), col("doc_id").as("canonical_doc"),
          col("n_chars").as("canon_chars"), col("n_members"))
        .orderBy("cluster")
    },

    // PII detection + redaction — the scrub pass of a training-data
    // pipeline. The corpus is synthetic word-salad with no real PII,
    // so deterministic contact strings are planted from driver data
    // IN THE QUERY (identically in both engines): the patterns must
    // find exactly those spans and the redacted-text fingerprint
    // proves the replacement is byte-identical. Map-only; the shared
    // regexes are RE2-safe (no lookarounds).
    QueryDef(
      "q68_pii_scrub", {
        val email = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
        val phone = """\+[0-9][0-9-]{7,}[0-9]"""
        s"""WITH e AS (SELECT doc_id,
           |  text || ' contact ' || source || doc_id ||
           |    '@corp.example or +1-202-555-0' ||
           |    lpad((doc_id % 1000)::VARCHAR, 3, '0') AS t
           | FROM documents)
           |SELECT doc_id,
           | CAST(len(regexp_extract_all(t, '$email')) AS INTEGER) AS n_emails,
           | CAST(len(regexp_extract_all(t, '$phone')) AS INTEGER) AS n_phones,
           | md5(regexp_replace(regexp_replace(t, '$email', '<EMAIL>', 'g'),
           |     '$phone', '<PHONE>', 'g')) AS redacted_fp
           |FROM e ORDER BY doc_id""".stripMargin
      }) { (spark, dir) =>
      val email = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
      val phone = """\+[0-9][0-9-]{7,}[0-9]"""
      Tables(spark, dir).documents
        .select(col("doc_id"), concat(col("text"), lit(" contact "),
          col("source"), col("doc_id").cast("string"),
          lit("@corp.example or +1-202-555-0"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0")).as("t"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(email), lit(0)))
            .as("n_emails"),
          size(regexp_extract_all(col("t"), lit(phone), lit(0)))
            .as("n_phones"),
          md5(regexp_replace(regexp_replace(col("t"), email, "<EMAIL>"),
            phone, "<PHONE>")).as("redacted_fp"))
        .orderBy("doc_id")
    },

    // TF-IDF keyword extraction: top-3 terms per document. IDF is the
    // LOG-FREE variant N/df — ln() is not bit-identical across libm
    // implementations, while IEEE divide/multiply are, so the score
    // (and therefore the ranking) is exactly reproducible engine-to-
    // engine. Shape at scale: one explode + two aggregates; df is a
    // corpus-wide term aggregate (shuffle ∝ vocabulary, not corpus²).
    QueryDef(
      "q69_tfidf_topk",
      """WITH d AS (SELECT doc_id,
        |   string_split_regex(lower(trim(text)), '\s+') AS t
        | FROM documents),
        |w AS (SELECT doc_id, unnest(t) AS term FROM d),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM w GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (SELECT tf.doc_id, tf.term,
        |        CAST(tf.tf AS BIGINT) AS tf, CAST(df.df AS BIGINT) AS df,
        |        tf.tf * (n.n * 1.0 / df.df) AS score
        |      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
        |SELECT doc_id, term, tf, df, round(score, 4) AS tf_idf,
        |  CAST(rn AS INTEGER) AS rn
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score DESC, term) AS rn FROM s)
        |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin) { (spark, dir) =>
      val docs = Tables(spark, dir).documents
      val words = withToks(docs, col("doc_id"))
        .select(col("doc_id"), explode(col("t")).as("term"))
        .persist() // feeds both the tf and df aggregates
      val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = words.groupBy("term")
        .agg(countDistinct(col("doc_id")).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term"))
      tf.join(df, "term")
        .crossJoin(broadcast(n))
        .withColumn("score", col("tf") * (col("n") * lit(1.0) / col("df")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          round(col("score"), 4).as("tf_idf"), col("rn"))
        .orderBy("doc_id", "rn")
    },

    // Char-n-gram language ID: profile overlap heuristic. The tiny
    // built-in trigram profiles below are literal data, so the whole
    // classifier is SQL-expressible — the oracle is GENERATED from the
    // same constants (no drift possible). Ties break alphabetically
    // (coalesce over sorted langs == CASE over sorted langs).
    QueryDef(
      "q41_langid_ngram", {
        val score = LangIdProfiles.map { case (lang, grams) =>
          grams.map(g => s"(CASE WHEN contains(lt, '$g') THEN 1 ELSE 0 END)")
            .mkString(" + ") + s" AS score_$lang"
        }.mkString(",\n  ")
        val g = LangIdProfiles.map { case (l, _) => s"score_$l" }
          .mkString("greatest(", ", ", ")")
        val pick = LangIdProfiles.map { case (l, _) =>
          s"WHEN score_$l = g THEN '$l'"
        }.mkString(" ")
        s"""WITH s AS (
           | SELECT doc_id, lang AS labeled_lang,
           |  $score
           | FROM (SELECT *, lower(text) AS lt FROM documents))
           |SELECT doc_id, labeled_lang,
           | CASE $pick END AS predicted_lang
           |FROM (SELECT *, $g AS g FROM s)
           |ORDER BY doc_id""".stripMargin
      }) { (spark, dir) =>
      val scores = LangIdProfiles.map { case (lang, grams) =>
        grams.map(g => when(col("lt").contains(g), 1).otherwise(0))
          .reduce(_ + _).as(s"score_$lang")
      }
      val scored = Tables(spark, dir).documents
        .withColumn("lt", lower(col("text")))
        .select(col("doc_id") +: col("lang").as("labeled_lang") +: scores: _*)
      val langCols = LangIdProfiles.map(_._1)
      scored
        .withColumn("predicted", greatest(langCols.map(l => col(s"score_$l")): _*))
        .withColumn("predicted_lang",
          langCols.map(l => when(col(s"score_$l") === col("predicted"), l))
            .reduce((a, b) => coalesce(a, b)))
        .select(col("doc_id"), col("labeled_lang"), col("predicted_lang"))
        .orderBy("doc_id")
    },

    // Benchmark decontamination — the GPT-3/Llama training-hygiene op:
    // flag training documents sharing any 8-token n-gram with a held-
    // out benchmark set (here: doc_id % 11 — a deterministic harness
    // stand-in for the real test-set corpus). Shape at scale: the
    // benchmark n-gram set is tiny (a few MB for every public eval
    // suite combined) and is BROADCAST; the corpus side is one
    // projection + explode + partial-aggregated count — no corpus
    // shuffle on anything wider than (doc_id, hit-count). Left join
    // keeps clean docs in the report (the common case).
    QueryDef(
      "q74_decontaminate",
      s"""WITH toks AS (SELECT doc_id,
         |   string_split_regex(lower(trim(text)), '\\s+') AS t
         | FROM documents),
         |g AS (SELECT doc_id, ${duckNgrams(8)} AS g
         | FROM toks),
         |bench AS (SELECT DISTINCT unnest(g) AS gram FROM g WHERE doc_id % 11 = 0),
         |tg AS (SELECT doc_id, unnest(g) AS gram FROM g WHERE doc_id % 11 <> 0),
         |hits AS (SELECT tg.doc_id, count(*) AS n
         |         FROM tg JOIN bench USING (gram) GROUP BY 1)
         |SELECT g.doc_id, CAST(len(g.g) AS INTEGER) AS n_grams,
         | CAST(coalesce(hits.n, 0) AS BIGINT) AS n_contaminated,
         | coalesce(hits.n, 0) > 0 AS contaminated,
         | round(coalesce(hits.n, 0) * 1.0 / greatest(len(g.g), 1), 4)
         |   AS contamination
         |FROM g LEFT JOIN hits ON g.doc_id = hits.doc_id
         |WHERE g.doc_id % 11 <> 0
         |ORDER BY g.doc_id""".stripMargin) { (spark, dir) =>
      val grams = withNgrams(Tables(spark, dir).documents, 8, "g",
          col("doc_id"))
        .persist() // feeds the bench side, the train side, and the report
      gramDecontaminate(grams, col("doc_id") % 11 === 0)
        .orderBy("doc_id")
    },

    // Cross-document duplicated-span fraction (RefinedWeb/CCNet
    // shape): cut each document into non-overlapping 8-token chunks
    // and measure what fraction of a doc's chunks also occur in some
    // OTHER document. Shape at scale: chunk-frequency is a partial-
    // aggregated count keyed by the chunk hash (shuffle ∝ distinct
    // chunks, never corpus²); the per-doc rollup is a second narrow
    // aggregate. This is the span-level complement of doc-level
    // near-dup (q39/q43) — it catches boilerplate shared across
    // otherwise-distinct pages.
    QueryDef(
      "q75_dup_spans",
      s"""WITH toks AS (SELECT doc_id,
         |   string_split_regex(lower(trim(text)), '\\s+') AS t
         | FROM documents),
         |c AS (SELECT doc_id, list_distinct($DuckChunks) AS c
         | FROM toks),
         |e AS (SELECT doc_id, unnest(c) AS chunk FROM c),
         |dup AS (SELECT chunk FROM e GROUP BY chunk
         |        HAVING count(DISTINCT doc_id) >= 2),
         |hits AS (SELECT e.doc_id, count(*) AS n FROM e
         |         JOIN dup USING (chunk) GROUP BY 1)
         |SELECT c.doc_id, CAST(len(c.c) AS INTEGER) AS n_chunks,
         | CAST(coalesce(hits.n, 0) AS BIGINT) AS n_dup_chunks,
         | round(coalesce(hits.n, 0) * 1.0 / greatest(len(c.c), 1), 4)
         |   AS dup_frac
         |FROM c LEFT JOIN hits ON c.doc_id = hits.doc_id
         |ORDER BY c.doc_id""".stripMargin) { (spark, dir) =>
      val chunks = withToks(Tables(spark, dir).documents, col("doc_id"))
        .select(col("doc_id"), array_distinct(chunksExpr).as("c"))
        .persist() // feeds the frequency count and the per-doc report
      val ex = chunks.select(col("doc_id"), explode(col("c")).as("chunk"))
      // (doc_id, chunk) pairs are distinct by construction (per-doc
      // array_distinct), so plain count == count(DISTINCT doc_id) —
      // skips the Expand a distinct-agg would add
      val dup = ex.groupBy("chunk")
        .agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 2).select("chunk")
      val hits = ex.join(dup, "chunk")
        .groupBy("doc_id").agg(count(lit(1)).as("n"))
      chunks.select(col("doc_id"), size(col("c")).as("n_chunks"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chunks"),
          coalesce(col("n"), lit(0L)).as("n_dup_chunks"),
          round(coalesce(col("n"), lit(0L)) * lit(1.0)
            / greatest(col("n_chunks"), lit(1)), 4).as("dup_frac"))
        .orderBy("doc_id")
    },

    // BM25 retrieval scoring — the lexical-search primitive next to
    // q69's TF-IDF: score every document against a fixed 4-term query
    // with the Okapi shape tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) per
    // term, weighted by the Robertson IDF kept in RATIONAL form
    // ((N−df+0.5)/(df+0.5), no ln — transcendental libm calls are not
    // bit-stable across engines, and the rational form is monotone in
    // the same quantity, so ranking semantics are preserved while
    // every double is bit-equal cross-engine). Per-term products are
    // summed in fixed column order (the q97 discipline). Shape at
    // scale: per-term tf is a per-row array probe (map-only); the
    // corpus stats (N, Σdl, four df counts) are ONE aggregate row
    // broadcast back; top-10 is TakeOrderedAndProject — the corpus
    // never shuffles.
    QueryDef(
      "q111_bm25_retrieval", {
        val terms = Seq("spark", "shuffle", "window", "stream")
        val fs = terms.indices.map(i =>
          s"len(list_filter(t, x -> x = '${terms(i)}')) AS f$i")
          .mkString(", ")
        val dfs = terms.indices.map(i =>
          s"sum(CASE WHEN f$i > 0 THEN 1 ELSE 0 END) AS df$i")
          .mkString(", ")
        val score = terms.indices.map(i =>
          s"((s.n - s.df$i + 0.5) / (s.df$i + 0.5))" +
            s" * ((f$i * 2.2) / (f$i + 1.2 * (0.25 + 0.75 * dl / (s.sdl * 1.0 / s.n))))")
          .mkString("\n        | + ")
        s"""WITH d AS (SELECT doc_id,
           |   string_split_regex(lower(trim(text)), '\\s+') AS t
           | FROM documents),
           |f AS (SELECT doc_id, len(t) AS dl, $fs FROM d),
           |s AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sdl,
           |        $dfs FROM f)
           |SELECT doc_id, round($score, 6) AS bm25
           |FROM f, s WHERE f0 + f1 + f2 + f3 > 0
           |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin
      }) { (spark, dir) =>
      bm25Scores(withToks(Tables(spark, dir).documents, col("doc_id")),
          Seq("spark", "shuffle", "window", "stream"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(10)
    },

    // Maintained inverted index (ops.TextIndex) — q111's retrieval
    // served WITHOUT touching the corpus at query time: documents are
    // tokenized ONCE into a term-bucketed postings table, a delta
    // DELETES every 17th doc (tombstone protocol), and the search
    // reads only the four query terms' buckets + the docs census. The
    // oracle scores the surviving corpus directly with the same
    // rational-IDF/Okapi formula — hash equality proves the
    // index-served path (build → delta → tombstone-folded search)
    // byte-identical to scoring the edited corpus from scratch.
    QueryDef.statefulQ(
      "q121_indexed_bm25", {
        val terms = Seq("spark", "shuffle", "window", "stream")
        val fs = terms.indices.map(i =>
          s"len(list_filter(t, x -> x = '${terms(i)}')) AS f$i")
          .mkString(", ")
        val dfs = terms.indices.map(i =>
          s"sum(CASE WHEN f$i > 0 THEN 1 ELSE 0 END) AS df$i")
          .mkString(", ")
        val score = terms.indices.map(i =>
          s"((s.n - s.df$i + 0.5) / (s.df$i + 0.5))" +
            s" * ((f$i * 2.2) / (f$i + 1.2 * (0.25 + 0.75 * dl / (s.sdl * 1.0 / s.n))))")
          .mkString("\n        | + ")
        s"""WITH d AS (SELECT doc_id,
           |   string_split_regex(lower(trim(text)), '\\s+') AS t
           | FROM documents WHERE doc_id % 17 <> 0),
           |f AS (SELECT doc_id, len(t) AS dl, $fs FROM d),
           |s AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sdl,
           |        $dfs FROM f)
           |SELECT doc_id, round($score, 6) AS bm25
           |FROM f, s WHERE f0 + f1 + f2 + f3 > 0
           |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin
      }) { (spark, dir) =>
      val work = QueryDef.tempWorkDir("graft-ti-q121-")
      val docs = Tables(spark, dir).documents.select("doc_id", "text")
      // non-default fanout (round 16 build knob): scores are
      // fanout-independent by construction, so the oracle hash also
      // gates the stored-count routing end to end — a misroute would
      // drop matching postings and change the top-10
      graft.ops.TextIndex.build(spark, docs, s"$work/idx",
        termBuckets = 16)
      graft.ops.TextIndex.applyDelta(spark, s"$work/idx",
        upserts = docs.limit(0),
        deletes = docs.filter(col("doc_id") % 17 === 0).select("doc_id"))
      graft.ops.TextIndex.search(spark, s"$work/idx",
          Seq("spark", "shuffle", "window", "stream"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(10)
    },

    // Corpus vocabulary heavy hitters — the tokenizer-training /
    // vocab-audit op: global top-25 terms by frequency with document
    // frequency alongside. Shape at scale: classic two-level
    // aggregate — map-side partial counts, one shuffle keyed by term
    // (∝ vocabulary, not corpus), then a single top-k sort over the
    // vocabulary-sized aggregate. The global top-k never materializes
    // the full corpus anywhere.
    QueryDef(
      "q77_vocab_topk",
      """WITH w AS (SELECT doc_id,
        |   unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        | FROM documents),
        |a AS (SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
        |      FROM w GROUP BY 1)
        |SELECT term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        | CAST(rn AS INTEGER) AS rn
        |FROM (SELECT *, row_number() OVER (ORDER BY tf DESC, term) AS rn
        |      FROM a)
        |WHERE rn <= 25 ORDER BY rn""".stripMargin) { (spark, dir) =>
      val words = withToks(Tables(spark, dir).documents, col("doc_id"))
        .select(col("doc_id"), explode(col("t")).as("term"))
      val agg = words.groupBy("term")
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      // distributed top-k (TakeOrderedAndProject), NOT a global
      // row_number window — a single-partition window would drag the
      // whole vocabulary through one task at scale. Rank is assigned
      // after the limit over the 25 survivors, window-free: one
      // sorted-array aggregate + posexplode (position = rank), so no
      // partition-less WindowExec exists anywhere in the suite (a
      // global window over 25 rows is harmless but logs a
      // degradation WARN per AQE replan — 7 lines per run)
      val top = agg.orderBy(col("tf").desc, col("term")).limit(25)
      top
        .agg(sort_array(collect_list(struct((-col("tf")).as("ntf"),
          col("term"), col("tf"), col("df")))).as("a"))
        .select(posexplode(col("a")).as(Seq("i", "s")))
        .select(col("s.term").as("term"), col("s.tf").as("tf"),
          col("s.df").as("df"), (col("i") + 1).cast("int").as("rn"))
        .orderBy("rn")
    },

    // Domain-mixing weights — the data-mix op (DoReMi/Pile shape):
    // per (source, lang) token shares and the resampling weight that
    // would equalize the mix. weight = target_share / actual_share,
    // written with IDENTICAL operation order in both engines (integer-
    // derived doubles; IEEE divide is correctly rounded so the values
    // are bit-equal before round()). Shape at scale: one narrow
    // aggregate keyed by (source, lang) — the group count is tiny, so
    // the totals join is a broadcast of one row.
    QueryDef(
      "q78_domain_mix",
      """WITH d AS (SELECT source, lang,
        |   len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok
        | FROM documents),
        |a AS (SELECT source, lang, count(*) AS n_docs,
        |        CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |      FROM d GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
        |        count(*) AS n_groups FROM a)
        |SELECT a.source, a.lang, CAST(a.n_docs AS BIGINT) AS n_docs,
        | a.n_tokens,
        | round(a.n_tokens * 1.0 / t.total, 6) AS token_share,
        | round((1.0 / t.n_groups) / (a.n_tokens * 1.0 / t.total), 4)
        |   AS mix_weight
        |FROM a CROSS JOIN t
        |ORDER BY source, lang""".stripMargin) { (spark, dir) =>
      val agg = withToks(Tables(spark, dir).documents,
          col("source"), col("lang"))
        .select(col("source"), col("lang"), size(col("t")).as("n_tok"))
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok").cast("long")).as("n_tokens"))
      val totals = agg.agg(sum(col("n_tokens")).as("total"),
        count(lit(1)).as("n_groups"))
      agg.crossJoin(broadcast(totals))
        .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens") * lit(1.0) / col("total"), 6).as("token_share"),
          round((lit(1.0) / col("n_groups"))
            / (col("n_tokens") * lit(1.0) / col("total")), 4).as("mix_weight"))
        .orderBy("source", "lang")
    },

    // MinHash estimator quality: signature-agreement Jaccard estimate
    // (matching mins / k) vs exact Jaccard for every LSH candidate
    // pair — the number that tells an operator whether k=8 signatures
    // are trustworthy enough to SKIP exact verification at scale
    // (exact verify needs the shingle sets, the estimate only the
    // 64-byte signature). Both sides computed from the shared
    // signature constants; pure arithmetic, exact cross-engine before
    // round(4).
    QueryDef(
      "q90_minhash_estimate", {
        val agree = (0 until K).map(k =>
          s"(CASE WHEN a.mh$k = b.mh$k THEN 1 ELSE 0 END)").mkString(" + ")
        s"""WITH $duckCand,
           |${duckPairOverlap("cand", "d1", "d2")},
           |est AS (SELECT c.d1, c.d2, ($agree) / ${K}.0 AS e
           |        FROM cand c
           |        JOIN sig a ON a.doc_id = c.d1
           |        JOIN sig b ON b.doc_id = c.d2)
           |SELECT est.d1, est.d2,
           | round(est.e, 4) AS mh_est,
           | round(coalesce(i.i, 0) * 1.0 / (s1.sz + s2.sz - coalesce(i.i, 0)),
           |   4) AS jaccard,
           | round(abs(est.e - coalesce(i.i, 0) * 1.0
           |   / (s1.sz + s2.sz - coalesce(i.i, 0))), 4) AS est_err
           |FROM est
           |LEFT JOIN inter i ON est.d1 = i.d1 AND est.d2 = i.d2
           |JOIN sizes s1 ON est.d1 = s1.doc_id
           |JOIN sizes s2 ON est.d2 = s2.doc_id
           |ORDER BY est.d1, est.d2""".stripMargin
      }) { (spark, dir) =>
      // est starts from cand (LEFT join to the intersection): a
      // colliding pair with ZERO shared shingles is exactly the
      // estimator's worst case and must appear as jaccard 0, not
      // vanish from the audit
      val (cand0, shl, sig) = lshPipeline(spark, dir, keepShingles = true)
      val cand = cand0.persist() // fans out to the est and inter joins
      val agree = (0 until K).map(k =>
        when(col(s"a.mh$k") === col(s"b.mh$k"), 1).otherwise(0))
        .reduce(_ + _)
      val est = broadcast(cand)
        .join(sig.as("a"), col("d1") === col("a.doc_id"))
        .join(sig.as("b"), col("d2") === col("b.doc_id"))
        .select(col("d1"), col("d2"), (agree / lit(K.toDouble)).as("e"))
      val (inter, sizes) = pairOverlap(cand, shl, "d1", "d2")
      est
        .join(inter, Seq("d1", "d2"), "left")
        .join(broadcast(sizes.as("s1")), col("d1") === col("s1.doc_id"))
        .join(broadcast(sizes.as("s2")), col("d2") === col("s2.doc_id"))
        .withColumn("jac", coalesce(col("i"), lit(0L)) * lit(1.0)
          / (col("s1.sz") + col("s2.sz") - coalesce(col("i"), lit(0L))))
        .select(col("d1"), col("d2"), round(col("e"), 4).as("mh_est"),
          round(col("jac"), 4).as("jaccard"),
          round(abs(col("e") - col("jac")), 4).as("est_err"))
        .orderBy("d1", "d2")
    },

    // CAPSTONE: the end-to-end clean-corpus pipeline — quality filter
    // → exact dedup → near-dup cluster dedup → holdout +
    // decontamination — with per-stage drop accounting, i.e. the
    // actual job a user of this engine runs over a raw crawl. Every
    // stage reuses the engine's own kernels (token staging, q35's
    // fingerprint recipe, the q38 LSH candidate pairs restricted to
    // survivors, DupClusters min-label components, the q74 benchmark
    // gram set). Shape at scale: stages are sequential narrow
    // aggregates/joins over shrinking survivor sets; at 100 TB each
    // stage's survivor frame would checkpoint to the lake (here:
    // persist) — nothing in any stage is quadratic in the corpus.
    QueryDef(
      "q89_clean_corpus",
      s"""WITH RECURSIVE $duckCleanStages
         |SELECT stage, CAST(n_in AS BIGINT) AS n_in,
         |  CAST(n_in - n_out AS BIGINT) AS n_dropped,
         |  CAST(n_out AS BIGINT) AS n_out
         |FROM (
         |  SELECT '1_quality' AS stage,
         |    (SELECT count(*) FROM documents) AS n_in,
         |    (SELECT count(*) FROM s1) AS n_out
         |  UNION ALL SELECT '2_exact_dedup',
         |    (SELECT count(*) FROM s1), (SELECT count(*) FROM s2)
         |  UNION ALL SELECT '3_near_dup',
         |    (SELECT count(*) FROM s2), (SELECT count(*) FROM s3)
         |  UNION ALL SELECT '4_decontaminate',
         |    (SELECT count(*) FROM s3), (SELECT count(*) FROM s4))
         |ORDER BY stage""".stripMargin) { (spark, dir) =>
      val docs = Tables(spark, dir).documents
      val (s1, s2, s3, s4) = cleanStages(spark, dir)
      def cnt(df: DataFrame, as: String): DataFrame =
        df.agg(count(lit(1)).as(as))
      def stageRow(stage: String, in: DataFrame, out: DataFrame): DataFrame =
        cnt(in, "n_in").crossJoin(cnt(out, "n_out"))
          .select(lit(stage).as("stage"), col("n_in"),
            (col("n_in") - col("n_out")).as("n_dropped"), col("n_out"))
      stageRow("1_quality", docs.select("doc_id"), s1)
        .unionByName(stageRow("2_exact_dedup", s1, s2))
        .unionByName(stageRow("3_near_dup", s2, s3))
        .unionByName(stageRow("4_decontaminate", s3, s4))
        .orderBy("stage")
    },

    // Per-domain cap sampling — the "no domain dominates" crawl rule
    // (C4/RefinedWeb cap-per-host shape): keep at most 50 docs per
    // language by a deterministic hash priority. Shape at scale: a
    // plain per-key `row_number()` window sorts every row of a hot
    // key in ONE task (the dominant domain of a 100 TB crawl is a
    // straggler); graft.functions.TopKAgg is the native bounded-heap
    // aggregate instead — each map task reduces to a ≤cap heap per
    // key, only heaps cross the shuffle (≤ cap rows per key per
    // task), and nothing is ever fully sorted. The oracle is the
    // window formulation the aggregate provably equals.
    QueryDef(
      "q96_domain_cap",
      """WITH r AS (SELECT lang, doc_id,
        |   row_number() OVER (PARTITION BY lang
        |     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        | FROM documents)
        |SELECT lang, doc_id, CAST(rk AS INTEGER) AS rk
        |FROM r WHERE rk <= 50 ORDER BY lang, rk""".stripMargin) { (spark, dir) =>
      val cap = 50
      Tables(spark, dir).documents
        .select(col("lang"), col("doc_id"),
          md5(col("doc_id").cast("string")).as("pr"))
        .groupBy("lang")
        .agg(graft.functions.TopKAgg.topk(spark,
          col("pr"), col("doc_id"), cap).as("top"))
        // the heap is already (pr, id)-ascending: position = rank
        .select(col("lang"), posexplode(col("top")).as(Seq("i", "s")))
        .select(col("lang"), col("s.id").as("doc_id"),
          (col("i") + 1).cast("int").as("rk"))
        .orderBy("lang", "rk")
    },

    // Global span scrub — the REWRITE counterpart of q75's span
    // metric (the "remove duplicated passages, keep the rest of the
    // doc" step): cut every doc into non-overlapping 8-token chunks,
    // keep only each chunk's FIRST occurrence corpus-wide (by
    // (doc_id, position)), and reassemble what survives per doc —
    // reported as kept-chunk counts plus an md5 fingerprint of the
    // scrubbed text so the oracle checks the reconstruction
    // byte-for-byte. Shape at scale: first-occurrence selection is a
    // min-struct AGGREGATE keyed by chunk hash (shuffle ∝ distinct
    // chunks) — not a corpus-wide window sort; the reassembly is a
    // second narrow per-doc aggregate.
    QueryDef(
      "q99_span_scrub",
      s"""WITH toks AS (SELECT doc_id,
         |   string_split_regex(lower(trim(text)), '\\s+') AS t
         | FROM documents),
         |c AS (SELECT doc_id, $DuckChunks AS c
         | FROM toks),
         |e AS (SELECT doc_id, unnest(generate_series(1, len(c))) AS idx,
         |      unnest(c) AS chunk FROM c),
         |k AS (SELECT doc_id, idx, chunk, row_number() OVER (
         |   PARTITION BY chunk ORDER BY doc_id, idx) AS rn FROM e),
         |kept AS (SELECT doc_id, idx, chunk FROM k WHERE rn = 1),
         |agg AS (SELECT doc_id, count(*) AS n_kept,
         |   md5(string_agg(chunk, ' ' ORDER BY idx)) AS scrub_fp
         | FROM kept GROUP BY 1)
         |SELECT c.doc_id, CAST(len(c.c) AS INTEGER) AS n_chunks,
         | CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
         | coalesce(agg.scrub_fp, md5('')) AS scrub_fp
         |FROM c LEFT JOIN agg ON c.doc_id = agg.doc_id
         |ORDER BY c.doc_id""".stripMargin) { (spark, dir) =>
      val base = withToks(Tables(spark, dir).documents, col("doc_id"))
        .select(col("doc_id"), chunksExpr.as("c"))
        .persist() // feeds the chunk explode and the per-doc report
      val ex = base.select(col("doc_id"),
        posexplode(col("c")).as(Seq("idx", "chunk")))
      val first = ex.groupBy("chunk")
        .agg(min(struct(col("doc_id"), col("idx"))).as("k"))
      val kept = ex.join(first, "chunk")
        .filter(col("doc_id") === col("k.doc_id") &&
          col("idx") === col("k.idx"))
      // reassemble in position order; array_sort on (idx, chunk)
      // structs sorts by idx (first field) — deterministic
      val agg = kept.groupBy("doc_id").agg(
        count(lit(1)).as("n_kept"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("chunk")))),
          s => s.getField("chunk")), " ")).as("scrub_fp"))
      base.select(col("doc_id"), size(col("c")).as("n_chunks"))
        .join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chunks"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("scrub_fp"), md5(lit(""))).as("scrub_fp"))
        .orderBy("doc_id")
    },

    // Training-chunk windows — the tokenize-and-chunk step that turns
    // documents into model inputs: sliding 128-token windows with
    // stride 96 (32-token overlap so no boundary context is lost),
    // each chunk fingerprinted so the downstream pipeline can dedup /
    // shuffle chunks by content. Map-only: tokens staged once, chunks
    // are a per-row explode — no shuffle until the final ORDER BY.
    // At 100 TB this is the op whose OUTPUT is the training set, so
    // the only thing that matters is that it stays embarrassingly
    // parallel — and it does.
    QueryDef(
      "q100_chunk_windows",
      """WITH toks AS (SELECT doc_id,
        |   string_split_regex(lower(trim(text)), '\s+') AS t
        | FROM documents),
        |ch AS (SELECT doc_id, t,
        |   unnest(generate_series(0, (len(t) - 1) // 96)) AS i
        | FROM toks),
        |c AS (SELECT doc_id, i, t[(i*96+1):(i*96+128)] AS ck FROM ch)
        |SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
        | CAST(len(ck) AS INTEGER) AS n_tok,
        | md5(array_to_string(ck, ' ')) AS fp
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin) { (spark, dir) =>
      val (win, stride) = (128, 96)
      withToks(Tables(spark, dir).documents, col("doc_id"))
        .select(col("doc_id"), col("t"),
          explode(sequence(lit(0),
            ((size(col("t")) - 1) / stride).cast("int"))).as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          slice(col("t"), col("chunk_idx") * stride + 1, lit(win)).as("ck"))
        .select(col("doc_id"), col("chunk_idx"),
          size(col("ck")).as("n_tok"),
          md5(concat_ws(" ", col("ck"))).as("fp"))
        .orderBy("doc_id", "chunk_idx")
    },

    // Sequence packing plan — concatenate-then-cut (GPT-style) bin
    // assignment via the shared ops.Packing kernel: per source, docs
    // are laid out in doc_id order and cut into 2048-token context
    // windows; a doc belongs to the bin its first token lands in.
    // Reports per-bin doc/token counts and fill ratio — the
    // packing-efficiency audit that decides whether padding waste
    // justifies a smarter packer. Shape at scale: the kernel packs
    // per (source, shard) with a shardTokens budget so a dominant
    // source cannot straggle one window task (PackingSpec proves the
    // fill statistics match); the fixture runs single-shard, which is
    // the identical plan/result. The aggregate after it is narrow
    // (bins, not docs).
    QueryDef(
      "q101_pack_bins",
      """WITH d AS (SELECT doc_id, source,
        |   len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok
        | FROM documents),
        |c AS (SELECT source, doc_id, n_tok,
        |   coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
        | FROM d)
        |SELECT source, CAST(start_tok // 2048 AS INTEGER) AS bin,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        | round(sum(n_tok) / 2048.0, 4) AS fill
        |FROM c GROUP BY 1, 2 ORDER BY source, bin""".stripMargin) { (spark, dir) =>
      val d = withToks(Tables(spark, dir).documents,
          col("doc_id"), col("source"))
        .select(col("source"), col("doc_id"), size(col("t")).as("n_tok"))
      graft.ops.Packing.packBins(d, 2048)
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
        // int at the QUERY edge (fixture-bounded); the kernel keeps
        // bin long so >2^31-bin sources can't wrap
        .select(col("source"), col("bin").cast("int").as("bin"),
          col("n_docs"), col("n_tokens"),
          round(col("n_tokens") / lit(2048.0), 4).as("fill"))
        .orderBy("source", "bin")
    },

    // Sharded packing — the SCALE path of q101 under the oracle: the
    // same ops.Packing kernel with a 512-token shard budget, so every
    // source splits into ceil(tokens/512) shards (hashed doc ids —
    // stride-proof) and each shard packs independently into
    // 256-token bins.
    // This is the plan that cannot straggle on a dominant source —
    // no window partition exceeds ~budget tokens — and this query
    // hash-checks the shard assignment, per-shard offsets, and bin
    // accounting against an independent SQL derivation (PackingSpec
    // proves the fill-statistics envelope; this proves the exact
    // arithmetic cross-engine).
    QueryDef(
      "q110_pack_sharded",
      """WITH d AS (SELECT doc_id, source,
        |   len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok
        | FROM documents),
        |t AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS tot
        |      FROM d GROUP BY 1),
        |s AS (SELECT d.doc_id, d.source, d.n_tok,
        |        (('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,15))::BIGINT
        |          % ((t.tot - 1) // 512 + 1)) AS shard
        |      FROM d JOIN t USING (source)),
        |c AS (SELECT source, CAST(shard AS INTEGER) AS shard,
        |        doc_id, n_tok,
        |        coalesce(sum(n_tok) OVER (PARTITION BY source, shard
        |          ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
        |          AND 1 PRECEDING), 0) AS start_tok
        |      FROM s)
        |SELECT source, shard, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        | CAST(count(DISTINCT start_tok // 256) AS BIGINT) AS n_bins
        |FROM c GROUP BY 1, 2 ORDER BY source, shard""".stripMargin) {
      (spark, dir) =>
      val d = withToks(Tables(spark, dir).documents,
          col("doc_id"), col("source"))
        .select(col("source"), col("doc_id"), size(col("t")).as("n_tok"))
      graft.ops.Packing.packBins(d, 256, 512L)
        .groupBy("source", "shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
          countDistinct(col("bin")).as("n_bins"))
        // int at the QUERY edge; the kernel keeps shard/bin long
        .select(col("source"), col("shard").cast("int").as("shard"),
          col("n_docs"), col("n_tokens"), col("n_bins"))
        .orderBy("source", "shard")
    },

    // Incremental near-dup — the PRODUCTION dedup shape: a new batch
    // of documents (doc_id % 10 = 0 here; the day's crawl in a real
    // lake) probed against the already-indexed corpus, never
    // re-pairing the corpus with itself. Candidates come from the
    // same band-bucket scheme as q38 but joined new×index only; exact
    // Jaccard verifies candidates; each new doc reports its candidate
    // count, ≥0.8 duplicate count, and best match. Shape at scale:
    // the index side's (band, bucket) rows are precomputed once and
    // stored WITH the index; the new batch is small, so its bands
    // broadcast and the probe touches only matching buckets — cost ∝
    // batch, not corpus.
    QueryDef(
      "q102_incremental_neardup",
      s"""WITH $duckSig,
         |$DuckBands,
         |cand AS (SELECT DISTINCT a.doc_id AS nd, b.doc_id AS xd
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.bucket = b.bucket
         |         WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0),
         |${duckPairOverlap("cand", "nd", "xd")},
         |j AS (SELECT inter.nd, inter.xd,
         |        i * 1.0 / (s1.sz + s2.sz - i) AS jac
         |      FROM inter JOIN sizes s1 ON nd = s1.doc_id
         |      JOIN sizes s2 ON xd = s2.doc_id),
         |best AS (SELECT nd, xd, jac, row_number() OVER (
         |    PARTITION BY nd ORDER BY jac DESC, xd) AS rn FROM j),
         |aggj AS (SELECT nd, count(*) AS n_cand,
         |    sum(CASE WHEN jac >= 0.8 THEN 1 ELSE 0 END) AS n_dup
         |  FROM j GROUP BY 1),
         |nd AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 0)
         |SELECT nd.doc_id,
         | CAST(coalesce(aggj.n_cand, 0) AS BIGINT) AS n_cand,
         | CAST(coalesce(aggj.n_dup, 0) AS BIGINT) AS n_dup,
         | CAST(coalesce(b.xd, -1) AS BIGINT) AS best_match,
         | round(coalesce(b.jac, 0.0), 3) AS best_jac
         |FROM nd LEFT JOIN aggj ON nd.doc_id = aggj.nd
         |LEFT JOIN (SELECT nd, xd, jac FROM best WHERE rn = 1) b
         |  ON nd.doc_id = b.nd
         |ORDER BY nd.doc_id""".stripMargin) { (spark, dir) =>
      val (_, shl, sig) = lshPipeline(spark, dir, keepShingles = true)
      val bands = withBands(sig)
      // new side is the small side by construction — broadcast it so
      // the index side never shuffles on the bucket
      val cand = broadcast(bands.filter(col("doc_id") % 10 === 0)).as("a")
        .join(bands.filter(col("doc_id") % 10 =!= 0).as("b"),
          col("a.band") === col("b.band") &&
            col("a.bucket") === col("b.bucket"))
        .select(col("a.doc_id").as("nd"), col("b.doc_id").as("xd"))
        .distinct()
      val (inter, sizes) = pairOverlap(cand, shl, "nd", "xd")
      val j = inter
        .join(broadcast(sizes.as("s1")), col("nd") === col("s1.doc_id"))
        .join(broadcast(sizes.as("s2")), col("xd") === col("s2.doc_id"))
        .select(col("nd"), col("xd"),
          (col("i") * lit(1.0) / (col("s1.sz") + col("s2.sz") - col("i")))
            .as("jac"))
        .persist() // feeds the per-doc rollup and the best-match rank
      val w = Window.partitionBy("nd").orderBy(col("jac").desc, col("xd"))
      val best = j.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("nd"), col("xd"), col("jac"))
      val aggj = j.groupBy("nd").agg(count(lit(1)).as("n_cand"),
        sum(when(col("jac") >= 0.8, 1).otherwise(0)).as("n_dup"))
      Tables(spark, dir).documents
        .filter(col("doc_id") % 10 === 0).select("doc_id")
        .join(aggj, col("doc_id") === aggj("nd"), "left")
        .drop("nd")
        .join(best, col("doc_id") === best("nd"), "left")
        .select(col("doc_id"),
          coalesce(col("n_cand"), lit(0L)).as("n_cand"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"),
          coalesce(col("xd"), lit(-1L)).as("best_match"),
          round(coalesce(col("jac"), lit(0.0)), 3).as("best_jac"))
        .orderBy("doc_id")
    },

    // Mix resampling — APPLIES q78's equalizing weights: each
    // (source, lang) group is down-sampled at rate min(weight, 1)
    // by the deterministic q64 hash threshold, so the surviving
    // corpus approaches the uniform token mix q78 prescribes.
    // Thresholds are floor(weight · 2^60) computed with IDENTICAL
    // IEEE operation order both engines (an unfloored double→int
    // cast would round differently in Spark vs DuckDB). Map-only
    // per doc after a broadcast of the tiny per-group weight table —
    // the reweigh-then-resample close of the domain-mixing loop.
    QueryDef(
      "q106_resample_mix",
      """WITH d AS (SELECT doc_id, source, lang,
        |   len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok
        | FROM documents),
        |a AS (SELECT source, lang, count(*) AS n_docs,
        |        CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |      FROM d GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
        |        count(*) AS n_groups FROM a),
        |w AS (SELECT source, lang, n_docs,
        |        (1.0 / n_groups) / (n_tokens * 1.0 / total) AS w
        |      FROM a, t),
        |k AS (SELECT d.source, d.lang, count(*) AS n_kept
        |      FROM d JOIN w ON d.source = w.source AND d.lang = w.lang
        |      WHERE ('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,15))::BIGINT
        |            < CAST(floor(least(w.w, 1.0) * 1152921504606846976.0)
        |                   AS BIGINT)
        |      GROUP BY 1, 2)
        |SELECT w.source, w.lang, CAST(w.n_docs AS BIGINT) AS n_docs,
        | CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
        | round(w.w, 4) AS mix_weight,
        | round(coalesce(k.n_kept, 0) * 1.0 / w.n_docs, 4) AS actual_rate
        |FROM w LEFT JOIN k ON w.source = k.source AND w.lang = k.lang
        |ORDER BY w.source, w.lang""".stripMargin) { (spark, dir) =>
      val d = withToks(Tables(spark, dir).documents,
          col("doc_id"), col("source"), col("lang"))
        .select(col("doc_id"), col("source"), col("lang"),
          size(col("t")).as("n_tok"))
        .persist() // feeds the weight aggregate and the per-doc filter
      val a = d.groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      val t = a.agg(sum("n_tokens").as("total"), count(lit(1)).as("n_groups"))
      val w = a.crossJoin(broadcast(t))
        .select(col("source"), col("lang"), col("n_docs"),
          ((lit(1.0) / col("n_groups"))
            / (col("n_tokens") * lit(1.0) / col("total"))).as("w"))
      val kept = d
        .select(col("source"), col("lang"),
          graft.functions.KmvSketch.md5Hash60(col("doc_id")).as("hv"))
        .join(broadcast(w.select(col("source"), col("lang"), col("w"))),
          Seq("source", "lang"))
        .filter(col("hv") <
          floor(least(col("w"), lit(1.0)) * lit(1.152921504606846976e18))
            .cast("long"))
        .groupBy("source", "lang").agg(count(lit(1)).as("n_kept"))
      w.join(kept, Seq("source", "lang"), "left")
        .select(col("source"), col("lang"), col("n_docs"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          round(col("w"), 4).as("mix_weight"),
          round(coalesce(col("n_kept"), lit(0L)) * lit(1.0)
            / col("n_docs"), 4).as("actual_rate"))
        .orderBy("source", "lang")
    },

    // THE TRAINING-SHARD FUNNEL — the full pipeline a 100 TB lake
    // runs to turn a raw crawl into model inputs, as one per-stage
    // (units, tokens) accounting table: the q89 clean stages
    // (quality → exact dedup → near-dup → decontaminate, ONE shared
    // implementation), then q106's mix resampling over the
    // survivors, q100's 128/96 chunking, and q101's 2048-token
    // packing. Units are docs through stage 5, chunks at stage 6,
    // context bins at stage 7 — the token column is the conserved
    // quantity a capacity plan reads. Every stage is the same kernel
    // its standalone query oracle-checks; this query checks their
    // COMPOSITION end to end against one independent SQL derivation.
    QueryDef(
      "q108_training_shard",
      s"""WITH RECURSIVE $duckCleanStages,
         |tn AS (SELECT t.doc_id, d.source, d.lang, len(t.t) AS n
         |       FROM toks t JOIN documents d ON t.doc_id = d.doc_id),
         |d5 AS (SELECT tn.* FROM tn JOIN s4 USING (doc_id)),
         |a5 AS (SELECT source, lang, CAST(sum(n) AS BIGINT) AS n_tokens
         |       FROM d5 GROUP BY 1, 2),
         |t5 AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
         |         count(*) AS n_groups FROM a5),
         |w5 AS (SELECT source, lang,
         |         (1.0 / n_groups) / (n_tokens * 1.0 / total) AS w
         |       FROM a5, t5),
         |s5 AS (SELECT d5.doc_id FROM d5
         |       JOIN w5 ON d5.source = w5.source AND d5.lang = w5.lang
         |       WHERE ('0x'||substr(md5(CAST(d5.doc_id AS VARCHAR)),1,15))::BIGINT
         |             < CAST(floor(least(w5.w, 1.0) * 1152921504606846976.0)
         |                    AS BIGINT)),
         |c6 AS (SELECT doc_id, unnest(generate_series(0, (n-1)//96)) AS i, n
         |       FROM tn JOIN s5 USING (doc_id)),
         |c6t AS (SELECT least(i*96+128, n) - i*96 AS ck FROM c6),
         |p7 AS (SELECT tn.source, tn.doc_id, tn.n,
         |         coalesce(sum(tn.n) OVER (PARTITION BY tn.source
         |           ORDER BY tn.doc_id ROWS BETWEEN UNBOUNDED PRECEDING
         |           AND 1 PRECEDING), 0) AS start_tok
         |       FROM tn JOIN s5 USING (doc_id)),
         |b7 AS (SELECT source, start_tok // 2048 AS bin,
         |         CAST(sum(n) AS BIGINT) AS bt FROM p7 GROUP BY 1, 2)
         |SELECT stage, CAST(n_units AS BIGINT) AS n_units,
         |  CAST(n_tokens AS BIGINT) AS n_tokens
         |FROM (
         |  SELECT '0_raw' AS stage, count(*) AS n_units,
         |    sum(n) AS n_tokens FROM tn
         |  UNION ALL SELECT '1_quality', count(*), sum(n)
         |    FROM tn JOIN s1 USING (doc_id)
         |  UNION ALL SELECT '2_exact_dedup', count(*), sum(n)
         |    FROM tn JOIN s2 USING (doc_id)
         |  UNION ALL SELECT '3_near_dup', count(*), sum(n)
         |    FROM tn JOIN s3 USING (doc_id)
         |  UNION ALL SELECT '4_decontaminate', count(*), sum(n)
         |    FROM tn JOIN s4 USING (doc_id)
         |  UNION ALL SELECT '5_resample', count(*), sum(n)
         |    FROM tn JOIN s5 USING (doc_id)
         |  UNION ALL SELECT '6_chunk', count(*), sum(ck) FROM c6t
         |  UNION ALL SELECT '7_pack', count(*), sum(bt) FROM b7)
         |ORDER BY stage""".stripMargin) { (spark, dir) =>
      val (s1, s2, s3, s4) = cleanStages(spark, dir)
      val tn = withToks(Tables(spark, dir).documents,
          col("doc_id"), col("source"), col("lang"))
        .select(col("doc_id"), col("source"), col("lang"),
          size(col("t")).as("n"))
        .persist() // every stage's accounting reads this frame
      // stage 5: q106's equalizing resample, weights learned on the
      // stage-4 survivors (the set actually being shipped)
      val d5 = tn.join(s4, Seq("doc_id"), "left_semi").persist()
      val a5 = d5.groupBy("source", "lang").agg(sum("n").as("n_tokens"))
      val t5 = a5.agg(sum("n_tokens").as("total"),
        count(lit(1)).as("n_groups"))
      val w5 = a5.crossJoin(broadcast(t5))
        .select(col("source"), col("lang"),
          ((lit(1.0) / col("n_groups"))
            / (col("n_tokens") * lit(1.0) / col("total"))).as("w"))
      val s5 = d5.join(broadcast(w5), Seq("source", "lang"))
        .filter(graft.functions.KmvSketch.md5Hash60(col("doc_id")) <
          floor(least(col("w"), lit(1.0)) * lit(1.152921504606846976e18))
            .cast("long"))
        .select("doc_id").persist()
      // stage 6: q100's sliding windows over the shipped set
      val c6 = tn.join(s5, Seq("doc_id"), "left_semi")
        .select(col("n"), explode(sequence(lit(0),
          ((col("n") - 1) / 96).cast("int"))).as("i"))
        .select((least(col("i") * 96 + 128, col("n"))
          - col("i") * 96).as("ck"))
      val st6 = c6.agg(count(lit(1)).as("n_units"), sum("ck").as("n_tokens"))
        .select(lit("6_chunk").as("stage"), col("n_units"), col("n_tokens"))
      // stage 7: q101's concatenate-then-cut bins per source, through
      // the same ops.Packing kernel the standalone query runs
      val st7 = graft.ops.Packing.packBins(
          tn.join(s5, Seq("doc_id"), "left_semi")
            .select(col("source"), col("doc_id"), col("n").as("n_tok")),
          2048)
        .groupBy("source", "bin").agg(sum("n_tok").as("bt"))
        .agg(count(lit(1)).as("n_units"), sum("bt").as("n_tokens"))
        .select(lit("7_pack").as("stage"), col("n_units"), col("n_tokens"))
      // Stages 0-5 in ONE pass over tn: the survivor sets are tiny
      // (≤ corpus doc ids) and unique per doc_id, so five broadcast
      // LEFT joins attach stage-membership flags without changing
      // cardinality, and one aggregate produces every doc-stage's
      // (count, token sum) — the per-stage semi-join+agg formulation
      // ran 6 sequential AQE-materialized aggregates over the same
      // persisted frame (guide §2: job count is the scale killer for
      // driver-serialized chains). Conditional count/sum over longs
      // is order-insensitive, so the numbers are bit-identical.
      val stageSets = Seq(s1, s2, s3, s4, s5)
      val flagged = stageSets.zipWithIndex.foldLeft(tn) {
        case (acc, (ids, i)) =>
          acc.join(broadcast(ids.withColumn(s"in${i + 1}", lit(true))),
            Seq("doc_id"), "left")
      }
      val names = Seq("0_raw", "1_quality", "2_exact_dedup",
        "3_near_dup", "4_decontaminate", "5_resample")
      val one = flagged.agg(
        count(lit(1)).as("u0"), sum("n").as("t0"),
        (1 to 5).flatMap(i => Seq(
          count(when(col(s"in$i"), 1)).as(s"u$i"),
          sum(when(col(s"in$i"), col("n"))).as(s"t$i"))): _*)
      val st05 = one.select(explode(array(
          names.zipWithIndex.map { case (nm, i) =>
            struct(lit(nm).as("stage"), col(s"u$i").as("n_units"),
              col(s"t$i").as("n_tokens"))
          }: _*)).as("r"))
        .select(col("r.stage"), col("r.n_units"), col("r.n_tokens"))
      st05
        .unionByName(st6)
        .unionByName(st7)
        .orderBy("stage")
    },

    // BPE TRAINING — the distributed tokenizer-trainer counterpart
    // of q61 (which APPLIES a pretokenizer): classic byte-pair-
    // encoding over the corpus vocabulary — count adjacent-symbol
    // pairs weighted by word frequency, merge the most frequent pair
    // (lexicographic tie-break), repeat. Three unrolled merge steps
    // here; the merge table is the model. Shape at scale: each step
    // is one shuffle ∝ DISTINCT pairs over the VOCABULARY (never the
    // corpus — word frequencies are aggregated once up front), and
    // the per-step driver pull is exactly ONE row (the argmax pair),
    // the same bounded pattern as DupClusters' convergence check.
    // Greedy left-to-right replace is identical in Spark and DuckDB
    // (non-overlapping leftmost), symbols are space-delimited with
    // padding so a merge can never match inside another symbol, and
    // each merge applies TWO replace passes so adjacency chains
    // ('x y x y …', where one pass loses every second occurrence to
    // the shared delimiter) merge exactly like symbol-level BPE.
    QueryDef(
      "q107_bpe_train", {
        s"""WITH $DuckBpeTrain
           |SELECT step, pair, replace(pair, ' ', '') AS merged,
           |  CAST(c AS BIGINT) AS c
           |FROM (SELECT 1 AS step, pair, c FROM t1
           |      UNION ALL SELECT 2, pair, c FROM t2
           |      UNION ALL SELECT 3, pair, c FROM t3)
           |ORDER BY step""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      // vocabulary with frequencies — the ONLY corpus-sized pass
      bpeMerges(bpeVocab(spark, dir).select("s", "freq"), 3)
        .toDF("step", "pair", "merged", "c")
        .orderBy("step")
    },

    // BPE APPLY — the missing third leg of the tokenizer story (q61
    // pretokenizes, q107 trains, this tokenizes): apply the trained
    // merge table to the corpus and report per-doc symbol counts.
    // Shape at scale: the merges apply to the DISTINCT-WORD
    // vocabulary (the q107 cost argument — never the corpus), the
    // per-word symbol counts then broadcast back onto one corpus
    // pass. The oracle re-derives the merge table through the SAME
    // training CTEs as q107 and applies it with the same two-pass
    // greedy replace, so training and application are checked as one
    // composition.
    QueryDef(
      "q112_bpe_apply", {
        // scalar-subquery + chr(1) sentinel like the training CTEs:
        // an exhausted merge table must no-op, not empty the chain
        def apply(src: String, t: String, out: String): String =
          s"""$out AS (SELECT word, replace(replace(s,
             |    ' ' || tp || ' ', ' ' || replace(tp, ' ', '') || ' '),
             |    ' ' || tp || ' ', ' ' || replace(tp, ' ', '') || ' ') AS s
             |  FROM (SELECT word, s,
             |          coalesce((SELECT pair FROM $t), chr(1)) AS tp
             |        FROM $src))""".stripMargin
        s"""WITH $DuckBpeTrain,
           |v0 AS (SELECT word, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g')
           |         AS s FROM words),
           |${apply("v0", "t1", "a1")},
           |${apply("a1", "t2", "a2")},
           |${apply("a2", "t3", "a3")},
           |nsym AS (SELECT word, len(string_split(trim(s), ' ')) AS ns
           |         FROM a3),
           |tw AS (SELECT doc_id, w FROM (
           |    SELECT doc_id, unnest(string_split_regex(lower(trim(text)),
           |      '\\s+')) AS w FROM documents)
           |  WHERE regexp_matches(w, '^[a-z]{2,12}$$'))
           |SELECT tw.doc_id, CAST(count(*) AS BIGINT) AS n_words,
           | CAST(sum(ns) AS BIGINT) AS n_syms,
           | round(sum(ns) * 1.0 / count(*), 4) AS syms_per_word
           |FROM tw JOIN nsym ON tw.w = nsym.word
           |GROUP BY 1 ORDER BY tw.doc_id""".stripMargin
      }) { (spark, dir) =>
      val vocab = bpeVocab(spark, dir).persist() // trains AND applies
      val merges = bpeMerges(vocab.select(col("s"), col("freq")), 3)
      // apply each merge to the distinct-word vocabulary with the
      // SAME two-pass greedy replace the trainer used
      var cur = vocab.select(col("word"), col("s"))
      merges.foreach { case (_, pair, merged, _) =>
        def sub(c: Column): Column = regexp_replace(c,
          java.util.regex.Pattern.quote(s" $pair "),
          java.util.regex.Matcher.quoteReplacement(s" $merged "))
        cur = cur.withColumn("s", sub(sub(col("s"))))
      }
      val nsym = cur.select(col("word"),
        size(split(trim(col("s")), " ")).as("ns"))
      withToks(Tables(spark, dir).documents, col("doc_id"))
        .select(col("doc_id"), explode(col("t")).as("w"))
        .filter(col("w").rlike("^[a-z]{2,12}$"))
        // guarded: a production vocabulary can outgrow a broadcast —
        // past the cap this becomes a shuffled join on the word
        .join(graft.ops.Probes.broadcastIfSmall(nsym),
          col("w") === col("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum("ns").as("n_syms"))
        .select(col("doc_id"), col("n_words"), col("n_syms"),
          round(col("n_syms") * lit(1.0) / col("n_words"), 4)
            .as("syms_per_word"))
        .orderBy("doc_id")
    },

    // LSH index health — the audit that SIZES the near-dup pipeline:
    // per band, the bucket-count distribution and the exact candidate
    // -pair workload Σ c·(c-1)/2 it implies. A skewed bucket (shared
    // boilerplate hashing everything together) shows up here as
    // max_bucket and a quadratic cand_pairs BEFORE the pair-gen runs
    // — this is the q98-style pre-pass for the q38 join. Null buckets
    // (docs below shingle length) never pair and are excluded. Shape
    // at scale: two narrow aggregates, shuffle ∝ buckets.
    QueryDef(
      "q103_lsh_index_stats",
      s"""WITH $duckSig,
         |$DuckBands,
         |bs AS (SELECT band, bucket, count(*) AS c FROM bands
         |       WHERE bucket IS NOT NULL GROUP BY 1, 2)
         |SELECT band, CAST(count(*) AS BIGINT) AS n_buckets,
         | CAST(sum(c) AS BIGINT) AS n_docs,
         | CAST(max(c) AS BIGINT) AS max_bucket,
         | round(avg(c), 4) AS mean_bucket,
         | CAST(sum((c*(c-1))//2) AS BIGINT) AS cand_pairs
         |FROM bs GROUP BY 1 ORDER BY band""".stripMargin) { (spark, dir) =>
      val (_, _, sig) = lshPipeline(spark, dir)
      val bs = withBands(sig).filter(col("bucket").isNotNull)
        .groupBy("band", "bucket").agg(count(lit(1)).as("c"))
      bs.groupBy("band").agg(
          count(lit(1)).as("n_buckets"),
          sum("c").as("n_docs"),
          max("c").as("max_bucket"),
          round(avg("c"), 4).as("mean_bucket"),
          // `div` (integral divide), not `/`: Column `/` is double
          // division, and past c ≈ 9.5e7 (exactly the boilerplate-
          // bucket regime this audit exists to catch) c·(c-1) exceeds
          // 2^53 and the double round-trip drifts from the oracle's
          // exact integer //
          sum(expr("c * (c - 1) div 2")).as("cand_pairs"))
        .orderBy("band")
    },

    // The MAINTAINED near-dup index (ops.NeardupIndex): build from the
    // base corpus, apply a deterministic CDC-shaped delta (updates =
    // doc_id % 17 = 3 with doubled text, deletes = doc_id % 23 = 5
    // excluding the updated set), compact, and report the q103 stats
    // from the maintained band table. The ORACLE recomputes the same
    // stats from scratch over the post-delta corpus — hash equality IS
    // the incremental-maintenance-equals-recompute contract, which is
    // what makes the index usable at 100 TB (deltas append; nothing
    // re-bands the corpus).
    QueryDef.statefulQ(
      "q113_neardup_index_maintain",
      s"""WITH documents2 AS (
         |  SELECT doc_id, text || ' ' || text AS text FROM documents
         |  WHERE doc_id % 17 = 3
         |  UNION ALL
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id % 17 <> 3 AND doc_id % 23 <> 5),
         |${duckSigFrom("documents2")},
         |$DuckBands,
         |bs AS (SELECT band, bucket, count(*) AS c FROM bands
         |       WHERE bucket IS NOT NULL GROUP BY 1, 2)
         |SELECT band, CAST(count(*) AS BIGINT) AS n_buckets,
         | CAST(sum(c) AS BIGINT) AS n_docs,
         | CAST(max(c) AS BIGINT) AS max_bucket,
         | round(avg(c), 4) AS mean_bucket,
         | CAST(sum((c*(c-1))//2) AS BIGINT) AS cand_pairs
         |FROM bs GROUP BY 1 ORDER BY band""".stripMargin) { (spark, dir) =>
      val docs = Tables(spark, dir).documents.select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
      val idxDir = QueryDef.tempWorkDir("graft-ndx-q113-")
      graft.ops.NeardupIndex.build(spark, docs, idxDir)
      val upserts = docs.filter(col("doc_id") % 17 === 3)
        .withColumn("text", concat(col("text"), lit(" "), col("text")))
      val deletes = docs
        .filter(col("doc_id") % 23 === 5 && col("doc_id") % 17 =!= 3)
        .select("doc_id")
      graft.ops.NeardupIndex.applyDelta(spark, idxDir, upserts, deletes)
      graft.ops.NeardupIndex.compact(spark, idxDir) // fold on the way out
      val bs = graft.ops.NeardupIndex.live(spark, idxDir)
        .filter(col("bucket").isNotNull)
        .groupBy("band", "bucket").agg(count(lit(1)).as("c"))
      bs.groupBy("band").agg(
          count(lit(1)).as("n_buckets"),
          sum("c").as("n_docs"),
          max("c").as("max_bucket"),
          round(avg("c"), 4).as("mean_bucket"),
          sum(expr("c * (c - 1) div 2")).as("cand_pairs"))
        .orderBy("band")
    },

    // The WHEN-to-compact advisory (ops.IndexCompaction through
    // Graft.textIndexCompactHealth) oracle-gated end to end: build the
    // inverted index over a deterministic HALF-SLICE of the corpus
    // (doc_id % 4 <= 1, oracle CTE filtered identically — the gate's
    // arithmetic is corpus-size-independent, and the full corpus made
    // this lifecycle the suite's most expensive bench entry purely on
    // small-file job overhead), rewrite EVERY doc ONCE
    // (doubled text keeps each doc's DISTINCT term set, so the posting
    // arithmetic is exact in SQL: raw = 2P, live = P, tombstones =
    // one row per doc — one wave, not r18's two: the lifecycle is
    // job-count-bound), report the measured backlog stats and the
    // fired verdict, act on the advised in-place compact, and report
    // the folded stats + the re-measured silence. The ORACLE computes
    // every number from the documents table with the q111 tokenizer —
    // a drift in the kill-rule live count, the reclaimable arithmetic,
    // or the 2x threshold breaks the hash.
    QueryDef.statefulQ(
      "q132_index_compact_advice",
      """WITH d AS (SELECT doc_id,
        |   len(list_distinct(string_split_regex(lower(trim(text)),
        |     '\s+'))) AS dt
        | FROM documents WHERE doc_id % 4 <= 1),
        |p AS (SELECT CAST(count(*) AS BIGINT) AS docs,
        |        CAST(COALESCE(sum(dt), 0) AS BIGINT) AS nr FROM d)
        |SELECT 2 * p.nr AS raw_rows, p.nr AS live_rows,
        | p.docs AS tombstone_rows,
        | CASE WHEN p.nr + p.docs > 0
        |   THEN p.nr + p.docs ELSE CAST(0 AS BIGINT)
        |   END AS reclaimable,
        | CAST(CASE WHEN p.nr + p.docs > 0
        |   THEN 1 ELSE 0 END AS INTEGER) AS advised,
        | p.nr AS post_raw_rows, CAST(0 AS BIGINT) AS post_tombstones,
        | CAST(0 AS INTEGER) AS post_advised
        |FROM p""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val docs = Tables(spark, dir).documents.select("doc_id", "text")
        .filter(col("doc_id") % 4 <= 1)
        .repartition(spark.sparkContext.defaultParallelism)
      val idxDir = QueryDef.tempWorkDir("graft-ti-q132-")
      // small explicit fanout: the advisory's posting arithmetic is
      // fanout-independent (the oracle gates row counts, not layout),
      // and the default 64 buckets would make this lifecycle's three
      // generations of writes mostly small-file overhead at test scale
      graft.ops.TextIndex.build(spark, docs, idxDir, termBuckets = 8)
      // ONE update wave over the whole slice (r19 ran two waves over
      // its even half — the q132 job-count finding: this lifecycle is
      // JOB-bound, so the gate is driven to the same >=2x verdict with
      // half the delta jobs): every doc rewritten once with doubled
      // text (distinct term set preserved, so the posting arithmetic
      // stays exact in SQL) makes raw = 2P, tombstones = docs,
      // backlog = P + docs >= live P — fires robustly, no threshold
      // equality to tiptoe around
      val upserts = docs
        .withColumn("text", concat(col("text"), lit(" "), col("text")))
      val noDeletes = docs.limit(0).select("doc_id")
      graft.ops.TextIndex.applyDelta(spark, idxDir, upserts, noDeletes)
      // the MEASURED verdict, not a recomputation of its formula —
      // the oracle hash gates the measurement itself
      val h = graft.api.Graft.textIndexCompactHealth(spark, idxDir)
      val st = h.map(_.stats).getOrElse(
        graft.ops.TextIndex.compactStats(spark, idxDir))
      // act exactly as the health check spells it (in place); the
      // folded stats ride the compact's own rewrite (observe metric) —
      // a separate compactStats here would re-scan the postings twice
      // for numbers that are (live, live, 0) by construction
      val post = graft.ops.TextIndex.compact(spark, idxDir)
      // the silence verdict is the PURE decision over the stats just
      // measured — re-running the one-call health here would only
      // re-scan the index for numbers `post` already holds
      val postAdvised =
        graft.ops.IndexCompaction.compactAdvice(post).isDefined
      Seq((st.rawRows, st.liveRows, st.tombstoneRows,
          h.map(_.recommended).getOrElse(0L),
          if (h.isDefined) 1 else 0,
          post.rawRows, post.tombstoneRows,
          if (postAdvised) 1 else 0))
        .toDF("raw_rows", "live_rows", "tombstone_rows", "reclaimable",
          "advised", "post_raw_rows", "post_tombstones", "post_advised")
    },

    // The PIPELINE-maintained inverted index (`sink.index.text`):
    // a quarter of the corpus serialized as a Debezium-shaped envelope feed
    // carrying CREATE rows plus DELETE rows for every 17th doc AT
    // LATER OFFSETS IN THE SAME BATCH, replayed through the REAL
    // streaming pipeline — which demuxes, writes the sink table,
    // derives the batch's keep-latest change set, and feeds the
    // `__textindex` sibling, no external glue job — then the q121
    // search served from the pipeline-built index. The ORACLE scores
    // the surviving corpus from the source table — hash equality
    // gates the whole integration: envelope decode, within-batch
    // keep-latest (the CREATE must lose to its same-batch DELETE),
    // the attach-then-delta protocol, and the tombstone-folded search.
    QueryDef.statefulQ(
      "q135_pipeline_indexed_bm25", {
        val terms = Seq("spark", "shuffle", "window", "stream")
        val fs = terms.indices.map(i =>
          s"len(list_filter(t, x -> x = '${terms(i)}')) AS f$i")
          .mkString(", ")
        val dfs = terms.indices.map(i =>
          s"sum(CASE WHEN f$i > 0 THEN 1 ELSE 0 END) AS df$i")
          .mkString(", ")
        val score = terms.indices.map(i =>
          s"((s.n - s.df$i + 0.5) / (s.df$i + 0.5))" +
            s" * ((f$i * 2.2) / (f$i + 1.2 * (0.25 + 0.75 * dl / (s.sdl * 1.0 / s.n))))")
          .mkString("\n        | + ")
        s"""WITH d AS (SELECT doc_id,
           |   string_split_regex(lower(trim(text)), '\\s+') AS t
           | FROM documents WHERE doc_id % 4 = 0 AND doc_id % 17 <> 0),
           |f AS (SELECT doc_id, len(t) AS dl, $fs FROM d),
           |s AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sdl,
           |        $dfs FROM f)
           |SELECT doc_id, round($score, 6) AS bm25
           |FROM f, s WHERE f0 + f1 + f2 + f3 > 0
           |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin
      }) { (spark, dir) =>
      val work = QueryDef.tempWorkDir("graft-pix-q135-")
      val docs = Tables(spark, dir).documents
        .filter(col("doc_id") % 4 === 0).select("doc_id", "text")
      // Debezium-shaped envelope lines via to_json (the text column
      // needs real JSON escaping); the DELETE rows ride the SAME
      // batch at later source offsets, so the pipeline's within-batch
      // keep-latest is on the hash path
      def env(op: String, posOff: Int, tsOff: Long): Column = to_json(
        struct(lit(op).as("_op"), lit(1700000000000L + tsOff).as("_ts"),
          lit("bench").as("_db"), lit("documents").as("_tbl"),
          struct(col("doc_id").cast("long").as("long")).as("doc_id"),
          struct(col("text").as("string")).as("text"),
          lit("b.000001").as("_binlog_file"),
          (col("doc_id") * 2 + posOff).cast("string")
            .as("_binlog_pos_end"),
          lit("b.000001").as("_binlog_file_internal"),
          (col("doc_id") * 2 + posOff).cast("string")
            .as("_binlog_pos_internal")))
      // several feed files still land in ONE micro-batch (AvailableNow
      // with no per-trigger file cap) — the write stays parallel
      docs.select(env("CREATE", 0, 0L).as("value"))
        .union(docs.filter(col("doc_id") % 17 === 0)
          .select(env("DELETE", 1, 1000L).as("value")))
        .coalesce(8).write.mode("overwrite").text(s"$work/feed")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType)))
      val p = new graft.streaming.CdcPipeline(spark,
        graft.streaming.CdcConfig("q135",
          graft.model.TableRegistry(Seq(
            graft.model.TableSpec("bench", "documents", schema))),
          s"$work/sink",
          currentKeys = Map("bench.documents" -> Seq("doc_id")),
          currentBuckets = 4, // quarter-slice corpus; 16 would be files
          indexText = Map("bench.documents" -> "text"),
          // the q132 fanout rationale: scores are fanout-independent,
          // and 64 buckets would be small-file overhead at test scale
          indexTextBuckets = 8))
      p.runAvailableNow(s"$work/feed", s"$work/ck",
        oneFilePerBatch = false)
      graft.ops.TextIndex.search(spark,
          s"$work/sink/q135_bench__documents__textindex",
          Seq("spark", "shuffle", "window", "stream"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(10)
    },
  )
}
