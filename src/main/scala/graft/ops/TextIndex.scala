package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Durable, incrementally-maintained INVERTED TEXT INDEX — the third
  * member of the maintained-index family ([[NeardupIndex]] bands,
  * [[AnnIndex]] postings): BM25 retrieval over a 100 TB corpus
  * without scanning the corpus per query. `Graft.bm25` tokenizes and
  * scores the whole corpus each call — right for one-off audits,
  * wrong as a serving path; here the corpus is tokenized ONCE into a
  * term-bucketed postings table, and a query reads only its terms'
  * buckets.
  *
  * Layout under `dir`:
  *   - `postings/` — (term, doc_id, tf, dl, gen) parquet, partitioned
  *     by `tb = pmod(xxhash64(term), TermBuckets)`: a term lookup
  *     partition-prunes to one bucket dir. `dl` (doc token length)
  *     rides denormalized so scoring never joins the corpus.
  *   - `docs/` — (doc_id, dl, gen): the corpus census behind the BM25
  *     stats row (N, Σdl).
  *   - `tombstones/` — (doc_id, gen): kills postings/docs rows of
  *     that doc with a STRICTLY OLDER generation.
  *
  * The delta protocol, kill rule, crash-retry convergence argument,
  * and compaction swap discipline are [[NeardupIndex]]'s verbatim —
  * one generation per delta, tombstones first, strictly-older kills,
  * tmp/trash/rename fold. Tokenization and the scoring formula are
  * the ONE shared implementation the oracle-checked q111 uses
  * (whitespace tokens; rational Robertson IDF, Okapi tf saturation),
  * so index-served scores cannot drift from the audited kernel —
  * TextIndexSpec asserts search ≡ `Graft.bm25` to the kernel's own
  * 6-decimal rounding, including after update/delete deltas.
  *
  * Scale shape: building is one explode + (doc, term) partial-agg
  * (shuffle ∝ distinct doc-term pairs); a query touches ≤ |terms|
  * postings buckets + one stats aggregate over the docs census;
  * tombstones stay ∝ changes since the last compaction and broadcast
  * at read.
  */
object TextIndex {

  /** Postings bucket count — the partition-pruning fanout. Fixed per
    * index lifetime (the bucket of a term must never move between
    * write and read); changing it requires a rebuild.
    */
  val TermBuckets = 64

  private def postingsDir(dir: String) = s"$dir/postings"
  private def docsDir(dir: String) = s"$dir/docs"
  private def tombsDir(dir: String) = s"$dir/tombstones"

  private val TombSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("gen", LongType)))

  private def bucketOf(term: org.apache.spark.sql.Column) =
    pmod(xxhash64(term), lit(TermBuckets.toLong))

  /** (term, doc_id, tf, dl, tb, gen) for `docs` (doc_id, text) —
    * the q111 tokenizer, exploded and counted. Zero-token docs keep a
    * census row but no postings (they can never match a term).
    */
  private def posted(docs: DataFrame, gen: Long): DataFrame =
    graft.queries.TextQueries.tokenized(docs)
      .select(col("doc_id").cast("long").as("doc_id"),
        size(col("t")).as("dl"), explode(col("t")).as("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).cast("int").as("tf"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"),
        bucketOf(col("term")).as("tb"), lit(gen).as("gen"))

  private def census(docs: DataFrame, gen: Long): DataFrame =
    graft.queries.TextQueries.tokenized(docs)
      .select(col("doc_id").cast("long").as("doc_id"),
        size(col("t")).as("dl"), lit(gen).as("gen"))

  private def writeEmptyTombstones(spark: SparkSession, dir: String): Unit =
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], TombSchema)
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(tombsDir(dir))

  /** Cut the index fresh from `docs` (doc_id, text) at generation 0,
    * replacing whatever was at `dir`.
    */
  def build(spark: SparkSession, docs: DataFrame, dir: String): Unit = {
    posted(docs, 0L)
      .write.mode(SaveMode.Overwrite).partitionBy("tb")
      .parquet(postingsDir(dir))
    census(docs, 0L)
      .write.mode(SaveMode.Overwrite).parquet(docsDir(dir))
    writeEmptyTombstones(spark, dir)
  }

  /** Highest generation recorded anywhere — footer-statistics reads. */
  def currentGen(spark: SparkSession, dir: String): Long = {
    def maxGen(path: String): Long =
      spark.read.parquet(path).agg(max("gen")).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    Seq(postingsDir(dir), docsDir(dir), tombsDir(dir)).map(maxGen).max
  }

  /** Apply one delta: `upserts` (doc_id, text) and `deletes`
    * (doc_id); appends only, returns the landed generation.
    * Tombstone-first like [[NeardupIndex.applyDelta]] — a torn delta
    * under-counts until the retry, never double-counts.
    */
  def applyDelta(spark: SparkSession, dir: String,
      upserts: DataFrame, deletes: DataFrame): Long = {
    val gen = currentGen(spark, dir) + 1
    upserts.select(col("doc_id").cast("long"))
      .union(deletes.select(col("doc_id").cast("long")))
      .distinct()
      .withColumn("gen", lit(gen))
      .write.mode(SaveMode.Append).parquet(tombsDir(dir))
    posted(upserts, gen)
      .write.mode(SaveMode.Append).partitionBy("tb")
      .parquet(postingsDir(dir))
    census(upserts, gen)
      .write.mode(SaveMode.Append).parquet(docsDir(dir))
    gen
  }

  private def tombs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(tombsDir(dir))
      .groupBy("doc_id").agg(max("gen").as("tgen"))

  private def liveRows(spark: SparkSession, dir: String,
      path: String): DataFrame =
    spark.read.parquet(path).as("r")
      .join(Probes.broadcastIfSmall(tombs(spark, dir)).as("t"),
        col("r.doc_id") === col("t.doc_id") && col("t.tgen") > col("r.gen"),
        "left_anti")

  /** BM25 scores of the live corpus for `terms` — `(doc_id, bm25)`
    * for docs matching ≥1 term, identical to `Graft.bm25` over the
    * same corpus (same tokens, same rational-IDF/Okapi formula, same
    * 6-decimal rounding; per-term partials fold in fixed term order
    * so even the float summation order matches). Reads ≤ |terms|
    * postings buckets + the docs census; the corpus text is never
    * touched.
    */
  def search(spark: SparkSession, dir: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "search needs at least one query term")
    require(terms.distinct.size == terms.size,
      s"duplicate query terms: ${terms.mkString(", ")}")
    // the terms' bucket values, via the SAME expression the write
    // side bucketed with (one tiny local job — a driver-side hash
    // reimplementation could silently drift from xxhash64)
    import spark.implicits._
    val tbs = terms.toDF("term").select(bucketOf(col("term")).as("tb"))
      .distinct().as[Long].collect()
    // ONE tombstone fold per query (broadcastIfSmall probes its input
    // eagerly — building it per live-side would re-run that probe),
    // shared by the census aggregate and the postings read
    val tomb = Probes.broadcastIfSmall(tombs(spark, dir))
    def live(path: String): DataFrame =
      spark.read.parquet(path).as("r")
        .join(tomb.as("t"),
          col("r.doc_id") === col("t.doc_id") &&
            col("t.tgen") > col("r.gen"),
          "left_anti")
    // corpus stats from the live census: one aggregate row, broadcast
    val stats = live(docsDir(dir))
      .agg(count(lit(1)).as("n"), sum("dl").as("sdl"))
    // live postings of just these terms: partition-pruned to the
    // terms' buckets, then term-filtered inside them
    val termIdx = terms.zipWithIndex.toDF("term", "i")
    val fetched = live(postingsDir(dir))
      .filter(col("tb").isin(tbs: _*) && col("term").isin(terms: _*))
      .join(broadcast(termIdx), "term")
    // per-term document frequency over the fetched postings (each
    // (doc, term) appears once, so a count IS the df). `fetched`
    // feeds this aggregate AND the scoring join, so the pruned-bucket
    // scan runs twice — deliberately unpersisted (the facade returns
    // a lazy frame; a cache here would leak past the call), and the
    // re-read is bounded by the terms' buckets, not the index
    val dfs = fetched.groupBy("i").agg(count(lit(1)).as("df"))
    val partial =
      ((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        ((col("tf") * lit(k1 + 1)) / (col("tf") + lit(k1) *
          (lit(1 - b) + lit(b) * col("dl")
            / (col("sdl") * lit(1.0) / col("n")))))
    fetched
      .join(broadcast(dfs), "i")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("i"), partial.as("p"))
      // fixed-order fold: absent terms contribute exact 0.0 in the
      // kernel, so left-folding the PRESENT partials in term order
      // reproduces its float sum bit-for-bit
      .groupBy("doc_id")
      .agg(aggregate(sort_array(collect_list(struct(col("i"), col("p")))),
        lit(0.0), (acc, x) => acc + x("p")).as("score"))
      .select(col("doc_id"), round(col("score"), 6).as("bm25"))
  }

  /** Fold tombstones away: rewrite the live postings and census with
    * the swap discipline (gens preserved — [[NeardupIndex.compact]]'s
    * crash-window argument), then clear tombstones.
    */
  def compact(spark: SparkSession, dir: String): Unit = {
    // heal any interrupted previous swap BEFORE building the rewrite
    // frames: liveRows eagerly resolves the target dir's schema, so a
    // restore that only ran inside swapIn (after the frame is built)
    // would never be reached — the crash window between the two
    // renames would leave the index permanently unreadable
    // (NeardupIndex.compact restores first for the same reason)
    val hfs = new Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    for (p <- Seq(postingsDir(dir), docsDir(dir))) {
      val (t, tr) = (new Path(p), new Path(p + "._compact_trash"))
      if (!hfs.exists(t) && hfs.exists(tr)) hfs.rename(tr, t)
    }
    def swapIn(path: String, partitionBy: Option[String])(
        rows: DataFrame): Unit = {
      val target = new Path(path)
      val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
      val tmp = new Path(path + "._compact_tmp")
      val trash = new Path(path + "._compact_trash")
      fs.delete(tmp, true); fs.delete(trash, true)
      val w = rows.write.mode(SaveMode.Overwrite)
      partitionBy.fold(w)(c => w.partitionBy(c)).parquet(tmp.toString)
      if (!fs.rename(target, trash))
        throw new IllegalStateException(s"index compact swap failed: $target")
      if (!fs.rename(tmp, target)) {
        fs.rename(trash, target)
        throw new IllegalStateException(s"index compact swap failed: $target")
      }
      fs.delete(trash, true)
    }
    swapIn(postingsDir(dir), Some("tb"))(
      liveRows(spark, dir, postingsDir(dir)))
    swapIn(docsDir(dir), None)(liveRows(spark, dir, docsDir(dir)))
    writeEmptyTombstones(spark, dir)
  }
}
