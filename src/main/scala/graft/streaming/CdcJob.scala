package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.model.{TableRegistry, TableSpec}
import graft.schema.TypeMapping

/** Job assembly (§3.1): config JSON → registry → pipeline → query.
  * Mirrors `FlinkCDCMulti.main`'s sequence — load config, resolve
  * startup, build the table registry, bootstrap the stored offset,
  * start the stream — as a library function plus a thin CLI main.
  *
  * Schema discovery: the reference walks JDBC metadata at job start
  * (`MySQLStreamer.java:313-457`). The file-feed harness declares the
  * same information in config (`table.schemas`: "db.tbl" →
  * "col:TYPE,col:TYPE", run through the §1.3 type collapse); a live
  * JDBC walk plugs in behind the same TableRegistry via
  * graft.schema.JdbcRegistry (DatabaseMetaData → registry — only the
  * connection itself is environment-dependent).
  */
object CdcJob {

  /** Raw config `db.table` (or bare `table`) spelling -> the sanitized
    * ROUTE key the demux looks tables up by — the ONE sanitize-split
    * rule every per-table config surface re-keys through.
    */
  private def routeKeyOf(k: String): String = k.split("\\.", 2) match {
    case Array(d, t) =>
      s"${graft.schema.Sanitizer(d)}.${graft.schema.Sanitizer(t)}"
    case Array(t) => graft.schema.Sanitizer(t)
  }

  def registryFromConfig(cfg: Map[String, String]): TableRegistry = {
    val oracle = cfg.get("source.type").contains("oracle")
    val schemas = JobConfig.nameMap(cfg, "table.schemas")
    require(schemas.nonEmpty, "MISSING REQUIRED CONFIG: table.schemas")
    val tables = schemas.toSeq.sortBy(_._1).map { case (key, colSpec) =>
      val (db, tbl) = key.split("\\.", 2) match {
        case Array(d, t) => (d, t)
        case Array(t) => ("", t)
      }
      // split on commas OUTSIDE parentheses: parenthesized JDBC types
      // (DECIMAL(10,2), TIMESTAMP(6)) are the norm, not the exception
      val cols = TypeMapping.splitTopLevel(colSpec).map { c =>
        c.trim.split(":", 2) match {
          case Array(n, t) => (n.trim, t.trim)
          case _ => throw new IllegalArgumentException(
            s"MALFORMED COLUMN SPEC (want name:TYPE): '$c' in '$colSpec'")
        }
      }
      TableSpec(db, tbl, TypeMapping.schemaFromJdbc(cols, oracle))
    }
    // `collection.name.map` is the Mongo spelling of the rename map
    // (`MongoDBStreamer.java:65` reads renames from it) — a reference
    // config ported verbatim must not have its collection renames
    // silently ignored. Mongo only: for any other source type the key
    // is a config error and fails fast, like the rest of the surface.
    // Both spellings may coexist for mongo (graft's own configs use
    // table.name.map); a key in BOTH with different targets is a
    // contradiction, not a precedence question.
    val tableNames = JobConfig.nameMap(cfg, "table.name.map")
    val collectionNames = JobConfig.nameMap(cfg, "collection.name.map")
    if (collectionNames.nonEmpty &&
        !cfg.get("source.type").contains("mongodb"))
      throw new IllegalArgumentException(
        "collection.name.map IS MONGODB-ONLY (source.type=" +
          s"${cfg.getOrElse("source.type", "<unset>")}): use " +
          "table.name.map for relational sources")
    val conflicts = tableNames.keySet.intersect(collectionNames.keySet)
      .filter(k => tableNames(k) != collectionNames(k))
    if (conflicts.nonEmpty)
      throw new IllegalArgumentException(
        "CONFLICTING RENAMES between table.name.map and " +
          "collection.name.map for: " +
          conflicts.toSeq.sorted.mkString(", "))
    TableRegistry(tables,
      dbNameMap = JobConfig.nameMap(cfg, "database.name.map"),
      tableNameMap = tableNames ++ collectionNames)
  }

  def configFromMap(cfg: Map[String, String],
      jobName: Option[String] = None): CdcConfig = {
    val registry = registryFromConfig(cfg)
    // Snapshot overrides are declared with the RAW config spelling
    // (like table.schemas keys) but the pipeline routes by SANITIZED
    // keys — re-key through the same collapse, and fail on keys that
    // match no registry entry: a typo'd override would otherwise
    // silently snapshot the FULL table it meant to restrict.
    val overrides = SnapshotOverrides.fromConfig(cfg).map { case (k, v) =>
      val routeKey = routeKeyOf(k)
      if (!registry.routed.contains(routeKey))
        throw new IllegalArgumentException(
          s"SNAPSHOT OVERRIDE FOR UNKNOWN TABLE: $k (known: " +
            registry.routed.keySet.toSeq.sorted.mkString(", ") + ")")
      routeKey -> v
    }
    CdcConfig(
      sourceId = cfg("source.id"),
      registry = registry,
      sinkPath = cfg("sink.path"),
      sourceType = cfg("source.type"),
      offsetStorePath = cfg.get("offset.store.path"),
      statusStorePath = cfg.get("status.store.path"),
      snapshotOnly = cfg.get("snapshot.only").contains("true"),
      failOnUnknownTables = !cfg.get("fail.on.unknown.tables").contains("false"),
      // CLI > config `job.name` > JOB-{source_id} (J4)
      jobName = jobName.orElse(cfg.get("job.name")),
      // snapshot conditions (`MySQLStreamer.java:130-152`): parsed,
      // grammar-checked, re-keyed and registry-validated above so a
      // bad statement or key fails BEFORE any data moves
      snapshotOverrides = overrides,
      // K3 `--debug` (CLI flag folded into cfg by CdcMain) and K4
      // constant sink bucket
      debugPrint = cfg.get("debug").contains("true"),
      fixedBucket = cfg.get("sink.fixed.bucket"),
      // the reference's planned dry-run mode (`README.md:66`): routed
      // per-table counts to the console, nothing written or published
      dryRun = cfg.get("sink.dry.run").contains("true"),
      // `sink.zonemap.columns` — per-table file-skipping manifests
      // maintained beside each sink table; empty entries in the list
      // fail fast like the rest of the config surface
      zonemapColumns = zonemapList(cfg, "sink.zonemap.columns"),
      zonemapBloomColumns = {
        val bloom = zonemapList(cfg, "sink.zonemap.bloom.columns")
        if (bloom.nonEmpty && cfg.get("sink.zonemap.columns").isEmpty)
          throw new IllegalArgumentException(
            "sink.zonemap.bloom.columns requires sink.zonemap.columns " +
              "(the bloom grids live in the same manifest)")
        bloom
      },
      // `sink.compact.after.files` — per-batch partition-scoped
      // auto-compaction; junk or non-positive values fail fast like
      // the rest of the config surface
      compactAfterFiles = cfg.get("sink.compact.after.files")
        .map(v => positiveInt(v, "sink.compact.after.files"))
        .getOrElse(0),
      compactRowsPerFile = cfg.get("sink.compact.rows.per.file")
        .map { v =>
          if (cfg.get("sink.compact.after.files").isEmpty)
            throw new IllegalArgumentException(
              "sink.compact.rows.per.file requires " +
                "sink.compact.after.files (the trigger threshold)")
          positiveInt(v, "sink.compact.rows.per.file").toLong
        }
        .getOrElse(1000000L),
      // `sink.retention.days` — lazy write-time partition expiry
      retentionDays = cfg.get("sink.retention.days")
        .map(v => positiveInt(v, "sink.retention.days"))
        .getOrElse(0),
      // `sink.current.keys` — per-table current-state materialization;
      // raw `db.table` keys re-key through the sanitizer like the
      // override surface, unknown tables and unknown key columns fail
      // assembly (a typo'd key column would otherwise NPE-shape every
      // sync at runtime)
      currentKeys = JobConfig.nameMap(cfg, "sink.current.keys")
        .map { case (k, v) =>
          val routeKey = routeKeyOf(k)
          if (!registry.routed.contains(routeKey))
            throw new IllegalArgumentException(
              s"CURRENT-TABLE KEYS FOR UNKNOWN TABLE: $k (known: " +
                registry.routed.keySet.toSeq.sorted.mkString(", ") + ")")
          val cols = v.split(",").map(_.trim).toSeq
          if (cols.isEmpty || cols.exists(_.isEmpty))
            throw new IllegalArgumentException(
              s"BAD sink.current.keys for $k: '$v' (want col1,col2,...)")
          val fields = registry.routed(routeKey).schema.fieldNames
          for (c <- cols if !fields.exists(_.equalsIgnoreCase(c)))
            throw new IllegalArgumentException(
              s"UNKNOWN CURRENT-TABLE KEY COLUMN for $k: '$c' " +
                s"(table has: ${fields.mkString(", ")})")
          routeKey -> cols
        },
      // `sink.current.buckets` — copy-on-write unit for NEW current
      // tables; meaningless without tables to apply it to
      currentBuckets = cfg.get("sink.current.buckets")
        .map { v =>
          if (cfg.get("sink.current.keys").isEmpty)
            throw new IllegalArgumentException(
              "sink.current.buckets requires sink.current.keys " +
                "(the tables it sizes)")
          positiveInt(v, "sink.current.buckets")
        }
        .getOrElse(16),
      // `sink.current.target.bucket.mb` — rescale-advisory target for
      // live bytes per bucket, measured on full syncs only; advisory
      // (a log line naming CurrentTable.rescale), never an implicit
      // full-table rewrite inside a streaming batch
      currentTargetBucketMb = cfg.get("sink.current.target.bucket.mb")
        .map { v =>
          if (cfg.get("sink.current.keys").isEmpty)
            throw new IllegalArgumentException(
              "sink.current.target.bucket.mb requires sink.current.keys " +
                "(the tables it measures)")
          positiveInt(v, "sink.current.target.bucket.mb")
        }
        .getOrElse(0),
      // `sink.current.fullsync.batches` — every Nth current-table sync
      // does a full sink listing (catches out-of-band backfills);
      // meaningless without current tables to sync
      currentFullsyncBatches = cfg.get("sink.current.fullsync.batches")
        .map { v =>
          if (cfg.get("sink.current.keys").isEmpty)
            throw new IllegalArgumentException(
              "sink.current.fullsync.batches requires sink.current.keys " +
                "(the tables it paces)")
          positiveInt(v, "sink.current.fullsync.batches")
        }
        .getOrElse(0),
      // `sink.current.order.by` — within-bucket sort columns per
      // current table (clustered rewrites for stat-pruned reads);
      // same raw-key re-keying and fail-fast validation as
      // sink.current.keys, and each listed table must HAVE a current
      // table (order for a table nothing materializes is dead config)
      currentOrderBy = {
        // loop-invariant: parse the keyed-table set once, not per entry
        lazy val keyedTables = JobConfig.nameMap(cfg, "sink.current.keys")
          .keySet.map(routeKeyOf)
        JobConfig.nameMap(cfg, "sink.current.order.by")
        .map { case (k, v) =>
          val routeKey = routeKeyOf(k)
          if (!registry.routed.contains(routeKey))
            throw new IllegalArgumentException(
              s"CURRENT-TABLE ORDER FOR UNKNOWN TABLE: $k (known: " +
                registry.routed.keySet.toSeq.sorted.mkString(", ") + ")")
          if (!keyedTables.contains(routeKey))
            throw new IllegalArgumentException(
              s"sink.current.order.by for $k requires sink.current.keys " +
                "for the same table (nothing materializes it otherwise)")
          val cols = v.split(",").map(_.trim).toSeq
          if (cols.isEmpty || cols.exists(_.isEmpty))
            throw new IllegalArgumentException(
              s"BAD sink.current.order.by for $k: '$v' (want col1,col2,...)")
          // the sink's rows carry the kept METADATA columns alongside
          // the payload — `_ts` (recency) is the most natural order,
          // and the registry schema is payload-only, so validate
          // against both
          val fields = registry.routed(routeKey).schema.fieldNames ++
            graft.ops.EnvelopeDecoder
              .keptMetadata(cfg("source.type")).map(_.name)
          for (c <- cols if !fields.exists(_.equalsIgnoreCase(c)))
            throw new IllegalArgumentException(
              s"UNKNOWN CURRENT-TABLE ORDER COLUMN for $k: '$c' " +
                s"(table has: ${fields.mkString(", ")})")
          routeKey -> cols
        }
      },
      // `sink.current.index.columns` — secondary bloom-index columns
      // per current table; same raw-key re-keying and fail-fast
      // validation as sink.current.order.by (an index for a table
      // nothing materializes, or on a column the table doesn't have,
      // is dead config or a runtime attach failure — catch it at
      // assembly)
      currentIndexColumns = {
        lazy val keyedTables = JobConfig.nameMap(cfg, "sink.current.keys")
          .keySet.map(routeKeyOf)
        JobConfig.nameMap(cfg, "sink.current.index.columns")
        .map { case (k, v) =>
          val routeKey = routeKeyOf(k)
          if (!registry.routed.contains(routeKey))
            throw new IllegalArgumentException(
              s"CURRENT-TABLE INDEX FOR UNKNOWN TABLE: $k (known: " +
                registry.routed.keySet.toSeq.sorted.mkString(", ") + ")")
          if (!keyedTables.contains(routeKey))
            throw new IllegalArgumentException(
              s"sink.current.index.columns for $k requires " +
                "sink.current.keys for the same table (nothing " +
                "materializes it otherwise)")
          val cols = v.split(",").map(_.trim).toSeq
          if (cols.isEmpty || cols.exists(_.isEmpty))
            throw new IllegalArgumentException(
              s"BAD sink.current.index.columns for $k: '$v' " +
                "(want col1,col2,...)")
          val fields = registry.routed(routeKey).schema.fieldNames ++
            graft.ops.EnvelopeDecoder
              .keptMetadata(cfg("source.type")).map(_.name)
          for (c <- cols) {
            if (!fields.exists(_.equalsIgnoreCase(c)))
              throw new IllegalArgumentException(
                s"UNKNOWN CURRENT-TABLE INDEX COLUMN for $k: '$c' " +
                  s"(table has: ${fields.mkString(", ")})")
            // the index dir is named after the column — enforce the
            // attach-time charset HERE, or a schema-legal exotic name
            // passes assembly and crash-loops the job at the first
            // batch's attach
            graft.ops.BucketIndex.validColumn(c)
          }
          routeKey -> cols
        }
      },
      // `sink.current.rollup` — maintained rollups per current table,
      // `"name: dims=c1,c2; op:col:as op:col:as"` (dims= optional →
      // global). Spec built HERE so every rule RollupTable.Spec
      // enforces (ops, k, separator hygiene) plus schema membership
      // fails at assembly, not at the first batch's attach
      currentRollups = {
        lazy val keyedTables = JobConfig.nameMap(cfg, "sink.current.keys")
          .keySet.map(routeKeyOf)
        JobConfig.nameMap(cfg, "sink.current.rollup")
        .map { case (k, v) =>
          val routeKey = routeKeyOf(k)
          if (!registry.routed.contains(routeKey))
            throw new IllegalArgumentException(
              s"CURRENT-TABLE ROLLUP FOR UNKNOWN TABLE: $k (known: " +
                registry.routed.keySet.toSeq.sorted.mkString(", ") + ")")
          if (!keyedTables.contains(routeKey))
            throw new IllegalArgumentException(
              s"sink.current.rollup for $k requires sink.current.keys " +
                "for the same table (nothing materializes it otherwise)")
          val specs = v.split("\\|").map(_.trim).filter(_.nonEmpty)
            .map(parseRollupSpec(k, _)).toSeq
          if (specs.isEmpty)
            throw new IllegalArgumentException(
              s"BAD sink.current.rollup for $k: '$v' " +
                "(want name: [dims=c1,c2;] op:col:as ...)")
          if (specs.map(_._1).distinct.size != specs.size)
            throw new IllegalArgumentException(
              s"DUPLICATE ROLLUP NAME in sink.current.rollup for $k")
          val fields = registry.routed(routeKey).schema.fieldNames ++
            graft.ops.EnvelopeDecoder
              .keptMetadata(cfg("source.type")).map(_.name)
          for ((_, spec) <- specs;
              c <- spec.dims ++ spec.aggs.map(_.col).filter(_ != "*")
              if !fields.exists(_.equalsIgnoreCase(c)))
            throw new IllegalArgumentException(
              s"UNKNOWN CURRENT-TABLE ROLLUP COLUMN for $k: '$c' " +
                s"(table has: ${fields.mkString(", ")})")
          routeKey -> specs
        }
      },
      // `sink.index.text` / `sink.index.neardup` / `sink.index.ann` —
      // maintained LLM indexes per table (JSON map of raw `db.table`
      // → the indexed column), fed a delta per committed batch and
      // measured by the one-call maintenance on full syncs. Requires
      // sink.current.keys with exactly ONE integral key column for
      // the same table (the posting id); the column must exist in the
      // table's schema. Validated here with config-file messages; the
      // pipeline re-validates at construction for direct-CdcConfig
      // users.
      indexText = indexColumnMap(cfg, registry, "sink.index.text"),
      indexNeardup = indexColumnMap(cfg, registry,
        "sink.index.neardup"),
      indexAnn = indexColumnMap(cfg, registry, "sink.index.ann"),
      // `sink.index.text.buckets` — attach-time postings fanout
      indexTextBuckets = cfg.get("sink.index.text.buckets")
        .map { v =>
          if (cfg.get("sink.index.text").isEmpty)
            throw new IllegalArgumentException(
              "sink.index.text.buckets requires sink.index.text " +
                "(the indexes it sizes)")
          positiveInt(v, "sink.index.text.buckets")
        }
        .getOrElse(graft.ops.TextIndex.TermBuckets),
      // `sink.index.ann.k` — first-attach codebook size
      indexAnnK = cfg.get("sink.index.ann.k")
        .map { v =>
          if (cfg.get("sink.index.ann").isEmpty)
            throw new IllegalArgumentException(
              "sink.index.ann.k requires sink.index.ann " +
                "(the indexes it sizes)")
          positiveInt(v, "sink.index.ann.k")
        }
        .getOrElse(16),
      // `sink.index.target.rows` — the resize advisories' sizing
      // target (rows per postings bucket / per centroid)
      indexTargetRows = cfg.get("sink.index.target.rows")
        .map { v =>
          if (Seq("sink.index.text", "sink.index.ann")
              .forall(cfg.get(_).isEmpty))
            throw new IllegalArgumentException(
              "sink.index.target.rows requires sink.index.text or " +
                "sink.index.ann (the sizing advisories it targets)")
          positiveInt(v, "sink.index.target.rows").toLong
        }
        .getOrElse(1000000L),
      // `sink.index.min.reclaimable` — the fleet floor under which
      // owed compacts surface as compact-deferred records
      indexMinReclaimable = cfg.get("sink.index.min.reclaimable")
        .map { v =>
          if (Seq("sink.index.text", "sink.index.neardup",
              "sink.index.ann").forall(cfg.get(_).isEmpty))
            throw new IllegalArgumentException(
              "sink.index.min.reclaimable requires a sink.index.* " +
                "map (the indexes whose compacts it floors)")
          positiveInt(v, "sink.index.min.reclaimable").toLong
        }
        .getOrElse(0L),
      // `sink.current.lookup.max.driver.keys` — CurrentTable.lookup's
      // driver-side probe bound, published as the session default by
      // the pipeline; meaningless without current tables to look into
      currentLookupMaxDriverKeys =
        cfg.get("sink.current.lookup.max.driver.keys")
          .map { v =>
            if (cfg.get("sink.current.keys").isEmpty)
              throw new IllegalArgumentException(
                "sink.current.lookup.max.driver.keys requires " +
                  "sink.current.keys (the tables it bounds lookups on)")
            positiveInt(v, "sink.current.lookup.max.driver.keys")
          }
          .getOrElse(0),
      // `mongodb.deserialization.mode` (`MongoDBStreamer.java:64,92-107`):
      // doc-string / top-level-string / top-level-type, defaulting to
      // top-level-type with a warning, unknown value fails fast — only
      // consulted for a mongodb source, like the reference
      mongoMode =
        if (cfg("source.type") != "mongodb") None
        else Some(cfg.get("mongodb.deserialization.mode") match {
          case Some("doc-string") => graft.ops.MongoModes.DocString
          case Some("top-level-string") => graft.ops.MongoModes.TopLevelString
          case Some("top-level-type") => graft.ops.MongoModes.TopLevelType
          case Some(other) => throw new IllegalArgumentException(
            s"UNKNOWN MONGODB DESERIALIZATION MODE: $other")
          case None =>
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              "MONGODB DESERIALIZATION MODE NOT SET, DEFAULT TO: " +
                "top-level-type")
            graft.ops.MongoModes.TopLevelType
        }))
  }

  /** One `sink.index.*` JSON name map (raw `db.table` → the single
    * indexed column), fully validated at assembly: known table, a
    * single-column INTEGRAL `sink.current.keys` entry for the same
    * table (the posting id the index families key on), and the
    * indexed column present in the table's schema — a bad entry here
    * would otherwise crash-loop the job at its first batch's delta.
    */
  private def indexColumnMap(cfg: Map[String, String],
      registry: graft.model.TableRegistry,
      cfgKey: String): Map[String, String] = {
    lazy val currentKeysByRoute = JobConfig.nameMap(cfg,
        "sink.current.keys")
      .map { case (k, v) =>
        routeKeyOf(k) -> v.split(",").map(_.trim).toSeq }
    JobConfig.nameMap(cfg, cfgKey).map { case (k, v) =>
      val routeKey = routeKeyOf(k)
      if (!registry.routed.contains(routeKey))
        throw new IllegalArgumentException(
          s"MAINTAINED INDEX FOR UNKNOWN TABLE: $k (known: " +
            registry.routed.keySet.toSeq.sorted.mkString(", ") + ")")
      val column = v.trim
      if (column.isEmpty || column.contains(","))
        throw new IllegalArgumentException(
          s"BAD $cfgKey for $k: '$v' (want ONE column name)")
      val pk = currentKeysByRoute.getOrElse(routeKey,
        throw new IllegalArgumentException(
          s"$cfgKey for $k requires sink.current.keys for the same " +
            "table (its single key column is the posting id)"))
      if (pk.size != 1)
        throw new IllegalArgumentException(
          s"$cfgKey for $k needs a SINGLE-column sink.current.keys " +
            s"(got ${pk.mkString(", ")}) — the index posting id is " +
            "one long key")
      val schema = registry.routed(routeKey).schema
      // a key column absent from the schema never reaches this map:
      // configFromMap's currentKeys validator (UNKNOWN CURRENT-TABLE
      // KEY COLUMN) runs first and refuses it — keyField is nonEmpty
      // here by construction, so only the type check remains
      val keyField = schema.fields.find(_.name.equalsIgnoreCase(pk.head))
      for (f <- keyField
          if f.dataType != org.apache.spark.sql.types.IntegerType &&
            f.dataType != org.apache.spark.sql.types.LongType)
        throw new IllegalArgumentException(
          s"$cfgKey for $k: key column ${pk.head} is " +
            s"${f.dataType.simpleString}, not integral — the index " +
            "posting id must cast to long losslessly")
      val colField = schema.fields.find(_.name.equalsIgnoreCase(column))
      if (colField.isEmpty)
        throw new IllegalArgumentException(
          s"UNKNOWN INDEX COLUMN for $k: '$column' " +
            s"(table has: ${schema.fieldNames.mkString(", ")})")
      // the SAME rule as the construction-time check, by construction
      // ([[CdcPipeline.annEmbeddingTypeOk]] is the one shared
      // predicate) — a file config can never pass here and fail there
      if (cfgKey == "sink.index.ann" &&
          !CdcPipeline.annEmbeddingTypeOk(colField.get.dataType))
        throw new IllegalArgumentException(
          s"BAD $cfgKey for $k: column '$column' is " +
            s"${colField.get.dataType.simpleString} — the embedding " +
            "column must be a JSON-array string or an array castable " +
            "to array<double>")
      routeKey -> column
    }
  }

  /** Comma-separated column list under `key` — empty entries fail
    * fast like the rest of the config surface.
    */
  private def zonemapList(cfg: Map[String, String], key: String): Seq[String] =
    cfg.get(key) match {
      case None => Nil
      case Some(s) =>
        val cols = s.split(",").map(_.trim).toSeq
        if (cols.isEmpty || cols.exists(_.isEmpty))
          throw new IllegalArgumentException(
            s"BAD $key: '$s' (want col1,col2,...)")
        cols
    }

  /** Strictly positive integer under `key` — junk fails fast. */
  /** One rollup clause of `sink.current.rollup`:
    * `name: [dims=c1,c2;] op:col:as[:k] op:col:as ...` → the name and
    * the [[graft.ops.RollupTable.Spec]] it builds. Spec construction
    * runs the full RollupTable validation (ops, k, separator hygiene)
    * at assembly; malformed shapes fail with the clause named.
    */
  private def parseRollupSpec(table: String,
      s: String): (String, graft.ops.RollupTable.Spec) = {
    def bad(why: String): Nothing = throw new IllegalArgumentException(
      s"BAD sink.current.rollup for $table: '$s' ($why; want " +
        "name: [dims=c1,c2;] op:col:as[:k] ...)")
    s.split(":", 2) match {
      case Array(rawName, rest) =>
        val name = rawName.trim
        if (name.isEmpty) bad("empty rollup name")
        // the attach-time charset, enforced at assembly like the
        // index columns — no crash-looping the job at the first batch
        graft.ops.PointerDir.validSegment("rollup name", name)
        var dims: Seq[String] = Nil
        val aggs = scala.collection.mutable.ArrayBuffer
          .empty[graft.ops.RollupTable.Agg]
        for (seg0 <- rest.split(";").map(_.trim).filter(_.nonEmpty)) {
          if (seg0.toLowerCase.startsWith("dims=")) {
            if (dims.nonEmpty) bad("dims= given twice")
            dims = seg0.drop(5).split(",").map(_.trim)
              .filter(_.nonEmpty).toSeq
            if (dims.isEmpty) bad("empty dims=")
          } else for (a <- seg0.split("[,\\s]+").filter(_.nonEmpty)) {
            a.split(":") match {
              case Array(op, c, as) =>
                aggs += graft.ops.RollupTable.Agg(op, c, as)
              case Array(op, c, as, k) =>
                val kk = try k.toInt catch {
                  case _: NumberFormatException => bad(s"bad k in '$a'")
                }
                aggs += graft.ops.RollupTable.Agg(op, c, as, kk)
              case _ => bad(s"malformed aggregate '$a'")
            }
          }
        }
        if (aggs.isEmpty) bad("no aggregates")
        name -> graft.ops.RollupTable.Spec(dims, aggs.toSeq)
      case _ => bad("missing ':' after the rollup name")
    }
  }

  private def positiveInt(v: String, key: String): Int = {
    val n = try v.trim.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"BAD $key: '$v' (want a positive integer)")
    }
    if (n <= 0) throw new IllegalArgumentException(
      s"BAD $key: '$v' (want a positive integer)")
    n
  }

  /** Target `CREATE TABLE` SQL for every sink table of a config (the
    * reference's planned auto-generation, `README.md:67`) — see
    * [[SinkDdl.createTableSql]].
    */
  def sinkDdl(cfg: Map[String, String]): Map[String, Seq[String]] =
    SinkDdl.createTableSql(configFromMap(cfg))

  /** `snapshot.jdbc.chunk.auto`: one `DatabaseMetaData.getPrimaryKeys`
    * walk (through the same [[graft.schema.JdbcRegistry]] adapter the
    * live registry walk uses) resolving each pending table's chunk
    * column from its primary key. Numeric single-column PKs only —
    * the chunk math is a numeric range; a composite, string, or
    * absent key means the table degrades to the single-shot scan,
    * with a log line naming why. Numeric-ness is judged on the
    * REGISTRY'S collapsed type for the column (the §1.3 policy the
    * sink schema is built from), so config and discovery can't
    * disagree. The connection is opened once and closed before any
    * data scan starts.
    */
  private[graft] def discoverChunkColumns(config: CdcConfig,
      url: String, connProps: Map[String, String],
      tables: Set[String], log: org.slf4j.Logger)
      : Map[String, Option[String]] = {
    if (tables.isEmpty) return Map.empty
    connProps.get("driver").foreach(Class.forName)
    val props = new java.util.Properties()
    for ((k, v) <- connProps if k != "driver") props.setProperty(k, v)
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val meta = graft.schema.JdbcRegistry.fromDatabaseMetaData(
        conn.getMetaData,
        // MySQL namespaces databases as JDBC catalogs; PG/Oracle (and
        // Derby) as schemas — the adapter falls back to the opposite
        // convention anyway, this just picks the first try
        dbIsSchema = config.sourceType != "mysql")
      (for (key <- tables.toSeq) yield {
        val spec = config.registry.routed(key)
        val src = config.registry.sourceTables.getOrElse(key, spec)
        val col = meta.primaryKeys(src.db, src.table) match {
          case Seq(one) =>
            import org.apache.spark.sql.types._
            val numeric = spec.schema.fields
              .find(_.name.equalsIgnoreCase(graft.schema.Sanitizer(one)))
              .exists(_.dataType match {
                case IntegerType | LongType | ShortType | ByteType => true
                case _ => false
              })
            if (numeric) Some(one)
            else {
              log.info(s"[${config.name}] $key: primary key '$one' is " +
                "not numeric in the registry schema — single-shot " +
                "snapshot for this table")
              None
            }
          case Seq() =>
            log.info(s"[${config.name}] $key: no primary key " +
              "discovered — single-shot snapshot for this table")
            None
          case many =>
            log.info(s"[${config.name}] $key: composite primary key " +
              s"(${many.mkString(", ")}) — single-shot snapshot for " +
              "this table")
            None
        }
        key -> col
      }).toMap
    } finally conn.close()
  }

  /** Assemble and run. Snapshot-only uses AvailableNow (drain and
    * exit — cleaner than the reference's first-non-READ + 10 s timer
    * heuristic, SURVEY §3.3); tailing mode uses a ProcessingTime
    * trigger at the configured checkpoint interval with a monitor
    * loop that stops the query once the gate fires.
    */
  private def jdbcConnProps(cfg: Map[String, String]): Map[String, String] =
    Seq("driver", "user", "password")
      .flatMap(k => cfg.get(s"snapshot.jdbc.$k").map(k -> _)).toMap

  def run(spark: SparkSession, cfg: Map[String, String],
      inputDir: String, checkpointDir: String,
      jobName: Option[String] = None): CdcPipeline = {
    val config = configFromMap(cfg, jobName)
    val pipeline = new CdcPipeline(spark, config)
    // live query-based tail (tail.jdbc.*): parsed + validated up
    // front so a contradiction fails before any data moves
    val tailSettings = ChangelogTail.fromConfig(cfg, config)

    // trigger install runs BEFORE the snapshot: changes committed in
    // between appear both as READ rows and as tail events (the
    // query-based-CDC at-least-once overlap window, documented on
    // ChangelogTail); installing after would instead LOSE that window
    for (ts <- tailSettings if ts.install) {
      val log = org.slf4j.LoggerFactory.getLogger(getClass)
      if (config.dryRun)
        log.info(s"[${config.name}] DRY-RUN: would install changelog " +
          "tables + triggers for " +
          config.registry.sourceTables.values.map(_.key).toSeq.sorted
            .mkString(", "))
      else {
        val conn = ChangelogTail.connect(cfg("snapshot.jdbc.url"),
          jdbcConnProps(cfg))
        val installed = try ChangelogTail.installMissing(conn,
          config.registry.sourceTables.values.toSeq.sortBy(_.key),
          ChangelogTail.rawColumnTypes(cfg), ts.suffix,
          dbIsSchema = config.sourceType != "mysql")
        finally conn.close()
        if (installed.nonEmpty)
          log.info(s"[${config.name}] installed changelog tables for: " +
            installed.sorted.mkString(", "))
      }
    }

    // S6: startup resolution (logged decision). The DSv2 feed
    // actually SEEKS — startup.mode / startup.offset /
    // startup.timestamp flow into its initialOffset; the plain file
    // feed replays from the beginning. Stored offsets are not
    // forwarded as feed positions: they are source-domain offsets
    // (binlog file,pos), and checkpoint recovery already owns resume.
    val stored = config.offsetStorePath.flatMap(pipeline.readStoredOffset)
    val mode = StartupMode.resolve(cfg.get("startup.mode"), stored,
      cfg.get("startup.timestamp").map(_.toLong), config.snapshotOnly)
    // the stored offset influences resolve() for LOGGING parity with
    // the reference, but is deliberately not a feed seek position —
    // say so, so the log cannot claim an offset resume the feed
    // doesn't perform (checkpoint recovery owns resume)
    org.slf4j.LoggerFactory.getLogger(getClass)
      .info(s"[${config.name}] startup mode resolved: $mode" +
        (if (stored.isDefined)
          " (stored offset applies via checkpoint recovery, not feed seek)"
        else ""))
    // REWIND over maintained indexes: an explicit startup position
    // (earliest / offset / timestamp) re-delivers old events in NEW
    // batch boundaries, so the replay fingerprints never skip them
    // and the index delta protocol's gen-ordered kills serve the
    // re-delivered STALE content (the current table's (_ts, offset)
    // fold is immune). Contract: rebuild the configured indexes from
    // the current table after a rewind — warn loudly at the point the
    // operator made the choice, since the pipeline cannot tell a
    // rewound event from a fresh one. Gated on CHECKPOINT absence,
    // the thing that actually decides seek-vs-resume: startup.* flow
    // into the feed's initialOffset only when no checkpoint recovers
    // (an existing checkpoint resumes regardless of startup config —
    // warning there would cry rewind on every routine restart), and
    // the offset STORE never seeks the feed (documented above), so it
    // plays no part in the gate.
    val indexedKinds = Seq(
      "sink.index.text" -> config.indexText,
      "sink.index.neardup" -> config.indexNeardup,
      "sink.index.ann" -> config.indexAnn).filter(_._2.nonEmpty)
    val checkpointRecovers = {
      // `offsets/` specifically, not the dir: query start writes the
      // `metadata` file immediately, so a run that died before its
      // first offset commit leaves a non-empty checkpoint that does
      // NOT resume — the source still consults initialOffset and
      // seeks the configured startup position
      val p = new org.apache.hadoop.fs.Path(checkpointDir, "offsets")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      // COMMITTED batch files only (numeric names): a crash mid-write
      // leaves a hidden .tmp in offsets/ that HDFSMetadataLog ignores
      // on recovery — counting it would suppress the warning in
      // exactly the died-before-first-commit window
      fs.exists(p) && fs.listStatus(p)
        .exists(_.getPath.getName.forall(_.isDigit))
    }
    val explicitRewind = !checkpointRecovers &&
      (cfg.get("startup.mode").map(_.trim.toLowerCase)
        .contains("earliest") ||
        cfg.contains("startup.offset") ||
        cfg.contains("startup.timestamp"))
    if (explicitRewind && indexedKinds.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"[${config.name}] explicit startup position with " +
          s"maintained indexes configured (${indexedKinds.map(_._1)
            .mkString(", ")}): if the sink already holds these events, " +
          "re-delivered old changes will land at newer index " +
          "generations and serve stale content — rebuild each index " +
          "from its current table after the rewind")

    // Snapshot-then-stream (the reference's default startup,
    // `MySQLStreamer.java:269-291`): with a configured live JDBC
    // source, on FIRST start only (initial mode, no stored offset —
    // a restart resuming from an offset must not re-snapshot), every
    // registry table is snapshotted server-side into its sink dir
    // before the tail starts. Override statements push down via
    // dbtable subqueries; `snapshot.jdbc.partition.column` /
    // `.lower.bound` / `.upper.bound` / `.num.partitions` shard big
    // tables across executors.
    //
    // Idempotence: snapshot writes append, and snapshot READ rows
    // never advance the offset store — so a crash BETWEEN snapshot
    // completion and the first tail batch would look like a first
    // start again and duplicate every READ row. A durable
    // snapshot-complete marker (offset store, falling back to the
    // sink root) closes that window. The marker records the route
    // keys snapshotted, one per line — a table added to the registry
    // later still gets ITS snapshot on the next initial start instead
    // of being silently tail-only; written only after every pending
    // table landed, so a crash mid-snapshot re-runs those tables.
    //
    // Dry run: nothing written, nothing marked — a dry run that
    // persisted the marker would make the next REAL run skip the
    // snapshot entirely (permanent READ-row loss).
    for (url <- cfg.get("snapshot.jdbc.url")
         if stored.isEmpty && mode == StartupMode.Initial) {
      val log = org.slf4j.LoggerFactory.getLogger(getClass)
      if (config.dryRun)
        log.info(s"[${config.name}] DRY-RUN: would snapshot " +
          s"${config.registry.keys.toSeq.sorted.mkString(", ")} from $url")
      else {
        val markerDir = config.offsetStorePath.getOrElse(config.sinkPath)
        val marker = new org.apache.hadoop.fs.Path(
          s"$markerDir/${config.sourceId}_snapshot.done")
        val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val done: Set[String] =
          if (!fs.exists(marker)) Set.empty
          else {
            val in = fs.open(marker)
            try scala.io.Source.fromInputStream(in, "UTF-8")
              .getLines().map(_.trim).filter(_.nonEmpty).toSet
            finally in.close()
          }
        // entries no registry key claims are surfaced LOUDLY: they
        // are renamed/removed tables — or, before writes were atomic,
        // a torn line from a crash mid-marker-write. Either way the
        // marker must not silently carry names nobody owns.
        val unknown = done.diff(config.registry.keys)
        if (unknown.nonEmpty)
          log.warn(s"[${config.name}] snapshot marker $marker lists " +
            s"entr${if (unknown.size == 1) "y" else "ies"} no registry " +
            s"table claims: ${unknown.toSeq.sorted.mkString(", ")} " +
            "(renamed/removed table, or a torn line from a crash " +
            "mid-write) — unclaimed entries are kept, unmatched " +
            "tables re-snapshot")
        val pending = config.registry.keys.diff(done)
        if (pending.isEmpty)
          log.info(s"[${config.name}] JDBC snapshot already complete " +
            s"($marker) — starting the tail only")
        else {
          val connProps = jdbcConnProps(cfg)
          val partOpts = Seq(
            "partitionColumn" -> "partition.column",
            "lowerBound" -> "lower.bound",
            "upperBound" -> "upper.bound",
            "numPartitions" -> "num.partitions")
            .flatMap { case (sparkKey, cfgKey) =>
              cfg.get(s"snapshot.jdbc.$cfgKey").map(sparkKey -> _) }.toMap
          // Chunked resumable snapshot (`snapshot.jdbc.chunks`,
          // default 4, range slices with durable per-chunk progress
          // beside the marker — a multi-terabyte table's snapshot
          // resumes at chunk granularity, not table granularity; the
          // plan is cut once and persisted, a restart reuses it
          // verbatim). The chunk column is resolved PER TABLE — a
          // heterogeneous registry has different key names per table,
          // like the reference's incremental snapshot which chunks
          // every table on its own key (`MySQLStreamer.java:214-311`):
          //   1. `snapshot.jdbc.chunk.column.<db.table>` (raw config
          //      spelling, like table.schemas keys) — per-table
          //      override;
          //   2. `snapshot.jdbc.chunk.column` — one global name;
          //   3. `snapshot.jdbc.chunk.auto=true` — the table's
          //      discovered primary key (numeric single-column only;
          //      else that table degrades to single-shot, logged).
          // Any of the three turns chunked mode on.
          // `snapshot.jdbc.chunk.rows` sizes chunks by value span —
          // the reference's rows-per-split knob (`mysql.split.size`
          // 4096, `MySQLStreamer.java:200`); `.rows.exact=true` sizes
          // by a server-side COUNT(*) instead.
          val chunkPrefix = "snapshot.jdbc.chunk.column."
          val perTableCols: Map[String, String] = cfg.collect {
            case (k, v) if k.startsWith(chunkPrefix) =>
              val raw = k.stripPrefix(chunkPrefix)
              val routeKey = raw.split("\\.", 2) match {
                case Array(d, t) =>
                  s"${graft.schema.Sanitizer(d)}.${graft.schema.Sanitizer(t)}"
                case Array(t) => graft.schema.Sanitizer(t)
              }
              // a typo'd key would silently chunk the WRONG way (or
              // not at all) — fail like snapshot overrides do
              if (!config.registry.routed.contains(routeKey))
                throw new IllegalArgumentException(
                  s"CHUNK COLUMN FOR UNKNOWN TABLE: $k (known: " +
                    config.registry.routed.keySet.toSeq.sorted
                      .mkString(", ") + ")")
              routeKey -> v
          }
          val globalCol = cfg.get("snapshot.jdbc.chunk.column")
          val autoChunk = cfg.get("snapshot.jdbc.chunk.auto")
            .contains("true")
          val counts = if (perTableCols.nonEmpty || globalCol.isDefined ||
              autoChunk) {
            // chunking re-shards on the CHUNK column; explicitly
            // configured partition.column/bounds don't apply there —
            // say so instead of silently changing the scan shape
            if (partOpts.keySet.exists(_ != "numPartitions"))
              log.warn(s"[${config.name}] snapshot.jdbc.partition." +
                "column / snapshot.jdbc.lower.bound / snapshot.jdbc." +
                "upper.bound are ignored when chunking is on — " +
                "chunking shards on each table's chunk column " +
                "(snapshot.jdbc.num.partitions still applies per chunk)")
            // auto: one metadata connection, closed before any scan —
            // probe each pending table's PK unless an explicit column
            // already decides it
            val autoCols: Map[String, Option[String]] =
              if (!autoChunk) Map.empty
              else discoverChunkColumns(config, url, connProps,
                pending.filterNot(k =>
                  perTableCols.contains(k) || globalCol.isDefined), log)
            val resolver: String => Option[String] = key =>
              perTableCols.get(key).orElse(globalCol)
                .orElse(autoCols.getOrElse(key, None))
            val progress = new JdbcSnapshot.FileChunkProgress(spark,
              s"$markerDir/${config.sourceId}_snapshot.chunks")
            JdbcSnapshot.writeSnapshotChunked(spark, config, url,
              connProps, System.currentTimeMillis(), resolver,
              cfg.getOrElse("snapshot.jdbc.chunks", "4").toInt,
              progress, Some(pending),
              rowsPerChunk = cfg.get("snapshot.jdbc.chunk.rows")
                .map(_.toLong),
              // `.exact=true`: size by a server-side COUNT(*) (the
              // reference's true rows-per-split) instead of key span
              exactRows = cfg.get("snapshot.jdbc.chunk.rows.exact")
                .contains("true"),
              // chunk = resume unit, partitions = parallelism unit:
              // each chunk's range scan shards across executors
              // (partOpts already parsed the key — single source)
              numPartitions = partOpts.get("numPartitions")
                .map(_.toInt).getOrElse(1),
              // `snapshot.jdbc.table.parallelism`: overlap per-table
              // scans on a bounded driver pool — a wide registry's
              // wall clock is otherwise the SUM of its tables
              tableParallelism = cfg
                .getOrElse("snapshot.jdbc.table.parallelism", "1").toInt)
          } else
            JdbcSnapshot.writeSnapshot(spark, config, url, connProps,
              System.currentTimeMillis(), partOpts, Some(pending),
              tableParallelism = cfg
                .getOrElse("snapshot.jdbc.table.parallelism", "1").toInt)
          // atomic publication: a crash mid-write must not leave a
          // truncated marker whose partial last line silently reads
          // as "table done" — the torn name would differ from every
          // registry key, so the table WOULD re-snapshot, but the
          // marker must still never lie about the tables it does list
          AtomicFiles.write(marker.toString,
            (done ++ pending).toSeq.sorted.mkString("", "\n", "\n"),
            spark.sparkContext.hadoopConfiguration)
          log.info(s"[${config.name}] JDBC snapshot complete: " +
            counts.map { case (k, n) => s"$k=$n" }.mkString(", "))
        }
      }
    }

    val feed: graft.source.CdcFeed =
      if (cfg.get("source.feed").contains("dsv2"))
        graft.source.Dsv2Feed(inputDir,
          maxRecordsPerTrigger = cfg.get("max.records.per.trigger").map(_.toLong),
          // snapshot-only with no user cap: default to one file per
          // trigger (mirroring the JsonLinesFeed branch) so the stop
          // gate can observe snapshot-complete at fine granularity
          // instead of committing the whole backlog as one batch
          maxFilesPerTrigger = cfg.get("max.files.per.trigger").map(_.toInt)
            .orElse(if (config.snapshotOnly &&
              cfg.get("max.records.per.trigger").isEmpty) Some(1) else None),
          // snapshot-only forces initial (S5) — forwarding a
          // configured "latest" would skip the backlog and produce an
          // empty snapshot, contradicting the resolve() above
          options = if (config.snapshotOnly) Map.empty
          else Seq(
            cfg.get("startup.mode").map("startup.mode" -> _),
            cfg.get("startup.offset").map("startup.offset" -> _),
            cfg.get("startup.timestamp").map("startup.timestamp.ms" -> _))
            .flatten.toMap)
      else graft.source.JsonLinesFeed(inputDir,
        maxFilesPerTrigger = if (config.snapshotOnly) Some(1) else None)

    if (config.snapshotOnly) {
      pipeline.startFeed(feed, checkpointDir, Trigger.AvailableNow())
        .awaitTermination()
      pipeline.awaitDebugEcho() // K3: AvailableNow echo drains itself
    } else {
      val interval = cfg.getOrElse("checkpoint.interval", "30").toInt
      val q = pipeline.startFeed(feed, checkpointDir,
        Trigger.ProcessingTime(s"$interval seconds"))
      tailSettings.filter(_ => !config.dryRun) match {
        case Some(ts) =>
          // the live tail: poll the trigger changelogs into the SAME
          // feed dir the query reads; drive() owns the monitor loop
          // (gate, cadence, optional prune, drain-then-stop)
          val tailer = new graft.source.JdbcChangelogTailer(
            cfg("snapshot.jdbc.url"), jdbcConnProps(cfg),
            config.registry.sourceTables.values.toSeq.sortBy(_.key),
            inputDir, ts.rowsPerSegment, ts.suffix)
          ChangelogTail.drive(q, pipeline.gate, tailer, ts)
        case None =>
          if (tailSettings.isDefined)
            org.slf4j.LoggerFactory.getLogger(getClass).info(
              s"[${config.name}] DRY-RUN: changelog tail not polled " +
                "(polling publishes feed segments — a write)")
          while (q.isActive && !pipeline.gate.stopped)
            q.awaitTermination(200)
      }
      if (q.isActive) q.stop() // drain-then-stop (P1 mapping)
      q.awaitTermination()
      // K3: a ProcessingTime echo never self-stops — without this it
      // outlives the job, reading and printing forever
      pipeline.stopDebugEcho()
    }
    pipeline
  }
}

/** CLI: `--config <path> [--name <job>] [--input <dir>]
  * [--checkpoint <dir>] [--debug true]` — the `processCLIArgs`
  * analog (`FlinkCDCMulti.java:393-415`; `--debug` is the K3 print
  * sink, folded into the config map so `configFromMap` sees one
  * source of truth).
  */
object CdcMain {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val cfg = JobConfig.load(opts("config")) ++
      opts.get("debug").map("debug" -> _)
    val spark = SparkSession.builder()
      .appName(opts.getOrElse("name", s"JOB-${cfg("source.id")}"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    CdcJob.run(spark, cfg,
      inputDir = opts.getOrElse("input", cfg("source.feed.path")),
      checkpointDir = opts.getOrElse("checkpoint",
        cfg.getOrElse("checkpoint.dir", s"${cfg("sink.path")}/_checkpoints")),
      jobName = opts.get("name"))
    spark.stop()
  }
}
