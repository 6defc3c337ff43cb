package graft.schema

import org.apache.spark.sql.types._

/** Name sanitizer: `-` and `.` → `_` in db/table/column names
  * (`utils/Sanitizer.java:4-8`; rationale `README.md:208-211`).
  */
object Sanitizer {
  def apply(name: String): String = name.replace('-', '_').replace('.', '_')
}

/** Source-type → Spark-type mapping, reproducing the reference's
  * six-primitive collapse (`AVROUtils.java:29-196`, SURVEY §1.3):
  * decimals and timestamps are strings BY POLICY, unsigned int
  * widens to long, Oracle maps every non-boolean type to string.
  * All data columns are nullable (the Avro null-union).
  */
object TypeMapping {

  /** MySQL/Postgres JDBC TYPE_NAME → Spark type
    * (`AVROUtils.java:54-103`).
    */
  def jdbcToSpark(typeName: String): DataType = {
    val t = typeName.trim.toUpperCase
    val unsigned = t.contains("UNSIGNED")
    val base = t.replace(" UNSIGNED", "").replace("UNSIGNED", "").trim
    base match {
      case "TINYINT" | "SMALLINT" | "MEDIUMINT" | "INT2" | "YEAR" | "DATE" =>
        IntegerType
      case "INT" | "INTEGER" | "INT4" =>
        if (unsigned) LongType else IntegerType
      case "BIGINT" | "INT8" | "DATETIME" | "TIME" => LongType
      case "FLOAT" | "REAL" | "DOUBLE" | "DOUBLE PRECISION" | "FLOAT4" |
           "FLOAT8" => DoubleType
      case "BIT" | "BOOL" | "BOOLEAN" => BooleanType
      // VARCHAR/CHAR/TEXT/DECIMAL/TIMESTAMP and anything unknown:
      case _ => StringType
    }
  }

  /** Oracle: boolean-ish → boolean, everything else → string
    * (`AVROUtils.java:105-154`).
    */
  def oracleToSpark(typeName: String): DataType =
    typeName.trim.toUpperCase match {
      case "BOOLEAN" | "BOOL" => BooleanType
      case _ => StringType
    }

  /** MongoDB sampled-value class → Spark type (`AVROUtils.java:29-52`).
    * ObjectId/String/Document/arrays → string; unknown → string.
    */
  def mongoClassToSpark(cls: String): DataType = cls match {
    case "Integer" => IntegerType
    case "Long" => LongType
    case "Double" => DoubleType
    case "Boolean" => BooleanType
    case _ => StringType
  }

  /** The Avro-JSON union tag used when payload values are encoded as
    * `{"int": 5}` / `{"string": "x"}` (SURVEY §1.3,
    * `MySQLDebeziumToJSONDeserializer.java:114-148`).
    */
  def unionTag(dt: DataType): String = dt match {
    case IntegerType => "int"
    case LongType => "long"
    case DoubleType | FloatType => "double"
    case BooleanType => "boolean"
    case _ => "string"
  }

  /** Split on commas OUTSIDE parentheses — the shared tokenizer for
    * comma-separated lists whose items may carry parenthesized JDBC
    * types (`DECIMAL(10,2)`, `TIMESTAMP(6)`): config column specs
    * (CdcJob) and ALTER clause lists (DdlEvolution).
    */
  def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    for (c <- s) c match {
      case '(' => depth += 1; sb.append(c)
      case ')' => depth -= 1; sb.append(c)
      case ',' if depth == 0 => out += sb.toString; sb.clear()
      case other => sb.append(other)
    }
    if (sb.nonEmpty) out += sb.toString
    out.toSeq
  }

  /** Build a nullable payload schema from (name, jdbc type) pairs,
    * sanitizing column names.
    */
  def schemaFromJdbc(cols: Seq[(String, String)],
      oracle: Boolean = false): StructType =
    StructType(cols.map { case (name, tpe) =>
      StructField(Sanitizer(name),
        if (oracle) oracleToSpark(tpe) else jdbcToSpark(tpe), nullable = true)
    })

  /** Mongo 100-doc sampling inference: field → class-of-first-value;
    * a field seen with two different classes is a hard error, matching
    * `MongoDBStreamer.java:253-298` + `NoOverwriteHashMap.java:8-13`.
    */
  def inferFromSamples(samples: Seq[Map[String, String]]): StructType = {
    val acc = scala.collection.mutable.LinkedHashMap[String, String]()
    for (doc <- samples; (field, cls) <- doc) acc.get(field) match {
      case None => acc(field) = cls
      case Some(prev) if prev != cls =>
        throw new IllegalStateException(
          s"CONFLICTING TYPES FOR FIELD '$field': $prev vs $cls — " +
            "use top-level-string mode")
      case _ =>
    }
    if (acc.isEmpty)
      throw new IllegalStateException(
        "CANNOT INFER SCHEMA FROM EMPTY COLLECTION")
    StructType(acc.toSeq.map { case (f, cls) =>
      StructField(Sanitizer(f), mongoClassToSpark(cls), nullable = true)
    })
  }
}
