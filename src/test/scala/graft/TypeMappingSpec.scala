package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}

import graft.ops.MongoExtJson
import graft.schema.{Sanitizer, TypeMapping}

/** §1.3 type-collapse table + sanitizer + Mongo inference + extended
  * JSON unwrap (FIXTURES.md §A.3) — pure, no Spark session.
  */
class TypeMappingSpec extends AnyFunSuite {

  test("MySQL/PG type table (AVROUtils.java:54-103)") {
    val cases = Seq(
      "TINYINT" -> IntegerType, "SMALLINT" -> IntegerType,
      "MEDIUMINT" -> IntegerType, "INT2" -> IntegerType,
      "YEAR" -> IntegerType, "DATE" -> IntegerType,
      "INT" -> IntegerType, "INTEGER" -> IntegerType, "INT4" -> IntegerType,
      "INT UNSIGNED" -> LongType,
      "BIGINT" -> LongType, "INT8" -> LongType,
      "DATETIME" -> LongType, "TIME" -> LongType,
      "FLOAT" -> DoubleType, "REAL" -> DoubleType, "DOUBLE" -> DoubleType,
      "BIT" -> BooleanType, "BOOL" -> BooleanType, "BOOLEAN" -> BooleanType,
      "VARCHAR" -> StringType, "CHAR" -> StringType, "TEXT" -> StringType,
      "DECIMAL" -> StringType,   // decimals are strings by policy
      "TIMESTAMP" -> StringType, // timestamps are strings by policy
      "GEOMETRY" -> StringType)  // unknown → string
    for ((n, t) <- cases) assert(TypeMapping.jdbcToSpark(n) == t, n)
  }

  test("arbitrary type strings never throw (property)") {
    val prop = forAll(Gen.asciiPrintableStr) { s =>
      TypeMapping.jdbcToSpark(s) != null &&
        TypeMapping.oracleToSpark(s) != null
    }
    assert(check(Parameters.default.withMinSuccessfulTests(200), prop).passed)
  }

  test("Oracle collapses everything non-boolean to string") {
    for (n <- Seq("NUMBER", "VARCHAR2", "DATE", "TIMESTAMP(6)", "CLOB",
      "BINARY_DOUBLE"))
      assert(TypeMapping.oracleToSpark(n) == StringType, n)
    assert(TypeMapping.oracleToSpark("BOOLEAN") == BooleanType)
  }

  test("Mongo class map (AVROUtils.java:29-52)") {
    assert(TypeMapping.mongoClassToSpark("Integer") == IntegerType)
    assert(TypeMapping.mongoClassToSpark("Long") == LongType)
    assert(TypeMapping.mongoClassToSpark("Double") == DoubleType)
    assert(TypeMapping.mongoClassToSpark("Boolean") == BooleanType)
    for (c <- Seq("ObjectId", "String", "Document", "JSONObject",
      "JSONArray", "Whatever"))
      assert(TypeMapping.mongoClassToSpark(c) == StringType, c)
  }

  test("sanitizer: - and . become _ (Sanitizer.java:4-8)") {
    assert(Sanitizer("my-db.my-table") == "my_db_my_table")
    assert(Sanitizer("clean") == "clean")
  }

  test("registry routes hyphenated names by their SANITIZED form") {
    import org.apache.spark.sql.types._
    import graft.model.{TableRegistry, TableSpec}
    // envelopes carry sanitized _db/_tbl (FIXTURES §A.1): a config key
    // "my-db.user-events" must be reachable as "my_db.user_events"
    val reg = TableRegistry(
      Seq(TableSpec("my-db", "user-events",
        StructType(Seq(StructField("id", IntegerType))))),
      tableNameMap = Map("my-db.user-events" -> "events_v2"))
    assert(reg.routed.keySet == Set("my_db.user_events"))
    val spec = reg.routed("my_db.user_events")
    assert(spec.table == "events_v2") // renamed via ORIGINAL-name key
    assert(spec.db == "my_db")
    assert(spec.sinkDir("/s", "src") == "/s/src_my_db__events_v2")
  }

  test("Mongo sampling: first class wins, conflict is a hard error") {
    val s = TypeMapping.inferFromSamples(Seq(
      Map("_id" -> "ObjectId", "n" -> "Integer"),
      Map("_id" -> "ObjectId", "n" -> "Integer", "extra" -> "String")))
    assert(s.fieldNames.toSeq == Seq("_id", "n", "extra"))
    assert(s("n").dataType == IntegerType)
    val e = intercept[IllegalStateException] {
      TypeMapping.inferFromSamples(Seq(Map("n" -> "Integer"),
        Map("n" -> "Double")))
    }
    assert(e.getMessage.contains("CONFLICTING TYPES"))
    intercept[IllegalStateException] {
      TypeMapping.inferFromSamples(Seq.empty)
    }
  }

  test("extended-JSON unwrap (MongoDBDebeziumToJSONDeserializer.java:112-172)") {
    assert(MongoExtJson.unwrap("""{"$numberLong": "152"}""") == "152")
    assert(MongoExtJson.unwrap("""{"$numberDouble": "1.5"}""") == "1.5")
    assert(MongoExtJson.unwrap("""{"$numberDecimal": "10.99"}""") == "10.99")
    assert(MongoExtJson.unwrap("""{"$date": 1700000000000}""")
      == "1700000000000")
    assert(MongoExtJson.unwrap("""{"$oid": "65a1b2c3"}""") == "\"65a1b2c3\"")
    assert(MongoExtJson.unwrap("""plain""") == "plain")
    assert(MongoExtJson.unwrap(null) == null)
    assert(MongoExtJson.normalizeId("""{"$oid": "65a1b2c3"}""") == "65a1b2c3")
    assert(MongoExtJson.normalizeId("42") == "42")
  }
}
