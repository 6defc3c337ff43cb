package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{TableRegistry, TableSpec}
import graft.schema.{JdbcRegistry, TypeMapping}

/** The live-deployment registry seam (`MySQLStreamer.java:334-457`):
  * a mocked 2-database / 3-table metadata walk must build the same
  * registry the reference's JDBC walk would — wildcard expansion,
  * specific-table filtering, the no-entries fallback, TYPE_NAME
  * collapse, name maps and sanitization.
  */
class JdbcRegistrySpec extends AnyFunSuite {

  /** Fixture stand-in for java.sql.DatabaseMetaData. */
  private val meta = new JdbcRegistry.MetadataProvider {
    private val dbs: Map[String, Map[String, Seq[(String, String)]]] = Map(
      "shop-db" -> Map(
        "users" -> Seq("id" -> "BIGINT", "user-name" -> "VARCHAR",
          "balance" -> "DECIMAL(10,2)", "active" -> "BOOL"),
        "orders" -> Seq("id" -> "INT UNSIGNED", "placed_at" -> "TIMESTAMP(6)",
          "qty" -> "SMALLINT")),
      "analytics" -> Map(
        "clicks" -> Seq("click_id" -> "BIGINT", "ua" -> "TEXT"),
        "ignored_tbl" -> Seq("x" -> "INT")))
    def tables(db: String): Seq[String] = dbs(db).keys.toSeq.sorted
    def columns(db: String, table: String): Seq[(String, String)] =
      dbs(db)(table)
  }

  test("wildcard walks all tables; specific entries filter; types collapse") {
    val reg = JdbcRegistry.build(meta,
      databases = Seq("shop-db", "analytics"),
      tableFilter = Seq("shop-db.*", "analytics.clicks"),
      dbNameMap = Map("shop-db" -> "shop"),
      tableNameMap = Map("shop-db.orders" -> "orders-v2"))

    // the registry a reference deployment would declare by hand for
    // the same sources (name maps applied, names sanitized by routed)
    val expected = TableRegistry(
      Seq(
        TableSpec("shop-db", "orders", StructType(Seq(
          StructField("id", LongType),      // INT UNSIGNED widens
          StructField("placed_at", StringType), // timestamps string by policy
          StructField("qty", IntegerType)))),
        TableSpec("shop-db", "users", StructType(Seq(
          StructField("id", LongType),
          StructField("user_name", StringType), // column name sanitized
          StructField("balance", StringType),   // decimal string by policy
          StructField("active", BooleanType)))),
        TableSpec("analytics", "clicks", StructType(Seq(
          StructField("click_id", LongType),
          StructField("ua", StringType))))),
      dbNameMap = Map("shop-db" -> "shop"),
      tableNameMap = Map("shop-db.orders" -> "orders-v2"))

    assert(reg.routed == expected.routed)
    // routing keys are SANITIZED originals; sink identity is renamed
    assert(reg.keys == Set("shop_db.users", "shop_db.orders",
      "analytics.clicks"))
    val orders = reg.routed("shop_db.orders")
    assert(orders.db == "shop" && orders.table == "orders_v2")
    assert(orders.sinkDir("/sink", "src1") == "/sink/src1_shop__orders_v2")
  }

  test("no filter entries for a database falls back to all its tables") {
    val reg = JdbcRegistry.build(meta,
      databases = Seq("analytics"), tableFilter = Seq("shop-db.users"))
    assert(reg.keys == Set("analytics.clicks", "analytics.ignored_tbl"))
  }

  test("wildcard wins over specific entries for the same database") {
    val reg = JdbcRegistry.build(meta,
      databases = Seq("shop-db"),
      tableFilter = Seq("shop-db.users", "shop-db.*"))
    assert(reg.keys == Set("shop_db.users", "shop_db.orders"))
  }

  test("oracle flag routes through the oracle type collapse") {
    val reg = JdbcRegistry.build(meta, databases = Seq("analytics"),
      tableFilter = Seq("analytics.clicks"), oracle = true)
    val schema = reg.routed("analytics.clicks").schema
    assert(schema == StructType(Seq(
      StructField("click_id", StringType), // oracle: non-boolean → string
      StructField("ua", StringType))))
  }

  test("a typo'd specific table entry fails fast, not an empty schema") {
    val e = intercept[IllegalArgumentException] {
      JdbcRegistry.build(meta, databases = Seq("analytics"),
        tableFilter = Seq("analytics.clickz"))
    }
    assert(e.getMessage.contains("clickz") &&
      e.getMessage.contains("clicks"))
  }

  test("adapter shape matches java.sql.DatabaseMetaData contract") {
    // compile-time check that the adapter accepts the real interface
    val f: java.sql.DatabaseMetaData => JdbcRegistry.MetadataProvider =
      JdbcRegistry.fromDatabaseMetaData(_)
    assert(f != null)
  }
}
