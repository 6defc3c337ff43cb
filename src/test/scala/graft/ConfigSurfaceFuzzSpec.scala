package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.schema.TypeMapping
import graft.streaming.{Secrets, SnapshotOverride, SnapshotOverrides}

/** Generative coverage for the three config-surface parsers round 7
  * leans on: the snapshot-override SELECT grammar
  * (`MySQLStreamer.java:130-152` semantics), `${secret:NAME}`
  * resolution, and the shared top-level comma splitter. CdcJobSpec /
  * SecretsSpec pin the documented cases; these properties sweep the
  * value space — keyword case, whitespace, quoted/parenthesized
  * predicate text, regex-special secret values — where a regex-based
  * parser typically cracks.
  */
class ConfigSurfaceFuzzSpec extends AnyFunSuite {
  import org.scalacheck.{Gen, Prop, Test => SCTest}

  private def passes(p: Prop, min: Int = 300): Unit =
    assert(SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(min), p).passed)

  // ---- snapshot-override SELECT grammar ----

  private val genWs = Gen.oneOf(" ", "  ", "\n", "\t ", " \n ")
  private val genColName = for {
    h <- Gen.alphaLowerChar
    t <- Gen.choose(0, 8).flatMap(n => Gen.listOfN(n,
      Gen.frequency(8 -> Gen.alphaNumChar, 1 -> Gen.const('_'))))
    up <- Gen.oneOf(true, false)
  } yield { val s = (h +: t).mkString; if (up) s.toUpperCase else s }

  /** Predicate text from a small grammar: comparisons, quoted
    * strings, IN-lists (top-level commas inside parens), AND/OR.
    */
  private val genAtom: Gen[String] = Gen.oneOf(
    for { c <- genColName; op <- Gen.oneOf(">", "<", ">=", "=", "<>")
          v <- Gen.choose(-1000, 1000) } yield s"$c $op $v",
    for { c <- genColName; s <- Gen.identifier } yield s"$c = '$s'",
    for { c <- genColName; n <- Gen.choose(2, 4)
          vs <- Gen.listOfN(n, Gen.choose(0, 99)) }
      yield s"$c IN (${vs.mkString(", ")})",
    genColName.map(c => s"$c IS NOT NULL"))
  private val genPred: Gen[String] = for {
    n <- Gen.choose(1, 3)
    atoms <- Gen.listOfN(n, genAtom)
    joins <- Gen.listOfN(n - 1, Gen.oneOf("AND", "OR", "and"))
    wrap <- Gen.oneOf(true, false)
  } yield {
    val body = atoms.head +: joins.zip(atoms.tail)
      .map { case (j, a) => s"$j $a" }
    val s = body.mkString(" ")
    if (wrap) s"($s)" else s
  }

  private def cased(kw: String): Gen[String] =
    Gen.oneOf(kw, kw.toLowerCase, kw.head + kw.tail.toLowerCase)

  /** Through the PUBLIC config path (list key + per-table key). */
  private def parse(table: String, sql: String): SnapshotOverride =
    SnapshotOverrides.fromConfig(Map(
      "snapshot.select.statement.overrides" -> table,
      s"snapshot.select.statement.overrides.$table" -> sql))(table)

  test("valid override statements parse to the exact model") {
    val gen = for {
      db <- Gen.oneOf("db1", "app-db", "sales")
      tbl <- Gen.oneOf("users", "orders", "line_items")
      bareFrom <- Gen.oneOf(true, false)
      selKw <- cased("SELECT"); fromKw <- cased("FROM")
      whereKw <- cased("WHERE")
      cols <- Gen.oneOf[Option[List[String]]](
        Gen.const(None),
        Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, genColName))
          .map(cs => Some(cs.distinct)))
      pred <- Gen.option(genPred)
      w1 <- genWs; w2 <- genWs; w3 <- genWs
      semi <- Gen.oneOf("", ";", " ;")
    } yield {
      val key = s"$db.$tbl"
      val selList = cols.map(_.mkString(", ")).getOrElse("*")
      val from = if (bareFrom) tbl else key
      val whereStr = pred.map(p => s"$w2$whereKw$w1$p").getOrElse("")
      (key, cols, pred,
        s"$selKw$w1$selList$w2$fromKw$w1$from$whereStr$w3$semi")
    }
    passes(Prop.forAll(gen) { case (key, cols, pred, sql) =>
      val ov = parse(key, sql)
      ov.table == key &&
        ov.selectCols == cols.map(_.map(_.toLowerCase).toSet) &&
        ov.where == pred &&
        ov.statement == sql.trim.stripSuffix(";") &&
        SnapshotOverrides.asJdbcSubquery(key, sql) ==
          s"(${sql.trim.stripSuffix(";")}) graft_snapshot_override"
    })
  }

  test("a statement reading another table is rejected, naming both") {
    passes(Prop.forAll(Gen.oneOf("users", "orders"),
        Gen.oneOf("other", "db2.users2")) { (tbl, wrong) =>
      val e = intercept[IllegalArgumentException] {
        parse(s"db1.$tbl", s"SELECT * FROM $wrong WHERE id > 0")
      }
      e.getMessage.contains("SELECTS FROM")
    }, min = 20)
  }

  test("non-grammar statements are UNPARSEABLE, never silent") {
    val invalid = Seq(
      "INSERT INTO t VALUES (1)",
      "SELECT a, b FROM t JOIN u ON a = b",
      "SELECT a FROM t WHERE",          // empty predicate
      "SELECT a FROM t alias",          // table alias
      "SELECT * FROM t LIMIT 10",
      "DELETE FROM t",
      "SELECT a FROM")                  // no table
    for (sql <- invalid) {
      val e = intercept[IllegalArgumentException] {
        parse("db1.t", sql)
      }
      assert(e.getMessage.contains("UNPARSEABLE"), sql)
    }
    // the empty statement hits the reference's ensureNotEmpty gate
    // (a distinct, earlier error than the grammar)
    val e = intercept[IllegalArgumentException] { parse("db1.t", " ") }
    assert(e.getMessage.contains("EMPTY OVERRIDE STATEMENT"))
  }

  // ---- ${secret:NAME} resolution ----

  private val genSecretName = for {
    h <- Gen.alphaUpperChar
    t <- Gen.choose(0, 6).flatMap(n => Gen.listOfN(n,
      Gen.frequency(9 -> Gen.alphaNumChar, 1 -> Gen.const('_'))))
  } yield (h +: t).mkString

  /** Secret values that break naive regex replacement: `$1`, `\`,
    * braces, and text that LOOKS like another reference.
    */
  private val genSecretValue = Gen.oneOf(
    Gen.identifier,
    Gen.const("pa$$w0rd$1"),
    Gen.const("""back\slash\$"""),
    Gen.const("{curly}${not:aref}"),
    Gen.const("${secret:LOOKS_LIKE_A_REF}"),
    Gen.const(""))

  test("every reference resolves, values substitute literally, and " +
      "lookalike text inside a secret value is never re-resolved") {
    val gen = for {
      n <- Gen.choose(1, 4)
      names <- Gen.listOfN(n, genSecretName).map(_.distinct)
      vals <- Gen.listOfN(names.size, genSecretValue)
      prefix <- Gen.identifier; suffix <- Gen.identifier
    } yield (names.zip(vals).toMap, prefix, suffix)
    passes(Prop.forAll(gen) { case (secrets, prefix, suffix) =>
      val provider = new Secrets.SecretProvider {
        def get(name: String): Option[String] = secrets.get(name)
      }
      val cfg = secrets.keys.zipWithIndex.map { case (name, i) =>
        s"key$i" -> s"$prefix${"${secret:" + name + "}"}$suffix"
      }.toMap
      val out = Secrets.resolve(cfg, Seq(provider))
      secrets.keys.zipWithIndex.forall { case (name, i) =>
        out(s"key$i") == s"$prefix${secrets(name)}$suffix"
      }
    })
  }

  test("provider order is first-wins and misses fail naming key and " +
      "secret only") {
    val a = new Secrets.SecretProvider {
      def get(n: String) = if (n == "BOTH") Some("fromA") else None
    }
    val b = new Secrets.SecretProvider {
      def get(n: String) =
        if (n == "BOTH") Some("fromB") else if (n == "ONLY_B") Some("vb")
        else None
    }
    val out = Secrets.resolve(
      Map("x" -> "${secret:BOTH}", "y" -> "${secret:ONLY_B}"), Seq(a, b))
    assert(out("x") == "fromA" && out("y") == "vb")
    val e = intercept[IllegalArgumentException] {
      Secrets.resolve(Map("jdbc.password" -> "${secret:GONE}"), Seq(a, b))
    }
    assert(e.getMessage.contains("GONE") &&
      e.getMessage.contains("jdbc.password") &&
      !e.getMessage.contains("fromA"))
  }

  // ---- shared top-level comma splitter ----

  /** A chunk: letters/spaces plus balanced paren groups that may
    * contain commas — the `DECIMAL(10,2)` shape at any nesting.
    */
  private def genChunk(depth: Int): Gen[String] = {
    val flat = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n,
      Gen.frequency(8 -> Gen.alphaNumChar, 1 -> Gen.const(' '),
        1 -> Gen.const(':')))).map(_.mkString)
    if (depth <= 0) flat
    else Gen.frequency(
      3 -> flat,
      1 -> (for {
        pre <- flat
        inner <- Gen.choose(1, 3).flatMap(n =>
          Gen.listOfN(n, genChunk(depth - 1))).map(_.mkString(","))
      } yield s"$pre($inner)"))
  }

  test("splitTopLevel is the exact inverse of a comma join") {
    val gen = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, genChunk(3)))
    passes(Prop.forAll(gen) { chunks =>
      TypeMapping.splitTopLevel(chunks.mkString(",")) == chunks
    }, min = 500)
  }

  test("nested parens shield commas at every depth") {
    assert(TypeMapping.splitTopLevel("a:DECIMAL(10,2),b:f(g(1,2),3),c")
      == Seq("a:DECIMAL(10,2)", "b:f(g(1,2),3)", "c"))
    assert(TypeMapping.splitTopLevel("") == Seq.empty)
    assert(TypeMapping.splitTopLevel("one") == Seq("one"))
  }
}
