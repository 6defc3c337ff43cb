package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DdlEvolution

/** Generative coverage for the mechanical ALTER subset
  * (`ops.DdlEvolution.evolveSchema`) — DdlEvolutionSpec pins the
  * documented cases; this spec drives randomized clause CHAINS
  * against an independent model: random base schemas, random
  * ADD/DROP/MODIFY/CHANGE/RENAME sequences with parenthesized types
  * (`DECIMAL(10,2)` commas crossing the clause splitter), UNSIGNED
  * widening, backquoted dashed names through the sanitizer, random
  * keyword case/whitespace/`COLUMN` noise — and the fail-closed
  * contract: ONE out-of-subset or schema-inconsistent clause anywhere
  * in the chain must collapse the whole proposal to None.
  */
class DdlEvolutionFuzzSpec extends AnyFunSuite {
  import org.scalacheck.{Gen, Prop, Test => SCTest}

  private def passes(p: Prop, min: Int = 300): Unit =
    assert(SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(min), p).passed)

  // ---- model: one op = rendered clause text + its expected effect ----

  /** (rendered type spec, the §1.3 type it must collapse to). */
  private val typeSpecs: Seq[(String, DataType)] = Seq(
    "INT" -> IntegerType,
    "int(11)" -> IntegerType,
    "INT UNSIGNED" -> LongType,
    "INT(10) UNSIGNED" -> LongType,
    "TINYINT(1)" -> IntegerType,
    "BIGINT" -> LongType,
    "BIGINT(20) UNSIGNED" -> LongType,
    "DECIMAL(10,2)" -> StringType, // decimal = string BY POLICY (§1.3)
    "DECIMAL(10,2) NOT NULL" -> StringType,
    "VARCHAR(255)" -> StringType,
    "varchar(64) DEFAULT 'x'" -> StringType,
    "TIMESTAMP(6)" -> StringType, // timestamp = string BY POLICY
    "DOUBLE" -> DoubleType,
    "FLOAT(7,4)" -> DoubleType,
    "BIT(1)" -> BooleanType,
    "DATETIME" -> LongType)

  /** Pool of column names, distinct AFTER sanitization; dashed ones
    * must be rendered backquoted (bare `a-b` is not an identifier).
    */
  private val namePool: Seq[String] =
    (1 to 12).map(i => s"c$i") ++ Seq("c13-d", "c14-d", "with-dash")
  private def sanitized(n: String): String = n.replace('-', '_')
  private def render(n: String): String =
    if (n.contains('-')) s"`$n`" else n

  private sealed trait Op {
    /** `kw` cases the KEYWORDS only — names/types keep their case. */
    def clause(colKw: String, kw: String => String): String
    /** Model application; None = the op is invalid against `cols`. */
    def apply(cols: Seq[(String, DataType)]): Option[Seq[(String, DataType)]]
  }
  private case class Add(name: String, spec: (String, DataType)) extends Op {
    def clause(colKw: String, kw: String => String) =
      s"${kw(s"ADD $colKw")}${render(name)} ${spec._1}"
    def apply(cols: Seq[(String, DataType)]) =
      if (cols.exists(_._1 == sanitized(name))) None
      else Some(cols :+ (sanitized(name) -> spec._2))
  }
  private case class Drop(name: String) extends Op {
    def clause(colKw: String, kw: String => String) =
      s"${kw(s"DROP $colKw")}${render(name)}"
    def apply(cols: Seq[(String, DataType)]) =
      if (!cols.exists(_._1 == sanitized(name))) None
      else Some(cols.filterNot(_._1 == sanitized(name)))
  }
  private case class Modify(name: String, spec: (String, DataType))
      extends Op {
    def clause(colKw: String, kw: String => String) =
      s"${kw(s"MODIFY $colKw")}${render(name)} ${spec._1}"
    def apply(cols: Seq[(String, DataType)]) =
      if (!cols.exists(_._1 == sanitized(name))) None
      else Some(cols.map { case (n, t) =>
        if (n == sanitized(name)) (n, spec._2) else (n, t) })
  }
  private case class Change(old: String, nw: String,
      spec: (String, DataType)) extends Op {
    def clause(colKw: String, kw: String => String) =
      s"${kw(s"CHANGE $colKw")}${render(old)} ${render(nw)} ${spec._1}"
    def apply(cols: Seq[(String, DataType)]) =
      if (!cols.exists(_._1 == sanitized(old))) None
      else Some(cols.map { case (n, t) =>
        if (n == sanitized(old)) (sanitized(nw), spec._2) else (n, t) })
  }
  private case class Rename(old: String, nw: String) extends Op {
    def clause(colKw: String, kw: String => String) =
      s"${kw("RENAME COLUMN ")}${render(old)}${kw(" TO ")}${render(nw)}"
    def apply(cols: Seq[(String, DataType)]) =
      if (!cols.exists(_._1 == sanitized(old))) None
      else Some(cols.map { case (n, t) =>
        if (n == sanitized(old)) (sanitized(nw), t) else (n, t) })
  }

  // ---- generators ----

  private val genBase: Gen[Seq[(String, DataType)]] = for {
    n <- Gen.choose(2, 6)
    names <- Gen.pick(n, namePool)
    types <- Gen.listOfN(n, Gen.oneOf(IntegerType, LongType, DoubleType,
      BooleanType, StringType))
  } yield names.map(sanitized).zip(types).toSeq

  /** One VALID op against the current model state. */
  private def genOp(cols: Seq[(String, DataType)]): Gen[Op] = {
    val present = cols.map(_._1)
    val absent = namePool.filterNot(n => present.contains(sanitized(n)))
    val mods = if (present.isEmpty) Seq.empty[Gen[Op]] else Seq(
      for { c <- Gen.oneOf(present); s <- Gen.oneOf(typeSpecs) }
        yield Modify(c, s),
      Gen.oneOf(present).map(Drop(_)))
    val renames = if (present.isEmpty || absent.isEmpty) Seq.empty[Gen[Op]]
      else Seq(
        for { o <- Gen.oneOf(present); n <- Gen.oneOf(absent)
              s <- Gen.oneOf(typeSpecs) } yield Change(o, n, s),
        for { o <- Gen.oneOf(present); n <- Gen.oneOf(absent) }
          yield Rename(o, n))
    val adds = if (absent.isEmpty) Seq.empty[Gen[Op]] else Seq(
      for { n <- Gen.oneOf(absent); s <- Gen.oneOf(typeSpecs) }
        yield Add(n, s))
    val all = mods ++ renames ++ adds
    Gen.choose(0, all.size - 1).flatMap(all(_))
  }

  /** A chain of 1-5 ops, each valid against the state the previous
    * ones produce (mirroring evolveSchema's foldLeft).
    */
  private def genChain(cols: Seq[(String, DataType)], n: Int)
      : Gen[(Seq[Op], Seq[(String, DataType)])] =
    if (n == 0) Gen.const((Nil, cols))
    else genOp(cols).flatMap { op =>
      op.apply(cols) match {
        case None => Gen.const((Nil, cols)) // dead end: stop the chain
        case Some(next) =>
          genChain(next, n - 1).map { case (ops, fin) => (op +: ops, fin) }
      }
    }

  private val genCase = for {
    base <- genBase
    n <- Gen.choose(1, 5)
    chain <- genChain(base, n)
    colKw <- Gen.oneOf("", "COLUMN ")
    sep <- Gen.oneOf(", ", " ,  ", ",\n  ")
    caser <- Gen.oneOf[String => String](identity[String] _,
      (s: String) => s.toLowerCase, (s: String) => s.toUpperCase)
    semi <- Gen.oneOf("", ";")
  } yield (base, chain._1, chain._2, colKw, sep, caser, semi)

  private def schemaOf(cols: Seq[(String, DataType)]): StructType =
    StructType(cols.map { case (n, t) => StructField(n, t, nullable = true) })

  private def renderDdl(ops: Seq[Op], colKw: String, sep: String,
      caser: String => String, semi: String): String = {
    // keyword-only casing: names and type specs must keep their case
    // (an uppercased backquoted name would sanitize to a different
    // column than the model expects)
    val body = ops.map(_.clause(colKw, caser)).mkString(sep)
    caser("ALTER TABLE ") + "t " + body + semi
  }

  // ---- properties ----

  test("valid mechanical chains evolve exactly like the model") {
    passes(Prop.forAll(genCase) {
      case (base, ops, expected, colKw, sep, caser, semi) =>
        ops.isEmpty || {
          val ddl = renderDdl(ops, colKw, sep, caser, semi)
          DdlEvolution.evolveSchema(schemaOf(base), ddl)
            .contains(schemaOf(expected))
        }
    })
  }

  test("one invalid clause anywhere fails the whole chain closed") {
    val poison = Seq(
      "ADD PRIMARY KEY (c1)", // index op, not a column
      "ADD UNIQUE KEY uk (c1)",
      "DROP PARTITION p0",
      "ADD CONSTRAINT fk FOREIGN KEY (c1) REFERENCES o (id)",
      "ALGORITHM=INPLACE", // engine clause outside the subset
      "DROP no_such_column", // schema-inconsistent
      "ADD COLUMN (a INT, b INT)") // multi-column paren form
    passes(Prop.forAll(genCase, Gen.oneOf(poison),
        Gen.choose(0, 5)) {
      case ((base, ops, _, colKw, sep, _, semi), bad, at) =>
        val clauses = ops.map(_.clause(colKw, identity))
        val idx = math.min(at, clauses.length)
        val body = (clauses.take(idx) ++ Seq(bad) ++ clauses.drop(idx))
          .mkString(sep)
        DdlEvolution.evolveSchema(schemaOf(base),
          s"ALTER TABLE t $body$semi").isEmpty
    }, min = 300)
  }

  test("adding an existing column or renaming from a missing one fails " +
      "closed") {
    passes(Prop.forAll(genBase) { base =>
      val existing = base.head._1
      val s = schemaOf(base)
      DdlEvolution.evolveSchema(s, s"ALTER TABLE t ADD $existing INT")
        .isEmpty &&
      DdlEvolution.evolveSchema(s,
        s"ALTER TABLE t RENAME COLUMN ghost TO $existing").isEmpty &&
      DdlEvolution.evolveSchema(s, s"ALTER TABLE t MODIFY ghost INT")
        .isEmpty
    }, min = 100)
  }

  test("non-ALTER statements never evolve") {
    val stmts = Seq("DROP TABLE t", "CREATE TABLE t (a INT)",
      "TRUNCATE TABLE t", "RENAME TABLE t TO u", "")
    for (s <- stmts)
      assert(DdlEvolution.evolveSchema(
        StructType(Seq(StructField("a", IntegerType))), s).isEmpty, s)
  }
}
