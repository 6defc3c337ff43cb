package graft

import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DdlEvolution
import graft.streaming.CdcJob

/** Generative round-trip for the runbook loop's riskiest seam: raw
  * config spellings vs sanitized route keys. For ANY db/table names
  * (dashes, dots-in-db excluded by the key grammar, mixed case,
  * underscores), a proposal produced against the registry built from
  * a config must `applyProposal` back into a config that loads clean
  * AND actually applies: the routed spec carries the dated table name
  * (the rename cannot silently miss — the round-9 fix this spec
  * guards) and, when the ALTER was mechanical, the evolved schema.
  */
class ApplyProposalFuzzSpec extends AnyFunSuite {
  import org.scalacheck.{Gen, Prop, Test => SCTest}

  private def passes(p: Prop, min: Int = 200): Unit =
    assert(SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(min), p).passed)

  // config keys split db.table on the FIRST dot, so the db part is
  // dot-free; both parts exercise the sanitizer (dash → underscore)
  private val namePart: Gen[String] = for {
    head <- Gen.alphaChar
    tail <- Gen.listOfN(6, Gen.frequency(
      4 -> Gen.alphaNumChar, 1 -> Gen.const('-'), 1 -> Gen.const('_')))
  } yield (head :: tail).mkString

  private val ts = 1700000002000L // 2023-11-14 UTC

  test("proposal → applyProposal → configFromMap always applies the " +
      "dated rename and evolved schema, for any raw spelling") {
    passes(Prop.forAll(namePart, namePart) { (db, tbl) =>
      val rawKey = s"$db.$tbl"
      val v1 = Map(
        "source.id" -> "s", "source.type" -> "mysql",
        "sink.path" -> "SINK",
        "table.schemas" -> s"""{"$rawKey": "id:INT,name:VARCHAR(50)"}""")
      val registry = CdcJob.registryFromConfig(v1)
      val proposal = DdlEvolution.propose(registry, db, tbl,
        s"ALTER TABLE $tbl ADD COLUMN age INT", ts)
      proposal match {
        case None => Prop.falsified :| s"no proposal for $rawKey"
        case Some(p) =>
          val v2 = CdcJob.registryFromConfig(
            DdlEvolution.applyProposal(v1, p))
          val routeKey = registry.routed.keySet.head
          val spec = v2.routed(routeKey)
          val sanitizedTbl = graft.schema.Sanitizer(tbl)
          (spec.table == s"${sanitizedTbl}_v20231114") :|
            s"rename missed: ${spec.table}" &&
            (spec.schema.fieldNames.toSeq ==
              Seq("id", "name", "age")) :| s"schema: ${spec.schema}"
      }
    })
  }
}
