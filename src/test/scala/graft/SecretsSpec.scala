package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{JobConfig, Secrets}

/** The `${secret:NAME}` credential seam: provider chain, precedence,
  * fail-fast on unresolvable names, and the JobConfig.load
  * wire-through.
  */
class SecretsSpec extends AnyFunSuite {

  private val env = Secrets.EnvProvider(
    Map("DB_PASS" -> "envpass", "TOKEN" -> "tok").get)

  test("references resolve through the chain; plain values untouched") {
    val out = Secrets.resolve(Map(
      "snapshot.jdbc.password" -> "${secret:DB_PASS}",
      "source.id" -> "src1",
      "url" -> "jdbc:mysql://u:${secret:DB_PASS}@h/db?t=${secret:TOKEN}"),
      Seq(env))
    assert(out("snapshot.jdbc.password") == "envpass")
    assert(out("source.id") == "src1")
    assert(out("url") == "jdbc:mysql://u:envpass@h/db?t=tok")
  }

  test("declared secrets file wins over ambient env") {
    val f = Files.createTempFile("graft-secrets-", ".json")
    Files.write(f, """{"DB_PASS": "filepass"}""".getBytes)
    val cfg = Map("secrets.file" -> f.toString,
      "pw" -> "${secret:DB_PASS}", "tk" -> "${secret:TOKEN}")
    val out = Secrets.resolve(cfg,
      Secrets.FileProvider(f.toString) +: Seq(env))
    assert(out("pw") == "filepass") // file first
    assert(out("tk") == "tok") // falls through to env
  }

  test("unresolvable reference fails naming key and name, never a value") {
    val e = intercept[IllegalArgumentException] {
      Secrets.resolve(Map("pw" -> "${secret:NOPE}"), Seq(env))
    }
    assert(e.getMessage.contains("NOPE") && e.getMessage.contains("'pw'"))
    assert(!e.getMessage.contains("envpass"))
  }

  test("special characters in secret values survive substitution") {
    val dollar = Secrets.EnvProvider(Map("S" -> """p$1\q""").get)
    assert(Secrets.resolve(Map("k" -> "${secret:S}"), Seq(dollar))("k")
      == """p$1\q""")
  }

  test("JobConfig.load resolves references via the configured file") {
    val sf = Files.createTempFile("graft-secrets-", ".json")
    Files.write(sf, """{"SINK_KEY": "s3secret"}""".getBytes)
    val cf = Files.createTempFile("graft-cfg-", ".json")
    Files.write(cf, (s"""{"source.id": "s1", "source.type": "mysql", """ +
      s""""sink.path": "/tmp/x", "secrets.file": "$sf", """ +
      s""""sink.credential": "$${secret:SINK_KEY}"}""").getBytes)
    val cfg = JobConfig.load(cf.toString)
    assert(cfg("sink.credential") == "s3secret")
    assert(cfg("secrets.file") == sf.toString) // itself never substituted
  }
}
