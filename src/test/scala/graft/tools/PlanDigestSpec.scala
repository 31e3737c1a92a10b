package graft.tools

import java.nio.file.{Files, Paths}
import graft.SparkSpec

/** Plan-fingerprint regression guard: the headline queries' physical
  * plans must keep the operator-kind counts committed in
  * PLAN_DIGESTS.json — a change that un-broadcasts a join, adds a
  * shuffle, or drops codegen fails here loudly. After an INTENTIONAL
  * plan change, regenerate: sbt "runMain graft.tools.PlanDigest".
  */
class PlanDigestSpec extends SparkSpec {

  test("headline physical plans match committed fingerprints") {
    val path = Paths.get(PlanDigest.digestFile)
    assert(Files.exists(path),
      s"${PlanDigest.digestFile} missing — run: sbt \"runMain graft.tools.PlanDigest\"")
    val text = Files.readString(path)
    val entry = """"([\w]+)":\s*\{([^}]*)\}""".r
    val field = """"([\w]+)":(\d+)""".r
    val committed = entry.findAllMatchIn(text).map { m =>
      m.group(1) -> field.findAllMatchIn(m.group(2))
        .map(f => f.group(1) -> f.group(2).toInt).toMap
    }.toMap

    val sf = "/root/testdata/sf0.01"
    val diffs = PlanDigest.headline.flatMap { n =>
      val now = PlanDigest.digestFor(spark, sf, n)
      committed.get(n) match {
        case None =>
          Seq(s"$n: not in ${PlanDigest.digestFile} (regenerate)")
        case Some(exp) =>
          (exp.keySet ++ now.keySet).toSeq.sorted.collect {
            case k if exp.getOrElse(k, 0) != now.getOrElse(k, 0) =>
              s"$n.$k: committed ${exp.getOrElse(k, 0)} vs current ${now.getOrElse(k, 0)}"
          }
      }
    }
    assert(diffs.isEmpty,
      "physical-plan regression (or intentional change — then regenerate " +
        s"via: sbt \"runMain graft.tools.PlanDigest\"):\n${diffs.mkString("\n")}")
  }
}
