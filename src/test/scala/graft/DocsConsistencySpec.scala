package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guard for the recurring stale-README-count nit (round-13 and
  * round-14 verdicts both flagged one): the machine-checkable count —
  * registered queries — is pinned against [[Registry.all]], and the
  * Running section is asserted to carry NO hardcoded test/suite count
  * at all (that duplicated number is exactly what drifted twice; the
  * single source of truth is the Current state paragraph, refreshed at
  * round close).
  */
class DocsConsistencySpec extends AnyFunSuite {

  private def readme: String = {
    val f = new java.io.File("README.md")
    assert(f.exists(), s"README.md not found from ${new java.io.File(".").getAbsolutePath}")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.mkString finally src.close()
  }

  test("README: registered-query count matches Registry.all.size; the " +
      "Running section carries no duplicate hardcoded counts") {
    val txt = readme
    val m = raw"(\d+) registered queries".r.findFirstMatchIn(txt)
    assert(m.isDefined, "README must state the registered-query count")
    assert(m.get.group(1).toInt === Registry.all.size,
      s"README says ${m.get.group(1)} registered queries but Registry has " +
        s"${Registry.all.size} — refresh the Current state paragraph")
    // registry names are unique (a duplicate name would shadow a query
    // in Verify/Bench maps silently)
    val names = Registry.all.map(_._1)
    assert(names.distinct.size === names.size,
      "duplicate registered query name")
    val running = txt.split(raw"## Running").last
    assert(raw"\d+ (tests|suites)".r.findFirstIn(running).isEmpty,
      "the Running section must not duplicate test/suite counts — " +
        "they live in Current state only (rounds 13–14 recurring nit)")
  }
}
