package graft.spark

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Pre-commit smoke over the driver's correctness gate: EVERY
  * SparkEntry.queries entry must build and EXECUTE at sf0.001 without
  * throwing. `sbt test` alone cannot see a gate query that crashes inside
  * graft.Verify (Verify logs the failure and moves on, so the driver's
  * CORRECTNESS file just silently loses the row — exactly how the round-3
  * x37 file-vs-directory streaming regression shipped). This spec closes
  * that hole: a crashing gate query now fails the suite.
  *
  * Correctness-vs-oracle is still the driver's job (DuckDB compare at
  * sf0.01); this only pins "runs end to end and yields rows".
  */
class VerifySmokeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def haveData = new java.io.File(s"$sfDir/documents.parquet").exists()

  test("every gate query has a matching oracle (or is a declared rows-only op)") {
    val rowsOnly = Set.empty[String] // round 3 closed the last rows-only query
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o) == rowsOnly, s"queries without oracle: ${(q -- o -- rowsOnly).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"gate query $name executes at sf0.001") {
      assume(haveData, s"$sfDir not present")
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = df.count() // full execution, like Verify's parquet write
      assert(n >= 0)
    }
  }
}
