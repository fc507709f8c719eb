package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Manifest

/** OP-SRC-5 manifest catalog: write, stale-key-replacing append, read. */
class ManifestSpec extends AnyFunSuite {

  private def feat(id: String, start: String) = Manifest.Feature(id, start,
    "2020-12-31", "Point", Nil, Seq("TA"),
    Map(id -> Seq(1.0, 2.0, 3.0, 4.0)), Some("station.csv"))

  test("append replaces stale features per region id and is idempotent") {
    val p = s"${sys.props("java.io.tmpdir")}/graft_test_manifest.json"
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(p))
    Manifest.write(Manifest.Spec("BoundingBox", None, gapfilling = false,
      Seq(feat("a", "2020-01-01"), feat("b", "2020-01-01"))), p)
    val m1 = Manifest.append(p, Seq(feat("b", "2021-06-06"), feat("c", "2020-01-01")))
    assert(m1.features.map(f => f.region_id -> f.start_date) ==
      Seq("a" -> "2020-01-01", "b" -> "2021-06-06", "c" -> "2020-01-01"))
    val m2 = Manifest.append(p, Seq(feat("b", "2021-06-06"), feat("c", "2020-01-01")))
    assert(m2.features.map(_.region_id) == Seq("a", "b", "c"))
  }

  test("append to a missing path starts an empty catalog") {
    val p = s"${sys.props("java.io.tmpdir")}/graft_test_manifest_new.json"
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(p))
    val m = Manifest.append(p, Seq(feat("only", "2020-01-01")))
    assert(m.features.map(_.region_id) == Seq("only"))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
  }
}
