package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Config

/** OP-SRC-6: the YAML-subset config loader against configs shaped exactly
  * like the reference's download/process files.
  */
class ConfigSpec extends AnyFunSuite {

  private val downloadYaml =
    """# download config
      |action: download
      |output-filename: null           # do not touch
      |data-file: null
      |coords-dir: geojsons            # directory of JSON files | nothing
      |start: 1984-01-01T00:00:00
      |end: 2024-12-31T23:00:00
      |preds: [TA, PA, P, WS, WD, USTAR, NETRAD, SW_IN, RH, CO2]
      |aggregation-type: MONTHLY
      |id-field: GID
      |""".stripMargin

  test("download-shaped config parses with nulls, lists, comments") {
    val c = Config.fromMap(Config.parseYaml(downloadYaml))
    assert(c.action == "download")
    assert(c.outputFilename.isEmpty && c.dataFile.isEmpty)
    assert(c.coordsDir.contains("geojsons"))
    assert(c.start.contains("1984-01-01T00:00:00"))
    assert(c.preds.size == 10 && c.preds.head == "TA" && c.preds.last == "CO2")
    assert(c.aggregationType.contains("MONTHLY"))
    assert(c.idField.contains("GID"))
  }

  test("process-shaped config: empty values, empty list, bare nulls") {
    val c = Config.fromMap(Config.parseYaml(
      """action: process
        |output-filename: test
        |data-file:
        |coords-dir: null
        |start: ~
        |preds: []
        |aggregation-type: null
        |id-field:
        |""".stripMargin))
    assert(c.action == "process")
    assert(c.outputFilename.contains("test"))
    assert(c.dataFile.isEmpty && c.coordsDir.isEmpty && c.start.isEmpty)
    assert(c.preds.isEmpty && c.aggregationType.isEmpty && c.idField.isEmpty)
  }

  test("scalar typing: quotes, booleans, numbers, hash-in-string") {
    val m = Config.parseYaml(
      """a: 'quoted # not a comment'
        |b: "double"
        |c: true
        |d: 42
        |e: -3.25
        |f: plain#nothash
        |g: value # trailing comment
        |""".stripMargin)
    assert(m("a") == "quoted # not a comment")
    assert(m("b") == "double")
    assert(m("c") == true)
    assert(m("d") == 42L)
    assert(m("e") == -3.25)
    assert(m("f") == "plain#nothash") // # not preceded by whitespace
    assert(m("g") == "value")
  }

  test("flow lists keep commas inside quoted items") {
    val m = Config.parseYaml("preds: ['a, b', c, \"d,e\"]")
    assert(m("preds") == Seq("a, b", "c", "d,e"))
  }

  test("prompt-backed flags: Y/n vocabulary, None requires a decision") {
    val cfg = Config.fromMap(Config.parseYaml(
      """action: process
        |gapfill: Y
        |merge-polygons: n
        |delete-source: true""".stripMargin))
    assert(cfg.gapfillResolved)
    assert(!cfg.mergePolygonsResolved)
    assert(cfg.deleteSourceResolved)
    // unset flag = the reference would prompt; non-interactive use must
    // error with the key name, not guess a default
    val bare = Config.fromMap(Config.parseYaml("action: process"))
    val e = intercept[IllegalArgumentException](bare.gapfillResolved)
    assert(e.getMessage.contains("gapfill"))
    // the re-prompt loop's invalid-input case is a load-time error
    intercept[IllegalArgumentException](
      Config.fromMap(Config.parseYaml("action: a\ngapfill: maybe")))
  }

  test("load enforces the reference's extension rule and missing action") {
    val f = Files.createTempFile("graft_cfg", ".json")
    intercept[IllegalArgumentException](Config.load(f.toString))
    val y = Files.createTempFile("graft_cfg", ".yaml")
    Files.writeString(y, downloadYaml)
    assert(Config.load(y.toString).action == "download")
    intercept[IllegalArgumentException](
      Config.fromMap(Config.parseYaml("preds: []")))
  }
}
