package graft.load

import org.scalatest.funsuite.AnyFunSuite

class LoadMainSpec extends AnyFunSuite {

  test("parseArgs mirrors the Glue resolved-options contract") {
    val a = LoadMain.parseArgs(Array(
      "--input_path", "/in", "--output_path", "/out",
      "--write_operation", "upsert",
      "--additional_columns", """{"exchange": "kraken"}"""))
    assert(a("input_path") === "/in")
    assert(a("output_path") === "/out")
    assert(a("write_operation") === "upsert")
  }

  test("parseColumns handles the flat string map the reference passes") {
    assert(LoadMain.parseColumns("""{"exchange": "kraken", "a": "b"}""") ===
      Map("exchange" -> "kraken", "a" -> "b"))
    assert(LoadMain.parseColumns("{}") === Map.empty)
  }
}
