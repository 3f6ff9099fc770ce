package graft

import graft.ops.Multimodal.StubCodec
import org.scalatest.funsuite.AnyFunSuite

class OpsSpec extends AnyFunSuite {

  test("stub codec round-trips header metadata") {
    val body = "pixelspixelspixels".getBytes("UTF-8")
    val payload = StubCodec.encode(640, 480, 3, body)
    val meta = StubCodec.decode(payload)
    assert(meta.valid)
    assert(meta.width == 640 && meta.height == 480 && meta.channels == 3)
    assert(meta.nBytes == 16 + body.length)
  }

  test("stub codec rejects garbage") {
    assert(!StubCodec.decode("nope".getBytes).valid)
    assert(!StubCodec.decode(null).valid)
    assert(!StubCodec.decode(Array[Byte](1, 2, 3)).valid)
  }

  test("stub codec checksum is deterministic and content-sensitive") {
    val a = StubCodec.decode(StubCodec.encode(1, 1, 1, "aaa".getBytes))
    val a2 = StubCodec.decode(StubCodec.encode(1, 1, 1, "aaa".getBytes))
    val b = StubCodec.decode(StubCodec.encode(1, 1, 1, "aab".getBytes))
    assert(a.checksum == a2.checksum)
    assert(a.checksum != b.checksum)
  }

  test("resize rewrites header, keeps validity") {
    val p = StubCodec.encode(100, 100, 3, Array.fill[Byte](64)(7))
    val r = StubCodec.decode(StubCodec.resize(p, 10, 10))
    assert(r.valid && r.width == 10 && r.height == 10 && r.channels == 3)
  }

  test("statement splitter respects strings and comments") {
    import graft.adapter.SqlSplitter
    val sql = "SELECT ';' AS semi; -- trailing; comment\nSELECT 2; /* block; */ SELECT 3"
    val parts = SqlSplitter.split(sql)
    assert(parts.length == 3)
    assert(parts(0).contains("';'"))
    assert(parts(1).contains("SELECT 2"))
    assert(parts(2).contains("SELECT 3"))
    assert(SqlSplitter.split("SELECT 'a;''b;'").length == 1)
    assert(SqlSplitter.split("SELECT `we;rd`; SELECT 1").length == 2)
  }

  test("cross-db pure helpers") {
    import graft.funcs.CrossDb
    assert(CrossDb.escapeSingleQuotes("it's") == "it''s")
    assert(CrossDb.stringLiteral("a'b") == "'a''b'")
    assert(CrossDb.datesInRange("2024-01-30", "2024-02-02").map(_.toString) ==
      Seq("2024-01-30", "2024-01-31", "2024-02-01", "2024-02-02"))
    assert(CrossDb.Types.numeric == "DECIMAL(28,6)")
  }

  test("agate table algebra") {
    import graft.adapter.AgateTable
    val t = AgateTable(
      Vector("name", "n"), Vector("STRING", "BIGINT"),
      Vector(Vector("a", 1L), Vector("b", 2L), Vector("a", 3L), Vector(null, 4L)))
    assert(t.select(Seq("n")).columnNames == Vector("n"))
    assert(t.rename(Map("n" -> "num")).columnNames == Vector("name", "num"))
    assert(t.columnDistinct("name").toSet == Set("a", "b", null))
    assert(t.withoutNulls("name").numRows == 3)
    assert(t.groupBy("name")("a").numRows == 2)
    assert(t.cell(1, "n") == 2L)
    assert(t.dictRows.head == Map("name" -> "a", "n" -> 1L))
    assert(t.printTable().contains("| a"))
  }
}
