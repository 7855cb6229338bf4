package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import Sources.UpsertDialect

/** Statement-shape tests for the JDBC upsert's vendor seam. The ANSI
  * instance runs live against embedded Derby in JdbcSpec; no SQL Server
  * exists in this harness, so the T-SQL instance is pinned here at the
  * exact-string level — the three deltas the reference target needs
  * (reference: src/etl/ETLProcess.java:388-427 construirUpsertSQL is
  * T-SQL; config.properties ships a jdbc:sqlserver URL). */
class DialectSpec extends AnyFunSuite with Matchers {

  test("forUrl keys off the JDBC subprotocol, case-insensitively") {
    UpsertDialect.forUrl("jdbc:sqlserver://host:1433;databaseName=dw") shouldBe
      UpsertDialect.SqlServer
    UpsertDialect.forUrl("JDBC:SQLSERVER://host") shouldBe UpsertDialect.SqlServer
    UpsertDialect.forUrl("jdbc:derby:memory:db;create=true") shouldBe UpsertDialect.Ansi
    UpsertDialect.forUrl("jdbc:postgresql://host/db") shouldBe UpsertDialect.Ansi
  }

  test("ANSI stage DDL: CREATE TABLE ... AS SELECT ... WITH NO DATA") {
    UpsertDialect.Ansi.stageDdl("tgt_graft_stage_ab12", "tgt",
      Seq("\"id\"", "\"name\""), Seq("\"id\"")) shouldBe
      """CREATE TABLE tgt_graft_stage_ab12 AS SELECT "id", "name" FROM tgt WITH NO DATA"""
  }

  test("T-SQL stage DDL: SELECT ... INTO ... WHERE 1 = 0, identity-proofed keys") {
    // key columns are wrapped in ISNULL(c, c): SELECT ... INTO copies an
    // IDENTITY property from a bare column reference, and the stage load
    // inserts explicit key values — an inherited identity would reject them
    UpsertDialect.SqlServer.stageDdl("tgt_graft_stage_ab12", "tgt",
      Seq("\"id\"", "\"name\""), Seq("\"id\"")) shouldBe
      """SELECT ISNULL("id", "id") AS "id", "name" INTO tgt_graft_stage_ab12 FROM tgt WHERE 1 = 0"""
  }

  test("T-SQL terminates MERGE with ';'; ANSI must not (Derby rejects it)") {
    val merge = Sources.mergeSql("tgt", "tgt_s", Seq("id", "v"), Seq("id"))
    UpsertDialect.Ansi.terminate(merge) shouldBe merge
    UpsertDialect.SqlServer.terminate(merge) shouldBe (merge + ";")
    (UpsertDialect.SqlServer.terminate(merge) should endWith).regex("INSERT .*;")
  }

  test("the full T-SQL merge statement is valid statement shape end-to-end") {
    // the exact statement a SQL Server deployment would execute — pinned
    // so a change to mergeSql or the dialect shows up as a string diff
    val sql = UpsertDialect.SqlServer.terminate(
      Sources.mergeSql("dw_dim", "dw_dim_graft_stage_cafe0123",
        Seq("id", "name", "v"), Seq("id")))
    sql shouldBe
      """MERGE INTO dw_dim t USING dw_dim_graft_stage_cafe0123 s ON t."id" = s."id"""" +
      """ WHEN MATCHED THEN UPDATE SET "name" = s."name", "v" = s."v"""" +
      """ WHEN NOT MATCHED THEN INSERT ("id", "name", "v")""" +
      """ VALUES (s."id", s."name", s."v");"""
  }
}
