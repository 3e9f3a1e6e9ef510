package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal DSv2 catalog plugin serving [[ManifestTable]] snapshots by
  * PATH identifier — the front door the SQL row-level commands need:
  * Spark's `ResolveSQLOnFile` only resolves `format.`path`` for v1
  * file sources, so `DELETE FROM` against a v2 table must come through
  * a `TableCatalog`. Register once
  * (`spark.sql.catalog.graftcat = graft.sources.GraftManifestCatalog`,
  * a runtime conf — no restart needed) and every committed manifest
  * directory is addressable as
  *
  *   SELECT * FROM graftcat.`/path/to/table`
  *   DELETE FROM graftcat.`/path/to/table` WHERE <conjunction>
  *
  * `loadTable` hands back the SAME `Table` implementation the
  * TableProvider path builds (one implementation, two front doors), so
  * scans keep the snapshot-pinned semantics and data skipping, and
  * deletes ride [[ManifestTable]]'s copy-on-write + stats fast path.
  * DDL (create/alter/drop/rename) is deliberately out of scope — the
  * manifest directory IS the table lifecycle; a real deployment would
  * back these with the metastore.
  */
class GraftManifestCatalog extends TableCatalog {

  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty

  override def loadTable(ident: Identifier): Table = {
    val dir = (ident.namespace() :+ ident.name()).mkString("/")
    ManifestTable.tableFor(if (dir.startsWith("/")) dir else s"/$dir")
  }

  override def tableExists(ident: Identifier): Boolean =
    try { loadTable(ident); true } catch { case _: Exception => false }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graftcat: tables are created by writing with format(\"graft-manifest\")")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graftcat: ALTER not supported")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graftcat: DROP not supported")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graftcat: RENAME not supported")
}
