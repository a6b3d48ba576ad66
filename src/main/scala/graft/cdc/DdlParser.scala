package graft.cdc

/** DDL-fragment → [[TableSchema]] parser (SURVEY.md §2.a row 19).
  *
  * The reference learns column types by literally executing
  * `create temp table t_informixcdc (<cols_desc>) with no log` and
  * DESCRIBE-ing the result (ext/_informixcdcmodule.ec:1745-1783) — schema
  * inference delegated to the database's DDL parser. We parse the same
  * column-list text directly: `name type[, name type]...`, where a type may
  * carry parenthesized args (`decimal(32,16)`, `varchar(255, 16)`), a
  * `datetime <unit> to <unit>` qualifier, or a `default <literal>` suffix
  * (present in the type-coverage fixture, sql/informixcdc_test.sql:7-28).
  *
  * Unknown types raise — the reference silently skipped them (ec:1128-1132,
  * the `break; //teest`), which SURVEY §1.3 flags as a defect to fix.
  */
object DdlParser {

  /** Split a column list on top-level commas (commas inside parens — e.g.
    * `varchar(255, 16)` — don't split). */
  private[cdc] def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i)
          start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Parse one `name type...` declaration into a [[ColSpec]]. */
  private[cdc] def parseCol(decl: String): ColSpec = {
    val trimmed = decl.trim
    val sp = trimmed.indexOf(' ')
    require(sp > 0, s"column declaration needs a name and a type: '$decl'")
    val name = trimmed.substring(0, sp)
    // Strip a trailing `default <literal>` (string literals can contain
    // anything, so cut at the keyword, which cannot appear in a type).
    val typeText = {
      val rest = trimmed.substring(sp + 1).trim
      val m = "(?i)\\bdefault\\b".r.findFirstMatchIn(rest)
      (m match { case Some(x) => rest.substring(0, x.start); case None => rest })
        .trim.toLowerCase
    }
    ColSpec(name, parseType(typeText, decl))
  }

  private def intArgs(t: String): Seq[Int] = {
    val open = t.indexOf('(')
    if (open < 0) Seq.empty
    else t.substring(open + 1, t.lastIndexOf(')'))
      .split(',').toSeq.map(_.trim.toInt)
  }

  private def parseType(t: String, decl: String): ColType = t match {
    case x if x.startsWith("serial8") || x.startsWith("int8") => ColType.Int8
    case x if x.startsWith("bigserial") || x.startsWith("bigint") => ColType.Bigint
    case x if x.startsWith("serial") || x.startsWith("integer") || x == "int" => ColType.Int4
    case x if x.startsWith("smallint") => ColType.Int2
    case x if x.startsWith("date") && !x.startsWith("datetime") => ColType.DateDay
    case x if x.startsWith("datetime") || x.startsWith("interval") => ColType.DTime
    case x if x.startsWith("boolean") || x.startsWith("bool") => ColType.Bool
    case x if x.startsWith("char") || x.startsWith("nchar") =>
      ColType.Char(intArgs(x).headOption.getOrElse(1))
    case x if x.startsWith("varchar") || x.startsWith("nvarchar") => ColType.Varchar
    case x if x.startsWith("lvarchar") => ColType.Lvarchar
    case x if x.startsWith("float") || x.startsWith("double") => ColType.Float8
    case x if x.startsWith("smallfloat") || x.startsWith("real") => ColType.Float4
    case x if x.startsWith("decimal") || x.startsWith("dec") || x.startsWith("numeric") ||
              x.startsWith("money") =>
      val args = intArgs(x)
      ColType.Dec(args.headOption.getOrElse(16), args.lift(1).getOrElse(2))
    case _ =>
      throw new IllegalArgumentException(s"unsupported column type in '$decl'")
  }

  /** Parse a full cols_desc column list for a TABSCHEM record. */
  def parse(tabid: Int, tabname: String, colsDesc: String): TableSchema =
    TableSchema(tabid, tabname, splitTopLevel(colsDesc).map(parseCol).toIndexedSeq)
}

/** The tabid → [[TableSchema]] registry (table_t tables[], ec:93-105).
  *
  * Table *names* are assigned at capture registration (`enable()` writes
  * `db@server:owner.table` into the registry slot, ec:2061-2062) — TABSCHEM
  * records carry only the tabid, so names must be pre-declared. Immutable:
  * `withTabSchema` returns a new registry, so a resolved snapshot can be
  * captured in a task closure / broadcast for distributed decode
  * (SURVEY §1.5) without shared mutable state.
  */
final case class SchemaRegistry(names: Map[Int, String],
                                tables: Map[Int, TableSchema] = Map.empty) {
  def tabname(tabid: Int): String = names.getOrElse(tabid, s"tab_$tabid")
  def apply(tabid: Int): TableSchema =
    tables.getOrElse(tabid,
      throw new NoSuchElementException(s"no TABSCHEM seen for tabid $tabid"))
  /** Registry update on a TABSCHEM record (add_tabschema, ec:1722-1804). */
  def withTabSchema(rec: TabSchema): SchemaRegistry =
    copy(tables = tables.updated(rec.tabid,
      DdlParser.parse(rec.tabid, tabname(rec.tabid), rec.colsDesc)))
}
