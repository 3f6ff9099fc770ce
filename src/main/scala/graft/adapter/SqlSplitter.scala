package graft.adapter

/** Multi-statement SQL splitting on top-level semicolons — outside
  * strings, backtick identifiers, and comments (reference:
  * crates/dbt-adapter/src/stmt_splitter.rs + the ANTLR-token splitter in
  * crates/dbt-sql/dbt-sql-utils/src/splitter). A character-state machine
  * suffices for Spark SQL's lexical rules. */
object SqlSplitter {
  def split(sql: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var state: Char = 'n' // n=normal, '=single, "=double, `=backtick, -=line comment, *=block
    while (i < sql.length) {
      val c = sql.charAt(i)
      val next = if (i + 1 < sql.length) sql.charAt(i + 1) else ' '
      state match {
        case 'n' =>
          if (c == '\'' || c == '"' || c == '`') { state = c; cur += c }
          else if (c == '-' && next == '-') { state = '-'; cur += c }
          else if (c == '/' && next == '*') { state = '*'; cur += c }
          else if (c == ';') { out += cur.toString; cur.clear() }
          else cur += c
        case '\'' | '"' | '`' =>
          cur += c
          if (c == state && (state != '\'' || next != '\'')) state = 'n'
          else if (c == state) { cur += next; i += 1 } // escaped ''
        case '-' =>
          cur += c
          if (c == '\n') state = 'n'
        case '*' =>
          cur += c
          if (c == '*' && next == '/') { cur += next; i += 1; state = 'n' }
      }
      i += 1
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
