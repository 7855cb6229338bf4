package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator from SURVEY.md §2.B: a DataFrame builder plus (optionally)
  * its DuckDB-oracle SQL twin. `SparkEntry` assembles the modules' `ops`
  * sequences into the driver-contract maps.
  *
  * Determinism conventions (SURVEY §5.2/§7.4): every query ends in a total
  * ORDER BY (unique tiebreak key), and double aggregates go through exact
  * DECIMAL arithmetic so Spark and DuckDB are bit-identical regardless of
  * partial-aggregation order. At 100 TB the decimal discipline also keeps
  * sums reproducible across partition counts.
  */
final case class Op(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Op {
  def apply(name: String, sql: String)(build: (SparkSession, String) => DataFrame): Op =
    Op(name, build, Some(sql))
  def noOracle(name: String)(build: (SparkSession, String) => DataFrame): Op =
    Op(name, build, None)

  /** Pin the FINAL ORDER BY's null placement to Spark's defaults
    * (ASC → NULLS FIRST, DESC → NULLS LAST) in a DuckDB oracle query.
    * DuckDB defaults to NULLS LAST for both directions, so any nullable
    * sort key makes a value-identical result hash-mismatch positionally —
    * invisible on the driver's NULL-free fixtures, red on the NULL-fixture
    * sweep (round 10: 30 of 67 reds were exactly this). Applying it
    * centrally at contract-assembly time kills the class for every current
    * AND future op; on NULL-free data it is a semantic no-op. Keys that
    * already spell NULLS FIRST/LAST are left alone; a trailing
    * LIMIT/OFFSET is preserved.
    */
  private[graft] def pinNullOrder(sql: String): String =
    pinFinalOrder(pinWindowOrder(sql))

  /** Pin a comma-separated sort-key list: keys that already spell NULLS
    * FIRST/LAST stay; otherwise DESC keys get NULLS LAST, ASC keys NULLS
    * FIRST — Spark's defaults. `tailPat` marks where the key list ends
    * (frame spec inside a window, LIMIT/OFFSET at statement end). */
  private def pinKeys(keysAndTail: String, tailPat: scala.util.matching.Regex): String = {
    val tailM = tailPat.findFirstMatchIn(keysAndTail)
    val (keysStr, tail) = tailM match {
      case Some(m) => (keysAndTail.substring(0, m.start), keysAndTail.substring(m.start))
      case None    => (keysAndTail, "")
    }
    // split on top-level commas only (sort keys can be function calls)
    val keys = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0; val cur = new StringBuilder
    keysStr.foreach { ch =>
      if (ch == '(') depth += 1
      if (ch == ')') depth -= 1
      if (ch == ',' && depth == 0) { keys += cur.toString; cur.clear() }
      else cur += ch
    }
    keys += cur.toString
    val pinned = keys.map(_.trim).filter(_.nonEmpty).map { k =>
      if ("(?i)NULLS\\s+(FIRST|LAST)".r.findFirstIn(k).isDefined) k
      else if ("(?i)\\bDESC\\b".r.findFirstIn(k).isDefined) k + " NULLS LAST"
      else k + " NULLS FIRST"
    }
    pinned.mkString(", ") + (if (tail.isEmpty) "" else " " + tail.trim)
  }

  private def pinFinalOrder(sql: String): String = {
    val idx = sql.toUpperCase.lastIndexOf("ORDER BY")
    if (idx < 0) return sql
    val head = sql.substring(0, idx)
    val after = sql.substring(idx + "ORDER BY".length)
    head + "ORDER BY " + pinKeys(after, "(?is)\\b(LIMIT|OFFSET|FETCH)\\b".r)
  }

  /** Pin NULL order inside every OVER (…) and WINDOW x AS (…) clause —
    * window frames are where the NULLS placement silently changes VALUES
    * (running sums, first/last carries, ranks), not just row order. */
  private def pinWindowOrder(sql: String): String = {
    val open = "(?is)(OVER\\s*\\(|WINDOW\\s+\\w+\\s+AS\\s*\\()".r
    val out = new StringBuilder
    var i = 0
    while (true) {
      open.findFirstMatchIn(sql.substring(i)) match {
        case None => out ++= sql.substring(i); return out.toString
        case Some(m) =>
          val start = i + m.start
          var j = i + m.end; var depth = 1
          while (depth > 0) {
            if (sql.charAt(j) == '(') depth += 1
            else if (sql.charAt(j) == ')') depth -= 1
            j += 1
          }
          val inner = sql.substring(i + m.end, j - 1)
          val om = "(?is)ORDER BY\\s+".r.findFirstMatchIn(inner)
          val pinnedInner = om match {
            case Some(o) =>
              // the frame-spec keyword must be followed by a bound, not a
              // paren — `range(1, 65)` the FUNCTION is a valid sort key
              inner.substring(0, o.end) +
                pinKeys(inner.substring(o.end),
                  "(?is)\\b(ROWS|RANGE|GROUPS)\\s+(BETWEEN|UNBOUNDED|CURRENT|INTERVAL|\\d)".r)
            case None => inner
          }
          out ++= sql.substring(i, i + m.end) ++= pinnedInner ++= ")"
          i = j
      }
    }
    out.toString // unreachable
  }
}
