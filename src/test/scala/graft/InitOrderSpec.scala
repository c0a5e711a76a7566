package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the object-initialization-order hazard that broke the
  * d15–d19 oracles: a STRICT `val ...Sql` that (transitively) calls
  * into another operator object can run while that object — or its
  * own — is still mid-init, silently capturing 0 for any constant
  * declared later in the file (WinW rendered as `-1 FOLLOWING`).
  * Which object initializes first depends on the queries-map hash
  * order, which RESHUFFLES whenever an entry is added — so the bug
  * appears rounds after the code that contains it. The fix is
  * structural (every oracle string is a `lazy val`, forced only
  * after all objects are fully constructed); this spec pins it as a
  * source lint plus a semantic smoke check over the rendered SQL. */
class InitOrderSpec extends AnyFunSuite {

  private val opFiles = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Seq.empty
    walk(new java.io.File("src/main/scala/graft"))
  }

  test("every oracle SQL declaration is lazy (or a def)") {
    // optional [scope] qualifier: `private[graft] val fooSql` is just
    // as much an init-order hazard as `private val fooSql`
    val strict = "^\\s*(?:private(?:\\[\\w+\\])?\\s+|protected(?:\\[\\w+\\])?\\s+)?val\\s+[A-Za-z0-9_]*Sql".r
    val offenders = opFiles.flatMap { f =>
      val lines = new String(
        java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8).linesIterator.toSeq
      lines.zipWithIndex.collect {
        case (l, i) if strict.findFirstIn(l).isDefined &&
          !l.contains("lazy val") => s"${f.getPath}:${i + 1}: $l"
      }
    }
    assert(offenders.isEmpty,
      "strict val oracle strings are init-order hazards:\n" +
        offenders.mkString("\n"))
  }

  test("rendered oracle SQL carries no zero-captured constants") {
    // adversarial init order: touch the text object FIRST, the order
    // that reproduced the WinW=0 capture before the lazy-val fix
    graft.operators.text.TextOps.queries
    graft.operators.dedup.DedupOps.queries
    val telltale = Seq(
      "-1 FOLLOWING", "AND 0 FOLLOWING", // window width constant = 0
      "- -1", "+ -0", "// 0 ", "div 0 ", "% 0 ", // arithmetic on a 0 constant
      "generate_series(1, 0)")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      telltale.foreach { t =>
        assert(!sql.contains(t), s"$name oracle contains '$t' — an " +
          "interpolated constant was read before its object finished init")
      }
    }
  }
}
