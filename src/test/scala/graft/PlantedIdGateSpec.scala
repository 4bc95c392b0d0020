package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-level gate: every planted-id offset must sit above any real id a
  * scaled instance can produce (ADVICE r7, medium).
  *
  * Query fixtures plant synthetic rows by re-inserting real docs/vectors
  * under `id + OFFSET`. If OFFSET is below the largest real id at some
  * scale factor, planted and real rows silently merge in GROUP BYs — the
  * exact Spark-vs-DuckDB divergence the r7 sf3 gate caught at +100000 with
  * a 150k-doc corpus. The floor is 1e9: documents at sf0.1 is ~15k rows, so
  * 1e9 covers every instance up to ~sf6000, three decades past the sf20
  * gate ceiling. All plants live in decade bands at or above 1e9
  * (1e9..8e9); new plants must pick an unused >=1e9 band.
  *
  * The gate scans all main-source Scala for id-plant arithmetic in BOTH
  * forms — Column expressions (`col("doc_id") + N`) and the mirrored oracle
  * SQL (`doc_id + N`) — plus the q79 `variant(NL)` helper and `lit(NL)`
  * synthetic ids, with comment text stripped so prose like "+ 8.01e9"
  * cannot mask a low literal.
  */
class PlantedIdGateSpec extends AnyFunSuite {
  private val Floor = 1000000000L

  private def scalaFiles(dir: java.io.File): Seq[java.io.File] = {
    val entries = Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
    entries.filter(_.isFile).filter(_.getName.endsWith(".scala")) ++
      entries.filter(_.isDirectory).flatMap(scalaFiles)
  }

  private def stripComments(line: String): String = {
    val t = line.trim
    if (t.startsWith("*") || t.startsWith("/*")) "" // scaladoc body
    else line.indexOf("//") match {
      case -1 => line
      case i  => line.substring(0, i)
    }
  }

  test("no id-plant offset below 1e9 anywhere in main source") {
    val plant = raw"""(?:doc_id|vec_id)"?\)?\s*\+\s*(\d[\d_]*)L?\b""".r
    val variantCall = raw"""variant\((\d+)L\)""".r
    val syntheticId = raw"""lit\((\d+)L\)\.as\("(?:doc_id|vec_id)"\)""".r
    val root = new java.io.File("src/main/scala")
    assert(root.isDirectory, s"run from the repo root: ${root.getAbsolutePath}")

    val offenders = for {
      f    <- scalaFiles(root)
      (raw, i) <- scala.io.Source.fromFile(f, "UTF-8").getLines().zipWithIndex.toSeq
      line  = stripComments(raw)
      m    <- (plant.findAllMatchIn(line) ++ variantCall.findAllMatchIn(line) ++
                 syntheticId.findAllMatchIn(line)).toSeq
      n     = m.group(1).replace("_", "").toLong
      // +1 / small-int arithmetic inside window frames etc. is not a plant;
      // anything four digits and up on an id column is.
      if n >= 1000 && n < Floor
    } yield s"${f.getPath}:${i + 1}: offset $n < 1e9 in: ${raw.trim.take(90)}"

    assert(offenders.isEmpty,
      "planted-id offsets below the 1e9 floor (collide with scaled real ids):\n" +
        offenders.mkString("\n"))
  }
}
