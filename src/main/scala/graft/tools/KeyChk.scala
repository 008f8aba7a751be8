package graft.tools

/** Coverage cross-check: SURVEY.md §2's declared query keys vs
  * [[graft.SparkEntry.queries]]/[[graft.SparkEntry.oracleSql]] — the
  * exact both-direction key comparison the judge runs each round.
  * Run at seal: `sbt "runMain graft.tools.KeyChk"`; all three counts
  * must match and every MISSING/EXTRA line must be empty. */
object KeyChk {
  def main(args: Array[String]): Unit = {
    val survey = args.headOption.getOrElse("SURVEY.md")
    val row = """\| `(q[^`]+)`""".r
    var inS2 = false
    val sk = scala.collection.mutable.Set[String]()
    for (line <- scala.io.Source.fromFile(survey, "UTF-8").getLines()) {
      if (line.startsWith("## ")) inS2 = line.startsWith("## §2")
      if (inS2) row.findPrefixMatchOf(line).foreach(m => sk += m.group(1))
    }
    val qk = graft.SparkEntry.queries.keySet
    val ok = graft.SparkEntry.oracleSql.keySet
    println(s"COUNT queries=${qk.size} oracles=${ok.size} survey=${sk.size}")
    println(s"MISSING-from-queries:${(sk.toSet -- qk).toSeq.sorted.mkString(",")}")
    println(s"EXTRA-not-in-survey:${(qk -- sk).toSeq.sorted.mkString(",")}")
    println(s"MISSING-oracles:${(qk -- ok).toSeq.sorted.mkString(",")}")
    println(s"ORPHAN-oracles:${(ok -- qk).toSeq.sorted.mkString(",")}")
    val bad = (sk.toSet -- qk).nonEmpty || (qk -- sk).nonEmpty ||
      (qk -- ok).nonEmpty || (ok -- qk).nonEmpty
    if (bad) sys.exit(1)
  }
}
