package graft

/** First-principles shingle model shared by the specs that re-derive
  * engine results independently (q121 novelty, q127 containment):
  * tokenize on single spaces, drop empties, slide 5-grams, md5-h60 —
  * one copy so the test-side contract cannot drift between specs.
  */
object ShingleModel {

  def h60(s: String): Long = graft.functions.CrossHash.h60FromDigest(
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")))

  def shingleSet(text: String): Set[Long] = {
    val t = text.split(' ').filter(_.nonEmpty)
    if (t.length < 5) Set.empty
    else t.sliding(5).map(w => h60(w.mkString(" "))).toSet
  }
}
