package graft

/** Hand-value pins for q355: iterative BPE merge training. */
class BpeWaveSpec extends SparkSpec {
  import spark.implicits._

  test("bpeTrain: merges cascade (winner of round 2 is built from " +
      "round 1's merged symbol); early stop when pairs run out") {
    val docs = Seq((1L, "aa ab"), (2L, "aa")).toDF("doc_id", "text")
    // vocab: ("a a", 2), ("a b", 1)
    val r = graft.llm.Lexical.bpeTrain(docs, "text", 8)
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(r.length == 2)                    // round 3 has no pairs
    assert(r(0) == ((1, "a a", 2L)))
    assert(r(1) == ((2, "a b", 1L)))
  }

  test("bpeTrain: greedy left-to-right merge takes BOTH adjacent " +
      "occurrences (a a a a -> aa aa), overlap only the left") {
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val r = graft.llm.Lexical.bpeTrain(docs, "text", 3)
      .as[(Int, String, Long)].collect().sortBy(_._1)
    // round 1: 'a a' x3; rewrite yields 'aa aa' (both pairs merged)
    // round 2: 'aa aa' x1 -> 'aaaa'; round 3: exhausted
    assert(r.toSeq == Seq((1, "a a", 3L), (2, "aa aa", 1L)))
    // odd run: 'aaa' -> greedy merges only the left pair
    val odd = Seq((1L, "aaa")).toDF("doc_id", "text")
    val r2 = graft.llm.Lexical.bpeTrain(odd, "text", 2)
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(r2.toSeq == Seq((1, "a a", 2L), (2, "aa a", 1L)))
  }

  test("bpeTrain: weight ties break to the lexicographically smallest " +
      "pair") {
    val docs = Seq((1L, "cd ab")).toDF("doc_id", "text")
    val r = graft.llm.Lexical.bpeTrain(docs, "text", 1)
      .as[(Int, String, Long)].collect()
    assert(r.head == ((1, "a b", 1L)))
  }

  test("bpeTrain: per-round checkpoints are released — cached-RDD count " +
      "does not grow with merges") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox"), (3L, "lazy lazy dog dog"))
      .toDF("doc_id", "text")
    // Track the IDS of cached RDDs created during the call, not the
    // global count: sibling suites release their frames with the
    // non-blocking unpersist, so the global count can DROP concurrently
    // and a count-equality assertion flakes (seen: "leaked -2").
    val before = spark.sparkContext.getPersistentRDDs.keySet
    graft.llm.Lexical.bpeTrain(docs, "text", 6).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"bpeTrain leaked cached checkpoint RDD(s): $leaked")
  }
}
