package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Connected components (large-star/small-star): verified against an
  * in-test union-find over the same edges — including long paths (many
  * doubling rounds), string ids, duplicate/self-loop edges, and the
  * pair-operator composition shape.
  */
class ComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // route every root to the true min of its set (union-by-min above
    // already guarantees it, via min-root unioning)
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    collect(Components.connectedComponents(edges.toDF("a", "b")))

  private def collect(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Caching.release(df)
    m
  }

  test("long path needs doubling, not diameter, rounds") {
    // a 64-node path: naive propagation needs 63 rounds; large/small-star
    // must finish within the default 30-iteration budget
    val edges = (0L until 63L).map(i => (i, i + 1))
    assert(run(edges) === (0L to 63L).map(_ -> 0L).toMap)
  }

  test("multiple components, duplicate and self-loop edges, reversed order") {
    val edges = Seq((5L, 3L), (3L, 5L), (7L, 7L), (2L, 9L), (9L, 4L),
      (4L, 2L), (2L, 9L), (11L, 10L))
    val expected = ufComponents(edges.filter(e => e._1 != e._2))
    assert(run(edges) === expected)
  }

  test("pseudo-random graph matches union-find exactly") {
    // deterministic LCG so the test is stable
    var s = 12345L
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); math.abs(s % 400) }
    val edges = Seq.fill(300)((next(), next())).filter(e => e._1 != e._2)
    assert(run(edges) === ufComponents(edges))
  }

  test("string ids: component root is the lexicographic min") {
    val df = Seq(("doc-b", "doc-a"), ("doc-b", "doc-c"), ("x", "y")).toDF("p", "q")
    val got = Components.connectedComponents(df)
    val m = got.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    Caching.release(got)
    assert(m === Map("doc-a" -> "doc-a", "doc-b" -> "doc-a", "doc-c" -> "doc-a",
      "x" -> "x", "y" -> "x"))
  }

  test("empty edges converge immediately to an empty assignment") {
    assert(run(Seq.empty[(Long, Long)]) === Map.empty)
  }

  test("no cached or checkpointed blocks leak past the returned result") {
    // diff against pre-existing blocks: other suites sharing the session
    // legitimately hold their own caches, and this assert owns only what
    // THIS operator call creates
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val result = Components.connectedComponents(
      (0L until 20L).map(i => (i, (i + 1) % 20)).toDF("a", "b"))
    result.count()
    Caching.release(result)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"connectedComponents leaked ${leaked.size} cached RDD(s)")
  }

  test("clusterAssign: compact (rep, member) edges give the same components as all-pairs") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val assigned = Dedup.clusterAssign(docs, 16, 4, 1, 2)
    val got = assigned.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Caching.release(assigned)
    // truth: CC over the EXPANDED pair set + identity for singletons
    val pairs = Dedup.minhashLshPairs(docs, 16, 4, 1, 2)
    val edges = pairs.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    Caching.release(pairs)
    val cc = ufComponents(edges)
    val all = docs.select("doc_id").collect().map(_.getLong(0))
    assert(got === all.map(id => id -> cc.getOrElse(id, id)).toMap)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"clusterAssign path leaked ${leaked.size} cached RDD(s)")
  }

  test("composes with phash near-dup pairs: clusters = planted groups") {
    // tiny closed-form phash table: two planted groups of 3 + a singleton
    // groups must sit >= 4 bits apart: single-bit values like 1L<<40 are
    // Hamming 1 from zero and would merge everything
    val imgs = Seq(
      ("a1", 0L), ("a2", 1L), ("a3", 3L), // pairwise Hamming <= 2
      ("b1", 65280L), ("b2", 65281L), // 0xFF00(+1): 7-9 bits from group a
      ("c1", 0x0F0F0F0F0F0F0F0FL)).toDF("image_id", "phash")
    val pairs = Dedup.phashNearDupPairs(imgs, t = 3)
    val cc = Components.connectedComponents(pairs.select("id_a", "id_b"))
    val m = cc.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    Caching.release(cc)
    Caching.release(pairs)
    assert(m === Map("a1" -> "a1", "a2" -> "a1", "a3" -> "a1",
      "b1" -> "b1", "b2" -> "b1"))
  }
}
