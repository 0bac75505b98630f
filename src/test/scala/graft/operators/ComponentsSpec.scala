package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ComponentsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains collapse to the minimum id even past one hop") {
    // 1-2, 2-3, 3-4: label 1 must propagate the whole chain (diameter 3)
    cc(Seq((1L, 2L), (2L, 3L), (3L, 4L))) shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L)
  }

  test("distinct components keep distinct representatives") {
    cc(Seq((5L, 6L), (10L, 11L), (11L, 12L), (20L, 21L))) shouldBe
      Map(5L -> 5L, 6L -> 5L, 10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
  }

  test("star contraction matches label propagation on a random graph") {
    val rnd = new scala.util.Random(13)
    val pairs = Seq.fill(150)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }.distinct
    val viaProp = cc(pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct)
    val viaStar = Components.starContraction(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    viaStar shouldBe viaProp
  }

  test("self-loop-only vertices keep their ledger row in BOTH implementations") {
    // (7,7) is a real shape near-dup pair tables produce (a doc paired
    // with itself by a symmetric generator); the vertex contract is one
    // row per vertex appearing in ANY pair
    val pairs = Seq((7L, 7L), (1L, 2L))
    cc(pairs) shouldBe Map(7L -> 7L, 1L -> 1L, 2L -> 1L)
    val star = Components.starContraction(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    star shouldBe Map(7L -> 7L, 1L -> 1L, 2L -> 1L)
  }

  test("long chains: propagation stalls at diameter rounds, star contraction does not") {
    // a 200-node path has diameter 199 — label propagation moves the min
    // one hop per round and must give up at maxRounds
    val chain = (0L until 199L).map(i => (i, i + 1))
    an[IllegalArgumentException] should be thrownBy
      Components.connectedComponents(chain.toDF("id_a", "id_b"), maxRounds = 20)
    val star = Components.starContraction(chain.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    star.keySet shouldBe (0L to 199L).toSet
    star.values.toSet shouldBe Set(0L) // one component, rooted at the min id
  }

  test("matches a union-find oracle on a random graph") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(200)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    // driver-side union-find truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(v => v -> find(v)).toMap
    // representative = min of component is exactly what min-label converges to
    val byRep = truth.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
    val expected = truth.map { case (v, r) => v -> byRep(r) }
    cc(pairs) shouldBe expected
  }
}
