package graft.geom

import scala.io.Source

/** Reference polygon fixtures, ported coordinate-for-coordinate from
  * /root/reference (see repo FIXTURES.md §1). CSV resources hold one
  * `x,y` vertex per line.
  */
object Fixtures {

  private def loadCsv(name: String): Array[(Double, Double)] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name.csv")
    require(in != null, s"missing fixture resource $name")
    val src = Source.fromInputStream(in, "UTF-8")
    try src.getLines().map { line =>
      val c = line.indexOf(',')
      (line.substring(0, c).toDouble, line.substring(c + 1).toDouble)
    }.toArray
    finally src.close()
  }

  lazy val poly1: PolygonG = PolygonG(loadCsv("poly1"))
  lazy val poly2: PolygonG = PolygonG(loadCsv("poly2"))
  lazy val poly3: PolygonG = PolygonG(loadCsv("poly3"))
  lazy val norway: PolygonG = PolygonG(loadCsv("norway"))

  /** L shape (/root/reference/src/lib.rs:439-447, = ell.geojson). */
  lazy val ell: PolygonG = PolygonG(Seq(
    (0.0, 0.0), (4.0, 0.0), (4.0, 1.0), (1.0, 1.0), (1.0, 4.0), (0.0, 4.0), (0.0, 0.0)))

  /** Degenerate collinear ring (src/lib.rs:454). */
  lazy val degenerateA: PolygonG =
    PolygonG(Seq((0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (0.0, 0.0)))

  /** Degenerate bow-tie ring (src/lib.rs:461). */
  lazy val degenerateB: PolygonG =
    PolygonG(Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (1.0, 0.0), (0.0, 0.0)))

  /** 100x100 square with a 20x20 hole (src/lib.rs:468-470). */
  lazy val squareWithHole: PolygonG = PolygonG(
    Seq((0.0, 0.0), (100.0, 0.0), (100.0, 100.0), (0.0, 100.0)),
    Seq(Seq((60.0, 60.0), (60.0, 80.0), (80.0, 80.0), (80.0, 60.0))))

  /** Octagon outline with two triangular holes (FFI test,
    * /root/reference/src/ffi.rs:119-141).
    */
  lazy val hexagonTwoHoles: PolygonG = PolygonG(
    Seq((4.0, 1.0), (5.0, 2.0), (5.0, 3.0), (4.0, 4.0), (3.0, 4.0), (2.0, 3.0),
      (2.0, 2.0), (3.0, 1.0), (4.0, 1.0)),
    Seq(
      Seq((3.5, 3.5), (4.4, 2.0), (2.6, 2.0), (3.5, 3.5)),
      Seq((4.0, 3.0), (4.0, 3.2), (4.5, 3.2), (4.0, 3.0))))

  /** (name, polygon, reference tolerance) for every fixture with a pinned
    * expected point in the reference test-suite, plus Norway (bench).
    */
  lazy val all: Seq[(String, PolygonG, Double)] = Seq(
    ("poly1", poly1, 10.0),
    ("poly2", poly2, 1.0),
    ("poly3", poly3, 0.001),
    ("ell", ell, 0.1),
    ("degenerate_a", degenerateA, 1.0),
    ("degenerate_b", degenerateB, 1.0),
    ("square_with_hole", squareWithHole, 1.0),
    ("hexagon_two_holes", hexagonTwoHoles, 0.1),
    ("norway", norway, 1.0))
}
