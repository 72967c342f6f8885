"""PySpark-callable parity demo for the reference's Python surface.

The reference exposes `label_position(polygon, tolerance)` from Python via
a C FFI (reference ffi.py:110-131). The graft equivalent is the session
extension: any PySpark user gets `polylabel(...)` (and the rest of the
function surface) as SQL functions with NO Python-side code, because
`graft.functions.GraftExtensions` registers native Catalyst expressions.

Run (driver-side tooling only — pyspark is not a library dependency):

    sbt -batch package
    python3 tools/pyspark_parity.py

Expected output: the exact center (2.0, 2.0) with clearance 2.0 for an
axis-aligned 4x4 square — for that shape the centroid seed is already
optimal at any tolerance, so the label is provably exact (the same
invariant the Scala TilingSpec pins).
"""
import glob
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jars = glob.glob(os.path.join(repo, "target", "scala-2.13", "*.jar"))
if not jars:
    sys.exit("build the jar first: sbt -batch package")

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[2]")
    .appName("graft-pyspark-parity")
    .config("spark.jars", jars[0])
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

# A polygon with a provably exact label: for an axis-aligned square the
# centroid seed is already optimal and `best` only improves on STRICTLY
# greater clearance, so polylabel returns the exact center at any
# tolerance — the same invariant the Scala TilingSpec asserts.
SQ = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
ext = ", ".join(f"struct({x}D AS x, {y}D AS y)" for x, y in SQ)
row = spark.sql(
    f"""SELECT polylabel(
          array({ext}),
          CAST(NULL AS ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>),
          0.001D) AS label"""
).first()

x, y, dist = row.label.x, row.label.y, row.label.dist
print(f"label_position(square4, 0.001) = ({x}, {y}), clearance {dist}")
assert (x, y, dist) == (2.0, 2.0, 2.0), (x, y, dist)

# the DataFrame Column surface works from Python too (call_function path)
from pyspark.sql import functions as F  # noqa: E402

df = spark.range(3).select(
    F.call_function("cell_of", F.lit(10.0), F.lit(60.0), F.lit(12)).alias("cell")
)
cells = [r.cell for r in df.collect()]
assert len(set(cells)) == 1 and cells[0] > 0
print(f"cell_of(10, 60, 12) = {cells[0]}")
print("PySpark parity: OK")
spark.stop()
