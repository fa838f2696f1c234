"""S2 cell ids re-implemented in pure ANSI/DuckDB SQL — oracle generator.

Purpose: give the driver's correctness gate a REAL value oracle for the
``cell_counts_s2`` query.  The engine computes S2 level-13 ids with the
vectorized numpy pipeline (functions/s2.py); this module emits a DuckDB
SQL query that recomputes the same ids through an *independent
arithmetic path*: SQL trig → CASE-based cube-face selection → quadratic
ST projection → floor-quantized (i, j) → the 8-step Hilbert lookup loop
as eight chained CTE joins against a 1024-row literal lookup table.

The only shared artifact between the two paths is the lookup table
itself, which is generated (in s2.py) from the 4-entry public recursion
(kPosToIJ / kPosToOrientation) — the SQL does not share any numpy code,
so a bug in the transform chain on either side breaks the hash match.

Numeric note: both engines use IEEE doubles; the floor(s·2^30)
quantization could in principle flip on a ≤few-ulp libm difference, but
the probability per point is ~1e-6 (error ~1e-7 of a quantum), and the
correctness gate runs a fixed 10^4-point input — verified exact on it.
"""

from __future__ import annotations

from gips_spark.functions.s2 import _LOOKUP_POS, MAX_LEVEL


def lookup_table_cte() -> str:
    """1024-row (key, val) literal table for the Hilbert 4-bit step."""
    rows = ",".join(f"({k},{int(v)})" for k, v in enumerate(_LOOKUP_POS))
    return f"s2lut(k, v) AS (SELECT * FROM (VALUES {rows}))"


def cell_id_sql(pts_cte_body: str, level: int = 13, id_alias: str = "s2_13") -> str:
    """Full SQL computing the level-`level` S2 id for every row of the
    `pts` CTE (must expose event_id, lat, lon).  Returns a query ending
    in ``SELECT event_id, {id_alias} FROM ...``."""
    # ---- face / (u,v) / (s,t) / (i,j) --------------------------------
    head = f"""
WITH {pts_cte_body},
{lookup_table_cte()},
xyz AS (
  SELECT event_id,
         cos(radians(lat)) * cos(radians(lon)) AS x,
         cos(radians(lat)) * sin(radians(lon)) AS y,
         sin(radians(lat)) AS z
  FROM pts),
fuv AS (
  SELECT event_id,
         CASE WHEN abs(x) >= abs(y) AND abs(x) >= abs(z)
                THEN CASE WHEN x >= 0 THEN 0 ELSE 3 END
              WHEN abs(y) >= abs(x) AND abs(y) >= abs(z)
                THEN CASE WHEN y >= 0 THEN 1 ELSE 4 END
              ELSE CASE WHEN z >= 0 THEN 2 ELSE 5 END END AS face,
         x, y, z
  FROM xyz),
uv AS (
  SELECT event_id, face,
         CASE face WHEN 0 THEN y / x  WHEN 1 THEN -x / y WHEN 2 THEN -x / z
                   WHEN 3 THEN z / x  WHEN 4 THEN z / y  ELSE -y / z END AS u,
         CASE face WHEN 0 THEN z / x  WHEN 1 THEN z / y  WHEN 2 THEN -y / z
                   WHEN 3 THEN y / x  WHEN 4 THEN -x / y ELSE -x / z END AS v
  FROM fuv),
st AS (
  SELECT event_id, face,
         CASE WHEN u >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * u)
              ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * u) END AS s,
         CASE WHEN v >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * v)
              ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * v) END AS t
  FROM uv),
ij AS (
  SELECT event_id, face,
         least({(1 << MAX_LEVEL) - 1}, greatest(0,
             CAST(floor(s * {1 << MAX_LEVEL}) AS BIGINT))) AS i,
         least({(1 << MAX_LEVEL) - 1}, greatest(0,
             CAST(floor(t * {1 << MAX_LEVEL}) AS BIGINT))) AS j
  FROM st),
h8 AS (
  SELECT event_id, face, i, j,
         CAST(face AS HUGEINT) * {1 << 60} AS n,
         face & 1 AS bits
  FROM ij)"""
    # ---- 8 Hilbert lookup steps, k = 7 … 0 ---------------------------
    steps = []
    prev = "h8"
    for k in range(7, -1, -1):
        cur = f"h{k}"
        shift = 4 * k
        steps.append(
            f""",
{cur} AS (
  SELECT p.event_id, p.i, p.j,
         p.n + CAST(l.v >> 2 AS HUGEINT) * {1 << (k * 8)} AS n,
         l.v & 3 AS bits
  FROM {prev} p
  JOIN s2lut l
    ON l.k = (((p.i >> {shift}) & 15) << 6)
         + (((p.j >> {shift}) & 15) << 2) + p.bits)"""
        )
        prev = cur
    # ---- leaf id, ancestor at `level`, unsigned→signed ---------------
    lsb_shift = 2 * (MAX_LEVEL - level)
    tail = f""",
leaf AS (
  SELECT event_id, n * 2 + 1 AS leaf_u FROM {prev}),
cell AS (
  SELECT event_id,
         (leaf_u // {1 << (lsb_shift + 1)}) * {1 << (lsb_shift + 1)}
           + {1 << lsb_shift} AS id_u
  FROM leaf)
SELECT event_id,
       CAST(CASE WHEN id_u >= 9223372036854775808
                 THEN id_u - 18446744073709551616
                 ELSE id_u END AS BIGINT) AS {id_alias}
FROM cell"""
    return head + "".join(steps) + tail
