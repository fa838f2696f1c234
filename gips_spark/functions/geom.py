"""Planar/spherical geometry kernels (numpy, vectorized).

* haversine — exact great-circle distance (meters, mean Earth radius).
* PreparedPolygon — precomputed edge arrays + bbox for a polygon with
  optional holes; `contains()` is a vectorized even-odd ray-casting
  test (the "prepared-geometry ray-casting kernel" of BASELINE.json).

Reference parity: GIPS intersects site polygons with tile-grid polygons
via OGR (`gips/data/core.py :: Repository.vector2tiles`, SURVEY.md §2.3
J1/J2); the engine replaces OGR with these kernels.

Conventions: coordinates are (lon, lat) degrees in rings; boundary
semantics are even-odd with half-open edges (a point exactly on a
vertex/edge lands deterministically on one side — fine for goldens,
documented for users).  Polygons must not cross the antimeridian or
poles (v1 exclusion, per FIXTURES.md).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6371008.8  # IUGG mean Earth radius


def haversine_m(lat1, lon1, lat2, lon2):
    """Great-circle distance in meters between (lat1,lon1) and (lat2,lon2).

    All args degrees; broadcasts like numpy.
    """
    p1 = np.radians(np.asarray(lat1, dtype=np.float64))
    p2 = np.radians(np.asarray(lat2, dtype=np.float64))
    dphi = p2 - p1
    dlmb = np.radians(np.asarray(lon2, dtype=np.float64)) - np.radians(
        np.asarray(lon1, dtype=np.float64)
    )
    a = np.sin(dphi / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlmb / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


class PreparedPolygon:
    """Polygon (outer ring + holes) prepared for vectorized ray casting.

    Edges are flattened into four parallel arrays (x1, y1, x2, y2) across
    all rings — even-odd counting makes hole handling free.  Horizontal
    edges never contribute crossings (y1 == y2 excluded by the strict /
    non-strict y test), matching the classic algorithm.
    """

    __slots__ = ("x1", "y1", "x2", "y2", "bbox")

    def __init__(self, rings: list[list[tuple[float, float]]]):
        xs1, ys1, xs2, ys2 = [], [], [], []
        for ring in rings:
            pts = np.asarray(ring, dtype=np.float64)
            if len(pts) < 3:
                continue
            # drop an explicit closing vertex; we close implicitly
            if np.allclose(pts[0], pts[-1]):
                pts = pts[:-1]
            nxt = np.roll(pts, -1, axis=0)
            xs1.append(pts[:, 0])
            ys1.append(pts[:, 1])
            xs2.append(nxt[:, 0])
            ys2.append(nxt[:, 1])
        self.x1 = np.concatenate(xs1)
        self.y1 = np.concatenate(ys1)
        self.x2 = np.concatenate(xs2)
        self.y2 = np.concatenate(ys2)
        allx = np.concatenate([self.x1, self.x2])
        ally = np.concatenate([self.y1, self.y2])
        self.bbox = (allx.min(), ally.min(), allx.max(), ally.max())

    def contains(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Even-odd ray-cast containment for point arrays (degrees)."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        minx, miny, maxx, maxy = self.bbox
        out = np.zeros(lon.shape, dtype=bool)
        cand = (lon >= minx) & (lon <= maxx) & (lat >= miny) & (lat <= maxy)
        if not np.any(cand):
            return out
        px = lon[cand]
        py = lat[cand]
        # edge straddles the horizontal ray through py (half-open in y)
        y1 = self.y1[None, :]
        y2 = self.y2[None, :]
        x1 = self.x1[None, :]
        x2 = self.x2[None, :]
        pyc = py[:, None]
        straddle = (y1 > pyc) != (y2 > pyc)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (pyc - y1) * (x2 - x1) / (y2 - y1)
        crossings = straddle & (px[:, None] < xint)
        out[cand] = (crossings.sum(axis=1) % 2).astype(bool)
        return out

    def contains_chunked(
        self, lon: np.ndarray, lat: np.ndarray, chunk: int = 4096
    ) -> np.ndarray:
        """contains() in bounded-memory chunks (n_points × n_edges blocks)."""
        n = len(lon)
        out = np.zeros(n, dtype=bool)
        for s in range(0, n, chunk):
            out[s : s + chunk] = self.contains(lon[s : s + chunk], lat[s : s + chunk])
        return out


def rings_to_prepared(rings) -> PreparedPolygon:
    """Build PreparedPolygon from the `extents.rings` column value
    (array<array<struct<lon,lat>>> as nested lists/dicts from Spark rows)."""
    norm = []
    for ring in rings:
        pts = []
        for p in ring:
            if isinstance(p, dict):
                pts.append((float(p["lon"]), float(p["lat"])))
            else:  # Row or tuple
                lonv = p[0] if not hasattr(p, "lon") else p.lon
                latv = p[1] if not hasattr(p, "lat") else p.lat
                pts.append((float(lonv), float(latv)))
        norm.append(pts)
    return PreparedPolygon(norm)


def point_in_rings_bruteforce(rings, lon: float, lat: float) -> bool:
    """Scalar winding-free even-odd oracle (independent of PreparedPolygon's
    vectorization) used only by tests/golden generators."""
    inside = False
    for ring in rings:
        pts = [(float(p[0]), float(p[1])) for p in ring]
        if len(pts) >= 2 and pts[0] == pts[-1]:
            pts = pts[:-1]
        n = len(pts)
        for k in range(n):
            x1, y1 = pts[k]
            x2, y2 = pts[(k + 1) % n]
            if (y1 > lat) != (y2 > lat):
                xint = x1 + (lat - y1) * (x2 - x1) / (y2 - y1)
                if lon < xint:
                    inside = not inside
    return inside
