"""S2 cell ids, vectorized in numpy — faithful to the public S2 spec.

Implements lat/lng → S2 cell id at a given level (default 13, per
BASELINE.json) exactly as the public s2geometry library defines it:

  1. lat/lng → unit XYZ,
  2. XYZ → cube face (largest absolute component) + (u, v) gnomonic
     face coordinates,
  3. (u, v) → (s, t) via the quadratic projection,
  4. (s, t) → leaf (i, j) at 2^30 resolution,
  5. (face, i, j) → 64-bit leaf cell id along the face-local Hilbert
     curve, built 4 bits at a time with lookup tables generated from
     the published recursion (kPosToIJ / kPosToOrientation),
  6. leaf id → ancestor at the requested level (sentinel-bit layout).

No external data: the Hilbert lookup tables are *generated* at import
from the 4-entry canonical order tables, exactly like s2geometry's
``MaybeInit``.  Cell ids produced here equal real S2 cell ids.

Reference semantics (what the ids are for) mirror the reference's tile
grid: GIPS assigns every asset to a grid tile (`gips/data/core.py ::
Repository.vector2tiles`, see SURVEY.md §2.3 J1); here every record gets
an s2_13 cell the same way.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP_MASK = 1
_INVERT_MASK = 2

# Canonical Hilbert traversal order (public spec): kPosToIJ[orientation][pos]
# gives ij = i*2+j of sub-cell `pos` under `orientation`.
_POS_TO_IJ = (
    (0, 1, 3, 2),  # canonical order
    (0, 2, 3, 1),  # axes swapped
    (3, 2, 0, 1),  # bits inverted
    (3, 1, 0, 2),  # swapped & inverted
)
_POS_TO_ORIENTATION = (_SWAP_MASK, 0, 0, _SWAP_MASK | _INVERT_MASK)


def _init_lookup() -> tuple[np.ndarray, np.ndarray]:
    """Generate the 1024-entry ij→pos and pos→ij tables (public recursion)."""
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)

    def init_cell(level, i, j, orig_orientation, pos, orientation):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orientation] = (pos << 2) + orientation
            lookup_ij[(pos << 2) + orig_orientation] = (ij << 2) + orientation
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orientation]
        for index in range(4):
            init_cell(
                level,
                i + (r[index] >> 1),
                j + (r[index] & 1),
                orig_orientation,
                pos + index,
                orientation ^ _POS_TO_ORIENTATION[index],
            )

    for orientation in range(4):
        init_cell(0, 0, 0, orientation, 0, orientation)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _init_lookup()


def latlng_to_xyz(lat_deg: np.ndarray, lng_deg: np.ndarray) -> np.ndarray:
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    theta = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cos_phi = np.cos(phi)
    return np.stack(
        [cos_phi * np.cos(theta), cos_phi * np.sin(theta), np.sin(phi)], axis=-1
    )


def xyz_to_face_uv(p: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Largest-absolute-component face + gnomonic (u, v), per the spec."""
    ax = np.abs(p)
    axis = np.argmax(ax, axis=-1)
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    major = np.take_along_axis(p, axis[..., None], axis=-1)[..., 0]
    face = np.where(major >= 0, axis, axis + 3).astype(np.int64)

    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve) in enumerate(
        [
            (lambda: y / x, lambda: z / x),  # face 0 (+x)
            (lambda: -x / y, lambda: z / y),  # face 1 (+y)
            (lambda: -x / z, lambda: -y / z),  # face 2 (+z)
            (lambda: z / x, lambda: y / x),  # face 3 (-x)
            (lambda: z / y, lambda: -x / y),  # face 4 (-y)
            (lambda: -y / z, lambda: -x / z),  # face 5 (-z)
        ]
    ):
        m = face == f
        if np.any(m):
            # divide/invalid/over: every branch is evaluated elementwise
            # but only the masked face's values are kept — off-face rows
            # can divide by ~0 (tiny minor axis) and overflow harmlessly
            with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
                u = np.where(m, ue(), u)
                v = np.where(m, ve(), v)
    return face, u, v


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic (s, t) projection — the spec's default."""
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0.0,
            0.5 * np.sqrt(1.0 + 3.0 * u),
            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u),
        )


def st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def st_to_ij(s: np.ndarray) -> np.ndarray:
    limit = (1 << MAX_LEVEL) - 1
    return np.clip(np.floor(s * (1 << MAX_LEVEL)).astype(np.int64), 0, limit)


def face_ij_to_leaf_id(
    face: np.ndarray, i: np.ndarray, j: np.ndarray
) -> np.ndarray:
    """(face, i, j) → 64-bit leaf cell id (vectorized FromFaceIJ)."""
    face_u = face.astype(np.uint64)
    i_u = i.astype(np.uint64)
    j_u = j.astype(np.uint64)
    n = face_u << np.uint64(60)
    bits = face_u & np.uint64(_SWAP_MASK)
    mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        shift = np.uint64(k * _LOOKUP_BITS)
        bits += ((i_u >> shift) & mask) << np.uint64(_LOOKUP_BITS + 2)
        bits += ((j_u >> shift) & mask) << np.uint64(2)
        bits = _LOOKUP_POS[bits]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP_MASK | _INVERT_MASK)
    return ((n << np.uint64(1)) | np.uint64(1)).astype(np.uint64)


def leaf_to_level(leaf_id: np.ndarray, level: int) -> np.ndarray:
    """Ancestor of a leaf id at `level` (sentinel lsb layout, per spec)."""
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    neg_lsb = (~lsb + np.uint64(1)).astype(np.uint64)  # two's complement -lsb
    return ((leaf_id.astype(np.uint64) & neg_lsb) | lsb).astype(np.uint64)


def latlng_to_cell(
    lat_deg: np.ndarray, lng_deg: np.ndarray, level: int = 13
) -> np.ndarray:
    """lat/lng degrees → int64 S2 cell id at `level` (reinterpreted bits).

    Returned as signed int64 (same bit pattern as the canonical uint64 id)
    so it stores directly in a Spark LongType column.
    """
    p = latlng_to_xyz(lat_deg, lng_deg)
    face, u, v = xyz_to_face_uv(p)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    leaf = face_ij_to_leaf_id(face, i, j)
    return leaf_to_level(leaf, level).view(np.int64)


def cell_level(cell_id: np.ndarray) -> np.ndarray:
    """Level of a cell id = 30 - (position of lowest set bit)/2."""
    c = cell_id.view(np.uint64) if cell_id.dtype == np.int64 else cell_id
    lsb = c & (~c + np.uint64(1))
    # log2 of lsb via float conversion is exact for powers of two < 2^53;
    # lsb can be up to 2^60, so use bit-length via frexp on uint64→float64:
    # powers of two up to 2^63 are exactly representable in float64.
    log2 = np.round(np.log2(lsb.astype(np.float64))).astype(np.int64)
    return 30 - log2 // 2


def cell_to_center_latlng(cell_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Center lat/lng (degrees) of a cell id — inverse transform chain."""
    c = np.asarray(cell_id).view(np.uint64)
    face = (c >> np.uint64(61)).astype(np.int64)
    lvl = cell_level(c)
    # decode Hilbert position back to leaf (i, j) at the cell center:
    # center leaf = cell id itself (the sentinel bit marks the center).
    i = np.zeros(c.shape, dtype=np.uint64)
    j = np.zeros(c.shape, dtype=np.uint64)
    bits = (c >> np.uint64(61)) & np.uint64(_SWAP_MASK)
    pos = (c >> np.uint64(1)) & ((np.uint64(1) << np.uint64(60)) - np.uint64(1))
    for k in range(7, -1, -1):
        nbits = (pos >> np.uint64(k * 8)) & np.uint64(0xFF)
        bits += nbits << np.uint64(2)
        bits = _LOOKUP_IJ[bits]
        i |= ((bits >> np.uint64(_LOOKUP_BITS + 2)) & np.uint64(0xF)) << np.uint64(
            k * 4
        )
        j |= ((bits >> np.uint64(2)) & np.uint64(0xF)) << np.uint64(k * 4)
        bits &= np.uint64(_SWAP_MASK | _INVERT_MASK)
    # For a non-leaf cell the low bits of (i, j) decoded from the padded
    # position are the sub-path of the sentinel; the true center st is the
    # cell's ij prefix + half the cell size.
    shift = (2 * (MAX_LEVEL - lvl)).astype(np.uint64)
    size = (np.uint64(1) << (shift // np.uint64(2))).astype(np.uint64)
    i_lo = (i >> (shift // np.uint64(2))) << (shift // np.uint64(2))
    j_lo = (j >> (shift // np.uint64(2))) << (shift // np.uint64(2))
    si = (2 * i_lo + size).astype(np.float64) / float(2 << MAX_LEVEL)
    ti = (2 * j_lo + size).astype(np.float64) / float(2 << MAX_LEVEL)
    u = st_to_uv(si)
    v = st_to_uv(ti)
    # face uv → xyz (inverse of xyz_to_face_uv), per the spec's FaceUVtoXYZ.
    ones = np.ones_like(u)
    xyz = np.empty(u.shape + (3,), dtype=np.float64)
    comp = {
        0: (ones, u, v),
        1: (-u, ones, v),
        2: (-u, -v, ones),
        3: (-ones, -v, -u),
        4: (v, -ones, -u),
        5: (v, u, -ones),
    }
    for f, (x_, y_, z_) in comp.items():
        m = face == f
        if np.any(m):
            xyz[m, 0] = np.broadcast_to(x_, u.shape)[m]
            xyz[m, 1] = np.broadcast_to(y_, u.shape)[m]
            xyz[m, 2] = np.broadcast_to(z_, u.shape)[m]
    norm = np.sqrt((xyz**2).sum(axis=-1))
    xyz /= norm[..., None]
    lat = np.degrees(np.arcsin(np.clip(xyz[..., 2], -1, 1)))
    lng = np.degrees(np.arctan2(xyz[..., 1], xyz[..., 0]))
    return lat, lng
