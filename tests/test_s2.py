"""S2 indexer unit tests (no Spark) — SURVEY.md §5.2 layer 1."""

import numpy as np

from gips_spark.functions import geom, s2

RNG = np.random.default_rng(4242)
LAT = RNG.uniform(-89.9, 89.9, 50_000)
LNG = RNG.uniform(-180.0, 180.0, 50_000)


def test_roundtrip_center():
    cells = s2.latlng_to_cell(LAT, LNG, 13)
    clat, clng = s2.cell_to_center_latlng(cells)
    again = s2.latlng_to_cell(clat, clng, 13)
    assert np.array_equal(cells, again)


def test_level_field():
    for level in (5, 10, 13, 20, 30):
        cells = s2.latlng_to_cell(LAT[:1000], LNG[:1000], level)
        assert np.all(s2.cell_level(cells) == level)


def test_parent_containment():
    """level-12 ancestor's children range covers the level-13 id."""
    c13 = s2.latlng_to_cell(LAT[:5000], LNG[:5000], 13).view(np.uint64)
    c12 = s2.leaf_to_level(c13, 12)
    lsb12 = np.uint64(1) << np.uint64(2 * (30 - 12))
    lo = c12 - (lsb12 - np.uint64(1))
    hi = c12 + (lsb12 - np.uint64(1))
    assert np.all((c13 >= lo) & (c13 <= hi))


def test_face_bits_match_nearest_axis():
    p = s2.latlng_to_xyz(LAT[:5000], LNG[:5000])
    face, u, v = s2.xyz_to_face_uv(p)
    cells = s2.latlng_to_cell(LAT[:5000], LNG[:5000], 13).view(np.uint64)
    assert np.array_equal(cells >> np.uint64(61), face.astype(np.uint64))
    assert np.all(np.abs(u) <= 1.0 + 1e-12)
    assert np.all(np.abs(v) <= 1.0 + 1e-12)


def test_cardinal_points():
    """Cube-face centers land on the face-center leaf (st = 0.5 exactly)."""
    lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    lng = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    cells = s2.latlng_to_cell(lat, lng, 13).view(np.uint64)
    faces = (cells >> np.uint64(61)).astype(int)
    assert list(faces) == [0, 1, 2, 3, 4, 5]
    clat, clng = s2.cell_to_center_latlng(cells.view(np.int64))
    d = geom.haversine_m(lat, lng, clat, clng)
    # face center is a level-13 cell center: distance ≤ half cell diag (~600m)
    assert d.max() < 1000.0


def test_neighbor_cells_are_close():
    """Points 200m apart share a cell or sit in cells w/ nearby centers."""
    lat = RNG.uniform(-60, 60, 2000)
    lng = RNG.uniform(-179, 179, 2000)
    cells_a = s2.latlng_to_cell(lat, lng, 13)
    cells_b = s2.latlng_to_cell(lat + 0.0018, lng, 13)
    la, lo = s2.cell_to_center_latlng(cells_a)
    lb, lob = s2.cell_to_center_latlng(cells_b)
    d = geom.haversine_m(la, lo, lb, lob)
    assert d.max() < 5000.0  # level-13 cells ~1.2km wide


def test_determinism():
    a = s2.latlng_to_cell(LAT[:10000], LNG[:10000], 13)
    b = s2.latlng_to_cell(LAT[:10000].copy(), LNG[:10000].copy(), 13)
    assert np.array_equal(a, b)


# ---------------------------------------------------------------- KAV layer
# Known-answer corroboration against PUBLISHED S2 tokens.  Provenance:
# token prefixes that appear verbatim in public s2geometry docs / demos
# (e.g. the classic 37.422,-122.084 Mountain View example → 808fb…,
# NYC → 89c25…, Paris → 47e66…).  A prefix of k hex digits pins the face
# + the first ~2k Hilbert levels, so together these anchor the face
# mapping, the quadratic ST projection, and the orientation tables
# against the real library — not just self-consistency.

_ANCHORS = [
    # (lat, lng, published token prefix)
    (37.4220, -122.0840, "808fb"),   # Mountain View (s2geometry docs example)
    (40.7128, -74.0060, "89c25"),    # New York City
    (48.8566, 2.3522, "47e66"),      # Paris
    (51.5074, -0.1278, "4876"),      # London
]


def _token(cell_id_u64: int) -> str:
    return format(int(cell_id_u64), "016x").rstrip("0")


def test_published_token_anchors():
    for lat, lng, prefix in _ANCHORS:
        c = s2.latlng_to_cell(np.array([lat]), np.array([lng]), 13).view(np.uint64)[0]
        tok = _token(c)
        assert tok.startswith(prefix), f"({lat},{lng}): {tok} !~ {prefix}"


def test_face_cell_ids_match_spec_layout():
    """Face cells are 1,3,5,7,9,b << 60 — directly from the published
    id layout (face<<61 | 2^60); cube-face centers must land in them."""
    lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    lng = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    leaf = s2.latlng_to_cell(lat, lng, 30).view(np.uint64)
    face_cells = [(f << 61) | (1 << 60) for f in range(6)]
    for k, fc in enumerate(face_cells):
        lsb = 1 << 60
        lo, hi = fc - (lsb - 1), fc + (lsb - 1)
        assert lo <= int(leaf[k]) <= hi
        assert _token(fc) in ("1", "3", "5", "7", "9", "b")


def test_hilbert_adjacency():
    """Cells consecutive in id order at a level are edge-adjacent on the
    sphere (the defining Hilbert-curve property).  A wrong entry in the
    orientation tables breaks continuity with jumps ≫ one cell width."""
    level = 10
    step = np.uint64(1) << np.uint64(2 * (30 - level) + 1)
    sentinel = np.uint64(1) << np.uint64(2 * (30 - level))
    for face in range(6):
        base = np.uint64(face) << np.uint64(61)
        pos = np.arange(5000, dtype=np.uint64)
        ids = (base | (pos * step) | sentinel).view(np.int64)
        la, lo = s2.cell_to_center_latlng(ids)
        d = geom.haversine_m(la[:-1], lo[:-1], la[1:], lo[1:])
        # level-10 cells are ~8-10 km wide; adjacent centers < 2 widths
        assert d.max() < 25_000.0, f"face {face}: max jump {d.max():.0f} m"
