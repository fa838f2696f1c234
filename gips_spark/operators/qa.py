"""X5 — QA/state bitfield unpacking (MODIS-style), pure Column ops.

The reference's MODIS driver reads per-pixel QA words and unpacks bit
fields (cloud state, shadow, land/water, aerosol) to build masks
(`gips/data/modis :: modisData.process`, SURVEY.md §2.8 X5).  Here the
unpack is expressed with `shiftrightunsigned` + `bitwiseAND` Column
expressions (JVM codegen, no UDF), in two shapes:

* `qa_unpack`        — scalar integer QA column → one column per field
* `qa_unpack_array`  — array<int> pixel band → per-field arrays via
                       `F.transform` (still JVM-side)
* `qa_cloud_keep_mask` — boolean keep-mask from unpacked fields

The default spec mirrors the public MODIS MOD09 1km state-QA layout
(bits 0-1 cloud state, 2 shadow, 3-5 land/water, 6-7 aerosol).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: field → (start_bit, n_bits); public MOD09 state-QA low byte
MODIS_STATE_QA_SPEC: dict[str, tuple[int, int]] = {
    "cloud_state": (0, 2),
    "cloud_shadow": (2, 1),
    "land_water": (3, 3),
    "aerosol": (6, 2),
}


def _field(qa_col, start: int, nbits: int):
    return F.shiftrightunsigned(qa_col.cast("long"), start).bitwiseAND(
        F.lit((1 << nbits) - 1)
    )


def qa_unpack(
    df: DataFrame, qa_col: str, spec: dict[str, tuple[int, int]] | None = None
) -> DataFrame:
    """Add one integer column per spec field, unpacked from `qa_col`."""
    spec = spec or MODIS_STATE_QA_SPEC
    for name, (start, nbits) in spec.items():
        df = df.withColumn(name, _field(F.col(qa_col), start, nbits).cast("int"))
    return df


def qa_unpack_array(
    df: DataFrame, qa_col: str, spec: dict[str, tuple[int, int]] | None = None
) -> DataFrame:
    """Array variant: per-pixel QA words → per-field int arrays (JVM
    `transform`, no Python hop) — for raster-chunk QA bands."""
    spec = spec or MODIS_STATE_QA_SPEC

    def unpacker(start: int, mask: int):
        # NB: F.transform inspects the lambda's arity — it must take
        # exactly one parameter, so capture via closure, not defaults.
        return lambda x: (
            F.shiftrightunsigned(x.cast("long"), start)
            .bitwiseAND(F.lit(mask))
            .cast("int")
        )

    for name, (start, nbits) in spec.items():
        df = df.withColumn(
            name, F.transform(F.col(qa_col), unpacker(start, (1 << nbits) - 1))
        )
    return df


def qa_cloud_keep_mask(
    df: DataFrame,
    qa_col: str,
    clear_states: tuple[int, ...] = (0, 3),
    allow_shadow: bool = False,
) -> DataFrame:
    """Boolean `keep` column: MOD09-style clear-sky filter (cloud state
    clear(0)/'not set'(3), optionally rejecting shadow pixels)."""
    state = _field(F.col(qa_col), *MODIS_STATE_QA_SPEC["cloud_state"])
    shadow = _field(F.col(qa_col), *MODIS_STATE_QA_SPEC["cloud_shadow"])
    keep = state.isin(list(clear_states))
    if not allow_shadow:
        keep = keep & (shadow == 0)
    return df.withColumn("keep", keep)
