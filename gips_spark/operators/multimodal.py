"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow kernels
over mapInPandas.  The image/audio codecs are NOT in this container, so
the decode step is a clearly-marked deterministic STUB (hash-seeded
fake pixels) behind the same signature a real decoder would have — the
Spark-side plumbing (schema, partitioning, UDF signature, batch shape)
is real and tested.  Swap `_decode_stub` for a PIL/ffmpeg call on a
real cluster.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("frame", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

REAL_DECODERS_AVAILABLE = False  # no PIL/ffmpeg in this container


def _decode_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder: deterministic fake pixels seeded by the payload hash.

    A real decoder (PIL.Image.open / av) drops in here unchanged; raise
    if callers explicitly require real decoding.
    """
    h = np.uint64(0xCBF29CE484222325)
    for b in payload[:64]:
        h ^= np.uint64(b)
        h *= np.uint64(0x100000001B3)
    rng = np.random.default_rng(int(h) & 0xFFFFFFFF)
    return rng.random((height, width), dtype=np.float64)


def decode_or_raise(*_a, **_k):
    raise NotImplementedError(
        "real image/audio decoding requires PIL/ffmpeg (not in this "
        "container); use the deterministic stub path (extract_features)"
    )


def make_assets(spark, n: int = 64) -> DataFrame:
    """Synthetic multimodal asset table (binary payload from xxhash bytes)."""
    idc = F.col("id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(idc, F.lit(3)) + 1).cast("int"),
    )
    payload = F.encode(
        F.concat(F.lit("payload-"), F.sha2(idc.cast("string"), 256)), "utf-8"
    ).cast("binary")
    return spark.range(n).select(
        F.concat(F.lit("A"), idc.cast("string")).alias("asset_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.lit(16).alias("width"),
        F.lit(16).alias("height"),
        F.when(kind == "video", F.lit(8)).otherwise(F.lit(1)).alias("n_frames"),
    )


def extract_features(
    assets: DataFrame, resize_to: int = 8, sample_every: int = 2
) -> DataFrame:
    """decode → frame-sample → resize → mean-pool features, one Arrow pass.

    Batch shape: mapInPandas over asset rows; per row: n_frames/sample
    feature rows.  Real pipelines swap `_decode_stub` only.
    """

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                frames = range(0, int(r["n_frames"]), sample_every)
                for fr in frames:
                    img = _decode_stub(
                        bytes(r["payload"]) + bytes([fr]), int(r["width"]), int(r["height"])
                    )
                    # block-mean resize to (resize_to, resize_to)
                    bh = img.shape[0] // resize_to
                    bw = img.shape[1] // resize_to
                    small = img[: bh * resize_to, : bw * resize_to].reshape(
                        resize_to, bh, resize_to, bw
                    ).mean(axis=(1, 3))
                    out.append(
                        {
                            "asset_id": r["asset_id"],
                            "kind": r["kind"],
                            "frame": fr,
                            "features": small.ravel().astype(np.float32).tolist(),
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return assets.mapInPandas(kernel, schema=FEATURE_SCHEMA)
