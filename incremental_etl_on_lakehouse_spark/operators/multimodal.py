"""Multimodal (image/audio/video) column handling.

Media are opaque ``binary`` columns with a typed metadata struct alongside;
all shape-changing work (decode, resize, frame-sample, feature-extract) runs
as Arrow-batched ``mapInPandas`` transforms so Python touches data in
columnar batches, never row-at-a-time.

Decode kernels: PNG images decode REAL via the pure-stdlib codec
(``png_codec`` — zlib inflate + scanline unfilter) and WAV audio decodes
REAL via stdlib ``wave``/``struct`` (``wav_codec``); only the non-PNG
image formats and video fall back to deterministic fakes behind
``decoder=`` callables (this container has no Pillow/ffmpeg), or raise
``NotImplementedError`` on the explicit real-codec path. The Spark-side
plumbing (schemas, batch iteration, partitioning behavior) is real and
tested; swapping in Pillow/ffmpeg is a one-function change.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", LongType()),
                    StructField("n_bytes", LongType()),
                ]
            ),
        ),
    ]
)


def attach_media_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Fill the cheap, library-free metadata fields (sizes, magic-number
    format sniffing) with built-in functions — no Python in this path."""
    c = F.col(content_col)
    magic = F.hex(F.substring(c, 1, 4))
    fmt = (
        F.when(magic.startswith("89504E47"), "png")
        .when(magic.startswith("FFD8"), "jpeg")
        .when(magic.startswith("52494646"), "riff-wav")
        .when(magic.startswith("59555634"), "y4m")  # "YUV4"MPEG2
        .otherwise("unknown")
    )
    return df.withColumn("sniffed_format", fmt).withColumn("n_bytes", F.length(c).cast("long"))


def fake_image_decoder(buf: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: 8 pseudo-pixel statistics
    derived from the byte content. Replace with Pillow/torchvision in
    production."""
    if not buf:
        return [0.0] * 8
    n = len(buf)
    return [
        float(n),
        float(buf[0]),
        float(buf[-1]),
        float(sum(buf[:64]) % 256),
        float(max(buf[:64])),
        float(min(buf[:64])),
        float(sum(buf) % 997),
        float((n * 2654435761) % 4093),
    ]


def real_image_decoder(buf: bytes) -> list[float]:
    """Real decode path: used automatically when Pillow is importable (it is
    optional — absent in some deployments), else raises with a clear message.
    Features: 8 image statistics (dims, mode arity, channel means/extremes) —
    the same shape as :func:`fake_image_decoder` so pipelines are swappable.
    """
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "real image decoding needs Pillow, not installed here; pass "
            "decoder=fake_image_decoder or install Pillow"
        ) from exc
    with Image.open(io.BytesIO(buf)) as im:
        im = im.convert("RGB")
        px = list(im.getdata())
        n = max(len(px), 1)
        means = [sum(p[c] for p in px) / n for c in range(3)]
        return [
            float(im.width),
            float(im.height),
            float(len(im.getbands())),
            means[0],
            means[1],
            means[2],
            float(max(max(p) for p in px) if px else 0),
            float(min(min(p) for p in px) if px else 0),
        ]


def builtin_image_decoder(buf: bytes) -> list[float]:
    """REAL decode without Pillow: the built-in pure-Python/numpy codecs —
    PNG (operators/png_codec.py — stdlib zlib + numpy, 8-bit gray/RGB/
    palette/alpha) and baseline JPEG (operators/jpeg_codec.py — JFIF
    sequential DCT, the dominant web-corpus format). Same 8-feature
    contract as :func:`real_image_decoder`: [width, height, bands, meanR,
    meanG, meanB, max, min]. Other formats raise ValueError."""
    from incremental_etl_on_lakehouse_spark.operators.jpeg_codec import (
        decode_jpeg,
    )
    from incremental_etl_on_lakehouse_spark.operators.png_codec import decode_png

    raw = bytes(buf)
    if raw[:2] == b"\xff\xd8":
        rgb = decode_jpeg(raw)
    else:
        rgb = decode_png(raw)
    h, w, _ = rgb.shape
    means = rgb.reshape(-1, 3).mean(axis=0)
    return [
        float(w),
        float(h),
        3.0,
        float(means[0]),
        float(means[1]),
        float(means[2]),
        float(rgb.max()),
        float(rgb.min()),
    ]


def auto_image_decoder(buf: bytes) -> list[float]:
    """PNG or baseline-JPEG bytes -> real built-in decode; anything else
    — including FFD8-magic streams the baseline decoder refuses
    (progressive/arithmetic/corrupt JPEG) — falls back to deterministic
    fake features, so mixed-format corpora keep flowing; the real path
    runs wherever it can."""
    head = bytes(buf[:8])
    if head == b"\x89PNG\r\n\x1a\n" or head[:2] == b"\xff\xd8":
        try:
            return builtin_image_decoder(buf)
        except ValueError:
            return fake_image_decoder(buf)
    return fake_image_decoder(buf)


def default_image_decoder() -> Callable[[bytes], list[float]]:
    """Pillow-backed decoder when available, else the built-in PNG-real /
    fake-fallback auto decoder."""
    try:  # pragma: no cover - depends on environment
        from PIL import Image  # noqa: F401  # type: ignore[import-not-found]

        return real_image_decoder
    except ImportError:
        return auto_image_decoder


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes], list[float]] = fake_image_decoder,
    content_col: str = "content",
    id_col: str = "media_id",
    type_col: str = "media_type",
) -> DataFrame:
    """Decode + featurize media via mapInPandas (Arrow batches).

    Each Python worker receives columnar batches; the decoder runs per cell
    but batch transfer amortizes serialization. Partitioning is preserved —
    no shuffle is introduced.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "media_type": pdf[type_col],
                    # NULL content cells arrive as None: decode as empty
                    # bytes instead of crashing the task (bytes(None) raises)
                    "features": [
                        decoder(bytes(b) if b is not None else b"")
                        for b in pdf[content_col]
                    ],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def real_audio_decoder(buf: bytes) -> tuple[int, int, list[int]]:
    """Library-backed decode (soundfile): the SAME ``(sample_rate,
    n_channels, interleaved int16 samples)`` contract as
    ``wav_codec.decode_wav``, so the two paths are swappable behind
    :func:`extract_audio_features` and must agree EXACTLY on 16-bit PCM
    WAV (soundfile reads int16 PCM losslessly with ``dtype='int16'``).
    Production corpora also land FLAC/OGG — soundfile covers those where
    the stdlib codec can't. Raises with a clear message when soundfile is
    absent (this container ships none)."""
    try:
        import io

        import soundfile as sf  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "real audio decoding needs soundfile, not installed here; pass "
            "decoder=wav_codec.decode_wav or install soundfile"
        ) from exc
    data, sr = sf.read(
        io.BytesIO(bytes(buf)), dtype="int16", always_2d=True
    )
    return int(sr), int(data.shape[1]), [int(x) for x in data.reshape(-1)]


def default_audio_decoder() -> Callable[[bytes], tuple[int, int, list[int]]]:
    """soundfile-backed decoder when available (wider format coverage),
    else the pure-stdlib 16-bit-PCM WAV codec — both honor the same
    return contract (and agree bit-exactly on PCM WAV, pinned by
    tests/test_multimodal_libs.py), so the Spark-side plumbing is
    identical either way."""
    try:  # pragma: no cover - depends on environment
        import soundfile  # noqa: F401  # type: ignore[import-not-found]

        return real_audio_decoder
    except ImportError:
        from incremental_etl_on_lakehouse_spark.operators.wav_codec import (
            decode_wav,
        )

        return decode_wav


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("sum_samples", LongType()),
        StructField("min_sample", IntegerType()),
        StructField("max_sample", IntegerType()),
    ]
)


def extract_audio_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    decoder: Callable[[bytes], tuple[int, int, list[int]]] | None = None,
) -> DataFrame:
    """Decode WAV audio and emit integer-exact per-clip statistics via
    mapInPandas (Arrow batches). Unlike the image path, the DEFAULT
    decoder here is always a real codec — soundfile when importable,
    else the pure-stdlib ``wav_codec.decode_wav`` — so the audio pipeline
    is genuinely bytes -> samples -> stats with no required dependency. Statistics are integers (sum/min/max of
    int16 PCM), bit-identical on any engine or retry, so the path is
    full-oracle checkable. Partitioning preserved; no shuffle."""
    if decoder is None:
        decoder = default_audio_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "sample_rate": [], "n_channels": [],
                "n_samples": [], "sum_samples": [], "min_sample": [],
                "max_sample": [],
            }
            for mid, b in zip(pdf[id_col], pdf[content_col]):
                sr, nch, samples = decoder(bytes(b) if b is not None else b"")
                out["media_id"].append(mid)
                out["sample_rate"].append(sr)
                out["n_channels"].append(nch)
                out["n_samples"].append(len(samples))
                out["sum_samples"].append(sum(samples))
                out["min_sample"].append(min(samples) if samples else 0)
                out["max_sample"].append(max(samples) if samples else 0)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


VIDEO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("frame_index", IntegerType()),
        StructField("sum_y", LongType()),
        StructField("sum_u", LongType()),
        StructField("sum_v", LongType()),
    ]
)


def extract_video_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    decoder: Callable | None = None,
) -> DataFrame:
    """Decode YUV4MPEG2 video and emit one row per frame with
    integer-exact plane statistics, via mapInPandas (Arrow batches).
    Like the audio path, the DEFAULT decoder is a real codec —
    ``y4m_codec.decode_y4m`` is pure stdlib byte slicing over a real
    interchange format — so the video pipeline is genuinely
    bytes -> frames -> stats. The per-frame explode happens inside the
    worker (no shuffle); sums of uint8 planes are exact integers, so the
    path is full-oracle checkable."""
    if decoder is None:
        from incremental_etl_on_lakehouse_spark.operators.y4m_codec import (
            decode_y4m,
        )

        decoder = decode_y4m

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "width": [], "height": [], "n_frames": [],
                "frame_index": [], "sum_y": [], "sum_u": [], "sum_v": [],
            }
            for mid, b in zip(pdf[id_col], pdf[content_col]):
                w, h, _fps, frames = decoder(bytes(b) if b is not None else b"")
                for fi, (y, u, v) in enumerate(frames):
                    out["media_id"].append(mid)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_frames"].append(len(frames))
                    out["frame_index"].append(fi)
                    out["sum_y"].append(sum(y))
                    out["sum_u"].append(sum(u))
                    out["sum_v"].append(sum(v))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, VIDEO_FEATURE_SCHEMA)


def sample_video_frames(
    df: DataFrame,
    every_nth_byte: int = 1024,
    max_frames: int = 8,
    content_col: str = "content",
) -> DataFrame:
    """Frame-sampling plumbing: emits one row per sampled "frame" with a
    frame index and a byte-slice standing in for the decoded frame. The
    slicing/explode shape matches a real ffmpeg-backed sampler; only the
    decode is fake."""
    c = F.col(content_col)
    idx = F.sequence(
        F.lit(0),
        F.least(
            F.greatest((F.length(c) / every_nth_byte).cast("int") - 1, F.lit(0)),
            F.lit(max_frames - 1),
        ),
    )
    return df.select(
        "media_id",
        F.posexplode(
            F.transform(idx, lambda i: F.substring(c, i * every_nth_byte + 1, 16))
        ).alias("frame_index", "frame_bytes"),
    )


def fake_resize(buf: bytes, width: int = 4, height: int = 4) -> list[int]:
    """Deterministic fake resize: a width*height "thumbnail" of evenly
    strided byte samples. Same signature/shape as :func:`real_resize`, so
    pipelines swap decoders without schema changes."""
    n = width * height
    stride = max(1, len(buf) // n)
    last = max(len(buf) - 1, 0)
    return [buf[min(i * stride, last)] if buf else 0 for i in range(n)]


def real_resize(buf: bytes, width: int = 4, height: int = 4) -> list[int]:
    """Pillow-backed thumbnail: decode, LANCZOS-resize to (width, height),
    return the grayscale pixel grid row-major. Raises with a clear message
    when Pillow is absent (this container ships none)."""
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "real resize needs Pillow, not installed here; pass "
            "resizer=fake_resize or install Pillow"
        ) from exc
    with Image.open(io.BytesIO(buf)) as im:
        im = im.convert("L").resize((width, height))
        return [int(p) for p in im.getdata()]


def builtin_resize(buf: bytes, width: int = 4, height: int = 4) -> list[int]:
    """REAL resize without Pillow: built-in PNG or baseline-JPEG decode ->
    ITU-R 601 luma (Pillow's convert("L") formula) -> deterministic
    box-average thumbnail, row-major ints — the same signature/shape as
    :func:`real_resize`/:func:`fake_resize`. Other formats raise
    ValueError."""
    from incremental_etl_on_lakehouse_spark.operators.jpeg_codec import (
        decode_jpeg,
    )
    from incremental_etl_on_lakehouse_spark.operators.png_codec import (
        box_resize,
        decode_png,
        luma,
    )

    raw = bytes(buf)
    rgb = decode_jpeg(raw) if raw[:2] == b"\xff\xd8" else decode_png(raw)
    gray = luma(rgb)
    return [int(p) for p in box_resize(gray, width, height).reshape(-1)]


def auto_resize(buf: bytes, width: int = 4, height: int = 4) -> list[int]:
    """PNG or baseline-JPEG bytes -> real built-in resize; anything else
    (including FFD8 streams the baseline decoder refuses) -> fake strided
    thumbnail (mixed-format corpora keep flowing)."""
    head = bytes(buf[:8])
    if head == b"\x89PNG\r\n\x1a\n" or head[:2] == b"\xff\xd8":
        try:
            return builtin_resize(buf, width, height)
        except ValueError:
            return fake_resize(buf, width, height)
    return fake_resize(buf, width, height)


def default_resizer() -> Callable[[bytes], list[int]]:
    """Pillow-backed resize when available, else the built-in PNG-real /
    fake-fallback auto resizer."""
    try:  # pragma: no cover - depends on environment
        from PIL import Image  # noqa: F401  # type: ignore[import-not-found]

        return real_resize
    except ImportError:
        return auto_resize


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("pixels", ArrayType(IntegerType())),
    ]
)


def resize_images(
    df: DataFrame,
    width: int = 4,
    height: int = 4,
    resizer: Callable[[bytes], list[int]] = fake_resize,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Batch image resize via mapInPandas (Arrow): the shape-changing step
    between decode and feature extraction. Partitioning preserved — no
    shuffle; the Python cost is per-cell, amortized by Arrow batch
    transfer. At 100 TB this is the scan-bound media-prep pattern: bytes
    in, fixed-size thumbnail arrays out, one pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "out_w": width,
                    "out_h": height,
                    "pixels": [
                        resizer(bytes(b) if b is not None else b"", width, height)
                        for b in pdf[content_col]
                    ],
                }
            )

    return df.mapInPandas(run, RESIZE_SCHEMA)
