"""Library-backed multimodal decode behind the existing Arrow seam.

Round-11 verdict item 5: the optional Pillow/soundfile decode paths slot
in behind the SAME decoder contract as the pure-stdlib codecs, and the
two paths must agree on the planted fixtures. Every test here is
import-gated BOTH ways: in a bare container the without-library tests
run (clean NotImplementedError, stdlib default chosen); with the
libraries installed the agreement tests run instead — so the suite is
green in either environment and the seam is proven from both sides.
"""

from __future__ import annotations

from importlib.util import find_spec

import numpy as np
import pytest

from incremental_etl_on_lakehouse_spark.operators.multimodal import (
    builtin_image_decoder,
    default_audio_decoder,
    default_image_decoder,
    extract_audio_features,
    real_audio_decoder,
    real_image_decoder,
    real_resize,
)
from incremental_etl_on_lakehouse_spark.operators.png_codec import encode_png
from incremental_etl_on_lakehouse_spark.operators.wav_codec import (
    decode_wav,
    encode_wav,
)

HAS_PIL = find_spec("PIL") is not None
HAS_SF = find_spec("soundfile") is not None


def _planted_png() -> bytes:
    rng = np.random.default_rng(1107)
    rgb = rng.integers(0, 256, size=(12, 9, 3), dtype=np.uint8)
    return encode_png(rgb)


def _planted_wav(stereo: bool = False) -> bytes:
    rng = np.random.default_rng(2211)
    n = 480 * (2 if stereo else 1)
    samples = [int(x) for x in rng.integers(-32768, 32768, size=n)]
    return encode_wav(samples, sample_rate=8000, n_channels=2 if stereo else 1)


# ----------------------------------------------------- without the libraries


@pytest.mark.skipif(HAS_PIL, reason="Pillow installed: real path active")
def test_image_real_path_raises_cleanly_without_pillow():
    with pytest.raises(NotImplementedError, match="needs Pillow"):
        real_image_decoder(_planted_png())
    with pytest.raises(NotImplementedError, match="needs Pillow"):
        real_resize(_planted_png())
    # and the default chooser falls back to the built-in codec
    assert default_image_decoder() is not real_image_decoder


@pytest.mark.skipif(HAS_SF, reason="soundfile installed: real path active")
def test_audio_real_path_raises_cleanly_without_soundfile():
    with pytest.raises(NotImplementedError, match="needs soundfile"):
        real_audio_decoder(_planted_wav())
    assert default_audio_decoder() is decode_wav


# -------------------------------------------------------- with the libraries


@pytest.mark.skipif(not HAS_PIL, reason="needs Pillow")
def test_builtin_and_pillow_image_decoders_agree():
    """Same planted PNG, same 8-feature contract: dims/bands/extremes
    exact, channel means to float tolerance (sum/n vs numpy mean)."""
    png = _planted_png()
    ours = builtin_image_decoder(png)
    theirs = real_image_decoder(png)
    assert ours[:3] == theirs[:3]  # width, height, bands
    assert ours[6:] == theirs[6:]  # max, min
    assert ours[3:6] == pytest.approx(theirs[3:6], rel=1e-9)
    assert default_image_decoder() is real_image_decoder


@pytest.mark.skipif(not HAS_PIL, reason="needs Pillow")
def test_jpeg_codec_agrees_with_pillow_both_directions():
    """Baseline-JPEG interop, both ways: (1) Pillow decodes OUR encoder's
    bytes to pixels close to our own decode (different IDCT/upsample
    implementations — small integer tolerance); (2) our decoder reads a
    PILLOW-encoded baseline JPEG with the same tolerance."""
    import io

    import numpy as np
    from PIL import Image

    from incremental_etl_on_lakehouse_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    rgb = np.zeros((16, 24, 3), np.uint8)
    rgb[..., 0] = (np.arange(24) * 11 % 256)[None, :]
    rgb[..., 1] = (np.arange(16) * 17 % 256)[:, None]
    rgb[..., 2] = 123
    # ours -> Pillow
    buf = encode_jpeg(rgb, quality=90, subsample="4:2:0")
    with Image.open(io.BytesIO(buf)) as im:
        theirs = np.asarray(im.convert("RGB"), dtype=np.int64)
    ours = decode_jpeg(buf).astype(np.int64)
    assert theirs.shape == ours.shape
    assert np.abs(theirs - ours).max() <= 3
    # Pillow -> ours
    out = io.BytesIO()
    Image.fromarray(rgb).save(out, format="JPEG", quality=90)
    pil_bytes = out.getvalue()
    ours2 = decode_jpeg(pil_bytes).astype(np.int64)
    with Image.open(io.BytesIO(pil_bytes)) as im:
        theirs2 = np.asarray(im.convert("RGB"), dtype=np.int64)
    assert np.abs(theirs2 - ours2).max() <= 3


@pytest.mark.skipif(not HAS_SF, reason="needs soundfile")
@pytest.mark.parametrize("stereo", [False, True])
def test_stdlib_and_soundfile_audio_decoders_agree(stereo):
    """16-bit PCM WAV is lossless in both decoders: sample-exact
    agreement, mono and stereo interleaving included."""
    wav = _planted_wav(stereo)
    assert real_audio_decoder(wav) == decode_wav(wav)
    assert default_audio_decoder() is real_audio_decoder


# -------------------------------------------- the seam itself, any container


def test_extract_audio_features_default_decoder(spark):
    """The Spark-side plumbing picks the environment's best decoder and
    produces the integer-exact stats either way (both decoders honor the
    same contract, so this is environment-independent)."""
    wav = _planted_wav()
    sr, nch, samples = decode_wav(wav)
    df = spark.createDataFrame(
        [(1, bytearray(wav))], "media_id long, content binary"
    )
    row = extract_audio_features(df).collect()[0]
    assert (row.sample_rate, row.n_channels) == (sr, nch)
    assert row.n_samples == len(samples)
    assert row.sum_samples == sum(samples)
    assert (row.min_sample, row.max_sample) == (min(samples), max(samples))
