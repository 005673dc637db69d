"""Pure-numpy baseline JPEG codec (operators/jpeg_codec.py): encoder and
decoder round-trips across subsampling modes, qualities, odd dimensions,
restart markers, exactness on solid colors, rejection of unsupported
stream shapes, and determinism (same bytes -> bit-identical pixels)."""

import struct

import numpy as np
import pytest

from incremental_etl_on_lakehouse_spark.operators.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
)
from incremental_etl_on_lakehouse_spark.operators.multimodal import (
    builtin_image_decoder,
)


def _grad(h=13, w=21):
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = (np.arange(w) * 13 % 256)[None, :]
    img[..., 1] = (np.arange(h) * 21 % 256)[:, None]
    img[..., 2] = 77
    return img


def test_solid_color_roundtrips_exactly():
    """A solid image is DC-only; both subsampling modes reconstruct it
    bit-exactly (a box-averaged constant is the same constant)."""
    img = np.zeros((16, 24, 3), np.uint8)
    img[:, :] = (50, 100, 150)
    for sub in ("4:4:4", "4:2:0"):
        out = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
        assert out.shape == img.shape
        assert (out == img).all(), sub


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("q", [95, 75, 50])
def test_gradient_roundtrip_error_bounded(sub, q):
    img = _grad()
    out = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
    assert out.shape == img.shape  # odd dims crop back exactly
    mae = np.abs(out.astype(float) - img.astype(float)).mean()
    assert mae < (8 if sub == "4:2:0" else 4), (sub, q, mae)


def test_noise_roundtrip_and_quality_ordering():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8).astype(np.uint8)
    maes = []
    sizes = []
    for q in (95, 60, 20):
        buf = encode_jpeg(img, quality=q, subsample="4:4:4")
        out = decode_jpeg(buf)
        maes.append(np.abs(out.astype(float) - img.astype(float)).mean())
        sizes.append(len(buf))
    assert maes[0] < maes[1] < maes[2]  # lower quality, higher error
    assert sizes[0] > sizes[1] > sizes[2]  # ... and smaller files


def test_restart_markers_decode():
    img = _grad(24, 24)
    plain = decode_jpeg(encode_jpeg(img, quality=80, subsample="4:2:0"))
    rst = decode_jpeg(
        encode_jpeg(img, quality=80, subsample="4:2:0", restart_interval=1)
    )
    # restart intervals change entropy framing only, not the pixels
    assert (plain == rst).all()
    raw = encode_jpeg(img, quality=80, subsample="4:2:0", restart_interval=1)
    assert b"\xff\xd0" in raw  # RST0 actually present


def test_decode_is_deterministic():
    buf = encode_jpeg(_grad(), quality=75)
    a, b = decode_jpeg(buf), decode_jpeg(buf)
    assert (a == b).all()


def test_rejections():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnope")
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((4, 4), np.uint8))
    with pytest.raises(ValueError, match="subsample"):
        encode_jpeg(np.zeros((4, 4, 3), np.uint8), subsample="4:2:2")
    # progressive (SOF2) must be refused, not mis-decoded
    buf = bytearray(encode_jpeg(_grad(), quality=75))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(buf))


def test_tiny_and_single_block_shapes():
    for h, w in ((1, 1), (3, 5), (8, 8), (9, 17)):
        img = np.full((h, w, 3), 128, np.uint8)
        for sub in ("4:4:4", "4:2:0"):
            out = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
            assert out.shape == (h, w, 3), (h, w, sub)
            assert (out == img).all(), (h, w, sub)


def test_builtin_image_decoder_routes_jpeg():
    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :] = (10, 20, 30)
    feats = builtin_image_decoder(encode_jpeg(img, quality=90))
    assert feats[:3] == [8.0, 8.0, 3.0]
    assert feats[3:6] == [10.0, 20.0, 30.0]


def test_emitted_stream_is_wellformed_jfif():
    """Marker-level sanity: SOI, JFIF APP0, two DQTs, SOF0 with 3
    components, four DHTs, SOS, EOI — the segments any third-party
    baseline decoder needs."""
    buf = encode_jpeg(_grad(), quality=75, subsample="4:2:0")
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    markers = []
    pos = 2
    while pos < len(buf) - 2:
        assert buf[pos] == 0xFF
        m = buf[pos + 1]
        markers.append(m)
        ln = struct.unpack(">H", buf[pos + 2 : pos + 4])[0]
        pos += 2 + ln
        if m == 0xDA:
            break
    assert markers.count(0xDB) == 2
    assert markers.count(0xC4) == 4
    assert 0xC0 in markers and 0xE0 in markers and markers[-1] == 0xDA
    assert buf[6:11] == b"JFIF\x00"  # SOI(2) + FFE0(2) + length(2), then id
