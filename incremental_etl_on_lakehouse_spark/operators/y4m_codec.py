"""Pure-stdlib YUV4MPEG2 (.y4m) codec — the video counterpart of
``png_codec``/``wav_codec``: a REAL decode path for a real, documented
interchange format (the uncompressed raw-video container ffmpeg, x264,
and mjpegtools read/write) with zero external dependencies.

Format (public spec, mjpegtools `y4m(5)`): an ASCII stream header
``YUV4MPEG2 W<w> H<h> F<n>:<d> [Ip A1:1 C<space>]\\n`` followed by frames,
each ``FRAME\\n`` + raw planar YUV bytes. ``C444`` (no chroma
subsampling: three full W*H planes) keeps the byte math unambiguous;
``C420``-family frames carry W*H + 2*(W/2)*(H/2) bytes.

At scale the decode runs inside Arrow-batched ``mapInPandas`` workers
(see ``multimodal.extract_video_features``) — frame extraction is pure
byte slicing, per batch Python overhead, no shuffle.
"""

from __future__ import annotations

_MAGIC = b"YUV4MPEG2"


def encode_y4m(
    frames: list[tuple[bytes, bytes, bytes]],
    width: int,
    height: int,
    fps: tuple[int, int] = (25, 1),
) -> bytes:
    """C444 YUV4MPEG2 stream from (y, u, v) full-plane byte triples."""
    plane = width * height
    out = [
        b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C444\n"
        % (width, height, fps[0], fps[1])
    ]
    for y, u, v in frames:
        if len(y) != plane or len(u) != plane or len(v) != plane:
            raise ValueError(
                f"C444 planes must be {plane} bytes, got "
                f"({len(y)}, {len(u)}, {len(v)})"
            )
        out.append(b"FRAME\n")
        out.extend((bytes(y), bytes(u), bytes(v)))
    return b"".join(out)


def decode_y4m(
    buf: bytes,
) -> tuple[int, int, tuple[int, int], list[tuple[bytes, bytes, bytes]]]:
    """(width, height, fps, [(y, u, v) planes per frame]) from y4m bytes.

    Supports C444 and the C420 family (420, 420jpeg, 420mpeg2, 420paldv);
    unknown colorspaces raise rather than mis-slice.
    """
    buf = bytes(buf)
    if not buf.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = buf.index(b"\n")
    width = height = None
    fps = (25, 1)
    cspace = "420jpeg"  # the spec's default when C is absent
    for tok in buf[len(_MAGIC):nl].split():
        tag, val = chr(tok[0]), tok[1:].decode("ascii")
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "F":
            n, d = val.split(":")
            fps = (int(n), int(d))
        elif tag == "C":
            cspace = val
    if not width or not height:
        raise ValueError("y4m header missing W/H")
    if cspace == "444":
        ysz = usz = width * height
    elif cspace.startswith("420"):
        ysz = width * height
        usz = (width // 2) * (height // 2)
    else:
        raise ValueError(f"unsupported y4m colorspace C{cspace}")
    frames = []
    pos = nl + 1
    fsize = ysz + 2 * usz
    while pos < len(buf):
        fnl = buf.index(b"\n", pos)
        if not buf[pos:fnl].startswith(b"FRAME"):
            raise ValueError(f"expected FRAME header at byte {pos}")
        data = buf[fnl + 1 : fnl + 1 + fsize]
        if len(data) != fsize:
            raise ValueError("truncated y4m frame")
        frames.append(
            (data[:ysz], data[ysz : ysz + usz], data[ysz + usz :])
        )
        pos = fnl + 1 + fsize
    return width, height, fps, frames
