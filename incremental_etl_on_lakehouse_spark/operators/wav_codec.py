"""Pure-stdlib RIFF/WAVE codec (16-bit PCM) — the audio counterpart of
``png_codec``: a REAL decode path with zero external dependencies, so the
multimodal audio pipeline exercises genuine bytes-to-samples work instead
of a deterministic fake. Encoding exists to build planted fixtures; both
directions ride Python's ``wave`` module (RIFF chunk handling) plus
``struct`` for the PCM frames.

The format is the canonical one a 100 TB speech/audio corpus lands in
before feature extraction; at scale the decode runs inside Arrow-batched
``mapInPandas`` workers (see ``multimodal.extract_audio_features``) — per
batch Python overhead, never per row, no shuffle.
"""

from __future__ import annotations

import io
import struct
import wave


def encode_wav(
    samples: list[int], sample_rate: int = 16000, n_channels: int = 1
) -> bytes:
    """16-bit little-endian PCM WAV. ``samples`` is interleaved when
    ``n_channels > 1``; values must fit int16."""
    if len(samples) % n_channels:
        raise ValueError("sample count must be a multiple of n_channels")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(buf: bytes) -> tuple[int, int, list[int]]:
    """(sample_rate, n_channels, interleaved samples) from WAV bytes.

    Only 16-bit PCM is supported (the overwhelmingly common landing
    format); other sample widths raise rather than silently mis-scale.
    """
    with wave.open(io.BytesIO(bytes(buf)), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(
                f"only 16-bit PCM supported, got {8 * w.getsampwidth()}-bit"
            )
        sample_rate = w.getframerate()
        n_channels = w.getnchannels()
        raw = w.readframes(w.getnframes())
    samples = list(struct.unpack(f"<{len(raw) // 2}h", raw))
    return sample_rate, n_channels, samples
