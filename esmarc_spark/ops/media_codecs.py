"""Real media codecs with zero external dependencies.

Round 1 shipped the multimodal column plumbing with a STUBBED decoder
(no Pillow/ffmpeg in this container). These are REAL codecs for formats
that need only the stdlib + numpy, so decode / feature-extract / resize /
frame-sample run end-to-end on genuine bytes:

* image — PPM ``P6`` (binary portable pixmap): ASCII header
  ``P6 <w> <h> 255\\n`` + interleaved RGB bytes. Every pixel tool reads it.
* audio — WAV PCM16 mono via the stdlib ``wave`` module.
* video — a PPM *stream* (back-to-back P6 frames, the format mplayer/
  ffmpeg emit for ``-f image2pipe``); frames are delimited by their own
  headers, so the stream is self-describing.

JPEG/MP4/Opus would swap these functions for Pillow/ffmpeg bindings with
the identical Arrow-batch plumbing in ops.multimodal — the plan does not
change, only the codec body.
"""

from __future__ import annotations

import io
import re
import wave

import numpy as np

# ---------------------------------------------------------------------------
# PPM (P6) images
# ---------------------------------------------------------------------------

_PPM_HEADER = re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+255\s", re.S)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> P6 bytes."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return b"P6 %d %d 255\n" % (w, h) + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 bytes -> (h, w, 3) uint8. Raises ValueError on junk."""
    m = _PPM_HEADER.match(payload)
    if not m:
        raise ValueError("not a P6 ppm payload")
    w, h = int(m.group(1)), int(m.group(2))
    body = payload[m.end() : m.end() + w * h * 3]
    if len(body) != w * h * 3:
        raise ValueError("truncated ppm body")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy indexing."""
    h, w, _ = pixels.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[ys][:, xs]


# ---------------------------------------------------------------------------
# WAV PCM16 audio
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 mono samples -> WAV bytes (stdlib wave)."""
    assert samples.dtype == np.int16
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, int16 mono samples)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        data = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
        if w.getnchannels() > 1:
            data = data.reshape(-1, w.getnchannels()).mean(axis=1).astype(np.int16)
    return rate, data


# ---------------------------------------------------------------------------
# PPM stream "video"
# ---------------------------------------------------------------------------


def encode_ppm_stream(frames: list[np.ndarray]) -> bytes:
    return b"".join(encode_ppm(f) for f in frames)


def decode_ppm_stream(payload: bytes) -> list[np.ndarray]:
    """Split a back-to-back P6 stream into frames using each header's own
    dimensions — self-describing, no side index needed."""
    frames = []
    off = 0
    while off < len(payload):
        m = _PPM_HEADER.match(payload[off : off + 64])
        if not m:
            raise ValueError(f"bad frame header at offset {off}")
        w, h = int(m.group(1)), int(m.group(2))
        end = off + m.end() + w * h * 3
        frames.append(decode_ppm(payload[off:end]))
        off = end
    return frames
