"""Real stdlib media codecs + the deterministic fixture store.

The sandbox has no imaging/audio wheels, but PNG and WAV need none:

* PNG — encoder and decoder over stdlib ``zlib`` with full per-scanline
  filter reconstruction (None/Sub/Up/Average/Paeth, the complete
  RFC 2083 filter set).  8-bit RGB only; other color types raise
  ``NotImplementedError`` (the exotic-format seam).
* WAV — stdlib ``wave`` module, mono 16-bit PCM.

There is no object store in the sandbox, so the storage GET is a
deterministic fixture: ``media://doc-%012d/%d`` refs map to pixel /
sample values computed by small-integer arithmetic on
``key = doc_id * 16 + ordinal`` — plain BIGINT math a DuckDB oracle
reproduces exactly (``oracle.media_features_sql``).  The ENCODE →
DECODE roundtrip through real codec bytes is what the oracle verifies:
if any filter reconstruction were wrong, the decoded stats would not
match the SQL recomputation of the raw values.

Reference analogue: the image sink / texture path
(``Raytracing.hpp:671-689``) — the reference reads and writes real
image bytes; this module is its codec twin on the ingest side.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

__all__ = [
    "IMG_W", "IMG_H", "N_SAMPLES", "PIX_MOD",
    "media_key", "parse_media_ref", "image_pixels", "audio_samples",
    "encode_png", "decode_png", "encode_wav", "decode_wav",
    "fetch_fixture",
]

IMG_W = IMG_H = 8          # fixture image size (64 px per channel)
N_SAMPLES = 64             # fixture audio length
SAMPLE_RATE = 8000
PIX_MOD = 1_000_003        # key -> base reduction (prime, SQL: key % PIX_MOD)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# --- deterministic fixture values (SQL-twinned small-int arithmetic) ------

def media_key(doc_id: int, ordinal: int) -> int:
    """Per-span media key — same (doc_id, ordinal) composition the span
    derivation uses (``driver_tables.derive_spans_batch``)."""
    return doc_id * 16 + ordinal


def parse_media_ref(ref: str) -> tuple[int, int]:
    """``media://doc-%012d/%d`` -> (doc_id, ordinal)."""
    # len("media://doc-") == 12; the 12-digit doc id follows, then "/ord"
    return int(ref[12:24]), int(ref[25:])


_PIX_P1 = np.arange(1, IMG_W * IMG_H * 3 + 1, dtype=np.int64)
_PIX_SQ = (((_PIX_P1 - 1) ** 2) % 257) * 31
_AUD_I1 = np.arange(1, N_SAMPLES + 1, dtype=np.int64)
_AUD_SQ = ((_AUD_I1 - 1) ** 2) * 7


def image_pixels(key: int) -> np.ndarray:
    """(IMG_H, IMG_W, 3) uint8 — v(p) = (base*(p+1) + (p*p % 257)*31) % 256
    with base = key % PIX_MOD; all int64-safe, BIGINT-exact in SQL."""
    base = key % PIX_MOD
    v = (base * _PIX_P1 + _PIX_SQ) % 256
    return v.astype(np.uint8).reshape(IMG_H, IMG_W, 3)


def audio_samples(key: int) -> np.ndarray:
    """(N_SAMPLES,) int16 — x(i) = (base*(i+1) + i*i*7) % 4096 - 2048."""
    base = key % PIX_MOD
    v = (base * _AUD_I1 + _AUD_SQ) % 4096 - 2048
    return v.astype(np.int16)


# --- PNG (stdlib zlib + numpy filter reconstruction) ----------------------

def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def _paeth(left: np.ndarray, up: np.ndarray, ul: np.ndarray) -> np.ndarray:
    p = left + up - ul
    pa_, pb, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
    return np.where((pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, up, ul))


def encode_png(img: np.ndarray, *, filter_mode: str = "cycle") -> bytes:
    """8-bit RGB PNG encoder.  ``filter_mode='cycle'`` uses filter type
    ``row % 5`` so every decoder filter path is exercised by the fixture
    roundtrip (a constant filter would leave Paeth/Average untested).

    Filtering is one whole-image vector pass: the predictor inputs
    (left / up / upper-left) are plain array shifts of the ORIGINAL
    pixels (PNG filters predict from reconstructed bytes == original
    bytes on the encode side), so all five filter rows come from one
    stacked computation instead of a per-row Python loop."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise NotImplementedError("encoder supports 8-bit RGB only")
    h, w, bpp = img.shape
    stride = w * bpp
    rows = img.reshape(h, stride).astype(np.int32)
    left = np.zeros_like(rows)
    left[:, bpp:] = rows[:, :-bpp]
    up = np.zeros_like(rows)
    up[1:] = rows[:-1]
    ul = np.zeros_like(rows)
    ul[1:, bpp:] = rows[:-1, :-bpp]
    if filter_mode == "cycle":
        ft = np.arange(h, dtype=np.int64) % 5
    else:
        ft = np.zeros(h, dtype=np.int64)
    preds = np.stack([np.zeros_like(rows), left, up,
                      (left + up) >> 1, _paeth(left, up, ul)])
    pred = preds[ft, np.arange(h)]
    filt = ((rows - pred) % 256).astype(np.uint8)
    scan = np.empty((h, stride + 1), dtype=np.uint8)
    scan[:, 0] = ft
    scan[:, 1:] = filt
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(scan.tobytes(), 1))
            + _chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """PNG decoder: chunk parse -> zlib inflate -> per-scanline filter
    reconstruction.  Vectorized per row (Sub via wrapping lane cumsum, Up
    fully vector); Average/Paeth walk pixel positions (an inherent
    sequential dependency, ``bpp`` lanes wide).  8-bit RGB non-interlaced
    only — anything else raises NotImplementedError (exotic-format seam).
    """
    if data[:8] != _PNG_MAGIC:
        raise NotImplementedError("not a PNG stream")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(">IIBBBBB", body)
            if (depth, ctype, comp, filt, ilace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    f"only 8-bit RGB non-interlaced supported, got "
                    f"depth={depth} color={ctype} interlace={ilace}")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise NotImplementedError("missing IHDR")
    bpp = 3
    stride = w * bpp
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise NotImplementedError("unexpected IDAT payload size")
    raw = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ft = int(raw[r, 0])
        filt = raw[r, 1:]
        if ft == 0:
            recon = filt.copy()
        elif ft == 1:   # Sub: recon[i] = filt[i] + recon[i-bpp] — lane cumsum
            recon = np.cumsum(filt.reshape(w, bpp), axis=0,
                              dtype=np.uint8).reshape(-1)
        elif ft == 2:   # Up
            recon = ((filt.astype(np.int32) + prev) % 256).astype(np.uint8)
        elif ft in (3, 4):  # Average / Paeth: left-dependent, walk bytes.
            # Pure-Python ints: for the short strides of fixture images a
            # scalar loop beats bpp-wide numpy slice ops by ~20x.
            fl = filt.tolist()
            pv = prev.tolist()
            rec = [0] * stride
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = pv[i]
                if ft == 3:
                    pred = (a + b) >> 1
                else:
                    cc = pv[i - bpp] if i >= bpp else 0
                    p = a + b - cc
                    da, db, dc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if da <= db and da <= dc else (b if db <= dc else cc)
                rec[i] = (fl[i] + pred) & 255
            recon = np.asarray(rec, dtype=np.uint8)
        else:
            raise NotImplementedError(f"unknown PNG filter type {ft}")
        out[r] = recon
        prev = recon.astype(np.int32)
    return out.reshape(h, w, bpp)


# --- WAV (stdlib wave) ----------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int = SAMPLE_RATE) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.ascontiguousarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> np.ndarray:
    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
            raise NotImplementedError("only mono 16-bit PCM supported")
        frames = wf.readframes(wf.getnframes())
    return np.frombuffer(frames, dtype="<i2")


# --- the storage GET stand-in ---------------------------------------------

def fetch_fixture(ref: str, kind: str) -> bytes:
    """Deterministic bytes for a media ref — the sandbox twin of an
    object-store GET.  Real deployments replace this one function with
    the store client; everything downstream (codec, features) is real."""
    doc_id, ordinal = parse_media_ref(ref)
    key = media_key(doc_id, ordinal)
    if kind == "image":
        return encode_png(image_pixels(key))
    if kind == "audio":
        return encode_wav(audio_samples(key))
    raise NotImplementedError(f"no fixture for media kind {kind!r}")
