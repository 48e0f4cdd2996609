"""Optional-codec decode path for q_multimodal_decode (VERDICT r05
item 7, hardened by the r06 review): routing is CONTRACTUAL on the
metadata's ``enc`` field — a RAW luminance buffer may legally begin
with any bytes, including a codec magic, so content sniffing would
misroute it. ``enc='raw'`` always decodes byte-domain; any codec
``enc`` decodes via the pure-stdlib PNG decoder (r06 — see
tests/test_png_codec.py for its spec coverage), PIL for other
formats when installed, and fails LOUDLY when neither applies —
compressed bytes must never be silently scored as raw luminance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from metoffice_spark.operators.llm import (
    _codec_decode,
    _decode_batches,
)


def _make_png_2x2() -> bytes:
    """A valid 2x2 8-bit grayscale PNG (pixels 0,64 / 128,255) built
    from the spec with only the stdlib, so the raise tests run
    codec-free and the blob is spec-correct when PIL IS present."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # 2x2, gray, 8-bit
    raw = b"\x00" + bytes([0, 64]) + b"\x00" + bytes([128, 255])  # filter 0
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


_PNG_2X2 = _make_png_2x2()


def _batch(payload: bytes, enc: str) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": [7],
            "payload": [payload],
            "meta": [{"fmt": "image", "enc": enc, "width": 2, "height": 2}],
        }
    )


def test_raw_payload_with_codec_magic_stays_byte_domain():
    # a RAW buffer that HAPPENS to start with the PNG magic must NOT
    # be rerouted — enc='raw' is the contract
    (out,) = list(_decode_batches([_batch(_PNG_2X2, "raw")]))
    assert out.loc[0, "n_bytes"] == len(_PNG_2X2)
    assert out.loc[0, "px_min"] == 0  # the IHDR length bytes


def test_raw_path_ignores_codec_availability():
    (out,) = list(_decode_batches([_batch(b"abc", "raw")]))
    assert out.loc[0, "n_bytes"] == 3
    assert out.loc[0, "px_min"] == ord("a")
    assert out.loc[0, "px_max"] == ord("c")


def test_non_png_codec_payload_fails_loudly_without_pil(monkeypatch):
    """A JPEG-magic payload has no stdlib decoder; without PIL it
    must refuse, never silently score compressed bytes as pixels.
    The no-PIL contract is asserted regardless of the environment
    (ADVICE r07): pin the cached probe to None instead of skipping,
    so a PIL-bearing machine still exercises this branch."""
    import metoffice_spark.operators.llm as llm_mod

    monkeypatch.setattr(llm_mod, "_PIL_IMAGE", None)
    jpeg_ish = b"\xff\xd8\xff\xe0" + b"\x00" * 32
    with pytest.raises(NotImplementedError):
        _codec_decode(jpeg_ish)
    with pytest.raises(Exception):
        list(_decode_batches([_batch(jpeg_ish, "jpeg")]))


def test_png_codec_payload_decodes_without_pil():
    """PNG decodes for REAL regardless of PIL (pure-stdlib decoder,
    r06) — this was the 'codec decode is a stub' weak spot."""
    px = _codec_decode(_PNG_2X2)
    assert px.dtype == np.uint8
    assert sorted(px.tolist()) == [0, 64, 128, 255]
    (out,) = list(_decode_batches([_batch(_PNG_2X2, "png")]))
    assert out.loc[0, "n_bytes"] == 4
    assert out.loc[0, "px_min"] == 0
    assert out.loc[0, "px_max"] == 255
    assert out.loc[0, "brightness"] == (0 + 64 + 128 + 255) // 4
