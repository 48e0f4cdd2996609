"""Optional-codec decode path for q_multimodal_decode (VERDICT r05
item 7): payloads whose magic bytes sniff as PNG/JPEG route through a
real PIL luminance decode when PIL is installed, and fail LOUDLY when
it is not — compressed bytes must never be silently scored as raw
luminance. The synthetic corpus is pure ASCII, so it can never sniff
as codec and the RAW path stays the live, parity-gated decode."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from metoffice_spark.operators.llm import (
    _codec_decode,
    _decode_batches,
    _pil_image,
    _sniff_codec,
)

def _make_png_2x2() -> bytes:
    """A valid 2x2 8-bit grayscale PNG (pixels 0,64 / 128,255) built
    from the spec with only the stdlib, so the sniff/raise tests run
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


def test_sniff_is_ascii_blind():
    # no pure-ASCII payload may ever route to the codec branch
    assert _sniff_codec(b"GIF87a pretend header in plain text") is None
    assert _sniff_codec(b"ordinary document text") is None
    assert _sniff_codec(b"") is None
    assert _sniff_codec(_PNG_2X2) == "png"
    assert _sniff_codec(b"\xff\xd8\xff\xe0JFIF") == "jpeg"


def test_raw_path_ignores_codec_availability():
    pdf = pd.DataFrame(
        {
            "doc_id": [7],
            "payload": [b"abc"],
            "meta": [{"fmt": "image", "width": 16, "height": 16}],
        }
    )
    (out,) = list(_decode_batches([pdf]))
    assert out.loc[0, "n_bytes"] == 3
    assert out.loc[0, "px_min"] == ord("a")
    assert out.loc[0, "px_max"] == ord("c")


@pytest.mark.skipif(_pil_image() is not None, reason="PIL installed")
def test_codec_payload_fails_loudly_without_pil():
    with pytest.raises(NotImplementedError):
        _codec_decode(_PNG_2X2)
    pdf = pd.DataFrame(
        {
            "doc_id": [1],
            "payload": [_PNG_2X2],
            "meta": [{"fmt": "image", "width": 2, "height": 2}],
        }
    )
    with pytest.raises(NotImplementedError):
        list(_decode_batches([pdf]))


@pytest.mark.skipif(_pil_image() is None, reason="PIL not installed")
def test_codec_payload_decodes_with_pil():
    px = _codec_decode(_PNG_2X2)
    assert px.dtype == np.uint8
    assert sorted(px.tolist()) == [0, 64, 128, 255]
    pdf = pd.DataFrame(
        {
            "doc_id": [1],
            "payload": [_PNG_2X2],
            "meta": [{"fmt": "image", "width": 2, "height": 2}],
        }
    )
    (out,) = list(_decode_batches([pdf]))
    assert out.loc[0, "n_bytes"] == 4
    assert out.loc[0, "px_min"] == 0
    assert out.loc[0, "px_max"] == 255
    assert out.loc[0, "brightness"] == (0 + 64 + 128 + 255) // 4
