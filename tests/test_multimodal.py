"""Decode-stub branch coverage for the multimodal operators.

The mapInPandas plumbing itself is hash-checked through the registry
sweep (multimodal_decode/frames/audio_chunks); these tests pin the
``_decode_payload`` feature-flag contract: fake decoder by default, a
PRESENT codec library is used (not an error) under the opt-in flag, and
a missing library under the flag is a clear failure.
"""

from __future__ import annotations

import contextlib
import sys
import types

import pytest

from bangdatapipeline_spark.operators.multimodal import _decode_payload


def test_default_is_deterministic_fake(monkeypatch):
    monkeypatch.delenv("BDP_REAL_DECODE", raising=False)
    assert _decode_payload("héllo".encode()) == "héllo"


def test_flag_off_ignores_installed_codec(monkeypatch):
    """Even with Pillow importable, the flag-off path stays the fake —
    the oracle models the fake's arithmetic."""
    monkeypatch.setenv("BDP_REAL_DECODE", "0")
    monkeypatch.setitem(sys.modules, "PIL", types.ModuleType("PIL"))
    assert _decode_payload(b"abc") == "abc"


def test_flag_on_uses_present_codec(monkeypatch):
    """BDP_REAL_DECODE=1 + importable Pillow => the codec is USED."""
    monkeypatch.setenv("BDP_REAL_DECODE", "1")

    class _FakeImg:
        format = "PNG"
        size = (320, 240)

    fake_image_mod = types.ModuleType("PIL.Image")
    fake_image_mod.open = lambda buf: contextlib.nullcontext(_FakeImg())
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)

    assert _decode_payload(b"\x89PNG...") == "PNG:320x240"


def test_flag_on_without_codec_is_clear_error(monkeypatch):
    monkeypatch.setenv("BDP_REAL_DECODE", "1")
    monkeypatch.setitem(sys.modules, "PIL", None)  # forces ImportError
    with pytest.raises(RuntimeError, match="requires Pillow"):
        _decode_payload(b"abc")
