"""Both decode branches of the multimodal kernels emit the declared
schema: the deterministic fake (driver/oracle path, default) and the
real-codec path (PIL / soundfile, imported lazily). The container has
no codec libs, so the real branch is exercised against minimal in-repo
stand-ins injected into sys.modules — which proves the lazy-import
plumbing, value computation, and schema without the dependency — plus a
NotImplementedError check when the libs are genuinely absent.
"""

from __future__ import annotations

import sys
import types

import pytest

from hama_spark.extensions import multimodal as mm

IMG_KEYS = ["width", "height", "n_bytes", "md5", "mean_byte"]
AUD_KEYS = ["duration_ms", "n_bytes", "md5", "rms_byte"]


@pytest.fixture
def real_mode(monkeypatch):
    monkeypatch.setenv("HAMA_SPARK_FAKE_DECODE", "0")


def test_fake_branch_is_default(monkeypatch):
    monkeypatch.delenv("HAMA_SPARK_FAKE_DECODE", raising=False)
    out = mm._decode_image_py(b"\x01\x02\x03", 5, 7)
    assert list(out) == IMG_KEYS
    assert (out["width"], out["height"], out["mean_byte"]) == (5, 7, 2)
    aud = mm._decode_audio_py(b"\x03\x04", 2000)
    assert list(aud) == AUD_KEYS
    assert aud["duration_ms"] == 2000


def test_real_image_branch_via_fake_pil(real_mode, monkeypatch):
    class _Img:
        size = (3, 2)

        def convert(self, mode):
            assert mode == "L"
            return self

        def getdata(self):
            return [10, 20, 30, 40, 50, 60]

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    pil = types.ModuleType("PIL")
    pil_image = types.ModuleType("PIL.Image")
    pil_image.open = lambda buf: _Img()
    pil.Image = pil_image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil_image)

    out = mm._decode_image_py(b"payload-bytes", None, None)
    assert list(out) == IMG_KEYS
    # dims come from the decoded image, not the (absent) metadata
    assert (out["width"], out["height"]) == (3, 2)
    assert out["mean_byte"] == 35  # mean of the fake grayscale pixels
    assert out["n_bytes"] == len(b"payload-bytes")


def test_real_audio_branch_via_fake_soundfile(real_mode, monkeypatch):
    sf = types.ModuleType("soundfile")
    sf.read = lambda buf, dtype: ([0.5, -0.5, 0.5, -0.5], 2)  # 4 frames @ 2 Hz
    monkeypatch.setitem(sys.modules, "soundfile", sf)

    out = mm._decode_audio_py(b"wav-bytes", None)
    assert list(out) == AUD_KEYS
    assert out["duration_ms"] == 2000  # 4 / 2 Hz
    assert out["rms_byte"] == int(0.5 * 255)


def test_real_branch_without_libs_raises(real_mode, monkeypatch):
    monkeypatch.setitem(sys.modules, "PIL", None)  # force ImportError
    with pytest.raises(NotImplementedError, match="pillow"):
        mm._decode_image_py(b"x", 1, 1)
    monkeypatch.setitem(sys.modules, "soundfile", None)
    with pytest.raises(NotImplementedError, match="soundfile"):
        mm._decode_audio_py(b"x", 1)
