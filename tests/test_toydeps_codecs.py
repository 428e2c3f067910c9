"""Toy-deps tier: EXECUTE the import-guarded real-codec/real-model
branches (the 3 skips of test_realcodec.py) with tiny API-compatible
stand-ins from tests/toydeps — a genuine PNG codec, a genuine WAV
codec, and a deterministic 2-layer encoder. The Spark-side plumbing
under test (env-var mode switch, lazy executor-side import, Arrow
batching, output schema) is the REAL code; only the heavy library
behind the import is swapped. Each Spark test runs in a subprocess
with PYTHONPATH pointing at tests/toydeps, because the mode switch is
read inside Python workers that inherit the JVM's env at launch."""

from __future__ import annotations

import io
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOYDEPS = os.path.join(REPO, "tests", "toydeps")


def _run(script: str, **env_overrides: str) -> subprocess.CompletedProcess:
    env = {**os.environ, **env_overrides}
    env["PYTHONPATH"] = TOYDEPS + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-c", script],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )


# ------------------------------------------------- the toys themselves
def test_toy_png_codec_roundtrip_and_filters():
    sys.path.insert(0, TOYDEPS)
    try:
        for m in ("PIL", "PIL.Image"):
            sys.modules.pop(m, None)
        from PIL import Image

        im = Image.new("L", (7, 5), color=200)
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        back = Image.open(io.BytesIO(buf.getvalue()))
        assert back.size == (7, 5)
        data = back.convert("L").getdata()
        assert len(data) == 35 and set(data) == {200}
    finally:
        sys.path.remove(TOYDEPS)
        for m in ("PIL", "PIL.Image"):
            sys.modules.pop(m, None)


def test_toy_wav_codec_roundtrip():
    sys.path.insert(0, TOYDEPS)
    try:
        sys.modules.pop("soundfile", None)
        import numpy as np
        import soundfile as sf

        t = np.arange(2000) / 8000.0
        wave_in = 0.5 * np.sin(2 * np.pi * 440 * t)
        buf = io.BytesIO()
        sf.write(buf, wave_in, 8000, format="WAV")
        buf.seek(0)
        out, rate = sf.read(buf, dtype="float64")
        assert rate == 8000 and len(out) == 2000
        assert np.abs(out - wave_in).max() < 1e-3  # 16-bit quantization
    finally:
        sys.path.remove(TOYDEPS)
        sys.modules.pop("soundfile", None)


# ----------------------------------- the real branches, executed end-to-end
_IMAGE_SCRIPT = r"""
import io, sys
sys.path.insert(0, {repo!r})
from PIL import Image
from hama_spark.session import get_spark
from hama_spark.extensions.multimodal import MEDIA_SCHEMA, extract_image_features

# metadata LIES (claims 1x1): only the real decoder reading actual
# pixels can produce 7x5 / mean 200
im = Image.new("L", (7, 5), color=200)
buf = io.BytesIO(); im.save(buf, format="PNG")
payload = buf.getvalue()
spark = get_spark(app_name="toydeps_image")
media = spark.createDataFrame([(1, "image", payload, "image/png", 1, 1, None)], MEDIA_SCHEMA)
row = extract_image_features(media).collect()[0]
assert (row.width, row.height) == (7, 5), (row.width, row.height)
assert row.mean_byte == 200, row.mean_byte
assert row.n_bytes == len(payload)
print("TOY_IMAGE_OK")
"""

_AUDIO_SCRIPT = r"""
import io, sys
sys.path.insert(0, {repo!r})
import numpy as np
import soundfile as sf
from hama_spark.session import get_spark
from hama_spark.extensions.multimodal import MEDIA_SCHEMA, extract_audio_features

sr = 8000
t = np.arange(sr // 4) / sr  # 250 ms; metadata claims 1 ms
buf = io.BytesIO(); sf.write(buf, 0.5 * np.sin(2 * np.pi * 440 * t), sr, format="WAV")
payload = buf.getvalue()
spark = get_spark(app_name="toydeps_audio")
media = spark.createDataFrame([(1, "audio", payload, "audio/wav", None, None, 1)], MEDIA_SCHEMA)
row = extract_audio_features(media).collect()[0]
assert abs(row.duration_ms - 250) <= 1, row.duration_ms
assert row.n_bytes == len(payload)
print("TOY_AUDIO_OK")
"""

_ENCODER_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from hama_spark.session import get_spark
from hama_spark.extensions.scoring import embed_texts, score_pairs

spark = get_spark(app_name="toydeps_encoder")
docs = spark.createDataFrame(
    [(1, "the cat sat on the mat"), (2, "the cat sat on the mat"),
     (3, "spark shuffles hash partitions")],
    "doc_id long, text string",
)
rows = dict((r.doc_id, list(r.embedding)) for r in embed_texts(docs).collect())
dim = len(rows[1])
assert dim > 0 and all(len(v) == dim for v in rows.values())
assert rows[1] == rows[2]            # deterministic: same text, same vector
assert rows[1] != rows[3]            # and distinct texts differ
norm = sum(x * x for x in rows[1]) ** 0.5
assert abs(norm - 1.0) < 1e-5        # the real branch L2-normalizes

pairs = spark.createDataFrame(
    [("a b c", "a b c"), ("a b c", "x y z")], "text_a string, text_b string"
)
scores = [r.score for r in score_pairs(pairs).orderBy("text_b").collect()]
assert scores[0] > scores[1]         # identical pair outranks disjoint pair
print("TOY_ENCODER_OK")
"""


def test_real_image_branch_runs_via_toy_png_codec():
    proc = _run(_IMAGE_SCRIPT.format(repo=REPO), HAMA_SPARK_FAKE_DECODE="0")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "TOY_IMAGE_OK" in proc.stdout


def test_real_audio_branch_runs_via_toy_wav_codec():
    proc = _run(_AUDIO_SCRIPT.format(repo=REPO), HAMA_SPARK_FAKE_DECODE="0")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "TOY_AUDIO_OK" in proc.stdout


def test_real_encoder_branch_runs_via_toy_model():
    proc = _run(_ENCODER_SCRIPT.format(repo=REPO), HAMA_SPARK_REAL_ENCODER="1")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "TOY_ENCODER_OK" in proc.stdout
