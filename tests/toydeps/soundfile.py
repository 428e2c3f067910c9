"""Toy soundfile stand-in (tests/toydeps): 16-bit PCM WAV via stdlib
``wave`` — the ``sf.write(file, data, samplerate)`` /
``sf.read(file, dtype="float64")`` surface ``extensions.multimodal``'s
real audio branch uses. Bytes genuinely round-trip through a compliant
RIFF/WAVE container. NOT a general soundfile replacement."""

from __future__ import annotations

import wave

import numpy as np


def write(file, data, samplerate: int, format: str = "WAV") -> None:
    if format.upper() != "WAV":
        raise NotImplementedError("toy soundfile writes WAV only")
    pcm = np.clip(
        np.round(np.asarray(data, dtype=np.float64) * 32767.0), -32768, 32767
    ).astype("<i2")
    w = wave.open(file, "wb")
    try:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(int(samplerate))
        w.writeframes(pcm.tobytes())
    finally:
        w.close()


def read(file, dtype: str = "float64"):
    w = wave.open(file, "rb")
    try:
        rate = w.getframerate()
        ch = w.getnchannels()
        if w.getsampwidth() != 2:
            raise NotImplementedError("toy soundfile reads 16-bit PCM only")
        raw = w.readframes(w.getnframes())
    finally:
        w.close()
    arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if ch > 1:
        arr = arr.reshape(-1, ch)
    return arr, rate
