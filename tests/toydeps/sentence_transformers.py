"""Toy sentence-transformers stand-in (tests/toydeps): a deterministic
2-layer encoder (hashed bag-of-words -> tanh(W1) -> tanh(W2), L2
normalized; seeded weights) exposing the ``SentenceTransformer.encode``
and ``CrossEncoder.predict`` surfaces ``extensions.scoring``'s real
branches use. No semantics — it exists so the guarded real-model code
paths (lazy executor-side model load, batch encode, schema) EXECUTE in
CI without model weights. NOT a model."""

from __future__ import annotations

import hashlib

import numpy as np

_DIM_IN, _DIM_OUT = 64, 32


def _bow(text: str) -> np.ndarray:
    v = np.zeros(_DIM_IN)
    for tok in (text or "").lower().split():
        h = hashlib.md5(tok.encode()).digest()
        v[h[0] % _DIM_IN] += 1.0 if h[1] & 1 else -1.0
    return v


class SentenceTransformer:
    def __init__(self, model_name_or_path: str | None = None, **kwargs):
        rng = np.random.default_rng(12345)  # fixed: same model everywhere
        self._w1 = rng.normal(size=(_DIM_IN, _DIM_OUT)) / np.sqrt(_DIM_IN)
        self._w2 = rng.normal(size=(_DIM_OUT, _DIM_OUT)) / np.sqrt(_DIM_OUT)

    def encode(self, sentences, **kwargs) -> np.ndarray:
        x = np.stack([_bow(t) for t in sentences])
        y = np.tanh(np.tanh(x @ self._w1) @ self._w2)
        n = np.linalg.norm(y, axis=1, keepdims=True)
        n[n == 0.0] = 1.0
        return y / n


class CrossEncoder:
    def __init__(self, model_name_or_path: str | None = None, **kwargs):
        self._enc = SentenceTransformer(model_name_or_path)

    def predict(self, pairs, **kwargs) -> np.ndarray:
        a = self._enc.encode([p[0] for p in pairs])
        b = self._enc.encode([p[1] for p in pairs])
        return (a * b).sum(axis=1)
