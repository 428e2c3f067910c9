"""Toy PIL stand-in for the real-codec test tier (tests/toydeps).

A REAL (if tiny) PNG codec — 8-bit grayscale, filters 0-2 — built on
stdlib zlib/struct, exposing exactly the Image API surface
``extensions.multimodal``'s real-decode branch uses: ``Image.open``
(context manager, .size, .convert("L"), .getdata()) and ``Image.new`` /
``.save`` for the test side. Bytes genuinely round-trip through a
compliant PNG bitstream, so the branch under test performs an actual
decode, not a pickle-fake. NOT a general PIL replacement."""

from . import Image  # noqa: F401

__all__ = ["Image"]
