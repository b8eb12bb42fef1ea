"""Placeholder for the rans codec (round-1 WIP; see FORMATS.md)."""

from cpprcoder_tpu.codecs import register


def encode(data, **opts):
    raise NotImplementedError("rans codec: implementation in progress")


def decode(blob, **opts):
    raise NotImplementedError("rans codec: implementation in progress")

CODEC = register("rans", 2, encode, decode)
