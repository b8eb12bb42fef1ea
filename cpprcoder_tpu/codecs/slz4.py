"""Placeholder for the slz4 codec (round-1 WIP; see FORMATS.md)."""

from cpprcoder_tpu.codecs import register


def encode(data, **opts):
    raise NotImplementedError("slz4 codec: implementation in progress")


def decode(blob, **opts):
    raise NotImplementedError("slz4 codec: implementation in progress")

CODEC = register("slz4", 6, encode, decode)
