"""Placeholder for the blocksort codec (round-1 WIP; see FORMATS.md)."""

from cpprcoder_tpu.codecs import register


def encode(data, **opts):
    raise NotImplementedError("blocksort codec: implementation in progress")


def decode(blob, **opts):
    raise NotImplementedError("blocksort codec: implementation in progress")

CODEC = register("blocksort", 4, encode, decode)
