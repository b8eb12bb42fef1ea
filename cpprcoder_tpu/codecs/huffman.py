"""Placeholder for the huffman codec (round-1 WIP; see FORMATS.md)."""

from cpprcoder_tpu.codecs import register


def encode(data, **opts):
    raise NotImplementedError("huffman codec: implementation in progress")


def decode(blob, **opts):
    raise NotImplementedError("huffman codec: implementation in progress")

CODEC = register("huffman", 3, encode, decode)
