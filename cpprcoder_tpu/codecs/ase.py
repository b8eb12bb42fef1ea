"""Placeholder for the ase codec (round-1 WIP; see FORMATS.md)."""

from cpprcoder_tpu.codecs import register


def encode(data, **opts):
    raise NotImplementedError("ase codec: implementation in progress")


def decode(blob, **opts):
    raise NotImplementedError("ase codec: implementation in progress")

CODEC = register("ase", 7, encode, decode)
