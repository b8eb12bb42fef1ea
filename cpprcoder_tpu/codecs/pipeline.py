"""Placeholder for the pipeline codec (round-1 WIP; see FORMATS.md)."""

from cpprcoder_tpu.codecs import register


def encode(data, **opts):
    raise NotImplementedError("pipeline codec: implementation in progress")


def decode(blob, **opts):
    raise NotImplementedError("pipeline codec: implementation in progress")
