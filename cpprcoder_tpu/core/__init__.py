from cpprcoder_tpu.core.bytesutil import (  # noqa: F401
    as_u8,
    to_bytes,
    read_u32le,
    write_u32le,
    ByteReader,
    ByteWriter,
)
