from cpprcoder_tpu.models.static_table import (  # noqa: F401
    normalize_freqs,
    exclusive_cumsum,
)
