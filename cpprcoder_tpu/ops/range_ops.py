"""JAX range-coder ops (WIP: filled in by the scan-codec engine)."""
static_encode_jax = None
static_decode_jax = None
adaptive_encode_jax = None
adaptive_decode_jax = None
