def default_trace_backend() -> str:
    """Production backend selection: the fused Pallas kernels on TPU
    (the only place Mosaic compiles them), the XLA work-item pipeline
    elsewhere (and as the parity oracle everywhere).  VERDICT r3 #4: no
    TPU path may default to the slow XLA sweep."""
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"
