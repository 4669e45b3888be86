"""Import first to force the CPU backend (the axon TPU plugin ignores
JAX_PLATFORMS; jax.config works)."""
import sys; sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
