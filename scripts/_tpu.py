"""Import first in TPU scripts: persistent compilation cache."""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir",
                  "/root/.jax_cache_" + jax.default_backend())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
