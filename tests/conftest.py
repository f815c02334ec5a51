import os
import sys

# Force CPU with a virtual 8-device mesh so sharding tests run anywhere
# and don't round-trip through a remote TPU tunnel (the driver validates
# the real multi-chip path separately via __graft_entry__).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# the axon TPU plugin re-inserts itself into jax_platforms regardless of
# the env var; pin the config explicitly
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aft_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
