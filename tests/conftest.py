import os
import sys

# XLA:CPU JIT-maps two+ regions per compiled executable; the full suite
# compiles enough programs to blow through a stock vm.max_map_count
# (65530), which surfaces as a SIGSEGV inside XLA compile around the
# 90% mark.  Raise it best-effort (root container).
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        if int(_f.read()) < 262144:
            with open("/proc/sys/vm/max_map_count", "w") as _g:
                _g.write("1048576")
except OSError:
    pass

# Tests run sharding on a virtual CPU mesh; the real-chip path is exercised
# by bench.py / the driver.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") +
     " --xla_force_host_platform_device_count=8").strip(),
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compile cache: many small specialized kernels (per size/qp)
# compile once per machine instead of once per pytest run.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_x265tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# The axon TPU plugin ignores JAX_PLATFORMS=cpu and keeps the default
# backend on the (remote, tunnel-attached) chip; force all test compute
# onto the local CPU backend so iteration is fast and the virtual
# 8-device mesh is usable.
jax.config.update("jax_default_device", jax.devices("cpu")[0])
