import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache2")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
from hypre_tpu.drivers import struct as struct_driver
cases = [
    "-solver 0 -n 32 32 1",
    "-solver 1 -n 32 32 1",
    "-solver 1 -n 16 16 16",
    "-solver 11 -n 32 32 1 -tol 1e-8",
    "-solver 10 -n 32 32 1 -tol 1e-8",
]
for c in cases:
    print("RUN", c, flush=True)
    it, rel = struct_driver.run(c.split())
    print("OK", c, it, rel, flush=True)
