import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
from hypre_tpu.drivers import struct as struct_driver
it, rel = struct_driver.run("-solver 10 -n 12 12 12 -tol 1e-8".split())
print("OK", it, rel, flush=True)
