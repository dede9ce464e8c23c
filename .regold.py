import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
import contextlib, io, re, sys
import tests.test_drivers as td
from hypre_tpu.drivers import struct as struct_driver
for flags, iters, rel in td.STRUCT_GOLDEN:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        it, r = struct_driver.run(flags.split())
    status = "SAME" if it == iters and r <= rel * 1.2 + 1e-16 else "CHANGED"
    print(f'("{flags}", {it}, {r:.4g}),  # {status} (was {iters}, {rel})', flush=True)
