import functools, jax, jax.numpy as jnp, numpy as np
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

L = 4096   # window length (multiple of 1024)
B = 1024   # output block

def kern(off_ref, x_ref, y_ref):
    r = off_ref[0]
    a = x_ref[:]
    A2 = a.reshape(L // 128, 128)
    q2 = r // 128
    r2 = r - q2 * 128
    nrow = L // 128
    # left-roll rows by q2 / q2+1 (try roll with negative-equivalent shift)
    R1 = pltpu.roll(A2, nrow - q2, 0)
    R2 = pltpu.roll(A2, nrow - q2 - 1, 0)
    L1 = pltpu.roll(R1, 128 - r2, 1)
    L2 = pltpu.roll(R2, 128 - r2, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (nrow, 128), 1)
    out = jnp.where(lane < 128 - r2, L1, L2)
    y_ref[:] = out.reshape(L)[:B]

@functools.partial(jax.jit)
def run(off, x):
    f = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((L,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((B,), lambda i: (0,)),
        out_shape=jax.ShapeDtypeStruct((B,), jnp.float32),
    )
    return f(off, x)

x = jnp.arange(L, dtype=jnp.float32)
ok = True
for r in (0, 1, 5, 127, 128, 129, 1000, 1023):
    y = np.asarray(run(jnp.asarray([r], jnp.int32), x))
    ref = np.arange(r, r + B, dtype=np.float32)
    if not np.array_equal(y, ref):
        ok = False
        print(f"r={r}: MISMATCH y[0:5]={y[:5]} ref[0:5]={ref[:5]}")
print("ALL OK" if ok else "FAILED")
