"""Microbench: lower_bound_hilo vs join_lookup_hilo at pipeline shapes."""
import time
import numpy as np
from shannon_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from shannon_tpu.ops.spectrum import lower_bound_hilo, join_lookup_hilo

rng = np.random.default_rng(0)
C = 1_572_864          # tight spectrum capacity seen in the run
NQ = 16 * C            # neighbor_counts probe volume

tbl = np.sort(rng.integers(0, 2**48, size=C, dtype=np.uint64))
thi = jnp.asarray((tbl >> 32).astype(np.uint32)); tlo = jnp.asarray((tbl & 0xFFFFFFFF).astype(np.uint32))
q = rng.integers(0, 2**48, size=NQ, dtype=np.uint64)
qhi = jnp.asarray((q >> 32).astype(np.uint32)); qlo = jnp.asarray((q & 0xFFFFFFFF).astype(np.uint32))

lb = jax.jit(lower_bound_hilo)
jl = jax.jit(join_lookup_hilo)

for name, fn in [("lower_bound", lb), ("join_lookup", jl)]:
    idx, hit = fn(thi, tlo, qhi, qlo)
    np.asarray(idx[-4:])  # hard fetch barrier
    t0 = time.perf_counter()
    for _ in range(3):
        idx, hit = fn(thi, tlo, qhi, qlo)
    np.asarray(idx[-4:]); np.asarray(hit[-4:])
    print(f"{name}: {(time.perf_counter()-t0)/3*1e3:.1f} ms for {NQ/1e6:.1f}M queries vs {C/1e6:.2f}M table", flush=True)
