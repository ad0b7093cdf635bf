import sys, time
import numpy as np
from shannon_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from shannon_tpu.sim import simulate_transcripts, sample_reads
from shannon_tpu.io.pack import pack_reads
from shannon_tpu.ops.count import count_reads_spectrum, shrink_spectrum
from shannon_tpu.ops.correction import abundance_filter, sibling_prune_round

rng = np.random.default_rng(11)
n_tr, tlen = 500, 1500
n_reads = 50000
cov = n_reads * 100 / (n_tr * tlen)
abund = np.exp(rng.normal(0, 1, n_tr)); abund = (abund/abund.mean()).tolist()
ts = simulate_transcripts(rng, n=n_tr, length=tlen)
reads = sample_reads(rng, ts, abundances=abund, coverage=cov, read_length=100, error_rate=0.01)
batch = pack_reads(reads, pad_length=128)
print(f"{len(reads)} reads", flush=True)

t0=time.perf_counter()
spec = count_reads_spectrum(batch.codes, batch.lengths, k=24, capacity=1<<22)
print(f"count: n={int(spec.n)} cap={spec.capacity} {time.perf_counter()-t0:.1f}s", flush=True)

t0=time.perf_counter()
spec = shrink_spectrum(spec)
print(f"shrink: cap={spec.capacity} {time.perf_counter()-t0:.1f}s", flush=True)

t0=time.perf_counter()
spec = abundance_filter(spec, 1)
print(f"abfilter: n={int(spec.n)} {time.perf_counter()-t0:.1f}s", flush=True)

t0=time.perf_counter()
spec = sibling_prune_round(spec, 24, jnp.float32(0.1), True)
print(f"prune1: n={int(spec.n)} {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
spec = sibling_prune_round(spec, 24, jnp.float32(0.1), True)
print(f"prune2: n={int(spec.n)} {time.perf_counter()-t0:.1f}s", flush=True)
