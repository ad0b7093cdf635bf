"""Interactive e2e assembly measurement on the real device."""
import sys, time, json
import numpy as np

n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
from shannon_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
from shannon_tpu.sim import simulate_transcripts, sample_reads
from shannon_tpu.pipeline import assemble
from shannon_tpu.config import AssemblyConfig
from shannon_tpu.utils.timing import StageTimer

rng = np.random.default_rng(11)
n_tr = 500
tlen = 1500
cov = n_reads * 100 / (n_tr * tlen)
abund = np.exp(rng.normal(0, 1, n_tr))
abund = (abund / abund.mean()).tolist()
ts = simulate_transcripts(rng, n=n_tr, length=tlen)
t0 = time.perf_counter()
reads = sample_reads(rng, ts, abundances=abund, coverage=cov, read_length=100, error_rate=0.01)
print(f"simulated {len(reads)} reads in {time.perf_counter()-t0:.1f}s", flush=True)
cfg = AssemblyConfig()
timer = StageTimer(echo=True)
t0 = time.perf_counter()
res = assemble(reads, cfg, backend="device", timer=timer)
dt = time.perf_counter() - t0
print(json.dumps({"e2e_s": round(dt,2), "reads_per_s": round(len(reads)/dt,1), "stats": res.stats}))
