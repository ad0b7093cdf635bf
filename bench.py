"""Benchmark: k-mer counting throughput on the real device vs the
Python reference counter (BASELINE.md measurement plan).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": R, ...}

The metric is steady-state reads/s of the device spectrum kernel
(extract + sort + segment-reduce, k=24) on 100bp reads — the hot loop
the reference delegates to Jellyfish (SURVEY.md §4.1 HOT LOOP #1).
vs_baseline divides by the pure-Python dict counter's reads/s measured
on the same machine (the 'Python+Jellyfish reference' denominator
available here: the Jellyfish binary does not exist in this image, so
the Python-side counter stands in — recorded via "baseline" field).
"""

from __future__ import annotations

import json
import time

import numpy as np


K = 24
READ_LEN = 100
N_READS = 1 << 16  # reads per device batch
CAPACITY = 1 << 22
PY_BASELINE_READS = 2000
ITERS = 5


def main() -> None:
    from shannon_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from shannon_tpu.io.pack import pack_reads
    from shannon_tpu.ops.count import count_spectrum
    from shannon_tpu.oracle.counting import count_kmers_pure_python
    from shannon_tpu.sim import random_seq, sample_reads, simulate_transcripts

    rng = np.random.default_rng(7)
    # realistic k-mer multiplicity: reads drawn from a transcriptome
    ts = simulate_transcripts(rng, n=50, length=1500)
    reads = sample_reads(
        rng, ts, coverage=float(N_READS * READ_LEN) / (50 * 1500),
        read_length=READ_LEN, error_rate=0.01,
    )[:N_READS]
    while len(reads) < N_READS:
        reads.append(random_seq(rng, READ_LEN))
    batch = pack_reads(reads, pad_length=READ_LEN)
    codes = jnp.asarray(batch.codes)
    lengths = jnp.asarray(batch.lengths)

    # --- device steady-state ------------------------------------------
    spec = count_spectrum(codes, lengths, K, CAPACITY)  # compile (cached)
    spec.hi.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        spec = count_spectrum(codes, lengths, K, CAPACITY)
    spec.hi.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    device_reads_s = N_READS / dt

    # --- python reference counter -------------------------------------
    sub = reads[:PY_BASELINE_READS]
    t0 = time.perf_counter()
    count_kmers_pure_python(sub, K)
    py_dt = time.perf_counter() - t0
    py_reads_s = len(sub) / py_dt

    n_kmers = int(spec.n)
    print(
        json.dumps(
            {
                "metric": "kmer_count_throughput",
                "value": round(device_reads_s, 1),
                "unit": "reads/s",
                "vs_baseline": round(device_reads_s / py_reads_s, 2),
                "baseline": "pure-Python dict counter (Jellyfish binary unavailable)",
                "baseline_reads_per_s": round(py_reads_s, 1),
                "batch_ms": round(dt * 1e3, 2),
                "k": K,
                "read_len": READ_LEN,
                "n_reads_batch": N_READS,
                "distinct_kmers": n_kmers,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
