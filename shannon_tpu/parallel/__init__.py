"""Multi-chip parallelism (SURVEY.md §3.3/§3.4).

The reference's parallelism is Jellyfish threads + a process pool over
graph components on one node; the rebuild's is a device mesh:

  * data parallelism over read shards for counting,
  * a k-mer-hash all-to-all to redistribute local spectra so each chip
    owns one hash slice (the one all-to-all-heavy phase),
  * allgather/psum merges for the global spectrum and correction.

Everything is expressed over an explicit `jax.sharding.Mesh` axis so the
same code runs on N virtual CPU devices in tests, 1 real chip, or a pod
slice (SURVEY.md §5.3, §8 M5).
"""

from shannon_tpu.parallel.mesh import make_mesh  # noqa: F401
from shannon_tpu.parallel.distributed import count_spectrum_sharded  # noqa: F401
